"""Disk-backed catalog: offset index, O(delta) journal, compaction,
sidecar warm loads, and interop with reference-format JSONL.

The round-3 catalog held every entry in RAM and rewrote the whole JSONL
on save (the reference's design, rag/retrieval/bm25.py:220-248); these
tests pin the round-4 contract: adds/deletes append O(delta) bytes, the
base file only changes on compaction, and all read paths (get / entries
/ items / contains / len) agree with an in-RAM oracle throughout.
"""

import json
import random

from classmate_rag_tpu.index.catalog import Catalog, CatalogEntry


def make_entry(i, text=None):
    return CatalogEntry(
        id=f"cm_{i:08d}",
        text=text or f"chunk text number {i} with some words",
        tokens=[f"tok{i}", "common", f"word{i % 7}"],
        metadata={"course": "c1", "page": i},
    )


def seeded_catalog(tmp_path, n=20):
    cat = Catalog.load_or_create(tmp_path)
    for i in range(n):
        cat.upsert(make_entry(i))
    cat.save()
    return cat


def test_roundtrip_and_reload(tmp_path):
    cat = seeded_catalog(tmp_path)
    assert len(cat) == 20
    fresh = Catalog.load_or_create(tmp_path)
    assert len(fresh) == 20
    e = fresh.get("cm_00000003")
    assert e is not None and e.text == make_entry(3).text
    assert e.tokens == make_entry(3).tokens
    assert e.metadata == {"course": "c1", "page": 3}
    assert "cm_00000019" in fresh
    assert "cm_99999999" not in fresh


def test_save_appends_journal_not_base(tmp_path):
    cat = seeded_catalog(tmp_path)
    base_bytes = cat.path.read_bytes()
    cat.upsert(make_entry(100))
    cat.delete(["cm_00000001"])
    cat.save()
    # O(delta): the base JSONL is untouched; the delta is in the journal.
    assert cat.path.read_bytes() == base_bytes
    journal = cat.journal_path.read_text(encoding="utf-8")
    assert '"op": "delete"' in journal
    assert "cm_00000100" in journal

    fresh = Catalog.load_or_create(tmp_path)
    assert "cm_00000100" in fresh
    assert "cm_00000001" not in fresh
    assert len(fresh) == 20


def test_upsert_overwrites_via_journal(tmp_path):
    cat = seeded_catalog(tmp_path)
    cat.upsert(make_entry(5, text="REVISED"))
    cat.save()
    assert cat.get("cm_00000005").text == "REVISED"
    fresh = Catalog.load_or_create(tmp_path)
    assert fresh.get("cm_00000005").text == "REVISED"
    # First-seen order is preserved across upserts (dict semantics).
    assert fresh.ids.index("cm_00000005") == 5


def test_delete_shadows_base_even_after_pending_upsert(tmp_path):
    """upsert(x) then delete(x) in one batch must tombstone the on-disk
    version of x too, not just drop the pending copy."""
    cat = seeded_catalog(tmp_path)
    cat.upsert(make_entry(2, text="SHADOW"))
    assert cat.delete(["cm_00000002"]) == 1
    cat.save()
    fresh = Catalog.load_or_create(tmp_path)
    assert "cm_00000002" not in fresh
    assert len(fresh) == 19


def test_compact_restores_single_file_layout(tmp_path):
    cat = seeded_catalog(tmp_path)
    cat.upsert(make_entry(50, text="from journal"))
    cat.delete(["cm_00000000"])
    cat.save()
    assert cat.journal_path.exists()
    cat.compact()
    assert not cat.journal_path.exists()
    # The base is now the full truth, parseable by a reference-style
    # line reader.
    lines = [json.loads(l) for l in
             cat.path.read_text(encoding="utf-8").splitlines()]
    ids = [r["id"] for r in lines]
    assert "cm_00000050" in ids and "cm_00000000" not in ids
    assert len(ids) == 20
    by_id = {r["id"]: r for r in lines}
    assert by_id["cm_00000050"]["text"] == "from journal"
    assert cat.get("cm_00000050").text == "from journal"


def test_fingerprint_matches_plain_sha1_when_no_journal(tmp_path):
    """Empty journal → the historical sha1-of-file, so lexical snapshots
    written by the round-3 catalog stay valid."""
    import hashlib

    cat = seeded_catalog(tmp_path)
    cat.compact()
    expect = hashlib.sha1(cat.path.read_bytes()).hexdigest()
    assert cat.fingerprint() == expect
    # Journal mutations change the fingerprint.
    cat.upsert(make_entry(999))
    cat.save()
    assert cat.fingerprint() != expect


def test_sidecar_warm_load_and_invalidation(tmp_path):
    cat = seeded_catalog(tmp_path)
    assert cat._sidecar_path.exists()
    warm = Catalog.load_or_create(tmp_path)
    assert warm.ids == cat.ids
    assert warm.get("cm_00000007").text == make_entry(7).text

    # Foreign mutation of the base invalidates the sidecar (stat key).
    with cat.path.open("a", encoding="utf-8") as f:
        f.write(json.dumps({"id": "cm_foreign", "text": "x",
                            "tokens": ["x"], "metadata": {}}) + "\n")
    reloaded = Catalog.load_or_create(tmp_path)
    assert "cm_foreign" in reloaded
    assert len(reloaded) == 21


def test_reads_reference_written_jsonl(tmp_path):
    """A file written by the reference stack (different key order, no
    sidecar/journal) loads correctly — id extraction falls back to a
    real JSON parse when the fast-prefix pattern misses."""
    path = tmp_path / "bm25_index.jsonl"
    recs = [
        {"text": "hello world", "id": "ref_1", "tokens": ["hello"],
         "metadata": {"course": "x"}},
        {"metadata": {}, "tokens": ["b"], "text": "second", "id": "ref_2"},
    ]
    path.write_text(
        "\n".join(json.dumps(r) for r in recs) + "\n", encoding="utf-8"
    )
    cat = Catalog.load_or_create(tmp_path)
    assert len(cat) == 2
    assert cat.get("ref_1").text == "hello world"
    assert cat.get("ref_2").tokens == ["b"]


def test_truncated_journal_tail_is_tolerated(tmp_path):
    """A crash mid-append leaves a partial last line; it must be skipped,
    not corrupt the catalog."""
    cat = seeded_catalog(tmp_path)
    cat.upsert(make_entry(60))
    cat.save()
    raw = cat.journal_path.read_bytes()
    cat.journal_path.write_bytes(raw + b'{"id": "cm_trunc", "te')
    fresh = Catalog.load_or_create(tmp_path)
    assert "cm_00000060" in fresh
    assert "cm_trunc" not in fresh
    assert len(fresh) == 21


def test_lru_cache_bounded(tmp_path):
    cat = seeded_catalog(tmp_path, n=30)
    cat.compact()
    cat.cache_entries = 4
    for i in range(30):
        assert cat.get(f"cm_{i:08d}") is not None
    assert len(cat._cache) <= 4
    # Full scans don't pollute the cache.
    _ = [e.id for e in cat.entries()]
    assert len(cat._cache) <= 4


def test_stateful_vs_oracle(tmp_path):
    """Random upsert/delete/save/reload/compact trace: the disk-backed
    catalog tracks an in-RAM dict oracle exactly."""
    rng = random.Random(7)
    cat = Catalog.load_or_create(tmp_path)
    oracle = {}
    for step in range(300):
        op = rng.random()
        if op < 0.5:
            i = rng.randrange(60)
            text = f"v{step}"
            cat.upsert(make_entry(i, text=text))
            oracle[f"cm_{i:08d}"] = text
        elif op < 0.75:
            i = rng.randrange(60)
            cid = f"cm_{i:08d}"
            got = cat.delete([cid])
            assert got == (1 if cid in oracle else 0)
            oracle.pop(cid, None)
        elif op < 0.9:
            cat.save()
        elif op < 0.97:
            cat.save()
            cat = Catalog.load_or_create(tmp_path)
        else:
            cat.compact()
        if rng.random() < 0.1:
            assert len(cat) == len(oracle)
            for cid, text in list(oracle.items())[:5]:
                assert cat.get(cid).text == text
    cat.save()
    final = Catalog.load_or_create(tmp_path)
    assert sorted(final.ids) == sorted(oracle)
    for cid, text in oracle.items():
        assert final.get(cid).text == text
    assert sorted(e.id for e in final.entries()) == sorted(oracle)


# ---------------------------------------------------------------------------
# Round-4 review regressions
# ---------------------------------------------------------------------------

def test_foreign_base_rewrite_discards_stale_journal(tmp_path):
    # A reference stack (which knows nothing about the journal sidecar)
    # may rewrite bm25_index.jsonl wholesale; replaying our leftover
    # journal on top resurrected deleted/stale entries (review finding).
    cat = seeded_catalog(tmp_path, n=4)          # fold -> base exists
    cat.upsert(make_entry(99))
    cat.save()                                    # journal now carries 99
    assert cat.journal_path.exists()
    # Foreign rewrite: the base now contains ONLY 'x'.
    line = json.dumps({"id": "x", "text": "foreign", "tokens": ["f"],
                       "metadata": {}})
    cat.path.write_text(line + "\n", encoding="utf-8")
    cat2 = Catalog.load_or_create(tmp_path)
    assert cat2.ids == ["x"]                      # nothing resurrected
    assert not cat2.journal_path.exists()         # set aside, not replayed
    assert cat2.journal_path.with_suffix(".jsonl.stale").exists()
    # The catalog remains fully usable after the discard.
    cat2.upsert(make_entry(1))
    cat2.save()
    cat3 = Catalog.load_or_create(tmp_path)
    assert set(cat3.ids) == {"x", "cm_00000001"}


def test_journal_survives_reload_when_base_untouched(tmp_path):
    # The binding must NOT discard journals in the normal case.
    cat = seeded_catalog(tmp_path, n=4)
    cat.upsert(make_entry(99))
    cat.save()
    # Defeat the sidecar fast path so _replay_journal itself runs.
    cat._sidecar_path.unlink()
    cat2 = Catalog.load_or_create(tmp_path)
    assert "cm_00000099" in cat2.ids
    assert cat2.get("cm_00000099").text == make_entry(99).text


def test_items_iteration_survives_concurrent_compaction(tmp_path):
    # items() snapshots offsets; a save() that compacts mid-iteration
    # os.replace()s the base those offsets point into. The pre-opened
    # handles pin the old inodes, so every snapshotted entry must still
    # be yielded intact (the old lazy open silently skipped them).
    cat = seeded_catalog(tmp_path, n=30)
    cat.upsert(make_entry(777))
    cat.save()                                    # 777 lives in the journal
    it = cat.items()
    got = [next(it)[0] for _ in range(3)]         # handles now open
    cat.compact()                                 # base replaced, journal gone
    got += [cid for cid, _ in it]
    assert len(got) == 31
    assert "cm_00000777" in got
    # And the entries parsed, not silently dropped mid-file.
    cat2_texts = {cid: e.text for cid, e in cat.items()}
    assert len(cat2_texts) == 31


# ---------------------------------------------------------------------------
# Round-5 review regressions: MARKER-LESS legacy journals
# ---------------------------------------------------------------------------

def _legacy_journal_line(i):
    return json.dumps(
        {"id": f"cm_{i:08d}", "text": f"legacy {i}", "tokens": ["leg"],
         "metadata": {}}, ensure_ascii=False,
    ) + "\n"


def test_legacy_markerless_journal_demoted_on_foreign_base_rewrite(tmp_path):
    # A journal written BEFORE the base-binding marker existed carries no
    # record of which base it extends; the sidecar's (size, mtime_ns)
    # records witness the pairing instead. A foreign base rewrite under
    # such a journal must demote it, not replay stale ops.
    seeded_catalog(tmp_path, n=4)
    cat = Catalog.load_or_create(tmp_path)
    jp = cat.journal_path
    jp.write_text(_legacy_journal_line(99), encoding="utf-8")
    # Re-load so the sidecar records the CURRENT base+journal pairing
    # (what a legacy deployment's sidecar holds).
    cat = Catalog.load_or_create(tmp_path)
    assert "cm_00000099" in cat.ids          # legacy journal replays fine
    # Foreign rewrite: the base now contains ONLY 'x'.
    line = json.dumps({"id": "x", "text": "foreign", "tokens": ["f"],
                       "metadata": {}})
    cat.path.write_text(line + "\n", encoding="utf-8")
    cat2 = Catalog.load_or_create(tmp_path)
    assert cat2.ids == ["x"]                 # nothing resurrected
    assert not cat2.journal_path.exists()
    assert cat2.journal_path.with_suffix(".jsonl.stale").exists()


def test_legacy_markerless_journal_upgraded_at_first_mutation(tmp_path):
    # The first save() that touches a marker-less journal rewrites it
    # with a marker bound to the current base, permanently closing the
    # foreign-rewrite window for upgraded deployments.
    seeded_catalog(tmp_path, n=4)
    cat = Catalog.load_or_create(tmp_path)
    cat.journal_path.write_text(_legacy_journal_line(99), encoding="utf-8")
    cat = Catalog.load_or_create(tmp_path)
    assert not cat._journal_has_marker()
    cat.upsert(make_entry(100))
    cat.save()
    assert cat._journal_has_marker()
    # Offsets were shifted by the prepended marker: every journaled
    # entry (pre-existing AND new) must still fetch correctly.
    assert cat.get("cm_00000099").text == "legacy 99"
    assert cat.get("cm_00000100").text == make_entry(100).text
    fresh = Catalog.load_or_create(tmp_path)
    assert fresh.get("cm_00000099").text == "legacy 99"
    assert fresh.get("cm_00000100").text == make_entry(100).text
    # And the upgraded journal now survives its binding check while a
    # foreign rewrite demotes it like any marker-bearing journal.
    cat.path.write_text("", encoding="utf-8")
    cat3 = Catalog.load_or_create(tmp_path)
    assert cat3.journal_path.with_suffix(".jsonl.stale").exists()


# ---------------------------------------------------------------------------
# Round-5: de-cliffed background journal fold
# ---------------------------------------------------------------------------

def _slow_entry_line(monkeypatch, seconds=0.002):
    import time as _time

    import classmate_rag_tpu.index.catalog as cat_mod

    orig = cat_mod._entry_line

    def slow(e):
        _time.sleep(seconds)
        return orig(e)

    monkeypatch.setattr(cat_mod, "_entry_line", slow)


def test_background_fold_is_nonblocking_and_consistent(tmp_path, monkeypatch):
    """An /add that trips the compaction ratio returns in O(delta) time
    (the O(corpus) fold runs in a background thread); mutations landed
    DURING the fold survive into the post-fold journal tail."""
    import time

    import classmate_rag_tpu.index.catalog as cat_mod

    monkeypatch.setattr(cat_mod, "_COMPACT_MIN_BYTES", 0)
    monkeypatch.setattr(cat_mod, "_COMPACT_RATIO", 0.0)
    cat = seeded_catalog(tmp_path, n=200)      # base exists, journal empty
    _slow_entry_line(monkeypatch)              # ~0.4 s fold window
    cat.upsert(make_entry(500))
    t0 = time.perf_counter()
    cat.save()                                 # trips ratio -> background
    save_s = time.perf_counter() - t0
    assert save_s < 0.2, f"save blocked on the fold ({save_s:.2f}s)"
    assert cat._fold_thread is not None and cat._fold_thread.is_alive()
    # Mutate while the fold streams.
    cat.upsert(make_entry(501))
    cat.delete(["cm_00000003"])
    with cat._lock:
        cat._flush_pending_locked()
    cat.join_fold(timeout=30)
    assert not (cat._fold_thread and cat._fold_thread.is_alive())
    # Everything consistent in memory...
    assert cat.get("cm_00000500").text == make_entry(500).text
    assert cat.get("cm_00000501").text == make_entry(501).text
    assert cat.get("cm_00000003") is None
    # ... and on disk (tail ops preserved in the post-fold journal).
    monkeypatch.undo()
    fresh = Catalog.load_or_create(tmp_path)
    assert fresh.get("cm_00000500") is not None
    assert fresh.get("cm_00000501") is not None
    assert "cm_00000003" not in fresh.ids
    assert len(fresh) == len(cat)


def test_fold_alias_keeps_store_snapshot_valid(tmp_path, monkeypatch):
    """A fold rewrites catalog bytes without changing content: a store
    snapshot keyed to the PRE-fold fingerprint must still load (no
    O(corpus) cold rebuild) via the recorded fold alias."""
    import numpy as np

    import classmate_rag_tpu.index.catalog as cat_mod
    from classmate_rag_tpu.index.store import IndexStore

    cat = Catalog.load_or_create(tmp_path / "bm25")
    store = IndexStore(8, tmp_path / "dense", slab_rows=64,
                       terms_per_chunk=16)
    rng = np.random.default_rng(3)
    for i in range(60):
        e = make_entry(i)
        cat.upsert(e)
        store.upsert([e.id], rng.standard_normal((1, 8)).astype(np.float32),
                     [e.tokens], [e.metadata])
    cat.save()
    store.save(catalog_fingerprint=cat.fingerprint())

    monkeypatch.setattr(cat_mod, "_COMPACT_MIN_BYTES", 0)
    monkeypatch.setattr(cat_mod, "_COMPACT_RATIO", 0.0)
    _slow_entry_line(monkeypatch)
    e = make_entry(99)
    cat.upsert(e)
    store.upsert([e.id], rng.standard_normal((1, 8)).astype(np.float32),
                 [e.tokens], [e.metadata])
    cat.save()                                     # fold starts
    fp_pre = cat.fingerprint()                     # pre-swap fingerprint
    store.save(catalog_fingerprint=fp_pre)         # chain keyed pre-fold
    cat.join_fold(timeout=30)
    assert cat.fingerprint() != fp_pre             # bytes moved...
    assert cat.fold_alias == (fp_pre, cat.fingerprint())
    monkeypatch.undo()

    re = IndexStore.load_or_create(8, tmp_path / "dense", cat,
                                   slab_rows=64, terms_per_chunk=16)
    # The snapshot was ADOPTED (alias matched), not cold-rebuilt: the
    # persisted df came back with it.
    assert re._df_host is not None
    assert re.df_full_builds == 0
    assert re.n_rows == store.n_rows
    assert np.array_equal(re.term_ids[:re.n_rows],
                          store.term_ids[:store.n_rows])


def _fold_with_crash(tmp_path, monkeypatch, crash_on_base_swap):
    """Drive a real background fold with a mutation landed mid-fold,
    then simulate a crash at one of the two renames of the swap.
    Returns the catalog directory ready for a fresh load."""
    from pathlib import Path

    import classmate_rag_tpu.index.catalog as cat_mod

    monkeypatch.setattr(cat_mod, "_COMPACT_MIN_BYTES", 0)
    monkeypatch.setattr(cat_mod, "_COMPACT_RATIO", 0.0)
    cat = seeded_catalog(tmp_path, n=200)
    cat.join_fold(timeout=30)                  # settle the seed fold
    _slow_entry_line(monkeypatch)              # widen the fold window
    cat.upsert(make_entry(500))

    base_path = Path(cat.path)
    pending_path = Path(cat._pending_journal_path)
    orig_replace = cat_mod.os.replace

    def crashing_replace(src, dst):
        if crash_on_base_swap and Path(dst) == base_path:
            raise OSError("simulated crash before the base swap")
        if not crash_on_base_swap and Path(src) == pending_path:
            raise OSError("simulated crash between the fold renames")
        return orig_replace(src, dst)

    monkeypatch.setattr(cat_mod.os, "replace", crashing_replace)
    cat.save()                                 # trips ratio -> background
    # Wait until the fold's streaming phase has started (its tmp file
    # exists), so the mutations below deterministically land PAST the
    # fold's snapshot point and live only in the journal tail.
    import time as _time

    tmp_file = base_path.with_name(base_path.name + ".fold.tmp")
    deadline = _time.monotonic() + 10
    while not tmp_file.exists() and _time.monotonic() < deadline:
        _time.sleep(0.005)
    assert tmp_file.exists(), "fold streaming phase never started"
    cat.upsert(make_entry(501))
    cat.delete(["cm_00000003"])
    with cat._lock:
        cat._flush_pending_locked()
    cat.join_fold(timeout=30)                  # swap raised inside
    monkeypatch.undo()
    # The live object is now what a crashed process left behind; only
    # the on-disk state matters from here.


def test_fold_crash_between_renames_adopts_pending_journal(tmp_path,
                                                           monkeypatch):
    """Crash AFTER the base swap, BEFORE the journal swap: new base on
    disk, old journal's marker stale, post-fold journal still staged at
    *.pending. The next load must adopt the pending journal — demoting
    it as stale would drop the mid-fold tail ops (and resurrect the
    mid-fold delete)."""
    _fold_with_crash(tmp_path, monkeypatch, crash_on_base_swap=False)
    fresh = Catalog.load_or_create(tmp_path)
    assert fresh.get("cm_00000500") is not None
    assert fresh.get("cm_00000501").text == make_entry(501).text
    assert "cm_00000003" not in fresh.ids
    assert len(fresh) == 201                   # 200 seeds + 2 - 1 delete
    assert not fresh._pending_journal_path.exists()
    # The catalog stays durable after recovery.
    fresh.upsert(make_entry(502))
    fresh.save()
    again = Catalog.load_or_create(tmp_path)
    assert len(again) == 202


def test_fold_crash_before_base_swap_discards_pending_staging(tmp_path,
                                                              monkeypatch):
    """Crash BEFORE the base swap: old base + old journal are intact
    and authoritative; the staged *.pending (whose marker points at the
    never-installed tmp base) is leftover staging and must be discarded,
    not adopted."""
    _fold_with_crash(tmp_path, monkeypatch, crash_on_base_swap=True)
    fresh = Catalog.load_or_create(tmp_path)
    assert fresh.get("cm_00000500") is not None
    assert fresh.get("cm_00000501") is not None
    assert "cm_00000003" not in fresh.ids
    assert len(fresh) == 201
    assert not fresh._pending_journal_path.exists()


def test_ids_for_path_matches_full_scan(tmp_path):
    """The raw-line path scan must agree with a full metadata parse —
    including a text body that CONTAINS the literal pattern (escaped
    inside the JSON string, so it must not false-match)."""
    cat = Catalog.load_or_create(tmp_path)
    for i in range(30):
        sp = f"/docs/file_{i % 5}.txt"
        cat.upsert(CatalogEntry(
            id=f"p{i:04d}",
            text=('tricky "source_path": "/docs/file_0.txt" inside text'
                  if i == 7 else f"text {i}"),
            tokens=[f"t{i}"],
            metadata={"source_path": sp, "page": i},
        ))
    cat.save()
    cat = Catalog.load_or_create(tmp_path)   # scan from disk
    for k in range(5):
        want = sorted(
            e.id for e in cat.entries()
            if e.metadata.get("source_path") == f"/docs/file_{k}.txt"
        )
        got = sorted(cat.ids_for_path(f"/docs/file_{k}.txt"))
        assert got == want, (k, got, want)
    assert cat.ids_for_path("/docs/absent.txt") == []
    # Pending (unsaved) entries are seen too.
    cat.upsert(CatalogEntry("zz", "t", ["t"],
                            {"source_path": "/docs/file_1.txt"}))
    assert "zz" in cat.ids_for_path("/docs/file_1.txt")

def test_delta_save_after_alias_adoption_keeps_chain_valid(tmp_path,
                                                           monkeypatch):
    """Regression: a load that adopts the store snapshot via the fold
    alias must chain the NEXT delta save from the fingerprint ON DISK
    (the pre-fold one), not the live post-fold one — otherwise the load
    after that delta save rejects the whole persisted chain (snapshot
    keyed to pre-fold, chain base post-fold) and cold-rebuilds O(N*L)."""
    import numpy as np

    import classmate_rag_tpu.index.catalog as cat_mod
    from classmate_rag_tpu.index.store import IndexStore

    cat = Catalog.load_or_create(tmp_path / "bm25")
    store = IndexStore(8, tmp_path / "dense", slab_rows=64,
                       terms_per_chunk=16)
    rng = np.random.default_rng(7)

    def ingest(c, s, i):
        e = make_entry(i)
        c.upsert(e)
        s.upsert([e.id],
                 rng.standard_normal((1, 8)).astype(np.float32),
                 [e.tokens], [e.metadata])

    for i in range(60):
        ingest(cat, store, i)
    cat.save()
    store.save(catalog_fingerprint=cat.fingerprint())

    # Fold the catalog: bytes move, alias (pre -> post) recorded.
    monkeypatch.setattr(cat_mod, "_COMPACT_MIN_BYTES", 0)
    monkeypatch.setattr(cat_mod, "_COMPACT_RATIO", 0.0)
    ingest(cat, store, 99)
    cat.save()
    fp_pre = cat.fingerprint()
    store.save(catalog_fingerprint=fp_pre)
    cat.join_fold(timeout=30)
    assert cat.fold_alias is not None and cat.fold_alias[0] == fp_pre

    # Adopt via the alias, mutate ONCE, delta-save, reload: the second
    # load must still adopt (df restored, no full lexical rebuild).
    re1 = IndexStore.load_or_create(8, tmp_path / "dense", cat,
                                    slab_rows=64, terms_per_chunk=16)
    assert re1._df_host is not None        # adopted via the alias
    ingest(cat, re1, 100)
    cat.save()
    re1.save(catalog_fingerprint=cat.fingerprint())
    assert list((tmp_path / "dense").glob("lexical.delta_*.npz")), \
        "expected an O(delta) save, not a full rewrite"

    re2 = IndexStore.load_or_create(8, tmp_path / "dense", cat,
                                    slab_rows=64, terms_per_chunk=16)
    assert re2._df_host is not None, \
        "persisted chain orphaned after alias adoption + delta save"
    assert re2.df_full_builds == 0
    assert re2.n_rows == re1.n_rows
    assert np.array_equal(re2.term_ids[:re2.n_rows],
                          re1.term_ids[:re1.n_rows])

def test_ids_for_path_nested_key_and_foreign_separators(tmp_path):
    """The raw-line scan must not resolve a chunk whose only
    "source_path" is nested inside a metadata VALUE, and must still
    find entries written by a foreign writer with compact separators."""
    cat = Catalog.load_or_create(tmp_path)
    cat.upsert(CatalogEntry(
        id="real", text="t", tokens=["t"],
        metadata={"source_path": "/x/a.txt"},
    ))
    cat.upsert(CatalogEntry(
        id="nested", text="t", tokens=["t"],
        metadata={"provenance": {"source_path": "/x/a.txt"}},
    ))
    cat.save()
    assert sorted(cat.ids_for_path("/x/a.txt")) == ["real"]

    # Foreign base rewrite with separators=(",", ":") — still resolved.
    line = json.dumps(
        {"id": "compact", "text": "t", "tokens": ["t"],
         "metadata": {"source_path": "/y/b.txt"}},
        separators=(",", ":"),
    )
    with cat.path.open("a", encoding="utf-8") as f:
        f.write(line + "\n")
    cat.journal_path.unlink(missing_ok=True)
    cat._sidecar_path.unlink(missing_ok=True)
    fresh = Catalog.load_or_create(tmp_path)
    assert fresh.ids_for_path("/y/b.txt") == ["compact"]
