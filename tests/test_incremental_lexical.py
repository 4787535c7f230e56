"""O(delta) lexical refresh: the tail-overlay incremental path.

Round 3's sharded refresh re-ran ``build_split_layout`` over the ENTIRE
packed term matrix for any non-empty lexical delta — measured ~250 s of
single-core host work at 1M rows for a one-row ingest. Round 4 replaces
it with a frozen head partition + tail overlay (lexical.plan_tail_delta):
old tail entries are neutralized (tf=0 — an exact no-op in Okapi, since
subset df comes from the row-major term matrix, not the postings), new
entries land in a reserved overlay region, and the query splitter emits
extra per-term overlay segments. These tests pin:

- the incremental path actually RUNS (no full rebuild) for plain
  lexical updates, new-row appends within capacity, and new-vocab terms;
- results stay bit-identical to the single-device fused step;
- the A->B->A content cycle (device base diverged via tf=0 holes, then a
  full rebuild whose fresh layout EQUALS the stale host copy) re-places
  the postings instead of skipping (the _tail_diverged guard);
- a planner-infeasible delta falls back to the full rebuild and still
  answers identically.
"""

import numpy as np
import pytest

from classmate_rag_tpu.index.store import IndexStore

DIM = 32
VOCAB = [f"w{i}" for i in range(60)]


def _doc(rng):
    return [VOCAB[i] for i in rng.integers(0, len(VOCAB), rng.integers(4, 12))]


def _emb(rng, n=1):
    e = rng.standard_normal((n, DIM)).astype(np.float32)
    return e / np.linalg.norm(e, axis=1, keepdims=True)


@pytest.fixture()
def engine(tmp_path):
    from classmate_rag_tpu.parallel import corpus_mesh
    from classmate_rag_tpu.parallel.serving import ShardedHybridIndex

    rng = np.random.default_rng(11)
    store = IndexStore(DIM, tmp_path, slab_rows=8, terms_per_chunk=16,
                       rescore="on", rescore_pool=16)
    # Fill to 30 of a 32-capacity store: appends below stay
    # non-structural (no capacity growth).
    n0 = 30
    ids = [f"d{i}" for i in range(n0)]
    store.upsert(ids, _emb(rng, n0), [_doc(rng) for _ in range(n0)],
                 [{"course": f"c{i % 3}"} for i in range(n0)])
    idx = ShardedHybridIndex(store, corpus_mesh(8), top_k=6)
    return rng, store, idx


def _check_identity(rng, store, idx, tag):
    qv = _emb(rng, 2)
    terms = [_doc(rng)[:4], _doc(rng)[:4]]
    for where in (None, {"course": "c1"}):
        want = store.hybrid_topk_batch(qv, terms, where, top_k=6)
        got = idx.query_batch(qv, terms, where)
        assert np.array_equal(
            np.asarray(want.rows), np.asarray(got.rows)
        ), f"{tag} (where={where})"
        np.testing.assert_allclose(
            np.asarray(want.fused), np.asarray(got.fused), atol=1e-5,
            err_msg=tag,
        )


def test_incremental_runs_without_full_rebuild(engine):
    rng, store, idx = engine
    assert idx.full_lexical_rebuilds == 0  # constructor only

    # Plain token overwrite of existing rows.
    for i in (2, 9, 17):
        store.upsert([f"d{i}"], _emb(rng), [_doc(rng)], [{"course": "c1"}])
    _check_identity(rng, store, idx, "overwrite")
    assert idx.full_lexical_rebuilds == 0

    # Append within capacity (30 -> 32: no slab growth).
    store.upsert(["d30", "d31"], _emb(rng, 2), [_doc(rng), _doc(rng)],
                 [{"course": "c0"}, {"course": "c2"}])
    _check_identity(rng, store, idx, "append")
    assert idx.full_lexical_rebuilds == 0

    # New-vocab terms (vocab growth extends the frozen tables; the new
    # terms are tail-by-construction and must be findable).
    store.upsert(["d5"], _emb(rng), [["zebra", "quagga", "zebra", "w3"]],
                 [{"course": "c1"}])
    idx.ensure_fresh()
    assert idx.full_lexical_rebuilds == 0
    qv = _emb(rng, 1)
    got = idx.query_batch(qv, [["zebra", "quagga"]], None, top_k=8)
    want = store.hybrid_topk_batch(qv, [["zebra", "quagga"]], None, top_k=8)
    assert np.array_equal(np.asarray(want.rows), np.asarray(got.rows))
    row5 = store.id_to_row["d5"]
    assert row5 in set(np.asarray(got.rows)[0].tolist())

    # Several more rounds of mixed updates stay incremental + identical.
    for j in range(6):
        i = int(rng.integers(0, 30))
        store.upsert([f"d{i}"], _emb(rng), [_doc(rng)],
                     [{"course": f"c{j % 3}"}])
        _check_identity(rng, store, idx, f"round {j}")
    assert idx.full_lexical_rebuilds == 0


def test_update_cycle_then_rebuild_replaces_diverged_base(engine):
    rng, store, idx = engine
    row = store.id_to_row["d7"]
    tokens_a = [
        VOCAB[t]
        for t, cnt in zip(*np.unique(
            store.term_ids[row][store.term_ids[row] >= 0],
            return_counts=True,
        ))
        for _ in range(cnt)
    ]
    # A -> B: base entries of d7 get tf=0 holes; B's entries go to overlay.
    store.upsert(["d7"], _emb(rng), [["w1", "w2", "w3"]], [{"course": "c1"}])
    _check_identity(rng, store, idx, "A->B")
    # B -> A: original content returns, but now lives in the OVERLAY
    # while its base positions remain zeroed on device.
    store.upsert(["d7"], _emb(rng), [tokens_a], [{"course": "c1"}])
    _check_identity(rng, store, idx, "B->A")
    assert idx.full_lexical_rebuilds == 0
    # Force the full-rebuild path: the fresh layout equals the stale
    # host copy (content cycled back), but the DEVICE copy diverged —
    # the _tail_diverged guard must re-place instead of skipping.
    idx._rebuild_lexical([row])
    assert idx.full_lexical_rebuilds == 1
    assert idx._ov_offsets_global is None
    _check_identity(rng, store, idx, "post-rebuild")


def test_infeasible_plan_falls_back_to_full_rebuild(engine, monkeypatch):
    rng, store, idx = engine
    # Make every plan infeasible.
    monkeypatch.setattr(
        "classmate_rag_tpu.index.lexical.plan_tail_delta",
        lambda *a, **k: None,
    )
    store.upsert(["d3"], _emb(rng), [_doc(rng)], [{"course": "c0"}])
    _check_identity(rng, store, idx, "fallback")
    assert idx.full_lexical_rebuilds == 1


def test_plan_tail_delta_unit():
    """Host-level planner semantics: neutralization + overlay compile."""
    from classmate_rag_tpu.index.lexical import plan_tail_delta

    # Base: term 0 -> rows [1, 4]; term 1 -> rows [2]; term 2 in head.
    lut = np.array([-1, -1, 0], np.int32)
    offsets = np.array([0, 2, 3, 3], np.int64)
    post_rows = np.array([1, 4, 2, 0, 0, 0], np.int32)
    overlay = {}
    # Row 4: old content (term 0 tf 2, term 2 tf 1) -> new (term 1 tf 3).
    old = (np.array([0, 2], np.int32), np.array([2, 1], np.uint8))
    new = (np.array([1], np.int32), np.array([3], np.uint8))
    plan = plan_tail_delta(
        lut, offsets, post_rows, overlay, [(4, old, new)],
        reserve=8, n_vocab=3,
    )
    assert plan is not None
    assert plan["zero_pos"].tolist() == [1]       # term 0's row-4 entry
    assert overlay == {1: {4: 3}}
    assert plan["ov_rows"].tolist() == [4]
    assert plan["ov_tfs"].tolist() == [3]
    assert plan["ov_offsets"].tolist() == [0, 0, 1, 1]

    # Updating the same row again must pull the entry back OUT of the
    # overlay (not zero anything new).
    old2 = (np.array([1], np.int32), np.array([3], np.uint8))
    new2 = (np.array([0], np.int32), np.array([1], np.uint8))
    plan2 = plan_tail_delta(
        lut, offsets, post_rows, overlay, [(4, old2, new2)],
        reserve=8, n_vocab=3,
    )
    assert plan2 is not None
    assert plan2["zero_pos"].tolist() == []
    assert overlay == {1: {}, 0: {4: 1}}
    assert plan2["ov_offsets"].tolist() == [0, 1, 1, 1]

    # Overflow -> infeasible.
    plan3 = plan_tail_delta(
        lut, offsets, post_rows, {},
        [(0, None, (np.arange(2, dtype=np.int32) * 0,
                    np.ones(2, np.uint8)))],
        reserve=0, n_vocab=3,
    )
    assert plan3 is None


# ---------------------------------------------------------------------------
# Single-device store: the same O(delta) maintenance (round 4)
# ---------------------------------------------------------------------------

def test_store_sync_is_incremental_after_small_deltas(tmp_path):
    """The single-chip store must not re-upload the slabs nor rebuild
    the split layout for small mutations (the round-3 behavior shipped
    the whole multi-GB device state and re-ran the O(N·L) layout build
    on ANY dirty flag). Counters pin the O(corpus) paths to the initial
    build; results stay oracle-exact throughout."""
    from classmate_rag_tpu.index.lexical import bm25_oracle_scores

    rng = np.random.default_rng(5)
    store = IndexStore(DIM, tmp_path, slab_rows=8, terms_per_chunk=16,
                       rescore="on", rescore_pool=16)
    n0 = 30
    store.upsert([f"d{i}" for i in range(n0)], _emb(rng, n0),
                 [_doc(rng) for _ in range(n0)], [{} for _ in range(n0)])

    def check(tag):
        q = _doc(rng)[:4]
        scores, rows = store.bm25_topk(q, None, 8)
        # Oracle over the VALID subset only (deleted rows leave the
        # corpus statistics entirely — subset-relative df/avgdl), with
        # tokens reconstructed from the packed state at tf multiplicity.
        inv = sorted(store.vocab, key=store.vocab.__getitem__)
        valid_rows = [r for r in range(store.n_rows) if store.valid[r]]
        toks = []
        for r in valid_rows:
            t = []
            for tid, tf in zip(store.term_ids[r], store.tfs[r]):
                if tid >= 0 and tf > 0:
                    t.extend([inv[tid]] * int(tf))
            toks.append(t)
        oracle = dict(zip(valid_rows, bm25_oracle_scores(toks, q)))
        for r, s in zip(rows, scores):
            if r >= 0:
                assert store.valid[r], tag
                assert abs(s - oracle[r]) < 1e-3, (tag, r, s, oracle[r])

    check("initial")
    assert store.split_full_builds == 1
    assert store.device_full_uploads == 1

    # Token overwrites, a within-capacity append, new-vocab terms, and
    # an A->B->A cycle — all must stay on the incremental path.
    for i in (1, 7, 22):
        store.upsert([f"d{i}"], _emb(rng), [_doc(rng)], [{}])
        check(f"overwrite d{i}")
    store.upsert(["d30"], _emb(rng), [_doc(rng)], [{}])
    check("append")
    store.upsert(["d4"], _emb(rng), [["yeti", "sasquatch", "w2"]], [{}])
    check("new vocab")
    scores, rows = store.bm25_topk(["yeti", "sasquatch"], None, 4)
    assert rows[0] == store.id_to_row["d4"]
    row9 = store.id_to_row["d9"]
    inv = sorted(store.vocab, key=store.vocab.__getitem__)
    a_tokens = [
        inv[tid]
        for tid, tf in zip(store.term_ids[row9], store.tfs[row9])
        if tid >= 0 and tf > 0
        for _ in range(int(tf))
    ]
    store.upsert(["d9"], _emb(rng), [["w1", "w2"]], [{}])
    check("A->B")
    store.upsert(["d9"], _emb(rng), [a_tokens], [{}])
    check("B->A")
    store.delete(["d3"])
    check("delete")
    assert store.split_full_builds == 1, "split layout was rebuilt"
    assert store.device_full_uploads == 1, "device slabs were re-uploaded"

    # Capacity growth IS structural: the full paths run once more.
    n_new = 8
    store.upsert([f"g{j}" for j in range(n_new)], _emb(rng, n_new),
                 [_doc(rng) for _ in range(n_new)],
                 [{} for _ in range(n_new)])
    check("growth")
    assert store.device_full_uploads == 2


def test_overlay_diff_span_unit():
    from classmate_rag_tpu.index.lexical import overlay_diff_span

    import numpy as np
    r = lambda *a: np.asarray(a, np.int32)
    t = lambda *a: np.asarray(a, np.uint8)
    empty = (np.zeros(0, np.int32), np.zeros(0, np.uint8))
    assert overlay_diff_span(r(), t(), empty) == (0, 0)
    assert overlay_diff_span(r(1, 2), t(1, 1), empty) == (0, 2)
    prev = (r(1, 2), t(1, 1))
    assert overlay_diff_span(r(1, 2), t(1, 1), prev) == (0, 0)   # no-op
    assert overlay_diff_span(r(1, 2, 3), t(1, 1, 2), prev) == (2, 3)
    assert overlay_diff_span(r(1, 9), t(1, 1), prev) == (1, 2)
    # Shrink: the stale tail must be zeroed.
    assert overlay_diff_span(r(1), t(1), prev) == (1, 2)


def test_old_capture_cap_forces_rebuild(tmp_path, monkeypatch):
    """Past _OLD_LEX_CAP the store stops snapshotting old row content;
    the next split sync must detect the dropped capture and take the
    full rebuild — never treat it as a fresh slot (which would skip
    neutralization and double-count the old terms)."""
    import classmate_rag_tpu.index.store as store_mod

    monkeypatch.setattr(store_mod, "_OLD_LEX_CAP", 2)
    rng = np.random.default_rng(9)
    store = IndexStore(DIM, tmp_path, slab_rows=16, terms_per_chunk=16)
    docs = [_doc(rng) for _ in range(10)]
    store.upsert([f"d{i}" for i in range(10)], _emb(rng, 10), docs,
                 [{} for _ in range(10)])
    store.bm25_topk(["w1"], None, 4)          # build split (full #1)
    assert store.split_full_builds == 1
    # Touch MORE rows than the cap without a sync in between.
    for i in range(5):
        store.upsert([f"d{i}"], _emb(rng), [_doc(rng)], [{}])
    scores, rows = store.bm25_topk(["w1"], None, 4)
    assert store.split_full_builds == 2       # fallback, not silence
    # Results stay oracle-exact after the rebuild.
    from classmate_rag_tpu.index.lexical import bm25_oracle_scores

    inv = sorted(store.vocab, key=store.vocab.__getitem__)
    toks = []
    for r in range(store.n_rows):
        t = []
        for tid, tf in zip(store.term_ids[r], store.tfs[r]):
            if tid >= 0 and tf > 0:
                t.extend([inv[tid]] * int(tf))
        toks.append(t)
    oracle = bm25_oracle_scores(toks, ["w1"])
    for r, s in zip(rows, scores):
        if r >= 0:
            assert abs(s - oracle[r]) < 1e-3


def test_runtime_warns_on_embedder_mismatch(tmp_index_env, caplog):
    import logging

    from classmate_rag_tpu.metadata import normalize_cli_metadata
    from classmate_rag_tpu.pipeline.ingest import ingest_file
    from classmate_rag_tpu.pipeline.runtime import get_runtime, reset_runtime

    import tempfile
    from pathlib import Path

    reset_runtime()
    rt = get_runtime(reload=True)
    p = Path(tempfile.mkdtemp()) / "m.txt"
    p.write_text("derivatives measure change")
    ingest_file(path=p, doc_meta=normalize_cli_metadata(), runtime=rt)
    rt.persist()
    assert rt.store.embedding_model  # stamped + persisted
    # Simulate an embedder swap: tamper the persisted registry tag.
    import json as _json

    reg = Path(rt.cfg.dense_dir) / "rows.json"
    rec = _json.loads(reg.read_text())
    rec["embedding_model"] = "some-other-model"
    reg.write_text(_json.dumps(rec))
    reset_runtime()
    with caplog.at_level(logging.WARNING):
        rt2 = get_runtime(reload=True)
    assert rt2.store.embedding_model == "some-other-model"
    assert any("mix feature spaces" in r.message for r in caplog.records)
    reset_runtime()


def test_runtime_never_stamps_nonempty_untagged_store(tmp_index_env, caplog):
    """A NON-empty persisted store with no recorded embedding model must
    not be silently stamped with the current embedder's name — that would
    make the mix-feature-spaces warning impossible to ever fire for
    exactly the migrations the tag exists for (review finding)."""
    import json as _json
    import logging
    from pathlib import Path

    from classmate_rag_tpu.metadata import normalize_cli_metadata
    from classmate_rag_tpu.pipeline.ingest import ingest_file
    from classmate_rag_tpu.pipeline.runtime import get_runtime, reset_runtime

    import tempfile

    reset_runtime()
    rt = get_runtime(reload=True)
    p = Path(tempfile.mkdtemp()) / "m.txt"
    p.write_text("integrals accumulate quantity")
    ingest_file(path=p, doc_meta=normalize_cli_metadata(), runtime=rt)
    rt.persist()
    # Simulate a pre-tagging save: drop the provenance tag entirely.
    reg = Path(rt.cfg.dense_dir) / "rows.json"
    rec = _json.loads(reg.read_text())
    rec.pop("embedding_model", None)
    reg.write_text(_json.dumps(rec))
    reset_runtime()
    with caplog.at_level(logging.WARNING):
        rt2 = get_runtime(reload=True)
    assert len(rt2.store) > 0
    assert rt2.store.embedding_model is None      # NOT adopted
    assert any("no recorded embedding model" in r.message
               for r in caplog.records)
    reset_runtime()
