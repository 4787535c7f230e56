"""O(delta) store persistence: save() appends lexical.delta_NNNN.npz
files chained by catalog fingerprints instead of rewriting the multi-GB
embeddings + lexical base at serving scale.

Contract: after any sequence of (upsert/delete/save) the reloaded store
is column-identical to the live one; the base embeddings.npy is byte-
untouched by delta saves; any chain break (foreign catalog edit, missing
delta) falls back to the catalog rebuild.
"""

import numpy as np

from classmate_rag_tpu.index.catalog import Catalog, CatalogEntry
from classmate_rag_tpu.index.lexical import tokenize
from classmate_rag_tpu.index.store import IndexStore

DIM = 16


def _mk(tmp_path, n=6):
    rng = np.random.default_rng(5)
    store = IndexStore(DIM, tmp_path / "dense", slab_rows=8,
                       terms_per_chunk=16)
    catalog = Catalog.load_or_create(tmp_path / "bm25")
    texts = [f"document number {i} about topic{i % 3} stuff" for i in range(n)]
    ids = [f"id{i}" for i in range(n)]
    embs = rng.standard_normal((n, DIM)).astype(np.float32)
    tokens = [tokenize(t, "en") for t in texts]
    metas = [{"course": "c1"} for _ in range(n)]
    for i, cid in enumerate(ids):
        catalog.upsert(CatalogEntry(cid, texts[i], tokens[i], metas[i]))
    store.upsert(ids, embs, tokens, metas)
    catalog.save()
    store.save(catalog_fingerprint=catalog.fingerprint())
    return store, catalog, rng


def _persist_both(store, catalog):
    catalog.save()
    store.save(catalog_fingerprint=catalog.fingerprint())


def _reload(tmp_path, catalog):
    return IndexStore.load_or_create(
        DIM, tmp_path / "dense", catalog, slab_rows=8, terms_per_chunk=16
    )


def _assert_same(a: IndexStore, b: IndexStore):
    n = a.n_rows
    assert b.n_rows == n
    assert a.ids == b.ids
    assert np.array_equal(a.valid[:n], b.valid[:n])
    assert np.array_equal(a.emb[:n], b.emb[:n])
    assert np.array_equal(a.term_ids[:n], b.term_ids[:n])
    assert np.array_equal(a.tfs[:n], b.tfs[:n])
    assert np.array_equal(a.doc_len[:n], b.doc_len[:n])
    assert np.array_equal(a.field_cols[:, :n], b.field_cols[:, :n])
    assert np.array_equal(a.tag_bits[:n], b.tag_bits[:n])
    assert a.vocab == b.vocab
    assert a.tag_slots == b.tag_slots


def _add(store, catalog, rng, i, text=None, course="c1"):
    text = text or f"added entry {i} with brandnew{i} term"
    toks = tokenize(text, "en")
    catalog.upsert(CatalogEntry(f"new{i}", text, toks, {"course": course}))
    store.upsert([f"new{i}"],
                 rng.standard_normal((1, DIM)).astype(np.float32),
                 [toks], [{"course": course}])


def test_small_add_is_delta_not_rewrite(tmp_path):
    store, catalog, rng = _mk(tmp_path, n=6)
    dense = tmp_path / "dense"
    emb_bytes = (dense / "embeddings.npy").read_bytes()
    base_bytes = (dense / "lexical.npz").read_bytes()

    _add(store, catalog, rng, 0)
    _persist_both(store, catalog)

    # O(delta): base artifacts untouched, one delta file appended.
    assert (dense / "embeddings.npy").read_bytes() == emb_bytes
    assert (dense / "lexical.npz").read_bytes() == base_bytes
    deltas = sorted(dense.glob("lexical.delta_*.npz"))
    assert len(deltas) == 1

    loaded = _reload(tmp_path, catalog)
    _assert_same(store, loaded)
    # New vocab term restored through the vocab delta.
    assert "brandnew" in loaded.vocab
    row = loaded.id_to_row["new0"]
    assert loaded.valid[row]


def test_delete_via_delta(tmp_path):
    store, catalog, rng = _mk(tmp_path, n=6)
    catalog.delete(["id2"])
    store.delete(["id2"])
    _persist_both(store, catalog)
    loaded = _reload(tmp_path, catalog)
    _assert_same(store, loaded)
    assert not loaded.valid[loaded.id_to_row["id2"]]


def test_chained_deltas_roundtrip(tmp_path):
    store, catalog, rng = _mk(tmp_path, n=6)
    for k in range(4):
        _add(store, catalog, rng, k)
        if k == 2:
            catalog.delete(["id1"])
            store.delete(["id1"])
        _persist_both(store, catalog)
    dense = tmp_path / "dense"
    assert len(list(dense.glob("lexical.delta_*.npz"))) >= 2
    loaded = _reload(tmp_path, catalog)
    _assert_same(store, loaded)
    # Reloaded store keeps appending deltas consistently.
    _add(loaded, catalog, rng, 99)
    _persist_both(loaded, catalog)
    again = _reload(tmp_path, catalog)
    _assert_same(loaded, again)


def test_foreign_catalog_edit_breaks_chain_and_rebuilds(tmp_path):
    store, catalog, rng = _mk(tmp_path, n=6)
    _add(store, catalog, rng, 0)
    _persist_both(store, catalog)

    # Foreign edit: catalog mutated WITHOUT a store save afterwards.
    catalog.upsert(CatalogEntry(
        "ghost", "ghost entry", tokenize("ghost entry", "en"), {}
    ))
    catalog.save()

    loaded = _reload(tmp_path, catalog)
    # Chain tail no longer matches the live fingerprint: the store falls
    # back to the catalog rebuild; persisted rows stay queryable.
    n = store.n_rows
    assert loaded.n_rows >= 6
    for cid in ["id0", "id5"]:
        assert loaded.valid[loaded.id_to_row[cid]]
    # Next save self-heals to a fresh full base (no stale deltas).
    loaded.save(catalog_fingerprint=catalog.fingerprint())
    assert not list((tmp_path / "dense").glob("lexical.delta_*.npz"))
    again = _reload(tmp_path, catalog)
    _assert_same(loaded, again)


def test_large_delta_triggers_full_rewrite(tmp_path):
    store, catalog, rng = _mk(tmp_path, n=6)
    # Touch every row (>25% threshold): save() must fold to a full base.
    n = store.n_rows
    ids = [f"id{i}" for i in range(n)]
    embs = rng.standard_normal((n, DIM)).astype(np.float32)
    toks = [tokenize(f"rewritten {i}", "en") for i in range(n)]
    for i, cid in enumerate(ids):
        catalog.upsert(CatalogEntry(cid, f"rewritten {i}", toks[i], {}))
    store.upsert(ids, embs, toks, [{} for _ in range(n)])
    _persist_both(store, catalog)
    assert not list((tmp_path / "dense").glob("lexical.delta_*.npz"))
    loaded = _reload(tmp_path, catalog)
    _assert_same(store, loaded)


def test_compact_forces_full_save(tmp_path):
    store, catalog, rng = _mk(tmp_path, n=6)
    catalog.delete(["id3"])
    store.delete(["id3"])
    store.compact()
    _persist_both(store, catalog)
    assert not list((tmp_path / "dense").glob("lexical.delta_*.npz"))
    loaded = _reload(tmp_path, catalog)
    _assert_same(store, loaded)


def test_noop_save_writes_nothing(tmp_path):
    store, catalog, rng = _mk(tmp_path, n=6)
    dense = tmp_path / "dense"
    before = {p.name: p.stat().st_mtime_ns for p in dense.iterdir()}
    store.save(catalog_fingerprint=catalog.fingerprint())
    after = {p.name: p.stat().st_mtime_ns for p in dense.iterdir()}
    assert before == after


def test_stateful_delta_fuzz_vs_reload(tmp_path):
    import random

    rng = np.random.default_rng(11)
    pr = random.Random(11)
    store, catalog, _ = _mk(tmp_path, n=4)
    next_id = 100
    for step in range(60):
        op = pr.random()
        if op < 0.45:
            _add(store, catalog, rng, next_id, course=f"c{step % 3}")
            next_id += 1
        elif op < 0.65 and store.n_rows:
            cid = pr.choice(store.ids)
            catalog.delete([cid])
            store.delete([cid])
        elif op < 0.9:
            _persist_both(store, catalog)
        else:
            _persist_both(store, catalog)
            store = _reload(tmp_path, catalog)
    _persist_both(store, catalog)
    final = _reload(tmp_path, catalog)
    _assert_same(store, final)
