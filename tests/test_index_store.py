"""IndexStore: upsert/delete/compact, filters, BM25 parity, persistence."""

import numpy as np
import pytest

from classmate_rag_tpu.index.catalog import Catalog, CatalogEntry
from classmate_rag_tpu.index.lexical import bm25_oracle_scores, tokenize
from classmate_rag_tpu.index.store import IndexStore

DIM = 32


def _mk_store(tmp_path, docs, metas=None):
    """docs: list[str]; builds aligned store + catalog with hash-ish embs."""
    rng = np.random.default_rng(7)
    store = IndexStore(DIM, tmp_path / "dense", slab_rows=64, terms_per_chunk=32)
    catalog = Catalog.load_or_create(tmp_path / "bm25")
    ids = [f"id{i}" for i in range(len(docs))]
    metas = metas or [{} for _ in docs]
    embs = rng.standard_normal((len(docs), DIM)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    tokens = [tokenize(t, "en") for t in docs]
    for i, cid in enumerate(ids):
        catalog.upsert(CatalogEntry(cid, docs[i], tokens[i], dict(metas[i])))
    store.upsert(ids, embs, tokens, metas)
    return store, catalog, ids, embs, tokens


DOCS = [
    "the derivative measures the rate of change of a function",
    "the integral accumulates the area under a curve",
    "matrix multiplication composes linear transformations",
    "eigenvalues and eigenvectors characterize linear maps",
    "derivative rules include the product rule and chain rule",
    "cooking pasta requires boiling water and adding salt",
]


def test_upsert_and_count(tmp_path):
    store, _, ids, _, _ = _mk_store(tmp_path, DOCS)
    assert len(store) == 6
    # Re-upsert is idempotent.
    rng = np.random.default_rng(1)
    e = rng.standard_normal((1, DIM)).astype(np.float32)
    store.upsert([ids[0]], e, [["new", "tokens"]], [{}])
    assert len(store) == 6
    assert store.n_rows == 6


def test_delete_is_real_and_compact_reclaims(tmp_path):
    store, _, ids, _, _ = _mk_store(tmp_path, DOCS)
    assert store.delete([ids[2], "missing-id"]) == 1
    assert len(store) == 5
    q = np.random.default_rng(3).standard_normal((1, DIM)).astype(np.float32)
    _, rows = store.dense_topk(q, None, 6)
    returned = {store.ids[r] for r in rows[0] if r >= 0}
    assert ids[2] not in returned
    assert store.compact() == 1
    assert store.n_rows == 5
    assert len(store) == 5


def test_reference_shaped_tag_flags_filter(tmp_path):
    """Metadata carrying tag_<slug>: True flags — the shape the
    reference persists and our ingest now writes — must drive the tag
    bitmask and match tag filters (and a legacy tags list still works)."""
    metas = [
        {"course": "calc", "tag_week1": True, "tag_exam": True},
        {"course": "calc", "tag_week2": True},
        {"course": "calc", "tags": ["week1"]},  # legacy list shape
        {"course": "calc"},
        {"course": "calc"},
        {"course": "calc"},
    ]
    store, _, ids, embs, _ = _mk_store(tmp_path, DOCS, metas)
    q = embs[0][None, :]
    _, rows = store.dense_topk(q, {"tags": ["week1"]}, 6)
    got = {store.ids[r] for r in rows[0] if r >= 0}
    assert got == {ids[0], ids[2]}
    _, rows = store.dense_topk(q, {"tags": ["week1", "exam"]}, 6)
    got = {store.ids[r] for r in rows[0] if r >= 0}
    assert got == {ids[0]}


def test_dense_topk_matches_oracle(tmp_path):
    store, _, ids, embs, _ = _mk_store(tmp_path, DOCS)
    q = embs[0][None, :]  # query = first doc's embedding
    scores, rows = store.dense_topk(q, None, 3)
    assert store.ids[rows[0][0]] == ids[0]
    # Exactness vs float16 oracle:
    oracle = np.argsort(-(embs.astype(np.float16).astype(np.float32) @ q[0]))[:3]
    assert rows[0].tolist() == oracle.tolist()


def test_metadata_filters(tmp_path):
    metas = [
        {"course": "calc", "tags": ["week1"]},
        {"course": "calc", "tags": ["week2"]},
        {"course": "linalg", "tags": ["week1"]},
        {"course": "linalg"},
        {"course": "calc", "language": "en"},
        {"course": "cooking"},
    ]
    store, _, ids, embs, _ = _mk_store(tmp_path, DOCS, metas)
    q = embs[5][None, :]
    # course filter
    _, rows = store.dense_topk(q, {"course": "calc"}, 6)
    got = {store.ids[r] for r in rows[0] if r >= 0}
    assert got == {ids[0], ids[1], ids[4]}
    # tag filter ANDs with course
    _, rows = store.dense_topk(q, {"course": "calc", "tags": ["week1"]}, 6)
    got = {store.ids[r] for r in rows[0] if r >= 0}
    assert got == {ids[0]}
    # unknown value matches nothing
    _, rows = store.dense_topk(q, {"course": "nope"}, 6)
    assert all(r < 0 for r in rows[0])
    # doc_type "other" sentinel never narrows
    _, rows = store.dense_topk(q, {"doc_type": "other"}, 6)
    assert sum(r >= 0 for r in rows[0]) == 6
    # language "auto" sentinel never narrows EITHER — and must not kill
    # the real constraints beside it ("auto" is never interned at
    # ingest, so the raw-store path used to hit the impossible marker
    # and drop every row, review finding r4).
    _, rows = store.dense_topk(q, {"language": "auto"}, 6)
    assert sum(r >= 0 for r in rows[0]) == 6
    _, rows = store.dense_topk(q, {"language": "auto", "course": "calc"}, 6)
    got = {store.ids[r] for r in rows[0] if r >= 0}
    assert got == {ids[0], ids[1], ids[4]}


def test_bm25_matches_okapi_oracle(tmp_path):
    store, _, ids, _, tokens = _mk_store(tmp_path, DOCS)
    query = tokenize("derivative rate of change rule", "en")
    scores, rows = store.bm25_topk(query, None, 6)
    oracle = bm25_oracle_scores(tokens, query)
    order = np.argsort(-np.asarray(oracle), kind="stable")
    got_rows = [r for r in rows if r >= 0]
    assert got_rows == order[: len(got_rows)].tolist()
    for r, s in zip(rows, scores):
        if r >= 0:
            assert abs(s - oracle[r]) < 1e-3, (r, s, oracle[r])


def test_bm25_subset_statistics_on_filter(tmp_path):
    """Filtered BM25 must use subset-relative df/avgdl (the reference
    rebuilds BM25Okapi over the filtered subset per query)."""
    metas = [{"course": "math"}] * 5 + [{"course": "food"}]
    store, _, ids, _, tokens = _mk_store(tmp_path, DOCS, metas)
    query = tokenize("derivative rule", "en")
    scores, rows = store.bm25_topk(query, {"course": "math"}, 5)
    subset_tokens = tokens[:5]
    oracle = bm25_oracle_scores(subset_tokens, query)
    for r, s in zip(rows, scores):
        if r >= 0:
            assert r < 5  # food row excluded
            assert abs(s - oracle[r]) < 1e-3


def test_bm25_duplicate_query_terms_double_weight(tmp_path):
    store, _, _, _, tokens = _mk_store(tmp_path, DOCS)
    s1, r1 = store.bm25_topk(["derivative"], None, 3)
    s2, r2 = store.bm25_topk(["derivative", "derivative"], None, 3)
    assert r1.tolist() == r2.tolist()
    live = r1 >= 0
    np.testing.assert_allclose(s2[live], 2.0 * s1[live], rtol=1e-5)


def test_save_load_roundtrip(tmp_path):
    store, catalog, ids, embs, _ = _mk_store(tmp_path, DOCS)
    store.delete([ids[1]])
    store.save()
    catalog.save()

    cat2 = Catalog.load_or_create(tmp_path / "bm25")
    store2 = IndexStore.load_or_create(
        DIM, tmp_path / "dense", cat2, slab_rows=64, terms_per_chunk=32
    )
    assert len(store2) == 5
    assert store2.ids[:6] == ids
    q = embs[0][None, :]
    s1, r1 = store.dense_topk(q, None, 5)
    s2, r2 = store2.dense_topk(q, None, 5)
    assert [store.ids[r] for r in r1[0] if r >= 0] == \
           [store2.ids[r] for r in r2[0] if r >= 0]
    # BM25 agrees after reload too (vocab rebuilt deterministically).
    b1 = store.bm25_topk(["derivative"], None, 4)
    b2 = store2.bm25_topk(["derivative"], None, 4)
    assert [store.ids[r] for r in b1[1] if r >= 0] == \
           [store2.ids[r] for r in b2[1] if r >= 0]


def test_torn_save_embeddings_registry_mismatch_is_detected(tmp_path):
    """Crash between _full_save's two renames (embeddings.npy updated,
    rows.json still old): positional id<->row pairing would be silent
    garbage (review finding r4). The emb_stat pairing must read the torn
    state as "no persisted dense state", never misalign."""
    import time

    import numpy as np

    store, catalog, ids, embs, _ = _mk_store(tmp_path, DOCS)
    store.save(catalog_fingerprint=catalog.fingerprint())
    catalog.save()
    # Simulate the torn window: a NEWER embeddings file (rows shuffled,
    # as a post-compact save would produce) lands while rows.json still
    # describes the old save.
    time.sleep(0.01)  # ensure a distinct mtime_ns
    shuffled = np.asarray(store.emb[: store.n_rows])[::-1].copy()
    with (tmp_path / "dense" / "embeddings.npy").open("wb") as f:
        np.save(f, shuffled)
    cat2 = Catalog.load_or_create(tmp_path / "bm25")
    store2 = IndexStore.load_or_create(
        DIM, tmp_path / "dense", cat2, slab_rows=64, terms_per_chunk=32
    )
    assert len(store2) == 0  # explicit empty, not silently wrong vectors


def test_df_host_incremental_consistency(tmp_path):
    """The host-maintained corpus df stays exactly equal to a fresh
    histogram through upserts / re-upserts / deletes / revivals, and is
    built O(corpus) only ONCE (df_full_builds counter)."""
    import numpy as np

    from classmate_rag_tpu.index.store import IndexStore

    rng = np.random.default_rng(11)
    store = IndexStore(8, tmp_path, slab_rows=64, terms_per_chunk=16)
    words = [f"t{i}" for i in range(40)]

    def rand_doc():
        return list(rng.choice(words, size=int(rng.integers(3, 12))))

    def fresh_df():
        nv = len(store.vocab)
        df = np.zeros(nv, np.int64)
        for r in range(store.n_rows):
            if not store.valid[r]:
                continue
            live = (store.term_ids[r] >= 0) & (store.tfs[r] > 0)
            df[store.term_ids[r][live]] += 1
        return df

    ids = [f"c{i}" for i in range(30)]
    emb = rng.standard_normal((30, 8)).astype(np.float32)
    store.upsert(ids, emb, [rand_doc() for _ in ids], [{} for _ in ids])
    got = store._ensure_df_host()
    assert store.df_full_builds == 1
    assert np.array_equal(got[: len(store.vocab)], fresh_df())

    for _ in range(25):
        op = rng.random()
        if op < 0.5:  # mutate / revive / add rows
            sel = list(rng.choice(40, size=3))
            cids = [f"c{i}" for i in sel]
            e = rng.standard_normal((3, 8)).astype(np.float32)
            store.upsert(cids, e, [rand_doc() for _ in cids],
                         [{} for _ in cids])
        else:
            sel = list(rng.choice(40, size=2))
            store.delete([f"c{i}" for i in sel])
        dfh = store._ensure_df_host()
        assert np.array_equal(dfh[: len(store.vocab)], fresh_df())
    assert store.df_full_builds == 1  # never rebuilt from scratch


def test_df_host_survives_save_load_and_deltas(tmp_path):
    """df persists in the lexical snapshot and is maintained through the
    O(delta) persisted-save chain on reload (no lazy O(N*L) rebuild)."""
    import numpy as np

    from classmate_rag_tpu.index.catalog import Catalog, CatalogEntry
    from classmate_rag_tpu.index.store import IndexStore

    rng = np.random.default_rng(5)
    cat_dir = tmp_path / "bm25"
    dense = tmp_path / "dense"
    cat = Catalog.load_or_create(cat_dir)
    store = IndexStore(8, dense, slab_rows=64, terms_per_chunk=16)
    words = [f"t{i}" for i in range(30)]

    def doc():
        return list(rng.choice(words, size=8))

    docs = [doc() for _ in range(20)]
    ids = [f"c{i}" for i in range(20)]
    emb = rng.standard_normal((20, 8)).astype(np.float32)
    store.upsert(ids, emb, docs, [{} for _ in ids])
    for cid, d in zip(ids, docs):
        cat.upsert(CatalogEntry(id=cid, text=" ".join(d), tokens=d,
                                metadata={}))
    cat.save()
    store.save(catalog_fingerprint=cat.fingerprint())

    # Delta save on top of the base.
    d2 = doc() + ["brandnewterm"]
    store.upsert(["c3"], rng.standard_normal((1, 8)).astype(np.float32),
                 [d2], [{}])
    cat.upsert(CatalogEntry(id="c3", text=" ".join(d2), tokens=d2,
                            metadata={}))
    cat.save()
    store.save(catalog_fingerprint=cat.fingerprint())

    re = IndexStore.load_or_create(8, dense, cat, slab_rows=64,
                                   terms_per_chunk=16)
    assert re._df_host is not None          # restored, not lazy
    assert re.df_full_builds == 0           # never rebuilt O(corpus)
    fresh = np.zeros(len(re.vocab), np.int64)
    for r in range(re.n_rows):
        if re.valid[r]:
            live = (re.term_ids[r] >= 0) & (re.tfs[r] > 0)
            fresh[re.term_ids[r][live]] += 1
    assert np.array_equal(
        re._ensure_df_host()[: len(re.vocab)], fresh
    )
    assert re.df_full_builds == 0
