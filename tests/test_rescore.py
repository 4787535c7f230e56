"""f16 rescore of the dense top pool (recall at scale).

The bf16 scan (7 mantissa bits) flips near-tie ranks that the f32 oracle
resolves; at 1M rows that costs measurable recall. With rescore enabled
the scan selects a wider pool which is re-scored from the f16 storage
master — these tests build embeddings whose score gaps are representable
in f16 but UNDER bf16 resolution, so the bf16-only path demonstrably
mis-ranks and the rescored path provably fixes it, identically across
the single-device and sharded topologies.
"""

import numpy as np
import pytest

from classmate_rag_tpu.index.store import IndexStore

DIM = 64
N = 64  # 8 rows per shard on the 8-device mesh


@pytest.fixture()
def near_tie_store(tmp_path):
    """Rows whose true-score gaps (4e-4, set along a query direction with
    an INDEPENDENT random orthogonal part per row) sit below bf16 dot
    noise but above f16's. The true ranking is a random permutation of
    row order, so monotone rounding can't accidentally preserve it."""
    rng = np.random.default_rng(7)
    q = rng.standard_normal(DIM).astype(np.float32)
    q /= np.linalg.norm(q)
    perm = rng.permutation(N)
    embs = np.zeros((N, DIM), np.float32)
    for i in range(N):
        t = 0.9 - 4e-4 * perm[i]
        r = rng.standard_normal(DIM).astype(np.float32)
        r -= (r @ q) * q
        r /= np.linalg.norm(r)
        embs[i] = t * q + np.sqrt(max(1 - t * t, 0.0)) * r
    store = IndexStore(
        DIM, tmp_path, slab_rows=8, terms_per_chunk=8, rescore="on",
        rescore_pool=32,
    )
    ids = [f"r{i}" for i in range(N)]
    tokens = [[f"t{i}"] for i in range(N)]
    store.upsert(ids, embs, tokens, [{} for _ in range(N)])
    true_top8 = [int(np.where(perm == rank)[0][0]) for rank in range(8)]
    return store, q, embs, true_top8


def test_rescore_recovers_f16_ranking(near_tie_store, tmp_path):
    store, q, embs, true_top8 = near_tie_store
    out = store.hybrid_topk_batch(q[None, :], [[]], None, top_k=8,
                                  use_mmr=False)
    rows = [int(r) for r in np.asarray(out.rows)[0]]
    assert rows == true_top8, (rows, true_top8)

    # The bf16-only path demonstrably mis-ranks the same corpus (sanity
    # that the fixture actually stresses bf16 resolution).
    store_off = IndexStore(
        DIM, tmp_path / "off", slab_rows=8, terms_per_chunk=8,
        rescore="off",
    )
    store_off.upsert(
        [f"r{i}" for i in range(N)], embs,
        [[f"t{i}"] for i in range(N)], [{} for _ in range(N)],
    )
    out_off = store_off.hybrid_topk_batch(q[None, :], [[]], None, top_k=8,
                                          use_mmr=False)
    rows_off = [int(r) for r in np.asarray(out_off.rows)[0]]
    assert rows_off != true_top8, (
        "fixture too easy: bf16 path ranked perfectly, rescore untestable"
    )


def test_rescore_sharded_identity(near_tie_store):
    """Sharded + rescore must equal single-device + rescore bit-for-bit
    (the merge takes the same global bf16 pool, then rescoring is
    replicated math)."""
    from classmate_rag_tpu.parallel import corpus_mesh
    from classmate_rag_tpu.parallel.serving import ShardedHybridIndex

    store, q, _embs, _true = near_tie_store
    q_vecs = np.stack([q, -q])
    terms = [["t0"], ["t1"]]
    single = store.hybrid_topk_batch(q_vecs, terms, None, top_k=6)
    idx = ShardedHybridIndex(store, corpus_mesh(8), top_k=6)
    assert idx._dev["emb16"] is not None, "rescore must ride the mesh"
    sharded = idx.query_batch(q_vecs, terms, None)
    assert np.array_equal(np.asarray(single.rows), np.asarray(sharded.rows))
    np.testing.assert_allclose(
        np.asarray(single.fused), np.asarray(sharded.fused), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(single.vec_dist), np.asarray(sharded.vec_dist),
        atol=1e-6, equal_nan=True,
    )


def test_rescore_respects_filters(near_tie_store):
    store, q, _embs, true_top8 = near_tie_store
    # Delete the true top row; rescore must not resurrect it.
    store.delete([f"r{true_top8[0]}"])
    out = store.hybrid_topk_batch(q[None, :], [[]], None, top_k=4,
                                  use_mmr=False)
    rows = [int(r) for r in np.asarray(out.rows)[0]]
    assert true_top8[0] not in rows
    assert rows == true_top8[1:5]


def test_select_mode_gating(tmp_path):
    """Approx selection requires the rescore (pool re-sort restores exact
    tie-breaks); auto gates on serving scale."""
    s = IndexStore(DIM, tmp_path / "a", slab_rows=8, rescore="off",
                   select="auto")
    assert s.select_mode == "exact"        # no rescore → no approx
    s2 = IndexStore(DIM, tmp_path / "b", slab_rows=8, rescore="on",
                    select="approx")
    assert s2.select_mode == "approx"      # forced, rescore active
    s3 = IndexStore(DIM, tmp_path / "c", slab_rows=8, rescore="on",
                    select="auto")
    assert s3.select_mode == "exact"       # tiny capacity under threshold
    s4 = IndexStore(DIM, tmp_path / "d", slab_rows=8, rescore="off",
                    select="approx")
    assert s4.select_mode == "exact"       # forced approx still needs rescore


def test_forced_approx_matches_exact_on_cpu(near_tie_store, tmp_path):
    """On the CPU backend approx_max_k lowers to the exact sort, so a
    forced-approx store must reproduce the exact path bit for bit —
    the identity CI keeps covering the approx code path."""
    store, q, embs, true_top8 = near_tie_store
    sa = IndexStore(DIM, tmp_path / "apx", slab_rows=8, terms_per_chunk=8,
                    rescore="on", rescore_pool=32, select="approx")
    sa.upsert([f"r{i}" for i in range(N)], embs,
              [[f"t{i}"] for i in range(N)], [{} for _ in range(N)])
    want = store.hybrid_topk_batch(q[None, :], [["t1"]], None, top_k=8)
    got = sa.hybrid_topk_batch(q[None, :], [["t1"]], None, top_k=8)
    assert np.array_equal(np.asarray(want.rows), np.asarray(got.rows))


def test_forced_approx_sharded_identity_on_cpu(near_tie_store):
    """Forced-approx + fast-BM25 over the 8-device mesh equals the
    forced-approx single-device path on CPU (where approx lowers to the
    exact sort) — the SPMD fast path stays covered by identity CI."""
    from classmate_rag_tpu.parallel import corpus_mesh
    from classmate_rag_tpu.parallel.serving import ShardedHybridIndex

    store, q, embs, _true = near_tie_store
    store.select = "approx"
    q_vecs = np.stack([q, -q])
    terms = [["t0", "t3"], ["t1"]]
    single = store.hybrid_topk_batch(q_vecs, terms, None, top_k=6)
    idx = ShardedHybridIndex(store, corpus_mesh(8), top_k=6)
    sharded = idx.query_batch(q_vecs, terms, None)
    assert np.array_equal(np.asarray(single.rows), np.asarray(sharded.rows))
    np.testing.assert_allclose(
        np.asarray(single.fused), np.asarray(sharded.fused), atol=1e-5
    )


def test_fast_bm25_exact_on_random_corpus(tmp_path):
    """Fast mode (bf16 sat + default-precision matmuls + exact pool
    rescore) must reproduce the exact path on a 1,000-row random corpus
    where the 64-wide pool is a REAL subset — hybrid top-k equality on
    CPU (approx selection lowers exact there, so any difference would be
    the fast scoring/rescore math)."""
    rng = np.random.default_rng(11)
    n, dim = 1000, 32
    vocab = [f"w{i}" for i in range(300)]
    docs = [
        [vocab[j] for j in rng.integers(0, len(vocab), rng.integers(5, 30))]
        for _ in range(n)
    ]
    embs = rng.standard_normal((n, dim)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    ids = [f"d{i}" for i in range(n)]

    stores = {}
    for mode in ("exact", "approx"):
        st = IndexStore(dim, tmp_path / mode, slab_rows=256,
                        terms_per_chunk=32, rescore="on", select=mode)
        st.upsert(ids, embs, docs, [{} for _ in range(n)])
        stores[mode] = st

    q_vecs = embs[:4] + 0.05 * rng.standard_normal((4, dim)).astype(np.float32)
    q_vecs /= np.linalg.norm(q_vecs, axis=1, keepdims=True)
    q_terms = [list(rng.choice(docs[i], 4)) for i in range(4)]
    want = stores["exact"].hybrid_topk_batch(q_vecs, q_terms, None, top_k=8)
    got = stores["approx"].hybrid_topk_batch(q_vecs, q_terms, None, top_k=8)
    assert np.array_equal(np.asarray(want.rows), np.asarray(got.rows))
    np.testing.assert_allclose(
        np.asarray(want.bm25_score), np.asarray(got.bm25_score),
        atol=1e-4, equal_nan=True,
    )
