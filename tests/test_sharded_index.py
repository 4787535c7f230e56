"""ShardedHybridIndex: the user-facing SPMD serving wrapper.

Wrapping an IndexStore over the 8-device mesh must reproduce the
single-device fused batch step exactly — rows bit-identical, fused scores
to float tolerance — for unfiltered and filtered queries.
"""

import numpy as np
import pytest

import jax

from classmate_rag_tpu.index.catalog import Catalog, CatalogEntry
from classmate_rag_tpu.index.lexical import tokenize
from classmate_rag_tpu.index.store import IndexStore

DIM = 48

DOCS = [
    "the derivative measures the rate of change of a function",
    "the integral accumulates the area under a curve",
    "matrix multiplication composes linear transformations",
    "eigenvalues and eigenvectors characterize linear maps",
    "derivative rules include the product rule and chain rule",
    "cooking pasta requires boiling water and adding salt",
    "gradient descent updates parameters against the gradient",
    "the chain rule differentiates composed functions",
    "bayes theorem inverts conditional probabilities",
    "variance measures spread around the mean",
]


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("shidx")
    rng = np.random.default_rng(13)
    store = IndexStore(DIM, tmp / "dense", slab_rows=16, terms_per_chunk=32)
    ids = [f"id{i}" for i in range(len(DOCS))]
    embs = rng.standard_normal((len(DOCS), DIM)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    tokens = [tokenize(t, "en") for t in DOCS]
    metas = [{"course": "math" if i < 6 else "misc"} for i in range(len(DOCS))]
    store.upsert(ids, embs, tokens, metas)
    return store, embs


def _queries(rng, n):
    q_vecs = rng.standard_normal((n, DIM)).astype(np.float32)
    q_vecs /= np.linalg.norm(q_vecs, axis=1, keepdims=True)
    terms = [
        tokenize("derivative chain rule", "en"),
        tokenize("pasta boiling water", "en"),
        tokenize("zzz unknown terms only", "en"),
    ][:n]
    return q_vecs, terms


class TestShardedHybridIndex:
    def test_matches_single_device_store_path(self, built):
        from classmate_rag_tpu.parallel import corpus_mesh
        from classmate_rag_tpu.parallel.serving import ShardedHybridIndex

        store, embs = built
        rng = np.random.default_rng(3)
        q_vecs, terms = _queries(rng, 3)

        single = store.hybrid_topk_batch(q_vecs, terms, None, top_k=4)
        sharded = ShardedHybridIndex(
            store, corpus_mesh(8), top_k=4
        ).query_batch(q_vecs, terms, None)
        assert np.array_equal(
            np.asarray(single.rows), np.asarray(sharded.rows)
        )
        np.testing.assert_allclose(
            np.asarray(single.fused), np.asarray(sharded.fused), atol=1e-5
        )

    def test_filtered_matches(self, built):
        from classmate_rag_tpu.parallel import corpus_mesh
        from classmate_rag_tpu.parallel.serving import ShardedHybridIndex

        store, embs = built
        rng = np.random.default_rng(4)
        q_vecs, terms = _queries(rng, 2)
        where = {"course": "math"}

        single = store.hybrid_topk_batch(q_vecs, terms, where, top_k=6)
        idx = ShardedHybridIndex(store, corpus_mesh(8), top_k=6)
        sharded = idx.query_batch(q_vecs, terms, where)
        assert np.array_equal(
            np.asarray(single.rows), np.asarray(sharded.rows)
        )
        rows = np.asarray(sharded.rows)
        assert ((rows < 6) | (rows == -1)).all()  # only 'math' rows pass
        # Bias cache: second call with the same filter reuses the entry.
        assert len(idx._bias_cache) == 1
        idx.query_batch(q_vecs, terms, where)
        assert len(idx._bias_cache) == 1

    def test_indivisible_capacity_rejected(self, tmp_path):
        from classmate_rag_tpu.parallel import corpus_mesh
        from classmate_rag_tpu.parallel.serving import ShardedHybridIndex

        store = IndexStore(DIM, tmp_path, slab_rows=12, terms_per_chunk=8)
        rng = np.random.default_rng(0)
        store.upsert(
            ["a"], rng.standard_normal((1, DIM)).astype(np.float32),
            [["alpha"]], [{}],
        )
        with pytest.raises(ValueError, match="divide"):
            ShardedHybridIndex(store, corpus_mesh(8))


def test_stats_shard_occupancy(built):
    from classmate_rag_tpu.parallel import corpus_mesh
    from classmate_rag_tpu.parallel.serving import ShardedHybridIndex

    store, _ = built
    idx = ShardedHybridIndex(store, corpus_mesh(8))
    s = idx.stats()
    assert s["n_shards"] == 8
    assert sum(s["rows_per_shard"]) == len(store)
    assert len(s["tail_postings_per_shard"]) == 8
    assert s["capacity_per_shard"] * 8 == store.capacity
