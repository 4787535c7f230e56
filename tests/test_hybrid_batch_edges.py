"""Edge cases of the fused batched hybrid step."""

import numpy as np
import pytest

from classmate_rag_tpu.index.catalog import Catalog, CatalogEntry
from classmate_rag_tpu.index.lexical import tokenize
from classmate_rag_tpu.index.store import IndexStore

DIM = 32

DOCS = [
    "the derivative measures the rate of change of a function",
    "matrix multiplication composes linear transformations",
    "cooking pasta requires boiling water and adding salt",
    "gradient descent updates parameters against the gradient",
]


@pytest.fixture(scope="module")
def store():
    import tempfile
    from pathlib import Path

    rng = np.random.default_rng(21)
    st = IndexStore(DIM, Path(tempfile.mkdtemp()), slab_rows=16,
                    terms_per_chunk=32)
    embs = rng.standard_normal((len(DOCS), DIM)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    st.upsert(
        [f"id{i}" for i in range(len(DOCS))], embs,
        [tokenize(t, "en") for t in DOCS],
        [{"course": "x"} for _ in DOCS],
    )
    return st, embs


def test_batch_with_unknown_terms_query(store):
    """A query whose terms are all out-of-vocab gets dense-only results."""
    st, embs = store
    out = st.hybrid_topk_batch(
        embs[:2], [["zzz", "qqq"], ["derivative"]], None, top_k=3,
    )
    rows = np.asarray(out.rows)
    bm = np.asarray(out.bm25_score)
    # Query 0: no vocab-known terms → every returned row is dense-only.
    alive0 = rows[0] >= 0
    assert alive0.any()
    assert np.all(np.isnan(bm[0][alive0]))
    # Query 1 has a bm25 contribution somewhere.
    alive1 = rows[1] >= 0
    assert np.any(~np.isnan(bm[1][alive1]))


def test_batch_all_head_or_all_tail(store):
    """Batches whose terms are exclusively head or exclusively tail work."""
    st, embs = store
    split = st._sync_split()
    lut = np.asarray(split["lut"])
    head_terms = [t for t, tid in st.vocab.items() if lut[tid] >= 0]
    tail_terms = [t for t, tid in st.vocab.items() if lut[tid] < 0]
    for terms in ([head_terms[:2]] if head_terms else []) + (
        [tail_terms[:2]] if tail_terms else []
    ):
        out = st.hybrid_topk_batch(embs[:1], [terms], None, top_k=3)
        assert np.asarray(out.rows).shape == (1, 3)


def test_batch_filter_no_match(store):
    st, embs = store
    out = st.hybrid_topk_batch(
        embs[:2], [["derivative"], ["pasta"]], {"course": "nope"}, top_k=3,
    )
    assert np.all(np.asarray(out.rows) == -1)


def test_single_row_corpus_tiny_ks():
    import tempfile
    from pathlib import Path

    rng = np.random.default_rng(5)
    st = IndexStore(DIM, Path(tempfile.mkdtemp()), slab_rows=8,
                    terms_per_chunk=8)
    e = rng.standard_normal((1, DIM)).astype(np.float32)
    st.upsert(["only"], e, [["alpha", "beta"]], [{}])
    out = st.hybrid_topk_batch(e, [["alpha"]], None, top_k=8)
    rows = np.asarray(out.rows)[0]
    assert rows[0] == 0
    assert np.all(rows[1:] == -1)
