"""Split-frequency BM25 must match the gather formulation exactly-ish.

The split path (head matmul + batch-union tail matmul) and the gather path
(okapi_score_rows) are two formulations of the same Okapi math; scores must
agree to float tolerance on random corpora, filtered and unfiltered,
including head/tail boundary terms.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from classmate_rag_tpu.index.lexical import (
    device_fns,
    okapi_idf,
    okapi_query_weights,
    okapi_score_rows,
    split_fns,
)
from classmate_rag_tpu.index.store import IndexStore


@pytest.fixture(scope="module")
def store():
    rng = np.random.default_rng(3)
    n, dim = 600, 16
    st = IndexStore(dim, "/tmp/unused-split-test", slab_rows=128,
                    terms_per_chunk=24)
    # Force a meaningful head/tail split on a small corpus.
    st.HEAD_DF_THRESHOLD = 8
    vocab_words = [f"t{i}" for i in range(120)]
    weights = 1.0 / np.arange(1, len(vocab_words) + 1)
    weights /= weights.sum()
    docs = []
    for _ in range(n):
        k = rng.integers(5, 20)
        docs.append([vocab_words[i] for i in rng.choice(len(vocab_words),
                                                        size=k, p=weights)])
    embs = rng.standard_normal((n, dim)).astype(np.float32)
    metas = [{"course": "a" if i % 3 else "b"} for i in range(n)]
    st.upsert([f"d{i}" for i in range(n)], embs, docs, metas)
    return st, docs


def _scores_both(st, q_tids, q_counts, where):
    dev = st._sync_device()
    bias = st._mask_bias(where)
    subset_df, _ = device_fns()
    df = subset_df(dev["term_ids"], dev["tfs"], bias == 0.0, st.vocab_pad)
    keep = np.asarray(bias) == 0
    n_sub = float(max(keep.sum(), 1))
    idf = okapi_idf(df, jnp.float32(n_sub))
    avgdl = float((np.asarray(dev["doc_len"]) * keep).sum() / n_sub)

    gather = np.stack([
        np.asarray(okapi_score_rows(
            dev["term_ids"], dev["tfs"], dev["doc_len"], jnp.float32(avgdl),
            okapi_query_weights(idf, jnp.asarray(q_tids[b]),
                                jnp.asarray(q_counts[b]), st.vocab_pad),
            st.vocab_pad,
        )) for b in range(q_tids.shape[0])
    ]) * keep[None, :]

    split = st._sync_split()
    qa = st._split_query_arrays(q_tids, q_counts)
    scores_fn, _ = split_fns()
    split_scores = np.asarray(scores_fn(
        split["tf_head"], split["post_rows"], split["post_tfs"],
        dev["doc_len"], bias, df,
        jnp.asarray(qa["h_slots"]), jnp.asarray(qa["h_tids"]),
        jnp.asarray(qa["u_starts"]), jnp.asarray(qa["u_lens"]),
        jnp.asarray(qa["u_cols"]), jnp.asarray(qa["t_tids"]),
        jnp.asarray(q_tids), jnp.asarray(q_counts),
        vocab_pad=st.vocab_pad, r_cap=split["r_cap"],
    ))
    return gather, split_scores


def _query_arrays(st, term_lists, m=16):
    b = len(term_lists)
    q_tids = np.full((b, m), -1, np.int32)
    q_counts = np.zeros((b, m), np.float32)
    for i, terms in enumerate(term_lists):
        counts = {}
        for t in terms:
            tid = st.vocab.get(t)
            if tid is not None:
                counts[tid] = counts.get(tid, 0.0) + 1.0
        for j, (tid, c) in enumerate(list(counts.items())[:m]):
            q_tids[i, j] = tid
            q_counts[i, j] = c
    return q_tids, q_counts


def test_split_structure_nontrivial(store):
    st, _ = store
    split = st._sync_split()
    assert split["tf_head"].shape[0] >= 128
    assert int((np.asarray(split["lut"]) >= 0).sum()) > 0  # some head terms
    assert int(split["offsets"][-1]) > 0                   # some tail postings


@pytest.mark.parametrize("where", [None, {"course": "a"}])
def test_split_matches_gather(store, where):
    st, docs = store
    rng = np.random.default_rng(9)
    queries = []
    for _ in range(6):
        doc = docs[int(rng.integers(0, len(docs)))]
        queries.append(list(rng.choice(doc, size=min(4, len(doc)),
                                       replace=False)))
    queries.append(["t0", "t0", "t1"])        # duplicate head terms
    queries.append(["t119"])                  # rare tail term
    q_tids, q_counts = _query_arrays(st, queries)
    gather, split = _scores_both(st, q_tids, q_counts, where)
    np.testing.assert_allclose(split, gather, atol=2e-4, rtol=2e-4)


def _split_scores_for_layout(st, layout, q_tids, q_counts, where=None):
    """Score through the split kernel using an explicit layout (lets the
    tests force tiny segment caps / head budgets)."""
    from classmate_rag_tpu.index.lexical import split_query_arrays

    dev = st._sync_device()
    bias = st._mask_bias(where)
    subset_df, _ = device_fns()
    df = subset_df(dev["term_ids"], dev["tfs"], bias == 0.0, st.vocab_pad)
    qa = split_query_arrays(
        layout["lut"], layout["offsets"], q_tids, q_counts,
        r_cap=layout["r_cap"],
    )
    scores_fn, _ = split_fns()
    return np.asarray(scores_fn(
        jnp.asarray(layout["tf_head"]), jnp.asarray(layout["post_rows"]),
        jnp.asarray(layout["post_tfs"]), dev["doc_len"], bias, df,
        jnp.asarray(qa["h_slots"]), jnp.asarray(qa["h_tids"]),
        jnp.asarray(qa["u_starts"]), jnp.asarray(qa["u_lens"]),
        jnp.asarray(qa["u_cols"]), jnp.asarray(qa["t_tids"]),
        jnp.asarray(q_tids), jnp.asarray(q_counts),
        vocab_pad=st.vocab_pad, r_cap=layout["r_cap"],
    )), qa


def test_segmented_tail_matches_gather(store):
    """Posting lists longer than seg_cap split into multiple segments and
    still score exactly like the unsegmented gather formulation."""
    from classmate_rag_tpu.index.lexical import build_split_layout

    st, docs = store
    # Threshold above any df: every term (high-df ones included) lands in
    # the segmented tail.
    layout = build_split_layout(
        st.term_ids, st.tfs, len(st.vocab),
        head_bytes_budget=1 << 30, head_df_threshold=10**6, seg_cap=8,
    )
    assert layout["r_cap"] == 8
    # Pick tail terms with df > seg_cap so segmentation actually happens.
    lens = np.diff(layout["offsets"])
    lut = layout["lut"]
    long_tail = [
        t for t in range(len(lens)) if lut[t] < 0 and lens[t] > 8
    ]
    assert long_tail, "fixture corpus must have tail terms with df > 8"
    q_tids = np.full((2, 16), -1, np.int32)
    q_counts = np.zeros((2, 16), np.float32)
    q_tids[0, : min(3, len(long_tail))] = long_tail[:3]
    q_counts[0, : min(3, len(long_tail))] = 1.0
    q_tids[1, 0] = long_tail[0]
    q_counts[1, 0] = 2.0  # multiplicity through segments

    split_scores, qa = _split_scores_for_layout(st, layout, q_tids, q_counts)
    n_slots_for_first = int((qa["u_tids"] == long_tail[0]).sum())
    assert n_slots_for_first > 1  # really segmented

    gather = _scores_both(st, q_tids, q_counts, None)[0]
    np.testing.assert_allclose(split_scores, gather, atol=2e-4, rtol=2e-4)


def test_head_overflow_degrades_to_segmented_tail():
    """With the head budget too small for the df spectrum (>128 terms
    above the threshold but budget floor of 128 head rows), overflow
    terms fall to the segmented tail: r_cap stays at seg_cap and scores
    still match the gather formulation."""
    from classmate_rag_tpu.index.lexical import build_split_layout

    rng = np.random.default_rng(17)
    n, dim, v = 500, 8, 400
    st = IndexStore(dim, "/tmp/unused-overflow-test", slab_rows=128,
                    terms_per_chunk=24)
    st.HEAD_DF_THRESHOLD = 2
    vocab_words = [f"w{i}" for i in range(v)]
    docs = []
    for _ in range(n):
        k = int(rng.integers(8, 20))
        docs.append([vocab_words[i]
                     for i in rng.integers(0, v, size=k)])
    embs = rng.standard_normal((n, dim)).astype(np.float32)
    st.upsert([f"d{i}" for i in range(n)], embs, docs, [{}] * n)

    layout = build_split_layout(
        st.term_ids, st.tfs, len(st.vocab),
        head_bytes_budget=1, head_df_threshold=2, seg_cap=16,
    )
    assert layout["n_overflow"] > 0          # budget forced an overflow
    assert layout["r_cap"] <= 16             # ...but r_cap stays capped

    queries = []
    for _ in range(4):
        doc = docs[int(rng.integers(0, len(docs)))]
        queries.append(list(rng.choice(doc, size=min(4, len(doc)),
                                       replace=False)))
    q_tids, q_counts = _query_arrays(st, queries)
    split_scores, _ = _split_scores_for_layout(st, layout, q_tids, q_counts)
    gather = _scores_both(st, q_tids, q_counts, None)[0]
    np.testing.assert_allclose(split_scores, gather, atol=2e-4, rtol=2e-4)


def test_split_after_delete(store):
    st, docs = store
    st.delete(["d0", "d1", "d2"])
    q_tids, q_counts = _query_arrays(st, [["t0", "t5"]])
    gather, split = _scores_both(st, q_tids, q_counts, None)
    np.testing.assert_allclose(split, gather, atol=2e-4, rtol=2e-4)
    assert split[0, 0] == 0.0  # tombstoned rows score zero

def test_head_self_sizes_to_budget():
    """When more terms qualify (df > threshold) than the byte budget can
    hold, the layout keeps the heaviest terms and reports the DERIVED df
    threshold — every term above it is in the head by construction."""
    from classmate_rag_tpu.index.lexical import build_split_layout

    rng = np.random.default_rng(0)
    n, width, vocab = 512, 24, 400
    term_ids = rng.integers(0, vocab, (n, width)).astype(np.int32)
    tfs = np.ones((n, width), np.uint8)
    # 150 head slots (past the 128 floor) against ~400 qualifying terms:
    # the budget genuinely overflows and the threshold must self-size.
    layout = build_split_layout(
        term_ids, tfs, vocab, head_bytes_budget=150 * n,
        head_df_threshold=1,
    )
    df = np.bincount(
        term_ids[(term_ids >= 0) & (tfs > 0)].ravel(), minlength=vocab
    )
    head = np.flatnonzero(layout["lut"] >= 0)
    assert layout["n_overflow"] > 0  # overflow really happened
    assert len(head) <= 150
    thr = layout["df_threshold"]
    assert thr > 1  # derived cut rose above the requested threshold
    # Invariant: every term with df > derived threshold is in the head.
    for t in range(vocab):
        if df[t] > thr:
            assert layout["lut"][t] >= 0, (t, df[t], thr)
    # And the head holds the heaviest terms: min head df >= max tail df
    # among qualifying terms (ties allowed).
    tail_q = [t for t in range(vocab) if layout["lut"][t] < 0 and df[t] > 1]
    if tail_q and len(head):
        assert df[head].min() >= max(df[t] for t in tail_q)
