"""The fused hybrid query step: ONE compiled dispatch per query batch.

Serving-oriented composition of the whole retrieval math — masked dense
exact-scan + MMR + subset-statistics BM25 + weighted RRF — as a single jit.
The per-query path (retrieval/hybrid.py) makes 4-5 device dispatches per
question; through a remote-TPU link each dispatch costs ~ms, so the fused
batch step is where serving QPS comes from:

- the dense matmul amortizes the corpus read across the whole batch;
- BM25 vmaps the gather pass (per-query idf-weight vectors);
- MMR and RRF are vmapped tiny ops;
- everything shares one mask-bias prologue.

Returns top_k rows per query with fused/vector/bm25 scores — the same
numbers the per-query path produces.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from classmate_rag_tpu.index.lexical import (
    okapi_idf,
    okapi_query_weights,
    okapi_score_rows,
)
from classmate_rag_tpu.ops.mmr import mmr_order

from classmate_rag_tpu.utils.numerics import NEG_INF  # noqa: E402


class HybridBatchResult(NamedTuple):
    rows: jnp.ndarray        # [B, top_k] int32, -1 padded
    fused: jnp.ndarray       # [B, top_k] f32
    vec_dist: jnp.ndarray    # [B, top_k] f32 (NaN where dense didn't return)
    bm25_score: jnp.ndarray  # [B, top_k] f32 (NaN where bm25 didn't return)


# Above this corpus size the dense scan routes through the Pallas
# per-tile top-k kernel: it skips the [Q, N] f32 score materialization
# that XLA's einsum+top_k pays (measured 1.18-1.19x at 200k and 1M rows;
# parity below, where the score buffer is small).
_PALLAS_SCAN_MIN_ROWS = 150_000


def use_pallas_scan(n_rows: int) -> bool:
    """Default dense-scorer choice: Pallas on a real TPU at large N.

    Exposed so the sharded SPMD path can make the SAME choice from the
    GLOBAL corpus size: per-row scores are identical only when both
    topologies run the same scorer (the Pallas per-tile dot and XLA's
    whole-matrix einsum accumulate f32 partials in different orders,
    which can flip near-tie top-k picks) — this is what keeps the
    sharded-vs-single bit-identity invariant true at serving scale,
    not just at test sizes.
    """
    import jax

    return (
        n_rows >= _PALLAS_SCAN_MIN_ROWS
        and jax.default_backend() == "tpu"
    )


def rescore_candidates(q_vecs, cand16, d_rows, d_vals):
    """f16-exact rescore of a bf16-selected candidate pool.

    The scan matmul runs in bf16 (7 mantissa bits) for HBM-bandwidth and
    MXU reasons; at 1M rows its rounding flips enough near-tie ranks to
    cost measurable recall vs the f32 oracle. The fix is surgical: the
    tiny top-``R`` pool (R = rescore_pool) gets re-scored from the f16
    storage master — B·R·d extra FLOPs, invisible next to the B·N·d scan
    — and re-sorted by (score desc, row asc), the same tie-break the
    scan's top_k used. Returns (d_rows, d_vals, alive) re-ordered.
    """
    # HIGHEST precision is load-bearing: a DEFAULT-precision f32 matmul
    # on TPU runs one bf16 pass, re-rounding the f16 inputs to bf16 and
    # silently undoing the extra 3 mantissa bits this rescore exists to
    # recover. The pool matmul is B*R*d — even 6 passes are invisible
    # next to the B*N*d scan.
    rescored = jnp.einsum(
        "bd,brd->br", q_vecs.astype(jnp.float32),
        cand16.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    alive = d_vals > NEG_INF / 2
    vals = jnp.where(alive, rescored, NEG_INF)
    order = jnp.lexsort((d_rows, -vals))
    rows = jnp.take_along_axis(d_rows, order, axis=1)
    vals = jnp.take_along_axis(vals, order, axis=1)
    return rows, vals, order


# Per-element recall target for the approx (PartialReduce) selection.
# Measured at 1M rows / k=128 with bench-realistic queries: top-64
# containment 1.00000 (the f16 rescore then orders the pool exactly).
_APPROX_RECALL_TARGET = 0.999


def _dense_branch(emb, mask_bias, q_vecs, *, k_vector, pool, use_mmr,
                  mmr_lambda, use_pallas=None, emb16=None,
                  rescore_pool=64, select="exact"):
    """Batched masked dense scan (+MMR) → (vec_rows, vec_dist) [B, kv].

    With ``emb16`` (the f16 storage master on device) the bf16 scan
    selects a wider ``rescore_pool`` that is then f16-rescored before
    MMR/truncation — see :func:`rescore_candidates`.

    ``select="approx"`` routes the pool selection through the TPU's
    native PartialReduce (``lax.approx_max_k``): 6-10x faster than exact
    top_k at 1M rows (60 → 6.3 ms measured) with per-element recall
    ≥0.999 — requires ``emb16`` so the rescore re-sorts the pool with
    the exact (score desc, row asc) tie-break. On CPU approx_max_k
    lowers to the exact sort, so tests see identical results.
    """
    pool_eff = min(pool if use_mmr else k_vector, emb.shape[0])
    sel = pool_eff if emb16 is None else min(
        max(rescore_pool, pool_eff), emb.shape[0]
    )
    if select == "approx" and emb16 is not None:
        scores = jnp.einsum(
            "qd,nd->qn", q_vecs.astype(emb.dtype), emb,
            preferred_element_type=jnp.float32,
        ) + mask_bias[None, :]
        d_vals, d_rows = jax.lax.approx_max_k(
            scores, sel, recall_target=_APPROX_RECALL_TARGET
        )
    else:
        if use_pallas is None:
            use_pallas = use_pallas_scan(emb.shape[0])
        if use_pallas:
            from classmate_rag_tpu.ops.topk import topk_pallas

            d_vals, d_rows = topk_pallas(
                emb, q_vecs.astype(jnp.float32), mask_bias, sel
            )
        else:
            scores = jnp.einsum(
                "qd,nd->qn", q_vecs.astype(emb.dtype), emb,
                preferred_element_type=jnp.float32,
            ) + mask_bias[None, :]
            d_vals, d_rows = jax.lax.top_k(scores, sel)
    d_rows = d_rows.astype(jnp.int32)

    if emb16 is not None:
        cand16 = emb16[jnp.maximum(d_rows, 0)]           # [B, sel, d]
        d_rows, d_vals, order = rescore_candidates(
            q_vecs, cand16, d_rows, d_vals
        )
        d_rows = d_rows[:, :pool_eff]
        d_vals = d_vals[:, :pool_eff]
        cand_pool = jnp.take_along_axis(
            cand16.astype(jnp.float32), order[:, :pool_eff, None], axis=1
        )
    else:
        cand_pool = None
    d_alive = d_vals > NEG_INF / 2

    if use_mmr:
        if cand_pool is None:
            cand_pool = emb[jnp.maximum(d_rows, 0)].astype(jnp.float32)
        orders = jax.vmap(
            lambda q, c, v: mmr_order(q, c, v, k_vector, mmr_lambda)
        )(q_vecs, cand_pool, d_alive)
        picked_ok = orders >= 0
        safe = jnp.maximum(orders, 0)
        vec_rows = jnp.where(
            picked_ok, jnp.take_along_axis(d_rows, safe, axis=1), -1
        )
        vec_vals = jnp.where(
            picked_ok, jnp.take_along_axis(d_vals, safe, axis=1), NEG_INF
        )
    else:
        vec_rows = jnp.where(d_alive[:, :k_vector], d_rows[:, :k_vector], -1)
        vec_vals = d_vals[:, :k_vector]
    return vec_rows, 1.0 - vec_vals


def bm25_rescore_pool(rows, term_ids, tfs, doc_len, avgdl, idf,
                      q_tids, q_counts, vocab_pad):
    """EXACT Okapi scores for a small candidate pool ``rows`` [B, P].

    The fast-mode scan (bf16 sat matrices, default-precision matmuls)
    selects candidates ~0.3%-approximately; this gather-pass re-scores
    the pool from the packed per-row term arrays in full f32 — the same
    subset statistics (idf/avgdl) — so the final ranking is exact."""
    from classmate_rag_tpu.index.lexical import (
        okapi_query_weights, okapi_sat,
    )

    b, p = rows.shape
    safe = jnp.maximum(rows, 0)
    ti = term_ids[safe]                              # [B, P, L]
    tf = tfs[safe].astype(jnp.float32)
    dl = doc_len[safe]                               # [B, P]
    # Per-query idf·count weight vectors [B, vocab_pad+1] — the same
    # table the gather-pass path builds (fine for vocabularies ≪ corpus;
    # this runs only in approx mode at serving scale).
    w = jax.vmap(
        lambda t, c: okapi_query_weights(idf, t, c, vocab_pad)
    )(q_tids, q_counts)
    ti_safe = jnp.where(ti >= 0, ti, vocab_pad)
    wt = jnp.take_along_axis(
        w, ti_safe.reshape(b, -1), axis=1
    ).reshape(ti.shape)                              # [B, P, L]
    sat = okapi_sat(tf, dl[:, :, None], avgdl)
    return jnp.sum(wt * jnp.where(ti >= 0, sat, 0.0), axis=-1)


def _bm25_postprocess(bm_scores, mask_bias, has_terms, *, k_bm25,
                      select="exact", rescore_ctx=None):
    """Top-k over BM25 scores with padding/empty-query handling.

    ``select="approx"``: PartialReduce picks a 64-wide candidate pool
    (per-element recall ≥0.999 at 1M); with ``rescore_ctx`` the pool is
    EXACT-rescored (see bm25_rescore_pool) and re-sorted by (value desc,
    row asc) — BM25 scores tie often, and the boundary ties must resolve
    exactly as the exact path does."""
    biased = bm_scores + mask_bias[None, :]
    k_bm_eff = min(k_bm25, bm_scores.shape[1])
    if select == "approx":
        k_sel = min(max(64, 4 * k_bm_eff), bm_scores.shape[1])
        p_vals, p_rows = jax.lax.approx_max_k(
            biased, k_sel, recall_target=_APPROX_RECALL_TARGET
        )
        if rescore_ctx is not None:
            exact = bm25_rescore_pool(p_rows, *rescore_ctx)
            p_vals = jnp.where(p_vals > NEG_INF / 2, exact, NEG_INF)
        order = jnp.lexsort((p_rows, -p_vals))[:, :k_bm_eff]
        b_vals = jnp.take_along_axis(p_vals, order, axis=1)
        b_rows = jnp.take_along_axis(p_rows, order, axis=1)
    else:
        b_vals, b_rows = jax.lax.top_k(biased, k_bm_eff)
    b_rows = jnp.where(b_vals > NEG_INF / 2, b_rows.astype(jnp.int32), -1)
    b_vals = jnp.where(b_rows >= 0, b_vals, 0.0)
    b_rows = jnp.where(has_terms, b_rows, -1)
    return b_rows, b_vals


def _fuse(vec_rows, vec_dist, bm_rows, bm_vals, *, weight_vector,
          weight_bm25, rrf_k, top_k):
    from classmate_rag_tpu.ops.fusion import rrf_merge

    rows, fused, vdist, bscore = jax.vmap(
        lambda vr, br, vd, bs: rrf_merge(
            vr, br, vd, bs, weight_vector, weight_bm25, rrf_k, top_k
        )
    )(vec_rows, bm_rows, vec_dist, bm_vals)
    return HybridBatchResult(rows, fused, vdist, bscore)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_vector", "k_bm25", "top_k", "pool", "vocab_pad", "use_mmr",
        # Config constants; rrf_k in particular feeds rrf_merge's static
        # arg — a traced value there poisons the jit cache key.
        "mmr_lambda", "rrf_k", "weight_vector", "weight_bm25",
    ),
)
def hybrid_query_step(
    emb,            # [N, d] bf16
    term_ids,       # [N, L] i32
    tfs,            # [N, L] u8
    doc_len,        # [N] f32
    df,             # [vocab_pad+1] f32 (subset df for the active mask)
    mask_bias,      # [N] f32
    q_vecs,         # [B, d] f32
    q_terms,        # [B, M] i32 (-1 padded)
    q_counts,       # [B, M] f32
    *,
    k_vector: int = 8,
    k_bm25: int = 8,
    top_k: int = 8,
    pool: int = 24,
    vocab_pad: int = 4096,
    use_mmr: bool = True,
    mmr_lambda: float = 0.5,
    rrf_k: int = 60,
    weight_vector: float = 1.0,
    weight_bm25: float = 1.0,
) -> HybridBatchResult:
    keep = mask_bias == 0.0
    n_sub = jnp.maximum(jnp.sum(keep.astype(jnp.float32)), 1.0)

    vec_rows, vec_dist = _dense_branch(
        emb, mask_bias, q_vecs,
        k_vector=k_vector, pool=pool, use_mmr=use_mmr, mmr_lambda=mmr_lambda,
    )

    idf = okapi_idf(df, n_sub)
    avgdl = jnp.sum(jnp.where(keep, doc_len, 0.0)) / n_sub
    bm_scores = jax.vmap(
        lambda t, c: okapi_score_rows(
            term_ids, tfs, doc_len, avgdl,
            okapi_query_weights(idf, t, c, vocab_pad), vocab_pad,
        )
    )(q_terms, q_counts)                                  # [B, N]
    has_terms = jnp.any(q_terms >= 0, axis=1, keepdims=True)
    bm_rows, bm_vals = _bm25_postprocess(
        bm_scores, mask_bias, has_terms, k_bm25=k_bm25,
    )
    return _fuse(
        vec_rows, vec_dist, bm_rows, bm_vals,
        weight_vector=weight_vector, weight_bm25=weight_bm25,
        rrf_k=rrf_k, top_k=top_k,
    )


def pack_query_arrays(qa, q_terms, q_counts, has_terms):
    """Concatenate every per-batch metadata array into ONE i32 buffer.

    Through a remote-device link each host→device array is a round trip;
    a query batch carries ~8 small arrays whose upload latency dwarfs
    their bytes. Packing (f32 bitcast to i32, bools widened) turns them
    into a single transfer; ``hybrid_query_step_split_packed`` unpacks
    with static offsets inside the jit. Returns (packed i32 [L], statics
    dict for the packed step).
    """
    import numpy as np

    b, m = q_terms.shape
    parts = [
        np.ascontiguousarray(qa["h_slots"], np.int32),
        np.ascontiguousarray(qa["h_tids"], np.int32),
        np.ascontiguousarray(qa["u_starts"], np.int32),
        np.ascontiguousarray(qa["u_lens"], np.int32),
        np.ascontiguousarray(qa["u_cols"], np.int32),
        np.ascontiguousarray(qa["t_tids"], np.int32),
        np.ascontiguousarray(q_terms, np.int32).ravel(),
        np.ascontiguousarray(q_counts, np.float32).ravel().view(np.int32),
        np.ascontiguousarray(has_terms, bool).ravel().astype(np.int32),
    ]
    statics = {"h": len(qa["h_slots"]), "u": len(qa["u_starts"]),
               "t": len(qa["t_tids"]), "b": b, "m": m}
    return np.concatenate(parts), statics


@functools.partial(
    jax.jit,
    static_argnames=(
        "h", "u", "t", "b", "m",
        "k_vector", "k_bm25", "top_k", "pool", "vocab_pad", "r_cap",
        "use_mmr", "mmr_lambda", "rrf_k", "weight_vector", "weight_bm25",
        "rescore_pool", "select",
    ),
)
def hybrid_query_step_split_packed(
    emb, tf_head, post_rows, post_tfs, doc_len, df, mask_bias,
    q_vecs,         # [B, d] f32
    packed,         # i32 [L] from pack_query_arrays
    emb16=None,     # optional [N, d] f16 rescore master
    term_ids=None,  # optional [N, L] i32 + [N, L] u8: the fast-BM25
    tfs=None,       #   exact-rescore source (see the unpacked step)
    *,
    h: int, u: int, t: int, b: int, m: int,
    k_vector: int = 8,
    k_bm25: int = 8,
    top_k: int = 8,
    pool: int = 24,
    vocab_pad: int = 4096,
    r_cap: int = 1024,
    use_mmr: bool = True,
    mmr_lambda: float = 0.5,
    rrf_k: int = 60,
    weight_vector: float = 1.0,
    weight_bm25: float = 1.0,
    rescore_pool: int = 64,
    select: str = "exact",
) -> HybridBatchResult:
    """``hybrid_query_step_split`` with the batch metadata in one buffer
    (single host→device transfer per batch — the serving hot path)."""
    import jax.numpy as jnp

    o = 0

    def take(n):
        nonlocal o
        out = packed[o : o + n]
        o += n
        return out

    h_slots = take(h)
    h_tids = take(h)
    u_starts = take(u)
    u_lens = take(u)
    u_cols = take(u)
    t_tids = take(t)
    q_tids = take(b * m).reshape(b, m)
    q_counts = jax.lax.bitcast_convert_type(
        take(b * m), jnp.float32
    ).reshape(b, m)
    has_terms = (take(b) > 0).reshape(b, 1)
    return hybrid_query_step_split(
        emb, tf_head, post_rows, post_tfs, doc_len, df, mask_bias, q_vecs,
        h_slots, h_tids, u_starts, u_lens, u_cols, t_tids, q_tids, q_counts,
        has_terms, emb16, term_ids, tfs,
        k_vector=k_vector, k_bm25=k_bm25, top_k=top_k, pool=pool,
        vocab_pad=vocab_pad, r_cap=r_cap, use_mmr=use_mmr,
        mmr_lambda=mmr_lambda, rrf_k=rrf_k, weight_vector=weight_vector,
        weight_bm25=weight_bm25, rescore_pool=rescore_pool, select=select,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_vector", "k_bm25", "top_k", "pool", "vocab_pad", "r_cap",
        "use_mmr", "mmr_lambda", "rrf_k", "weight_vector", "weight_bm25",
        "rescore_pool", "select",
    ),
)
def hybrid_query_step_split(
    emb,            # [N, d] bf16
    tf_head,        # u8 [C, N] — split-frequency BM25 head matrix (term-major)
    post_rows,      # i32 [P] — tail postings
    post_tfs,       # u8 [P]
    doc_len,        # [N] f32
    df,             # [vocab_pad+1] f32
    mask_bias,      # [N] f32
    q_vecs,         # [B, d] f32
    h_slots, h_tids,            # batch head-term union [H]
    u_starts, u_lens,           # batch tail SEGMENT table [U]
    u_cols,                     # [U] segment → tail-term column
    t_tids,                     # [T] batch's distinct tail term ids
    q_tids, q_counts,           # [B, M] query term ids / multiplicities
    has_terms,      # bool [B, 1]: query had ≥1 vocab-known term (host-computed
                    # so zero-posting terms rank zero-score rows, as the
                    # gather path and the reference do)
    emb16=None,     # optional [N, d] f16 rescore master (recall at scale)
    term_ids=None,  # optional [N, L] i32: enables the fast-BM25 path —
    tfs=None,       # approx mode scores with bf16 sat matrices and
                    # EXACT-rescores the candidate pool from these rows
    *,
    k_vector: int = 8,
    k_bm25: int = 8,
    top_k: int = 8,
    pool: int = 24,
    vocab_pad: int = 4096,
    r_cap: int = 1024,
    use_mmr: bool = True,
    mmr_lambda: float = 0.5,
    rrf_k: int = 60,
    weight_vector: float = 1.0,
    weight_bm25: float = 1.0,
    rescore_pool: int = 64,
    select: str = "exact",
) -> HybridBatchResult:
    """The fused step with split-frequency BM25 (head matmul + tail
    postings) — same results as ``hybrid_query_step``, much less gather
    traffic at large batch."""
    from classmate_rag_tpu.index.lexical import (
        bm25_split_score_core, okapi_idf,
    )

    vec_rows, vec_dist = _dense_branch(
        emb, mask_bias, q_vecs,
        k_vector=k_vector, pool=pool, use_mmr=use_mmr, mmr_lambda=mmr_lambda,
        emb16=emb16, rescore_pool=rescore_pool, select=select,
    )
    keep = mask_bias == 0.0
    n_sub = jnp.maximum(jnp.sum(keep.astype(jnp.float32)), 1.0)
    idf = okapi_idf(df, n_sub)
    avgdl = jnp.sum(jnp.where(keep, doc_len, 0.0)) / n_sub
    # Fast-BM25: approx mode + packed rows available → half-traffic bf16
    # sat matmuls, with the exact pool rescore restoring final ranks.
    fast = select == "approx" and term_ids is not None
    bm_scores = bm25_split_score_core(
        tf_head, post_rows, post_tfs, doc_len, keep, idf, avgdl,
        h_slots, h_tids, u_starts, u_lens, u_cols, t_tids,
        q_tids, q_counts,
        vocab_pad=vocab_pad, r_cap=r_cap, fast=fast,
    )
    rescore_ctx = (
        (term_ids, tfs, doc_len, avgdl, idf, q_tids, q_counts, vocab_pad)
        if fast else None
    )
    bm_rows, bm_vals = _bm25_postprocess(
        bm_scores, mask_bias, has_terms, k_bm25=k_bm25, select=select,
        rescore_ctx=rescore_ctx,
    )
    return _fuse(
        vec_rows, vec_dist, bm_rows, bm_vals,
        weight_vector=weight_vector, weight_bm25=weight_bm25,
        rrf_k=rrf_k, top_k=top_k,
    )
