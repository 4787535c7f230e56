"""Weighted Reciprocal-Rank Fusion, vectorized on device.

Formula parity with the reference (rag/retrieval/fusion.py:17-36):
``score(id) = Σ_lists w_l / (rrf_k + rank)`` with 1-based ranks, default
rrf_k=60 and weights 1.0/1.0; merged results sort by (fused, −distance)
descending (rag/retrieval/fusion.py:159-164), where bm25-only items count a
distance of 0.

The device formulation works on global row indices instead of string ids:
candidates are the concatenation of the per-branch ranked index lists
(−1 padded), duplicates keep their first occurrence, contributions come
from equality matrices — no dictionaries, one fused [C]-wide computation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from classmate_rag_tpu.utils.numerics import NEG_INF  # noqa: E402


@functools.partial(jax.jit, static_argnames=("rrf_k", "top_k"))
def rrf_merge(
    vec_idx: jnp.ndarray,     # [Kv] global row ids, -1 padded, ranked
    bm_idx: jnp.ndarray,      # [Kb] global row ids, -1 padded, ranked
    vec_dist: jnp.ndarray,    # [Kv] cosine distances aligned with vec_idx
    bm_scores: jnp.ndarray,   # [Kb] bm25 scores aligned with bm_idx
    weight_vector: float,
    weight_bm25: float,
    rrf_k: int = 60,
    top_k: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fuse two ranked lists.

    Returns (rows [top_k], fused [top_k], vec_dist [top_k], bm_score [top_k]);
    rows are -1 (fused -inf) past the end. Per-branch scores carry NaN where
    that branch did not return the row (mirroring the reference's nulls).
    """
    kv = vec_idx.shape[0]
    kb = bm_idx.shape[0]
    cand = jnp.concatenate([vec_idx, bm_idx])                   # [C]
    c = cand.shape[0]

    # First-occurrence mask (dedup) — compare against earlier positions.
    eq_prev = (cand[:, None] == cand[None, :]) & (
        jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
        < jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    )
    is_dup = jnp.any(eq_prev, axis=1)
    alive = (cand >= 0) & ~is_dup

    ranks_v = 1.0 + jnp.arange(kv, dtype=jnp.float32)
    ranks_b = 1.0 + jnp.arange(kb, dtype=jnp.float32)
    in_vec = (cand[:, None] == vec_idx[None, :]) & (vec_idx[None, :] >= 0)
    in_bm = (cand[:, None] == bm_idx[None, :]) & (bm_idx[None, :] >= 0)
    fused = (
        jnp.sum(jnp.where(in_vec, weight_vector / (rrf_k + ranks_v), 0.0), axis=1)
        + jnp.sum(jnp.where(in_bm, weight_bm25 / (rrf_k + ranks_b), 0.0), axis=1)
    )

    # Per-branch scores for reporting; NaN = "branch did not return this row".
    nan = jnp.float32(jnp.nan)
    vdist = jnp.where(
        jnp.any(in_vec, axis=1),
        jnp.sum(jnp.where(in_vec, vec_dist[None, :], 0.0), axis=1),
        nan,
    )
    bscore = jnp.where(
        jnp.any(in_bm, axis=1),
        jnp.sum(jnp.where(in_bm, bm_scores[None, :], 0.0), axis=1),
        nan,
    )

    fused = jnp.where(alive, fused, NEG_INF)
    # Sort key: fused desc, then -distance desc (bm25-only rows act as
    # 0), then ROW ID asc — the explicit last key makes residual exact
    # ties (common under RRF's quantized 1/(k+rank) sums) fully
    # deterministic and matchable by any oracle using the same rule
    # (reference order: rag/retrieval/fusion.py:159-164, which is
    # insertion-stable; the row-id key refines it deterministically).
    dist_term = jnp.where(jnp.isnan(vdist), 0.0, vdist)
    composite_rank = jnp.lexsort((cand, dist_term, -fused))     # [C] ascending
    take = composite_rank[:top_k]
    out_fused = fused[take]
    dead = out_fused <= NEG_INF / 2
    # Dead slots (padding/duplicates) report row -1 uniformly.
    return (
        jnp.where(dead, -1, cand[take]),
        out_fused,
        vdist[take],
        bscore[take],
    )
