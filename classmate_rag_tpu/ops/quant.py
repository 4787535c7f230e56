"""Int8 quantized dense scan with exact rescore.

The exact scan is HBM-bandwidth bound, so halving the bytes doubles the
row rate: store the corpus twice — int8 row-quantized [N, d] (+ f32 scales)
for the scan, bf16 for rescoring — and answer queries in two stages:

1. approx scores over the int8 matrix (int8×int8→int32 on the MXU, 2× the
   bf16 rate on v5e) → top ``rescore_pool`` candidates;
2. exact bf16 rescore of just those rows (a gather + tiny matmul), final
   top-k from the rescored values.

Stage-1 error is per-row quantization noise (~0.4% of |row|), so the true
top-k live comfortably inside a 4-8× rescore pool; stage 2 restores exact
ordering among candidates. Memory cost: 1.5× the bf16-only matrix.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from classmate_rag_tpu.utils.numerics import NEG_INF  # noqa: E402


def quantize_rows(emb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8 quantization → (int8 [N, d], scales f32 [N])."""
    absmax = np.abs(emb).max(axis=1)
    scales = (absmax / 127.0).astype(np.float32)
    safe = np.where(scales > 0, scales, 1.0)
    q = np.clip(np.rint(emb / safe[:, None]), -127, 127).astype(np.int8)
    return q, scales


@functools.partial(jax.jit, static_argnames=("k", "rescore_pool"))
def topk_int8_rescore(
    emb_i8: jnp.ndarray,     # [N, d] int8
    scales: jnp.ndarray,     # [N] f32
    emb_bf16: jnp.ndarray,   # [N, d] bf16 (exact rescore source)
    queries: jnp.ndarray,    # [Q, d] f32
    mask_bias: jnp.ndarray,  # [N] f32
    k: int,
    rescore_pool: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-stage masked top-k. Returns (scores f32 [Q, k], rows i32 [Q, k])."""
    # Stage 1: int8 scan. Quantize queries per-row symmetric.
    q_absmax = jnp.max(jnp.abs(queries), axis=1, keepdims=True)
    q_scale = jnp.maximum(q_absmax / 127.0, 1e-12)
    q_i8 = jnp.clip(jnp.round(queries / q_scale), -127, 127).astype(jnp.int8)

    approx_i32 = jax.lax.dot_general(
        q_i8, emb_i8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                             # [Q, N]
    approx = approx_i32.astype(jnp.float32) * q_scale * scales[None, :]
    approx = approx + mask_bias[None, :]

    pool = min(rescore_pool, emb_i8.shape[0])
    _, cand = jax.lax.top_k(approx, pool)         # [Q, pool]
    cand = cand.astype(jnp.int32)

    # Stage 2: exact rescore of the candidates only.
    cand_rows = emb_bf16[cand]                    # [Q, pool, d]
    exact = jnp.einsum(
        "qd,qpd->qp", queries.astype(jnp.bfloat16), cand_rows,
        preferred_element_type=jnp.float32,
    )
    exact = exact + mask_bias[cand]
    vals, sel = jax.lax.top_k(exact, min(k, pool))
    rows = jnp.take_along_axis(cand, sel, axis=1)
    rows = jnp.where(vals > NEG_INF / 2, rows, -1)
    if k > pool:  # degenerate tiny-corpus case: pad
        pad = k - pool
        vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=NEG_INF)
        rows = jnp.pad(rows, ((0, 0), (0, pad)), constant_values=-1)
    return vals, rows
