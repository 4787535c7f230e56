"""Masked exact-scan dense scoring with fused top-k.

This op replaces the reference's Chroma/hnswlib ANN query
(rag/retrieval/vector_chroma.py:204-253). On TPU an exact tiled matmul that
saturates HBM bandwidth beats graph traversal and gives recall=1.0 by
construction, so the "index" is just an HBM-resident [N, d] bf16 matrix.

Two implementations with identical semantics:

- ``topk_xla``: one einsum + additive mask + ``lax.top_k``. XLA fuses the
  mask into the matmul epilogue; fine for small N or CPU tests.
- ``topk_pallas``: a Pallas kernel that tiles the corpus over a 1-D grid,
  keeps a running [Q, k] top-k in VMEM scratch, and never materializes the
  full [Q, N] score matrix in HBM — the score tile lives only in VMEM.
  The merge is ``lax.top_k`` over [running ++ tile], so earlier (lower)
  indices win ties.

Scores are cosine similarities (inputs are L2-normalized upstream);
``mask_bias`` is 0 for candidate rows and -inf for filtered/tombstoned rows.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# XLA reference implementation
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k",))
def topk_xla(
    emb: jnp.ndarray,        # [N, d] (any float dtype; bf16 on TPU)
    queries: jnp.ndarray,    # [Q, d] f32
    mask_bias: jnp.ndarray,  # [N] f32: 0 keep / -inf drop
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    scores = jnp.einsum(
        "qd,nd->qn", queries.astype(emb.dtype), emb,
        preferred_element_type=jnp.float32,
    )
    scores = scores + mask_bias[None, :]
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

def _select_topk_into(cat_vals, cat_idx, k, vals_ref, idx_ref):
    """In-kernel top-k by iterative masked argmax, writing into refs.

    ``lax.top_k`` has no Mosaic lowering and lane-dimension dynamic stores
    must be 128-aligned, so: k rounds of (row max → lowest-index column
    holding it → retire that column), with each round depositing its result
    into output column j via an iota-mask ``where`` — pure elementwise VPU
    work. Ties on value resolve to the smallest global index. Cost is k VPU
    reductions over the concat width — negligible next to the MXU tile
    matmul for k ≤ 128. Results land sorted descending.
    """
    int_max = jnp.int32(2**31 - 1)
    cat_v = cat_vals
    val_cols = []
    idx_cols = []
    # k is static: fully unrolled, no loop-control overhead in Mosaic.
    for _ in range(k):
        row_max = jnp.max(cat_v, axis=1, keepdims=True)            # [Q, 1]
        is_max = cat_v == row_max
        # Lowest global index among the max-valued columns.
        sel_idx = jnp.min(
            jnp.where(is_max, cat_idx, int_max), axis=1, keepdims=True
        )
        sel_idx = jnp.where(sel_idx == int_max, -1, sel_idx)
        val_cols.append(row_max)
        idx_cols.append(sel_idx)
        # Retire exactly the selected column (global indices are unique;
        # -1 slots are already -inf so masking them together is harmless).
        cat_v = jnp.where(cat_idx == sel_idx, NEG_INF, cat_v)

    vals_ref[:] = jnp.concatenate(val_cols, axis=1)
    idx_ref[:] = jnp.concatenate(idx_cols, axis=1)


def _topk_kernel(
    q_ref,       # [Q, d] VMEM
    emb_ref,     # [TILE_N, d] VMEM (current tile)
    bias_ref,    # [TILE_ROWS, 128] VMEM (current tile of mask bias)
    vals_out,    # [Q, K_PAD] VMEM
    idx_out,     # [Q, K_PAD] VMEM
    run_vals,    # scratch [Q, K_PAD] f32
    run_idx,     # scratch [Q, K_PAD] i32
    *,
    tile_n: int,
    k_pad: int,
):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        run_vals[:] = jnp.full_like(run_vals, NEG_INF)
        run_idx[:] = jnp.full_like(run_idx, -1)

    q = q_ref[:]
    tile = emb_ref[:]
    scores = jax.lax.dot_general(
        q.astype(tile.dtype), tile,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Q, TILE_N]
    scores = scores + bias_ref[:]  # [1, TILE_N] broadcast over queries

    base = step * tile_n
    tile_idx = base + jax.lax.broadcasted_iota(
        jnp.int32, scores.shape, 1
    )

    # Merge only when this tile can displace something: its per-query max
    # must beat the current k-th best. After the first few tiles most tiles
    # fail this test and cost only the matmul + one VPU reduction.
    tile_max = jnp.max(scores, axis=1)          # [Q]
    kth = run_vals[:, k_pad - 1]                # [Q] (sorted descending)
    needed = jnp.logical_or(step == 0, jnp.any(tile_max > kth))

    @pl.when(needed)
    def _merge():
        cat_vals = jnp.concatenate([run_vals[:], scores], axis=1)
        cat_idx = jnp.concatenate([run_idx[:], tile_idx], axis=1)
        _select_topk_into(cat_vals, cat_idx, k_pad, run_vals, run_idx)

    @pl.when(step == n_steps - 1)
    def _finalize():
        vals_out[:] = run_vals[:]
        idx_out[:] = run_idx[:]


def _auto_tile_n(q: int, d: int, dtype_bytes: int) -> int:
    """Largest power-of-two corpus tile whose VMEM working set (queries
    f32 + emb tile + f32 score tile + merge scratch) fits a ~12 MB budget
    of the 16 MB scoped VMEM."""
    budget = 13 << 20
    fixed = q * d * 4
    # Input tiles are double-buffered by the pipeline; the merge keeps
    # ~5 [Q, tile]-shaped f32/i32 temps live (scores, iota, concat
    # values/indices, selection masks).
    per_row = 2 * d * dtype_bytes + 5 * q * 4 + 8
    tile = 512
    while tile * 2 * per_row + fixed < budget and tile < 8192:
        tile *= 2
    return tile


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def topk_pallas(
    emb: jnp.ndarray,        # [N, d]
    queries: jnp.ndarray,    # [Q, d]
    mask_bias: jnp.ndarray,  # [N] f32
    k: int,
    tile_n: int = 0,         # 0 = auto-size to the VMEM budget
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n, d = emb.shape
    q = queries.shape[0]
    if not tile_n:
        tile_n = _auto_tile_n(q, d, emb.dtype.itemsize)
    k_pad = k  # scratch width == k: fewer argmax rounds in the merge
    n_pad = _round_up(n, tile_n)
    if n_pad != n:
        emb = jnp.pad(emb, ((0, n_pad - n), (0, 0)))
        mask_bias = jnp.pad(
            mask_bias, (0, n_pad - n), constant_values=NEG_INF
        )
    # Bias as a [1, N] row: the tile block [1, tile_n] broadcasts over the
    # query dimension with no cross-sublane relayout.
    bias2d = mask_bias.reshape(1, n_pad)
    grid = (n_pad // tile_n,)

    kernel = functools.partial(_topk_kernel, tile_n=tile_n, k_pad=k_pad)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((q, k_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q, k_pad), jnp.float32),
            pltpu.VMEM((q, k_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n_pad * d,
            bytes_accessed=n_pad * d * emb.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries.astype(jnp.float32), emb, bias2d)
    return vals[:, :k], idx[:, :k]


def masked_topk(
    emb: jnp.ndarray,
    queries: jnp.ndarray,
    mask_bias: jnp.ndarray,
    k: int,
    *,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch between the two implementations.

    Measured on TPU v5e through this rig's device link
    (tools/bench_scan.py, N=200k, d=768, Q=256, K=24):

      raw matmul bf16      6.0 ms   (51 GB/s effective)
      raw matmul int8      5.9 ms   (1.01x — NO speedup)
      topk_xla            10.7 ms
      topk_int8_rescore   22.5 ms   (0.48x, recall 0.995 vs exact)
      topk_pallas         10.4 ms   (1.03x vs XLA)

    Verdict on the int8-scan + bf16-rescore plan: not realizable here.
    The scan at these shapes is NOT matrix-byte-bound — the [Q, N] f32
    score materialization + top_k limit it to ~51 GB/s effective, far
    below the ~360 GB/s this rig reads at — so halving matrix bytes buys
    nothing, and the rescore stage's quantize/gather overhead makes the
    two-stage path 2x slower with recall < 1. int8 stays opt-in
    (ops/quant.py) for memory-constrained corpora. The Pallas kernel
    (auto-VMEM-sized tiles) matches XLA within noise and remains the
    substrate for regimes XLA can't fuse; XLA stays the default.
    """
    if use_pallas:
        return topk_pallas(emb, queries, mask_bias, k)
    return topk_xla(emb, queries, mask_bias, k)
