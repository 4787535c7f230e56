"""Masked exact-scan dense scoring with fused top-k.

This op replaces the reference's Chroma/hnswlib ANN query
(rag/retrieval/vector_chroma.py:204-253). On TPU an exact tiled matmul that
saturates HBM bandwidth beats graph traversal and gives recall=1.0 by
construction, so the "index" is just an HBM-resident [N, d] bf16 matrix.

Two implementations with identical semantics:

- ``topk_xla``: one einsum + additive mask + ``lax.top_k``. XLA fuses the
  mask into the matmul epilogue; the default for small N and CPU tests.
- ``topk_pallas`` (the EXACT-mode scorer at ≥150k rows; at ≥500k rows
  with the f16 rescore active the fused step instead selects its pool
  via ``lax.approx_max_k`` — see ops/hybrid_step.py): a Pallas kernel
  that tiles the corpus over a 1-D grid;
  each tile unconditionally selects ITS OWN top-k (k argmax rounds in
  VMEM, lowest-index tie-break) into a per-tile output block — no state
  crosses grid steps, so the pipeline streams freely — and one tiny XLA
  ``top_k`` over the [Q, n_tiles·k] partials finishes the job. The full
  [Q, N] f32 score matrix is never materialized; HBM sees only the
  partial blocks — w/tile_n of it per array, where w = round_up(k, 128)
  is the lane-padded block width (the last dim must be a multiple of the
  128-lane width, so k=24 still writes 128 columns per tile).

Scores are cosine similarities (inputs are L2-normalized upstream);
``mask_bias`` is 0 for candidate rows and -inf for filtered/tombstoned rows.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# Pallas pulls ~1s of jaxlib MLIR dialect imports — deferred into the
# functions that lower kernels so catalog-only CLI verbs never pay it.

from classmate_rag_tpu.utils.numerics import NEG_INF
from classmate_rag_tpu.utils.numerics import round_up as _round_up


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

    vals = jnp.concatenate(val_cols, axis=1)
    idx = jnp.concatenate(idx_cols, axis=1)
    # Output refs may be lane-padded (TPU blocks want 128-wide lanes).
    w = vals_ref.shape[1]
    if w > k:
        q = vals.shape[0]
        vals = jnp.concatenate(
            [vals, jnp.full((q, w - k), NEG_INF, vals.dtype)], axis=1
        )
        idx = jnp.concatenate(
            [idx, jnp.full((q, w - k), -1, idx.dtype)], axis=1
        )
    vals_ref[:] = vals
    idx_ref[:] = idx


def _topk_kernel(
    q_ref,       # [Q, d] VMEM
    emb_ref,     # [TILE_N, d] VMEM (current tile)
    bias_ref,    # [1, TILE_N] VMEM (current tile of mask bias)
    vals_out,    # [Q, 128] VMEM — THIS tile's top-k (cols ≥ k_pad padded)
    idx_out,     # [Q, 128] VMEM
    *,
    tile_n: int,
    k_pad: int,
):
    """Per-tile exact top-k with NO cross-step state.

    The previous formulation kept a running [Q, k] merge in scratch,
    gated per tile on "can this tile displace the k-th best". That gate
    READS the scratch the previous grid step WROTE — a strict sequential
    dependency that stops Mosaic from running step i+1's matmul while
    step i merges, and capped the whole pipeline at ~51 GB/s while the
    same loop without the dependency streams 217 GB/s (measured, 1M×768).
    Instead every tile unconditionally selects its own top-k into its own
    128-wide output block (k VPU argmax rounds, ~µs against the tile DMA)
    and a trivial XLA ``top_k`` over the [Q, n_tiles·k] partials finishes
    the job outside the kernel.
    """
    q = q_ref[:]
    tile = emb_ref[:]
    scores = jax.lax.dot_general(
        q.astype(tile.dtype), tile,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Q, TILE_N]
    scores = scores + bias_ref[:]  # [1, TILE_N] broadcast over queries

    from jax.experimental import pallas as pl

    base = pl.program_id(0) * tile_n
    tile_idx = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    _select_topk_into(scores, tile_idx, k_pad, vals_out, idx_out)


def _auto_tile_n(q: int, d: int, dtype_bytes: int) -> int:
    """Largest power-of-two corpus tile whose VMEM working set (queries
    f32 + double-buffered emb tile + f32 score tile + the argmax-round
    temps, which are [Q, tile]-shaped) fits a ~13 MB budget of the 16 MB
    scoped VMEM."""
    budget = 13 << 20
    fixed = q * d * 4
    per_row = 2 * d * dtype_bytes + 4 * q * 4  # emb ×2 + scores + temps
    tile = 512
    while tile * 2 * per_row + fixed < budget and tile < 16384:
        tile *= 2
    return tile


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "interpret")
)
def topk_pallas(
    emb: jnp.ndarray,        # [N, d]
    queries: jnp.ndarray,    # [Q, d]
    mask_bias: jnp.ndarray,  # [N] f32
    k: int,
    tile_n: int = 0,         # 0 = auto-size to the VMEM budget
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = emb.shape
    q = queries.shape[0]
    if not tile_n:
        tile_n = _auto_tile_n(q, d, emb.dtype.itemsize)
    n_pad = _round_up(n, tile_n)
    if n_pad != n:
        emb = jnp.pad(emb, ((0, n_pad - n), (0, 0)))
        mask_bias = jnp.pad(
            mask_bias, (0, n_pad - n), constant_values=NEG_INF
        )
    # Bias as a [1, N] row: the tile block [1, tile_n] broadcasts over the
    # query dimension with no cross-sublane relayout.
    bias2d = mask_bias.reshape(1, n_pad)
    n_tiles = n_pad // tile_n
    grid = (n_tiles,)
    # Per-tile output block: 128 lanes (TPU block width), top-k in the
    # first k columns, NEG_INF/-1 in the rest.
    w = _round_up(max(k, 1), 128)

    kernel = functools.partial(_topk_kernel, tile_n=tile_n, k_pad=k)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q, w), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, w), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, n_tiles * w), jnp.float32),
            jax.ShapeDtypeStruct((q, n_tiles * w), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n_pad * d,
            bytes_accessed=n_pad * d * emb.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries.astype(jnp.float32), emb, bias2d)

    # Final merge: top-k over the per-tile partials [Q, n_tiles·k] —
    # tiny next to the scan. Slice away the lane padding first. Ties on
    # value resolve to the lowest global index (indices ascend with tile
    # order and -1 pads carry NEG_INF, so a stable sort is not needed —
    # lax.top_k keeps the earlier column, which holds the lower index).
    part_vals = vals.reshape(q, n_tiles, w)[:, :, :k].reshape(q, n_tiles * k)
    part_idx = idx.reshape(q, n_tiles, w)[:, :, :k].reshape(q, n_tiles * k)
    best_vals, best_pos = jax.lax.top_k(part_vals, k)
    best_idx = jnp.take_along_axis(part_idx, best_pos, axis=1)
    return best_vals, best_idx.astype(jnp.int32)


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
    (tools/bench_scan.py, d=768, Q=256, K=24):

                           N=200k         N=1M
      raw matmul bf16      6.0 ms         8.6 ms (174-179 GB/s)
      raw matmul int8      5.9 ms         7.0 ms (no win that survives
                                                  the score+topk cost)
      topk_xla            10.6 ms        30.5 ms
      topk_int8_rescore   22.7 ms        86.8 ms (0.35x, recall 0.995)
      topk_pallas          9.0 ms        25.6 ms (1.18-1.19x vs XLA)

    History: the first kernel kept a running [Q, k] merge in scratch
    gated per tile — that gate reads what the previous grid step wrote,
    a sequential dependency that capped the pipeline at ~51 GB/s (the
    same loop with no cross-step state streams 217 GB/s). The current
    kernel does unconditional per-tile top-k into per-tile output blocks
    (no cross-step state) + one tiny XLA top_k over the partials; the
    remaining gap to the 217 GB/s ceiling is the k serial argmax rounds
    per tile (latency-, not throughput-bound).

    Verdict on the int8-scan + bf16-rescore plan: not realizable here —
    halving matrix bytes does not touch the score-materialization/topk
    cost that dominates, and the rescore's quantize/gather overhead makes
    it 3x slower with recall < 1. int8 stays opt-in (ops/quant.py) for
    memory-constrained corpora. The fused hybrid step routes its dense
    branch through topk_pallas at ≥150k rows (ops/hybrid_step.py);
    XLA remains the default below.
    """
    if use_pallas:
        return topk_pallas(emb, queries, mask_bias, k)
    return topk_xla(emb, queries, mask_bias, k)
