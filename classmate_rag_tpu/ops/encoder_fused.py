"""Pallas-fused encoder epilogues: bias+GELU and residual+bias+LayerNorm.

The encoder roofline (tools/bench_encoder_roofline.py, docs/perf.md
"Encoder MFU roofline") shows the e5 forward's matmuls already at 0.85
of MXU peak while ~1/3 of the wall clock is elementwise VPU passes over
the [B·T, H] / [B·T, 4H] activations — each an HBM round trip XLA
schedules as separate loop fusions around the matmuls. These two
kernels collapse the two hot epilogue chains into one HBM round trip
each (reference hot loop: /root/reference/rag/embeddings/__init__.py:96,
which delegates the whole stack to sentence-transformers/torch):

- ``bias_gelu``: gelu(y + b) with the output written directly in the
  next matmul's compute dtype (bf16), halving the write+read traffic of
  the [B·T, 4H] tensor — the single biggest elementwise surface in the
  model (4H = 3072 at e5-base: 201 MB f32 per layer at B=64, T=256).
- ``residual_ln``: LayerNorm(resid + y + b) * g + beta in one pass —
  the attention-out and FFN-out epilogues, fusing 2 adds + mean/var +
  normalize over rows (reduction along H stays inside one block row).

Both kernels are stateless across grid steps (per-step output blocks
only), the pattern CLAUDE.md records as streaming at full HBM rate on
this chip; block shapes keep the 128-lane last dim (H and 4H are
multiples of 128 for every e5 size).

Numerics: f32 math inside the kernel, identical formulas to the XLA
path (exact erf GELU via an in-kernel A&S 7.1.26 polynomial — Mosaic
has no erf/erfc lowering — max abs error 4.4e-7, ~4 orders below bf16
output precision; biased variance LN); parity is tested in interpret
mode against the model's reference implementations and was verified on
the real chip (fused-vs-unfused encode cosine 0.9999998).

MEASURED OUTCOME (round 4, docs/perf.md): a NON-lever. The A/B
roofline reads fused 43.5 ms/step vs unfused 38.5 at (B=64, T=256) —
XLA already fuses these chains, and 36 pallas_call boundaries per step
cost more than they save. Kept behind ``EncoderConfig.fused_epilogue``
(default off) as the measured record of the attempt.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Pallas imports deferred into the lowering functions (keeps CLI verbs
# that never touch the encoder free of the ~1s MLIR import).


def _pick_rows(n: int, width: int, out_bytes: int, target: int = 1 << 21) -> int:
    """Largest power-of-two row count dividing n with in+out block bytes
    under ``target`` (VMEM working set; 2 MiB default leaves room for
    double buffering)."""
    rows = 1
    while (
        rows * 2 <= n
        and n % (rows * 2) == 0
        and rows * 2 * width * (4 + out_bytes) <= target
    ):
        rows *= 2
    return rows


def fusable(n_rows: int, width: int) -> bool:
    """Static gate: shapes the Mosaic kernels accept."""
    return width % 128 == 0 and n_rows % 8 == 0


# ---------------------------------------------------------------------------
# bias + exact GELU (+ dtype cast)
# ---------------------------------------------------------------------------

def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7).

    Mosaic has no erf/erfc lowering, so the kernel carries its own: the
    polynomial's 1.5e-7 error is ~4 decimal orders below the bf16
    output precision the fused GELU writes, making the fused path
    numerically indistinguishable from XLA's exact
    ``jax.nn.gelu(approximate=False)`` at output precision (asserted on
    real-TPU lowering and in the interpret-mode parity tests)."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _bias_gelu_kernel(y_ref, b_ref, o_ref):
    y = y_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    # Exact (erf) GELU, matching jax.nn.gelu(approximate=False).
    o_ref[...] = (y * 0.5 * (1.0 + _erf(y * 0.7071067811865476))).astype(
        o_ref.dtype
    )


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "interpret")
)
def bias_gelu(
    y: jnp.ndarray,          # [N, F] f32 (matmul output)
    b: jnp.ndarray,          # [F] f32
    out_dtype=jnp.bfloat16,  # the NEXT matmul's compute dtype
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl

    n, f = y.shape
    rows = _pick_rows(n, f, jnp.dtype(out_dtype).itemsize)
    return pl.pallas_call(
        _bias_gelu_kernel,
        grid=(n // rows,),
        in_specs=[
            pl.BlockSpec((rows, f), lambda i: (i, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, f), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, f), out_dtype),
        interpret=interpret,
    )(y, b.reshape(1, f))


# ---------------------------------------------------------------------------
# residual + bias + LayerNorm
# ---------------------------------------------------------------------------

def _residual_ln_kernel(eps, resid_ref, y_ref, b_ref, g_ref, beta_ref, o_ref):
    x = (
        resid_ref[...].astype(jnp.float32)
        + y_ref[...].astype(jnp.float32)
        + b_ref[...].astype(jnp.float32)
    )
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    o_ref[...] = (
        (x - mean) * jax.lax.rsqrt(var + eps) * g_ref[...] + beta_ref[...]
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def residual_ln(
    resid: jnp.ndarray,      # [N, H] f32 (stream into the layer)
    y: jnp.ndarray,          # [N, H] f32 (matmul output)
    b: jnp.ndarray,          # [H] f32 (matmul bias)
    g: jnp.ndarray,          # [H] f32 (LN gain)
    beta: jnp.ndarray,       # [H] f32 (LN shift)
    eps: float = 1e-12,
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl

    n, h = resid.shape
    rows = _pick_rows(n, h, 4)
    row1 = lambda i: (i, 0)
    vec = pl.BlockSpec((1, h), lambda i: (0, 0))
    return pl.pallas_call(
        functools.partial(_residual_ln_kernel, eps),
        grid=(n // rows,),
        in_specs=[
            pl.BlockSpec((rows, h), row1),
            pl.BlockSpec((rows, h), row1),
            vec, vec, vec,
        ],
        out_specs=pl.BlockSpec((rows, h), row1),
        out_shape=jax.ShapeDtypeStruct((n, h), jnp.float32),
        interpret=interpret,
    )(resid, y, b.reshape(1, h), g.reshape(1, h), beta.reshape(1, h))
