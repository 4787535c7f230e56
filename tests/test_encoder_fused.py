"""Numerics for the Pallas-fused encoder epilogues (interpret mode).

The kernels must reproduce the model's XLA reference formulas exactly
(same f32 math, same cast points) — the TPU wiring in
encode_from_embeddings is gated on a real backend, so CPU tests drive
the kernels directly in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from classmate_rag_tpu.embeddings.model import _layer_norm
from classmate_rag_tpu.ops.encoder_fused import (
    bias_gelu, fusable, residual_ln,
)


@pytest.mark.parametrize("n,f", [(8, 128), (64, 3072), (24, 256)])
def test_bias_gelu_matches_xla_reference(n, f):
    # Mosaic has no erf/erfc lowering, so the kernel carries an A&S
    # 7.1.26 erf (max abs error 1.5e-7). Contract: within one bf16 ulp
    # of XLA's exact gelu — the polynomial error only ever flips the
    # LAST bf16 bit, and only for outputs sitting on a rounding
    # boundary (measured on the real chip: max f32 deviation 7e-7).
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0, 2.0, (n, f)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.5, (f,)), jnp.float32)
    got = bias_gelu(y, b, out_dtype=jnp.bfloat16, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = np.asarray(jax.nn.gelu(y + b, approximate=False), np.float32)
    got = np.asarray(got, np.float32)
    # Per-element bf16 ulp: frexp mantissa in [0.5, 1) -> ulp = 2^(e-9).
    # Round-to-nearest puts the exact value within ulp/2; the polynomial
    # deviation can push the result one grid point over -> 1.5 ulp bound
    # (+ absolute floor for subnormal-scale outputs).
    _, e = np.frexp(want)
    ulp = np.ldexp(1.0, e - 9).astype(np.float32)
    assert np.all(np.abs(got - want) <= 1.5 * ulp + 2e-6)


def test_erf_polynomial_accuracy():
    import math

    from classmate_rag_tpu.ops.encoder_fused import _erf

    x = np.linspace(-6, 6, 20001, dtype=np.float64)
    want = np.vectorize(math.erf)(x)
    got = np.asarray(_erf(jnp.asarray(x, jnp.float32)), np.float64)
    # 1.5e-7 is the f64 bound for A&S 7.1.26; f32 evaluation adds its
    # own rounding (measured 4.4e-7 end to end).
    assert np.abs(got - want).max() < 1e-6


@pytest.mark.parametrize("n,h", [(8, 128), (64, 768), (512, 768)])
def test_residual_ln_matches_xla_reference(n, h):
    rng = np.random.default_rng(1)
    resid = jnp.asarray(rng.normal(0, 1.0, (n, h)), jnp.float32)
    y = jnp.asarray(rng.normal(0, 1.0, (n, h)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (h,)), jnp.float32)
    g = jnp.asarray(rng.normal(1, 0.1, (h,)), jnp.float32)
    beta = jnp.asarray(rng.normal(0, 0.1, (h,)), jnp.float32)
    got = residual_ln(resid, y, b, g, beta, eps=1e-5, interpret=True)
    want = _layer_norm(resid + y + b, g, beta, 1e-5)
    # jnp.var reassociates differently than the kernel's explicit
    # mean-of-squares; allow 1-ulp-scale drift.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6
    )


def test_fusable_gate():
    assert fusable(16384, 768)
    assert fusable(16384, 3072)
    assert not fusable(16384, 700)   # lane width
    assert not fusable(12, 768)      # sublane rows
