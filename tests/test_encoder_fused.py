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
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0, 2.0, (n, f)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.5, (f,)), jnp.float32)
    got = bias_gelu(y, b, out_dtype=jnp.bfloat16, interpret=True)
    want = jax.nn.gelu(y + b, approximate=False).astype(jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


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
