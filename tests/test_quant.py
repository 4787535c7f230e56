"""Int8 quantized scan + exact rescore: set-recall vs the bf16 scan."""

import numpy as np

import jax.numpy as jnp

from classmate_rag_tpu.ops.quant import quantize_rows, topk_int8_rescore
from classmate_rag_tpu.ops.topk import topk_xla


def test_quantize_roundtrip_error_small():
    rng = np.random.default_rng(0)
    E = rng.standard_normal((100, 64)).astype(np.float32)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    q, s = quantize_rows(E)
    back = q.astype(np.float32) * s[:, None]
    rel = np.abs(back - E).max() / np.abs(E).max()
    assert rel < 0.01


def test_topk_set_matches_bf16_scan():
    rng = np.random.default_rng(1)
    N, d, k = 5000, 128, 10
    E = rng.standard_normal((N, d)).astype(np.float32)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    qs = E[:4] + 0.3 * rng.standard_normal((4, d)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    bias = np.zeros(N, np.float32)
    bias[::7] = np.finfo(np.float32).min

    emb16 = jnp.asarray(E, jnp.bfloat16)
    Ei8, sc = quantize_rows(E)
    v1, r1 = topk_xla(emb16, jnp.asarray(qs), jnp.asarray(bias), k)
    v2, r2 = topk_int8_rescore(
        jnp.asarray(Ei8), jnp.asarray(sc), emb16,
        jnp.asarray(qs), jnp.asarray(bias), k, rescore_pool=64,
    )
    a, b = np.asarray(r1), np.asarray(r2)
    for i in range(4):
        assert set(a[i].tolist()) == set(b[i].tolist())
    # masked rows never appear
    assert np.all(b % 7 != 0)


def test_zero_rows_and_tiny_corpus():
    E = np.zeros((3, 16), np.float32)
    E[0, 0] = 1.0
    q, s = quantize_rows(E)
    assert s[1] == 0.0 or (q[1] == 0).all()
    vals, rows = topk_int8_rescore(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(E, jnp.bfloat16),
        jnp.asarray(E[:1]), jnp.zeros(3, jnp.float32), k=5, rescore_pool=2,
    )
    assert rows.shape == (1, 5)
    assert np.asarray(rows)[0, 0] == 0
