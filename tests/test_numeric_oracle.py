"""Weights-free numeric oracles for the model forwards.

The E5/XLM-R parity test against sentence-transformers needs a local
snapshot (absent offline), so these tests prove the ARCHITECTURE instead:
an independent pure-numpy implementation of the exact same math
(reference semantics: rag/embeddings/__init__.py:36-105 encoder contract,
rag/generation/llama_cpp_runner.py decode contract) must match the JAX
forward bit-for-bit-ish (f32, 1e-4) on shared random parameters. With
this green, only the HF weight-file conversion remains gated on weights —
and that is covered by the synthetic-checkpoint round-trip test.
"""

import dataclasses
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# numpy primitives
# ---------------------------------------------------------------------------

_erf = np.vectorize(math.erf)


def np_softmax(x, axis=-1):
    x = x - np.max(x, axis=axis, keepdims=True)
    e = np.exp(x)
    return e / np.sum(e, axis=axis, keepdims=True)


def np_layer_norm(x, g, b, eps):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * g + b


def np_gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x / math.sqrt(2.0)))


def np_rms_norm(x, g, eps):
    scale = 1.0 / np.sqrt((x * x).mean(axis=-1, keepdims=True) + eps)
    return x * scale * g


def np_silu(x):
    return x / (1.0 + np.exp(-x))


# ---------------------------------------------------------------------------
# Encoder oracle (XLM-R / E5)
# ---------------------------------------------------------------------------

def np_encode(params, input_ids, attention_mask, config):
    """Independent numpy transcription of embeddings/model.py:encode."""
    p = jax.tree.map(np.asarray, params)
    mask = attention_mask.astype(np.float32)
    am_i = attention_mask.astype(np.int32)
    positions = np.cumsum(am_i, axis=1) * am_i + config.pad_id

    x = (
        p["word_emb"][input_ids]
        + p["pos_emb"][positions]
        + p["type_emb"][np.zeros_like(input_ids)]
    )
    x = np_layer_norm(x, p["emb_ln_g"], p["emb_ln_b"], config.ln_eps)

    B, T, H = x.shape
    nh = config.heads
    hd = H // nh
    attn_bias = (1.0 - mask)[:, None, None, :] * np.finfo(np.float32).min

    for li in range(config.layers):
        lp = {k: v[li] for k, v in p["layers"].items()}

        def proj(w, b):
            return (x @ w + b).reshape(B, T, nh, hd)

        q = proj(lp["q_w"], lp["q_b"])
        k = proj(lp["k_w"], lp["k_b"])
        v = proj(lp["v_w"], lp["v_b"])
        scores = np.einsum("bqnd,bknd->bnqk", q, k) / math.sqrt(hd)
        probs = np_softmax(scores + attn_bias, axis=-1)
        ctx = np.einsum("bnqk,bknd->bqnd", probs, v).reshape(B, T, H)
        attn_out = ctx @ lp["o_w"] + lp["o_b"]
        x = np_layer_norm(
            x + attn_out, lp["attn_ln_g"], lp["attn_ln_b"], config.ln_eps
        )
        ff = np_gelu_exact(x @ lp["ff_in_w"] + lp["ff_in_b"])
        ff_out = ff @ lp["ff_out_w"] + lp["ff_out_b"]
        x = np_layer_norm(
            x + ff_out, lp["ff_ln_g"], lp["ff_ln_b"], config.ln_eps
        )

    denom = np.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    pooled = (x * mask[:, :, None]).sum(axis=1) / denom
    norm = np.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / np.maximum(norm, 1e-12)


class TestEncoderOracle:
    def test_jax_matches_numpy_forward(self):
        from classmate_rag_tpu.embeddings.model import (
            EncoderConfig, encode, init_params,
        )

        config = dataclasses.replace(
            EncoderConfig.small_test(), compute_dtype=jnp.float32
        )
        params = init_params(config, "oracle")
        rng = np.random.default_rng(42)
        B, T = 3, 24
        ids = rng.integers(4, config.vocab_size, (B, T)).astype(np.int32)
        # Ragged mask incl. one full row and one heavily padded row.
        mask = np.ones((B, T), np.int32)
        mask[1, 10:] = 0
        mask[2, 3:] = 0
        ids[mask == 0] = config.pad_id

        got = np.asarray(encode(params, jnp.asarray(ids), jnp.asarray(mask),
                                config))
        want = np_encode(params, ids, mask, config)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
        # Sanity: outputs are unit-norm and padding-invariant rows differ.
        np.testing.assert_allclose(
            np.linalg.norm(got, axis=-1), 1.0, atol=1e-5
        )

    def test_padding_extension_invariance(self):
        """Extending a batch with extra pad columns must not change the
        embeddings (position ids and pooling both mask-driven)."""
        from classmate_rag_tpu.embeddings.model import (
            EncoderConfig, encode, init_params,
        )

        config = dataclasses.replace(
            EncoderConfig.small_test(), compute_dtype=jnp.float32
        )
        params = init_params(config, "oracle")
        rng = np.random.default_rng(0)
        B, T = 2, 12
        ids = rng.integers(4, config.vocab_size, (B, T)).astype(np.int32)
        mask = np.ones((B, T), np.int32)

        wide_ids = np.full((B, T + 6), config.pad_id, np.int32)
        wide_ids[:, :T] = ids
        wide_mask = np.zeros((B, T + 6), np.int32)
        wide_mask[:, :T] = 1

        a = np.asarray(encode(params, jnp.asarray(ids), jnp.asarray(mask), config))
        b = np.asarray(
            encode(params, jnp.asarray(wide_ids), jnp.asarray(wide_mask), config)
        )
        np.testing.assert_allclose(a, b, atol=1e-5)


# ---------------------------------------------------------------------------
# Decoder oracle (LLaMA family)
# ---------------------------------------------------------------------------

def np_rope(x, positions, theta):
    d = x.shape[-1]
    half = d // 2
    freqs = theta ** (-np.arange(0, half, dtype=np.float32) / half)
    angles = positions[:, :, None].astype(np.float32) * freqs[None, None, :]
    cos = np.cos(angles)[:, :, None, :]
    sin = np.sin(angles)[:, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def np_decoder_logits(params, ids, config):
    """Independent numpy transcription of models/decoder.py:forward for an
    unpadded causal sequence (no cache — full attention)."""
    p = jax.tree.map(np.asarray, params)
    B, T = ids.shape
    H, KH, D = config.heads, config.kv_heads, config.head_dim
    x = p["tok_emb"][ids]
    pos = np.broadcast_to(np.arange(T, dtype=np.int32)[None, :], (B, T))
    causal = np.where(
        np.arange(T)[None, :, None] >= np.arange(T)[None, None, :],
        0.0, np.finfo(np.float32).min,
    )                                                   # [1, T, T]

    for li in range(config.layers):
        lp = {k: v[li] for k, v in p["layers"].items()}
        normed = np_rms_norm(x, lp["attn_norm"], config.norm_eps)
        q = normed @ lp["q_w"]
        k = normed @ lp["k_w"]
        v = normed @ lp["v_w"]
        if config.qkv_bias:
            q, k, v = q + lp["q_b"], k + lp["k_b"], v + lp["v_b"]
        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, KH, D)
        v = v.reshape(B, T, KH, D)
        if config.qk_norm:
            q = np_rms_norm(q, lp["q_norm"], config.norm_eps)
            k = np_rms_norm(k, lp["k_norm"], config.norm_eps)
        q = np_rope(q, pos, config.rope_theta)
        k = np_rope(k, pos, config.rope_theta)
        rep = H // KH
        k_full = np.repeat(k, rep, axis=2)
        v_full = np.repeat(v, rep, axis=2)
        scores = np.einsum("bthd,bshd->bhts", q, k_full) / math.sqrt(D)
        scores = scores + causal[:, None, :, :]
        probs = np_softmax(scores, axis=-1)
        ctx = np.einsum("bhts,bshd->bthd", probs, v_full).reshape(B, T, H * D)
        x = x + ctx @ lp["o_w"]
        normed2 = np_rms_norm(x, lp["ffn_norm"], config.norm_eps)
        ff = np_silu(normed2 @ lp["gate_w"]) * (normed2 @ lp["up_w"])
        x = x + ff @ lp["down_w"]

    x = np_rms_norm(x, p["final_norm"], config.norm_eps)
    return x @ p["lm_head"]


def _f32_cache(config, batch, max_seq):
    shape = (config.layers, batch, max_seq, config.kv_heads, config.head_dim)
    return (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))


class TestDecoderOracle:
    def _setup(self):
        from classmate_rag_tpu.models.decoder import (
            DecoderConfig, init_params,
        )

        config = dataclasses.replace(
            DecoderConfig.tiny_test(), compute_dtype=jnp.float32
        )
        params = init_params(config, "oracle-dec")
        rng = np.random.default_rng(7)
        B, T = 2, 10
        ids = rng.integers(4, config.vocab_size, (B, T)).astype(np.int32)
        return config, params, ids

    def test_prefill_matches_numpy(self):
        from classmate_rag_tpu.models.decoder import forward

        config, params, ids = self._setup()
        B, T = ids.shape
        S = T + 4
        neg = np.finfo(np.float32).min
        key_slot = np.arange(S)[None, None, :]
        q_slot = np.arange(T)[None, :, None]
        mask = np.where((key_slot <= q_slot) & (key_slot < T), 0.0, neg)
        mask = np.broadcast_to(mask, (B, T, S)).astype(np.float32)
        positions = np.broadcast_to(np.arange(T, dtype=np.int32)[None, :], (B, T))

        logits, _ = forward(
            params, jnp.asarray(ids), jnp.asarray(positions),
            _f32_cache(config, B, S), jnp.int32(0), config,
            attn_mask=jnp.asarray(mask),
        )
        want = np_decoder_logits(params, ids, config)
        np.testing.assert_allclose(np.asarray(logits), want, atol=1e-4, rtol=1e-4)

    def test_kv_cache_step_matches_full_forward(self):
        """Incremental decode through the KV cache must produce the same
        logits as a from-scratch full forward over the extended sequence —
        the invariant that catches cache-offset/RoPE/GQA bugs."""
        from classmate_rag_tpu.models.decoder import forward

        config, params, ids = self._setup()
        B, T = ids.shape
        S = T + 4
        neg = np.finfo(np.float32).min

        key_slot = np.arange(S)[None, None, :]
        q_slot = np.arange(T)[None, :, None]
        mask = np.broadcast_to(
            np.where((key_slot <= q_slot) & (key_slot < T), 0.0, neg),
            (B, T, S),
        ).astype(np.float32)
        positions = np.broadcast_to(np.arange(T, dtype=np.int32)[None, :], (B, T))
        logits, cache = forward(
            params, jnp.asarray(ids), jnp.asarray(positions),
            _f32_cache(config, B, S), jnp.int32(0), config,
            attn_mask=jnp.asarray(mask),
        )

        # Greedy-pick token T from the oracle and decode it incrementally.
        full_T = np_decoder_logits(params, ids, config)
        next_tok = full_T[:, -1, :].argmax(axis=-1).astype(np.int32)
        ids_ext = np.concatenate([ids, next_tok[:, None]], axis=1)
        want = np_decoder_logits(params, ids_ext, config)[:, -1, :]

        step_mask = np.broadcast_to(
            np.where(key_slot[:, 0, :] <= T, 0.0, neg)[:, None, :], (B, 1, S)
        ).astype(np.float32)
        step_logits, _ = forward(
            params, jnp.asarray(next_tok[:, None]),
            jnp.full((B, 1), T, jnp.int32), cache, jnp.int32(T), config,
            attn_mask=jnp.asarray(step_mask),
        )
        np.testing.assert_allclose(
            np.asarray(step_logits)[:, 0, :], want, atol=1e-4, rtol=1e-4
        )


class TestDecoderFamilyOracles:
    """Qwen2 (QKV bias) and Qwen3 (QK-norm, decoupled head_dim) variants
    of the decoder must match the numpy oracle too — these cover the
    reference's actual route model lineup (rag/config.py:101-113)."""

    def _config(self, **kw):
        from classmate_rag_tpu.models.decoder import DecoderConfig

        return dataclasses.replace(
            DecoderConfig.tiny_test(), compute_dtype=jnp.float32, **kw
        )

    def _check_prefill(self, config, seed_key):
        from classmate_rag_tpu.models.decoder import forward, init_params

        params = init_params(config, seed_key)
        rng = np.random.default_rng(11)
        B, T = 2, 9
        ids = rng.integers(4, config.vocab_size, (B, T)).astype(np.int32)
        S = T + 3
        neg = np.finfo(np.float32).min
        key_slot = np.arange(S)[None, None, :]
        q_slot = np.arange(T)[None, :, None]
        mask = np.broadcast_to(
            np.where((key_slot <= q_slot) & (key_slot < T), 0.0, neg),
            (B, T, S),
        ).astype(np.float32)
        positions = np.broadcast_to(
            np.arange(T, dtype=np.int32)[None, :], (B, T)
        )
        logits, _ = forward(
            params, jnp.asarray(ids), jnp.asarray(positions),
            _f32_cache(config, B, S), jnp.int32(0), config,
            attn_mask=jnp.asarray(mask),
        )
        want = np_decoder_logits(params, ids, config)
        np.testing.assert_allclose(
            np.asarray(logits), want, atol=1e-4, rtol=1e-4
        )

    def test_qwen2_bias_matches_numpy(self):
        self._check_prefill(self._config(qkv_bias=True), "oracle-qwen2")

    def test_qwen3_qknorm_matches_numpy(self):
        self._check_prefill(
            self._config(qk_norm=True, head_dim_override=24), "oracle-qwen3"
        )

    def test_bias_and_norm_params_change_logits(self):
        """The family switches must be load-bearing: zeroing the bias /
        perturbing the qk-norm gains must move the logits (guards against
        a forward that silently ignores the new params)."""
        from classmate_rag_tpu.models.decoder import init_params

        config = self._config(qkv_bias=True, qk_norm=True)
        params = init_params(config, "oracle-fam")
        rng = np.random.default_rng(3)
        ids = rng.integers(4, config.vocab_size, (1, 6)).astype(np.int32)
        base = np_decoder_logits(params, ids, config)

        import jax as _jax

        mutated = _jax.tree.map(lambda x: x, params)
        mutated["layers"] = dict(mutated["layers"])
        mutated["layers"]["q_b"] = mutated["layers"]["q_b"] + 0.5
        assert not np.allclose(
            np_decoder_logits(mutated, ids, config), base
        )
        mutated2 = _jax.tree.map(lambda x: x, params)
        mutated2["layers"] = dict(mutated2["layers"])
        mutated2["layers"]["k_norm"] = mutated2["layers"]["k_norm"] * 1.7
        assert not np.allclose(
            np_decoder_logits(mutated2, ids, config), base
        )
