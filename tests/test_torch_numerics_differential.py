"""Numerics differential vs the ACTUAL HuggingFace transformers forward.

Zero egress blocks real weights, but torch + transformers are installed:
instantiating the reference model CLASSES with random weights and
comparing logits/embeddings against our pure-JAX forwards proves the
architecture and weight mapping exactly — the one property the synthetic
round-trip tests (which compare our loader against our own forward)
cannot establish. With these green, real weights differ from the tested
path only in their values.

Reference surfaces covered: rag/embeddings/__init__.py:64-105 (E5 =
XLM-R via sentence-transformers) and rag/generation/llama_cpp_runner.py
(the llama/qwen GGUF lineup; rag/config.py:101-113 routes span LLaMA,
Qwen2, and Qwen3 families).

Everything runs in float32 on CPU; two-layer models agree to ~1e-5, the
assertions use 1e-3 headroom.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _np(t):
    return t.detach().cpu().numpy().astype(np.float32)


# ---------------------------------------------------------------------------
# Encoder: pure-JAX XLM-R vs transformers.XLMRobertaModel
# ---------------------------------------------------------------------------

def test_encoder_matches_transformers_xlmroberta(tmp_path):
    from classmate_rag_tpu.embeddings.model import (
        EncoderConfig, encode, load_params_from_hf,
    )

    hf_cfg = transformers.XLMRobertaConfig(
        vocab_size=211, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=68, type_vocab_size=1, pad_token_id=1,
        layer_norm_eps=1e-5, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        attn_implementation="eager",
    )
    torch.manual_seed(7)
    model = transformers.XLMRobertaModel(hf_cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    cfg = EncoderConfig(
        vocab_size=211, hidden=64, layers=2, heads=4, intermediate=128,
        max_positions=68, compute_dtype=jnp.float32,
    )
    params = load_params_from_hf(str(tmp_path), cfg)
    assert params is not None

    rng = np.random.default_rng(3)
    B, T = 3, 12
    ids = rng.integers(4, 211, (B, T)).astype(np.int32)
    mask = np.ones((B, T), np.int32)
    # Right-padded rows: XLM-R's position ids derive from the pad mask
    # (cumsum + padding_idx) — the classic parity trap.
    ids[1, 9:] = 1
    mask[1, 9:] = 0
    ids[2, 5:] = 1
    mask[2, 5:] = 0

    with torch.no_grad():
        hf_hidden = _np(model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state)
    # The product pooling (E5 masked mean + L2) applied to HF's hidden
    # states is the full-reference-path oracle.
    m = mask.astype(np.float32)[:, :, None]
    pooled = (hf_hidden * m).sum(1) / np.maximum(m.sum(1), 1.0)
    want = pooled / np.maximum(
        np.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
    )

    got = np.asarray(
        encode(params, jnp.asarray(ids), jnp.asarray(mask), cfg),
        np.float32,
    )
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
    cos = np.sum(got * want, axis=1)
    assert np.all(cos > 1.0 - 1e-6), cos


# ---------------------------------------------------------------------------
# Decoder families vs transformers *ForCausalLM
# ---------------------------------------------------------------------------

def _our_logits(config, params, ids):
    from classmate_rag_tpu.models.decoder import empty_cache, forward

    B, T = ids.shape
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    key_slot = jnp.arange(T, dtype=jnp.int32)[None, None, :]
    causal = key_slot <= pos[:, :, None]
    mask = jnp.where(causal, 0.0, jnp.finfo(jnp.float32).min)
    logits, _ = forward(
        params, jnp.asarray(ids), pos, empty_cache(config, B, T),
        jnp.int32(0), config, attn_mask=mask,
    )
    return np.asarray(logits, np.float32)


def _decoder_case(tmp_path, hf_model, our_config, seed=11):
    from classmate_rag_tpu.models.decoder import load_params_from_hf

    hf_model.save_pretrained(tmp_path, safe_serialization=True)
    params = load_params_from_hf(str(tmp_path), our_config)
    assert params is not None, "HF checkpoint failed to convert"

    rng = np.random.default_rng(seed)
    B, T = 2, 9
    ids = rng.integers(4, our_config.vocab_size, (B, T)).astype(np.int32)
    with torch.no_grad():
        want = _np(hf_model(
            input_ids=torch.tensor(ids, dtype=torch.long)
        ).logits)
    got = _our_logits(our_config, params, ids)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
    # Greedy continuation identical everywhere (the serving contract).
    assert np.array_equal(got.argmax(-1), want.argmax(-1))


def test_decoder_matches_transformers_llama(tmp_path):
    from classmate_rag_tpu.models.decoder import DecoderConfig

    hf_cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=128,
        rope_theta=10000.0, rms_norm_eps=1e-5, attention_bias=False,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    config = DecoderConfig(
        vocab_size=512, hidden=64, layers=2, heads=4, kv_heads=2,
        ffn=128, max_seq=128, rope_theta=10000.0, norm_eps=1e-5,
        compute_dtype=jnp.float32,
    )
    _decoder_case(tmp_path, model, config)


def test_decoder_matches_transformers_llama_tied_embeddings(tmp_path):
    from classmate_rag_tpu.models.decoder import DecoderConfig

    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        intermediate_size=96, max_position_embeddings=64,
        rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=True, attn_implementation="eager",
    )
    torch.manual_seed(2)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    config = DecoderConfig(
        vocab_size=256, hidden=64, layers=2, heads=4, kv_heads=4,
        ffn=96, max_seq=64, rope_theta=10000.0, norm_eps=1e-5,
        compute_dtype=jnp.float32,
    )
    _decoder_case(tmp_path, model, config)


def test_decoder_matches_transformers_qwen2(tmp_path):
    from classmate_rag_tpu.models.decoder import DecoderConfig

    hf_cfg = transformers.Qwen2Config(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=128,
        rope_theta=100000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(3)
    model = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    config = DecoderConfig(
        vocab_size=512, hidden=64, layers=2, heads=4, kv_heads=2,
        ffn=128, max_seq=128, rope_theta=100000.0, norm_eps=1e-6,
        qkv_bias=True, compute_dtype=jnp.float32,
    )
    _decoder_case(tmp_path, model, config)


def test_decoder_matches_transformers_qwen3(tmp_path):
    from classmate_rag_tpu.models.decoder import DecoderConfig

    if not hasattr(transformers, "Qwen3ForCausalLM"):
        pytest.skip("transformers build predates Qwen3")
    hf_cfg = transformers.Qwen3Config(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=24,
        intermediate_size=128, max_position_embeddings=128,
        rope_theta=100000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(4)
    model = transformers.Qwen3ForCausalLM(hf_cfg).eval()
    config = DecoderConfig(
        vocab_size=512, hidden=64, layers=2, heads=4, kv_heads=2,
        ffn=128, max_seq=128, rope_theta=100000.0, norm_eps=1e-6,
        qk_norm=True, head_dim_override=24, compute_dtype=jnp.float32,
    )
    _decoder_case(tmp_path, model, config)
