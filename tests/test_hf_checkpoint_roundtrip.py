"""Synthetic HF-checkpoint round-trips for the real-weight code paths.

No model weights can be downloaded here, so these tests CONSTRUCT tiny
HF-format checkpoints (config.json + model.safetensors + tokenizer.json)
on disk and drive the loaders and runners end-to-end — executing exactly
the code that real snapshots would: config parsing, safetensors key
mapping/transposition, tied-embedding fallback, eos-id handling, the
tokenizer.json path, and a deterministic greedy decode.

Reference surfaces covered: rag/generation/llama_cpp_runner.py:25-106
(runner construction + chat) and rag/embeddings/__init__.py:36-105
(encoder snapshot loading).
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from safetensors.numpy import save_file


def _write_tokenizer(path, vocab_words):
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for w in vocab_words:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab=vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(path))
    return vocab


# ---------------------------------------------------------------------------
# Decoder (LLaMA-shaped)
# ---------------------------------------------------------------------------

DEC_CFG = {
    "vocab_size": 512,
    "hidden_size": 64,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "intermediate_size": 128,
    "max_position_embeddings": 128,
    "rope_theta": 10000.0,
    "rms_norm_eps": 1e-5,
    "eos_token_id": 2,
}


def _make_llama_checkpoint(tmp_path, *, tied=False, seed=123):
    """Write a tiny LlamaForCausalLM-shaped safetensors checkpoint with HF
    key names and torch [out, in] weight layout."""
    rng = np.random.default_rng(seed)
    h = DEC_CFG["hidden_size"]
    ff = DEC_CFG["intermediate_size"]
    kvh = DEC_CFG["num_key_value_heads"] * (h // DEC_CFG["num_attention_heads"])
    v = DEC_CFG["vocab_size"]
    L = DEC_CFG["num_hidden_layers"]

    def w(*shape):
        return rng.normal(0, 0.05, shape).astype(np.float32)

    sd = {
        "model.embed_tokens.weight": w(v, h),
        "model.norm.weight": np.ones(h, np.float32),
    }
    if not tied:
        sd["lm_head.weight"] = w(v, h)
    for i in range(L):
        b = f"model.layers.{i}."
        sd[b + "input_layernorm.weight"] = np.ones(h, np.float32)
        sd[b + "self_attn.q_proj.weight"] = w(h, h)
        sd[b + "self_attn.k_proj.weight"] = w(kvh, h)
        sd[b + "self_attn.v_proj.weight"] = w(kvh, h)
        sd[b + "self_attn.o_proj.weight"] = w(h, h)
        sd[b + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
        sd[b + "mlp.gate_proj.weight"] = w(ff, h)
        sd[b + "mlp.up_proj.weight"] = w(ff, h)
        sd[b + "mlp.down_proj.weight"] = w(h, ff)

    save_file(sd, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps(DEC_CFG))
    _write_tokenizer(
        tmp_path / "tokenizer.json",
        ["what", "is", "a", "derivative", "the", "rate", "of", "change"],
    )
    return sd


class TestDecoderCheckpointRoundtrip:
    def test_load_params_matches_written_tensors(self, tmp_path):
        from classmate_rag_tpu.models.decoder import (
            DecoderConfig, load_params_from_hf,
        )

        sd = _make_llama_checkpoint(tmp_path)
        config = DecoderConfig.from_hf_config(tmp_path)
        assert config is not None
        assert config.vocab_size == 512 and config.kv_heads == 2
        params = load_params_from_hf(str(tmp_path), config)
        assert params is not None
        np.testing.assert_allclose(
            np.asarray(params["layers"]["q_w"][1]),
            sd["model.layers.1.self_attn.q_proj.weight"].T,
        )
        np.testing.assert_allclose(
            np.asarray(params["lm_head"]), sd["lm_head.weight"].T
        )
        np.testing.assert_allclose(
            np.asarray(params["tok_emb"]), sd["model.embed_tokens.weight"]
        )

    def test_tied_embeddings_fallback(self, tmp_path):
        from classmate_rag_tpu.models.decoder import (
            DecoderConfig, load_params_from_hf,
        )

        sd = _make_llama_checkpoint(tmp_path, tied=True)
        config = DecoderConfig.from_hf_config(tmp_path)
        params = load_params_from_hf(str(tmp_path), config)
        assert params is not None
        np.testing.assert_allclose(
            np.asarray(params["lm_head"]),
            sd["model.embed_tokens.weight"].T,
        )

    def test_wrong_shape_checkpoint_rejected(self, tmp_path):
        from classmate_rag_tpu.models.decoder import (
            DecoderConfig, load_params_from_hf,
        )

        _make_llama_checkpoint(tmp_path)
        config = DecoderConfig.tiny_test()  # hidden=64 but vocab=512 differs
        # tiny_test vocab matches; force a mismatch via layers.
        import dataclasses

        bad = dataclasses.replace(config, hidden=32)
        assert load_params_from_hf(str(tmp_path), bad) is None

    def test_runner_end_to_end_greedy_decode(self, tmp_path):
        """TPUDecodeRunner over the synthetic checkpoint: config + weights
        + tokenizer.json all load, and greedy chat is deterministic."""
        from classmate_rag_tpu.generation.runner import TPUDecodeRunner

        _make_llama_checkpoint(tmp_path)
        runner = TPUDecodeRunner(
            model_dir=str(tmp_path), max_new_tokens=8, max_seq=64
        )
        assert runner.has_pretrained_weights
        assert runner.eos_ids == [2]
        assert runner.config.vocab_size == 512
        # tokenizer.json path (not the hash fallback)
        assert type(runner.tokenizer).__name__ == "HFTokenizer"

        out1 = runner.chat(
            [{"role": "user", "content": "what is a derivative"}],
            temperature=0.0,
        )
        out2 = runner.chat(
            [{"role": "user", "content": "what is a derivative"}],
            temperature=0.0,
        )
        assert isinstance(out1, str)
        assert out1 == out2  # greedy decode is deterministic

        ids = runner.generate_ids([5, 6, 7], temperature=0.0)
        assert all(t not in runner.eos_ids for t in ids)
        assert len(ids) <= 8

    def test_eos_id_list_parsed(self, tmp_path):
        from classmate_rag_tpu.generation.runner import TPUDecodeRunner

        _make_llama_checkpoint(tmp_path)
        cfg = dict(DEC_CFG)
        cfg["eos_token_id"] = [2, 3]
        (tmp_path / "config.json").write_text(json.dumps(cfg))
        runner = TPUDecodeRunner(
            model_dir=str(tmp_path), max_new_tokens=4, max_seq=32
        )
        assert runner.eos_ids == [2, 3]
        assert runner.eos_id == 3  # the LAST one ends chat turns


# ---------------------------------------------------------------------------
# Decoder family checkpoints: Qwen2 (QKV bias) / Qwen3 (QK-norm, head_dim)
# — the shapes of the reference's actual route models
# (rag/config.py:101-113: DeepSeek-R1-Distill-Qwen, Qwen2.5-Coder, Qwen3).
# ---------------------------------------------------------------------------

def _make_family_checkpoint(tmp_path, *, model_type, head_dim=None,
                            seed=321):
    cfg = dict(DEC_CFG)
    cfg["model_type"] = model_type
    if head_dim:
        cfg["head_dim"] = head_dim
    rng = np.random.default_rng(seed)
    h = cfg["hidden_size"]
    ff = cfg["intermediate_size"]
    heads = cfg["num_attention_heads"]
    d = head_dim or h // heads
    qh = heads * d
    kvh = cfg["num_key_value_heads"] * d
    v = cfg["vocab_size"]
    L = cfg["num_hidden_layers"]

    def w(*shape):
        return rng.normal(0, 0.05, shape).astype(np.float32)

    sd = {
        "model.embed_tokens.weight": w(v, h),
        "model.norm.weight": np.ones(h, np.float32),
        "lm_head.weight": w(v, h),
    }
    for i in range(L):
        b = f"model.layers.{i}."
        sd[b + "input_layernorm.weight"] = np.ones(h, np.float32)
        sd[b + "self_attn.q_proj.weight"] = w(qh, h)
        sd[b + "self_attn.k_proj.weight"] = w(kvh, h)
        sd[b + "self_attn.v_proj.weight"] = w(kvh, h)
        sd[b + "self_attn.o_proj.weight"] = w(h, qh)
        if model_type == "qwen2":
            sd[b + "self_attn.q_proj.bias"] = w(qh)
            sd[b + "self_attn.k_proj.bias"] = w(kvh)
            sd[b + "self_attn.v_proj.bias"] = w(kvh)
        if model_type == "qwen3":
            sd[b + "self_attn.q_norm.weight"] = 1.0 + 0.1 * w(d)
            sd[b + "self_attn.k_norm.weight"] = 1.0 + 0.1 * w(d)
        sd[b + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
        sd[b + "mlp.gate_proj.weight"] = w(ff, h)
        sd[b + "mlp.up_proj.weight"] = w(ff, h)
        sd[b + "mlp.down_proj.weight"] = w(h, ff)

    save_file(sd, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    _write_tokenizer(
        tmp_path / "tokenizer.json",
        ["what", "is", "a", "derivative", "the", "rate", "of", "change"],
    )
    return sd


class TestQwenFamilyRoundtrip:
    def test_qwen2_config_and_bias_load(self, tmp_path):
        from classmate_rag_tpu.models.decoder import (
            DecoderConfig, load_params_from_hf,
        )

        sd = _make_family_checkpoint(tmp_path, model_type="qwen2")
        config = DecoderConfig.from_hf_config(tmp_path)
        assert config.qkv_bias and not config.qk_norm
        params = load_params_from_hf(str(tmp_path), config)
        assert params is not None
        np.testing.assert_allclose(
            np.asarray(params["layers"]["q_b"][0]),
            sd["model.layers.0.self_attn.q_proj.bias"],
        )

    def test_qwen3_config_and_norms_load(self, tmp_path):
        from classmate_rag_tpu.models.decoder import (
            DecoderConfig, load_params_from_hf,
        )

        sd = _make_family_checkpoint(
            tmp_path, model_type="qwen3", head_dim=24
        )
        config = DecoderConfig.from_hf_config(tmp_path)
        assert config.qk_norm and config.head_dim == 24
        assert not config.qkv_bias
        params = load_params_from_hf(str(tmp_path), config)
        assert params is not None
        assert params["layers"]["q_w"].shape == (2, 64, 4 * 24)
        np.testing.assert_allclose(
            np.asarray(params["layers"]["k_norm"][1]),
            sd["model.layers.1.self_attn.k_norm.weight"],
        )

    def test_missing_bias_tensor_rejected(self, tmp_path):
        """A qwen2-typed config whose checkpoint lacks the bias tensors
        must be rejected cleanly (None), not KeyError-crash."""
        from classmate_rag_tpu.models.decoder import (
            DecoderConfig, load_params_from_hf,
        )

        _make_llama_checkpoint(tmp_path)  # no bias tensors on disk
        cfg = dict(DEC_CFG)
        cfg["model_type"] = "qwen2"
        (tmp_path / "config.json").write_text(json.dumps(cfg))
        config = DecoderConfig.from_hf_config(tmp_path)
        assert config.qkv_bias
        assert load_params_from_hf(str(tmp_path), config) is None

    @pytest.mark.parametrize("model_type,head_dim", [
        ("qwen2", None), ("qwen3", 24),
    ])
    def test_runner_end_to_end_greedy(self, tmp_path, model_type, head_dim):
        from classmate_rag_tpu.generation.runner import TPUDecodeRunner

        _make_family_checkpoint(
            tmp_path, model_type=model_type, head_dim=head_dim
        )
        runner = TPUDecodeRunner(
            model_dir=str(tmp_path), max_new_tokens=6, max_seq=48
        )
        assert runner.has_pretrained_weights
        out1 = runner.chat(
            [{"role": "user", "content": "the rate of change"}],
            temperature=0.0,
        )
        out2 = runner.chat(
            [{"role": "user", "content": "the rate of change"}],
            temperature=0.0,
        )
        assert isinstance(out1, str) and out1 == out2


# ---------------------------------------------------------------------------
# Encoder (XLM-R-shaped)
# ---------------------------------------------------------------------------

def _make_xlmr_checkpoint(tmp_path, config, seed=9):
    """HF XLM-R/BERT-style checkpoint with roberta.-prefixed keys."""
    rng = np.random.default_rng(seed)
    h, ff = config.hidden, config.intermediate

    def w(*shape):
        return rng.normal(0, 0.05, shape).astype(np.float32)

    sd = {
        "roberta.embeddings.word_embeddings.weight": w(config.vocab_size, h),
        "roberta.embeddings.position_embeddings.weight": w(
            config.max_positions, h
        ),
        "roberta.embeddings.token_type_embeddings.weight": w(
            config.type_vocab, h
        ),
        "roberta.embeddings.LayerNorm.weight": np.ones(h, np.float32),
        "roberta.embeddings.LayerNorm.bias": np.zeros(h, np.float32),
    }
    for i in range(config.layers):
        b = f"roberta.encoder.layer.{i}."
        for name, shape in (
            ("attention.self.query", (h, h)),
            ("attention.self.key", (h, h)),
            ("attention.self.value", (h, h)),
            ("attention.output.dense", (h, h)),
            ("intermediate.dense", (ff, h)),
            ("output.dense", (h, ff)),
        ):
            sd[b + name + ".weight"] = w(*shape)
            sd[b + name + ".bias"] = w(shape[0])
        for name in ("attention.output.LayerNorm", "output.LayerNorm"):
            sd[b + name + ".weight"] = np.ones(h, np.float32)
            sd[b + name + ".bias"] = np.zeros(h, np.float32)
    save_file(sd, str(tmp_path / "model.safetensors"))
    return sd


class TestEncoderCheckpointRoundtrip:
    def test_load_convert_and_forward(self, tmp_path):
        from classmate_rag_tpu.embeddings.model import (
            EncoderConfig, encode, load_params_from_hf,
        )

        config = EncoderConfig.small_test()
        sd = _make_xlmr_checkpoint(tmp_path, config)
        params = load_params_from_hf(str(tmp_path), config)
        assert params is not None
        np.testing.assert_allclose(
            np.asarray(params["layers"]["ff_in_w"][0]),
            sd["roberta.encoder.layer.0.intermediate.dense.weight"].T,
        )
        # The converted params drive a real forward to unit-norm outputs.
        ids = np.full((2, 8), 5, np.int32)
        mask = np.ones((2, 8), np.int32)
        out = np.asarray(encode(params, jnp.asarray(ids), jnp.asarray(mask),
                                config))
        assert out.shape == (2, config.hidden)
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=-1), 1.0, atol=1e-3
        )

    def test_wrong_width_checkpoint_rejected(self, tmp_path):
        import dataclasses

        from classmate_rag_tpu.embeddings.model import (
            EncoderConfig, load_params_from_hf,
        )

        config = EncoderConfig.small_test()
        _make_xlmr_checkpoint(tmp_path, config)
        wide = dataclasses.replace(config, hidden=128, intermediate=256)
        assert load_params_from_hf(str(tmp_path), wide) is None
