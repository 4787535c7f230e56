"""GGUF interop tests: container round-trip, dequant vs scalar oracles,
decoder loading, embedded tokenizer, and the runner/config wiring.

The reference's model files are GGUF (rag/config.py:101-113, opened by
rag/generation/llama_cpp_runner.py:37-45); with zero egress here the
fixtures are synthetic GGUFs produced by the module's own writer — so
every dequant format is ALSO checked against an independent scalar
transcription of llama.cpp's dequantize_row_* loops (a mirrored layout
bug in writer+reader would pass a bare round-trip).
"""

from __future__ import annotations

import numpy as np
import pytest

from classmate_rag_tpu.models import gguf as G
from classmate_rag_tpu.models.decoder import DecoderConfig, init_params


# ---------------------------------------------------------------------------
# Container: metadata + tensor table round-trip
# ---------------------------------------------------------------------------

def test_metadata_roundtrip_all_types(tmp_path):
    meta = {
        "u8": (G.T_UINT8, 200),
        "i8": (G.T_INT8, -100),
        "u16": (G.T_UINT16, 60000),
        "i16": (G.T_INT16, -30000),
        "u32": (G.T_UINT32, 4000000000),
        "i32": (G.T_INT32, -2000000000),
        "f32": (G.T_FLOAT32, 1.5),
        "f64": (G.T_FLOAT64, 2.25),
        "bool_t": True,
        "u64": 2**40,
        "neg": -7,
        "s": "ciao — καλημέρα",
        "arr_i": [1, 2, 3],
        "arr_f": [0.5, 1.5],
        "arr_s": ["a", "bb", "ccc"],
    }
    G.write_gguf(tmp_path / "m.gguf", meta, {"t": np.zeros((4,), np.float32)})
    md, infos, _ = G.read_gguf_header(tmp_path / "m.gguf")
    assert md["u8"] == 200 and md["i8"] == -100
    assert md["u16"] == 60000 and md["i16"] == -30000
    assert md["u32"] == 4000000000 and md["i32"] == -2000000000
    assert md["f32"] == 1.5 and md["f64"] == 2.25
    assert md["bool_t"] is True
    assert md["u64"] == 2**40 and md["neg"] == -7
    assert md["s"] == "ciao — καλημέρα"
    assert md["arr_i"] == [1, 2, 3]
    assert md["arr_f"] == [0.5, 1.5]
    assert md["arr_s"] == ["a", "bb", "ccc"]
    assert md["general.alignment"] == 32
    assert infos[0].name == "t" and infos[0].shape == (4,)


def test_tensor_table_shapes_and_alignment(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a": rng.normal(size=(3, 64)).astype(np.float32),
        "b": rng.normal(size=(7,)).astype(np.float32),
        "c": rng.normal(size=(2, 4, 32)).astype(np.float32),
    }
    G.write_gguf(tmp_path / "t.gguf", {}, tensors, default_type=G.GGML_F16)
    md, infos, data_start = G.read_gguf_header(tmp_path / "t.gguf")
    assert data_start % 32 == 0
    by_name = {i.name: i for i in infos}
    assert by_name["a"].shape == (3, 64)
    assert by_name["c"].shape == (2, 4, 32)
    for i in infos:
        assert i.offset % 32 == 0
    _, loaded = G.load_gguf(tmp_path / "t.gguf")
    for k, v in tensors.items():
        np.testing.assert_allclose(loaded[k], v, atol=2e-3, rtol=2e-3)


def test_unsupported_type_raises(tmp_path):
    with pytest.raises(ValueError, match="Q5_K"):
        G.dequantize(np.zeros(176, np.uint8), G.GGML_Q5_K, (256,))


# ---------------------------------------------------------------------------
# Dequant vs independent scalar oracles (llama.cpp dequantize_row_* loops)
# ---------------------------------------------------------------------------

def _oracle_q8_0(raw):
    out = []
    for blk in raw.reshape(-1, 34):
        d = float(blk[:2].copy().view(np.float16)[0])
        out.extend(d * float(np.int8(b)) for b in blk[2:])
    return np.array(out, np.float32)

def _oracle_q4_0(raw):
    out = []
    for blk in raw.reshape(-1, 18):
        d = float(blk[:2].copy().view(np.float16)[0])
        qs = blk[2:]
        for j in range(16):
            out.append(d * ((int(qs[j]) & 0x0F) - 8))
        for j in range(16):
            out.append(d * ((int(qs[j]) >> 4) - 8))
    return np.array(out, np.float32)

def _scale_min_k4(j, q):
    if j < 4:
        return int(q[j]) & 63, int(q[j + 4]) & 63
    d = (int(q[j + 4]) & 0xF) | ((int(q[j - 4]) >> 6) << 4)
    m = (int(q[j + 4]) >> 4) | ((int(q[j]) >> 6) << 4)
    return d, m

def _oracle_q4_k(raw):
    out = []
    for blk in raw.reshape(-1, 144):
        d = float(blk[0:2].copy().view(np.float16)[0])
        dmin = float(blk[2:4].copy().view(np.float16)[0])
        scales = blk[4:16]
        q = blk[16:144]
        is_ = 0
        qoff = 0
        for _j in range(0, 256, 64):
            sc1, m1 = _scale_min_k4(is_ + 0, scales)
            sc2, m2 = _scale_min_k4(is_ + 1, scales)
            for l in range(32):
                out.append(d * sc1 * (int(q[qoff + l]) & 0xF) - dmin * m1)
            for l in range(32):
                out.append(d * sc2 * (int(q[qoff + l]) >> 4) - dmin * m2)
            is_ += 2
            qoff += 32
    return np.array(out, np.float32)

def _oracle_q6_k(raw):
    out = []
    for blk in raw.reshape(-1, 210):
        ql = blk[0:128]
        qh = blk[128:192]
        sc = blk[192:208].copy().view(np.int8)
        d = float(blk[208:210].copy().view(np.float16)[0])
        y = np.zeros(256, np.float32)
        for n in range(2):
            yo, qlo, qho, so = 128 * n, 64 * n, 32 * n, 8 * n
            for l in range(32):
                is_ = l // 16
                q1 = ((int(ql[qlo + l]) & 0xF) | (((int(qh[qho + l]) >> 0) & 3) << 4)) - 32
                q2 = ((int(ql[qlo + l + 32]) & 0xF) | (((int(qh[qho + l]) >> 2) & 3) << 4)) - 32
                q3 = ((int(ql[qlo + l]) >> 4) | (((int(qh[qho + l]) >> 4) & 3) << 4)) - 32
                q4 = ((int(ql[qlo + l + 32]) >> 4) | (((int(qh[qho + l]) >> 6) & 3) << 4)) - 32
                y[yo + l + 0] = d * int(sc[so + is_ + 0]) * q1
                y[yo + l + 32] = d * int(sc[so + is_ + 2]) * q2
                y[yo + l + 64] = d * int(sc[so + is_ + 4]) * q3
                y[yo + l + 96] = d * int(sc[so + is_ + 6]) * q4
        out.extend(y.tolist())
    return np.array(out, np.float32)


@pytest.mark.parametrize("gtype,quantizer,oracle,tol", [
    (G.GGML_Q8_0, G._quantize_q8_0, _oracle_q8_0, 0.02),
    (G.GGML_Q4_0, G._quantize_q4_0, _oracle_q4_0, 0.25),
    (G.GGML_Q4_K, G._quantize_q4_k, _oracle_q4_k, 0.20),
    (G.GGML_Q6_K, G._quantize_q6_k, _oracle_q6_k, 0.05),
])
def test_dequant_matches_scalar_oracle_and_bounds_error(gtype, quantizer, oracle, tol):
    rng = np.random.default_rng(7)
    n = 1024
    w = rng.normal(0, 1.0, size=n).astype(np.float32)
    raw = quantizer(w)
    # 1) vectorized dequant == scalar transcription of llama.cpp, exactly
    got = G.dequantize(raw, gtype, (n,))
    np.testing.assert_allclose(got, oracle(raw), rtol=1e-6, atol=1e-6)
    # 2) quantization error bounded (sanity on the writer's encoding)
    err = np.abs(got - w).max()
    assert err < tol, f"{G.GGML_TYPE_NAMES[gtype]} max err {err}"


def test_dequant_random_raw_blocks_match_oracle():
    """Random raw bytes (not writer output) — layout-only check."""
    rng = np.random.default_rng(11)
    for gtype, oracle, bb in [
        (G.GGML_Q4_K, _oracle_q4_k, 144),
        (G.GGML_Q6_K, _oracle_q6_k, 210),
    ]:
        raw = rng.integers(0, 256, size=4 * bb, dtype=np.uint8)
        # overwrite the f16 scale fields with sane values (random bytes
        # can encode inf/nan halves)
        blocks = raw.reshape(4, bb)
        half = np.array([0.25], np.float16).view(np.uint8)
        if gtype == G.GGML_Q4_K:
            blocks[:, 0:2] = half
            blocks[:, 2:4] = half
        else:
            blocks[:, 208:210] = half
        got = G.dequantize(raw, gtype, (4 * 256,))
        np.testing.assert_allclose(got, oracle(raw), rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# Decoder loading
# ---------------------------------------------------------------------------

def _tiny_tokens(vocab_size):
    toks = ["<unk>", "<s>", "</s>"]
    toks += [f"<0x{b:02X}>" for b in range(256)]
    words = ["▁hello", "▁world", "▁ciao", "▁the", "▁a", "▁question",
             "▁answer", "hello", "world", "ing", "er", "▁con", "text"]
    toks += words
    toks += [f"<pad{i}>" for i in range(vocab_size - len(toks))]
    return toks[:vocab_size]


def _write_tiny_model(path, quant=G.GGML_F32, arch="llama"):
    config = DecoderConfig.tiny_test()
    params = init_params(config, "gguf-fixture")
    tokens = _tiny_tokens(config.vocab_size)
    scores = [0.0] * 3 + [-10.0] * 256 + [-1.0] * 13 + [-25.0] * (
        config.vocab_size - 272
    )
    G.export_decoder_to_gguf(
        path, params, config, arch=arch, quant_type=quant,
        extra_metadata={
            "tokenizer.ggml.model": "llama",
            "tokenizer.ggml.tokens": (G.T_ARRAY, (G.T_STRING, tokens)),
            "tokenizer.ggml.scores": (G.T_ARRAY, (G.T_FLOAT32, scores)),
            "tokenizer.ggml.bos_token_id": 1,
            "tokenizer.ggml.eos_token_id": 2,
            "tokenizer.ggml.unknown_token_id": 0,
        },
    )
    return config, params


def test_f32_roundtrip_bit_exact_params_and_logits(tmp_path):
    import jax.numpy as jnp

    from classmate_rag_tpu.models.decoder import empty_cache, forward

    path = tmp_path / "tiny-f32.gguf"
    config, params = _write_tiny_model(path)
    loaded_config, loaded = G.load_params_from_gguf(path)
    assert loaded_config == config
    for a, b in zip(
        __import__("jax").tree.leaves(params), __import__("jax").tree.leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ids = jnp.arange(8, dtype=jnp.int32)[None, :] % config.vocab_size
    pos = jnp.arange(8, dtype=jnp.int32)[None, :]
    cache = empty_cache(config, 1, 32)
    mask = jnp.where(
        jnp.arange(32)[None, None, :] <= pos[:, :, None], 0.0,
        jnp.finfo(jnp.float32).min,
    )
    out_a, _ = forward(params, ids, pos, cache, jnp.int32(0), config, mask)
    out_b, _ = forward(loaded, ids, pos, cache, jnp.int32(0), config, mask)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_config_inference_from_metadata_qwen(tmp_path):
    config = DecoderConfig(
        vocab_size=512, hidden=64, layers=2, heads=4, kv_heads=2, ffn=128,
        max_seq=256, rope_theta=1e6, norm_eps=1e-6, qk_norm=True,
        head_dim_override=32,
    )
    params = init_params(config, "qwen3-fixture")
    G.export_decoder_to_gguf(tmp_path / "q3.gguf", params, config, arch="qwen3")
    got_config, got = G.load_params_from_gguf(tmp_path / "q3.gguf")
    assert got_config == config
    assert "q_norm" in got["layers"]


def test_quantized_model_loads_with_bounded_error(tmp_path):
    for quant in (G.GGML_Q8_0, G.GGML_Q4_K, G.GGML_Q6_K):
        path = tmp_path / f"tiny-{quant}.gguf"
        config, params = _write_tiny_model(path, quant=quant)
        _, loaded = G.load_params_from_gguf(path, config)
        ref = np.asarray(params["layers"]["q_w"], np.float32)
        got = np.asarray(loaded["layers"]["q_w"], np.float32)
        err = np.abs(ref - got).max()
        assert err < 0.05, f"type {quant}: {err}"
        # norms were too narrow for the block quant → stored F32 exact
        np.testing.assert_array_equal(
            np.asarray(params["final_norm"]), np.asarray(loaded["final_norm"])
        )


# ---------------------------------------------------------------------------
# Embedded tokenizer
# ---------------------------------------------------------------------------

def test_unigram_tokenizer_roundtrip():
    tokens = _tiny_tokens(512)
    scores = [0.0] * 3 + [-10.0] * 256 + [-1.0] * 13 + [-25.0] * (512 - 272)
    tok = G.GGUFTokenizer({
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": scores,
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.ggml.unknown_token_id": 0,
    })
    ids = tok.encode_raw("hello world")
    assert ids[0] == tok.bos_id
    # viterbi must pick the whole-word pieces over char-by-char bytes
    assert tokens.index("▁hello") in ids
    assert tokens.index("▁world") in ids
    assert tok.decode(ids) == "hello world"
    # byte fallback for a char with no piece: round-trips through <0xNN>
    ids2 = tok.encode_raw("hello Ω")
    assert tok.decode(ids2) == "hello Ω"


def test_bpe_tokenizer_merges_and_roundtrip():
    # Byte-level BPE: "Ġ" is the byte-encoder image of space.
    tokens = ["<unk>", "<s>", "</s>", "Ġ", "h", "e", "l", "o", "w", "r", "d",
              "he", "ll", "llo", "hello", "Ġhello", "wo", "rl", "rld",
              "world", "Ġworld"]
    merges = ["h e", "l l", "ll o", "he llo", "Ġ hello", "w o", "r l",
              "rl d", "wo rld", "Ġ world"]
    tok = G.GGUFTokenizer({
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.merges": merges,
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    })
    ids = tok.encode_raw("hello world")
    # "hello" merges h+e, l+l+o, he+llo; " world" merges to one piece
    assert tokens.index("hello") in ids
    assert tokens.index("Ġworld") in ids
    assert tok.decode(ids) == "hello world"


# ---------------------------------------------------------------------------
# Runner + config wiring (VERDICT r3 #4: LLM_FILENAME resolution through
# the TPU decode path)
# ---------------------------------------------------------------------------

def test_tpu_runner_loads_gguf_end_to_end(tmp_path):
    from classmate_rag_tpu.generation.runner import TPUDecodeRunner

    path = tmp_path / "route-model.gguf"
    _write_tiny_model(path, quant=G.GGML_Q8_0)
    runner = TPUDecodeRunner(model_dir=str(path), max_new_tokens=4, max_seq=64)
    assert runner.has_pretrained_weights
    assert runner.model_name == "route-model.gguf"
    assert runner.eos_ids == [2]
    assert isinstance(runner.tokenizer, G.GGUFTokenizer)
    out = runner.chat([{"role": "user", "content": "hello world"}])
    assert isinstance(out, str)  # random weights: content is arbitrary


def test_get_runner_resolves_configured_gguf(tmp_path, monkeypatch):
    from classmate_rag_tpu.config import load_config
    from classmate_rag_tpu.generation.runner import (
        TPUDecodeRunner, get_runner,
    )

    path = tmp_path / "Llama-3.1-8B-Instruct.Q4_K_M.gguf"
    _write_tiny_model(path, quant=G.GGML_Q8_0)
    monkeypatch.setenv("LLM_BACKEND", "tpu")
    monkeypatch.setenv("LLM_MODEL_PATH", str(path))
    monkeypatch.setenv("TPU_DECODE_MAX_SEQ", "64")
    monkeypatch.delenv("TPU_DECODER_MODEL_DIR", raising=False)
    runner = get_runner(load_config(reload=True))
    assert isinstance(runner, TPUDecodeRunner)
    assert runner.has_pretrained_weights
    assert runner.model_name == path.name


# ---------------------------------------------------------------------------
# Round-4 review regressions
# ---------------------------------------------------------------------------

def test_bpe_pretokenizer_preserves_underscores():
    # '_' is \w but neither letter nor digit: a [^\s\w] "other" class
    # silently DELETED it from the text (review finding). llama.cpp's
    # \p-based gpt2 pattern keeps it in the punctuation class.
    tokens = ["<unk>", "<s>", "</s>", "m", "y", "_", "v", "a", "r",
              "Ġ", "f", "o", "b", "(", ")", "1", "=", "."]
    tok = G.GGUFTokenizer({
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.merges": [],
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    })
    for text in ("my_var", "foo_bar(1)", "a = b_1.f"):
        assert tok.decode(tok.encode_raw(text)) == text


def test_bpe_add_bos_flag_semantics():
    base = {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": ["<unk>", "<s>", "</s>", "h", "i"],
        "tokenizer.ggml.merges": [],
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    }
    # BPE default (no flag): no BOS prepended (llama.cpp semantics).
    assert G.GGUFTokenizer(base).encode_raw("hi")[0] != 1
    # Explicit flag wins, both ways.
    on = dict(base)
    on["tokenizer.ggml.add_bos_token"] = True
    assert G.GGUFTokenizer(on).encode_raw("hi")[0] == 1
    # A BPE file with NO bos id never invents one (old code defaulted 1).
    nobos = {k: v for k, v in on.items()
             if k != "tokenizer.ggml.bos_token_id"}
    t = G.GGUFTokenizer(nobos)
    assert t.bos_id is None
    assert t.encode_raw("hi")[0] != 1
    # SPM default: BOS prepended without any flag.
    spm = {
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": _tiny_tokens(512),
        "tokenizer.ggml.scores": [0.0] * 512,
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    }
    assert G.GGUFTokenizer(spm).encode_raw("hello")[0] == 1
    off = dict(spm)
    off["tokenizer.ggml.add_bos_token"] = False
    assert G.GGUFTokenizer(off).encode_raw("hello")[0] != 1


def test_write_gguf_with_explicit_alignment_roundtrips(tmp_path):
    # The writer declared len(metadata)+1 KVs while setdefault added
    # nothing when the caller already carried general.alignment -> a
    # corrupt header (review finding, reproduced via read->write).
    path = tmp_path / "align.gguf"
    arr = np.arange(64, dtype=np.float32).reshape(2, 32)
    G.write_gguf(
        path,
        {"general.architecture": "llama", "general.alignment": 64},
        {"t": arr},
    )
    metadata, tensors = G.load_gguf(path)
    assert metadata["general.alignment"] == 64
    np.testing.assert_array_equal(tensors["t"], arr)


def test_load_params_host_tree_is_numpy_and_matches_device(tmp_path):
    path = tmp_path / "host.gguf"
    config, _ = _write_tiny_model(path, quant=G.GGML_Q8_0)
    cfg_h, host_tree = G.load_params_from_gguf(path, host=True)
    import jax

    for leaf in jax.tree.leaves(host_tree):
        assert isinstance(leaf, np.ndarray), type(leaf)
    cfg_d, dev_tree = G.load_params_from_gguf(path)
    flat_h = jax.tree.leaves(host_tree)
    flat_d = jax.tree.leaves(dev_tree)
    assert len(flat_h) == len(flat_d)
    for h, d in zip(flat_h, flat_d):
        np.testing.assert_array_equal(np.asarray(h), np.asarray(d))


def test_lazy_gguf_tensors_match_eager(tmp_path):
    path = tmp_path / "lazy.gguf"
    _write_tiny_model(path, quant=G.GGML_Q4_0)
    metadata, eager = G.load_gguf(path)
    lazy = G.LazyGGUFTensors(path)
    assert set(lazy) == set(eager)
    assert lazy.f32_nbytes() == sum(4 * t.size for t in eager.values())
    for name in ("token_embd.weight", "blk.0.attn_q.weight"):
        np.testing.assert_array_equal(lazy[name], eager[name])


def test_runner_eos_includes_chat_turn_enders(tmp_path):
    # GGUF conversions routinely record only <|end_of_text|> as eos
    # while chat turns end with <|eot_id|> (review finding): the runner
    # must stop on the turn ender and strip both.
    from classmate_rag_tpu.generation.runner import TPUDecodeRunner

    config = DecoderConfig.tiny_test()
    params = init_params(config, "gguf-eot-fixture")
    tokens = _tiny_tokens(config.vocab_size)
    tokens[-2] = "<|end_of_text|>"
    tokens[-1] = "<|eot_id|>"
    end_of_text, eot = len(tokens) - 2, len(tokens) - 1
    G.export_decoder_to_gguf(
        tmp_path / "llama3ish.gguf", params, config, arch="llama",
        quant_type=G.GGML_F32,
        extra_metadata={
            "tokenizer.ggml.model": "llama",
            "tokenizer.ggml.tokens": (G.T_ARRAY, (G.T_STRING, tokens)),
            "tokenizer.ggml.scores": (
                G.T_ARRAY, (G.T_FLOAT32, [0.0] * len(tokens)),
            ),
            "tokenizer.ggml.bos_token_id": 1,
            "tokenizer.ggml.eos_token_id": end_of_text,
        },
    )
    runner = TPUDecodeRunner(
        model_dir=str(tmp_path / "llama3ish.gguf"),
        max_new_tokens=4, max_seq=64,
    )
    assert runner.eos_ids == [end_of_text, eot]
    assert runner.eos_id == eot  # the decode loop stops on the turn ender
