"""Causal decoder LM in pure JAX: the TPU-native answer to llama.cpp.

The reference generates with GGUF models through llama-cpp-python
(rag/generation/llama_cpp_runner.py:25-106); its configured route lineup
(rag/config.py:101-113) spans LLaMA (Llama-3.1, salamandraTA), Qwen2
(DeepSeek-R1-Distill-Qwen-7B, Qwen2.5-Coder) and Qwen3 checkpoints. This
module is the TPU path covering all three families: a decoder (RMSNorm,
RoPE, GQA attention, SwiGLU; optional QKV biases for Qwen2, optional
per-head QK-norm + decoupled head_dim for Qwen3) with

- stacked per-layer params + ``lax.scan`` body (one compiled layer),
- a preallocated KV cache updated by ``dynamic_update_slice`` — static
  shapes, no recompiles during decode,
- a jitted single-token decode step and a ``lax.scan`` generate loop with
  temperature/top-p sampling (seeded, deterministic),
- bf16 matmuls with f32 accumulation; norms/logits in f32,
- HF-checkpoint loading (safetensors/bin) with deterministic seeded init
  as the offline fallback.

Default config is a ~160M-param model (compute-shape realistic, loadable
in this sandbox); ``DecoderConfig.llama3_8b()`` matches Llama-3.1-8B for
when real weights are present.
"""

from __future__ import annotations

import dataclasses
import math
from hashlib import blake2b
from pathlib import Path
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 32000
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    kv_heads: int = 4
    ffn: int = 2048
    max_seq: int = 2048
    rope_theta: float = 500000.0
    norm_eps: float = 1e-5
    compute_dtype: Any = jnp.bfloat16
    # Family switches. The reference's route lineup
    # (rag/config.py:101-113) spans three decoder families: LLaMA
    # (salamandraTA, Llama-3.1), Qwen2 (DeepSeek-R1-Distill-Qwen,
    # Qwen2.5-Coder: biases on the QKV projections), and Qwen3
    # (per-head RMSNorm on Q/K before RoPE, explicit head_dim that need
    # not equal hidden/heads).
    qkv_bias: bool = False
    qk_norm: bool = False
    head_dim_override: Optional[int] = None

    @property
    def head_dim(self) -> int:
        return self.head_dim_override or self.hidden // self.heads

    @classmethod
    def small(cls) -> "DecoderConfig":
        return cls()

    @classmethod
    def tiny_test(cls) -> "DecoderConfig":
        return cls(vocab_size=512, hidden=64, layers=2, heads=4, kv_heads=2,
                   ffn=128, max_seq=128)

    @classmethod
    def llama3_8b(cls) -> "DecoderConfig":
        return cls(vocab_size=128256, hidden=4096, layers=32, heads=32,
                   kv_heads=8, ffn=14336, max_seq=8192)

    @classmethod
    def qwen2_7b(cls) -> "DecoderConfig":
        """Qwen2.5-7B shape (also DeepSeek-R1-Distill-Qwen-7B)."""
        return cls(vocab_size=152064, hidden=3584, layers=28, heads=28,
                   kv_heads=4, ffn=18944, max_seq=32768,
                   rope_theta=1000000.0, norm_eps=1e-6, qkv_bias=True)

    @classmethod
    def qwen3_8b(cls) -> "DecoderConfig":
        return cls(vocab_size=151936, hidden=4096, layers=36, heads=32,
                   kv_heads=8, ffn=12288, max_seq=32768,
                   rope_theta=1000000.0, norm_eps=1e-6, qk_norm=True,
                   head_dim_override=128)

    @classmethod
    def from_hf_config(cls, model_dir: str | Path) -> Optional["DecoderConfig"]:
        """Build the config from an HF checkpoint's config.json (LLaMA
        family). None when no readable config is present."""
        import json

        path = Path(model_dir) / "config.json"
        if not path.exists():
            return None
        try:
            raw = json.loads(path.read_text(encoding="utf-8"))
        except (OSError, ValueError):
            return None
        try:
            model_type = str(raw.get("model_type", "llama")).lower()
            # Qwen2's HF module hardcodes bias=True on q/k/v; LLaMA and
            # Qwen3 read it from `attention_bias` (default False).
            qkv_bias = bool(raw.get("attention_bias", model_type == "qwen2"))
            head_dim = raw.get("head_dim")
            return cls(
                vocab_size=int(raw["vocab_size"]),
                hidden=int(raw["hidden_size"]),
                layers=int(raw["num_hidden_layers"]),
                heads=int(raw["num_attention_heads"]),
                kv_heads=int(raw.get("num_key_value_heads",
                                     raw["num_attention_heads"])),
                ffn=int(raw["intermediate_size"]),
                max_seq=int(raw.get("max_position_embeddings", 8192)),
                # HF treats an absent rope_theta as 10000 (LLaMA-2 era).
                rope_theta=float(raw.get("rope_theta", 10000.0)),
                norm_eps=float(raw.get("rms_norm_eps", 1e-5)),
                qkv_bias=qkv_bias,
                qk_norm=model_type == "qwen3",
                head_dim_override=int(head_dim) if head_dim else None,
            )
        except (KeyError, TypeError, ValueError):
            return None


Params = Dict[str, Any]


class QTensor(NamedTuple):
    """Per-output-channel symmetric int8 weight: ``q * scale`` ≈ w.

    The single-chip answer to the reference's 8 GB-VRAM constraint
    (rag/routing/loader.py:1-12): a 7-8B route model at bf16 needs dp×tp
    across chips, at int8 it fits ONE chip — and decode is HBM-bandwidth
    bound, so reading 1 byte/param instead of 2 is also a throughput
    lever. Activations quantize dynamically per token (W8A8 symmetric);
    the MXU runs the int8×int8→int32 dot natively.
    """

    q: jnp.ndarray        # int8, weight shape
    scale: jnp.ndarray    # f32, per output channel (last axis of q)


jax.tree_util.register_pytree_node(
    QTensor,
    lambda t: ((t.q, t.scale), None),
    lambda _, leaves: QTensor(*leaves),
)


def quantize_tensor(w: jnp.ndarray) -> QTensor:
    """Symmetric per-out-channel int8 quantization (last axis = out)."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=False)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QTensor(q, scale)


# Weight leaves worth quantizing: every 2-D matmul operand. Norm gains
# and QKV biases stay f32 (tiny); tok_emb is handled separately (gather).
_QUANT_LAYER_KEYS = (
    "q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w",
)


def quantize_decoder_params(params: Params, config: DecoderConfig) -> Params:
    """int8-quantize the matmul weights of a decoder param tree.

    Per-layer stacks [L, in, out] quantize per (layer, out) channel so
    each layer keeps its own scales. ``forward`` dispatches on the
    QTensor leaf type — generation code is unchanged. Token parity vs
    the bf16 path is tested (tests/test_quant_decoder.py); small greedy
    divergence on near-tie logits is inherent and documented there.
    """
    layers = dict(params["layers"])
    for key in _QUANT_LAYER_KEYS:
        w = jnp.asarray(layers[key], jnp.float32)          # [L, in, out]
        amax = jnp.max(jnp.abs(w), axis=1)                 # [L, out]
        scale = jnp.maximum(amax, 1e-12) / 127.0
        q = jnp.clip(
            jnp.round(w / scale[:, None, :]), -127, 127
        ).astype(jnp.int8)
        layers[key] = QTensor(q, scale)
    out = dict(params)
    out["layers"] = layers
    out["lm_head"] = quantize_tensor(params["lm_head"])
    # Token embedding: int8 rows + per-hidden-channel scale; the gather
    # dequantizes the few looked-up rows only.
    out["tok_emb"] = quantize_tensor(params["tok_emb"])
    return out


def quantized_param_bytes(params: Params) -> int:
    return sum(
        x.nbytes for x in jax.tree.leaves(params)
    )


def quantize_decoder_params_host(params: Params, config: DecoderConfig) -> Params:
    """numpy twin of ``quantize_decoder_params`` for 7-8B trees.

    An 8B f32 tree is ~30 GB — staging its leaves through a 16 GB-HBM
    chip to quantize there is not an option. Quantize on the host and
    ship int8+scales only (~8 GB), the same bytes the device keeps.
    Same math as the jnp path (np.rint == jnp.round, half-to-even).
    """

    def np_qt(w: np.ndarray) -> QTensor:
        w = np.asarray(w, np.float32)
        amax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)))
        scale = np.maximum(amax, 1e-12).astype(np.float32) / 127.0
        q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
        return QTensor(q, scale)

    layers = dict(params["layers"])
    for key in _QUANT_LAYER_KEYS:
        w = np.asarray(layers[key], np.float32)            # [L, in, out]
        amax = np.max(np.abs(w), axis=1)                   # [L, out]
        scale = np.maximum(amax, 1e-12).astype(np.float32) / 127.0
        q = np.clip(
            np.rint(w / scale[:, None, :]), -127, 127
        ).astype(np.int8)
        layers[key] = QTensor(q, scale)
    out = dict(params)
    out["layers"] = layers
    out["lm_head"] = np_qt(params["lm_head"])
    out["tok_emb"] = np_qt(params["tok_emb"])
    return out


def _mm(x: jnp.ndarray, w, cdtype) -> jnp.ndarray:
    """Generic last-dim-contraction matmul: x[..., h] @ w[h, o] → f32.

    bf16 path for dense weights; W8A8 dynamic path for QTensor weights
    (per-token activation scales, int8×int8→int32 on the MXU, dequant by
    sx·sw in the f32 epilogue)."""
    if isinstance(w, QTensor):
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        sx = jnp.maximum(amax, 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, w.q,
            (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * sx * w.scale
    return jnp.einsum(
        "...h,ho->...o", x, w.astype(cdtype),
        preferred_element_type=jnp.float32,
    )


def _embed(tok_emb, input_ids: jnp.ndarray) -> jnp.ndarray:
    if isinstance(tok_emb, QTensor):
        return tok_emb.q[input_ids].astype(jnp.float32) * tok_emb.scale
    return tok_emb[input_ids]


def init_params(
    config: DecoderConfig, seed_key: str, host: bool = False
) -> Params:
    """Deterministic random params. ``host=True`` keeps the tree in
    numpy — a 7-8B f32 tree (~30 GB) must be quantized host-side
    (quantize_decoder_params_host) before any device transfer."""
    seed = int.from_bytes(blake2b(seed_key.encode(), digest_size=4).digest(), "little")
    rng = np.random.default_rng(seed)
    h, L, ff = config.hidden, config.layers, config.ffn
    qh = config.heads * config.head_dim
    kvh = config.kv_heads * config.head_dim

    def norm(*shape):
        return rng.normal(0.0, 0.02, size=shape).astype(np.float32)

    layers: Dict[str, np.ndarray] = {
        "attn_norm": np.ones((L, h), np.float32),
        "q_w": norm(L, h, qh),
        "k_w": norm(L, h, kvh),
        "v_w": norm(L, h, kvh),
        "o_w": norm(L, qh, h),
        "ffn_norm": np.ones((L, h), np.float32),
        "gate_w": norm(L, h, ff),
        "up_w": norm(L, h, ff),
        "down_w": norm(L, ff, h),
    }
    if config.qkv_bias:
        layers["q_b"] = norm(L, qh)
        layers["k_b"] = norm(L, kvh)
        layers["v_b"] = norm(L, kvh)
    if config.qk_norm:
        layers["q_norm"] = np.ones((L, config.head_dim), np.float32)
        layers["k_norm"] = np.ones((L, config.head_dim), np.float32)
    params: Params = {
        "tok_emb": norm(config.vocab_size, h),
        "final_norm": np.ones(h, np.float32),
        "lm_head": norm(h, config.vocab_size),
        "layers": layers,
    }
    if host:
        return params
    return jax.tree.map(jnp.asarray, params)


def load_params_from_hf(model_dir: str, config: DecoderConfig) -> Optional[Params]:
    """Convert an HF LlamaForCausalLM checkpoint into the stacked pytree."""
    d = Path(model_dir)
    files = sorted(d.glob("*.safetensors")) or sorted(d.glob("pytorch_model*.bin"))
    if not files:
        return None
    sd: Dict[str, np.ndarray] = {}
    for f in files:
        if f.suffix == ".safetensors":
            from safetensors.numpy import load_file

            sd.update(load_file(str(f)))
        else:
            import torch

            part = torch.load(str(f), map_location="cpu", weights_only=True)
            sd.update({k: v.numpy() for k, v in part.items()})

    def get(name: str) -> np.ndarray:
        for prefix in ("", "model."):
            if prefix + name in sd:
                return np.asarray(sd[prefix + name], dtype=np.float32)
        raise KeyError(name)

    try:
        L = config.layers
        keys = [
            "attn_norm", "q_w", "k_w", "v_w", "o_w",
            "ffn_norm", "gate_w", "up_w", "down_w",
        ]
        if config.qkv_bias:
            keys += ["q_b", "k_b", "v_b"]
        if config.qk_norm:
            keys += ["q_norm", "k_norm"]
        stacks: Dict[str, list] = {k: [] for k in keys}
        for i in range(L):
            base = f"layers.{i}."
            stacks["attn_norm"].append(get(base + "input_layernorm.weight"))
            stacks["q_w"].append(get(base + "self_attn.q_proj.weight").T)
            stacks["k_w"].append(get(base + "self_attn.k_proj.weight").T)
            stacks["v_w"].append(get(base + "self_attn.v_proj.weight").T)
            stacks["o_w"].append(get(base + "self_attn.o_proj.weight").T)
            if config.qkv_bias:
                stacks["q_b"].append(get(base + "self_attn.q_proj.bias"))
                stacks["k_b"].append(get(base + "self_attn.k_proj.bias"))
                stacks["v_b"].append(get(base + "self_attn.v_proj.bias"))
            if config.qk_norm:
                stacks["q_norm"].append(get(base + "self_attn.q_norm.weight"))
                stacks["k_norm"].append(get(base + "self_attn.k_norm.weight"))
            stacks["ffn_norm"].append(get(base + "post_attention_layernorm.weight"))
            stacks["gate_w"].append(get(base + "mlp.gate_proj.weight").T)
            stacks["up_w"].append(get(base + "mlp.up_proj.weight").T)
            stacks["down_w"].append(get(base + "mlp.down_proj.weight").T)
        tok_emb = get("embed_tokens.weight")
        try:
            lm_head = get("lm_head.weight").T
        except KeyError:
            lm_head = tok_emb.T  # tied embeddings
        params: Params = {
            "tok_emb": tok_emb,
            "final_norm": get("norm.weight"),
            "lm_head": lm_head,
            "layers": {k: np.stack(v) for k, v in stacks.items()},
        }
    except KeyError:
        return None
    # Shape validation: a checkpoint of the wrong size must be rejected,
    # not crash later inside the forward's head reshapes.
    if params["tok_emb"].shape != (config.vocab_size, config.hidden):
        return None
    q_width = config.heads * config.head_dim
    if params["layers"]["q_w"].shape != (config.layers, config.hidden,
                                         q_width):
        return None
    return jax.tree.map(jnp.asarray, params)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _rms_norm(x: jnp.ndarray, g: jnp.ndarray, eps: float) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return x * scale * g


def _rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """x: [B, T, H, D]; positions: [B, T]."""
    d = x.shape[-1]
    half = d // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions[:, :, None].astype(jnp.float32) * freqs[None, None, :]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def forward(
    params: Params,
    input_ids: jnp.ndarray,          # [B, T]
    positions: jnp.ndarray,          # [B, T] absolute positions
    kv_cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]],  # ([L,B,S,KH,D], ...)
    cache_offset: jnp.ndarray,       # [] int32: write position in the cache
    config: DecoderConfig,
    attn_mask: jnp.ndarray = None,   # [B, T, S] additive f32 — REQUIRED
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Returns (logits [B, T, V] f32, updated kv cache).

    ``attn_mask`` is required (kept keyword-positioned for the existing
    call sites): the body indexes it unconditionally, and a silent
    causal default would mask the left-padded prefill wrong."""
    if attn_mask is None:
        raise TypeError(
            "forward() requires attn_mask ([B, T, S] additive f32); see "
            "make_generate_fn for the left-padded prefill/decode masks"
        )
    cdtype = config.compute_dtype
    B, T = input_ids.shape
    H, KH, D = config.heads, config.kv_heads, config.head_dim
    S = kv_cache[0].shape[2]

    x = _embed(params["tok_emb"], input_ids)              # [B, T, h] f32

    def layer_step(carry, lp_and_cache):
        hidden, = carry
        lp, k_cache_l, v_cache_l = lp_and_cache

        normed = _rms_norm(hidden, lp["attn_norm"], config.norm_eps).astype(cdtype)
        q = _mm(normed, lp["q_w"], cdtype)
        k = _mm(normed, lp["k_w"], cdtype)
        v = _mm(normed, lp["v_w"], cdtype)
        if config.qkv_bias:  # Qwen2 family
            q = q + lp["q_b"]
            k = k + lp["k_b"]
            v = v + lp["v_b"]
        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, KH, D)
        v = v.reshape(B, T, KH, D)
        if config.qk_norm:  # Qwen3 family: per-head RMSNorm before RoPE
            q = _rms_norm(q, lp["q_norm"], config.norm_eps)
            k = _rms_norm(k, lp["k_norm"], config.norm_eps)
        q = _rope(q.astype(jnp.float32), positions, config.rope_theta)
        k = _rope(k.astype(jnp.float32), positions, config.rope_theta)

        k_cache_l = jax.lax.dynamic_update_slice(
            k_cache_l, k.astype(k_cache_l.dtype), (0, cache_offset, 0, 0))
        v_cache_l = jax.lax.dynamic_update_slice(
            v_cache_l, v.astype(v_cache_l.dtype), (0, cache_offset, 0, 0))

        # GQA: repeat kv heads to full head count.
        rep = H // KH
        k_full = jnp.repeat(k_cache_l, rep, axis=2)       # [B, S, H, D]
        v_full = jnp.repeat(v_cache_l, rep, axis=2)

        scores = jnp.einsum(
            "bthd,bshd->bhts", q.astype(cdtype), k_full.astype(cdtype),
            preferred_element_type=jnp.float32,
        ) / math.sqrt(D)
        scores = scores + attn_mask[:, None, :, :]
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum(
            "bhts,bshd->bthd", probs.astype(cdtype), v_full.astype(cdtype),
            preferred_element_type=jnp.float32,
        ).reshape(B, T, H * D)
        attn_out = _mm(ctx.astype(cdtype), lp["o_w"], cdtype)
        hidden = hidden + attn_out

        normed2 = _rms_norm(hidden, lp["ffn_norm"], config.norm_eps).astype(cdtype)
        gate = _mm(normed2, lp["gate_w"], cdtype)
        up = _mm(normed2, lp["up_w"], cdtype)
        ff = jax.nn.silu(gate) * up
        down = _mm(ff.astype(cdtype), lp["down_w"], cdtype)
        hidden = hidden + down
        return (hidden,), (k_cache_l, v_cache_l)

    (x,), (new_k, new_v) = jax.lax.scan(
        layer_step, (x,), (params["layers"], kv_cache[0], kv_cache[1])
    )
    x = _rms_norm(x, params["final_norm"], config.norm_eps)
    logits = _mm(x.astype(cdtype), params["lm_head"], cdtype)
    return logits, (new_k, new_v)


def empty_cache(config: DecoderConfig, batch: int, max_seq: Optional[int] = None):
    S = max_seq or config.max_seq
    shape = (config.layers, batch, S, config.kv_heads, config.head_dim)
    return (jnp.zeros(shape, jnp.bfloat16), jnp.zeros(shape, jnp.bfloat16))


# ---------------------------------------------------------------------------
# Generation
# ---------------------------------------------------------------------------

def _sample(logits, rng_key, temperature, top_p):
    """Temperature + nucleus sampling; temperature<=0 → greedy.

    temperature/top_p may be traced scalars: both branches are computed and
    selected with ``where`` (the greedy case is one argmax — negligible).
    """
    greedy = jnp.argmax(logits, axis=-1)
    t = jnp.maximum(temperature, 1e-6)
    scaled = logits / t
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    filtered = jnp.where(scaled < cutoff, -jnp.inf, scaled)
    sampled = jax.random.categorical(rng_key, filtered, axis=-1)
    return jnp.where(temperature <= 0.0, greedy, sampled)


def make_generate_fn(config: DecoderConfig, max_seq: int, max_new: int):
    """Build a jitted generate(params, prompt_ids, prompt_len, seed,
    temperature, top_p, eos_ids) → token ids [B, max_new] (eos-padded).

    ``eos_ids`` is an i32 [E] array: generation stops on ANY of them
    (Llama-3-Instruct declares several — a raw <|end_of_text|> must end
    the row, not leave it sampling from the post-eos distribution for
    the rest of the horizon). A scalar is accepted for back-compat.

    ``prompt_ids`` must be LEFT-padded to a common width P so every row's
    last real token sits at slot P−1: prefill is one forward over [B, P],
    and each decode step writes the shared cache slot P+i while RoPE
    positions stay per-row (slot − pad_offset). Decode is a ``lax.scan``
    over the static ``max_new`` horizon with per-row eos done-flags —
    static shapes throughout, zero recompiles.
    """
    from classmate_rag_tpu.utils.numerics import NEG_INF as neg

    def generate(params, prompt_ids, prompt_len, seed, temperature, top_p,
                 eos_ids):
        eos_arr = jnp.atleast_1d(jnp.asarray(eos_ids, jnp.int32))
        pad_tok = eos_arr[0]
        B, P = prompt_ids.shape
        cache = empty_cache(config, B, max_seq)
        pad_offset = (P - prompt_len).astype(jnp.int32)          # [B]
        slot = jnp.arange(P, dtype=jnp.int32)[None, :]           # [1, P]
        positions = slot - pad_offset[:, None]                   # [B, P]
        real = positions >= 0
        pos_safe = jnp.maximum(positions, 0)

        # Prefill mask over cache slots: key slot must hold a real prompt
        # token (slot >= pad_offset) and be causal (key slot <= query slot).
        key_slot = jnp.arange(max_seq, dtype=jnp.int32)[None, None, :]
        valid_key = key_slot >= pad_offset[:, None, None]
        causal = key_slot <= slot[:, :, None]
        mask = jnp.where(valid_key & causal & real[:, :, None], 0.0, neg)
        logits, cache = forward(
            params, prompt_ids, pos_safe, cache, jnp.int32(0), config,
            attn_mask=mask,
        )
        last = logits[:, -1, :]  # all rows end at slot P-1

        keys = jax.random.split(jax.random.PRNGKey(seed), max_new)

        def step(carry, inputs):
            cache, cur_logits, done = carry
            i, key = inputs
            tok = _sample(cur_logits, key, temperature, top_p)
            tok = jnp.where(done, pad_tok, tok).astype(jnp.int32)
            out_tok = tok
            done = done | jnp.any(
                tok[:, None] == eos_arr[None, :], axis=1
            )
            write_slot = P + i                                   # scalar
            positions = (write_slot - pad_offset)[:, None]       # [B, 1]
            valid = (key_slot >= pad_offset[:, None, None]) & (
                key_slot <= write_slot
            )
            mask = jnp.where(valid, 0.0, neg)
            logits, cache = forward(
                params, tok[:, None], positions, cache,
                write_slot.astype(jnp.int32), config, attn_mask=mask,
            )
            return (cache, logits[:, 0, :], done), out_tok

        init = (cache, last, jnp.zeros((B,), bool))
        _, toks = jax.lax.scan(
            step, init, (jnp.arange(max_new, dtype=jnp.int32), keys)
        )
        return jnp.transpose(toks)  # [B, max_new]

    return jax.jit(generate)
