"""XLM-RoBERTa / E5 encoder as a pure-JAX forward pass.

This replaces the reference's sentence-transformers/torch dependency
(rag/embeddings/__init__.py:36-105) with a TPU-first implementation:

- parameters live in a flat pytree with per-layer tensors stacked on a
  leading [L, ...] axis so the encoder body is a single ``lax.scan`` —
  one compiled layer, L iterations, minimal compile time;
- matmuls run in bf16 with f32 accumulation (``preferred_element_type``),
  layernorms and the final pooling in f32;
- weights load from a local HF snapshot (safetensors or pytorch .bin)
  when present, otherwise deterministic random init seeded from the model
  name — the full pipeline stays runnable (and benchmarkable) offline.

E5 semantics on top (https://huggingface.co/intfloat/multilingual-e5-base):
"query: "/"passage: " prefixes, masked mean pooling, L2 normalization.
"""

from __future__ import annotations

import dataclasses
import math
from hashlib import blake2b
from pathlib import Path
from typing import Any, Dict, Optional

from classmate_rag_tpu.utils.numerics import NEG_INF

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 250002
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 514
    type_vocab: int = 1
    pad_id: int = 1
    ln_eps: float = 1e-5
    compute_dtype: Any = jnp.bfloat16
    # Use the Pallas flash-attention kernel for sequences >= this length.
    # Measured on v5e at (B=16, T=512, head_dim=64): flash matches
    # numerically (cos 1.0) but runs SLOWER than XLA's fused attention
    # (35.6 vs 24.2 ms/batch) — the [T, T] scores at these sizes fit
    # on-chip and XLA already avoids the HBM round-trip. Kept for longer
    # contexts where the quadratic buffer stops fitting.
    flash_min_seq: int = 1024
    # Pallas-fused epilogues (ops/encoder_fused.py): bias+GELU written in
    # the next matmul's bf16 and residual+bias+LayerNorm in one HBM pass.
    # Measured a NON-lever on v5e (docs/perf.md): the A/B roofline reads
    # 43.5 ms/step fused vs 38.5 unfused at (B=64, T=256) — XLA already
    # fuses these chains, and 36 pallas_call boundaries per step cost
    # more than they save. Kept for the record behind this flag.
    fused_epilogue: bool = False

    @classmethod
    def base(cls) -> "EncoderConfig":
        return cls()

    @classmethod
    def large(cls) -> "EncoderConfig":
        return cls(hidden=1024, layers=24, heads=16, intermediate=4096)

    @classmethod
    def small_test(cls) -> "EncoderConfig":
        """Tiny config for CPU tests."""
        return cls(vocab_size=1024, hidden=64, layers=2, heads=4,
                   intermediate=128, max_positions=130)

    @classmethod
    def for_model_name(cls, name: str) -> "EncoderConfig":
        if "large" in (name or ""):
            return cls.large()
        return cls.base()


Params = Dict[str, Any]


def init_params(config: EncoderConfig, seed_key: str) -> Params:
    """Deterministic init: seed derived from the model name string."""
    seed = int.from_bytes(
        blake2b(seed_key.encode("utf-8"), digest_size=4).digest(), "little"
    )
    rng = np.random.default_rng(seed)
    scale = 0.02
    h, L, ff = config.hidden, config.layers, config.intermediate

    def norm(*shape):
        return rng.normal(0.0, scale, size=shape).astype(np.float32)

    params: Params = {
        "word_emb": norm(config.vocab_size, h),
        "pos_emb": norm(config.max_positions, h),
        "type_emb": norm(config.type_vocab, h),
        "emb_ln_g": np.ones(h, np.float32),
        "emb_ln_b": np.zeros(h, np.float32),
        "layers": {
            "q_w": norm(L, h, h), "q_b": np.zeros((L, h), np.float32),
            "k_w": norm(L, h, h), "k_b": np.zeros((L, h), np.float32),
            "v_w": norm(L, h, h), "v_b": np.zeros((L, h), np.float32),
            "o_w": norm(L, h, h), "o_b": np.zeros((L, h), np.float32),
            "attn_ln_g": np.ones((L, h), np.float32),
            "attn_ln_b": np.zeros((L, h), np.float32),
            "ff_in_w": norm(L, h, ff), "ff_in_b": np.zeros((L, ff), np.float32),
            "ff_out_w": norm(L, ff, h), "ff_out_b": np.zeros((L, h), np.float32),
            "ff_ln_g": np.ones((L, h), np.float32),
            "ff_ln_b": np.zeros((L, h), np.float32),
        },
    }
    return jax.tree.map(jnp.asarray, params)


# ---------------------------------------------------------------------------
# HF weight loading
# ---------------------------------------------------------------------------

def _find_weight_file(model_dir: Path) -> Optional[Path]:
    for name in ("model.safetensors", "pytorch_model.bin"):
        for candidate in [model_dir / name, *model_dir.glob(f"**/{name}")]:
            if candidate.exists():
                return candidate
    return None


def _load_state_dict(path: Path) -> Dict[str, np.ndarray]:
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(str(path)))
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def load_params_from_hf(model_dir: str, config: EncoderConfig) -> Optional[Params]:
    """Convert an HF XLM-R checkpoint into our stacked-layer pytree."""
    wfile = _find_weight_file(Path(model_dir))
    if wfile is None:
        return None
    sd = _load_state_dict(wfile)

    def get(*names: str) -> np.ndarray:
        for n in names:
            for prefix in ("", "roberta.", "model.", "0.auto_model."):
                key = prefix + n
                if key in sd:
                    return np.asarray(sd[key], dtype=np.float32)
        raise KeyError(names[0])

    h, L = config.hidden, config.layers
    try:
        layer_stacks: Dict[str, list] = {k: [] for k in (
            "q_w", "q_b", "k_w", "k_b", "v_w", "v_b", "o_w", "o_b",
            "attn_ln_g", "attn_ln_b", "ff_in_w", "ff_in_b",
            "ff_out_w", "ff_out_b", "ff_ln_g", "ff_ln_b",
        )}
        for i in range(L):
            base = f"encoder.layer.{i}."
            # torch Linear stores [out, in]; our matmuls use [in, out].
            layer_stacks["q_w"].append(get(base + "attention.self.query.weight").T)
            layer_stacks["q_b"].append(get(base + "attention.self.query.bias"))
            layer_stacks["k_w"].append(get(base + "attention.self.key.weight").T)
            layer_stacks["k_b"].append(get(base + "attention.self.key.bias"))
            layer_stacks["v_w"].append(get(base + "attention.self.value.weight").T)
            layer_stacks["v_b"].append(get(base + "attention.self.value.bias"))
            layer_stacks["o_w"].append(get(base + "attention.output.dense.weight").T)
            layer_stacks["o_b"].append(get(base + "attention.output.dense.bias"))
            layer_stacks["attn_ln_g"].append(get(base + "attention.output.LayerNorm.weight"))
            layer_stacks["attn_ln_b"].append(get(base + "attention.output.LayerNorm.bias"))
            layer_stacks["ff_in_w"].append(get(base + "intermediate.dense.weight").T)
            layer_stacks["ff_in_b"].append(get(base + "intermediate.dense.bias"))
            layer_stacks["ff_out_w"].append(get(base + "output.dense.weight").T)
            layer_stacks["ff_out_b"].append(get(base + "output.dense.bias"))
            layer_stacks["ff_ln_g"].append(get(base + "output.LayerNorm.weight"))
            layer_stacks["ff_ln_b"].append(get(base + "output.LayerNorm.bias"))

        params: Params = {
            "word_emb": get("embeddings.word_embeddings.weight"),
            "pos_emb": get("embeddings.position_embeddings.weight"),
            "type_emb": get("embeddings.token_type_embeddings.weight"),
            "emb_ln_g": get("embeddings.LayerNorm.weight"),
            "emb_ln_b": get("embeddings.LayerNorm.bias"),
            "layers": {k: np.stack(v) for k, v in layer_stacks.items()},
        }
    except KeyError:
        return None
    if params["word_emb"].shape[1] != h:
        return None
    return jax.tree.map(jnp.asarray, params)


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------

def _layer_norm(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray, eps: float) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * g + b


def embed_tokens(
    params: Params,
    input_ids: jnp.ndarray,   # [B, T] int32
    attention_mask: jnp.ndarray,
    config: EncoderConfig,
) -> jnp.ndarray:
    """Token + position + type embeddings with the embedding layernorm
    ([B, T, H] f32). Split out of ``encode`` so instrumentation can time
    the transformer stack separately from the vocabulary gather (the
    gather's lowering degrades badly inside chained timing scans —
    tools/bench_encoder_roofline.py)."""
    mask = attention_mask.astype(jnp.float32)
    # RoBERTa position ids: pad_id+1 onwards for real tokens.
    positions = jnp.cumsum(mask.astype(jnp.int32), axis=1) * attention_mask.astype(jnp.int32)
    positions = positions + config.pad_id  # pad rows point at pad_id slot
    x = (
        params["word_emb"][input_ids]
        + params["pos_emb"][positions]
        + params["type_emb"][jnp.zeros_like(input_ids)]
    )
    return _layer_norm(x, params["emb_ln_g"], params["emb_ln_b"], config.ln_eps)


def encode(
    params: Params,
    input_ids: jnp.ndarray,   # [B, T] int32
    attention_mask: jnp.ndarray,  # [B, T] int32/bool
    config: EncoderConfig,
) -> jnp.ndarray:
    """Full encoder forward → L2-normalized mean-pooled embeddings [B, H]."""
    x = embed_tokens(params, input_ids, attention_mask, config)
    return encode_from_embeddings(params, x, attention_mask, config)


def encode_from_embeddings(
    params: Params,
    x: jnp.ndarray,           # [B, T, H] f32 (embed_tokens output)
    attention_mask: jnp.ndarray,
    config: EncoderConfig,
) -> jnp.ndarray:
    """Transformer stack + pooling on pre-computed input embeddings."""
    cdtype = config.compute_dtype
    mask = attention_mask.astype(jnp.float32)
    B, T, H = x.shape
    n_heads = config.heads
    head_dim = H // n_heads
    # Additive attention bias: 0 for real tokens, -inf for padding.
    attn_bias = (1.0 - mask)[:, None, None, :] * NEG_INF
    # Flash attention only helps (and only tiles) at longer sequences; the
    # decision is static per compiled shape. Pad tokens get segment id 0
    # vs 1 for real tokens, which reproduces the padding mask (pad keys
    # never attend to real queries and vice versa).
    use_flash = (
        T >= config.flash_min_seq
        and T % 128 == 0
        and jax.default_backend() == "tpu"
    )
    seg = mask.astype(jnp.int32)

    def _attend(q, k, v):
        """q/k/v: [B, T, heads, head_dim] → context [B, T, H]."""
        if use_flash:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds, flash_attention,
            )

            ctx = flash_attention(
                q.astype(cdtype).transpose(0, 2, 1, 3),
                k.astype(cdtype).transpose(0, 2, 1, 3),
                v.astype(cdtype).transpose(0, 2, 1, 3),
                segment_ids=SegmentIds(q=seg, kv=seg),
                causal=False,
                sm_scale=1.0 / math.sqrt(head_dim),
            )
            return ctx.transpose(0, 2, 1, 3).reshape(B, T, H)
        scores = jnp.einsum(
            "bqnd,bknd->bnqk", q.astype(cdtype), k.astype(cdtype),
            preferred_element_type=jnp.float32,
        ) / math.sqrt(head_dim)
        probs = jax.nn.softmax(scores + attn_bias, axis=-1)
        return jnp.einsum(
            "bnqk,bknd->bqnd", probs.astype(cdtype), v.astype(cdtype),
            preferred_element_type=jnp.float32,
        ).reshape(B, T, H)

    # Pallas-fused epilogues collapse the elementwise chains around the
    # matmuls into one HBM round trip each (ops/encoder_fused.py). Only
    # on a real TPU (Mosaic) and only for block-divisible shapes; the
    # XLA path below stays the reference semantics either way.
    use_fused = (
        config.fused_epilogue
        and jax.default_backend() == "tpu"
    )
    if use_fused:
        from classmate_rag_tpu.ops import encoder_fused as _ef

        use_fused = _ef.fusable(B * T, H) and _ef.fusable(
            B * T, config.intermediate
        )

    def layer_step(hidden, lp):
        hcd = hidden.astype(cdtype)

        def proj(w, b):
            y = jnp.einsum("bth,hd->btd", hcd, w.astype(cdtype),
                           preferred_element_type=jnp.float32) + b
            return y.reshape(B, T, n_heads, head_dim)

        q = proj(lp["q_w"], lp["q_b"])
        k = proj(lp["k_w"], lp["k_b"])
        v = proj(lp["v_w"], lp["v_b"])
        ctx = _attend(q, k, v)
        attn_mm = jnp.einsum(
            "bth,hd->btd", ctx.astype(cdtype), lp["o_w"].astype(cdtype),
            preferred_element_type=jnp.float32,
        )
        if use_fused:
            from classmate_rag_tpu.ops.encoder_fused import (
                bias_gelu, residual_ln,
            )

            hidden = residual_ln(
                hidden.reshape(B * T, H), attn_mm.reshape(B * T, H),
                lp["o_b"], lp["attn_ln_g"], lp["attn_ln_b"],
                eps=config.ln_eps,
            ).reshape(B, T, H)
            ff_mm = jnp.einsum(
                "bth,hf->btf", hidden.astype(cdtype),
                lp["ff_in_w"].astype(cdtype),
                preferred_element_type=jnp.float32,
            )
            ff = bias_gelu(
                ff_mm.reshape(B * T, config.intermediate), lp["ff_in_b"],
                out_dtype=cdtype,
            ).reshape(B, T, config.intermediate)
            ff_mm2 = jnp.einsum(
                "btf,fh->bth", ff, lp["ff_out_w"].astype(cdtype),
                preferred_element_type=jnp.float32,
            )
            hidden = residual_ln(
                hidden.reshape(B * T, H), ff_mm2.reshape(B * T, H),
                lp["ff_out_b"], lp["ff_ln_g"], lp["ff_ln_b"],
                eps=config.ln_eps,
            ).reshape(B, T, H)
            return hidden, None

        attn_out = attn_mm + lp["o_b"]
        hidden = _layer_norm(hidden + attn_out, lp["attn_ln_g"], lp["attn_ln_b"],
                             config.ln_eps)

        hcd = hidden.astype(cdtype)
        ff = jnp.einsum("bth,hf->btf", hcd, lp["ff_in_w"].astype(cdtype),
                        preferred_element_type=jnp.float32) + lp["ff_in_b"]
        ff = jax.nn.gelu(ff, approximate=False)
        ff_out = jnp.einsum(
            "btf,fh->bth", ff.astype(cdtype), lp["ff_out_w"].astype(cdtype),
            preferred_element_type=jnp.float32,
        ) + lp["ff_out_b"]
        hidden = _layer_norm(hidden + ff_out, lp["ff_ln_g"], lp["ff_ln_b"],
                             config.ln_eps)
        return hidden, None

    x, _ = jax.lax.scan(layer_step, x, params["layers"])

    # E5 average pooling over real tokens, then L2 norm.
    denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    pooled = (x * mask[:, :, None]).sum(axis=1) / denom
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(norm, 1e-12)


def encoder_flops(config: EncoderConfig, batch: int, seq: int) -> float:
    """Approximate forward FLOPs (for MFU accounting)."""
    h, ff, L = config.hidden, config.intermediate, config.layers
    per_token = 4 * h * h + 2 * h * ff  # qkvo + ffn matmuls (MACs)
    attn = 2 * seq * h  # scores + context per token (MACs)
    return 2.0 * batch * seq * L * (per_token + attn)
