"""Tensor-parallel (dp×tp) decode for the generation models.

The reference serves its route models (7–8B GGUF: rag/config.py:101-113)
through llama.cpp on one GPU. At bf16 an 8B decoder does not fit a single
v5e chip's HBM, so the TPU-native serving path must shard the model:
Megatron-style tensor parallelism over a ("data", "model") mesh —

- Q/K/V and gate/up projections column-sharded over "model" (head-aligned:
  the model axis divides kv_heads, so every device owns whole KV heads and
  the GQA attention runs entirely device-local);
- o_proj and down_proj row-sharded (XLA inserts the psum at the residual
  add);
- the KV cache sharded over its kv_head axis — each device holds only its
  heads' cache, which is what makes long-context batch decode fit;
- batch data-parallel over "data";
- embeddings/norms replicated; lm_head column-sharded over vocab.

Idiomatic JAX: the shardings are declared on the params and inputs
(NamedSharding + jit), and XLA GSPMD propagates them through the
``lax.scan`` decode loop and inserts the collectives. The forward itself
(models/decoder.py) is unchanged — one implementation serves the
single-chip and the sharded paths, and tests assert token-identical
greedy output between them.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from classmate_rag_tpu.models.decoder import (
    DecoderConfig,
    Params,
    make_generate_fn,
)


def decoder_param_specs(config: DecoderConfig) -> Params:
    """PartitionSpec pytree for the stacked decoder params on a
    ("data", "model") mesh."""
    layers = {
        "attn_norm": P(None, None),
        "q_w": P(None, None, "model"),
        "k_w": P(None, None, "model"),
        "v_w": P(None, None, "model"),
        "o_w": P(None, "model", None),
        "ffn_norm": P(None, None),
        "gate_w": P(None, None, "model"),
        "up_w": P(None, None, "model"),
        "down_w": P(None, "model", None),
    }
    if config.qkv_bias:
        layers["q_b"] = P(None, "model")
        layers["k_b"] = P(None, "model")
        layers["v_b"] = P(None, "model")
    if config.qk_norm:
        # Per-head norms are [L, head_dim] — within a head, replicated.
        layers["q_norm"] = P(None, None)
        layers["k_norm"] = P(None, None)
    return {
        "tok_emb": P(None, None),
        "final_norm": P(None),
        "lm_head": P(None, "model"),
        "layers": layers,
    }


def check_tp_divisibility(config: DecoderConfig, mesh: Mesh) -> None:
    """TP shardings must be head-aligned: the model axis has to divide
    kv_heads (each device owns whole KV heads, GQA stays local) and the
    FFN width."""
    tp = mesh.shape["model"]
    if config.kv_heads % tp:
        raise ValueError(
            f"tensor-parallel degree {tp} must divide kv_heads="
            f"{config.kv_heads} (head-aligned sharding)"
        )
    if config.ffn % tp:
        raise ValueError(
            f"tensor-parallel degree {tp} must divide ffn={config.ffn}"
        )


def auto_mesh_for(config: DecoderConfig, devices=None) -> Mesh:
    """Build a ("data", "model") mesh whose TP degree actually divides
    this model's kv_heads and FFN width (the generic training mesh picks
    the largest tp ≤ 4 regardless of the model's head count)."""
    import numpy as np

    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    tp = 1
    # Any divisor of the device count works as a TP degree as long as it
    # also divides kv_heads and ffn — e.g. tp=3 or 6 on a 6-device mesh
    # with kv_heads=6 (powers of two alone would silently fall to tp=1).
    for cand in sorted(
        (c for c in range(2, min(n, 8) + 1) if n % c == 0), reverse=True
    ):
        if config.kv_heads % cand == 0 and config.ffn % cand == 0:
            tp = cand
            break
    if tp == 1 and n > 1:
        import logging

        # Replicated fallback defeats the HBM-fit purpose of TP; say so,
        # so an OOM on a multi-chip mesh is attributable.
        logging.getLogger(__name__).warning(
            "auto_mesh_for: no tp degree dividing %d devices also divides "
            "kv_heads=%d and ffn=%d — model will be REPLICATED (tp=1)",
            n, config.kv_heads, config.ffn,
        )
    arr = np.array(devs).reshape(n // tp, tp)
    return Mesh(arr, ("data", "model"))


def shard_decoder_params(params: Params, config: DecoderConfig,
                         mesh: Mesh) -> Params:
    """Place the params onto the mesh with the TP layout."""
    specs = decoder_param_specs(config)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
    )


def make_tp_generate_fn(
    config: DecoderConfig,
    mesh: Mesh,
    max_seq: int,
    max_new: int,
):
    """Build a dp×tp-sharded generate function.

    Same signature and token-identical greedy output as
    ``make_generate_fn``'s (models/decoder.py): the underlying forward is
    shared; only the shardings differ. Pass params through
    ``shard_decoder_params`` first (or let jit's in_shardings move them).
    """
    check_tp_divisibility(config, mesh)
    base = make_generate_fn(config, max_seq, max_new)
    # The jitted base exposes the raw python callable via __wrapped__.
    fn = base.__wrapped__ if hasattr(base, "__wrapped__") else base

    param_shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), decoder_param_specs(config)
    )
    batch = NamedSharding(mesh, P("data", None))
    vec = NamedSharding(mesh, P("data"))
    scalar = NamedSharding(mesh, P())
    return jax.jit(
        fn,
        in_shardings=(
            param_shardings,  # params
            batch,            # prompt_ids [B, P]
            vec,              # prompt_len [B]
            scalar,           # seed
            scalar,            # temperature
            scalar,            # top_p
            scalar,            # eos_ids (scalar or [E]; P() replicates any rank)
        ),
        out_shardings=batch,  # tokens [B, max_new]
    )
