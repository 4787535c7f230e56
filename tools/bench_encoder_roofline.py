"""Encoder MFU roofline: where does the non-MXU time go?

Round-2 measured the E5 encode step at MFU 0.43-0.44 and the batch sweep
showed it shape-bound (64->128 rows: 0.408->0.411). This tool explains
the number instead of asserting it: the step decomposes into component
probes — projection/FFN matmuls, the attention core (scores + softmax +
context), layernorms, embedding+pooling — each timed with the chained-
scan discipline (carry feeds the next iteration; one host fetch closes
the timing; per-step outputs reduce to a scalar so nothing materializes
or hoists).

Prints one JSON object with per-component ms, achieved TFLOP/s, and the
implied MFU ceiling were the non-matmul components free.

Usage (real TPU):  python tools/bench_encoder_roofline.py [--batch 64]
  [--seq 256] [--iters 32] [--config base]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from classmate_rag_tpu.embeddings.model import (
    EncoderConfig, embed_tokens, encode_from_embeddings, encoder_flops,
    init_params,
)

# v5e bf16 peak (per chip).
PEAK_TFLOPS = float(__import__("os").getenv("TPU_PEAK_TFLOPS", "197"))


def timed(fn, args, iters: int) -> float:
    """Seconds per iteration via a chained scan around ``fn``.

    ``fn(carry_scalar, *args) -> scalar`` must fold the carry into its
    inputs and reduce its output — the chain serializes iterations and
    the single scalar fetch syncs honestly through the remote link."""

    @jax.jit
    def probe(*a):
        def body(carry, _):
            return fn(carry, *a), None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    # Warmup is a VALUE fetch, not block_until_ready: through the remote
    # relay block_until_ready acks before the async remote COMPILE
    # finishes, silently rolling minutes of compilation into the "timed"
    # call (measured: 13-25 s/iter phantoms).
    float(probe(*args))
    t0 = time.perf_counter()
    float(probe(*args))
    return (time.perf_counter() - t0) / iters


def main() -> int:
    from classmate_rag_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--config", choices=["base", "large", "small_test"],
                    default="base")
    ap.add_argument("--fused", choices=["on", "off"], default="on",
                    help="Pallas-fused epilogues (bias+GELU, "
                         "residual+bias+LN) in the encode step")
    args = ap.parse_args()

    import dataclasses

    config = getattr(EncoderConfig, args.config)()
    config = dataclasses.replace(config, fused_epilogue=args.fused == "on")
    params = init_params(config, "roofline")
    B, T, H = args.batch, args.seq, config.hidden
    L, heads, ff = config.layers, config.heads, config.intermediate
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, config.vocab_size, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    x = jnp.asarray(rng.standard_normal((B, T, H)), jnp.bfloat16)
    lw = params["layers"]

    # ---- transformer stack (the MXU path) -----------------------------
    # The vocabulary gather CANNOT be chained honestly: once the token
    # ids depend on the loop carry, XLA lowers the [B*T]-row gather from
    # the 250k-row table to a serial in-loop form measured at ~13 s/step
    # (800x the production dispatch) — so the stack is chained on
    # precomputed embeddings (carry perturbs one activation element) and
    # the gather is timed as its own chained probe below.
    x_emb = embed_tokens(params, ids, mask, config)

    def stack_fn(carry, params, x_emb, mask):
        x_step = x_emb.at[0, 0, 0].add(carry * 1e-12)
        out = encode_from_embeddings(params, x_step, mask, config=config)
        return jnp.sum(out[:, 0]).astype(jnp.float32)

    t_stack = timed(stack_fn, (params, x_emb, mask), args.iters)

    # ---- embedding gather + LN (chained on a one-element id change) ---
    def gather_fn(carry, params, ids, mask):
        ids_step = ids.at[0, 0].set(4 + (carry.astype(jnp.int32) & 3))
        out = embed_tokens(params, ids_step, mask, config=config)
        return jnp.sum(out[:, 0, 0]).astype(jnp.float32)

    t_gather = timed(gather_fn, (params, ids, mask),
                     max(args.iters // 4, 2))
    t_full = t_stack + t_gather

    # ---- projection + FFN matmuls for ALL layers ----------------------
    # The six per-layer matmuls (QKV, O, FFN in/out) at encode shapes,
    # scanned over the stacked layer weights exactly like the real body.
    def mm_fn(carry, x, lw):
        def layer(h, w):
            q = jnp.einsum("bth,hd->btd", h, w["q_w"].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            k = jnp.einsum("bth,hd->btd", h, w["k_w"].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            v = jnp.einsum("bth,hd->btd", h, w["v_w"].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            o = jnp.einsum("btd,dh->bth", (q + k + v).astype(jnp.bfloat16),
                           w["o_w"].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            f1 = jnp.einsum("bth,hf->btf", o.astype(jnp.bfloat16),
                            w["ff_in_w"].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            f2 = jnp.einsum("btf,fh->bth", f1.astype(jnp.bfloat16),
                            w["ff_out_w"].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            return f2.astype(jnp.bfloat16)

        h = x + carry.astype(jnp.bfloat16)
        out, _ = jax.lax.scan(
            lambda hh, w: (layer(hh, w), None), h,
            {k: lw[k] for k in
             ("q_w", "k_w", "v_w", "o_w", "ff_in_w", "ff_out_w")},
        )
        return jnp.sum(out[:, 0].astype(jnp.float32)), None

    def mm_flat(carry, x, lw):
        return mm_fn(carry, x, lw)[0]

    t_mm = timed(mm_flat, (x, lw), args.iters)

    # ---- attention core (scores + softmax + context), all layers ------
    hd = H // heads

    def attn_flat(carry, x):
        q = (x + carry.astype(jnp.bfloat16)).reshape(B, T, heads, hd)

        def one(_c, _):
            s = jnp.einsum("bthd,bshd->bhts", q, q,
                           preferred_element_type=jnp.float32) / np.sqrt(hd)
            p = jax.nn.softmax(s, axis=-1)
            ctx = jnp.einsum("bhts,bshd->bthd", p.astype(jnp.bfloat16), q,
                             preferred_element_type=jnp.float32)
            return _c + jnp.sum(ctx[:, 0, 0]).astype(jnp.float32), None

        out, _ = jax.lax.scan(one, jnp.float32(0.0), None, length=L)
        return out

    t_attn = timed(attn_flat, (x,), args.iters)

    # ---- layernorms (2 per layer + embed LN) over activations ---------
    def ln_flat(carry, x):
        g = jnp.ones(H, jnp.float32)
        b = jnp.zeros(H, jnp.float32)

        def one(h, _):
            hf = h.astype(jnp.float32) + carry * 1e-20
            m = jnp.mean(hf, axis=-1, keepdims=True)
            v = jnp.var(hf, axis=-1, keepdims=True)
            out = (hf - m) * jax.lax.rsqrt(v + 1e-5) * g + b
            return out.astype(jnp.bfloat16), None

        out, _ = jax.lax.scan(one, x, None, length=2 * L + 1)
        return jnp.sum(out[:, 0].astype(jnp.float32))

    t_ln = timed(ln_flat, (x,), args.iters)

    flops = encoder_flops(config, B, T)
    mm_flops = L * (4 * 2 * B * T * H * H + 2 * 2 * B * T * H * ff)
    attn_flops = L * 2 * 2 * B * T * T * H

    def tf(t, f):
        return f / t / 1e12 if t > 0 else 0.0

    result = {
        "config": args.config, "batch": B, "seq": T, "iters": args.iters,
        "fused_epilogue": args.fused == "on",
        "backend": jax.default_backend(),
        "full_step_ms": round(t_full * 1e3, 3),
        "mfu": round(flops / t_full / (PEAK_TFLOPS * 1e12), 4),
        "components_ms": {
            "transformer_stack": round(t_stack * 1e3, 3),
            "embed_gather_ln": round(t_gather * 1e3, 3),
            "proj_ffn_matmuls": round(t_mm * 1e3, 3),
            "attention_core": round(t_attn * 1e3, 3),
            "layernorms": round(t_ln * 1e3, 3),
            "stack_residual_other": round(
                max(t_stack - t_mm - t_attn - t_ln, 0.0) * 1e3, 3
            ),
        },
        "achieved_tflops": {
            "full": round(tf(t_full, flops), 2),
            "proj_ffn": round(tf(t_mm, mm_flops), 2),
            "attention": round(tf(t_attn, attn_flops), 2),
        },
        "mfu_if_only_matmuls": round(
            flops / (t_mm + t_attn) / (PEAK_TFLOPS * 1e12), 4
        ),
        "peak_tflops_assumed": PEAK_TFLOPS,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
