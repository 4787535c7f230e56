"""Decoder generation throughput: tokens/sec for the TPU decode loop.

Runs the jitted KV-cache generate loop (prefill + lax.scan decode) on the
configured decoder size with deterministic random weights — the compute
shape of real generation.

Usage: python tools/bench_decode.py [--batch 8] [--prompt 256] [--new 128]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    from classmate_rag_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=256)
    ap.add_argument("--new", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=768)
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 weight-only quantized decode")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from classmate_rag_tpu.models.decoder import (
        DecoderConfig, init_params, make_generate_fn,
        quantize_decoder_params,
    )

    config = DecoderConfig(
        hidden=args.hidden,
        heads=max(4, args.hidden // 64),
        kv_heads=max(2, args.hidden // 192),
        ffn=args.hidden * 3,
        layers=12,
        max_seq=args.prompt + args.new,
    )
    params = init_params(config, "bench-decode")
    if args.int8:
        params = quantize_decoder_params(params, config)
    param_bytes = sum(x.nbytes for x in jax.tree.leaves(params))
    gen = make_generate_fn(config, args.prompt + args.new, args.new)

    rng = np.random.default_rng(0)
    prompts = jnp.asarray(
        rng.integers(4, config.vocab_size, (args.batch, args.prompt)),
        jnp.int32,
    )
    plen = jnp.full((args.batch,), args.prompt, jnp.int32)

    np.asarray(gen(params, prompts, plen, 0, 0.0, 0.95, 2))  # compile
    t0 = time.perf_counter()
    np.asarray(gen(params, prompts, plen, 1, 0.0, 0.95, 2))
    dt = time.perf_counter() - t0

    new_tokens = args.batch * args.new
    print(json.dumps({
        "layers": config.layers,
        "hidden": config.hidden,
        "batch": args.batch,
        "prompt_len": args.prompt,
        "new_tokens": args.new,
        "int8": bool(args.int8),
        "param_bytes": param_bytes,
        "seconds": round(dt, 3),
        "decode_tokens_per_sec": round(new_tokens / dt, 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
