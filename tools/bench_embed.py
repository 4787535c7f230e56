"""E5 encoder throughput: chunks/sec + MFU on the current device.

BASELINE target: "e5-base embed throughput at MFU-bound rates". Runs the
full JAX encoder forward (base config unless --large) over synthetic
batches at a fixed token shape and reports chunks/sec, model FLOP/s, and
MFU against the chip peak. Weights are deterministic random when no local
snapshot exists — identical compute shape to the real model.

Usage: python tools/bench_embed.py [--batch 64] [--seq 256] [--iters 16]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--large", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="small_test config (CPU smoke)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from classmate_rag_tpu.embeddings.model import (
        EncoderConfig, encode, encoder_flops, init_params,
    )
    from classmate_rag_tpu.utils.profiling import Throughput

    if args.tiny:
        config = EncoderConfig.small_test()
    else:
        config = EncoderConfig.large() if args.large else EncoderConfig.base()
    params = init_params(config, "bench-embed")
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(4, config.vocab_size, (args.batch, args.seq)), jnp.int32
    )
    mask = jnp.ones((args.batch, args.seq), jnp.int32)

    from functools import partial

    fwd = jax.jit(partial(encode, config=config))

    # On-device loop: each step's input depends on the previous output so
    # XLA cannot hoist the (otherwise loop-invariant) forward out of the
    # scan, and the remote-dispatch link cannot fake the timing.
    @jax.jit
    def loop(params, ids, mask):
        def step(carry, _):
            ids_step = ids.at[0, 0].set(
                4 + (carry.astype(jnp.int32) & 3)
            )
            out = encode(params, ids_step, mask, config)
            # Row-SUM, not out[0, 0]: a carry fed from one element lets
            # XLA narrow/elide the other B-1 rows' compute (CLAUDE.md —
            # 'force full compute with a row-sum, not a column slice'),
            # silently measuring a smaller batch than reported.
            return jnp.sum(out[:, 0]) * 1e6, ()
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=args.iters)
        return acc

    np.asarray(fwd(params, ids, mask))   # compile single
    np.asarray(loop(params, ids, mask))  # compile loop
    t0 = time.perf_counter()
    np.asarray(loop(params, ids, mask))
    dt = (time.perf_counter() - t0) / args.iters

    flops = encoder_flops(config, args.batch, args.seq)
    report = Throughput(seconds=dt, flops=flops).report()
    print(json.dumps({
        "model": "e5-large" if args.large else "e5-base",
        "batch": args.batch,
        "seq": args.seq,
        "ms_per_batch": round(dt * 1e3, 2),
        "chunks_per_sec": round(args.batch / dt, 1),
        "tokens_per_sec": round(args.batch * args.seq / dt, 0),
        **report,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
