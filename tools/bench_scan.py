"""Dense-scan implementation shootout on the real TPU.

Times, with the honest chained-scan recipe, the three dense top-k
implementations at BENCH_CHUNKS scale:

  - XLA bf16 matmul + lax.top_k        (the default path)
  - int8 scan + bf16 rescore           (ops/quant.py, XLA)
  - Pallas fused bf16 scan-topk        (ops/topk.py)

and a raw-matmul byte-rate reference for each dtype. This is the
measurement behind the ops/topk.py dispatch decision and the VERDICT
item-10 record: whether int8's halved scan bytes are realizable on this
rig, and where the Pallas kernel stands.

Usage: BENCH_CHUNKS=200000 python tools/bench_scan.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = int(os.getenv("BENCH_CHUNKS", "200000"))
D = 768
Q = int(os.getenv("BENCH_BATCH", "256"))
K = 24
ITERS = 8


def timed(name, fn, q0, arrays, bytes_per_iter=None):
    import jax
    import jax.numpy as jnp

    def run(qv, arrs):
        def step(carry, _):
            out = fn(carry, arrs)
            pert = (out.astype(jnp.float32) * 1e-12).astype(carry.dtype)
            return carry + pert, None

        final, _ = jax.lax.scan(step, qv, None, length=ITERS)
        return final

    jitted = jax.jit(run)
    np.asarray(jitted(q0, arrays))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jitted(q0, arrays))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    rate = f"  {bytes_per_iter / best / 1e9:6.0f} GB/s" if bytes_per_iter else ""
    print(f"{name:34s} {best*1e3:8.2f} ms/batch{rate}")
    return best


def main():
    from classmate_rag_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from classmate_rag_tpu.ops.quant import quantize_rows, topk_int8_rescore
    from classmate_rag_tpu.ops.topk import topk_pallas, topk_xla

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((N, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb_i8, scales = quantize_rows(emb)
    q0 = jnp.asarray(emb[:Q] + 0.01, jnp.float32)

    A = {
        "bf16": jnp.asarray(emb, jnp.bfloat16),
        "i8": jnp.asarray(emb_i8),
        "scales": jnp.asarray(scales),
        "bias": jnp.zeros(N, jnp.float32),
    }
    print(f"N={N} D={D} Q={Q} K={K}  "
          f"(bf16 matrix {N*D*2/1e6:.0f} MB, int8 {N*D/1e6:.0f} MB)")

    def mm_bf16(qv, a):
        s = jnp.einsum("qd,nd->qn", qv.astype(jnp.bfloat16), a["bf16"],
                       preferred_element_type=jnp.float32)
        return s.sum()

    def mm_i8(qv, a):
        qa = jnp.max(jnp.abs(qv), axis=1, keepdims=True)
        qs = jnp.maximum(qa / 127.0, 1e-12)
        qi = jnp.clip(jnp.round(qv / qs), -127, 127).astype(jnp.int8)
        s = jax.lax.dot_general(
            qi, a["i8"], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return s.sum().astype(jnp.float32)

    def xla_topk(qv, a):
        v, i = topk_xla(a["bf16"], qv, a["bias"], K)
        return v.sum() + i.sum().astype(jnp.float32)

    def i8_rescore(qv, a):
        v, i = topk_int8_rescore(
            a["i8"], a["scales"], a["bf16"], qv, a["bias"], K,
            rescore_pool=4 * K,
        )
        return v.sum() + i.sum().astype(jnp.float32)

    def pallas_topk(qv, a):
        v, i = topk_pallas(a["bf16"], qv, a["bias"], K)
        return v.sum() + i.sum().astype(jnp.float32)

    t_mm = timed("raw matmul bf16", mm_bf16, q0, A, bytes_per_iter=N * D * 2)
    t_mm8 = timed("raw matmul int8", mm_i8, q0, A, bytes_per_iter=N * D)
    t_x = timed("topk_xla (bf16 + lax.top_k)", xla_topk, q0, A,
                bytes_per_iter=N * D * 2)
    t_8 = timed("topk_int8_rescore (XLA)", i8_rescore, q0, A,
                bytes_per_iter=N * D)
    t_p = timed("topk_pallas (bf16 fused)", pallas_topk, q0, A,
                bytes_per_iter=N * D * 2)
    print(f"\nint8/bf16 raw matmul speedup: {t_mm/t_mm8:.2f}x")
    print(f"int8+rescore vs xla top-k:    {t_x/t_8:.2f}x")
    print(f"pallas vs xla top-k:          {t_x/t_p:.2f}x")

    # recall check: int8+rescore top-K must match bf16 exact top-K
    v_x, i_x = topk_xla(A["bf16"], q0, A["bias"], K)
    v_8, i_8 = topk_int8_rescore(A["i8"], A["scales"], A["bf16"], q0,
                                 A["bias"], K, rescore_pool=4 * K)
    match = np.mean([
        len(set(np.asarray(i_x)[q]) & set(np.asarray(i_8)[q])) / K
        for q in range(Q)
    ])
    print(f"int8+rescore recall vs exact bf16 top-{K}: {match:.4f}")


if __name__ == "__main__":
    main()
