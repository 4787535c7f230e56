"""Separate trace / compile(cache) / first-execute for the fused step.

Run against a persisted 1M index (same env as probe_cold_start). Answers
WHERE the ~130 s first-ask cost lives when uploads are pre-done and the
persistent compilation cache holds the executable.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    from classmate_rag_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from classmate_rag_tpu.pipeline.runtime import get_runtime

    t0 = time.perf_counter()
    rt = get_runtime(reload=True)
    store = rt.store
    print(f"load {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    with store._sync_lock:
        d = store._sync_device_locked()
    jax.block_until_ready(d["emb"])
    s = store._sync_split()
    jax.block_until_ready(s["tf_head"])
    df = store._df_device(store.vocab_pad)
    bias = store._mask_bias(None)
    jax.block_until_ready(bias)
    print(f"all uploads {time.perf_counter() - t0:.1f}s", flush=True)

    # Trivial big-operand jit: is FIRST dispatch of a big program slow
    # regardless of caching?
    qv = np.zeros((1, store.dim), np.float32)
    f = jax.jit(lambda a, v: (a.astype(jnp.float32) @ v.T).sum())
    t0 = time.perf_counter()
    low = f.lower(d["emb"], jnp.asarray(qv))
    print(f"trivial lower {time.perf_counter() - t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    comp = low.compile()
    print(f"trivial compile {time.perf_counter() - t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    float(comp(d["emb"], jnp.asarray(qv)))
    print(f"trivial first call {time.perf_counter() - t0:.2f}s", flush=True)

    # The real fused step, staged.
    from classmate_rag_tpu.index.lexical import pack_query_terms
    from classmate_rag_tpu.ops.hybrid_step import (
        hybrid_query_step_split_packed, pack_query_arrays,
    )

    q_terms, q_counts = pack_query_terms(
        store.vocab, [["w3", "w17", "w200", "w1100"]], 32
    )
    qa = store._split_query_arrays(q_terms, q_counts)
    has_terms = np.any(q_terms >= 0, axis=1, keepdims=True)
    packed, statics = pack_query_arrays(qa, q_terms, q_counts, has_terms)
    kw = dict(
        **statics,
        k_vector=8, k_bm25=8, top_k=8, pool=24,
        vocab_pad=store.vocab_pad, r_cap=s["r_cap"],
        use_mmr=True, mmr_lambda=0.5, rrf_k=60,
        weight_vector=1.0, weight_bm25=1.0,
        rescore_pool=32, select=store.select_mode,
    )
    args = (
        d["emb"], s["tf_head"], s["post_rows"], s["post_tfs"],
        d["doc_len"], df, bias, jnp.asarray(qv, jnp.float32),
        jnp.asarray(packed), d["emb16"], d["term_ids"], d["tfs"],
    )
    t0 = time.perf_counter()
    low = hybrid_query_step_split_packed.lower(*args, **kw)
    print(f"step lower(trace) {time.perf_counter() - t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    comp = low.compile()
    print(f"step compile/cache-load {time.perf_counter() - t0:.2f}s",
          flush=True)
    t0 = time.perf_counter()
    out = comp(*args)
    np.asarray(out.rows)
    print(f"step first call {time.perf_counter() - t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    out = comp(*args)
    np.asarray(out.rows)
    print(f"step second call {time.perf_counter() - t0:.2f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
