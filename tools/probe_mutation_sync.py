"""Decompose the first post-mutation query cost at serving scale.

BENCH_r04 recorded ask_after_add_first_ms = 2661 at 1M; perf.md attributes
the residual (after the scatter-compile cache fix) to the donated [C, N]
head-matrix update plus the corpus-df recompute. This probe measures each
component separately on the real chip so the O(delta) redesign targets
the actual cost:

  1. incremental _sync_device (donated row scatters: emb/emb16/lex/meta)
  2. incremental _sync_split  (head column scatter + overlay writes)
  3. subset_df full recompute ([N, L] scatter-add histogram)
  4. _nofilter_bias recompute
  5. end-to-end first ask (hybrid_topk_batch B=1) after a 1-row upsert

Usage: python tools/probe_mutation_sync.py [--rows 1000000] [--width 192]
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
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=192)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_corpus
    from classmate_rag_tpu.index.lexical import device_fns
    from classmate_rag_tpu.index.store import IndexStore

    n = args.rows
    rng = np.random.default_rng(42)
    t0 = time.perf_counter()
    docs, emb = build_corpus(rng, n)
    print(f"corpus built in {time.perf_counter() - t0:.1f}s", flush=True)

    store = IndexStore(768, "/tmp/probe_idx", slab_rows=4096,
                       terms_per_chunk=args.width)
    ids = [f"c{i}" for i in range(n)]
    t0 = time.perf_counter()
    for s in range(0, n, 8192):
        e = min(s + 8192, n)
        store.upsert(ids[s:e], emb[s:e], docs[s:e],
                     [{} for _ in range(s, e)])
    print(f"indexed in {time.perf_counter() - t0:.1f}s", flush=True)

    qv = emb[:1] + 0.01
    qv = (qv / np.linalg.norm(qv)).astype(np.float32)
    qterms = [docs[0][:5]]

    def ask():
        out = store.hybrid_topk_batch(qv, qterms, None, top_k=8)
        return np.asarray(out.rows)

    t0 = time.perf_counter()
    ask()
    print(f"warm ask #1 (compile) {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    ask()
    steady = time.perf_counter() - t0
    print(f"steady ask {steady * 1e3:.1f}ms", flush=True)

    report = {"rows": n, "steady_ask_ms": round(steady * 1e3, 1)}

    # --- component probes around a 1-row mutation ---------------------
    def mutate(i):
        store.upsert([ids[i]], emb[i : i + 1] * -1.0,
                     [docs[i][:30] + ["zznew", "zzterm"]], [{}])

    # First mutation: includes any scatter-fn compiles (cache-warm rigs
    # skip them); measure it separately from the second.
    for trial in range(3):
        mutate(trial + 5)
        t0 = time.perf_counter()
        with store._sync_lock:
            store._sync_device_locked()
        jax.block_until_ready(store._device["emb"])
        t_dev = time.perf_counter() - t0

        t0 = time.perf_counter()
        store._sync_split()
        jax.block_until_ready(store._split["tf_head"])
        t_split = time.perf_counter() - t0

        # df refresh cost on the next query: with the host-maintained df
        # this is a KB upload; legacy code re-histogrammed [N, L] on
        # device (~1.1 s at 1M).
        t0 = time.perf_counter()
        if hasattr(store, "_df_device"):
            df = store._df_device(store.vocab_pad)
        else:
            subset_df, _ = device_fns()
            dev = store._device
            df = subset_df(dev["term_ids"], dev["tfs"],
                           jnp.asarray(store.valid), store.vocab_pad)
        df.block_until_ready()
        t_df = time.perf_counter() - t0

        t0 = time.perf_counter()
        store._nofilter_bias = None
        b = store._mask_bias(None)
        b.block_until_ready()
        t_bias = time.perf_counter() - t0

        t0 = time.perf_counter()
        ask()
        t_ask = time.perf_counter() - t0
        row = {
            "trial": trial,
            "sync_device_ms": round(t_dev * 1e3, 1),
            "sync_split_ms": round(t_split * 1e3, 1),
            "df_recompute_ms": round(t_df * 1e3, 1),
            "bias_recompute_ms": round(t_bias * 1e3, 1),
            "ask_after_ms": round(t_ask * 1e3, 1),
        }
        print(json.dumps(row), flush=True)
        report[f"trial{trial}"] = row

    # Raw [C, N] column-scatter probe at the real head shape.
    C = store._split["tf_head"].shape[0]
    print(f"tf_head shape {store._split['tf_head'].shape}", flush=True)
    from classmate_rag_tpu.index.store import _device_col_set

    vals = np.zeros((C, 1), np.uint8)
    t0 = time.perf_counter()
    store._split["tf_head"] = _device_col_set(
        store._split["tf_head"], [7], vals
    )
    jax.block_until_ready(store._split["tf_head"])
    print(f"col_set [C={C}, N] 1 col: "
          f"{(time.perf_counter() - t0) * 1e3:.1f}ms", flush=True)
    t0 = time.perf_counter()
    store._split["tf_head"] = _device_col_set(
        store._split["tf_head"], [9], vals
    )
    jax.block_until_ready(store._split["tf_head"])
    print(f"col_set again: {(time.perf_counter() - t0) * 1e3:.1f}ms",
          flush=True)

    print("REPORT " + json.dumps(report), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
