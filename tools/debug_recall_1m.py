"""Diagnose the residual 1M recall misses vs the CPU oracle.

Rebuilds bench.py's exact scale3 corpus (seed 42), runs the same 64
oracle queries through the TPU engine and the FastOracle, then for
every query whose top-8 sets differ dumps a per-row decomposition:
f32/f16/bf16 dense sims, BM25 scores, branch ranks on both sides, and
fused scores — enough to classify each miss as an exact tie, an f16
rescore-precision flip, a pool-boundary artifact, or an MMR order
divergence.

Usage (real TPU): python tools/debug_recall_1m.py [--chunks 1000000]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402  (the bench module IS the ground truth)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=64)
    args = ap.parse_args()

    from classmate_rag_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()

    rng = np.random.default_rng(42)
    print(f"building corpus n={args.chunks} ...", flush=True)
    docs, emb = bench.build_corpus(rng, args.chunks)
    queries = bench.make_queries(rng, docs, emb)

    import tempfile

    from classmate_rag_tpu.index.store import IndexStore

    tmp = Path(tempfile.mkdtemp(prefix="dbg_idx_"))
    import os

    # Honor the SAME engine knobs bench.run_scale honors: debugging a
    # knob sweep with a defaults-built store would diagnose a different
    # engine than the bench measured.
    store = IndexStore(
        bench.DIM, tmp, slab_rows=4096, terms_per_chunk=128,
        rescore=os.getenv("DENSE_RESCORE", "auto"),
        rescore_pool=int(os.getenv("DENSE_RESCORE_POOL", "32")),
        select=os.getenv("DENSE_SELECT", "auto"),
    )
    ids = [f"c{i}" for i in range(args.chunks)]
    for s in range(0, args.chunks, 8192):
        e = min(s + 8192, args.chunks)
        store.upsert(ids[s:e], emb[s:e], docs[s:e], [{} for _ in range(s, e)])
    print("store built; querying engine ...", flush=True)

    K, B = bench.K, bench.TPU_BATCH
    engine_rows = []
    for s in range(0, args.queries, B):
        sl = queries[s : s + B]
        out = store.hybrid_topk_batch(
            np.stack([q for (q, _t) in sl]), [t for (_q, t) in sl], None,
            k_vector=K, k_bm25=K, top_k=K, pool=bench.POOL,
        )
        engine_rows.append(np.asarray(out.rows)[: len(sl)])
    engine_rows = np.concatenate(engine_rows, axis=0)

    print("oracle ...", flush=True)
    bm25 = bench.FastOracleBM25(docs)
    emb_f16 = emb.astype(np.float16)
    emb_bf = None  # computed lazily per row (ml_dtypes)

    import ml_dtypes

    n_miss = 0
    for qi in range(args.queries):
        qv, terms = queries[qi]
        want = bench.oracle_query(qv, terms, emb, bm25)
        got = [int(r) for r in engine_rows[qi] if r >= 0]
        if set(got) == set(want):
            continue
        n_miss += 1
        sims = emb @ qv
        sims16 = emb_f16.astype(np.float32) @ qv
        bs = bm25.get_scores(terms)
        only_e = [r for r in got if r not in want]
        only_o = [r for r in want if r not in got]
        print(f"\n=== query {qi}: engine-only {only_e}, oracle-only {only_o}")
        print(f"engine top8: {got}")
        print(f"oracle top8: {want}")

        # oracle branch details
        pool_idx = np.argpartition(-sims, bench.POOL)[: bench.POOL]
        pool_idx = pool_idx[np.argsort(-sims[pool_idx], kind="stable")]
        order = bench.oracle_mmr(qv, emb[pool_idx], K)
        vec_ids = [int(pool_idx[i]) for i in order]
        bm_ids = np.argsort(-bs, kind="stable")[:K].tolist()
        print(f"oracle vec branch (MMR order): {vec_ids}")
        print(f"oracle bm25 branch: {bm_ids}")

        for r in sorted(set(only_e + only_o)):
            v32 = float(sims[r])
            v16 = float(sims16[r])
            vbf = float(
                np.asarray([emb[r]], dtype=ml_dtypes.bfloat16)
                .astype(np.float32)[0] @ qv
            )
            in_pool = bool(r in set(int(x) for x in pool_idx))
            vr = vec_ids.index(r) if r in vec_ids else -1
            br = bm_ids.index(r) if r in bm_ids else -1
            print(
                f"row {r}: sim f32={v32:.8f} f16={v16:.8f} bf16={vbf:.8f} "
                f"bm25={float(bs[r]):.6f} oracle_pool={in_pool} "
                f"oracle_vec_rank={vr} oracle_bm_rank={br}"
            )
        # rank-boundary context: the oracle pool boundary sims
        psims = sims[pool_idx]
        print(
            "oracle pool tail sims (ranks 20-26):",
            np.sort(sims)[::-1][20:27].round(8).tolist(),
        )
        print("bm25 top-10 scores:", np.sort(bs)[::-1][:10].round(6).tolist())
    print(f"\n{n_miss}/{args.queries} queries differ")
    print(json.dumps({"n_miss": n_miss}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
