"""Stage-level timing of the fused hybrid query step (real TPU).

Times each compute stage of hybrid_query_step_split in isolation with the
honest chained-scan recipe (carry-perturbed q_vecs inside ONE jit so the
relay cannot fake timings and XLA cannot hoist the work), at the corpus
scale given by BENCH_CHUNKS. Used to target the 200k-chunk optimization:
run at 50000 and 200000 and diff the stage times.

Usage: BENCH_CHUNKS=200000 python tools/bench_hybrid_profile.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ITERS = int(os.getenv("PROFILE_ITERS", "8"))
BATCH = int(os.getenv("BENCH_BATCH", "256"))


def timed(name, make_body, q_vecs, arrays):
    """Time make_body(qv, arrays, carry_eps)->scalar via a carry-chained
    scan. The body must fold ``carry_eps`` (a scalar derived from the
    carry) into EVERY input that feeds its compute — otherwise XLA hoists
    the loop-invariant work out of the scan and the stage times ~ITERS x
    optimistic (the CLAUDE.md timing pitfall; bit us once already)."""
    import jax
    import jax.numpy as jnp

    def run(qv, arrs):
        def step(carry, _):
            eps = carry[0, 0] * 1e-12
            out = make_body(carry, arrs, eps)
            pert = (out.astype(jnp.float32) * 1e-12).astype(carry.dtype)
            return carry + pert, None

        final, _ = jax.lax.scan(step, qv, None, length=ITERS)
        return final

    jitted = jax.jit(run)
    out = jitted(q_vecs, arrays)
    np.asarray(out)  # warmup + compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(jitted(q_vecs, arrays))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name:28s} {best*1e3:8.2f} ms/batch")
    return best


def main():
    from bench import N_CHUNKS, DIM, build_corpus, make_queries
    from classmate_rag_tpu.index.store import IndexStore
    from classmate_rag_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from classmate_rag_tpu.index.lexical import (
        bm25_split_score_core, device_fns, okapi_idf,
    )
    from classmate_rag_tpu.ops.hybrid_step import (
        _dense_branch, hybrid_query_step_split,
    )
    from classmate_rag_tpu.ops.mmr import mmr_order

    rng = np.random.default_rng(42)
    print(f"corpus: {N_CHUNKS} chunks, building…", flush=True)
    docs, emb = build_corpus(rng)
    queries = make_queries(rng, docs, emb)[:BATCH]

    tmp = Path(tempfile.mkdtemp(prefix="prof_idx_"))
    store = IndexStore(
        DIM, tmp, slab_rows=4096, terms_per_chunk=128,
        rescore=os.getenv("DENSE_RESCORE", "auto"),
        rescore_pool=int(os.getenv("DENSE_RESCORE_POOL", "32")),
        select=os.getenv("DENSE_SELECT", "auto"),
    )
    ids = [f"c{i}" for i in range(N_CHUNKS)]
    for s in range(0, N_CHUNKS, 8192):
        e = min(s + 8192, N_CHUNKS)
        store.upsert(ids[s:e], emb[s:e], docs[s:e], [{} for _ in range(s, e)])

    dev = store._sync_device()
    split = store._sync_split()
    bias = store._mask_bias(None)
    vpad = store.vocab_pad
    subset_df, _ = device_fns()
    df = subset_df(dev["term_ids"], dev["tfs"], jnp.asarray(store.valid), vpad)

    from classmate_rag_tpu.index.lexical import pack_query_terms

    q_vecs = jnp.asarray(np.stack([q for q, _ in queries]), jnp.float32)
    q_terms, q_counts = pack_query_terms(
        store.vocab, [terms for _q, terms in queries], 32
    )
    qa = store._split_query_arrays(q_terms, q_counts)
    has_terms = np.any(q_terms >= 0, axis=1, keepdims=True)
    r_cap = split["r_cap"]
    H = len(qa["h_slots"])
    U = len(qa["u_tids"])
    T = len(qa["t_tids"])
    n_tail_real = int((qa["u_lens"] > 0).sum())
    n_head_real = int((qa["h_slots"] >= 0).sum())
    print(f"vpad={vpad} r_cap={r_cap} H={H} (real {n_head_real}) "
          f"U={U} (real {n_tail_real}) T={T} "
          f"head_rows={split['tf_head'].shape}")

    A = {
        "emb": dev["emb"], "bias": bias, "doc_len": dev["doc_len"],
        "df": df, "tf_head": split["tf_head"],
        "post_rows": split["post_rows"], "post_tfs": split["post_tfs"],
        "h_slots": jnp.asarray(qa["h_slots"]),
        "h_tids": jnp.asarray(qa["h_tids"]),
        "u_starts": jnp.asarray(qa["u_starts"]),
        "u_lens": jnp.asarray(qa["u_lens"]),
        "u_tids": jnp.asarray(qa["u_tids"]),
        "u_cols": jnp.asarray(qa["u_cols"]),
        "t_tids": jnp.asarray(qa["t_tids"]),
        "has_terms": jnp.asarray(has_terms),
        "q_terms": jnp.asarray(q_terms),
        "q_counts": jnp.asarray(q_counts),
    }

    def _vary(a, eps):
        """Fold a data-dependent ZERO into every query-side input so the
        BM25 compute stays inside the timing loop (values unchanged)."""
        zero_i = (eps > 1.0).astype(jnp.int32)
        return dict(
            a,
            h_slots=a["h_slots"] + zero_i,
            u_starts=a["u_starts"] + zero_i,
            q_terms=a["q_terms"] + zero_i,
            q_counts=a["q_counts"] + eps,
        )

    def dense_mm(qv, a, eps):
        s = jnp.einsum("qd,nd->qn", qv.astype(a["emb"].dtype), a["emb"],
                       preferred_element_type=jnp.float32) + a["bias"][None, :]
        return s.sum()

    def dense_topk(qv, a, eps):
        s = jnp.einsum("qd,nd->qn", qv.astype(a["emb"].dtype), a["emb"],
                       preferred_element_type=jnp.float32) + a["bias"][None, :]
        v, i = jax.lax.top_k(s, 24)
        return v.sum() + i.sum().astype(jnp.float32)

    def dense_full(qv, a, eps):
        rows, dist = _dense_branch(
            a["emb"], a["bias"], qv, k_vector=8, pool=24, use_mmr=True,
            mmr_lambda=0.5,
        )
        return rows.sum().astype(jnp.float32) + jnp.where(
            jnp.isfinite(dist), dist, 0.0).sum()

    def _stats(a):
        keep = a["bias"] == 0.0
        n_sub = jnp.maximum(jnp.sum(keep.astype(jnp.float32)), 1.0)
        idf = okapi_idf(a["df"], n_sub)
        avgdl = jnp.sum(jnp.where(keep, a["doc_len"], 0.0)) / n_sub
        return keep, idf, avgdl

    def bm25_core(qv, a, eps, head=True, tail=True):
        av = _vary(a, eps)
        keep, idf, avgdl = _stats(av)
        h_slots = av["h_slots"] if head else jnp.full_like(av["h_slots"], -1)
        u_lens = av["u_lens"] if tail else jnp.zeros_like(av["u_lens"])
        s = bm25_split_score_core(
            av["tf_head"], av["post_rows"], av["post_tfs"], av["doc_len"],
            keep, idf, avgdl, h_slots, av["h_tids"],
            av["u_starts"], u_lens, av["u_cols"], av["t_tids"],
            av["q_terms"], av["q_counts"], vocab_pad=vpad, r_cap=r_cap,
        )
        return s.sum()

    def bm25_topk(qv, a, eps):
        av = _vary(a, eps)
        keep, idf, avgdl = _stats(av)
        s = bm25_split_score_core(
            av["tf_head"], av["post_rows"], av["post_tfs"], av["doc_len"],
            keep, idf, avgdl, av["h_slots"], av["h_tids"],
            av["u_starts"], av["u_lens"], av["u_cols"], av["t_tids"],
            av["q_terms"], av["q_counts"], vocab_pad=vpad, r_cap=r_cap,
        )
        v, i = jax.lax.top_k(s + av["bias"][None, :], 8)
        return v.sum() + i.sum().astype(jnp.float32)

    def full_step(qv, a, eps):
        av = _vary(a, eps)
        out = hybrid_query_step_split(
            av["emb"], av["tf_head"], av["post_rows"], av["post_tfs"],
            av["doc_len"], av["df"], av["bias"], qv,
            av["h_slots"], av["h_tids"],
            av["u_starts"], av["u_lens"], av["u_cols"], av["t_tids"],
            av["q_terms"], av["q_counts"], av["has_terms"],
            k_vector=8, k_bm25=8, top_k=8, pool=24, vocab_pad=vpad,
            r_cap=r_cap,
        )
        return (out.rows.sum().astype(jnp.float32)
                + jnp.where(jnp.isfinite(out.fused), out.fused, 0.0).sum())

    timed("dense matmul", dense_mm, q_vecs, A)
    timed("dense matmul+topk", dense_topk, q_vecs, A)
    timed("dense full (+MMR)", dense_full, q_vecs, A)
    timed("bm25 head only",
          lambda qv, a, e: bm25_core(qv, a, e, True, False), q_vecs, A)
    timed("bm25 tail only",
          lambda qv, a, e: bm25_core(qv, a, e, False, True), q_vecs, A)
    timed("bm25 head+tail",
          lambda qv, a, e: bm25_core(qv, a, e, True, True), q_vecs, A)
    timed("bm25 +topk", bm25_topk, q_vecs, A)
    timed("FULL fused step", full_step, q_vecs, A)

    # ---- round-3 approx/fast stages (need the f16 rescore slab) --------
    if dev.get("emb16") is None:
        print("(rescore slab off at this scale — approx stages skipped)")
        return
    A["emb16"] = dev["emb16"]
    A["term_ids"] = dev["term_ids"]
    A["tfs"] = dev["tfs"]
    rp = min(store.rescore_pool, store.capacity)

    def dense_approx_sel(qv, a, eps):
        s = jnp.einsum("qd,nd->qn", qv.astype(a["emb"].dtype), a["emb"],
                       preferred_element_type=jnp.float32) + a["bias"][None, :]
        v, i = jax.lax.approx_max_k(s, rp, recall_target=0.999)
        return v.sum() + i.sum().astype(jnp.float32)

    def dense_full_approx(qv, a, eps):
        rows, dist = _dense_branch(
            a["emb"], a["bias"], qv, k_vector=8, pool=24, use_mmr=True,
            mmr_lambda=0.5, emb16=a["emb16"], rescore_pool=rp,
            select="approx",
        )
        return rows.sum().astype(jnp.float32) + jnp.where(
            jnp.isfinite(dist), dist, 0.0).sum()

    def bm25_fast(qv, a, eps):
        av = _vary(a, eps)
        keep, idf, avgdl = _stats(av)
        s = bm25_split_score_core(
            av["tf_head"], av["post_rows"], av["post_tfs"], av["doc_len"],
            keep, idf, avgdl, av["h_slots"], av["h_tids"],
            av["u_starts"], av["u_lens"], av["u_cols"], av["t_tids"],
            av["q_terms"], av["q_counts"], vocab_pad=vpad, r_cap=r_cap,
            fast=True,
        )
        v, i = jax.lax.approx_max_k(
            s + av["bias"][None, :], 64, recall_target=0.999
        )
        from classmate_rag_tpu.ops.hybrid_step import bm25_rescore_pool

        exact = bm25_rescore_pool(
            i, a["term_ids"], a["tfs"], av["doc_len"], avgdl, idf,
            av["q_terms"], av["q_counts"], vpad,
        )
        return exact.sum() + v.sum()

    def full_step_approx(qv, a, eps):
        av = _vary(a, eps)
        out = hybrid_query_step_split(
            av["emb"], av["tf_head"], av["post_rows"], av["post_tfs"],
            av["doc_len"], av["df"], av["bias"], qv,
            av["h_slots"], av["h_tids"],
            av["u_starts"], av["u_lens"], av["u_cols"], av["t_tids"],
            av["q_terms"], av["q_counts"], av["has_terms"],
            a["emb16"], a["term_ids"], a["tfs"],
            k_vector=8, k_bm25=8, top_k=8, pool=24, vocab_pad=vpad,
            r_cap=r_cap, rescore_pool=rp, select="approx",
        )
        return (out.rows.sum().astype(jnp.float32)
                + jnp.where(jnp.isfinite(out.fused), out.fused, 0.0).sum())

    timed("dense approx select", dense_approx_sel, q_vecs, A)
    timed("dense full approx+rescore", dense_full_approx, q_vecs, A)
    timed("bm25 FAST (+exact rescore)", bm25_fast, q_vecs, A)
    timed("FULL fused step (approx)", full_step_approx, q_vecs, A)


if __name__ == "__main__":
    main()
