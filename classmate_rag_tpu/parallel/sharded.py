"""Shard-parallel hybrid retrieval over a device mesh.

The scale-out story the reference never had (its "vector store" was a local
Chroma server): corpus rows shard across chips, every chip scans only its
slice, and the tiny per-shard top-k results (values + global row ids +
candidate embeddings) allgather over ICI for a replicated merge. Corpus
capacity scales linearly with chips; per-query HBM traffic per chip drops
by the shard count.

SPMD construction: ``shard_map`` over a 1-D ("shard",) mesh;
- dense: local masked matmul top-pool → allgather [S·pool] → merge;
- BM25: local partial df scatter → ``psum`` (subset statistics are global)
  → local scoring → local top-k → allgather → merge;
- MMR + RRF run replicated on the merged candidates (they see only
  O(pool·S) items).

The merged results are bit-identical to the single-device path: merges
re-sort by (value, global row) with the same lowest-index tie-break.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from classmate_rag_tpu.index.lexical import (
    okapi_idf,
    okapi_query_weights,
    okapi_score_rows,
)
from classmate_rag_tpu.ops.mmr import mmr_order

NEG_INF = float(jnp.finfo(jnp.float32).min)


class ShardedHybridResult(NamedTuple):
    rows: jnp.ndarray
    fused: jnp.ndarray
    vec_dist: jnp.ndarray
    bm25_score: jnp.ndarray


def _merge_ranked(vals, idx, k):
    """Merge allgathered ranked lists [S, Q, k'] → global top-k with the
    lowest-index tie-break (matches single-device lax.top_k semantics).
    Emits exactly k columns: pads with (-inf, 2^30) when S·k' < k — the
    per-shard lists already cover every live row in that case."""
    s, q, kk = vals.shape
    flat_v = jnp.transpose(vals, (1, 0, 2)).reshape(q, s * kk)
    flat_i = jnp.transpose(idx, (1, 0, 2)).reshape(q, s * kk)
    if s * kk < k:
        pad = k - s * kk
        flat_v = jnp.pad(flat_v, ((0, 0), (0, pad)), constant_values=NEG_INF)
        flat_i = jnp.pad(flat_i, ((0, 0), (0, pad)), constant_values=2**30)
    # Sort by (value desc, index asc): lexsort with value primary.
    order = jnp.lexsort((flat_i, -flat_v))[:, :k]
    return (
        jnp.take_along_axis(flat_v, order, axis=1),
        jnp.take_along_axis(flat_i, order, axis=1),
    )


def make_sharded_hybrid_fn(
    mesh: Mesh,
    *,
    k_vector: int = 8,
    k_bm25: int = 8,
    top_k: int = 8,
    pool: int = 24,
    vocab_pad: int = 4096,
    use_mmr: bool = True,
    mmr_lambda: float = 0.5,
    rrf_k: int = 60,
    weight_vector: float = 1.0,
    weight_bm25: float = 1.0,
):
    """Build the jitted SPMD hybrid query step for ``mesh``.

    Array args (shapes; leading N must divide by the shard count):
      emb [N, d] bf16 · term_ids [N, L] · tfs [N, L] · doc_len [N] ·
      mask_bias [N] · q_vecs [B, d] · q_terms [B, M] · q_counts [B, M]
    """

    def body(emb, term_ids, tfs, doc_len, mask_bias, q_vecs, q_terms, q_counts):
        n_local = emb.shape[0]
        shard = jax.lax.axis_index("shard")
        row_base = (shard * n_local).astype(jnp.int32)
        keep = mask_bias == 0.0

        # ---- dense branch -------------------------------------------
        scores = jnp.einsum(
            "qd,nd->qn", q_vecs.astype(emb.dtype), emb,
            preferred_element_type=jnp.float32,
        ) + mask_bias[None, :]
        pool_eff = min(pool if use_mmr else k_vector, n_local)
        lv, li = jax.lax.top_k(scores, pool_eff)
        li = li.astype(jnp.int32)
        cand_emb = emb[jnp.maximum(li, 0)].astype(jnp.float32)  # [B, p, d]
        gi = jnp.where(lv > NEG_INF / 2, li + row_base, jnp.int32(2**30))

        av = jax.lax.all_gather(lv, "shard")          # [S, B, p]
        ai = jax.lax.all_gather(gi, "shard")
        ae = jax.lax.all_gather(cand_emb, "shard")    # [S, B, p, d]
        pool_target = min(pool if use_mmr else k_vector,
                          av.shape[0] * pool_eff)
        mv, mi = _merge_ranked(av, ai, pool_target)
        # Recover merged embeddings by matching ids in the gathered pool.
        s = av.shape[0]
        flat_i = jnp.transpose(ai, (1, 0, 2)).reshape(q_vecs.shape[0], -1)
        flat_e = jnp.transpose(ae, (1, 0, 2, 3)).reshape(
            q_vecs.shape[0], s * pool_eff, -1
        )
        match = flat_i[:, None, :] == mi[:, :, None]      # [B, pool, S*p]
        pos = jnp.argmax(match, axis=2)
        me = jnp.take_along_axis(flat_e, pos[:, :, None], axis=1)
        alive = mv > NEG_INF / 2

        if use_mmr:
            orders = jax.vmap(
                lambda q, c, v: mmr_order(q, c, v, k_vector, mmr_lambda)
            )(q_vecs.astype(jnp.float32), me, alive)
            ok = orders >= 0
            safe = jnp.maximum(orders, 0)
            vec_rows = jnp.where(ok, jnp.take_along_axis(mi, safe, axis=1), -1)
            vec_vals = jnp.where(
                ok, jnp.take_along_axis(mv, safe, axis=1), NEG_INF
            )
        else:
            vec_rows = jnp.where(alive[:, :k_vector], mi[:, :k_vector], -1)
            vec_vals = mv[:, :k_vector]
        vec_rows = jnp.where(vec_rows >= 2**30, -1, vec_rows)
        vec_dist = 1.0 - vec_vals

        # ---- bm25 branch --------------------------------------------
        present = (term_ids >= 0) & (tfs > 0) & keep[:, None]
        scatter_idx = jnp.where(present, term_ids, vocab_pad)
        df_local = jnp.zeros(vocab_pad + 1, jnp.float32).at[scatter_idx].add(
            jnp.where(present, 1.0, 0.0)
        ).at[vocab_pad].set(0.0)
        df = jax.lax.psum(df_local, "shard")
        n_sub = jnp.maximum(
            jax.lax.psum(jnp.sum(keep.astype(jnp.float32)), "shard"), 1.0
        )
        dl_sum = jax.lax.psum(jnp.sum(jnp.where(keep, doc_len, 0.0)), "shard")
        avgdl = dl_sum / n_sub

        idf = okapi_idf(df, n_sub)

        bm = jax.vmap(
            lambda qt, qc: okapi_score_rows(
                term_ids, tfs, doc_len, avgdl,
                okapi_query_weights(idf, qt, qc, vocab_pad), vocab_pad,
            )
        )(q_terms, q_counts)                              # [B, N_local]
        k_bm_eff = min(k_bm25, n_local)
        bv, bi = jax.lax.top_k(bm + mask_bias[None, :], k_bm_eff)
        bgi = jnp.where(bv > NEG_INF / 2, bi.astype(jnp.int32) + row_base,
                        jnp.int32(2**30))
        abv = jax.lax.all_gather(bv, "shard")
        abi = jax.lax.all_gather(bgi, "shard")
        mbv, mbi = _merge_ranked(abv, abi, k_bm25)
        bm_rows = jnp.where((mbv > NEG_INF / 2) & (mbi < 2**30), mbi, -1)
        bm_vals = jnp.where(bm_rows >= 0, mbv, 0.0)
        has_terms = jnp.any(q_terms >= 0, axis=1, keepdims=True)
        bm_rows = jnp.where(has_terms, bm_rows, -1)

        # ---- fusion (replicated) ------------------------------------
        from classmate_rag_tpu.ops.fusion import rrf_merge

        rows, fused, vdist, bscore = jax.vmap(
            lambda vr, br, vd, bs: rrf_merge(
                vr, br, vd, bs, weight_vector, weight_bm25, rrf_k, top_k
            )
        )(vec_rows, bm_rows, vec_dist, bm_vals)
        return ShardedHybridResult(rows, fused, vdist, bscore)

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("shard", None), P("shard", None), P("shard", None),
            P("shard"), P("shard"), P(None, None), P(None, None),
            P(None, None),
        ),
        out_specs=ShardedHybridResult(
            P(None, None), P(None, None), P(None, None), P(None, None)
        ),
        check_vma=False,
    )
    return jax.jit(sharded)
