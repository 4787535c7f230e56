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

Two BM25 formulations share the df/psum prologue and the merge epilogue:

- ``make_sharded_hybrid_fn`` — the gather pass (okapi_score_rows) over the
  packed [N_local, L] matrix. Simple, used for parity checks.
- ``make_sharded_split_hybrid_fn`` — the split-frequency formulation
  (term-major head matmul + tail postings; see lexical.bm25_split_score_core),
  the serving path: 6.5x less device time than the gather pass at batch.
  The head matrix shards by COLUMNS (corpus rows); tail postings are
  pre-partitioned by shard with shard-local row ids
  (lexical.shard_postings / shard_tail_ranges do the host prep).

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
    bm25_split_score_core,
    okapi_idf,
    okapi_query_weights,
    okapi_score_rows,
)
from classmate_rag_tpu.ops.mmr import mmr_order

from classmate_rag_tpu.utils.numerics import NEG_INF  # noqa: E402


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


def _dense_sharded(emb, mask_bias, q_vecs, row_base, *, k_vector, pool,
                   use_mmr, mmr_lambda, use_pallas=False, emb16=None,
                   rescore_pool=64, select="exact"):
    """Local dense scan → allgather → merged (vec_rows, vec_dist) [B, kv].

    Runs inside shard_map over the "shard" axis; the MMR reorder is
    replicated on the merged pool (with candidate embeddings recovered
    from the gathered per-shard pools by id match). ``use_pallas`` must
    mirror the single-device step's choice for the GLOBAL corpus size
    (ops/hybrid_step.use_pallas_scan) so both topologies score every row
    through the same kernel — the bit-identity contract.

    With ``emb16`` (shard-local f16 master) every shard selects a wider
    ``rescore_pool`` and gathers f16 candidate embeddings; the REPLICATED
    merge takes the global bf16 top pool — the same candidate set the
    single-device step rescored — then f16-rescores and re-sorts it, so
    bit-identity holds at serving precision too."""
    n_local = emb.shape[0]
    pool_eff = min(pool if use_mmr else k_vector, n_local)
    sel = pool_eff if emb16 is None else min(
        max(rescore_pool, pool_eff), n_local
    )
    if select == "approx" and emb16 is not None:
        # Shard-local PartialReduce selection (see ops/hybrid_step): the
        # merged pool then rescores/re-sorts exactly. In approx mode the
        # sharded pool may differ from a single-device run's at the pool
        # BOUNDARY (per-shard vs global reductions); the exact mode keeps
        # the bit-identity contract.
        scores = jnp.einsum(
            "qd,nd->qn", q_vecs.astype(emb.dtype), emb,
            preferred_element_type=jnp.float32,
        ) + mask_bias[None, :]
        from classmate_rag_tpu.ops.hybrid_step import _APPROX_RECALL_TARGET

        lv, li = jax.lax.approx_max_k(
            scores, sel, recall_target=_APPROX_RECALL_TARGET
        )
    elif use_pallas:
        from classmate_rag_tpu.ops.topk import topk_pallas

        lv, li = topk_pallas(
            emb, q_vecs.astype(jnp.float32), mask_bias, sel
        )
    else:
        scores = jnp.einsum(
            "qd,nd->qn", q_vecs.astype(emb.dtype), emb,
            preferred_element_type=jnp.float32,
        ) + mask_bias[None, :]
        lv, li = jax.lax.top_k(scores, sel)
    li = li.astype(jnp.int32)
    src = emb if emb16 is None else emb16
    cand_emb = src[jnp.maximum(li, 0)].astype(jnp.float32)  # [B, sel, d]
    gi = jnp.where(lv > NEG_INF / 2, li + row_base, jnp.int32(2**30))

    av = jax.lax.all_gather(lv, "shard")          # [S, B, sel]
    ai = jax.lax.all_gather(gi, "shard")
    ae = jax.lax.all_gather(cand_emb, "shard")    # [S, B, sel, d]
    pool_target = min(pool if use_mmr else k_vector, av.shape[0] * sel)
    merge_k = pool_target if emb16 is None else min(
        max(rescore_pool, pool_target), av.shape[0] * sel
    )
    mv, mi = _merge_ranked(av, ai, merge_k)
    # Recover merged embeddings by matching ids in the gathered pool.
    s = av.shape[0]
    flat_i = jnp.transpose(ai, (1, 0, 2)).reshape(q_vecs.shape[0], -1)
    flat_e = jnp.transpose(ae, (1, 0, 2, 3)).reshape(
        q_vecs.shape[0], s * sel, -1
    )
    match = flat_i[:, None, :] == mi[:, :, None]      # [B, merge_k, S*sel]
    pos = jnp.argmax(match, axis=2)
    me = jnp.take_along_axis(flat_e, pos[:, :, None], axis=1)

    if emb16 is not None:
        from classmate_rag_tpu.ops.hybrid_step import rescore_candidates

        safe_mi = jnp.where(mi >= 2**30, 0, mi)
        mi2, mv2, order = rescore_candidates(q_vecs, me, safe_mi, mv)
        # rescore_candidates sorted (rows, vals, order) — apply the same
        # order to the merged ids (with the 2**30 sentinel preserved) and
        # embeddings, then cut to the MMR pool.
        mi = jnp.take_along_axis(mi, order, axis=1)[:, :pool_target]
        mv = mv2[:, :pool_target]
        me = jnp.take_along_axis(
            me, order[:, :pool_target, None], axis=1
        )
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
    return vec_rows, 1.0 - vec_vals


def _subset_stats_sharded(term_ids, tfs, doc_len, keep, vocab_pad):
    """Global (df, n_sub, avgdl) from shard-local arrays via psum."""
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
    return df, n_sub, dl_sum / n_sub


def _bm25_merge_sharded(bm, mask_bias, row_base, has_terms, *, k_bm25,
                        select="exact", rescore_ctx=None):
    """Local BM25 scores [B, N_local] → merged (bm_rows, bm_vals).

    approx mode: shard-local PartialReduce pool; with ``rescore_ctx``
    (shard-local term arrays + psum'd global idf/avgdl) the pool is
    EXACT-rescored before the local cut, so the merged ranking is exact
    even when the scan ran the fast bf16-sat formulation."""
    n_local = bm.shape[1]
    k_bm_eff = min(k_bm25, n_local)
    biased = bm + mask_bias[None, :]
    if select == "approx":
        from classmate_rag_tpu.ops.hybrid_step import (
            _APPROX_RECALL_TARGET, bm25_rescore_pool,
        )

        k_sel = min(max(64, 4 * k_bm_eff), n_local)
        pv, pi = jax.lax.approx_max_k(
            biased, k_sel, recall_target=_APPROX_RECALL_TARGET
        )
        if rescore_ctx is not None:
            exact = bm25_rescore_pool(pi, *rescore_ctx)
            pv = jnp.where(pv > NEG_INF / 2, exact, NEG_INF)
        order = jnp.lexsort((pi, -pv))[:, :k_bm_eff]
        bv = jnp.take_along_axis(pv, order, axis=1)
        bi = jnp.take_along_axis(pi, order, axis=1)
    else:
        bv, bi = jax.lax.top_k(biased, k_bm_eff)
    bgi = jnp.where(bv > NEG_INF / 2, bi.astype(jnp.int32) + row_base,
                    jnp.int32(2**30))
    abv = jax.lax.all_gather(bv, "shard")
    abi = jax.lax.all_gather(bgi, "shard")
    mbv, mbi = _merge_ranked(abv, abi, k_bm25)
    bm_rows = jnp.where((mbv > NEG_INF / 2) & (mbi < 2**30), mbi, -1)
    bm_vals = jnp.where(bm_rows >= 0, mbv, 0.0)
    bm_rows = jnp.where(has_terms, bm_rows, -1)
    return bm_rows, bm_vals


def _fuse_replicated(vec_rows, bm_rows, vec_dist, bm_vals, *, weight_vector,
                     weight_bm25, rrf_k, top_k):
    from classmate_rag_tpu.ops.fusion import rrf_merge

    rows, fused, vdist, bscore = jax.vmap(
        lambda vr, br, vd, bs: rrf_merge(
            vr, br, vd, bs, weight_vector, weight_bm25, rrf_k, top_k
        )
    )(vec_rows, bm_rows, vec_dist, bm_vals)
    return ShardedHybridResult(rows, fused, vdist, bscore)


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
    use_pallas: bool | None = None,
):
    """Build the jitted SPMD hybrid query step for ``mesh`` (gather-pass
    BM25 formulation — the parity/reference path).

    Array args (shapes; leading N must divide by the shard count):
      emb [N, d] bf16 · term_ids [N, L] · tfs [N, L] · doc_len [N] ·
      mask_bias [N] · q_vecs [B, d] · q_terms [B, M] · q_counts [B, M]
    """

    def body(emb, term_ids, tfs, doc_len, mask_bias, q_vecs, q_terms, q_counts):
        n_local = emb.shape[0]
        shard = jax.lax.axis_index("shard")
        row_base = (shard * n_local).astype(jnp.int32)
        keep = mask_bias == 0.0

        # Same dense scorer as the single-device step would pick for the
        # GLOBAL corpus (bit-identity contract; see _dense_sharded).
        from classmate_rag_tpu.ops.hybrid_step import use_pallas_scan

        pallas = (
            use_pallas if use_pallas is not None
            else use_pallas_scan(n_local * mesh.shape["shard"])
        )
        vec_rows, vec_dist = _dense_sharded(
            emb, mask_bias, q_vecs, row_base,
            k_vector=k_vector, pool=pool, use_mmr=use_mmr,
            mmr_lambda=mmr_lambda, use_pallas=pallas,
        )

        df, n_sub, avgdl = _subset_stats_sharded(
            term_ids, tfs, doc_len, keep, vocab_pad
        )
        idf = okapi_idf(df, n_sub)
        bm = jax.vmap(
            lambda qt, qc: okapi_score_rows(
                term_ids, tfs, doc_len, avgdl,
                okapi_query_weights(idf, qt, qc, vocab_pad), vocab_pad,
            )
        )(q_terms, q_counts)                              # [B, N_local]
        has_terms = jnp.any(q_terms >= 0, axis=1, keepdims=True)
        bm_rows, bm_vals = _bm25_merge_sharded(
            bm, mask_bias, row_base, has_terms, k_bm25=k_bm25
        )

        return _fuse_replicated(
            vec_rows, bm_rows, vec_dist, bm_vals,
            weight_vector=weight_vector, weight_bm25=weight_bm25,
            rrf_k=rrf_k, top_k=top_k,
        )

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


def make_sharded_split_hybrid_fn(
    mesh: Mesh,
    *,
    r_cap: int,
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
    use_pallas: bool | None = None,
    with_rescore: bool = False,
    rescore_pool: int = 64,
    select: str = "exact",
    with_df: bool = False,
):
    """SPMD hybrid step with SPLIT-FREQUENCY BM25 — the serving-scale
    formulation (head matmul + tail postings) on every shard.

    ``with_df``: take a PRECOMPUTED replicated df [vocab_pad+1] f32 as an
    extra argument instead of histogramming [N_local, L] + psum per
    dispatch — the unfiltered-query path, fed by the store's
    host-maintained corpus df (IndexStore._df_host). Filtered queries
    keep the in-graph subset statistics (reference semantics). n_sub and
    avgdl still derive from the live mask (cheap [N_local] reductions).

    Array args (N = corpus capacity, divisible by the shard count S;
    N_local = N/S):
      emb [N, d] bf16                 P(shard, ·)
      term_ids [N, L] i32             P(shard, ·)  (subset-df statistics)
      tfs [N, L] u8                   P(shard, ·)
      tf_head [C, N] u8               P(·, shard)  term-major head matrix
      post_rows_sh [S, Pmax] i32      P(shard, ·)  shard-LOCAL row ids
      post_tfs_sh [S, Pmax] u8        P(shard, ·)
      doc_len [N] f32 · mask_bias [N] f32          P(shard)
      q_vecs [B, d] f32               replicated
      h_slots [H] · h_tids [H]        replicated (batch head union)
      u_starts_sh [S, U] · u_lens_sh [S, U]        P(shard, ·)
      u_cols [U] (segment → tail-term column) · t_tids [T] replicated
      q_tids [B, M] · q_counts [B, M] replicated
      has_terms [B, 1] bool           replicated

    Host prep: lexical.build_split_layout → lexical.shard_postings (once
    per index build) + lexical.split_query_arrays → shard_tail_ranges
    (once per batch). Results are bit-identical to the single-device
    hybrid_query_step_split (tests/test_parallel.py).
    """

    def body(emb, term_ids, tfs, tf_head, post_rows_sh, post_tfs_sh,
             doc_len, mask_bias, q_vecs,
             h_slots, h_tids,
             u_starts_sh, u_lens_sh, u_cols, t_tids,
             q_tids, q_counts, has_terms, *extra):
        extra = list(extra)
        df_pre = extra.pop(0) if with_df else None
        maybe_emb16 = extra
        n_local = emb.shape[0]
        shard = jax.lax.axis_index("shard")
        row_base = (shard * n_local).astype(jnp.int32)
        keep = mask_bias == 0.0

        # Same dense scorer as the single-device step would pick for the
        # GLOBAL corpus (bit-identity contract; see _dense_sharded).
        from classmate_rag_tpu.ops.hybrid_step import use_pallas_scan

        pallas = (
            use_pallas if use_pallas is not None
            else use_pallas_scan(n_local * mesh.shape["shard"])
        )
        vec_rows, vec_dist = _dense_sharded(
            emb, mask_bias, q_vecs, row_base,
            k_vector=k_vector, pool=pool, use_mmr=use_mmr,
            mmr_lambda=mmr_lambda, use_pallas=pallas,
            emb16=maybe_emb16[0] if with_rescore else None,
            rescore_pool=rescore_pool, select=select,
        )

        if with_df:
            df = df_pre
            n_sub = jnp.maximum(
                jax.lax.psum(jnp.sum(keep.astype(jnp.float32)), "shard"),
                1.0,
            )
            dl_sum = jax.lax.psum(
                jnp.sum(jnp.where(keep, doc_len, 0.0)), "shard"
            )
            avgdl = dl_sum / n_sub
        else:
            df, n_sub, avgdl = _subset_stats_sharded(
                term_ids, tfs, doc_len, keep, vocab_pad
            )
        idf = okapi_idf(df, n_sub)
        fast = select == "approx"
        bm = bm25_split_score_core(
            tf_head, post_rows_sh[0], post_tfs_sh[0], doc_len, keep,
            idf, avgdl,
            h_slots, h_tids,
            u_starts_sh[0], u_lens_sh[0], u_cols, t_tids,
            q_tids, q_counts,
            vocab_pad=vocab_pad, r_cap=r_cap, fast=fast,
        )                                                 # [B, N_local]
        bm_rows, bm_vals = _bm25_merge_sharded(
            bm, mask_bias, row_base, has_terms, k_bm25=k_bm25,
            select=select,
            rescore_ctx=(
                (term_ids, tfs, doc_len, avgdl, idf, q_tids, q_counts,
                 vocab_pad) if fast else None
            ),
        )

        return _fuse_replicated(
            vec_rows, bm_rows, vec_dist, bm_vals,
            weight_vector=weight_vector, weight_bm25=weight_bm25,
            rrf_k=rrf_k, top_k=top_k,
        )

    in_specs = [
        P("shard", None),   # emb
        P("shard", None),   # term_ids
        P("shard", None),   # tfs
        P(None, "shard"),   # tf_head (term-major: shard columns)
        P("shard", None),   # post_rows_sh
        P("shard", None),   # post_tfs_sh
        P("shard"),         # doc_len
        P("shard"),         # mask_bias
        P(None, None),      # q_vecs
        P(None), P(None),   # h_slots, h_tids
        P("shard", None),   # u_starts_sh
        P("shard", None),   # u_lens_sh
        P(None),            # u_cols (segment → term column)
        P(None),            # t_tids (distinct tail terms)
        P(None, None), P(None, None),   # q_tids, q_counts
        P(None, None),      # has_terms
    ]
    if with_df:
        in_specs.append(P(None))            # df_pre (replicated)
    if with_rescore:
        in_specs.append(P("shard", None))   # emb16 (f16 rescore master)
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=ShardedHybridResult(
            P(None, None), P(None, None), P(None, None), P(None, None)
        ),
        check_vma=False,
    )
    return jax.jit(sharded)
