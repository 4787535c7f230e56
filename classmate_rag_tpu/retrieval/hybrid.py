"""Hybrid retrieval: dense exact-scan + BM25, RRF-fused, MMR-diversified.

Pipeline parity with the reference HybridRetriever
(rag/retrieval/fusion.py:64-167):

1. dense branch: encode query → masked exact top-``pool`` scan
   (pool = max(k_vector, mmr_max_pool) when MMR is on) → greedy MMR
   reorder (λ=0.5) → first ``k_vector``;
2. lexical branch: tokenize query (query-language stopwords) → subset-
   statistics BM25 top-``k_bm25``;
3. weighted RRF (rrf_k=60) over the two ranked lists, merged per-row
   scores, sorted by (fused, −distance), truncated to ``top_k``.

All scoring/fusion runs on device over global row indices; strings only
materialize at the end. ``hybrid=False`` gives the dense-only path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Mapping, Optional

import numpy as np

from classmate_rag_tpu.index.catalog import Catalog
from classmate_rag_tpu.index.lexical import tokenize
from classmate_rag_tpu.index.store import IndexStore
from classmate_rag_tpu.ops.fusion import rrf_merge
from classmate_rag_tpu.ops.mmr import mmr_order
from classmate_rag_tpu.utils.lang import detect_lang_tag

from classmate_rag_tpu.utils.numerics import NEG_INF  # noqa: E402


@dataclass
class HybridRetriever:
    store: IndexStore
    catalog: Catalog
    embedder: Any

    k_vector: int = 8
    k_bm25: int = 8
    rrf_k: int = 60
    weight_vector: float = 1.0
    weight_bm25: float = 1.0
    use_mmr: bool = True
    mmr_lambda: float = 0.5
    mmr_max_pool: int = 24
    # Device-resident encode→retrieve handoff (cfg.device_query_encode);
    # False forces the cached host encode path.
    use_device_encode: bool = True
    # SPMD serving engine (parallel/serving.ShardedHybridIndex) — when
    # set, every batched retrieval dispatches through the corpus mesh
    # instead of the single-device store (bit-identical results; see
    # pipeline/runtime.build_sharded_index).
    sharded: Any = None

    def _dense_branch(
        self, query: str, where: Optional[Mapping[str, Any]], k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (rows [k], cosine distances [k]) in final (MMR) order."""
        import jax.numpy as jnp

        q_vec = self.embedder.encode_queries([query])[0].astype(np.float32)
        pool = max(k, self.mmr_max_pool) if self.use_mmr else k
        scores, rows = self.store.dense_topk(q_vec[None, :], where, pool)
        scores, rows = scores[0], rows[0]
        if not self.use_mmr:
            return rows[:k], 1.0 - scores[:k]
        valid = rows >= 0
        cand_embs = self.store.embeddings_for_rows(np.maximum(rows, 0))
        order = np.asarray(mmr_order(
            jnp.asarray(q_vec), cand_embs, jnp.asarray(valid), k,
            self.mmr_lambda,
        ))
        picked = order[order >= 0]
        out_rows = np.full(k, -1, dtype=np.int64)
        out_dist = np.zeros(k, dtype=np.float32)
        n = min(len(picked), k)
        out_rows[:n] = rows[picked[:n]]
        out_dist[:n] = 1.0 - scores[picked[:n]]
        return out_rows, out_dist

    def _bm25_branch(
        self, query: str, where: Optional[Mapping[str, Any]], k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        q_lang = detect_lang_tag(query)
        terms = tokenize(query, q_lang)
        if not terms:
            return np.full(k, -1, dtype=np.int64), np.zeros(k, dtype=np.float32)
        scores, rows = self.store.bm25_topk(terms, where, k)
        return rows.astype(np.int64), scores

    def retrieve(
        self,
        *,
        question: str,
        filters: Optional[Mapping[str, Any]] = None,
        top_k: int = 8,
        hybrid: bool = True,
        use_fused: bool = True,
    ) -> List[Dict[str, Any]]:
        """Single-question retrieval.

        By default this runs through the fused batch step (B=1): the
        per-query spec path makes ~5 device dispatches (encode, dense
        top-k, MMR, BM25, RRF), each a round trip through the remote
        device link, where the fused path makes 2 (encode → fused step,
        with the encode output handed over on device). Results are
        identical — ``use_fused=False`` keeps the readable spec path
        alive for parity tests.
        """
        from classmate_rag_tpu.utils.metrics import metrics

        with metrics.timer("retrieve"):
            if use_fused:
                return self._retrieve_batch(
                    questions=[question], filters=filters, top_k=top_k,
                    hybrid=hybrid,
                )[0]
            return self._retrieve(
                question=question, filters=filters, top_k=top_k, hybrid=hybrid
            )

    def retrieve_batch(
        self,
        *,
        questions: List[str],
        filters: Optional[Mapping[str, Any]] = None,
        top_k: int = 8,
        hybrid: bool = True,
    ) -> List[List[Dict[str, Any]]]:
        """Batched hybrid retrieval: ONE fused device dispatch for all
        questions (they must share one filter dict — group upstream).
        Returns per-question result lists identical to ``retrieve``'s.
        """
        from classmate_rag_tpu.utils.metrics import metrics

        with metrics.timer("retrieve_batch"):
            return self._retrieve_batch(
                questions=questions, filters=filters, top_k=top_k,
                hybrid=hybrid,
            )

    def _retrieve_batch(
        self,
        *,
        questions: List[str],
        filters: Optional[Mapping[str, Any]] = None,
        top_k: int = 8,
        hybrid: bool = True,
    ) -> List[List[Dict[str, Any]]]:
        where = dict(filters) if filters else None
        live = [
            (i, q) for i, q in enumerate(questions)
            if q.strip() and len(self.store) > 0
        ]
        out: List[List[Dict[str, Any]]] = [[] for _ in questions]
        if not live:
            return out

        # Device-resident handoff when the embedder can encode on device:
        # the query vectors go straight from the encoder's output buffer
        # into the fused hybrid dispatch without a host fetch in between
        # (each fetch through the remote device link is a full round trip).
        import jax.numpy as jnp

        encode_device = (
            getattr(self.embedder, "encode_queries_device", None)
            if self.use_device_encode else None
        )
        if encode_device is not None:
            q_vecs = encode_device([q for _i, q in live])
        else:
            q_vecs = self.embedder.encode_queries(
                [q for _i, q in live]
            ).astype(np.float32)
        q_terms = [
            tokenize(q, detect_lang_tag(q)) if hybrid else []
            for _i, q in live
        ]
        # Pad the device batch to a power of two: micro-batched serving
        # produces arbitrary batch sizes, and every distinct B is a fresh
        # XLA compile.
        n_live = len(live)
        b_pad = 1 << (n_live - 1).bit_length() if n_live > 1 else 1
        if b_pad > n_live:
            xp = jnp if isinstance(q_vecs, jnp.ndarray) else np
            q_vecs = xp.concatenate(
                [q_vecs, xp.zeros((b_pad - n_live, q_vecs.shape[1]),
                                  xp.float32)]
            )
            q_terms = q_terms + [[] for _ in range(b_pad - n_live)]
        # Same knobs as the per-query path: dense-only widens k_vector to
        # top_k; empty term lists disable the bm25 branch via has_terms.
        kv = self.k_vector if hybrid else max(top_k, self.k_vector)
        knobs = dict(
            k_vector=kv,
            k_bm25=self.k_bm25,
            top_k=top_k,
            pool=max(kv, self.mmr_max_pool) if self.use_mmr else kv,
            use_mmr=self.use_mmr,
            mmr_lambda=self.mmr_lambda,
            rrf_k=self.rrf_k,
            weight_vector=self.weight_vector if hybrid else 1.0,
            weight_bm25=self.weight_bm25,
        )
        if self.sharded is not None:
            # Product multi-chip path: ONE SPMD dispatch over the corpus
            # mesh; the wrapper first drains the store's mutation journal
            # (O(delta) re-place) so admin mutations are visible.
            self.sharded.ensure_fresh()
            result = self.sharded.query_batch(q_vecs, q_terms, where, **knobs)
        else:
            result = self.store.hybrid_topk_batch(q_vecs, q_terms, where, **knobs)
        import jax

        # One batched transfer for all four [B, k] outputs (per-array
        # fetches each pay a device-link round trip).
        rows, fused, vdist, bscore = jax.device_get(
            (result.rows, result.fused, result.vec_dist, result.bm25_score)
        )

        for pos, (i, _q) in enumerate(live):
            items: List[Dict[str, Any]] = []
            for j in range(rows.shape[1]):
                r = int(rows[pos, j])
                if r < 0 or r >= self.store.n_rows:
                    continue
                cid = self.store.ids[r]
                entry = self.catalog.get(cid)
                vd = float(vdist[pos, j])
                bs = float(bscore[pos, j])
                items.append({
                    "id": cid,
                    "document": entry.text if entry else "",
                    "metadata": dict(entry.metadata) if entry else {},
                    "scores": {
                        "vector_distance": None if np.isnan(vd) else vd,
                        "bm25_score": None if np.isnan(bs) else bs,
                        "fused": float(fused[pos, j]),
                    },
                })
            out[i] = items
        return out

    def _retrieve(
        self,
        *,
        question: str,
        filters: Optional[Mapping[str, Any]] = None,
        top_k: int = 8,
        hybrid: bool = True,
    ) -> List[Dict[str, Any]]:
        import jax.numpy as jnp

        where = dict(filters) if filters else None
        if not question.strip() or len(self.store) == 0:
            return []

        if hybrid:
            vec_rows, vec_dist = self._dense_branch(question, where, self.k_vector)
            bm_rows, bm_scores = self._bm25_branch(question, where, self.k_bm25)
        else:
            kv = max(top_k, self.k_vector)
            vec_rows, vec_dist = self._dense_branch(question, where, kv)
            bm_rows = np.full(1, -1, dtype=np.int64)
            bm_scores = np.zeros(1, dtype=np.float32)

        rows, fused, vdist, bscore = rrf_merge(
            jnp.asarray(vec_rows, jnp.int32),
            jnp.asarray(bm_rows, jnp.int32),
            jnp.asarray(vec_dist, jnp.float32),
            jnp.asarray(bm_scores, jnp.float32),
            self.weight_vector if hybrid else 1.0,
            self.weight_bm25,
            self.rrf_k,
            top_k,
        )
        rows = np.asarray(rows)
        fused = np.asarray(fused)
        vdist = np.asarray(vdist)
        bscore = np.asarray(bscore)

        out: List[Dict[str, Any]] = []
        for j in range(len(rows)):
            r = int(rows[j])
            if r < 0:
                continue
            cid = self.store.ids[r] if r < self.store.n_rows else None
            if cid is None:
                continue
            entry = self.catalog.get(cid)
            vd = float(vdist[j])
            bs = float(bscore[j])
            out.append({
                "id": cid,
                "document": entry.text if entry else "",
                "metadata": dict(entry.metadata) if entry else {},
                "scores": {
                    "vector_distance": None if np.isnan(vd) else vd,
                    "bm25_score": None if np.isnan(bs) else bs,
                    "fused": float(fused[j]),
                },
            })
        return out
