"""User-facing SPMD serving: an IndexStore queried over a device mesh.

``ShardedHybridIndex`` wraps a built :class:`IndexStore` for multi-chip
serving — the capability the reference never had (its Chroma store was a
single local container). Corpus arrays are placed once with explicit
``NamedSharding`` layouts (rows of the embedding/lexical matrices and
columns of the term-major BM25 head matrix shard across chips; tail
postings are pre-partitioned per shard with shard-local row ids), and
every query batch is ONE SPMD dispatch through
:func:`make_sharded_split_hybrid_fn` — the same split-frequency BM25 +
dense + RRF math as the single-device fused step, bit-identical results
(tests/test_sharded_index.py).

Typical use::

    store = IndexStore(...); store.upsert(...)
    sharded = ShardedHybridIndex(store, corpus_mesh())
    out = sharded.query_batch(q_vecs, q_terms_lists, filters=None, top_k=8)

Re-wrap (cheap: one device_put pass) after mutating the store.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from classmate_rag_tpu.index.filters import mask_bias_host
from classmate_rag_tpu.index.lexical import (
    build_split_layout,
    pack_query_terms,
    shard_postings,
    shard_tail_ranges,
    split_query_arrays,
)
from classmate_rag_tpu.index.store import IndexStore
from classmate_rag_tpu.parallel.sharded import make_sharded_split_hybrid_fn


class ShardedHybridIndex:
    """SPMD view of an IndexStore over a 1-D ("shard",) corpus mesh."""

    def __init__(
        self,
        store: IndexStore,
        mesh: Mesh,
        *,
        k_vector: int = 8,
        k_bm25: int = 8,
        top_k: int = 8,
        pool: int = 24,
        use_mmr: bool = True,
        mmr_lambda: float = 0.5,
        rrf_k: int = 60,
        weight_vector: float = 1.0,
        weight_bm25: float = 1.0,
        max_query_terms: int = 32,
    ) -> None:
        self.store = store
        self.mesh = mesh
        self.n_shards = int(mesh.shape["shard"])
        if store.capacity % self.n_shards:
            raise ValueError(
                f"store capacity {store.capacity} must divide by the "
                f"{self.n_shards}-way shard axis (slab_rows controls this)"
            )
        self.max_query_terms = max_query_terms
        self._knobs = dict(
            k_vector=min(k_vector, store.capacity),
            k_bm25=min(k_bm25, store.capacity),
            top_k=top_k,
            pool=min(pool, store.capacity),
            vocab_pad=store.vocab_pad,
            use_mmr=use_mmr,
            mmr_lambda=mmr_lambda,
            rrf_k=rrf_k,
            weight_vector=weight_vector,
            weight_bm25=weight_bm25,
        )

        # ---- build + place the sharded corpus state -------------------
        layout = build_split_layout(
            store.term_ids, store.tfs, len(store.vocab),
            head_bytes_budget=store.HEAD_BYTES_BUDGET,
            head_df_threshold=store.HEAD_DF_THRESHOLD,
        )
        self._layout = layout
        n_local = store.capacity // self.n_shards
        post_rows_sh, post_tfs_sh, offsets_sh = shard_postings(
            layout["post_rows"], layout["post_tfs"], layout["offsets"],
            self.n_shards, n_local, layout["r_cap"],
        )
        self._offsets_sh = offsets_sh

        self._dev = {
            "emb": self._place(store.emb, P("shard", None)
                               ).astype(jnp.bfloat16),
            "term_ids": self._place(store.term_ids, P("shard", None)),
            "tfs": self._place(store.tfs, P("shard", None)),
            "tf_head": self._place(layout["tf_head"], P(None, "shard")),
            "post_rows_sh": self._place(post_rows_sh, P("shard", None)),
            "post_tfs_sh": self._place(post_tfs_sh, P("shard", None)),
            "doc_len": self._place(store.doc_len, P("shard")),
        }
        self._fn = make_sharded_split_hybrid_fn(
            mesh, r_cap=layout["r_cap"], **self._knobs
        )
        self._bias_cache: Dict[str, Any] = {}

    # ------------------------------------------------------------------

    def _place(self, arr, spec):
        """Host numpy → global device array with the given layout.

        Single-process meshes use device_put; when the mesh spans
        processes (multi-host DCN serving) every process holds the FULL
        host array (each loads the same store — the SPMD contract: all
        processes call query_batch with identical inputs), and
        make_array_from_process_local_data carves out this process's
        addressable shards."""
        sharding = NamedSharding(self.mesh, spec)
        if sharding.is_fully_addressable:
            return jax.device_put(arr, sharding)
        arr = np.asarray(arr)
        # global_shape MUST be explicit: without it the full host array is
        # interpreted as this process's local slice and the global array
        # silently doubles.
        return jax.make_array_from_process_local_data(
            sharding, arr, global_shape=arr.shape
        )

    def _mask_bias_sharded(self, where: Optional[Mapping[str, Any]]):
        """Filter mask as a shard-placed bias vector (cached per filter).

        Computed HOST-side from the store's numpy columns — going through
        store._mask_bias would stage the whole corpus onto the single
        default device, defeating the sharded placement."""
        import json

        key = json.dumps(where or {}, sort_keys=True, default=str)
        cached = self._bias_cache.get(key)
        if cached is not None:
            return cached
        store = self.store
        wanted, tag_want = store.compile_filter(where)
        bias = mask_bias_host(
            store.field_cols, store.tag_bits, store.valid, wanted, tag_want
        )
        placed = self._place(bias, P("shard"))
        self._bias_cache[key] = placed
        return placed

    def stats(self) -> Dict[str, Any]:
        """Shard-occupancy observability: live rows, head-matrix columns,
        and tail postings per shard (imbalance here means one chip does
        more scan work than the rest)."""
        n_local = self.store.capacity // self.n_shards
        valid = self.store.valid
        per_shard_rows = [
            int(valid[s * n_local:(s + 1) * n_local].sum())
            for s in range(self.n_shards)
        ]
        per_shard_postings = [
            int(self._offsets_sh[s, -1]) for s in range(self.n_shards)
        ]
        return {
            "n_shards": self.n_shards,
            "rows_per_shard": per_shard_rows,
            "tail_postings_per_shard": per_shard_postings,
            "head_terms": int((self._layout["lut"] >= 0).sum()),
            "r_cap": int(self._layout["r_cap"]),
            "capacity_per_shard": n_local,
        }

    def query_batch(
        self,
        query_vecs: np.ndarray,                    # [B, d] f32
        query_terms_list: Sequence[Sequence[str]],
        where: Optional[Mapping[str, Any]] = None,
    ):
        """One SPMD dispatch for the whole batch → HybridBatchResult-shaped
        ShardedHybridResult (rows/fused/vec_dist/bm25_score, replicated;
        trailing rows past the true batch are padding)."""
        store = self.store
        bq = len(query_terms_list)
        # Pad the batch to a power of two: every distinct B is a fresh
        # (expensive, multi-device) XLA compile.
        b_pad = 1 << (bq - 1).bit_length() if bq > 1 else 1
        q_vecs = np.asarray(query_vecs, np.float32)
        if b_pad > bq:
            q_vecs = np.concatenate(
                [q_vecs, np.zeros((b_pad - bq, q_vecs.shape[1]), np.float32)]
            )
        term_lists = list(query_terms_list) + [[]] * (b_pad - bq)
        q_terms, q_counts = pack_query_terms(
            store.vocab, term_lists, self.max_query_terms
        )

        layout = self._layout
        qa = split_query_arrays(
            layout["lut"], layout["offsets"], q_terms, q_counts,
            r_cap=layout["r_cap"],
        )
        u_starts_sh, u_lens_sh = shard_tail_ranges(
            self._offsets_sh, qa["u_tids"], r_cap=layout["r_cap"]
        )
        has_terms = np.any(q_terms >= 0, axis=1, keepdims=True)
        bias = self._mask_bias_sharded(where)
        d = self._dev
        rep1 = P(None)
        rep2 = P(None, None)
        out = self._fn(
            d["emb"], d["term_ids"], d["tfs"], d["tf_head"],
            d["post_rows_sh"], d["post_tfs_sh"], d["doc_len"], bias,
            self._place(q_vecs, rep2),
            self._place(qa["h_slots"], rep1),
            self._place(qa["h_tids"], rep1),
            self._place(u_starts_sh, P("shard", None)),
            self._place(u_lens_sh, P("shard", None)),
            self._place(qa["u_cols"], rep1),
            self._place(qa["t_tids"], rep1),
            self._place(q_terms, rep2),
            self._place(q_counts, rep2),
            self._place(has_terms, rep2),
        )
        if b_pad == bq:
            return out
        return type(out)(*(a[:bq] for a in out))
