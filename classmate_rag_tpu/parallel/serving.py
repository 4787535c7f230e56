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
    out = sharded.query_batch(q_vecs, q_terms_lists, filters=None)

Mutations: the wrapper consumes the store's journal
(``IndexStore.drain_journal``) lazily at the next query and re-places
only what changed:

- metadata/validity edits (deletes, tag changes) → the cached filter
  bias vectors are invalidated and recomputed per active filter
  (O(N · 4B) transfer, not the ~GB full re-place);
- embedding-only updates (``rebuild``) → an SPMD row scatter moves just
  the changed rows (O(delta · d));
- lexical content changes (ingest) → changed rows scatter into the
  row-sharded term arrays; the derived split-BM25 structures rebuild
  host-side and re-place incrementally where the head layout is stable
  (head-matrix COLUMN scatter for the changed rows), falling back to a
  full split re-place when the head term set itself moved;
- structural changes (capacity growth, compaction) → full re-place.

``bytes_placed_total`` counts every byte moved host→device so tests (and
operators) can assert the O(delta) property.
"""

from __future__ import annotations

import threading
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

# Above this fraction of dirty rows a full re-place beats scattering.
_SCATTER_FRACTION = 0.25

_KNOB_NAMES = (
    "k_vector", "k_bm25", "top_k", "pool", "use_mmr", "mmr_lambda",
    "rrf_k", "weight_vector", "weight_bm25",
)


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
        self.max_query_terms = max_query_terms
        self._defaults = dict(
            k_vector=k_vector, k_bm25=k_bm25, top_k=top_k, pool=pool,
            use_mmr=use_mmr, mmr_lambda=mmr_lambda, rrf_k=rrf_k,
            weight_vector=weight_vector, weight_bm25=weight_bm25,
        )
        self._fn_cache: Dict[tuple, Any] = {}
        self._bias_cache: Dict[str, Any] = {}
        # Bumped on every bias-cache invalidation: a bias computed from
        # pre-invalidation store state must not be inserted AFTER the
        # clear (it would serve deleted rows until the next metadata
        # mutation). Guarded by _lock.
        self._bias_gen = 0
        self._scatter_fns: Dict[str, Any] = {}
        self._lock = threading.Lock()
        self.bytes_placed_total = 0
        self.bytes_placed_last_refresh = 0
        self._build()

    # ------------------------------------------------------------------
    # Placement
    # ------------------------------------------------------------------

    def _build(self) -> None:
        """Full placement of the sharded corpus state (constructor and
        structural-change path)."""
        store = self.store
        if store.capacity % self.n_shards:
            raise ValueError(
                f"store capacity {store.capacity} must divide by the "
                f"{self.n_shards}-way shard axis (slab_rows controls this)"
            )
        # Consuming the journal here keeps construction and refresh
        # idempotent: everything below reflects the store as of now.
        self._epoch = store.drain_journal()[0]
        self._capacity = store.capacity
        self._vocab_pad = store.vocab_pad

        layout = build_split_layout(
            store.term_ids, store.tfs, len(store.vocab),
            head_bytes_budget=store.HEAD_BYTES_BUDGET,
            head_df_threshold=store.HEAD_DF_THRESHOLD,
        )
        self._layout = layout
        n_local = store.capacity // self.n_shards
        # Per-shard overlay reserve: room for O(delta) tail maintenance
        # (plan_tail_delta) between full rebuilds — sized to a few
        # percent of the base postings with a floor for small corpora.
        self._reserve = max(
            4096, int(layout["p_base"]) // (32 * self.n_shards)
        )
        post_rows_sh, post_tfs_sh, offsets_sh = shard_postings(
            layout["post_rows"], layout["post_tfs"], layout["offsets"],
            self.n_shards, n_local, layout["r_cap"],
            reserve=self._reserve,
        )
        self._offsets_sh = offsets_sh
        self._host_postings = (post_rows_sh, post_tfs_sh)
        # Tail-overlay state (all host-side; see _try_incremental_lexical):
        # per-shard {tid: {local_row: tf}}, the compiled per-shard overlay
        # offsets, the replicated global overlay offsets fed to the query
        # splitter (None = overlay empty → exact round-3 query path), and
        # how much of each shard's overlay region currently holds data.
        self._ov_by_term = [dict() for _ in range(self.n_shards)]
        self._ov_offsets_sh = np.zeros(
            (self.n_shards, len(store.vocab) + 1), np.int64
        )
        self._ov_offsets_global = None
        self._ov_prev = [
            (np.zeros(0, np.int32), np.zeros(0, np.uint8))
            for _ in range(self.n_shards)
        ]
        self._tail_diverged = False
        self.full_lexical_rebuilds = getattr(
            self, "full_lexical_rebuilds", -1
        ) + 1

        # Replicated precomputed corpus df for unfiltered queries
        # ((vpad, placed array) — see _df_placed_for); derived from the
        # store's host-maintained df, so the SPMD step skips the
        # per-dispatch [N_local, L] histogram + psum. _df_gen guards the
        # same insert-after-invalidate race as _bias_gen.
        self._df_placed = None
        self._df_gen = getattr(self, "_df_gen", 0) + 1
        self._dev = {
            "emb": self._place(store.emb, P("shard", None)
                               ).astype(jnp.bfloat16),
            # f16 rescore master rides the same shard layout; None below
            # the store's rescore threshold (recall-at-scale knob).
            "emb16": (
                self._place(store.emb, P("shard", None))
                if store.rescore_enabled else None
            ),
            "term_ids": self._place(store.term_ids, P("shard", None)),
            "tfs": self._place(store.tfs, P("shard", None)),
            "tf_head": self._place(layout["tf_head"], P(None, "shard")),
            "post_rows_sh": self._place(post_rows_sh, P("shard", None)),
            "post_tfs_sh": self._place(post_tfs_sh, P("shard", None)),
            "doc_len": self._place(store.doc_len, P("shard")),
        }
        self._bias_cache.clear()
        self._bias_gen += 1
        self._scatter_fns.clear()
        self._fn_cache.clear()

    def _place(self, arr, spec):
        """Host numpy → global device array with the given layout.

        Single-process meshes use device_put; when the mesh spans
        processes (multi-host DCN serving) every process holds the FULL
        host array (each loads the same store — the SPMD contract: all
        processes call query_batch with identical inputs), and
        make_array_from_process_local_data carves out this process's
        addressable shards."""
        sharding = NamedSharding(self.mesh, spec)
        nbytes = getattr(arr, "nbytes", 0)
        self.bytes_placed_total += int(nbytes)
        if sharding.is_fully_addressable:
            return jax.device_put(arr, sharding)
        arr = np.asarray(arr)
        # global_shape MUST be explicit: without it the full host array is
        # interpreted as this process's local slice and the global array
        # silently doubles.
        return jax.make_array_from_process_local_data(
            sharding, arr, global_shape=arr.shape
        )

    # ------------------------------------------------------------------
    # Incremental refresh
    # ------------------------------------------------------------------

    def ensure_fresh(self) -> None:
        """Bring the placed state up to date with the store's journal.

        Called at query time (and safe to call concurrently); see module
        docstring for the per-tier transfer costs."""
        with self._lock:
            before = self.bytes_placed_total
            epoch, j_emb, j_lex, j_meta, old_lex = (
                self.store.drain_journal()
            )
            structural = (
                epoch != self._epoch
                or self.store.capacity != self._capacity
            )
            n_dirty = len(j_emb | j_lex)
            if structural or n_dirty > self.store.capacity * _SCATTER_FRACTION:
                self._build()
                self.bytes_placed_last_refresh = (
                    self.bytes_placed_total - before
                )
                return
            if j_lex or j_meta:
                # Corpus df may have moved (content or validity): the
                # replicated copy re-derives from the store's
                # host-maintained df on next use (KBs, not a re-place).
                self._df_placed = None
                self._df_gen += 1
            if j_lex:
                self._refresh_lexical(sorted(j_lex), old_lex)
            if j_emb:
                rows = sorted(j_emb)
                # f16 on the wire; the scatter body casts to the placed
                # bf16 dtype on device (f16→f32→bf16 == f16→bf16).
                self._scatter_rows(
                    "emb", np.asarray(rows, np.int32), self.store.emb[rows]
                )
                if self._dev.get("emb16") is not None:
                    self._scatter_rows(
                        "emb16", np.asarray(rows, np.int32),
                        self.store.emb[rows],
                    )
            if j_meta:
                # Filter biases derive from metadata + validity; recompute
                # lazily per active filter (an [N] f32 each — tiny).
                self._bias_cache.clear()
                self._bias_gen += 1
            self.bytes_placed_last_refresh = self.bytes_placed_total - before

    def _refresh_lexical(self, rows, old_lex) -> None:
        """Lexical content changed for ``rows``: scatter the row-sharded
        term arrays, then maintain the derived split-BM25 structures
        O(delta) — frozen head partition + tail overlay
        (lexical.plan_tail_delta) — falling back to a full layout
        rebuild only when the plan is infeasible (overlay outgrew its
        reserve, or a mutation's old content is unavailable). The
        round-3 version rebuilt the full layout on EVERY delta: ~O(N·L)
        host work per 1-row ingest, minutes at 1M rows on this 1-core
        host."""
        store = self.store
        r = np.asarray(rows, np.int32)
        self._scatter_rows("term_ids", r, store.term_ids[rows])
        self._scatter_rows("tfs", r, store.tfs[rows])
        self._scatter_rows("doc_len", r, store.doc_len[rows])

        if self._try_incremental_lexical(rows, old_lex):
            return
        self._rebuild_lexical(rows)

    def _try_incremental_lexical(self, rows, old_lex) -> bool:
        from classmate_rag_tpu.index.lexical import (
            head_tf_columns, overlay_diff_span as _diff_span,
            plan_tail_delta,
        )

        store = self.store
        layout = self._layout
        n_vocab = len(store.vocab)
        n_local = self._capacity // self.n_shards
        lut = layout["lut"]
        offsets = layout["offsets"]
        if n_vocab > len(lut):
            # Vocab grew: new terms are tail by construction (df starts
            # tiny) — extend the frozen tables with empty entries.
            lut = np.concatenate(
                [lut, np.full(n_vocab - len(lut), -1, np.int32)]
            )
            offsets = np.concatenate([
                offsets,
                np.full(n_vocab + 1 - len(offsets), offsets[-1], np.int64),
            ])
        if self._ov_offsets_sh.shape[1] < n_vocab + 1:
            pad = n_vocab + 1 - self._ov_offsets_sh.shape[1]
            self._ov_offsets_sh = np.concatenate([
                self._ov_offsets_sh,
                np.repeat(self._ov_offsets_sh[:, -1:], pad, axis=1),
            ], axis=1)
        if self._offsets_sh.shape[1] < n_vocab + 1:
            # Keep the per-shard BASE offsets table aligned with the
            # extended vocab too (new terms: empty base range) — query
            # tids index all of these tables.
            pad = n_vocab + 1 - self._offsets_sh.shape[1]
            self._offsets_sh = np.concatenate([
                self._offsets_sh,
                np.repeat(self._offsets_sh[:, -1:], pad, axis=1),
            ], axis=1)

        post_rows_sh, _post_tfs_sh = self._host_postings
        base_lens = self._offsets_sh[:, -1]
        plans = []
        for s in range(self.n_shards):
            changes = []
            for row in rows:
                if row // n_local != s:
                    continue
                if row not in old_lex:
                    return False  # uncaptured mutation
                changes.append((
                    row - s * n_local,
                    old_lex[row],
                    (store.term_ids[row], store.tfs[row]),
                ))
            if not changes:
                plans.append(None)
                continue
            room = (
                post_rows_sh.shape[1] - int(base_lens[s])
                - layout["r_cap"]
            )
            plan = plan_tail_delta(
                # Searches run against THIS shard's postings: ranges must
                # come from the per-shard offsets, not the global ones.
                lut, self._offsets_sh[s], post_rows_sh[s],
                self._ov_by_term[s], changes,
                reserve=room, n_vocab=n_vocab,
            )
            if plan is None:
                return False
            plans.append(plan)

        # All shards feasible — apply. Head columns first (frozen lut).
        r = np.asarray(rows, np.int32)
        c_pad = self._dev["tf_head"].shape[0]
        cols = head_tf_columns(
            lut, c_pad, store.term_ids[rows], store.tfs[rows]
        )
        self._scatter_cols("tf_head", r, cols)

        zero_s, zero_p = [], []
        reg_s, reg_p, reg_rows, reg_tfs = [], [], [], []
        ov_counts = np.zeros((self.n_shards, n_vocab), np.int64)
        for s, plan in enumerate(plans):
            if plan is None:
                ov_counts[s] = np.diff(
                    self._ov_offsets_sh[s, : n_vocab + 1]
                )
                continue
            zero_s.extend([s] * len(plan["zero_pos"]))
            zero_p.extend(plan["zero_pos"].tolist())
            # Write only the DIFF SPAN of the overlay region against its
            # previous serialization (per-term contiguous content shifts
            # from the first affected term onward): re-shipping the full
            # region made a steady-state 1-row ingest cost O(overlay)
            # once the region filled up. Zero-padding the comparison
            # clears any stale tail when the overlay shrank.
            lo, hi = _diff_span(
                plan["ov_rows"], plan["ov_tfs"], self._ov_prev[s]
            )
            if hi > lo:
                start = int(base_lens[s])
                reg_s.extend([s] * (hi - lo))
                reg_p.extend(range(start + lo, start + hi))
                rows_pad = np.zeros(hi, np.int32)
                tfs_pad = np.zeros(hi, np.uint8)
                n_new = len(plan["ov_rows"])
                rows_pad[: min(n_new, hi)] = plan["ov_rows"][:hi]
                tfs_pad[: min(n_new, hi)] = plan["ov_tfs"][:hi]
                reg_rows.extend(rows_pad[lo:hi].tolist())
                reg_tfs.extend(tfs_pad[lo:hi].tolist())
            self._ov_prev[s] = (plan["ov_rows"], plan["ov_tfs"])
            ov_counts[s] = np.diff(plan["ov_offsets"])
            self._ov_offsets_sh[s, : n_vocab + 1] = plan["ov_offsets"]

        if zero_p:
            self._scatter_elems(
                "post_tfs_sh", zero_s, zero_p,
                np.zeros(len(zero_p), np.uint8),
            )
            self._tail_diverged = True
        if reg_p:
            self._scatter_elems(
                "post_rows_sh", reg_s, reg_p,
                np.asarray(reg_rows, np.int32),
            )
            self._scatter_elems(
                "post_tfs_sh", reg_s, reg_p,
                np.asarray(reg_tfs, np.uint8),
            )
            self._tail_diverged = True

        total_counts = ov_counts.sum(axis=0)
        ov_global = np.zeros(n_vocab + 1, np.int64)
        np.cumsum(total_counts, out=ov_global[1:])
        self._ov_offsets_global = (
            ov_global if int(ov_global[-1]) else None
        )
        self._layout = dict(layout, lut=lut, offsets=offsets)
        self._vocab_pad = store.vocab_pad
        return True

    def _rebuild_lexical(self, rows) -> None:
        """Full split-layout rebuild (the incremental plan was
        infeasible): O(corpus) host work — the exceptional path."""
        store = self.store
        r = np.asarray(rows, np.int32)
        old_layout = self._layout
        layout = build_split_layout(
            store.term_ids, store.tfs, len(store.vocab),
            head_bytes_budget=store.HEAD_BYTES_BUDGET,
            head_df_threshold=store.HEAD_DF_THRESHOLD,
        )
        self._layout = layout
        self._vocab_pad = store.vocab_pad
        n_local = store.capacity // self.n_shards
        self._reserve = max(
            4096, int(layout["p_base"]) // (32 * self.n_shards)
        )
        post_rows_sh, post_tfs_sh, offsets_sh = shard_postings(
            layout["post_rows"], layout["post_tfs"], layout["offsets"],
            self.n_shards, n_local, layout["r_cap"],
            reserve=self._reserve,
        )
        self._offsets_sh = offsets_sh
        self._ov_by_term = [dict() for _ in range(self.n_shards)]
        self._ov_offsets_sh = np.zeros(
            (self.n_shards, len(store.vocab) + 1), np.int64
        )
        self._ov_offsets_global = None
        self._ov_prev = [
            (np.zeros(0, np.int32), np.zeros(0, np.uint8))
            for _ in range(self.n_shards)
        ]
        self.full_lexical_rebuilds += 1

        head_stable = (
            layout["r_cap"] == old_layout["r_cap"]
            and layout["tf_head"].shape == old_layout["tf_head"].shape
            and len(layout["lut"]) >= len(old_layout["lut"])
            and np.array_equal(
                layout["lut"][: len(old_layout["lut"])], old_layout["lut"]
            )
            and not (layout["lut"][len(old_layout["lut"]):] >= 0).any()
        )
        if head_stable:
            # Head term set unchanged → tf_head differs only in the
            # changed rows' columns.
            self._scatter_cols("tf_head", r, layout["tf_head"][:, rows])
        else:
            self._dev["tf_head"] = self._place(
                layout["tf_head"], P(None, "shard")
            )

        old_rows, old_tfs = self._host_postings
        self._host_postings = (post_rows_sh, post_tfs_sh)
        if (
            not getattr(self, "_tail_diverged", False)
            and post_rows_sh.shape == old_rows.shape
            and np.array_equal(post_rows_sh, old_rows)
            and np.array_equal(post_tfs_sh, old_tfs)
        ):
            # Postings untouched (e.g. head-only content change) AND the
            # device copy never diverged through incremental
            # zeroing/overlay writes — only then may the re-place be
            # skipped (an A->B->A content cycle makes the fresh build
            # equal the stale host copy while the device differs).
            pass
        else:
            self._dev["post_rows_sh"] = self._place(
                post_rows_sh, P("shard", None)
            )
            self._dev["post_tfs_sh"] = self._place(
                post_tfs_sh, P("shard", None)
            )
            self._tail_diverged = False

    # -- SPMD scatters ---------------------------------------------------

    @staticmethod
    def _pad_updates(idx: np.ndarray, vals: np.ndarray):
        from classmate_rag_tpu.utils.numerics import pad_pow2_updates

        return pad_pow2_updates(idx, vals)

    def _scatter_rows(self, name: str, rows: np.ndarray,
                      vals: np.ndarray) -> None:
        """SPMD row scatter into a P("shard", ...) array: each shard
        applies only the updates that land in its local row range
        (out-of-range updates drop), so host→device moves O(delta)."""
        rows, vals = self._pad_updates(rows, vals)
        arr = self._dev[name]
        fn = self._scatter_fns.get(name)
        if fn is None:
            nd = arr.ndim
            tail = (None,) * (nd - 1)

            def body(a, r, v):
                n_local = a.shape[0]
                shard = jax.lax.axis_index("shard")
                local = r - shard * n_local
                oob = jnp.where(
                    (local >= 0) & (local < n_local), local, n_local
                )
                return a.at[oob].set(v.astype(a.dtype), mode="drop")

            fn = jax.jit(
                jax.shard_map(
                    body, mesh=self.mesh,
                    in_specs=(P("shard", *tail), P(None), P(None, *tail)),
                    out_specs=P("shard", *tail),
                ),
                donate_argnums=(0,),
            )
            self._scatter_fns[name] = fn
        self.bytes_placed_total += int(vals.nbytes) + int(rows.nbytes)
        self._dev[name] = fn(arr, jnp.asarray(rows), jnp.asarray(vals))

    def _scatter_cols(self, name: str, cols: np.ndarray,
                      vals: np.ndarray) -> None:
        """SPMD column scatter into a P(None, "shard") matrix (the
        term-major head matrix): vals is [C, delta]."""
        cols, vals_t = self._pad_updates(cols, np.ascontiguousarray(vals.T))
        vals = np.ascontiguousarray(vals_t.T)
        arr = self._dev[name]
        fn = self._scatter_fns.get(name)
        if fn is None:

            def body(a, c, v):
                n_local = a.shape[1]
                shard = jax.lax.axis_index("shard")
                local = c - shard * n_local
                oob = jnp.where(
                    (local >= 0) & (local < n_local), local, n_local
                )
                return a.at[:, oob].set(v.astype(a.dtype), mode="drop")

            fn = jax.jit(
                jax.shard_map(
                    body, mesh=self.mesh,
                    in_specs=(P(None, "shard"), P(None), P(None, None)),
                    out_specs=P(None, "shard"),
                ),
                donate_argnums=(0,),
            )
            self._scatter_fns[name] = fn
        self.bytes_placed_total += int(vals.nbytes) + int(cols.nbytes)
        self._dev[name] = fn(arr, jnp.asarray(cols), jnp.asarray(vals))

    def _scatter_elems(self, name: str, shard_ids: np.ndarray,
                       positions: np.ndarray, vals: np.ndarray) -> None:
        """SPMD element scatter into a P("shard", None) [S, Pmax] array:
        each shard applies only the entries whose ``shard_ids`` match its
        axis index (others drop) — the O(delta) transport for
        tail-posting zeroing and overlay-region writes. Addressed as
        (shard, local position), NOT a flattened shard*Pmax+pos index:
        the flat form exceeds int32 once total padded posting slots pass
        2^31 (~20M+ chunks), and jnp silently truncates int64 under the
        default x64-disabled config."""
        idx, vals = self._pad_updates(
            np.stack([
                np.asarray(shard_ids, np.int32),
                np.asarray(positions, np.int32),
            ], axis=1),
            vals,
        )
        arr = self._dev[name]
        fn = self._scatter_fns.get(name + "/elems")
        if fn is None:

            def body(a, sp, v):
                p_pad = a.shape[1]
                shard = jax.lax.axis_index("shard")
                mine = sp[:, 0] == shard
                oob = jnp.where(mine, sp[:, 1], p_pad)
                return a.at[0, oob].set(v.astype(a.dtype), mode="drop")

            fn = jax.jit(
                jax.shard_map(
                    body, mesh=self.mesh,
                    in_specs=(P("shard", None), P(None, None), P(None)),
                    out_specs=P("shard", None),
                ),
                donate_argnums=(0,),
            )
            self._scatter_fns[name + "/elems"] = fn
        self.bytes_placed_total += int(vals.nbytes) + int(idx.nbytes)
        self._dev[name] = fn(arr, jnp.asarray(idx), jnp.asarray(vals))

    # ------------------------------------------------------------------

    def _mask_bias_sharded(self, where: Optional[Mapping[str, Any]]):
        """Filter mask as a shard-placed bias vector (cached per filter).

        Computed HOST-side from the store's numpy columns — going through
        store._mask_bias would stage the whole corpus onto the single
        default device, defeating the sharded placement."""
        import json

        key = json.dumps(where or {}, sort_keys=True, default=str)
        with self._lock:
            cached = self._bias_cache.get(key)
            gen = self._bias_gen
        if cached is not None:
            return cached
        store = self.store
        wanted, tag_want = store.compile_filter(where)
        bias = mask_bias_host(
            store.field_cols, store.tag_bits, store.valid, wanted, tag_want
        )
        placed = self._place(bias, P("shard"))
        with self._lock:
            # Insert only if no invalidation raced the computation: a
            # bias built from pre-mutation validity poisoning the cache
            # would serve deleted rows until the NEXT metadata mutation.
            if self._bias_gen == gen:
                self._bias_cache[key] = placed
        return placed

    def _fn_for(self, knobs: Dict[str, Any], r_cap: int, vocab_pad: int,
                rescore: bool, with_df: bool = False):
        select = self.store.select_mode
        key = (
            r_cap, vocab_pad, rescore, select, with_df,
            tuple(knobs[k] for k in _KNOB_NAMES),
        )
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = make_sharded_split_hybrid_fn(
                self.mesh, r_cap=r_cap,
                vocab_pad=vocab_pad,
                with_rescore=rescore,
                rescore_pool=min(
                    self.store.rescore_pool, self.store.capacity
                ),
                select=select,
                with_df=with_df,
                **knobs,
            )
            self._fn_cache[key] = fn
        return fn

    def _df_placed_for(self, vocab_pad: int):
        """Replicated [vocab_pad+1] f32 corpus df (unfiltered-query
        statistics), cached until a mutation drains or the vocab pad
        grows. Slot vocab_pad is the padding sink (0)."""
        with self._lock:
            cached = self._df_placed
            gen = self._df_gen
            if cached is not None and cached[0] == vocab_pad:
                return cached[1]
        dfh = self.store._ensure_df_host()
        out = np.zeros(vocab_pad + 1, np.float32)
        out[: min(len(dfh), vocab_pad)] = dfh[:vocab_pad]
        placed = self._place(out, P(None))
        with self._lock:
            # Insert only if no invalidation raced the computation.
            if self._df_gen == gen:
                self._df_placed = (vocab_pad, placed)
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
            "bytes_placed_total": self.bytes_placed_total,
        }

    def query_batch(
        self,
        query_vecs,                                # [B, d] f32 (np or jax)
        query_terms_list: Sequence[Sequence[str]],
        where: Optional[Mapping[str, Any]] = None,
        **knob_overrides: Any,
    ):
        """One SPMD dispatch for the whole batch → HybridBatchResult-shaped
        ShardedHybridResult (rows/fused/vec_dist/bm25_score, replicated;
        trailing rows past the true batch are padding).

        ``knob_overrides`` (top_k, k_vector, pool, ...) override the
        constructor defaults per call — the product path passes its
        per-request k's through here; each distinct knob set compiles
        once and is cached."""
        store = self.store
        # The placed layout must cover the live store: queries pack terms
        # against store.vocab, and a stale lut/offsets after a
        # vocab-growing upsert reads out of bounds. No-op when the
        # journal is empty.
        self.ensure_fresh()
        # Coherent snapshot of the placed state: a refresh from ANOTHER
        # query thread (ensure_fresh holds _lock for its whole update)
        # must not hand this dispatch a new lut zipped with old shard
        # offsets. Mutating the STORE concurrently with queries still
        # requires the caller's reader/writer discipline (the serving
        # daemon's RW lock) — this snapshot makes query-vs-refresh safe,
        # not query-vs-mutation.
        with self._lock:
            layout = self._layout
            offsets_sh = self._offsets_sh
            d = dict(self._dev)
            vocab_pad = self._vocab_pad
            ov_global = self._ov_offsets_global
            ov_offsets_sh = self._ov_offsets_sh
        knobs = dict(self._defaults)
        for k, v in knob_overrides.items():
            if k not in self._defaults:
                raise TypeError(f"unknown query knob {k!r}")
            if v is not None:
                knobs[k] = v
        for k in ("k_vector", "k_bm25", "pool"):
            knobs[k] = min(knobs[k], store.capacity)

        bq = len(query_terms_list)
        # Pad the batch to a power of two: every distinct B is a fresh
        # (expensive, multi-device) XLA compile.
        b_pad = 1 << (bq - 1).bit_length() if bq > 1 else 1
        if isinstance(query_vecs, jnp.ndarray):
            # Device-resident handoff from the encoder: keep it on device
            # (replicating from the source chip is a device-to-device
            # broadcast, no host round trip).
            q_vecs = query_vecs.astype(jnp.float32)
            if b_pad > bq:
                q_vecs = jnp.concatenate([
                    q_vecs,
                    jnp.zeros((b_pad - bq, q_vecs.shape[1]), jnp.float32),
                ])
        else:
            q_vecs = np.asarray(query_vecs, np.float32)
            if b_pad > bq:
                q_vecs = np.concatenate([
                    q_vecs,
                    np.zeros((b_pad - bq, q_vecs.shape[1]), np.float32),
                ])
        term_lists = list(query_terms_list) + [[]] * (b_pad - bq)
        q_terms, q_counts = pack_query_terms(
            store.vocab, term_lists, self.max_query_terms
        )

        qa = split_query_arrays(
            layout["lut"], layout["offsets"], q_terms, q_counts,
            r_cap=layout["r_cap"],
            ov_offsets=ov_global,
        )
        if ov_global is not None:
            # Overlay active: per-shard windows resolve base slots from
            # the base offsets and overlay slots from the per-shard
            # overlay ranges (region starts at each shard's base end).
            u_starts_sh, u_lens_sh = shard_tail_ranges(
                offsets_sh, qa["u_tids"], r_cap=layout["r_cap"],
                u_occ=qa["u_occ"], u_ov=qa["u_ov"],
                ov_offsets_sh=ov_offsets_sh[:, : len(layout["offsets"])],
                ov_starts_sh=offsets_sh[:, -1],
            )
        else:
            u_starts_sh, u_lens_sh = shard_tail_ranges(
                offsets_sh, qa["u_tids"], r_cap=layout["r_cap"]
            )
        has_terms = np.any(q_terms >= 0, axis=1, keepdims=True)
        bias = self._mask_bias_sharded(where)
        rep1 = P(None)
        rep2 = P(None, None)
        args = [
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
        ]
        use_df = not where
        if use_df:
            args.append(self._df_placed_for(vocab_pad))
        if d.get("emb16") is not None:
            args.append(d["emb16"])
        out = self._fn_for(
            knobs, layout["r_cap"], vocab_pad,
            rescore=d.get("emb16") is not None,
            with_df=use_df,
        )(*args)
        if b_pad == bq:
            return out
        return type(out)(*(a[:bq] for a in out))
