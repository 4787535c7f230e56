"""Unified device index: one row space for dense + lexical + metadata.

The reference maintains two disconnected stores — a Chroma collection
(rag/retrieval/vector_chroma.py:81-278) and a BM25 JSONL store
(rag/retrieval/bm25.py:122-256) — joined only by chunk-id strings. Here a
single ``IndexStore`` owns the row registry; every subsystem is a column
over the same rows:

- dense: float16 host-master embedding matrix → bf16 HBM-resident slab;
- lexical: packed [N, L] unique-term/tf arrays (+ doc lengths);
- metadata: interned int columns + packed tag bits (see filters.py);
- tombstones: a validity column — deletion is real (the reference's
  ``delete_by_ids`` silently failed against Chroma, SURVEY §2.4.1) and
  ``compact()`` reclaims rows.

Device buffers are rebuilt lazily on a dirty flag and padded to slab
multiples so XLA sees few distinct shapes. Persistence: embeddings +
row registry under ``dense_dir``; text/tokens/metadata live in the JSONL
catalog (the durable source of truth, shared format with the reference).
"""

from __future__ import annotations

import json
import os
import threading
from collections import OrderedDict
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from classmate_rag_tpu.index.catalog import Catalog
from classmate_rag_tpu.index.filters import (
    FILTER_FIELDS,
    InternTable,
    TAG_WORDS,
    mask_bias_device,
)
from classmate_rag_tpu.index.lexical import device_fns, pack_tokens
from classmate_rag_tpu.metadata.validation import slug_tag, tags_from_meta

from classmate_rag_tpu.utils.numerics import NEG_INF
from classmate_rag_tpu.utils.numerics import round_up as _round_up

_ROW_SET_FN = None
_COL_SET_FN = None
_ROW_SET_BIG_FN = None
_COL_SET_BIG_FN = None

# Above this many (padded) updates the serial scan-of-DUS loop loses to
# one full-buffer scatter pass; below it, in-place DUS avoids the
# whole-buffer copy the scatter lowering performs (measured: a 1-column
# donated .at[] update on the 3.6 GB head matrix costs a full HBM
# read+write, ~37 ms).
_DUS_MAX_UPDATES = 1024

# Cap on per-journal old-content snapshots (~1 KB/row): a deployment
# whose OTHER consumer never drains (sharded-only serving never calls
# _sync_device; store-only serving never calls drain_journal) must not
# leak unbounded row copies. Beyond the cap, captures stop — consumers
# detect the absence and fall back to a full rebuild, which is what a
# cap-sized backlog warrants anyway.
_OLD_LEX_CAP = 65536
# Sentinel distinguishing "capture dropped at the cap" from "fresh slot
# with no previous content" (None) in _split_pending.
_OLD_MISSING = object()


def _pad_idx_vals(rows, vals):
    """pad_pow2_updates with the row indices cast to i32 (positions into
    single-chip arrays always fit: 2^31 posting slots would be ~10 GB of
    u8/i32 postings on one chip's 16 GB HBM before anything else)."""
    from classmate_rag_tpu.utils.numerics import pad_pow2_updates

    return pad_pow2_updates(np.asarray(rows, np.int32), vals)


def _device_row_set(arr, rows, vals):
    """Donated in-place row scatter into a resident device array — the
    O(delta) transport of the single-chip incremental sync.

    Implemented as a ``lax.scan`` of per-row ``dynamic_update_slice``
    rather than ``a.at[r].set(v)``: measured on the real chip, the
    donated scatter lowering COPIES the whole buffer (a 1-row update on
    the 3.6 GB head matrix cost ~37 ms ≈ one full HBM read+write),
    while aliased DUS on the loop carry updates in place. Duplicate
    padded indices (pad_pow2_updates repeats entry 0) write the same
    value twice — harmless for set semantics."""
    import functools

    import jax
    import jax.numpy as jnp

    global _ROW_SET_FN, _ROW_SET_BIG_FN
    rows, vals = _pad_idx_vals(rows, vals)
    if len(rows) > _DUS_MAX_UPDATES:
        if _ROW_SET_BIG_FN is None:
            @functools.partial(jax.jit, donate_argnums=(0,))
            def fb(a, r, v):
                return a.at[r].set(v.astype(a.dtype))

            _ROW_SET_BIG_FN = fb
        return _ROW_SET_BIG_FN(arr, jnp.asarray(rows), jnp.asarray(vals))
    if _ROW_SET_FN is None:
        @functools.partial(jax.jit, donate_argnums=(0,))
        def f(a, r, v):
            v = v.astype(a.dtype)

            def step(acc, rv):
                ri, vi = rv
                return jax.lax.dynamic_update_slice(
                    acc, vi[None], (ri,) + (0,) * (acc.ndim - 1)
                ), None

            a, _ = jax.lax.scan(step, a, (r, v))
            return a

        _ROW_SET_FN = f
    return _ROW_SET_FN(arr, jnp.asarray(rows), jnp.asarray(vals))


def _device_col_set(arr, cols, vals):
    """Donated in-place column scatter ([F, cap] arrays; vals [F, R]);
    scan-of-DUS for the same in-place reason as _device_row_set."""
    import functools

    import jax
    import jax.numpy as jnp

    global _COL_SET_FN, _COL_SET_BIG_FN
    cols, vals_t = _pad_idx_vals(cols, np.ascontiguousarray(
        np.asarray(vals).T
    ))
    vals = np.ascontiguousarray(vals_t.T)
    if len(cols) > _DUS_MAX_UPDATES:
        if _COL_SET_BIG_FN is None:
            @functools.partial(jax.jit, donate_argnums=(0,))
            def fb(a, c, v):
                return a.at[:, c].set(v.astype(a.dtype))

            _COL_SET_BIG_FN = fb
        return _COL_SET_BIG_FN(arr, jnp.asarray(cols), jnp.asarray(vals))
    if _COL_SET_FN is None:
        @functools.partial(jax.jit, donate_argnums=(0,))
        def f(a, c, v):
            v = v.astype(a.dtype)

            def step(acc, cv):
                ci, vi = cv
                return jax.lax.dynamic_update_slice(
                    acc, vi[:, None], (0, ci)
                ), None

            a, _ = jax.lax.scan(step, a, (c, v.T))
            return a

        _COL_SET_FN = f
    return _COL_SET_FN(arr, jnp.asarray(cols), jnp.asarray(vals))


@dataclass
class SearchResult:
    row: int
    id: str
    score: float


class IndexStore:
    """Row-unified dense + lexical + metadata index with device caching."""

    # The f16 rescore of the bf16-selected pool is measured FREE at every
    # scale (50k: ceiling 39.9k QPS with vs 39.4k without, recall
    # 0.999 -> 1.000; 1M: 3,322 vs 3,333, recall -> 1.000), so "auto"
    # now always enables it — the cost is one extra [N, d] f16 slab
    # (same bytes as the scan slab) + a pool-sized gather per batch.
    # The historical 250k threshold predated that measurement.
    # "auto" approx-selection threshold: above this many rows the TPU's
    # native PartialReduce (lax.approx_max_k) replaces exact top_k for
    # the pool selection (60 → 6.3 ms at 1M; per-element recall ≥0.999,
    # then the f16 rescore orders the pool exactly). Requires rescore.
    APPROX_MIN_ROWS = 500_000

    def __init__(
        self,
        dim: int,
        directory: str | Path = "./indexes/dense",
        slab_rows: int = 4096,
        terms_per_chunk: int = 192,
        rescore: str = "auto",          # auto | on | off
        rescore_pool: int = 32,
        select: str = "auto",           # auto | exact | approx
    ) -> None:
        self.dim = dim
        self.directory = Path(directory)
        self.slab_rows = slab_rows
        self.term_width = terms_per_chunk
        self.rescore = rescore
        self.rescore_pool = rescore_pool
        self.select = select

        self.ids: List[str] = []
        self.id_to_row: Dict[str, int] = {}
        cap = slab_rows
        self.emb = np.zeros((cap, dim), dtype=np.float16)
        self.term_ids = np.full((cap, self.term_width), -1, dtype=np.int32)
        self.tfs = np.zeros((cap, self.term_width), dtype=np.uint8)
        self.doc_len = np.zeros(cap, dtype=np.float32)
        self.valid = np.zeros(cap, dtype=bool)
        self.field_cols = np.zeros((len(FILTER_FIELDS), cap), dtype=np.int32)
        self.tag_bits = np.zeros((cap, TAG_WORDS), dtype=np.uint32)
        self.vocab: Dict[str, int] = {}
        self.interns: Dict[str, InternTable] = {f: InternTable() for f in FILTER_FIELDS}
        self.tag_slots: Dict[str, int] = {}
        # Which embedder produced the persisted vectors (runtime stamps
        # it; persisted in rows.json). Dense scores MIX FEATURE SPACES if
        # the active embedder differs — the runtime warns on mismatch
        # (hash feature-map v1->v2, or a genuine model swap without
        # `rebuild`).
        self.embedding_model: Optional[str] = None

        self._device: Dict[str, Any] = {}
        self._df_cache = None
        # Host-maintained corpus df over VALID rows (i64 [len(vocab)]),
        # the source of truth for the unfiltered BM25 statistics. Built
        # once (lazily or restored from the lexical snapshot), then
        # maintained O(delta) by upsert/delete — each row's presence
        # contribution is ±1 per distinct term. The device _df_cache is
        # just this array padded+uploaded (KBs), which removes the
        # [N, L] device histogram (~2 s at 1M rows; scatter-add runs
        # ~50x under HBM bandwidth) from the first query and from every
        # first-query-after-mutation.
        self._df_host: Optional[np.ndarray] = None
        # Per-filter subset-df LRU (filtered queries recompute df over
        # the masked subset — reference semantics,
        # rag/retrieval/bm25.py:175-212); repeated filters at 1M must
        # not re-pay the [N, L] histogram per query. Cleared on ANY
        # mutation (metadata changes move subset membership).
        self._df_filter_cache: "OrderedDict[tuple, Any]" = OrderedDict()
        self._nofilter_bias = None
        self._split: Optional[Dict[str, Any]] = None
        self._dirty = True
        # Mutation journal for the sharded serving wrapper
        # (parallel/serving.py): per-row dirty sets since the last drain,
        # so a wrapped store can re-place O(delta) instead of O(corpus).
        # epoch bumps on structural changes (capacity growth, compaction)
        # that force a full re-place. Single-consumer semantics.
        self._epoch = 0
        self._j_emb: set = set()
        self._j_lex: set = set()
        self._j_meta: set = set()
        # row -> (old term_ids, old tfs) | None (fresh slot), captured at
        # first lexical touch since the last drain (see upsert).
        self._j_old_lex: Dict[int, Any] = {}
        # The store's OWN device-sync journal (the _j_* sets above are
        # single-consumer for the sharded wrapper; these twins feed
        # _sync_device/_sync_split so the single-chip path also updates
        # O(delta) instead of re-uploading/rebuilding everything).
        self._dev_j_emb: set = set()
        self._dev_j_lex: set = set()
        self._dev_j_meta: set = set()
        self._dev_old_lex: Dict[int, Any] = {}
        self._dev_epoch = -1
        # Lexical rows awaiting split-structure maintenance (consumed by
        # _sync_split; _sync_device stashes them because the split state
        # is built lazily and may not exist yet).
        self._split_pending: Dict[int, Any] = {}
        # Incremental device sync is NOT idempotent (donated in-place
        # scatters + journal consumption): two reader threads noticing
        # _dirty concurrently must serialize through here. RLock —
        # _sync_split re-enters via _sync_device.
        self._sync_lock = threading.RLock()
        # Observability: how often the O(corpus) paths ran (tests pin
        # that small deltas do NOT grow these past the initial build).
        self.device_full_uploads = 0
        self.split_full_builds = 0
        self.split_snapshot_restores = 0
        self.df_full_builds = 0
        # v2 snapshot adoption state: the persisted split-BM25 layout
        # (host mmaps, consumed once by _sync_split_locked) and the
        # rows the persisted deltas touched since that layout was built
        # (row -> pre-delta (term_ids, tfs) | None for fresh slots),
        # applied through the same O(delta) planner as live mutations.
        self._split_persisted: Optional[Dict[str, Any]] = None
        self._split_load_pending: Dict[int, Any] = {}
        # Persistence delta tracking (independent of the sharded journal,
        # which is drained by its own consumer): rows touched since the
        # last save, cleared only by save(). With a persisted base, save()
        # appends one small lexical.delta_NNNN.npz per persist instead of
        # rewriting the multi-GB base at serving scale.
        self._dirty_rows: set = set()
        self._persist_fp: Optional[str] = None  # catalog fp chain head
        # Fingerprint RECORDED in the snapshot that load adopted (may be
        # the pre-fold fp accepted via the catalog's fold alias): the
        # next delta must chain from what is ON DISK, not from the live
        # fp, or the following load rejects the whole persisted chain.
        self._snap_fp: Optional[str] = None
        self._persist_vocab = 0  # vocab size at last persist (delta base)
        self._delta_seq = 0
        self._need_full_save = False
        # Native batch packer (C++ interner); created lazily. Once the
        # Python fallback interns anything the native side doesn't know,
        # native packing disables permanently for this store (the two
        # interners must stay id-identical).
        self._packer = None
        self._packer_ok = True

    # ------------------------------------------------------------------
    # Capacity / registry
    # ------------------------------------------------------------------

    @property
    def capacity(self) -> int:
        return self.emb.shape[0]

    def __len__(self) -> int:
        return int(self.valid.sum())

    @property
    def n_rows(self) -> int:
        return len(self.ids)

    def _grow_to(self, rows: int) -> None:
        if rows <= self.capacity:
            return
        # Geometric growth (≥2x) so a large ingest costs O(N) copying, not
        # O(N²/slab); still slab-aligned for stable device shapes.
        new_cap = _round_up(max(rows, 2 * self.capacity), self.slab_rows)
        self._epoch += 1  # shape change: sharded wrappers must re-place
        # A persisted split layout is column-sized to the OLD capacity.
        self._split_persisted = None
        self._split_load_pending.clear()

        def grow(arr: np.ndarray, fill=0) -> np.ndarray:
            shape = (new_cap,) + arr.shape[1:]
            out = np.full(shape, fill, dtype=arr.dtype)
            out[: arr.shape[0]] = arr
            return out

        self.emb = grow(self.emb)
        self.term_ids = grow(self.term_ids, -1)
        self.tfs = grow(self.tfs)
        self.doc_len = grow(self.doc_len)
        self.valid = grow(self.valid, False)
        self.tag_bits = grow(self.tag_bits)
        new_fields = np.zeros((len(FILTER_FIELDS), new_cap), dtype=np.int32)
        new_fields[:, : self.field_cols.shape[1]] = self.field_cols
        self.field_cols = new_fields

    def _row_for(self, cid: str) -> int:
        row = self.id_to_row.get(cid)
        if row is None:
            row = len(self.ids)
            self.ids.append(cid)
            self.id_to_row[cid] = row
            self._grow_to(row + 1)
        return row

    # ------------------------------------------------------------------
    # Mutation
    # ------------------------------------------------------------------

    def _pack_rows(self, tokens_list: Sequence[Sequence[str]]):
        """Batch (term_ids [B, W] i32, tfs [B, W] u8, doc_len [B] f32) —
        the C++ batch packer when available (bit-identical interning
        order, ~10x the Python loop), else pack_tokens per row."""
        if self._packer_ok and self._packer is None:
            from classmate_rag_tpu.native import make_native_packer

            self._packer = make_native_packer()
            if self._packer is None:
                self._packer_ok = False
            elif self.vocab and not self._packer.import_vocab(self.vocab):
                # Fresh packer + pre-existing vocab (snapshot restore):
                # seed the native interner; on failure stay Python.
                self._packer_ok = False
        if (
            self._packer_ok
            and len(self.vocab) == self._packer.vocab_size()
        ):
            out = self._packer.pack_batch(
                tokens_list, self.vocab, self.term_width
            )
            if out is not None:
                return out
            self._packer_ok = False  # separator-bearing tokens: stay Python
        b = len(tokens_list)
        term_ids = np.empty((b, self.term_width), dtype=np.int32)
        tfs = np.empty((b, self.term_width), dtype=np.uint8)
        doc_len = np.empty(b, dtype=np.float32)
        for i, tokens in enumerate(tokens_list):
            term_ids[i], tfs[i], doc_len[i] = pack_tokens(
                tokens, self.vocab, self.term_width
            )
        return term_ids, tfs, doc_len

    # -- corpus-df maintenance (host source of truth) -------------------

    def _df_note(self, tids: np.ndarray, tfs: np.ndarray,
                 delta: int) -> None:
        """Apply ONE row's presence contribution (±1 per distinct live
        term) to the host df. Packed rows hold unique terms, so fancy
        indexing (no np.add.at) is exact."""
        live = (tids >= 0) & (tfs > 0)
        t = tids[live]
        if not len(t):
            return
        hi = int(t.max()) + 1
        if hi > len(self._df_host):
            self._df_host = np.concatenate([
                self._df_host, np.zeros(hi - len(self._df_host), np.int64)
            ])
        self._df_host[t] += delta

    def _df_invalidate(self) -> None:
        self._df_cache = None
        self._df_filter_cache.clear()

    def _ensure_df_host(self) -> np.ndarray:
        """Build (or extend) the host df over valid rows. The one-time
        build is a chunked bincount over the packed term matrix — host
        work, done once per process unless restored from the snapshot."""
        if self._df_host is None:
            self.df_full_builds += 1
            nv = max(len(self.vocab), 1)
            df = np.zeros(nv, np.int64)
            n = self.n_rows
            step = 65536
            for s in range(0, n, step):
                e = min(s + step, n)
                ids = self.term_ids[s:e]
                live = (
                    (ids >= 0) & (self.tfs[s:e] > 0)
                    & self.valid[s:e, None]
                )
                sel = ids[live]
                if len(sel):
                    df += np.bincount(sel, minlength=nv)
            self._df_host = df
        elif len(self._df_host) < len(self.vocab):
            self._df_host = np.concatenate([
                self._df_host,
                np.zeros(len(self.vocab) - len(self._df_host), np.int64),
            ])
        return self._df_host

    def _df_device(self, vpad: int):
        """Unfiltered-corpus df as the device [vpad+1] f32 vector the
        Okapi scorers take — a KB-scale upload of the host-maintained
        counts (slot vpad is the padding sink, kept 0)."""
        import jax.numpy as jnp

        if self._df_cache is None or self._df_cache.shape[0] != vpad + 1:
            dfh = self._ensure_df_host()
            out = np.zeros(vpad + 1, np.float32)
            out[: min(len(dfh), vpad)] = dfh[:vpad]
            self._df_cache = jnp.asarray(out)
        return self._df_cache

    def _df_for_where(self, where, bias, vpad: int):
        """Subset df for a filtered query (device histogram over the
        masked rows — the reference's rebuild-on-subset semantics), with
        a small per-filter LRU so repeated filters don't re-pay the
        [N, L] pass at serving scale; unfiltered queries take the
        host-maintained corpus df."""
        if not where:
            return self._df_device(vpad)
        wanted, tag_want = self.compile_filter(where)
        key = (wanted.tobytes(), tag_want.tobytes(), vpad)
        hit = self._df_filter_cache.get(key)
        if hit is not None:
            self._df_filter_cache.move_to_end(key)
            return hit
        subset_df, _ = device_fns()
        dev = self._sync_device()
        df = subset_df(dev["term_ids"], dev["tfs"], bias == 0.0, vpad)
        self._df_filter_cache[key] = df
        while len(self._df_filter_cache) > 8:
            self._df_filter_cache.popitem(last=False)
        return df

    def upsert(
        self,
        ids: Sequence[str],
        embeddings: np.ndarray,
        tokens_list: Sequence[Sequence[str]],
        metadatas: Sequence[Mapping[str, Any]],
    ) -> int:
        """Idempotent upsert of aligned (id, embedding, tokens, metadata)."""
        if not (len(ids) == len(embeddings) == len(tokens_list) == len(metadatas)):
            raise ValueError("ids/embeddings/tokens/metadatas length mismatch")
        t_ids_b, t_tfs_b, dl_b = self._pack_rows(tokens_list)
        for i, cid in enumerate(ids):
            fresh = cid not in self.id_to_row
            row = self._row_for(cid)
            emb_new = embeddings[i].astype(np.float16)
            # Journal what actually changed (fresh rows change everything;
            # idempotent re-upserts of identical content journal nothing)
            # so a sharded wrapper re-places only the delta.
            if fresh or not np.array_equal(self.emb[row], emb_new):
                self._j_emb.add(row)
                self._dev_j_emb.add(row)
                self._dirty_rows.add(row)
            if fresh or not (
                np.array_equal(self.term_ids[row], t_ids_b[i])
                and np.array_equal(self.tfs[row], t_tfs_b[i])
                and self.doc_len[row] == dl_b[i]
            ):
                # First-touch snapshot of the row's PRE-mutation lexical
                # content (None = fresh slot, no previous content): the
                # O(delta) tail-posting planner needs the old terms to
                # neutralize their base/overlay entries. ~1 KB/row,
                # cleared on drain. Two independent consumers (the
                # sharded wrapper and the store's own device sync) each
                # get their own copy.
                old = (
                    None if fresh else (
                        self.term_ids[row].copy(), self.tfs[row].copy()
                    )
                )
                if (
                    row not in self._j_old_lex
                    and len(self._j_old_lex) < _OLD_LEX_CAP
                ):
                    self._j_old_lex[row] = old
                if (
                    row not in self._dev_j_lex
                    and len(self._dev_old_lex) < _OLD_LEX_CAP
                ):
                    self._dev_old_lex[row] = old
                self._j_lex.add(row)
                self._dev_j_lex.add(row)
                self._dirty_rows.add(row)
                lex_changed = True
            else:
                lex_changed = False
            # O(delta) corpus-df maintenance: subtract the row's old
            # contribution (when it was live), add the new — BEFORE the
            # overwrites below. Lazy until first built/restored.
            if self._df_host is not None and (
                lex_changed or not self.valid[row]
            ):
                if not fresh and self.valid[row]:
                    self._df_note(self.term_ids[row], self.tfs[row], -1)
                self._df_note(t_ids_b[i], t_tfs_b[i], +1)
                self._df_cache = None
            self.emb[row] = emb_new
            self.term_ids[row] = t_ids_b[i]
            self.tfs[row] = t_tfs_b[i]
            self.doc_len[row] = dl_b[i]
            meta_changed = fresh or not self.valid[row]
            fields, bits = self._pack_row_metadata(metadatas[i] or {})
            meta_changed |= not np.array_equal(self.field_cols[:, row], fields)
            self.field_cols[:, row] = fields
            meta_changed |= not np.array_equal(self.tag_bits[row], bits)
            self.tag_bits[row] = bits
            self.valid[row] = True
            if meta_changed:
                self._j_meta.add(row)
                self._dev_j_meta.add(row)
                self._dirty_rows.add(row)
        # Any mutation moves filtered-subset membership (metadata,
        # validity or content): drop the per-filter df cache wholesale.
        self._df_filter_cache.clear()
        self._dirty = True
        return len(ids)

    def _pack_row_metadata(self, meta: Mapping[str, Any]):
        """Interned filter-field ids [F] + packed tag bitmask [W] for one
        row — the SINGLE definition of metadata→columns semantics (upsert
        and the catalog cold rebuild must never drift apart, or a
        restored store would filter differently from a freshly built
        one). ``tags_from_meta`` reads the reference-shaped ``tag_<slug>``
        flags AND legacy tags lists (pre-alignment catalogs)."""
        fields = np.empty(len(FILTER_FIELDS), np.int32)
        for j, f in enumerate(FILTER_FIELDS):
            v = meta.get(f)
            fields[j] = self.interns[f].intern(
                str(v) if v is not None else None
            )
        bits = np.zeros(TAG_WORDS, dtype=np.uint32)
        for slug in tags_from_meta(meta):
            slot = self.tag_slots.setdefault(slug, len(self.tag_slots))
            if slot < TAG_WORDS * 32:
                bits[slot // 32] |= np.uint32(1 << (slot % 32))
        return fields, bits

    def delete(self, ids: Sequence[str]) -> int:
        """Tombstone rows; really removes them from every search path."""
        n = 0
        for cid in ids:
            row = self.id_to_row.get(cid)
            if row is not None and self.valid[row]:
                if self._df_host is not None:
                    self._df_note(self.term_ids[row], self.tfs[row], -1)
                self.valid[row] = False
                self._j_meta.add(row)
                self._dev_j_meta.add(row)
                self._dirty_rows.add(row)
                n += 1
        if n:
            self._dirty = True
            self._df_invalidate()
        return n

    def compact(self) -> int:
        """Drop tombstoned rows and re-pack; returns rows reclaimed."""
        keep = [r for r in range(self.n_rows) if self.valid[r]]
        reclaimed = self.n_rows - len(keep)
        if reclaimed == 0:
            return 0
        sel = np.asarray(keep, dtype=np.int64)
        self.ids = [self.ids[r] for r in keep]
        self.id_to_row = {cid: i for i, cid in enumerate(self.ids)}
        cap = _round_up(max(len(keep), 1), self.slab_rows)

        def take(arr: np.ndarray, fill=0) -> np.ndarray:
            out = np.full((cap,) + arr.shape[1:], fill, dtype=arr.dtype)
            if len(sel):
                out[: len(sel)] = arr[sel]
            return out

        self.emb = take(self.emb)
        self.term_ids = take(self.term_ids, -1)
        self.tfs = take(self.tfs)
        self.doc_len = take(self.doc_len)
        self.tag_bits = take(self.tag_bits)
        new_valid = np.zeros(cap, dtype=bool)
        new_valid[: len(sel)] = True
        self.valid = new_valid
        new_fields = np.zeros((len(FILTER_FIELDS), cap), dtype=np.int32)
        if len(sel):
            new_fields[:, : len(sel)] = self.field_cols[:, sel]
        self.field_cols = new_fields
        self._dirty = True
        # Row identities moved: incremental deltas are meaningless now.
        self._epoch += 1
        self._j_emb.clear()
        self._j_lex.clear()
        self._j_meta.clear()
        self._j_old_lex.clear()
        self._dev_j_emb.clear()
        self._dev_j_lex.clear()
        self._dev_j_meta.clear()
        self._dev_old_lex.clear()
        self._split_pending.clear()
        self._split_persisted = None   # row identities moved
        self._split_load_pending.clear()
        self._dirty_rows.clear()
        self._need_full_save = True
        return reclaimed

    def drain_journal(self):
        """Consume the mutation journal: returns (epoch, emb_rows,
        lex_rows, meta_rows, old_lex) and clears the dirty sets.
        ``old_lex`` maps each lex row to its pre-mutation
        (term_ids, tfs) — None for fresh slots — for the O(delta)
        tail-posting planner. Epoch is NOT reset — consumers compare it
        against the epoch they placed at; a mismatch means structure
        changed and a full re-place is due. Single-consumer semantics
        (the sharded serving wrapper)."""
        out = (
            self._epoch, self._j_emb, self._j_lex, self._j_meta,
            self._j_old_lex,
        )
        self._j_emb, self._j_lex, self._j_meta = set(), set(), set()
        self._j_old_lex = {}
        return out

    # ------------------------------------------------------------------
    # Device state
    # ------------------------------------------------------------------

    @property
    def rescore_enabled(self) -> bool:
        """f16 rescore of the dense top pool (measured free; class
        comment above) — "auto" always enables it."""
        return self.rescore != "off"

    @property
    def select_mode(self) -> str:
        """Pool-selection op: "approx" (TPU PartialReduce) or "exact".

        Auto gates on the rescore being active (approx selection without
        the exact pool re-sort would perturb tie-breaks) and serving
        scale; forced "approx" still requires rescore."""
        if self.select == "exact":
            return "exact"
        if not self.rescore_enabled:
            return "exact"
        if self.select == "approx":
            return "approx"
        return (
            "approx" if self.capacity >= self.APPROX_MIN_ROWS else "exact"
        )

    def _sync_device(self) -> Dict[str, Any]:
        if not self._dirty and self._device:
            return self._device
        with self._sync_lock:
            return self._sync_device_locked()

    def _sync_device_locked(self) -> Dict[str, Any]:
        if not self._dirty and self._device:
            return self._device  # another reader synced while we waited
        import jax.numpy as jnp

        dirty = self._dev_j_emb | self._dev_j_lex | self._dev_j_meta
        structural = (
            not self._device
            or self._dev_epoch != self._epoch
            or self._device["emb"].shape[0] != self.capacity
            or len(dirty) * 4 > max(self.n_rows, 1)
        )
        if structural:
            if self.rescore_enabled:
                # ONE f16 upload; the bf16 scan slab derives on-device
                # (halves the host->device bytes of a cold start — the
                # dominant first-ask cost at 1M over the remote link).
                import functools

                import jax

                emb16 = jnp.asarray(self.emb)
                emb_bf = jax.jit(
                    functools.partial(jnp.asarray, dtype=jnp.bfloat16)
                )(emb16)
            else:
                emb16 = None
                emb_bf = jnp.asarray(self.emb, dtype=jnp.bfloat16)
            if self._split_persisted is not None:
                # Mutations journaled before the first device sync must
                # reach the persisted-split restore path: stash their
                # pre-mutation content with the load-pending rows (the
                # structural upload consumes the journals below). Rows
                # drained by EARLIER incremental syncs live only in
                # _split_pending (the split was never built yet) — fold
                # them in first: for a twice-mutated row its capture is
                # the older, persisted-base-relative content.
                for r, old in self._split_pending.items():
                    if r not in self._split_load_pending:
                        self._split_load_pending[r] = old
                for r in self._dev_j_lex:
                    if r not in self._split_load_pending:
                        self._split_load_pending[r] = (
                            self._dev_old_lex.get(r, _OLD_MISSING)
                        )
            self._device = {
                "emb": emb_bf,
                # f16 storage master on device when rescoring: the bf16
                # slab feeds the MXU scan, this one re-scores the top
                # pool exactly.
                "emb16": emb16,
                "term_ids": jnp.asarray(self.term_ids),
                "tfs": jnp.asarray(self.tfs),
                "doc_len": jnp.asarray(self.doc_len),
                "valid": jnp.asarray(self.valid),
                "field_cols": jnp.asarray(self.field_cols),
                "tag_bits": jnp.asarray(self.tag_bits),
            }
            self._dev_epoch = self._epoch
            self.device_full_uploads += 1
            self._dev_j_emb.clear()
            self._dev_j_lex.clear()
            self._dev_j_meta.clear()
            self._dev_old_lex.clear()
            self._df_cache = None
            self._df_filter_cache.clear()
            self._nofilter_bias = None
            self._split = None
            self._split_pending.clear()
            self._dirty = False
            return self._device

        # Incremental: scatter only the touched rows into the resident
        # device arrays (donated .at[] updates — no O(corpus) re-upload
        # for a small delta; the round-3 behavior re-shipped the whole
        # multi-GB slab set on ANY mutation).
        d = self._device
        if self._dev_j_emb:
            rows = sorted(self._dev_j_emb)
            vals = self.emb[rows]
            d["emb"] = _device_row_set(d["emb"], rows, vals)
            if d["emb16"] is not None:
                d["emb16"] = _device_row_set(d["emb16"], rows, vals)
        if self._dev_j_lex:
            rows = sorted(self._dev_j_lex)
            d["term_ids"] = _device_row_set(
                d["term_ids"], rows, self.term_ids[rows]
            )
            d["tfs"] = _device_row_set(d["tfs"], rows, self.tfs[rows])
            d["doc_len"] = _device_row_set(
                d["doc_len"], rows, self.doc_len[rows]
            )
            self._df_filter_cache.clear()
            # NOTE: _df_cache is NOT dropped here — upsert/delete
            # maintain the host df (and its device upload) O(delta);
            # direct column writes (load-time rebuild) happen before any
            # df exists.
            # Stash for the lazily-maintained split structures.
            for r in rows:
                if r not in self._split_pending:
                    # _OLD_MISSING (capture dropped at _OLD_LEX_CAP) must
                    # not read as None (= fresh slot, nothing to
                    # neutralize): it forces the full-rebuild fallback.
                    self._split_pending[r] = self._dev_old_lex.get(
                        r, _OLD_MISSING
                    )
        if self._dev_j_meta or self._dev_j_lex:
            rows = sorted(self._dev_j_meta | self._dev_j_lex)
            d["valid"] = _device_row_set(d["valid"], rows, self.valid[rows])
            d["field_cols"] = _device_col_set(
                d["field_cols"], rows, self.field_cols[:, rows]
            )
            d["tag_bits"] = _device_row_set(
                d["tag_bits"], rows, self.tag_bits[rows]
            )
            self._df_filter_cache.clear()  # subset membership moved
            self._nofilter_bias = None
        self._dev_j_emb.clear()
        self._dev_j_lex.clear()
        self._dev_j_meta.clear()
        self._dev_old_lex.clear()
        self._dirty = False
        return self._device

    # -- split-frequency BM25 structures ---------------------------------

    HEAD_DF_THRESHOLD = 256    # tail posting lists stay ≲ this long
    # Head capacity adapts to cover every term above the threshold, within
    # this device-memory budget for the [C, N] u8 head matrix (per-batch
    # compute only touches the batch's own head terms, so a large C costs
    # memory, not time). 3.5 GB: at 1M chunks a zipf-realistic vocabulary
    # has ~3k terms above the df threshold; the old 2 GB budget pushed
    # ~1k of them into segmented tail postings, whose per-batch [N, T]
    # construction dominated the fused step (~46 ms of 92.5 at 1M). The
    # budget only materializes when BOTH the corpus and the qualifying
    # term count are large (C = min(budget // capacity, #terms with
    # df > threshold)) — small corpora see no change.
    HEAD_BYTES_BUDGET = 3584 << 20

    def _sync_split(self) -> Dict[str, Any]:
        """Head/tail BM25 layout (see lexical._bm25_split_fns), built
        lazily alongside the device arrays and maintained O(delta)
        between structural changes: small lexical deltas update the
        resident split state through the frozen-head + tail-overlay
        planner (lexical.plan_tail_delta) instead of re-running the
        O(N·L) layout build — the same machinery as the sharded
        engine's incremental refresh."""
        with self._sync_lock:
            return self._sync_split_locked()

    def _sync_split_locked(self) -> Dict[str, Any]:
        self._sync_device_locked()
        if self._split is not None:
            if not self._split_pending:
                return self._split
            if self._try_split_incremental():
                self._split_pending.clear()
                return self._split
        import jax.numpy as jnp

        if self._split is None and self._split_persisted is not None:
            # v2 snapshot restore: place the persisted layout (one
            # upload straight from the mmaps) and run the rows the
            # persisted deltas / pre-sync mutations touched through the
            # same O(delta) planner as live mutations — no O(N·L)
            # rebuild on this host's single core.
            sp, self._split_persisted = self._split_persisted, None
            self._split = {
                "lut": sp["lut"],
                "offsets": sp["offsets"],
                "r_cap": sp["r_cap"],
                "tf_head": jnp.asarray(sp["tf_head"]),
                "post_rows": jnp.asarray(sp["post_rows"]),
                "post_tfs": jnp.asarray(sp["post_tfs"]),
                "p_base": sp["p_base"],
                "post_rows_host": sp["post_rows"],
                "overlay": {},
                "ov_offsets": None,
                "ov_prev": (np.zeros(0, np.int32), np.zeros(0, np.uint8)),
            }
            self.split_snapshot_restores += 1
            # Earliest capture wins: load-pending rows were snapshotted
            # at the persisted BASE state, before any live mutation.
            self._split_pending.update(self._split_load_pending)
            self._split_load_pending = {}
            if not self._split_pending:
                return self._split
            if self._try_split_incremental():
                self._split_pending.clear()
                return self._split
            self._split = None  # infeasible: fall through to full build

        from classmate_rag_tpu.index.lexical import build_split_layout

        self._split_pending.clear()
        self.split_full_builds += 1
        layout = build_split_layout(
            self.term_ids, self.tfs, len(self.vocab),
            head_bytes_budget=self.HEAD_BYTES_BUDGET,
            head_df_threshold=self.HEAD_DF_THRESHOLD,
            reserve=max(4096, int(self.n_rows) * 4),
        )
        if layout["n_overflow"] > 0:
            # Self-sized: the head byte budget holds the corpus's
            # heaviest terms and the effective df cut rose accordingly
            # (every term above the DERIVED threshold is in the head by
            # construction; the rest are segmented tail postings with
            # r_cap capped at TAIL_SEG_CAP). Informational, not an error
            # — the cut adapts to the df spectrum at pack time.
            import logging

            logging.getLogger(__name__).info(
                "BM25 head self-sized: df threshold %d -> %d for this "
                "corpus (%d qualifying terms beyond the %d-slot head go "
                "to segmented tail postings).",
                self.HEAD_DF_THRESHOLD, layout["df_threshold"],
                layout["n_overflow"],
                int(self.HEAD_BYTES_BUDGET // max(self.capacity, 1)),
            )
        self._split = {
            "lut": layout["lut"],
            "offsets": layout["offsets"],
            "r_cap": layout["r_cap"],
            "tf_head": jnp.asarray(layout["tf_head"]),
            "post_rows": jnp.asarray(layout["post_rows"]),
            "post_tfs": jnp.asarray(layout["post_tfs"]),
            # O(delta) maintenance state (see _try_split_incremental):
            # host copy of the base posting rows for neutralization
            # searches, the frozen-head overlay bookkeeping, and how much
            # of the reserve region currently holds data.
            "p_base": layout["p_base"],
            "post_rows_host": layout["post_rows"],
            "overlay": {},
            "ov_offsets": None,
            "ov_prev": (np.zeros(0, np.int32), np.zeros(0, np.uint8)),
        }
        return self._split

    def _try_split_incremental(self) -> bool:
        """Apply ``_split_pending`` to the resident split state O(delta);
        False → the caller falls back to the full layout rebuild."""
        from classmate_rag_tpu.index.lexical import (
            head_tf_columns, overlay_diff_span, plan_tail_delta,
        )

        split = self._split
        n_vocab = len(self.vocab)
        lut = split["lut"]
        offsets = split["offsets"]
        if n_vocab > len(lut):
            # Vocab grew: new terms are tail-by-construction.
            lut = np.concatenate(
                [lut, np.full(n_vocab - len(lut), -1, np.int32)]
            )
            offsets = np.concatenate([
                offsets,
                np.full(n_vocab + 1 - len(offsets), offsets[-1], np.int64),
            ])
        rows = sorted(self._split_pending)
        if any(self._split_pending[r] is _OLD_MISSING for r in rows):
            return False  # uncaptured mutation (cap): rebuild
        changes = [
            (r, self._split_pending[r], (self.term_ids[r], self.tfs[r]))
            for r in rows
        ]
        room = (
            len(split["post_rows_host"]) - split["p_base"] - split["r_cap"]
        )
        plan = plan_tail_delta(
            lut, offsets, split["post_rows_host"], split["overlay"],
            changes, reserve=room, n_vocab=n_vocab,
        )
        if plan is None:
            return False
        c_pad = split["tf_head"].shape[0]
        cols = head_tf_columns(
            lut, c_pad, self.term_ids[rows], self.tfs[rows]
        )
        split["tf_head"] = _device_col_set(split["tf_head"], rows, cols)
        if len(plan["zero_pos"]):
            split["post_tfs"] = _device_row_set(
                split["post_tfs"], plan["zero_pos"],
                np.zeros(len(plan["zero_pos"]), np.uint8),
            )
        # Write only the DIFF SPAN against the previous serialization
        # (zero-padded comparison clears a shrunken overlay's stale tail)
        # — re-shipping the full region made steady-state 1-row ingests
        # cost O(overlay) once the region filled up.
        lo, hi = overlay_diff_span(
            plan["ov_rows"], plan["ov_tfs"], split["ov_prev"]
        )
        if hi > lo:
            pos = split["p_base"] + np.arange(lo, hi)
            n_new = len(plan["ov_rows"])
            rows_pad = np.zeros(hi, np.int32)
            tfs_pad = np.zeros(hi, np.uint8)
            rows_pad[: min(n_new, hi)] = plan["ov_rows"][:hi]
            tfs_pad[: min(n_new, hi)] = plan["ov_tfs"][:hi]
            split["post_rows"] = _device_row_set(
                split["post_rows"], pos, rows_pad[lo:hi]
            )
            split["post_tfs"] = _device_row_set(
                split["post_tfs"], pos, tfs_pad[lo:hi]
            )
        split["ov_prev"] = (plan["ov_rows"], plan["ov_tfs"])
        split["ov_offsets"] = (
            plan["ov_offsets"] if int(plan["ov_offsets"][-1]) else None
        )
        split["lut"] = lut
        split["offsets"] = offsets
        return True

    def _split_query_arrays(self, q_tids: np.ndarray, q_counts: np.ndarray):
        """Map [B, M] query term ids onto the batch's distinct head-term
        union and tail segment table (see lexical._bm25_split_fns)."""
        from classmate_rag_tpu.index.lexical import split_query_arrays

        split = self._sync_split()
        return split_query_arrays(
            split["lut"], split["offsets"], q_tids, q_counts,
            r_cap=split["r_cap"],
            ov_offsets=split["ov_offsets"],
            ov_start=split["p_base"],
        )

    @property
    def vocab_pad(self) -> int:
        return _round_up(max(len(self.vocab), 1), 4096)

    def compile_filter(
        self, where: Optional[Mapping[str, Any]]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Filter dict → (wanted i32 [F], tag_want u32 [W]) — the interned
        predicate shared by the device and host mask evaluators. Sentinels
        never narrow; unsatisfiable tags set the -2 impossible marker."""
        wanted = np.full(len(FILTER_FIELDS), -1, dtype=np.int32)
        tag_want = np.zeros(TAG_WORDS, dtype=np.uint32)
        satisfiable = True
        if where:
            for j, f in enumerate(FILTER_FIELDS):
                v = where.get(f)
                if v is None:
                    continue
                s = str(v).strip()
                # BOTH sentinels pass through unfiltered here, not just
                # in schema._strip_sentinels: callers of the raw store /
                # sharded APIs hand in plain dicts, and "auto" was never
                # interned at ingest (to_dict strips it), so looking it
                # up would set the impossible marker and drop every row.
                if (
                    not s
                    or (f == "doc_type" and s.lower() == "other")
                    or (f == "language" and s.lower() == "auto")
                ):
                    continue
                wanted[j] = self.interns[f].lookup(s)
            tags = where.get("tags")
            if isinstance(tags, Mapping) and "$contains" in tags:
                tags = tags["$contains"]
            if isinstance(tags, str):
                tags = [t.strip() for t in tags.split(",") if t.strip()]
            for tag in tags or []:
                slug = slug_tag(str(tag))
                if not slug:
                    continue
                slot = self.tag_slots.get(slug)
                if slot is None or slot >= TAG_WORDS * 32:
                    satisfiable = False
                else:
                    tag_want[slot // 32] |= np.uint32(1 << (slot % 32))
        if not satisfiable:
            wanted[0] = -2  # impossible marker understood by the mask fns
        return wanted, tag_want

    def _mask_bias(self, where: Optional[Mapping[str, Any]]):
        import jax.numpy as jnp

        dev = self._sync_device()
        if not where:
            # Hot path: no filter → validity-only bias, cached on device.
            if self._nofilter_bias is None:
                self._nofilter_bias = mask_bias_device(
                    dev["field_cols"], dev["tag_bits"], dev["valid"],
                    jnp.full(len(FILTER_FIELDS), -1, jnp.int32),
                    jnp.zeros(TAG_WORDS, jnp.uint32),
                )
            return self._nofilter_bias
        wanted, tag_want = self.compile_filter(where)
        return mask_bias_device(
            dev["field_cols"], dev["tag_bits"], dev["valid"],
            jnp.asarray(wanted), jnp.asarray(tag_want),
        )

    # ------------------------------------------------------------------
    # Search
    # ------------------------------------------------------------------

    def dense_topk(
        self,
        query_vecs: np.ndarray,          # [Q, d] f32 (L2-normalized)
        where: Optional[Mapping[str, Any]] = None,
        k: int = 8,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact masked scan → (scores [Q, k], rows [Q, k]; -1 past end)."""
        from classmate_rag_tpu.ops.topk import masked_topk
        import jax.numpy as jnp

        dev = self._sync_device()
        bias = self._mask_bias(where)
        k_eff = min(k, self.capacity)
        vals, rows = masked_topk(dev["emb"], jnp.asarray(query_vecs), bias, k_eff)
        vals_np = np.asarray(vals)
        rows_np = np.asarray(rows)
        rows_np = np.where(vals_np <= NEG_INF / 2, -1, rows_np)
        return vals_np, rows_np

    def bm25_topk(
        self,
        query_terms: Sequence[str],
        where: Optional[Mapping[str, Any]] = None,
        k: int = 8,
        max_query_terms: int = 32,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Subset-statistics BM25 → (scores [k], rows [k]; -1 past end)."""
        import jax.numpy as jnp

        dev = self._sync_device()
        bias = self._mask_bias(where)
        vpad = self.vocab_pad
        df = self._df_for_where(
            where if (where and len(where)) else None, bias, vpad
        )

        from classmate_rag_tpu.index.lexical import (
            pack_query_terms, split_fns,
        )

        q_terms, q_counts = pack_query_terms(
            self.vocab, [query_terms], max_query_terms
        )

        split = self._sync_split()
        qa = self._split_query_arrays(q_terms, q_counts)
        _scores, split_topk = split_fns()
        k_eff = min(k, self.capacity)
        vals, rows = split_topk(
            split["tf_head"], split["post_rows"], split["post_tfs"],
            dev["doc_len"], bias, df,
            jnp.asarray(qa["h_slots"]), jnp.asarray(qa["h_tids"]),
            jnp.asarray(qa["u_starts"]), jnp.asarray(qa["u_lens"]),
            jnp.asarray(qa["u_cols"]), jnp.asarray(qa["t_tids"]),
            jnp.asarray(q_terms), jnp.asarray(q_counts),
            vocab_pad=vpad, r_cap=split["r_cap"], top_k=k_eff,
        )
        vals_np = np.asarray(vals)[0]
        rows_np = np.asarray(rows)[0]
        rows_np = np.where(vals_np <= NEG_INF / 2, -1, rows_np)
        return vals_np, rows_np

    def hybrid_topk_batch(
        self,
        query_vecs: np.ndarray,                  # [B, d] f32
        query_terms_list: Sequence[Sequence[str]],
        where: Optional[Mapping[str, Any]] = None,
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
    ):
        """Fused batched hybrid query: ONE device dispatch for the batch.

        Returns the HybridBatchResult of ops/hybrid_step.py (host numpy
        conversion left to the caller so serving loops can stay on device).
        """
        import jax.numpy as jnp

        from classmate_rag_tpu.ops.hybrid_step import (
            hybrid_query_step_split_packed,
            pack_query_arrays,
        )

        dev = self._sync_device()
        bias = self._mask_bias(where)
        vpad = self.vocab_pad
        df = self._df_for_where(where, bias, vpad)

        from classmate_rag_tpu.index.lexical import pack_query_terms

        q_terms, q_counts = pack_query_terms(
            self.vocab, query_terms_list, max_query_terms
        )

        split = self._sync_split()
        qa = self._split_query_arrays(q_terms, q_counts)
        has_terms = np.any(q_terms >= 0, axis=1, keepdims=True)
        packed, statics = pack_query_arrays(qa, q_terms, q_counts, has_terms)
        return hybrid_query_step_split_packed(
            dev["emb"], split["tf_head"], split["post_rows"],
            split["post_tfs"], dev["doc_len"], df, bias,
            jnp.asarray(query_vecs, jnp.float32),
            jnp.asarray(packed),
            dev["emb16"],
            dev["term_ids"], dev["tfs"],
            **statics,
            k_vector=min(k_vector, self.capacity),
            k_bm25=min(k_bm25, self.capacity),
            top_k=top_k,
            pool=min(pool, self.capacity),
            vocab_pad=vpad,
            r_cap=split["r_cap"],
            use_mmr=use_mmr,
            mmr_lambda=mmr_lambda,
            rrf_k=rrf_k,
            weight_vector=weight_vector,
            weight_bm25=weight_bm25,
            rescore_pool=min(self.rescore_pool, self.capacity),
            select=self.select_mode,
        )

    def device_seconds_per_batch(
        self,
        query_vecs: np.ndarray,
        query_terms_list: Sequence[Sequence[str]],
        where: Optional[Mapping[str, Any]] = None,
        *,
        iters: int = 16,
        **knobs: Any,
    ) -> float:
        """Honest DEVICE seconds per fused batch, measured through a
        chained ``lax.scan``: each iteration feeds a reduction of its
        top-k rows back into the next iteration's query vectors, so the
        device cannot overlap or elide steps, and ONE host fetch closes
        the timing (the remote-link discipline — naive block_until_ready
        loops through the relay report impossible numbers). Used by
        bench.py to report a device-limited QPS ceiling next to wall QPS,
        making link weather visible in the artifact."""
        import time
        from functools import partial

        import jax
        import jax.numpy as jnp

        from classmate_rag_tpu.index.lexical import pack_query_terms
        from classmate_rag_tpu.ops.hybrid_step import hybrid_query_step_split

        dev = self._sync_device()
        bias = self._mask_bias(where)
        subset_df, _ = device_fns()
        vpad = self.vocab_pad
        df = subset_df(
            dev["term_ids"], dev["tfs"],
            bias == 0.0 if where else jnp.asarray(self.valid), vpad,
        )
        q_terms, q_counts = pack_query_terms(
            self.vocab, query_terms_list, 32
        )
        split = self._sync_split()
        qa = self._split_query_arrays(q_terms, q_counts)
        has_terms = np.any(q_terms >= 0, axis=1, keepdims=True)
        static = dict(
            k_vector=min(knobs.get("k_vector", 8), self.capacity),
            k_bm25=min(knobs.get("k_bm25", 8), self.capacity),
            top_k=knobs.get("top_k", 8),
            pool=min(knobs.get("pool", 24), self.capacity),
            vocab_pad=vpad, r_cap=split["r_cap"],
            rescore_pool=min(self.rescore_pool, self.capacity),
            select=self.select_mode,
        )
        arrs = (
            dev["emb"], split["tf_head"], split["post_rows"],
            split["post_tfs"], dev["doc_len"], df, bias,
            jnp.asarray(query_vecs, jnp.float32),
            jnp.asarray(qa["h_slots"]), jnp.asarray(qa["h_tids"]),
            jnp.asarray(qa["u_starts"]), jnp.asarray(qa["u_lens"]),
            jnp.asarray(qa["u_cols"]), jnp.asarray(qa["t_tids"]),
            jnp.asarray(q_terms), jnp.asarray(q_counts),
            jnp.asarray(has_terms), dev["emb16"],
            dev["term_ids"], dev["tfs"],
        )

        @partial(jax.jit, static_argnames=tuple(static))
        def probe(emb, tf_head, post_rows, post_tfs, doc_len, df, bias,
                  q_vecs, h_slots, h_tids, u_starts, u_lens, u_cols,
                  t_tids, q_tids, q_counts, has_terms, emb16,
                  term_ids, tfs, **st):
            def body(carry, _):
                # Thread the carry into BOTH branches' inputs: q_vecs alone
                # leaves the entire lexical sub-graph loop-invariant, and
                # XLA's while-loop ICM hoists it out of the scan — the
                # probe then times dense-only and reports a ~2x-optimistic
                # ceiling. doc_len perturbation makes avgdl + per-doc
                # length normalization (head AND tail scoring) iteration-
                # dependent; q_counts covers the term-weight side.
                out = hybrid_query_step_split(
                    emb, tf_head, post_rows, post_tfs,
                    doc_len + carry * 1e-12, df, bias,
                    q_vecs + carry * 1e-12,
                    h_slots, h_tids, u_starts, u_lens, u_cols, t_tids,
                    q_tids, q_counts + carry * 1e-12,
                    has_terms, emb16, term_ids, tfs,
                    **st,
                )
                s = jnp.sum(
                    jnp.where(out.rows >= 0, out.rows, 0)
                ).astype(jnp.float32)
                return s * 1e-9, None

            final, _ = jax.lax.scan(
                body, jnp.float32(0.0), None, length=iters
            )
            return final

        # Warmup MUST be a value fetch: through the remote relay
        # block_until_ready acks before the async compile finishes, and
        # the "timed" call would absorb minutes of compilation.
        float(probe(*arrs, **static))
        t0 = time.perf_counter()
        float(probe(*arrs, **static))                # one fetch = one sync
        return (time.perf_counter() - t0) / iters

    def rows_to_ids(self, rows: Sequence[int]) -> List[Optional[str]]:
        return [
            self.ids[r] if 0 <= r < self.n_rows else None for r in rows
        ]

    def embeddings_for_rows(self, rows: np.ndarray):
        """Device gather of embedding rows (for MMR)."""
        dev = self._sync_device()
        import jax.numpy as jnp

        safe = jnp.clip(jnp.asarray(rows), 0, self.capacity - 1)
        return dev["emb"][safe]

    # ------------------------------------------------------------------
    # Persistence
    # ------------------------------------------------------------------

    # Cap on chained delta files before a forced full rewrite (bounds
    # the per-cold-start apply work and the directory clutter).
    MAX_DELTAS = 128

    def _delta_paths(self) -> List[Path]:
        return sorted(self.directory.glob("lexical.delta_*.npz"))

    def save(self, catalog_fingerprint: Optional[str] = None) -> None:
        """Persist the store. With a persisted base in place and a known
        fingerprint chain, this appends ONE small delta file covering the
        rows touched since the last save — O(delta) bytes, like the
        catalog's journal — instead of rewriting the multi-GB
        embeddings + lexical snapshot at serving scale. Falls back to a
        full rewrite when the delta is large (>25% of rows), the chain is
        broken/absent, rows moved (compact), or no fingerprint is given.

        The fingerprint keys every persisted artifact to the exact
        catalog state it was derived from; load validates the full
        base→delta chain against the live catalog and rebuilds from the
        catalog on any mismatch."""
        self.directory.mkdir(parents=True, exist_ok=True)
        base_ok = (
            self._persist_fp is not None
            and (self.directory / "embeddings.npy").exists()
            and (self.directory / "rows.json").exists()
            and (self.directory / "lexical.npz").exists()
        )
        if (
            catalog_fingerprint is None
            or not base_ok
            or self._need_full_save
            or self._delta_seq >= self.MAX_DELTAS
            or len(self._dirty_rows) * 4 > max(self.n_rows, 1)
        ):
            self._full_save(catalog_fingerprint)
            return
        if not self._dirty_rows and catalog_fingerprint == self._persist_fp:
            return  # nothing changed since the last persist
        self._delta_save(catalog_fingerprint)

    # Persist the split-BM25 layout alongside the snapshot at serving
    # scale: rebuilding it at load costs O(N·L) host work (~80 s at 1M
    # on this 1-core host) serially inside the FIRST query. Below the
    # threshold the rebuild is sub-second and the extra bytes aren't
    # worth it.
    SPLIT_PERSIST_MIN_ROWS = 200_000

    def _save_slab(self, name: str, arr: np.ndarray) -> Tuple[int, int]:
        """Atomic raw-.npy slab write; returns its (size, mtime_ns)."""
        path = self.directory / name
        tmp = self.directory / (name + ".tmp")
        with tmp.open("wb") as f:
            np.save(f, arr)
        os.replace(tmp, path)
        st = path.stat()
        return (int(st.st_size), int(st.st_mtime_ns))

    def _full_save(self, catalog_fingerprint: Optional[str]) -> None:
        # Embeddings write atomically (tmp+rename — a torn np.save would
        # brick the dense base), and rows.json records the exact
        # (size, mtime_ns) of the embeddings file it indexes: ids pair
        # with embedding rows POSITIONALLY, so a crash between the two
        # renames (e.g. right after a compact() moved rows) must read as
        # "no persisted dense state", never as old ids silently zipped
        # to another save's rows.
        #
        # v2 layout: the embedding matrix (and every lexical column
        # below) persists PADDED to the slab-aligned capacity, so a warm
        # load can adopt the files as copy-on-write mmaps — byte-free
        # load, pages stream in lazily at first device upload — instead
        # of memcpying multi-GB arrays through the page cache (~20 s at
        # 1M rows on this host).
        emb_path = self.directory / "embeddings.npy"
        emb_tmp = self.directory / "embeddings.npy.tmp"
        with emb_tmp.open("wb") as f:
            np.save(f, self.emb)
        os.replace(emb_tmp, emb_path)
        st = emb_path.stat()
        registry = {
            "ids": self.ids,
            "valid": [bool(v) for v in self.valid[: self.n_rows]],
            "dim": self.dim,
            "emb_stat": [int(st.st_size), int(st.st_mtime_ns)],
        }
        if self.embedding_model:
            registry["embedding_model"] = self.embedding_model
        tmp = self.directory / "rows.json.tmp"
        tmp.write_text(json.dumps(registry), encoding="utf-8")
        tmp.replace(self.directory / "rows.json")

        for p in self._delta_paths():
            p.unlink(missing_ok=True)
        self._dirty_rows.clear()
        self._delta_seq = 0
        self._need_full_save = False

        snap = self.directory / "lexical.npz"
        if catalog_fingerprint is None:
            # Without a fingerprint a stale snapshot must not survive.
            snap.unlink(missing_ok=True)
            self._persist_fp = None
            return
        vocab_terms = sorted(self.vocab, key=self.vocab.__getitem__)
        # v2: big columns as raw padded .npy slabs (mmap-adoptable, see
        # class comment above); the npz keeps only the small derived
        # state + the (size, mtime_ns) binding of every slab file.
        slab_stats = {
            "lexical.term_ids.npy": self._save_slab(
                "lexical.term_ids.npy", self.term_ids
            ),
            "lexical.tfs.npy": self._save_slab("lexical.tfs.npy", self.tfs),
            "lexical.doc_len.npy": self._save_slab(
                "lexical.doc_len.npy", self.doc_len
            ),
            "lexical.field_cols.npy": self._save_slab(
                "lexical.field_cols.npy", self.field_cols
            ),
            "lexical.tag_bits.npy": self._save_slab(
                "lexical.tag_bits.npy", self.tag_bits
            ),
        }
        extra: Dict[str, Any] = {}
        if self.n_rows >= self.SPLIT_PERSIST_MIN_ROWS:
            # Serving scale: ship the split-BM25 layout with the
            # snapshot so the first query neither rebuilds it on one
            # core nor waits for it behind the compile.
            from classmate_rag_tpu.index.lexical import build_split_layout

            layout = build_split_layout(
                self.term_ids, self.tfs, len(self.vocab),
                head_bytes_budget=self.HEAD_BYTES_BUDGET,
                head_df_threshold=self.HEAD_DF_THRESHOLD,
                reserve=max(4096, int(self.n_rows) * 4),
            )
            slab_stats["split.tf_head.npy"] = self._save_slab(
                "split.tf_head.npy", layout["tf_head"]
            )
            slab_stats["split.post_rows.npy"] = self._save_slab(
                "split.post_rows.npy", layout["post_rows"]
            )
            slab_stats["split.post_tfs.npy"] = self._save_slab(
                "split.post_tfs.npy", layout["post_tfs"]
            )
            extra.update(
                split_lut=layout["lut"],
                split_offsets=layout["offsets"],
                split_r_cap=np.int64(layout["r_cap"]),
                split_p_base=np.int64(layout["p_base"]),
            )
        else:
            for name in ("split.tf_head.npy", "split.post_rows.npy",
                         "split.post_tfs.npy"):
                (self.directory / name).unlink(missing_ok=True)
        tmp_snap = self.directory / "lexical.npz.tmp"
        with tmp_snap.open("wb") as f:
            np.savez(
                f,
                fingerprint=np.str_(catalog_fingerprint),
                term_width=np.int64(self.term_width),
                capacity=np.int64(self.capacity),
                slab_stats=np.str_(json.dumps(slab_stats)),
                # Corpus df over valid rows: restoring it skips the
                # one-time O(N·L) host rebuild on the next cold start
                # (deltas maintain it incrementally on load).
                df=self._ensure_df_host(),
                vocab_blob=np.str_("\n".join(vocab_terms)),
                interns=np.str_(json.dumps(
                    {f: t.to_id for f, t in self.interns.items()}
                )),
                tag_slots=np.str_(json.dumps(self.tag_slots)),
                **extra,
            )
        tmp_snap.replace(snap)
        self._persist_fp = catalog_fingerprint
        self._persist_vocab = len(self.vocab)

    def _delta_save(self, catalog_fingerprint: str) -> None:
        """Append lexical.delta_NNNN.npz: the touched rows' full column
        state + registry/vocab extensions, chained by catalog
        fingerprints (prev -> this)."""
        rows = np.asarray(sorted(self._dirty_rows), np.int64)
        rows = rows[rows < self.n_rows]
        # Vocab delta, not the full table: only terms interned since the
        # last persist (term ids are append-only), so a delta stays
        # O(touched rows), not O(vocab).
        all_terms = sorted(self.vocab, key=self.vocab.__getitem__)
        vocab_new = all_terms[self._persist_vocab:]
        path = self.directory / f"lexical.delta_{self._delta_seq:04d}.npz"
        tmp = path.with_suffix(".npz.tmp")
        with tmp.open("wb") as f:
            np.savez(
                f,
                prev_fingerprint=np.str_(self._persist_fp),
                fingerprint=np.str_(catalog_fingerprint),
                dim=np.int64(self.dim),
                term_width=np.int64(self.term_width),
                rows=rows,
                row_ids=np.str_("\n".join(self.ids[r] for r in rows)),
                valid=self.valid[rows],
                emb=self.emb[rows],
                term_ids=self.term_ids[rows],
                tfs=self.tfs[rows],
                doc_len=self.doc_len[rows],
                field_cols=self.field_cols[:, rows],
                tag_bits=self.tag_bits[rows],
                n_rows=np.int64(self.n_rows),
                vocab_from=np.int64(self._persist_vocab),
                vocab_new=np.str_("\n".join(vocab_new)),
                interns=np.str_(json.dumps(
                    {f: t.to_id for f, t in self.interns.items()}
                )),
                tag_slots=np.str_(json.dumps(self.tag_slots)),
            )
        tmp.replace(path)
        self._dirty_rows.clear()
        self._delta_seq += 1
        self._persist_fp = catalog_fingerprint
        self._persist_vocab = len(self.vocab)

    def _apply_delta(self, path: Path) -> bool:
        """Apply one persisted delta onto the in-memory state. Chain
        validation happened before; returns False on structural
        mismatch."""
        with np.load(path, allow_pickle=False) as z:
            if (int(z["dim"]) != self.dim
                    or int(z["term_width"]) != self.term_width):
                return False
            rows = z["rows"]
            blob = str(z["row_ids"])
            row_ids = blob.split("\n") if blob else []
            if len(row_ids) != len(rows):
                return False
            n_after = int(z["n_rows"])
            self._grow_to(max(n_after, 1))
            # Registry extension: new rows always appended contiguously.
            fresh_rows = set()
            for r, cid in zip(rows, row_ids):
                r = int(r)
                if r < len(self.ids):
                    if self.ids[r] != cid:
                        return False
                elif r == len(self.ids):
                    self.ids.append(cid)
                    self.id_to_row[cid] = r
                    fresh_rows.add(r)
                else:
                    return False
            if self._split_persisted is not None:
                # The persisted split layout was built at the BASE
                # state: first-touch capture of each delta row's
                # pre-delta lexical content so _sync_split can apply the
                # delta through the O(delta) planner instead of a full
                # rebuild (None = fresh slot, nothing to neutralize).
                for r in rows:
                    r = int(r)
                    if r not in self._split_load_pending:
                        self._split_load_pending[r] = (
                            None if r in fresh_rows else (
                                self.term_ids[r].copy(),
                                self.tfs[r].copy(),
                            )
                        )
            if len(self.ids) != n_after:
                return False
            if self._df_host is not None:
                # Maintain the restored corpus df through the delta:
                # subtract the touched rows' pre-delta live
                # contributions (base tids are always within the base
                # vocab the df was saved at)...
                old_ids = self.term_ids[rows]
                old_live = (
                    (old_ids >= 0) & (self.tfs[rows] > 0)
                    & self.valid[rows][:, None]
                )
                sel = old_ids[old_live]
                if len(sel):
                    self._df_host -= np.bincount(
                        sel, minlength=len(self._df_host)
                    )[: len(self._df_host)]
            self.valid[rows] = z["valid"]
            self.emb[rows] = z["emb"]
            self.term_ids[rows] = z["term_ids"]
            self.tfs[rows] = z["tfs"]
            self.doc_len[rows] = z["doc_len"]
            self.field_cols[:, rows] = z["field_cols"]
            self.tag_bits[rows] = z["tag_bits"]
            vocab_from = int(z["vocab_from"])
            if vocab_from != len(self.vocab):
                return False
            blob_v = str(z["vocab_new"])
            for t in (blob_v.split("\n") if blob_v else []):
                self.vocab[t] = len(self.vocab)
            if self._df_host is not None:
                # ... then add the post-delta contributions (the vocab
                # extension above may have introduced new tids).
                new_ids = np.asarray(z["term_ids"])
                new_live = (
                    (new_ids >= 0) & (np.asarray(z["tfs"]) > 0)
                    & np.asarray(z["valid"], bool)[:, None]
                )
                sel = new_ids[new_live]
                if len(sel):
                    add = np.bincount(
                        sel, minlength=max(len(self.vocab), 1)
                    )
                    if len(add) > len(self._df_host):
                        self._df_host = np.concatenate([
                            self._df_host,
                            np.zeros(
                                len(add) - len(self._df_host), np.int64
                            ),
                        ])
                    self._df_host[: len(add)] += add
            interns = json.loads(str(z["interns"]))
            for f_name, mapping in interns.items():
                if f_name in self.interns:
                    self.interns[f_name].to_id = {
                        k: int(v) for k, v in mapping.items()
                    }
            self.tag_slots = {
                k: int(v)
                for k, v in json.loads(str(z["tag_slots"])).items()
            }
        return True

    def _load_snapshot(self, expected_fp) -> bool:
        """Restore the derived columns from lexical.npz when its recorded
        fingerprint matches ``expected_fp`` (the live catalog fingerprint
        — possibly via the catalog's fold alias — or, when persisted
        deltas exist, the chain's base fingerprint). Returns True on
        success."""
        snap = self.directory / "lexical.npz"
        if not snap.exists():
            return False
        if isinstance(expected_fp, str):
            expected_fp = {expected_fp}
        try:
            with np.load(snap, allow_pickle=False) as z:
                if "term_ids" not in z.files:
                    return False  # v2 snapshot: _adopt_snapshot_v2 owns it
                snap_fp = str(z["fingerprint"])
                if snap_fp not in expected_fp:
                    return False
                if int(z["term_width"]) != self.term_width:
                    return False
                n = z["term_ids"].shape[0]
                if n != self.n_rows:
                    return False
                self.term_ids[:n] = z["term_ids"]
                self.tfs[:n] = z["tfs"]
                self.doc_len[:n] = z["doc_len"]
                self.field_cols[:, :n] = z["field_cols"]
                self.tag_bits[:n] = z["tag_bits"]
                vocab_blob = str(z["vocab_blob"])
                terms = vocab_blob.split("\n") if vocab_blob else []
                self.vocab = {t: i for i, t in enumerate(terms)}
                interns = json.loads(str(z["interns"]))
                for f_name, mapping in interns.items():
                    if f_name in self.interns:
                        self.interns[f_name].to_id = {
                            k: int(v) for k, v in mapping.items()
                        }
                self.tag_slots = {
                    k: int(v)
                    for k, v in json.loads(str(z["tag_slots"])).items()
                }
                if "df" in z.files:
                    self._df_host = z["df"].astype(np.int64)
            self._snap_fp = snap_fp
            return True
        except (OSError, ValueError, KeyError, json.JSONDecodeError):
            return False

    def _adopt_snapshot_v2(self, expected_fp, emb: np.ndarray,
                           ids: List[str], valid: List[bool],
                           n: int) -> bool:
        """Adopt a v2 slab snapshot: every big column becomes a
        copy-on-write mmap of its padded on-disk file — the load touches
        ~no bytes; pages stream in lazily at the first device upload
        (which the background precompile overlaps with the XLA compile).
        ``emb`` must be the embeddings.npy mmap opened with
        mmap_mode='c'. Returns False → caller takes the v1/cold paths."""
        snap = self.directory / "lexical.npz"
        if not snap.exists():
            return False
        if isinstance(expected_fp, str):
            expected_fp = {expected_fp}
        id_to_row = {cid: i for i, cid in enumerate(ids[:n])}
        if len(id_to_row) != n:
            return False  # duplicate ids: slow path owns this
        try:
            with np.load(snap, allow_pickle=False) as z:
                if "slab_stats" not in z.files:
                    return False  # v1 snapshot
                snap_fp = str(z["fingerprint"])
                if snap_fp not in expected_fp:
                    return False
                if int(z["term_width"]) != self.term_width:
                    return False
                cap = int(z["capacity"])
                if cap % self.slab_rows or cap < max(n, 1):
                    return False
                if emb.ndim != 2 or emb.shape != (cap, self.dim):
                    return False
                stats = json.loads(str(z["slab_stats"]))
                arrs: Dict[str, np.ndarray] = {}
                for name, want in stats.items():
                    p = self.directory / name
                    st = p.stat()
                    if [int(v) for v in want] != [
                        int(st.st_size), int(st.st_mtime_ns)
                    ]:
                        return False
                    arrs[name] = np.load(p, mmap_mode="c")
                ti = arrs["lexical.term_ids.npy"]
                tf = arrs["lexical.tfs.npy"]
                dl = arrs["lexical.doc_len.npy"]
                fc = arrs["lexical.field_cols.npy"]
                tb = arrs["lexical.tag_bits.npy"]
                if (
                    ti.shape != (cap, self.term_width)
                    or tf.shape != (cap, self.term_width)
                    or dl.shape != (cap,)
                    or fc.shape != (len(FILTER_FIELDS), cap)
                    or tb.shape != (cap, TAG_WORDS)
                ):
                    return False
                split = None
                if "split.tf_head.npy" in arrs and "split_lut" in z.files:
                    split = {
                        "lut": np.asarray(z["split_lut"]),
                        "offsets": np.asarray(z["split_offsets"]),
                        "r_cap": int(z["split_r_cap"]),
                        "p_base": int(z["split_p_base"]),
                        "tf_head": arrs["split.tf_head.npy"],
                        "post_rows": arrs["split.post_rows.npy"],
                        "post_tfs": arrs["split.post_tfs.npy"],
                    }
                    if split["tf_head"].shape[1] != cap:
                        split = None
                vocab_blob = str(z["vocab_blob"])
                terms = vocab_blob.split("\n") if vocab_blob else []
                vocab = {t: i for i, t in enumerate(terms)}
                interns = json.loads(str(z["interns"]))
                tag_slots = {
                    k: int(v)
                    for k, v in json.loads(str(z["tag_slots"])).items()
                }
                df = (
                    z["df"].astype(np.int64) if "df" in z.files else None
                )
        except (OSError, ValueError, KeyError, json.JSONDecodeError):
            return False
        # Commit — everything validated.
        self.ids = list(ids[:n])
        self.id_to_row = id_to_row
        self.emb = emb
        self.term_ids = ti
        self.tfs = tf
        self.doc_len = dl
        self.field_cols = fc
        self.tag_bits = tb
        self.valid = np.zeros(cap, dtype=bool)
        self.valid[:n] = np.asarray(valid[:n], bool)
        self.vocab = vocab
        for f_name, mapping in interns.items():
            if f_name in self.interns:
                self.interns[f_name].to_id = {
                    k: int(v) for k, v in mapping.items()
                }
        self.tag_slots = tag_slots
        self._df_host = df
        self._split_persisted = split
        self._snap_fp = snap_fp
        return True

    def _restore_embeddings(self, ids: List[str], emb: np.ndarray,
                            n: int) -> None:
        """Registry/embedding restore shared by the snapshot path and the
        cold rebuild: positional ids[:n] ↔ emb rows."""
        self._grow_to(max(n, 1))
        id_to_row = {cid: i for i, cid in enumerate(ids[:n])}
        if len(id_to_row) == n:
            # Registry ids are unique (always true for our own saves):
            # vectorized restore — one slice copy instead of n per-row
            # copies (seconds vs minutes at 1M rows).
            self.ids = list(ids[:n])
            self.id_to_row = id_to_row
            self.emb[:n] = emb[:n]
        else:
            for i in range(n):
                row = self._row_for(ids[i])
                self.emb[row] = emb[i]

    @classmethod
    def load_or_create(
        cls,
        dim: int,
        directory: str | Path,
        catalog: Catalog,
        slab_rows: int = 4096,
        terms_per_chunk: int = 192,
        rescore: str = "auto",
        rescore_pool: int = 32,
        select: str = "auto",
    ) -> "IndexStore":
        """Restore embeddings from disk; rebuild lexical/meta columns from
        the catalog (tokens and metadata live there)."""
        store = cls(dim, directory, slab_rows, terms_per_chunk,
                    rescore=rescore, rescore_pool=rescore_pool,
                    select=select)
        reg_path = Path(directory) / "rows.json"
        emb_path = Path(directory) / "embeddings.npy"
        if not (reg_path.exists() and emb_path.exists()):
            return store
        try:
            registry = json.loads(reg_path.read_text(encoding="utf-8"))
            # Copy-on-write mmap: the v2 fast path ADOPTS this as the
            # live emb slab (writes stay in RAM; zero bytes touched at
            # load); the v1 copy path just streams pages through it.
            emb = np.load(emb_path, mmap_mode="c")
        except (OSError, ValueError, json.JSONDecodeError):
            return store
        if emb.ndim != 2 or emb.shape[1] != dim:
            return store
        emb_stat = registry.get("emb_stat")
        if emb_stat is not None:
            st = emb_path.stat()
            if [int(v) for v in emb_stat] != [
                int(st.st_size), int(st.st_mtime_ns)
            ]:
                # The registry indexes a DIFFERENT embeddings file than
                # the one on disk (crash between the two renames of
                # _full_save): positional id↔row pairing would be silent
                # garbage. Treat as no persisted dense state — the
                # caller rebuilds from the catalog (+ embedding cache).
                return store
        ids = list(registry.get("ids") or [])
        valid = list(registry.get("valid") or [])
        store.embedding_model = registry.get("embedding_model") or None
        n = min(len(ids), emb.shape[0], len(valid))

        # Persisted deltas (O(delta) saves since the last full rewrite):
        # the chain base_fp -> delta_0 -> ... -> delta_last must end at
        # the live catalog fingerprint, else everything persisted is
        # stale and the store rebuilds from the catalog.
        live_fp = catalog.fingerprint()
        # A catalog journal FOLD rewrites bytes without changing logical
        # content: artifacts keyed to the pre-fold fingerprint are still
        # derived from exactly this catalog's entries.
        accept = {live_fp}
        alias = getattr(catalog, "fold_alias", None)
        if alias and alias[1] == live_fp:
            accept.add(alias[0])
        delta_paths = store._delta_paths()
        expected_fp, chain = accept, []
        chain_tail: Optional[str] = None
        if delta_paths:
            chain_fps = []
            try:
                for p in delta_paths:
                    with np.load(p, allow_pickle=False) as z:
                        chain_fps.append(
                            (str(z["prev_fingerprint"]), str(z["fingerprint"]))
                        )
            except (OSError, ValueError, KeyError):
                chain_fps = None
            ok = (
                chain_fps is not None
                and chain_fps[-1][1] in accept
                and all(
                    chain_fps[i][1] == chain_fps[i + 1][0]
                    for i in range(len(chain_fps) - 1)
                )
            )
            if ok:
                expected_fp = {chain_fps[0][0]}
                chain = delta_paths
                chain_tail = chain_fps[-1][1]

        def finish_snapshot_load(st: "IndexStore") -> bool:
            """Apply the delta chain + the final catalog-validity
            recheck; returns False when a delta fails structurally."""
            for p in chain:
                if not st._apply_delta(p):
                    return False
            # Final validity recheck (row alive AND catalog entry
            # present): a bulk membership test — no entry-body reads
            # (the disk-backed catalog fetches bodies lazily).
            m = st.n_rows
            present = np.asarray(catalog.contains_many(st.ids[:m]), bool)
            if st._df_host is not None:
                flipped = np.nonzero(st.valid[:m] & ~present)[0]
                for r in flipped:  # normally empty (torn saves only)
                    st._df_note(st.term_ids[r], st.tfs[r], -1)
            st.valid[:m] &= present
            st._dirty = True
            # Chain the NEXT delta from what is on disk: the chain's
            # last fingerprint, or the snapshot's own recorded one —
            # either may be the PRE-fold fp accepted via the catalog's
            # fold alias. Keying to live_fp here would orphan every
            # persisted artifact at the load after the next delta save
            # (snapshot fp != the chain base it implies) and force a
            # cold O(N·L) rebuild.
            st._persist_fp = chain_tail if chain else st._snap_fp
            st._persist_vocab = len(st.vocab)
            st._delta_seq = len(chain)
            return True

        # v2 snapshot: adopt every persisted slab as a copy-on-write
        # mmap (zero-copy load; pages stream in at first device upload).
        if store._adopt_snapshot_v2(expected_fp, emb, ids, valid, n):
            if finish_snapshot_load(store):
                return store
            # A delta failed structurally: fresh store, cold paths below.
            store = cls(dim, directory, slab_rows, terms_per_chunk,
                        rescore=rescore, rescore_pool=rescore_pool,
                        select=select)

        store._restore_embeddings(ids, emb, n)
        if store._load_snapshot(expected_fp):
            # Registry validity first; deltas then overwrite the flags of
            # any rows they touched (a delta is newer than the base
            # registry).
            store.valid[:n] = np.asarray(valid[:n], bool)
            if finish_snapshot_load(store):
                return store
            # A delta failed structurally: fall through to cold rebuild.
            store = cls(dim, directory, slab_rows, terms_per_chunk,
                        rescore=rescore, rescore_pool=rescore_pool,
                        select=select)
            store._restore_embeddings(ids, emb, n)

        # Cold rebuild (no snapshot): stream the catalog ONCE instead of
        # n random per-id fetches — the disk-backed catalog reads
        # sequentially through items().
        wanted = set(ids[:n])
        by_id = {cid: e for cid, e in catalog.items() if cid in wanted}
        entries = [by_id.get(cid) for cid in ids[:n]]
        with_tokens = [i for i in range(n) if entries[i] is not None]
        if with_tokens:
            t_ids_b, t_tfs_b, dl_b = store._pack_rows(
                [entries[i].tokens for i in with_tokens]
            )
        packed_pos = {i: j for j, i in enumerate(with_tokens)}
        for i in range(n):
            cid = ids[i]
            entry = entries[i]
            alive = bool(valid[i]) and entry is not None
            row = store._row_for(cid)
            if entry is not None:
                j = packed_pos[i]
                store.term_ids[row] = t_ids_b[j]
                store.tfs[row] = t_tfs_b[j]
                store.doc_len[row] = dl_b[j]
                fields, bits = store._pack_row_metadata(entry.metadata)
                store.field_cols[:, row] = fields
                store.tag_bits[row] = bits
            store.valid[row] = alive
        store._dirty = True
        return store
