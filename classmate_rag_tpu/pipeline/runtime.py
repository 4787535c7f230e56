"""Shared pipeline runtime: one set of live components per process.

The reference re-creates stores/embedders inside every pipeline call
(rag/pipeline/rag.py:531-545 builds them per ask; the legacy path even
reloads the GGUF per question). Here a single ``Runtime`` owns the loaded
catalog, the device-resident IndexStore, the caching embedder, and the lazy
routing singletons — repeated queries reuse compiled functions and HBM
buffers, which is where the QPS comes from.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from classmate_rag_tpu.config import Config, load_config
from classmate_rag_tpu.embeddings import get_caching_embedder
from classmate_rag_tpu.index import Catalog, IndexStore
from classmate_rag_tpu.retrieval import HybridRetriever


@dataclass
class Runtime:
    cfg: Config
    catalog: Catalog
    store: IndexStore
    embedder: Any
    retriever: HybridRetriever
    # The SPMD serving engine when >1 device is available (None on a
    # single chip): every product query the retriever makes dispatches
    # through it — the store the product actually queries, like the
    # reference's Chroma collection (rag/pipeline/rag.py:531-549), but
    # sharded over the corpus mesh.
    sharded: Any = None
    # Cold-start decomposition (seconds) filled by get_runtime:
    # {"catalog_s", "store_s", "sharded_s"} — the catalog scan/sidecar
    # restore vs the slab load + device placement vs SPMD engine build.
    load_timings: dict = field(default_factory=dict)
    # Background precompile thread when runtime_precompile kicked in
    # (join it to wait for warm state; queries are safe regardless).
    warmup_thread: Any = field(default=None, repr=False)
    _classifier: Any = field(default=None, repr=False)
    _router: Any = field(default=None, repr=False)
    _loader: Any = field(default=None, repr=False)

    @property
    def classifier(self):
        if self._classifier is None:
            from classmate_rag_tpu.routing import SubjectClassifier

            self._classifier = SubjectClassifier(self.embedder)
        return self._classifier

    @property
    def router(self):
        if self._router is None:
            from classmate_rag_tpu.routing import HybridRouter

            self._router = HybridRouter(
                classifier=self.classifier,
                query_margin=self.cfg.route_query_margin,
                metadata_threshold=self.cfg.route_metadata_threshold,
                translation_requires_intent=self.cfg.route_translation_requires_intent,
            )
        return self._router

    @property
    def loader(self):
        if self._loader is None:
            from classmate_rag_tpu.routing import StickyModelLoader

            self._loader = StickyModelLoader(self.cfg)
        return self._loader

    def persist(self) -> None:
        self.catalog.save()
        # Fingerprint of the just-written catalog keys the store's
        # fast-load snapshot (skips the re-pack on next cold start).
        self.store.save(catalog_fingerprint=self.catalog.fingerprint())

    def warmup(self, batch_sizes=(1,), top_k: int = 8) -> dict:
        """Compile and place the serving executables before the first
        real query: runs one throwaway question per batch size through
        the EXACT product retrieval path (encode → fused hybrid step),
        so the XLA executables land in the persistent compilation cache
        and the corpus slabs land in HBM. At 1M rows a cold first ask
        otherwise pays minutes of remote compile + the full upload
        (BENCH_r04 recorded first_ask_s = 326 s); deployments call this
        at build/load time — get_runtime kicks it in a background
        thread at serving scale. Returns seconds per batch size."""
        import logging
        import time as _time

        out = {}
        for b in batch_sizes:
            t0 = _time.perf_counter()
            try:
                self.retriever.retrieve_batch(
                    questions=["warmup probe"] * int(b), filters={},
                    top_k=top_k, hybrid=True,
                )
            except Exception as exc:  # warmup must never break serving
                logging.getLogger(__name__).warning(
                    "runtime warmup (batch %s) failed: %s", b, exc
                )
                out[int(b)] = None
                continue
            out[int(b)] = round(_time.perf_counter() - t0, 3)
        return out


def _pick_n_shards(cfg: Config, slab_rows: int) -> int:
    """Shard count for the product path: ``N_SHARDS`` 0 = auto (one per
    local device), 1 = force single-device, >1 = exactly that many. The
    count is clamped to the device count and walked down to a divisor of
    ``slab_rows`` (store capacity is always a slab multiple, so a divisor
    of the slab divides every capacity)."""
    n = cfg.n_shards
    if n == 1:
        return 1
    import jax

    avail = len(jax.devices())
    n = avail if n <= 0 else min(n, avail)
    while n > 1 and slab_rows % n:
        n -= 1
    return n


def build_sharded_index(cfg: Config, store: IndexStore):
    """Construct the SPMD serving engine when the process has >1 device
    (or config forces it); returns None on a single chip."""
    n_sh = _pick_n_shards(cfg, store.slab_rows)
    if n_sh < 2:
        return None
    from classmate_rag_tpu.parallel import corpus_mesh
    from classmate_rag_tpu.parallel.serving import ShardedHybridIndex

    return ShardedHybridIndex(
        store, corpus_mesh(n_sh),
        k_vector=cfg.k_vector,
        k_bm25=cfg.k_bm25,
        rrf_k=cfg.rrf_k,
        weight_vector=cfg.weight_vector,
        weight_bm25=cfg.weight_bm25,
        use_mmr=cfg.use_mmr,
        mmr_lambda=cfg.mmr_lambda,
        pool=cfg.mmr_max_pool,
    )


_RUNTIME: Optional[Runtime] = None


def get_runtime(reload: bool = False) -> Runtime:
    global _RUNTIME
    if _RUNTIME is not None and not reload:
        return _RUNTIME
    from classmate_rag_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    import time as _time

    cfg = load_config(reload=reload)
    embedder = get_caching_embedder(cfg)
    t0 = _time.perf_counter()
    catalog = Catalog.load_or_create(cfg.bm25_dir)
    t1 = _time.perf_counter()
    store = IndexStore.load_or_create(
        dim=embedder.dim or 768,
        directory=cfg.dense_dir,
        catalog=catalog,
        slab_rows=cfg.dense_slab_rows,
        terms_per_chunk=min(cfg.bm25_terms_per_chunk, 512),
        rescore=cfg.dense_rescore,
        rescore_pool=cfg.dense_rescore_pool,
        select=cfg.dense_select,
    )
    t2 = _time.perf_counter()
    # Feature-space guard: vectors persisted under a DIFFERENT embedder
    # (a model swap without `rebuild`, or the hashing fallback's
    # feature-map version bump) silently degrade dense retrieval — the
    # query and passage vectors stop living in the same space.
    current_model = getattr(embedder, "model_name", None)
    if (
        store.embedding_model
        and current_model
        and store.embedding_model != current_model
    ):
        import logging

        logging.getLogger(__name__).warning(
            "persisted dense index was embedded with %r but the active "
            "embedder is %r — dense scores mix feature spaces; run "
            "`rebuild` to re-embed the corpus",
            store.embedding_model, current_model,
        )
    elif current_model and not store.embedding_model:
        if len(store) == 0:
            store.embedding_model = current_model
        else:
            # A NON-empty untagged legacy store must not be silently
            # stamped with the CURRENT embedder's name: for exactly the
            # migration this guard targets (e.g. the hashing feature-map
            # v1 -> v2 rename) the persisted vectors live in an unknown
            # feature space, and adopting the current name would make the
            # mix-feature-spaces warning above impossible to ever fire.
            # The stamp happens at save-time after a `rebuild` re-embeds.
            import logging

            logging.getLogger(__name__).warning(
                "persisted dense index has no recorded embedding model "
                "(pre-tagging save); if it was built with a different "
                "embedder than %r, dense scores mix feature spaces — run "
                "`rebuild` to re-embed and tag the corpus",
                current_model,
            )
    sharded = build_sharded_index(cfg, store)
    t3 = _time.perf_counter()
    timings = {
        "catalog_s": round(t1 - t0, 3),
        "store_s": round(t2 - t1, 3),
        "sharded_s": round(t3 - t2, 3),
    }
    retriever = HybridRetriever(
        store=store,
        catalog=catalog,
        embedder=embedder,
        k_vector=cfg.k_vector,
        k_bm25=cfg.k_bm25,
        rrf_k=cfg.rrf_k,
        weight_vector=cfg.weight_vector,
        weight_bm25=cfg.weight_bm25,
        use_mmr=cfg.use_mmr,
        mmr_lambda=cfg.mmr_lambda,
        mmr_max_pool=cfg.mmr_max_pool,
        use_device_encode=cfg.device_query_encode,
        sharded=sharded,
    )
    _RUNTIME = Runtime(
        cfg=cfg, catalog=catalog, store=store,
        embedder=embedder, retriever=retriever, sharded=sharded,
        load_timings=timings,
    )
    mode = (cfg.runtime_precompile or "auto").lower()
    if mode == "on" or (mode == "auto" and len(store) >= 200_000):
        # Serving scale: start compiling/placing the ask executables NOW
        # so the first real query finds warm state instead of paying the
        # remote compile + slab upload serially. Daemon thread — the
        # store's _sync_lock serializes it against a racing first query.
        import threading as _threading

        t = _threading.Thread(
            target=_RUNTIME.warmup, name="rag-precompile", daemon=True
        )
        t.start()
        _RUNTIME.warmup_thread = t
    return _RUNTIME


def reset_runtime() -> None:
    global _RUNTIME
    _RUNTIME = None
