"""Decompose fresh-process-to-first-answer at serving scale.

Runs against a PERSISTED product index (INDEX_DIR/BM25_DIR/DENSE_DIR env,
e.g. built by tools/build_product_index.py): times every stage a fresh
deployment pays before its first answer, then decomposes the /add probe
that bench.py's product child runs. This is the cold-start budget table
(perf.md) and the tool that located the first_ask/add costs round 5
optimized.

    INDEX_DIR=/tmp/prod1m BM25_DIR=/tmp/prod1m/bm25 \
    DENSE_DIR=/tmp/prod1m/dense EMBEDDING_BACKEND=hash \
    RUNTIME_PRECOMPILE=off python tools/probe_cold_start.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    from classmate_rag_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    import jax

    report = {}

    def stage(name):
        def deco(fn):
            t0 = time.perf_counter()
            out = fn()
            report[name] = round(time.perf_counter() - t0, 3)
            print(f"{name}: {report[name]}s", flush=True)
            return out
        return deco

    from classmate_rag_tpu.metadata import DocumentMetadata
    from classmate_rag_tpu.pipeline.ask import ask_question
    from classmate_rag_tpu.pipeline.runtime import get_runtime

    rt = stage("runtime_load")(lambda: get_runtime(reload=True))
    report["load_split"] = rt.load_timings
    store = rt.store

    # Device placement, piece by piece (what _sync_device/_sync_split
    # bundle into the first query).
    @stage("upload_link_probe_1gb")
    def _probe():
        import jax.numpy as jnp

        a = np.zeros((1 << 29,), np.uint16)  # 1 GiB
        x = jnp.asarray(a)
        x.block_until_ready()
        return None

    @stage("sync_device_upload")
    def _dev():
        with store._sync_lock:
            d = store._sync_device_locked()
        jax.block_until_ready(d["emb"])
        return None

    @stage("sync_split_upload")
    def _split():
        s = store._sync_split()
        jax.block_until_ready(s["tf_head"])
        return None

    @stage("df_upload")
    def _df():
        store._df_device(store.vocab_pad).block_until_ready()
        return None

    @stage("bias")
    def _bias():
        store._mask_bias(None).block_until_ready()
        return None

    filters = DocumentMetadata()

    @stage("first_ask")  # executables: cache-deserialize (or compile) + run
    def _ask():
        return ask_question(question="what about w3 w17 w200 w1100",
                            filters=filters, top_k=8, runtime=rt)

    @stage("second_ask")
    def _ask2():
        return ask_question(question="what about w5 w90 w33 w408",
                            filters=filters, top_k=8, runtime=rt)

    # ---- /add decomposition -----------------------------------------
    import tempfile

    doc = Path(tempfile.mkdtemp()) / "probe_doc.txt"
    doc.write_text("A freshly added probe document about w1 w2 w3. "
                   "It provides additional context for the add probe.",
                   encoding="utf-8")

    from classmate_rag_tpu.loaders import load_document_by_type

    stage("add_load_chunk")(
        lambda: load_document_by_type(doc, "txt", enable_ocr=False)
    )
    stage("add_classifier_first")(
        lambda: rt.classifier.classify_chunks(["probe text about w1"])
    )
    stage("add_encode_passages")(
        lambda: rt.embedder.encode_passages(["probe text about w1 w2"])
    )

    from classmate_rag_tpu.pipeline.ingest import ingest_file

    @stage("add_ingest_file")
    def _add():
        return ingest_file(path=doc, doc_meta=DocumentMetadata(
            course="bench"), runtime=rt)

    @stage("persist_after_add")
    def _persist():
        rt.persist()
        return None

    @stage("ask_after_add_first")
    def _ask3():
        return ask_question(question="what about w9 w12 w77 w302",
                            filters=filters, top_k=8, runtime=rt)

    @stage("ask_after_add_second")
    def _ask4():
        return ask_question(question="what about w8 w13 w76 w301",
                            filters=filters, top_k=8, runtime=rt)

    report["counters"] = {
        "device_full_uploads": store.device_full_uploads,
        "split_full_builds": store.split_full_builds,
        "split_snapshot_restores": store.split_snapshot_restores,
        "df_full_builds": store.df_full_builds,
    }
    print("REPORT " + json.dumps(report), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
