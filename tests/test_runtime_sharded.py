"""Product-path SPMD serving: Runtime/ask/serve through ShardedHybridIndex.

The round-2 gap: the sharded engine existed but no user-facing verb ever
constructed it. Now ``get_runtime`` auto-builds a ShardedHybridIndex when
the process has >1 device (here: the 8-device virtual CPU mesh), and every
retrieval the product makes — ``ask``, ``preview``, the serve daemon —
dispatches through it. These tests pin that wiring:

- the runtime actually holds the engine and the retriever routes via it;
- results are IDENTICAL to a forced single-device runtime over the same
  on-disk index;
- admin mutations (delete/upsert) re-place O(delta) bytes, not the corpus.
"""

import json

import numpy as np
import pytest

from classmate_rag_tpu.metadata import normalize_cli_metadata

DOCS = {
    "calc.md": (
        "The derivative of a function measures its rate of change. "
        "It is the limit of the difference quotient.\n\n"
        "The product rule and the chain rule compute derivatives of "
        "products and compositions. Practice with polynomial examples.\n\n"
        "Integrals accumulate the area under a curve. The fundamental "
        "theorem of calculus links both operations."
    ),
    "pasta.txt": (
        "Boil salted water in a large pot. Cook the pasta nine minutes. "
        "Drain it and toss with tomato sauce and basil."
    ),
    "linear.txt": (
        "Matrix multiplication composes linear transformations. "
        "Eigenvalues and eigenvectors characterize a linear map."
    ),
}


def _build_runtime(monkeypatch, tmp_path, n_shards):
    from classmate_rag_tpu.config import load_config
    from classmate_rag_tpu.pipeline.ingest import ingest_file
    from classmate_rag_tpu.pipeline.runtime import get_runtime, reset_runtime

    monkeypatch.setenv("N_SHARDS", str(n_shards))
    load_config(reload=True)
    reset_runtime()
    rt = get_runtime(reload=True)
    if len(rt.store) == 0:
        for name, text in DOCS.items():
            p = tmp_path / name
            p.write_text(text)
            ingest_file(
                path=p,
                doc_meta=normalize_cli_metadata(
                    course="calc101" if "calc" in name else "misc",
                ),
                runtime=rt,
            )
    return rt


def _ask(rt, question, filters=None, **kw):
    from classmate_rag_tpu.pipeline.ask import ask_question

    return ask_question(
        question=question,
        filters=filters if filters is not None else normalize_cli_metadata(),
        runtime=rt, **kw,
    )


class TestRuntimeSharded:
    def test_runtime_builds_engine_on_multidevice(
        self, tmp_index_env, tmp_path, monkeypatch
    ):
        rt = _build_runtime(monkeypatch, tmp_path, n_shards=0)
        assert rt.sharded is not None, "auto-shard on 8 virtual devices"
        assert rt.sharded.n_shards == 8
        assert rt.retriever.sharded is rt.sharded

    def test_n_shards_1_forces_single_device(
        self, tmp_index_env, tmp_path, monkeypatch
    ):
        rt = _build_runtime(monkeypatch, tmp_path, n_shards=1)
        assert rt.sharded is None

    def test_ask_identical_to_single_device(
        self, tmp_index_env, tmp_path, monkeypatch
    ):
        """The flagship invariant: the sharded PRODUCT answer — text,
        sources, retrieved ids, and scores — equals the single-device
        answer over the same on-disk index."""
        rt1 = _build_runtime(monkeypatch, tmp_path, n_shards=1)
        questions = [
            "what is the derivative rate of change",
            "how long to cook pasta",
            "eigenvalues of a linear map",
        ]
        singles = [_ask(rt1, q, top_k=4) for q in questions]

        rt8 = _build_runtime(monkeypatch, tmp_path, n_shards=8)
        assert rt8.sharded is not None
        assert len(rt8.store) == len(rt1.store)
        for q, want in zip(questions, singles):
            got = _ask(rt8, q, top_k=4)
            assert got.answer == want.answer
            assert got.sources == want.sources
            assert [r["id"] for r in got.retrieved] == [
                r["id"] for r in want.retrieved
            ]
            for a, b in zip(got.retrieved, want.retrieved):
                assert a["scores"]["fused"] == pytest.approx(
                    b["scores"]["fused"], abs=1e-5
                )

    def test_filtered_ask_identical(self, tmp_index_env, tmp_path, monkeypatch):
        rt1 = _build_runtime(monkeypatch, tmp_path, n_shards=1)
        want = _ask(
            rt1, "derivative",
            filters=normalize_cli_metadata(course="calc101"), top_k=3,
        )
        rt8 = _build_runtime(monkeypatch, tmp_path, n_shards=8)
        got = _ask(
            rt8, "derivative",
            filters=normalize_cli_metadata(course="calc101"), top_k=3,
        )
        assert [r["id"] for r in got.retrieved] == [
            r["id"] for r in want.retrieved
        ]
        assert got.answer == want.answer

    def test_mutation_visible_and_o_delta(
        self, tmp_index_env, tmp_path, monkeypatch
    ):
        """Admin mutations flow through the journal: a delete costs bias
        bytes (O(N·4) worst case, here far under the ~corpus-sized full
        re-place), and the deleted row disappears from sharded answers."""
        rt = _build_runtime(monkeypatch, tmp_path, n_shards=8)
        before = _ask(rt, "how long to cook pasta", top_k=2)
        assert before.retrieved
        victim = before.retrieved[0]["id"]

        full_place_bytes = rt.sharded.bytes_placed_total
        rt.store.delete([victim])
        rt.catalog.delete([victim])
        after = _ask(rt, "how long to cook pasta", top_k=2)
        assert victim not in [r["id"] for r in after.retrieved]
        # The refresh itself moved only journal deltas (bias re-place
        # happens lazily at query time and is a single [N] f32).
        moved = rt.sharded.bytes_placed_total - full_place_bytes
        assert moved < full_place_bytes / 4, (
            f"delete moved {moved}B vs initial place {full_place_bytes}B"
        )

    def test_embedding_update_scatters_delta(
        self, tmp_index_env, tmp_path, monkeypatch
    ):
        rt = _build_runtime(monkeypatch, tmp_path, n_shards=8)
        _ask(rt, "warm up", top_k=2)  # place everything first
        store = rt.store
        row = 0
        cid = store.ids[row]
        entry = rt.catalog.get(cid)
        new_emb = store.emb[row].astype(np.float32)[None, :] * -1.0
        store.upsert([cid], new_emb, [entry.tokens], [dict(entry.metadata)])
        rt.sharded.ensure_fresh()
        # One row of f16 embeddings + indices, padded ≤2x — not the slab.
        assert rt.sharded.bytes_placed_last_refresh < 16 * store.emb.shape[1]
        # And the engine serves the new vector (identity vs single-device).
        q = store.emb[row].astype(np.float32)[None, :]
        single = store.hybrid_topk_batch(q, [[]], None, top_k=2)
        sharded = rt.sharded.query_batch(q, [[]], None, top_k=2)
        assert np.array_equal(
            np.asarray(single.rows), np.asarray(sharded.rows)
        )


class TestServeSharded:
    def test_serve_daemon_routes_through_engine(
        self, tmp_index_env, tmp_path, monkeypatch
    ):
        """POST /ask on the daemon answers through the sharded engine
        (spied via query_batch) with a real cited answer."""
        import http.client
        import threading

        from classmate_rag_tpu.serve import make_server

        rt = _build_runtime(monkeypatch, tmp_path, n_shards=8)
        assert rt.sharded is not None
        calls = []
        orig = rt.sharded.query_batch
        rt.sharded.query_batch = lambda *a, **k: (
            calls.append(1) or orig(*a, **k)
        )
        server = make_server("127.0.0.1", 0, runtime=rt)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.request(
                "POST", "/ask",
                json.dumps({"question": "what is the derivative", "k": 3}),
                {"Content-Type": "application/json"},
            )
            resp = conn.getresponse()
            body = json.loads(resp.read())
            assert resp.status == 200
            assert body["retrieved"]
            assert calls, "serve /ask must dispatch through the SPMD engine"
        finally:
            server.shutdown()
            server.server_close()
