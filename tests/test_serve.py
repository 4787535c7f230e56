"""HTTP serving daemon: routes, warm runtime, error handling."""

import json
import threading
import urllib.request

import pytest


@pytest.fixture()
def server(tmp_index_env, tmp_path):
    from classmate_rag_tpu.pipeline.runtime import get_runtime, reset_runtime
    from classmate_rag_tpu.pipeline.ingest import ingest_file
    from classmate_rag_tpu.metadata import normalize_cli_metadata
    from classmate_rag_tpu.serve import make_server

    reset_runtime()
    rt = get_runtime(reload=True)
    doc = tmp_path / "doc.md"
    doc.write_text(
        "Backpropagation computes gradients of the loss with respect to "
        "every weight by the chain rule."
    )
    ingest_file(path=doc, doc_meta=normalize_cli_metadata(course="ml"),
                runtime=rt)

    srv = make_server("127.0.0.1", 0, runtime=rt)  # port 0 = auto
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}", tmp_path
    srv.shutdown()
    srv.server_close()
    reset_runtime()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz_and_stats(server):
    base, _ = server
    code, body = _get(base + "/healthz")
    assert code == 200 and body["ok"]
    code, body = _get(base + "/stats")
    assert code == 200
    assert body["vectors"] == 1


def test_ask_roundtrip(server):
    base, _ = server
    code, body = _post(base + "/ask", {
        "question": "how does backpropagation compute gradients",
        "k": 3,
    })
    assert code == 200
    assert "[1]" in body["answer"]
    assert body["sources"]


def test_preview_with_filters(server):
    base, _ = server
    code, body = _post(base + "/preview", {
        "question": "backpropagation",
        "filters": {"course": "ml"},
    })
    assert code == 200
    assert body["items"]
    code, body = _post(base + "/preview", {
        "question": "backpropagation",
        "filters": {"course": "nope"},
    })
    assert code == 200
    assert body["items"] == []


def test_add_via_http(server):
    base, tmp_path = server
    doc2 = tmp_path / "doc2.txt"
    doc2.write_text("Convolutional networks share weights across positions.")
    code, body = _post(base + "/add", {"path": str(doc2), "course": "ml"})
    assert code == 200
    assert body["upserted"] == 1
    code, body = _get(base + "/stats")
    assert body["vectors"] == 2


def test_concurrent_asks(server):
    base, _ = server
    results, errors = [], []

    def worker(i):
        try:
            for _ in range(3):
                code, body = _post(base + "/ask", {
                    "question": f"backpropagation gradients {i}", "k": 2,
                })
                assert code == 200
                results.append(body["answer"])
        except Exception as exc:  # noqa: BLE001 - recorded for the assert
            errors.append(repr(exc))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(results) == 18


def test_generation_overlaps_device_lock(tmp_index_env, tmp_path):
    """The device lock is released before the generation tail: while one
    batch is generating, another thread can acquire the device lock."""
    import threading
    import time

    from classmate_rag_tpu.metadata import normalize_cli_metadata
    from classmate_rag_tpu.pipeline.ingest import ingest_file
    from classmate_rag_tpu.pipeline.runtime import get_runtime, reset_runtime
    from classmate_rag_tpu.serve import MicroBatcher

    reset_runtime()
    rt = get_runtime(reload=True)
    doc = tmp_path / "doc.md"
    doc.write_text("Gradient descent minimizes loss by following gradients.")
    ingest_file(path=doc, doc_meta=normalize_cli_metadata(course="ml"),
                runtime=rt)

    lock = threading.Lock()
    batcher = MicroBatcher(rt, lock, max_wait_ms=1.0)

    gen_started = threading.Event()
    lock_acquired_during_gen = threading.Event()
    orig_finish = None

    import classmate_rag_tpu.pipeline.ask as ask_mod

    orig_finish = ask_mod.finish_ask_batch

    def slow_finish(**kwargs):
        gen_started.set()
        time.sleep(0.4)  # simulate generation latency
        return orig_finish(**kwargs)

    def prober():
        gen_started.wait(timeout=30)
        # If the leader still held the device lock through generation this
        # acquire would block past the sleep window.
        acquired = lock.acquire(timeout=0.2)
        if acquired:
            lock_acquired_during_gen.set()
            lock.release()

    probe = threading.Thread(target=prober)
    probe.start()
    ask_mod.finish_ask_batch = slow_finish
    try:
        res = batcher.ask(
            "how does gradient descent work",
            normalize_cli_metadata(), 2, True, None,
        )
    finally:
        ask_mod.finish_ask_batch = orig_finish
    probe.join(timeout=30)
    assert res.answer
    assert lock_acquired_during_gen.is_set(), (
        "device lock was held through the generation tail"
    )
    reset_runtime()


def test_follower_timeout_knob(tmp_index_env):
    """A follower that outlives its deadline raises the retryable
    Overloaded signal (→ 503 at the HTTP layer) while the leader still
    completes and keeps its own result."""
    import threading

    from classmate_rag_tpu.metadata import normalize_cli_metadata
    from classmate_rag_tpu.pipeline.runtime import get_runtime, reset_runtime
    from classmate_rag_tpu.serve import MicroBatcher, Overloaded

    reset_runtime()
    rt = get_runtime(reload=True)
    lock = threading.Lock()
    # Big wait window so the two callers batch; tiny follower deadline.
    batcher = MicroBatcher(rt, lock, max_wait_ms=300.0,
                           follower_timeout_s=0.05)

    import classmate_rag_tpu.pipeline.ask as ask_mod

    orig_retrieve = ask_mod.retrieve_batch_for_ask

    def slow_retrieve(**kwargs):
        import time

        time.sleep(0.6)  # longer than the follower deadline
        return orig_retrieve(**kwargs)

    meta = normalize_cli_metadata()
    leader_res, follower_err = {}, {}

    def leader():
        leader_res["r"] = batcher.ask("first question", meta, 2, True, None)

    def follower():
        try:
            batcher.ask("second question", meta, 2, True, None)
        except Overloaded as exc:
            follower_err["e"] = exc

    ask_mod.retrieve_batch_for_ask = slow_retrieve
    try:
        t1 = threading.Thread(target=leader)
        t1.start()
        import time

        time.sleep(0.05)  # join the open batch as a follower
        t2 = threading.Thread(target=follower)
        t2.start()
        t1.join(timeout=30)
        t2.join(timeout=30)
    finally:
        ask_mod.retrieve_batch_for_ask = orig_retrieve
    assert "r" in leader_res and leader_res["r"].answer is not None
    assert isinstance(follower_err.get("e"), Overloaded)
    reset_runtime()


def test_concurrent_retrievals_overlap(tmp_index_env, tmp_path):
    """Two MicroBatcher leaders (different filter keys) hold the READ side
    of the device lock simultaneously — queries no longer serialize."""
    import threading

    from classmate_rag_tpu.metadata import normalize_cli_metadata
    from classmate_rag_tpu.pipeline.ingest import ingest_file
    from classmate_rag_tpu.pipeline.runtime import get_runtime, reset_runtime
    from classmate_rag_tpu.serve import MicroBatcher
    from classmate_rag_tpu.utils.rwlock import ReadWriteLock

    reset_runtime()
    rt = get_runtime(reload=True)
    doc = tmp_path / "doc.md"
    doc.write_text("Backpropagation computes gradients by the chain rule.")
    ingest_file(path=doc, doc_meta=normalize_cli_metadata(course="ml"),
                runtime=rt)

    batcher = MicroBatcher(rt, ReadWriteLock(), max_wait_ms=1.0)

    import classmate_rag_tpu.pipeline.ask as ask_mod

    orig = ask_mod.retrieve_batch_for_ask
    barrier = threading.Barrier(2, timeout=20)

    def rendezvous_retrieve(**kwargs):
        barrier.wait()  # passes only if two retrievals run concurrently
        return orig(**kwargs)

    results, errors = {}, []

    def worker(i, course):
        try:
            results[i] = batcher.ask(
                f"gradients {i}", normalize_cli_metadata(course=course),
                2, True, None,
            )
        except Exception as exc:  # noqa: BLE001
            errors.append(repr(exc))

    ask_mod.retrieve_batch_for_ask = rendezvous_retrieve
    try:
        threads = [
            threading.Thread(target=worker, args=(i, c))
            for i, c in enumerate(["ml", "nope"])
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
    finally:
        ask_mod.retrieve_batch_for_ask = orig
    assert not errors
    assert len(results) == 2
    reset_runtime()


def test_mutation_under_query_load(server):
    """Interleave /add mutations with concurrent /ask load: every ask must
    return a consistent answer (no crashes, no partially-visible rows),
    and the final stats must reflect every add — the RW device-lock
    discipline under its intended workload."""
    base, tmp_path = server
    stop = threading.Event()
    failures = []

    def asker(i):
        n = 0
        while not stop.is_set() and n < 40:
            n += 1
            try:
                status, body = _post(f"{base}/ask", {
                    "question": "how does backpropagation compute gradients",
                    "k": 4,
                })
                if status != 200 or not isinstance(body.get("answer"), str):
                    failures.append((status, body))
            except Exception as exc:
                failures.append(("exc", repr(exc)))

    threads = [threading.Thread(target=asker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    added = 0
    try:
        for d in range(4):
            doc = tmp_path / f"new{d}.md"
            doc.write_text(
                f"Gradient descent update number {d} subtracts the "
                f"learning rate times the gradient from weight {d}."
            )
            status, body = _post(f"{base}/add", {
                "path": str(doc), "course": "ml",
            })
            assert status == 200, body
            added += body.get("total_chunks", 0)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=60)
    assert not failures, failures[:3]
    assert added >= 4
    status, stats = _get(f"{base}/stats")
    assert status == 200
    # 1 fixture chunk + every added chunk, all visible to queries.
    assert stats["bm25"] == 1 + added
    status, body = _post(f"{base}/ask", {
        "question": "gradient descent update learning rate", "k": 6,
    })
    assert status == 200
    assert any("new" in (r.get("metadata") or {}).get("source_path", "")
               for r in body["retrieved"])


def test_error_paths(server):
    base, _ = server
    code, body = _post(base + "/ask", {})
    assert code == 400 and "question" in body["error"]
    code, body = _post(base + "/add", {"path": "/nope/missing.pdf"})
    assert code == 400
    code, body = _get(base + "/stats")  # still alive after errors
    assert code == 200
    code, body = _post(base + "/nothing", {})
    assert code == 404


def test_admission_control_rejects_with_503(tmp_index_env, tmp_path):
    """With max_pending=2 and slowed retrieval, a burst of 8 concurrent
    asks yields some 200s, some immediate 503s with Retry-After — and
    ZERO opaque 500s. Bounded latency for admitted requests, explicit
    rejects for the rest."""
    import threading
    import time as _time

    from classmate_rag_tpu.metadata import normalize_cli_metadata
    from classmate_rag_tpu.pipeline.ingest import ingest_file
    from classmate_rag_tpu.pipeline.runtime import get_runtime, reset_runtime
    from classmate_rag_tpu.serve import make_server

    reset_runtime()
    rt = get_runtime(reload=True)
    doc = tmp_path / "doc.md"
    doc.write_text("Admission control bounds the in-flight request count.")
    ingest_file(path=doc, doc_meta=normalize_cli_metadata(), runtime=rt)

    import classmate_rag_tpu.pipeline.ask as ask_mod

    orig = ask_mod.retrieve_batch_for_ask

    def slow_retrieve(**kwargs):
        _time.sleep(0.3)
        return orig(**kwargs)

    srv = make_server("127.0.0.1", 0, runtime=rt, max_pending=2)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    ask_mod.retrieve_batch_for_ask = slow_retrieve
    codes, lat = [], []
    try:
        def one(i):
            t0 = _time.perf_counter()
            # Distinct k per request → distinct batch keys → no
            # micro-batch coalescing; each occupies an admission slot.
            code, body = _post(
                f"http://127.0.0.1:{port}/ask",
                {"question": f"q {i}", "k": 2 + (i % 4)},
            )
            codes.append(code)
            lat.append(_time.perf_counter() - t0)
            if code == 503:
                assert body["error"] == "overloaded"
                assert body["retry_after_s"] >= 1

        threads = [threading.Thread(target=one, args=(i,)) for i in range(8)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=60)
    finally:
        ask_mod.retrieve_batch_for_ask = orig
        srv.shutdown()
        srv.server_close()
        reset_runtime()
    assert len(codes) == 8
    assert codes.count(200) >= 2, codes
    assert codes.count(503) >= 1, codes
    assert all(c in (200, 503) for c in codes), codes
    # Rejects are immediate — far under a single slowed retrieval.
    rejects = [l for c, l in zip(codes, lat) if c == 503]
    assert rejects and max(rejects) < 0.25, rejects


def test_follower_timeout_default_is_backend_aware(tmp_index_env, monkeypatch):
    """8 s with the extractive runner; 60 s when a decode model is
    configured (its healthy batch tail runs tens of seconds — a fixed
    8 s would 503 every follower of every healthy batch). The deadline
    derives from the RUNTIME actually serving the requests (rt.cfg), not
    from a fresh load_config(): a runtime built under one backend keeps
    its correctly-sized deadline even when the global env has moved on."""
    from classmate_rag_tpu.config import load_config
    from classmate_rag_tpu.pipeline.runtime import get_runtime, reset_runtime
    from classmate_rag_tpu.serve import make_server

    monkeypatch.setenv("LLM_BACKEND", "extractive")
    load_config(reload=True)
    reset_runtime()
    try:
        rt = get_runtime(reload=True)
        srv = make_server(port=0, runtime=rt)
        assert srv.RequestHandlerClass.batcher.follower_timeout == 8.0
        srv.server_close()
        monkeypatch.setenv("LLM_BACKEND", "tpu")
        load_config(reload=True)
        # The extractive-built runtime still gets the extractive deadline
        # — the env change alone must not resize it to the wrong backend.
        srv = make_server(port=0, runtime=rt)
        assert srv.RequestHandlerClass.batcher.follower_timeout == 8.0
        srv.server_close()
        rt_tpu = get_runtime(reload=True)
        srv = make_server(port=0, runtime=rt_tpu)
        assert srv.RequestHandlerClass.batcher.follower_timeout == 60.0
        srv.server_close()
        # Explicit env knob wins either way.
        monkeypatch.setenv("SERVE_FOLLOWER_TIMEOUT_S", "3.5")
        srv = make_server(port=0, runtime=rt)
        assert srv.RequestHandlerClass.batcher.follower_timeout == 3.5
        srv.server_close()
    finally:
        monkeypatch.delenv("SERVE_FOLLOWER_TIMEOUT_S", raising=False)
        monkeypatch.setenv("LLM_BACKEND", "extractive")
        load_config(reload=True)
        reset_runtime()


def test_delete_route(server, tmp_path):
    base, _ = server
    # Empty selector must be refused (it would resolve every chunk).
    code, body = _post(base + "/delete", {})
    assert code == 400
    # Add a doc then delete it by path; counts drop end to end.
    doc = tmp_path / "deleteme.txt"
    doc.write_text("Gradient descent iteratively minimizes a loss.")
    code, body = _post(base + "/add", {"path": str(doc), "course": "ml"})
    assert code == 200 and body["upserted"] >= 1
    code, body = _get(base + "/stats")
    before = body["vectors"]
    code, body = _post(base + "/delete", {"path": str(doc)})
    assert code == 200
    assert body["vector_deleted"] >= 1
    code, body = _get(base + "/stats")
    assert body["vectors"] == before - 1
    assert "maintenance" in body
