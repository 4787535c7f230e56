"""HTTP serving load harness: sustained /ask QPS through the daemon.

Unlike bench.py (which drives the fused step directly), this measures the
PRODUCT path end to end: HTTP parse → MicroBatcher aggregation → fused
retrieval under the RW device lock → generation tail → JSON response.
Concurrent closed-loop clients (one thread each) hammer /ask; reported
QPS is completed requests / wall time after a warmup window.

    PYTHONPATH=/path/to/repo python tools/bench_serve.py \
        --clients 32 --seconds 10 --port 8123

Run from a directory whose ./indexes holds a built corpus (or let it
build a synthetic one with --synthetic N).
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _build_synthetic(n_chunks: int) -> None:
    """Index a synthetic corpus through the real IndexStore/runtime."""
    import numpy as np

    from classmate_rag_tpu.pipeline.runtime import get_runtime

    rt = get_runtime()
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(4000)]
    batch = 4096
    for start in range(0, n_chunks, batch):
        ids = [f"s{i}" for i in range(start, min(start + batch, n_chunks))]
        texts = [
            " ".join(rng.choice(vocab, size=30)) for _ in ids
        ]
        vecs = rng.standard_normal((len(ids), rt.store.dim)).astype("float32")
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        rt.store.upsert(
            ids, vecs, [t.split() for t in texts],
            [{} for _ in ids],
        )
        from classmate_rag_tpu.index.catalog import CatalogEntry

        for cid, text in zip(ids, texts):
            rt.catalog.upsert(
                CatalogEntry(id=cid, text=text, tokens=text.split(),
                             metadata={})
            )
    rt.persist()


def main() -> int:
    ap = argparse.ArgumentParser(description="Serving daemon load benchmark")
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--warmup-seconds", type=float, default=3.0)
    ap.add_argument("--port", type=int, default=8123)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="Build a synthetic corpus of N chunks first")
    args = ap.parse_args()

    if args.synthetic:
        _build_synthetic(args.synthetic)

    from classmate_rag_tpu.serve import make_server

    server = make_server("127.0.0.1", args.port)
    server_thread = threading.Thread(target=server.serve_forever, daemon=True)
    server_thread.start()

    import http.client

    questions = [
        "w12 w40 w7 what is the rate", "w3 w99 how does w41 relate",
        "w5 w1 w2 compute the measure", "w77 w21 bound of the limit",
    ]

    # Blocking warmup probe: the FIRST ask pays the XLA compile (minutes
    # through a remote compiler); measuring before it completes counts
    # nothing but timeouts.
    probe = http.client.HTTPConnection("127.0.0.1", args.port, timeout=600)
    probe.request("POST", "/ask", json.dumps({
        "question": questions[0], "k": args.k,
    }), {"Content-Type": "application/json"})
    status = probe.getresponse()
    status.read()
    probe.close()
    if status.status != 200:
        print(json.dumps({"error": f"warmup probe failed: {status.status}"}))
        return 1
    stop = threading.Event()
    measuring = threading.Event()
    counts = [0] * args.clients
    latencies: list[float] = []
    lat_lock = threading.Lock()
    errors = [0]

    rejects = [0]
    err_statuses: dict = {}

    def client(ci: int) -> None:
        conn = http.client.HTTPConnection("127.0.0.1", args.port, timeout=60)
        qi = ci
        while not stop.is_set():
            body = json.dumps({
                "question": questions[qi % len(questions)], "k": args.k,
            })
            qi += 1
            t0 = time.perf_counter()
            status = 0
            try:
                conn.request("POST", "/ask", body,
                             {"Content-Type": "application/json"})
                resp = conn.getresponse()
                resp.read()
                status = resp.status
            except Exception:
                conn.close()
                conn = http.client.HTTPConnection(
                    "127.0.0.1", args.port, timeout=60
                )
            dt = time.perf_counter() - t0
            if measuring.is_set():
                if status == 200:
                    counts[ci] += 1
                    with lat_lock:
                        latencies.append(dt * 1000.0)
                elif status == 503:
                    # Backpressure reject: expected under overload, the
                    # explicit alternative to a second-long queue tail.
                    with lat_lock:
                        rejects[0] += 1
                else:
                    with lat_lock:  # += on a shared cell is not atomic
                        errors[0] += 1
                        err_statuses[status] = err_statuses.get(status, 0) + 1
            if status == 503:
                time.sleep(0.02)  # honor Retry-After in miniature
        conn.close()

    threads = [
        threading.Thread(target=client, args=(i,), daemon=True)
        for i in range(args.clients)
    ]
    for t in threads:
        t.start()
    time.sleep(args.warmup_seconds)  # compiles + caches settle
    # Drop warmup-window samples from the server-side timer: the first
    # /ask pays the (minutes-long on a cold cache) remote XLA compile,
    # and averaging it into server_ask_mean_ms misstates the
    # steady-state admission-to-response time by orders of magnitude.
    from classmate_rag_tpu.utils.metrics import metrics

    metrics.reset()
    measuring.set()
    t0 = time.perf_counter()
    time.sleep(args.seconds)
    # Close the counting window AT wall end: requests completing after
    # it (up to one per client, seconds-long at big corpora) otherwise
    # land in the numerator while the denominator excludes their time.
    measuring.clear()
    wall = time.perf_counter() - t0
    stop.set()
    for t in threads:
        t.join(timeout=90)
    # Server-side handler percentiles: with in-process closed-loop
    # clients on a 1-core host, client-measured tails include GIL
    # scheduling starvation of 2x clients threads — the daemon's own
    # serve_ask timer isolates the server's admission-to-response time.
    snap = metrics.snapshot()
    server.shutdown()
    server.server_close()

    total = sum(counts)
    lat = sorted(latencies)
    p50 = lat[len(lat) // 2] if lat else float("nan")
    p95 = lat[min(len(lat) - 1, int(0.95 * len(lat)))] if lat else float("nan")
    print(json.dumps({
        "http_ask_qps": round(total / wall, 1),
        "clients": args.clients,
        "requests": total,
        "rejects_503": rejects[0],
        "errors": errors[0],
        "error_statuses": err_statuses,
        "p50_ms": round(p50, 1),
        "p95_ms": round(p95, 1),
        "server_ask_mean_ms": snap.get("serve_ask_mean_ms"),
        "server_ask_p95_ms": snap.get("serve_ask_p95_ms"),
        "seconds": round(wall, 2),
    }))
    return 0 if errors[0] == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
