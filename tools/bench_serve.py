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
    ap.add_argument("--mutate", type=int, default=0,
                    help="fire N add+delete pairs through /add and "
                         "/delete during the MIDDLE third of the "
                         "measured window (mutation-under-load); "
                         "latencies report per phase")
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
    latencies: list = []     # (seconds-into-window, latency ms)
    lat_lock = threading.Lock()
    t_start = [0.0]
    errors = [0]

    def fetch_stats():
        c = http.client.HTTPConnection("127.0.0.1", args.port, timeout=60)
        c.request("GET", "/stats")
        r = c.getresponse()
        body = json.loads(r.read())
        c.close()
        return body

    mutation_log: list = []

    def mutation_storm() -> None:
        """Admin storm through the product HTTP surface: each round
        ingests a small doc (/add) then deletes it by path (/delete),
        draining both store journals mid-load."""
        import tempfile

        for i in range(args.mutate):
            if stop.is_set():
                return
            doc = Path(tempfile.mkdtemp()) / f"storm_{i}.txt"
            doc.write_text(
                f"storm document {i} about w{i % 50} w{(i * 7) % 50} "
                f"and stormterm{i}", encoding="utf-8",
            )
            c = http.client.HTTPConnection(
                "127.0.0.1", args.port, timeout=120
            )
            t0 = time.perf_counter()
            c.request("POST", "/add", json.dumps(
                {"path": str(doc), "course": "stormcourse"}
            ), {"Content-Type": "application/json"})
            r = c.getresponse()
            r.read()
            add_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            c.request("POST", "/delete", json.dumps({"path": str(doc)}),
                      {"Content-Type": "application/json"})
            r2 = c.getresponse()
            r2.read()
            c.close()
            mutation_log.append({
                "add_status": r.status, "add_s": round(add_s, 3),
                "delete_status": r2.status,
                "delete_s": round(time.perf_counter() - t0, 3),
            })

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
                        latencies.append(
                            (time.perf_counter() - t_start[0], dt * 1000.0)
                        )
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

    stats_before = fetch_stats() if args.mutate else None
    metrics.reset()
    t_start[0] = time.perf_counter()
    measuring.set()
    t0 = time.perf_counter()
    storm_thread = None
    storm_window = None
    if args.mutate:
        # Storm fires in the middle third of the window.
        time.sleep(args.seconds / 3)
        storm_t0 = time.perf_counter() - t_start[0]
        storm_thread = threading.Thread(target=mutation_storm, daemon=True)
        storm_thread.start()
        storm_thread.join(timeout=max(args.seconds / 3, 60))
        storm_window = (storm_t0, time.perf_counter() - t_start[0])
        remaining = args.seconds - (time.perf_counter() - t0)
        if remaining > 0:
            time.sleep(remaining)
    else:
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
    stats_after = fetch_stats() if args.mutate else None
    server.shutdown()
    server.server_close()

    total = sum(counts)

    def pcts(ms_list):
        s = sorted(ms_list)
        if not s:
            return {"p50_ms": None, "p95_ms": None, "n": 0}
        return {
            "p50_ms": round(s[len(s) // 2], 1),
            "p95_ms": round(s[min(len(s) - 1, int(0.95 * len(s)))], 1),
            "n": len(s),
        }

    out = {
        "http_ask_qps": round(total / wall, 1),
        "clients": args.clients,
        "requests": total,
        "rejects_503": rejects[0],
        "errors": errors[0],
        "error_statuses": err_statuses,
        **pcts([ms for (_t, ms) in latencies]),
        "server_ask_mean_ms": snap.get("serve_ask_mean_ms"),
        "server_ask_p95_ms": snap.get("serve_ask_p95_ms"),
        "seconds": round(wall, 2),
    }
    if args.mutate and storm_window:
        lo, hi = storm_window
        out["mutation"] = {
            "storm_window_s": [round(lo, 2), round(hi, 2)],
            "rounds": mutation_log,
            "before": pcts([ms for (t, ms) in latencies if t < lo]),
            "during": pcts([ms for (t, ms) in latencies if lo <= t <= hi]),
            "after": pcts([ms for (t, ms) in latencies if t > hi]),
        }

        def maint(s):
            return (s or {}).get("maintenance") or {}

        out["mutation"]["maintenance_before"] = maint(stats_before)
        out["mutation"]["maintenance_after"] = maint(stats_after)
    print(json.dumps(out))
    return 0 if errors[0] == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
