"""Query latency harness: per-ask wall time, mean and p95.

Parity with the reference harness (tools/bench_ask.py:20-37). Usage:
    python tools/bench_ask.py "question one" "question two" --n 20
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser(description="Ask latency benchmark")
    ap.add_argument("questions", nargs="+", help="Questions to ask")
    ap.add_argument("--n", type=int, default=20, help="Total asks")
    ap.add_argument("--retrieval-only", action="store_true",
                    help="Time preview (retrieval) instead of full ask")
    ap.add_argument("--warmup", type=int, default=1,
                    help="Untimed warmup asks (first call pays XLA compile)")
    args = ap.parse_args()

    from classmate_rag_tpu.metadata import normalize_cli_metadata
    from classmate_rag_tpu.pipeline import ask_question, retrieve_preview

    meta = normalize_cli_metadata()
    for i in range(args.warmup):
        q = args.questions[i % len(args.questions)]
        if args.retrieval_only:
            retrieve_preview(question=q, filters=meta, top_k=8)
        else:
            ask_question(question=q, filters=meta, top_k=8)
    times_ms = []
    for i in range(args.n):
        q = args.questions[i % len(args.questions)]
        t0 = time.perf_counter()
        if args.retrieval_only:
            retrieve_preview(question=q, filters=meta, top_k=8)
        else:
            ask_question(question=q, filters=meta, top_k=8)
        times_ms.append((time.perf_counter() - t0) * 1000.0)

    times_sorted = sorted(times_ms)
    p95 = times_sorted[min(len(times_sorted) - 1,
                           int(0.95 * len(times_sorted)))]
    print(json.dumps({
        "n": args.n,
        "retrieval_only": bool(args.retrieval_only),
        "per_ask_ms": [round(t, 2) for t in times_ms],
        "mean_ms": round(statistics.mean(times_ms), 2),
        "p95_ms": round(p95, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
