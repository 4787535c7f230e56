"""Ingest throughput harness: chunks/second over files × repeats.

Parity with the reference harness (tools/bench_ingest.py:21-47): ingest the
given files ``--repeat`` times through the full pipeline and report
chunks/sec. Usage:
    python tools/bench_ingest.py file1.pdf file2.md --repeat 3
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser(description="Ingest throughput benchmark")
    ap.add_argument("files", nargs="+", help="Documents to ingest")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--course", type=str, default="bench")
    args = ap.parse_args()

    from classmate_rag_tpu.metadata import normalize_cli_metadata
    from classmate_rag_tpu.pipeline import ingest_file

    meta = normalize_cli_metadata(course=args.course)
    total_chunks = 0
    t0 = time.perf_counter()
    for _ in range(args.repeat):
        for f in args.files:
            res = ingest_file(path=f, doc_meta=meta)
            total_chunks += res.total_chunks
    elapsed = time.perf_counter() - t0

    print(json.dumps({
        "files": len(args.files),
        "repeat": args.repeat,
        "total_chunks": total_chunks,
        "seconds": round(elapsed, 3),
        "chunks_per_sec": round(total_chunks / elapsed, 2) if elapsed else None,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
