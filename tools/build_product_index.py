"""Build (once) a persisted product-style index for load/serve testing.

Reuses bench.py's product corpus builder so the on-disk layout is
identical to what the driver's product stage measures. Usage:

    python tools/build_product_index.py /tmp/prod1m [--rows 1000000]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--rows", type=int, default=1_000_000)
    args = ap.parse_args()

    from bench import _build_product_corpus

    root = Path(args.root)
    root.mkdir(parents=True, exist_ok=True)
    secs = _build_product_corpus(root, args.rows)
    print(f"built {args.rows} rows at {root} in {secs:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
