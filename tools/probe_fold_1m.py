"""Measure the catalog journal fold at 1M + decompose a persist.

1. Force the compaction ratio (monkeypatch) so the next save() trips the
   background fold; time save() (must be O(delta)) and the fold itself.
2. Decompose one post-add persist: catalog.save vs store.save vs the
   sidecar write.

    INDEX_DIR=/tmp/prod1m ... python tools/probe_fold_1m.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    import classmate_rag_tpu.index.catalog as cat_mod
    from classmate_rag_tpu.config import load_config
    from classmate_rag_tpu.index.catalog import Catalog, CatalogEntry

    cfg = load_config()
    report = {}
    t0 = time.perf_counter()
    cat = Catalog.load_or_create(cfg.bm25_dir)
    report["catalog_load_s"] = round(time.perf_counter() - t0, 2)
    print(f"catalog load {report['catalog_load_s']}s n={len(cat)}",
          flush=True)

    # Persist decomposition: one tiny upsert, then the save pieces.
    cat.upsert(CatalogEntry("probe-fold-0", "probe text", ["probe"], {}))
    t0 = time.perf_counter()
    with cat._lock:
        cat._flush_pending_locked()
    report["flush_pending_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    cat._save_sidecar()
    report["save_sidecar_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    fp = cat.fingerprint()
    report["fingerprint_s"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(report), flush=True)

    # Background fold at 1M: force the ratio.
    cat_mod._COMPACT_MIN_BYTES = 0
    cat_mod._COMPACT_RATIO = 0.0
    cat.upsert(CatalogEntry("probe-fold-1", "probe text 2", ["probe"], {}))
    t0 = time.perf_counter()
    cat.save()
    report["save_tripping_ratio_s"] = round(time.perf_counter() - t0, 3)
    print(f"save() that tripped the ratio: "
          f"{report['save_tripping_ratio_s']}s (fold in background)",
          flush=True)
    t0 = time.perf_counter()
    # Queries keep working against the old files during the fold.
    assert cat.get("probe-fold-1") is not None
    report["get_during_fold_s"] = round(time.perf_counter() - t0, 4)
    cat.join_fold(timeout=1800)
    report["fold_duration_s"] = round(time.perf_counter() - t0, 1)
    report["journal_after"] = (
        cat.journal_path.stat().st_size if cat.journal_path.exists() else 0
    )
    report["fold_alias"] = cat.fold_alias is not None
    fresh = Catalog.load_or_create(cfg.bm25_dir)
    report["post_fold_entries"] = len(fresh)
    assert fresh.get("probe-fold-1") is not None
    print("REPORT " + json.dumps(report), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
