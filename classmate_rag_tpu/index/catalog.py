"""Chunk catalog: the durable source of truth for all admin operations.

Persists as JSONL with one ``{"id", "text", "tokens", "metadata"}`` object
per line at ``<bm25_dir>/bm25_index.jsonl`` — the exact format and location
of the reference's BM25 store (rag/retrieval/bm25.py:220-248), so dumps and
catalogs interoperate across the two stacks. Unlike the reference, the
rewrite is atomic (tmp file + rename) — the reference could truncate the
catalog on a crash mid-save.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Iterator, List, Mapping, Optional, Sequence


@dataclass
class CatalogEntry:
    id: str
    text: str
    tokens: List[str]
    metadata: Dict[str, Any]


@dataclass
class Catalog:
    path: Path
    _entries: Dict[str, CatalogEntry] = field(default_factory=dict)

    # ------------------------------------------------------------------
    @classmethod
    def load_or_create(cls, directory: str | Path, filename: str = "bm25_index.jsonl") -> "Catalog":
        cat = cls(path=Path(directory) / filename)
        cat.load()
        return cat

    def load(self) -> None:
        self._entries.clear()
        if not self.path.exists():
            return
        with self.path.open("r", encoding="utf-8", errors="ignore") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                cid = str(rec.get("id") or "")
                if not cid:
                    continue
                self._entries[cid] = CatalogEntry(
                    id=cid,
                    text=str(rec.get("text") or ""),
                    tokens=list(rec.get("tokens") or []),
                    metadata=dict(rec.get("metadata") or {}),
                )

    def fingerprint(self) -> str:
        """sha1 of the on-disk JSONL — keys the store's fast-load lexical
        snapshot to the exact catalog contents it was derived from."""
        import hashlib

        if not self.path.exists():
            return ""
        h = hashlib.sha1()
        with self.path.open("rb") as f:
            for block in iter(lambda: f.read(1 << 20), b""):
                h.update(block)
        return h.hexdigest()

    def save(self) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(".jsonl.tmp")
        with tmp.open("w", encoding="utf-8") as f:
            for e in self._entries.values():
                f.write(json.dumps(
                    {"id": e.id, "text": e.text, "tokens": e.tokens,
                     "metadata": e.metadata},
                    ensure_ascii=False,
                ) + "\n")
        os.replace(tmp, self.path)

    # ------------------------------------------------------------------
    def upsert(self, entry: CatalogEntry) -> None:
        self._entries[entry.id] = entry

    def delete(self, ids: Sequence[str]) -> int:
        n = 0
        for cid in ids:
            if self._entries.pop(cid, None) is not None:
                n += 1
        return n

    def get(self, cid: str) -> Optional[CatalogEntry]:
        return self._entries.get(cid)

    def __contains__(self, cid: str) -> bool:
        return cid in self._entries

    def __len__(self) -> int:
        return len(self._entries)

    @property
    def ids(self) -> List[str]:
        return list(self._entries.keys())

    def entries(self) -> Iterator[CatalogEntry]:
        return iter(self._entries.values())

    def items(self) -> Iterator[tuple[str, CatalogEntry]]:
        return iter(self._entries.items())
