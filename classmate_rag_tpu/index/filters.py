"""Metadata filtering as device bitmask columns.

The reference pushes filters into Chroma ``where`` dicts
(rag/retrieval/vector_chroma.py:45-78: equality on six fields plus
``tag_<slug>: True`` flags AND-ed together) and into a per-entry Python
predicate for BM25 (rag/retrieval/bm25.py:79-107). Here filters become
data: every filterable field is interned to a small int column [N], tags
become packed uint32 bit columns [N, W], and a filter compiles to one
wanted-id vector + wanted-bit vector. The device evaluates the whole
predicate as a handful of vectorized compares fused straight into the
scoring masks — the same mask feeds the dense scan and the BM25 kernel.

Sentinel semantics preserved: ``doc_type="other"`` never filters, absent
fields never match an equality filter, unknown values match nothing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from classmate_rag_tpu.metadata.validation import slug_tag

FILTER_FIELDS: Tuple[str, ...] = (
    "course", "unit", "language", "doc_type", "author", "semester",
)
ABSENT = 0          # interned id for "field not present"
TAG_WORDS = 4       # 128 distinct tag slugs supported per index
NEG_INF = float(np.finfo(np.float32).min)


@dataclass
class InternTable:
    """Per-field value ↔ small-int interning (0 reserved for absent)."""

    to_id: Dict[str, int] = field(default_factory=dict)

    def intern(self, value: Optional[str]) -> int:
        if value is None or value == "":
            return ABSENT
        got = self.to_id.get(value)
        if got is None:
            got = len(self.to_id) + 1
            self.to_id[value] = got
        return got

    def lookup(self, value: str) -> int:
        """-2 = unknown value: matches no row (distinct from 'no filter')."""
        return self.to_id.get(value, -2)


@dataclass
class MetaColumns:
    """Columnar metadata for N chunks, ready to ship to device."""

    fields: Dict[str, np.ndarray]      # field -> int32 [N]
    tag_bits: np.ndarray               # uint32 [N, TAG_WORDS]
    interns: Dict[str, InternTable]
    tag_slots: Dict[str, int]

    @classmethod
    def build(cls, metadatas: Sequence[Mapping[str, Any]]) -> "MetaColumns":
        n = len(metadatas)
        interns = {f: InternTable() for f in FILTER_FIELDS}
        tag_slots: Dict[str, int] = {}
        cols = {f: np.zeros(n, dtype=np.int32) for f in FILTER_FIELDS}
        bits = np.zeros((n, TAG_WORDS), dtype=np.uint32)
        for i, meta in enumerate(metadatas):
            for f in FILTER_FIELDS:
                v = meta.get(f)
                cols[f][i] = interns[f].intern(str(v) if v is not None else None)
            for tag in meta.get("tags") or []:
                slug = slug_tag(str(tag))
                if not slug:
                    continue
                slot = tag_slots.setdefault(slug, len(tag_slots))
                if slot < TAG_WORDS * 32:
                    bits[i, slot // 32] |= np.uint32(1 << (slot % 32))
        return cls(fields=cols, tag_bits=bits, interns=interns, tag_slots=tag_slots)

    def compile_filter(
        self, where: Optional[Mapping[str, Any]]
    ) -> Tuple[np.ndarray, np.ndarray, bool]:
        """Compile a simple-filter dict into (wanted [6] i32, tag_want [W] u32,
        satisfiable). wanted −1 = no constraint; −2 = impossible."""
        wanted = np.full(len(FILTER_FIELDS), -1, dtype=np.int32)
        tag_want = np.zeros(TAG_WORDS, dtype=np.uint32)
        satisfiable = True
        if not where:
            return wanted, tag_want, satisfiable
        for j, f in enumerate(FILTER_FIELDS):
            v = where.get(f)
            if v is None:
                continue
            s = str(v).strip()
            if not s:
                continue
            if f == "doc_type" and s.lower() == "other":
                continue  # sentinel: never narrows
            got = self.interns[f].lookup(s)
            wanted[j] = got
            if got == -2:
                satisfiable = False
        tags = where.get("tags")
        if isinstance(tags, Mapping) and "$contains" in tags:
            tags = tags["$contains"]
        if isinstance(tags, str):
            tags = [tags]
        for tag in tags or []:
            slug = slug_tag(str(tag))
            if not slug:
                continue
            slot = self.tag_slots.get(slug)
            if slot is None or slot >= TAG_WORDS * 32:
                satisfiable = False
            else:
                tag_want[slot // 32] |= np.uint32(1 << (slot % 32))
        return wanted, tag_want, satisfiable

    def mask(
        self, where: Optional[Mapping[str, Any]], valid: np.ndarray
    ) -> np.ndarray:
        """Host-side reference evaluation → bool [N] (used by tests/oracle)."""
        wanted, tag_want, ok = self.compile_filter(where)
        if not ok:
            return np.zeros_like(valid, dtype=bool)
        m = valid.copy()
        for j, f in enumerate(FILTER_FIELDS):
            if wanted[j] >= 0:
                m &= self.fields[f] == wanted[j]
        want_bits = tag_want[None, :]
        m &= ((self.tag_bits & want_bits) == want_bits).all(axis=1)
        return m


_MASK_BIAS_JIT = None


def mask_bias_device(field_cols, tag_bits, valid, wanted, tag_want):
    """Device-side mask → additive f32 bias (0 keep / −inf drop).

    ``field_cols``: i32 [F, N]; ``tag_bits``: u32 [N, W]; ``valid``: bool [N];
    ``wanted``: i32 [F]; ``tag_want``: u32 [W]. Jitted: the whole predicate
    is ONE device dispatch (eager jnp here cost ~8 dispatches per query —
    ~20ms through a remote TPU link).
    """
    global _MASK_BIAS_JIT
    if _MASK_BIAS_JIT is None:
        import jax
        import jax.numpy as jnp

        def _impl(field_cols, tag_bits, valid, wanted, tag_want):
            no_constraint = (wanted < 0)[:, None]
            eq = field_cols == wanted[:, None]
            fields_ok = jnp.all(jnp.where(no_constraint, True, eq), axis=0)
            impossible = jnp.any(wanted == -2)
            tags_ok = jnp.all(
                (tag_bits & tag_want[None, :]) == tag_want[None, :], axis=1
            )
            keep = fields_ok & tags_ok & valid & ~impossible
            return jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32)

        _MASK_BIAS_JIT = jax.jit(_impl)
    return _MASK_BIAS_JIT(field_cols, tag_bits, valid, wanted, tag_want)
