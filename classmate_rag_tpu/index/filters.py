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
from typing import Dict, Optional, Tuple

import numpy as np

from classmate_rag_tpu.metadata.validation import slug_tag

FILTER_FIELDS: Tuple[str, ...] = (
    "course", "unit", "language", "doc_type", "author", "semester",
)
ABSENT = 0          # interned id for "field not present"
TAG_WORDS = 4       # 128 distinct tag slugs supported per index
from classmate_rag_tpu.utils.numerics import NEG_INF  # noqa: E402


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


def mask_bias_host(field_cols, tag_bits, valid, wanted, tag_want):
    """Pure-numpy twin of mask_bias_device — for callers that keep the
    corpus columns on host (e.g. the sharded serving wrapper, which must
    not stage a full single-device replica just to compute a mask)."""
    no_constraint = (wanted < 0)[:, None]
    eq = field_cols == wanted[:, None]
    fields_ok = np.all(np.where(no_constraint, True, eq), axis=0)
    impossible = bool(np.any(wanted == -2))
    tags_ok = np.all(
        (tag_bits & tag_want[None, :]) == tag_want[None, :], axis=1
    )
    keep = fields_ok & tags_ok & valid & (not impossible)
    return np.where(keep, 0.0, NEG_INF).astype(np.float32)
