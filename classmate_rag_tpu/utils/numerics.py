"""Shared numeric constants and shape helpers.

Single definitions for values that were re-declared per module (review
r4: NEG_INF in nine files, ``_round_up`` in three with divergent
semantics — the un-clamped copy returned 0 for x=0 where the padding
call sites want at least one tile). numpy-only: importable from the slim
(jax-free) tier.
"""

from __future__ import annotations

import numpy as np

# The fused kernels' mask/sentinel value: f32 min (identical for numpy
# and jax float32). Scores at or below NEG_INF/2 mean "masked row".
NEG_INF = float(np.finfo(np.float32).min)


def round_up(x: int, m: int) -> int:
    """Ceil ``x`` to a multiple of ``m``, clamped to at least one ``m``
    (padding semantics: a zero-size input still gets one tile)."""
    return max(m, (x + m - 1) // m * m)


def pad_pow2_updates(idx, vals):
    """Pad scatter updates (idx [N] or [N, K], vals [N, ...]) to a
    power-of-two count so every distinct delta size doesn't cost a fresh
    XLA compile. Duplicate padding entries repeat entry 0 — scatter
    order between equal values is irrelevant. (axis=0 repeat: the 1-D
    np.repeat default FLATTENS 2-D index arrays.)"""
    idx = np.asarray(idx)
    vals = np.asarray(vals)
    n = len(idx)
    n2 = 1 << max(n - 1, 0).bit_length() if n > 1 else 1
    if n2 > n:
        idx = np.concatenate([idx, np.repeat(idx[:1], n2 - n, axis=0)])
        vals = np.concatenate([vals, np.repeat(vals[:1], n2 - n, axis=0)])
    return idx, vals
