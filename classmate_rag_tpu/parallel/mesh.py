"""Device mesh construction helpers.

Two mesh shapes cover the framework:
- a 1-D ("shard",) mesh for corpus sharding — the retrieval engine's scale
  axis (rows of the embedding matrix + BM25 columns live shard-local, query
  fan-out + top-k allgather ride ICI);
- a 2-D ("data", "model") mesh for encoder training/serving (dp over batch,
  tp over heads/FFN).

The reference has no distributed anything (SURVEY §2.3) — these are new,
TPU-native components.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh


def corpus_mesh(n_devices: int = 0, devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the 'shard' axis."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("shard",))


def _factor_2d(n: int) -> Tuple[int, int]:
    """Split n into (data, model) with model as large a power-of-2 ≤ 4 as
    divides n — small tp degree suits encoder-sized models."""
    for model in (4, 2, 1):
        if n % model == 0:
            return n // model, model
    return n, 1


def training_mesh(n_devices: int = 0, devices: Optional[Sequence] = None) -> Mesh:
    """2-D ('data', 'model') mesh."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices:
        devs = devs[:n_devices]
    data, model = _factor_2d(len(devs))
    arr = np.array(devs).reshape(data, model)
    return Mesh(arr, ("data", "model"))
