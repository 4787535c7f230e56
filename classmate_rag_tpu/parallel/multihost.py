"""Multi-host (DCN) initialization and mesh construction.

Single-pod-slice sharding rides ICI via the 1-D corpus mesh
(parallel/mesh.py). Beyond one host, JAX's distributed runtime stitches
hosts over DCN: every process calls :func:`initialize` (coordinator
address + process count from the environment when launched by standard TPU
tooling), then builds meshes over ``jax.devices()`` which now spans all
hosts. The hybrid SPMD query step works unchanged — the shard axis simply
covers more devices; XLA routes the per-shard top-k allgather over
ICI within a slice and DCN across slices.

Layout guidance: keep the corpus ("shard") axis *within* a slice wherever
possible (the allgather payloads are tiny but latency-sensitive), and put
the data-parallel axis across slices — ``dcn_training_mesh`` below encodes
exactly that split.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up jax.distributed (no-op when already initialized or single
    process). Arguments default to JAX's environment autodetection."""
    import jax

    # NB: the guard must not touch the XLA backend — jax.process_count()
    # (and jax.devices()) initialize it, after which
    # jax.distributed.initialize() unconditionally raises.
    if getattr(jax.distributed, "is_initialized", lambda: False)():
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except ValueError:
        # Single-process / no coordinator configured: stay local.
        pass
    except RuntimeError as exc:
        # Called too late (some JAX call already initialized the XLA
        # backend) or double-initialized: surface it, then stay local.
        import logging

        logging.getLogger(__name__).warning(
            "jax.distributed.initialize failed (%s); continuing "
            "single-process.", exc,
        )


def dcn_training_mesh():
    """('replica', 'data', 'model') mesh: replica axis across hosts (DCN),
    data+model within a slice (ICI).

    Uses ``mesh_utils.create_hybrid_device_mesh`` (process = DCN granule)
    so device order within and across hosts is chosen for collective
    locality — a plain ``jax.devices()`` reshape assumes host-contiguous
    enumeration, which TPU runtimes do not guarantee."""
    import jax
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    from classmate_rag_tpu.parallel.mesh import _factor_2d

    devices = jax.devices()
    n_hosts = max(jax.process_count(), 1)
    per_host = len(devices) // n_hosts
    data, model = _factor_2d(per_host)
    if n_hosts == 1:
        arr = np.array(devices).reshape(1, data, model)
    else:
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, data, model),
            dcn_mesh_shape=(n_hosts, 1, 1),
            devices=devices,
            process_is_granule=True,
        )
    return Mesh(arr, ("replica", "data", "model"))
