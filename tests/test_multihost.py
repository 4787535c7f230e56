"""Multi-host (DCN) smoke: 2 CPU processes through jax.distributed.

Spawns two real processes that rendezvous through the coordinator,
build the hybrid DCN training mesh (mesh_utils.create_hybrid_device_mesh
with process-granule DCN axis — no host-contiguity assumption), and run
a cross-process allgather. This is the closest this single-host sandbox
can get to exercising the multi-pod path end to end.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import sys
pid = int(sys.argv[1]); port = sys.argv[2]
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from classmate_rag_tpu.parallel.multihost import initialize, dcn_training_mesh
initialize(f"127.0.0.1:{{port}}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
mesh = dcn_training_mesh()
shape = dict(mesh.shape)
assert shape["replica"] == 2, shape
assert shape["data"] * shape["model"] == 2, shape
# Every process must see every host's devices exactly once in the mesh.
assert len({{d.id for d in mesh.devices.ravel()}}) == 4

from jax.experimental import multihost_utils
import numpy as np
got = multihost_utils.process_allgather(np.array([pid * 10 + 1], np.int32))
assert sorted(got.ravel().tolist()) == [1, 11], got
print(f"OK proc{{pid}} mesh={{shape}}")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dcn_mesh_and_allgather(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(CHILD.format(repo=str(REPO)))
    port = _free_port()

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    flags.append("--xla_force_host_platform_device_count=2")
    env["XLA_FLAGS"] = " ".join(flags)

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=120)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"OK proc{i}" in out
