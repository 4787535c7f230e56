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


SERVING_CHILD = r"""
import sys
pid = int(sys.argv[1]); port = sys.argv[2]
sys.path.insert(0, {repo!r})
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from classmate_rag_tpu.parallel.multihost import initialize
initialize(f"127.0.0.1:{{port}}", 2, pid)
assert jax.process_count() == 2

from jax.sharding import Mesh
from classmate_rag_tpu.index.store import IndexStore
from classmate_rag_tpu.index.lexical import tokenize
from classmate_rag_tpu.parallel.serving import ShardedHybridIndex

# Every process builds the SAME store (the multi-host SPMD contract).
rng = np.random.default_rng(99)
store = IndexStore(16, f"/tmp/mh_shidx_{{pid}}", slab_rows=8,
                   terms_per_chunk=8)
docs = ["the derivative measures change", "pasta needs boiling water",
        "eigenvalues characterize maps", "gradients minimize loss",
        "entropy measures uncertainty", "matrices compose maps",
        "integrals accumulate area", "variance measures spread"]
embs = rng.standard_normal((8, 16)).astype(np.float32)
embs /= np.linalg.norm(embs, axis=1, keepdims=True)
store.upsert([f"d{{i}}" for i in range(8)], embs,
             [tokenize(d, "en") for d in docs], [{{}}] * 8)

mesh = Mesh(np.array(jax.devices()), ("shard",))  # 4 devices, 2 hosts
idx = ShardedHybridIndex(store, mesh, top_k=2)
q_terms = [tokenize("derivative", "en"), tokenize("pasta water", "en"),
           tokenize("entropy uncertainty", "en")]
out = idx.query_batch(embs[[0, 1, 4]], q_terms)
rows = np.asarray(out.rows.addressable_data(0))

single = store.hybrid_topk_batch(embs[[0, 1, 4]], q_terms, None, top_k=2)
want = np.asarray(single.rows)
assert np.array_equal(rows, want), (rows, want)
print(f"OK proc{{pid}} rows={{rows.tolist()}}")
"""


MUTATION_CHILD = r"""
import sys
pid = int(sys.argv[1]); port = sys.argv[2]
sys.path.insert(0, {repo!r})
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from classmate_rag_tpu.parallel.multihost import initialize
initialize(f"127.0.0.1:{{port}}", 2, pid)
assert jax.process_count() == 2

from jax.sharding import Mesh
from classmate_rag_tpu.index.store import IndexStore
from classmate_rag_tpu.index.lexical import tokenize
from classmate_rag_tpu.parallel.serving import ShardedHybridIndex

def build_store(path):
    # The SPMD contract: every process replays the SAME mutation
    # sequence, so journals are identical across hosts.
    rng = np.random.default_rng(7)
    store = IndexStore(16, path, slab_rows=16, terms_per_chunk=8)
    docs = ["the derivative measures change", "pasta needs boiling water",
            "eigenvalues characterize maps", "gradients minimize loss",
            "entropy measures uncertainty", "matrices compose maps",
            "integrals accumulate area", "variance measures spread",
            "limits define continuity", "tensors generalize matrices"]
    embs = rng.standard_normal((12, 16)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    store.upsert([f"d{{i}}" for i in range(10)], embs[:10],
                 [tokenize(d, "en") for d in docs], [{{}}] * 10)
    return store, embs

def mutate(store, embs):
    # ingest 2 new chunks + delete 1 existing on BOTH processes
    store.upsert(["new0", "new1"], embs[10:12],
                 [tokenize("fourier transforms decompose signals", "en"),
                  tokenize("probability measures belief", "en")],
                 [{{}}, {{}}])
    store.delete(["d1"])

store, embs = build_store(f"/tmp/mh_mut_{{pid}}")
mesh = Mesh(np.array(jax.devices()), ("shard",))  # 4 devices, 2 hosts
idx = ShardedHybridIndex(store, mesh, top_k=3)
queries = embs[[0, 4, 9]]
q_terms = [tokenize("derivative", "en"), tokenize("entropy uncertainty", "en"),
           tokenize("fourier signals", "en")]
idx.query_batch(queries, q_terms)        # place the base state
base_bytes = idx.bytes_placed_total

mutate(store, embs)
out = idx.query_batch(queries, q_terms)  # drains the journal first
rows = np.asarray(out.rows.addressable_data(0))

# O(delta): the refresh moved row/column updates, not a rebuild —
# and took the r4 INCREMENTAL path (frozen head + tail overlay), not
# the full layout rebuild, identically on both processes.
delta = idx.bytes_placed_last_refresh
assert 0 < delta < base_bytes * 0.5, (delta, base_bytes)
assert idx.full_lexical_rebuilds == 0, idx.full_lexical_rebuilds

# Identity with a single-device store that saw the same mutations.
single, s_embs = build_store(f"/tmp/mh_mut_single_{{pid}}")
mutate(single, s_embs)
want = np.asarray(single.hybrid_topk_batch(queries, q_terms, None, top_k=3).rows)
assert np.array_equal(rows, want), (rows.tolist(), want.tolist())

# The deleted chunk must be gone from results for its own query.
deleted_row = 1
assert deleted_row not in rows[0], rows[0]

from jax.experimental import multihost_utils
got = multihost_utils.process_allgather(np.asarray([delta], np.int64))
assert got.ravel()[0] == got.ravel()[1], got  # same delta on every host
print(f"OK proc{{pid}} delta_bytes={{delta}} base_bytes={{base_bytes}}")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_two_process(tmp_path, child_src: str):
    script = tmp_path / "child.py"
    script.write_text(child_src.format(repo=str(REPO)))
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
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"OK proc{i}" in out


def test_two_process_dcn_mesh_and_allgather(tmp_path):
    _run_two_process(tmp_path, CHILD)


def test_two_process_sharded_serving(tmp_path):
    """ShardedHybridIndex over a 2-process x 2-device mesh: the corpus
    shards across hosts via make_array_from_process_local_data and the
    SPMD query matches the single-device store path bit for bit."""
    _run_two_process(tmp_path, SERVING_CHILD)


def test_two_process_mutation_journal_refresh(tmp_path):
    """Mutations (ingest + delete) against the sharded view across 2
    real processes: every process replays the same journal, the O(delta)
    refresh moves identical byte counts on each host, and post-mutation
    queries match a single-device store bit for bit."""
    _run_two_process(tmp_path, MUTATION_CHILD)
