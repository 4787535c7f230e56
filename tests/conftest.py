"""Test configuration.

Forces JAX onto a virtual 8-device CPU platform BEFORE jax is imported
anywhere, so sharding/mesh tests exercise real multi-device code paths
without TPU hardware. Host-only tests are unaffected.
"""

import os
import sys
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# This machine's axon sitecustomize registers the TPU platform at
# interpreter start and pins it; env vars set here are too late. The config
# update below overrides it even post-registration — tests must run on the
# virtual 8-device CPU platform, not through the TPU tunnel. Guarded so the
# slim CI tier (host-substrate tests, no jax installed) still collects.
try:
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
except ImportError:
    pass

import pytest  # noqa: E402


@pytest.fixture()
def tmp_index_env(tmp_path, monkeypatch):
    """Redirect all index/cache directories into a temp dir and reload config."""
    monkeypatch.setenv("INDEX_DIR", str(tmp_path / "indexes"))
    monkeypatch.setenv("DENSE_DIR", str(tmp_path / "indexes/dense"))
    monkeypatch.setenv("BM25_DIR", str(tmp_path / "indexes/bm25"))
    monkeypatch.setenv("EMB_CACHE_DIR", str(tmp_path / "indexes/emb_cache"))
    monkeypatch.setenv("EMBEDDING_BACKEND", "hash")
    from classmate_rag_tpu.config import load_config

    cfg = load_config(reload=True)
    yield cfg
    load_config(reload=True)
