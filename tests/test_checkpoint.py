"""Orbax checkpoint/resume for encoder training state."""

import numpy as np
import pytest

import jax.numpy as jnp

from classmate_rag_tpu.embeddings.model import EncoderConfig, init_params
from classmate_rag_tpu.parallel import training_mesh
from classmate_rag_tpu.training import make_train_step

orbax = pytest.importorskip("orbax.checkpoint")


def test_save_restore_resume(tmp_path):
    from classmate_rag_tpu.training.checkpoint import (
        latest_checkpoint,
        restore_train_state,
        save_train_state,
    )

    cfg = EncoderConfig.small_test()
    mesh = training_mesh(8)
    init_state, step = make_train_step(cfg, mesh, learning_rate=1e-3)
    state = init_state(init_params(cfg, "ckpt-test"))

    rng = np.random.default_rng(0)
    B, T = 8, 16
    q = jnp.asarray(rng.integers(4, cfg.vocab_size, (B, T)), jnp.int32)
    p = jnp.asarray(rng.integers(4, cfg.vocab_size, (B, T)), jnp.int32)
    m = jnp.ones((B, T), jnp.int32)

    for _ in range(2):
        state, loss = step(state, q, m, p, m)
    path = save_train_state(state, tmp_path / "ckpts")
    assert latest_checkpoint(tmp_path / "ckpts") is not None

    # Continue training from the restored state: same trajectory as the
    # original state (deterministic optimizer, same batch).
    fresh = init_state(init_params(cfg, "ckpt-test"))
    restored = restore_train_state(tmp_path / "ckpts", fresh)
    assert restored is not None
    assert int(restored.step) == 2

    s_a, loss_a = step(state, q, m, p, m)
    s_b, loss_b = step(restored, q, m, p, m)
    assert abs(float(loss_a) - float(loss_b)) < 1e-5


def test_restore_none_when_empty(tmp_path):
    from classmate_rag_tpu.training.checkpoint import restore_train_state

    cfg = EncoderConfig.small_test()
    mesh = training_mesh(8)
    init_state, _ = make_train_step(cfg, mesh)
    template = init_state(init_params(cfg, "x"))
    assert restore_train_state(tmp_path / "none", template) is None
