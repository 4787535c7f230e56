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


def test_cache_tag_keyed_by_content_not_path(tmp_path):
    """Two fine-tunes landing in the SAME dir at the SAME step_N must get
    different embedding-cache tags (ADVICE r3: path-derived tags let a
    retrain serve stale cached vectors)."""
    from classmate_rag_tpu.training.checkpoint import (
        load_encoder_checkpoint,
        save_train_state,
    )

    cfg = EncoderConfig.small_test()
    mesh = training_mesh(8)
    init_state, _ = make_train_step(cfg, mesh, learning_rate=1e-3)

    state_a = init_state(init_params(cfg, "seed-a"))
    save_train_state(state_a, tmp_path / "ckpts", config=cfg)
    _, _, tag_a = load_encoder_checkpoint(tmp_path / "ckpts")

    # A "retrain" with different weights overwrites the same step_0 path.
    state_b = init_state(init_params(cfg, "seed-b"))
    save_train_state(state_b, tmp_path / "ckpts", config=cfg)
    _, _, tag_b = load_encoder_checkpoint(tmp_path / "ckpts")
    assert tag_a != tag_b

    # Identical weights at the same path stay stable (cache reuse works).
    save_train_state(state_b, tmp_path / "ckpts", config=cfg)
    _, _, tag_b2 = load_encoder_checkpoint(tmp_path / "ckpts")
    assert tag_b2 == tag_b


def test_restore_none_when_empty(tmp_path):
    from classmate_rag_tpu.training.checkpoint import restore_train_state

    cfg = EncoderConfig.small_test()
    mesh = training_mesh(8)
    init_state, _ = make_train_step(cfg, mesh)
    template = init_state(init_params(cfg, "x"))
    assert restore_train_state(tmp_path / "none", template) is None
