"""Training-state checkpointing via orbax.

The retrieval side already has durable state (catalog JSONL + embeddings +
dump/restore with checksums, matching the reference's story). This module
covers the side the reference never had: encoder fine-tuning runs.
Orbax handles sharded arrays transparently, so a state saved from a
(data, model) mesh restores onto a different mesh layout.
"""

from __future__ import annotations

import dataclasses
import json
from hashlib import blake2b
from pathlib import Path
from typing import Optional, Tuple

import jax

from classmate_rag_tpu.training.contrastive import TrainState

_CONFIG_FILE = "encoder_config.json"


def _write_config(directory: Path, config) -> None:
    import jax.numpy as jnp

    d = dataclasses.asdict(config)
    d["compute_dtype"] = jnp.dtype(config.compute_dtype).name
    (directory / _CONFIG_FILE).write_text(
        json.dumps(d, indent=1), encoding="utf-8"
    )


def _read_config(directory: Path):
    """EncoderConfig from encoder_config.json in ``directory`` (or its
    parent, for a step_N path); None when absent."""
    import jax.numpy as jnp

    from classmate_rag_tpu.embeddings.model import EncoderConfig

    for cand in (directory / _CONFIG_FILE, directory.parent / _CONFIG_FILE):
        if cand.exists():
            d = json.loads(cand.read_text(encoding="utf-8"))
            d["compute_dtype"] = jnp.dtype(d.get("compute_dtype", "bfloat16"))
            known = {f.name for f in dataclasses.fields(EncoderConfig)}
            return EncoderConfig(**{k: v for k, v in d.items() if k in known})
    return None


def save_train_state(
    state: TrainState, directory: str | Path, config=None
) -> str:
    """Write a checkpoint; returns the checkpoint path. With ``config``
    the EncoderConfig is persisted alongside (encoder_config.json), which
    makes the checkpoint self-describing — the product embedder can load
    it via ENCODER_CHECKPOINT without knowing the architecture."""
    import orbax.checkpoint as ocp

    root = Path(directory).resolve()
    path = root / f"step_{int(state.step)}"
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, dict(
        params=state.params, opt_state=state.opt_state, step=state.step,
    ), force=True)
    checkpointer.wait_until_finished()
    if config is not None:
        _write_config(root, config)
    return str(path)


def latest_checkpoint(directory: str | Path) -> Optional[Path]:
    root = Path(directory)
    if not root.exists():
        return None
    steps = []
    for child in root.iterdir():
        if child.is_dir() and child.name.startswith("step_"):
            try:
                steps.append((int(child.name.split("_", 1)[1]), child))
            except ValueError:
                continue
    return max(steps)[1] if steps else None


def restore_train_state(
    directory: str | Path,
    template: TrainState,
) -> Optional[TrainState]:
    """Restore the latest checkpoint using ``template``'s structure and
    shardings (pass a freshly-initialized state). None when no checkpoint."""
    import orbax.checkpoint as ocp

    path = latest_checkpoint(directory)
    if path is None:
        return None
    checkpointer = ocp.StandardCheckpointer()
    template_tree = dict(
        params=template.params, opt_state=template.opt_state,
        step=template.step,
    )
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template_tree)
    restored = checkpointer.restore(path, abstract)
    # Re-establish the template's shardings: orbax may materialize leaves
    # on a single device, which would mix placements inside the train step.
    def place(x, t):
        sharding = t.sharding
        if not isinstance(sharding, jax.sharding.NamedSharding):
            # Scalars etc.: replicate over the params' mesh.
            mesh = jax.tree.leaves(template.params)[0].sharding.mesh
            sharding = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()
            )
        return jax.device_put(x, sharding)

    placed = jax.tree.map(place, restored, template_tree)
    return TrainState(
        params=placed["params"],
        opt_state=placed["opt_state"],
        step=placed["step"],
    )


def load_encoder_checkpoint(path: str | Path) -> Tuple[dict, object, str]:
    """Load fine-tuned encoder PARAMS for product consumption.

    ``path`` is a training checkpoint root (latest ``step_N`` picked) or
    a specific ``step_N`` directory, written by ``save_train_state`` with
    a config. Returns ``(params, EncoderConfig, tag)`` where ``tag`` is a
    short digest keying the embedding cache — vectors from different
    fine-tunes must never share cache entries.

    Reference analog: ``rebuild_embeddings(new_model)`` model-swap
    migration (/root/reference/rag/admin/backup.py:205-236) — here the
    "new model" can be this framework's own training output, closing the
    train → serve loop the reference never had.
    """
    import orbax.checkpoint as ocp

    root = Path(path).expanduser().resolve()
    if root.name.startswith("step_") and root.is_dir():
        ckpt = root
    else:
        ckpt = latest_checkpoint(root)
        if ckpt is None:
            raise FileNotFoundError(
                f"no step_N checkpoint under {root} (train with "
                f"tools/train_encoder.py --checkpoint-dir)"
            )
    config = _read_config(ckpt)
    if config is None:
        raise ValueError(
            f"{ckpt} has no {_CONFIG_FILE}; re-save the checkpoint with "
            f"save_train_state(..., config=...) so it is self-describing"
        )
    # Template-free restore: returns the saved tree as host arrays; only
    # the params subtree is needed (opt_state stays on disk unread where
    # the checkpointer supports partial restore).
    checkpointer = ocp.StandardCheckpointer()
    try:
        restored = checkpointer.restore(ckpt)
    except Exception:
        restored = ocp.PyTreeCheckpointer().restore(str(ckpt))
    params = restored["params"]
    tag = _params_digest(params)
    return params, config, f"ckpt-{ckpt.name}-{tag}"


def _params_digest(params, digest_size: int = 6) -> str:
    """Content digest of a params pytree: leaf paths, shapes, dtypes and
    raw bytes. Keys the embedding cache so two fine-tunes that happen to
    land in the same ``--checkpoint-dir`` at the same ``step_N`` can never
    serve each other's cached vectors (the path alone cannot tell them
    apart)."""
    import numpy as np

    h = blake2b(digest_size=digest_size)
    leaves = jax.tree_util.tree_leaves_with_path(params)
    for path, leaf in leaves:
        arr = np.asarray(leaf)
        h.update(jax.tree_util.keystr(path).encode("utf-8"))
        h.update(str(arr.shape).encode("utf-8"))
        h.update(str(arr.dtype).encode("utf-8"))
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()
