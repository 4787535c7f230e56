"""Training-state checkpointing via orbax.

The retrieval side already has durable state (catalog JSONL + embeddings +
dump/restore with checksums, matching the reference's story). This module
covers the side the reference never had: encoder fine-tuning runs.
Orbax handles sharded arrays transparently, so a state saved from a
(data, model) mesh restores onto a different mesh layout.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax

from classmate_rag_tpu.training.contrastive import TrainState


def save_train_state(state: TrainState, directory: str | Path) -> str:
    """Write a checkpoint; returns the checkpoint path."""
    import orbax.checkpoint as ocp

    path = Path(directory).resolve() / f"step_{int(state.step)}"
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, dict(
        params=state.params, opt_state=state.opt_state, step=state.step,
    ), force=True)
    checkpointer.wait_until_finished()
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
