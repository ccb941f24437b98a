"""Native fast checkpointing (Orbax) + auto-resume.

The reference has two checkpoint formats but NO mid-training resume
(SURVEY.md §5: "no checkpoint-based auto-resume"): a crash loses the
optimizer state and the run restarts from epoch 0. This module adds the
TPU-native layer: the full TrainState (params + optimizer moments + step)
plus host metadata (epoch, best_val, rng seed) checkpointed with Orbax,
and `--resume` in the train CLIs restores it exactly. The
reference-compatible torch.save checkpoints remain the interchange format
(utils/checkpoint.py); Orbax is the fast internal format.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np

__all__ = ["save_train_state", "restore_train_state", "latest_step"]


def _mgr(directory: str | Path):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        Path(directory).resolve(),
        options=ocp.CheckpointManagerOptions(max_to_keep=2, create=True),
    )


def save_train_state(
    directory: str | Path, step: int, state: Any, metadata: dict | None = None
) -> None:
    """Checkpoint a TrainState pytree + JSON metadata at `step`."""
    import orbax.checkpoint as ocp

    mgr = _mgr(directory)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    if metadata is not None:
        meta_path = Path(directory).resolve() / f"metadata_{step}.json"
        meta_path.write_text(json.dumps(metadata))


def latest_step(directory: str | Path) -> int | None:
    import orbax.checkpoint as ocp

    d = Path(directory).resolve()
    if not d.exists():
        return None
    mgr = _mgr(d)
    return mgr.latest_step()


def restore_train_state(
    directory: str | Path, abstract_state: Any, step: int | None = None
) -> tuple[Any, dict]:
    """Restore (state, metadata); abstract_state provides the pytree spec."""
    import orbax.checkpoint as ocp

    d = Path(directory).resolve()
    mgr = _mgr(d)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"No orbax checkpoints in {d}")
    def _abstract(x):
        if not hasattr(x, "dtype"):
            return x
        # Preserve the template leaf's sharding so a model-parallel state
        # (Megatron-placed dense kernels, see parallel.mesh) restores onto
        # the same mesh layout instead of single-device arrays.
        sharding = x.sharding if isinstance(x, jax.Array) else None
        return jax.ShapeDtypeStruct(np.shape(x), x.dtype, sharding=sharding)

    abstract = jax.tree_util.tree_map(_abstract, abstract_state)
    state = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    meta_path = d / f"metadata_{step}.json"
    metadata = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    metadata.setdefault("step", step)
    return state, metadata
