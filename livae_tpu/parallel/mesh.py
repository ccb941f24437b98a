"""Multi-chip data parallelism over a jax.sharding.Mesh.

The reference has no tensor parallelism of any kind — its only scale-out
is DataLoader worker processes and Ray Tune trial parallelism (SURVEY.md
§2c; verified: no torch.distributed / NCCL / MPI anywhere). For a
~1-3M-parameter convnet the one strategy that matters is DATA parallelism:
replicate parameters, shard the patch batch across chips, and let XLA
GSPMD insert the psum gradient all-reduce over ICI.

This module provides the mesh + sharding plumbing:

* `make_mesh(n_devices)` — 1-D "data" mesh over local devices.
* `shard_train_step(step_fn, mesh)` — re-jit a train step with
  replicated-state / batch-sharded input shardings. Loss reductions are
  global means, so gradients come out already all-reduced; no manual
  collectives needed (the GSPMD equivalent of the reference's missing
  DDP).
* `shard_batch` / `replicate` — explicit placement helpers.

TP/PP/SP/EP/CP and ring attention are intentionally out of scope: the
model has no attention and fits on one chip many times over; this mirrors
the reference's scope (SURVEY.md §5 "long-context: absent by design").
Sweep-level parallelism lives in livae_tpu.sweep.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_train_step",
    "shard_eval_step",
    "fused_epoch_shardings",
    "resolve_num_devices",
]

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over (a prefix of) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"Requested {n_devices} devices but only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard leading (batch) axis of every leaf across the data axis."""

    def put(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def _batch_spec(mesh: Mesh):
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_train_step(
    step_fn: Callable,
    mesh: Mesh,
    n_batch_args: int = 1,
    donate_state: bool = True,
) -> Callable:
    """Data-parallel jit of a train step built by livae_tpu.train.engine.

    Signature convention: step_fn(state, *batch_args, key, beta, gamma).
    State/key/scalars are replicated; each batch arg is sharded on its
    leading axis. XLA GSPMD handles the gradient all-reduce because the
    loss is a global mean over the sharded batch.
    """
    repl = NamedSharding(mesh, P())
    bat = _batch_spec(mesh)
    in_shardings = (repl,) + (bat,) * n_batch_args + (repl, repl, repl)
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )


def shard_eval_step(eval_fn: Callable, mesh: Mesh, n_batch_args: int = 1) -> Callable:
    """Data-parallel jit of an eval step: eval_fn(params, *batch, key, b, g)."""
    repl = NamedSharding(mesh, P())
    bat = _batch_spec(mesh)
    in_shardings = (repl,) + (bat,) * n_batch_args + (repl, repl, repl)
    return jax.jit(eval_fn, in_shardings=in_shardings, out_shardings=repl)


def fused_epoch_shardings(mesh: Mesh) -> tuple[Any, Any]:
    """(in_shardings, out_shardings) for the fused whole-epoch steps.

    Fused-step signature: step(state, frames_padded, img_idx, coords,
    idx_batches[S, B], key, beta, gamma) -> (state, metrics). Sharding
    the batch axis of `idx_batches` shards the whole chain — the gather
    of per-site coords, the ROI extraction, and the model forward all
    inherit the batch sharding via GSPMD, and the global-mean loss makes
    gradients come out psum-reduced over ICI. Everything else (params,
    opt state, the device-resident frames, RNG key, scalars) replicates.
    """
    repl = NamedSharding(mesh, P())
    idx = NamedSharding(mesh, P(None, DATA_AXIS))  # [steps, batch]
    in_shardings = (repl, repl, repl, repl, idx, repl, repl, repl)
    out_shardings = (repl, repl)
    return in_shardings, out_shardings


def resolve_num_devices(spec: str | int | None) -> int:
    """Parse a --num-devices flag value: int, "auto" (all local), or None (1)."""
    if spec is None:
        return 1
    if isinstance(spec, str):
        if spec.lower() == "auto":
            return jax.local_device_count()
        spec = int(spec)
    if spec < 1:
        raise ValueError(f"--num-devices must be >= 1 or 'auto', got {spec}")
    return spec
