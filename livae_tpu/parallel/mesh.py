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

For production training of the reference-sized (~1-3M-param) models, DATA
parallelism is the whole story. A 2-D data x model option exists for the
one place this family outgrows a chip's sweet spot: the post-flatten dense
layers scale with patch_size^2 (a patch-512 encoder fc is ~64M params per
head), so `make_mesh2d` + `dense_param_specs` shard those kernels
Megatron-style over a "model" axis while the small convs replicate. The
recipe: place the state with `place_with_specs`, install the context mesh
with `jax.set_mesh(mesh)` (it resolves the models' `tp_boundary`
collectives), shard the batch on "data", and `jax.jit` infers the rest —
GSPMD inserts the dense psum/all-gather over ICI. Production CLIs expose
it as `--model-parallel M`; see tests/test_parallel.py for the
step-for-step identity proof vs 1-D and single-device.

PP/SP/EP/CP and ring attention remain out of scope: the model has no
attention and no sequence dimension; this mirrors the reference's scope
(SURVEY.md §5 "long-context: absent by design"). Sweep-level parallelism
lives in livae_tpu.sweep.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "make_mesh2d",
    "replicate",
    "shard_batch",
    "shard_train_step",
    "shard_eval_step",
    "fused_epoch_shardings",
    "dense_param_specs",
    "place_with_specs",
    "setup_mesh_from_flags",
    "tp_boundary",
    "resolve_num_devices",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


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


def make_mesh2d(n_data: int, n_model: int, devices=None) -> Mesh:
    """2-D ("data", "model") mesh over n_data * n_model local devices.

    Lay the model axis innermost so its collectives (the dense psum /
    all-gather) ride the fastest ICI links between adjacent chips.
    """
    if devices is None:
        devices = jax.devices()
    need = n_data * n_model
    if len(devices) < need:
        raise ValueError(
            f"Requested {n_data}x{n_model} mesh but only {len(devices)} devices"
        )
    return Mesh(
        np.array(devices[:need]).reshape(n_data, n_model),
        (DATA_AXIS, MODEL_AXIS),
    )


def dense_param_specs(params: Any, n_model: int, min_dim: int = 1024) -> Any:
    """Megatron-style PartitionSpec tree for the large dense layers.

    For every 2-D `kernel` whose largest n_model-divisible axis is at
    least `min_dim`, shard that axis on MODEL_AXIS (the post-flatten axis
    in this family — the only axis that grows with patch_size^2); the
    sibling `bias` shards on MODEL_AXIS only when the kernel's OUTPUT
    axis is the sharded one. Conv kernels and everything else replicate
    (P()) — at 3x3xCinxCout with Cout <= 256 they are too small for
    sharding to beat the collective cost.

    Returns a pytree of PartitionSpec matching `params`, suitable for
    `place_with_specs` (and for sharding optimizer moments, which mirror
    the param tree structure).
    """

    def walk(node):
        if not isinstance(node, dict):
            return jax.tree_util.tree_map(lambda _: P(), node)
        out = {}
        kernel = node.get("kernel")
        kernel_spec = P()
        if kernel is not None and getattr(kernel, "ndim", 0) == 2:
            candidates = [
                a
                for a in (0, 1)
                if kernel.shape[a] >= min_dim and kernel.shape[a] % n_model == 0
            ]
            if candidates:
                axis = max(candidates, key=lambda a: kernel.shape[a])
                kernel_spec = (
                    P(MODEL_AXIS, None) if axis == 0 else P(None, MODEL_AXIS)
                )
        for k, v in node.items():
            if k == "kernel":
                out[k] = kernel_spec
            elif (
                k == "bias"
                and kernel_spec == P(None, MODEL_AXIS)
                and v.shape[0] % n_model == 0
            ):
                out[k] = P(MODEL_AXIS)
            elif isinstance(v, dict):
                out[k] = walk(v)
            else:
                out[k] = P()
        return out

    # flax params are nested plain dicts after model.init (FrozenDict in
    # older flax — normalize through tree utilities if so)
    if hasattr(params, "unfreeze"):
        params = params.unfreeze()
    return walk(params)


def place_with_specs(tree: Any, mesh: Mesh, specs: Any) -> Any:
    """device_put every leaf with its NamedSharding(mesh, spec)."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def setup_mesh_from_flags(
    num_devices: str | int | None,
    model_parallel: int,
    batch_size: int,
    params: Any,
    stack,
) -> tuple[Mesh | None, int, Any]:
    """Shared trainer-CLI mesh setup for --num-devices / --model-parallel.

    Returns (mesh, n_data, params): a 1-D data mesh, or — when
    model_parallel > 1 — a 2-D (data, model) mesh with the large dense
    kernels Megatron-placed via `dense_param_specs`. The context mesh the
    models' `tp_boundary` collectives resolve against is entered on
    `stack` (a contextlib.ExitStack owned by the caller), so it is
    RESTORED when the trainer returns instead of leaking a process-global
    mesh into whatever runs next (sweep drivers, train_rvae_with_best,
    notebooks). Raises SystemExit on inconsistent flags, matching the
    trainers' CLI error style.
    """
    n_devices = resolve_num_devices(num_devices)
    mp = max(1, int(model_parallel))
    if n_devices % mp:
        raise SystemExit(
            f"--num-devices {n_devices} must be divisible by "
            f"--model-parallel {mp}"
        )
    n_data = n_devices // mp
    if n_devices == 1:
        return None, 1, params
    if batch_size % n_data:
        raise SystemExit(
            f"--batch-size {batch_size} must be divisible by the "
            f"data-parallel ways ({n_data} = --num-devices/--model-parallel)"
        )
    if mp == 1:
        mesh = make_mesh(n_devices)
        print(f"Data-parallel mesh: {n_devices} devices {mesh.shape}")
        return mesh, n_data, params
    mesh = make_mesh2d(n_data, mp)
    stack.enter_context(jax.set_mesh(mesh))
    specs = dense_param_specs(params, n_model=mp)
    params = place_with_specs(params, mesh, specs)
    n_sharded = sum(
        1
        for s in jax.tree_util.tree_leaves(
            specs, is_leaf=lambda x: isinstance(x, P)
        )
        if s != P()
    )
    print(
        f"2-D mesh: {n_data} data x {mp} model {mesh.shape}; "
        f"{n_sharded} model-sharded dense params"
    )
    if n_sharded == 0:
        print(
            "  note: no dense kernel is large enough to shard at this "
            "patch size — running as pure data parallelism"
        )
    return mesh, n_data, params


def tp_boundary(x: jax.Array) -> jax.Array:
    """End a Megatron column-parallel region: all-gather the model axis.

    Constrains a batch-leading activation to (DATA_AXIS, None, ...) —
    batch stays data-sharded, every feature axis is gathered. Placed at
    the output of a column-parallel dense layer this is the canonical
    Megatron boundary collective, and it stops GSPMD from propagating the
    model-axis sharding into downstream reshapes (e.g. the decoder's
    feature->spatial reshape, where a model-sharded tiny spatial dim
    trips XLA SPMD partitioner edge cases in the edge-padded, scatter-
    corrected fused upconv — observed as silently wrong values on the
    CPU backend).

    No-op unless a mesh is installed in context via `jax.set_mesh(mesh)`
    (the 2-D TP call sites do this); single-device and plain 1-D DP
    callers pay nothing.
    """
    am = jax.sharding.get_abstract_mesh()
    if am is None or not am.axis_names:
        return x
    batch = DATA_AXIS if DATA_AXIS in am.axis_names else None
    return jax.lax.with_sharding_constraint(
        x, P(batch, *([None] * (x.ndim - 1)))
    )


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

    On a 2-D ("data", "model") mesh the state/params slot is left
    UNCONSTRAINED (None) instead of replicated, so a Megatron-placed
    state (see `dense_param_specs`) keeps its model sharding through the
    step; jit infers the matching output sharding. On a 1-D data mesh
    the behavior is unchanged: everything but idx_batches replicates.
    """
    repl = NamedSharding(mesh, P())
    idx = NamedSharding(mesh, P(None, DATA_AXIS))  # [steps, batch]
    state_sh = None if MODEL_AXIS in mesh.axis_names else repl
    in_shardings = (state_sh, repl, repl, repl, idx, repl, repl, repl)
    out_shardings = (state_sh, repl)
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
