"""Vmapped stacked trials: train K hyperparameter configs in ONE jit.

SURVEY.md §2c names "vmapped multi-config training for small models" as
the TPU-native alternative to the reference's fractional-GPU trial
packing (reference scripts/train_rvae_raytune.py:374-395,
``--gpus-per-trial 0.25``). The ~1-3M-param model leaves a TPU chip
mostly idle at production batch sizes (BASELINE.md roofline: every stage
is far from both the MXU and HBM ceilings, i.e. the step is
latency/overhead-bound), so instead of time-slicing trials (thread
executor) or per-chip pinning (process executor), this module vmaps the
fused whole-epoch step over a leading TRIAL axis: K trials train
simultaneously in one dispatch, the compiler sees K-fold more parallel
work per kernel, and one compile serves every stack of the same shape.

What can vary per lane (vmappable hyperparameters):
  * lr / weight_decay — optax *injected* hyperparams, live in opt_state
    (the same mechanism the thread/process executors use for
    recompile-free PBT exploits);
  * beta / gamma — step arguments;
  * the init seed — each lane gets independently initialized params.

What must be shared within a stack (structural, changes traced shapes):
  patch_size, latent_dim, batch_size, epochs. `run_search_stacked`
  groups sampled configs by their structural signature and runs one
  vmapped stack per group each round, so the search space MAY still
  include structural choices — they just land in different stacks (each
  distinct signature/stack-width pays one compile).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .search import Trial, _make_searcher, _write_results

__all__ = [
    "stack_trees",
    "unstack_tree",
    "make_stacked_fns",
    "set_stacked_hyperparams",
    "run_search_stacked",
    "STRUCTURAL_KEYS",
]

# Config keys that change traced shapes (or the compiled epoch program)
# and therefore must be constant within one vmapped stack.
STRUCTURAL_KEYS = (
    "patch_size", "padding", "latent_dim", "batch_size", "epochs",
    "val_split", "grad_max_norm", "normalize", "beta_annealing",
    "beta_annealing_epochs",
)


def stack_trees(trees: Sequence[Any]) -> Any:
    """Stack a list of identically-structured pytrees along a new axis 0."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def unstack_tree(tree: Any, k: int) -> list[Any]:
    """Inverse of stack_trees: split axis 0 into k pytrees."""
    return [jax.tree_util.tree_map(lambda x: x[i], tree) for i in range(k)]


def make_stacked_fns(step_impl: Callable, eval_impl: Callable):
    """jit(vmap) the un-jitted fused step/eval bodies over a trial axis.

    Both bodies follow the fused-epoch signature
    (state_or_params, frames_padded, img_idx, coords, idx_batches, key,
    beta, gamma); the device-resident site table (frames/img_idx/coords)
    broadcasts across lanes, everything trial-specific maps over axis 0.
    Obtain the bodies with ``return_impl=True`` from the engine makers
    (livae_tpu.train.engine.make_fused_vae_train_step / make_fused_eval).
    """
    axes = (0, None, None, None, 0, 0, 0, 0)
    stacked_step = jax.jit(jax.vmap(step_impl, in_axes=axes), donate_argnums=0)
    stacked_eval = jax.jit(jax.vmap(eval_impl, in_axes=axes))
    return stacked_step, stacked_eval


def set_stacked_hyperparams(state, learning_rates, weight_decays):
    """Per-lane lr/weight_decay on a stacked TrainState.

    The optimizer must be optax.inject_hyperparams(...)-wrapped so the
    scalars are opt_state leaves; on a stacked state they are [K] arrays
    and each vmap lane reads its own value — no recompile when they
    change between epochs (per-epoch cosine lr) or between rounds.
    """
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(learning_rates, jnp.float32)
    hp["weight_decay"] = jnp.asarray(weight_decays, jnp.float32)
    return state.replace(opt_state=state.opt_state._replace(hyperparams=hp))


def _structural_signature(config: dict, keys: Sequence[str]) -> tuple:
    return tuple((k, config[k]) for k in keys if k in config)


def run_search_stacked(
    stacked_trainable: Callable[[list[dict], Callable], None],
    param_space: dict,
    num_samples: int = 8,
    stack_size: int = 4,
    metric: str = "loss",
    mode: str = "min",
    results_dir: str | Path = "sweep_results",
    seed: int = 0,
    search_alg: str | None = None,
    structural_keys: Sequence[str] = STRUCTURAL_KEYS,
) -> list[Trial]:
    """Execute a sweep in vmapped stacks of up to `stack_size` trials.

    Rounds: suggest `stack_size` configs from the searcher (TPE sees all
    completed observations between rounds, like max_concurrent in the
    threaded engine), group them by structural signature, and hand each
    group to `stacked_trainable(configs, report)`; the trainable calls
    ``report(lane, epoch, **metrics)`` per lane per epoch. Early-stopping
    schedulers (ASHA/PBT) do not apply inside a stack — lanes share one
    program — so every trial runs its full epoch budget.

    Writes the same results.json as run_search; returns all trials.
    """
    results_dir = Path(results_dir)
    results_dir.mkdir(parents=True, exist_ok=True)
    searcher = _make_searcher(search_alg, param_space, metric, mode, seed)

    trials: list[Trial] = []
    observations: list[tuple[dict, float]] = []
    while len(trials) < num_samples:
        k = min(stack_size, num_samples - len(trials))
        configs = [searcher.suggest(observations) for _ in range(k)]
        groups: dict[tuple, list[dict]] = {}
        for cfg in configs:
            groups.setdefault(
                _structural_signature(cfg, structural_keys), []
            ).append(cfg)
        for group in groups.values():
            base_id = len(trials)
            group_trials = [
                Trial(trial_id=base_id + i, config=cfg, status="running")
                for i, cfg in enumerate(group)
            ]
            trials.extend(group_trials)

            def report(lane: int, epoch: int, checkpoint: Any = None, **metrics):
                t = group_trials[lane]
                t.history.append({"epoch": epoch, **metrics})
                if checkpoint is not None:
                    t.checkpoint = checkpoint

            try:
                stacked_trainable([dict(c) for c in group], report)
            except Exception as e:  # noqa: BLE001 - trial fault tolerance
                for t in group_trials:
                    t.status = "error"
                    t.error = f"{type(e).__name__}: {e}"
                continue
            for t in group_trials:
                t.status = "done"
                val = t.best(metric, mode)
                if val is not None:
                    observations.append((dict(t.config), val))
                last = t.last(metric)
                print(
                    f"Trial {t.trial_id}: {t.status} after "
                    f"{len(t.history)} epochs (stacked x{len(group)}), "
                    f"{metric}={last if last is not None else 'n/a'}"
                )

    _write_results(trials, results_dir, metric, mode)
    return trials
