#!/usr/bin/env python
"""Hyperparameter search for rVAE training (Ray-Tune-compatible CLI).

Capability parity with the reference sweep harness (reference:
scripts/train_rvae_raytune.py): the same search space
(lr/latent_dim/beta/weight_decay/batch_size as loguniform/choice), ASHA
(grace period auto-clamped to epochs/2) and PBT schedulers, hyperopt
search-alg flag, per-epoch metric+checkpoint reporting, best-trial
summary, and best_config.json export for train_rvae_with_best.py.

Backend: Ray Tune when importable (it is not in this image), otherwise
the native engine in livae_tpu.sweep with identical semantics. Each trial
trains RVAE with the mean-reduced VAE loss — exactly the reference's
trial function (train_rvae_raytune.py:140-161) — through the FUSED
whole-epoch step (extraction + all optimizer steps in one dispatch) so a
sweep is not dominated by per-batch dispatch latency, and `grad_max_norm`
is honored (the reference passes it to a function that doesn't accept it
and would TypeError; fixed here, SURVEY.md §7). --max-concurrent trials
run in flight at once; PBT exploits adopt the donor checkpoint's weights
mid-run. Two concurrent executors:

* thread (default): worker threads share the local chip — the one-chip
  analog of fractional-GPU packing; dataset and compiled steps are
  shared across trials.
* process (--executor process): one spawned process per trial with
  per-slot chip pinning via `default_trial_env` (TPU_VISIBLE_DEVICES et
  al.) — on a multi-chip host each slot trains on its own chip, the
  direct tune.with_resources analog (reference
  train_rvae_raytune.py:374-395).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import threading
from pathlib import Path

import jax
import jax.numpy as jnp

from _common import add_data_flags, resolve_images, split_indices

from livae_tpu.data.datasets import AdaptiveLatticeDataset, default_transform
from livae_tpu.models.rvae import RVAE
from livae_tpu.models import init_params
from livae_tpu.sweep import (
    ASHAScheduler,
    PBTScheduler,
    choice,
    get_best_result,
    loguniform,
    run_search,
    run_search_stacked,
)
from livae_tpu.sweep.stacked import (
    make_stacked_fns,
    set_stacked_hyperparams,
    stack_trees,
    unstack_tree,
)
from livae_tpu.train.engine import (
    evaluate_fused,
    metrics_to_host,
    make_fused_eval,
    make_fused_vae_train_step,
)
from livae_tpu.train.state import TrainState
from livae_tpu.utils.checkpoint import (
    load_checkpoint,
    rvae_spec,
    save_reference_checkpoint,
    torch_state_to_params,
)


def _set_hyperparams(state, lr, weight_decay):
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    hp["weight_decay"] = jnp.asarray(weight_decay, jnp.float32)
    return state.replace(opt_state=state.opt_state._replace(hyperparams=hp))


def _build_compiled(dataset, patch_size, padding, latent_dim, grad_max_norm,
                    normalize):
    """Model + optimizer + fused step/eval for one architecture key.

    lr/weight_decay are optax injected hyperparameters (traced values in
    opt_state), so trials with different lr share ONE compile and PBT
    exploits don't recompile either.
    """
    import optax

    model = RVAE(
        latent_dim=latent_dim, patch_size=patch_size, compute_dtype="bfloat16",
    )
    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=1e-3, weight_decay=1e-5
    )
    step = make_fused_vae_train_step(
        model, tx, patch_size=patch_size, padding=padding,
        cfg=dataset.transform, margin=dataset._margin,
        grad_max_norm=grad_max_norm, normalize=normalize,
    )
    fused_eval = make_fused_eval(
        model, patch_size=patch_size, padding=padding,
        margin=dataset._margin, normalize=normalize,
    )
    return model, tx, step, fused_eval


def _trial_body(config, report, dataset, compiled, ckpt_path, trial_seed,
                extra_metrics=None):
    """One trial's training loop (shared by the thread and process paths).

    Trains RVAE with the mean-reduced VAE loss — the reference's trial
    function (reference train_rvae_raytune.py:140-161) — via the fused
    whole-epoch step. lr follows the reference trial's per-epoch
    CosineAnnealingLR.step() semantics (constant within an epoch).
    """
    import math

    model, tx, step, fused_eval = compiled
    train_idx, val_idx = split_indices(len(dataset), config["val_split"], seed=0)
    if len(train_idx) == 0:
        raise ValueError(
            f"empty train split ({len(dataset)} sites total); use larger "
            "frames or a smaller --val-split"
        )
    batch_size = min(int(config["batch_size"]), len(train_idx))
    patch_size = int(config["patch_size"])
    latent_dim = int(config["latent_dim"])
    spec = rvae_spec(patch_size, latent_dim)
    epochs = int(config["epochs"])

    key = jax.random.key(trial_seed)
    key, ik, sk = jax.random.split(key, 3)
    params = init_params(model, 
        {"params": ik, "sample": sk},
        jnp.zeros((1, patch_size, patch_size, 1)),
    )
    state = TrainState.create(params, tx)
    frames_padded, img_idx_dev, coords_dev, _ = dataset.device_site_table

    for epoch in range(epochs):
        beta = config["beta"]
        if config.get("beta_annealing"):
            beta *= min(1.0, (epoch + 1) / max(config["beta_annealing_epochs"], 1))
        lr_e = 0.5 * config["lr"] * (1.0 + math.cos(math.pi * epoch / max(epochs, 1)))
        state = _set_hyperparams(state, lr_e, config["weight_decay"])
        key, ek, vk = jax.random.split(key, 3)

        kperm, kstep = jax.random.split(ek)
        perm = jax.random.permutation(kperm, len(train_idx))
        steps = max(1, len(train_idx) // batch_size)
        idx_batches = jnp.asarray(train_idx)[
            perm[: steps * batch_size]
        ].reshape(steps, -1)
        gamma = float(config.get("gamma") or 0.0)
        state, tm = step(
            state, frames_padded, img_idx_dev, coords_dev,
            idx_batches, kstep, beta, gamma,
        )
        vm = evaluate_fused(
            fused_eval, fused_eval, state.params, dataset.device_site_table,
            val_idx, min(batch_size, len(val_idx)), vk, beta=beta, gamma=gamma,
        )
        val_loss = vm.get("val_loss", float("inf"))

        save_reference_checkpoint(
            ckpt_path, state.params, spec,
            epoch=epoch, best_val=val_loss,
            args={k: v for k, v in config.items() if not isinstance(v, (list, dict))},
        )
        out = report(
            epoch=epoch + 1,
            loss=val_loss,
            val_loss=val_loss,
            train_loss=float(metrics_to_host(tm)["loss"]),
            val_psnr=vm.get("val_psnr", 0.0),
            checkpoint=ckpt_path,
            **(extra_metrics or {}),
        )
        if isinstance(out, dict):
            # PBT exploit: adopt the donor's mutated scalars for the
            # remaining epochs and, when the architecture matches,
            # restart from the donor checkpoint's weights (Ray PBT's
            # restore semantics). No recompile: lr/wd are injected.
            new_cfg = out["config"]
            config.update(
                {k: v for k, v in new_cfg.items() if k in ("lr", "beta")}
            )
            donor_ckpt = out.get("checkpoint")
            same_arch = (
                int(new_cfg.get("latent_dim", latent_dim)) == latent_dim
                and int(new_cfg.get("patch_size", patch_size)) == patch_size
            )
            if donor_ckpt and same_arch and Path(str(donor_ckpt)).exists():
                donor = load_checkpoint(str(donor_ckpt))
                params = torch_state_to_params(donor["model_state"], spec)
                state = TrainState.create(params, tx)


def make_trainable(args, images):
    """Build the per-trial training function for the thread executor.

    The dataset is built once and shared across trials (the reference
    rebuilt it per trial, train_rvae_raytune.py:128-137 — pure waste);
    the cache is lock-protected for concurrent executors. Jitted
    step/eval are cached across trials by their STATIC shape key.
    """
    dataset_cache: dict[tuple, AdaptiveLatticeDataset] = {}
    cache_lock = threading.Lock()

    def get_dataset(patch_size, padding, normalize):
        key = (patch_size, padding, normalize)
        with cache_lock:
            if key not in dataset_cache:
                dataset_cache[key] = AdaptiveLatticeDataset(
                    images, patch_size=patch_size, padding=padding,
                    transform=default_transform, normalize=normalize,
                )
            return dataset_cache[key]

    ckpt_dir = Path(args.ray_results_dir) / args.experiment_name / "checkpoints"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    trial_counter = [0]
    step_cache: dict[tuple, tuple] = {}

    def get_compiled(patch_size, padding, latent_dim, grad_max_norm, normalize,
                     dataset):
        key = (patch_size, padding, latent_dim, grad_max_norm, normalize)
        with cache_lock:
            if key not in step_cache:
                step_cache[key] = _build_compiled(
                    dataset, patch_size, padding, latent_dim, grad_max_norm,
                    normalize,
                )
            return step_cache[key]

    def train_rvae_tune(config, report):
        with cache_lock:
            trial_id = trial_counter[0]
            trial_counter[0] += 1

        normalize = bool(config.get("normalize", True))
        dataset = get_dataset(config["patch_size"], config["padding"], normalize)
        compiled = get_compiled(
            int(config["patch_size"]), int(config["padding"]),
            int(config["latent_dim"]),
            float(config.get("grad_max_norm") or 20.0), normalize, dataset,
        )
        ckpt_path = str(ckpt_dir / f"trial_{trial_id}.pt")
        _trial_body(config, report, dataset, compiled, ckpt_path,
                    trial_seed=trial_id)

    return train_rvae_tune


def make_stacked_trainable(args, images):
    """K-config vmapped trainable for run_search_stacked.

    The TPU-native third executor (SURVEY.md §2c "vmapped multi-config
    training"): one jit trains every trial in the stack simultaneously —
    per-lane lr/weight_decay ride the injected optax hyperparams, beta/
    gamma are vmapped step args, and each lane gets its own init seed.
    Per-epoch semantics match _trial_body exactly (same cosine lr, same
    beta annealing, same per-trial seeds), so a stacked sweep is the same
    experiment as a sequential one, just K-at-a-time.
    """
    import math

    import numpy as np
    import optax

    dataset_cache: dict[tuple, AdaptiveLatticeDataset] = {}
    fns_cache: dict[tuple, tuple] = {}
    ckpt_dir = Path(args.ray_results_dir) / args.experiment_name / "checkpoints"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    trial_counter = [0]

    def get_dataset(patch_size, padding, normalize):
        key = (patch_size, padding, normalize)
        if key not in dataset_cache:
            dataset_cache[key] = AdaptiveLatticeDataset(
                images, patch_size=patch_size, padding=padding,
                transform=default_transform, normalize=normalize,
            )
        return dataset_cache[key]

    def get_fns(patch_size, padding, latent_dim, grad_max_norm, normalize,
                dataset):
        key = (patch_size, padding, latent_dim, grad_max_norm, normalize)
        if key not in fns_cache:
            model = RVAE(
                latent_dim=latent_dim, patch_size=patch_size,
                compute_dtype="bfloat16",
            )
            tx = optax.inject_hyperparams(optax.adamw)(
                learning_rate=1e-3, weight_decay=1e-5
            )
            step_impl = make_fused_vae_train_step(
                model, tx, patch_size=patch_size, padding=padding,
                cfg=dataset.transform, margin=dataset._margin,
                grad_max_norm=grad_max_norm, normalize=normalize,
                return_impl=True,
            )
            eval_impl = make_fused_eval(
                model, patch_size=patch_size, padding=padding,
                margin=dataset._margin, normalize=normalize,
                return_impl=True,
            )
            fns_cache[key] = (model, tx, *make_stacked_fns(step_impl, eval_impl))
        return fns_cache[key]

    def stacked_trainable(configs, report):
        cfg0 = configs[0]
        K = len(configs)
        trial_ids = list(range(trial_counter[0], trial_counter[0] + K))
        trial_counter[0] += K

        normalize = bool(cfg0.get("normalize", True))
        patch_size = int(cfg0["patch_size"])
        latent_dim = int(cfg0["latent_dim"])
        epochs = int(cfg0["epochs"])
        dataset = get_dataset(patch_size, int(cfg0["padding"]), normalize)
        model, tx, stacked_step, stacked_eval = get_fns(
            patch_size, int(cfg0["padding"]), latent_dim,
            float(cfg0.get("grad_max_norm") or 20.0), normalize, dataset,
        )
        spec = rvae_spec(patch_size, latent_dim)

        train_idx, val_idx = split_indices(
            len(dataset), cfg0["val_split"], seed=0
        )
        if len(train_idx) == 0:
            raise ValueError("empty train split; use larger frames")
        batch_size = min(int(cfg0["batch_size"]), len(train_idx))
        steps = max(1, len(train_idx) // batch_size)
        train_idx = jnp.asarray(train_idx)
        frames_padded, img_idx_dev, coords_dev, _ = dataset.device_site_table

        # per-lane states with the thread path's per-trial seeds
        lane_keys, states = [], []
        for tid in trial_ids:
            key, ik, sk = jax.random.split(jax.random.key(tid), 3)
            lane_keys.append(key)
            params = init_params(model, 
                {"params": ik, "sample": sk},
                jnp.zeros((1, patch_size, patch_size, 1)),
            )
            states.append(TrainState.create(params, tx))
        state = stack_trees(states)

        # the val batch split is shared; stack it across lanes
        val_bs = min(batch_size, max(1, len(val_idx)))
        n_full = max(1, len(val_idx) // val_bs)
        val_main = jnp.asarray(
            np.asarray(val_idx)[: n_full * val_bs], jnp.int32
        ).reshape(n_full, val_bs)
        val_idxK = jnp.stack([val_main] * K)

        betas_cfg = [float(c["beta"]) for c in configs]
        gammas = jnp.asarray(
            [float(c.get("gamma") or 0.0) for c in configs], jnp.float32
        )
        for epoch in range(epochs):
            anneal = 1.0
            if cfg0.get("beta_annealing"):
                anneal = min(
                    1.0, (epoch + 1) / max(cfg0["beta_annealing_epochs"], 1)
                )
            betas = jnp.asarray(
                [b * anneal for b in betas_cfg], jnp.float32
            )
            lrs = [
                0.5 * c["lr"] * (1.0 + math.cos(math.pi * epoch / max(epochs, 1)))
                for c in configs
            ]
            wds = [c["weight_decay"] for c in configs]
            state = set_stacked_hyperparams(state, lrs, wds)

            ek_l, vk_l, kstep_l, idx_l = [], [], [], []
            for i in range(K):
                lane_keys[i], ek, vk = jax.random.split(lane_keys[i], 3)
                kperm, kstep = jax.random.split(ek)
                perm = jax.random.permutation(kperm, len(train_idx))
                idx_l.append(train_idx[perm[: steps * batch_size]].reshape(steps, -1))
                kstep_l.append(kstep)
                vk_l.append(vk)
            state, tm = stacked_step(
                state, frames_padded, img_idx_dev, coords_dev,
                jnp.stack(idx_l), jnp.stack(kstep_l), betas, gammas,
            )
            vm = stacked_eval(
                state.params, frames_padded, img_idx_dev, coords_dev,
                val_idxK, jnp.stack(vk_l), betas, gammas,
            )
            tm_host = metrics_to_host(tm)   # {name: [K]}
            vm_host = metrics_to_host(vm)   # {name: [K, S]}

            params_by_lane = unstack_tree(state.params, K)
            for i in range(K):
                val_loss = float(np.mean(vm_host["loss"][i]))
                ckpt_path = str(ckpt_dir / f"trial_{trial_ids[i]}.pt")
                save_reference_checkpoint(
                    ckpt_path, params_by_lane[i], spec,
                    epoch=epoch, best_val=val_loss,
                    args={k: v for k, v in configs[i].items()
                          if not isinstance(v, (list, dict))},
                )
                report(
                    i, epoch + 1,
                    loss=val_loss,
                    val_loss=val_loss,
                    train_loss=float(tm_host["loss"][i]),
                    val_psnr=float(np.mean(vm_host["psnr"][i])),
                    checkpoint=ckpt_path,
                )

    return stacked_trainable


def process_trainable(data_spec, config, report):
    """Module-level (picklable) trial for the spawn-based process executor.

    Runs in a fresh worker process with its slot's env applied by
    `default_trial_env` before JAX initializes, so on a multi-chip host
    each trial sees exactly one TPU chip — the tune.with_resources
    fractional-resource packing analog (reference
    train_rvae_raytune.py:374-395). Data and compiled steps are rebuilt
    in-process (as the reference's Ray workers do,
    train_rvae_raytune.py:128-137).
    """
    force = os.environ.get("LIVAE_FORCE_PLATFORM")
    if force:
        # The env var alone can be consulted before user code runs only in
        # interpreters that honor it; the config API always works.
        jax.config.update("jax_platforms", force)

    ns = argparse.Namespace(**{
        k: data_spec.get(k)
        for k in ("synthetic", "synthetic_size", "synthetic_vacancy_rate",
                  "synthetic_s_amplitude", "data", "dataset_name")
    })
    images = resolve_images(ns)
    normalize = bool(config.get("normalize", True))
    dataset = AdaptiveLatticeDataset(
        images, patch_size=config["patch_size"], padding=config["padding"],
        transform=default_transform, normalize=normalize,
    )
    compiled = _build_compiled(
        dataset, int(config["patch_size"]), int(config["padding"]),
        int(config["latent_dim"]), float(config.get("grad_max_norm") or 20.0),
        normalize,
    )
    ckpt_dir = Path(data_spec["ckpt_dir"])
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    # The executor exports a deterministic trial id (search.py launch());
    # pid-based naming was irreproducible across runs and collides on reuse.
    trial_id = int(os.environ.get("LIVAE_TRIAL_ID", os.getpid()))
    ckpt_path = str(ckpt_dir / f"trial_{trial_id}.pt")
    _trial_body(
        config, report, dataset, compiled, ckpt_path, trial_seed=trial_id,
        extra_metrics={
            "slot": os.environ.get("LIVAE_SWEEP_SLOT", ""),
            "pid": os.getpid(),
        },
    )


def default_trial_env(slot: int, force_platform: str | None = None) -> dict:
    """Per-slot device pinning env (the tune.with_resources analog).

    On a multi-chip TPU host each sweep slot claims one chip via the TPU
    runtime's visibility variables, so concurrent process trials train on
    disjoint chips. `force_platform` pins the XLA backend instead (CPU
    smoke tests); process_trainable applies it through the config API.
    """
    env = {"LIVAE_SWEEP_SLOT": str(slot)}
    if force_platform:
        env["LIVAE_FORCE_PLATFORM"] = force_platform
    else:
        env.update({
            "TPU_VISIBLE_DEVICES": str(slot),
            "TPU_PROCESS_BOUNDS": "1,1,1",
            "TPU_CHIPS_PER_PROCESS_BOUNDS": "1,1,1",
        })
    return env


def run_hyperparameter_search(args) -> None:
    try:
        import ray  # noqa: F401

        print("note: Ray detected but the native engine is used for TPU trials")
    except ImportError:
        pass

    param_space = {
        "lr": loguniform(args.lr_min, args.lr_max),
        "latent_dim": choice(args.latent_dims),
        "beta": loguniform(args.beta_min, args.beta_max),
        "weight_decay": loguniform(args.weight_decay_min, args.weight_decay_max),
        "batch_size": choice(args.batch_sizes),
        # per-patch min-max normalization: searchable with --search-norm
        # (the BASELINE.md vacancy ablation's decisive axis), else fixed
        "normalize": (
            choice([True, False]) if args.search_norm
            else not args.no_per_patch_norm
        ),
        # rotation-diversity weight (0 = the reference trial's plain
        # VAELoss); searchable for the vacancy program (VERDICT r2 item 5)
        "gamma": (
            loguniform(args.gamma_min, args.gamma_max) if args.search_gamma
            else args.gamma
        ),
        # fixed parameters
        "patch_size": args.patch_size,
        "padding": args.padding,
        "val_split": args.val_split,
        "epochs": args.epochs,
        "beta_annealing": args.beta_annealing,
        "beta_annealing_epochs": args.beta_annealing_epochs,
        "grad_max_norm": args.grad_max_norm,
    }

    if args.scheduler == "asha":
        grace = min(args.grace_period, max(1, args.epochs // 2))
        scheduler = ASHAScheduler(
            metric="loss", mode="min", max_t=args.epochs,
            grace_period=grace, reduction_factor=args.reduction_factor,
        )
        print(f"ASHA: grace={grace}, max_t={args.epochs}, rf={args.reduction_factor}")
    elif args.scheduler == "pbt":
        scheduler = PBTScheduler(
            metric="loss", mode="min",
            perturbation_interval=args.perturbation_interval,
            hyperparam_mutations={
                "lr": loguniform(args.lr_min, args.lr_max),
                "beta": loguniform(args.beta_min, args.beta_max),
            },
        )
        print(f"PBT: interval={args.perturbation_interval}")
    else:
        scheduler = None

    results_dir = Path(args.ray_results_dir) / args.experiment_name
    executor = None if args.executor in (None, "auto") else args.executor
    trial_env = None
    if executor == "process":
        # Module-level picklable trainable + per-slot chip pinning; the
        # children rebuild data from this spec (nothing unpicklable).
        data_spec = {
            "synthetic": getattr(args, "synthetic", 0),
            "synthetic_size": getattr(args, "synthetic_size", 1024),
            "synthetic_vacancy_rate": getattr(args, "synthetic_vacancy_rate", None),
            "synthetic_s_amplitude": getattr(args, "synthetic_s_amplitude", None),
            "data": args.data,
            "dataset_name": getattr(args, "dataset_name", None),
            "ckpt_dir": str(results_dir / "checkpoints"),
        }
        trainable = functools.partial(process_trainable, data_spec)
        trial_env = functools.partial(
            default_trial_env,
            force_platform="cpu" if getattr(args, "cpu", False) else None,
        )
    elif args.stacked <= 1:
        trainable = make_trainable(args, resolve_images(args))
    else:
        trainable = None  # stacked mode builds its own trainable below

    if args.stacked > 1:
        # vmapped stacked trials: K configs per jit (SURVEY.md §2c).
        # Early-stopping schedulers don't apply inside a stack.
        if scheduler is not None:
            print(
                f"note: --stacked ignores --scheduler {args.scheduler} "
                "(lanes share one compiled program; every trial runs its "
                "full epoch budget)"
            )
        if executor is not None:
            print(f"note: --stacked replaces --executor {executor}")
        trials = run_search_stacked(
            make_stacked_trainable(args, resolve_images(args)),
            param_space,
            num_samples=args.num_samples,
            stack_size=args.stacked,
            metric="loss",
            mode="min",
            results_dir=results_dir,
            seed=args.seed,
            search_alg=args.search_alg,
        )
    else:
        trials = run_search(
            trainable,
            param_space,
            num_samples=args.num_samples,
            scheduler=scheduler,
            metric="loss",
            mode="min",
            results_dir=results_dir,
            seed=args.seed,
            search_alg=args.search_alg,
            max_concurrent=args.max_concurrent,
            executor=executor,
            trial_env=trial_env,
        )

    best = get_best_result(trials, metric="loss", mode="min")
    print("\n" + "=" * 80)
    print("HYPERPARAMETER SEARCH COMPLETE")
    print("=" * 80)
    if best is None:
        print("No successful trials completed.")
        return
    print("\nBest trial config:")
    for k, v in best.config.items():
        print(f"  {k}: {v}")
    print(f"\nBest trial metrics: val_loss={best.best('val_loss', 'min'):.4f}")
    print(f"Best checkpoint: {best.checkpoint}")

    if args.save_best_config:
        config_path = Path(args.save_best_config)
        config_path.parent.mkdir(parents=True, exist_ok=True)
        save_config = {
            k: v for k, v in best.config.items()
            if not callable(v) and k != "h5_paths"
        }
        config_path.write_text(json.dumps(save_config, indent=2))
        print(f"\nBest config saved to: {config_path}")


def build_argparser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Hyperparameter search for RVAE (TPU)")
    add_data_flags(parser)
    parser.add_argument("--patch-size", type=int, default=128)
    parser.add_argument("--padding", type=int, default=32)
    parser.add_argument("--val-split", type=float, default=0.1)
    parser.add_argument("--lr-min", type=float, default=1e-5)
    parser.add_argument("--lr-max", type=float, default=2e-3)
    # search-space defaults match the reference (train_rvae_raytune.py:498,529)
    parser.add_argument("--latent-dims", type=int, nargs="+", default=[8, 16, 32, 64])
    parser.add_argument("--beta-min", type=float, default=0.1)
    parser.add_argument("--beta-max", type=float, default=2.0)
    parser.add_argument("--weight-decay-min", type=float, default=1e-6)
    parser.add_argument("--weight-decay-max", type=float, default=1e-3)
    parser.add_argument("--batch-sizes", type=int, nargs="+", default=[512])
    parser.add_argument(
        "--no-per-patch-norm",
        action="store_true",
        help="Train all trials without the per-patch min-max normalization "
        "(BASELINE.md vacancy recipe)",
    )
    parser.add_argument(
        "--search-norm",
        action="store_true",
        help="Make per-patch normalization a searchable choice([True, False])",
    )
    parser.add_argument(
        "--gamma", type=float, default=0.0,
        help="Fixed rotation-diversity weight (0 = reference trial's VAELoss)",
    )
    parser.add_argument("--search-gamma", action="store_true")
    parser.add_argument("--gamma-min", type=float, default=1.0)
    parser.add_argument("--gamma-max", type=float, default=20.0)
    parser.add_argument("--epochs", type=int, default=310)
    parser.add_argument("--beta-annealing", action="store_true")
    parser.add_argument("--beta-annealing-epochs", type=int, default=10)
    parser.add_argument("--grad-max-norm", type=float, default=None)
    parser.add_argument("--num-samples", type=int, default=50)
    parser.add_argument(
        "--max-concurrent",
        type=int,
        default=4,
        help="Trials in flight at once (the fractional-GPU packing analog)",
    )
    parser.add_argument(
        "--executor",
        choices=["auto", "sequential", "thread", "process"],
        default=None,
        help="Trial executor: thread (default when --max-concurrent > 1) "
        "shares the chip; process spawns one worker per trial with "
        "per-slot chip pinning (multi-chip hosts)",
    )
    parser.add_argument(
        "--stacked",
        type=int,
        default=0,
        help="Train K trials simultaneously in ONE jit via vmap over a "
        "trial axis (TPU-native trial packing: per-lane lr/wd/beta/gamma/"
        "seed; structural params group into separate stacks). Replaces "
        "--executor/--scheduler; tune K so K x batch-size fits HBM",
    )
    parser.add_argument("--cpus-per-trial", type=int, default=8, help=argparse.SUPPRESS)
    parser.add_argument("--gpus-per-trial", type=float, default=0.25, help=argparse.SUPPRESS)
    parser.add_argument("--scheduler", choices=["asha", "pbt", "none"], default="asha")
    # default matches the reference's HyperOptSearch (ref :594); "hyperopt"
    # resolves to the native TPE implementation (livae_tpu.sweep)
    parser.add_argument(
        "--search-alg", choices=["hyperopt", "tpe", "random"], default="hyperopt"
    )
    parser.add_argument("--grace-period", type=int, default=30)
    parser.add_argument("--reduction-factor", type=int, default=3)
    parser.add_argument("--perturbation-interval", type=int, default=5)
    parser.add_argument("--experiment-name", type=str, default="rvae_tune")
    parser.add_argument("--ray-results-dir", type=str, default="ray_results")
    parser.add_argument(
        "--save-best-config", type=str, default="checkpoints/best_config.json"
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true", help=argparse.SUPPRESS)
    return parser


if __name__ == "__main__":
    _args = build_argparser().parse_args()
    from _common import maybe_force_cpu

    maybe_force_cpu(_args)
    run_hyperparameter_search(_args)
