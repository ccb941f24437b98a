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
run in flight at once (thread executor by default — the one-chip analog
of the reference's fractional-GPU packing); PBT exploits adopt the donor
checkpoint's weights mid-run.
"""

from __future__ import annotations

import argparse
import json
import threading
from pathlib import Path

import jax
import jax.numpy as jnp

from _common import add_data_flags, resolve_images, split_indices

from livae_tpu.data.datasets import AdaptiveLatticeDataset, default_transform
from livae_tpu.models.rvae import RVAE
from livae_tpu.sweep import (
    ASHAScheduler,
    PBTScheduler,
    choice,
    get_best_result,
    loguniform,
    run_search,
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


def make_trainable(args, images):
    """Build the per-trial training function (closure over the data).

    The dataset is built once and shared across trials (the reference
    rebuilt it per trial, train_rvae_raytune.py:128-137 — pure waste);
    the cache is lock-protected for concurrent executors.
    """
    dataset_cache: dict[tuple, AdaptiveLatticeDataset] = {}
    cache_lock = threading.Lock()

    def get_dataset(patch_size, padding):
        key = (patch_size, padding)
        with cache_lock:
            if key not in dataset_cache:
                dataset_cache[key] = AdaptiveLatticeDataset(
                    images, patch_size=patch_size, padding=padding,
                    transform=default_transform,
                )
            return dataset_cache[key]

    ckpt_dir = Path(args.ray_results_dir) / args.experiment_name / "checkpoints"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    trial_counter = [0]

    # Jitted step/eval are cached across trials by their STATIC shape key;
    # lr/weight_decay are optax injected hyperparameters (traced values in
    # opt_state), so 50 trials with different lr share ONE compile and PBT
    # exploits don't recompile either. lr follows the reference trial's
    # per-epoch CosineAnnealingLR.step() semantics (constant within epoch).
    step_cache: dict[tuple, tuple] = {}

    def get_compiled(patch_size, padding, latent_dim, batch_size, grad_max_norm,
                     dataset):
        import optax

        key = (patch_size, padding, latent_dim, batch_size, grad_max_norm)
        with cache_lock:
            if key not in step_cache:
                model = RVAE(
                    latent_dim=latent_dim, patch_size=patch_size,
                    compute_dtype="bfloat16",
                )
                tx = optax.inject_hyperparams(optax.adamw)(
                    learning_rate=1e-3, weight_decay=1e-5
                )
                step = make_fused_vae_train_step(
                    model, tx, patch_size=patch_size, padding=padding,
                    cfg=dataset.transform, margin=dataset._margin,
                    grad_max_norm=grad_max_norm,
                )
                fused_eval = make_fused_eval(
                    model, patch_size=patch_size, padding=padding,
                    margin=dataset._margin,
                )
                step_cache[key] = (model, tx, step, fused_eval)
            return step_cache[key]

    def set_hyperparams(state, lr, weight_decay):
        hp = dict(state.opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        hp["weight_decay"] = jnp.asarray(weight_decay, jnp.float32)
        return state.replace(opt_state=state.opt_state._replace(hyperparams=hp))

    def train_rvae_tune(config, report):
        import math

        with cache_lock:
            trial_id = trial_counter[0]
            trial_counter[0] += 1

        dataset = get_dataset(config["patch_size"], config["padding"])
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
        grad_max_norm = float(config.get("grad_max_norm") or 20.0)

        model, tx, step, fused_eval = get_compiled(
            patch_size, int(config["padding"]), latent_dim, batch_size,
            grad_max_norm, dataset,
        )
        key = jax.random.key(trial_id)
        key, ik, sk = jax.random.split(key, 3)
        params = model.init(
            {"params": ik, "sample": sk},
            jnp.zeros((1, patch_size, patch_size, 1)),
        )
        state = TrainState.create(params, tx)
        frames_padded, img_idx_dev, coords_dev, _ = dataset.device_site_table

        for epoch in range(epochs):
            beta = config["beta"]
            if config.get("beta_annealing"):
                beta *= min(1.0, (epoch + 1) / max(config["beta_annealing_epochs"], 1))
            # per-epoch cosine lr (reference: CosineAnnealingLR.step() per epoch)
            lr_e = 0.5 * config["lr"] * (1.0 + math.cos(math.pi * epoch / max(epochs, 1)))
            state = set_hyperparams(state, lr_e, config["weight_decay"])
            key, ek, vk = jax.random.split(key, 3)

            kperm, kstep = jax.random.split(ek)
            perm = jax.random.permutation(kperm, len(train_idx))
            steps = max(1, len(train_idx) // batch_size)
            idx_batches = jnp.asarray(train_idx)[
                perm[: steps * batch_size]
            ].reshape(steps, -1)
            state, tm = step(
                state, frames_padded, img_idx_dev, coords_dev,
                idx_batches, kstep, beta, 0.0,
            )
            vm = evaluate_fused(
                fused_eval, fused_eval, state.params, dataset.device_site_table,
                val_idx, min(batch_size, len(val_idx)), vk, beta=beta,
            )
            val_loss = vm.get("val_loss", float("inf"))

            ckpt_path = str(ckpt_dir / f"trial_{trial_id}.pt")
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

    return train_rvae_tune


def run_hyperparameter_search(args) -> None:
    try:
        import ray  # noqa: F401

        print("note: Ray detected but the native engine is used for TPU trials")
    except ImportError:
        pass

    images = resolve_images(args)

    param_space = {
        "lr": loguniform(args.lr_min, args.lr_max),
        "latent_dim": choice(args.latent_dims),
        "beta": loguniform(args.beta_min, args.beta_max),
        "weight_decay": loguniform(args.weight_decay_min, args.weight_decay_max),
        "batch_size": choice(args.batch_sizes),
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
    trials = run_search(
        make_trainable(args, images),
        param_space,
        num_samples=args.num_samples,
        scheduler=scheduler,
        metric="loss",
        mode="min",
        results_dir=results_dir,
        seed=args.seed,
        search_alg=args.search_alg,
        max_concurrent=args.max_concurrent,
        executor=None if args.executor in (None, "auto") else args.executor,
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
    parser.add_argument("--latent-dims", type=int, nargs="+", default=[8, 16, 32])
    parser.add_argument("--beta-min", type=float, default=0.1)
    parser.add_argument("--beta-max", type=float, default=2.0)
    parser.add_argument("--weight-decay-min", type=float, default=1e-6)
    parser.add_argument("--weight-decay-max", type=float, default=1e-3)
    parser.add_argument("--batch-sizes", type=int, nargs="+", default=[256, 512])
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
        "shares the chip; process pins per-slot device env (module-level "
        "trainables only)",
    )
    parser.add_argument("--cpus-per-trial", type=int, default=8, help=argparse.SUPPRESS)
    parser.add_argument("--gpus-per-trial", type=float, default=0.25, help=argparse.SUPPRESS)
    parser.add_argument("--scheduler", choices=["asha", "pbt", "none"], default="asha")
    parser.add_argument(
        "--search-alg", choices=["hyperopt", "tpe", "random"], default="random"
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
