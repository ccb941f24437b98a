#!/usr/bin/env python
"""Retrain rVAE with the best config from a hyperparameter search.

Capability parity with the reference (reference:
scripts/train_rvae_with_best.py): loads checkpoints/best_config.json,
overrides lr/latent_dim/beta/weight_decay/batch_size on the train_rvae
argparser, supports --override-epochs, and delegates to
train_rvae.run_training.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import train_rvae


def main():
    parser = argparse.ArgumentParser(
        description="Train rVAE with best hyperparameters from a sweep"
    )
    parser.add_argument(
        "--config", type=str, default="checkpoints/best_config.json",
        help="Path to best_config.json from train_rvae_raytune.py",
    )
    parser.add_argument("--override-epochs", type=int, default=None)
    known, passthrough = parser.parse_known_args()
    passthrough = [a for a in passthrough if a != "--"]

    config_path = Path(known.config)
    if not config_path.exists():
        raise SystemExit(
            f"Best config not found: {config_path}. Run train_rvae_raytune.py first."
        )
    best = json.loads(config_path.read_text())
    print(f"Loaded best config from {config_path}:")
    for k in ("lr", "latent_dim", "beta", "weight_decay", "batch_size"):
        if k in best:
            print(f"  {k}: {best[k]}")

    args = train_rvae.build_argparser().parse_args(passthrough)
    # gamma is part of the native sweep space (vacancy program); the
    # reference sweep doesn't search it, so this is a harmless superset
    for k in ("lr", "beta", "weight_decay", "gamma"):
        if k in best:
            setattr(args, k, float(best[k]))
    for k in ("latent_dim", "batch_size"):
        if k in best:
            setattr(args, k, int(best[k]))
    if "normalize" in best:
        # sweep trials carry per-patch-norm as `normalize`; train_rvae
        # expresses it as --no-per-patch-norm (persisted in ckpt args)
        args.no_per_patch_norm = not bool(best["normalize"])
        if args.no_per_patch_norm:
            print("  per-patch norm: off (from best config)")
    if known.override_epochs is not None:
        args.epochs = known.override_epochs
    elif "epochs" in best:
        args.epochs = int(best["epochs"])

    train_rvae.run_training(args)


if __name__ == "__main__":
    main()
