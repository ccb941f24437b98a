#!/usr/bin/env python
"""Fast-resample ELBO gate: full rVAE objective, fast vs exact resampler.

Round-1 proved torch-parity ELBO through the EXACT resampler
(tests/test_elbo_parity.py) but production trains with the fast 3-shear
path (models/rvae.py fast_resample=True). This harness closes VERDICT.md
round-1 weak #4: it evaluates the COMPLETE rVAE objective (recon + beta*KL
+ gamma*cycle + canonical term) with both resamplers on identical weights,
batches, and sampling noise, and reports the relative delta against the
1% ELBO gate (BASELINE.json). Optionally trains the weights first (short
fast-path run) so the measurement happens at a realistic point in weight
space, and can also train two short dual-path runs and compare final
objectives.

Usage:
    python scripts/compare_resample_elbo.py --synthetic 1 --train-epochs 5
    python scripts/compare_resample_elbo.py --checkpoint checkpoints/rvae_best.pt
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from _common import add_data_flags, maybe_force_cpu, resolve_images, split_indices

from livae_tpu.data.datasets import PairedAdaptiveLatticeDataset, default_transform
from livae_tpu.models.rvae import RVAE
from livae_tpu.models import init_params
from livae_tpu.train.engine import make_fused_rvae_train_step, make_rvae_eval_step
from livae_tpu.train.state import TrainState, make_optimizer
from livae_tpu.utils.checkpoint import load_checkpoint, rvae_spec, torch_state_to_params


def full_objective(model, params, batches, beta, gamma, canonical_weight, key):
    """Mean full rVAE objective over fixed batches with fixed noise keys."""
    eval_step = make_rvae_eval_step(model, canonical_weight=canonical_weight)
    losses = []
    for i, (x, x_rot, angle) in enumerate(batches):
        m = eval_step(params, x, x_rot, angle, jax.random.fold_in(key, i), beta, gamma)
        losses.append(float(m["loss"]))
    return float(np.mean(losses))


def short_train(model, dataset, train_idx, epochs, batch_size, beta, gamma, seed):
    key = jax.random.key(seed)
    key, ik, sk = jax.random.split(key, 3)
    params = init_params(model, 
        {"params": ik, "sample": sk},
        jnp.zeros((1, dataset.patch_size, dataset.patch_size, 1)),
    )
    tx = make_optimizer(1e-3, optimizer="adamw", weight_decay=1e-5)
    state = TrainState.create(params, tx)
    step = make_fused_rvae_train_step(
        model, tx, patch_size=dataset.patch_size, padding=dataset.padding,
        cfg=dataset.transform, margin=dataset._margin,
        canonical_weight=0.2, grad_max_norm=20.0,
    )
    frames_padded, img_idx_dev, coords_dev, _ = dataset.device_site_table
    steps = max(1, len(train_idx) // batch_size)
    for epoch in range(epochs):
        key, ek = jax.random.split(key)
        kperm, kstep = jax.random.split(ek)
        perm = jax.random.permutation(kperm, len(train_idx))
        idx_batches = jnp.asarray(train_idx)[perm[: steps * batch_size]].reshape(
            steps, batch_size
        )
        state, m = step(
            state, frames_padded, img_idx_dev, coords_dev, idx_batches,
            kstep, beta, gamma,
        )
    return state.params, float(m["loss"])


def main(args) -> dict:
    images = resolve_images(args)
    dataset = PairedAdaptiveLatticeDataset(
        images, patch_size=args.patch_size, padding=args.padding,
        transform=default_transform,
    )
    train_idx, val_idx = split_indices(len(dataset), 0.1, seed=args.seed)
    batch_size = min(args.batch_size, len(val_idx), len(train_idx))
    print(f"Dataset: {len(dataset)} sites; eval batch {batch_size}")

    # --compute-dtype bfloat16 measures the PRODUCTION numerics (bf16 convs
    # + bf16 fast-path rotations, the reference-AMP analog) against the f32
    # exact reference path; default None keeps the pure resampler A/B.
    cd = args.compute_dtype if args.compute_dtype != "none" else None
    fast_model = RVAE(latent_dim=args.latent_dim, patch_size=args.patch_size,
                      fast_resample=True, compute_dtype=cd)
    exact_model = RVAE(latent_dim=args.latent_dim, patch_size=args.patch_size,
                       fast_resample=False)

    if args.checkpoint:
        ckpt = load_checkpoint(args.checkpoint)
        ck_args = ckpt.get("args", {})
        latent = int(ck_args.get("latent_dim", args.latent_dim))
        patch = int(ck_args.get("patch_size", args.patch_size))
        params = torch_state_to_params(ckpt["model_state"], rvae_spec(patch, latent))
        fast_model = RVAE(latent_dim=latent, patch_size=patch, fast_resample=True,
                          compute_dtype=cd)
        exact_model = RVAE(latent_dim=latent, patch_size=patch, fast_resample=False)
        print(f"Loaded weights from {args.checkpoint}")
    else:
        print(f"Training {args.train_epochs} fast-path epochs for realistic weights...")
        params, last = short_train(
            fast_model, dataset, train_idx, args.train_epochs, batch_size,
            args.beta, args.gamma, args.seed,
        )
        print(f"  final fast-path train loss {last:.4f}")

    # identical batches + sampling noise through both resamplers
    key = jax.random.key(args.seed + 7)
    n_batches = max(1, min(args.eval_batches, len(val_idx) // batch_size))
    batches = [
        dataset.batch_at(val_idx[i * batch_size : (i + 1) * batch_size],
                         jax.random.fold_in(key, 1000 + i))
        for i in range(n_batches)
    ]
    ek = jax.random.fold_in(key, 42)
    fast = full_objective(fast_model, params, batches, args.beta, args.gamma, 0.2, ek)
    exact = full_objective(exact_model, params, batches, args.beta, args.gamma, 0.2, ek)
    rel = abs(fast - exact) / abs(exact)
    result = {
        "fast_objective": fast,
        "exact_objective": exact,
        "relative_delta": rel,
        "gate": 0.01,
        "passes_1pct_gate": bool(rel < 0.01),
        "batches": n_batches,
        "batch_size": batch_size,
        "beta": args.beta,
        "gamma": args.gamma,
    }

    if args.dual_train:
        print("Dual-path short training (same seeds, fast vs exact)...")
        _, fast_final = short_train(
            fast_model, dataset, train_idx, args.train_epochs, batch_size,
            args.beta, args.gamma, args.seed + 100,
        )
        _, exact_final = short_train(
            exact_model, dataset, train_idx, args.train_epochs, batch_size,
            args.beta, args.gamma, args.seed + 100,
        )
        result["dual_train"] = {
            "fast_final_loss": fast_final,
            "exact_final_loss": exact_final,
            "relative_delta": abs(fast_final - exact_final) / abs(exact_final),
        }

    print(json.dumps(result, indent=2))
    return result


def build_argparser():
    p = argparse.ArgumentParser(description="Fast-vs-exact resampler ELBO gate")
    add_data_flags(p)
    p.add_argument("--patch-size", type=int, default=128)
    p.add_argument("--padding", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--compute-dtype", type=str, default="none",
                   choices=["none", "bfloat16"],
                   help="fast-path compute dtype; bfloat16 = production AMP analog")
    p.add_argument("--latent-dim", type=int, default=16)
    p.add_argument("--beta", type=float, default=10.0)
    p.add_argument("--gamma", type=float, default=10.0)
    p.add_argument("--train-epochs", type=int, default=5)
    p.add_argument("--eval-batches", type=int, default=4)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--dual-train", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    return p


if __name__ == "__main__":
    _args = build_argparser().parse_args()
    maybe_force_cpu(_args)
    main(_args)
