#!/usr/bin/env python
"""Pretrain only the RotationSTN with cycle consistency — TPU-native.

CLI parity with the reference (reference: scripts/pretrain_stn.py —
paired data, optimizer over STN params only, loss =
cycle_consistency_loss(theta_orig, theta_rot, angle), grad clip 5.0,
epochs default 30, best-val checkpoint saved as {"rotation_stn": state}).
The checkpoint feeds `train_rvae.py --stn-checkpoint`.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import optax

from _common import (
    add_data_flags,
    batched,
    maybe_force_cpu,
    resolve_images,
    split_indices,
)

from livae_tpu.data.datasets import PairedAdaptiveLatticeDataset, default_transform
from livae_tpu.losses import cycle_consistency_loss
from livae_tpu.models.rvae import RVAE
from livae_tpu.models import init_params
from livae_tpu.train.engine import MetricLogger, _clip_by_global_norm
from livae_tpu.train.state import TrainState
from livae_tpu.utils.checkpoint import params_to_torch_state, save_checkpoint, stn_spec


def run_pretrain(args) -> dict:
    maybe_force_cpu(args)
    images = resolve_images(args)
    dataset = PairedAdaptiveLatticeDataset(
        images, patch_size=args.patch_size, padding=args.padding,
        transform=default_transform,
    )
    train_idx, val_idx = split_indices(len(dataset), args.val_split, seed=args.seed)
    print(f"Dataset: {len(dataset)} sites ({len(train_idx)} train / {len(val_idx)} val)")

    model = RVAE(latent_dim=args.latent_dim, patch_size=args.patch_size)
    key = jax.random.key(args.seed)
    key, ik, sk = jax.random.split(key, 3)
    params = init_params(model, 
        {"params": ik, "sample": sk},
        jnp.zeros((1, args.patch_size, args.patch_size, 1)),
    )

    # Optimizer over STN params only (reference pretrain_stn.py:79-83)
    def is_stn(path, _):
        return "stn" if any(getattr(p, "key", None) == "rotation_stn" for p in path) else "frozen"

    labels = jax.tree_util.tree_map_with_path(is_stn, params)
    tx = optax.multi_transform(
        {"stn": optax.adamw(args.lr, weight_decay=args.weight_decay),
         "frozen": optax.set_to_zero()},
        labels,
    )
    state = TrainState.create(params, tx)

    def loss_fn(p, x, x_rot, angle):
        # Localization net only — the cycle loss consumes just the two
        # angles, so the STN resample + conv trunk + mu/logvar heads the
        # reference's full encoder passes compute here (pretrain_stn.py:
        # 106-111) are dead weight; predict_theta is gradient-identical.
        theta = model.apply(p, x, method="predict_theta")
        theta_rot = model.apply(p, x_rot, method="predict_theta")
        return cycle_consistency_loss(theta, theta_rot, angle)

    @jax.jit
    def train_step(state, x, x_rot, angle):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, x, x_rot, angle)
        grads, gnorm = _clip_by_global_norm(grads, 5.0)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params, opt_state=opt_state), {
            "loss": loss, "grad_norm": gnorm,
        }

    @jax.jit
    def eval_step(params, x, x_rot, angle):
        return {"loss": loss_fn(params, x, x_rot, angle)}

    best_val = float("inf")
    t0 = time.time()
    for epoch in range(args.epochs):
        key, bk, vk = jax.random.split(key, 3)
        logger = MetricLogger()
        train_losses = []
        for i, chunk in enumerate(batched(train_idx, args.batch_size)):
            x, x_rot, angle = dataset.batch_at(chunk, jax.random.fold_in(bk, i))
            state, m = train_step(state, x, x_rot, angle)
            train_losses.append(m["loss"])
        val_losses = []
        for i, chunk in enumerate(
            batched(val_idx, min(args.batch_size, len(val_idx)), drop_last=False)
        ):
            x, x_rot, angle = dataset.batch_at(chunk, jax.random.fold_in(vk, i))
            val_losses.append(eval_step(state.params, x, x_rot, angle)["loss"])
        train_loss = float(jnp.mean(jnp.stack(train_losses)))
        val_loss = float(jnp.mean(jnp.stack(val_losses)))
        logger.update(train_cycle_loss=train_loss, val_cycle_loss=val_loss)
        print(f"Epoch {epoch + 1}/{args.epochs} | cycle train {train_loss:.4f} | val {val_loss:.4f}")

        if val_loss < best_val:
            best_val = val_loss
            stn_params = state.params["params"]["encoder"]["rotation_stn"]
            save_checkpoint(
                args.checkpoint,
                {"rotation_stn": params_to_torch_state(stn_params, stn_spec(args.patch_size)),
                 "epoch": epoch, "best_val": best_val, "args": vars(args)},
            )
            print(f"  -> saved STN checkpoint ({args.checkpoint})")

    print(f"Done in {time.time() - t0:.0f}s | best val cycle loss {best_val:.4f}")
    return {"best_val": best_val, "state": state}


def build_argparser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Pretrain RotationSTN with cycle consistency (TPU)")
    add_data_flags(parser)
    parser.add_argument("--patch-size", type=int, default=128)
    parser.add_argument("--padding", type=int, default=32)
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--val-split", type=float, default=0.1)
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--weight-decay", type=float, default=1e-5)
    parser.add_argument("--latent-dim", type=int, default=16)
    parser.add_argument("--log-dir", type=str, default="runs/stn")
    parser.add_argument("--checkpoint", type=str, default="checkpoints/stn_pretrained.pt")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--num-workers", type=int, default=8, help=argparse.SUPPRESS)
    parser.add_argument("--prefetch-factor", type=int, default=4, help=argparse.SUPPRESS)
    parser.add_argument("--cpu", action="store_true", help=argparse.SUPPRESS)
    return parser


if __name__ == "__main__":
    run_pretrain(build_argparser().parse_args())
