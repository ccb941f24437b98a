#!/usr/bin/env python
"""Train the plain VAE baseline on atom patches — TPU-native.

CLI parity with the reference entry point (reference: scripts/train_vae.py
— same flags/defaults: patch 128, padding 32, batch 512, latent 16, epochs
50, lr 1e-3, Adam + CosineAnnealingWarmRestarts(T_0=10, T_mult=2), VAELoss
beta 1.0 with optional linear beta-annealing, grad clip 5.0, best + final
checkpoints in the reference torch.save layout).
"""

from __future__ import annotations

import argparse
from contextlib import ExitStack
import time
from datetime import datetime
from pathlib import Path

import jax
import jax.numpy as jnp

from _common import _vis_forward, add_data_flags, resolve_images, split_indices

from livae_tpu.data.datasets import AdaptiveLatticeDataset, default_transform
from livae_tpu.models.vae import VAE
from livae_tpu.models import init_params
from livae_tpu.parallel.mesh import setup_mesh_from_flags
from livae_tpu.train.engine import (
    MetricLogger,
    evaluate_fused,
    metrics_to_host,
    log_reconstructions_tensorboard,
    log_scalar_metrics_tensorboard,
    make_fused_eval,
    make_fused_vae_train_step,
)
from livae_tpu.train.state import TrainState, cosine_warm_restarts, make_optimizer
from livae_tpu.utils.checkpoint import save_reference_checkpoint, vae_spec


def run_training(args) -> dict:
    # the ExitStack scopes the --model-parallel context mesh to this run
    with ExitStack() as _mesh_scope:
        return _run_training(args, _mesh_scope)


def _run_training(args, _mesh_scope) -> dict:
    images = resolve_images(args)

    normalize = not getattr(args, "no_per_patch_norm", False)
    print("Building adaptive-lattice dataset...")
    dataset = AdaptiveLatticeDataset(
        images,
        patch_size=args.patch_size,
        padding=args.padding,
        transform=default_transform,
        normalize=normalize,
    )
    n = len(dataset)
    train_idx, val_idx = split_indices(n, args.val_split, seed=args.seed)
    print(f"Dataset: {n} sites ({len(train_idx)} train / {len(val_idx)} val)")

    compute_dtype = None if args.no_amp else "bfloat16"
    model = VAE(
        latent_dim=args.latent_dim,
        patch_size=args.patch_size,
        compute_dtype=compute_dtype,
    )
    # history-free key streams (same scheme as train_rvae.py)
    root = jax.random.key(args.seed)
    init_stream, train_stream, vis_stream = jax.random.split(root, 3)
    init_key, sample_key = jax.random.split(init_stream)
    params = init_params(model, 
        {"params": init_key, "sample": sample_key},
        jnp.zeros((1, args.patch_size, args.patch_size, 1)),
    )
    n_params = sum(int(p.size) for p in jax.tree.leaves(params))
    print(f"VAE: {n_params / 1e6:.2f}M parameters")

    steps_per_epoch = max(1, len(train_idx) // args.batch_size)
    schedule = cosine_warm_restarts(
        args.lr,
        args.scheduler_t0 * steps_per_epoch,
        args.scheduler_t_mult,
        total_steps=args.epochs * steps_per_epoch,
    )
    tx = make_optimizer(schedule, optimizer="adam")

    # Mesh setup shared with train_rvae.py: 1-D data-parallel, or 2-D
    # (data x model) with Megatron-sharded large dense kernels when
    # --model-parallel > 1; the context mesh is scoped to this run.
    mesh, n_data, params = setup_mesh_from_flags(
        args.num_devices, args.model_parallel, args.batch_size, params,
        _mesh_scope,
    )
    state = TrainState.create(params, tx)

    train_step = make_fused_vae_train_step(
        model, tx,
        patch_size=args.patch_size, padding=args.padding,
        cfg=dataset.transform, margin=dataset._margin, grad_max_norm=5.0,
        normalize=normalize, mesh=mesh,
    )
    frames_padded, img_idx_dev, coords_dev, _ = dataset.device_site_table
    eval_kwargs = dict(
        patch_size=args.patch_size, padding=args.padding, margin=dataset._margin,
        normalize=normalize,
    )
    fused_eval = make_fused_eval(model, mesh=mesh, **eval_kwargs)
    tail_eval = fused_eval if mesh is None else make_fused_eval(model, **eval_kwargs)

    writer = None
    if not args.no_tensorboard:
        from tensorboardX import SummaryWriter

        log_dir = Path(args.log_dir) / datetime.now().strftime("%Y%m%d-%H%M%S")
        writer = SummaryWriter(str(log_dir))
        print(f"TensorBoard logs: {log_dir}")

    ckpt_args = {k: v for k, v in vars(args).items() if not k.startswith("_")}
    best_val = float("inf")
    t_start = time.time()
    total_patches = 0

    for epoch in range(args.epochs):
        if args.beta_annealing:
            beta = args.beta * min(1.0, (epoch + 1) / max(args.beta_annealing_epochs, 1))
        else:
            beta = args.beta
        ek, vk = jax.random.split(jax.random.fold_in(train_stream, epoch))

        logger = MetricLogger()
        t0 = time.time()
        kperm, kstep = jax.random.split(ek)
        perm = jax.random.permutation(kperm, len(train_idx))
        steps = len(train_idx) // args.batch_size
        idx_batches = jnp.asarray(train_idx)[perm[: steps * args.batch_size]].reshape(
            steps, args.batch_size
        )
        state, train_metrics = train_step(
            state, frames_padded, img_idx_dev, coords_dev, idx_batches, kstep, beta, 0.0
        )
        train_host = metrics_to_host(train_metrics)  # one transfer, not 5
        logger.update(**{f"train_{k}": float(v) for k, v in train_host.items()})
        train_time = time.time() - t0
        total_patches += steps_per_epoch * args.batch_size

        val_bs = min(args.batch_size, len(val_idx))
        if mesh is not None:
            val_bs = max(n_data, val_bs - val_bs % n_data)
        val_metrics = evaluate_fused(
            fused_eval, tail_eval, state.params, dataset.device_site_table,
            val_idx, val_bs, vk, logger, beta=beta,
        )

        metrics = logger.get_averages()
        pps = steps_per_epoch * args.batch_size / train_time
        print(
            f"Epoch {epoch + 1}/{args.epochs} | "
            f"train {metrics.get('train_loss', float('nan')):.5f} | "
            f"val {metrics.get('val_loss', float('nan')):.5f} | "
            f"psnr {metrics.get('val_psnr', float('nan')):.2f} | "
            f"beta {beta:.3f} | {pps:.0f} patches/s"
        )
        if writer is not None:
            log_scalar_metrics_tensorboard(writer, metrics, epoch)
            writer.add_scalar("train/beta", beta, epoch)
            if (epoch + 1) % args.vis_every == 0:
                _, wk = jax.random.split(jax.random.fold_in(vis_stream, epoch))
                x = dataset.batch_at(val_idx[: args.vis_samples])
                recon, _, _ = _vis_forward(model)(state.params, x, wk)
                log_reconstructions_tensorboard(writer, x, recon, epoch)

        val_loss = val_metrics.get("val_loss", float("inf"))
        if val_loss < best_val:
            best_val = val_loss
            save_reference_checkpoint(
                args.checkpoint,
                state.params,
                vae_spec(args.patch_size, args.latent_dim),
                epoch=epoch,
                best_val=best_val,
                args=ckpt_args,
            )
            print(f"  -> saved best checkpoint ({args.checkpoint})")

    final_path = str(Path(args.checkpoint).with_suffix("")) + "_final.pt"
    save_reference_checkpoint(
        final_path, state.params, vae_spec(args.patch_size, args.latent_dim),
        epoch=args.epochs - 1, best_val=best_val, args=ckpt_args,
    )
    wall = time.time() - t_start
    print(f"Done in {wall:.0f}s | best val {best_val:.5f} | {total_patches / wall:.0f} patches/sec overall")
    if writer is not None:
        writer.close()
    return {"best_val": best_val, "state": state}


def build_argparser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Train standard VAE on atom patches from STEM microscopy (TPU)"
    )
    add_data_flags(parser)
    parser.add_argument("--patch-size", type=int, default=128)
    parser.add_argument("--padding", type=int, default=32)
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--val-split", type=float, default=0.1)
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--scheduler-t0", type=int, default=10)
    parser.add_argument("--scheduler-t-mult", type=int, default=2)
    parser.add_argument("--latent-dim", type=int, default=16)
    parser.add_argument("--beta", type=float, default=1.0)
    parser.add_argument("--beta-annealing", action="store_true")
    parser.add_argument("--beta-annealing-epochs", type=int, default=10)
    parser.add_argument(
        "--no-per-patch-norm",
        action="store_true",
        help="Skip the per-patch min-max normalization (reference "
        "data.py:553-558); persisted in checkpoint args for the analysis "
        "scripts",
    )
    parser.add_argument(
        "--num-devices",
        type=str,
        default="1",
        help='Total devices: an integer or "auto" (all local devices)',
    )
    parser.add_argument(
        "--model-parallel",
        type=int,
        default=1,
        help="Megatron-style tensor-parallel ways for the large dense "
        "layers over a 2-D (data x model) mesh; must divide --num-devices",
    )
    parser.add_argument("--log-dir", type=str, default="runs/vae")
    parser.add_argument("--no-tensorboard", action="store_true")
    parser.add_argument("--vis-every", type=int, default=10)
    parser.add_argument("--vis-samples", type=int, default=8)
    parser.add_argument("--checkpoint", type=str, default="checkpoints/vae_best.pt")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--num-workers", type=int, default=8, help=argparse.SUPPRESS)
    parser.add_argument("--prefetch-factor", type=int, default=4, help=argparse.SUPPRESS)
    parser.add_argument("--cpu", action="store_true", help=argparse.SUPPRESS)
    parser.add_argument("--compile", action="store_true", help=argparse.SUPPRESS)
    parser.add_argument(
        "--no-amp",
        action="store_true",
        help="Disable mixed precision (bfloat16 compute); use float32 everywhere",
    )
    return parser


if __name__ == "__main__":
    _args = build_argparser().parse_args()
    from _common import maybe_force_cpu

    maybe_force_cpu(_args)
    run_training(_args)
