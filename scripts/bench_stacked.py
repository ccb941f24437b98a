#!/usr/bin/env python
"""Measure vmapped stacked-trial sweep throughput vs sequential trials.

The stacked executor's claim (livae_tpu/sweep/stacked.py) is that K
trials in one jit cost far less than K sequential runs on a
latency-bound chip. This harness measures exactly that: K identical-
architecture configs, E epochs each, run (a) sequentially through the
plain fused step and (b) as one K-lane stacked step, after separate
compile warmups. Prints one JSON line:

  {"trials": K, "epochs": E, "sequential_s": ..., "stacked_s": ...,
   "speedup": ..., "seq_patches_per_sec": ..., "stacked_patches_per_sec": ...}

Intended TPU invocation (production shapes):
  python scripts/bench_stacked.py --trials 8 --epochs 3
CPU smoke:
  python scripts/bench_stacked.py --cpu --quick
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--trials", type=int, default=8)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--patch-size", type=int, default=128)
    p.add_argument("--padding", type=int, default=32)
    p.add_argument("--latent-dim", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--synthetic-size", type=int, default=2048)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument(
        "--quick", action="store_true",
        help="tiny shapes for a smoke run (patch 32, batch 64, 2 trials)",
    )
    args = p.parse_args()

    if args.quick:
        args.patch_size, args.padding = 32, 8
        args.batch_size, args.synthetic_size = 64, 512
        args.trials, args.epochs, args.latent_dim = 2, 2, 8

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        print("note: --cpu forces the XLA CPU backend")
    import jax.numpy as jnp
    import optax

    from _common import resolve_images, split_indices
    from livae_tpu.data.datasets import AdaptiveLatticeDataset, default_transform
    from livae_tpu.models.rvae import RVAE
    from livae_tpu.models import init_params
    from livae_tpu.sweep.stacked import (
        make_stacked_fns,
        set_stacked_hyperparams,
        stack_trees,
    )
    from livae_tpu.train.engine import make_fused_vae_train_step
    from livae_tpu.train.state import TrainState

    data_args = argparse.Namespace(
        synthetic=1, synthetic_size=args.synthetic_size, data=None,
        dataset_name=None, synthetic_vacancy_rate=None,
        synthetic_s_amplitude=None, seed=0,
    )
    dataset = AdaptiveLatticeDataset(
        resolve_images(data_args), patch_size=args.patch_size,
        padding=args.padding, transform=default_transform,
    )
    train_idx, _ = split_indices(len(dataset), 0.1, seed=0)
    bs = min(args.batch_size, len(train_idx))
    steps = max(1, len(train_idx) // bs)
    train_idx = jnp.asarray(train_idx)
    frames_padded, img_idx_dev, coords_dev, _ = dataset.device_site_table

    model = RVAE(
        latent_dim=args.latent_dim, patch_size=args.patch_size,
        compute_dtype="bfloat16",
    )
    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=1e-3, weight_decay=1e-5
    )
    mk = dict(
        patch_size=args.patch_size, padding=args.padding,
        cfg=dataset.transform, margin=dataset._margin, grad_max_norm=20.0,
    )
    step = make_fused_vae_train_step(model, tx, **mk)
    step_impl = make_fused_vae_train_step(model, tx, **mk, return_impl=True)
    stacked_step, _ = make_stacked_fns(step_impl, step_impl)

    K = args.trials
    lrs = np.geomspace(1e-4, 3e-3, K)
    betas = jnp.asarray(np.geomspace(0.5, 8.0, K), jnp.float32)
    gammas = jnp.zeros(K, jnp.float32)

    def init_state(seed):
        k, ik, sk = jax.random.split(jax.random.key(seed), 3)
        params = init_params(model, 
            {"params": ik, "sample": sk},
            jnp.zeros((1, args.patch_size, args.patch_size, 1)),
        )
        return k, TrainState.create(params, tx)

    def epoch_idx(key):
        perm = jax.random.permutation(key, len(train_idx))
        return train_idx[perm[: steps * bs]].reshape(steps, bs)

    def sync(x):
        # block via host readback (block_until_ready is a no-op on the
        # tunneled backend; see BASELINE.md methodology)
        return float(jnp.sum(x.params["params"]["decoder"]["fc"]["dense"]["bias"]))

    n_patches = K * args.epochs * steps * bs

    # --- sequential ---------------------------------------------------
    _, st_w = init_state(999)  # compile warmup
    st_w, _ = step(st_w, frames_padded, img_idx_dev, coords_dev,
                   epoch_idx(jax.random.key(0)), jax.random.key(1), 1.0, 0.0)
    sync(st_w)
    # per-trial init outside the timed region (the stacked path inits its
    # lanes before its timed region too — measure training, not init)
    seq_lanes = []
    for i in range(K):
        key, st = init_state(i)
        hp = dict(st.opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lrs[i], jnp.float32)
        st = st.replace(opt_state=st.opt_state._replace(hyperparams=hp))
        seq_lanes.append((key, st))
    t0 = time.time()
    last = None
    for i, (key, st) in enumerate(seq_lanes):
        for e in range(args.epochs):
            key, ek = jax.random.split(key)
            kperm, kstep = jax.random.split(ek)
            st, _ = step(st, frames_padded, img_idx_dev, coords_dev,
                         epoch_idx(kperm), kstep, float(betas[i]), 0.0)
        last = st
    sync(last)
    seq_s = time.time() - t0

    # --- stacked -------------------------------------------------------
    keys, states = zip(*(init_state(i) for i in range(K)))
    state = set_stacked_hyperparams(stack_trees(list(states)), lrs, [1e-5] * K)
    keys = list(keys)
    # warmup epoch (compile)
    idxK = jnp.stack([epoch_idx(jax.random.key(100 + i)) for i in range(K)])
    state, _ = stacked_step(state, frames_padded, img_idx_dev, coords_dev,
                            idxK, jnp.stack(keys), betas, gammas)
    sync(state)
    t0 = time.time()
    for e in range(args.epochs):
        ek, idx_l = [], []
        for i in range(K):
            keys[i], k2 = jax.random.split(keys[i])
            kperm, kstep = jax.random.split(k2)
            idx_l.append(epoch_idx(kperm))
            ek.append(kstep)
        state, _ = stacked_step(state, frames_padded, img_idx_dev, coords_dev,
                                jnp.stack(idx_l), jnp.stack(ek), betas, gammas)
    sync(state)
    stk_s = time.time() - t0

    print(json.dumps({
        "trials": K,
        "epochs": args.epochs,
        "patch_size": args.patch_size,
        "batch_size": bs,
        "steps_per_epoch": steps,
        "sequential_s": round(seq_s, 3),
        "stacked_s": round(stk_s, 3),
        "speedup": round(seq_s / stk_s, 3),
        "seq_patches_per_sec": round(n_patches / seq_s, 1),
        "stacked_patches_per_sec": round(n_patches / stk_s, 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
