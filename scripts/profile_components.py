#!/usr/bin/env python
"""Component-level throughput ablation for the fused rVAE train step.

Times each stage of the production training pipeline in isolation (paired
extraction, encoder forward, full forward, the complete paired loss
forward, backward, optimizer update) so optimization effort goes where
the time is. Each stage runs as a jitted fori_loop of `--reps` chained
repetitions (a scalar carry defeats DCE) with a single host-readback sync,
so dispatch latency is amortized exactly as in the fused epoch step.

Part of the framework's profiling story alongside --profile (jax.profiler
traces) and the patches/sec counters; the reference's closest analog is
the compare_vae_rvae.py microbenchmark (reference:
scripts/compare_vae_rvae.py:130-175).

Usage:
    python scripts/profile_components.py            # TPU, production shapes
    python scripts/profile_components.py --cpu --batch 32 --patch 32
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from _common import maybe_force_cpu


def main(args):
    import jax
    import jax.numpy as jnp

    from livae_tpu.data.pipeline import (
        AugmentConfig,
        _extract_batch_paired_impl as extract_batch_paired,
        pad_frames,
    )
    from livae_tpu.data.synthetic import synthetic_mos2_frame
    from livae_tpu.losses import rvae_loss
    from livae_tpu.models.rvae import RVAE
    from livae_tpu.models import init_params
    from livae_tpu.ops.resample import rotate_image_fast
    from livae_tpu.train.state import TrainState, make_optimizer
    import optax

    P, B = args.patch, args.batch
    padding = args.padding
    roi = P + 2 * padding + 16
    margin = roi // 2 + 8

    frame, _ = synthetic_mos2_frame(size=args.frame_size, spacing=40.0, seed=0)
    frames_padded = pad_frames(jnp.asarray(frame, jnp.float32)[None], margin)
    H = frame.shape[0]
    rng = np.random.default_rng(0)
    n_sites = 4096
    img_idx = jnp.zeros((n_sites,), jnp.int32)
    coords = jnp.asarray(
        rng.uniform(roi // 2, H - roi // 2, (n_sites, 2)).astype(np.float32)
    )
    cfg = AugmentConfig()

    model = RVAE(latent_dim=args.latent_dim, patch_size=P, compute_dtype="bfloat16")
    key = jax.random.key(0)
    params = init_params(model, 
        {"params": jax.random.key(1), "sample": jax.random.key(2)},
        jnp.zeros((1, P, P, 1)),
    )
    tx = make_optimizer(1e-3, optimizer="adamw", weight_decay=1e-5)
    state = TrainState.create(params, tx)

    def extract(env, k):
        idx = jax.random.randint(k, (B,), 0, n_sites)
        return extract_batch_paired(
            env["frames"], env["img_idx"][idx], env["coords"][idx], k,
            P, padding, cfg=cfg, margin=margin,
        )

    def loss_fn(params, x, x_rot, angle, k):
        rotated_recon, canonical, theta, mu, logvar, canonical_input = model.apply(
            params, x, rngs={"sample": k}, method="train_forward"
        )
        theta_rot = model.apply(params, x_rot, method="predict_theta")
        total, rl, kl, cyc = rvae_loss(
            rotated_recon, x, mu, logvar, theta, theta_rot, angle,
            beta=1.0, gamma=1.0,
        )
        total = total + 0.2 * jnp.mean((canonical - canonical_input) ** 2)
        return total

    stages = {}

    def stage(name):
        def deco(body):
            stages[name] = body
            return body

        return deco

    @stage("extract_paired")
    def _(i, acc, k, env):
        x, x_rot, angle = extract(env, k)
        return acc + jnp.sum(x[0, 0, 0]) + jnp.sum(x_rot[0, 0, 0]) + angle[0]

    # --- extraction sub-stages (where do the ~30 us/patch go?) ---
    from livae_tpu.data.pipeline import (
        _crop_rois,
        _minmax_normalize,
        _sample_aug,
        _scale_translate,
    )

    P2 = P + 2 * padding
    roi_sz = P2 + 16

    def _crop(env, k):
        idx = jax.random.randint(k, (B,), 0, n_sites)
        cy, cx = env["coords"][idx, 0], env["coords"][idx, 1]
        return _crop_rois(env["frames"], env["img_idx"][idx], cy, cx, roi_sz, margin)

    @stage("x_crop_rois")
    def _(i, acc, k, env):
        rois, ry, rx = _crop(env, k)
        return acc + jnp.sum(rois[0, 0]) + ry[0] + rx[0]

    @stage("x_crop_resample")
    def _(i, acc, k, env):
        rois, ry, rx = _crop(env, k)
        scale, angle, fh, fv, jy, jx = _sample_aug(k, B, cfg)
        p_big = _scale_translate(rois, ry, rx, P2, scale, fh, fv, jy, jx)
        return acc + jnp.sum(p_big[0, 0])

    @stage("x_rot_copy_only")
    def _(i, acc, k, env):
        rois, ry, rx = _crop(env, k)
        scale, angle, fh, fv, jy, jx = _sample_aug(k, B, cfg)
        p_big = _scale_translate(rois, ry, rx, P2, scale, fh, fv, jy, jx)
        rot = rotate_image_fast(
            p_big[..., None].astype(jnp.bfloat16), angle, "zeros", margin=P2 // 6
        )[..., 0]
        return acc + jnp.sum(rot[0, 0].astype(jnp.float32))

    @stage("x_normalize_only")
    def _(i, acc, k, env):
        rois, ry, rx = _crop(env, k)
        scale, angle, fh, fv, jy, jx = _sample_aug(k, B, cfg)
        p_big = _scale_translate(rois, ry, rx, P2, scale, fh, fv, jy, jx)
        pn = _minmax_normalize(p_big)
        return acc + jnp.sum(pn[0, 0])

    @stage("encoder_fwd")
    def _(i, acc, k, env):
        x, _, _ = extract(env, k)
        mu, logvar, theta = model.apply(env["params"], x, method="encode")
        return acc + jnp.sum(mu[0]) + theta[0, 0]

    @stage("full_fwd")
    def _(i, acc, k, env):
        x, _, _ = extract(env, k)
        rotated_recon, *_ = model.apply(env["params"], x, rngs={"sample": k})
        return acc + jnp.sum(rotated_recon[0, 0, 0])

    @stage("decoder_fwd")
    def _(i, acc, k, env):
        z = jax.random.normal(k, (B, args.latent_dim))
        recon = model.apply(env["params"], z, method="decode")
        return acc + jnp.sum(recon[0, 0, 0])

    @stage("inverse_rotate")
    def _(i, acc, k, env):
        x, _, _ = extract(env, k)
        theta = jax.random.uniform(k, (B, 1), minval=-3.1, maxval=3.1)
        out = rotate_image_fast(x, theta, padding_mode="reflection")
        return acc + jnp.sum(out[0, 0, 0])

    @stage("paired_loss_fwd")
    def _(i, acc, k, env):
        x, x_rot, angle = extract(env, k)
        return acc + loss_fn(env["params"], x, x_rot, angle, k)

    @stage("loss_grad")
    def _(i, acc, k, env):
        x, x_rot, angle = extract(env, k)
        total, grads = jax.value_and_grad(loss_fn)(env["params"], x, x_rot, angle, k)
        return acc + total + optax.global_norm(grads)

    @stage("grad_no_canon")
    def _(i, acc, k, env):
        # ablation: drop the canonical-MSE term (removes d/dtheta through
        # the STN's canonicalizing resample from THAT term's cotangent)
        def lf(params, x, x_rot, angle, kk):
            rr, canonical, theta, mu, logvar, ci = model.apply(
                params, x, rngs={"sample": kk}, method="train_forward"
            )
            theta_rot = model.apply(params, x_rot, method="predict_theta")
            total, rl, kl, cyc = rvae_loss(
                rr, x, mu, logvar, theta, theta_rot, angle, beta=1.0, gamma=1.0
            )
            return total

        x, x_rot, angle = extract(env, k)
        total, grads = jax.value_and_grad(lf)(env["params"], x, x_rot, angle, k)
        return acc + total + optax.global_norm(grads)

    @stage("grad_no_cycle")
    def _(i, acc, k, env):
        # ablation: drop cycle term + the x_rot localization pass
        def lf(params, x, kk):
            rr, canonical, theta, mu, logvar, ci = model.apply(
                params, x, rngs={"sample": kk}, method="train_forward"
            )
            rl = jnp.sum((rr - x) ** 2) / x.shape[0]
            kl = jnp.mean(
                -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=1)
            )
            return rl + kl + 0.2 * jnp.mean((canonical - ci) ** 2)

        x, _, _ = extract(env, k)
        total, grads = jax.value_and_grad(lf)(env["params"], x, k)
        return acc + total + optax.global_norm(grads)

    # the full optimizer step mutates state; time it through the real fused path
    from livae_tpu.train.engine import make_fused_rvae_train_step

    fused = make_fused_rvae_train_step(
        model, tx, patch_size=P, padding=padding, cfg=cfg, margin=margin,
        canonical_weight=0.2, grad_max_norm=20.0,
    )

    # arrays travel as jit ARGUMENTS, not closures: closed-over device
    # arrays become lowering-time constants, which needs a D2H readback the
    # axon tunnel refuses (FailedPrecondition)
    env = {
        "frames": frames_padded,
        "img_idx": img_idx,
        "coords": coords,
        "params": state.params,
    }

    def run_stage(name, body):
        @jax.jit
        def loop(key, env):
            def f(i, acc):
                return body(i, acc, jax.random.fold_in(key, i), env)

            return jax.lax.fori_loop(0, args.reps, f, jnp.float32(0.0))

        float(loop(jax.random.key(1), env))  # compile + warm
        t0 = time.time()
        float(loop(jax.random.key(2), env))
        dt = time.time() - t0
        return B * args.reps / dt

    results = {}
    for name, body in stages.items():
        pps = run_stage(name, body)
        results[name] = round(pps, 1)
        print(f"{name:>18}: {pps:>10.1f} patches/sec", flush=True)

    idx_batches = jax.random.randint(
        jax.random.key(3), (args.reps, B), 0, n_sites
    )
    # the fused step donates its input state; thread the returned one through
    s, _ = fused(state, frames_padded, img_idx, coords, idx_batches,
                 jax.random.key(4), 10.0, 10.0)
    float(s.opt_state[0].count)  # sync after compile+run
    t0 = time.time()
    s, m = fused(s, frames_padded, img_idx, coords, idx_batches,
                 jax.random.key(5), 10.0, 10.0)
    float(m["loss"])
    dt = time.time() - t0
    results["full_train_step"] = round(B * args.reps / dt, 1)
    print(f"{'full_train_step':>18}: {results['full_train_step']:>10.1f} patches/sec")

    # derived per-stage costs (us per patch) for the breakdown
    us = {k: round(1e6 / v, 2) for k, v in results.items()}
    print(json.dumps({"patches_per_sec": results, "us_per_patch": us}, indent=2))


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="Train-step component ablation")
    p.add_argument("--patch", type=int, default=128)
    p.add_argument("--padding", type=int, default=32)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--latent-dim", type=int, default=16)
    p.add_argument("--frame-size", type=int, default=1024)
    p.add_argument("--reps", type=int, default=12)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    maybe_force_cpu(args)
    main(args)
