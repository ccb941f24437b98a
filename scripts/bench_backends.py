#!/usr/bin/env python
"""A/B microbenchmarks for runtime-sensitive backend choices.

Several hot-path formulations in this framework were chosen by measuring
alternatives on a specific TPU runtime (ROI crop: dynamic_slice vs
row-gather+selector-matmul; 1-D resample: elementwise gather vs one-hot
matmul; rotation: Pallas fused 3-shear vs XLA shears vs the exact
gather+lerp grid sample). Those tradeoffs are **runtime-version-sensitive**:
the 2026-08 axon runtime upgrade vectorized vmap'd dynamic_slice (which the
2026-08-16 runtime serialized, trace_ops occurrences == B) and changed
Precision.HIGH from bf16x3 to fewer passes (breaking its exact-for-0/1
reconstruction). This harness re-measures every such choice in one process
so a runtime change turns into a one-command re-decision instead of an
archaeology project.

Timing protocol: each variant runs as a jitted fori_loop of `--reps`
chained repetitions with per-iteration fold_in randomness (defeats
loop-invariant hoisting and DCE) and ONE host readback — dispatch latency
amortized exactly as in the fused epoch step. `block_until_ready` does not
block on the axon tunnel, so readback is the only honest sync.

Usage:
    python scripts/bench_backends.py             # TPU, production shapes
    python scripts/bench_backends.py --cpu --batch 32 --frame-size 256
    python scripts/bench_backends.py --out ab.json

The closest reference analog is the compare_vae_rvae.py microbenchmark
(reference: scripts/compare_vae_rvae.py:130-175); this harness exists
because the TPU rebuild has formulation choices torch never faces.
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
        _axis_resample_gather,
        _axis_resample_matmul,
        _crop_rois_rowgather,
        _crop_rois_slice,
        _crop_starts,
        pad_frames,
    )
    from livae_tpu.data.synthetic import synthetic_mos2_frame
    from livae_tpu.ops.resample import rotate_image, rotate_image_fast

    B = args.batch
    P, padding = args.patch, args.padding
    roi = P + 2 * padding + 16
    margin = roi // 2 + 8
    P2 = P + 2 * padding  # augmentation-rotation canvas input size

    frame, _ = synthetic_mos2_frame(size=args.frame_size, spacing=40.0, seed=0)
    frames = pad_frames(jnp.asarray(frame, jnp.float32)[None], margin)
    Hp, Wp = frames.shape[1:]
    H = frame.shape[0]

    rng = np.random.default_rng(0)
    n_sites = 4096
    cy = jnp.asarray(rng.uniform(roi / 2, H - roi / 2, n_sites).astype(np.float32))
    cx = jnp.asarray(rng.uniform(roi / 2, H - roi / 2, n_sites).astype(np.float32))
    img_idx = jnp.zeros((n_sites,), jnp.int32)
    patches = jnp.asarray(rng.random((B, P2, P2, 1), dtype=np.float32))

    env = {
        "frames": frames,
        "img_idx": img_idx,
        "cy": cy,
        "cx": cx,
        "patches": patches,
    }

    def pick(key, env):
        """Per-iteration random batch of crop coordinates."""
        sel = jax.random.randint(key, (B,), 0, n_sites)
        cy = jnp.take(env["cy"], sel)
        cx = jnp.take(env["cx"], sel)
        ii = jnp.take(env["img_idx"], sel)
        y0, x0, _, _ = _crop_starts(cy, cx, roi, margin, padded_shape=(Hp, Wp))
        return ii, y0, x0

    def run(name, body, reps):
        @jax.jit
        def loop(key, env):
            def f(i, acc):
                return acc + body(jax.random.fold_in(key, i), env)

            return jax.lax.fori_loop(0, reps, f, jnp.float32(0.0))

        float(loop(jax.random.key(1), env))  # compile + warm
        t0 = time.time()
        float(loop(jax.random.key(2), env))
        dt = time.time() - t0
        us = dt / (reps * B) * 1e6
        print(f"{name:>28}: {us:9.2f} us/patch   ({B * reps / dt:,.0f} p/s)", flush=True)
        return us

    # --- ROI crop backends -------------------------------------------------
    def crop_slice(key, env):
        ii, y0, x0 = pick(key, env)
        return _crop_rois_slice(env["frames"], ii, y0, x0, roi)[0, 0, 0]

    def crop_rowgather(key, env):
        ii, y0, x0 = pick(key, env)
        return _crop_rois_rowgather(env["frames"], ii, y0, x0, roi)[0, 0, 0]

    # --- 1-D axis resample backends ----------------------------------------
    def _resample_body(key, env, fn):
        ii, y0, x0 = pick(key, env)
        rois = _crop_rois_slice(env["frames"], ii, y0, x0, roi)
        shift = jax.random.uniform(key, (B, 1), minval=-0.5, maxval=0.5)
        src = jnp.arange(roi, dtype=jnp.float32)[None, :] + shift
        out = fn(rois, src, 1)
        out = fn(out, src, 2)
        return out[0, 0, 0]

    # --- rotation backends (augmentation call-site shapes) -----------------
    def _rot_fwd(key, env, fn):
        ang = jax.random.uniform(key, (B,), minval=0.0, maxval=2 * np.pi)
        return fn(env["patches"], ang)[0, 0, 0, 0]

    def _rot_grad(key, env, fn):
        ang = jax.random.uniform(key, (B,), minval=0.0, maxval=2 * np.pi)

        def loss(p):
            return jnp.sum(fn(p, ang) ** 2)

        return jax.grad(loss)(env["patches"])[0, 0, 0, 0]

    rot_pallas = lambda p, a: rotate_image_fast(
        p, a, padding_mode="zeros", margin=P2 // 6, backend="pallas"
    )
    rot_xla = lambda p, a: rotate_image_fast(
        p, a, padding_mode="zeros", margin=P2 // 6, backend="xla"
    )
    rot_exact = lambda p, a: rotate_image(p, a, padding_mode="zeros")

    reps = args.reps
    results = {}
    results["crop_slice"] = run("crop dynamic_slice", crop_slice, reps)
    results["crop_rowgather"] = run("crop rowgather+matmul", crop_rowgather, reps)
    results["resample_matmul"] = run(
        "axis_resample one-hot matmul",
        lambda k, e: _resample_body(k, e, _axis_resample_matmul),
        reps,
    )
    results["resample_gather"] = run(
        "axis_resample gather",
        lambda k, e: _resample_body(k, e, _axis_resample_gather),
        reps,
    )
    if jax.default_backend() == "tpu":
        results["rot_fwd_pallas"] = run(
            "rotate fwd pallas rot3", lambda k, e: _rot_fwd(k, e, rot_pallas), reps
        )
    results["rot_fwd_xla"] = run(
        "rotate fwd xla 3-shear", lambda k, e: _rot_fwd(k, e, rot_xla), reps
    )
    results["rot_fwd_gather"] = run(
        "rotate fwd exact gather", lambda k, e: _rot_fwd(k, e, rot_exact), reps
    )
    if jax.default_backend() == "tpu":
        results["rot_grad_pallas"] = run(
            "rotate fwd+bwd pallas rot3", lambda k, e: _rot_grad(k, e, rot_pallas), reps
        )
    results["rot_grad_xla"] = run(
        "rotate fwd+bwd xla 3-shear", lambda k, e: _rot_grad(k, e, rot_xla), reps
    )
    results["rot_grad_gather"] = run(
        "rotate fwd+bwd exact gather", lambda k, e: _rot_grad(k, e, rot_exact), reps
    )

    payload = {
        "backend": jax.default_backend(),
        "batch": B,
        "patch": P,
        "roi": roi,
        "frame_size": args.frame_size,
        "reps": reps,
        "us_per_patch": {k: round(v, 2) for k, v in results.items()},
    }
    print(json.dumps(payload, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--patch", type=int, default=128)
    p.add_argument("--padding", type=int, default=32)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--frame-size", type=int, default=2048)
    p.add_argument("--reps", type=int, default=24)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    maybe_force_cpu(args)
    main(args)
