#!/usr/bin/env python
"""Microbench: shear-rotation costs (per-call, fwd, fwd+bwd, margins, dtypes).

Quantifies the rotation slice of the roofline (scripts/roofline.py found
the fused step ~17x off the bandwidth bound with HBM ~5% utilized — the
time is in VPU butterflies/launches, and rotations are the prime suspect).
Informs the fused whole-rotation Pallas kernel decision.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from _common import maybe_force_cpu


def main(args):
    import jax
    import jax.numpy as jnp

    from livae_tpu.ops.pallas.shear import fractional_shift_pallas
    from livae_tpu.ops.resample import rotate_image_fast

    B = args.batch
    rng = np.random.default_rng(0)

    def timed(name, fn, *xs, n=args.reps):
        @jax.jit
        def loop(*xs):
            def body(i, acc):
                return acc + fn(i, *xs)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(loop(*xs))
        t0 = time.time()
        float(loop(*xs))
        dt = time.time() - t0
        us_pp = 1e6 * dt / (n * B)
        print(f"{name:>44}: {dt * 1e3 / n:8.3f} ms/call  {us_pp:7.2f} us/patch")
        return us_pp

    results = {}

    for P in args.canvases:
        for dtype in (jnp.bfloat16, jnp.float32):
            x = jnp.asarray(rng.random((B, P, P), np.float32), dtype)
            d = jnp.asarray(rng.uniform(-40, 40, (B, P)).astype(np.float32))

            def one_shear(i, x, d):
                out = fractional_shift_pallas(x, d + i, 2)
                return jnp.sum(out[0, 0].astype(jnp.float32))

            results[f"shear1_{P}_{dtype.__name__}"] = timed(
                f"1 shear call canvas {P} {dtype.__name__}", one_shear, x, d
            )

    for S, margin in args.rotations:
        for dtype in (jnp.bfloat16, jnp.float32):
            img = jnp.asarray(rng.random((B, S, S, 1), np.float32), dtype)
            th = jnp.asarray(rng.uniform(-np.pi, np.pi, B).astype(np.float32))

            def rot_fwd(i, img, th):
                out = rotate_image_fast(img, th + 0.001 * i, "reflection", margin=margin)
                return jnp.sum(out[0, 0, 0].astype(jnp.float32))

            results[f"rot_fwd_{S}_m{margin}_{dtype.__name__}"] = timed(
                f"rot fwd S={S} margin={margin} {dtype.__name__}", rot_fwd, img, th
            )

            def rot_grad(i, img, th):
                def f(img, th):
                    out = rotate_image_fast(
                        img, th + 0.001 * i, "reflection", margin=margin
                    )
                    return jnp.sum(out.astype(jnp.float32) ** 2)

                g_img, g_th = jax.grad(f, argnums=(0, 1))(img, th)
                return jnp.sum(g_img[0, 0, 0].astype(jnp.float32)) + jnp.sum(g_th)

            results[f"rot_grad_{S}_m{margin}_{dtype.__name__}"] = timed(
                f"rot fwd+bwd S={S} margin={margin} {dtype.__name__}", rot_grad, img, th
            )

    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--canvases", type=int, nargs="+", default=[192, 256])
    p.add_argument(
        "--rotations",
        type=lambda s: tuple(int(v) for v in s.split(",")),
        nargs="+",
        default=[(128, 32), (128, 64)],
        help="S,margin pairs",
    )
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    maybe_force_cpu(args)
    main(args)
