#!/usr/bin/env python
"""Dry-run comparison harness: VAE vs rVAE parameters, smoke tests, throughput.

Capability parity with the reference (reference:
scripts/compare_vae_rvae.py): parameter counts, forward/backward smoke
test, component comparison table, and the throughput microbenchmark
(default batch 32 x 100 iters at patch 64, reporting ms/batch and
imgs/sec for both models).

TPU notes: timing syncs via host readback (block_until_ready is a no-op
on the tunneled device), and the benchmark chains iterations inside one
dispatch so per-call latency doesn't pollute the number.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from livae_tpu.losses import rvae_loss, vae_loss  # noqa: E402
from livae_tpu.models.rvae import RVAE  # noqa: E402
from livae_tpu.models.vae import VAE  # noqa: E402
from livae_tpu.models import init_params  # noqa: E402


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


def smoke_test(model, params, x, paired: bool) -> bool:
    def loss(p, x, k):
        out = model.apply(p, x, rngs={"sample": k})
        if len(out) == 3:
            return vae_loss(out[0], x, out[1], out[2])[0]
        rr, rec, th, mu, lv = out
        return rvae_loss(rr, x, mu, lv, th, beta=1.0, gamma=1.0, use_diversity=True)[0]

    val, grads = jax.value_and_grad(loss)(params, x, jax.random.key(0))
    gnorm = float(jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads))))
    print(f"  forward/backward OK: loss={float(val):.4f}, grad_norm={gnorm:.2f}")
    return np.isfinite(float(val)) and np.isfinite(gnorm)


def bench_model(model, params, x, iters: int) -> tuple[float, float]:
    @jax.jit
    def many(p, x):
        def body(i, acc):
            out = model.apply(p, x, rngs={"sample": jax.random.fold_in(jax.random.key(0), i)})
            return acc + jnp.sum(out[0])
        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(many(params, x))  # compile
    t0 = time.time()
    float(many(params, x))
    dt = (time.time() - t0) / iters
    return dt * 1000, x.shape[0] / dt


def main():
    parser = argparse.ArgumentParser(description="Compare VAE and rVAE (dry run + bench)")
    parser.add_argument("--patch-size", type=int, default=64)
    parser.add_argument("--latent-dim", type=int, default=16)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--iters", type=int, default=100)
    parser.add_argument("--cpu", action="store_true", help=argparse.SUPPRESS)
    args = parser.parse_args()
    from _common import maybe_force_cpu

    maybe_force_cpu(args)

    P, L, B = args.patch_size, args.latent_dim, args.batch_size
    x = jnp.asarray(np.random.default_rng(0).random((B, P, P, 1), dtype=np.float32))

    print("=" * 60)
    print("Model construction + parameter counts")
    print("=" * 60)
    vae = VAE(latent_dim=L, patch_size=P)
    rvae = RVAE(latent_dim=L, patch_size=P)
    vp = init_params(vae, {"params": jax.random.key(0), "sample": jax.random.key(1)}, x[:1])
    rp = rinit_params(vae, {"params": jax.random.key(0), "sample": jax.random.key(1)}, x[:1])
    nv, nr = count_params(vp), count_params(rp)
    print(f"  VAE : {nv / 1e6:.2f}M params")
    print(f"  rVAE: {nr / 1e6:.2f}M params (+{(nr - nv) / 1e3:.0f}K for the STN)")

    print("=" * 60)
    print("Forward/backward smoke test")
    print("=" * 60)
    print("VAE:")
    ok_v = smoke_test(vae, vp, x, paired=False)
    print("rVAE:")
    ok_r = smoke_test(rvae, rp, x, paired=True)

    print("=" * 60)
    print("Component comparison")
    print("=" * 60)
    print("  encoder trunk: identical 4x stride-2 conv (1->32->64->128->256)")
    print("  rVAE adds: RotationSTN localization net + 2 rotation resamples")
    print("  decoder: VAE ConvTranspose mirror vs rVAE upsample+conv (no checkerboard)")

    print("=" * 60)
    print(f"Throughput microbenchmark (batch {B} x {args.iters} iters, patch {P})")
    print("=" * 60)
    ms_v, ips_v = bench_model(vae, vp, x, args.iters)
    print(f"  VAE : {ms_v:.2f} ms/batch, {ips_v:.0f} imgs/sec")
    ms_r, ips_r = bench_model(rvae, rp, x, args.iters)
    print(f"  rVAE: {ms_r:.2f} ms/batch, {ips_r:.0f} imgs/sec")
    slowdown = (ms_r - ms_v) / ms_v * 100
    print(f"  rVAE inference is {slowdown:+.0f}% vs VAE on this device")
    print("=" * 60)
    print("PASS" if (ok_v and ok_r) else "FAIL")


if __name__ == "__main__":
    main()
