#!/usr/bin/env python
"""Headline benchmark: sustained rVAE train+encode patches/sec/chip.

Runs the production configuration (patch 128, latent 16, the reference's
flagship rVAE path) end to end on device and times FULL EPOCHS, not
bursts (VERDICT.md round-1 weak #6): each measured epoch is the fused
whole-epoch train step (jitted paired extraction from device-resident
synthetic MoS2 frames + all optimizer steps in one dispatch), the fused
paired eval over the val split, and the host metric readback — exactly
the per-epoch work scripts/train_rvae.py does. The encode phase is the
fused batched encode (the visualization/analysis half of the metric).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "patches/sec", "vs_baseline": N}

vs_baseline is against the measured PyTorch reference combined
train+encode throughput on this host (6.8 patches/sec, torch-cpu;
see BASELINE.md for methodology and the hardware-asymmetry note).

Timing notes: on the tunneled TPU, jax.block_until_ready does not block,
so every measurement syncs via host readback of a scalar — which the
epoch loop does anyway (metrics), making the timed region the honest
sustained cost.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

TORCH_REFERENCE_BASELINE = 6.8  # patches/sec, measured — BASELINE.md

PATCH = 128
LATENT = 16
BATCH = 512
STEPS_PER_EPOCH = 12
EPOCHS = 2
VAL_BATCHES = 2
ENCODE_STEPS = 12


def _arm_watchdog(seconds: int | None = None):
    """Emit an explicit error JSON instead of hanging the harness.

    The tunneled TPU backend can become UNAVAILABLE in a way that makes
    device initialization (and any first compile) block indefinitely
    rather than raise. A daemon TIMER THREAD (not SIGALRM: Python signal
    handlers only run between bytecodes on the main thread, so a hang
    inside one non-returning C call — exactly this failure — would defer
    the handler forever) prints one parseable stdout line and hard-exits,
    so whatever runs bench.py records a failure, not a timeout. Returns
    the timer; call .cancel() once the device has proven live.
    """
    import os
    import threading

    if seconds is None:
        # override for tests / short driver budgets; default covers the
        # tunnel's worst-case 130-460 s first-jit warmup with margin
        seconds = int(os.environ.get("LIVAE_BENCH_WATCHDOG_S", "2400"))

    # Capture the REAL stdout at arm time: the first device op (and so the
    # hang this watchdog guards) happens inside main()'s
    # redirect_stdout(sys.stderr) block, which rebinds sys.stdout for all
    # threads — printing via the global would misroute the JSON to stderr.
    out = sys.stdout

    def _fire():
        print(
            json.dumps(
                {
                    "metric": "rvae_train_encode_patches_per_sec_per_chip_sustained",
                    "value": 0.0,
                    "unit": "patches/sec",
                    "vs_baseline": 0.0,
                    "error": f"TPU backend unresponsive for {seconds}s (tunnel down?)",
                }
            ),
            file=out,
            flush=True,
        )
        os._exit(2)

    timer = threading.Timer(seconds, _fire)
    timer.daemon = True
    timer.start()
    return timer


def main() -> None:
    import contextlib
    import jax
    import jax.numpy as jnp
    import numpy as np

    watchdog = _arm_watchdog()


    from livae_tpu.data.datasets import PairedAdaptiveLatticeDataset
    from livae_tpu.data.synthetic import synthetic_mos2_frame
    from livae_tpu.models.rvae import RVAE
    from livae_tpu.models import init_params
    from livae_tpu.train.engine import (
        make_fused_encode,
        make_fused_rvae_eval,
        make_fused_rvae_train_step,
        metrics_to_host,
    )
    from livae_tpu.train.state import TrainState, make_optimizer

    frame, _ = synthetic_mos2_frame(size=1024, spacing=40.0, seed=0)
    with contextlib.redirect_stdout(sys.stderr):  # keep stdout = one JSON line
        dataset = PairedAdaptiveLatticeDataset([frame], patch_size=PATCH, padding=32)
    n = len(dataset)

    model = RVAE(latent_dim=LATENT, patch_size=PATCH, compute_dtype="bfloat16")
    key = jax.random.key(0)
    params = init_params(model, 
        {"params": jax.random.key(1), "sample": jax.random.key(2)},
        jnp.zeros((1, PATCH, PATCH, 1)),
    )
    tx = make_optimizer(1e-3, optimizer="adamw", weight_decay=1e-5)
    state = TrainState.create(params, tx)
    step = make_fused_rvae_train_step(
        model, tx,
        patch_size=PATCH, padding=32, cfg=dataset.transform,
        margin=dataset._margin,
        canonical_weight=0.2, grad_max_norm=20.0,
    )
    fused_eval = make_fused_rvae_eval(
        model, patch_size=PATCH, padding=32, cfg=dataset.transform,
        margin=dataset._margin, canonical_weight=0.2,
    )
    encode = make_fused_encode(model, patch_size=PATCH, padding=32, margin=dataset._margin)
    frames_padded, img_idx_dev, coords_dev, _ = dataset.device_site_table

    def epoch(state, seed0):
        """One production epoch: fused train + fused eval + host readback."""
        k = jax.random.fold_in(key, seed0)
        ke, kv = jax.random.split(k)
        idx = jax.random.randint(ke, (STEPS_PER_EPOCH, BATCH), 0, n)
        state, tm = step(
            state, frames_padded, img_idx_dev, coords_dev, idx, ke, 10.0, 10.0
        )
        vidx = jax.random.randint(kv, (VAL_BATCHES, BATCH), 0, n)
        vm = fused_eval(
            state.params, frames_padded, img_idx_dev, coords_dev, vidx, kv, 10.0, 10.0
        )
        # host readback = the epoch sync point (logging path); one stacked
        # transfer per dict — per-metric reads cost ~20 ms tunnel latency EACH
        metrics = {k2: float(np.mean(v)) for k2, v in metrics_to_host(vm).items()}
        metrics["train_loss"] = float(metrics_to_host(tm)["loss"])
        return state, metrics

    # warmup/compile with the exact shapes used in the timed region
    state, m = epoch(state, 0)
    assert np.isfinite(m["train_loss"])
    watchdog.cancel()  # device is live and compiled; disarm the watchdog

    t0 = time.time()
    for e in range(EPOCHS):
        state, m = epoch(state, 100 + e)
    train_time = time.time() - t0
    train_patches = EPOCHS * STEPS_PER_EPOCH * BATCH
    train_pps = train_patches / train_time

    # encode sweep (fused extraction + encoder forward, one dispatch)
    eidx = jax.random.randint(jax.random.fold_in(key, 500), (ENCODE_STEPS, BATCH), 0, n)
    mu, logvar, theta = encode(state.params, frames_padded, img_idx_dev, coords_dev, eidx)
    float(jnp.sum(mu))
    t0 = time.time()
    mu, logvar, theta = encode(state.params, frames_padded, img_idx_dev, coords_dev, eidx)
    float(jnp.sum(mu))
    encode_time = time.time() - t0
    encode_patches = ENCODE_STEPS * BATCH
    encode_pps = encode_patches / encode_time

    combined = (train_patches + encode_patches) / (train_time + encode_time)

    result = {
        "metric": "rvae_train_encode_patches_per_sec_per_chip_sustained",
        "value": round(combined, 1),
        "unit": "patches/sec",
        "vs_baseline": round(combined / TORCH_REFERENCE_BASELINE, 1),
        "detail": {
            "train_patches_per_sec_sustained": round(train_pps, 1),
            "encode_patches_per_sec": round(encode_pps, 1),
            "epochs_timed": EPOCHS,
            "epoch_includes": "fused train + fused val eval + host metric readback",
            "batch": BATCH,
            "patch": PATCH,
            "baseline": "torch-cpu reference 6.8 patches/sec (BASELINE.md)",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001
        # The contract is ONE parseable JSON line on stdout no matter what.
        # The watchdog covers hangs; this covers immediate failures (e.g.
        # the tunneled backend raising UNAVAILABLE at init, BENCH_r03).
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": "rvae_train_encode_patches_per_sec_per_chip_sustained",
                    "value": 0.0,
                    "unit": "patches/sec",
                    "vs_baseline": 0.0,
                    "error": f"{type(e).__name__}: {e}"[:500],
                }
            ),
            flush=True,
        )
        raise SystemExit(2)
