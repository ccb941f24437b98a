#!/usr/bin/env python
"""Headline benchmark: rVAE train+encode patches/sec/chip on MoS2 HAADF.

Runs the production configuration (patch 128, latent 16, the reference's
flagship rVAE path) end to end on device: jitted paired patch extraction
from a device-resident synthetic MoS2 frame, the full paired train step
(forward, cycle + canonical losses, grad, AdamW), and the batched encode
pass (the visualization/analysis half of the metric).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "patches/sec", "vs_baseline": N}

vs_baseline is against the measured PyTorch reference combined
train+encode throughput on this host (6.8 patches/sec, torch-cpu;
see BASELINE.md for methodology and the hardware-asymmetry note).

Timing notes: on the tunneled TPU, jax.block_until_ready does not block,
so every measurement syncs via host readback of a scalar; steps are
chained so the readback cost amortizes.
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
TRAIN_STEPS = 12
ENCODE_STEPS = 12
WARMUP = 2


def main() -> None:
    import contextlib
    import jax
    import jax.numpy as jnp

    from livae_tpu.data.datasets import PairedAdaptiveLatticeDataset
    from livae_tpu.data.synthetic import synthetic_mos2_frame
    from livae_tpu.models.rvae import RVAE
    from livae_tpu.train.engine import make_fused_encode, make_fused_rvae_train_step
    from livae_tpu.train.state import TrainState, make_optimizer

    frame, _ = synthetic_mos2_frame(size=1024, spacing=40.0, seed=0)
    with contextlib.redirect_stdout(sys.stderr):  # keep stdout = one JSON line
        dataset = PairedAdaptiveLatticeDataset([frame], patch_size=PATCH, padding=32)
    n = len(dataset)

    model = RVAE(latent_dim=LATENT, patch_size=PATCH, compute_dtype="bfloat16")
    key = jax.random.key(0)
    params = model.init(
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
    frames_padded, img_idx_dev, coords_dev, _ = dataset.device_site_table

    encode = make_fused_encode(model, patch_size=PATCH, padding=32, margin=dataset._margin)

    def sync(x):
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    def train_chunk(state, n_steps, seed0):
        k = jax.random.fold_in(key, seed0)
        idx = jax.random.randint(k, (n_steps, BATCH), 0, n)
        state, metrics = step(
            state, frames_padded, img_idx_dev, coords_dev, idx, k, 10.0, 10.0
        )
        return state, metrics

    # warmup/compile — MUST use the same loop length as the timed chunk,
    # or the timed call recompiles and the compile is billed as runtime
    state, m = train_chunk(state, TRAIN_STEPS, 0)
    sync(m["loss"])

    t0 = time.time()
    state, m = train_chunk(state, TRAIN_STEPS, 100)
    sync(m["loss"])
    train_time = time.time() - t0
    train_pps = TRAIN_STEPS * BATCH / train_time

    # encode path (fused extraction + encoder forward, one dispatch)
    eidx = jax.random.randint(jax.random.fold_in(key, 500), (ENCODE_STEPS, BATCH), 0, n)
    mu, logvar, theta = encode(state.params, frames_padded, img_idx_dev, coords_dev, eidx)
    sync(mu)
    t0 = time.time()
    mu, logvar, theta = encode(state.params, frames_padded, img_idx_dev, coords_dev, eidx)
    sync(mu)
    encode_time = time.time() - t0
    encode_pps = ENCODE_STEPS * BATCH / encode_time

    combined = (TRAIN_STEPS + ENCODE_STEPS) * BATCH / (train_time + encode_time)

    result = {
        "metric": "rvae_train_encode_patches_per_sec_per_chip",
        "value": round(combined, 1),
        "unit": "patches/sec",
        "vs_baseline": round(combined / TORCH_REFERENCE_BASELINE, 1),
        "detail": {
            "train_patches_per_sec": round(train_pps, 1),
            "encode_patches_per_sec": round(encode_pps, 1),
            "batch": BATCH,
            "patch": PATCH,
            "baseline": "torch-cpu reference 6.8 patches/sec (BASELINE.md)",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
