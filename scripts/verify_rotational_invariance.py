#!/usr/bin/env python
"""Verify that a trained rVAE's latent code is rotation-invariant.

Capability parity with the reference (reference:
scripts/verify_rotational_invariance.py): encode an image patch and its
90-degree-rotated copy, compare latent means by Euclidean distance and
cosine similarity with the reference's verdict thresholds (>0.99 HIGHLY,
>0.95 LARGELY invariant). Works on a plain checkpoint or on the top-k
trials of a sweep directory (best_config.json / sweep results from
train_rvae_raytune.py).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from _common import add_data_flags, maybe_force_cpu, resolve_images

from livae_tpu.data.datasets import AdaptiveLatticeDataset
from livae_tpu.ops.resample import rotate_image_fast
from visualizations import checkpoint_normalize, load_model_from_checkpoint


def check_invariance(model, params, patch: jax.Array) -> dict:
    """Latent distance/cosine between a patch and its rot90 copy.

    Reference: verify_rotational_invariance.py:36-53.
    """
    rotated = rotate_image_fast(patch, jnp.full((patch.shape[0],), jnp.pi / 2))
    enc = jax.jit(lambda p, x: model.apply(p, x, method="encode"))
    mu1 = np.asarray(enc(params, patch)[0])
    mu2 = np.asarray(enc(params, rotated)[0])
    dist = float(np.linalg.norm(mu1 - mu2, axis=1).mean())
    cos = float(
        np.mean(
            np.sum(mu1 * mu2, axis=1)
            / np.maximum(np.linalg.norm(mu1, axis=1) * np.linalg.norm(mu2, axis=1), 1e-12)
        )
    )
    if cos > 0.99:
        verdict = "HIGHLY rotation-invariant"
    elif cos > 0.95:
        verdict = "LARGELY rotation-invariant"
    else:
        verdict = "NOT rotation-invariant"
    return {"euclidean_distance": dist, "cosine_similarity": cos, "verdict": verdict}


def main():
    parser = argparse.ArgumentParser(description="Verify rVAE rotational invariance")
    add_data_flags(parser)
    parser.add_argument("--checkpoint", type=str, default="checkpoints/rvae_best.pt")
    parser.add_argument(
        "--sweep-dir", type=str, default=None,
        help="Sweep results directory: verify the top-k trials instead",
    )
    parser.add_argument("--top-k", type=int, default=5)
    parser.add_argument("--padding", type=int, default=16)
    parser.add_argument("--n-patches", type=int, default=32)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    maybe_force_cpu(args)

    images = resolve_images(args)

    checkpoints: list[str] = []
    if args.sweep_dir:
        results_file = Path(args.sweep_dir) / "results.json"
        if not results_file.exists():
            raise SystemExit(f"No results.json in {args.sweep_dir}")
        trials = json.loads(results_file.read_text())
        trials = sorted(
            (t for t in trials if t.get("checkpoint")),
            key=lambda t: t.get("val_loss", float("inf")),
        )[: args.top_k]
        checkpoints = [t["checkpoint"] for t in trials]
        print(f"Verifying top {len(checkpoints)} sweep trials")
    else:
        checkpoints = [args.checkpoint]

    for ckpt_path in checkpoints:
        model, params, _, latent_dim, patch_size, payload = load_model_from_checkpoint(
            ckpt_path, "rvae"
        )
        dataset = AdaptiveLatticeDataset(
            images, patch_size=patch_size, padding=args.padding, transform=None,
            normalize=checkpoint_normalize(payload),
        )
        idx = np.linspace(0, len(dataset) - 1, args.n_patches).astype(int)
        patch = dataset.batch_at(idx)
        result = check_invariance(model, params, patch)
        print(
            f"{ckpt_path}: cos={result['cosine_similarity']:.4f} "
            f"dist={result['euclidean_distance']:.4f} -> {result['verdict']}"
        )


if __name__ == "__main__":
    main()
