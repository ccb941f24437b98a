#!/usr/bin/env python
"""Standalone t-SNE-by-image plot for a trained rVAE.

Capability parity with the reference (reference:
scripts/plot_tsne_by_image.py): same collect_stats index mapping, t-SNE
with SVD-PCA fallback, model geometry read from checkpoint args, output
saved to runs/plots/embedding_by_image3.png.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from _common import add_data_flags, maybe_force_cpu, resolve_images

from livae_tpu.data.datasets import AdaptiveLatticeDataset
from visualizations import (
    checkpoint_normalize,
    collect_stats,
    embed_latents,
    load_model_from_checkpoint,
)


def main():
    parser = argparse.ArgumentParser(description="t-SNE latent embedding by image (rVAE)")
    add_data_flags(parser)
    parser.add_argument("--checkpoint", type=str, default="checkpoints/rvae_best.pt")
    parser.add_argument("--padding", type=int, default=16)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument(
        "--out", type=str, default="runs/plots/embedding_by_image3.png"
    )
    parser.add_argument("--cpu", action="store_true", help=argparse.SUPPRESS)
    args = parser.parse_args()
    maybe_force_cpu(args)

    model, params, is_rvae, latent_dim, patch_size, payload = load_model_from_checkpoint(
        args.checkpoint, "rvae"
    )
    print(f"Loaded rVAE (latent {latent_dim}, patch {patch_size})")

    images = resolve_images(args)
    dataset = AdaptiveLatticeDataset(
        images, patch_size=patch_size, padding=args.padding, transform=None,
        normalize=checkpoint_normalize(payload),
    )
    mu, logvar, rec_err, idx_map = collect_stats(
        model, params, dataset, args.batch_size, is_rvae=True
    )
    image_sources = np.array([i for i, _ in idx_map])

    emb = embed_latents(mu)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    plt.figure(figsize=(7, 7))
    cmap = plt.get_cmap("tab10")
    for i, img_idx in enumerate(np.unique(image_sources)):
        mask = image_sources == img_idx
        plt.scatter(emb[mask, 0], emb[mask, 1], s=8, color=cmap(i % 10),
                    label=f"Image {img_idx}", alpha=0.8)
    plt.legend(markerscale=2)
    plt.title("rVAE latent embedding by source image")
    plt.tight_layout()
    plt.savefig(out, dpi=150)
    print(f"Saved {out}")


if __name__ == "__main__":
    main()
