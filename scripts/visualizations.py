#!/usr/bin/env python
"""Latent-space analysis: batched encode -> t-SNE/PCA -> cluster maps.

Capability parity with the reference analysis script (reference:
scripts/visualizations.py): loads a trained VAE/rVAE checkpoint (model
geometry reconstructed from the saved `args`), batch-encodes the
AdaptiveLatticeDataset with transform=None, embeds latent means with
t-SNE (PCA fallback), and writes the same artifact set with the same
filenames:

    plots/latent_embeddings.png            (colored by source image)
    plots/clusters/image_N_clusters.png    (KMeans patch cluster maps)
    plots/windows/latent_hist_scatter_wsN.png
    plots/atom_clusters/image_N_atom_clusters.png

Differences from the reference (intentional): model type is auto-detected
from the checkpoint instead of an IS_RVAE constant (a --rvae/--vae flag
overrides), the encode pass is a jitted device batch, and the reference's
(x, y) coordinate swap in the patch cluster maps
(reference visualizations.py:134) is fixed — coords are (y, x).
"""

from __future__ import annotations

import argparse
from collections import defaultdict
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from _common import add_data_flags, batched, maybe_force_cpu, resolve_images

from livae_tpu.data.datasets import AdaptiveLatticeDataset
from livae_tpu.models.rvae import RVAE
from livae_tpu.models.vae import VAE
from livae_tpu.utils.checkpoint import (
    load_checkpoint,
    rvae_spec,
    torch_state_to_params,
    vae_spec,
)


def load_model_from_checkpoint(ckpt_path: str, force_type: str | None = None):
    """Rebuild the model from a reference-format checkpoint.

    Mirrors the reference's pattern of reading latent_dim/patch_size back
    from the saved args (reference visualizations.py:253-263), with
    clean_state_dict applied inside the converter.
    """
    payload = load_checkpoint(ckpt_path)
    args = payload.get("args", {})
    latent_dim = args.get("latent_dim", 16)
    patch_size = args.get("patch_size", 128)
    state = payload["model_state"]
    is_rvae = (
        force_type == "rvae"
        if force_type
        else any("rotation_stn" in k for k in state.keys())
    )
    if is_rvae:
        model = RVAE(latent_dim=latent_dim, patch_size=patch_size)
        params = torch_state_to_params(state, rvae_spec(patch_size, latent_dim))
    else:
        model = VAE(latent_dim=latent_dim, patch_size=patch_size)
        params = torch_state_to_params(state, vae_spec(patch_size, latent_dim))
    return model, params, is_rvae, latent_dim, patch_size, payload


def checkpoint_normalize(payload) -> bool:
    """Per-patch-norm semantics the checkpoint was trained with.

    train_rvae/train_vae persist --no-per-patch-norm in the saved args;
    sweep-trial checkpoints (train_rvae_raytune._trial_body saves
    args=config) carry the same semantics as a direct 'normalize' bool.
    Encoding with mismatched normalization is a train/eval distribution
    mismatch, so every analysis script builds its dataset through this.
    """
    args = payload.get("args", {})
    if "normalize" in args:
        return bool(args["normalize"])
    return not args.get("no_per_patch_norm", False)


def collect_stats(model, params, dataset, batch_size: int, is_rvae: bool):
    """Batched encode of every site: (mu, logvar, rec_err, idx_map).

    Reference: scripts/visualizations.py:40-70 (same cumsum global->local
    index mapping).
    """
    encode = jax.jit(lambda p, x: model.apply(p, x, method="encode"))
    forward = jax.jit(
        lambda p, x, k: model.apply(p, x, rngs={"sample": k})
    )

    cum_lens = np.cumsum([0] + [len(c) for c in dataset.sample_coords])

    def map_index(gi):
        img_idx = int(np.searchsorted(cum_lens, gi, side="right") - 1)
        return img_idx, int(gi - cum_lens[img_idx])

    all_mu, all_logvar, all_err, idx_map = [], [], [], []
    n = len(dataset)
    for chunk in batched(np.arange(n), batch_size, drop_last=False):
        x = dataset.batch_at(chunk)  # transform=None path: no augmentation
        enc = encode(params, x)
        mu, logvar = enc[0], enc[1]
        out = forward(params, x, jax.random.key(0))
        # reference uses the canonical recon for the rVAE error
        # (visualizations.py:55: `_, recon, _, mu, logvar = model(x)`)
        recon = out[1] if is_rvae else out[0]
        err = jnp.mean((recon - x) ** 2, axis=(1, 2, 3))
        all_mu.append(np.asarray(mu))
        all_logvar.append(np.asarray(logvar))
        all_err.append(np.asarray(err))
        idx_map.extend(map_index(int(i)) for i in chunk)

    return (
        np.concatenate(all_mu),
        np.concatenate(all_logvar),
        np.concatenate(all_err),
        idx_map,
    )


def embed_latents(latent: np.ndarray, method: str = "auto", seed: int = 42) -> np.ndarray:
    """t-SNE(perplexity 30) with PCA fallback (reference :73-85)."""
    from sklearn.decomposition import PCA

    emb = None
    if method in ("auto", "tsne"):
        try:
            from sklearn.manifold import TSNE

            emb = TSNE(
                n_components=2,
                random_state=np.random.RandomState(seed),
                init="random",
                perplexity=min(30, max(2, len(latent) - 1)),
            ).fit_transform(latent)
        except Exception:
            emb = None
    if emb is None:
        emb = PCA(n_components=2).fit_transform(latent)
    return emb


def plot_latents(emb, out_path: Path, image_sources=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(6, 6))
    if image_sources is None:
        plt.scatter(emb[:, 0], emb[:, 1], s=8)
    else:
        cmap = plt.get_cmap("tab10")
        for i, img_idx in enumerate(np.unique(image_sources)):
            mask = image_sources == img_idx
            plt.scatter(
                emb[mask, 0], emb[mask, 1], s=8, color=cmap(i % 10),
                label=f"Image {img_idx} (n={mask.sum()})", alpha=0.8,
            )
        plt.legend(markerscale=2)
    plt.xlabel("dim-1")
    plt.ylabel("dim-2")
    plt.title("Latent Embedding")
    out_path.parent.mkdir(parents=True, exist_ok=True)
    plt.tight_layout()
    plt.savefig(out_path, dpi=150)
    plt.close()
    print(f"Saved plot to: {out_path}")


def plot_clusters_on_images(mu, idx_map, dataset, n_clusters=3, out_dir: Path = None):
    """KMeans patch cluster maps (reference :118-146, coord order fixed)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.cluster import KMeans

    out_dir.mkdir(parents=True, exist_ok=True)
    labels = KMeans(n_clusters=n_clusters, n_init=10, random_state=42).fit_predict(mu)

    img_patch_labels = defaultdict(list)
    for (img_idx, local_idx), label in zip(idx_map, labels):
        img_patch_labels[img_idx].append((local_idx, label))

    half = dataset.patch_size // 2
    for img_idx, patches in img_patch_labels.items():
        coords = dataset.sample_coords[img_idx]
        cluster_map = np.zeros(dataset.images[img_idx].shape, dtype=int) - 1
        for local_idx, label in patches:
            y, x = map(int, coords[local_idx])  # coords are (y, x)
            cluster_map[
                max(0, y - half) : y + half, max(0, x - half) : x + half
            ] = label
        plt.figure(figsize=(6, 6))
        plt.imshow(cluster_map, cmap="tab10", interpolation="none")
        plt.title(f"Image {img_idx} - Patch Clusters")
        plt.colorbar(label="Cluster ID")
        plt.axis("off")
        plt.tight_layout()
        path = out_dir / f"image_{img_idx}_clusters.png"
        plt.savefig(path, dpi=150)
        plt.close()
        print(f"Saved cluster map for image {img_idx} to {path}")


def plot_windows(mu, idx_map, window_sizes=(10, 20, 30, 60, 90, 120), out_dir: Path = None):
    """Latent histogram/scatter grid per window size (reference :149-171)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir.mkdir(parents=True, exist_ok=True)
    frames = np.array([i for i, _ in idx_map])
    for ws in window_sizes:
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 5))
        ax1.hist(mu[:, 0], bins=40, color="green")
        ax1.set_xlabel("Encoded angle", fontsize=16)
        ax1.set_ylabel("Count", fontsize=16)
        ax1.set_title(f"Window size = {ws}", fontsize=16)
        d1 = 1 if mu.shape[1] > 1 else 0
        d2 = 2 if mu.shape[1] > 2 else d1
        sc = ax2.scatter(mu[:, d1], mu[:, d2], c=frames, cmap="viridis", s=8)
        ax2.set_xlabel("Latent 1", fontsize=16)
        ax2.set_ylabel("Latent 2", fontsize=16)
        plt.colorbar(sc, ax=ax2).set_label("Frame", fontsize=14)
        plt.tight_layout()
        path = out_dir / f"latent_hist_scatter_ws{ws}.png"
        plt.savefig(path, dpi=150)
        plt.close()
        print(f"Saved latent histogram & scatter for window size {ws} to {path}")


def plot_atom_clusters(mu, idx_map, dataset, n_clusters=3, out_dir: Path = None):
    """Atom-level scatter cluster maps (reference :186-240)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.cluster import KMeans

    out_dir.mkdir(parents=True, exist_ok=True)
    labels = KMeans(n_clusters=n_clusters, n_init=10, random_state=42).fit_predict(mu)

    img_atoms = defaultdict(list)
    for (img_idx, local_idx), label in zip(idx_map, labels):
        y, x = dataset.sample_coords[img_idx][local_idx]
        img_atoms[img_idx].append((x, y, label))

    cmap = plt.get_cmap("tab10")
    for img_idx, atoms in img_atoms.items():
        atoms = np.array(atoms)
        x, y, lbls = atoms[:, 0], atoms[:, 1], atoms[:, 2].astype(int)
        plt.figure(figsize=(6, 6))
        for cl in range(n_clusters):
            mask = lbls == cl
            plt.scatter(x[mask], y[mask], s=10, color=cmap(cl % 10),
                        label=f"Cluster {cl}", alpha=0.8)
        plt.gca().invert_yaxis()
        plt.title(f"Image {img_idx} - Atom Clusters")
        plt.xlabel("X")
        plt.ylabel("Y")
        plt.legend(markerscale=2)
        plt.axis("equal")
        plt.tight_layout()
        path = out_dir / f"image_{img_idx}_atom_clusters.png"
        plt.savefig(path, dpi=150)
        plt.close()
        print(f"Saved atom-level cluster plot for image {img_idx} to {path}")


def main():
    parser = argparse.ArgumentParser(description="Latent embeddings + cluster maps")
    add_data_flags(parser)
    parser.add_argument("--checkpoint", type=str, default="checkpoints/vae_best.pt")
    parser.add_argument("--rvae", action="store_true", help="Force rVAE model type")
    parser.add_argument("--vae", action="store_true", help="Force plain VAE model type")
    parser.add_argument("--padding", type=int, default=16)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--n-clusters", type=int, default=3)
    parser.add_argument("--plots-dir", type=str, default="plots")
    parser.add_argument("--cpu", action="store_true", help=argparse.SUPPRESS)
    args = parser.parse_args()
    maybe_force_cpu(args)

    force = "rvae" if args.rvae else ("vae" if args.vae else None)
    model, params, is_rvae, latent_dim, patch_size, payload = load_model_from_checkpoint(
        args.checkpoint, force
    )
    normalize = checkpoint_normalize(payload)
    print(
        f"Loaded {'rVAE' if is_rvae else 'VAE'} (latent {latent_dim}, "
        f"patch {patch_size}, per-patch norm {'on' if normalize else 'off'})"
    )

    images = resolve_images(args)
    dataset = AdaptiveLatticeDataset(
        images, patch_size=patch_size, padding=args.padding, transform=None,
        normalize=normalize,
    )

    print("Extracting latent vectors...")
    mu, logvar, rec_err, idx_map = collect_stats(
        model, params, dataset, args.batch_size, is_rvae
    )
    image_sources = np.array([i for i, _ in idx_map])
    print("Samples per image:", dict(zip(*np.unique(image_sources, return_counts=True))))

    plots = Path(args.plots_dir)
    print("Embedding latents...")
    emb = embed_latents(mu)
    plot_latents(emb, plots / "latent_embeddings.png", image_sources=image_sources)
    plot_clusters_on_images(mu, idx_map, dataset, args.n_clusters, plots / "clusters")
    plot_windows(mu, idx_map, out_dir=plots / "windows")
    plot_atom_clusters(mu, idx_map, dataset, args.n_clusters, plots / "atom_clusters")


if __name__ == "__main__":
    main()
