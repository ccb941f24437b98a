"""Evaluation metrics for VAE/rVAE lattice reconstruction.

Capability parity with the reference metrics module (reference:
src/livae/metrics.py): PSNR, avg-pool SSIM, reconstruction metrics
(mse/rmse/mae/psnr/ssim), latent-space statistics, atom-detection
accuracy, and the compute_all_metrics convenience. Device-side metrics
are pure jittable jnp; atom detection uses our own peak finder
(skimage is not a dependency here).

Layout: NHWC [B, H, W, C] (images) — the TPU-native convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.distance import cdist

from .ops.peaks import peak_local_max

__all__ = [
    "compute_psnr",
    "compute_ssim",
    "compute_reconstruction_metrics",
    "compute_latent_metrics",
    "compute_atom_detection_metrics",
    "compute_all_metrics",
    "psnr",
    "ssim",
    "latent_stats",
]


# --- jittable cores (used inside train/eval steps) ---

def psnr(img1: jax.Array, img2: jax.Array, max_val: float = 1.0) -> jax.Array:
    """PSNR in dB; inf when images are identical (reference metrics.py:27-49)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return jnp.where(
        mse == 0, jnp.inf, 20.0 * jnp.log10(max_val / jnp.sqrt(jnp.maximum(mse, 1e-30)))
    )


def _avg_pool_same(x: jax.Array, window: int) -> jax.Array:
    """avg_pool2d(window, stride=1, padding=window//2) on NHWC, matching
    torch's count-includes-padding semantics."""
    pad = window // 2
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return summed / (window * window)


def ssim(
    img1: jax.Array,
    img2: jax.Array,
    window_size: int = 11,
    C1: float = 0.01**2,
    C2: float = 0.03**2,
) -> jax.Array:
    """Simplified avg-pool SSIM (reference metrics.py:52-113), NHWC."""
    mu1 = _avg_pool_same(img1, window_size)
    mu2 = _avg_pool_same(img2, window_size)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _avg_pool_same(img1 * img1, window_size) - mu1_sq
    sigma2_sq = _avg_pool_same(img2 * img2, window_size) - mu2_sq
    sigma12 = _avg_pool_same(img1 * img2, window_size) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.mean(ssim_map)


def latent_stats(mu: jax.Array, logvar: jax.Array) -> dict[str, jax.Array]:
    """Latent distribution statistics (reference metrics.py:153-194).

    std uses Bessel's correction to match torch.std.
    """
    std = jnp.exp(0.5 * logvar)
    return {
        "latent_mean_abs": jnp.mean(jnp.abs(mu)),
        "latent_mean_std": jnp.std(mu, ddof=1),
        "latent_std_mean": jnp.mean(std),
        "latent_std_std": jnp.std(std, ddof=1),
        "latent_kl_per_dim": -0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar)),
    }


# --- host-facing API (reference-compatible floats/dicts) ---

def compute_psnr(img1, img2, max_val: float = 1.0) -> float:
    return float(psnr(jnp.asarray(img1), jnp.asarray(img2), max_val))


def compute_ssim(img1, img2, window_size: int = 11, C1: float = 0.01**2, C2: float = 0.03**2) -> float:
    img1, img2 = jnp.asarray(img1), jnp.asarray(img2)
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    return float(ssim(img1, img2, window_size, C1, C2))


def compute_reconstruction_metrics(original, reconstruction) -> dict[str, float]:
    """mse / rmse / mae / psnr / ssim (reference metrics.py:116-150)."""
    original = jnp.asarray(original)
    reconstruction = jnp.asarray(reconstruction)
    mse = float(jnp.mean((original - reconstruction) ** 2))
    return {
        "mse": mse,
        "rmse": float(np.sqrt(mse)),
        "mae": float(jnp.mean(jnp.abs(original - reconstruction))),
        "psnr": compute_psnr(original, reconstruction),
        "ssim": compute_ssim(original, reconstruction),
    }


def compute_latent_metrics(mu, logvar) -> dict[str, float]:
    return {k: float(v) for k, v in latent_stats(jnp.asarray(mu), jnp.asarray(logvar)).items()}


def _to_2d(img) -> np.ndarray:
    img = np.asarray(img)
    if img.ndim == 3:
        # accept HWC or CHW; squeeze singleton, else average channels
        if img.shape[-1] in (1, 3) and img.shape[0] not in (1, 3):
            img = img.mean(axis=-1) if img.shape[-1] != 1 else img[..., 0]
        elif img.shape[0] == 1:
            img = img[0]
        else:
            img = img.mean(axis=0)
    return img


def compute_atom_detection_metrics(
    original,
    reconstruction,
    lattice_spacing: float,
    threshold_ratio: float = 0.35,
) -> dict[str, float]:
    """Peak-position fidelity between original and reconstruction.

    Reference: src/livae/metrics.py:197-285 (detection rate, position
    accuracy within threshold_ratio * spacing, mean position error).
    """
    if lattice_spacing <= 0:
        raise ValueError("lattice_spacing must be positive")
    original_np = _to_2d(original)
    recon_np = _to_2d(reconstruction)

    min_distance = max(int(lattice_spacing * threshold_ratio), 1)
    orig_peaks = peak_local_max(original_np, min_distance=min_distance)
    recon_peaks = peak_local_max(recon_np, min_distance=min_distance)

    if orig_peaks.size == 0 or recon_peaks.size == 0:
        return {
            "atom_detection_rate": 0.0,
            "atom_position_accuracy": 0.0,
            "atom_mean_position_error": float("inf"),
            "n_original_atoms": int(orig_peaks.shape[0]) if orig_peaks.size else 0,
            "n_reconstructed_atoms": int(recon_peaks.shape[0]) if recon_peaks.size else 0,
        }

    distances = cdist(orig_peaks, recon_peaks)
    min_distances = distances.min(axis=1)
    threshold = lattice_spacing * threshold_ratio
    correct = int((min_distances < threshold).sum())
    return {
        "atom_detection_rate": float(recon_peaks.shape[0] / orig_peaks.shape[0]),
        "atom_position_accuracy": float(correct / orig_peaks.shape[0]),
        "atom_mean_position_error": float(min_distances.mean()),
        "n_original_atoms": int(orig_peaks.shape[0]),
        "n_reconstructed_atoms": int(recon_peaks.shape[0]),
    }


def compute_all_metrics(
    model,
    params,
    images,
    rng: jax.Array | None = None,
    lattice_spacing: float | None = None,
) -> dict[str, float]:
    """Reconstruction + latent (+ atom detection) metrics in one call.

    Reference: src/livae/metrics.py:288-348, adapted to the functional
    model API: `model.apply(params, x, rngs={"sample": rng})`.
    """
    images = jnp.asarray(images)
    if rng is None:
        rng = jax.random.key(0)
    outputs = model.apply(params, images, rngs={"sample": rng})
    if len(outputs) == 3:
        recon, mu, logvar = outputs
    elif len(outputs) == 5:
        recon, _, _, mu, logvar = outputs
    else:
        raise ValueError(f"Unexpected model output length: {len(outputs)}")

    metrics = {}
    metrics.update(compute_reconstruction_metrics(images, recon))
    metrics.update(compute_latent_metrics(mu, logvar))
    if lattice_spacing is not None:
        metrics.update(
            compute_atom_detection_metrics(images[0], recon[0], lattice_spacing)
        )
    return metrics
