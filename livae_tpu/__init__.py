"""livae_tpu: TPU-native rebuild of LI-VAE (Latent Invariance VAE).

Unsupervised analysis of atomic-resolution HAADF-STEM images of MoS2
monolayers: FFT bandpass preprocessing, lattice-constant estimation, atom /
vacancy site detection with adaptive lattice extrapolation, atom-centered
patch extraction, and plain-VAE / rotationally-invariant-VAE (rVAE with a
spatial-transformer encoder) training — re-designed for TPU: jax/XLA
compute, gather-free resampling kernels, device-resident data pipeline,
jitted train steps, data-parallel sharding over a device Mesh.

The public surface mirrors the reference package's curated exports
(reference: src/livae/__init__.py:38-73) so reference-based code ports
1:1, plus the TPU-native additions (fast resampler, device pipeline,
sharding helpers).
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache, on by default (LIVAE_JAX_CACHE=0 to
# disable, LIVAE_JAX_CACHE_DIR to relocate). Repeated runs of the same
# entry point skip recompiling the fused train/eval steps — on a
# remote-tunnel TPU that is tens of seconds per jit, per process (the
# sweep CLI's process executor spawns one process per trial).
if _os.environ.get("LIVAE_JAX_CACHE", "1") != "0":  # pragma: no branch
    _cache_dir = _os.environ.get(
        "LIVAE_JAX_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "livae_tpu", "jax"),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is best-effort, never fatal
        pass

from .data.datasets import (
    AdaptiveLatticeDataset,
    PairedAdaptiveLatticeDataset,
    PatchDataset,
    default_transform,
)
from .data.h5 import load_image_from_h5
from .losses import (
    circular_distance,
    cycle_consistency_loss,
    rotation_diversity_loss,
    rvae_loss,
    vae_loss,
)
from .metrics import (
    compute_all_metrics,
    compute_atom_detection_metrics,
    compute_latent_metrics,
    compute_psnr,
    compute_reconstruction_metrics,
    compute_ssim,
)
from .models.rvae import RVAE, Decoder, Encoder, RotationSTN
from .models.vae import VAE, VAEDecoder, VAEEncoder
from .ops.fft import (
    bandpass_filter,
    fft_spectra,
    highpass_filter,
    lowpass_filter,
    normalize_image,
)
from .ops.lattice import estimate_lattice_constant, generate_lattice_grid
from .train.engine import (
    MetricLogger,
    evaluate,
    evaluate_rotation_invariance,
    evaluate_rvae,
    log_reconstructions_tensorboard,
    log_scalar_metrics_tensorboard,
    rotate_to_canonical,
    train_one_epoch,
    train_rvae_one_epoch,
)
from .utils.checkpoint import clean_state_dict

__version__ = "0.1.0"

__all__ = [
    # Data
    "PatchDataset",
    "AdaptiveLatticeDataset",
    "PairedAdaptiveLatticeDataset",
    "default_transform",
    # Filtering
    "normalize_image",
    "bandpass_filter",
    "fft_spectra",
    "lowpass_filter",
    "highpass_filter",
    # Losses
    "vae_loss",
    "rvae_loss",
    "circular_distance",
    "rotation_diversity_loss",
    "cycle_consistency_loss",
    # Models
    "VAE",
    "VAEEncoder",
    "VAEDecoder",
    "RVAE",
    "Encoder",
    "Decoder",
    "RotationSTN",
    # Training
    "train_one_epoch",
    "evaluate",
    "train_rvae_one_epoch",
    "evaluate_rvae",
    "evaluate_rotation_invariance",
    "rotate_to_canonical",
    "log_reconstructions_tensorboard",
    "log_scalar_metrics_tensorboard",
    "MetricLogger",
    # Metrics
    "compute_psnr",
    "compute_ssim",
    "compute_reconstruction_metrics",
    "compute_latent_metrics",
    "compute_atom_detection_metrics",
    "compute_all_metrics",
    # Utils
    "load_image_from_h5",
    "estimate_lattice_constant",
    "generate_lattice_grid",
    "clean_state_dict",
]
