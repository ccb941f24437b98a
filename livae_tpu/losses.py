"""VAE / rVAE losses as pure jittable functions.

Exact reduction parity with the reference (reference: src/livae/loss.py):

* `vae_loss` — MSE with mean reduction + beta * KL with mean reduction
  (loss.py:97-122), returning (total, recon, kld).
* `rvae_loss` — MSE summed over elements / batch + beta * (KL summed over
  latent dims, mean over batch) + gamma * (diversity or cycle) rotation
  term (loss.py:125-186), returning (total, recon, kld, rot).
* `circular_distance` — wraparound min(d, 2pi - d), batch mean (loss.py:6-29).
* `rotation_diversity_loss` — (std(theta) - target_std)^2 with Bessel
  correction, matching torch.std's unbiased default (loss.py:32-49).
* `cycle_consistency_loss` — mean(1 - cos((theta_rot - theta_orig) -
  (-angle))) (loss.py:52-94).

All angle tensors may be [B] or [B, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "circular_distance",
    "rotation_diversity_loss",
    "cycle_consistency_loss",
    "vae_loss",
    "rvae_loss",
]


def _as_col(theta: jax.Array) -> jax.Array:
    theta = jnp.asarray(theta)
    if theta.ndim == 0:
        theta = theta[None]
    if theta.ndim == 1:
        theta = theta[:, None]
    return theta


def circular_distance(theta1: jax.Array, theta2: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Mean circular distance accounting for 2pi wraparound."""
    diff = jnp.abs(_as_col(theta1) - _as_col(theta2))
    diff = jnp.minimum(diff, 2 * jnp.pi - diff)
    return jnp.mean(diff)


def rotation_diversity_loss(theta: jax.Array, target_std: float = 1.0) -> jax.Array:
    """(std(theta) - target_std)^2; std uses Bessel's correction like torch."""
    batch_std = jnp.std(theta, ddof=1)
    return (batch_std - target_std) ** 2


def cycle_consistency_loss(
    theta_original: jax.Array,
    theta_rotated: jax.Array,
    expected_angle: jax.Array,
) -> jax.Array:
    """Smooth circular loss: 1 - cos((theta_rot - theta_orig) + angle).

    When a patch is rotated by R, the STN should detect theta - R on the
    rotated copy, so (theta_rot - theta_orig) should equal -R.
    """
    predicted_diff = _as_col(theta_rotated) - _as_col(theta_original)
    expected_diff = -_as_col(expected_angle)
    return jnp.mean(1.0 - jnp.cos(predicted_diff - expected_diff))


def vae_loss(
    recon_x: jax.Array,
    x: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    beta: float = 1.0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Mean-reduced VAE ELBO: (total, recon, kld)."""
    recon_loss = jnp.mean((recon_x - x) ** 2)
    kld_loss = -0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar))
    return recon_loss + beta * kld_loss, recon_loss, kld_loss


def rvae_loss(
    recon_x: jax.Array,
    x: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    theta: jax.Array | None = None,
    theta_rotated: jax.Array | None = None,
    expected_angle: jax.Array | None = None,
    beta: float = 1.0,
    gamma: float = 0.0,
    use_diversity: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sum-per-sample rVAE loss: (total, recon, kld, rotation)."""
    batch_size = x.shape[0]
    recon_loss = jnp.sum((recon_x - x) ** 2) / batch_size
    kld_per_sample = -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=1)
    kld_loss = jnp.mean(kld_per_sample)

    rotation_loss = jnp.asarray(0.0, recon_loss.dtype)
    if gamma > 0:
        if use_diversity and theta is not None:
            rotation_loss = rotation_diversity_loss(theta, target_std=1.0)
        elif theta is not None and theta_rotated is not None and expected_angle is not None:
            rotation_loss = cycle_consistency_loss(theta, theta_rotated, expected_angle)

    total = recon_loss + beta * kld_loss + gamma * rotation_loss
    return total, recon_loss, kld_loss, rotation_loss
