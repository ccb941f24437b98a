"""Plain VAE model family (TPU-native Flax, NHWC).

Capability parity with the reference's plain VAE (reference:
src/livae/model.py:9-182): 4x stride-2 conv encoder (1->32->64->128->256,
k=4, p=1, ReLU), fc heads to (mu, logvar), mirrored ConvTranspose decoder
with Sigmoid output, reparameterized sampling, and a forward returning
exactly (recon, mu, logvar).

Layout: NHWC [B, H, W, C] (TPU-native) instead of the reference's NCHW;
the checkpoint converters in livae_tpu.utils.checkpoint translate weights
(including flatten-order permutations) so reference checkpoints load
bit-compatibly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..parallel.mesh import tp_boundary
from .layers import Conv, ConvTranspose, Dense

__all__ = ["VAEEncoder", "VAEDecoder", "VAE", "reparameterize"]

ENCODER_WIDTHS = (32, 64, 128, 256)


def reparameterize(rng: jax.Array, mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """z = mu + eps * exp(0.5 * logvar) (reference: src/livae/model.py:146-160)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(rng, mu.shape, mu.dtype)
    return mu + eps * std


class VAEEncoder(nn.Module):
    """Conv trunk -> (mu, logvar). Reference: src/livae/model.py:9-61.

    compute_dtype="bfloat16" runs the convs on the MXU at full rate (the
    TPU analog of the reference's AMP autocast); mu/logvar return float32.
    """

    latent_dim: int = 10
    patch_size: int = 64
    in_channels: int = 1
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        for i, width in enumerate(ENCODER_WIDTHS):
            x = Conv(width, kernel_size=4, stride=2, padding=1,
                     dtype=self.compute_dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
        h = x.reshape(x.shape[0], -1)  # NHWC flatten: (H, W, C) order
        # Megatron TP boundary before the row-parallel fc heads (no-op
        # off-mesh); see livae_tpu.parallel.mesh.tp_boundary.
        h = tp_boundary(h)
        mu = Dense(self.latent_dim, name="fc_mu")(h.astype(jnp.float32))
        logvar = Dense(self.latent_dim, name="fc_logvar")(h.astype(jnp.float32))
        return mu, logvar


class VAEDecoder(nn.Module):
    """fc -> 4x ConvTranspose mirror -> Sigmoid. Reference: src/livae/model.py:64-113."""

    latent_dim: int = 10
    out_channels: int = 1
    patch_size: int = 64
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        side = self.patch_size // 16
        h = Dense(256 * side * side, name="fc")(z)
        h = nn.relu(h)
        # Megatron TP boundary after the column-parallel fc (no-op
        # off-mesh); see livae_tpu.parallel.mesh.tp_boundary.
        h = tp_boundary(h)
        h = h.reshape(h.shape[0], side, side, 256)  # NHWC
        widths = (128, 64, 32, self.out_channels)
        for i, width in enumerate(widths):
            h = ConvTranspose(width, kernel_size=4, stride=2, padding=1,
                              dtype=self.compute_dtype, name=f"deconv{i}")(h)
            if i < len(widths) - 1:
                h = nn.relu(h)
        return nn.sigmoid(h.astype(jnp.float32))


class VAE(nn.Module):
    """Standard VAE; forward returns (recon, mu, logvar).

    Reference: src/livae/model.py:116-182. Sampling uses the "sample" RNG
    stream: `model.apply(params, x, rngs={"sample": key})`.
    """

    latent_dim: int = 10
    in_channels: int = 1
    patch_size: int = 64
    compute_dtype: str | None = None

    def setup(self):
        self.encoder = VAEEncoder(
            self.latent_dim, self.patch_size, self.in_channels, self.compute_dtype
        )
        self.decoder = VAEDecoder(
            self.latent_dim, self.in_channels, self.patch_size, self.compute_dtype
        )

    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
        mu, logvar = self.encoder(x)
        z = reparameterize(self.make_rng("sample"), mu, logvar)
        recon = self.decoder(z)
        return recon, mu, logvar

    def encode(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        return self.encoder(x)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(z)
