"""Rotationally-invariant VAE (rVAE) model family (TPU-native Flax, NHWC).

Capability parity with the reference's rVAE (reference:
src/livae/model.py:185-472):

* RotationSTN — localization net (2x [Conv5x5 + MaxPool2] -> Dense(32) ->
  Dense(2)) predicting an unnormalized [cos, sin], normalized to the unit
  circle, applied as a rotation grid-sample with reflection padding; the
  final layer init is N(0, 0.01) with zero bias (model.py:217-218).
* Encoder — STN canonicalization, then the shared 4-conv trunk ->
  (mu, logvar, theta).
* Decoder — fc -> 4x [bilinear upsample x2 + ReflectionPad(1) + Conv3x3]
  -> Sigmoid (checkerboard-free upsampling, model.py:355-373).
* RVAE — encode -> reparameterize -> decode canonical recon -> inverse
  rotation; forward returns (rotated_recon, recon, theta, mu, logvar).

The rotation resample is the shared livae_tpu.ops.resample kernel (exact
PyTorch grid_sample semantics), so STN behavior matches the reference's
C++/CUDA sampler.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resample import (
    affine_grid,
    grid_sample,
    rotate_image_fast,
    rotation_matrix,
)
from ..parallel.mesh import tp_boundary
from .layers import Conv, Dense, FusedConvPool, FusedUpConv
from .vae import ENCODER_WIDTHS, reparameterize

__all__ = ["RotationSTN", "Encoder", "Decoder", "RVAE"]


def _stn_head_kernel_init(key, shape, dtype=jnp.float32):
    """N(0, 0.01) init of the [cos, sin] head (reference: model.py:217)."""
    return 0.01 * jax.random.normal(key, shape, dtype)


class RotationSTN(nn.Module):
    """Spatial transformer predicting and applying a canonicalizing rotation.

    Reference: src/livae/model.py:185-262. Returns (x_rotated, theta) where
    theta = atan2(sin, cos) of the normalized prediction.

    fast_resample selects the gather-free 3-shear rotation (13x faster on
    TPU, boundary-identical in the interior) over the exact torch-parity
    bilinear gather; see livae_tpu.ops.resample.
    """

    patch_size: int = 64
    in_channels: int = 1
    fast_resample: bool = True
    compute_dtype: str | None = None

    def setup(self):
        # Attribute names double as param-tree names; they match the
        # explicit names the original compact definition used, so
        # checkpoints are unaffected by the setup-style refactor.
        # Each FusedConvPool == Conv5x5(pad 2) + ReLU + MaxPool2 exactly
        # (reference model.py:205-212), computed at half resolution.
        self.loc_conv0 = FusedConvPool(16, dtype=self.compute_dtype)
        self.loc_conv1 = FusedConvPool(32, dtype=self.compute_dtype)
        self.loc_fc0 = Dense(32)
        self.loc_fc1 = nn.Dense(
            2,
            kernel_init=_stn_head_kernel_init,
            bias_init=nn.initializers.zeros,
        )

    def localize(self, x: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Localization net only: x -> (cos, sin, theta[B, 1]).

        The cheap half of the STN (reference: model.py:203-214,237-251);
        callers that need only the angle (cycle-consistency's second
        encoder pass, STN pretraining) skip the resample + conv trunk.
        """
        h = self.loc_conv0(x)   # fused conv+relu+pool
        h = self.loc_conv1(h)
        h = h.reshape(h.shape[0], -1).astype(jnp.float32)
        # TP boundary before the (possibly row-parallel) loc_fc0; no-op
        # off-mesh. See Encoder.encode_with_canonical.
        h = tp_boundary(h)
        h = nn.relu(self.loc_fc0(h))
        vec = self.loc_fc1(h)

        # Normalize to the unit circle (F.normalize eps=1e-6, model.py:245)
        norm = jnp.linalg.norm(vec, axis=1, keepdims=True)
        vec = vec / jnp.maximum(norm, 1e-6)
        cos_theta = vec[:, 0]
        sin_theta = vec[:, 1]
        theta = jnp.arctan2(sin_theta, cos_theta)[:, None]  # [B, 1]
        return cos_theta, sin_theta, theta

    def apply_rotation(
        self, x: jax.Array, cos_theta: jax.Array, sin_theta: jax.Array,
        theta: jax.Array,
    ) -> jax.Array:
        """The STN's canonicalizing resample for an already-localized angle."""
        if self.fast_resample:
            # Under the mixed-precision policy the canonicalizing resample
            # runs in the compute dtype — the TPU analog of the reference's
            # AMP, where F.grid_sample executes in half precision inside
            # the autocast region (reference train.py:75, model.py:258).
            # The conv trunk consumes the result in that dtype anyway.
            if self.compute_dtype is not None:
                x = x.astype(jnp.dtype(self.compute_dtype))
            return rotate_image_fast(x, theta, padding_mode="reflection")
        mat = rotation_matrix(cos_theta, sin_theta)
        grid = affine_grid(mat, x.shape[1:3])
        return grid_sample(x, grid, padding_mode="reflection")

    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        cos_theta, sin_theta, theta = self.localize(x)
        return self.apply_rotation(x, cos_theta, sin_theta, theta), theta

    @staticmethod
    def get_rotation_matrix(theta: jax.Array) -> jax.Array:
        """2x3 rotation matrix from an angle tensor (reference: model.py:220-235)."""
        theta = theta.reshape(-1)
        return rotation_matrix(jnp.cos(theta), jnp.sin(theta))


class Encoder(nn.Module):
    """STN canonicalization + conv trunk -> (mu, logvar, theta).

    Reference: src/livae/model.py:265-326.
    """

    latent_dim: int = 10
    patch_size: int = 64
    in_channels: int = 1
    fast_resample: bool = True
    compute_dtype: str | None = None

    def setup(self):
        self.rotation_stn = RotationSTN(
            self.patch_size, self.in_channels, self.fast_resample, self.compute_dtype
        )
        self._convs = [
            Conv(w, kernel_size=4, stride=2, padding=1,
                 dtype=self.compute_dtype, name=f"conv{i}")
            for i, w in enumerate(ENCODER_WIDTHS)
        ]
        self.fc_mu = Dense(self.latent_dim, name="fc_mu")
        self.fc_logvar = Dense(self.latent_dim, name="fc_logvar")

    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
        mu, logvar, theta, _ = self.encode_with_canonical(x)
        return mu, logvar, theta

    def encode_with_canonical(
        self, x: jax.Array
    ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """Encode and also return the STN-canonicalized input.

        The canonicalized patch the STN produces IS the canonical-frame
        target the training loss compares the decoder output against
        (reference: train.py:357-366 via rotate_to_canonical,
        train.py:670-677 — the same +theta reflection-padded resample).
        Returning it saves the training step a redundant rotation
        forward+backward. At compute_dtype=None it equals
        rotate_to_canonical(x, theta) exactly (pinned by
        tests/test_models.py); under the bfloat16 policy it carries bf16
        rounding — the AMP analog, like every other compute-dtype tensor.
        """
        x_rotated, theta = self.rotation_stn(x)
        h = x_rotated
        for conv in self._convs:
            h = nn.relu(conv(h))
        h = h.reshape(h.shape[0], -1).astype(jnp.float32)
        # Megatron TP boundary: fc_mu/fc_logvar below are row-parallel
        # (input-axis-sharded kernels); pin the flatten replicated so the
        # contraction split stays local and the model axis cannot
        # propagate backward into the conv trunk (no-op off-mesh).
        h = tp_boundary(h)
        return self.fc_mu(h), self.fc_logvar(h), theta, x_rotated

    def predict_theta(self, x: jax.Array) -> jax.Array:
        """Rotation angle only — skips the STN resample and conv trunk.

        Gradient-identical to `self(x)[2]` (mu/logvar receive zero
        cotangent in every caller that discards them); used for the
        cycle-consistency pass on the rotated copy
        (reference: train.py:347-351 computes a full encoder forward
        there but consumes only theta).
        """
        return self.rotation_stn.localize(x)[2]

    def encode_pair_with_canonical(
        self, x: jax.Array, x_rot: jax.Array
    ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
        """encode_with_canonical(x) + predict_theta(x_rot) in one pass.

        The two localization forwards run as ONE conv pass on the
        concatenated [2B] batch — mathematically identical (convs/dense
        are row-independent; there is no batch-coupled layer) but half the
        kernel launches and better lane utilization for the C_in=1 stages.
        Returns (mu, logvar, theta, x_canonical, theta_rot).
        """
        B = x.shape[0]
        both = jnp.concatenate([x, x_rot], axis=0)
        cos_b, sin_b, theta_b = self.rotation_stn.localize(both)
        theta, theta_rot = theta_b[:B], theta_b[B:]
        x_rotated = self.rotation_stn.apply_rotation(
            x, cos_b[:B], sin_b[:B], theta
        )
        h = x_rotated
        for conv in self._convs:
            h = nn.relu(conv(h))
        h = h.reshape(h.shape[0], -1).astype(jnp.float32)
        h = tp_boundary(h)  # see encode_with_canonical
        return self.fc_mu(h), self.fc_logvar(h), theta, x_rotated, theta_rot


class Decoder(nn.Module):
    """Upsample+conv decoder (no checkerboard artifacts).

    Reference: src/livae/model.py:329-388.
    """

    latent_dim: int = 10
    out_channels: int = 1
    patch_size: int = 64
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        side = self.patch_size // 16
        h = Dense(256 * side * side, name="fc")(z)
        h = nn.relu(h)
        # Megatron TP boundary: under a 2-D mesh the fc above is
        # column-parallel; gather the model axis here so the replicated
        # conv stack below sees full activations (no-op off-mesh).
        h = tp_boundary(h)
        h = h.reshape(h.shape[0], side, side, 256)
        if self.compute_dtype is not None:
            h = h.astype(jnp.dtype(self.compute_dtype))
        widths = (128, 64, 32, self.out_channels)
        for i, width in enumerate(widths):
            # One fused 4-phase conv per stage == Upsample2x + ReflectPad(1)
            # + Conv3x3 exactly (model.py:355-373); see ops/upconv.py.
            h = FusedUpConv(width, dtype=self.compute_dtype, name=f"up_conv{i}")(h)
            if i < len(widths) - 1:
                h = nn.relu(h)
        return nn.sigmoid(h.astype(jnp.float32))


class RVAE(nn.Module):
    """rVAE; forward returns (rotated_recon, recon, theta, mu, logvar).

    Reference: src/livae/model.py:391-472. The canonical reconstruction is
    rotated back by -theta through the shared resampler (model.py:464-470).
    """

    latent_dim: int = 10
    in_channels: int = 1
    patch_size: int = 64
    fast_resample: bool = True
    compute_dtype: str | None = None

    def setup(self):
        self.encoder = Encoder(
            self.latent_dim, self.patch_size, self.in_channels,
            self.fast_resample, self.compute_dtype,
        )
        self.decoder = Decoder(
            self.latent_dim, self.in_channels, self.patch_size, self.compute_dtype
        )

    def __call__(
        self, x: jax.Array
    ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
        return self.train_forward(x)[:5]

    def _decode_and_unrotate(
        self, mu: jax.Array, logvar: jax.Array, theta: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """reparameterize -> decode -> inverse rotation (-theta)."""
        z = reparameterize(self.make_rng("sample"), mu, logvar)
        recon = self.decoder(z)

        inverse_theta = -theta
        if self.fast_resample:
            # Inverse rotation in the compute dtype (AMP analog, see
            # RotationSTN.apply_rotation); output restored to float32 — the
            # public forward contract and the loss reductions stay f32.
            rec_in = recon
            if self.compute_dtype is not None:
                rec_in = recon.astype(jnp.dtype(self.compute_dtype))
            rotated_recon = rotate_image_fast(
                rec_in, inverse_theta, padding_mode="reflection"
            ).astype(jnp.float32)
        else:
            mat = RotationSTN.get_rotation_matrix(inverse_theta)
            grid = affine_grid(mat, recon.shape[1:3])
            rotated_recon = grid_sample(recon, grid, padding_mode="reflection")
        return rotated_recon, recon

    def train_forward(
        self, x: jax.Array
    ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
        """Forward returning a 6th output: the STN-canonicalized input.

        Same computation as `__call__` (the reference 5-tuple,
        model.py:442-472) plus the canonical-frame target the training
        loss needs anyway — reusing the STN's internal resample instead
        of recomputing rotate_to_canonical(x, theta) in the loss.
        """
        mu, logvar, theta, x_canonical = self.encoder.encode_with_canonical(x)
        rotated_recon, recon = self._decode_and_unrotate(mu, logvar, theta)
        return rotated_recon, recon, theta, mu, logvar, x_canonical

    def train_forward_paired(
        self, x: jax.Array, x_rot: jax.Array
    ) -> tuple[
        jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array
    ]:
        """train_forward(x) + predict_theta(x_rot), localizations batched.

        The training step needs both every step (reference
        train.py:315-354); batching the two localization forwards into one
        [2B] conv pass is mathematically identical and measurably cheaper
        (see Encoder.encode_pair_with_canonical). Returns the train_forward
        6-tuple + theta_rot.
        """
        mu, logvar, theta, x_canonical, theta_rot = (
            self.encoder.encode_pair_with_canonical(x, x_rot)
        )
        rotated_recon, recon = self._decode_and_unrotate(mu, logvar, theta)
        return rotated_recon, recon, theta, mu, logvar, x_canonical, theta_rot

    def encode(self, x: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
        return self.encoder(x)

    def predict_theta(self, x: jax.Array) -> jax.Array:
        """Localization-net-only rotation angle (see Encoder.predict_theta)."""
        return self.encoder.predict_theta(x)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(z)
