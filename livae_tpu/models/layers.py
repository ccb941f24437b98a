"""Torch-parity NN primitives for the VAE/rVAE model family.

The reference models are built from a small vocabulary of PyTorch layers
(reference: src/livae/model.py): Conv2d(k4,s2,p1), Conv2d(k5,s1,p2),
Conv2d(k3,s1,p0), ConvTranspose2d(k4,s2,p1), MaxPool2d(2),
Upsample(bilinear, x2), ReflectionPad2d(1), Linear. This module provides
NHWC equivalents with matching numerics plus PyTorch-default initializers
(kaiming-uniform with a=sqrt(5), uniform bias 1/sqrt(fan_in)) so that
training dynamics — and therefore final ELBO — track the reference.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "torch_kernel_init",
    "torch_bias_init",
    "Conv",
    "ConvTranspose",
    "Dense",
    "FusedConvPool",
    "FusedUpConv",
    "max_pool_2x2",
    "reflection_pad_1",
]


def _fan_in_conv(shape):
    # HWIO kernel: fan_in = H * W * I
    return int(np.prod(shape[:-1]))


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch's default Conv/Linear weight init: kaiming_uniform(a=sqrt(5)).

    With a = sqrt(5): gain = sqrt(2 / (1 + 5)) = 1/sqrt(3), and the uniform
    bound is gain * sqrt(3 / fan_in) = 1 / sqrt(fan_in).
    """
    if len(shape) == 2:  # Dense kernel [in, out]
        fan_in = shape[0]
    else:  # Conv kernel HWIO
        fan_in = _fan_in_conv(shape)
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_for(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_init(key, shape, dtype=jnp.float32):
    # Fallback when fan_in is unknown at call time; overridden per-layer.
    return jnp.zeros(shape, dtype)


class Conv(nn.Module):
    """NHWC conv with torch-default init and explicit symmetric padding.

    `dtype` is the computation dtype: bfloat16 routes the matmuls onto the
    MXU at full rate (the TPU analog of the reference's AMP autocast,
    reference train.py:75) while parameters stay float32.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dtype: str | None = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        fan_in = k * k * in_ch
        return nn.Conv(
            self.features,
            (k, k),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init_for(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)


class ConvTranspose(nn.Module):
    """NHWC transposed conv matching torch ConvTranspose2d(k, s, p).

    Implemented as an input-dilated convolution with the spatially flipped
    kernel — the exact gradient-of-conv definition torch uses — instead of
    flax's ConvTranspose (whose padding convention differs). Kernel is
    stored HWIO with I = input (latent-side) channels.
    """

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 1
    dtype: str | None = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k, s, p = self.kernel_size, self.stride, self.padding
        # torch stores ConvT weight as [in, out, k, k], so its kaiming bound
        # uses fan_in = out * k * k; replicate for both kernel and bias.
        fan_in = self.features * k * k
        kernel = self.param(
            "kernel", torch_bias_init_for(fan_in), (k, k, in_ch, self.features)
        )
        bias = self.param("bias", torch_bias_init_for(fan_in), (self.features,))
        flipped = jnp.flip(kernel, axis=(0, 1))
        pad = k - 1 - p
        if self.dtype is not None:
            cd = jnp.dtype(self.dtype)
            x = x.astype(cd)
            flipped = flipped.astype(cd)
            bias = bias.astype(cd)
        out = jax.lax.conv_general_dilated(
            x,
            flipped,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias


class Dense(nn.Module):
    features: int
    dtype: str | None = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init_for(fan_in),
            dtype=self.dtype,
            name="dense",
        )(x)


class _ConvParams(nn.Module):
    """Declares a Conv3x3's kernel/bias under the same names/shapes/inits
    as the nn.Conv inside `Conv` (scope "conv" -> {kernel HWIO, bias}), so
    FusedUpConv is checkpoint-compatible with the unfused Upsample+Pad+Conv
    stage it replaces."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, in_ch: int):
        k = self.kernel_size
        fan_in = k * k * in_ch
        kernel = self.param(
            "kernel", torch_kernel_init, (k, k, in_ch, self.features)
        )
        bias = self.param("bias", torch_bias_init_for(fan_in), (self.features,))
        return kernel, bias


class FusedUpConv(nn.Module):
    """Decoder stage [Upsample2x bilinear -> ReflectionPad(1) -> Conv3x3]
    computed as ONE half-resolution 4-phase convolution (exact, boundaries
    included — see livae_tpu.ops.upconv).

    Numerically identical to the unfused chain (reference:
    src/livae/model.py:355-373) at float32; on TPU it avoids the
    lane-starved full-resolution small-channel convs and the 2x-resolution
    intermediates that dominated the decoder's cost.
    """

    features: int
    dtype: str | None = None

    @nn.compact
    def __call__(self, x):
        from ..ops.upconv import fused_upsample_reflect_conv

        kernel, bias = _ConvParams(self.features, 3, name="conv")(x.shape[-1])
        if self.dtype is not None:
            cd = jnp.dtype(self.dtype)
            x = x.astype(cd)
            kernel = kernel.astype(cd)
            bias = bias.astype(cd)
        return fused_upsample_reflect_conv(x, kernel, bias)


class FusedConvPool(nn.Module):
    """[Conv5x5(pad 2) -> ReLU -> MaxPool2] as one half-resolution phase
    conv (exact; see livae_tpu.ops.upconv.fused_conv5_relu_maxpool).

    The STN localization blocks (reference: src/livae/model.py:203-214)
    are the worst conv shapes in the model on TPU (C_in=1 over the full
    patch); the pool consumes the conv output in aligned 2x2 blocks, so
    the whole block computes at half resolution with 4x the channels.
    Param tree matches `Conv` (scope "conv" -> {kernel [5,5,Cin,Cout],
    bias}) — checkpoint-compatible.
    """

    features: int
    dtype: str | None = None

    @nn.compact
    def __call__(self, x):
        from ..ops.upconv import fused_conv5_relu_maxpool

        kernel, bias = _ConvParams(self.features, 5, name="conv")(x.shape[-1])
        if self.dtype is not None:
            cd = jnp.dtype(self.dtype)
            x = x.astype(cd)
            kernel = kernel.astype(cd)
            bias = bias.astype(cd)
        return fused_conv5_relu_maxpool(x, kernel, bias)


def max_pool_2x2(x):
    """MaxPool2d(2, stride=2) for NHWC."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def reflection_pad_1(x):
    """ReflectionPad2d(1) for NHWC."""
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
