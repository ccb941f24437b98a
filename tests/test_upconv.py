"""Differential tests: fused 4-phase up+reflect+conv vs the unfused chain.

The fused operator (livae_tpu.ops.upconv) must reproduce
Conv3x3(ReflectionPad1(Upsample2x_bilinear(x))) EXACTLY — boundaries
included — for every decoder stage shape; it is not a gated fast path.
Reference semantics: src/livae/model.py:355-373.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livae_tpu.models.layers import reflection_pad_1
from livae_tpu.ops.resample import upsample2x_bilinear
from livae_tpu.ops.upconv import fused_upsample_reflect_conv


def unfused(x, w, b):
    h = upsample2x_bilinear(x)
    h = reflection_pad_1(h)
    out = jax.lax.conv_general_dilated(
        h, w, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


@pytest.mark.parametrize(
    "shape,cout",
    [
        ((2, 8, 8, 16), 8),     # first decoder stage shape (narrowed)
        ((2, 16, 16, 8), 4),
        ((1, 5, 7, 3), 2),      # odd/rectangular
        ((1, 2, 2, 1), 1),      # minimal
        ((2, 64, 64, 4), 1),    # final-stage-like C_out=1
    ],
)
def test_fused_matches_unfused(shape, cout):
    rng = np.random.default_rng(hash((shape, cout)) % 2**32)
    x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
    w = jnp.asarray(0.3 * rng.standard_normal((3, 3, shape[-1], cout), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((cout,), dtype=np.float32))
    ref = np.asarray(unfused(x, w, b))
    got = np.asarray(fused_upsample_reflect_conv(x, w, b))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


class TestFusedConvPool:
    """fused_conv5_relu_maxpool == MaxPool2(ReLU(Conv5x5(pad 2))) exactly.

    Reference semantics: the STN localization blocks, model.py:203-214.
    """

    @staticmethod
    def unfused(x, k, b):
        from flax import linen as nn

        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        return nn.max_pool(jax.nn.relu(y), (2, 2), strides=(2, 2))

    @pytest.mark.parametrize(
        "shape,cout",
        [
            ((2, 16, 16, 1), 16),   # loc_conv0-like
            ((2, 8, 8, 16), 32),    # loc_conv1-like
            ((1, 4, 12, 3), 4),     # rectangular
        ],
    )
    def test_matches_unfused(self, shape, cout):
        from livae_tpu.ops.upconv import fused_conv5_relu_maxpool

        rng = np.random.default_rng(hash((shape, cout)) % 2**32)
        x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
        k = jnp.asarray(0.3 * rng.standard_normal((5, 5, shape[-1], cout), dtype=np.float32))
        b = jnp.asarray(rng.standard_normal((cout,), dtype=np.float32))
        ref = np.asarray(self.unfused(x, k, b))
        got = np.asarray(fused_conv5_relu_maxpool(x, k, b))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def test_gradients_match(self):
        from livae_tpu.ops.upconv import fused_conv5_relu_maxpool

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 2), dtype=np.float32))
        k = jnp.asarray(0.3 * rng.standard_normal((5, 5, 2, 4), dtype=np.float32))
        b = jnp.asarray(rng.standard_normal((4,), dtype=np.float32))
        cot = jnp.asarray(rng.standard_normal((2, 4, 4, 4), dtype=np.float32))

        g_ref = jax.grad(lambda *a: jnp.sum(self.unfused(*a) * cot), argnums=(0, 1, 2))(x, k, b)
        g_fus = jax.grad(
            lambda *a: jnp.sum(fused_conv5_relu_maxpool(*a) * cot), argnums=(0, 1, 2)
        )(x, k, b)
        for a, c in zip(g_ref, g_fus):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=3e-5, rtol=1e-4)

    def test_tie_gradient_first_wins(self):
        """Exact pool ties route the WHOLE cotangent to the first maximal
        phase (torch MaxPool2d's convention) — not autodiff's even split.

        Resume-determinism rests on this being a fixed select chain: bf16
        relu floors make ties common in production. A constant input makes
        every phase output identical, so d/dx must be the pure first-phase
        adjoint: each 2x2 input block receives gradient at exactly one
        position (the phase-0 tap pattern), never 0.25 everywhere.
        """
        from livae_tpu.ops.upconv import fused_conv5_relu_maxpool

        x = jnp.ones((1, 8, 8, 1), jnp.float32)
        k = jnp.zeros((5, 5, 1, 1), jnp.float32).at[2, 2, 0, 0].set(1.0)
        b = jnp.zeros((1,), jnp.float32)
        # out = maxpool(relu(x)) = 1 everywhere; all four phases tie.
        g = jax.grad(lambda x: jnp.sum(fused_conv5_relu_maxpool(x, k, b)))(x)
        g = np.asarray(g)[0, :, :, 0]
        # phase 0 = even rows/cols (the first window position, row-major)
        expect = np.zeros((8, 8), np.float32)
        expect[0::2, 0::2] = 1.0
        np.testing.assert_array_equal(g, expect)


def test_fused_gradients_match():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 3), dtype=np.float32))
    w = jnp.asarray(0.3 * rng.standard_normal((3, 3, 3, 2), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((2,), dtype=np.float32))
    cot = jnp.asarray(rng.standard_normal((2, 12, 12, 2), dtype=np.float32))

    def f_ref(x, w, b):
        return jnp.sum(unfused(x, w, b) * cot)

    def f_fus(x, w, b):
        return jnp.sum(fused_upsample_reflect_conv(x, w, b) * cot)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, w, b)
    g_fus = jax.grad(f_fus, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=3e-5, rtol=1e-4)
