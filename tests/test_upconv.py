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
