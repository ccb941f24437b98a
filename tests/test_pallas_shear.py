"""Pallas fused-shear kernel tests (interpret mode on the CPU backend).

The kernel must match the XLA logroll implementation bit-for-bit (it is
the same arithmetic, fused), including the custom VJP (adjoint == shift by
-delta; d/ddelta == (g1 - g0) . grad).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from livae_tpu.ops.pallas.shear import fractional_shift_pallas
from livae_tpu.ops.resample import _fractional_shift, rotate_image_fast


@pytest.mark.parametrize("axis", [1, 2])
def test_matches_xla_logroll(rng, axis):
    B, H, W = 8, 64, 64
    x = jnp.asarray(rng.standard_normal((B, H, W)).astype(np.float32))
    n_other = W if axis == 1 else H
    delta = jnp.asarray(rng.uniform(-80, 80, (B, n_other)).astype(np.float32))
    ours = fractional_shift_pallas(x, delta, axis, True)
    dshape = (B, 1, n_other) if axis == 1 else (B, n_other, 1)
    ref = _fractional_shift(x, delta.reshape(dshape), axis=axis)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("axis", [1, 2])
def test_bfloat16_io(rng, axis):
    """bf16 tiles: I/O stays bf16 (half HBM traffic) while the kernel's
    VMEM scratch computes in f32 (the TPU's dynamic_rotate is 32-bit only).
    Result == the f32 kernel's output rounded to bf16."""
    B, H, W = 8, 64, 64
    x32 = jnp.asarray(rng.standard_normal((B, H, W)).astype(np.float32))
    x16 = x32.astype(jnp.bfloat16)
    n_other = W if axis == 1 else H
    delta = jnp.asarray(rng.uniform(-80, 80, (B, n_other)).astype(np.float32))
    out16 = fractional_shift_pallas(x16, delta, axis, True)
    assert out16.dtype == jnp.bfloat16
    ref = fractional_shift_pallas(x16.astype(jnp.float32), delta, axis, True)
    np.testing.assert_allclose(
        np.asarray(out16, dtype=np.float32), np.asarray(ref), atol=0.02, rtol=0.01
    )

    # gradients flow (custom VJP) and d/ddelta accumulates in f32
    def loss(xx, dd):
        return jnp.sum(fractional_shift_pallas(xx, dd, axis, True).astype(jnp.float32))

    gx, gd = jax.grad(loss, argnums=(0, 1))(x16, delta)
    assert gx.dtype == jnp.bfloat16 and gd.dtype == jnp.float32
    assert np.isfinite(np.asarray(gd)).all()


def test_integer_shifts_exact(rng):
    B, H, W = 4, 32, 32
    x = jnp.asarray(rng.standard_normal((B, H, W)).astype(np.float32))
    delta = jnp.asarray(rng.integers(-31, 31, (B, W)).astype(np.float32))
    out = np.asarray(fractional_shift_pallas(x, delta, 1, True))
    xn = np.asarray(x)
    dn = np.asarray(delta).astype(int)
    for b in range(B):
        for j in range(W):
            np.testing.assert_allclose(
                out[b, :, j], np.roll(xn[b, :, j], -dn[b, j]), atol=1e-6
            )


def test_custom_vjp_matches_xla_autodiff(rng):
    B, H, W = 4, 32, 32
    x = jnp.asarray(rng.standard_normal((B, H, W)).astype(np.float32))
    delta = jnp.asarray(rng.uniform(-10, 10, (B, W)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((B, H, W)).astype(np.float32))

    gp = jax.grad(
        lambda x, d: jnp.sum(w * fractional_shift_pallas(x, d, 1, True)),
        argnums=(0, 1),
    )(x, delta)
    gx = jax.grad(
        lambda x, d: jnp.sum(w * _fractional_shift(x, d[:, None, :], axis=1)),
        argnums=(0, 1),
    )(x, delta)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]), atol=1e-4)


def test_rotate_image_fast_backends_agree(rng):
    """The pallas 3-shear chain (interpret mode) == rotate_image_fast(xla)."""
    from livae_tpu.ops import resample
    from livae_tpu.ops.pallas.shear import fractional_shift_pallas as fsp

    imgs = jnp.asarray(rng.random((4, 32, 32, 1)).astype(np.float32))
    thetas = jnp.asarray(np.array([0.3, -1.2, 2.0, 3.5], dtype=np.float32))
    a = rotate_image_fast(imgs, thetas, "reflection", backend="xla")

    S = 32
    margin = S // 4
    theta = thetas
    q = jnp.round(theta / (jnp.pi / 2.0))
    phi = theta - q * (jnp.pi / 2.0)
    x = resample._rot90_select(imgs, q.astype(jnp.int32))
    x = jnp.pad(x, ((0, 0), (margin, margin), (margin, margin), (0, 0)), mode="reflect")
    P = S + 2 * margin
    c = (P - 1) / 2.0
    alpha = -jnp.tan(phi / 2.0)
    beta = jnp.sin(phi)
    grid_c = jnp.arange(P, dtype=jnp.float32) - c
    d_row = alpha[:, None] * grid_c[None, :]
    d_col = beta[:, None] * grid_c[None, :]
    out = fsp(x[..., 0], d_row, 2, True)
    out = fsp(out, d_col, 1, True)
    out = fsp(out, d_row, 2, True)
    out = out[:, margin : margin + S, margin : margin + S, None]
    np.testing.assert_allclose(np.asarray(out), np.asarray(a), atol=1e-5)
