"""Fused 3-shear rotation kernel tests (interpret mode on CPU).

rot3_pallas must match the XLA 3-shear path bit-for-bit (same f32
arithmetic, fused into one launch), including its fused VJP (dx = same
kernel with negated shifts; d/ddelta recomputed in VMEM).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from livae_tpu.ops.pallas.rot3 import rot3_pallas
from livae_tpu.ops.resample import _fractional_shift, rotate_image_fast


def _xla_rot3(x, d_row, d_col):
    out = _fractional_shift(x, d_row[:, :, None], axis=2)
    out = _fractional_shift(out, d_col[:, None, :], axis=1)
    return _fractional_shift(out, d_row[:, :, None], axis=2)


@pytest.fixture
def case(rng):
    B, P = 4, 64
    x = jnp.asarray(rng.standard_normal((B, P, P)).astype(np.float32))
    d_row = jnp.asarray(rng.uniform(-20, 20, (B, P)).astype(np.float32))
    d_col = jnp.asarray(rng.uniform(-20, 20, (B, P)).astype(np.float32))
    return x, d_row, d_col


def test_forward_matches_xla(case):
    x, d_row, d_col = case
    ours = rot3_pallas(x, d_row, d_col, True)
    ref = _xla_rot3(x, d_row, d_col)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-6)


def test_bfloat16_io(case):
    x, d_row, d_col = case
    out16 = rot3_pallas(x.astype(jnp.bfloat16), d_row, d_col, True)
    assert out16.dtype == jnp.bfloat16
    # the fused kernel keeps f32 through all three stages and casts ONCE —
    # exactly the XLA path's semantics on a bf16 input
    ref = _xla_rot3(x.astype(jnp.bfloat16), d_row, d_col).astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(out16, dtype=np.float32), np.asarray(ref, dtype=np.float32)
    )


def test_fused_vjp_matches_xla_autodiff(case, rng):
    x, d_row, d_col = case
    w = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))

    gp = jax.grad(
        lambda x, dr, dc: jnp.sum(w * rot3_pallas(x, dr, dc, True)),
        argnums=(0, 1, 2),
    )(x, d_row, d_col)
    gx = jax.grad(
        lambda x, dr, dc: jnp.sum(w * _xla_rot3(x, dr, dc)),
        argnums=(0, 1, 2),
    )(x, d_row, d_col)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gp[2]), np.asarray(gx[2]), atol=1e-3)


def test_fused_vjp_integer_and_mixed_deltas(case, rng):
    """Exact-integer shifts (f == 0 — e.g. theta == 0 at STN init) flip
    the adjoint pair's ordering (floor(-d) = -k, not -(k+1)); mix integer
    rows with fractional ones so the per-lane select is exercised."""
    x, d_row_frac, _ = case
    B, P = x.shape[:2]
    w = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    d_int = jnp.asarray(rng.integers(-5, 6, (B, P)).astype(np.float32))
    half = jnp.asarray(
        (np.arange(P) % 2).astype(np.float32)
    )  # alternate integer / fractional lanes
    cases = [
        (d_int, d_int),
        (jnp.zeros((B, P), jnp.float32), d_int),
        (d_int + half * 0.37, d_int),
    ]
    for d_row, d_col in cases:
        gp = jax.grad(
            lambda x, dr, dc: jnp.sum(w * rot3_pallas(x, dr, dc, True)),
            argnums=(0, 1, 2),
        )(x, d_row, d_col)
        gx = jax.grad(
            lambda x, dr, dc: jnp.sum(w * _xla_rot3(x, dr, dc)),
            argnums=(0, 1, 2),
        )(x, d_row, d_col)
        np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]), atol=1e-3)
        np.testing.assert_allclose(np.asarray(gp[2]), np.asarray(gx[2]), atol=1e-3)


def test_rotate_image_fast_pallas_backend_uses_rot3(rng):
    """rotate_image_fast(backend=pallas) in interpret == the XLA backend."""
    import livae_tpu.ops.pallas.rot3 as rot3mod

    imgs = jnp.asarray(rng.random((4, 32, 32, 1)).astype(np.float32))
    thetas = jnp.asarray(np.array([0.3, -1.2, 2.0, 3.5], dtype=np.float32))
    a = rotate_image_fast(imgs, thetas, "reflection", backend="xla")

    orig = rot3mod.rot3_pallas

    def interp(x, dr, dc, interpret=False):
        return orig(x, dr, dc, True)

    rot3mod.rot3_pallas = interp
    try:
        b = rotate_image_fast(imgs, thetas, "reflection", backend="pallas")
    finally:
        rot3mod.rot3_pallas = orig
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)
