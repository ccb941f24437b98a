"""Differential tests of the shared bilinear resampler against torch CPU.

This is the parity suite flagged as the #1 hard part in SURVEY.md §7:
torch's align_corners=False + reflection/zeros padding boundary semantics
must match exactly for ELBO parity. Random images x random affine matrices
are pushed through both implementations.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from livae_tpu.ops.resample import (
    affine_grid,
    center_crop,
    grid_sample,
    rotate_image,
    rotation_matrix,
    upsample2x_bilinear,
)


def rand_affine(rng, B):
    """Random rotation+scale+translation 2x3 matrices."""
    theta = rng.uniform(-np.pi, np.pi, size=B)
    scale = rng.uniform(0.5, 1.5, size=B)
    tx = rng.uniform(-0.8, 0.8, size=B)
    ty = rng.uniform(-0.8, 0.8, size=B)
    mats = np.zeros((B, 2, 3), dtype=np.float32)
    mats[:, 0, 0] = np.cos(theta) * scale
    mats[:, 0, 1] = -np.sin(theta) * scale
    mats[:, 0, 2] = tx
    mats[:, 1, 0] = np.sin(theta) * scale
    mats[:, 1, 1] = np.cos(theta) * scale
    mats[:, 1, 2] = ty
    return mats


@pytest.mark.parametrize("H,W", [(16, 16), (17, 23), (64, 64)])
def test_affine_grid_matches_torch(rng, H, W):
    B = 4
    mats = rand_affine(rng, B)
    ours = np.asarray(affine_grid(mats, (H, W)))
    theirs = F.affine_grid(
        torch.from_numpy(mats), (B, 1, H, W), align_corners=False
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["zeros", "border", "reflection"])
@pytest.mark.parametrize("H,W", [(16, 16), (33, 47)])
def test_grid_sample_matches_torch(rng, padding_mode, H, W):
    B, C = 3, 2
    img = rng.standard_normal((B, H, W, C)).astype(np.float32)
    mats = rand_affine(rng, B)
    grid_np = F.affine_grid(
        torch.from_numpy(mats), (B, C, H, W), align_corners=False
    ).numpy()

    ours = np.asarray(grid_sample(img, grid_np, padding_mode=padding_mode))
    theirs = (
        F.grid_sample(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(grid_np),
            mode="bilinear",
            padding_mode=padding_mode,
            align_corners=False,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_grid_sample_far_out_of_bounds_reflection(rng):
    """Multiple reflections: coordinates far outside [-1, 1]."""
    B, H, W, C = 2, 8, 8, 1
    img = rng.standard_normal((B, H, W, C)).astype(np.float32)
    grid = rng.uniform(-7.3, 7.3, size=(B, 12, 13, 2)).astype(np.float32)
    ours = np.asarray(grid_sample(img, grid, padding_mode="reflection"))
    theirs = (
        F.grid_sample(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(grid),
            padding_mode="reflection",
            align_corners=False,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_rotate_image_matches_torch_stn_composite(rng):
    """rotate_image == the reference's rotation_matrix+affine_grid+grid_sample."""
    B, H, W = 4, 32, 32
    img = rng.standard_normal((B, H, W, 1)).astype(np.float32)
    theta = rng.uniform(-np.pi, np.pi, size=(B, 1)).astype(np.float32)

    ours = np.asarray(rotate_image(img, theta, padding_mode="reflection"))

    t = torch.from_numpy(theta)
    cos_t, sin_t = torch.cos(t), torch.sin(t)
    row1 = torch.cat([cos_t, -sin_t, torch.zeros_like(t)], dim=1)
    row2 = torch.cat([sin_t, cos_t, torch.zeros_like(t)], dim=1)
    mat = torch.stack([row1, row2], dim=1)
    grid = F.affine_grid(mat, (B, 1, H, W), align_corners=False)
    theirs = (
        F.grid_sample(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            grid,
            padding_mode="reflection",
            align_corners=False,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_rotation_matrix_layout():
    mat = np.asarray(rotation_matrix(np.array([1.0]), np.array([0.0])))
    np.testing.assert_allclose(mat[0], [[1, 0, 0], [0, 1, 0]], atol=1e-7)


@pytest.mark.parametrize("H,W,h,w", [(20, 20, 10, 10), (21, 19, 10, 9), (8, 8, 12, 12)])
def test_center_crop_matches_torchvision_convention(rng, H, W, h, w):
    img = rng.standard_normal((2, H, W, 1)).astype(np.float32)
    ours = np.asarray(center_crop(img, (h, w)))

    # torchvision center_crop reimplemented (it pads then crops with round())
    t = torch.from_numpy(img.transpose(0, 3, 1, 2))
    if h > H or w > W:
        pl = max(0, (w - W) // 2)
        pt = max(0, (h - H) // 2)
        pr = max(0, w - W - pl)
        pb = max(0, h - H - pt)
        t = F.pad(t, (pl, pr, pt, pb))
    _, _, Hc, Wc = t.shape
    top = int(round((Hc - h) / 2.0))
    left = int(round((Wc - w) / 2.0))
    theirs = t[:, :, top : top + h, left : left + w].numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-7)


def test_upsample2x_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(upsample2x_bilinear(x))
    theirs = (
        F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            scale_factor=2,
            mode="bilinear",
            align_corners=False,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestFastRotation:
    """Gather-free 3-shear rotation vs the exact bilinear grid sampler."""

    def test_matches_exact_in_interior(self, rng):
        from livae_tpu.ops.resample import rotate_image, rotate_image_fast

        # smooth content: interpolation-scheme differences are small
        y, x = np.mgrid[:64, :64].astype(np.float32)
        img = np.exp(-((y - 25) ** 2 + (x - 40) ** 2) / (2 * 10**2)).astype(np.float32)
        imgs = np.stack([img] * 17)[..., None]
        thetas = np.linspace(-np.pi, np.pi, 17).astype(np.float32)
        exact = np.asarray(rotate_image(imgs, thetas, "reflection"))
        fast = np.asarray(rotate_image_fast(imgs, thetas, "reflection"))
        err = np.abs(fast - exact)
        # boundary-reflection handling differs (pre-pad vs reflect-compose);
        # the difference decays moving inward from the border
        assert err[:, 8:-8, 8:-8].max() < 2e-2
        assert err.mean() < 2e-3

    def test_90_degree_multiples_exact(self, rng):
        from livae_tpu.ops.resample import rotate_image, rotate_image_fast

        imgs = rng.random((4, 32, 32, 1)).astype(np.float32)
        t90 = np.array([0, np.pi / 2, np.pi, -np.pi / 2], dtype=np.float32)
        e = np.asarray(rotate_image(imgs, t90, "reflection"))
        f = np.asarray(rotate_image_fast(imgs, t90, "reflection"))
        np.testing.assert_allclose(f, e, atol=1e-5)

    def test_pallas_backend_falls_back_above_vmem_budget(self, rng):
        """Canvases around 448+ overflow the rot3 backward kernel's
        scoped-VMEM budget even at TB=1; rotate_image_fast must dispatch
        the XLA shear branch instead of letting pallas_call fail at
        compile. (backend="pallas" on this CPU suite would error if the
        kernel were actually launched, so success proves the fallback.)"""
        import jax.numpy as jnp
        from livae_tpu.ops.pallas.rot3 import rot3_fits_vmem
        from livae_tpu.ops.resample import rotate_image_fast

        assert rot3_fits_vmem(256, 256)  # production canvases stay fused
        assert rot3_fits_vmem(384, 384)
        assert not rot3_fits_vmem(448, 448)
        assert not rot3_fits_vmem(512, 512)

        imgs = jnp.asarray(rng.random((2, 64, 64, 1)).astype(np.float32))
        thetas = jnp.asarray(np.array([0.4, -1.1], dtype=np.float32))
        # margin=192 -> canvas P=448: beyond the budget at TB=1. An
        # explicitly requested pallas backend must warn that it fell back.
        with pytest.warns(UserWarning, match="VMEM budget"):
            out_p = rotate_image_fast(
                imgs, thetas, "reflection", margin=192, backend="pallas"
            )
        out_x = rotate_image_fast(
            imgs, thetas, "reflection", margin=192, backend="xla"
        )
        np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_x))

    def test_gradients_match_exact(self, rng):
        import jax
        import jax.numpy as jnp
        from livae_tpu.ops.resample import rotate_image, rotate_image_fast

        y, x = np.mgrid[:32, :32].astype(np.float32)
        img = np.exp(-((y - 14) ** 2 + (x - 20) ** 2) / 50.0).astype(np.float32)
        imgs = jnp.asarray(np.stack([img] * 4)[..., None])
        thetas = jnp.asarray(np.array([0.3, -0.7, 1.9, 2.8], dtype=np.float32))

        # random-weighted functional: an unweighted sum over a near-symmetric
        # image is pure cancellation noise in d/dtheta
        w = jnp.asarray(
            np.random.default_rng(5).standard_normal((4, 32, 32, 1)).astype(np.float32)
        )
        g_fast = jax.grad(lambda t: jnp.sum(w * rotate_image_fast(imgs, t, "reflection")))(thetas)
        g_exact = jax.grad(lambda t: jnp.sum(w * rotate_image(imgs, t, "reflection")))(thetas)
        np.testing.assert_allclose(
            np.asarray(g_fast), np.asarray(g_exact), rtol=0.2, atol=0.3
        )

    def test_rvae_fast_vs_exact_model(self, rng):
        """Full rVAE forward with fast resampler tracks the exact one."""
        import jax
        import jax.numpy as jnp
        from livae_tpu.models.rvae import RVAE

        x = jnp.asarray(rng.random((2, 32, 32, 1)).astype(np.float32))
        exact_model = RVAE(latent_dim=4, patch_size=32, fast_resample=False)
        fast_model = RVAE(latent_dim=4, patch_size=32, fast_resample=True)
        params = exact_model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)}, x
        )
        oe = exact_model.apply(params, x, rngs={"sample": jax.random.key(2)})
        of = fast_model.apply(params, x, rngs={"sample": jax.random.key(2)})
        # theta, mu, logvar nearly identical; recons differ only by resampling
        np.testing.assert_allclose(np.asarray(of[2]), np.asarray(oe[2]), atol=5e-3)
        np.testing.assert_allclose(np.asarray(of[3]), np.asarray(oe[3]), atol=5e-3)
        assert np.abs(np.asarray(of[0]) - np.asarray(oe[0])).mean() < 2e-2
