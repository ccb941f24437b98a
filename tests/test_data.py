"""Dataset + pipeline tests: indexing contracts, extraction correctness,
augmentation distributions, paired-rotation semantics, HDF5 I/O.

Ports the reference's indexing tests (reference test_dataset_indexing.py)
onto synthetic frames and adds checks the reference lacks: the extracted
patch is verifiably centered on the requested site, and the paired
rotation satisfies the STN cycle relation.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from livae_tpu.data.datasets import (
    AdaptiveLatticeDataset,
    PairedAdaptiveLatticeDataset,
    PatchDataset,
    default_transform,
)
from livae_tpu.data.h5 import load_image_from_h5
from livae_tpu.data.pipeline import AugmentConfig, extract_batch, pad_frames
from livae_tpu.data.synthetic import save_frame_h5, synthetic_mos2_frame


@pytest.fixture(scope="module")
def frames():
    f1, _ = synthetic_mos2_frame(size=512, spacing=40.0, seed=0)
    f2, _ = synthetic_mos2_frame(size=512, spacing=40.0, seed=1, rotation_deg=20.0)
    return [f1, f2]


@pytest.fixture(scope="module")
def adaptive_ds(frames):
    return AdaptiveLatticeDataset(frames, patch_size=64, padding=16)


class TestExtraction:
    def test_patch_centered_on_site(self):
        """A bright dot at the site center must land at pixel P2/2-crop."""
        frame = np.zeros((256, 256), np.float32)
        cy, cx = 130.3, 97.6
        y, x = np.mgrid[:256, :256]
        frame += np.exp(-((y - cy) ** 2 + (x - cx) ** 2) / (2 * 2.0**2))
        fp = pad_frames(jnp.asarray(frame)[None], 64)
        patch = extract_batch(
            fp,
            jnp.array([0]),
            jnp.array([[cy, cx]], jnp.float32),
            None,
            patch_size=32,
            padding=8,
            cfg=None,
            normalize=False,
            margin=64,
        )
        p = np.asarray(patch[0, :, :, 0])
        my, mx = np.unravel_index(p.argmax(), p.shape)
        # atom center lands at index P/2 (reference convention)
        assert abs(my - 16) <= 1 and abs(mx - 16) <= 1
        # sub-pixel recentering: the 4 pixels around P/2 interpolate the peak
        assert p.max() > 0.9

    def test_edge_site_zero_padded(self):
        frame = np.ones((128, 128), np.float32)
        fp = pad_frames(jnp.asarray(frame)[None], 64)
        patch = extract_batch(
            fp, jnp.array([0]), jnp.array([[2.0, 2.0]], jnp.float32), None,
            patch_size=32, padding=8, cfg=None, normalize=False, margin=64,
        )
        p = np.asarray(patch[0, :, :, 0])
        assert p[0, 0] == 0.0  # outside the frame
        assert p[20, 20] == 1.0  # inside

    def test_folded_flips_jitter_bit_identical(self):
        """The flip+roll fold into the resample grid must be bit-identical
        to resampling first and applying _flips_and_jitter after (the
        formulation the fold replaced)."""
        from livae_tpu.data.pipeline import _flips_and_jitter, _scale_translate

        rng = np.random.default_rng(3)
        B, R, P2 = 16, 96, 80
        rois = jnp.asarray(rng.random((B, R, R), dtype=np.float32))
        ry = jnp.asarray(rng.uniform(R / 2 - 1, R / 2 + 1, B).astype(np.float32))
        rx = jnp.asarray(rng.uniform(R / 2 - 1, R / 2 + 1, B).astype(np.float32))
        scale = jnp.asarray(rng.uniform(0.9, 1.1, B).astype(np.float32))
        fh = jnp.asarray(rng.random(B) < 0.5)
        fv = jnp.asarray(rng.random(B) < 0.5)
        jy = jnp.asarray(rng.integers(-4, 5, B), jnp.int32)
        jx = jnp.asarray(rng.integers(-4, 5, B), jnp.int32)

        seq = _flips_and_jitter(
            _scale_translate(rois, ry, rx, P2, scale), fh, fv, jy, jx
        )
        fold = _scale_translate(rois, ry, rx, P2, scale, fh, fv, jy, jx)
        np.testing.assert_array_equal(np.asarray(seq), np.asarray(fold))

    def test_axis_resample_backends_agree(self):
        """The TPU one-hot-matmul resample backend must match the gather
        backend to 1 ulp (same products; only the contraction's add order /
        FMA usage differs), including out-of-bounds zero weighting and
        border clamping."""
        from livae_tpu.data.pipeline import (
            _axis_resample_gather,
            _axis_resample_matmul,
        )

        rng = np.random.default_rng(7)
        B, H, W, n_out = 8, 48, 48, 40
        x = jnp.asarray(rng.random((B, H, W), dtype=np.float32))
        for axis in (1, 2):
            n = x.shape[axis]
            # spans in-bounds, clamped-at-border, and fully out-of-bounds
            src = jnp.asarray(
                rng.uniform(-3.0, n + 2.0, (B, n_out)).astype(np.float32)
            )
            g = _axis_resample_gather(x, src, axis)
            m = _axis_resample_matmul(x, src, axis)
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(m), rtol=0.0, atol=2.4e-7
            )

    def test_axis_resample_matmul_accepts_bf16(self):
        """dot_general rejects mixed operand dtypes: the matmul backend must
        promote non-f32 frames itself (the gather backend's w*x products do
        so implicitly), matching the gather result after promotion."""
        from livae_tpu.data.pipeline import (
            _axis_resample_gather,
            _axis_resample_matmul,
        )

        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.random((4, 32, 32), dtype=np.float32)).astype(
            jnp.bfloat16
        )
        src = jnp.asarray(rng.uniform(-1.0, 33.0, (4, 24)).astype(np.float32))
        for axis in (1, 2):
            g = _axis_resample_gather(x, src, axis)
            m = _axis_resample_matmul(x, src, axis)
            assert m.dtype == jnp.float32  # promoted like the gather path
            np.testing.assert_allclose(
                np.asarray(g, np.float32), np.asarray(m), rtol=0.0, atol=2e-7
            )

    def test_crop_backends_agree(self):
        """The row-gather + 0/1-matmul crop must reproduce the
        dynamic_slice crop bit-exactly (the selector has one 1 per row and
        the bf16x3 decomposition reconstructs f32 exactly)."""
        from livae_tpu.data.pipeline import (
            _crop_rois_rowgather,
            _crop_rois_slice,
            _crop_starts,
        )

        rng = np.random.default_rng(11)
        N, H, W, B, roi, margin = 2, 96, 96, 16, 40, 28
        frames = jnp.asarray(
            rng.random((N, H + 2 * margin, W + 2 * margin), dtype=np.float32)
        )
        img_idx = jnp.asarray(rng.integers(0, N, B), jnp.int32)
        cy = jnp.asarray(rng.uniform(roi / 2, H - roi / 2, B).astype(np.float32))
        cx = jnp.asarray(rng.uniform(roi / 2, W - roi / 2, B).astype(np.float32))
        # contract-violating coordinates (beyond what the pad margin
        # guarantees): origin clamping must keep both backends identical
        # and in the RIGHT frame, mirroring dynamic_slice's clamp
        cy = cy.at[0].set(-2.0 * margin).at[1].set(H + 2.0 * margin)
        cx = cx.at[2].set(-2.0 * margin).at[3].set(W + 2.0 * margin)
        y0, x0, _, _ = _crop_starts(
            cy, cx, roi, margin, padded_shape=frames.shape[1:3]
        )
        a = _crop_rois_slice(frames, img_idx, y0, x0, roi)
        b = _crop_rois_rowgather(frames, img_idx, y0, x0, roi)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # the clamped OOB crops equal in-frame corner crops of their OWN frame
        np.testing.assert_array_equal(
            np.asarray(b[0]), np.asarray(frames[int(img_idx[0]), :roi])[:, int(x0[0]) : int(x0[0]) + roi]
        )

    def test_crop_backends_agree_tiled(self):
        """Wide frames take the 256-column-tile gather path (the narrow
        frames above fall back to whole-row gathers): still bit-exact vs
        dynamic_slice, including windows straddling a tile boundary, at
        the right edge (k0 clamped to K - n_tiles), and on a width that
        is NOT a multiple of the tile (right-pad branch)."""
        from livae_tpu.data.pipeline import (
            _CROP_TILE,
            _crop_rois_rowgather,
            _crop_rois_slice,
            _crop_starts,
        )

        rng = np.random.default_rng(7)
        N, H, roi, margin = 2, 96, 48, 30
        for W in (2 * _CROP_TILE - 2 * margin, 600):  # exact grid / pad branch
            Wp = W + 2 * margin
            frames = jnp.asarray(
                rng.random((N, H + 2 * margin, Wp), dtype=np.float32)
            )
            B = 12
            img_idx = jnp.asarray(rng.integers(0, N, B), jnp.int32)
            cy = jnp.asarray(rng.uniform(roi / 2, H - roi / 2, B).astype(np.float32))
            cx = jnp.asarray(rng.uniform(roi / 2, W - roi / 2, B).astype(np.float32))
            # pin a tile-straddling window and both edges
            cx = cx.at[0].set(_CROP_TILE - margin - 1.0)  # straddles tile 0/1
            cx = cx.at[1].set(float(roi) / 2)  # left edge
            cx = cx.at[2].set(W - float(roi) / 2)  # right edge (k0 clamp)
            y0, x0, _, _ = _crop_starts(
                cy, cx, roi, margin, padded_shape=frames.shape[1:3]
            )
            a = _crop_rois_slice(frames, img_idx, y0, x0, roi)
            b = _crop_rois_rowgather(frames, img_idx, y0, x0, roi)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_normalization(self):
        frame = np.random.default_rng(0).random((128, 128)).astype(np.float32) * 7 + 3
        fp = pad_frames(jnp.asarray(frame)[None], 64)
        patch = extract_batch(
            fp, jnp.array([0]), jnp.array([[64.0, 64.0]], jnp.float32), None,
            patch_size=32, padding=8, cfg=None, normalize=True, margin=64,
        )
        p = np.asarray(patch[0])
        assert p.min() == pytest.approx(0.0) and p.max() == pytest.approx(1.0)


class TestDatasets:
    def test_lengths_and_indexing(self, adaptive_ds):
        n = len(adaptive_ds)
        assert n > 20
        p0 = adaptive_ds[0]
        plast = adaptive_ds[n - 1]
        assert p0.shape == (64, 64, 1) and plast.shape == (64, 64, 1)
        with pytest.raises(IndexError):
            adaptive_ds[n]
        with pytest.raises(IndexError):
            adaptive_ds[-1]

    def test_batch_sampling(self, adaptive_ds):
        batch = adaptive_ds.sample_batch(jax.random.key(0), 16)
        assert batch.shape == (16, 64, 64, 1)
        b = np.asarray(batch)
        assert np.isfinite(b).all()
        assert b.min() >= 0.0 and b.max() <= 1.0

    @pytest.mark.slow
    def test_iter_epoch_covers_dataset(self, adaptive_ds):
        n = len(adaptive_ds)
        batches = list(adaptive_ds.iter_epoch(jax.random.key(1), 8))
        assert len(batches) == n // 8
        assert all(b.shape == (8, 64, 64, 1) for b in batches)

    def test_unpaired_no_norm(self, frames, adaptive_ds):
        """normalize=False skips the per-patch min-max on the unpaired path.

        The no-norm training recipe (BASELINE.md accuracy program) must be
        expressible on AdaptiveLatticeDataset too, so the analysis scripts
        encode with the same distribution the model trained on.
        """
        ds_raw = AdaptiveLatticeDataset(
            frames, patch_size=64, padding=16, normalize=False
        )
        idx = np.arange(8)
        raw = np.asarray(ds_raw.batch_at(idx))
        norm = np.asarray(adaptive_ds.batch_at(idx))
        # normalized patches are exactly min0/max1 per patch; raw ones keep
        # the frame's scale (site tables are identical, so same patches)
        assert np.allclose(norm.max(axis=(1, 2, 3)), 1.0, atol=1e-5)
        assert not np.allclose(raw.max(axis=(1, 2, 3)), 1.0, atol=1e-5)

    def test_rejects_host_callable_transform(self, frames):
        with pytest.raises(TypeError):
            AdaptiveLatticeDataset(frames, 64, transform=lambda x: x)

    def test_patch_dataset(self, frames):
        ds = PatchDataset(frames, patch_size=64, padding=4)
        assert len(ds) > 20
        assert ds.transform.rotation is True  # reference uses rotation=True
        batch = ds.sample_batch(jax.random.key(0), 4)
        assert batch.shape == (4, 64, 64, 1)

    @pytest.mark.slow
    def test_plot_peaks(self, frames, tmp_path):
        """Debug viz parity (reference data.py:252-289): full frame and a
        cropped region with peak re-basing, saved headlessly."""
        pytest.importorskip("matplotlib")
        ds = PatchDataset(frames, patch_size=64, padding=4)
        full = tmp_path / "peaks_full.png"
        crop = tmp_path / "peaks_crop.png"
        ds.plot_peaks(0, save_path=str(full))
        ds.plot_peaks(0, size=128, offset=(32, 32), save_path=str(crop))
        assert full.stat().st_size > 0 and crop.stat().st_size > 0


class TestPaired:
    @pytest.mark.slow
    def test_paired_shapes_and_angle_range(self, frames):
        ds = PairedAdaptiveLatticeDataset(frames, patch_size=64, padding=16)
        patch, rotated, angle = ds.sample_batch(jax.random.key(0), 8)
        assert patch.shape == rotated.shape == (8, 64, 64, 1)
        a = np.asarray(angle)
        assert np.all((a >= 0) & (a < 2 * np.pi))

    def test_cycle_relation(self, frames):
        """rotate(patch, +angle) must satisfy theta_rot = theta_orig - angle
        under the STN's own sampler: rotating the ROTATED patch by -angle
        must recover the original patch (up to interp error)."""
        from livae_tpu.ops.resample import rotate_image_fast

        ds = PairedAdaptiveLatticeDataset(
            frames, patch_size=64, padding=16, transform=None
        )
        patch, rotated, angle = ds.batch_at(jnp.arange(4), jax.random.key(3))
        # undo: rotate the rotated patch by -angle -> should match patch
        undone = rotate_image_fast(rotated, -angle, padding_mode="zeros")
        center_err = np.abs(
            np.asarray(undone)[:, 24:40, 24:40] - np.asarray(patch)[:, 24:40, 24:40]
        )
        assert center_err.mean() < 0.12


class TestRotationMargin:
    """margin=S//6 rotations are bit-identical on the kept central crop.

    The extraction pipeline rotates the padded S-canvas and keeps only the
    central patch_size crop; wraparound from the reduced shear margin only
    ever touches the discarded outer ring. Pins the equality against the
    conservative default margin S//4 over an angle grid, at the production
    shape (S=192, keep 128), the reference-default-padding shape (S=224,
    keep 128), and a small shape (S=96, keep 64).
    """

    @pytest.mark.parametrize("S,keep", [(192, 128), (224, 128), (96, 64)])
    def test_central_crop_equal(self, S, keep):
        from livae_tpu.ops.resample import center_crop, rotate_image_fast

        rng = np.random.default_rng(S)
        x = jnp.asarray(rng.random((4, S, S, 1), dtype=np.float32))
        for frac in (0.0, 0.11, 0.23, 0.37, 0.49, 0.61, 0.74, 0.88, 0.99):
            th = jnp.full((4,), 2 * np.pi * frac, jnp.float32)
            a = rotate_image_fast(x, th, padding_mode="zeros", margin=S // 4)
            b = rotate_image_fast(x, th, padding_mode="zeros", margin=S // 6)
            np.testing.assert_array_equal(
                np.asarray(center_crop(a, (keep, keep))),
                np.asarray(center_crop(b, (keep, keep))),
                err_msg=f"S={S} keep={keep} frac={frac}",
            )


class TestRotDtype:
    """rot_dtype=bfloat16 paired extraction: x identical, x_rot close.

    The rotated copy feeds only the theta-localization pass whose convs
    cast to bf16 anyway; the unrotated patch must be untouched."""

    def test_bf16_rot_copy(self):
        from livae_tpu.data.pipeline import AugmentConfig, _extract_batch_paired_impl, pad_frames

        rng = np.random.default_rng(0)
        P, pad = 32, 8
        roi = P + 2 * pad + 16
        margin = roi // 2 + 8
        frames = pad_frames(jnp.asarray(rng.random((1, 256, 256), dtype=np.float32)), margin)
        ii = jnp.zeros((8,), jnp.int32)
        cc = jnp.asarray(rng.uniform(roi // 2, 256 - roi // 2, (8, 2)).astype(np.float32))
        k = jax.random.key(0)
        x32, r32, a32 = _extract_batch_paired_impl(
            frames, ii, cc, k, P, pad, cfg=AugmentConfig(), margin=margin
        )
        x16, r16, a16 = _extract_batch_paired_impl(
            frames, ii, cc, k, P, pad, cfg=AugmentConfig(), margin=margin,
            rot_dtype="bfloat16",
        )
        np.testing.assert_array_equal(np.asarray(x32), np.asarray(x16))
        np.testing.assert_array_equal(np.asarray(a32), np.asarray(a16))
        assert r16.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(r16, dtype=np.float32), np.asarray(r32), atol=0.02
        )


class TestAugmentDistributions:
    def test_distributions_match_reference(self):
        from livae_tpu.data.pipeline import _sample_aug

        cfg = AugmentConfig()
        scale, angle, fh, fv, jy, jx = _sample_aug(jax.random.key(0), 4096, cfg)
        scale, angle, fh, fv, jy, jx = map(np.asarray, (scale, angle, fh, fv, jy, jx))
        assert 0.9 <= scale.min() and scale.max() <= 1.1
        assert abs(scale.mean() - 1.0) < 0.005
        assert 0 <= angle.min() and angle.max() < 2 * np.pi
        assert abs(fh.mean() - 0.5) < 0.05 and abs(fv.mean() - 0.5) < 0.05
        assert jy.min() == -4 and jy.max() == 4  # inclusive randint like random.randint
        assert set(np.unique(jx)) == set(range(-4, 5))


class TestH5:
    def test_roundtrip_reference_layout(self, tmp_path):
        frame = np.random.default_rng(0).random((64, 64))
        path = tmp_path / "test.h5"
        save_frame_h5(path, frame)
        loaded = load_image_from_h5(path)
        np.testing.assert_array_equal(loaded, frame)
        # exact dataset path
        loaded2 = load_image_from_h5(path, "Measurement_000/Channel_000/HAADF/HAADF")
        np.testing.assert_array_equal(loaded2, frame)
        # basename search
        loaded3 = load_image_from_h5(path, "HAADF")
        np.testing.assert_array_equal(loaded3, frame)

    def test_autodetect_prefers_named(self, tmp_path):
        import h5py

        path = tmp_path / "multi.h5"
        small = np.ones((8, 8))
        big = np.zeros((32, 32))
        with h5py.File(path, "w") as f:
            f.create_dataset("group/other", data=big)
            f.create_dataset("group/image", data=small)
        loaded = load_image_from_h5(path)
        np.testing.assert_array_equal(loaded, small)  # preferred name wins

    def test_no_2d_raises(self, tmp_path):
        import h5py

        path = tmp_path / "bad.h5"
        with h5py.File(path, "w") as f:
            f.create_dataset("x", data=np.zeros(5))
        with pytest.raises(KeyError):
            load_image_from_h5(path)
