"""FFT filter tests, porting the reference's test strategy.

Mirrors reference tests/test_filter.py: normalization range/constant
handling, spectra shapes, checkerboard high-frequency behavior under
low/high/band-pass, invalid cutoffs, and non-2D rejection — plus a
differential check against scipy.fft to pin numerical parity.
"""

import numpy as np
import pytest
from scipy import fft as sfft

from livae_tpu.ops.fft import (
    bandpass_filter,
    fft_spectra,
    highpass_filter,
    lowpass_filter,
    normalize_image,
)


def checkerboard(n=64):
    y, x = np.mgrid[:n, :n]
    return ((x + y) % 2).astype(np.float64)


class TestNormalizeImage:
    def test_range(self):
        img = np.array([[0.0, 50.0], [100.0, 150.0]])
        norm = np.asarray(normalize_image(img))
        assert norm.min() == pytest.approx(0.0)
        assert norm.max() == pytest.approx(1.0)

    def test_constant_input_returns_zeros(self):
        img = np.full((8, 8), 3.7)
        norm = np.asarray(normalize_image(img))
        assert np.all(norm == 0.0)

    def test_preserves_shape(self):
        img = np.random.rand(17, 23)
        assert normalize_image(img).shape == (17, 23)


class TestFFTSpectra:
    def test_shapes(self):
        img = np.random.rand(32, 32)
        mag, phase = fft_spectra(img)
        assert mag.shape == (32, 32)
        assert phase.shape == (32, 32)

    def test_matches_scipy(self):
        rng = np.random.default_rng(1)
        img = rng.random((64, 64))
        mag, phase = fft_spectra(img)
        ref = sfft.fftshift(sfft.fft2(img))
        np.testing.assert_allclose(np.asarray(mag), np.abs(ref), rtol=1e-4, atol=1e-3)
        # Only compare phase where magnitude is non-negligible
        sel = np.abs(ref) > 1e-3
        dphi = np.asarray(phase)[sel] - np.angle(ref)[sel]
        dphi = np.abs(np.arctan2(np.sin(dphi), np.cos(dphi)))  # wraparound-aware
        assert dphi.max() < 1e-3

    def test_rejects_non_2d(self):
        with pytest.raises(ValueError):
            fft_spectra(np.random.rand(4, 4, 4))


class TestFilters:
    def test_lowpass_attenuates_checkerboard(self):
        img = checkerboard()
        out = np.asarray(lowpass_filter(img, cutoff_radius=10))
        # checkerboard is the highest frequency: lowpass should flatten it
        assert out.std() < 0.1 * img.std()

    def test_highpass_retains_checkerboard(self):
        img = checkerboard()
        out = np.asarray(highpass_filter(img, cutoff_radius=10))
        assert out.std() > 0.5 * img.std()

    def test_bandpass_suppresses_gradient(self):
        n = 64
        grad = np.linspace(0, 1, n)[None, :] * np.ones((n, 1))
        img = grad + 0.1 * checkerboard(n)
        out = np.asarray(bandpass_filter(img, low_cutoff=3, high_cutoff=20))
        # both DC/gradient (low) and checkerboard (high) are outside the band
        assert out.std() < img.std()

    def test_bandpass_invalid_cutoffs(self):
        with pytest.raises(ValueError):
            bandpass_filter(np.random.rand(16, 16), low_cutoff=10, high_cutoff=5)

    def test_filters_reject_non_2d(self):
        with pytest.raises(ValueError):
            lowpass_filter(np.random.rand(8,), 3)

    def test_matches_scipy_reference_pipeline(self):
        """Differential parity with the reference's scipy implementation."""
        rng = np.random.default_rng(2)
        img = rng.random((128, 128))

        def ref_bandpass(image, low, high):
            rows, cols = image.shape
            cy, cx = rows // 2, cols // 2
            y, x = np.ogrid[:rows, :cols]
            r = np.sqrt((x - cx) ** 2 + (y - cy) ** 2)
            mask = (r >= low) & (r <= high)
            f = sfft.fftshift(sfft.fft2(image))
            return np.real(sfft.ifft2(sfft.ifftshift(f * mask)))

        ours = np.asarray(bandpass_filter(img, 5, 40))
        theirs = ref_bandpass(img, 5, 40)
        np.testing.assert_allclose(ours, theirs, atol=1e-4)
