"""Lattice estimation + peak detection + adaptive lattice tests.

Ports the reference's synthetic-fixture strategy (reference
tests/test_utils.py: hexagonal 3-plane-wave image, spacing within [14, 18],
noise fallback 15.0, parameter overrides) and adds adaptive-lattice and
TPU-NMS coverage on synthetic MoS2 frames with known ground truth.
"""

import numpy as np
import pytest

from livae_tpu.data.synthetic import hexagonal_wave_image, synthetic_mos2_frame
from livae_tpu.ops.fft import bandpass_filter, normalize_image
from livae_tpu.ops.lattice import (
    build_adaptive_lattice,
    estimate_lattice_constant,
    extrapolate_lattice_grid,
    generate_lattice_grid,
)
from livae_tpu.ops.peaks import (
    detect_peaks_tpu,
    get_clean_peaks,
    peak_local_max,
    peak_local_max_tpu,
)


class TestEstimateLatticeConstant:
    def test_synthetic_hexagonal_spacing(self):
        img = hexagonal_wave_image(size=256, spacing=16.0, noise=0.1)
        spacing = estimate_lattice_constant(img)
        assert 14.0 <= spacing <= 18.0

    def test_noise_fallback(self):
        rng = np.random.default_rng(0)
        img = rng.normal(0, 1, (256, 256))
        assert estimate_lattice_constant(img) == 15.0

    def test_parameter_overrides(self):
        img = hexagonal_wave_image(size=256, spacing=16.0, noise=0.05)
        s1 = estimate_lattice_constant(img, min_atom_size=8.0, max_atom_size=40.0)
        assert 14.0 <= s1 <= 18.0

    def test_high_prominence_falls_back(self):
        img = hexagonal_wave_image(size=256, spacing=16.0, noise=2.5, seed=3)
        # extremely strict prominence: no peak survives
        s = estimate_lattice_constant(img, prominence_factor=5.0)
        assert s == 15.0


class TestPeakDetection:
    def make_spots(self, n=128, coords=((20, 20), (20, 60), (60, 40)), width=2.0):
        img = np.zeros((n, n))
        y, x = np.mgrid[:n, :n]
        for cy, cx in coords:
            img += np.exp(-((y - cy) ** 2 + (x - cx) ** 2) / (2 * width**2))
        return img

    def test_host_finds_all_spots(self):
        img = self.make_spots()
        peaks = peak_local_max(img, min_distance=5, threshold_rel=0.1)
        assert len(peaks) == 3
        found = {tuple(p) for p in peaks}
        assert found == {(20, 20), (20, 60), (60, 40)}

    def test_min_distance_suppression(self):
        img = self.make_spots(coords=((30, 30), (30, 34)))
        peaks = peak_local_max(img, min_distance=10, threshold_rel=0.1)
        assert len(peaks) == 1

    def test_get_clean_peaks_refines(self):
        img = self.make_spots()
        img[21, 21] = img.max() * 1.5  # sharper max 1px away from smooth peak
        peaks = get_clean_peaks(img, min_distance=5, threshold_rel=0.1)
        assert [21, 21] in peaks.tolist()

    def test_tpu_matches_host_on_synthetic_frame(self):
        frame, _ = synthetic_mos2_frame(size=512, spacing=16.0, seed=1)
        img = np.asarray(normalize_image(bandpass_filter(frame, 5, 64)))
        md = 4
        host = peak_local_max(img, min_distance=md, threshold_rel=0.05)
        coords, valid = peak_local_max_tpu(
            img, min_distance=md, threshold_rel=0.05, max_peaks=8192
        )
        dev = np.asarray(coords)[np.asarray(valid)]
        host_set = {tuple(p) for p in host}
        dev_set = {tuple(p) for p in dev}
        # device NMS (window-maximum) is a superset-free approximation of
        # host greedy spacing; on well-separated atomic peaks they agree
        overlap = len(host_set & dev_set) / max(len(host_set), 1)
        assert overlap > 0.97
        assert abs(len(dev_set) - len(host_set)) <= 0.03 * len(host_set)

    def test_detect_peaks_tpu_refinement(self):
        img = self.make_spots()
        img[21, 21] = img.max() * 1.5
        coords, valid = detect_peaks_tpu(img, min_distance=5, threshold_rel=0.1, max_peaks=16)
        got = {tuple(c) for c in np.asarray(coords)[np.asarray(valid)].tolist()}
        assert (21, 21) in got


class TestAdaptiveLattice:
    def test_finds_vacancies_on_synthetic_mos2(self):
        frame, truth = synthetic_mos2_frame(
            size=512, spacing=20.0, vacancy_rate=0.15, seed=2
        )
        img = np.asarray(normalize_image(bandpass_filter(frame, 5, 64)))
        sites, labels, spacing = build_adaptive_lattice(img, patch_size=64, padding=16)
        assert len(sites) == len(labels)
        assert len(sites) > 50
        n_atoms = int((labels == 1).sum())
        n_empty = int((labels == 0).sum())
        assert n_atoms > 0 and n_empty > 0
        # every site respects the edge margin
        half = 64 // 2 + 16
        assert sites[:, 0].min() >= half - spacing * 0.35 - 1
        assert sites[:, 1].max() <= 512 - half + spacing * 0.35 + 1

    def test_empty_image(self):
        img = np.zeros((128, 128))
        img[64, 64] = 1.0
        sites, labels, _ = build_adaptive_lattice(img, patch_size=32, padding=4)
        assert sites.shape[1] == 2 if len(sites) else True

    def test_device_peaks_build_matches_host(self):
        """VERDICT item 6: device_peaks=True produces the same site table
        (within one dedup radius) as the host detection path."""
        frame, _ = synthetic_mos2_frame(size=512, spacing=20.0, seed=5)
        img = np.asarray(normalize_image(bandpass_filter(frame, 5, 64)))
        host_sites, host_labels, spacing = build_adaptive_lattice(
            img, patch_size=64, padding=16, device_peaks=False
        )
        dev_sites, dev_labels, _ = build_adaptive_lattice(
            img, patch_size=64, padding=16, device_peaks=True
        )
        assert abs(len(dev_sites) - len(host_sites)) <= 0.02 * len(host_sites)
        # every host site has a device site within the dedup radius
        from scipy.spatial import cKDTree

        d, idx = cKDTree(dev_sites).query(host_sites)
        matched = d < spacing * 0.35
        assert matched.mean() > 0.98
        # labels agree on matched sites
        agree = host_labels[matched] == dev_labels[idx[matched]]
        assert agree.mean() > 0.98


class TestGenerateLatticeGrid:
    """Covers BOTH reference surfaces (SURVEY.md §4 stale-test note)."""

    def test_spacing_based_hex_grid(self):
        grid = generate_lattice_grid((100, 100), 10.0)
        assert grid.shape[1] == 2
        assert np.all(grid[:, 0] < 100) and np.all(grid[:, 1] < 100)
        # consecutive rows offset by dx = spacing*sqrt(3)/2
        rows = np.unique(grid[:, 0])
        assert np.allclose(np.diff(rows), 10.0)

    def test_atom_anchored_fills_missing(self):
        coords = np.array(
            [[10, 10], [10, 20], [10, 30], [20, 10], [20, 20], [20, 30], [30, 10], [30, 20], [30, 30]]
        )
        grid = generate_lattice_grid(coords, (50, 50))
        assert grid.shape[0] >= coords.shape[0]
        assert grid.shape[1] == 2
        assert np.all((grid >= 0) & (grid < 50))

    def test_atom_anchored_single_atom(self):
        coords = np.array([[10, 10]])
        grid = generate_lattice_grid(coords, (100, 100))
        assert np.array_equal(grid, coords)

    def test_atom_anchored_two_atoms(self):
        grid = generate_lattice_grid(np.array([[10, 10], [20, 20]]), (100, 100))
        assert grid.shape[0] > 0 and grid.shape[1] == 2

    def test_edge_filtering_with_patch_size(self):
        coords = np.array([[8, 8], [8, 40], [40, 8], [40, 40], [24, 24]], dtype=float)
        img_shape = (48, 48)
        grid_all = extrapolate_lattice_grid(coords, img_shape)
        grid_filt = extrapolate_lattice_grid(coords, img_shape, patch_size=32, padding=4)
        assert len(grid_filt) <= len(grid_all)
        half = 32 // 2 + 4
        if len(grid_filt):
            assert np.all(grid_filt[:, 0] >= half)
            assert np.all(grid_filt[:, 0] <= img_shape[0] - half)


class TestSyntheticFrame:
    def test_frame_properties(self):
        frame, truth = synthetic_mos2_frame(size=256, spacing=16.0, seed=0)
        assert frame.shape == (256, 256)
        assert len(truth["mo_sites"]) > 100
        assert truth["spacing"] == 16.0

    def test_detection_recovers_mo_sites(self):
        frame, truth = synthetic_mos2_frame(size=512, spacing=20.0, seed=4, vacancy_rate=0.0)
        img = np.asarray(normalize_image(bandpass_filter(frame, 5, 64)))
        peaks = get_clean_peaks(img, min_distance=int(20 * 0.15), threshold_rel=0.3)
        # every interior Mo site should have a detection within 0.35*spacing
        from scipy.spatial import cKDTree

        mo = truth["mo_sites"]
        interior = mo[
            (mo[:, 0] > 40) & (mo[:, 0] < 472) & (mo[:, 1] > 40) & (mo[:, 1] < 472)
        ]
        tree = cKDTree(peaks)
        d, _ = tree.query(interior)
        assert (d < 0.35 * 20).mean() > 0.95
