"""Native C++ component tests: equivalence with the scipy fallback path."""

import numpy as np
import pytest

from livae_tpu.ops import native


@pytest.fixture(scope="module")
def have_native():
    if not native.native_available():
        pytest.skip("native library not built and no toolchain")
    return True


def _scipy_cluster(points, radius):
    """The fallback path, forced."""
    lib, tried = native._lib, native._tried
    native._lib, native._tried = None, True
    try:
        return native.cluster_points(points, radius)
    finally:
        native._lib, native._tried = lib, tried


class TestClusterPoints:
    def test_matches_scipy_on_random_points(self, have_native, rng):
        pts = rng.random((2000, 2)) * 300
        labels_n, cents_n = native.cluster_points(pts, 2.5)
        labels_s, cents_s = _scipy_cluster(pts, 2.5)
        # same partition (labels are both first-occurrence ordered)
        np.testing.assert_array_equal(labels_n, labels_s)
        np.testing.assert_allclose(cents_n, cents_s, atol=1e-9)

    def test_transitive_chains(self, have_native):
        # chain 0-1-2 within radius pairwise-adjacent, 3 isolated
        pts = np.array([[0, 0], [0, 0.9], [0, 1.8], [10, 10]], dtype=float)
        labels, cents = native.cluster_points(pts, 1.0)
        assert labels[0] == labels[1] == labels[2]
        assert labels[3] != labels[0]
        np.testing.assert_allclose(cents[labels[0]], [0, 0.9])

    def test_empty(self):
        labels, cents = native.cluster_points(np.zeros((0, 2)), 1.0)
        assert len(labels) == 0 and len(cents) == 0

    def test_negative_coordinates(self, have_native, rng):
        pts = rng.random((500, 2)) * 100 - 50  # crosses cell-0 boundaries
        labels_n, cents_n = native.cluster_points(pts, 3.0)
        labels_s, cents_s = _scipy_cluster(pts, 3.0)
        np.testing.assert_array_equal(labels_n, labels_s)


class TestLabelSites:
    def test_matches_brute_force(self, have_native, rng):
        sites = rng.random((800, 2)) * 200
        atoms = rng.random((300, 2)) * 200
        out = native.label_sites(sites, atoms, 5.0)
        from scipy.spatial import cKDTree

        d, _ = cKDTree(atoms).query(sites)
        np.testing.assert_array_equal(out, (d < 5.0).astype(np.int64))

    def test_no_atoms(self):
        out = native.label_sites(np.zeros((5, 2)), np.zeros((0, 2)), 1.0)
        np.testing.assert_array_equal(out, np.zeros(5, np.int64))
