"""Lattice-constant estimation and adaptive lattice extrapolation.

Capability parity with the reference's lattice analysis:

* `estimate_lattice_constant` (reference: src/livae/utils.py:23-108):
  Gaussian pre-whitening -> FFT magnitude -> radial profile -> prominent
  peak in the [img/max_atom, img/min_atom] band -> spacing; fallback 15.0.
  Here the heavy 2D work (blur, FFT, radial binning) is jitted on device;
  only the tiny 1-D find_peaks runs on host.

* `build_adaptive_lattice` (reference: src/livae/data.py:338-473): detect
  atoms, estimate two local lattice vectors per atom from its k=7 nearest
  neighbors (most linearly independent pair by normalized cross product),
  extrapolate the 8 surrounding sites, dedupe predicted sites by
  union-find clustering at 0.35*spacing, and label each unique site
  atom (1, within 0.6*spacing of a detected atom) or vacancy (0). The
  reference's per-atom Python loops and KDTree queries are vectorized
  numpy here (runs once per frame at dataset build); site clustering and
  labeling run in the native C++ component (native/lattice_native.cpp:
  grid-hash + union-find, same equivalence classes as the reference's
  union-find at data.py:418-445) with a scipy fallback.

* `generate_lattice_grid`: both reference surfaces — the implemented
  spacing-based hexagonal grid (src/livae/data.py:28-75) and the
  atom-anchored extrapolating variant specified by the reference's test
  suite (tests/test_data.py; signature (coords, img_shape, patch_size=,
  padding=) — SURVEY.md §4 flags that the reference implementation and
  tests diverged; we satisfy both).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import find_peaks
from scipy.spatial import cKDTree

from .peaks import get_clean_peaks

__all__ = [
    "estimate_lattice_constant",
    "radial_profile_tpu",
    "build_adaptive_lattice",
    "generate_lattice_grid",
    "extrapolate_lattice_grid",
]


@functools.partial(jax.jit, static_argnames=("sigma_frac",))
def _whitened_radial_profile(img: jax.Array, sigma_frac: float = 0.005) -> jax.Array:
    """Device half of estimate_lattice_constant: blur-subtract, FFT, radial bin.

    The Gaussian background blur runs in the Fourier domain (one FFT round
    trip instead of a wide spatial conv — sigma is ~10 px on 2048^2 frames),
    then the magnitude spectrum is radially binned with segment_sum.
    """
    img = img.astype(jnp.float32)
    n = img.shape[0]
    sigma = n * sigma_frac

    # Gaussian blur via FFT: multiply spectrum by Gaussian transfer function.
    fy = jnp.fft.fftfreq(img.shape[0]).astype(jnp.float32)
    fx = jnp.fft.fftfreq(img.shape[1]).astype(jnp.float32)
    transfer = jnp.exp(
        -2.0 * (jnp.pi * sigma) ** 2 * (fy[:, None] ** 2 + fx[None, :] ** 2)
    )
    f_img = jnp.fft.fft2(img)
    background = jnp.real(jnp.fft.ifft2(f_img * transfer))
    whitened = img - background

    magnitude = jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(whitened)))

    cy, cx = img.shape[0] // 2, img.shape[1] // 2
    y = jnp.arange(img.shape[0], dtype=jnp.float32)[:, None] - cy
    x = jnp.arange(img.shape[1], dtype=jnp.float32)[None, :] - cx
    radius = jnp.sqrt(x * x + y * y).astype(jnp.int32)

    num_bins = n
    flat_r = radius.reshape(-1)
    flat_m = magnitude.reshape(-1)
    radial_sum = jax.ops.segment_sum(flat_m, flat_r, num_segments=num_bins)
    radial_count = jax.ops.segment_sum(
        jnp.ones_like(flat_m), flat_r, num_segments=num_bins
    )
    return radial_sum / jnp.maximum(radial_count, 1.0)


def radial_profile_tpu(img) -> np.ndarray:
    """Radially averaged whitened FFT magnitude (host-visible)."""
    return np.asarray(_whitened_radial_profile(jnp.asarray(img)))


def estimate_lattice_constant(
    image,
    min_atom_size: float = 10.0,
    max_atom_size: float = 60.0,
    prominence_factor: float = 0.1,
) -> float:
    """Estimate lattice spacing in pixels via the FFT radial profile.

    Reference: src/livae/utils.py:23-108. The search band is
    [img/max_atom_size, img/min_atom_size]; the first prominent peak's
    radius gives spacing = img_size / radius; fallback 15.0 when no peak.

    Note on parity: the reference blurs with scipy's truncated spatial
    Gaussian; we blur in the Fourier domain (untruncated Gaussian). The
    radial-profile peak location is identical on lattice images (validated
    in tests/test_lattice.py against the reference algorithm).
    """
    image = np.asarray(image)
    img_size = image.shape[0]

    radial_profile = radial_profile_tpu(image)

    search_r_min = max(2, int(img_size / max_atom_size))
    search_r_max = min(len(radial_profile) - 1, int(img_size / min_atom_size))

    profile_slice = radial_profile[search_r_min : search_r_max + 1]
    max_val = np.max(profile_slice)

    peaks, _ = find_peaks(profile_slice, prominence=max_val * prominence_factor)
    if len(peaks) == 0:
        return 15.0
    return float(img_size / (peaks[0] + search_r_min))


def _best_lattice_vectors(atoms: np.ndarray, k: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Per-atom pair of most linearly independent neighbor vectors.

    Vectorized equivalent of the reference's per-atom loops
    (src/livae/data.py:360-386): for each atom take its k-1 nearest
    neighbors, score all vector pairs by |cross(v1, v2)| / (|v1||v2|),
    and keep the best pair.

    Returns (v1, v2): each [N, 2]; rows are NaN where no valid pair exists.
    """
    n = len(atoms)
    k = min(k, n)
    tree = cKDTree(atoms)
    _, idx = tree.query(atoms, k=k)
    if k < 3:
        nanv = np.full((n, 2), np.nan)
        return nanv, nanv

    vectors = atoms[idx[:, 1:]] - atoms[:, None, :]  # [N, k-1, 2]
    m = vectors.shape[1]
    ii, jj = np.triu_indices(m, k=1)
    v1 = vectors[:, ii, :]  # [N, P, 2]
    v2 = vectors[:, jj, :]
    n1 = np.linalg.norm(v1, axis=-1)
    n2 = np.linalg.norm(v2, axis=-1)
    cross = np.abs(v1[..., 0] * v2[..., 1] - v1[..., 1] * v2[..., 0])
    denom = n1 * n2
    indep = np.where((n1 < 1e-6) | (n2 < 1e-6), -1.0, cross / np.maximum(denom, 1e-12))
    best = np.argmax(indep, axis=1)
    rows = np.arange(n)
    bv1 = v1[rows, best]
    bv2 = v2[rows, best]
    invalid = indep[rows, best] < 0
    bv1[invalid] = np.nan
    bv2[invalid] = np.nan
    return bv1, bv2


def detect_atoms_device(
    img: np.ndarray, min_distance: int, threshold_rel: float = 0.01
) -> np.ndarray:
    """On-device atom detection (jitted NMS + 5x5 refinement) -> host coords.

    The device analog of get_clean_peaks for the dataset build: detection
    runs on the accelerator next to filtering. The static top-k table is
    grown on saturation so no peak is silently dropped.
    """
    from .peaks import detect_peaks_tpu

    img_dev = jnp.asarray(img, dtype=jnp.float32)
    # Chebyshev window bound: peaks are >= min_distance apart
    hard_cap = int(
        (img.shape[0] // max(min_distance, 1) + 1)
        * (img.shape[1] // max(min_distance, 1) + 1)
    )
    max_peaks = min(16384, hard_cap)
    while True:
        coords, valid = detect_peaks_tpu(
            img_dev, min_distance=min_distance, threshold_rel=threshold_rel,
            max_peaks=max_peaks,
        )
        valid = np.asarray(valid)
        if not valid.all() or max_peaks >= hard_cap:
            break
        max_peaks = min(hard_cap, max_peaks * 4)
    return np.asarray(coords)[valid].astype(np.float64)


def build_adaptive_lattice(
    img: np.ndarray,
    patch_size: int,
    padding: int = 48,
    detection_threshold: float = 0.6,
    lattice_spacing: float | None = None,
    atom_coords: np.ndarray | None = None,
    device_peaks: bool = False,
) -> tuple[np.ndarray, np.ndarray, float]:
    """Full adaptive-lattice site table for one preprocessed frame.

    Reference: src/livae/data.py:338-473. Returns (sites [N, 2] float64
    (y, x), labels [N] int64 {1 atom, 0 vacancy}, lattice_spacing).
    device_peaks=True runs atom detection on the accelerator
    (detect_peaks_tpu: reduce_window NMS + top-k + jitted refinement)
    instead of the host maximum-filter path; the site tables agree
    (tests/test_lattice.py) because window NMS implies the same Euclidean
    min-distance spacing on well-separated lattice peaks.
    """
    img = np.asarray(img)
    if lattice_spacing is None:
        lattice_spacing = estimate_lattice_constant(img)

    if atom_coords is None:
        if device_peaks:
            atom_coords = detect_atoms_device(
                img, min_distance=int(lattice_spacing * 0.15)
            )
        else:
            atom_coords = get_clean_peaks(
                img, min_distance=int(lattice_spacing * 0.15)
            )

    half_patch = patch_size // 2 + padding
    if len(atom_coords) == 0:
        return np.zeros((0, 2)), np.zeros((0,), dtype=np.int64), lattice_spacing

    edge_mask = (
        (atom_coords[:, 0] >= half_patch)
        & (atom_coords[:, 0] <= img.shape[0] - half_patch)
        & (atom_coords[:, 1] >= half_patch)
        & (atom_coords[:, 1] <= img.shape[1] - half_patch)
    )
    atoms = atom_coords[edge_mask].astype(np.float64)
    if len(atoms) == 0:
        return np.zeros((0, 2)), np.zeros((0,), dtype=np.int64), lattice_spacing

    tree = cKDTree(atoms)
    threshold_dist = lattice_spacing * detection_threshold

    v1, v2 = _best_lattice_vectors(atoms)
    valid = ~np.isnan(v1[:, 0])
    a, b1, b2 = atoms[valid], v1[valid], v2[valid]
    # 8 surrounding sites: ±v1, ±v2, ±(v1+v2), ±(v1-v2)
    offsets = np.stack(
        [b1, -b1, b2, -b2, b1 + b2, -(b1 + b2), b1 - b2, b2 - b1], axis=1
    )  # [M, 8, 2]
    predicted = (a[:, None, :] + offsets).reshape(-1, 2)
    in_bounds = (
        (predicted[:, 0] >= half_patch)
        & (predicted[:, 0] <= img.shape[0] - half_patch)
        & (predicted[:, 1] >= half_patch)
        & (predicted[:, 1] <= img.shape[1] - half_patch)
    )
    predicted_sites = np.concatenate([atoms, predicted[in_bounds]], axis=0)

    # Dedupe: cluster sites within 0.35*spacing and keep centroids — the
    # native grid-hash union-find (native/lattice_native.cpp) when built,
    # else the scipy connected-components fallback; identical equivalence
    # classes to the reference's union-find (data.py:418-445).
    from .native import cluster_points, label_sites

    _, unique_sites = cluster_points(predicted_sites, lattice_spacing * 0.35)
    labels = label_sites(unique_sites, atoms, threshold_dist)
    return unique_sites, labels, lattice_spacing


def _hex_grid_from_spacing(
    image_shape: tuple[int, int],
    lattice_spacing: float,
    offset: tuple[float, float] = (0, 0),
) -> np.ndarray:
    """Hexagonal grid of (y, x) points (reference: src/livae/data.py:28-75)."""
    h, w = image_shape
    y_off, x_off = offset
    dy = lattice_spacing
    dx = lattice_spacing * np.sqrt(3) / 2

    points = []
    row_idx = 0
    y = y_off
    while y < h:
        x = x_off if row_idx % 2 == 0 else x_off + dx
        while x < w:
            points.append([y, x])
            x += 2 * dx
        y += dy
        row_idx += 1
    return np.array(points)


def extrapolate_lattice_grid(
    coords: np.ndarray,
    img_shape: tuple[int, int],
    patch_size: int | None = None,
    padding: int = 0,
) -> np.ndarray:
    """Atom-anchored lattice grid: fill in missing sites from detected atoms.

    The second `generate_lattice_grid` surface, specified by the reference's
    test suite (reference tests/test_data.py:11-177): extrapolates lattice
    sites from detected atom coordinates, keeps everything inside the image,
    and optionally filters sites too close to the edge for a patch+padding
    crop. Single atom passes through unchanged.
    """
    coords = np.asarray(coords, dtype=np.float64)
    h, w = img_shape
    if len(coords) < 2:
        grid = coords
    else:
        v1, v2 = _best_lattice_vectors(coords)
        valid = ~np.isnan(v1[:, 0])
        sites = [coords]
        if valid.any():
            a, b1, b2 = coords[valid], v1[valid], v2[valid]
            offsets = np.stack(
                [b1, -b1, b2, -b2, b1 + b2, -(b1 + b2), b1 - b2, b2 - b1], axis=1
            )
            sites.append((a[:, None, :] + offsets).reshape(-1, 2))
        elif len(coords) >= 2:
            # Collinear/degenerate: extrapolate along the single direction
            v = coords[1] - coords[0]
            sites.append(coords + v)
            sites.append(coords - v)
        all_sites = np.concatenate(sites, axis=0)

        # dedupe at a fraction of the median nearest-neighbor distance
        from .native import cluster_points

        tree = cKDTree(coords)
        d, _ = tree.query(coords, k=min(2, len(coords)))
        spacing = float(np.median(d[:, -1])) if len(coords) > 1 else 1.0
        _, grid = cluster_points(all_sites, max(spacing * 0.35, 1e-6))

    in_img = (
        (grid[:, 0] >= 0) & (grid[:, 0] < h) & (grid[:, 1] >= 0) & (grid[:, 1] < w)
    )
    grid = grid[in_img]
    if patch_size is not None:
        half = patch_size // 2 + padding
        keep = (
            (grid[:, 0] >= half)
            & (grid[:, 0] <= h - half)
            & (grid[:, 1] >= half)
            & (grid[:, 1] <= w - half)
        )
        grid = grid[keep]
    return grid


def generate_lattice_grid(*args, **kwargs) -> np.ndarray:
    """Dual-surface lattice grid generator.

    * `generate_lattice_grid(image_shape, lattice_spacing, offset=(0, 0))`
      — spacing-based hexagonal grid (the reference implementation's
      signature, src/livae/data.py:28-75).
    * `generate_lattice_grid(coords, img_shape, patch_size=None, padding=0)`
      — atom-anchored extrapolation (the reference test suite's signature,
      reference tests/test_data.py).
    """
    first = np.asarray(args[0]) if args else None
    if first is not None and first.ndim == 2 and first.shape[1] == 2:
        return extrapolate_lattice_grid(*args, **kwargs)
    return _hex_grid_from_spacing(*args, **kwargs)
