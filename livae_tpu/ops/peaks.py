"""Atom peak detection: host reference implementation + jitted TPU NMS.

The reference detects atom peaks with skimage's `peak_local_max` (Cython
maximum filter) and snaps each peak to the argmax of its 5x5 neighborhood
(reference: src/livae/data.py:119-148, usage at data.py:190-191 and
src/livae/metrics.py:248-250).

Two implementations here:

* `peak_local_max` / `get_clean_peaks`: host numpy/scipy versions with
  skimage-compatible behavior (maximum-filter candidates, relative
  threshold, border exclusion, intensity-sorted min-distance enforcement).
  Used at dataset-build time (runs once per frame).
* `peak_local_max_tpu` / `refine_peaks_tpu`: jitted XLA version — max-pool
  NMS via `lax.reduce_window` equality + threshold + top-k gather into a
  fixed-size padded site table (MAX_SITES + validity mask), so detection can
  run on device next to filtering and patch extraction. This is the
  "jitted XLA NMS" BASELINE.json names explicitly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

__all__ = [
    "peak_local_max",
    "get_clean_peaks",
    "peak_local_max_tpu",
    "refine_peaks_tpu",
    "detect_peaks_tpu",
]


# ---------------------------------------------------------------------------
# Host implementations (dataset build; skimage-compatible semantics)
# ---------------------------------------------------------------------------

def peak_local_max(
    img: np.ndarray,
    min_distance: int = 1,
    threshold_rel: float | None = None,
    threshold_abs: float | None = None,
    exclude_border: bool | int = True,
) -> np.ndarray:
    """skimage.feature.peak_local_max-compatible peak finder (numpy/scipy).

    Returns (N, 2) array of (row, col) coordinates sorted by descending
    intensity, with peaks at least `min_distance` apart (Euclidean) and
    border exclusion matching skimage's default (exclude_border=True uses
    min_distance).
    """
    img = np.asarray(img)
    size = 2 * min_distance + 1
    max_filt = ndimage.maximum_filter(img, size=size, mode="constant", cval=-np.inf)
    mask = img == max_filt

    thresholds = []
    if threshold_abs is not None:
        thresholds.append(threshold_abs)
    if threshold_rel is not None:
        thresholds.append(threshold_rel * float(img.max()))
    if thresholds:
        mask &= img > max(thresholds)

    border = min_distance if exclude_border is True else int(exclude_border)
    if border:
        inner = np.zeros_like(mask)
        inner[border:-border or None, border:-border or None] = True
        mask &= inner

    coords = np.column_stack(np.nonzero(mask))
    if len(coords) == 0:
        return coords.reshape(0, 2)

    # Sort by intensity (descending) and greedily enforce Euclidean spacing,
    # mirroring skimage's ensure_spacing.
    order = np.argsort(img[coords[:, 0], coords[:, 1]])[::-1]
    coords = coords[order]
    if min_distance > 1:
        # Greedy suppression sweep in intensity order (== skimage's
        # ensure_spacing): a candidate is rejected iff an earlier accepted
        # peak lies within min_distance.
        from scipy.spatial import cKDTree

        tree = cKDTree(coords)
        neighborhoods = tree.query_ball_point(coords, r=min_distance - 1e-9)
        suppressed = np.zeros(len(coords), dtype=bool)
        keep = np.zeros(len(coords), dtype=bool)
        for i in range(len(coords)):
            if suppressed[i]:
                continue
            keep[i] = True
            suppressed[neighborhoods[i]] = True
        coords = coords[keep]
    return coords


def get_clean_peaks(
    img: np.ndarray, min_distance: int = 5, threshold_rel: float = 0.01
) -> np.ndarray:
    """Detect peaks and snap each to the argmax of its 5x5 neighborhood.

    Reference: src/livae/data.py:119-148.
    """
    img = np.asarray(img)
    coords = peak_local_max(img, min_distance=min_distance, threshold_rel=threshold_rel)
    if len(coords) == 0:
        return coords

    h, w = img.shape
    refined = []
    for r, c in coords:
        r_i, c_i = int(r), int(c)
        r1, r2 = max(0, r_i - 2), min(h, r_i + 3)
        c1, c2 = max(0, c_i - 2), min(w, c_i + 3)
        local = img[r1:r2, c1:c2]
        li = np.unravel_index(np.argmax(local), local.shape)
        refined.append([r1 + li[0], c1 + li[1]])
    return np.array(refined)


# ---------------------------------------------------------------------------
# Jitted TPU implementations
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("min_distance", "max_peaks", "threshold_rel", "exclude_border"))
def peak_local_max_tpu(
    img: jax.Array,
    min_distance: int = 5,
    threshold_rel: float = 0.01,
    max_peaks: int = 4096,
    exclude_border: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Jitted peak detection: max-pool NMS + threshold + top-k.

    The max-pool equality test keeps any pixel that is the maximum of its
    (2*min_distance+1)^2 window — the same candidate set skimage starts
    from. Intensity top-k then bounds the result to a static MAX_PEAKS
    table (variable-length site lists can't live under jit; SURVEY.md §7
    "hard parts").

    Returns:
        coords: [max_peaks, 2] int32 (row, col), padded with 0s.
        valid: [max_peaks] bool mask of real peaks.
    """
    H, W = img.shape
    size = 2 * min_distance + 1
    pooled = jax.lax.reduce_window(
        img,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(size, size),
        window_strides=(1, 1),
        padding=[(min_distance, min_distance)] * 2,
    )
    is_peak = (img == pooled) & (img > threshold_rel * jnp.max(img))

    if exclude_border and min_distance > 0:
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        inner = (
            (rows >= min_distance)
            & (rows < H - min_distance)
            & (cols >= min_distance)
            & (cols < W - min_distance)
        )
        is_peak = is_peak & inner

    score = jnp.where(is_peak, img, -jnp.inf).reshape(-1)
    top_vals, top_idx = jax.lax.top_k(score, max_peaks)
    valid = jnp.isfinite(top_vals)
    coords = jnp.stack([top_idx // W, top_idx % W], axis=-1).astype(jnp.int32)
    coords = jnp.where(valid[:, None], coords, 0)
    return coords, valid


@jax.jit
def refine_peaks_tpu(img: jax.Array, coords: jax.Array, valid: jax.Array) -> jax.Array:
    """Snap each peak to the argmax of its 5x5 neighborhood (jitted).

    Equivalent of the reference's refinement loop (src/livae/data.py:135-147)
    as a batched dynamic-slice gather. Border behavior matches the
    reference's window clipping: the window is shifted to stay in-bounds.
    """
    H, W = img.shape

    def one(c):
        r = jnp.clip(c[0] - 2, 0, H - 5)
        cc = jnp.clip(c[1] - 2, 0, W - 5)
        win = jax.lax.dynamic_slice(img, (r, cc), (5, 5))
        flat = jnp.argmax(win)
        return jnp.stack([r + flat // 5, cc + flat % 5]).astype(jnp.int32)

    refined = jax.vmap(one)(coords)
    return jnp.where(valid[:, None], refined, 0)


def detect_peaks_tpu(
    img: jax.Array,
    min_distance: int = 5,
    threshold_rel: float = 0.01,
    max_peaks: int = 4096,
) -> tuple[jax.Array, jax.Array]:
    """Full on-device detection: NMS + 5x5 refinement + dedup of refined ties.

    Combines peak_local_max_tpu and refine_peaks_tpu (the device analog of
    reference get_clean_peaks, src/livae/data.py:119-148).
    """
    coords, valid = peak_local_max_tpu(
        img, min_distance=min_distance, threshold_rel=threshold_rel, max_peaks=max_peaks
    )
    refined = refine_peaks_tpu(img, coords, valid)
    return refined, valid
