"""Jitted on-device patch extraction + augmentation pipeline.

This replaces the reference's DataLoader-worker model (reference:
scripts/train_rvae.py:77-95 — 8 worker processes doing per-patch
torchvision affine/rotate/crop on host) with a fully device-resident
design: whole preprocessed frames live in HBM, and a single jitted
function slices, sub-pixel-recenters, augments, and normalizes an entire
batch of patches per train step. No host<->device traffic per batch.

Gather-free by construction (XLA elementwise gather is ~30x slower than
vector ops on TPU, see ops/resample.py):

* ROI crop: batched `lax.dynamic_slice` from zero-padded frames.
* scale + sub-pixel translate: separable per-axis affine resample using
  row-gathers (fast path) — exactly bilinear for pure translation, so the
  validation/encode path (transform=None) matches the reference's
  TF.affine bilinear recentering (reference: src/livae/data.py:524-542).
* rotation: the 3-shear `rotate_image_fast`.
* flips / integer jitter: static flips + log-roll shifts.

Augmentation distributions mirror the reference's `default_transform`
(reference: src/livae/data.py:78-116): scale U(0.9, 1.1), rotation
U(0, 360) deg, h/v flips p=0.5, integer roll jitter U{-4..4}.

Paired-rotation semantics: `rotated = rotate(patch, +angle)` in the STN
grid convention, which yields theta_rotated = theta_original - angle —
the relation the reference's cycle-consistency loss assumes
(reference: src/livae/loss.py:52-94, data.py:697-707).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.resample import _logroll_gather, rotate_image_fast

__all__ = ["AugmentConfig", "extract_batch", "extract_batch_paired", "pad_frames"]


@dataclass(frozen=True)
class AugmentConfig:
    """Static augmentation configuration (hashable for jit)."""

    scale_min: float = 0.9
    scale_max: float = 1.1
    flip_prob: float = 0.5
    jitter: int = 4
    rotation: bool = False

    def __call__(self, *a, **k):  # pragma: no cover
        raise TypeError(
            "AugmentConfig is a jit-static config consumed by extract_batch, "
            "not a host-side callable; pass it as the dataset's transform."
        )


def pad_frames(frames: jax.Array, margin: int) -> jax.Array:
    """Zero-pad [N, H, W] frames so ROI slices never clamp at borders.

    Matches the reference's zero-padding of edge ROIs
    (src/livae/data.py:506-522).
    """
    return jnp.pad(frames, ((0, 0), (margin, margin), (margin, margin)))


def _bilinear_axis_weights(
    src: jax.Array, n: int
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Shared index/weight math for the 1-D bilinear resample backends.

    Returns (i0c, i1c, w0, w1): clipped int32 source indices and the
    zero-outside-bounds lerp weights, all shaped like `src` ([B, n_out]).
    """
    i0 = jnp.floor(src)
    f = src - i0
    i0 = i0.astype(jnp.int32)
    i1 = i0 + 1
    valid0 = (i0 >= 0) & (i0 <= n - 1)
    valid1 = (i1 >= 0) & (i1 <= n - 1)
    i0c = jnp.clip(i0, 0, n - 1)
    i1c = jnp.clip(i1, 0, n - 1)
    w0 = jnp.where(valid0, 1.0 - f, 0.0)
    w1 = jnp.where(valid1, f, 0.0)
    return i0c, i1c, w0, w1


def _axis_resample_gather(x: jax.Array, src: jax.Array, axis: int) -> jax.Array:
    """Gather backend: take_along_axis with a size-1 trailing broadcast."""
    n = x.shape[axis]
    i0c, i1c, w0, w1 = _bilinear_axis_weights(src, n)
    if axis == 1:
        g0 = jnp.take_along_axis(x, i0c[:, :, None], axis=1)
        g1 = jnp.take_along_axis(x, i1c[:, :, None], axis=1)
        w0, w1 = w0[:, :, None], w1[:, :, None]
    elif axis == 2:
        g0 = jnp.take_along_axis(x, i0c[:, None, :], axis=2)
        g1 = jnp.take_along_axis(x, i1c[:, None, :], axis=2)
        w0, w1 = w0[:, None, :], w1[:, None, :]
    else:  # pragma: no cover
        raise ValueError(axis)
    return g0 * w0 + g1 * w1


def _axis_resample_matmul(x: jax.Array, src: jax.Array, axis: int) -> jax.Array:
    """Matmul backend: contract against a 2-nonzeros-per-row bilinear matrix.

    W[b, o, i] = w0[b, o]·[i == i0[b, o]] + w1[b, o]·[i == i1[b, o]], then
    out = W @ x (axis 1) or x @ W^T (axis 2) as an f32 batched dot_general
    at Precision.HIGHEST (on TPU, DEFAULT would demote f32 contractions to
    one bf16 MXU pass — a ~1e-3 relative data perturbation; HIGHEST keeps
    f32-grade accuracy and the pass multiple is irrelevant at these MXU
    costs). Same two products per output as the gather backend; only the
    contraction's add order/FMA usage differs, so the backends agree to
    1 ulp (tests/test_data.py::test_axis_resample_backends_agree).

    Why a matmul for a 2-sparse operator: XLA lowers per-(b, o) variable
    indices to an elementwise gather, ~30x slower than vector ops on TPU
    (see ops/resample.py); the dense contraction rides the MXU where these
    shapes ([B, ~200, ~200]) cost well under a microsecond per patch.
    """
    n = x.shape[axis]
    i0c, i1c, w0, w1 = _bilinear_axis_weights(src, n)
    iota = jnp.arange(n, dtype=jnp.int32)
    W = w0[..., None] * (i0c[..., None] == iota) + w1[..., None] * (
        i1c[..., None] == iota
    )  # [B, n_out, n] f32
    # dot_general rejects mixed operand dtypes; promote BOTH operands the
    # same way the gather backend's w*x products would (bf16*f32 -> f32,
    # f64*f32 -> f64 under x64), so the backends stay dtype-interchangeable.
    if x.dtype != W.dtype:
        dt = jnp.promote_types(x.dtype, W.dtype)
        x = x.astype(dt)
        W = W.astype(dt)
    if axis == 1:
        # [B, n_out, n] . [B, n, W] -> [B, n_out, W]
        return jax.lax.dot_general(
            W,
            x,
            (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=x.dtype,
        )
    elif axis == 2:
        # [B, H, n] . [B, n_out, n] -> [B, H, n_out]
        return jax.lax.dot_general(
            x,
            W,
            (((2,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=x.dtype,
        )
    else:  # pragma: no cover
        raise ValueError(axis)


def _axis_resample(x: jax.Array, src: jax.Array, axis: int) -> jax.Array:
    """1-D bilinear resample along `axis` at per-sample source coords.

    x: [B, H, W]; src: [B, n_out] float source indices along `axis`
    (identical for all positions of the other axis — separable affine).
    On TPU the one-hot-matmul formulation wins (MXU time is negligible at
    these shapes and it avoids XLA's slow elementwise gather); elsewhere
    the row-gather formulation wins.
    """
    if jax.default_backend() == "tpu":
        return _axis_resample_matmul(x, src, axis)
    return _axis_resample_gather(x, src, axis)


def _crop_starts(
    cy: jax.Array,
    cx: jax.Array,
    roi: int,
    margin: int,
    padded_shape: tuple[int, int] | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Integer crop origins (in padded-frame coords) + sub-pixel residuals.

    When `padded_shape` (Hp, Wp) is given, origins are clamped to the
    valid slice range [0, dim - roi] — exactly what `dynamic_slice` does
    internally — so the row-gather backend cannot read across a frame
    boundary even for contract-violating coordinates (the pad margin
    normally guarantees in-bounds crops). The sub-pixel residuals stay
    derived from the UNclamped origin, matching dynamic_slice semantics.
    """
    y_int = jnp.round(cy).astype(jnp.int32)
    x_int = jnp.round(cx).astype(jnp.int32)
    y0 = y_int - roi // 2 + margin
    x0 = x_int - roi // 2 + margin
    if padded_shape is not None:
        y0 = jnp.clip(y0, 0, padded_shape[0] - roi)
        x0 = jnp.clip(x0, 0, padded_shape[1] - roi)
    ry = cy - (y_int - roi // 2).astype(cy.dtype)
    rx = cx - (x_int - roi // 2).astype(cx.dtype)
    return y0, x0, ry, rx


def _crop_rois_slice(
    frames_padded: jax.Array,
    img_idx: jax.Array,
    y0: jax.Array,
    x0: jax.Array,
    roi: int,
) -> jax.Array:
    """dynamic_slice backend: one slice per sample (good on CPU)."""

    def one(i, y, x):
        return jax.lax.dynamic_slice(
            frames_padded, (i, y, x), (1, roi, roi)
        )[0]

    return jax.vmap(one)(img_idx, y0, x0)


# Column-tile width of the crop's row gather. 256 = two 128-lane TPU
# registers; the production padded frames are exact multiples (2048 + 2*128
# margin = 9 tiles) so the tiling reshape is free.
_CROP_TILE = 256


def _crop_sel_matmul(strip: jax.Array, cols: jax.Array) -> jax.Array:
    """Contract `strip` [B, roi, W] with the 0/1 selector [j == cols].

    Precision.HIGHEST keeps the f32 contraction exact, so the result is
    bit-identical to the sliced crop
    (tests/test_data.py::test_crop_backends_agree). HIGH (nominally bf16x3,
    whose three exact-product passes would also reconstruct f32 exactly for
    a 0/1 selector) measured ~2^-15-relative off on the 2026-08 TPU runtime
    — it no longer runs enough passes — and is no faster here (6.85 vs
    6.74 us/patch), so exactness costs nothing.
    """
    W = strip.shape[2]
    sel = (cols[:, :, None] == jnp.arange(W, dtype=jnp.int32)).astype(strip.dtype)
    return jax.lax.dot_general(
        strip,
        sel,
        (((2,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=strip.dtype,
    )


def _crop_rois_rowgather(
    frames_padded: jax.Array,
    img_idx: jax.Array,
    y0: jax.Array,
    x0: jax.Array,
    roi: int,
) -> jax.Array:
    """Row-gather + one-hot-matmul backend.

    Kept as the LIVAE_CROP_BACKEND=rowgather alternative: on the
    2026-08-16 TPU runtime, vmap'd dynamic_slice lowered to a SERIAL
    per-sample dynamic-update-slice loop (scripts/trace_ops.py:
    occurrences == B per step) and this formulation won; the 2026-08
    runtime vectorizes the slice, which now wins (see _crop_rois).
    Formulation: view frames as non-overlapping 256-wide column tiles
    [N, Hp, K, 256] (a free reshape; right-pad to the tile grid if
    needed), take the n_tiles adjacent tiles that cover each ROI window
    at rows img*Hp + y0 + i (a row gather — the fast gather formulation
    on TPU), then crop columns by contracting with the 0/1 matrix
    [j == local_col] on the MXU (`_crop_sel_matmul`, bit-identical to the
    sliced crop). Tiling cuts both the gathered bytes and the selector
    contraction from the full padded frame width (~2300 at production
    shapes) to n_tiles*256 (512): ~4.5x less of each. Frames narrower
    than the covering tile count fall back to whole-row gathers — same
    math at n_tiles=1 with Wp-wide tiles.
    """
    N, Hp, Wp = frames_padded.shape
    B = img_idx.shape[0]
    Tw = _CROP_TILE
    # tiles covering a roi-wide window starting anywhere inside one tile
    n_tiles = (roi + 2 * Tw - 2) // Tw
    K = -(-Wp // Tw)
    if K < n_tiles:
        # narrow frames: whole padded rows, one Wp-wide "tile"
        flat = frames_padded.reshape(N * Hp, Wp)
        rows = img_idx[:, None] * Hp + y0[:, None] + jnp.arange(roi, dtype=jnp.int32)
        strip = jnp.take(flat, rows, axis=0)  # [B, roi, Wp]
        return _crop_sel_matmul(strip, x0[:, None] + jnp.arange(roi, dtype=jnp.int32))
    if Wp != K * Tw:
        frames_padded = jnp.pad(frames_padded, ((0, 0), (0, 0), (0, K * Tw - Wp)))
    flat = frames_padded.reshape(N * Hp * K, Tw)
    k0 = jnp.minimum(x0 // Tw, K - n_tiles)  # [B] leftmost covering tile
    rows = img_idx[:, None] * Hp + y0[:, None] + jnp.arange(roi, dtype=jnp.int32)
    ridx = rows[:, :, None] * K + (
        k0[:, None, None] + jnp.arange(n_tiles, dtype=jnp.int32)
    )  # [B, roi, n_tiles]
    strip = jnp.take(flat, ridx, axis=0).reshape(B, roi, n_tiles * Tw)
    cols = x0[:, None] - k0[:, None] * Tw + jnp.arange(roi, dtype=jnp.int32)
    return _crop_sel_matmul(strip, cols)


def _crop_rois(
    frames_padded: jax.Array,
    img_idx: jax.Array,
    cy: jax.Array,
    cx: jax.Array,
    roi: int,
    margin: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched integer ROI crop around rounded centers.

    Returns (rois [B, roi, roi], ry, rx): the sub-pixel center position
    inside each ROI. Both backends assume the pad margin keeps every crop
    in bounds (guaranteed by pad_frames' margin — the reference's
    zero-padding of edge ROIs, src/livae/data.py:506-522).

    Backend choice is runtime-version-sensitive: the 2026-08 TPU runtime
    vectorizes vmap'd dynamic_slice (which the 2026-08-16 runtime lowered
    to a SERIAL per-sample loop, motivating the row-gather+matmul
    formulation), so slice now wins everywhere (scripts/bench_backends.py;
    in-pipeline crop 8.3 vs 15.6 us/patch, full step 9,495 vs 9,279 p/s).
    Override with LIVAE_CROP_BACKEND={slice,rowgather} to re-measure after
    a runtime change.
    """
    y0, x0, ry, rx = _crop_starts(
        cy, cx, roi, margin, padded_shape=frames_padded.shape[1:3]
    )
    backend = os.environ.get("LIVAE_CROP_BACKEND", "slice")
    if backend == "rowgather":
        rois = _crop_rois_rowgather(frames_padded, img_idx, y0, x0, roi)
    else:
        rois = _crop_rois_slice(frames_padded, img_idx, y0, x0, roi)
    return rois, ry, rx


def _minmax_normalize(p: jax.Array) -> jax.Array:
    """Per-patch min-max to [0, 1]; constant patch -> zeros.

    Reference: src/livae/data.py:553-558.
    """
    mn = jnp.min(p, axis=(1, 2), keepdims=True)
    mx = jnp.max(p, axis=(1, 2), keepdims=True)
    rng_ = mx - mn
    return jnp.where(rng_ > 0, (p - mn) / jnp.where(rng_ > 0, rng_, 1.0), 0.0)


def _scale_translate(
    rois: jax.Array,
    ry: jax.Array,
    rx: jax.Array,
    out_size: int,
    scale: jax.Array,
    flip_h: jax.Array | None = None,
    flip_v: jax.Array | None = None,
    jy: jax.Array | None = None,
    jx: jax.Array | None = None,
) -> jax.Array:
    """Separable resample: output grid of `out_size`, atom at out_size/2,
    scaled by `scale` about the atom center.

    For scale == 1 this is exactly the reference's bilinear recentering
    translate (pure translation is separable-bilinear-exact).

    flip_h/flip_v/jy/jx, when given, FOLD the post-resample flip + torch.roll
    jitter (reference data.py:105-114 order: flips, then roll) into the
    sampling grid: a roll is an index shift mod n and a flip an index
    reversal of the OUTPUT positions, so evaluating the same source
    coordinates at the permuted output index is bit-identical to resampling
    first and permuting after — while skipping the extra full-image
    flip/where and butterfly-logroll passes entirely.
    """
    B = rois.shape[0]
    c_out = out_size / 2.0  # reference convention: atom lands at index P/2
    grid = jnp.arange(out_size, dtype=jnp.int32)[None, :]  # [1, n]

    def src_for(r, flip, j):
        m = grid
        if j is not None:
            # torch.roll(shifts=j): out[i] = in[(i - j) mod n]
            m = jnp.mod(m - j[:, None], out_size)
        if flip is not None:
            m = jnp.where(flip[:, None], out_size - 1 - m, m)
        return (m.astype(jnp.float32) - c_out) / scale[:, None] + r[:, None]

    src_y = src_for(ry, flip_v, jy)
    src_x = src_for(rx, flip_h, jx)
    out = _axis_resample(rois, src_y, axis=1)
    out = _axis_resample(out, src_x, axis=2)
    return out


def _flips_and_jitter(
    p: jax.Array, flip_h: jax.Array, flip_v: jax.Array, jy: jax.Array, jx: jax.Array
) -> jax.Array:
    """Per-sample h/v flips then integer roll jitter (torch.roll semantics).

    Reference: src/livae/data.py:105-114.
    """
    fh = flip_h[:, None, None]
    fv = flip_v[:, None, None]
    p = jnp.where(fh, jnp.flip(p, axis=2), p)
    p = jnp.where(fv, jnp.flip(p, axis=1), p)
    # torch.roll(shifts=(jy, jx)): out[i] = in[i - jy] -> logroll by -jy
    p = _logroll_gather(p, (-jy)[:, None, None], axis=1)
    p = _logroll_gather(p, (-jx)[:, None, None], axis=2)
    return p


def _sample_aug(key: jax.Array, B: int, cfg: AugmentConfig):
    ks, ka, kh, kv, kjy, kjx = jax.random.split(key, 6)
    scale = jax.random.uniform(ks, (B,), minval=cfg.scale_min, maxval=cfg.scale_max)
    angle = jax.random.uniform(ka, (B,), minval=0.0, maxval=2 * jnp.pi)
    flip_h = jax.random.uniform(kh, (B,)) < cfg.flip_prob
    flip_v = jax.random.uniform(kv, (B,)) < cfg.flip_prob
    jy = jax.random.randint(kjy, (B,), -cfg.jitter, cfg.jitter + 1)
    jx = jax.random.randint(kjx, (B,), -cfg.jitter, cfg.jitter + 1)
    return scale, angle, flip_h, flip_v, jy, jx


def _center_crop_b(p: jax.Array, size: int) -> jax.Array:
    R = p.shape[1]
    top = int(round((R - size) / 2.0))
    return p[:, top : top + size, top : top + size]


def _extract_batch_impl(
    frames_padded: jax.Array,
    img_idx: jax.Array,
    centers: jax.Array,
    key: jax.Array | None,
    patch_size: int,
    padding: int = 48,
    cfg: AugmentConfig | None = None,
    normalize: bool = True,
    margin: int | None = None,
) -> jax.Array:
    """Extract an augmented batch of patches, fully on device.

    Args:
        frames_padded: [N, H+2m, W+2m] zero-padded preprocessed frames.
        img_idx: [B] int frame index per site.
        centers: [B, 2] float (y, x) site centers in ORIGINAL frame coords.
        key: PRNG key for augmentation (None or cfg=None -> no augmentation,
            the reference's transform=None encode path).
        patch_size, padding: as in the reference datasets.
        normalize: per-patch min-max (AdaptiveLatticeDataset semantics).
        margin: the frame pad margin (defaults to the standard roi//2+8).

    Returns:
        [B, patch_size, patch_size, 1] float32 patches.
    """
    P2 = patch_size + 2 * padding
    roi = P2 + 16
    if margin is None:
        margin = roi // 2 + 8
    B = img_idx.shape[0]
    cy, cx = centers[:, 0], centers[:, 1]

    rois, ry, rx = _crop_rois(frames_padded, img_idx, cy, cx, roi, margin)

    if cfg is not None and key is not None:
        scale, angle, flip_h, flip_v, jy, jx = _sample_aug(key, B, cfg)
    else:
        scale = jnp.ones((B,))
        angle = jnp.zeros((B,))
        flip_h = flip_v = jnp.zeros((B,), bool)
        jy = jx = jnp.zeros((B,), jnp.int32)

    if cfg is not None and not cfg.rotation:
        # flips + roll jitter folded into the resample grid (bit-identical)
        p = _scale_translate(rois, ry, rx, P2, scale, flip_h, flip_v, jy, jx)
    else:
        p = _scale_translate(rois, ry, rx, P2, scale)
        if cfg is not None and cfg.rotation:
            # margin S//6: safe for the central patch_size kept below (see
            # the paired path's note + regression test)
            p = rotate_image_fast(
                p[..., None], angle, padding_mode="zeros", margin=P2 // 6
            )[..., 0]
        if cfg is not None:
            # flips/jitter follow the rotation here, so they cannot fold
            p = _flips_and_jitter(p, flip_h, flip_v, jy, jx)

    p = _center_crop_b(p, patch_size)
    if normalize:
        p = _minmax_normalize(p)
    return p[..., None]


def _extract_batch_paired_impl(
    frames_padded: jax.Array,
    img_idx: jax.Array,
    centers: jax.Array,
    key: jax.Array,
    patch_size: int,
    padding: int = 48,
    cfg: AugmentConfig | None = AugmentConfig(),
    margin: int | None = None,
    normalize: bool = True,
    rot_dtype: str | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Paired extraction: (patch, rotated_patch, angle_rad).

    Mirrors PairedAdaptiveLatticeDataset (reference: src/livae/data.py:
    616-735): non-rotation transforms on the padded patch, one random
    angle U(0, 2pi), rotation applied to a padded copy, both center-cropped
    and independently min-max normalized (normalize=False skips the
    per-patch min-max — the ablation BASELINE.md's accuracy program runs,
    since per-patch normalization erases the absolute-intensity signal
    that separates vacancies).

    rot_dtype: compute dtype for the rotated copy's shear passes +
    normalize (None = float32). The rotated patch feeds ONLY the STN's
    theta-localization pass, whose convs cast to the model's compute
    dtype anyway — so bfloat16 here (the training default under the
    mixed-precision policy) changes nothing downstream beyond the AMP
    rounding the model already applies, while halving the HBM traffic
    of the rotation's 3 shear passes over the 256-wide canvas.
    """
    P2 = patch_size + 2 * padding
    roi = P2 + 16
    if margin is None:
        margin = roi // 2 + 8
    B = img_idx.shape[0]
    cy, cx = centers[:, 0], centers[:, 1]

    rois, ry, rx = _crop_rois(frames_padded, img_idx, cy, cx, roi, margin)

    kaug, kangle = jax.random.split(key)
    if cfg is not None:
        scale, _, flip_h, flip_v, jy, jx = _sample_aug(kaug, B, cfg)
    else:
        scale = jnp.ones((B,))
        flip_h = flip_v = jnp.zeros((B,), bool)
        jy = jx = jnp.zeros((B,), jnp.int32)

    if cfg is not None:
        # flips + roll jitter folded into the resample grid (bit-identical;
        # the paired rotation below then sees the exact same p_big)
        p_big = _scale_translate(rois, ry, rx, P2, scale, flip_h, flip_v, jy, jx)
    else:
        p_big = _scale_translate(rois, ry, rx, P2, scale)

    angle = jax.random.uniform(kangle, (B,), minval=0.0, maxval=2 * jnp.pi)
    # +angle in the STN grid convention => theta_rot = theta_orig - angle,
    # the relation cycle_consistency_loss expects.
    # margin S//6 (not the default S//4): wraparound only ever corrupts the
    # outer ring of the rotated P2-canvas, and this path keeps just the
    # central patch_size crop — bit-identical on the kept region
    # (tests/test_data.py::test_paired_rotation_margin), while the smaller
    # pad keeps the shear canvas at 256 lanes for the production shapes
    # (192 -> 256 instead of 288: aligned to the TPU's 128-lane tiles).
    rot_in = p_big[..., None]
    if rot_dtype is not None:
        rot_in = rot_in.astype(jnp.dtype(rot_dtype))
    rot_big = rotate_image_fast(
        rot_in, angle, padding_mode="zeros", margin=P2 // 6
    )[..., 0]

    patch = _center_crop_b(p_big, patch_size)
    rotated = _center_crop_b(rot_big, patch_size)
    if normalize:
        patch = _minmax_normalize(patch)
        rotated = _minmax_normalize(rotated)
    return patch[..., None], rotated[..., None], angle


# Public jitted entry points. The un-jitted _impl variants exist for callers
# that are already inside jit (the fused train/encode steps): nesting a
# jitted pallas_call inside jit trips a lowering-cache bug in jax 0.9.
extract_batch = functools.partial(
    jax.jit(
        _extract_batch_impl,
        static_argnames=("patch_size", "padding", "cfg", "normalize", "margin"),
    )
)
extract_batch_paired = functools.partial(
    jax.jit(
        _extract_batch_paired_impl,
        static_argnames=("patch_size", "padding", "cfg", "margin", "normalize", "rot_dtype"),
    )
)
