"""Frequency-domain filters for HAADF-STEM images, TPU-native.

Capability parity with the reference's FFT filter module
(reference: src/livae/filter.py:9-232): magnitude/phase spectra, [0, 1]
normalization, and circular low-/high-/band-pass masks. The reference runs
scipy.fft (pocketfft, C) on the host; here every filter is a pure jax.numpy
function that jits onto the TPU's XLA FFT, so whole-frame preprocessing can
live on device next to peak detection and patch extraction.

All functions accept a single 2D image (H, W) and are `jax.jit`-compatible;
batched use is `jax.vmap`. Numpy arrays are accepted and converted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "fft_spectra",
    "normalize_image",
    "lowpass_filter",
    "highpass_filter",
    "bandpass_filter",
    "radial_mask",
]


def _as_float_image(image) -> jax.Array:
    """Validate a 2D image and cast to float32 (TPU-native precision).

    Mirrors the reference's 2D-only contract (src/livae/filter.py:21-27),
    raising ValueError on any non-2D input.
    """
    array = jnp.asarray(image)
    if array.ndim != 2:
        raise ValueError(f"Expected a 2D array, got shape {array.shape}")
    return array.astype(jnp.float32)


def radial_mask(
    shape: tuple[int, int],
    low_cutoff: float = 0.0,
    high_cutoff: float | None = None,
) -> jax.Array:
    """Circular (or annular) frequency mask centered like fftshift.

    Reference: src/livae/filter.py:30-43. Radius measured from
    (rows // 2, cols // 2); mask keeps low_cutoff <= r (<= high_cutoff).
    """
    rows, cols = shape
    center_y, center_x = rows // 2, cols // 2
    y = jnp.arange(rows, dtype=jnp.float32)[:, None] - center_y
    x = jnp.arange(cols, dtype=jnp.float32)[None, :] - center_x
    radius = jnp.sqrt(x * x + y * y)
    mask = radius >= low_cutoff
    if high_cutoff is not None:
        mask = mask & (radius <= high_cutoff)
    return mask


def fft_spectra(image) -> tuple[jax.Array, jax.Array]:
    """Centered magnitude and phase spectra of a 2D image.

    Reference: src/livae/filter.py:46-74.
    """
    array = _as_float_image(image)
    f = jnp.fft.fftshift(jnp.fft.fft2(array))
    return jnp.abs(f), jnp.angle(f)


def normalize_image(image) -> jax.Array:
    """Min-max normalize a 2D image to [0, 1]; constant input -> zeros.

    Reference: src/livae/filter.py:77-108.
    """
    array = jnp.asarray(image, dtype=jnp.float32)
    min_val = jnp.min(array)
    ptp = jnp.max(array) - min_val
    return jnp.where(ptp == 0.0, jnp.zeros_like(array), (array - min_val) / jnp.where(ptp == 0.0, 1.0, ptp))


def _masked_fft_filter(array: jax.Array, mask: jax.Array) -> jax.Array:
    f = jnp.fft.fftshift(jnp.fft.fft2(array))
    filtered = f * mask
    return jnp.real(jnp.fft.ifft2(jnp.fft.ifftshift(filtered)))


@functools.partial(jax.jit, static_argnames=("cutoff_radius",))
def _lowpass(array: jax.Array, cutoff_radius: float) -> jax.Array:
    mask = radial_mask(array.shape, high_cutoff=cutoff_radius)
    return _masked_fft_filter(array, mask)


@functools.partial(jax.jit, static_argnames=("cutoff_radius",))
def _highpass(array: jax.Array, cutoff_radius: float) -> jax.Array:
    mask = radial_mask(array.shape, low_cutoff=cutoff_radius)
    return _masked_fft_filter(array, mask)


@functools.partial(jax.jit, static_argnames=("low_cutoff", "high_cutoff"))
def _bandpass(array: jax.Array, low_cutoff: float, high_cutoff: float) -> jax.Array:
    mask = radial_mask(array.shape, low_cutoff=low_cutoff, high_cutoff=high_cutoff)
    return _masked_fft_filter(array, mask)


def host_bandpass_normalize(image, low_cutoff: float = 20.0, high_cutoff: float = 100.0):
    """Host (scipy) bandpass+normalize for dataset-build preprocessing.

    Numerically identical to bandpass_filter+normalize_image but runs on
    host numpy: dataset build needs the result host-side for peak
    detection, and a device round trip wastes tunnel bandwidth + first-jit
    warmup. Device training paths use the jnp filters.
    """
    import numpy as _np
    from scipy import fft as _sfft

    if high_cutoff <= low_cutoff:
        raise ValueError("high_cutoff must be greater than low_cutoff")
    array = _np.asarray(image, dtype=_np.float64)
    if array.ndim != 2:
        raise ValueError(f"Expected a 2D array, got shape {array.shape}")
    rows, cols = array.shape
    cy, cx = rows // 2, cols // 2
    y = _np.arange(rows)[:, None] - cy
    x = _np.arange(cols)[None, :] - cx
    r = _np.sqrt(x * x + y * y)
    mask = (r >= low_cutoff) & (r <= high_cutoff)
    f = _sfft.fftshift(_sfft.fft2(array))
    out = _np.real(_sfft.ifft2(_sfft.ifftshift(f * mask)))
    mn, ptp = out.min(), _np.ptp(out)
    if ptp == 0.0:
        return _np.zeros_like(out)
    return (out - mn) / ptp


def lowpass_filter(image, cutoff_radius: float) -> jax.Array:
    """Circular low-pass FFT filter (reference: src/livae/filter.py:111-145)."""
    return _lowpass(_as_float_image(image), float(cutoff_radius))


def highpass_filter(image, cutoff_radius: float) -> jax.Array:
    """Circular high-pass FFT filter (reference: src/livae/filter.py:148-183)."""
    return _highpass(_as_float_image(image), float(cutoff_radius))


def bandpass_filter(image, low_cutoff: float, high_cutoff: float) -> jax.Array:
    """Annular band-pass FFT filter (reference: src/livae/filter.py:186-232).

    Raises ValueError if high_cutoff <= low_cutoff, matching the reference
    contract (src/livae/filter.py:225-226).
    """
    if high_cutoff <= low_cutoff:
        raise ValueError("high_cutoff must be greater than low_cutoff")
    return _bandpass(_as_float_image(image), float(low_cutoff), float(high_cutoff))
