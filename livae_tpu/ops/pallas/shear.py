"""Pallas TPU kernel: fused fractional shift (the shear-rotation hot op).

The XLA 3-shear rotation (ops/resample.rotate_image_fast) materializes
~24 roll+select passes in HBM (~5 GB of traffic for a [512,192,192] batch).
This kernel keeps each tile in VMEM through the entire log-roll gather, so
HBM traffic collapses to one read + one write per tile (~150 MB): the
roll/select arithmetic runs on the VPU against a scratch buffer (explicit
in-place updates keep only two tile-sized buffers live, fitting the 16 MB
scoped-VMEM budget at any image size).

out[..., i, ...] = (1 - f) * x[..., i + k, ...] + f * x[..., i + k + 1, ...]
with k = floor(delta), f = frac(delta), indices mod n, and delta CONSTANT
along the shifted axis (the shear property). Gradients:

* d/dx: the adjoint of the lerp is exactly `fractional_shift(-delta)` —
  the same kernel with negated shift (verified in tests).
* d/ddelta: (g1 - g0) . grad, with g1 = shift(x, delta + 1); recomputed in
  the backward pass (cheaper than saving residuals at ~0.1 ms/call).

Used by rotate_image_fast(backend="pallas"); the XLA path remains for CPU
tests and as a fallback. Measured on TPU v5e: 5.6 ms vs 30.5 ms (XLA) for
a full [512,128,128] rotation forward, bit-identical output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fractional_shift_pallas"]


def _shift_kernel(x_ref, delta_ref, out_ref, scratch, *, axis: int, n: int, nbits: int):
    """One [TB, H, W] tile: logroll-gather + lerp entirely in VMEM.

    axis: 1 (shift along H; delta per (sample, column) -> [TB, 1, W])
          2 (shift along W; delta per (sample, row)    -> [TB, 1, H])
    The explicit scratch ref bounds live VMEM to ~2 tile buffers.
    """
    delta = delta_ref[:]  # [TB, 1, n_other]

    k = jnp.floor(delta)
    f = delta - k
    k = jnp.mod(k.astype(jnp.int32), n)

    if axis == 1:
        kb = k  # [TB, 1, W] broadcasts over H (axis 1)
        fb = f
    else:
        kb = jnp.swapaxes(k, 1, 2)  # [TB, H, 1] broadcasts over W (axis 2)
        fb = jnp.swapaxes(f, 1, 2)

    # The scratch works in float32 regardless of the I/O dtype: the TPU's
    # dynamic_rotate only supports 32-bit vectors ("Rotate with non-32-bit
    # data"), and the upcast is free relative to the HBM saving — bf16
    # tiles still halve the kernel's HBM read/write traffic.
    scratch[:] = x_ref[:].astype(jnp.float32)
    for t in range(nbits):
        step = 1 << t
        if step >= n:
            break
        cand = pltpu.roll(scratch[:], n - step, axis=axis)  # == roll by -step
        bit = ((kb >> t) & 1).astype(jnp.bool_)
        scratch[:] = jnp.where(bit, cand, scratch[:])

    nxt = pltpu.roll(scratch[:], n - 1, axis=axis)  # == roll by -1
    out_ref[:] = ((1.0 - fb) * scratch[:] + fb * nxt).astype(out_ref.dtype)


def _fractional_shift_fwd_impl(x, delta, axis, interpret=False):
    B, H, W = x.shape
    n = x.shape[axis]
    nbits = max(1, int(np.ceil(np.log2(n))))
    # Tile a few samples per grid step for DMA efficiency; scratch keeps
    # live VMEM ~2 buffers, so 8x288x288 f32 (2.6 MB each) is safe.
    TB = 1
    # the scratch is always f32 (see _shift_kernel), so budget on 4 bytes
    while (
        TB * 2 <= B
        and B % (TB * 2) == 0
        and (TB * 2) * H * W * 4 <= 2_000_000
    ):
        TB *= 2
    grid = (B // TB,)

    delta3 = delta.astype(jnp.float32)[:, None, :]  # [B, 1, n_other]
    kernel = functools.partial(_shift_kernel, axis=axis, n=n, nbits=nbits)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TB, 1, delta3.shape[2]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((TB, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TB, H, W), jnp.float32)],
        interpret=interpret,
    )(x, delta3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fractional_shift_pallas(x, delta, axis: int, interpret: bool = False):
    """Fused fractional shift: see module docstring.

    x: [B, H, W]; delta: [B, W] (axis=1) or [B, H] (axis=2), constant along
    the shifted axis. Wraps mod n, like ops.resample._fractional_shift.
    """
    return _fractional_shift_fwd_impl(x, delta, axis, interpret)


def _fwd(x, delta, axis, interpret):
    out = _fractional_shift_fwd_impl(x, delta, axis, interpret)
    return out, (x, delta)


def _bwd(axis, interpret, residuals, g):
    x, delta = residuals
    # adjoint of the lerp w.r.t. x == the same shift with -delta
    dx = _fractional_shift_fwd_impl(g, -delta, axis, interpret)
    # d/ddelta: out = (1-f) g0 + f g1 -> d out/d delta = g1 - g0 (per element).
    # g1 = shift(x, floor(delta)+1) is exactly g0 rolled by -1 along the
    # shifted axis (integral shifts are pure index rolls), so one kernel
    # call + a static roll replaces two kernel calls.
    g0 = _fractional_shift_fwd_impl(x, jnp.floor(delta), axis, interpret)
    g1 = jnp.roll(g0, -1, axis=axis)
    # accumulate the reduction in f32 (inputs may be bf16)
    per_elem = (g1 - g0).astype(jnp.float32) * g.astype(jnp.float32)
    ddelta = jnp.sum(per_elem, axis=axis).astype(delta.dtype)
    return dx, ddelta


fractional_shift_pallas.defvjp(_fwd, _bwd)
