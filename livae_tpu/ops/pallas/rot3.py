"""Pallas TPU kernel: the ENTIRE 3-shear rotation fused into one launch.

`ops.resample.rotate_image_fast` decomposes a rotation into three
axis-aligned fractional shifts, Sx(d_row) . Sy(d_col) . Sx(d_row)
(Paeth). The per-shift kernel (ops/pallas/shear.py) already keeps each
butterfly in VMEM, but a rotation still costs 3 kernel launches + 3 HBM
round trips forward, and its per-shear custom VJP costs ~6 more backward.
This kernel runs all three shears on one VMEM-resident f32 scratch:

* forward: 1 launch, 1 HBM read + 1 write; the intermediate shears are
  never materialized in HBM and never rounded to the I/O dtype, which
  makes the Pallas backend arithmetic IDENTICAL to the XLA 3-shear path
  (that path also promotes once to f32 and casts once at the end).
* backward: dx is the SAME kernel with negated shifts (the adjoint of a
  mod-wrap lerp-shift by d is the lerp-shift by -d, and the Sx.Sy.Sx
  sandwich is order-symmetric); d/d(delta)s come from one fused kernel
  that recomputes the two forward intermediates in VMEM and emits all
  three cotangent reductions — 2 launches total instead of ~9.

Used by rotate_image_fast(backend="pallas"); shear.py remains for the
standalone fractional_shift op and CPU-interpret tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rot3_pallas"]


def _butterfly_int(buf, k, axis, n, nbits):
    """buf rolled by -k along `axis` (k int32 >= 0, broadcast per lane)."""
    cur = buf
    for t in range(nbits):
        step = 1 << t
        if step >= n:
            break
        cand = pltpu.roll(cur, n - step, axis=axis)
        bit = ((k >> t) & 1).astype(jnp.bool_)
        cur = jnp.where(bit, cand, cur)
    return cur


def _lerp_shift_pair(buf, delta, axis, n, nbits):
    """(out, q0, q1): lerp-shift of `buf` (f32) by `delta` along `axis`,
    plus the integer-shift pair it interpolated, q0 = S_floor(delta)(buf)
    and q1 = S_floor(delta)+1(buf).

    delta: [TB, 1, P]; broadcast orientation handled per axis (shift along
    W varies per row -> [TB, P, 1]; along H varies per column -> [TB, 1, P]).
    """
    k = jnp.floor(delta)
    f = delta - k
    k = jnp.mod(k.astype(jnp.int32), n)
    if axis == 1:
        kb, fb = k, f
    else:
        kb, fb = jnp.swapaxes(k, 1, 2), jnp.swapaxes(f, 1, 2)
    q0 = _butterfly_int(buf, kb, axis, n, nbits)
    q1 = pltpu.roll(q0, n - 1, axis=axis)
    return (1.0 - fb) * q0 + fb * q1, q0, q1


def _lerp_shift(buf, delta, axis, n, nbits):
    return _lerp_shift_pair(buf, delta, axis, n, nbits)[0]


def _adj_pair(q0, q1, fpos, axis):
    """h1 - h0 with h0 = S_-k(g), h1 = S_-(k+1)(g), from the pair of the
    ADJOINT lerp-shift by -delta (delta = k + f, f >= 0).

    The adjoint shift's floor is m = -(k+1) when f > 0 (so q0 = h1 and
    q1 = h0) but m = -k when f == 0 exactly (integer delta: q0 = h0, and
    h1 needs one extra roll). `fpos` is the f > 0 mask oriented like the
    shifted axis.
    """
    h0 = jnp.where(fpos, q1, q0)
    h1 = jnp.where(fpos, q0, pltpu.roll(q0, 1, axis=axis))
    return h1 - h0


def _rot3_fwd_kernel(x_ref, dr_ref, dc_ref, out_ref, s, *, n, nbits):
    dr = dr_ref[:].astype(jnp.float32)
    dc = dc_ref[:].astype(jnp.float32)
    s[:] = x_ref[:].astype(jnp.float32)
    s[:] = _lerp_shift(s[:], dr, 2, n, nbits)
    s[:] = _lerp_shift(s[:], dc, 1, n, nbits)
    s[:] = _lerp_shift(s[:], dr, 2, n, nbits)
    out_ref[:] = s[:].astype(out_ref.dtype)


def _rot3_bwd_kernel(
    x_ref, dr_ref, dc_ref, g_ref, dx_ref, ddr_ref, ddc_ref, s_a, s_b, s_g,
    *, n, nbits,
):
    """Fused VJP: recompute forward intermediates, emit dx, ddr, ddc.

    Chain (fwd): a = Sx_dr(x); b = Sy_dc(a); y = Sx_dr(b).
    Cotangents:  gb = Sx_-dr(g); ga = Sy_-dc(gb); dx = Sx_-dr(ga).
    d/d(delta) of a lerp-shift out = (1-f) g0 + f g1 is (g1 - g0) . g,
    summed along the shifted axis (shear.py _bwd's formulation). Since
    circular shift is a permutation, sum g . S_j(b) = sum S_-j(g) . b —
    so the integer pairs the three ADJOINT shifts already build double as
    the delta-cotangent pairs (_adj_pair), and the bwd kernel runs 5
    butterflies total (2 fwd recompute + 3 adjoint) instead of 8.
    """
    dr = dr_ref[:].astype(jnp.float32)
    dc = dc_ref[:].astype(jnp.float32)
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    # f > 0 masks of the FORWARD shifts, oriented like the shifted axes
    fpos_r = jnp.swapaxes(dr - jnp.floor(dr), 1, 2) > 0.0  # [TB, P, 1]
    fpos_c = (dc - jnp.floor(dc)) > 0.0                    # [TB, 1, P]

    s_a[:] = _lerp_shift(x, dr, 2, n, nbits)          # a
    s_b[:] = _lerp_shift(s_a[:], dc, 1, n, nbits)     # b

    # stage 3 (y = Sx_dr(b)): ddr3 = sum_x g . (b1 - b0) = sum (h1 - h0) . b
    gb, q0, q1 = _lerp_shift_pair(g, -dr, 2, n, nbits)
    s_g[:] = gb
    ddr = jnp.sum(_adj_pair(q0, q1, fpos_r, 2) * s_b[:], axis=2)[:, None, :]

    # stage 2 (b = Sy_dc(a)): ddc = sum_y gb . (a1 - a0) = sum (h1 - h0) . a
    ga, q0, q1 = _lerp_shift_pair(s_g[:], -dc, 1, n, nbits)
    s_g[:] = ga
    ddc_ref[:] = jnp.sum(
        _adj_pair(q0, q1, fpos_c, 1) * s_a[:], axis=1
    )[:, None, :].astype(ddc_ref.dtype)

    # stage 1 (a = Sx_dr(x)): ddr1 = sum_x ga . (x1 - x0) = sum (h1 - h0) . x
    dx, q0, q1 = _lerp_shift_pair(s_g[:], -dr, 2, n, nbits)
    ddr_ref[:] = (
        ddr + jnp.sum(_adj_pair(q0, q1, fpos_r, 2) * x, axis=2)[:, None, :]
    ).astype(ddr_ref.dtype)
    dx_ref[:] = dx.astype(dx_ref.dtype)


# Scoped-VMEM sizing shared by the launch helpers and the callers' fits
# check. FWD/BWD_N_BUFS are the kernels' concurrent-f32-tile-buffer
# estimates (pipelined in/out blocks count double for double-buffering);
# VMEM_BUDGET leaves headroom under the 16 MB scoped limit.
FWD_N_BUFS = 10
BWD_N_BUFS = 20
VMEM_BUDGET = 12_000_000


def _per_tile_bytes(H, W, n_bufs):
    """Bytes of scoped VMEM per batch sample: physically padded tile
    layout (sublanes of 8, lanes of 128) x n_bufs concurrent f32 tiles."""
    Hp = -(-H // 8) * 8
    Wp = -(-W // 128) * 128
    return Hp * Wp * 4 * n_bufs


def _tile_batch(B, H, W, n_bufs, budget=VMEM_BUDGET):
    """Samples per grid step under the scoped-VMEM budget."""
    per_tile = _per_tile_bytes(H, W, n_bufs)
    TB = 1
    while TB * 2 <= B and B % (TB * 2) == 0 and (TB * 2) * per_tile <= budget:
        TB *= 2
    return TB


def rot3_fits_vmem(H: int, W: int) -> bool:
    """Whether the fused kernels compile within the scoped-VMEM budget.

    The backward kernel is the constraint (BWD_N_BUFS concurrent f32
    tile buffers, see _rot3_bwd_impl); below TB=1 there is nothing left
    to shrink and pallas_call fails at compile, so callers must fall
    back to the XLA shear path (canvases around 448+ at f32).
    """
    return _per_tile_bytes(H, W, BWD_N_BUFS) <= VMEM_BUDGET


def _rot3_fwd_impl(x, d_row, d_col, interpret=False):
    B, H, W = x.shape
    assert H == W, "rot3 requires a square canvas"
    n = H
    nbits = max(1, int(np.ceil(np.log2(n))))
    # in + out blocks double-buffer (2x each) + scratch + the butterfly's
    # live temporaries (roll candidate, select output, lerp g1) — the
    # compiler's scoped-stack analysis counts ~FWD_N_BUFS concurrent tiles
    TB = _tile_batch(B, H, W, n_bufs=FWD_N_BUFS)
    dr3 = d_row.astype(jnp.float32)[:, None, :]
    dc3 = d_col.astype(jnp.float32)[:, None, :]
    kernel = functools.partial(_rot3_fwd_kernel, n=n, nbits=nbits)
    delta_spec = pl.BlockSpec((TB, 1, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W), x.dtype),
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            delta_spec,
            delta_spec,
        ],
        out_specs=pl.BlockSpec((TB, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TB, H, W), jnp.float32)],
        interpret=interpret,
    )(x, dr3, dc3)


def _rot3_bwd_impl(x, d_row, d_col, g, interpret=False):
    B, H, W = x.shape
    n = H
    nbits = max(1, int(np.ceil(np.log2(n))))
    # 2 in tiles + 1 out tile double-buffered (6) + 3 scratches + int-pair
    # and butterfly temporaries: budget ~BWD_N_BUFS concurrent tile buffers
    TB = _tile_batch(B, H, W, n_bufs=BWD_N_BUFS)
    dr3 = d_row.astype(jnp.float32)[:, None, :]
    dc3 = d_col.astype(jnp.float32)[:, None, :]
    kernel = functools.partial(_rot3_bwd_kernel, n=n, nbits=nbits)
    tile = pl.BlockSpec((TB, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    delta_spec = pl.BlockSpec((TB, 1, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dx, ddr, ddc = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W), g.dtype),
            jax.ShapeDtypeStruct((B, 1, W), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, W), jnp.float32),
        ),
        grid=(B // TB,),
        in_specs=[tile, delta_spec, delta_spec, tile],
        out_specs=(tile, delta_spec, delta_spec),
        scratch_shapes=[
            pltpu.VMEM((TB, H, W), jnp.float32),
            pltpu.VMEM((TB, H, W), jnp.float32),
            pltpu.VMEM((TB, H, W), jnp.float32),
        ],
        interpret=interpret,
    )(x, dr3, dc3, g)
    return dx, ddr[:, 0, :], ddc[:, 0, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def rot3_pallas(x, d_row, d_col, interpret: bool = False):
    """Fused 3-shear rotation Sx(d_row) . Sy(d_col) . Sx(d_row).

    x: [B, P, P] (square canvas, already padded); d_row/d_col: [B, P]
    per-row/per-column fractional shifts, mod-P wraparound like
    ops.resample._fractional_shift. Arithmetic matches the XLA 3-shear
    path exactly (f32 through all stages, one final cast).
    """
    return _rot3_fwd_impl(x, d_row, d_col, interpret)


def _fwd(x, d_row, d_col, interpret):
    return _rot3_fwd_impl(x, d_row, d_col, interpret), (x, d_row, d_col)


def _bwd(interpret, residuals, g):
    x, d_row, d_col = residuals
    dx, ddr, ddc = _rot3_bwd_impl(x, d_row, d_col, g, interpret)
    return dx, ddr.astype(d_row.dtype), ddc.astype(d_col.dtype)


rot3_pallas.defvjp(_fwd, _bwd)
