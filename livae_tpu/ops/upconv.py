"""Fused [2x bilinear upsample -> ReflectionPad(1) -> Conv3x3] as one
half-resolution 4-phase convolution (exact, including boundaries).

The reference decoder stage (reference: src/livae/model.py:355-373) is
    y = Conv3x3(ReflectionPad1(Upsample2x_bilinear(x)))
computed at the UPSAMPLED resolution. On TPU that shape is hostile: the
late stages run 3x3 convs with 32/1 channels over 64^2/128^2 maps — the
channel (lane) dimension is nearly empty, and the 2x-resolution
intermediates burn HBM bandwidth (profiled: the last decoder stage alone
cost 15.6 ms of a 24.9 ms decoder forward at batch 512, patch 128).

Because the bilinear 2x upsample (align_corners=False, half-pixel,
edge-clamped — torch nn.Upsample semantics) is a 2-phase linear filter,
the composition collapses to FOUR 3x3 convolutions on the LOW-resolution
input — one per output phase (p, q) in {0,1}^2 — plus a depth-to-space:

    out[2i+p, 2j+q] = sum_{s,t} Keff[p,q][s,t] . x[i+s, j+t]

with per-axis phase taps (W-1, W0, W1 = conv taps along that axis):

    c_{0,-1} = 0.75 W-1 + 0.25 W0        c_{1,-1} = 0.25 W-1
    c_{0,0}  = 0.25 W-1 + 0.75 W0 + 0.75 W1   c_{1,0} = 0.75 W-1 + 0.75 W0 + 0.25 W1
    c_{0,+1} = 0.25 W1                    c_{1,+1} = 0.25 W0 + 0.75 W1

Boundaries: evaluating the phase conv on an edge-replicated input
reproduces the exact upsample-clamp + reflection-pad semantics
everywhere except the outermost output line on each side of each axis,
whose exact per-axis corrections are the closed forms

    D_first = 0.25 W[-1] (x[1]   - x[0])     (output line 0,    phase 0)
    D_last  = 0.25 W[+1] (x[n-2] - x[n-1])   (output line 2n-1, phase 1)

With A_ax the approximate (phase-conv on edge-padded input) operator
along one axis and T_ax = A_ax + D_ax the exact one, the exact 2-D
result is

    T_H T_W = A  +  D_H T_W  +  T_H D_W  -  D_H D_W

i.e. the row corrections pushed through the exact column operator, the
column corrections pushed through the exact row operator, and a corner
term removing the double count. Everything is half-resolution MXU
contraction work; only the final depth-to-space touches the 2x grid.

Verified to float32 tolerance against the unfused composition (random
shapes/kernels, CPU and TPU) in tests/test_upconv.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_upsample_reflect_conv", "fused_conv5_relu_maxpool"]

# Per-axis phase transforms A_p[s, a]: coefficient of input tap s in
# output phase p per conv tap a (rows s = -1,0,+1; cols a = -1,0,+1).
_A0 = np.array(
    [[0.75, 0.25, 0.0],
     [0.25, 0.75, 0.75],
     [0.0, 0.0, 0.25]], np.float32
)
_A1 = np.array(
    [[0.25, 0.0, 0.0],
     [0.75, 0.75, 0.25],
     [0.0, 0.25, 0.75]], np.float32
)


def _conv_valid(x: jax.Array, k: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _fused_1d(lines: jax.Array, w_1d: jax.Array, axis: int) -> jax.Array:
    """EXACT fused upsample+reflect+conv along one spatial axis.

    lines: [B, H, W, Cin] with the non-`axis` spatial dim typically 1;
    w_1d: [3, Cin, Cout] — the 3 conv taps along `axis` (1=H, 2=W).
    Returns the exact 1-D operator output with 2x size along `axis`.
    """
    n = lines.shape[axis]
    A = jnp.asarray(np.stack([_A0, _A1]), w_1d.dtype)  # [2, s, a]
    kp = jnp.einsum("psa,aio->psio", A, w_1d)  # [2, 3, Cin, Cout]
    Cout = kp.shape[-1]
    Cin = kp.shape[-2]
    # channel-minor phase order, kernel [3(axis), 1, Cin, 2*Cout]
    k = jnp.moveaxis(kp, 0, 2).reshape(3, 1, Cin, 2 * Cout)
    if axis == 2:
        k = jnp.transpose(k, (1, 0, 2, 3))
    pad = [(0, 0)] * 4
    pad[axis] = (1, 1)
    y = _conv_valid(jnp.pad(lines, pad, mode="edge"), k)
    # unpack phases: [..., n, ..., 2*Cout] -> interleave along `axis`
    shp = list(y.shape[:-1]) + [2, Cout]
    y = y.reshape(shp)  # [..., 2(phase), Cout] with axis dim n
    # corrections
    first = jax.lax.slice_in_dim(lines, 0, 1, axis=axis)
    second = jax.lax.slice_in_dim(lines, 1, 2, axis=axis)
    ultim = jax.lax.slice_in_dim(lines, n - 1, n, axis=axis)
    penult = jax.lax.slice_in_dim(lines, n - 2, n - 1, axis=axis)
    d_first = 0.25 * jnp.einsum("bhwc,co->bhwo", second - first, w_1d[0])
    d_last = 0.25 * jnp.einsum("bhwc,co->bhwo", penult - ultim, w_1d[2])
    idx_first = [slice(None)] * y.ndim
    idx_first[axis] = 0
    idx_first[-2] = 0
    idx_last = [slice(None)] * y.ndim
    idx_last[axis] = n - 1
    idx_last[-2] = 1
    y = y.at[tuple(idx_first)].add(jnp.squeeze(d_first, axis))
    y = y.at[tuple(idx_last)].add(jnp.squeeze(d_last, axis))
    # interleave phases -> 2n along `axis`
    perm = list(range(y.ndim))
    perm.remove(y.ndim - 2)
    perm.insert(axis + 1, y.ndim - 2)
    y = jnp.transpose(y, perm)
    out_shape = list(lines.shape[:-1])
    out_shape[axis] = 2 * n
    return y.reshape(out_shape + [Cout])


def fused_upsample_reflect_conv(
    x: jax.Array, w: jax.Array, b: jax.Array | None
) -> jax.Array:
    """Exact Conv3x3(ReflectPad1(Upsample2x_bilinear(x))), NHWC.

    x: [B, H, W, Cin]; w: [3, 3, Cin, Cout] (HWIO); b: [Cout] or None.
    Returns [B, 2H, 2W, Cout].
    """
    B, H, Wn, Cin = x.shape
    Cout = w.shape[-1]

    A = jnp.asarray(np.stack([_A0, _A1]), w.dtype)
    keff = jnp.einsum("psa,qtb,abio->pqstio", A, A, w)  # [2,2,3,3,Cin,Cout]
    k_all = jnp.transpose(keff, (2, 3, 4, 0, 1, 5)).reshape(3, 3, Cin, 4 * Cout)

    y = _conv_valid(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"), k_all)
    y = y.reshape(B, H, Wn, 2, 2, Cout)

    # D_H pushed through the exact W operator (handles its own W edges)
    dh_first = _fused_1d(0.25 * (x[:, 1:2] - x[:, 0:1]), w[0], axis=2)  # [B,1,2W,Cout]
    dh_last = _fused_1d(0.25 * (x[:, -2:-1] - x[:, -1:]), w[2], axis=2)
    # D_W pushed through the exact H operator
    dw_first = _fused_1d(0.25 * (x[:, :, 1:2] - x[:, :, 0:1]), w[:, 0], axis=1)  # [B,2H,1,Cout]
    dw_last = _fused_1d(0.25 * (x[:, :, -2:-1] - x[:, :, -1:]), w[:, 2], axis=1)

    # corner double-count D_H D_W (to subtract)
    def corner(i0, i1, j0, j1, wtap):
        d = x[:, i1, j1] - x[:, i1, j0] - x[:, i0, j1] + x[:, i0, j0]  # [B, Cin]
        return 0.0625 * jnp.einsum("bc,co->bo", d, wtap)

    c00 = corner(0, 1, 0, 1, w[0, 0])
    c01 = corner(0, 1, Wn - 1, Wn - 2, w[0, 2])
    c10 = corner(H - 1, H - 2, 0, 1, w[2, 0])
    c11 = corner(H - 1, H - 2, Wn - 1, Wn - 2, w[2, 2])

    # assemble in phase space, then depth-to-space
    y = y.at[:, 0, :, 0].add(dh_first.reshape(B, Wn, 2, Cout))
    y = y.at[:, -1, :, 1].add(dh_last.reshape(B, Wn, 2, Cout))
    y = y.at[:, :, 0, :, 0].add(dw_first.reshape(B, H, 2, Cout))
    y = y.at[:, :, -1, :, 1].add(dw_last.reshape(B, H, 2, Cout))
    y = y.at[:, 0, 0, 0, 0].add(-c00)
    y = y.at[:, 0, -1, 0, 1].add(-c01)
    y = y.at[:, -1, 0, 1, 0].add(-c10)
    y = y.at[:, -1, -1, 1, 1].add(-c11)

    out = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(B, 2 * H, 2 * Wn, Cout)
    if b is not None:
        out = out + b
    return out


# ---------------------------------------------------------------------------
# Fused Conv5x5(pad=2) + ReLU + MaxPool(2x2) at half resolution.
#
# The STN localization trunk (reference: src/livae/model.py:203-214) runs
# two [Conv5x5(pad 2) -> ReLU -> MaxPool2] blocks. On TPU the first conv is
# the worst shape in the model: C_in=1 over a 128^2 map (vector lanes ~1%
# occupied). But the pool consumes the conv output in aligned 2x2 blocks —
# exactly the four phases of a stride-2 decomposition — so the whole block
# collapses to ONE 3x3 convolution over the space-to-depth input:
#
#   out[i,j] = max_{p,q in {0,1}} relu( sum_{u,v} k[u,v] x[2i+p+u, 2j+q+v] + b )
#
# With coarse taps s and input phases pi, the fine tap index is
# u = 2s + pi - p (|u| <= 2), giving a [3,3,4Cin,4Cout] kernel built by
# gathering from the zero-padded 5x5 kernel. Zero 'same' padding on the
# fine grid equals zero padding of the phase grid, so — unlike the
# reflect-padded decoder stage above — NO boundary corrections are needed;
# the equivalence is exact everywhere. relu commutes with max (monotone),
# so the phase maximum can be taken after the activation.
# ---------------------------------------------------------------------------


def _space_to_depth2(x: jax.Array) -> jax.Array:
    """[B, 2n, 2m, C] -> [B, n, m, 4C] with channel order (p, q, c)."""
    B, H, W, C = x.shape
    y = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(B, H // 2, W // 2, 4 * C)


def _phase_gather_5to3(k5: jax.Array) -> jax.Array:
    """[5,5,Cin,Cout] -> [3,3,4Cin,4Cout] phase kernel (order (p,q) out,
    (pi,qi) in, channel-minor)."""
    Cin, Cout = k5.shape[2], k5.shape[3]
    kpad = jnp.pad(k5, ((1, 1), (1, 1), (0, 0), (0, 0)))  # index u+3, u in [-3,3]
    s = np.arange(-1, 2)
    p = np.arange(2)
    # I[s, pi, p] = 2s + pi - p + 3  in [0, 6]
    idx = (2 * s[:, None, None] + p[None, :, None] - p[None, None, :]) + 3
    kk = kpad[idx][:, :, :, idx]  # [s,pi,p, t,qi,q, Cin, Cout]
    kk = jnp.transpose(kk, (0, 3, 1, 4, 6, 2, 5, 7))  # [s,t,pi,qi,Cin,p,q,Cout]
    return kk.reshape(3, 3, 4 * Cin, 4 * Cout)


def _pconv(xs: jax.Array, k: jax.Array) -> jax.Array:
    """The phase conv: [B, n, m, 4Cin] x [3, 3, 4Cin, 4Cout], pad 1."""
    return jax.lax.conv_general_dilated(
        xs, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _routed_pmax(yb: jax.Array, g: jax.Array, Cout: int):
    """(max over phase blocks, cotangent routed to the FIRST maximal phase).

    Torch MaxPool2d's tie convention (indices scan the window row-major,
    first max wins) — which autodiff's even tie-splitting did NOT match;
    with bf16 compute, relu-floor ties are common, and first-wins is also
    what made training bit-deterministic across process boundaries (the
    resume gate in tests/test_scripts.py). Pass g=None for forward only.
    """
    y0 = yb[..., :Cout]
    y1 = yb[..., Cout : 2 * Cout]
    y2 = yb[..., 2 * Cout : 3 * Cout]
    y3 = yb[..., 3 * Cout :]
    m01 = jnp.maximum(y0, y1)
    m23 = jnp.maximum(y2, y3)
    out = jnp.maximum(m01, m23)
    if g is None:
        return out, None
    zero = jnp.zeros((), g.dtype)
    left = m01 >= m23  # ties go left (earlier phase)
    g01 = jnp.where(left, g, zero)
    g23 = jnp.where(left, zero, g)
    first0 = y0 >= y1
    first2 = y2 >= y3
    d = jnp.concatenate(
        [
            jnp.where(first0, g01, zero),
            jnp.where(first0, zero, g01),
            jnp.where(first2, g23, zero),
            jnp.where(first2, zero, g23),
        ],
        axis=-1,
    )
    return out, d


@jax.custom_vjp
def _conv_relu_pmax(xs, k, b4):
    """max-over-phases(relu(conv(xs, k) + b4)) with a recompute VJP.

    Autodiff of the conv -> bias -> relu -> phase-max chain saves the
    four post-relu phase tensors ([2B, H/2, W/2, 4Cout]) as residuals and
    lowers the max/relu backward into half a dozen separate mask/select
    fusions (measured ~12 us/patch total via scripts/trace_ops.py). This
    custom VJP saves ONLY (xs, k, b4), recomputes the conv forward in the
    backward pass (one extra MXU pass — the phase convs are the model's
    cheapest FLOPs-per-byte work), routes the pool cotangent first-wins
    (_routed_pmax), replays relu's own VJP rule, and feeds the conv VJP
    primitives unchanged — one fused routing kernel instead of the mask
    fest, and no phase-tensor residual round-trip.
    """
    yb = jax.nn.relu(_pconv(xs, k) + b4)
    return _routed_pmax(yb, None, k.shape[-1] // 4)[0]


def _crp_fwd(xs, k, b4):
    return _conv_relu_pmax(xs, k, b4), (xs, k, b4)


def _crp_bwd(res, g):
    xs, k, b4 = res
    conv_out, conv_vjp = jax.vjp(_pconv, xs, k)
    y = conv_out + b4
    yb, relu_vjp = jax.vjp(jax.nn.relu, y)
    _, d_yb = _routed_pmax(yb, g, k.shape[-1] // 4)
    (d_y,) = relu_vjp(d_yb)  # JAX's own relu rule (zero gradient at y == 0)
    d_xs, d_k = conv_vjp(d_y)
    return d_xs, d_k, jnp.sum(d_y, axis=(0, 1, 2))


_conv_relu_pmax.defvjp(_crp_fwd, _crp_bwd)


def fused_conv5_relu_maxpool(x: jax.Array, k5: jax.Array, b: jax.Array) -> jax.Array:
    """Exact MaxPool2(ReLU(Conv5x5(x, pad='same', bias=b))), NHWC, H,W even.

    x: [B, H, W, Cin]; k5: [5, 5, Cin, Cout]; b: [Cout].
    Returns [B, H/2, W/2, Cout] computed entirely at half resolution.
    """
    xs = _space_to_depth2(x)  # [B, H/2, W/2, 4Cin]
    k = _phase_gather_5to3(k5)
    return _conv_relu_pmax(xs, k, jnp.tile(b, 4))
