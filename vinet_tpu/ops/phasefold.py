"""Phase-folded "conv after 2x upsample": compute conv3d(upsample2x_hw(x), w)
without materializing the upsampled tensor.

The decoder's tail applies (kt,3,3) convs to trilinearly 2x-upsampled inputs
(reference: /root/reference/model.py:289-307 — upsampling(z) then
convtsp5/6/7). Upsample-then-conv is slow on TPU for two reasons: the
upsample materializes a 4x-larger tensor (HBM bandwidth), and the tail's
small channel counts (64/32) waste most of the 128-wide MXU lanes.

Both linear ops compose algebraically. With the fixed 2-tap trilinear
stencil (ops/upsample.py)

    u[2i]   = 0.25 a[i-1] + 0.75 a[i]        (a[-1] clamped to a[0])
    u[2i+1] = 0.75 a[i]   + 0.25 a[i+1]      (a[H]  clamped to a[H-1])

a 3-tap conv over u restricted to output phase p is a 3-tap conv over a:

    y[2i+p] = sum_m a[i+m-1] * c_p[m],   c_p[m] = sum_d A[p, m, d] w[d]

with the per-axis fold matrix A below. Folding both spatial axes turns
conv(up(x), w[kt,3,3,Cin,Cout]) into ONE conv at the coarse grid with
4*Cout output channels (the 2x2 phases) plus a depth-to-space interleave —
4x fewer pixels at 4x the MXU lane utilization, no upsampled intermediate.

Boundary exactness: the upsample CLAMPS while the conv ZERO-pads. The clamp
is handled for free by edge-padding the coarse input and running the folded
conv VALID. The conv's zero padding then needs corrections on the outermost
fine row/col only: the folded-VALID result uses the upsample's extrapolated
sample where the true conv saw a zero. The error terms are 1-D
conv-after-upsample problems over single boundary rows/cols (recursively
corrected at their own two endpoints) plus four scalar corner terms — a few
tiny convs, subtracted in place. tests/test_phasefold.py checks f32
exactness against upsample2x_hw + conv3d on every decoder geometry.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# A[p, m, d]: coefficient of fine-kernel tap d (at u[2i+p+d-1]) on coarse
# input a[i+m-1], for output phase p (interior formula).
_FOLD_A = np.array(
    [
        [[0.75, 0.25, 0.0], [0.25, 0.75, 0.75], [0.0, 0.0, 0.25]],
        [[0.25, 0.0, 0.0], [0.75, 0.75, 0.25], [0.0, 0.25, 0.75]],
    ],
    dtype=np.float32,
)  # (2, 3, 3)

# S[p, m]: pure upsample as a 3-tap VALID conv over the edge-padded coarse
# input: up2x(a)[2i+p] = sum_m ap[i+m] * S[p, m], ap = edge-pad(a, 1).
_UP_S = np.array([[0.25, 0.75, 0.0], [0.0, 0.75, 0.25]], dtype=np.float32)


def fold_weights_up2x(w: jax.Array) -> jax.Array:
    """w: (kt, 3, 3, Cin, Cout) -> folded (kt, 3, 3, Cin, 4*Cout); output
    channel order is (ph, pw, cout) — matching _depth_to_space below."""
    a = jnp.asarray(_FOLD_A)
    wf = jnp.einsum("hmd,wne,tdeio->tmnihwo", a, a, w.astype(jnp.float32))
    wf = wf.astype(w.dtype)
    kt, _, _, cin, _, _, cout = wf.shape
    return wf.reshape(kt, 3, 3, cin, 4 * cout)


def _depth_to_space(z: jax.Array, cout: int) -> jax.Array:
    """(B, T, H, W, 4*Cout) with channel (ph, pw, c) -> (B, T, 2H, 2W, Cout)."""
    b, t, h, w, _ = z.shape
    z = z.reshape(b, t, h, w, 2, 2, cout)
    z = jnp.moveaxis(z, (4, 5), (3, 5))  # (b, t, h, ph, w, pw, c)
    return z.reshape(b, t, 2 * h, 2 * w, cout)


def _conv(x, w, *, strides, padding):
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=strides, padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )


def _tconv(seq: jax.Array, wt: jax.Array, stride_t: int, pad_t: int) -> jax.Array:
    """Temporal-window contraction of a (B, T, ..., Cin) sequence with
    wt (kt, Cin, Cout) -> (B, T', ..., Cout) in f32."""
    lead = seq.shape[:2]
    rest = seq.shape[2:-1]
    cin = seq.shape[-1]
    x = seq.reshape(lead[0], lead[1], 1, -1, cin)
    w = wt.reshape(wt.shape[0], 1, 1, cin, wt.shape[-1])
    out = _conv(x, w, strides=(stride_t, 1, 1),
                padding=[(pad_t, pad_t), (0, 0), (0, 0)])
    return out.reshape(out.shape[0], out.shape[1], *rest, wt.shape[-1])


def _up1d_conv(arow: jax.Array, w1: jax.Array, stride_t: int, pad_t: int,
               *, end_fix: bool) -> jax.Array:
    """Exact 1-D conv-after-up2x along the last spatial axis.

    arow: (B, T, L, Cin); w1: (kt, 3, Cin, Cout) — the 3 taps act on the
    2x-upsampled (clamped) row. With end_fix=True the two fine endpoints
    match the conv's ZERO padding; with end_fix=False they keep the
    upsample's extrapolated sample there (what the 2-D folded-VALID pass
    reads — see conv_after_up2x's correction accounting).
    Returns (B, T', 2L, Cout) in f32.
    """
    a = jnp.asarray(_FOLD_A)
    # w1f: (kt, m=3, cin, p=2, cout)
    w1f = jnp.einsum("pmd,tdio->tmipo", a, w1.astype(jnp.float32))
    kt, _, cin, _, cout = w1f.shape
    wconv = w1f.reshape(kt, 1, 3, cin, 2 * cout)
    ap = jnp.pad(arow, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    z = _conv(ap[:, :, None], wconv, strides=(stride_t, 1, 1),
              padding=[(pad_t, pad_t), (0, 0), (0, 0)])
    # (B, T', 1, L, 2*cout) -> (B, T', 2L, cout)
    bt, tt = z.shape[0], z.shape[1]
    l = z.shape[3]
    y = z.reshape(bt, tt, l, 2, cout).reshape(bt, tt, 2 * l, cout)
    if end_fix:
        c0 = _tconv(arow[:, :, 0], w1[:, 0], stride_t, pad_t)
        cl = _tconv(arow[:, :, -1], w1[:, 2], stride_t, pad_t)
        y = y.at[:, :, 0].add(-c0).at[:, :, -1].add(-cl)
    return y


def phase_up2x(z: jax.Array) -> jax.Array:
    """Exact 2x trilinear upsample in PHASE layout: (B,T,H,W,C) ->
    (B,T,H,W,4*C) with channel (ph*2+pw, c) == upsample2x_hw(z)[..., 2i+ph,
    2j+pw, c]. A pure permutation of the fine grid — elementwise ops and
    per-channel contractions commute with it."""
    zp = jnp.pad(z, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    zc = zp[:, :, 1:-1, 1:-1]
    h0 = 0.25 * zp[:, :, :-2, 1:-1] + 0.75 * zc
    h1 = 0.75 * zc + 0.25 * zp[:, :, 2:, 1:-1]

    def wtap(a):
        ap = jnp.pad(a, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
        return (0.25 * ap[:, :, :, :-2] + 0.75 * a,
                0.75 * a + 0.25 * ap[:, :, :, 2:])

    u00, u01 = wtap(h0)
    u10, u11 = wtap(h1)
    return jnp.concatenate([u00, u01, u10, u11], axis=-1).astype(z.dtype)


def up_stencil() -> np.ndarray:
    """S (2, 3): the 2x upsample as a 3-tap VALID conv over the edge-padded
    coarse input — up2x(a)[2i+p] = sum_m edgepad(a)[i+m] * S[p, m]. Used to
    compose the upsample into a following spatially-1x1 contraction
    (decoder phase tail), where edge padding alone makes it exact."""
    return np.asarray(_UP_S)


def conv_after_up2x(
    x: jax.Array,
    w: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride_t: int = 1,
    pad_t: int = 0,
) -> jax.Array:
    """Exactly conv3d(upsample2x_hw(x), w, stride=(stride_t,1,1),
    padding=(pad_t,1,1), bias=bias), computed at the coarse grid.

    x: (B, T, H, W, Cin); w: (kt, 3, 3, Cin, Cout).
    Returns (B, T', 2H, 2W, Cout) in x.dtype.
    """
    cout = w.shape[-1]
    wf = fold_weights_up2x(w)
    ap = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    z = _conv(ap, wf, strides=(stride_t, 1, 1),
              padding=[(pad_t, pad_t), (0, 0), (0, 0)])

    # Boundary corrections (see module docstring): the folded-VALID pass
    # used the upsample's extrapolated sample where the true conv zero-pads.
    # Row terms collect ALL dh=0 / dh=2 taps on the outermost fine rows
    # (no end fixes — the 2-D pass read extrapolated values at the corners
    # too); column terms collect the remaining dw=0 / dw=2 taps, whose
    # endpoint taps were already counted by the row terms (end_fix=True).
    wf32 = w.astype(jnp.float32)
    row0 = _up1d_conv(x[:, :, 0], wf32[:, 0], stride_t, pad_t, end_fix=False)
    rowl = _up1d_conv(x[:, :, -1], wf32[:, 2], stride_t, pad_t, end_fix=False)
    col0 = _up1d_conv(x[:, :, :, 0], wf32[:, :, 0], stride_t, pad_t, end_fix=True)
    coll = _up1d_conv(x[:, :, :, -1], wf32[:, :, 2], stride_t, pad_t, end_fix=True)

    # Apply on the COARSE phase-major tensor, before depth-to-space: the
    # fine boundary rows/cols live in thin contiguous-channel slices of z
    # (fine row 0 = (h=0, ph=0) = channels [0:2C); fine col 0 = (w=0, pw=0)
    # = channels [0:C) and [2C:3C); analogously for the far edges), so each
    # update touches a 1-px strip instead of scattering into the 4x-larger
    # fine tensor. Measured 4.4 -> 2.6 ms at the conv5 geometry
    # (scripts/exp_tailcorr_r4.py); bit-exact with the fine-grid form.
    b, tt, h, wd, _ = z.shape
    r0 = row0.reshape(b, tt, wd, 2 * cout)  # fine (2W, C) -> (W, pw*C)
    rl = rowl.reshape(b, tt, wd, 2 * cout)
    z = z.at[:, :, 0, :, 0:2 * cout].add(-r0)
    z = z.at[:, :, h - 1, :, 2 * cout:4 * cout].add(-rl)
    c0 = col0.reshape(b, tt, h, 2, cout)  # fine (2H, C) -> (H, ph, C)
    cl = coll.reshape(b, tt, h, 2, cout)
    z = z.at[:, :, :, 0, 0:cout].add(-c0[..., 0, :])
    z = z.at[:, :, :, 0, 2 * cout:3 * cout].add(-c0[..., 1, :])
    z = z.at[:, :, :, wd - 1, cout:2 * cout].add(-cl[..., 0, :])
    z = z.at[:, :, :, wd - 1, 3 * cout:4 * cout].add(-cl[..., 1, :])

    y = _depth_to_space(z, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)
