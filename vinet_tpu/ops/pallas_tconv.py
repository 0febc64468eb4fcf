"""Pallas TPU kernel: temporal (k,1,1) 3-D convolution as MXU matmuls.

XLA's conv codegen runs the S3D temporal convs at ~15 TF/s on v5e in both
its 3-D and 2-D-folded forms (scripts/exp_conv_variants.py: stem (7,1,1)s2
21.5 ms / 14.7 TF/s at B=16) — far off the MXU roofline even though the op
is a pure channel contraction. This kernel restates it as matmuls:

ROUND-3 VERDICT — keep XLA (VINET_PALLAS_TCONV=0). The 15 TF/s is the
MXU-WIDTH bound, not bad codegen: with cout=64 only half the MXU's 128
output lanes are used, so the N<=128-one-pass cost model gives
M*ceil(K/128) cycles/frame ~= 18 ms for the parity stem-t — XLA's 21 ms is
within ~15% of it. All four kernel formulations measured at or below XLA
on hardware (scripts/exp_tconv3.py + /tmp A/Bs, interleaved-timed):
accum 21.1 / concat 21.0 / pmerge 28.8 / pair 28.8-30.0 vs XLA 20.8-22.3 ms.
The only levers left are int8 (Mosaic int8 dot_general does NOT compile on
this toolchain — remote compile helper exit 1) and architectural change.
The kernels stay as measured, interpret-exact negatives.

    y[b, to, m, co] = sum_{k, ci} x[b, to*st + k, m, ci] * w[k, ci, co]

with m = flattened H*W pixels. Two formulations, selected by `merged`:
  * accum:  per output frame, K matmuls (M_TILE, C) @ (C, Cout) — natural
    NDHWC layout, no pre-transpose; MXU contraction K = C.
  * merged: input pre-transposed to (B, T, C, M); per output frame ONE
    matmul contracting K*C at once: (K*C, M_TILE)^T-style dot_general —
    bigger MXU K at the cost of a one-off transpose.

The kernel is the conv only (no bias/activation): XLA fuses the following
+bias+ReLU into one cheap elementwise pass, and the backward pass reuses
XLA's conv gradients via jax.custom_vjp (exact, training-safe).

Reference semantics being reproduced: SepConv3d's temporal conv
(/root/reference/model_utils.py:153-156), zero 'same'-style padding.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _xla_tconv(x, w, stride, pad):
    """Reference XLA implementation (and the VJP source). x: (B,T,H,W,C);
    w: (K,1,1,C,Cout) or (K,C,Cout)."""
    from vinet_tpu.ops.conv import conv_f32acc

    if w.ndim == 3:
        w = w[:, None, None]
    return conv_f32acc(
        x, w.astype(x.dtype), strides=(stride, 1, 1),
        padding=[(pad, pad), (0, 0), (0, 0)],
        dn=("NDHWC", "DHWIO", "NDHWC"),
    ).astype(x.dtype)


def _pick_m_tile(m: int, merged: bool, *, tp: int = 0, c_pad: int = 0) -> int:
    """Pixel-tile size. Mosaic requires the LAST block dim be a multiple of
    128 (or the full array dim): in the merged layout M is last, so tiles
    must be 128-multiples (or m itself, if small); in the accum layout C is
    last (always full), so M tiles only need sublane (8) alignment.

    tp/c_pad (padded T extent and lane-padded channel count), when given,
    cap the tile so one (1, tp, m_tile, c) input block stays <= ~4 MB —
    blocks carry the FULL T extent, and long-T streaming shapes otherwise
    blow the 16 MB VMEM scoped limit (measured: t=134, m_tile=512 -> 17.6MB
    stack OOM)."""
    cands = (512, 384, 256, 128) if merged else (512, 448, 384, 336, 256, 192, 128, 96, 64, 32, 16, 8)
    budget = 4 * 1024 * 1024
    for cand in cands:
        if m % cand == 0:
            if tp and c_pad and tp * cand * c_pad * 2 > budget:
                continue
            return cand
    if merged and m <= 2048:
        return m
    return 0


def _kernel_accum(x_ref, w_ref, out_ref, *, k_taps, stride, t_out):
    for to in range(t_out):
        acc = jnp.zeros((x_ref.shape[2], w_ref.shape[2]), jnp.float32)
        for k in range(k_taps):
            acc = acc + jnp.dot(
                x_ref[0, to * stride + k], w_ref[k],
                preferred_element_type=jnp.float32,
            )
        out_ref[0, to] = acc.astype(out_ref.dtype)


def _kernel_merged(x_ref, w_ref, out_ref, *, k_taps, stride, t_out):
    kc = k_taps * x_ref.shape[2]
    for to in range(t_out):
        lhs = x_ref[0, to * stride : to * stride + k_taps].reshape(kc, x_ref.shape[3])
        acc = jax.lax.dot_general(
            lhs, w_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (M_TILE, Cout)
        out_ref[0, to] = acc.astype(out_ref.dtype)


def _kernel_tconcat(x_ref, w_ref, out_ref, *, k_taps, stride, t_out):
    """ONE (M_TILE, K*C) x (K*C, Cout) matmul per output frame: the K taps
    are concatenated on the lane axis in VMEM (T is an untiled block dim, so
    the tap reads are offset-0 — Mosaic accepts the concat). Fixes the accum
    formulation's 15 TF/s ceiling: K taps of K=C matmuls are MXU
    pipeline-bound, a single K*C contraction is not."""
    for to in range(t_out):
        lhs = jnp.concatenate(
            [x_ref[0, to * stride + k] for k in range(k_taps)], axis=-1)
        acc = jax.lax.dot_general(
            lhs, w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, to] = acc.astype(out_ref.dtype)


def _kernel_tpair(x_ref, w_ref, out_ref, *, k_taps, t_pairs):
    """Stride-2 variant packing TWO output frames into the MXU's 128 output
    lanes (cout=64 alone leaves half the MXU width idle — the measured
    ~15 TF/s wall on the stem temporal conv). Outputs (2j, 2j+1) read the
    tap union x[4j .. 4j+k_taps+1] (k_taps+2 taps); rhs is the paired
    weight W9[(k',ci),(q,co)] built in temporal_conv3d. K grows by
    (k+2)/k in zeros — far less waste than the 2x of the phase-merged
    block-diagonal form."""
    c = x_ref.shape[3]
    for j in range(t_pairs):
        lhs = jnp.concatenate(
            [x_ref[0, 4 * j + k] for k in range(k_taps + 2)], axis=-1)
        acc = jax.lax.dot_general(
            lhs, w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (M_TILE, 2*cout)
        cout = acc.shape[-1] // 2
        out_ref[0, 2 * j] = acc[:, :cout].astype(out_ref.dtype)
        out_ref[0, 2 * j + 1] = acc[:, cout:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("stride", "pad", "merged", "interpret"))
def _tconv_pallas_fwd(x, w, *, stride, pad, merged, interpret=False):
    from jax.experimental import pallas as pl

    b, t, h, ww, c = x.shape
    if merged == "pair":  # w arrives paired: (k_taps+2, c, 2*cout)
        k_taps, cout = w.shape[0] - 2, w.shape[-1] // 2
        w3 = None
    else:
        k_taps, cout = w.shape[0], w.shape[-1]
        w3 = w.reshape(k_taps, c, cout).astype(x.dtype)
    m = h * ww
    c_pad = -(-c // 128) * 128
    m_tile = _pick_m_tile(m, merged is True, tp=t + 2 * pad, c_pad=c_pad)
    t_out = (t + 2 * pad - k_taps) // stride + 1

    xm = x.reshape(b, t, m, c)
    if pad:
        xm = jnp.pad(xm, ((0, 0), (pad, pad), (0, 0), (0, 0)))
    tp = xm.shape[1]

    if merged == "pair":
        # stride-2 only; w arrives PRE-PAIRED: (k_taps+2)*c x 2*cout, where
        # w's logical tap count is k_taps (cout = w.shape[-1] // 2 here)
        assert stride == 2, stride
        t_pairs = t_out // 2
        # input frames consumed: 4*(t_pairs-1) + k_taps + 2 <= tp required
        need = 4 * (t_pairs - 1) + k_taps + 2
        if need > tp:
            xm = jnp.pad(xm, ((0, 0), (0, need - tp), (0, 0), (0, 0)))
            tp = need
        kern = functools.partial(_kernel_tpair, k_taps=k_taps, t_pairs=t_pairs)
        w_arg = w.reshape((k_taps + 2) * c, 2 * cout).astype(x.dtype)
        in_spec_x = pl.BlockSpec((1, tp, m_tile, c), lambda i, j: (i, 0, j, 0))
        in_spec_w = pl.BlockSpec(((k_taps + 2) * c, 2 * cout), lambda i, j: (0, 0))
    elif merged == "concat":
        kern = functools.partial(_kernel_tconcat, k_taps=k_taps, stride=stride, t_out=t_out)
        w_arg = w3.reshape(k_taps * c, cout)
        in_spec_x = pl.BlockSpec((1, tp, m_tile, c), lambda i, j: (i, 0, j, 0))
        in_spec_w = pl.BlockSpec((k_taps * c, cout), lambda i, j: (0, 0))
    elif merged:
        xm = jnp.swapaxes(xm, 2, 3)  # (B, Tp, C, M)
        kern = functools.partial(_kernel_merged, k_taps=k_taps, stride=stride, t_out=t_out)
        w_arg = w3.reshape(k_taps * c, cout)
        in_spec_x = pl.BlockSpec((1, tp, c, m_tile), lambda i, j: (i, 0, 0, j))
        in_spec_w = pl.BlockSpec((k_taps * c, cout), lambda i, j: (0, 0))
    else:
        kern = functools.partial(_kernel_accum, k_taps=k_taps, stride=stride, t_out=t_out)
        w_arg = w3
        in_spec_x = pl.BlockSpec((1, tp, m_tile, c), lambda i, j: (i, 0, j, 0))
        in_spec_w = pl.BlockSpec((k_taps, c, cout), lambda i, j: (0, 0, 0))

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, t_out, m, cout), x.dtype),
        grid=(b, m // m_tile),
        in_specs=[in_spec_x, in_spec_w],
        out_specs=pl.BlockSpec((1, t_out, m_tile, cout), lambda i, j: (i, 0, j, 0)),
        interpret=interpret,
    )(xm, w_arg)
    return out.reshape(b, t_out, h, ww, cout)


def _pair_weight(w3):
    """(k, c, cout) -> (k+2, c, 2*cout): rhs for the frame-pair kernel.
    Column block q holds output frame 2j+q, whose taps sit at k' = k + 2q."""
    k, c, cout = w3.shape
    w9 = jnp.zeros((k + 2, c, 2 * cout), w3.dtype)
    w9 = w9.at[:k, :, :cout].set(w3)
    w9 = w9.at[2:, :, cout:].set(w3)
    return w9


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _tconv_pair(x, w3, pad):
    interp = os.environ.get("VINET_PALLAS_INTERPRET", "0") == "1"
    return _tconv_pallas_fwd(x, _pair_weight(w3), stride=2, pad=pad,
                             merged="pair", interpret=interp)


def _tconv_pair_fwd(x, w3, pad):
    return _tconv_pair(x, w3, pad), (x, w3)


def _tconv_pair_bwd(pad, res, g):
    x, w3 = res
    _, vjp = jax.vjp(lambda xx, ww: _xla_tconv(xx, ww, 2, pad), x, w3)
    return vjp(g.astype(x.dtype))


_tconv_pair.defvjp(_tconv_pair_fwd, _tconv_pair_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _tconv(x, w, stride, pad, merged):
    interp = os.environ.get("VINET_PALLAS_INTERPRET", "0") == "1"
    return _tconv_pallas_fwd(x, w, stride=stride, pad=pad, merged=merged,
                             interpret=interp)


def _tconv_fwd(x, w, stride, pad, merged):
    return _tconv(x, w, stride, pad, merged), (x, w)


def _tconv_bwd(stride, pad, merged, res, g):
    x, w = res
    # exact gradients via XLA's conv VJP (the kernel is numerically the same
    # contraction; bf16 fwd / XLA bwd matches the non-Pallas training path)
    _, vjp = jax.vjp(lambda xx, ww: _xla_tconv(xx, ww, stride, pad), x, w)
    dx, dw = vjp(g.astype(x.dtype))
    return dx, dw


_tconv.defvjp(_tconv_fwd, _tconv_bwd)


def temporal_conv3d(x, w, *, stride: int, pad: int, merged=None):
    """Dispatch: Pallas on TPU backends (when the pixel count tiles), XLA
    elsewhere. x: (B,T,H,W,C); w: (K,1,1,C,Cout); returns f32-accumulated
    conv in x.dtype.

    VINET_PALLAS_TCONV selects the formulation:
      0      XLA conv (measured ~15 TF/s on the S3D temporal convs)
      accum  per-tap K=C matmuls (r2 formulation; MXU pipeline-bound, lost)
      merged pre-transposed (B,T,C,M) one-matmul (XLA transpose cost)
      concat in-kernel lane-concat of the K taps -> ONE K*C-contraction
             matmul per frame, natural layout, no pre-transpose
      pmerge (default when =1) concat + free (W,C)->(W/2,2C) phase merge:
             full-128-lane DMAs with a block-diagonal doubled weight"""
    mode = os.environ.get("VINET_PALLAS_TCONV", "0")
    if mode == "0":
        return _xla_tconv(x, w, stride, pad)
    if jax.default_backend() not in ("tpu", "axon"):
        return _xla_tconv(x, w, stride, pad)
    b, t, h, ww, c = x.shape
    k_taps, cout = w.shape[0], w.shape[-1]
    w3 = w.reshape(k_taps, c, cout)
    if merged is None:
        merged = {"accum": False, "merged": True, "concat": "concat",
                  "pair": "pair"}.get(mode, "pmerge")
    c_pad = -(-c // 128) * 128
    if merged == "pair":
        t_out = (t + 2 * pad - k_taps) // stride + 1
        if (stride == 2 and t_out % 2 == 0
                and _pick_m_tile(h * ww, False, tp=t + 2 * pad + 2,
                                 c_pad=c_pad) != 0):
            return _tconv_pair(x, w3, pad)
        merged = "concat"
    if merged == "pmerge" and ww % 2 == 0 and c <= 64:
        x2 = x.reshape(b, t, h, ww // 2, 2 * c)
        z = jnp.zeros_like(w3)
        w2 = jnp.concatenate(
            [jnp.concatenate([w3, z], axis=2),
             jnp.concatenate([z, w3], axis=2)], axis=1)  # (k, 2c, 2cout)
        if _pick_m_tile(h * (ww // 2), False, tp=t + 2 * pad,
                        c_pad=-(-2 * c // 128) * 128) == 0:
            return _xla_tconv(x, w, stride, pad)
        out = _tconv(x2, w2, stride, pad, "concat")
        return out.reshape(b, out.shape[1], h, ww, cout)
    if merged == "pmerge":
        merged = "concat"
    if _pick_m_tile(h * ww, merged is True, tp=t + 2 * pad, c_pad=c_pad) == 0:
        return _xla_tconv(x, w, stride, pad)
    return _tconv(x, w3, stride, pad, merged)
