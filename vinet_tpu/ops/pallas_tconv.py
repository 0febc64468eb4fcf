"""Pallas TPU kernel: temporal (k,1,1) 3-D convolution as MXU matmuls.

XLA's conv codegen runs the S3D temporal convs at ~15 TF/s on v5e in both
its 3-D and 2-D-folded forms (scripts/exp_conv_variants.py: stem (7,1,1)s2
21.5 ms / 14.7 TF/s at B=16) — far off the MXU roofline even though the op
is a pure channel contraction. This kernel restates it as matmuls:

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


def _pick_m_tile(m: int, merged: bool) -> int:
    """Pixel-tile size. Mosaic requires the LAST block dim be a multiple of
    128 (or the full array dim): in the merged layout M is last, so tiles
    must be 128-multiples (or m itself, if small); in the accum layout C is
    last (always full), so M tiles only need sublane (8) alignment."""
    cands = (512, 384, 256, 128) if merged else (512, 448, 384, 336, 256, 192, 128, 96, 64, 32, 16, 8)
    for cand in cands:
        if m % cand == 0:
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


@functools.partial(jax.jit, static_argnames=("stride", "pad", "merged", "interpret"))
def _tconv_pallas_fwd(x, w, *, stride, pad, merged, interpret=False):
    from jax.experimental import pallas as pl

    b, t, h, ww, c = x.shape
    k_taps, cout = w.shape[0], w.shape[-1]
    m = h * ww
    m_tile = _pick_m_tile(m, merged)
    t_out = (t + 2 * pad - k_taps) // stride + 1
    w3 = w.reshape(k_taps, c, cout).astype(x.dtype)

    xm = x.reshape(b, t, m, c)
    if pad:
        xm = jnp.pad(xm, ((0, 0), (pad, pad), (0, 0), (0, 0)))
    tp = xm.shape[1]

    if merged:
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


def temporal_conv3d(x, w, *, stride: int, pad: int, merged: bool | None = None):
    """Dispatch: Pallas on TPU backends (when the pixel count tiles), XLA
    elsewhere. x: (B,T,H,W,C); w: (K,1,1,C,Cout); returns f32-accumulated
    conv in x.dtype."""
    # DEFAULT OFF: the accum formulation measured SLOWER end-to-end inside
    # the full model (148 vs 192 fps, BENCH A/B r2) — opt-in until a variant
    # beats XLA both isolated and fused.
    if os.environ.get("VINET_PALLAS_TCONV", "0") == "0":
        return _xla_tconv(x, w, stride, pad)
    if jax.default_backend() not in ("tpu", "axon"):
        return _xla_tconv(x, w, stride, pad)
    b, t, h, ww, c = x.shape
    if merged is None:
        merged = os.environ.get("VINET_PALLAS_TCONV_MERGED", "1") == "1"
    if _pick_m_tile(h * ww, merged) == 0:
        merged = not merged  # the other layout may still tile
        if _pick_m_tile(h * ww, merged) == 0:
            return _xla_tconv(x, w, stride, pad)
    return _tconv(x, w.reshape(w.shape[0], c, w.shape[-1]), stride, pad, merged)
