"""Convolution / pooling primitives in TPU-native layouts.

Layouts: activations NDHWC (batch, time, H, W, C); weights DHWIO
(kT, kH, kW, in, out). XLA maps these onto the MXU directly — no layout
transposes at runtime.

Semantics match the reference's torch ops where it matters for checkpoint
parity (reference: /root/reference/model_utils.py:128-160 Conv3d/MaxPool3d
usage): symmetric zero padding, floor output sizes, -inf padding for maxpool.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


def _triple(v) -> tuple:
    if isinstance(v, (tuple, list)):
        assert len(v) == 3
        return tuple(v)
    return (v, v, v)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _conv_pe(x, w, strides, padding, dn, lhs_dilation):
    return lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        lhs_dilation=lhs_dilation, dimension_numbers=dn,
        preferred_element_type=jnp.float32)


def _conv_pe_fwd(x, w, strides, padding, dn, lhs_dilation):
    return _conv_pe(x, w, strides, padding, dn, lhs_dilation), (x, w)


def _conv_pe_bwd(strides, padding, dn, lhs_dilation, res, g):
    x, w = res
    _, vjpf = jax.vjp(
        lambda a, b: lax.conv_general_dilated(
            a, b, window_strides=strides, padding=padding,
            lhs_dilation=lhs_dilation, dimension_numbers=dn), x, w)
    return vjpf(g.astype(x.dtype))


_conv_pe.defvjp(_conv_pe_fwd, _conv_pe_bwd)


def conv_f32acc(x, w, *, strides, padding, dn, lhs_dilation=None):
    """conv_general_dilated with f32 accumulation that is DIFFERENTIABLE in
    low precision. JAX's transpose rule for a conv carrying
    preferred_element_type=f32 receives the f32 cotangent and rejects it
    against bf16 operands (mixed-dtype TypeError); this wrapper keeps the
    f32-accumulated forward and runs the backward convs in the compute dtype
    (the standard mixed-precision recipe — backward also hits the MXU's 2x
    bf16 rate). f32 inputs take the plain primitive (identical numerics)."""
    lhs_dilation = lhs_dilation or (1,) * len(strides)
    if x.dtype == jnp.float32:
        return lax.conv_general_dilated(
            x, w, window_strides=strides, padding=padding,
            lhs_dilation=lhs_dilation, dimension_numbers=dn,
            preferred_element_type=jnp.float32)
    return _conv_pe(x, w, tuple(strides), tuple(tuple(p) for p in padding),
                    dn, tuple(lhs_dilation))


def conv3d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: Sequence[int] | int = 1,
    padding: Sequence[int] | int = 0,
    bias: jax.Array | None = None,
) -> jax.Array:
    """3-D convolution. x: (N, T, H, W, Cin); w: (kT, kH, kW, Cin, Cout).

    `padding` is symmetric per spatial dim (torch convention).
    Accumulates in f32 on the MXU regardless of input dtype.

    TPU dispatch: XLA's true 3-D conv path is 2-3x slower than its 2-D path
    on v5e (measured), so the factorized cases lower to 2-D convs:
      * spatial (1,kh,kw) kernels fold time into batch: (B*T, H, W, C)
      * temporal (kt,1,1) kernels fold space into width: (B, T, H*W, C)
    Both are exact reshapes of the same contraction (parity-tested vs torch).
    """
    stride = _triple(stride)
    pad = _triple(padding)
    kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]

    # Purely-spatial (kt==1) convs: fold T into batch and run XLA's 2-D conv
    # path, which is FAR faster than its true-3-D codegen for large spatial
    # planes / big channel counts (measured on v5e, scripts/exp_conv_variants:
    # stem 7x7 29.3->10.3 ms, sep_s 64->192 8.2->5.4 ms, decoder conv1
    # 6.1->0.4 ms; bit-exact). Small planes with mid-size channels are a tie
    # or slight loss (mixed @28x48: 2.40 vs 2.55 ms), hence the shape gate.
    # Round 1's GLOBAL lowering (incl. temporal convs) was slower end-to-end:
    # temporal (k,1,1) convs stay 3-D (2-D fold measured 7x worse @28x48).
    # Temporal-tiling convs (kt == stride_t, pad_t == 0): the strided windows
    # PARTITION the time axis, so (B, To*kt, H, W, C) -> (B*To, kt, H, W, C)
    # is a free reshape (major dims only) and the conv becomes VALID with the
    # window spanning all of T — no strided access for XLA's 3-D codegen to
    # mishandle. This is every decoder stage (models/decoder.py plans all
    # have kt==st; reference model.py:253-264). Verdict of the
    # scripts/exp_dec_r4.py study (NOTES "Decoder conv roofline"): per-op
    # wins (conv2 140->155 TF/s, unfolded conv5 9.9->3.8 ms) but parity
    # end-to-end LOSES 230->204 fps — the reshapes break XLA's
    # conv+relu+concat fusions, same story as round 1's global 2-D
    # lowering. Stays opt-in (VINET_TMERGE=1) for graphs dominated by the
    # unfolded conv5 (it is phase-folded in parity inference anyway).
    if (kt > 1 and stride[0] == kt and pad[0] == 0 and x.shape[1] % kt == 0
            and os.environ.get("VINET_TMERGE", "0") == "1"):
        b, t, h, ww, c = x.shape
        to = t // kt
        x2 = x.reshape(b * to, kt, h, ww, c)
        out = conv_f32acc(
            x2,
            w.astype(x.dtype),
            strides=(1, stride[1], stride[2]),
            padding=[(0, 0), (pad[1], pad[1]), (pad[2], pad[2])],
            dn=("NDHWC", "DHWIO", "NDHWC"),
        )
        out = out.reshape(b, to, *out.shape[2:])
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out.astype(x.dtype)

    if _lower_spatial_to_2d(x.shape, w.shape) and kt == 1 and stride[0] == 1 and pad[0] == 0:
        b, t, h, ww, c = x.shape
        x2, w2 = x.reshape(b * t, h, ww, c), w[0]
        if c == 3 and os.environ.get("VINET_CIN4", "1") == "1":
            # Pad RGB to 4 channels (zero channel x zero weights — exact):
            # XLA's 2-D conv path runs the 224x384 stem 28% faster at Cin=4
            # than Cin=3 (1.50 vs 2.09 ms on the streaming timeline,
            # scripts/exp_stem_r3.py).
            x2 = jnp.pad(x2, ((0, 0), (0, 0), (0, 0), (0, 1)))
            w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, 1), (0, 0)))
        out = conv_f32acc(
            x2,
            w2.astype(x.dtype),
            strides=stride[1:],
            padding=[(pad[1], pad[1]), (pad[2], pad[2])],
            dn=("NHWC", "HWIO", "NHWC"),
        )
        out = out.reshape(b, t, *out.shape[1:])
    else:
        # Temporal (k,1,1) convs stay on XLA's 3-D path: its ~15 TF/s on the
        # 64-channel S3D stem is the MXU-WIDTH bound (cout=64 fills half the
        # 128 output lanes; the N<=128 cost model M*ceil(K/128) puts the
        # bound within ~15% of XLA's time). Four Pallas matmul formulations
        # and five exact XLA restatements all measured at or below it on
        # v5e — see NOTES.md "Temporal-conv MXU study" (round 3).
        out = conv_f32acc(
            x,
            w.astype(x.dtype),
            strides=stride,
            padding=[(p, p) for p in pad],
            dn=("NDHWC", "DHWIO", "NDHWC"),
        )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)


_LOWER2D_FORCE: list = []  # stack of numeric thresholds (see force_lower2d)


class force_lower2d:
    """Trace-time context: lower kt==1 spatial convs with pixel area >= the
    threshold to 2-D regardless of VINET_LOWER2D. Used by the streaming
    timeline, where the dense B=1/T=chunk stem conv measured 21.3 ms as a
    3-D conv vs 7.2 ms folded to a T-batch 2-D conv (parity mode keeps the
    3-D path: there the SAME lowering was slower e2e)."""

    def __init__(self, min_area: int):
        self.min_area = min_area

    def __enter__(self):
        _LOWER2D_FORCE.append(self.min_area)
        return self

    def __exit__(self, *exc):
        _LOWER2D_FORCE.pop()
        return False


def _lower_spatial_to_2d(x_shape, w_shape) -> bool:
    """Policy gate for the kt==1 2-D lowering. VINET_LOWER2D:
    off | all | auto (area>=5376 or cin>=512) | a number (min pixel area,
    no cin clause — e.g. 86016 lowers only the 224x384 stem conv).

    DEFAULT OFF: despite 1.5-15x isolated per-op wins (exp_conv_variants),
    every policy measured SLOWER e2e in PARITY mode (auto: 166 vs 192 fps)
    — the reshapes break XLA's cross-op fusion. The STREAMING timeline
    opts in via force_lower2d (measured 3x faster there)."""
    if _LOWER2D_FORCE and x_shape[2] * x_shape[3] >= _LOWER2D_FORCE[-1]:
        return True
    mode = os.environ.get("VINET_LOWER2D", "off")
    if mode == "off":
        return False
    if mode == "all":
        return True
    h, w_ = x_shape[2], x_shape[3]
    cin = w_shape[3]
    if mode == "auto":
        return h * w_ >= 56 * 96 or cin >= 512
    return h * w_ >= int(mode)


def conv1d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: int = 1,
    padding: int = 0,
    bias: jax.Array | None = None,
) -> jax.Array:
    """1-D convolution over the length axis. x: (N, L, Cin); w: (k, Cin, Cout).

    The reference's SoundNet expresses this as Conv2d with (k, 1) kernels over a
    (B, 1, L, 1) waveform (/root/reference/model.py:750-791); on TPU a plain
    NWC conv is the natural shape.
    """
    out = conv_f32acc(
        x,
        w.astype(x.dtype),
        strides=(stride,),
        padding=[(padding, padding)],
        dn=("NWC", "WIO", "NWC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)


def conv_transpose3d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: Sequence[int] | int = 1,
    padding: Sequence[int] | int = 0,
    bias: jax.Array | None = None,
) -> jax.Array:
    """Transposed 3-D conv with torch ConvTranspose3d semantics:
    out_len = (in_len - 1) * stride - 2 * padding + kernel.

    x: (N,T,H,W,Cin); w: (kT,kH,kW,Cin,Cout) — note IO order matches our
    conv3d convention (torch stores ConvTranspose weight as (Cin,Cout,k...)).
    Implemented as an input-dilated conv with a spatially-flipped kernel —
    a single lax.conv_general_dilated, MXU-native.
    """
    stride = _triple(stride)
    pad = _triple(padding)
    k = w.shape[:3]
    w_flipped = w[::-1, ::-1, ::-1]
    out = conv_f32acc(
        x,
        w_flipped.astype(x.dtype),
        strides=(1, 1, 1),
        padding=[(k[i] - 1 - pad[i], k[i] - 1 - pad[i]) for i in range(3)],
        lhs_dilation=stride,
        dn=("NDHWC", "DHWIO", "NDHWC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)


def maxpool3d(
    x: jax.Array,
    *,
    kernel: Sequence[int] | int,
    stride: Sequence[int] | int,
    padding: Sequence[int] | int = 0,
) -> jax.Array:
    """Max pooling over (T, H, W) of an NDHWC tensor. Torch semantics:
    symmetric padding that never participates in the max (pads with -inf),
    floor output size (ceil_mode=False).

    Stays on XLA's reduce_window: Pallas pool kernels won 2-5x ISOLATED on
    the S3D geometries but REGRESSED the full model both in parity mode
    (222 -> 206 fps) and in the streaming timelines (727 -> 687 maps/s) —
    the pallas_call fusion barrier costs more than the kernel wins for a
    bandwidth-bound op. Measured and pruned; see NOTES.md rounds 2-3."""
    k = _triple(kernel)
    s = _triple(stride)
    p = _triple(padding)
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, *k, 1),
        window_strides=(1, *s, 1),
        padding=[(0, 0)] + [(pp, pp) for pp in p] + [(0, 0)],
    )


def maxpool1d(x: jax.Array, *, kernel: int, stride: int, padding: int = 0) -> jax.Array:
    """Max pooling over the length axis of an NWC tensor."""
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, kernel, 1),
        window_strides=(1, stride, 1),
        padding=[(0, 0), (padding, padding), (0, 0)],
    )
