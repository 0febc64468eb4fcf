"""Convolution / pooling primitives in TPU-native layouts.

Layouts: activations NDHWC (batch, time, H, W, C); weights DHWIO
(kT, kH, kW, in, out). XLA maps these onto the MXU directly — no layout
transposes at runtime.

Semantics match the reference's torch ops where it matters for checkpoint
parity (reference: /root/reference/model_utils.py:128-160 Conv3d/MaxPool3d
usage): symmetric zero padding, floor output sizes, -inf padding for maxpool.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


def _triple(v) -> tuple:
    if isinstance(v, (tuple, list)):
        assert len(v) == 3
        return tuple(v)
    return (v, v, v)


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
    """
    stride = _triple(stride)
    pad = _triple(padding)
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=[(p, p) for p in pad],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)


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
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
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
    floor output size (ceil_mode=False)."""
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
