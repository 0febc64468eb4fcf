"""Trilinear (1,2,2) upsampling as a fixed 2-tap stencil.

The reference decoder upsamples with nn.Upsample(scale_factor=(1,2,2),
mode='trilinear', align_corners=False) (/root/reference/model.py:254). With a
fixed scale of exactly 2 and half-pixel centers, trilinear interpolation
degenerates to a constant 2-tap filter per axis:

    out[2i]   = 0.25 * in[clamp(i-1)] + 0.75 * in[i]
    out[2i+1] = 0.75 * in[i]          + 0.25 * in[clamp(i+1)]

(derivation: out coord j maps to input x = (j+0.5)/2 - 0.5 = j/2 - 0.25).

Expressing it this way — shifted adds + an interleave reshape — instead of a
general gather-based resize keeps the op fully vectorized on the VPU and lets
XLA fuse it with the surrounding convs. Exactly matches torch's trilinear
output (see tests/test_ops.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _upsample2x_axis(x: jax.Array, axis: int) -> jax.Array:
    """Linear 2x upsample along `axis` with half-pixel convention, edge clamp."""
    xm = jnp.concatenate(
        [lax_slice(x, axis, 0, 1), lax_slice(x, axis, 0, x.shape[axis] - 1)], axis=axis
    )  # in[i-1] with clamp
    xp = jnp.concatenate(
        [lax_slice(x, axis, 1, x.shape[axis]), lax_slice(x, axis, x.shape[axis] - 1, x.shape[axis])],
        axis=axis,
    )  # in[i+1] with clamp
    even = 0.25 * xm + 0.75 * x
    odd = 0.75 * x + 0.25 * xp
    stacked = jnp.stack([even, odd], axis=axis + 1)  # (..., L, 2, ...)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * x.shape[axis]
    return stacked.reshape(new_shape).astype(x.dtype)


def lax_slice(x: jax.Array, axis: int, start: int, stop: int) -> jax.Array:
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(start, stop)
    return x[tuple(idx)]


def upsample2x_hw(x: jax.Array) -> jax.Array:
    """Upsample an NDHWC tensor by 2x in H and W (time untouched).

    Two lowerings of the same half-pixel 2-tap stencil (torch-exact at f32,
    tests/test_ops.py covers both):
    - stack: shifted adds + interleave reshape (the original formulation).
    - resize: XLA's own jax.image.resize(trilinear) — measured 1.3-2.6x
      faster ISOLATED at every decoder-stage geometry (scripts/exp_up_r4.py:
      e.g. 56x96x64 5.85 -> 2.40 ms, 28x48x192 2.89 -> 1.11 ms at B=16; the
      stack form's (W,2,C)->(2W,C) interleave relayouts the tiled W dim).
      The end-to-end A/B (NOTES.md r4: 230.2 -> 239.8 fps) made resize the
      DEFAULT; VINET_UP_RESIZE=0 restores the stack form.
    """
    import os

    if os.environ.get("VINET_UP_RESIZE", "1") == "1":
        b, t, h, w, c = x.shape
        return jax.image.resize(
            x, (b, t, 2 * h, 2 * w, c), method="trilinear").astype(x.dtype)
    x = _upsample2x_axis(x, axis=2)  # H
    x = _upsample2x_axis(x, axis=3)  # W
    return x
