"""Pallas TPU kernel: fused saliency head.

The decoder tail runs at full map resolution and is memory-bound: conv6
((kt,1,1) temporal collapse, 32->32) + ReLU + conv7 (1x1x1, 32->1) + sigmoid
+ squeeze (reference DecoderConvUp convtsp4 tail, model.py:280-283). As
separate XLA ops this chain re-reads the (B, kt, H, W, 32) activation from
HBM several times; the Pallas kernel makes ONE pass: each grid step loads an
(kt, TILE_H, W, 32) block into VMEM, contracts the temporal taps as 32x32
matmuls on the MXU, applies relu/1x1/sigmoid on the VPU, and writes the
(TILE_H, W) map slice.

Used on the TPU backend; a pure-JAX fallback with identical semantics covers
CPU tests (and is the reference implementation the kernel is tested against).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def saliency_head_reference(z, w6, b6, w7, b7):
    """Pure-JAX semantics: z (B, kt, H, W, C); w6 (kt, C, C2); w7 (C2,);
    returns (B, H, W) sigmoid map. b6 may be None."""
    h = jnp.einsum("bthwc,tcd->bhwd", z.astype(jnp.float32), w6.astype(jnp.float32))
    if b6 is not None:
        h = h + b6.astype(jnp.float32)
    h = jax.nn.relu(h)
    y = jnp.einsum("bhwd,d->bhw", h, w7.astype(jnp.float32)) + b7.astype(jnp.float32)
    return jax.nn.sigmoid(y)


def _head_kernel(z_ref, w6_ref, b6_ref, w7_ref, b7_ref, out_ref):
    import jax.numpy as jnp

    kt = z_ref.shape[1]
    th, w, c = z_ref.shape[2], z_ref.shape[3], z_ref.shape[4]
    acc = jnp.zeros((th * w, w6_ref.shape[2]), jnp.float32)
    for t in range(kt):
        zt = z_ref[0, t].reshape(th * w, c).astype(jnp.float32)
        acc = acc + jnp.dot(zt, w6_ref[t].astype(jnp.float32),
                            preferred_element_type=jnp.float32)
    acc = acc + b6_ref[:]
    acc = jnp.maximum(acc, 0.0)
    y = jnp.dot(acc, w7_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)  # (th*w, 1)
    y = jax.nn.sigmoid(y + b7_ref[0])
    out_ref[0] = y.reshape(th, w)


@functools.partial(jax.jit, static_argnames=("interpret",))
def saliency_head_pallas(z, w6, b6, w7, b7, *, interpret=False):
    """Pallas version. z (B, kt, H, W, C) with H % 8 == 0."""
    from jax.experimental import pallas as pl

    b, kt, h, w, c = z.shape
    c2 = w6.shape[2]
    tile_h = 16 if h % 16 == 0 else 8
    b6v = jnp.zeros((c2,), jnp.float32) if b6 is None else b6.astype(jnp.float32)
    w7v = w7.reshape(c2, 1).astype(jnp.float32)
    b7v = b7.reshape(1).astype(jnp.float32)

    return pl.pallas_call(
        _head_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        grid=(b, h // tile_h),
        in_specs=[
            pl.BlockSpec((1, kt, tile_h, w, c), lambda i, j: (i, 0, j, 0, 0)),
            pl.BlockSpec((kt, c, c2), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((c2,), lambda i, j: (0,)),
            pl.BlockSpec((c2, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((1,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(z, w6, b6v, w7v, b7v)


def saliency_head(z, w6, b6, w7, b7):
    """Dispatch: Pallas on TPU, reference semantics elsewhere."""
    if jax.default_backend() in ("tpu", "axon") and z.shape[2] % 8 == 0:
        return saliency_head_pallas(z, w6, b6, w7, b7)
    return saliency_head_reference(z, w6, b6, w7, b7)
