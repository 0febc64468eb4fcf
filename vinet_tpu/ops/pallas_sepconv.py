"""Pallas TPU kernel: fused SepConv3d (k3, stride 1) as two MXU matmuls.

S3D's separable conv — spatial (1,3,3) conv + BN/ReLU then temporal (3,1,1)
conv + BN/ReLU (reference SepConv3d, /root/reference/model_utils.py:141-160)
— dominates the backbone after the stem: XLA runs the 64-192 channel
instances at 30-50 TF/s because the small channel counts waste MXU lanes
and the intermediate round-trips through HBM.

Kernel formulation (one grid cell = one batch x H-slab):

  * spatial conv = implicit GEMM: 9 shifted views (3 dy x 3 dx) of the
    input slab concatenate on the channel axis into an (M, 9*Cin) panel,
    one matmul with the (9*Cin, Cout) repacked weights. dy shifts slice an
    untiled axis (free); dx shifts are materialized once per slab as
    stored copies (Mosaic cannot concat vectors with mismatched sublane
    offsets — a store normalizes the layout).
  * temporal conv: the ReLU'd intermediate stays in VMEM; each output
    frame concatenates 3 intermediate frames -> (M, 3*Cout) x (3*Cout,
    Cout) matmul. Zero temporal padding lives in the scratch's end frames.

The host side pre-builds overlapping H-slabs (halo rows + zero edges +
zero W padding) with plain XLA pads/slices — a 1.5x copy of the input,
traded for fully aligned, offset-free kernel memory access.

Exactness: same contraction, f32 accumulation, bf16 at the same layer
boundaries as the unfused path (tests/test_pallas_sepconv.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


H_TILE = 2


def _slabs(x: jax.Array, h_tile: int) -> jax.Array:
    """(B, T, H, W, C) -> (B, T, H//h_tile, h_tile+2, W+2, C) overlapping
    zero-padded slabs: slab i covers rows [i*h_tile - 1, i*h_tile + h_tile]
    of the zero-padded input (the 3-tap conv's halo), W padded by 1."""
    b, t, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    nh = h // h_tile
    slabs = [xp[:, :, i * h_tile:i * h_tile + h_tile + 2] for i in range(nh)]
    return jnp.stack(slabs, axis=2)


def prep_weights(w_s: jax.Array, w_t: jax.Array, dtype) -> tuple:
    """w_s: (1,3,3,Cin,Cout), w_t: (3,1,1,Cout,Cout) ->
    ws_mat ((dy,dx,ci), Cout), wt_mat ((k,ci), Cout)."""
    cin, cout = w_s.shape[3], w_s.shape[4]
    ws_mat = w_s.reshape(9 * cin, cout)
    wt_mat = w_t.reshape(3 * cout, cout)
    return ws_mat.astype(dtype), wt_mat.astype(dtype)


def _kernel(x_ref, ws_ref, wt_ref, bs_ref, bt_ref, out_ref, xs3, z,
            *, t_in, h_tile, w_out, cin, cout):
    m = h_tile * w_out

    # dx-shifted copies of the slab; the store normalizes sublane offsets so
    # the 9-piece concat below sees uniform layouts.
    for dx in range(3):
        xs3[dx] = x_ref[0, :, 0, :, dx:dx + w_out, :]

    # temporal zero padding = zeroed end frames of the z scratch
    z[0] = jnp.zeros((m, cout), z.dtype)
    z[t_in + 1] = jnp.zeros((m, cout), z.dtype)

    bs = bs_ref[0].astype(jnp.float32)
    bt = bt_ref[0].astype(jnp.float32)

    for t in range(t_in):
        pieces = []
        for dy in range(3):
            for dx in range(3):
                pieces.append(xs3[dx, t, dy:dy + h_tile])
        lhs = jnp.concatenate(pieces, axis=-1).reshape(m, 9 * cin)
        acc = jnp.dot(lhs, ws_ref[:], preferred_element_type=jnp.float32)
        z[t + 1] = jnp.maximum(acc + bs, 0.0).astype(z.dtype)

    for to in range(t_in):
        lhs = jnp.concatenate([z[to], z[to + 1], z[to + 2]], axis=-1)
        acc = jnp.dot(lhs, wt_ref[:], preferred_element_type=jnp.float32)
        out_ref[0, to] = jnp.maximum(acc + bt, 0.0).reshape(
            h_tile, w_out, cout).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h_tile", "interpret"))
def _sepconv_call(xh, ws_mat, wt_mat, b_s, b_t, *, h_tile, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t_in, nh, hs, wp, cin = xh.shape
    w_out = wp - 2
    cout = ws_mat.shape[-1]
    m = h_tile * w_out

    kern = functools.partial(_kernel, t_in=t_in, h_tile=h_tile,
                             w_out=w_out, cin=cin, cout=cout)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, t_in, nh * h_tile, w_out, cout),
                                       xh.dtype),
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec((1, t_in, 1, hs, wp, cin),
                         lambda i, j: (i, 0, j, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t_in, h_tile, w_out, cout),
            lambda i, j: (i, 0, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((3, t_in, h_tile + 2, w_out, cin), xh.dtype),
            pltpu.VMEM((t_in + 2, m, cout), xh.dtype),
        ],
        interpret=interpret,
    )(xh, ws_mat, wt_mat, b_s.reshape(1, -1), b_t.reshape(1, -1))


def fused_sepconv3(x, w_s, b_s, w_t, b_t, *, interpret: bool | None = None):
    """Fused relu(conv_t(relu(conv_s(x) + b_s)) + b_t) for the k3/s1/p1
    separable conv. x: (B, T, H, W, Cin); w_s: (1,3,3,Cin,Cout);
    w_t: (3,1,1,Cout,Cout); b_s/b_t are BN-folded biases.
    Returns (B, T, H, W, Cout)."""
    if interpret is None:
        interpret = os.environ.get("VINET_PALLAS_INTERPRET", "0") == "1"
    xh = _slabs(x, H_TILE)
    ws_mat, wt_mat = prep_weights(w_s, w_t, x.dtype)
    return _sepconv_call(xh, ws_mat, wt_mat,
                         b_s.astype(jnp.float32), b_t.astype(jnp.float32),
                         h_tile=H_TILE, interpret=interpret)


def supported(x_shape, kernel, stride, padding, in_ch, out_ch) -> bool:
    """Gate: k3/s1/p1 separable convs with MXU-worthy channel counts at
    geometries whose H divides the tile. Small-channel branch seps (<64 in)
    stay on XLA — their matmuls are too narrow to beat it."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    # DEFAULT OFF: isolated A/B is a wash (sep192 8.7 vs XLA 8.0 ms;
    # small geometries win, large lose — NOTES.md round 2), and pallas_call
    # boundaries cost fusion in the full graph. Opt-in for standalone use.
    if os.environ.get("VINET_PALLAS_SEPCONV", "0") == "0":
        return False
    b, t, h, w, c = x_shape
    return (tuple(kernel) == (1, 3, 3) and tuple(stride) == (1, 1, 1)
            and tuple(padding) == (0, 1, 1)
            and in_ch >= 64 and out_ch >= 64
            and h % H_TILE == 0 and w >= 16
            and t <= 16
            and t * (h // H_TILE) >= 8)
