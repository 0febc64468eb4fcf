"""Pallas TPU kernel: fused S3D stem (SepConv3d 3->64, k7, s2) as MXU matmuls.

The stem — spatial (1,7,7)s(1,2,2) conv from RGB + BN/ReLU, then temporal
(7,1,1)s(2,1,1) conv + BN/ReLU (reference SepConv3d,
/root/reference/model_utils.py:141-160, used at model.py:692) — is the
single hottest op in the network: XLA's 3-D conv codegen runs it at
2-7 TF/s because Cin=3 gives the MXU a degenerate contraction and the two
convs round-trip a (B,32,112,192,64) intermediate through HBM.

This kernel restates the stem as two dense matmuls with the intermediate
held in VMEM:

  * spatial conv = implicit GEMM. The input is pre-arranged (pure XLA
    reshape/transpose, done once per call) into phase-split layout
    (B, T, 2, HP, WP, 6): H and W padded by 3 and split into even/odd
    phases; the W phase pair is merged with RGB into 6 channels. A stride-2
    7x7 patch then becomes 28 CONTIGUOUS slices (7 dy taps x 4 w-offsets)
    concatenated on the channel axis — a (M, 168) x (168, 64) MXU matmul
    per frame (dy tap at dy=2m'+q reads phase q at row offset m'; w tap at
    dx=2j+r reads slice offset j, merged channel r).
  * temporal conv = per output frame, concat 7 VMEM-resident intermediate
    frames on the channel axis -> (M, 448) x (448, 64) matmul.

Biases are the BN-folded conv biases; both ReLUs are fused. Grid is
(batch, H-tiles); the input tile (with its 7-row halo) is DMA'd from HBM
manually because halo windows are not expressible as a block index_map.

Exactness: same contraction, f32 accumulation, bf16 at the same layer
boundaries as the unfused path (tests/test_pallas_stem.py, interpret mode).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp



H_TILE = 4


def prep_input(x: jax.Array) -> jax.Array:
    """(B, T, H, W, 3) -> phase-split (B, T, 2, H//2+3, W//2+3, 6).

    Pads H and W by 3 (the conv's spatial padding), splits each into
    even/odd phases (stride-2 output alignment), keeps the H phase as its
    own axis and merges the W phase with RGB into 6 channels."""
    b, t, h, w, c = x.shape
    assert c == 3 and h % 2 == 0 and w % 2 == 0, x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (3, 3), (3, 3), (0, 0)))
    hp, wp = (h + 6) // 2, (w + 6) // 2
    xp = xp.reshape(b, t, hp, 2, wp, 2, 3)
    xp = jnp.transpose(xp, (0, 1, 3, 2, 4, 5, 6))  # (b,t,qh,hp,wp,r,c)
    return xp.reshape(b, t, 2, hp, wp, 6)


def prep_weights(w_s: jax.Array, w_t: jax.Array, dtype) -> tuple:
    """w_s: (1,7,7,3,64) spatial, w_t: (7,1,1,64,64) temporal ->
    (ws_mat (168, 64), wt_mat (448, 64)) matching the kernel's slice order."""
    cout = w_s.shape[-1]
    ws = jnp.pad(w_s[0], ((0, 0), (0, 1), (0, 0), (0, 0)))  # dx: 7 -> 8
    # dx = 2j + r  ->  (j, r) split, j-major (matches the kernel's slices)
    ws_mat = ws.reshape(7, 4, 2, 3, cout).reshape(7 * 4 * 2 * 3, cout)
    wt_mat = w_t.reshape(w_t.shape[0] * w_t.shape[3], w_t.shape[4])
    return ws_mat.astype(dtype), wt_mat.astype(dtype)


def _kernel(x_any, ws_ref, wt_ref, bs_ref, bt_ref, out_ref, xs, z, sem,
            *, t_in, t_out, stride_t, w_out):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    hb = pl.program_id(1)
    m = H_TILE * w_out
    kt = 7
    pad_t = 3

    # Four DMAs fetch the tile at W offsets 0..3 (the stride-2 7-tap conv's
    # four W-slice shifts). Shifting via DMA instead of in-kernel lane
    # slicing keeps every vector the kernel touches at sublane offset 0 —
    # Mosaic cannot concatenate vectors whose slice offsets disagree.
    for j in range(4):
        pltpu.make_async_copy(
            x_any.at[b, :, :, pl.ds(hb * H_TILE, H_TILE + 3),
                     pl.ds(j, w_out)],
            xs.at[j], sem.at[j]).start()

    # temporal zero padding lives in the z scratch's end frames
    z[0:pad_t] = jnp.zeros((pad_t, m, z.shape[2]), z.dtype)
    z[t_in + pad_t:] = jnp.zeros((z.shape[0] - t_in - pad_t, m, z.shape[2]), z.dtype)

    for j in range(4):
        pltpu.make_async_copy(
            x_any.at[b, :, :, pl.ds(hb * H_TILE, H_TILE + 3),
                     pl.ds(j, w_out)],
            xs.at[j], sem.at[j]).wait()

    bs = bs_ref[0].astype(jnp.float32)
    bt = bt_ref[0].astype(jnp.float32)

    for t in range(t_in):
        pieces = []
        for dy in range(7):
            q, mrow = dy % 2, dy // 2
            for j in range(4):
                pieces.append(xs[j, t, q, mrow:mrow + H_TILE])
        lhs = jnp.concatenate(pieces, axis=-1).reshape(m, 168)
        acc = jnp.dot(lhs, ws_ref[:], preferred_element_type=jnp.float32)
        z[t + pad_t] = jnp.maximum(acc + bs, 0.0).astype(z.dtype)

    for to in range(t_out):
        lhs = jnp.concatenate([z[to * stride_t + k] for k in range(kt)], axis=-1)
        acc = jnp.dot(lhs, wt_ref[:], preferred_element_type=jnp.float32)
        out_ref[0, to] = jnp.maximum(acc + bt, 0.0).reshape(
            H_TILE, w_out, -1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("stride_t", "interpret"))
def _stem_call(xq, ws_mat, wt_mat, b_s, b_t, *, stride_t, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t_in, _, hp, wp, _ = xq.shape
    h_out, w_out = hp - 3, wp - 3
    cout = ws_mat.shape[-1]
    t_out = (t_in + 6 - 7) // stride_t + 1
    m = H_TILE * w_out

    kern = functools.partial(_kernel, t_in=t_in, t_out=t_out,
                             stride_t=stride_t, w_out=w_out)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, t_out, h_out, w_out, cout), xq.dtype),
        grid=(b, h_out // H_TILE),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t_out, H_TILE, w_out, cout),
            lambda i, j: (i, 0, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((4, t_in, 2, H_TILE + 3, w_out, 6), xq.dtype),
            pltpu.VMEM((t_in + 6, m, cout), xq.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(xq, ws_mat, wt_mat, b_s.reshape(1, -1), b_t.reshape(1, -1))


def fused_stem(x, w_s, b_s, w_t, b_t, *, stride_t: int = 2,
               interpret: bool | None = None):
    """Fused stem: relu(conv_t(relu(conv_s(x) + b_s)) + b_t).

    x: (B, T, H, W, 3); w_s: (1,7,7,3,Cout) stride (1,2,2) pad (0,3,3);
    w_t: (7,1,1,Cout,Cout) stride (stride_t,1,1) pad (3,0,0).
    b_s/b_t are the BN-folded biases. Returns (B, T', H//2, W//2, Cout).
    """
    if interpret is None:
        interpret = os.environ.get("VINET_PALLAS_INTERPRET", "0") == "1"
    xq = prep_input(x)
    ws_mat, wt_mat = prep_weights(w_s, w_t, x.dtype)
    return _stem_call(xq, ws_mat, wt_mat,
                      b_s.astype(jnp.float32), b_t.astype(jnp.float32),
                      stride_t=stride_t, interpret=interpret)


def supported(x_shape, kernel, stride, padding, in_ch, out_ch) -> bool:
    """Whether fused_stem applies: the S3D stem geometry at an even spatial
    size with H//2 divisible by the tile."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    # DEFAULT OFF — does not currently compile on real TPUs: the 6-channel
    # minor dim of the phase-split layout is padded to a 128 tile in
    # HBM/VMEM, and Mosaic rejects both DMA slices and vector concats on it
    # ("slice shape must be aligned to tiling"). Kept (interpret-mode
    # exact) as the starting point for a layout redesign; see NOTES.md
    # round 2 for the full wall-by-wall account.
    if os.environ.get("VINET_PALLAS_STEM", "0") == "0":
        return False
    b, t, h, w, c = x_shape
    return (c == 3 and in_ch == 3
            and tuple(kernel) == (1, 7, 7) and tuple(stride) == (1, 2, 2)
            and tuple(padding) == (0, 3, 3)
            and h % 2 == 0 and w % 2 == 0
            and (h // 2) % H_TILE == 0
            and t <= 48)
