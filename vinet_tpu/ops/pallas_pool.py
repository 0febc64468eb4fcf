"""Pallas TPU kernels for the S3D max pools.

XLA's reduce_window runs the stem pool ((1,3,3)s(1,2,2) on a
(B,16,112,192,64) tensor) at ~10 ms — under 1/9th of HBM bandwidth — and
every XLA-level restatement (shifted maxes, strided slices, phase reshapes)
measured 9-39 ms: strided access along tiled dimensions relayouts every
vector (NOTES.md round 2). The pools are pure bandwidth ops and belong at
~1.5 ms.

The kernels exploit three layout facts:
  * (…, W, C) -> (…, W/2, 2C) is a physically FREE reshape under the TPU's
    (8,128) tiling — after it, the even/odd W phases of a stride-2 window
    are LANE slices, and a W-shift is a sublane shift expressible as
    fill-row + offset-0 slice concatenation.
  * H (third-from-minor) is untiled: H shifts, splits, and phase reshapes
    are layout no-ops inside a kernel.
  * T is a grid/block dimension: temporal windows are expressed by passing
    the input once per tap with clamped block index maps and masking the
    clamped taps with -inf.

Reference semantics: torch MaxPool3d, floor mode, -inf padding
(/root/reference/model.py:694-743 pool layers).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _fill(dtype):
    return jnp.asarray(-jnp.inf, dtype)


def _w_pool(v, sc, kw, sw, c, fill):
    """v: (H, Wg, 2C) merged even/odd W phases; sc: (3, H, Wg, C) scratch.
    Returns (H, W', C) for sw=2 or the still-merged (H, Wg, 2C) for sw=1.

    The even/odd phases are LANE slices of v; Mosaic cannot concatenate (or
    cheaply combine) vectors whose slice offsets disagree, so both phases
    are first stored to scratch — the store normalizes the layout — and all
    shifts below are built from offset-0 reads."""
    if kw == 1:
        return v
    ev_v = v[..., :c]
    od_v = v[..., c:]
    if (kw, sw) == (2, 2):
        return jnp.maximum(ev_v, od_v)
    sc[0] = ev_v
    sc[1] = od_v
    ev = sc[0]
    od = sc[1]
    fill_row = jnp.full((v.shape[0], 1, c), fill, v.dtype)
    odp = jnp.concatenate([fill_row, od[:, :-1, :]], axis=1)  # od[j-1]
    if (kw, sw) == (3, 2):
        return jnp.maximum(jnp.maximum(odp, ev), od)
    if (kw, sw) == (3, 1):
        # ev[j+1] via a store-normalized shifted copy
        wg = v.shape[1]
        sc[2, :, 0:wg - 1] = ev_v[:, 1:]
        sc[2, :, wg - 1:wg] = fill_row
        evn = sc[2]
        ev2 = jnp.maximum(jnp.maximum(odp, ev), od)
        od2 = jnp.maximum(jnp.maximum(ev, od), evn)
        return jnp.concatenate([ev2, od2], axis=-1)
    raise NotImplementedError((kw, sw))


def _h_pool(v, kh, sh, fill):
    """v: (H, Wg, C'). H is untiled, so shifts/splits here are free."""
    h = v.shape[0]
    if kh == 1:
        return v
    fill_row = jnp.full((1,) + v.shape[1:], fill, v.dtype)
    if (kh, sh) == (2, 2):
        v2 = v.reshape(h // 2, 2, *v.shape[1:])
        return jnp.maximum(v2[:, 0], v2[:, 1])
    if (kh, sh) == (3, 2):
        # window [2i-1, 2i+1] (padding 1): {h1[i-1], h0[i], h1[i]}
        v2 = v.reshape(h // 2, 2, *v.shape[1:])
        h0, h1 = v2[:, 0], v2[:, 1]
        h1m = jnp.concatenate([fill_row, h1[:-1]], axis=0)  # x[2i-1]
        return jnp.maximum(jnp.maximum(h1m, h0), h1)
    if (kh, sh) == (3, 1):
        vm = jnp.concatenate([fill_row, v[:-1]], axis=0)
        vp = jnp.concatenate([v[1:], fill_row], axis=0)
        return jnp.maximum(jnp.maximum(vm, v), vp)
    raise NotImplementedError((kh, sh))


def _kernel_a(x_ref, o_ref, sc, *, kh, sh, kw, sw, c):
    v = x_ref[0, 0]
    fill = _fill(v.dtype)
    m = _w_pool(v, sc, kw, sw, c, fill)
    o_ref[0, 0] = _h_pool(m, kh, sh, fill)


def _kernel_b(xs_refs, o_ref, sc, *, kt, st, kh, sh, kw, sw, c, t_in):
    from jax.experimental import pallas as pl

    to = pl.program_id(1)
    fill = _fill(xs_refs[0].dtype)
    m = None
    for d in range(kt):
        v = xs_refs[d][0, 0]
        if kt == 3 and d == 0:
            v = jnp.where(to >= 1, v, fill)
        if kt == 3 and d == 2:
            v = jnp.where(st * to + 1 <= t_in - 1, v, fill)
        m = v if m is None else jnp.maximum(m, v)
    m = _w_pool(m, sc, kw, sw, c, fill)
    o_ref[0, 0] = _h_pool(m, kh, sh, fill)


@functools.partial(jax.jit, static_argnames=("c", "kernel", "stride", "padding", "interpret"))
def _pool_call(xm, *, c, kernel, stride, padding, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kt, kh, kw = kernel
    st, sh, sw = stride
    b, t_in, h, wg, c2 = xm.shape
    t_out = (t_in + 2 * (1 if kt == 3 else 0) - kt) // st + 1
    h_out = (h + 2 * (1 if kh == 3 else 0) - kh) // sh + 1
    w_shape = (wg, c2) if (kw == 1 or (kw, sw) == (3, 1)) else (wg, c2 // 2)
    out_shape = jax.ShapeDtypeStruct((b, t_out, h_out) + w_shape, xm.dtype)

    if kt == 1:
        kern = functools.partial(_kernel_a, kh=kh, sh=sh, kw=kw, sw=sw, c=c)
        return pl.pallas_call(
            kern,
            out_shape=out_shape,
            grid=(b, t_in),
            in_specs=[pl.BlockSpec((1, 1, h, wg, c2),
                                   lambda i, j: (i, j, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, 1, h_out) + w_shape,
                                   lambda i, j: (i, j, 0, 0, 0)),
            scratch_shapes=[pltpu.VMEM((3, h, wg, c), xm.dtype)],
            interpret=interpret,
        )(xm)

    def kern(*refs):
        _kernel_b(refs[:-2], refs[-2], refs[-1], kt=kt, st=st, kh=kh, sh=sh,
                  kw=kw, sw=sw, c=c, t_in=t_in)

    off = 1 if kt == 3 else 0
    in_specs = []
    for d in range(kt):
        def imap(i, j, d=d):
            t = st * j + d - off
            return (i, jnp.clip(t, 0, t_in - 1), 0, 0, 0)
        in_specs.append(pl.BlockSpec((1, 1, h, wg, c2), imap))
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(b, t_out),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, h_out) + w_shape,
                               lambda i, j: (i, j, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((3, h, wg, c), xm.dtype)],
        interpret=interpret,
    )(*([xm] * kt))


# (kernel, stride, padding) -> supported
# geometries where the kernel beats reduce_window (A/B on TPU, NOTES.md):
# the (3,3,3) stride-2 pools and small-W (1,3,3) pools measured faster on
# XLA and stay there.
_GEOMS = {
    ((1, 3, 3), (1, 2, 2), (0, 1, 1)),
    ((1, 2, 2), (1, 2, 2), (0, 0, 0)),
    ((3, 3, 3), (1, 1, 1), (1, 1, 1)),
    ((2, 1, 1), (2, 1, 1), (0, 0, 0)),
    ((2, 1, 1), (1, 1, 1), (0, 0, 0)),
}


# geometry tags for selective enablement via VINET_PALLAS_POOL
_TAGS = {
    ((1, 3, 3), (1, 2, 2), (0, 1, 1)): "stem",
    ((1, 2, 2), (1, 2, 2), (0, 0, 0)): "s22",
    ((3, 3, 3), (1, 1, 1), (1, 1, 1)): "mixed",
    ((2, 1, 1), (2, 1, 1), (0, 0, 0)): "t2",
    ((2, 1, 1), (1, 1, 1), (0, 0, 0)): "t2",
}


def supported(x_shape, kernel, stride, padding, dtype) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    # DEFAULT OFF: every geometry beat reduce_window ISOLATED (stem pool
    # 10.2 -> 4.7 ms), but e2e the pallas_call boundaries break XLA's
    # fusion of the pools with surrounding ops and the full model REGRESSES
    # (222 -> 206 fps with just the stem pool; NOTES.md round 2). Opt-in by
    # tag ("stem,mixed,t2,s22") for workloads where the pools stand alone.
    mode = os.environ.get("VINET_PALLAS_POOL", "0")
    if mode == "0":
        return False
    if (tuple(kernel), tuple(stride), tuple(padding)) not in _GEOMS:
        return False
    if mode != "1":
        tag = _TAGS[(tuple(kernel), tuple(stride), tuple(padding))]
        if tag not in mode.split(","):
            return False
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float32)):
        return False
    b, t, h, w, c = x_shape
    kt, kh, kw = kernel
    st, sh, sw = stride
    if kw > 1 and w % 2:
        return False
    if (kh, sh) == (3, 2) and w < 128:
        return False
    if sh == 2 and h % 2:
        return False
    if kt == 2 and st == 2 and t % 2:
        return False
    if kt == 2 and st == 1 and t < 2:
        return False
    # per-(b,t) block must fit VMEM comfortably
    return h * max(w // 2, 1) * 2 * c * jnp.dtype(dtype).itemsize <= 4 * 1024 * 1024


def maxpool(x, *, kernel, stride, padding, interpret: bool | None = None):
    """Dispatch wrapper: merged-phase Pallas pool, exact torch semantics."""
    if interpret is None:
        interpret = os.environ.get("VINET_PALLAS_INTERPRET", "0") == "1"
    b, t, h, w, c = x.shape
    kt, kh, kw = kernel
    xm = x.reshape(b, t, h, w // 2, 2 * c) if kw > 1 else x.reshape(b, t, h, w, c)
    out = _pool_call(xm, c=c, kernel=tuple(kernel), stride=tuple(stride),
                     padding=tuple(padding), interpret=interpret)
    if (kw, stride[2]) == (3, 1) or kw == 1:
        # output still merged (or never merged): restore (…, W, C)
        ob, ot, oh = out.shape[:3]
        out = out.reshape(ob, ot, oh, -1, c)
    return out
