"""Price the boundary-correction APPLICATION in conv_after_up2x (round 4).

exp_tail_r4.py found the folded conv5's boundary corrections cost 2.9 ms
isolated (2.35 ms in-graph) on top of a 0.97 ms main conv — the four
`.at[].add` scatters on the fine (B,2,112,192,32) tensor plus ~12 tiny convs.
Variants (all exactness-checked against v0 at f32 before timing):

  v0 current  — conv_after_up2x as shipped (scatter on the fine grid)
  v1 coarse   — same correction terms, applied on the COARSE phase-major
                tensor before depth-to-space (thin dus slices; the channel
                blocks are contiguous for rows, 2-block for cols)
  v2 compute  — corrections computed but returned separately (the compute
                floor: what the 1-D convs themselves cost)
  v3 batched  — rows/cols corrections each batched into one conv via a
                zero-gap concat (fewer dispatches), applied as in v1

Usage (on the TPU, host quiet): python scripts/exp_tailcorr_r4.py [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vinet_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vinet_tpu.ops import phasefold as pf


def fence(y):
    if isinstance(y, tuple):
        y = y[0]
    return float(np.asarray(y.ravel()[0]))


def readback_baseline():
    probe = jax.device_put(jnp.zeros((8,), jnp.float32))
    fence(probe)
    rb = []
    for _ in range(5):
        t0 = time.perf_counter()
        fence(probe)
        rb.append(time.perf_counter() - t0)
    return sorted(rb)[2]


def timed(jfn, fargs, iters, readback):
    fence(jfn(*fargs))
    est = []
    for k in (iters, 2 * iters):
        t0 = time.perf_counter()
        for _ in range(k):
            out = jfn(*fargs)
        fence(out)
        est.append((time.perf_counter() - t0 - readback) / k)
    return min(est) * 1e3


def corrections(x, w, stride_t, pad_t):
    wf32 = w.astype(jnp.float32)
    row0 = pf._up1d_conv(x[:, :, 0], wf32[:, 0], stride_t, pad_t, end_fix=False)
    rowl = pf._up1d_conv(x[:, :, -1], wf32[:, 2], stride_t, pad_t, end_fix=False)
    col0 = pf._up1d_conv(x[:, :, :, 0], wf32[:, :, 0], stride_t, pad_t, end_fix=True)
    coll = pf._up1d_conv(x[:, :, :, -1], wf32[:, :, 2], stride_t, pad_t, end_fix=True)
    return row0, rowl, col0, coll


def main_conv(x, w, stride_t, pad_t):
    wf = pf.fold_weights_up2x(w)
    ap = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return pf._conv(ap, wf, strides=(stride_t, 1, 1),
                    padding=[(pad_t, pad_t), (0, 0), (0, 0)])


def v1_coarse(x, w, bias, stride_t=2, pad_t=0):
    """Corrections applied on the coarse phase-major tensor, then d2s.

    z: (B, T', H, W, 4*Cout), channel (ph, pw, c). Fine row 0 = (h=0, ph=0)
    = channels [0:2C); fine row 2H-1 = (h=H-1, ph=1) = channels [2C:4C).
    Fine col 0 = (w=0, pw=0) = channels {[0:C), [2C:3C)}; fine col 2W-1 =
    (w=W-1, pw=1) = channels {[C:2C), [3C:4C)}.

    The 1-D corrections arrive on the FINE axis (length 2W / 2H) — reshape
    (2L,) -> (L, 2) phases to index the coarse layout. The corner overlap
    accounting is unchanged: rows carry no end fixes, cols do.
    """
    cout = w.shape[-1]
    z = main_conv(x, w, stride_t, pad_t)  # (B,T',H,W,4C) f32
    row0, rowl, col0, coll = corrections(x, w, stride_t, pad_t)
    b, tt, h, wd, _ = z.shape
    # row terms: (B,T',2W,C) -> (B,T',W,2,C) -> (B,T',W,2C) phase-major (pw,c)
    r0 = row0.reshape(b, tt, wd, 2 * cout)
    rl = rowl.reshape(b, tt, wd, 2 * cout)
    z = z.at[:, :, 0, :, 0:2 * cout].add(-r0)
    z = z.at[:, :, h - 1, :, 2 * cout:4 * cout].add(-rl)
    # col terms: (B,T',2H,C) -> (B,T',H,2,C); ph phase selects channel block
    c0 = col0.reshape(b, tt, h, 2, cout)
    cl = coll.reshape(b, tt, h, 2, cout)
    z = z.at[:, :, :, 0, 0:cout].add(-c0[..., 0, :])
    z = z.at[:, :, :, 0, 2 * cout:3 * cout].add(-c0[..., 1, :])
    z = z.at[:, :, :, wd - 1, cout:2 * cout].add(-cl[..., 0, :])
    z = z.at[:, :, :, wd - 1, 3 * cout:4 * cout].add(-cl[..., 1, :])
    y = pf._depth_to_space(z, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


def v2_compute(x, w, bias, stride_t=2, pad_t=0):
    z = main_conv(x, w, stride_t, pad_t)
    y = pf._depth_to_space(z, w.shape[-1]).astype(x.dtype)
    return (y, *corrections(x, w, stride_t, pad_t))


def v3_batched(x, w, bias, stride_t=2, pad_t=0):
    """Rows batched via the channel trick: row0 uses w[:,0], rowl uses
    w[:,2]; stack the two strips on the batch axis and the two weight slabs
    on the INPUT-channel axis with block-diagonal zeros — K doubles, one
    conv. Same for cols (with end fixes applied after)."""
    cout = w.shape[-1]
    z = main_conv(x, w, stride_t, pad_t)
    wf32 = w.astype(jnp.float32)

    def fold1d_pair(s0, s1, w1a, w1b):
        # s*: (B,T,L,C); w1*: (kt,3,C,Cout). Build block-diagonal weights
        # (kt,3,2C,2Cout) and concat strips on the channel axis.
        kt = w1a.shape[0]
        c = w1a.shape[2]
        wz = jnp.zeros_like(w1a)
        wblk = jnp.concatenate([
            jnp.concatenate([w1a, wz], axis=-1),
            jnp.concatenate([wz, w1b], axis=-1)], axis=2)  # (kt,3,2C,2Cout)
        s = jnp.concatenate([s0, s1], axis=-1)  # (B,T,L,2C)
        a = jnp.asarray(pf._FOLD_A)
        w1f = jnp.einsum("pmd,tdio->tmipo", a, wblk)
        cc = 2 * cout
        wconv = w1f.reshape(kt, 1, 3, 2 * c, 2 * cc)
        ap = jnp.pad(s, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
        zz = pf._conv(ap[:, :, None], wconv, strides=(stride_t, 1, 1),
                      padding=[(pad_t, pad_t), (0, 0), (0, 0)])
        bt, tt = zz.shape[0], zz.shape[1]
        l = zz.shape[3]
        y2 = zz.reshape(bt, tt, l, 2, 2, cout)  # (.., L, p, strip, c)
        y2 = jnp.moveaxis(y2, 4, 2)  # (.., strip, L, p, c)
        y2 = y2.reshape(bt, tt, 2, 2 * l, cout)
        return y2[:, :, 0], y2[:, :, 1]

    row0, rowl = fold1d_pair(x[:, :, 0], x[:, :, -1], wf32[:, 0], wf32[:, 2])
    col0, coll = fold1d_pair(x[:, :, :, 0], x[:, :, :, -1],
                             wf32[:, :, 0], wf32[:, :, 2])
    # end fixes for the col terms (same accounting as _up1d_conv end_fix)
    c00 = pf._tconv(x[:, :, 0, 0], wf32[:, 0, 0], stride_t, pad_t)
    c0l = pf._tconv(x[:, :, -1, 0], wf32[:, 2, 0], stride_t, pad_t)
    cl0 = pf._tconv(x[:, :, 0, -1], wf32[:, 0, 2], stride_t, pad_t)
    cll = pf._tconv(x[:, :, -1, -1], wf32[:, 2, 2], stride_t, pad_t)
    col0 = col0.at[:, :, 0].add(-c00).at[:, :, -1].add(-c0l)
    coll = coll.at[:, :, 0].add(-cl0).at[:, :, -1].add(-cll)

    b, tt, h, wd, _ = z.shape
    r0 = row0.reshape(b, tt, wd, 2 * cout)
    rl = rowl.reshape(b, tt, wd, 2 * cout)
    z = z.at[:, :, 0, :, 0:2 * cout].add(-r0)
    z = z.at[:, :, h - 1, :, 2 * cout:4 * cout].add(-rl)
    c0 = col0.reshape(b, tt, h, 2, cout)
    cl = coll.reshape(b, tt, h, 2, cout)
    z = z.at[:, :, :, 0, 0:cout].add(-c0[..., 0, :])
    z = z.at[:, :, :, 0, 2 * cout:3 * cout].add(-c0[..., 1, :])
    z = z.at[:, :, :, wd - 1, cout:2 * cout].add(-cl[..., 0, :])
    z = z.at[:, :, :, wd - 1, 3 * cout:4 * cout].add(-cl[..., 1, :])
    y = pf._depth_to_space(z, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    b = args.batch
    # conv5 geometry: (B, 4, 56, 96, 64) -> folded, stride_t=2
    kx = jax.random.PRNGKey(0)
    x32 = jax.random.normal(kx, (b, 4, 56, 96, 64), jnp.float32)
    w32 = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 3, 64, 32),
                            jnp.float32) * 0.1
    bias32 = jax.random.normal(jax.random.PRNGKey(2), (32,), jnp.float32)

    # exactness at f32 vs shipped implementation
    ref = np.asarray(jax.jit(
        lambda x, w, c: pf.conv_after_up2x(x, w, c, stride_t=2))(x32, w32, bias32))
    for name, fn in [("v1", v1_coarse), ("v3", v3_batched)]:
        got = np.asarray(jax.jit(
            lambda x, w, c, f=fn: f(x, w, c, stride_t=2))(x32, w32, bias32))
        d = float(np.abs(got - ref).max())
        print(f"exactness {name}: max|diff| = {d:.2e}", flush=True)
        assert d < 1e-4, name

    rb = readback_baseline()
    x = x32.astype(jnp.bfloat16)
    w = w32.astype(jnp.bfloat16)
    bias = bias32.astype(jnp.bfloat16)
    print(f"\nreadback {rb*1e3:.2f} ms; B={b} bf16, conv5 fold geometry")
    for name, fn in [
        ("v0 shipped (fine scatter)",
         lambda x, w, c: pf.conv_after_up2x(x, w, c, stride_t=2)),
        ("v1 coarse-layout apply", lambda x, w, c: v1_coarse(x, w, c)),
        ("v2 compute-only floor", lambda x, w, c: v2_compute(x, w, c)),
        ("v3 batched 1-D convs", lambda x, w, c: v3_batched(x, w, c)),
        ("main conv only (no corr)",
         lambda x, w, c: pf._depth_to_space(main_conv(x, w, 2, 0), 32).astype(x.dtype)),
    ]:
        ms = timed(jax.jit(fn), (x, w, bias), args.iters, rb)
        print(f"{name:28s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
