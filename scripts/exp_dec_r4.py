"""Round-4 decoder conv study (VERDICT r3 item 2).

The parity decoder's conv2-conv4 run at 60-75 TF/s (NOTES "Performance
map") with no roofline excuse. Structural observation: every decoder stage
has temporal kernel == temporal stride and pad_t == 0
(models/decoder.py DECODER_PLANS) — the strided temporal windows TILE the
time axis exactly, so (B, To*kt, H, W, C) -> (B*To, kt, H, W, C) is a FREE
reshape (major dims only) and the strided conv becomes a VALID full-T-extent
conv. Variants measured per conv, bf16, parity geometry (B=16):

  v0 base    — current strided 3-D conv (ops/conv.py path)
  v1 tmerge  — free reshape to (B*To, kt, H, W, C) + VALID (kt,3,3) conv
  v2 tchan   — + transpose taps into channels: 2-D conv, Cin=kt*C
               (pays one relayout of the input)
  v3 pad128  — v0 with Cout zero-padded to a 128 multiple (lane test)

Each variant is exactness-checked against v0 before timing.
Timing per NOTES "Measurement": host-readback fence, amortized over iters.

Usage (on the TPU): python scripts/exp_dec_r4.py [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vinet_tpu.ops.conv import conv_f32acc

# (name, x_shape, w_shape) in parity geometry at B=16
CASES = [
    ("conv2", (16, 12, 14, 24, 832), (3, 3, 3, 832, 480)),
    ("conv3", (16, 20, 28, 48, 480), (5, 3, 3, 480, 192)),
    ("conv4", (16, 20, 56, 96, 192), (5, 3, 3, 192, 64)),
    ("conv5f", (16, 4, 112, 192, 64), (2, 3, 3, 64, 32)),  # unfolded ref pt
]


def v0_base(x, w):
    kt = w.shape[0]
    return conv_f32acc(x, w, strides=(kt, 1, 1),
                       padding=[(0, 0), (1, 1), (1, 1)],
                       dn=("NDHWC", "DHWIO", "NDHWC"))


def v1_tmerge(x, w):
    b, t, h, ww, c = x.shape
    kt = w.shape[0]
    to = t // kt
    x2 = x.reshape(b * to, kt, h, ww, c)
    y = conv_f32acc(x2, w, strides=(1, 1, 1),
                    padding=[(0, 0), (1, 1), (1, 1)],
                    dn=("NDHWC", "DHWIO", "NDHWC"))
    return y.reshape(b, to, *y.shape[2:])


def v2_tchan(x, w):
    b, t, h, ww, c = x.shape
    kt, _, _, _, co = w.shape
    to = t // kt
    x2 = x.reshape(b * to, kt, h, ww, c)
    x2 = jnp.moveaxis(x2, 1, 3).reshape(b * to, h, ww, kt * c)
    w2 = jnp.moveaxis(w, 0, 2).reshape(3, 3, kt * c, co)
    y = conv_f32acc(x2, w2, strides=(1, 1),
                    padding=[(1, 1), (1, 1)], dn=("NHWC", "HWIO", "NHWC"))
    return y.reshape(b, to, h, ww, co)


def v3_pad128(x, w):
    co = w.shape[-1]
    pad = (-co) % 128
    if pad == 0:
        return v0_base(x, w)
    wp = jnp.pad(w, ((0, 0),) * 4 + ((0, pad),))
    return v0_base(x, wp)[..., :co]


def v4_ktsum(x, w):
    """tmerge reshape, then per-tap 2-D convs summed (the streaming dense
    front's winning decomposition for (kt,3,3) convs — c4y 16.5 -> 10.4 ms).
    Tap slices are on a major dim (free); no relayout like v2."""
    b, t, h, ww, c = x.shape
    kt, _, _, _, co = w.shape
    to = t // kt
    x2 = x.reshape(b * to, kt, h, ww, c)
    acc = None
    for tap in range(kt):
        y = conv_f32acc(x2[:, tap], w[tap], strides=(1, 1),
                        padding=[(1, 1), (1, 1)], dn=("NHWC", "HWIO", "NHWC"))
        acc = y if acc is None else acc + y
    return acc.reshape(b, to, h, ww, co).astype(x.dtype)


def v5_ktsum_pad(x, w):
    co = w.shape[-1]
    pad = (-co) % 128
    if pad == 0:
        return v4_ktsum(x, w)
    wp = jnp.pad(w, ((0, 0),) * 4 + ((0, pad),))
    return v4_ktsum(x, wp)[..., :co]


def fence(x):
    return float(np.asarray(x.ravel()[0]))


def timed(fn, x, iters, readback):
    f = jax.jit(fn)
    fence(f(x))
    best = []
    for k in (iters, 2 * iters):
        t0 = time.perf_counter()
        for _ in range(k):
            out = f(x)
        fence(out)
        best.append((time.perf_counter() - t0 - readback) / k)
    return max(best) * 1e3  # conservative ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    from vinet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    probe = jax.device_put(jnp.zeros((8,), jnp.float32))
    fence(probe)
    rb = []
    for _ in range(5):
        t0 = time.perf_counter()
        fence(probe)
        rb.append(time.perf_counter() - t0)
    readback = sorted(rb)[2]

    all_variants = [("v0_base", v0_base), ("v1_tmerge", v1_tmerge),
                    ("v2_tchan", v2_tchan), ("v3_pad128", v3_pad128),
                    ("v4_ktsum", v4_ktsum), ("v5_ktsum_pad", v5_ktsum_pad)]
    sel = os.environ.get("EXP_VARIANTS")
    variants = ([v for v in all_variants if v[0] in sel.split(",")]
                if sel else all_variants)
    print(f"| conv | GF | " + " | ".join(f"{n} ms (TF/s)" for n, _ in variants) + " |")
    print("|---|---|" + "---|" * len(variants))
    for name, xs, ws in CASES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, xs, dtype)
        w = jax.random.normal(jax.random.PRNGKey(1), ws, dtype) * 0.02
        ref = np.asarray(jax.jit(v0_base)(x, w), np.float32)
        kt = ws[0]
        to = xs[1] // kt
        gf = 2 * xs[0] * to * xs[2] * xs[3] * ws[4] * ws[3] * kt * 9 / 1e9
        cells = []
        for vname, fn in variants:
            got = np.asarray(jax.jit(fn)(x, w), np.float32)
            err = np.abs(got - ref).max()
            assert err < 2e-2 * max(1.0, np.abs(ref).max()), (name, vname, err)
            ms = timed(lambda xx, _fn=fn: _fn(xx, w), x, args.iters, readback)
            cells.append(f"{ms:.2f} ({gf / ms:.0f})")
        print(f"| {name} | {gf:.1f} | " + " | ".join(cells) + " |", flush=True)


if __name__ == "__main__":
    main()
