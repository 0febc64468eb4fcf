"""Round-4 upsample study (VERDICT r3 item 2, the non-conv decoder time).

profile_ops shows each decoder stage's relu+upsample2x adds 3-5 ms over
the bare conv at B=16 — far above the HBM bound for a 2-tap stencil
(e.g. conv4's upsample writes 176 MB = 0.22 ms at 819 GB/s). Suspect: the
W-axis interleave. NDHWC tiles the last two dims (W sublanes, C lanes);
the current stack+reshape (W,2,C)->(2W,C) builds an intermediate whose
sublane dim is 2 — a relayout. But (W,2C)->(2W,C) is the inverse of the
physically-FREE (W,C)->(W/2,2C) phase reshape (NOTES round-2 layout
rules), so phases built in the LANE dim (concat even||odd on C) should
interleave for free. Variants, exactness-checked vs v0 then timed at
each decoder-stage geometry:

  v0 stack   — current ops/upsample.py (stack axis+1, reshape)
  v1 laneW   — W phases via concat on C + free reshape; H via stack
  v2 laneHW  — both axes via lane-phase trick (H goes through W's path
               after a transpose-free reorder: upsample W then H)
  v3 gather  — jnp.repeat-style index gather (XLA resize fallback)

Usage (on the TPU): python scripts/exp_up_r4.py [--iters 30]
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

from vinet_tpu.ops.upsample import _upsample2x_axis, lax_slice, upsample2x_hw

# decoder-stage upsample inputs at parity B=16 (post-conv, pre-up shapes)
CASES = [
    ("up@7x12x832", (16, 4, 7, 12, 832)),
    ("up@14x24x480", (16, 4, 14, 24, 480)),
    ("up@28x48x192", (16, 4, 28, 48, 192)),
    ("up@56x96x64", (16, 4, 56, 96, 64)),
]


def _phase_axis_lane(x, axis):
    """Linear 2x upsample along `axis` building phases in the channel dim:
    concat(even, odd) on C, then reshape (..., L, 2C) -> (..., 2L, C) —
    free when `axis` is W (the 2C/C relabeling shares the tile layout)."""
    xm = jnp.concatenate(
        [lax_slice(x, axis, 0, 1), lax_slice(x, axis, 0, x.shape[axis] - 1)],
        axis=axis)
    xp = jnp.concatenate(
        [lax_slice(x, axis, 1, x.shape[axis]),
         lax_slice(x, axis, x.shape[axis] - 1, x.shape[axis])], axis=axis)
    even = 0.25 * xm + 0.75 * x
    odd = 0.75 * x + 0.25 * xp
    if axis != x.ndim - 2:
        raise ValueError("lane-phase trick only applies to the W axis")
    cat = jnp.concatenate([even, odd], axis=-1)  # (..., W, 2C)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * x.shape[axis]
    return cat.reshape(new_shape).astype(x.dtype)


def v0_stack(x):
    return upsample2x_hw(x)


def v1_laneW(x):
    x = _upsample2x_axis(x, axis=2)      # H: stack (untiled dim)
    return _phase_axis_lane(x, axis=3)   # W: lane phases + free reshape


def v2_laneWH(x):
    # W first (lane trick), then H (untiled stack) — order swap probe
    x = _phase_axis_lane(x, axis=3)
    return _upsample2x_axis(x, axis=2)


def v3_gather(x):
    b, t, h, w, c = x.shape
    ih = jnp.clip((jnp.arange(2 * h) - 1) // 2 + ((jnp.arange(2 * h) + 1) % 2), 0, h - 1)
    # use jax.image.resize as the general-fallback reference point instead
    return jax.image.resize(x, (b, t, 2 * h, 2 * w, c), method="trilinear")


def fence(y):
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
    return max(est) * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()
    readback = readback_baseline()
    key = jax.random.PRNGKey(0)
    variants = [("v0_stack", v0_stack), ("v1_laneW", v1_laneW),
                ("v2_laneWH", v2_laneWH), ("v3_resize", v3_gather)]

    hdr = " | ".join(f"{n} ms" for n, _ in variants)
    print(f"| case | GB out | {hdr} |")
    print("|---|---|" + "---|" * len(variants), flush=True)
    for name, shape in CASES:
        x = jax.random.normal(key, shape, jnp.bfloat16)
        gb = 4 * np.prod(shape) * 2 / 1e9  # output bytes (4x elements)
        ref = None
        cols = []
        for vn, fn in variants:
            jfn = jax.jit(fn)
            y = np.asarray(jfn(x), dtype=np.float32)
            if ref is None:
                ref = y
            else:
                err = np.abs(y - ref).max()
                # bf16 rounding: axis-order swaps change the rounding of a
                # mathematically identical separable op (f32 exactness is
                # pinned in tests/test_ops.py for the integrated variant)
                assert err < 6e-2, (name, vn, err)
            cols.append(f"{timed(jfn, (x,), args.iters, readback):.2f}")
        print(f"| {name} | {gb:.2f} | " + " | ".join(cols) + " |", flush=True)


if __name__ == "__main__":
    main()
