"""Round-4 decoder conv BOUND study (VERDICT r3 item 2, second half).

exp_dec_r4.py measured the decoder convs and their best lowering variants;
conv4 sits at ~54 TF/s across every variant and conv2 at ~155-175. The
question the roofline argument needs answered: is that the op's fault or
the shape's? Each decoder conv IS an implicit GEMM
  (M = B*To*H*W) x (K = kt*kh*kw*Cin) @ (K) x (N = Cout)
so the fastest the conv can possibly go on this chip is the speed of that
plain jnp.dot at the same (M, K, N) — no windowing, no relayout, perfect
data reuse. We time:

  gemm      — bf16 dot at the conv's exact (M, K, N), f32 accumulation
  gemm_p128 — same with N zero-padded to 128 (lane-fill test; TF/s quoted
              on the REAL flops so it's directly comparable)

If the conv's measured TF/s is within ~15% of its gemm bound, the conv is
at its shape roofline and the NOTES table can say so (the standard the
stem study set, NOTES "Stem roofline").

Usage (on the TPU): python scripts/exp_dec_bound_r4.py [--iters 30]
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

# (name, M, K, N) = decoder conv implicit-GEMM shapes at parity B=16
# (exp_dec_r4.py CASES; conv5f is the unfolded reference point)
CASES = [
    ("conv2", 16 * 4 * 14 * 24, 3 * 3 * 3 * 832, 480),
    ("conv3", 16 * 4 * 28 * 48, 5 * 3 * 3 * 480, 192),
    ("conv4", 16 * 4 * 56 * 96, 5 * 3 * 3 * 192, 64),
    ("conv5f", 16 * 2 * 112 * 192, 2 * 3 * 3 * 64, 32),
]


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

    dot = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
                  .astype(jnp.bfloat16))

    print("| conv | M x K x N | GF | gemm ms (TF/s) | gemm_p128 ms (TF/s) |")
    print("|---|---|---|---|---|", flush=True)
    for name, m, k, n in CASES:
        gf = 2.0 * m * k * n / 1e9
        a = jax.random.normal(key, (m, k), jnp.bfloat16)
        cols = []
        for nn in (n, max(n, 128) if n < 128 else n):
            b = jax.random.normal(key, (k, nn), jnp.bfloat16)
            ms = timed(dot, (a, b), args.iters, readback)
            cols.append(f"{ms:.2f} ({gf / ms:.0f})")
        print(f"| {name} | {m}x{k}x{n} | {gf:.1f} | {cols[0]} | {cols[1]} |",
              flush=True)


if __name__ == "__main__":
    main()
