"""Round-4 Mixed-block roofline study (VERDICT r3 item 2, backbone half).

Round 3's stem study rooflined base1; the deep Inception blocks were
summarized as "~100+ TF/s" without per-block evidence. This script audits
every Mixed block at its parity geometry (B=16, clip 32, 224x384 input):

  measured — the whole block jitted alone (folded BN, bf16), fenced timing
  bound    — the sum of each constituent conv's implicit-GEMM bound: a
             plain bf16 jnp.dot timed at the conv's exact
             (M = B*T*H*W, K = kt*kh*kw*Cin, N = Cout), plus an HBM-bytes
             bound for the branch3 maxpool (a pure memory op) and the
             4-way concat write.

A block within ~15% of its bound is at the shape roofline (the standard
the stem study set). Identical-(M,K,N) dots are cached across blocks.

Usage (on the TPU): python scripts/exp_mixed_r4.py [--iters 20]
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

HBM_GBS = 819e9  # v5e HBM bandwidth

# block geometry at parity B=16: (T, H, W) of the block's input
GEOM = {"3b": (32, 28, 48), "3c": (32, 28, 48),
        "4b": (16, 14, 24), "4c": (16, 14, 24), "4d": (16, 14, 24),
        "4e": (16, 14, 24), "4f": (16, 14, 24),
        "5b": (8, 7, 12), "5c": (8, 7, 12)}


def fence(y):
    leaf = jax.tree_util.tree_leaves(y)[0]
    return float(np.asarray(leaf.ravel()[0]))


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
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batch", type=int, default=16)
    args = p.parse_args()
    from vinet_tpu.models.inference import cast_floating, fold_batchnorms
    from vinet_tpu.models.s3d import MIXED_PLAN, mixed
    from vinet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    B = args.batch
    readback = readback_baseline()
    key = jax.random.PRNGKey(0)

    dot = jax.jit(lambda a, bb: jnp.dot(a, bb, preferred_element_type=jnp.float32)
                  .astype(jnp.bfloat16))
    gemm_cache = {}

    def gemm_ms(m, k, n):
        if (m, k, n) not in gemm_cache:
            a = jax.random.normal(key, (m, k), jnp.bfloat16)
            b = jax.random.normal(key, (k, n), jnp.bfloat16)
            gemm_cache[(m, k, n)] = timed(dot, (a, b), args.iters, readback)
        return gemm_cache[(m, k, n)]

    print("| block | in->out ch @TxHxW | GF | measured ms (TF/s) "
          "| bound ms | % of bound |")
    print("|---|---|---|---|---|---|", flush=True)
    for name, plan in MIXED_PLAN.items():
        in_ch, b0, b1r, b1, b2r, b2, b3 = plan
        t, h, w = GEOM[name]
        m = B * t * h * w
        blk = mixed(name)

        params, state = blk.init(jax.random.PRNGKey(1))
        params, state = fold_batchnorms(params, state)
        params = cast_floating(params, jnp.bfloat16)
        x = jax.random.normal(key, (B, t, h, w, in_ch), jnp.bfloat16)
        jblk = jax.jit(lambda xx, pp=params, bb=blk: bb.apply(pp, {}, xx)[0])
        ms = timed(jblk, (x,), args.iters, readback)

        # per-conv GEMM bounds (sep conv = spatial 1x3x3 then temporal 3x1x1)
        bound = 0.0
        gf = 0.0
        for (k, n) in [(in_ch, b0), (in_ch, b1r), (9 * b1r, b1), (3 * b1, b1),
                       (in_ch, b2r), (9 * b2r, b2), (3 * b2, b2), (in_ch, b3)]:
            bound += gemm_ms(m, k, n)
            gf += 2.0 * m * k * n / 1e9
        # branch3 maxpool 3x3x3/s1 (read in_ch, write in_ch) + concat write
        mem_bytes = 2 * (2 * m * in_ch + m * (b0 + b1 + b2 + b3))
        bound += mem_bytes / HBM_GBS * 1e3
        tfs = gf / ms
        print(f"| {name} | {in_ch}->{b0+b1+b2+b3} @{t}x{h}x{w} | {gf:.0f} "
              f"| {ms:.2f} ({tfs:.0f}) | {bound:.2f} | {100*bound/ms:.0f}% |",
              flush=True)


if __name__ == "__main__":
    main()
