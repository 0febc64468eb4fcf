"""Round-4 stem-backward isolation (VERDICT r3 item 3, closing argument).

exp_train_r4.py located the train step's cost: fwd 51 ms, bwd ~94 ms,
Adam 6 ms (B=8 bf16). The segment rows show the backward is backbone-
dominated, but those include the cross-segment dX chain. This isolates
base1 (the stem): fwd-only and fwd+bwd of base1 alone as its own jitted
graph, grads wrt base1 params. The round-3 stem study proved the FORWARD
is at its MXU-width bound (64-channel stem: (1,7,7)s2 best exact
restatement 10.5 ms/B16, (7,1,1)s2 at the N<=128 cost-model bound); the
backward is two more convs of the same shape family per conv (dW, dX) —
if stem fwd+bwd measures ~3x the bound-limited forward, the backward is
at the same architecture bound and the train step is closed.

Usage (on the TPU): python scripts/exp_stem_bwd_r4.py [--iters 5]
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
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()
    from vinet_tpu.models.inference import cast_floating
    from vinet_tpu.models.s3d import S3DBackbone
    from vinet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    B = args.batch
    readback = readback_baseline()
    bb = S3DBackbone()
    base1 = bb._stages()[0]
    params, state = base1.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 32, 224, 384, 3),
                          jnp.float32)

    def loss(p, xx):
        pb = cast_floating(p, jnp.bfloat16)
        y, _ = base1.apply(pb, state, xx.astype(jnp.bfloat16), train=True)
        return jnp.sum(y.astype(jnp.float32))

    jf = jax.jit(loss)
    jb = jax.jit(lambda p, xx: jax.value_and_grad(loss)(p, xx))

    def flops(jfn, *a):
        try:
            c = jfn.lower(*a).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            return float(c.get("flops", 0.0))
        except Exception:
            return 0.0

    print(f"| base1 variant | ms (B={B}) | GF | TF/s |")
    print("|---|---|---|---|", flush=True)
    for name, jfn in (("fwd", jf), ("fwd+bwd", jb)):
        ms = timed(jfn, (params, x), args.iters, readback)
        gf = flops(jfn, params, x) / 1e9
        print(f"| {name} | {ms:.1f} | {gf:.0f} | {gf/ms:.1f} |", flush=True)


if __name__ == "__main__":
    main()
