"""Round-4 audit of the parity decoder TAIL — the last unaudited >=2 ms slice.

The parity inference graph's tail (models/decoder.py, VINET_PHASEFOLD=1) is
  relu(conv4) -> conv_after_up2x(conv5) -> relu -> _phase_tail(conv6+conv7)
i.e. two phase-folded convs at the coarse grids plus boundary corrections and
a depth-to-space interleave. NOTES "Mixed-block audit" left this as the one
slice without a roofline statement (~6 ms in-graph by subtraction).

Three measurements (B=16, bf16, folded BN, real TPU, bench.py fencing):

1. IN-GRAPH marginal cost by graph truncation: jit the full parity graph cut
   after successive tail points; consecutive differences are the true
   in-graph marginal ms of each tail piece (isolated jits lose cross-op
   fusion — the Mixed-block lesson).
2. Isolated tail pieces vs their implicit-GEMM bounds (exp_dec_bound_r4.py
   methodology): folded conv5 is a (172032 x 1152 x 128) contraction, the
   folded head (344064 x 576 x 128); plus the corrections' price (fold with
   and without the four boundary 1-D convs).
3. End-to-end tail-lowering A/B at the full-model level:
   fold+fold (default) vs resize+conv5+pallas-head (VINET_PHASEFOLD=0) vs
   all-XLA unfolded (PHASEFOLD=0, PALLAS_HEAD=0).

Usage (on the TPU, host quiet): python scripts/exp_tail_r4.py [--iters 20]
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
    return min(est) * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    from vinet_tpu.models import ViNet
    from vinet_tpu.models.inference import cast_floating, fold_batchnorms
    from vinet_tpu.models.decoder import Decoder, decoder_plan
    from vinet_tpu.ops.upsample import upsample2x_hw
    from vinet_tpu.ops import phasefold as pf

    model = ViNet(num_hier=3, clip_size=32)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = fold_batchnorms(params, state)
    params = cast_floating(params, jnp.bfloat16)
    state = cast_floating(state, jnp.bfloat16)
    dp = params["decoder"]
    dec = Decoder(decoder_plan(3, 32))
    convs = dec._convs()
    plan = dec.plan

    b = args.batch
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 32, 224, 384, 3), jnp.bfloat16)
    rb = readback_baseline()
    print(f"readback fence {rb*1e3:.2f} ms; B={b} bf16 folded", flush=True)

    # ---- shared front: backbone + decoder through the conv3 stage ----
    def front(xx):
        pyr, _ = model.backbone.apply(
            params["backbone"], state.get("backbone", {}), xx)
        y0, y1, y2, y3 = pyr

        def stage(name, z, skip):
            z = convs[name].apply(dp[name], {}, z)[0]
            z = jax.nn.relu(z)
            z = upsample2x_hw(z)
            if skip is not None:
                z = jnp.concatenate([z, skip.astype(z.dtype)], axis=1)
            return z

        z = stage("conv1", y0, y1)
        z = stage("conv2", z, y2)
        z = stage("conv3", z, y3)
        return z  # (B, 20, 56, 96, 192)

    def c4(z):
        return jax.nn.relu(convs["conv4"].apply(dp["conv4"], {}, z)[0])

    def fold5(z4, corrections=True):
        if corrections:
            z = pf.conv_after_up2x(z4, dp["conv5"]["w"], dp["conv5"].get("b"),
                                   stride_t=plan.st5)
        else:  # main folded conv + depth-to-space only (boundary-inexact)
            wf = pf.fold_weights_up2x(dp["conv5"]["w"])
            ap_ = jnp.pad(z4, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            zz = pf._conv(ap_, wf, strides=(plan.st5, 1, 1),
                          padding=[(0, 0), (0, 0), (0, 0)])
            z = pf._depth_to_space(zz, dp["conv5"]["w"].shape[-1]).astype(z4.dtype)
        return jax.nn.relu(z)

    def head(z5):
        return dec._phase_tail(dp, z5)

    # ---- 1. in-graph truncation ladder ----
    cuts = {
        "front (..conv3 stage)": lambda xx: front(xx),
        "+ conv4+relu": lambda xx: c4(front(xx)),
        "+ folded conv5 (no corr)": lambda xx: fold5(c4(front(xx)), False),
        "+ folded conv5 (full)": lambda xx: fold5(c4(front(xx)), True),
        "+ head = FULL tail": lambda xx: head(fold5(c4(front(xx)), True)),
    }
    print("\n-- in-graph truncation ladder (marginal = delta to previous row) --")
    prev = None
    base_ms = {}
    for name, fn in cuts.items():
        ms = timed(jax.jit(fn), (x,), args.iters, rb)
        marg = "" if prev is None else f"  marginal {ms - prev:+6.2f} ms"
        print(f"{name:28s} {ms:8.2f} ms{marg}", flush=True)
        base_ms[name] = ms
        prev = ms

    # full model via the public path (sanity: should match the ladder top)
    full_ms = timed(jax.jit(lambda xx: model.apply(params, state, xx)[0]),
                    (x,), args.iters, rb)
    print(f"{'model.apply (default knobs)':28s} {full_ms:8.2f} ms", flush=True)

    # ---- 2. isolated pieces + GEMM bounds ----
    z3 = jax.jit(front)(x)
    z4 = jax.jit(c4)(z3)
    z5 = jax.jit(lambda z: fold5(z, True))(z4)
    print("\n-- isolated tail pieces --")
    for name, fn, inp in [
        ("conv4+relu", c4, z3),
        ("folded conv5 (full)", lambda z: fold5(z, True), z4),
        ("folded conv5 (no corr)", lambda z: fold5(z, False), z4),
        ("head (_phase_tail)", head, z5),
    ]:
        ms = timed(jax.jit(fn), (inp,), args.iters, rb)
        print(f"{name:28s} {ms:8.2f} ms", flush=True)

    print("\n-- implicit-GEMM bounds (bf16 dot at exact M,K,N; f32 accum) --")
    for name, m, k, n in [
        ("folded conv5", b * 2 * 56 * 96, 2 * 3 * 3 * 64, 128),
        ("head conv", b * 1 * 112 * 192, 2 * 3 * 3 * 32, 128),
        ("conv4 (context)", b * 4 * 56 * 96, 5 * 3 * 3 * 192, 64),
    ]:
        a_ = jax.random.normal(jax.random.PRNGKey(2), (m, k), jnp.bfloat16)
        w_ = jax.random.normal(jax.random.PRNGKey(3), (k, n), jnp.bfloat16)
        dot = jax.jit(lambda u, v: jnp.dot(u, v, preferred_element_type=jnp.float32))
        ms = timed(dot, (a_, w_), args.iters, rb)
        gf = 2 * m * k * n / 1e9
        print(f"{name:28s} {ms:8.2f} ms  {gf:7.1f} GF  {gf/ms:6.1f} TF/s", flush=True)

    # ---- 3. end-to-end tail-lowering A/B (fresh trace per knob set) ----
    print("\n-- full-model A/B over tail knobs (model.apply, fresh jit) --")
    grid = [
        ("fold+fold (default)", {"VINET_PHASEFOLD": "1", "VINET_PALLAS_HEAD": "1"}),
        ("resize+conv5+pallas head", {"VINET_PHASEFOLD": "0", "VINET_PALLAS_HEAD": "1"}),
        ("resize+conv5+XLA head", {"VINET_PHASEFOLD": "0", "VINET_PALLAS_HEAD": "0"}),
    ]
    ref_out = None
    for name, env in grid:
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            fn = jax.jit(lambda xx: model.apply(params, state, xx)[0])
            out = fn(x)
            if ref_out is None:
                ref_out = np.asarray(out, np.float32)
            else:
                diff = float(np.abs(np.asarray(out, np.float32) - ref_out).max())
                assert diff < 1e-2, f"{name}: max diff {diff}"
            ms = timed(fn, (x,), args.iters, rb)
            print(f"{name:28s} {ms:8.2f} ms", flush=True)
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


if __name__ == "__main__":
    main()
