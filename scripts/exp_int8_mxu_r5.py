"""Round-5 int8 MXU microbenchmark: close VERDICT r4 item 2's open question.

Round 2 measured XLA int8 end-to-end as zero-gain; round 3 recorded
"int8 dot_general does not compile on this Mosaic toolchain" from a remote
compile helper exit. Neither tested a CUSTOM PALLAS int8 kernel on MXU-shaped
tiles. This script answers, on the real chip:

  A. does a pallas int8 x int8 -> int32 matmul compile + run at all?
  B. measured rate ratio int8 : bf16 on an MXU-saturating tiled matmul
     (v5e datasheet says 394 TOPS int8 vs 197 TFLOPS bf16 = 2x)
  C. the stem temporal conv (7,1,1)s2 64->64 (NOTES "Temporal-conv MXU
     study": 20.7 ms, ~15 TF/s, at its MXU-WIDTH bound for bf16) as an
     int8 pallas GEMM formulation vs the XLA bf16 baseline — does int8
     packing move the width bound?

Run:  python scripts/exp_int8_mxu_r5.py [--stage a|b|c|all]
Each stage prints one JSON line; failures print the exception and continue
(the negative IS the result — it goes to NOTES.md either way).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fence(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def _time_rate(fn, *args, iters=30, flops=None):
    """Returns (ms_per_call, tf_per_s or None)."""
    out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fence(out)
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3, (flops / dt / 1e12 if flops else None)


# ---------------------------------------------------------------- stage A/B
def _mm_kernel(a_ref, b_ref, o_ref, acc_dtype):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype)


def pallas_mm(a, b, *, bm, bk, bn, acc_dtype):
    m, k = a.shape
    _, n = b.shape
    grid = (m // bm, n // bn)
    return pl.pallas_call(
        functools.partial(_mm_kernel, acc_dtype=acc_dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
                  pl.BlockSpec((k, bn), lambda i, j: (0, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), acc_dtype),
    )(a, b)


def stage_ab():
    M, K, N = 4096, 1024, 1024
    flops = 2 * M * K * N
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    abf = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    bbf = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)

    rec = {"stage": "ab", "shape": [M, K, N]}
    # bf16 reference kernel
    f_bf = jax.jit(lambda a, b: pallas_mm(a, b, bm=512, bk=K, bn=512,
                                          acc_dtype=jnp.float32))
    ms, tf = _time_rate(f_bf, abf, bbf, flops=flops)
    rec["bf16_ms"] = round(ms, 3)
    rec["bf16_tf_s"] = round(tf, 1)
    # XLA bf16 for scale
    ms, tf = _time_rate(
        jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)),
        abf, bbf, flops=flops)
    rec["bf16_xla_ms"] = round(ms, 3)
    rec["bf16_xla_tf_s"] = round(tf, 1)
    # int8 pallas
    try:
        f_i8 = jax.jit(lambda a, b: pallas_mm(a, b, bm=512, bk=K, bn=512,
                                              acc_dtype=jnp.int32))
        ms, tf = _time_rate(f_i8, a8, b8, flops=flops)
        rec["int8_ms"] = round(ms, 3)
        rec["int8_tops"] = round(tf, 1)
        rec["int8_compiles"] = True
        rec["int8_vs_bf16"] = round(rec["bf16_ms"] / ms, 2)
        # correctness spot-check vs int32 math
        got = np.asarray(f_i8(a8[:64], b8))
        want = np.asarray(a8[:64], np.int32) @ np.asarray(b8, np.int32)
        rec["int8_exact"] = bool((got == want).all())
    except Exception as e:
        rec["int8_compiles"] = False
        rec["int8_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        traceback.print_exc()
    # int8 via XLA dot_general for comparison
    try:
        f_x8 = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
        ms, tf = _time_rate(f_x8, a8, b8, flops=flops)
        rec["int8_xla_ms"] = round(ms, 3)
        rec["int8_xla_tops"] = round(tf, 1)
    except Exception as e:
        rec["int8_xla_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    print(json.dumps(rec), flush=True)
    return rec


# ------------------------------------------------------------------ stage C
# Stem temporal conv (7,1,1) stride (2,1,1) pad 3, Cin=Cout=64, as a GEMM:
# out[b, to, h, w, co] = sum_{kt, ci} x[b, 2*to - 3 + kt, h, w, ci] * W[kt, ci, co]
# GEMM view per (b, to): M = H*W positions, K = 7*64 taps, N = 64.
# bf16 XLA baseline is the production path (ops/conv.py temporal conv).

def _tconv_kernel(x_ref, w_ref, o_ref, scratch, *, kt, stride, t_out,
                  acc_dtype):
    # x_ref: (t_pad, m_blk, c) full padded-T slab for this M block;
    # w_ref: (kt*c, co). For each output tap, assemble the (m_blk, kt*c)
    # GEMM operand in VMEM scratch (store-normalized lane packing — the
    # r2 Mosaic rule: build shifted/offset views by STORE, then read
    # offset-0), then one K=kt*c dot. int8's MXU advantage is along K
    # (2 int8 pairs per PE-cycle), so K must be the packed 448, not 64.
    m_blk = x_ref.shape[1]
    c = x_ref.shape[2]
    for to in range(t_out):  # static unroll: t_out is a compile-time const
        for k in range(kt):
            scratch[:, k * c:(k + 1) * c] = x_ref[stride * to + k]
        o_ref[to] = jax.lax.dot_general(
            scratch[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)


def pallas_tconv(x, w, *, stride=2, acc_dtype=jnp.float32, m_blk=1024):
    """x: (T_pad, M, C) zero-padded along T by the caller; w: (KT, C, CO).
    Returns (T_out, M, CO) in acc_dtype."""
    t_pad, m, c = x.shape
    kt, _, co = w.shape
    t_out = (t_pad - kt) // stride + 1
    wf = w.reshape(kt * c, co)
    grid = (m // m_blk,)
    return pl.pallas_call(
        functools.partial(_tconv_kernel, kt=kt, stride=stride, t_out=t_out,
                          acc_dtype=acc_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_pad, m_blk, c), lambda j: (0, j, 0)),
            pl.BlockSpec((kt * c, co), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((t_out, m_blk, co), lambda j: (0, j, 0)),
        out_shape=jax.ShapeDtypeStruct((t_out, m, co), acc_dtype),
        scratch_shapes=[pltpu.VMEM((m_blk, kt * c), x.dtype)],
    )(x, wf)


def stage_c():
    """Compare: XLA bf16 (7,1,1)s2 conv (production formulation) vs pallas
    bf16 GEMM formulation vs pallas int8 GEMM formulation, at the real stem
    geometry (B=16 windows, T=32 -> 16, 112x192 spatial, 64ch)."""
    B, T, H, W, C = 16, 32, 112, 192, 64
    KT, CO, S, PAD = 7, 64, 2, 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(0.1 * rng.standard_normal((KT, 1, 1, C, CO)), jnp.bfloat16)
    t_out = (T + 2 * PAD - KT) // S + 1
    flops = 2 * B * t_out * H * W * KT * C * CO

    rec = {"stage": "c", "geom": [B, T, H, W, C], "flops_g": round(flops / 1e9, 1)}

    def xla_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(S, 1, 1), padding=[(PAD, PAD), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)

    ms, tf = _time_rate(jax.jit(xla_conv), x, w, flops=flops)
    rec["xla_bf16_ms"] = round(ms, 2)
    rec["xla_bf16_tf_s"] = round(tf, 1)

    # pallas formulation input: (T_pad, B*H*W, C) — T-major so the kernel's
    # T-tap block is contiguous; caller pays the transpose ONCE here (in the
    # real integration the timeline is already T-major).
    def prep(x):
        xp = jnp.pad(x, ((0, 0), (PAD, PAD), (0, 0), (0, 0), (0, 0)))
        return xp.transpose(1, 0, 2, 3, 4).reshape(T + 2 * PAD, B * H * W, C)

    xt = jax.jit(prep)(x)
    _fence(xt)
    wt = w.reshape(KT, C, CO)

    try:
        f_bf = jax.jit(lambda x, w: pallas_tconv(x, w, acc_dtype=jnp.float32))
        ms, tf = _time_rate(f_bf, xt, wt, flops=flops)
        rec["pallas_bf16_ms"] = round(ms, 2)
        rec["pallas_bf16_tf_s"] = round(tf, 1)
        # correctness vs the XLA conv (bf16 inputs, f32 accum)
        ref = np.asarray(jax.jit(xla_conv)(x, w))  # (B, t_out, H, W, CO)
        ref = ref.transpose(1, 0, 2, 3, 4).reshape(t_out, B * H * W, CO)
        got = np.asarray(f_bf(xt, wt))
        err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
        rec["pallas_bf16_relerr"] = float(round(err, 6))
    except Exception as e:
        rec["pallas_bf16_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        traceback.print_exc()

    try:
        x8 = jnp.asarray(rng.integers(-127, 128, xt.shape), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, wt.shape), jnp.int8)
        f_i8 = jax.jit(lambda x, w: pallas_tconv(x, w, acc_dtype=jnp.int32))
        ms, tf = _time_rate(f_i8, x8, w8, flops=flops)
        rec["pallas_int8_ms"] = round(ms, 2)
        rec["pallas_int8_tops"] = round(tf, 1)
    except Exception as e:
        rec["pallas_int8_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        traceback.print_exc()
    print(json.dumps(rec), flush=True)
    return rec


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stage", default="all", choices=["a", "b", "c", "all"])
    args = p.parse_args()
    from vinet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if args.stage in ("a", "b", "ab", "all"):
        stage_ab()
    if args.stage in ("c", "all"):
        stage_c()


if __name__ == "__main__":
    main()
