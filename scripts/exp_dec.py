"""Isolated TPU A/B of decoder hot-conv restructurings (round 2).

Profile (scripts/profile_ops.py, B=16): conv3 48 TF/s, conv4 19 TF/s,
tail ~5 TF/s effective — the slow decoder stages are the strided temporal
windows (kt=st=5 over the T-concat) and the small-channel tail around the
2x upsamples. Variants measured here:

  conv3/conv4:
    A. baseline NDHWC conv3d (current ops/conv.py path)
    B. window-to-batch: stride-kt windows are disjoint -> reshape T into
       batch, VALID temporal conv
    C. window-to-batch + temporal-taps-into-channels: one NHWC 2-D conv
       with K = kt*Cin (pure MXU contraction, no 3-D codegen)
  conv5 (consumes up2x(relu(conv4))):
    A. baseline upsample2x_hw + conv3d
    B. phase-folded conv-after-upsample (ops/phasefold.py): one conv at the
       coarse grid with 4x output channels + exact edge strips

All variants are checked exact (f32 max|err|) against A before timing.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fence_fn():
    import numpy as np

    def fence(x):
        return float(np.asarray(x.ravel()[0]))

    return fence


def timeit(fn, args, iters, fence, readback):
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return max(time.perf_counter() - t0 - readback, 1e-9) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from vinet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from vinet_tpu.ops.conv import conv3d
    from vinet_tpu.ops.upsample import upsample2x_hw

    fence = fence_fn()
    probe = jax.device_put(jnp.zeros((8,), jnp.float32))
    rb = []
    for _ in range(5):
        t0 = time.perf_counter()
        fence(probe)
        rb.append(time.perf_counter() - t0)
    readback = sorted(rb)[len(rb) // 2]
    print(f"readback {readback*1e3:.1f} ms")

    b = args.batch
    key = jax.random.PRNGKey(0)

    def win_batch(x, w, bias, kt):
        bb_, t, h, ww_, c = x.shape
        n = t // kt
        xw = x.reshape(bb_ * n, kt, h, ww_, c)
        out = lax.conv_general_dilated(
            xw, w.astype(x.dtype), window_strides=(1, 1, 1),
            padding=[(0, 0), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        out = out + bias
        return out.reshape(bb_, n, h, ww_, -1).astype(x.dtype)

    def win_chan(x, w, bias, kt):
        bb_, t, h, ww_, c = x.shape
        n = t // kt
        xw = x.reshape(bb_ * n, kt, h, ww_, c)
        xw = jnp.moveaxis(xw, 1, 3).reshape(bb_ * n, h, ww_, kt * c)
        w2 = jnp.moveaxis(w, 0, 2).reshape(3, 3, kt * c, w.shape[-1])
        out = lax.conv_general_dilated(
            xw, w2.astype(x.dtype), window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        out = out + bias
        return out.reshape(bb_, n, h, ww_, -1).astype(x.dtype)

    for name, (t_in, h, wdt, cin, cout, kt) in {
        "conv3": (20, 28, 48, 480, 192, 5),
        "conv4": (20, 56, 96, 192, 64, 5),
    }.items():
        k1, k2, key = jax.random.split(key, 3)
        x = jax.random.normal(k1, (b, t_in, h, wdt, cin), jnp.bfloat16)
        w = jax.random.normal(k2, (kt, 3, 3, cin, cout), jnp.float32) * 0.05
        bias = jnp.zeros((cout,), jnp.float32)

        fa = jax.jit(lambda x, w=w: conv3d(x, w.astype(x.dtype), stride=(kt, 1, 1), padding=(0, 1, 1), bias=bias))
        fb = jax.jit(lambda x, w=w: win_batch(x, w, bias, kt))
        fc = jax.jit(lambda x, w=w: win_chan(x, w, bias, kt))

        ya, yb, yc = np.asarray(fa(x), np.float32), np.asarray(fb(x), np.float32), np.asarray(fc(x), np.float32)
        print(f"{name}: err B={np.abs(ya-yb).max():.2e} C={np.abs(ya-yc).max():.2e}")
        flops = b * (t_in // kt) * h * wdt * kt * 9 * cin * cout * 2
        for vname, fn in (("A base3d", fa), ("B winbatch", fb), ("C winchan", fc)):
            ms = timeit(fn, (x,), args.iters, fence, readback)
            print(f"  {name} {vname:10s} {ms:7.2f} ms  {flops/ms/1e9:6.1f} TF/s")

    # conv5 after upsample: baseline vs phase-fold
    from vinet_tpu.ops.phasefold import conv_after_up2x

    k1, k2, key = jax.random.split(key, 3)
    x4 = jax.random.normal(k1, (b, 4, 56, 96, 64), jnp.bfloat16)  # relu(conv4) pre-up
    w5 = jax.random.normal(k2, (2, 3, 3, 64, 32), jnp.float32) * 0.05
    b5 = jnp.zeros((32,), jnp.float32)

    fa = jax.jit(lambda x: conv3d(upsample2x_hw(x), w5.astype(x.dtype), stride=(2, 1, 1), padding=(0, 1, 1), bias=b5))
    fb = jax.jit(lambda x: conv_after_up2x(x, w5, b5, stride_t=2, pad_t=0))
    ya = np.asarray(fa(x4), np.float32)
    yb = np.asarray(fb(x4), np.float32)
    print(f"conv5-up: err phasefold={np.abs(ya-yb).max():.2e}")
    flops = b * 2 * 112 * 192 * 2 * 9 * 64 * 32 * 2
    for vname, fn in (("A up+conv", fa), ("B phasefold", fb)):
        ms = timeit(fn, (x4,), args.iters, fence, readback)
        print(f"  conv5 {vname:11s} {ms:7.2f} ms  {flops/ms/1e9:6.1f} TF/s")


if __name__ == "__main__":
    main()
