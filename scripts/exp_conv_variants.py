"""A/B experiment: XLA 3-D conv codegen vs restructured 2-D equivalents.

Round-1 NOTES.md: XLA's true 3-D conv path runs the S3D stem at 2-7 TF/s;
global 2-D lowering (VINET_CONV3D_LOWER) was faster per-op but slower fused.
This script measures each hot conv INDIVIDUALLY in both forms (with bias+relu
epilogue, bf16, B=16) so round 2 can lower selectively per layer.

Key trick for the decoder: every temporal conv in the (3,32) plan has
kt == st (non-overlapping windows), so the 3-D conv is EXACTLY a 2-D conv on
(B*T/kt, H, W, kt*C) after a reshape+transpose — MXU-friendly K.

Usage: python scripts/exp_conv_variants.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from vinet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    key = jax.random.PRNGKey(0)
    B = 16
    results = []

    def conv3d_fn(w_shape, stride, pad):
        def f(x, w, b):
            y = lax.conv_general_dilated(
                x, w, window_strides=stride, padding=[(p, p) for p in pad],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32)
            return jax.nn.relu(y + b).astype(x.dtype)
        return f

    def conv2d_batchT(stride_hw, pad_hw):
        # (1,kh,kw) kernel: fold T into batch
        def f(x, w, b):
            bb, t, h, ww, c = x.shape
            y = lax.conv_general_dilated(
                x.reshape(bb * t, h, ww, c), w[0],
                window_strides=stride_hw, padding=[(p, p) for p in pad_hw],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            y = jax.nn.relu(y + b).astype(x.dtype)
            return y.reshape(bb, t, *y.shape[1:])
        return f

    def conv2d_foldHW(stride_t, pad_t):
        # (kt,1,1) kernel: fold H*W into one spatial dim
        def f(x, w, b):
            bb, t, h, ww, c = x.shape
            y = lax.conv_general_dilated(
                x.reshape(bb, t, h * ww, c), w[:, 0],
                window_strides=(stride_t, 1), padding=[(pad_t, pad_t), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            y = jax.nn.relu(y + b).astype(x.dtype)
            return y.reshape(bb, y.shape[1], h, ww, c if False else y.shape[-1])
        return f

    def conv2d_foldT(kt, pad_hw):
        # kt == st temporal windows: reshape (B, n, kt, H, W, C) ->
        # (B*n, H, W, kt*C) and run a 2-D conv with K = kt*C.
        def f(x, w, b):
            bb, t, h, ww, c = x.shape
            n = t // kt
            xz = x[:, : n * kt].reshape(bb, n, kt, h, ww, c)
            xz = jnp.transpose(xz, (0, 1, 3, 4, 2, 5)).reshape(bb * n, h, ww, kt * c)
            w2 = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(w.shape[1], w.shape[2], kt * c, w.shape[4])
            y = lax.conv_general_dilated(
                xz, w2, window_strides=(1, 1), padding=[(p, p) for p in pad_hw],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            y = jax.nn.relu(y + b).astype(x.dtype)
            return y.reshape(bb, n, h, ww, -1)
        return f

    cases = []

    def add(name, x_shape, w_shape, stride, pad, variants):
        cases.append((name, x_shape, w_shape, stride, pad, variants))

    # --- S3D stem ---
    add("stem_s 7x7 s2 @224x384 3->64", (B, 32, 224, 384, 3), (1, 7, 7, 3, 64),
        (1, 2, 2), (0, 3, 3),
        {"3d": conv3d_fn, "2d_bT": lambda w, s, p: conv2d_batchT(s[1:], p[1:])})
    add("stem_t (7,1,1) s2 @112x192 64->64", (B, 32, 112, 192, 64), (7, 1, 1, 64, 64),
        (2, 1, 1), (3, 0, 0),
        {"3d": conv3d_fn, "2d_HW": lambda w, s, p: conv2d_foldHW(s[0], p[0])})
    add("b1 sep_s 3x3 @56x96 64->192", (B, 16, 56, 96, 64), (1, 3, 3, 64, 192),
        (1, 1, 1), (0, 1, 1),
        {"3d": conv3d_fn, "2d_bT": lambda w, s, p: conv2d_batchT(s[1:], p[1:])})
    add("b1 sep_t (3,1,1) s1 @56x96 192", (B, 16, 56, 96, 192), (3, 1, 1, 192, 192),
        (1, 1, 1), (1, 0, 0),
        {"3d": conv3d_fn, "2d_HW": lambda w, s, p: conv2d_foldHW(s[0], p[0])})
    # --- representative Inception sep convs (base3 @28x48) ---
    add("mixed sep_s 3x3 @28x48 96->208", (B, 8, 28, 48, 96), (1, 3, 3, 96, 208),
        (1, 1, 1), (0, 1, 1),
        {"3d": conv3d_fn, "2d_bT": lambda w, s, p: conv2d_batchT(s[1:], p[1:])})
    add("mixed sep_t (3,1,1) @28x48 208", (B, 8, 28, 48, 208), (3, 1, 1, 208, 208),
        (1, 1, 1), (1, 0, 0),
        {"3d": conv3d_fn, "2d_HW": lambda w, s, p: conv2d_foldHW(s[0], p[0])})
    # --- decoder ---
    add("dec conv1 (1,3,3) @7x12 1024->832", (B, 4, 7, 12, 1024), (1, 3, 3, 1024, 832),
        (1, 1, 1), (0, 1, 1),
        {"3d": conv3d_fn, "2d_bT": lambda w, s, p: conv2d_batchT(s[1:], p[1:])})
    add("dec conv2 (3,3,3) s3 @14x24 832->480", (B, 12, 14, 24, 832), (3, 3, 3, 832, 480),
        (3, 1, 1), (0, 1, 1),
        {"3d": conv3d_fn, "foldT": lambda w, s, p: conv2d_foldT(w[0], p[1:])})
    add("dec conv3 (5,3,3) s5 @28x48 480->192", (B, 20, 28, 48, 480), (5, 3, 3, 480, 192),
        (5, 1, 1), (0, 1, 1),
        {"3d": conv3d_fn, "foldT": lambda w, s, p: conv2d_foldT(w[0], p[1:])})
    add("dec conv4 (5,3,3) s5 @56x96 192->64", (B, 20, 56, 96, 192), (5, 3, 3, 192, 64),
        (5, 1, 1), (0, 1, 1),
        {"3d": conv3d_fn, "foldT": lambda w, s, p: conv2d_foldT(w[0], p[1:])})
    add("dec conv5 (2,3,3) s2 @112x192 64->32", (B, 4, 112, 192, 64), (2, 3, 3, 64, 32),
        (2, 1, 1), (0, 1, 1),
        {"3d": conv3d_fn, "foldT": lambda w, s, p: conv2d_foldT(w[0], p[1:])})

    def fence(a):
        return float(np.asarray(a.ravel()[0]))

    probe = jax.device_put(jnp.zeros((8,), jnp.float32))
    fence(probe)
    rb = []
    for _ in range(5):
        t0 = time.perf_counter()
        fence(probe)
        rb.append(time.perf_counter() - t0)
    readback = sorted(rb)[len(rb) // 2]
    print(f"readback fence: {readback*1e3:.2f} ms", flush=True)

    iters = 10
    for name, x_shape, w_shape, stride, pad, variants in cases:
        kx, kw = jax.random.split(jax.random.fold_in(key, hash(name) % 2**31))
        x = jax.random.normal(kx, x_shape, jnp.bfloat16)
        w = (jax.random.normal(kw, w_shape, jnp.float32) / np.sqrt(np.prod(w_shape[:4]))).astype(jnp.bfloat16)
        b = jnp.zeros((w_shape[-1],), jnp.bfloat16)
        # output elements for flops: conv output spatial sizes
        t_out = (x_shape[1] + 2 * pad[0] - w_shape[0]) // stride[0] + 1
        h_out = (x_shape[2] + 2 * pad[1] - w_shape[1]) // stride[1] + 1
        w_out = (x_shape[3] + 2 * pad[2] - w_shape[2]) // stride[2] + 1
        flops = 2 * np.prod(w_shape[:4], dtype=np.float64) * w_shape[4] * B * t_out * h_out * w_out / w_shape[3]
        flops = 2 * B * t_out * h_out * w_out * w_shape[4] * (w_shape[0] * w_shape[1] * w_shape[2] * w_shape[3])
        line = f"{name:40s}"
        outs = {}
        for vname, mk in variants.items():
            fn = jax.jit(mk(w_shape, stride, pad))
            y = fn(x, w, b)
            outs[vname] = np.asarray(y, dtype=np.float32)
            fence(y)
            t0 = time.perf_counter()
            for _ in range(iters):
                y = fn(x, w, b)
            fence(y)
            dt = max(time.perf_counter() - t0 - readback, 1e-9) / iters
            line += f"  {vname}: {dt*1e3:7.2f} ms {flops/dt/1e12:6.1f} TF/s"
        vals = list(outs.values())
        if len(vals) == 2:
            err = np.max(np.abs(vals[0] - vals[1].reshape(vals[0].shape)))
            line += f"  maxerr={err:.2e}"
        print(line, flush=True)
        results.append(line)


if __name__ == "__main__":
    main()
