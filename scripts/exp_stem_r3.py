"""Round-3 stem campaign: XLA-level restatements of the S3D stem's spatial
conv ((1,7,7) stride-(1,2,2) from RGB — /root/reference/model_utils.py:141-160
used at model.py:692), the last 2-7 TF/s op in the graph (VERDICT r2 item 2).

Every variant is an EXACT restatement (same contraction, f32 accumulate) —
the lesson of rounds 1-2 is that algebraic XLA restructures win where Pallas
boundaries lose. Measured per-op at parity geometry (B=16,T=32) and
streaming geometry (B=1,T=128), plus full-stem compositions in one jit.

Variants:
  sp_c3d    true 3-D conv
  sp_c2d    T-batch 2-D fold (current inference path)
  sp_s2d2d  space-to-depth (12ch, 4x4 s1) + 2-D fold        [NEW combo]
  sp_s2d3d  space-to-depth as 3-D (1,4,4) (round-1 reject, re-measure)
  sp_cin4   RGB padded to 4 channels, 2-D fold              [NEW]
  sp_im2col phase-merged 28-slice im2col + one MXU matmul   [NEW]
  t_pallas  temporal (7,1,1)s2 via ops/pallas_tconv (current path)
  t_c3d     temporal as true 3-D conv
  t_concat  temporal via T-phase split + channel concat + 1x1 matmul [NEW]

Usage: python scripts/exp_stem_r3.py [--check]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--check", action="store_true", help="f32 exactness checks only")
    args = ap.parse_args()

    from vinet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from vinet_tpu.ops.s2d import s2d_stem_kernel, space_to_depth_hw

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    w7 = 0.1 * jax.random.normal(k1, (1, 7, 7, 3, 64), jnp.float32)
    b_s = 0.1 * jax.random.normal(k2, (64,), jnp.float32)
    wt = 0.1 * jax.random.normal(k3, (7, 1, 1, 64, 64), jnp.float32)
    b_t = 0.1 * jax.random.normal(k4, (64,), jnp.float32)
    w12 = jnp.asarray(s2d_stem_kernel(np.asarray(w7)))

    # ---- spatial variants: x (B,T,224,384,3) -> (B,T,112,192,64), relu ----
    def sp_c3d(x, w7f):
        y = lax.conv_general_dilated(
            x, w7f.astype(x.dtype), window_strides=(1, 2, 2),
            padding=[(0, 0), (3, 3), (3, 3)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        return jax.nn.relu(y + b_s).astype(x.dtype)

    def sp_c2d(x, w7f):
        b, t, h, w_, c = x.shape
        y = lax.conv_general_dilated(
            x.reshape(b * t, h, w_, c), w7f[0].astype(x.dtype),
            window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jax.nn.relu(y + b_s).reshape(b, t, h // 2, w_ // 2, -1).astype(x.dtype)

    def sp_s2d2d(x, w12f):
        b, t, h, w_, c = x.shape
        xb = space_to_depth_hw(x).reshape(b * t, h // 2, w_ // 2, 4 * c)
        y = lax.conv_general_dilated(
            xb, w12f[0].astype(x.dtype), window_strides=(1, 1),
            padding=[(2, 1), (2, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jax.nn.relu(y + b_s).reshape(b, t, h // 2, w_ // 2, -1).astype(x.dtype)

    def sp_s2d3d(x, w12f):
        xb = space_to_depth_hw(x)
        y = lax.conv_general_dilated(
            xb, w12f.astype(x.dtype), window_strides=(1, 1, 1),
            padding=[(0, 0), (2, 1), (2, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        return jax.nn.relu(y + b_s).astype(x.dtype)

    w8 = jnp.pad(w7, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 0)))

    def sp_cin4(x, w8f):
        b, t, h, w_, c = x.shape
        x4 = jnp.pad(x, ((0, 0),) * 4 + ((0, 1),))
        y = lax.conv_general_dilated(
            x4.reshape(b * t, h, w_, 4), w8f[0].astype(x.dtype),
            window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jax.nn.relu(y + b_s).reshape(b, t, h // 2, w_ // 2, -1).astype(x.dtype)

    # Output W-phase pairing: recast the (7,7)s2 Cout=64 conv as a (7,9)s(2,4)
    # Cout=128 conv — outputs y[:,2v] (channels 0:64, taps kx=0..6) and
    # y[:,2v+1] (channels 64:128, taps kx=2..8) share the 9-col input window
    # starting at 4v-3. Fills the MXU's 128 output lanes (64-channel convs use
    # half); K grows 7->9 cols but M halves: model cost ratio ~2x with Cin=4.
    # The (…, W/2, 128) -> (…, W, 64) un-pairing reshape is free under (8,128)
    # tiling (j-major channel order == W-phase order).
    wpair = jnp.zeros((7, 9, 4, 128), jnp.float32)
    wpair = wpair.at[:, 0:7, :, 0:64].set(w8[0])
    wpair = wpair.at[:, 2:9, :, 64:128].set(w8[0])
    b_s2 = jnp.concatenate([b_s, b_s])

    def sp_wpair(x, wpairf):
        b, t, h, w_, c = x.shape
        x4 = jnp.pad(x, ((0, 0),) * 4 + ((0, 1),))
        y = lax.conv_general_dilated(
            x4.reshape(b * t, h, w_, 4), wpairf.astype(x.dtype),
            window_strides=(2, 4), padding=[(3, 3), (3, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = jax.nn.relu(y + b_s2)
        return y.reshape(b, t, h // 2, w_ // 2, 64).astype(x.dtype)

    # im2col: k index order (dy, j, r, c); tap dx = 2j + r (dx=7 -> zero)
    wmat = jnp.pad(w7[0], ((0, 0), (0, 1), (0, 0), (0, 0)))  # dx 7 -> 8
    wmat = jnp.transpose(wmat.reshape(7, 4, 2, 3, 64), (0, 1, 2, 3, 4)).reshape(168, 64)

    def sp_im2col(x, wmatf):
        b, t, h, w_, c = x.shape  # 224, 384
        oh, ow = h // 2, w_ // 2
        xp = jnp.pad(x, ((0, 0), (0, 0), (3, 3), (3, 3), (0, 0)))  # 230, 390
        xm = xp.reshape(b, t, h + 6, (w_ + 6) // 2, 2 * c)
        xh = xm.reshape(b, t, (h + 6) // 2, 2, (w_ + 6) // 2, 2 * c)
        pieces = []
        for dy in range(7):
            q, m = dy % 2, dy // 2
            for j in range(4):
                pieces.append(xh[:, :, m:m + oh, q, j:j + ow, :])
        lhs = jnp.concatenate(pieces, axis=-1)  # (B,T,oh,ow,168)
        y = jax.lax.dot_general(
            lhs.reshape(-1, 168), wmatf.astype(x.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jax.nn.relu(y + b_s).reshape(b, t, oh, ow, 64).astype(x.dtype)

    # ---- temporal variants: z (B,T,112,192,64) -> (B,(T-7)//2+4,...) ----
    def t_pallas(z, wtf):
        from vinet_tpu.ops.pallas_tconv import temporal_conv3d

        y = temporal_conv3d(z, wtf.astype(z.dtype), stride=2, pad=3)
        return jax.nn.relu(y + b_t).astype(z.dtype)

    def t_c3d(z, wtf):
        y = lax.conv_general_dilated(
            z, wtf.astype(z.dtype), window_strides=(2, 1, 1),
            padding=[(3, 3), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        return jax.nn.relu(y + b_t).astype(z.dtype)

    def t_concat(z, wtf):
        b, t, h, w_, c = z.shape
        to = (t + 6 - 7) // 2 + 1
        zp = jnp.pad(z, ((0, 0), (3, 3 + (t % 2)), (0, 0), (0, 0), (0, 0)))
        tp = zp.shape[1]
        zq = zp.reshape(b, tp // 2, 2, h, w_, c)
        zq = jnp.moveaxis(zq, 2, 1)  # (b, 2, tp//2, h, w, c)
        pieces = []
        for k in range(7):
            # frame 2*to + k: phase (k % 2), index to + k//2... wait frames
            # are 2*to + k - 3 + 3(pad) = 2*to + k; phase q = k % 2,
            # position to + k // 2
            q, m = k % 2, k // 2
            pieces.append(zq[:, q, m:m + to])
        lhs = jnp.concatenate(pieces, axis=-1)  # (b, to, h, w, 448)
        wflat = wtf.reshape(7 * 64, 64)
        y = jax.lax.dot_general(
            lhs.reshape(-1, 7 * c), wflat.astype(z.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jax.nn.relu(y + b_t).reshape(b, to, h, w_, c).astype(z.dtype)

    # Output T-phase pairing (same idea along time): (7,1,1)s2 Cout=64 ->
    # (9,1,1)s4 Cout=128; K 448->576 (ceil/128: 4->5), M halves => model
    # ratio 8/5 = 1.6x. Un-pairing here needs a real transpose (T is not
    # lane-adjacent): reshape+moveaxis, the measured-cheap phase-merge path.
    wtpair = jnp.zeros((9, 1, 1, 64, 128), jnp.float32)
    wtpair = wtpair.at[0:7, ..., 0:64].set(wt)
    wtpair = wtpair.at[2:9, ..., 64:128].set(wt)
    b_t2 = jnp.concatenate([b_t, b_t])

    def t_pair(z, wtpf):
        b, t, h, w_, c = z.shape
        y = lax.conv_general_dilated(
            z, wtpf.astype(z.dtype), window_strides=(4, 1, 1),
            padding=[(3, 3), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        y = jax.nn.relu(y + b_t2)
        u = y.shape[1]
        y = jnp.moveaxis(y.reshape(b, u, h, w_, 2, c), 4, 2)
        return y.reshape(b, 2 * u, h, w_, c).astype(z.dtype)

    spatial = {"sp_c3d": (sp_c3d, w7), "sp_c2d": (sp_c2d, w7),
               "sp_s2d2d": (sp_s2d2d, w12), "sp_s2d3d": (sp_s2d3d, w12),
               "sp_cin4": (sp_cin4, w8), "sp_im2col": (sp_im2col, wmat),
               "sp_wpair": (sp_wpair, wpair)}
    temporal = {"t_pallas": (t_pallas, wt), "t_c3d": (t_c3d, wt),
                "t_concat": (t_concat, wt), "t_pair": (t_pair, wtpair)}

    if args.check:
        x = jax.random.normal(k5, (1, 8, 224, 384, 3), jnp.float32)
        ref = sp_c3d(x, w7)
        for name, (fn, w) in spatial.items():
            got = fn(x, w)
            err = float(jnp.max(jnp.abs(got - ref)))
            print(f"{name}: max|err|={err:.2e}", flush=True)
            assert err < 1e-4, name
        z = jax.random.normal(k5, (1, 8, 112, 192, 64), jnp.float32)
        reft = t_c3d(z, wt)
        for name, (fn, w) in temporal.items():
            got = fn(z, w)
            err = float(jnp.max(jnp.abs(got - reft)))
            print(f"{name}: max|err|={err:.2e}", flush=True)
            assert err < 1e-4, name
        print("all exact", flush=True)
        return

    def fence(v):
        return float(np.asarray(v.ravel()[0]))

    probe = jax.device_put(jnp.zeros((8,), jnp.float32))
    fence(probe)
    rb = []
    for _ in range(5):
        t0 = time.perf_counter()
        fence(probe)
        rb.append(time.perf_counter() - t0)
    readback = sorted(rb)[2]

    def timeit(fn, *a, iters=args.iters):
        fence(fn(*a))
        ts = []
        for k in (iters, 2 * iters):
            t0 = time.perf_counter()
            for _ in range(k):
                out = fn(*a)
            fence(out)
            ts.append((time.perf_counter() - t0 - readback) / k)
        return max(ts) * 1e3  # conservative

    for geom_name, (B, T) in (("parity", (16, 32)), ("stream", (1, 128))):
        x = jax.random.normal(k5, (B, T, 224, 384, 3), jnp.bfloat16)
        print(f"== {geom_name} (B={B}, T={T}) spatial ==", flush=True)
        for name, (fn, w) in spatial.items():
            jf = jax.jit(fn)
            try:
                ms = timeit(jf, x, w.astype(jnp.bfloat16))
                gf = 2 * B * T * 112 * 192 * 147 * 64 / 1e9
                print(f"{name:10s} {ms:8.2f} ms  {gf/ms:6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"{name:10s} FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
        z = jax.random.normal(k5, (B, T, 112, 192, 64), jnp.bfloat16)
        print(f"== {geom_name} temporal ==", flush=True)
        for name, (fn, w) in temporal.items():
            jf = jax.jit(fn)
            try:
                ms = timeit(jf, z, w.astype(jnp.bfloat16))
                to = (T + 6 - 7) // 2 + 1
                gf = 2 * B * to * 112 * 192 * 448 * 64 / 1e9
                print(f"{name:10s} {ms:8.2f} ms  {gf/ms:6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"{name:10s} FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)

        # full-stem compositions (one jit: spatial + temporal, fused)
        print(f"== {geom_name} full stem (spatial+temporal one jit) ==", flush=True)
        combos = [("c2d+pallas", "sp_c2d", "t_pallas"),
                  ("s2d2d+pallas", "sp_s2d2d", "t_pallas"),
                  ("im2col+pallas", "sp_im2col", "t_pallas"),
                  ("s2d2d+concat", "sp_s2d2d", "t_concat"),
                  ("im2col+concat", "sp_im2col", "t_concat"),
                  ("wpair+tpair", "sp_wpair", "t_pair"),
                  ("wpair+c3d", "sp_wpair", "t_c3d"),
                  ("cin4+tpair", "sp_cin4", "t_pair")]
        for cname, sname, tname in combos:
            sfn, sw = spatial[sname]
            tfn, tw = temporal[tname]

            def full(xx, swf=sw, twf=tw, sfn=sfn, tfn=tfn):
                return tfn(sfn(xx, swf.astype(xx.dtype)), twf.astype(xx.dtype))

            try:
                ms = timeit(jax.jit(full), x)
                print(f"{cname:14s} {ms:8.2f} ms", flush=True)
            except Exception as e:
                print(f"{cname:14s} FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
