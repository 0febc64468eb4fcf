"""A/B the temporal-conv formulations on TPU (round 3): XLA vs the r2 accum
kernel vs the new concat / pmerge single-matmul kernels (pallas_tconv)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    from vinet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax, jax.numpy as jnp
    from vinet_tpu.ops import pallas_tconv as P

    def fence(v):
        return float(np.asarray(v.ravel()[0]))
    probe = jax.device_put(jnp.zeros((8,), jnp.float32)); fence(probe)
    rb = []
    for _ in range(5):
        t0 = time.perf_counter(); fence(probe); rb.append(time.perf_counter()-t0)
    readback = sorted(rb)[2]

    def timeit(fn, *a, iters=10):
        fence(fn(*a))
        ts = []
        for k in (iters, 2*iters):
            t0 = time.perf_counter()
            for _ in range(k):
                out = fn(*a)
            fence(out)
            ts.append((time.perf_counter()-t0-readback)/k)
        return max(ts)*1e3

    geoms = [
        ("stem-t parity", (16, 38, 112, 192, 64, 64, 7, 2, 0)),  # pre-padded
        ("stem-t stream", (1, 134, 112, 192, 64, 64, 7, 2, 0)),
        ("sep192-t", (16, 16, 112, 192, 192, 192, 3, 1, 1)),
        ("sep480-t", (16, 16, 28, 48, 480, 480, 3, 1, 1)),
    ]
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    for name, (b, t, h, w_, c, co, kt, st, pad) in geoms:
        x = jax.random.normal(k1, (b, t, h, w_, c), jnp.bfloat16)
        w = (0.1*jax.random.normal(k2, (kt, 1, 1, c, co), jnp.float32)).astype(jnp.bfloat16)
        to = (t + 2*pad - kt)//st + 1
        gf = 2*b*to*h*w_*kt*c*co/1e9
        print(f"== {name} ({gf:.0f} GF) ==", flush=True)
        for mode in ("0", "accum", "concat", "pmerge"):
            os.environ["VINET_PALLAS_TCONV"] = mode
            fn = jax.jit(lambda xx, ww: P.temporal_conv3d(xx, ww, stride=st, pad=pad))
            try:
                ms = timeit(fn, x, w)
                print(f"  {mode:7s} {ms:7.2f} ms  {gf/ms:6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"  {mode:7s} FAIL {type(e).__name__}: {str(e)[:110]}", flush=True)

if __name__ == "__main__":
    main()
