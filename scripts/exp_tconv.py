"""Isolated A/B: Pallas temporal-conv kernel vs XLA, on the real S3D shapes.

Usage: python scripts/exp_tconv.py
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

    from vinet_tpu.ops.pallas_tconv import _tconv_pallas_fwd, _xla_tconv

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
    print(f"readback {readback*1e3:.1f} ms", flush=True)

    B = 16
    cases = [
        ("stem_t k7 s2 @112x192 64", (B, 32, 112, 192, 64), 64, 7, 2, 3),
        ("b1 sep_t k3 s1 @56x96 192", (B, 16, 56, 96, 192), 192, 3, 1, 1),
        ("mixed sep_t k3 @28x48 208", (B, 8, 28, 48, 208), 208, 3, 1, 1),
    ]
    iters = 20
    for name, xs, cout, k, st, pad in cases:
        x = jax.random.normal(jax.random.PRNGKey(0), xs, jnp.bfloat16)
        w = (jax.random.normal(jax.random.PRNGKey(1), (k, xs[-1], cout), jnp.float32) * 0.05).astype(jnp.bfloat16)
        t_out = (xs[1] + 2 * pad - k) // st + 1
        flops = 2 * B * t_out * xs[2] * xs[3] * xs[4] * k * cout
        line = f"{name:28s}"
        ref = None
        for vname, fn in (
            ("xla", lambda: _xla_tconv(x, w[:, None, None], st, pad)),
            ("accum", lambda: _tconv_pallas_fwd(x, w, stride=st, pad=pad, merged=False)),
            ("merged", lambda: _tconv_pallas_fwd(x, w, stride=st, pad=pad, merged=True)),
        ):
            try:
                y = fn()
                yv = np.asarray(y, np.float32)
                if ref is None:
                    ref = yv
                err = np.abs(yv.reshape(ref.shape) - ref).max()
                fence(y)
                t0 = time.perf_counter()
                for _ in range(iters):
                    y = fn()
                fence(y)
                dt = max(time.perf_counter() - t0 - readback, 1e-9) / iters
                line += f"  {vname}: {dt*1e3:6.2f}ms {flops/dt/1e12:5.1f}TF/s e={err:.1e}"
            except Exception as e:
                line += f"  {vname}: FAIL({type(e).__name__})"
        print(line, flush=True)


if __name__ == "__main__":
    main()
