"""Benchmark: ViNet saliency inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Baseline: the reference claims 60 fps real-time inference on GPU
(/root/reference/README.md:27); target is >=600 fps/chip (BASELINE.md).

Measures the production inference path: BN folded into convs, bf16 weights
and activations (f32 accumulation), B sliding windows per call — one
saliency map per 32-frame 224x384 window, matching generate_result.py's
per-frame output semantics at batch granularity.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from vinet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vinet_tpu.models import ViNet
    from vinet_tpu.models.inference import make_inference_fn

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    model = ViNet(num_hier=3, clip_size=32)
    params, state = model.init(jax.random.PRNGKey(0))
    fn, params_b, state_b = make_inference_fn(model, params, state, dtype=jnp.bfloat16)

    import numpy as np

    clips = jax.random.normal(jax.random.PRNGKey(1), (batch, 32, 224, 384, 3), jnp.bfloat16)

    # NOTE: on this TPU stack block_until_ready() returns early; a host
    # readback of one output element is the only reliable fence. Executions
    # on one device serialize, so timing N dispatches + one final readback
    # measures true device throughput (minus one ~30 ms tunnel round trip,
    # which we subtract via a measured readback baseline).
    def fence(x):
        return float(np.asarray(x.ravel()[0]))

    # warmup / compile
    fence(fn(clips))
    probe = jax.device_put(jnp.zeros((8,), jnp.float32))
    rb = []
    for _ in range(5):
        t0 = time.perf_counter()
        fence(probe)
        rb.append(time.perf_counter() - t0)
    readback = sorted(rb)[len(rb) // 2]

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(clips)
    fence(out)
    dt = max(time.perf_counter() - t0 - readback, 1e-9)
    fps = batch * iters / dt

    # p50 latency at B=1 (includes one readback fence; report both)
    one = clips[:1]
    fence(fn(one))
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        fence(fn(one))
        lat.append(time.perf_counter() - t0)
    lat.sort()
    p50_ms = max(lat[len(lat) // 2] - readback, 0.0) * 1e3

    print(json.dumps({
        "metric": "vinet_saliency_fps_per_chip",
        "value": round(fps, 1),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 2),
        "batch": batch,
        "p50_latency_ms_b1": round(p50_ms, 2),
        "dtype": "bfloat16",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
