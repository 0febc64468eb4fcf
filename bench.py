"""Benchmark: saliency inference / training throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Baseline: the reference claims 60 fps real-time inference on GPU
(/root/reference/README.md:27); target is >=600 fps/chip (BASELINE.md).

Default mode measures the production ViNet inference path: BN folded into
convs, bf16 weights/activations (f32 accumulation), B sliding windows per
call — one saliency map per 32-frame 224x384 window, matching
generate_result.py's per-frame output semantics at batch granularity.

BENCH_MODE=avinet benchmarks AViNet (visual+audio, bilinear fusion;
reference workload generate_result_audio_visual.py:219-230);
BENCH_MODE=train benchmarks the jitted ViNet train step (fwd+bwd+Adam+BN
update, clips/s; reference loop train.py:192-229);
BENCH_MODE=live / avlive benchmark the single-stream incremental server
(inference/live.py; BENCH_LIVE_MICRO / BENCH_LIVE_BATCH);
BENCH_MODE=mlive / avmlive benchmark the MULTI-STREAM server
(inference/serving.py; BENCH_MLIVE_STREAMS concurrent streams, aggregate
maps/s).

BENCH_MODE=fusion benchmarks AViNetFusion (transformer fusion,
reference model.py:116-189); BENCH_MODE=trainfix runs a tiny fixed-seed
from-scratch train on a synthetic fixture and reports the final val CC —
an accuracy canary that lands in the driver bench artifact.

The default full mode attaches streaming / live / train / AV / accuracy
records to the parity headline, BUDGET-GATED (VERDICT r4 item 1): the
parity record is computed first and is guaranteed to be printed no matter
what — each later stage runs only if the remaining BENCH_BUDGET_S
(default 1200 s) covers its cold-cache cost estimate, the best-so-far
record is persisted after every stage, a SIGTERM handler prints it before
dying, and a forked watchdog prints it even if the parent is killed
inside an uninterruptible XLA compile. Skipped stages are listed in the
record's "skipped" field. BENCH_FULL_<STAGE>=0 disables a stage outright.

Timing methodology (NOTES.md "Measurement"): block_until_ready is a no-op on
this stack; the only reliable fence is a host readback (~30 ms through the
tunnel). We time N dispatches + one readback, subtract a measured readback
baseline, and CROSS-CHECK LINEARITY by also timing 2N dispatches — if the
two disagree, a "linearity_warn" field is emitted and the slower (more
conservative) estimate is reported.
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_T0 = time.time()
_RECORD_PATH = f"/tmp/vinet_bench_{os.getpid()}.json"
_DONE_PATH = _RECORD_PATH + ".done"


def _budget_s():
    # Default 1200 s: round 3's driver bench PASSED at >= ~1400 s of cold
    # stages (parity 377 + streaming 130 + live 345 + train 493 + overhead),
    # so the driver timeout is at least that; 1200 leaves headroom while
    # fitting parity+streaming+train cold (~1000 s measured r5). The
    # watchdog/SIGTERM printers cover the case where even this is too long.
    return float(os.environ.get("BENCH_BUDGET_S", "1200"))


def _remaining_s():
    return _budget_s() - (time.time() - _T0)


def _save_best(record):
    """Persist the best-so-far record atomically for the watchdog/handler."""
    tmp = _RECORD_PATH + ".tmp"
    with open(tmp, "w") as f:
        f.write(json.dumps(record))
    os.replace(tmp, _RECORD_PATH)


def _mark_done():
    with open(_DONE_PATH, "w") as f:
        f.write("done")


def _spawn_watchdog():
    """Fork a child that prints the persisted best-so-far record to stdout
    if the parent dies without printing it (e.g. SIGKILL, or SIGTERM while
    stuck inside an uninterruptible XLA compile — Python signal handlers
    only run at bytecode boundaries, so the in-process compile stages can't
    honor SIGTERM themselves). Forked before any JAX backend init; the
    child touches no JAX state."""
    pid = os.fork()
    if pid:
        return
    ppid = os.getppid()
    while True:
        time.sleep(0.5)
        if os.path.exists(_DONE_PATH):
            os._exit(0)  # parent printed its own record
        try:
            os.kill(ppid, 0)
        except OSError:
            break  # parent is gone
    if os.path.exists(_RECORD_PATH) and not os.path.exists(_DONE_PATH):
        try:
            with open(_RECORD_PATH, "rb") as f:
                data = f.read().strip()
            if data:
                os.write(1, data + b"\n")
        except OSError:
            pass
    os._exit(0)


def _install_sigterm_printer():
    """Best-effort: on SIGTERM print the persisted record and exit. (If the
    main thread is inside a long C call the handler is deferred and the
    watchdog covers instead.)"""

    def _handler(signum, frame):
        try:
            if os.path.exists(_RECORD_PATH):
                with open(_RECORD_PATH) as f:
                    rec = json.loads(f.read())
                rec["terminated_early"] = True
                print(json.dumps(rec), flush=True)
                _mark_done()
        finally:
            os._exit(0)

    signal.signal(signal.SIGTERM, _handler)


def _fence_fn():
    import numpy as np

    def fence(x):
        return float(np.asarray(x.ravel()[0]))

    return fence


def _extend_platforms_with_cpu():
    """Make a local CPU backend available alongside the TPU: model.init and
    input generation then compile LOCALLY (instant) instead of paying 10-60 s
    REMOTE compiles per RNG shape — measured round 5: the avinet subprocess
    spent ~4 min in jax.random compiles before ever compiling the model.
    Must run before jax initializes a backend."""
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats.split(","):
        os.environ["JAX_PLATFORMS"] = plats + ",cpu"


def _cpu_device():
    import jax

    try:
        return jax.devices("cpu")[0]
    except Exception:
        return None


def _init_cpu(model, seed=0):
    """model.init on the local CPU backend (falls back to default device)."""
    import jax

    cpu = _cpu_device()
    if cpu is None:
        return model.init(jax.random.PRNGKey(seed))
    with jax.default_device(cpu):
        return model.init(jax.random.PRNGKey(seed))


def _host_normal(seed, shape, dtype, scale=1.0):
    """Normal random input built host-side (no device RNG compile)."""
    import numpy as np

    import jax.numpy as jnp

    x = scale * np.random.default_rng(seed).standard_normal(shape)
    return jnp.asarray(x.astype(np.float32), dtype)


def _host_randint_u8(seed, shape):
    import numpy as np

    import jax.numpy as jnp

    return jnp.asarray(
        np.random.default_rng(seed).integers(0, 255, shape, dtype=np.uint8))


def _host_uniform(seed, shape, lo, hi, dtype):
    import numpy as np

    import jax.numpy as jnp

    u = np.random.default_rng(seed).uniform(lo, hi, shape)
    return jnp.asarray(u.astype(np.float32), dtype)


def _peak_tflops():
    """bf16 peak of the bench chip for MFU; v5e ~197 TF/s (override with
    BENCH_PEAK_TFLOPS for other parts)."""
    return float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))


def _cost_flops(jitted_fn, *args, **kwargs):
    """Total FLOPs of one call via XLA cost analysis, or None if the
    backend doesn't expose it (VERDICT r2 weak #3: report FLOPs + MFU)."""
    try:
        c = jitted_fn.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        f = float(c.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _mfu_fields(out, flops_per_item, rate):
    """Attach flops_per_item_g + mfu to a bench record (rate in items/s)."""
    if flops_per_item:
        out["flops_per_item_g"] = round(flops_per_item / 1e9, 2)
        out["mfu"] = round(rate * flops_per_item / (_peak_tflops() * 1e12), 4)
    return out


def _readback_baseline(fence):
    import jax
    import jax.numpy as jnp

    probe = jax.device_put(jnp.zeros((8,), jnp.float32))
    fence(probe)
    rb = []
    for _ in range(5):
        t0 = time.perf_counter()
        fence(probe)
        rb.append(time.perf_counter() - t0)
    return sorted(rb)[len(rb) // 2]


def _timed_rate(fn, args, n_items, iters, fence, readback):
    """Items/sec over `iters` dispatches with linearity cross-check at 2x."""
    fence(fn(*args))  # warm / compile
    rates = []
    for k in (iters, 2 * iters):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        fence(out)
        dt = max(time.perf_counter() - t0 - readback, 1e-9)
        rates.append(n_items * k / dt)
    # linear => both estimates agree; report the conservative one
    warn = abs(rates[0] - rates[1]) / max(rates) > 0.15
    return min(rates), warn


def _latency_b1(fn, args, fence, readback):
    """p50 wall latency (incl. one fence) and amortized per-dispatch device
    time (30 enqueued calls / one fence — an upper bound on device compute)."""
    fence(fn(*args))
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        fence(fn(*args))
        lat.append(time.perf_counter() - t0)
    lat.sort()
    p50_wall = max(lat[len(lat) // 2] - readback, 0.0) * 1e3

    t0 = time.perf_counter()
    for _ in range(30):
        out = fn(*args)
    fence(out)
    amortized = max(time.perf_counter() - t0 - readback, 1e-9) / 30 * 1e3
    return p50_wall, amortized


def bench_vinet(batch, iters):
    import jax
    import jax.numpy as jnp

    from vinet_tpu.models import ViNet
    from vinet_tpu.models.inference import make_inference_fn

    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    model = ViNet(num_hier=3, clip_size=32)
    params, state = _init_cpu(model)
    clips = _host_normal(1, (batch, 32, 224, 384, 3), jnp.bfloat16)
    if dtype_name == "int8":
        fn, _, _ = make_inference_fn(model, params, state, dtype="int8",
                                     calib_clips=clips[:2].astype(jnp.float32))
    else:
        fn, _, _ = make_inference_fn(model, params, state, dtype=jnp.bfloat16)

    fence = _fence_fn()
    readback = _readback_baseline(fence)
    fps, warn = _timed_rate(fn, (clips,), batch, iters, fence, readback)
    one = clips[:1]
    p50_wall, p50_dev = _latency_b1(fn, (one,), fence, readback)

    flops = _cost_flops(fn, clips)
    out = {
        "metric": "vinet_saliency_fps_per_chip",
        "value": round(fps, 1),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 2),
        "batch": batch,
        "p50_latency_ms_b1": round(p50_wall, 2),
        "p50_device_ms_b1": round(p50_dev, 2),
        "dtype": dtype_name,
        "device": str(jax.devices()[0]),
    }
    _mfu_fields(out, flops / batch if flops else None, fps)
    if warn:
        out["linearity_warn"] = True
    return out


def bench_avinet(batch, iters):
    import jax
    import jax.numpy as jnp

    from vinet_tpu.models import AViNet
    from vinet_tpu.models.inference import make_inference_fn

    model = AViNet()
    params, state = _init_cpu(model)
    fn, _, _ = make_inference_fn(model, params, state, dtype=jnp.bfloat16)
    clips = _host_normal(1, (batch, 32, 224, 384, 3), jnp.bfloat16)
    audio = _host_normal(2, (batch, 70560, 1), jnp.bfloat16, scale=0.1)

    fence = _fence_fn()
    readback = _readback_baseline(fence)
    fps, warn = _timed_rate(fn, (clips, audio), batch, iters, fence, readback)
    flops = _cost_flops(fn, clips, audio)
    out = {
        "metric": "avinet_saliency_fps_per_chip",
        "value": round(fps, 1),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 2),
        "batch": batch,
        "dtype": "bfloat16",
        "device": str(jax.devices()[0]),
    }
    _mfu_fields(out, flops / batch if flops else None, fps)
    if warn:
        out["linearity_warn"] = True
    return out


def bench_fusion(batch, iters):
    """AViNetFusion (transformer-fusion AV model, reference model.py:116-189)
    sliding-window throughput — the last model family without a bench record
    (VERDICT r4 item 7)."""
    import jax
    import jax.numpy as jnp

    from vinet_tpu.models import AViNetFusion
    from vinet_tpu.models.inference import make_inference_fn

    model = AViNetFusion()
    params, state = _init_cpu(model)
    fn, _, _ = make_inference_fn(model, params, state, dtype=jnp.bfloat16)
    clips = _host_normal(1, (batch, 32, 224, 384, 3), jnp.bfloat16)
    audio = _host_normal(2, (batch, 70560, 1), jnp.bfloat16, scale=0.1)

    fence = _fence_fn()
    readback = _readback_baseline(fence)
    fps, warn = _timed_rate(fn, (clips, audio), batch, iters, fence, readback)
    flops = _cost_flops(fn, clips, audio)
    out = {
        "metric": "avinet_fusion_fps_per_chip",
        "value": round(fps, 1),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 2),
        "batch": batch,
        "dtype": "bfloat16",
        "device": str(jax.devices()[0]),
    }
    _mfu_fields(out, flops / batch if flops else None, fps)
    if warn:
        out["linearity_warn"] = True
    return out


def bench_streaming(batch, iters):
    """Device-side throughput of the streaming sliding-window pipeline
    (inference/streaming.py): whole-video backbone timelines + per-window
    decoder batches + blur, counting one map per frame — the actual
    generate_result workload (reference generate_result.py:58-73), with the
    backbone amortized across overlapping windows instead of recomputed
    32x per frame. Host I/O excluded (device-resident frames, fenced)."""
    import jax
    import jax.numpy as jnp

    from vinet_tpu.data.pipeline import device_preprocess
    from vinet_tpu.inference.streaming import (
        decode_windows_v2, dense_decoder_front, streaming_pyramid)
    from vinet_tpu.models import ViNet
    from vinet_tpu.models.inference import cast_floating, fold_batchnorms
    from vinet_tpu.ops.image import gaussian_blur

    chunk = int(os.environ.get("BENCH_CHUNK", "128"))
    model = ViNet(num_hier=3, clip_size=32)
    params, state = _init_cpu(model)
    params, state = fold_batchnorms(params, state)
    params = cast_floating(params, jnp.bfloat16)
    state = cast_floating(state, jnp.bfloat16)

    frames = _host_randint_u8(1, (chunk, 224, 384, 3))

    @jax.jit
    def timeline(frames_u8):
        x = device_preprocess(frames_u8[None]).astype(jnp.bfloat16)
        tl = streaming_pyramid(params["backbone"], state.get("backbone", {}), x)
        return tl, dense_decoder_front(params["decoder"], tl)

    @jax.jit
    def decode(tl, dense, starts):
        out = decode_windows_v2(model.decoder, params["decoder"], tl, dense, starts)
        return gaussian_blur(out.astype(jnp.float32), ksize=11)

    n_batches = (chunk - 32 + 1) // batch
    starts_all = [jnp.arange(i * batch, (i + 1) * batch, dtype=jnp.int32)
                  for i in range(n_batches)]

    def run():
        tl, dense = timeline(frames)
        out = None
        for s in starts_all:
            out = decode(tl, dense, s)
        return out

    fence = _fence_fn()
    readback = _readback_baseline(fence)
    maps_per_iter = n_batches * batch
    fence(run())
    rates = []
    for k in (iters, 2 * iters):
        t0 = time.perf_counter()
        for _ in range(k):
            out = run()
        fence(out)
        dt = max(time.perf_counter() - t0 - readback, 1e-9)
        rates.append(maps_per_iter * k / dt)
    warn = abs(rates[0] - rates[1]) / max(rates) > 0.15
    tl_c, dense_c = timeline(frames)
    f_tl = _cost_flops(timeline, frames)
    f_dec = _cost_flops(decode, tl_c, dense_c, starts_all[0])
    flops_map = ((f_tl + n_batches * f_dec) / maps_per_iter
                 if f_tl and f_dec else None)
    out = {
        "metric": "vinet_streaming_fps_per_chip",
        "value": round(min(rates), 1),
        "unit": "maps/s",
        "vs_baseline": round(min(rates) / 60.0, 2),
        "batch": batch,
        "chunk": chunk,
        "dtype": "bfloat16",
        "device": str(jax.devices()[0]),
    }
    _mfu_fields(out, flops_map, min(rates))
    if warn:
        out["linearity_warn"] = True
    return out


def bench_avstream(batch, iters):
    """Device-side AViNet streaming throughput: shared visual timelines +
    per-window SoundNet/bilinear fusion (inference/streaming.py
    AVStreamingPredictor machinery; reference workload
    generate_result_audio_visual.py sliding windows)."""
    import jax
    import jax.numpy as jnp

    from vinet_tpu.inference.streaming import AVStreamingPredictor
    from vinet_tpu.models import AViNet

    chunk = int(os.environ.get("BENCH_CHUNK", "128"))
    model = AViNet()
    params, state = _init_cpu(model)
    pred = AVStreamingPredictor(model, params, state, clip_size=32,
                                batch=batch, chunk=chunk)
    frames = _host_randint_u8(1, (chunk, 224, 384, 3))
    audio = _host_normal(2, (batch, 70560, 1), jnp.float32, scale=0.1)

    timeline = pred._timeline_fn()
    decode = pred._decode_fn()
    n_batches = (chunk - 32 + 1) // batch
    starts_all = [jnp.arange(i * batch, (i + 1) * batch, dtype=jnp.int32)
                  for i in range(n_batches)]
    flip = jnp.asarray(False)

    def run():
        tl, dense = timeline(frames, flip)
        out = None
        for s in starts_all:
            out = decode(tl, dense, s, audio)
        return out

    fence = _fence_fn()
    readback = _readback_baseline(fence)
    fence(run())
    maps_per_iter = n_batches * batch
    rates = []
    for k in (iters, 2 * iters):
        t0 = time.perf_counter()
        for _ in range(k):
            out = run()
        fence(out)
        dt = max(time.perf_counter() - t0 - readback, 1e-9)
        rates.append(maps_per_iter * k / dt)
    warn = abs(rates[0] - rates[1]) / max(rates) > 0.15
    tl_c, dense_c = timeline(frames, flip)
    f_tl = _cost_flops(timeline, frames, flip)
    f_dec = _cost_flops(decode, tl_c, dense_c, starts_all[0], audio)
    flops_map = ((f_tl + n_batches * f_dec) / maps_per_iter
                 if f_tl and f_dec else None)
    out = {
        "metric": "avinet_streaming_fps_per_chip",
        "value": round(min(rates), 1),
        "unit": "maps/s",
        "vs_baseline": round(min(rates) / 60.0, 2),
        "batch": batch,
        "chunk": chunk,
        "dtype": "bfloat16",
        "device": str(jax.devices()[0]),
    }
    _mfu_fields(out, flops_map, min(rates))
    if warn:
        out["linearity_warn"] = True
    return out


def _bench_live_impl(iters, av: bool, streams: int = 1):
    """Device-side steady-state rate of the LIVE incremental server
    (inference/live.py): per microbatch, one overlap-save segment advance
    (extends the dense phase timelines) + decode in groups of the measured
    decode optimum (16) + post. This is the per-frame-latency serving mode
    (constant ~57-frame architectural lag + the microbatch) — no offline
    counterpart in the reference. Host frame upload excluded
    (device-resident microbatch, fenced). Microbatch tradeoff (BENCH_LIVE_
    MICRO): the advance cost is nearly flat in micro (the segment tails'
    receptive-diameter recompute dominates), so bigger micro = higher
    throughput, +1 frame lag per frame of micro. AV adds per-window
    SoundNet + bilinear fusion at decode (audio device-resident).

    streams > 1 benchmarks the MULTI-STREAM server (inference/serving.py):
    S synchronized streams batched into one vmapped advance/decode pipeline;
    the reported rate is the AGGREGATE maps/s across streams."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    micro = int(os.environ.get("BENCH_LIVE_MICRO", "16"))
    # decode batch decoupled from micro: 16 is the measured decode optimum
    # (r2 batch sweep), and _decode_live groups windows by `batch` anyway
    batch_d = int(os.environ.get("BENCH_LIVE_BATCH", str(min(16, micro))))
    assert micro % batch_d == 0, (micro, batch_d)
    span = max(224, ((96 + 32 + 2 * micro + 7) // 8) * 8)
    rng = np.random.default_rng(0)
    multi = streams > 1
    spf = 22050 / 30.0
    if av:
        from vinet_tpu.models import AViNet

        model = AViNet()
        params, state = _init_cpu(model)
        if multi:
            from vinet_tpu.inference.serving import AVMultiLiveServer

            live = AVMultiLiveServer(
                model, params, state, streams=streams, fps=30.0,
                clip_size=32, batch=batch_d, micro=micro, span=span)
        else:
            from vinet_tpu.inference.live import AVLiveStreamingPredictor

            live = AVLiveStreamingPredictor(
                model, params, state, fps=30.0, clip_size=32, batch=batch_d,
                micro=micro, span=span)
    else:
        from vinet_tpu.models import ViNet

        model = ViNet(num_hier=3, clip_size=32)
        params, state = _init_cpu(model)
        if multi:
            from vinet_tpu.inference.serving import MultiLiveServer

            live = MultiLiveServer(model, params, state, streams=streams,
                                   clip_size=32, batch=batch_d, micro=micro,
                                   span=span)
        else:
            from vinet_tpu.inference.live import LiveStreamingPredictor

            live = LiveStreamingPredictor(model, params, state, clip_size=32,
                                          batch=batch_d, micro=micro, span=span)
    shape = ((streams, live.span + micro, 224, 384, 3) if multi
             else (live.span + micro, 224, 384, 3))
    frames = rng.integers(0, 255, shape).astype(np.uint8)
    for lo in range(0, live.span + micro, micro):  # builds _dev + jitted fns
        kw = {}
        if av:
            a = 0.01 * rng.standard_normal(int(micro * spf)).astype(np.float32)
            kw["audio"] = [a] * streams if multi else a
        fr = frames[:, lo:lo + micro] if multi else frames[lo:lo + micro]
        for _ in live.feed(fr, **kw):
            pass

    advance = live._advance_fn()
    decode = live._decode_fn()
    post = live._post_fn(live._out_hw, False)
    frames_dev = jnp.asarray(frames[:, :micro] if multi else frames[:micro])
    starts_groups = [jnp.arange(lo, lo + batch_d, dtype=jnp.int32)
                     for lo in range(0, micro, batch_d)]
    audio_dev = None
    if av:
        from vinet_tpu.data.audio import MAX_AUDIO_WIN

        ashape = ((streams, batch_d, MAX_AUDIO_WIN, 1) if multi
                  else (batch_d, MAX_AUDIO_WIN, 1))
        audio_dev = jnp.asarray(
            0.01 * rng.standard_normal(ashape).astype(np.float32))
    dev = live._dev
    voff = (slice(None), slice(None)) if multi else (slice(None),)

    def step(dev_):
        tails, bufs = advance(dev_[0], dev_[1], frames_dev)
        v = {k: bufs[k][voff + (slice(off, None),)]
             for k, off in live._VIEW_OFF.items() if k in bufs}
        timelines = (v["y0"], v["y1"], v["y2"], v["y3"])
        dense = ((v.get("c1u"), v["c2y"], v["c3y"], v["c4y"])
                 if live._use_v2() else None)
        if av:
            outs = [post(decode(timelines, dense, s, audio_dev))
                    for s in starts_groups]
        else:
            outs = [post(decode(timelines, dense, s)) for s in starts_groups]
        return (tails, bufs), outs[-1]

    fence = _fence_fn()
    readback = _readback_baseline(fence)
    dev, out0 = step(dev)
    fence(out0)
    rates = []
    for k in (iters, 2 * iters):
        t0 = time.perf_counter()
        for _ in range(k):
            dev, out = step(dev)
        fence(out)
        dt = max(time.perf_counter() - t0 - readback, 1e-9)
        rates.append(streams * micro * k / dt)
    warn = abs(rates[0] - rates[1]) / max(rates) > 0.15
    name = ("avinet" if av else "vinet") + (
        f"_mlive{streams}" if multi else "_live")
    out = {
        "metric": name + "_maps_per_s_per_chip",
        "value": round(min(rates), 1),
        "unit": "maps/s",
        "vs_baseline": round(min(rates) / 60.0, 2),
        "micro": micro,
        "decode_batch": batch_d,
        "steady_ms_per_micro": round(1e3 * streams * micro / min(rates), 2),
        "pipeline_lag_frames": 57 + micro,
        "dtype": "bfloat16",
        "device": str(jax.devices()[0]),
    }
    if multi:
        out["streams"] = streams
        out["per_stream_maps_per_s"] = round(min(rates) / streams, 1)
    if warn:
        out["linearity_warn"] = True
    return out


def bench_live(batch, iters):
    return _bench_live_impl(iters, av=False)


def bench_avlive(batch, iters):
    return _bench_live_impl(iters, av=True)


def bench_mlive(batch, iters):
    return _bench_live_impl(
        iters, av=False,
        streams=int(os.environ.get("BENCH_MLIVE_STREAMS", "4")))


def bench_avmlive(batch, iters):
    return _bench_live_impl(
        iters, av=True,
        streams=int(os.environ.get("BENCH_MLIVE_STREAMS", "4")))


def bench_streamft(batch, iters):
    """Accuracy record for the committed streaming-FT artifact (VERDICT r3
    item 4): loads artifacts/streamft_fixture.npz and scores parity vs
    streaming inference against the synthetic fixture's ground truth
    (vinet_tpu/inference/accuracy.py) — so the bench artifact itself says
    what the streaming maps/s number buys and costs accuracy-wise."""
    import jax.numpy as jnp

    from vinet_tpu.inference.accuracy import evaluate_modes, load_artifact
    from vinet_tpu.models import ViNet

    path = os.environ.get(
        "VINET_STREAMFT_CKPT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "artifacts", "streamft_fixture.npz"))
    out = {"metric": "streaming_ft_accuracy", "unit": "cc",
           "artifact": os.path.basename(path)}
    if not os.path.exists(path):
        out["skipped"] = "artifact missing"
        return out
    import jax

    model = ViNet(num_hier=3, clip_size=32)
    cpu = _cpu_device()
    if cpu is not None:
        with jax.default_device(cpu):
            params, state = load_artifact(path, model)
    else:
        params, state = load_artifact(path, model)
    r = evaluate_modes(model, params, state,
                       n_frames=int(os.environ.get("BENCH_FT_FRAMES", "96")),
                       seeds=(100, 101), dtype=jnp.bfloat16, batch=batch)
    out.update(value=round(r["cc_delta"], 4), vs_baseline=0.0,
               parity_cc=round(r["parity_cc"], 4),
               streaming_cc=round(r["streaming_cc"], 4),
               agreement_cc=round(r["agreement_cc"], 4),
               frames_scored=r["frames_scored"])
    if os.environ.get("BENCH_FT_SUITE", "1") != "0":
        # fixture SUITE deltas (VERDICT r4 item 3): worst/mean CC delta
        # across 5 distinct-dynamics fixtures, so the accuracy claim is
        # not an n=1 statement
        from vinet_tpu.inference.accuracy import evaluate_fixture_suite

        s = evaluate_fixture_suite(
            model, params, state,
            n_frames=int(os.environ.get("BENCH_FT_SUITE_FRAMES", "72")),
            dtype=jnp.bfloat16, batch=batch)
        out.update(cc_delta_min=round(s["cc_delta_min"], 4),
                   cc_delta_mean=round(s["cc_delta_mean"], 4),
                   fixtures={r_["kind"]: round(r_["cc_delta"], 4)
                             for r_ in s["fixtures"]})
    if os.environ.get("BENCH_FT_AV", "0") == "1":
        # AV variant (VERDICT r4 item 3): FT'd visual weights grafted into
        # AViNet (seeded-init fusion), per-window audio excerpts — does the
        # visual FT keep AV streaming agreeing with AV parity?
        from vinet_tpu.inference.accuracy import evaluate_av_agreement
        from vinet_tpu.models import AViNet

        av = AViNet()
        avp, avs = _init_cpu(av)
        avp["visual_model"] = params
        avs["visual_model"] = state
        a = evaluate_av_agreement(
            av, avp, avs,
            n_frames=int(os.environ.get("BENCH_FT_SUITE_FRAMES", "72")),
            dtype=jnp.bfloat16, batch=batch)
        out.update(av_agreement_min=round(a["agreement_min"], 4),
                   av_agreement_mean=round(a["agreement_mean"], 4))
    return out


def bench_train(batch, iters):
    import jax
    import jax.numpy as jnp

    from vinet_tpu.models import ViNet
    from vinet_tpu.training import LossConfig
    from vinet_tpu.training.trainer import adam, init_train_state, make_train_step

    model = ViNet(num_hier=3, clip_size=32)
    optimizer = adam(1e-4)
    ts = init_train_state(model, jax.random.PRNGKey(0), optimizer)
    dtype_name = os.environ.get("BENCH_TRAIN_DTYPE", "bfloat16")
    # BENCH_TRAIN_ACCUM=N scans N microbatches of BENCH_BATCH/N clips per
    # step (NOTES.md: effective batch 32 at full B=8 throughput)
    accum = int(os.environ.get("BENCH_TRAIN_ACCUM", "1"))
    assert batch % accum == 0, (
        f"BENCH_BATCH={batch} must be divisible by BENCH_TRAIN_ACCUM={accum}")
    step = make_train_step(
        model, LossConfig(), optimizer, donate=False,
        compute_dtype=jnp.bfloat16 if dtype_name == "bfloat16" else None,
        grad_accum=accum)
    batch_d = {
        "clip": _host_normal(1, (batch, 32, 224, 384, 3), jnp.float32),
        "gt": _host_uniform(2, (batch, 224, 384), 0.05, 1.0, jnp.float32),
    }

    fence = _fence_fn()
    readback = _readback_baseline(fence)

    def run(ts_, b_):
        return step(ts_, b_)[1]["loss"]

    fn = lambda: run(ts, batch_d)
    fence(fn())
    rates = []
    for k in (iters, 2 * iters):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        fence(out)
        dt = max(time.perf_counter() - t0 - readback, 1e-9)
        rates.append(batch * k / dt)
    warn = abs(rates[0] - rates[1]) / max(rates) > 0.15
    if accum == 1:
        flops = _cost_flops(step, ts, batch_d)
    else:
        # cost_analysis counts a lax.scan body ONCE, so analyze one
        # microbatch through an accum=1 step and scale per-item from there
        micro = batch // accum
        step1 = make_train_step(
            model, LossConfig(), optimizer, donate=False,
            compute_dtype=jnp.bfloat16 if dtype_name == "bfloat16" else None)
        mb = {k: v[:micro] for k, v in batch_d.items()}
        f1 = _cost_flops(step1, ts, mb)
        flops = f1 / micro * batch if f1 else None
    out = {
        "metric": "vinet_train_clips_per_sec_per_chip",
        "value": round(min(rates), 2),
        "unit": "clips/s",
        # reference envelope: batch 8 on an unspecified GPU (train.py:22) —
        # no published steps/s; vs_baseline left vs the 60fps claim's 1.875
        # clips/s-equivalent (60 fps / 32 frames) for continuity
        "vs_baseline": round(min(rates) / (60.0 / 32.0), 2),
        "batch": batch,
        "grad_accum": accum,
        "dtype": dtype_name,
        "device": str(jax.devices()[0]),
    }
    _mfu_fields(out, flops / batch if flops else None, min(rates))
    if warn:
        out["linearity_warn"] = True
    return out


def bench_trainfix(batch, iters):
    """Accuracy canary (VERDICT r4 item 6): a tiny fixed-seed FROM-SCRATCH
    train on in-memory synthetic moving-blob clips (small geometry: clip 8,
    64x96), then val CC of the trained model on a held-out fixed-seed
    fixture. Everything is seeded (data rng, init key, dropout-free model),
    so the number is stable run-to-run and a training-path regression
    (loss, optimizer, BN update, preprocess) shows up in the driver bench
    artifact, not only in pytest. Reference training semantics being
    exercised: train.py:192-229's loop at miniature scale."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from vinet_tpu.metrics.saliency import cc_score
    from vinet_tpu.models import ViNet
    from vinet_tpu.training import LossConfig
    from vinet_tpu.training.trainer import adam, init_train_state, make_train_step

    steps = int(os.environ.get("BENCH_TRAINFIX_STEPS", "60"))
    b, t, h, w = 4, 8, 64, 96
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    def blob_batch(rng, n):
        clips = np.empty((n, t, h, w, 3), np.float32)
        gts = np.empty((n, h, w), np.float32)
        for i in range(n):
            cy, cx = rng.uniform(12, h - 12), rng.uniform(12, w - 12)
            vy, vx = rng.uniform(-2, 2), rng.uniform(-2, 2)
            sigma = rng.uniform(3.5, 7.0)
            for f in range(t):
                cy = float(np.clip(cy + vy, 8, h - 8))
                cx = float(np.clip(cx + vx, 8, w - 8))
                g = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2))
                img = rng.integers(0, 80, (h, w, 3)) + 170.0 * g[..., None]
                clips[i, f] = np.clip(img, 0, 255)
            gts[i] = g  # GT = map of the LAST frame (dataloader.py:262 semantics)
        clips = (clips / 255.0 - mean) / std
        return clips, gts

    model = ViNet(num_hier=3, clip_size=t)
    optimizer = adam(1e-3)
    cpu = _cpu_device()
    if cpu is not None:
        with jax.default_device(cpu):
            ts = init_train_state(model, jax.random.PRNGKey(0), optimizer)
    else:
        ts = init_train_state(model, jax.random.PRNGKey(0), optimizer)
    step = make_train_step(model, LossConfig(), optimizer, donate=False,
                           compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(1234)
    loss = None
    for _ in range(steps):
        clips, gts = blob_batch(rng, b)
        ts, metrics = step(ts, {"clip": jnp.asarray(clips), "gt": jnp.asarray(gts)})
        loss = float(metrics["loss"])

    from vinet_tpu.training.trainer import recalibrate_bn

    cal_rng = np.random.default_rng(555)
    cal = [{"clip": jnp.asarray(blob_batch(cal_rng, b)[0])} for _ in range(4)]
    bn_state = recalibrate_bn(model, ts["params"], ts["state"], cal)
    val_rng = np.random.default_rng(999)
    vclips, vgts = blob_batch(val_rng, 8)
    preds, _ = jax.jit(lambda p, s, x: model.apply(p, s, x))(
        ts["params"], bn_state, jnp.asarray(vclips))
    preds = np.asarray(preds, np.float32)
    ccs = [cc_score(preds[i], vgts[i]) for i in range(len(vgts))]
    return {
        "metric": "train_fixture_cc",
        "value": round(float(np.mean(ccs)), 4),
        "unit": "cc",
        "vs_baseline": 0.0,
        "steps": steps,
        "final_loss": round(loss, 4),
        "device": str(jax.devices()[0]),
    }


def bench_full(batch, iters):
    """Headline: REFERENCE-EXACT sliding-window throughput (one full-window
    forward per emitted map, generate_result semantics,
    /root/reference/generate_result.py:58-73) — the same function as the
    reference's "real-time (60 fps)" claim, so vs_baseline is like-for-like.

    The --streaming encoder (backbone amortized across overlapping windows)
    is reported alongside as streaming_maps_per_s: it is SEVERAL TIMES
    faster but NOT output-equivalent — a parity-trained checkpoint served
    through it scores CC ~0.53 vs ground truth where parity scores ~0.80.
    Streaming-consistent fine-tuning (train.py --streaming_ft) recovers
    most of that (CC 0.76 streaming / 0.83 parity, same checkpoint) but
    the semantics remain a different function, so parity stays the
    headline (scripts/exp_streaming_{trained,ft}.py, NOTES.md round 3)."""
    parity = bench_vinet(batch, iters)
    out = dict(parity)
    out["metric"] = "vinet_saliency_fps_per_chip"
    out["mode"] = "parity_sliding_window"
    stage_s = {"parity": round(time.time() - _T0, 1)}
    out["stage_s"] = stage_s
    _save_best(out)

    def _merge_warn(rec):
        if rec.get("linearity_warn"):
            out["linearity_warn"] = True

    def stage_streaming():
        # backbone amortized across overlapping windows — SEVERAL TIMES
        # faster than parity but NOT output-equivalent; the FT accuracy
        # story is the streamft stage (NOTES.md round 3)
        stream = bench_streaming(batch, iters)
        out["streaming_maps_per_s"] = stream["value"]
        if "mfu" in stream:
            out["streaming_mfu"] = stream["mfu"]
            out["streaming_flops_per_item_g"] = stream["flops_per_item_g"]
        out["streaming_equivalent"] = False
        _merge_warn(stream)

    def stage_train():
        # SUBPROCESS so the B=8 fwd+bwd+Adam step gets the whole HBM
        train = _sub_record("train", {"BENCH_BATCH": "8", "BENCH_ITERS": "5"})
        if train:
            out["train_clips_per_s"] = train["value"]
            out["train_dtype"] = train["dtype"]
            if "mfu" in train:
                out["train_mfu"] = train["mfu"]

    def stage_live():
        # per-frame-latency serving mode (inference/live.py)
        live = bench_live(batch, iters)
        out["live_maps_per_s"] = live["value"]
        out["live_steady_ms_per_micro"] = live["steady_ms_per_micro"]
        _merge_warn(live)

    def stage_avinet():
        av = _sub_record("avinet", {"BENCH_ITERS": "10"})
        if av:
            out["avinet_fps"] = av["value"]
            if "mfu" in av:
                out["avinet_mfu"] = av["mfu"]

    def stage_avstream():
        avs = _sub_record("avstream", {"BENCH_ITERS": "10"})
        if avs:
            out["avinet_streaming_maps_per_s"] = avs["value"]
            if "mfu" in avs:
                out["avinet_streaming_mfu"] = avs["mfu"]

    def stage_fusion():
        fus = _sub_record("fusion", {"BENCH_ITERS": "10"})
        if fus:
            out["avinet_fusion_fps"] = fus["value"]
            if "mfu" in fus:
                out["avinet_fusion_mfu"] = fus["mfu"]

    def stage_streamft():
        ft = _sub_record("streamft", {})
        if ft and "value" in ft:
            out["streaming_ft_cc_delta"] = ft["value"]
            out["streaming_ft_agreement_cc"] = ft["agreement_cc"]
            out["streaming_ft_parity_cc"] = ft["parity_cc"]
            for k in ("cc_delta_min", "cc_delta_mean", "fixtures"):
                if k in ft:
                    out["streaming_ft_" + k] = ft[k]

    def stage_trainfix():
        tf = _sub_record("trainfix", {})
        if tf and "value" in tf:
            out["train_fixture_cc"] = tf["value"]
            out["train_fixture_loss"] = tf["final_loss"]

    ft_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "artifacts", "streamft_fixture.npz")
    # (name, env gate, cold-cache wall estimate s, runner) in priority
    # order: the cheapest way to stay under BENCH_BUDGET_S is to skip from
    # the tail. trainfix is explicitly the first to be skipped (VERDICT r4
    # item 6), so it sits last.
    # cold-cache wall estimates MEASURED on this chip (round-5 calibration
    # runs; compile dominates — warm-cache runs are 5-20x cheaper so more
    # stages fit when the persistent cache is populated)
    stages = [
        ("streaming", "BENCH_FULL_STREAMING", 160, stage_streaming),
        ("train", "BENCH_FULL_TRAIN", 500, stage_train),
        ("live", "BENCH_FULL_LIVE", 360, stage_live),
        ("streamft", "BENCH_FULL_FT", 1100, stage_streamft),
        ("avinet", "BENCH_FULL_AV", 450, stage_avinet),
        ("avstream", "BENCH_FULL_AV", 500, stage_avstream),
        ("fusion", "BENCH_FULL_FUSION", 520, stage_fusion),
        # explicitly the FIRST stage to lose its budget (VERDICT r4 item 6)
        ("trainfix", "BENCH_FULL_TRAINFIX", 230, stage_trainfix),
    ]
    skipped = []
    for name, gate, est, run in stages:
        if os.environ.get(gate, "1") == "0":
            continue
        if name == "streamft" and not os.path.exists(ft_path):
            continue
        if _remaining_s() < est:
            skipped.append(name)
            continue
        t_stage = time.time()
        try:
            run()
        except Exception as e:
            print(f"bench.py WARNING: stage {name} failed "
                  f"({type(e).__name__}: {e}); fields omitted",
                  file=sys.stderr, flush=True)
            out.setdefault("stage_errors", []).append(name)
        stage_s[name] = round(time.time() - t_stage, 1)
        _save_best(out)
    if skipped:
        out["skipped"] = skipped
    out["bench_wall_s"] = round(time.time() - _T0, 1)
    _save_best(out)
    return out


def _sub_record(mode, env_extra, cap=900):
    """Run `BENCH_MODE=mode` in a subprocess and parse its JSON record.
    Loud failure (advisor r3): an absent record in the bench artifact must
    be diagnosable from stderr, not silent. The timeout is clamped to the
    remaining wall budget so one stuck stage can't eat the whole bench."""
    import subprocess

    timeout = max(60.0, min(cap, _remaining_s()))
    env = dict(os.environ, BENCH_MODE=mode, **env_extra)
    r = None
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           capture_output=True, text=True, timeout=timeout,
                           env=env)
        return json.loads(r.stdout.strip().splitlines()[-1])
    except Exception as e:
        tail = ""
        if r is not None:
            tail = (r.stderr or "")[-400:].replace("\n", " | ")
            tail = f" rc={r.returncode} stderr_tail={tail!r}"
        print(f"bench.py WARNING: BENCH_MODE={mode} subprocess failed "
              f"({type(e).__name__}: {e});{tail} fields omitted",
              file=sys.stderr, flush=True)
        return None


def main():
    _extend_platforms_with_cpu()
    mode = os.environ.get("BENCH_MODE", "full")
    if mode == "full":
        _spawn_watchdog()
        _install_sigterm_printer()

    from vinet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    batch = int(os.environ.get("BENCH_BATCH", "16" if mode != "train" else "8"))
    iters = int(os.environ.get("BENCH_ITERS", "20" if mode != "train" else "5"))
    fn = {"vinet": bench_vinet, "avinet": bench_avinet, "train": bench_train,
          "streaming": bench_streaming, "avstream": bench_avstream,
          "live": bench_live, "avlive": bench_avlive,
          "mlive": bench_mlive, "avmlive": bench_avmlive,
          "streamft": bench_streamft, "fusion": bench_fusion,
          "trainfix": bench_trainfix,
          "full": bench_full}[mode]
    try:
        result = fn(batch, iters)
    except Exception:
        # full mode: a crash after the headline stage must still leave a
        # parsed record — print best-so-far with an error marker, then
        # re-raise so rc/stderr stay diagnostic
        if mode == "full" and os.path.exists(_RECORD_PATH):
            with open(_RECORD_PATH) as f:
                rec = json.loads(f.read())
            rec["error"] = True
            print(json.dumps(rec), flush=True)
            _mark_done()
        raise
    print(json.dumps(result), flush=True)
    if mode == "full":
        _mark_done()


if __name__ == "__main__":
    main()
