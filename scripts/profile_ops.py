"""Per-stage TPU profiler for the ViNet inference graph.

Times each backbone stage and decoder conv as its own jitted program with the
amortized-readback fence from bench.py (block_until_ready is a no-op on this
stack — see NOTES.md "Measurement"). Prints a ms/batch table so kernel work
targets the true hot spots.

Usage: python scripts/profile_ops.py [--batch 16] [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from vinet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vinet_tpu.models import ViNet
    from vinet_tpu.models.inference import cast_floating, fold_batchnorms
    from vinet_tpu.models.layers import MaxPool3d
    from vinet_tpu.models.s3d import S3DBackbone
    from vinet_tpu.models.decoder import Decoder, decoder_plan
    from vinet_tpu.ops.upsample import upsample2x_hw

    model = ViNet(num_hier=3, clip_size=32)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = fold_batchnorms(params, state)
    params = cast_floating(params, jnp.bfloat16)
    state = cast_floating(state, jnp.bfloat16)

    bb = S3DBackbone()
    dec = Decoder(decoder_plan(3, 32))
    bp = params["backbone"]
    dp = params["decoder"]

    base1, base2, base3, base4 = bb._stages()

    def stem(x):  # sep_conv3d(3,64,7,2,3)
        return base1.layers[0].apply(bp["base1"]["0"], {}, x)[0]

    def b1_rest(y):  # maxpool + 1x1 conv + sep_conv3d(64,192,3)
        y = base1.layers[1].apply({}, {}, y)[0]
        y = base1.layers[2].apply(bp["base1"]["2"], {}, y)[0]
        return base1.layers[3].apply(bp["base1"]["3"], {}, y)[0]

    def b2(y3):
        y = MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)).apply({}, {}, y3)[0]
        return base2.apply(bp["base2"], {}, y)[0]

    def b3(y2):
        y = MaxPool3d((3, 3, 3), (2, 2, 2), (1, 1, 1)).apply({}, {}, y2)[0]
        return base3.apply(bp["base3"], {}, y)[0]

    def b4(y1):
        y = MaxPool3d((2, 1, 1), (2, 1, 1), 0).apply({}, {}, y1)[0]
        y = MaxPool3d((1, 2, 2), (1, 2, 2), 0).apply({}, {}, y)[0]
        return base4.apply(bp["base4"], {}, y)[0]

    convs = dec._convs()

    def dstage(name):
        def run(z):
            z = convs[name].apply(dp[name], {}, z)[0]
            z = jax.nn.relu(z)
            return upsample2x_hw(z)
        return run

    def dtail(z):  # conv5 + relu + up + fused head
        z = convs["conv5"].apply(dp["conv5"], {}, z)[0]
        z = jax.nn.relu(z)
        z = upsample2x_hw(z)
        from vinet_tpu.ops.pallas_head import saliency_head
        w6 = dp["conv6"]["w"][:, 0, 0]
        w7 = dp["conv7"]["w"][0, 0, 0, :, 0]
        return saliency_head(z, w6, dp["conv6"].get("b"), w7, dp["conv7"]["b"])

    def full(x):
        return model.apply(params, state, x)[0]

    b = args.batch
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 32, 224, 384, 3), jnp.bfloat16)

    # build intermediates eagerly (jit each stage on first call)
    stages = {}
    stem_j = jax.jit(stem)
    y_stem = stem_j(x)
    b1r_j = jax.jit(b1_rest)
    y3 = b1r_j(y_stem)
    b2_j = jax.jit(b2)
    y2 = b2_j(y3)
    b3_j = jax.jit(b3)
    y1 = b3_j(y2)
    b4_j = jax.jit(b4)
    y0 = b4_j(y1)
    stages["stem(3->64,k7,s2) in(32,224,384)"] = (stem_j, x)
    stages["b1_rest(pool+1x1+sep64->192)"] = (b1r_j, y_stem)
    stages["base2(2 mixed @56x96)"] = (b2_j, y3)
    stages["base3(5 mixed @28x48)"] = (b3_j, y2)
    stages["base4(2 mixed @14x24->7x12)"] = (b4_j, y1)

    # decoder chain intermediates
    d1 = jax.jit(dstage("conv1"))
    z = d1(y0)
    z = jnp.concatenate([z, y1], axis=1)
    stages["dec.conv1(1024->832 @7x12)"] = (d1, y0)
    d2 = jax.jit(dstage("conv2"))
    z1in = z
    z = d2(z)
    z = jnp.concatenate([z, y2], axis=1)
    stages["dec.conv2(832->480 @14x24)"] = (d2, z1in)
    d3 = jax.jit(dstage("conv3"))
    z2in = z
    z = d3(z)
    z = jnp.concatenate([z, y3], axis=1)
    stages["dec.conv3(480->192 @28x48)"] = (d3, z2in)
    d4 = jax.jit(dstage("conv4"))
    z3in = z
    z = d4(z)
    stages["dec.conv4(192->64 @56x96)"] = (d4, z3in)
    dt = jax.jit(dtail)
    _ = dt(z)
    stages["dec.tail(conv5+up+head @112->224)"] = (dt, z)
    full_j = jax.jit(full)
    _ = full_j(x)
    stages["FULL model"] = (full_j, x)

    def fence(a):
        return float(np.asarray(a.ravel()[0]))

    probe = jax.device_put(jnp.zeros((8,), jnp.float32))
    rb = []
    for _ in range(5):
        t0 = time.perf_counter()
        fence(probe)
        rb.append(time.perf_counter() - t0)
    readback = sorted(rb)[len(rb) // 2]
    print(f"readback fence: {readback*1e3:.2f} ms", flush=True)

    total = 0.0
    for name, (fn, inp) in stages.items():
        fence(fn(inp))  # warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(inp)
        fence(out)
        dt_ms = max(time.perf_counter() - t0 - readback, 1e-9) / args.iters * 1e3
        if name != "FULL model":
            total += dt_ms
        print(f"{name:42s} {dt_ms:8.2f} ms/batch", flush=True)
    print(f"{'sum of stages':42s} {total:8.2f} ms/batch")


if __name__ == "__main__":
    main()
