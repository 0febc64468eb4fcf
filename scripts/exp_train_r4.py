"""Round-4 train-step study (VERDICT r3 item 3).

The jitted fwd+bwd+Adam step measures 16.6% MFU where the forward alone is
26.6% — nobody has located where the backward loses the rest. This script
decomposes the B=8 bf16 step on the real TPU:

  1. fwd-only loss            (the 26.6% reference point, train=True)
  2. fwd+bwd value_and_grad   (no optimizer)
  3. full step                (fwd+bwd+Adam+BN threading)
  4. bwd isolated by segment: grads wrt decoder params only vs backbone
     params only (the other tree under stop_gradient via lax.stop_gradient
     on the params) — locates whether the backward loss is stem-shaped
     (expected: the stem's MXU-width bound applies to its backward too)
  5. remat variants: jax.checkpoint around the backbone stages — trades
     HBM (the B=8 cap) for recompute; reports whether the step gets faster
     (less spilling) or slower (recompute-bound), and whether B=12/16 fit

Per-variant: wall ms (host-readback fence), XLA cost-analysis FLOPs, MFU
vs the 197 TF/s bf16 peak. One markdown table to NOTES.md.

Usage (on the TPU): python scripts/exp_train_r4.py [--iters 5] [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

PEAK = 197e12


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.ravel()[0]))


def readback_baseline():
    probe = jax.device_put(jnp.zeros((8,), jnp.float32))
    fence(probe)
    rb = []
    for _ in range(5):
        t0 = time.perf_counter()
        fence(probe)
        rb.append(time.perf_counter() - t0)
    return sorted(rb)[2]

def cost_flops(jfn, *args):
    try:
        c = jfn.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0)) or None
    except Exception:
        return None


def timed_ms(jfn, args, iters, readback):
    fence(jfn(*args))
    est = []
    for k in (iters, 2 * iters):
        t0 = time.perf_counter()
        for _ in range(k):
            out = jfn(*args)
        fence(out)
        est.append((time.perf_counter() - t0 - readback) / k)
    return max(est) * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--remat", default="all",
                   choices=["none", "all"], help="which variant groups to run")
    p.add_argument("--only", default="",
                   help="comma list of variant-name substrings to run "
                        "(e.g. 'full step' for a cheap env-knob A/B)")
    args = p.parse_args()
    from vinet_tpu.models import ViNet
    from vinet_tpu.models.inference import cast_floating
    from vinet_tpu.training import LossConfig
    from vinet_tpu.training.losses import loss_func
    from vinet_tpu.training.trainer import adam, init_train_state, make_train_step
    from vinet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    B = args.batch
    model = ViNet(num_hier=3, clip_size=32)
    optimizer = adam(1e-4)
    ts = init_train_state(model, jax.random.PRNGKey(0), optimizer)
    kc, kg = jax.random.split(jax.random.PRNGKey(1))
    batch = {
        "clip": jax.random.normal(kc, (B, 32, 224, 384, 3), jnp.float32),
        "gt": jnp.clip(jax.random.uniform(kg, (B, 224, 384)), 0.05, 1.0),
    }
    cfg = LossConfig()
    readback = readback_baseline()

    def loss_fn(params, state, mb, apply=None):
        apply = apply or model.apply
        pconv = cast_floating(params, jnp.bfloat16)
        pred, new_state = apply(pconv, state, mb["clip"].astype(jnp.bfloat16),
                                train=True)
        return loss_func(pred.astype(jnp.float32), mb["gt"], cfg), new_state

    rows = []

    only = [s.strip() for s in args.only.split(",") if s.strip()]

    def record(name, jfn, fargs, flops_hint=None):
        if only and not any(s in name for s in only):
            return None, None
        ms = timed_ms(jfn, fargs, args.iters, readback)
        fl = flops_hint if flops_hint is not None else cost_flops(jfn, *fargs)
        mfu = (fl / (ms / 1e3)) / PEAK if fl else float("nan")
        rows.append((name, ms, (fl or 0) / 1e9, mfu))
        print(f"| {name} | {ms:.1f} | {(fl or 0)/1e9:.0f} | {mfu*100:.1f}% |",
              flush=True)
        return ms, fl

    print(f"| variant | ms/step (B={B}) | GF | MFU |")
    print("|---|---|---|---|", flush=True)

    # 1. forward only
    fwd = jax.jit(lambda p, s, mb: loss_fn(p, s, mb)[0])
    record("fwd loss", fwd, (ts["params"], ts["state"], batch))

    # 2. fwd + bwd
    vg = jax.jit(lambda p, s, mb: jax.value_and_grad(
        lambda pp: loss_fn(pp, s, mb)[0])(p))
    record("fwd+bwd", vg, (ts["params"], ts["state"], batch))

    # 3. full step (exactly bench's). Return the WHOLE new train state —
    # returning only metrics["loss"] lets XLA dead-code-eliminate the
    # backward + Adam (measured: 51 ms, i.e. exactly the forward).
    step = make_train_step(model, cfg, optimizer, donate=False,
                           compute_dtype=jnp.bfloat16)
    record("full step", step, (ts, batch))

    # 3b. Adam + BN threading alone: the full step minus fwd+bwd
    grads = jax.tree_util.tree_map(jnp.ones_like, ts["params"])
    import optax

    def adam_only(g, t):
        updates, opt_state = optimizer.update(g, t["opt_state"], t["params"])
        return optax.apply_updates(t["params"], updates), opt_state

    record("adam update only", jax.jit(adam_only), (grads, ts), flops_hint=0)

    # 4. segment backwards: grad wrt ONE subtree, other frozen.
    # "stem only" isolates base1 (the fwd-roofline-bound sep_conv3d stem):
    # its backward inherits the same MXU-width bound if it dominates.
    def stem_loss(sub, p, s, mb):
        pp = dict(p, **{"backbone": dict(p["backbone"], base1=sub)})
        return loss_fn(pp, s, mb)[0]

    jstem = jax.jit(lambda sub, p, s, mb: jax.value_and_grad(
        stem_loss)(sub, p, s, mb))
    record("fwd+bwd[stem only]", jstem,
           (ts["params"]["backbone"]["base1"], ts["params"], ts["state"],
            batch))

    for seg in ("backbone", "decoder"):
        def seg_loss(sub, p, s, mb, _seg=seg):
            pp = dict(p, **{_seg: sub})
            return loss_fn(pp, s, mb)[0]

        jseg = jax.jit(lambda sub, p, s, mb, _f=seg_loss: jax.value_and_grad(
            _f)(sub, p, s, mb))
        record(f"fwd+bwd[{seg} only]", jseg,
               (ts["params"][seg], ts["params"], ts["state"], batch))

    if args.remat != "none":
        # 5. remat the backbone: recompute its activations in the backward
        def apply_remat(p, s, clip, train=True):
            bb = jax.checkpoint(
                lambda pb, x: model.backbone.apply(pb, s.get("backbone", {}),
                                                   x, train=train)[0])
            pyr = bb(p["backbone"], clip)
            out, _ = model.decoder.apply(p["decoder"], {}, pyr, train=train)
            return out, s

        vgr = jax.jit(lambda p, s, mb: jax.value_and_grad(
            lambda pp: loss_fn(pp, s, mb, apply=apply_remat)[0])(p))
        record("fwd+bwd remat(backbone)", vgr,
               (ts["params"], ts["state"], batch))

    print("\nsummary:", [(r[0], round(r[1], 1)) for r in rows], flush=True)


if __name__ == "__main__":
    main()
