"""Jitted training / eval steps over a sharded mesh.

Replaces the reference's Python train loop body (/root/reference/train.py:192-229:
per-batch host->device copies, DataParallel scatter/gather, eager backward)
with a single donated, jit-compiled pure step: forward + loss + grad + Adam
update + BN-stat update in one XLA program. Gradient reduction across the
"data" mesh axis is inserted by GSPMD — no explicit collectives.

The train state is a plain dict pytree {"params", "state", "opt_state",
"step"} — trivially checkpointable (vinet_tpu.io.checkpoint) and shardable
(vinet_tpu.parallel).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from vinet_tpu.training.losses import LossConfig, cc, loss_func, similarity


def adam(lr: float = 1e-4) -> optax.GradientTransformation:
    """The reference's optimizer: Adam(lr=1e-4), torch defaults
    (/root/reference/train.py:187-188)."""
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


def init_train_state(model, key, optimizer: optax.GradientTransformation) -> dict:
    """Full train state incl. the dropout base key (SURVEY §5:
    "params+opt_state+step+RNG" — the reference saves none of these,
    /root/reference/train.py:283-290). The base key is derived by fold_in so
    param init (model.init(key)) is byte-identical to pre-RNG rounds; the
    per-step dropout key is fold_in(rng, step), so resume restores the exact
    key stream."""
    params, state = model.init(key)
    return {
        "params": params,
        "state": state,
        "opt_state": optimizer.init(params),
        "step": jnp.zeros((), jnp.int32),
        "rng": jax.random.fold_in(key, 0xD0),  # dropout stream, != init key
    }


def make_train_step(model, loss_cfg: LossConfig, optimizer: optax.GradientTransformation,
                    *, donate: bool = True, compute_dtype=None,
                    grad_accum: int = 1) -> Callable:
    """Returns jitted step(train_state, batch) -> (train_state, metrics).

    batch: {"clip": (B,T,H,W,3), "gt": (B,H,W) or (B,Cl,H,W),
            optional "audio": (B,L,1)}.

    compute_dtype=jnp.bfloat16 runs the forward/backward matmuls in bf16
    (2x MXU rate) while master weights, optimizer state, BN statistics, and
    the loss stay f32 — the standard TPU mixed-precision recipe. Gradients
    arrive f32 through the cast (d(astype) = astype back). Loss-curve parity
    vs f32 is pinned in tests/test_training.py::test_bf16_train_step.

    grad_accum=N scans N sequential microbatches of B/N clips (B must divide)
    inside the one jitted step, averaging gradients before the single Adam
    update — effective batch B under the memory footprint of B/N (one v5e
    chip fits B=8 at clip-32/224x384; NOTES.md round-3 sweep). BatchNorm
    semantics: each microbatch normalizes by its own batch statistics and
    running stats thread sequentially through the scan, i.e. exactly N
    consecutive forward passes (pinned in test_grad_accum_matches_microbatch
    against per-microbatch grads averaged by hand).

    Dropout (VERDICT r4 item 4): if the model's apply accepts `rng` (the
    AViNet transformers carry torch-default dropout=0.1,
    /root/reference/model.py:137-144,211-221) and the train state carries a
    base "rng" key, each step passes fold_in(base, step) — so training
    actually exercises dropout and resume reproduces the key stream. States
    without "rng" (hand-built in older tests) train with dropout off, as
    before."""
    import inspect

    accepts_rng = "rng" in inspect.signature(model.apply).parameters

    def loss_fn(params, state, mb, rng):
        if compute_dtype is not None:
            from vinet_tpu.models.inference import cast_floating

            p = cast_floating(params, compute_dtype)
            clip = mb["clip"].astype(compute_dtype)
            audio = (mb["audio"].astype(compute_dtype)
                     if "audio" in mb else None)
        else:
            p, clip = params, mb["clip"]
            audio = mb.get("audio")
        kw = {"rng": rng} if (accepts_rng and rng is not None) else {}
        if audio is not None:
            pred, new_state = model.apply(p, state, clip, audio, train=True, **kw)
        else:
            pred, new_state = model.apply(p, state, clip, train=True, **kw)
        if compute_dtype is not None:
            from vinet_tpu.models.inference import cast_floating

            pred = pred.astype(jnp.float32)
            new_state = cast_floating(new_state, jnp.float32)
        loss = loss_func(pred, mb["gt"], loss_cfg)
        return loss, new_state

    def step(ts, batch):
        base_rng = ts.get("rng")
        rng = (None if base_rng is None
               else jax.random.fold_in(base_rng, ts["step"]))
        if grad_accum == 1:
            (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                ts["params"], ts["state"], batch, rng)
        else:
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((grad_accum, x.shape[0] // grad_accum) + x.shape[1:]),
                batch)

            def body(carry, mb_i):
                mb, i = mb_i
                gsum, lsum, state = carry
                r = None if rng is None else jax.random.fold_in(rng, i)
                (l, state2), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    ts["params"], state, mb, r)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                return (gsum, lsum + l, state2), None

            gsum0 = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), ts["params"])
            (gsum, lsum, new_state), _ = jax.lax.scan(
                body, (gsum0, jnp.zeros((), jnp.float32), ts["state"]),
                (micro, jnp.arange(grad_accum)))
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, gsum)
            loss = lsum / grad_accum
        updates, opt_state = optimizer.update(grads, ts["opt_state"], ts["params"])
        params = optax.apply_updates(ts["params"], updates)
        new_ts = {
            "params": params,
            "state": new_state,
            "opt_state": opt_state,
            "step": ts["step"] + 1,
        }
        if base_rng is not None:
            new_ts["rng"] = base_rng
        gnorm = optax.global_norm(grads)
        return new_ts, {"loss": loss, "grad_norm": gnorm}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_bn_stats_fn(model) -> Callable:
    """Jitted (params, state, clip[, audio]) -> per-batch BN statistics:
    a train-mode forward under override_momentum(1.0), so the returned state
    holds exactly this batch's mean / unbiased variance for every BN."""
    from vinet_tpu.ops.norm import override_momentum

    @jax.jit
    def stats(params, state, clip, audio=None):
        with override_momentum(1.0):
            if audio is not None:
                _, new_state = model.apply(params, state, clip, audio, train=True)
            else:
                _, new_state = model.apply(params, state, clip, train=True)
        return new_state

    return stats


def recalibrate_bn(model, params, state, batches, *, stats_fn=None) -> dict:
    """Replace BN running stats with the AVERAGE batch statistics over
    `batches` (an iterable of {"clip": ..., optional "audio": ...} device
    batches) — the standard fix for from-scratch training where torch-parity
    momentum=0.001 leaves running stats at their init for thousands of steps
    (see ops/norm.py::override_momentum). Cumulative mean over batches;
    returns the new state (other state leaves pass through)."""
    stats_fn = stats_fn or make_bn_stats_fn(model)
    acc = None
    n = 0
    for b in batches:
        s = stats_fn(params, state, b["clip"],
                     *((b["audio"],) if "audio" in b else ()))
        n += 1
        if acc is None:
            acc = s
        else:
            acc = jax.tree_util.tree_map(lambda a, v: a + (v - a) / n, acc, s)
    return acc if acc is not None else state


def make_eval_step(model, loss_cfg: LossConfig) -> Callable:
    """Jitted eval: forward in eval mode + loss/cc/sim at model resolution.
    (The reference's validate() additionally resizes to native GT size on the
    host per sample, train.py:251-263; the CLI does that with device ops.)"""

    def step(ts, batch):
        if "audio" in batch:
            pred, _ = model.apply(ts["params"], ts["state"], batch["clip"], batch["audio"])
        else:
            pred, _ = model.apply(ts["params"], ts["state"], batch["clip"])
        gt = batch["gt"]
        return {
            "loss": loss_func(pred, gt, loss_cfg),
            "cc": cc(pred, gt),
            "sim": similarity(pred, gt),
        }, pred

    return jax.jit(step)


class AverageMeter:
    """Running mean with the reference's semantics (/root/reference/utils.py:41-59)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
