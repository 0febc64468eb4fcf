"""Streaming-consistent fine-tuning: close --streaming's train/test mismatch.

The reference trains on isolated zero-padded 32-frame windows
(/root/reference/dataloader.py:124-187, train.py:192-229), and parity
inference (inference/engine.py) evaluates exactly that function. The
--streaming encoder (inference/streaming.py) computes the same network over
whole-video timelines, so a window's temporal convs see the REAL neighboring
frames instead of zero padding. For a model trained only on zero-padded
windows those features are out-of-distribution, and the accuracy cost is
material: CC 0.53 (streaming) vs 0.80 (parity) against GT on a trained
fixture (NOTES.md round 3, scripts/exp_streaming_trained.py).

This module fine-tunes THROUGH the streaming forward itself:

    chunk (1, N, H, W, 3) --streaming_pyramid--> phase timelines
        --gather_windows(starts)--> per-window pyramids
        --decoder--> maps --> reference loss vs each window's last-frame GT

so the training distribution IS the streaming-inference distribution (the
gather is exact: tests/test_streaming.py pins timeline == window features
and decode_windows_v2 == decoder.apply). Two deliberate choices:

  * BN runs in EVAL mode (frozen running statistics): this is a fine-tune
    step for a model already trained in parity semantics — gamma/beta keep
    training, the statistics don't drift onto B=1 phase-folded batches.
  * Window starts always include both chunk edges, so the zero-padded
    chunk-boundary windows streaming inference also produces stay
    in-distribution.

The step is additionally a training-throughput win: each chunk frame passes
the backbone ONCE per step but serves up to `n_windows` loss terms — the
same amortization streaming inference exploits (measured: 3.4x the
clips/s-equivalent of the parity bf16 train step at chunk 64 / 16 windows).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
import optax

from vinet_tpu.training.losses import LossConfig, cc, loss_func, similarity


def sample_window_starts(rng: np.random.Generator, n_windows: int,
                         chunk_len: int, clip_size: int) -> np.ndarray:
    """Per-step window starts within a chunk: uniform over
    [0, chunk_len - clip_size], with the two chunk-edge windows pinned (they
    are the only windows that ever see zero padding in streaming inference,
    and would otherwise appear with probability ~2/(N-T) each)."""
    hi = chunk_len - clip_size
    assert hi >= 0, (chunk_len, clip_size)
    starts = rng.integers(0, hi + 1, size=n_windows)
    if n_windows >= 2:
        starts[0], starts[-1] = 0, hi
    return np.sort(starts).astype(np.int32)


def eval_window_starts(n_windows: int, chunk_len: int, clip_size: int) -> np.ndarray:
    """Deterministic evenly-spaced starts (edges included) for validation."""
    hi = chunk_len - clip_size
    return np.unique(np.linspace(0, hi, n_windows).round().astype(np.int32))


def make_streaming_ft_step(model, loss_cfg: LossConfig,
                           optimizer: optax.GradientTransformation, *,
                           clip_size: int = 32, compute_dtype=None,
                           donate: bool = True) -> Callable:
    """Jitted step(train_state, batch) -> (train_state, metrics) where
    batch = {"chunk": (1, N, H, W, 3) normalized float, "gt": (K, H, W),
    "starts": (K,) int32 window starts with starts + clip_size <= N}.

    Differentiates the full streaming forward (timeline encoder + window
    gather + decoder); BN state is frozen (see module docstring). The
    compute_dtype recipe matches trainer.make_train_step: bf16 matmuls,
    f32 master weights / optimizer / loss."""
    from vinet_tpu.inference.streaming import gather_windows, streaming_pyramid

    decoder = model.decoder

    def step(ts, batch):
        def loss_fn(params):
            if compute_dtype is not None:
                from vinet_tpu.models.inference import cast_floating

                p = cast_floating(params, compute_dtype)
                s = cast_floating(ts["state"], compute_dtype)
                chunk = batch["chunk"].astype(compute_dtype)
            else:
                p, s, chunk = params, ts["state"], batch["chunk"]
            tl = streaming_pyramid(p["backbone"], s.get("backbone", {}),
                                   chunk, train=False)
            pyr = gather_windows(tl, batch["starts"], clip_size)
            # train=True selects the decoder's plain differentiable graph;
            # the inference-only phase-folded tail is an EXACT rearrangement
            # of it (tests/test_phasefold.py), so the gradients are those of
            # the served function — but its raw lax convs have no bf16 VJP.
            out, _ = decoder.apply(p["decoder"], {}, pyr, train=True)
            return loss_func(out.astype(jnp.float32), batch["gt"], loss_cfg)

        loss, grads = jax.value_and_grad(loss_fn)(ts["params"])
        updates, opt_state = optimizer.update(grads, ts["opt_state"], ts["params"])
        params = optax.apply_updates(ts["params"], updates)
        new_ts = {
            "params": params,
            "state": ts["state"],
            "opt_state": opt_state,
            "step": ts["step"] + 1,
        }
        return new_ts, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_streaming_eval_step(model, loss_cfg: LossConfig, *,
                             clip_size: int = 32) -> Callable:
    """Jitted f32 eval of the streaming forward on deterministic windows:
    (train_state, batch) -> {"loss", "cc", "sim"} at model resolution."""
    from vinet_tpu.inference.streaming import gather_windows, streaming_pyramid

    decoder = model.decoder

    @jax.jit
    def step(ts, batch):
        tl = streaming_pyramid(ts["params"]["backbone"],
                               ts["state"].get("backbone", {}),
                               batch["chunk"], train=False)
        pyr = gather_windows(tl, batch["starts"], clip_size)
        out, _ = decoder.apply(ts["params"]["decoder"], {}, pyr)
        out = out.astype(jnp.float32)
        gt = batch["gt"]
        return {
            "loss": loss_func(out, gt, loss_cfg),
            "cc": cc(out, gt),
            "sim": similarity(out, gt),
        }

    return step
