"""BatchNorm with the reference's exact semantics, plus inference-time folding.

The reference uses BatchNorm3d(eps=1e-3, momentum=0.001) everywhere in the
visual net (/root/reference/model_utils.py:132,145,149) and
BatchNorm2d(eps=1e-5, momentum=0.1) in SoundNet (/root/reference/model.py:752).
Torch's `momentum` is the *update fraction*: new = (1-m)*old + m*batch, and the
running variance uses the unbiased batch variance while normalization uses the
biased one — both reproduced here.

Params: {'scale': (C,), 'bias': (C,)}; state: {'mean': (C,), 'var': (C,)}.
Channels are the last axis (NDHWC / NWC), so the normalization broadcasts for
free on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batchnorm_apply(params: dict, state: dict, x: jax.Array, *, eps: float) -> jax.Array:
    """Inference-mode batchnorm using running stats. Math in f32, result in x.dtype."""
    mean = state["mean"].astype(jnp.float32)
    var = state["var"].astype(jnp.float32)
    scale = params["scale"].astype(jnp.float32)
    bias = params["bias"].astype(jnp.float32)
    inv = scale * jax.lax.rsqrt(var + eps)
    # y = (x - mean) * inv + bias == x * inv + (bias - mean * inv)
    return (x.astype(jnp.float32) * inv + (bias - mean * inv)).astype(x.dtype)


_MOMENTUM_OVERRIDE: list = []  # trace-time stack (see override_momentum)


class override_momentum:
    """Trace-time context: force every BatchNorm's running-stat update
    fraction. momentum=1.0 makes new_state = this batch's stats exactly —
    the primitive behind BN recalibration (training/trainer.py
    recalibrate_bn): with the reference's momentum=0.001
    (/root/reference/model_utils.py:132) running stats move 0.1%/step, so a
    from-scratch run's eval-mode stats stay near their (0,1) init for
    thousands of steps; the reference never notices because it always starts
    from Kinetics/SoundNet checkpoints that carry real stats."""

    def __init__(self, momentum: float):
        self.momentum = momentum

    def __enter__(self):
        _MOMENTUM_OVERRIDE.append(self.momentum)
        return self

    def __exit__(self, *exc):
        _MOMENTUM_OVERRIDE.pop()
        return False


def batchnorm_train(
    params: dict, state: dict, x: jax.Array, *, eps: float, momentum: float
) -> tuple[jax.Array, dict]:
    """Training-mode batchnorm: normalize with batch stats (biased variance),
    update running stats with torch's convention (unbiased variance,
    new = (1-momentum)*old + momentum*batch). Returns (y, new_state)."""
    if _MOMENTUM_OVERRIDE:
        momentum = _MOMENTUM_OVERRIDE[-1]
    xf = x.astype(jnp.float32)
    reduce_axes = tuple(range(x.ndim - 1))  # all but channel
    n = 1
    for ax in reduce_axes:
        n *= x.shape[ax]
    batch_mean = jnp.mean(xf, axis=reduce_axes)
    batch_var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(batch_mean)
    batch_var = jnp.maximum(batch_var, 0.0)

    scale = params["scale"].astype(jnp.float32)
    bias = params["bias"].astype(jnp.float32)
    inv = scale * jax.lax.rsqrt(batch_var + eps)
    y = (xf * inv + (bias - batch_mean * inv)).astype(x.dtype)

    unbiased = batch_var * (n / max(n - 1, 1))
    new_state = {
        "mean": (1.0 - momentum) * state["mean"].astype(jnp.float32) + momentum * batch_mean,
        "var": (1.0 - momentum) * state["var"].astype(jnp.float32) + momentum * unbiased,
    }
    return y, new_state


def fold_bn_into_conv(
    w: jax.Array, b: jax.Array | None, params: dict, state: dict, *, eps: float
) -> tuple[jax.Array, jax.Array]:
    """Fold an inference-mode batchnorm into the preceding conv's weights.

    w: (..., Cin, Cout) DHWIO/WIO weight; returns (w', b') such that
    conv(x, w') + b' == bn(conv(x, w) + b). This removes every BN from the
    inference graph — one fused conv per block instead of conv+mul+add.
    """
    mean = state["mean"].astype(jnp.float32)
    var = state["var"].astype(jnp.float32)
    scale = params["scale"].astype(jnp.float32)
    bias = params["bias"].astype(jnp.float32)
    inv = scale * jax.lax.rsqrt(var + eps)  # (Cout,)
    w_f = w.astype(jnp.float32) * inv  # broadcast over last axis
    b0 = jnp.zeros_like(mean) if b is None else b.astype(jnp.float32)
    b_f = (b0 - mean) * inv + bias
    return w_f, b_f


def init_batchnorm(channels: int) -> tuple[dict, dict]:
    """Torch default init: scale=1, bias=0, mean=0, var=1."""
    params = {
        "scale": jnp.ones((channels,), jnp.float32),
        "bias": jnp.zeros((channels,), jnp.float32),
    }
    state = {
        "mean": jnp.zeros((channels,), jnp.float32),
        "var": jnp.ones((channels,), jnp.float32),
    }
    return params, state
