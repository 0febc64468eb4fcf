"""int8 inference quantization: per-channel weights, calibrated activations.

v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate; this module turns a
BN-folded inference params tree into an int8 one:

  * weights: symmetric per-output-channel int8 (scale = absmax/127 over the
    channel's taps) — exact rescale in the f32 epilogue;
  * activations: symmetric per-tensor int8 with STATIC scales calibrated by
    running the bf16 model on representative clips while Conv3d.apply records
    each conv input's absmax (quantizing on device is one fused elementwise
    op per conv).

Convs whose compute is negligible or whose inputs are unbounded keep bf16
(SoundNet, decoder tail conv5..7 — the Pallas saliency head consumes those).
Opt-in: make_inference_fn(..., dtype="int8") / bench BENCH_DTYPE=int8; the
reference has no quantized path, so this is capability beyond parity
(NOTES.md idea #3, VERDICT round-1 item 4).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

# calibration capture: Conv3d.apply records each conv INPUT's absmax while
# active, keyed by the weight array's Python identity — no assumptions about
# traversal order, and it works for any model (the same params objects are
# later walked by quantize_tree). Calibration forwards must run EAGERLY
# (outside jit) so absmax is concrete.
_CAL = {"active": False, "records": {}}


def calibrating() -> bool:
    return _CAL["active"]


def record(w, x) -> None:
    amax = float(jnp.max(jnp.abs(x)))
    key = id(w)
    prev = _CAL["records"].get(key, 0.0)
    _CAL["records"][key] = max(prev, amax)


@contextlib.contextmanager
def calibration():
    _CAL["active"] = True
    _CAL["records"] = {}
    try:
        yield _CAL["records"]
    finally:
        _CAL["active"] = False


def quantize_weight(w: np.ndarray):
    """DHWIO weight -> (int8 weight, per-out-channel f32 scale)."""
    w = np.asarray(w, np.float32)
    absmax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = np.maximum(absmax / 127.0, 1e-12)
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return jnp.asarray(wq), jnp.asarray(scale.reshape(-1))


def quantize_activation(x, x_scale):
    """f32/bf16 activation -> int8 with the given static per-tensor scale."""
    inv = (1.0 / x_scale).astype(jnp.float32)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127)
    return xq.astype(jnp.int8)


def int8_conv3d(x, params, *, stride, padding):
    """Conv3d.apply's int8 path: quantize input with the calibrated scale,
    int8 conv accumulating int32, dequantize + bias in f32."""
    from jax import lax

    def _triple(v):
        return tuple(v) if isinstance(v, (tuple, list)) else (v, v, v)

    out_dtype = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    xq = quantize_activation(x, params["x_scale"].astype(jnp.float32))
    acc = lax.conv_general_dilated(
        xq, params["w_q"],
        window_strides=_triple(stride),
        padding=[(p, p) for p in _triple(padding)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (params["w_scale"].astype(jnp.float32)
                                   * params["x_scale"].astype(jnp.float32))
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(out_dtype)


def quantize_tree(params: dict, records: dict, *, skip_prefixes=()) -> dict:
    """Folded-BN params tree -> int8 tree: every 5-D conv 'w' with a recorded
    input absmax (keyed by id(w)) becomes {w_q, w_scale, x_scale[, b]}.
    Leaves without records or under skip_prefixes stay bf16/f32."""

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        if "w" in node and not isinstance(node["w"], dict):
            w = node["w"]
            amax = records.get(id(w))
            skip = any(path[: len(p)] == p for p in skip_prefixes)
            if w.ndim == 5 and amax is not None and amax > 0 and not skip:
                wq, wscale = quantize_weight(np.asarray(w, np.float32))
                out = {"w_q": wq, "w_scale": wscale,
                       "x_scale": jnp.float32(max(amax / 127.0, 1e-12))}
                if "b" in node:
                    out["b"] = node["b"]
                return out
            return node
        return {k: walk(v, path + (k,)) for k, v in node.items()}

    return walk(params, ())
