"""Inference-time graph surgery: BN folding and low-precision casting.

The reference runs inference with the full train graph (conv + BN + ReLU per
layer, f32, one window per model call — /root/reference/generate_result.py:96-104).
On TPU the production path is: fold every BatchNorm into its conv (exact),
cast weights to bf16 so convs hit the MXU at 2x rate, and batch many windows
per call. Accumulation stays f32 (preferred_element_type in ops/conv.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vinet_tpu.ops.norm import fold_bn_into_conv

# BN key -> (conv key, eps). Visual-net BNs use eps=1e-3, SoundNet's 1e-5.
_BN_PAIR = {
    "bn": ("conv", 1e-3),
    "bn_s": ("conv_s", 1e-3),
    "bn_t": ("conv_t", 1e-3),
}


def _pair_for(bn_key: str):
    if bn_key in _BN_PAIR:
        return _BN_PAIR[bn_key]
    if bn_key.startswith("batchnorm"):  # SoundNet: batchnormN -> convN
        return ("conv" + bn_key[len("batchnorm"):], 1e-5)
    return None


def fold_batchnorms(params: dict, state: dict) -> tuple[dict, dict]:
    """Return (params', state') with every BN absorbed into its conv.

    BN entries are removed entirely; BatchNorm.apply treats missing params as
    identity. Exact at f32 — see tests/test_inference.py.
    """

    def walk(p: dict, s: dict) -> tuple[dict, dict]:
        p = dict(p)
        s = dict(s)
        for key in list(p.keys()):
            pair = _pair_for(key)
            if pair is not None and isinstance(p.get(key), dict) and "scale" in p[key]:
                conv_key, eps = pair
                w, b = fold_bn_into_conv(
                    p[conv_key]["w"], p[conv_key].get("b"), p[key], s[key], eps=eps
                )
                p[conv_key] = {"w": w, "b": b}
                del p[key]
                del s[key]
        for key in list(p.keys()):
            if isinstance(p[key], dict) and "w" not in p[key] and "scale" not in p[key]:
                p[key], sk = walk(p[key], s.get(key, {}))
                if sk:
                    s[key] = sk
                elif key in s:
                    del s[key]
        return p, s

    return walk(params, state)


def cast_floating(tree, dtype):
    """Cast floating-point leaves to dtype (params for bf16 inference)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
    )


def quantize_int8(model, params, state, *, calib_clips, calib_audio=None,
                  skip_prefixes=(("decoder", "conv5"), ("decoder", "conv6"),
                                 ("decoder", "conv7"), ("audionet",))):
    """Calibrate + quantize a FOLDED params tree to int8 (ops/quant.py).

    calib_clips: (B,T,H,W,3) representative normalized clips (a handful of
    batches is plenty — scales are per-tensor absmax). Decoder tail and
    SoundNet stay bf16 (negligible FLOPs; the Pallas head reads conv6/7)."""
    from vinet_tpu.ops import quant

    with quant.calibration() as records:
        # eager forward so absmax values are concrete
        if calib_audio is None:
            model.apply(params, state, calib_clips)
        else:
            model.apply(params, state, calib_clips, calib_audio)
    return quant.quantize_tree(params, records, skip_prefixes=skip_prefixes)


def _infer_lower2d_area() -> int:
    """Pixel-area threshold for 2-D lowering of kt==1 convs on the
    inference path (VINET_LOWER2D_INFER; default = the 224x384 stem only;
    a huge value disables)."""
    import os

    return int(os.environ.get("VINET_LOWER2D_INFER", "86016"))


def make_inference_fn(model, params, state, *, dtype=jnp.bfloat16, fold: bool = True,
                      calib_clips=None):
    """Build a jitted clips->maps function with folded BN and cast params.
    dtype="int8" quantizes (requires calib_clips).

    Returns (fn, prepared_params, prepared_state); fn(clips[, audio]) emits
    f32 saliency maps.
    """
    if fold:
        params, state = fold_batchnorms(params, state)
    int8 = dtype == "int8" or dtype == jnp.int8
    if int8:
        assert calib_clips is not None, "int8 needs calib_clips"
        dtype = jnp.bfloat16  # non-quantized leaves / activations stay bf16
        params = cast_floating(params, jnp.float32)
        state = cast_floating(state, jnp.float32)
        params = quantize_int8(model, params, state,
                               calib_clips=calib_clips.astype(jnp.float32))
    params = cast_floating(params, dtype)
    state = cast_floating(state, dtype)

    def fn(clips, audio=None):
        from vinet_tpu.ops.conv import force_lower2d

        clips = clips.astype(dtype)
        # stem-only 2-D lowering: +4% parity fps, p50 9.3 -> 7.0 ms after
        # the phase-folded tail (re-A/B'd round 2); inference-only so the
        # training graph keeps its measured-optimal 3-D path
        with force_lower2d(_infer_lower2d_area()):
            if audio is None:
                out, _ = model.apply(params, state, clips)
            else:
                out, _ = model.apply(params, state, clips, audio.astype(dtype))
        return out.astype(jnp.float32)

    return jax.jit(fn), params, state
