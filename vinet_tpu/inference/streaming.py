"""Streaming whole-video encoder: amortize the S3D backbone across the
overlapping sliding windows of generate_result-style inference.

Parity mode (inference/engine.py, mirroring /root/reference/generate_result.py:58-73)
recomputes the full 32-frame backbone for EVERY output frame even though
consecutive windows share 31/32 frames. Streaming mode computes the backbone
ONCE over the video timeline using the classic dense/"a-trous" trick:

  * every temporally-strided op (stem conv_t s2, maxp3 s2, maxt4 s2) runs
    DENSE (stride 1) and its output is split into even/odd phase timelines,
    folded into the batch axis;
  * all other ops are unchanged — on a phase timeline, a window's temporal
    neighbors ARE the timeline's neighbors, so k3/s1 temporal convs and the
    whole Inception stack apply verbatim.

For a window starting at frame s, each pyramid level is then an exact
contiguous SLICE of one phase timeline:
    p1 = s % 2;  s1 = s // 2      y3/y2 <- timeline[p1][s1 : s1+16]
    p2 = s1 % 2; s2 = s1 // 2     y1    <- timeline[p2*2+p1][s2 : s2+8]
    p3 = s2 % 2; s3 = s2 // 2     y0    <- timeline[p3*4+p2*2+p1][s3 : s3+4]
and the decoder runs on gathered windows exactly as in parity mode.

Cost per emitted frame: each input frame passes each backbone layer once
(vs. 32x/16x/8x/4x for the stem/base2/base3/base4 in parity mode).

SEMANTICS DIFFER FROM PARITY at window edges: parity mode zero-pads temporal
convs at every window boundary; streaming features see the real neighboring
frames (and zero-padding only at chunk edges). tests/test_streaming.py pins
the timeline math exactly (interior of a long parity window == timeline) and
bounds the end-to-end map delta; CLI exposure is the opt-in --streaming flag.

ACCURACY COST (measured, round 3): a model TRAINED on zero-padded windows is
miscalibrated for real-neighbor features. On a trained 224x384 tracking
fixture the streaming maps score CC 0.53 / SIM 0.087 / NSS 8.8 against
ground truth where parity maps score CC 0.79 / SIM 0.155 / NSS 14.0
(mode-agreement CC 0.88; scripts/exp_streaming_trained.py). Streaming is a
speed-accuracy tradeoff, not a free speedup — the bench headline is the
parity mode.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

import jax
import jax.numpy as jnp

from vinet_tpu.data.pipeline import device_preprocess
from vinet_tpu.models.layers import Composite, Conv3d, MaxPool3d, Sequential
from vinet_tpu.models.s3d import S3DBackbone
from vinet_tpu.models.inference import cast_floating, fold_batchnorms
from vinet_tpu.ops.image import gaussian_blur


def _dense_time(mod):
    """Copy of a module tree with every temporal conv stride forced to 1."""
    if isinstance(mod, Conv3d):
        s = mod.stride if isinstance(mod.stride, tuple) else (mod.stride,) * 3
        if s[0] != 1:
            return dataclasses.replace(mod, stride=(1, s[1], s[2]))
        return mod
    if isinstance(mod, Composite):
        return Composite(children=tuple((n, _dense_time(m)) for n, m in mod.children))
    if isinstance(mod, Sequential):
        return Sequential(*[_dense_time(m) for m in mod.layers])
    return mod


def _split_time(x):
    """(P*B, T, ...) -> (2*P*B, ceil(T/2), ...): even/odd phase timelines,
    phase-major (new phase is the slowest batch axis). Odd-phase timelines
    one short are zero-padded (the pad index is provably never gathered).

    Even T goes through reshape+transpose — 2.5 ms vs 9.2 ms for the
    strided-slice formulation on the stem timeline (XLA strided slices
    along the T axis run far below HBM bandwidth on TPU)."""
    t = x.shape[1]
    if t % 2 == 0:
        b = x.shape[0]
        x2 = x.reshape(b, t // 2, 2, *x.shape[2:])
        x2 = jnp.moveaxis(x2, 2, 0)
        return x2.reshape(2 * b, t // 2, *x.shape[2:])
    t2 = (t + 1) // 2
    even = x[:, 0::2]
    odd = x[:, 1::2]
    if odd.shape[1] < t2:
        odd = jnp.pad(odd, ((0, 0), (0, t2 - odd.shape[1])) + ((0, 0),) * (x.ndim - 2))
    return jnp.concatenate([even, odd], axis=0)


def streaming_pyramid(params, state, x, *, train=False):
    """x: (1, N, H, W, 3), N % 8 == 0 -> phase timelines
    (Y0 (8,N/8,h0,w0,1024), Y1 (4,N/4,...), Y2 (2,N/2,...), Y3 (2,N/2,...)).

    Applies S3DBackbone's stages (same params) with dense temporal strides
    and phase splits as described in the module docstring."""
    assert x.shape[0] == 1 and x.shape[1] % 8 == 0, x.shape
    from vinet_tpu.ops.conv import force_lower2d

    bb = S3DBackbone()
    base1, base2, base3, base4 = (_dense_time(m) for m in bb._stages())

    # Dense B=1/long-T spatial convs run faster folded to T-batch 2-D convs
    # (stem: 21.3 -> 7.2 ms measured) — opposite of parity mode. The area
    # threshold gates which convs fold (default: stem only; lower it with
    # VINET_STREAM_LOWER2D to fold deeper stages too — A/B'd per geometry).
    area = int(os.environ.get("VINET_STREAM_LOWER2D", "86016"))
    stem, pool, b1x1, sep192 = base1.layers
    with force_lower2d(area):
        y, _ = stem.apply(params["base1"]["0"], state.get("base1", {}).get("0", {}), x, train=train)
        y = _split_time(y)  # (2, N/2, 112, 192, 64)
        y, _ = pool.apply({}, {}, y)
        y, _ = b1x1.apply(params["base1"]["2"], state.get("base1", {}).get("2", {}), y, train=train)
        y3, _ = sep192.apply(params["base1"]["3"], state.get("base1", {}).get("3", {}), y, train=train)

        y = MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)).apply({}, {}, y3)[0]
        y2, _ = base2.apply(params["base2"], state.get("base2", {}), y, train=train)

        # maxp3 (3,3,3)s(2,2,2): dense in time (stride (1,2,2)) then split
        y = MaxPool3d((3, 3, 3), (1, 2, 2), (1, 1, 1)).apply({}, {}, y2)[0]
        y = _split_time(y)  # (4, N/4, 14, 24, 480)
        y1, _ = base3.apply(params["base3"], state.get("base3", {}), y, train=train)

        # maxt4 (2,1,1)s2: dense (length-1) then split; maxp4 spatial
        y = MaxPool3d((2, 1, 1), (1, 1, 1), 0).apply({}, {}, y1)[0]
        y = _split_time(y)  # (8, N/8, 14, 24, 832)
        y = MaxPool3d((1, 2, 2), (1, 2, 2), 0).apply({}, {}, y)[0]
        y0, _ = base4.apply(params["base4"], state.get("base4", {}), y, train=train)

    return y0, y1, y2, y3


TEMPORAL_HALO = 56  # dense-mode temporal receptive radius of the S3D
# backbone in input frames, rounded up to the /8 phase alignment:
# stem conv_t r3 + sep192_t 2 + base2 4 + maxp3 2 + base3 20 + maxt4 4
# + base4 16 = 51 (each at its own temporal resolution, expressed in input
# frames). Pinned empirically by tests/test_streaming.py::test_tsharded.


def streaming_pyramid_tsharded(params, state, x, mesh, *, axis: str = "data",
                               halo: int = TEMPORAL_HALO):
    """Timeline pyramid with the chunk's TIME axis sharded over a mesh axis
    — the SURVEY §5 long-context extension (the reference scales clips by
    architecture variant only; here a long chunk's backbone runs
    data-parallel over ICI).

    x: (1, N, H, W, 3); N must divide into 8-aligned per-device segments no
    shorter than `halo`. Each device ppermutes its edge frames to its
    neighbors (halo exchange, 2 collectives), runs the UNCHANGED
    streaming_pyramid on its halo-extended segment, and keeps its own
    trimmed slice. Redundant-halo design: for the intended regime
    (segment >> halo, e.g. N=1024 on 8 devices) the duplicated compute is
    ~2x per device for an 8x parallel width, and the whole backbone stack
    is reused verbatim rather than re-deriving per-layer exchanges.

    Semantics: EXACT equal to streaming_pyramid everywhere except within
    each level's (small) receptive radius of the GLOBAL chunk edges: the
    unsharded path zero-pads each temporal conv at the chunk boundary
    (zeroing out-of-chunk activations at EVERY layer), while the edge
    devices here zero-pad the INPUT frames, so real content bleeds a few
    positions into the boundary region through each conv's reach (measured:
    y3/y2 differ at the outermost 1-3 timeline positions, y1/y0 at none —
    tests/test_streaming.py::test_tsharded). Chunk-edge padding is itself a
    streaming-mode artifact, so both are equally (ap)proximate there."""
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    n = x.shape[1]
    seg = n // n_dev
    assert n % n_dev == 0 and seg % 8 == 0, (n, n_dev)
    assert seg >= halo, (
        f"per-device segment {seg} shorter than the halo {halo}: "
        f"temporal sharding needs chunks >= {halo * n_dev} frames on "
        f"{n_dev} devices (it is a long-context extension)")
    assert halo % 8 == 0, halo

    def seg_fn(x_seg):
        idx = jax.lax.axis_index(axis)
        fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        left = jax.lax.ppermute(x_seg[:, -halo:], axis, fwd)
        right = jax.lax.ppermute(x_seg[:, :halo], axis, bwd)
        left = jnp.where(idx == 0, jnp.zeros_like(left), left)
        right = jnp.where(idx == n_dev - 1, jnp.zeros_like(right), right)
        xe = jnp.concatenate([left, x_seg, right], axis=1)
        pyr = streaming_pyramid(params, state, xe)
        return tuple(
            y[:, halo // f : (halo + seg) // f]
            for y, f in zip(pyr, (8, 4, 2, 2)))

    shards = shard_map(
        seg_fn, mesh=mesh,
        in_specs=P(None, axis),
        out_specs=tuple(P(None, axis) for _ in range(4)),
    )(x)
    return shards


def gather_windows(timelines, starts, clip_size: int = 32):
    """Per-window pyramid slices from phase timelines. starts: (Bw,) int32
    window start frames. Returns [y0, y1, y2, y3] batched over windows."""
    y0t, y1t, y2t, y3t = timelines
    s = starts.astype(jnp.int32)
    p1, s1 = s % 2, s // 2
    p2, s2 = s1 % 2, s1 // 2
    p3, s3 = s2 % 2, s2 // 2

    t16 = jnp.arange(clip_size // 2, dtype=jnp.int32)
    t8 = jnp.arange(clip_size // 4, dtype=jnp.int32)
    t4 = jnp.arange(clip_size // 8, dtype=jnp.int32)

    y3 = y3t[p1[:, None], s1[:, None] + t16[None, :]]
    y2 = y2t[p1[:, None], s1[:, None] + t16[None, :]]
    y1 = y1t[(p2 * 2 + p1)[:, None], s2[:, None] + t8[None, :]]
    y0 = y0t[(p3 * 4 + p2 * 2 + p1)[:, None], s3[:, None] + t4[None, :]]
    return [y0, y1, y2, y3]


def dense_decoder_front(dec_params, timelines, *, with_conv1: bool = True):
    """Per-chunk DENSE precomputation of the decoder's skip-window convs.

    In windowed decoding, conv2/conv3/conv4 slide strided temporal kernels
    over T-concats of [upsampled-deeper, skip-timeline-window]; for output
    positions whose taps fall entirely inside the skip part, the window
    conv at start s equals a VALID temporal conv over the skip TIMELINE at
    an s-dependent position (conv2: outputs t2,t3; conv3/conv4: t1..t3 —
    see decode_windows_v2). Overlapping windows share those positions, so
    computing each timeline position ONCE per chunk does ~2.3x less conv
    FLOPs than per-window evaluation and removes the dominant y2/y3 window
    gathers (hundreds of MB per decode batch).

    Returns raw (pre-relu) series plus the conv1 chain:
      c1u: up2x(relu(conv1(y0t)))            (8, T0, 14, 24, 832)
      c2y: VALID (3,3,3) conv of y1t          (4, T1-2, 14, 24, 480)
      c3y: VALID (5,3,3) conv of y2t          (2, T2-4, 28, 48, 192)
      c4y: VALID (5,3,3) conv of y3t          (2, T2-4, 56, 96, 64)

    Exact rearrangement of Decoder.apply's plan-(3,32) computation
    (tests/test_streaming.py::test_decode_v2_matches_v1).
    """
    from vinet_tpu.ops.conv import conv3d

    y0t, y1t, y2t, y3t = timelines
    c1u = None
    if with_conv1:
        # AViNet fuses audio into y0 per window, so its conv1 is windowed
        # (decode_windows_v2's y0_fused) and this dense series is skipped
        w1 = dec_params["conv1"]["w"]
        c1 = jax.nn.relu(conv3d(y0t, w1, stride=1, padding=(0, 1, 1)))
        c1u = upsample2x_hw_batch(c1)
    c2y = _valid_tconv(y1t, dec_params["conv2"]["w"])
    c3y = _valid_tconv(y2t, dec_params["conv3"]["w"])
    c4y = _valid_tconv(y3t, dec_params["conv4"]["w"])
    return c1u, c2y, c3y, c4y


def _valid_tconv(x, w):
    """(kt,3,3) conv, VALID in T, spatial pad 1 — as kt per-frame 2-D convs
    plus T-shifted adds (exact; XLA's 3-D conv codegen is 1.2-1.6x slower
    on the long-timeline shapes here, measured; VINET_KTSUM=0 reverts)."""
    from vinet_tpu.ops.conv import conv3d

    if os.environ.get("VINET_KTSUM", "1") == "0":
        return conv3d(x, w, stride=1, padding=(0, 1, 1))
    from jax import lax

    b, t, h, ww, c = x.shape
    kt, co = w.shape[0], w.shape[-1]
    x2 = x.reshape(b * t, h, ww, c)
    acc = None
    for k in range(kt):
        y = lax.conv_general_dilated(
            x2, w[k].astype(x.dtype), window_strides=(1, 1),
            padding=[(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = y.reshape(b, t, h, ww, co)
        piece = y[:, k:t - kt + 1 + k]
        acc = piece if acc is None else acc + piece
    return acc.astype(x.dtype)


def upsample2x_hw_batch(x):
    from vinet_tpu.ops.upsample import upsample2x_hw

    return upsample2x_hw(x)


def decode_windows_v2(decoder, dec_params, timelines, dense, starts,
                      y0_fused=None):
    """Windowed decode using the dense front: only the up-mixing output
    positions are computed per window; pure-skip positions are gathered
    from the dense series. Plan (3,32) geometry:

      conv2 over [z1(4), y1win(8)], kt3 st3: t0 = z1[0:3] (windowed),
        t1 = z1[3] + y1[0:2] (windowed), t2/t3 = y1[2:5]/[5:8] (dense)
      conv3 over [z2(4), y2win(16)], kt5 st5: t0 = z2[0:4] + y2[0]
        (windowed), t1..t3 = y2[1:6]/[6:11]/[11:16] (dense)
      conv4: same shape as conv3 over y3
      conv5 + head: phase-folded tail (models/decoder.py), per window.

    The decoder convs carry no biases (reference model.py:251-311), so
    partial contributions sum exactly before each relu."""
    from vinet_tpu.ops.conv import conv3d
    from vinet_tpu.ops.phasefold import conv_after_up2x
    from vinet_tpu.ops.upsample import upsample2x_hw

    _, y1t, y2t, y3t = timelines
    c1u, c2y, c3y, c4y = dense
    s = starts.astype(jnp.int32)
    p1, s1 = s % 2, s // 2
    p2, s2 = s1 % 2, s1 // 2
    p3, s3 = s2 % 2, s2 // 2
    pb = p2 * 2 + p1
    p0 = p3 * 4 + p2 * 2 + p1

    def gat(t, p, base, offs):
        return t[p[:, None], base[:, None] + jnp.asarray(offs, jnp.int32)[None, :]]

    w2 = dec_params["conv2"]["w"]
    w3 = dec_params["conv3"]["w"]
    w4 = dec_params["conv4"]["w"]

    if y0_fused is not None:
        # per-window y0 (audio-fused for AViNet): conv1 runs windowed
        w1 = dec_params["conv1"]["w"]
        z1 = upsample2x_hw(jax.nn.relu(
            conv3d(y0_fused, w1, stride=1, padding=(0, 1, 1))))
    else:
        z1 = gat(c1u, p0, s3, (0, 1, 2, 3))        # (Bw, 4, 14, 24, 832)
    y1h = gat(y1t, pb, s2, (0, 1))                 # (Bw, 2, 14, 24, 832)
    t0 = conv3d(z1[:, 0:3], w2[0:3], stride=1, padding=(0, 1, 1))
    t1 = (conv3d(z1[:, 3:4], w2[0:1], stride=1, padding=(0, 1, 1))
          + conv3d(y1h, w2[1:3], stride=1, padding=(0, 1, 1)))
    t23 = gat(c2y, pb, s2, (2, 5))
    z2 = jax.nn.relu(jnp.concatenate([t0, t1, t23.astype(t0.dtype)], axis=1))

    # the t0 convs consume a 2x-upsampled input -> phase-fold them
    # (ops/phasefold.py): one coarse-grid conv with 4x output channels
    # instead of materializing the upsample and running at 1/4 lane util
    y2f = gat(y2t, p1, s1, (0,))
    t0 = (conv_after_up2x(z2, w3[0:4], stride_t=1, pad_t=0)
          + conv3d(y2f, w3[4:5], stride=1, padding=(0, 1, 1)))
    t123 = gat(c3y, p1, s1, (1, 6, 11))
    z3 = jax.nn.relu(jnp.concatenate([t0, t123.astype(t0.dtype)], axis=1))

    y3f = gat(y3t, p1, s1, (0,))
    t0 = (conv_after_up2x(z3, w4[0:4], stride_t=1, pad_t=0)
          + conv3d(y3f, w4[4:5], stride=1, padding=(0, 1, 1)))
    t123 = gat(c4y, p1, s1, (1, 6, 11))
    z4 = jax.nn.relu(jnp.concatenate([t0, t123.astype(t0.dtype)], axis=1))

    z5 = jax.nn.relu(conv_after_up2x(
        z4, dec_params["conv5"]["w"], dec_params["conv5"].get("b"), stride_t=2))
    return decoder._phase_tail(dec_params, z5)


class StreamingPredictor:
    """Drop-in alternative to SlidingWindowPredictor for ViNet (visual-only):
    same emission order/indices, --streaming semantics. Warm-up frames
    (i < T-1, time-flipped clips in the reference) reuse the SAME machinery
    on the time-reversed chunk: the flipped window for start s is the
    reversed chunk's window starting at chunk_len - clip_size - s."""

    def __init__(self, model, params, state, *, clip_size: int = 32, batch: int = 16,
                 chunk: int = 128, dtype=jnp.bfloat16, blur_ksize: int = 11,
                 fold: bool = True, mesh=None):
        """mesh: optional jax.sharding.Mesh — decode window batches are
        sharded over its "data" axis (timelines replicated; exact vs single
        device, tests/test_inference_sharded.py). batch must be divisible by
        the data axis size."""
        if fold:
            params, state = fold_batchnorms(params, state)
        self.params = cast_floating(params, dtype)
        self.state = cast_floating(state, dtype)
        self.model = model
        self.clip_size = clip_size
        self.batch = batch
        self.chunk = chunk
        self.dtype = dtype
        self.blur_ksize = blur_ksize
        self.mesh = mesh
        if mesh is not None:
            assert batch % mesh.shape["data"] == 0, (batch, dict(mesh.shape))
        assert chunk % 8 == 0 and chunk >= 2 * clip_size
        self._jitted = {}

    def _shard_batch_axis(self, x):
        """Sharding constraint: leading (window-batch) axis over "data"."""
        if self.mesh is None:
            return x
        from vinet_tpu.parallel.mesh import batch_sharding

        return jax.lax.with_sharding_constraint(x, batch_sharding(self.mesh))

    # --- model-layout hooks (AVStreamingPredictor reroutes these) ---
    def _bb_params(self):
        return self.params["backbone"], self.state.get("backbone", {})

    def _dec_params(self):
        return self.params["decoder"]

    def _decoder(self):
        return self.model.decoder

    def _use_v2(self):
        """Dense-decoder-front fast path: plan-(3,32) geometry only."""
        from vinet_tpu.models.decoder import DECODER_PLANS

        return (self.clip_size == 32
                and self._decoder().plan == DECODER_PLANS[(3, 32)]
                and os.environ.get("VINET_STREAM_V2", "1") != "0")

    def _dense_with_conv1(self):
        return True

    # --- pure-function builders (multi-stream serving vmaps these over a
    # stream axis — inference/serving.py) ---
    def _build_timeline(self):
        def run(frames_u8, flip):
            x = device_preprocess(frames_u8[None]).astype(self.dtype)
            x = jnp.where(flip, x[:, ::-1], x)
            bb_p, bb_s = self._bb_params()
            tl = streaming_pyramid(bb_p, bb_s, x)
            if self._use_v2():
                return tl, dense_decoder_front(
                    self._dec_params(), tl,
                    with_conv1=self._dense_with_conv1())
            return tl, None
        return run

    def _build_decode(self):
        if self._use_v2():
            def run(timelines, dense, starts, audio=None):
                starts = self._shard_batch_axis(starts)
                out = decode_windows_v2(self._decoder(), self._dec_params(),
                                        timelines, dense, starts)
                return self._shard_batch_axis(out.astype(jnp.float32))
        else:
            def run(timelines, dense, starts, audio=None):
                starts = self._shard_batch_axis(starts)
                pyr = gather_windows(timelines, starts, self.clip_size)
                out, _ = self._decoder().apply(self._dec_params(), {}, pyr)
                return self._shard_batch_axis(out.astype(jnp.float32))
        return run

    def _build_post(self, out_hw: tuple, quantize_u8: bool = False):
        def post(maps):
            maps = self._shard_batch_axis(maps)
            if out_hw != maps.shape[1:]:
                maps = jax.image.resize(
                    maps, (maps.shape[0], *out_hw), method="bilinear", antialias=False
                )
            maps = gaussian_blur(maps, ksize=self.blur_ksize)
            if quantize_u8:
                from vinet_tpu.ops.image import quantize_maps_u8

                maps = quantize_maps_u8(maps)
            return maps
        return post

    def _timeline_fn(self):
        if "timeline" not in self._jitted:
            self._jitted["timeline"] = jax.jit(self._build_timeline())
        return self._jitted["timeline"]

    def _decode_fn(self):
        if "decode" not in self._jitted:
            self._jitted["decode"] = jax.jit(self._build_decode())
        return self._jitted["decode"]

    def _post_fn(self, out_hw: tuple, quantize_u8: bool = False):
        key = (out_hw, quantize_u8)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(self._build_post(out_hw, quantize_u8))
        return self._jitted[key]

    def predict_video(self, frames_u8: np.ndarray, *, out_size=None, pad_short=False,
                      audio_fn=None, quantize_u8=False):
        """frames_u8: (N, H, W, 3) uint8 model-sized frames. Yields
        (frame_index, map) for every predictable frame, in the reference's
        emission order (warm-up flipped maps interleaved).

        audio_fn(start_idx) -> (L, 1) float32: per-window audio excerpt for
        AViNet models (AVStreamingPredictor); excerpts for warm-up windows
        are time-flipped to match the flipped clips (engine.py semantics)."""
        n = frames_u8.shape[0]
        t = self.clip_size
        if n < 2 * t - 1:
            if not pad_short:
                return
            pad = np.repeat(frames_u8[:1], 2 * t - 1 - n, axis=0)
            frames_u8 = np.concatenate([pad, frames_u8], axis=0)
        offset = frames_u8.shape[0] - n if n < 2 * t - 1 else 0
        nn = frames_u8.shape[0]
        out_hw = tuple(out_size) if out_size is not None else frames_u8.shape[1:3]
        timeline = self._timeline_fn()
        decode = self._decode_fn()
        post = self._post_fn(out_hw, quantize_u8)

        # chunk length: fixed self.chunk, shrunk (to a multiple of 8, >= 2t)
        # for short videos so tiny inputs don't compile the full-chunk graph
        chunk = max(2 * t, min(self.chunk, ((nn + 7) // 8) * 8))
        if nn < chunk:  # pad tail by repeating the last frame; never emitted
            frames_u8 = np.concatenate(
                [frames_u8, np.repeat(frames_u8[-1:], chunk - nn, axis=0)], axis=0)

        plans = []  # (chunk_start, flipped, [(emit_frame, start_within_chunk)])

        # warm-up frames (reference emits them from time-FLIPPED clips,
        # generate_result.py:69-71): the flipped window for start s equals the
        # REVERSED first chunk's window starting at chunk - t - s
        warm = [(s - offset, chunk - t - s) for s in range(t - 1) if s - offset >= 0]
        if warm:
            plans.append((0, True, warm))
        # normal windows: frame i from [i-t+1, i], chunked with t-1 overlap
        starts = [(i - offset, i - t + 1) for i in range(t - 1, nn) if i - offset >= 0]
        c0 = 0
        while starts:
            hi = c0 + chunk - t  # window starts coverable by this chunk
            wins = [(f, s - c0) for f, s in starts if c0 <= s <= hi]
            if wins:
                plans.append((c0, False, wins))
            if hi >= nn - t:
                break
            c0 = min(hi + 1, max(frames_u8.shape[0] - chunk, 0))

        done = set()
        frames_dev = jax.device_put(frames_u8)
        pending = []  # (frames, device_maps); bulk-fetch to amortize the
        # device->host round trip (see engine.py)

        def flush():
            if not pending:
                return
            fetched = np.asarray(jnp.concatenate([m for _, m in pending], axis=0))
            k = 0
            for group, m in pending:
                for j, f in enumerate(group):
                    yield f, fetched[k + j]
                k += m.shape[0]
            pending.clear()

        for chunk_start, flipped, wins in plans:
            wins = [(f, s) for f, s in wins if f not in done]
            if not wins:
                continue
            tl, dense = timeline(frames_dev[chunk_start : chunk_start + chunk],
                                 jnp.asarray(flipped))
            for lo in range(0, len(wins), self.batch):
                group = wins[lo : lo + self.batch]
                pad_n = self.batch - len(group)
                sarr = np.asarray([s for _, s in group] + [0] * pad_n, np.int32)
                audio = None
                if audio_fn is not None:
                    # original-video window start for the audio excerpt:
                    # warm-up windows start at their emitted frame, normal
                    # windows t-1 before it (engine.window_plan semantics)
                    exc = [audio_fn(max(0, f if flipped else f - self.clip_size + 1))
                           for f, _ in group]
                    if flipped:
                        exc = [e[::-1] for e in exc]
                    audio = jnp.asarray(np.stack(
                        exc + [np.zeros_like(exc[0])] * pad_n))
                maps = decode(tl, dense, jnp.asarray(sarr), audio)
                done.update(f for f, _ in group)
                pending.append(([f for f, _ in group], post(maps)[: len(group)]))
                if len(pending) >= 4:
                    yield from flush()
        yield from flush()


class AVStreamingPredictor(StreamingPredictor):
    """Streaming sliding-window inference for AViNet (bilinear fusion,
    reference VideoAudioSaliencyModel): the VISUAL backbone timelines are
    shared across overlapping windows exactly as for ViNet, while the
    per-window work — SoundNet on the window's audio excerpt, the
    y0 maxpool + bilinear fusion (+ optional transformer refinement), and
    the decoder — runs in window batches, with the pure-skip decoder
    positions still served by the dense front (y1/y2/y3 are audio-free).
    Reference workload: generate_result_audio_visual.py sliding windows."""

    def _bb_params(self):
        return (self.params["visual_model"]["backbone"],
                self.state.get("visual_model", {}).get("backbone", {}))

    def _dec_params(self):
        return self.params["visual_model"]["decoder"]

    def _decoder(self):
        return self.model.visual.decoder

    def _dense_with_conv1(self):
        return False

    def _fuse(self, y0w, audio):
        """Per-window audio-visual fusion: y0w (Bw, 4, 7, 12, 1024),
        audio (Bw, L, 1) -> fused (Bw, 4, 7, 12, 1024). Mirrors
        AViNet.apply's fusion block (models/avinet.py)."""
        from vinet_tpu.models.avinet import (_ndhwc_from_tokens,
                                             _tokens_from_ndhwc)
        from vinet_tpu.ops.conv import maxpool3d

        m = self.model
        a, _ = m.audionet.apply(self.params["audionet"],
                                self.state.get("audionet", {}),
                                audio.astype(self.dtype))
        y0p = maxpool3d(y0w, kernel=(4, 1, 1), stride=(2, 1, 2), padding=0)
        v = _tokens_from_ndhwc(y0p)
        at = jnp.swapaxes(a, 1, 2)
        fused, _ = m.bilinear.apply(self.params["bilinear"], {}, v, at)
        fused = _ndhwc_from_tokens(fused, m.y0_tdhw)
        if m.use_transformer:
            cin, tr, cout = m._refiner()
            z, _ = cin.apply(self.params["conv_in_1x1"], {}, fused)
            tokens = _tokens_from_ndhwc(z)
            tokens, _ = tr.apply(self.params["transformer"], {}, tokens)
            z = _ndhwc_from_tokens(tokens, m.y0_tdhw)
            fused, _ = cout.apply(self.params["conv_out_1x1"], {}, z)
        return fused

    def _gather_y0(self, y0t, starts):
        s = starts.astype(jnp.int32)
        p1, s1 = s % 2, s // 2
        p2, s2 = s1 % 2, s1 // 2
        p3, s3 = s2 % 2, s2 // 2
        p0 = p3 * 4 + p2 * 2 + p1
        t4 = jnp.arange(self.clip_size // 8, dtype=jnp.int32)
        return y0t[p0[:, None], s3[:, None] + t4[None, :]]

    def _build_decode(self):
        if self._use_v2():
            def run(timelines, dense, starts, audio):
                starts = self._shard_batch_axis(starts)
                audio = self._shard_batch_axis(audio)
                fused = self._fuse(self._gather_y0(timelines[0], starts), audio)
                out = decode_windows_v2(self._decoder(), self._dec_params(),
                                        timelines, dense, starts,
                                        y0_fused=fused)
                return self._shard_batch_axis(out.astype(jnp.float32))
        else:
            def run(timelines, dense, starts, audio):
                starts = self._shard_batch_axis(starts)
                audio = self._shard_batch_axis(audio)
                pyr = gather_windows(timelines, starts, self.clip_size)
                pyr[0] = self._fuse(pyr[0], audio)
                out, _ = self._decoder().apply(self._dec_params(), {}, pyr)
                return self._shard_batch_axis(out.astype(jnp.float32))
        return run
