"""Live (incremental) streaming inference: feed frames as they arrive, get a
saliency map for every frame, with bounded latency and O(1) work per frame.

The chunked --streaming encoder (inference/streaming.py) needs the whole
chunk (128 frames) in memory and recomputes nothing — but a LIVE source
(camera, broadcast) delivers frames one at a time, and re-running a chunk
per microbatch would multiply the backbone cost by chunk/microbatch.

This module advances the SAME dense phase timelines incrementally by
overlap-save: the backbone is cut into segments at the points where
streaming_pyramid splits phases; each segment keeps a cached tail of its own
INPUT timeline (length = its temporal receptive diameter) and, per
F-frame microbatch, runs VALID in time over [tail | new] — producing
exactly the new timeline positions, bit-identical to the chunked
computation away from stream boundaries. Per-microbatch backbone work is
F/rate + diameter positions per segment (~1.4-1.8x the amortized chunked
cost at F=16, vs chunk/F = 8x for naive re-chunking).

Latency: the S3D temporal convs are CENTERED, so a timeline position is
final only once its future context exists. The emission lag is a constant
of the architecture (~57 input frames with the alignment slack below —
TEMPORAL_HALO 51 rounded up by per-segment phase alignment); maps then come
out in F-frame batches. Emitted maps are EXACT streaming maps (tests pin
equality with StreamingPredictor's interior output).

Boundary semantics: the stream start behaves as if preceded by zero FRAMES
(the segments' zero-initialized tails), while chunked mode zero-pads each
layer's activations at the chunk edge — the same interior-exact /
edge-approximate tradeoff as streaming_pyramid_tsharded (streaming.py), and
it only affects the first ~TEMPORAL_HALO frames. flush() drains the
pipeline by repeating the last frame (matching the chunked tail-padding
choice) and emits the remaining maps with right-edge semantics.

Warm-up frames (reference emits frames 0..T-2 from time-FLIPPED clips,
/root/reference/generate_result.py:69-71) need the reversed stream, which a
live source cannot provide incrementally; they are emitted once 2T-1 frames
have arrived via one flipped chunked-timeline pass — the same machinery
StreamingPredictor uses for its first chunk.

LiveStreamingPredictor is visual-only (ViNet); AVLiveStreamingPredictor
adds the audio-visual path (AViNet bilinear fusion) with a rolling audio
sample buffer. No reference counterpart: the reference's inference is
offline sliding windows over stored videos.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from vinet_tpu.data.audio import MAX_AUDIO_WIN
from vinet_tpu.data.pipeline import device_preprocess
from vinet_tpu.models.layers import Composite, Conv3d, MaxPool3d, Sequential
from vinet_tpu.models.s3d import InceptionBlock, S3DBackbone
from vinet_tpu.inference.streaming import (AVStreamingPredictor,
                                           StreamingPredictor, _dense_time,
                                           _split_time)
from vinet_tpu.ops.conv import force_lower2d


def _triple(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v, v)


def _valid_apply(mod, params, state, x):
    """Apply a (dense-time) module with temporal padding STRIPPED: the output
    loses the module's temporal receptive radius at each end. Returns
    (y, radius) with radius in input positions. Inception branches have
    unequal radii (1x1 branches are temporally pointwise), so their valid
    outputs are trimmed to the widest branch before the channel concat."""
    if isinstance(mod, Conv3d):
        p = _triple(mod.padding)
        if p[0]:
            mod = dataclasses.replace(mod, padding=(0, p[1], p[2]))
        return mod.apply(params, state, x)[0], p[0]
    if isinstance(mod, MaxPool3d):
        p = _triple(mod.padding)
        k = _triple(mod.kernel)
        if p[0]:
            mod = dataclasses.replace(mod, padding=(0, p[1], p[2]))
        assert k[0] == 1 or p[0] or k[0] == 2, (k, p)
        return mod.apply({}, {}, x)[0], p[0]
    if isinstance(mod, Sequential):
        r = 0
        for i, layer in enumerate(mod.layers):
            x, ri = _valid_apply(layer, params.get(str(i), {}), state.get(str(i), {}), x)
            r += ri
        return x, r
    if isinstance(mod, Composite):
        r = 0
        for name, layer in mod.children:
            x, ri = _valid_apply(layer, params.get(name, {}), state.get(name, {}), x)
            r += ri
        return x, r
    if isinstance(mod, InceptionBlock):
        outs, radii = [], []
        for name, branch in mod._branches():
            y, ri = _valid_apply(branch, params[name], state.get(name, {}), x)
            outs.append(y)
            radii.append(ri)
        rmax = max(radii)
        outs = [y[:, rmax - ri: y.shape[1] - (rmax - ri) or None]
                for y, ri in zip(outs, radii)]
        return jnp.concatenate(outs, axis=-1), rmax
    # stateless elementwise (ReLU etc.)
    return mod.apply(params, state, x)[0], 0


# Per-segment temporal geometry. Radii are architecture constants
# (sep/mixed temporal kernels), pinned by tests/test_live.py against the
# chunked encoder. Segment cut points are streaming_pyramid's seams.
#   A : stem (SepConv3d k7)                r=3, input rate, then split /2
#   B : pool + 1x1 + sep192               r=1 at /2
#   C : maxpool + base2 (2 Mixed)         r=2 at /2
#   D1: maxp3 (3,3,3) dense-T             r=1 at /2, then split /4
#   D2: base3 (5 Mixed)                   r=5 at /4
#   E1: maxt4 (2,1,1) dense-T             k=2 valid (future 1), then split /8
#   E2: spatial pool + base4 (2 Mixed)    r=2 at /8
# Tail lengths are the receptive DIAMETER (p+q), with one extra PAST slot on
# A and E1 so every split input block starts at an even timeline position
# (phase-major _split_time assigns phases by in-block parity; the extra slot
# shifts the block-start parity, costing one position of extra lag).
_TAIL_A, _TAIL_B, _TAIL_C, _TAIL_D1, _TAIL_D2, _TAIL_E1, _TAIL_E2 = 7, 2, 4, 2, 10, 2, 4

# Newest GLOBAL position per level after n input frames (zero-preceded
# stream), derived by composing the block-start offsets of the segments
# above; pinned empirically by tests/test_live.py::test_live_matches_chunked.
#   y3: n/2 - 4    y2: n/2 - 6    y1: n/4 - 9    y0: n/8 - 8
# and the dense-front series (VALID convs over the timelines):
#   c2y: y1 - 2    c3y/c4y: y2 - 4    c1u: y0
_NEWEST = {
    "y3": lambda n: n // 2 - 4,
    "y2": lambda n: n // 2 - 6,
    "y1": lambda n: n // 4 - 9,
    "y0": lambda n: n // 8 - 8,
}


class LiveStreamingPredictor(StreamingPredictor):
    """Stateful live server. Usage:

        live = LiveStreamingPredictor(model, params, state, micro=16)
        for got in (live.feed(frame_batch), ...):   # arbitrary u8 frames
            for idx, smap in got: ...
        for idx, smap in live.flush(): ...          # drain the pipeline

    feed() accepts (k, H, W, 3) uint8 model-sized frames (any k); maps are
    emitted in input order with a constant pipeline lag (~57 frames + one
    microbatch). Reuses StreamingPredictor's decode/post machinery
    (gather_windows / decode_windows_v2) on ROLLING timeline buffers."""

    def __init__(self, model, params, state, *, clip_size: int = 32,
                 batch: int = 16, micro: int = 16, span: int = 160,
                 dtype=jnp.bfloat16, blur_ksize: int = 11, fold: bool = True,
                 warmup_chunk: int | None = None):
        assert micro % 8 == 0 and micro > 0, micro
        # rolling-buffer span (input frames): must cover the pipeline lag
        # plus one window plus one microbatch of emission slack
        assert span % 8 == 0 and span >= 96 + clip_size + 2 * micro, (span, micro)
        super().__init__(model, params, state, clip_size=clip_size, batch=batch,
                         chunk=max(2 * clip_size, ((span + 7) // 8) * 8),
                         dtype=dtype, blur_ksize=blur_ksize, fold=fold)
        self.micro = micro
        self.span = span
        self.warmup_chunk = warmup_chunk or 2 * clip_size
        assert self.warmup_chunk % 8 == 0 and self.warmup_chunk >= 2 * clip_size - 1
        # steady emission starts only after the warm-up pass; the oldest
        # steady window (start 0) must still be on the rolling buffers then
        assert span >= self.warmup_chunk + 8, (span, self.warmup_chunk)
        self._reset()

    # ------------------------------------------------------------- state --
    def _reset(self):
        self._n_in = 0          # frames fully processed into the timelines
        self._next_emit = 0     # next frame index to emit
        self._pending_frames = []   # host frames not yet advanced
        self._early = []        # first frames kept for the flipped warm-up
        self._warmed = False
        self._last_frame = None
        self._flushed_pad = 0
        self._dev = None        # (tails, bufs) device pytrees

    def _init_dev(self, h, w):
        hw = lambda f: (h // f, w // f)
        d = self.dtype
        S = self.span
        L2, L1, L0 = S // 2, S // 4, S // 8
        z = lambda shape: jnp.zeros(shape, d)
        tails = {
            "A": z((1, _TAIL_A, h, w, 3)),
            "B": z((2, _TAIL_B, *hw(2), 64)),
            "C": z((2, _TAIL_C, *hw(4), 192)),
            "D1": z((2, _TAIL_D1, *hw(8), 480)),
            "D2": z((4, _TAIL_D2, *hw(16), 480)),
            "E1": z((4, _TAIL_E1, *hw(16), 832)),
            "E2": z((8, _TAIL_E2, *hw(32), 832)),
        }
        bufs = {
            "y3": z((2, L2, *hw(4), 192)),
            "y2": z((2, L2, *hw(8), 480)),
            "y1": z((4, L1, *hw(16), 832)),
            "y0": z((8, L0, *hw(32), 1024)),
        }
        if self._use_v2():
            dec = self._dec_params()
            c2c = dec["conv2"]["w"].shape[-1]
            c3c = dec["conv3"]["w"].shape[-1]
            c4c = dec["conv4"]["w"].shape[-1]
            bufs.update({
                "c2y": z((4, L1, *hw(16), c2c)),
                "c3y": z((2, L2, *hw(8), c3c)),
                "c4y": z((2, L2, *hw(4), c4c)),
            })
            if self._dense_with_conv1():
                # AViNet fuses audio into y0 per window, so conv1 is
                # windowed (decode_windows_v2 y0_fused) and has no dense
                # series (streaming.dense_decoder_front with_conv1=False)
                c1c = dec["conv1"]["w"].shape[-1]
                bufs["c1u"] = z((8, L0, *hw(16), c1c))
        return tails, bufs

    # ------------------------------------------------------ advance (jit) --
    def _build_advance(self):
        """Pure (tails, bufs, frames_u8) -> (tails, bufs) overlap-save step;
        _advance_fn jits it (multi-stream serving vmaps it first)."""
        import os

        bb_p, bb_s = self._bb_params()
        bb = S3DBackbone()
        base1, base2, base3, base4 = (_dense_time(m) for m in bb._stages())
        stem, pool1, b1x1, sep192 = base1.layers
        segB = Sequential(pool1, b1x1, sep192)
        segC = Sequential(MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)), *base2.layers)
        segD1 = MaxPool3d((3, 3, 3), (1, 2, 2), (1, 1, 1))
        area = int(os.environ.get("VINET_STREAM_LOWER2D", "86016"))
        pB = {str(i): bb_p["base1"][k] for i, k in ((1, "2"), (2, "3"))}
        sB = {str(i): bb_s.get("base1", {}).get(k, {}) for i, k in ((1, "2"), (2, "3"))}
        pC = {str(i + 1): bb_p["base2"][str(i)] for i in range(len(base2.layers))}
        sC = {str(i + 1): bb_s.get("base2", {}).get(str(i), {}) for i in range(len(base2.layers))}

        def shift_in(buf, new):
            n = new.shape[1]
            return jnp.concatenate([buf[:, n:], new.astype(buf.dtype)], axis=1)

        def seg(tails, key, mod, params, state, new, *, keep_oldest=None):
            """Overlap-save one segment: returns its new output positions and
            updates the tail cache. keep_oldest trims extra computable
            positions produced by an enlarged tail (parity alignment)."""
            buf = jnp.concatenate([tails[key], new.astype(tails[key].dtype)], axis=1)
            tails[key] = buf[:, -tails[key].shape[1]:]
            y, _ = _valid_apply(mod, params, state, buf)
            if keep_oldest is not None:
                y = y[:, :keep_oldest]
            return y

        def advance(tails, bufs, frames_u8):
            x = device_preprocess(frames_u8[None]).astype(self.dtype)  # (1,F,...)
            f = x.shape[1]
            with force_lower2d(area):
                # A: stem, radius 3, tail 7 (one extra past slot -> the F
                # outputs start one position EARLIER than tail-6 would give,
                # making every split block start at an even global position)
                a = seg(tails, "A", stem, bb_p["base1"]["0"],
                        bb_s.get("base1", {}).get("0", {}), x, keep_oldest=f)
                a = _split_time(a)                                  # (2, F/2)
                y3n = seg(tails, "B", segB, pB, sB, a)              # (2, F/2)
                y2n = seg(tails, "C", segC, pC, sC, y3n)            # (2, F/2)
                d1 = seg(tails, "D1", segD1, {}, {}, y2n)           # (2, F/2)
                d1 = _split_time(d1)                                # (4, F/4)
                y1n = seg(tails, "D2", base3, bb_p["base3"],
                          bb_s.get("base3", {}), d1)                # (4, F/4)
                e1 = seg(tails, "E1", MaxPool3d((2, 1, 1), (1, 1, 1), 0), {}, {},
                         y1n, keep_oldest=y1n.shape[1])             # (4, F/4)
                e1 = _split_time(e1)                                # (8, F/8)
                # spatial maxp4 is temporally pointwise: apply BEFORE the E2
                # tail cache (4x smaller state)
                e1 = MaxPool3d((1, 2, 2), (1, 2, 2), 0).apply({}, {}, e1)[0]
                y0n = seg(tails, "E2", base4, bb_p["base4"],
                          bb_s.get("base4", {}), e1)                # (8, F/8)

            news = {"y3": y3n, "y2": y2n, "y1": y1n, "y0": y0n}
            if self._use_v2():
                news.update(self._dense_front_new(bufs, news))
            for k, new in news.items():
                bufs[k] = shift_in(bufs[k], new)
            return tails, bufs

        return advance

    def _advance_fn(self):
        if "advance" not in self._jitted:
            self._jitted["advance"] = jax.jit(self._build_advance(),
                                              donate_argnums=(0, 1))
        return self._jitted["advance"]

    def _dense_front_new(self, bufs, news):
        """New dense-front positions from the new timeline positions: each
        series is a VALID temporal conv over its timeline, so its newest
        positions need the last (kt-1) cached timeline positions plus the
        new ones (the rolling buffers still hold them — the shift happens
        after this)."""
        from vinet_tpu.inference.streaming import _valid_tconv, upsample2x_hw_batch
        from vinet_tpu.ops.conv import conv3d

        dec = self._dec_params()
        out = {}
        if self._dense_with_conv1():
            w1 = dec["conv1"]["w"]
            c1 = jax.nn.relu(conv3d(news["y0"], w1, stride=1, padding=(0, 1, 1)))
            out["c1u"] = upsample2x_hw_batch(c1)
        for key, src, wkey in (("c2y", "y1", "conv2"),
                               ("c3y", "y2", "conv3"),
                               ("c4y", "y3", "conv4")):
            w = dec[wkey]["w"]
            kt = w.shape[0]
            ext = jnp.concatenate([bufs[src][:, -(kt - 1):], news[src]], axis=1)
            out[key] = _valid_tconv(ext, w)
        return out

    # ------------------------------------------------------------ decode --
    # Aligned views: the levels' rolling buffers lag the input by DIFFERENT
    # pipeline offsets (newest y3 = n/2-4 but y2 = n/2-6, ...), while the
    # decode's phase algebra assumes every timeline is indexed from a common
    # origin that is a multiple of 8 input frames. Dropping a CONSTANT
    # number of oldest slots per buffer re-bases them all to
    # B0 = n - span + 8 (≡ 0 mod 8): slot 0 of each view is position
    # B0/rate. Offsets derive from the segment lags pinned in _NEWEST.
    _VIEW_OFF = {"y3": 7, "y2": 9, "y1": 10, "y0": 8,
                 "c1u": 8, "c2y": 12, "c3y": 13, "c4y": 11}

    def _views(self):
        _, bufs = self._dev
        v = {k: bufs[k][:, off:] for k, off in self._VIEW_OFF.items() if k in bufs}
        timelines = (v["y0"], v["y1"], v["y2"], v["y3"])
        dense = ((v.get("c1u"), v["c2y"], v["c3y"], v["c4y"])
                 if self._use_v2() else None)
        return timelines, dense

    def _window_audio(self, starts, flipped):
        """Per-window audio excerpts for the given ORIGINAL-video window
        start frames, or None (visual-only). AVLiveStreamingPredictor
        overrides this with its rolling sample buffer."""
        return None

    def _emittable(self) -> int:
        """Largest frame index (exclusive) decodable from the processed
        timelines: frame i's window needs y0 up to (i-T+1)//8 + T//8 - 1
        (and shallower levels, which are strictly less binding)."""
        t = self.clip_size
        n = self._n_in
        lim = []
        for key, span, rate in (("y0", t // 8, 8), ("y1", t // 4, 4),
                                ("y2", t // 2, 2), ("y3", t // 2, 2)):
            newest = _NEWEST[key](n)
            # (i - t + 1)//rate + span - 1 <= newest
            lim.append(rate * (newest - span + 1) + t - 1 + (rate - 1))
        if self._use_v2():
            # c2y offsets reach (i-t+1)//4 + 5; c3y/c4y reach //2 + 11
            lim.append(4 * (_NEWEST["y1"](n) - 2 - 5) + t - 1 + 3)
            lim.append(2 * (_NEWEST["y2"](n) - 4 - 11) + t - 1 + 1)
            lim.append(2 * (_NEWEST["y3"](n) - 4 - 11) + t - 1 + 1)
        return max(0, min(lim) + 1)

    def _decode_live(self, frames_emittable):
        """Decode pending emittable windows in batches; yields (idx, map)."""
        t = self.clip_size
        decode = self._decode_fn()
        post = self._post_fn(self._out_hw, self._quantize_u8)
        while self._next_emit < frames_emittable:
            group = list(range(self._next_emit,
                               min(frames_emittable, self._next_emit + self.batch)))
            if group[0] < t - 1:  # warm-up frames come from the flipped pass
                group = [g for g in group if g >= t - 1]
                if not group:
                    self._next_emit = min(frames_emittable, t - 1)
                    continue
            base_in = self._n_in - self.span + 8  # view origin (see _views)
            assert base_in % 8 == 0, base_in
            starts = [g - t + 1 - base_in for g in group]
            assert min(starts) >= 0, (group[0], base_in,
                                      "window fell off the rolling buffers — "
                                      "increase span or drain feed() faster")
            pad = self.batch - len(group)
            sarr = jnp.asarray(np.asarray(starts + [0] * pad, np.int32))
            timelines, dense = self._views()
            audio = self._window_audio(
                [g - t + 1 for g in group] + [-1] * pad, flipped=False)
            maps = decode(timelines, dense, sarr) if audio is None else \
                decode(timelines, dense, sarr, audio)
            fetched = np.asarray(post(maps)[: len(group)])
            for j, g in enumerate(group):
                yield g, fetched[j]
            self._next_emit = group[-1] + 1

    # -------------------------------------------------------------- feed --
    def reset(self):
        """Start a new stream; compiled programs are kept (same-geometry
        streams re-use them — one predictor serves many videos)."""
        self._reset()

    def start(self, out_size=None, quantize_u8=False):
        """Set output geometry before feeding (defaults to frame size)."""
        self._out_size = out_size
        self._quantize_u8 = quantize_u8

    def feed(self, frames_u8: np.ndarray):
        """Feed (k, H, W, 3) uint8 model-sized frames; yields every
        (frame_index, map) that became final."""
        if frames_u8.ndim == 3:
            frames_u8 = frames_u8[None]
        if frames_u8.shape[0] == 0:
            return  # audio-only catch-up feed (AV) — nothing new decodable
        if self._dev is None:
            h, w = frames_u8.shape[1:3]
            self._hw = (h, w)
            self._out_hw = tuple(getattr(self, "_out_size", None) or (h, w))
            self._quantize_u8 = getattr(self, "_quantize_u8", False)
            tails, bufs = self._init_dev(h, w)
            self.bufs_len = {k: v.shape[1] for k, v in bufs.items()
                             if k in ("y0", "y1", "y2", "y3")}
            self._dev = (tails, bufs)
        self._last_frame = np.asarray(frames_u8[-1])
        self._pending_frames.extend(np.asarray(frames_u8))
        t = self.clip_size
        if not self._warmed:
            need = self.warmup_chunk - len(self._early)
            self._early.extend(np.asarray(frames_u8)[:max(0, need)])

        advance = self._advance_fn()
        while len(self._pending_frames) >= self.micro:
            chunk = np.stack(self._pending_frames[: self.micro])
            self._pending_frames = self._pending_frames[self.micro:]
            tails, bufs = self._dev
            self._dev = advance(tails, bufs, jnp.asarray(chunk))
            self._n_in += self.micro

        if not self._warmed and len(self._early) >= self.warmup_chunk:
            yield from self._emit_warmup()
        if self._warmed:
            yield from self._decode_live(min(self._emittable(),
                                             self._real_frame_count()))

    def _real_frame_count(self):
        return self._n_in + len(self._pending_frames) - self._flushed_pad

    def _emit_warmup(self):
        """Reference warm-up: frames 0..T-2 from time-flipped clips — one
        flipped chunked-timeline pass over the first warmup_chunk frames
        (StreamingPredictor's first-chunk plan)."""
        t = self.clip_size
        wc = self.warmup_chunk
        frames = jnp.asarray(np.stack(self._early[:wc]))
        timeline = self._timeline_fn()
        decode = self._decode_fn()
        post = self._post_fn(self._out_hw, self._quantize_u8)
        tl, dense = timeline(frames, jnp.asarray(True))
        warm = [(s, wc - t - s) for s in range(t - 1)]
        for lo in range(0, len(warm), self.batch):
            group = warm[lo: lo + self.batch]
            pad = self.batch - len(group)
            sarr = jnp.asarray(np.asarray([s for _, s in group] + [0] * pad, np.int32))
            audio = self._window_audio(
                [f for f, _ in group] + [-1] * pad, flipped=True)
            out = decode(tl, dense, sarr) if audio is None else \
                decode(tl, dense, sarr, audio)
            maps = np.asarray(post(out)[: len(group)])
            for j, (f, _) in enumerate(group):
                yield f, maps[j]
        self._warmed = True
        self._early = []

    # ------------------------------------------------------------- flush --
    def flush(self):
        """End of stream: drain the pipeline by repeating the last frame
        (the chunked predictor's tail padding) until every real frame is
        emitted. The final ~TEMPORAL_HALO frames carry right-edge semantics
        (repeated-frame context) — same class of boundary approximation as
        the chunked mode's chunk edges."""
        if self._last_frame is None:
            return
        total = self._real_frame_count()
        if not self._warmed and self._early:
            # short stream: pad the warm-up chunk too
            while len(self._early) < self.warmup_chunk:
                self._early.append(self._last_frame)
            if total >= 2 * self.clip_size - 1:
                yield from self._emit_warmup()
        while self._warmed and self._emittable() < total:
            pad = np.repeat(self._last_frame[None], self.micro, axis=0)
            self._flushed_pad += self.micro
            yield from self.feed(pad)
        if self._warmed:
            yield from self._decode_live(min(self._emittable(), total))

    def predict_video(self, frames_u8, **kw):  # pragma: no cover
        raise NotImplementedError(
            "LiveStreamingPredictor is a feed()/flush() server; use "
            "StreamingPredictor for stored videos")


class AVLiveStreamingPredictor(AVStreamingPredictor, LiveStreamingPredictor):
    """Live incremental serving for AViNet (bilinear audio-visual fusion).

    The visual timelines advance by the same overlap-save segments as
    LiveStreamingPredictor (audio never touches the backbone); audio enters
    only at decode, per emitted window: SoundNet on the window's excerpt +
    bilinear fusion into y0 (AVStreamingPredictor._decode_fn). Feed audio
    samples alongside frames:

        live = AVLiveStreamingPredictor(model, params, state, fps=30.0)
        for got in (live.feed(frames, audio=samples), ...): ...

    `audio` is the 1-D chunk of mono samples that arrived since the last
    feed, at `audio_fs` Hz and the reference's raw 2^-23 scale (see
    data/audio.py::load_wav_raw); frames and samples are aligned by their
    cumulative counts against the stream clock (frame f covers samples
    around (f-1)/fps*fs exactly as frame_sample_ranges). Because maps lag
    the input by the pipeline constant, every window's excerpt is complete
    by the time it is decoded; excerpts match data/audio.py::audio_excerpt
    (Hanning window, center-pad to 70560) and warm-up windows get the
    time-flipped excerpt (engine.py semantics). A stream without audio
    (never pass `audio`) degrades to zero excerpts — the reference's
    missing-wav behavior."""

    def __init__(self, model, params, state, *, fps: float | None = None,
                 audio_fs: int = 22050, **kw):
        super().__init__(model, params, state, **kw)
        assert audio_fs > 0
        self.fps = float(fps) if fps else None
        self.audio_fs = int(audio_fs)

    def _reset(self):
        super()._reset()
        self._samples = np.zeros((0,), np.float32)
        self._samples_base = 0  # global sample index of _samples[0]

    def start(self, out_size=None, quantize_u8=False, fps=None):
        super().start(out_size, quantize_u8)
        if fps:
            self.fps = float(fps)

    def feed(self, frames_u8, audio=None):
        assert self.fps, "set fps (constructor or start()) before feeding"
        if audio is not None:
            a = np.asarray(audio, np.float32).reshape(-1)
            self._samples = np.concatenate([self._samples, a])
        yield from LiveStreamingPredictor.feed(self, frames_u8)
        self._trim_audio()

    def _trim_audio(self):
        """Drop samples no future window can reference (oldest un-emitted
        window start = _next_emit - T + 1; one extra frame of slack)."""
        if not self._warmed:
            return  # warm-up windows reach back to sample 0
        spf = self.audio_fs / self.fps
        lo = max(0, int((self._next_emit - self.clip_size) * spf - spf))
        drop = lo - self._samples_base
        if drop > 0:
            self._samples = self._samples[drop:]
            self._samples_base = lo

    def _window_audio(self, starts, flipped):
        """Excerpts for the given window start frames (-1 = batch padding):
        data/audio.py::audio_excerpt over the rolling sample buffer, with
        the live stream's received-sample count as the end clamp."""
        fs, fps = self.audio_fs, self.fps
        spf = fs / fps
        total = self._samples_base + self._samples.shape[0]
        out = np.zeros((len(starts), MAX_AUDIO_WIN), np.float32)
        for j, sidx in enumerate(starts):
            if sidx < 0:
                continue
            # float expressions mirror frame_sample_ranges exactly
            # ((f-1) * (1/fps) * fs) so int() truncation agrees to the sample
            t0 = sidx * (1.0 / fps) * fs
            t1 = (sidx + self.clip_size - 1) * (1.0 / fps) * fs
            s = int(max(0.0, t0 - spf / 2))
            e = int(min(total, t1 + spf / 2))
            assert s >= self._samples_base, (
                s, self._samples_base,
                "audio excerpt fell off the rolling sample buffer")
            seg = self._samples[s - self._samples_base:
                                e + 1 - self._samples_base]
            n = seg.shape[0]
            if n > 0:
                m = min(n, MAX_AUDIO_WIN)
                segw = seg[:m] * np.hanning(n)[:m].astype(np.float32)
                c = MAX_AUDIO_WIN // 2
                lo = c - m // 2
                out[j, lo:lo + m] = segw
        buf = out[:, :, None]
        if flipped:
            buf = buf[:, ::-1]
        return jnp.asarray(buf)
