"""Multi-stream live serving: N concurrent video streams on one chip.

LiveStreamingPredictor (inference/live.py) serves ONE stream. A production
saliency service (many cameras / broadcast channels per accelerator) wants
S streams per device: this module advances S streams' timelines in ONE
jitted step by vmapping the single-stream pure functions over a leading
stream axis.

What batching buys (measured, NOTES.md round 3): per-stream state is
per-stream MXU work, so one chip's TOTAL live rate is roughly flat in S
(330 maps/s at S=1, 305 at S=2, 299 at S=4, micro 16) — the win is NOT
single-chip throughput. It is (a) S synchronized streams per program with
one dispatch sequence instead of S interleaved ones, and (b) stream_mesh:
the stream axis shards over a device mesh with ZERO cross-chip collectives,
scaling a single server linearly to N chips.

Semantics: each stream's maps are exactly what a dedicated
LiveStreamingPredictor would emit (vmap is per-example semantics; pinned by
tests/test_serving.py). Streams are SYNCHRONIZED: every feed() call delivers
the same number of frames for every stream (the natural shape for fixed-rate
sources sharing a clock); streams that end early can be padded by the caller
with repeated last frames, whose maps the caller drops — flush() documents
the same right-edge semantics as the single-stream server.

No reference counterpart: the reference's inference is one offline video per
process (/root/reference/generate_result.py); its only "multi-stream" story
is launching independent processes (--start_idx/--num_parts sharding). This
is the TPU-native replacement: one program, one chip, S streams batched.

Usage:
    server = MultiLiveServer(model, params, state, streams=4, micro=16)
    for got in (server.feed(frames), ...):   # frames: (S, k, H, W, 3) u8
        for s, idx, smap in got: ...
    for s, idx, smap in server.flush(): ...

AVMultiLiveServer adds per-stream rolling audio buffers (AViNet bilinear
fusion), mirroring AVLiveStreamingPredictor.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from vinet_tpu.data.audio import MAX_AUDIO_WIN
from vinet_tpu.inference.live import LiveStreamingPredictor
from vinet_tpu.inference.streaming import AVStreamingPredictor


class MultiLiveServer(LiveStreamingPredictor):
    """S synchronized live streams, batched into one advance/decode pipeline.

    All device state (segment tails, rolling timeline buffers) carries a
    leading stream axis; the jitted programs are jax.vmap of the
    single-stream builders. Window starts are SHARED across streams (the
    streams advance in lockstep), so the decode vmaps with in_axes=(0,0,None)
    — one gather plan, S times the MXU work per dispatch.

    stream_mesh: optional jax.sharding.Mesh — the STREAM axis (and with it
    every piece of device state) is sharded over the mesh's "data" axis, so
    one server program drives streams on N chips with zero cross-device
    communication (the vmapped programs are per-stream; GSPMD partitions
    them trivially). streams must be divisible by the data axis size.
    Exact vs the unsharded server (tests/test_serving.py)."""

    def __init__(self, model, params, state, *, streams: int,
                 stream_mesh=None, **kw):
        assert streams >= 1, streams
        self.streams = int(streams)
        self.stream_mesh = stream_mesh
        if stream_mesh is not None:
            assert kw.get("mesh") is None, \
                "stream_mesh shards the stream axis; window-batch mesh " \
                "sharding (mesh=) cannot be combined with it"
            assert streams % stream_mesh.shape["data"] == 0, (
                streams, dict(stream_mesh.shape))
        super().__init__(model, params, state, **kw)

    # ---------------------------------------------- stream-axis sharding --
    def _stream_sharding(self):
        from jax.sharding import NamedSharding, PartitionSpec

        return NamedSharding(self.stream_mesh, PartitionSpec("data"))

    def _sconstrain(self, tree):
        """Inside-jit constraint: every leaf's leading (stream) axis over
        "data". No-op without a stream_mesh."""
        if self.stream_mesh is None:
            return tree
        s = self._stream_sharding()
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, s), tree)

    def _put_streams(self, x):
        """Host->device placement of a leading-stream-axis array."""
        if self.stream_mesh is None:
            return jnp.asarray(x)
        return jax.device_put(np.asarray(x), self._stream_sharding())

    # ------------------------------------------------- vmapped jitted fns --
    def _advance_fn(self):
        if "advance" not in self._jitted:
            run = jax.vmap(self._build_advance())

            def adv(tails, bufs, frames):
                tails, bufs, frames = self._sconstrain((tails, bufs, frames))
                return self._sconstrain(run(tails, bufs, frames))

            self._jitted["advance"] = jax.jit(adv, donate_argnums=(0, 1))
        return self._jitted["advance"]

    def _timeline_fn(self):
        if "timeline" not in self._jitted:
            run = jax.vmap(self._build_timeline(), in_axes=(0, None))

            def tl(frames, flip):
                return self._sconstrain(run(self._sconstrain(frames), flip))

            self._jitted["timeline"] = jax.jit(tl)
        return self._jitted["timeline"]

    def _decode_fn(self):
        if "decode" not in self._jitted:
            base = self._build_decode()
            run = jax.vmap(lambda tl, dn, st: base(tl, dn, st),
                           in_axes=(0, 0, None))

            def dec(tl, dn, st, audio=None):
                tl, dn = self._sconstrain((tl, dn))
                return self._sconstrain(run(tl, dn, st))

            self._jitted["decode"] = jax.jit(dec)
        return self._jitted["decode"]

    def _post_fn(self, out_hw: tuple, quantize_u8: bool = False):
        key = (out_hw, quantize_u8, "multi")
        if key not in self._jitted:
            base = self._build_post(out_hw, quantize_u8)

            def post(maps):  # (S, B, h, w) -> fold streams into the batch
                maps = self._sconstrain(maps)
                s, b = maps.shape[:2]
                out = base(maps.reshape(s * b, *maps.shape[2:]))
                return self._sconstrain(out.reshape(s, b, *out.shape[1:]))

            self._jitted[key] = jax.jit(post)
        return self._jitted[key]

    # ------------------------------------------------------ device state --
    def _init_dev(self, h, w):
        tails, bufs = super()._init_dev(h, w)
        bc = lambda t: jax.tree_util.tree_map(
            lambda z: jnp.zeros((self.streams, *z.shape), z.dtype), t)
        tails, bufs = bc(tails), bc(bufs)
        if self.stream_mesh is not None:
            s = self._stream_sharding()
            put = lambda t: jax.tree_util.tree_map(
                lambda z: jax.device_put(z, s), t)
            tails, bufs = put(tails), put(bufs)
        return tails, bufs

    def _views(self):
        _, bufs = self._dev
        v = {k: bufs[k][:, :, off:]
             for k, off in self._VIEW_OFF.items() if k in bufs}
        timelines = (v["y0"], v["y1"], v["y2"], v["y3"])
        dense = ((v.get("c1u"), v["c2y"], v["c3y"], v["c4y"])
                 if self._use_v2() else None)
        return timelines, dense

    # -------------------------------------------------------------- feed --
    def feed(self, frames_u8: np.ndarray):
        """Feed (S, k, H, W, 3) uint8 frames — k new frames per stream, the
        SAME k for all streams; yields every (stream, frame_index, map) that
        became final."""
        frames_u8 = np.asarray(frames_u8)
        if frames_u8.ndim == 4:  # one frame per stream
            frames_u8 = frames_u8[:, None]
        assert frames_u8.ndim == 5 and frames_u8.shape[0] == self.streams, (
            frames_u8.shape, self.streams)
        if frames_u8.shape[1] == 0:
            return
        if self._dev is None:
            h, w = frames_u8.shape[2:4]
            self._hw = (h, w)
            self._out_hw = tuple(getattr(self, "_out_size", None) or (h, w))
            self._quantize_u8 = getattr(self, "_quantize_u8", False)
            tails, bufs = self._init_dev(h, w)
            self.bufs_len = {k: v.shape[2] for k, v in bufs.items()
                             if k in ("y0", "y1", "y2", "y3")}
            self._dev = (tails, bufs)
        self._last_frame = np.asarray(frames_u8[:, -1])  # (S, H, W, 3)
        # pending entries are per-time-step (S, H, W, 3) slabs
        self._pending_frames.extend(np.moveaxis(frames_u8, 1, 0))
        if not self._warmed:
            need = self.warmup_chunk - len(self._early)
            self._early.extend(np.moveaxis(frames_u8, 1, 0)[:max(0, need)])

        advance = self._advance_fn()
        while len(self._pending_frames) >= self.micro:
            chunk = np.stack(self._pending_frames[: self.micro], axis=1)
            self._pending_frames = self._pending_frames[self.micro:]
            tails, bufs = self._dev
            self._dev = advance(tails, bufs, self._put_streams(chunk))
            self._n_in += self.micro

        if not self._warmed and len(self._early) >= self.warmup_chunk:
            yield from self._emit_warmup()
        if self._warmed:
            yield from self._decode_live(min(self._emittable(),
                                             self._real_frame_count()))

    def _emit_warmup(self):
        """One flipped chunked-timeline pass per stream (vmapped), emitting
        frames 0..T-2 of every stream — reference warm-up semantics
        (/root/reference/generate_result.py:69-71)."""
        t = self.clip_size
        wc = self.warmup_chunk
        frames = self._put_streams(np.stack(self._early[:wc], axis=1))  # (S,wc,...)
        timeline = self._timeline_fn()
        decode = self._decode_fn()
        post = self._post_fn(self._out_hw, self._quantize_u8)
        tl, dense = timeline(frames, jnp.asarray(True))
        warm = [(s, wc - t - s) for s in range(t - 1)]
        for lo in range(0, len(warm), self.batch):
            group = warm[lo: lo + self.batch]
            pad = self.batch - len(group)
            sarr = jnp.asarray(np.asarray(
                [s for _, s in group] + [0] * pad, np.int32))
            audio = self._window_audio(
                [f for f, _ in group] + [-1] * pad, flipped=True)
            out = decode(tl, dense, sarr) if audio is None else \
                decode(tl, dense, sarr, audio)
            maps = np.asarray(post(out)[:, : len(group)])
            for j, (f, _) in enumerate(group):
                for s in range(self.streams):
                    yield s, f, maps[s, j]
        self._warmed = True
        self._early = []

    def _decode_live(self, frames_emittable):
        t = self.clip_size
        decode = self._decode_fn()
        post = self._post_fn(self._out_hw, self._quantize_u8)
        while self._next_emit < frames_emittable:
            group = list(range(self._next_emit,
                               min(frames_emittable, self._next_emit + self.batch)))
            if group[0] < t - 1:
                group = [g for g in group if g >= t - 1]
                if not group:
                    self._next_emit = min(frames_emittable, t - 1)
                    continue
            base_in = self._n_in - self.span + 8
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
            fetched = np.asarray(post(maps)[:, : len(group)])
            for j, g in enumerate(group):
                for s in range(self.streams):
                    yield s, g, fetched[s, j]
            self._next_emit = group[-1] + 1

    # ------------------------------------------------------------- flush --
    def flush(self):
        """Drain: repeat each stream's OWN last frame (right-edge semantics
        as in LiveStreamingPredictor.flush)."""
        if self._last_frame is None:
            return
        total = self._real_frame_count()
        if not self._warmed and self._early:
            while len(self._early) < self.warmup_chunk:
                self._early.append(self._last_frame)
            if total >= 2 * self.clip_size - 1:
                yield from self._emit_warmup()
        while self._warmed and self._emittable() < total:
            pad = np.repeat(self._last_frame[:, None], self.micro, axis=1)
            self._flushed_pad += self.micro
            yield from self.feed(pad)
        if self._warmed:
            yield from self._decode_live(min(self._emittable(), total))


class AVMultiLiveServer(AVStreamingPredictor, MultiLiveServer):
    """Multi-stream AViNet serving: shared vmapped visual timelines +
    per-stream rolling audio sample buffers; SoundNet + bilinear fusion run
    per (stream, window) inside the vmapped decode. Audio semantics per
    stream match AVLiveStreamingPredictor (data/audio.py::audio_excerpt:
    int-truncated sample ranges, Hanning, center-pad to 70560, flipped
    excerpts for warm-up windows)."""

    def __init__(self, model, params, state, *, streams: int,
                 fps: float | None = None, audio_fs: int = 22050, **kw):
        assert audio_fs > 0
        self.fps = float(fps) if fps else None
        self.audio_fs = int(audio_fs)
        super().__init__(model, params, state, streams=streams, **kw)

    def _reset(self):
        super()._reset()
        self._samples = [np.zeros((0,), np.float32)
                         for _ in range(self.streams)]
        self._samples_base = [0] * self.streams

    def _decode_fn(self):
        if "decode" not in self._jitted:
            base = self._build_decode()  # AVStreaming run(tl, dn, st, audio)
            run = jax.vmap(base, in_axes=(0, 0, None, 0))

            def dec(tl, dn, st, audio):
                tl, dn, audio = self._sconstrain((tl, dn, audio))
                return self._sconstrain(run(tl, dn, st, audio))

            self._jitted["decode"] = jax.jit(dec)
        return self._jitted["decode"]

    def start(self, out_size=None, quantize_u8=False, fps=None):
        super().start(out_size, quantize_u8)
        if fps:
            self.fps = float(fps)

    def feed(self, frames_u8, audio=None):
        """audio: length-S sequence of 1-D sample chunks (what arrived since
        the last feed, per stream; entries may be empty)."""
        assert self.fps, "set fps (constructor or start()) before feeding"
        if audio is not None:
            assert len(audio) == self.streams, (len(audio), self.streams)
            for s, a in enumerate(audio):
                a = np.asarray(a, np.float32).reshape(-1)
                self._samples[s] = np.concatenate([self._samples[s], a])
        yield from MultiLiveServer.feed(self, frames_u8)
        self._trim_audio()

    def _trim_audio(self):
        if not self._warmed:
            return
        spf = self.audio_fs / self.fps
        lo = max(0, int((self._next_emit - self.clip_size) * spf - spf))
        for s in range(self.streams):
            drop = lo - self._samples_base[s]
            if drop > 0:
                self._samples[s] = self._samples[s][drop:]
                self._samples_base[s] = lo

    def _window_audio(self, starts, flipped):
        """(S, B, L, 1) excerpts — AVLiveStreamingPredictor._window_audio
        applied per stream buffer."""
        fs, fps = self.audio_fs, self.fps
        spf = fs / fps
        out = np.zeros((self.streams, len(starts), MAX_AUDIO_WIN), np.float32)
        for si in range(self.streams):
            total = self._samples_base[si] + self._samples[si].shape[0]
            for j, sidx in enumerate(starts):
                if sidx < 0:
                    continue
                t0 = sidx * (1.0 / fps) * fs
                t1 = (sidx + self.clip_size - 1) * (1.0 / fps) * fs
                s = int(max(0.0, t0 - spf / 2))
                e = int(min(total, t1 + spf / 2))
                assert s >= self._samples_base[si], (
                    s, self._samples_base[si],
                    "audio excerpt fell off the rolling sample buffer")
                seg = self._samples[si][s - self._samples_base[si]:
                                        e + 1 - self._samples_base[si]]
                n = seg.shape[0]
                if n > 0:
                    m = min(n, MAX_AUDIO_WIN)
                    segw = seg[:m] * np.hanning(n)[:m].astype(np.float32)
                    c = MAX_AUDIO_WIN // 2
                    lo = c - m // 2
                    out[si, j, lo:lo + m] = segw
        buf = out[:, :, :, None]
        if flipped:
            buf = buf[:, :, ::-1]
        return self._put_streams(buf)
