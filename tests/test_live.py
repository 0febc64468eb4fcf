"""Live incremental streaming (inference/live.py).

The exactness anchor: away from stream/chunk boundaries, the overlap-save
segment advance must reproduce the chunked streaming encoder's maps — both
compute the same dense phase timelines, so interior frames agree to fp
tolerance. Warm-up frames are bit-identical when the live warm-up chunk
equals the chunked predictor's chunk (same flipped pass). Stream start
(zero input tails vs per-layer zero padding) and flush tail (repeated last
frame) are the documented boundary approximations and are excluded.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vinet_tpu.inference.live import LiveStreamingPredictor
from vinet_tpu.inference.streaming import StreamingPredictor
from vinet_tpu.models import ViNet

T = 8
HW = (64, 96)
N = 240


@pytest.fixture(scope="module")
def setup():
    model = ViNet(num_hier=3, clip_size=T)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    # structured frames (moving bright square on noise) — content-ful
    frames = rng.integers(0, 60, (N, *HW, 3)).astype(np.uint8)
    for f in range(N):
        cy = 10 + (f * 2) % (HW[0] - 24)
        cx = 8 + (f * 3) % (HW[1] - 20)
        frames[f, cy:cy + 10, cx:cx + 8] = 230
    return model, params, state, frames


def test_live_matches_chunked(setup):
    model, params, state, frames = setup
    chunked = {i: m for i, m in StreamingPredictor(
        model, params, state, clip_size=T, batch=4, chunk=160,
        dtype=jnp.float32).predict_video(frames)}

    live = LiveStreamingPredictor(
        model, params, state, clip_size=T, batch=4, micro=16, span=N,
        dtype=jnp.float32, warmup_chunk=160)
    got = []
    for lo in range(0, N, 16):  # arbitrary feed granularity
        got.extend(live.feed(frames[lo:lo + 16]))
    got.extend(live.flush())

    # coverage: every frame exactly once, in emission order
    idxs = [i for i, _ in got]
    assert idxs == sorted(idxs)
    assert idxs == list(range(N))
    live_maps = dict(got)

    # warm-up: same flipped chunk pass -> near bit-exact
    for i in range(T - 1):
        np.testing.assert_allclose(live_maps[i], chunked[i], atol=1e-5)

    # steady interior: the overlap-save advance reproduces the chunked
    # timelines BIT-exactly (same conv primitives over the same positions;
    # measured p50 diff = 0.0). Exclusions, all of them CHUNKED-side or
    # stream-boundary semantics rather than live-side error:
    #   * stream start (< ~TEMPORAL_HALO + T): live zero-frame tails vs
    #     chunked per-layer zero padding
    #   * the chunked predictor's own chunk seam: frames emitted from a
    #     chunk's right edge see zero-padded future context there, while
    #     the live timelines are continuous (live is the MORE contiguous
    #     computation; measured diff confined to the last seam phase group)
    #   * flush tail (repeat-frame vs zero-layer padding, last ~halo)
    seam = 160  # chunked plan: first chunk [0,160) emits frames 7..159
    lo, hi = 66, N - 70
    interior = [i for i in range(lo, hi) if not (seam - 16 <= i < seam)]
    diffs = np.array([float(np.abs(live_maps[i] - chunked[i]).max())
                      for i in interior])
    assert diffs.max() < 1e-4, diffs.max()
    assert np.median(diffs) < 1e-6, np.median(diffs)  # bulk is bit-exact

    # boundary frames are approximations, but must stay sane maps
    for i in range(T - 1, N):
        m = live_maps[i]
        assert np.isfinite(m).all() and 0.0 <= m.min() and m.max() <= 1.0


def test_live_feed_granularity_invariance(setup):
    """Maps must not depend on how the caller batches feed() calls."""
    model, params, state, frames = setup
    n = 160

    def run(step):
        live = LiveStreamingPredictor(
            model, params, state, clip_size=T, batch=4, micro=16, span=168,
            dtype=jnp.float32, warmup_chunk=16)
        got = []
        for lo in range(0, n, step):
            got.extend(live.feed(frames[lo:lo + step]))
        got.extend(live.flush())
        return dict(got)

    a = run(16)
    b = run(40)
    assert sorted(a) == sorted(b) == list(range(n))
    for i in range(n):
        np.testing.assert_allclose(a[i], b[i], atol=1e-5)


def _make_audio_info(n_frames, fps, fs, seed=11):
    from vinet_tpu.data.audio import AudioInfo, frame_sample_ranges

    rng = np.random.default_rng(seed)
    n_samp = int((n_frames + 2) * fs / fps)
    wav = (rng.standard_normal((1, n_samp)) * 0.01).astype(np.float32)
    starts, ends = frame_sample_ranges(n_samp, n_frames, fs, fps)
    return AudioInfo(wav=wav, fs=fs, starts=starts, ends=ends)


def test_av_window_audio_matches_audio_excerpt():
    """The live rolling-buffer excerpt must equal the offline
    data/audio.py::audio_excerpt (same int truncation, Hanning, center-pad,
    flip) — it is the same function over a different storage layout."""
    from vinet_tpu.data.audio import audio_excerpt
    from vinet_tpu.inference.live import AVLiveStreamingPredictor
    from vinet_tpu.models import AViNet

    n, fps, fs = 120, 29.97, 22050
    info = _make_audio_info(n, fps, fs)
    model = AViNet(input_hw=(64, 96))
    params, state = model.init(jax.random.PRNGKey(0))
    live = AVLiveStreamingPredictor(model, params, state, fps=fps,
                                    audio_fs=fs, span=224)
    live._samples = info.wav[0].copy()
    live._samples_base = 0

    starts = [0, 1, 5, 37, n - 32]
    want = np.stack([audio_excerpt(info, 32, s) for s in starts])
    got = np.asarray(live._window_audio(starts, flipped=False))
    np.testing.assert_array_equal(got, want)
    gotf = np.asarray(live._window_audio(starts, flipped=True))
    np.testing.assert_array_equal(gotf, want[:, ::-1])
    # batch-padding sentinel rows are zeros
    pad = np.asarray(live._window_audio([3, -1], flipped=False))
    assert pad[1].max() == 0.0


def test_av_live_matches_chunked():
    """AV live (overlap-save visual timelines + rolling audio buffer) must
    reproduce AVStreamingPredictor's maps away from stream boundaries, with
    the SAME per-window audio excerpts (fed incrementally)."""
    from vinet_tpu.data.audio import audio_excerpt
    from vinet_tpu.inference.live import AVLiveStreamingPredictor
    from vinet_tpu.inference.streaming import AVStreamingPredictor
    from vinet_tpu.models import AViNet

    n, fps, fs = 200, 25.0, 22050
    t = 32
    info = _make_audio_info(n, fps, fs)
    rng = np.random.default_rng(13)
    frames = rng.integers(0, 60, (n, 64, 96, 3)).astype(np.uint8)
    for f in range(n):
        cy = 6 + (f * 2) % 40
        cx = 4 + (f * 3) % 70
        frames[f, cy:cy + 10, cx:cx + 8] = 230

    model = AViNet(input_hw=(64, 96))
    params, state = model.init(jax.random.PRNGKey(0))

    audio_fn = lambda s: audio_excerpt(info, t, s)
    chunked = {i: m for i, m in AVStreamingPredictor(
        model, params, state, clip_size=t, batch=4, chunk=160,
        dtype=jnp.float32).predict_video(frames, audio_fn=audio_fn)}

    live = AVLiveStreamingPredictor(
        model, params, state, fps=fps, audio_fs=fs, clip_size=t, batch=4,
        micro=16, span=168, dtype=jnp.float32, warmup_chunk=160)
    # feed audio in arbitrary-sized chunks alongside the frames
    spf = fs / fps
    got = []
    for lo in range(0, n, 16):
        a = info.wav[0, int(lo * spf): int((lo + 16) * spf)]
        got.extend(live.feed(frames[lo:lo + 16], audio=a))
    got.extend(live.feed(np.zeros((0, 64, 96, 3), np.uint8),
                         audio=info.wav[0, int(n * spf):]))
    got.extend(live.flush())

    idxs = [i for i, _ in got]
    assert idxs == sorted(idxs) and idxs == list(range(n))
    live_maps = dict(got)

    # warm-up: same flipped chunk pass + same flipped excerpts
    for i in range(t - 1):
        np.testing.assert_allclose(live_maps[i], chunked[i], atol=1e-5)

    # steady interior (exclusions as in test_live_matches_chunked: stream
    # start, the chunked predictor's own chunk seam, flush tail)
    seam = 160
    lo, hi = 96, n - 70
    interior = [i for i in range(lo, hi) if not (seam - 16 <= i < seam)]
    assert interior
    diffs = np.array([float(np.abs(live_maps[i] - chunked[i]).max())
                      for i in interior])
    assert diffs.max() < 1e-4, diffs.max()

    for i in range(t - 1, n):
        m = live_maps[i]
        assert np.isfinite(m).all() and 0.0 <= m.min() and m.max() <= 1.0


def test_live_short_stream_skipped(setup):
    model, params, state, frames = setup
    live = LiveStreamingPredictor(
        model, params, state, clip_size=T, batch=4, micro=16, span=168,
        dtype=jnp.float32, warmup_chunk=16)
    got = list(live.feed(frames[: 2 * T - 2]))
    got.extend(live.flush())
    assert got == []  # reference skips videos < 2T-1 frames
