"""Multi-stream live serving (inference/serving.py).

Exactness anchor: MultiLiveServer's per-stream maps must equal what a
dedicated single-stream LiveStreamingPredictor emits for the same frames —
vmap is per-example semantics, so the streams cannot interact. Same for the
AV variant (per-stream rolling audio buffers).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vinet_tpu.inference.live import (AVLiveStreamingPredictor,
                                      LiveStreamingPredictor)
from vinet_tpu.inference.serving import AVMultiLiveServer, MultiLiveServer
from vinet_tpu.models import ViNet

T = 8
HW = (64, 96)
N = 160


def _stream_frames(seed, n=N):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 60, (n, *HW, 3)).astype(np.uint8)
    for f in range(n):
        cy = 6 + (f * (2 + seed % 3)) % (HW[0] - 24)
        cx = 4 + (f * 3) % (HW[1] - 20)
        frames[f, cy:cy + 10, cx:cx + 8] = 230
    return frames


@pytest.fixture(scope="module")
def setup():
    model = ViNet(num_hier=3, clip_size=T)
    params, state = model.init(jax.random.PRNGKey(0))
    return model, params, state


def _run_single(model, params, state, frames, **kw):
    live = LiveStreamingPredictor(model, params, state, clip_size=T, batch=4,
                                  micro=16, span=168, dtype=jnp.float32,
                                  warmup_chunk=16, **kw)
    got = []
    for lo in range(0, frames.shape[0], 16):
        got.extend(live.feed(frames[lo:lo + 16]))
    got.extend(live.flush())
    return dict(got)


@pytest.fixture(scope="module")
def singles_v(setup):
    """Per-stream reference maps from dedicated single-stream servers."""
    model, params, state = setup
    streams = [_stream_frames(3), _stream_frames(11)]
    return streams, [_run_single(model, params, state, f) for f in streams]


def _run_multi(server, streams):
    stacked = np.stack(streams)  # (S, N, H, W, 3)
    got = []
    for lo in range(0, N, 16):
        got.extend(server.feed(stacked[:, lo:lo + 16]))
    got.extend(server.flush())
    return got


def _check_vs_singles(got, singles):
    # coverage: every (stream, frame) exactly once, frames in order
    per_stream = {0: [], 1: []}
    for s, i, m in got:
        per_stream[s].append((i, m))
    for s in (0, 1):
        idxs = [i for i, _ in per_stream[s]]
        assert idxs == list(range(N)), (s, idxs[:5], len(idxs))

    # exactness vs the dedicated single-stream servers (same feed cadence)
    for s in (0, 1):
        for i, m in per_stream[s]:
            np.testing.assert_allclose(m, singles[s][i], atol=1e-5,
                                       err_msg=f"stream {s} frame {i}")


def test_multilive_matches_single_streams(setup, singles_v):
    model, params, state = setup
    streams, singles = singles_v
    server = MultiLiveServer(model, params, state, streams=2, clip_size=T,
                             batch=4, micro=16, span=168, dtype=jnp.float32,
                             warmup_chunk=16)
    _check_vs_singles(_run_multi(server, streams), singles)


def test_multilive_stream_sharded_matches(setup, singles_v):
    """stream_mesh shards the stream axis over "data": per-stream maps must
    still equal the dedicated single-stream servers (zero-communication
    partitioning of the vmapped programs)."""
    from vinet_tpu.parallel import create_mesh

    model, params, state = setup
    streams, singles = singles_v
    mesh = create_mesh(jax.devices()[:2])
    server = MultiLiveServer(model, params, state, streams=2,
                             stream_mesh=mesh, clip_size=T, batch=4,
                             micro=16, span=168, dtype=jnp.float32,
                             warmup_chunk=16)
    _check_vs_singles(_run_multi(server, streams), singles)


def test_multilive_av_matches_single(setup):
    """AV multi-stream: per-stream audio buffers + vmapped fused decode must
    reproduce the single-stream AV live server."""
    from vinet_tpu.models import AViNet

    n, fps, fs = 120, 25.0, 22050
    t = 32
    rngs = [np.random.default_rng(5), np.random.default_rng(9)]
    streams = [_stream_frames(s, n) for s in (5, 9)]
    wavs = [(r.standard_normal(int((n + 2) * fs / fps)) * 0.01
             ).astype(np.float32) for r in rngs]

    model = AViNet(input_hw=HW)
    params, state = model.init(jax.random.PRNGKey(1))

    def run_single(frames, wav):
        live = AVLiveStreamingPredictor(
            model, params, state, fps=fps, audio_fs=fs, clip_size=t, batch=4,
            micro=16, span=168, dtype=jnp.float32, warmup_chunk=64)
        spf = fs / fps
        got = []
        for lo in range(0, n, 16):
            a = wav[int(lo * spf): int((lo + 16) * spf)]
            got.extend(live.feed(frames[lo:lo + 16], audio=a))
        got.extend(live.feed(np.zeros((0, *HW, 3), np.uint8),
                             audio=wav[int(n * spf):]))
        got.extend(live.flush())
        return dict(got)

    singles = [run_single(f, w) for f, w in zip(streams, wavs)]

    server = AVMultiLiveServer(model, params, state, streams=2, fps=fps,
                               audio_fs=fs, clip_size=t, batch=4, micro=16,
                               span=168, dtype=jnp.float32, warmup_chunk=64)
    stacked = np.stack(streams)
    spf = fs / fps
    got = []
    for lo in range(0, n, 16):
        a = [w[int(lo * spf): int((lo + 16) * spf)] for w in wavs]
        got.extend(server.feed(stacked[:, lo:lo + 16], audio=a))
    got.extend(server.feed(np.zeros((2, 0, *HW, 3), np.uint8),
                           audio=[w[int(n * spf):] for w in wavs]))
    got.extend(server.flush())

    per_stream = {0: {}, 1: {}}
    for s, i, m in got:
        per_stream[s][i] = m
    for s in (0, 1):
        assert sorted(per_stream[s]) == list(range(n)), s
        for i in range(n):
            np.testing.assert_allclose(per_stream[s][i], singles[s][i],
                                       atol=1e-5,
                                       err_msg=f"stream {s} frame {i}")
