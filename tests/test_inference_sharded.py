"""Mesh-sharded batch inference == single-device inference.

The reference's only inference parallelism is launching N processes over a
sharded video list (/root/reference/generate_result.py:44-46,113-114). The
TPU-native counterpart shards each window batch over the mesh "data" axis
(engine.py / streaming.py `mesh=`); these tests pin map equality on the
virtual 8-device CPU mesh at f32 tolerance (GSPMD partitioning changes
instruction scheduling, not math — same tolerance as test_training.py's
sharded-vs-single train step)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vinet_tpu.inference import SlidingWindowPredictor
from vinet_tpu.inference.streaming import AVStreamingPredictor, StreamingPredictor
from vinet_tpu.models import AViNet, ViNet
from vinet_tpu.parallel import create_mesh


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return create_mesh(jax.devices()[:8])


def _frames(n=24, hw=(64, 96), seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, (n, *hw, 3), dtype=np.uint8)


def _collect(pred, frames, **kw):
    return {i: m for i, m in pred.predict_video(frames, **kw)}


def test_sliding_window_sharded_8dev(mesh8):
    model = ViNet(num_hier=3, clip_size=8)
    params, state = model.init(jax.random.PRNGKey(0))
    frames = _frames()
    kw = dict(clip_size=8, batch=8, dtype=jnp.float32)
    ref = _collect(SlidingWindowPredictor(model, params, state, **kw), frames)
    shd = _collect(SlidingWindowPredictor(model, params, state, mesh=mesh8, **kw),
                   frames)
    assert set(ref) == set(shd) and len(ref) == len(frames)
    for i in ref:
        np.testing.assert_allclose(ref[i], shd[i], rtol=1e-4, atol=2e-5)


def test_streaming_sharded_8dev(mesh8):
    model = ViNet(num_hier=3, clip_size=8)
    params, state = model.init(jax.random.PRNGKey(0))
    frames = _frames()
    kw = dict(clip_size=8, batch=8, chunk=16, dtype=jnp.float32)
    ref = _collect(StreamingPredictor(model, params, state, **kw), frames)
    shd = _collect(StreamingPredictor(model, params, state, mesh=mesh8, **kw),
                   frames)
    assert set(ref) == set(shd) and len(ref) == len(frames)
    for i in ref:
        np.testing.assert_allclose(ref[i], shd[i], rtol=1e-4, atol=2e-5)


def test_av_streaming_sharded_8dev(mesh8):
    model = AViNet(input_hw=(64, 96))
    params, state = model.init(jax.random.PRNGKey(0))
    frames = _frames(n=64, seed=1)
    rng = np.random.RandomState(2)
    exc = rng.randn(64, 70560, 1).astype(np.float32) * 0.1

    def audio_fn(start):
        return exc[start]

    kw = dict(clip_size=32, batch=8, chunk=64, dtype=jnp.float32)
    ref = _collect(AVStreamingPredictor(model, params, state, **kw), frames,
                   audio_fn=audio_fn)
    shd = _collect(AVStreamingPredictor(model, params, state, mesh=mesh8, **kw),
                   frames, audio_fn=audio_fn)
    assert set(ref) == set(shd) and len(ref) == len(frames)
    for i in ref:
        np.testing.assert_allclose(ref[i], shd[i], rtol=1e-4, atol=2e-5)
