"""Streaming (whole-video) encoder tests.

The exactness anchor: a parity-mode backbone run over a LONG window starting
at a multiple of 8 IS one phase timeline (same strided computation), so its
pyramid must equal the streaming timelines at the derived offsets — away
from the long window's own temporal edges. This pins the phase/offset
algebra in streaming.gather_windows exactly.

End-to-end, streaming maps differ from parity maps only through window-edge
padding (real neighbors vs zeros); the delta is bounded on a synthetic
video and the emission cover (every frame, reference order indices) checked.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vinet_tpu.inference.streaming import StreamingPredictor, gather_windows, streaming_pyramid
from vinet_tpu.models import ViNet

T = 8  # clip size (tiny geometry for CPU)
HW = (64, 96)


@pytest.fixture(scope="module")
def setup():
    model = ViNet(num_hier=3, clip_size=T)
    params, state = model.init(jax.random.PRNGKey(0))
    n = 48  # timeline length (multiple of 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, n, *HW, 3), jnp.float32)
    return model, params, state, x


def test_timeline_shapes(setup):
    model, params, state, x = setup
    n = x.shape[1]
    y0, y1, y2, y3 = streaming_pyramid(params["backbone"], state["backbone"], x)
    h, w = HW
    assert y3.shape == (2, n // 2, h // 4, w // 4, 192)
    assert y2.shape == (2, n // 2, h // 8, w // 8, 480)
    assert y1.shape == (4, n // 4, h // 16, w // 16, 832)
    assert y0.shape == (8, n // 8, h // 32, w // 32, 1024)


def test_gather_matches_long_parity_window(setup):
    """Backbone over the WHOLE timeline as one long parity window (start 0,
    stride-8-aligned) == streaming timelines gathered at s=0 phase offsets,
    extended to the full length. Exact math check of the phase algebra."""
    model, params, state, x = setup
    n = x.shape[1]
    long_pyr, _ = model.backbone.apply(params["backbone"], state["backbone"], x)
    ly0, ly1, ly2, ly3 = long_pyr  # (1, n/8, ...), (1, n/4, ...), (1, n/2, ...) x2

    tls = streaming_pyramid(params["backbone"], state["backbone"], x)
    y0t, y1t, y2t, y3t = tls

    # phase algebra for s=0: p1=q=r=0 -> timelines index 0 everywhere.
    # The long window and the timeline share EVERYTHING except the temporal
    # zero-padding of the long window's own edges; compare the interior.
    # Temporal receptive-field halo per level (in that level's frames):
    # generous margins below.
    def interior(a, b, margin):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        sl = slice(margin, a.shape[0] - margin)
        np.testing.assert_allclose(a[sl], b[sl], rtol=2e-4, atol=2e-4)

    interior(ly3[0], y3t[0], 4)
    interior(ly2[0], y2t[0], 6)
    interior(ly1[0], y1t[0], 8)
    interior(ly0[0], y0t[0], 3)


def test_gather_window_slices_are_contiguous(setup):
    """gather_windows at aligned starts returns exact timeline slices."""
    model, params, state, x = setup
    tls = streaming_pyramid(params["backbone"], state["backbone"], x)
    for s in [0, 8, 16, 5, 13]:
        pyr = gather_windows(tls, jnp.asarray([s]), T)
        p1, s1 = s % 2, s // 2
        p2, s2 = s1 % 2, s1 // 2
        p3, s3 = s2 % 2, s2 // 2
        np.testing.assert_array_equal(
            np.asarray(pyr[3][0]), np.asarray(tls[3][p1, s1 : s1 + T // 2]))
        np.testing.assert_array_equal(
            np.asarray(pyr[1][0]), np.asarray(tls[1][p2 * 2 + p1, s2 : s2 + T // 4]))
        np.testing.assert_array_equal(
            np.asarray(pyr[0][0]), np.asarray(tls[0][p3 * 4 + p2 * 2 + p1, s3 : s3 + T // 8]))


def test_predictor_covers_all_frames_and_matches_parity(setup):
    from vinet_tpu.inference import SlidingWindowPredictor

    model, params, state, _ = setup
    rng = np.random.default_rng(3)
    n_frames = 40
    frames = rng.integers(0, 255, (n_frames, *HW, 3), np.uint8)

    sp = StreamingPredictor(model, params, state, clip_size=T, batch=4,
                            chunk=32, dtype=jnp.float32)
    got = dict(sp.predict_video(frames))
    assert sorted(got) == list(range(n_frames))

    pp = SlidingWindowPredictor(model, params, state, clip_size=T, batch=4,
                                dtype=jnp.float32)
    ref = dict(pp.predict_video(frames))
    assert sorted(ref) == list(range(n_frames))

    # padding-semantics delta only: bounded, and tiny away from warmup.
    # Interior frames (normal windows, full real context) are pinned at
    # <= 1e-2; warmup frames (time-flipped clips whose reversed-chunk
    # context differs more) keep the loose bound.
    diffs = [np.abs(got[i] - ref[i]).max() for i in range(n_frames)]
    interior = max(diffs[T - 1:])
    assert interior < 1e-2, interior
    assert max(diffs) < 0.1, max(diffs)


def test_tsharded_pyramid_matches_unsharded(setup):
    """Temporal-axis sharding (SURVEY §5 long-context extension): the
    chunk's T axis sharded over 2 CPU-mesh devices with ppermute halo
    exchange == the unsharded streaming pyramid away from the GLOBAL chunk
    edges (where the two zero-padding formulations legitimately differ —
    see streaming_pyramid_tsharded's docstring); in particular the
    device-boundary region in the chunk middle is exact, pinning
    TEMPORAL_HALO as a sufficient receptive-radius bound."""
    from vinet_tpu.inference.streaming import (TEMPORAL_HALO,
                                               streaming_pyramid_tsharded)
    from vinet_tpu.parallel import create_mesh

    model, params, state, _ = setup
    assert len(jax.devices()) >= 2
    mesh = create_mesh(jax.devices()[:2])
    n = 128  # 64-frame segments >= the 56-frame halo
    x = jax.random.normal(jax.random.PRNGKey(7), (1, n, *HW, 3), jnp.float32)
    ref = streaming_pyramid(params["backbone"], state["backbone"], x)
    got = streaming_pyramid_tsharded(params["backbone"], state["backbone"],
                                     x, mesh)
    for r, g, f in zip(ref, got, (8, 4, 2, 2)):
        assert g.shape == r.shape
        edge = max(TEMPORAL_HALO // f // 8, 4)  # global-edge exclusion
        np.testing.assert_allclose(np.asarray(g)[:, edge:-edge],
                                   np.asarray(r)[:, edge:-edge],
                                   rtol=1e-4, atol=1e-4)
        # edges bounded (zero-frame vs per-layer padding difference)
        assert float(np.max(np.abs(np.asarray(g) - np.asarray(r)))) < 0.1


def test_tsharded_rejects_short_segments(setup):
    from vinet_tpu.inference.streaming import streaming_pyramid_tsharded
    from vinet_tpu.parallel import create_mesh

    model, params, state, _ = setup
    mesh = create_mesh(jax.devices()[:8])
    x = jnp.zeros((1, 64, *HW, 3), jnp.float32)  # 8-frame segments < halo
    with pytest.raises(AssertionError):
        streaming_pyramid_tsharded(params["backbone"], state["backbone"], x, mesh)


def test_predictor_short_video_skipped():
    model = ViNet(num_hier=3, clip_size=T)
    params, state = model.init(jax.random.PRNGKey(0))
    sp = StreamingPredictor(model, params, state, clip_size=T, batch=4,
                            chunk=32, dtype=jnp.float32)
    frames = np.zeros((2 * T - 2, *HW, 3), np.uint8)
    assert list(sp.predict_video(frames)) == []
    # pad_short emits every frame
    got = dict(sp.predict_video(frames, pad_short=True))
    assert sorted(got) == list(range(2 * T - 2))


def test_decode_v2_matches_v1():
    """Dense-decoder-front decode (decode_windows_v2) is an exact
    rearrangement of gather_windows + Decoder.apply for plan (3,32)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vinet_tpu.inference.streaming import (
        decode_windows_v2, dense_decoder_front, gather_windows)
    from vinet_tpu.models import ViNet

    model = ViNet(num_hier=3, clip_size=32)
    params, _ = model.init(jax.random.PRNGKey(0))
    dp = params["decoder"]
    chunk = 64
    tl = (
        jax.random.normal(jax.random.PRNGKey(2), (8, chunk // 8, 7, 12, 1024), jnp.float32),
        jax.random.normal(jax.random.PRNGKey(3), (4, chunk // 4, 14, 24, 832), jnp.float32),
        jax.random.normal(jax.random.PRNGKey(4), (2, chunk // 2, 28, 48, 480), jnp.float32),
        jax.random.normal(jax.random.PRNGKey(5), (2, chunk // 2, 56, 96, 192), jnp.float32),
    )
    starts = jnp.asarray([0, 1, 5, 17, 31, 32], jnp.int32)
    pyr = gather_windows(tl, starts, 32)
    ref, _ = model.decoder.apply(dp, {}, pyr)
    dense = dense_decoder_front(dp, tl)
    got = decode_windows_v2(model.decoder, dp, tl, dense, starts)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_av_decode_v2_matches_v1(monkeypatch):
    """AViNet streaming decode: per-window audio fusion feeding the dense
    decoder front equals gather_windows + fuse + Decoder.apply."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vinet_tpu.inference.streaming import (AVStreamingPredictor,
                                               dense_decoder_front)
    from vinet_tpu.models import AViNet

    model = AViNet(input_hw=(64, 96))
    params, state = model.init(jax.random.PRNGKey(0))
    pred = AVStreamingPredictor(model, params, state, clip_size=32, batch=4,
                                chunk=64, dtype=jnp.float32)
    chunk = 64
    tl = (
        jax.random.normal(jax.random.PRNGKey(2), (8, chunk // 8, 2, 3, 1024), jnp.float32),
        jax.random.normal(jax.random.PRNGKey(3), (4, chunk // 4, 4, 6, 832), jnp.float32),
        jax.random.normal(jax.random.PRNGKey(4), (2, chunk // 2, 8, 12, 480), jnp.float32),
        jax.random.normal(jax.random.PRNGKey(5), (2, chunk // 2, 16, 24, 192), jnp.float32),
    )
    starts = jnp.asarray([0, 3, 17, 32], jnp.int32)
    audio = 0.1 * jax.random.normal(jax.random.PRNGKey(6), (4, 70560, 1), jnp.float32)
    dense = dense_decoder_front(pred._dec_params(), tl, with_conv1=False)

    monkeypatch.setenv("VINET_STREAM_V2", "0")
    ref = pred._decode_fn()(tl, dense, starts, audio)
    pred._jitted.pop("decode")
    monkeypatch.setenv("VINET_STREAM_V2", "1")
    got = pred._decode_fn()(tl, dense, starts, audio)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
