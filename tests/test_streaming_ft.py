"""Streaming-consistent fine-tuning (training/streaming_ft.py).

The FT step differentiates the exact streaming-inference forward
(streaming_pyramid + gather_windows + decoder), so the semantic anchors live
in tests/test_streaming.py; here we pin the training mechanics: the loss
goes down on a learnable fixture, gradients reach both backbone and decoder,
BN statistics stay frozen, and the CLI path runs end-to-end.
"""

import os
from os.path import join

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vinet_tpu.models import ViNet
from vinet_tpu.training import LossConfig
from vinet_tpu.training.streaming_ft import (
    eval_window_starts,
    make_streaming_ft_step,
    make_streaming_eval_step,
    sample_window_starts,
)
from vinet_tpu.training.trainer import adam, init_train_state

T = 8
HW = (64, 96)
CHUNK = 24
K = 4


def _chunk_fixture(seed=0):
    """Moving bright blob on noise; GT = the blob's gaussian per frame."""
    rng = np.random.default_rng(seed)
    h, w = HW
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    frames = np.empty((1, CHUNK, h, w, 3), np.float32)
    gts = np.empty((CHUNK, h, w), np.float32)
    cy, cx = h / 2, w / 4
    for f in range(CHUNK):
        cy = float(np.clip(cy + rng.integers(-2, 3), 8, h - 8))
        cx = float(np.clip(cx + 1.0, 8, w - 8))
        g = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 4.0**2))
        img = rng.normal(0.0, 0.15, (h, w, 3)) + 1.5 * g[..., None]
        frames[0, f] = img.astype(np.float32)
        gts[f] = g.astype(np.float32)
    return jnp.asarray(frames), gts


def test_window_start_samplers():
    rng = np.random.default_rng(0)
    s = sample_window_starts(rng, 6, CHUNK, T)
    assert s.shape == (6,) and s.dtype == np.int32
    assert s.min() == 0 and s.max() == CHUNK - T  # edges pinned
    assert (np.sort(s) == s).all()
    e = eval_window_starts(5, CHUNK, T)
    assert e[0] == 0 and e[-1] == CHUNK - T
    assert len(np.unique(e)) == len(e)


def test_ft_step_trains_and_freezes_bn():
    model = ViNet(num_hier=3, clip_size=T)
    optimizer = adam(2e-4)
    ts = init_train_state(model, jax.random.PRNGKey(0), optimizer)
    step = make_streaming_ft_step(model, LossConfig(), optimizer,
                                  clip_size=T, donate=False)
    chunk, gts = _chunk_fixture()
    rng = np.random.default_rng(1)
    state0 = jax.device_get(ts["state"])
    p0 = jax.device_get(ts["params"])
    losses = []
    for i in range(8):
        starts = sample_window_starts(rng, K, CHUNK, T)
        batch = {"chunk": chunk,
                 "gt": jnp.asarray(gts[starts + T - 1]),
                 "starts": jnp.asarray(starts)}
        ts, m = step(ts, batch)
        assert np.isfinite(float(m["loss"])), i
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    # gradients reached both subtrees
    p1 = jax.device_get(ts["params"])
    assert np.abs(p1["backbone"]["base1"]["0"]["conv_s"]["w"]
                  - p0["backbone"]["base1"]["0"]["conv_s"]["w"]).max() > 0
    assert np.abs(p1["decoder"]["conv1"]["w"]
                  - p0["decoder"]["conv1"]["w"]).max() > 0
    # BN statistics frozen (fine-tune contract)
    s1 = jax.device_get(ts["state"])
    jax.tree_util.tree_map(np.testing.assert_array_equal, state0, s1)
    assert int(ts["step"]) == 8


def test_ft_eval_step_metrics():
    model = ViNet(num_hier=3, clip_size=T)
    optimizer = adam(1e-4)
    ts = init_train_state(model, jax.random.PRNGKey(0), optimizer)
    chunk, gts = _chunk_fixture(seed=3)
    starts = eval_window_starts(K, CHUNK, T)
    batch = {"chunk": chunk, "gt": jnp.asarray(gts[starts + T - 1]),
             "starts": jnp.asarray(starts)}
    m = make_streaming_eval_step(model, LossConfig(), clip_size=T)(ts, batch)
    for k in ("loss", "cc", "sim"):
        assert np.isfinite(float(m[k])), k


def test_ft_bf16_step_matches_f32():
    model = ViNet(num_hier=3, clip_size=T)
    optimizer = adam(1e-4)
    ts = init_train_state(model, jax.random.PRNGKey(0), optimizer)
    chunk, gts = _chunk_fixture(seed=5)
    starts = sample_window_starts(np.random.default_rng(2), K, CHUNK, T)
    batch = {"chunk": chunk, "gt": jnp.asarray(gts[starts + T - 1]),
             "starts": jnp.asarray(starts)}
    _, m32 = make_streaming_ft_step(model, LossConfig(), optimizer,
                                    clip_size=T, donate=False)(ts, batch)
    _, m16 = make_streaming_ft_step(model, LossConfig(), optimizer,
                                    clip_size=T, donate=False,
                                    compute_dtype=jnp.bfloat16)(ts, batch)
    assert abs(float(m16["loss"]) - float(m32["loss"])) \
        <= 0.05 * abs(float(m32["loss"])) + 1e-3


def test_streaming_ft_cli(tmp_path):
    from tests.fixtures import make_dhf1k
    from vinet_tpu.cli.train import main

    root = str(tmp_path)
    make_dhf1k(join(root, "train"), n_videos=1, n_frames=20)
    out = join(root, "ft_best.npz")
    rc = main([
        "--train_path_data", join(root, "train"),
        "--no_epochs", "1", "--clip_size", "8", "--no_workers", "1",
        "--log_interval", "1", "--max_steps_per_epoch", "1",
        "--streaming_ft", "--ft_chunk", "16", "--ft_windows", "2",
        "--model_val_path", out,
    ])
    assert rc == 0
    assert os.path.exists(out)
