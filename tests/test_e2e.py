"""End-to-end: train CLI + generate CLI on the synthetic mini-dataset
(SURVEY.md §4(e)) and window-plan parity with the reference's sliding loop."""

import os
from os.path import join

import numpy as np
import pytest

from tests.fixtures import make_dhf1k
from vinet_tpu.inference import window_plan


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    make_dhf1k(join(root, "train"), n_videos=2, n_frames=20)
    make_dhf1k(join(root, "val"), n_videos=1, n_frames=40)
    return str(root)


def test_window_plan_matches_reference_loop():
    """Re-derive the reference's emission schedule (generate_result.py:58-73)
    and compare: every frame 0..n-1 predicted exactly once; warmup frames from
    flipped windows."""
    n, t = 70, 32
    plan = window_plan(n, t)
    emitted = {}
    for task in plan:
        assert task.out_frame not in emitted
        emitted[task.out_frame] = task
    assert set(emitted) == set(range(n))
    for j in range(t - 1):  # warmup frames
        assert emitted[j].flipped and emitted[j].start == j
    for j in range(t - 1, n):
        assert not emitted[j].flipped and emitted[j].start == j - t + 1


def test_window_plan_short_video():
    assert window_plan(40, 32) == []  # < 2T-1: reference skips (:55)
    assert len(window_plan(63, 32)) == 63


def test_train_cli_one_epoch(data_root, tmp_path):
    from vinet_tpu.cli.train import main

    out = str(tmp_path / "best.npz")
    ckpt = str(tmp_path / "ckpt")
    rc = main([
        "--train_path_data", join(data_root, "train"),
        "--val_path_data", join(data_root, "val"),
        "--no_epochs", "1", "--batch_size", "2", "--clip_size", "8",
        "--no_workers", "2", "--log_interval", "1",
        "--model_val_path", out, "--checkpoint_dir", ckpt,
    ])
    assert rc == 0
    assert os.path.exists(out)
    data = np.load(out)
    assert any(k.startswith("params/backbone") for k in data.files)
    from vinet_tpu.io.checkpoint import latest_step

    assert latest_step(ckpt) is not None


def test_generate_cli(data_root, tmp_path):
    from vinet_tpu.cli.generate_result import main

    save = str(tmp_path / "maps")
    rc = main([
        "--path_indata", join(data_root, "val"),
        "--save_path", save,
        "--clip_size", "8", "--window_batch", "8", "--dtype", "float32",
    ])
    assert rc == 0
    written = sorted(os.listdir(join(save, "001")))
    assert len(written) == 40  # every frame got a map
    from PIL import Image

    m = np.asarray(Image.open(join(save, "001", written[0])))
    assert m.shape == (64, 96)  # native video size
    assert m.max() == 255  # normalized maps span full range


def test_generate_cli_streaming(data_root, tmp_path):
    """--streaming drives the whole-video encoder path end-to-end; every
    frame still gets a native-size normalized map."""
    from vinet_tpu.cli.generate_result import main

    save = str(tmp_path / "maps_streaming")
    rc = main([
        "--path_indata", join(data_root, "val"),
        "--save_path", save,
        "--clip_size", "8", "--window_batch", "8", "--dtype", "float32",
        "--streaming", "--chunk", "24",
    ])
    assert rc == 0
    written = sorted(os.listdir(join(save, "001")))
    assert len(written) == 40
    from PIL import Image

    m = np.asarray(Image.open(join(save, "001", written[0])))
    assert m.shape == (64, 96)
    assert m.max() == 255


def test_generate_cli_live(data_root, tmp_path):
    """--live drives the incremental feed/flush server end-to-end over a
    stored video; every frame still gets a native-size normalized map."""
    from vinet_tpu.cli.generate_result import main

    save = str(tmp_path / "maps_live")
    rc = main([
        "--path_indata", join(data_root, "val"),
        "--save_path", save,
        "--clip_size", "8", "--dtype", "float32",
        "--live", "--live_micro", "16",
    ])
    assert rc == 0
    written = sorted(os.listdir(join(save, "001")))
    assert len(written) == 40
    from PIL import Image

    m = np.asarray(Image.open(join(save, "001", written[0])))
    assert m.shape == (64, 96)
    assert m.max() == 255


def test_generate_cli_process_sharding(data_root, tmp_path):
    from vinet_tpu.cli.generate_result import main

    save = str(tmp_path / "maps_shard")
    rc = main([
        "--path_indata", join(data_root, "train"),
        "--save_path", save,
        "--clip_size", "8", "--dtype", "float32", "--pad_short",
        "--start_idx", "1", "--num_parts", "2",
    ])
    assert rc == 0
    assert os.path.isdir(join(save, "001"))
    assert not os.path.isdir(join(save, "002"))  # second shard's video untouched


def test_serve_cli_matches_live(tmp_path):
    """cli/serve.py serves two unequal-length videos as lockstep streams;
    per-video maps must match the single-stream --live CLI (same window
    semantics, quantized u8 within one rounding tie)."""
    from PIL import Image

    from vinet_tpu.cli.generate_result import main as live_main
    from vinet_tpu.cli.serve import main as serve_main

    root = str(tmp_path / "data")
    make_dhf1k(root, n_videos=2, n_frames=40)
    # unequal lengths: truncate video 002 to 32 frames (pad/drop path)
    for f in range(33, 41):
        os.remove(join(root, "002", "images", "%04d.png" % f))

    live_save = str(tmp_path / "maps_live")
    rc = live_main([
        "--path_indata", root, "--save_path", live_save,
        "--clip_size", "8", "--dtype", "float32",
        "--live", "--live_micro", "16",
    ])
    assert rc == 0

    serve_save = str(tmp_path / "maps_serve")
    rc = serve_main([
        "--path_indata", root, "--save_path", serve_save,
        "--clip_size", "8", "--dtype", "float32",
        "--streams", "2", "--live_micro", "16",
    ])
    assert rc == 0

    for vid, n in (("001", 40), ("002", 32)):
        got = sorted(os.listdir(join(serve_save, vid)))
        assert len(got) == n, (vid, len(got))
        for name in got:
            a = np.asarray(Image.open(join(serve_save, vid, name)), np.int16)
            b = np.asarray(Image.open(join(live_save, vid, name)), np.int16)
            assert a.shape == (64, 96)
            assert np.abs(a - b).max() <= 1, (vid, name)
