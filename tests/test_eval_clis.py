"""AV inference CLI, fused diem_val, and offline eval_diem on the synthetic
STAViS fixture."""

import os
from os.path import join

import numpy as np
import pytest

from tests.fixtures import make_sound_dataset


# AViNet's bilinear fusion requires clip_size=32 (pooled-y0 geometry,
# reference model.py:229-236); the test shrinks the SPATIAL size instead
# (--input_h/--input_w), which scales the fusion dims the same way the
# reference's hard-coded 224x384 numbers arise.
N_FRAMES = 64


@pytest.fixture(scope="module")
def stavis_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("stavis_e2e")
    r, names = make_sound_dataset(root, n_videos=1, n_frames=N_FRAMES, fps=10.0)
    return str(r)


AV_ARGS = ["--clip_size", "32", "--input_h", "64", "--input_w", "96",
           "--window_batch", "8", "--dtype", "float32"]


@pytest.fixture(scope="module")
def pred_dir(stavis_root, tmp_path_factory):
    from vinet_tpu.cli.generate_result_audio_visual import main

    out = str(tmp_path_factory.mktemp("avpred"))
    rc = main([
        "--path_data", stavis_root, "--save_path", out,
        "--dataset", "DIEM", "--mode", "test",
        "--use_sound", "True", *AV_ARGS,
    ])
    assert rc == 0
    return out


def test_av_generate_writes_all_frames(pred_dir):
    files = sorted(os.listdir(join(pred_dir, "vid00")))
    assert len(files) == N_FRAMES
    assert files[0] == "img_00001.jpg"


def test_eval_diem_cli(pred_dir, stavis_root, capsys):
    from vinet_tpu.cli.eval_diem import main

    rc = main([
        "--pred_path", pred_dir,
        "--annot_path", join(stavis_root, "annotations", "DIEM"),
        "--annot_file", join(stavis_root, "fold_lists", "DIEM_list_test_fps.txt"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "cc:" in out and "sauc:" in out and "aucj:" in out
    # parse overall cc: untrained net on structured GT -> finite value in [-1,1]
    cc = float([l for l in out.splitlines() if l.startswith("cc:")][-1].split()[-1])
    assert -1.0 <= cc <= 1.0


def test_eval_diem_emd_without_fixmaps(tmp_path, capsys):
    """EMD.m scores against the EYE map (EMD.m:28,33): frames lacking a
    fixMap_%05d.mat must still get an EMD score (regression: the CLI used to
    gate EMD on fixMap presence)."""
    from tests.fixtures import make_sound_dataset
    from vinet_tpu.cli.eval_diem import main
    from vinet_tpu.io.images import load_map, save_map

    root, (name,) = make_sound_dataset(tmp_path / "data", n_videos=1, n_frames=6)
    annot = join(str(root), "annotations", "DIEM", name)
    for f in os.listdir(annot):  # drop every fixMap -> only eyeMaps remain
        if f.startswith("fixMap"):
            os.remove(join(annot, f))
    pred = tmp_path / "pred" / name
    os.makedirs(pred)
    for f in sorted(os.listdir(join(annot, "maps"))):
        save_map(load_map(join(annot, "maps", f)), join(pred, "img_" + f.split("_")[-1]))
    rc = main([
        "--pred_path", str(tmp_path / "pred"),
        "--annot_path", join(str(root), "annotations", "DIEM"),
        "--annot_file", join(str(root), "fold_lists", "DIEM_list_test_fps.txt"),
        "--emd",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    emd = float([l for l in out.splitlines() if l.startswith("emd:")][-1].split()[-1])
    assert np.isfinite(emd) and emd < 0.5  # pred == GT -> near-zero EMD
    assert "nss:" not in out  # fixation metrics correctly absent


def test_evaluate_dhf1k_kldiv_ig_metrics(tmp_path, capsys):
    """kldiv/ig exposed through --metrics (implemented in metrics/saliency.py
    but previously missing from the CLI surface)."""
    from tests.fixtures import make_dhf1k
    from vinet_tpu.cli.evaluate_dhf1k import main
    from vinet_tpu.io.images import load_map, save_map

    gt_root = make_dhf1k(tmp_path / "gt", n_videos=1, n_frames=8)
    pred = tmp_path / "pred" / "001"
    os.makedirs(pred)
    for f in sorted(os.listdir(join(gt_root, "001", "maps"))):
        save_map(load_map(join(gt_root, "001", "maps", f)), join(pred, f))
    rc = main(["--pred_path", str(tmp_path / "pred"), "--gt_path", str(gt_root),
               "--metrics", "cc,kldiv,ig"])
    assert rc == 0
    out = capsys.readouterr().out
    kl = float([l for l in out.splitlines() if l.startswith("kldiv:")][-1].split()[-1])
    assert np.isfinite(kl) and kl < 0.5  # pred == GT -> tiny KL
    assert any(l.startswith("ig:") for l in out.splitlines())


def test_diem_val_cli(stavis_root, capsys):
    from vinet_tpu.cli.diem_val import main

    rc = main([
        "--path_data", stavis_root, "--dataset", "DIEM", "--mode", "test",
        "--use_sound", "False", *AV_ARGS,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "per-frame averages" in out
    assert "aucj:" in out
