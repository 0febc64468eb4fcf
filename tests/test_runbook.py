"""Offline dry-run of scripts/validate_released.sh (VERDICT r3 item 6).

The released-checkpoint validation runbook can't see real weights in this
zero-egress container; this test makes sure its first REAL run won't be its
first run ever: a reference-format .pt (produced by the torch exporter,
whose naming/layout parity vs the reference's state_dicts is pinned by
tests/test_export.py strict-load tests) plus a synthetic 2-video DHF1K val
dir are pushed through the script end-to-end — generate (parity + streaming)
and evaluate_dhf1k scoring — at clip-8 dry-run geometry (CLIP_SIZE/GEN_ARGS
knobs the script exposes for exactly this).
"""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_validate_released_runbook_dry_run(tmp_path):
    import jax

    from tests.fixtures import make_dhf1k
    from vinet_tpu.io.export import export_torch_checkpoint
    from vinet_tpu.models import ViNet

    # 1. a reference-format checkpoint (structurally what OneDrive ships)
    model = ViNet(num_hier=3, clip_size=8)
    params, state = model.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "ViNet_DHF1K.pt")
    export_torch_checkpoint(ckpt, model, params, state)

    # 2. a synthetic DHF1K-layout val dir (images/ + maps/ + fixation/),
    #    long enough for the 2T-1 sliding-window minimum at T=8
    val = str(tmp_path / "val")
    make_dhf1k(val, n_videos=2, n_frames=18, seed=3)

    out = str(tmp_path / "out")
    env = dict(
        os.environ,
        VINET_CKPT=ckpt,
        DHF1K_VAL=val,
        CLIP_SIZE="8",
        GEN_ARGS="--dtype float32 --window_batch 8",
        JAX_PLATFORMS="cpu",
    )
    r = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "validate_released.sh"), out],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]

    # every frame of every video got a parity map and a streaming map
    for sub in ("maps", "maps_streaming"):
        for vid in ("001", "002"):
            assert len(os.listdir(os.path.join(out, sub, vid))) == 18, (sub, vid)

    # the scorer produced all four requested metrics, parseable and finite
    for fname in ("scores_parity.txt", "scores_streaming.txt"):
        text = open(os.path.join(out, fname)).read()
        got = dict(re.findall(r"\b(cc|sim|nss|aucj)\b\s*[:=]\s*([-\d.nan]+)", text))
        assert set(got) == {"cc", "sim", "nss", "aucj"}, (fname, text[-800:])
        for k, v in got.items():
            assert v not in ("nan", "-nan"), (fname, k, text[-800:])
