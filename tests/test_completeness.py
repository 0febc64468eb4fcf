"""TASED_v2, conv_transpose3d, transformer decoder, DAVE/theatre CLIs,
DHF1K offline evaluator — the long tail of the reference's inventory."""

import json
import os
from os.path import join

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from vinet_tpu.ops.conv import conv_transpose3d


def _t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def test_conv_transpose3d_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 5, 6, 4).astype(np.float32)
    w = rng.randn(1, 4, 4, 4, 7).astype(np.float32)  # kT,kH,kW,I,O
    b = rng.randn(7).astype(np.float32)
    y = conv_transpose3d(jnp.asarray(x), jnp.asarray(w), stride=(1, 2, 2),
                         padding=(0, 1, 1), bias=jnp.asarray(b))
    xt = _t(x).permute(0, 4, 1, 2, 3)
    wt = _t(w).permute(3, 4, 0, 1, 2)  # torch ConvTranspose: (I, O, k...)
    yt = torch.nn.functional.conv_transpose3d(xt, wt, _t(b), stride=(1, 2, 2),
                                              padding=(0, 1, 1))
    yt = yt.permute(0, 2, 3, 4, 1).numpy()
    assert y.shape == yt.shape
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-4)


def test_tased_v2_shapes():
    from vinet_tpu.models.tased import TASEDv2

    model = TASEDv2()
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 32, 224, 384, 3), jnp.float32)
    out, _ = jax.eval_shape(lambda p, s, x: model.apply(p, s, x), params, state, x)
    assert out.shape == (1, 224, 384)


def test_tased_v2_forward_small():
    from vinet_tpu.models.tased import TASEDv2

    model = TASEDv2()
    params, state = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 64, 96, 3), jnp.float32)
    out, _ = jax.jit(lambda p, s, x: model.apply(p, s, x))(params, state, x)
    assert out.shape == (1, 64, 96)
    assert bool(jnp.all(out >= 0)) and bool(jnp.all(out <= 1))


def test_seq2seq_transformer_decoder_path():
    from vinet_tpu.models.transformer import Seq2SeqTransformer

    tr = Seq2SeqTransformer(feat_size=16, hidden_size=16, nhead=4,
                            num_encoder_layers=2, max_len=6,
                            num_decoder_layers=2, num_queries=4)
    params, _ = tr.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16), jnp.float32)
    out, _ = tr.apply(params, {}, x)
    assert out.shape == (2, 4, 16)  # num_queries tokens out
    one, _ = tr.apply(params, {}, x, query_idx=1)
    assert one.shape == (2, 1, 16)


def test_seq2seq_spatial_encoder_path():
    from vinet_tpu.models.transformer import Seq2SeqTransformer

    tr = Seq2SeqTransformer(feat_size=16, hidden_size=16, nhead=4,
                            num_encoder_layers=1, max_len=8, spatial_dim=8)
    params, _ = tr.init(jax.random.PRNGKey(0))
    assert "transformer_encoder_spatial" in params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16), jnp.float32)
    out, _ = tr.apply(params, {}, x)
    assert out.shape == (2, 8, 16)


def test_theatre_cli(tmp_path):
    """generate_theatre on a raw-footage layout with a 48 kHz wav (exercises
    resampling)."""
    from scipy.io import wavfile

    from tests.fixtures import make_dhf1k
    from vinet_tpu.cli.generate_theatre import main

    root = tmp_path / "theatre"
    make_dhf1k(root / "tmp", n_videos=1, n_frames=20)
    os.makedirs(root / "video_frames", exist_ok=True)
    os.rename(root / "tmp" / "001" / "images", root / "video_frames" / "clipA")
    os.makedirs(root / "video_audio", exist_ok=True)
    n = int(48000 * 2.0)
    wavfile.write(str(root / "video_audio" / "clipA.wav"), 48000,
                  (1000 * np.sin(np.linspace(0, 400, n))).astype(np.int16))
    with open(root / "fps.json", "w") as f:
        json.dump({"clipA": 10.0}, f)

    out = str(tmp_path / "out")
    rc = main(["--path_indata", str(root), "--save_path", out,
               "--clip_size", "8", "--dtype", "float32",
               "--use_sound", "False"])
    assert rc == 0
    assert len(os.listdir(join(out, "clipA"))) == 20


def test_evaluate_dhf1k_cli(tmp_path, capsys):
    from tests.fixtures import make_dhf1k
    from vinet_tpu.cli.evaluate_dhf1k import main
    from vinet_tpu.io.images import save_map

    gt_root = make_dhf1k(tmp_path / "gt", n_videos=1, n_frames=12)
    # synthetic "predictions" = blurred copies of the GT maps -> high scores
    from vinet_tpu.io.images import load_map

    pred = tmp_path / "pred" / "001"
    os.makedirs(pred)
    for f in sorted(os.listdir(join(gt_root, "001", "maps"))):
        m = load_map(join(gt_root, "001", "maps", f))
        save_map(m, join(pred, f))
    rc = main(["--pred_path", str(tmp_path / "pred"), "--gt_path", str(gt_root)])
    assert rc == 0
    out = capsys.readouterr().out
    cc = float([l for l in out.splitlines() if l.startswith("cc:")][-1].split()[-1])
    aucj = float([l for l in out.splitlines() if l.startswith("aucj:")][-1].split()[-1])
    assert cc > 0.95
    assert aucj > 0.9
    assert "sauc:" in out


def test_dave_cli_requires_json():
    from vinet_tpu.cli.generate_result_dave import main

    with pytest.raises(SystemExit):
        main(["--path_data", "/tmp/x", "--save_path", "/tmp/y"])
