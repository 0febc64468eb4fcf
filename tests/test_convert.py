"""Checkpoint conversion: torch state_dicts -> pytrees, with full-model
activation parity (SURVEY.md §7 step 3's golden-activation harness).

Marked slow: every test runs REAL full-geometry (32x224x384) forwards
through both the torch twin and the JAX model on the CPU backend
(~170 s total on the 1-core host) — run via the slow lane
(see tests/README.md)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

from tests.torch_ref import TViNet, kinetics_style_state_dict
from vinet_tpu.io.convert import (
    convert_torch_checkpoint,
    load_npz_tree,
    s3d_kinetics_remap,
    save_npz_tree,
    torch_state_dict_to_trees,
)
from vinet_tpu.models import ViNet


@pytest.fixture(scope="module")
def torch_vinet():
    torch.manual_seed(0)
    m = TViNet()
    # randomize BN stats so conversion of running stats is load-bearing
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm3d):
            mod.running_mean.data.normal_(0, 0.05)
            mod.running_var.data.uniform_(0.8, 1.2)
    m.eval()
    return m


@pytest.fixture(scope="module")
def converted(torch_vinet, tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "vinet.pt"
    torch.save(torch_vinet.state_dict(), str(path))
    model = ViNet(num_hier=3, clip_size=32)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = convert_torch_checkpoint(str(path), model, params, state)
    return model, params, state


def test_convert_covers_all_leaves(converted):
    model, params, state = converted
    # every converted leaf must be finite and f32
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32
        assert bool(jnp.isfinite(leaf).all())


def test_full_model_parity_after_conversion(torch_vinet, converted):
    """The flagship parity gate: converted weights reproduce the torch model's
    saliency maps."""
    model, params, state = converted
    rng = np.random.RandomState(0)
    x = rng.randn(1, 32, 96, 128, 3).astype(np.float32)  # H,W multiple of 32

    with torch.no_grad():
        ref = torch_vinet(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).numpy()

    out, _ = model.apply(params, state, jnp.asarray(x))
    out = np.asarray(out)
    assert out.shape == ref.shape
    err = np.abs(out - ref).max()
    assert err < 2e-3, err
    # and the maps must not be degenerate constants for random weights+input
    assert ref.std() > 0


def test_kinetics_backbone_name_surgery(torch_vinet):
    """'base.N.*' flat naming (S3D_kinetics400.pt) lands on the same tree as
    the structured naming (reference surgery train.py:146-160)."""
    structured = {f"backbone.{k}": v for k, v in torch_vinet.backbone.state_dict().items()}
    flat = kinetics_style_state_dict(torch_vinet.backbone)
    remapped = s3d_kinetics_remap(flat)

    p1, s1 = torch_state_dict_to_trees({k.replace("backbone.", ""): v for k, v in structured.items()})
    p2, s2 = torch_state_dict_to_trees(remapped)
    for (path1, a), (path2, b) in zip(
        jax.tree_util.tree_flatten_with_path(p1)[0],
        jax.tree_util.tree_flatten_with_path(p2)[0],
    ):
        assert path1 == path2
        np.testing.assert_array_equal(a, b)
    assert jax.tree_util.tree_structure(s1) == jax.tree_util.tree_structure(s2)


def test_kinetics_checkpoint_into_model(torch_vinet, tmp_path):
    path = tmp_path / "S3D_kinetics400.pt"
    torch.save(kinetics_style_state_dict(torch_vinet.backbone), str(path))
    model = ViNet(num_hier=3, clip_size=32)
    params, state = model.init(jax.random.PRNGKey(0))
    params2, state2 = convert_torch_checkpoint(str(path), model, params, state)
    got = np.asarray(params2["backbone"]["base1"]["0"]["conv_s"]["w"])
    ref = torch_vinet.backbone.base1[0].conv_s.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
    np.testing.assert_array_equal(got, ref)
    # decoder untouched (still the random init)
    np.testing.assert_array_equal(
        np.asarray(params2["decoder"]["conv1"]["w"]), np.asarray(params["decoder"]["conv1"]["w"])
    )


def test_npz_roundtrip(converted, tmp_path):
    model, params, state = converted
    p = str(tmp_path / "w.npz")
    save_npz_tree(p, params, state)
    p2, s2 = load_npz_tree(p, params, state)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_roundtrip_bf16(converted, tmp_path):
    """bf16 leaves survive npz: numpy stores them as 2-byte void (no native
    bf16), load_npz_tree views them back (the committed streaming-FT
    artifact's format, artifacts/streamft_fixture.npz)."""
    import jax.numpy as jnp

    model, params, state = converted
    from vinet_tpu.models.inference import cast_floating

    pb = cast_floating(params, jnp.bfloat16)
    p = str(tmp_path / "wbf16.npz")
    save_npz_tree(p, pb, state)
    p2, _ = load_npz_tree(p, params, state)
    for a, b in zip(jax.tree_util.tree_leaves(pb), jax.tree_util.tree_leaves(p2)):
        if np.asarray(a).dtype == np.float32:
            continue
        assert np.asarray(b).dtype == np.asarray(a).dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_avinet_full_conversion_parity(tmp_path):
    """AViNet end-to-end: torch state_dict (visual_model/audionet/bilinear
    naming) -> converter -> identical saliency maps. Requires the full
    224x384x32 geometry (the bilinear fusion is shape-locked, model.py:229)."""
    from tests.torch_ref import TAViNet
    from vinet_tpu.models import AViNet

    torch.manual_seed(1)
    tm = TAViNet()
    for mod in tm.modules():
        if isinstance(mod, (torch.nn.BatchNorm3d, torch.nn.BatchNorm2d)):
            mod.running_mean.data.normal_(0, 0.05)
            mod.running_var.data.uniform_(0.8, 1.2)
    tm.eval()
    path = str(tmp_path / "avinet.pt")
    torch.save(tm.state_dict(), path)

    model = AViNet()
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = convert_torch_checkpoint(path, model, params, state)

    rng = np.random.RandomState(1)
    x = rng.randn(1, 32, 224, 384, 3).astype(np.float32)
    audio = rng.randn(1, 70560, 1).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 4, 1, 2, 3),
                 torch.from_numpy(audio).permute(0, 2, 1).unsqueeze(3)).numpy()
    out, _ = model.apply(params, state, jnp.asarray(x), jnp.asarray(audio))
    out = np.asarray(out)
    assert out.shape == ref.shape
    err = np.abs(out - ref).max()
    assert err < 5e-3, err


def test_avinet_refine_full_conversion_parity(tmp_path):
    """AViNet use_transformer=True (self-attention refinement over the fused
    map, reference model.py:211-221,239-247): torch twin -> converter ->
    matching maps. Covers the conv_in_1x1/conv_out_1x1 projections and the
    channel-as-sequence transformer (feat 336, max_len=C)."""
    from tests.torch_ref import TAViNetRefine
    from vinet_tpu.models import AViNet

    torch.manual_seed(3)
    tm = TAViNetRefine()
    for mod in tm.modules():
        if isinstance(mod, (torch.nn.BatchNorm3d, torch.nn.BatchNorm2d)):
            mod.running_mean.data.normal_(0, 0.05)
            mod.running_var.data.uniform_(0.8, 1.2)
    tm.eval()
    sd = {k: v for k, v in tm.state_dict().items() if k != "pe"}
    path = str(tmp_path / "avinet_refine.pt")
    torch.save(sd, path)

    model = AViNet(use_transformer=True)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = convert_torch_checkpoint(path, model, params, state)

    rng = np.random.RandomState(3)
    x = rng.randn(1, 32, 224, 384, 3).astype(np.float32)
    audio = rng.randn(1, 70560, 1).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 4, 1, 2, 3),
                 torch.from_numpy(audio).permute(0, 2, 1).unsqueeze(3)).numpy()
    out, _ = model.apply(params, state, jnp.asarray(x), jnp.asarray(audio))
    err = np.abs(np.asarray(out) - ref).max()
    assert err < 5e-3, err


def test_avinet_fusion_full_conversion_parity(tmp_path):
    """Transformer-fusion AViNet: torch twin -> converter -> matching maps
    (exercises the transformer name mapping incl. packed in_proj and the
    1x1 conv projections)."""
    from tests.torch_ref import TAViNetFusion
    from vinet_tpu.models import AViNetFusion

    torch.manual_seed(2)
    tm = TAViNetFusion()
    for mod in tm.modules():
        if isinstance(mod, (torch.nn.BatchNorm3d, torch.nn.BatchNorm2d)):
            mod.running_mean.data.normal_(0, 0.05)
            mod.running_var.data.uniform_(0.8, 1.2)
    tm.eval()
    sd = {k: v for k, v in tm.state_dict().items() if k != "pe"}
    path = str(tmp_path / "avinet_fusion.pt")
    torch.save(sd, path)

    model = AViNetFusion()
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = convert_torch_checkpoint(path, model, params, state)

    rng = np.random.RandomState(2)
    x = rng.randn(1, 32, 224, 384, 3).astype(np.float32)
    audio = rng.randn(1, 70560, 1).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 4, 1, 2, 3),
                 torch.from_numpy(audio).permute(0, 2, 1).unsqueeze(3)).numpy()
    out, _ = model.apply(params, state, jnp.asarray(x), jnp.asarray(audio))
    err = np.abs(np.asarray(out) - ref).max()
    assert err < 5e-3, err


def test_load_weights_none_sentinel_is_noop():
    """The reference's literal "None" --load_weight default (train.py:56) must
    mean "no weights", not a file path (advisor r3)."""
    from vinet_tpu.cli.common import load_weights
    from vinet_tpu.models import ViNet

    model = ViNet(num_hier=3, clip_size=8)
    params, state = model.init(jax.random.PRNGKey(0))
    for sentinel in ("None", "", None):
        p2, s2 = load_weights(sentinel, model, params, state)
        assert p2 is params and s2 is state, sentinel
