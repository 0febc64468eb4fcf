"""Checkpoint export: vinet_tpu pytrees -> reference-compatible torch .pt.

Closes the interop loop opposite io/convert.py: strict-loadable into the
torch twins (same naming as reference model.py), activation parity, and an
exact convert-back round trip.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.torch_ref import TAViNetFusion, TAViNetRefine, TViNet
from vinet_tpu.io.convert import convert_torch_checkpoint
from vinet_tpu.io.export import export_torch_checkpoint, trees_to_torch_state_dict
from vinet_tpu.models import AViNet, AViNetFusion, ViNet


def _strict_load(tm, path, *, pe_rename=False):
    """Load an exported .pt into a torch twin with strict=True.

    The twins register the sin/cos buffer as a top-level 'pe' (the reference
    registers it at transformer.pos_encoder.pe, which is what export emits),
    so AV twins need the one rename."""
    sd = torch.load(path, weights_only=True)
    if pe_rename:
        sd["pe"] = sd.pop("transformer.pos_encoder.pe")
    tm.load_state_dict(sd, strict=True)
    return sd


def test_export_vinet_strict_load_and_parity(tmp_path):
    """Exported ViNet weights strict-load into the torch twin (every name,
    shape, and BN buffer accounted for) and reproduce our maps."""
    model = ViNet(num_hier=3, clip_size=32)
    params, state = model.init(jax.random.PRNGKey(7))
    path = str(tmp_path / "export_vinet.pt")
    export_torch_checkpoint(path, model, params, state)

    tm = TViNet()
    _strict_load(tm, path)
    tm.eval()

    rng = np.random.RandomState(7)
    x = rng.randn(1, 32, 96, 128, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).numpy()
    out, _ = model.apply(params, state, jnp.asarray(x))
    err = np.abs(np.asarray(out) - ref).max()
    assert err < 2e-3, err


def test_export_convert_roundtrip_exact(tmp_path):
    """export -> convert back == identity on every params/state leaf."""
    model = ViNet(num_hier=3, clip_size=32)
    params, state = model.init(jax.random.PRNGKey(8))
    path = str(tmp_path / "rt_vinet.pt")
    export_torch_checkpoint(path, model, params, state)

    p2, s2 = model.init(jax.random.PRNGKey(9))
    p2, s2 = convert_torch_checkpoint(path, model, p2, s2)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize(
    "make_model,twin_cls",
    [(lambda: AViNet(use_transformer=True), TAViNetRefine),
     (AViNetFusion, TAViNetFusion)],
    ids=["avinet_refine", "avinet_fusion"],
)
def test_export_av_strict_load(tmp_path, make_model, twin_cls):
    """AV exports strict-load into the twins: covers SoundNet conv-2d-as-1d
    inversion, bilinear raw layout, transformer packed in_proj naming, and
    the synthesized pos_encoder.pe buffer (shape per reference model.py:19)."""
    model = make_model()
    params, state = model.init(jax.random.PRNGKey(11))
    path = str(tmp_path / "export_av.pt")
    export_torch_checkpoint(path, model, params, state)

    tm = twin_cls()
    sd = _strict_load(tm, path, pe_rename=True)
    np.testing.assert_allclose(sd["pe"].numpy(), tm.pe.numpy(), atol=1e-6)

    # and the exported dict converts back to the exact same trees
    sd_noPE = {k: v for k, v in torch.load(path, weights_only=True).items()
               if not k.endswith("pos_encoder.pe")}
    repath = str(tmp_path / "reimport.pt")
    torch.save(sd_noPE, repath)
    p2, s2 = model.init(jax.random.PRNGKey(12))
    p2, s2 = convert_torch_checkpoint(repath, model, p2, s2)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_covers_every_param_leaf():
    """No leaf is silently dropped: the flat dict's total element count equals
    the trees' (plus the synthesized buffers it adds)."""
    model = ViNet(num_hier=3, clip_size=32)
    params, state = model.init(jax.random.PRNGKey(13))
    sd = trees_to_torch_state_dict(params, state)
    n_tree = sum(int(np.asarray(v).size) for v in jax.tree_util.tree_leaves(params))
    n_tree += sum(int(np.asarray(v).size) for v in jax.tree_util.tree_leaves(state))
    n_flat = sum(int(v.size) for k, v in sd.items() if not k.endswith("num_batches_tracked"))
    assert n_flat == n_tree
