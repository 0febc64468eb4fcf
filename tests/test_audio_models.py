"""SoundNet / Bilinear / Transformer parity vs torch, and AViNet shape tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from vinet_tpu.models import AViNet, AViNetFusion, Bilinear, SoundNet, TransformerEncoder
from vinet_tpu.models.transformer import TransformerEncoderLayer, positional_encoding

RNG = np.random.RandomState(7)


def _t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def test_soundnet_output_shape():
    sn = SoundNet()
    params, state = sn.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 70560, 1), jnp.float32)
    y, _ = jax.eval_shape(lambda p, s, x: sn.apply(p, s, x), params, state, x)
    assert y.shape == (2, 3, 1024)  # torch: (2, 1024, 3, 1)


def test_soundnet_parity_with_torch():
    """Run our SoundNet and an equivalent torch conv1d/BN stack with identical
    weights on a short waveform."""
    sn = SoundNet()
    params, state = sn.init(jax.random.PRNGKey(1))
    # perturb BN stats so eval BN actually does something
    for k in state:
        state[k]["mean"] = jnp.asarray(RNG.randn(state[k]["mean"].shape[0]).astype(np.float32)) * 0.1
        state[k]["var"] = jnp.asarray(1.0 + 0.1 * np.abs(RNG.randn(state[k]["var"].shape[0])).astype(np.float32))

    L = 8192
    x = RNG.randn(2, L, 1).astype(np.float32)
    y, _ = sn.apply(params, state, jnp.asarray(x))

    plan = [("conv1", 64, 2, 32, 8), ("conv2", 32, 2, 16, 8), ("conv3", 16, 2, 8, None),
            ("conv4", 8, 2, 4, None), ("conv5", 4, 2, 2, 4), ("conv6", 4, 2, 2, None),
            ("conv7", 4, 2, 2, None)]
    xt = _t(x).permute(0, 2, 1)  # (B, 1, L)
    with torch.no_grad():
        for name, k, s, p, pool in plan:
            cw = _t(np.asarray(params[name]["w"])).permute(2, 1, 0)  # (O,I,k)
            cb = _t(np.asarray(params[name]["b"]))
            xt = torch.nn.functional.conv1d(xt, cw, cb, stride=s, padding=p)
            bn = name.replace("conv", "batchnorm")
            xt = torch.nn.functional.batch_norm(
                xt, _t(np.asarray(state[bn]["mean"])), _t(np.asarray(state[bn]["var"])),
                _t(np.asarray(params[bn]["scale"])), _t(np.asarray(params[bn]["bias"])),
                training=False, eps=1e-5)
            xt = torch.relu(xt)
            if pool:
                xt = torch.nn.functional.max_pool1d(xt, pool, pool)
    ref = xt.permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=1e-4)


def test_bilinear_matches_torch():
    bl = Bilinear(42, 3, 336)
    params, _ = bl.init(jax.random.PRNGKey(2))
    x1 = RNG.randn(2, 8, 42).astype(np.float32)
    x2 = RNG.randn(2, 8, 3).astype(np.float32)
    y, _ = bl.apply(params, {}, jnp.asarray(x1), jnp.asarray(x2))

    m = torch.nn.Bilinear(42, 3, 336)
    m.weight.data = _t(np.asarray(params["w"]))
    m.bias.data = _t(np.asarray(params["b"]))
    with torch.no_grad():
        ref = m(_t(x1), _t(x2)).numpy()
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=1e-4)


def test_positional_encoding_matches_reference_formula():
    import math
    max_len, feat = 7, 12
    pe = np.asarray(positional_encoding(max_len, feat))
    # independent restatement of /root/reference/model.py:14-18
    ref = np.zeros((max_len, feat))
    pos = np.arange(max_len)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, feat, 2).astype(np.float64) * (-math.log(10000.0) / feat))
    ref[:, 0::2] = np.sin(pos * div)
    ref[:, 1::2] = np.cos(pos * div)
    np.testing.assert_allclose(pe, ref, rtol=1e-5, atol=1e-6)


def test_transformer_layer_matches_torch():
    e, h, ff, s, b = 16, 4, 32, 5, 2
    layer = TransformerEncoderLayer(e, h, ff)
    params, _ = layer.init(jax.random.PRNGKey(3))
    x = RNG.randn(b, s, e).astype(np.float32)
    y, _ = layer.apply(params, {}, jnp.asarray(x))

    tl = torch.nn.TransformerEncoderLayer(e, h, ff, dropout=0.0)
    sd = tl.state_dict()
    sd["self_attn.in_proj_weight"] = _t(np.asarray(params["self_attn"]["in_proj_w"]))
    sd["self_attn.in_proj_bias"] = _t(np.asarray(params["self_attn"]["in_proj_b"]))
    sd["self_attn.out_proj.weight"] = _t(np.asarray(params["self_attn"]["out_proj"]["w"]))
    sd["self_attn.out_proj.bias"] = _t(np.asarray(params["self_attn"]["out_proj"]["b"]))
    sd["linear1.weight"] = _t(np.asarray(params["linear1"]["w"]))
    sd["linear1.bias"] = _t(np.asarray(params["linear1"]["b"]))
    sd["linear2.weight"] = _t(np.asarray(params["linear2"]["w"]))
    sd["linear2.bias"] = _t(np.asarray(params["linear2"]["b"]))
    sd["norm1.weight"] = _t(np.asarray(params["norm1"]["scale"]))
    sd["norm1.bias"] = _t(np.asarray(params["norm1"]["bias"]))
    sd["norm2.weight"] = _t(np.asarray(params["norm2"]["scale"]))
    sd["norm2.bias"] = _t(np.asarray(params["norm2"]["bias"]))
    tl.load_state_dict(sd)
    tl.eval()
    with torch.no_grad():
        # torch layer is seq-first: (S, B, E)
        ref = tl(_t(x).permute(1, 0, 2)).permute(1, 0, 2).numpy()
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=1e-4)


def test_transformer_encoder_stack_runs():
    tr = TransformerEncoder(24, nhead=4, num_layers=2, hidden_size=48, max_len=10)
    params, _ = tr.init(jax.random.PRNGKey(4))
    x = jnp.asarray(RNG.randn(2, 10, 24).astype(np.float32))
    y, _ = tr.apply(params, {}, x)
    assert y.shape == (2, 10, 24)
    # train-mode dropout with an rng must differ from eval
    yd, _ = tr.apply(params, {}, x, train=True, rng=jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(y), np.asarray(yd))


@pytest.mark.parametrize("use_transformer", [False, True])
def test_avinet_shapes(use_transformer):
    model = AViNet(use_transformer=use_transformer)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 32, 224, 384, 3), jnp.float32)
    audio = jnp.zeros((1, 70560, 1), jnp.float32)
    out, _ = jax.eval_shape(lambda p, s, x, a: model.apply(p, s, x, a), params, state, x, audio)
    assert out.shape == (1, 224, 384)


def test_avinet_fusion_shapes():
    model = AViNetFusion()
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 32, 224, 384, 3), jnp.float32)
    audio = jnp.zeros((1, 70560, 1), jnp.float32)
    out, _ = jax.eval_shape(lambda p, s, x, a: model.apply(p, s, x, a), params, state, x, audio)
    assert out.shape == (1, 224, 384)
