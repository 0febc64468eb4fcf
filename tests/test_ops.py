"""Numerical parity of core ops vs. torch (the reference's substrate).

Golden values are computed inline with torch CPU ops — independent
re-statements of the semantics in /root/reference/model_utils.py and
/root/reference/utils.py, not copies of its code.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from vinet_tpu.ops import (
    conv3d,
    conv1d,
    maxpool3d,
    maxpool1d,
    batchnorm_apply,
    batchnorm_train,
    fold_bn_into_conv,
    upsample2x_hw,
    gaussian_blur,
)

RNG = np.random.RandomState(0)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def test_conv3d_matches_torch():
    x = RNG.randn(2, 6, 9, 11, 5).astype(np.float32)  # N T H W C
    w = RNG.randn(3, 3, 3, 5, 7).astype(np.float32)  # D H W I O
    y = conv3d(jnp.asarray(x), jnp.asarray(w), stride=(2, 1, 1), padding=(1, 1, 1))
    # torch: NCDHW / OIDHW
    xt = _t(x).permute(0, 4, 1, 2, 3)
    wt = _t(w).permute(4, 3, 0, 1, 2)
    yt = torch.nn.functional.conv3d(xt, wt, stride=(2, 1, 1), padding=(1, 1, 1))
    yt = yt.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-4)


def test_conv3d_bias_and_asymmetric_kernel():
    x = RNG.randn(1, 20, 7, 12, 4).astype(np.float32)
    w = RNG.randn(5, 3, 3, 4, 6).astype(np.float32)
    b = RNG.randn(6).astype(np.float32)
    y = conv3d(jnp.asarray(x), jnp.asarray(w), stride=(5, 1, 1), padding=(0, 1, 1), bias=jnp.asarray(b))
    xt = _t(x).permute(0, 4, 1, 2, 3)
    wt = _t(w).permute(4, 3, 0, 1, 2)
    yt = torch.nn.functional.conv3d(xt, wt, bias=_t(b), stride=(5, 1, 1), padding=(0, 1, 1))
    yt = yt.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-4)


def test_conv1d_matches_torch():
    x = RNG.randn(2, 300, 3).astype(np.float32)
    w = RNG.randn(64, 3, 16).astype(np.float32)  # k I O
    b = RNG.randn(16).astype(np.float32)
    y = conv1d(jnp.asarray(x), jnp.asarray(w), stride=2, padding=32, bias=jnp.asarray(b))
    xt = _t(x).permute(0, 2, 1)
    wt = _t(w).permute(2, 1, 0)
    yt = torch.nn.functional.conv1d(xt, wt, bias=_t(b), stride=2, padding=32)
    yt = yt.permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "kernel,stride,padding",
    [
        ((1, 3, 3), (1, 2, 2), (0, 1, 1)),
        ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
        ((2, 1, 1), (2, 1, 1), (0, 0, 0)),
        ((3, 3, 3), (1, 1, 1), (1, 1, 1)),
        ((4, 1, 1), (2, 1, 2), (0, 0, 0)),  # AViNet's odd maxpool (model.py:229)
    ],
)
def test_maxpool3d_matches_torch(kernel, stride, padding):
    x = RNG.randn(2, 8, 14, 24, 3).astype(np.float32)
    y = maxpool3d(jnp.asarray(x), kernel=kernel, stride=stride, padding=padding)
    xt = _t(x).permute(0, 4, 1, 2, 3)
    yt = torch.nn.functional.max_pool3d(xt, kernel, stride, padding)
    yt = yt.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-6, atol=1e-6)


def test_maxpool1d_matches_torch():
    x = RNG.randn(2, 100, 4).astype(np.float32)
    y = maxpool1d(jnp.asarray(x), kernel=8, stride=8)
    xt = _t(x).permute(0, 2, 1)
    yt = torch.nn.functional.max_pool1d(xt, 8, 8).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-6, atol=1e-6)


def test_batchnorm_eval_matches_torch():
    c = 5
    x = RNG.randn(2, 4, 6, 7, c).astype(np.float32)
    params = {"scale": jnp.asarray(RNG.randn(c).astype(np.float32)),
              "bias": jnp.asarray(RNG.randn(c).astype(np.float32))}
    state = {"mean": jnp.asarray(RNG.randn(c).astype(np.float32)),
             "var": jnp.asarray(np.abs(RNG.randn(c)).astype(np.float32) + 0.5)}
    y = batchnorm_apply(params, state, jnp.asarray(x), eps=1e-3)

    bn = torch.nn.BatchNorm3d(c, eps=1e-3, momentum=0.001)
    bn.weight.data = _t(np.asarray(params["scale"]))
    bn.bias.data = _t(np.asarray(params["bias"]))
    bn.running_mean.data = _t(np.asarray(state["mean"]))
    bn.running_var.data = _t(np.asarray(state["var"]))
    bn.eval()
    with torch.no_grad():
        yt = bn(_t(x).permute(0, 4, 1, 2, 3)).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-5, atol=1e-5)


def test_batchnorm_train_matches_torch():
    c = 4
    x = RNG.randn(3, 2, 5, 6, c).astype(np.float32)
    params = {"scale": jnp.asarray(RNG.randn(c).astype(np.float32)),
              "bias": jnp.asarray(RNG.randn(c).astype(np.float32))}
    state = {"mean": jnp.asarray(RNG.randn(c).astype(np.float32)),
             "var": jnp.asarray(np.abs(RNG.randn(c)).astype(np.float32) + 0.5)}
    y, new_state = batchnorm_train(params, state, jnp.asarray(x), eps=1e-3, momentum=0.001)

    bn = torch.nn.BatchNorm3d(c, eps=1e-3, momentum=0.001)
    bn.weight.data = _t(np.asarray(params["scale"]))
    bn.bias.data = _t(np.asarray(params["bias"]))
    bn.running_mean.data = _t(np.asarray(state["mean"]))
    bn.running_var.data = _t(np.asarray(state["var"]))
    bn.train()
    yt = bn(_t(x).permute(0, 4, 1, 2, 3)).permute(0, 2, 3, 4, 1).detach().numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["mean"]), bn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state["var"]), bn.running_var.numpy(), rtol=1e-5, atol=1e-6)


def test_fold_bn_into_conv():
    x = RNG.randn(1, 4, 6, 8, 3).astype(np.float32)
    w = RNG.randn(1, 3, 3, 3, 5).astype(np.float32)
    c = 5
    params = {"scale": jnp.asarray(RNG.randn(c).astype(np.float32)),
              "bias": jnp.asarray(RNG.randn(c).astype(np.float32))}
    state = {"mean": jnp.asarray(RNG.randn(c).astype(np.float32)),
             "var": jnp.asarray(np.abs(RNG.randn(c)).astype(np.float32) + 0.5)}
    ref = batchnorm_apply(params, state, conv3d(jnp.asarray(x), jnp.asarray(w), padding=(0, 1, 1)), eps=1e-3)
    wf, bf = fold_bn_into_conv(jnp.asarray(w), None, params, state, eps=1e-3)
    fused = conv3d(jnp.asarray(x), wf, padding=(0, 1, 1), bias=bf)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("lowering", ["0", "1"])
def test_upsample2x_matches_torch_trilinear(monkeypatch, lowering):
    """Both lowerings (stack stencil / jax.image.resize) are torch-exact."""
    monkeypatch.setenv("VINET_UP_RESIZE", lowering)
    x = RNG.randn(2, 3, 7, 12, 4).astype(np.float32)
    y = upsample2x_hw(jnp.asarray(x))
    xt = _t(x).permute(0, 4, 1, 2, 3)
    up = torch.nn.Upsample(scale_factor=(1, 2, 2), mode="trilinear", align_corners=False)
    yt = up(xt).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-5, atol=1e-5)


def test_gaussian_blur_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    img = RNG.rand(57, 83).astype(np.float32)
    y = gaussian_blur(jnp.asarray(img), ksize=11, sigma=0.0)
    ref = cv2.GaussianBlur(img, (11, 11), 0)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)


def test_gaussian_blur_batched():
    img = RNG.rand(3, 16, 20).astype(np.float32)
    y = gaussian_blur(jnp.asarray(img))
    y0 = gaussian_blur(jnp.asarray(img[0]))
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y0), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize(
    "kshape,stride,padding",
    [
        ((1, 7, 7, 3, 16), (1, 2, 2), (0, 3, 3)),  # spatial path (time->batch)
        ((7, 1, 1, 16, 16), (2, 1, 1), (3, 0, 0)),  # temporal path (space->width)
        ((1, 1, 1, 16, 8), (1, 1, 1), (0, 0, 0)),  # pointwise (spatial path)
        ((2, 1, 1, 8, 8), (2, 1, 1), (0, 0, 0)),  # decoder temporal collapse
    ],
)
def test_conv3d_fast_paths_match_torch(kshape, stride, padding):
    """The 2-D-conv lowerings of factorized kernels are exact."""
    x = RNG.randn(2, 8, 10, 12, kshape[3]).astype(np.float32)
    w = RNG.randn(*kshape).astype(np.float32)
    y = conv3d(jnp.asarray(x), jnp.asarray(w), stride=stride, padding=padding)
    xt = _t(x).permute(0, 4, 1, 2, 3)
    wt = _t(w).permute(4, 3, 0, 1, 2)
    yt = torch.nn.functional.conv3d(xt, wt, stride=stride, padding=padding)
    yt = yt.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-4)


def test_quantize_maps_u8_matches_save_map_math():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vinet_tpu.ops.image import quantize_maps_u8

    maps = jax.random.uniform(jax.random.PRNGKey(0), (3, 17, 23), jnp.float32)
    maps = maps.at[1].set(0.5)  # constant map -> zeros
    got = np.asarray(quantize_maps_u8(maps))
    for i in range(3):
        a = np.asarray(maps[i], np.float64)
        mn, mx = a.min(), a.max()
        a = (a - mn) / (mx - mn) if mx > mn else np.zeros_like(a)
        ref = np.clip(np.round(a * 255.0 + 0.5), 0, 255).astype(np.uint8)
        diff = np.abs(got[i].astype(int) - ref.astype(int))
        assert diff.max() <= 1  # f32-vs-f64 rounding ties only


@pytest.mark.parametrize("kt,t", [(3, 12), (5, 20), (2, 4)])
def test_conv3d_tmerge_exact_and_differentiable(monkeypatch, kt, t):
    """VINET_TMERGE=1 (temporal-tiling kt==st convs folded to VALID convs
    over a free window reshape, ops/conv.py) is exact vs the strided path
    and has the same gradients — the decoder-plan geometry family."""
    x = RNG.randn(2, t, 6, 8, 12).astype(np.float32)
    w = RNG.randn(kt, 3, 3, 12, 7).astype(np.float32)
    b = RNG.randn(7).astype(np.float32)

    def run():
        f = lambda xx, ww: conv3d(xx, ww, stride=(kt, 1, 1), padding=(0, 1, 1),
                                  bias=jnp.asarray(b)).sum()
        val, grads = jax.value_and_grad(
            lambda args: f(*args))((jnp.asarray(x), jnp.asarray(w)))
        y = conv3d(jnp.asarray(x), jnp.asarray(w), stride=(kt, 1, 1),
                   padding=(0, 1, 1), bias=jnp.asarray(b))
        return np.asarray(y), float(val), [np.asarray(g) for g in grads]

    monkeypatch.setenv("VINET_TMERGE", "0")
    y0, v0, g0 = run()
    monkeypatch.setenv("VINET_TMERGE", "1")
    y1, v1, g1 = run()
    np.testing.assert_allclose(y1, y0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(v1, v0, rtol=1e-5)
    for a, c in zip(g1, g0):
        np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-4)
