"""MATLAB-imresize parity tests.

Two independent oracles:
1. PIL's BICUBIC float resize shares MATLAB imresize's kernel (Keys cubic
   a=-0.5), antialias scaling, and half-pixel coordinate mapping; it differs
   ONLY at borders (PIL renormalizes the truncated window, MATLAB clamps
   indices / replicates edge pixels). So the interior must match to float32
   precision across up/downscale.
2. A brute-force re-derivation of MATLAB's algorithm written inline here
   (independent of the module's internals) checks borders too.

Reference usage being modeled: code_for_Metrics/CC.m:11, EMD.m:33-36.
"""

import math

import numpy as np
import pytest

from vinet_tpu.metrics.imresize import imresize


def _pil_resize(img, out_hw):
    from PIL import Image

    return np.asarray(
        Image.fromarray(img.astype(np.float32), mode="F").resize(
            (out_hw[1], out_hw[0]), Image.BICUBIC
        ),
        dtype=np.float64,
    )


def _margin(in_len, out_len):
    # border effects reach output pixels whose kernel window touches the
    # input edge: ~2 input pixels -> 2 * out/in output pixels (+ slack)
    return int(math.ceil(2.5 * max(1.0, out_len / in_len))) + 2


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((64, 80), (17, 31)),      # downscale (antialias path)
        ((17, 31), (64, 80)),      # upscale
        ((224, 384), (480, 640)),  # upscale to native video size
        ((224, 384), (288, 360)),  # mixed ratios
    ],
)
def test_interior_matches_pil_bicubic(in_hw, out_hw):
    rng = np.random.default_rng(0)
    img = rng.random(in_hw) * 255.0
    ours = imresize(img, out_hw)
    ref = _pil_resize(img, out_hw)
    assert ours.shape == tuple(out_hw)
    mh = _margin(in_hw[0], out_hw[0])
    mw = _margin(in_hw[1], out_hw[1])
    assert out_hw[0] > 2 * mh and out_hw[1] > 2 * mw
    diff = np.abs(ours - ref)[mh:-mh, mw:-mw]
    assert diff.max() < 1e-3  # PIL computes in float32


def _matlab_resize_1d(sig, out_len):
    """Independent brute-force of MATLAB imresize along one axis: Keys cubic
    a=-0.5, antialiased, u = x/scale + 0.5(1 - 1/scale), clamped indices,
    renormalized weights."""
    in_len = sig.shape[0]
    scale = out_len / in_len

    def cubic(x):
        ax = abs(x)
        if ax <= 1:
            return 1.5 * ax**3 - 2.5 * ax**2 + 1
        if ax <= 2:
            return -0.5 * ax**3 + 2.5 * ax**2 - 4 * ax + 2
        return 0.0

    if scale < 1:
        kern = lambda x: scale * cubic(scale * x)
        width = 4.0 / scale
    else:
        kern, width = cubic, 4.0
    out = np.zeros((out_len,) + sig.shape[1:])
    for x in range(1, out_len + 1):
        u = x / scale + 0.5 * (1 - 1 / scale)
        left = math.floor(u - width / 2)
        idx = [left + k for k in range(int(math.ceil(width)) + 2)]
        wts = np.array([kern(u - i) for i in idx])
        wts = wts / wts.sum()
        for w, i in zip(wts, idx):
            out[x - 1] += w * sig[min(max(i, 1), in_len) - 1]
    return out


@pytest.mark.parametrize("in_hw,out_hw", [((9, 7), (4, 11)), ((12, 16), (30, 6))])
def test_full_image_matches_bruteforce_definition(in_hw, out_hw):
    rng = np.random.default_rng(2)
    img = rng.random(in_hw)
    ref = _matlab_resize_1d(_matlab_resize_1d(img, out_hw[0]).T, out_hw[1]).T
    assert np.max(np.abs(imresize(img, out_hw) - ref)) < 1e-12


def test_scale_factor_form_uses_ceil():
    # imresize(map, 1/32) on 224x384 -> ceil -> (7, 12)
    img = np.random.default_rng(1).random((224, 384))
    assert imresize(img, scale=1.0 / 32).shape == (7, 12)
    # non-multiple size: ceil(230/32), ceil(390/32) -> (8, 13)
    assert imresize(np.ones((230, 390)), scale=1.0 / 32).shape == (8, 13)


def test_constant_image_preserved():
    img = np.full((40, 60), 3.25)
    for shape in [(13, 17), (80, 120)]:
        assert np.allclose(imresize(img, shape), 3.25, atol=1e-12)
