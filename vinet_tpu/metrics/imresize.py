"""MATLAB-compatible imresize (bicubic, antialiased) in pure numpy.

Every MATLAB metric in the reference resizes the prediction to GT size with
`imresize` before scoring (/root/reference/code_for_Metrics/CC.m:11, NSS.m:10,
KLdiv.m:12, similarity.m:15, AUC_*.m, EMD.m:33-36, eval_diem.m:61). MATLAB's
default is the Keys cubic kernel (a = -0.5) with antialiasing on downscale:
the kernel is stretched to `h(x) = scale * cubic(scale * x)` so its support
covers 4/scale input pixels. Output pixel x (1-based) samples input
coordinate u = x/scale + 0.5*(1 - 1/scale); weights are renormalized to sum
to 1 and border indices are clamped (replicate).

This coordinate mapping + antialiased kernel is mathematically identical to
PIL's BICUBIC resize on float images, which the tests use as an independent
oracle (tests/test_imresize.py).
"""

from __future__ import annotations

import math

import numpy as np


def _cubic(x: np.ndarray) -> np.ndarray:
    """Keys bicubic kernel, a = -0.5 (MATLAB imresize default)."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    f = (1.5 * ax3 - 2.5 * ax2 + 1.0) * (ax <= 1)
    f += (-0.5 * ax3 + 2.5 * ax2 - 4.0 * ax + 2.0) * ((ax > 1) & (ax <= 2))
    return f


def _contributions(in_len: int, out_len: int, scale: float):
    """Weights/indices for one dimension (imresize's `contributions`).
    Returns (weights (out_len, P), indices (out_len, P) 0-based clamped)."""
    if scale < 1.0:  # antialias: stretch kernel support to 4/scale
        kernel = lambda x: scale * _cubic(scale * x)
        width = 4.0 / scale
    else:
        kernel = _cubic
        width = 4.0
    x = np.arange(1, out_len + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1.0 - 1.0 / scale)
    left = np.floor(u - width / 2.0)
    p = int(math.ceil(width)) + 2
    indices = left[:, None] + np.arange(p, dtype=np.float64)[None, :]  # 1-based
    weights = kernel(u[:, None] - indices)
    weights = weights / weights.sum(axis=1, keepdims=True)
    indices = np.clip(indices, 1, in_len).astype(np.int64) - 1  # replicate border
    keep = ~np.all(weights == 0.0, axis=0)
    return weights[:, keep], indices[:, keep]


def imresize(img, out_shape=None, scale=None) -> np.ndarray:
    """MATLAB `imresize(img, [h w])` or `imresize(img, scale)` for 2-D double
    images, bicubic + antialias (the defaults). Scale-factor form uses
    MATLAB's ceil(size * scale) output size."""
    img = np.asarray(img, dtype=np.float64)
    assert img.ndim == 2, img.shape
    if out_shape is None:
        assert scale is not None
        out_shape = (int(math.ceil(img.shape[0] * scale)),
                     int(math.ceil(img.shape[1] * scale)))
    out_h, out_w = int(out_shape[0]), int(out_shape[1])
    out = img
    if out_h != img.shape[0]:
        wts, idx = _contributions(img.shape[0], out_h, out_h / img.shape[0])
        out = np.einsum("op,opw->ow", wts, out[idx, :])
    if out_w != img.shape[1]:
        wts, idx = _contributions(img.shape[1], out_w, out_w / img.shape[1])
        out = np.einsum("op,hop->ho", wts, out[:, idx])
    return out
