"""Device-resident image ops: resize, normalize, Gaussian blur, map scaling.

Replaces the reference's host-side PIL/cv2 round trips
(/root/reference/dataloader.py:133-140 PIL Resize+Normalize;
/root/reference/utils.py:61-64 cv2.GaussianBlur; /root/reference/train.py:253-257
per-sample GPU->CPU->GPU resize) with jittable JAX ops so only JPEG/PNG decode
stays on the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ImageNet statistics used by every reference dataset transform
# (/root/reference/dataloader.py:136-139).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def resize_bilinear(x: jax.Array, height: int, width: int, *, antialias: bool = True) -> jax.Array:
    """Bilinear resize of (..., H, W) or (..., H, W, C) images.

    antialias=True matches PIL's triangle-filtered downsampling (the reference
    uses torchvision Resize on PIL images); antialias=False matches
    cv2.resize(INTER_LINEAR) used for pred-map upscaling
    (/root/reference/train.py:254)."""
    if x.ndim == 2:
        shape = (height, width)
    elif x.ndim == 3:
        # rank-3 is (H, W, C) when the last axis looks like channels, else (N, H, W)
        if x.shape[-1] in (1, 3):
            shape = (height, width, x.shape[-1])
        else:
            shape = (x.shape[0], height, width)
    else:
        shape = (*x.shape[:-3], height, width, x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear", antialias=antialias).astype(x.dtype)


def normalize_imagenet(x: jax.Array) -> jax.Array:
    """(x/1.0 - mean) / std over the channel (last) axis; input already in [0,1]."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


@functools.lru_cache(maxsize=8)
def _gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel semantics: if sigma<=0, sigma=0.3*((k-1)*0.5-1)+0.8."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    r = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(r**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x: jax.Array, *, ksize: int = 11, sigma: float = 0.0) -> jax.Array:
    """Separable Gaussian blur over the last two axes (H, W) of any-rank input.

    Matches cv2.GaussianBlur(img, (11,11), 0) — the post-processing blur the
    reference applies to every predicted map (/root/reference/utils.py:61-64) —
    including its BORDER_REFLECT_101 edge handling (np.pad mode='reflect').
    """
    k = jnp.asarray(_gaussian_kernel_1d(ksize, sigma), x.dtype)
    orig_shape = x.shape
    h, w = orig_shape[-2], orig_shape[-1]
    xb = x.reshape((-1, h, w))

    xh = _blur_axis(xb, k, axis=1)
    xhw = _blur_axis(xh, k, axis=2)
    return xhw.reshape(orig_shape)


def _blur_axis(x: jax.Array, k: jax.Array, *, axis: int) -> jax.Array:
    """1-D reflect-padded correlation along `axis` of a rank-3 tensor."""
    ksize = k.shape[0]
    pad = ksize // 2
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (pad, pad)
    xp = jnp.pad(x, pad_widths, mode="reflect")
    out = jnp.zeros_like(x)
    for i in range(ksize):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + x.shape[axis])
        out = out + k[i] * xp[tuple(sl)]
    return out


def minmax_normalize(x: jax.Array, *, axes=None, eps: float = 0.0) -> jax.Array:
    """Per-sample (or global) min-max normalization to [0,1]
    (reference normalize_map, /root/reference/loss.py:41-51)."""
    if axes is None:
        mn = jnp.min(x)
        mx = jnp.max(x)
    else:
        mn = jnp.min(x, axis=axes, keepdims=True)
        mx = jnp.max(x, axis=axes, keepdims=True)
    return (x - mn) / (mx - mn + eps)


def to_uint8_map(x: jax.Array) -> jax.Array:
    """Replicates the reference's img_save quantization: round(x*255 + 0.5)
    clamped to [0,255] (/root/reference/utils.py:71)."""
    return jnp.clip(jnp.round(x * 255.0 + 0.5), 0, 255).astype(jnp.uint8)


def quantize_maps_u8(maps):
    """Device-side img_save quantization: per-map min-max normalize then
    round(x*255 + 0.5) to uint8 (reference utils.py:66-78 semantics, f32
    instead of the host's f64 — differs by at most 1/255 on rounding ties).
    Quantizing on device cuts the per-map device->host transfer 4x, which
    dominates generate_result wall-clock through a remote TPU link.
    maps: (B, H, W) float -> (B, H, W) uint8."""
    import jax.numpy as jnp

    m = maps.astype(jnp.float32)
    mn = m.min(axis=(1, 2), keepdims=True)
    mx = m.max(axis=(1, 2), keepdims=True)
    nrm = jnp.where(mx > mn, (m - mn) / (mx - mn), jnp.zeros_like(m))
    return jnp.clip(jnp.round(nrm * 255.0 + 0.5), 0, 255).astype(jnp.uint8)
