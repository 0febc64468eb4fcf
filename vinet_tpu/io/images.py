"""Host-side image IO: decode/encode only — resize/normalize live on device
where static-shaped, except the initial resize-to-model-size which happens at
decode time (PIL antialiased bilinear, matching the reference's torchvision
Resize((224,384)) — /root/reference/dataloader.py:133-140).
"""

from __future__ import annotations

import numpy as np
from PIL import Image

MODEL_H, MODEL_W = 224, 384


def load_frame(path: str, *, size=(MODEL_H, MODEL_W)) -> tuple[np.ndarray, tuple]:
    """Decode an RGB frame, resize to model size. Returns (HxWx3 uint8,
    original (W, H) PIL-convention size)."""
    img = Image.open(path).convert("RGB")
    orig = img.size
    img = img.resize((size[1], size[0]), Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8), orig


def load_map(path: str, *, size=None) -> np.ndarray:
    """Decode a grayscale GT map to float in [0,1]. size=(H,W) resizes with
    OpenCV-style (non-antialiased) bilinear like the reference's
    cv2.resize(gt, (384,224)) (/root/reference/dataloader.py:292); None keeps
    native resolution (val-mode semantics)."""
    img = Image.open(path).convert("L")
    gt = np.asarray(img, dtype=np.float64)
    if size is not None:
        import cv2

        gt = cv2.resize(gt, (size[1], size[0]))
    if gt.max() > 1.0:
        gt = gt / 255.0
    return gt.astype(np.float32)


def save_map(arr: np.ndarray, path: str, *, normalize: bool = True) -> None:
    """Save a float saliency map as 8-bit grayscale with the reference's
    img_save quantization (min-max normalize, then round(x*255+0.5)
    — /root/reference/utils.py:66-78).

    Contract for uint8 input: it must ALREADY be normalized+quantized
    (ops/image.py:quantize_maps_u8) — it is written verbatim, and the
    `normalize` argument does not apply (asserted below)."""
    if np.asarray(arr).dtype == np.uint8:
        # already quantized on device (ops/image.py:quantize_maps_u8)
        assert normalize, "uint8 fast path requires pre-quantized input"
        im = Image.fromarray(np.asarray(arr))
        if path.lower().endswith((".jpg", ".jpeg")):
            im.save(path, quality=100)
        else:
            im.save(path)
        return
    a = np.asarray(arr, dtype=np.float64)
    if normalize:
        mn, mx = a.min(), a.max()
        a = (a - mn) / (mx - mn) if mx > mn else np.zeros_like(a)
    a = np.clip(np.round(a * 255.0 + 0.5), 0, 255).astype(np.uint8)
    im = Image.fromarray(a)
    if path.lower().endswith((".jpg", ".jpeg")):
        im.save(path, quality=100)
    else:
        im.save(path)
