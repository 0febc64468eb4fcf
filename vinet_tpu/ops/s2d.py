"""Space-to-depth stem transform (the standard TPU trick for the first conv).

The S3D stem is a (1,7,7)-kernel stride-(1,2,2) conv over 3-channel input —
a contraction with K = 7*7*3 = 147 and tiny channel counts, which maps badly
onto the 128x128 MXU (measured ~2% utilization). Rearranging 2x2 spatial
blocks into channels ((H,W,3) -> (H/2,W/2,12)) turns it into a stride-1
(1,4,4) conv over 12 channels with asymmetric padding (2,1) — identical math
(exact, not approximate; see tests), far better tiling.

Derivation: output row i reads input rows 2i+u, u in [-3,3]; writing
2i+u = 2(i+b)+r with phase r in {0,1} gives block offsets b in {-2..1} and
kernel entry K4[b, r] = K7[2b+r-1] (zero where 2b+r-1 < 0), i.e. the 7-tap
kernel padded to 8 taps and folded into (block, phase).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def space_to_depth_hw(x: jax.Array) -> jax.Array:
    """(B, T, H, W, C) -> (B, T, H/2, W/2, 4C); channel order (rh, rw, c)."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 2, 4, 3, 5, 6))  # (..., rh, rw, c)
    return x.reshape(b, t, h // 2, w // 2, 4 * c)


def s2d_stem_kernel(w: np.ndarray) -> np.ndarray:
    """Fold a (1,7,7,Cin,Cout) stride-2 kernel into its space-to-depth
    equivalent (1,4,4,4*Cin,Cout) with channel order (rh, rw, cin)."""
    w = np.asarray(w)
    assert w.shape[0] == 1 and w.shape[1] == 7 and w.shape[2] == 7, w.shape
    cin, cout = w.shape[3], w.shape[4]
    out = np.zeros((1, 4, 4, 2, 2, cin, cout), w.dtype)
    for bh in range(4):
        for rh in range(2):
            uh = 2 * bh + rh - 1
            if not 0 <= uh < 7:
                continue
            for bw in range(4):
                for rw in range(2):
                    uw = 2 * bw + rw - 1
                    if not 0 <= uw < 7:
                        continue
                    out[0, bh, bw, rh, rw] = w[0, uh, uw]
    return out.reshape(1, 4, 4, 4 * cin, cout)


def conv3d_s2d_stem(x: jax.Array, w_s2d: jax.Array, bias=None) -> jax.Array:
    """Apply the transformed stem: exact equivalent of
    conv3d(x, w7, stride=(1,2,2), padding=(0,3,3))."""
    xb = space_to_depth_hw(x)
    out = lax.conv_general_dilated(
        xb,
        w_s2d.astype(x.dtype),
        window_strides=(1, 1, 1),
        padding=[(0, 0), (2, 1), (2, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)
