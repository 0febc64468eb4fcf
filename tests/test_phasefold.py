"""Exactness tests for the phase-folded decoder tail (ops/phasefold.py).

The fold must reproduce conv3d(upsample2x_hw(x), w) bit-for-bit in f32 —
including the upsample's edge clamping AND the conv's zero padding, which
disagree on the outermost fine rows/cols (the correction terms under test).
Reference semantics: /root/reference/model.py:289-307 (upsampling + convtsp5/6/7).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vinet_tpu.models.decoder import Decoder, decoder_plan
from vinet_tpu.ops.conv import conv3d
from vinet_tpu.ops.phasefold import conv_after_up2x, phase_up2x
from vinet_tpu.ops.upsample import upsample2x_hw


@pytest.mark.parametrize("shape,wsh,st", [
    ((1, 2, 6, 8, 3), (1, 3, 3, 3, 2), 1),
    ((2, 4, 7, 9, 5), (2, 3, 3, 5, 4), 2),
    ((1, 4, 56, 96, 64), (2, 3, 3, 64, 32), 2),
    ((1, 6, 5, 5, 2), (3, 3, 3, 2, 3), 3),
])
def test_conv_after_up2x_exact(shape, wsh, st):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), wsh, jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(2), (wsh[-1],), jnp.float32)
    ref = conv3d(upsample2x_hw(x), w, stride=(st, 1, 1), padding=(0, 1, 1), bias=b)
    got = conv_after_up2x(x, w, b, stride_t=st, pad_t=0)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_phase_up2x_is_permutation_of_upsample():
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 5, 7, 4), jnp.float32)
    u = phase_up2x(z)  # (B, T, H, W, 4*C)
    fine = upsample2x_hw(z)
    b, t, h, w, c = z.shape
    u = u.reshape(b, t, h, w, 4, c)
    for ph in range(2):
        for pw in range(2):
            np.testing.assert_allclose(
                np.asarray(u[..., ph * 2 + pw, :]),
                np.asarray(fine[:, :, ph::2, pw::2]), atol=1e-6)


@pytest.mark.parametrize("nh,cs", [(3, 32), (3, 16), (3, 8), (3, 48),
                                   (0, 32), (1, 32), (2, 32)])
def test_decoder_phasefold_matches_baseline(nh, cs, monkeypatch):
    dec = Decoder(decoder_plan(nh, cs))
    params, _ = dec.init(jax.random.PRNGKey(0))
    tdiv = {32: (4, 8, 16, 16), 16: (2, 4, 8, 8), 8: (1, 2, 4, 4),
            48: (6, 12, 24, 24)}[cs]
    pyr = [jax.random.normal(jax.random.PRNGKey(i), s, jnp.float32)
           for i, s in enumerate([
               (2, tdiv[0], 7, 12, 1024), (2, tdiv[1], 14, 24, 832),
               (2, tdiv[2], 28, 48, 480), (2, tdiv[3], 56, 96, 192)])]
    monkeypatch.setenv("VINET_PHASEFOLD", "0")
    monkeypatch.setenv("VINET_PALLAS_HEAD", "0")
    ref, _ = dec.apply(params, {}, pyr)
    monkeypatch.setenv("VINET_PHASEFOLD", "1")
    got, _ = dec.apply(params, {}, pyr)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
