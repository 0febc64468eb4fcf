"""Interpret-mode exactness for the fused SepConv3d Pallas kernel
(ops/pallas_sepconv.py) against the layer-wise conv3d path.
Reference semantics: SepConv3d, /root/reference/model_utils.py:141-160."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vinet_tpu.ops.conv import conv3d
from vinet_tpu.ops.pallas_sepconv import fused_sepconv3


@pytest.mark.parametrize("shape,cout", [
    ((2, 8, 16, 24, 64), 96),
    ((1, 4, 8, 16, 32), 48),
])
def test_fused_sepconv_matches_layerwise(shape, cout):
    cin = shape[-1]
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    w_s = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 3, cin, cout), jnp.float32) * 0.1
    b_s = jax.random.normal(jax.random.PRNGKey(2), (cout,), jnp.float32)
    w_t = jax.random.normal(jax.random.PRNGKey(3), (3, 1, 1, cout, cout), jnp.float32) * 0.1
    b_t = jax.random.normal(jax.random.PRNGKey(4), (cout,), jnp.float32)

    y = jax.nn.relu(conv3d(x, w_s, stride=1, padding=(0, 1, 1), bias=b_s))
    ref = jax.nn.relu(conv3d(y, w_t, stride=1, padding=(1, 0, 0), bias=b_t))
    got = fused_sepconv3(x, w_s, b_s, w_t, b_t, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
