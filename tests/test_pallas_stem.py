"""Interpret-mode exactness for the fused-stem Pallas kernel
(ops/pallas_stem.py) against the layer-wise conv path. The kernel is
dispatch-gated OFF (it does not compile on real TPUs yet — layout wall,
see the module docstring); the math is kept pinned here for the redesign.
Reference semantics: SepConv3d stem, /root/reference/model_utils.py:141-160."""

import numpy as np

import jax
import jax.numpy as jnp

from vinet_tpu.ops.conv import conv3d
from vinet_tpu.ops.pallas_stem import fused_stem


def test_fused_stem_matches_layerwise():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 64, 96, 3), jnp.float32)
    w_s = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 7, 3, 64), jnp.float32) * 0.1
    b_s = jax.random.normal(jax.random.PRNGKey(2), (64,), jnp.float32)
    w_t = jax.random.normal(jax.random.PRNGKey(3), (7, 1, 1, 64, 64), jnp.float32) * 0.1
    b_t = jax.random.normal(jax.random.PRNGKey(4), (64,), jnp.float32)

    y = jax.nn.relu(conv3d(x, w_s, stride=(1, 2, 2), padding=(0, 3, 3), bias=b_s))
    ref = jax.nn.relu(conv3d(y, w_t, stride=(2, 1, 1), padding=(3, 0, 0), bias=b_t))
    got = fused_stem(x, w_s, b_s, w_t, b_t, stride_t=2, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
