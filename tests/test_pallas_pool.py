"""Interpret-mode exactness for the Pallas max-pool kernels
(ops/pallas_pool.py) against lax.reduce_window at every S3D pool geometry.
Reference semantics: torch MaxPool3d floor mode (-inf padding),
/root/reference/model.py:694-743."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from vinet_tpu.ops import pallas_pool


def _ref(x, k, s, p):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, *k, 1), (1, *s, 1),
        [(0, 0)] + [(pp, pp) for pp in p] + [(0, 0)])


@pytest.mark.parametrize("shape,k,s,p", [
    ((2, 4, 16, 24, 8), (1, 3, 3), (1, 2, 2), (0, 1, 1)),
    ((2, 4, 16, 24, 8), (1, 2, 2), (1, 2, 2), (0, 0, 0)),
    ((2, 4, 16, 24, 8), (3, 3, 3), (1, 1, 1), (1, 1, 1)),
    ((2, 4, 16, 24, 8), (2, 1, 1), (2, 1, 1), (0, 0, 0)),
    ((2, 5, 16, 24, 8), (2, 1, 1), (1, 1, 1), (0, 0, 0)),
    ((1, 3, 8, 12, 16), (3, 3, 3), (1, 1, 1), (1, 1, 1)),
])
def test_pool_matches_reduce_window(shape, k, s, p):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    ref = _ref(x, k, s, p)
    got = pallas_pool.maxpool(x, kernel=k, stride=s, padding=p, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


def test_supported_gate_is_off_by_default(monkeypatch):
    monkeypatch.delenv("VINET_PALLAS_POOL", raising=False)
    assert not pallas_pool.supported(
        (16, 16, 112, 192, 64), (1, 3, 3), (1, 2, 2), (0, 1, 1), jnp.bfloat16)
