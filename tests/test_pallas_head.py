"""Pallas saliency-head kernel: interpret-mode correctness vs reference math,
and decoder integration equivalence."""

import numpy as np
import jax
import jax.numpy as jnp

from vinet_tpu.ops.pallas_head import saliency_head_pallas, saliency_head_reference


def test_pallas_head_interpret_matches_reference():
    k = jax.random.PRNGKey(0)
    z = jax.random.normal(k, (2, 2, 16, 24, 32), jnp.float32)
    w6 = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32), jnp.float32) * 0.1
    b6 = jax.random.normal(jax.random.PRNGKey(2), (32,), jnp.float32) * 0.1
    w7 = jax.random.normal(jax.random.PRNGKey(3), (32,), jnp.float32) * 0.1
    b7 = jnp.asarray([0.1], jnp.float32)
    ref = saliency_head_reference(z, w6, b6, w7, b7)
    out = saliency_head_pallas(z, w6, b6, w7, b7, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pallas_head_kt3_with_bias():
    """clip-48 tail shape: kt=3 temporal collapse with bias."""
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 8, 16, 32), jnp.float32)
    w6 = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32), jnp.float32) * 0.1
    b6 = jax.random.normal(jax.random.PRNGKey(2), (32,), jnp.float32)
    w7 = jax.random.normal(jax.random.PRNGKey(3), (32,), jnp.float32) * 0.1
    b7 = jnp.asarray([0.0], jnp.float32)
    ref = saliency_head_reference(z, w6, b6, w7, b7)
    out = saliency_head_pallas(z, w6, b6, w7, b7, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_decoder_head_path_equivalence(monkeypatch):
    """Decoder eval output identical with the head fused vs op-by-op (on CPU
    the dispatch uses the reference math — this pins the integration wiring:
    weight slicing, bias handling, dtype)."""
    from vinet_tpu.models import ViNet

    model = ViNet(num_hier=3, clip_size=8)  # no conv6: normal path
    params, state = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32, 32, 3), jnp.float32)
    monkeypatch.setenv("VINET_PALLAS_HEAD", "1")
    a, _ = model.apply(params, state, x)
    monkeypatch.setenv("VINET_PALLAS_HEAD", "0")
    b, _ = model.apply(params, state, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)

    model32 = ViNet(num_hier=3, clip_size=32)  # conv6 present: head path
    params, state = model32.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 32, 3), jnp.float32)
    monkeypatch.setenv("VINET_PALLAS_HEAD", "1")
    a, _ = model32.apply(params, state, x)
    monkeypatch.setenv("VINET_PALLAS_HEAD", "0")
    b, _ = model32.apply(params, state, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
