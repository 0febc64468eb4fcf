"""Space-to-depth stem: exact equivalence with the canonical stem conv."""

import numpy as np
import jax
import jax.numpy as jnp

from vinet_tpu.models import ViNet
from vinet_tpu.models.inference import make_inference_fn, space_to_depth_stem
from vinet_tpu.ops.conv import conv3d
from vinet_tpu.ops.s2d import conv3d_s2d_stem, s2d_stem_kernel

RNG = np.random.RandomState(0)


def test_s2d_kernel_exact():
    w = RNG.randn(1, 7, 7, 3, 16).astype(np.float32)
    x = jnp.asarray(RNG.randn(2, 4, 64, 96, 3).astype(np.float32))
    ref = conv3d(x, jnp.asarray(w), stride=(1, 2, 2), padding=(0, 3, 3))
    got = conv3d_s2d_stem(x, jnp.asarray(s2d_stem_kernel(w)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_s2d_transform_preserves_model_output():
    model = ViNet(num_hier=3, clip_size=8)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 64, 96, 3), jnp.float32)
    ref, _ = model.apply(params, state, x)
    params2 = space_to_depth_stem(params)
    assert "w_s2d" in params2["backbone"]["base1"]["0"]["conv_s"]
    out, _ = model.apply(params2, state, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_inference_fn_with_s2d_close_to_f32():
    model = ViNet(num_hier=3, clip_size=8)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 64, 96, 3), jnp.float32)
    ref, _ = model.apply(params, state, x)
    fn, _, _ = make_inference_fn(model, params, state, dtype=jnp.bfloat16)
    out = fn(x)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 0.05
