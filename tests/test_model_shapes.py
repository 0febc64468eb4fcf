"""Shape tests for the S3D pyramid and every decoder variant.

Expected pyramid for a (B, 32, 224, 384, 3) clip — SURVEY.md §2.1 M1,
channels-last:
    y0 (B,4,7,12,1024), y1 (B,8,14,24,832), y2 (B,16,28,48,480),
    y3 (B,16,56,96,192).
"""

import jax
import jax.numpy as jnp
import pytest

from vinet_tpu.models import S3DBackbone, ViNet


@pytest.fixture(scope="module")
def backbone_params():
    bb = S3DBackbone()
    return bb, *bb.init(jax.random.PRNGKey(0))


def test_backbone_pyramid_shapes(backbone_params):
    bb, params, state = backbone_params
    x = jnp.zeros((1, 32, 224, 384, 3), jnp.float32)
    (y0, y1, y2, y3), _ = jax.eval_shape(
        lambda p, s, x: bb.apply(p, s, x), params, state, x
    )
    assert y0.shape == (1, 4, 7, 12, 1024)
    assert y1.shape == (1, 8, 14, 24, 832)
    assert y2.shape == (1, 16, 28, 48, 480)
    assert y3.shape == (1, 16, 56, 96, 192)


@pytest.mark.parametrize("clip_size", [8, 16, 32, 48])
def test_vinet_clip_variants(clip_size):
    model = ViNet(num_hier=3, clip_size=clip_size)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, clip_size, 224, 384, 3), jnp.float32)
    out, _ = jax.eval_shape(lambda p, s, x: model.apply(p, s, x), params, state, x)
    assert out.shape == (1, 224, 384)


@pytest.mark.parametrize("num_hier", [0, 1, 2, 3])
def test_vinet_hier_variants(num_hier):
    model = ViNet(num_hier=num_hier, clip_size=32)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 32, 224, 384, 3), jnp.float32)
    out, _ = jax.eval_shape(lambda p, s, x: model.apply(p, s, x), params, state, x)
    assert out.shape == (2, 224, 384)


def test_vinet_forward_runs_and_is_bounded():
    model = ViNet()
    params, state = model.init(jax.random.PRNGKey(0))
    # tiny spatial size to keep CPU test fast: H,W must be divisible by 32
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 64, 96, 3), jnp.float32)
    out, new_state = jax.jit(lambda p, s, x: model.apply(p, s, x))(params, state, x)
    assert out.shape == (1, 64, 96)
    assert bool(jnp.all(out >= 0)) and bool(jnp.all(out <= 1))
    # eval mode must not mutate BN stats
    leaves0 = jax.tree_util.tree_leaves(state)
    leaves1 = jax.tree_util.tree_leaves(new_state)
    assert all((a == b).all() for a, b in zip(leaves0, leaves1))


def test_param_count_matches_reference_scale():
    """The reference ViNet is ~31-33M params (backbone+decoder)."""
    model = ViNet()
    params, _ = model.init(jax.random.PRNGKey(0))
    n = sum(p.size for p in jax.tree_util.tree_leaves(params))
    assert 25_000_000 < n < 40_000_000, n
