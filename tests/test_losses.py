"""Loss semantics vs independent numpy restatements of the reference formulas
(/root/reference/loss.py), and gradient sanity."""

import numpy as np
import jax
import jax.numpy as jnp

from vinet_tpu.training import LossConfig, cc, kldiv, loss_func, nss, similarity

RNG = np.random.RandomState(3)
EPS = 2.2204e-16


def _maps(b=3, h=12, w=16, positive=True):
    s = RNG.rand(b, h, w).astype(np.float32) + (0.01 if positive else 0)
    g = RNG.rand(b, h, w).astype(np.float32) + (0.01 if positive else 0)
    return s, g


def test_kldiv_matches_formula():
    s, g = _maps()
    sn = s / s.sum(axis=(1, 2), keepdims=True)
    gn = g / g.sum(axis=(1, 2), keepdims=True)
    expect = np.mean(np.sum(gn * np.log(EPS + gn / (sn + EPS)), axis=(1, 2)))
    got = float(kldiv(jnp.asarray(s), jnp.asarray(g)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_kldiv_zero_for_identical():
    s, _ = _maps()
    assert abs(float(kldiv(jnp.asarray(s), jnp.asarray(s)))) < 1e-5


def test_cc_matches_formula_and_bounds():
    s, g = _maps()
    vals = []
    for i in range(s.shape[0]):
        a = (s[i] - s[i].mean()) / s[i].std(ddof=1)
        b = (g[i] - g[i].mean()) / g[i].std(ddof=1)
        vals.append((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))
    got = float(cc(jnp.asarray(s), jnp.asarray(g)))
    np.testing.assert_allclose(got, np.mean(vals), rtol=1e-4)
    assert abs(float(cc(jnp.asarray(s), jnp.asarray(s))) - 1.0) < 1e-5


def test_similarity_matches_formula():
    s, g = _maps()

    def norm(x):
        x = (x - x.min(axis=(1, 2), keepdims=True)) / (
            x.max(axis=(1, 2), keepdims=True) - x.min(axis=(1, 2), keepdims=True)
        )
        return x / x.sum(axis=(1, 2), keepdims=True)

    expect = np.mean(np.sum(np.minimum(norm(s), norm(g)), axis=(1, 2)))
    got = float(similarity(jnp.asarray(s), jnp.asarray(g)))
    np.testing.assert_allclose(got, expect, rtol=1e-4)
    assert abs(float(similarity(jnp.asarray(s), jnp.asarray(s))) - 1.0) < 1e-4


def test_nss_matches_formula():
    s, _ = _maps()
    fix = (RNG.rand(*s.shape) > 0.9).astype(np.float32)
    vals = []
    for i in range(s.shape[0]):
        a = (s[i] - s[i].mean()) / (s[i].std(ddof=1) + EPS)
        vals.append((a * fix[i]).sum() / fix[i].sum())
    got = float(nss(jnp.asarray(s), jnp.asarray(fix)))
    np.testing.assert_allclose(got, np.mean(vals), rtol=1e-4)


def test_loss_func_combination_and_grad():
    s, g = _maps()
    cfg = LossConfig(kldiv=True, cc=True, sim=True, l1=True)
    val = float(loss_func(jnp.asarray(s), jnp.asarray(g), cfg))
    expect = (
        float(kldiv(jnp.asarray(s), jnp.asarray(g)))
        - float(cc(jnp.asarray(s), jnp.asarray(g)))
        - float(similarity(jnp.asarray(s), jnp.asarray(g)))
        + float(np.mean(np.abs(s - g)))
    )
    np.testing.assert_allclose(val, expect, rtol=1e-4)
    grad = jax.grad(lambda p: loss_func(p, jnp.asarray(g), cfg))(jnp.asarray(s))
    assert np.isfinite(np.asarray(grad)).all()


def test_loss_func_multiframe_equals_frame_loop():
    """Multi-frame (B,Cl,H,W) folding == reference's per-frame loop + mean
    (/root/reference/utils.py:27-37)."""
    b, cl, h, w = 2, 4, 10, 12
    s = RNG.rand(b, cl, h, w).astype(np.float32) + 0.01
    g = RNG.rand(b, cl, h, w).astype(np.float32) + 0.01
    cfg = LossConfig()
    got = float(loss_func(jnp.asarray(s), jnp.asarray(g), cfg))
    per_frame = [
        float(loss_func(jnp.asarray(s[:, i]), jnp.asarray(g[:, i]), cfg)) for i in range(cl)
    ]
    np.testing.assert_allclose(got, np.mean(per_frame), rtol=1e-5)
