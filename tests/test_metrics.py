"""Offline metric suite: property tests + cross-checks against the training
losses and brute-force restatements of the MATLAB definitions."""

import numpy as np
import pytest

from vinet_tpu.metrics import (
    auc_borji,
    auc_judd,
    auc_shuffled,
    cc_score,
    create_shuffle_map,
    info_gain,
    kldiv_score,
    nss_score,
    similarity_score,
)

RNG = np.random.RandomState(11)


def _gaussian_map(h, w, cy, cx, sigma=5.0):
    y, x = np.mgrid[0:h, 0:w]
    return np.exp(-((y - cy) ** 2 + (x - cx) ** 2) / (2 * sigma**2))


def test_cc_perfect_and_anticorrelated():
    m = _gaussian_map(32, 48, 16, 24)
    assert abs(cc_score(m, m) - 1.0) < 1e-9
    assert cc_score(m, m.max() - m) < -0.99


def test_cc_matches_training_loss():
    from vinet_tpu.training import cc as cc_loss
    import jax.numpy as jnp

    s = RNG.rand(20, 30)
    g = RNG.rand(20, 30)
    a = cc_score(s, g)
    b = float(cc_loss(jnp.asarray(s[None], jnp.float32), jnp.asarray(g[None], jnp.float32)))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_similarity_bounds():
    m = _gaussian_map(32, 48, 16, 24)
    assert abs(similarity_score(m, m) - 1.0) < 1e-9
    other = _gaussian_map(32, 48, 4, 4, sigma=2.0)
    assert similarity_score(other, m) < 0.3


def test_nss_matches_bruteforce():
    s = RNG.rand(24, 36)
    fix = (RNG.rand(24, 36) > 0.95).astype(float)
    z = (s - s.mean()) / s.std()
    expect = z[fix.astype(bool)].mean()
    np.testing.assert_allclose(nss_score(s, fix), expect, rtol=1e-9)


def test_kldiv_zero_on_identical():
    m = _gaussian_map(20, 20, 10, 10)
    assert kldiv_score(m, m) < 1e-10


def test_auc_judd_matches_bruteforce_loop():
    """Vectorized sweep == the O(Nfix*Npix) loop from AUC_Judd.m, restated."""
    s = RNG.rand(16, 20)
    fix = np.zeros((16, 20))
    fix[RNG.randint(0, 16, 12), RNG.randint(0, 20, 12)] = 1
    got = auc_judd(s, fix, jitter=False)

    S = ((s - s.min()) / (s.max() - s.min())).ravel()
    F = fix.ravel()
    sth = np.sort(S[F > 0])[::-1]
    n_fix, n_pix = sth.size, S.size
    tp = [0.0]
    fp = [0.0]
    for i, thresh in enumerate(sth, start=1):
        above = (S >= thresh).sum()
        tp.append(i / n_fix)
        fp.append((above - i) / (n_pix - n_fix))
    tp.append(1.0)
    fp.append(1.0)
    expect = np.trapezoid(tp, fp)
    np.testing.assert_allclose(got, expect, atol=1e-12)


def test_auc_judd_discrimination():
    """A saliency map peaked at the fixations must far outscore a map peaked
    elsewhere."""
    fix = np.zeros((40, 60))
    fix[10, 15] = 1
    fix[12, 18] = 1
    good = _gaussian_map(40, 60, 11, 16)
    bad = _gaussian_map(40, 60, 35, 50)
    assert auc_judd(good, fix) > 0.95
    assert auc_judd(bad, fix) < 0.4
    assert auc_borji(good, fix) > 0.9
    assert auc_borji(bad, fix) < 0.5


def test_auc_judd_conventions_close():
    s = RNG.rand(32, 48)
    fix = (RNG.rand(32, 48) > 0.97).astype(float)
    a = auc_judd(s, fix, jitter=False, convention="matlab")
    b = auc_judd(s, fix, jitter=False, convention="loss_py")
    assert abs(a - b) < 0.01


def test_auc_shuffled_center_bias_penalty():
    """sAUC's whole point: a center-biased map scores ~0.5 when the shuffle
    map is center-biased too."""
    h, w = 40, 60
    center = _gaussian_map(h, w, h // 2, w // 2, sigma=8)
    fix = np.zeros((h, w))
    fix[h // 2, w // 2] = 1
    fix[h // 2 + 2, w // 2 - 3] = 1
    # other fixations also central
    others = []
    for _ in range(10):
        om = np.zeros((h, w))
        om[h // 2 + RNG.randint(-4, 5), w // 2 + RNG.randint(-6, 7)] = 1
        others.append(om)
    shuf = create_shuffle_map(others)
    score = auc_shuffled(center, fix, shuf)
    plain = auc_judd(center, fix)
    # plain AUC is inflated by the shared center bias; sAUC discounts it
    assert plain > 0.95
    assert score < plain - 0.05


def test_create_shuffle_map_union():
    a = np.zeros((4, 4))
    a[0, 0] = 1
    b = np.zeros((4, 4))
    b[2, 3] = 5  # any positive counts
    m = create_shuffle_map([a, b])
    assert m.sum() == 2 and m[0, 0] == 1 and m[2, 3] == 1


def test_info_gain_prefers_better_model():
    fix = np.zeros((30, 40))
    fix[10, 10] = 1
    good = _gaussian_map(30, 40, 10, 10)
    base = _gaussian_map(30, 40, 15, 20, sigma=20.0)  # broad center prior
    assert info_gain(good, fix, base) > 0
    bad = _gaussian_map(30, 40, 25, 35)
    assert info_gain(bad, fix, base) < info_gain(good, fix, base)


def test_resize_path():
    """Metrics resize pred to GT size like imresize in the MATLAB suite."""
    gt = _gaussian_map(44, 62, 20, 30)
    pred = _gaussian_map(22, 31, 10, 15, sigma=2.5)  # same physical width at half res
    assert cc_score(pred, gt) > 0.95
