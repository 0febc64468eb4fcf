"""EMD: native C++ solver vs exact LP fallback vs hand-checkable cases."""

import numpy as np
import pytest

from vinet_tpu.metrics.emd import _load_native, emd_hat, emd_score


def _grid_distance(n):
    i = np.arange(n, dtype=float)
    return np.abs(i[:, None] - i[None, :])


def test_native_builds():
    assert _load_native() is not None, "C++ EMD failed to build/load"


def test_identical_histograms_zero():
    p = np.array([0.2, 0.3, 0.5])
    assert emd_hat(p, p, _grid_distance(3)) == 0.0


def test_single_shift():
    # move 1 unit one bin over -> cost 1
    p = np.array([1.0, 0.0])
    q = np.array([0.0, 1.0])
    assert emd_hat(p, q, _grid_distance(2)) == pytest.approx(1.0)


def test_split_mass():
    # 1 unit at bin 0 -> 0.5 to bin 1 (cost .5) + 0.5 to bin 2 (cost 1.0)
    p = np.array([1.0, 0.0, 0.0])
    q = np.array([0.0, 0.5, 0.5])
    assert emd_hat(p, q, _grid_distance(3)) == pytest.approx(0.5 * 1 + 0.5 * 2)


def test_unequal_mass_penalty():
    p = np.array([2.0, 0.0])
    q = np.array([0.0, 1.0])
    # ship 1 unit (cost 1), 1 unit unmatched at penalty 5
    assert emd_hat(p, q, _grid_distance(2), extra_mass_penalty=5.0) == pytest.approx(6.0)
    # penalty=-1 -> max(D)=1
    assert emd_hat(p, q, _grid_distance(2), extra_mass_penalty=-1.0) == pytest.approx(2.0)


def test_threshold_clamps_distance():
    p = np.array([1.0, 0.0, 0.0, 0.0])
    q = np.array([0.0, 0.0, 0.0, 1.0])
    assert emd_hat(p, q, _grid_distance(4)) == pytest.approx(3.0)
    assert emd_hat(p, q, _grid_distance(4), threshold=1.5) == pytest.approx(1.5)


def test_native_matches_lp_fallback_random():
    rng = np.random.default_rng(0)
    for _ in range(5):
        n = 30
        p = rng.random(n)
        q = rng.random(n)
        p /= p.sum()
        q /= q.sum()
        pts = rng.random((n, 2)) * 10
        D = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        np.fill_diagonal(D, 0.0)
        a = emd_hat(p, q, D)
        b = emd_hat(p, q, D, force_fallback=True)
        assert a == pytest.approx(b, rel=1e-6, abs=1e-9)


def test_flow_output_consistent():
    rng = np.random.default_rng(1)
    n = 10
    p = rng.random(n)
    q = rng.random(n)
    q *= p.sum() / q.sum()
    D = _grid_distance(n).astype(float)
    val, flow = emd_hat(p, q, D, return_flow=True)
    assert flow.shape == (n, n)
    np.testing.assert_allclose(flow.sum(), p.sum(), rtol=1e-6)
    np.testing.assert_allclose((flow * D).sum(), val, rtol=1e-6)
    np.testing.assert_array_less(flow.sum(axis=1), p + 1e-6)


def test_emd_score_discriminates():
    """Metric-level property (EMD.m semantics): a dislocated prediction costs
    more than an aligned one, zero for identical maps."""
    y, x = np.mgrid[0:224, 0:384]
    gt = np.exp(-((y - 112) ** 2 + (x - 150) ** 2) / (2 * 20.0**2))
    near = np.exp(-((y - 112) ** 2 + (x - 180) ** 2) / (2 * 20.0**2))
    far = np.exp(-((y - 40) ** 2 + (x - 330) ** 2) / (2 * 20.0**2))
    s_same = emd_score(gt, gt)
    s_near = emd_score(near, gt)
    s_far = emd_score(far, gt)
    assert s_same == pytest.approx(0.0, abs=1e-6)
    assert 0 < s_near < s_far
