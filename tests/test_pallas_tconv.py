"""Pallas temporal-conv kernel: interpret-mode parity vs the XLA conv, both
formulations, plus gradient correctness through the custom VJP."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vinet_tpu.ops.pallas_tconv import _tconv, _tconv_pallas_fwd, _xla_tconv


CASES = [
    # (T, H, W, C, Cout, K, stride, pad) — scaled-down stem / sep_t shapes
    (8, 8, 16, 16, 16, 7, 2, 3),
    (8, 8, 16, 24, 24, 3, 1, 1),
    (4, 4, 8, 8, 8, 2, 2, 0),
]


@pytest.mark.parametrize("merged", [False, True, "concat"])
@pytest.mark.parametrize("case", CASES)
def test_interpret_parity(case, merged):
    t, h, w_, c, cout, k, st, pad = case
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, t, h, w_, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, 1, 1, c, cout)) * 0.1, jnp.float32)
    ref = _xla_tconv(x, w, st, pad)
    out = _tconv_pallas_fwd(x, w.reshape(k, c, cout), stride=st, pad=pad,
                            merged=merged, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("case", [c for c in CASES if c[6] == 2 and c[5] > 2])
def test_pair_formulation(case, monkeypatch):
    """Frame-pair kernel (two output frames packed into the 128 MXU output
    lanes): exact vs XLA, including gradients through its custom VJP."""
    from vinet_tpu.ops.pallas_tconv import temporal_conv3d

    monkeypatch.setenv("VINET_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("VINET_PALLAS_TCONV", "pair")
    t, h, w_, c, cout, k, st, pad = case
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, t, h, w_, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, 1, 1, c, cout)) * 0.1, jnp.float32)
    ref = _xla_tconv(x, w, st, pad)
    out = temporal_conv3d(x, w, stride=st, pad=pad)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def loss_pair(x_, w_):
        return jnp.sum(temporal_conv3d(x_, w_, stride=st, pad=pad) ** 2)

    gx_p, gw_p = jax.grad(loss_pair, argnums=(0, 1))(x, w)
    monkeypatch.setenv("VINET_PALLAS_TCONV", "0")
    gx_r, gw_r = jax.grad(loss_pair, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=1e-4, atol=1e-4)


def test_custom_vjp_grads_match_xla(monkeypatch):
    monkeypatch.setenv("VINET_PALLAS_INTERPRET", "1")
    t, h, w_, c, cout, k, st, pad = CASES[1]
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, t, h, w_, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, c, cout)) * 0.1, jnp.float32)

    def loss_pallas(x_, w_):
        return jnp.sum(_tconv(x_, w_, st, pad, False) ** 2)

    def loss_xla(x_, w_):
        return jnp.sum(_xla_tconv(x_, w_, st, pad) ** 2)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=1e-4, atol=1e-4)


def test_conv3d_dispatch_cpu_falls_back():
    """On the CPU test backend, conv3d's temporal branch must route to the
    exact XLA implementation (no Pallas compile)."""
    from vinet_tpu.ops.conv import conv3d

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 1, 1, 16, 16)) * 0.1, jnp.float32)
    out = conv3d(x, w, stride=(2, 1, 1), padding=(3, 0, 0))
    ref = _xla_tconv(x, w, 2, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
