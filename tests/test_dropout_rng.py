"""Dropout + RNG threading through training (VERDICT r4 item 4).

The reference's fusion/refinement transformers are nn.TransformerEncoderLayer
stacks with torch-default dropout=0.1 ACTIVE in training
(/root/reference/model.py:137-144,211-221). make_train_step passes
rng=fold_in(ts["rng"], step) into model.apply(..., train=True), and the base
key lives in the train state / orbax checkpoint (SURVEY §5:
"params+opt_state+step+RNG"), so:
  (a) train-mode losses differ step-to-step even with frozen params
      (the dropout mask changes with the folded step key);
  (b) a state without "rng" trains with dropout off (deterministic);
  (c) resume from a checkpoint reproduces the exact key stream.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vinet_tpu.models import AViNetFusion
from vinet_tpu.training import LossConfig
from vinet_tpu.training.trainer import adam, init_train_state, make_train_step


@pytest.fixture(scope="module")
def fusion_setup():
    model = AViNetFusion(clip_size=8, input_hw=(64, 96))
    # lr=0 freezes params: any loss change across steps is dropout alone
    optimizer = adam(0.0)
    ts = init_train_state(model, jax.random.PRNGKey(0), optimizer)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    batch = {
        "clip": jax.random.normal(k1, (2, 8, 64, 96, 3), jnp.float32),
        "gt": jnp.clip(jax.random.uniform(k2, (2, 64, 96)), 0.05, 1.0),
        "audio": 0.1 * jax.random.normal(k3, (2, 70560, 1), jnp.float32),
    }
    step = make_train_step(model, LossConfig(), optimizer, donate=False)
    return model, optimizer, ts, batch, step


def test_dropout_varies_across_steps(fusion_setup):
    _, _, ts, batch, step = fusion_setup
    ts1, m1 = step(ts, batch)
    _, m2 = step(ts1, batch)
    l1, l2 = float(m1["loss"]), float(m2["loss"])
    assert np.isfinite([l1, l2]).all()
    # params are frozen (lr=0) and the batch is identical: only the folded
    # dropout key differs between step 0 and step 1
    assert l1 != l2, (l1, l2)


def test_no_rng_state_is_deterministic(fusion_setup):
    _, _, ts, batch, step = fusion_setup
    ts_norng = {k: v for k, v in ts.items() if k != "rng"}
    ts1, m1 = step(ts_norng, batch)
    assert "rng" not in ts1  # pass-through: structure preserved
    _, m2 = step(ts1, batch)
    assert float(m1["loss"]) == float(m2["loss"])


def test_same_step_same_key_reproduces(fusion_setup):
    _, _, ts, batch, step = fusion_setup
    _, ma = step(ts, batch)
    _, mb = step(ts, batch)
    assert float(ma["loss"]) == float(mb["loss"])


def test_resume_restores_dropout_stream(fusion_setup, tmp_path):
    model, optimizer, ts, batch, step = fusion_setup
    from vinet_tpu.io.checkpoint import restore_checkpoint, save_checkpoint

    ts1, _ = step(ts, batch)
    save_checkpoint(str(tmp_path / "ckpt"), ts1)
    template = init_train_state(model, jax.random.PRNGKey(9), optimizer)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), template)
    assert int(restored["step"]) == 1
    np.testing.assert_array_equal(np.asarray(restored["rng"]),
                                  np.asarray(ts1["rng"]))
    _, m_direct = step(ts1, batch)
    _, m_resumed = step(restored, batch)
    assert float(m_direct["loss"]) == float(m_resumed["loss"])
