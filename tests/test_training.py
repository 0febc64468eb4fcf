"""Train step, sharded multi-device training, BN folding, checkpoints."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vinet_tpu.models import ViNet
from vinet_tpu.models.inference import cast_floating, fold_batchnorms, make_inference_fn
from vinet_tpu.parallel import create_mesh, param_partition_specs, shard_pytree
from vinet_tpu.parallel.mesh import shard_batch
from vinet_tpu.training import LossConfig
from vinet_tpu.training.trainer import adam, init_train_state, make_eval_step, make_train_step


@pytest.fixture(scope="module")
def tiny_setup():
    model = ViNet(num_hier=3, clip_size=8)
    optimizer = adam(1e-3)
    ts = init_train_state(model, jax.random.PRNGKey(0), optimizer)
    k = jax.random.PRNGKey(1)
    batch = {
        "clip": jax.random.normal(k, (2, 8, 64, 96, 3), jnp.float32),
        "gt": jnp.clip(jax.random.uniform(k, (2, 64, 96)), 0.05, 1.0),
    }
    return model, optimizer, ts, batch


def test_train_step_decreases_loss(tiny_setup):
    model, optimizer, ts, batch = tiny_setup
    step = make_train_step(model, LossConfig(), optimizer, donate=False)
    ts1, m1 = step(ts, batch)
    losses = [float(m1["loss"])]
    for _ in range(4):
        ts1, m = step(ts1, batch)
        losses.append(float(m["loss"]))
    assert int(ts1["step"]) == 5
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_bf16_train_step(tiny_setup):
    """bf16-compute mixed precision (f32 masters): loss curve tracks the f32
    step closely, params/opt_state/BN stats stay f32."""
    model, optimizer, ts, batch = tiny_setup
    step32 = make_train_step(model, LossConfig(), optimizer, donate=False)
    step16 = make_train_step(model, LossConfig(), optimizer, donate=False,
                             compute_dtype=jnp.bfloat16)
    ts32, ts16 = ts, ts
    l32, l16 = [], []
    for _ in range(4):
        ts32, m32 = step32(ts32, batch)
        ts16, m16 = step16(ts16, batch)
        l32.append(float(m32["loss"]))
        l16.append(float(m16["loss"]))
    assert np.isfinite(l16).all()
    # same trajectory within bf16 rounding (loose: activations are bf16)
    np.testing.assert_allclose(l16, l32, rtol=0.05, atol=0.02)
    w = ts16["params"]["decoder"]["conv7"]["w"]
    assert w.dtype == jnp.float32
    assert ts16["state"]["backbone"]["base1"]["0"]["bn_s"]["mean"].dtype == jnp.float32


def test_bn_recalibration(tiny_setup):
    """recalibrate_bn replaces running stats with batch statistics: after
    calibrating on a single batch, the eval-mode forward matches the
    train-mode forward on that batch (batch stats == running stats). With
    torch-parity momentum=0.001 the raw running stats stay near their (0,1)
    init, so the uncalibrated eval forward differs wildly."""
    from vinet_tpu.training.trainer import recalibrate_bn

    model, optimizer, ts, batch = tiny_setup
    step = make_train_step(model, LossConfig(), optimizer, donate=False)
    ts1 = ts
    for _ in range(3):
        ts1, _ = step(ts1, batch)

    train_out, _ = model.apply(ts1["params"], ts1["state"], batch["clip"], train=True)
    state_cal = recalibrate_bn(model, ts1["params"], ts1["state"],
                               [{"clip": batch["clip"]}])
    eval_cal, _ = model.apply(ts1["params"], state_cal, batch["clip"])
    eval_raw, _ = model.apply(ts1["params"], ts1["state"], batch["clip"])

    err_cal = float(jnp.max(jnp.abs(eval_cal - train_out)))
    err_raw = float(jnp.max(jnp.abs(eval_raw - train_out)))
    assert err_cal < 0.05, err_cal
    assert err_cal < err_raw  # calibration moved eval toward train behavior


def test_train_step_updates_bn_stats(tiny_setup):
    model, optimizer, ts, batch = tiny_setup
    step = make_train_step(model, LossConfig(), optimizer, donate=False)
    ts1, _ = step(ts, batch)
    before = ts["state"]["backbone"]["base1"]["0"]["bn_s"]["mean"]
    after = ts1["state"]["backbone"]["base1"]["0"]["bn_s"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_eval_step_metrics(tiny_setup):
    model, optimizer, ts, batch = tiny_setup
    ev = make_eval_step(model, LossConfig())
    metrics, pred = ev(ts, batch)
    assert pred.shape == batch["gt"].shape
    assert np.isfinite(float(metrics["loss"]))
    assert -1 <= float(metrics["cc"]) <= 1


def test_sharded_training_8dev(tiny_setup):
    """Full train step over a (4 data x 2 model) mesh of 8 CPU devices —
    the fake-backend distributed test the reference never had (SURVEY.md §4)."""
    model, optimizer, ts, _ = tiny_setup
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = create_mesh(jax.devices()[:8], model=2)
    ts_sharded = {
        "params": shard_pytree(ts["params"], mesh),
        "state": shard_pytree(ts["state"], mesh),
        "opt_state": shard_pytree(ts["opt_state"], mesh),
        "step": ts["step"],
    }
    k = jax.random.PRNGKey(2)
    batch = {
        "clip": jax.random.normal(k, (4, 8, 64, 96, 3), jnp.float32),
        "gt": jnp.clip(jax.random.uniform(k, (4, 64, 96)), 0.05, 1.0),
    }
    batch = shard_batch(batch, mesh)
    step = make_train_step(model, LossConfig(), optimizer, donate=False)
    ts1, metrics = step(ts_sharded, batch)
    assert np.isfinite(float(metrics["loss"]))

    # sharded result == single-device result
    step_ref = make_train_step(model, LossConfig(), optimizer, donate=False)
    host_batch = jax.tree_util.tree_map(lambda x: jax.device_put(np.asarray(x)), batch)
    ts_ref, metrics_ref = step_ref(ts, host_batch)
    np.testing.assert_allclose(float(metrics["loss"]), float(metrics_ref["loss"]), rtol=1e-4)
    w_sh = np.asarray(ts1["params"]["decoder"]["conv7"]["w"])
    w_rf = np.asarray(ts_ref["params"]["decoder"]["conv7"]["w"])
    np.testing.assert_allclose(w_sh, w_rf, rtol=1e-3, atol=1e-5)


def test_sharded_avinet_training_8dev():
    """AViNet (audio branch + bilinear fusion) train step over the same
    (4 data x 2 model) mesh: the bilinear weight shards on its out axis and
    SoundNet's 1-D convs on out-channels; sharded == single-device."""
    from vinet_tpu.models import AViNet

    assert len(jax.devices()) >= 8
    model = AViNet(clip_size=32, input_hw=(64, 96))
    optimizer = adam(1e-3)
    ts = init_train_state(model, jax.random.PRNGKey(0), optimizer)
    mesh = create_mesh(jax.devices()[:8], model=2)

    specs = param_partition_specs(ts["params"], mesh)
    assert tuple(specs["bilinear"]["w"]) == ("model", None, None)
    assert tuple(specs["audionet"]["conv3"]["w"]) == (None, None, "model")

    ts_sharded = {
        "params": shard_pytree(ts["params"], mesh),
        "state": shard_pytree(ts["state"], mesh),
        "opt_state": shard_pytree(ts["opt_state"], mesh),
        "step": ts["step"],
    }
    k = jax.random.PRNGKey(7)
    kc, kg, ka = jax.random.split(k, 3)
    batch = {
        "clip": jax.random.normal(kc, (4, 32, 64, 96, 3), jnp.float32),
        "gt": jnp.clip(jax.random.uniform(kg, (4, 64, 96)), 0.05, 1.0),
        "audio": 0.1 * jax.random.normal(ka, (4, 70560, 1), jnp.float32),
    }
    sharded_batch = shard_batch(batch, mesh)
    step = make_train_step(model, LossConfig(), optimizer, donate=False)
    ts1, metrics = step(ts_sharded, sharded_batch)
    assert np.isfinite(float(metrics["loss"]))

    host_batch = jax.tree_util.tree_map(lambda x: jax.device_put(np.asarray(x)), batch)
    ts_ref, metrics_ref = step(ts, host_batch)
    np.testing.assert_allclose(float(metrics["loss"]), float(metrics_ref["loss"]), rtol=1e-4)
    w_sh = np.asarray(ts1["params"]["bilinear"]["w"])
    w_rf = np.asarray(ts_ref["params"]["bilinear"]["w"])
    # Adam's first step amplifies reduction-order noise (update = lr*g/|g|
    # for fresh moments), so tolerance is set by lr=1e-3, not the weights:
    # measured cross-sharding delta ~1.4e-4, garbage would differ by ~lr.
    np.testing.assert_allclose(w_sh, w_rf, rtol=1e-2, atol=5e-4)


def test_partition_specs_shard_out_channels():
    model = ViNet(num_hier=3, clip_size=8)
    params, _ = model.init(jax.random.PRNGKey(0))
    mesh = create_mesh(jax.devices()[:8], model=2)
    specs = param_partition_specs(params, mesh)
    s = specs["backbone"]["base2"]["0"]["branch0"]["0"]["conv"]["w"]
    assert tuple(s) == (None, None, None, None, "model")
    # 3-channel input conv still sharded on out axis; BN vector sharded
    assert tuple(specs["backbone"]["base1"]["0"]["conv_s"]["w"]) == (None, None, None, None, "model")
    assert tuple(specs["backbone"]["base1"]["0"]["bn_s"]["scale"]) == ("model",)
    # 1-channel output conv7 not divisible -> replicated
    assert tuple(specs["decoder"]["conv7"]["w"]) == ()


def test_fold_batchnorms_exact():
    model = ViNet(num_hier=3, clip_size=8)
    params, state = model.init(jax.random.PRNGKey(0))
    # randomize BN stats so folding is non-trivial
    def jiggle(tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        rngs = jax.random.split(jax.random.PRNGKey(5), len(leaves))
        out = []
        for leaf, r in zip(leaves, rngs):
            out.append(leaf + 0.05 * jax.random.normal(r, leaf.shape))
        return jax.tree_util.tree_unflatten(treedef, out)

    state = jax.tree_util.tree_map(jnp.abs, jiggle(state))
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 64, 96, 3), jnp.float32)
    ref, _ = model.apply(params, state, x)
    fp, fs = fold_batchnorms(params, state)
    # no BN params remain anywhere
    flat = jax.tree_util.tree_flatten_with_path(fp)[0]
    assert not any(any(getattr(k, "key", "") in ("scale",) for k in path) for path, _ in flat)
    out, _ = model.apply(fp, fs, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_make_inference_fn_bf16_close_to_f32():
    model = ViNet(num_hier=3, clip_size=8)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 64, 96, 3), jnp.float32)
    ref, _ = model.apply(params, state, x)
    fn, _, _ = make_inference_fn(model, params, state, dtype=jnp.bfloat16)
    out = fn(x)
    assert out.dtype == jnp.float32
    # untrained output is near-constant (~0.536), so compare absolutely:
    # bf16 conv noise must stay small at the sigmoid output
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 0.05, err


def test_checkpoint_roundtrip(tmp_path, tiny_setup):
    from vinet_tpu.io import latest_step, restore_checkpoint, save_checkpoint

    model, optimizer, ts, batch = tiny_setup
    step = make_train_step(model, LossConfig(), optimizer, donate=False)
    ts1, _ = step(ts, batch)
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, ts1)
    assert latest_step(d) == 1
    restored = restore_checkpoint(d, ts1)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(ts1)[0],
        jax.tree_util.tree_flatten_with_path(restored)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


def test_grad_accum_matches_microbatch_mean(tiny_setup):
    """grad_accum=N == hand-averaged per-microbatch gradients with BN running
    stats threaded sequentially (the documented semantics), down to the
    applied Adam update."""
    import optax
    from vinet_tpu.training.losses import loss_func

    model, optimizer, ts, batch = tiny_setup  # B=2 -> two microbatches of 1
    step = make_train_step(model, LossConfig(), optimizer, donate=False, grad_accum=2)
    ts_a, m_a = step(ts, batch)
    assert int(ts_a["step"]) == 1

    def lf(params, state, clip, gt):
        pred, new_state = model.apply(params, state, clip, train=True)
        return loss_func(pred, gt, LossConfig()), new_state

    g = jax.jit(jax.value_and_grad(lf, has_aux=True))
    state = ts["state"]
    grads, losses = None, []
    for i in range(2):
        (l, state), gi = g(ts["params"], state,
                           batch["clip"][i : i + 1], batch["gt"][i : i + 1])
        losses.append(float(l))
        grads = gi if grads is None else jax.tree_util.tree_map(jnp.add, grads, gi)
    grads = jax.tree_util.tree_map(lambda x: x / 2.0, grads)
    updates, _ = optimizer.update(grads, ts["opt_state"], ts["params"])
    params_ref = optax.apply_updates(ts["params"], updates)

    np.testing.assert_allclose(float(m_a["loss"]), np.mean(losses), rtol=1e-6)
    # the gradient itself is the semantics claim; tight check on its norm
    np.testing.assert_allclose(float(m_a["grad_norm"]),
                               float(optax.global_norm(grads)), rtol=1e-5)
    # params go through Adam's m/sqrt(v): last-ulp grad noise amplifies where
    # v ~ 0, so the update comparison gets fp headroom (atol ~ 1e-3*lr)
    for a, b in zip(jax.tree_util.tree_leaves(ts_a["params"]),
                    jax.tree_util.tree_leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ts_a["state"]),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_grad_accum_sharded_matches_single_device(tiny_setup):
    """grad_accum's in-jit (B,...)->(N,B/N,...) reshape composes with GSPMD
    batch sharding: sharded accum step == single-device accum step."""
    model, optimizer, ts, _ = tiny_setup
    assert len(jax.devices()) >= 8
    mesh = create_mesh(jax.devices()[:8], model=2)
    k = jax.random.PRNGKey(5)
    batch = {
        "clip": jax.random.normal(k, (8, 8, 64, 96, 3), jnp.float32),
        "gt": jnp.clip(jax.random.uniform(k, (8, 64, 96)), 0.05, 1.0),
    }
    step = make_train_step(model, LossConfig(), optimizer, donate=False, grad_accum=2)

    ts_sh = {k_: (shard_pytree(v, mesh) if k_ != "step" else v) for k_, v in ts.items()}
    ts1, m1 = step(ts_sh, shard_batch(batch, mesh))
    ts2, m2 = step(ts, jax.tree_util.tree_map(lambda x: jax.device_put(np.asarray(x)), batch))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ts1["params"]["decoder"]["conv7"]["w"]),
        np.asarray(ts2["params"]["decoder"]["conv7"]["w"]), rtol=1e-3, atol=1e-5)
