"""Training CLI (reference: train.py).

Same knob surface as the reference's argparse (/root/reference/train.py:21-66)
minus its footguns, plus: orbax checkpoints with step-level --resume (the
reference restarts schedules from scratch, SURVEY.md §5), data-parallel mesh
sharding, and structured per-interval logging.

Dataset selection mirrors train.py:97-136: DHF1KDataset | SoundDataset (the
six AV datasets concatenated) | Hollywood_UCFDataset.

Usage (DHF1K):
  python -m vinet_tpu.cli.train --train_path_data D/annotation \
      --val_path_data D/val --no_epochs 40 --batch_size 8
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def build_parser():
    from vinet_tpu.cli.common import add_bool_flag, add_model_args

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--no_epochs", type=int, default=40)
    p.add_argument("--lr", type=float, default=1e-4)
    for flag, default in (("kldiv", True), ("cc", False), ("nss", False), ("sim", False),
                          ("l1", False), ("lr_sched", False)):
        add_bool_flag(p, flag, default)
    p.add_argument("--kldiv_coeff", type=float, default=1.0)
    p.add_argument("--cc_coeff", type=float, default=-1.0)
    p.add_argument("--sim_coeff", type=float, default=-1.0)
    p.add_argument("--nss_coeff", type=float, default=1.0)
    p.add_argument("--l1_coeff", type=float, default=1.0)
    p.add_argument("--step_size", type=int, default=5, help="lr decay interval (epochs) if --lr_sched")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatch scan count: effective batch batch_size "
                        "with the memory of batch_size/N per forward")
    p.add_argument("--log_interval", type=int, default=5)
    p.add_argument("--tb_logdir", type=str, default=None,
                   help="optional TensorBoard dir for train/val scalars")
    p.add_argument("--no_workers", type=int, default=4)
    p.add_argument("--train_path_data", type=str, required=True)
    p.add_argument("--val_path_data", type=str, default=None)
    p.add_argument("--dataset", type=str, default="DHF1KDataset",
                   choices=["DHF1KDataset", "SoundDataset", "Hollywood", "UCF"])
    p.add_argument("--alternate", type=int, default=1)
    p.add_argument("--split", type=int, default=-1)
    p.add_argument("--multi_frame", type=int, default=0)
    p.add_argument("--model_val_path", type=str, default="vinet_best.npz",
                   help="best-val weights (npz)")
    p.add_argument("--checkpoint_dir", type=str, default=None,
                   help="orbax dir for full train-state checkpoints")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--file_weight", type=str, default=None,
                   help="S3D Kinetics-400 backbone init (.pt) — reference train.py:69")
    p.add_argument("--load_weight", type=str, default=None,
                   help="full-model weights to start from (.pt or .npz)")
    p.add_argument("--max_steps_per_epoch", type=int, default=0, help="0 = full epoch")
    p.add_argument("--model_axis", type=int, default=1, help="mesh model-parallel size")
    p.add_argument("--bn_recal", type=int, default=0,
                   help="N>0: before each validation, replace BN running "
                        "stats with average batch stats over N cached train "
                        "batches. Needed for FROM-SCRATCH runs: torch-parity "
                        "momentum=0.001 leaves running stats at init for "
                        "thousands of steps (the reference never hits this — "
                        "it always loads pretrained stats). 0 = reference "
                        "behavior.")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute (f32 master weights/optimizer/BN stats)"
                        " — 2x MXU rate; loss-curve parity tested")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed and shard the data loaders per host")
    p.add_argument("--streaming_ft", action="store_true",
                   help="streaming-consistent FINE-TUNE: train through the "
                        "--streaming inference forward (timeline encoder + "
                        "window gather + decoder) on contiguous chunks, so "
                        "streaming inference is in-distribution. Requires "
                        "--load_weight (BN statistics are frozen); DHF1K "
                        "layout, visual-only models. See "
                        "training/streaming_ft.py.")
    p.add_argument("--ft_chunk", type=int, default=64,
                   help="--streaming_ft chunk length (frames, %%8==0)")
    p.add_argument("--ft_windows", type=int, default=16,
                   help="--streaming_ft loss windows per chunk step")
    add_model_args(p)
    return p


def make_datasets(args):
    from vinet_tpu.data import DHF1KDataset, HollywoodUCFDataset, SoundDataset
    from vinet_tpu.data.datasets import AV_DATASETS, ConcatDataset

    if args.dataset == "DHF1KDataset":
        train = DHF1KDataset(args.train_path_data, args.clip_size, mode="train",
                             multi_frame=args.multi_frame, alternate=args.alternate)
        val = (DHF1KDataset(args.val_path_data, args.clip_size, mode="val",
                            alternate=args.alternate) if args.val_path_data else None)
    elif args.dataset == "SoundDataset":
        trains, vals = [], []
        for ds in AV_DATASETS:
            trains.append(SoundDataset(args.train_path_data, args.clip_size, dataset_name=ds,
                                       split=args.split, mode="train", use_sound=args.use_sound))
            vals.append(SoundDataset(args.train_path_data, args.clip_size, dataset_name=ds,
                                     split=args.split, mode="test", use_sound=args.use_sound))
        train, val = ConcatDataset(trains), ConcatDataset(vals)
    else:
        train = HollywoodUCFDataset(args.train_path_data, args.clip_size, mode="train",
                                    multi_frame=args.multi_frame)
        val = (HollywoodUCFDataset(args.val_path_data, args.clip_size, mode="val")
               if args.val_path_data else None)
    return train, val


def run_streaming_ft(args) -> int:
    """--streaming_ft loop: chunk batches through the streaming forward
    (training/streaming_ft.py). Single-host; BN frozen; best-val npz saved
    like the main loop."""
    from vinet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vinet_tpu.cli.common import build_model, load_weights
    from vinet_tpu.data import ChunkDataset, Loader, device_preprocess
    from vinet_tpu.io.convert import save_npz_tree
    from vinet_tpu.training import LossConfig
    from vinet_tpu.training.streaming_ft import (
        eval_window_starts,
        make_streaming_ft_step,
        make_streaming_eval_step,
        sample_window_starts,
    )
    from vinet_tpu.training.trainer import AverageMeter, adam, init_train_state

    assert not getattr(args, "use_sound", False), \
        "--streaming_ft supports visual-only models (ViNet)"
    if args.grad_accum != 1:
        raise SystemExit("--grad_accum is not supported with --streaming_ft "
                         "(the chunked step already amortizes the backbone; "
                         "scale ft_windows instead)")
    assert args.ft_chunk % 8 == 0 and args.ft_chunk >= args.clip_size
    if not (args.load_weight or args.file_weight):
        print("warning: --streaming_ft without --load_weight fine-tunes "
              "random init with FROZEN BN statistics — this is almost "
              "certainly not what you want", flush=True)

    model = build_model(args)
    loss_cfg = LossConfig(
        kldiv=args.kldiv, cc=args.cc, sim=args.sim, nss=args.nss, l1=args.l1,
        kldiv_coeff=args.kldiv_coeff, cc_coeff=args.cc_coeff,
        sim_coeff=args.sim_coeff, nss_coeff=args.nss_coeff, l1_coeff=args.l1_coeff,
    )
    train_loader = Loader(ChunkDataset(args.train_path_data, args.ft_chunk),
                          batch_size=1, shuffle=True,
                          num_workers=args.no_workers, seed=0)
    val_loader = (Loader(ChunkDataset(args.val_path_data, args.ft_chunk, mode="val"),
                         batch_size=1, shuffle=False,
                         num_workers=args.no_workers, drop_last=False)
                  if args.val_path_data else None)

    optimizer = adam(args.lr)
    ts = init_train_state(model, jax.random.PRNGKey(0), optimizer)
    for w in (args.file_weight, args.load_weight):
        if w:
            params, state = load_weights(w, model, ts["params"], ts["state"])
            ts = dict(ts, params=params, state=state, opt_state=optimizer.init(params))

    step_fn = make_streaming_ft_step(
        model, loss_cfg, optimizer, clip_size=args.clip_size,
        compute_dtype=jnp.bfloat16 if args.bf16 else None)
    eval_fn = make_streaming_eval_step(model, loss_cfg, clip_size=args.clip_size)
    val_starts = jnp.asarray(
        eval_window_starts(args.ft_windows, args.ft_chunk, args.clip_size))

    def to_batch(host, starts):
        chunk = device_preprocess(jnp.asarray(host["clip"]))
        gt = jnp.asarray(host["gts"][0][np.asarray(starts) + args.clip_size - 1],
                         jnp.float32)
        return {"chunk": chunk, "gt": gt, "starts": jnp.asarray(starts)}

    best_loss = float("inf")
    tb = None
    if args.tb_logdir:
        import atexit

        from torch.utils.tensorboard import SummaryWriter

        tb = SummaryWriter(args.tb_logdir)
        atexit.register(tb.flush)  # keep the tail of a crashed run's scalars
    for epoch in range(args.no_epochs):
        tic = time.time()
        rng = np.random.default_rng((1234, epoch))
        total, cur = AverageMeter(), AverageMeter()
        for idx, host in enumerate(train_loader):
            if args.max_steps_per_epoch and idx >= args.max_steps_per_epoch:
                break
            starts = sample_window_starts(
                rng, args.ft_windows, args.ft_chunk, args.clip_size)
            ts, metrics = step_fn(ts, to_batch(host, starts))
            loss = float(metrics["loss"])
            total.update(loss)
            cur.update(loss)
            if idx % args.log_interval == args.log_interval - 1:
                print("[%2d, %5d] avg_loss : %.5f, time:%3f minutes"
                      % (epoch, idx, cur.avg, (time.time() - tic) / 60), flush=True)
                if tb:
                    tb.add_scalar("train/loss", cur.avg, int(ts["step"]))
                    tb.add_scalar("train/grad_norm",
                                  float(metrics["grad_norm"]), int(ts["step"]))
                cur.reset()
        print("[%2d, train] avg_loss : %.5f" % (epoch, total.avg), flush=True)
        if tb:
            tb.add_scalar("train/epoch_loss", total.avg, epoch)

        if val_loader is not None:
            vl, vc, vs = AverageMeter(), AverageMeter(), AverageMeter()
            for host in val_loader:
                m = eval_fn(ts, to_batch(host, val_starts))
                vl.update(float(m["loss"]))
                vc.update(float(m["cc"]))
                vs.update(float(m["sim"]))
            print("[%2d, val] avg_loss : %.5f cc_loss : %.5f sim_loss : %.5f, time : %3f"
                  % (epoch, vl.avg, vc.avg, vs.avg, (time.time() - tic) / 60),
                  flush=True)
            if tb:
                tb.add_scalar("val/loss", vl.avg, epoch)
                tb.add_scalar("val/cc", vc.avg, epoch)
                tb.add_scalar("val/sim", vs.avg, epoch)
            val_loss = vl.avg
        else:
            val_loss = total.avg

        if val_loss <= best_loss:
            best_loss = val_loss
            print("[%2d,  save, %s]" % (epoch, args.model_val_path), flush=True)
            host_ts = jax.device_get(ts)
            save_npz_tree(args.model_val_path, host_ts["params"], host_ts["state"])
    if tb:
        tb.close()
    return 0


def run(args) -> int:
    from vinet_tpu.utils import enable_compilation_cache
    from vinet_tpu.utils.runtime import init_distributed

    if getattr(args, "streaming_ft", False):
        return run_streaming_ft(args)

    enable_compilation_cache()
    rank, world = (init_distributed() if args.multihost else (0, 1))
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vinet_tpu.cli.common import build_model, load_weights
    from vinet_tpu.data import Loader, device_preprocess
    from vinet_tpu.io.checkpoint import latest_step, restore_checkpoint, save_checkpoint
    from vinet_tpu.io.convert import save_npz_tree
    from vinet_tpu.parallel import create_mesh, shard_pytree
    from vinet_tpu.parallel.mesh import shard_batch
    from vinet_tpu.training import LossConfig
    from vinet_tpu.training.trainer import (
        AverageMeter,
        adam,
        init_train_state,
        make_bn_stats_fn,
        make_train_step,
        recalibrate_bn,
    )

    model = build_model(args)
    loss_cfg = LossConfig(
        kldiv=args.kldiv, cc=args.cc, sim=args.sim, nss=args.nss, l1=args.l1,
        kldiv_coeff=args.kldiv_coeff, cc_coeff=args.cc_coeff,
        sim_coeff=args.sim_coeff, nss_coeff=args.nss_coeff, l1_coeff=args.l1_coeff,
    )
    train_ds, val_ds = make_datasets(args)
    train_loader = Loader(train_ds, batch_size=args.batch_size, shuffle=True,
                          num_workers=args.no_workers, seed=0, shard=(rank, world))
    val_loader = (Loader(val_ds, batch_size=1, shuffle=False,
                         num_workers=args.no_workers, drop_last=False) if val_ds else None)

    if args.lr_sched:
        # The reference's --lr_sched path references an undefined scheduler
        # (train.py:293-294 NameError). Here: torch-StepLR-style decay, 0.1x
        # every step_size epochs, expressed as an optax schedule.
        steps_per_epoch = max(1, len(train_loader))
        schedule = optax.exponential_decay(
            args.lr, transition_steps=args.step_size * steps_per_epoch,
            decay_rate=0.1, staircase=True)
        optimizer = optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)
    else:
        optimizer = adam(args.lr)

    ts = init_train_state(model, jax.random.PRNGKey(0), optimizer)
    if args.file_weight:
        params, state = load_weights(args.file_weight, model, ts["params"], ts["state"])
        ts = dict(ts, params=params, state=state, opt_state=optimizer.init(params))
    if args.load_weight:
        params, state = load_weights(args.load_weight, model, ts["params"], ts["state"])
        ts = dict(ts, params=params, state=state, opt_state=optimizer.init(params))
    start_epoch = 0
    if args.resume and args.checkpoint_dir and latest_step(args.checkpoint_dir) is not None:
        ts = restore_checkpoint(args.checkpoint_dir, ts)
        print(f"resumed from step {int(ts['step'])}", flush=True)

    import math

    n_dev = len(jax.devices())
    avail = n_dev // args.model_axis
    if world > 1:
        # the mesh must span every process's devices (a subset mesh would
        # leave some hosts with no addressable shard to feed)
        data_axis = avail
        if (args.batch_size * world) % data_axis:
            raise SystemExit(
                f"global batch {args.batch_size}*{world} not divisible by "
                f"the {data_axis}-way data axis")
    else:
        data_axis = math.gcd(args.batch_size, avail)
    if world > 1 and args.model_axis > 1:
        # rank-0 host saves below do jax.device_get(ts), which requires every
        # shard to be process-addressable; with the model axis spanning
        # processes the params are not, so the first checkpoint would raise
        # mid-run (advisor r4). Fail at startup instead of after an epoch.
        raise SystemExit(
            "--multihost with --model_axis>1 is unsupported: params are "
            "sharded across processes and rank-0 checkpointing cannot "
            "address the full state (no cross-host gather-save implemented); "
            "use --model_axis 1 under --multihost")
    mesh = create_mesh(jax.devices()[: data_axis * args.model_axis], model=args.model_axis)
    if data_axis * args.model_axis < n_dev:
        print(f"using {data_axis * args.model_axis}/{n_dev} devices "
              f"(batch_size {args.batch_size} limits the data axis)", flush=True)
    ts = {
        "params": shard_pytree(ts["params"], mesh),
        "state": shard_pytree(ts["state"], mesh),
        "opt_state": shard_pytree(ts["opt_state"], mesh),
        "step": ts["step"],
        "rng": ts["rng"],  # dropout base key (replicated like step)
    }

    if args.batch_size % args.grad_accum:
        raise SystemExit("--batch_size must be divisible by --grad_accum")
    step_fn = make_train_step(model, loss_cfg, optimizer,
                              compute_dtype=jnp.bfloat16 if args.bf16 else None,
                              grad_accum=args.grad_accum)

    @jax.jit
    def fwd(params, state, clip):
        out, _ = model.apply(params, state, clip)
        return out

    @jax.jit
    def fwd_audio(params, state, clip, audio):
        out, _ = model.apply(params, state, clip, audio)
        return out

    from vinet_tpu.parallel.mesh import batch_sharding, replicate

    def _globalize(x):
        """Assemble this host's batch shard into the global data-sharded
        array: each process loads a DISJOINT slice of the index set
        (Loader shard=(rank, world)), so the global batch is the
        concatenation — batch_size is PER HOST, global = batch_size*world."""
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            batch_sharding(mesh), x, (x.shape[0] * world,) + x.shape[1:])

    def to_device(batch):
        if world == 1:
            out = {"clip": device_preprocess(jnp.asarray(batch["clip"]))}
            out["gt"] = jnp.asarray(batch["gt"], jnp.float32)
            if "audio" in batch:
                out["audio"] = jnp.asarray(batch["audio"], jnp.float32)
            return shard_batch(out, mesh)
        out = {"clip": device_preprocess(_globalize(batch["clip"]))}
        out["gt"] = _globalize(np.asarray(batch["gt"], np.float32))
        if "audio" in batch:
            out["audio"] = _globalize(np.asarray(batch["audio"], np.float32))
        return out

    def _replicated(x, dtype=None):
        """Validation/calibration inputs under multi-host: every process
        walks the SAME deterministic loader, so place the (identical) host
        copy fully replicated — jit then runs one global program in
        lockstep instead of mixing per-host committed arrays with
        global-mesh params."""
        x = np.asarray(x) if dtype is None else np.asarray(x, dtype)
        return jax.device_put(x, replicate(mesh)) if world > 1 else jnp.asarray(x)

    best_loss = float("inf")
    stats_fn = make_bn_stats_fn(model) if args.bn_recal else None
    calib_host = []  # raw host batches cached for BN recalibration
    tb = None
    if args.tb_logdir:
        import atexit

        from torch.utils.tensorboard import SummaryWriter

        tb = SummaryWriter(args.tb_logdir)
        atexit.register(tb.flush)  # keep the tail of a crashed run's scalars
    for epoch in range(start_epoch, args.no_epochs):
        tic = time.time()
        total, cur = AverageMeter(), AverageMeter()
        for idx, batch in enumerate(train_loader):
            if args.max_steps_per_epoch and idx >= args.max_steps_per_epoch:
                break
            if args.bn_recal and len(calib_host) < args.bn_recal:
                calib_host.append({k: np.asarray(v) for k, v in batch.items()
                                   if k in ("clip", "audio")})
            ts, metrics = step_fn(ts, to_device(batch))
            loss = float(metrics["loss"])
            total.update(loss)
            cur.update(loss)
            if idx % args.log_interval == args.log_interval - 1:
                print("[%2d, %5d] avg_loss : %.5f, time:%3f minutes"
                      % (epoch, idx, cur.avg, (time.time() - tic) / 60), flush=True)
                if tb:
                    tb.add_scalar("train/loss", cur.avg, int(ts["step"]))
                    tb.add_scalar("train/grad_norm",
                                  float(metrics["grad_norm"]), int(ts["step"]))
                cur.reset()
        print("[%2d, train] avg_loss : %.5f" % (epoch, total.avg), flush=True)
        if tb:
            tb.add_scalar("train/epoch_loss", total.avg, epoch)

        if args.bn_recal and calib_host:
            # calib batches come from the RANK-SHARDED train loader, so under
            # multi-host each process holds a different slice — globalize them
            # (like train batches) so BN stats are computed over one
            # consistent global batch and the recalibrated state is identical
            # on every host (advisor r4: _replicated would silently diverge)
            def _dev_calib(b):
                if world > 1:
                    out = {"clip": device_preprocess(_globalize(b["clip"]))}
                    if "audio" in b:
                        out["audio"] = _globalize(np.asarray(b["audio"], np.float32))
                else:
                    out = {"clip": device_preprocess(jnp.asarray(b["clip"]))}
                    if "audio" in b:
                        out["audio"] = jnp.asarray(b["audio"], jnp.float32)
                return out

            batches = (_dev_calib(b) for b in calib_host)
            ts = dict(ts, state=recalibrate_bn(
                model, ts["params"], ts["state"], batches, stats_fn=stats_fn))

        if val_loader is not None:
            from vinet_tpu.ops.image import gaussian_blur
            vl, vc, vs = AverageMeter(), AverageMeter(), AverageMeter()
            from vinet_tpu.training.losses import cc as cc_l, similarity as sim_l, loss_func
            for batch in val_loader:
                clip = device_preprocess(_replicated(batch["clip"]))
                if "audio" in batch:
                    pred = fwd_audio(ts["params"], ts["state"], clip,
                                     _replicated(batch["audio"], np.float32))
                else:
                    pred = fwd(ts["params"], ts["state"], clip)
                gt = _replicated(batch["gt"], np.float32)
                # native-res GT: resize pred to GT, blur (reference train.py:251-257)
                pred = jax.image.resize(pred, gt.shape, method="bilinear", antialias=False)
                pred = gaussian_blur(pred)
                vl.update(float(loss_func(pred, gt, loss_cfg)))
                vc.update(float(cc_l(pred, gt)))
                vs.update(float(sim_l(pred, gt)))
            print("[%2d, val] avg_loss : %.5f cc_loss : %.5f sim_loss : %.5f, time : %3f"
                  % (epoch, vl.avg, vc.avg, vs.avg, (time.time() - tic) / 60), flush=True)
            if tb:
                tb.add_scalar("val/loss", vl.avg, epoch)
                tb.add_scalar("val/cc", vc.avg, epoch)
                tb.add_scalar("val/sim", vs.avg, epoch)
            val_loss = vl.avg
        else:
            val_loss = total.avg

        # host-side writes are rank-0 only under multi-host (state is
        # replicated, so rank 0's copy is the global one; every rank
        # writing the same path would race on a shared filesystem)
        if args.checkpoint_dir and rank == 0:
            save_checkpoint(args.checkpoint_dir, jax.device_get(ts))
        if val_loss <= best_loss:
            best_loss = val_loss
            if rank == 0:
                print("[%2d,  save, %s]" % (epoch, args.model_val_path), flush=True)
                host = jax.device_get(ts)
                save_npz_tree(args.model_val_path, host["params"], host["state"])
    if tb:
        tb.close()
    return 0


def main(argv=None):
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    raise SystemExit(main())
