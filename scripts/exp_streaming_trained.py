"""Streaming-vs-parity accuracy under TRAINED weights on STRUCTURED video.

VERDICT r2 item 1: the 727 maps/s streaming headline's accuracy evidence was a
random-weights/noise-input worst case (full-video CC p50 0.905). This
experiment makes the bound meaningful for the production use case:

  1. `data`  — synthesize a DHF1K-layout moving-blob dataset at the FULL
               224x384 geometry (tests/fixtures.py generator).
  2. `train` — train ViNet clip-32 on it to convergence with the train CLI
               machinery (same path as a real run) -> best-val .npz.
  3. `eval`  — on held-out structured videos (multi-blob, textured moving
               background), emit every frame's map with BOTH predictors at
               production settings (bf16, batch 16, chunk 128) and score the
               streaming maps AS PREDICTIONS against the parity maps as GT:
               CC / SIM / NSS (fixations = parity top-0.2% pixels) per frame.

Run on the TPU (stages are idempotent; artifacts cached under --workdir):
    python scripts/exp_streaming_trained.py --stage all
Prints one JSON line per stage; `eval` also prints a markdown table row for
PARITY.md. Reference semantics being compared:
/root/reference/generate_result.py:58-73 (exact sliding window) vs the
--streaming encoder (vinet_tpu/inference/streaming.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

H, W = 224, 384
CLIP = 32


def make_eval_video(n_frames=256, seed=100):
    """Structured held-out video: two moving blobs (one bright/salient like
    the training distribution, one dim distractor) over a drifting sinusoidal
    background plus noise — content-ful on every frame, unlike the noise
    fixture the round-2 bound used. Returns (frames, gt): gt is the bright
    blob's gaussian (the training-label semantics), so both inference modes
    can also be scored against ground truth."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    frames = np.empty((n_frames, H, W, 3), np.uint8)
    gts = np.empty((n_frames, H, W), np.float32)
    cy, cx = H // 2, W // 5
    dy2, dx2 = 2.0, -1.5
    cy2, cx2 = H // 3, 4 * W // 5
    for f in range(n_frames):
        cy = float(np.clip(cy + rng.integers(-3, 4), 16, H - 16))
        cx = float(np.clip(cx + 1.5 + rng.integers(-1, 2), 16, W - 16))
        if f % 64 == 0:
            dy2, dx2 = -dy2, -dx2
        cy2 = float(np.clip(cy2 + dy2, 16, H - 16))
        cx2 = float(np.clip(cx2 + dx2, 16, W - 16))
        g = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 9.0**2))
        g2 = np.exp(-((yy - cy2) ** 2 + (xx - cx2) ** 2) / (2 * 14.0**2))
        bg = 40 + 25 * np.sin(2 * np.pi * (xx / 64.0 + f / 40.0)) \
            + 15 * np.sin(2 * np.pi * (yy / 48.0 - f / 55.0))
        img = bg[..., None] + rng.integers(0, 30, (H, W, 3))
        img = img + 175.0 * g[..., None] + 60.0 * g2[..., None]
        frames[f] = np.clip(img, 0, 255).astype(np.uint8)
        gts[f] = g.astype(np.float32)
    return frames, gts


def _write_video(vdir, n_frames, rng):
    """One DHF1K-layout video with RANDOMIZED blob dynamics (start, velocity,
    size, brightness) so the model must learn 'track the bright blob' rather
    than memorize per-video trajectories (a failure mode observed with the
    fixed-dynamics tests/fixtures.py generator at this resolution)."""
    from PIL import Image

    os.makedirs(os.path.join(vdir, "images"), exist_ok=True)
    os.makedirs(os.path.join(vdir, "maps"), exist_ok=True)
    os.makedirs(os.path.join(vdir, "fixation"), exist_ok=True)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    cy, cx = rng.uniform(24, H - 24), rng.uniform(24, W - 24)
    vy, vx = rng.uniform(-3, 3), rng.uniform(-3, 3)
    sigma = rng.uniform(6, 16)
    amp = rng.uniform(140, 200)
    for f in range(1, n_frames + 1):
        vy += rng.uniform(-0.7, 0.7)
        vx += rng.uniform(-0.7, 0.7)
        vy, vx = np.clip(vy, -4, 4), np.clip(vx, -4, 4)
        cy += vy
        cx += vx
        if not 16 <= cy <= H - 16:
            vy = -vy
            cy = float(np.clip(cy, 16, H - 16))
        if not 16 <= cx <= W - 16:
            vx = -vx
            cx = float(np.clip(cx, 16, W - 16))
        g = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2))
        img = rng.integers(0, 80, (H, W, 3)).astype(np.float64) + amp * g[..., None]
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            os.path.join(vdir, "images", "%04d.png" % f))
        Image.fromarray((255.0 * g).astype(np.uint8)).save(
            os.path.join(vdir, "maps", "%04d.png" % f))
        fix = np.zeros((H, W), np.uint8)
        fix[int(cy), int(cx)] = 255
        Image.fromarray(fix).save(os.path.join(vdir, "fixation", "%04d.png" % f))


def stage_data(workdir, n_train=96):
    train_dir = os.path.join(workdir, "train_data")
    val_dir = os.path.join(workdir, "val_data")
    if not os.path.isdir(train_dir):
        rng = np.random.default_rng(0)
        for v in range(n_train):
            _write_video(os.path.join(train_dir, "%03d" % (v + 1)), 70, rng)
    if not os.path.isdir(val_dir):
        rng = np.random.default_rng(77000)
        for v in range(4):
            _write_video(os.path.join(val_dir, "%03d" % (v + 1)), 70, rng)
    print(json.dumps({"stage": "data", "train_videos": n_train, "val_videos": 4,
                      "size": [H, W]}), flush=True)


def stage_train(workdir, epochs, bf16=True):
    from vinet_tpu.cli import train as train_cli

    weights = os.path.join(workdir, "vinet_blob_best.npz")
    if os.path.exists(weights):
        print(json.dumps({"stage": "train", "cached": weights}), flush=True)
        return weights
    args = train_cli.build_parser().parse_args([
        "--train_path_data", os.path.join(workdir, "train_data"),
        "--val_path_data", os.path.join(workdir, "val_data"),
        "--no_epochs", str(epochs), "--batch_size", "8",
        "--no_workers", "8", "--log_interval", "2",
        "--model_val_path", weights, "--bn_recal", "8",
    ] + (["--bf16"] if bf16 else []))
    train_cli.run(args)
    print(json.dumps({"stage": "train", "weights": weights}), flush=True)
    return weights


def _predict_all(pred, frames):
    return {i: m for i, m in pred.predict_video(frames)}


def stage_eval(workdir, n_frames, dtype_name, weights=None, label=None):
    import jax.numpy as jnp

    from vinet_tpu.inference import SlidingWindowPredictor
    from vinet_tpu.inference.streaming import StreamingPredictor
    from vinet_tpu.io.convert import load_npz_tree
    from vinet_tpu.metrics.saliency import cc_score, nss_score, similarity_score
    from vinet_tpu.models import ViNet
    from vinet_tpu.utils import enable_compilation_cache

    import jax

    enable_compilation_cache()
    weights = weights or os.path.join(workdir, "vinet_blob_best.npz")
    model = ViNet(num_hier=3, clip_size=CLIP)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = load_npz_tree(weights, params, state)

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    rows = []
    for seed in (100, 101):
        frames, gts = make_eval_video(n_frames=n_frames, seed=seed)
        par = _predict_all(SlidingWindowPredictor(
            model, params, state, clip_size=CLIP, batch=16, dtype=dtype), frames)
        stm = _predict_all(StreamingPredictor(
            model, params, state, clip_size=CLIP, batch=16, chunk=128,
            dtype=dtype), frames)
        assert sorted(par) == sorted(stm) == list(range(n_frames))
        agree, p_gt, s_gt = [], [], []
        for i in range(n_frames):
            p, s, g = par[i], stm[i], gts[i]
            fix = g >= np.quantile(g, 0.999)  # top GT pixels as fixations
            agree.append((cc_score(s, p), similarity_score(s, p)))
            p_gt.append((cc_score(p, g), similarity_score(p, g), nss_score(p, fix)))
            s_gt.append((cc_score(s, g), similarity_score(s, g), nss_score(s, fix)))
        agree, p_gt, s_gt = map(np.asarray, (agree, p_gt, s_gt))
        row = {
            "video_seed": seed,
            # the headline question: does streaming LOSE accuracy vs GT?
            "parity_vs_gt": {"cc": float(p_gt[:, 0].mean()),
                             "sim": float(p_gt[:, 1].mean()),
                             "nss": float(p_gt[:, 2].mean())},
            "streaming_vs_gt": {"cc": float(s_gt[:, 0].mean()),
                                "sim": float(s_gt[:, 1].mean()),
                                "nss": float(s_gt[:, 2].mean())},
            "gt_cc_delta": float(s_gt[:, 0].mean() - p_gt[:, 0].mean()),
            # mode agreement (maps are compact blobs: CC here is
            # hypersensitive to small spatial shifts)
            "agreement_cc_mean": float(agree[:, 0].mean()),
            "agreement_cc_p50": float(np.median(agree[:, 0])),
            "agreement_sim_mean": float(agree[:, 1].mean()),
        }
        rows.append(row)
    out = {"stage": "eval", "dtype": dtype_name, "n_frames": n_frames,
           "geometry": f"clip{CLIP}/{H}x{W}", "videos": rows,
           "weights": os.path.basename(weights), **({"label": label} if label else {})}
    print(json.dumps(out), flush=True)
    print("| video | parity CC/SIM/NSS vs GT | streaming CC/SIM/NSS vs GT "
          "| GT-CC delta | mode agreement CC (SIM) |", flush=True)
    print("|---|---|---|---|---|", flush=True)
    for r in rows:
        p, s = r["parity_vs_gt"], r["streaming_vs_gt"]
        print(f"| seed {r['video_seed']} "
              f"| {p['cc']:.4f} / {p['sim']:.4f} / {p['nss']:.2f} "
              f"| {s['cc']:.4f} / {s['sim']:.4f} / {s['nss']:.2f} "
              f"| {r['gt_cc_delta']:+.4f} "
              f"| {r['agreement_cc_mean']:.4f} ({r['agreement_sim_mean']:.4f}) |",
              flush=True)
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stage", default="all", choices=["data", "train", "eval", "all"])
    p.add_argument("--workdir", default="/tmp/vinet_r3_streamacc")
    p.add_argument("--epochs", type=int, default=16)
    p.add_argument("--eval_frames", type=int, default=256)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    if args.stage in ("data", "all"):
        stage_data(args.workdir)
    if args.stage in ("train", "all"):
        stage_train(args.workdir, args.epochs)
    if args.stage in ("eval", "all"):
        stage_eval(args.workdir, args.eval_frames, args.dtype)


if __name__ == "__main__":
    main()
