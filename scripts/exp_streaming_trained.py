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

from vinet_tpu.data.synthetic import (  # noqa: E402
    H, W, build_blob_dataset, make_eval_video, write_blob_video)

CLIP = 32

_write_video = write_blob_video  # back-compat alias for exp_streaming_ft


def stage_data(workdir, n_train=96):
    build_blob_dataset(workdir, n_train=n_train)
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
