"""Does streaming-consistent fine-tuning recover --streaming's accuracy?

Round-3 follow-up to scripts/exp_streaming_trained.py, which established the
honest negative: a parity-trained model loses CC 0.80 -> 0.53 when served
through the --streaming encoder (train/test mismatch at window edges).
training/streaming_ft.py trains THROUGH the streaming forward; this
experiment measures whether that closes the gap:

  1. `ft`   — fine-tune the cached parity-trained fixture checkpoint with
              `train.py --streaming_ft` (chunk 64, 16 windows/step, bf16)
              on the same blob dataset -> ft .npz.
  2. `eval` — re-run the exp_streaming_trained eval (2 held-out structured
              videos, 256 frames, full clip-32/224x384, production
              settings) with the FT weights: report parity-vs-GT and
              streaming-vs-GT for the SAME checkpoint, plus the base
              checkpoint numbers for reference.

Success criterion: streaming-vs-GT CC with FT weights ~= parity-vs-GT CC
with base weights (the fine-tune must not materially degrade parity mode
either — both numbers are printed and recorded).

Run on the TPU:  python scripts/exp_streaming_ft.py --stage all
(idempotent; artifacts under --workdir, shared with exp_streaming_trained)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import exp_streaming_trained as base_exp


def stage_ft(workdir, *, epochs, lr, chunk, windows):
    from vinet_tpu.cli import train as train_cli

    base_w = os.path.join(workdir, "vinet_blob_best.npz")
    assert os.path.exists(base_w), (
        f"{base_w} missing — run exp_streaming_trained.py --stage all first")
    ft_w = os.path.join(workdir, "vinet_blob_streamft.npz")
    if os.path.exists(ft_w):
        print(json.dumps({"stage": "ft", "cached": ft_w}), flush=True)
        return ft_w
    args = train_cli.build_parser().parse_args([
        "--train_path_data", os.path.join(workdir, "train_data"),
        "--val_path_data", os.path.join(workdir, "val_data"),
        "--no_epochs", str(epochs), "--lr", str(lr),
        "--no_workers", "8", "--log_interval", "8",
        "--streaming_ft", "--ft_chunk", str(chunk),
        "--ft_windows", str(windows),
        "--load_weight", base_w, "--model_val_path", ft_w, "--bf16",
    ])
    rc = train_cli.run(args)
    assert rc == 0 and os.path.exists(ft_w)
    print(json.dumps({"stage": "ft", "weights": ft_w, "epochs": epochs,
                      "lr": lr, "chunk": chunk, "windows": windows}), flush=True)
    return ft_w


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stage", default="all", choices=["ft", "eval", "all"])
    p.add_argument("--workdir", default="/tmp/vinet_r3_streamacc")
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--ft_chunk", type=int, default=64)
    p.add_argument("--ft_windows", type=int, default=16)
    p.add_argument("--eval_frames", type=int, default=256)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--with_base_eval", action="store_true",
                   help="also re-run the eval with the BASE checkpoint")
    args = p.parse_args()
    if args.stage in ("ft", "all"):
        stage_ft(args.workdir, epochs=args.epochs, lr=args.lr,
                 chunk=args.ft_chunk, windows=args.ft_windows)
    if args.stage in ("eval", "all"):
        ft_w = os.path.join(args.workdir, "vinet_blob_streamft.npz")
        base_exp.stage_eval(args.workdir, args.eval_frames, args.dtype,
                            weights=ft_w, label="streaming-ft")
        if args.with_base_eval:
            base_exp.stage_eval(args.workdir, args.eval_frames, args.dtype,
                                label="base")


if __name__ == "__main__":
    main()
