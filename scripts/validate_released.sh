#!/usr/bin/env bash
# Released-checkpoint validation runbook (VERDICT r2 "missing #1").
#
# This container has ZERO egress, so the released PyTorch checkpoints have
# never been loaded here; conversion is exercised against structurally
# identical state_dicts (tests/torch_ref.py). The moment this repo runs on a
# host with network access, THIS script closes the gap end-to-end: download
# the released weights + DHF1K validation data, convert on the fly, dump
# maps in reference-exact parity mode, and score CC/SIM/NSS/AUC-J.
#
# Sources (reference README.md:40-49,85):
#   * ViNet/AViNet checkpoints: the OneDrive bundle linked at README.md:49
#     (contains ViNet_DHF1K.pt, AViNet_DIEM.pt, ... and soundnet8_final.pth)
#   * S3D Kinetics-400 init: the OneDrive link at README.md:85
#   * DHF1K (incl. the 100 annotated val videos 601-700): the Google Drive
#     folder at README.md:40 (gdown the folder, or place it manually)
# OneDrive/Drive links need an interactive browser or gdown/rclone auth —
# set the env vars below to wherever you staged the files.
#
# Usage:
#   VINET_CKPT=path/to/ViNet_DHF1K.pt DHF1K_VAL=path/to/DHF1K/val \
#       bash scripts/validate_released.sh [outdir]
#
# Pass/fail guidance: the paper's DHF1K *test* numbers (arXiv:2012.06170)
# are AUC-J 0.908 / SIM 0.381 / CC 0.511 / NSS 2.87. Val-split numbers are
# typically a little higher; treat CC within ~0.03 of 0.52 as conversion
# parity, and anything below 0.45 as a conversion bug (start bisecting with
# tests/test_convert.py's per-stage activation harness).
set -euo pipefail

VINET_CKPT=${VINET_CKPT:?set VINET_CKPT=path/to/ViNet_DHF1K.pt}
DHF1K_VAL=${DHF1K_VAL:?set DHF1K_VAL=path/to/DHF1K/val (video dirs with images/ + maps/ + fixation/)}
OUT=${1:-/tmp/vinet_released_val}
# Dry-run knobs (tests/test_runbook.py exercises the whole runbook offline
# against a torch_ref-generated .pt + synthetic val dir): CLIP_SIZE shrinks
# the model variant, GEN_ARGS passes extra generate flags (e.g. CPU dtype).
# Leave both unset for the real released-checkpoint run.
CLIP_SIZE=${CLIP_SIZE:-32}
GEN_ARGS=${GEN_ARGS:-}
cd "$(dirname "$0")/.."

echo "== 1/3 parity-mode map generation (reference-exact sliding window) =="
python -m vinet_tpu.cli.generate_result \
    --file_weight "$VINET_CKPT" --path_indata "$DHF1K_VAL" \
    --save_path "$OUT/maps" --exact_quantize --clip_size "$CLIP_SIZE" $GEN_ARGS

echo "== 2/3 score vs DHF1K val ground truth =="
python -m vinet_tpu.cli.evaluate_dhf1k \
    --pred_path "$OUT/maps" --gt_path "$DHF1K_VAL" \
    --metrics cc,sim,nss,aucj | tee "$OUT/scores_parity.txt"

echo "== 3/3 (optional) streaming mode on the same checkpoint =="
echo "   NOTE: expected to score BELOW parity unless the checkpoint was"
echo "   fine-tuned with train.py --streaming_ft (NOTES.md round 3)."
python -m vinet_tpu.cli.generate_result \
    --file_weight "$VINET_CKPT" --path_indata "$DHF1K_VAL" \
    --save_path "$OUT/maps_streaming" --streaming --clip_size "$CLIP_SIZE" $GEN_ARGS
python -m vinet_tpu.cli.evaluate_dhf1k \
    --pred_path "$OUT/maps_streaming" --gt_path "$DHF1K_VAL" \
    --metrics cc,sim,nss,aucj | tee "$OUT/scores_streaming.txt"

echo "done — compare $OUT/scores_parity.txt against the paper envelope above"
