"""DAVE-fold-list AV inference (reference: generate_result_dave.py).

Identical to generate_result_audio_visual except the video list + fps come
from a DAVE-style {video: fps} json (reference read_sal_text_dave,
dataloader.py:25-34) instead of a STAViS fold-list txt.

Usage:
  python -m vinet_tpu.cli.generate_result_dave --path_data ROOT \
      --dataset DIEM --fps_json DIEM_fps_map.json \
      --file_weight AViNet_DIEM.pt --save_path OUT --use_sound True
"""

from __future__ import annotations

from vinet_tpu.cli.generate_result_audio_visual import build_parser, run


def main(argv=None):
    parser = build_parser()
    parser.description = __doc__
    args = parser.parse_args(argv)
    if not args.fps_json:
        parser.error("--fps_json is required for the DAVE variant")
    return run(args)


if __name__ == "__main__":
    raise SystemExit(main())
