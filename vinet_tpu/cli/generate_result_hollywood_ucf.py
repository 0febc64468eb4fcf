"""Hollywood-2 / UCF-Sports inference (reference: generate_result_hollywood_ucf.py).

Identical to generate_result except videos shorter than 2*clip_size-1 frames
are left-padded by repeating the first frame instead of skipped
(reference :55-62); provided as its own command for flag-compatibility.

Usage:
  python -m vinet_tpu.cli.generate_result_hollywood_ucf --path_indata DIR \
      --save_path OUT --file_weight ViNet_Hollywood.pt
"""

from __future__ import annotations

from vinet_tpu.cli.generate_result import build_parser, run


def main(argv=None):
    parser = build_parser()
    parser.description = __doc__
    args = parser.parse_args(argv)
    args.pad_short = True
    return run(args)


if __name__ == "__main__":
    raise SystemExit(main())
