"""Shared CLI plumbing: proper boolean flags, model builders, weight loading.

Keeps the reference's knob names for discoverability (SURVEY.md §5 config),
but with real booleans — the reference's `type=bool` flags parse any non-empty
string as True (/root/reference/train.py:24-31, a documented footgun we don't
inherit) — and no hardcoded cluster paths as defaults.
"""

from __future__ import annotations

import argparse

import jax


def str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("true", "1", "yes", "y"):
        return True
    if v.lower() in ("false", "0", "no", "n"):
        return False
    raise argparse.ArgumentTypeError(f"boolean expected, got {v!r}")


def add_bool_flag(parser, name, default):
    parser.add_argument(f"--{name}", type=str2bool, default=default, metavar="BOOL")


def add_model_args(parser):
    parser.add_argument("--clip_size", type=int, default=32)
    parser.add_argument("--num_hier", type=int, default=3)
    parser.add_argument("--nhead", type=int, default=4)
    parser.add_argument("--num_encoder_layers", type=int, default=3)
    parser.add_argument("--transformer_in_channel", type=int, default=32)
    add_bool_flag(parser, "use_sound", False)
    add_bool_flag(parser, "use_transformer", False)
    parser.add_argument("--input_h", type=int, default=224,
                        help="model input height (reference fixed 224)")
    parser.add_argument("--input_w", type=int, default=384,
                        help="model input width (reference fixed 384)")


def build_model(args):
    from vinet_tpu.models import AViNet, ViNet

    if getattr(args, "use_sound", False):
        return AViNet(
            use_transformer=args.use_transformer,
            transformer_in_channel=args.transformer_in_channel,
            num_encoder_layers=args.num_encoder_layers,
            nhead=args.nhead,
            num_hier=args.num_hier,
            clip_size=args.clip_size,
            input_hw=(args.input_h, args.input_w),
        )
    return ViNet(num_hier=args.num_hier, clip_size=args.clip_size)


def model_input_size(args) -> tuple:
    return (getattr(args, "input_h", 224), getattr(args, "input_w", 384))


def load_weights(path: str, model, params, state):
    """Load model weights from either a converted .npz (vinet_tpu format) or a
    torch .pt state_dict (converted on the fly).

    The reference uses the literal string "None" as --load_weight's no-weights
    sentinel (/root/reference/train.py:56); reference command lines pass it
    explicitly, so treat it (and "") as "load nothing" rather than a path."""
    if path in (None, "", "None"):
        return params, state
    if path.endswith(".npz"):
        from vinet_tpu.io.convert import load_npz_tree

        return load_npz_tree(path, params, state)
    from vinet_tpu.io.convert import convert_torch_checkpoint

    return convert_torch_checkpoint(path, model, params, state)


def shard_video_list(names: list, start_idx: int, num_parts: int) -> list:
    """The reference's manual process-level sharding
    (/root/reference/generate_result.py:44-46): part `start_idx` (1-based) of
    `num_parts`."""
    if start_idx == -1:
        return names
    ln = (1.0 / num_parts) * len(names)
    return names[int((start_idx - 1) * ln) : int(start_idx * ln)]
