"""Export trained weights as a reference-compatible torch .pt state_dict.

Closes the interop loop: models trained/fine-tuned on TPU (orbax train-state
dirs or .npz trees) become checkpoints the reference's torch classes load
strictly (naming per /root/reference/model.py; its loader train.py:141-179).

    python -m vinet_tpu.cli.export_checkpoint \
        --checkpoint_dir ckpts/ --output vinet_tpu_export.pt
    python -m vinet_tpu.cli.export_checkpoint \
        --file_weight weights.npz --use_sound True --output avinet.pt
"""

from __future__ import annotations

import argparse

import jax

from vinet_tpu.cli.common import add_model_args, build_model, load_weights


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    p.add_argument("--checkpoint_dir", type=str, default=None,
                   help="orbax train-state dir (as written by cli.train)")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step to export (default: latest)")
    p.add_argument("--file_weight", type=str, default=None,
                   help=".npz tree or torch .pt to re-export instead")
    p.add_argument("--output", type=str, required=True, help="output .pt path")
    return p


def main(argv=None):
    p = build_parser()
    args = p.parse_args(argv)
    if bool(args.checkpoint_dir) == bool(args.file_weight):
        p.error("exactly one of --checkpoint_dir / --file_weight is required")

    model = build_model(args)
    params, state = model.init(jax.random.PRNGKey(0))
    if args.file_weight:
        params, state = load_weights(args.file_weight, model, params, state)
    else:
        from vinet_tpu.io.checkpoint import restore_raw

        ts = restore_raw(args.checkpoint_dir, step=args.step)
        # the restored tree must match the BUILT model's structure — otherwise
        # the export silently reflects the wrong flags (e.g. a use_transformer
        # checkpoint exported without --use_transformer would drop the
        # synthesized pos_encoder.pe and fail the reference's strict load)
        want = jax.tree_util.tree_structure(params)
        got = jax.tree_util.tree_structure(ts["params"])
        if want != got:
            p.error("checkpoint params do not match the model built from the "
                    "given flags (--use_sound/--use_transformer/--clip_size "
                    f"...): model {want} vs checkpoint {got}")
        params, state = ts["params"], ts["state"]

    from vinet_tpu.io.export import export_torch_checkpoint

    export_torch_checkpoint(args.output, model, params, state)
    n = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    print(f"exported {n} params to {args.output}")


if __name__ == "__main__":
    main()
