"""Every CLI parses --help and rejects missing required args — guards the
whole command surface against import/argparse regressions cheaply."""

import pytest

CLIS = [
    "train",
    "generate_result",
    "generate_result_audio_visual",
    "generate_result_dave",
    "generate_result_hollywood_ucf",
    "generate_theatre",
    "serve",
    "export_checkpoint",
    "diem_val",
    "eval_diem",
    "evaluate_dhf1k",
]


@pytest.mark.parametrize("name", CLIS)
def test_cli_help(name, capsys):
    import importlib

    mod = importlib.import_module(f"vinet_tpu.cli.{name}")
    with pytest.raises(SystemExit) as e:
        mod.build_parser().parse_args(["--help"])
    assert e.value.code == 0
    assert "--" in capsys.readouterr().out


@pytest.mark.parametrize("name", ["generate_result", "eval_diem", "train"])
def test_cli_requires_args(name, capsys):
    import importlib

    mod = importlib.import_module(f"vinet_tpu.cli.{name}")
    with pytest.raises(SystemExit) as e:
        mod.build_parser().parse_args([])
    assert e.value.code != 0


# The reference's train.py knob surface (train.py:21-66) minus the flags
# documented as dropped in docs/MIGRATION.md ("Dropped: ..."). Guards the
# migration guide's central claim: a reference user's command lines keep
# working.
REFERENCE_TRAIN_KNOBS = [
    "no_epochs", "lr", "kldiv", "cc", "nss", "sim", "l1", "lr_sched",
    "kldiv_coeff", "step_size", "cc_coeff", "sim_coeff", "nss_coeff",
    "l1_coeff", "batch_size", "log_interval", "no_workers", "model_val_path",
    "clip_size", "nhead", "num_encoder_layers", "transformer_in_channel",
    "train_path_data", "val_path_data", "load_weight", "num_hier", "dataset",
    "alternate", "split", "use_sound", "use_transformer",
]
DROPPED_TRAIN_KNOBS = [
    "nss_emlnet", "nss_norm", "nss_emlnet_coeff", "nss_norm_coeff",
    "use_vox", "frame_no", "spatial_dim",
    "decoder_upsample", "optim", "num_decoder_layers",
]

# Every dest the reference's parser defines (train.py:21-66), verbatim.
# The kept/dropped split above must partition exactly this set, so drift
# in either direction (a new undocumented drop, or a stale entry) fails.
REFERENCE_TRAIN_PARSER_DESTS = {
    "no_epochs", "lr", "kldiv", "cc", "nss", "sim", "nss_emlnet",
    "nss_norm", "l1", "lr_sched", "optim", "kldiv_coeff", "step_size",
    "cc_coeff", "sim_coeff", "nss_coeff", "nss_emlnet_coeff",
    "nss_norm_coeff", "l1_coeff", "batch_size", "log_interval",
    "no_workers", "model_val_path", "clip_size", "nhead",
    "num_encoder_layers", "num_decoder_layers", "transformer_in_channel",
    "train_path_data", "val_path_data", "decoder_upsample", "frame_no",
    "load_weight", "num_hier", "dataset", "alternate", "spatial_dim",
    "split", "use_sound", "use_transformer", "use_vox",
}


def test_kept_plus_dropped_is_exactly_the_reference_surface():
    kept, dropped = set(REFERENCE_TRAIN_KNOBS), set(DROPPED_TRAIN_KNOBS)
    assert not (kept & dropped), kept & dropped
    assert kept | dropped == REFERENCE_TRAIN_PARSER_DESTS, (
        kept | dropped) ^ REFERENCE_TRAIN_PARSER_DESTS


def _parser_dests(name):
    import importlib

    mod = importlib.import_module(f"vinet_tpu.cli.{name}")
    return {a.dest for a in mod.build_parser()._actions}


def test_train_keeps_reference_knobs():
    dests = _parser_dests("train")
    missing = [k for k in REFERENCE_TRAIN_KNOBS if k not in dests]
    assert not missing, missing
    leaked = [k for k in DROPPED_TRAIN_KNOBS if k in dests]
    assert not leaked, leaked


@pytest.mark.parametrize("name", [
    "generate_result", "generate_result_audio_visual", "generate_result_dave",
    "generate_result_hollywood_ucf", "diem_val",
])
def test_generate_keeps_process_sharding_knobs(name):
    dests = _parser_dests(name)
    assert {"start_idx", "num_parts"} <= dests, dests


def test_train_bools_are_real_booleans():
    """The reference's type=bool parses 'False' as True (SURVEY.md §5
    config footguns); ours must not."""
    import importlib

    mod = importlib.import_module("vinet_tpu.cli.train")
    args = mod.build_parser().parse_args(
        ["--train_path_data", "x", "--use_sound", "False", "--cc", "True"])
    assert args.use_sound is False and args.cc is True
