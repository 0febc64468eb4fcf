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
