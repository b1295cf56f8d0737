"""Dotted config overrides (capability of mmcv `--cfg-options`,
reference `tools/train.py:68-77`)."""

import subprocess
import sys

import pytest

from petr_tpu.configs import apply_overrides, get_config


def test_scalar_and_nested_overrides():
    cfg = get_config(
        "petr_vov_p4_800x320",
        [
            "model.head.num_query=600",
            "train.optim.lr=1e-4",
            "model.remat=False",
            "model.compute_dtype=float32",
        ],
    )
    assert cfg.model.head.num_query == 600
    assert cfg.train.optim.lr == pytest.approx(1e-4)
    assert cfg.model.remat is False
    assert cfg.model.compute_dtype == "float32"
    # base preset untouched (frozen dataclasses, replace-based)
    base = get_config("petr_vov_p4_800x320")
    assert base.model.head.num_query == 900
    assert base.model.remat is True


def test_tuple_bool_none_coercion():
    cfg = get_config(
        "petr_vov_p4_800x320",
        [
            "data.image_size=(640,1600)",
            "data.rand_flip=false",
            "score_threshold=0.05",
            "train.optim.code_weights=[1,1,1,1,1,1,1,1,1,1]",
        ],
    )
    assert cfg.data.image_size == (640, 1600)
    assert cfg.data.rand_flip is False
    assert cfg.score_threshold == pytest.approx(0.05)
    assert cfg.train.optim.code_weights == (1.0,) * 10
    assert all(isinstance(w, (int, float)) for w in cfg.train.optim.code_weights)


def test_invalid_overrides_raise():
    cfg = get_config("petr_vov_p4_800x320")
    with pytest.raises(KeyError, match="unknown config field"):
        apply_overrides(cfg, ["model.head.nonexistent=1"])
    with pytest.raises(ValueError, match="not of the form"):
        apply_overrides(cfg, ["model.remat"])
    with pytest.raises(TypeError, match="expected"):
        apply_overrides(cfg, ["model.head.num_query=notanumber"])


def test_print_config_cli_applies_overrides():
    out = subprocess.run(
        [
            sys.executable, "-m", "petr_tpu.cli.print_config",
            "--config", "tiny_debug", "--set", "model.head.num_query=64",
        ],
        capture_output=True, text=True, check=True,
    ).stdout
    import json

    cfg = json.loads(out)
    assert cfg["model"]["head"]["num_query"] == 64
