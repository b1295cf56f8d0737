"""Smoke test: scaling-efficiency CLI on the virtual CPU mesh."""

import sys

import pytest


@pytest.mark.slow
def test_scaling_cli_runs(monkeypatch, capsys):
    from petr_tpu.cli import scaling

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "scaling",
            "--config", "tiny_debug",
            "--devices", "1,2",
            "--steps", "2",
            "--warmup", "1",
        ],
    )
    results = scaling.main()
    assert len(results) == 2
    assert results[0]["devices"] == 1 and results[1]["devices"] == 2
    assert results[0]["ms_per_step"] > 0
    assert results[1]["weak_scaling_efficiency"] > 0
