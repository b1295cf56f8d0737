"""Full CLI round trip on synthetic data: create infos -> train (2 steps,
checkpoint) -> resume -> evaluate (metrics + submission json).

This is the framework-level integration test the reference ecosystem lacks
(SURVEY.md §4): it drives `cli.train` and `cli.test` exactly as a user would,
through real on-disk images, the loader, the jitted train step, orbax
checkpointing and the self-contained nuScenes evaluator.
"""

import json
import os
import pickle
import sys

import numpy as np
import pytest

from tests.test_data import make_synth_infos


@pytest.mark.slow
def test_train_then_eval_cli(tmp_path, monkeypatch, capsys):
    from petr_tpu.cli import test as test_cli
    from petr_tpu.cli import train as train_cli

    infos = make_synth_infos(tmp_path, n=4)
    pkl = tmp_path / "infos.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": "synthetic"}}, f)

    work = tmp_path / "work"
    monkeypatch.setattr(
        sys, "argv",
        ["train", "--config", "tiny_debug", "--infos", str(pkl),
         "--work-dir", str(work), "--max-steps", "2", "--log-every", "1",
         "--batch-size", "2", "--tensorboard"],
    )
    train_cli.main()
    ckpts = sorted(os.listdir(work / "ckpts"))
    assert ckpts, "no checkpoint written"
    assert (work / "train_log.jsonl").exists()
    tb_dir = work / "tb"
    if tb_dir.exists():  # tensorboard is optional; when present, events land
        assert any(f.startswith("events") for f in os.listdir(tb_dir))
    meta = json.load(open(work / "ckpts" / ckpts[-1] / "meta.json"))
    assert meta["config"]["name"] == "tiny_debug"

    # resume path: one more step from the saved state
    monkeypatch.setattr(
        sys, "argv",
        ["train", "--config", "tiny_debug", "--infos", str(pkl),
         "--work-dir", str(work), "--max-steps", "3", "--log-every", "1",
         "--batch-size", "2", "--resume"],
    )
    train_cli.main()
    out = capsys.readouterr().out
    assert "resumed from" in out

    sub = tmp_path / "submission.json"
    monkeypatch.setattr(
        sys, "argv",
        ["test", "--config", "tiny_debug", "--infos", str(pkl),
         "--ckpt", str(work / "ckpts" / ckpts[-1]), "--out", str(sub)],
    )
    test_cli.main()
    out = capsys.readouterr().out
    assert "mAP:" in out and "NDS:" in out

    payload = json.load(open(sub))
    assert payload["meta"]["use_camera"] is True
    assert len(payload["results"]) == 4
    det = next(iter(payload["results"].values()))[0]
    assert set(det) >= {"translation", "size", "rotation", "velocity",
                        "detection_name", "detection_score"}

    # in-training evaluation (mmcv EvalHook capability): one full epoch
    # then a val pass whose metrics land in the train log with val/ keys
    work2 = tmp_path / "work_eval"
    monkeypatch.setattr(
        sys, "argv",
        ["train", "--config", "tiny_debug", "--infos", str(pkl),
         "--work-dir", str(work2), "--epochs", "1", "--log-every", "1",
         "--batch-size", "2", "--eval-infos", str(pkl)],
    )
    train_cli.main()
    capsys.readouterr()
    recs = [json.loads(l) for l in open(work2 / "train_log.jsonl")]
    val_recs = [r for r in recs if any(k.startswith("val/") for k in r)]
    assert val_recs and "val/mAP" in val_recs[-1]
