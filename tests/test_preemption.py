"""Preemption-safe training: SIGTERM mid-run -> checkpoint at the step
boundary -> clean exit -> resume continues from the saved step.

TPU pods deliver SIGTERM on maintenance/preemption; the reference only has
manual `resume_from` (SURVEY.md §5 "failure detection: none").
"""

import json
import os
import pickle
import signal
import subprocess
import sys
import time

import pytest

from tests.test_data import make_synth_infos


@pytest.mark.slow
def test_sigterm_checkpoints_and_resumes(tmp_path):
    infos = make_synth_infos(tmp_path, n=4)
    pkl = tmp_path / "infos.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": "synthetic"}}, f)
    work = tmp_path / "work"

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [
        sys.executable, "-m", "petr_tpu.cli.train",
        "--config", "tiny_debug", "--infos", str(pkl), "--work-dir", str(work),
        "--batch-size", "2", "--log-every", "1", "--epochs", "1000",
    ]
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd="/root/repo",
    )
    # wait until at least one optimizer step has logged, then preempt
    lines = []
    deadline = time.time() + 600
    stepped = False
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            break
        lines.append(line)
        if '"step"' in line:
            stepped = True
            break
    assert stepped, "no training step logged before timeout:\n" + "".join(lines)
    proc.send_signal(signal.SIGTERM)
    rest, _ = proc.communicate(timeout=300)
    lines.append(rest)
    out = "".join(lines)
    assert proc.returncode == 0, f"non-zero exit after SIGTERM:\n{out}"
    assert "exiting on signal" in out
    ckpts = sorted(os.listdir(work / "ckpts"))
    assert ckpts, "no checkpoint written on preemption"

    # resume picks up from the saved step
    out2 = subprocess.run(
        cmd + ["--resume", "--max-steps", "2"],
        capture_output=True, text=True, timeout=600, env=env, cwd="/root/repo",
    )
    assert out2.returncode == 0, out2.stdout + out2.stderr
    assert "resumed from" in out2.stdout
