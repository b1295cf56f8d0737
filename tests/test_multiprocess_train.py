"""True multi-process SPMD training on localhost (2 processes x 2 CPU devices).

The reference validates multi-node only on a SLURM cluster; here the full
train CLI runs as two coordinated JAX processes over a global (data, model)
pod mesh — cross-process gradient reduction over Gloo, per-process data
sharding (the DistributedSampler replacement), rank-0-only checkpointing.
"""

import json
import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.test_data import make_synth_infos

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cpu_train(tmp_path):
    infos = make_synth_infos(tmp_path, n=8)
    pkl = tmp_path / "infos.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": "synthetic"}}, f)
    work = tmp_path / "work"

    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",  # skip the per-process TPU claim
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=REPO,
    )
    port = _free_port()

    procs = []
    for pid in range(2):
        cmd = [
            sys.executable, "-m", "petr_tpu.cli.train",
            "--config", "tiny_debug", "--infos", str(pkl),
            "--work-dir", str(work), "--max-steps", "2", "--log-every", "1",
            "--batch-size", "4",
            "--coordinator", f"localhost:{port}",
            "--num-processes", "2", "--process-id", str(pid),
        ]
        procs.append(
            subprocess.Popen(
                cmd, env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )

    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    # rank 0 checkpointed and logged; metrics are finite
    ckpts = sorted(os.listdir(work / "ckpts"))
    assert ckpts, "no checkpoint from rank 0"
    recs = [json.loads(l) for l in open(work / "train_log.jsonl")]
    assert recs and all(
        rec["loss"] == rec["loss"] for rec in recs
    ), "non-finite loss in multi-process training"
    # rank 1 stayed quiet on logging (single train_log writer)
    assert "checkpoint saved" not in outs[1]


@pytest.mark.slow
def test_two_process_eval_hook(tmp_path):
    """In-training eval under 2 coordinated processes (EvalHook-under-DDP):
    each decodes its stride of the val split, metrics gathered via
    process_allgather, rank 0 logs full-split val/mAP.

    The val split has 7 samples — NOT divisible by the process count: the
    processes run different numbers of eval steps, which deadlocked when
    the eval step was traced under the ambient pod mesh (its collectives
    had no peers on the extra step). The decode now runs under a local
    mesh (evaluate.py); this test pins both the completion and that the
    multi-process metrics EQUAL a single-process eval of the saved
    checkpoint (each process really contributed its own stride's decodes).
    """
    infos = make_synth_infos(tmp_path, n=6)
    pkl = tmp_path / "infos.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": "synthetic"}}, f)
    val_infos = make_synth_infos(tmp_path, n=7)
    val_pkl = tmp_path / "val_infos.pkl"
    with open(val_pkl, "wb") as f:
        pickle.dump({"infos": val_infos, "metadata": {"version": "synthetic"}}, f)
    work = tmp_path / "work"

    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=REPO,
    )
    port = _free_port()

    procs = []
    for pid in range(2):
        cmd = [
            sys.executable, "-m", "petr_tpu.cli.train",
            "--config", "tiny_debug", "--infos", str(pkl),
            "--work-dir", str(work), "--epochs", "1", "--log-every", "1",
            "--batch-size", "2", "--eval-infos", str(val_pkl),
            "--coordinator", f"localhost:{port}",
            "--num-processes", "2", "--process-id", str(pid),
        ]
        procs.append(
            subprocess.Popen(
                cmd, env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )

    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    recs = [json.loads(l) for l in open(work / "train_log.jsonl")]
    val_recs = [r for r in recs if any(k.startswith("val/") for k in r)]
    assert val_recs and "val/mAP" in val_recs[-1] and "val/NDS" in val_recs[-1]
    assert np.isfinite(val_recs[-1]["val/mAP"])
    # only rank 0 printed the val record
    assert "val/mAP" in outs[0] and "val/mAP" not in outs[1]

    # the 2-process metrics must EQUAL a single-process eval of the saved
    # checkpoint — each process contributed its own stride (a decode that
    # silently used one rank's data for both would differ here)
    import jax

    from petr_tpu.configs import get_config
    from petr_tpu.data.dataset import NuScenesDataset, collate_batch
    from petr_tpu.train.checkpoint import latest_checkpoint, load_params
    from petr_tpu.train.evaluate import evaluate_model
    from petr_tpu.train.train_step import create_train_state

    cfg = get_config("tiny_debug")
    val_ds = NuScenesDataset(val_infos, cfg.data, training=False)
    batch0 = collate_batch([val_ds.get(0), val_ds.get(1)])
    batch0.pop("tokens", None)
    batch0 = {k: jax.numpy.asarray(v) for k, v in batch0.items()}
    params_like = create_train_state(cfg, jax.random.PRNGKey(0), 10, batch0).params
    params = load_params(latest_checkpoint(str(work / "ckpts")), params_like)
    single = evaluate_model(cfg, params, val_ds, batch_size=2)
    for k in ("mAP", "NDS", "mATE"):
        assert abs(single[k] - val_recs[-1][f"val/{k}"]) < 1e-6, (
            k, single[k], val_recs[-1][f"val/{k}"])
