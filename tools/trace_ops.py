"""Op-level TPU time breakdown via jax.profiler trace (no tensorboard needed).

Captures a trace of the flagship forward, parses the perfetto JSON, and prints
the top ops by accumulated device time.

    python tools/trace_ops.py [config] [backbone|full]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import __graft_entry__ as ge
from petr_tpu.configs import get_config
from petr_tpu.models import PETRDetector
from petr_tpu.models.vovnet import VoVNet


def main():
    cfg_name = sys.argv[1] if len(sys.argv) > 1 else "petr_vov_p4_800x320"
    scope = sys.argv[2] if len(sys.argv) > 2 else "backbone"
    cfg = get_config(cfg_name)
    B, N, H, W = 1, 6, *cfg.data.image_size

    if scope == "backbone":
        model = VoVNet(
            spec=cfg.model.backbone.spec,
            out_indices=cfg.model.backbone.out_indices,
            remat=False,
            dtype=jnp.bfloat16,
        )
        x = jnp.asarray(ge._batch(B, N, H, W, 8)["images"]).reshape(B * N, H, W, 3).astype(jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(0), x)["params"]

        @jax.jit
        def fwd(p, x):
            return jax.tree.map(lambda t: t.sum().astype(jnp.float32), model.apply({"params": p}, x))

        args = (params, x)
    else:
        model = PETRDetector(cfg.model, deterministic=True)
        batch = ge._batch(B, N, H, W, 8)
        variables = model.init(
            jax.random.PRNGKey(0), batch["images"], batch["img2lidar"], batch["img_hw"]
        )

        @jax.jit
        def fwd(p, images, img2lidar, img_hw):
            out = model.apply({"params": p}, images, img2lidar, img_hw)
            return out["cls_logits"].sum().astype(jnp.float32)

        args = (variables["params"], batch["images"], batch["img2lidar"], batch["img_hw"])

    # warmup/compile
    jax.block_until_ready(fwd(*args))
    jax.block_until_ready(fwd(*args))

    trace_dir = "/tmp/petr_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            jax.block_until_ready(fwd(*args))

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace file found under", trace_dir)
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)

    # device-side complete events: sum wall duration per op name
    per_op = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        # TPU op events carry args with hlo fields; host threads we skip by pid name
        name = ev.get("name", "")
        cat = (ev.get("args") or {}).get("l", "") if isinstance(ev.get("args"), dict) else ""
        if not isinstance(ev.get("args"), dict):
            continue
        hlo = ev["args"].get("hlo_op") or ev["args"].get("name") or name
        if "run_id" in ev["args"] or "hlo_op" in ev["args"] or "hlo_module" in ev["args"]:
            key = hlo.split(".")[0]
            per_op[key] += ev["dur"]
            total += ev["dur"]
    if not per_op:
        # fallback: group every X event by name prefix
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                per_op[ev.get("name", "?").split(".")[0]] += ev["dur"]
                total += ev["dur"]

    items = sorted(per_op.items(), key=lambda kv: -kv[1])
    print(f"total accounted device time: {total / 1e3 / 3:.2f} ms/iter over 3 iters")
    for name, dur in items[:40]:
        print(f"{dur / 1e3 / 3:9.3f} ms  {100 * dur / max(total, 1):5.1f}%  {name}")


if __name__ == "__main__":
    main()
