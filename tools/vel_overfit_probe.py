"""One-batch velocity overfit probe: does the v2 velocity head EVER move off
the degenerate v=0 solution, given an unconstrained LR budget?

Structural-vs-recipe discriminator (round 4): trains `tiny_debug_v2` on ONE
real 2-frame batch at constant lr 5e-4 and prints TP-matched pred-vel std /
corr / error every 200 steps. If velocity learns here (round-4 measurement:
pred std 0.82, corr_vx 0.76, velerr beating the zero baseline by step 200)
but not in a full run, the full run's failure is recipe (LR decay / budget /
loss balance), not architecture — which is what made round 5's fix a
targeted LR-floor change rather than a head redesign.

    python tools/vel_overfit_probe.py          # ~10 min on the chip
"""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from petr_tpu.configs import get_config
from petr_tpu.data import Loader, NuScenesDataset
from petr_tpu.data.synthetic import generate_synthetic_scenes
from petr_tpu.train import create_train_state, make_eval_step, make_train_step

OUT = "/tmp/petr_synth_velprobe"
splits = generate_synthetic_scenes(OUT, n_scenes=2, frames_per_scene=3,
                                   image_hw=(64, 160), n_objects=4,
                                   val_scenes=0, seed=2, velocity_hue=False)
cfg = get_config("tiny_debug_v2")
dcfg = dataclasses.replace(cfg.data, image_size=(64, 160), final_dim=(64, 160),
                           src_hw=(64, 160), resize_lim=(1.0, 1.0), max_gt=8,
                           rand_flip=False, bev_rot_range=(0.0, 0.0),
                           bev_scale_range=(1.0, 1.0))
ocfg = dataclasses.replace(cfg.train.optim, lr=5e-4, warmup_iters=10,
                           min_lr_ratio=1.0, backbone_lr_mult=1.0)
c = dataclasses.replace(cfg, data=dcfg,
                        model=dataclasses.replace(cfg.model, use_grid_mask=False),
                        train=dataclasses.replace(cfg.train, optim=ocfg))
ds = NuScenesDataset(splits["train"], c.data, training=True, src_hw=(64, 160))
loader = Loader(ds, 4, seed=0)
batch = next(iter(loader.epoch(0)))
batch.pop("tokens")
jb = {k: jnp.asarray(v) for k, v in batch.items()}
gt = np.asarray(jb["gt_boxes"])
gm = np.asarray(jb["gt_valid"])
print("GT |v| mean:", float(np.linalg.norm(gt[gm][:, 7:9], axis=-1).mean()),
      flush=True)

state = create_train_state(c, jax.random.PRNGKey(0), 2000, jb)
step = jax.jit(make_train_step(c))
es = jax.jit(make_eval_step(c))
rng = jax.random.PRNGKey(1)
t0 = time.time()
for i in range(2001):
    state, m = step(state, jb, rng)
    if i % 200 == 0:
        det = jax.device_get(es(state.params, jb))
        pv, gv = [], []
        for b in range(4):
            keep = det["scores"][b] > 0.1
            if not keep.any():
                continue
            for g in gt[b][gm[b]]:
                d = np.linalg.norm(det["boxes"][b][keep][:, :2] - g[:2], axis=-1)
                j = d.argmin()
                if d[j] < 2.0:
                    pv.append(det["boxes"][b][keep][j, 7:9])
                    gv.append(g[7:9])
        pv, gv = np.asarray(pv), np.asarray(gv)
        if len(pv) > 2:
            err = np.linalg.norm(pv - gv, axis=-1).mean()
            z = np.linalg.norm(gv, axis=-1).mean()
            cx = (np.corrcoef(pv[:, 0], gv[:, 0])[0, 1]
                  if pv[:, 0].std() > 1e-6 else 0.0)
            print(f"step {i}: loss {float(m['loss']):.3f} TPs {len(pv)} "
                  f"velerr {err:.3f} (zero-baseline {z:.3f}) predstd "
                  f"{pv.std():.3f} corrx {cx:.2f} [{time.time()-t0:.0f}s]",
                  flush=True)
        else:
            print(f"step {i}: loss {float(m['loss']):.3f} TPs {len(pv)}",
                  flush=True)
