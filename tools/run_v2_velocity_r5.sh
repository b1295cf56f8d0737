#!/bin/bash
# Round-5 v2 velocity recipe (VERDICT r4 item 1): the round-4 8k run's
# velocity head collapsed to v=0 while the overfit probe proved the head
# CAN learn velocity (corr 0.76 at 200 steps) — a recipe problem. The
# diagnosed mechanism: the cosine schedule decayed LR to 4e-5 exactly when
# enough TPs existed to supervise velocity. Changes vs the round-4 run:
#   --min-lr-ratio 1.0   constant 2e-4 after warmup (the probe's regime)
#   vel code_weights 2.0 stronger velocity-dim gradient (ref v2 uses 1.0,
#                        petrv2_vovnet_gridmask_p4_800x320.py:49-53; the
#                        boost is a synth-recipe accelerant, not parity)
#   --probe-velocity     TP-matched pred-std/corr/velerr at every boundary
# 12-view runs are host-OOM-killed by relay-buffer growth (~20 MB/step);
# rc 137 -> resume from the latest eval-boundary checkpoint.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p /root/work
while :; do
  python tools/synth_train_eval.py --config synth_small_v2 --steps 12000 \
    --scenes 84 --val-scenes 6 --no-velocity-hue --eval-every 500 \
    --floor 0.10 --mave-ceiling 1.182 --probe-velocity \
    --lr 2e-4 --min-lr-ratio 1.0 \
    --set 'train.optim.code_weights=(1.0,1.0,1.0,1.0,1.0,1.0,1.0,1.0,2.0,2.0)' \
    --save-ckpt /root/work/synthv2_r5_ckpt --resume \
    --out-dir /tmp/petr_synth_v2 >> /tmp/synth_v2_r5.log 2>&1
  rc=$?
  echo "=== incarnation exited rc=$rc $(date -u +%H:%M:%S)" >> /tmp/synth_v2_r5.log
  if [ "$rc" -eq 137 ]; then continue; fi
  break
done
