#!/bin/bash
# Sequential on-chip family-validation runs (one TPU python process at a
# time — sitecustomize serializes on the chip claim). Each run trains a
# family preset on the synthetic harness and scores held-out scenes.
# Logs to /tmp/synth_<family>.log; exit codes recorded in the summary.
#
# Floors are pinned at the round-3/4 measured anchors (README "Synthetic
# end-to-end training validation" table):
#   v1_nohue  — single-frame baseline on motion-only data: mAP >= 0.10;
#               its held-out mAVE 1.182 is the TEMPORAL floor below.
#   v2        — PETRv2 2-frame temporal (f32, the regime synth_small_v2
#               pins — see the preset's comment): mAP >= 0.10 AND
#               mAVE < 1.182 (beats the single-frame velocity floor —
#               the with_time pathway actually trains,
#               reference petrv2_head.py:499-521).
#   r50dcn    — Pallas DCN custom VJP at real step counts: mAP >= 0.05.
#   depthr    — depth-guided decoder (GT-depth oracle): mAP >= 0.05.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $(date -u +%H:%M:%S) $*"
  python tools/synth_train_eval.py "$@" > "/tmp/synth_${name}.log" 2>&1
  echo "=== $name done rc=$? $(date -u +%H:%M:%S)"
  tail -3 "/tmp/synth_${name}.log"
}

run v1_nohue --config synth_small --steps 6000 --scenes 84 --val-scenes 6 \
    --no-velocity-hue --eval-every 4000 --floor 0.10 \
    --save-ckpt /root/work/synthv1_ckpt --out-dir /tmp/petr_synth_nohue_v1

# measured round 4 (8k steps, cosine to 4e-5): mAP 0.3129 / NDS 0.3078
# (2.0x the single-frame row) but mAVE 1.504 — the velocity head
# converged to v=0 under the decayed LR. The round-5 recipe holds LR
# constant after warmup (--min-lr-ratio 1.0, the overfit probe's regime)
# and doubles the velocity code weights (tools/run_v2_velocity_r5.sh is
# the OOM-restart-looped launcher for this row).
# 12-view runs are host-OOM-killed by relay-buffer growth near ~4.8k
# steps: run under an OOM-restart loop (rc 137 -> rerun; --resume picks
# up the latest eval-boundary checkpoint).
run v2 --config synth_small_v2 --steps 12000 --scenes 84 --val-scenes 6 \
    --no-velocity-hue --eval-every 500 --floor 0.10 --mave-ceiling 1.182 \
    --probe-velocity --lr 2e-4 --min-lr-ratio 1.0 \
    --set 'train.optim.code_weights=(1.0,1.0,1.0,1.0,1.0,1.0,1.0,1.0,2.0,2.0)' \
    --save-ckpt /root/work/synthv2_ckpt --resume --out-dir /tmp/petr_synth_v2

# measured round 5: PASSED at 8k steps — held-out mAP 0.128 (floor 0.05),
# bf16, zero nonfinite steps; the 4-6k floor crossing matches the V-39
# baseline's curve (mAP 0.001 @ 4k -> 0.056 @ 6k -> 0.128 @ 8k).
run r50dcn --config synth_small_r50dcn --steps 8000 --scenes 84 --val-scenes 6 \
    --eval-every 2000 --floor 0.05 \
    --save-ckpt /root/work/synthr50_ckpt --resume --out-dir /tmp/petr_synth_r50dcn

# measured round 5: PASSED at 8k steps — held-out mAP 0.079 (floor 0.05);
# curve 0.005 @ 4k -> 0.047 @ 6k -> 0.079 @ 8k.
run depthr --config synth_small_depthr --steps 8000 --scenes 84 --val-scenes 6 \
    --eval-every 2000 --floor 0.05 \
    --save-ckpt /root/work/synthdepthr_ckpt --resume --out-dir /tmp/petr_synth_depthr
