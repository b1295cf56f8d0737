#!/bin/bash
# Sequential on-chip family-validation runs (one TPU python process at a
# time — sitecustomize serializes on the chip claim). Each run trains a
# family preset on the synthetic harness and scores held-out scenes.
# Logs to /tmp/synth_<family>.log; exit codes recorded in the summary.
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

echo "=== roofline: $(date -u +%H:%M:%S)"
python tools/roofline_vov.py > /tmp/roofline_anchors.log 2>&1
echo "=== roofline done rc=$? $(date -u +%H:%M:%S)"
tail -8 /tmp/roofline_anchors.log

run r50dcn --config synth_small_r50dcn --steps 4000 --scenes 84 --val-scenes 6 \
    --eval-every 2000 --floor 0.05 --out-dir /tmp/petr_synth_r50dcn

run depthr --config synth_small_depthr --steps 4000 --scenes 84 --val-scenes 6 \
    --eval-every 2000 --floor 0.05 --out-dir /tmp/petr_synth_depthr
