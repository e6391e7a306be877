#!/bin/sh
# Round-5 serialized TPU training queue (one chip, one CPU core — jobs
# must never overlap). Logs to /root/runs/r5_queue.log; each job also logs
# to its own file. Covers VERDICT r4 tasks 2 (runway topology), 4 (3-seed
# median: /root/runs/sup_std is the pinned recipe at SEED=1, re-validated
# separately), 6 (sup_std revalidation) and 7 (from-scratch STOP at
# saturating coverage).
set -x
cd /root/repo

LOG=/root/runs/r5_queue.log
echo "=== r5 queue start $(date)" >> "$LOG"

# (task 6) Re-validate the pre-guard sup_std warm start, full test set.
timeout 2400 python scripts/eval_checkpoint.py /root/runs/sup_std/r3_sup_yolox-s \
  --ckpt best > /root/runs/eval_sup_std_best.log 2>&1
echo "eval_sup_std done rc=$? $(date)" >> "$LOG"

# (task 2) Runway-topology supervised flagship (yolox-s pairing).
DATASET_DIR=/root/toyds_runway SEED=1 timeout 7200 \
  sh scripts/run_sup_flagship.sh /root/runs/sup_rw yolox-s \
  > /root/runs/sup_rw.log 2>&1
echo "sup_rw done rc=$? $(date)" >> "$LOG"

# (task 2) Runway-topology RL STOP fine-tune.
DATASET_DIR=/root/toyds_runway timeout 5400 \
  sh scripts/run_rl_finetune_stop.sh /root/runs/rlft_rw \
  /root/runs/sup_rw/r3_sup_yolox-s yolox-s \
  > /root/runs/rlft_rw.log 2>&1
echo "rlft_rw done rc=$? $(date)" >> "$LOG"

# (task 4) 3-seed median protocol, seeds 2 and 3 (seed 1 = sup_std).
SEED=2 timeout 7200 sh scripts/run_sup_flagship.sh /root/runs/sup_s2 yolox-s \
  > /root/runs/sup_s2.log 2>&1
echo "sup_s2 done rc=$? $(date)" >> "$LOG"
SEED=3 timeout 7200 sh scripts/run_sup_flagship.sh /root/runs/sup_s3 yolox-s \
  > /root/runs/sup_s3.log 2>&1
echo "sup_s3 done rc=$? $(date)" >> "$LOG"

# (task 7) From-scratch STOP at saturating coverage: 3x4 grid arena.
DATASET_DIR=/root/toyds_grid34 timeout 7200 \
  sh scripts/run_rl_scratch_stop.sh /root/runs/rl_scratch_g34 30000 0.02 \
  > /root/runs/rl_scratch_g34.log 2>&1
echo "rl_scratch_g34 done rc=$? $(date)" >> "$LOG"

echo "=== r5 queue END $(date)" >> "$LOG"
