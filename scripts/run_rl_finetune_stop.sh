#!/bin/sh
# REINFORCE STOP fine-tune of a supervised flagship checkpoint (round-2
# verdict item 1, logged 2026-08-19 in docs/experiment_log.md): warm-start
# from the 20k supervised run via --init-from, enable STOP, stretch the
# episode to 20 steps (sinusoidal sequence positions make the ep-8
# supervised params load cleanly; at ep-len <= 8 the step-cost saving from
# stopping is too small for STOP to ever pay, and stop_used stays 0).
#
# Usage: sh scripts/run_rl_finetune_stop.sh <work_dir> <sup_run_dir> \
#          [detector] [max_iters] [entropy]
#
#   sup_run_dir  the supervised run directory containing checkpoints/
#                (e.g. /root/runs/sup/r3_sup_yolox-nano)
#   detector     must match the supervised run's --image-processor
#                (yolox-nano = shared backbone, default; yolox-s adds
#                --gpt-backbone yolox-nano like the flagship recipe)
#
# Best checkpoints are tracked by trajectory mAP (--best-metric map): the
# RL default (prop_patches_found) repeatedly picked lower-stop checkpoints
# ~0.03 mAP below the sampled-eval peak on both box-size variants
# (docs/experiment_log.md 2026-08-19/20, "commitment frontier").
set -e
WORK_DIR=${1:?work_dir required}
SUP_RUN=${2:?supervised run dir required}
DETECTOR=${3:-yolox-nano}
MAX_ITERS=${4:-10000}
ENTROPY=${5:-0.01}
# DATASET_DIR env var switches the dataset; must match the supervised run's.
DATASET_DIR=${DATASET_DIR:-/root/toyds_big}
if [ "$DETECTOR" = "yolox-nano" ]; then
  BACKBONE_FLAGS="--image-processor yolox-nano"
else
  BACKBONE_FLAGS="--image-processor $DETECTOR --gpt-backbone yolox-nano"
fi
exec python main.py \
  --seed 2 \
  --dataset-dir "$DATASET_DIR" \
  --training-mode reinforce \
  --init-from "$SUP_RUN" \
  --work-dir "$WORK_DIR" \
  --max-iters "$MAX_ITERS" \
  --test-every 1000 \
  --test-samples 20 \
  --env-name "rlft_$DETECTOR" \
  --group r3 \
  --model-type gpt-nano \
  $BACKBONE_FLAGS \
  --concat-embeddings \
  --decoder-pos-encoding \
  --use-positional-embedding \
  --enable-stop \
  --entropy-weight "$ENTROPY" \
  --max-seq-len 20 \
  --batch-size 16 \
  --gradient-accumulation 4 \
  --steps-per-dispatch 4 \
  --patch-size 64 \
  --minimum-image-size 0 \
  --detector-conf-threshold 0.1 \
  --merge-bboxes \
  --lr 3e-5 \
  --yolo-lr 2e-5 \
  --best-metric map \
  --num-workers 1 \
  $EXTRA_FLAGS
