#!/bin/sh
# Pinned 20k-iteration supervised recipe on the 1.5k toy set — the
# "flagship" navigation run every round-2/3 experiment-log entry refers to
# (docs/experiment_log.md 2026-08-17 "supervised convergence on the
# 1.5k-image toy set" and the 2026-08-18 reproduction study). The original
# run's config.json lived in /tmp and was lost to a machine reset; this
# pins the exact CLI so the recipe survives resets like the dataset does
# (scripts/make_toyds_big.py).
#
# Usage: sh scripts/run_sup_flagship.sh <work_dir> [detector] [spd] [max_iters]
#
#   detector  yolox variant for the detection model (default yolox-nano =
#             the shared-backbone recipe reproduced in the log). Passing
#             yolox-s trains the reference's headline pairing — separate
#             yolox-s detector + yolox-nano glimpse embedder (reference:
#             docs/experiment_log.md:27) — which raises the detector
#             ceiling the nav mAP is gated by.
#   spd       --steps-per-dispatch (default 1: the best-scoring repro leg;
#             4 is ~1.8x faster per the 2026-08-18 chip probes and
#             bit-exact on losses, but sampled evals differ seed-like).
#
# Seed protocol (pinned, round-3 verdict weak #1): single-run full-test mAP
# wobbles +-0.08 on this recipe (docs/experiment_log.md 2026-08-18
# reproduction study), so HEADLINE numbers must be the MEDIAN of three
# seeds — run with SEED=1, SEED=2, SEED=3 into separate work dirs:
#
#     for s in 1 2 3; do SEED=$s sh scripts/run_sup_flagship.sh \
#         /root/runs/sup_s$s yolox-s; done
#
# then quote the median full-test single-start mAP across the three
# (scripts/eval_checkpoint.py on each). One-seed runs are fine for warm
# starts and A/B arms where both arms share the seed.
set -e
WORK_DIR=${1:?work_dir required}
DETECTOR=${2:-yolox-nano}
SPD=${3:-1}
MAX_ITERS=${4:-20000}
SEED=${SEED:-1}
# DATASET_DIR env var switches the dataset (default: the pinned 1.5k toy
# set; /root/toyds_lardlike for the sub-patch box/patch-ratio variant).
DATASET_DIR=${DATASET_DIR:-/root/toyds_big}
if [ "$DETECTOR" = "yolox-nano" ]; then
  BACKBONE_FLAGS="--image-processor yolox-nano"
else
  BACKBONE_FLAGS="--image-processor $DETECTOR --gpt-backbone yolox-nano"
fi
exec python main.py \
  --seed "$SEED" \
  --dataset-dir "$DATASET_DIR" \
  --training-mode supervised \
  --work-dir "$WORK_DIR" \
  --max-iters "$MAX_ITERS" \
  --test-every 2500 \
  --test-samples 20 \
  --env-name "sup_$DETECTOR" \
  --group r3 \
  --model-type gpt-nano \
  $BACKBONE_FLAGS \
  --concat-embeddings \
  --decoder-pos-encoding \
  --use-positional-embedding \
  --max-seq-len 8 \
  --batch-size 16 \
  --steps-per-dispatch "$SPD" \
  --patch-size 64 \
  --minimum-image-size 0 \
  --augment-translate \
  --lr-schedule cosine \
  --lr-warmup-iters 500 \
  --lr 2e-4 \
  --yolo-lr 1e-4 \
  --detector-conf-threshold 0.1 \
  --merge-bboxes \
  --num-workers 1
