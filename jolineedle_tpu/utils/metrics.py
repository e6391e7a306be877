"""Host-side detection metrics: COCO-style AP@0.5 (single class).

Replaces the reference's torchmetrics ``MeanAveragePrecision`` ``map_50``
(reference: src/trainer.py:188-248) with a dependency-free numpy COCO
evaluator (101-point interpolation, greedy IoU matching, maxDets=100).
Eval-only code: runs on host, no jit.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def box_iou(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise IoU of xyxy boxes: [n, m]."""
    boxes1 = np.asarray(boxes1, dtype=np.float64)
    boxes2 = np.asarray(boxes2, dtype=np.float64)
    area1 = np.clip(boxes1[:, 2] - boxes1[:, 0], 0, None) * np.clip(
        boxes1[:, 3] - boxes1[:, 1], 0, None
    )
    area2 = np.clip(boxes2[:, 2] - boxes2[:, 0], 0, None) * np.clip(
        boxes2[:, 3] - boxes2[:, 1], 0, None
    )
    lt = np.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = np.minimum(boxes1[:, None, 2:4], boxes2[None, :, 2:4])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def average_precision_50(
    pred_boxes: List[np.ndarray],
    pred_scores: List[np.ndarray],
    gt_boxes: List[np.ndarray],
    iou_threshold: float = 0.5,
    max_dets: int = 100,
) -> float:
    """COCO AP at a single IoU threshold over a list of images (one class).

    Greedy matching: detections sorted by score descending; each matches the
    unmatched ground truth with highest IoU >= threshold. AP is the mean of
    interpolated precision over 101 recall points (COCO convention, matching
    torchmetrics ``map_50``).
    """
    assert len(pred_boxes) == len(pred_scores) == len(gt_boxes)
    n_gt = sum(len(g) for g in gt_boxes)
    if n_gt == 0:
        return 0.0

    all_scores = []
    all_matched = []
    for boxes, scores, gts in zip(pred_boxes, pred_scores, gt_boxes):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        scores = np.asarray(scores, dtype=np.float64).reshape(-1)
        gts = np.asarray(gts, dtype=np.float64).reshape(-1, 4)
        order = np.argsort(-scores, kind="stable")[:max_dets]
        boxes, scores = boxes[order], scores[order]
        matched = np.zeros(len(boxes), dtype=bool)
        if len(gts) > 0 and len(boxes) > 0:
            ious = box_iou(boxes, gts)
            gt_taken = np.zeros(len(gts), dtype=bool)
            for d in range(len(boxes)):
                cand = np.where(~gt_taken & (ious[d] >= iou_threshold))[0]
                if len(cand) > 0:
                    best = cand[np.argmax(ious[d, cand])]
                    gt_taken[best] = True
                    matched[d] = True
        all_scores.append(scores)
        all_matched.append(matched)

    if not all_scores or sum(len(s) for s in all_scores) == 0:
        return 0.0
    scores = np.concatenate(all_scores)
    matched = np.concatenate(all_matched)
    order = np.argsort(-scores, kind="stable")
    matched = matched[order]

    tp = np.cumsum(matched)
    fp = np.cumsum(~matched)
    recall = tp / n_gt
    precision = tp / np.maximum(tp + fp, 1)

    # Interpolated precision: monotonically non-increasing from the right.
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    recall_thresholds = np.linspace(0, 1, 101)
    idx = np.searchsorted(recall, recall_thresholds, side="left")
    prec_at_rec = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
    return float(prec_at_rec.mean())


def compute_detection_metrics(
    outputs: List[Optional[np.ndarray]],
    targets: List[np.ndarray],
) -> dict:
    """mAP@0.5 over full images (reference: src/trainer.py:188-248).

    Args:
        outputs: per-image predicted boxes ``[n, 4+1+...]`` rows
            (xmin, ymin, xmax, ymax, score, ...); None if no prediction.
        targets: per-image true boxes ``[n, 5]`` rows (cls, xyxy).
    """
    n_bboxes = sum(len(t) for t in targets)
    if n_bboxes == 0:
        # No bbox in the batch => fix the map to 0 (reference quirk,
        # torchmetrics would compute -1).
        return {"map": 0.0}

    pred_boxes, pred_scores, gt_boxes = [], [], []
    for i, image_outputs in enumerate(outputs):
        image_targets = np.asarray(targets[i], dtype=np.float64).reshape(-1, 5)
        if image_outputs is None:
            image_outputs = np.zeros((0, 5))
        image_outputs = np.asarray(image_outputs, dtype=np.float64)
        pred_boxes.append(image_outputs[:, :4])
        pred_scores.append(
            image_outputs[:, 4] if image_outputs.shape[0] else np.zeros((0,))
        )
        gt_boxes.append(image_targets[:, 1:5])

    return {"map": average_precision_50(pred_boxes, pred_scores, gt_boxes)}


def patch_bboxes2full_image(
    outputs: List[List[Optional[np.ndarray]]],
    offsets: np.ndarray,
    masks: Optional[np.ndarray] = None,
) -> List[Optional[np.ndarray]]:
    """Offset per-patch predictions into full-image coordinates and merge
    per image (reference: src/trainer.py:250-280).

    Args:
        outputs: outer list = batch, inner list = episode steps; each entry
            is a ``[n, >=4]`` prediction array or None.
        offsets: ``[batch, steps, 2]`` pixel offsets in (x, y) order.
        masks: ``[batch, steps]`` boolean step-validity mask.
    """
    offsets = np.asarray(offsets)
    new_outputs: List[Optional[np.ndarray]] = []
    for i, image_outputs in enumerate(outputs):
        rows = []
        for j, patch_outputs in enumerate(image_outputs):
            if masks is not None and not masks[i, j]:
                continue
            if patch_outputs is not None and len(patch_outputs) > 0:
                patch_outputs = np.asarray(patch_outputs, dtype=np.float64).copy()
                patch_outputs[:, :2] += offsets[i, j]
                patch_outputs[:, 2:4] += offsets[i, j]
                rows.append(patch_outputs)
        new_outputs.append(np.concatenate(rows) if rows else None)
    return new_outputs
