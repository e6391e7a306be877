"""Geometry primitives: positions, bounding boxes, parsing and merging.

Host-side numpy code (eval/plot path — no jit needed). Semantics parity with
the reference foundation utilities (reference: src/utils.py:10-255).

Coordinate conventions (same as the reference):
  - ``Position`` is (y, x).
  - Boxes are pixel-space xyxy = (xmin, ymin, xmax, ymax).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import numpy as np

Position = NamedTuple("Position", [("y", int), ("x", int)])
BBox = NamedTuple("BBox", [("up_left", Position), ("bottom_right", Position)])


def bboxes_to_array(bboxes: List[BBox]) -> np.ndarray:
    """[n, 4] xyxy array from BBox list (reference: src/utils.py:95-106)."""
    if len(bboxes) == 0:
        return np.zeros((0, 4), dtype=np.float32)
    return np.array(
        [
            [b.up_left.x, b.up_left.y, b.bottom_right.x, b.bottom_right.y]
            for b in bboxes
        ],
        dtype=np.float32,
    )


def parse_bbox_predictions(
    outputs: List[Optional[np.ndarray]],
    positions: Optional[np.ndarray] = None,
    patch_size: int = 1,
) -> List[BBox]:
    """Offset per-patch predicted boxes into full-image BBoxes.

    Parity with reference src/utils.py:109-150: ``outputs[i]`` is
    ``[n_bboxes, 4+...]`` for the i-th visited patch (or None), ``positions``
    is ``[n_patches, 2]`` in (y, x) patch coordinates.
    """
    parsed = []
    for i, bboxes in enumerate(outputs):
        if bboxes is None or len(bboxes) == 0:
            continue
        bboxes = np.asarray(bboxes, dtype=np.float64)[:, :4].copy()
        if positions is not None:
            pos = np.asarray(positions[i])
            bboxes[:, [0, 2]] += pos[1] * patch_size
            bboxes[:, [1, 3]] += pos[0] * patch_size
        for b in bboxes:
            parsed.append(
                BBox(
                    up_left=Position(x=float(b[0]), y=float(b[1])),
                    bottom_right=Position(x=float(b[2]), y=float(b[3])),
                )
            )
    return parsed


def parse_bbox_targets(
    targets: np.ndarray,
    positions: Optional[np.ndarray] = None,
    patch_size: int = 1,
) -> List[BBox]:
    """Same as :func:`parse_bbox_predictions` for target tensors.

    ``targets`` is ``[n_patches, n_bboxes, 6]`` with rows
    (class, xmin, ymin, xmax, ymax, objectness); rows with objectness != 1
    are dropped (reference: src/utils.py:153-182).
    """
    targets = np.asarray(targets)
    filtered = []
    for bboxes in targets:
        keep = bboxes[bboxes[:, -1] == 1]
        filtered.append(keep[:, 1:5] if len(keep) > 0 else None)
    return parse_bbox_predictions(filtered, positions, patch_size)


def merge_boxes(
    boxes: np.ndarray, threshold: float = 2, target: bool = False
) -> np.ndarray:
    """Merge contiguous boxes from per-patch predictions.

    Groups boxes whose minimum edge distance is <= ``threshold`` px and
    replaces each group with its enclosing box, keeping the max confidence
    (reference: src/utils.py:198-255).

    ``target=True`` means rows are (cls, x1, y1, x2, y2); otherwise
    (x1, y1, x2, y2, obj_conf, cls_confs...).

    Parity quirk kept on purpose: like the reference, the greedy grouping
    can place one box in two groups (i near A, j near both i and a later
    seed), emitting two overlapping merged boxes. Fixing it (union-find)
    would change merged-mAP numbers relative to the reference, so the
    reference behavior is preserved — unlike the documented NMS-score fix,
    this quirk only duplicates an already-covered region.
    """
    boxes = np.asarray(boxes)
    off = 1 if target else 0

    def dist(a, b):
        return min(
            abs(b[off + 2] - a[off + 0]),
            abs(a[off + 2] - b[off + 0]),
            abs(b[off + 3] - a[off + 1]),
            abs(a[off + 3] - b[off + 1]),
        )

    groups: List[List[int]] = []
    for i in range(len(boxes)):
        for gid in range(len(groups)):
            if i in groups[gid]:
                break
        else:
            gid = len(groups)
            groups.append([i])
        for j in range(i + 1, len(boxes)):
            if dist(boxes[i], boxes[j]) <= threshold:
                groups[gid].append(j)

    merged = []
    for group in groups:
        to_merge = boxes[sorted(set(group))]
        box = [
            to_merge[:, off + 0].min(),
            to_merge[:, off + 1].min(),
            to_merge[:, off + 2].max(),
            to_merge[:, off + 3].max(),
        ]
        if target:
            box = [0] + box
        elif boxes.shape[1] > 5:
            conf = (to_merge[:, 4] * to_merge[:, 5]).max()
            box += [conf, 1]
        merged.append(box)
    return np.array(merged, dtype=np.float64)


def merge_boxes_batched(
    batch: List[Optional[np.ndarray]], threshold: float = 2, target: bool = False
) -> List[Optional[np.ndarray]]:
    """Apply :func:`merge_boxes` per image (reference: src/utils.py:185-195)."""
    return [
        None if boxes is None else merge_boxes(boxes, threshold, target)
        for boxes in batch
    ]
