"""Detection postprocess: confidence filtering + class-agnostic NMS.

Replaces upstream ``yolox.utils.postprocess`` (used by reference:
src/models/yolox.py:77-86) and ``torchvision.ops.nms`` (reference:
src/supervised.py:552). Two variants:

  - ``postprocess`` / ``nms_numpy``: host-side numpy, eval path (outputs are
    ragged per image, exactly like the reference's list-of-tensors).
  - ``nms_mask``: fixed-shape masked jnp NMS for on-device use.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp


def sigmoid_np(x) -> np.ndarray:
    """Stable numpy sigmoid for host-side postprocess inputs.

    ``jax.nn.sigmoid`` on a fetched numpy array would round-trip it through
    the default device — an eager RPC per call on the tunneled-TPU backend."""
    x = np.asarray(x, np.float64)
    e = np.exp(-np.abs(x))
    return np.where(x >= 0, 1.0 / (1.0 + e), e / (1.0 + e))


def nms_numpy(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float) -> np.ndarray:
    """Indices kept by greedy NMS (xyxy boxes), score-descending."""
    boxes = np.asarray(boxes, dtype=np.float64)
    scores = np.asarray(scores, dtype=np.float64)
    order = np.argsort(-scores, kind="stable")
    keep = []
    area = np.clip(boxes[:, 2] - boxes[:, 0], 0, None) * np.clip(
        boxes[:, 3] - boxes[:, 1], 0, None
    )
    while order.size > 0:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / np.maximum(area[i] + area[rest] - inter, 1e-12)
        order = rest[iou <= iou_threshold]
    return np.array(keep, dtype=np.int64)


def postprocess(
    boxes_cxcywh: np.ndarray,  # [B, A, 4]
    obj_probs: np.ndarray,  # [B, A]
    cls_probs: np.ndarray,  # [B, A, nc]
    conf_threshold: float,
    nms_threshold: float = 0.45,
    patch_size: Optional[int] = None,
) -> List[Optional[np.ndarray]]:
    """Per-image ``[n, 7]`` arrays (x1, y1, x2, y2, obj, cls_conf, cls_id)
    or None — same contract as upstream postprocess + the reference's clamp
    to the patch (reference: src/models/yolox.py:93-113). NMS runs on the
    UNCLAMPED boxes and the clamp applies after, exactly like the reference
    (upstream postprocess then ``clamp_outputs``) — clamping first would
    change suppression decisions for boxes crossing the patch border.

    Inputs are coerced to numpy up front: callers may hand in jnp arrays,
    and the per-image loop must not become per-op device RPCs on the
    tunneled-TPU backend."""
    boxes_cxcywh = np.asarray(boxes_cxcywh)
    obj_probs = np.asarray(obj_probs)
    cls_probs = np.asarray(cls_probs)
    B = boxes_cxcywh.shape[0]
    out: List[Optional[np.ndarray]] = []
    for i in range(B):
        cls_conf = cls_probs[i].max(axis=-1)
        cls_id = cls_probs[i].argmax(axis=-1)
        conf = obj_probs[i] * cls_conf
        keep = conf >= conf_threshold
        if not keep.any():
            out.append(None)
            continue
        b = boxes_cxcywh[i][keep]
        xyxy = np.concatenate([b[:, :2] - b[:, 2:4] / 2, b[:, :2] + b[:, 2:4] / 2], -1)
        scores = conf[keep]
        keep_nms = nms_numpy(xyxy, scores, nms_threshold)
        if patch_size is not None:
            xyxy = np.clip(xyxy, 0, patch_size - 1)
        rows = np.concatenate(
            [
                xyxy[keep_nms],
                obj_probs[i][keep][keep_nms, None],
                cls_conf[keep][keep_nms, None],
                cls_id[keep][keep_nms, None].astype(np.float64),
            ],
            axis=-1,
        )
        out.append(rows)
    return out


def nms_mask(
    boxes: jnp.ndarray,  # [N, 4] xyxy
    scores: jnp.ndarray,  # [N]
    valid: jnp.ndarray,  # [N] bool
    iou_threshold: float,
) -> jnp.ndarray:
    """Fixed-shape greedy NMS: returns a keep mask [N].

    O(N) iterations of a scan, each suppressing against the best remaining
    box — device-friendly (no dynamic shapes).
    """
    n = boxes.shape[0]
    area = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 0
    )

    def iou_with(i):
        xx1 = jnp.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = jnp.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = jnp.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = jnp.minimum(boxes[i, 3], boxes[:, 3])
        inter = jnp.clip(xx2 - xx1, 0) * jnp.clip(yy2 - yy1, 0)
        return inter / jnp.maximum(area[i] + area - inter, 1e-12)

    def body(carry, _):
        remaining, keep = carry
        masked_scores = jnp.where(remaining, scores, -jnp.inf)
        i = jnp.argmax(masked_scores)
        any_left = remaining.any()
        keep = keep.at[i].set(keep[i] | any_left)
        suppress = (iou_with(i) > iou_threshold) & any_left
        remaining = remaining & ~suppress & (jnp.arange(n) != i)
        return (remaining, keep), None

    (remaining, keep), _ = jax.lax.scan(
        body, (valid, jnp.zeros((n,), bool)), None, length=n
    )
    return keep
