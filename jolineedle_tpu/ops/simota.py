"""SimOTA label assignment and YOLOX detection losses, fixed-shape XLA.

The upstream torch implementation (consumed by reference:
src/models/yolox.py:63-73) uses data-dependent candidate sets and dynamic
top-k. Here everything is a dense [G, A] computation with validity masks:
non-candidates get a huge cost, dynamic-k selection becomes a rank
comparison (double argsort), and padded ground truths / padded patches are
masked — so the whole loss jits into one fused kernel and batches with vmap.

Loss structure parity (iou/obj/cls/l1, reg_weight=5, normalized by total
foreground count; L1 always on, reference: src/models/yolox.py:22).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

CENTER_RADIUS = 2.5
HIGH_COST = 100000.0
TOPK_CANDIDATES = 10

# A/B knob for the flagship repro study (docs/experiment_log.md 2026-08-18):
# the unreproducible 0.604 one-off was trained BEFORE the strict-edge
# boundary fix landed, and the pre-fix >=/<= candidate semantics are one of
# the two named suspects for the ~0.15 mAP delta.
# JOLINEEDLE_SIMOTA_LOOSE_EDGE=1 restores the pre-fix semantics so a
# controlled toggle can convict or exonerate the suspect. Default (unset) is
# the upstream-exact strict behavior pinned by test_simota_oracle.
_LOOSE_EDGE = os.environ.get("JOLINEEDLE_SIMOTA_LOOSE_EDGE", "") == "1"
_GT = jnp.greater_equal if _LOOSE_EDGE else jnp.greater
_LT = jnp.less_equal if _LOOSE_EDGE else jnp.less


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    xy, wh = boxes[..., :2], boxes[..., 2:4]
    return jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1y1, x2y2 = boxes[..., :2], boxes[..., 2:4]
    return jnp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1], axis=-1)


def pairwise_iou_cxcywh(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU between [G, 4] and [A, 4] cxcywh boxes -> [G, A]."""
    ax = cxcywh_to_xyxy(a)
    bx = cxcywh_to_xyxy(b)
    lt = jnp.maximum(ax[:, None, :2], bx[None, :, :2])
    rb = jnp.minimum(ax[:, None, 2:4], bx[None, :, 2:4])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2], 0) * jnp.clip(a[:, 3], 0)
    area_b = jnp.clip(b[:, 2], 0) * jnp.clip(b[:, 3], 0)
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def _bce_logits(logits, targets):
    """Elementwise binary cross-entropy with logits (stable)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def _bce_probs(p, targets, eps=1e-8):
    p = jnp.clip(p, eps, 1 - eps)
    return -(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))


def simota_assign(
    pred_boxes: jnp.ndarray,  # [A, 4] cxcywh pixels (decoded)
    obj_logits: jnp.ndarray,  # [A]
    cls_logits: jnp.ndarray,  # [A, nc]
    gt_boxes: jnp.ndarray,  # [G, 4] cxcywh pixels
    gt_classes: jnp.ndarray,  # [G] int
    gt_valid: jnp.ndarray,  # [G] bool
    grids: jnp.ndarray,  # [A, 2] (x, y)
    strides: jnp.ndarray,  # [A]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (fg_mask [A], matched_gt [A] int, matched_iou [A])."""
    A = pred_boxes.shape[0]
    nc = cls_logits.shape[-1]

    # Anchor centers in pixels.
    centers = (grids + 0.5) * strides[:, None]  # [A, 2]

    gt_xyxy = cxcywh_to_xyxy(gt_boxes)  # [G, 4]
    cx, cy = centers[:, 0], centers[:, 1]
    # Strict inequalities: upstream forms edge deltas (center - edge) and
    # tests ``deltas.min(-1) > 0``, so an anchor center exactly ON a box or
    # center-region edge is OUTSIDE (matters for integer-pixel gt boxes whose
    # edges land on (grid + 0.5) * stride).
    in_box = (
        _GT(cx[None, :], gt_xyxy[:, None, 0])
        & _LT(cx[None, :], gt_xyxy[:, None, 2])
        & _GT(cy[None, :], gt_xyxy[:, None, 1])
        & _LT(cy[None, :], gt_xyxy[:, None, 3])
    )  # [G, A]
    r = CENTER_RADIUS * strides[None, :]
    in_center = (
        _GT(cx[None, :], gt_boxes[:, None, 0] - r)
        & _LT(cx[None, :], gt_boxes[:, None, 0] + r)
        & _GT(cy[None, :], gt_boxes[:, None, 1] - r)
        & _LT(cy[None, :], gt_boxes[:, None, 1] + r)
    )

    candidate = (in_box | in_center) & gt_valid[:, None]
    strong = in_box & in_center
    # Upstream pools anchors over the UNION of all gts' candidates
    # (yolo_head.get_in_boxes_info returns is_in_boxes_anchor = any-gt), and
    # every downstream step — pairwise ious for dynamic-k, the per-gt top-k
    # cost selection — runs over that union, not per-gt candidate sets.
    union = candidate.any(0)  # [A]

    ious = pairwise_iou_cxcywh(gt_boxes, pred_boxes)  # [G, A]
    iou_cost = -jnp.log(ious + 1e-8)

    cls_prob = jax.nn.sigmoid(cls_logits) * jax.nn.sigmoid(obj_logits)[:, None]
    cls_prob = jnp.sqrt(jnp.clip(cls_prob, 0, 1))  # [A, nc]
    gt_onehot = jax.nn.one_hot(gt_classes, nc)  # [G, nc]
    pair_cls_cost = _bce_probs(
        cls_prob[None, :, :], gt_onehot[:, None, :]
    ).sum(-1)  # [G, A]

    # Non-strong anchors get upstream's 100000 penalty; anchors outside the
    # candidate union (or padded gts) are pushed past every real entry so
    # the dense rank-based top-k never reaches them (k <= #union always:
    # k = int(sum of <= #union ious each <= 1)).
    cost = (
        pair_cls_cost
        + 3.0 * iou_cost
        + HIGH_COST * (~strong).astype(jnp.float32)
        + 1e9 * (~(union[None, :] & gt_valid[:, None])).astype(jnp.float32)
    )

    # Dynamic-k: k_g = clamp(int(sum of top-10 union-candidate ious), 1).
    masked_ious = jnp.where(union[None, :], ious, 0.0)
    k_top = min(TOPK_CANDIDATES, A)
    topk_ious, _ = jax.lax.top_k(masked_ious, k_top)
    dynamic_k = jnp.clip(topk_ious.sum(-1).astype(jnp.int32), 1, None)  # [G]

    # Per-gt rank of anchors by ascending cost (upstream: torch.topk
    # largest=False over the union columns).
    order = jnp.argsort(cost, axis=-1)
    rank = jnp.argsort(order, axis=-1)  # rank[g, a] = position of a
    matching = (rank < dynamic_k[:, None]) & union[None, :] & gt_valid[:, None]

    # Resolve anchors matched to multiple gts: upstream argmins the cost
    # over ALL gts for that anchor (not just the currently-matching ones),
    # then assigns the winner even if it had not selected the anchor
    # (yolo_head.dynamic_k_matching).
    n_matches = matching.sum(0)  # [A]
    best_gt = jnp.argmin(cost, axis=0)  # [A]
    only_best = jax.nn.one_hot(best_gt, matching.shape[0], dtype=bool).T
    matching = jnp.where(n_matches[None, :] > 1, only_best, matching)

    fg_mask = matching.any(0)
    matched_gt = jnp.argmax(matching, axis=0)  # [A] (0 where no match; gated)
    matched_iou = (matching * ious).sum(0)
    return fg_mask, matched_gt, matched_iou


def yolox_losses(
    head_out: dict,
    targets: jnp.ndarray,  # [B, N, 6] rows (cls, x1, y1, x2, y2, obj) local px
    patch_valid: jnp.ndarray = None,  # [B] bool (padded patches)
) -> dict:
    """Batched SimOTA losses (iou/obj/cls/l1, reference upstream semantics).

    ``targets`` carries xyxy + objectness rows as produced by the envs
    (reference: src/env/simple_env.py:231-268); rows with obj != 1 are
    padding. Patch-level padding is masked via ``patch_valid``.
    """
    boxes = head_out["boxes"]
    obj_logits = head_out["obj_logits"]
    cls_logits = head_out["cls_logits"]
    raw_reg = head_out["raw_reg"]
    grids, strides = head_out["grids"], head_out["strides"]
    B = boxes.shape[0]
    if patch_valid is None:
        patch_valid = jnp.ones((B,), bool)

    gt_cls = targets[..., 0].astype(jnp.int32)
    gt_xyxy = targets[..., 1:5].astype(jnp.float32)
    gt_valid = (targets[..., 5] > 0.5) & patch_valid[:, None]
    gt_cxcywh = xyxy_to_cxcywh(gt_xyxy)

    assign = jax.vmap(simota_assign, in_axes=(0, 0, 0, 0, 0, 0, None, None))
    fg_mask, matched_gt, matched_iou = assign(
        boxes, obj_logits, cls_logits, gt_cxcywh, gt_cls, gt_valid, grids, strides
    )
    fg_mask = fg_mask & patch_valid[:, None]
    fg = fg_mask.astype(jnp.float32)
    num_fg = jnp.maximum(fg.sum(), 1.0)

    take = jax.vmap(lambda t, idx: t[idx])
    matched_boxes = take(gt_cxcywh, matched_gt)  # [B, A, 4]
    matched_cls = take(gt_cls, matched_gt)  # [B, A]

    # IoU loss: 1 - iou^2 on foreground anchors.
    iou = jax.vmap(
        lambda p, g: jax.vmap(
            lambda pb, gb: pairwise_iou_cxcywh(gb[None], pb[None])[0, 0]
        )(p, g)
    )(boxes, matched_boxes)
    loss_iou = ((1.0 - iou**2) * fg).sum() / num_fg

    # Objectness over all (valid) anchors; target = fg mask.
    obj_bce = _bce_logits(obj_logits, fg)
    loss_obj = (obj_bce * patch_valid[:, None].astype(jnp.float32)).sum() / num_fg

    # Classification on fg anchors; soft target = onehot * matched iou.
    nc = cls_logits.shape[-1]
    cls_target = jax.nn.one_hot(matched_cls, nc) * matched_iou[..., None]
    cls_bce = _bce_logits(cls_logits, cls_target).sum(-1)
    loss_cls = (cls_bce * fg).sum() / num_fg

    # L1 on raw regression vs encoded targets.
    l1_target = jnp.concatenate(
        [
            matched_boxes[..., :2] / strides[None, :, None] - grids[None],
            jnp.log(
                jnp.clip(matched_boxes[..., 2:4], 1e-8)
                / strides[None, :, None]
            ),
        ],
        axis=-1,
    )
    loss_l1 = (jnp.abs(raw_reg - l1_target).sum(-1) * fg).sum() / num_fg

    total = 5.0 * loss_iou + loss_obj + loss_cls + loss_l1
    return {
        "total_loss": total,
        "iou_loss": loss_iou,
        "l1_loss": loss_l1,
        "conf_loss": loss_obj,
        "cls_loss": loss_cls,
        "num_fg": num_fg,
    }
