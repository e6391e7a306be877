"""Bounding-box <-> patch-grid geometry, in pure interval arithmetic.

The reference rasterizes boxes to pixel masks with kornia ``Boxes.to_mask``
followed by a max-pool (reference: src/env/general_env.py:360-379) and splits
boxes across patch borders with a Python recursion (reference:
src/env/general_env.py:381-504). Neither rasterization nor recursion is
needed: a box intersects a patch iff their pixel intervals overlap, which is
a handful of min/max ops — fixed shape, fused by XLA, identical results.

Boxes are pixel-space xyxy with an *inclusive* bottom-right corner
("xyxy_plus", matching the reference's kornia mode). Functions are generic
over numpy / jax.numpy via the ``xp`` argument so the same math runs on host
(eval) and device (train).

Note: the reference treats zero-padded boxes (0,0,0,0) as real 1x1 boxes at
the origin (a kornia xyxy_plus quirk); we instead carry explicit validity
masks, so padded boxes never mark patches.
"""

from __future__ import annotations

import numpy as np


def split_boxes_to_patches(boxes, valid, n_vertical, n_horizontal, patch_size, xp=np):
    """Intersect each box with each patch of the grid.

    Args:
        boxes: ``[n, 4]`` xyxy (inclusive bottom-right), pixel space.
        valid: ``[n]`` bool, False for padding rows.
        n_vertical, n_horizontal: patch-grid dims.
        patch_size: patch side in pixels.
        xp: numpy or jax.numpy.

    Returns:
        local_boxes: ``[n_vertical, n_horizontal, n, 4]`` xyxy in *local*
            patch coordinates (zeroed where invalid).
        masks: ``[n_vertical, n_horizontal, n]`` bool intersection validity.

    Exactly reproduces the reference recursion ``place_bbox_recursive``
    (reference: src/env/general_env.py:423-504), including the inclusive
    ``min(x2, patch_size - 1)`` clamp.
    """
    boxes = xp.asarray(boxes)
    px = xp.broadcast_to(
        xp.arange(n_horizontal)[None, :, None] * patch_size,
        (n_vertical, n_horizontal, 1),
    )
    py = xp.broadcast_to(
        xp.arange(n_vertical)[:, None, None] * patch_size,
        (n_vertical, n_horizontal, 1),
    )

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    ix1 = xp.maximum(x1[None, None, :], px)
    iy1 = xp.maximum(y1[None, None, :], py)
    ix2 = xp.minimum(x2[None, None, :], px + patch_size - 1)
    iy2 = xp.minimum(y2[None, None, :], py + patch_size - 1)

    inter_valid = (ix1 <= ix2) & (iy1 <= iy2) & valid[None, None, :]
    local = xp.stack([ix1 - px, iy1 - py, ix2 - px, iy2 - py], axis=-1)
    local = xp.where(inter_valid[..., None], local, 0)
    return local, inter_valid


def boxes_to_patch_mask(boxes, valid, n_vertical, n_horizontal, patch_size, xp=np):
    """``[n_vertical, n_horizontal]`` bool: patch contains (part of) any box.

    Replaces kornia rasterization + max_pool2d (reference:
    src/env/general_env.py:360-379).
    """
    _, masks = split_boxes_to_patches(
        boxes, valid, n_vertical, n_horizontal, patch_size, xp=xp
    )
    return masks.any(axis=-1)


def detection_targets_full_image(
    boxes: np.ndarray,
    valid: np.ndarray,
    n_vertical: int,
    n_horizontal: int,
    patch_size: int,
) -> np.ndarray:
    """Per-image detection targets: boxes split at patch borders, re-offset
    to full-image coords (reference: src/env/general_env.py:548-573).

    Host-side (eval path). Returns ``[m, 5]`` rows (cls=0, x1, y1, x2, y2),
    ordered by raster scan (patch row, patch col, box id) like the reference.
    """
    local, masks = split_boxes_to_patches(
        boxes, valid, n_vertical, n_horizontal, patch_size, xp=np
    )
    rows = []
    for y in range(n_vertical):
        for x in range(n_horizontal):
            for k in range(local.shape[2]):
                if masks[y, x, k]:
                    b = local[y, x, k].astype(np.int64)
                    rows.append(
                        [0, b[0] + x * patch_size, b[1] + y * patch_size,
                         b[2] + x * patch_size, b[3] + y * patch_size]
                    )
    if not rows:
        return np.zeros((0, 5), dtype=np.int64)
    return np.array(rows, dtype=np.int64)


def bbox_patch_positions(
    raw_box: np.ndarray,
    patch_size: int,
    n_vertical: int,
    n_horizontal: int,
    area_threshold: float = 0.05,
) -> set:
    """Set of (y, x) patch positions "covered" by a pixel-space box.

    A patch counts if the box covers more than ``area_threshold`` of its
    area; the patch containing the box center is always included; positions
    outside the grid are dropped (reference: src/env/simple_env.py:270-321).
    Used by the oracle trajectory generator and eval accounting.
    """
    x1, y1, x2, y2 = [float(v) for v in raw_box]
    positions = set()
    py1, px1 = int(np.floor(y1 / patch_size)), int(np.floor(x1 / patch_size))
    py2, px2 = int(np.floor(y2 / patch_size)), int(np.floor(x2 / patch_size))
    for y in range(py1, py2 + 1):
        for x in range(px1, px2 + 1):
            ix1 = max(x * patch_size, x1)
            iy1 = max(y * patch_size, y1)
            ix2 = min((x + 1) * patch_size, x2)
            iy2 = min((y + 1) * patch_size, y2)
            area = (iy2 - iy1) * (ix2 - ix1) / (patch_size**2)
            if area > area_threshold:
                positions.add((y, x))
    # The center patch is always included.
    cy = int(np.floor(((y1 + y2) // 2) / patch_size))
    cx = int(np.floor(((x1 + x2) // 2) / patch_size))
    positions.add((cy, cx))
    return {
        (y, x)
        for (y, x) in positions
        if 0 <= x < n_horizontal and 0 <= y < n_vertical
    }
