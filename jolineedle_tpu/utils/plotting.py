"""Host-side trajectory rendering (matplotlib, Agg backend).

Same visual language as the reference (reference: src/utils.py:261-393):
visited patches in progressive red scale, ground-truth boxes green,
predictions blue, patch grid overlaid. Returns an [C, H, W] float image for
the dashboard.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from .geometry import BBox, Position  # noqa: E402


def _plot_bbox(axe, bbox: BBox, color: str):
    x1, y1 = bbox.up_left.x, bbox.up_left.y
    x2, y2 = bbox.bottom_right.x, bbox.bottom_right.y
    axe.plot([x1, x1, x2, x2, x1], [y1, y2, y2, y1, y1], color=color, alpha=0.6)


def plot_model_prediction(
    image: np.ndarray,  # [H, W, C] uint8 [0, 255] or float in [0, 1]
    patches: np.ndarray,  # [n, P, P, C]
    positions: np.ndarray,  # [n, 2] (y, x) patch coords
    true_bboxes: Optional[List[BBox]] = None,
    predicted_bboxes: Optional[List[BBox]] = None,
) -> np.ndarray:
    patch_size = patches.shape[1]
    figure = plt.figure()
    axe = figure.gca()

    img = np.asarray(image)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    img = img * 0.8 + 0.2
    axe.imshow(np.clip(img, 0, 1), vmin=0, vmax=1)
    axe.set_xticks(np.arange(0, img.shape[1], patch_size))
    axe.set_yticks(np.arange(0, img.shape[0], patch_size))
    axe.grid(visible=True, color="white")

    # Progressive red-scale markers over visited patches.
    overlay = np.zeros(img.shape[:2] + (4,))
    n = max(len(positions), 1)
    for i, pos in enumerate(np.asarray(positions)):
        coeff = 0.3 + (i / n) * 0.7
        y, x = int(pos[0]) * patch_size, int(pos[1]) * patch_size
        overlay[y : y + patch_size, x : x + patch_size] = [coeff, 0, 0, 0.3]
    axe.imshow(overlay)

    for bbox in predicted_bboxes or []:
        _plot_bbox(axe, bbox, "blue")
    for bbox in true_bboxes or []:
        if not isinstance(bbox, BBox):
            b = np.asarray(bbox, np.float64).reshape(-1)
            bbox = BBox(Position(y=b[1], x=b[0]), Position(y=b[3], x=b[2]))
        _plot_bbox(axe, bbox, "green")

    canvas = figure.canvas
    canvas.draw()
    data = np.frombuffer(canvas.buffer_rgba(), dtype=np.uint8)
    out = data.reshape(canvas.get_width_height()[::-1] + (4,))[..., :3]
    figure.clear()
    plt.close(figure)
    return (out.astype(np.float32) / 255.0).transpose(2, 0, 1)


def save_batch(images: np.ndarray, path: str, n_cols: int = 4):
    """Dump a batch of images as one mosaic PNG (debugging aid; reference:
    src/utils.py:396-423, cv2 replaced by PIL).

    ``images``: [B, H, W, C] floats in [0, 1] or uint8 in [0, 255].
    """
    from PIL import Image

    images = np.asarray(images)
    if images.dtype == np.uint8:
        images = images.astype(np.float32) / 255.0
    b, h, w, c = images.shape
    n_rows = -(-b // n_cols)
    mosaic = np.zeros((n_rows * h, n_cols * w, c), np.float32)
    for i in range(b):
        r, col = divmod(i, n_cols)
        mosaic[r * h : (r + 1) * h, col * w : (col + 1) * w] = images[i]
    Image.fromarray(
        np.clip(mosaic * 255, 0, 255).astype(np.uint8)
    ).save(path)
