"""Detection-target splitting + mAP tests (port of reference tests/test_map.py)."""

import numpy as np
import pytest

from jolineedle_tpu.env.parsing import detection_targets_full_image
from jolineedle_tpu.utils import compute_detection_metrics, patch_bboxes2full_image


def test_detection_targets_split():
    boxes = np.array([[410, 410, 500, 500], [1500, 1500, 1600, 1600]], np.float64)
    valid = np.array([True, True])
    targets = detection_targets_full_image(boxes, valid, 1792 // 448, 2240 // 448, 448)
    expected = np.array(
        [
            [0, 410, 410, 447, 447],
            [0, 448, 410, 500, 447],
            [0, 410, 448, 447, 500],
            [0, 448, 448, 500, 500],
            [0, 1500, 1500, 1600, 1600],
        ],
        dtype=np.int64,
    )
    assert np.array_equal(targets, expected), targets


def test_map_values():
    boxes = np.array([[410, 410, 500, 500], [1500, 1500, 1600, 1600]], np.float64)
    valid = np.array([True, True])
    targets = [detection_targets_full_image(boxes, valid, 4, 5, 448)]

    metrics = compute_detection_metrics([None], targets)
    assert metrics["map"] == pytest.approx(0.0)

    preds2 = [
        np.array(
            [
                [410, 410, 447, 446, 0.5, 1],
                [448, 410, 500, 447, 0.9, 1],
                [410, 448, 447, 500, 0.8, 1],
                [448, 448, 500, 500, 0.7, 1],
                [1500, 1500, 1600, 1600, 0.6, 1],
            ]
        )
    ]
    metrics = compute_detection_metrics(preds2, targets)
    assert metrics["map"] == pytest.approx(1)

    preds3 = [
        np.array(
            [
                [410, 410, 447, 446, 0.5, 1],
                [410, 448, 447, 500, 0.8, 1],
                [448, 448, 500, 500, 0.7, 1],
                [1500, 1500, 1600, 1600, 0.6, 1],
            ]
        )
    ]
    metrics = compute_detection_metrics(preds3, targets)
    assert metrics["map"] == pytest.approx(0.8, 0.01)


def test_bbox2full_image():
    patch_boxes = [
        [
            np.array([[20, 40, 30, 100], [40, 60, 100, 90]]),
            np.array([[38, 6, 90, 10]]),
            None,
            np.array([[70, 30, 89, 59]]),
        ]
    ]
    offsets = np.array([[[448, 0], [448, 448], [448, 896], [448, 1344]]])
    masks = np.array([[True, True, True, False]])

    results = patch_bboxes2full_image(patch_boxes, offsets, masks)
    expect = np.array(
        [[468, 40, 478, 100], [488, 60, 548, 90], [486, 454, 538, 458]]
    )
    assert np.array_equal(results[0], expect)
