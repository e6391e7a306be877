"""Unit tests for the shared batched-eval dispatcher
(Trainer._batched_eval_rollouts): shape grouping, chunking, pad-by-repeat,
and per-row result slicing."""

import numpy as np

from jolineedle_tpu.train.trainer import Trainer


class _FakeTrainer:
    """Duck-typed receiver for the unbound Trainer method."""

    EVAL_CHUNK = 2

    class _Cfg:
        max_boxes = 3
        seed = 0

    config = _Cfg()

    def __init__(self):
        self.calls = []  # (image_shape, batch_size)

    def _dispatch_eval_rollout(self, shape, images, boxes, rows, key, sample):
        self.calls.append((shape, images.shape[0]))
        # Identify each row by its image's mean so slicing can be verified.
        return {
            "tag": images.mean(axis=(1, 2, 3)),
            "boxes_sum": boxes.sum(axis=(1, 2)),
        }

    _batched_eval_rollouts = Trainer._batched_eval_rollouts


def _row(value, shape=(8, 8, 3), boxes=((0, 0, 4, 4),)):
    # Images are float in [0, 1]; the dispatcher ships them as uint8
    # (value/255 -> uint8 value), so the fake's "tag" reads back `value`.
    return {
        "image": np.full(shape, float(value) / 255.0, np.float32),
        "boxes": np.asarray(boxes, np.float32),
    }


def test_groups_by_shape_and_chunks_with_padding():
    trainer = _FakeTrainer()
    rows = [
        _row(1),  # shape A
        _row(2, shape=(16, 8, 3)),  # shape B
        _row(3),  # shape A
        _row(4),  # shape A -> forces a padded second chunk for A
    ]
    results = trainer._batched_eval_rollouts(rows, sample_actions=False)

    # Shape A (3 rows, chunk 2): two dispatches of batch 2 (last padded by
    # repeating row 4); shape B: one dispatch of batch 1.
    assert sorted(trainer.calls) == [
        ((8, 8, 3), 2),
        ((8, 8, 3), 2),
        ((16, 8, 3), 1),
    ]
    # Every row gets its own single-row slice, in input order.
    for row, res in zip(rows, results):
        assert res["tag"].shape == (1,)
        assert float(res["tag"][0]) == round(float(row["image"][0, 0, 0]) * 255)


def test_box_padding_and_cap():
    trainer = _FakeTrainer()
    # 5 boxes with max_boxes=3: only the first 3 survive (warned once).
    boxes = [(0, 0, 1, 1)] * 5
    results = trainer._batched_eval_rollouts(
        [_row(1, boxes=boxes)], sample_actions=False
    )
    assert float(results[0]["boxes_sum"][0]) == 3 * 2.0  # 3 rows of (0,0,1,1)


def test_single_shape_single_chunk():
    trainer = _FakeTrainer()
    results = trainer._batched_eval_rollouts(
        [_row(7), _row(9)], sample_actions=False
    )
    assert trainer.calls == [((8, 8, 3), 2)]
    assert [float(r["tag"][0]) for r in results] == [7.0, 9.0]
