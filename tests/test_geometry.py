"""Host-side geometry/serialization unit tests (fast, no XLA compiles)."""

import numpy as np


def test_merge_boxes_groups_adjacent():
    from jolineedle_tpu.utils.geometry import merge_boxes

    # Two boxes 1px apart (edge distance <= 2) merge; the far one survives.
    boxes = np.array(
        [
            [0, 0, 10, 10, 0.9, 0.8],
            [11, 0, 20, 10, 0.5, 0.9],
            [100, 100, 110, 110, 0.7, 0.6],
        ],
        np.float64,
    )
    merged = merge_boxes(boxes, threshold=2, target=False)
    assert len(merged) == 2
    big = merged[np.argmin(merged[:, 0])]
    np.testing.assert_allclose(big[:4], [0, 0, 20, 10])
    # Confidence = max of obj*cls over the group (reference: utils.py:244-250).
    assert np.isclose(big[4], max(0.9 * 0.8, 0.5 * 0.9))


def test_merge_boxes_target_mode():
    from jolineedle_tpu.utils.geometry import merge_boxes

    boxes = np.array([[0, 5, 5, 15, 15], [0, 16, 5, 30, 15]], np.float64)
    merged = merge_boxes(boxes, threshold=2, target=True)
    assert len(merged) == 1
    np.testing.assert_allclose(merged[0], [0, 5, 5, 30, 15])


def test_parse_bbox_predictions_offsets():
    from jolineedle_tpu.utils.geometry import parse_bbox_predictions

    outputs = [np.array([[1.0, 2.0, 3.0, 4.0, 0.9]]), None]
    positions = np.array([[1, 2], [0, 0]])  # (y, x) patch coords
    parsed = parse_bbox_predictions(outputs, positions, patch_size=10)
    assert len(parsed) == 1
    b = parsed[0]
    assert (b.up_left.x, b.up_left.y) == (21.0, 12.0)
    assert (b.bottom_right.x, b.bottom_right.y) == (23.0, 14.0)


def test_rotate_four_times_is_identity():
    from jolineedle_tpu.data.dataset import NeedleDataset

    rng = np.random.default_rng(0)
    image = rng.random((40, 60, 3)).astype(np.float32)
    boxes = np.array([[5.0, 8.0, 20.0, 30.0]])

    class FixedRng:
        def integers(self, lo, hi):
            return 1  # always 90 degrees

    img, bxs = image, boxes
    for _ in range(4):
        img, bxs = NeedleDataset.rotate(img, bxs, FixedRng())
    np.testing.assert_allclose(img, image)
    np.testing.assert_allclose(bxs, boxes)


def test_translate_keeps_boxes_inside():
    from jolineedle_tpu.data.dataset import NeedleDataset

    rng = np.random.default_rng(1)
    image = rng.random((60, 90, 3)).astype(np.float32)
    boxes = np.array([[30.0, 20.0, 50.0, 40.0]])
    for seed in range(10):
        img, bxs = NeedleDataset.translate(
            image, boxes, np.random.default_rng(seed)
        )
        assert img.shape == image.shape
        assert bxs[0, 0] >= 0 and bxs[0, 1] >= 0
        assert bxs[0, 2] <= 90 and bxs[0, 3] <= 60


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from jolineedle_tpu import checkpoint as ckpt
    from jolineedle_tpu.train.trainer import TrainState

    state = TrainState(
        params={"a": jnp.arange(3.0), "yolox": {"w": jnp.ones((2, 2))}},
        batch_stats={"yolox": {"m": jnp.zeros(2)}},
        opt_state={"count": jnp.zeros((), jnp.int32)},
        step=jnp.int32(7),
    )
    path = tmp_path / "ck.msgpack"
    ckpt.save_checkpoint(path, state)

    template = TrainState(
        params={"a": jnp.zeros(3), "yolox": {"w": jnp.zeros((2, 2))}},
        batch_stats={"yolox": {"m": jnp.ones(2)}},
        opt_state={"count": jnp.ones((), jnp.int32)},
        step=jnp.int32(0),
    )
    restored = ckpt.load_checkpoint(path, template)
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.params["a"]), [0, 1, 2])

    # Detection-only grafting: yolox subtree replaced, the rest kept.
    other = template.replace(params={**template.params, "a": jnp.full(3, 9.0)})
    ckpt.save_checkpoint(path, state)
    grafted = ckpt.load_detection_params(path, other)
    np.testing.assert_allclose(np.asarray(grafted.params["a"]), [9, 9, 9])
    np.testing.assert_allclose(
        np.asarray(grafted.params["yolox"]["w"]), np.ones((2, 2))
    )
