"""Dataset-layer unit tests: path resolution/splits, class filtering, the
one-random-class per-sample rule, min-size upscale, and collates
(reference behavior: src/dataset.py:65-93, 228-347, 409-487)."""

import numpy as np
import pytest
from PIL import Image

from jolineedle_tpu.data.dataset import (
    NeedleDataset,
    build_datasets,
    complete_to_patch_size,
    filter_images,
    get_paths,
)


def _write_sample(directory, name, size=(64, 48), boxes=()):
    """One image + bbox-txt pair; boxes are (class_id, x1, y1, x2, y2)."""
    img_path = directory / f"{name}.png"
    bbox_path = directory / f"{name}.txt"
    arr = np.full(size + (3,), 128, np.uint8)
    Image.fromarray(arr).save(img_path)
    with open(bbox_path, "w") as f:
        for row in boxes:
            f.write(" ".join(str(v) for v in row) + "\n")
    return img_path, bbox_path


def _make_listed_dataset(tmp_path, names, list_name):
    lines = []
    for name in names:
        img, bb = _write_sample(
            tmp_path, name, boxes=[(0, 4, 4, 20, 20)]
        )
        lines.append(f"{img.name} {bb.name}\n")
    with open(tmp_path / list_name, "w") as f:
        f.writelines(lines)


def test_get_paths_native_split(tmp_path):
    _make_listed_dataset(tmp_path, ["tr_a", "tr_b"], "train.txt")
    _make_listed_dataset(tmp_path, ["te_a"], "test.txt")
    tr_i, tr_b, te_i, te_b = get_paths(tmp_path)
    assert len(tr_i) == len(tr_b) == 2
    assert len(te_i) == len(te_b) == 1
    # Relative entries resolve against the list file's directory.
    assert all(str(tmp_path) in p for p in tr_i + te_i)


def test_get_paths_test_pattern(tmp_path):
    _make_listed_dataset(
        tmp_path, ["scene_day_1", "scene_day_2", "scene_night_1"], "all.txt"
    )
    tr_i, _, te_i, _ = get_paths(tmp_path, test_pattern="night")
    assert len(tr_i) == 2 and len(te_i) == 1
    assert "night" in te_i[0]


def test_get_paths_fallback_split_is_deterministic(tmp_path):
    _make_listed_dataset(tmp_path, [f"img_{i}" for i in range(10)], "paths.txt")
    a = get_paths(tmp_path, seed=7, test_size=0.2)
    b = get_paths(tmp_path, seed=7, test_size=0.2)
    assert a == b
    assert len(a[2]) == 2  # 20% of 10
    assert set(a[0]).isdisjoint(set(a[2]))


def test_get_paths_missing_lists_raises(tmp_path):
    with pytest.raises(RuntimeError):
        get_paths(tmp_path)


def test_filter_images_and_class_remap(tmp_path):
    img1, bb1 = _write_sample(tmp_path, "a", boxes=[(3, 0, 0, 8, 8)])
    img2, bb2 = _write_sample(tmp_path, "b", boxes=[(5, 0, 0, 8, 8)])
    fi, fb = filter_images({3}, [img1, img2], [bb1, bb2])
    assert fi == [img1] and fb == [bb1]

    ds = NeedleDataset(
        [str(img1)], [str(bb1)], patch_size=16, max_ep_len=4,
        rotations=False, translations=False, min_keypoints=0,
        max_keypoints=0, binomial_keypoints=False, minimum_image_size=0,
        filter_classes={3, 7},
    )
    classes, boxes = ds.get_all_bboxes(0)
    # Raw class 3 remaps to ordered index 0 (of sorted {3, 7}).
    assert classes == [0]
    assert boxes.shape == (1, 4)


def test_getitem_picks_one_class_and_filters_boxes(tmp_path):
    img, bb = _write_sample(
        tmp_path,
        "multi",
        boxes=[(1, 0, 0, 8, 8), (2, 10, 10, 20, 20), (2, 30, 10, 40, 20)],
    )
    ds = NeedleDataset(
        [str(img)], [str(bb)], patch_size=16, max_ep_len=4,
        rotations=False, translations=False, min_keypoints=0,
        max_keypoints=0, binomial_keypoints=False, minimum_image_size=0,
    )
    seen = set()
    for seed in range(40):
        item = ds.__getitem__(0, np.random.default_rng(seed))
        seen.add(item["class_id"])
        expected = {1: 1, 2: 2}[item["class_id"]]
        assert len(item["bboxes"]) == expected
    assert seen == {1, 2}  # both classes get sampled across seeds


def test_min_size_upscale_rescales_boxes(tmp_path):
    img, bb = _write_sample(
        tmp_path, "small", size=(40, 80), boxes=[(0, 10, 20, 30, 40)]
    )  # PIL size=(w,h)=(64,48)? here arr shape (40, 80): H=40, W=80
    ds = NeedleDataset(
        [str(img)], [str(bb)], patch_size=16, max_ep_len=4,
        rotations=False, translations=False, min_keypoints=0,
        max_keypoints=0, binomial_keypoints=False, minimum_image_size=80,
    )
    item = ds.__getitem__(0, np.random.default_rng(0))
    h, w = item["image"].shape[:2]
    # H doubled 40 -> 80 (W follows aspect), then padded to patch multiple.
    assert h % 16 == 0 and w % 16 == 0 and h >= 80
    np.testing.assert_allclose(
        item["bboxes"][0], [20, 40, 60, 80], atol=1e-6
    )


def test_complete_to_patch_size_pads_bottom_right():
    img = np.ones((30, 50, 3), np.float32)
    out = complete_to_patch_size(img, 16)
    assert out.shape == (32, 64, 3)
    np.testing.assert_array_equal(out[:30, :50], img)
    assert out[30:].sum() == 0 and out[:, 50:].sum() == 0


def test_padded_collate_pads_to_patch_multiple():
    batch = [
        {
            "image": np.ones((30, 40, 3), np.float32),
            "bboxes": np.array([[0, 0, 5, 5]], np.float32),
            "class_id": 0,
        },
        {
            "image": np.ones((50, 20, 3), np.float32),
            "bboxes": np.zeros((0, 4), np.float32),
            "class_id": 1,
        },
    ]
    out = NeedleDataset.padded_collate_fn(batch, patch_size=16)
    assert out["image"].shape == (2, 64, 48, 3)
    assert out["bboxes"].shape == (2, 1, 4)
    assert (out["bboxes"][1] == 0).all()  # padded rows are all-zero
    assert out["class_id"].tolist() == [0, 1]


def test_build_datasets_train_size_cap(tmp_path):
    _make_listed_dataset(tmp_path, [f"t{i}" for i in range(6)], "train.txt")
    _make_listed_dataset(tmp_path, ["v0"], "test.txt")
    train, test = build_datasets(
        tmp_path, patch_size=16, max_ep_len=4, min_keypoints=0,
        max_keypoints=0, rotations=False, translations=False,
        train_size=3,
    )
    assert len(train) == 3 and len(test) == 1


def test_toy_dataset_box_size_range(tmp_path):
    """The --box-size knob bounds every generated target edge (the
    LARD-like sub-patch variant relies on this, docs/experiment_log.md
    2026-08-20)."""
    from jolineedle_tpu.data.toy import generate_toy_dataset

    out = generate_toy_dataset(
        tmp_path / "toy", n_train=3, n_test=2, image_size=(128, 160),
        seed=5, box_size=(12, 40),
    )
    n_boxes = 0
    for bbox_file in (out / "bboxes").glob("*.txt"):
        for line in bbox_file.read_text().splitlines():
            _, x1, y1, x2, y2 = map(int, line.split())
            assert 12 <= x2 - x1 < 40 and 12 <= y2 - y1 < 40
            n_boxes += 1
    assert n_boxes >= 5


def test_toy_dataset_runway_topology(tmp_path):
    """The runway variant emits exactly ONE elongated contiguous target per
    image, 3-6 patch-LENGTHS long and sub-2-patch thick at patch 64 — the
    LARD runway topology probe (docs/experiment_log.md round 5)."""
    from jolineedle_tpu.data.toy import generate_toy_dataset

    out = generate_toy_dataset(
        tmp_path / "toy", n_train=4, n_test=2, image_size=(320, 448),
        seed=3, context=True, runway=True,
    )
    for bbox_file in (out / "bboxes").glob("*.txt"):
        lines = bbox_file.read_text().splitlines()
        assert len(lines) == 1  # one target per image
        _, x1, y1, x2, y2 = map(int, lines[0].split())
        long_edge = max(x2 - x1, y2 - y1)
        short_edge = min(x2 - x1, y2 - y1)
        assert 192 <= long_edge <= 384  # 3-6 patch lengths
        assert 16 <= short_edge <= 40  # sub-patch thickness
        # Spans >=3 patch cells along the long axis at patch 64.
        if x2 - x1 >= y2 - y1:
            assert (x2 - 1) // 64 - x1 // 64 + 1 >= 3
        else:
            assert (y2 - 1) // 64 - y1 // 64 + 1 >= 3
