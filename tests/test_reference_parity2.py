"""More direct reference-parity tests (round-2 widening).

Covers, verbatim against the imported reference code:
  - dataset rotate/translate box+image remaps (reference:
    src/dataset.py:95-226),
  - merge_boxes pred/target forms incl. the double-grouping quirk
    (reference: src/utils.py:185-255),
  - oracle generate_sample trajectories under 0 random keypoints
    (reference: src/env/simple_env.py:481-664).

The reference's dataset module imports torchvision and sklearn, which are
not installed; they are stubbed below. The only stubbed function actually
*executed* is ``torchvision.transforms.functional.affine`` restricted to
angle=0/scale=1/shear=0 — a pure integer translation with zero fill, whose
semantics (positive tx -> shift right, positive ty -> shift down) are
unambiguous. All bbox/margin math under test is pure reference code.
"""

import sys
import types

import numpy as np
import pytest

if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

pytest.importorskip("src.utils", reason="reference repo not importable")


# --- reference dataset import with stubs ------------------------------------
def _import_ref_dataset():
    if "src.dataset" in sys.modules:
        return sys.modules["src.dataset"]
    import torch

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        transforms_mod = types.ModuleType("torchvision.transforms")
        func_mod = types.ModuleType("torchvision.transforms.functional")

        class ToTensor:
            def __call__(self, x):
                arr = np.asarray(x, np.float32) / 255.0
                return torch.from_numpy(arr.transpose(2, 0, 1))

        def affine(img, angle, translate, scale, shear, fill=0.0):
            assert angle == 0 and scale == 1.0 and shear == 0.0
            tx, ty = int(translate[0]), int(translate[1])
            out = torch.zeros_like(img)
            _, h, w = img.shape
            sy = slice(max(0, -ty), h - max(0, ty))
            dy = slice(max(0, ty), h - max(0, -ty))
            sx = slice(max(0, -tx), w - max(0, tx))
            dx = slice(max(0, tx), w - max(0, -tx))
            out[:, dy, dx] = img[:, sy, sx]
            return out

        transforms_mod.ToTensor = ToTensor
        transforms_mod.functional = func_mod
        func_mod.affine = affine
        tv.transforms = transforms_mod
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms_mod
        sys.modules["torchvision.transforms.functional"] = func_mod

    if "sklearn" not in sys.modules:
        sk = types.ModuleType("sklearn")
        skms = types.ModuleType("sklearn.model_selection")

        def train_test_split(*a, **k):  # imported, never called here
            raise NotImplementedError

        skms.train_test_split = train_test_split
        sk.model_selection = skms
        sys.modules["sklearn"] = sk
        sys.modules["sklearn.model_selection"] = skms

    import src.dataset as ref_ds

    return ref_ds


class _ScriptedRng:
    """Replays scripted draws while recording the (low, high) bounds each
    implementation requested — bound equality IS the margin-math parity."""

    def __init__(self, values):
        self.values = list(values)
        self.calls = []

    def _next(self):
        return self.values.pop(0)

    def integers(self, low, high=None, size=None):
        self.calls.append(("integers", int(low), int(high)))
        v = self._next()
        if size is not None:
            return np.full(np.prod(size, dtype=int), v, dtype=np.int64).reshape(
                size
            )
        return np.int64(v)

    def choice(self, a, size=None):
        n = len(a) if hasattr(a, "__len__") else int(a)
        self.calls.append(("choice", 0, n))
        v = self._next()
        if size is not None:
            return np.full(size, v, dtype=np.int64)
        return np.int64(v)


def _boxes_to_bbox_list(boxes):
    from src.utils import BBox, Position

    return [
        BBox(
            up_left=Position(y=float(b[1]), x=float(b[0])),
            bottom_right=Position(y=float(b[3]), x=float(b[2])),
        )
        for b in boxes
    ]


def _bbox_list_to_boxes(bboxes):
    return np.array(
        [
            [b.up_left.x, b.up_left.y, b.bottom_right.x, b.bottom_right.y]
            for b in bboxes
        ],
        np.float64,
    )


@pytest.mark.parametrize("angle_id", [0, 1, 2, 3])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rotate_matches_reference(angle_id, seed):
    import torch

    from jolineedle_tpu.data.dataset import NeedleDataset

    ref_ds = _import_ref_dataset()
    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(3, 9)) * 16, int(rng.integers(3, 9)) * 16
    image = rng.random((h, w, 3)).astype(np.float32)
    n = int(rng.integers(1, 4))
    boxes = np.stack(
        [
            np.array(
                [x1, y1, x1 + rng.integers(4, 40), y1 + rng.integers(4, 40)],
                np.float64,
            )
            for x1, y1 in zip(
                rng.integers(0, w - 40, n), rng.integers(0, h - 40, n)
            )
        ]
    )

    img_ref, bb_ref = ref_ds.NeedleDataset.rotate(
        None,
        torch.from_numpy(image.transpose(2, 0, 1)),
        _boxes_to_bbox_list(boxes),
        rng=_ScriptedRng([angle_id]),
    )
    img_ours, bb_ours = NeedleDataset.rotate(
        image, boxes.copy(), _ScriptedRng([angle_id])
    )

    np.testing.assert_allclose(
        img_ours, img_ref.numpy().transpose(1, 2, 0), atol=0
    )
    np.testing.assert_allclose(bb_ours, _bbox_list_to_boxes(bb_ref), atol=0)


@pytest.mark.parametrize("seed", range(6))
def test_translate_matches_reference(seed):
    import torch

    from jolineedle_tpu.data.dataset import NeedleDataset

    ref_ds = _import_ref_dataset()
    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(3, 9)) * 16, int(rng.integers(3, 9)) * 16
    image = rng.random((h, w, 3)).astype(np.float32)
    n = int(rng.integers(1, 4))
    boxes = np.stack(
        [
            np.array(
                [x1, y1, x1 + rng.integers(4, 40), y1 + rng.integers(4, 40)],
                np.float64,
            )
            for x1, y1 in zip(
                rng.integers(0, w - 40, n), rng.integers(0, h - 40, n)
            )
        ]
    )

    # Scripted translation draws; both impls must request the SAME bounds
    # (the margin math) and then produce the same image/boxes.
    script = [3, -2]
    ref_rng = _ScriptedRng(list(script))
    our_rng = _ScriptedRng(list(script))
    img_ref, bb_ref = ref_ds.NeedleDataset.translate(
        None,
        torch.from_numpy(image.transpose(2, 0, 1)),
        _boxes_to_bbox_list(boxes),
        rng=ref_rng,
    )
    img_ours, bb_ours = NeedleDataset.translate(image, boxes.copy(), our_rng)

    assert ref_rng.calls == our_rng.calls, (
        f"margin bounds diverge: {ref_rng.calls} vs {our_rng.calls}"
    )
    np.testing.assert_allclose(
        img_ours, img_ref.numpy().transpose(1, 2, 0), atol=0
    )
    np.testing.assert_allclose(bb_ours, _bbox_list_to_boxes(bb_ref), atol=0)


def test_translate_zero_margin_guard_matches_reference():
    """Boxes touching every border -> margins 0 on both axes; both impls
    must skip the rng draw entirely (reference: src/dataset.py:181-199)."""
    import torch

    from jolineedle_tpu.data.dataset import NeedleDataset

    ref_ds = _import_ref_dataset()
    h = w = 64
    image = np.random.default_rng(0).random((h, w, 3)).astype(np.float32)
    boxes = np.array([[0.0, 0.0, 64.0, 64.0]])

    ref_rng = _ScriptedRng([])
    our_rng = _ScriptedRng([])
    img_ref, bb_ref = ref_ds.NeedleDataset.translate(
        None,
        torch.from_numpy(image.transpose(2, 0, 1)),
        _boxes_to_bbox_list(boxes),
        rng=ref_rng,
    )
    img_ours, bb_ours = NeedleDataset.translate(image, boxes.copy(), our_rng)
    assert ref_rng.calls == our_rng.calls == []
    np.testing.assert_allclose(
        img_ours, img_ref.numpy().transpose(1, 2, 0), atol=0
    )
    np.testing.assert_allclose(bb_ours, _bbox_list_to_boxes(bb_ref), atol=0)


# --- merge_boxes -------------------------------------------------------------
@pytest.mark.parametrize("seed", range(10))
@pytest.mark.parametrize("target", [False, True])
def test_merge_boxes_matches_reference(seed, target):
    import torch

    from src.utils import merge_boxes as ref_merge

    from jolineedle_tpu.utils.geometry import merge_boxes as our_merge

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 9))
    xy = rng.integers(0, 60, (n, 2)).astype(np.float64)
    wh = rng.integers(2, 30, (n, 2)).astype(np.float64)
    xyxy = np.concatenate([xy, xy + wh], axis=1)
    if target:
        rows = np.concatenate([np.zeros((n, 1)), xyxy], axis=1)
    else:
        conf = rng.random((n, 2))
        rows = np.concatenate([xyxy, conf, np.ones((n, 1))], axis=1)

    ref = ref_merge(torch.from_numpy(rows), threshold=2, target=target).numpy()
    ours = our_merge(rows, threshold=2, target=target)
    assert ref.shape == ours.shape
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_merge_boxes_double_grouping_quirk_matches_reference():
    """The greedy grouping can emit one box in two groups (documented quirk,
    geometry.py:95-100); both impls must produce the same duplicated
    output."""
    import torch

    from src.utils import merge_boxes as ref_merge

    from jolineedle_tpu.utils.geometry import merge_boxes as our_merge

    # i=0 groups {0, 1}; j=2 is near 1 but not near 0, so seed i=1 is
    # consumed by group 0 while i=2 seeds a new group that re-includes
    # nothing -> classic shape: 1 bridges 0 and 2.
    rows = np.array(
        [
            [0.0, 0.0, 10.0, 10.0, 0.9, 1.0, 1.0],
            [11.0, 0.0, 20.0, 10.0, 0.8, 1.0, 1.0],
            [21.0, 0.0, 30.0, 10.0, 0.7, 1.0, 1.0],
        ]
    )
    ref = ref_merge(torch.from_numpy(rows), threshold=2).numpy()
    ours = our_merge(rows, threshold=2)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


# --- oracle generate_sample ---------------------------------------------------
def _tie_free_keypoint_order(bbox_patches, start):
    """Greedy nearest-neighbour order; returns None when any step has a
    Manhattan-distance tie (those scenes are rng-order dependent)."""
    to_visit = set(bbox_patches)
    order, current = [], tuple(start)
    while to_visit:
        dists = sorted(
            (abs(p[0] - current[0]) + abs(p[1] - current[1]), p)
            for p in to_visit
        )
        if len(dists) > 1 and dists[0][0] == dists[1][0]:
            return None
        pick = dists[0][1]
        order.append(pick)
        to_visit.remove(pick)
        current = pick
    return order


@pytest.mark.parametrize("seed", range(12))
@pytest.mark.parametrize("max_ep_len", [24, 6])
def test_generate_sample_matches_reference(seed, max_ep_len):
    """Zero random keypoints + tie-free scenes -> the oracle trajectory is
    deterministic; positions/actions/labels/masks must match the reference
    exactly (max_ep_len=6 additionally exercises keep-the-tail truncation,
    reference: src/env/simple_env.py:573-584). The final valid step's
    next_action is a random STOP replacement in both impls and is excluded."""
    import torch

    from src.env.simple_env import NeedleSimpleEnv
    from src.utils import Position

    from jolineedle_tpu.env.oracle import OracleEnv, generate_sample

    rng = np.random.default_rng(100 + seed)
    patch = 32
    nv, nh = int(rng.integers(3, 7)), int(rng.integers(3, 7))
    h, w = nv * patch, nh * patch
    n = int(rng.integers(1, 4))
    boxes = []
    for _ in range(n):
        x1 = float(rng.integers(0, w - 8))
        y1 = float(rng.integers(0, h - 8))
        boxes.append(
            [
                x1,
                y1,
                float(rng.integers(int(x1) + 4, min(int(x1) + 40, w))),
                float(rng.integers(int(y1) + 4, min(int(y1) + 40, h))),
            ]
        )
    boxes = np.array(boxes, np.float64)

    ours_env = OracleEnv((h, w), patch, boxes, rng=np.random.default_rng(0))
    # Pick a start cell (outside the bbox patches, so visited-set seeding is
    # inert) whose greedy keypoint ordering is tie-free at every step —
    # tie-breaks draw from each impl's own rng and are order-dependent.
    start = None
    for cand in [
        (y, x)
        for y in range(nv)
        for x in range(nh)
        if (y, x) not in ours_env.bbox_patches
    ]:
        if _tie_free_keypoint_order(ours_env.bbox_patches, cand) is not None:
            start = cand
            break
    if start is None:
        pytest.skip("no tie-free start in this scene")

    ref_env = NeedleSimpleEnv(
        torch.zeros((3, h, w)), patch, _boxes_to_bbox_list(boxes), seed=0
    )
    ref_sample = ref_env.generate_sample(
        max_ep_len,
        min_keypoints=0,
        max_keypoints=0,
        position=Position(y=start[0], x=start[1]),
    )
    our_sample = generate_sample(
        ours_env, max_ep_len, 0, 0, position=start
    )

    ref_masks = ref_sample["masks"].numpy().astype(np.float32)
    np.testing.assert_array_equal(our_sample["masks"], ref_masks)
    n_valid = int(ref_masks.sum())
    s = slice(0, n_valid)
    np.testing.assert_array_equal(
        our_sample["positions"][s], ref_sample["positions"].numpy()[s]
    )
    np.testing.assert_array_equal(
        our_sample["current_actions"][s],
        ref_sample["current_actions"].numpy()[s],
    )
    np.testing.assert_array_equal(
        our_sample["labels"][s], ref_sample["labels"].numpy()[s]
    )
    # All but the final valid label are deterministic.
    det = slice(0, max(0, n_valid - 1))
    np.testing.assert_array_equal(
        our_sample["next_actions"][det],
        ref_sample["next_actions"].numpy()[det],
    )
    # Local bboxes: same rows up to ordering (ours fronts objectness rows).
    for t in range(n_valid):
        ref_rows = ref_sample["local_bboxes"][t].numpy()
        our_rows = our_sample["local_bboxes"][t]
        np.testing.assert_allclose(
            np.sort(our_rows, axis=0), np.sort(ref_rows, axis=0), atol=1e-5
        )
