"""Direct behavioral parity tests against the reference implementation.

The reference's `src/env/simple_env.py` only needs torch + einops, both
available, so the trickiest semantics — bbox->patch assignment (5% area
threshold + guaranteed center patch) and per-patch local box intersection —
are checked VERBATIM against the reference code over randomized geometries
(SURVEY.md "hard parts": oracle semantics determine supervised mAP parity).
"""

import sys

import numpy as np
import pytest

# APPEND (never insert at 0): the reference root also contains main.py and
# infer.py, which must not shadow this repo's modules for the other tests.
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

ref_env_mod = pytest.importorskip(
    "src.env.simple_env", reason="reference repo not importable"
)


def _ref_env(h, w, patch_size, boxes, seed=0):
    import torch

    from src.utils import BBox, Position

    bboxes = [
        BBox(
            up_left=Position(y=float(b[1]), x=float(b[0])),
            bottom_right=Position(y=float(b[3]), x=float(b[2])),
        )
        for b in boxes
    ]
    image = torch.zeros((3, h, w))
    return ref_env_mod.NeedleSimpleEnv(image, patch_size, bboxes, seed=seed)


def _random_boxes(rng, h, w, n):
    boxes = []
    for _ in range(n):
        x1 = float(rng.integers(0, w - 8))
        y1 = float(rng.integers(0, h - 8))
        x2 = float(rng.integers(int(x1) + 4, min(int(x1) + 300, w)))
        y2 = float(rng.integers(int(y1) + 4, min(int(y1) + 300, h)))
        boxes.append([x1, y1, x2, y2])
    return np.array(boxes, np.float64)


@pytest.mark.parametrize("seed", range(8))
def test_bbox_patches_match_reference(seed):
    from jolineedle_tpu.env.oracle import OracleEnv

    rng = np.random.default_rng(seed)
    patch = int(rng.choice([32, 64, 100]))
    nv = int(rng.integers(2, 7))
    nh = int(rng.integers(2, 7))
    h, w = nv * patch, nh * patch
    boxes = _random_boxes(rng, h, w, int(rng.integers(1, 4)))

    ours = OracleEnv((h, w), patch, boxes)
    ref = _ref_env(h, w, patch, boxes)
    ref_set = {(int(p.y), int(p.x)) for p in ref.bbox_patches}
    assert ours.bbox_patches == ref_set


@pytest.mark.parametrize("seed", range(8))
def test_local_bboxes_match_reference(seed):
    from jolineedle_tpu.env.oracle import OracleEnv

    rng = np.random.default_rng(seed)
    patch = int(rng.choice([32, 64]))
    nv, nh = 4, 5
    h, w = nv * patch, nh * patch
    boxes = _random_boxes(rng, h, w, 2)

    ours = OracleEnv((h, w), patch, boxes)
    ref = _ref_env(h, w, patch, boxes)

    from src.utils import Position

    for y in range(nv):
        for x in range(nh):
            ours_rows = ours.local_bboxes((y, x))
            ref_rows = ref.local_bboxes(Position(y=y, x=x)).numpy()
            np.testing.assert_allclose(ours_rows, ref_rows, atol=1e-5)


def test_move_towards_matches_reference():
    from src.env.simple_env import move_towards as ref_move
    from src.utils import Position

    from jolineedle_tpu.env.oracle import move_towards as our_move

    for cy in range(5):
        for cx in range(5):
            for ty in range(5):
                for tx in range(5):
                    ours = our_move((cy, cx), (ty, tx))
                    ref = ref_move(Position(y=cy, x=cx), Position(y=ty, x=tx))
                    assert ours.value == ref.value, (
                        f"({cy},{cx})->({ty},{tx}): {ours} vs {ref}"
                    )
