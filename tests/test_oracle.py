"""Oracle trajectory generator tests (reference: src/env/simple_env.py:481-664)."""

import numpy as np

from jolineedle_tpu.env import Action, generate_sample
from jolineedle_tpu.env.oracle import OracleEnv, move_towards


def test_move_towards():
    assert move_towards((0, 0), (0, 5)) == Action.RIGHT
    assert move_towards((5, 5), (2, 2)) == Action.LEFT_UP
    assert move_towards((2, 2), (2, 2)) == Action.STOP


def test_bbox_patches():
    # One box covering >5% of patches (0,1) and (1,1) of a 2x2 grid of 100px.
    env = OracleEnv((200, 200), 100, np.array([[120, 50, 180, 150]]))
    assert env.bbox_patches == {(0, 1), (1, 1)}


def test_oracle_visits_all_bbox_patches():
    rng = np.random.default_rng(0)
    env = OracleEnv(
        (800, 800), 100, np.array([[510, 510, 590, 590], [110, 610, 190, 690]]), rng
    )
    sample = generate_sample(
        env, max_ep_len=64, min_keypoints=0, max_keypoints=0, position=(0, 0)
    )
    n = int(sample["masks"].sum())
    visited = {tuple(p) for p in sample["positions"][:n]}
    assert env.bbox_patches <= visited

    # Labels point toward the next step of the trajectory when on the
    # optimal path with no random keypoints: following next_actions from any
    # step must reproduce the recorded positions.
    for i in range(n - 1):
        a = Action(int(sample["next_actions"][i]))
        dy, dx = {
            Action.LEFT: (0, -1), Action.RIGHT: (0, 1), Action.UP: (-1, 0),
            Action.DOWN: (1, 0), Action.LEFT_UP: (-1, -1),
            Action.RIGHT_UP: (-1, 1), Action.LEFT_DOWN: (1, -1),
            Action.RIGHT_DOWN: (1, 1), Action.STOP: (0, 0),
        }[a]
        y, x = sample["positions"][i]
        # The greedy label is consistent with the actually-taken move except
        # possibly at the last pre-keypoint step (replaced label).
        assert 0 <= y + dy < 8 and 0 <= x + dx < 8


def test_oracle_no_stop_labels():
    rng = np.random.default_rng(1)
    env = OracleEnv((400, 400), 100, np.array([[110, 110, 190, 190]]), rng)
    sample = generate_sample(
        env, max_ep_len=16, min_keypoints=1, max_keypoints=3, position=(3, 3)
    )
    n = int(sample["masks"].sum())
    assert (sample["next_actions"][:n] != Action.STOP.value).all()


def test_oracle_truncation_keeps_tail():
    rng = np.random.default_rng(2)
    env = OracleEnv((800, 800), 100, np.array([[610, 610, 690, 690]]), rng)
    # From (0,0), reaching patch (6,6) takes 6 diagonal steps + start = 7
    # records; truncate to 4 -> the tail must still end at the keypoint.
    sample = generate_sample(
        env, max_ep_len=4, min_keypoints=0, max_keypoints=0, position=(0, 0)
    )
    assert sample["masks"].sum() == 4
    assert tuple(sample["positions"][3]) == (6, 6)


def test_local_bboxes():
    env = OracleEnv((400, 400), 100, np.array([[150, 150, 250, 250]]))
    local = env.local_bboxes((1, 1))
    assert np.allclose(local[0], [0, 50, 50, 100, 100, 1])
    local = env.local_bboxes((0, 0))
    assert np.allclose(local[0], [0, 0, 0, 0, 0, 0])  # no overlap
    local = env.local_bboxes((2, 2))
    assert np.allclose(local[0], [0, 0, 0, 50, 50, 1])
