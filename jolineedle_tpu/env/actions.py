"""Action space of the glimpse agent.

Nine actions: 8 compass moves + STOP, with (dy, dx) movement deltas.
Semantics parity with the reference action table (reference:
src/env/common.py:4-56). STOP is excluded from the categorical head when
``stop_enabled`` is off.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

import numpy as np

_ACTIONS = [
    "LEFT",
    "RIGHT",
    "UP",
    "DOWN",
    "LEFT_UP",
    "RIGHT_UP",
    "LEFT_DOWN",
    "RIGHT_DOWN",
    "STOP",
]
Action = Enum("Action", _ACTIONS, start=0)

ACTION_DELTAS = {
    Action.LEFT: (0, -1),
    Action.RIGHT: (0, 1),
    Action.UP: (-1, 0),
    Action.DOWN: (1, 0),
    Action.LEFT_UP: (-1, -1),
    Action.RIGHT_UP: (-1, 1),
    Action.LEFT_DOWN: (1, -1),
    Action.RIGHT_DOWN: (1, 1),
    Action.STOP: (0, 0),
}

# Dense (n_actions, 2) delta table indexed by action id, for device-side
# vectorized stepping: positions += ACTION_DELTAS_ARRAY[action_ids].
ACTION_DELTAS_ARRAY = np.array(
    [ACTION_DELTAS[Action(i)] for i in range(len(Action))], dtype=np.int32
)

MOVES = [
    Action.LEFT,
    Action.RIGHT,
    Action.UP,
    Action.DOWN,
    Action.LEFT_UP,
    Action.RIGHT_UP,
    Action.LEFT_DOWN,
    Action.RIGHT_DOWN,
]


@dataclass
class ActionInfo:
    action_type: str  # "categorical" or "scalar"
    nclasses: int


def get_actions_info(train_config) -> list:
    """One categorical head of 8 or 9 logits (reference: src/env/common.py:48-56)."""
    return [
        ActionInfo(
            action_type="categorical",
            nclasses=len(Action) if train_config.stop_enabled else len(Action) - 1,
        )
    ]
