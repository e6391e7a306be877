from .actions import (
    Action,
    ACTION_DELTAS,
    ACTION_DELTAS_ARRAY,
    MOVES,
    ActionInfo,
    get_actions_info,
)
from .batched_env import EnvState, NeedleEnv
from .oracle import OracleEnv, generate_sample

__all__ = [
    "Action",
    "ACTION_DELTAS",
    "ACTION_DELTAS_ARRAY",
    "MOVES",
    "ActionInfo",
    "get_actions_info",
    "EnvState",
    "NeedleEnv",
    "OracleEnv",
    "generate_sample",
]
