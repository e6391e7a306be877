from .gpt import GPT, ActionHead, Block, CausalSelfAttention
from .positional import positional_encoding_1d, positional_encoding_2d
from .yolox import (
    NeedleYOLOX,
    YOLOPAFPN,
    YOLOX_VARIANTS,
    YOLOXHead,
    make_grids_and_strides,
)

__all__ = [
    "GPT",
    "ActionHead",
    "Block",
    "CausalSelfAttention",
    "positional_encoding_1d",
    "positional_encoding_2d",
    "NeedleYOLOX",
    "YOLOPAFPN",
    "YOLOX_VARIANTS",
    "YOLOXHead",
    "make_grids_and_strides",
]
