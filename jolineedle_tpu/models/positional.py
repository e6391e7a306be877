"""Sinusoidal positional encodings (1D sequence, 2D patch-grid).

Formula parity with the ``positional_encodings`` package used by the
reference (reference: src/models/gpt.py:18-21, 223-225, 331-354, 386-417):
interleaved (sin, cos) per frequency, channels split x-block then y-block in
2D, zero-padded to the model width.

Unlike the reference, which materializes a table sized by the *batch max*
coordinate and gathers from it (a data-dependent shape, hostile to XLA), we
evaluate the encoding analytically at the requested coordinates — identical
values, fixed shapes.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _interleaved_sincos(pos: jnp.ndarray, channels: int) -> jnp.ndarray:
    """[..., channels] with [sin(p f0), cos(p f0), sin(p f1), ...]."""
    inv_freq = 1.0 / (
        10000 ** (np.arange(0, channels, 2, dtype=np.float32) / channels)
    )
    sin_inp = pos[..., None].astype(jnp.float32) * inv_freq  # [..., channels//2]
    emb = jnp.stack([jnp.sin(sin_inp), jnp.cos(sin_inp)], axis=-1)
    return emb.reshape(*emb.shape[:-2], channels)


def positional_encoding_1d(positions: jnp.ndarray, org_channels: int) -> jnp.ndarray:
    """1D encoding of integer positions ``[...]`` -> ``[..., org_channels]``."""
    channels = int(np.ceil(org_channels / 2) * 2)
    emb = _interleaved_sincos(positions, channels)
    return emb[..., :org_channels]


def positional_encoding_2d(positions_yx: jnp.ndarray, org_channels: int) -> jnp.ndarray:
    """2D encoding of (y, x) integer positions ``[..., 2]`` ->
    ``[..., org_channels]``.

    Channel layout matches PositionalEncoding2D: first block encodes x,
    second block encodes y, rest zero.
    """
    channels = int(np.ceil(org_channels / 4) * 2)
    emb_x = _interleaved_sincos(positions_yx[..., 1], channels)
    emb_y = _interleaved_sincos(positions_yx[..., 0], channels)
    out = jnp.concatenate(
        [
            emb_x,
            emb_y,
            jnp.zeros(emb_x.shape[:-1] + (max(org_channels - 2 * channels, 0),)),
        ],
        axis=-1,
    )
    return out[..., :org_channels]
