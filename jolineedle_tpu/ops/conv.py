"""Pallas fused conv blocks for the rollout embedder (TPU, eval-mode BN).

Round-4 measurement (docs/experiment_log.md 2026-08-20 Pallas entries):
the known-good kernel shape — 1D grid, one program per image, 9 STATIC
unrolled taps im2col'd as VMEM values, one dot, no
``pl.when``/``scratch_shapes``/output revisiting — executes safely on the
tunneled runtime and beats XLA's conv emission at the embedder's
large-spatial / sub-32-channel stages. These kernels extend that shape to
the patterns the rollout embedder actually runs (reference detector stack:
upstream YOLOX consumed by reference src/models/yolox.py:63-73):

- ``conv3x3_bn_silu``: dense 3x3 (stride 1) + folded BatchNorm + SiLU.
- ``dwblock_bn_silu``: the nano ``DWConv`` block — depthwise 3x3 + BN +
  SiLU + pointwise 1x1 + BN + SiLU — in ONE VMEM pass, eliminating the
  HBM round trip between the two convs.

Both are EVAL-MODE (BatchNorm folded to per-channel scale/bias): exactly
the rollout path, where the embedder always runs with running statistics
(train-mode BN needs cross-image batch moments, which a per-image grid
cannot produce). Training's detection branch stays on the XLA path.

Gating: ``models/yolox.py`` consults ``JOLINEEDLE_PALLAS_CONV=1`` (default
OFF) and uses these only on TPU, eval-mode, stride-1 call sites; numerics
are pinned against the XLA path by tests/test_pallas_conv.py in interpret
mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fold_bn(gamma, beta, mean, var, eps):
    """BatchNorm(eval) as y = x * scale + bias (per channel)."""
    scale = gamma / jnp.sqrt(var + eps)
    return scale, beta - mean * scale


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _conv_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, *, H, W, C, K):
    taps = []
    for dy in range(3):
        for dx in range(3):
            taps.append(
                x_ref[0, dy : dy + H, dx : dx + W, :]
                .astype(jnp.float32)
                .reshape(H * W, C)
            )
    patches = jnp.concatenate(taps, axis=-1)  # [H*W, 9C]
    out = jnp.dot(
        patches, w_ref[...].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    out = out * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[0] = _silu(out).reshape(H, W, K).astype(o_ref.dtype)


def conv3x3_bn_silu(x, w, gamma, beta, mean, var, eps=1e-3):
    """Dense 3x3 stride-1 SAME conv + eval BN + SiLU.

    x: [B, H, W, C]; w: [3, 3, C, K] (HWIO). Returns [B, H, W, K].
    """
    B, H, W, C = x.shape
    K = w.shape[-1]
    scale, bias = _fold_bn(gamma, beta, mean, var, eps)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9 * C, K)
    return pl.pallas_call(
        functools.partial(_conv_kernel, H=H, W=W, C=C, K=K),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((K,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, K), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, K), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(xp, wf, scale, bias)


def _dwblock_kernel(
    x_ref, dw_ref, s1_ref, b1_ref, pw_ref, s2_ref, b2_ref, o_ref,
    *, H, W, C, K,
):
    """One image: DW 3x3 + BN + SiLU + PW 1x1 + BN + SiLU, all in VMEM."""
    acc = jnp.zeros((H * W, C), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = (
                x_ref[0, dy : dy + H, dx : dx + W, :]
                .astype(jnp.float32)
                .reshape(H * W, C)
            )
            acc = acc + tap * dw_ref[3 * dy + dx].astype(jnp.float32)
    mid = _silu(
        acc * s1_ref[...].astype(jnp.float32)
        + b1_ref[...].astype(jnp.float32)
    )
    out = jnp.dot(
        mid, pw_ref[...].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    out = (
        out * s2_ref[...].astype(jnp.float32)
        + b2_ref[...].astype(jnp.float32)
    )
    o_ref[0] = _silu(out).reshape(H, W, K).astype(o_ref.dtype)


def dwblock_bn_silu(
    x, dw, gamma1, beta1, mean1, var1, pw, gamma2, beta2, mean2, var2,
    eps=1e-3,
):
    """The nano DWConv block fused: depthwise 3x3 (stride 1, SAME) + eval
    BN + SiLU, then pointwise 1x1 + eval BN + SiLU — one VMEM pass.

    x: [B, H, W, C]; dw: [3, 3, 1, C] (flax grouped-conv kernel layout,
    feature_group_count=C); pw: [1, 1, C, K]. Returns [B, H, W, K].
    """
    B, H, W, C = x.shape
    K = pw.shape[-1]
    s1, b1 = _fold_bn(gamma1, beta1, mean1, var1, eps)
    s2, b2 = _fold_bn(gamma2, beta2, mean2, var2, eps)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dwf = dw.reshape(9, C)  # tap-major per-channel weights
    pwf = pw.reshape(C, K)
    return pl.pallas_call(
        functools.partial(_dwblock_kernel, H=H, W=W, C=C, K=K),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((K,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, K), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, K), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(xp, dwf, s1, b1, pwf, s2, b2)
