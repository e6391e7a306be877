"""Pallas fused conv blocks — MEASURED NEGATIVE, not wired (round 5).

Status (docs/experiment_log.md 2026-08-20/21 Pallas entries): these
kernels are numerics-correct and safe on the tunneled runtime (1D grid,
one program per image, 9 STATIC unrolled taps, one dot, no
``pl.when``/``scratch_shapes``/output revisiting), but they are NOT used
by the product path, and the round-5 measurements say they should not be:

- ``dwblock_bn_silu`` (the nano ``DWConv`` block fused in one VMEM pass)
  loses 1.1-4.1x to XLA at every REAL embedder stage shape at the
  headline workload (B=128, 448px: 112x112x32 -> 14x14x256;
  scripts/bench_pallas_embedder.py). The depthwise taps are lane-wasted
  VPU work at C-minor layouts; XLA's emission is better.
- ``conv3x3_bn_silu``'s round-4 smoke wins (56x56, 16->32 channels) are
  at shapes that do NOT occur in the real nano embedder — the only dense
  stride-1 3x3 on that path is the Focus stem (224x224, 12->16), which
  (a) does not fit this kernel's single-program VMEM im2col and (b) runs
  under XLA at ~27.6 TF/s (scripts/bench_embedder_stages.py), ABOVE the
  ~18.7 TF/s ceiling of this kernel's im2col formulation at K=16 (output
  lanes 16/128).

They are kept as a measured-negative archive with pinned numerics
(tests/test_pallas_conv.py, interpret mode on CPU) so the next attempt
starts from working kernels and recorded losing shapes, not from scratch.
Both are EVAL-MODE (BatchNorm folded to per-channel scale/bias).
Reference detector stack these would have served: upstream YOLOX consumed
by reference src/models/yolox.py:63-73.
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
