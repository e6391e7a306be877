"""Smoke-test: can a Pallas conv in the known-good kernel shape beat XLA?

Round-3 verdict item 6: the headline metric's residual ~2x below the
yolox-nano roofline is attributed to XLA's sub-128-channel conv emission,
and hand-written Pallas convs were written off as "blocked by the Mosaic
wedge" without a measurement. But the wedge (docs/experiment_log.md
2026-08-17) only bites kernels using ``pl.when``/``scratch_shapes``/3D-grid
output revisiting — the 1D-grid + static-unroll shape that validated
``ops/attention.py`` is known-good. This script measures exactly that shape
on a yolox-nano-like 3x3 conv and prints one JSON line.

Kernel design (the only shape attempted, by construction):
  - grid = (B,): one program per image, no output revisiting;
  - input padded OUTSIDE the kernel to [B, H+2, W+2, C] so all 9 taps are
    STATIC slices (Python-unrolled, no fori_loop, no pl.when);
  - im2col in VMEM values (no scratch refs): concat 9 shifted [H*W, C]
    slices -> [H*W, 9C], so the MXU contraction dim is 9C >= 128 even for
    C=16 — the lane-packing XLA's NHWC conv emission does not do at these
    widths;
  - one dot against the [9C, K] filter, write [H, W, K] once.

Run on the TPU under a short timeout:
    timeout 180 python scripts/smoke_pallas_conv.py

A hang here means the pattern is NOT safe -> the write-off stands, with
this script as the recorded fast failure. A measured ratio < 1.0 means the
Pallas conv beats XLA and is worth wiring into the embedder behind a flag.
"""

import functools
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jolineedle_tpu  # noqa: F401  (JAX_PLATFORMS + compile cache)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_ref, w_ref, o_ref, *, H, W, C, K):
    """One image: 3x3 valid conv on pre-padded input via im2col + one dot."""
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
    )  # [H*W, K]
    o_ref[0] = out.reshape(H, W, K).astype(o_ref.dtype)


def pallas_conv3x3(x, w):
    """x: [B, H, W, C] (unpadded), w: [3, 3, C, K] -> [B, H, W, K]."""
    B, H, W, C = x.shape
    K = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9 * C, K)
    # CPU has no Mosaic: interpret mode checks numerics without a chip.
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        functools.partial(_conv_kernel, H=H, W=W, C=C, K=K),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H + 2, W + 2, C), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((9 * C, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W, K), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, K), x.dtype),
        interpret=interpret,
    )(xp, wf)


def xla_conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def timed(fn, x, w, iters):
    @jax.jit
    def step(acc, x, w, i):
        # Real dependence on the conv output — a *0 here would let XLA DCE
        # the conv and time an empty program.
        y = fn(x, w)
        return acc + y.astype(jnp.float32).sum()

    acc = jnp.zeros((), jnp.float32)
    acc = step(acc, x, w, 0)
    float(acc)  # compile + warm (forces execution on axon)
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for i in range(iters):
        acc = step(acc, x, w, i)
    float(acc)
    return (time.perf_counter() - t0) / iters


def main():
    # yolox-nano-like shape: 56x56 spatial (448px patch at stride 8),
    # sub-128 channel widths where the roofline analysis blames XLA's
    # conv emission. bf16 like the real compute path.
    B = int(os.environ.get("SMOKE_B", 8))
    H = W = int(os.environ.get("SMOKE_HW", 56))
    C = int(os.environ.get("SMOKE_C", 16))
    K = int(os.environ.get("SMOKE_K", 32))
    iters = int(os.environ.get("SMOKE_ITERS", 50))
    dtype = jnp.bfloat16

    print(f"backend={jax.default_backend()} B={B} HW={H} C={C} K={K}", flush=True)
    # Health probe first: a trivial matmul must complete before and after
    # the Pallas call so a wedge is attributable.
    z = jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256), dtype))
    float(z)
    print("pre-kernel matmul ok", flush=True)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), dtype)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, K), dtype) * 0.1

    # Numerics: pallas vs XLA on the same data.
    y_p = np.asarray(jax.jit(pallas_conv3x3)(x, w), np.float32)
    y_x = np.asarray(jax.jit(xla_conv3x3)(x, w), np.float32)
    err = float(np.max(np.abs(y_p - y_x)))
    print(f"max |pallas - xla| = {err:.4f}", flush=True)

    t_pallas = timed(pallas_conv3x3, x, w, iters)
    print(f"pallas: {t_pallas*1e6:.1f} us/call", flush=True)
    t_xla = timed(xla_conv3x3, x, w, iters)
    print(f"xla:    {t_xla*1e6:.1f} us/call", flush=True)

    z = jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256), dtype))
    float(z)
    print("post-kernel matmul ok", flush=True)

    flops = 2 * B * H * W * 9 * C * K
    print(json.dumps({
        "shape": [B, H, W, C, K],
        "max_abs_err": err,
        "pallas_us": round(t_pallas * 1e6, 1),
        "xla_us": round(t_xla * 1e6, 1),
        "ratio_pallas_over_xla": round(t_pallas / t_xla, 3),
        "pallas_gflops": round(flops / t_pallas / 1e9, 1),
        "xla_gflops": round(flops / t_xla / 1e9, 1),
    }))


if __name__ == "__main__":
    main()
