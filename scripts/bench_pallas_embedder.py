"""Pallas fused DW-block vs XLA on the rollout embedder's REAL stage
shapes (nano pairing, 448px patches, batch 128 — the headline bench's
workload). Prints one JSON line per stage.

The fused kernel (ops/conv.py::dwblock_bn_silu) computes depthwise 3x3 +
eval-BN + SiLU + pointwise 1x1 + eval-BN + SiLU in ONE VMEM pass; the XLA
reference is the same math as the flax modules emit it (two convs + two
BNs + two SiLUs, fused by XLA as it sees fit). Timing: chained-accumulator
jitted programs, warm compile excluded (bench.py protocol).

Usage: timeout 600 python scripts/bench_pallas_embedder.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jolineedle_tpu  # noqa: F401

import jax
import jax.numpy as jnp

from jolineedle_tpu.ops.conv import dwblock_bn_silu


def xla_dwblock(x, dw, g1, b1, m1, v1, pw, g2, b2, m2, v2, eps=1e-3):
    def bn_silu(y, g, b, m, v):
        y = (y - m) / jnp.sqrt(v + eps) * g + b
        return y * jax.nn.sigmoid(y)

    C = x.shape[-1]
    mid = bn_silu(
        jax.lax.conv_general_dilated(
            x, dw, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        ),
        g1, b1, m1, v1,
    )
    return bn_silu(
        jax.lax.conv_general_dilated(
            mid.astype(pw.dtype), pw, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        g2, b2, m2, v2,
    )


def timed(fn, args, iters):
    @jax.jit
    def step(acc, *a):
        return acc + fn(*a).astype(jnp.float32).sum()

    acc = jnp.zeros((), jnp.float32)
    acc = step(acc, *args)
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        acc = step(acc, *args)
    float(acc)
    return (time.perf_counter() - t0) / iters


def main():
    B = 128
    iters = 30
    dtype = jnp.bfloat16
    # nano embedder DW-block shapes at 448px patches (CSPDarknet stages
    # stride 4/8/16/32 with base_ch 16: C = 32/64/128/256).
    stages = [(112, 32), (56, 64), (28, 128), (14, 256)]
    key = jax.random.PRNGKey(0)
    for HW, C in stages:
        K = C
        ks = jax.random.split(key, 12)
        x = jax.random.normal(ks[0], (B, HW, HW, C), dtype)
        dw = jax.random.normal(ks[1], (3, 3, 1, C), dtype) * 0.2
        pw = jax.random.normal(ks[2], (1, 1, C, K), dtype) * 0.2
        g1 = jnp.ones((C,), jnp.float32); b1 = jnp.zeros((C,), jnp.float32)
        m1 = jnp.zeros((C,), jnp.float32); v1 = jnp.ones((C,), jnp.float32)
        g2 = jnp.ones((K,), jnp.float32); b2 = jnp.zeros((K,), jnp.float32)
        m2 = jnp.zeros((K,), jnp.float32); v2 = jnp.ones((K,), jnp.float32)
        args = (x, dw, g1, b1, m1, v1, pw, g2, b2, m2, v2)

        t_p = timed(dwblock_bn_silu, args, iters)
        t_x = timed(xla_dwblock, args, iters)
        flops = 2 * B * HW * HW * (9 * C + C * K)
        print(json.dumps({
            "stage": f"{HW}x{HW}x{C}",
            "pallas_us": round(t_p * 1e6, 1),
            "xla_us": round(t_x * 1e6, 1),
            "ratio": round(t_p / t_x, 3),
            "pallas_gflops": round(flops / t_p / 1e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
