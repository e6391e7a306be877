"""Flash-attention (Pallas) vs XLA attention on the real TPU.

Round-1 shipped the Pallas kernel tested only in interpret mode (VERDICT
"weak" #1). This script compiles and runs it on the actual device, checks
numerics against the jnp/XLA path, and times both across a shape sweep —
from needle-scale (T<=64, small head_dim) to tile-aligned LLM-scale — so the
``causal_attention`` dispatch rule is backed by measurements instead of
guesswork. Results land in docs/experiment_log.md.

Usage: python scripts/bench_attention.py  (runs on whatever backend is live;
pass BENCH_ATTN_SMALL=1 to shrink the sweep for CPU smoke).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jolineedle_tpu  # noqa: F401  (platform + compile cache)
import jax
import jax.numpy as jnp

from jolineedle_tpu.ops.attention import (
    causal_attention_reference,
    flash_attention,
)


def _sync(x):
    # Force execution on the lazy axon runtime: fetch one scalar.
    return float(jnp.asarray(x).sum())


def time_fn(fn, *args, iters=None):
    if iters is None:
        # 20 for CPU smoke; on the real chip the tunneled runtime's
        # throughput jitters up to 4x between runs (CLAUDE.md), so decision
        # measurements need seconds of accumulated work per cell + repeats.
        iters = int(os.environ.get("BENCH_ATTN_ITERS", "20"))
    # One jitted program per iteration: attention + reduce + accumulate all
    # fused under jit, chained through `acc` so iterations can't overlap.
    # No eager ops inside the timed region (on axon every eager op is a
    # separate per-op RPC that would add constant overhead to both paths and
    # compress speedup ratios at sub-millisecond shapes).
    step = jax.jit(
        lambda acc, *a: acc + fn(*a).astype(jnp.float32).sum()
    )
    acc = jnp.zeros((), jnp.float32)
    acc = step(acc, *args)  # warm-up / compile
    _sync(acc)
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = step(acc, *args)
    _sync(acc)
    return (time.perf_counter() - t0) / iters


def main():
    small = os.environ.get("BENCH_ATTN_SMALL", "") == "1"
    backend = jax.default_backend()
    print(f"backend: {backend}")
    interpret = backend != "tpu"

    shapes = (
        [(2, 2, 256, 128)]
        if small
        else [
            # (B, H, T, D): needle-scale first, then tile-aligned scale.
            (128, 4, 128, 64),
            (128, 4, 128, 128),
            (8, 8, 512, 128),
            (8, 8, 1024, 128),
            (8, 8, 2048, 128),
            (4, 16, 4096, 128),
        ]
    )
    rng = np.random.default_rng(0)
    results = []
    for b, h, t, d in shapes:
        q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.bfloat16)

        block = min(128, t)
        flash = jax.jit(
            lambda q, k, v: flash_attention(
                q, k, v, block_q=block, block_k=block, interpret=interpret
            )
        )
        ref = jax.jit(causal_attention_reference)

        # numerics: compare on device, fetch one scalar (host transfers over
        # the tunneled runtime take minutes for full tensors).
        err_fn = jax.jit(
            lambda q, k, v: jnp.max(
                jnp.abs(
                    flash_attention(
                        q, k, v, block_q=block, block_k=block,
                        interpret=interpret,
                    ).astype(jnp.float32)
                    - causal_attention_reference(q, k, v).astype(jnp.float32)
                )
            )
        )
        err = _sync(err_fn(q, k, v))

        tf = time_fn(flash, q, k, v)
        tr = time_fn(ref, q, k, v)
        # Causal attention FLOPs: ~2 matmuls over the lower triangle.
        flops = 2 * 2 * b * h * t * t * d / 2
        line = (
            f"B{b} H{h} T{t} D{d}: flash {tf*1e3:8.3f} ms"
            f" ({flops/tf/1e12:6.2f} TF/s) | xla {tr*1e3:8.3f} ms"
            f" ({flops/tr/1e12:6.2f} TF/s) | max|err| {err:.4f}"
            f" | speedup {tr/tf:5.2f}x"
        )
        print(line, flush=True)
        results.append((b, h, t, d, tf, tr, err))
    return results


if __name__ == "__main__":
    main()
