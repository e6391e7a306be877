"""Tiny on-chip smoke for ops/conv.py::dwblock_bn_silu before the full
stage bench: one small shape, numerics vs XLA, matmul health probe after.

The kernel uses the known-good shape (1D grid, static unrolled taps, no
pl.when/scratch/revisiting) but has only ever run in interpret mode on
CPU; per CLAUDE.md, any new pallas pattern must be smoke-tested tiny with
a short timeout before a long run.

    timeout 180 python scripts/smoke_dwblock.py
"""

import json
import pathlib
import sys

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


def probe():
    a = jnp.ones((256, 256), jnp.bfloat16)
    return float(jnp.sum(a @ a))


def main():
    print(json.dumps({"probe_before": probe()}), flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    B, HW, C = 8, 56, 16
    x = jax.random.normal(ks[0], (B, HW, HW, C), jnp.bfloat16)
    dw = jax.random.normal(ks[1], (3, 3, 1, C), jnp.bfloat16) * 0.2
    pw = jax.random.normal(ks[2], (1, 1, C, C), jnp.bfloat16) * 0.2
    g1 = jnp.ones((C,), jnp.float32); b1 = jnp.zeros((C,), jnp.float32)
    m1 = jnp.zeros((C,), jnp.float32); v1 = jnp.ones((C,), jnp.float32)
    args = (x, dw, g1, b1, m1, v1, pw, g1, b1, m1, v1)
    out_p = np.asarray(jax.jit(dwblock_bn_silu)(*args).astype(jnp.float32))
    out_x = np.asarray(jax.jit(xla_dwblock)(*args).astype(jnp.float32))
    err = float(np.max(np.abs(out_p - out_x)))
    print(json.dumps({
        "max_abs_err": err,
        "out_mean": float(out_p.mean()),
        "probe_after": probe(),
        "ok": err < 0.1,
    }), flush=True)


if __name__ == "__main__":
    main()
