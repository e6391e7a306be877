"""Micro-repro: does the PAFPN upsample feeding a concat+conv3x3 make the
conv pathologically slow (trace: divide_multiply_fusion.71, 11 TF/s vs
64-118 TF/s for identical convs elsewhere)?

Arms (all produce IDENTICAL values; nearest 2x upsample == repeat):
  A) jax.image.resize(nearest) -> concat -> conv3x3   (current model code)
  B) jnp.repeat x2            -> concat -> conv3x3   (candidate fix)
  C) precomputed input        -> conv3x3             (clean baseline)

    timeout 600 python scripts/repro_upsample_conv.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jolineedle_tpu  # noqa: F401

import jax
import jax.numpy as jnp
from jax import lax

DT = jnp.bfloat16
B, H, C = 128, 28, 128  # yolox-s PAFPN f_out0 site: 14->28 upsample, concat to 256, conv 128


def conv3x3(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def up_resize(y):
    b, h, w, c = y.shape
    return jax.image.resize(y, (b, h * 2, w * 2, c), method="nearest")


def up_repeat(y):
    return jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)


def timed(fn, args, reps=100):
    @jax.jit
    def run(ws, *xs):
        def body(i, carry):
            ws, acc = carry
            y = fn(ws, *xs)
            s = y[:1, ..., :1].astype(jnp.float32).mean()
            ws = jax.tree_util.tree_map(
                lambda w: w + (s * 1e-30).astype(w.dtype), ws
            )
            return (ws, acc + s)

        _, acc = lax.fori_loop(0, reps, body, (args[0], jnp.zeros((), jnp.float32)))
        return acc

    float(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / reps


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    low = jax.random.normal(ks[0], (B, H // 2, H // 2, C), DT)  # pre-upsample
    skip = jax.random.normal(ks[1], (B, H, H, C), DT)  # lateral c4
    w1 = jax.random.normal(ks[2], (1, 1, 2 * C, C), DT) * 0.05  # csp 1x1
    w2 = jax.random.normal(ks[3], (3, 3, C, C), DT) * 0.05  # bottleneck 3x3
    flops = 2 * B * H * H * (2 * C * C + 9 * C * C)

    def arm_resize(ws, low, skip):
        w1, w2 = ws
        x = jnp.concatenate([up_resize(low), skip], axis=-1)
        x = conv3x3(lax.conv_general_dilated(
            x, w1, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), w2)
        return x * jax.nn.sigmoid(x)

    def arm_repeat(ws, low, skip):
        w1, w2 = ws
        x = jnp.concatenate([up_repeat(low), skip], axis=-1)
        x = conv3x3(lax.conv_general_dilated(
            x, w1, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), w2)
        return x * jax.nn.sigmoid(x)

    pre = jnp.concatenate([up_repeat(low), skip], axis=-1)

    def arm_clean(ws, pre):
        w1, w2 = ws
        x = conv3x3(lax.conv_general_dilated(
            pre, w1, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), w2)
        return x * jax.nn.sigmoid(x)

    # numerics: resize == repeat bit-exactly
    d = float(jnp.max(jnp.abs(
        up_resize(low).astype(jnp.float32) - up_repeat(low).astype(jnp.float32)
    )))
    for name, fn, args in [
        ("resize", arm_resize, ((w1, w2), low, skip)),
        ("repeat", arm_repeat, ((w1, w2), low, skip)),
        ("clean", arm_clean, ((w1, w2), pre)),
    ]:
        t = timed(fn, args)
        print(json.dumps({
            "arm": name, "us": round(t * 1e6, 1),
            "tflops_per_s": round(flops / t / 1e12, 1),
        }), flush=True)
    print(json.dumps({"resize_vs_repeat_max_abs_diff": d}), flush=True)


if __name__ == "__main__":
    main()
