"""Per-stage XLA cost of the nano rollout embedder at the headline bench
workload (B=128, 448px patches), measured WITHOUT the tunnel dispatch
floor: each stage op runs REPS times inside one jitted ``lax.fori_loop``
dispatch. The loop body is kept loop-variant through the WEIGHTS (a few KB
rewritten per iteration, negligible traffic) with a scalar fed back from a
tiny output slice — so per-iteration cost is the op itself, not the
feedback plumbing (a first version fed back through the full input and
measured a flat ~1.3 ms/iter of pure feedback traffic on every stage).

Round-4's isolated micro-times (scripts/bench_pallas_embedder.py) carry a
~1ms/dispatch tunnel floor that swamps stage differences; the trace
decomposition gave op-CLASS totals but not per-stage attribution. This
script closes that gap and is the basis for the wire-or-retire decision
on the Pallas conv kernels (VERDICT r4 task 1).

    timeout 900 python scripts/bench_embedder_stages.py
"""

import argparse
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


def conv(x, w, stride=1, groups=1):
    return lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def bn_silu(y):
    y = y * 1.01 + 0.01  # folded eval BN stands in for scale/bias
    return y * jax.nn.sigmoid(y)


def make_stage(H, C, K, kind, stride=1):
    """Returns (input_shape, weights_tuple, fn(x, ws))."""
    key = jax.random.PRNGKey(0)
    if kind == "dense3x3":
        ws = (jax.random.normal(key, (3, 3, C, K), DT) * 0.1,)
        fn = lambda x, ws: bn_silu(conv(x, ws[0], stride))
    elif kind == "pw1x1":
        ws = (jax.random.normal(key, (1, 1, C, K), DT) * 0.1,)
        fn = lambda x, ws: bn_silu(conv(x, ws[0], stride))
    elif kind == "dwblock":  # dw3x3(s) + pw1x1 like nano DWConv
        ws = (
            jax.random.normal(key, (3, 3, 1, C), DT) * 0.1,
            jax.random.normal(key, (1, 1, C, K), DT) * 0.1,
        )
        fn = lambda x, ws: bn_silu(
            conv(bn_silu(conv(x, ws[0], stride, groups=C)), ws[1])
        )
    elif kind == "null":
        ws = (jnp.zeros((1,), DT),)
        fn = lambda x, ws: x[:, :1, :1, :] * ws[0][0]
    else:
        raise ValueError(kind)
    return (128, H, H, C), ws, fn


def timed_loop(stage, reps=20):
    shape, ws0, fn = stage
    x0 = jax.random.normal(jax.random.PRNGKey(1), shape, DT)

    @jax.jit
    def run(x, ws):
        def body(i, carry):
            ws, acc = carry
            y = fn(x, ws)
            s = y[:1, ..., :1].astype(jnp.float32).mean()  # tiny slice read
            ws = tuple(w + (s * 1e-30).astype(w.dtype) for w in ws)
            return (ws, acc + s)

        _, acc = lax.fori_loop(
            0, reps, body, (ws, jnp.zeros((), jnp.float32))
        )
        return acc

    float(run(x0, ws0))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x0, ws0))
        best = min(best, time.perf_counter() - t0)
    return best / reps


def yolox_s_stages():
    """yolox-s (width 0.5, dense) backbone+PAFPN stage ops at 448px, B=128
    — the bench secondary pairing's embedder (VERDICT r4 task 5)."""
    return [
        ("null (loop overhead)", make_stage(112, 32, 32, "null"), 0),
        ("focus_conv 224x12->32", make_stage(224, 12, 32, "dense3x3"), 1),
        ("down2 224x32->64 s2", make_stage(224, 32, 64, "dense3x3", 2), 1),
        ("csp2_3x3 112x32->32", make_stage(112, 32, 32, "dense3x3"), 1),
        ("csp2_1x1 112x64->32", make_stage(112, 64, 32, "pw1x1"), 3),
        ("down3 112x64->128 s2", make_stage(112, 64, 128, "dense3x3", 2), 1),
        ("csp3_3x3 56x64->64", make_stage(56, 64, 64, "dense3x3"), 3),
        ("csp3_1x1 56x128->64", make_stage(56, 128, 64, "pw1x1"), 3),
        ("down4 56x128->256 s2", make_stage(56, 128, 256, "dense3x3", 2), 1),
        ("csp4_3x3 28x128->128", make_stage(28, 128, 128, "dense3x3"), 3),
        ("csp4_1x1 28x256->128", make_stage(28, 256, 128, "pw1x1"), 3),
        ("down5 28x256->512 s2", make_stage(28, 256, 512, "dense3x3", 2), 1),
        ("csp5_3x3 14x256->256", make_stage(14, 256, 256, "dense3x3"), 1),
        ("csp5_1x1 14x512->256", make_stage(14, 512, 256, "pw1x1"), 3),
        ("pafpn_3x3 56x64->64", make_stage(56, 64, 64, "dense3x3"), 2),
        ("pafpn_3x3 28x128->128", make_stage(28, 128, 128, "dense3x3"), 2),
        ("pafpn_down 56x64->64 s2", make_stage(56, 64, 64, "dense3x3", 2), 1),
        ("pafpn_down 28x128->128 s2", make_stage(28, 128, 128, "dense3x3", 2), 1),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--variant", default="yolox-nano",
                    choices=["yolox-nano", "yolox-s"])
    args = ap.parse_args()

    # nano embedder (yolox-nano backbone+PAFPN, eval) at 448px, B=128.
    # count = how many times that op shape runs per embed (backbone: dark2
    # n=1, dark3/4 n=3, dark5 n=1; PAFPN: 4 CSP n=1 + 2 bu_conv
    # downsamples; CSP 1x1s approximated by 3 representative shapes each).
    stages = [
        ("null 112x32 (loop overhead)", make_stage(112, 32, 32, "null"), 0),
        ("focus_conv 224x12->16", make_stage(224, 12, 16, "dense3x3"), 1),
        ("down2 224x16->32", make_stage(224, 16, 32, "dwblock", 2), 1),
        ("down3 112x32->64", make_stage(112, 32, 64, "dwblock", 2), 1),
        ("down4 56x64->128", make_stage(56, 64, 128, "dwblock", 2), 1),
        ("down5 28x128->256", make_stage(28, 128, 256, "dwblock", 2), 1),
        ("csp2_dw 112x32", make_stage(112, 32, 32, "dwblock"), 1),
        ("csp3_dw 56x64", make_stage(56, 64, 64, "dwblock"), 3),
        ("csp4_dw 28x128", make_stage(28, 128, 128, "dwblock"), 3),
        ("csp5_dw 14x256", make_stage(14, 256, 256, "dwblock"), 1),
        ("csp2_1x1 112x32->16", make_stage(112, 32, 16, "pw1x1"), 3),
        ("csp3_1x1 56x64->32", make_stage(56, 64, 32, "pw1x1"), 3),
        ("csp4_1x1 28x128->64", make_stage(28, 128, 64, "pw1x1"), 3),
        ("csp5_1x1 14x256->128", make_stage(14, 256, 128, "pw1x1"), 3),
        ("pafpn_dw 56x64", make_stage(56, 64, 64, "dwblock"), 2),
        ("pafpn_dw 28x128", make_stage(28, 128, 128, "dwblock"), 2),
        ("pafpn_down 56x64->64", make_stage(56, 64, 64, "dwblock", 2), 1),
        ("pafpn_down 28x128->128", make_stage(28, 128, 128, "dwblock", 2), 1),
    ]
    if args.variant == "yolox-s":
        stages = yolox_s_stages()

    total = 0.0
    for name, stage, count in stages:
        t = timed_loop(stage, args.reps)
        total += t * count
        # FLOPs for the dense/pw stages so the printout carries achieved
        # TF/s directly (dw left out: negligible MXU work).
        shape, ws, _ = stage
        B, H, _, C = shape
        flops = None
        if len(ws) == 1 and ws[0].ndim == 4 and ws[0].shape[0] in (1, 3):
            k = ws[0]
            stride = 1
            if "s2" in name or name.startswith("down"):
                stride = 2
            flops = 2 * B * (H // stride) ** 2 * k.shape[0] * k.shape[1] * C * k.shape[-1]
        rec = {
            "stage": name, "us": round(t * 1e6, 1), "count": count,
            "total_us": round(t * count * 1e6, 1),
        }
        if flops:
            rec["tflops_per_s"] = round(flops / t / 1e12, 1)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"sum_us": round(total * 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
