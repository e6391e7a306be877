"""FLOPs / parameter measurement.

Replaces the reference's thop-based ``--measure-flops`` path (reference:
main.py:452-529): reports backbone / detector / full-model FLOPs at several
sequence lengths and for a full 8x-patch image, plus parameter counts.
FLOPs are counted analytically from the traced jaxpr (``jaxpr_flops``) —
XLA's ``compile().cost_analysis()`` proved unreliable (scan trip-count
inconsistency on TPU, 4x conv under-count on CPU; docs/experiment_log.md
2026-08-17 MFU correction) and is kept only as a fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gpt import GPT


def _pretty(n: float) -> str:
    for unit in ["", "K", "M", "G", "T"]:
        if abs(n) < 1000:
            return f"{n:.3f}{unit}"
        n /= 1000
    return f"{n:.3f}P"


def _flops(fn, *args) -> float:
    try:
        return traced_flops(fn, *args)
    except Exception:
        pass
    # Fallback: XLA's own cost model (platform-dependent, see module doc).
    compiled = jax.jit(fn).lower(*args).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0] if analysis else None
    if not analysis:  # backend without cost analysis: degrade to 0
        return 0.0
    return float(analysis.get("flops", 0.0))


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def _prod(xs) -> float:
    out = 1.0
    for x in xs:
        out *= x
    return out


def jaxpr_flops(jaxpr) -> float:
    """Matmul/conv FLOPs of a jaxpr, counted analytically from shapes.

    Unlike ``compile().cost_analysis()`` this is platform-independent and
    handles ``lax.scan`` trip counts explicitly (observed on the TPU
    backend: cost_analysis multiplied the scan body by its length for one
    rollout program but not for another — docs/experiment_log.md
    2026-08-17 MFU correction). Counts 2*MACs for ``dot_general`` and
    ``conv_general_dilated``; recurses into scan (×length), while (×1,
    trip count unknowable), cond (max over branches), and any other
    jaxpr-carrying call primitive (pjit, remat, custom_jvp, ...).
    Elementwise FLOPs are ignored — they are noise at model scale.
    """
    total = 0.0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            lhs = eqn.invars[0].aval.shape
            rhs = eqn.invars[1].aval.shape
            k = _prod(lhs[i] for i in lc)
            b = _prod(lhs[i] for i in lb)
            m = _prod(
                d for i, d in enumerate(lhs) if i not in set(lc) | set(lb)
            )
            n = _prod(
                d for i, d in enumerate(rhs) if i not in set(rc) | set(rb)
            )
            total += 2.0 * b * m * n * k
        elif prim == "conv_general_dilated":
            out = eqn.outvars[0].aval.shape
            ker = eqn.invars[1].aval.shape
            dn = eqn.params["dimension_numbers"]
            out_c = ker[dn.rhs_spec[0]]
            # prod(ker) = out_c * (in_c / groups) * spatial window; dividing
            # out_c back out leaves the per-output-element MAC count.
            total += 2.0 * _prod(out) * _prod(ker) / out_c
        elif prim == "scan":
            total += eqn.params["length"] * jaxpr_flops(
                eqn.params["jaxpr"].jaxpr
            )
        elif prim == "while":
            total += jaxpr_flops(eqn.params["body_jaxpr"].jaxpr)
        elif prim == "cond":
            total += max(
                jaxpr_flops(br.jaxpr) for br in eqn.params["branches"]
            )
        else:
            for v in eqn.params.values():
                inner = getattr(v, "jaxpr", None)
                if inner is not None and hasattr(inner, "eqns"):
                    total += jaxpr_flops(inner)
    return total


def traced_flops(fn, *args) -> float:
    """``jaxpr_flops`` of ``fn`` traced at the given example arguments."""
    return jaxpr_flops(jax.make_jaxpr(fn)(*args).jaxpr)


def measure_flops(trainer, model_config, train_config):
    """Print the same report shape as the reference (main.py:452-529).

    Note: XLA reports FLOPs (2x MACs for matmul-like ops); the reference's
    thop reports MACs.
    """
    model = trainer.model
    variables = trainer.eval_variables()
    P = model_config.patch_size
    nc = model_config.n_channels
    b = 1

    print(f"Computing FLOPs for patch size = {P} and batch size = {b}")

    one_patch = jnp.zeros((b, P, P, nc))
    bkb_flops = _flops(
        lambda p: model.apply(
            variables, p, False, method=lambda m, x, t: m.yolox.backbone(x, t)
        ),
        one_patch,
    )
    bkb_params = count_params(variables["params"]["yolox"]["backbone"])
    print(f"Backbone FLOPs: {_pretty(bkb_flops)}, Params: {_pretty(bkb_params)}")

    yolo_flops = _flops(
        lambda p: model.apply(variables, p, False, method=GPT.yolox_outputs),
        one_patch,
    )
    head_params = count_params(variables["params"]["yolox"]["head"])
    print(
        f"Yolox Head FLOPs: {_pretty(yolo_flops - bkb_flops)}, "
        f"Params: {_pretty(head_params)}"
    )

    gpt_params = count_params(
        {k: v for k, v in variables["params"].items() if k != "yolox"}
    )
    # The reference iterates this fixed list unconditionally
    # (main.py:452-529); cap at block_size so small --max-seq-len configs
    # don't trip the decoder's sequence-length assert.
    for seq_len in [1, 2, 4, 8, 16]:
        if seq_len > model_config.block_size:
            break
        patches = jnp.zeros((b, seq_len, P, P, nc))
        actions = jnp.zeros((b, seq_len), jnp.int32)
        positions = jnp.zeros((b, seq_len, 2), jnp.int32)
        classes = jnp.zeros((b,), jnp.int32)
        flops = _flops(
            lambda *a: model.apply(variables, *a)[0],
            patches,
            actions,
            classes,
            positions,
        )
        print(
            f"Seq len: {seq_len}, GPT FLOPs: "
            f"{_pretty(flops - seq_len * bkb_flops)}, "
            f"Params: {_pretty(gpt_params)}"
        )
        print(
            f"Seq len: {seq_len}, Complete Model FLOPs: {_pretty(flops)}, "
            f"Params: {_pretty(gpt_params + count_params(variables['params'].get('yolox', {})))}"
        )

    big = P * 8
    print(f"Compute Yolox FLOPs for image of size {big}x{big}")
    full_img = jnp.zeros((b, big, big, nc))
    bkb_full = _flops(
        lambda p: model.apply(
            variables, p, False, method=lambda m, x, t: m.yolox.backbone(x, t)
        ),
        full_img,
    )
    print(f"Backbone FLOPs: {_pretty(bkb_full)}, Params: {_pretty(bkb_params)}")
    yolo_full = _flops(
        lambda p: model.apply(variables, p, False, method=GPT.yolox_outputs),
        full_img,
    )
    print(
        f"Yolox total FLOPs: {_pretty(yolo_full)}, "
        f"Params: {_pretty(bkb_params + head_params)}"
    )
