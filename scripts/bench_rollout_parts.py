"""Decompose one rollout scan-step into its parts on the live chip.

Answers "where does the residual time below the roofline ceiling go?"
(docs/experiment_log.md MFU correction): times, in isolation,

  - ``embed``:  GPT.embed_patches on a [B, P, P, 3] patch batch — the
    yolox backbone+FPN embedder, ~96% of modeled FLOPs;
  - ``decode``: GPT.decode_step — embed + one KV-cache transformer step;
  - ``env``:    NeedleEnv.masked_step — uint8 patch gather + normalize +
    visited/reward/termination logic;
  - ``scan20``: the full 20-step rollout (bench.py's measured quantity),
    reported per scan step.

Each part runs as ONE jitted program per iteration with an accumulator
threaded through jit (no eager ops in the timed region — tunnel RPCs would
otherwise contaminate the timing; same harness as bench.py).

Usage: python scripts/bench_rollout_parts.py  [BENCH_PARTS_ITERS=100]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jolineedle_tpu  # noqa: F401  (JAX_PLATFORMS + compile cache)

import jax
import jax.numpy as jnp

from bench import build  # reuse the headline config assembly

from jolineedle_tpu.env.batched_env import NeedleEnv
from jolineedle_tpu.models.gpt import GPT


def timed(label, step, iters, *args):
    """step(acc, i, *args) -> acc, jitted. Returns seconds/iter.

    Device-array fixtures are threaded through as ARGUMENTS (``*args``), not
    captured in the closure: a closed-over concrete array becomes an HLO
    constant, and at batch-128 rollout sizes the embedded constants blow the
    tunneled runtime's remote-compile request over its body-size limit
    (HTTP 413)."""
    acc = jnp.zeros((), jnp.float32)
    acc = step(acc, -1, *args)
    float(acc)  # compile + warm
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for i in range(iters):
        acc = step(acc, i, *args)
    float(acc)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:8s} {dt * 1e3:9.3f} ms/iter", flush=True)
    return dt


def main():
    iters = int(os.environ.get("BENCH_PARTS_ITERS", "100"))
    trainer, model, images, boxes, batch, max_ep_len, patch, embedder = build(
        small=os.environ.get("BENCH_SMALL", "") == "1"
    )
    variables = trainer.eval_variables()
    cfg = trainer.config
    # On-device pool generation — a multi-GB host->device transfer over the
    # tunnel can take >20 min and wedge the chip if interrupted (bench.py
    # does the same).
    images_d = jax.jit(
        lambda k: jax.random.randint(k, images.shape, 0, 256, jnp.uint8)
    )(jax.random.PRNGKey(1))
    boxes_d = jnp.asarray(boxes)
    key = jax.random.PRNGKey(0)

    def env_of():
        return NeedleEnv(
            images_d, boxes_d, cfg.patch_size, trainer.max_ep_len, 1,
            trainer.stop_enabled,
        )

    # Device-resident fixtures shared by the part benches.
    state0, patches0, _ = env_of().reset(key=key)
    classes = jnp.zeros((batch,), jnp.int32)
    cache0 = model.apply(variables, classes, method=GPT.init_cache)
    actions0 = jnp.zeros((batch,), jnp.int32)

    results = {}

    # Control cell: a near-no-op program taking the SAME param tree as the
    # model cells. On the tunneled runtime, dispatch cost grows with the
    # number of argument handles serialized per RPC (the param tree is
    # hundreds of leaves), so this measures the per-dispatch floor that the
    # embed/decode cells pay and the 20-step scan amortizes.
    @jax.jit
    def dispatch_step(acc, i, variables):
        leaf = jax.tree_util.tree_leaves(variables)[0]
        return acc + leaf.astype(jnp.float32).sum() * 0 + i

    results["dispatch_ms"] = (
        timed("dispatch", dispatch_step, iters, variables) * 1e3
    )

    @jax.jit
    def embed_step(acc, i, variables, patches0):
        p = patches0 + jnp.zeros((), patches0.dtype) * i
        emb = model.apply(variables, p, method=GPT.embed_patches)
        return acc + emb.astype(jnp.float32).sum()

    results["embed_ms"] = (
        timed("embed", embed_step, iters, variables, patches0) * 1e3
    )

    @jax.jit
    def decode_step(acc, i, variables, cache0, patches0, actions0, positions):
        logits, _ = model.apply(
            variables, cache0, patches0[:, 0], actions0,
            positions, jnp.asarray(i * 0, jnp.int32),
            method=GPT.decode_step,
        )
        return acc + logits.astype(jnp.float32).sum()

    results["decode_ms"] = (
        timed(
            "decode", decode_step, iters, variables, cache0, patches0,
            actions0, state0.positions,
        )
        * 1e3
    )

    @jax.jit
    def env_step(acc, i, images_d, boxes_d, state0, actions0):
        env = NeedleEnv(
            images_d, boxes_d, cfg.patch_size, trainer.max_ep_len, 1,
            trainer.stop_enabled,
        )
        st, patches, rewards, term, _, _ = env.masked_step(
            state0, jnp.mod(jnp.asarray(i, jnp.int32), 8) + actions0,
            jnp.zeros((batch,), bool),
        )
        return (
            acc
            + patches.astype(jnp.float32).sum()
            + rewards.astype(jnp.float32).sum()
        )

    results["env_ms"] = (
        timed("env", env_step, iters, images_d, boxes_d, state0, actions0)
        * 1e3
    )

    @jax.jit
    def scan_step(acc, i, variables, images_d, boxes_d):
        env = NeedleEnv(
            images_d, boxes_d, cfg.patch_size, trainer.max_ep_len, 1,
            trainer.stop_enabled,
        )
        out = trainer._rollout_scan(
            variables, env, jax.random.fold_in(key, i), sample=True
        )
        return acc + out["rewards"].astype(jnp.float32).sum()

    scan_iters = max(1, iters // 5)
    results["scan_step_ms"] = (
        timed("scan20", scan_step, scan_iters, variables, images_d, boxes_d)
        / max_ep_len
        * 1e3
    )
    results["batch"] = batch
    results["embedder"] = embedder
    results["sum_parts_ms"] = results["decode_ms"] + results["env_ms"]
    print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
