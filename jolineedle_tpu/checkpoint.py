"""Checkpointing: last/best single-file checkpoints + metrics/config JSON.

Same on-disk layout semantics as the reference (reference:
src/trainer.py:92-136, main.py:532-584): ``checkpoint.msgpack`` every test
cycle, ``checkpoint_best.msgpack`` on best-metric peaks, ``best_model.txt``
with index and value, ``metrics.json``, ``config.json``. The torch
``state_dict`` pickle is replaced by flax msgpack serialization of the full
train-state pytree (params + batch stats + both optimizer partitions).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

CKPT_LAST = "checkpoint.msgpack"
CKPT_BEST = "checkpoint_best.msgpack"


_fetch_salt = [0]
_probe_fns: dict = {}


def _probe_positions(leaves):
    """Deterministic spot-check positions: up to 8 float leaves spread
    across the (size-sorted) leaf list, 2 elements each.

    Uses only leaf METADATA (``.dtype``/``.size``) — never ``np.asarray``,
    which on the tunneled runtime forces a full per-leaf ``device_get``
    (~1-12 s each when work is pending) and would stall every save."""
    float_idx = [
        i for i, l in enumerate(leaves)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        and getattr(l, "size", 0) >= 2
    ]
    if not float_idx:
        return []
    float_idx.sort(key=lambda i: -leaves[i].size)
    chosen = float_idx[:: max(1, len(float_idx) // 8)][:8]
    out = []
    for i in chosen:
        n = leaves[i].size
        out.append((i, 0))
        out.append((i, n // 2))
    return out


def fetch_fresh(tree: Any) -> Any:
    """``device_get`` that defeats the tunneled runtime's stale-array fetch.

    Measured 2026-08-20 (post-reset axon runtime): fetching ARRAY outputs
    tied to the long-lived donated train-state returns the run's first-save
    snapshot — params/batch_stats came back bit-identical across evals
    thousands of iterations apart while SCALAR fetches of the same buffers
    (step counters, an on-device global param norm) stayed fresh, and a
    plain jitted-copy indirection did NOT help (its array outputs and even
    its [n_leaves] checksum vector came back stale-consistent). Scalar
    fetches are the one provably-fresh channel.

    Strategy: (1) copy the tree inside a UNIQUE executable per call — a
    fresh lambda with a unique embedded constant gives a unique HLO, so no
    executable- or result-keyed cache can serve a previous save's output;
    (2) verify the fetched bytes BIT-EXACTLY against ~16 elements read back
    as individual scalars through the fresh channel; (3) retry with a new
    unique executable on mismatch, and warn loudly if verification never
    passes (save stays best-effort, parity: src/trainer.py:92-136).
    """
    if jax.default_backend() == "cpu":
        return jax.device_get(tree)

    leaves = jax.tree_util.tree_leaves(tree)
    # Cache key includes leaf shapes: a same-structure tree with different
    # shapes must get its own probe positions, or device probes would be
    # compared against the wrong host elements.
    key = (
        jax.tree_util.tree_structure(tree),
        tuple(getattr(l, "shape", None) for l in leaves),
    )
    if key not in _probe_fns:
        positions = _probe_positions(leaves)

        def probe(t, _pos=tuple(positions)):
            ls = jax.tree_util.tree_leaves(t)
            return tuple(jnp.ravel(ls[i])[j] for i, j in _pos)

        _probe_fns[key] = (jax.jit(probe), tuple(positions))
    probe_fn, positions = _probe_fns[key]

    last_host = None
    for _ in range(3):
        _fetch_salt[0] += 1
        salt = _fetch_salt[0]
        # New lambda + unique constant => unique jit entry AND unique HLO.
        copier = jax.jit(
            lambda t, _s=salt: (
                jax.tree_util.tree_map(jnp.copy, t),
                jnp.full((), _s, jnp.int32),
            )
        )
        host, _ = jax.device_get(copier(tree))
        last_host = host
        # Scalar probes AFTER the copy fetch: each is a () buffer fetched
        # individually — the channel measured fresh on this runtime.
        dev_vals = [float(v) for v in probe_fn(tree)]
        host_leaves = jax.tree_util.tree_leaves(host)
        ok = True
        for (i, j), dv in zip(positions, dev_vals):
            hv = float(np.ravel(np.asarray(host_leaves[i]))[j])
            if not (hv == dv or (np.isnan(hv) and np.isnan(dv))):
                ok = False
                break
        if ok:
            return host
        print("checkpoint fetch returned stale bytes; retrying with a "
              "fresh executable")
    print(
        "WARNING: checkpoint fetch failed bit-exact scalar verification "
        "after 3 attempts — the saved checkpoint may contain stale "
        "parameters (tunneled-runtime fetch bug, docs/experiment_log.md "
        "2026-08-20)"
    )
    return last_host


def save_checkpoint(path, state: Any):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    state = fetch_fresh(state)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))


def load_checkpoint(path, target: Any) -> Any:
    """Restore into a template pytree (a freshly-initialized state)."""
    with open(Path(path), "rb") as f:
        return serialization.from_bytes(target, f.read())


def _graft_overlap(target, ckpt, path=""):
    """Recursively merge a raw checkpoint state-dict into a target
    state-dict, tolerating leaf-shape mismatches.

    Where shapes agree the checkpoint value wins. Where ranks agree but a
    dimension differs (e.g. warm-starting a 9-action head from an 8-action
    checkpoint: the action-embedding table grows on dim 0, the head kernel
    on dim 1 — STOP is always the LAST action id, env/actions.py:16-27),
    the overlapping hyperrectangle is copied and the rest keeps the fresh
    initialization. Missing keys / rank mismatches keep the target leaf.
    """
    if isinstance(target, dict):
        out = {}
        for key, tval in target.items():
            if isinstance(ckpt, dict) and key in ckpt:
                out[key] = _graft_overlap(tval, ckpt[key], f"{path}/{key}")
            else:
                print(f"init-from: no checkpoint value for {path}/{key},"
                      " keeping fresh init")
                out[key] = tval
        return out
    tgt = np.asarray(target)
    src = np.asarray(ckpt)
    if tgt.shape == src.shape:
        return src
    if tgt.ndim != src.ndim:
        print(f"init-from: rank mismatch at {path} "
              f"({src.shape} -> {tgt.shape}), keeping fresh init")
        return target
    region = tuple(slice(0, min(a, b)) for a, b in zip(src.shape, tgt.shape))
    merged = np.array(tgt)
    merged[region] = src[region].astype(tgt.dtype)
    print(f"init-from: shape mismatch at {path} ({src.shape} -> {tgt.shape}),"
          f" grafted overlap {tuple(s.stop for s in region)}")
    return merged


def load_params_only(path, target_state: Any) -> Any:
    """Restore only model params/batch_stats (best-ckpt revalidation,
    reference: src/trainer.py:138-165, and ``--init-from`` warm starts).

    Deserializes the raw msgpack tree and grafts just the model subtrees,
    so the checkpoint's optimizer state need NOT match ``target_state``'s —
    the two training modes wrap their optax chains differently. Leaf-shape
    mismatches are overlap-grafted (see ``_graft_overlap``) so e.g. a
    REINFORCE ``--enable-stop`` run can warm-start from a supervised
    checkpoint whose categorical head lacks the STOP logit."""
    with open(Path(path), "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    params_sd = _graft_overlap(
        serialization.to_state_dict(target_state.params), raw["params"]
    )
    stats_sd = _graft_overlap(
        serialization.to_state_dict(target_state.batch_stats),
        raw["batch_stats"],
    )
    return target_state.replace(
        params=serialization.from_state_dict(target_state.params, params_sd),
        batch_stats=serialization.from_state_dict(
            target_state.batch_stats, stats_sd
        ),
    )


def load_detection_params(path, target_state: Any) -> Any:
    """Graft only the ``yolox`` param subtree from another checkpoint
    (reference: main.py:565-584 ``--detection-checkpoint``).

    Accepts either a full train-state checkpoint from this framework or a
    ported-weights file from scripts/port_yolox_weights.py
    (``{"params": <yolox tree>, "batch_stats": ...}``).
    """
    with open(Path(path), "rb") as f:
        raw = serialization.msgpack_restore(f.read())

    if "opt_state" in raw:  # full TrainState checkpoint
        yolox_params = raw["params"]["yolox"]
        yolox_stats = raw.get("batch_stats", {}).get("yolox", {})
    else:  # ported upstream weights
        yolox_params = raw["params"]
        yolox_stats = raw.get("batch_stats", {})

    params = dict(target_state.params)
    params["yolox"] = serialization.from_state_dict(
        target_state.params["yolox"], yolox_params
    )
    batch_stats = dict(target_state.batch_stats)
    if yolox_stats and "yolox" in batch_stats:
        batch_stats["yolox"] = serialization.from_state_dict(
            batch_stats["yolox"], yolox_stats
        )
    return target_state.replace(params=params, batch_stats=batch_stats)
