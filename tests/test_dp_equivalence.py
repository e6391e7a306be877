"""Data-parallel correctness: a sharded train step over 8 devices computes
the SAME update as the single-device step on the same global batch.

This is the property the reference loses in its RL pipeline (DDP disabled,
reference: src/reinforce.py:279-280): here GSPMD inserts the gradient
all-reduce, so 1-device and 8-device runs are numerically equivalent (up to
float reduction order)."""

import numpy as np

import jax

from jolineedle_tpu.config import args_to_config, get_args
from jolineedle_tpu.env import get_actions_info
from jolineedle_tpu.models.gpt import GPT
from jolineedle_tpu.parallel.mesh import shard_batch
from jolineedle_tpu.train.supervised import SupervisedTrainer


def _build(devices):
    cli = [
        "--dataset-dir", "/nonexistent",
        "--training-mode", "supervised",
        "--work-dir", "/tmp/dp_equiv",
        "--model-type", "gpt-pico",
        "--image-processor", "yolox-nano",
        "--concat-embeddings", "--decoder-pos-encoding",
        "--use-positional-embedding",
        "--max-seq-len", "2",
        "--patch-size", "32",
        "--minimum-image-size", "0",
        "--batch-size", "1",
        "--dropout", "0.0",
        "--max-det-patches", "2",
        "--max-boxes", "2",
        "--compute-dtype", "float32",
        "--devices", *[str(d) for d in devices],
    ]
    train_config, model_config = args_to_config(get_args(cli))
    model = GPT.from_config(model_config, get_actions_info(train_config))
    return SupervisedTrainer(train_config, model, None, None, None)


def _batch(B, T, P, K, N):
    rng = np.random.default_rng(0)
    return {
        "patches": rng.integers(0, 256, (B, T, P, P, 3), dtype=np.uint8),
        "current_actions": rng.integers(0, 8, (B, T)).astype(np.int32),
        "reference_actions": rng.integers(0, 8, (B, T)).astype(np.int32),
        "class_id": np.zeros((B,), np.int32),
        "positions": rng.integers(0, 2, (B, T, 2)).astype(np.int32),
        "masks": np.ones((B, T), np.float32),
        "patches_yolox": rng.integers(0, 256, (B, K, P, P, 3), dtype=np.uint8),
        "bboxes_yolox": np.tile(
            np.array([0, 4, 4, 20, 20, 1], np.float32), (B, K, N, 1)
        ),
        "yolox_valid": np.ones((B, K), bool),
    }


def test_sharded_step_matches_single_device():
    assert len(jax.devices()) >= 8
    batch = _batch(B=8, T=2, P=32, K=2, N=2)
    key = jax.random.PRNGKey(7)
    key2 = jax.random.PRNGKey(11)

    t1 = _build([0])
    s1, m1 = t1._train_step(t1.state, shard_batch(t1.mesh, batch), key)
    s1, m1b = t1._train_step(s1, shard_batch(t1.mesh, batch), key2)

    t8 = _build(list(range(8)))
    s8, m8 = t8._train_step(t8.state, shard_batch(t8.mesh, batch), key)
    s8, m8b = t8._train_step(s8, shard_batch(t8.mesh, batch), key2)

    # Loss parity on step 1 (same params) and step 2 (params AFTER one
    # all-reduced update) — a materially wrong gradient sync shows up in the
    # second loss.
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1b["loss"]), float(m8b["loss"]), rtol=1e-3,
        err_msg="post-update loss diverges: gradient all-reduce is wrong",
    )

    # Aggregate parameter agreement. Per-coordinate comparison after an Adam
    # step is ill-posed (float reduction order flips the sign of near-zero
    # gradients, and Adam then maps any sign to a +-lr update), so a leaf
    # passes if EITHER its relative distance is small (weights with real
    # norm) OR its per-coordinate RMS difference is within a few Adam step
    # sizes (zero-init BatchNorm biases: after 2 steps each coordinate sits
    # at ~+-2lr, and a single sign flip moves it by up to 4lr — relative
    # distance is meaningless there while 0.16 rel is ~1 flipped step).
    lr = 1e-4  # --lr default; this config doesn't override it
    l1 = jax.tree_util.tree_leaves(jax.device_get(s1.params))
    l8 = jax.tree_util.tree_leaves(jax.device_get(s8.params))
    assert len(l1) == len(l8)
    sq_diff = sq_norm = 0.0
    for a, b in zip(l1, l8):
        diff = np.asarray(a) - np.asarray(b)
        rel = float(np.linalg.norm(diff)) / max(float(np.linalg.norm(a)), 1e-6)
        rms = float(np.linalg.norm(diff)) / np.sqrt(diff.size)
        assert rel < 2e-2 or rms < 4 * lr, (
            f"param leaf diverged: rel {rel}, rms {rms}"
        )
        sq_diff += float((diff**2).sum())
        sq_norm += float((np.asarray(a) ** 2).sum())
    assert (sq_diff / sq_norm) ** 0.5 < 1e-3, "global param divergence"
