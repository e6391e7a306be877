"""Worker process for the two-process DCN smoke test.

Run with env: JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=2,
JAX_COORDINATOR_ADDRESS=localhost:<port>, JAX_NUM_PROCESSES=2,
JAX_PROCESS_ID=<0|1>.

Importing ``main`` executes the real multi-host gate (main.py: the
JAX_COORDINATOR_ADDRESS branch), then a sharded supervised train step runs
over the process-spanning 4-device mesh — cross-process gradient all-reduce
included. Prints one line: ``DCN_LOSS <step1> <step2>``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import main  # noqa: F401  (runs jax.distributed.initialize via its env gate)

import jax

from jolineedle_tpu.config import args_to_config, get_args
from jolineedle_tpu.env import get_actions_info
from jolineedle_tpu.models.gpt import GPT
from jolineedle_tpu.parallel.mesh import shard_batch
from jolineedle_tpu.train.supervised import SupervisedTrainer


def build():
    cli = [
        "--dataset-dir", "/nonexistent",
        "--training-mode", "supervised",
        "--work-dir", "/tmp/dcn_smoke",
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
        "--devices", "0", "1", "2", "3",
    ]
    train_config, model_config = args_to_config(get_args(cli))
    model = GPT.from_config(model_config, get_actions_info(train_config))
    return SupervisedTrainer(train_config, model, None, None, None)


def batch(B, T, P, K, N):
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


def run():
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())
    trainer = build()
    b = batch(B=4, T=2, P=32, K=2, N=2)
    state, m1 = trainer._train_step(
        trainer.state, shard_batch(trainer.mesh, b), jax.random.PRNGKey(7)
    )
    state, m2 = trainer._train_step(
        state, shard_batch(trainer.mesh, b), jax.random.PRNGKey(11)
    )
    print(f"DCN_LOSS {float(m1['loss']):.8f} {float(m2['loss']):.8f}", flush=True)


if __name__ == "__main__":
    run()
