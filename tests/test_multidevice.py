"""Full-CLI multi-device integration tests (8-device virtual CPU mesh).

SURVEY.md section 4 calls multi-chip testing out as the reference's explicit
gap (its tests pin ``--devices 0``, reference: tests/test_sup.py:44,
tests/test_rl.py:45); these run BOTH trainers' complete pipelines —
prefetcher -> shard_batch -> (multi-step) jitted train dispatch -> batched
eval -> checkpoint/metrics — over all 8 virtual devices from the real CLI
entry point, including a --steps-per-dispatch > 1 case.
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def toy_dir(tmp_path_factory):
    from jolineedle_tpu.data.toy import generate_toy_dataset

    return generate_toy_dataset(
        tmp_path_factory.mktemp("toylard_md"),
        n_train=6,
        n_test=3,
        image_size=(256, 320),
        seed=0,
    )


ALL_DEVICES = ["0", "1", "2", "3", "4", "5", "6", "7"]


def _base_args(toy_dir, work_dir, mode, env_name):
    # fmt: off
    return [
        "--seed", "12345",
        "--dataset-dir", str(toy_dir),
        "--training-mode", mode,
        "--work-dir", work_dir,
        "--max-iters", "4",
        "--test-every", "2",
        "--test-samples", "2",
        "--env-name", env_name,
        "--group", "md",
        "--model-type", "gpt-nano",
        "--gpt-backbone", "yolox-nano",
        "--image-processor", "yolox-nano",
        "--concat-embeddings",
        "--decoder-pos-encoding",
        "--use-positional-embedding",
        "--max-seq-len", "4",
        "--batch-size", "2",
        "--max-keypoints", "1",
        "--min-keypoints", "0",
        "--dropout", "0.0",
        "--patch-size", "64",
        "--minimum-image-size", "0",
        "--detector-conf-threshold", "0.05",
        "--lr", "0.0001",
        "--yolo-lr", "0.0001",
        "--devices", *ALL_DEVICES,
        "--max-det-patches", "6",
        "--max-boxes", "4",
        "--compute-dtype", "float32",
    ]
    # fmt: on


def _check_outputs(work_dir, env_name):
    out_dir = os.path.join(work_dir, f"md_{env_name}")
    for name in ("config.json", "checkpoint.msgpack", "metrics.json"):
        assert os.path.exists(os.path.join(out_dir, name)), name
    with open(os.path.join(out_dir, "metrics.json")) as f:
        metrics = json.load(f)
    assert all(np.isfinite(v) for v in metrics.values())
    return metrics


def test_supervised_8dev_multistep(toy_dir, tmp_path):
    """Supervised pipeline on all 8 devices with 2 train iterations per
    jitted dispatch (the stacked-batch path must shard over batch axis 1)."""
    import jax
    import main

    assert jax.device_count() >= 8
    work_dir = str(tmp_path / "ckpt")
    cli = _base_args(toy_dir, work_dir, "supervised", "sup8")
    # fmt: off
    cli += [
        "--loss", "on-optimal-trajectory",
        "--binomial-keypoints",
        "--gradient-accumulation", "2",
        "--steps-per-dispatch", "2",
        "--stop-weight", "0.1",
        "--augment-translate",
    ]
    # fmt: on
    main.main(main.get_args(cli))
    metrics = _check_outputs(work_dir, "sup8")
    assert "map" in metrics and "action_accuracy" in metrics


def test_reinforce_8dev(toy_dir, tmp_path):
    """REINFORCE pipeline on all 8 devices: the rollout scan, return
    normalization, and grad sync (broken in the reference, reference:
    src/reinforce.py:279-280) all run sharded."""
    import jax
    import main

    assert jax.device_count() >= 8
    work_dir = str(tmp_path / "ckpt")
    cli = _base_args(toy_dir, work_dir, "reinforce", "rl8")
    # fmt: off
    cli += [
        "--enable-stop",
        "--gradient-accumulation", "2",
    ]
    # fmt: on
    main.main(main.get_args(cli))
    metrics = _check_outputs(work_dir, "rl8")
    assert "prop_patches_found" in metrics
