"""End-to-end REINFORCE pipeline test (mirrors reference tests/test_rl.py
but on a locally generated toy dataset and tiny shapes, and — unlike the
reference, which left artifact assertions as TODOs (reference:
tests/test_rl.py:54-55) — asserts the output artifacts)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def toy_dir(tmp_path_factory):
    from jolineedle_tpu.data.toy import generate_toy_dataset

    return generate_toy_dataset(
        tmp_path_factory.mktemp("toylard"),
        n_train=6,
        n_test=3,
        image_size=(256, 320),
        seed=1,
    )


def test_reinforce_pipeline(toy_dir, tmp_path):
    import main

    work_dir = str(tmp_path / "checkpoints")
    # fmt: off
    cli_args = [
        "--seed", "12345",
        "--dataset-dir", str(toy_dir),
        "--training-mode", "reinforce",
        "--work-dir", work_dir,
        "--max-iters", "3",
        "--test-every", "2",
        "--test-samples", "2",
        "--env-name", "reinforce",
        "--group", "test",
        "--model-type", "gpt-nano",
        "--gpt-backbone", "yolox-nano",
        "--image-processor", "yolox-nano",
        "--concat-embeddings",
        "--decoder-pos-encoding",
        "--use-positional-embedding",
        "--enable-stop",
        "--entropy-weight", "0.1",
        "--max-seq-len", "4",
        "--batch-size", "2",
        "--gradient-accumulation", "2",
        "--dropout", "0.0",
        "--patch-size", "64",
        "--minimum-image-size", "0",
        "--detector-conf-threshold", "0.05",
        "--lr", "0.0001",
        "--yolo-lr", "0.0001",
        "--devices", "0",
        "--max-det-patches", "6",
        "--max-boxes", "4",
        "--compute-dtype", "float32",
        # Track best checkpoints by trajectory mAP instead of the RL
        # default prop_patches_found (--best-metric extension).
        "--best-metric", "map",
    ]
    # fmt: on
    args = main.get_args(cli_args)
    trainer = main.main(args)

    out_dir = os.path.join(work_dir, "test_reinforce")
    assert os.path.exists(os.path.join(out_dir, "config.json"))
    assert os.path.exists(os.path.join(out_dir, "checkpoint.msgpack"))
    assert os.path.exists(os.path.join(out_dir, "metrics.json"))
    with open(os.path.join(out_dir, "metrics.json")) as f:
        metrics = json.load(f)
    assert "prop_patches_found" in metrics
    assert 0.0 <= metrics["prop_patches_found"] <= 1.0
    assert "stop_used" in metrics
    assert np.isfinite(metrics["returns"])
    # The detector ran along the trajectory.
    assert "yolo_map" in metrics or "map" in metrics
    # Return-normalization window was maintained.
    assert np.isfinite(trainer.last_return_mean)
    assert np.isfinite(trainer.last_return_std)
    # --best-metric overrode the RL default (prop_patches_found) and the
    # best-checkpoint artifacts record the chosen criterion.
    assert trainer.best_metric_name == "map"
    assert os.path.exists(os.path.join(out_dir, "checkpoint_best.msgpack"))
    # best_model.txt must record the criterion's actual max, and the
    # criterion must have been genuinely emitted by the eval (a non-empty
    # per-episode list — not the defaultdict ghost an unrecognized name
    # would create). A 3-iter policy can legitimately score mAP 0.0, so the
    # VALUE is not asserted nonzero; the typo test below pins the fail-fast.
    with open(os.path.join(out_dir, "best_model.txt")) as f:
        best_txt = f.read()
    recorded = float(best_txt.split("map:")[1].strip())
    assert trainer.best_metric_history
    assert recorded == pytest.approx(max(trainer.best_metric_history))
    assert len(trainer.last_test_metrics["map"]) > 0


def test_best_metric_typo_fails_fast(toy_dir, tmp_path):
    """An unknown --best-metric must raise at the first eval instead of
    silently tracking an all-zero history (advisor finding, round 3)."""
    import main

    # fmt: off
    cli_args = [
        "--seed", "7",
        "--dataset-dir", str(toy_dir),
        "--training-mode", "reinforce",
        "--work-dir", str(tmp_path / "checkpoints"),
        "--max-iters", "2",
        "--test-every", "2",
        "--test-samples", "2",
        "--env-name", "typo",
        "--group", "test",
        "--model-type", "gpt-nano",
        "--gpt-backbone", "yolox-nano",
        "--image-processor", "yolox-nano",
        "--concat-embeddings",
        "--decoder-pos-encoding",
        "--use-positional-embedding",
        "--max-seq-len", "4",
        "--batch-size", "2",
        "--patch-size", "64",
        "--minimum-image-size", "0",
        "--compute-dtype", "float32",
        "--devices", "0",
        "--max-det-patches", "6",
        "--max-boxes", "4",
        "--best-metric", "mAP",  # typo: metrics key is 'map'
    ]
    # fmt: on
    args = main.get_args(cli_args)
    with pytest.raises(ValueError, match="mAP"):
        main.main(args)
