"""Inference CLI test: config.json + best checkpoint -> rollout, PNGs,
aggregate metrics (reference surface: infer.py:87-213).

Builds the model directory directly (init + save) instead of training, so
the test exercises exactly the load-path the CLI uses."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def toy_dir(tmp_path_factory):
    from jolineedle_tpu.data.toy import generate_toy_dataset

    return generate_toy_dataset(
        tmp_path_factory.mktemp("toylard"),
        n_train=4,
        n_test=2,
        image_size=(128, 192),
        seed=2,
    )


def test_infer_cli(toy_dir, tmp_path):
    from jolineedle_tpu import checkpoint as ckpt
    from jolineedle_tpu.config import args_to_config, get_args, save_config
    from jolineedle_tpu.env import get_actions_info
    from jolineedle_tpu.models.gpt import GPT
    from jolineedle_tpu.train.reinforce import ReinforceTrainer

    work_dir = str(tmp_path / "checkpoints")
    # fmt: off
    cli_args = [
        "--seed", "7",
        "--dataset-dir", str(toy_dir),
        "--training-mode", "reinforce",
        "--work-dir", work_dir,
        "--env-name", "infer_model",
        "--model-type", "gpt-pico",
        "--image-processor", "yolox-nano",
        "--gpt-backbone", "yolox-nano",
        "--concat-embeddings",
        "--decoder-pos-encoding",
        "--use-positional-embedding",
        "--max-seq-len", "3",
        "--batch-size", "1",
        "--dropout", "0.0",
        "--patch-size", "64",
        "--minimum-image-size", "0",
        "--detector-conf-threshold", "0.05",
        "--devices", "0",
        "--max-det-patches", "4",
        "--max-boxes", "4",
        "--compute-dtype", "float32",
    ]
    # fmt: on
    train_config, model_config = args_to_config(get_args(cli_args))
    save_config(model_config, train_config)

    model = GPT.from_config(model_config, get_actions_info(train_config))
    trainer = ReinforceTrainer(train_config, model, None, None, None)
    model_dir = os.path.join(work_dir, "infer_model")
    ckpt.save_checkpoint(os.path.join(model_dir, ckpt.CKPT_BEST), trainer.state)

    import infer

    out_dir = str(tmp_path / "results")
    infer_args = infer.get_infer_args(
        [
            "--model-dir", model_dir,
            "--dataset", str(toy_dir / "test.txt"),
            "--output-dir", out_dir,
        ]
    )
    metrics = infer.infer(infer_args)

    assert os.path.exists(os.path.join(out_dir, "result0.png"))
    assert os.path.exists(os.path.join(out_dir, "result1.png"))
    assert "prop_patches_found" in metrics
    assert all(np.isfinite(v).all() for v in metrics.values())
