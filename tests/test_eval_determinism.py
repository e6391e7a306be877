"""Batched-eval RNG determinism (round-2 verdict weak item 6).

The shared eval dispatcher derives one PRNG key per device dispatch by
folding a counter plus every chunk row's seed (train/trainer.py,
``_batched_eval_rollouts``): per-EPISODE results therefore depend on the
chunk layout (reset positions are drawn from the dispatch key), but a
whole eval pass over a fixed row list is exactly reproducible — greedy
AND sampled — once the dispatch counter is aligned. This pins that
contract with a real (tiny) REINFORCE trainer end-to-end.
"""

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def rl_trainer(tmp_path_factory):
    import main
    from jolineedle_tpu.config import args_to_config
    from jolineedle_tpu.data.toy import generate_toy_dataset
    from jolineedle_tpu.env import get_actions_info
    from jolineedle_tpu.models.gpt import GPT
    from jolineedle_tpu.train.reinforce import ReinforceTrainer

    toy_dir = generate_toy_dataset(
        tmp_path_factory.mktemp("toylard"),
        n_train=4,
        n_test=3,
        image_size=(192, 256),
        seed=3,
    )
    # fmt: off
    args = main.get_args([
        "--seed", "5",
        "--dataset-dir", str(toy_dir),
        "--training-mode", "reinforce",
        "--work-dir", str(tmp_path_factory.mktemp("work")),
        "--max-iters", "1",
        "--test-samples", "1",
        "--env-name", "detrng",
        "--model-type", "gpt-nano",
        "--gpt-backbone", "yolox-nano",
        "--image-processor", "yolox-nano",
        "--concat-embeddings",
        "--decoder-pos-encoding",
        "--use-positional-embedding",
        "--enable-stop",
        "--max-seq-len", "4",
        "--batch-size", "2",
        "--dropout", "0.0",
        "--patch-size", "64",
        "--minimum-image-size", "0",
        "--devices", "0",
        "--max-det-patches", "4",
        "--max-boxes", "4",
        "--compute-dtype", "float32",
    ])
    # fmt: on
    train_config, model_config = args_to_config(args)
    train_ds, test_ds = main.build_both_datasets(
        train_config, model_config, args.dataset_dir
    )
    model = GPT.from_config(model_config, get_actions_info(train_config))
    return ReinforceTrainer(train_config, model, None, train_ds, test_ds)


def _rows(trainer, n=3):
    rows = []
    for i in range(n):
        item = trainer.test_dataset[i]
        rows.append(
            {
                "image": item["image"],
                "boxes": np.asarray(item["bboxes"], np.float32).reshape(-1, 4),
                "seed": i,
            }
        )
    return rows


def _run_eval(trainer, rows, sample):
    # Align the dispatch counter so key derivation restarts identically.
    trainer._eval_dispatch_count = 0
    return trainer._batched_eval_rollouts(rows, sample_actions=sample)


@pytest.mark.parametrize("sample", [False, True])
def test_eval_pass_is_reproducible(rl_trainer, sample):
    """Two identical eval passes (same rows, layout, counter) match
    bit-for-bit, sampled or greedy."""
    rows = _rows(rl_trainer)
    first = _run_eval(rl_trainer, rows, sample)
    second = _run_eval(rl_trainer, rows, sample)
    for a, b in zip(first, second):
        assert set(a.keys()) == set(b.keys())
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=f"key {k}"
            )


def test_row_seed_changes_episodes(rl_trainer):
    """Row seeds are folded into the dispatch key: permuting them yields a
    different (but still deterministic) episode set — the documented
    'deterministic in the episode set' contract."""
    rows = _rows(rl_trainer)
    base = _run_eval(rl_trainer, rows, sample=False)
    for r, s in zip(rows, (7, 8, 9)):
        r["seed"] = s
    reseeded = _run_eval(rl_trainer, rows, sample=False)
    diff = any(
        not np.array_equal(np.asarray(a["positions"]), np.asarray(b["positions"]))
        for a, b in zip(base, reseeded)
    )
    assert diff, "changing row seeds should change reset positions"
