"""--init-from: params-only warm start across training modes.

The reference restores full torch state_dicts regardless of mode
(reference: main.py:532-562, model is the same GPT either way); here the
two modes' optimizer pytrees differ (REINFORCE adds clip), so the rebuild
exposes an explicit params-only warm-start flag instead. This pins:

- ReinforceTrainer(--init-from <sup run dir>) gets the supervised model
  params/batch-stats verbatim;
- its optimizer state and step counter stay fresh;
- --init-from together with --resume-training is rejected.
"""

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def toy_dir(tmp_path_factory):
    from jolineedle_tpu.data.toy import generate_toy_dataset

    return generate_toy_dataset(
        tmp_path_factory.mktemp("toylard"),
        n_train=4,
        n_test=2,
        image_size=(192, 256),
        seed=7,
    )


def _cli(toy_dir, work_dir, mode, extra=()):
    # fmt: off
    return [
        "--seed", "11",
        "--dataset-dir", str(toy_dir),
        "--training-mode", mode,
        "--work-dir", str(work_dir),
        "--max-iters", "1",
        "--test-every", "1",
        "--test-samples", "1",
        "--env-name", mode,
        "--group", "warm",
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
        *extra,
    ]
    # fmt: on


def test_graft_overlap_head_growth():
    """Warm-starting a stop-enabled (9-action) model from a no-stop
    (8-action) checkpoint grafts the 8 trained move rows/columns and keeps
    the fresh init for the STOP slot (STOP is the last action id,
    env/actions.py:16-27)."""
    from jolineedle_tpu.checkpoint import _graft_overlap

    rng = np.random.default_rng(0)
    # wte grows on dim 0, the head kernel on dim 1, a matching leaf passes
    # through, a missing leaf keeps the fresh init.
    target = {
        "wte": rng.normal(size=(9, 16)).astype(np.float32),
        "head": {"kernel": rng.normal(size=(16, 9)).astype(np.float32)},
        "same": np.zeros((4,), np.float32),
        "new_layer": np.full((3,), 7.0, np.float32),
    }
    ckpt = {
        "wte": rng.normal(size=(8, 16)).astype(np.float32),
        "head": {"kernel": rng.normal(size=(16, 8)).astype(np.float32)},
        "same": np.ones((4,), np.float32),
    }
    out = _graft_overlap(target, ckpt)
    np.testing.assert_array_equal(out["wte"][:8], ckpt["wte"])
    np.testing.assert_array_equal(out["wte"][8], target["wte"][8])
    np.testing.assert_array_equal(
        out["head"]["kernel"][:, :8], ckpt["head"]["kernel"]
    )
    np.testing.assert_array_equal(
        out["head"]["kernel"][:, 8], target["head"]["kernel"][:, 8]
    )
    np.testing.assert_array_equal(out["same"], ckpt["same"])
    np.testing.assert_array_equal(out["new_layer"], target["new_layer"])
    # Rank mismatch: keep fresh init rather than guessing.
    out2 = _graft_overlap(
        {"x": np.zeros((2, 2), np.float32)}, {"x": np.ones((4,), np.float32)}
    )
    np.testing.assert_array_equal(out2["x"], np.zeros((2, 2), np.float32))


def test_cross_mode_warm_start(toy_dir, tmp_path):
    import main
    from jolineedle_tpu import checkpoint as ckpt
    from jolineedle_tpu.config import args_to_config
    from jolineedle_tpu.env import get_actions_info
    from jolineedle_tpu.models.gpt import GPT
    from jolineedle_tpu.train.reinforce import ReinforceTrainer

    sup_work = tmp_path / "sup_ckpts"
    args = main.get_args(_cli(toy_dir, sup_work, "supervised"))
    sup_trainer = main.main(args)
    sup_dir = str(sup_trainer.checkpoint_dir)

    # Build an RL trainer directly (no training) and warm-start it.
    args = main.get_args(_cli(toy_dir, tmp_path / "rl_ckpts", "reinforce"))
    train_config, model_config = args_to_config(args)
    train_dataset, test_dataset = main.build_both_datasets(
        train_config, model_config, args.dataset_dir
    )
    model = GPT.from_config(model_config, get_actions_info(train_config))
    rl = ReinforceTrainer(train_config, model, None, train_dataset, test_dataset)

    fresh_opt = jax.tree_util.tree_leaves(rl.state.opt_state)
    rl.load_params_checkpoint(sup_dir)

    # Params/batch-stats match the supervised checkpoint exactly.
    saved = ckpt.load_checkpoint(
        f"{sup_dir}/{ckpt.CKPT_LAST}", jax.device_get(sup_trainer.state)
    )
    for got, want in zip(
        jax.tree_util.tree_leaves(jax.device_get(rl.state.params)),
        jax.tree_util.tree_leaves(saved.params),
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(
        jax.tree_util.tree_leaves(jax.device_get(rl.state.batch_stats)),
        jax.tree_util.tree_leaves(saved.batch_stats),
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # Optimizer state stayed fresh (same leaves as before the warm start).
    for got, want in zip(
        jax.tree_util.tree_leaves(jax.device_get(rl.state.opt_state)),
        jax.device_get(fresh_opt),
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert int(rl.state.step) == 0

    # The CLI rejects combining warm start with a full resume.
    bad = main.get_args(
        _cli(
            toy_dir,
            tmp_path / "bad",
            "reinforce",
            extra=["--init-from", sup_dir, "--resume-training", sup_dir],
        )
    )
    with pytest.raises(ValueError, match="mutually exclusive"):
        main.main(bad)
