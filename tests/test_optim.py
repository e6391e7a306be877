"""--weight-decay wiring tests (reference: main.py:137-141, 552-557, 584).

The reference parses --weight-decay but its AdamW constructors omit it and
the resume-time `optim.weight_decay = ...` override sets a dead attribute;
here the flag is wired for real (see train/optim.py docstring). Observable:
with zero gradients, AdamW updates are exactly zero iff weight decay is zero
(decay adds a -lr*wd*param term independent of the gradient).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tree_max_abs(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return max(float(jnp.max(jnp.abs(l))) for l in leaves)


def _make_params():
    rng = np.random.default_rng(0)
    return {
        "wte": {"embedding": jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)},
        "yolox": {
            "backbone": {
                "w": jnp.asarray(rng.normal(size=(3, 3)), jnp.float32)
            },
            "head": {"w": jnp.asarray(rng.normal(size=(3,)), jnp.float32)},
        },
    }


@pytest.mark.parametrize("wd", [0.0, 0.5])
def test_weight_decay_changes_updates(wd):
    from jolineedle_tpu.train.optim import make_optimizer

    params = _make_params()
    tx = make_optimizer(
        params,
        learning_rate=1e-3,
        yolo_lr=1e-4,
        weight_decay=wd,
    )
    opt_state = tx.init(params)
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(zero_grads, opt_state, params)
    if wd == 0.0:
        assert _tree_max_abs(updates) == 0.0
    else:
        # Decay applies to every non-frozen leaf: -lr * wd * param.
        expected_gpt = -1e-3 * wd * params["wte"]["embedding"]
        np.testing.assert_allclose(
            updates["wte"]["embedding"], expected_gpt, rtol=1e-5
        )
        expected_yolo = -1e-4 * wd * params["yolox"]["head"]["w"]
        np.testing.assert_allclose(
            updates["yolox"]["head"]["w"], expected_yolo, rtol=1e-5
        )


def test_cosine_lr_schedule_decays_updates():
    """--lr-schedule cosine: update magnitude shrinks as the schedule
    decays (checked through the optax transform on constant grads)."""
    from jolineedle_tpu.train.optim import make_optimizer

    params = _make_params()
    tx = make_optimizer(
        params,
        learning_rate=1e-2,
        yolo_lr=1e-3,
        lr_schedule="cosine",
        lr_warmup_iters=2,
        lr_decay_iters=20,
    )
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    mags = []
    for _ in range(20):
        updates, opt_state = tx.update(grads, opt_state, params)
        mags.append(float(jnp.abs(updates["wte"]["embedding"]).mean()))
    assert mags[0] < mags[2]  # warmup ramps up
    assert mags[-1] < 0.5 * max(mags)  # decay takes effect


def test_trainer_wires_cli_weight_decay(tmp_path):
    """End-to-end: the CLI flag reaches the trainer's optax transform, and a
    resumed trainer re-applies the *current* CLI value (the reference's
    intended resume-override semantics, main.py:552-557)."""
    from jolineedle_tpu.config import args_to_config, get_args
    from jolineedle_tpu.env import get_actions_info
    from jolineedle_tpu.models.gpt import GPT
    from jolineedle_tpu.train.reinforce import ReinforceTrainer

    def build(wd):
        # fmt: off
        cli = [
            "--training-mode", "reinforce", "--dataset-dir", "/nonexistent",
            "--work-dir", str(tmp_path), "--model-type", "gpt-pico",
            "--image-processor", "yolox-nano", "--max-seq-len", "2",
            "--patch-size", "32", "--minimum-image-size", "0",
            "--batch-size", "2", "--dropout", "0.0", "--max-det-patches", "2",
            "--max-boxes", "2", "--compute-dtype", "float32",
            "--devices", "0", "--weight-decay", str(wd),
        ]
        # fmt: on
        train_config, model_config = args_to_config(get_args(cli))
        assert train_config.weight_decay == wd
        model = GPT.from_config(model_config, get_actions_info(train_config))
        return ReinforceTrainer(train_config, model, None, None, None)

    trainer = build(0.25)
    params = trainer.state.params
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = trainer.tx.update(
        zero_grads, trainer.state.opt_state, params
    )
    assert _tree_max_abs(updates) > 0.0  # decay active

    trainer0 = build(0.0)
    updates0, _ = trainer0.tx.update(
        jax.tree_util.tree_map(jnp.zeros_like, trainer0.state.params),
        trainer0.state.opt_state,
        trainer0.state.params,
    )
    assert _tree_max_abs(updates0) == 0.0

    # Resume-override semantics: restore trainer0's checkpointed state into a
    # trainer built with a different weight decay -> the new value applies.
    trainer0.save_state()
    trainer_resumed = build(0.25)
    trainer_resumed.load_checkpoint(trainer0.checkpoint_dir)
    updates_r, _ = trainer_resumed.tx.update(
        jax.tree_util.tree_map(
            jnp.zeros_like, trainer_resumed.state.params
        ),
        trainer_resumed.state.opt_state,
        trainer_resumed.state.params,
    )
    assert _tree_max_abs(updates_r) > 0.0


def test_default_weight_decay_matches_reference_effective_001():
    """The behavioral-parity default is 0.01 (torch AdamW's default, which
    the reference always applies because its constructors omit the arg —
    reference: src/models/gpt.py:552-560), not the reference's parsed-but-
    inert 0.0 (main.py:137-141)."""
    from jolineedle_tpu.config import get_args, args_to_config

    args = get_args(
        ["--dataset-dir", "/tmp/x", "--training-mode", "supervised"]
    )
    assert args.weight_decay == 0.01
    train_config, _ = args_to_config(args)
    assert train_config.weight_decay == 0.01
