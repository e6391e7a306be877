"""REINFORCE rollout semantics tests (mask bookkeeping / reward-to-go parity
with reference src/reinforce.py:186-215)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def trainer():
    from jolineedle_tpu.config import args_to_config, get_args
    from jolineedle_tpu.env import get_actions_info
    from jolineedle_tpu.models.gpt import GPT
    from jolineedle_tpu.train.reinforce import ReinforceTrainer

    # fmt: off
    cli = [
        "--training-mode", "reinforce", "--dataset-dir", "/nonexistent",
        "--work-dir", "/tmp/test_rollout_out", "--model-type", "gpt-pico",
        "--image-processor", "yolox-nano", "--gpt-backbone", "yolox-nano",
        "--decoder-pos-encoding", "--use-positional-embedding",
        "--concat-embeddings", "--max-seq-len", "4", "--patch-size", "32",
        "--minimum-image-size", "0", "--batch-size", "2", "--dropout", "0.0",
        "--max-det-patches", "4", "--max-boxes", "2",
        "--compute-dtype", "float32", "--devices", "0",
    ]
    # fmt: on
    train_config, model_config = args_to_config(get_args(cli))
    model = GPT.from_config(model_config, get_actions_info(train_config))
    return ReinforceTrainer(train_config, model, None, None, None)


def _rollout(trainer, image, boxes, key_seed=0):
    fn = trainer._get_eval_rollout(image.shape)
    return jax.device_get(
        fn(
            trainer.eval_variables(),
            jnp.asarray(image)[None],
            jnp.asarray(boxes)[None],
            jax.random.PRNGKey(key_seed),
            sample=True,
        )
    )


def test_returns_are_masked_reward_to_go(trainer):
    rng = np.random.default_rng(0)
    image = rng.random((64, 64, 3)).astype(np.float32)  # 2x2 grid of 32px
    boxes = np.array([[2.0, 2.0, 20.0, 20.0]], np.float32)
    ro = _rollout(trainer, image, boxes)

    rewards = ro["rewards"]
    masks = ro["logit_masks"]
    returns = ro["returns"]
    # Reward-to-go: returns[t] = sum_{s >= t} rewards[s] * masks[s]
    expected = np.flip(np.cumsum(np.flip(rewards * masks, 1), 1), 1)
    np.testing.assert_allclose(returns, expected, rtol=1e-6)

    # First step always counts (reference: reinforce.py:193-194).
    assert masks[:, 0].all()

    # Once the mask drops it never comes back, and masked rewards are zero.
    for b in range(masks.shape[0]):
        dropped = False
        for t in range(masks.shape[1]):
            if masks[b, t] == 0:
                dropped = True
            if dropped:
                assert masks[b, t] == 0
                assert rewards[b, t] == 0.0


def test_termination_freezes_episode(trainer):
    """With a box covering the whole image, every patch is a bbox patch of
    a 2x2 grid -> after at most 3 new-patch visits the episode terminates;
    positions must freeze afterwards."""
    rng = np.random.default_rng(1)
    image = rng.random((64, 64, 3)).astype(np.float32)
    boxes = np.array([[0.0, 0.0, 63.0, 63.0]], np.float32)
    ro = _rollout(trainer, image, boxes)
    assert ro["prop_patches_found"][0] <= 1.0

    masks = ro["masks"][0]  # [T+1]
    positions = ro["positions"][0]
    n_valid = int(masks.sum())
    # After the last valid step, positions stay frozen.
    for t in range(n_valid, positions.shape[0] - 1):
        np.testing.assert_array_equal(positions[t + 1], positions[t])


def test_scan_rollout_matches_host_decode_loop(trainer):
    """The on-device greedy scan must reproduce, step for step, a host loop
    that uses the jitted single-token decode + numpy env stepping — catching
    any divergence in patch gather, clamping, or cache indexing."""
    from jolineedle_tpu.env.actions import ACTION_DELTAS_ARRAY
    from jolineedle_tpu.env.batched_env import NeedleEnv
    from jolineedle_tpu.env.oracle import gather_patches

    rng = np.random.default_rng(3)
    image = rng.random((64, 96, 3)).astype(np.float32)  # 2x3 grid
    boxes = np.array([[5.0, 5.0, 30.0, 30.0]], np.float32)
    variables = trainer.eval_variables()
    T = trainer.max_ep_len

    @jax.jit
    def scan_rollout(variables, image, boxes, pos0):
        env = NeedleEnv(
            image[None], boxes[None], 32, T, 1, False,
            terminate_on_all_found=False,
        )
        return trainer._rollout_scan(
            variables,
            env,
            jax.random.PRNGKey(0),
            sample=False,
            collect=("logits", "actions"),
            positions=pos0[None],
        )

    pos0 = np.array([0, 2], np.int32)
    ro = jax.device_get(scan_rollout(variables, jnp.asarray(image),
                                     jnp.asarray(boxes), jnp.asarray(pos0)))

    # Host loop with the single-token decode path.
    cache = trainer._init_cache(variables, jnp.zeros((1,), jnp.int32))
    position = pos0.copy()
    prev_action = np.int32(0)
    deltas = np.asarray(ACTION_DELTAS_ARRAY)
    for t in range(T):
        patch = gather_patches(image, position[None], 32)
        logits, cache = trainer._decode_step(
            variables,
            cache,
            jnp.asarray(patch),
            jnp.array([prev_action], jnp.int32),
            jnp.asarray(position[None]),
            jnp.int32(t),
        )
        logits = np.asarray(logits, np.float32)[0]
        np.testing.assert_allclose(ro["logits"][0, t], logits, atol=1e-4)
        action = int(np.argmax(logits))
        assert int(ro["actions"][0, t]) == action
        position = np.clip(position + deltas[action], [0, 0], [1, 2]).astype(
            np.int32
        )
        np.testing.assert_array_equal(ro["positions"][0, t + 1], position)
        prev_action = np.int32(action)


def test_no_recurrent_embedding_matches_kv_cache(trainer):
    """--no-recurrent-embedding selects the full-prefix-forward rollout
    (reference: main.py:301-306 disables the embedding cache the same way);
    it must be numerically identical to the KV-cache decode path — this
    doubles as a second scan-vs-forward equivalence oracle."""
    from jolineedle_tpu.env.batched_env import NeedleEnv

    rng = np.random.default_rng(7)
    image = rng.random((64, 96, 3)).astype(np.float32)
    boxes = np.array([[5.0, 5.0, 30.0, 30.0]], np.float32)
    variables = trainer.eval_variables()
    T = trainer.max_ep_len
    pos0 = np.array([1, 1], np.int32)

    def run():
        @jax.jit
        def scan_rollout(variables, image, boxes, pos0):
            env = NeedleEnv(
                image[None], boxes[None], 32, T, 1, False,
                terminate_on_all_found=False,
            )
            return trainer._rollout_scan(
                variables,
                env,
                jax.random.PRNGKey(0),
                sample=False,
                collect=("logits", "actions"),
                positions=pos0[None],
            )

        return jax.device_get(
            scan_rollout(
                variables, jnp.asarray(image), jnp.asarray(boxes),
                jnp.asarray(pos0),
            )
        )

    ro_kv = run()
    orig = trainer.model
    trainer.model = orig.clone(no_recurrent_embedding=True)
    try:
        ro_full = run()
    finally:
        trainer.model = orig

    np.testing.assert_allclose(
        ro_full["logits"], ro_kv["logits"], atol=1e-4
    )
    np.testing.assert_array_equal(ro_full["actions"], ro_kv["actions"])
    np.testing.assert_array_equal(ro_full["positions"], ro_kv["positions"])
    np.testing.assert_allclose(
        ro_full["rewards"], ro_kv["rewards"], atol=1e-5
    )


def test_episode_metrics_range(trainer):
    rng = np.random.default_rng(2)
    image = rng.random((64, 96, 3)).astype(np.float32)
    boxes = np.array([[40.0, 5.0, 90.0, 25.0]], np.float32)
    ro = _rollout(trainer, image, boxes)
    m = trainer.compute_rollout_metrics(ro)
    assert 0.0 <= m["prop_patches_found"] <= 1.0
    assert 1.0 <= m["episode_length"] <= trainer.max_ep_len
    assert np.isfinite(m["loss"])
