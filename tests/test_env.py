"""Batched env unit tests (port of reference tests/test_env.py semantics)."""

import jax.numpy as jnp
import numpy as np

from jolineedle_tpu.env import Action, NeedleEnv


def make_env(stop_enabled=False, max_ep_len=8, stop_bonus_scale=1.0):
    images = np.zeros((1, 1792, 2240, 3), np.float32)
    images[:, 0:448, 448:896, 0] = 1.0
    bboxes = np.array([[[310, 810, 400, 850], [700, 1500, 800, 1600]]], np.float32)
    return NeedleEnv(
        images=jnp.asarray(images),
        bboxes=jnp.asarray(bboxes),
        patch_size=448,
        max_ep_len=max_ep_len,
        n_glimps_levels=1,
        stop_enabled=stop_enabled,
        stop_bonus_scale=stop_bonus_scale,
    )


def test_env_positions():
    env = make_env()
    state, patches, infos = env.reset(positions=jnp.array([[1, 0]]))
    assert np.array_equal(np.asarray(infos["positions"]), [[1, 0]])
    assert patches.shape == (1, 1, 448, 448, 3)

    state, *_ = env.step(state, jnp.array([Action.RIGHT.value]))
    state, *_ = env.step(state, jnp.array([Action.DOWN.value]))
    state, patches, rewards, term, trunc, infos = env.step(
        state, jnp.array([Action.DOWN.value])
    )
    assert np.array_equal(np.asarray(infos["positions"]), [[3, 1]])


def test_env_border_clamp():
    env = make_env()
    state, _, _ = env.reset(positions=jnp.array([[0, 0]]))
    state, *_ = env.step(state, jnp.array([Action.LEFT_UP.value]))
    assert np.array_equal(np.asarray(state.positions), [[0, 0]])


def test_env_rewards_and_termination():
    env = make_env(max_ep_len=8)
    # Box 1 [x1=310, y1=810, x2=400, y2=850] -> patch (row 1, col 0).
    # Box 2 [x1=700, y1=1500, x2=800, y2=1600] -> patch (row 3, col 1).
    mask = np.asarray(env.bbox_masks[0])
    assert mask[1, 0] and mask[3, 1]
    assert mask.sum() == 2

    state, _, _ = env.reset(positions=jnp.array([[0, 0]]))
    state, _, rewards, term, trunc, _ = env.step(
        state, jnp.array([Action.DOWN.value])
    )
    # New bbox patch: +1 plus the -1/max_ep_len step cost.
    assert np.allclose(np.asarray(rewards), 1.0 - 1.0 / 8)
    assert not bool(term[0])

    # Revisit: no +1.
    state, _, rewards, *_ = env.step(state, jnp.array([Action.UP.value]))
    state, _, rewards, *_ = env.step(state, jnp.array([Action.DOWN.value]))
    assert np.allclose(np.asarray(rewards), -1.0 / 8)

    # Visit the second bbox patch: terminated (all bbox patches visited).
    state, _, _, term, *_ = env.step(state, jnp.array([Action.RIGHT_DOWN.value]))
    state, _, rewards, term, *_ = env.step(state, jnp.array([Action.DOWN.value]))
    assert np.allclose(np.asarray(rewards), 1.0 - 1.0 / 8)
    assert bool(term[0])


def test_env_stop_rewards():
    env = make_env(stop_enabled=True)
    state, _, _ = env.reset(positions=jnp.array([[0, 0]]))
    # Stop immediately without finding anything: penalty = 0 - 2 = -2.
    state, _, rewards, term, *_ = env.step(state, jnp.array([Action.STOP.value]))
    assert bool(term[0])
    assert np.allclose(np.asarray(rewards), -2.0 - 1.0 / 8)


def test_env_stop_bonus_scale():
    """--stop-bonus-scale multiplies ONLY the stop bonus/penalty term;
    step cost and found rewards are untouched."""
    env = make_env(stop_enabled=True, stop_bonus_scale=0.25)
    state, _, _ = env.reset(positions=jnp.array([[0, 0]]))
    # Unscaled penalty is -2 (0 found of 2); scaled: -0.5.
    state, _, rewards, term, *_ = env.step(state, jnp.array([Action.STOP.value]))
    assert bool(term[0])
    assert np.allclose(np.asarray(rewards), 0.25 * -2.0 - 1.0 / 8)
    # The scale survives the pytree round-trip (jit/scan carry the env).
    import jax

    leaves, aux = jax.tree_util.tree_flatten(env)
    env2 = jax.tree_util.tree_unflatten(aux, leaves)
    assert env2.stop_bonus_scale == 0.25


def test_masked_step_freezes():
    env = make_env()
    state, _, _ = env.reset(positions=jnp.array([[1, 1]]))
    frozen = jnp.array([True])
    new_state, _, rewards, *_ = env.masked_step(
        state, jnp.array([Action.RIGHT.value]), frozen
    )
    assert np.array_equal(
        np.asarray(new_state.positions), np.asarray(state.positions)
    )
    assert np.allclose(np.asarray(rewards), 0.0)


def test_uint8_image_storage_matches_float():
    """uint8 images stay uint8 in HBM; patches normalize to float32 [0, 1]
    at gather time, bit-identical to the float32 path."""
    rng = np.random.default_rng(0)
    img_u8 = rng.integers(0, 256, (2, 128, 192, 3), dtype=np.uint8)
    img_f32 = img_u8.astype(np.float32) / 255.0
    boxes = np.array(
        [[[10, 10, 50, 40]], [[70, 20, 120, 60]]], np.float32
    )

    def build(images):
        return NeedleEnv(
            images=jnp.asarray(images),
            bboxes=jnp.asarray(boxes),
            patch_size=64,
            max_ep_len=4,
            n_glimps_levels=1,
            stop_enabled=False,
        )

    env_u8, env_f = build(img_u8), build(img_f32)
    assert env_u8.images.dtype == jnp.uint8  # stored without upcast

    pos = jnp.array([[0, 1], [1, 2]])
    s8, p8, _ = env_u8.reset(positions=pos)
    sf, pf, _ = env_f.reset(positions=pos)
    assert p8.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(p8), np.asarray(pf))

    s8, p8, r8, t8, *_ = env_u8.step(s8, jnp.array([2, 2]))
    sf, pf, rf, tf, *_ = env_f.step(sf, jnp.array([2, 2]))
    np.testing.assert_array_equal(np.asarray(p8), np.asarray(pf))
    np.testing.assert_array_equal(np.asarray(r8), np.asarray(rf))

    import jax

    key = jax.random.PRNGKey(0)
    d8 = env_u8.get_detection_batch(key, max_patches=3, sample_neg=1)
    df = env_f.get_detection_batch(key, max_patches=3, sample_neg=1)
    np.testing.assert_array_equal(np.asarray(d8[0]), np.asarray(df[0]))
    np.testing.assert_array_equal(np.asarray(d8[1]), np.asarray(df[1]))


def test_uint8_rejects_glimpse_pyramid():
    import pytest

    img_u8 = np.zeros((1, 128, 128, 3), np.uint8)
    with pytest.raises(AssertionError):
        NeedleEnv(
            images=jnp.asarray(img_u8),
            bboxes=jnp.zeros((1, 1, 4), np.float32),
            patch_size=64,
            max_ep_len=4,
            n_glimps_levels=2,
            stop_enabled=False,
        )


def test_detection_batch_includes_negatives():
    """sample_neg random negative patches must be valid alongside the
    positives (reference: src/env/general_env.py:506-546; regression: the
    ranking previously never selected a negative when positives existed)."""
    import jax

    images = np.zeros((1, 128, 128, 3), np.float32)
    bboxes = np.array([[[10, 10, 50, 50]]], np.float32)  # one patch positive
    env = NeedleEnv(
        images=jnp.asarray(images),
        bboxes=jnp.asarray(bboxes),
        patch_size=64,
        max_ep_len=4,
        n_glimps_levels=1,
        stop_enabled=False,
    )
    patches, targets, valid = env.get_detection_batch(
        jax.random.PRNGKey(0), max_patches=4, sample_neg=1
    )
    valid = np.asarray(valid[0])
    targets = np.asarray(targets[0])
    assert valid.sum() == 2  # 1 positive + 1 negative
    # Exactly one valid patch carries a ground-truth box; the other is empty.
    has_gt = (targets[..., 5] > 0.5).any(axis=-1)
    assert has_gt[valid].sum() == 1
