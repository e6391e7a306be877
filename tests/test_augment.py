"""Photometric augmentation invariants (shape/range/determinism)."""

import numpy as np

import jax
import jax.numpy as jnp


def test_augment_shape_range_determinism():
    from jolineedle_tpu.ops.augment import detection_augment

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((2, 3, 32, 32, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)
    out = jax.jit(detection_augment)(key, images)
    assert out.shape == images.shape
    out = np.asarray(out)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # Same key -> identical result; different key -> different result.
    out2 = np.asarray(jax.jit(detection_augment)(key, images))
    np.testing.assert_array_equal(out, out2)
    out3 = np.asarray(
        jax.jit(detection_augment)(jax.random.PRNGKey(1), images)
    )
    assert np.abs(out - out3).max() > 0


def test_augment_perturbs_but_preserves_signal():
    from jolineedle_tpu.ops.augment import detection_augment

    rng = np.random.default_rng(1)
    base = np.full((1, 48, 48, 3), 0.5, np.float32)
    base[0, 8:24, 8:24] = 1.0  # bright block must stay bright-ish
    out = np.asarray(
        jax.jit(detection_augment)(jax.random.PRNGKey(3), jnp.asarray(base))
    )[0]
    inner = out[10:22, 10:22].mean()
    outer = out[32:46, 32:46].mean()
    assert inner > outer, "augmentation destroyed the object signal"
