"""Model tests: GPT forward/decode parity, YOLOX shapes, SimOTA losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jolineedle_tpu.config import CfgNode
from jolineedle_tpu.env.actions import ActionInfo
from jolineedle_tpu.models import GPT, NeedleYOLOX
from jolineedle_tpu.ops.simota import yolox_losses

PATCH = 64


def tiny_model_config(**overrides):
    cfg = CfgNode(
        model_type="gpt-nano",
        n_layer=3,
        n_head=3,
        n_embd=48,
        block_size=6,
        dropout=0.0,
        patch_size=PATCH,
        n_channels=3,
        image_processor="yolox-nano",
        gpt_backbone=None,
        freeze_image_processor=False,
        detector_conf_threshold=0.5,
        use_pos_emb=True,
        no_patch_emb=False,
        concat_emb=True,
        decoder_pos_encoding=True,
        pos_emb_size=25,
        no_recurrent_embedding=False,
        compute_dtype="float32",
    )
    cfg.merge_from_dict(overrides)
    return cfg


def make_gpt(**overrides):
    cfg = tiny_model_config(**overrides)
    model = GPT.from_config(cfg, [ActionInfo("categorical", 9)])
    B, T = 2, 4
    rng = jax.random.PRNGKey(0)
    patches = jnp.zeros((B, T, PATCH, PATCH, 3))
    actions = jnp.zeros((B, T), jnp.int32)
    classes = jnp.zeros((B,), jnp.int32)
    positions = jnp.zeros((B, T, 2), jnp.int32)
    variables = model.init(rng, patches, actions, classes, positions)
    return model, variables


def test_gpt_forward_shapes():
    model, variables = make_gpt()
    B, T = 2, 4
    patches = jax.random.uniform(jax.random.PRNGKey(1), (B, T, PATCH, PATCH, 3))
    actions = jnp.ones((B, T), jnp.int32)
    classes = jnp.zeros((B,), jnp.int32)
    positions = jnp.ones((B, T, 2), jnp.int32)
    logits, emb = model.apply(variables, patches, actions, classes, positions)
    assert logits.shape == (B, T, 9)
    assert np.isfinite(np.asarray(logits)).all()


def _check_decode_parity(model, variables, patches, rtol, atol):
    B, T = 2, 4
    key = jax.random.PRNGKey(2)
    actions = jax.random.randint(key, (B, T), 0, 9)
    classes = jnp.array([3, 7], jnp.int32)
    positions = jax.random.randint(key, (B, T, 2), 0, 4)

    full_logits, _ = model.apply(variables, patches, actions, classes, positions)

    cache = model.apply(variables, classes, method=GPT.init_cache)
    for t in range(T):
        step_logits, cache = model.apply(
            variables,
            cache,
            None if patches is None else patches[:, t],
            actions[:, t],
            positions[:, t],
            jnp.int32(t),
            method=GPT.decode_step,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits),
            np.asarray(full_logits[:, t]),
            rtol=rtol,
            atol=atol,
        )


def test_gpt_decode_matches_full_forward_exact():
    """KV-cache decode == full forward, tight tolerance (transformer only:
    the conv backbone is excluded because XLA conv numerics differ slightly
    between batch sizes)."""
    model, variables = make_gpt(no_patch_emb=True)
    _check_decode_parity(model, variables, None, rtol=1e-5, atol=1e-5)


def test_gpt_decode_matches_full_forward_with_patches():
    """Full fusion decode parity; loose tolerance for conv reassociation."""
    model, variables = make_gpt()
    B, T = 2, 4
    patches = jax.random.uniform(jax.random.PRNGKey(2), (B, T, PATCH, PATCH, 3))
    _check_decode_parity(model, variables, patches, rtol=1e-2, atol=2e-3)


def test_gpt_mean_fusion_and_no_pos():
    model, variables = make_gpt(concat_emb=False, use_pos_emb=False)
    B, T = 2, 3
    patches = jnp.zeros((B, T, PATCH, PATCH, 3))
    actions = jnp.zeros((B, T), jnp.int32)
    classes = jnp.zeros((B,), jnp.int32)
    logits, _ = model.apply(variables, patches, actions, classes, None)
    assert logits.shape == (B, T, 9)


def test_yolox_shapes():
    model = NeedleYOLOX(variant="yolox-nano", num_classes=1)
    x = jnp.zeros((2, PATCH, PATCH, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    (out, fpn), _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    A = (PATCH // 8) ** 2 + (PATCH // 16) ** 2 + (PATCH // 32) ** 2
    assert out["boxes"].shape == (2, A, 4)
    assert out["obj_logits"].shape == (2, A)
    assert out["cls_logits"].shape == (2, A, 1)
    # FPN top level is stride 32.
    assert fpn[-1].shape[1] == PATCH // 32


def test_yolox_losses_finite_and_sensitive():
    model = NeedleYOLOX(variant="yolox-nano", num_classes=1)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, PATCH, PATCH, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    (out, _), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    # One real box on patch 0, none on patch 1.
    targets = np.zeros((2, 3, 6), np.float32)
    targets[0, 0] = [0, 10, 10, 40, 40, 1]
    losses = yolox_losses(out, jnp.asarray(targets))
    for k in ["total_loss", "iou_loss", "conf_loss", "cls_loss", "l1_loss"]:
        assert np.isfinite(float(losses[k])), k
    assert float(losses["num_fg"]) >= 1

    # Patch validity masking: masking out patch 0 removes all foreground.
    losses_masked = yolox_losses(
        out, jnp.asarray(targets), patch_valid=jnp.array([False, True])
    )
    assert float(losses_masked["num_fg"]) == 1.0  # clamped minimum
    assert float(losses_masked["iou_loss"]) == 0.0


def test_positional_encoding_values():
    from jolineedle_tpu.models import positional_encoding_1d, positional_encoding_2d

    enc = np.asarray(positional_encoding_1d(jnp.array([0, 1]), 8))
    # Position 0: sin=0, cos=1 interleaved.
    np.testing.assert_allclose(enc[0], [0, 1, 0, 1, 0, 1, 0, 1], atol=1e-6)
    assert enc[1, 0] == pytest.approx(np.sin(1.0), abs=1e-6)

    enc2 = np.asarray(positional_encoding_2d(jnp.array([[0, 3]]), 48))
    # First block encodes x=3, second block y=0.
    ch = 24
    assert enc2[0, 0] == pytest.approx(np.sin(3.0), abs=1e-5)
    np.testing.assert_allclose(enc2[0, ch::2], 0.0, atol=1e-6)  # sin(0)
