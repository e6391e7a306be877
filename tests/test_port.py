"""Weight-porter consistency tests.

The upstream yolox pip package is not installable here, so these tests build
a synthetic upstream-format state_dict (keys from the documented Megvii
module structure, shapes derived by inverse-transforming our Flax tree) and
check that the porter consumes every key, preserves values, and fails loudly
on shape mismatches."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _build_model(variant):
    from jolineedle_tpu.models.yolox import NeedleYOLOX

    model = NeedleYOLOX(variant=variant, num_classes=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, variables


def _get_path(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _inverse_transform(value, how):
    if how == "conv":
        return np.asarray(value).transpose(3, 2, 0, 1)  # HWIO -> OIHW
    return np.asarray(value)


def _fake_state_dict(variables, variant, rng):
    """Upstream-format dict with the right keys/shapes and random values."""
    from jolineedle_tpu.models.port import yolox_key_map

    trees = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }
    state_dict = {}
    for tkey, coll, fpath, tf in yolox_key_map(variant):
        template = _inverse_transform(_get_path(trees[coll], fpath), tf)
        state_dict[tkey] = rng.normal(size=template.shape).astype(np.float32)
    return state_dict


@pytest.mark.parametrize("variant", ["yolox-s", "yolox-nano"])
def test_port_roundtrip(variant):
    from jolineedle_tpu.models.port import port_yolox_state_dict, yolox_key_map

    _, variables = _build_model(variant)
    rng = np.random.default_rng(0)
    state_dict = _fake_state_dict(variables, variant, rng)

    params, batch_stats, skipped = port_yolox_state_dict(
        state_dict,
        variables["params"],
        variables.get("batch_stats", {}),
        variant,
    )
    assert skipped == []

    # Every mapped value landed, correctly transformed.
    trees = {"params": params, "batch_stats": batch_stats}
    for tkey, coll, fpath, tf in yolox_key_map(variant):
        expected = state_dict[tkey]
        got = _inverse_transform(_get_path(trees[coll], fpath), tf)
        np.testing.assert_array_equal(got, expected)

    # The mapping covers the entire flax conv/bn tree (no silent misses):
    # count leaves that should be ported = all kernels + bn stats.
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    n_kernels = sum(
        1 for path, _ in flat if path[-1].key in ("kernel", "scale", "bias")
    )
    n_mapped_params = sum(
        1 for _, coll, _, _ in yolox_key_map(variant) if coll == "params"
    )
    assert n_mapped_params == n_kernels


def test_port_shape_mismatch_raises():
    from jolineedle_tpu.models.port import port_yolox_state_dict

    _, variables = _build_model("yolox-nano")
    rng = np.random.default_rng(0)
    state_dict = _fake_state_dict(variables, "yolox-nano", rng)
    key = next(iter(state_dict))
    state_dict[key] = np.zeros((1, 2, 3, 4), np.float32)
    with pytest.raises(ValueError):
        port_yolox_state_dict(
            state_dict,
            variables["params"],
            variables.get("batch_stats", {}),
            "yolox-nano",
        )


def test_port_skips_coco_class_head():
    """An 80-class COCO head must be skipped when porting to 1 class."""
    from jolineedle_tpu.models.port import port_yolox_state_dict

    _, variables = _build_model("yolox-nano")
    rng = np.random.default_rng(0)
    state_dict = _fake_state_dict(variables, "yolox-nano", rng)
    for level in range(3):
        state_dict[f"head.cls_preds.{level}.weight"] = rng.normal(
            size=(80,) + state_dict[f"head.cls_preds.{level}.weight"].shape[1:]
        ).astype(np.float32)
        state_dict[f"head.cls_preds.{level}.bias"] = rng.normal(size=(80,)).astype(
            np.float32
        )
    params, _, skipped = port_yolox_state_dict(
        state_dict,
        variables["params"],
        variables.get("batch_stats", {}),
        "yolox-nano",
        num_classes=1,
    )
    assert len(skipped) == 6
