"""Device-resident image pool: HBM pixels + in-jit patch gather.

Pins that the pool path is a pure transport change: gathered patches are
bit-identical to the host gather (train/batching.py), eligibility gating
follows the flag/augs/budget rules, and a pool-fed train step produces
exactly the same update as a pixel-fed one.
"""

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    from jolineedle_tpu.data.toy import generate_toy_dataset

    return generate_toy_dataset(
        tmp_path_factory.mktemp("toypool"),
        n_train=6,
        n_test=2,
        image_size=(192, 256),
        seed=3,
    )


@pytest.fixture(scope="module")
def dataset(toy):
    import main
    from jolineedle_tpu.config import get_args, args_to_config

    args = get_args(
        [
            "--dataset-dir", str(toy),
            "--training-mode", "supervised",
            "--work-dir", "/tmp/unused",
            "--max-iters", "1",
            "--model-type", "gpt-nano",
            "--image-processor", "yolox-nano",
            "--max-seq-len", "4",
            "--batch-size", "2",
            "--patch-size", "64",
            "--minimum-image-size", "0",
            "--devices", "0",
            "--max-det-patches", "4",
            "--max-boxes", "4",
            "--compute-dtype", "float32",
        ]
    )  # fmt: skip
    train_config, model_config = args_to_config(args)
    train_ds, _ = main.build_both_datasets(
        train_config, model_config, args.dataset_dir
    )
    return train_ds, train_config


def test_pool_gather_matches_host_gather(dataset):
    from jolineedle_tpu.data.device_pool import (
        DeviceImagePool,
        gather_pool_patches,
    )
    from jolineedle_tpu.parallel.mesh import make_mesh
    from jolineedle_tpu.train.batching import build_supervised_batch

    ds, cfg = dataset
    mesh = make_mesh([0])
    pool = DeviceImagePool.build(ds, mesh)
    assert pool.images.dtype == np.uint8
    assert pool.images.shape[0] == len(ds)

    indices = [0, 3, 5, 1]
    with_px = build_supervised_batch(
        ds, indices, cfg, np.random.default_rng(11), with_pixels=True
    )
    no_px = build_supervised_batch(
        ds, indices, cfg, np.random.default_rng(11), with_pixels=False
    )
    assert "patches" not in no_px and "patches_yolox" not in no_px
    np.testing.assert_array_equal(no_px["image_idx"], np.asarray(indices))
    # Identical rng stream -> identical episodes either way.
    np.testing.assert_array_equal(no_px["positions"], with_px["positions"])

    gathered = jax.jit(
        lambda pool_images, idx, pos: gather_pool_patches(
            pool_images, idx, pos, cfg.patch_size
        )
    )(pool.images, no_px["image_idx"], no_px["positions"])
    np.testing.assert_array_equal(np.asarray(gathered), with_px["patches"])

    det = jax.device_get(
        gather_pool_patches(
            pool.images,
            jax.numpy.asarray(no_px["image_idx"]),
            jax.numpy.asarray(no_px["yolox_positions"]),
            cfg.patch_size,
        )
    )
    det = det * no_px["yolox_valid"][:, :, None, None, None].astype(det.dtype)
    np.testing.assert_array_equal(det, with_px["patches_yolox"])


def test_pool_train_step_equals_streaming_step(dataset):
    """Same seed, same data: one pool-fed update == one pixel-fed update."""
    from jolineedle_tpu.data.device_pool import DeviceImagePool
    from jolineedle_tpu.parallel.mesh import shard_batch
    from jolineedle_tpu.train.batching import build_supervised_batch
    from jolineedle_tpu.train.supervised import SupervisedTrainer
    from jolineedle_tpu.models.gpt import GPT
    from jolineedle_tpu.env import get_actions_info

    ds, cfg = dataset
    model_config = main_model_config(cfg)
    model = GPT.from_config(model_config, get_actions_info(cfg))
    trainer = SupervisedTrainer(cfg, model, None, ds, ds)
    pool = DeviceImagePool.build(ds, trainer.mesh)

    key = jax.random.PRNGKey(5)
    with_px = shard_batch(
        trainer.mesh,
        build_supervised_batch(
            ds, [0, 2], cfg, np.random.default_rng(4), with_pixels=True
        ),
    )
    no_px = shard_batch(
        trainer.mesh,
        build_supervised_batch(
            ds, [0, 2], cfg, np.random.default_rng(4), with_pixels=False
        ),
    )
    state_a, metrics_a = trainer._train_step(trainer.state, with_px, key)
    trainer2 = SupervisedTrainer(cfg, model, None, ds, ds)
    state_b, metrics_b = trainer2._train_step(
        trainer2.state, no_px, key, pool.images
    )
    np.testing.assert_allclose(
        float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-6
    )
    for got, want in zip(
        jax.tree_util.tree_leaves(jax.device_get(state_b.params)),
        jax.tree_util.tree_leaves(jax.device_get(state_a.params)),
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7
        )


@pytest.mark.parametrize(
    "rotations,translations",
    [(True, False), (False, True), (True, True)],
    ids=["rotate", "translate", "both"],
)
def test_device_aug_gather_matches_host(dataset, rotations, translations):
    """Geometric augs replayed on device == host-transformed pixel gather.

    Same rng stream: the host path decodes + rotates/translates pixels then
    gathers patches; the pool path ships only (aug_rot, aug_shift) and the
    jitted step rebuilds the canvases (data/device_pool.py::aug_canvases).
    Patches must be bit-identical."""
    import copy

    import jax.numpy as jnp

    from jolineedle_tpu.data.device_pool import (
        DeviceImagePool,
        aug_canvases,
        gather_canvas_patches,
    )
    from jolineedle_tpu.parallel.mesh import make_mesh
    from jolineedle_tpu.train.batching import build_supervised_batch

    ds, cfg = dataset
    ds = copy.copy(ds)
    ds.rotations, ds.translations = rotations, translations
    mesh = make_mesh([0])
    pool = DeviceImagePool.build(ds, mesh)  # stores UN-augmented pixels

    indices = [0, 3, 5, 1, 2, 4]
    with_px = build_supervised_batch(
        ds, indices, cfg, np.random.default_rng(23), with_pixels=True
    )
    no_px = build_supervised_batch(
        ds, indices, cfg, np.random.default_rng(23), with_pixels=False
    )
    # Identical rng stream -> identical episodes either way (get_geometry
    # consumes the same draws as __getitem__).
    np.testing.assert_array_equal(no_px["positions"], with_px["positions"])
    np.testing.assert_array_equal(
        no_px["reference_actions"], with_px["reference_actions"]
    )
    assert ("aug_rot" in no_px) == rotations
    assert ("aug_shift" in no_px) == translations

    canvases = jax.jit(
        lambda pi, idx, rot, sft, hw: aug_canvases(pi, idx, rot, sft, hw)
    )(
        pool.images,
        jnp.asarray(no_px["image_idx"]),
        jnp.asarray(no_px["aug_rot"]) if rotations else None,
        jnp.asarray(no_px["aug_shift"]) if translations else None,
        jnp.asarray(no_px["base_hw"]),
    )
    got = jax.device_get(
        gather_canvas_patches(
            canvases, jnp.asarray(no_px["positions"]), cfg.patch_size
        )
    )
    np.testing.assert_array_equal(got, with_px["patches"])

    det = jax.device_get(
        gather_canvas_patches(
            canvases, jnp.asarray(no_px["yolox_positions"]), cfg.patch_size
        )
    )
    det = det * no_px["yolox_valid"][:, :, None, None, None].astype(det.dtype)
    np.testing.assert_array_equal(det, with_px["patches_yolox"])


def test_device_aug_rl_batch_matches_host(dataset):
    """RL pool batches: get_geometry boxes == __getitem__ boxes under augs,
    and the canvas at the fixed training shape == the host-padded image."""
    import copy

    import jax.numpy as jnp

    from jolineedle_tpu.data.device_pool import (
        DeviceImagePool,
        aug_canvases,
    )
    from jolineedle_tpu.models.gpt import GPT
    from jolineedle_tpu.env import get_actions_info
    from jolineedle_tpu.train.reinforce import ReinforceTrainer

    ds, sup_cfg = dataset
    cfg = copy.deepcopy(sup_cfg)
    cfg.training_mode = "reinforce"
    ds = copy.copy(ds)
    ds.rotations = ds.translations = True
    model_config = main_model_config(cfg)
    model = GPT.from_config(model_config, get_actions_info(cfg))
    trainer = ReinforceTrainer(cfg, model, None, ds, ds)
    pool = DeviceImagePool.build(ds, trainer.mesh)

    with_px = trainer._build_env_batch([1, 4, 0], seed=7, with_pixels=True)
    no_px = trainer._build_env_batch([1, 4, 0], seed=7, with_pixels=False)
    np.testing.assert_array_equal(no_px["bboxes"], with_px["bboxes"])

    canvases = jax.device_get(
        aug_canvases(
            pool.images,
            jnp.asarray(no_px["image_idx"]),
            jnp.asarray(no_px["aug_rot"]),
            jnp.asarray(no_px["aug_shift"]),
            jnp.asarray(no_px["base_hw"]),
            out_hw=tuple(trainer.fixed_shape),
        )
    )
    np.testing.assert_array_equal(canvases, with_px["image"])


def main_model_config(train_config):
    """Tiny gpt-nano model config consistent with the dataset fixture."""
    from jolineedle_tpu.config import get_args, args_to_config

    args = get_args(
        [
            "--dataset-dir", "/tmp/unused",
            "--training-mode", "supervised",
            "--work-dir", "/tmp/unused",
            "--max-iters", "1",
            "--model-type", "gpt-nano",
            "--image-processor", "yolox-nano",
            "--max-seq-len", "4",
            "--batch-size", "2",
            "--patch-size", "64",
            "--minimum-image-size", "0",
            "--devices", "0",
            "--max-det-patches", "4",
            "--max-boxes", "4",
            "--compute-dtype", "float32",
        ]
    )  # fmt: skip
    _, model_config = args_to_config(args)
    return model_config


def test_pool_rl_step_equals_streaming_step(dataset):
    """REINFORCE: pool-materialized images produce the identical update."""
    from jolineedle_tpu.data.device_pool import DeviceImagePool
    from jolineedle_tpu.parallel.mesh import shard_batch
    from jolineedle_tpu.train.reinforce import ReinforceTrainer
    from jolineedle_tpu.models.gpt import GPT
    from jolineedle_tpu.env import get_actions_info

    import copy

    ds, sup_cfg = dataset
    cfg = copy.deepcopy(sup_cfg)
    cfg.training_mode = "reinforce"
    model_config = main_model_config(cfg)
    model = GPT.from_config(model_config, get_actions_info(cfg))
    trainer = ReinforceTrainer(cfg, model, None, ds, ds)
    pool = DeviceImagePool.build(ds, trainer.mesh)

    import jax.numpy as jnp

    key = jax.random.PRNGKey(9)
    with_px = shard_batch(
        trainer.mesh, trainer._build_env_batch([1, 4], seed=2, with_pixels=True)
    )
    no_px = shard_batch(
        trainer.mesh,
        trainer._build_env_batch([1, 4], seed=2, with_pixels=False),
    )
    _, metrics_a = trainer._train_step(
        trainer.state, with_px, key, jnp.float32(0.0), jnp.float32(1.0)
    )
    trainer2 = ReinforceTrainer(cfg, model, None, ds, ds)
    _, metrics_b = trainer2._train_step(
        trainer2.state, no_px, key, jnp.float32(0.0), jnp.float32(1.0),
        pool.images,
    )
    np.testing.assert_allclose(
        float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(metrics_a["returns"]), float(metrics_b["returns"]), rtol=1e-6
    )


def test_eligibility_gating(dataset, monkeypatch):
    from jolineedle_tpu.data import device_pool as dp

    ds, _ = dataset
    assert dp.DeviceImagePool.eligible(ds, "auto")
    assert not dp.DeviceImagePool.eligible(ds, "off")
    assert dp.DeviceImagePool.eligible(ds, "on")

    # Over-budget datasets stream instead (auto) — 0 MB budget forces it.
    monkeypatch.setenv("JOLINEEDLE_POOL_BUDGET_MB", "0")
    assert not dp.DeviceImagePool.eligible(ds, "auto")
    monkeypatch.delenv("JOLINEEDLE_POOL_BUDGET_MB")

    # Geometric augs no longer disqualify: they replay on device
    # (aug_canvases); the pool stores un-augmented pixels.
    ds.rotations = True
    try:
        assert dp.DeviceImagePool.eligible(ds, "auto")
        assert dp.DeviceImagePool.eligible(ds, "on")
    finally:
        ds.rotations = False
