"""--steps-per-dispatch: N scanned iterations == N single dispatches.

The multi-step path exists purely to amortize per-dispatch RPC latency
(supervised.py::_build_multi_train_step, reinforce.py counterpart); these
tests pin that it is semantically invisible: same batches + same rng keys
produce the same final state and metrics as N sequential single steps,
for both trainers.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import main
    from jolineedle_tpu.config import get_args, args_to_config
    from jolineedle_tpu.data.toy import generate_toy_dataset

    toy = generate_toy_dataset(
        tmp_path_factory.mktemp("toyms"),
        n_train=6,
        n_test=2,
        image_size=(192, 256),
        seed=5,
    )
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
    ds, _ = main.build_both_datasets(
        train_config, model_config, args.dataset_dir
    )
    return ds, train_config, model_config


def _model(train_config, model_config):
    from jolineedle_tpu.env import get_actions_info
    from jolineedle_tpu.models.gpt import GPT

    return GPT.from_config(model_config, get_actions_info(train_config))


def test_supervised_multistep_equals_sequential(setup):
    from jolineedle_tpu.parallel.mesh import shard_batch
    from jolineedle_tpu.train.batching import build_supervised_batch
    from jolineedle_tpu.train.supervised import SupervisedTrainer

    ds, cfg, mcfg = setup
    model = _model(cfg, mcfg)
    K = 3
    batches = [
        build_supervised_batch(ds, [k % len(ds), (k + 2) % len(ds)], cfg,
                               np.random.default_rng(100 + k))
        for k in range(K)
    ]
    keys = jax.random.split(jax.random.PRNGKey(0), K)

    seq = SupervisedTrainer(cfg, model, None, ds, ds)
    for k in range(K):
        b = shard_batch(seq.mesh, batches[k])
        state, metrics_seq = seq._train_step(seq.state, b, keys[k])
        seq.state = state

    multi = SupervisedTrainer(cfg, model, None, ds, ds)
    stacked = shard_batch(
        multi.mesh,
        {k: np.stack([b[k] for b in batches]) for k in batches[0]},
        batch_axis=1,
    )
    fn = multi._build_multi_train_step()
    state_m, metrics_m = fn(multi.state, stacked, keys)

    np.testing.assert_allclose(
        float(metrics_m["loss"]), float(metrics_seq["loss"]), rtol=1e-4
    )
    for got, want in zip(
        jax.tree_util.tree_leaves(jax.device_get(state_m.params)),
        jax.tree_util.tree_leaves(jax.device_get(seq.state.params)),
    ):
        # The scan body and the standalone step are separate XLA programs
        # with different fusion orders; last-ulp gradient differences are
        # amplified by Adam's per-element normalization, so allow small
        # per-element drift after several steps (observed max 1.4e-4 rel).
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-4
        )
    assert int(state_m.step) == K


def test_reinforce_multistep_equals_sequential(setup):
    from jolineedle_tpu.parallel.mesh import shard_batch
    from jolineedle_tpu.train.reinforce import ReinforceTrainer

    ds, sup_cfg, mcfg = setup
    cfg = copy.deepcopy(sup_cfg)
    cfg.training_mode = "reinforce"
    model = _model(cfg, mcfg)
    K = 2
    keys = jax.random.split(jax.random.PRNGKey(7), K)

    seq = ReinforceTrainer(cfg, model, None, ds, ds)
    raw = [seq._build_env_batch([k, k + 3], seed=k) for k in range(K)]
    window_seq = {"ret_sum": 0.0, "ret_sumsq": 0.0, "ret_count": 0.0}
    for k in range(K):
        b = shard_batch(seq.mesh, raw[k])
        state, metrics_seq = seq._train_step(
            seq.state, b, keys[k], jnp.float32(0.0), jnp.float32(1.0)
        )
        seq.state = state
        for name in window_seq:
            window_seq[name] += float(metrics_seq[name])

    multi = ReinforceTrainer(cfg, model, None, ds, ds)
    stacked = shard_batch(
        multi.mesh,
        {k: np.stack([b[k] for b in raw]) for k in raw[0]},
        batch_axis=1,
    )
    fn = multi._build_multi_train_step()
    state_m, metrics_m, window_m = fn(
        multi.state, stacked, keys, jnp.float32(0.0), jnp.float32(1.0)
    )

    np.testing.assert_allclose(
        float(metrics_m["loss"]), float(metrics_seq["loss"]), rtol=1e-4
    )
    for name in window_seq:
        np.testing.assert_allclose(
            float(window_m[name]), window_seq[name], rtol=1e-4
        )
    for got, want in zip(
        jax.tree_util.tree_leaves(jax.device_get(state_m.params)),
        jax.tree_util.tree_leaves(jax.device_get(seq.state.params)),
    ):
        # The scan body and the standalone step are separate XLA programs
        # with different fusion orders; last-ulp gradient differences are
        # amplified by Adam's per-element normalization, so allow small
        # per-element drift after several steps (observed max 1.4e-4 rel).
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-4
        )


def test_spd_must_divide_test_every(setup):
    from jolineedle_tpu.train.supervised import SupervisedTrainer

    ds, sup_cfg, mcfg = setup
    cfg = copy.deepcopy(sup_cfg)
    cfg.steps_per_dispatch = 3
    cfg.test_every = 4
    cfg.max_iters = 2
    model = _model(cfg, mcfg)
    trainer = SupervisedTrainer(cfg, model, None, ds, ds)
    with pytest.raises(ValueError, match="steps-per-dispatch"):
        trainer.run()
