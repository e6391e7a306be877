"""Task-ceiling measurement: oracle-driven single-start eval (VERDICT r4
task 3).

Replays ORACLE actions (the same greedy keypoint teacher the supervised
trainer imitates, reference: src/env/simple_env.py:481-588 via
supervised.py:301-309) through the EXACT model eval pipeline — same
episode length, same start distribution, same batched detection, same
per-patch mAP with missed-patch false negatives — using a trained run's
detector. The result is the maximum single-start trajectory mAP /
patches-found achievable on the dataset at that episode budget, i.e. the
task ceiling the policy's single-start numbers should be quoted against
(PARITY.md previously compared against the teacher-forced detector
ceiling, which ignores the navigation budget entirely).

Usage:
    python scripts/eval_oracle_ceiling.py <run_dir> [--ckpt best|last]
        [--dataset-dir DIR]

Writes nothing into ``run_dir``.
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jolineedle_tpu  # noqa: F401  (JAX_PLATFORMS + compile cache)
from jolineedle_tpu import checkpoint as ckpt
from jolineedle_tpu.config import config_from_file
from jolineedle_tpu.env import get_actions_info
from jolineedle_tpu.env.oracle import OracleEnv
from jolineedle_tpu.models.gpt import GPT
from jolineedle_tpu.parallel.mesh import replicate


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("run_dir", help="run directory with config.json")
    parser.add_argument("--ckpt", choices=["best", "last"], default="best")
    parser.add_argument("--dataset-dir", default=None)
    args = parser.parse_args()

    run_dir = pathlib.Path(args.run_dir)
    train_config, model_config = config_from_file(run_dir / "config.json")
    if isinstance(getattr(train_config, "filter_classes", None), list):
        train_config.filter_classes = set(train_config.filter_classes)

    import main as train_main

    dataset_dir = args.dataset_dir or getattr(train_config, "dataset_dir", None)
    if dataset_dir is None:
        raise SystemExit("--dataset-dir required (config predates the field)")
    train_ds, test_ds = train_main.build_both_datasets(
        train_config, model_config, dataset_dir
    )

    model = GPT.from_config(model_config, get_actions_info(train_config))
    from jolineedle_tpu.train.supervised import SupervisedTrainer

    train_config.work_dir = "/tmp/eval_oracle_ceiling"
    train_config.env_name = run_dir.name + "_oracle"
    trainer = SupervisedTrainer(train_config, model, None, train_ds, test_ds)

    name = ckpt.CKPT_BEST if args.ckpt == "best" else ckpt.CKPT_LAST
    trainer.state = ckpt.load_params_only(run_dir / name, trainer.state)
    trainer.state = replicate(trainer.mesh, trainer.state)

    cfg = trainer.config
    T = cfg.test_max_seq_len
    n_actions = get_actions_info(train_config)[0].nclasses

    # Mirror eval_envs' episode construction exactly (seed = loop_id, the
    # "rollouts"-mode single start = the env's own seeded start position),
    # but take every action from the oracle instead of the model.
    episodes = []
    for loop_id in range(len(test_ds)):
        seed = loop_id
        item = test_ds.__getitem__(loop_id, np.random.default_rng(seed))
        boxes = np.asarray(item["bboxes"], np.float64).reshape(-1, 4)
        env = OracleEnv(
            item["image"].shape[:2], cfg.patch_size, boxes,
            np.random.default_rng(seed),
        )
        # Start = the multistart eval's FIRST random start (reset(None)
        # with the same seeded rng) — the distribution behind the quoted
        # single-start mAP (eval_envs' n_starts=1 suffix "").
        env.reset(None)
        start = env.position
        acts = []
        for _ in range(T - 1):
            a = SupervisedTrainer.optimal_next_action(env)
            acts.append(a.value)
            env.step(a)

        fake_rollout = {
            "actions": np.array(acts, np.int32)[None],
            "logits": np.zeros((1, T - 1, n_actions), np.float32),
            "logit_masks": np.ones((1, T - 1), np.float32),
        }
        env.reset(start)
        rep = trainer._replay_episode(item, env, fake_rollout, T)
        episodes.append((env, rep))

    dets = trainer._batched_patch_detections(
        [rep["det_request"] for _, rep in episodes]
    )

    maps, props, stopped, ep_len = [], [], [], []
    for (env, rep), det in zip(episodes, dets):
        sample, metrics, bboxes = trainer._finish_episode(rep, det)
        m = trainer._per_patch_map(env, [sample], [bboxes])
        maps.append(m["map"])
        props.append(metrics["prop_patches_found"])
        stopped.append(metrics["stopped_inside_bbox"])
        ep_len.append(metrics["episode_length"])

    print("ORACLE-CEILING:", json.dumps({
        "n_images": len(episodes),
        "ep_len": float(np.mean(ep_len)),
        "map": float(np.mean(maps)),
        "prop_patches_found": float(np.mean(props)),
        "stopped_inside_bbox": float(np.mean(stopped)),
        "dataset_dir": str(dataset_dir),
        "ckpt": args.ckpt,
    }))


if __name__ == "__main__":
    main()
