"""Full-test final validation of a saved run checkpoint.

Rebuilds the run's trainer from its ``config.json``, loads the requested
checkpoint, switches the eval ids to the WHOLE test set and runs one test
cycle — the same thing the trainer does after training (reference:
src/trainer.py:138-165, final validation), but standalone, so a checkpoint
left behind by an interrupted run can be validated after the fact.

Usage:
    python scripts/eval_checkpoint.py <run_dir> [--ckpt best|last]
        [--dataset-dir DIR]

``run_dir`` is the trainer's checkpoint directory (contains config.json +
checkpoint*.msgpack). ``--dataset-dir`` overrides the dataset location when
the run's config points at a moved/ephemeral path.

Writes nothing into ``run_dir`` — metrics print to stdout only.
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
from jolineedle_tpu.models.gpt import GPT
from jolineedle_tpu.parallel.mesh import replicate


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("run_dir", help="run directory with config.json")
    parser.add_argument("--ckpt", choices=["best", "last"], default="best")
    parser.add_argument("--dataset-dir", default=None)
    parser.add_argument(
        "--merge-bboxes", dest="merge_bboxes", default=None,
        action="store_true",
        help="override the run's --merge-bboxes for this validation "
        "(cross-config eval, e.g. to isolate the merge contribution)",
    )
    parser.add_argument(
        "--no-merge-bboxes", dest="merge_bboxes", action="store_false"
    )
    args = parser.parse_args()

    run_dir = pathlib.Path(args.run_dir)
    train_config, model_config = config_from_file(run_dir / "config.json")
    if isinstance(getattr(train_config, "filter_classes", None), list):
        train_config.filter_classes = set(train_config.filter_classes)

    import main as train_main

    # Runs since round 4 record dataset_dir in config.json; --dataset-dir
    # overrides it (moved datasets, older configs).
    dataset_dir = args.dataset_dir or getattr(train_config, "dataset_dir", None)
    if dataset_dir is None:
        raise SystemExit(
            "--dataset-dir is required: this run's config.json predates the "
            "recorded dataset_dir field"
        )
    train_ds, test_ds = train_main.build_both_datasets(
        train_config, model_config, dataset_dir
    )

    model = GPT.from_config(model_config, get_actions_info(train_config))
    if train_config.training_mode == "reinforce":
        from jolineedle_tpu.train.reinforce import ReinforceTrainer as T
    else:
        from jolineedle_tpu.train.supervised import SupervisedTrainer as T
    # Point the trainer's work dir away from the run so save_state/metrics
    # of this validation never clobber the original artifacts.
    train_config.work_dir = "/tmp/eval_checkpoint"
    train_config.env_name = run_dir.name + "_eval"
    if args.merge_bboxes is not None:
        train_config.merge_bboxes = args.merge_bboxes
    trainer = T(train_config, model, None, train_ds, test_ds)

    name = ckpt.CKPT_BEST if args.ckpt == "best" else ckpt.CKPT_LAST
    path = run_dir / name
    print("loading", path)
    trainer.state = ckpt.load_params_only(path, trainer.state)
    trainer.state = replicate(trainer.mesh, trainer.state)

    trainer.test_env_ids = list(range(len(test_ds)))
    trainer.test()
    out = {
        k: float(np.mean(v)) for k, v in trainer.last_test_metrics.items()
    }
    print("FULL-TEST:", json.dumps(out))


if __name__ == "__main__":
    main()
