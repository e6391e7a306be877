"""JoliNeedle-TPU training CLI.

Same surface as the reference train CLI (reference: main.py:24-307): same
flags, same config.json schema, same work-dir layout. The reference's
process-per-GPU ``mp.spawn`` + DDP launch (reference: main.py:428-433,
587-641) collapses into a single-program SPMD run: one process drives a
``jax.sharding.Mesh`` over all requested devices.
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np

# The axon TPU plugin presets jax_platforms at interpreter startup,
# overriding the user's environment; importing the package re-applies
# JAX_PLATFORMS (without stepping on a programmatically pinned platform).
import jolineedle_tpu  # noqa: F401  (honor_env_platforms + compile cache)

# Multi-host (DCN) training: one process per host joins the cluster and the
# data mesh spans all hosts' devices — this one call replaces the reference's
# MASTER_ADDR/port process-group rendezvous (reference: src/trainer.py:61-71).
# On managed clusters (SLURM/MPI/GKE) num_processes/process_id auto-detect;
# plain launchers set JAX_NUM_PROCESSES / JAX_PROCESS_ID explicitly
# (exercised end-to-end by tests/test_dcn_smoke.py).
if os.environ.get("JAX_COORDINATOR_ADDRESS"):
    jax.distributed.initialize(
        num_processes=(
            int(os.environ["JAX_NUM_PROCESSES"])
            if os.environ.get("JAX_NUM_PROCESSES")
            else None
        ),
        process_id=(
            int(os.environ["JAX_PROCESS_ID"])
            if os.environ.get("JAX_PROCESS_ID")
            else None
        ),
    )

from jolineedle_tpu.config import args_to_config, get_args, save_config
from jolineedle_tpu.data.dataset import build_datasets
from jolineedle_tpu.env import get_actions_info
from jolineedle_tpu.models.gpt import GPT
from jolineedle_tpu.observe.logger import Logger


def build_both_datasets(train_config, model_config, dataset_dir):
    return build_datasets(
        dataset_dir,
        min_keypoints=train_config.min_keypoints,
        max_keypoints=train_config.max_keypoints,
        patch_size=model_config.patch_size,
        max_ep_len=model_config.block_size,
        rotations=train_config.rotations,
        translations=train_config.translations,
        test_size=train_config.test_size,
        test_pattern=train_config.test_pattern,
        seed=train_config.seed,
        train_size=train_config.train_size,
        binomial_keypoints=train_config.binomial_keypoints,
        minimum_image_size=train_config.minimum_image_size,
        filter_classes=train_config.filter_classes,
    )


def launch_training(train_config, model_config, dataset_dir):
    """Single-process SPMD training launch (replaces the reference's
    per-rank ``launch_ddp_training``, main.py:587-641)."""
    train_dataset, test_dataset = build_both_datasets(
        train_config, model_config, dataset_dir
    )

    actions_info = get_actions_info(train_config)
    model = GPT.from_config(model_config, actions_info)
    logger = Logger(train_config, model_config)

    if train_config.training_mode == "reinforce":
        from jolineedle_tpu.train.reinforce import ReinforceTrainer

        trainer = ReinforceTrainer(
            train_config, model, logger, train_dataset, test_dataset
        )
    elif train_config.training_mode == "supervised":
        from jolineedle_tpu.train.supervised import SupervisedTrainer

        trainer = SupervisedTrainer(
            train_config, model, logger, train_dataset, test_dataset
        )
    else:
        raise ValueError(f"Unknown training mode: {train_config.training_mode}")

    if train_config.init_from is not None:
        if train_config.resume_training is not None:
            raise ValueError(
                "--init-from (params-only warm start) and --resume-training"
                " (full-state restore) are mutually exclusive"
            )
        trainer.load_params_checkpoint(train_config.init_from)

    if train_config.resume_training is not None:
        print("Resuming from", train_config.resume_training)
        trainer.load_checkpoint(train_config.resume_training)
        # Restore the dashboard history too (reference: main.py:556-560).
        visdom_pkl = os.path.join(train_config.resume_training, "visdom.pkl")
        if logger is not None and os.path.isfile(visdom_pkl):
            from jolineedle_tpu.observe.visualizer import VisdomPlotter

            logger.visdom = VisdomPlotter.load(
                visdom_pkl, env_name=train_config.env_name
            )

    if train_config.detection_checkpoint is not None:
        print("Load detection checkpoint from", train_config.detection_checkpoint)
        trainer.load_detection_checkpoint(train_config.detection_checkpoint)

    if train_config.measure_flops:
        from jolineedle_tpu.utils.flops import measure_flops

        measure_flops(trainer, model_config, train_config)
        return trainer

    trainer.run(0, train_config.world_size, train_config.port_ddp)
    return trainer


def main(args):
    train_config, model_config = args_to_config(args)
    random.seed(train_config.seed)
    np.random.seed(train_config.seed)

    if args.group != "":
        train_config.env_name = f"{args.group}_{train_config.env_name}"
    print(
        f"training env_name = {train_config.env_name}",
        f"\nUsing positional encoding = {model_config.use_pos_emb}",
        f"\nConcatenating embeddings = {model_config.concat_emb}",
    )
    save_config(model_config, train_config)
    return launch_training(train_config, model_config, args.dataset_dir)


if __name__ == "__main__":
    main(get_args())
