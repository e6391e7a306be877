"""Supervised (imitation-learning) trainer.

TPU redesign of the reference SupervisedTrainer (reference:
src/supervised.py:41-911):

  - Trajectory labels come from the numpy oracle in the input pipeline
    (train/batching.py), prefetched on a background thread; the train step
    itself — photometric augmentation, GPT forward, weighted action CE,
    YOLOX SimOTA loss, two-partition AdamW with grad accumulation — is ONE
    jitted function, sharded over the data mesh (grad all-reduce via GSPMD
    instead of DDP, reference: src/supervised.py:815,899).
  - Autoregressive eval runs the KV-cache decode path; the per-step optimal
    action is derived directly from the greedy keypoint ordering instead of
    simulating a full oracle episode per step (same value, reference:
    src/supervised.py:301-309,340-348).
"""

from __future__ import annotations

import copy
from collections import defaultdict
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.device_pool import (
    DeviceImagePool,
    aug_canvases,
    gather_canvas_patches,
    gather_pool_patches,
)
from ..env import Action
from ..env.batched_env import NeedleEnv
from ..env.oracle import OracleEnv, gather_patches, move_towards
from ..models.gpt import GPT
from ..ops.augment import detection_augment, to_unit_float
from ..ops.nms import sigmoid_np, nms_numpy, postprocess
from ..ops.simota import yolox_losses
from ..parallel.mesh import shard_batch
from ..utils.geometry import (
    BBox,
    Position,
    parse_bbox_predictions,
    parse_bbox_targets,
)
from ..utils.metrics import average_precision_50
from ..utils.plotting import plot_model_prediction
from .batching import Prefetcher, build_supervised_batch
from .trainer import Trainer, TrainState


def action_ce_metrics(logits, targets, masks, class_weight):
    """Weighted CE + accuracy over non-padding tokens (reference:
    src/supervised.py:138-198)."""
    n_act = logits.shape[-1]
    logits = logits.reshape(-1, n_act)
    targets = targets.reshape(-1)
    mask = masks.reshape(-1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=1)[:, 0]
    nll = nll * class_weight[targets]
    denom = jnp.maximum(mask.sum(), 1.0)
    action_loss = (nll * mask).sum() / denom
    accuracy = ((logits.argmax(-1) == targets) * mask).sum() / denom
    return action_loss, accuracy


def action_ce_metrics_np(logits, targets, masks, class_weight):
    """Numpy twin of :func:`action_ce_metrics` for host-side eval metric
    assembly (a jnp call here would issue per-episode eager RPCs on a
    tunneled runtime)."""
    logits = np.asarray(logits, np.float32).reshape(-1, logits.shape[-1])
    targets = np.asarray(targets).reshape(-1)
    mask = np.asarray(masks, np.float32).reshape(-1)
    shifted = logits - logits.max(axis=1, keepdims=True)
    logp = shifted - np.log(np.exp(shifted).sum(axis=1, keepdims=True))
    nll = -logp[np.arange(len(targets)), targets]
    nll = nll * np.asarray(class_weight)[targets]
    denom = max(mask.sum(), 1.0)
    action_loss = float((nll * mask).sum() / denom)
    accuracy = float(((logits.argmax(-1) == targets) * mask).sum() / denom)
    return action_loss, accuracy


class SupervisedTrainer(Trainer):
    best_metric_name = "map"

    def __init__(self, config, model, logger, train_dataset, test_dataset, rank=0):
        super().__init__(config, model, logger, train_dataset, test_dataset, rank)
        n_act = self.actions_info[0].nclasses
        weight = np.ones((n_act,), np.float32)
        if config.stop_enabled:
            weight[Action.STOP.value] = config.stop_weight
        self.class_weight = jnp.asarray(weight)
        self.class_weight_np = weight  # host copy for eval-side metrics
        self._train_step = self._build_train_step()

    # --- jitted train step ----------------------------------------------------
    def _build_train_step(self):
        model, tx = self.model, self.tx
        cfg = self.config
        class_weight = self.class_weight
        detection = cfg.detection_enabled

        def loss_fn(params, batch_stats, batch, rng, pool_images):
            k_aug1, k_aug2, k_drop = jax.random.split(rng, 3)
            canvases = None
            if "patches" in batch:
                raw_patches = batch["patches"]
            elif "aug_rot" in batch or "aug_shift" in batch:
                # Device-pool path WITH geometric augs: replay the host's
                # sampled rotate/translate on fixed-shape canvases, then
                # gather patches from them (data/device_pool.py).
                canvases = aug_canvases(
                    pool_images,
                    batch["image_idx"],
                    batch.get("aug_rot"),
                    batch.get("aug_shift"),
                    batch.get("base_hw"),
                )
                raw_patches = gather_canvas_patches(
                    canvases, batch["positions"], cfg.patch_size
                )
            else:
                # Device-pool path: pixels never left HBM; gather them here
                # from the episode's patch coords (data/device_pool.py).
                raw_patches = gather_pool_patches(
                    pool_images,
                    batch["image_idx"],
                    batch["positions"],
                    cfg.patch_size,
                )
            patches = detection_augment(k_aug1, to_unit_float(raw_patches))

            variables = {"params": params, "batch_stats": batch_stats}
            (logits, _), mut = model.apply(
                variables,
                patches,
                batch["current_actions"],
                batch["class_id"],
                batch["positions"],
                train=True,
                rngs={"dropout": k_drop},
                mutable=["batch_stats"],
            )
            action_loss, accuracy = action_ce_metrics(
                logits, batch["reference_actions"], batch["masks"], class_weight
            )
            loss = action_loss
            metrics = {
                "action_loss": action_loss,
                "action_accuracy": accuracy,
                "episode_length": batch["masks"].sum(axis=1).mean(),
            }

            stats = mut["batch_stats"]
            if detection:
                if "patches_yolox" in batch:
                    raw_det = batch["patches_yolox"]
                else:
                    if canvases is not None:
                        raw_det = gather_canvas_patches(
                            canvases, batch["yolox_positions"], cfg.patch_size
                        )
                    else:
                        raw_det = gather_pool_patches(
                            pool_images,
                            batch["image_idx"],
                            batch["yolox_positions"],
                            cfg.patch_size,
                        )
                    # Host path zeroes the padding patches at gather time.
                    raw_det = raw_det * batch["yolox_valid"][
                        :, :, None, None, None
                    ].astype(raw_det.dtype)
                det = detection_augment(k_aug2, to_unit_float(raw_det))
                B, K = det.shape[:2]
                flat = det.reshape((B * K,) + det.shape[2:])
                (head_out, _), mut2 = model.apply(
                    {"params": params, "batch_stats": stats},
                    flat,
                    True,
                    method=GPT.yolox_outputs,
                    mutable=["batch_stats"],
                )
                targets = batch["bboxes_yolox"].reshape(
                    (B * K,) + batch["bboxes_yolox"].shape[2:]
                )
                valid = batch["yolox_valid"].reshape(-1)
                ylo = yolox_losses(head_out, targets, valid)
                loss = loss + ylo["total_loss"]
                stats = mut2["batch_stats"]
                for name, value in ylo.items():
                    metrics[f"yolo_{name}"] = value
                metrics["yolo_loss"] = ylo["total_loss"]

            metrics["loss"] = loss
            return loss, (metrics, stats)

        def train_step(state: TrainState, batch, rng, pool_images=None):
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, (metrics, stats)), grads = grad_fn(
                state.params, state.batch_stats, batch, rng, pool_images
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params,
                batch_stats=stats,
                opt_state=opt_state,
                step=state.step + 1,
            )
            return new_state, metrics

        self._train_step_core = train_step
        return jax.jit(train_step, donate_argnums=(0,))

    def _build_multi_train_step(self):
        """N train iterations in ONE jitted dispatch (``lax.scan`` over
        stacked batches). Semantically identical to N single steps; it
        exists to amortize per-dispatch RPC latency on tunneled/remote
        runtimes (--steps-per-dispatch). Returns the LAST step's metrics
        (computed in-program — no per-step host fetches)."""
        core = self._train_step_core

        def multi_step(state, batches, rngs, pool_images=None):
            def body(s, xs):
                batch, rng = xs
                return core(s, batch, rng, pool_images)

            state, metrics = jax.lax.scan(body, state, (batches, rngs))
            return state, jax.tree_util.tree_map(lambda x: x[-1], metrics)

        return jax.jit(multi_step, donate_argnums=(0,))

    # --- train loop (reference: src/supervised.py:812-911) --------------------
    def run(self, rank: int = 0, world_size: int = 1, port: int = 0):
        cfg = self.config
        global_batch = cfg.batch_size * self.n_devices
        dataset = self.train_dataset
        order_rng = np.random.default_rng(cfg.seed)
        key = jax.random.PRNGKey(cfg.seed)

        if self.logger is not None:
            # Shapes only — no device->host fetch of the full param tree
            # (minutes over the tunneled-TPU link).
            self.logger.log_start(self.state.params)

        index_pool: List[int] = []
        batch_counter = [0]

        def pick_work():
            # Serialized by the prefetcher: draws sample indices and a
            # per-batch rng seed so workers never share rng state.
            nonlocal index_pool
            while len(index_pool) < global_batch:
                index_pool += order_rng.permutation(len(dataset)).tolist()
            indices, index_pool = (
                index_pool[:global_batch],
                index_pool[global_batch:],
            )
            batch_counter[0] += 1
            return indices, cfg.seed + 1 + batch_counter[0]

        # Device-resident dataset pool: ship all pixels to HBM once and
        # gather patches inside the jitted step; per-iteration batches then
        # carry only geometry/labels (data/device_pool.py).
        pool = None
        if DeviceImagePool.eligible(
            dataset, getattr(cfg, "device_data_cache", "auto")
        ):
            pool = DeviceImagePool.build(dataset, self.mesh)

        # N iterations per jitted dispatch (--steps-per-dispatch): chunk
        # boundaries must line up with the eval cadence.
        spd = max(1, int(getattr(cfg, "steps_per_dispatch", 1)))
        if spd > 1 and cfg.test_every % spd != 0:
            raise ValueError(
                f"--steps-per-dispatch {spd} must divide"
                f" --test-every {cfg.test_every}"
            )

        def make_batch(work):
            # The host->device transfer happens HERE, on the prefetcher
            # thread, so it overlaps the previous iterations' device
            # compute instead of serializing with it on the main thread
            # (device puts are thread-safe; the 2-deep queue bounds
            # resident prefetched batches).
            indices, seed = work
            if spd == 1:
                return shard_batch(
                    self.mesh,
                    build_supervised_batch(
                        dataset,
                        indices,
                        cfg,
                        np.random.default_rng(seed),
                        with_pixels=pool is None,
                    ),
                )
            # Stacked [spd, B, ...] batches: one transfer + one dispatch
            # covers spd iterations.
            chunks = [
                build_supervised_batch(
                    dataset,
                    indices[k * global_batch : (k + 1) * global_batch],
                    cfg,
                    np.random.default_rng(seed + k),
                    with_pixels=pool is None,
                )
                for k in range(spd)
            ]
            stacked = {
                k: np.stack([c[k] for c in chunks]) for k in chunks[0]
            }
            return shard_batch(self.mesh, stacked, batch_axis=1)

        if spd > 1:
            # pick_work draws spd batches' worth of indices per work item.
            single_pick = pick_work

            def pick_work():
                drawn = [single_pick() for _ in range(spd)]
                return (
                    [i for ids, _ in drawn for i in ids],
                    drawn[0][1],
                )

            multi_step = self._build_multi_train_step()

        prefetcher = Prefetcher(
            make_batch,
            n_prefetch=2,
            num_workers=cfg.num_workers,
            pick_work=pick_work,
        )
        try:
            if spd == 1:
                for self.iter_num in range(1, cfg.max_iters):
                    self.maybe_profile(self.iter_num)
                    batch = next(prefetcher)  # already device-sharded
                    key, step_key = jax.random.split(key)
                    self.state, metrics = self._train_step(
                        self.state,
                        batch,
                        step_key,
                        None if pool is None else pool.images,
                    )
                    self.last_train_metrics = metrics
                    self.throttle_dispatch(self.iter_num, metrics)

                    if self.iter_num % cfg.test_every == 0:
                        self.test()
            else:
                start, dispatch_idx = 1, 0
                while start < cfg.max_iters:
                    dispatch_idx += 1
                    self.maybe_profile(dispatch_idx)
                    n = min(spd, cfg.max_iters - start)
                    stacked = next(prefetcher)
                    key, sub = jax.random.split(key)
                    step_keys = jax.random.split(sub, spd)
                    if n < spd:  # tail chunk (one extra trace)
                        stacked = jax.tree_util.tree_map(
                            lambda x: x[:n], stacked
                        )
                        step_keys = step_keys[:n]
                    self.state, metrics = multi_step(
                        self.state,
                        stacked,
                        step_keys,
                        None if pool is None else pool.images,
                    )
                    start += n
                    self.iter_num = start - 1  # last completed iteration
                    self.last_train_metrics = metrics
                    self.throttle_dispatch(self.iter_num, metrics)
                    if self.iter_num % cfg.test_every == 0:
                        self.test()
        finally:
            prefetcher.close()
            self.maybe_profile(-1)

        self.prepare_validation()
        self.test()

    # --- autoregressive eval ---------------------------------------------------
    @staticmethod
    def optimal_next_action(env: OracleEnv) -> Action:
        """Best next action from the greedy keypoint ordering — the value the
        reference obtains by generating a full oracle episode from a cloned
        env and reading its first label (reference:
        src/supervised.py:301-309)."""
        keypoints = env.build_keypoints_trajectory()
        return env.remove_stop_action(move_towards(env.position, keypoints[0]))

    def _get_sup_eval_rollout(self, image_shape):
        """Jitted BATCHED autoregressive eval rollout (greedy or sampled),
        cached per image shape. Whole episodes for a batch of images run
        on-device in one dispatch (the reference re-runs the transformer on
        the full prefix per step from a host loop, reference:
        src/supervised.py:326-333)."""
        if not hasattr(self, "_sup_eval_rollouts"):
            self._sup_eval_rollouts = {}
        if image_shape not in self._sup_eval_rollouts:
            cfg = self.config

            @partial(jax.jit, static_argnames=("sample",))
            def sup_rollout(variables, images, boxes, classes, pos0, key, sample):
                env = NeedleEnv(
                    images,
                    boxes,
                    cfg.patch_size,
                    cfg.test_max_seq_len - 1,  # steps = positions - 1
                    1,
                    cfg.stop_enabled,
                    # The reference eval loop has no all-found break
                    # (reference: src/supervised.py:326-363).
                    terminate_on_all_found=False,
                )
                ro = self._rollout_scan(
                    variables,
                    env,
                    key,
                    sample=sample,
                    classes=classes,
                    collect=("logits", "actions"),
                    positions=pos0,
                )
                ro.pop("final_state")
                return ro

            self._sup_eval_rollouts[image_shape] = sup_rollout
        return self._sup_eval_rollouts[image_shape]

    def _dispatch_eval_rollout(self, shape, images, boxes, rows, key, sample):
        """Batched-eval hook: rows carry class_id/position/seed extras."""
        classes = np.array([r["class_id"] for r in rows], np.int32)
        pos0 = np.array([r["position"] for r in rows], np.int32)
        return self._get_sup_eval_rollout(shape)(
            self.eval_variables(),
            jnp.asarray(images),
            jnp.asarray(boxes),
            jnp.asarray(classes),
            jnp.asarray(pos0),
            key,
            sample,
        )

    def test_model_on_env(
        self,
        item: dict,
        max_ep_len: int,
        class_id: int,
        sample_actions: bool = False,
        position: Optional[Tuple[int, int]] = None,
        env: Optional[OracleEnv] = None,
        sample_rng: Optional[np.random.Generator] = None,
        rollout: Optional[dict] = None,
    ) -> tuple:
        """Greedy/sampled autoregressive rollout on one image — one on-device
        scan dispatch, then a host replay against the oracle for the per-step
        optimal-action labels (reference: src/supervised.py:279-405; label
        alignment parity: logits taken BEFORE the step are paired with the
        optimal action at the post-step state, reference:
        src/supervised.py:333-351)."""
        cfg = self.config
        image = item["image"]
        boxes = np.asarray(item["bboxes"], np.float64).reshape(-1, 4)
        if env is None:
            env = OracleEnv(image.shape[:2], cfg.patch_size, boxes)
        env.reset(position)

        if rollout is None:
            if sample_rng is None:
                sample_rng = np.random.default_rng(0)
            ro = self._batched_eval_rollouts(
                [
                    {
                        "image": image,
                        "boxes": boxes,
                        "class_id": class_id,
                        "position": env.position,
                        "seed": int(sample_rng.integers(2**31)),
                    }
                ],
                sample_actions,
            )[0]
        else:
            ro = rollout

        rep = self._replay_episode(item, env, rollout=ro, max_ep_len=max_ep_len)
        det = self._batched_patch_detections([rep["det_request"]])[0]
        return self._finish_episode(rep, det)

    def _replay_episode(self, item: dict, env: OracleEnv, rollout: dict,
                        max_ep_len: int) -> dict:
        """Host stage of the autoregressive eval: oracle replay for optimal
        labels + the episode's padded detection request. Detection itself is
        batched ACROSS episodes afterwards (``_batched_patch_detections``),
        so full-set validation issues O(set/chunk) detector dispatches
        instead of O(images) (the reference evals per image from a host
        loop, reference: src/supervised.py:279-405)."""
        cfg = self.config
        image = item["image"]
        ro = rollout
        step_masks = ro["logit_masks"][0].astype(bool)  # [T-1]
        n_steps = int(step_masks.sum())
        taken = ro["actions"][0][:n_steps]
        all_logits = ro["logits"][0][:n_steps]

        # Host replay: optimal-action labels need the oracle's state after
        # every step (position + visited set); cheap grid geometry.
        positions = [env.position]
        true_actions = []
        pred_logits = []
        labels = [env.position in env.bbox_patches]
        for t in range(n_steps):
            action = int(taken[t])
            env.step(Action(action))
            true_actions.append(self.optimal_next_action(env).value)
            pred_logits.append(all_logits[t])
            positions.append(env.position)
            labels.append(env.position in env.bbox_patches)

        visited = np.array(positions, np.int32)
        n_visited = len(visited)
        T_pad = max(max_ep_len, n_visited)
        patches = gather_patches(image, visited, cfg.patch_size)
        patches_padded = np.zeros((T_pad,) + patches.shape[1:], patches.dtype)
        patches_padded[:n_visited] = patches
        patch_valid = np.arange(T_pad) < n_visited
        local_bboxes = np.zeros((T_pad, cfg.max_boxes, 6), np.float32)
        for i, pos in enumerate(visited):
            local = env.cap_local_bboxes(
                env.local_bboxes(tuple(pos)), cfg.max_boxes
            )
            local_bboxes[i, : len(local)] = local

        return {
            "visited": visited,
            "n_visited": n_visited,
            "patches": patches,
            "true_actions": true_actions,
            "pred_logits": pred_logits,
            "labels": labels,
            "stopped_inside_bbox": float(labels[-1]),
            "prop_patches_found": (
                len(env.visited_bbox_patches) / len(env.bbox_patches)
                if len(env.bbox_patches) > 0
                else 0.0
            ),
            "local_bboxes": local_bboxes,
            "det_request": {
                "patches": patches_padded,
                "targets": local_bboxes,
                "valid": patch_valid,
            },
        }

    def _finish_episode(self, rep: dict, det: dict) -> tuple:
        """Assemble (sample, metrics, bbox_outs) from a replay + its batched
        detection result."""
        cfg = self.config
        n_visited = rep["n_visited"]
        head_out = det["head"]
        bbox_outs = postprocess(
            head_out["boxes"],
            sigmoid_np(head_out["obj_logits"]),
            sigmoid_np(head_out["cls_logits"]),
            conf_threshold=self.model.detector_conf_threshold,
            patch_size=cfg.patch_size,
        )[:n_visited]
        local_bboxes = rep["local_bboxes"][:n_visited]

        metrics = {}
        if rep["pred_logits"]:
            logits_arr = np.stack(rep["pred_logits"])[None]
            targets_arr = np.array(rep["true_actions"])[None]
            masks_arr = np.ones_like(targets_arr, np.float32)
            al, acc = action_ce_metrics_np(
                logits_arr, targets_arr, masks_arr, self.class_weight_np
            )
            metrics["action_loss"] = al
            metrics["action_accuracy"] = acc
        metrics["episode_length"] = float(n_visited)
        for name, value in det["losses"].items():
            metrics[f"yolo_{name}"] = float(value)
        metrics["yolo_loss"] = metrics["yolo_total_loss"]
        metrics["loss"] = metrics.get("action_loss", 0.0) + metrics["yolo_loss"]
        metrics["stopped_inside_bbox"] = rep["stopped_inside_bbox"]
        metrics["prop_patches_found"] = rep["prop_patches_found"]

        sample = {
            "positions": rep["visited"],
            "patches": rep["patches"],
            "masks": np.ones((n_visited,), np.float32),
            "local_bboxes": local_bboxes,
        }
        return sample, metrics, bbox_outs

    # --- multi-start aggregation (reference: src/supervised.py:569-636) --------
    def _per_patch_map(self, env, samples, bboxes) -> dict:
        """mAP over visited patches, multi-start predictions NMS-deduped;
        missing bbox patches counted as false negatives (reference:
        src/supervised.py:485-567).

        Intentional fix vs the reference: it passes the prediction row's LAST
        column (the class id, always 0 here) as the NMS score
        (reference: src/supervised.py:552); we use obj_conf * cls_conf."""
        visited = {tuple(p) for s in samples for p in s["positions"]}
        predicted: Dict[tuple, list] = {}
        for sample, bbs in zip(samples, bboxes):
            for pos, bb in zip(sample["positions"], bbs):
                if bb is None:
                    continue
                predicted.setdefault(tuple(pos), []).append(np.asarray(bb))

        pred_boxes, pred_scores, gt_boxes = [], [], []

        def add_patch(pos, preds):
            local = env.local_bboxes(pos)
            gt = local[local[:, 5] == 1][:, 1:5]
            if preds is None or len(preds) == 0:
                pred_boxes.append(np.zeros((0, 4)))
                pred_scores.append(np.zeros((0,)))
            else:
                preds = np.concatenate(preds)
                keep = nms_numpy(preds[:, :4], preds[:, 4] * preds[:, 5], 0.5)
                pred_boxes.append(preds[keep, :4])
                pred_scores.append(preds[keep, 4] * preds[keep, 5])
            gt_boxes.append(gt)

        for pos in sorted(visited):
            add_patch(pos, predicted.get(pos))
        # Missed bbox patches => pure false negatives.
        for pos in sorted(env.bbox_patches - visited):
            add_patch(pos, None)

        return {
            "map": average_precision_50(pred_boxes, pred_scores, gt_boxes)
            if sum(len(g) for g in gt_boxes) > 0
            else 0.0
        }

    # --- full evaluation (reference: src/supervised.py:638-810) ----------------
    def eval_envs(
        self,
        dataset,
        env_ids,
        eval_mode: str = "multistart",
        sample_actions: bool = False,
    ):
        visual_ids = set(
            self.visual_rng.choice(
                np.arange(len(env_ids)), size=min(6, len(env_ids)), replace=False
            ).tolist()
        )
        prediction_images = {"model_images": [], "sample_images": []}
        all_metrics = defaultdict(list)
        cfg = self.config

        # Pass 1 (host): resolve per-episode start positions and build rollout
        # rows. Pass 2 (device): ONE batched scan dispatch per image shape.
        # Pass 3 (host): per-episode oracle replay + metrics.
        episodes = []  # (loop_id, item, env, positions)
        rows = []
        for loop_id, env_id in enumerate(env_ids):
            seed = loop_id
            item = dataset.__getitem__(int(env_id), np.random.default_rng(seed))
            boxes = np.asarray(item["bboxes"], np.float64).reshape(-1, 4)
            env = OracleEnv(
                item["image"].shape[:2],
                cfg.patch_size,
                boxes,
                np.random.default_rng(seed),
            )

            if eval_mode == "multistart":
                positions = [None, None]
            elif eval_mode == "rollouts":
                positions = [env.position] * 2
            else:  # corners
                positions = [
                    (0, 0),
                    (env.patch_height - 1, 0),
                    (0, env.patch_width - 1),
                    (env.patch_height - 1, env.patch_width - 1),
                ]
            for i, position in enumerate(positions):
                env.reset(position)
                positions[i] = env.position
                rows.append(
                    {
                        "image": item["image"],
                        "boxes": boxes,
                        "class_id": item["class_id"],
                        "position": env.position,
                        "seed": seed,
                    }
                )
            episodes.append((loop_id, item, env, positions))

        rollouts = self._batched_eval_rollouts(rows, sample_actions)

        # Host oracle replays (row order), then ONE batched detection pass
        # over every episode's padded patch set: final validation of the
        # whole test set issues O(episodes / chunk) detector dispatches
        # instead of O(episodes).
        reps = []
        row_id = 0
        for loop_id, item, env, positions in episodes:
            for position in positions:
                env.reset(position)
                reps.append(
                    self._replay_episode(
                        item, env, rollouts[row_id], cfg.test_max_seq_len
                    )
                )
                row_id += 1
        dets = self._batched_patch_detections(
            [rep["det_request"] for rep in reps]
        )

        row_id = 0
        for loop_id, item, env, positions in episodes:
            seed = loop_id
            all_samples, all_bboxes = [], []
            for position in positions:
                sample, metrics, bboxes = self._finish_episode(
                    reps[row_id], dets[row_id]
                )
                row_id += 1
                all_samples.append(sample)
                all_bboxes.append(bboxes)
                for name, value in metrics.items():
                    all_metrics[name].append(value)

            for n_starts in range(1, len(positions) + 1):
                m = self._per_patch_map(
                    env, all_samples[:n_starts], all_bboxes[:n_starts]
                )
                suffix = f"_{eval_mode}_{n_starts}" if n_starts != 1 else ""
                for name, value in m.items():
                    all_metrics[f"{name}{suffix}"].append(value)
                visited = {
                    tuple(p) for s in all_samples[:n_starts] for p in s["positions"]
                }
                all_metrics[f"prop_patches_found_traj{suffix}"].append(
                    len(visited & env.bbox_patches) / len(env.bbox_patches)
                    if env.bbox_patches
                    else 0.0
                )

            if loop_id in visual_ids:
                sample, bboxes = all_samples[0], all_bboxes[0]
                true_b = parse_bbox_targets(
                    sample["local_bboxes"], sample["positions"], cfg.patch_size
                )
                pred_b = parse_bbox_predictions(
                    bboxes, sample["positions"], cfg.patch_size
                )
                prediction_images["model_images"].append(
                    plot_model_prediction(
                        item["image"],
                        sample["patches"],
                        sample["positions"],
                        true_bboxes=true_b,
                        predicted_bboxes=pred_b,
                    )
                )
                # Oracle sample visualization.
                from ..env.oracle import generate_sample

                gen = generate_sample(
                    env,
                    max_ep_len=env.patch_width * env.patch_height,
                    min_keypoints=dataset.min_keypoints,
                    max_keypoints=dataset.max_keypoints,
                    binomial_keypoints=dataset.binomial_keypoints,
                    position=positions[0],
                )
                n = int(gen["masks"].sum())
                prediction_images["sample_images"].append(
                    plot_model_prediction(
                        item["image"],
                        gather_patches(
                            item["image"], gen["positions"][:n], cfg.patch_size
                        ),
                        gen["positions"][:n],
                        true_bboxes=[
                            BBox(
                                Position(y=b[1], x=b[0]),
                                Position(y=b[3], x=b[2]),
                            )
                            for b in boxes
                        ],
                    )
                )

        return all_metrics, prediction_images

    def eval_supervised(self, dataset, env_ids):
        """Teacher-forced eval on generated trajectories (reference:
        src/supervised.py:407-483)."""
        all_metrics = defaultdict(list)
        cfg = self.config
        variables = self.eval_variables()
        bs = cfg.batch_size
        rng = np.random.default_rng(cfg.seed)

        for start in range(0, len(env_ids), bs):
            ids = env_ids[start : start + bs]
            batch = build_supervised_batch(dataset, ids, cfg, rng)
            logits = jax.device_get(
                self._forward(
                    variables,
                    jnp.asarray(batch["patches"]),
                    jnp.asarray(batch["current_actions"]),
                    jnp.asarray(batch["class_id"]),
                    jnp.asarray(batch["positions"]),
                )
            )
            al, acc = action_ce_metrics_np(
                logits,
                batch["reference_actions"],
                batch["masks"],
                self.class_weight_np,
            )
            all_metrics["action_loss"].append(al)
            all_metrics["action_accuracy"].append(acc)
            all_metrics["episode_length"].append(
                float(batch["masks"].sum(axis=1).mean())
            )

            if cfg.detection_enabled:
                B, K = batch["patches_yolox"].shape[:2]
                flat = jnp.asarray(
                    batch["patches_yolox"].reshape(
                        (B * K,) + batch["patches_yolox"].shape[2:]
                    )
                )
                head_out = self._yolox_predict(variables, flat)
                targets = jnp.asarray(
                    batch["bboxes_yolox"].reshape(
                        (B * K,) + batch["bboxes_yolox"].shape[2:]
                    )
                )
                valid = jnp.asarray(batch["yolox_valid"].reshape(-1))
                ylo = jax.device_get(
                    self._yolox_losses(head_out, targets, valid)
                )
                for name, value in ylo.items():
                    all_metrics[f"yolo_{name}"].append(float(value))
                all_metrics["yolo_loss"].append(float(ylo["total_loss"]))
                all_metrics["loss"].append(
                    float(al) + float(ylo["total_loss"])
                )
                # Per-patch mAP on the detection patches.
                head_np = jax.device_get(head_out)
                outs = postprocess(
                    head_np["boxes"],
                    sigmoid_np(head_np["obj_logits"]),
                    sigmoid_np(head_np["cls_logits"]),
                    conf_threshold=self.model.detector_conf_threshold,
                    patch_size=cfg.patch_size,
                )
                t = np.asarray(targets)
                pred_boxes, pred_scores, gt_boxes = [], [], []
                for i, o in enumerate(outs):
                    gt = t[i][t[i][:, 5] == 1][:, 1:5]
                    gt_boxes.append(gt)
                    if o is None:
                        pred_boxes.append(np.zeros((0, 4)))
                        pred_scores.append(np.zeros((0,)))
                    else:
                        pred_boxes.append(o[:, :4])
                        pred_scores.append(o[:, 4] * o[:, 5])
                if sum(len(g) for g in gt_boxes) > 0:
                    all_metrics["map"].append(
                        average_precision_50(pred_boxes, pred_scores, gt_boxes)
                    )
                else:
                    all_metrics["map"].append(0.0)

        return all_metrics

    def test(self, sample_actions: bool = False):
        """Full test cycle: autoregressive eval + teacher-forced eval +
        worst-failure plots + state save (reference: src/supervised.py:754-810)."""
        cfg = self.config
        datasets = [self.test_dataset]
        datasets_env_ids = [self.test_env_ids]
        modes = ["test"]
        if cfg.eval_training_set:
            datasets.append(self.train_dataset)
            datasets_env_ids.append(self.train_env_ids)
            modes.append("train")

        for dataset, env_ids, mode in zip(datasets, datasets_env_ids, modes):
            # Eval on an un-augmented VIEW (shallow copy, not flag mutation):
            # the prefetcher's worker threads keep building TRAINING batches
            # from the original dataset during the eval and must keep seeing
            # the augmentation flags.
            dataset = copy.copy(dataset)
            dataset.translations = dataset.rotations = False
            metrics, images = self.eval_envs(
                dataset, env_ids, sample_actions=sample_actions
            )

            if cfg.failure_select_rate > 0:
                worst_count = int(cfg.failure_select_rate * len(dataset))
                if worst_count > 0 and metrics[self.best_metric_name]:
                    arr = np.array(metrics[self.best_metric_name])
                    worst_ids = np.argsort(arr)[:worst_count]
                    try:
                        worst_env_ids = np.asarray(env_ids)[worst_ids]
                        _, worst_images = self.eval_envs(
                            dataset, worst_env_ids
                        )
                        images["worst_images"] = worst_images["model_images"]
                    except Exception:
                        import traceback

                        print("Could not compute worst images")
                        traceback.print_exc()

            sup = self.eval_supervised(dataset, env_ids)
            for name, values in sup.items():
                metrics["supervised_" + name] = values

            self.last_test_metrics = metrics
            self.record_best_metric(metrics)
            if self.logger is not None:
                self.logger.log_to_visdom(metrics, images, mode)

        self.save_state()
        self.save_metrics()
