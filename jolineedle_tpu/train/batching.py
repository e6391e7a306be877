"""Host-side batch assembly for the supervised pipeline.

Replaces the reference's per-iteration trajectory generation (reference:
src/supervised.py:95-136) + ragged collate (src/env/simple_env.py:720-763)
with fixed-shape numpy batches: the oracle runs in numpy (pure grid
geometry), patch pixels are gathered by vectorized slicing, and everything
is padded to static caps (max_seq_len, max_det_patches, max_boxes) so one
compiled train step serves every batch.

A tiny thread-based prefetcher overlaps host batch assembly with device
compute (the reference is disk/CPU-bound at ~3 s/iter,
reference docs/experiment_log.md:76-78).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import numpy as np

from ..data.dataset import NeedleDataset
from ..env.oracle import (
    OracleEnv,
    detection_patch_positions,
    gather_patches,
    generate_sample,
)


def build_supervised_sample(
    item: dict,
    patch_size: int,
    max_seq_len: int,
    min_keypoints: int,
    max_keypoints: int,
    binomial_keypoints: bool,
    max_det_patches: int,
    max_boxes: int,
    rng: np.random.Generator,
    position=None,
    with_pixels: bool = True,
) -> Dict[str, np.ndarray]:
    """One image -> fixed-shape oracle episode + detector patches.

    ``with_pixels=False`` is the device-pool path (data/device_pool.py):
    patch pixels stay in HBM and the jitted train step gathers them from
    ``positions``/``yolox_positions``, so the batch carries only geometry
    and labels (KBs instead of MBs per iteration). The item may then be a
    pixel-free ``get_geometry`` dict (carrying ``shape`` instead of
    ``image``).
    """
    image = item.get("image")  # [H, W, C] uint8 (float accepted, see to_u8)
    shape = item["shape"] if image is None else image.shape[:2]
    boxes = np.asarray(item["bboxes"], np.float64).reshape(-1, 4)
    env = OracleEnv(shape, patch_size, boxes, rng)

    sample = generate_sample(
        env,
        max_seq_len,
        min_keypoints=min_keypoints,
        max_keypoints=max_keypoints,
        binomial_keypoints=binomial_keypoints,
        position=position,
        max_boxes=max_boxes,
    )
    # Patches ship as uint8: 4x less host->device transfer (and 4x less
    # client-side retention on the tunneled runtime); the jitted step
    # normalizes back to [0, 1] (ops/augment.to_unit_float). Dataset images
    # are uint8-native so this is a no-op; float [0,1] images (tests,
    # synthetic callers) still convert.
    to_u8 = lambda x: (
        x
        if x.dtype == np.uint8
        else np.clip(np.round(x * 255.0), 0, 255).astype(np.uint8)
    )
    sample["class_id"] = np.int32(item["class_id"])

    det_pos, det_valid = detection_patch_positions(env, max_det_patches)
    det_boxes = np.zeros((max_det_patches, max_boxes, 6), np.float32)
    for i in range(max_det_patches):
        if det_valid[i]:
            local = env.cap_local_bboxes(
                env.local_bboxes(tuple(det_pos[i])), max_boxes
            )
            det_boxes[i, : len(local)] = local
    sample["yolox_positions"] = det_pos.astype(np.int32)
    sample["bboxes_yolox"] = det_boxes
    sample["yolox_valid"] = det_valid

    if with_pixels:
        sample["patches"] = to_u8(
            gather_patches(image, sample["positions"], patch_size)
        )
        det_patches = gather_patches(image, det_pos, patch_size)
        sample["patches_yolox"] = to_u8(
            det_patches * det_valid[:, None, None, None]
        )
    return sample


def build_supervised_batch(
    dataset: NeedleDataset,
    indices,
    config,
    rng: np.random.Generator,
    with_pixels: bool = True,
) -> Dict[str, np.ndarray]:
    samples = []
    has_augs = dataset.rotations or dataset.translations
    for idx in indices:
        # Forward the per-batch rng: class choice and rotate/translate augs
        # must not touch the dataset's shared (thread-unsafe) generator.
        # Pool path: geometry only — pixels never decode on this thread;
        # get_geometry consumes the identical rng stream (data/dataset.py).
        if with_pixels:
            item = dataset.__getitem__(int(idx), rng)
        else:
            item = dataset.get_geometry(int(idx), rng)
        sample = build_supervised_sample(
            item,
            patch_size=config.patch_size,
            max_seq_len=config.max_seq_len,
            min_keypoints=config.min_keypoints,
            max_keypoints=config.max_keypoints,
            binomial_keypoints=config.binomial_keypoints,
            max_det_patches=config.max_det_patches,
            max_boxes=config.max_boxes,
            rng=rng,
            with_pixels=with_pixels,
        )
        if not with_pixels and has_augs:
            # Device-side aug replay params (data/device_pool.py).
            sample["base_hw"] = np.asarray(item["base_hw"], np.int32)
            if dataset.rotations:
                sample["aug_rot"] = np.int32(item["aug_rot"])
            if dataset.translations:
                sample["aug_shift"] = np.asarray(item["aug_shift"], np.int32)
        samples.append(sample)
    batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    batch["image_idx"] = np.asarray(indices, np.int32)

    # Reference actions (loss mode, reference: src/supervised.py:870-879).
    if getattr(config, "loss_mode", "on-optimal-trajectory") == "on-self-trajectory":
        cur, nxt, masks = (
            batch["current_actions"],
            batch["next_actions"],
            batch["masks"],
        )
        ref = np.zeros_like(cur)
        ref[:, :-1] = cur[:, 1:]
        last = masks.sum(axis=1).astype(np.int64) - 1
        ref[np.arange(len(ref)), last] = nxt[np.arange(len(ref)), last]
        batch["reference_actions"] = ref
    else:
        batch["reference_actions"] = batch["next_actions"]
    return batch


class Prefetcher:
    """Background-thread batch producer with a bounded queue.

    ``num_workers`` > 1 assembles batches from several threads (PIL decode
    and numpy slicing release the GIL) — the reference's DataLoader worker
    count (reference: main.py ``--num-workers``). When ``pick_work`` is
    given, it is called under an internal lock to draw the next work item
    (e.g. sample indices) and ``make_batch(work)`` runs in parallel; without
    it, ``make_batch()`` itself must be thread-safe for num_workers > 1.
    Batch order is non-deterministic across workers, which is fine for
    shuffled training.
    """

    def __init__(
        self,
        make_batch,
        n_prefetch: int = 2,
        num_workers: int = 1,
        pick_work=None,
    ):
        num_workers = max(1, int(num_workers))
        self._queue: queue.Queue = queue.Queue(
            maxsize=max(n_prefetch, num_workers)
        )
        self._make_batch = make_batch
        self._pick_work = pick_work
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._active = num_workers
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(num_workers)
        ]
        for t in self._threads:
            t.start()

    def _worker(self):
        while not self._stop.is_set():
            try:
                if self._pick_work is not None:
                    with self._lock:
                        work = self._pick_work()
                    batch = self._make_batch(work)
                else:
                    batch = self._make_batch()
            except StopIteration:
                # End-of-stream sentinel only once EVERY worker has drained,
                # so late batches from other workers are not cut off.
                with self._lock:
                    self._active -= 1
                    last = self._active == 0
                if last:
                    self._queue.put(None)
                return
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._queue.get()
        if item is None:
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        # Drain so workers blocked on a full queue observe the stop flag,
        # then join: no worker may still be inside make_batch (touching the
        # dataset) when the caller proceeds to eval/validation.
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        for t in self._threads:
            t.join(timeout=30.0)
