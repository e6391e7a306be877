"""Prefetcher unit tests: ordering contract, multi-worker coverage, close."""

import threading
import time

import numpy as np


def test_prefetcher_single_worker_order():
    from jolineedle_tpu.train.batching import Prefetcher

    counter = [0]

    def make_batch():
        counter[0] += 1
        if counter[0] > 5:
            raise StopIteration
        return counter[0]

    p = Prefetcher(make_batch, n_prefetch=2)
    got = list(p)
    assert got == [1, 2, 3, 4, 5]
    p.close()


def test_prefetcher_multi_worker_covers_all_work():
    from jolineedle_tpu.train.batching import Prefetcher

    issued = []
    lock_check = []

    def pick_work():
        # Runs under the prefetcher's lock: record re-entrancy violations.
        lock_check.append(1)
        assert len(lock_check) == 1, "pick_work must be serialized"
        try:
            if len(issued) >= 12:
                raise StopIteration
            issued.append(len(issued))
            return issued[-1]
        finally:
            lock_check.pop()

    def make_batch(work):
        time.sleep(0.01)
        return work * 10

    p = Prefetcher(make_batch, n_prefetch=2, num_workers=3, pick_work=pick_work)
    got = []
    for item in p:
        got.append(item)
        if len(got) == 12:
            break
    assert sorted(got) == [i * 10 for i in range(12)]
    p.close()


def test_prefetcher_close_unblocks():
    from jolineedle_tpu.train.batching import Prefetcher

    def make_batch():
        time.sleep(0.01)
        return np.zeros((2, 2))

    p = Prefetcher(make_batch, n_prefetch=1)
    next(p)
    p.close()  # must not hang


def test_supervised_batch_ships_uint8_patches():
    """Patch tensors cross host->device as uint8 and normalize back to the
    float pixel values within quantization error (ops/augment.to_unit_float)."""
    import numpy as np

    from jolineedle_tpu.data.toy import generate_toy_dataset
    from jolineedle_tpu.data.dataset import build_datasets
    from jolineedle_tpu.ops.augment import to_unit_float
    from jolineedle_tpu.train.batching import build_supervised_batch

    root = generate_toy_dataset(
        "/tmp/toyds_u8test", n_train=2, n_test=1, image_size=(128, 192), seed=0
    )

    class Cfg:
        patch_size = 64
        max_seq_len = 4
        min_keypoints = 0
        max_keypoints = 0
        binomial_keypoints = False
        max_det_patches = 4
        max_boxes = 4
        loss_mode = "on-optimal-trajectory"

    train, _ = build_datasets(
        root, patch_size=64, max_ep_len=4, min_keypoints=0, max_keypoints=0,
        rotations=False, translations=False,
    )
    batch = build_supervised_batch(train, [0, 1], Cfg, np.random.default_rng(0))
    assert batch["patches"].dtype == np.uint8
    assert batch["patches_yolox"].dtype == np.uint8

    # Normalization returns [0, 1] floats matching the source pixels.
    import jax.numpy as jnp

    f = to_unit_float(jnp.asarray(batch["patches"]))
    assert f.dtype == jnp.float32
    img = train.__getitem__(0, np.random.default_rng(0))["image"]
    assert img.dtype == np.uint8  # the dataset is uint8-native end-to-end
    assert float(f.max()) <= 1.0 and float(f.min()) >= 0.0
    # Source images are uint8 files, so the normalize round-trip is exact.
    assert abs(float(f.max()) - float(img.max()) / 255.0) < 1e-6
