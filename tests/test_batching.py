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
