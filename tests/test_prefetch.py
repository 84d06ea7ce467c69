"""Host-side batch prefetcher."""

import time

import numpy as np
import pytest

from gpy_dla_detection_tpu.utils.prefetch import prefetch_map


def test_prefetch_map_order_and_completeness():
    out = list(prefetch_map(lambda x: x * x, range(23), depth=3))
    assert out == [x * x for x in range(23)]


def test_prefetch_map_empty_and_depth_validation():
    assert list(prefetch_map(lambda x: x, [], depth=2)) == []
    with pytest.raises(ValueError):
        list(prefetch_map(lambda x: x, [1], depth=0))


def test_prefetch_map_propagates_exceptions_in_order():
    def fn(x):
        if x == 3:
            raise RuntimeError("boom")
        return x

    it = prefetch_map(fn, range(6), depth=2)
    assert [next(it) for _ in range(3)] == [0, 1, 2]
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_prefetch_map_overlaps_producer_and_consumer():
    """With depth 2, a slow consumer never waits on an equally-slow
    producer: total time ~ max(producer, consumer), not their sum."""
    def produce(x):
        time.sleep(0.05)
        return x

    t0 = time.time()
    for _ in prefetch_map(produce, range(8), depth=2):
        time.sleep(0.05)  # consumer work
    elapsed = time.time() - t0
    # serial would be ~0.8s; overlapped ~0.45s. generous bound for CI
    assert elapsed < 0.7, elapsed
