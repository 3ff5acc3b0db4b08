"""Prefetcher tests: ordering, backpressure, error propagation."""

import time

import pytest

from videollama2_tpu.media.prefetch import prefetch_map


def test_order_preserved():
    def work(x):
        time.sleep(0.01 * (5 - x % 5))  # out-of-order completion
        return x * 2

    out = list(prefetch_map(range(20), work, buffer_size=4, num_workers=4))
    assert out == [x * 2 for x in range(20)]


def test_error_propagates():
    def work(x):
        if x == 3:
            raise ValueError("boom")
        return x

    with pytest.raises(ValueError, match="boom"):
        list(prefetch_map(range(6), work, buffer_size=2, num_workers=2))


def test_empty():
    assert list(prefetch_map([], lambda x: x)) == []
