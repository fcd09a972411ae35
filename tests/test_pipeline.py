"""Pipeline-parallelism primitive (SURVEY 2.3 P4; used by the wrapper
recursion driver to overlap witness synthesis with device proving)."""

import threading
import time

import pytest

from zksnap_tpu.parallel.pipeline import Lookahead


def test_lookahead_order_and_results():
    calls = []

    def fn(i):
        calls.append(i)
        return i * i

    assert list(Lookahead(fn, 5)) == [0, 1, 4, 9, 16]
    assert calls == [0, 1, 2, 3, 4]


def test_lookahead_empty():
    assert list(Lookahead(lambda i: i, 0)) == []


def test_lookahead_overlaps_consumer():
    """fn(i+1) must run WHILE the consumer processes fn(i)."""
    started = [threading.Event() for _ in range(2)]

    def fn(i):
        started[i].set()
        return i

    it = iter(Lookahead(fn, 2))
    next(it)  # consume fn(0); fn(1) is now in flight on the worker
    assert started[1].wait(timeout=5.0), "lookahead call never started"
    assert next(it) == 1


def test_lookahead_single_slot():
    """At most one call runs ahead of the consumer (bounded memory)."""
    in_flight, max_seen = [0], [0]
    lock = threading.Lock()

    def fn(i):
        with lock:
            in_flight[0] += 1
            max_seen[0] = max(max_seen[0], in_flight[0])
        time.sleep(0.01)
        with lock:
            in_flight[0] -= 1
        return i

    assert list(Lookahead(fn, 6)) == list(range(6))
    assert max_seen[0] == 1


def test_lookahead_propagates_exceptions():
    def fn(i):
        if i == 2:
            raise ValueError("boom")
        return i

    it = iter(Lookahead(fn, 4))
    assert next(it) == 0
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        next(it)
