"""Prefetcher: ordering, transform-in-worker, error propagation."""
import time

import pytest

from artiboost_tpu.utils.prefetch import prefetch


def test_order_preserved():
    assert list(prefetch(range(100), depth=4)) == list(range(100))


def test_transform_runs_in_worker():
    out = list(prefetch(range(5), transform=lambda x: x * 2))
    assert out == [0, 2, 4, 6, 8]


def test_overlaps_producer_and_consumer():
    """Structural overlap check (wall-clock thresholds flake on this
    1-core host when the suite loads it): while the consumer holds the
    first item, the producer must keep filling the queue behind it."""
    import threading

    produced = threading.Event()

    def gen():
        yield 0
        yield 1
        produced.set()  # ran while the consumer was still holding item 0
        yield 2

    it = iter(prefetch(gen(), depth=2))
    assert next(it) == 0
    # no new next() call: any further production is overlap, by definition
    assert produced.wait(timeout=5.0)
    assert list(it) == [1, 2]


def test_abandoned_iteration_stops_producer():
    """Breaking out of iteration must reclaim the worker thread — a
    producer left blocked on a full queue can abort the interpreter at
    shutdown when it touches logging/stdout during finalization."""
    from artiboost_tpu.utils.prefetch import Prefetcher

    def endless():
        i = 0
        while True:
            yield i
            i += 1

    pf = Prefetcher(endless(), depth=1)
    it = iter(pf)
    assert next(it) == 0
    it.close()  # GeneratorExit -> Prefetcher.close()
    pf._thread.join(timeout=5.0)
    assert not pf._thread.is_alive()


def test_error_propagates():
    def bad_gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(bad_gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)
