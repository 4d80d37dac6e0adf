"""Host-side prefetching iterator.

Plays the role of the reference's DataLoader worker pool
(``--workers``, torch multiprocessing): batch assembly (decode, native
warp/augment, collate) runs in background threads while the device
executes the previous step, keeping the input pipe full. Depth-2 is
double buffering; deeper queues help when per-batch host time is spiky.

The producer thread is stoppable: it never blocks indefinitely on a
full queue, and the consumer generator closes it on exit (including
GeneratorExit from an abandoned iteration). An abandoned-but-blocked
daemon thread can otherwise touch logging/stdout during interpreter
finalization and abort the process ("Fatal Python error" at shutdown).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

_SENTINEL = object()


class Prefetcher:
    def __init__(self, iterable: Iterable, depth: int = 2,
                 transform: Optional[Callable] = None):
        self._it = iter(iterable)
        self._q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._transform = transform
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        """Bounded put; returns False if the consumer went away."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _run(self):
        try:
            for item in self._it:
                if self._transform is not None:
                    item = self._transform(item)
                if not self._put(item):
                    return
        except BaseException as e:  # re-raised on the consumer side
            self._err = e
        finally:
            self._put(_SENTINEL)

    def close(self):
        """Stop the producer and reclaim the thread (idempotent)."""
        self._stop.set()
        # unblock a producer waiting on a full queue
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=5.0)
        if self._thread.is_alive():
            # a transform blocked >5s keeps the daemon thread alive past
            # close(); surface it instead of silently re-exposing the
            # interpreter-finalization abort this close() exists to fix
            from artiboost_tpu.utils.logger import logger
            logger.warning("prefetch: producer thread still alive 5s after "
                           "close(); a transform is blocked")

    def __iter__(self) -> Iterator:
        try:
            while True:
                item = self._q.get()
                if item is _SENTINEL:
                    if self._err is not None:
                        raise self._err
                    return
                yield item
        finally:
            self.close()


def prefetch(iterable: Iterable, depth: int = 2,
             transform: Optional[Callable] = None) -> Iterator:
    """Iterate ``iterable`` through a background thread; ``transform``
    (e.g. host->device placement) runs inside the worker."""
    return iter(Prefetcher(iterable, depth=depth, transform=transform))
