"""Host-side prefetching iterator.

Plays the role of the reference's DataLoader worker pool
(``--workers``, torch multiprocessing): batch assembly (decode, native
warp/augment, collate) runs in background threads while the device
executes the previous step, keeping the input pipe full. Depth-2 is
double buffering; deeper queues help when per-batch host time is spiky.
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
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._it:
                if self._transform is not None:
                    item = self._transform(item)
                self._q.put(item)
        except BaseException as e:  # re-raised on the consumer side
            self._err = e
        finally:
            self._q.put(_SENTINEL)

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is _SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item


def prefetch(iterable: Iterable, depth: int = 2,
             transform: Optional[Callable] = None) -> Iterator:
    """Iterate ``iterable`` through a background thread; ``transform``
    (e.g. host->device placement) runs inside the worker."""
    return iter(Prefetcher(iterable, depth=depth, transform=transform))
