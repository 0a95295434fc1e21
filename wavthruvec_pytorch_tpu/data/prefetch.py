"""Host-side pipeline overlap: background prefetch of batches.

The reference overlaps host data work with device compute via
``DataLoader(num_workers=8)`` (text2vec/train.py:226, vec2wav/train.py:116).
The TPU-native equivalent: batch iterators stay plain Python, and
``PrefetchIterator`` pulls them on a daemon thread into a bounded queue so
host batch assembly (np.load, wav read, host mel, padding) runs while the
device executes the previous step.  Item-level parallelism inside a batch is
handled by the loaders' ``num_workers`` thread pools (numpy/scipy release
the GIL for the heavy parts) and by the native C++ ``Prefetcher``
(native/npy_loader.cc) for raw ``.npy`` reads.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


class PrefetchIterator(Iterator[T]):
    """Wrap an iterator so items are produced on a background thread.

    ``depth`` bounds the queue (memory = depth batches).  Exceptions in the
    producer are re-raised in the consumer.  Always drains/joins on close.
    """

    def __init__(self, it: Iterable[T], depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._err = None
        self._stop = threading.Event()

        def run():
            try:
                for item in it:
                    if self._stop.is_set():
                        return
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
            except BaseException as e:  # propagate to consumer
                self._err = e
            finally:
                while not self._stop.is_set():
                    try:
                        self._q.put(_SENTINEL, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self) -> T:
        item = self._q.get()
        if item is _SENTINEL:
            self._thread.join()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)


def prefetched(it: Iterable[T], depth: int = 2, enabled: bool = True):
    """Generator form with guaranteed cleanup (safe under ``break``)."""
    if not enabled:
        yield from it
        return
    pf = PrefetchIterator(it, depth=depth)
    try:
        yield from pf
    finally:
        pf.close()
