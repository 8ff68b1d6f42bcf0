"""Host-side batch prefetch: overlap data loading with device compute.

The reference overlaps via ``DataLoader(num_workers, pin_memory)`` — torch
workers decode ahead while the GPU trains (ref data/build.py:95-103).
This is the equivalent for the torch-free loader here: a background
thread pulls batches from any iterable into a bounded queue, so host
decode/transform runs while the device executes the previous dispatch.
Ordering is preserved exactly; worker exceptions re-raise on the
consumer; iteration is re-startable (one thread per epoch).

Composes with TRAIN.DEVICE_AUGMENT (train/augment.py) into the full
TPU-native input pipeline: threads decode + resize ahead -> raw uint8
batches prefetch -> the augmentation chain runs inside the train step.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_SENTINEL = object()


class PrefetchLoader:
    """Wrap a batch iterable with a depth-bounded background prefetcher."""

    def __init__(self, loader: Iterable, depth: int = 2):
        if depth < 1:
            raise ValueError(f"prefetch depth must be >= 1, got {depth}")
        self.loader = loader
        self.depth = depth

    def __len__(self) -> int:
        return len(self.loader)

    def set_epoch(self, epoch: int) -> None:
        set_epoch = getattr(self.loader, "set_epoch", None)
        if set_epoch is not None:
            set_epoch(epoch)

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def put(item) -> bool:
            """Bounded put that gives up when the consumer is gone."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for batch in self.loader:
                    if not put(batch):
                        return  # consumer abandoned iteration
            except BaseException as exc:  # noqa: BLE001 - re-raised by consumer
                put(exc)
                return
            put(_SENTINEL)

        thread = threading.Thread(target=worker, daemon=True, name="prefetch")
        thread.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # early exit (break / exception / GeneratorExit): release a
            # producer blocked on the full queue and reap the thread —
            # without this every abandoned epoch leaks a thread plus
            # depth+1 decoded batches
            stop.set()
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            thread.join(timeout=10.0)
