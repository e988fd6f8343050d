"""Bounded dispatch pipelining for device->host result fetches.

Eval/encode passes dispatch jitted steps far faster than the host can fetch
their results; letting dispatches run ahead pipelines the device instead of
stalling it on a round trip per batch (the reference synced every batch,
train_model.py:478-496). But an UNbounded queue keeps every in-flight batch's
input buffer simultaneously live in HBM — an OOM risk on corpus-scale splits
(ADVICE r03). This window caps the overhang: results drain oldest-first once
more than ``window`` dispatches are pending, keeping the pipelining win while
bounding in-flight device memory.

Shared by eval.latents.extract_latents, train.loop.evaluate_split, and
train.loop.estimate_split_mu2.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, TypeVar

T = TypeVar("T")

# max dispatches in flight before results drain oldest-first: deep enough to
# hide the per-dispatch round trip (tens of ms on a tunneled link), shallow
# enough that at most ~32 batches of input feats are live in HBM at once.
PENDING_WINDOW = 32


class DispatchWindow:
    """Sliding window of in-flight dispatch results.

    ``push(item)`` enqueues a just-dispatched item (device arrays still in
    flight) and, when more than ``window`` are pending, drains the oldest
    through ``drain`` — which blocks on that dispatch's completion only.
    ``close()`` drains everything; it must be called after the dispatch loop.
    """

    def __init__(self, drain: Callable[[T], None],
                 window: int = PENDING_WINDOW) -> None:
        self._drain = drain
        self._window = window
        self._pending: deque[T] = deque()

    def push(self, item: T) -> None:
        self._pending.append(item)
        if len(self._pending) > self._window:
            self._drain(self._pending.popleft())

    def close(self) -> None:
        while self._pending:
            self._drain(self._pending.popleft())
