"""Host→device prefetch: keep the next batch's transfer in flight while the device
computes the current step (the TPU analogue of the reference's DataLoader worker
pools, data.py:70-86 — transfer/compute overlap instead of host-side parallelism)."""

from __future__ import annotations

import collections
from typing import Iterable, Iterator

import jax

__all__ = ["prefetch_to_device"]


def prefetch_to_device(iterator: Iterable, size: int = 2, sharding=None) -> Iterator:
    """Yield items from `iterator` with up to `size` batches resident on device.

    jax dispatch is async, so simply issuing device_put ahead of consumption
    overlaps the H2D copies with compute. Works on arbitrary pytrees.
    """
    queue = collections.deque()

    def put(item):
        if callable(sharding):
            return sharding(item)
        if sharding is not None:
            return jax.device_put(item, sharding)
        return jax.tree.map(jax.device_put, item)

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
