"""Host->device prefetch: overlap transfers with compute.

Classic JAX input-pipeline pattern: keep ``depth`` batches already
device-resident (or sharded across a mesh) while the current step computes.
Complements the native C++ batch producer (data/native_loader.py) — together
they form the full input path: mmap -> native decode/normalize threads ->
device prefetch -> jitted step.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator

import jax


def device_prefetch(
    iterator: Iterable,
    *,
    depth: int = 2,
    sharding=None,
) -> Iterator:
    """Yield items from ``iterator`` with leaves placed on device ahead of
    consumption. ``sharding`` (optional NamedSharding) places every leaf;
    default is the default device. depth=2 keeps one batch in flight."""
    queue = collections.deque()

    def put(item):
        if sharding is None:
            return jax.tree.map(jax.device_put, item)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), item)

    it = iter(iterator)
    try:
        for _ in range(depth):
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
