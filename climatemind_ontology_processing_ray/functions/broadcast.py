"""Per-worker-process cache for broadcast objects.

``ray.get`` on a plasma ObjectRef is zero-copy only for buffer-backed
payloads (numpy/Arrow); a Python dict/set broadcast is RE-UNPICKLED on
every call.  A per-batch ``ray.get(ref)`` inside ``map_batches`` then
pays the full deserialization once per TASK — measured as the dominant
cost of the similarity-join verify stage when the broadcast lookup held
~200k frozensets (~seconds of unpickling per task, hundreds of tasks).

``cached_get`` keys the deserialized value by the ref's hex in a
module-global dict: worker processes import the module once, so each
worker pays deserialization exactly once per object and every later
task reuses the in-heap value (the ``stages/fused.py`` _WORKER_CACHE
pattern, generalized).  Memory contract: one deserialized copy per
worker process — size broadcast objects accordingly.
"""

from __future__ import annotations

import ray

_CACHE: dict[str, object] = {}


def cached_get(ref):
    """ray.get with per-worker-process deserialization caching."""
    key = ref.hex()
    val = _CACHE.get(key)
    if val is None:
        val = _CACHE[key] = ray.get(ref)
    return val
