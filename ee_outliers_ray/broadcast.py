"""Worker-process-level cache for broadcast objects.

The broadcast pattern (`ray.put` once on the driver, read inside every
`map_batches` task) deserializes the object on every `ray.get` for
non-zero-copy payloads (pandas Series, dicts).  `cached_get` memoizes the
deserialized object per worker process, so a task pool pays the
deserialization once per worker instead of once per batch — the elastic
alternative to pinning a fixed actor pool just to hold the object.

Entries are keyed by the ObjectRef hex and never evicted: broadcast
sides are small by contract (that is why they are broadcast), and worker
processes are recycled by Ray between jobs.
"""

from __future__ import annotations

from typing import Any

_CACHE: dict[str, Any] = {}


def cached_get(ref) -> Any:
    """ray.get(ref), memoized per worker process."""
    import ray

    key = ref.hex()
    try:
        return _CACHE[key]
    except KeyError:
        val = ray.get(ref)
        _CACHE[key] = val
        return val
