"""Worker-local cache for broadcast objects.

``ray.put`` once on the driver; workers fetch with ``get_cached`` — the
deserialized object is memoized per worker process, so stateless task
functions get actor-pool-like amortization without actor-pool startup
latency.  (Heavyweight state — real NER models — should still use callable
classes with ``concurrency=``; this is for dict/array broadcast sides.)
"""

from __future__ import annotations

import ray

_CACHE: dict[str, object] = {}


def get_cached(ref):
    if not isinstance(ref, ray.ObjectRef):
        return ref
    key = ref.hex()
    if key not in _CACHE:
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
