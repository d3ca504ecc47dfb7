"""RemoteCache: cross-event state visible to detections (SURVEY.md A6;
ref: detection/cache.py:8-130 — KV with TTL, counters, string sets
backed by DynamoDB in the reference).

Two implementations of one interface:
- `LocalRemoteCache` — in-process dict with TTL, for tests and
  single-node batch runs (functionally identical to the reference
  semantics: get/set, increment_counter, add_to_string_set, expiry).
- At cluster scale the same counters/sets live in the streaming state
  store: `streaming_alerts`-style applyInPandasWithState keyed by
  (namespace, key) with timeout = TTL — see streaming.alerting for the
  pattern. Detections running inside mapInPandas on one executor must
  treat the cache as per-partition (the reference's cache is
  cross-invocation global; a shared store service or state-backed
  aggregation replaces it — documented architectural difference).
"""

from __future__ import annotations

import time
from typing import Any


class LocalRemoteCache:
    """remotecache(namespace, ttl) equivalent (detection/common.py:91)."""

    def __init__(self, namespace: str, ttl_seconds: int = 3600, clock=time.time):
        self.namespace = namespace
        self.ttl = ttl_seconds
        self._clock = clock
        self._data: dict[str, tuple[float, Any]] = {}

    def _live(self, key: str):
        item = self._data.get(key)
        if item is None:
            return None
        expires, value = item
        if self._clock() >= expires:
            del self._data[key]
            return None
        return value

    def get(self, key: str, default: Any = None) -> Any:
        v = self._live(key)
        return default if v is None else v

    def set(self, key: str, value: Any, ttl: int | None = None) -> None:
        self._data[key] = (self._clock() + (ttl or self.ttl), value)

    def increment_counter(self, key: str, by: int = 1) -> int:
        cur = self._live(key) or 0
        new = int(cur) + by
        expires = self._data.get(key, (self._clock() + self.ttl, None))[0]
        self._data[key] = (expires, new)
        return new

    def add_to_string_set(self, key: str, *values: str) -> set[str]:
        cur = self._live(key) or set()
        new = set(cur) | set(values)
        expires = self._data.get(key, (self._clock() + self.ttl, None))[0]
        self._data[key] = (expires, new)
        return new
