"""Materialized-search cache — the BlsCache analogue.

The reference caches running/finished searches keyed by their full
parameter fingerprint and reuses them across requests, evicting by
age/size (reference server/.../search/BlsCache.java, BlsCacheEntry).
Spark translation: an entry persists the result DataFrame
(MEMORY_AND_DISK — spills, never OOMs); hits return the persisted
handle so repeated identical requests skip recomputation entirely.

Keys include the index GENERATION (bumped by incremental add/delete/
compact), so a cache never serves stale results across index updates.
Eviction is LRU over a bounded entry count and unpersists the evicted
DataFrame — executor memory cannot leak past max_entries results.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


class SearchCache:
    def __init__(self, max_entries: int = 32):
        self.max_entries = max_entries
        self._lru: OrderedDict[str, DataFrame] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get_or_compute(self, key: str, supplier: Callable[[], DataFrame]) -> DataFrame:
        if key in self._lru:
            self._lru.move_to_end(key)
            self.hits += 1
            return self._lru[key]
        self.misses += 1
        df = supplier().persist(StorageLevel.MEMORY_AND_DISK)
        self._lru[key] = df
        while len(self._lru) > self.max_entries:
            _, old = self._lru.popitem(last=False)
            old.unpersist()
        return df

    def clear(self) -> None:
        for df in self._lru.values():
            df.unpersist()
        self._lru.clear()

    def info(self) -> dict:
        """cache-info endpoint payload (reference RequestHandlerCacheInfo)."""
        return {
            "entries": len(self._lru),
            "max_entries": self.max_entries,
            "hits": self.hits,
            "misses": self.misses,
        }
