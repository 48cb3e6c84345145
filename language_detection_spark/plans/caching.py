"""Tracked persist: operators that cache intermediate frames register them
here so long-lived sessions (benchmarks, notebooks, the driver contract
runner) can release executor storage between queries instead of waiting for
LRU eviction.

Operators persist() frames whose lifetime must span the CALLER's action
(e.g. minhash signatures shared by the band-join and the verify join), so
they cannot unpersist before returning.  Callers own the cache lifetime:
call :func:`release_tracked_caches` after materializing results.  Frames
are held by STRONG reference: Spark's CacheManager keeps the physical plan
cached regardless of Python-side references, so a weakref registry would
silently leak storage once the caller drops its local variable (the JVM
entry survives; only our handle dies).  The registry is bounded by the
number of persist_tracked calls between releases, which is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK_DESER
) -> DataFrame:
    """persist() + register for later bulk release."""
    df = df.persist(level)
    _TRACKED.append(df)
    return df


def release_tracked_caches() -> int:
    """Unpersist every tracked frame; returns how many were released."""
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    _TRACKED.clear()
    return n
