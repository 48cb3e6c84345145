"""Tracked persist: operators that cache intermediate frames register them
here so long-lived sessions (benchmarks, notebooks, the driver contract
runner) can release executor storage between queries instead of waiting for
LRU eviction.

Operators persist() frames whose lifetime must span the CALLER's action
(e.g. minhash signatures shared by the band-join and the verify join), so
they cannot unpersist before returning.  Callers own the cache lifetime:
call :func:`release_tracked_caches` after materializing results.  Frames
are held by weakref — dropping all references also frees the entry.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[weakref.ref] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK_DESER
) -> DataFrame:
    """persist() + register for later bulk release."""
    df = df.persist(level)
    _TRACKED.append(weakref.ref(df))
    return df


def release_tracked_caches() -> int:
    """Unpersist every tracked frame still alive; returns how many."""
    n = 0
    for ref in _TRACKED:
        df = ref()
        if df is not None:
            try:
                df.unpersist()
                n += 1
            except Exception:
                pass
    _TRACKED.clear()
    return n
