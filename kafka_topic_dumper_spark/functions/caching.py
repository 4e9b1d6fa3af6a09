"""Tracked persists for operator-internal intermediates.

Several operators persist() a mid-plan DataFrame (LSH banded indexes,
inverted shingle indexes, candidate-pair sets) because it feeds two or
more consumers within the same returned plan. The operator itself can
never unpersist — the caller materializes the result lazily, after the
operator returned — so a bare persist() leaks cached partitions in a
long-lived session (one per invocation).

Every such persist goes through :func:`tracked_persist`; a session
owner (bench loop, test harness, notebook user) calls
:func:`release_persisted` once the result of a query is materialized.
``spark.catalog.clearCache()`` also works (it empties the whole
CacheManager) but is a larger hammer: it drops caches the CALLER
created too.

At 100 TB the same intermediates would be explicit checkpoints or
stored indexes with managed lifetimes; in-session pin-and-release is
the local analogue.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """persist() and register for later :func:`release_persisted`."""
    out = df.persist(level)
    _TRACKED.append(out)
    return out


def release_persisted() -> int:
    """Unpersist every tracked intermediate; returns how many were
    released. Safe to call at any time — releasing a DataFrame some
    plan still needs only costs recomputation, never correctness."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n
