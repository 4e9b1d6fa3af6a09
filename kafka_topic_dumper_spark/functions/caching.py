"""Tracked persists for operator-internal intermediates.

Several operators persist() a mid-plan DataFrame (LSH banded indexes,
inverted shingle indexes, candidate-pair sets) because it feeds two or
more consumers within the same returned plan. The operator itself can
never unpersist — the caller materializes the result lazily, after the
operator returned — so a bare persist() leaks cached partitions in a
long-lived session (one per invocation).

Every such persist goes through :func:`tracked_persist`; a session
owner (bench loop, test harness, notebook user) scopes a query with
:func:`operator_caches` — everything an operator pinned inside the
block is released on exit, even on error — or calls
:func:`release_persisted` manually. ``spark.catalog.clearCache()``
also works (it empties the whole CacheManager) but is a larger
hammer: it drops caches the CALLER created too.

At 100 TB the same intermediates would be explicit checkpoints or
stored indexes with managed lifetimes; in-session pin-and-release is
the local analogue.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """persist() and register for release by the enclosing
    :func:`operator_caches` scope (or a manual
    :func:`release_persisted`)."""
    out = df.persist(level)
    _TRACKED.append(out)
    return out


def release_persisted(mark: int = 0) -> int:
    """Unpersist tracked intermediates registered at stack position
    ``mark`` or later (default: all); returns how many were released.
    Safe to call at any time — releasing a DataFrame some plan still
    needs only costs recomputation, never correctness."""
    n = 0
    while len(_TRACKED) > mark:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n


@contextmanager
def operator_caches():
    """Scope for operator-internal persists: releases exactly the
    caches registered INSIDE the block (LIFO), even on error, leaving
    caches pinned by outer scopes untouched — so a caller that forgets
    a manual release can't leak cached partitions across queries in a
    long-lived session. Nests cleanly.

    >>> with operator_caches():
    ...     force(QUERIES["dedup_minhash_lsh"](spark, sf))
    """
    mark = len(_TRACKED)
    try:
        yield
    finally:
        release_persisted(mark)
