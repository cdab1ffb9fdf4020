"""Tracked persist() for query-internal materialization.

Query functions return LAZY DataFrames, so a persist() inside a query
body cannot be unpersisted before the caller's terminal action — but
never unpersisting means cached signature/tokset/block partitions
accumulate in executor storage across a bench sweep or a long session,
and MEMORY_AND_DISK then degrades later queries by eviction/spill
(ADVICE r4).  Every internal persist goes through tracked_persist();
harnesses call release_caches() after each query's terminal action
(bench.py does, per timed query; the pytest parity sweep releases after
materializing).  Spark's cache manager keys entries by canonicalized
plan, so re-running a query after release simply re-creates one entry.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


@contextmanager
def cache_scope():
    """Release every tracked_persist() registered INSIDE the scope when
    it exits — for build steps (e.g. dedup.pair_table) whose terminal
    action happens inside the scope, so their internal caches must not
    wait for the caller's harness-level release_caches()."""
    mark = len(_TRACKED)
    try:
        yield
    finally:
        while len(_TRACKED) > mark:
            df = _TRACKED.pop()
            try:
                df.unpersist(blocking=False)
            except Exception:  # session already stopped — nothing to free
                pass


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() (default MEMORY_AND_DISK) and register for release."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_caches() -> int:
    """unpersist(blocking=False) every tracked frame; returns the count.
    Safe to call with no active caches or after session restart."""
    n = len(_TRACKED)
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:  # session already stopped — nothing to free
            pass
    return n
