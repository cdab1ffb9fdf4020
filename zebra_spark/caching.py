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

Thread model (ADVICE r6): the parity sweep and the bench suite run
queries CONCURRENTLY.  A cache_scope() must therefore release exactly
the frames registered by ITS OWN scope — never another thread's
in-flight persists (a global length-mark pop could unpersist e.g.
PageRank's iteration caches mid-query, degrading them to recompute).
Scopes are thread-local; tracked_persist() inside an active scope on
the same thread registers with that scope, otherwise with the global
lock-guarded list that release_caches() drains.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: list[DataFrame] = []  # frames registered outside any scope
_SCOPES = threading.local()  # per-thread stack of scope lists


def _scope_stack() -> list[list[DataFrame]]:
    stack = getattr(_SCOPES, "stack", None)
    if stack is None:
        stack = _SCOPES.stack = []
    return stack


def _unpersist(df: DataFrame) -> None:
    try:
        df.unpersist(blocking=False)
    except Exception:  # session already stopped — nothing to free
        pass


@contextmanager
def cache_scope():
    """Release every tracked_persist() registered INSIDE the scope (on
    this thread) when it exits — for build steps (e.g. dedup.pair_table)
    whose terminal action happens inside the scope, so their internal
    caches must not wait for the caller's harness-level
    release_caches().  Scopes nest (derived-table builds read other
    derived tables); each releases only its own registrations."""
    scope: list[DataFrame] = []
    _scope_stack().append(scope)
    try:
        yield
    finally:
        _scope_stack().pop()
        for df in reversed(scope):
            _unpersist(df)


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() (default MEMORY_AND_DISK) and register for release with
    the innermost active cache_scope on this thread, else globally."""
    df = df.persist()
    stack = _scope_stack()
    if stack:
        stack[-1].append(df)
    else:
        with _LOCK:
            _TRACKED.append(df)
    return df


def release_caches() -> int:
    """unpersist(blocking=False) every globally tracked frame; returns
    the count.  Frames registered inside a live cache_scope (any thread)
    are left to their scope.  Safe with no active caches or after
    session restart."""
    with _LOCK:
        drained = list(_TRACKED)
        _TRACKED.clear()
    for df in reversed(drained):
        _unpersist(df)
    return len(drained)
