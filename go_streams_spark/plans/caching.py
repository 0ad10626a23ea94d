"""Tracked persistence: library operators that must pin ONE
materialization of a nondeterministic subtree (range shuffles feeding
two consumer branches, LSH band tables probed twice) register their
persisted DataFrames here so long-lived sessions (bench loops, repeated
query invocations) can reclaim executor memory between queries instead
of accumulating dead caches.

Usage::

    part = track_persist(part)            # inside an operator
    ...
    release_tracked()                     # bench/tests, between queries

Call ``release_tracked`` only BETWEEN queries (after the action that
consumed the pinned DataFrame): the pins are correctness devices for
nondeterministic subtrees (range exchanges feeding two branches), so
releasing one before its query's first action re-exposes the divergent
re-evaluation the persist exists to prevent.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track_persist(df: DataFrame,
                  level: StorageLevel = StorageLevel.MEMORY_AND_DISK
                  ) -> DataFrame:
    """Persist ``df`` and remember the handle for ``release_tracked``."""
    df.persist(level)
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked DataFrame; returns how many were freed."""
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to free
    _TRACKED.clear()
    return n
