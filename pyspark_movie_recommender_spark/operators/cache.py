"""Tracked persist(): cached sketch/signature tables with a release hook.

LSH-family operators persist their signature table so multi-branch plans
(band keys + two re-attach joins) compute the signature UDF once. Spark's
CacheManager holds persisted plans until an explicit unpersist — repeated
registry runs in one session would otherwise accumulate dead cached
blocks (the BlockManager re-add warnings seen in round-1 bench runs).

``track`` registers each persisted DataFrame; ``release_all`` unpersists
everything tracked. bench.py drains after every timed query; long-lived
sessions (driver correctness sweeps) can drain between queries the same
way. On a real cluster the equivalent artifact is a checkpointed sketch
TABLE with storage-level lifecycle, not executor cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register the handle for later release."""
    _LIVE.append(df.persist())
    return df


def release_all() -> int:
    """Unpersist every tracked DataFrame; returns how many were released.

    Safe to call while no tracked frames exist; blocking=False so release
    never stalls the caller.
    """
    n = 0
    while _LIVE:
        _LIVE.pop().unpersist(blocking=False)
        n += 1
    return n
