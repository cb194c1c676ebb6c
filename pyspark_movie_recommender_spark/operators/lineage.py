"""Lineage truncation with a cluster-safe switch.

Iterative and multi-reference queries truncate lineage so Catalyst
replans from materialized results instead of an ever-growing DAG. On
local[n] an EAGER ``localCheckpoint`` is right: executor-local blocks,
no filesystem round-trip. On a real cluster localCheckpoint is
lost-executor-fatal — the blocks live only in executor storage — so
production runs set ``SPARK_GRAFT_CHECKPOINT_DIR`` (HDFS/object-store
path) and every truncation point becomes a RELIABLE ``checkpoint``
that survives executor loss, matching the ``checkpoint_dir`` pattern
``operators/graph.py`` already exposes for its BSP loops.

Usage: ``df.transform(ckpt)`` anywhere a bare
``df.localCheckpoint(eager=True)`` would appear — one flag flips the
whole engine.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_ENV = "SPARK_GRAFT_CHECKPOINT_DIR"


def ckpt(df: DataFrame) -> DataFrame:
    """Eagerly truncate ``df``'s lineage.

    Reliable ``checkpoint`` into ``$SPARK_GRAFT_CHECKPOINT_DIR`` when
    that env var is set (cluster-safe); executor-local
    ``localCheckpoint`` otherwise (fast local default).
    """
    target = os.environ.get(_ENV)
    if target:
        sc = df.sparkSession.sparkContext
        sc.setCheckpointDir(target)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
