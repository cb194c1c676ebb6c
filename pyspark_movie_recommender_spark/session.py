"""SparkSession factory with scale-aware defaults.

The reference (``/root/reference/recommender.py``) assumes a live ``sc``
from the PySpark shell and never configures anything. Here we own the
session and pin the configs that matter for both local correctness runs
and a 1000-executor / 100 TB deployment:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing);
- shuffle partitions sized to the local core count (not the 200 default) —
  on a real cluster this would be ~2-3x total executor cores, and AQE
  coalesces down from there;
- UTC session timezone so timestamp semantics match the DuckDB oracle;
- Arrow enabled for every pandas-UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# local[N]: honour the driver's CPU budget, default to all cores.
_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "*")


def get_spark(
    app_name: str = "pyspark_movie_recommender_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``shuffle_partitions`` defaults to the local parallelism — on a real
    cluster, pass ~2-3x the total executor cores; AQE coalesces small
    post-shuffle partitions automatically either way.
    """
    if shuffle_partitions is None:
        cpus = (os.cpu_count() or 8) if _CPUS == "*" else int(_CPUS)
        shuffle_partitions = max(int(cpus), 8)

    # transformWithState speaks protobuf in every Python process Spark
    # spawns. Fix the DRIVER's import path here (pure sys.path, no env
    # mutation); the worker-side shim is wired per-session via
    # sc.environment below — scoping it there (round-6 advice) keeps
    # the shim sitecustomize out of unrelated subprocesses the driver
    # spawns. No-op where no runtime exists.
    from pyspark_movie_recommender_spark.streaming.protobuf_compat import (
        enable_for_session,
        ensure_protobuf,
    )

    ensure_protobuf()

    builder = (
        SparkSession.builder.master(f"local[{_CPUS}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # reliable-checkpoint mode (SPARK_GRAFT_CHECKPOINT_DIR): let the
        # ContextCleaner reap checkpoint files for out-of-scope RDDs so
        # a long run's ~290 truncation sites don't grow the dir forever
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    enable_for_session(spark)
    return spark
