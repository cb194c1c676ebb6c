"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is materialized through the ``noop`` datasource sink — the
whole plan executes distributed (no driver collect, no count() shortcut
that would let Catalyst prune the projections being measured).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_movie_recommender_spark import get_spark
from pyspark_movie_recommender_spark import queries as Q

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else float("nan")


def rig_canary() -> float:
    """Seconds for a fixed single-process NumPy matmul (~0.3 s when the
    host is quiet). The bench box is a shared VM with hour-scale 3-24x
    throughput swings (BENCH_NOTES_r08.md); carrying the canary in the
    output line makes every bench run self-diagnosing — a consumer can
    tell 'engine regressed' from 'host was degraded' without access to
    the builder's median artifacts. ADDITIVE key only: the metric /
    value / unit / queries / sf contract is unchanged.
    """
    import numpy as np

    a = np.arange(2000 * 2000, dtype="float64").reshape(2000, 2000) / 1e6
    t0 = time.time()
    for _ in range(3):
        a = a @ a / 1e3
    return round(time.time() - t0, 3)


def main() -> None:
    canary_pre = rig_canary()
    spark = get_spark("bench")
    # warm the JVM/codegen paths on the tiny SF so measured times are query
    # cost, not first-call JIT
    # JVM/codegen warm + Python-worker (Arrow UDF) warm, so measured
    # times are query cost, not first-call JIT or worker fork
    for wq in ("pricing_summary", "doc_fingerprints"):
        Q.QUERIES[wq](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    from pyspark_movie_recommender_spark.operators.cache import release_all

    import gc

    times: dict[str, float] = {}
    for name in Q.BENCH_QUERIES:
        # timer covers construction too: iterative queries execute their
        # eager localCheckpoint rounds while the DataFrame is being built,
        # and that work must not escape the measurement
        t0 = time.perf_counter()
        df = Q.QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
        release_all()  # drop per-query cached sketches (LSH signature tables)
        # free localCheckpoint blocks of the iterative queries: the
        # ContextCleaner only reclaims them once the Python refs die and
        # a GC cycle runs — without this, blocks pile up across the
        # suite and later queries pay the memory pressure (observed 3-4×
        # inflation on the queries that run after the graph loops)
        df = None
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf_of(SF_DIR),
                "rig_canary_sec": [canary_pre, rig_canary()],
            }
        )
    )


if __name__ == "__main__":
    main()
