"""Interleaved A/B mini-bench for candidate rewrites (round 9).

Runs a SUBSET of bench queries with exactly bench.py's methodology
(fresh process per invocation, sf0.001 warm-up, noop sink, tracked-cache
drain + GC between queries) and prints one JSON line. Variant selection
is via SPARK_GRAFT_AB_LEGACY (comma tags understood by the gated
queries); the orchestrating shell alternates HEAD/legacy processes so
host drift hits both sides of every rep (the ABBENCH_r08 pattern).

Usage: python tools_ab_quick.py q1,q2,... [sf_dir]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tools_bench_medians import rig_canary


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    canary_pre = rig_canary()

    from pyspark_movie_recommender_spark import get_spark
    from pyspark_movie_recommender_spark import queries as Q
    from pyspark_movie_recommender_spark.operators.cache import release_all

    spark = get_spark("ab_quick")
    for wq in ("pricing_summary", "doc_fingerprints"):
        Q.QUERIES[wq](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()

    times: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = Q.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
        release_all()
        df = None
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    print(
        json.dumps(
            {
                "variant": os.environ.get("SPARK_GRAFT_AB_LEGACY", "HEAD")
                or "HEAD",
                "sf_dir": sf_dir,
                "canary_pre": canary_pre,
                "canary_post": rig_canary(),
                "queries": times,
            }
        )
    )


if __name__ == "__main__":
    main()
