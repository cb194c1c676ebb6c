"""Registry-wide plan audit: fact-sized unpartitioned-Window census.

Builds EVERY registered query's logical plan at a small SF (plans are
data-size-independent; sf0.001 keeps the eager ckpt() sites cheap) and
classifies each empty-partitionSpec Window with
``plans.unpartitioned_windows``. The engine's 100 TB contract is
fact_sized == 0 across the whole registry — a global window may only
run over a cardinality-reduced input (post-aggregate, literal grid,
pinned-id lookup, or a checkpointed reduced relation).

Writes PLANAUDIT_r{N}.json:

    {"sf_dir": ..., "queries": N, "built_ok": N, "build_errors": {...},
     "global_windows_total": N, "fact_sized_total": N,
     "offenders": {name: fact_sized_count}}

Usage:
    python tools_plan_audit.py [round_number]
    SPARK_GRAFT_AUDIT_SLICE=k python tools_plan_audit.py   # 1/8 slice
"""

from __future__ import annotations

import json
import os
import sys
import zlib

from pyspark_movie_recommender_spark import queries as Q
from pyspark_movie_recommender_spark.plans import unpartitioned_windows
from pyspark_movie_recommender_spark.session import get_spark


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "04"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("plan-audit")
    names = sorted(Q.QUERIES)
    env = os.environ.get("SPARK_GRAFT_AUDIT_SLICE")
    if env is not None:
        k = int(env) % 8
        names = [n for n in names if zlib.crc32(n.encode()) % 8 == k]

    offenders: dict[str, int] = {}
    errors: dict[str, str] = {}
    total_gw = total_fact = built = 0
    for i, name in enumerate(names):
        try:
            df = Q.QUERIES[name](spark, sf_dir)
            gw, fact = unpartitioned_windows(df)
        except Exception as e:  # noqa: BLE001 - census must finish
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            continue
        built += 1
        total_gw += gw
        total_fact += fact
        if fact:
            offenders[name] = fact
        if (i + 1) % 100 == 0:
            print(f"[{i + 1}/{len(names)}] gw={total_gw} fact={total_fact}",
                  flush=True)

    out = {
        "sf_dir": sf_dir,
        "queries": len(names),
        "built_ok": built,
        "build_errors": errors,
        "global_windows_total": total_gw,
        "fact_sized_total": total_fact,
        "offenders": offenders,
    }
    path = f"PLANAUDIT_r{rnd}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(json.dumps({k: v for k, v in out.items() if k != "build_errors"}))
    print("errors:", len(errors), "->", path)
    # GATE, not just artifact (round-5 verdict ask #2): the census must
    # fail red — a fact-sized window anywhere in the registry, or a
    # query whose plan no longer builds, is a broken 100 TB contract.
    if total_fact or errors:
        print(
            f"PLAN AUDIT FAILED: fact_sized_total={total_fact}, "
            f"build_errors={len(errors)}"
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
