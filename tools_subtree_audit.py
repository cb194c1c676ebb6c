"""Registry-wide duplicate-subtree census (advisory, not a gate).

Round 7 found the same waste shape in six queries: a fact-sized
subtree consumed by several plan branches with no materialization at
the fan-out point, so the physical plan re-executes it once per
consumer (mattson's n-aggregate re-ran the whole Arrow cogroup scan;
shapley's v0/v1 + efficiency total ran the 3-day range join four
times). This tool walks EVERY registry query's executed plan and
records the smell signals so the next round starts from a ranked
list instead of rediscovering them:

- ``py_ops``: occurrences of Python-stage operators
  (FlatMapCoGroupsInPandas / FlatMapGroupsInPandas / MapInPandas /
  ArrowEvalPython / BatchEvalPython) in the executed plan's tree form;
- ``scans``: per-table parquet scan mentions;
- ``cached``: whether the plan contains an InMemoryRelation (a
  ``track()`` persist) or LogicalRDD (a ``ckpt``) — when true, the
  text counts INCLUDE cache recipes that execute only once, so the
  signal is advisory only for those queries.

Flagging rule (advisory): py_ops >= 2 without caching, or any single
table scanned >= 4 times without caching. False positives are
possible (a twice-scanned dimension can be the cheapest plan); the
point is a short review list, not a red gate.

Writes SUBTREE_r{N}.json. Usage: python tools_subtree_audit.py <round>
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import time

sys.path.insert(0, ".")

from pyspark_movie_recommender_spark import queries as Q
from pyspark_movie_recommender_spark.session import get_spark

PY_OPS = (
    "FlatMapCoGroupsInPandas",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "ArrowEvalPython",
    "BatchEvalPython",
)
TABLES = (
    "lineitem",
    "orders",
    "customer",
    "supplier",
    "part",
    "events",
    "documents",
    "embeddings",
)


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "07"
    sf_dir = "/root/testdata/sf0.001"
    spark = get_spark()
    t0 = time.time()
    out: dict[str, dict] = {}
    flagged: list[str] = []
    for name, fn in Q.QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # construction failures belong to planaudit
            out[name] = {"error": str(e)[:120]}
            continue
        cached = "InMemoryRelation" in plan or "Scan ExistingRDD" in plan
        py = sum(plan.count(op) for op in PY_OPS)
        scans = {
            t: c
            for t in TABLES
            if (c := len(re.findall(rf"{t}\.parquet", plan))) > 1
        }
        rec = {"py_ops": py, "scans": scans, "cached": cached}
        if not cached and (py >= 2 or any(c >= 4 for c in scans.values())):
            flagged.append(name)
            rec["flag"] = True
        if py or scans:
            out[name] = rec
    commit = subprocess.run(
        ["git", "log", "-1", "--format=%h"], capture_output=True, text=True
    ).stdout.strip()
    art = {
        "commit": commit,
        "elapsed_sec": round(time.time() - t0, 1),
        "queries_walked": len(Q.QUERIES),
        "flagged_uncached": sorted(flagged),
        "flagged_count": len(flagged),
        "details": out,
        "note": (
            "advisory census of duplicate-subtree smells; cached=true "
            "entries include persist/ckpt recipe text that executes once "
            "— see tool docstring for the flagging rule"
        ),
    }
    path = f"SUBTREE_r{rnd}.json"
    with open(path, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {k: art[k] for k in ("queries_walked", "flagged_count", "elapsed_sec")}
        ),
        "->",
        path,
    )
    print("flagged:", sorted(flagged))


if __name__ == "__main__":
    main()
