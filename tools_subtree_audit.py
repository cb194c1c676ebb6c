"""Registry-wide duplicate-subtree census — gated from round 8 on.

Round 7 found one waste shape in six bench queries: a fact-sized
subtree consumed by several plan branches with no materialization at
the fan-out point, so the physical plan re-executes it once per
consumer. Round 8 burned the census down (173 flagged -> single
digits) by checkpointing the fan-out relations; this tool keeps the
regression door shut.

Census signals, per query, from the EXECUTED plan's tree text:

- ``py_ops``: occurrences of Python-stage operators
  (FlatMapCoGroupsInPandas / FlatMapGroupsInPandas / MapInPandas /
  ArrowEvalPython / BatchEvalPython);
- ``scans``: per-table parquet scan mentions;
- ``cached``: whether the plan contains an InMemoryRelation (a
  persist) or a ``Scan ExistingRDD`` leaf (the physical form of a
  ``ckpt()``-materialized LogicalRDD) — when true, the text counts
  INCLUDE cache/checkpoint recipe text that executes only once.

Flag rule: py_ops >= 2 or any single table scanned >= 4 times.
UNCACHED plans matching it flag HIGH confidence; CACHED plans
matching it flag LOW confidence (recipe text inflates their counts,
but a pathological cached plan can still hide waste, so it is
surfaced rather than suppressed; round-7 advice). Low flags ALSO run
the semantic fact-dup classifier — the round-8 close found 13 cached
flags whose recipes masked genuinely re-executed fact subtrees (the
text counts were recipe noise, but the OPTIMIZED logical plan still
held verbatim-duplicated compute-over-scan subtrees), so the census
records ``dup_fact``/``reused_exchanges`` for every flag, not only
the uncached ones.

Gate mode (``--gate``, run in the round battery): exits RED when
  (a) any HIGH-confidence flag is NOT in SUBTREE_ALLOWLIST.json
      (every allowlist entry carries a written why-this-plan-is-
      cheapest note), or
  (b) ANY flag — high or low — has more semantically-duplicated
      compute-over-scan subtrees than physical ReusedExchange nodes
      (plans.duplicate_fact_subtrees): a fact-sized duplicate is red
      even if allowlisted or partially cached.
The gate's classifiers are regression-tested in
tests/test_subtree_gate.py against injected plans (a 4-scan uncached
union, and a partially-cached plan hiding the same fan-out).

Writes SUBTREE_r{N}.json. Usage:
    python tools_subtree_audit.py <round> [--gate]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, ".")

from pyspark_movie_recommender_spark import queries as Q
from pyspark_movie_recommender_spark.plans import duplicate_fact_subtrees
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

ALLOWLIST_PATH = "SUBTREE_ALLOWLIST.json"


def census_one(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    cached = "InMemoryRelation" in plan or "Scan ExistingRDD" in plan
    py = sum(plan.count(op) for op in PY_OPS)
    scans = {
        t: c
        for t in TABLES
        if (c := len(re.findall(rf"{t}\.parquet", plan))) > 1
    }
    over = py >= 2 or any(c >= 4 for c in scans.values())
    return {
        "py_ops": py,
        "scans": scans,
        "cached": cached,
        "over_threshold": over,
    }


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "08"
    gate = "--gate" in sys.argv
    sf_dir = "/root/testdata/sf0.001"
    allow: dict[str, str] = {}
    if os.path.exists(ALLOWLIST_PATH):
        allow = json.load(open(ALLOWLIST_PATH))

    spark = get_spark()
    t0 = time.time()
    out: dict[str, dict] = {}
    high: list[str] = []
    low: list[str] = []
    red: list[str] = []
    for name, fn in Q.QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            rec = census_one(df)
        except Exception as e:  # construction failures belong to planaudit
            out[name] = {"error": str(e)[:120]}
            continue
        if rec["over_threshold"]:
            if rec["cached"]:
                low.append(name)
                rec["flag"] = "low"
            else:
                high.append(name)
                rec["flag"] = "high"
                if gate and name not in allow:
                    red.append(f"{name}: high-confidence flag not allowlisted")
            # the fact-dup classifier runs on EVERY flag: cached plans
            # can hide re-executed fact subtrees behind recipe text
            # (round-8 close found 13 such), and a fact-sized verbatim
            # duplicate is red regardless of confidence tier
            dup, reused = duplicate_fact_subtrees(df)
            rec["dup_fact"], rec["reused_exchanges"] = dup, reused
            if gate and dup > reused:
                red.append(
                    f"{name}: {dup} duplicated compute-over-scan "
                    f"subtrees vs {reused} reused exchanges"
                    f" ({rec['flag']}-confidence flag)"
                )
        if rec["py_ops"] or rec["scans"]:
            out[name] = rec
    commit = subprocess.run(
        ["git", "log", "-1", "--format=%h"], capture_output=True, text=True
    ).stdout.strip()
    stale = sorted(set(allow) - set(high)) if gate else []
    art = {
        "commit": commit,
        "elapsed_sec": round(time.time() - t0, 1),
        "queries_walked": len(Q.QUERIES),
        "flagged_high": sorted(high),
        "flagged_high_count": len(high),
        "flagged_low": sorted(low),
        "flagged_low_count": len(low),
        "allowlist_stale_entries": stale,
        "gate": {"enabled": gate, "red": red},
        "details": out,
        "note": (
            "gated duplicate-subtree census; high = uncached over "
            "threshold (gated vs SUBTREE_ALLOWLIST.json), low = cached "
            "over threshold (counts include one-shot cache/ckpt recipe "
            "text); EVERY flag carries dup_fact/reused_exchanges from "
            "the semantic classifier and dup_fact > reused_exchanges "
            "is gate-red at either confidence tier"
        ),
    }
    path = f"SUBTREE_r{rnd}.json"
    with open(path, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                k: art[k]
                for k in (
                    "queries_walked",
                    "flagged_high_count",
                    "flagged_low_count",
                    "elapsed_sec",
                )
            }
        ),
        "->",
        path,
    )
    print("high:", sorted(high))
    if gate and red:
        print("SUBTREE GATE RED:")
        for r in red:
            print(" -", r)
        sys.exit(1)
    if gate:
        print("SUBTREE GATE GREEN")


if __name__ == "__main__":
    main()
