"""n=3 sf1 bench: the scale-smoke artifact with medians, not a single run.

Round-4 verdict ask #1: the sf1 evidence was single-run on a ±30% rig,
so per-query ratios like 2.8×/5.85× were fuzzy. This tool runs the full
bench suite N times at the synthesized sf1 (build it first with
``python tools_make_sf1.py /tmp/sf1``), composes per-query medians, and
records each query's ratio against the same-round sf0.1 medians
(BENCH_MEDIANS_r{N}.json must exist — run tools_bench_medians.py first
on the same commit).

Writes BENCH_SF1_r{N}.json:
    {"runs": N, "sf1_totals": [...], "sf1_median_total": ...,
     "queries": {name: {"sf1_median": s, "runs": [...], "sf01_median": s,
                        "ratio": r, "plan": "plan_same|plan_changed|..."}},
     "max_query_ratio": ..., "median_query_ratio": ..., "commit": ...}

Also writes PLANHASHES_SF1_r{N}.json (round-7 verdict stretch ask #7):
the same normalized plan hashes tools_bench_compare.py records at
sf0.1, computed AGAINST THE SF1 DATA, so an sf1 mover next round
classifies as plan_changed vs rig noise for free — sf1 plans can
differ from sf0.1 plans (row hints, routing census, AQE thresholds),
so the sf0.1 hash file cannot stand in.

Usage: python tools_bench_sf1.py [round] [n_runs] [sf1_dir]
"""

from __future__ import annotations

import json
import os
import re
import statistics
import subprocess
import sys

# Scale budgets (round-6 verdict ask #6): the sf1 run is a GATE, not a
# courtesy artifact. 10x data must cost <= TOTAL_BUDGET x total time,
# and no single query may scale worse than QUERY_BUDGET x without a
# written attribution (its name mentioned in BENCH_NOTES_r{N}.md).
TOTAL_BUDGET = 3.0
QUERY_BUDGET = 10.0


def check_scale_budget(out: dict, notes_text: str) -> list[str]:
    """Return the list of budget violations for a BENCH_SF1 artifact.

    - total_ratio_for_10x_data > TOTAL_BUDGET is always a violation;
    - a query ratio > QUERY_BUDGET is a violation unless the query
      name appears (word-bounded) in the round's BENCH_NOTES text —
      a written attribution, the same contract the drift tripwire uses.
    """
    problems: list[str] = []
    total = out.get("total_ratio_for_10x_data")
    if total is not None and total > TOTAL_BUDGET:
        problems.append(
            f"total ratio {total} > {TOTAL_BUDGET}x budget for 10x data"
        )
    for q, rec in sorted(out.get("queries", {}).items()):
        ratio = rec.get("ratio")
        if ratio is None or ratio <= QUERY_BUDGET:
            continue
        if re.search(rf"\b{re.escape(q)}\b", notes_text):
            continue  # attributed in the notes
        problems.append(
            f"{q} scales {ratio}x > {QUERY_BUDGET}x with no attribution"
            f" in BENCH_NOTES"
        )
    return problems


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "05"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf1_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1"

    with open(f"BENCH_MEDIANS_r{rnd}.json") as f:
        sf01 = json.load(f)

    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf1_dir)
    runs: list[dict] = []
    for i in range(n):
        out = subprocess.run(
            [sys.executable, "bench.py"], capture_output=True, text=True, env=env
        )
        line = [
            ln for ln in out.stdout.splitlines() if ln.startswith('{"metric"')
        ][-1]
        runs.append(json.loads(line))
        print(f"sf1 run {i + 1}/{n}: total={runs[-1]['value']}s", flush=True)

    commit = subprocess.run(
        ["git", "log", "-1", "--format=%h"], capture_output=True, text=True
    ).stdout.strip()

    # per-query plan hashes AT SF1 (stretch ask #7): same normalizer
    # and built-twice stability rule as tools_bench_compare.py, but
    # against the sf1 data so hint/census-dependent plan differences
    # are captured; movers next round classify against this file
    from pyspark_movie_recommender_spark import get_spark
    from tools_bench_compare import stable_hash

    spark = get_spark("bench-sf1-hashes")
    hashes = {q: stable_hash(spark, sf1_dir, q) for q in sorted(runs[0]["queries"])}
    with open(f"PLANHASHES_SF1_r{rnd}.json", "w") as f:
        json.dump(hashes, f, indent=2, sort_keys=True)
    prev = f"{int(rnd) - 1:02d}"
    prior_hashes: dict = {}
    if os.path.exists(f"PLANHASHES_SF1_r{prev}.json"):
        prior_hashes = json.load(open(f"PLANHASHES_SF1_r{prev}.json"))

    queries = {}
    ratios = []
    for q in runs[0]["queries"]:
        med = round(statistics.median(r["queries"][q] for r in runs), 3)
        base = sf01["queries"].get(q, {}).get("median")
        ratio = round(med / base, 2) if base else None
        if ratio is not None:
            ratios.append(ratio)
        h_now, h_then = hashes.get(q), prior_hashes.get(q)
        if q not in prior_hashes:
            plan_cls = "no_prior_hash"
        elif h_now is not None and h_now == h_then:
            plan_cls = "plan_same"
        elif h_now is None or h_then is None:
            plan_cls = "hash_unstable"
        else:
            plan_cls = "plan_changed"
        queries[q] = {
            "sf1_median": med,
            "runs": [r["queries"][q] for r in runs],
            "sf01_median": base,
            "ratio": ratio,
            "plan": plan_cls,
        }
    out = {
        "runs": n,
        "sf1_dir": sf1_dir,
        "sf1_totals": [r["value"] for r in runs],
        "sf1_median_total": round(
            statistics.median(r["value"] for r in runs), 3
        ),
        "sf01_median_total": sf01["median_total"],
        "total_ratio_for_10x_data": round(
            statistics.median(r["value"] for r in runs) / sf01["median_total"], 2
        ),
        "max_query_ratio": max(ratios),
        "median_query_ratio": round(statistics.median(ratios), 2),
        "queries": queries,
        "commit": commit,
        "note": (
            "sf1 synthesized from sf0.1 by tools_make_sf1.py (10x replication, "
            "per-replica key offsets, near-dup-breaking text tags); n-run "
            "medians, fresh process per run, local[32], noop sink"
        ),
    }
    path = f"BENCH_SF1_r{rnd}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(
        json.dumps({k: v for k, v in out.items() if k != "queries"}),
        "->",
        path,
    )

    notes_path = f"BENCH_NOTES_r{rnd}.md"
    notes = ""
    if os.path.exists(notes_path):
        with open(notes_path) as f:
            notes = f.read()
    problems = check_scale_budget(out, notes)
    if problems:
        print("SF1 SCALE GATE RED:")
        for pr in problems:
            print(" -", pr)
        sys.exit(1)
    print(
        f"sf1 scale gate green: total {out['total_ratio_for_10x_data']}x"
        f" <= {TOTAL_BUDGET}x, max query {out['max_query_ratio']}x"
    )


if __name__ == "__main__":
    main()
