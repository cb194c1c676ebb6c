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
                        "ratio": r}},
     "max_query_ratio": ..., "median_query_ratio": ..., "commit": ...}

Usage: python tools_bench_sf1.py [round] [n_runs] [sf1_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


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
    queries = {}
    ratios = []
    for q in runs[0]["queries"]:
        med = round(statistics.median(r["queries"][q] for r in runs), 3)
        base = sf01["queries"].get(q, {}).get("median")
        ratio = round(med / base, 2) if base else None
        if ratio is not None:
            ratios.append(ratio)
        queries[q] = {
            "sf1_median": med,
            "runs": [r["queries"][q] for r in runs],
            "sf01_median": base,
            "ratio": ratio,
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


if __name__ == "__main__":
    main()
