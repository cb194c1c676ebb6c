"""Run bench.py N times and record per-query MEDIANS.

This box's run-to-run variance is ±30% (SURVEY §6), so single-run
totals cannot distinguish plan regressions from rig noise — the
round-2/3 verdicts both asked for an n-run median artifact. Each run
is a fresh process (cold session, same as the driver's bench), run
back-to-back on a quiet box.

Writes BENCH_MEDIANS_r{N}.json:
    {"runs": N, "totals": [...], "median_total": ...,
     "queries": {name: {"median": s, "runs": [...]}}, "sf": ..., "commit": ...}

Usage: python tools_bench_medians.py [round] [n_runs]
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "04"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    runs: list[dict] = []
    for i in range(n):
        out = subprocess.run(
            [sys.executable, "bench.py"], capture_output=True, text=True
        )
        line = [
            ln for ln in out.stdout.splitlines() if ln.startswith('{"metric"')
        ][-1]
        runs.append(json.loads(line))
        print(f"run {i + 1}/{n}: total={runs[-1]['value']}s", flush=True)

    commit = subprocess.run(
        ["git", "log", "-1", "--format=%h"], capture_output=True, text=True
    ).stdout.strip()
    names = runs[0]["queries"].keys()

    def iqr(vals: list[float]) -> float:
        # per-query noise floor for the drift tripwire (round-6 ask #3):
        # interquartile range via statistics.quantiles (n>=2 runs)
        if len(vals) < 2:
            return 0.0
        q1, _, q3 = statistics.quantiles(vals, n=4, method="inclusive")
        return round(q3 - q1, 3)

    queries = {
        q: {
            "median": round(
                statistics.median(r["queries"][q] for r in runs), 3
            ),
            "iqr": iqr([r["queries"][q] for r in runs]),
            "runs": [r["queries"][q] for r in runs],
        }
        for q in names
    }
    out = {
        "runs": n,
        "totals": [r["value"] for r in runs],
        # median of RUN TOTALS (round-over-round comparable to any
        # single-run total). The per-query-median sum is kept under an
        # honest name — it was previously (mis)recorded as
        # median_total (round-4 advice).
        "median_total": round(
            statistics.median(r["value"] for r in runs), 3
        ),
        "sum_of_query_medians": round(
            sum(v["median"] for v in queries.values()), 3
        ),
        "total_iqr": iqr([r["value"] for r in runs]),
        "queries": queries,
        "sf": runs[0]["sf"],
        "commit": commit,
    }
    path = f"BENCH_MEDIANS_r{rnd}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(
        json.dumps(
            {k: v for k, v in out.items() if k != "queries"}
        ),
        "->",
        path,
    )


if __name__ == "__main__":
    main()
