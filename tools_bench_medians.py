"""Run bench.py N times and record per-query MEDIANS.

This box's run-to-run variance is ±30% (SURVEY §6), so single-run
totals cannot distinguish plan regressions from rig noise — the
round-2/3 verdicts both asked for an n-run median artifact. Each run
is a fresh process (cold session, same as the driver's bench), run
back-to-back on a quiet box.

Writes BENCH_MEDIANS_r{N}.json:
    {"runs": N, "totals": [...], "median_total": ...,
     "queries": {name: {"median": s, "runs": [...]}}, "sf": ..., "commit": ...,
     "rig_canary_sec": [...]}

The rig canary (round 8): this box is a VM on a shared host whose
throughput varies by the hour — round 8 watched UNTOUCHED plan_same
queries inflate >1.5x while a fixed NumPy workload slowed by the same
factor. Each bench run is therefore bracketed by a fixed
single-process matmul timing; the recorded canary seconds let a later
round (or the drift tripwire's reader) separate 'the code got slower'
from 'the host was slower that hour' with evidence instead of vibes.

Usage: python tools_bench_medians.py [round] [n_runs]
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time


def rig_canary() -> float:
    """Seconds for a fixed CPU-bound workload (NumPy matmul) — a
    host-noise probe run before each bench rep. Deterministic input,
    single process; ~0.3 s on this box when quiet."""
    import numpy as np

    a = np.arange(2000 * 2000, dtype="float64").reshape(2000, 2000) / 1e6
    t0 = time.time()
    for _ in range(3):
        a = a @ a / 1e3
    return round(time.time() - t0, 3)


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "04"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    runs: list[dict] = []
    canaries: list[float] = []
    for i in range(n):
        canaries.append(rig_canary())
        out = subprocess.run(
            [sys.executable, "bench.py"], capture_output=True, text=True
        )
        line = [
            ln for ln in out.stdout.splitlines() if ln.startswith('{"metric"')
        ][-1]
        runs.append(json.loads(line))
        print(
            f"run {i + 1}/{n}: total={runs[-1]['value']}s"
            f" (canary {canaries[-1]}s)",
            flush=True,
        )

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
        "rig_canary_sec": canaries,
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
