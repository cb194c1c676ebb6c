"""Full driver-sim sweep: every registered query vs its DuckDB oracle.

The per-commit CI slice (tests/test_queries_oracle.py) covers ~1/8 of
the registry; this tool is the full-coverage pass the slice docstring
cites — run per round and commit the summary as SWEEP_r{N}.json:

    {"total": N, "oracle_green": N, "rows_only_ok": N,
     "failures": {name: reason}, "sf_dir": ..., "commit": ...,
     "elapsed_sec": ...}

Usage: python tools_sweep.py [round_number]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

from pyspark_movie_recommender_spark import queries as Q
from pyspark_movie_recommender_spark.session import get_spark
from tests.oracle import compare, duck_connection

SF = "/root/testdata/sf0.01"


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "04"
    spark = get_spark("sweep")
    con = duck_connection(SF)
    commit = subprocess.run(
        ["git", "log", "-1", "--format=%h"], capture_output=True, text=True
    ).stdout.strip()

    t0 = time.time()
    green = rows_only = 0
    failures: dict[str, str] = {}
    names = sorted(Q.QUERIES)
    for i, name in enumerate(names):
        try:
            df = Q.QUERIES[name](spark, SF)
            if name in Q.ORACLE_SQL:
                compare(df, con, Q.ORACLE_SQL[name], name)
                green += 1
            else:
                assert df.columns and df.limit(1).collect()
                rows_only += 1
        except Exception as e:  # noqa: BLE001 - sweep must finish
            failures[name] = f"{type(e).__name__}: {e}"[:300]
        if (i + 1) % 100 == 0:
            print(
                f"[{i + 1}/{len(names)}] green={green} rows_only={rows_only}"
                f" fail={len(failures)} ({time.time() - t0:.0f}s)",
                flush=True,
            )

    out = {
        "total": len(names),
        "oracle_green": green,
        "rows_only_ok": rows_only,
        "failures": failures,
        "sf_dir": SF,
        "commit": commit,
        "elapsed_sec": round(time.time() - t0, 1),
    }
    path = f"SWEEP_r{rnd}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(json.dumps({k: v for k, v in out.items() if k != "failures"}))
    print("failures:", len(failures), "->", path)
    # gate like tools_plan_audit (round-6): a failed query anywhere in
    # the registry must turn the round runner red, not just an artifact
    if failures:
        print(f"SWEEP FAILED: {sorted(failures)[:10]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
