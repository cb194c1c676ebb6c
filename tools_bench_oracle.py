"""Strict-oracle battery for the BENCH headliners (round-9 verdict ask #7).

The driver's fixed 50-query oracle set does not include every bench
headliner, so a rewrite of a bench query could previously land with
sweep-only coverage that is a commit stale (round-8 verdict, coverage
caveat). This tool mirrors ALL 34 bench queries through the same strict
comparator the sweep uses (`tests/oracle.compare`: rows + schema +
order-insensitive normalized multiset) at the commit it runs on, and
records the result per query:

    {"commit": ..., "sf_dir": ..., "elapsed_sec": ...,
     "results": {name: "oracle_green" | "rows_only_ok (no_oracle)"
                        | "FAIL: ..."}}

Bench queries without DuckDB oracles (the approximate/LSH family) get
the rows-only executability check here; their semantic coverage is the
law gate (tools_laws.py), same split as the driver's CORRECTNESS file.

Run per round at the FINAL tree and commit BENCHORACLE_r{N}.json in the
same commit as the code it validates.

Usage: python tools_bench_oracle.py [round_number] [sf_dir]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

from pyspark_movie_recommender_spark import queries as Q
from pyspark_movie_recommender_spark.session import get_spark
from tests.oracle import compare, duck_connection


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "09"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark("bench-oracle")
    con = duck_connection(sf)
    commit = subprocess.run(
        ["git", "log", "-1", "--format=%h"], capture_output=True, text=True
    ).stdout.strip()
    dirty = bool(
        subprocess.run(
            ["git", "status", "--porcelain"], capture_output=True, text=True
        ).stdout.strip()
    )

    t0 = time.time()
    results: dict[str, str] = {}
    n_green = n_rows_only = n_fail = 0
    for name in Q.BENCH_QUERIES:
        try:
            df = Q.QUERIES[name](spark, sf)
            if name in Q.ORACLE_SQL:
                compare(df, con, Q.ORACLE_SQL[name], name)
                results[name] = "oracle_green"
                n_green += 1
            else:
                assert df.columns and df.limit(1).collect()
                results[name] = "rows_only_ok (no_oracle)"
                n_rows_only += 1
        except Exception as e:  # noqa: BLE001 - battery must finish
            results[name] = f"FAIL: {type(e).__name__}: {e}"[:300]
            n_fail += 1
        print(f"  {name}: {results[name][:80]}", flush=True)

    out = {
        "commit": commit,
        "tree_dirty": dirty,
        "sf_dir": sf,
        "n_bench": len(Q.BENCH_QUERIES),
        "n_oracle_green": n_green,
        "n_rows_only": n_rows_only,
        "n_fail": n_fail,
        "elapsed_sec": round(time.time() - t0, 1),
        "results": results,
    }
    path = f"BENCHORACLE_r{rnd}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(json.dumps({k: v for k, v in out.items() if k != "results"}))
    if n_fail:
        print(f"BENCH ORACLE FAILED: {n_fail} queries")
        sys.exit(1)


if __name__ == "__main__":
    main()
