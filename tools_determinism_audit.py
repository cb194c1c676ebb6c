"""Partition-order determinism audit: Spark vs Spark under re-planning.

Round-6's closing suite caught `hirschman_linkage_indices`' key-sector
flag flipping between runs: a float boundary (`cs/mc > 1` with cs/mc
at exactly 1.0) moved with Spark's partition summation order. Rerunning
the same config re-rolls that dice weakly; CHANGING the partitioning
re-rolls it hard. This audit executes every registered query twice at
sf0.01 —

  config A: spark.sql.shuffle.partitions=32, default scan splits
  config B: spark.sql.shuffle.partitions=7,  maxPartitionBytes=1m,
            AQE coalescing off

— and compares order-insensitive row hashes. A query whose RESULT
changes under re-partitioning would return different answers on
different cluster layouts at 100 TB: every such query is a latent
hirschman-class bug (an unrounded float comparison, an un-tiebroken
top-k, an order-dependent aggregate) and gets listed for fixing.

Writes DETERMINISM_r{N}.json:
    {"queries": N, "mismatches": {name: {"rows_a": n, "rows_b": n}},
     "errors": {...}, "elapsed_sec": ...}

Exit 1 on any mismatch (gate semantics, like the other audits).

Usage: python tools_determinism_audit.py [round] [--slice k]
       (slice: crc32(name) % 8 == k subset, for a quick pass)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_movie_recommender_spark import get_spark
from pyspark_movie_recommender_spark import queries as Q

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

CONF_A = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
}
CONF_B = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": str(1024 * 1024),
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def _row_hash(rows) -> tuple[int, str]:
    """Order-insensitive content hash (repr covers None/NaN/Decimal the
    same way on both passes — same interpreter, same types)."""
    digest = hashlib.sha256()
    for r in sorted(repr(tuple(row)) for row in rows):
        digest.update(r.encode())
    return len(rows), digest.hexdigest()[:16]


def _run(spark, name: str, conf: dict) -> tuple[int, str]:
    for k, v in conf.items():
        spark.conf.set(k, v)
    # rebuild the plan under this conf: construction-time decisions
    # (router censuses, band widths) must see the same world they
    # would on a cluster with this layout
    df = Q.QUERIES[name](spark, SF)
    return _row_hash(df.collect())


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "06"
    names = sorted(Q.QUERIES)
    if "--slice" in sys.argv:
        k = int(sys.argv[sys.argv.index("--slice") + 1]) % 8
        names = [n for n in names if zlib.crc32(n.encode()) % 8 == k]

    spark = get_spark("determinism-audit")
    t0 = time.time()
    mismatches: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for i, name in enumerate(names):
        try:
            n_a, h_a = _run(spark, name, CONF_A)
            n_b, h_b = _run(spark, name, CONF_B)
            if (n_a, h_a) != (n_b, h_b):
                mismatches[name] = {
                    "rows_a": n_a,
                    "rows_b": n_b,
                    "hash_a": h_a,
                    "hash_b": h_b,
                }
                print(f"MISMATCH {name}: {n_a}/{h_a} vs {n_b}/{h_b}", flush=True)
        except Exception as e:  # noqa: BLE001 - audit must finish
            errors[name] = f"{type(e).__name__}: {e}"[:300]
        if (i + 1) % 100 == 0:
            print(
                f"[{i + 1}/{len(names)}] mismatches={len(mismatches)}"
                f" errors={len(errors)} ({time.time() - t0:.0f}s)",
                flush=True,
            )

    out = {
        "sf_dir": SF,
        "queries": len(names),
        "mismatches": mismatches,
        "errors": errors,
        "elapsed_sec": round(time.time() - t0, 1),
    }
    path = f"DETERMINISM_r{rnd}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(json.dumps({k: v for k, v in out.items() if k != "errors"})[:2000])
    print("errors:", len(errors), "->", path)
    if mismatches or errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
