"""Synthesize an sf1-scale dataset from the driver's sf0.1 tables.

The driver ships sf{0.001,0.01,0.1}; the 100x-scaling story needs at
least one empirical point ABOVE bench scale (round-3 verdict ask #6).
This tool builds /tmp/sf1 as a 10x replication of sf0.1 with
per-replica key offsets, preserving referential integrity inside each
replica and the per-key distributions overall:

- all integer keys get ``replica * 10_000_000`` added (orderkey /
  custkey / partkey / suppkey / event_id / user_id / doc_id / vec_id),
  so joins stay 1:1 per replica and key cardinality scales 10x;
- ``region`` / ``nation`` are copied unchanged (schema-fixed dims —
  they would not grow at 100 TB either);
- ``documents.text`` gets every 8th word tagged with the replica id:
  with 8-gram shingles every shingle crosses a tagged word, so
  replicas are NOT near-duplicates of each other and the near-dup
  workload grows linearly (10 exact copies would instead explode the
  candidate-pair stage 45x and misrepresent scaling);
- ``embeddings.embedding`` gets deterministic per-(replica, dim)
  jitter so replica vectors are close-but-not-identical (cosine
  structure preserved, exact-dup collapse avoided).

Timestamps are kept: event density per window scales 10x, which is
what a 10x-bigger deployment looks like.

Usage: python tools_make_sf1.py [/tmp/sf1]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_movie_recommender_spark import get_spark

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000

KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _replicate(df: DataFrame, keys: list[str], n: int = 10) -> DataFrame:
    rep = df.crossJoin(
        F.broadcast(
            df.sparkSession.range(n).select(F.col("id").alias("__r"))
        )
    )
    for k in keys:
        rep = rep.withColumn(k, (F.col(k) + F.col("__r") * OFF).cast("long"))
    return rep


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(dst, exist_ok=True)
    spark = get_spark("make-sf1")

    for t in ["region", "nation"]:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")

    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        rep = _replicate(df, keys)
        if t == "documents":
            rep = rep.withColumn(
                "text",
                F.expr(
                    "array_join(zip_with(split(text, ' '), "
                    "sequence(0, size(split(text, ' ')) - 1), "
                    "(w, i) -> CASE WHEN i % 8 = 0 AND __r > 0 "
                    "THEN concat(w, 'r', CAST(__r AS STRING)) "
                    "ELSE w END), ' ')"
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        if t == "embeddings":
            rep = rep.withColumn(
                "embedding",
                F.expr(
                    "zip_with(embedding, "
                    "sequence(1, size(embedding)), (x, i) -> CAST(x + "
                    "(pmod(hash(vec_id * 64 + i), 1000) - 500) / 50000.0 "
                    "* CAST(__r > 0 AS INT) AS FLOAT))"
                ),
            )
        out = rep.drop("__r")
        out.repartition(16).write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(t, spark.read.parquet(f"{dst}/{t}.parquet").count())
    print("wrote", dst)


if __name__ == "__main__":
    main()
