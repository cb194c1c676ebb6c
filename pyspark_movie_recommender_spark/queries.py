"""Query registry: every implemented operator as a (Spark, oracle-SQL) pair.

Each entry is the driver-contract unit from ``__spark_entry__.py``:
``QUERIES[name]`` is a callable ``(spark, sf_dir) -> DataFrame`` built on
the engine's operator library; ``ORACLE_SQL[name]`` (when present) is the
ANSI-SQL equivalent DuckDB runs on the same parquet tables. Names of
computed columns are aliased identically on both sides — the driver's
compare hashes values after sorting columns by name.

Determinism rules observed throughout:
- floating-point aggregates are rounded on BOTH sides (summation order
  differs between engines);
- top-k queries carry a total tie-break order;
- integer aggregates are cast to BIGINT on both sides (DuckDB SUM(int)
  is HUGEINT, Spark is LONG).

Scale notes per query live in the docstrings; the registry is also what
``bench.py`` times at sf0.1.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_movie_recommender_spark.sources import load_table
from pyspark_movie_recommender_spark.operators import relational as R

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}

# queries worth timing at sf0.1 (subset of QUERIES; bench.py reads this)
BENCH_QUERIES: list[str] = []


def query(name: str, oracle: str | None = None, bench: bool = False):
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        if bench:
            BENCH_QUERIES.append(name)
        return fn

    return deco


# ---------------------------------------------------------------------------
# flagship: per-customer top-3 orders by totalprice, with nation name
# ---------------------------------------------------------------------------


@query(
    "flagship_top_orders_per_customer",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name, o.o_orderkey, o.o_totalprice, o.rnk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
        FROM orders
    ) o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.rnk <= 3
    """,
    bench=True,
)
def flagship_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → window top-k per group → two joins (one broadcast).

    Exercises the reference's whole relational surface in one plan
    (S1 scan, P-class projections, J1/J2 joins, K1 top-k generalized
    per-group — SURVEY.md §7 milestone 0). Scale shape: single shuffle
    on o_custkey for the window (WindowGroupLimit keeps ≤3 rows per
    group per partition before the join), customer joins on the same
    key, nation broadcast.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    top3 = R.top_k_per_group(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        group_by=["o_custkey"],
        order_by=[F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
    ).withColumn("rnk", F.col("rnk").cast("long"))

    return (
        top3.join(customer.select("c_custkey", "c_name", "c_nationkey"),
                  top3.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name", "o_orderkey", "o_totalprice", "rnk")
    )
