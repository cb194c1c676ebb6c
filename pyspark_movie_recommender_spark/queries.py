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


# ---------------------------------------------------------------------------
# relational core — aggregates, filters, joins (SURVEY §2.A parity + §2.B)
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                     AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)             AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                     AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                AS avg_price,
           ROUND(AVG(l_discount), 4)                                     AS avg_disc,
           CAST(COUNT(*) AS BIGINT)                                      AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped groupBy (A1/A2/M1 generalized).

    Scale shape: map-side partial aggregation over 6 groups means the
    shuffle carries ~6 rows per partition no matter the input size; the
    shipdate filter pushes down to the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "filter_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND l_shipdate IS NOT NULL
      AND NOT (l_discount > 0.05 AND l_tax > 0.05)
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate algebra: BETWEEN, IN, IS NOT NULL, NOT/AND/OR.

    All four predicates are scan-pushable (``PushedFilters`` in explain);
    the reference's only predicate was a closure NOT-IN
    (``recommender.py:146``).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_shipdate").isNotNull()
        & ~((F.col("l_discount") > 0.05) & (F.col("l_tax") > 0.05))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@query(
    "revenue_per_nation",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    """,
    bench=True,
)
def revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join star query (TPC-H Q5-shaped): fact → dims → agg.

    Scale shape: lineitem⋈orders is the only big shuffle (both sides
    keyed on orderkey); customer joins via AQE-chosen strategy; nation
    and region are broadcast (fixed 25/5 rows at any scale factor).
    Aggregation over 25 groups is map-side partial.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "customers_without_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (generalizes reference F1 NOT-IN to a relation):
    customers with no 1996 order. (Scoped to a year so the result is
    NON-empty at every SF — every customer has some order in this data,
    and a hash match on an empty result proves nothing.)

    The reference shipped a 10-element Python list in a closure
    (``recommender.py:144-146``); the relational form scales to an
    arbitrarily large excluded set and broadcasts when small.
    """
    from pyspark_movie_recommender_spark.operators.relational import anti_join

    customer = load_table(spark, sf_dir, "customer")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return anti_join(customer, orders, "c_custkey").select("c_custkey", "c_name")


@query(
    "customers_with_urgent_orders",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
)
def customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) — left columns only, no row multiplication."""
    from pyspark_movie_recommender_spark.operators.relational import semi_join

    customer = load_table(spark, sf_dir, "customer")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return semi_join(customer, urgent, "c_custkey").select("c_custkey", "c_mktsegment")


@query(
    "setop_both_statuses",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_both_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics): customers with both F and O orders."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o)


@query(
    "setop_never_pending",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def setop_never_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics): order-placing customers with no pending order."""
    orders = load_table(spark, sf_dir, "orders")
    all_c = orders.select("o_custkey")
    pend = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return all_c.subtract(pend)


@query(
    "top_lineitems_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 15
    """,
)
def top_lineitems_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (reference K1, ``takeOrdered`` at ``recommender.py:176``).

    Catalyst lowers ORDER BY + LIMIT to ``TakeOrderedAndProject`` —
    per-partition k-heaps merged on the driver, never a full sort.
    """
    from pyspark_movie_recommender_spark.operators.relational import global_top_k

    li = load_table(spark, sf_dir, "lineitem")
    return global_top_k(
        li.select("l_orderkey", "l_linenumber", "l_extendedprice"),
        order_by=[F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        k=15,
    )


# ---------------------------------------------------------------------------
# window functions, rollup/cube/grouping sets
# ---------------------------------------------------------------------------


# one SQL text, two engines: the engine's spark.sql entry path is
# exercised with the exact string the DuckDB oracle runs
_Q3_SQL = """
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate,
           o.o_orderpriority
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
"""


@query("sql_shipping_priority", oracle=_Q3_SQL)
def sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped query through the textual SQL entry point: the
    SAME string runs on ``spark.sql`` and on the DuckDB oracle —
    dialect-shared ANSI SQL, parsed by Catalyst into the identical
    join+agg+topk plan the DataFrame API would build."""
    from pyspark_movie_recommender_spark.sources import register_views

    register_views(spark, sf_dir, "lineitem", "orders")
    return spark.sql(_Q3_SQL)


@query(
    "range_frame_trailing_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day_no,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY datediff('day', DATE '1992-01-01', o_orderdate)
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS spend_30d
    FROM orders
    """,
)
def range_frame_trailing_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based window frame (RANGE, not ROWS): per-customer trailing
    30-day spend. Orders on the same day share a frame — semantics ROWS
    frames cannot express. One shuffle on o_custkey."""
    orders = load_table(spark, sf_dir, "orders")
    day_no = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_no)
        .rangeBetween(-30, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        day_no.cast("long").alias("day_no"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )


@query(
    "window_order_history",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT)                   AS rn,
           CAST(RANK() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderstatus) AS BIGINT)  AS status_rank,
           LAG(o_totalprice) OVER w                              AS prev_price,
           LEAD(o_totalprice) OVER w                             AS next_price,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_spend,
           ROUND(AVG(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)     AS mov_avg_3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    bench=True,
)
def window_order_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function suite: row_number/rank/lag/lead/running/moving agg.

    One shuffle on o_custkey serves every window (same partitioning);
    deterministic total order within partitions via (o_orderdate,
    o_orderkey).
    """
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrank = W.partitionBy("o_custkey").orderBy("o_orderstatus")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(wrank).cast("long").alias("status_rank"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2).alias("run_spend"),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("mov_avg_3"),
    )


@query(
    "rollup_customer_geo",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(COUNT(*) AS BIGINT)        AS n_customers,
           ROUND(SUM(c.c_acctbal), 2)      AS total_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def rollup_customer_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region → nation → grand total)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
    )


@query(
    "cube_lineitem_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)  AS sum_qty,
           CAST(COUNT(*) AS BIGINT)   AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the two lineitem flags — all 2^2 grouping combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT)      AS n_orders,
           ROUND(SUM(o_totalprice), 2)   AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface (spark.sql)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT)    AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "count_distinct_per_segment",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           CAST(COUNT(*) AS BIGINT)                    AS n_customers,
           ROUND(AVG(c_acctbal), 4)                    AS avg_balance
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def count_distinct_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT DISTINCT + plain aggregates in one pass (Expand-based plan)."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_balance"),
    )


@query("approx_distinct_parts")
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate count-distinct (rows-only: sketch values are
    engine-specific; the scale path for COUNT(DISTINCT) at 100 TB)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", 0.02).alias("approx_supps"),
    )


# ---------------------------------------------------------------------------
# scalar function library: string / date / math / JSON
# ---------------------------------------------------------------------------


@query(
    "scalar_string_math_part",
    oracle="""
    SELECT p_partkey,
           UPPER(p_type)                              AS type_upper,
           SUBSTRING(p_name, 1, 5)                    AS name_prefix,
           p_brand || '/' || p_type                   AS brand_type,
           CAST(LENGTH(p_name) AS BIGINT)             AS name_len,
           REPLACE(p_name, ' ', '_')                  AS name_snake,
           REGEXP_EXTRACT(p_name, '^(\\w+)', 1)       AS first_word,
           ROUND(SQRT(p_retailprice), 4)              AS price_sqrt,
           ROUND(LN(p_retailprice + 1), 4)            AS price_ln,
           CAST(ABS(p_size - 25) AS INT)              AS size_dev,
           CAST(p_size % 7 AS INT)                    AS size_mod,
           CASE WHEN p_retailprice > 1500 THEN 'premium'
                WHEN p_retailprice > 800  THEN 'standard'
                ELSE 'budget' END                     AS price_band
    FROM part
    """,
)
def scalar_string_math_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function battery: string/regex/math/CASE — all codegen'd."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.round(F.sqrt("p_retailprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("p_retailprice") + 1), 4).alias("price_ln"),
        F.abs(F.col("p_size") - 25).cast("int").alias("size_dev"),
        (F.col("p_size") % 7).cast("int").alias("size_mod"),
        F.when(F.col("p_retailprice") > 1500, "premium")
        .when(F.col("p_retailprice") > 800, "standard")
        .otherwise("budget")
        .alias("price_band"),
    )


@query(
    "date_functions_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT)        AS order_year,
           CAST(MONTH(o_orderdate) AS INT)       AS order_month,
           CAST(DAY(o_orderdate) AS INT)         AS order_day,
           CAST(QUARTER(o_orderdate) AS INT)     AS order_quarter,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL 30 DAY         AS due_ts,
           LAST_DAY(CAST(o_orderdate AS DATE))   AS month_end,
           CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
                                                 AS days_since_epoch95
    FROM orders
    """,
)
def date_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery over the orders timeline.

    Recovers the kind of temporal attribute the reference silently
    discarded (ratings timestamp, ``recommender.py:44``).
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.last_day("o_orderdate").alias("month_end"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("long")
        .alias("days_since_epoch95"),
    )


@query(
    "json_extract_events",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props payload column."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.filter(F.col("event_type").isin("purchase", "signup")).select(
        "event_id",
        "event_type",
        k.alias("k_val"),
        (k % 10).alias("k_bucket"),
    )


# ---------------------------------------------------------------------------
# time-series over events: tumbling/sliding windows, sessionization, as-of,
# range join — the batch-mode equivalents of the streaming surface
# ---------------------------------------------------------------------------


@query(
    "tumbling_window_events",
    oracle="""
    SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT)  AS n_events,
           ROUND(SUM(value), 2)      AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    bench=True,
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation via ``F.window`` (batch mode).

    Identical code runs under Structured Streaming (see
    ``streaming/jobs.py``); in batch the window struct is just a
    derived grouping column — partial-aggregated map-side.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "sliding_window_events",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '30 minutes', ts)
                - k.k * INTERVAL '30 minutes' AS TIMESTAMP) AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(AVG(value), 6)     AS avg_value
    FROM events, (SELECT UNNEST([0, 1]) AS k) k
    GROUP BY 1
    """,
)
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h window, 30 min slide): each event lands in 2 windows.

    ``F.window(ts, '1 hour', '30 minutes')`` expands rows engine-side;
    the oracle reproduces the same assignment with an UNNEST offset join.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_events",
            "avg_value",
        )
    )


@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800 * 1000000
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, event_id,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap sessions via lag + running sum.

    The classic batch pattern (streaming uses ``session_window``, see
    streaming module). One shuffle on user_id; both windows and the
    final groupBy reuse the same partitioning.
    """
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # cast tolerates both TIMESTAMP and TIMESTAMP_NTZ parquet encodings;
    # with the UTC session timezone the NTZ->LTZ cast is wall-clock-identity,
    # matching the oracle's epoch_us over naive timestamps
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    flagged = ev.withColumn(
        "new_session",
        F.when(
            (us - F.lag(us).over(w) > 1800 * 1_000_000) | F.lag("ts").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "asof_join_purchases",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           c.value AS last_click_value, c.ts AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    bench=True,
)
def asof_join_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest click at-or-before each purchase, per user.

    Spark has no native batch as-of join; the scale-correct form is a
    union + single window pass (one shuffle on user_id, no range
    explosion): tag clicks 0 / purchases 1, order by (ts, tag), carry
    ``last(value ignoring nulls)`` forward, keep purchase rows. The
    oracle is DuckDB's native ASOF JOIN. A pandas ``merge_asof`` via
    applyInPandas would be the fallback for semantics Spark can't
    express (see operators/asof.py).
    """
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("value").alias("click_value"),
        F.col("ts").alias("click_ts"),
        F.lit(0).alias("tag"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("double").alias("click_value"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(1).alias("tag"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    merged = clicks.unionByName(purchases).select(
        "event_id",
        "user_id",
        "ts",
        "tag",
        F.last("click_value", ignorenulls=True).over(w).alias("last_click_value"),
        F.last("click_ts", ignorenulls=True).over(w).alias("last_click_ts"),
    )
    return merged.filter(
        (F.col("tag") == 1) & F.col("last_click_value").isNotNull()
    ).select("event_id", "user_id", "ts", "last_click_value", "last_click_ts")


@query(
    "range_join_value_tiers",
    oracle="""
    SELECT e.event_id, e.value, t.tier
    FROM events e
    JOIN (VALUES (0.0, 50.0, 'low'),
                 (50.0, 150.0, 'mid'),
                 (150.0, 1e12, 'high')) AS t(lo, hi, tier)
      ON e.value >= t.lo AND e.value < t.hi
    """,
)
def range_join_value_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join against a literal tier dimension (S2 source).

    The tiny side is broadcast → BroadcastNestedLoopJoin, which is the
    right physical plan for a 3-row non-equi dimension at any scale.
    ``spark.createDataFrame`` here is the engine's literal-relation
    source (reference ``sc.parallelize``, ``recommender.py:121``).
    """
    ev = load_table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 150.0, "mid"), (150.0, 1e12, "high")],
        schema="lo double, hi double, tier string",
    )
    return (
        ev.join(
            F.broadcast(tiers),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .select("event_id", "value", "tier")
    )


# ---------------------------------------------------------------------------
# reference-identity math: RMSE + min-max rescale, both in pure SQL
# ---------------------------------------------------------------------------


@query(
    "rmse_price_model",
    oracle="""
    SELECT ROUND(SQRT(AVG(POW(l.l_extendedprice / l.l_quantity - p.p_retailprice, 2))), 4)
           AS rmse
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def rmse_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RMSE as one aggregate (reference A1+M1, ``recommender.py:73,97``).

    Treats p_retailprice as the 'prediction' for the realized unit
    price — the same actual-vs-predicted join shape as the reference's
    validation step (J1 at ``recommender.py:68``), minus the driver-side
    ``math.sqrt``: the whole metric stays in the plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            F.sqrt(
                F.avg(
                    F.pow(
                        F.col("l_extendedprice") / F.col("l_quantity") - F.col("p_retailprice"),
                        F.lit(2),
                    )
                )
            ),
            4,
        ).alias("rmse")
    )


@query(
    "minmax_rescale_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           ROUND(1 + 4 * (o_totalprice - mn) / (mx - mn), 6) AS scaled
    FROM orders,
         (SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders)
    """,
)
def minmax_rescale_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max rescale to [1,5] in pure SQL (reference ML5 without UDFs).

    The reference wrapped doubles in 1-d vectors through a Python UDF to
    feed MinMaxScaler (``recommender.py:199-204``); here the global
    min/max is a 1-row aggregate broadcast back via cross join — no
    Python boundary, no VectorUDT, same [1,5] bounds.
    """
    from pyspark_movie_recommender_spark.operators.relational import minmax_rescale

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return minmax_rescale(orders, "o_totalprice", out_col="scaled").withColumn(
        "scaled", F.round("scaled", 6)
    )


# ---------------------------------------------------------------------------
# LLM-data-pipeline: deduplication over documents
# ---------------------------------------------------------------------------


@query(
    "dedup_content_hash",
    oracle="""
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    WHERE d.doc_id IN (
        SELECT MIN(doc_id)
        FROM documents
        GROUP BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))))
    """,
)
def dedup_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: md5 of normalized text, keep lowest doc_id.

    groupBy(min) not window+row_number — partial aggregation collapses
    duplicate groups map-side before the shuffle, the dominant saving
    when dup rates are high at 100 TB.
    """
    from pyspark_movie_recommender_spark.operators.dedup import content_hash_dedup

    docs = load_table(spark, sf_dir, "documents")
    return content_hash_dedup(docs, "text", "doc_id").select("doc_id", "lang", "source")


@query(
    "dedup_subset_distinct",
    oracle="SELECT DISTINCT lang, source FROM documents",
)
def dedup_subset_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-subset dedup (``dropDuplicates([cols])``)."""
    from pyspark_movie_recommender_spark.operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs.select("lang", "source"), ["lang", "source"])


@query(
    "ngram_jaccard_neardup",
    oracle="""
    WITH sub AS (
        SELECT doc_id, trim(text) AS tx FROM documents WHERE doc_id % 25 = 0
    ), sh AS (
        SELECT doc_id,
               list_distinct(list_filter(
                   list_transform(range(1, greatest(length(tx) - 2, 1) + 1),
                                  i -> substring(tx, CAST(i AS INT), 3)),
                   g -> length(g) > 0)) AS shingles
        FROM sub
    ), nonempty AS (
        SELECT * FROM sh WHERE len(shingles) > 0
    ), ex0 AS (
        SELECT doc_id, unnest(shingles) AS shingle FROM nonempty
    ), keep AS (
        SELECT shingle FROM ex0 GROUP BY shingle HAVING COUNT(*) <= 15
    ), ex AS (
        SELECT ex0.doc_id, ex0.shingle FROM ex0 JOIN keep USING (shingle)
    ), sz AS (
        SELECT doc_id, COUNT(*) AS sz FROM ex GROUP BY doc_id
    ), shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(n_shared * 1.0 / (sa.sz + sb.sz - n_shared), 6) AS jaccard
    FROM shared
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE n_shared * 1.0 / (sa.sz + sb.sz - n_shared) >= 0.5
    """,
)
def ngram_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact character-3-gram Jaccard near-dup pairs (sampled subset)
    with a stop-shingle document-frequency cap.

    Candidate pairs come from an equi-join on shared shingles — never a
    cross join — and the df cap (operators/dedup.py ngram_jaccard_pairs)
    bounds any one shingle's candidate contribution at C(cap, 2), which
    is what keeps the exact form from exploding on boilerplate shingles
    at corpus scale. Full-corpus path is ``dedup_minhash_lsh`` below.
    """
    from pyspark_movie_recommender_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.5, max_shingle_df=15
    )
    return pairs.select(
        F.col("id_a"), F.col("id_b"), F.round("jaccard", 6).alias("jaccard")
    )


# shared by dedup_components (label propagation) and dedup_components_star
# (large-star/small-star): both must equal the declarative fixpoint
_CC_ORACLE = """
    WITH RECURSIVE sub AS (
        SELECT doc_id, trim(text) AS tx FROM documents WHERE doc_id % 25 = 0
    ), sh AS (
        SELECT doc_id,
               list_distinct(list_filter(
                   list_transform(range(1, greatest(length(tx) - 2, 1) + 1),
                                  i -> substring(tx, CAST(i AS INT), 3)),
                   g -> length(g) > 0)) AS shingles
        FROM sub
    ), nonempty AS (
        SELECT * FROM sh WHERE len(shingles) > 0
    ), ex AS (
        SELECT doc_id, unnest(shingles) AS shingle FROM nonempty
    ), shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT id_a, id_b
        FROM shared
        JOIN (SELECT doc_id, len(shingles) AS sz FROM nonempty) sa ON sa.doc_id = id_a
        JOIN (SELECT doc_id, len(shingles) AS sz FROM nonempty) sb ON sb.doc_id = id_b
        WHERE n_shared * 1.0 / (sa.sz + sb.sz - n_shared) >= 0.5
    ), bi AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ), reach(id, label) AS (
        SELECT DISTINCT u AS id, u AS label FROM bi
        UNION
        SELECT bi.u, r.label FROM reach r JOIN bi ON bi.v = r.id
    )
    SELECT id, MIN(label) AS component FROM reach GROUP BY id
    """


@query("dedup_components", oracle=_CC_ORACLE)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → clusters: connected components over the exact
    Jaccard pair graph (min-label propagation, one shuffle per round,
    lineage checkpointed). The DuckDB oracle computes the same
    components with a recursive CTE — an iterative distributed
    algorithm checked against a declarative fixpoint."""
    from pyspark_movie_recommender_spark.operators.dedup import ngram_jaccard_pairs
    from pyspark_movie_recommender_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    return connected_components(pairs)


@query("dedup_components_star", oracle=_CC_ORACLE)
def dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering as ``dedup_components`` but via the alternating
    large-star/small-star contraction (O(log² n) rounds for any graph
    diameter — the 100 TB-safe variant for adversarial chain topologies).
    Checked against the identical recursive-CTE fixpoint oracle, so both
    algorithms are pinned to the same declarative answer."""
    from pyspark_movie_recommender_spark.operators.dedup import ngram_jaccard_pairs
    from pyspark_movie_recommender_spark.operators.graph import (
        connected_components_star,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    return connected_components_star(pairs)


@query("dedup_minhash_lsh", bench=True)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates — the sub-quadratic scale path
    (rows-only: signature values are engine-specific; planted-duplicate
    recall is unit-tested in tests/test_dedup.py)."""
    from pyspark_movie_recommender_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return minhash_lsh_pairs(
        docs, "text", "doc_id", n=3, num_hashes=32, bands=8, verify_threshold=0.5
    )


@query("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, (max_hamming+1)-chunk pigeonhole bucketing
    (rows-only)."""
    from pyspark_movie_recommender_spark.operators.dedup import simhash_neardup_pairs

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return simhash_neardup_pairs(docs, "text", "doc_id", max_hamming=8)


# ---------------------------------------------------------------------------
# LLM-data-pipeline: text analysis
# ---------------------------------------------------------------------------


@query(
    "doc_profile",
    oracle="""
    WITH toks AS (
        SELECT doc_id, text,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\\s+') END AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(length(text) AS BIGINT)  AS n_chars_calc,
           CAST(len(t) AS BIGINT)        AS n_tokens,
           ROUND(CASE WHEN len(t) > 0 THEN
               list_aggregate(list_transform(t, x -> length(x)), 'sum') * 1.0 / len(t)
               END, 4)                   AS avg_token_len,
           ROUND(CASE WHEN len(t) > 0 THEN
               len(list_distinct(t)) * 1.0 / len(t) END, 4) AS ttr,
           ROUND(CASE WHEN len(t) > 0 THEN
               len(list_filter(t, x -> list_contains(['the','a','and','of','to'], x))) * 1.0 / len(t)
               END, 4)                   AS en_stopword_ratio,
           CAST(COALESCE(list_aggregate(
               list_transform(t, x -> CAST(ceil(length(x) / 4.0) AS BIGINT)), 'sum'), 0)
               AS BIGINT)                AS bpe_tokens
    FROM toks
    """,
    bench=True,
)
def doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text statistics in ONE projection pass.

    Token counting, mean token length, type-token ratio, stopword
    ratio, BPE-ish subword count — all higher-order-function SQL over
    the whitespace token array, zero Python. At 100 TB this runs as a
    single scan stage with no shuffle at all.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens
    from pyspark_movie_recommender_spark.operators.text import (
        avg_token_len,
        bpe_ish_token_count,
        n_tokens,
        stopword_ratio,
        type_token_ratio,
    )

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_calc"),
        n_tokens("text").alias("n_tokens"),
        F.round(avg_token_len("text"), 4).alias("avg_token_len"),
        F.round(type_token_ratio("text"), 4).alias("ttr"),
        F.round(stopword_ratio("text", "en"), 4).alias("en_stopword_ratio"),
        bpe_ish_token_count("text").alias("bpe_tokens"),
    )


@query(
    "salted_join_order_priority",
    oracle="""
    SELECT c.c_mktsegment,
           o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment, o.o_orderpriority
    """,
)
def salted_join_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted fact-dim join; identical results to the
    plain join (the oracle IS the plain join).

    One hot customer key spreads over 16 shuffle sub-keys; the customer
    side is replicated 16x (dimension-sized, so cheap). See
    ``relational.salted_join`` for when to prefer this over AQE skew
    handling.
    """
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    joined = R.salted_join(orders, customer, on="custkey", salt_buckets=16)
    return joined.groupBy("c_mktsegment", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@query(
    "doc_fingerprints",
    bench=True,
    oracle="""
    WITH h AS (
        SELECT doc_id,
               CASE WHEN length(text) >= 8 THEN
                   list_transform(range(1, length(text) - 7 + 1), i ->
                       list_reduce(
                           list_prepend(0, list_transform(range(0, 8), j ->
                               ascii(substring(text, CAST(i + j AS INT), 1)))),
                           (acc, x) -> (acc * 257 + x) % 1000003))
               ELSE CAST([] AS BIGINT[]) END AS hashes
        FROM documents
    ), w AS (
        SELECT doc_id,
               CASE WHEN len(hashes) >= 4 THEN
                   list_transform(range(1, len(hashes) - 3 + 1), j ->
                       list_min(list_slice(hashes, CAST(j AS INT), CAST(j + 3 AS INT))))
               WHEN len(hashes) > 0 THEN [list_min(hashes)]
               ELSE CAST([] AS BIGINT[]) END AS fps0
        FROM h
    ), f AS (
        SELECT doc_id, list_distinct(fps0) AS fps FROM w
    )
    SELECT doc_id,
           CAST(len(fps) AS BIGINT) AS n_fp,
           CAST(list_min(fps) AS BIGINT) AS min_fp,
           CAST(list_max(fps) AS BIGINT) AS max_fp
    FROM f
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints per document (SURVEY.md §2.B
    text analysis: document fingerprinting).

    Same polynomial-hash + window-min arithmetic on both engines (Arrow/
    NumPy on the Spark side, list lambdas in DuckDB), so the oracle
    checks exact values, not just shapes. Pure map-side projection — no
    shuffle, scales linearly with corpus bytes.
    """
    from pyspark_movie_recommender_spark.operators.text import winnowing_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    # two-step projection so the UDF runs once per row, not once per
    # consuming column
    fps = docs.select("doc_id", winnowing_fingerprints("text").alias("fps"))
    return fps.select(
        "doc_id",
        F.size("fps").cast("long").alias("n_fp"),
        F.array_min("fps").cast("long").alias("min_fp"),
        F.array_max("fps").cast("long").alias("max_fp"),
    )


@query(
    "chunk_documents",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\\s+') END AS t
        FROM documents
    ), base AS (
        SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0
    ), chunks AS (
        SELECT doc_id,
               unnest(range(0, CAST(greatest(ceil((n - 64) / 48.0), 0) AS BIGINT) + 1)) AS chunk_idx,
               t
        FROM base
    )
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(len(sl) AS BIGINT) AS n_chunk_tokens,
           array_to_string(sl, ' ') AS chunk_text
    FROM (
        SELECT doc_id, chunk_idx,
               list_slice(t, CAST(chunk_idx * 48 + 1 AS BIGINT),
                             CAST(chunk_idx * 48 + 64 AS BIGINT)) AS sl
        FROM chunks
    )
    """,
)
def chunk_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-token chunking (64-token windows, stride 48) —
    the pre-packing step of a pretraining pipeline. Map-side explode,
    no shuffle; oracle checks exact chunk text."""
    from pyspark_movie_recommender_spark.operators.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=64, stride=48)


@query(
    "pack_documents",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source AS grp,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
        FROM documents
    )
    SELECT doc_id, grp, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(floor((SUM(n_tokens) OVER (
                    PARTITION BY grp ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) - n_tokens) / 512) AS BIGINT) AS bin_id
    FROM toks
    """,
)
def pack_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: contiguous greedy fill into 512-token
    bins per source via one window cumsum — deterministic, exact-checked
    bin assignments, single shuffle."""
    from pyspark_movie_recommender_spark.operators.text import pack_documents

    docs = load_table(spark, sf_dir, "documents")
    out = pack_documents(docs, budget_tokens=512, by="source")
    return out.select("doc_id", "grp", F.col("n_tokens").cast("long").alias("n_tokens"), "bin_id")


@query(
    "bm25_search",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\\s+') END AS t
        FROM documents
    ), d AS (
        SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl, t FROM toks
    ), stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM d
    ), tf AS (
        SELECT doc_id, dl, term, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM (SELECT doc_id, dl, unnest(t) AS term FROM d)
        WHERE term IN ('spark', 'vector', 'stream')
        GROUP BY doc_id, dl, term
    ), dft AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY term
    )
    SELECT doc_id,
           ROUND(SUM(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           ), 6) AS bm25
    FROM tf JOIN dft USING (term) CROSS JOIN stats
    GROUP BY doc_id
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for the query terms {spark, vector, stream}
    — the text-analysis capstone, entirely SQL (explode + two small
    aggregates broadcast back), oracle-checked to 6 decimals."""
    from pyspark_movie_recommender_spark.operators.text import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    return bm25_scores(docs, ["spark", "vector", "stream"])


@query(
    "language_id_heuristic",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\\s+') END AS t
        FROM documents
    ), scores AS (
        SELECT doc_id, lang,
           CAST(len(list_filter(t, x -> list_contains(['der','die','das','und','zu'], x))) AS BIGINT) AS de_hits,
           CAST(len(list_filter(t, x -> list_contains(['the','a','and','of','to'], x))) AS BIGINT)    AS en_hits,
           CAST(len(list_filter(t, x -> list_contains(['el','la','de','y','que'], x))) AS BIGINT)     AS es_hits,
           CAST(len(list_filter(t, x -> list_contains(['le','la','de','et','que'], x))) AS BIGINT)    AS fr_hits
        FROM toks
    )
    SELECT doc_id, lang, de_hits, en_hits, es_hits, fr_hits,
           CASE WHEN greatest(de_hits, en_hits, es_hits, fr_hits) = 0 THEN 'und'
                WHEN de_hits >= greatest(en_hits, es_hits, fr_hits) THEN 'de'
                WHEN en_hits >= greatest(es_hits, fr_hits) THEN 'en'
                WHEN es_hits >= fr_hits THEN 'es'
                ELSE 'fr' END AS pred_lang
    FROM scores
    """,
)
def language_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: argmax of per-language stopword hits,
    alphabetical tie-break, 'und' when nothing matches."""
    from pyspark_movie_recommender_spark.operators.text import (
        lang_marker_scores,
        predict_lang,
    )

    docs = load_table(spark, sf_dir, "documents")
    scores = lang_marker_scores("text")
    return docs.select(
        "doc_id",
        "lang",
        *[scores[lang].cast("long").alias(f"{lang}_hits") for lang in ("de", "en", "es", "fr")],
        predict_lang("text").alias("pred_lang"),
    )


# ---------------------------------------------------------------------------
# LLM-data-pipeline: similarity search over embeddings
# ---------------------------------------------------------------------------


@query(
    "cosine_topk",
    oracle="""
    WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    probes AS (SELECT * FROM s WHERE vec_id < 10),
    scored AS (
        SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(p.e, c.e), 6) AS sim
        FROM probes p JOIN s c ON c.vec_id <> p.vec_id
    ), ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
        FROM scored
    )
    SELECT probe_id, neighbor_id, sim, rnk FROM ranked WHERE rnk <= 5
    """,
    bench=True,
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbours for 10 probe vectors.

    Brute force done right at scale: probes broadcast, corpus scanned
    once (no corpus shuffle), per-probe heap via rank-limited window.
    Similarity is rounded BEFORE ranking so order is engine-stable.
    """
    from pyspark_movie_recommender_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_bruteforce(
        emb, emb.filter(F.col("vec_id") < 10), "embedding", "vec_id", k=5
    )


@query(
    "embedding_neardup",
    oracle="""
    WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings WHERE vec_id % 10 = 0)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.e, b.e), 6) AS cos_sim
    FROM s a JOIN s b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.e, b.e) >= 0.3
    """,
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine near-dup pairs on a deterministic subsample.

    The exact all-pairs form is the oracle baseline; the sub-quadratic
    path over the full corpus is ``ann_lsh_pairs`` (rows-only).
    """
    from pyspark_movie_recommender_spark.functions import cosine_sim

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 10 == 0)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("e").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("e").alias("eb"))
    sim = cosine_sim(F.col("ea"), F.col("eb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(sim >= 0.3)
        .select("id_a", "id_b", F.round(sim, 6).alias("cos_sim"))
    )


@query(
    "embedding_norm_stats",
    oracle="""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(AVG(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[])))), 4) AS avg_norm
    FROM embeddings
    GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-column aggregate: mean L2 norm per label, all in SQL
    higher-order functions (multimodal ARRAY<FLOAT> as a first-class type)."""
    from pyspark_movie_recommender_spark.functions import vec_norm

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            F.avg(vec_norm(F.col("embedding").cast("array<double>"))), 4
        ).alias("avg_norm"),
    )


@query("ann_lsh_pairs", bench=True)
def ann_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH near-dup candidates over the FULL corpus,
    verified with exact cosine on candidates only (rows-only; recall
    vs the exact subset is unit-tested)."""
    from pyspark_movie_recommender_spark.operators.similarity import lsh_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    # Band width is the knob: recall per band is p^width with
    # p = 1 - acos(cos)/pi. The synthetic embeddings have no planted
    # high-cos dups (max pairwise cos ~0.46), so this query targets the
    # moderate-cos regime: 6-bit bands x 8 bands gives ~30-50% recall at
    # cos 0.35-0.46 with 64 buckets/band. For production near-dup
    # (cos>=0.9, huge n) widen bands to ~log2(n)+8 bits and add bands to
    # recover recall — candidates are exact-verified either way, so band
    # width trades compute, never correctness.
    return lsh_neardup_pairs(emb, bits=48, bands=8, cos_threshold=0.25)


@query("ann_ivf_topk")
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN top-k (cell-routed search, rows-only)."""
    from pyspark_movie_recommender_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, n_cells=16, nprobe=4)


# ---------------------------------------------------------------------------
# LLM-data-pipeline: multimodal binary columns
# ---------------------------------------------------------------------------


@query(
    "multimodal_payload_stats",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text)                               AS payload_sha256,
           CAST(length(text) % 1024 + 16 AS INT)      AS width,
           CAST(length(text) % 768 + 16 AS INT)       AS height
    FROM documents
    """,
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + typed metadata struct, JVM-side stats.

    Exercises the BinaryType plumbing end-to-end (payload bytes, sha256
    content hash, metadata struct fields) with zero Python in the path.
    """
    from pyspark_movie_recommender_spark.operators.multimodal import (
        attach_fake_payload,
        payload_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = payload_stats(attach_fake_payload(docs))
    return media.select(
        "doc_id",
        "n_bytes",
        "payload_sha256",
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )


@query(
    "multimodal_decode_features",
    oracle="""
    WITH b AS (
        SELECT doc_id, text,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               hex(encode(text)) AS hx
        FROM documents
    ), nib AS (
        SELECT doc_id,
               (strpos('0123456789ABCDEF', substring(hx, 2 * i - 1, 1)) - 1) // 2
                   AS bin
        FROM (SELECT doc_id, hx,
                     unnest(generate_series(1, CAST(n_bytes AS INTEGER))) AS i
              FROM b)
    ), hist AS (
        SELECT doc_id,
               CAST(COUNT(*) FILTER (WHERE bin = 0) AS BIGINT) AS h0,
               CAST(COUNT(*) FILTER (WHERE bin = 1) AS BIGINT) AS h1,
               CAST(COUNT(*) FILTER (WHERE bin = 2) AS BIGINT) AS h2,
               CAST(COUNT(*) FILTER (WHERE bin = 3) AS BIGINT) AS h3,
               CAST(COUNT(*) FILTER (WHERE bin = 4) AS BIGINT) AS h4,
               CAST(COUNT(*) FILTER (WHERE bin = 5) AS BIGINT) AS h5,
               CAST(COUNT(*) FILTER (WHERE bin = 6) AS BIGINT) AS h6,
               CAST(COUNT(*) FILTER (WHERE bin = 7) AS BIGINT) AS h7
        FROM nib GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_bytes, sha256(b.text) AS content_hash,
           CAST(COALESCE(h.h0, 0) AS BIGINT) AS h0,
           CAST(COALESCE(h.h1, 0) AS BIGINT) AS h1,
           CAST(COALESCE(h.h2, 0) AS BIGINT) AS h2,
           CAST(COALESCE(h.h3, 0) AS BIGINT) AS h3,
           CAST(COALESCE(h.h4, 0) AS BIGINT) AS h4,
           CAST(COALESCE(h.h5, 0) AS BIGINT) AS h5,
           CAST(COALESCE(h.h6, 0) AS BIGINT) AS h6,
           CAST(COALESCE(h.h7, 0) AS BIGINT) AS h7
    FROM b LEFT JOIN hist h ON b.doc_id = h.doc_id
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode→featurize over binary payloads via
    mapInPandas (operators/multimodal.py): the deterministic fake decode
    is an 8-bin byte histogram (byte >> 5), L1-normalized in float32.

    The registered projection un-normalizes the feature back to exact
    integer bin counts (``round(feature_k * n_bytes)`` — exact because
    float32 relative error << 0.5/count), so the driver's canonicalizer
    sees only hashable scalars AND the query is fully DuckDB-oracle
    checkable (the oracle recomputes the histogram from the hex
    encoding: bin = high_nibble // 2). The raw ``array<float>`` form
    stays covered by tests/test_operators.py."""
    from pyspark_movie_recommender_spark.operators.multimodal import (
        attach_fake_payload,
        decode_and_featurize,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = decode_and_featurize(attach_fake_payload(docs))
    return feats.select(
        "doc_id",
        "n_bytes",
        "content_hash",
        *[
            F.round(F.element_at("feature", k + 1) * F.col("n_bytes"))
            .cast("long")
            .alias(f"h{k}")
            for k in range(8)
        ],
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH vids AS (
        SELECT doc_id, text,
               CAST(length(text) AS BIGINT) * 40 AS duration_ms
        FROM documents WHERE doc_id % 10 = 0 AND length(text) > 0
    )
    SELECT doc_id,
           CAST(i AS BIGINT)          AS frame_idx,
           CAST(i * 1000 AS BIGINT)   AS ts_ms,
           sha256(text || CAST(i AS VARCHAR)) AS frame_sha
    FROM (SELECT doc_id, text,
                 unnest(generate_series(0, (duration_ms - 1) // 1000)) AS i
          FROM vids)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: per-payload frame-index explode driven by
    duration metadata (1 frame/sec), all JVM-side; the codec decode is a
    deterministic 32-byte fake (see operators/multimodal.py
    frame_sample). Oracle re-derives the identical (frame_idx, ts_ms,
    sha) fan-out with a per-row generate_series."""
    from pyspark_movie_recommender_spark.operators.multimodal import (
        attach_fake_video_payload,
        frame_sample,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    frames = frame_sample(attach_fake_video_payload(docs), every_ms=1000)
    return frames.select(
        "doc_id",
        "frame_idx",
        "ts_ms",
        F.lower(F.hex(F.col("frame_payload"))).alias("frame_sha"),
    )


# ---------------------------------------------------------------------------
# streaming (rows-only: checked for stream/batch equivalence in tests)
# ---------------------------------------------------------------------------


@query("streaming_tumbling_window")
def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling-window agg driven to completion with
    AvailableNow over the static events parquet; must equal the batch
    ``tumbling_window_events`` result (asserted in tests/test_streaming.py)."""
    from pyspark_movie_recommender_spark.streaming.jobs import tumbling_window_stream

    return tumbling_window_stream(spark, sf_dir, query_name="q_stream_tumbling")


@query("stratified_sample_documents")
def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy`` on lang, seeded):
    the training-data curation primitive for rebalancing a corpus by
    language/source. Sampling is partition-local — no shuffle; rows-only
    check (membership is seed+partitioning dependent by design).

    The lang→fraction policy is a static map (a curation config, like a
    real pipeline's per-source sampling rates) — no driver round-trip to
    enumerate strata; strata absent from the map default to 0.25 via a
    fraction column rather than ``sampleBy``'s dict contract."""
    docs = load_table(spark, sf_dir, "documents")
    policy = {"en": 0.5}  # named strata; everything else defaults
    frac = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in policy.items()],
        F.lit(0.25),
    )
    # Bernoulli per-stratum sample without enumerating strata: keep a row
    # iff a seeded uniform draw (deterministic per row) falls under its
    # stratum's fraction — exactly what sampleBy does per partition, but
    # expressible with a static policy and no collect() job.
    sampled = docs.withColumn("__u", F.rand(seed=7)).filter(F.col("__u") < frac)
    return sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))


@query("streaming_session_window")
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native gap-based session windows on the event stream (append mode
    + watermark: bounded state; sessions emit when the watermark passes
    their close)."""
    from pyspark_movie_recommender_spark.streaming.jobs import session_window_stream

    return session_window_stream(spark, sf_dir, query_name="q_stream_sessions")


@query("streaming_dedup_watermark")
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup with bounded state
    (``dropDuplicatesWithinWatermark`` on event_id)."""
    from pyspark_movie_recommender_spark.streaming.jobs import (
        dedup_within_watermark_stream,
    )

    return dedup_within_watermark_stream(spark, sf_dir, query_name="q_stream_dedup")


@query("streaming_running_user_totals")
def streaming_running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-stateful streaming (``applyInPandasWithState``): running
    per-user totals, state ∝ |users| not |events|."""
    from pyspark_movie_recommender_spark.streaming.jobs import (
        running_user_totals_stream,
    )

    return running_user_totals_stream(spark, sf_dir, query_name="q_stream_totals")


@query("streaming_enrich_join")
def streaming_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: events micro-batches enriched with the
    broadcast customer dim, aggregated per market segment (rows-only;
    stream≡batch equivalence in tests/test_streaming.py)."""
    from pyspark_movie_recommender_spark.streaming.jobs import enrich_join_stream

    return enrich_join_stream(spark, sf_dir, query_name="q_stream_enrich")


# ---------------------------------------------------------------------------
# ALS recommendation (the reference's identity — rows-only, ml-vs-mllib
# initialization differs; metric bands tested in tests/test_recommend.py)
# ---------------------------------------------------------------------------


@query("als_recommend_parts")
def als_recommend_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit-feedback ALS over order history: top-5 part
    recommendations per customer (reference ML1/ML2 on the driver's
    star schema: quantity-weighted purchases as ratings).
    """
    from pyspark_movie_recommender_spark.recommend import recommend_parts_for_customers

    return recommend_parts_for_customers(spark, sf_dir, k=5)


# ---------------------------------------------------------------------------
# join-type completion: outer/cross; pivot/unpivot; subqueries
# ---------------------------------------------------------------------------


@query(
    "left_join_order_fill",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus,
           CAST(COALESCE(l.n_items, 0) AS BIGINT) AS n_items,
           ROUND(COALESCE(l.qty, 0.0), 2)         AS qty
    FROM orders o
    LEFT JOIN (
        SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items, SUM(l_quantity) AS qty
        FROM lineitem GROUP BY l_orderkey
    ) l ON o.o_orderkey = l.l_orderkey
    """,
)
def left_join_order_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with NULL-fill — orders with no lineitems keep 0s.

    Aggregate-below-join: lineitem collapses to one row per orderkey
    BEFORE the join, so the join input is minimal (at 100 TB the
    difference between joining 6B rows and 1.5B rows).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"), F.sum("l_quantity").alias("qty"))
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.coalesce("n_items", F.lit(0)).cast("long").alias("n_items"),
            F.round(F.coalesce("qty", F.lit(0.0)), 2).alias("qty"),
        )
    )


@query(
    "full_outer_daily_activity",
    oracle="""
    SELECT COALESCE(s.d, p.d) AS day,
           CAST(COALESCE(s.n, 0) AS BIGINT) AS n_signups,
           CAST(COALESCE(p.n, 0) AS BIGINT) AS n_purchases
    FROM (SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS d, COUNT(*) AS n
          FROM events WHERE event_type = 'signup' GROUP BY 1) s
    FULL OUTER JOIN
         (SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS d, COUNT(*) AS n
          FROM events WHERE event_type = 'purchase' GROUP BY 1) p
      ON s.d = p.d
    """,
)
def full_outer_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two daily aggregates with COALESCE fill."""
    ev = load_table(spark, sf_dir, "events")

    def daily(kind):
        return (
            ev.filter(F.col("event_type") == kind)
            .groupBy(F.date_trunc("day", "ts").alias("d"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    s, p = daily("signup"), daily("purchase")
    return (
        s.withColumnRenamed("n", "ns")
        .join(p.withColumnRenamed("n", "np"), on=s["d"] == p["d"], how="full_outer")
        .select(
            F.coalesce(s["d"], p["d"]).alias("day"),
            F.coalesce("ns", F.lit(0)).cast("long").alias("n_signups"),
            F.coalesce("np", F.lit(0)).cast("long").alias("n_purchases"),
        )
    )


@query(
    "cross_join_region_status",
    oracle="""
    SELECT r.r_name, s.o_orderstatus,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_orders
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    LEFT JOIN (
        SELECT r2.r_name AS rn, o.o_orderstatus AS st, COUNT(*) AS n
        FROM orders o
        JOIN customer c2 ON o.o_custkey = c2.c_custkey
        JOIN nation n2   ON c2.c_nationkey = n2.n_nationkey
        JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
        GROUP BY 1, 2
    ) c ON c.rn = r.r_name AND c.st = s.o_orderstatus
    """,
)
def cross_join_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN scaffold (dense region x status grid) + left-join fill —
    the standard dense-report shape where missing combos must show 0."""
    region = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    statuses = orders.select("o_orderstatus").distinct()
    grid = region.select("r_name").crossJoin(statuses)
    counts = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("rn"), F.col("o_orderstatus").alias("st"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        grid.join(
            counts,
            (grid.r_name == counts.rn) & (grid.o_orderstatus == counts.st),
            "left",
        )
        .select(
            "r_name",
            "o_orderstatus",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_orders"),
        )
    )


@query(
    "pivot_priority_status",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS status_O,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS status_F,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS status_P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by priority x status (explicit value list, so
    the plan is a single pass — no distinct-values pre-query)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).cast("long").alias("status_O"),
            F.coalesce("F", F.lit(0)).cast("long").alias("status_F"),
            F.coalesce("P", F.lit(0)).cast("long").alias("status_P"),
        )
    )


@query(
    "unpivot_customer_measures",
    oracle="""
    SELECT c_custkey, 'acctbal' AS measure, c_acctbal AS val FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS measure, CAST(c_nationkey AS DOUBLE) AS val
    FROM customer
    """,
)
def unpivot_customer_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt wide measures to long (DataFrame.unpivot, Spark 3.4+)."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey", "c_acctbal", F.col("c_nationkey").cast("double").alias("nationkey")
    ).withColumnRenamed("c_acctbal", "acctbal").unpivot(
        ["c_custkey"], ["acctbal", "nationkey"], "measure", "val"
    )


@query(
    "correlated_above_avg_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > (
        SELECT AVG(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
)
def correlated_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join (RewriteCorrelatedScalarSubquery), the plan you'd
    write by hand."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_corr")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders_corr o
        WHERE o.o_totalprice > (
            SELECT AVG(o2.o_totalprice) FROM orders_corr o2
            WHERE o2.o_custkey = o.o_custkey)
        """
    )


# ---------------------------------------------------------------------------
# complex types: arrays, maps, structs, higher-order functions
# ---------------------------------------------------------------------------


@query(
    "explode_name_words",
    oracle="""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_brands
    FROM (SELECT p_partkey, p_brand, unnest(string_split(p_name, ' ')) AS word
          FROM part)
    WHERE length(word) > 0
    GROUP BY word
    """,
)
def explode_name_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY explode → re-aggregate (the genres-explode pattern the
    reference dropped at parse time, SURVEY.md §1.2)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select("p_partkey", "p_brand", F.explode(F.split("p_name", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.countDistinct("p_brand").alias("n_brands"),
        )
    )


@query(
    "higher_order_array_math",
    oracle="""
    SELECT p_partkey,
           CAST(list_aggregate(list_transform(range(1, p_size + 1), x -> x * x),
                               'sum') AS BIGINT)  AS sum_squares,
           CAST(len(list_filter(range(1, p_size + 1), x -> x % 3 = 0)) AS BIGINT)
                                                  AS n_div3,
           CAST(list_aggregate(list_transform(range(1, p_size + 1), x -> x), 'max')
                AS BIGINT)                        AS max_elem
    FROM part
    WHERE p_size >= 1
    """,
)
def higher_order_array_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions: sequence/transform/filter/aggregate stay
    inside codegen — the engine's no-UDF vector-math substrate."""
    part = load_table(spark, sf_dir, "part")
    seq = F.sequence(F.lit(1), F.col("p_size"))
    return part.filter(F.col("p_size") >= 1).select(
        "p_partkey",
        F.aggregate(
            F.transform(seq, lambda x: x * x),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("sum_squares"),
        F.size(F.filter(seq, lambda x: x % 3 == 0)).cast("long").alias("n_div3"),
        F.array_max(seq).cast("long").alias("max_elem"),
    )


@query(
    "struct_map_access",
    oracle="""
    SELECT doc_id,
           struct_extract({'lang': lang, 'src': source}, 'lang') AS meta_lang,
           map(['lang', 'source'], [lang, source])['source'][1]  AS m_source,
           CAST(length(source) AS INT)                           AS src_len
    FROM documents
    """,
)
def struct_map_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT construction/field access + MAP build/lookup as columns."""
    docs = load_table(spark, sf_dir, "documents")
    meta = F.struct(F.col("lang"), F.col("source").alias("src"))
    m = F.map_from_arrays(
        F.array(F.lit("lang"), F.lit("source")), F.array("lang", "source")
    )
    return docs.select(
        "doc_id",
        meta.getField("lang").alias("meta_lang"),
        F.element_at(m, "source").alias("m_source"),
        F.length("source").cast("int").alias("src_len"),
    )


@query(
    "window_rank_suite",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(DENSE_RANK() OVER w AS BIGINT)   AS drnk,
           CAST(NTILE(4) OVER w AS BIGINT)       AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6)       AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6)          AS cume,
           FIRST_VALUE(c_custkey) OVER w         AS richest,
           LAST_VALUE(c_custkey) OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest,
           NTH_VALUE(c_custkey, 2) OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-family completion: dense_rank/ntile/percent_rank/cume_dist/
    first/last/nth_value, one shuffle on the segment key."""
    from pyspark.sql.window import Window as W

    customer = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("c_custkey").over(w).alias("richest"),
        F.last("c_custkey").over(wfull).alias("poorest"),
        F.nth_value("c_custkey", 2).over(wfull).alias("second"),
    )


@query(
    "union_all_bag",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'P'
    """,
)
def union_all_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL bag semantics (reference U1, ``recommender.py:122``):
    urgent orders + pending orders, overlap kept twice, no dedup."""
    from pyspark_movie_recommender_spark.operators.relational import union_all

    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderstatus"
    )
    b = orders.filter(F.col("o_orderstatus") == "P").select(
        "o_orderkey", "o_orderstatus"
    )
    return union_all(a, b)


@query(
    "like_filter_parts",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_name LIKE '%gear%'
       OR p_name LIKE 'red%'
       OR (p_type LIKE '_CONOMY' AND p_brand NOT LIKE '%#1_')
    """,
)
def like_filter_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE pattern predicates: %, _ wildcards, NOT LIKE — all pushable
    as StringContains/StartsWith filters."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_name").like("%gear%")
        | F.col("p_name").like("red%")
        | (F.col("p_type").like("_CONOMY") & ~F.col("p_brand").like("%#1_"))
    ).select("p_partkey", "p_name", "p_type")


@query(
    "tfidf_terms",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\\s+') END AS t
        FROM documents WHERE doc_id % 20 = 0
    ), tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(t) AS term FROM toks)
        GROUP BY doc_id, term
    ), df AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM tf GROUP BY term
    ), n AS (SELECT COUNT(*) AS n_docs FROM toks)
    SELECT tf.doc_id, tf.term, tf.tf,
           ROUND(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
    FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    """,
)
def tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF in pure SQL (no HashingTF hash collisions): explode terms,
    per-doc tf, per-term df, smoothed idf ln((N+1)/(df+1)).

    Scale shape: two aggregations on naturally-partitionable keys; the
    tiny df relation broadcasts back onto tf. Deterministic (unlike
    HashingTF buckets) and oracle-checkable.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    toks = docs.select("doc_id", F.explode(ws_tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # corpus size as a 1-row broadcast, not a driver-side .count() action —
    # the whole query stays one lazy plan
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )


@query(
    "token_heavy_hitters",
    oracle="""
    WITH toks AS (
        SELECT CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(lower(trim(text)), '\\s+') END AS t
        FROM documents
    )
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(t) AS token FROM toks)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
    bench=True,
)
def token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 most frequent tokens (exact heavy hitters).

    Scale shape: explode → hash-agg with map-side partial combine (the
    token key space is small relative to occurrences, so partial agg
    collapses most of the volume before the shuffle) → TakeOrdered for
    the top-k. The exact twin of a count-min-sketch heavy-hitters pass;
    ties break on token so the limit is engine-stable.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(ws_tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


@query("approx_quantiles_prices")
def approx_quantiles_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (GK sketch) per returnflag — with HLL
    distinct, the approximate-aggregation scale toolkit (rows-only:
    sketch results are engine-specific)."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75, 0.99], 10000).alias(
            "q"
        ),
        F.approx_count_distinct("l_partkey").alias("n_parts_approx"),
    )
    # project the sketch's array to scalar columns: the driver's rows-only
    # canonicalizer hashes values and cannot hash list cells (the r1
    # multimodal failure mode)
    return agg.select(
        "l_returnflag",
        F.element_at("q", 1).alias("q25"),
        F.element_at("q", 2).alias("q50"),
        F.element_at("q", 3).alias("q75"),
        F.element_at("q", 4).alias("q99"),
        "n_parts_approx",
    )


# ---------------------------------------------------------------------------
# time-series resampling + distribution analytics
# ---------------------------------------------------------------------------


@query(
    "resample_user_daily",
    oracle="""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               ROUND(SUM(value), 6) AS day_value,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ), span AS (
        SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ), grid AS (
        SELECT user_id,
               unnest(generate_series(d0, d1, INTERVAL '1 day')) AS day
        FROM span
    )
    SELECT g.user_id, g.day,
           COALESCE(d.day_value, 0) AS day_value,
           COALESCE(d.n_events, 0) AS n_events
    FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    """,
)
def resample_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily resampling per user: aggregate to a daily grain,
    then regenerate the full min..max day grid per key (`sequence` +
    `explode`) and left-join actuals back, zero-filling silent days.

    The canonical time-series densification op the reference lacks
    (its events are batch rows only — SURVEY §2.B streaming row).
    Scale shape: one shuffle on user_id for the daily agg; span and
    grid reuse that partitioning, so the left join is co-partitioned.
    Grid explosion is bounded by days-in-range, not event count —
    at 100 TB the grid is tiny next to the raw events.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.round(F.sum("value"), 6).alias("day_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    return grid.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("day_value", F.lit(0.0)).alias("day_value"),
        F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
    )


@query(
    "exact_percentiles_by_flag",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def exact_percentiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — the checkable twin of
    `approx_quantiles_prices` (GK sketch, rows-only). Spark `percentile`
    and DuckDB `quantile_cont` share the p*(n-1) linear-interpolation
    definition, so values hash-match.

    Scale note: exact percentile sorts each group's values in memory —
    right for bounded group cardinality; at 100 TB per-group value
    counts in the billions, switch to percentile_approx (same query
    shape, sketch mergeable map-side).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(F.expr(f"percentile(l_extendedprice, {p})"), 4).alias(a)
            for p, a in [(0.25, "p25"), (0.50, "p50"), (0.75, "p75"), (0.99, "p99")]
        ]
    )


@query(
    "histogram_order_totals",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi,
           ROUND(AVG(o_totalprice), 4) AS avg_price
    FROM orders GROUP BY 1
    """,
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram by arithmetic binning — distribution
    profiling without a sort (contrast K2's global orderBy). FLOOR of
    an IEEE double division is bit-identical across engines, so the
    bucketing is deterministic.

    Scale shape: single hash-agg on a derived low-cardinality key;
    partial aggregation collapses each partition to ≤ n_buckets rows
    before the shuffle — the histogram of 100 TB moves KBs.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / F.lit(25000.0)).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# training-data curation: decontamination, edit-distance dedup, boilerplate
# ---------------------------------------------------------------------------


@query(
    "decontaminate_ngram_overlap",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents WHERE trim(text) <> ''
    ), grams AS (
        SELECT doc_id, array_to_string(t[i : i + 9], ' ') AS gram
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 9)) AS i
              FROM toks WHERE len(t) >= 10)
    ), ev AS (
        SELECT DISTINCT gram FROM grams WHERE doc_id % 25 = 0
    ), tr AS (
        SELECT doc_id, gram FROM grams WHERE doc_id % 25 <> 0
    )
    SELECT tr.doc_id,
           CAST(COUNT(DISTINCT tr.gram) AS BIGINT) AS n_shared_grams,
           MAX(tr.gram) AS sample_gram
    FROM tr JOIN ev ON tr.gram = ev.gram
    GROUP BY tr.doc_id
    """,
    bench=True,
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    10-gram with a held-out eval set (doc_id % 25 = 0 stands in for the
    benchmark corpus). The standard pretraining hygiene pass (e.g.
    GPT-3 appendix C / PaLM-style 13-gram overlap), absent from the
    reference, which has no text surface at all.

    Scale shape: eval-set distinct grams are tiny next to the training
    corpus, so the overlap join broadcasts; the training side streams
    through without a shuffle until the final per-doc aggregate. Gram
    explosion is linear in corpus tokens.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents").filter(F.trim("text") != "")
    toks = docs.select("doc_id", ws_tokens("text").alias("t"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 10 THEN "
                "transform(sequence(1, size(t) - 9),"
                " i -> array_join(slice(t, i, 10), ' ')) "
                "ELSE array() END"
            )
        ).alias("gram"),
    )
    ev = grams.filter(F.col("doc_id") % 25 == 0).select("gram").distinct()
    tr = grams.filter(F.col("doc_id") % 25 != 0)
    return (
        tr.join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").alias("n_shared_grams"),
            F.max("gram").alias("sample_gram"),
        )
    )


@query(
    "levenshtein_neardup",
    oracle="""
    SELECT a.doc_id AS left_id, b.doc_id AS right_id,
           CAST(levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS BIGINT)
               AS edit_distance
    FROM documents a JOIN documents b
      ON a.lang = b.lang
     AND b.n_chars // 50 BETWEEN a.n_chars // 50 - 1 AND a.n_chars // 50 + 1
     AND a.doc_id < b.doc_id
    WHERE levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) <= 8
    """,
    bench=True,
)
def levenshtein_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup mining with bucket±1 blocking: candidate
    pairs are restricted to the same lang and adjacent length buckets
    before the O(n²) levenshtein runs on 40-char prefixes — the ±1
    expansion recovers pairs straddling a bucket boundary (len 49 vs 51)
    that plain blocking silently drops. Complements the set-based
    near-dup family (MinHash/SimHash/Jaccard) with an order-sensitive
    measure. See operators/dedup.py blocked_levenshtein_pairs for the
    distributed shape.
    """
    from pyspark_movie_recommender_spark.operators.dedup import (
        blocked_levenshtein_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return blocked_levenshtein_pairs(docs)


@query(
    "boilerplate_ngram_ratio",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents WHERE trim(text) <> ''
    ), grams AS (
        SELECT doc_id, array_to_string(t[i : i + 2], ' ') AS gram
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
              FROM toks WHERE len(t) >= 3)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct,
           ROUND(1.0 - COUNT(DISTINCT gram) * 1.0 / COUNT(*), 6) AS rep_ratio
    FROM grams GROUP BY doc_id
    """,
)
def boilerplate_ngram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: fraction of repeated 3-grams per document
    (high ratio → templated/spammy text). A standard quality-filter
    signal alongside `doc_profile`'s length/diversity heuristics.

    Scale shape: explode + one hash-agg keyed by doc_id — partial
    aggregation collapses each doc's grams map-side; no join at all.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents").filter(F.trim("text") != "")
    toks = docs.select("doc_id", ws_tokens("text").alias("t"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 3 THEN "
                "transform(sequence(1, size(t) - 2),"
                " i -> array_join(slice(t, i, 3), ' ')) "
                "ELSE array() END"
            )
        ).alias("gram"),
    )
    return grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.countDistinct("gram").alias("n_distinct"),
        F.round(
            1.0 - F.countDistinct("gram") * 1.0 / F.count(F.lit(1)), 6
        ).alias("rep_ratio"),
    )


# ---------------------------------------------------------------------------
# Python-UDF surface (operators/udf_surface.py) — every sanctioned
# Arrow-batched form registered with a DuckDB oracle: the UDF result must
# equal the declarative SQL it generalizes.
# ---------------------------------------------------------------------------


@query(
    "udaf_gini_per_segment",
    oracle="""
    WITH s AS (
        SELECT c_mktsegment, c_acctbal,
               SUM(c_acctbal) OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal, c_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(c_acctbal) OVER (PARTITION BY c_mktsegment) AS tot,
               COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
        FROM customer
    )
    SELECT c_mktsegment,
           ROUND((n + 1 - 2 * SUM(cum / tot)) / n, 6) AS acctbal_gini,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM s GROUP BY c_mktsegment, n
    """,
)
def udaf_gini_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF): Gini coefficient of account
    balances per market segment — no built-in SQL aggregate computes it,
    the vectorized UDAF does, and the oracle re-derives the same value
    declaratively from a sorted cumulative sum (G = (n+1-2·Σcumᵢ/tot)/n).
    """
    from pyspark_movie_recommender_spark.operators.udf_surface import (
        spend_gini_per_segment,
    )

    customer = load_table(spark, sf_dir, "customer")
    out = spend_gini_per_segment(customer)
    return out.select(
        "c_mktsegment",
        F.round("acctbal_gini", 6).alias("acctbal_gini"),
        F.col("n_customers").cast("long").alias("n_customers"),
    )


@query(
    "udf_zscore_orders",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROUND(CASE WHEN STDDEV_POP(o_totalprice)
                           OVER (PARTITION BY o_orderpriority) = 0
                      THEN 0.0
                      ELSE (o_totalprice - AVG(o_totalprice)
                                OVER (PARTITION BY o_orderpriority))
                           / STDDEV_POP(o_totalprice)
                                OVER (PARTITION BY o_orderpriority)
                 END, 6) AS zscore
    FROM orders
    """,
)
def udf_zscore_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas per-group standardization (group → pandas frame →
    group): z-score of order totalprice within each order priority. The
    oracle computes the identical population z-score with window
    aggregates — UDF path and declarative path must agree to 6 decimals.
    """
    from pyspark_movie_recommender_spark.operators.udf_surface import zscore_per_group

    orders = load_table(spark, sf_dir, "orders")
    out = zscore_per_group(orders, "o_orderpriority", "o_totalprice")
    return out.select(
        "o_orderkey", "o_orderpriority", F.round("zscore", 6).alias("zscore")
    )


@query(
    "udtf_word_ngrams",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents WHERE doc_id % 5 = 0 AND trim(text) <> ''
    )
    SELECT doc_id, CAST(i - 1 AS INT) AS pos,
           array_to_string(t[i : i + 2], ' ') AS ngram
    FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
          FROM toks WHERE len(t) >= 3)
    """,
)
def udtf_word_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one document row in → one row per
    word 3-gram out, lateral-joined against the documents scan. The
    oracle derives the same rows with a per-row generate_series."""
    from pyspark_movie_recommender_spark.operators.udf_surface import (
        make_explode_ngrams_udtf,
    )

    udtf_cls = make_explode_ngrams_udtf()
    spark.udtf.register("explode_ngrams", udtf_cls)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    docs.createOrReplaceTempView("udtf_docs_subset")
    return spark.sql(
        """
        SELECT g.doc_id, g.pos, g.ngram
        FROM udtf_docs_subset d,
             LATERAL explode_ngrams(d.doc_id, d.text, 3) g
        """
    )


@query(
    "udf_sigmoid_part_price",
    oracle="""
    SELECT p_partkey,
           ROUND(1.0 / (1.0 + exp(-(p_retailprice - 1500.0) / 250.0)), 6)
               AS price_sigmoid
    FROM part
    """,
)
def udf_sigmoid_part_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF: logistic squash of centred part price — the
    Arrow-batched Series→Series form, checked against the closed-form
    SQL it implements."""
    from pyspark_movie_recommender_spark.operators.udf_surface import sigmoid_scale

    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.round(
            sigmoid_scale((F.col("p_retailprice") - 1500.0) / 250.0), 6
        ).alias("price_sigmoid"),
    )


# ---------------------------------------------------------------------------
# round 2 additions: mergeable sketches, forward-fill densification,
# scalar-subquery + anti-join analytics
# ---------------------------------------------------------------------------


@query(
    "forward_fill_user_value",
    oracle="""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               ROUND(AVG(value), 6) AS day_avg
        FROM events GROUP BY 1, 2
    ), span AS (
        SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ), grid AS (
        SELECT user_id,
               unnest(generate_series(d0, d1, INTERVAL '1 day')) AS day
        FROM span
    )
    SELECT g.user_id, g.day,
           last_value(d.day_avg IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_avg,
           d.day_avg IS NOT NULL AS observed
    FROM grid g LEFT JOIN daily d
      ON g.user_id = d.user_id AND g.day = d.day
    """,
)
def forward_fill_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill densification: regenerate the per-user daily grid
    (as in ``resample_user_daily``) and carry the LAST OBSERVED daily
    average into silent days — ``last(col, ignorenulls=True)`` over a
    running row frame, the gap-fill semantics zero-fill can't express
    (sensor/price panels, not counters).

    Scale shape: one shuffle on user_id for the daily agg; the span,
    grid join and the fill window all reuse that partitioning, so the
    whole densify+fill pipeline is a single exchange. Grid size is
    bounded by |users|·days, independent of raw event count.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.round(F.avg("value"), 6).alias("day_avg"))
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    joined = grid.join(daily, ["user_id", "day"], "left")
    fill_w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        F.last("day_avg", ignorenulls=True).over(fill_w).alias("filled_avg"),
        F.col("day_avg").isNotNull().alias("observed"),
    )


@query(
    "global_sales_opportunity",
    oracle="""
    WITH seg AS (
        SELECT * FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
    ), avg_bal AS (
        SELECT AVG(c_acctbal) AS a FROM seg WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM seg c
    WHERE c.c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY c_mktsegment
    """,
)
def global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (ref has no subquery surface at all): customers
    in target segments with above-average positive balance and NO urgent
    order — a global-scalar subquery plus a NOT EXISTS anti-join feeding
    an aggregate.

    Scale shape: the scalar average is one partial-agg job broadcast as
    a literal-like 1-row cross join (no shuffle of the fact side); the
    anti join shuffles only (custkey) pairs; the final agg is a 3-group
    hash agg. Catalyst plans the NOT EXISTS as LeftAnti directly.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    seg = customer.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY")
    )
    avg_bal = seg.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        seg.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(urgent, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query("hll_sketch_rollup")
def hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches — the 100 TB cardinality
    pattern: build one Apache-DataSketches HLL per order priority
    (``hll_sketch_agg``, map-side partial agg), report per-group
    estimates, then UNION THE SKETCHES (``hll_union_agg``) for the
    global estimate instead of rescanning the fact table.

    Mergeability is the point: per-partition/per-day sketches can be
    stored and rolled up later at any grain for free. Rows-only for the
    driver (estimates are sketch-parameter-dependent);
    tests/test_operators.py pins estimates to exact counts within HLL
    error and checks union(sketches) == sketch(union).
    """
    orders = load_table(spark, sf_dir, "orders")
    sketches = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey", 12).alias("sk")
    )
    per_group = sketches.select(
        F.col("o_orderpriority").alias("grain"),
        F.hll_sketch_estimate("sk").alias("approx_customers"),
    )
    merged = sketches.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("grain"),
        F.hll_sketch_estimate("sk").alias("approx_customers"),
    )
    return per_group.unionByName(merged)


@query(
    "variant_shred_events",
    bench=True,
    oracle="""
    WITH shred AS (
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, value
        FROM events
    )
    SELECT k % 7                      AS k_mod,
           CAST(COUNT(*) AS BIGINT)  AS n_events,
           ROUND(SUM(value), 2)      AS total_value,
           MIN(k)                    AS min_k,
           MAX(k)                    AS max_k
    FROM shred GROUP BY 1
    """,
)
def variant_shred_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics over the VARIANT type (Spark 4,
    SPARK-45827): ``parse_json`` shreds props into the binary variant
    encoding ONCE, then typed ``variant_get`` paths feed grouping and
    aggregation — the open-format answer to JSON-string re-parsing per
    expression (``json_extract_events`` is the string-path twin).

    Scale shape: parse + typed get are map-side scalar expressions in
    whole-stage codegen; the only shuffle is the 7-group hash agg, with
    map-side partial aggregation.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select(k.alias("k"), "value")
        .groupBy((F.col("k") % 7).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "pysource_synthetic_docs",
    oracle="""
    SELECT i                     AS id,
           'doc-' || i           AS title,
           rtrim(repeat(
               ['alpha','beta','gamma','delta','epsilon','zeta','eta','theta']
                   [i % 8 + 1] || ' ',
               i % 5 + 1))       AS body,
           CAST(length(rtrim(repeat(
               ['alpha','beta','gamma','delta','epsilon','zeta','eta','theta']
                   [i % 8 + 1] || ' ',
               i % 5 + 1))) AS INTEGER) AS body_len
    FROM (SELECT unnest(generate_series(0, 1999)) AS i)
    WHERE i % 3 = 0
    """,
)
def pysource_synthetic_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector via the Spark 4 Python DataSource API
    (sources/pydatasource.py): an 8-way partitioned deterministic
    generator scanned like any table; the filter-and-project runs on the
    source's own splits. The oracle replays the generator row function
    in pure SQL, so the connector sits under the same correctness gate
    as the builtin sources."""
    from pyspark_movie_recommender_spark.sources import pydatasource

    pydatasource.register(spark)
    docs = spark.read.format("synthetic_docs").option("numRows", 2000).load()
    return docs.filter(F.col("id") % 3 == 0)


@query(
    "cohort_retention_weekly",
    bench=True,
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY 1
    ), activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
        FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) // 7 AS BIGINT)
               AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted
    in each subsequent activity week — the canonical product-analytics
    rollup (cohort × offset triangle).

    Scale shape: both the first-seen agg and the distinct-activity agg
    shuffle once on user_id; the cohort join is then co-partitioned on
    user_id, and only the final (cohort, offset) agg re-keys — three
    hash aggs, two on the same key. At 100 TB the distinct-activity
    dedup is the volume reducer (events → user-weeks) before any join.
    """
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("active_week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.floor(
                    F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
                ).cast("bigint")
            ).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    )


@query(
    "event_funnel_ordered",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MIN(ts) FILTER (WHERE event_type = 'signup')   AS t_signup,
               MIN(ts) FILTER (WHERE event_type = 'view')     AS t_view,
               MIN(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) FILTER (WHERE t_signup IS NOT NULL) AS BIGINT)
               AS n_signup,
           CAST(COUNT(*) FILTER (WHERE t_signup IS NOT NULL
                                   AND t_view > t_signup) AS BIGINT)
               AS n_signup_view,
           CAST(COUNT(*) FILTER (WHERE t_signup IS NOT NULL
                                   AND t_view > t_signup
                                   AND t_purchase > t_view) AS BIGINT)
               AS n_signup_view_purchase
    FROM per_user
    """,
)
def event_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose FIRST signup precedes their first
    view precedes their first purchase — order-sensitive conversion, not
    mere event presence. One conditional-min aggregation per step, then
    a single global rollup.

    Scale shape: conditional aggregates fold the funnel into one
    user_id-keyed hash agg (map-side partial) — no self-joins, no
    per-step passes over the events table; the classic N-way funnel
    self-join collapses into FILTERed MINs.
    """
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    step1 = F.col("t_signup").isNotNull()
    step2 = step1 & (F.col("t_view") > F.col("t_signup"))
    step3 = step2 & (F.col("t_purchase") > F.col("t_view"))
    return per_user.agg(
        F.count(F.when(step1, 1)).cast("bigint").alias("n_signup"),
        F.count(F.when(step2, 1)).cast("bigint").alias("n_signup_view"),
        F.count(F.when(step3, 1)).cast("bigint").alias("n_signup_view_purchase"),
    )


@query(
    "ordered_status_concat",
    oracle="""
    SELECT o_custkey,
           string_agg(o_orderstatus, ','
                      ORDER BY o_orderdate, o_orderkey) AS status_seq,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def ordered_status_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ordered list aggregation: per-customer order-status
    sequence in (date, key) order. ``collect_list`` alone is
    partition-order-nondeterministic — the engine form collects
    (date, key, status) structs and ``array_sort``s them, making the
    concat reproducible on any partitioning (the property that matters
    for audit/export pipelines).
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("o_orderdate", "o_orderkey", "o_orderstatus")
                    )
                ),
                lambda x: x.o_orderstatus,
            ),
            ",",
        ).alias("status_seq"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )


@query(
    "robust_try_casts",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE TRY_CAST(event_type AS BIGINT) IS NULL)
                AS BIGINT) AS n_uncastable,
           CAST(COUNT(*) FILTER (
                WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 = 0)
                AS BIGINT) AS n_zero_div,
           ROUND(SUM(value / NULLIF(
                CAST(json_extract_string(props, '$.k') AS BIGINT) % 3, 0)), 2)
               AS safe_div_sum
    FROM events GROUP BY event_type
    """,
)
def robust_try_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe ingestion expressions (ANSI mode without the blast
    radius): ``try_cast`` turns malformed casts into NULLs instead of
    failing the job, ``try_divide`` absorbs divide-by-zero — the
    row-level robustness a 100 TB ingest needs, where one bad record
    must not kill a 6-hour job. Failure counts are surfaced as metrics
    rather than exceptions.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.when(F.col("event_type").try_cast("bigint").isNull(), 1))
        .cast("bigint")
        .alias("n_uncastable"),
        F.count(F.when(k % 3 == 0, 1)).cast("bigint").alias("n_zero_div"),
        F.round(F.sum(F.try_divide(F.col("value"), k % 3)), 2).alias(
            "safe_div_sum"
        ),
    )


@query("als_item_neighbors")
def als_item_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item related-parts from ALS item factors: cosine top-k over
    the trained factor matrix via the similarity operator library
    (rows-only: factor values are initialization-dependent; neighbor
    sanity is pinned in tests/test_recommend.py)."""
    from pyspark_movie_recommender_spark.recommend import item_neighbors_from_factors

    return item_neighbors_from_factors(spark, sf_dir)


@query(
    "rolling_median_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(quantile_cont(o_totalprice, 0.5) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 3) AS roll_median
    FROM orders
    """,
)
def rolling_median_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 5-order median spend per customer: an order-statistic
    (not sum/avg) over a moving row frame — robust-trend analytics that
    mean-based frames can't express. ``percentile`` runs as a true
    window aggregate (linear interpolation, matching ``quantile_cont``; rounded to 3
    decimals — even-count frames interpolate to exact .xx5 midpoints,
    where 2-decimal rounding is float-boundary-unstable across engines).

    Scale shape: one exchange on o_custkey; the frame is 5 rows so
    per-row cost is O(frame log frame) with no second shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.expr("percentile(o_totalprice, 0.5)").over(w), 3).alias(
            "roll_median"
        ),
    )


# shared-dialect recursive CTE: the SAME string runs on spark.sql and the
# DuckDB oracle (like sql_shipping_priority) — integer division spelled
# CAST(floor(x/10)) so both dialects parse it
_RECURSIVE_CHAIN_SQL = """
    WITH RECURSIVE chain AS (
        SELECT c_custkey AS node,
               CAST(c_custkey AS BIGINT) AS anchor,
               0 AS depth
        FROM customer WHERE c_custkey < 50
        UNION ALL
        SELECT CAST(floor(node / 10) AS BIGINT), anchor, depth + 1
        FROM chain WHERE node > 0
    )
    SELECT anchor,
           CAST(MAX(depth) AS BIGINT) AS chain_len,
           CAST(SUM(node) AS BIGINT)  AS chain_sum
    FROM chain GROUP BY anchor
"""


@query("sql_recursive_chain", oracle=_RECURSIVE_CHAIN_SQL)
def sql_recursive_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4, SPARK-24497): walk each seed customer key
    up its digit-truncation hierarchy (node → node div 10) to the root —
    the BOM-explosion / org-chart traversal shape, expressed in the
    shared ANSI dialect and executed verbatim by BOTH engines.

    Scale shape: Spark plans each recursive step as a UnionLoop over the
    previous iteration's output; depth is bounded by log₁₀(maxkey), and
    each step is a narrow projection — no joins, no widening state.
    """
    for t in ("customer",):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_RECURSIVE_CHAIN_SQL)


@query(
    "pipeline_decl_top_nations",
    oracle="""
    WITH big AS (
        SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 150000
    ), cust AS (
        SELECT c_custkey, c_nationkey FROM customer
    )
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT)      AS n_big_orders,
           ROUND(SUM(b.o_totalprice), 2) AS revenue
    FROM big b
    JOIN cust c ON b.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    LIMIT 10
    """,
)
def pipeline_decl_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declarative pipeline front door (pipeline.py): this exact
    JSON-able spec — two joins, an aggregate, a top-k — interprets into
    ONE lazy Catalyst plan, so pushdown/pruning/broadcast behave as if
    the DataFrame code were hand-written. A spec cannot express a
    collect, a Python UDF, or a driver loop: the whole surface stays on
    the optimizer's side."""
    from pyspark_movie_recommender_spark.pipeline import run_pipeline

    spec = {
        "source": {"table": "orders"},
        "steps": [
            {"op": "filter", "expr": "o_totalprice > 150000"},
            {"op": "select", "cols": ["o_custkey", "o_totalprice"]},
            {
                "op": "join",
                "right": {
                    "source": {"table": "customer"},
                    "steps": [
                        {"op": "select", "cols": ["c_custkey", "c_nationkey"]},
                        {"op": "with_column", "name": "o_custkey",
                         "expr": "c_custkey"},
                        {"op": "select", "cols": ["o_custkey", "c_nationkey"]},
                    ],
                },
                "on": ["o_custkey"],
            },
            {
                "op": "join",
                "right": {
                    "source": {"table": "nation"},
                    "steps": [
                        {"op": "with_column", "name": "c_nationkey",
                         "expr": "n_nationkey"},
                        {"op": "select", "cols": ["c_nationkey", "n_name"]},
                    ],
                },
                "on": ["c_nationkey"],
                "broadcast": True,
            },
            {
                "op": "groupby_agg",
                "keys": ["n_name"],
                "aggs": {
                    "n_big_orders": "cast(count(1) as bigint)",
                    "revenue": "round(sum(o_totalprice), 2)",
                },
            },
            {"op": "orderby", "cols": ["revenue DESC", "n_name"], "limit": 10},
        ],
    }
    return run_pipeline(spark, sf_dir, spec)


@query(
    "custdist_order_counts",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def custdist_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts —
    an aggregate OF an aggregate, with the left join keeping zero-order
    customers in the histogram.

    Scale shape: first agg shuffles on c_custkey (left join is
    co-partitioned with it); second agg is tiny (|distinct counts|).
    COUNT(o_orderkey) — not COUNT(*) — so unmatched customers count 0.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


@query(
    "large_volume_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 150
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM orders o
    JOIN big b ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity clears a threshold
    (HAVING over a groupBy), rejoined to customers and line detail for
    the top-100 report.

    Scale shape: the HAVING pre-aggregate runs on l_orderkey FIRST and
    is a semi-join-style reducer — only qualifying orderkeys flow into
    the 3-way join; final TakeOrdered caps the report without a global
    sort.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        orders.join(big, orders.o_orderkey == big.big_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "regional_supplier_revenue",
    bench=True,
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
)
def regional_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join with the LOCAL-supplier condition
    (customer and supplier share a nation) and a region filter —
    the join-ordering stress test of the classic suite.

    Scale shape: nation/region/supplier broadcast (small dims); the
    fact-side chain shuffles customer⋈orders on custkey then ⋈lineitem
    on orderkey; the c_nationkey = s_nationkey equality rides the
    supplier join as a second key, never a post-join filter over a
    wider product. Region filter prunes before any fact joins via the
    broadcast dim.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    dims = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey).select("n_nationkey", "n_name")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(dims, s.s_nationkey == dims.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "promo_revenue_ratio",
    oracle="""
    SELECT CAST(date_trunc('year', l.l_shipdate) AS DATE) AS ship_year,
           ROUND(100.0 *
               SUM(CASE WHEN p.p_type = 'PROMO'
                        THEN l.l_extendedprice * (1 - l.l_discount)
                        ELSE 0 END)
               / SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
               AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share per ship-year — a
    conditional-aggregate ratio over a fact⋈dim join (CASE inside SUM,
    one pass, no self-join).

    Scale shape: part is the broadcast side; the ratio needs a single
    hash agg on the year key with both sums accumulated together.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.to_date(F.date_trunc("year", F.col("l_shipdate"))).alias("ship_year")
        )
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


@query(
    "map_hof_roundtrip",
    oracle="""
    SELECT user_id, event_type,
           CAST(2 * COUNT(*) AS BIGINT) AS doubled
    FROM events
    GROUP BY user_id, event_type
    """,
)
def map_hof_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column round trip: per-user counts collected into a
    MAP<event_type, n> (``map_from_entries``), transformed value-wise
    with the ``transform_values`` higher-order function, then exploded
    back to rows — construction, HOF update, and flattening of map
    columns, with the declarative groupBy as the oracle.

    Scale shape: one shuffle for the (user, type) agg; the map is built
    per-user from its own rows (collect_list feeds map_from_entries
    within the user_id agg) and never leaves the JVM.
    """
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    maps = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    doubled = maps.select(
        "user_id",
        F.transform_values("m", lambda _, v: v * 2).alias("m2"),
    )
    return doubled.select(
        "user_id", F.explode("m2").alias("event_type", "doubled")
    ).select("user_id", "event_type", F.col("doubled").cast("bigint"))


@query(
    "right_join_nation_suppliers",
    oracle="""
    SELECT n.n_name,
           s.s_suppkey,
           COALESCE(s.s_acctbal, 0.0) AS acctbal
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def right_join_nation_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: every nation row survives even with no
    suppliers (NULL-filled left side) — the mirror of
    ``left_join_order_fill`` completing the outer-join family.

    Scale shape: Catalyst rewrites right joins as left joins with sides
    swapped, so the small preserved side (nation) broadcasts and the
    fact side never shuffles.
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey, "right").select(
        "n_name",
        "s_suppkey",
        F.coalesce(F.col("s_acctbal"), F.lit(0.0)).alias("acctbal"),
    )


@query(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_custkey' AS col,
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT)   AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR)             AS min_v,
           CAST(MAX(o_custkey) AS VARCHAR)             AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           CAST(MIN(o_orderstatus) AS VARCHAR),
           CAST(MAX(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(MIN(o_totalprice) AS VARCHAR),
           CAST(MAX(o_totalprice) AS VARCHAR)
    FROM orders
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (deequ-style data quality pass): null count,
    distinct count, min/max per column, computed in ONE scan — all
    per-column aggregates live in the same hash agg, then unpivot to a
    (col, metrics) report. The oracle recomputes column-by-column;
    equality proves the single-pass fusion loses nothing.

    Scale shape: one pass over the fact table, no shuffle beyond the
    global agg (a single reduce row), then a constant-size explode.
    """
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_totalprice"]
    aggs = []
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"{c}__null"),
            F.countDistinct(c).cast("bigint").alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = load_table(spark, sf_dir, "orders").agg(*aggs)
    profile = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(f"{c}__null").alias("n_null"),
                        F.col(f"{c}__distinct").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_v"),
                        F.col(f"{c}__max").alias("max_v"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return profile.select("p.col", "p.n_null", "p.n_distinct", "p.min_v", "p.max_v")


@query("multimodal_audio_rms")
def multimodal_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality feature extraction: windowed RMS energy over PCM16
    payloads through the Arrow mapInPandas fan-out (rows-only: the
    byte→int16 decode is not SQL-expressible; exactness vs a NumPy
    reference is pinned in tests/test_operators.py)."""
    from pyspark_movie_recommender_spark.operators.multimodal import (
        attach_fake_audio_payload,
        audio_window_rms,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return audio_window_rms(attach_fake_audio_payload(docs))


@query(
    "cross_nation_volume",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                    * CAST(ROUND((1 - l.l_discount) * 100) AS BIGINT))
                AS BIGINT) AS volume_e4
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_name < sn.n_name
      AND cn.n_regionkey = sn.n_regionkey
    GROUP BY 1, 2, 3
    """,
)
def cross_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between DISTINCT nation pairs within
    a region, by ship year — the same dimension table joined twice under
    different roles (customer nation vs supplier nation) with a pair
    ordering predicate to dedup the matrix.

    Scale shape: both nation roles broadcast; the fact chain shuffles
    once per fact join key; the pair predicate rides the broadcast joins
    as a post-condition on tiny dims, never a fact-fact theta join.

    Revenue is fixed-point EXACT: cents x discount-basis-points summed
    as BIGINT (volume_e4 = dollars x 10^4) — float-sum rounding cannot
    diverge across engines/summation orders at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("cnk"),
            F.col("n_name").alias("cust_nation"),
            F.col("n_regionkey").alias("crk"),
        )
    )
    sn = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("snk"),
            F.col("n_name").alias("supp_nation"),
            F.col("n_regionkey").alias("srk"),
        )
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(cn, c.c_nationkey == F.col("cnk"))
        .join(sn, s.s_nationkey == F.col("snk"))
        .filter(
            (F.col("cust_nation") < F.col("supp_nation"))
            & (F.col("crk") == F.col("srk"))
        )
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * F.round((1 - F.col("l_discount")) * 100).cast("long")
            )
            .cast("bigint")
            .alias("volume_e4")
        )
    )


@query(
    "from_json_typed_events",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS absent
    FROM events WHERE event_type = 'error'
    """,
)
def from_json_typed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing: ``from_json`` with an explicit schema shreds
    props into a struct ONCE (missing fields become typed NULLs), versus
    the per-path ``get_json_object`` twin (``json_extract_events``)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.filter(F.col("event_type") == "error").select(
        "event_id",
        F.from_json("props", "k bigint, missing bigint").alias("p"),
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.col("p.missing").alias("absent"),
    )


@query(
    "null_semantics_suite",
    oracle="""
    WITH t AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN NULL
                    ELSE o_orderpriority END AS p1,
               CASE WHEN o_orderkey % 5 = 0 THEN NULL
                    ELSE o_orderpriority END AS p2
        FROM orders
    )
    SELECT CAST(COUNT(*) FILTER (WHERE p1 = p2) AS BIGINT)
               AS eq_matches,
           CAST(COUNT(*) FILTER (WHERE p1 IS NOT DISTINCT FROM p2) AS BIGINT)
               AS nullsafe_matches,
           CAST(COUNT(*) FILTER (WHERE NULLIF(p1, p2) IS NULL) AS BIGINT)
               AS nullif_nulls,
           CAST(COUNT(COALESCE(p1, p2)) AS BIGINT)
               AS coalesce_nonnull
    FROM t
    """,
)
def null_semantics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic corner cases, pinned: plain ``=`` drops
    NULL-vs-NULL rows, the null-safe operator (``<=>`` /
    IS NOT DISTINCT FROM) keeps them, NULLIF/COALESCE compose with both.
    Matching counts across engines proves the engine's NULL semantics
    are ANSI, not ad hoc — the class of bug that silently corrupts
    dedup and join results at scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("p1"),
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("p2"),
    )
    return t.agg(
        F.count(F.when(F.col("p1") == F.col("p2"), 1))
        .cast("bigint")
        .alias("eq_matches"),
        F.count(F.when(F.col("p1").eqNullSafe(F.col("p2")), 1))
        .cast("bigint")
        .alias("nullsafe_matches"),
        F.count(F.when(F.nullif(F.col("p1"), F.col("p2")).isNull(), 1))
        .cast("bigint")
        .alias("nullif_nulls"),
        F.count(F.coalesce("p1", "p2")).cast("bigint").alias("coalesce_nonnull"),
    )


@query(
    "collation_lcase_match",
    oracle="""
    SELECT p_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM part
    WHERE lower(p_type) = 'promo'
    GROUP BY p_type
    """,
)
def collation_lcase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4, SPARK-46830): equality under
    the UTF8_LCASE collation matches case-insensitively WITHOUT
    rewriting both sides through lower() — the predicate stays sargable
    and collation becomes a property of the comparison, not the data.
    Oracle expresses the same semantics with lower()."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(
            F.collate(F.col("p_type"), "UTF8_LCASE") == F.lit("PROMO")
        )
        .groupBy("p_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@query(
    "stats_moments_lineitem",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           ROUND(stddev_samp(l_extendedprice), 4)            AS price_stddev,
           ROUND(var_samp(l_quantity), 6)                    AS qty_var,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS price_per_qty,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6)    AS fit_r2
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stats_moments_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family: correlation, sample covariance/
    variance/stddev, and the regr_* least-squares fits — the numeric
    profiling layer over the fact table, one hash agg, all JVM.

    Scale shape: every moment is a streaming aggregate with map-side
    partial state (sums of x, y, x², xy …) — no second pass, no sort.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias(
            "price_per_qty"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("fit_r2"),
    )


@query(
    "cheapest_supplier_per_part",
    oracle="""
    WITH m AS (
        SELECT l_partkey,
               MIN(struct_pack(
                   unit_price_e4 := CAST(FLOOR(l_extendedprice * 10000
                                               / l_quantity) AS BIGINT),
                   suppkey := l_suppkey)) AS s
        FROM lineitem WHERE l_quantity > 0
        GROUP BY l_partkey
    )
    SELECT l_partkey, s.unit_price_e4 AS unit_price_e4, s.suppkey AS suppkey
    FROM m
    """,
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin-per-group WITHOUT a window sort: the supplier offering the
    lowest observed unit price per part, as ``min(struct(price, supp))``
    — lexicographic struct minimum makes the argmin a plain streaming
    aggregate with a total tie-break, where the naive form (window +
    row_number + filter) would sort every group. Unit price is
    fixed-point (×10⁴, floored) — float division rounds at .xxxx5
    boundaries differently across engines; floor only cliffs at exact
    integers, where binary division is exact.

    Scale shape: one hash agg on l_partkey with map-side partials;
    struct comparison is codegen'd. This is the TPC-H Q2 shape on the
    available schema.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    pair = F.struct(
        F.floor(F.col("l_extendedprice") * 10000 / F.col("l_quantity"))
        .cast("bigint")
        .alias("unit_price_e4"),
        F.col("l_suppkey").alias("suppkey"),
    )
    return (
        li.groupBy("l_partkey")
        .agg(F.min(pair).alias("m"))
        .select(
            "l_partkey",
            F.col("m.unit_price_e4").alias("unit_price_e4"),
            F.col("m.suppkey").alias("suppkey"),
        )
    )


@query(
    "asof_forward_next_purchase",
    oracle="""
    SELECT c.event_id, c.user_id, c.ts,
           p.value AS next_purchase_value,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS secs_to_purchase
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
)
def asof_forward_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each click, the user's EARLIEST purchase
    at-or-after it (time-to-convert) — the mirror of
    ``asof_join_purchases``, via the same union + one-window operator
    with ``direction='forward'`` (first ignorenulls over the following
    frame). Still a single shuffle on user_id, no range explosion;
    oracle is DuckDB's native forward ASOF (``c.ts <= p.ts``).
    """
    from pyspark_movie_recommender_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", F.col("ts").alias("pts")
    )
    joined = asof_join(
        clicks,
        purchases,
        on="ts",
        key="user_id",
        value_cols=["value", "pts"],
        direction="forward",
    )
    return joined.filter(F.col("asof_pts").isNotNull()).select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_value").alias("next_purchase_value"),
        (
            F.col("asof_pts").cast("timestamp_ltz").cast("long")
            - F.col("ts").cast("timestamp_ltz").cast("long")
        ).alias("secs_to_purchase"),
    )


@query("multimodal_image_resize")
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-modality resize: nearest-neighbour 8×8 thumbnails over
    binary payloads through Arrow mapInPandas (rows-only: pixel gather
    is not SQL-expressible; exactness vs a NumPy reference is pinned in
    tests/test_operators.py). Thumb bytes surfaced as a hex digest so
    the projection stays canonicalizer-friendly."""
    from pyspark_movie_recommender_spark.operators.multimodal import (
        attach_fake_payload,
        image_resize_thumbnail,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    thumbs = image_resize_thumbnail(attach_fake_payload(docs))
    return thumbs.select(
        "doc_id",
        "src_w",
        "src_h",
        F.lower(F.hex(F.sha2("thumb", 256))).alias("thumb_sha"),
        "thumb_mean",
    )


@query(
    "decimal_exact_revenue",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18, 2))) AS VARCHAR)
               AS exact_revenue,
           CAST(AVG(CAST(o_totalprice AS DECIMAL(18, 2))) AS DECIMAL(18, 4))
               AS avg_revenue
    FROM orders GROUP BY o_orderstatus
    """,
)
def decimal_exact_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact money arithmetic on the DECIMAL type: summing DECIMAL(18,2)
    is integer-exact and summation-order-independent — the engine answer
    to the float-rounding divergences double money math invites (the sum
    is surfaced as VARCHAR so the comparison is digit-exact, no float
    hop anywhere).

    Scale shape: decimal aggregation uses the same partial/final hash
    agg as doubles (Tungsten fixed-size 128-bit representation for
    precision ≤ 38) — exactness costs no extra pass.
    """
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_totalprice").cast("decimal(18,2)")
    return orders.groupBy("o_orderstatus").agg(
        F.sum(d).cast("string").alias("exact_revenue"),
        F.avg(d).cast("decimal(18,4)").alias("avg_revenue"),
    )


@query(
    "timezone_local_rollup",
    oracle="""
    SELECT CAST(timezone('America/New_York', timezone('UTC', ts)) AS DATE)
               AS ny_date,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def timezone_local_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone-aware rollup: UTC event timestamps converted to the
    America/New_York civil clock (``convert_timezone`` → TIMESTAMP_NTZ)
    and grouped by LOCAL date — the daily-report grain users actually
    mean, which UTC-date grouping silently misassigns for evening
    events (UTC-5/-4 with DST handled by the tz database on both
    engines).
    """
    ev = load_table(spark, sf_dir, "events")
    local = F.convert_timezone(
        F.lit("UTC"), F.lit("America/New_York"), F.col("ts")
    )
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date(local).alias("ny_date"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )


@query(
    "explode_outer_pos_semantics",
    oracle="""
    WITH src AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 0 THEN NULL
                    ELSE string_split(c_name, '#') END AS toks
        FROM customer WHERE c_custkey < 200
    )
    SELECT s.c_custkey,
           CAST(u.pos - 1 AS INT) AS pos,
           u.tok
    FROM src s
    LEFT JOIN LATERAL (
        SELECT t.tok, t.pos
        FROM (SELECT unnest(s.toks) AS tok,
                     generate_subscripts(s.toks, 1) AS pos) t
    ) u ON TRUE
    """,
)
def explode_outer_pos_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-preserving positional explode: ``posexplode_outer`` keeps
    rows whose array is NULL (as a (NULL, NULL) element) where plain
    ``explode`` silently drops them — the semantics difference that
    loses records in flatten pipelines. The oracle spells the same
    thing as LEFT JOIN LATERAL unnest WITH ORDINALITY.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    src = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.split(F.col("c_name"), "#"))
        .alias("toks"),
    )
    return src.select(
        "c_custkey",
        F.posexplode_outer("toks").alias("pos", "tok"),
    )


@query("ml_pipeline_text_classifier")
def ml_pipeline_text_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.Pipeline estimator/transformer composition: TF-IDF + logistic
    regression recovering each document's dominant token group, reported
    as per-class held-out hit counts (rows-only: model fits are seed/
    initialization dependent; an accuracy floor is pinned in
    tests/test_recommend.py)."""
    from pyspark_movie_recommender_spark.recommend import (
        text_topic_classifier_pipeline,
    )

    return text_topic_classifier_pipeline(spark, sf_dir)


@query(
    "scd2_customer_balances",
    oracle="""
    WITH current AS (
        SELECT c_custkey, c_acctbal, CAST('2024-01-01' AS DATE) AS valid_from
        FROM customer
    ), updates AS (
        SELECT c_custkey, ROUND(c_acctbal * 1.1, 2) AS c_acctbal,
               CAST('2024-06-01' AS DATE) AS valid_from
        FROM customer WHERE c_custkey % 10 = 0
    ), unioned AS (
        SELECT * FROM current UNION ALL SELECT * FROM updates
    )
    SELECT c_custkey, c_acctbal, valid_from,
           COALESCE(LEAD(valid_from) OVER (
               PARTITION BY c_custkey ORDER BY valid_from),
               CAST('9999-12-31' AS DATE)) AS valid_to
    FROM unioned
    """,
)
def scd2_customer_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 fold-in (operators/scd.py): a June balance revision
    for every 10th customer closes the January version (valid_to =
    successor's valid_from) and opens an open-ended new one — the
    dimension-history MERGE expressed as union + one lead() window pass,
    no row-level mutation primitive needed."""
    from pyspark_movie_recommender_spark.operators.scd import scd2_apply

    customer = load_table(spark, sf_dir, "customer")
    current = customer.select(
        "c_custkey",
        "c_acctbal",
        F.lit("2024-01-01").cast("date").alias("valid_from"),
        F.lit("9999-12-31").cast("date").alias("valid_to"),
    )
    updates = customer.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 1.1, 2).alias("c_acctbal"),
        F.lit("2024-06-01").cast("date").alias("valid_from"),
    )
    return scd2_apply(current, updates, key="c_custkey")


@query(
    "snapshot_diff_customers",
    oracle="""
    WITH old AS (
        SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
        WHERE c_custkey % 13 <> 0
    ), new AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 0
                    THEN ROUND(c_acctbal + 100, 2) ELSE c_acctbal END
                   AS c_acctbal,
               c_mktsegment
        FROM customer WHERE c_custkey % 11 <> 0
    )
    SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'added'
                WHEN n.c_custkey IS NULL THEN 'removed'
                WHEN o.c_acctbal = n.c_acctbal
                 AND o.c_mktsegment = n.c_mktsegment THEN 'unchanged'
                ELSE 'changed' END AS diff_status
    FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
    """,
)
def snapshot_diff_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (operators/scd.py): every key classified
    added/removed/changed/unchanged across two table versions via one
    full outer join + null-safe struct compare — the audit pass that
    catches silent drift between pipeline runs."""
    from pyspark_movie_recommender_spark.operators.scd import snapshot_diff

    customer = load_table(spark, sf_dir, "customer")
    old = customer.filter(F.col("c_custkey") % 13 != 0).select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    new = customer.filter(F.col("c_custkey") % 11 != 0).select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 7 == 0, F.round(F.col("c_acctbal") + 100, 2)
        )
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        "c_mktsegment",
    )
    return snapshot_diff(old, new, key="c_custkey")


# ---------------------------------------------------------------------------
# corpus quality filtering, inverted index, multi-dim layout, robust stats
# ---------------------------------------------------------------------------


@query(
    "quality_filter_gopher",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents WHERE trim(text) <> ''
    ), tc AS (
        SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY doc_id, tok
    ), per_tok AS (
        SELECT doc_id,
               CAST(SUM(cnt) AS BIGINT) AS n_tokens,
               CAST(MAX(cnt) AS BIGINT) AS top_cnt,
               CAST(COALESCE(SUM(cnt) FILTER (WHERE tok IN ('the', 'a')), 0)
                    AS BIGINT) AS stop_cnt
        FROM tc GROUP BY doc_id
    ), bg AS (
        SELECT doc_id, t[i] || ' ' || t[i + 1] AS bigram
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              FROM documents WHERE trim(text) <> ''),
             (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
    ), per_bg AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bg,
               CAST(COUNT(DISTINCT bigram) AS BIGINT) AS n_bg_d
        FROM bg GROUP BY doc_id
    )
    SELECT p.doc_id,
           p.n_tokens,
           (1000000 * p.top_cnt) // p.n_tokens AS top_tok_ppm,
           CASE WHEN COALESCE(b.n_bg, 0) = 0 THEN 0
                ELSE (1000000 * (b.n_bg - b.n_bg_d)) // b.n_bg
           END AS dup_bigram_ppm,
           (1000000 * p.stop_cnt) // p.n_tokens AS stop_ppm,
           (p.n_tokens >= 20
            AND (1000000 * p.top_cnt) // p.n_tokens < 150000
            AND CASE WHEN COALESCE(b.n_bg, 0) = 0 THEN 0
                     ELSE (1000000 * (b.n_bg - b.n_bg_d)) // b.n_bg
                END < 600000
            AND (1000000 * p.stop_cnt) // p.n_tokens > 0) AS keep
    FROM per_tok p LEFT JOIN per_bg b ON p.doc_id = b.doc_id
    """,
)
def quality_filter_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/quality filter (Rae et al. 2021 rules
    adapted to this corpus): per-document token count, most-frequent-token
    ratio, duplicate-bigram ratio, stopword presence, and the resulting
    keep/drop decision.

    All ratios are fixed-point parts-per-million computed with integer
    DIV on BIGINT counts, so the oracle compare never touches a float
    (summation order and round-half behavior can't diverge).

    Scale shape: one tokens explode feeding a two-level hash aggregate
    (map-side partial collapse on (doc_id, token)), one bigram explode
    built JVM-side from the token array (zip_with of two slices — no
    Python), each branch aggregating to one row per doc before the
    final doc-keyed join. Nothing is ever wider than (doc_id, gram);
    at 100 TB both branches are linear scans + hash aggs on the doc_id
    key, and the join is co-partitioned on doc_id by AQE.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.trim("text") != "")
    from pyspark_movie_recommender_spark.functions import ws_tokens

    toks = docs.select("doc_id", F.explode(ws_tokens("text")).alias("tok"))
    tc = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    per_tok = tc.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.max("cnt").cast("long").alias("top_cnt"),
        F.coalesce(
            F.sum(F.when(F.col("tok").isin("the", "a"), F.col("cnt"))), F.lit(0)
        )
        .cast("long")
        .alias("stop_cnt"),
    )
    with_arr = docs.select("doc_id", ws_tokens("text").alias("t"))
    bg = with_arr.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
                lambda x, y: F.concat_ws(" ", x, y),
            )
        ).alias("bigram"),
    )
    per_bg = bg.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bg"),
        F.countDistinct("bigram").cast("long").alias("n_bg_d"),
    )
    j = per_tok.join(per_bg, "doc_id", "left")
    dup_ppm = F.expr(
        "CASE WHEN COALESCE(n_bg, 0) = 0 THEN 0L"
        " ELSE (1000000 * (n_bg - n_bg_d)) DIV n_bg END"
    )
    top_ppm = F.expr("(1000000 * top_cnt) DIV n_tokens")
    stop_ppm = F.expr("(1000000 * stop_cnt) DIV n_tokens")
    return j.select(
        "doc_id",
        "n_tokens",
        top_ppm.alias("top_tok_ppm"),
        dup_ppm.alias("dup_bigram_ppm"),
        stop_ppm.alias("stop_ppm"),
        (
            (F.col("n_tokens") >= 20)
            & (top_ppm < 150000)
            & (dup_ppm < 600000)
            & (stop_ppm > 0)
        ).alias("keep"),
    )


@query(
    "inverted_index_postings",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents WHERE trim(text) <> ''
    ), tc AS (
        SELECT tok, doc_id, COUNT(*) AS cnt FROM toks GROUP BY tok, doc_id
    ), r AS (
        SELECT tok, doc_id, cnt,
               ROW_NUMBER() OVER (PARTITION BY tok ORDER BY doc_id) AS rn
        FROM tc
    )
    SELECT tok AS token,
           CAST(COUNT(*) AS BIGINT) AS doc_freq,
           CAST(SUM(cnt) AS BIGINT) AS total_tf,
           array_to_string(list_sort(list(doc_id) FILTER (WHERE rn <= 20)), ',')
               AS postings
    FROM r GROUP BY tok
    """,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: token -> document frequency, total
    term frequency, and a capped sorted posting list (first 20 doc_ids,
    serialized as CSV text so the driver's canonicalizer never sees a
    raw array column).

    Scale shape: the explode is map-side; (token, doc_id) tf collapses
    with map-side partial aggregation BEFORE the token shuffle, so the
    shuffle carries one row per distinct (token, doc) — not one per
    occurrence. The posting cap is applied with a row_number window on
    the already-aggregated relation (same token-keyed exchange the final
    agg needs; Catalyst reuses the partitioning), and collect_list only
    ever sees <= 20 ids per token, so no reducer materializes an
    unbounded posting array. Hot tokens (stopword-class df) are the skew
    risk at 100 TB — real engines shard postings positionally; here the
    cap bounds the reducer state instead.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.trim("text") != "")
    from pyspark_movie_recommender_spark.functions import ws_tokens

    toks = docs.select("doc_id", F.explode(ws_tokens("text")).alias("tok"))
    tc = toks.groupBy("tok", "doc_id").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("tok").orderBy("doc_id")
    r = tc.withColumn("rn", F.row_number().over(w))
    return r.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq"),
        F.sum("cnt").cast("long").alias("total_tf"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("rn") <= 20, F.col("doc_id")))
                ),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    ).withColumnRenamed("tok", "token")


# z-order bit-interleave: same arithmetic generated once for both engines
# (Spark spells shifts as shiftleft/shiftright functions, DuckDB as << >>)
_Z_SPARK = " + ".join(
    f"shiftleft(shiftright(zx, {i}) & 1, {2 * i})"
    f" + shiftleft(shiftright(zy, {i}) & 1, {2 * i + 1})"
    for i in range(8)
)
_Z_DUCK = " + ".join(
    f"(((zx >> {i}) & 1) << {2 * i}) + (((zy >> {i}) & 1) << {2 * i + 1})"
    for i in range(8)
)


@query(
    "zorder_layout_orders",
    oracle=f"""
    WITH keyed AS (
        SELECT o_orderkey,
               o_custkey % 256 AS zx,
               CAST(FLOOR(o_totalprice / 2000) AS BIGINT) % 256 AS zy
        FROM orders WHERE o_orderkey % 37 = 0
    )
    SELECT o_orderkey,
           CAST({_Z_DUCK} AS BIGINT) AS zval,
           CAST(({_Z_DUCK}) // 4096 AS BIGINT) AS ztile
    FROM keyed
    """,
)
def zorder_layout_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over two dimensions — the layout
    primitive behind multi-dimensional data skipping: write the table
    ``repartitionByRange('zval').sortWithinPartitions('zval')`` and
    point-range predicates on EITHER custkey or price bucket prune most
    files, because bit-interleaving keeps both dimensions locally dense
    (each 4096-wide ztile covers a 16x16 (custkey, price) square).

    The interleave is pure integer bit arithmetic generated once and
    shared verbatim with the oracle — map-side, codegen'd, no shuffle at
    all in this projection; at 100 TB the only cost of z-ordering a
    write is the range repartition you were already paying for layout.
    """
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.filter(F.col("o_orderkey") % 37 == 0).select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("zx"),
        (F.floor(F.col("o_totalprice") / 2000).cast("long") % 256).alias("zy"),
    )
    return keyed.select(
        "o_orderkey",
        F.expr(f"CAST({_Z_SPARK} AS BIGINT)").alias("zval"),
        F.expr(f"CAST(({_Z_SPARK}) DIV 4096 AS BIGINT)").alias("ztile"),
    )


@query(
    "winsorized_stats_orders",
    oracle="""
    WITH stats AS (
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.01) AS p01,
               quantile_cont(o_totalprice, 0.99) AS p99
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           ROUND(MAX(s.p01), 2) AS p01,
           ROUND(MAX(s.p99), 2) AS p99,
           ROUND(AVG(LEAST(GREATEST(o.o_totalprice, s.p01), s.p99)), 2)
               AS wins_mean,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o JOIN stats s USING (o_orderpriority)
    GROUP BY o.o_orderpriority
    """,
)
def winsorized_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p01/p99-clipped) mean order value per priority — the
    outlier-robust aggregate a curation pipeline uses where a plain AVG
    is one fat-finger order away from garbage.

    Two-pass shape: pass 1 computes exact interpolated percentiles per
    group (5 groups — the aggregate is a few rows), which broadcast-join
    back onto the fact scan for the clipped second aggregate. At 100 TB
    this is two linear scans with map-side partial aggs and zero
    fact-table shuffles beyond the 5-group hash agg; the exact
    percentile state is per-group-bounded, and for wider group
    cardinalities the GK-sketch twin (approx_quantiles_prices) is the
    drop-in.
    """
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.01).alias("p01"),
        F.percentile("o_totalprice", 0.99).alias("p99"),
    )
    j = orders.join(F.broadcast(stats), "o_orderpriority")
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("p01")), F.col("p99"))
    return j.groupBy("o_orderpriority").agg(
        F.round(F.max("p01"), 2).alias("p01"),
        F.round(F.max("p99"), 2).alias("p99"),
        F.round(F.avg(clipped), 2).alias("wins_mean"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )


@query(
    "deterministic_hash_split",
    oracle="""
    WITH assigned AS (
        SELECT doc_id, lang,
               ((doc_id * 2654435761) % 4294967296) % 100 AS bucket
        FROM documents
    )
    SELECT lang,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM assigned GROUP BY lang, split
    """,
)
def deterministic_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment via multiplicative
    (Knuth) hashing on the stable document id — the splitter a training
    pipeline needs: reproducible across runs/engines (no rand()), stable
    under corpus growth (a doc never changes split), and exactly
    oracle-checkable because the hash is plain BIGINT arithmetic shared
    with the SQL form.

    Scale shape: the assignment is a map-side projection (no shuffle);
    the summary agg is a tiny hash aggregate. Splitting a 100 TB corpus
    is therefore a pure scan — and since the split is a deterministic
    function of doc_id, downstream stages recompute it for free instead
    of joining a split-assignment table.
    """
    docs = load_table(spark, sf_dir, "documents")
    assigned = docs.select(
        "doc_id",
        "lang",
        (((F.col("doc_id") * 2654435761) % 4294967296) % 100).alias("bucket"),
    )
    return (
        assigned.select(
            "lang",
            F.when(F.col("bucket") < 80, "train")
            .when(F.col("bucket") < 90, "val")
            .otherwise("test")
            .alias("split"),
            "doc_id",
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
        )
    )


@query(
    "pit_join_orders_scd2",
    oracle="""
    WITH current AS (
        SELECT c_custkey, c_acctbal,
               CAST('1995-01-01' AS DATE) AS valid_from
        FROM customer
    ), updates AS (
        SELECT c_custkey, ROUND(c_acctbal * 1.05, 2) AS c_acctbal,
               CAST('1998-01-01' AS DATE) AS valid_from
        FROM customer WHERE c_custkey % 3 = 0
    ), unioned AS (
        SELECT * FROM current UNION ALL SELECT * FROM updates
    ), dim AS (
        SELECT c_custkey, c_acctbal, valid_from,
               COALESCE(LEAD(valid_from) OVER (
                   PARTITION BY c_custkey ORDER BY valid_from),
                   CAST('9999-12-31' AS DATE)) AS valid_to
        FROM unioned
    )
    SELECT o.o_orderkey, o.o_custkey, d.c_acctbal AS acctbal_at_order,
           d.valid_from
    FROM orders o JOIN dim d
      ON o.o_custkey = d.c_custkey
     AND o.o_orderdate >= CAST(d.valid_from AS TIMESTAMP)
     AND o.o_orderdate <  CAST(d.valid_to   AS TIMESTAMP)
    """,
)
def pit_join_orders_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: every order picks the SCD2 dimension version
    that was valid on its order date (operators/scd.py builds the
    versioned dim; a 1998 balance revision for every third customer
    means their pre-1998 orders see the old balance, later orders the
    new one).

    Scale shape: the join is equi on c_custkey with a residual range
    predicate on the validity interval — Catalyst plans the equi part
    as the join key (broadcast here; sort-merge on a big dim) and
    evaluates the interval check as a post-join filter, so there is no
    pair explosion: each order meets only its customer's few versions.
    This is the warehouse-correct alternative to joining 'current'
    attributes onto historical facts.
    """
    from pyspark_movie_recommender_spark.operators.scd import scd2_apply

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    current = customer.select(
        "c_custkey",
        "c_acctbal",
        F.lit("1995-01-01").cast("date").alias("valid_from"),
        F.lit("9999-12-31").cast("date").alias("valid_to"),
    )
    updates = customer.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 1.05, 2).alias("c_acctbal"),
        F.lit("1998-01-01").cast("date").alias("valid_from"),
    )
    dim = scd2_apply(current, updates, key="c_custkey")
    return orders.join(
        F.broadcast(dim),
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("o_orderdate") >= F.col("valid_from").cast("timestamp"))
        & (F.col("o_orderdate") < F.col("valid_to").cast("timestamp")),
    ).select(
        "o_orderkey",
        "o_custkey",
        F.col("c_acctbal").alias("acctbal_at_order"),
        "valid_from",
    )


@query(
    "join_key_skew_report",
    oracle="""
    WITH kc AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders GROUP BY o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_per_key,
           ROUND(quantile_cont(cnt, 0.50), 4) AS p50_per_key,
           ROUND(quantile_cont(cnt, 0.99), 4) AS p99_per_key,
           (1000000 * MAX(cnt) * COUNT(*)) // SUM(cnt) AS skew_ppm
    FROM kc
    """,
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the pre-flight report you run before
    shuffling 100 TB on a key — distinct-key count, rows per key at
    p50/p99/max, and a fixed-point skew factor (max over mean, ppm).
    skew_ppm >> 1e6 says the hottest key owns many partitions' worth of
    rows: salt it (salted_join operator) or let AQE split it.

    Scale shape: one map-side-combined count per key, then a single
    global aggregate over the (small) key-count relation; integer
    arithmetic end-to-end except the exact interpolated percentiles,
    which follow the engine-shared interpolation rule.
    """
    orders = load_table(spark, sf_dir, "orders")
    kc = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    return kc.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_per_key"),
        F.round(F.percentile("cnt", 0.50), 4).alias("p50_per_key"),
        F.round(F.percentile("cnt", 0.99), 4).alias("p99_per_key"),
        F.expr("(1000000 * MAX(cnt) * COUNT(*)) DIV SUM(cnt)").alias("skew_ppm"),
    )


@query(
    "incremental_agg_merge",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders GROUP BY 1
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregation via mergeable partial state: daily
    (count, sum) partials roll up to monthly totals WITHOUT rescanning
    the facts — the Spark side computes day partials then merges them,
    while the oracle aggregates the raw table directly; equality proves
    the merge is exact. Money is fixed-point BIGINT cents
    (floor(x*100+0.5)) so partial-order never perturbs a float.

    Scale shape: this is the nightly-pipeline pattern — store day-grain
    partials (365 rows/yr per group instead of billions of facts) and
    answer any coarser grain by summing them. Both aggs are map-side
    partial hash aggregates; the second one runs on day-cardinality
    input, i.e. effectively free.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(cents).cast("long").alias("sum_cents"),
    )
    return daily.groupBy(
        F.date_trunc("month", "day").cast("date").alias("month")
    ).agg(
        F.sum("cnt").cast("long").alias("n_orders"),
        F.sum("sum_cents").cast("long").alias("revenue_cents"),
    )


@query(
    "zscore_window_orders",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROUND((o_totalprice - AVG(o_totalprice) OVER w)
                 / stddev_samp(o_totalprice) OVER w, 4) AS z
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority)
    """,
)
def zscore_window_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization in pure SQL — the
    oracle-checkable twin of the applyInPandas z-score in
    operators/udf_surface.py (same math, zero Python): every order's
    total price standardized against its priority class.

    Scale shape: one exchange on the group key; both window aggregates
    (mean, sample stddev) share the same unbounded frame so Spark
    computes them in a single window pass. No Python worker — compare
    the UDF twin, which pays Arrow serde for identical output.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(
            (F.col("o_totalprice") - F.avg("o_totalprice").over(w))
            / F.stddev_samp("o_totalprice").over(w),
            4,
        ).alias("z"),
    )


@query(
    "sparse_count_cosine_pairs",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents WHERE trim(text) <> ''
    ), tc AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM toks GROUP BY doc_id, tok
    ), norms AS (
        SELECT doc_id, CAST(SUM(cnt * cnt) AS BIGINT) AS nrm
        FROM tc GROUP BY doc_id
    ), pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS num
        FROM tc a JOIN tc b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT p.doc_a, p.doc_b, p.num,
           (1000000 * p.num * p.num) // (na.nrm * nb.nrm) AS cos2_ppm
    FROM pairs p
    JOIN norms na ON na.doc_id = p.doc_a
    JOIN norms nb ON nb.doc_id = p.doc_b
    WHERE 1000000 * p.num * p.num >= 980100 * na.nrm * nb.nrm
    """,
)
def sparse_count_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse cosine similarity through the inverted index: documents as
    term-count vectors, pair numerators accumulated by joining postings
    on the shared token, threshold cos >= 0.99 applied as the integer
    inequality 1e6*num^2 >= 980100*|a|^2*|b|^2 — every quantity is a
    BIGINT, so the pair set and the reported cos^2 (ppm) are bit-exact
    across engines with no float rounding anywhere.

    Scale shape: the classic sparse all-pairs problem. The token join
    runs on the aggregated (doc, token, tf) relation — one row per
    distinct term per doc, not per occurrence — and hot tokens are THE
    quadratic risk exactly as in ngram_jaccard_pairs; at corpus scale
    apply the same document-frequency cap / prefix-filtering (Bayardo
    et al.) before the self-join. Norms broadcast back onto the
    surviving pairs only.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.trim("text") != "")
    from pyspark_movie_recommender_spark.functions import ws_tokens

    toks = docs.select("doc_id", F.explode(ws_tokens("text")).alias("tok"))
    tc = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    norms = tc.groupBy("doc_id").agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("nrm")
    )
    a = tc.alias("a")
    b = tc.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).cast("long").alias("num"))
    )
    na = norms.select(
        F.col("doc_id").alias("doc_a"), F.col("nrm").alias("nrm_a")
    )
    nb = norms.select(
        F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nrm_b")
    )
    return (
        pairs.join(F.broadcast(na), "doc_a")
        .join(F.broadcast(nb), "doc_b")
        .filter(
            F.lit(1000000) * F.col("num") * F.col("num")
            >= F.lit(980100) * F.col("nrm_a") * F.col("nrm_b")
        )
        .select(
            "doc_a",
            "doc_b",
            "num",
            F.expr("(1000000 * num * num) DIV (nrm_a * nrm_b)").alias(
                "cos2_ppm"
            ),
        )
    )


_LATERAL_TOPK_SQL = """
    SELECT n.n_name, c.c_name, c.c_acctbal
    FROM nation n, LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) c
"""


@query("lateral_topk_per_nation", oracle=_LATERAL_TOPK_SQL)
def lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    SQL-standard spelling of per-group top-k, dialect-shared: the SAME
    string runs on spark.sql and the DuckDB oracle.

    Catalyst decorrelates the lateral into the equivalent
    window/group-limit plan rather than re-executing the subquery per
    outer row — so at scale this costs one customer shuffle exactly
    like the flagship row_number() form, while staying the most
    readable spelling for analysts. Exercises DecorrelateInnerQuery
    with LIMIT, a distinct planner path from the scalar-subquery and
    EXISTS shapes already covered.
    """
    from pyspark_movie_recommender_spark.sources import register_views

    register_views(spark, sf_dir, "nation", "customer")
    return spark.sql(_LATERAL_TOPK_SQL)


@query(
    "per_group_hash_sample",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
               ) AS rn
        FROM documents
    )
    SELECT doc_id, lang, n_chars, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 3
    """,
)
def per_group_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group k-sampling: rank documents inside each
    language by a multiplicative hash of their stable id and keep the
    first k — a pseudo-random but reproducible, engine-exact sample
    (stratified_sample_documents is the rand()-based rows-only twin;
    this one hash-checks).

    Scale shape: one exchange on the group key; WindowGroupLimit prunes
    to k rows per group per partition BEFORE the shuffle, so sampling a
    100 TB corpus moves k rows per language per input partition, not
    the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        (F.col("doc_id") * 2654435761) % 4294967296, "doc_id"
    )
    return (
        docs.select(
            "doc_id", "lang", "n_chars", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
        .select("doc_id", "lang", "n_chars", F.col("rn").cast("long").alias("rn"))
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over per-user event
    sequences (lag window, total tie-break on event_id) — the
    session-flow / next-action matrix behind funnel diagnostics and
    sequence-model training data.

    Scale shape: one exchange on user_id for the lag, then a tiny
    (|event_type|^2 upper-bounded) hash aggregate with map-side
    partials. The transition relation never materializes wider than
    (prev, next) per event row.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )


@query(
    "table_checksum_orders",
    oracle="""
    WITH h AS (
        SELECT o_orderpriority,
               CAST(concat('0x', substr(md5(
                   CAST(o_orderkey AS VARCHAR) || '|' ||
                   CAST(o_custkey AS VARCHAR) || '|' ||
                   o_orderstatus || '|' ||
                   CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                        AS VARCHAR)
               ), 1, 15)) AS BIGINT) % 1000000007 AS hmod
        FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(hmod) % 1000000007 AS BIGINT) AS content_checksum
    FROM h GROUP BY o_orderpriority
    """,
)
def table_checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent per-group content checksum — the reconciliation
    primitive for verifying a copy/migration/pipeline re-run produced
    byte-identical data without sorting or moving it: md5 each row's
    canonical serialization (floats pre-quantized to BIGINT cents so
    formatting can't diverge), fold a 60-bit prefix into a modular sum.
    Engine-exact: Spark's conv(substr(md5..)) and DuckDB's 0x-cast
    produce the same BIGINT, verified here by the oracle gate itself.

    Scale shape: embarrassingly parallel — map-side hash + modular
    partial sums, one tiny final agg; checksumming 100 TB is a pure
    scan with ~zero shuffle. The modular fold keeps SUM inside BIGINT
    for any row count (each term < 1e9; overflow needs >9e9 rows per
    partial — repartition finer or sum as DECIMAL if a single group
    exceeds that).
    """
    orders = load_table(spark, sf_dir, "orders")
    hmod = (
        F.expr(
            f"CAST(conv(substr(md5(concat_ws('|', CAST(o_orderkey AS STRING),"
            f" CAST(o_custkey AS STRING), o_orderstatus,"
            f" CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS STRING))),"
            f" 1, 15), 16, 10) AS BIGINT) % 1000000007"
        )
    ).alias("hmod")
    return (
        orders.select("o_orderpriority", hmod)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.sum("hmod") % 1000000007).cast("long").alias("content_checksum"),
        )
    )


# ---------------------------------------------------------------------------
# wave 5: classic OLAP suite, part II (Q17/Q19/Q4 shapes)
# ---------------------------------------------------------------------------


@query(
    "small_qty_revenue_brands",
    oracle="""
    WITH pq AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(COUNT(*) AS BIGINT)                        AS n_li
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_small,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN pq    ON l.l_partkey = pq.l_partkey
    WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND CAST(l.l_quantity AS BIGINT) * 5 * pq.n_li < pq.sum_qty
    GROUP BY p.p_brand
    """,
)
def small_qty_revenue_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of their part's average quantity, per brand — the correlated
    scalar-AVG subquery, written in its decorrelated two-phase form
    (per-part agg, join back, filter).

    Exactness: the fractional-average threshold ``qty < 0.2 * avg`` is
    algebraically rewritten to ``5 * qty * n < sum`` over exact BIGINT
    quantities, so no float average can flip a boundary row between
    engines; money folds to cents BIGINT.

    Scale shape: the per-part pre-agg reduces lineitem to one row per
    part before the join — at 100 TB the brand filter pushes into the
    part scan (broadcast side) and prunes the fact join; the pre-agg
    shuffles (partkey, 2×BIGINT) only. No per-row subquery replay.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    pq = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_li"),
    )
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pq.withColumnRenamed("l_partkey", "pq_partkey"),
              li.l_partkey == F.col("pq_partkey"))
        .filter(
            F.col("l_quantity").cast("long") * 5 * F.col("n_li")
            < F.col("sum_qty")
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_small"),
            F.sum(cents).cast("long").alias("revenue_cents"),
        )
    )


@query(
    "disjunctive_pushdown_revenue",
    oracle="""
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_li,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    GROUP BY p.p_brand
    """,
)
def disjunctive_pushdown_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR of AND-groups mixing part-side and
    lineitem-side predicates — the disjunctive-pushdown stress test.

    Scale shape: Catalyst CNF-converts the disjunction and pushes the
    derivable conjuncts to each scan: part reads only brand IN
    (B1,B2,B3) AND size <= 15 rows; lineitem reads only quantity
    BETWEEN 1 AND 30 rows (PushedFilters on both scans); the residual
    OR evaluates post-join on the pruned product. Part side broadcasts.
    Money in cents BIGINT; quantities exact integers.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & q.between(20, 30))
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_li"),
            F.sum(cents).cast("long").alias("revenue_cents"),
        )
    )


@query(
    "late_shipment_priority_counts",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_late_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o.o_orderpriority
    """,
)
def late_shipment_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one lineitem shipped more
    than 60 days after the order date, counted per priority — the
    EXISTS → left-semi-join pattern.

    Scale shape: the semi join on orderkey emits each order at most
    once regardless of how many lineitems qualify (no fan-out, no
    post-join distinct); only (orderkey, shipdate) leaves the lineitem
    scan. One shuffle on orderkey, then a tiny priority agg.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_late_orders"))
    )


# ---------------------------------------------------------------------------
# wave 5: pipeline ops — PII redaction, co-occurrence, data expectations
# ---------------------------------------------------------------------------


@query(
    "pii_redact_documents",
    oracle="""
    WITH seeded AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0
                    THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                         || '@example.com now'
                    WHEN doc_id % 11 = 0
                    THEN text || ' call 555-' || CAST(1000 + doc_id % 9000
                         AS VARCHAR) || ' today'
                    ELSE text END AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
               AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '\\b\\d{3}-\\d{4}\\b'))
               AS BIGINT) AS n_phones,
           sha256(regexp_replace(regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>',
               'g'), '\\b\\d{3}-\\d{4}\\b', '<PHONE>', 'g')) AS redacted_sha
    FROM seeded
    """,
)
def pii_redact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the corpus: detect + redact email addresses
    and phone-shaped tokens, emitting per-doc match counts and the
    sha256 of the redacted text (so the oracle verifies the EXACT
    redacted bytes, not just counts). Deterministic PII is seeded into
    ~23% of docs first — the synthetic corpus contains none — with the
    seeding expression shared verbatim with the oracle.

    Regexes are written in the RE2 ∩ Java-regex common dialect (char
    classes, \\b, bounded repeats — no lookaround, no backrefs) so one
    pattern string drives both engines.

    Scale shape: pure map-side projection — zero shuffles, zero Python;
    regex eval is JVM codegen. At 100 TB this is scan-bound, exactly
    what a redaction pass should be.
    """
    email_re = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    phone_re = "\\b\\d{3}-\\d{4}\\b"
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"), F.lit(" contact user"),
                F.col("doc_id").cast("string"), F.lit("@example.com now"),
            ),
        )
        .when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.col("text"), F.lit(" call 555-"),
                (1000 + F.col("doc_id") % 9000).cast("string"),
                F.lit(" today"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("t"),
    )
    return seeded.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(email_re), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(phone_re), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.sha2(
            F.regexp_replace(
                F.regexp_replace("t", email_re, "<EMAIL>"),
                phone_re,
                "<PHONE>",
            ),
            256,
        ).alias("redacted_sha"),
    )


@query(
    "market_basket_pairs",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a ASC, part_b ASC
    LIMIT 20
    """,
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top part pairs appearing in the
    same order — the pairwise-support half of frequent-itemset mining
    (enough to seed association rules / complementary-item models).

    Scale shape: the self-join fan-out is bounded by the max basket
    size (≤13 items/order here → ≤78 pairs per order, C(k,2) in
    general), NOT by corpus size — dedup to DISTINCT (order, part)
    first, join on the order key both sides already shuffle on, then a
    map-side-partial count and a global top-20 (TakeOrderedAndProject,
    never a full sort). For pathological mega-baskets add a per-order
    item cap before pairing, same guard as the n-gram DF cap.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


@query(
    "data_expectations_report",
    oracle="""
    SELECT 'orders.rows' AS check_name,
           CAST(COUNT(*) AS BIGINT) AS metric FROM orders
    UNION ALL
    SELECT 'orders.null_custkey',
           CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders.nonpositive_totalprice',
           CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders.dup_orderkey',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders.orphan_custkey',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem.orphan_orderkey',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    """,
)
def data_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ/Great-Expectations-style constraint audit as ONE query:
    row count, null rate, domain violation, primary-key uniqueness, and
    two referential-integrity orphan checks, emitted as (check_name,
    metric) rows a scheduler can threshold on.

    Scale shape: the four orders-local checks fuse into a single scan's
    aggregates (count/filtered-count/count-distinct share one hash
    agg); each orphan check is a left-anti join that shuffles only the
    key column, with the dimension side broadcast when small. The
    constant-labeled UNION keeps everything in one job — a 100 TB audit
    is two key-projected scans plus one fact scan.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")

    def metric_row(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.col("metric").cast("long").alias("metric"),
        )

    local = o.agg(
        F.count(F.lit(1)).alias("rows"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_ck"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("nonpos"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias("dup"),
    )
    checks = [
        metric_row("orders.rows", local.select(F.col("rows").alias("metric"))),
        metric_row(
            "orders.null_custkey", local.select(F.col("null_ck").alias("metric"))
        ),
        metric_row(
            "orders.nonpositive_totalprice",
            local.select(F.col("nonpos").alias("metric")),
        ),
        metric_row(
            "orders.dup_orderkey", local.select(F.col("dup").alias("metric"))
        ),
        metric_row(
            "orders.orphan_custkey",
            o.join(
                F.broadcast(c.select("c_custkey")),
                o.o_custkey == F.col("c_custkey"),
                "left_anti",
            ).agg(F.count(F.lit(1)).alias("metric")),
        ),
        metric_row(
            "lineitem.orphan_orderkey",
            li.select("l_orderkey")
            .join(
                o.select("o_orderkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("metric")),
        ),
    ]
    out = checks[0]
    for nxt in checks[1:]:
        out = out.unionByName(nxt)
    return out


# ---------------------------------------------------------------------------
# wave 5: robust statistics & smoothing
# ---------------------------------------------------------------------------


@query(
    "mad_outliers_orders",
    oracle="""
    WITH c AS (
        SELECT o_orderpriority,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ), med AS (
        SELECT o_orderpriority, quantile_cont(cents, 0.5) AS med_c
        FROM c GROUP BY o_orderpriority
    ), dev AS (
        SELECT c.o_orderpriority, c.cents, m.med_c,
               abs(c.cents - m.med_c) AS d
        FROM c JOIN med m USING (o_orderpriority)
    ), mad AS (
        SELECT o_orderpriority, quantile_cont(d, 0.5) AS mad_c
        FROM dev GROUP BY o_orderpriority
    )
    SELECT d.o_orderpriority,
           ANY_VALUE(d.med_c)  AS median_cents,
           ANY_VALUE(m.mad_c)  AS mad_cents,
           CAST(COUNT(*) FILTER (WHERE d.d > 3 * m.mad_c) AS BIGINT)
               AS n_outliers
    FROM dev d JOIN mad m USING (o_orderpriority)
    GROUP BY d.o_orderpriority
    """,
)
def mad_outliers_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per group: median + MAD (median absolute
    deviation), flagging rows with |x − med| > 3·MAD — the
    resistant-to-contamination twin of the z-score queries (one wild
    price can't move the threshold the way it moves a stddev).

    Exactness: prices fold to cents BIGINT first; interpolated medians
    land on integers or exact .5 halves (both exactly representable),
    so |x − med| and the 3·MAD comparison are identical IEEE ops on
    both engines — no rounding needed anywhere.

    Scale shape: two grouped exact percentiles (sort-based within each
    priority group) + one re-scan with the 5-row med/mad table
    broadcast back. Exact percentile is the honest expensive part; at
    100 TB swap stage one for approx_percentile with the same query
    body, or keep exact and accept the per-group sort — the threshold
    join stays broadcast either way.
    """
    o = load_table(spark, sf_dir, "orders")
    c = o.select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    med = c.groupBy("o_orderpriority").agg(
        F.percentile("cents", F.lit(0.5)).alias("med_c")
    )
    dev = c.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "med_c",
        F.abs(F.col("cents") - F.col("med_c")).alias("d"),
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.percentile("d", F.lit(0.5)).alias("mad_c")
    )
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.any_value("med_c").alias("median_cents"),
            F.any_value("mad_c").alias("mad_cents"),
            F.count(F.when(F.col("d") > 3 * F.col("mad_c"), 1))
            .cast("long")
            .alias("n_outliers"),
        )
    )


@query(
    "weighted_median_quantity",
    oracle="""
    WITH w AS (
        SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS qty,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS wt
        FROM lineitem GROUP BY 1, 2
    ), cum AS (
        SELECT l_returnflag, qty, wt,
               SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY qty
                             ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(wt) OVER (PARTITION BY l_returnflag) AS tot
        FROM w
    )
    SELECT l_returnflag,
           CAST(MIN(qty) AS BIGINT) AS weighted_median_qty,
           CAST(ANY_VALUE(tot) AS BIGINT) AS total_weight_cents
    FROM cum WHERE 2 * cw >= tot
    GROUP BY l_returnflag
    """,
)
def weighted_median_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median: the smallest quantity at which the running
    revenue weight crosses half the group total — the
    revenue-weighted 'typical order size' (each quantity votes with
    its dollars, not its row count).

    Exactness: weights are cents BIGINT, the crossing test is the
    integer inequality 2·cumw ≥ tot — zero float ops end to end.

    Scale shape: pre-aggregating to (flag, qty) first collapses the
    fact table to ≤ |flags|·|qty| ≈ 150 rows BEFORE the window, so the
    cumulative sort is over a tiny relation — the 100 TB cost is one
    map-side-partial hash agg, not a windowed fact sort.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("wt")
    )
    win = Window.partitionBy("l_returnflag").orderBy("qty")
    cum = w.select(
        "l_returnflag",
        "qty",
        F.sum("wt").over(win.rowsBetween(Window.unboundedPreceding, 0)).alias("cw"),
        F.sum("wt")
        .over(Window.partitionBy("l_returnflag"))
        .alias("tot"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("qty").cast("long").alias("weighted_median_qty"),
            F.any_value("tot").cast("long").alias("total_weight_cents"),
        )
    )


@query(
    "ewma_user_value",
    oracle="""
    WITH s AS (
        SELECT event_id, user_id, ts, value,
               lag(value, 1) OVER w AS v1,
               lag(value, 2) OVER w AS v2,
               lag(value, 3) OVER w AS v3,
               lag(value, 4) OVER w AS v4,
               lag(value, 5) OVER w AS v5,
               lag(value, 6) OVER w AS v6,
               lag(value, 7) OVER w AS v7
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, ts,
           value + 0.5 * COALESCE(v1, 0) + 0.25 * COALESCE(v2, 0)
                 + 0.125 * COALESCE(v3, 0) + 0.0625 * COALESCE(v4, 0)
                 + 0.03125 * COALESCE(v5, 0) + 0.015625 * COALESCE(v6, 0)
                 + 0.0078125 * COALESCE(v7, 0) AS ewma8
    FROM s
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted smoothing of each user's event values —
    the finite-window EWMA (decay ½, depth 8) used for trend features
    and anomaly baselines, as one window pass of explicit lags.

    Exactness: every weight is a power of two, so each multiply is an
    exact IEEE scale and the left-associated addition chain is written
    identically in both dialects — bit-identical doubles with NO
    rounding. (An unbounded recursive EWMA is order-exact too but
    needs a recursive form; depth-8 keeps it a pure window query —
    weight below 2⁻⁸ is under 0.4%.)

    Scale shape: one exchange on user_id, eight lags sharing the same
    sorted frame, map-side everything else — the classic 'feature
    column over a keyed sequence' plan.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.lag("value", k).over(w) for k in range(1, 8)]
    ew = F.col("value")
    for k, lg in enumerate(lags, start=1):
        ew = ew + F.lit(0.5**k) * F.coalesce(lg, F.lit(0.0))
    return e.select("event_id", "user_id", "ts", ew.alias("ewma8"))


# ---------------------------------------------------------------------------
# wave 5: cross-engine-checked UDF + stream-stream join (and batch twin)
# ---------------------------------------------------------------------------


@query(
    "jaro_winkler_name_pairs",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand
     AND split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
     AND a.p_partkey < b.p_partkey
    WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.84
    """,
)
def jaro_winkler_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy name matching with a VALUE-checked Python UDF:
    Jaro-Winkler similarity over candidate part-name pairs, verified
    against DuckDB's native ``jaro_winkler_similarity`` — the oracle
    gate proves the UDF's doubles match a second independent
    implementation bit-for-bit (pre-round max |Δ| = 0.0 on 80k real
    pairs), which is the strongest check a Python UDF gets anywhere in
    this engine.

    Scale shape: blocking on (brand, name-noun) equality turns the
    quadratic all-pairs into an equi-join whose fan-out is bounded by
    block size — the same guard as the levenshtein and LSH dedups; the
    Arrow-batched UDF runs only on surviving candidates. Entity
    resolution at 100 TB is exactly this: cheap blocking join, then an
    expensive scorer on the shortlist.
    """
    from pyspark_movie_recommender_spark.operators.udf_surface import jaro_winkler

    part = load_table(spark, sf_dir, "part")
    a = part.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.col("p_brand").alias("brand"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("noun"),
    )
    b = part.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_brand").alias("brand"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("noun"),
    )
    return (
        a.join(b, ["brand", "noun"])
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("jw_raw", jaro_winkler(F.col("name_a"), F.col("name_b")))
        .filter(F.col("jw_raw") >= 0.84)
        .select(
            "key_a", "key_b", F.round("jw_raw", 6).alias("jw")
        )
    )


@query(
    "interval_join_view_purchase",
    oracle="""
    SELECT v.event_id AS view_id,
           p.event_id AS purchase_id,
           v.user_id,
           v.ts AS view_ts,
           p.ts AS purchase_ts,
           p.value AS purchase_value
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
)
def interval_join_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join: views matched to
    the same user's purchases within the next 30 minutes (conversion
    attribution). Oracle-checkable, so the streaming variant
    (streaming_interval_join) inherits a value-verified plan shape —
    same equality key, same time-range predicate.

    Scale shape: equi-join on user_id with the range condition as a
    residual predicate — one co-partitioned shuffle, no pair explosion
    beyond each user's view×purchase product inside the window.
    """
    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return (
        v.join(
            p,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")
            ),
        )
        .select(
            "view_id", "purchase_id", "user_id", "view_ts", "purchase_ts",
            "purchase_value",
        )
    )


@query("streaming_interval_join")
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join with dual watermarks (bounded join
    state) — see streaming/jobs.py stream_stream_interval_join. The
    batch twin interval_join_view_purchase carries the DuckDB oracle;
    the stream≡batch equivalence test pins this variant to it."""
    from pyspark_movie_recommender_spark.streaming.jobs import (
        stream_stream_interval_join,
    )

    return stream_stream_interval_join(
        spark, sf_dir, query_name="q_stream_interval_join"
    ).select(
        "view_id", "purchase_id", "user_id", "view_ts", "purchase_ts",
        "purchase_value",
    )


# ---------------------------------------------------------------------------
# wave 6: iterative graph ranking, LM scoring, incremental distinct, shares
# ---------------------------------------------------------------------------


@query(
    "pagerank_trade_graph",
    oracle="""
    WITH fwd AS (
        SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                        's' || CAST(l.l_suppkey AS VARCHAR) AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), edges AS (
        SELECT src, dst FROM fwd
        UNION
        SELECT dst AS src, src AS dst FROM fwd
    ), deg AS (
        SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src
    ), n AS (
        SELECT CAST(COUNT(DISTINCT src) AS BIGINT) AS cnt FROM edges
    ), it0 AS (
        SELECT src AS node, 1.0 / cnt AS pr FROM deg, n
    ), it1 AS (
        SELECT e.dst AS node,
               0.15 / ANY_VALUE(n.cnt) + 0.85 * SUM(i.pr / d.outdeg) AS pr
        FROM edges e JOIN it0 i ON e.src = i.node
                     JOIN deg d ON d.src = e.src, n
        GROUP BY e.dst
    ), it2 AS (
        SELECT e.dst AS node,
               0.15 / ANY_VALUE(n.cnt) + 0.85 * SUM(i.pr / d.outdeg) AS pr
        FROM edges e JOIN it1 i ON e.src = i.node
                     JOIN deg d ON d.src = e.src, n
        GROUP BY e.dst
    ), it3 AS (
        SELECT e.dst AS node,
               0.15 / ANY_VALUE(n.cnt) + 0.85 * SUM(i.pr / d.outdeg) AS pr
        FROM edges e JOIN it2 i ON e.src = i.node
                     JOIN deg d ON d.src = e.src, n
        GROUP BY e.dst
    ), it4 AS (
        SELECT e.dst AS node,
               0.15 / ANY_VALUE(n.cnt) + 0.85 * SUM(i.pr / d.outdeg) AS pr
        FROM edges e JOIN it3 i ON e.src = i.node
                     JOIN deg d ON d.src = e.src, n
        GROUP BY e.dst
    ), it5 AS (
        SELECT e.dst AS node,
               0.15 / ANY_VALUE(n.cnt) + 0.85 * SUM(i.pr / d.outdeg) AS pr
        FROM edges e JOIN it4 i ON e.src = i.node
                     JOIN deg d ON d.src = e.src, n
        GROUP BY e.dst
    )
    SELECT node, ROUND(pr, 6) AS pr FROM it5
    """,
)
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 5 synchronous iterations) over the
    bidirected customer↔supplier trade graph — iterative graph ranking
    as a driver-side DataFrame loop, oracle-checked against the same
    five iterations unrolled as chained CTEs in DuckDB.

    Bidirecting the bipartite edge set removes dangling nodes, so no
    global dangling-mass redistribution term is needed and each
    iteration is exactly: pr' = 0.15/N + 0.85·Σ_in pr/outdeg. Engines
    sum incoming mass in different orders, so ranks are rounded to 6
    decimals (drift after 5 iterations ≪ 1e-12).

    Scale shape: each iteration is one join on src (ranks are a narrow
    (node, pr) relation against the persisted contribution table) + one
    hash agg on dst — the standard Pregel-as-joins form. Dedup happens
    on INTEGER key pairs before any string node-id exists (longs
    shuffle ~3× cheaper than strings), and bidirecting after the dedup
    needs no second distinct (the two directions are disjoint by
    construction). Each round ends in localCheckpoint, so round k+1's
    plan starts from materialized ranks instead of re-optimizing k
    chained shuffles (26 s → ~13 s at sf0.1); swap for reliable
    checkpoint(dir) on a real cluster, as in connected_components.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    fwd = pairs.select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    # c→s and s→c namespaces are disjoint: union IS the distinct edge set
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    from pyspark_movie_recommender_spark.operators.cache import track

    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
    # the (src, dst, outdeg) contribution relation feeds EVERY round:
    # tracked-persist it so the fact join + dedup + degree agg run
    # once, not 5× (cache.release_all() drains the blocks).
    contrib_src = track(edges.join(deg, "src"))
    n_nodes = deg.count()  # driver-side scalar (like ALS's RMSE), one tiny job
    ranks = deg.select("src", F.lit(1.0 / n_nodes).alias("pr"))
    for _ in range(5):
        ranks = (
            contrib_src.join(ranks, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.lit(0.15 / n_nodes)
                    + 0.85 * F.sum(F.col("pr") / F.col("outdeg"))
                ).alias("pr")
            )
            .withColumnRenamed("node", "src")
            .localCheckpoint()
        )
    return ranks.select(F.col("src").alias("node"), F.round("pr", 6).alias("pr"))


@query(
    "unigram_logprob_quality",
    bench=True,
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents WHERE trim(text) <> ''
    ), lm AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY w
    ), tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM lm
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(-ln(CAST(lm.cnt AS DOUBLE) / CAST(tot.n AS DOUBLE))), 6)
               AS avg_neg_logprob
    FROM tok t JOIN lm ON t.w = lm.w, tot
    GROUP BY t.doc_id
    """,
)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality scoring with the corpus's own unigram LM:
    each document's mean token surprisal −ln p(w) — the (cheap,
    self-supervised) stand-in for perplexity-based corpus filtering;
    low-surprisal docs are boilerplate-ish, high-surprisal docs are
    noise. Extends the rule-based quality family (gopher filter,
    doc_profile) with a statistical scorer.

    Scale shape: the LM is a token→count table built by one explode +
    hash agg (vocab-sized, broadcast back onto the token stream); the
    per-doc score is a second hash agg on doc_id. Two shuffles total,
    both over narrow rows; every expression is JVM-side.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), "\\s+")).alias("w"),
    )
    lm = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    total = lm.agg(F.sum("cnt").cast("long").alias("n"))
    return (
        tok.join(F.broadcast(lm), "w")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(
                F.avg(
                    -F.log(
                        F.col("cnt").cast("double") / F.col("n").cast("double")
                    )
                ),
                6,
            ).alias("avg_neg_logprob"),
        )
    )


@query(
    "cumulative_distinct_event_types",
    oracle="""
    WITH flagged AS (
        SELECT event_id, user_id, ts,
               CASE WHEN row_number() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS first_seen
        FROM events
    )
    SELECT event_id, user_id, ts,
           CAST(SUM(first_seen) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_seen
    FROM flagged
    """,
)
def cumulative_distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) — not directly expressible as a window
    aggregate in either engine — via the first-occurrence trick: flag
    each (user, type)'s first event with row_number, then a running sum
    of flags gives the number of distinct types seen so far.

    Scale shape: both windows hash-partition by user_id, so the second
    window reuses the first's exchange (one shuffle total); state per
    row is one bit. The same trick computes any 'distinct-so-far'
    feature (new-item rate, vocabulary growth) at 100 TB without a
    quadratic distinct-per-prefix recompute.
    """
    e = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return flagged.select(
        "event_id",
        "user_id",
        "ts",
        F.sum("first_seen").over(w_cum).cast("long").alias("n_types_seen"),
    )


@query(
    "revenue_share_ppm",
    oracle="""
    WITH nrev AS (
        SELECT n.n_regionkey, n.n_name,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                    * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
    )
    SELECT n_name,
           cents AS revenue_cents,
           CAST((cents * 1000000) // SUM(cents) OVER (PARTITION BY n_regionkey)
                AS BIGINT) AS share_ppm
    FROM nrev
    """,
)
def revenue_share_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-group analytics (ratio_to_report): each nation's
    revenue as parts-per-million of its region's total — exact to the
    last ppm because the share is BIGINT arithmetic (cents·10⁶ integer-
    divided by the region window total), never a float ratio.

    Scale shape: the fact chain reduces to a 25-row nation aggregate
    before the window, so the share pass is driver-trivial; the only
    real work is the fact join-agg, with nation/customer dims broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    nrev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "n_name")
        .agg(F.sum(cents).cast("long").alias("cents"))
    )
    w = Window.partitionBy("n_regionkey")
    return nrev.select(
        "n_name",
        F.col("cents").alias("revenue_cents"),
        F.expr("CAST((cents * 1000000) DIV SUM(cents) OVER (PARTITION BY n_regionkey) AS BIGINT)").alias("share_ppm"),
    )


@query("countmin_token_estimates")
def countmin_token_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over corpus tokens (d=4 hash rows × w=1024
    buckets), probed for the exact top-20 tokens — the mergeable
    point-frequency sketch completing the sketch family (HLL for
    cardinality, CMS for counts, exact twin = token_heavy_hitters).

    The sketch IS a DataFrame: (row, bucket, cnt) built by one explode
    + hash agg, so it merges across shards/days by summing matching
    cells (the same store-and-merge contract as hll_sketch_rollup).
    Estimate(t) = min over rows of cell(row, hash_row(t) mod w) —
    upper-bounds the true count, overcounting only on bucket
    collisions (ε ≈ e/w per row).

    No oracle: xxhash64 is Spark-side only; the accuracy contract
    (exact ≤ est, with bounded overcount) is pinned by
    tests/test_operators.py::test_countmin_upper_bounds_exact.

    Scale shape: sketch build is map-side explode + 4096-cell hash agg
    (constant-size state — the point of a sketch at 100 TB); the probe
    set is tiny and both probe joins are broadcasts.
    """
    D, W_CELLS = 4, 1024
    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    tok = docs.select(
        F.explode(F.split(F.trim(F.col("text")), "\\s+")).alias("w")
    )
    cells = tok.select(
        "w",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        F.pmod(F.xxhash64("w", F.lit(r)), F.lit(W_CELLS)).alias(
                            "bucket"
                        ),
                    )
                    for r in range(D)
                ]
            )
        ).alias("c"),
    ).select(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    sketch = cells.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    top = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("w"))
        .limit(20)
    )
    probes = top.select(
        "w",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        F.pmod(F.xxhash64("w", F.lit(r)), F.lit(W_CELLS)).alias(
                            "bucket"
                        ),
                    )
                    for r in range(D)
                ]
            )
        ).alias("c"),
    ).select("w", "exact_cnt", F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(sketch, ["row", "bucket"])
        .groupBy("w", "exact_cnt")
        .agg(F.min("cnt").cast("long").alias("est_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("w"))
    )


# ---------------------------------------------------------------------------
# wave 7: skyline, period-over-period, binning, vector quantization
# ---------------------------------------------------------------------------


@query(
    "skyline_parts_pareto",
    oracle="""
    SELECT p.p_brand, p.p_partkey,
           CAST(FLOOR(p.p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
           CAST(p.p_size AS INT) AS p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_brand = p.p_brand
          AND q.p_retailprice <= p.p_retailprice
          AND q.p_size <= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
    )
    """,
)
def skyline_parts_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query: per brand, the parts not
    dominated on (price, size) by any other part of the same brand —
    the multi-criteria shortlist shape (cheapest-for-its-size), which
    no single ORDER BY can express.

    Scale shape: dominance is a THETA anti-join, blocked on the brand
    equality key so the quadratic check runs only within each brand's
    partition (same blocking discipline as the levenshtein/JW dedups).
    At 100 TB you'd pre-reduce each block to its 2-D staircase with a
    window (sort by price, keep rows whose size beats the running min
    — the classic skyline sweep) before any pairwise check; block
    sizes here (≲100 parts/brand) don't need it.
    """
    p = load_table(spark, sf_dir, "part")
    q = p.select(
        F.col("p_brand").alias("q_brand"),
        F.col("p_retailprice").alias("q_price"),
        F.col("p_size").alias("q_size"),
    )
    dominated = (
        (F.col("q_brand") == F.col("p_brand"))
        & (F.col("q_price") <= F.col("p_retailprice"))
        & (F.col("q_size") <= F.col("p_size"))
        & (
            (F.col("q_price") < F.col("p_retailprice"))
            | (F.col("q_size") < F.col("p_size"))
        )
    )
    return p.join(q, dominated, "left_anti").select(
        "p_brand",
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long").alias("price_cents"),
        F.col("p_size").cast("int").alias("p_size"),
    )


@query(
    "mom_revenue_growth",
    oracle="""
    WITH m AS (
        SELECT n.n_name,
               CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
    )
    SELECT n_name, month, cents AS revenue_cents,
           CAST((cents * 1000000) //
                lag(cents) OVER (PARTITION BY n_name ORDER BY month)
                AS BIGINT) AS growth_ppm
    FROM m
    """,
)
def mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period analytics: month-over-month revenue per
    nation with the growth ratio as exact BIGINT ppm ((cur·10⁶) DIV
    prev — integer division, so no float ratio can drift; NULL for
    each nation's first month).

    Scale shape: the fact table reduces to (nation × month) before the
    lag window, so the sequential pass runs over a few hundred rows
    regardless of fact size; dims broadcast.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    m = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("month"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("n_name").orderBy("month")
    return m.select(
        "n_name",
        "month",
        F.col("cents").alias("revenue_cents"),
        F.expr(
            "CAST((cents * 1000000) DIV lag(cents) OVER "
            "(PARTITION BY n_name ORDER BY month) AS BIGINT)"
        ).alias("growth_ppm"),
    )


@query(
    "ntile_price_quartiles",
    oracle="""
    WITH q AS (
        SELECT o_orderpriority,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               ntile(4) OVER (PARTITION BY o_orderpriority
                              ORDER BY CAST(FLOOR(o_totalprice * 100 + 0.5)
                                            AS BIGINT), o_orderkey) AS quartile
        FROM orders
    )
    SELECT o_orderpriority, CAST(quartile AS INT) AS quartile,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents
    FROM q GROUP BY 1, 2
    """,
)
def ntile_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth feature binning: each order assigned to its
    priority's price quartile via ntile over a TOTAL order (cents,
    orderkey tie-break — ntile on a partial order is nondeterministic
    in any engine), then per-bucket count + value ranges — the
    quantile-bucketizer every feature pipeline needs.

    Scale shape: one window exchange on priority, then a tiny
    (priority × 4) agg reusing the same partitioning. For 100 TB,
    swap ntile for precomputed approx-percentile cut points (the
    winsorized/percentile queries) to avoid the per-group sort.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    w = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    q = o.select(
        "o_orderpriority", cents.alias("cents"), F.col("o_orderkey")
    ).withColumn("quartile", F.ntile(4).over(w).cast("int"))
    return q.groupBy("o_orderpriority", "quartile").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
    )


@query(
    "embedding_int8_quantize",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS n_dims,
           CAST(list_sum(list_transform(embedding, x ->
                GREATEST(-128, LEAST(127,
                    CAST(FLOOR(CAST(x AS DOUBLE) * 64 + 0.5) AS BIGINT)))))
                AS BIGINT) AS q_checksum,
           CAST(list_min(list_transform(embedding, x ->
                GREATEST(-128, LEAST(127,
                    CAST(FLOOR(CAST(x AS DOUBLE) * 64 + 0.5) AS BIGINT)))))
                AS BIGINT) AS q_min,
           CAST(list_max(list_transform(embedding, x ->
                GREATEST(-128, LEAST(127,
                    CAST(FLOOR(CAST(x AS DOUBLE) * 64 + 0.5) AS BIGINT)))))
                AS BIGINT) AS q_max
    FROM embeddings
    """,
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-scale int8 vector quantization (q = clip(round(x·64)) —
    the storage/bandwidth lever for ANN at scale: 4× smaller vectors,
    SIMD-able integer dot products), verified by per-vector integer
    checksum + range. A FIXED scale (not per-vector min/max) keeps the
    quantizer exact and engine-portable: floor(x·64 + 0.5) is the same
    IEEE op in both dialects, so the oracle checks every element via
    the checksum.

    Scale shape: pure map-side HOF projection (transform/aggregate) —
    zero shuffles, zero Python. The SQL HOF form is the SPEC; a
    100 TB pass would swap in the Arrow/NumPy kernel (see
    operators/similarity.py cosine_arrow) for the ~10× interpreter
    cliff on nested lambdas, identical results.
    """
    e = load_table(spark, sf_dir, "embeddings")
    qexpr = (
        "transform(embedding, x -> GREATEST(-128L, LEAST(127L, "
        "CAST(FLOOR(CAST(x AS DOUBLE) * 64 + 0.5) AS BIGINT))))"
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("n_dims"),
        F.expr(f"aggregate({qexpr}, 0L, (a, b) -> a + b)")
        .cast("long")
        .alias("q_checksum"),
        F.expr(f"array_min({qexpr})").cast("long").alias("q_min"),
        F.expr(f"array_max({qexpr})").cast("long").alias("q_max"),
    )


@query(
    "prefix_filter_jaccard_pairs",
    oracle="""
    WITH tok AS (
        SELECT DISTINCT doc_id AS id,
               unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents WHERE trim(text) <> ''
    ), tok2 AS (
        SELECT id, w FROM tok WHERE w <> ''
    ), sz AS (
        SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM tok2 GROUP BY id
    ), inter AS (
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS inter
        FROM tok2 a JOIN tok2 b ON a.w = b.w AND a.id < b.id
        GROUP BY 1, 2
    )
    SELECT i.id_a, i.id_b, i.inter,
           sa.n AS n_a, sb.n AS n_b,
           CAST((i.inter * 1000000) // (sa.n + sb.n - i.inter) AS BIGINT)
               AS jaccard_ppm
    FROM inter i
    JOIN sz sa ON i.id_a = sa.id
    JOIN sz sb ON i.id_b = sb.id
    WHERE 170 * i.inter >= 70 * (sa.n + sb.n)
    """,
)
def prefix_filter_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact set-similarity join (word-set Jaccard ≥
    0.70) — see operators/dedup.py prefix_filtered_jaccard_pairs. The
    oracle is the NAIVE all-pairs shared-token join: hash-equality of
    the two result sets proves the prefix filter is lossless pruning,
    not an approximation (contrast minhash_lsh_pairs, which trades
    recall for speed and gets rows-only checks).

    Scale shape: candidates come only from rare-token prefixes (the
    corpus-wide stop tokens that make the naive join quadratic never
    enter any prefix), plus an integer size-ratio prune — the
    sub-quadratic EXACT leg of the dedup family, between the df-capped
    jaccard sampler and LSH.
    """
    from pyspark_movie_recommender_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return prefix_filtered_jaccard_pairs(docs, threshold_pct=70)


# ---------------------------------------------------------------------------
# wave 9: classic OLAP suite, part III (Q8/Q9/Q10/Q15 shapes)
# ---------------------------------------------------------------------------


@query(
    "national_market_share",
    oracle="""
    WITH mkt AS (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
               CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                    AS BIGINT) AS cents,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
        JOIN region r    ON cn.n_regionkey = r.r_regionkey
        JOIN supplier s  ON l.l_suppkey = s.s_suppkey
        JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
        WHERE r.r_name = 'ASIA'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN cents ELSE 0 END)
                AS BIGINT) AS nation_cents,
           CAST(SUM(cents) AS BIGINT) AS market_cents,
           CAST((SUM(CASE WHEN supp_nation = 'NATION_2' THEN cents ELSE 0 END)
                 * 1000000) // SUM(cents) AS BIGINT) AS share_ppm
    FROM mkt GROUP BY o_year
    """,
)
def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_2's share of supplier revenue in the ASIA
    customer market per order year — the two-level conditional ratio
    (numerator = CASE inside SUM, one pass, no self-join), share exact
    in BIGINT ppm.

    Scale shape: all five dims broadcast; the fact chain shuffles
    lineitem⋈orders on orderkey then orders⋈customer on custkey; both
    sums accumulate in ONE hash agg keyed by year (≈7 groups).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "supplier")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    cust_nat = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    supp_nat = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey).select(
            "s_suppkey", F.col("n_name").alias("supp_nation")
        )
    )
    mkt = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(cust_nat, c.c_nationkey == F.col("cn_key"))
        .join(supp_nat, li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            cents.alias("cents"),
            "supp_nation",
        )
    )
    nat = F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("cents")).otherwise(0))
    return mkt.groupBy("o_year").agg(
        nat.cast("long").alias("nation_cents"),
        F.sum("cents").cast("long").alias("market_cents"),
        F.expr(
            "CAST((SUM(CASE WHEN supp_nation = 'NATION_2' THEN cents ELSE 0 END)"
            " * 1000000) DIV SUM(cents) AS BIGINT)"
        ).alias("share_ppm"),
    )


@query(
    "product_type_profit",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS profit_cents
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit from one product family (name LIKE
    '%widget%') by supplier nation × order year — the many-dim star
    join with a mid-string LIKE that can't prune at the scan but CAN
    shrink the broadcast part dim before the fact join.

    Scale shape: part filters to the widget subset then broadcasts
    (so the fact side is pre-pruned by the join itself), supplier and
    nation broadcast; one orderkey shuffle for the orders join; final
    agg is (25 nations × years).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    supp_nat = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey).select(
            "s_suppkey", F.col("n_name").alias("supp_nation")
        )
    )
    return (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(supp_nat, li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("supp_nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.sum(cents).cast("long").alias("profit_cents"))
    )


@query(
    "returned_revenue_top_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS returned_cents
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY returned_cents DESC, c_custkey ASC
    LIMIT 20
    """,
)
def returned_revenue_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers with the most returned-item
    revenue (returnflag R) — the 'who is hurting us' ranking behind
    churn/fraud triage, with a deterministic custkey tie-break.

    Scale shape: the returnflag filter pushes to the lineitem scan;
    custkey/orderkey shuffles carry only keys + cents; nation
    broadcasts; the final ranking is TakeOrderedAndProject (top-20
    heap per partition), never a global sort.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(cents).cast("long").alias("returned_cents"))
        .orderBy(F.desc("returned_cents"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "top_supplier_per_quarter",
    oracle="""
    WITH q AS (
        SELECT l.l_suppkey,
               CAST(date_trunc('quarter', l.l_shipdate) AS DATE) AS qtr,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                    * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem l GROUP BY 1, 2
    )
    SELECT qtr, s.s_name,
           cents AS revenue_cents
    FROM (SELECT *, rank() OVER (PARTITION BY qtr ORDER BY cents DESC) AS rk
          FROM q) r
    JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE rk = 1
    """,
)
def top_supplier_per_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the top-revenue supplier of each ship quarter —
    the classic 'MAX of an aggregate' view, done with rank() so exact
    ties all surface (deterministic without an arbitrary pick; the
    original's revenue = MAX(revenue) subquery keeps ties too).

    Scale shape: lineitem pre-aggregates to (supplier × quarter)
    before any window — the rank runs over ~400 rows; WindowGroupLimit
    prunes rank=1 per partition pre-shuffle; supplier broadcasts onto
    the winners only.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    q = li.groupBy(
        "l_suppkey",
        F.to_date(F.date_trunc("quarter", F.col("l_shipdate"))).alias("qtr"),
    ).agg(F.sum(cents).cast("long").alias("cents"))
    w = Window.partitionBy("qtr").orderBy(F.desc("cents"))
    return (
        q.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("qtr", "s_name", F.col("cents").alias("revenue_cents"))
    )


# ---------------------------------------------------------------------------
# wave 10: association rules, privacy erasure
# ---------------------------------------------------------------------------


@query(
    "association_rules_parts",
    bench=True,
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n_orders AS (
        SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM items
    ), item_n AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM items GROUP BY 1
    ), pair_n AS (
        SELECT a.l_partkey AS ante, b.l_partkey AS cons,
               CAST(COUNT(*) AS BIGINT) AS both_cnt
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
    )
    SELECT p.ante, p.cons, p.both_cnt,
           ia.cnt AS ante_cnt,
           CAST((p.both_cnt * 1000000) // ia.cnt AS BIGINT)
               AS confidence_ppm,
           CAST((p.both_cnt * n.n * 1000000) // (ia.cnt * ic.cnt) AS BIGINT)
               AS lift_ppm
    FROM pair_n p
    JOIN item_n ia ON p.ante = ia.l_partkey
    JOIN item_n ic ON p.cons = ic.l_partkey, n_orders n
    WHERE p.both_cnt >= 3
    ORDER BY confidence_ppm DESC, ante ASC, cons ASC
    LIMIT 50
    """,
)
def association_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: for each directed part
    pair A→B with support ≥ 3 orders, confidence P(B|A) and lift
    P(B|A)/P(B) — the full rule-mining step on top of
    market_basket_pairs' raw co-occurrence, with every ratio exact in
    BIGINT ppm (integer division; no float probabilities).

    Scale shape: the pair fan-out stays C(basket,2)-bounded; item
    counts and the global order count are tiny broadcast sides; the
    top-50 is TakeOrderedAndProject. The support≥3 filter runs on the
    aggregated pair relation BEFORE the ratio joins, pruning the long
    tail early.
    """
    from pyspark_movie_recommender_spark.operators.cache import track

    li = load_table(spark, sf_dir, "lineitem")
    # tracked persist: the (order, part) distinct is consumed FOUR ways
    # (order-count scalar, item counts, both self-join sides) — without it
    # each branch would redo the fact scan + distinct shuffle
    items = track(li.select("l_orderkey", "l_partkey").distinct())
    n_orders = items.select("l_orderkey").distinct().count()  # driver scalar
    item_n = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    a = items.alias("a")
    b = items.alias("b")
    pair_n = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("ante"),
            F.col("b.l_partkey").alias("cons"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("both_cnt"))
        .filter(F.col("both_cnt") >= 3)
    )
    ia = F.broadcast(item_n.select(F.col("l_partkey").alias("ante"),
                                   F.col("cnt").alias("ante_cnt")))
    ic = F.broadcast(item_n.select(F.col("l_partkey").alias("cons"),
                                   F.col("cnt").alias("cons_cnt")))
    return (
        pair_n.join(ia, "ante")
        .join(ic, "cons")
        .select(
            "ante",
            "cons",
            "both_cnt",
            "ante_cnt",
            F.expr("CAST((both_cnt * 1000000) DIV ante_cnt AS BIGINT)").alias(
                "confidence_ppm"
            ),
            F.expr(
                f"CAST((both_cnt * {n_orders}L * 1000000) DIV "
                "(ante_cnt * cons_cnt) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("confidence_ppm"), F.asc("ante"), F.asc("cons"))
        .limit(50)
    )


@query(
    "privacy_erasure_audit",
    oracle="""
    WITH erase AS (
        SELECT DISTINCT user_id FROM events
        WHERE user_id % 37 = 0
    ), kept AS (
        SELECT e.* FROM events e
        WHERE NOT EXISTS (SELECT 1 FROM erase x WHERE x.user_id = e.user_id)
    )
    SELECT 'events.before' AS metric, CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    UNION ALL
    SELECT 'events.after', CAST(COUNT(*) AS BIGINT) FROM kept
    UNION ALL
    SELECT 'events.erased_users',
           CAST(COUNT(*) AS BIGINT) FROM erase
    UNION ALL
    SELECT 'events.residual_rows',
           CAST(COUNT(*) AS BIGINT)
    FROM kept k WHERE EXISTS (SELECT 1 FROM erase x
                              WHERE x.user_id = k.user_id)
    """,
)
def privacy_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten pass with its audit: drop every event of
    the erasure set (here: deterministic user_id % 37 = 0 stand-in for
    a DSAR list), then PROVE completeness in the same job — before /
    after counts, erased-user count, and a residual check that MUST be
    zero (the auditor's query, not the deleter's claim).

    Scale shape: the erasure list is a broadcast anti-join (key-only
    dim side); the residual check is the mirror semi-join over the
    kept rows — both shuffle-free on the fact side. At 100 TB this is
    the standard GDPR repave: scan, anti-join, rewrite partitions,
    then run exactly this audit before swapping them in.
    """
    e = load_table(spark, sf_dir, "events")
    erase = e.filter(F.col("user_id") % 37 == 0).select("user_id").distinct()
    kept = e.join(F.broadcast(erase), "user_id", "left_anti")
    residual = kept.join(F.broadcast(erase), "user_id", "left_semi")

    def one(metric: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit(metric).alias("metric"), "n"
        )

    return (
        one("events.before", e)
        .unionByName(one("events.after", kept))
        .unionByName(one("events.erased_users", erase))
        .unionByName(one("events.residual_rows", residual))
    )


@query(
    "cogroup_user_reconciliation",
    oracle="""
    WITH ev AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS event_cents
        FROM events GROUP BY user_id
    ), od AS (
        SELECT o_custkey AS user_id,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS order_cents
        FROM orders GROUP BY o_custkey
    )
    SELECT COALESCE(ev.user_id, od.user_id) AS user_id,
           CAST(COALESCE(ev.n_events, 0) AS BIGINT)    AS n_events,
           CAST(COALESCE(od.n_orders, 0) AS BIGINT)    AS n_orders,
           CAST(COALESCE(ev.event_cents, 0) AS BIGINT) AS event_cents,
           CAST(COALESCE(od.order_cents, 0) AS BIGINT) AS order_cents
    FROM ev FULL OUTER JOIN od ON ev.user_id = od.user_id
    """,
)
def cogroup_user_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-grouped applyInPandas (operators/udf_surface.py): per-user
    two-sided reconciliation of event activity vs order history —
    the cogroup UDF form, VALUE-checked against a full-outer-join of
    two aggregates in DuckDB (integer cents, so the Arrow plumbing is
    verified exactly, not just row counts)."""
    from pyspark_movie_recommender_spark.operators.udf_surface import (
        cogrouped_user_reconciliation,
    )

    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    return cogrouped_user_reconciliation(events, orders)


# ---------------------------------------------------------------------------
# wave 11: completing the classic TPC-H shape suite (Q6, Q11, Q12, Q16,
# Q20, Q21 — adapted to the available columns: no partsupp/shipmode/
# commitdate in the testdata, so each keeps the REFERENCE PLAN SHAPE with
# substitute predicates)
# ---------------------------------------------------------------------------


@query(
    "forecast_revenue_q6",
    oracle="""
    SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-filter-aggregate forecast query —
    no joins, one global agg, every predicate pushable to the parquet
    scan (shipdate range, discount band, quantity cap all reach
    PushedFilters; ReadSchema is 4 columns).

    Scale shape: this is the query whose 100-TB cost IS the scan; the
    plan must be map-side partial agg -> single-row final with zero
    shuffled data beyond one partial row per task. Revenue kept in
    BIGINT cents (per-row floor is engine-identical; summation order
    can't drift integers).
    """
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    return (
        li.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * F.col("l_discount") * 100 + 0.5)
                .cast("long")
            )
            .cast("long")
            .alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@query(
    "important_part_revenue_share",
    oracle="""
    WITH v AS (
        SELECT l_partkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS value_cents
        FROM lineitem GROUP BY l_partkey
    ), t AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS tot FROM v)
    SELECT v.l_partkey, v.value_cents
    FROM v, t
    WHERE 2000 * v.value_cents > t.tot
    """,
)
def important_part_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp replaced by lineitem revenue): parts
    whose total revenue exceeds 1/2000 of the global total — the
    group-agg + global-scalar-subquery HAVING filter.

    Scale shape: one fact shuffle for the per-part agg; the global
    total is an agg-of-agg over the already-reduced relation and comes
    back as a BROADCAST scalar (no second fact scan, no driver
    round-trip). Threshold as exact integer inequality
    ``2000*val > tot`` — no float share.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    v = li.groupBy("l_partkey").agg(F.sum(cents).cast("long").alias("value_cents"))
    tot = v.agg(F.sum("value_cents").cast("long").alias("tot"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(2000 * F.col("value_cents") > F.col("tot"))
        .select("l_partkey", "value_cents")
    )


@query(
    "priority_class_by_linestatus",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    GROUP BY l.l_linestatus
    """,
)
def priority_class_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode replaced by linestatus): slow-shipped
    lines (shipped >30 days after order date) counted by line status,
    split urgent-vs-other via CASE-in-SUM conditional aggregation.

    Scale shape: the one big-big join in the suite — lineitem x orders
    shuffles on orderkey (AQE handles skew); the date-lag predicate is
    a residual on the join (it references both sides so it can't push
    below it); the final agg is 2 groups wide, so partial agg collapses
    everything map-side after the join.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("long").alias(
                "low_line_count"
            ),
        )
    )


@query(
    "supplier_count_by_part_attrs",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_type NOT LIKE 'S%'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def supplier_count_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type,
    size) for a filtered part subset, excluding a NOT-IN supplier
    denylist (negative balance stands in for the complaint-comment
    filter).

    Scale shape: part filters then BROADCASTS (the fact side is pruned
    by the join itself); the denylist is a tiny broadcast ANTI join —
    NOT IN is safe to decorrelate here because s_suppkey is non-null;
    COUNT(DISTINCT) expands to the standard two-phase distinct-expand
    agg on the grouped keys.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & ~F.col("p_type").like("S%")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@query(
    "promotable_suppliers_q20",
    oracle="""
    WITH sq AS (
        SELECT l.l_partkey, l.l_suppkey,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_name LIKE '%red%'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l.l_partkey, l.l_suppkey
    ), tot AS (
        SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS total_qty
        FROM sq GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM sq
    JOIN tot ON sq.l_partkey = tot.l_partkey
    JOIN supplier s ON sq.l_suppkey = s.s_suppkey
    WHERE 4 * sq.qty > tot.total_qty
    """,
)
def promotable_suppliers_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (availqty replaced by shipped quantity):
    suppliers who moved >25% of a red part's 1996 volume — the
    nested correlated-threshold semi-join, decorrelated into
    agg -> agg-of-agg -> integer-inequality join.

    Scale shape: red-part keys broadcast to prune the fact scan; one
    shuffle to (partkey, suppkey); the per-part total is an agg over
    the ALREADY-REDUCED relation (tiny second shuffle); supplier dim
    broadcasts onto the surviving pairs. Threshold is exact BIGINT
    ``4*qty > total`` — no float share.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    sq = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
    )
    tot = sq.groupBy("l_partkey").agg(
        F.sum("qty").cast("long").alias("total_qty")
    )
    return (
        sq.join(tot, "l_partkey")
        .filter(4 * F.col("qty") > F.col("total_qty"))
        .join(F.broadcast(s), sq.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )


@query(
    "sole_late_supplier_orders",
    oracle="""
    WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_suppkey, s.s_name
    """,
    bench=True,
)
def sole_late_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: per-supplier count of late lines in
    multi-supplier orders where that supplier was the ONLY late one
    (late := shipped >60 days after order date, standing in for
    receipt>commit).

    Scale shape: the oracle's EXISTS / NOT EXISTS pair would be two
    more fact-sized joins; here both decorrelate into per-order
    aggregates over ONE (orderkey, suppkey) reduction of the fact:
    ``n_supp``/``n_late_supp`` are unbounded-frame WINDOW counts over
    that pair relation, not COUNT(DISTINCT) over raw lines (which
    would plan a 2x expand shuffle) and not an agg + self-join back
    (which would scan the fact twice — exchange reuse is not
    guaranteed across branches). The fact is scanned and shuffled
    exactly once; the window and final agg run over the pair-sized
    relation.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    j = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "is_late",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).cast(
            "int"
        ),
    )
    # one fact reduction to (order, supplier) pairs; per-order stats are
    # window counts over this pair relation — no second fact pass
    pair = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum("is_late").alias("late_lines"),
    )
    ow = Window.partitionBy("l_orderkey")
    qual = (
        pair.withColumn("n_supp", F.count(F.lit(1)).over(ow))
        .withColumn(
            "n_late_supp",
            F.sum((F.col("late_lines") > 0).cast("int")).over(ow),
        )
        .filter(
            (F.col("late_lines") > 0)
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
    )
    return (
        qual.groupBy("l_suppkey")
        .agg(F.sum("late_lines").cast("long").alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
    )


# ---------------------------------------------------------------------------
# wave 12: LLM-data-pipeline additions — k-means routing over embeddings,
# BPE-style merge-pair statistics, cross-source contamination audit
# ---------------------------------------------------------------------------


@query(
    "kmeans_embedding_assign",
    oracle="""
    WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    c AS (
        SELECT e AS ce,
               CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
        FROM s WHERE vec_id IN (3, 66, 129, 192, 255, 318, 381, 444)
    ), scored AS (
        SELECT s.vec_id, c.cell,
               CAST(ROUND(list_cosine_similarity(s.e, c.ce) * 1e6) AS BIGINT)
                   AS sim_ppm
        FROM s CROSS JOIN c
    ), best AS (
        SELECT vec_id, cell, sim_ppm,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY sim_ppm DESC, cell) AS rn
        FROM scored
    )
    SELECT cell,
           CAST(COUNT(*) AS BIGINT)    AS n_vectors,
           CAST(SUM(sim_ppm) AS BIGINT) AS sum_sim_ppm,
           CAST(MIN(sim_ppm) AS BIGINT) AS min_sim_ppm
    FROM best WHERE rn = 1
    GROUP BY cell
    """,
)
def kmeans_embedding_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means Lloyd ASSIGNMENT step (k=8, centroids pinned to named
    corpus vectors so both engines compute the identical step) with
    per-cell population stats in exact ppm integers.

    The clustering layer of a curation pipeline: cells feed IVF
    routing, diversity sampling, and per-cluster quota selection.
    Iterating = recompute means per cell, re-call; each round is one
    corpus scan + an 8-row agg.

    Scale shape (operators/similarity.py `kmeans_assign`): centroids
    are a collected 8-row closure constant; assignment is one NumPy
    matmul per Arrow batch, MAP-SIDE — the only shuffle is the final
    8-group agg of (cell, ppm) pairs. The oracle's CROSS JOIN + window
    argmax is the spec; the engine never materializes corpus x k rows.
    """
    from pyspark_movie_recommender_spark.operators.similarity import kmeans_assign

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = kmeans_assign(emb, [3, 66, 129, 192, 255, 318, 381, 444])
    return assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum("sim_ppm").cast("long").alias("sum_sim_ppm"),
        F.min("sim_ppm").cast("long").alias("min_sim_ppm"),
    )


@query(
    "bpe_pair_merge_counts",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), pairs AS (
        SELECT unnest(list_transform(
                   range(1, greatest(length(tok) - 1, 0) + 1),
                   i -> substring(tok, CAST(i AS INT), 2))) AS pair
        FROM toks WHERE length(tok) >= 2
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT 20
    """,
)
def bpe_pair_merge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE merge iteration's statistics: corpus-wide counts
    of adjacent symbol pairs inside whitespace tokens, top-20 — what a
    tokenizer trainer computes before each merge (the merge itself is
    'pick row 1, rewrite, repeat').

    Scale shape: pure map-side double explode (tokens, then in-token
    positions) into a hash agg over a TINY key space (|alphabet|^2
    pairs), so partial aggregation collapses everything before the
    shuffle; top-20 is TakeOrderedAndProject, never a global sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.length("tok") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(tok) - 1, 0)),"
                " i -> substring(tok, i, 2))"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(20)
    )


@query(
    "source_shingle_overlap",
    bench=True,
    oracle="""
    WITH toks AS (
        SELECT source, string_split(text, ' ') AS t FROM documents
    ), grams AS (
        SELECT DISTINCT source,
               unnest(list_transform(
                   range(1, greatest(len(t) - 2, 0) + 1),
                   i -> t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1]
                        || ' ' || t[CAST(i AS INT) + 2])) AS gram
        FROM toks
    ), sz AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams
        FROM grams GROUP BY source
    ), shared AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM grams a JOIN grams b
          ON a.gram = b.gram AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT s.src_a, s.src_b, s.n_shared,
           za.n_grams AS grams_a, zb.n_grams AS grams_b,
           CAST(s.n_shared * 1000000 // LEAST(za.n_grams, zb.n_grams)
                AS BIGINT) AS overlap_ppm
    FROM shared s
    JOIN sz za ON za.source = s.src_a
    JOIN sz zb ON zb.source = s.src_b
    """,
)
def source_shingle_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination audit: for every source pair, how
    many distinct word 3-grams they share, plus the overlap
    coefficient ``shared / min(|A|, |B|)`` in exact ppm — the
    matrix a curation run reads before deciding which sources are
    near-copies of each other.

    Scale shape: the join key is the 3-gram and per-key fan-out is
    bounded by |sources| (each gram appears once per source after the
    DISTINCT), so the self-join can never go quadratic in documents —
    worst case |distinct grams| x C(|sources|, 2) with tiny constant.
    The distinct and the pair agg share the gram-keyed exchange.
    """
    from pyspark_movie_recommender_spark.operators.cache import track

    docs = load_table(spark, sf_dir, "documents")
    # tokenize ONCE per row into a column; the gram lambda then reads the
    # materialized array (element_at inside the lambda over split(text)
    # would re-split per element — ~3x gram count splits per doc)
    toks = docs.select("source", F.split("text", " ").alias("t"))
    grams = track(
        toks.select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(t) - 2, 0)),"
                    " i -> concat_ws(' ', element_at(t, i),"
                    " element_at(t, i + 1), element_at(t, i + 2)))"
                )
            ).alias("gram"),
        ).distinct()
        # persisted: consumed three ways (per-source sizes + both join sides)
    )
    sz = grams.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_grams"))
    a = grams.alias("a")
    b = grams.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    za = sz.select(F.col("source").alias("src_a"), F.col("n_grams").alias("grams_a"))
    zb = sz.select(F.col("source").alias("src_b"), F.col("n_grams").alias("grams_b"))
    return (
        shared.join(F.broadcast(za), "src_a")
        .join(F.broadcast(zb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "grams_a",
            "grams_b",
            F.expr("(n_shared * 1000000L) div least(grams_a, grams_b)")
            .cast("long")
            .alias("overlap_ppm"),
        )
    )


@query(
    "triangle_count_copurchase",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(DISTINCT x) FROM (
                 SELECT u AS x FROM e UNION ALL SELECT v FROM e)) AS BIGINT)
               AS n_nodes,
           CAST((SELECT COUNT(*)
                 FROM e e1
                 JOIN e e2 ON e1.v = e2.u
                 JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS BIGINT)
               AS n_triangles
    """,
)
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the part co-purchase graph (parts linked
    when ≥2 orders contain both): the classic distributed graph metric
    behind clustering coefficients and community strength.

    Algorithm: orient each edge low-id→high-id, join e1(u,v)⋈e2(v,w)
    to enumerate oriented wedges, then verify the closing edge (u,w) —
    each triangle is counted exactly once. (At corpus scale, orient by
    DEGREE instead of id — the wedge count is then bounded by
    Σ min(deg)² which is the optimal join-based form; id-orientation
    keeps the oracle dialect-shared here.)

    Scale shape: the support-≥2 threshold caps edge degree before any
    wedge forms (same role as the stop-shingle cap in n-gram dedup);
    the edge relation is persisted once and re-read by all three join
    roles instead of re-running the basket self-join; wedges shuffle on
    the shared vertex only.
    """
    from pyspark_movie_recommender_spark.operators.cache import track

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    edges = track(
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("u", "v")
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    wedges = e1.join(e2, F.col("e1.v") == F.col("e2.u"))
    tris = wedges.join(
        e3,
        (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
    )
    n_edges = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    n_nodes = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .agg(F.count_distinct("x").cast("long").alias("n_nodes"))
    )
    n_tris = tris.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    return n_edges.crossJoin(n_nodes).crossJoin(n_tris)


@query(
    "union_by_name_evolution",
    oracle="""
    WITH old_feed AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 2 = 0
    ), new_feed AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 1
    ), unioned AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus,
               NULL AS o_orderpriority FROM old_feed
        UNION ALL
        SELECT * FROM new_feed
    )
    SELECT o_orderstatus,
           COALESCE(o_orderpriority, '<pre-schema>') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM unioned GROUP BY 1, 2
    """,
)
def union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: an old feed missing a column unions with
    the new feed by NAME (`unionByName(allowMissingColumns=True)`), the
    missing column null-filled — the append-only ingestion pattern when
    producers add fields over time. (Positional UNION would silently
    misalign; the bag-semantics positional form is `union_all_bag`.)

    Scale shape: both branches scan+filter map-side; the union is a
    plan-level concat (no shuffle); one hash agg on the tiny
    (status, priority) key space.
    """
    o = load_table(spark, sf_dir, "orders")
    old_feed = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new_feed = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    )
    unioned = old_feed.unionByName(new_feed, allowMissingColumns=True)
    return unioned.groupBy(
        "o_orderstatus",
        F.coalesce("o_orderpriority", F.lit("<pre-schema>")).alias("priority"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("total_cents"),
    )


@query(
    "array_setops_suite",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_sort(list_distinct(string_split(text, ' '))) AS w,
               list_sort(list_distinct(string_split(upper(text), ' '))) AS wu
        FROM documents WHERE doc_id % 50 = 0
    )
    SELECT doc_id,
           CAST(len(list_intersect(w, wu)) AS BIGINT)  AS n_common,
           CAST(len(w) + len(list_filter(wu, x -> NOT list_contains(w, x)))
                AS BIGINT)                              AS n_union,
           CAST(len(list_filter(w, x -> NOT list_contains(wu, x)))
                AS BIGINT)                              AS n_only_lower,
           list_sort(list_intersect(w, wu))[1]          AS first_common
    FROM t
    """,
)
def array_setops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (`array_intersect`/`array_union`/
    `array_except`) over per-doc token sets vs their uppercased twins —
    counts and an order-stable witness element, all computed INSIDE the
    row (no explode, no shuffle beyond the scan).

    Cross-engine note: Spark and DuckDB order set-op results
    differently, so the query compares SIZES plus a `sort->first`
    witness — the dialect-stable projection of an unordered result.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    t = docs.select(
        "doc_id",
        F.array_sort(F.array_distinct(F.split("text", " "))).alias("w"),
        F.array_sort(F.array_distinct(F.split(F.upper("text"), " "))).alias("wu"),
    )
    return t.select(
        "doc_id",
        F.size(F.array_intersect("w", "wu")).cast("long").alias("n_common"),
        F.size(F.array_union("w", "wu")).cast("long").alias("n_union"),
        F.size(F.array_except("w", "wu")).cast("long").alias("n_only_lower"),
        F.try_element_at(F.array_sort(F.array_intersect("w", "wu")), F.lit(1)).alias(
            "first_common"
        ),
    )


@query(
    "session_window_batch",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800 * 1000000
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts)                            AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE       AS session_end,
           CAST(COUNT(*) AS BIGINT)           AS n_events
    FROM sessions
    GROUP BY user_id, sid
    """,
)
def session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUILT-IN ``session_window`` aggregation run in batch mode,
    oracle-checked against the classic gaps-and-islands SQL — proving
    the native operator's session semantics (events merge when the gap
    is <= 30 min, strictly-greater gaps split; window end = last event
    + gap) coincide exactly with the lag+cumsum form
    (`sessionize_events`). The same expression runs under
    `streaming_session_window`; this twin is what makes that stream
    job's semantics oracle-checkable.

    Scale shape: one shuffle on user_id; session merging is the native
    operator's sort-based pass, no window-function chain.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "token_containment_pairs",
    oracle="""
    WITH t AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id % 20 = 0
    )
    SELECT a.doc_id AS id_small, b.doc_id AS id_big,
           CAST(len(a.w) AS BIGINT) AS n_small,
           CAST(len(b.w) AS BIGINT) AS n_big
    FROM t a JOIN t b
      ON a.doc_id <> b.doc_id AND len(a.w) < len(b.w)
    WHERE len(list_filter(a.w, x -> NOT list_contains(b.w, x))) = 0
    """,
)
def token_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subdocument detection: pairs where the smaller doc's token SET is
    fully contained in the larger doc's — the quote/excerpt/boilerplate
    relation exact Jaccard misses (containment can be 100% while
    Jaccard is tiny).

    The oracle is the NAIVE all-pairs containment join; the engine side
    prunes with the rarest-token block: if A ⊆ B then B must contain
    A's globally rarest token, so candidate pairs come from an
    equi-join on that ONE token instead of a cross join — hash equality
    against the naive oracle proves the pruning LOSSLESS. Per-key
    fan-out is bounded by the rarest token's document frequency (by
    construction the smallest available), the standard prefix-filter
    argument specialized to containment.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    t = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("w")
    ).withColumn("sz", F.size("w"))
    tok = t.select("doc_id", F.explode("w").alias("token"))
    df_counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # per doc: the token with the smallest (df, token) — its rarest
    rarest = (
        tok.join(F.broadcast(df_counts), "token")
        .groupBy("doc_id")
        .agg(F.min(F.struct("df", "token")).alias("m"))
        .select("doc_id", F.col("m.token").alias("rare_token"))
    )
    a = (
        t.join(rarest, "doc_id")
        .select(
            F.col("doc_id").alias("id_small"),
            F.col("w").alias("wa"),
            F.col("sz").alias("n_small"),
            "rare_token",
        )
    )
    b = tok.select(F.col("doc_id").alias("id_big"), F.col("token").alias("rare_token"))
    cand = a.join(b, "rare_token").filter(F.col("id_small") != F.col("id_big"))
    bw = t.select(
        F.col("doc_id").alias("id_big"), F.col("w").alias("wb"), F.col("sz").alias("n_big")
    )
    return (
        cand.join(bw, "id_big")
        .filter(
            (F.col("n_small") < F.col("n_big"))
            & (F.size(F.array_except("wa", "wb")) == 0)
        )
        .select(
            "id_small",
            "id_big",
            F.col("n_small").cast("long"),
            F.col("n_big").cast("long"),
        )
    )


@query(
    "cdc_latest_state",
    oracle="""
    WITH ranked AS (
        SELECT user_id, ts, event_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id,
           ts        AS last_ts,
           event_type AS last_op,
           ROUND(value, 6) AS last_value
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog compaction: materialize the latest state per key
    from an append-only change stream — newest record wins on the total
    (ts, event_id) order, and keys whose final record is a tombstone
    ('error' here) drop out of the materialized view. The batch twin of
    what `foreachBatch` upserts maintain incrementally.

    Scale shape: one shuffle on the key; newest-wins is a
    WindowGroupLimit-prunable row_number (per-partition top-1 pruned
    BEFORE the exchange, so the shuffle carries one candidate row per
    key per task, not the full history).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_op"),
            F.round("value", 6).alias("last_value"),
        )
    )


@query(
    "covisit_item_recs",
    oracle="""
    WITH views AS (
        SELECT DISTINCT user_id,
               CAST(json_extract(props, '$.k') AS INT) AS item
        FROM events WHERE event_type = 'view'
    ), pairs AS (
        SELECT a.item AS item_a, b.item AS item_b,
               CAST(COUNT(*) AS BIGINT) AS n_covisits
        FROM views a JOIN views b
          ON a.user_id = b.user_id AND a.item <> b.item
        GROUP BY 1, 2
    ), ranked AS (
        SELECT item_a, item_b, n_covisits,
               CAST(ROW_NUMBER() OVER (PARTITION BY item_a
                        ORDER BY n_covisits DESC, item_b) AS BIGINT) AS rnk
        FROM pairs
    )
    SELECT item_a, item_b, n_covisits, rnk FROM ranked WHERE rnk <= 5
    """,
)
def covisit_item_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-visitation recommender: for every item, the top-5
    items sharing the most viewers — the classic non-model recommender
    that serves next to ALS (and the cold-start fallback for items ALS
    drops). Item ids come out of the JSON props payload, so the query
    also exercises the JSON-extract path inside a join pipeline.

    Scale shape: the per-user distinct bounds pair fan-out by
    C(items_per_user, 2) — never corpus-quadratic; pair counts hash-agg
    map-side; the per-item top-5 is a rank window pruned by
    WindowGroupLimit before its shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .distinct()
    )
    a = views.alias("a")
    b = views.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.item") != F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_covisits"))
    )
    w = Window.partitionBy("item_a").orderBy(F.desc("n_covisits"), F.asc("item_b"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
    )


@query("als_implicit_covisits")
def als_implicit_covisits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit-feedback ALS (Hu/Koren/Volinsky confidence weighting)
    trained on per-(user, item) view COUNTS from the events stream —
    the engagement-signal twin of the reference's explicit-rating ALS
    (`recommender.py:61`): no ratings exist, so strength-of-interaction
    becomes the confidence weight. Top-5 recs per user, exploded to
    scalar columns (rows-only: factor initialization is
    engine-internal, so values aren't oracle-comparable; pytest pins
    shape + score monotonicity instead).

    Scale shape: the training input is the pre-aggregated (user, item,
    n) relation — events collapse map-side before ALS ever sees them;
    recommendForAllUsers is the blocked factor cross-product with
    per-user top-k inside each block.
    """
    from pyspark_movie_recommender_spark.recommend import _als

    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").cast("int"),
            F.get_json_object("props", "$.k").cast("int").alias("item_id"),
        )
        .groupBy("user_id", "item_id")
        .agg(F.count(F.lit(1)).cast("float").alias("rating"))
    )
    model = _als(8, implicit=True).fit(views)
    recs = model.recommendForAllUsers(5)
    return recs.select(
        "user_id",
        F.posexplode("recommendations").alias("pos", "rec"),
    ).select(
        "user_id",
        (F.col("pos") + 1).cast("long").alias("rnk"),
        F.col("rec.item_id").cast("long").alias("item_id"),
        F.round(F.col("rec.rating"), 4).alias("score"),
    )


@query(
    "curation_end_to_end",
    bench=True,
    oracle="""
    WITH toks AS (
        SELECT doc_id, text, lang, n_chars,
               string_split(text, ' ') AS t
        FROM documents
    ), quality AS (
        SELECT doc_id, text, lang, n_chars,
               len(t) AS n_tokens,
               len(list_distinct(t)) AS n_distinct
        FROM toks
        WHERE n_chars >= 50
          AND len(t) > 0
          AND len(list_distinct(t)) * 10 >= len(t) * 3
    ), deduped AS (
        SELECT * FROM (
            SELECT q.*,
                   ROW_NUMBER() OVER (PARTITION BY sha256(text)
                                      ORDER BY doc_id) AS rn
            FROM quality q)
        WHERE rn = 1
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)            AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT)       AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT)        AS total_chars,
           CAST(SUM(n_tokens * 1000000) // SUM(n_chars) AS BIGINT)
               AS tokens_per_kchar_ppk
    FROM deduped GROUP BY lang
    """,
)
def curation_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline as ONE lazy plan: rule-based quality
    gate (length floor + type-token-ratio floor, integer arithmetic) →
    exact content dedup (hash groupBy keep-first, no window sort) →
    per-language corpus yield report with exact integer densities.
    This is the query a training-data run executes nightly; each stage
    is the library operator the standalone queries check in isolation,
    composed here to prove they pipeline without materialization
    barriers.

    Scale shape: quality is map-side (no shuffle); dedup shuffles on
    the content hash with map-side partial min; the report is a
    |langs|-row agg. One fact scan end-to-end — Catalyst fuses the
    stages into two exchanges total.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    quality = docs.select(
        "doc_id",
        "text",
        "lang",
        "n_chars",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct"),
    ).filter(
        (F.col("n_chars") >= 50)
        & (F.col("n_tokens") > 0)
        & (F.col("n_distinct") * 10 >= F.col("n_tokens") * 3)
    )
    # exact dedup, groupBy-min form (same shape as operators/dedup.py
    # exact_dedup_by_hash): cheapest keeper per content hash, no window
    keeper = (
        quality.groupBy(F.sha2("text", 256).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = quality.join(keeper, "doc_id")
    return deduped.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.expr("(SUM(n_tokens) * 1000000) div SUM(n_chars)")
        .cast("long")
        .alias("tokens_per_kchar_ppk"),
    )


# ---------------------------------------------------------------------------
# wave 22: interval-union coverage, data-mixture allocation, nucleus vocab
# cutoff, cross-doc repeated-window scrub
# ---------------------------------------------------------------------------


@query(
    "interval_coverage_user",
    bench=True,
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id,
               epoch_us(ts)                        AS s_us,
               epoch_us(ts) + 300 * 1000000        AS e_us
        FROM events
    ), flagged AS (
        SELECT user_id, event_id, s_us, e_us,
               CASE WHEN MAX(e_us) OVER (
                        PARTITION BY user_id ORDER BY s_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        IS NULL
                 OR s_us > MAX(e_us) OVER (
                        PARTITION BY user_id ORDER BY s_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               THEN 1 ELSE 0 END AS new_island
        FROM iv
    ), islands AS (
        SELECT user_id, s_us, e_us,
               SUM(new_island) OVER (
                   PARTITION BY user_id ORDER BY s_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island_id
        FROM flagged
    ), per_island AS (
        SELECT user_id, island_id,
               MAX(e_us) - MIN(s_us) AS covered_us
        FROM islands GROUP BY user_id, island_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT)                     AS n_islands,
           CAST(SUM(covered_us) // 1000000 AS BIGINT)   AS covered_s
    FROM per_island GROUP BY user_id
    """,
)
def interval_coverage_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage: each event claims [ts, ts+5min); report
    per user how many disjoint coverage islands the union forms and the
    total covered seconds.

    Distinct from sessionization (gap-based grouping of POINTS): this is
    the measure of the union of INTERVALS — the uptime/watch-time/
    presence metric. Classic sweep: an interval starts a new island iff
    its start exceeds the running max end of everything before it.

    Scale shape: one shuffle on user_id; both windows and both
    aggregations reuse the same partitioning, so the whole query is a
    single exchange. All arithmetic in BIGINT microseconds — exact.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    iv = ev.select(
        "user_id",
        "event_id",
        us.alias("s_us"),
        (us + F.lit(300 * 1_000_000)).alias("e_us"),
    )
    w = Window.partitionBy("user_id").orderBy("s_us", "event_id")
    prev_max_end = F.max("e_us").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(
            prev_max_end.isNull() | (F.col("s_us") > prev_max_end), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island_id",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_island = islands.groupBy("user_id", "island_id").agg(
        (F.max("e_us") - F.min("s_us")).alias("covered_us")
    )
    return per_island.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.expr("SUM(covered_us) div 1000000").cast("long").alias("covered_s"),
    )


@query(
    "source_mixture_allocation",
    oracle="""
    WITH per_src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    ), weighted AS (
        -- temperature alpha=0.5 via integer sqrt: deterministic on both
        -- engines (sqrt of one integer is correctly rounded IEEE; floor
        -- of that is exact)
        SELECT source, n_docs,
               CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT) AS w
        FROM per_src
    ), shares AS (
        SELECT source, n_docs, w,
               SUM(w) OVER ()                         AS tot_w,
               (1000 * w) // SUM(w) OVER ()           AS base,
               (1000 * w) %  SUM(w) OVER ()           AS rem
        FROM weighted
    ), ranked AS (
        SELECT source, n_docs, w, base,
               ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rnk,
               1000 - SUM(base) OVER ()                      AS deficit
        FROM shares
    )
    SELECT source, n_docs,
           CAST(w AS BIGINT)    AS weight,
           CAST(base + CASE WHEN rnk <= deficit THEN 1 ELSE 0 END AS BIGINT)
               AS alloc_docs
    FROM ranked
    """,
)
def source_mixture_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data mixture: allocate a 1000-doc sampling budget across
    sources with temperature alpha=0.5 (weight = isqrt of doc count) via
    the largest-remainder method — allocations sum EXACTLY to the
    budget, every step BIGINT-exact, reproducible on any engine.

    This is the data-mixing stage of an LLM corpus build (down-weight
    huge crawls, up-weight small high-quality sources) reduced to
    integer arithmetic so the gate can hash-verify it.

    Scale shape: the fact scan collapses to |sources| rows in one
    map-side-partial agg; everything after runs on that tiny relation
    (single-partition windows over ~dozens of rows — bounded by the
    source catalog, not the corpus).
    """
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    weighted = per_src.withColumn(
        "w", F.floor(F.sqrt(F.col("n_docs").cast("double"))).cast("long")
    )
    wall = Window.partitionBy()
    shares = weighted.select(
        "source",
        "n_docs",
        "w",
        F.expr("(1000 * w) div SUM(w) OVER ()").alias("base"),
        (F.lit(1000) * F.col("w") % F.sum("w").over(wall)).alias("rem"),
    )
    ranked = shares.select(
        "source",
        "n_docs",
        "w",
        "base",
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), "source"))
        .alias("rnk"),
        (F.lit(1000) - F.sum("base").over(wall)).alias("deficit"),
    )
    return ranked.select(
        "source",
        "n_docs",
        F.col("w").cast("long").alias("weight"),
        (
            F.col("base")
            + F.when(F.col("rnk") <= F.col("deficit"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc_docs"),
    )


@query(
    "vocab_nucleus_cutoff",
    oracle="""
    WITH tok AS (
        SELECT lang, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), counts AS (
        SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM tok GROUP BY lang, token
    ), ranked AS (
        SELECT lang, token, cnt,
               SUM(cnt) OVER (PARTITION BY lang
                              ORDER BY cnt DESC, token
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cum,
               SUM(cnt) OVER (PARTITION BY lang)        AS total
        FROM counts
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)                          AS vocab_total,
           CAST(SUM(CASE WHEN (cum - cnt) * 100 < total * 99
                         THEN 1 ELSE 0 END) AS BIGINT)       AS vocab_kept,
           CAST(SUM(CASE WHEN (cum - cnt) * 100 < total * 99
                         THEN cnt ELSE 0 END) * 1000000
                // MAX(total) AS BIGINT)                     AS covered_ppm
    FROM ranked GROUP BY lang
    """,
)
def vocab_nucleus_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus (top-p) vocabulary truncation per language: keep the
    most frequent tokens until they cover 99% of the token mass, report
    kept/total vocab size and the exact coverage in ppm.

    The tokenizer-training decision (vocab size vs coverage) as a
    query: a token survives iff the mass BEFORE it is under the 99%
    line — pure BIGINT cumsum, no float thresholds.

    Scale shape: the corpus explode collapses map-side into a
    (lang, token) hash agg; the window runs over the VOCABULARY (not
    the corpus), partitioned by lang, so the sort is bounded by
    per-language vocab size. Final agg reuses the lang partitioning.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    wlang = Window.partitionBy("lang")
    worder = wlang.orderBy(F.col("cnt").desc(), "token").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = counts.select(
        "lang",
        "cnt",
        F.sum("cnt").over(worder).alias("cum"),
        F.sum("cnt").over(wlang).alias("total"),
    )
    keep = (F.col("cum") - F.col("cnt")) * 100 < F.col("total") * 99
    return ranked.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("vocab_total"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("vocab_kept"),
        F.expr(
            "SUM(CASE WHEN (cum - cnt) * 100 < total * 99 THEN cnt ELSE 0 END)"
            " * 1000000 div MAX(total)"
        )
        .cast("long")
        .alias("covered_ppm"),
    )


@query(
    "repeated_window_scrub",
    bench=True,
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), chunks AS (
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_id,
               array_to_string(t[i * 3 + 1 : i * 3 + 3], ' ') AS chunk
        FROM toks, LATERAL (
            SELECT unnest(generate_series(0, (len(t) - 1) // 3)) AS i)
    ), hot AS (
        SELECT chunk FROM chunks
        GROUP BY chunk HAVING COUNT(DISTINCT doc_id) >= 2
    ), flagged AS (
        SELECT c.doc_id, c.chunk_id, c.chunk,
               (h.chunk IS NOT NULL) AS is_hot
        FROM chunks c LEFT JOIN hot h ON c.chunk = h.chunk
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT)                             AS n_chunks,
           CAST(SUM(CASE WHEN is_hot THEN 0 ELSE 1 END) AS BIGINT)
               AS n_kept,
           COALESCE(string_agg(CASE WHEN NOT is_hot THEN chunk END,
                               ' ' ORDER BY chunk_id), '')      AS new_text
    FROM flagged GROUP BY doc_id
    """,
)
def repeated_window_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-window removal (C4-style line dedup for
    a corpus without newlines): split every document into consecutive
    3-token windows, drop any window whose exact text occurs in >= 2
    distinct documents, and reassemble the surviving windows in order.

    This is the boilerplate-LINE scrub (nav bars, license headers,
    cookie banners) that document-level dedup misses — the document
    survives, the shared chunk inside it does not.

    Scale shape: chunking is a map-side ``transform(sequence(...))``
    over the token array (no posexplode of raw tokens — windows are
    built in-row, then exploded once). The hot-window table is the
    output of a hash agg bounded by corpus/cap and joins back on the
    chunk text; reassembly groups by doc_id with an order-restoring
    array_sort — no window-function sort over the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    chunks = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, (size(split(text, ' ')) - 1) div 3),"
                " i -> array_join(slice(split(text, ' '), i * 3 + 1, 3), ' '))"
            )
        ).alias("chunk_id", "chunk"),
    ).select("doc_id", F.col("chunk_id").cast("long").alias("chunk_id"), "chunk")
    # df >= 2 distinct docs  <=>  min(doc_id) != max(doc_id): a single
    # hash agg with map-side partials — no count-distinct Expand pass
    hot = (
        chunks.groupBy("chunk")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .select("chunk", F.lit(True).alias("is_hot"))
    )
    flagged = chunks.join(hot, "chunk", "left").withColumn(
        "is_hot", F.coalesce("is_hot", F.lit(False))
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(F.when(F.col("is_hot"), 0).otherwise(1))
        .cast("long")
        .alias("n_kept"),
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "  CASE WHEN NOT is_hot THEN struct(chunk_id, chunk) END)),"
            " s -> s.chunk), ' ')"
        ).alias("new_text"),
    )


@query(
    "arrow_map_doc_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(strlen(text) AS BIGINT)                 AS n_bytes
    FROM documents
    """,
)
def arrow_map_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` surface: per-doc token/byte counts computed with
    pyarrow.compute kernels inside a RecordBatch iterator — the
    zero-copy Arrow-native Python boundary (no pandas conversion). The
    oracle verifies the Arrow kernel VALUES against the SQL spec.

    Scale shape: pure map-side, no shuffle; see
    operators/udf_surface.py arrow_doc_stats.
    """
    from pyspark_movie_recommender_spark.operators.udf_surface import arrow_doc_stats

    return arrow_doc_stats(load_table(spark, sf_dir, "documents"))


@query(
    "arrow_grouped_lang_stats",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)                          AS n_docs,
           CAST(SUM(strlen(text)) AS BIGINT)                 AS total_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents GROUP BY lang
    """,
)
def arrow_grouped_lang_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped ``applyInArrow`` surface: per-language corpus stats as a
    pyarrow Table → Table function — the Arrow-native twin of
    applyInPandas, completing the sanctioned Python-UDF surface
    (scalar/UDAF/applyInPandas/mapInPandas/UDTF/cogroup/mapInArrow/
    applyInArrow). Exact integer outputs → value-checked by the gate.

    Scale shape: one lang exchange, same as a groupBy agg; see
    operators/udf_surface.py arrow_grouped_lang_stats.
    """
    from pyspark_movie_recommender_spark.operators.udf_surface import (
        arrow_grouped_lang_stats,
    )

    return arrow_grouped_lang_stats(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# wave 23: mergeable-sketch tier (bitmap exact / theta / KLL) + positional
# phrase search
# ---------------------------------------------------------------------------


@query(
    "bitmap_distinct_rollup",
    oracle="""
    SELECT o_orderpriority AS grp,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct_cust
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT 'ALL' AS grp,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct_cust
    FROM orders
    """,
)
def bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counting via roaring-style bitmaps:
    per-priority bitmaps of customer keys, then a bitmap-OR merge to the
    global count — the store-and-merge alternative to COUNT(DISTINCT)
    rescans, and (unlike HLL) exact, so the gate hash-checks it.

    Pattern: group by (grp, bitmap_bucket_number(key)) building one
    32k-bit bitmap per bucket with ``bitmap_construct_agg``; per-group
    distinct = SUM of ``bitmap_count`` over buckets; the rollup ORs the
    per-group bucket bitmaps (``bitmap_or_agg``) BEFORE counting —
    proving the bitmaps merge, which is the property that lets a 100 TB
    pipeline keep per-partition bitmaps and union them at any grain.

    Scale shape: one shuffle on (grp, bucket) with map-side partial
    bitmap construction; the merge agg runs on |grps|x|buckets| bitmap
    rows, never rescanning the fact.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"), "o_custkey"
    )
    buckets = orders.groupBy(
        "grp", F.bitmap_bucket_number("o_custkey").alias("bucket")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("o_custkey")).alias("bm")
    )
    per_grp = buckets.groupBy("grp").agg(
        F.sum(F.bitmap_count("bm")).cast("long").alias("n_distinct_cust")
    )
    merged = (
        buckets.groupBy("bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).cast("long").alias("n_distinct_cust"))
        .select(F.lit("ALL").alias("grp"), "n_distinct_cust")
    )
    return per_grp.unionByName(merged)


@query("theta_token_overlap")
def theta_token_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra over source vocabularies: per-source
    distinct-token sketches, then UNION and INTERSECTION estimates
    across source pairs — the sketch that (unlike HLL) supports
    intersection/difference, i.e. the 100 TB answer to "how much does
    crawl A overlap crawl B" without ever co-shuffling the corpora.

    Rows-only by design (estimates); the exact twin is
    ``source_shingle_overlap`` and tests/test_operators.py pins the
    estimate within a tolerance band of the exact overlap.

    Scale shape: one (source, token)-collapsing agg builds constant-size
    sketches map-side; all set algebra runs on |sources|² sketch pairs,
    corpus never rescanned.
    """
    docs = load_table(spark, sf_dir, "documents")
    # distinct word BIGRAMS per source (the unigram vocab is tiny and
    # fully shared; bigrams give a real partial-overlap signal) — built
    # in-row, exploded once
    toks = docs.filter(F.col("source").isin("src0", "src1", "src2")).select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 1),"
                " i -> concat(split(text, ' ')[i - 1], ' ',"
                "             split(text, ' ')[i]))"
            )
        ).alias("token"),
    )
    sk = toks.groupBy("source").agg(
        F.theta_sketch_agg("token").alias("sk"),
        F.count_distinct("token").cast("long").alias("exact_distinct"),
    )
    a = sk.alias("a")
    b = sk.alias("b")
    pairs = a.join(b, F.col("a.source") < F.col("b.source"))
    return pairs.select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.col("a.exact_distinct").alias("distinct_a"),
        F.col("b.exact_distinct").alias("distinct_b"),
        F.theta_sketch_estimate(
            F.theta_union(F.col("a.sk"), F.col("b.sk"))
        )
        .cast("long")
        .alias("union_est"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("a.sk"), F.col("b.sk"))
        )
        .cast("long")
        .alias("intersect_est"),
    )


@query("kll_quantile_rollup")
def kll_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile-sketch rollup: per-priority sketches of order value,
    MERGED to a global sketch — store-and-merge quantiles at any grain
    (the sketch twin of exact_percentiles_by_flag, which is the gate's
    exact check; tests pin the estimates inside a rank-error band).

    Scale shape: constant-size sketches built with map-side partials;
    the global quantile comes from merging |grps| sketches, not from a
    second fact scan — at 100 TB that's the difference between a
    metadata operation and a petabyte reshuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_grp = orders.groupBy(
        F.col("o_orderpriority").alias("grp")
    ).agg(F.kll_sketch_agg_double("o_totalprice", F.lit(200)).alias("sk"))
    grp_rows = per_grp.select(
        "grp",
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50_est"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.95)).alias("p95_est"),
    )
    # no agg-form KLL merge in 4.1 — fold the |grps| sketches with the
    # scalar pairwise merge (HOF over a collected array of 5 sketches)
    merged = per_grp.agg(F.collect_list("sk").alias("sks")).select(
        F.expr(
            "aggregate(slice(sks, 2, size(sks) - 1), sks[0],"
            " (acc, x) -> kll_sketch_merge_double(acc, x))"
        ).alias("sk")
    ).select(
        F.lit("ALL").alias("grp"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50_est"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.95)).alias("p95_est"),
    )
    return grp_rows.unionByName(merged)


@query(
    "phrase_search_positional",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), postings AS (
        SELECT doc_id, unnest(t) AS token,
               CAST(generate_subscripts(t, 1) AS BIGINT) AS pos
        FROM toks
    )
    SELECT a.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(MIN(a.pos) AS BIGINT) AS first_pos
    FROM postings a
    JOIN postings b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    WHERE a.token = 'table' AND b.token = 'scan'
    GROUP BY a.doc_id
    """,
)
def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search through a POSITIONAL inverted index: postings
    are (token, doc_id, pos); a phrase match is an equi-join of the two
    term posting lists on (doc_id, adjacent position). This is the IR
    operator the tf-only inverted index cannot answer.

    Scale shape: the postings relation is filtered to the QUERY TERMS
    before any join — the join input is two posting lists, not the
    corpus; the adjacency is an equi-join on (doc_id, pos+1), so no
    range explosion. At 100 TB the index is built once, partitioned by
    token, and each phrase query touches only its terms' partitions
    (partition pruning on the token column).
    """
    docs = load_table(spark, sf_dir, "documents")
    postings = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "token"),
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "token")
    a = postings.filter(F.col("token") == "table").alias("a")
    b = postings.filter(F.col("token") == "scan").alias("b")
    hits = a.join(
        b,
        (F.col("b.doc_id") == F.col("a.doc_id"))
        & (F.col("b.pos") == F.col("a.pos") + 1),
    )
    return hits.groupBy(F.col("a.doc_id").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.min(F.col("a.pos")).cast("long").alias("first_pos"),
    )


# ---------------------------------------------------------------------------
# wave 24: grid-blocked spatial proximity join + event-sequence pattern match
# ---------------------------------------------------------------------------


@query(
    "spatial_proximity_pairs",
    oracle="""
    -- oracle is the NAIVE all-pairs join: hash equality proves the
    -- engine's grid blocking LOSSLESS (same trick as the prefix-filter
    -- Jaccard join)
    WITH cust AS (
        SELECT c_custkey,
               (c_custkey * 7919)   % 100000 AS x,
               (c_custkey * 104729) % 100000 AS y
        FROM customer
    ), supp AS (
        SELECT s_suppkey,
               (s_suppkey * 6271)  % 100000 AS x,
               (s_suppkey * 31337) % 100000 AS y
        FROM supplier
    )
    SELECT c.c_custkey, s.s_suppkey,
           CAST((c.x - s.x) * (c.x - s.x)
              + (c.y - s.y) * (c.y - s.y) AS BIGINT) AS dist2_m2
    FROM cust c, supp s
    WHERE (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)
          <= 2000 * 2000
    """,
)
def spatial_proximity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join with GRID BLOCKING: every customer paired
    with every supplier within 2 km, on a synthetic 100x100 km plane
    with deterministic integer-meter coordinates derived from the keys
    (BIGINT throughout — squared distances compare exactly).

    Engine shape: bucket both sides into r-sized grid cells; the
    smaller side (suppliers) replicates into its 3x3 cell neighborhood
    (in-row sequence explode, 9x a TINY relation); candidates come from
    a cell equi-join; the exact squared-distance predicate verifies.
    Any point within r of another must lie in one of its 9 cells, so
    blocking is lossless — and the oracle PROVES it: the DuckDB side is
    the naive all-pairs join.

    Scale shape: never a cross join — the fact side is hashed on its
    one cell, candidates are bounded by local density x 9, and the
    verify is map-side integer arithmetic. At 100 TB the same plan
    holds with cells sized to the radius and AQE handling dense-cell
    skew.
    """
    r = 2000
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7919) % 100000).alias("x"),
        ((F.col("c_custkey") * 104729) % 100000).alias("y"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 6271) % 100000).alias("x"),
        ((F.col("s_suppkey") * 31337) % 100000).alias("y"),
    )
    cust_cell = cust.withColumn(
        "cell",
        F.expr(f"(x div {r}) * 1000 + (y div {r})"),
    )
    # replicate the SMALL side into its 3x3 neighborhood; the big side
    # keeps exactly one cell per row
    supp_cells = supp.select(
        "s_suppkey", F.col("x").alias("sx"), F.col("y").alias("sy")
    ).select(
        "s_suppkey",
        "sx",
        "sy",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(-1, 1), dx ->"
                f" transform(sequence(-1, 1), dy ->"
                f" ((sx div {r}) + dx) * 1000 + ((sy div {r}) + dy))))"
            )
        ).alias("cell"),
    )
    cand = cust_cell.join(F.broadcast(supp_cells), "cell")
    d2 = (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx")) + (
        F.col("y") - F.col("sy")
    ) * (F.col("y") - F.col("sy"))
    return (
        cand.filter(d2 <= r * r)
        .select(
            "c_custkey",
            "s_suppkey",
            d2.cast("long").alias("dist2_m2"),
        )
    )


@query(
    "event_pattern_funnels",
    oracle="""
    WITH journeys AS (
        SELECT user_id,
               string_agg(left(event_type, 1), '' ORDER BY ts, event_id)
                   AS journey
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(strlen(journey) AS BIGINT)  AS journey_len,
           CAST(len(regexp_extract_all(journey, 'v[ce]*p')) AS BIGINT)
               AS n_funnels
    FROM journeys
    """,
)
def event_pattern_funnels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching over event streams (MATCH_RECOGNIZE
    lite): encode each user's journey as an ordered string of event
    initials, then count non-overlapping matches of the funnel regex
    ``v[ce]*p`` (a view, any clicks/errors, then a purchase). Regex
    over an encoded sequence turns order-sensitive funnel mining into
    one scalar expression — no self-joins per step.

    The conditional-MIN funnel (``event_funnel_ordered``) answers "did
    the user EVER convert"; this answers "how MANY times", with
    arbitrary-pattern expressiveness.

    Scale shape: one user_id exchange for the ordered concat (order
    restored in-row by array_sort — no window sort); the regex is
    map-side on |users| short strings. Journey strings are bounded by
    per-user activity — the same per-key-fits-in-memory contract as
    every grouped aggregate here.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.substring("event_type", 1, 1).alias("c")
    )
    journeys = ev.groupBy("user_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(ts, event_id, c))),"
            " s -> s.c), '')"
        ).alias("journey")
    )
    return journeys.select(
        "user_id",
        F.length("journey").cast("long").alias("journey_len"),
        F.size(F.regexp_extract_all("journey", F.lit("v[ce]*p"), F.lit(0)))
        .cast("long")
        .alias("n_funnels"),
    )


# ---------------------------------------------------------------------------
# wave 25: corrupt-tolerant ingestion audit + BPE-ish regex tokenizer
# ---------------------------------------------------------------------------


@query(
    "robust_json_ingest",
    oracle="""
    WITH feed AS (
        SELECT event_type,
               CASE WHEN event_id % 7 = 0 THEN substr(props, 2)
                    ELSE props END AS raw
        FROM events
    ), parsed AS (
        SELECT event_type, raw,
               CASE WHEN json_valid(raw)
                    THEN json_extract_string(raw, '$.k') IS NOT NULL
                    ELSE FALSE END AS ok
        FROM feed
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)                          AS n_rows,
           CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT)
               AS n_valid,
           CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)
               AS n_corrupt,
           CAST(SUM(CASE WHEN ok
                    THEN CAST(json_extract_string(raw, '$.k') AS BIGINT)
                    ELSE 0 END) AS BIGINT)                   AS k_sum
    FROM parsed GROUP BY event_type
    """,
)
def robust_json_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-tolerant ingestion: a feed where every 7th record's JSON
    payload is truncated (deterministically, so the oracle sees the
    same corruption). The engine classifies each record as
    valid/corrupt WITHOUT failing the job — the dead-letter audit every
    production ingest needs: per-type row counts, corruption counts,
    and the typed sum over only the valid records.

    This is the error-handling contract at 100 TB: one malformed
    record must cost one null, not a task retry storm; the corrupt
    count IS the dead-letter queue's size, computed in the same pass.

    Scale shape: pure map-side parse + one small hash agg; no Python,
    no second scan for the audit.
    """
    ev = load_table(spark, sf_dir, "events")
    feed = ev.select(
        "event_type",
        F.when(
            F.col("event_id") % 7 == 0, F.expr("substr(props, 2)")
        )
        .otherwise(F.col("props"))
        .alias("raw"),
    )
    # NOTE: Spark's try_parse_json is lenient about trailing content (a
    # scalar prefix parses), so the dead-letter criterion is "the record
    # yields the required typed field" -- the contract a downstream
    # consumer actually needs -- not mere parseability.
    parsed = feed.withColumn(
        "ok", F.get_json_object("raw", "$.k").isNotNull()
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("long").alias("n_valid"),
        F.sum(F.when(F.col("ok"), 0).otherwise(1)).cast("long").alias("n_corrupt"),
        F.sum(
            F.when(
                F.col("ok"), F.get_json_object("raw", "$.k").cast("long")
            ).otherwise(0)
        )
        .cast("long")
        .alias("k_sum"),
    )


@query(
    "bpe_regex_token_counts",
    oracle="""
    SELECT lang,
           CAST(SUM(len(string_split(text || ' v2.0-rc!', ' '))) AS BIGINT)
               AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text || ' v2.0-rc!',
                ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +'))) AS BIGINT)
               AS bpe_tokens,
           CAST(SUM(strlen(text || ' v2.0-rc!')) AS BIGINT) AS n_bytes
    FROM documents GROUP BY lang
    """,
)
def bpe_regex_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (SURVEY text-analysis): whitespace split
    vs a BPE-ish pretokenizer regex (GPT-2-style letter/digit/symbol
    runs with attached leading space, restricted to the RE2 ∩ Java
    common dialect — no lookahead). A deterministic ``' v2.0-rc!'``
    suffix exercises the digit/symbol branches the plain-word corpus
    lacks: the regex yields 7 subword-ish tokens where whitespace sees
    1 — the divergence that makes pretokenizer choice a real budget
    decision when pricing a corpus in tokens.

    Scale shape: both counts are map-side scalar expressions fused into
    one scan; the agg is |langs| rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.concat(F.col("text"), F.lit(" v2.0-rc!"))
    return docs.groupBy("lang").agg(
        F.sum(F.size(F.split(t, " "))).cast("long").alias("ws_tokens"),
        F.sum(
            F.size(
                F.regexp_extract_all(
                    t, F.lit(" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"), F.lit(0)
                )
            )
        )
        .cast("long")
        .alias("bpe_tokens"),
        F.sum(F.octet_length(t)).cast("long").alias("n_bytes"),
    )


@query(
    "negative_sampling_pairs",
    oracle="""
    WITH pos AS (
        SELECT DISTINCT o.o_custkey AS user_id, l.l_partkey AS item_id
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), nparts AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part
    ), cand AS (
        SELECT c.c_custkey AS user_id,
               CAST(j AS BIGINT) AS j,
               (c.c_custkey * 2654435761 + j * 40503) % np.n AS item_id
        FROM customer c
        CROSS JOIN nparts np
        CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j)
    ), negs AS (
        SELECT cd.user_id, cd.j, cd.item_id,
               ROW_NUMBER() OVER (PARTITION BY cd.user_id ORDER BY cd.j)
                   AS rnk
        FROM cand cd
        WHERE NOT EXISTS (
            SELECT 1 FROM pos p
            WHERE p.user_id = cd.user_id AND p.item_id = cd.item_id)
    )
    SELECT user_id, j, CAST(item_id AS BIGINT) AS neg_item
    FROM negs WHERE rnk <= 4
    """,
)
def negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    every user, 8 multiplicative-hash candidate items, anti-joined
    against the user's TRUE positives (parts they actually ordered),
    first 4 survivors kept by candidate index. No rand() — the sample
    is reproducible, growth-stable, and recomputable on any engine,
    which is what lets the gate hash-check a SAMPLER.

    This is the (user, pos, neg) triple factory of every two-tower /
    contrastive recsys and embedding pipeline; the reference's ALS
    implicitly samples negatives inside MLlib, here the engine owns it.

    Scale shape: candidates are a map-side explode (|users| x 8 narrow
    rows); the anti-join shuffles on (user_id, item_id) against the
    distinct positives; the per-user top-4 window rides the same user
    partitioning — WindowGroupLimit prunes to 4 per task. Positives
    are pre-collapsed by DISTINCT before the join, so the anti-join
    probe side is bounded by the user-item graph, not raw order lines.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")

    pos = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item_id"),
        )
        .distinct()
    )
    nparts = part.agg(F.count(F.lit(1)).cast("long").alias("n"))
    cand = (
        customer.select(F.col("c_custkey").alias("user_id"))
        .crossJoin(F.broadcast(nparts))
        .select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(7))).alias("j"),
            F.col("n"),
        )
        .select(
            "user_id",
            F.col("j").cast("long").alias("j"),
            (
                (F.col("user_id") * F.lit(2654435761) + F.col("j") * 40503)
                % F.col("n")
            ).alias("item_id"),
        )
    )
    negs = cand.join(pos, ["user_id", "item_id"], "left_anti")
    w = Window.partitionBy("user_id").orderBy("j")
    return (
        negs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 4)
        .select("user_id", "j", F.col("item_id").cast("long").alias("neg_item"))
    )


def _kcore_oracle(k: int = 3, rounds: int = 13) -> str:
    """Unrolled peeling oracle for the k-core query: DuckDB's recursive
    CTEs disallow the per-round aggregate, so the bounded peel is
    unrolled (same device as the PageRank oracle). ``rounds`` exceeds
    the observed sf0.01 convergence depth (11); once the node set is
    stable, extra rounds are no-ops, and the ENGINE raises if its own
    loop ever needs more than its cap — the gate would surface any
    divergence as a hash mismatch."""
    parts = [
        """
    WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS MATERIALIZED (
        SELECT a.l_partkey AS u, b2.l_partkey AS v
        FROM b a JOIN b b2
          ON a.l_orderkey = b2.l_orderkey AND a.l_partkey < b2.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    n0 AS MATERIALIZED (SELECT u AS n FROM edges UNION SELECT v FROM edges)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
    deg{i} AS MATERIALIZED (
        SELECT nn, COUNT(*) AS d FROM (
            SELECT e.u AS nn FROM edges e
            JOIN n{i - 1} x ON e.u = x.n JOIN n{i - 1} y ON e.v = y.n
            UNION ALL
            SELECT e.v AS nn FROM edges e
            JOIN n{i - 1} x ON e.u = x.n JOIN n{i - 1} y ON e.v = y.n
        ) GROUP BY nn),
    n{i} AS MATERIALIZED (SELECT nn AS n FROM deg{i} WHERE d >= {k})"""
        )
    parts.append(
        f"""
    SELECT nn AS part_id, CAST(d AS BIGINT) AS core_degree
    FROM deg{rounds} WHERE d >= {k}"""
    )
    return "".join(parts)


@query("kcore_copurchase", oracle=_kcore_oracle())
def kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the part co-purchase graph (edges = part pairs bought
    together in >= 2 orders): the maximal subgraph where every part has
    >= 3 co-purchase partners — the dense-community primitive beside
    PageRank (importance), connected components (reachability), and
    triangle counting (local density). Peeling has a genuinely
    different iteration structure: vertices DELETED per round, not
    labels propagated, with a unique engine-independent fixpoint the
    unrolled-SQL oracle replays exactly.

    Scale shape: see operators/graph.py kcore_nodes — per round one
    degree agg + two semi-joins on the live-node relation; edges are
    filtered, never rewritten; per-round checkpoint truncation.
    """
    from pyspark_movie_recommender_spark.operators.graph import kcore_nodes

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("u", "v")
    )
    core = kcore_nodes(edges, k=3)
    return core.select(
        F.col("n").alias("part_id"), F.col("degree").alias("core_degree")
    )


@query(
    "auc_order_status_price",
    oracle="""
    WITH scored AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label,
               ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey)
                   AS rnk
        FROM orders
    ), agg AS (
        SELECT CAST(SUM(label) AS BIGINT)                       AS n_pos,
               CAST(COUNT(*) - SUM(label) AS BIGINT)            AS n_neg,
               CAST(SUM(CASE WHEN label = 1 THEN rnk END) AS BIGINT)
                   AS pos_rank_sum
        FROM scored
    )
    SELECT n_pos, n_neg,
           CAST((pos_rank_sum - n_pos * (n_pos + 1) // 2) * 1000000
                // (n_pos * n_neg) AS BIGINT) AS auc_ppm
    FROM agg
    """,
)
def auc_order_status_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC-ROC as a query: does order value rank 'F' (fulfilled)
    orders above the rest? AUC via the Mann-Whitney rank-sum identity
    — rank every row once by (score, key), sum positive ranks, and
    AUC = (S - n_pos(n_pos+1)/2) / (n_pos * n_neg), reported in exact
    ppm BIGINT arithmetic. The model-evaluation metric (ranking
    quality of a scorer) computed engine-side with zero floats — the
    eval loop of the quality-classifier components made gate-checkable.

    Scale shape: one global row_number — Spark's range-partitioned
    sort (sampled boundaries, no single-reducer bottleneck) — then a
    scalar agg. Ties broken deterministically by (score, o_orderkey)
    so the rank sum is engine-exact; for approximate AUC at extreme
    scale, bucket scores and interpolate — kept exact here because the
    gate hashes values.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    scored = orders.select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
        F.row_number().over(w).alias("rnk"),
    )
    agg = scored.agg(
        F.sum("label").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("label")).cast("long").alias("n_neg"),
        F.sum(F.when(F.col("label") == 1, F.col("rnk"))).cast("long").alias(
            "pos_rank_sum"
        ),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.expr(
            "(pos_rank_sum - n_pos * (n_pos + 1) div 2) * 1000000"
            " div (n_pos * n_neg)"
        )
        .cast("long")
        .alias("auc_ppm"),
    )


# ---------------------------------------------------------------------------
# wave 28: embedding-truncation retrieval eval, drift audit, k-anonymity
# ---------------------------------------------------------------------------


@query(
    "matryoshka_overlap_at_k",
    oracle="""
    WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    probes AS (SELECT * FROM s WHERE vec_id < 10),
    full_rank AS (
        SELECT probe_id, neighbor_id FROM (
            SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.vec_id
                       ORDER BY ROUND(list_cosine_similarity(p.e, c.e), 6)
                                DESC, c.vec_id) AS rnk
            FROM probes p JOIN s c ON c.vec_id <> p.vec_id)
        WHERE rnk <= 10
    ), trunc_rank AS (
        SELECT probe_id, neighbor_id FROM (
            SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.vec_id
                       ORDER BY ROUND(list_cosine_similarity(
                                    p.e[1:16], c.e[1:16]), 6)
                                DESC, c.vec_id) AS rnk
            FROM probes p JOIN s c ON c.vec_id <> p.vec_id)
        WHERE rnk <= 10
    )
    SELECT f.probe_id,
           CAST(COUNT(t.neighbor_id) AS BIGINT) AS overlap_at_10
    FROM full_rank f
    LEFT JOIN trunc_rank t
      ON t.probe_id = f.probe_id AND t.neighbor_id = f.neighbor_id
    GROUP BY f.probe_id
    """,
)
def matryoshka_overlap_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-truncation retrieval eval (matryoshka embeddings): how
    many of each probe's exact top-10 neighbours survive when cosine
    runs on only the FIRST 16 of 64 dimensions? The overlap@k number
    that decides whether truncated vectors (4x cheaper to store, scan,
    and shuffle) are good enough for first-stage retrieval — the
    quantization question asked about width instead of precision
    (see embedding_int8_quantize for the depth version).

    Scale shape: two broadcast-probe rank-limited scans (same plan as
    cosine_topk — corpus never shuffled), joined on (probe, neighbor)
    top-k rows only: |probes| x k rows into the final join, corpus
    touched exactly twice.
    """
    from pyspark_movie_recommender_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    full = cosine_topk_bruteforce(emb, probes, "embedding", "vec_id", k=10)
    emb16 = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    probes16 = emb16.filter(F.col("vec_id") < 10)
    trunc = cosine_topk_bruteforce(emb16, probes16, "embedding", "vec_id", k=10)
    f = full.select("probe_id", "neighbor_id")
    t = trunc.select(
        F.col("probe_id").alias("tp"), F.col("neighbor_id").alias("tn")
    )
    return (
        f.join(
            t,
            (F.col("tp") == F.col("probe_id")) & (F.col("tn") == F.col("neighbor_id")),
            "left",
        )
        .groupBy("probe_id")
        .agg(F.count("tn").cast("long").alias("overlap_at_10"))
    )


@query(
    "chi2_drift_events",
    oracle="""
    WITH slices AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS o_a,
               CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS o_b
        FROM events GROUP BY event_type
    ), tot AS (
        SELECT SUM(o_a) AS n_a, SUM(o_b) AS n_b FROM slices
    )
    SELECT s.event_type, s.o_a, s.o_b,
           CAST(ROUND(
               (s.o_a - (s.o_a + s.o_b) * t.n_a / (t.n_a + t.n_b))
             * (s.o_a - (s.o_a + s.o_b) * t.n_a / (t.n_a + t.n_b))
             / ((s.o_a + s.o_b) * t.n_a / (t.n_a + t.n_b))
             + (s.o_b - (s.o_a + s.o_b) * t.n_b / (t.n_a + t.n_b))
             * (s.o_b - (s.o_a + s.o_b) * t.n_b / (t.n_a + t.n_b))
             / ((s.o_a + s.o_b) * t.n_b / (t.n_a + t.n_b)),
             6) * 1000000 AS BIGINT) AS chi2_contrib_ppm
    FROM slices s CROSS JOIN tot t
    """,
)
def chi2_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit: chi-square contributions of each event
    type between two population slices (homogeneity test) — the
    monitoring primitive behind train/serve skew alarms and canary
    analyses. Contributions are reported in exact-integer ppm (the
    double arithmetic is written identically on both engines, each
    op correctly rounded, then scaled and truncated to BIGINT), so
    drift magnitude is hash-checkable per category; the alert sums
    the contributions.

    Scale shape: the fact collapses to |event_types| rows in one
    map-side-partial agg; everything downstream is arithmetic on that
    tiny relation with the totals broadcast.
    """
    ev = load_table(spark, sf_dir, "events")
    slices = ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("o_a"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("o_b"),
    )
    tot = slices.agg(
        F.sum("o_a").alias("n_a"), F.sum("o_b").alias("n_b")
    )
    joined = slices.crossJoin(F.broadcast(tot))
    contrib = F.expr(
        "CAST(ROUND("
        "  (o_a - (o_a + o_b) * n_a / (n_a + n_b))"
        "* (o_a - (o_a + o_b) * n_a / (n_a + n_b))"
        "/ ((o_a + o_b) * n_a / (n_a + n_b))"
        "+ (o_b - (o_a + o_b) * n_b / (n_a + n_b))"
        "* (o_b - (o_a + o_b) * n_b / (n_a + n_b))"
        "/ ((o_a + o_b) * n_b / (n_a + n_b)),"
        "  6) * 1000000 AS BIGINT)"
    )
    return joined.select(
        "event_type", "o_a", "o_b", contrib.alias("chi2_contrib_ppm")
    )


@query(
    "k_anonymity_audit",
    oracle="""
    WITH qi AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
               COUNT(*) AS grp_n
        FROM customer GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT)                                  AS n_groups,
           CAST(SUM(CASE WHEN grp_n < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_risky_groups,
           CAST(SUM(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS BIGINT)
               AS n_risky_rows,
           CAST(SUM(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) * 1000000
                // SUM(grp_n) AS BIGINT)                             AS risky_ppm
    FROM qi
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers (nation, market
    segment, $1000 balance band): how many QI groups have fewer than
    k=5 members — the rows a release would have to suppress or
    generalize because their QI combination re-identifies them. The
    measurement half of the privacy surface, beside the GDPR erasure
    audit's enforcement half.

    Scale shape: one hash agg on the QI key (map-side partials), then
    a scalar agg over group counts — the fact is scanned once and
    never leaves the executors.
    """
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("grp_n"))
    risky = F.when(F.col("grp_n") < 5, F.col("grp_n")).otherwise(0)
    return qi.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("grp_n") < 5, 1).otherwise(0))
        .cast("long")
        .alias("n_risky_groups"),
        F.sum(risky).cast("long").alias("n_risky_rows"),
        F.expr(
            "SUM(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) * 1000000"
            " div SUM(grp_n)"
        )
        .cast("long")
        .alias("risky_ppm"),
    )


# ---------------------------------------------------------------------------
# wave 30: nested scaling samples, length-bucketed batching, incremental
# view maintenance
# ---------------------------------------------------------------------------


@query(
    "nested_scaling_samples",
    oracle="""
    WITH h AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_tokens,
               (doc_id * 2654435761) % 4294967296 AS hv
        FROM documents
    ), tagged AS (
        SELECT lang, n_tokens,
               CASE WHEN hv * 100 < 4294967296 * 1  THEN 'p01'
                    WHEN hv * 100 < 4294967296 * 10 THEN 'p10'
                    ELSE 'rest' END AS tier
        FROM h
    )
    SELECT lang, tier,
           CAST(COUNT(*) AS BIGINT)      AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM tagged GROUP BY lang, tier
    """,
)
def nested_scaling_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested subsampling for scaling-law runs: 1% / 10% / 100% corpus
    subsets that are NESTED BY CONSTRUCTION — one multiplicative hash,
    two thresholds on the same value, so every doc in the 1% tier is in
    the 10% tier is in the full set. Train the small runs on strict
    subsets of the big run's data (the scaling-law protocol) without a
    sample table or rand(); membership is recomputable map-side on any
    engine, which is also what the gate hash-checks.

    Scale shape: pure projection + one (lang, tier) hash agg; no
    shuffle before the agg, no sample materialization ever.
    """
    docs = load_table(spark, sf_dir, "documents")
    hv = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    tier = (
        F.when(hv * 100 < F.lit(4294967296) * 1, "p01")
        .when(hv * 100 < F.lit(4294967296) * 10, "p10")
        .otherwise("rest")
    )
    return (
        docs.select(
            "lang",
            F.size(F.split("text", " ")).alias("n_tokens"),
            tier.alias("tier"),
        )
        .groupBy("lang", "tier")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )


@query(
    "length_bucketed_batches",
    oracle="""
    WITH d AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ), bucketed AS (
        SELECT doc_id, n_tokens,
               CAST(n_tokens // 16 AS BIGINT) AS bucket,
               CAST((ROW_NUMBER() OVER (PARTITION BY n_tokens // 16
                                        ORDER BY doc_id) - 1) // 8 AS BIGINT)
                   AS batch_id
        FROM d
    )
    SELECT bucket, batch_id,
           CAST(COUNT(*) AS BIGINT)       AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT)  AS token_sum,
           CAST(MAX(n_tokens) AS BIGINT)  AS max_len,
           CAST((MAX(n_tokens) * COUNT(*) - SUM(n_tokens)) * 1000000
                // (MAX(n_tokens) * COUNT(*)) AS BIGINT) AS pad_waste_ppm
    FROM bucketed GROUP BY bucket, batch_id
    """,
)
def length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed inference batching: docs grouped into 16-token
    length buckets, then numbered into batches of 8 inside each bucket;
    per batch, the padding-waste ppm — the fraction of a padded
    (max_len x batch) tensor that is padding. THE serving-cost metric
    that bucketed batching exists to minimize: random batching pads
    every sequence to the global max, bucketing pads only to the
    bucket-local max.

    Scale shape: one shuffle on the length bucket; the row_number
    window and the (bucket, batch) agg share that partitioning. Bucket
    population is corpus/|buckets| — no per-key blowup.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    ).withColumn("bucket", F.expr("n_tokens div 16").cast("long"))
    w = Window.partitionBy("bucket").orderBy("doc_id")
    b = d.withColumn(
        "batch_id", F.expr(f"(row_number() OVER (PARTITION BY bucket ORDER BY doc_id) - 1) div 8").cast("long")
    )
    return b.groupBy("bucket", "batch_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("token_sum"),
        F.max("n_tokens").cast("long").alias("max_len"),
        F.expr(
            "(MAX(n_tokens) * COUNT(*) - SUM(n_tokens)) * 1000000"
            " div (MAX(n_tokens) * COUNT(*))"
        )
        .cast("long")
        .alias("pad_waste_ppm"),
    )


@query(
    "incremental_view_maintenance",
    oracle="""
    -- the oracle recomputes the view FROM SCRATCH over all rows;
    -- the engine merges a base aggregate with a CDC delta — hash
    -- equality proves merge == rescan
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS revenue_cents
    FROM orders GROUP BY o_custkey
    """,
)
def incremental_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a per-customer revenue view is
    maintained by MERGING yesterday's materialized aggregate with
    today's delta batch — never rescanning the base. Here the fact is
    deterministically split into base (o_orderkey % 97 != 0) and a
    late-arriving delta (% 97 == 0); the engine aggregates each side
    and full-outer merges with coalesced partial sums. The oracle
    recomputes the view from scratch over everything — hash equality
    IS the IVM correctness proof (aggregate merge == rescan), the
    property that lets a 100 TB nightly view absorb a 10 GB delta in
    delta-sized time.

    Scale shape: both partial aggs are map-side-combined hash aggs on
    the view key; the merge join shares the same key partitioning, so
    the whole maintenance step is one delta-scan + one co-partitioned
    join against the stored view.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")

    def agg_view(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(cents).cast("long").alias("revenue_cents"),
        )

    base_view = agg_view(orders.filter(F.col("o_orderkey") % 97 != 0))
    delta_view = agg_view(orders.filter(F.col("o_orderkey") % 97 == 0)).select(
        F.col("o_custkey").alias("d_custkey"),
        F.col("n_orders").alias("d_n"),
        F.col("revenue_cents").alias("d_cents"),
    )
    merged = base_view.join(
        delta_view, base_view.o_custkey == delta_view.d_custkey, "full_outer"
    )
    return merged.select(
        F.coalesce("o_custkey", "d_custkey").alias("o_custkey"),
        (F.coalesce("n_orders", F.lit(0)) + F.coalesce("d_n", F.lit(0)))
        .cast("long")
        .alias("n_orders"),
        (
            F.coalesce("revenue_cents", F.lit(0))
            + F.coalesce("d_cents", F.lit(0))
        )
        .cast("long")
        .alias("revenue_cents"),
    )


@query(
    "entity_resolution_pipeline",
    oracle="""
    WITH RECURSIVE pairs AS (
        SELECT a.p_partkey AS key_a, b.p_partkey AS key_b
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand
         AND split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
         AND a.p_partkey < b.p_partkey
        WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.84
    ), bi AS (
        SELECT key_a AS u, key_b AS v FROM pairs
        UNION SELECT key_b, key_a FROM pairs
    ), reach(id, label) AS (
        SELECT DISTINCT u AS id, u AS label FROM bi
        UNION
        SELECT bi.u, r.label FROM reach r JOIN bi ON bi.v = r.id
    ), comp AS (
        SELECT id, MIN(label) AS entity_id FROM reach GROUP BY id
    )
    SELECT c.entity_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MIN(CASE WHEN c.id = c.entity_id THEN p.p_name END)
               AS canonical_name
    FROM comp c JOIN part p ON p.p_partkey = c.id
    GROUP BY c.entity_id
    """,
)
def entity_resolution_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution as ONE composed plan: blocked
    Jaro-Winkler candidate scoring (the cross-engine value-checked
    UDF) → connected components over the >= 0.84 match graph →
    per-entity rollup with the canonical record (min-key member's
    name). The match/cluster/survivorship pipeline every MDM system
    runs, built from this engine's own verified operators — like
    curation_end_to_end, the composition is the check that the pieces
    pipeline without materialization barriers.

    Covers multi-member entities (singletons never enter the pair
    graph — the identity entity is a left-anti complement if needed).

    Scale shape: blocking equi-join bounds the UDF shortlist; CC runs
    O(diameter) rounds on the match edges only (name-match graphs are
    unions of small cliques); the rollup joins part on the component
    members, nation-sized, broadcast-eligible.
    """
    from pyspark_movie_recommender_spark.operators.graph import connected_components

    pairs = QUERIES["jaro_winkler_name_pairs"](spark, sf_dir).select(
        "key_a", "key_b"
    )
    comp = connected_components(pairs, src="key_a", dst="key_b")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"), "p_name"
    )
    members = comp.join(part, "id")
    return members.groupBy(F.col("component").alias("entity_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min(
            F.when(F.col("id") == F.col("component"), F.col("p_name"))
        ).alias("canonical_name"),
    )


@query(
    "blocking_quality_report",
    oracle="""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM part),
    cand AS (
        SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
               jaro_winkler_similarity(a.p_name, b.p_name) AS jw
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand
         AND split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
         AND a.p_partkey < b.p_partkey
    ), agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
               CAST(SUM(CASE WHEN jw >= 0.84 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_matches
        FROM cand
    )
    SELECT n.n_rows,
           CAST(n.n_rows * (n.n_rows - 1) // 2 AS BIGINT)
               AS n_possible_pairs,
           a.n_candidates,
           a.n_matches,
           CAST(1000000
                - a.n_candidates * 1000000
                  // (n.n_rows * (n.n_rows - 1) // 2)
                AS BIGINT)                         AS reduction_ppm,
           CAST(a.n_matches * 1000000 // a.n_candidates AS BIGINT)
               AS precision_ppm
    FROM n CROSS JOIN agg a
    """,
)
def blocking_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality metrics for the entity-resolution pipeline:
    reduction ratio (how much of the quadratic pair space the blocking
    key eliminates) and candidate precision (what fraction of
    surviving candidates actually match at >= 0.84) — the two numbers
    that justify a blocking scheme before anyone pays for the scorer.
    Exact ppm integers, single scan for the corpus count, blocking
    join reused from the ER pipeline.

    Scale shape: the report runs the same bounded blocking join as the
    pipeline plus one count — no new quadratic anything; the naive
    pair count is arithmetic on a scalar.
    """
    from pyspark_movie_recommender_spark.operators.udf_surface import jaro_winkler

    part = load_table(spark, sf_dir, "part")
    n = part.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    a = part.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.col("p_brand").alias("brand"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("noun"),
    )
    b = part.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_brand").alias("brand"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("noun"),
    )
    cand = (
        a.join(b, ["brand", "noun"])
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("jw", jaro_winkler(F.col("name_a"), F.col("name_b")))
    )
    agg = cand.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum(F.when(F.col("jw") >= 0.84, 1).otherwise(0))
        .cast("long")
        .alias("n_matches"),
    )
    return n.crossJoin(F.broadcast(agg)).select(
        "n_rows",
        F.expr("n_rows * (n_rows - 1) div 2")
        .cast("long")
        .alias("n_possible_pairs"),
        "n_candidates",
        "n_matches",
        F.expr(
            "CAST(1000000 - n_candidates * 1000000"
            " div (n_rows * (n_rows - 1) div 2) AS BIGINT)"
        ).alias("reduction_ppm"),
        F.expr("n_matches * 1000000 div n_candidates")
        .cast("long")
        .alias("precision_ppm"),
    )


_MODERN_SQL = """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
               AS n_fulfilled,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
               AS fulfilled_cents
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    """


@query("sql_modern_syntax", oracle=_MODERN_SQL)
def sql_modern_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern ANSI surface through the shared-dialect entry point: one
    string using GROUP BY ALL, aggregate FILTER clauses, and ORDER BY
    ALL runs verbatim on both Catalyst and DuckDB — the
    convenience syntax an analyst actually writes, pinned compatible.
    FILTER is the pre-aggregate predicate form (cleaner than
    CASE-in-SUM and planner-visible); GROUP BY ALL derives the keys
    from the non-aggregate select list.

    Scale shape: identical to the CASE-in-SUM forms — one map-side
    partial hash agg; exact cents BIGINT.
    """
    from pyspark_movie_recommender_spark.sources import register_views

    register_views(spark, sf_dir, "orders")
    return spark.sql(_MODERN_SQL)


@query(
    "null_safe_join_events",
    oracle="""
    WITH a AS (
        SELECT event_id, NULLIF(event_type, 'error') AS k
        FROM events WHERE event_id % 2 = 0
    ), b AS (
        SELECT event_id, NULLIF(event_type, 'error') AS k
        FROM events WHERE event_id % 2 = 1
    )
    SELECT COALESCE(a.k, '<null>') AS join_key,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY 1
    """,
)
def null_safe_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join: ``<=>`` join keys treat NULL as a VALUE
    (NULL matches NULL), unlike plain ``=`` which drops every
    null-keyed row from an inner join — the semantics CDC merge keys
    and nullable dimension keys actually need. Spark plans
    ``eqNullSafe`` as a hashable join key (no fallback to nested-loop),
    which is the part worth pinning at scale.

    The fixture NULLIFs one event type so both sides carry real null
    keys; output counts pairs per (coalesced) key.

    Scale shape: standard hash equi-join on the null-safe key — same
    single shuffle as ``=``; the null bucket is one more key.
    """
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0).select(
        F.nullif(F.col("event_type"), F.lit("error")).alias("ka")
    )
    b = ev.filter(F.col("event_id") % 2 == 1).select(
        F.nullif(F.col("event_type"), F.lit("error")).alias("kb")
    )
    joined = a.join(b, F.col("ka").eqNullSafe(F.col("kb")))
    return joined.groupBy(
        F.coalesce("ka", F.lit("<null>")).alias("join_key")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))


@query(
    "dedup_threshold_sweep",
    oracle="""
    WITH sub AS (
        SELECT doc_id, trim(text) AS tx FROM documents WHERE doc_id % 25 = 0
    ), sh AS (
        SELECT doc_id,
               list_distinct(list_filter(
                   list_transform(range(1, greatest(length(tx) - 2, 1) + 1),
                                  i -> substring(tx, CAST(i AS INT), 3)),
                   g -> length(g) > 0)) AS shingles
        FROM sub
    ), nonempty AS (
        SELECT * FROM sh WHERE len(shingles) > 0
    ), ex0 AS (
        SELECT doc_id, unnest(shingles) AS shingle FROM nonempty
    ), keep AS (
        SELECT shingle FROM ex0 GROUP BY shingle HAVING COUNT(*) <= 15
    ), ex AS (
        SELECT ex0.doc_id, ex0.shingle FROM ex0 JOIN keep USING (shingle)
    ), sz AS (
        SELECT doc_id, COUNT(*) AS sz FROM ex GROUP BY doc_id
    ), shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), j AS (
        SELECT n_shared, sa.sz + sb.sz - n_shared AS un
        FROM shared
        JOIN sz sa ON sa.doc_id = id_a
        JOIN sz sb ON sb.doc_id = id_b
    ), bands(thr_permille) AS (
        SELECT unnest([300, 400, 500, 600, 700, 800, 900])
    )
    SELECT CAST(b.thr_permille AS BIGINT) AS thr_permille,
           CAST(SUM(CASE WHEN j.n_shared * 1000 >= b.thr_permille * j.un
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs
    FROM bands b CROSS JOIN j
    GROUP BY b.thr_permille
    """,
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup operating-point selection: cumulative near-dup pair counts
    at Jaccard thresholds 0.3-0.9 from ONE candidate-generation pass —
    the sweep that picks a production threshold (too low = collapse
    distinct docs, too high = keep near-copies). All comparisons are
    the integer cross-product form ``1000*shared >= thr*union`` — no
    float boundary can flip a band.

    Scale shape: the shared-shingle join (df-capped) runs ONCE; the
    sweep is a 7-band conditional aggregation over the pair counts —
    adding operating points costs nothing.
    """
    from pyspark_movie_recommender_spark.operators.dedup import shingle_candidates

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    shared, sizes = shingle_candidates(
        docs, "text", "doc_id", n=3, max_shingle_df=15
    )
    j = (
        shared.join(
            sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("sza")),
            "id_a",
        )
        .join(
            sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("szb")),
            "id_b",
        )
        .select(
            "n_shared",
            (F.col("sza") + F.col("szb") - F.col("n_shared")).alias("un"),
        )
    )
    bands = spark.createDataFrame(
        [(t,) for t in (300, 400, 500, 600, 700, 800, 900)], "thr_permille long"
    )
    return (
        F.broadcast(bands)
        .crossJoin(j)
        .groupBy("thr_permille")
        .agg(
            F.sum(
                F.when(
                    F.col("n_shared") * 1000 >= F.col("thr_permille") * F.col("un"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_pairs")
        )
    )


@query(
    "dedup_impact_report",
    oracle="""
    WITH RECURSIVE sub AS (
        SELECT doc_id, trim(text) AS tx FROM documents WHERE doc_id % 25 = 0
    ), sh AS (
        SELECT doc_id,
               list_distinct(list_filter(
                   list_transform(range(1, greatest(length(tx) - 2, 1) + 1),
                                  i -> substring(tx, CAST(i AS INT), 3)),
                   g -> length(g) > 0)) AS shingles
        FROM sub
    ), nonempty AS (
        SELECT * FROM sh WHERE len(shingles) > 0
    ), ex AS (
        SELECT doc_id, unnest(shingles) AS shingle FROM nonempty
    ), shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT id_a, id_b
        FROM shared
        JOIN (SELECT doc_id, len(shingles) AS sz FROM nonempty) sa ON sa.doc_id = id_a
        JOIN (SELECT doc_id, len(shingles) AS sz FROM nonempty) sb ON sb.doc_id = id_b
        WHERE n_shared * 1.0 / (sa.sz + sb.sz - n_shared) >= 0.5
    ), bi AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ), reach(id, label) AS (
        SELECT DISTINCT u AS id, u AS label FROM bi
        UNION
        SELECT bi.u, r.label FROM reach r JOIN bi ON bi.v = r.id
    ), comp AS (
        SELECT id, MIN(label) AS component FROM reach GROUP BY id
    ), removed AS (
        SELECT id FROM comp WHERE id <> component
    )
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs_subset,
           CAST(SUM(CASE WHEN r.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed,
           CAST(SUM(CASE WHEN r.id IS NOT NULL
                    THEN len(string_split(d.text, ' ')) ELSE 0 END) AS BIGINT)
               AS tokens_removed
    FROM (SELECT * FROM documents WHERE doc_id % 25 = 0) d
    LEFT JOIN removed r ON r.id = d.doc_id
    GROUP BY d.lang
    """,
)
def dedup_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What dedup actually costs the corpus: exact-Jaccard pairs →
    connected components → min-id keepers, then the per-language
    removal bill — docs dropped and tokens lost. The report a data
    lead reads before approving a dedup config (the threshold sweep
    picks the operating point; this shows its consequences).

    Composition #3 (after curation_end_to_end and
    entity_resolution_pipeline): pairs, clustering, survivorship, and
    reporting pipeline from verified operators in one lazy plan.

    Scale shape: pair generation is the df-capped shingle join on a
    sampled subset; CC rounds on pair edges only; the final report is
    a broadcast-eligible join of the (tiny) removed-id set back onto
    the subset scan.
    """
    from pyspark_movie_recommender_spark.operators.dedup import ngram_jaccard_pairs
    from pyspark_movie_recommender_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    comp = connected_components(pairs)
    removed = comp.filter(F.col("id") != F.col("component")).select("id")
    flagged = docs.join(
        F.broadcast(removed.withColumnRenamed("id", "doc_id").withColumn(
            "is_removed", F.lit(True)
        )),
        "doc_id",
        "left",
    )
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_subset"),
        F.sum(F.when(F.col("is_removed"), 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
        F.sum(
            F.when(
                F.col("is_removed"), F.size(F.split("text", " "))
            ).otherwise(0)
        )
        .cast("long")
        .alias("tokens_removed"),
    )


# ---------------------------------------------------------------------------
# wave 36: A/B readout, TTL forward-fill, trending stream twin
# ---------------------------------------------------------------------------


@query(
    "ab_experiment_readout",
    oracle="""
    WITH assigned AS (
        SELECT user_id,
               CASE WHEN (user_id * 2654435761) % 100 < 50
                    THEN 'control' ELSE 'treatment' END AS arm,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    )
    SELECT arm,
           CAST(COUNT(*) AS BIGINT)        AS n_users,
           CAST(SUM(converted) AS BIGINT)  AS n_converted,
           CAST(SUM(converted) * 1000000 // COUNT(*) AS BIGINT)
               AS conv_ppm
    FROM assigned GROUP BY arm
    """,
)
def ab_experiment_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: deterministic 50/50 hash assignment of
    users to arms (the SAME multiplicative hash family as the
    train/test splitter — assignment is reproducible, growth-stable,
    and auditable), then per-arm user counts and conversion in exact
    ppm. The experimentation-platform primitive: no assignment table,
    no rand(), any engine recomputes the same arms.

    Scale shape: per-user conversion collapses map-side into the
    user_id agg; arm assignment is arithmetic on the group key; the
    readout is a 2-row agg.
    """
    ev = load_table(spark, sf_dir, "events")
    assigned = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select(
        F.when(
            (F.col("user_id") * 2654435761) % 100 < 50, "control"
        )
        .otherwise("treatment")
        .alias("arm"),
        "converted",
    )
    return assigned.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.expr("SUM(converted) * 1000000 div COUNT(*)")
        .cast("long")
        .alias("conv_ppm"),
    )


@query(
    "locf_with_ttl",
    oracle="""
    WITH daily AS (
        SELECT user_id,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE user_id < 30
        GROUP BY 1, 2
    ), bounds AS (
        SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY user_id
    ), grid AS (
        SELECT b.user_id, CAST(gs.g AS BIGINT) AS day
        FROM bounds b, LATERAL (
            SELECT unnest(generate_series(b.lo, b.hi)) AS g) gs
    ), joined AS (
        SELECT g.user_id, g.day, d.cents
        FROM grid g LEFT JOIN daily d
          ON d.user_id = g.user_id AND d.day = g.day
    )
    SELECT user_id, day,
           COALESCE(cents,
               LAST_VALUE(cents IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY day
                   RANGE BETWEEN 3 PRECEDING AND 1 PRECEDING),
               0) AS filled_cents
    FROM joined
    """,
)
def locf_with_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill WITH EXPIRY: gap-filled per-user daily spend where
    a missing day carries the last observation forward at most 3 days
    (RANGE frame on the day axis), then falls to 0 — the sensor/
    feature-store freshness contract ('stale after N days') that plain
    LOCF silently violates. Exact BIGINT cents.

    Scale shape: same grid-explode + co-partitioned left join as
    forward_fill_user_value; the TTL is free — the RANGE frame bound
    replaces the unbounded-preceding frame, same single exchange.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    daily = ev.groupBy(
        "user_id", F.expr("unix_micros(CAST(ts AS timestamp_ltz)) div 86400000000").cast("long").alias("day")
    ).agg(
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("cents")
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("day")
    )
    joined = grid.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rangeBetween(-3, -1)
    )
    return joined.select(
        "user_id",
        "day",
        F.coalesce(
            "cents", F.last("cents", ignorenulls=True).over(w), F.lit(0)
        ).alias("filled_cents"),
    )


@query(
    "binary_codec_suite",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN base64(props::BLOB) = base64(props::BLOB)
                          AND from_base64(base64(props::BLOB)) = props::BLOB
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_b64_roundtrip,
           min(base64(props::BLOB))                    AS min_b64,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT)                             AS k_sum_json
    FROM events GROUP BY event_type
    """,
)
def binary_codec_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary codec surface: base64 encode/decode roundtrip over the
    raw payload bytes (the wire format for binary columns in JSON/REST
    hand-offs), cross-checked VALUE-wise — DuckDB computes its own
    base64 of the same bytes and the gate compares the strings — plus
    the JSON-extracted control sum. Every row must survive the
    encode→decode roundtrip bit-for-bit.

    Scale shape: pure map-side codecs fused into one scan; |types|-row
    agg. Base64 inflates bytes 4/3 — the docstring-level reminder that
    payload columns should ship as binary, not base64 text, between
    engine stages.
    """
    ev = load_table(spark, sf_dir, "events")
    raw = F.encode(F.col("props"), "UTF-8")
    b64 = F.base64(raw)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(
            F.when(F.unbase64(b64) == raw, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_b64_roundtrip"),
        F.min(b64).alias("min_b64"),
        F.sum(F.get_json_object("props", "$.k").cast("long"))
        .cast("long")
        .alias("k_sum_json"),
    )


@query(
    "xml_shred_events",
    oracle="""
    -- the oracle never parses XML: it extracts k from the ORIGINAL
    -- JSON. The engine round-trips the value through to_xml/from_xml,
    -- so equality proves the XML codec preserves the data.
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events GROUP BY event_type
    """,
)
def xml_shred_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingest surface: each event's payload re-serialized as an
    XML document (``to_xml`` of a struct) and shredded back with
    ``from_xml`` + an explicit schema — the Spark 4 native-XML path
    (no spark-xml package). The oracle reads the value from the
    ORIGINAL JSON, so hash equality proves the to_xml→from_xml
    round-trip is lossless — the same source-of-truth trick as the
    Arrow-kernel and base64 checks.

    Scale shape: map-side serialize+parse fused into the scan; one
    small agg. XML parse is the costliest codec here — fine for
    ingest-boundary columns, not for hot-loop re-parsing (shred once,
    as with VARIANT).
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    xml = F.to_xml(F.struct(k.alias("k")), {"rootTag": "r"})
    parsed = F.from_xml(xml, "k LONG")
    return ev.select("event_type", parsed.alias("p")).groupBy(
        "event_type"
    ).agg(
        F.sum(F.col("p.k")).cast("long").alias("k_sum"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


@query(
    "preference_pairs_by_quality",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) // 20 AS BIGINT) AS len_band,
               CAST(len(list_distinct(string_split(text, ' '))) * 1000000
                    // len(string_split(text, ' ')) AS BIGINT) AS quality_ppm
        FROM documents
    )
    SELECT lang, len_band,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(quality_ppm * 10000000 + doc_id) % 10000000 AS BIGINT)
               AS chosen_id,
           CAST(MIN(quality_ppm * 10000000 + doc_id) % 10000000 AS BIGINT)
               AS rejected_id,
           CAST(MAX(quality_ppm * 10000000 + doc_id) // 10000000
              - MIN(quality_ppm * 10000000 + doc_id) // 10000000 AS BIGINT)
               AS margin_ppm
    FROM scored GROUP BY lang, len_band
    HAVING COUNT(*) >= 2
    """,
)
def preference_pairs_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction for reward-model / DPO training:
    within each (language, length-band) group, pair the highest-quality
    document (chosen) with the lowest (rejected) and report the quality
    margin — the data factory that turns a scored corpus into
    comparison training rows. Quality = distinct-token ratio in exact
    ppm; argmax/argmin are the packed integer ``score*K + id`` trick
    (single aggregate, deterministic tie-break by id, no window sort).

    Scale shape: one scan, one (lang, band) hash agg with map-side
    partials — the min/max packing replaces two rank windows.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        "lang",
        F.expr("size(split(text, ' ')) div 20").cast("long").alias("len_band"),
        F.expr(
            "size(array_distinct(split(text, ' '))) * 1000000"
            " div size(split(text, ' '))"
        )
        .cast("long")
        .alias("quality_ppm"),
    )
    packed = F.col("quality_ppm") * 10000000 + F.col("doc_id")
    return (
        scored.groupBy("lang", "len_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            (F.max(packed) % 10000000).cast("long").alias("chosen_id"),
            (F.min(packed) % 10000000).cast("long").alias("rejected_id"),
            (
                F.expr("MAX(quality_ppm * 10000000 + doc_id) div 10000000")
                - F.expr("MIN(quality_ppm * 10000000 + doc_id) div 10000000")
            )
            .cast("long")
            .alias("margin_ppm"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@query(
    "token_dropout_augment",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(toks) - len(list_filter(
                list_transform(range(1, len(toks) + 1),
                               i -> CASE WHEN i % 7 <> 0 THEN toks[i] END),
                x -> x IS NOT NULL)) AS BIGINT) AS n_dropped,
           array_to_string(list_filter(
               list_transform(range(1, len(toks) + 1),
                              i -> CASE WHEN i % 7 <> 0 THEN toks[i] END),
               x -> x IS NOT NULL), ' ') AS aug_text
    FROM t
    """,
)
def token_dropout_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data augmentation: word dropout that removes every
    7th token (position-based, so the augmentation is reproducible and
    hash-checkable — the seeded-random equivalent for a gate that
    compares engines). Produces the augmented text plus drop
    accounting; the training pipeline unions augmented rows with
    originals at a chosen rate.

    Scale shape: pure in-row array transform+filter — zero shuffles,
    no explode; the corpus is rewritten map-side.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr("size(split(text, ' '))").cast("long").alias("n_tokens"),
        F.expr(
            "size(split(text, ' ')) - size(filter("
            " transform(split(text, ' '), (x, i) ->"
            "  CASE WHEN (i + 1) % 7 != 0 THEN x END), x -> x IS NOT NULL))"
        )
        .cast("long")
        .alias("n_dropped"),
        F.expr(
            "array_join(filter(transform(split(text, ' '), (x, i) ->"
            " CASE WHEN (i + 1) % 7 != 0 THEN x END), x -> x IS NOT NULL), ' ')"
        ).alias("aug_text"),
    )


# ---------------------------------------------------------------------------
# wave 42: split-leakage audit + cross-source dedup ownership
# ---------------------------------------------------------------------------


@query(
    "split_leakage_audit",
    oracle="""
    WITH assigned AS (
        SELECT doc_id, sha256(text) AS h,
               CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train'
                    WHEN (doc_id * 2654435761) % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ), by_hash AS (
        SELECT h,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT split) AS n_splits
        FROM assigned GROUP BY h
    )
    SELECT CAST(COUNT(*) AS BIGINT)                                AS n_hashes,
           CAST(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_leaked_hashes,
           CAST(SUM(CASE WHEN n_splits > 1 THEN n_docs ELSE 0 END) AS BIGINT)
               AS n_leaked_docs
    FROM by_hash
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test leakage audit: documents whose EXACT content
    appears in more than one split — the evaluation-hygiene bug that
    silently inflates held-out metrics (decontamination's n-gram check
    catches paraphrase overlap with EXTERNAL eval sets; this catches
    exact duplicates straddling the pipeline's OWN split boundaries).
    Splits come from the deterministic multiplicative hash (80/10/10),
    so the audit is reproducible anywhere.

    The clean protocol — dedup BEFORE splitting, or split by content
    hash instead of doc id — makes this report all zeros; run it as a
    release gate.

    Scale shape: one scan → (hash) hash-agg with map-side partials →
    scalar rollup; no joins.
    """
    docs = load_table(spark, sf_dir, "documents")
    split = (
        F.when((F.col("doc_id") * 2654435761) % 100 < 80, "train")
        .when((F.col("doc_id") * 2654435761) % 100 < 90, "val")
        .otherwise("test")
    )
    assigned = docs.select(F.sha2("text", 256).alias("h"), split.alias("split"))
    by_hash = assigned.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("split").alias("n_splits"),
    )
    return by_hash.agg(
        F.count(F.lit(1)).cast("long").alias("n_hashes"),
        F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_leaked_hashes"),
        F.sum(F.when(F.col("n_splits") > 1, F.col("n_docs")).otherwise(0))
        .cast("long")
        .alias("n_leaked_docs"),
    )


@query(
    "cross_source_dedup_ownership",
    oracle="""
    WITH hashed AS (
        SELECT doc_id, source, sha256(text) AS h FROM documents
    ), keepers AS (
        SELECT h, MIN(doc_id) AS keeper_id FROM hashed GROUP BY h
    ), judged AS (
        SELECT d.source,
               CASE WHEN d.doc_id = k.keeper_id THEN 0 ELSE 1 END AS lost,
               CASE WHEN d.doc_id <> k.keeper_id
                     AND kd.source <> d.source THEN 1 ELSE 0 END
                   AS lost_to_other_source
        FROM hashed d
        JOIN keepers k ON k.h = d.h
        JOIN hashed kd ON kd.doc_id = k.keeper_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)                 AS n_docs,
           CAST(SUM(lost) AS BIGINT)                AS n_lost,
           CAST(SUM(lost_to_other_source) AS BIGINT)
               AS n_lost_to_other_source
    FROM judged GROUP BY source
    """,
)
def cross_source_dedup_ownership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup ownership across sources: when identical content exists in
    several crawls, min-id survivorship decides which SOURCE keeps the
    canonical copy — and every other source's copy is 'lost', possibly
    to a competitor crawl. The per-source bill (docs lost, docs lost to
    ANOTHER source) is the negotiation table for mixture weights after
    dedup: a source whose content is always owned elsewhere contributes
    nothing to the final corpus.

    Scale shape: hash → keeper agg (map-side partials), then two
    co-partitioned joins keyed on the hash / keeper id; no quadratic
    anything — the keeper relation is |distinct hashes|.
    """
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id", "source", F.sha2("text", 256).alias("h")
    )
    keepers = hashed.groupBy("h").agg(F.min("doc_id").alias("keeper_id"))
    keeper_src = hashed.select(
        F.col("doc_id").alias("keeper_id"), F.col("source").alias("keeper_source")
    )
    judged = (
        hashed.join(keepers, "h")
        .join(keeper_src, "keeper_id")
        .select(
            "source",
            F.when(F.col("doc_id") == F.col("keeper_id"), 0)
            .otherwise(1)
            .alias("lost"),
            F.when(
                (F.col("doc_id") != F.col("keeper_id"))
                & (F.col("keeper_source") != F.col("source")),
                1,
            )
            .otherwise(0)
            .alias("lost_to_other_source"),
        )
    )
    return judged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("lost").cast("long").alias("n_lost"),
        F.sum("lost_to_other_source").cast("long").alias("n_lost_to_other_source"),
    )


# ---------------------------------------------------------------------------
# wave 43: weighted sampling, sorted-neighborhood blocking, isotonic fit
# ---------------------------------------------------------------------------


@query(
    "weighted_sample_parts",
    oracle="""
    WITH keyed AS (
        SELECT p_partkey, p_retailprice,
               ROUND(ln(((p_partkey * 2654435761) % 1000000007 + 1)
                         / 1000000009.0) / p_retailprice, 9) AS skey
        FROM part
    )
    SELECT p_partkey, ROUND(p_retailprice, 2) AS weight, skey
    FROM keyed
    ORDER BY skey DESC, p_partkey
    LIMIT 50
    """,
)
def weighted_sample_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis-Spirakis
    A-ES exponential-key trick: each row gets key = ln(u) / w (u a
    uniform in (0,1), w the row weight); the k LARGEST keys are an
    exact weighted sample. Replacing the usual random u with a
    deterministic multiplicative-hash uniform makes the sample
    reproducible anywhere and lets two engines agree bit-for-bit —
    the seeded-sampling analogue this gate can hash-check (keys are
    rounded to 9 decimals before ranking so libm noise in ``ln`` can
    never flip an ordering).

    Scale shape: the key is computed map-side; ``ORDER BY key LIMIT k``
    lowers to TakeOrderedAndProject — per-partition top-k heaps, only
    k rows per partition reach the driver-side merge; the corpus is
    never globally sorted. This is how you draw a 10M-doc weighted
    subcorpus from 100 TB in one pass.
    """
    part = load_table(spark, sf_dir, "part")
    u = ((F.col("p_partkey") * F.lit(2654435761)) % F.lit(1000000007) + 1) / F.lit(
        1000000009.0
    )
    keyed = part.select(
        "p_partkey",
        F.round("p_retailprice", 2).alias("weight"),
        F.round(F.ln(u) / F.col("p_retailprice"), 9).alias("skey"),
    )
    return keyed.orderBy(F.col("skey").desc(), F.col("p_partkey")).limit(50)


@query(
    "sorted_neighborhood_parts",
    oracle="""
    WITH ranked AS (
        SELECT p_partkey, p_brand, p_retailprice,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY p_retailprice, p_partkey) AS BIGINT) AS rn
        FROM part
    )
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           ROUND(b.p_retailprice - a.p_retailprice, 6) AS price_gap,
           CAST(CASE WHEN a.p_brand = b.p_brand THEN 1 ELSE 0 END AS BIGINT)
               AS same_brand,
           CAST(b.rn - a.rn AS BIGINT) AS dist
    FROM ranked a
    JOIN ranked b ON b.rn IN (a.rn + 1, a.rn + 2)
    """,
)
def sorted_neighborhood_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (the classic entity-resolution
    alternative to hash blocking): order the corpus by a fuzzy numeric
    key and emit candidate pairs within rank distance <= 2 — O(n*w)
    candidates instead of O(n^2). Pairs carry the price gap and a
    same-brand flag, the features a downstream match scorer consumes.

    The interesting part is HOW the global rank is computed: NOT via a
    single-partition ``Window.orderBy`` (the 1-task scale cliff Spark
    itself warns about) but via ``operators.rank.distributed_global_rank``
    — range-bucketed parallel windows plus a prefix-sum offset map, so
    no task ever sorts more than one bucket. The neighbor join is a
    pure EQUI-join (left side explodes rn+1, rn+2), no range predicate,
    no cross product. DuckDB's single-node ROW_NUMBER is the oracle
    proving the two-pass rank is exactly the global rank.
    """
    from pyspark_movie_recommender_spark.operators.rank import (
        sorted_neighborhood_pairs,
    )

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    pairs = sorted_neighborhood_pairs(
        part, key_col="p_retailprice", id_col="p_partkey", window=2
    )
    return pairs.select(
        F.col("p_partkey_a").alias("id_a"),
        F.col("p_partkey_b").alias("id_b"),
        F.round(F.col("p_retailprice_b") - F.col("p_retailprice_a"), 6).alias(
            "price_gap"
        ),
        F.when(F.col("p_brand_a") == F.col("p_brand_b"), 1)
        .otherwise(0)
        .cast("long")
        .alias("same_brand"),
        "dist",
    )


@query("isotonic_fit_quantity_price")
def isotonic_fit_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone) calibration of mean extended price as a
    function of quantity, per return flag — weighted PAV on the
    x-level aggregate (see ``operators/calibrate.py``). Rows-only by
    design: PAV's pooling is an iterative fixpoint no single SQL
    expression computes; its laws (monotone output, exact weighted-mean
    preservation, pool values = block means) are pinned in
    ``tests/test_operators.py`` instead.

    Scale shape: JVM hash-agg (map-side partials) shrinks the fact
    table to one row per (flag, quantity) BEFORE Python sees it; the
    Arrow-batched PAV then costs |distinct quantities| per group.
    """
    from pyspark_movie_recommender_spark.operators.calibrate import isotonic_fit

    li = load_table(spark, sf_dir, "lineitem")
    fit = isotonic_fit(
        li, group_col="l_returnflag", x_col="l_quantity", y_col="l_extendedprice"
    )
    return fit.select(
        "l_returnflag",
        "l_quantity",
        "w",
        F.round("y_mean", 6).alias("y_mean"),
        F.round("y_hat", 6).alias("y_hat"),
    )


# ---------------------------------------------------------------------------
# wave 44: content-defined chunking, JL projection, KS drift
# ---------------------------------------------------------------------------


@query(
    "cdc_chunk_dedup",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), tok AS (
        SELECT doc_id, unnest(t) AS tok,
               CAST(generate_subscripts(t, 1) AS BIGINT) AS pos
        FROM toks
    ), hashed AS (
        SELECT doc_id, pos, tok,
               ascii(tok) * 8191 + length(tok) * 131 AS h
        FROM tok
    ), rolled AS (
        SELECT doc_id, pos, tok,
               CASE WHEN pos >= 4 AND
                    (7 * lag(h, 3) OVER w + 5 * lag(h, 2) OVER w
                     + 3 * lag(h, 1) OVER w + h) % 16 = 0
                    THEN 1 ELSE 0 END AS boundary
        FROM hashed
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), chunked AS (
        SELECT doc_id, pos, tok,
               COALESCE(SUM(boundary) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS chunk_idx
        FROM rolled
    ), chunks AS (
        SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               sha256(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
        FROM chunked GROUP BY doc_id, chunk_idx
    )
    SELECT c.doc_id, c.chunk_idx, c.n_tokens, c.chunk_hash,
           CAST(d.n_docs AS BIGINT) AS n_docs_sharing
    FROM chunks c
    JOIN (SELECT chunk_hash, COUNT(DISTINCT doc_id) AS n_docs
          FROM chunks GROUP BY chunk_hash) d USING (chunk_hash)
    """,
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (rsync/LBFS-style) + corpus chunk dedup:
    split every document where a rolling hash of the last 4 tokens hits
    0 mod 16, so chunk boundaries are CONTENT-anchored — insert a token
    at the front of a document and the downstream boundaries do not
    shift (fixed-size chunking would re-chunk the whole tail). Each
    chunk is content-hashed and joined against the corpus-wide chunk
    census, giving sub-document dedup: how many documents share each
    exact chunk. This is the storage/transfer dedup primitive (and the
    passage-level twin of whole-doc hash dedup).

    All hash arithmetic is integer and shared verbatim with the oracle,
    so the gate checks boundary placement bit-for-bit.

    Scale shape: posexplode → per-doc windows (partitioned by doc_id,
    never global) → hash-agg to chunks → one hash-keyed self-agg join.
    No quadratic anything; chunking is embarrassingly parallel per doc.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        "tok",
        (F.ascii("tok") * 8191 + F.length("tok") * 131).alias("h"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    rolled = tok.withColumn(
        "boundary",
        F.when(
            (F.col("pos") >= 4)
            & (
                (
                    7 * F.lag("h", 3).over(w)
                    + 5 * F.lag("h", 2).over(w)
                    + 3 * F.lag("h", 1).over(w)
                    + F.col("h")
                )
                % 16
                == 0
            ),
            1,
        ).otherwise(0),
    )
    chunked = rolled.withColumn(
        "chunk_idx",
        F.coalesce(
            F.sum("boundary").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long"),
    )
    chunks = chunked.groupBy("doc_id", "chunk_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sha2(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ),
            256,
        ).alias("chunk_hash"),
    )
    census = chunks.groupBy("chunk_hash").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs_sharing")
    )
    return chunks.join(census, "chunk_hash").select(
        "doc_id", "chunk_idx", "n_tokens", "chunk_hash", "n_docs_sharing"
    )


@query(
    "jl_random_projection",
    oracle="""
    WITH e AS (
        SELECT vec_id, embedding FROM embeddings
    ), flat AS (
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
               unnest(embedding) AS v
        FROM e
    )
    SELECT f.vec_id, CAST(js.j AS BIGINT) AS dim,
           ROUND(SUM(f.v * CASE WHEN ((f.i * 1315423911 + js.j * 2654435761)
                                      % 97) % 2 = 0
                                THEN 1.0 ELSE -1.0 END), 6) AS value
    FROM flat f
    CROSS JOIN (SELECT unnest(range(0, 8)) AS j) js
    GROUP BY f.vec_id, js.j
    """,
)
def jl_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 -> 8 dims with a
    DETERMINISTIC +/-1 sign matrix: sign(i, j) = parity of a
    multiplicative hash of (input dim i, output dim j), so the
    projection needs no stored matrix, is identical on every executor
    and every engine, and the gate hash-checks the projected values.
    The sparse/sign JL family (Achlioptas) preserves pairwise distances
    within (1 +/- eps) — the cheap pre-step before clustering or ANN
    when 100-TB embeddings don't fit the index.

    Scale shape: entirely map-side JVM higher-order functions
    (zip_with + aggregate inside whole-stage codegen) — zero shuffles,
    zero Python, each row rewritten in place; posexplode only shapes
    the gate-friendly (vec_id, dim, value) output.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    proj = emb.select(
        "vec_id",
        F.expr(
            """
            transform(sequence(0, 7), j -> round(
              aggregate(
                zip_with(embedding, sequence(0, size(embedding) - 1),
                  (v, i) -> v * CASE WHEN pmod(CAST(i AS BIGINT) * 1315423911
                                              + CAST(j AS BIGINT)
                                                * 2654435761, 97) % 2 = 0
                                     THEN CAST(1.0 AS DOUBLE)
                                     ELSE CAST(-1.0 AS DOUBLE) END),
                CAST(0.0 AS DOUBLE), (acc, x) -> acc + x), 6))
            """
        ).alias("p"),
    )
    return proj.select(
        "vec_id", F.posexplode("p").alias("dim", "value")
    ).select(F.col("vec_id"), F.col("dim").cast("long"), F.col("value"))


@query(
    "ks_drift_view_purchase",
    oracle="""
    WITH binned AS (
        SELECT ROUND(value, 2) AS bin,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS na,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS nb
        FROM events
        WHERE event_type IN ('view', 'purchase')
        GROUP BY bin
    ), cum AS (
        SELECT bin,
               SUM(na) OVER (ORDER BY bin) AS ca,
               SUM(nb) OVER (ORDER BY bin) AS cb,
               (SELECT SUM(na) FROM binned) AS ta,
               (SELECT SUM(nb) FROM binned) AS tb
        FROM binned
    )
    SELECT CAST(MAX(ta) AS BIGINT) AS n_view,
           CAST(MAX(tb) AS BIGINT) AS n_purchase,
           ROUND(MAX(ABS(ca * 1.0 / ta - cb * 1.0 / tb)), 6) AS ks
    FROM cum
    """,
)
def ks_drift_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between the value
    distributions of 'view' and 'purchase' events — the CONTINUOUS
    drift detector beside the categorical chi-square audit
    (`chi2_drift_events`): KS = max vertical gap between the two
    empirical CDFs, evaluated on a 0.01-wide binned grid (binning makes
    the ECDF support bounded and both engines bit-agree on integer
    cumulative counts; the statistic is exact for the binned
    distributions).

    Scale shape: the fact table collapses to one row per bin in a
    map-side-partial hash-agg FIRST; the single ordered cumulative
    window then runs over |bins| rows (thousands), not |events| — the
    pre-shrink that keeps an unpartitioned window legal at 100 TB.
    """
    ev = load_table(spark, sf_dir, "events")
    binned = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy(F.round("value", 2).alias("bin"))
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("na"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "nb"
            ),
        )
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    totals = binned.agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb")
    )
    cum = binned.withColumn("ca", F.sum("na").over(wcum)).withColumn(
        "cb", F.sum("nb").over(wcum)
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.max("ta").cast("long").alias("n_view"),
            F.max("tb").cast("long").alias("n_purchase"),
            F.round(
                F.max(
                    F.abs(
                        F.col("ca") * 1.0 / F.col("ta")
                        - F.col("cb") * 1.0 / F.col("tb")
                    )
                ),
                6,
            ).alias("ks"),
        )
    )


# ---------------------------------------------------------------------------
# wave 45: BFS shortest hops + integer-exact quantile normalization
# ---------------------------------------------------------------------------


@query(
    "bfs_copurchase_hops",
    oracle="""
    WITH RECURSIVE items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e0 AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ), e AS (
        SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0
    ), walk(node, hops) AS (
        SELECT (SELECT MIN(u) FROM e), 0
        UNION
        SELECT e.v, w.hops + 1
        FROM walk w JOIN e ON e.u = w.node
        WHERE w.hops < 4
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(MIN(hops) AS BIGINT) AS hops
    FROM walk GROUP BY node
    """,
)
def bfs_copurchase_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS shortest hop counts over the part co-purchase graph (edges =
    parts sharing >= 2 orders) from the minimum part id — the reach /
    influence-radius primitive beside PageRank (importance), k-core
    (cohesion) and CC (membership). First visit = minimum hops, so the
    frontier loop needs no per-node min; the DuckDB oracle is the
    recursive-CTE fixpoint with UNION-dedup termination, making this an
    ORACLE-CHECKED iterative graph algorithm, not rows-only.

    Scale shape (see ``operators/graph.py bfs_hops``): support->=2
    threshold caps degree before any traversal; one vertex-keyed join
    per round, O(max_hops) rounds, per-round lineage truncation.
    """
    from pyspark_movie_recommender_spark.operators.graph import bfs_hops

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
    )
    return bfs_hops(edges, "u", "v", max_hops=4)


@query(
    "quantile_normalize_sources",
    oracle="""
    WITH g AS (
        SELECT n_chars,
               CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
                   AS grn
        FROM documents
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
    ), s AS (
        SELECT doc_id, source, n_chars,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT)
                   AS rs,
               CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS ns
        FROM documents
    )
    SELECT s.doc_id, s.source, s.n_chars, g.n_chars AS norm_chars
    FROM s
    JOIN tot ON TRUE
    JOIN g ON g.grn = ((s.rs - 1) * (tot.n - 1)) // GREATEST(s.ns - 1, 1) + 1
    """,
)
def quantile_normalize_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across sources (the batch-effect
    correction standard in bioinformatics, applied to corpus length
    bias): each source's document-length distribution is mapped onto
    the GLOBAL length distribution by rank, so after normalization
    every source has the same length profile — the principled
    alternative to per-source truncation when mixing crawls whose
    length distributions disagree.

    The rank-to-rank mapping is INTEGER-EXACT: target global rank =
    (r-1)(N-1) // (n_s-1) + 1 — no float percentiles, no interpolation
    noise, so both engines agree bit-for-bit.

    Scale shape: the global rank comes from
    ``operators/rank.py distributed_global_rank`` (range-bucketed
    parallel windows — never a 1-task global window); per-source ranks
    are ordinarily partitioned windows; the final mapping is one
    hash-keyed equi-join on the computed rank.
    """
    from pyspark_movie_recommender_spark.operators.rank import (
        distributed_global_rank,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    g = distributed_global_rank(docs, "n_chars", "doc_id", out_col="grn").select(
        F.col("n_chars").alias("g_chars"), "grn"
    )
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    s = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(ws).cast("long").alias("rs"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).cast("long").alias("ns"),
    )
    mapped = s.crossJoin(F.broadcast(tot)).withColumn(
        "grn",
        F.expr("((rs - 1) * (n - 1)) div greatest(ns - 1, 1) + 1"),
    )
    return mapped.join(g, "grn").select(
        "doc_id", "source", "n_chars", F.col("g_chars").alias("norm_chars")
    )


# ---------------------------------------------------------------------------
# wave 46: Kaplan-Meier survival, Zipf fit, deterministic-DP counts
# ---------------------------------------------------------------------------


@query(
    "kaplan_meier_signup_purchase",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS buy_ts
        FROM events GROUP BY user_id
    ), horizon AS (
        SELECT MAX(ts) AS max_ts FROM events
    ), durations AS (
        SELECT CASE WHEN buy_ts IS NOT NULL AND buy_ts >= signup_ts
                    THEN date_diff('day', signup_ts, buy_ts)
                    ELSE date_diff('day', signup_ts, max_ts) END AS t_days,
               CASE WHEN buy_ts IS NOT NULL AND buy_ts >= signup_ts
                    THEN 1 ELSE 0 END AS event
        FROM per_user, horizon
        WHERE signup_ts IS NOT NULL
    ), km AS (
        SELECT CAST(t_days AS BIGINT) AS t_days,
               CAST(SUM(event) AS BIGINT) AS d_events,
               CAST(COUNT(*) AS BIGINT) AS n_here
        FROM durations GROUP BY t_days
    ), risk AS (
        SELECT t_days, d_events,
               CAST((SELECT COUNT(*) FROM durations)
                    - COALESCE(SUM(n_here) OVER (
                        ORDER BY t_days
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS n_risk
        FROM km
    )
    SELECT t_days, n_risk, d_events,
           CASE WHEN MAX(CASE WHEN d_events >= n_risk THEN 1 ELSE 0 END)
                     OVER (ORDER BY t_days) = 1
                THEN 0.0
                ELSE ROUND(EXP(SUM(
                         CASE WHEN d_events < n_risk AND d_events > 0
                              THEN ln(1.0 - d_events * 1.0 / n_risk)
                              ELSE 0.0 END) OVER (ORDER BY t_days)), 6)
           END AS survival
    FROM risk
    """,
)
def kaplan_meier_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for signup -> first purchase with
    right-censoring at the corpus horizon: S(t) = prod_{t'<=t}
    (1 - d/n). The estimator runs as EXP of a cumulative SUM of
    ln(1 - d/n) — a single ordered window — with the d=n absorbing
    state handled by a cumulative flag instead of ln(0). Survival /
    time-to-conversion is the retention primitive product analytics
    adds beside funnels and cohorts.

    Scale shape: the fact table collapses to one row per user
    (hash-agg), then to one row per distinct duration — the windows run
    over |distinct days| rows (hundreds), never |events|; the horizon
    and total are broadcast scalars.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "signup_ts"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "buy_ts"
        ),
    )
    horizon = ev.agg(F.max("ts").alias("max_ts"))
    converted = F.col("buy_ts").isNotNull() & (F.col("buy_ts") >= F.col("signup_ts"))
    durations = (
        per_user.filter(F.col("signup_ts").isNotNull())
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(converted, F.datediff("buy_ts", "signup_ts"))
            .otherwise(F.datediff("max_ts", "signup_ts"))
            .cast("long")
            .alias("t_days"),
            F.when(converted, 1).otherwise(0).alias("event"),
        )
    )
    km = durations.groupBy("t_days").agg(
        F.sum("event").cast("long").alias("d_events"),
        F.count(F.lit(1)).cast("long").alias("n_here"),
    )
    total = durations.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    wprev = Window.orderBy("t_days").rowsBetween(Window.unboundedPreceding, -1)
    wcum = Window.orderBy("t_days").rowsBetween(Window.unboundedPreceding, 0)
    risk = (
        km.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            (
                F.col("n_total")
                - F.coalesce(F.sum("n_here").over(wprev), F.lit(0))
            ).cast("long"),
        )
        .drop("n_total", "n_here")
    )
    absorbed = F.max(
        F.when(F.col("d_events") >= F.col("n_risk"), 1).otherwise(0)
    ).over(wcum)
    logsum = F.sum(
        F.when(
            (F.col("d_events") < F.col("n_risk")) & (F.col("d_events") > 0),
            F.log(1.0 - F.col("d_events") * 1.0 / F.col("n_risk")),
        ).otherwise(0.0)
    ).over(wcum)
    return risk.select(
        "t_days",
        "n_risk",
        "d_events",
        F.when(absorbed == 1, 0.0)
        .otherwise(F.round(F.exp(logsum), 6))
        .alias("survival"),
    )


@query(
    "zipf_fit_tokens",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), vocab AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
        FROM toks GROUP BY token
        ORDER BY freq DESC, token
        LIMIT 1000
    ), ranked AS (
        SELECT freq,
               CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS BIGINT)
                   AS rnk
        FROM vocab
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(regr_slope(ln(freq), ln(rnk)), 6) AS slope,
           ROUND(regr_intercept(ln(freq), ln(rnk)), 6) AS intercept,
           ROUND(regr_r2(ln(freq), ln(rnk)), 6) AS r2
    FROM ranked
    """,
)
def zipf_fit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the top-1000 vocabulary: OLS slope of
    ln(freq) against ln(rank) (natural corpora sit near slope -1; a
    synthetic or templated corpus shows up instantly as a flat or
    kinked fit — a one-row corpus-health gate beside the heavy-hitter
    list).

    Scale shape: explode -> map-side-partial hash-agg to the vocab,
    TakeOrderedAndProject for the top-1000 cut, then the rank window
    and regression aggregate run over exactly 1000 rows — the
    "pre-shrink before any unpartitioned window" pattern again.
    """
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(1000)
    )
    ranked = vocab.select(
        "freq",
        F.row_number()
        .over(Window.orderBy(F.col("freq").desc(), F.col("token")))
        .cast("long")
        .alias("rnk"),
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.expr("regr_slope(ln(freq), ln(rnk))"), 6).alias("slope"),
        F.round(F.expr("regr_intercept(ln(freq), ln(rnk))"), 6).alias(
            "intercept"
        ),
        F.round(F.expr("regr_r2(ln(freq), ln(rnk))"), 6).alias("r2"),
    )


@query(
    "dp_noisy_counts_segments",
    oracle="""
    WITH seg AS (
        SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS true_count
        FROM customer GROUP BY c_mktsegment
    ), seeded AS (
        SELECT segment, true_count,
               ((ascii(segment) * 31 + length(segment)) * 2654435761
                % 1000003 + 1) / 1000005.0 AS u
        FROM seg
    )
    SELECT segment, true_count,
           ROUND(true_count
                 + (-2.0) * CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END
                   * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS noisy_count
    FROM seeded
    """,
)
def dp_noisy_counts_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy release primitive: per-segment counts with
    Laplace(sensitivity/epsilon = 1/0.5 = 2) noise drawn by INVERSE-CDF
    from a deterministic per-key uniform — the seeded twin of a real DP
    mechanism, so the gate can hash-check the noise arithmetic
    bit-for-bit (a production release would swap the hash uniform for a
    secure RNG; ``true_count`` is emitted here only because the gate
    compares engines — a DP release would drop it). Noise composes
    map-side after the aggregate: one hash-agg, then pure per-row math.
    """
    cust = load_table(spark, sf_dir, "customer")
    seg = cust.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("true_count")
    )
    u = (
        (F.ascii("segment") * 31 + F.length("segment")) * F.lit(2654435761)
        % 1000003
        + 1
    ) / F.lit(1000005.0)
    seeded = seg.withColumn("u", u)
    noise = (
        F.lit(-2.0)
        * F.when(F.col("u") >= 0.5, 1.0).otherwise(-1.0)
        * F.log(1.0 - 2.0 * F.abs(F.col("u") - 0.5))
    )
    return seeded.select(
        "segment",
        "true_count",
        F.round(F.col("true_count") + noise, 6).alias("noisy_count"),
    )


# ---------------------------------------------------------------------------
# wave 47: one-scan k-fold cross-validation + multi-touch attribution
# ---------------------------------------------------------------------------


@query(
    "kfold_price_model",
    oracle="""
    WITH folded AS (
        SELECT (l_orderkey * 2654435761 + l_linenumber * 40503) % 5 AS fold,
               CAST(l_quantity AS DOUBLE) AS x,
               l_extendedprice AS y
        FROM lineitem
    ), stats AS (
        SELECT fold,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
        FROM folded GROUP BY fold
    ), tot AS (
        SELECT SUM(n) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
               SUM(sxx) AS sxx, SUM(sxy) AS sxy, SUM(syy) AS syy
        FROM stats
    ), models AS (
        SELECT s.fold, s.n AS n_test,
               ((t.n - s.n) * (t.sxy - s.sxy) - (t.sx - s.sx) * (t.sy - s.sy))
               / ((t.n - s.n) * (t.sxx - s.sxx)
                  - (t.sx - s.sx) * (t.sx - s.sx)) AS b,
               s.sx AS sx, s.sy AS sy, s.sxx AS sxx, s.sxy AS sxy,
               s.syy AS syy,
               (t.sy - s.sy) AS csy, (t.sx - s.sx) AS csx,
               (t.n - s.n) AS cn
        FROM stats s, tot t
    )
    SELECT CAST(fold AS BIGINT) AS fold, n_test,
           ROUND(b, 3) AS slope,
           ROUND((csy - b * csx) / cn, 3) AS intercept,
           ROUND(SQRT(GREATEST(
               (syy - 2 * ((csy - b * csx) / cn) * sy - 2 * b * sxy
                + 2 * ((csy - b * csx) / cn) * b * sx
                + ((csy - b * csx) / cn) * ((csy - b * csx) / cn) * n_test
                + b * b * sxx) / n_test, 0)), 3) AS rmse
    FROM models
    """,
)
def kfold_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation of the linear price model y = a + b·x
    (extended price on quantity) in ONE scan of the fact table: the
    scan produces per-fold sufficient statistics (n, Σx, Σy, Σx²,
    Σxy, Σy²); each fold's TRAINING stats are the algebraic complement
    (total − fold), its coefficients come from the normal equations on
    those complements, and its held-out RMSE expands from the fold's
    OWN stats — E[(y−a−bx)²] is a polynomial in the six sums. No
    per-fold rescans, no 5× data movement: cross-validation cost =
    one aggregate, the way model selection has to work at 100 TB.
    Folds are deterministic multiplicative-hash assignments.

    Scale shape: one map-side-partial hash-agg to 5 rows; everything
    after is constant-size arithmetic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    folded = li.select(
        ((F.col("l_orderkey") * 2654435761 + F.col("l_linenumber") * 40503) % 5)
        .alias("fold"),
        F.col("l_quantity").cast("double").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    stats = folded.groupBy("fold").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    tot = stats.agg(
        F.sum("n").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxx").alias("tsxx"),
        F.sum("sxy").alias("tsxy"),
        F.sum("syy").alias("tsyy"),
    )
    m = stats.crossJoin(F.broadcast(tot))
    cn = F.col("tn") - F.col("n")
    csx = F.col("tsx") - F.col("sx")
    csy = F.col("tsy") - F.col("sy")
    csxx = F.col("tsxx") - F.col("sxx")
    csxy = F.col("tsxy") - F.col("sxy")
    b = (cn * csxy - csx * csy) / (cn * csxx - csx * csx)
    a = (csy - b * csx) / cn
    mse = (
        F.col("syy")
        - 2 * a * F.col("sy")
        - 2 * b * F.col("sxy")
        + 2 * a * b * F.col("sx")
        + a * a * F.col("n")
        + b * b * F.col("sxx")
    ) / F.col("n")
    return m.select(
        F.col("fold").cast("long").alias("fold"),
        F.col("n").alias("n_test"),
        F.round(b, 3).alias("slope"),
        F.round(a, 3).alias("intercept"),
        F.round(F.sqrt(F.greatest(mse, F.lit(0.0))), 3).alias("rmse"),
    )


@query(
    "linear_attribution_purchases",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    ), touches AS (
        SELECT user_id, ts, event_type FROM events
        WHERE event_type IN ('view', 'click')
    ), joined AS (
        SELECT p.event_id, p.value, t.event_type AS channel
        FROM purchases p LEFT JOIN touches t
          ON t.user_id = p.user_id
         AND t.ts <= p.ts
         AND t.ts > p.ts - INTERVAL 3 DAY
    ), credited AS (
        SELECT event_id, value,
               COALESCE(channel, 'unattributed') AS channel,
               COUNT(channel) OVER (PARTITION BY event_id) AS k
        FROM joined
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           ROUND(SUM(CASE WHEN k = 0 THEN value ELSE value / k END), 6)
               AS credited_value
    FROM credited
    GROUP BY channel
    """,
)
def linear_attribution_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase's value is split
    equally across the user's view/click touches in the 3 days before
    it; purchases with no touches report as 'unattributed'. The
    credited-value-per-channel table is how marketing/traffic sources
    get budgeted — and the same pattern attributes training-corpus
    value back to acquisition pipelines.

    Scale shape: the touch join is a user-keyed EQUI-join with a
    residual time-range predicate (never a cross join); the per-purchase
    touch count comes from a window partitioned by purchase id —
    bounded by touches-per-purchase, no global window; final channel
    rollup is a tiny hash-agg.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        "value",
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    joined = purchases.join(
        touches,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("t_ts") > F.col("p_ts") - F.expr("INTERVAL 3 DAY")),
        "left",
    )
    wk = Window.partitionBy("event_id")
    credited = joined.select(
        "event_id",
        "value",
        F.coalesce(F.col("channel"), F.lit("unattributed")).alias("channel"),
        F.count("channel").over(wk).alias("k"),
    )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.round(
            F.sum(
                F.when(F.col("k") == 0, F.col("value")).otherwise(
                    F.col("value") / F.col("k")
                )
            ),
            6,
        ).alias("credited_value"),
    )


# ---------------------------------------------------------------------------
# wave 48: SemDedup cells, temperature mixture, curriculum interleave
# ---------------------------------------------------------------------------


@query(
    "semdedup_embedding_cells",
    oracle="""
    WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    c AS (
        SELECT e AS ce,
               CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
        FROM s WHERE vec_id IN (3, 66, 129, 192, 255, 318, 381, 444)
    ), scored AS (
        SELECT s.vec_id, s.e, c.cell,
               CAST(ROUND(list_cosine_similarity(s.e, c.ce) * 1e6) AS BIGINT)
                   AS sim_ppm
        FROM s CROSS JOIN c
    ), best AS (
        SELECT vec_id, e, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY sim_ppm DESC, cell) AS rn
        FROM scored
    ), assigned AS (
        SELECT vec_id, e, cell FROM best WHERE rn = 1
    ), pair_stats AS (
        SELECT a.cell,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN
                    CAST(ROUND(list_cosine_similarity(a.e, b.e) * 1e6) AS BIGINT)
                    >= 450000 THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
               MAX(CAST(ROUND(list_cosine_similarity(a.e, b.e) * 1e6) AS BIGINT))
                   AS max_cos_ppm
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        GROUP BY a.cell
    )
    SELECT CAST(v.cell AS BIGINT) AS cell,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           COALESCE(MAX(p.n_pairs), 0) AS n_pairs,
           COALESCE(MAX(p.n_dups), 0) AS n_dups,
           COALESCE(MAX(p.max_cos_ppm), -1) AS max_cos_ppm
    FROM assigned v LEFT JOIN pair_stats p ON p.cell = v.cell
    GROUP BY v.cell
    """,
)
def semdedup_embedding_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup (Abbas et al. 2023) shape: semantic near-duplicate
    detection BLOCKED by k-means cells — pairwise cosine runs only
    WITHIN a cell, so the quadratic term is bounded by cluster size,
    never corpus size. Emitted as the per-cell dedup report (vector
    count, pairs scored, pairs over the 0.45-cosine dup threshold, max
    similarity) — the report form is what a curation run reviews before
    committing deletions, and it is never empty even on a corpus with
    no near-dups (this synthetic one's max pairwise cosine is ~0.51).

    Cosine is compared in exact ppm BIGINTs (round(cos*1e6)) so
    cross-engine float noise cannot flip an aggregate.

    Scale shape: assignment is the map-side NumPy matmul of
    ``kmeans_assign``; the within-cell self-join shuffles on the cell
    key only; per-cell pair counts bound memory. At 100 TB you raise k
    so cells stay ~1e4 vectors (SemDedup's own regime).
    """
    from pyspark_movie_recommender_spark.operators.similarity import kmeans_assign

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = kmeans_assign(
        emb, centroid_ids=[3, 66, 129, 192, 255, 318, 381, 444]
    ).select("vec_id", "cell")
    vec = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    ).join(assigned, "vec_id")
    a = vec.select(
        F.col("cell"),
        F.col("vec_id").alias("id_a"),
        F.col("e").alias("ea"),
    )
    b = vec.select(
        F.col("cell"),
        F.col("vec_id").alias("id_b"),
        F.col("e").alias("eb"),
    )
    cos_ppm = F.expr(
        """
        CAST(ROUND(
          aggregate(zip_with(ea, eb, (x, y) -> x * y), CAST(0.0 AS DOUBLE),
                    (acc, x) -> acc + x)
          / (sqrt(aggregate(transform(ea, x -> x * x), CAST(0.0 AS DOUBLE),
                            (acc, x) -> acc + x))
             * sqrt(aggregate(transform(eb, x -> x * x), CAST(0.0 AS DOUBLE),
                              (acc, x) -> acc + x))) * 1e6) AS BIGINT)
        """
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("cell", cos_ppm.alias("cos_ppm"))
    )
    pair_stats = pairs.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("cos_ppm") >= 450000, 1).otherwise(0))
        .cast("long")
        .alias("n_dups"),
        F.max("cos_ppm").alias("max_cos_ppm"),
    )
    cells = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors")
    )
    return (
        cells.join(pair_stats, "cell", "left")
        .select(
            F.col("cell").cast("long").alias("cell"),
            "n_vectors",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_dups", F.lit(0)).alias("n_dups"),
            F.coalesce("max_cos_ppm", F.lit(-1)).alias("max_cos_ppm"),
        )
    )


@query(
    "temperature_mixture_weights",
    oracle="""
    WITH s AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
        FROM documents GROUP BY source
    ), z AS (
        SELECT SUM(POW(n_chars_total, 0.7)) AS z FROM s
    )
    SELECT source, n_docs, n_chars_total,
           ROUND(POW(n_chars_total, 0.7) / z, 6) AS weight,
           CAST(ROUND(POW(n_chars_total, 0.7) / z * 100000) AS BIGINT)
               AS quota_chars_e5
    FROM s, z
    """,
)
def temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (the multilingual-sampling
    formula from mBERT/XLM-R, alpha = 0.7): per-source sampling weight
    proportional to size^alpha, which up-weights small sources and
    tempers head domination — THE standard knob for balancing crawl
    mixtures before training. Emits the weight and a concrete quota for
    a 100k-char budget.

    Scale shape: one map-side-partial hash-agg to |sources| rows, a
    broadcast scalar normalizer, then per-row math. The pow/divide runs
    on identical inputs in both engines so rounding at 1e-6 is stable.
    """
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars_total"),
    )
    z = s.agg(F.sum(F.pow("n_chars_total", 0.7)).alias("z"))
    return (
        s.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_chars_total",
            F.round(F.pow("n_chars_total", 0.7) / F.col("z"), 6).alias("weight"),
            F.round(F.pow("n_chars_total", 0.7) / F.col("z") * 100000)
            .cast("long")
            .alias("quota_chars_e5"),
        )
    )


@query(
    "curriculum_interleave_order",
    oracle="""
    WITH src AS (
        SELECT source,
               CAST(ROW_NUMBER() OVER (ORDER BY source) - 1 AS BIGINT) AS sidx
        FROM (SELECT DISTINCT source FROM documents)
    ), nsrc AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k FROM src
    ), ranked AS (
        SELECT doc_id, source,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY n_chars DESC, doc_id) - 1 AS BIGINT) AS rs
        FROM documents
    )
    SELECT r.doc_id, r.source, r.rs * n.k + s.sidx AS position
    FROM ranked r JOIN src s USING (source) CROSS JOIN nsrc n
    """,
)
def curriculum_interleave_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum construction: a GLOBAL training order that (a) feeds
    higher-quality documents first within each source (quality proxy:
    length) and (b) round-robins across sources so no contiguous run of
    steps sees one source — position = within-source-rank * n_sources +
    source-index, a collision-free integer interleave computed without
    ever globally sorting the corpus. This is how you lay out a 100-TB
    epoch: per-source windows (parallel) plus pure arithmetic, then
    write sorted-within-partitions by position.

    Scale shape: one partitioned window per source + a broadcast
    |sources|-row index map; no global window, no shuffle beyond the
    source partitioning.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    src = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (F.row_number().over(Window.orderBy("source")) - 1)
            .cast("long")
            .alias("sidx"),
        )
    )
    k = src.agg(F.count(F.lit(1)).cast("long").alias("k"))
    ranked = docs.select(
        "doc_id",
        "source",
        (
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.col("n_chars").desc(), F.col("doc_id")
                )
            )
            - 1
        )
        .cast("long")
        .alias("rs"),
    )
    return (
        ranked.join(F.broadcast(src), "source")
        .crossJoin(F.broadcast(k))
        .select(
            "doc_id",
            "source",
            (F.col("rs") * F.col("k") + F.col("sidx")).alias("position"),
        )
    )


# ---------------------------------------------------------------------------
# wave 49: join-size estimation, referential integrity, Benford audit
# ---------------------------------------------------------------------------


@query(
    "join_size_estimate",
    oracle="""
    WITH exact AS (
        SELECT CAST(SUM(a.n * b.n) AS BIGINT) AS exact_pairs
        FROM (SELECT o_custkey AS k, COUNT(*) AS n FROM orders GROUP BY 1) a
        JOIN (SELECT c_custkey AS k, COUNT(*) AS n FROM customer GROUP BY 1) b
          USING (k)
    ), sa AS (
        SELECT o_custkey AS k FROM orders
        WHERE (o_orderkey * 2654435761) % 100 < 10
    ), sb AS (
        SELECT c_custkey AS k FROM customer
        WHERE (c_custkey * 40503) % 100 < 50
    ), est AS (
        SELECT CAST(COUNT(*) * 100 / 10 * 100 / 50 AS BIGINT) AS est_pairs
        FROM sa JOIN sb USING (k)
    )
    SELECT exact_pairs, est_pairs,
           CAST(ROUND(ABS(est_pairs - exact_pairs) * 1000000.0
                      / exact_pairs) AS BIGINT) AS err_ppm
    FROM exact, est
    """,
)
def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation by deterministic Bernoulli sampling —
    the statistic a cost-based optimizer needs before picking a join
    strategy: |A ⋈ B| estimated from a 10% sample of the fact side and
    a 50% sample of the dim side, scaled by 1/(p·q), next to the exact
    count (per-key count-product aggregate, never a materialized join)
    and the relative error in ppm. Deterministic multiplicative-hash
    samples make the estimate reproducible and gate-checkable.

    Scale shape: the exact side is two hash-aggs + a key join on
    pre-aggregated counts (|keys| rows, not |rows|); the sampled side
    filters map-side THEN joins — both asymptotically cheaper than the
    join being estimated.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    a = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    b = cust.groupBy(F.col("c_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_b")
    )
    exact = a.join(b, "k").agg(
        F.sum(F.col("n_a") * F.col("n_b")).cast("long").alias("exact_pairs")
    )
    sa = orders.filter((F.col("o_orderkey") * 2654435761) % 100 < 10).select(
        F.col("o_custkey").alias("k")
    )
    sb = cust.filter((F.col("c_custkey") * 40503) % 100 < 50).select(
        F.col("c_custkey").alias("k")
    )
    est = sa.join(sb, "k").agg(
        (F.count(F.lit(1)) * 100 / 10 * 100 / 50).cast("long").alias("est_pairs")
    )
    return exact.crossJoin(est).select(
        "exact_pairs",
        "est_pairs",
        F.round(
            F.abs(F.col("est_pairs") - F.col("exact_pairs"))
            * 1000000.0
            / F.col("exact_pairs")
        )
        .cast("long")
        .alias("err_ppm"),
    )


@query(
    "referential_integrity_audit",
    oracle="""
    SELECT 'orders.o_custkey->customer' AS fk,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
               AS n_orphans,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey)) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT),
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT)
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across the star schema: for each FK
    edge, how many child rows reference a missing parent — the
    cross-TABLE data-quality gate beside the per-column
    `profile_orders_columns` / expectations reports. Run it after every
    ingest; a nonzero count means an upstream extractor dropped parents
    or the load raced.

    Scale shape: each FK check is a LEFT ANTI join (Catalyst lowers the
    NOT EXISTS to the same) that shuffles only the key column; parent
    sides are dims (broadcast) except orders, which co-partitions with
    lineitem on the order key. Four checks union into one 4-row report.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")

    def audit(fk_name, child, child_key, parent, parent_key):
        orphans = child.join(
            parent, child[child_key] == parent[parent_key], "left_anti"
        ).agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
        total = child.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        return orphans.crossJoin(total).select(
            F.lit(fk_name).alias("fk"), "n_orphans", "n_rows"
        )

    return (
        audit("orders.o_custkey->customer", orders, "o_custkey", cust, "c_custkey")
        .unionByName(
            audit("lineitem.l_orderkey->orders", li, "l_orderkey", orders,
                  "o_orderkey")
        )
        .unionByName(
            audit("lineitem.l_partkey->part", li, "l_partkey", part, "p_partkey")
        )
        .unionByName(
            audit("customer.c_nationkey->nation", cust, "c_nationkey", nation,
                  "n_nationkey")
        )
    )


@query(
    "benford_first_digit_audit",
    oracle="""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                          1, 1) AS BIGINT) AS d
        FROM orders WHERE o_totalprice >= 1
    ), counts AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY d
    ), tot AS (
        SELECT SUM(n) AS t FROM counts
    )
    SELECT d, n,
           ROUND(n * 1.0 / t, 6) AS observed,
           ROUND(log10(1.0 + 1.0 / d), 6) AS expected,
           ROUND((n * 1.0 / t - log10(1.0 + 1.0 / d))
                 * (n * 1.0 / t - log10(1.0 + 1.0 / d))
                 / log10(1.0 + 1.0 / d), 6) AS chi2_term
    FROM counts, tot
    """,
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed
    leading-digit frequencies against the log10(1+1/d) law, with
    per-digit chi-square terms. Natural multiplicative data follows
    Benford; synthetic/fabricated/truncated data deviates loudly — a
    one-scan forensic gate for ingested numeric columns (this corpus's
    uniform-ish synthetic prices deviate by construction, which is
    exactly what the audit should report).

    Scale shape: leading digit extracted map-side from the integer
    part; one hash-agg to <=9 rows; constants thereafter.
    """
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("string"), 1, 1
        )
        .cast("long")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = counts.agg(F.sum("n").alias("t"))
    obs = F.col("n") * 1.0 / F.col("t")
    exp = F.log10(1.0 + 1.0 / F.col("d"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        F.round(obs, 6).alias("observed"),
        F.round(exp, 6).alias("expected"),
        F.round((obs - exp) * (obs - exp) / exp, 6).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# wave 50: collocation mining, RFM segmentation, nearest-event as-of
# ---------------------------------------------------------------------------


@query(
    "pmi_bigram_collocations",
    oracle="""
    WITH toks AS (
        SELECT CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(lower(trim(text)), '\\s+') END AS t
        FROM documents
    ), uc AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ), tot AS (
        SELECT SUM(c) AS n FROM uc
    ), bi AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab
        FROM (
            SELECT t[g.i] AS a, t[g.i + 1] AS b
            FROM toks,
                 LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
        ) GROUP BY a, b HAVING COUNT(*) >= 5
    )
    SELECT a, b, c_ab, ROUND(ln((CAST(c_ab AS DOUBLE) * n) / (CAST(ua.c AS DOUBLE) * ub.c)), 6) AS pmi
    FROM bi JOIN uc ua ON ua.w = bi.a JOIN uc ub ON ub.w = bi.b, tot
    ORDER BY (CAST(c_ab AS DOUBLE) * n) / (CAST(ua.c AS DOUBLE) * ub.c) DESC, a, b
    LIMIT 20
    """,
)
def pmi_bigram_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-token bigram collocations by pointwise mutual
    information, min support 5 — the phrase-mining pass (tokenizer merge
    candidates, stopword-phrase discovery) over the corpus.

    PMI = ln(c(ab)·N / (c(a)·c(b))) with N = total token occurrences.
    Ordering is done on the raw double ratio (pure IEEE mul/div of exact
    BIGINTs — engine-identical), not the rounded log, so the top-k is
    stable across engines; ties break on the token pair.

    Scale shape: bigrams enumerated map-side inside the row (transform
    over sequence — no self-join, no shuffle to form pairs); two hash
    aggs whose key spaces are vocab and vocab² bounded by min-support;
    unigram side joined twice (vocab-sized, broadcast at corpus scale);
    TakeOrdered top-k. No corpus-sized shuffle anywhere.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(ws_tokens(F.lower(F.col("text"))).alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = uni.agg(F.sum("c").alias("n"))
    bi = (
        toks.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1),"
                    " i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))"
                    " ELSE array() END"
                )
            ).alias("bg")
        )
        .select("bg.a", "bg.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= 5)
    )
    ua = uni.select(F.col("w").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("b"), F.col("c").alias("c_b"))
    ratio = (F.col("c_ab").cast("double") * F.col("n")) / (
        F.col("c_a").cast("double") * F.col("c_b")
    )
    return (
        bi.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(tot))
        .orderBy(ratio.desc(), "a", "b")
        .limit(20)
        .select("a", "b", "c_ab", F.round(F.log(ratio), 6).alias("pmi"))
    )


@query(
    "rfm_customer_segments",
    oracle="""
    WITH cust AS (
        SELECT o_custkey AS custkey,
               date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                         (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders)) AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
        FROM orders GROUP BY o_custkey
    ), scored AS (
        SELECT NTILE(4) OVER (ORDER BY recency_days ASC, custkey) AS r,
               NTILE(4) OVER (ORDER BY freq DESC, custkey) AS f,
               NTILE(4) OVER (ORDER BY monetary_cents DESC, custkey) AS m,
               monetary_cents
        FROM cust
    )
    SELECT r, f, m, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents
    FROM scored GROUP BY r, f, m
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) quartile segmentation — the
    classic customer-value census. r/f/m = NTILE(4) with r1 = most
    recent, f1 = most frequent, m1 = highest spend; output is the
    64-cell-max segment census with exact BIGINT cents.

    Scale shape: the fact collapses to one row per customer in a single
    map-side-partial hash agg; the three ntiles run over the customer
    summary (dimension-sized, not fact-sized) and share one single-
    partition sort exchange; final agg is 64 rows. At extreme customer
    counts the ntile cut points would swap to approx percentiles — the
    exact form here is the checkable spec. Tie-breaks on custkey make
    every quartile boundary deterministic.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("monetary_cents"),
    )
    maxd = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("maxd"))
    cust = cust.crossJoin(F.broadcast(maxd)).select(
        "custkey",
        F.datediff("maxd", "last_order").alias("recency_days"),
        "freq",
        "monetary_cents",
    )
    w = Window.orderBy
    scored = cust.select(
        F.ntile(4).over(w(F.asc("recency_days"), F.asc("custkey"))).alias("r"),
        F.ntile(4).over(w(F.desc("freq"), F.asc("custkey"))).alias("f"),
        F.ntile(4).over(w(F.desc("monetary_cents"), F.asc("custkey"))).alias("m"),
        "monetary_cents",
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("monetary_cents").cast("long").alias("segment_cents"),
    )


@query(
    "asof_nearest_event",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, epoch_us(ts) AS pt
        FROM events WHERE event_type = 'purchase'
    ), v AS (
        SELECT user_id, epoch_us(ts) AS vt FROM events WHERE event_type = 'view'
    ), b AS (
        SELECT p.event_id, MAX(v.vt) AS prev_vt
        FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.vt <= p.pt
        GROUP BY p.event_id
    ), f AS (
        SELECT p.event_id, MIN(v.vt) AS next_vt
        FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.vt >= p.pt
        GROUP BY p.event_id
    )
    SELECT p.event_id, p.user_id,
           CASE WHEN prev_vt IS NULL AND next_vt IS NULL THEN 'none'
                WHEN next_vt IS NULL THEN 'prev'
                WHEN prev_vt IS NULL THEN 'next'
                WHEN p.pt - prev_vt <= next_vt - p.pt THEN 'prev'
                ELSE 'next' END AS nearest_dir,
           CASE WHEN prev_vt IS NULL AND next_vt IS NULL THEN NULL
                WHEN next_vt IS NULL THEN p.pt - prev_vt
                WHEN prev_vt IS NULL THEN next_vt - p.pt
                ELSE LEAST(p.pt - prev_vt, next_vt - p.pt) END AS gap_us
    FROM p JOIN b ON b.event_id = p.event_id JOIN f ON f.event_id = p.event_id
    """,
)
def asof_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join, BOTH directions: for every purchase,
    the temporally closest view by the same user (preceding or
    following), ties to the preceding one. Completes the as-of family
    (backward `asof_join_purchases`, forward `asof_forward_next_purchase`)
    with the symmetric nearest-neighbour variant sensor/order-book
    alignment needs.

    Engine: ONE shuffle on user_id — views and purchases ride the same
    RANGE-framed window (ordered by microsecond epoch) where
    `last(view_ts) ignore nulls` over (-inf, 0] gives the nearest
    preceding view and `first(view_ts) ignore nulls` over [0, +inf) the
    nearest following; frames are RANGE (value) based so rows tied on
    ts agree with the oracle's pure ts-inequality semantics no matter
    the intra-tie row order. The oracle is the naive inequality-join
    formulation — agreement proves the single-pass window form exact.
    All gaps are BIGINT microseconds.

    Scale shape: no pair explosion (the naive join is oracle-only);
    state per row is two BIGINTs; AQE handles hot users.
    """
    from pyspark_movie_recommender_spark.operators.asof import asof_nearest

    ev = load_table(spark, sf_dir, "events")
    # NTZ fixture timestamps: cast through LTZ (session TZ is UTC in tests)
    # so unix_micros matches the oracle's epoch_us over naive timestamps
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", us.alias("t")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", us.alias("t")
    )
    return asof_nearest(purchases, views, on="t", key="user_id").select(
        "event_id", "user_id", "nearest_dir", F.col("gap").alias("gap_us")
    )


# ---------------------------------------------------------------------------
# wave 51: corpus keyness, n-gram diversity, pure-SQL naive Bayes
# ---------------------------------------------------------------------------


@query(
    "g2_keyness_sources",
    oracle="""
    WITH toks AS (
        SELECT CAST(substr(source, 4) AS INT) % 2 AS grp,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(lower(trim(text)), '\\s+') END AS t
        FROM documents
    ), tc AS (
        SELECT w,
               CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
        FROM (SELECT grp, unnest(t) AS w FROM toks) GROUP BY w
    ), tot AS (
        SELECT SUM(a) AS na, SUM(b) AS nb FROM tc
    )
    SELECT w, a, b,
           CASE WHEN a * nb > b * na THEN 'A' ELSE 'B' END AS leans,
           ROUND(2.0 * (
               CASE WHEN a > 0 THEN a * ln(CAST(a AS DOUBLE)
                    / (na * (CAST(a + b AS DOUBLE) / (na + nb)))) ELSE 0.0 END
             + CASE WHEN b > 0 THEN b * ln(CAST(b AS DOUBLE)
                    / (nb * (CAST(a + b AS DOUBLE) / (na + nb)))) ELSE 0.0 END
           ), 6) AS g2
    FROM tc, tot
    WHERE a + b >= 20
    """,
)
def g2_keyness_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-likelihood (G², Dunning 1993) keyness of every token with
    corpus frequency >= 20 between two crawl halves (even- vs
    odd-numbered sources) — the corpus-comparison statistic behind
    'which words distinguish crawl A from crawl B', used to audit
    ingest drift between two acquisitions of nominally-the-same web
    data. `leans` marks the over-represented side via exact BIGINT
    cross-multiplication (a·Nb vs b·Na) so the direction never rides a
    float ratio.

    Scale shape: one explode into a (token → two partial counts) hash
    agg (map-side combine collapses occurrences before the shuffle);
    totals are a 1-row broadcast; G² itself is a map-side expression on
    the vocab-sized relation. All rows returned (no top-k), so no
    cross-engine float-ordering hazard — the gate sorts rows itself.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        (F.substring("source", 4, 10).cast("int") % 2).alias("grp"),
        ws_tokens(F.lower(F.col("text"))).alias("t"),
    )
    tc = (
        toks.select("grp", F.explode("t").alias("w"))
        .groupBy("w")
        .agg(
            F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("a"),
            F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("b"),
        )
    )
    tot = tc.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    a, b = F.col("a"), F.col("b")
    na, nb = F.col("na"), F.col("nb")
    ea = na * ((a + b).cast("double") / (na + nb))
    eb = nb * ((a + b).cast("double") / (na + nb))
    g2 = 2.0 * (
        F.when(a > 0, a * F.log(a.cast("double") / ea)).otherwise(F.lit(0.0))
        + F.when(b > 0, b * F.log(b.cast("double") / eb)).otherwise(F.lit(0.0))
    )
    return (
        tc.filter(a + b >= 20)
        .crossJoin(F.broadcast(tot))
        .select(
            "w",
            "a",
            "b",
            F.when(a * nb > b * na, "A").otherwise("B").alias("leans"),
            F.round(g2, 6).alias("g2"),
        )
    )


@query(
    "ngram_diversity_ratio",
    oracle="""
    WITH toks AS (
        SELECT source,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(lower(trim(text)), '\\s+') END AS t
        FROM documents
    ), grams AS (
        SELECT source,
               t[g.i] || ' ' || t[g.i + 1] || ' ' || t[g.i + 2] || ' ' || t[g.i + 3] AS gram
        FROM toks,
             LATERAL (SELECT unnest(generate_series(1, len(t) - 3)) AS i) g
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct,
           CAST(COUNT(DISTINCT gram) * 1000000 // COUNT(*) AS BIGINT) AS diversity_ppm
    FROM grams GROUP BY source
    """,
)
def ngram_diversity_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source 4-gram diversity (distinct/total in exact ppm) — the
    self-repetition audit for generated or templated corpora: a source
    whose distinct-4-gram ratio collapses is emitting boilerplate or
    model-generated loops (the distinct-n-gram metric of self-BLEU
    fame), and should be down-weighted in the training mixture.

    Scale shape: 4-grams enumerated map-side inside the row (transform
    over sequence, no join); COUNT(DISTINCT) expands to a two-phase
    (source, gram) partial-dedup agg → per-source count, so the shuffle
    carries distinct grams, not occurrences; result is |sources| rows of
    pure BIGINT arithmetic.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", ws_tokens(F.lower(F.col("text"))).alias("t"))
    grams = toks.select(
        "source",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 4 THEN transform(sequence(1, size(t) - 3),"
                " i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1),"
                " element_at(t, i + 2), element_at(t, i + 3)))"
                " ELSE array() END"
            )
        ).alias("gram"),
    )
    return (
        grams.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.countDistinct("gram").cast("long").alias("n_distinct"),
        )
        .select(
            "source",
            "n_grams",
            "n_distinct",
            F.expr("n_distinct * 1000000L div n_grams").alias("diversity_ppm"),
        )
    )


@query(
    "naive_bayes_lang_confusion",
    bench=True,
    oracle="""
    WITH split AS (
        SELECT doc_id, lang,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(lower(trim(text)), '\\s+') END AS t,
               ((doc_id * 2654435761) % 4294967296) % 100 AS bucket
        FROM documents
    ),
    train_tok AS (
        SELECT lang, unnest(t) AS w FROM split WHERE bucket < 80
    ),
    counts AS (
        SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM train_tok GROUP BY lang, w
    ),
    n_lang AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_l FROM train_tok GROUP BY lang
    ),
    vocab AS (
        SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM train_tok
    ),
    priors AS (
        SELECT lang,
               CAST(ROUND(ln(CAST(COUNT(*) AS DOUBLE)
                   / (SELECT COUNT(*) FROM split WHERE bucket < 80)) * 1000000)
                   AS BIGINT) AS prior_unats
        FROM split WHERE bucket < 80 GROUP BY lang
    ),
    test_tok AS (
        SELECT doc_id, lang AS true_lang, w, CAST(COUNT(*) AS BIGINT) AS k
        FROM (SELECT doc_id, lang, unnest(t) AS w FROM split WHERE bucket >= 80)
        GROUP BY doc_id, lang, w
    ),
    scored AS (
        SELECT tt.doc_id, tt.true_lang, nl.lang AS cand,
               SUM(tt.k * CAST(ROUND(ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)
                   / (nl.n_l + vocab.v)) * 1000000) AS BIGINT)) AS tok_unats
        FROM test_tok tt
        CROSS JOIN n_lang nl
        CROSS JOIN vocab
        LEFT JOIN counts c ON c.lang = nl.lang AND c.w = tt.w
        GROUP BY tt.doc_id, tt.true_lang, nl.lang
    ),
    ranked AS (
        SELECT true_lang, cand,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id
                   ORDER BY tok_unats + p.prior_unats DESC, cand) AS rn
        FROM scored JOIN priors p ON p.lang = scored.cand
    )
    SELECT true_lang, cand AS pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM ranked WHERE rn = 1 GROUP BY true_lang, cand
    """,
)
def naive_bayes_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes language identification, trained AND
    applied entirely in relational algebra: Laplace-smoothed per-language
    token log-probabilities learned on the deterministic 80% hash split
    (same Knuth multiplicative hash as `deterministic_hash_split`),
    argmax-scored on the held-out 20%, reported as a confusion matrix.
    The statistical twin of the rule-based `language_id_heuristic`.

    Every log-probability is quantized to BIGINT micro-nats
    (round(ln·10⁶)) BEFORE summation, so per-document scores are exact
    integer sums — immune to float summation-order divergence between
    engines — and the argmax (ties → lexicographic language) is
    hash-stable. Model quality is what a unigram NB earns; the point is
    the shape: train = two hash aggs (vocab×langs and langs), apply =
    token-keyed join of test tokens against the model, doc-keyed agg,
    5-row-per-doc window argmax.

    Scale shape: the model relation is vocab×|langs| and broadcasts; the
    only data-sized shuffles are the (lang,w) training agg and the
    per-doc scoring agg. Nothing quadratic, no UDFs, no driver loop.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        ws_tokens(F.lower(F.col("text"))).alias("t"),
        (((F.col("doc_id") * 2654435761) % 4294967296) % 100).alias("bucket"),
    )
    train = docs.filter(F.col("bucket") < 80)
    test = docs.filter(F.col("bucket") >= 80)

    train_tok = train.select("lang", F.explode("t").alias("w"))
    counts = train_tok.groupBy("lang", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n_lang = train_tok.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_l"))
    vocab = train_tok.agg(F.countDistinct("w").cast("long").alias("v"))
    d_tot = train.agg(F.count(F.lit(1)).cast("long").alias("d_tot"))
    priors = (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("d_l"))
        .crossJoin(F.broadcast(d_tot))
        .select(
            "lang",
            F.round(F.log(F.col("d_l").cast("double") / F.col("d_tot")) * 1000000)
            .cast("long")
            .alias("prior_unats"),
        )
    )

    test_tok = (
        test.select("doc_id", F.col("lang").alias("true_lang"), F.explode("t").alias("w"))
        .groupBy("doc_id", "true_lang", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    cand = n_lang.select(F.col("lang").alias("cand"), "n_l")
    model = counts.select(F.col("lang").alias("cand"), "w", "c")
    lp = (
        F.round(
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                / (F.col("n_l") + F.col("v"))
            )
            * 1000000
        )
        .cast("long")
    )
    scored = (
        test_tok.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(vocab))
        .join(F.broadcast(model), ["cand", "w"], "left")
        .select("doc_id", "true_lang", "cand", (F.col("k") * lp).alias("wu"))
        .groupBy("doc_id", "true_lang", "cand")
        .agg(F.sum("wu").alias("tok_unats"))
        .join(
            F.broadcast(priors.select(F.col("lang").alias("cand"), "prior_unats")),
            "cand",
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        (F.col("tok_unats") + F.col("prior_unats")).desc(), F.asc("cand")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("true_lang", F.col("cand").alias("pred_lang"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# wave 52: time-series statistics — ACF, CUSUM changepoint, trend tests
# ---------------------------------------------------------------------------


@query(
    "acf_daily_event_value",
    oracle="""
    WITH pts AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ), bounds AS (
        SELECT MIN(day) AS lo, MAX(day) AS hi FROM pts
    ), grid AS (
        SELECT unnest(generate_series(lo, hi)) AS day FROM bounds
    ), daily AS (
        SELECT g.day, COALESCE(SUM(p.cents), 0) AS x,
               ROW_NUMBER() OVER (ORDER BY g.day) AS i
        FROM grid g LEFT JOIN pts p ON p.day = g.day GROUP BY g.day
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s FROM daily
    ), dev AS (
        SELECT i, CAST(n * x - s AS HUGEINT) AS d FROM daily, stats
    ), den AS (
        SELECT SUM(d * d) AS dd FROM dev
    ), lags AS (
        SELECT unnest(generate_series(1, 7)) AS lag
    )
    SELECT lag,
           ROUND(CAST(SUM(a.d * b.d) AS DOUBLE) / CAST(den.dd AS DOUBLE), 6) AS acf
    FROM lags JOIN dev a ON TRUE JOIN dev b ON b.i = a.i - lag, den
    GROUP BY lag, den.dd
    """,
)
def acf_daily_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (lags 1-7) of the zero-filled daily
    event-value series — the seasonality detector behind 'does this
    metric have a weekly cycle', feeding resampling/forecast choices.

    Exactness: deviations are computed as n·x_t − Σx (pure BIGINT — the
    n² normalization cancels in the ACF ratio), products and their sums
    in 38-digit decimals, so both engines produce bit-identical
    numerators/denominators regardless of summation order; only the
    final single division is floating point. Missing days are zero
    revenue via a generated calendar grid, keeping lag alignment honest
    across gaps.

    Scale shape: the fact collapses to |days| rows in one hash agg; the
    grid, lag self-join, and ACF aggregation all run on that tiny series
    relation. At 100 TB the day-grid is still just thousands of rows.
    """
    from pyspark_movie_recommender_spark.operators.timeseries import (
        epoch_day,
        mean_cleared_devs,
        zero_filled_daily_grid,
    )

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        epoch_day("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    daily = zero_filled_daily_grid(
        pts, F.coalesce(F.sum("cents"), F.lit(0)).cast("long")
    ).select("day", "x", F.row_number().over(Window.orderBy("day")).alias("i"))
    dev = mean_cleared_devs(daily).select("i", "d")
    den = dev.agg(F.sum(F.col("d") * F.col("d")).alias("dd"))
    lags = spark.range(1, 8).select(F.col("id").cast("long").alias("lag"))
    pairs = (
        lags.crossJoin(dev.select(F.col("i").alias("ai"), F.col("d").alias("ad")))
        .join(
            dev.select(F.col("i").alias("bi"), F.col("d").alias("bd")),
            F.col("bi") == F.col("ai") - F.col("lag"),
        )
        .groupBy("lag")
        .agg(F.sum(F.col("ad") * F.col("bd")).alias("num"))
    )
    return pairs.crossJoin(F.broadcast(den)).select(
        "lag",
        F.round(
            F.col("num").cast("double") / F.col("dd").cast("double"), 6
        ).alias("acf"),
    )


@query(
    "cusum_changepoint_daily",
    oracle="""
    WITH pts AS (
        SELECT event_type,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        FROM events
    ), bounds AS (
        SELECT MIN(day) AS lo, MAX(day) AS hi FROM pts
    ), grid AS (
        SELECT et.event_type, g.day
        FROM (SELECT DISTINCT event_type FROM pts) et,
             (SELECT unnest(generate_series(lo, hi)) AS day FROM bounds) g
    ), daily AS (
        SELECT g.event_type, g.day,
               CAST(COUNT(p.day) AS BIGINT) AS x
        FROM grid g LEFT JOIN pts p
          ON p.event_type = g.event_type AND p.day = g.day
        GROUP BY g.event_type, g.day
    ), stats AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s
        FROM daily GROUP BY event_type
    ), cusum AS (
        SELECT d.event_type, d.day,
               SUM(st.n * d.x - st.s) OVER (
                   PARTITION BY d.event_type ORDER BY d.day) AS c
        FROM daily d JOIN stats st ON st.event_type = d.event_type
    ), ranked AS (
        SELECT event_type, day, c,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY ABS(c) DESC, day) AS rn
        FROM cusum
    )
    SELECT event_type, day AS change_day, CAST(c AS BIGINT) AS cusum_n_scaled
    FROM ranked WHERE rn = 1
    """,
)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint locator per event type: the day where the
    running sum of mean-deviations of the zero-filled daily count series
    peaks in magnitude — the classic single-changepoint estimator for
    'when did this metric shift level' (deploy regressions, logging
    changes, traffic steps).

    Exactness: deviations are n·x_t − Σx (BIGINT; the n scaling is
    reported as-is and documented, so no division ever happens), the
    running sum is an exact integer window, and the argmax breaks ties
    on the earlier day — fully hash-stable.

    Scale shape: fact → |types|×|days| hash agg; calendar grid generated
    from a 1-row bounds agg; window and argmax run on the tiny series
    relation partitioned by type.
    """
    from pyspark_movie_recommender_spark.operators.timeseries import (
        epoch_day,
        mean_cleared_devs,
        zero_filled_daily_grid,
    )

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select("event_type", epoch_day("ts").alias("day")).withColumn(
        "hit", F.lit(1)
    )
    daily = zero_filled_daily_grid(
        pts, F.count("hit").cast("long"), keys=["event_type"]
    )
    cusum = mean_cleared_devs(daily, keys=["event_type"]).select(
        "event_type",
        "day",
        F.sum("d")
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("c"),
    )
    ranked = cusum.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.abs("c").desc(), F.asc("day"))
        ),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "event_type",
        F.col("day").alias("change_day"),
        F.col("c").cast("long").alias("cusum_n_scaled"),
    )


@query(
    "mann_kendall_trend",
    oracle="""
    WITH pts AS (
        SELECT event_type,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ), daily AS (
        SELECT event_type, day, CAST(SUM(cents) AS BIGINT) AS x
        FROM pts GROUP BY event_type, day
    ), pairs AS (
        SELECT a.event_type,
               CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn,
               CAST(b.x - a.x AS DOUBLE) / (b.day - a.day) AS slope
        FROM daily a JOIN daily b
          ON b.event_type = a.event_type AND b.day > a.day
    )
    SELECT event_type,
           CAST(SUM(sgn) AS BIGINT) AS mk_s,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(quantile_cont(slope, 0.5), 6) AS theil_sen_cents_per_day
    FROM pairs GROUP BY event_type
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test statistic S plus the Theil-Sen slope
    estimator per event type over the daily value series — the robust
    (outlier-immune, distribution-free) monotonic-trend detector used on
    operational metrics where OLS is wrecked by spikes.

    S = Σ_{i<j} sign(x_j − x_i) is pure BIGINT counting. The Theil-Sen
    slope is the exact interpolated median of all pairwise slopes; each
    slope is one IEEE division of exact integers, so the sorted slope
    multiset is engine-identical and the median deterministic.

    Scale shape: the fact collapses to the |types|×|days| daily relation
    FIRST; the pairwise self-join is days²-bounded per type (series
    length, never event count) — for longer horizons the documented
    swap is bucketing days into epochs before pairing. No window over
    the raw facts, no UDFs.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.expr("unix_micros(CAST(ts AS timestamp_ltz)) div 86400000000")
            .cast("long")
            .alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").cast("long").alias("x"))
    )
    a = daily.select(
        "event_type", F.col("day").alias("ad"), F.col("x").alias("ax")
    )
    b = daily.select(
        "event_type", F.col("day").alias("bd"), F.col("x").alias("bx")
    )
    pairs = a.join(b, "event_type").filter(F.col("bd") > F.col("ad")).select(
        "event_type",
        F.when(F.col("bx") > F.col("ax"), 1)
        .when(F.col("bx") < F.col("ax"), -1)
        .otherwise(0)
        .alias("sgn"),
        (
            (F.col("bx") - F.col("ax")).cast("double") / (F.col("bd") - F.col("ad"))
        ).alias("slope"),
    )
    return pairs.groupBy("event_type").agg(
        F.sum("sgn").cast("long").alias("mk_s"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.expr("percentile(slope, 0.5)"), 6).alias("theil_sen_cents_per_day"),
    )


# ---------------------------------------------------------------------------
# wave 53: mutual information, bigram LM surprisal, deterministic bootstrap
# ---------------------------------------------------------------------------


@query(
    "mutual_information_type_segment",
    oracle="""
    WITH joint AS (
        SELECT e.event_type, c.c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_ij
        FROM events e JOIN customer c ON c.c_custkey = e.user_id
        GROUP BY e.event_type, c.c_mktsegment
    ), mi AS (
        SELECT j.event_type, j.segment, j.n_ij,
               CAST(SUM(j.n_ij) OVER () AS BIGINT) AS n,
               CAST(SUM(j.n_ij) OVER (PARTITION BY j.event_type) AS BIGINT) AS n_i,
               CAST(SUM(j.n_ij) OVER (PARTITION BY j.segment) AS BIGINT) AS n_j
        FROM joint j
    )
    SELECT event_type, segment, n_ij,
           ROUND((CAST(n_ij AS DOUBLE) / n)
                 * ln((CAST(n_ij AS DOUBLE) * n) / (CAST(n_i AS DOUBLE) * n_j)), 6)
               AS mi_contrib
    FROM mi
    """,
)
def mutual_information_type_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and the acting customer's
    market segment, reported as the per-cell contribution matrix
    (Σ cells = I(X;Y)) — the dependence detector for 'is behaviour
    segment-conditioned', used for feature selection and leakage checks
    before training on joined features.

    All counts are exact BIGINTs; each cell does one ln of a rational
    built from those counts and one division — no float accumulations,
    no top-k, so no cross-engine ordering hazard (≤ |types|·|segments|
    rows, the gate sorts them).

    Scale shape: fact joins the customer dim (broadcast at real scale),
    collapses to the |types|×|segments| contingency table in one hash
    agg with map-side combine; the three marginal windows run on that
    tiny table.
    """
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    joint = (
        ev.join(
            F.broadcast(cust.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")),
            "user_id",
        )
        .groupBy("event_type", F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_ij"))
    )
    w_all = Window.partitionBy()
    w_i = Window.partitionBy("event_type")
    w_j = Window.partitionBy("segment")
    mi = joint.select(
        "event_type",
        "segment",
        "n_ij",
        F.sum("n_ij").over(w_all).cast("long").alias("n"),
        F.sum("n_ij").over(w_i).cast("long").alias("n_i"),
        F.sum("n_ij").over(w_j).cast("long").alias("n_j"),
    )
    return mi.select(
        "event_type",
        "segment",
        "n_ij",
        F.round(
            (F.col("n_ij").cast("double") / F.col("n"))
            * F.log(
                (F.col("n_ij").cast("double") * F.col("n"))
                / (F.col("n_i").cast("double") * F.col("n_j"))
            ),
            6,
        ).alias("mi_contrib"),
    )


@query(
    "bigram_lm_surprisal",
    bench=True,
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(lower(trim(text)), '\\s+') END AS t
        FROM documents
    ), bi AS (
        SELECT doc_id, lang, t[g.i] AS a, t[g.i + 1] AS b
        FROM toks,
             LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
    ), bc AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab FROM bi GROUP BY a, b
    ), uc AS (
        SELECT a, CAST(COUNT(*) AS BIGINT) AS c_a FROM bi GROUP BY a
    ), vocab AS (
        SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
        FROM (SELECT unnest(t) AS w FROM toks)
    ), scored AS (
        SELECT bi.doc_id, bi.lang,
               CAST(ROUND(-ln(CAST(bc.c_ab + 1 AS DOUBLE) / (uc.c_a + vocab.v))
                    * 1000000) AS BIGINT) AS unats
        FROM bi JOIN bc ON bc.a = bi.a AND bc.b = bi.b
                JOIN uc ON uc.a = bi.a
                CROSS JOIN vocab
    )
    SELECT doc_id, lang,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(unats) // COUNT(*) AS BIGINT) AS mean_surprisal_unats
    FROM scored GROUP BY doc_id, lang
    """,
)
def bigram_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram surprisal −ln p(w_i | w_{i−1}) under the
    corpus's own Laplace-smoothed bigram LM — the sequence-aware quality
    scorer beside `unigram_logprob_quality`: word-salad documents whose
    unigrams look fine light up here because their TRANSITIONS are
    improbable.

    Each conditional log-probability is quantized to BIGINT micro-nats
    before aggregation, so per-doc sums and the integer-division mean
    are exact and summation-order-proof across engines.

    Scale shape: bigrams enumerated map-side in-row; the LM is two hash
    aggs (bigram and unigram-context counts) re-joined to the bigram
    stream on their natural keys — vocab-sized sides that broadcast at
    corpus scale; final agg is per-doc. No UDFs, no windows over the
    corpus.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", ws_tokens(F.lower(F.col("text"))).alias("t")
    )
    bi = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))"
                " ELSE array() END"
            )
        ).alias("bg"),
    ).select("doc_id", "lang", "bg.a", "bg.b")
    bc = bi.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    uc = bi.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("c_a"))
    vocab = toks.select(F.explode("t").alias("w")).agg(
        F.countDistinct("w").cast("long").alias("v")
    )
    unats = (
        F.round(
            -F.log(
                (F.col("c_ab") + 1).cast("double") / (F.col("c_a") + F.col("v"))
            )
            * 1000000
        )
        .cast("long")
    )
    scored = (
        bi.join(F.broadcast(bc), ["a", "b"])
        .join(F.broadcast(uc), "a")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", "lang", unats.alias("unats"))
    )
    return (
        scored.groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("unats").alias("su"),
        )
        .select(
            "doc_id",
            "lang",
            "n_bigrams",
            F.expr("su div n_bigrams").cast("long").alias("mean_surprisal_unats"),
        )
    )


@query(
    "bootstrap_ci_order_value",
    oracle="""
    WITH w AS (
        SELECT b.b, o.o_orderkey,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
               ((o.o_orderkey * 2654435761 + b.b * 40503) % 4294967296) % 3 AS wt
        FROM orders o,
             (SELECT unnest(generate_series(0, 99)) AS b) b
    ), means AS (
        SELECT b,
               CAST(SUM(wt * cents) AS BIGINT) AS num,
               CAST(SUM(wt) AS BIGINT) AS den
        FROM w GROUP BY b HAVING SUM(wt) > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_resamples,
           ROUND(quantile_cont(CAST(num AS DOUBLE) / den, 0.025), 4) AS ci_lo,
           ROUND(quantile_cont(CAST(num AS DOUBLE) / den, 0.5), 4) AS ci_mid,
           ROUND(quantile_cont(CAST(num AS DOUBLE) / den, 0.975), 4) AS ci_hi
    FROM means
    """,
)
def bootstrap_ci_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted-bootstrap 95% confidence interval for the
    mean order value (cents): 100 resamples whose per-row weights
    {0,1,2} come from a multiplicative hash of (orderkey, resample) —
    the reproducible, cluster-stable stand-in for Poisson bootstrap
    weights (mean 1, recomputable map-side on any executor, no rand(),
    no resample tables to ship).

    Each resample mean is an exact BIGINT ratio evaluated with ONE IEEE
    division; the CI bounds are exact interpolated percentiles of those
    100 engine-identical doubles. This is the uncertainty layer for
    every point estimate the engine reports.

    Scale shape: the fan-out is rows×B but entirely map-side (a
    generated literal range crossed in-row) feeding a B-row hash agg
    with map-side partials — the shuffle carries 2·B BIGINTs per task,
    not the resampled data. B scales independently of the corpus.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.explode(F.expr("sequence(0, 99)")).alias("b"),
    ).select(
        "b",
        "cents",
        (
            ((F.col("o_orderkey") * 2654435761 + F.col("b") * 40503) % 4294967296)
            % 3
        ).alias("wt"),
    )
    means = (
        w.groupBy("b")
        .agg(
            F.sum(F.col("wt") * F.col("cents")).cast("long").alias("num"),
            F.sum("wt").cast("long").alias("den"),
        )
        .filter(F.col("den") > 0)
        .select((F.col("num").cast("double") / F.col("den")).alias("m"))
    )
    return means.agg(
        F.count(F.lit(1)).cast("long").alias("n_resamples"),
        F.round(F.expr("percentile(m, 0.025D)"), 4).alias("ci_lo"),
        F.round(F.expr("percentile(m, 0.5D)"), 4).alias("ci_mid"),
        F.round(F.expr("percentile(m, 0.975D)"), 4).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# wave 54: PSI drift, weekday seasonality, Lorenz concentration curve
# ---------------------------------------------------------------------------


@query(
    "psi_drift_order_value",
    oracle="""
    WITH o AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day
        FROM orders
    ), bounds AS (
        SELECT (MIN(day) + MAX(day)) // 2 AS mid FROM o
    ), tagged AS (
        SELECT cents, CASE WHEN day < mid THEN 0 ELSE 1 END AS period
        FROM o, bounds
    ), edges AS (
        SELECT quantile_cont(CAST(cents AS DOUBLE),
                             [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS e
        FROM tagged WHERE period = 0
    ), binned AS (
        SELECT period, len(list_filter(e, x -> cents > x)) AS bin
        FROM tagged, edges
    ), counts AS (
        SELECT bin,
               CAST(SUM(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        FROM binned GROUP BY bin
    ), tot AS (
        SELECT SUM(n0) AS t0, SUM(n1) AS t1 FROM counts
    )
    SELECT bin, n0, n1,
           ROUND((CAST(n1 AS DOUBLE) / t1 - CAST(n0 AS DOUBLE) / t0)
                 * ln((CAST(n1 AS DOUBLE) / t1) / (CAST(n0 AS DOUBLE) / t0)),
                 6) AS psi_term
    FROM counts, tot
    """,
)
def psi_drift_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of order value between the first and
    second half of the order history: reference-period deciles become
    fixed bin edges, and each bin contributes (p₁−p₀)·ln(p₁/p₀) — the
    scorecard-monitoring drift metric (PSI > 0.25 ⇒ the distribution a
    model was trained on no longer holds). Binned twin of the
    KS statistic in `ks_drift_view_purchase`.

    Decile edges are exact interpolated percentiles of BIGINT cents
    (engine-identical doubles); bin assignment is a strict > count over
    the 9-edge array (in-row, no join); counts are exact; each PSI term
    does two divisions and one ln of already-identical doubles, rounded
    to 6. All ≤10 rows returned, no ordering hazard.

    Scale shape: one pass to tag periods (pure arithmetic on the date),
    one exact-percentile agg over the reference half, then a 10-row
    hash agg; the edge array broadcasts in-row. At extreme scale the
    documented swap is approx percentiles for the edges — the exact
    form is the checkable spec.
    """
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.expr("unix_micros(CAST(o_orderdate AS timestamp_ltz)) div 86400000000")
        .cast("long")
        .alias("day"),
    )
    bounds = o.agg(
        F.expr("(min(day) + max(day)) div 2").cast("long").alias("mid")
    )
    tagged = o.crossJoin(F.broadcast(bounds)).select(
        "cents", F.when(F.col("day") < F.col("mid"), 0).otherwise(1).alias("period")
    )
    edges = tagged.filter(F.col("period") == 0).agg(
        F.expr(
            "percentile(CAST(cents AS DOUBLE),"
            " array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))"
        ).alias("e")
    )
    binned = tagged.crossJoin(F.broadcast(edges)).select(
        "period",
        F.expr("size(filter(e, x -> cents > x))").alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("period") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).cast("long").alias("n1"),
    )
    tot = counts.agg(F.sum("n0").alias("t0"), F.sum("n1").alias("t1"))
    p0 = F.col("n0").cast("double") / F.col("t0")
    p1 = F.col("n1").cast("double") / F.col("t1")
    return counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n0",
        "n1",
        F.round((p1 - p0) * F.log(p1 / p0), 6).alias("psi_term"),
    )


@query(
    "dow_seasonality_profile",
    oracle="""
    WITH e AS (
        SELECT (CAST(epoch_us(ts) // 86400000000 AS BIGINT)) % 7 AS dow,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ), agg AS (
        SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM e GROUP BY dow
    ), tot AS (
        SELECT SUM(n_events) AS tn FROM agg
    )
    SELECT dow, n_events, cents,
           CAST(n_events * 1000000 // tn AS BIGINT) AS share_ppm,
           CAST(n_events * 7000000 // tn AS BIGINT) AS index_ppm
    FROM agg, tot
    """,
)
def dow_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile of the event stream: per-weekday
    event count, value cents, traffic share, and a seasonality index
    (share × 7, ppm — 1,000,000 = flat) — the weekly-cycle census that
    justifies (or kills) the lag-7 signal `acf_daily_event_value`
    measures.

    The weekday is epoch_day mod 7 (day 0 = a Thursday) — pure integer
    arithmetic with identical semantics in every engine, dodging the
    1-vs-0-based / Sunday-vs-Monday-first minefield of native dayofweek
    functions (documented, and trivially relabeled downstream). All
    outputs are exact BIGINT ppm.

    Scale shape: one map-side projection, one 7-row hash agg with
    map-side partials, a 1-row broadcast total. Nothing else.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        (
            F.expr("unix_micros(CAST(ts AS timestamp_ltz)) div 86400000000") % 7
        )
        .cast("long")
        .alias("dow"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    agg = e.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("cents"),
    )
    tot = agg.agg(F.sum("n_events").alias("tn"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "dow",
        "n_events",
        "cents",
        F.expr("n_events * 1000000L div tn").cast("long").alias("share_ppm"),
        F.expr("n_events * 7000000L div tn").cast("long").alias("index_ppm"),
    )


@query(
    "lorenz_curve_customer_spend",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ), deciled AS (
        SELECT cents,
               NTILE(10) OVER (ORDER BY cents ASC, o_custkey) AS decile
        FROM spend
    ), agg AS (
        SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM deciled GROUP BY decile
    ), tot AS (
        SELECT SUM(cents) AS tc FROM agg
    )
    SELECT decile, n_customers, cents,
           CAST(SUM(cents) OVER (ORDER BY decile) * 1000000 // tc AS BIGINT)
               AS cum_share_ppm
    FROM agg, tot
    """,
)
def lorenz_curve_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz concentration curve of customer spend: customers ranked
    poorest→richest into deciles, with the cumulative revenue share each
    decile accounts for (exact ppm) — the 'top 10% of customers drive X%
    of revenue' curve, and the oracle-checkable integral twin of the
    rows-only Gini UDAF (`udaf_gini_per_segment`): Gini = 1 − 2·∫Lorenz.

    Scale shape: the fact collapses to one row per customer map-side;
    the decile ntile sorts only the customer summary (tie-broken on
    custkey, so every boundary is deterministic); the cumulative window
    runs over 10 rows. All arithmetic BIGINT.
    """
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    deciled = spend.select(
        "cents",
        F.ntile(10)
        .over(Window.orderBy(F.asc("cents"), F.asc("o_custkey")))
        .alias("decile"),
    )
    agg = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("cents"),
    )
    tot = agg.agg(F.sum("cents").alias("tc"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n_customers",
        "cents",
        F.expr(
            "sum(cents) over (order by decile rows between unbounded preceding"
            " and current row) * 1000000L div tc"
        )
        .cast("long")
        .alias("cum_share_ppm"),
    )


# ---------------------------------------------------------------------------
# wave 55: graph modularity, bag-semantics set ops, discrete percentiles
# ---------------------------------------------------------------------------


@query(
    "modularity_trade_communities",
    bench=True,
    oracle="""
    WITH fwd AS (
        SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), nodes AS (
        SELECT 'c' || CAST(c_custkey AS VARCHAR) AS node,
               CAST(c_nationkey AS BIGINT) AS com FROM customer
        UNION ALL
        SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node,
               CAST(s_nationkey AS BIGINT) AS com FROM supplier
    ), edges AS (
        SELECT 'c' || CAST(ck AS VARCHAR) AS src, 's' || CAST(sk AS VARCHAR) AS dst
        FROM fwd
        UNION ALL
        SELECT 's' || CAST(sk AS VARCHAR), 'c' || CAST(ck AS VARCHAR) FROM fwd
    ), lab AS (
        SELECT ns.com AS src_com, nd.com AS dst_com
        FROM edges e JOIN nodes ns ON ns.node = e.src
                     JOIN nodes nd ON nd.node = e.dst
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM lab
    ), per AS (
        SELECT src_com AS com,
               CAST(SUM(CASE WHEN src_com = dst_com THEN 1 ELSE 0 END) AS BIGINT)
                   AS e_int,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM lab GROUP BY src_com
    )
    SELECT com, e_int, k,
           CAST(e_int * m2 - k * k AS BIGINT) AS q_scaled
    FROM per, s
    """,
)
def modularity_trade_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the bidirected customer↔supplier trade graph
    under the nation partition — 'do nations form real trade communities
    or is the graph nation-agnostic?'. Per-community contribution in the
    EXACT integer scaling Q·(2m)² = Σ_c (e_c·2m − K_c²), so the quality
    score of any community assignment (here: nations; in production: the
    output of label propagation / Louvain rounds) is hash-checkable with
    zero float drift. Σ q_scaled / (2m)² recovers the float Q.

    Scale shape: the distinct bipartite edge set collapses the fact
    first; both endpoint labelings join the node→community dim
    (broadcast at real scale — dims are customer/supplier sized); then
    one |communities|-row hash agg and a 1-row total. Degree products
    never materialize pairs.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    fwd = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    c_nodes = cust.select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("node"),
        F.col("c_nationkey").cast("long").alias("com"),
    )
    s_nodes = supp.select(
        F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"),
        F.col("s_nationkey").cast("long").alias("com"),
    )
    nodes = c_nodes.unionByName(s_nodes)
    e1 = fwd.select(
        F.concat(F.lit("c"), F.col("ck").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("sk").cast("string")).alias("dst"),
    )
    e2 = fwd.select(
        F.concat(F.lit("s"), F.col("sk").cast("string")).alias("src"),
        F.concat(F.lit("c"), F.col("ck").cast("string")).alias("dst"),
    )
    edges = e1.unionByName(e2)
    lab = edges.join(
        F.broadcast(nodes.withColumnRenamed("node", "src").withColumnRenamed("com", "src_com")),
        "src",
    ).join(
        F.broadcast(nodes.withColumnRenamed("node", "dst").withColumnRenamed("com", "dst_com")),
        "dst",
    )
    s = lab.agg(F.count(F.lit(1)).cast("long").alias("m2"))
    per = lab.groupBy(F.col("src_com").alias("com")).agg(
        F.sum(F.when(F.col("src_com") == F.col("dst_com"), 1).otherwise(0))
        .cast("long")
        .alias("e_int"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    return per.crossJoin(F.broadcast(s)).select(
        "com",
        "e_int",
        "k",
        (F.col("e_int") * F.col("m2") - F.col("k") * F.col("k"))
        .cast("long")
        .alias("q_scaled"),
    )


@query(
    "setop_bag_semantics",
    oracle="""
    WITH a AS (
        SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'F'
    ), b AS (
        SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'O'
    ), i AS (
        SELECT p FROM a INTERSECT ALL SELECT p FROM b
    ), x AS (
        SELECT p FROM a EXCEPT ALL SELECT p FROM b
    )
    SELECT 'intersect_all' AS op, p, CAST(COUNT(*) AS BIGINT) AS n
    FROM i GROUP BY p
    UNION ALL
    SELECT 'except_all' AS op, p, CAST(COUNT(*) AS BIGINT) AS n
    FROM x GROUP BY p
    """,
)
def setop_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — the multiplicity-preserving (bag)
    set operations the DISTINCT-flavoured `setop_*` queries don't cover:
    intersect keeps min(multiplicity), except keeps the excess
    multiplicity. Pinning these semantics matters because 'subtract the
    rows I already processed' pipelines silently corrupt counts if the
    engine dedups. Output is the per-value multiplicity census of both
    results.

    Scale shape: Spark plans both as a single hash aggregation over the
    union computing per-side counts, then replicates rows min(a,b) /
    (a−b) times — no sort, no pairwise join; the final census agg is
    |priorities|-sized.
    """
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("p")
    )
    b = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("p")
    )
    i = (
        a.intersectAll(b)
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "p", "n")
    )
    x = (
        a.exceptAll(b)
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit("except_all").alias("op"), "p", "n")
    )
    return i.unionByName(x)


@query(
    "percentile_disc_by_status",
    oracle="""
    SELECT o_orderstatus,
           quantile_disc(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.25) AS p25_cents,
           quantile_disc(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.5)  AS p50_cents,
           quantile_disc(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.9)  AS p90_cents
    FROM orders GROUP BY o_orderstatus
    """,
)
def percentile_disc_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles per order status: the smallest actual data
    value whose cumulative share reaches the quantile — no interpolation,
    so results are values that exist in the data (what you want for
    latency SLOs and price points). Completes the quantile tier beside
    interpolated (`exact_percentiles_by_flag`), sketched (KLL/GK),
    weighted, and winsorized forms; pins that Spark's
    `percentile_disc WITHIN GROUP` and DuckDB's `quantile_disc` agree on
    the lower-value convention. BIGINT cents in, BIGINT cents out —
    exact by construction.

    Scale shape: sort-based aggregate within each status group (Spark
    plans ObjectHashAggregate); one |statuses|-row result, no window.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
    return (
        orders.selectExpr("o_orderstatus", f"{cents} AS cents")
        .groupBy("o_orderstatus")
        .agg(
            F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)")
            .cast("long")
            .alias("p25_cents"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)")
            .cast("long")
            .alias("p50_cents"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY cents)")
            .cast("long")
            .alias("p90_cents"),
        )
    )


@query("multimodal_ahash_index")
def multimodal_ahash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (aHash) index over the image corpus: per image
    the 64-bit average-hash signature, its popcount, and how many OTHER
    images share at least one pigeonhole chunk bucket with it (the
    candidate fan-in the near-dup pair join would pay) — the image twin
    of the text-side SimHash index, completing visual near-dup beside
    decode/featurize/resize/frame-sample.

    Rows-only by design (the signature comes from the Arrow-batched
    fake decode; no SQL oracle can see payload bytes); exactness is
    pinned by a NumPy-reference test and a brute-force-equality recall
    test on planted variants (`tests/test_wave50s.py`).

    Scale shape: signatures are map-side mapInPandas (payload never
    shuffles); the peer census equi-joins 8-byte chunk buckets — the
    sub-quadratic LSH shape, never all-pairs.
    """
    from pyspark_movie_recommender_spark.operators.multimodal import (
        attach_fake_payload,
        image_ahash,
    )

    docs = load_table(spark, sf_dir, "documents")
    sigs = image_ahash(attach_fake_payload(docs))
    chunks = 7  # max_hamming 6 budget → 7 chunks
    width = 64 // chunks

    def chunk_expr(i: int) -> str:
        lo = i * width
        nbits = width if i < chunks - 1 else 64 - lo
        mask = (1 << nbits) - 1
        return f"struct({i} AS ci, (shiftrightunsigned(sig, {lo}) & {mask}) AS cv)"

    arr = "array(" + ", ".join(chunk_expr(i) for i in range(chunks)) + ")"
    banded = sigs.select("doc_id", F.explode(F.expr(arr)).alias("c")).select(
        "doc_id", "c.ci", "c.cv"
    )
    peers = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.countDistinct("b.doc_id").cast("long").alias("n_bucket_peers"))
    )
    return sigs.join(peers, "doc_id", "left").select(
        "doc_id",
        "sig",
        "n_set_bits",
        F.coalesce("n_bucket_peers", F.lit(0)).cast("long").alias("n_bucket_peers"),
    )


# ---------------------------------------------------------------------------
# wave 57: concordance extraction, skew-safe distinct, SRM guard
# ---------------------------------------------------------------------------


@query(
    "kwic_concordance",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(lower(trim(text)), '\\s+') END AS t
        FROM documents
    ), hits AS (
        SELECT doc_id, g.i AS pos, t
        FROM toks,
             LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) g
        WHERE t[g.i] = 'join'
    )
    SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           COALESCE(array_to_string(t[GREATEST(1, pos - 3):pos - 1], ' '), '')
               AS left_ctx,
           COALESCE(array_to_string(t[pos + 1:LEAST(len(t), pos + 3)], ' '), '')
               AS right_ctx
    FROM hits
    """,
)
def kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context (KWIC) concordance for the term 'join': every
    occurrence with its ±3-token window — the corpus-linguistics /
    search-debugging view ('show me how this token is actually used')
    that also powers snippet generation for retrieval results.

    Scale shape: position explode and context slicing happen entirely
    in-row (posexplode + array slice — no join, no shuffle; the filter
    on the term prunes before any wide operation). Output is
    occurrence-sized, already the user-requested result. A
    token-partitioned inverted index (`phrase_search_positional`) is the
    100 TB route when the term set is dynamic; this is the single-term
    scan form.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", ws_tokens(F.lower(F.col("text"))).alias("t"))
    hits = toks.select(
        "doc_id", "t", F.posexplode("t").alias("p0", "tok")
    ).filter(F.col("tok") == "join")
    # posexplode is 0-based; oracle positions are 1-based
    pos = (F.col("p0") + 1).alias("pos")
    left_start = F.greatest(F.lit(1), F.col("p0") + 1 - 3)
    left_len = (F.col("p0") + 1 - 1) - F.greatest(F.lit(1), F.col("p0") + 1 - 3) + 1
    return hits.select(
        "doc_id",
        pos.cast("long").alias("pos"),
        F.concat_ws(
            " ", F.slice("t", left_start, F.greatest(left_len, F.lit(0)))
        ).alias("left_ctx"),
        F.concat_ws(
            " ",
            F.expr("slice(t, p0 + 2, LEAST(size(t), p0 + 4) - (p0 + 2) + 1)"),
        ).alias("right_ctx"),
    )


@query(
    "two_phase_skewed_distinct",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def two_phase_skewed_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type distinct-user counts via an EXPLICIT two-phase
    plan: dedup on the composite (event_type, user_id) key first, then
    count the survivors — the skew-safe formulation of COUNT(DISTINCT).
    A direct count-distinct shuffles raw rows keyed by event_type alone
    (5 reducers hold everything, the hottest type melts one of them);
    the composite-key dedup spreads the same work over the full key
    space and the second agg receives only distincts.

    Oracle is the plain COUNT(DISTINCT) — equality proves the rewrite.

    Scale shape: phase 1 = hash agg on (type, user) with map-side
    partial dedup (most duplicate hits collapse before the shuffle);
    phase 2 = |types|-row count. Both aggs whole-stage codegen, no
    Expand node.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type", "user_id")
        .dropDuplicates(["event_type", "user_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


@query(
    "srm_check_assignments",
    oracle="""
    WITH arms AS (
        SELECT ((user_id * 2654435761) % 4294967296) % 2 AS arm
        FROM (SELECT DISTINCT user_id FROM events)
    ), c AS (
        SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        FROM arms
    )
    SELECT n0, n1,
           ROUND(CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / (n0 + n1), 6) AS chi2,
           CASE WHEN CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / (n0 + n1) > 10.83
                THEN 'SRM' ELSE 'ok' END AS verdict
    FROM c
    """,
)
def srm_check_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch (SRM) guard for the deterministic-hash A/B
    assignment used by `ab_experiment_readout`: χ² of the observed arm
    counts against the intended 50/50 split ((n0−n1)²/(n0+n1) for two
    equal-probability arms), flagged at the p<0.001 threshold (10.83).
    SRM is the first gate every experiment readout must pass — a
    triggered-assignment bug silently invalidates every downstream
    metric, so the guard ships next to the readout.

    Scale shape: distinct users collapse map-side, arms are pure
    hash arithmetic, the census is a 1-row agg. χ² is one division of
    exact BIGINTs.
    """
    ev = load_table(spark, sf_dir, "events")
    arms = ev.select("user_id").distinct().select(
        (((F.col("user_id") * 2654435761) % 4294967296) % 2).alias("arm")
    )
    c = arms.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n1"),
    )
    chi2 = ((F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n1"))).cast(
        "double"
    ) / (F.col("n0") + F.col("n1"))
    return c.select(
        "n0",
        "n1",
        F.round(chi2, 6).alias("chi2"),
        F.when(chi2 > 10.83, "SRM").otherwise("ok").alias("verdict"),
    )


@query("streaming_drift_band_counts")
def streaming_drift_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous drift monitoring, stream side: per-reference-decile
    band counts of event value maintained in complete mode against
    STATIC edges (the refreshed-daily training-distribution config);
    the PSI score (`psi_drift_order_value`) runs downstream on this
    materialized relation. Rows-only; band assignment is pinned equal
    to the identical batch expression in tests/test_streaming.py."""
    from pyspark_movie_recommender_spark.streaming.jobs import (
        drift_band_counts_stream,
    )

    return drift_band_counts_stream(spark, sf_dir, query_name="q_stream_drift")


# ---------------------------------------------------------------------------
# wave 59: NDCG ranking eval, transition latency, embedding-label purity
# ---------------------------------------------------------------------------


@query(
    "ndcg_nation_forecast",
    oracle="""
    WITH o AS (
        SELECT c.c_nationkey AS nation,
               CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS day,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), bounds AS (
        SELECT (MIN(day) + MAX(day)) // 2 AS mid FROM o
    ), agg AS (
        SELECT nation,
               CAST(SUM(CASE WHEN day <  mid THEN cents ELSE 0 END) AS BIGINT) AS hist,
               CAST(SUM(CASE WHEN day >= mid THEN cents ELSE 0 END) AS BIGINT) AS rel
        FROM o, bounds GROUP BY nation
    ), ranked AS (
        SELECT rel,
               ROW_NUMBER() OVER (ORDER BY hist DESC, nation) AS pred_rank,
               ROW_NUMBER() OVER (ORDER BY rel  DESC, nation) AS ideal_rank
        FROM agg
    ), g AS (
        SELECT SUM(CASE WHEN pred_rank <= 10
                        THEN rel / log2(pred_rank + 1.0) ELSE 0 END) AS dcg,
               SUM(CASE WHEN ideal_rank <= 10
                        THEN rel / log2(ideal_rank + 1.0) ELSE 0 END) AS idcg
        FROM ranked
    )
    SELECT ROUND(dcg, 2) AS dcg, ROUND(idcg, 2) AS idcg,
           ROUND(dcg / idcg, 6) AS ndcg_at_10
    FROM g
    """,
)
def ndcg_nation_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the naive 'rank nations by first-half revenue' forecast
    against actual second-half revenue as graded relevance — the
    ranking-quality evaluation metric (search, recommendations,
    prioritization) beside the classification-side `auc_order_status_price`.
    DCG = Σ rel_i / log2(rank_i + 1) over the top 10 predicted; IDCG is
    the same sum under the ideal (relevance-sorted) ranking.

    Relevances are exact BIGINT cents; each DCG term divides by
    log2(k+1) for integer k ≤ 25 — a constant both engines compute
    identically — and the per-rank terms are summed over ≤25 values
    with deterministic tie-broken ranks, so the rounded sums are
    engine-stable.

    Scale shape: the fact collapses to |nations| rows in one agg
    (customer dim broadcast); both rankings and the DCG sums run on
    that 25-row relation.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    o = orders.join(
        F.broadcast(cust.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")),
        "o_custkey",
    ).select(
        F.col("c_nationkey").alias("nation"),
        F.expr("unix_micros(CAST(o_orderdate AS timestamp_ltz)) div 86400000000")
        .cast("long")
        .alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    bounds = o.agg(F.expr("(min(day) + max(day)) div 2").alias("mid"))
    agg = (
        o.crossJoin(F.broadcast(bounds))
        .groupBy("nation")
        .agg(
            F.sum(F.when(F.col("day") < F.col("mid"), F.col("cents")).otherwise(0))
            .cast("long")
            .alias("hist"),
            F.sum(F.when(F.col("day") >= F.col("mid"), F.col("cents")).otherwise(0))
            .cast("long")
            .alias("rel"),
        )
    )
    ranked = agg.select(
        "rel",
        F.row_number()
        .over(Window.orderBy(F.desc("hist"), F.asc("nation")))
        .alias("pred_rank"),
        F.row_number()
        .over(Window.orderBy(F.desc("rel"), F.asc("nation")))
        .alias("ideal_rank"),
    )
    g = ranked.agg(
        F.sum(
            F.when(
                F.col("pred_rank") <= 10,
                F.col("rel") / F.log2(F.col("pred_rank") + 1.0),
            ).otherwise(0.0)
        ).alias("dcg"),
        F.sum(
            F.when(
                F.col("ideal_rank") <= 10,
                F.col("rel") / F.log2(F.col("ideal_rank") + 1.0),
            ).otherwise(0.0)
        ).alias("idcg"),
    )
    return g.select(
        F.round("dcg", 2).alias("dcg"),
        F.round("idcg", 2).alias("idcg"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_10"),
    )


@query(
    "transition_latency_stats",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, epoch_us(ts) AS t,
               LAG(event_type) OVER w AS prev_type,
               LAG(epoch_us(ts)) OVER w AS prev_t
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(FLOOR(quantile_cont(t - prev_t, 0.5)) AS BIGINT) AS median_gap_us,
           CAST(MAX(t - prev_t) AS BIGINT) AS max_gap_us
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def transition_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How LONG each journey transition takes: per (prev_type →
    next_type) pair the count, median, and max inter-event gap in exact
    microseconds — the timing layer over `event_transition_matrix`'s
    pure counts (a checkout that follows a view in 2 s vs 2 days is a
    different product story).

    Gaps are BIGINT microsecond differences; the median is the exact
    interpolated percentile over integers (midpoints are exact halves,
    truncated identically by the BIGINT cast on both engines — even
    counts can only produce .0 or .5). The lag ordering carries the
    (ts, event_id) total tie-break.

    Scale shape: one user_id exchange for the lag window; the stats agg
    collapses to |types|² rows with map-side partials.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        us.alias("t"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag(us).over(w).alias("prev_t"),
    ).filter(F.col("prev_type").isNotNull())
    gap = F.col("t") - F.col("prev_t")
    return (
        seq.select("prev_type", F.col("event_type").alias("next_type"), gap.alias("g"))
        .groupBy("prev_type", "next_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.floor(F.expr("percentile(g, 0.5)")).cast("long").alias("median_gap_us"),
            F.max("g").cast("long").alias("max_gap_us"),
        )
    )


@query(
    "label_purity_by_lang",
    oracle="""
    WITH j AS (
        SELECT d.lang, e.label, CAST(COUNT(*) AS BIGINT) AS n
        FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
        GROUP BY d.lang, e.label
    ), tot AS (
        SELECT lang, SUM(n) AS tn FROM j GROUP BY lang
    ), best AS (
        SELECT lang, label AS majority_label, n AS best_n
        FROM (
            SELECT lang, label, n,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY n DESC, label ASC) AS rn
            FROM j
        ) WHERE rn = 1
    )
    SELECT b.lang, b.majority_label, b.best_n, CAST(t.tn AS BIGINT) AS n_docs,
           CAST(b.best_n * 1000000 // t.tn AS BIGINT) AS purity_ppm
    FROM best b JOIN tot t ON t.lang = b.lang
    """,
)
def label_purity_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-purity audit across modalities: join the embedding
    table's cluster labels to the document table's languages (vec_id =
    doc_id) and report each language's majority label with its purity
    in exact ppm — 'do the embedding clusters recover the language
    partition?', the sanity gate before trusting labels for SemDedup /
    IVF routing / mixture decisions.

    The majority label uses max_by with an (n, -label) tie-break struct
    — deterministic on both engines with zero floats; purity is BIGINT
    integer division.

    Scale shape: the id-keyed join is co-partitionable (both sides keyed
    by the same id domain; dim side broadcastable); everything after is
    |langs|×|labels| sized.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    j = (
        emb.join(
            docs.select(F.col("doc_id").alias("vec_id"), "lang"), "vec_id"
        )
        .groupBy("lang", "label")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = j.groupBy("lang").agg(F.sum("n").alias("tn"))
    best = j.groupBy("lang").agg(
        F.expr("max_by(label, struct(n, -label))").alias("majority_label"),
        F.max("n").alias("best_n"),
    )
    return best.join(tot, "lang").select(
        "lang",
        "majority_label",
        "best_n",
        F.col("tn").cast("long").alias("n_docs"),
        F.expr("best_n * 1000000L div tn").cast("long").alias("purity_ppm"),
    )


# ---------------------------------------------------------------------------
# wave 60: hybrid retrieval fusion, rank correlation
# ---------------------------------------------------------------------------


@query(
    "hybrid_rrf_retrieval",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\\s+') END AS t
        FROM documents
    ), d AS (
        SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl, t FROM toks
    ), stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM d
    ), tf AS (
        SELECT doc_id, dl, term, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM (SELECT doc_id, dl, unnest(t) AS term FROM d)
        WHERE term IN ('spark', 'vector', 'stream')
        GROUP BY doc_id, dl, term
    ), dft AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY term
    ), bm AS (
        SELECT doc_id,
               ROUND(SUM(
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS bm25
        FROM tf JOIN dft USING (term) CROSS JOIN stats
        GROUP BY doc_id
    ), brank AS (
        SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id)
               AS BIGINT) AS rank_b
        FROM bm
    ), s AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), probe AS (
        SELECT e FROM s WHERE vec_id = 0
    ), crank AS (
        SELECT c.vec_id AS doc_id,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY ROUND(list_cosine_similarity(p.e, c.e), 6) DESC,
                            c.vec_id) AS BIGINT) AS rank_c
        FROM s c, probe p WHERE c.vec_id <> 0
    ), fused AS (
        SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id, b.rank_b, c.rank_c,
               COALESCE(1.0 / (60 + b.rank_b), 0.0)
             + COALESCE(1.0 / (60 + c.rank_c), 0.0) AS rrf
        FROM brank b FULL OUTER JOIN crank c ON c.doc_id = b.doc_id
    )
    SELECT doc_id, rank_b, rank_c, ROUND(rrf, 6) AS rrf_score
    FROM fused
    ORDER BY rrf DESC, doc_id
    LIMIT 10
    """,
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (k=60): the BM25
    lexical ranking for {spark, vector, stream} fused with the exact
    cosine ranking against probe vector 0 — the standard RAG trick for
    combining keyword and embedding retrieval without score calibration
    (RRF uses only RANKS, so the incomparable score scales never meet).
    Docs absent from one list contribute only the other's term, per the
    original Cormack/Clarke formulation.

    Determinism: both input rankings order by 6-decimal-rounded scores
    with doc-id tie-breaks (the repo's proven bm25/cosine patterns);
    RRF values are sums of two reciprocals of small integers — IEEE-
    identical across engines — and the final top-10 tie-breaks on
    doc_id.

    Scale shape: the lexical leg is the BM25 explode+broadcast shape;
    the vector leg scans the corpus once against a broadcast probe; the
    fusion is a full outer join of two rank relations already reduced
    to (doc, rank) — at scale both legs would be rank-limited (ANN +
    WAND) before fusing, which changes their internals, not this shape.
    """
    from pyspark_movie_recommender_spark.operators.text import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    bm = bm25_scores(docs, ["spark", "vector", "stream"])
    brank = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .cast("long")
        .alias("rank_b"),
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("e"),
    )
    probe = emb.filter(F.col("doc_id") == 0).select(F.col("e").alias("pe"))
    sim = F.expr(
        "aggregate(zip_with(e, pe, (x, y) -> x * y), 0D, (a, x) -> a + x)"
        " / (sqrt(aggregate(e, 0D, (a, x) -> a + x * x))"
        "    * sqrt(aggregate(pe, 0D, (a, x) -> a + x * x)))"
    )
    crank = (
        emb.filter(F.col("doc_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select("doc_id", F.round(sim, 6).alias("sim"))
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("sim"), F.asc("doc_id")))
            .cast("long")
            .alias("rank_c"),
        )
    )
    from pyspark_movie_recommender_spark.operators.rank import rrf_fuse

    fused = rrf_fuse(
        [
            brank.select("doc_id", F.col("rank_b").alias("rank")),
            crank.select("doc_id", F.col("rank_c").alias("rank")),
        ],
        id_col="doc_id",
        k=60,
    )
    return (
        fused.orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(10)
        .select(
            "doc_id",
            F.col("rank_0").alias("rank_b"),
            F.col("rank_1").alias("rank_c"),
            F.round("rrf", 6).alias("rrf_score"),
        )
    )


@query(
    "kendall_tau_rankings",
    oracle="""
    WITH o AS (
        SELECT c.c_nationkey AS nation,
               CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS day,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), bounds AS (
        SELECT (MIN(day) + MAX(day)) // 2 AS mid FROM o
    ), agg AS (
        SELECT nation,
               CAST(SUM(CASE WHEN day <  mid THEN cents ELSE 0 END) AS BIGINT) AS hist,
               CAST(SUM(CASE WHEN day >= mid THEN cents ELSE 0 END) AS BIGINT) AS rel
        FROM o, bounds GROUP BY nation
    ), ranked AS (
        SELECT nation,
               ROW_NUMBER() OVER (ORDER BY hist DESC, nation) AS ra,
               ROW_NUMBER() OVER (ORDER BY rel  DESC, nation) AS rb
        FROM agg
    ), pairs AS (
        SELECT CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) > 0 THEN 1 ELSE 0 END AS conc
        FROM ranked x JOIN ranked y ON y.nation > x.nation
    )
    SELECT CAST(SUM(conc) AS BIGINT) AS concordant,
           CAST(COUNT(*) - SUM(conc) AS BIGINT) AS discordant,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST((SUM(conc) * 2 - COUNT(*)) * 1000000 // COUNT(*) AS BIGINT)
               AS tau_ppm
    FROM pairs
    """,
)
def kendall_tau_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall rank correlation between the first-half revenue ranking
    of nations and the second-half actual — τ = (C−D)/pairs as exact
    BIGINT ppm, the pairwise-agreement companion to `ndcg_nation_forecast`
    (NDCG asks 'is the top good'; τ asks 'is the whole ORDER right').
    Everything is integer: tie-broken ranks, concordance indicators,
    floor-div ppm.

    Scale shape: the fact collapses to |nations| rows; rankings and the
    C(n,2) pair join run on that 25-row relation — at a million-item
    ranking the pair join swaps for the O(n log n) merge-sort inversion
    count, which is a different engine op with the same contract.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    o = orders.join(
        F.broadcast(cust.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")),
        "o_custkey",
    ).select(
        F.col("c_nationkey").alias("nation"),
        F.expr("unix_micros(CAST(o_orderdate AS timestamp_ltz)) div 86400000000")
        .cast("long")
        .alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    bounds = o.agg(F.expr("(min(day) + max(day)) div 2").alias("mid"))
    agg = (
        o.crossJoin(F.broadcast(bounds))
        .groupBy("nation")
        .agg(
            F.sum(F.when(F.col("day") < F.col("mid"), F.col("cents")).otherwise(0))
            .cast("long")
            .alias("hist"),
            F.sum(F.when(F.col("day") >= F.col("mid"), F.col("cents")).otherwise(0))
            .cast("long")
            .alias("rel"),
        )
    )
    ranked = agg.select(
        "nation",
        F.row_number().over(Window.orderBy(F.desc("hist"), F.asc("nation"))).alias("ra"),
        F.row_number().over(Window.orderBy(F.desc("rel"), F.asc("nation"))).alias("rb"),
    )
    x = ranked.select(
        F.col("nation").alias("nx"), F.col("ra").alias("rax"), F.col("rb").alias("rbx")
    )
    y = ranked.select(
        F.col("nation").alias("ny"), F.col("ra").alias("ray"), F.col("rb").alias("rby")
    )
    pairs = x.join(y, F.col("ny") > F.col("nx")).select(
        F.when(
            (F.col("rax") - F.col("ray")) * (F.col("rbx") - F.col("rby")) > 0, 1
        )
        .otherwise(0)
        .alias("conc")
    )
    return pairs.agg(
        F.sum("conc").cast("long").alias("concordant"),
        (F.count(F.lit(1)) - F.sum("conc")).cast("long").alias("discordant"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr("(sum(conc) * 2 - count(1)) * 1000000L div count(1)")
        .cast("long")
        .alias("tau_ppm"),
    )


# ---------------------------------------------------------------------------
# wave 61: NOT-IN null trap, LSH parameter planner, grouping labels
# ---------------------------------------------------------------------------


@query(
    "not_in_null_trap",
    oracle="""
    WITH denylist AS (
        SELECT * FROM (VALUES ('1-URGENT'), (NULL)) t(p)
    ), not_in AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders
        WHERE o_orderpriority NOT IN (SELECT p FROM denylist)
    ), not_exists AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM denylist d
                          WHERE d.p = o.o_orderpriority)
    ), lanti AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM orders o LEFT JOIN denylist d ON d.p = o.o_orderpriority
        WHERE d.p IS NULL
    )
    SELECT 'not_in'     AS form, n FROM not_in
    UNION ALL SELECT 'not_exists' AS form, n FROM not_exists
    UNION ALL SELECT 'left_anti'  AS form, n FROM lanti
    """,
)
def not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI NOT-IN null trap, pinned on both engines: a denylist
    containing a NULL makes `NOT IN` return ZERO rows (x <> NULL is
    UNKNOWN, so no row ever passes), while `NOT EXISTS` / left-anti —
    the forms every exclusion pipeline should use — return the real
    complement. Three counts side by side so the trap is a visible,
    regression-tested fact rather than tribal knowledge; completes the
    three-valued-logic family of `null_semantics_suite`.

    Scale shape: the denylist is a 2-row literal broadcast; all three
    forms are one fact scan each (Catalyst plans the NOT IN as a
    null-aware anti join — the expensive null-aware machinery is
    exactly WHY the result is empty, which is the lesson).
    """
    orders = load_table(spark, sf_dir, "orders")
    deny = spark.createDataFrame([("1-URGENT",), (None,)], "p string")
    deny.createOrReplaceTempView("nin_denylist")
    orders.createOrReplaceTempView("nin_orders")
    not_in = spark.sql(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nin_orders"
        " WHERE o_orderpriority NOT IN (SELECT p FROM nin_denylist)"
    ).select(F.lit("not_in").alias("form"), "n")
    not_exists = spark.sql(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nin_orders o"
        " WHERE NOT EXISTS (SELECT 1 FROM nin_denylist d"
        "                   WHERE d.p = o.o_orderpriority)"
    ).select(F.lit("not_exists").alias("form"), "n")
    anti = (
        orders.join(deny, orders.o_orderpriority == deny.p, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit("left_anti").alias("form"), "n")
    )
    return not_in.unionByName(not_exists).unionByName(anti)


@query(
    "lsh_s_curve_planner",
    oracle="""
    WITH configs AS (
        SELECT b, 128 // b AS r FROM (VALUES (8), (16), (32), (64)) t(b)
    )
    SELECT b, CAST(r AS BIGINT) AS r,
           ROUND(1 - pow(1 - pow(0.5, r), b), 6)  AS p_at_50,
           ROUND(1 - pow(1 - pow(0.7, r), b), 6)  AS p_at_70,
           ROUND(1 - pow(1 - pow(0.9, r), b), 6)  AS p_at_90,
           ROUND(pow(1.0 / b, 1.0 / r), 6)        AS threshold_est
    FROM configs
    """,
)
def lsh_s_curve_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH parameter planner: for each (bands b, rows r) split
    of a 128-permutation signature, the S-curve collision probability
    1−(1−s^r)^b at Jaccard 0.5/0.7/0.9 and the (1/b)^(1/r) threshold
    estimate — the table an operator reads to pick the banding that
    `dedup_minhash_lsh` runs with (and that `dedup_threshold_sweep`
    validates empirically). Tuning math as a first-class, oracle-checked
    relation instead of a notebook aside.

    Scale shape: a 4-row literal relation and closed-form pow() — zero
    data touched; it composes (crossJoin) with measured corpus stats
    when candidate-budget forecasting is needed.
    """
    configs = spark.createDataFrame([(8,), (16,), (32,), (64,)], "b int").select(
        "b", F.expr("128 div b").cast("long").alias("r")
    )
    def p_at(s: float):
        return F.round(
            1 - F.pow(1 - F.pow(F.lit(s), F.col("r")), F.col("b")), 6
        )
    return configs.select(
        "b",
        "r",
        p_at(0.5).alias("p_at_50"),
        p_at(0.7).alias("p_at_70"),
        p_at(0.9).alias("p_at_90"),
        F.round(F.pow(1.0 / F.col("b"), 1.0 / F.col("r")), 6).alias("threshold_est"),
    )


@query(
    "rollup_grouping_labels",
    oracle="""
    SELECT GROUPING(r_name) AS g_region, GROUPING(n_name) AS g_nation,
           COALESCE(r_name, CASE WHEN GROUPING(r_name) = 1 THEN '<all>' END)
               AS region,
           COALESCE(n_name, CASE WHEN GROUPING(n_name) = 1 THEN '<all>' END)
               AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS balance_cents
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def rollup_grouping_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with explicit GROUPING() indicators: subtotal rows carry
    g_region/g_nation flags and '<all>' labels, so a NULL-valued group
    member can never be confused with a subtotal — the disambiguation
    every BI export over rollups needs (the raw rollup queries
    `rollup_customer_geo`/`cube_lineitem_flags` leave NULL doing double
    duty). Exact BIGINT cents throughout.

    Scale shape: Spark's Expand node generates the grouping sets before
    one hash agg with map-side partials; dims broadcast onto the fact.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    j = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    g = j.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
        .cast("long")
        .alias("balance_cents"),
    )
    return g.select(
        "g_region",
        "g_nation",
        F.coalesce(
            "r_name", F.when(F.col("g_region") == 1, "<all>")
        ).alias("region"),
        F.coalesce(
            "n_name", F.when(F.col("g_nation") == 1, "<all>")
        ).alias("nation"),
        "n_customers",
        "balance_cents",
    )


# ---------------------------------------------------------------------------
# wave 62: SQL pipe syntax, MRR eval, regression calibration bins
# ---------------------------------------------------------------------------


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL PIPE syntax (`|>` — SPARK-49555): the same
    filter→aggregate expressed as a linear pipeline instead of
    inside-out SQL, pinned value-equal to the classic formulation the
    DuckDB oracle runs. The pipe form parses to the IDENTICAL Catalyst
    plan (one pushed filter, partial+final hash agg), so the modern
    authoring surface costs nothing at execution time.
    """
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("pipe_orders")
    return spark.sql(
        """
        FROM pipe_orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_orders,
                     CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                         AS cents
           GROUP BY o_orderpriority
        """
    ).select("o_orderpriority", "n_orders", "cents")


@query(
    "mrr_bm25_eval",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\\s+') END AS t
        FROM documents
    ), d AS (
        SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl, t FROM toks
    ), stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM d
    ), tf AS (
        SELECT doc_id, dl, term, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM (SELECT doc_id, dl, unnest(t) AS term FROM d)
        WHERE term IN ('spark', 'vector', 'stream')
        GROUP BY doc_id, dl, term
    ), dft AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY term
    ), bm AS (
        SELECT doc_id,
               COUNT(*) AS n_terms,
               ROUND(SUM(
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS bm25
        FROM tf JOIN dft USING (term) CROSS JOIN stats
        GROUP BY doc_id
    ), ranked AS (
        SELECT doc_id, n_terms,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
        FROM bm
    )
    SELECT CAST(MIN(rnk) AS BIGINT) AS first_relevant_rank,
           CAST(SUM(CASE WHEN n_terms = 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_relevant,
           ROUND(1.0 / MIN(rnk), 6) AS mrr
    FROM ranked WHERE n_terms = 3
    """,
)
def mrr_bm25_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank of the BM25 ranking for {spark, vector,
    stream}, with relevance = documents containing ALL three terms —
    'how far down the list is the first fully-on-topic document'. With
    NDCG (top quality) and Kendall τ (whole-order quality) this
    completes the standard retrieval-eval triple; a multi-query MRR is
    this same relation averaged over a query table.

    Determinism: the ranking orders by the 6-decimal-rounded BM25 with
    doc-id tie-break (the proven bm25 pattern); relevance and ranks are
    integers; the final reciprocal is one IEEE division.

    Scale shape: rides the BM25 explode+broadcast shape; the eval adds
    one |matching-docs| window and a scalar agg.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", ws_tokens(F.trim(F.col("text"))).alias("t"))
    d = toks.select("doc_id", F.size("t").cast("double").alias("dl"), "t")
    stats = d.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        d.select("doc_id", "dl", F.explode("t").alias("term"))
        .filter(F.col("term").isin("spark", "vector", "stream"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dft = tf.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    score = idf * F.col("tf") * (1.2 + 1) / (
        F.col("tf") + 1.2 * (1 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
    )
    bm = (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum(score), 6).alias("bm25"),
        )
    )
    ranked = bm.select(
        "doc_id",
        "n_terms",
        F.row_number().over(Window.orderBy(F.desc("bm25"), F.asc("doc_id"))).alias("rnk"),
    )
    return ranked.filter(F.col("n_terms") == 3).agg(
        F.min("rnk").cast("long").alias("first_relevant_rank"),
        F.sum(F.when(F.col("n_terms") == 3, 1).otherwise(0))
        .cast("long")
        .alias("n_relevant"),
        F.round(1.0 / F.min("rnk"), 6).alias("mrr"),
    )


@query(
    "calibration_reliability_bins",
    oracle="""
    WITH m AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS actual,
               CAST(ROUND((50000.0 + 1500.0 * (o_orderkey % 100)) * 100) AS BIGINT)
                   AS pred
        FROM orders
    ), binned AS (
        SELECT NTILE(10) OVER (ORDER BY pred, actual) AS bin, actual, pred FROM m
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(pred)   // COUNT(*) AS BIGINT) AS mean_pred_cents,
           CAST(SUM(actual) // COUNT(*) AS BIGINT) AS mean_actual_cents,
           CAST((SUM(pred) - SUM(actual)) // COUNT(*) AS BIGINT) AS bias_cents
    FROM binned GROUP BY bin
    """,
)
def calibration_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability (calibration) table for a price predictor: rows
    binned into prediction deciles, each reporting mean predicted vs
    mean actual and the signed bias — the regression counterpart of a
    classifier reliability diagram, and the diagnosis layer over
    `rmse_price_model`'s single score (RMSE says HOW wrong; this says
    WHERE and WHICH WAY). The stand-in predictor is the same
    deterministic hash-linear model the RMSE query scores. All columns
    exact BIGINT cents via integer floor-division.

    Scale shape: the ntile sorts (pred, actual) once — at extreme scale
    the decile cut points swap to approx percentiles; per-bin stats are
    a 10-row hash agg.
    """
    orders = load_table(spark, sf_dir, "orders")
    m = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("actual"),
        F.round((50000.0 + 1500.0 * (F.col("o_orderkey") % 100)) * 100)
        .cast("long")
        .alias("pred"),
    )
    binned = m.select(
        F.ntile(10).over(Window.orderBy("pred", "actual")).alias("bin"),
        "actual",
        "pred",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("pred").alias("sp"),
            F.sum("actual").alias("sa"),
        )
        .select(
            "bin",
            "n",
            F.expr("sp div n").cast("long").alias("mean_pred_cents"),
            F.expr("sa div n").cast("long").alias("mean_actual_cents"),
            F.expr("(sp - sa) div n").cast("long").alias("bias_cents"),
        )
    )


# ---------------------------------------------------------------------------
# wave 63: seasonal anomalies, lead-lag cross-correlation, assortativity
# ---------------------------------------------------------------------------


@query(
    "seasonal_residual_outlier_days",
    oracle="""
    WITH pts AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day FROM events
    ), bounds AS (
        SELECT MIN(day) AS lo, MAX(day) AS hi FROM pts
    ), grid AS (
        SELECT unnest(generate_series(lo, hi)) AS day FROM bounds
    ), daily AS (
        SELECT g.day, g.day % 7 AS dow, CAST(COUNT(p.day) AS BIGINT) AS x
        FROM grid g LEFT JOIN pts p ON p.day = g.day GROUP BY g.day
    ), dstats AS (
        SELECT dow, CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(x) AS BIGINT) AS sd
        FROM daily GROUP BY dow
    ), resid AS (
        SELECT d.day, d.dow, d.x,
               d.x * s.nd - s.sd AS r
        FROM daily d JOIN dstats s ON s.dow = d.dow
    ), mad AS (
        SELECT CAST(FLOOR(quantile_cont(ABS(r), 0.5)) AS BIGINT) AS m FROM resid
    )
    SELECT day, dow, x, CAST(r AS BIGINT) AS resid_scaled,
           CASE WHEN ABS(r) > 3 * m THEN 1 ELSE 0 END AS is_outlier
    FROM resid, mad
    ORDER BY ABS(r) DESC, day
    LIMIT 5
    """,
)
def seasonal_residual_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted anomaly days: daily event counts residualized
    against their own weekday mean (the `dow_seasonality_profile` cycle),
    top-5 days by |residual| with a 3×MAD outlier flag — 'which days
    were abnormal FOR THAT WEEKDAY', the detector that doesn't fire on
    every ordinary weekend dip.

    Exactness: residuals are x·n_dow − Σ_dow (BIGINT, the same
    denominator-clearing trick as CUSUM/ACF — the per-dow mean never
    becomes a float); the MAD threshold is the floor of an exact
    interpolated median of integers; ordering breaks ties on the day.

    Scale shape: the fact collapses to the day grid; weekday stats are
    a 7-row agg joined back; the MAD is a percentile over |days| rows;
    TakeOrdered emits the top-5.
    """
    from pyspark_movie_recommender_spark.operators.timeseries import (
        epoch_day,
        mean_cleared_devs,
        zero_filled_daily_grid,
    )

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(epoch_day("ts").alias("day")).withColumn("hit", F.lit(1))
    daily = zero_filled_daily_grid(pts, F.count("hit").cast("long")).select(
        "day", (F.col("day") % 7).alias("dow"), "x"
    )
    resid = mean_cleared_devs(daily, keys=["dow"]).select(
        "day", "dow", "x", F.col("d").alias("r")
    )
    mad = resid.agg(
        F.floor(F.expr("percentile(abs(r), 0.5)")).cast("long").alias("m")
    )
    return (
        resid.crossJoin(F.broadcast(mad))
        .orderBy(F.abs("r").desc(), F.asc("day"))
        .limit(5)
        .select(
            "day",
            "dow",
            "x",
            F.col("r").cast("long").alias("resid_scaled"),
            F.when(F.abs("r") > 3 * F.col("m"), 1).otherwise(0).alias("is_outlier"),
        )
    )


@query(
    "cross_correlation_types",
    oracle="""
    WITH pts AS (
        SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        FROM events WHERE event_type IN ('view', 'purchase')
    ), bounds AS (
        SELECT MIN(day) AS lo, MAX(day) AS hi FROM pts
    ), grid AS (
        SELECT unnest(generate_series(lo, hi)) AS day FROM bounds
    ), daily AS (
        SELECT g.day,
               CAST(SUM(CASE WHEN p.event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS a,
               CAST(SUM(CASE WHEN p.event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS b
        FROM grid g LEFT JOIN pts p ON p.day = g.day GROUP BY g.day
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb
        FROM daily
    ), dev AS (
        SELECT day,
               CAST(n * a - sa AS HUGEINT) AS da,
               CAST(n * b - sb AS HUGEINT) AS db
        FROM daily, stats
    ), den AS (
        SELECT SUM(da * da) AS va, SUM(db * db) AS vb FROM dev
    ), lags AS (
        SELECT unnest(generate_series(-3, 3)) AS lag
    )
    SELECT lag,
           ROUND(CAST(SUM(x.da * y.db) AS DOUBLE)
                 / sqrt(CAST(den.va AS DOUBLE) * CAST(den.vb AS DOUBLE)), 6)
               AS xcorr
    FROM lags JOIN dev x ON TRUE JOIN dev y ON y.day = x.day + lag, den
    GROUP BY lag, den.va, den.vb
    """,
)
def cross_correlation_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between daily view and purchase
    volumes at lags −3..+3 — 'do views predict purchases days later,
    or move same-day?' — the marketing/causality screening companion to
    the single-series `acf_daily_event_value`, built with the same
    denominator-clearing integer deviations (n·x−Σx) so numerator and
    variance sums are exact 38-digit decimals; only the final
    normalize-and-divide is floating point.

    Scale shape: both series collapse to one zero-filled day grid in a
    single conditional agg; the ±3-lag pairing and the correlation sums
    run on that |days|-row relation.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    pts = ev.select("event_type", epoch_day("ts").alias("day"))
    bounds = pts.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    grid = bounds.select(F.explode(F.expr("sequence(lo, hi)")).alias("day"))
    daily = (
        grid.join(pts, "day", "left")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("long")
            .alias("a"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("b"),
        )
    )
    stats = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a").cast("long").alias("sa"),
        F.sum("b").cast("long").alias("sb"),
    )
    dev = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        (F.col("n") * F.col("a") - F.col("sa")).cast("decimal(38,0)").alias("da"),
        (F.col("n") * F.col("b") - F.col("sb")).cast("decimal(38,0)").alias("db"),
    )
    den = dev.agg(
        F.sum(F.col("da") * F.col("da")).alias("va"),
        F.sum(F.col("db") * F.col("db")).alias("vb"),
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("long").alias("lag"))
    pairs = (
        lags.crossJoin(dev.select(F.col("day").alias("xd"), F.col("da").alias("xa")))
        .join(
            dev.select(F.col("day").alias("yd"), F.col("db").alias("yb")),
            F.col("yd") == F.col("xd") + F.col("lag"),
        )
        .groupBy("lag")
        .agg(F.sum(F.col("xa") * F.col("yb")).alias("num"))
    )
    return pairs.crossJoin(F.broadcast(den)).select(
        "lag",
        F.round(
            F.col("num").cast("double")
            / F.sqrt(F.col("va").cast("double") * F.col("vb").cast("double")),
            6,
        ).alias("xcorr"),
    )


@query(
    "degree_assortativity",
    oracle="""
    WITH fwd AS (
        SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), edges AS (
        SELECT 'c' || CAST(ck AS VARCHAR) AS src, 's' || CAST(sk AS VARCHAR) AS dst
        FROM fwd
        UNION ALL
        SELECT 's' || CAST(sk AS VARCHAR), 'c' || CAST(ck AS VARCHAR) FROM fwd
    ), deg AS (
        SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src
    ), ed AS (
        SELECT CAST(ds.d AS HUGEINT) AS x, CAST(dd.d AS HUGEINT) AS y
        FROM edges e JOIN deg ds ON ds.node = e.src
                     JOIN deg dd ON dd.node = e.dst
    ), s AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS m,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM ed
    )
    SELECT CAST(m AS BIGINT) AS m_edges,
           ROUND(CAST(m * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                        * CAST(m * syy - sy * sy AS DOUBLE)), 6)
               AS assortativity
    FROM s
    """,
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman's r) of the bidirected trade graph:
    the Pearson correlation of endpoint degrees over all directed edges
    — 'do hubs trade with hubs (r>0) or with the periphery (r<0)?',
    the third structural metric beside modularity and the k-core
    decomposition. Bipartite trade graphs are typically disassortative,
    which this measures rather than assumes.

    Every moment (Σx, Σxy, Σx², edge count) is an exact integer sum of
    BIGINT degrees in 38-digit arithmetic; the closed-form Pearson does
    exactly one sqrt and one division at the end, rounded to 6.

    Scale shape: the distinct edge set collapses first; degrees are one
    hash agg re-joined onto edges (node-keyed — broadcastable dims at
    this shape, co-partitioned joins at extreme scale); the moment agg
    is a 1-row reduce with map-side partials.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    fwd = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    e1 = fwd.select(
        F.concat(F.lit("c"), F.col("ck").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("sk").cast("string")).alias("dst"),
    )
    e2 = fwd.select(
        F.concat(F.lit("s"), F.col("sk").cast("string")).alias("src"),
        F.concat(F.lit("c"), F.col("ck").cast("string")).alias("dst"),
    )
    edges = e1.unionByName(e2)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    ed = (
        edges.join(
            deg.select(F.col("node").alias("src"), F.col("d").alias("xd")), "src"
        )
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("yd")), "dst")
        .select(
            F.col("xd").cast("decimal(38,0)").alias("x"),
            F.col("yd").cast("decimal(38,0)").alias("y"),
        )
    )
    s = ed.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return s.select(
        F.col("m").cast("long").alias("m_edges"),
        F.round(
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.sqrt(
                (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
                * (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                    "double"
                )
            ),
            6,
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# wave 64: cohort LTV, time-decay attribution, exact Gini
# ---------------------------------------------------------------------------


@query(
    "cohort_ltv_curve",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY 1
    ), sizes AS (
        SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM firsts GROUP BY 1
    ), spend AS (
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week,
                              CAST(date_trunc('week', e.ts) AS DATE)) // 7
                    AS BIGINT) AS week_offset,
               CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events e JOIN firsts f ON f.user_id = e.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2
    ), cum AS (
        SELECT cohort_week, week_offset,
               SUM(cents) OVER (PARTITION BY cohort_week ORDER BY week_offset)
                   AS cum_cents
        FROM spend
    )
    SELECT c.cohort_week, c.week_offset, s.n_users,
           CAST(c.cum_cents AS BIGINT) AS cum_cents,
           CAST(c.cum_cents // s.n_users AS BIGINT) AS ltv_cents_per_user
    FROM cum c JOIN sizes s ON s.cohort_week = c.cohort_week
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: cumulative purchase value per
    first-seen-week cohort by week offset, normalized to exact
    cents-per-user — the monetary companion to
    `cohort_retention_weekly`'s headcount triangle (retention says who
    came back; LTV says what they were worth, which is what payback
    windows are computed from). Integer floor-division keeps every cell
    BIGINT.

    Scale shape: first-seen and spend aggs both shuffle once on
    user_id and join co-partitioned; the cumulative window runs on the
    |cohorts|×|offsets| triangle; cohort sizes broadcast back.
    """
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    spend = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("long")
            .alias("week_offset"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    cum = spend.select(
        "cohort_week",
        "week_offset",
        F.sum("cents")
        .over(Window.partitionBy("cohort_week").orderBy("week_offset"))
        .alias("cum_cents"),
    )
    return cum.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_users",
        F.col("cum_cents").cast("long").alias("cum_cents"),
        F.expr("cum_cents div n_users").cast("long").alias("ltv_cents_per_user"),
    )


@query(
    "time_decay_attribution",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ), touches AS (
        SELECT user_id, ts, event_type FROM events
        WHERE event_type IN ('view', 'click')
    ), joined AS (
        SELECT p.event_id, p.cents, t.event_type AS channel,
               1000000 // CAST(pow(2,
                   (epoch_us(p.ts) - epoch_us(t.ts)) // 86400000000) AS BIGINT)
                   AS w
        FROM purchases p LEFT JOIN touches t
          ON t.user_id = p.user_id
         AND t.ts <= p.ts
         AND t.ts > p.ts - INTERVAL 3 DAY
    ), credited AS (
        SELECT event_id, cents,
               COALESCE(channel, 'unattributed') AS channel,
               COALESCE(w, 0) AS w,
               SUM(COALESCE(w, 0)) OVER (PARTITION BY event_id) AS sw
        FROM joined
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(CASE WHEN sw = 0 THEN cents
                         ELSE cents * w // sw END) AS BIGINT)
               AS credited_cents
    FROM credited GROUP BY channel
    """,
)
def time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution (half-life = 1 day): each
    purchase's cents split across the user's prior-3-day view/click
    touches with weights halving per day of age — the recency-respecting
    sibling of `linear_attribution_purchases`. Weights are
    1e6 ÷ 2^age_days (exact integers: 1000000/500000/250000), the
    per-purchase split is integer cents·w÷Σw, and purchases with no
    touches credit 'unattributed' in full — so every column is BIGINT
    and hash-stable with zero float shares.

    Scale shape: same single range-join on user_id as the linear form
    (AQE splits hot users), per-purchase weight sums ride one window on
    the joined relation, final census is |channels| rows.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("pts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("ts").alias("tts"), F.col("event_type").alias("channel")
    )
    age_days = F.expr(
        "(unix_micros(CAST(pts AS timestamp_ltz))"
        " - unix_micros(CAST(tts AS timestamp_ltz))) div 86400000000"
    )
    joined = purchases.join(
        touches,
        (purchases.user_id == touches.user_id)
        & (F.col("tts") <= F.col("pts"))
        & (F.col("tts") > F.col("pts") - F.expr("INTERVAL 3 DAY")),
        "left",
    ).select(
        "event_id",
        "cents",
        F.coalesce("channel", F.lit("unattributed")).alias("channel"),
        # 1e6 / 2^age: exact in double for age 0..2, truncating cast matches
        # the oracle's integer floor-division
        F.coalesce(
            (F.lit(1000000).cast("long") / F.pow(2.0, age_days.cast("double")))
            .cast("long"),
            F.lit(0),
        ).alias("w"),
    )
    credited = joined.select(
        "event_id",
        "cents",
        "channel",
        "w",
        F.sum("w").over(Window.partitionBy("event_id")).alias("sw"),
    )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.sum(
            F.when(F.col("sw") == 0, F.col("cents")).otherwise(
                F.expr("cents * w div sw")
            )
        )
        .cast("long")
        .alias("credited_cents"),
    )


@query(
    "gini_exact_customer_spend",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT CAST(x AS HUGEINT) AS x,
               CAST(ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS HUGEINT) AS i
        FROM spend
    ), s AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx,
               SUM((2 * i - (SELECT COUNT(*) FROM ranked) - 1) * x) AS num
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(sx AS BIGINT) AS total_cents,
           CAST(num * 1000000 // (n * sx) AS BIGINT) AS gini_ppm
    FROM s
    """,
)
def gini_exact_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of customer spend via the closed form
    G = Σ(2i−n−1)·x_i / (n·Σx) over spend-sorted customers — the scalar
    that `lorenz_curve_customer_spend` integrates and the rows-only
    `udaf_gini_per_segment` approximates engine-side; this one is
    hash-checkable to the exact ppm. Every term (ranks, the weighted
    sum, the n·Σx denominator) is 38-digit integer arithmetic; ties
    order by custkey so the rank weighting is deterministic (the Gini
    value itself is tie-order invariant, the pin makes it bit-stable).

    Scale shape: fact → per-customer agg → ONE rank window over the
    customer summary (range-partitioned sort at scale) → 1-row moment
    agg with map-side partials.
    """
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    ranked = spend.select(
        F.col("x").cast("decimal(38,0)").alias("x"),
        F.row_number()
        .over(Window.orderBy(F.asc("x"), F.asc("o_custkey")))
        .cast("decimal(38,0)")
        .alias("i"),
    )
    n_w = Window.partitionBy()
    withn = ranked.select(
        "x", "i", F.count(F.lit(1)).over(n_w).cast("decimal(38,0)").alias("n")
    )
    s = withn.agg(
        F.max("n").alias("n"),
        F.sum("x").alias("sx"),
        F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("x")).alias("num"),
    )
    return s.select(
        F.col("n").cast("long").alias("n_customers"),
        F.col("sx").cast("long").alias("total_cents"),
        (F.col("num") * 1000000 / (F.col("n") * F.col("sx")))
        .cast("long")
        .alias("gini_ppm"),
    )


# ---------------------------------------------------------------------------
# wave 65: rolling distinct users (DAU/WAU stickiness)
# ---------------------------------------------------------------------------


@query(
    "rolling_mau_stickiness",
    bench=True,
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               user_id
        FROM events
    ), days AS (
        SELECT DISTINCT day FROM du
    ), dau AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day
    ), wau AS (
        SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau7
        FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day
    )
    SELECT d.day, a.dau, w.wau7,
           CAST(a.dau * 1000000 // w.wau7 AS BIGINT) AS stickiness_ppm
    FROM days d JOIN dau a ON a.day = d.day JOIN wau w ON w.day = d.day
    """,
)
def rolling_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day plus the DAU/WAU stickiness
    ratio in exact ppm — the engagement health metric. Rolling COUNT
    (DISTINCT) is the classic window functions CAN'T do (distinct isn't
    decomposable over sliding frames): the exact formulation joins the
    per-day distinct-user relation to a ±6-day range and re-counts —
    correct, and the checkable spec; the documented scale path swaps the
    inner relation for per-day HLL sketches unioned over the window
    (`hll_sketch_rollup` machinery), trading exactness for O(1) merge
    state.

    Scale shape: the fact collapses to the (day, user) distinct relation
    first (one shuffle, map-side partial dedup); the 7× fan-out joins
    day keys only, and the recount agg shuffles (day, user) pairs
    bounded by 7·|daily actives| — never raw events.
    """
    ev = load_table(spark, sf_dir, "events")
    du = (
        ev.select(
            F.expr("unix_micros(CAST(ts AS timestamp_ltz)) div 86400000000")
            .cast("long")
            .alias("day"),
            "user_id",
        )
        .distinct()
    )
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    u = du.select(F.col("day").alias("uday"), "user_id")
    wau = (
        days.join(
            u,
            (F.col("uday") >= F.col("day") - 6) & (F.col("uday") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("long").alias("wau7"))
    )
    return (
        days.join(dau, "day")
        .join(wau, "day")
        .select(
            "day",
            "dau",
            "wau7",
            F.expr("dau * 1000000L div wau7").cast("long").alias("stickiness_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# wave 66: CUPED experiment adjustment, audience overlap
# ---------------------------------------------------------------------------


@query(
    "cuped_adjusted_readout",
    oracle="""
    WITH pts AS (
        SELECT user_id,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ), bounds AS (
        SELECT (MIN(day) + MAX(day)) // 2 AS mid FROM pts
    ), per_user AS (
        SELECT user_id,
               ((user_id * 2654435761) % 4294967296) % 2 AS arm,
               CAST(SUM(CASE WHEN day <  mid THEN cents ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN day >= mid THEN cents ELSE 0 END) AS BIGINT) AS y
        FROM pts, bounds GROUP BY user_id
    ), mo AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx
        FROM per_user
    ), theta AS (
        SELECT CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS th,
               CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx
        FROM mo
    )
    SELECT arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(y) // COUNT(*) AS BIGINT) AS raw_mean_cents,
           ROUND(AVG(CAST(y AS DOUBLE)) - th * (AVG(CAST(x AS DOUBLE)) - mx), 4)
               AS cuped_mean_cents,
           ROUND(th, 6) AS theta
    FROM per_user, theta
    GROUP BY arm, th, mx
    """,
)
def cuped_adjusted_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout: per-user post-period spend
    adjusted by the pre-period covariate (Y′ = Y − θ·(X − X̄), θ the
    pooled OLS slope) under the deterministic-hash arm assignment the
    SRM guard audits — the variance-reduction technique that makes
    experiments read out in days instead of weeks. Arms differ only by
    hash here, so the adjusted means also demonstrate the null case.

    θ's numerator/denominator are exact 128-bit integer moments
    (n·Σxy − Σx·Σy over BIGINT cents — zero float accumulation); θ, the
    means, and the adjustment are then a handful of IEEE ops on those
    exact sums, rounded for the gate. Per-arm raw means stay pure
    BIGINT floor-division.

    Scale shape: one pass collapses events to per-user (x, y) pairs
    (map-side partials); the moment agg is 1 row; the readout agg is
    |arms| rows. CUPED at 100 TB is exactly this shape.
    """
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        F.expr("unix_micros(CAST(ts AS timestamp_ltz)) div 86400000000")
        .cast("long")
        .alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    bounds = pts.agg(F.expr("(min(day) + max(day)) div 2").alias("mid"))
    per_user = (
        pts.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("day") < F.col("mid"), F.col("cents")).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("day") >= F.col("mid"), F.col("cents")).otherwise(0))
            .cast("long")
            .alias("y"),
        )
        .select(
            (((F.col("user_id") * 2654435761) % 4294967296) % 2).alias("arm"),
            "x",
            "y",
        )
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    mo = per_user.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
    )
    theta = mo.select(
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        ).alias("th"),
        (F.col("sx").cast("double") / F.col("n").cast("double")).alias("mx"),
    )
    return (
        per_user.crossJoin(F.broadcast(theta))
        .groupBy("arm", "th", "mx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("y").alias("sy"),
            F.avg(F.col("y").cast("double")).alias("my"),
            F.avg(F.col("x").cast("double")).alias("mxa"),
        )
        .select(
            "arm",
            "n_users",
            F.expr("sy div n_users").cast("long").alias("raw_mean_cents"),
            F.round(
                F.col("my") - F.col("th") * (F.col("mxa") - F.col("mx")), 4
            ).alias("cuped_mean_cents"),
            F.round("th", 6).alias("theta"),
        )
    )


@query(
    "segment_overlap_jaccard",
    oracle="""
    WITH tu AS (
        SELECT DISTINCT event_type, user_id FROM events
    ), sizes AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM tu GROUP BY 1
    ), inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM tu a JOIN tu b
          ON b.user_id = a.user_id AND b.event_type > a.event_type
        GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, i.n_both,
           sa.n AS n_a, sb.n AS n_b,
           CAST(i.n_both * 1000000 // (sa.n + sb.n - i.n_both) AS BIGINT)
               AS jaccard_ppm
    FROM inter i JOIN sizes sa ON sa.event_type = i.type_a
                 JOIN sizes sb ON sb.event_type = i.type_b
    """,
)
def segment_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between behaviour segments: for every event-type
    pair, the exact user-set intersection and Jaccard similarity in ppm
    — 'are clickers and purchasers the same people?', the audience
    planning/cannibalization census. The exact hash-checkable twin of
    what `theta_token_overlap` answers with mergeable sketches when the
    sets can't be co-shuffled.

    Scale shape: events collapse to the distinct (type, user) relation
    once; the pair intersection equi-joins on user_id (fan-out bounded
    by |types| per user, never quadratic in users); sizes broadcast onto
    the |types|² result. All BIGINT.
    """
    ev = load_table(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_b") > F.col("type_a"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_a"),
                                     F.col("n").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_b"),
                                     F.col("n").alias("n_b"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.expr("n_both * 1000000L div (n_a + n_b - n_both)")
            .cast("long")
            .alias("jaccard_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# wave 67: MV rewrite equivalence, char-level n-gram profiles
# ---------------------------------------------------------------------------


@query(
    "mv_rewrite_monthly_from_daily",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders GROUP BY 1
    """,
)
def mv_rewrite_monthly_from_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view rewrite: the monthly revenue rollup answered
    FROM the daily pre-aggregate (the MV a BI layer maintains), never
    rescanning the fact — while the oracle recomputes straight from
    orders, so hash equality IS the proof that answering from the MV is
    lossless (count and BIGINT-cents sums are mergeable partials;
    averages would need sum+count carried separately — the classic MV
    design rule this query pins).

    Scale shape: the daily MV is |days| rows; the monthly answer is one
    tiny re-aggregation of it. At 100 TB the fact scan happens once a
    day into the MV; every downstream grain (week/month/quarter) is
    this re-agg — that asymmetry is the whole point of the pattern
    (`incremental_view_maintenance` keeps the MV fresh; this query is
    the read path).
    """
    orders = load_table(spark, sf_dir, "orders")
    daily_mv = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    return (
        daily_mv.groupBy(F.date_trunc("month", F.col("day")).cast("date").alias("month"))
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )


@query(
    "char_trigram_profile",
    oracle="""
    WITH chars AS (
        SELECT lang, lower(trim(text)) AS s FROM documents
        WHERE length(trim(text)) >= 3
    ), grams AS (
        SELECT lang, substr(s, g.i, 3) AS tri
        FROM chars,
             LATERAL (SELECT unnest(generate_series(1, length(s) - 2)) AS i) g
    ), counts AS (
        SELECT lang, tri, CAST(COUNT(*) AS BIGINT) AS n
        FROM grams GROUP BY lang, tri
    ), ranked AS (
        SELECT lang, tri, n,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY n DESC, tri) AS BIGINT) AS rnk
        FROM counts
    )
    SELECT lang, tri, n, rnk FROM ranked WHERE rnk <= 10
    """,
)
def char_trigram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 character trigrams per language — the char-level signal
    real language identifiers (CLD, fastText) are built on, and the
    character-granularity member of the n-gram family (tokens:
    heavy-hitters/PMI; token n-grams: diversity/decontamination; chars:
    this). Whitespace is part of the trigram alphabet by design — word
    boundaries are the strongest language cue.

    Scale shape: trigrams enumerate in-row from a sequence (no join);
    one (lang, tri) hash agg with map-side combine (alphabet³-bounded
    keys); per-lang top-10 via WindowGroupLimit-prunable rank with full
    (n desc, tri) tie-break so the cut is engine-stable.
    """
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "lang", F.lower(F.trim(F.col("text"))).alias("s")
    ).filter(F.length("s") >= 3)
    grams = chars.select(
        "lang",
        F.explode(
            F.expr("transform(sequence(1, length(s) - 2), i -> substr(s, i, 3))")
        ).alias("tri"),
    )
    counts = grams.groupBy("lang", "tri").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ranked = counts.select(
        "lang",
        "tri",
        "n",
        F.row_number()
        .over(Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("tri")))
        .cast("long")
        .alias("rnk"),
    )
    return ranked.filter(F.col("rnk") <= 10)


# ---------------------------------------------------------------------------
# wave 68: per-dimension embedding stats, centroid shift between labels
# ---------------------------------------------------------------------------


@query(
    "embedding_dimension_stats",
    oracle="""
    WITH vals AS (
        SELECT g.i AS dim,
               CAST(ROUND(CAST(e.embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT)
                   AS v
        FROM embeddings e,
             LATERAL (SELECT unnest(generate_series(1, len(e.embedding))) AS i) g
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(v) AS BIGINT) AS min_u,
           CAST(MAX(v) AS BIGINT) AS max_u,
           CAST(SUM(v) // COUNT(*) AS BIGINT) AS mean_u
    FROM vals GROUP BY dim
    """,
)
def embedding_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION statistics of the embedding matrix (count/min/max/
    mean in exact micro-units) — the feature-scaling profile a whitening
    or normalization step consumes, and the column-wise companion to the
    per-vector `embedding_norm_stats`. A dimension whose range collapses
    is dead weight (matryoshka-truncate it); one whose mean drifts far
    from zero breaks cosine-vs-dot equivalence assumptions.

    Values are quantized to BIGINT micro-units BEFORE aggregation, so
    min/max/mean are exact integers with no float-summation-order
    hazard. 1-based dimension ids match the oracle's list indexing.

    Scale shape: a map-side posexplode fans each vector into (dim, v)
    pairs; one |dims|-row hash agg with map-side partials absorbs the
    volume. No joins, no windows.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("p", "ev")
    ).select(
        (F.col("p") + 1).cast("long").alias("dim"),
        F.round(F.col("ev") * 1000000).cast("long").alias("v"),
    )
    return (
        vals.groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("v").cast("long").alias("min_u"),
            F.max("v").cast("long").alias("max_u"),
            F.sum("v").alias("sv"),
        )
        .select(
            "dim",
            "n",
            "min_u",
            "max_u",
            F.expr("sv div n").cast("long").alias("mean_u"),
        )
    )


@query(
    "centroid_shift_labels",
    oracle="""
    WITH vals AS (
        SELECT e.label, g.i AS dim,
               CAST(ROUND(CAST(e.embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT)
                   AS v
        FROM embeddings e,
             LATERAL (SELECT unnest(generate_series(1, len(e.embedding))) AS i) g
    ), cent AS (
        SELECT label, dim, CAST(SUM(v) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM vals GROUP BY label, dim
    ), pairs AS (
        SELECT a.label AS label_a, b.label AS label_b,
               SUM(CAST(a.s * b.c - b.s * a.c AS HUGEINT)
                   * CAST(a.s * b.c - b.s * a.c AS HUGEINT)) AS num2,
               ANY_VALUE(CAST(a.c AS HUGEINT) * b.c) AS cc
        FROM cent a JOIN cent b ON b.dim = a.dim AND b.label > a.label
        GROUP BY a.label, b.label
    )
    SELECT label_a, label_b,
           ROUND(sqrt(CAST(num2 AS DOUBLE)) / CAST(cc AS DOUBLE), 6)
               AS centroid_dist_u
    FROM pairs
    """,
)
def centroid_shift_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise centroid distances between embedding cluster labels, in
    micro-units — the separation matrix behind 'are these clusters
    actually distinct', feeding merge decisions for SemDedup cells and
    k-means routing (`kmeans_embedding_assign`). Distances use the
    common-denominator identity ‖s_a/c_a − s_b/c_b‖ =
    √Σ(s_a·c_b − s_b·c_a)² / (c_a·c_b): the inner sums are EXACT
    128-bit integers over micro-unit coordinates, so both engines reach
    the identical rational before one sqrt+divide.

    Scale shape: vectors explode map-side into (label, dim, v); the
    centroid agg collapses to |labels|×|dims| rows; the pair join runs
    on that tiny relation keyed by dim. The corpus never pairs with
    itself.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("p", "ev"),
    ).select(
        "label",
        (F.col("p") + 1).alias("dim"),
        F.round(F.col("ev") * 1000000).cast("long").alias("v"),
    )
    cent = vals.groupBy("label", "dim").agg(
        F.sum("v").cast("long").alias("s"), F.count(F.lit(1)).cast("long").alias("c")
    )
    a = cent.select(
        F.col("label").alias("label_a"),
        "dim",
        F.col("s").alias("sa"),
        F.col("c").alias("ca"),
    )
    b = cent.select(
        F.col("label").alias("label_b"),
        "dim",
        F.col("s").alias("sb"),
        F.col("c").alias("cb"),
    )
    diff = (F.col("sa") * F.col("cb") - F.col("sb") * F.col("ca")).cast(
        "decimal(38,0)"
    )
    pairs = (
        a.join(b, "dim")
        .filter(F.col("label_b") > F.col("label_a"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(diff * diff).alias("num2"),
            F.first((F.col("ca").cast("decimal(38,0)") * F.col("cb"))).alias("cc"),
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        F.round(
            F.sqrt(F.col("num2").cast("double")) / F.col("cc").cast("double"), 6
        ).alias("centroid_dist_u"),
    )


# ---------------------------------------------------------------------------
# wave 69: Wilson proportion bounds, Laspeyres price index
# ---------------------------------------------------------------------------


@query(
    "wilson_conversion_bounds",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS viewed,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS bought
        FROM events GROUP BY user_id
    ), seg AS (
        SELECT user_id % 4 AS segment, bought FROM per_user WHERE viewed = 1
    ), c AS (
        SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(bought) AS BIGINT) AS k
        FROM seg GROUP BY segment
    )
    SELECT segment, n, k,
           ROUND(CAST(k AS DOUBLE) / n, 6) AS p_hat,
           ROUND((CAST(k AS DOUBLE) / n + 1.9208 / n
                  - 1.96 * sqrt((CAST(k AS DOUBLE) / n)
                        * (1 - CAST(k AS DOUBLE) / n) / n + 0.9604 / (n * n)))
                 / (1 + 3.8416 / n), 6) AS wilson_lo,
           ROUND((CAST(k AS DOUBLE) / n + 1.9208 / n
                  + 1.96 * sqrt((CAST(k AS DOUBLE) / n)
                        * (1 - CAST(k AS DOUBLE) / n) / n + 0.9604 / (n * n)))
                 / (1 + 3.8416 / n), 6) AS wilson_hi
    FROM c
    """,
)
def wilson_conversion_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase conversion rate per (hash-derived) user segment
    with Wilson-score 95% bounds — the proportion-uncertainty tool that
    stays honest at small n and extreme rates where the naive ±1.96·SE
    interval leaves [0,1]. Bootstrap CI covers means; this covers
    rates; together they bracket the readout surface.

    Counts are exact BIGINTs; the Wilson formula is a fixed dag of IEEE
    ops (z=1.96 constants pre-squared: 3.8416, 1.9208, 0.9604) on those
    exact counts, identical on both engines, rounded to 6.

    Scale shape: events collapse per-user map-side (two MAX flags), the
    segment census is a 4-row agg. Nothing wide.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("viewed"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "bought"
        ),
    )
    c = (
        per_user.filter(F.col("viewed") == 1)
        .select((F.col("user_id") % 4).alias("segment"), "bought")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("bought").cast("long").alias("k"),
        )
    )
    p = F.col("k").cast("double") / F.col("n")
    n = F.col("n")
    half = 1.96 * F.sqrt(p * (1 - p) / n + 0.9604 / (n * n))
    denom = 1 + 3.8416 / n
    return c.select(
        "segment",
        "n",
        "k",
        F.round(p, 6).alias("p_hat"),
        F.round((p + 1.9208 / n - half) / denom, 6).alias("wilson_lo"),
        F.round((p + 1.9208 / n + half) / denom, 6).alias("wilson_hi"),
    )


@query(
    "laspeyres_price_index",
    oracle="""
    WITH m AS (
        SELECT l_partkey,
               CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem GROUP BY 1, 2
    ), base AS (
        SELECT l_partkey,
               cents * 1000 // qty AS base_milli_per_unit,
               qty AS base_qty
        FROM m WHERE month = (SELECT MIN(month) FROM m)
    ), cur AS (
        SELECT m.month,
               SUM(CAST(m.cents * 1000 // m.qty AS HUGEINT) * b.base_qty)
                   AS cur_basket,
               SUM(CAST(b.base_milli_per_unit AS HUGEINT) * b.base_qty)
                   AS base_basket
        FROM m JOIN base b ON b.l_partkey = m.l_partkey
        GROUP BY m.month
    )
    SELECT month,
           CAST(cur_basket * 1000000 // base_basket AS BIGINT) AS laspeyres_ppm
    FROM cur
    """,
)
def laspeyres_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index per ship month: the base month's basket
    (its parts, at their base quantities) repriced at each month's unit
    prices, as exact ppm of the base cost — the inflation/price-drift
    measure over the matched basket (parts absent in a month simply
    drop out of that month's numerator, the standard matched-sample
    convention). Unit prices are integer milli-cents (cents·1000 ÷ qty)
    so the whole index is BIGINT/128-bit arithmetic with zero float
    drift.

    Scale shape: lineitem collapses once to (part, month) price/qty
    partials; the base basket is one month's slice joined back
    part-keyed (broadcast at dim scale); per-month totals are a tiny
    agg. No windows over the fact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        "l_partkey",
        F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("month"),
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
    )
    base_month = m.agg(F.min("month").alias("bm"))
    base = (
        m.crossJoin(F.broadcast(base_month))
        .filter(F.col("month") == F.col("bm"))
        .select(
            "l_partkey",
            F.expr("cents * 1000L div qty").alias("base_milli_per_unit"),
            F.col("qty").alias("base_qty"),
        )
    )
    cur = (
        m.join(base, "l_partkey")
        .groupBy("month")
        .agg(
            F.sum(
                F.expr("cents * 1000L div qty").cast("decimal(38,0)")
                * F.col("base_qty")
            ).alias("cur_basket"),
            F.sum(
                F.col("base_milli_per_unit").cast("decimal(38,0)")
                * F.col("base_qty")
            ).alias("base_basket"),
        )
    )
    return cur.select(
        "month",
        (F.col("cur_basket") * 1000000 / F.col("base_basket"))
        .cast("long")
        .alias("laspeyres_ppm"),
    )


# ---------------------------------------------------------------------------
# wave 70: power-iteration principal direction, two-proportion z-test
# ---------------------------------------------------------------------------


@query(
    "power_iteration_top_pc",
    oracle="""
    WITH vals AS (
        SELECT e.vec_id, g.i AS dim,
               CAST(ROUND(CAST(e.embedding[g.i] AS DOUBLE) * 100) AS BIGINT) AS v
        FROM embeddings e,
             LATERAL (SELECT unnest(generate_series(1, len(e.embedding))) AS i) g
    ), sums AS (
        SELECT dim, CAST(SUM(v) AS BIGINT) AS s FROM vals GROUP BY dim
    ), n AS (
        SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM vals
    ), cov AS (
        SELECT a.dim AS i, b.dim AS j,
               CAST(n.n AS HUGEINT) * SUM(CAST(a.v AS HUGEINT) * b.v)
                   - CAST(sa.s AS HUGEINT) * sb.s AS c
        FROM vals a
        JOIN vals b ON b.vec_id = a.vec_id
        JOIN sums sa ON sa.dim = a.dim
        JOIN sums sb ON sb.dim = b.dim, n
        GROUP BY a.dim, b.dim, n.n, sa.s, sb.s
    ), y1 AS (
        SELECT i AS dim, c AS y FROM cov WHERE j = 1
    ), y2 AS (
        SELECT cov.i AS dim, SUM((cov.c // 1000) * (y1.y // 1000)) AS y
        FROM cov JOIN y1 ON y1.dim = cov.j
        GROUP BY cov.i
    ), mx AS (
        SELECT MAX(ABS(y)) AS m FROM y2
    )
    SELECT dim, CAST(y * 1000000 // m AS BIGINT) AS pc_ppm
    FROM y2, mx
    """,
)
def power_iteration_top_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two steps of power iteration for the leading principal component
    of the embedding covariance, entirely in EXACT integer arithmetic —
    linear algebra as relational joins: the covariance matrix is the
    centered Gram identity n·Σv_iv_j − Σv_i·Σv_j over centi-unit
    coordinates (128-bit exact), and y = C·(C·e₁) is two matrix-vector
    joins with a deterministic 10³ truncating down-scaling between products to
    keep magnitudes inside 128 bits. Output is the direction as exact
    ppm of its max coordinate — a hash-checkable PCA estimate (two
    iterations from e₁: a coarse but deterministic direction; more
    rounds = more joins, same shape). The anisotropy this finds is what
    `jl_random_projection` ignores and mean-centering debates in
    cosine retrieval hinge on.

    Scale shape: the Gram accumulation is the only data-sized job —
    explode to (id, dim, v) then one self-join on id bounded by 64²
    output cells per vector, collapsing in a dims²-row agg with
    map-side partials; everything after runs on the 64×64 relation.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("p", "ev"),
    ).select(
        "vec_id",
        (F.col("p") + 1).alias("dim"),
        F.round(F.col("ev") * 100).cast("long").alias("v"),
    )
    sums = vals.groupBy("dim").agg(F.sum("v").cast("long").alias("s"))
    n = vals.agg(F.countDistinct("vec_id").cast("long").alias("n"))
    a = vals.select("vec_id", F.col("dim").alias("i"), F.col("v").alias("va"))
    b = vals.select("vec_id", F.col("dim").alias("j"), F.col("v").alias("vb"))
    gram = (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg(
            F.sum(F.col("va").cast("decimal(38,0)") * F.col("vb")).alias("svv")
        )
    )
    cov = (
        gram.join(
            F.broadcast(sums.select(F.col("dim").alias("i"), F.col("s").alias("sa"))),
            "i",
        )
        .join(
            F.broadcast(sums.select(F.col("dim").alias("j"), F.col("s").alias("sb"))),
            "j",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            (
                F.col("n").cast("decimal(38,0)") * F.col("svv")
                - F.col("sa").cast("decimal(38,0)") * F.col("sb")
            ).alias("c"),
        )
    )
    y1 = cov.filter(F.col("j") == 1).select(F.col("i").alias("dim"), F.col("c").alias("y"))
    y2 = (
        cov.join(F.broadcast(y1.select(F.col("dim").alias("j"), F.col("y").alias("y1"))), "j")
        .groupBy("i")
        .agg(
            # truncate-toward-zero scaling (matches DuckDB's integer //):
            # (x - x % 1000) / 1000 is exact for either sign
            F.sum(
                F.expr("CAST((c - (c % 1000)) / 1000 AS DECIMAL(38,0))")
                * F.expr("CAST((y1 - (y1 % 1000)) / 1000 AS DECIMAL(38,0))")
            ).alias("y")
        )
        .select(F.col("i").alias("dim"), "y")
    )
    mx = y2.agg(F.max(F.abs(F.col("y"))).alias("m"))
    return y2.crossJoin(F.broadcast(mx)).select(
        "dim",
        (F.col("y") * 1000000 / F.col("m")).cast("long").alias("pc_ppm"),
    )


@query(
    "two_proportion_ztest",
    oracle="""
    WITH pts AS (
        SELECT user_id, event_type,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        FROM events
    ), bounds AS (
        SELECT (MIN(day) + MAX(day)) // 2 AS mid FROM pts
    ), tagged AS (
        SELECT CASE WHEN day < mid THEN 0 ELSE 1 END AS period,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
        FROM pts, bounds
    ), c AS (
        SELECT CAST(SUM(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN period = 0 THEN b ELSE 0 END) AS BIGINT) AS k0,
               CAST(SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN period = 1 THEN b ELSE 0 END) AS BIGINT) AS k1
        FROM tagged
    )
    SELECT n0, k0, n1, k1,
           ROUND(CAST(k0 AS DOUBLE) / n0 - CAST(k1 AS DOUBLE) / n1, 6) AS diff,
           ROUND((CAST(k0 AS DOUBLE) / n0 - CAST(k1 AS DOUBLE) / n1)
                 / sqrt((CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
                        * (1 - CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)), 6) AS z
    FROM c
    """,
)
def two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test: did the PURCHASE SHARE of all events change
    between the first and second half of the observation window? The
    pooled-variance z statistic over exact per-period event counts — the
    difference-in-rates hypothesis test beside chi-square (composition),
    KS (distribution), and CUSUM (when). Counts are exact BIGINTs; z is
    a fixed IEEE dag on them, rounded to 6. (Event-level shares, not
    per-user flags: on this fixture every user purchases in every
    period, which would degenerate the pooled variance to zero.)

    Scale shape: one map-side tagging pass and a 1-row census agg with
    map-side partials. Nothing wide.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    pts = ev.select("user_id", "event_type", epoch_day("ts").alias("day"))
    bounds = pts.agg(F.expr("(min(day) + max(day)) div 2").alias("mid"))
    tagged = pts.crossJoin(F.broadcast(bounds)).select(
        F.when(F.col("day") < F.col("mid"), 0).otherwise(1).alias("period"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("b"),
    )
    c = tagged.agg(
        F.sum(F.when(F.col("period") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("period") == 0, F.col("b")).otherwise(0))
        .cast("long")
        .alias("k0"),
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("period") == 1, F.col("b")).otherwise(0))
        .cast("long")
        .alias("k1"),
    )
    p0 = F.col("k0").cast("double") / F.col("n0")
    p1 = F.col("k1").cast("double") / F.col("n1")
    pp = (F.col("k0") + F.col("k1")).cast("double") / (F.col("n0") + F.col("n1"))
    z = (p0 - p1) / F.sqrt(pp * (1 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1")))
    return c.select(
        "n0", "k0", "n1", "k1",
        F.round(p0 - p1, 6).alias("diff"),
        F.round(z, 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# wave 71: journey trigram paths, chance-corrected classifier agreement
# ---------------------------------------------------------------------------


@query(
    "top_event_trigram_paths",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type, 1) OVER w AS p1,
               LAG(event_type, 2) OVER w AS p2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT p2 AS step1, p1 AS step2, event_type AS step3,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE p2 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, step1, step2, step3
    LIMIT 10
    """,
)
def top_event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step user journeys (event-type trigrams over each
    user's time-ordered stream) — the Sankey/path-analysis view one
    level deeper than `event_transition_matrix`'s bigrams: 'what do
    users do around an error', 'which 3-step paths end in purchase'.
    Ordering ties break on the full path so the cut is engine-stable;
    the lag window carries the (ts, event_id) total order.

    Scale shape: one user_id exchange for the two lags; the path census
    collapses to ≤|types|³ rows with map-side partials; TakeOrdered
    emits the top-10.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    return (
        seq.select(
            F.col("p2").alias("step1"),
            F.col("p1").alias("step2"),
            F.col("event_type").alias("step3"),
        )
        .groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "step1", "step2", "step3")
        .limit(10)
    )


@query(
    "classifier_agreement_kappa",
    oracle="""
    WITH split AS (
        SELECT doc_id, lang,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(lower(trim(text)), '\\s+') END AS t,
               ((doc_id * 2654435761) % 4294967296) % 100 AS bucket
        FROM documents
    ),
    train_tok AS (
        SELECT lang, unnest(t) AS w FROM split WHERE bucket < 80
    ),
    counts AS (
        SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM train_tok GROUP BY lang, w
    ),
    n_lang AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_l FROM train_tok GROUP BY lang
    ),
    vocab AS (
        SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM train_tok
    ),
    priors AS (
        SELECT lang,
               CAST(ROUND(ln(CAST(COUNT(*) AS DOUBLE)
                   / (SELECT COUNT(*) FROM split WHERE bucket < 80)) * 1000000)
                   AS BIGINT) AS prior_unats
        FROM split WHERE bucket < 80 GROUP BY lang
    ),
    test_tok AS (
        SELECT doc_id, lang AS true_lang, w, CAST(COUNT(*) AS BIGINT) AS k
        FROM (SELECT doc_id, lang, unnest(t) AS w FROM split WHERE bucket >= 80)
        GROUP BY doc_id, lang, w
    ),
    scored AS (
        SELECT tt.doc_id, tt.true_lang, nl.lang AS cand,
               SUM(tt.k * CAST(ROUND(ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)
                   / (nl.n_l + vocab.v)) * 1000000) AS BIGINT)) AS tok_unats
        FROM test_tok tt
        CROSS JOIN n_lang nl
        CROSS JOIN vocab
        LEFT JOIN counts c ON c.lang = nl.lang AND c.w = tt.w
        GROUP BY tt.doc_id, tt.true_lang, nl.lang
    ),
    pred AS (
        SELECT true_lang, cand AS pred_lang
        FROM (
            SELECT true_lang, cand,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id
                       ORDER BY tok_unats + p.prior_unats DESC, cand) AS rn
            FROM scored JOIN priors p ON p.lang = scored.cand
        ) WHERE rn = 1
    ),
    conf AS (
        SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM pred GROUP BY 1, 2
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn,
               CAST(SUM(CASE WHEN true_lang = pred_lang THEN n ELSE 0 END)
                    AS BIGINT) AS agree
        FROM conf
    ),
    marg AS (
        SELECT CAST(SUM(r.rn * c.cn) AS HUGEINT) AS pe_num
        FROM (SELECT true_lang AS l, SUM(n) AS rn FROM conf GROUP BY 1) r
        JOIN (SELECT pred_lang AS l, SUM(n) AS cn FROM conf GROUP BY 1) c
          ON c.l = r.l
    )
    SELECT nn AS n_docs, agree AS n_agree,
           CAST(agree * 1000000 // nn AS BIGINT) AS accuracy_ppm,
           CAST((agree * nn - pe_num) * 1000000
                // (CAST(nn AS HUGEINT) * nn - pe_num) AS BIGINT) AS kappa_ppm
    FROM tot, marg
    """,
)
def classifier_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa for the naive-Bayes language identifier: accuracy
    corrected for chance agreement, κ = (p_o − p_e)/(1 − p_e) with
    p_e from the confusion matrix's marginals — the honest skill score
    when classes are imbalanced (this corpus is ~50% English, so raw
    accuracy flatters a majority-class guesser). Computed as exact
    128-bit integer ratios in ppm: κ = (agree·N − Σ row_i·col_i)·10⁶ ÷
    (N² − Σ row_i·col_i).

    Scale shape: rides the NB scoring shape (`naive_bayes_lang_confusion`)
    to the |langs|² confusion matrix, then everything is constant-sized
    marginal algebra.
    """
    conf = QUERIES["naive_bayes_lang_confusion"](spark, sf_dir)
    tot = conf.agg(
        F.sum("n_docs").cast("long").alias("nn"),
        F.sum(
            F.when(F.col("true_lang") == F.col("pred_lang"), F.col("n_docs")).otherwise(0)
        )
        .cast("long")
        .alias("agree"),
    )
    r = conf.groupBy(F.col("true_lang").alias("l")).agg(F.sum("n_docs").alias("rn"))
    c = conf.groupBy(F.col("pred_lang").alias("l")).agg(F.sum("n_docs").alias("cn"))
    marg = (
        r.join(c, "l")
        .agg(
            F.sum(F.col("rn").cast("decimal(38,0)") * F.col("cn")).alias("pe_num")
        )
    )
    return tot.crossJoin(F.broadcast(marg)).select(
        F.col("nn").alias("n_docs"),
        F.col("agree").alias("n_agree"),
        F.expr("agree * 1000000L div nn").cast("long").alias("accuracy_ppm"),
        (
            (F.col("agree").cast("decimal(38,0)") * F.col("nn") - F.col("pe_num"))
            * 1000000
            / (
                F.col("nn").cast("decimal(38,0)") * F.col("nn") - F.col("pe_num")
            )
        )
        .cast("long")
        .alias("kappa_ppm"),
    )


# ---------------------------------------------------------------------------
# wave 72: business-day latency, burst-rate detection
# ---------------------------------------------------------------------------


@query(
    "business_day_ship_latency",
    oracle="""
    WITH pairs AS (
        SELECT o.o_orderpriority AS priority,
               CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS d0,
               CAST(epoch_us(l.l_shipdate)  // 86400000000 AS BIGINT) AS d1
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= o.o_orderdate
    ), biz AS (
        -- business days in [d0, d1): full weeks * 5 + weekday remainder.
        -- epoch day 0 = Thursday => weekday index (day + 3) % 7, Mon=0.
        SELECT priority,
               ((d1 - d0) // 7) * 5
               + GREATEST(0, LEAST((d0 + 3) % 7 + (d1 - d0) % 7, 5)
                             - ((d0 + 3) % 7))
               + GREATEST(0, LEAST((d0 + 3) % 7 + (d1 - d0) % 7 - 7, 5))
               AS bdays
        FROM pairs
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(bdays) AS BIGINT) AS total_bdays,
           CAST(SUM(bdays) * 1000 // COUNT(*) AS BIGINT) AS mean_bdays_milli,
           CAST(FLOOR(quantile_cont(bdays, 0.5)) AS BIGINT) AS median_bdays
    FROM biz GROUP BY priority
    """,
)
def business_day_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency in BUSINESS days per priority class — the SLA
    metric operations teams actually track (a Friday order shipping
    Monday is 1 business day, not 3). Business-day counting is closed-
    form integer arithmetic on epoch days (full weeks ×5 plus a
    two-segment weekday-remainder clamp; weekday = (epoch_day+3) mod 7
    with Monday=0 — engine-neutral, no calendar-dialect traps), so
    every column is exact BIGINT; the mean ships as milli-days by
    integer division.

    Scale shape: the join is the star-schema orderkey equi-join; the
    latency math is map-side; the census is |priorities| rows. A real
    deployment adds a broadcast holiday dimension — same shape.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            epoch_day("o_orderdate").alias("d0"),
            epoch_day("l_shipdate").alias("d1"),
        )
    )
    w0 = (F.col("d0") + 3) % 7
    rem = (F.col("d1") - F.col("d0")) % 7
    bdays = (
        F.expr("((d1 - d0) div 7) * 5")
        + F.greatest(F.lit(0), F.least(w0 + rem, F.lit(5)) - w0)
        + F.greatest(F.lit(0), F.least(w0 + rem - 7, F.lit(5)))
    )
    biz = pairs.select("priority", bdays.alias("bdays"))
    return biz.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("bdays").cast("long").alias("total_bdays"),
        F.expr("sum(bdays) * 1000L div count(1)").cast("long").alias(
            "mean_bdays_milli"
        ),
        F.floor(F.expr("percentile(bdays, 0.5)")).cast("long").alias("median_bdays"),
    )


@query(
    "bot_rate_detection",
    oracle="""
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS t FROM events
    ), rates AS (
        SELECT user_id, t,
               CAST(COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY t
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS burst
        FROM e
    ), peak AS (
        SELECT user_id, MAX(burst) AS max_burst_1h,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM rates GROUP BY user_id
    )
    SELECT user_id, n_events, max_burst_1h,
           CASE WHEN max_burst_1h >= 8 THEN 1 ELSE 0 END AS flagged
    FROM peak
    ORDER BY max_burst_1h DESC, user_id
    LIMIT 20
    """,
)
def bot_rate_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst-rate abuse detection: each user's maximum events within any
    trailing 1-hour window (an exact sliding count via a RANGE frame
    over microsecond epochs — the frame ends at each event, which is
    where the true maximum always sits), top-20 burstiest with a
    threshold flag. The rate-limiter's ban-list query; thresholds are
    config, the SHAPE is the operator.

    All integers; ties break on user_id so the top-k is stable.

    Scale shape: one user_id exchange; the RANGE frame holds only the
    in-window event times per user; the per-user peak agg collapses
    before TakeOrdered. No self-joins, no minute-grid materialization.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    e = ev.select("user_id", us.alias("t"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-3600000000, 0)
    )
    rates = e.select("user_id", F.count(F.lit(1)).over(w).alias("burst"))
    peak = rates.groupBy("user_id").agg(
        F.max("burst").cast("long").alias("max_burst_1h"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return (
        peak.select(
            "user_id",
            "n_events",
            "max_burst_1h",
            F.when(F.col("max_burst_1h") >= 8, 1).otherwise(0).alias("flagged"),
        )
        .orderBy(F.desc("max_burst_1h"), F.asc("user_id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# wave 73: per-class P/R/F1, overdispersion index
# ---------------------------------------------------------------------------


@query(
    "nb_per_class_prf",
    oracle="""
    WITH split AS (
        SELECT doc_id, lang,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(lower(trim(text)), '\\s+') END AS t,
               ((doc_id * 2654435761) % 4294967296) % 100 AS bucket
        FROM documents
    ),
    train_tok AS (
        SELECT lang, unnest(t) AS w FROM split WHERE bucket < 80
    ),
    counts AS (
        SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM train_tok GROUP BY lang, w
    ),
    n_lang AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_l FROM train_tok GROUP BY lang
    ),
    vocab AS (
        SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM train_tok
    ),
    priors AS (
        SELECT lang,
               CAST(ROUND(ln(CAST(COUNT(*) AS DOUBLE)
                   / (SELECT COUNT(*) FROM split WHERE bucket < 80)) * 1000000)
                   AS BIGINT) AS prior_unats
        FROM split WHERE bucket < 80 GROUP BY lang
    ),
    test_tok AS (
        SELECT doc_id, lang AS true_lang, w, CAST(COUNT(*) AS BIGINT) AS k
        FROM (SELECT doc_id, lang, unnest(t) AS w FROM split WHERE bucket >= 80)
        GROUP BY doc_id, lang, w
    ),
    scored AS (
        SELECT tt.doc_id, tt.true_lang, nl.lang AS cand,
               SUM(tt.k * CAST(ROUND(ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)
                   / (nl.n_l + vocab.v)) * 1000000) AS BIGINT)) AS tok_unats
        FROM test_tok tt
        CROSS JOIN n_lang nl
        CROSS JOIN vocab
        LEFT JOIN counts c ON c.lang = nl.lang AND c.w = tt.w
        GROUP BY tt.doc_id, tt.true_lang, nl.lang
    ),
    pred AS (
        SELECT true_lang, cand AS pred_lang
        FROM (
            SELECT true_lang, cand,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id
                       ORDER BY tok_unats + p.prior_unats DESC, cand) AS rn
            FROM scored JOIN priors p ON p.lang = scored.cand
        ) WHERE rn = 1
    ),
    conf AS (
        SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM pred GROUP BY 1, 2
    ),
    classes AS (
        SELECT true_lang AS cls FROM conf
        UNION SELECT pred_lang FROM conf
    ),
    prf AS (
        SELECT cls,
               COALESCE((SELECT SUM(n) FROM conf
                         WHERE true_lang = cls AND pred_lang = cls), 0) AS tp,
               COALESCE((SELECT SUM(n) FROM conf WHERE pred_lang = cls), 0) AS pp,
               COALESCE((SELECT SUM(n) FROM conf WHERE true_lang = cls), 0) AS ap
        FROM classes
    )
    SELECT cls AS lang,
           CAST(tp AS BIGINT) AS tp,
           CAST(pp - tp AS BIGINT) AS fp,
           CAST(ap - tp AS BIGINT) AS fn,
           CAST(CASE WHEN pp = 0 THEN 0 ELSE tp * 1000000 // pp END AS BIGINT)
               AS precision_ppm,
           CAST(CASE WHEN ap = 0 THEN 0 ELSE tp * 1000000 // ap END AS BIGINT)
               AS recall_ppm,
           CAST(CASE WHEN pp + ap = 0 THEN 0
                     ELSE 2 * tp * 1000000 // (pp + ap) END AS BIGINT) AS f1_ppm
    FROM prf
    """,
)
def nb_per_class_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language precision / recall / F1 of the naive-Bayes language
    identifier, in exact ppm from the confusion-matrix marginals —
    where the single accuracy (and kappa) numbers hide which MINORITY
    class the classifier sacrifices. F1 = 2·tp/(pp+ap) stays pure
    integer division; zero-support classes report 0 by convention.

    Scale shape: rides the NB confusion matrix; everything after is
    |langs|-sized marginal algebra.
    """
    conf = QUERIES["naive_bayes_lang_confusion"](spark, sf_dir)
    ap = conf.groupBy(F.col("true_lang").alias("lang")).agg(
        F.sum("n_docs").cast("long").alias("ap")
    )
    pp = conf.groupBy(F.col("pred_lang").alias("lang")).agg(
        F.sum("n_docs").cast("long").alias("pp")
    )
    tp = (
        conf.filter(F.col("true_lang") == F.col("pred_lang"))
        .groupBy(F.col("true_lang").alias("lang"))
        .agg(F.sum("n_docs").cast("long").alias("tp"))
    )
    prf = (
        ap.join(pp, "lang", "full")
        .join(tp, "lang", "left")
        .select(
            "lang",
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
            F.coalesce("pp", F.lit(0)).cast("long").alias("pp"),
            F.coalesce("ap", F.lit(0)).cast("long").alias("ap"),
        )
    )
    return prf.select(
        "lang",
        "tp",
        (F.col("pp") - F.col("tp")).cast("long").alias("fp"),
        (F.col("ap") - F.col("tp")).cast("long").alias("fn"),
        F.when(F.col("pp") == 0, 0)
        .otherwise(F.expr("tp * 1000000L div pp"))
        .cast("long")
        .alias("precision_ppm"),
        F.when(F.col("ap") == 0, 0)
        .otherwise(F.expr("tp * 1000000L div ap"))
        .cast("long")
        .alias("recall_ppm"),
        F.when(F.col("pp") + F.col("ap") == 0, 0)
        .otherwise(F.expr("2 * tp * 1000000L div (pp + ap)"))
        .cast("long")
        .alias("f1_ppm"),
    )


@query(
    "dispersion_index_daily",
    oracle="""
    WITH pts AS (
        SELECT event_type,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        FROM events
    ), bounds AS (
        SELECT MIN(day) AS lo, MAX(day) AS hi FROM pts
    ), grid AS (
        SELECT et.event_type, g.day
        FROM (SELECT DISTINCT event_type FROM pts) et,
             (SELECT unnest(generate_series(lo, hi)) AS day FROM bounds) g
    ), daily AS (
        SELECT g.event_type, g.day, CAST(COUNT(p.day) AS BIGINT) AS x
        FROM grid g LEFT JOIN pts p
          ON p.event_type = g.event_type AND p.day = g.day
        GROUP BY g.event_type, g.day
    ), mo AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
        FROM daily GROUP BY event_type
    )
    SELECT event_type, n, s,
           CAST((CAST(n AS HUGEINT) * sxx - CAST(s AS HUGEINT) * s) * 1000000
                // ((n - 1) * CAST(n AS HUGEINT) * s) AS BIGINT)
               AS dispersion_ppm
    FROM mo
    """,
)
def dispersion_index_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio) of the zero-filled
    daily count series per event type, in exact ppm — the Poisson
    sanity check: ≈10⁶ means Poisson-like arrivals, ≫10⁶ means bursty/
    overdispersed traffic (negative-binomial territory — alerting
    thresholds calibrated on Poisson will cry wolf), ≪10⁶ means
    suspiciously regular (synthetic or rate-limited). Var/mean =
    (n·Σx² − (Σx)²)·10⁶ ÷ ((n−1)·n·x̄·…) — entirely 128-bit integer
    arithmetic via the sample-variance identity; no float moments.

    Scale shape: the per-type day grid collapse (shared
    `zero_filled_daily_grid` shape) then a |types|-row moment agg.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark_movie_recommender_spark.operators.timeseries import (
        epoch_day,
        zero_filled_daily_grid,
    )

    pts = ev.select("event_type", epoch_day("ts").alias("day")).withColumn(
        "hit", F.lit(1)
    )
    daily = zero_filled_daily_grid(
        pts, F.count("hit").cast("long"), keys=["event_type"]
    )
    mo = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    num = (
        F.col("n").cast("decimal(38,0)") * F.col("sxx")
        - F.col("s").cast("decimal(38,0)") * F.col("s")
    ) * 1000000
    den = (
        (F.col("n") - 1).cast("decimal(38,0)")
        * F.col("n").cast("decimal(38,0)")
        * F.col("s")
    )
    return mo.select(
        "event_type",
        "n",
        "s",
        # decimal quotient truncates toward zero on cast; values are
        # positive so this matches DuckDB's integer //
        (num / den).cast("long").alias("dispersion_ppm"),
    )


# ---------------------------------------------------------------------------
# wave 74: bootstrap uplift CI, capture-recapture estimation
# ---------------------------------------------------------------------------


@query(
    "bootstrap_uplift_ci",
    oracle="""
    WITH m AS (
        SELECT event_id,
               ((user_id * 2654435761) % 4294967296) % 2 AS arm,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ), w AS (
        SELECT b.b, m.arm, m.cents,
               ((m.event_id * 2654435761 + b.b * 40503) % 4294967296) % 3 AS wt
        FROM m, (SELECT unnest(generate_series(0, 99)) AS b) b
    ), means AS (
        SELECT b,
               CAST(SUM(CASE WHEN arm = 0 THEN wt * cents ELSE 0 END) AS BIGINT)
                   AS num0,
               CAST(SUM(CASE WHEN arm = 0 THEN wt ELSE 0 END) AS BIGINT) AS den0,
               CAST(SUM(CASE WHEN arm = 1 THEN wt * cents ELSE 0 END) AS BIGINT)
                   AS num1,
               CAST(SUM(CASE WHEN arm = 1 THEN wt ELSE 0 END) AS BIGINT) AS den1
        FROM w GROUP BY b HAVING SUM(CASE WHEN arm = 0 THEN wt ELSE 0 END) > 0
                             AND SUM(CASE WHEN arm = 1 THEN wt ELSE 0 END) > 0
    ), uplifts AS (
        SELECT CAST(num1 AS DOUBLE) / den1 - CAST(num0 AS DOUBLE) / den0 AS u
        FROM means
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_resamples,
           ROUND(quantile_cont(u, 0.025), 4) AS uplift_lo,
           ROUND(quantile_cont(u, 0.5), 4) AS uplift_mid,
           ROUND(quantile_cont(u, 0.975), 4) AS uplift_hi
    FROM uplifts
    """,
)
def bootstrap_uplift_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap 95% CI for the A/B UPLIFT (arm-1 minus arm-0 mean
    purchase cents) under the deterministic hash-weight resampling of
    `bootstrap_ci_order_value` — the interval that answers 'is the
    treatment effect distinguishable from zero' without any normality
    assumption, completing the experimentation kit (SRM gate → CUPED
    point estimate → this uncertainty band). Each resample's per-arm
    means are exact BIGINT ratios; the uplift is two IEEE divisions and
    a subtract, and the CI is exact interpolated percentiles over 100
    engine-identical doubles.

    Scale shape: the ×100 fan-out is map-side; the resample agg carries
    4 BIGINTs per (resample, arm) with map-side partials; percentiles
    run over ≤100 rows.
    """
    ev = load_table(spark, sf_dir, "events")
    m = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        (((F.col("user_id") * 2654435761) % 4294967296) % 2).alias("arm"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = m.select(
        "arm",
        "cents",
        F.explode(F.expr("sequence(0, 99)")).alias("b"),
        F.col("event_id"),
    ).select(
        "b",
        "arm",
        "cents",
        (
            ((F.col("event_id") * 2654435761 + F.col("b") * 40503) % 4294967296)
            % 3
        ).alias("wt"),
    )
    means = (
        w.groupBy("b")
        .agg(
            F.sum(F.when(F.col("arm") == 0, F.col("wt") * F.col("cents")).otherwise(0))
            .cast("long")
            .alias("num0"),
            F.sum(F.when(F.col("arm") == 0, F.col("wt")).otherwise(0))
            .cast("long")
            .alias("den0"),
            F.sum(F.when(F.col("arm") == 1, F.col("wt") * F.col("cents")).otherwise(0))
            .cast("long")
            .alias("num1"),
            F.sum(F.when(F.col("arm") == 1, F.col("wt")).otherwise(0))
            .cast("long")
            .alias("den1"),
        )
        .filter((F.col("den0") > 0) & (F.col("den1") > 0))
        .select(
            (
                F.col("num1").cast("double") / F.col("den1")
                - F.col("num0").cast("double") / F.col("den0")
            ).alias("u")
        )
    )
    return means.agg(
        F.count(F.lit(1)).cast("long").alias("n_resamples"),
        F.round(F.expr("percentile(u, 0.025D)"), 4).alias("uplift_lo"),
        F.round(F.expr("percentile(u, 0.5D)"), 4).alias("uplift_mid"),
        F.round(F.expr("percentile(u, 0.975D)"), 4).alias("uplift_hi"),
    )


@query(
    "capture_recapture_estimate",
    oracle="""
    WITH viewers AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
    ), clickers AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    ), c AS (
        SELECT (SELECT COUNT(*) FROM viewers) AS na,
               (SELECT COUNT(*) FROM clickers) AS nb,
               (SELECT COUNT(*) FROM viewers v
                JOIN clickers k ON k.user_id = v.user_id) AS m,
               (SELECT COUNT(DISTINCT user_id) FROM events) AS truth
    )
    SELECT CAST(na AS BIGINT) AS n_sample_a,
           CAST(nb AS BIGINT) AS n_sample_b,
           CAST(m AS BIGINT) AS n_both,
           CAST((na + 1) * (nb + 1) // (m + 1) - 1 AS BIGINT) AS chapman_estimate,
           CAST(truth AS BIGINT) AS true_population
    FROM c
    """,
)
def capture_recapture_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture (Chapman) population estimate: treat viewers
    and clickers as two independent 'capture' samples of the active
    user population and estimate its TOTAL size from their overlap,
    N̂ = (n_a+1)(n_b+1)/(m+1) − 1 — the mark-recapture estimator data
    teams use to answer 'how much did we NOT see' (residual duplicates
    after a dedup pass, uncrawled hosts, unmatched entities) without a
    census. The true distinct-user count ships alongside so the
    fixture itself shows the estimator's bias when the independence
    assumption bends. All integer arithmetic.

    Scale shape: two distinct-collapses and one user-keyed semi-overlap
    count; the estimator is constant algebra on three scalars.
    """
    ev = load_table(spark, sf_dir, "events")
    viewers = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    na = viewers.agg(F.count(F.lit(1)).cast("long").alias("na"))
    nb = clickers.agg(F.count(F.lit(1)).cast("long").alias("nb"))
    m = viewers.join(clickers, "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    truth = ev.agg(F.countDistinct("user_id").cast("long").alias("truth"))
    return (
        na.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(truth))
        .select(
            F.col("na").alias("n_sample_a"),
            F.col("nb").alias("n_sample_b"),
            F.col("m").alias("n_both"),
            F.expr("(na + 1) * (nb + 1) div (m + 1) - 1")
            .cast("long")
            .alias("chapman_estimate"),
            F.col("truth").alias("true_population"),
        )
    )


# ---------------------------------------------------------------------------
# wave 75: Shapley channel attribution
# ---------------------------------------------------------------------------


@query(
    "shapley_channel_attribution",
    bench=True,
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), touches AS (
        SELECT user_id, ts, event_type FROM events
        WHERE event_type IN ('view', 'click', 'signup')
    ), flags AS (
        SELECT p.event_id,
               MAX(CASE WHEN t.event_type = 'view'   THEN 1 ELSE 0 END) AS fv,
               MAX(CASE WHEN t.event_type = 'click'  THEN 2 ELSE 0 END) AS fc,
               MAX(CASE WHEN t.event_type = 'signup' THEN 4 ELSE 0 END) AS fs
        FROM purchases p LEFT JOIN touches t
          ON t.user_id = p.user_id
         AND t.ts <= p.ts AND t.ts > p.ts - INTERVAL 3 DAY
        GROUP BY p.event_id
    ), tcounts AS (
        SELECT fv + fc + fs AS t, CAST(COUNT(*) AS BIGINT) AS n
        FROM flags GROUP BY 1
    ), coalitions AS (
        SELECT unnest(generate_series(0, 7)) AS s
    ), v AS (
        SELECT c.s, CAST(COALESCE(SUM(tc.n), 0) AS BIGINT) AS val
        FROM coalitions c LEFT JOIN tcounts tc
          ON (tc.t & c.s) = tc.t AND tc.t <> 0
        GROUP BY c.s
    ), shapley_terms AS (
        SELECT ch.bit, ch.name, sub.s AS s0, w.w
        FROM (VALUES (1, 'view'), (2, 'click'), (4, 'signup')) ch(bit, name),
             (SELECT unnest(generate_series(0, 7)) AS s) sub,
             LATERAL (SELECT CASE
                 WHEN bit_count(CAST(sub.s AS BIGINT)) = 0 THEN 2
                 WHEN bit_count(CAST(sub.s AS BIGINT)) = 1 THEN 1
                 ELSE 2 END AS w) w
        WHERE (sub.s & ch.bit) = 0
    ), phi AS (
        SELECT st.name,
               CAST(SUM(st.w * (v1.val - v0.val)) AS BIGINT) AS phi6
        FROM shapley_terms st
        JOIN v v0 ON v0.s = st.s0
        JOIN v v1 ON v1.s = (st.s0 | st.bit)
        GROUP BY st.name
    ), tot AS (
        SELECT SUM(phi6) AS t6 FROM phi
    )
    SELECT name AS channel, phi6,
           CAST(CASE WHEN t6 = 0 THEN 0
                     ELSE phi6 * 1000000 // t6 END AS BIGINT) AS share_ppm
    FROM phi, tot
    """,
)
def shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value attribution over the three touch channels
    (view / click / signup in the 3 days before each purchase) — the
    game-theoretically fair credit split that linear and time-decay
    attribution approximate. Coalition value v(S) = purchases whose
    whole touch set lies inside S; with 3 players the ordering weights
    {2,1,1,2}/6 make 6·φ_c a pure INTEGER combination of coalition
    counts, so Shapley values are hash-exact BIGINTs (reported as φ·6
    plus the ppm share; Σ6φ = v(full) by efficiency — test-pinned).

    Scale shape: the only data-sized work is the same 3-day range join
    the other attribution queries use, collapsed per purchase into a
    3-bit touch mask; everything after runs on the 8-row coalition
    lattice (subset sums via bitmask joins) and a 12-row Shapley-term
    table. Adding a 4th channel doubles the lattice, not the data cost.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("pts")
    )
    touches = ev.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select("user_id", F.col("ts").alias("tts"), F.col("event_type").alias("ch"))
    flags = (
        purchases.join(
            touches,
            (purchases.user_id == touches.user_id)
            & (F.col("tts") <= F.col("pts"))
            & (F.col("tts") > F.col("pts") - F.expr("INTERVAL 3 DAY")),
            "left",
        )
        .groupBy("event_id")
        .agg(
            F.max(F.when(F.col("ch") == "view", 1).otherwise(0)).alias("fv"),
            F.max(F.when(F.col("ch") == "click", 2).otherwise(0)).alias("fc"),
            F.max(F.when(F.col("ch") == "signup", 4).otherwise(0)).alias("fs"),
        )
    )
    tcounts = flags.select(
        (F.col("fv") + F.col("fc") + F.col("fs")).alias("t")
    ).groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("n"))
    coalitions = spark.range(0, 8).select(F.col("id").cast("int").alias("s"))
    v = (
        coalitions.join(
            F.broadcast(tcounts),
            F.expr("(t & s) = t AND t <> 0"),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("val"))
    )
    ch = spark.createDataFrame(
        [(1, "view"), (2, "click"), (4, "signup")], "bit int, name string"
    )
    terms = (
        ch.crossJoin(coalitions.withColumnRenamed("s", "s0"))
        .filter(F.expr("(s0 & bit) = 0"))
        .select(
            "bit",
            "name",
            "s0",
            F.when(F.expr("bit_count(s0)") == 0, 2)
            .when(F.expr("bit_count(s0)") == 1, 1)
            .otherwise(2)
            .alias("w"),
        )
    )
    phi = (
        terms.join(
            F.broadcast(v.select(F.col("s").alias("s0"), F.col("val").alias("v0"))),
            "s0",
        )
        .join(
            F.broadcast(v.select(F.col("s").alias("s1"), F.col("val").alias("v1"))),
            F.expr("s1 = (s0 | bit)"),
        )
        .groupBy("name")
        .agg(F.sum(F.col("w") * (F.col("v1") - F.col("v0"))).cast("long").alias("phi6"))
    )
    tot = phi.agg(F.sum("phi6").alias("t6"))
    return phi.crossJoin(F.broadcast(tot)).select(
        F.col("name").alias("channel"),
        "phi6",
        F.when(F.col("t6") == 0, 0)
        .otherwise(F.expr("phi6 * 1000000L div t6"))
        .cast("long")
        .alias("share_ppm"),
    )


# ---------------------------------------------------------------------------
# wave 76: forecast evaluation, duplicate-payment rule
# ---------------------------------------------------------------------------


@query(
    "smape_seasonal_naive",
    oracle="""
    WITH pts AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ), bounds AS (
        SELECT MIN(day) AS lo, MAX(day) AS hi FROM pts
    ), grid AS (
        SELECT unnest(generate_series(lo, hi)) AS day FROM bounds
    ), daily AS (
        SELECT g.day, COALESCE(SUM(p.cents), 0) AS x
        FROM grid g LEFT JOIN pts p ON p.day = g.day GROUP BY g.day
    ), paired AS (
        SELECT a.day, a.x AS actual, f.x AS forecast
        FROM daily a JOIN daily f ON f.day = a.day - 7
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(ABS(actual - forecast)) // COUNT(*) AS BIGINT)
               AS mae_cents,
           CAST(SUM(CASE WHEN actual + forecast = 0 THEN 0
                         ELSE ABS(actual - forecast) * 2000000
                              // (actual + forecast) END)
                // COUNT(*) AS BIGINT) AS smape_ppm
    FROM paired
    """,
)
def smape_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-accuracy floor: MAE and sMAPE of the SEASONAL-NAIVE
    forecast (predict each day with the value 7 days earlier) over the
    zero-filled daily value series — the baseline every real forecast
    must beat, and the denominator of the MASE skill score. Per-day
    sMAPE terms are exact integer ratios (|a−f|·2·10⁶ ÷ (a+f), floor),
    averaged by integer division — no float error metrics.

    Scale shape: one grid collapse, a self-join on day−7 over the tiny
    series, a 1-row agg.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark_movie_recommender_spark.operators.timeseries import (
        epoch_day,
        zero_filled_daily_grid,
    )

    pts = ev.select(
        epoch_day("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    daily = zero_filled_daily_grid(
        pts, F.coalesce(F.sum("cents"), F.lit(0)).cast("long")
    )
    a = daily.select("day", F.col("x").alias("actual"))
    f = daily.select((F.col("day") + 7).alias("day"), F.col("x").alias("forecast"))
    paired = a.join(f, "day")
    term = F.when(F.col("actual") + F.col("forecast") == 0, F.lit(0)).otherwise(
        F.expr("abs(actual - forecast) * 2000000L div (actual + forecast)")
    )
    return paired.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr("sum(abs(actual - forecast)) div count(1)")
        .cast("long")
        .alias("mae_cents"),
        (F.sum(term) / F.count(F.lit(1))).cast("long").alias("smape_ppm"),
    )


@query(
    "rapid_repeat_purchases",
    oracle="""
    WITH pay AS (
        SELECT event_id, user_id, epoch_us(ts) AS t,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ), seq AS (
        SELECT event_id, user_id, cents, t,
               LAG(t) OVER w AS prev_t,
               LAG(cents) OVER w AS prev_cents
        FROM pay
        WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    )
    SELECT event_id, user_id, prev_cents, cents,
           CAST(t - prev_t AS BIGINT) AS gap_us,
           CASE WHEN prev_cents = cents THEN 1 ELSE 0 END AS same_amount
    FROM seq
    WHERE prev_t IS NOT NULL AND t - prev_t <= CAST(3600 AS BIGINT) * 1000000
    """,
)
def rapid_repeat_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rapid repeat-purchase detector: a user's purchase within one hour
    of their previous purchase — the double-charge / retry-storm
    fraud-ops shortlist, with both amounts and an exact same-amount
    flag so the downstream rule can tighten to true duplicates. Lag
    window semantics: a burst of k purchases flags k−1 rows (chain, not
    pairwise explosion); (t, event_id) total order; microsecond gaps.

    Scale shape: one user_id exchange; no self-join — the window form
    is O(n log n) per key versus the naive pairwise O(n²).
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    pay = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        us.alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    seq = pay.withColumn("prev_t", F.lag("t").over(w)).withColumn(
        "prev_cents", F.lag("cents").over(w)
    )
    return (
        seq.filter(
            F.col("prev_t").isNotNull()
            & (F.col("t") - F.col("prev_t") <= 3600 * 1000000)
        )
        .select(
            "event_id",
            "user_id",
            "prev_cents",
            "cents",
            (F.col("t") - F.col("prev_t")).cast("long").alias("gap_us"),
            F.when(F.col("prev_cents") == F.col("cents"), 1)
            .otherwise(0)
            .alias("same_amount"),
        )
    )


# ---------------------------------------------------------------------------
# wave 77: vocabulary entropy / effective vocab size
# ---------------------------------------------------------------------------


@query(
    "effective_vocab_size",
    oracle="""
    WITH toks AS (
        SELECT lang, unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(lower(trim(text)), '\\s+') END) AS w
        FROM documents
    ), counts AS (
        SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY lang, w
    ), lstats AS (
        SELECT lang, CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS vocab,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
        FROM counts GROUP BY lang
    ), ent AS (
        SELECT c.lang,
               CAST(SUM(c.c * CAST(ROUND(ln(CAST(c.c AS DOUBLE) / s.n) * 1000000)
                    AS BIGINT)) AS BIGINT) AS neg_h_n_unats
        FROM counts c JOIN lstats s ON s.lang = c.lang
        GROUP BY c.lang
    )
    SELECT s.lang, s.n AS n_tokens, s.vocab, s.hapax,
           CAST(s.hapax * 1000000 // s.vocab AS BIGINT) AS hapax_ppm,
           CAST(-e.neg_h_n_unats // s.n AS BIGINT) AS entropy_unats,
           ROUND(exp(CAST(-e.neg_h_n_unats // s.n AS DOUBLE) / 1000000), 2)
               AS effective_vocab
    FROM lstats s JOIN ent e ON e.lang = s.lang
    """,
)
def effective_vocab_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary health per language: Shannon entropy of the unigram
    distribution in BIGINT micro-nats (each term c·round(ln(c/N)·10⁶)
    is quantized BEFORE summation — the summation-order-proof trick the
    LM scorers use), its exponential = the EFFECTIVE vocabulary size
    (perplexity of the unigram LM — how many equally-likely words the
    language 'really' uses), and the hapax-legomena share in exact ppm
    (high hapax = productive/long-tail vocabulary or OCR noise; near
    zero = templated text). The diversity dashboard row beside Zipf
    slope and 4-gram diversity.

    Scale shape: one explode → (lang, token) hash agg with map-side
    combine; language stats and the entropy agg run on the vocab-sized
    relation. Constants out.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(ws_tokens(F.lower(F.col("text")))).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    lstats = counts.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("hapax"),
    )
    ent = (
        counts.join(F.broadcast(lstats.select("lang", "n")), "lang")
        .select(
            "lang",
            (
                F.col("c")
                * F.round(F.log(F.col("c").cast("double") / F.col("n")) * 1000000)
                .cast("long")
            ).alias("t"),
        )
        .groupBy("lang")
        .agg(F.sum("t").cast("long").alias("neg_h_n_unats"))
    )
    return lstats.join(ent, "lang").select(
        "lang",
        F.col("n").alias("n_tokens"),
        "vocab",
        "hapax",
        F.expr("hapax * 1000000L div vocab").cast("long").alias("hapax_ppm"),
        F.expr("-neg_h_n_unats div n").cast("long").alias("entropy_unats"),
        F.round(
            F.exp(F.expr("CAST(-neg_h_n_unats div n AS DOUBLE) / 1000000")), 2
        ).alias("effective_vocab"),
    )


# ---------------------------------------------------------------------------
# wave 78: aggregate-function parity, full regr_* family, streaming counts
# ---------------------------------------------------------------------------


@query(
    "aggregate_function_parity",
    oracle="""
    SELECT o_orderstatus,
           CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_totalprice > 500000) AS any_huge,
           mode(o_orderpriority) AS top_priority,
           CAST(ROUND(median(CAST(ROUND(o_totalprice * 100) AS BIGINT)), 1) AS DOUBLE)
               AS median_cents
    FROM orders GROUP BY o_orderstatus
    """,
)
def aggregate_function_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern aggregate-function parity pinned across engines per order
    status: count_if, bool_and/bool_or, mode, and median — the
    analyst-convenience aggregates (Spark 3.4/3.5 additions) proven to
    mean the same thing the oracle thinks they mean. mode() is only
    deterministic when the argmax is unique — true for priorities per
    status here, and the reason a production mode carries a tie-break
    (max_by(value, (count, value)) — the pattern `label_purity_by_lang`
    uses). median over BIGINT cents interpolates to exact halves.

    Scale shape: one partial+final hash agg (median/mode are sort-based
    object aggregates per group); |statuses| rows out.
    """
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("afp_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
               bool_and(o_totalprice > 0) AS all_positive,
               bool_or(o_totalprice > 500000) AS any_huge,
               mode(o_orderpriority) AS top_priority,
               CAST(ROUND(median(CAST(ROUND(o_totalprice * 100) AS BIGINT)), 1)
                    AS DOUBLE) AS median_cents
        FROM afp_orders GROUP BY o_orderstatus
        """
    )


@query(
    "regr_function_suite",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           ROUND(regr_avgx(l_extendedprice, l_quantity), 4) AS avgx,
           ROUND(regr_avgy(l_extendedprice, l_quantity), 4) AS avgy
    FROM lineitem GROUP BY l_returnflag
    """,
)
def regr_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete ANSI linear-regression aggregate family per return
    flag: count, slope, intercept, R², and both means — one-pass OLS
    sufficient statistics as built-in JVM aggregates (what
    `stats_moments_lineitem` samples, completed and pinned name-by-name
    against the oracle's implementations). Price-on-quantity slope is
    the unit-price trend; the intercept is the fixed-charge estimate.

    Floats are rounded on both sides; the aggregates themselves are
    single-pass moment accumulations with map-side partials — the plan
    is one partial+final hash agg pair over the fact scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("rfs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
               ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
               ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
               ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
               ROUND(regr_avgx(l_extendedprice, l_quantity), 4) AS avgx,
               ROUND(regr_avgy(l_extendedprice, l_quantity), 4) AS avgy
        FROM rfs_lineitem GROUP BY l_returnflag
        """
    )


@query("streaming_hourly_user_counts")
def streaming_hourly_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(hour, user) event counts maintained as a watermarked
    streaming aggregation — the continuous state behind burst-rate
    abuse monitoring (`bot_rate_detection` is the exact-batch twin).
    Rows-only; pinned equal to the identical batch aggregation in
    tests/test_streaming.py."""
    from pyspark_movie_recommender_spark.streaming.jobs import (
        hourly_user_counts_stream,
    )

    return hourly_user_counts_stream(spark, sf_dir, query_name="q_stream_hourly")


# ---------------------------------------------------------------------------
# wave 79: order-statistic median CI, robust-vs-OLS slope comparison
# ---------------------------------------------------------------------------


@query(
    "median_ci_order_stats",
    oracle="""
    WITH m AS (
        SELECT o_orderstatus,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), ranked AS (
        SELECT o_orderstatus, cents,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                  ORDER BY cents, o_orderstatus) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
        FROM m
    ), idx AS (
        SELECT o_orderstatus, CAST(MAX(n) AS BIGINT) AS n,
               CAST(FLOOR(MAX(n) / 2.0 - 0.98 * sqrt(MAX(n))) AS BIGINT) AS k_lo,
               CAST(CEIL(MAX(n) / 2.0 + 1 + 0.98 * sqrt(MAX(n))) AS BIGINT) AS k_hi
        FROM ranked GROUP BY o_orderstatus
    )
    SELECT i.o_orderstatus, i.n,
           CAST(FLOOR(quantile_cont(CAST(r.cents AS DOUBLE), 0.5)) AS BIGINT)
               AS median_cents,
           MAX(CASE WHEN r.rn = i.k_lo THEN r.cents END) AS ci_lo_cents,
           MAX(CASE WHEN r.rn = i.k_hi THEN r.cents END) AS ci_hi_cents
    FROM ranked r JOIN idx i ON i.o_orderstatus = r.o_orderstatus
    GROUP BY i.o_orderstatus, i.n
    """,
)
def median_ci_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the MEDIAN per
    order status, read straight off the order statistics: ranks
    ⌊n/2 − 1.96·√n/2⌋ and ⌈n/2 + 1 + 1.96·√n/2⌉ bracket the true
    median with ≈95% coverage by the binomial argument — no normality,
    no resampling, and the bounds are actual data values (exact BIGINT
    cents picked by integer rank lookups). The order-statistic
    companion to the bootstrap (means) and Wilson (rates) intervals.

    Scale shape: one rank window per status partition; the CI lookup is
    two equality filters on the ranked relation folded into the same
    group agg. At extreme n the rank lookup swaps for approx quantiles
    at the two target fractions — same contract.
    """
    orders = load_table(spark, sf_dir, "orders")
    m = orders.select(
        "o_orderstatus", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    w = Window.partitionBy("o_orderstatus").orderBy("cents", "o_orderstatus")
    ranked = m.select(
        "o_orderstatus",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("o_orderstatus")).alias("n"),
    )
    idx = ranked.groupBy("o_orderstatus").agg(
        F.max("n").cast("long").alias("n"),
        F.floor(F.max("n") / 2.0 - 0.98 * F.sqrt(F.max("n")))
        .cast("long")
        .alias("k_lo"),
        F.ceil(F.max("n") / 2.0 + 1 + 0.98 * F.sqrt(F.max("n")))
        .cast("long")
        .alias("k_hi"),
    )
    j = ranked.drop("n").join(F.broadcast(idx), "o_orderstatus")
    return j.groupBy("o_orderstatus", "n").agg(
        F.floor(F.expr("percentile(CAST(cents AS DOUBLE), 0.5)"))
        .cast("long")
        .alias("median_cents"),
        F.max(F.when(F.col("rn") == F.col("k_lo"), F.col("cents"))).alias(
            "ci_lo_cents"
        ),
        F.max(F.when(F.col("rn") == F.col("k_hi"), F.col("cents"))).alias(
            "ci_hi_cents"
        ),
    )


@query(
    "theil_sen_price_curve",
    oracle="""
    WITH lv AS (
        SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1, 2
    ), pts AS (
        SELECT l_returnflag, q, cents * 1.0 / n AS mean_cents FROM lv
    ), pairs AS (
        SELECT a.l_returnflag,
               (b.mean_cents - a.mean_cents) / (b.q - a.q) AS slope
        FROM pts a JOIN pts b
          ON b.l_returnflag = a.l_returnflag AND b.q > a.q
    ), ts AS (
        SELECT l_returnflag, ROUND(quantile_cont(slope, 0.5), 4) AS theil_sen
        FROM pairs GROUP BY 1
    ), ols AS (
        SELECT l_returnflag,
               ROUND(regr_slope(l_extendedprice * 100, l_quantity), 4) AS ols
        FROM lineitem GROUP BY 1
    )
    SELECT t.l_returnflag, t.theil_sen, o.ols
    FROM ts t JOIN ols o ON o.l_returnflag = t.l_returnflag
    """,
)
def theil_sen_price_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust vs least-squares unit-price estimation side by side: the
    Theil-Sen slope (median of pairwise slopes over the quantity-level
    mean-price curve — outlier-immune) against the OLS regr_slope per
    return flag, both in cents/unit. When the two disagree, the tail is
    driving OLS — the one-line robustness diagnostic for any fitted
    trend.

    Determinism: the level curve collapses the fact to ≤|quantities|
    points first (exact integer sums and counts; mean = one division);
    pairwise slopes are IEEE ops on those identical doubles; the median
    is the exact interpolated percentile. Pairs are levels², never
    rows².
    """
    li = load_table(spark, sf_dir, "lineitem")
    lv = li.groupBy("l_returnflag", F.col("l_quantity").cast("long").alias("q")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    pts = lv.select(
        "l_returnflag", "q", (F.col("cents") * 1.0 / F.col("n")).alias("mean_cents")
    )
    a = pts.select("l_returnflag", F.col("q").alias("qa"), F.col("mean_cents").alias("ma"))
    b = pts.select("l_returnflag", F.col("q").alias("qb"), F.col("mean_cents").alias("mb"))
    pairs = a.join(b, "l_returnflag").filter(F.col("qb") > F.col("qa")).select(
        "l_returnflag",
        ((F.col("mb") - F.col("ma")) / (F.col("qb") - F.col("qa"))).alias("slope"),
    )
    ts = pairs.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(slope, 0.5)"), 4).alias("theil_sen")
    )
    ols = li.groupBy("l_returnflag").agg(
        F.round(
            F.expr("regr_slope(l_extendedprice * 100, l_quantity)"), 4
        ).alias("ols")
    )
    return ts.join(ols, "l_returnflag")


# ---------------------------------------------------------------------------
# wave 80: repeated-token runs, binned continuous MI
# ---------------------------------------------------------------------------


@query(
    "longest_token_run",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(lower(trim(text)), '\\s+') END AS t
        FROM documents
    ), pos AS (
        SELECT doc_id, g.i AS i, t[g.i] AS w
        FROM toks,
             LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) g
    ), flagged AS (
        SELECT doc_id, i, w,
               CASE WHEN LAG(w) OVER (PARTITION BY doc_id ORDER BY i) = w
                    THEN 0 ELSE 1 END AS brk
        FROM pos
    ), islands AS (
        SELECT doc_id,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY i) AS isl
        FROM flagged
    ), runs AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS run_len
        FROM islands GROUP BY doc_id, isl
    ), per_doc AS (
        SELECT doc_id, MAX(run_len) AS max_run FROM runs GROUP BY doc_id
    )
    SELECT max_run, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM per_doc GROUP BY max_run
    """,
)
def longest_token_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of each document's LONGEST same-token run — the
    stuck-generation / stutter detector ('the the the the …') that
    word-frequency filters miss entirely: a doc can have healthy global
    stats and still contain a degenerate run. Gaps-and-islands over
    token positions (lag-equality break flags → island cumsum → run
    lengths → per-doc max), reported as a run-length histogram.

    Scale shape: positions explode map-side; both windows partition by
    doc_id — token-bounded state per doc, one doc-keyed exchange shared
    by break-flag and island numbering; the histogram is a tiny agg.
    The in-row HOF fold is the shuffle-free alternative when docs are
    huge — the window form is the cross-engine-checkable spec.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(ws_tokens(F.lower(F.col("text")))).alias("p", "w")
    ).select("doc_id", (F.col("p") + 1).alias("i"), "w")
    wd = Window.partitionBy("doc_id").orderBy("i")
    flagged = pos.select(
        "doc_id",
        "i",
        F.when(F.lag("w").over(wd) == F.col("w"), 0).otherwise(1).alias("brk"),
    )
    islands = flagged.select(
        "doc_id", F.sum("brk").over(wd).alias("isl")
    )
    runs = islands.groupBy("doc_id", "isl").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    per_doc = runs.groupBy("doc_id").agg(F.max("run_len").alias("max_run"))
    return per_doc.groupBy("max_run").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


@query(
    "binned_mi_price_quantity",
    oracle="""
    WITH m AS (
        SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price,
               CAST(l_quantity AS BIGINT) AS qty
        FROM lineitem
    ), edges AS (
        SELECT quantile_cont(CAST(price AS DOUBLE),
                             [0.25, 0.5, 0.75]) AS pe,
               quantile_cont(CAST(qty AS DOUBLE),
                             [0.25, 0.5, 0.75]) AS qe
        FROM m
    ), binned AS (
        SELECT len(list_filter(pe, x -> price > x)) AS pb,
               len(list_filter(qe, x -> qty > x)) AS qb
        FROM m, edges
    ), joint AS (
        SELECT pb, qb, CAST(COUNT(*) AS BIGINT) AS n_ij FROM binned GROUP BY 1, 2
    ), mi AS (
        SELECT pb, qb, n_ij,
               CAST(SUM(n_ij) OVER () AS BIGINT) AS n,
               CAST(SUM(n_ij) OVER (PARTITION BY pb) AS BIGINT) AS n_i,
               CAST(SUM(n_ij) OVER (PARTITION BY qb) AS BIGINT) AS n_j
        FROM joint
    )
    SELECT pb, qb, n_ij,
           ROUND((CAST(n_ij AS DOUBLE) / n)
                 * ln((CAST(n_ij AS DOUBLE) * n) / (CAST(n_i AS DOUBLE) * n_j)),
                 6) AS mi_contrib
    FROM mi
    """,
)
def binned_mi_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two CONTINUOUS columns (price and
    quantity) via quartile binning — the dependence screen for numeric
    feature pairs where Pearson only sees linearity (`stats_moments_
    lineitem` has corr; this catches any functional coupling). Bin
    edges are exact interpolated quartiles applied in-row; the 4×4
    contingency and its marginals are exact BIGINTs; each cell does one
    ln, rounded to 6. Σ cells = I(price; qty).

    Scale shape: one exact-percentile agg broadcast in-row, one 16-cell
    hash agg, marginal windows on the tiny table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    m = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    edges = m.agg(
        F.expr(
            "percentile(CAST(price AS DOUBLE), array(0.25D, 0.5D, 0.75D))"
        ).alias("pe"),
        F.expr("percentile(CAST(qty AS DOUBLE), array(0.25D, 0.5D, 0.75D))").alias(
            "qe"
        ),
    )
    binned = m.crossJoin(F.broadcast(edges)).select(
        F.expr("size(filter(pe, x -> price > x))").alias("pb"),
        F.expr("size(filter(qe, x -> qty > x))").alias("qb"),
    )
    joint = binned.groupBy("pb", "qb").agg(
        F.count(F.lit(1)).cast("long").alias("n_ij")
    )
    mi = joint.select(
        "pb",
        "qb",
        "n_ij",
        F.sum("n_ij").over(Window.partitionBy()).cast("long").alias("n"),
        F.sum("n_ij").over(Window.partitionBy("pb")).cast("long").alias("n_i"),
        F.sum("n_ij").over(Window.partitionBy("qb")).cast("long").alias("n_j"),
    )
    return mi.select(
        "pb",
        "qb",
        "n_ij",
        F.round(
            (F.col("n_ij").cast("double") / F.col("n"))
            * F.log(
                (F.col("n_ij").cast("double") * F.col("n"))
                / (F.col("n_i").cast("double") * F.col("n_j"))
            ),
            6,
        ).alias("mi_contrib"),
    )


# ---------------------------------------------------------------------------
# wave 81: conformal prediction, partial-pooling shrinkage
# ---------------------------------------------------------------------------


@query(
    "conformal_price_interval",
    oracle="""
    WITH m AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS actual,
               CAST(ROUND((50000.0 + 1500.0 * (o_orderkey % 100)) * 100) AS BIGINT)
                   AS pred,
               ((o_orderkey * 2654435761) % 4294967296) % 2 AS half
        FROM orders
    ), calib AS (
        SELECT ABS(actual - pred) AS r FROM m WHERE half = 0
    ), qhat AS (
        -- split-conformal: the ceil((n+1)*0.95)-th order statistic
        SELECT r AS q
        FROM (SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rn,
                     COUNT(*) OVER () AS n
              FROM calib)
        WHERE rn = CAST(CEIL((n + 1) * 0.95) AS BIGINT)
    ), test AS (
        SELECT actual, pred FROM m WHERE half = 1
    )
    SELECT CAST((SELECT COUNT(*) FROM calib) AS BIGINT) AS n_calib,
           CAST((SELECT COUNT(*) FROM test) AS BIGINT) AS n_test,
           CAST(q AS BIGINT) AS qhat_cents,
           CAST((SELECT SUM(CASE WHEN ABS(actual - pred) <= q THEN 1 ELSE 0 END)
                 FROM test) * 1000000
                // (SELECT COUNT(*) FROM test) AS BIGINT) AS coverage_ppm
    FROM qhat
    """,
)
def conformal_price_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval for the price model:
    calibration-half absolute residuals give q̂ = the ⌈(n+1)·0.95⌉-th
    order statistic, and pred ± q̂ is then a distribution-free ≥95%
    coverage interval on the disjoint test half — the
    assumption-free uncertainty wrapper modern ML serving puts around
    ANY point predictor, here entirely relational: deterministic hash
    halves, an integer rank lookup for q̂, and the empirical coverage
    audit in exact ppm (the number that validates the guarantee).

    Scale shape: one pass tags halves map-side; q̂ is one rank window
    on the calibration half (approx-quantile swap documented at extreme
    n); coverage is a 1-row agg over the test half with the scalar q̂
    broadcast.
    """
    orders = load_table(spark, sf_dir, "orders")
    m = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("actual"),
        F.round((50000.0 + 1500.0 * (F.col("o_orderkey") % 100)) * 100)
        .cast("long")
        .alias("pred"),
        (((F.col("o_orderkey") * 2654435761) % 4294967296) % 2).alias("half"),
    )
    calib = m.filter(F.col("half") == 0).select(
        F.abs(F.col("actual") - F.col("pred")).alias("r")
    )
    ranked = calib.select(
        "r",
        F.row_number().over(Window.orderBy("r")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    qhat = ranked.filter(
        F.col("rn") == F.ceil((F.col("n") + 1) * 0.95).cast("long")
    ).select(F.col("r").alias("q"), F.col("n").cast("long").alias("n_calib"))
    test = m.filter(F.col("half") == 1)
    cov = test.crossJoin(F.broadcast(qhat)).agg(
        F.max("n_calib").alias("n_calib"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.max("q").cast("long").alias("qhat_cents"),
        F.sum(
            F.when(F.abs(F.col("actual") - F.col("pred")) <= F.col("q"), 1).otherwise(
                0
            )
        ).alias("n_cov"),
    )
    return cov.select(
        "n_calib",
        "n_test",
        "qhat_cents",
        F.expr("n_cov * 1000000L div n_test").cast("long").alias("coverage_ppm"),
    )


@query(
    "shrunk_group_slopes",
    oracle="""
    WITH j AS (
        SELECT c.c_nationkey AS nation,
               o.o_totalprice * 100 AS price_cents,
               o.o_orderkey % 100 AS x
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), grp AS (
        SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
               regr_slope(price_cents, x) AS slope_g
        FROM j GROUP BY nation
    ), pooled AS (
        SELECT regr_slope(price_cents, x) AS slope_p FROM j
    )
    SELECT nation, n,
           ROUND(slope_g, 4) AS group_slope,
           ROUND(slope_p, 4) AS pooled_slope,
           ROUND((n * slope_g + 200 * slope_p) / (n + 200), 4) AS shrunk_slope
    FROM grp, pooled
    """,
)
def shrunk_group_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial pooling: per-nation regression slopes shrunk toward the
    pooled slope with precision weight n/(n+k), k=200 — the James-Stein
    /hierarchical-model move that stops small groups from reporting
    wild slopes while letting data-rich groups keep their own. The
    per-group, pooled, and shrunk estimates ship side by side so the
    shrinkage is auditable.

    Determinism: both slopes are single-pass regr_slope moments over
    identical inputs; the blend is a fixed IEEE dag rounded to 4.

    Scale shape: one broadcast dim join, one |nations|-row group agg +
    a 1-row pooled agg broadcast back. Partial pooling at 100 TB is
    exactly this plan.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(
        F.broadcast(cust.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")),
        "o_custkey",
    ).select(
        F.col("c_nationkey").alias("nation"),
        (F.col("o_totalprice") * 100).alias("price_cents"),
        (F.col("o_orderkey") % 100).alias("x"),
    )
    grp = j.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("regr_slope(price_cents, x)").alias("slope_g"),
    )
    pooled = j.agg(F.expr("regr_slope(price_cents, x)").alias("slope_p"))
    return grp.crossJoin(F.broadcast(pooled)).select(
        "nation",
        "n",
        F.round("slope_g", 4).alias("group_slope"),
        F.round("slope_p", 4).alias("pooled_slope"),
        F.round(
            (F.col("n") * F.col("slope_g") + 200 * F.col("slope_p"))
            / (F.col("n") + 200),
            4,
        ).alias("shrunk_slope"),
    )


# ---------------------------------------------------------------------------
# wave 82: time-decayed popularity ranking
# ---------------------------------------------------------------------------


@query(
    "decayed_popularity_ranking",
    oracle="""
    WITH views AS (
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id,
               epoch_us(ts) AS t
        FROM events
        WHERE event_type = 'view'
          AND json_extract_string(props, '$.k') IS NOT NULL
    ), horizon AS (
        SELECT MAX(t) AS now_us FROM views
    ), scored AS (
        SELECT item_id,
               CAST(COUNT(*) AS BIGINT) AS n_views,
               SUM(1.0 / pow((CAST(now_us - t AS DOUBLE) / 3600000000.0 + 2.0),
                             1.5)) AS decayed
        FROM views, horizon GROUP BY item_id
    )
    SELECT item_id, n_views, ROUND(decayed, 6) AS decayed_score
    FROM scored
    ORDER BY decayed DESC, item_id
    LIMIT 15
    """,
)
def decayed_popularity_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gravity-decayed popularity feed ranking: each view contributes
    1/(age_hours + 2)^1.5 (the classic news-feed decay curve), top-15
    items by decayed score — recency-aware trending that a raw count
    ranking ('all-time popular') can never express. 'Now' is pinned to
    the max event time so the query is replayable.

    Determinism note: the decayed score is a float SUM whose
    accumulation order differs between engines — per-item sums here are
    small (≤ a few hundred terms) and the ranking gap between items is
    >> the 1-ulp noise, with item_id tie-breaks and 6-decimal rounding
    on display; for adversarial scales the documented exact form is
    micro-unit quantization per term (the `unigram_logprob_quality`
    trick).

    Scale shape: JSON-shredded views collapse per item in one hash agg
    with map-side partials; TakeOrdered top-k. The decay needs no
    refresh jobs — the score is a pure function of (now, view times).
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    views = ev.filter(
        (F.col("event_type") == "view")
        & F.get_json_object("props", "$.k").isNotNull()
    ).select(
        F.get_json_object("props", "$.k").cast("long").alias("item_id"),
        us.alias("t"),
    )
    horizon = views.agg(F.max("t").alias("now_us"))
    scored = (
        views.crossJoin(F.broadcast(horizon))
        .groupBy("item_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_views"),
            F.sum(
                1.0
                / F.pow(
                    (F.col("now_us") - F.col("t")).cast("double") / 3600000000.0
                    + 2.0,
                    1.5,
                )
            ).alias("decayed"),
        )
    )
    return (
        scored.orderBy(F.desc("decayed"), F.asc("item_id"))
        .limit(15)
        .select("item_id", "n_views", F.round("decayed", 6).alias("decayed_score"))
    )


# ---------------------------------------------------------------------------
# wave 83: SLO error-budget burn, difference-in-differences
# ---------------------------------------------------------------------------


@query(
    "slo_error_budget_burn",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS errs
        FROM events GROUP BY 1
    ), cum AS (
        SELECT day, n, errs,
               SUM(errs) OVER (ORDER BY day) AS cum_errs,
               SUM(n) OVER (ORDER BY day) AS cum_n
        FROM daily
    )
    SELECT day, n, errs,
           CAST(errs * 1000000 // n AS BIGINT) AS daily_error_ppm,
           CAST(cum_errs AS BIGINT) AS cum_errors,
           -- budget: 25% error-rate SLO; burn = cumulative errors as ppm
           -- of the cumulative allowance
           CAST(cum_errs * 4000000 // cum_n AS BIGINT) AS budget_burn_ppm
    FROM cum
    """,
)
def slo_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRE error-budget burn-down: daily error rate against a 25%
    error-rate SLO, with the cumulative burn expressed as ppm of the
    cumulative allowance (10⁶ = budget exactly spent; >10⁶ = SLO
    breached, freeze launches) — the error-budget arithmetic of
    SLO-based alerting as one exact-integer relation (burn =
    cum_errors · (10⁶/0.25) ÷ cum_events). The fixture's ~20% error
    share makes the burn hover meaningfully below breach.

    Scale shape: one daily hash agg; two running windows over |days|
    rows sharing one frame. Thresholds are config; the shape is the
    operator.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    daily = ev.groupBy(epoch_day("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("errs"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "day",
        "n",
        "errs",
        F.sum("errs").over(w).alias("cum_errs"),
        F.sum("n").over(w).alias("cum_n"),
    )
    return cum.select(
        "day",
        "n",
        "errs",
        F.expr("errs * 1000000L div n").cast("long").alias("daily_error_ppm"),
        F.col("cum_errs").cast("long").alias("cum_errors"),
        F.expr("cum_errs * 4000000L div cum_n").cast("long").alias("budget_burn_ppm"),
    )


@query(
    "diff_in_diff_revenue",
    oracle="""
    WITH o AS (
        SELECT c.c_nationkey % 2 AS grp,
               CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS day,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), bounds AS (
        SELECT (MIN(day) + MAX(day)) // 2 AS mid FROM o
    ), cells AS (
        SELECT grp, CASE WHEN day < mid THEN 0 ELSE 1 END AS post,
               CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
        FROM o, bounds GROUP BY 1, 2
    )
    SELECT
        CAST(MAX(CASE WHEN grp = 1 AND post = 1 THEN s // n END) AS BIGINT)
            AS treat_post,
        CAST(MAX(CASE WHEN grp = 1 AND post = 0 THEN s // n END) AS BIGINT)
            AS treat_pre,
        CAST(MAX(CASE WHEN grp = 0 AND post = 1 THEN s // n END) AS BIGINT)
            AS ctrl_post,
        CAST(MAX(CASE WHEN grp = 0 AND post = 0 THEN s // n END) AS BIGINT)
            AS ctrl_pre,
        CAST(MAX(CASE WHEN grp = 1 AND post = 1 THEN s // n END)
             - MAX(CASE WHEN grp = 1 AND post = 0 THEN s // n END)
             - (MAX(CASE WHEN grp = 0 AND post = 1 THEN s // n END)
                - MAX(CASE WHEN grp = 0 AND post = 0 THEN s // n END))
             AS BIGINT) AS did_cents
    FROM cells
    """,
)
def diff_in_diff_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the change in mean order value for the
    'treated' nation group (odd nation keys — a stand-in policy rollout)
    minus the change in the control group across the period midpoint —
    the workhorse quasi-experimental estimator when randomization isn't
    available, assuming parallel trends (which the hash-split fixture
    satisfies by construction, so DiD ≈ 0 here — the null case the
    estimator should report). All four cell means are exact BIGINT
    floor-divisions; the DiD is their integer combination.

    Scale shape: one dim join (broadcast), a 4-cell conditional agg with
    map-side partials, constant algebra after.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    o = orders.join(
        F.broadcast(cust.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")),
        "o_custkey",
    ).select(
        (F.col("c_nationkey") % 2).alias("grp"),
        epoch_day("o_orderdate").alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    bounds = o.agg(F.expr("(min(day) + max(day)) div 2").alias("mid"))
    cells = (
        o.crossJoin(F.broadcast(bounds))
        .groupBy("grp", F.when(F.col("day") < F.col("mid"), 0).otherwise(1).alias("post"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("s"),
        )
    )
    mean = F.expr("s div n")
    cell = lambda g, p: F.max(
        F.when((F.col("grp") == g) & (F.col("post") == p), mean)
    )
    return cells.agg(
        cell(1, 1).cast("long").alias("treat_post"),
        cell(1, 0).cast("long").alias("treat_pre"),
        cell(0, 1).cast("long").alias("ctrl_post"),
        cell(0, 0).cast("long").alias("ctrl_pre"),
        (cell(1, 1) - cell(1, 0) - (cell(0, 1) - cell(0, 0)))
        .cast("long")
        .alias("did_cents"),
    )


# ---------------------------------------------------------------------------
# wave 84: generalized means, weighted Jaccard
# ---------------------------------------------------------------------------


@query(
    "generalized_means_suite",
    oracle="""
    WITH m AS (
        SELECT o_orderstatus,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_totalprice > 0
    ), agg AS (
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(SUM(CAST(ROUND(ln(CAST(cents AS DOUBLE)) * 1000000) AS BIGINT))
                    AS BIGINT) AS ln_unats,
               CAST(SUM(1000000000 // cents) AS BIGINT) AS recip_nanos
        FROM m GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, n,
           CAST(s // n AS BIGINT) AS arith_mean_cents,
           CAST(ROUND(exp(CAST(ln_unats // n AS DOUBLE) / 1000000)) AS BIGINT)
               AS geo_mean_cents,
           CAST(n * 1000000000 // recip_nanos AS BIGINT) AS harm_mean_cents
    FROM agg
    """,
)
def generalized_means_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pythagorean-means suite per order status: arithmetic
    (exact integer), geometric (mean of micro-nat-quantized logs,
    exponentiated — the mean for ratios and growth rates), and harmonic
    (from nano-unit-quantized reciprocals — the mean for rates, e.g.
    'average price per unit' done right). Every accumulation is a BIGINT
    sum of pre-quantized terms, so all three means are
    summation-order-proof; AM ≥ GM ≥ HM is test-pinned.

    Scale shape: one partial+final hash agg carrying four BIGINTs per
    group; constant arithmetic out.
    """
    orders = load_table(spark, sf_dir, "orders")
    m = orders.filter(F.col("o_totalprice") > 0).select(
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    agg = m.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(
            F.round(F.log(F.col("cents").cast("double")) * 1000000).cast("long")
        )
        .cast("long")
        .alias("ln_unats"),
        F.sum(F.expr("1000000000L div cents")).cast("long").alias("recip_nanos"),
    )
    return agg.select(
        "o_orderstatus",
        "n",
        F.expr("s div n").cast("long").alias("arith_mean_cents"),
        F.round(F.exp(F.expr("CAST(ln_unats div n AS DOUBLE) / 1000000")))
        .cast("long")
        .alias("geo_mean_cents"),
        F.expr("n * 1000000000L div recip_nanos").cast("long").alias(
            "harm_mean_cents"
        ),
    )


@query(
    "weighted_jaccard_sources",
    oracle="""
    WITH tc AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM (
            SELECT source,
                   unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                          ELSE string_split_regex(lower(trim(text)), '\\s+') END)
                       AS w
            FROM documents
        ) GROUP BY source, w
    ), pairs AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS min_sum
        FROM tc a JOIN tc b ON b.w = a.w AND b.source > a.source
        GROUP BY 1, 2
    ), totals AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS tot FROM tc GROUP BY source
    )
    SELECT p.src_a, p.src_b, p.min_sum,
           CAST(p.min_sum * 1000000
                // (ta.tot + tb.tot - p.min_sum) AS BIGINT) AS wjaccard_ppm
    FROM pairs p JOIN totals ta ON ta.source = p.src_a
                 JOIN totals tb ON tb.source = p.src_b
    WHERE p.min_sum * 1000000 // (ta.tot + tb.tot - p.min_sum) >= 300000
    """,
)
def weighted_jaccard_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (multiset) Jaccard similarity between source token-count
    vectors: Σmin(c_a,c_b)/Σmax(c_a,c_b) in exact ppm, reported for
    pairs above 0.30 — the multiplicity-aware twin of the distinct-
    shingle `source_shingle_overlap` (two crawls can share every word
    type yet have wildly different usage MIXES; this metric sees that).
    Σmax is computed as tot_a + tot_b − Σmin, so only co-occurring
    vocabulary ever joins. All BIGINT.

    Scale shape: one (source, token) hash agg; the pair join is keyed
    on the token with fan-out bounded by |sources| per token (never
    quadratic in documents); totals broadcast onto the |sources|² result.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select("source", F.explode(ws_tokens(F.lower(F.col("text")))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    a = tc.select(F.col("source").alias("src_a"), "w", F.col("c").alias("ca"))
    b = tc.select(F.col("source").alias("src_b"), "w", F.col("c").alias("cb"))
    pairs = (
        a.join(b, "w")
        .filter(F.col("src_b") > F.col("src_a"))
        .groupBy("src_a", "src_b")
        .agg(F.sum(F.least("ca", "cb")).cast("long").alias("min_sum"))
    )
    totals = tc.groupBy("source").agg(F.sum("c").cast("long").alias("tot"))
    j = (
        pairs.join(
            F.broadcast(totals.select(F.col("source").alias("src_a"),
                                      F.col("tot").alias("ta"))),
            "src_a",
        )
        .join(
            F.broadcast(totals.select(F.col("source").alias("src_b"),
                                      F.col("tot").alias("tb"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "min_sum",
            F.expr("min_sum * 1000000L div (ta + tb - min_sum)")
            .cast("long")
            .alias("wjaccard_ppm"),
        )
    )
    return j.filter(F.col("wjaccard_ppm") >= 300000)


# ---------------------------------------------------------------------------
# wave 85: Cramér-von Mises drift, quantile treatment effects
# ---------------------------------------------------------------------------


@query(
    "cramer_von_mises_drift",
    oracle="""
    WITH m AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
               CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS grp,
               event_id
        FROM events WHERE event_type IN ('view', 'purchase')
    ), pooled AS (
        SELECT grp,
               ROW_NUMBER() OVER (ORDER BY cents, event_id) AS r,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cents, event_id) AS i
        FROM m
    ), sums AS (
        SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS mm,
               CAST(SUM(CASE WHEN grp = 0 THEN (r - i) * (r - i) END) AS HUGEINT)
                   AS ua,
               CAST(SUM(CASE WHEN grp = 1 THEN (r - i) * (r - i) END) AS HUGEINT)
                   AS ub
        FROM pooled
    )
    SELECT n AS n_view, mm AS n_purchase,
           CAST(n * ua + mm * ub AS BIGINT) AS u_stat,
           ROUND(CAST(n * ua + mm * ub AS DOUBLE) / (CAST(n AS DOUBLE) * mm * (n + mm))
                 - (4.0 * n * mm - 1) / (6.0 * (n + mm)), 6) AS cvm_t
    FROM sums
    """,
)
def cramer_von_mises_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises statistic between view and purchase
    value distributions — the INTEGRATED-gap drift test beside KS's
    max-gap (`ks_drift_view_purchase`): CvM sees distributed small
    shifts across the whole distribution that a single crossing point
    hides. Computed by the rank formula: U = n·Σ(r_i−i)² + m·Σ(s_j−j)²
    over pooled vs within-group ranks — exact 128-bit integers with a
    deterministic (value, event_id) tie order; T is two IEEE ops on
    those exact sums.

    Scale shape: one pooled rank (range-partitionable sort) plus
    per-group ranks sharing the same order; the U aggregation is a
    1-row reduce. No pairwise work.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    m = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(F.col("event_type") == "view", 0).otherwise(1).alias("grp"),
        "event_id",
    )
    pooled = m.select(
        "grp",
        F.row_number().over(Window.orderBy("cents", "event_id")).alias("r"),
        F.row_number()
        .over(Window.partitionBy("grp").orderBy("cents", "event_id"))
        .alias("i"),
    )
    d2 = ((F.col("r") - F.col("i")) * (F.col("r") - F.col("i"))).cast(
        "decimal(38,0)"
    )
    sums = pooled.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("n"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("mm"),
        F.sum(F.when(F.col("grp") == 0, d2)).alias("ua"),
        F.sum(F.when(F.col("grp") == 1, d2)).alias("ub"),
    )
    u = F.col("n") * F.col("ua") + F.col("mm") * F.col("ub")
    return sums.select(
        F.col("n").alias("n_view"),
        F.col("mm").alias("n_purchase"),
        u.cast("long").alias("u_stat"),
        F.round(
            u.cast("double")
            / (F.col("n").cast("double") * F.col("mm") * (F.col("n") + F.col("mm")))
            - (4.0 * F.col("n") * F.col("mm") - 1)
            / (6.0 * (F.col("n") + F.col("mm"))),
            6,
        ).alias("cvm_t"),
    )


@query(
    "quantile_treatment_effect",
    oracle="""
    WITH m AS (
        SELECT ((user_id * 2654435761) % 4294967296) % 2 AS arm,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ), q AS (
        SELECT arm,
               quantile_cont(CAST(cents AS DOUBLE),
                             [0.1, 0.25, 0.5, 0.75, 0.9]) AS qs
        FROM m GROUP BY arm
    ), wide AS (
        SELECT g.i AS qi,
               MAX(CASE WHEN arm = 0 THEN qs[g.i] END) AS q0,
               MAX(CASE WHEN arm = 1 THEN qs[g.i] END) AS q1
        FROM q, LATERAL (SELECT unnest(generate_series(1, 5)) AS i) g
        GROUP BY g.i
    )
    SELECT CAST(qi AS BIGINT) AS quantile_idx,
           ROUND(q0, 4) AS ctrl_cents, ROUND(q1, 4) AS treat_cents,
           ROUND(q1 - q0, 4) AS qte_cents
    FROM wide
    """,
)
def quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects: the arm-1-minus-arm-0 difference at
    the 10/25/50/75/90th percentiles of purchase value — the
    DISTRIBUTIONAL uplift view that a mean difference (CUPED, bootstrap
    uplift) collapses: a treatment can move the p90 while leaving the
    median untouched, and only this readout shows it. Percentiles are
    exact interpolations over BIGINT cents (engine-identical doubles);
    the effect is one subtraction per row.

    Scale shape: per-arm exact percentile aggs (sort-based within two
    groups); the pivot runs on 10 values.
    """
    ev = load_table(spark, sf_dir, "events")
    m = ev.filter(F.col("event_type") == "purchase").select(
        (((F.col("user_id") * 2654435761) % 4294967296) % 2).alias("arm"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    q = m.groupBy("arm").agg(
        F.expr(
            "percentile(CAST(cents AS DOUBLE), array(0.1D,0.25D,0.5D,0.75D,0.9D))"
        ).alias("qs")
    )
    wide = (
        q.select("arm", F.posexplode("qs").alias("p", "v"))
        .groupBy((F.col("p") + 1).alias("quantile_idx"))
        .agg(
            F.max(F.when(F.col("arm") == 0, F.col("v"))).alias("q0"),
            F.max(F.when(F.col("arm") == 1, F.col("v"))).alias("q1"),
        )
    )
    return wide.select(
        F.col("quantile_idx").cast("long").alias("quantile_idx"),
        F.round("q0", 4).alias("ctrl_cents"),
        F.round("q1", 4).alias("treat_cents"),
        F.round(F.col("q1") - F.col("q0"), 4).alias("qte_cents"),
    )


# ---------------------------------------------------------------------------
# wave 86: UCB exploration ranking, char-entropy compressibility
# ---------------------------------------------------------------------------


@query(
    "ucb_item_ranking",
    oracle="""
    WITH ev AS (
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS reward
        FROM events
        WHERE event_type IN ('view', 'purchase')
          AND json_extract_string(props, '$.k') IS NOT NULL
    ), arms AS (
        SELECT item_id, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(reward) AS BIGINT) AS k
        FROM ev GROUP BY item_id
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS big_n FROM arms
    )
    SELECT item_id, n, k,
           ROUND(CAST(k AS DOUBLE) / n
                 + sqrt(2.0 * ln(CAST(big_n AS DOUBLE)) / n), 6) AS ucb1
    FROM arms, tot
    ORDER BY CAST(k AS DOUBLE) / n
             + sqrt(2.0 * ln(CAST(big_n AS DOUBLE)) / n) DESC, item_id
    LIMIT 15
    """,
)
def ucb_item_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 bandit scores per item: empirical purchase-per-interaction
    rate plus the √(2·ln N / n) exploration bonus, top-15 — the
    deterministic replay of the explore/exploit ranking an adaptive
    system would serve (low-data items float UP via the bonus — exactly
    what a pure popularity ranking suppresses; compare
    `decayed_popularity_ranking`). Counts are exact; the score is a
    fixed IEEE dag per arm with item-id tie-breaks; the separation
    between arms dwarfs ulp noise.

    Scale shape: JSON shred → per-item (n, k) hash agg; the scalar N
    broadcasts; TakeOrdered top-k.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(
        F.col("event_type").isin("view", "purchase")
        & F.get_json_object("props", "$.k").isNotNull()
    ).select(
        F.get_json_object("props", "$.k").cast("long").alias("item_id"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("reward"),
    )
    arms = e.groupBy("item_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("reward").cast("long").alias("k"),
    )
    tot = arms.agg(F.sum("n").cast("long").alias("big_n"))
    ucb = F.col("k").cast("double") / F.col("n") + F.sqrt(
        2.0 * F.log(F.col("big_n").cast("double")) / F.col("n")
    )
    return (
        arms.crossJoin(F.broadcast(tot))
        .orderBy(ucb.desc(), F.asc("item_id"))
        .limit(15)
        .select("item_id", "n", "k", F.round(ucb, 6).alias("ucb1"))
    )


@query(
    "char_entropy_compressibility",
    oracle="""
    WITH chars AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(lower(trim(text)), '')) AS ch
        FROM documents WHERE trim(text) <> ''
    ), counts AS (
        SELECT lang, ch, CAST(COUNT(*) AS BIGINT) AS c
        FROM chars WHERE ch <> '' GROUP BY lang, ch
    ), lstats AS (
        SELECT lang, CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS alphabet
        FROM counts GROUP BY lang
    ), ent AS (
        SELECT c.lang,
               CAST(SUM(c.c * CAST(ROUND(ln(CAST(c.c AS DOUBLE) / s.n) * 1000000)
                    AS BIGINT)) AS BIGINT) AS neg_h_n_unats
        FROM counts c JOIN lstats s ON s.lang = c.lang GROUP BY c.lang
    )
    SELECT s.lang, s.n AS n_chars, s.alphabet,
           CAST(-e.neg_h_n_unats // s.n AS BIGINT) AS entropy_unats,
           ROUND(CAST(-e.neg_h_n_unats // s.n AS DOUBLE) / 1000000 / ln(2.0), 4)
               AS bits_per_char
    FROM lstats s JOIN ent e ON e.lang = s.lang
    """,
)
def char_entropy_compressibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per language in bits/char — the
    compressibility floor (an order-0 entropy coder can't beat it):
    natural language sits near 4-4.5 bits/char, base64/random blobs
    near 6, templated or repeated text far lower. The cheap
    detect-the-garbage signal beside the token-level
    `effective_vocab_size`, using the same micro-nat pre-quantization
    so sums are exact integers on both engines.

    Scale shape: char explode (map-side) → alphabet-bounded (lang, ch)
    agg; entropy on the tiny count relation; constants out.
    """
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.filter(F.trim(F.col("text")) != "").select(
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), "")).alias("ch"),
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("lang", "ch").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    lstats = counts.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("alphabet"),
    )
    ent = (
        counts.join(F.broadcast(lstats.select("lang", "n")), "lang")
        .select(
            "lang",
            (
                F.col("c")
                * F.round(F.log(F.col("c").cast("double") / F.col("n")) * 1000000)
                .cast("long")
            ).alias("t"),
        )
        .groupBy("lang")
        .agg(F.sum("t").cast("long").alias("neg_h_n_unats"))
    )
    import math

    return lstats.join(ent, "lang").select(
        "lang",
        F.col("n").alias("n_chars"),
        "alphabet",
        F.expr("-neg_h_n_unats div n").cast("long").alias("entropy_unats"),
        F.round(
            F.expr("CAST(-neg_h_n_unats div n AS DOUBLE) / 1000000")
            / float(math.log(2.0)),
            4,
        ).alias("bits_per_char"),
    )


# ---------------------------------------------------------------------------
# wave 87: Herfindahl concentration, rich-club coefficient
# ---------------------------------------------------------------------------


@query(
    "hhi_supplier_concentration",
    oracle="""
    WITH rev AS (
        SELECT s.s_nationkey AS nation, l.l_suppkey AS supp,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
    ), tot AS (
        SELECT nation, CAST(SUM(cents) AS BIGINT) AS t,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM rev GROUP BY nation
    ), shares AS (
        SELECT r.nation, t.n_suppliers,
               r.cents * 1000000 // t.t AS share_ppm
        FROM rev r JOIN tot t ON t.nation = r.nation
    )
    SELECT nation, CAST(MAX(n_suppliers) AS BIGINT) AS n_suppliers,
           CAST(SUM(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm
    FROM shares GROUP BY nation
    """,
)
def hhi_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue within
    each nation's market, in exact ppm (10⁶ = monopoly; 10⁶/n = perfect
    competition) — the antitrust/market-structure scalar beside the
    customer-side Gini/Lorenz: HHI weights the BIG players
    quadratically, so one dominant supplier moves it where Gini barely
    stirs. Shares are floored ppm integers and HHI is their exact
    squared sum — all BIGINT.

    Scale shape: fact → (nation, supplier) collapse; totals broadcast
    back; one |nations|-row final agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.join(
            F.broadcast(supp.select(F.col("s_suppkey").alias("l_suppkey"),
                                    "s_nationkey")),
            "l_suppkey",
        )
        .groupBy(F.col("s_nationkey").alias("nation"), "l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    tot = rev.groupBy("nation").agg(
        F.sum("cents").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    shares = rev.join(F.broadcast(tot), "nation").select(
        "nation", "n_suppliers", F.expr("cents * 1000000L div t").alias("share_ppm")
    )
    return shares.groupBy("nation").agg(
        F.max("n_suppliers").cast("long").alias("n_suppliers"),
        F.expr("sum(share_ppm * share_ppm) div 1000000L")
        .cast("long")
        .alias("hhi_ppm"),
    )


@query(
    "rich_club_coefficient",
    oracle="""
    WITH fwd AS (
        SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), edges AS (
        SELECT 'c' || CAST(ck AS VARCHAR) AS src, 's' || CAST(sk AS VARCHAR) AS dst
        FROM fwd
        UNION ALL
        SELECT 's' || CAST(sk AS VARCHAR), 'c' || CAST(ck AS VARCHAR) FROM fwd
    ), deg AS (
        SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src
    ), ks AS (
        SELECT unnest([4, 8, 16, 32]) AS k
    ), club AS (
        SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS n_club
        FROM ks JOIN deg ON deg.d > ks.k GROUP BY ks.k
    ), club_edges AS (
        SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS e2
        FROM ks JOIN edges e ON TRUE
        JOIN deg ds ON ds.node = e.src AND ds.d > ks.k
        JOIN deg dd ON dd.node = e.dst AND dd.d > ks.k
        GROUP BY ks.k
    )
    SELECT c.k, c.n_club,
           CAST(COALESCE(ce.e2, 0) AS BIGINT) AS directed_edges_in_club,
           CAST(CASE WHEN c.n_club < 2 THEN 0
                ELSE COALESCE(ce.e2, 0) * 1000000 // (c.n_club * (c.n_club - 1))
                END AS BIGINT) AS phi_ppm
    FROM club c LEFT JOIN club_edges ce ON ce.k = c.k
    """,
)
def rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) of the bidirected trade graph at
    degree thresholds {4,8,16,32}: the edge density among nodes of
    degree > k, in exact ppm — 'do the hubs form their own dense club?'
    (with modularity, assortativity, k-core, triangles this completes
    the structural-metrics shelf). A bipartite graph CAN'T close
    hub-hub edges within a side, so low φ here is the expected
    signature — which is the point: the metric exposes bipartiteness.

    Scale shape: degrees are one hash agg; club membership is a
    broadcast-joined filter on the edge list per threshold (4 passes
    over a narrow edge relation, or one pass with an array contains at
    scale); counts are exact.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    fwd = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    e1 = fwd.select(
        F.concat(F.lit("c"), F.col("ck").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("sk").cast("string")).alias("dst"),
    )
    e2 = fwd.select(
        F.concat(F.lit("s"), F.col("sk").cast("string")).alias("src"),
        F.concat(F.lit("c"), F.col("ck").cast("string")).alias("dst"),
    )
    edges = e1.unionByName(e2)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    ks = spark.createDataFrame([(4,), (8,), (16,), (32,)], "k long")
    club = ks.join(deg, deg.d > ks.k).groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_club")
    )
    ce = (
        ks.crossJoin(edges)
        .join(
            deg.select(F.col("node").alias("src"), F.col("d").alias("ds")), "src"
        )
        .join(
            deg.select(F.col("node").alias("dst"), F.col("d").alias("dd")), "dst"
        )
        .filter((F.col("ds") > F.col("k")) & (F.col("dd") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("e2"))
    )
    return (
        club.join(ce, "k", "left")
        .select(
            "k",
            "n_club",
            F.coalesce("e2", F.lit(0)).cast("long").alias("directed_edges_in_club"),
            F.when(F.col("n_club") < 2, 0)
            .otherwise(
                F.expr(
                    "coalesce(e2, 0L) * 1000000L div (n_club * (n_club - 1))"
                )
            )
            .cast("long")
            .alias("phi_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# wave 88: log-rank test between arms
# ---------------------------------------------------------------------------


@query(
    "logrank_test_arms",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               ((user_id * 2654435761) % 4294967296) % 2 AS arm,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS buy_ts
        FROM events GROUP BY user_id
    ), horizon AS (
        SELECT MAX(ts) AS max_ts FROM events
    ), durations AS (
        SELECT arm,
               CAST(CASE WHEN buy_ts IS NOT NULL AND buy_ts >= signup_ts
                    THEN date_diff('day', signup_ts, buy_ts)
                    ELSE date_diff('day', signup_ts, max_ts) END AS BIGINT)
                   AS t_days,
               CASE WHEN buy_ts IS NOT NULL AND buy_ts >= signup_ts
                    THEN 1 ELSE 0 END AS event
        FROM per_user, horizon WHERE signup_ts IS NOT NULL
    ), day_counts AS (
        SELECT t_days,
               CAST(SUM(CASE WHEN arm = 1 THEN event ELSE 0 END) AS BIGINT) AS d1,
               CAST(SUM(event) AS BIGINT) AS d,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
               CAST(COUNT(*) AS BIGINT) AS h
        FROM durations GROUP BY t_days
    ), risk AS (
        SELECT t_days, d1, d,
               CAST((SELECT SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                     FROM durations)
                    - COALESCE(SUM(h1) OVER (ORDER BY t_days
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS n1,
               CAST((SELECT COUNT(*) FROM durations)
                    - COALESCE(SUM(h) OVER (ORDER BY t_days
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS n
        FROM day_counts
    ), terms AS (
        SELECT d1, d, n1, n,
               d * n1 * 1000000 // n AS e1_u,
               CASE WHEN n <= 1 THEN 0
                    ELSE d * n1 * (n - n1) * (n - d) * 1000000
                         // (n * n * (n - 1)) END AS v_u
        FROM risk WHERE d > 0
    )
    SELECT CAST(SUM(d1) AS BIGINT) AS o1,
           CAST(SUM(e1_u) AS BIGINT) AS e1_unats,
           CAST(SUM(v_u) AS BIGINT) AS v_unats,
           ROUND((SUM(d1) * 1000000.0 - SUM(e1_u))
                 / sqrt(CAST(SUM(v_u) AS DOUBLE) * 1000000.0), 6) AS z
    FROM terms
    """,
)
def logrank_test_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test between the two hash arms' signup→purchase survival
    curves — the standard 'are these two time-to-event curves the same'
    test, with full right-censoring handling (censored users leave the
    risk set without counting as events). O₁−E₁ accumulates per-death-day
    hypergeometric expectations and variances as FLOOR-quantized
    micro-unit integers (each term d·n₁/n and its variance is one exact
    integer division), so the sums are engine-identical; z does one
    final sqrt+divide. Null case by construction on hash arms.

    Scale shape: the duration relation is per-user; at-risk counts come
    from one ordered cumsum window over |distinct days| rows (no
    per-day rescans); the test statistic is a 1-row reduce.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("signup_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("buy_ts"),
    ).select(
        (((F.col("user_id") * 2654435761) % 4294967296) % 2).alias("arm"),
        "signup_ts",
        "buy_ts",
    )
    horizon = ev.agg(F.max("ts").alias("max_ts"))
    has_buy = F.col("buy_ts").isNotNull() & (F.col("buy_ts") >= F.col("signup_ts"))
    durations = (
        per_user.filter(F.col("signup_ts").isNotNull())
        .crossJoin(F.broadcast(horizon))
        .select(
            "arm",
            F.when(
                has_buy, F.datediff(F.col("buy_ts"), F.col("signup_ts"))
            )
            .otherwise(F.datediff(F.col("max_ts"), F.col("signup_ts")))
            .cast("long")
            .alias("t_days"),
            F.when(has_buy, 1).otherwise(0).alias("event"),
        )
    )
    day_counts = durations.groupBy("t_days").agg(
        F.sum(F.when(F.col("arm") == 1, F.col("event")).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum("event").cast("long").alias("d"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("h1"),
        F.count(F.lit(1)).cast("long").alias("h"),
    )
    totals = durations.agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("t1"),
        F.count(F.lit(1)).cast("long").alias("t"),
    )
    wprev = Window.orderBy("t_days").rowsBetween(Window.unboundedPreceding, -1)
    risk = day_counts.crossJoin(F.broadcast(totals)).select(
        "t_days",
        "d1",
        "d",
        (F.col("t1") - F.coalesce(F.sum("h1").over(wprev), F.lit(0))).alias("n1"),
        (F.col("t") - F.coalesce(F.sum("h").over(wprev), F.lit(0))).alias("n"),
    )
    terms = risk.filter(F.col("d") > 0).select(
        "d1",
        F.expr("d * n1 * 1000000L div n").alias("e1_u"),
        F.when(F.col("n") <= 1, 0)
        .otherwise(
            F.expr("d * n1 * (n - n1) * (n - d) * 1000000L div (n * n * (n - 1))")
        )
        .alias("v_u"),
    )
    return terms.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum("e1_u").cast("long").alias("e1_unats"),
        F.sum("v_u").cast("long").alias("v_unats"),
        F.round(
            (F.sum("d1") * 1000000.0 - F.sum("e1_u"))
            / F.sqrt(F.sum("v_u").cast("double") * 1000000.0),
            6,
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# wave 89: empirical-Bayes rate shrinkage, weekly rank movers
# ---------------------------------------------------------------------------


@query(
    "eb_shrunk_ctr",
    oracle="""
    WITH ev AS (
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        FROM events
        WHERE event_type IN ('view', 'purchase')
          AND json_extract_string(props, '$.k') IS NOT NULL
    ), arms AS (
        SELECT item_id, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(conv) AS BIGINT) AS k
        FROM ev GROUP BY item_id
    ), mom AS (
        -- method-of-moments beta prior from the cross-item rate spread
        SELECT AVG(CAST(k AS DOUBLE) / n) AS mu,
               AVG(CAST(k AS DOUBLE) / n * (CAST(k AS DOUBLE) / n)) AS m2,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM arms
    ), prior AS (
        SELECT mu,
               CASE WHEN m2 - mu * mu <= 0 THEN 100.0
                    ELSE mu * (1 - mu) / (m2 - mu * mu) - 1 END AS nu
        FROM mom
    )
    SELECT a.item_id, a.n, a.k,
           ROUND(CAST(a.k AS DOUBLE) / a.n, 6) AS raw_rate,
           ROUND((a.k + p.mu * GREATEST(p.nu, 1.0))
                 / (a.n + GREATEST(p.nu, 1.0)), 6) AS shrunk_rate
    FROM arms a, prior p
    """,
)
def eb_shrunk_ctr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes conversion-rate smoothing: every item's raw
    purchase rate shrunk toward the cross-item mean by a beta prior fit
    by method of moments (prior strength ν = μ(1−μ)/var − 1, floored at
    1) — the industrial fix for 1-view-1-purchase items topping naive
    rankings; the rate counterpart of `shrunk_group_slopes`. Raw and
    shrunk rates ship side by side so the shrinkage is auditable.

    Determinism: counts exact; μ and ν are fixed IEEE dags over AVG
    moments of per-item exact ratios (item count is small enough that
    averaging order noise is below the 6-decimal rounding; the exact
    micro-unit path is documented for adversarial scale).

    Scale shape: one per-item agg, a 1-row prior, broadcast back.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(
        F.col("event_type").isin("view", "purchase")
        & F.get_json_object("props", "$.k").isNotNull()
    ).select(
        F.get_json_object("props", "$.k").cast("long").alias("item_id"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    arms = e.groupBy("item_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("k"),
    )
    rate = F.col("k").cast("double") / F.col("n")
    mom = arms.agg(
        F.avg(rate).alias("mu"),
        F.avg(rate * rate).alias("m2"),
    )
    prior = mom.select(
        "mu",
        F.when(F.col("m2") - F.col("mu") * F.col("mu") <= 0, 100.0)
        .otherwise(
            F.col("mu") * (1 - F.col("mu")) / (F.col("m2") - F.col("mu") * F.col("mu"))
            - 1
        )
        .alias("nu"),
    )
    nu = F.greatest(F.col("nu"), F.lit(1.0))
    return arms.crossJoin(F.broadcast(prior)).select(
        "item_id",
        "n",
        "k",
        F.round(rate, 6).alias("raw_rate"),
        F.round((F.col("k") + F.col("mu") * nu) / (F.col("n") + nu), 6).alias(
            "shrunk_rate"
        ),
    )


@query(
    "rank_movers_weekly",
    oracle="""
    WITH views AS (
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id,
               CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week
        FROM events
        WHERE event_type = 'view'
          AND json_extract_string(props, '$.k') IS NOT NULL
    ), weeks AS (
        SELECT MAX(week) AS cur FROM views
    ), counts AS (
        SELECT item_id, week, CAST(COUNT(*) AS BIGINT) AS n
        FROM views, weeks WHERE week IN (cur, cur - 1) GROUP BY item_id, week
    ), ranked AS (
        SELECT item_id, week, n,
               CAST(ROW_NUMBER() OVER (PARTITION BY week ORDER BY n DESC, item_id)
                    AS BIGINT) AS rnk
        FROM counts
    ), wide AS (
        SELECT c.item_id,
               MAX(CASE WHEN week = w.cur THEN rnk END) AS rank_now,
               MAX(CASE WHEN week = w.cur - 1 THEN rnk END) AS rank_prev
        FROM ranked c, weeks w GROUP BY c.item_id
    )
    SELECT item_id, rank_now, rank_prev,
           CAST(rank_prev - rank_now AS BIGINT) AS places_gained
    FROM wide
    WHERE rank_now IS NOT NULL AND rank_prev IS NOT NULL
    ORDER BY rank_prev - rank_now DESC, item_id
    LIMIT 10
    """,
)
def rank_movers_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly rank movers: the top-10 items that climbed the most
    view-count rank positions between the last two epoch weeks — the
    'trending up' report a raw leaderboard hides (an item going
    40th→12th matters more than the stable #1). Ranks are tie-broken on
    item_id, weeks are pure epoch-week arithmetic, and the mover score
    is an integer rank delta — fully hash-stable.

    Scale shape: views collapse per (item, week) for just two weeks
    (pushed predicate); two in-partition rank windows; the pivot and
    top-k run on the item summary.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    views = ev.filter(
        (F.col("event_type") == "view")
        & F.get_json_object("props", "$.k").isNotNull()
    ).select(
        F.get_json_object("props", "$.k").cast("long").alias("item_id"),
        F.expr(
            "unix_micros(CAST(ts AS timestamp_ltz)) div 604800000000"
        ).cast("long").alias("week"),
    )
    weeks = views.agg(F.max("week").alias("cur"))
    counts = (
        views.crossJoin(F.broadcast(weeks))
        .filter((F.col("week") == F.col("cur")) | (F.col("week") == F.col("cur") - 1))
        .groupBy("item_id", "week", "cur")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    ranked = counts.select(
        "item_id",
        "week",
        "cur",
        F.row_number()
        .over(Window.partitionBy("week").orderBy(F.desc("n"), F.asc("item_id")))
        .cast("long")
        .alias("rnk"),
    )
    wide = ranked.groupBy("item_id").agg(
        F.max(F.when(F.col("week") == F.col("cur"), F.col("rnk"))).alias("rank_now"),
        F.max(F.when(F.col("week") == F.col("cur") - 1, F.col("rnk"))).alias(
            "rank_prev"
        ),
    )
    return (
        wide.filter(F.col("rank_now").isNotNull() & F.col("rank_prev").isNotNull())
        .select(
            "item_id",
            "rank_now",
            "rank_prev",
            (F.col("rank_prev") - F.col("rank_now")).cast("long").alias(
                "places_gained"
            ),
        )
        .orderBy(F.desc("places_gained"), F.asc("item_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# wave 90: post-stratified comparison, dose-response curve
# ---------------------------------------------------------------------------


@query(
    "stratified_arm_comparison",
    oracle="""
    WITH j AS (
        SELECT ((e.user_id * 2654435761) % 4294967296) % 2 AS arm,
               c.c_mktsegment AS stratum,
               CAST(ROUND(e.value * 100) AS BIGINT) AS cents
        FROM events e JOIN customer c ON c.c_custkey = e.user_id
        WHERE e.event_type = 'purchase'
    ), cells AS (
        SELECT stratum, arm, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s
        FROM j GROUP BY 1, 2
    ), strata AS (
        SELECT stratum,
               MAX(CASE WHEN arm = 0 THEN s // n END) AS m0,
               MAX(CASE WHEN arm = 1 THEN s // n END) AS m1,
               CAST(SUM(n) AS BIGINT) AS w
        FROM cells GROUP BY stratum
    ), tot AS (
        SELECT SUM(w) AS tw FROM strata WHERE m0 IS NOT NULL AND m1 IS NOT NULL
    )
    SELECT stratum, w AS n_purchases,
           CAST(m0 AS BIGINT) AS ctrl_mean_cents,
           CAST(m1 AS BIGINT) AS treat_mean_cents,
           CAST(m1 - m0 AS BIGINT) AS diff_cents,
           CAST(SUM((m1 - m0) * w) OVER () // MAX(tot.tw) OVER ()
                AS BIGINT) AS stratified_diff_cents
    FROM strata, tot
    WHERE m0 IS NOT NULL AND m1 IS NOT NULL
    """,
)
def stratified_arm_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratified treatment comparison: within-segment arm
    differences in mean purchase cents, combined into one
    size-weighted stratified estimate (repeated on every row for the
    gate) — the confounder adjustment when arms are imbalanced across
    segments, where a pooled difference silently mixes segment effects
    (Simpson's trap). All cell means and the weighted combination are
    exact BIGINT integer arithmetic.

    Scale shape: one dim join (broadcast), a |strata|×2 cell agg,
    constant-size windows over the strata relation.
    """
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    j = (
        ev.filter(F.col("event_type") == "purchase")
        .join(
            F.broadcast(
                cust.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
            ),
            "user_id",
        )
        .select(
            (((F.col("user_id") * 2654435761) % 4294967296) % 2).alias("arm"),
            F.col("c_mktsegment").alias("stratum"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    cells = j.groupBy("stratum", "arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    mean = F.expr("s div n")
    strata = cells.groupBy("stratum").agg(
        F.max(F.when(F.col("arm") == 0, mean)).alias("m0"),
        F.max(F.when(F.col("arm") == 1, mean)).alias("m1"),
        F.sum("n").cast("long").alias("w"),
    ).filter(F.col("m0").isNotNull() & F.col("m1").isNotNull())
    wall = Window.partitionBy()
    return strata.select(
        "stratum",
        F.col("w").alias("n_purchases"),
        F.col("m0").cast("long").alias("ctrl_mean_cents"),
        F.col("m1").cast("long").alias("treat_mean_cents"),
        (F.col("m1") - F.col("m0")).cast("long").alias("diff_cents"),
        (
            F.sum((F.col("m1") - F.col("m0")) * F.col("w")).over(wall)
            / F.sum("w").over(wall)
        )
        .cast("long")
        .alias("stratified_diff_cents"),
    )


@query(
    "dose_response_curve",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS views,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS bought
        FROM events GROUP BY user_id
    ), bucketed AS (
        SELECT NTILE(4) OVER (ORDER BY views, user_id) AS dose_quartile,
               views, bought
        FROM per_user
    )
    SELECT dose_quartile, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(views) AS BIGINT) AS min_views,
           CAST(MAX(views) AS BIGINT) AS max_views,
           CAST(SUM(bought) AS BIGINT) AS n_converted,
           CAST(SUM(bought) * 1000000 // COUNT(*) AS BIGINT) AS conversion_ppm
    FROM bucketed GROUP BY dose_quartile
    """,
)
def dose_response_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dose-response curve: conversion probability by exposure QUARTILE
    (views per user, custkey-tie-broken ntile so the curve adapts to
    any exposure distribution instead of hardcoding thresholds the data
    may never hit) — the monotonicity check behind 'does more exposure
    actually convert more', and the saturation-point finder for
    frequency capping. Each quartile reports its actual view range.
    Exact BIGINT counts and ppm rates.

    Scale shape: one per-user collapse with map-side partials; the
    quartile ntile sorts only the user summary; the curve is a 4-row
    census.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("views"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "bought"
        ),
    )
    bucketed = per_user.select(
        F.ntile(4).over(Window.orderBy("views", "user_id")).alias("dose_quartile"),
        "views",
        "bought",
    )
    return (
        bucketed.groupBy("dose_quartile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.min("views").cast("long").alias("min_views"),
            F.max("views").cast("long").alias("max_views"),
            F.sum("bought").cast("long").alias("n_converted"),
        )
        .select(
            "dose_quartile",
            "n_users",
            "min_views",
            "max_views",
            "n_converted",
            F.expr("n_converted * 1000000L div n_users")
            .cast("long")
            .alias("conversion_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# wave 91: l-diversity / t-closeness privacy audit
# ---------------------------------------------------------------------------


@query(
    "l_diversity_t_closeness_audit",
    oracle="""
    WITH q AS (
        SELECT n.n_name AS nation,
               CAST(FLOOR(c.c_acctbal / 2000) AS BIGINT) AS bal_band,
               c.c_mktsegment AS sensitive
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    ), cells AS (
        SELECT nation, bal_band, sensitive, CAST(COUNT(*) AS BIGINT) AS n
        FROM q GROUP BY 1, 2, 3
    ), groups AS (
        SELECT nation, bal_band,
               CAST(SUM(n) AS BIGINT) AS group_n,
               CAST(COUNT(*) AS BIGINT) AS l_distinct
        FROM cells GROUP BY 1, 2
    ), gdist AS (
        SELECT sensitive, CAST(SUM(n) AS BIGINT) AS gn,
               (SELECT SUM(n) FROM cells) AS tot
        FROM cells GROUP BY sensitive
    ), tvd AS (
        SELECT g.nation, g.bal_band,
               CAST(SUM(ABS(COALESCE(c.n, 0) * 1000000 // g.group_n
                            - gl.gn * 1000000 // gl.tot)) // 2 AS BIGINT)
                   AS tvd_ppm
        FROM groups g
        CROSS JOIN gdist gl
        LEFT JOIN cells c ON c.nation = g.nation AND c.bal_band = g.bal_band
                          AND c.sensitive = gl.sensitive
        GROUP BY g.nation, g.bal_band
    )
    SELECT g.nation, g.bal_band, g.group_n, g.l_distinct, t.tvd_ppm,
           CASE WHEN g.l_distinct < 3 THEN 1 ELSE 0 END AS l_violation,
           CASE WHEN t.tvd_ppm > 500000 THEN 1 ELSE 0 END AS t_violation
    FROM groups g JOIN tvd t ON t.nation = g.nation AND t.bal_band = g.bal_band
    """,
)
def l_diversity_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The privacy audits BEYOND k-anonymity: per quasi-identifier group
    (nation × $2000 balance band), l-diversity (distinct sensitive
    market segments — a group of 50 where everyone shares one segment
    is k-anonymous yet leaks the attribute) and t-closeness via total
    variation distance between the group's sensitive distribution and
    the global one in exact ppm (skewed groups leak by inference even
    when diverse). Flags at l<3 and TVD>0.5; completes the privacy
    shelf: k-anonymity census → these inference audits → DP noisy
    counts → GDPR erasure.

    Scale shape: one (QI, sensitive) cell agg; group and global
    marginals broadcast back onto the cell lattice (groups ×
    |segments|); all shares floored-ppm BIGINTs.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    q = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select(
        F.col("n_name").alias("nation"),
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("bal_band"),
        F.col("c_mktsegment").alias("sensitive"),
    )
    cells = q.groupBy("nation", "bal_band", "sensitive").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    groups = cells.groupBy("nation", "bal_band").agg(
        F.sum("n").cast("long").alias("group_n"),
        F.count(F.lit(1)).cast("long").alias("l_distinct"),
    )
    tot = cells.agg(F.sum("n").alias("tot"))
    glob = cells.groupBy("sensitive").agg(F.sum("n").cast("long").alias("gn"))
    glob = glob.crossJoin(F.broadcast(tot))
    lattice = groups.crossJoin(F.broadcast(glob)).join(
        cells, ["nation", "bal_band", "sensitive"], "left"
    )
    tvd = lattice.groupBy("nation", "bal_band").agg(
        F.expr(
            "CAST(sum(abs(coalesce(n, 0) * 1000000L div group_n"
            " - gn * 1000000L div tot)) div 2 AS BIGINT)"
        ).alias("tvd_ppm")
    )
    return groups.join(tvd, ["nation", "bal_band"]).select(
        "nation",
        "bal_band",
        "group_n",
        "l_distinct",
        "tvd_ppm",
        F.when(F.col("l_distinct") < 3, 1).otherwise(0).alias("l_violation"),
        F.when(F.col("tvd_ppm") > 500000, 1).otherwise(0).alias("t_violation"),
    )


# ---------------------------------------------------------------------------
# wave 92: price-volume bridge, shift-share decomposition
# ---------------------------------------------------------------------------


@query(
    "price_volume_bridge",
    oracle="""
    WITH m AS (
        SELECT p.p_brand AS brand,
               CASE WHEN CAST(epoch_us(l.l_shipdate) // 86400000000 AS BIGINT)
                    < (SELECT (MIN(CAST(epoch_us(l_shipdate) // 86400000000
                               AS BIGINT))
                             + MAX(CAST(epoch_us(l_shipdate) // 86400000000
                               AS BIGINT))) // 2 FROM lineitem)
                    THEN 0 ELSE 1 END AS period,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ), wide AS (
        SELECT brand,
               MAX(CASE WHEN period = 0 THEN qty END) AS q0,
               MAX(CASE WHEN period = 1 THEN qty END) AS q1,
               MAX(CASE WHEN period = 0 THEN cents END) AS r0,
               MAX(CASE WHEN period = 1 THEN cents END) AS r1
        FROM m GROUP BY brand
        HAVING MAX(CASE WHEN period = 0 THEN qty END) IS NOT NULL
           AND MAX(CASE WHEN period = 1 THEN qty END) IS NOT NULL
    )
    SELECT brand,
           CAST(r1 - r0 AS BIGINT) AS delta_cents,
           -- volume effect at old unit price, expressed so the bridge
           -- closes exactly: q1*(r0/q0) - r0 with ONE shared floor
           CAST(q1 * r0 // q0 - r0 AS BIGINT) AS volume_effect_cents,
           -- price effect on new volume: r1 - q1*(r0/q0), exact residual
           CAST(r1 - q1 * r0 // q0 AS BIGINT) AS price_effect_cents
    FROM wide
    """,
)
def price_volume_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume bridge per brand between the two shipdate halves:
    the revenue delta decomposed into 'we sold MORE' (volume effect at
    the old unit price) and 'we sold DEARER' (price effect on the new
    volume) — the finance-review explanation of every revenue move,
    with the two effects summing EXACTLY to the delta by construction
    (the price effect is the exact integer residual, so no
    floor-division cent ever leaks; test-pinned).

    Scale shape: fact → (brand, period) collapse with map-side
    partials; the bridge is per-brand constant algebra.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    days = li.agg(
        F.expr(
            "(min(unix_micros(CAST(l_shipdate AS timestamp_ltz))"
            " div 86400000000)"
            " + max(unix_micros(CAST(l_shipdate AS timestamp_ltz))"
            " div 86400000000)) div 2"
        ).alias("mid")
    )
    m = (
        li.join(
            F.broadcast(part.select(F.col("p_partkey").alias("l_partkey"), "p_brand")),
            "l_partkey",
        )
        .crossJoin(F.broadcast(days))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.when(epoch_day("l_shipdate") < F.col("mid"), 0)
            .otherwise(1)
            .alias("period"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    wide = (
        m.groupBy("brand")
        .agg(
            F.max(F.when(F.col("period") == 0, F.col("qty"))).alias("q0"),
            F.max(F.when(F.col("period") == 1, F.col("qty"))).alias("q1"),
            F.max(F.when(F.col("period") == 0, F.col("cents"))).alias("r0"),
            F.max(F.when(F.col("period") == 1, F.col("cents"))).alias("r1"),
        )
        .filter(F.col("q0").isNotNull() & F.col("q1").isNotNull())
    )
    return wide.select(
        "brand",
        (F.col("r1") - F.col("r0")).cast("long").alias("delta_cents"),
        F.expr("q1 * r0 div q0 - r0").cast("long").alias("volume_effect_cents"),
        F.expr("r1 - q1 * r0 div q0").cast("long").alias("price_effect_cents"),
    )


@query(
    "shift_share_decomposition",
    oracle="""
    WITH m AS (
        SELECT c.c_mktsegment AS segment,
               CASE WHEN CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT)
                    < (SELECT (MIN(CAST(epoch_us(o_orderdate) // 86400000000
                               AS BIGINT))
                             + MAX(CAST(epoch_us(o_orderdate) // 86400000000
                               AS BIGINT))) // 2 FROM orders)
                    THEN 0 ELSE 1 END AS period,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ), tot AS (
        SELECT period, CAST(SUM(n) AS BIGINT) AS tn FROM m GROUP BY period
    ), wide AS (
        SELECT segment,
               MAX(CASE WHEN m.period = 0 THEN n END) AS n0,
               MAX(CASE WHEN m.period = 1 THEN n END) AS n1,
               MAX(CASE WHEN m.period = 0 THEN cents END) AS r0,
               MAX(CASE WHEN m.period = 1 THEN cents END) AS r1,
               MAX(CASE WHEN m.period = 0 THEN t.tn END) AS t0,
               MAX(CASE WHEN m.period = 1 THEN t.tn END) AS t1
        FROM m JOIN tot t ON t.period = m.period
        GROUP BY segment
    )
    SELECT segment,
           CAST(n1 * 1000000 // t1 - n0 * 1000000 // t0 AS BIGINT)
               AS share_shift_ppm,
           CAST(r1 // n1 - r0 // n0 AS BIGINT) AS rate_change_cents,
           CAST((n1 * 1000000 // t1 - n0 * 1000000 // t0) * (r0 // n0) // 1000000
                AS BIGINT) AS mix_effect_cents_per_order,
           CAST((r1 // n1 - r0 // n0) * (n1 * 1000000 // t1) // 1000000 AS BIGINT)
               AS rate_effect_cents_per_order
    FROM wide
    WHERE n0 IS NOT NULL AND n1 IS NOT NULL
    """,
)
def shift_share_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift-share (mix-vs-rate) decomposition of average order value by
    customer segment between the two halves: did the blended mean move
    because the MIX shifted toward a different segment (share shift ×
    old rate) or because segments' own RATES changed (rate change ×
    new share)? The 'why did the KPI move' explanation every metrics
    review needs, in exact floored-ppm/cents integers.

    Scale shape: one dim join + (segment, period) collapse; totals per
    period broadcast; the decomposition is constant algebra per segment.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    mid = orders.agg(
        F.expr(
            "(min(unix_micros(CAST(o_orderdate AS timestamp_ltz))"
            " div 86400000000)"
            " + max(unix_micros(CAST(o_orderdate AS timestamp_ltz))"
            " div 86400000000)) div 2"
        ).alias("mid")
    )
    m = (
        orders.join(
            F.broadcast(
                cust.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
            ),
            "o_custkey",
        )
        .crossJoin(F.broadcast(mid))
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.when(epoch_day("o_orderdate") < F.col("mid"), 0)
            .otherwise(1)
            .alias("period"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    tot = m.groupBy("period").agg(F.sum("n").cast("long").alias("tn"))
    wide = (
        m.join(F.broadcast(tot), "period")
        .groupBy("segment")
        .agg(
            F.max(F.when(F.col("period") == 0, F.col("n"))).alias("n0"),
            F.max(F.when(F.col("period") == 1, F.col("n"))).alias("n1"),
            F.max(F.when(F.col("period") == 0, F.col("cents"))).alias("r0"),
            F.max(F.when(F.col("period") == 1, F.col("cents"))).alias("r1"),
            F.max(F.when(F.col("period") == 0, F.col("tn"))).alias("t0"),
            F.max(F.when(F.col("period") == 1, F.col("tn"))).alias("t1"),
        )
        .filter(F.col("n0").isNotNull() & F.col("n1").isNotNull())
    )
    return wide.select(
        "segment",
        F.expr("n1 * 1000000L div t1 - n0 * 1000000L div t0")
        .cast("long")
        .alias("share_shift_ppm"),
        F.expr("r1 div n1 - r0 div n0").cast("long").alias("rate_change_cents"),
        F.expr(
            "(n1 * 1000000L div t1 - n0 * 1000000L div t0) * (r0 div n0)"
            " div 1000000L"
        )
        .cast("long")
        .alias("mix_effect_cents_per_order"),
        F.expr(
            "(r1 div n1 - r0 div n0) * (n1 * 1000000L div t1) div 1000000L"
        )
        .cast("long")
        .alias("rate_effect_cents_per_order"),
    )


# ---------------------------------------------------------------------------
# wave 93: growth accounting
# ---------------------------------------------------------------------------


@query(
    "growth_accounting_weekly",
    oracle="""
    WITH wk AS (
        SELECT DISTINCT user_id,
               CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week
        FROM events
    ), firsts AS (
        SELECT user_id, MIN(week) AS first_week FROM wk GROUP BY user_id
    ), lagged AS (
        SELECT w.user_id, w.week, f.first_week,
               LAG(w.week) OVER (PARTITION BY w.user_id ORDER BY w.week)
                   AS prev_active
        FROM wk w JOIN firsts f ON f.user_id = w.user_id
    ), classified AS (
        SELECT week,
               CASE WHEN week = first_week THEN 'new'
                    WHEN prev_active = week - 1 THEN 'retained'
                    ELSE 'resurrected' END AS status
        FROM lagged
    ), actives AS (
        SELECT week, status, CAST(COUNT(*) AS BIGINT) AS n
        FROM classified GROUP BY week, status
    ), churned AS (
        SELECT a.week + 1 AS week, 'churned' AS status,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM wk a LEFT JOIN wk b
          ON b.user_id = a.user_id AND b.week = a.week + 1
        WHERE b.user_id IS NULL
          AND a.week < (SELECT MAX(week) FROM wk)
        GROUP BY a.week + 1
    )
    SELECT week, status, n FROM actives
    UNION ALL
    SELECT week, status, n FROM churned
    """,
)
def growth_accounting_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting — every active user classified as NEW
    (first-ever week), RETAINED (also active the immediately previous
    week), or RESURRECTED (returning after a gap), plus the CHURNED
    count (active last week, absent this week) — the canonical
    MAU-accounting identity (ΔMAU = new + resurrected − churned,
    test-pinned) that tells you whether growth is acquisition or
    retention. Epoch-week arithmetic; exact counts; lag-over-weeks
    classification needs no self-join for the active classes.

    Scale shape: events collapse to the distinct (user, week) relation
    once; classification is one user-keyed lag window; churn is one
    week-shifted anti-join on the same narrow relation.
    """
    ev = load_table(spark, sf_dir, "events")
    wk = (
        ev.select(
            "user_id",
            F.expr("unix_micros(CAST(ts AS timestamp_ltz)) div 604800000000")
            .cast("long")
            .alias("week"),
        )
        .distinct()
    )
    firsts = wk.groupBy("user_id").agg(F.min("week").alias("first_week"))
    lagged = wk.join(firsts, "user_id").select(
        "user_id",
        "week",
        "first_week",
        F.lag("week").over(Window.partitionBy("user_id").orderBy("week")).alias(
            "prev_active"
        ),
    )
    classified = lagged.select(
        "week",
        F.when(F.col("week") == F.col("first_week"), "new")
        .when(F.col("prev_active") == F.col("week") - 1, "retained")
        .otherwise("resurrected")
        .alias("status"),
    )
    actives = classified.groupBy("week", "status").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    maxw = wk.agg(F.max("week").alias("mw"))
    # churned = active in week w, absent in w+1: anti-join on (user, week+1)
    churned = (
        wk.crossJoin(F.broadcast(maxw))
        .filter(F.col("week") < F.col("mw"))
        .select("user_id", (F.col("week") + 1).alias("week"))
        .join(wk, ["user_id", "week"], "left_anti")
        .groupBy("week")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select("week", F.lit("churned").alias("status"), "n")
    )
    return actives.unionByName(churned)


# ---------------------------------------------------------------------------
# wave 94: code-switch / foreign-token ratio
# ---------------------------------------------------------------------------


@query(
    "code_switch_ratio",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(lower(trim(text)), '\\s+') END) AS w
        FROM documents
    ), vocab_major AS (
        SELECT w, lang AS major_lang
        FROM (
            SELECT w, lang, COUNT(*) AS c,
                   ROW_NUMBER() OVER (PARTITION BY w
                                      ORDER BY COUNT(*) DESC, lang) AS rn
            FROM toks GROUP BY w, lang
        ) WHERE rn = 1
    ), scored AS (
        SELECT t.doc_id, t.lang,
               CASE WHEN v.major_lang <> t.lang THEN 1 ELSE 0 END AS is_foreign
        FROM toks t JOIN vocab_major v ON v.w = t.w
    ), per_doc AS (
        SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(is_foreign) AS BIGINT) AS n_foreign
        FROM scored GROUP BY doc_id, lang
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_foreign) * 1000000 // SUM(n_tokens) AS BIGINT)
               AS foreign_ppm,
           CAST(SUM(CASE WHEN n_foreign * 10 > n_tokens THEN 1 ELSE 0 END)
                AS BIGINT) AS n_heavy_switch_docs
    FROM per_doc GROUP BY lang
    """,
)
def code_switch_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switching audit: per language, the share of token
    occurrences whose corpus-majority language differs from the
    document's label (exact ppm), plus the count of heavy-switch
    documents (>10% foreign tokens) — the mislabeled-document and
    mixed-language detector that sits between per-doc language ID and
    corpus-level keyness: a 'French' doc full of majority-English
    tokens is either code-switched or mislabeled, and both matter for
    training mixtures. The majority-language vocabulary is tie-broken
    (count desc, lang asc) so every token's verdict is deterministic.

    Scale shape: one (token, lang) agg builds the vocab-majority
    relation (vocab-sized, broadcast at corpus scale); the verdict join
    is token-keyed; per-doc and per-lang censuses collapse map-side.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(ws_tokens(F.lower(F.col("text")))).alias("w")
    )
    vocab_major = (
        toks.groupBy("w", F.col("lang").alias("major_lang"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "w",
            "major_lang",
            F.row_number()
            .over(Window.partitionBy("w").orderBy(F.desc("c"), F.asc("major_lang")))
            .alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("w", "major_lang")
    )
    scored = toks.join(F.broadcast(vocab_major), "w").select(
        "doc_id",
        "lang",
        F.when(F.col("major_lang") != F.col("lang"), 1).otherwise(0).alias("foreign"),
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("foreign").cast("long").alias("n_foreign"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("sum(n_foreign) * 1000000L div sum(n_tokens)")
        .cast("long")
        .alias("foreign_ppm"),
        F.sum(F.when(F.col("n_foreign") * 10 > F.col("n_tokens"), 1).otherwise(0))
        .cast("long")
        .alias("n_heavy_switch_docs"),
    )


# ---------------------------------------------------------------------------
# wave 95: order aging buckets, lateral alias dialect pin
# ---------------------------------------------------------------------------


@query(
    "order_aging_buckets",
    oracle="""
    WITH horizon AS (
        SELECT MAX(CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)) AS now_d
        FROM orders
    ), open_orders AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               now_d - CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                   AS age_days
        FROM orders, horizon WHERE o_orderstatus = 'O'
    ), bucketed AS (
        SELECT CASE WHEN age_days <= 180 THEN '0-180'
                    WHEN age_days <= 365 THEN '181-365'
                    WHEN age_days <= 730 THEN '366-730'
                    ELSE '730+' END AS age_bucket,
               cents
        FROM open_orders
    ), agg AS (
        SELECT age_bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM bucketed GROUP BY age_bucket
    ), tot AS (
        SELECT SUM(cents) AS t FROM agg
    )
    SELECT age_bucket, n_orders, cents,
           CAST(cents * 1000000 // t AS BIGINT) AS share_ppm
    FROM agg, tot
    """,
)
def order_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging report: outstanding ('O') orders bucketed by age
    relative to the data horizon, with exact cents and value-share ppm
    per bucket — the receivables-aging / stuck-work census every
    operations and finance review starts from (old open value is where
    the write-offs and the process failures live). Age is pure
    epoch-day arithmetic; buckets are fixed thresholds; all BIGINT.

    Scale shape: one pushed status filter, map-side age math, a 4-row
    census plus a 1-row total broadcast.
    """
    orders = load_table(spark, sf_dir, "orders")
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    horizon = orders.agg(F.max(epoch_day("o_orderdate")).alias("now_d"))
    open_orders = (
        orders.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            (F.col("now_d") - epoch_day("o_orderdate")).alias("age_days"),
        )
    )
    bucket = (
        F.when(F.col("age_days") <= 180, "0-180")
        .when(F.col("age_days") <= 365, "181-365")
        .when(F.col("age_days") <= 730, "366-730")
        .otherwise("730+")
    )
    agg = open_orders.select(bucket.alias("age_bucket"), "cents").groupBy(
        "age_bucket"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("cents"),
    )
    tot = agg.agg(F.sum("cents").alias("t"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "age_bucket",
        "n_orders",
        "cents",
        F.expr("cents * 1000000L div t").cast("long").alias("share_ppm"),
    )


@query(
    "lateral_alias_chain",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents,
           cents // 100 AS dollars,
           dollars // 1000 AS kilodollars
    FROM orders GROUP BY o_orderstatus
    """,
)
def lateral_alias_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column-alias chaining (Spark 3.4 / SPARK-27561): each
    select-list expression references the ALIAS defined just before it
    (cents → dollars → kilodollars) instead of repeating the whole
    subexpression — the analyst-ergonomics dialect feature pinned
    value-equal across engines (DuckDB resolves the same chain). The
    plan is identical to the fully-expanded form: one partial+final
    hash agg, aliases folded at analysis time.
    """
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("lac_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents,
               cents div 100 AS dollars,
               dollars div 1000 AS kilodollars
        FROM lac_orders GROUP BY o_orderstatus
        """
    )


# ---------------------------------------------------------------------------
# wave 96: ABC / Pareto classification
# ---------------------------------------------------------------------------


@query(
    "abc_part_classification",
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM lineitem GROUP BY l_partkey
    ), ranked AS (
        SELECT l_partkey, cents,
               SUM(cents) OVER (ORDER BY cents DESC, l_partkey) AS cum,
               (SELECT SUM(cents) FROM rev) AS tot
        FROM rev
    ), classified AS (
        SELECT CASE WHEN cum * 100 <= tot * 80 THEN 'A'
                    WHEN cum * 100 <= tot * 95 THEN 'B'
                    ELSE 'C' END AS abc_class,
               cents
        FROM ranked
    )
    SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(SUM(cents) * 1000000 // MAX(tot) AS BIGINT) AS revenue_share_ppm
    FROM classified, (SELECT SUM(cents) AS tot FROM rev) t
    GROUP BY abc_class
    """,
)
def abc_part_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by revenue: the top parts
    covering 80% of cumulative revenue are class A, the next 15% B, the
    long tail C — the inventory-management triage (count A parts daily,
    B weekly, C quarterly) and the discrete operational cousin of the
    Lorenz curve. The cumulative boundary test is pure integer
    cross-multiplication (cum·100 ≤ tot·80 — no float shares), ranks
    tie-break on partkey, and the census reports each class's exact
    cents and revenue share in ppm.

    Scale shape: fact → per-part collapse; ONE cumulative window over
    the part summary (range-partitioned sort at scale); 3-row census.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    tot = rev.agg(F.sum("cents").alias("tot"))
    w = Window.orderBy(F.desc("cents"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = rev.crossJoin(F.broadcast(tot)).select(
        "cents", F.sum("cents").over(w).alias("cum"), "tot"
    )
    cls = (
        F.when(F.col("cum") * 100 <= F.col("tot") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("tot") * 95, "B")
        .otherwise("C")
    )
    return (
        ranked.select(cls.alias("abc_class"), "cents", "tot")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("cents").cast("long").alias("cents"),
            F.expr("sum(cents) * 1000000L div max(tot)")
            .cast("long")
            .alias("revenue_share_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# wave 97: TRY-arithmetic semantics, single-source supply risk
# ---------------------------------------------------------------------------


@query(
    "try_arithmetic_suite",
    oracle="""
    SELECT 'add_overflow' AS op, TRUE AS is_null
    UNION ALL SELECT 'mul_overflow', TRUE
    UNION ALL SELECT 'div_zero', TRUE
    UNION ALL SELECT 'neg_overflow', TRUE
    UNION ALL SELECT 'add_ok', FALSE
    UNION ALL SELECT 'sum_in_range', FALSE
    """,
)
def try_arithmetic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY-arithmetic contract pinned: under ANSI mode the raw
    operators RAISE on BIGINT overflow and division by zero (the
    corruption-proof default this engine runs with), and the try_*
    family converts exactly those failures to NULL so pipelines can
    dead-letter bad rows instead of dying. The relation asserts each
    case's nullness engine-side (computed, not literal) against the
    oracle's expected truth table — DuckDB has no try_* family, so the
    CONTRACT is the shared object, which is the point: this pin
    documents engine behaviour the dialect can't express.

    Scale shape: six constant rows; the value is the semantics.
    """
    rows = [
        ("add_overflow", F.expr("try_add(9223372036854775807L, 1L)")),
        ("mul_overflow", F.expr("try_multiply(9223372036854775807L, 2L)")),
        ("div_zero", F.expr("try_divide(1L, 0L)")),
        ("neg_overflow", F.expr("try_subtract(-9223372036854775808L, 1L)")),
        ("add_ok", F.expr("try_add(1L, 2L)")),
        ("sum_in_range", F.expr("try_multiply(3L, 4L)")),
    ]
    dfs = None
    for name, expr in rows:
        d = (
            load_table(spark, sf_dir, "region")
            .limit(1)
            .select(F.lit(name).alias("op"), expr.isNull().alias("is_null"))
        )
        dfs = d if dfs is None else dfs.unionByName(d)
    return dfs


@query(
    "single_source_risk",
    oracle="""
    WITH srcs AS (
        SELECT l_partkey,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM lineitem GROUP BY l_partkey
    ), tot AS (
        SELECT SUM(cents) AS t FROM srcs
    )
    SELECT CASE WHEN n_suppliers = 1 THEN 'single_source'
                WHEN n_suppliers = 2 THEN 'dual_source'
                ELSE 'multi_source' END AS sourcing,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(SUM(cents) * 1000000 // MAX(t) AS BIGINT) AS revenue_at_risk_ppm
    FROM srcs, tot
    GROUP BY 1
    """,
)
def single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain concentration risk: parts grouped by how many
    distinct suppliers ship them (single / dual / multi sourced) with
    the revenue share each tier puts at risk in exact ppm — the
    resilience census behind 'one supplier failure costs us X% of
    revenue', complementing the demand-side HHI. All BIGINT.

    Scale shape: one per-part agg (distinct-supplier count rides the
    same shuffle as the cents sum); 3-row census with a broadcast total.
    """
    li = load_table(spark, sf_dir, "lineitem")
    srcs = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    tot = srcs.agg(F.sum("cents").alias("t"))
    tier = (
        F.when(F.col("n_suppliers") == 1, "single_source")
        .when(F.col("n_suppliers") == 2, "dual_source")
        .otherwise("multi_source")
    )
    return (
        srcs.crossJoin(F.broadcast(tot))
        .select(tier.alias("sourcing"), "cents", "t")
        .groupBy("sourcing")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("cents").cast("long").alias("cents"),
            F.expr("sum(cents) * 1000000L div max(t)")
            .cast("long")
            .alias("revenue_at_risk_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# wave 98: in-row quality gate, Heaps-law vocabulary growth
# ---------------------------------------------------------------------------


@query(
    "in_row_quality_gate",
    oracle="""
    WITH t AS (
        SELECT doc_id, source,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(lower(trim(text)), '\\s+') END AS toks
        FROM documents
    ), feats AS (
        SELECT doc_id, source,
               len(toks) AS n_tok,
               CASE WHEN len(toks) = 0 THEN 0
                    ELSE (SELECT MAX(c) FROM (
                        SELECT COUNT(*) AS c FROM unnest(toks) AS u(w) GROUP BY w
                    )) END AS top_tok,
               CASE WHEN len(toks) = 0 THEN 0
                    ELSE (SELECT COUNT(DISTINCT w)
                          FROM unnest(toks) AS u(w)) END AS n_distinct
        FROM t
    ), gated AS (
        SELECT source,
               CASE WHEN n_tok >= 30
                     AND top_tok * 5 <= n_tok
                     AND n_distinct * 2 >= n_tok
                    THEN 1 ELSE 0 END AS keep
        FROM feats
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(keep) AS BIGINT) AS n_kept,
           CAST(SUM(keep) * 1000000 // COUNT(*) AS BIGINT) AS keep_ppm
    FROM gated GROUP BY source
    """,
)
def in_row_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ZERO-SHUFFLE quality gate: per-document keep/drop decided
    entirely in-row (length floor ≥30 tokens, top-token share ≤20% via
    an in-row HOF count, type-token ratio ≥50%) — the map-side fast
    pass a curation pipeline runs BEFORE any corpus-level statistic
    (`quality_filter_gopher` needs corpus-side aggregates; this tier
    needs only the row), so it filters at scan speed and shrinks
    everything downstream. Integer cross-multiplied thresholds; the
    per-source yield census is the only aggregation.

    Scale shape: every feature comes from array HOFs on the row's own
    tokens (aggregate over distinct counts — no explode leaves the
    row); one |sources|-row census agg. At 100 TB this is the operator
    that touches all bytes once and drops half of them.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", ws_tokens(F.lower(F.col("text"))).alias("toks")
    )
    feats = toks.select(
        "source",
        F.size("toks").alias("n_tok"),
        F.expr(
            "CASE WHEN size(toks) = 0 THEN 0 ELSE"
            " array_max(transform(array_distinct(toks),"
            "   w -> size(filter(toks, x -> x = w)))) END"
        ).alias("top_tok"),
        F.expr("size(array_distinct(toks))").alias("n_distinct"),
    )
    gated = feats.select(
        "source",
        F.when(
            (F.col("n_tok") >= 30)
            & (F.col("top_tok") * 5 <= F.col("n_tok"))
            & (F.col("n_distinct") * 2 >= F.col("n_tok")),
            1,
        )
        .otherwise(0)
        .alias("keep"),
    )
    return gated.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("keep").cast("long").alias("n_kept"),
        F.expr("sum(keep) * 1000000L div count(1)").cast("long").alias("keep_ppm"),
    )


@query(
    "heaps_law_vocab_growth",
    oracle="""
    WITH tagged AS (
        SELECT ((doc_id * 2654435761) % 4294967296) % 100 AS bucket,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(lower(trim(text)), '\\s+') END AS t
        FROM documents
    ), tiers AS (
        SELECT * FROM (VALUES (1), (10), (100)) x(tier)
    ), toks AS (
        SELECT tier, unnest(t) AS w
        FROM tagged, tiers WHERE bucket < tier
    ), stats AS (
        SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT w) AS BIGINT) AS vocab
        FROM toks GROUP BY tier
    ), lagged AS (
        SELECT tier, n_tokens, vocab,
               LAG(n_tokens) OVER (ORDER BY tier) AS pn,
               LAG(vocab) OVER (ORDER BY tier) AS pv
        FROM stats
    )
    SELECT tier, n_tokens, vocab,
           ROUND(CASE WHEN pn IS NULL THEN NULL
                 ELSE ln(CAST(vocab AS DOUBLE) / pv)
                      / ln(CAST(n_tokens AS DOUBLE) / pn) END, 4) AS heaps_beta
    FROM lagged
    """,
)
def heaps_law_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth over the NESTED 1%/10%/100% hash
    tiers (the same strict-subset construction as
    `nested_scaling_samples`): distinct-vocabulary size at each corpus
    scale and the between-tier Heaps exponent β = Δln V / Δln N —
    natural corpora sit at β ≈ 0.4-0.6; a β collapsing toward 0 means
    the corpus is recycling its vocabulary (templates) and more data
    won't buy more diversity. The empirical-growth companion to the
    static Zipf fit.

    Exactness: tier membership is pure hash arithmetic (small tiers are
    strict subsets); token and vocab counts are exact; β is one ln
    ratio of exact integers per tier, rounded.

    Scale shape: the tier fan-out multiplies tokens ×3 map-side but
    tiers prune by the hash predicate; the (tier, word) distinct agg is
    vocab-bounded per tier.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.select(
        (((F.col("doc_id") * 2654435761) % 4294967296) % 100).alias("bucket"),
        ws_tokens(F.lower(F.col("text"))).alias("t"),
    )
    tiers = spark.createDataFrame([(1,), (10,), (100,)], "tier int")
    toks = (
        tagged.crossJoin(F.broadcast(tiers))
        .filter(F.col("bucket") < F.col("tier"))
        .select("tier", F.explode("t").alias("w"))
    )
    stats = toks.groupBy("tier").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("w").cast("long").alias("vocab"),
    )
    lw = Window.orderBy("tier")
    lagged = stats.select(
        "tier",
        "n_tokens",
        "vocab",
        F.lag("n_tokens").over(lw).alias("pn"),
        F.lag("vocab").over(lw).alias("pv"),
    )
    return lagged.select(
        "tier",
        "n_tokens",
        "vocab",
        F.round(
            F.when(
                F.col("pn").isNotNull(),
                F.log(F.col("vocab").cast("double") / F.col("pv"))
                / F.log(F.col("n_tokens").cast("double") / F.col("pn")),
            ),
            4,
        ).alias("heaps_beta"),
    )


# ---------------------------------------------------------------------------
# wave 99: HITS hub/authority ranking, largest-remainder apportionment
# ---------------------------------------------------------------------------


@query(
    "hits_hub_authority",
    oracle="""
    WITH fwd AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), a1r AS (
        SELECT s, CAST(COUNT(*) AS DOUBLE) AS v FROM fwd GROUP BY s
    ), a1 AS (
        SELECT s, v / (SELECT MAX(v) FROM a1r) AS v FROM a1r
    ), h1r AS (
        SELECT c, SUM(a1.v) AS v FROM fwd JOIN a1 USING (s) GROUP BY c
    ), h1 AS (
        SELECT c, v / (SELECT MAX(v) FROM h1r) AS v FROM h1r
    ), a2r AS (
        SELECT s, SUM(h1.v) AS v FROM fwd JOIN h1 USING (c) GROUP BY s
    ), a2 AS (
        SELECT s, v / (SELECT MAX(v) FROM a2r) AS v FROM a2r
    ), h2r AS (
        SELECT c, SUM(a2.v) AS v FROM fwd JOIN a2 USING (s) GROUP BY c
    ), h2 AS (
        SELECT c, v / (SELECT MAX(v) FROM h2r) AS v FROM h2r
    ), a3r AS (
        SELECT s, SUM(h2.v) AS v FROM fwd JOIN h2 USING (c) GROUP BY s
    ), a3 AS (
        SELECT s, v / (SELECT MAX(v) FROM a3r) AS v FROM a3r
    ), h3r AS (
        SELECT c, SUM(a3.v) AS v FROM fwd JOIN a3 USING (s) GROUP BY c
    ), h3 AS (
        SELECT c, v / (SELECT MAX(v) FROM h3r) AS v FROM h3r
    )
    SELECT 'hub' AS kind, CAST(c AS BIGINT) AS node_key,
           ROUND(v, 6) AS score FROM h3
    UNION ALL
    SELECT 'authority' AS kind, CAST(s AS BIGINT) AS node_key,
           ROUND(v, 6) AS score FROM a3
    """,
)
def hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg hubs-and-authorities, 3 synchronous iterations,
    max-normalized per half-step) over the customer→supplier bipartite
    trade graph: customers are hubs (they point at many good
    suppliers), suppliers are authorities (pointed at by many good
    hubs) — the mutually-recursive ranking that PageRank's single
    score conflates, oracle-checked against the same three iterations
    unrolled as chained CTEs.

    Max-normalization (not L2) keeps every half-step a join + hash agg
    + one broadcast scalar — no sqrt-of-sum-of-squares reduction — and
    bounds scores in (0, 1] so 3 iterations cannot overflow. Engines
    sum incoming mass in different orders; scores round to 6 (drift
    ≪ 1e-12 after 3 rounds).

    Scale shape: the deduped INTEGER edge list is tracked-persisted
    once and feeds all 6 half-steps; each half-step shuffles only the
    narrow (key, score) relation; the max is a 1-row broadcast. Per
    round ends in localCheckpoint so round k+1 replans from
    materialized scores, exactly like pagerank_trade_graph (swap for
    reliable checkpoint(dir) on a cluster).
    """
    from pyspark_movie_recommender_spark.operators.cache import track

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    fwd = track(
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )

    def _norm(df: DataFrame, key: str) -> DataFrame:
        mx = df.agg(F.max("v").alias("mx"))
        return (
            df.crossJoin(F.broadcast(mx))
            .select(key, (F.col("v") / F.col("mx")).alias("v"))
            .localCheckpoint()
        )

    # a1 from h0 == 1.0 for every customer: plain in-degree of s
    auth = _norm(
        fwd.groupBy("s").agg(F.count(F.lit(1)).cast("double").alias("v")), "s"
    )
    hub = _norm(
        fwd.join(auth, "s").groupBy("c").agg(F.sum("v").alias("v")), "c"
    )
    for _ in range(2):
        auth = _norm(
            fwd.join(hub, "c").groupBy("s").agg(F.sum("v").alias("v")), "s"
        )
        hub = _norm(
            fwd.join(auth, "s").groupBy("c").agg(F.sum("v").alias("v")), "c"
        )
    return hub.select(
        F.lit("hub").alias("kind"),
        F.col("c").cast("long").alias("node_key"),
        F.round("v", 6).alias("score"),
    ).unionByName(
        auth.select(
            F.lit("authority").alias("kind"),
            F.col("s").cast("long").alias("node_key"),
            F.round("v", 6).alias("score"),
        )
    )


@query(
    "seat_apportionment_revenue",
    oracle="""
    WITH rev AS (
        SELECT n.n_name, n.n_nationkey,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name, n.n_nationkey
    ), tot AS (
        SELECT CAST(SUM(cents) AS BIGINT) AS t FROM rev
    ), quota AS (
        SELECT n_name, n_nationkey, cents,
               (cents * 100) // t AS floor_seats,
               (cents * 100) % t  AS rem
        FROM rev, tot
    ), short AS (
        SELECT 100 - CAST(SUM(floor_seats) AS BIGINT) AS k FROM quota
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, n_nationkey) AS rnk
        FROM quota
    )
    SELECT n_name, cents,
           CAST(floor_seats + CASE WHEN rnk <= k THEN 1 ELSE 0 END AS BIGINT)
               AS seats
    FROM ranked, short
    """,
)
def seat_apportionment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: divide EXACTLY 100
    budget seats across nations in proportion to order revenue — floor
    of each nation's scaled quota, then the leftover seats go to the
    largest fractional remainders (ties broken by nationkey). The
    integer-exact allocation primitive behind budget splits, shard
    assignment, and proportional sampling quotas, where naive
    round(share*100) over- or under-shoots the total.

    Exactness: revenue is summed in integer cents (round-then-cast —
    Spark's double→long cast truncates while DuckDB's rounds, so both
    sides round first); quota arithmetic is pure integer floor-div and
    mod against the same denominator, so ranking by remainder needs no
    division at all. Hash-exact, no float anywhere. BIGINT headroom:
    cents·100 caps at ~1.5e15 at sf0.1 — switch the two products to
    DECIMAL(38,0) past sf100.

    Scale shape: one fact-side hash agg to |nations| rows; everything
    after (total, ranks, bonus seats) is arithmetic on a 25-row
    relation — single-partition window is free at that size.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "n_nationkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    tot = rev.agg(F.sum("cents").cast("long").alias("t"))
    quota = rev.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "n_nationkey",
        "cents",
        F.expr("(cents * 100) div t").alias("floor_seats"),
        F.expr("(cents * 100) % t").alias("rem"),
    )
    short = quota.agg((F.lit(100) - F.sum("floor_seats")).cast("long").alias("k"))
    ranked = quota.withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(F.col("rem").desc(), F.col("n_nationkey"))
        ),
    )
    return ranked.crossJoin(F.broadcast(short)).select(
        "n_name",
        "cents",
        (
            F.col("floor_seats")
            + F.when(F.col("rnk") <= F.col("k"), 1).otherwise(0)
        )
        .cast("long")
        .alias("seats"),
    )


# ---------------------------------------------------------------------------
# wave 100: BH-FDR multiple testing, SPC p-chart control limits
# ---------------------------------------------------------------------------


@query(
    "bh_fdr_nation_urgent",
    oracle="""
    WITH per AS (
        SELECT c.c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
                             THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_nationkey
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(k) AS BIGINT) AS kk,
               CAST(COUNT(*) AS BIGINT) AS m
        FROM per
    ), z AS (
        SELECT n_name, n, k, m,
               (CAST(k AS DOUBLE)/n - CAST(kk - k AS DOUBLE)/(nn - n))
               / sqrt((CAST(kk AS DOUBLE)/nn) * (1 - CAST(kk AS DOUBLE)/nn)
                      * (1.0/n + 1.0/(nn - n))) AS zval
        FROM per JOIN nation ON n_nationkey = c_nationkey, tot
    ), pv AS (
        SELECT n_name, n, k, m,
               ROUND((1/(1 + 0.3275911*(abs(zval)/sqrt(2))))
                 * (0.254829592 + (1/(1 + 0.3275911*(abs(zval)/sqrt(2))))
                 * (-0.284496736 + (1/(1 + 0.3275911*(abs(zval)/sqrt(2))))
                 * (1.421413741 + (1/(1 + 0.3275911*(abs(zval)/sqrt(2))))
                 * (-1.453152027 + (1/(1 + 0.3275911*(abs(zval)/sqrt(2))))
                 * 1.061405417))))
                 * exp(-(abs(zval)/sqrt(2))*(abs(zval)/sqrt(2))), 6) AS p_value
        FROM z
    ), ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p_value, n_name)
                       AS BIGINT) AS rnk
        FROM pv
    ), kstar AS (
        SELECT COALESCE(MAX(CASE WHEN p_value * m <= rnk * 0.05
                                 THEN rnk END), 0) AS ks
        FROM ranked
    )
    SELECT n_name, n, k, p_value, rnk,
           CAST(CASE WHEN rnk <= ks THEN 1 ELSE 0 END AS BIGINT) AS rejected
    FROM ranked, kstar
    """,
)
def bh_fdr_nation_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over a FAMILY of hypothesis tests:
    for every nation, a two-proportion z-test of "do this nation's
    customers place URGENT orders at a different rate than everyone
    else?", converted to a two-sided p-value with the Abramowitz-Stegun
    7.1.26 erfc polynomial (identical Horner dag on both engines — no
    erf built-in exists in either), then the BH step-up: reject the k*
    smallest p-values where k* = max{i : p_(i) ≤ i·α/m}, α = 0.05.
    The multiple-testing guard every per-segment dashboard needs —
    with 25 segments, one nominal p<0.05 "winner" is expected by
    chance alone.

    Determinism: counts are exact; p-values are rounded to 6 BEFORE
    ranking so both engines rank identical keys (ties broken by
    n_name); the step-up comparison is on p·m ≤ i·α (no division).

    Scale shape: one fact-side hash agg to |nations| rows; the z/p/BH
    cascade is arithmetic + one single-partition window on a 25-row
    relation. The census total is a broadcast scalar.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            )
            .cast("long")
            .alias("k"),
        )
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("k").cast("long").alias("kk"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    z = (
        per.join(F.broadcast(n), per.c_nationkey == n.n_nationkey)
        .crossJoin(F.broadcast(tot))
        .select(
            "n_name",
            "n",
            "k",
            "m",
            (
                (
                    F.col("k").cast("double") / F.col("n")
                    - (F.col("kk") - F.col("k")).cast("double")
                    / (F.col("nn") - F.col("n"))
                )
                / F.sqrt(
                    (F.col("kk").cast("double") / F.col("nn"))
                    * (1 - F.col("kk").cast("double") / F.col("nn"))
                    * (1.0 / F.col("n") + 1.0 / (F.col("nn") - F.col("n")))
                )
            ).alias("zval"),
        )
    )
    # A&S 7.1.26: erfc(x) = t·(a1 + t·(a2 + t·(a3 + t·(a4 + t·a5))))·e^(−x²),
    # t = 1/(1+0.3275911x); two-sided p = erfc(|z|/√2). Same Horner dag as
    # the oracle string above.
    pv = z.select(
        "n_name",
        "n",
        "k",
        "m",
        F.round(
            F.expr(
                "(1/(1 + 0.3275911*(abs(zval)/sqrt(2))))"
                " * (0.254829592 + (1/(1 + 0.3275911*(abs(zval)/sqrt(2))))"
                " * (-0.284496736 + (1/(1 + 0.3275911*(abs(zval)/sqrt(2))))"
                " * (1.421413741 + (1/(1 + 0.3275911*(abs(zval)/sqrt(2))))"
                " * (-1.453152027 + (1/(1 + 0.3275911*(abs(zval)/sqrt(2))))"
                " * 1.061405417))))"
                " * exp(-(abs(zval)/sqrt(2))*(abs(zval)/sqrt(2)))"
            ),
            6,
        ).alias("p_value"),
    )
    ranked = pv.withColumn(
        "rnk",
        F.row_number()
        .over(Window.orderBy("p_value", "n_name"))
        .cast("long"),
    )
    kstar = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p_value") * F.col("m") <= F.col("rnk") * 0.05,
                    F.col("rnk"),
                )
            ),
            F.lit(0).cast("long"),
        ).alias("ks")
    )
    return ranked.crossJoin(F.broadcast(kstar)).select(
        "n_name",
        "n",
        "k",
        "p_value",
        "rnk",
        F.when(F.col("rnk") <= F.col("ks"), 1)
        .otherwise(0)
        .cast("long")
        .alias("rejected"),
    )


@query(
    "p_chart_weekly_late_orders",
    oracle="""
    WITH flagged AS (
        SELECT CAST(date_trunc('week', o.o_orderdate) AS DATE) AS week,
               CASE WHEN EXISTS (
                   SELECT 1 FROM lineitem l
                   WHERE l.l_orderkey = o.o_orderkey
                     AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
               ) THEN 1 ELSE 0 END AS late
        FROM orders o
    ), weekly AS (
        SELECT week, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(late) AS BIGINT) AS n_late
        FROM flagged GROUP BY week
    ), pooled AS (
        SELECT CAST(SUM(n_late) AS DOUBLE) / SUM(n_orders) AS pbar FROM weekly
    )
    SELECT week, n_orders, n_late,
           ROUND(CAST(n_late AS DOUBLE) / n_orders, 6) AS p_hat,
           ROUND(pbar + 3*sqrt(pbar*(1-pbar)/n_orders), 6) AS ucl,
           ROUND(greatest(0.0, pbar - 3*sqrt(pbar*(1-pbar)/n_orders)), 6)
               AS lcl,
           CAST(CASE WHEN CAST(n_late AS DOUBLE)/n_orders
                          > pbar + 3*sqrt(pbar*(1-pbar)/n_orders)
                      OR CAST(n_late AS DOUBLE)/n_orders
                          < greatest(0.0, pbar - 3*sqrt(pbar*(1-pbar)/n_orders))
                     THEN 1 ELSE 0 END AS BIGINT) AS out_of_control
    FROM weekly, pooled
    """,
)
def p_chart_weekly_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart p-chart (statistical process control) on the weekly
    late-shipment proportion: each ISO week's share of orders with a
    >60-day-late lineitem, against 3σ binomial control limits around
    the pooled rate p̄ ± 3·√(p̄(1−p̄)/n_w) — the classic "is this week's
    defect rate common-cause noise or a real signal" chart, with
    per-week limits widening for thin weeks. Complements CUSUM (drift
    onset) and the EWMA smoother with the canonical control-limit
    flag.

    Determinism: the late flag and weekly counts are exact integers
    (same EXISTS → semi-join as late_shipment_priority_counts); p̄ is
    one ratio of exact sums; limits and flags round to 6.

    Scale shape: semi join on orderkey (no fan-out — an order with 5
    late lines counts once), one hash agg to |weeks| rows, pooled rate
    as a broadcast scalar. Nothing wide after the semi join.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late_orders = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    ).select("o_orderkey")
    flagged = o.select(
        F.to_date(F.date_trunc("week", F.col("o_orderdate"))).alias("week"),
        "o_orderkey",
    ).join(late_orders.withColumn("late", F.lit(1)), "o_orderkey", "left")
    weekly = flagged.groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.coalesce(F.col("late"), F.lit(0))).cast("long").alias("n_late"),
    )
    pooled = weekly.agg(
        (F.sum("n_late").cast("double") / F.sum("n_orders")).alias("pbar")
    )
    p_hat = F.col("n_late").cast("double") / F.col("n_orders")
    sigma = F.sqrt(
        F.col("pbar") * (1 - F.col("pbar")) / F.col("n_orders")
    )
    ucl = F.col("pbar") + 3 * sigma
    lcl = F.greatest(F.lit(0.0), F.col("pbar") - 3 * sigma)
    return weekly.crossJoin(F.broadcast(pooled)).select(
        "week",
        "n_orders",
        "n_late",
        F.round(p_hat, 6).alias("p_hat"),
        F.round(ucl, 6).alias("ucl"),
        F.round(lcl, 6).alias("lcl"),
        F.when((p_hat > ucl) | (p_hat < lcl), 1)
        .otherwise(0)
        .cast("long")
        .alias("out_of_control"),
    )


# ---------------------------------------------------------------------------
# wave 101: Jensen-Shannon source divergence, Simpson's-paradox slope audit
# ---------------------------------------------------------------------------


@query(
    "jsd_source_unigrams",
    oracle="""
    WITH tok AS (
        SELECT source AS s,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        FROM documents WHERE trim(text) <> ''
    ), cnt AS (
        SELECT s, w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY s, w
    ), nt AS (
        SELECT s, CAST(SUM(c) AS BIGINT) AS t FROM cnt GROUP BY s
    ), probs AS (
        SELECT cnt.s, w, CAST(c AS DOUBLE) / t AS p
        FROM cnt JOIN nt USING (s)
    ), hs AS (
        SELECT s, SUM(-p * ln(p)) AS h FROM probs GROUP BY s
    ), pairs AS (
        SELECT a.s AS src_a, b.s AS src_b
        FROM (SELECT DISTINCT s FROM nt) a
        JOIN (SELECT DISTINCT s FROM nt) b ON a.s < b.s
    ), mix AS (
        SELECT src_a, src_b, w, SUM(p) / 2 AS m
        FROM pairs JOIN probs pr ON pr.s = src_a OR pr.s = src_b
        GROUP BY src_a, src_b, w
    ), hm AS (
        SELECT src_a, src_b, SUM(-m * ln(m)) AS h_mix
        FROM mix GROUP BY src_a, src_b
    )
    SELECT src_a, src_b,
           ROUND((h_mix - (ha.h + hb.h) / 2) / ln(2), 6) AS jsd_bits
    FROM hm JOIN hs ha ON ha.s = src_a
            JOIN hs hb ON hb.s = src_b
    """,
)
def jsd_source_unigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (in bits) between the unigram
    distributions of every pair of corpus sources, via the
    entropy identity JSD(P,Q) = H((P+Q)/2) − (H(P)+H(Q))/2 — the
    symmetric, bounded [0,1-bit] "how different are these sources
    REALLY" measure that weighted-Jaccard (set overlap) and G² keyness
    (per-term) don't give. The mixture M needs no full-outer join:
    grouping the two sources' (w, p) rows by word and summing handles
    missing mass as 0 naturally.

    Scale shape: token counts are one explode + hash agg to
    vocab×|sources| rows; everything after runs on probability rows,
    never tokens. The pair fan-out multiplies prob rows by the pairs
    each source is in (|sources|−1) via a broadcast OR-join — fine for
    the handful of sources a curation run compares; per-source
    entropies are vocab-bounded aggs. Round 6 absorbs summation-order
    drift.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    tok = docs.select(
        F.col("source").alias("s"),
        F.explode(ws_tokens(F.lower(F.col("text")))).alias("w"),
    )
    cnt = tok.groupBy("s", "w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    nt = cnt.groupBy("s").agg(F.sum("c").cast("long").alias("t"))
    probs = cnt.join(F.broadcast(nt), "s").select(
        "s", "w", (F.col("c").cast("double") / F.col("t")).alias("p")
    )
    hs = probs.groupBy("s").agg(F.sum(-F.col("p") * F.log("p")).alias("h"))
    srcs = nt.select("s")
    pairs = (
        srcs.select(F.col("s").alias("src_a"))
        .join(srcs.select(F.col("s").alias("src_b")))
        .filter(F.col("src_a") < F.col("src_b"))
    )
    mix = (
        probs.join(
            F.broadcast(pairs),
            (F.col("s") == F.col("src_a")) | (F.col("s") == F.col("src_b")),
        )
        .groupBy("src_a", "src_b", "w")
        .agg((F.sum("p") / 2).alias("m"))
    )
    hm = mix.groupBy("src_a", "src_b").agg(
        F.sum(-F.col("m") * F.log("m")).alias("h_mix")
    )
    ha = hs.select(F.col("s").alias("src_a"), F.col("h").alias("ha"))
    hb = hs.select(F.col("s").alias("src_b"), F.col("h").alias("hb"))
    return (
        hm.join(F.broadcast(ha), "src_a")
        .join(F.broadcast(hb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.round(
                (F.col("h_mix") - (F.col("ha") + F.col("hb")) / 2)
                / float(__import__("math").log(2)),
                6,
            ).alias("jsd_bits"),
        )
    )


@query(
    "simpson_slope_audit",
    oracle="""
    WITH pts AS (
        SELECT l_returnflag AS grp, l_quantity AS x,
               l_extendedprice * (1 - l_discount) AS y
        FROM lineitem
    ), per AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND((COUNT(*) * SUM(x*y) - SUM(x) * SUM(y))
                     / (COUNT(*) * SUM(x*x) - SUM(x) * SUM(x)), 6) AS grp_slope
        FROM pts GROUP BY grp
    ), pooled AS (
        SELECT ROUND((COUNT(*) * SUM(x*y) - SUM(x) * SUM(y))
                     / (COUNT(*) * SUM(x*x) - SUM(x) * SUM(x)), 6)
                   AS pooled_slope
        FROM pts
    )
    SELECT grp, n, grp_slope, pooled_slope,
           CAST(CASE WHEN (grp_slope > 0) <> (pooled_slope > 0)
                     THEN 1 ELSE 0 END AS BIGINT) AS sign_flip
    FROM per, pooled
    """,
)
def simpson_slope_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit: the OLS slope of net revenue on
    quantity fitted POOLED over all lineitems and separately WITHIN
    each return-flag stratum, flagging strata whose slope sign
    contradicts the pooled fit — the aggregation-reversal check that
    should gate any "X drives Y" dashboard claim before it ships
    (a confounder that flips the sign within strata is invisible to
    the pooled regression). Companion to regr_function_suite (the
    primitives) and diff_in_diff (the designed comparison).

    Determinism: both slopes come from the same five moment sums
    (n, Σx, Σy, Σxy, Σx²) — single-pass, map-side-combined — rounded
    to 6 before the sign comparison so the flag itself is
    reproducible cross-engine.

    Scale shape: two hash aggs over narrow projected rows (one global,
    one per-stratum, both with map-side partials); the pooled scalar
    broadcasts onto |strata| rows. No shuffle of raw rows at all.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").alias("x"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("y"),
    )

    def slope_agg():
        n = F.count(F.lit(1))
        return F.round(
            (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / (n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")),
            6,
        )

    per = pts.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        slope_agg().alias("grp_slope"),
    )
    pooled = pts.agg(slope_agg().alias("pooled_slope"))
    return per.crossJoin(F.broadcast(pooled)).select(
        "grp",
        "n",
        "grp_slope",
        "pooled_slope",
        F.when(
            (F.col("grp_slope") > 0) != (F.col("pooled_slope") > 0), 1
        )
        .otherwise(0)
        .cast("long")
        .alias("sign_flip"),
    )


# ---------------------------------------------------------------------------
# wave 102: Holt linear-trend smoothing, activity-streak islands
# ---------------------------------------------------------------------------


@query(
    "holt_linear_forecast",
    oracle="""
    WITH RECURSIVE base AS (
        SELECT event_type,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               ROUND(SUM(value), 6) AS y
        FROM events GROUP BY event_type, day
    ), daily AS (
        SELECT event_type, y,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                    AS BIGINT) AS i,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM base
    ), rec AS (
        SELECT event_type, i, n, CAST(y AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b
        FROM daily WHERE i = 1
        UNION ALL
        SELECT d.event_type, d.i, d.n,
               0.5*d.y + 0.5*(r.l + r.b),
               0.25*((0.5*d.y + 0.5*(r.l + r.b)) - r.l) + 0.75*r.b
        FROM rec r JOIN daily d
          ON d.event_type = r.event_type AND d.i = r.i + 1
    )
    SELECT event_type, n AS n_days,
           ROUND(l, 6) AS level, ROUND(b, 6) AS trend,
           ROUND(l + 7*b, 6) AS forecast_7d
    FROM rec WHERE i = n
    """,
)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level α=0.5, trend β=0.25,
    b₀=0) over each event type's daily value series, with the 7-day-
    ahead linear forecast l_T + 7·b_T — the trend-aware upgrade of the
    seasonal-naive and EWMA baselines. A smoothing recurrence is
    inherently SEQUENTIAL, which SQL can't window: here it runs as an
    `aggregate` HOF fold over the day-sorted series (array-bounded,
    JVM-side), and the oracle unrolls the identical recurrence as a
    recursive CTE — the fold and the CTE share one IEEE dag, made
    input-identical by rounding the daily sums to 6 BEFORE the
    recurrence (partial-agg order differs between engines; α,β are
    dyadic so every multiply is exact).

    Scale shape: the fact stream collapses to |types|×|days| rows in
    one hash agg; collect_list holds a days-bounded array per type
    (365 doubles/year — bounded regardless of corpus size); the fold
    is one in-row pass. This is the scale-correct shape for ANY
    per-key recurrence: reduce to the series grain first, then fold
    in-row.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    daily = ev.groupBy(
        "event_type", epoch_day("ts").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("y"))
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "y"))).alias("arr")
    )
    fitted = series.select(
        "event_type",
        F.size("arr").cast("long").alias("n_days"),
        F.expr(
            "aggregate("
            "  slice(transform(arr, x -> x.y), 2, greatest(size(arr) - 1, 0)),"
            "  named_struct('l', CAST(arr[0].y AS DOUBLE),"
            "               'b', CAST(0.0 AS DOUBLE)),"
            "  (acc, y) -> named_struct("
            "      'l', 0.5*y + 0.5*(acc.l + acc.b),"
            "      'b', 0.25*((0.5*y + 0.5*(acc.l + acc.b)) - acc.l)"
            "           + 0.75*acc.b))"
        ).alias("hb"),
    )
    return fitted.select(
        "event_type",
        "n_days",
        F.round(F.col("hb.l"), 6).alias("level"),
        F.round(F.col("hb.b"), 6).alias("trend"),
        F.round(F.col("hb.l") + 7 * F.col("hb.b"), 6).alias("forecast_7d"),
    )


@query(
    "activity_streak_islands",
    oracle="""
    WITH d AS (
        SELECT DISTINCT user_id,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        FROM events
    ), isl AS (
        SELECT user_id, day,
               day - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day) AS BIGINT) AS grp
        FROM d
    ), runs AS (
        SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
        FROM isl GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak
    FROM runs GROUP BY user_id
    """,
)
def activity_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands on the user-activity calendar: consecutive-day
    streaks found by the classic day − row_number() constant-group
    trick (consecutive days share the difference), then per-user
    streak census — active days, number of streaks, longest streak.
    The engagement-streak primitive behind retention "N-day streak"
    features, pure integer arithmetic end to end.

    Scale shape: distinct (user, day) first collapses event fan-in;
    one window partitioned by user over days-bounded partitions; two
    hash aggs. All narrow integer rows; the window partition key is
    the user — no global sort.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    d = ev.select("user_id", epoch_day("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = d.select(
        "user_id",
        "day",
        (F.col("day") - F.row_number().over(w).cast("long")).alias("grp"),
    )
    runs = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    return runs.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
    )


# ---------------------------------------------------------------------------
# wave 103: Kruskal-Wallis omnibus rank test, Spearman rank correlation
# ---------------------------------------------------------------------------


@query(
    "kruskal_wallis_quantity",
    oracle="""
    WITH hist AS (
        SELECT l_returnflag AS grp, l_quantity AS v,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM lineitem GROUP BY grp, v
    ), vals AS (
        SELECT v, CAST(SUM(c) AS BIGINT) AS cv FROM hist GROUP BY v
    ), mids AS (
        SELECT v, cv,
               2 * (CAST(SUM(cv) OVER (ORDER BY v) AS BIGINT) - cv) + cv + 1
                   AS mid2
        FROM vals
    ), rsum AS (
        SELECT grp, CAST(SUM(h.c) AS BIGINT) AS n_g,
               CAST(SUM(h.c * m.mid2) AS BIGINT) AS s2_g
        FROM hist h JOIN mids m ON h.v = m.v
        GROUP BY grp
    ), tot AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM rsum
    ), ties AS (
        SELECT CAST(SUM(cv*cv*cv - cv) AS BIGINT) AS t3 FROM vals
    ), h AS (
        SELECT k, n,
               (12.0 / (CAST(n AS DOUBLE) * (n + 1)))
                   * (SELECT SUM((CAST(s2_g AS DOUBLE)/2)
                                 * (CAST(s2_g AS DOUBLE)/2) / n_g) FROM rsum)
                   - 3.0 * (n + 1) AS h_raw,
               1.0 - CAST(t3 AS DOUBLE)
                   / (CAST(n AS DOUBLE)*n*n - n) AS tie_corr
        FROM tot, ties
    )
    SELECT k AS n_groups, n AS n_rows,
           ROUND(h_raw, 6) AS h_uncorrected,
           ROUND(tie_corr, 6) AS tie_correction,
           ROUND(h_raw / tie_corr, 6) AS h_statistic
    FROM h
    """,
)
def kruskal_wallis_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis omnibus rank test: do the return-flag strata draw
    l_quantity from the same distribution? The nonparametric one-way
    ANOVA beside the two-sample tests already here (KS, Cramér-von
    Mises, log-rank) — H = 12/(N(N+1))·ΣR̄²ᵢ/nᵢ − 3(N+1), divided by
    the tie correction 1 − Σ(t³−t)/(N³−N).

    The scale trick: ranks are never assigned to rows. l_quantity has
    ~50 distinct values, so midranks come from the VALUE HISTOGRAM —
    mid(v) = cnt_less(v) + (cnt_eq(v)+1)/2 — and each group's rank sum
    is Σ c_gv·mid(v) over the tiny (group, value) table. Doubling the
    midrank (mid2 = 2·cnt_less + cnt_eq + 1) keeps EVERY intermediate
    an exact BIGINT; H is one fixed double dag over exact integers,
    rounded to 6.

    Scale shape: one hash agg to |groups|×|values| rows; the
    cumulative-count window runs over |values| (~50) rows. Nothing
    row-ordered ever shuffles — the histogram-midrank construction is
    THE way rank statistics survive 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    hist = li.groupBy(
        F.col("l_returnflag").alias("grp"), F.col("l_quantity").alias("v")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    vals = hist.groupBy("v").agg(F.sum("c").cast("long").alias("cv"))
    wv = Window.orderBy("v")
    mids = vals.select(
        "v",
        "cv",
        (
            2 * (F.sum("cv").over(wv).cast("long") - F.col("cv"))
            + F.col("cv")
            + 1
        ).alias("mid2"),
    )
    rsum = (
        hist.join(F.broadcast(mids), "v")
        .groupBy("grp")
        .agg(
            F.sum("c").cast("long").alias("n_g"),
            F.sum(F.col("c") * F.col("mid2")).cast("long").alias("s2_g"),
        )
    )
    tot = rsum.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    ties = vals.agg(
        F.sum(F.col("cv") * F.col("cv") * F.col("cv") - F.col("cv"))
        .cast("long")
        .alias("t3")
    )
    rterm = rsum.agg(
        F.sum(
            (F.col("s2_g").cast("double") / 2)
            * (F.col("s2_g").cast("double") / 2)
            / F.col("n_g")
        ).alias("rr")
    )
    return (
        tot.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(rterm))
        .select(
            F.col("k").alias("n_groups"),
            F.col("n").alias("n_rows"),
            F.round(
                (12.0 / (F.col("n").cast("double") * (F.col("n") + 1)))
                * F.col("rr")
                - 3.0 * (F.col("n") + 1),
                6,
            ).alias("h_uncorrected"),
            F.round(
                1.0
                - F.col("t3").cast("double")
                / (
                    F.col("n").cast("double") * F.col("n") * F.col("n")
                    - F.col("n")
                ),
                6,
            ).alias("tie_correction"),
            F.round(
                (
                    (12.0 / (F.col("n").cast("double") * (F.col("n") + 1)))
                    * F.col("rr")
                    - 3.0 * (F.col("n") + 1)
                )
                / (
                    1.0
                    - F.col("t3").cast("double")
                    / (
                        F.col("n").cast("double") * F.col("n") * F.col("n")
                        - F.col("n")
                    )
                ),
                6,
            ).alias("h_statistic"),
        )
    )


@query(
    "spearman_rank_corr",
    oracle="""
    WITH joint AS (
        SELECT l_quantity AS x, l_discount AS y,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM lineitem GROUP BY x, y
    ), xv AS (
        SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM joint GROUP BY x
    ), xm AS (
        SELECT x, 2 * (CAST(SUM(cx) OVER (ORDER BY x) AS BIGINT) - cx)
                  + cx + 1 AS mx2
        FROM xv
    ), yv AS (
        SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM joint GROUP BY y
    ), ym AS (
        SELECT y, 2 * (CAST(SUM(cy) OVER (ORDER BY y) AS BIGINT) - cy)
                  + cy + 1 AS my2
        FROM yv
    ), m AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(c * mx2) AS BIGINT) AS sx,
               CAST(SUM(c * my2) AS BIGINT) AS sy,
               CAST(SUM(c * mx2 * my2) AS BIGINT) AS sxy,
               CAST(SUM(c * mx2 * mx2) AS BIGINT) AS sxx,
               CAST(SUM(c * my2 * my2) AS BIGINT) AS syy
        FROM joint j JOIN xm ON j.x = xm.x JOIN ym ON j.y = ym.y
    )
    SELECT n AS n_rows,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                 6) AS spearman_rho
    FROM m
    """,
)
def spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between l_quantity and l_discount —
    Pearson on tie-averaged midranks, the monotone-association
    companion to Kendall's τ (already here, concordance-pair form).
    Same histogram-midrank construction as kruskal_wallis_quantity:
    both variables have small distinct-value sets, so doubled midranks
    (exact BIGINTs) come from per-variable value histograms and every
    moment sum Σc·r_x·r_y is exact 64-bit integer arithmetic over the
    JOINT histogram — the ×2 scaling cancels in the correlation.
    ρ is one double dag over six exact integers, rounded to 6.

    Scale shape: one hash agg to the |X|×|Y| joint histogram (~550
    rows); marginal cumulations run over ≤50-row relations; the two
    midrank joins broadcast. No row-level rank assignment anywhere.
    BIGINT headroom: Σc·mx2·my2 ≤ N·(2N)² — switch moment sums to
    DECIMAL(38,0) beyond ~1e8 rows, as the 128-bit census queries do.
    """
    li = load_table(spark, sf_dir, "lineitem")
    joint = li.groupBy(
        F.col("l_quantity").alias("x"), F.col("l_discount").alias("y")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    xv = joint.groupBy("x").agg(F.sum("c").cast("long").alias("cx"))
    wx = Window.orderBy("x")
    xm = xv.select(
        "x",
        (
            2 * (F.sum("cx").over(wx).cast("long") - F.col("cx"))
            + F.col("cx")
            + 1
        ).alias("mx2"),
    )
    yv = joint.groupBy("y").agg(F.sum("c").cast("long").alias("cy"))
    wy = Window.orderBy("y")
    ym = yv.select(
        "y",
        (
            2 * (F.sum("cy").over(wy).cast("long") - F.col("cy"))
            + F.col("cy")
            + 1
        ).alias("my2"),
    )
    m = (
        joint.join(F.broadcast(xm), "x")
        .join(F.broadcast(ym), "y")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(F.col("c") * F.col("mx2")).cast("long").alias("sx"),
            F.sum(F.col("c") * F.col("my2")).cast("long").alias("sy"),
            F.sum(F.col("c") * F.col("mx2") * F.col("my2"))
            .cast("long")
            .alias("sxy"),
            F.sum(F.col("c") * F.col("mx2") * F.col("mx2"))
            .cast("long")
            .alias("sxx"),
            F.sum(F.col("c") * F.col("my2") * F.col("my2"))
            .cast("long")
            .alias("syy"),
        )
    )
    nd = F.col("n").cast("double")
    return m.select(
        F.col("n").alias("n_rows"),
        F.round(
            (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            / (
                F.sqrt(nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
                * F.sqrt(
                    nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
                )
            ),
            6,
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# wave 104: Wald-Wolfowitz runs test, Neyman sampling allocation
# ---------------------------------------------------------------------------


@query(
    "runs_test_daily_value",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               ROUND(SUM(value), 6) AS y
        FROM events GROUP BY day
    ), med AS (
        SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY y) AS m FROM daily
    ), signs AS (
        SELECT day, CASE WHEN y > m THEN 1 ELSE 0 END AS s
        FROM daily, med WHERE y <> m
    ), flips AS (
        SELECT s, CASE WHEN LAG(s) OVER (ORDER BY day) IS NOT NULL
                        AND LAG(s) OVER (ORDER BY day) <> s
                       THEN 1 ELSE 0 END AS flip
        FROM signs
    ), c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(s) AS BIGINT) AS n_plus,
               CAST(COUNT(*) - SUM(s) AS BIGINT) AS n_minus,
               CAST(1 + SUM(flip) AS BIGINT) AS runs
        FROM flips
    )
    SELECT n, n_plus, n_minus, runs,
           ROUND(1.0 + 2.0 * n_plus * n_minus / n, 6) AS expected_runs,
           ROUND((runs - (1.0 + 2.0 * n_plus * n_minus / n))
                 / sqrt(2.0 * n_plus * n_minus
                        * (2.0 * n_plus * n_minus - n)
                        / (CAST(n AS DOUBLE) * n * (n - 1))), 6) AS z
    FROM c
    """,
)
def runs_test_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily event-value series: are
    above-median and below-median days randomly interleaved, or does
    the series clump (trend/autocorrelation) or alternate (negative
    feedback)? Days exactly at the median are dropped (the classical
    convention); R = 1 + sign flips, compared against E[R] =
    1 + 2n₊n₋/n with the exact runs-test variance. The
    distribution-free randomness check beside ACF (linear
    autocorrelation) and Mann-Kendall (monotone trend).

    Determinism: daily sums round to 6 before the median cut;
    percentile_disc picks an actual data value on both engines; counts
    and flips are exact integers; z is one rounded double dag.

    Scale shape: fact stream collapses to |days| rows in one hash agg;
    the median, lag window, and census all run on that days-bounded
    relation. Nothing row-level survives the first agg.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    daily = ev.groupBy(epoch_day("ts").alias("day")).agg(
        F.round(F.sum("value"), 6).alias("y")
    )
    med = daily.agg(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY y)").alias("m"))
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("y") != F.col("m"))
        .select("day", F.when(F.col("y") > F.col("m"), 1).otherwise(0).alias("s"))
    )
    w = Window.orderBy("day")
    flips = signs.select(
        "s",
        F.when(
            F.lag("s").over(w).isNotNull() & (F.lag("s").over(w) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("flip"),
    )
    c = flips.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("s").cast("long").alias("n_plus"),
        (F.count(F.lit(1)) - F.sum("s")).cast("long").alias("n_minus"),
        (1 + F.sum("flip")).cast("long").alias("runs"),
    )
    npnm = 2.0 * F.col("n_plus") * F.col("n_minus")
    mu = 1.0 + npnm / F.col("n")
    sd = F.sqrt(
        npnm
        * (npnm - F.col("n"))
        / (F.col("n").cast("double") * F.col("n") * (F.col("n") - 1))
    )
    return c.select(
        "n",
        "n_plus",
        "n_minus",
        "runs",
        F.round(mu, 6).alias("expected_runs"),
        F.round((F.col("runs") - mu) / sd, 6).alias("z"),
    )


@query(
    "neyman_allocation_sampling",
    oracle="""
    WITH strata AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(ROUND(sqrt((SUM(CAST(n_chars AS DOUBLE) * n_chars)
                                - SUM(CAST(n_chars AS DOUBLE))
                                  * SUM(CAST(n_chars AS DOUBLE)) / COUNT(*))
                               / COUNT(*)) * COUNT(*) * 1000) AS BIGINT)
                   AS weight
        FROM documents GROUP BY source
    ), tot AS (
        SELECT CAST(SUM(weight) AS BIGINT) AS t FROM strata
    ), quota AS (
        SELECT source, n_docs, weight,
               (weight * 1000) // t AS floor_n,
               (weight * 1000) % t  AS rem
        FROM strata, tot
    ), short AS (
        SELECT 1000 - CAST(SUM(floor_n) AS BIGINT) AS k FROM quota
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rnk
        FROM quota
    )
    SELECT source, n_docs,
           CAST(floor_n + CASE WHEN rnk <= k THEN 1 ELSE 0 END AS BIGINT)
               AS sample_n
    FROM ranked, short
    """,
)
def neyman_allocation_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal allocation: split a 1000-document labeling budget
    across sources proportional to N_h·S_h (stratum size × stratum
    std of document length) — the variance-minimizing stratified
    design, which beats proportional allocation exactly when strata
    differ in spread. The weights N_h·S_h are rounded to integer
    milli-units and the integerization reuses the largest-remainder
    scheme (seat_apportionment_revenue), so the allocations sum to
    EXACTLY the budget and every comparison is integer-exact — the
    one sqrt per stratum is quarantined behind a single round before
    any ranking happens.

    Scale shape: one pass of moment sums per stratum (map-side
    partials), then pure arithmetic on a |sources|-row relation.
    """
    docs = load_table(spark, sf_dir, "documents")
    nd = F.count(F.lit(1))
    sx = F.sum(F.col("n_chars").cast("double"))
    sxx = F.sum(F.col("n_chars").cast("double") * F.col("n_chars"))
    strata = docs.groupBy("source").agg(
        nd.cast("long").alias("n_docs"),
        F.round(F.sqrt((sxx - sx * sx / nd) / nd) * nd * 1000)
        .cast("long")
        .alias("weight"),
    )
    tot = strata.agg(F.sum("weight").cast("long").alias("t"))
    quota = strata.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "weight",
        F.expr("(weight * 1000) div t").alias("floor_n"),
        F.expr("(weight * 1000) % t").alias("rem"),
    )
    short = quota.agg((F.lit(1000) - F.sum("floor_n")).cast("long").alias("k"))
    ranked = quota.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.col("rem").desc(), F.col("source"))),
    )
    return ranked.crossJoin(F.broadcast(short)).select(
        "source",
        "n_docs",
        (F.col("floor_n") + F.when(F.col("rnk") <= F.col("k"), 1).otherwise(0))
        .cast("long")
        .alias("sample_n"),
    )


# ---------------------------------------------------------------------------
# wave 105: repetition-loop detector, Observation pipeline metrics
# ---------------------------------------------------------------------------


@query(
    "repetition_loop_detector",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(lower(trim(text)), '\\s+') END AS t
        FROM documents
    ), pos2 AS (
        SELECT doc_id, t, unnest(generate_series(3, len(t))) AS i FROM tok
    ), ones2 AS (
        SELECT doc_id, i,
               i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
        FROM pos2 WHERE t[i] = t[i - 2]
    ), mx2 AS (
        SELECT doc_id, MAX(run) AS loop2 FROM (
            SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS run
            FROM ones2 GROUP BY doc_id, grp
        ) GROUP BY doc_id
    ), pos3 AS (
        SELECT doc_id, t, unnest(generate_series(4, len(t))) AS i FROM tok
    ), ones3 AS (
        SELECT doc_id, i,
               i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
        FROM pos3 WHERE t[i] = t[i - 3]
    ), mx3 AS (
        SELECT doc_id, MAX(run) AS loop3 FROM (
            SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS run
            FROM ones3 GROUP BY doc_id, grp
        ) GROUP BY doc_id
    )
    SELECT k.doc_id,
           CAST(COALESCE(m2.loop2, 0) AS BIGINT) AS loop2,
           CAST(COALESCE(m3.loop3, 0) AS BIGINT) AS loop3,
           CAST(CASE WHEN COALESCE(m2.loop2, 0) >= 4
                      OR COALESCE(m3.loop3, 0) >= 6
                     THEN 1 ELSE 0 END AS BIGINT) AS is_loopy
    FROM tok k LEFT JOIN mx2 m2 ON k.doc_id = m2.doc_id
               LEFT JOIN mx3 m3 ON k.doc_id = m3.doc_id
    """,
)
def repetition_loop_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-GENERATION loop detector: the longest run of positions
    where token i equals token i−p, for phrase periods p=2 and p=3 —
    catches 'the cat the cat the cat' and three-word loops that the
    period-1 stutter detector (longest_token_run) and global frequency
    filters both miss. A doc is flagged loopy when a 2-gram repeats
    ≥2 extra times (loop2 ≥ 4) or a 3-gram ≥2 extra times (loop3 ≥ 6).

    ZERO-SHUFFLE except the final projection: the flag arrays and the
    longest-run fold are in-row higher-order functions (transform over
    sequence + aggregate with a (cur,max) accumulator) — no posexplode,
    no window, no doc-keyed exchange; the oracle re-derives identical
    runs with the explode + gaps-and-islands spec form. The guard
    CASE keeps Spark's descending-sequence() surprise away from short
    docs (sequence(4,2) counts DOWN; DuckDB's generate_series is
    empty).

    Scale shape: map-side per row, output one narrow row per doc. At
    100 TB this runs at scan speed beside the in-row quality gate.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", ws_tokens(F.lower(F.col("text"))).alias("t")
    )

    def runmax(p: int):
        return F.expr(
            f"""
            aggregate(
              CASE WHEN size(t) >= {p + 1}
                   THEN transform(sequence({p + 1}, size(t)),
                        i -> IF(element_at(t, i) = element_at(t, i - {p}),
                                1, 0))
                   ELSE array() END,
              named_struct('cur', 0L, 'mx', 0L),
              (a, f) -> named_struct(
                  'cur', IF(f = 1, a.cur + 1, 0L),
                  'mx', greatest(a.mx, IF(f = 1, a.cur + 1, 0L))),
              a -> a.mx)
            """
        )

    out = toks.select(
        "doc_id",
        runmax(2).cast("long").alias("loop2"),
        runmax(3).cast("long").alias("loop3"),
    )
    return out.select(
        "doc_id",
        "loop2",
        "loop3",
        F.when((F.col("loop2") >= 4) | (F.col("loop3") >= 6), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_loopy"),
    )


@query(
    "observed_ingest_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nonpositive,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN
                   ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_priority,
           ROUND(SUM(o_totalprice), 2) AS total_value
    FROM orders
    """,
)
def observed_ingest_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via Spark's Observation API: the ingest
    pass over orders is instrumented with ``df.observe(...)`` metrics
    (row count, nonpositive-price violations, unknown-priority
    violations, total value) that the EXECUTOR accumulates as a
    side-effect of the normal action — the production pattern for
    data-quality counters that must not cost a second scan (contrast
    data_expectations_report, which is a dedicated audit query). The
    observed metrics come back as a 1-row DataFrame; the oracle
    recomputes them as plain aggregates.

    Scale shape: observe() piggybacks accumulators on whatever action
    the pipeline already runs (here a noop-sink write) — zero extra
    jobs, zero extra shuffles, metrics merged driver-side like any
    accumulator. The one collect-like step is reading 4 scalars.
    """
    from pyspark.sql import Observation

    orders = load_table(spark, sf_dir, "orders")
    obs = Observation("ingest_metrics")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("n_nonpositive"),
        F.sum(
            F.when(
                ~F.col("o_orderpriority").isin(
                    "1-URGENT",
                    "2-HIGH",
                    "3-MEDIUM",
                    "4-NOT SPECIFIED",
                    "5-LOW",
                ),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_bad_priority"),
        F.round(F.sum("o_totalprice"), 2).alias("total_value"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["n_nonpositive"],
                m["n_bad_priority"],
                float(m["total_value"]),
            )
        ],
        "n_rows bigint, n_nonpositive bigint, n_bad_priority bigint, "
        "total_value double",
    )


# ---------------------------------------------------------------------------
# wave 106: sweep-line peak concurrency, Nelson-Aalen cumulative hazard
# ---------------------------------------------------------------------------


@query(
    "peak_concurrent_sessions",
    oracle="""
    WITH pts AS (
        SELECT user_id, ts,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        FROM events
    ), iv AS (
        SELECT user_id, day, MIN(ts) AS s, MAX(ts) AS e
        FROM pts GROUP BY user_id, day
    ), deltas AS (
        SELECT day, epoch_us(s) * 2 AS k, 1 AS delta FROM iv
        UNION ALL
        SELECT day, epoch_us(e) * 2 + 1 AS k, -1 AS delta FROM iv
    ), run AS (
        SELECT day,
               SUM(delta) OVER (ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        FROM deltas
    )
    SELECT day, CAST(MAX(c) AS BIGINT) AS peak_concurrent
    FROM run GROUP BY day
    """,
)
def peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrency: each user's daily activity span
    [first event, last event] becomes a +1/−1 delta pair, the running
    sum over the global time order is the number of simultaneously
    active users, and the per-day MAX of that running count is the
    capacity-planning headline ("how many concurrent sessions must we
    hold?"). The +1-before-−1 tie order (k = 2·ts for starts,
    2·ts+1 for ends) counts touching intervals as overlapping, and
    makes the per-instant max order-independent even when several
    spans share a timestamp.

    Scale shape: the global running sum uses
    operators/rank.py:distributed_prefix_sum — range-bucket on the
    doubled-timestamp key, per-bucket windowed cumsum in parallel,
    bucket offsets broadcast as a literal map — NOT a bare
    Window.orderBy, which would funnel every delta through one task.
    The oracle uses the single-task window form as the spec; the
    engine plan keeps tasks bounded at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark_movie_recommender_spark.operators.rank import (
        distributed_prefix_sum,
    )
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    iv = ev.select("user_id", "ts", epoch_day("ts").alias("day")).groupBy(
        "user_id", "day"
    ).agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    # session TZ is pinned UTC, so NTZ→TZ cast is faithful (see epoch_day)
    def us(c):
        return F.unix_micros(c.cast("timestamp"))

    deltas = iv.select(
        "day", (us(F.col("s")) * 2).alias("k"), F.lit(1).alias("delta"),
        F.col("user_id").alias("uid"),
    ).unionByName(
        iv.select(
            "day", (us(F.col("e")) * 2 + 1).alias("k"),
            F.lit(-1).alias("delta"), F.col("user_id").alias("uid"),
        )
    )
    run = distributed_prefix_sum(
        deltas, key_col="k", id_col="uid", val_col="delta", out_col="c"
    )
    return run.groupBy("day").agg(
        F.max("c").cast("long").alias("peak_concurrent")
    )


@query(
    "nelson_aalen_hazard",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS buy_ts
        FROM events GROUP BY user_id
    ), horizon AS (
        SELECT MAX(ts) AS max_ts FROM events
    ), durations AS (
        SELECT CASE WHEN buy_ts IS NOT NULL AND buy_ts >= signup_ts
                    THEN date_diff('day', signup_ts, buy_ts)
                    ELSE date_diff('day', signup_ts, max_ts) END AS t_days,
               CASE WHEN buy_ts IS NOT NULL AND buy_ts >= signup_ts
                    THEN 1 ELSE 0 END AS event
        FROM per_user, horizon
        WHERE signup_ts IS NOT NULL
    ), tbl AS (
        SELECT CAST(t_days AS BIGINT) AS t_days,
               CAST(SUM(event) AS BIGINT) AS d_events,
               CAST(COUNT(*) AS BIGINT) AS n_total
        FROM durations GROUP BY t_days
    ), risk AS (
        SELECT t_days, d_events,
               CAST(SUM(n_total) OVER (ORDER BY t_days DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_at_risk
        FROM tbl
    )
    SELECT t_days, d_events, n_at_risk,
           ROUND(SUM(CAST(d_events AS DOUBLE) / n_at_risk)
                     OVER (ORDER BY t_days
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 6) AS cum_hazard
    FROM risk WHERE d_events > 0
    """,
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ
    for the signup→first-purchase duration with right-censoring at the
    observation horizon — the hazard-scale companion to the
    Kaplan-Meier survival curve (kaplan_meier_signup_purchase): H(t)
    adds cleanly across strata and feeds −log-survival diagnostics,
    where KM multiplies. Same risk-set construction: at-risk counts
    come from a DESCENDING cumulative sum over the duration table.

    Determinism: dᵢ and nᵢ are exact integers; the hazard increments
    are exact-integer ratios summed in ascending t order on both
    engines, rounded to 6.

    Scale shape: per-user durations are one hash agg; everything after
    runs on the |distinct durations| table (days-bounded), where the
    two windows are legitimately tiny. Censoring is a broadcast
    horizon scalar.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "signup_ts"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "buy_ts"
        ),
    )
    horizon = ev.agg(F.max("ts").alias("max_ts"))
    converted = F.col("buy_ts").isNotNull() & (
        F.col("buy_ts") >= F.col("signup_ts")
    )
    durations = (
        per_user.crossJoin(F.broadcast(horizon))
        .filter(F.col("signup_ts").isNotNull())
        .select(
            F.when(
                converted, F.datediff(F.col("buy_ts"), F.col("signup_ts"))
            )
            .otherwise(F.datediff(F.col("max_ts"), F.col("signup_ts")))
            .cast("long")
            .alias("t_days"),
            F.when(converted, 1).otherwise(0).alias("event"),
        )
    )
    tbl = durations.groupBy("t_days").agg(
        F.sum("event").cast("long").alias("d_events"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
    )
    wdesc = (
        Window.orderBy(F.col("t_days").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = tbl.select(
        "t_days",
        "d_events",
        F.sum("n_total").over(wdesc).cast("long").alias("n_at_risk"),
    )
    wasc = (
        Window.orderBy("t_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        risk.withColumn(
            "cum_hazard",
            F.round(
                F.sum(
                    F.col("d_events").cast("double") / F.col("n_at_risk")
                ).over(wasc),
                6,
            ),
        )
        .filter(F.col("d_events") > 0)
        .select("t_days", "d_events", "n_at_risk", "cum_hazard")
    )


# ---------------------------------------------------------------------------
# wave 107: Markov removal-effect attribution, subsequence pattern support
# ---------------------------------------------------------------------------


@query(
    "markov_removal_attribution",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ), conv AS (
        SELECT user_id, MIN(rn) AS conv_rn FROM seq
        WHERE event_type = 'purchase' GROUP BY user_id
    ), j AS (
        SELECT s.user_id,
               CASE WHEN s.event_type = 'purchase' THEN 'CONV'
                    ELSE s.event_type END AS state,
               s.rn
        FROM seq s LEFT JOIN conv c ON s.user_id = c.user_id
        WHERE c.conv_rn IS NULL OR s.rn <= c.conv_rn
    ), steps AS (
        SELECT user_id, state, rn,
               LEAD(state) OVER (PARTITION BY user_id ORDER BY rn) AS nxt,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS pos,
               COUNT(*) OVER (PARTITION BY user_id) AS n_steps
        FROM j
    ), trans AS (
        SELECT 'START' AS s, state AS t FROM steps WHERE pos = 1
        UNION ALL
        SELECT state AS s, nxt AS t FROM steps WHERE nxt IS NOT NULL
        UNION ALL
        SELECT state AS s, 'DROP' AS t FROM steps
        WHERE nxt IS NULL AND state <> 'CONV'
    ), cnt AS (
        SELECT s, t, CAST(COUNT(*) AS BIGINT) AS c FROM trans GROUP BY s, t
    ), tot AS (
        SELECT s, CAST(SUM(c) AS BIGINT) AS cs FROM cnt GROUP BY s
    ), bt AS (
        SELECT cnt.s, cnt.t, CAST(cnt.c AS DOUBLE) / tot.cs AS p
        FROM cnt JOIN tot USING (s)
    ), scen AS (
        SELECT * FROM (VALUES ('none'), ('click'), ('error'),
                              ('signup'), ('view')) x(scenario)
    ), st AS (
        SELECT scenario, s, t, p FROM scen, bt WHERE t <> scenario
    ), states AS (
        SELECT DISTINCT scenario, s FROM st
    ), pc AS (
        SELECT scenario, s, p FROM st WHERE t = 'CONV'
    ), ce AS (
        SELECT scenario, s, t, p FROM st WHERE t NOT IN ('CONV', 'DROP')
    ), it0 AS (
        SELECT scenario, s, CAST(0.0 AS DOUBLE) AS v FROM states
    ), it1 AS (
        SELECT x.scenario, x.s, COALESCE(MAX(pc.p), 0)
               + COALESCE(SUM(ce.p * i.v), 0) AS v
        FROM states x
        LEFT JOIN pc ON pc.scenario = x.scenario AND pc.s = x.s
        LEFT JOIN ce ON ce.scenario = x.scenario AND ce.s = x.s
        LEFT JOIN it0 i ON i.scenario = x.scenario AND i.s = ce.t
        GROUP BY x.scenario, x.s
    ), it2 AS (
        SELECT x.scenario, x.s, COALESCE(MAX(pc.p), 0)
               + COALESCE(SUM(ce.p * i.v), 0) AS v
        FROM states x
        LEFT JOIN pc ON pc.scenario = x.scenario AND pc.s = x.s
        LEFT JOIN ce ON ce.scenario = x.scenario AND ce.s = x.s
        LEFT JOIN it1 i ON i.scenario = x.scenario AND i.s = ce.t
        GROUP BY x.scenario, x.s
    ), it3 AS (
        SELECT x.scenario, x.s, COALESCE(MAX(pc.p), 0)
               + COALESCE(SUM(ce.p * i.v), 0) AS v
        FROM states x
        LEFT JOIN pc ON pc.scenario = x.scenario AND pc.s = x.s
        LEFT JOIN ce ON ce.scenario = x.scenario AND ce.s = x.s
        LEFT JOIN it2 i ON i.scenario = x.scenario AND i.s = ce.t
        GROUP BY x.scenario, x.s
    ), it4 AS (
        SELECT x.scenario, x.s, COALESCE(MAX(pc.p), 0)
               + COALESCE(SUM(ce.p * i.v), 0) AS v
        FROM states x
        LEFT JOIN pc ON pc.scenario = x.scenario AND pc.s = x.s
        LEFT JOIN ce ON ce.scenario = x.scenario AND ce.s = x.s
        LEFT JOIN it3 i ON i.scenario = x.scenario AND i.s = ce.t
        GROUP BY x.scenario, x.s
    ), it5 AS (
        SELECT x.scenario, x.s, COALESCE(MAX(pc.p), 0)
               + COALESCE(SUM(ce.p * i.v), 0) AS v
        FROM states x
        LEFT JOIN pc ON pc.scenario = x.scenario AND pc.s = x.s
        LEFT JOIN ce ON ce.scenario = x.scenario AND ce.s = x.s
        LEFT JOIN it4 i ON i.scenario = x.scenario AND i.s = ce.t
        GROUP BY x.scenario, x.s
    ), it6 AS (
        SELECT x.scenario, x.s, COALESCE(MAX(pc.p), 0)
               + COALESCE(SUM(ce.p * i.v), 0) AS v
        FROM states x
        LEFT JOIN pc ON pc.scenario = x.scenario AND pc.s = x.s
        LEFT JOIN ce ON ce.scenario = x.scenario AND ce.s = x.s
        LEFT JOIN it5 i ON i.scenario = x.scenario AND i.s = ce.t
        GROUP BY x.scenario, x.s
    ), it7 AS (
        SELECT x.scenario, x.s, COALESCE(MAX(pc.p), 0)
               + COALESCE(SUM(ce.p * i.v), 0) AS v
        FROM states x
        LEFT JOIN pc ON pc.scenario = x.scenario AND pc.s = x.s
        LEFT JOIN ce ON ce.scenario = x.scenario AND ce.s = x.s
        LEFT JOIN it6 i ON i.scenario = x.scenario AND i.s = ce.t
        GROUP BY x.scenario, x.s
    ), it8 AS (
        SELECT x.scenario, x.s, COALESCE(MAX(pc.p), 0)
               + COALESCE(SUM(ce.p * i.v), 0) AS v
        FROM states x
        LEFT JOIN pc ON pc.scenario = x.scenario AND pc.s = x.s
        LEFT JOIN ce ON ce.scenario = x.scenario AND ce.s = x.s
        LEFT JOIN it7 i ON i.scenario = x.scenario AND i.s = ce.t
        GROUP BY x.scenario, x.s
    ), conv_prob AS (
        SELECT scenario, v FROM it8 WHERE s = 'START'
    ), base AS (
        SELECT v AS b FROM conv_prob WHERE scenario = 'none'
    ), rem AS (
        SELECT scenario AS channel, (b - v) / b AS removal
        FROM conv_prob, base WHERE scenario <> 'none'
    ), tot_rem AS (
        SELECT SUM(removal) AS tr FROM rem
    )
    SELECT channel, ROUND(removal, 6) AS removal_effect,
           CAST(CASE WHEN tr > 0
                     THEN floor(removal * 1000000 / tr)
                     ELSE 0 END AS BIGINT) AS attribution_ppm
    FROM rem, tot_rem
    """,
)
def markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov attribution with REMOVAL EFFECTS: user
    journeys (event stream up to first purchase, purchase → absorbing
    CONV, abandonment → absorbing DROP) define a transition matrix;
    each channel's credit is how much the START→CONV absorption
    probability falls when that channel's node is deleted — the
    principled data-driven alternative to the positional rules
    (linear/time-decay) and the cooperative-game view (Shapley)
    already in the registry. Absorption probabilities come from 8
    synchronous value-iteration rounds v ← P_conv + P·v (spectral
    radius < 1, converged to ~1e-10 on this chain), unrolled as
    chained CTEs in the oracle.

    Scale shape: the fact-sized work is journeys → transition COUNTS
    (two windows per user partition + one hash agg); every iteration
    then runs on the |scenarios|×|states|² relation (~hundreds of
    rows) with broadcast joins. The pagerank-style loop, but on a
    matrix small enough that the driver loop costs nothing.
    """
    ev = load_table(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(wseq).alias("rn")
    )
    conv = (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("conv_rn"))
    )
    j = (
        seq.join(conv, "user_id", "left")
        .filter(F.col("conv_rn").isNull() | (F.col("rn") <= F.col("conv_rn")))
        .select(
            "user_id",
            F.when(F.col("event_type") == "purchase", "CONV")
            .otherwise(F.col("event_type"))
            .alias("state"),
            "rn",
        )
    )
    wj = Window.partitionBy("user_id").orderBy("rn")
    steps = j.select(
        "user_id",
        "state",
        F.lead("state").over(wj).alias("nxt"),
        F.row_number().over(wj).alias("pos"),
    )
    trans = (
        steps.filter(F.col("pos") == 1)
        .select(F.lit("START").alias("s"), F.col("state").alias("t"))
        .unionByName(
            steps.filter(F.col("nxt").isNotNull()).select(
                F.col("state").alias("s"), F.col("nxt").alias("t")
            )
        )
        .unionByName(
            steps.filter(
                F.col("nxt").isNull() & (F.col("state") != "CONV")
            ).select(F.col("state").alias("s"), F.lit("DROP").alias("t"))
        )
    )
    cnt = trans.groupBy("s", "t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = cnt.groupBy("s").agg(F.sum("c").cast("long").alias("cs"))
    bt = cnt.join(tot, "s").select(
        "s", "t", (F.col("c").cast("double") / F.col("cs")).alias("p")
    )
    scen = spark.createDataFrame(
        [("none",), ("click",), ("error",), ("signup",), ("view",)],
        "scenario string",
    )
    st = bt.crossJoin(F.broadcast(scen)).filter(
        F.col("t") != F.col("scenario")
    )
    states = st.select("scenario", "s").distinct().localCheckpoint()
    pc = st.filter(F.col("t") == "CONV").select("scenario", "s", "p")
    ce = st.filter(~F.col("t").isin("CONV", "DROP")).select(
        "scenario", "s", "t", "p"
    ).localCheckpoint()
    v = states.withColumn("v", F.lit(0.0))
    for _ in range(8):
        contrib = (
            ce.join(
                v.select(
                    "scenario", F.col("s").alias("t"), F.col("v").alias("vt")
                ),
                ["scenario", "t"],
            )
            .groupBy("scenario", "s")
            .agg(F.sum(F.col("p") * F.col("vt")).alias("cv"))
        )
        v = (
            states.join(pc, ["scenario", "s"], "left")
            .join(contrib, ["scenario", "s"], "left")
            .select(
                "scenario",
                "s",
                (
                    F.coalesce(F.col("p"), F.lit(0.0))
                    + F.coalesce(F.col("cv"), F.lit(0.0))
                ).alias("v"),
            )
            .localCheckpoint()
        )
    conv_prob = v.filter(F.col("s") == "START").select("scenario", "v")
    base = conv_prob.filter(F.col("scenario") == "none").select(
        F.col("v").alias("b")
    )
    rem = (
        conv_prob.filter(F.col("scenario") != "none")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("scenario").alias("channel"),
            ((F.col("b") - F.col("v")) / F.col("b")).alias("removal"),
        )
    )
    tot_rem = rem.agg(F.sum("removal").alias("tr"))
    return rem.crossJoin(F.broadcast(tot_rem)).select(
        "channel",
        F.round("removal", 6).alias("removal_effect"),
        F.when(
            F.col("tr") > 0,
            F.floor(F.col("removal") * 1000000 / F.col("tr")),
        )
        .otherwise(0)
        .cast("long")
        .alias("attribution_ppm"),
    )


@query(
    "subsequence_pattern_support",
    oracle="""
    WITH seqs AS (
        SELECT user_id, list(event_type ORDER BY ts, event_id) AS t
        FROM events GROUP BY user_id
    ), n AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM seqs
    ), types AS (
        SELECT DISTINCT event_type AS et FROM events
    ), cand AS (
        SELECT a.et AS step_a, b.et AS step_b FROM types a, types b
    ), hits AS (
        SELECT c.step_a, c.step_b, s.user_id,
               CASE WHEN list_position(s.t, c.step_a) IS NOT NULL
                     AND len(list_filter(
                           s.t[list_position(s.t, c.step_a) + 1:],
                           x -> x = c.step_b)) > 0
                    THEN 1 ELSE 0 END AS hit
        FROM cand c, seqs s
    )
    SELECT step_a, step_b,
           CAST(SUM(hit) AS BIGINT) AS n_users_containing,
           CAST(SUM(hit) * 1000000 // n_users AS BIGINT) AS support_ppm
    FROM hits, n
    GROUP BY step_a, step_b, n_users
    """,
)
def subsequence_pattern_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern support (PrefixSpan's counting core for
    length-2 patterns): for every ordered pair of event types (a, b),
    the share of users whose journey contains a FOLLOWED EVENTUALLY by
    b — gap-tolerant subsequence semantics, not the adjacent-bigram
    view of the transition matrix or trigram paths. The first
    occurrence of `a` is provably optimal for pair containment, so
    the in-row check is array_position + a tail-slice membership test,
    O(len) per candidate with no position explode.

    Scale shape: one collect_list per user (journey-bounded arrays),
    then a broadcast |types|² candidate fan-out evaluated map-side by
    HOFs; the support census is one hash agg over (a, b). The
    user×candidate intermediate never shuffles.
    """
    ev = load_table(spark, sf_dir, "events")
    seqs = ev.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list("
            "named_struct('ts', ts, 'eid', event_id, 'et', event_type))),"
            " x -> x.et)"
        ).alias("t")
    )
    n = seqs.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    types = ev.select(F.col("event_type").alias("et")).distinct()
    cand = (
        types.select(F.col("et").alias("step_a"))
        .crossJoin(types.select(F.col("et").alias("step_b")))
    )
    hits = seqs.crossJoin(F.broadcast(cand)).select(
        "step_a",
        "step_b",
        F.expr(
            "CASE WHEN array_position(t, step_a) > 0"
            " AND exists(slice(t, CAST(array_position(t, step_a) + 1 AS INT),"
            "            size(t)), x -> x = step_b)"
            " THEN 1 ELSE 0 END"
        ).alias("hit"),
    )
    return (
        hits.groupBy("step_a", "step_b")
        .agg(F.sum("hit").cast("long").alias("n_users_containing"))
        .crossJoin(F.broadcast(n))
        .select(
            "step_a",
            "step_b",
            "n_users_containing",
            F.expr("n_users_containing * 1000000L div n_users")
            .cast("long")
            .alias("support_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# wave 108: Good-Turing missing mass, Markov entropy rate
# ---------------------------------------------------------------------------


@query(
    "good_turing_missing_mass",
    oracle="""
    WITH tok AS (
        SELECT source,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        FROM documents WHERE trim(text) <> ''
    ), cnt AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS r
        FROM tok GROUP BY source, w
    ), freq AS (
        SELECT source, r, CAST(COUNT(*) AS BIGINT) AS n_r
        FROM cnt GROUP BY source, r
    )
    SELECT source,
           CAST(SUM(n_r) AS BIGINT) AS vocab,
           CAST(SUM(r * n_r) AS BIGINT) AS n_tokens,
           CAST(COALESCE(MAX(CASE WHEN r = 1 THEN n_r END), 0) AS BIGINT)
               AS n_hapax,
           CAST(COALESCE(MAX(CASE WHEN r = 2 THEN n_r END), 0) AS BIGINT)
               AS n_dis,
           CAST(COALESCE(MAX(CASE WHEN r = 1 THEN n_r END), 0) * 1000000
                // SUM(r * n_r) AS BIGINT) AS missing_mass_ppm,
           ROUND(CASE WHEN COALESCE(MAX(CASE WHEN r = 1 THEN n_r END), 0) > 0
                      THEN 2.0 * COALESCE(MAX(CASE WHEN r = 2 THEN n_r END), 0)
                           / COALESCE(MAX(CASE WHEN r = 1 THEN n_r END), 0)
                      END, 6) AS gt_r1_star
    FROM freq GROUP BY source
    """,
)
def good_turing_missing_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing estimate of each source's UNSEEN vocabulary mass:
    the probability that the next token drawn is a brand-new word is
    N₁/N (hapax share), and the smoothed count for once-seen words is
    r* = 2·N₂/N₁ — the language-model smoothing diagnostic that says
    whether a corpus slice is lexically saturated (tiny missing mass)
    or still discovering its vocabulary (large). Completes the
    vocabulary-growth family: Zipf (static law), Heaps (growth curve),
    hapax ratio (raw count) — this is the probabilistic version those
    feed into.

    Exactness: the frequency-of-frequencies table is two exact hash
    aggs; missing mass is integer ppm; r* is one rounded ratio of
    exact BIGINTs.

    Scale shape: explode → (source, word) counts → (source, r) counts;
    the second agg collapses vocab-sized input to at most
    |distinct frequencies| rows per source. All map-side-combinable.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    tok = docs.select(
        "source", F.explode(ws_tokens(F.lower(F.col("text")))).alias("w")
    )
    cnt = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("r")
    )
    freq = cnt.groupBy("source", "r").agg(
        F.count(F.lit(1)).cast("long").alias("n_r")
    )
    n1 = F.coalesce(F.max(F.when(F.col("r") == 1, F.col("n_r"))), F.lit(0))
    n2 = F.coalesce(F.max(F.when(F.col("r") == 2, F.col("n_r"))), F.lit(0))
    return freq.groupBy("source").agg(
        F.sum("n_r").cast("long").alias("vocab"),
        F.sum(F.col("r") * F.col("n_r")).cast("long").alias("n_tokens"),
        n1.cast("long").alias("n_hapax"),
        n2.cast("long").alias("n_dis"),
        F.expr(
            "coalesce(max(CASE WHEN r = 1 THEN n_r END), 0) * 1000000L"
            " div sum(r * n_r)"
        )
        .cast("long")
        .alias("missing_mass_ppm"),
        F.round(
            F.when(n1 > 0, 2.0 * n2.cast("double") / n1),
            6,
        ).alias("gt_r1_star"),
    )


@query(
    "markov_entropy_rate",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS s,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS t
        FROM events
    ), cnt AS (
        SELECT s, t, CAST(COUNT(*) AS BIGINT) AS c
        FROM seq WHERE t IS NOT NULL GROUP BY s, t
    ), tots AS (
        SELECT s, CAST(SUM(c) AS BIGINT) AS cs FROM cnt GROUP BY s
    ), grand AS (
        SELECT CAST(SUM(c) AS BIGINT) AS g FROM cnt
    ), rows_h AS (
        SELECT cnt.s, tots.cs,
               SUM(-(CAST(c AS DOUBLE) / cs)
                   * ln(CAST(c AS DOUBLE) / cs) / ln(2)) AS h_row
        FROM cnt JOIN tots USING (s) GROUP BY cnt.s, tots.cs
    )
    SELECT ROUND(SUM((CAST(cs AS DOUBLE) / g) * h_row), 6)
               AS entropy_rate_bits,
           ROUND(pow(2.0, SUM((CAST(cs AS DOUBLE) / g) * h_row)), 6)
               AS behavior_perplexity
    FROM rows_h, grand
    """,
)
def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy RATE of user behavior: the plug-in estimate
    H = Σ_s π(s) · H(next | s) over the empirical event-type
    transition matrix, with π taken as each state's share of observed
    transitions — how many bits the NEXT action carries once you know
    the current one, and 2^H as the effective branching factor
    ("behavior perplexity"). The conditional upgrade of the marginal
    event-type entropy: the gap between them is exactly the
    information the current state gives about the next.

    Scale shape: one per-user lead window, one hash agg to the
    |types|² transition matrix; everything after is arithmetic on
    ≤25 rows. Round 6 absorbs the two engines' summation orders.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("s"),
        F.lead("event_type").over(w).alias("t"),
    ).filter(F.col("t").isNotNull())
    cnt = seq.groupBy("s", "t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tots = cnt.groupBy("s").agg(F.sum("c").cast("long").alias("cs"))
    grand = cnt.agg(F.sum("c").cast("long").alias("g"))
    import math

    p = F.col("c").cast("double") / F.col("cs")
    rows_h = (
        cnt.join(F.broadcast(tots), "s")
        .groupBy("s", "cs")
        .agg(F.sum(-p * F.log(p) / math.log(2)).alias("h_row"))
    )
    return (
        rows_h.crossJoin(F.broadcast(grand))
        .agg(
            F.sum(
                (F.col("cs").cast("double") / F.col("g")) * F.col("h_row")
            ).alias("h")
        )
        .select(
            F.round("h", 6).alias("entropy_rate_bits"),
            F.round(F.pow(F.lit(2.0), F.col("h")), 6).alias(
                "behavior_perplexity"
            ),
        )
    )


# ---------------------------------------------------------------------------
# wave 109: functional-dependency audit, lognormal fit + GOF probes
# ---------------------------------------------------------------------------


@query(
    "functional_dependency_audit",
    oracle="""
    WITH cands AS (
        SELECT 'doc_id->lang' AS fd, CAST(doc_id AS VARCHAR) AS lhs,
               lang AS rhs
        FROM documents
        UNION ALL
        SELECT 'p_brand->p_type', p_brand, p_type FROM part
        UNION ALL
        SELECT 'p_type->p_brand', p_type, p_brand FROM part
        UNION ALL
        SELECT 'c_nationkey->c_mktsegment', CAST(c_nationkey AS VARCHAR),
               c_mktsegment
        FROM customer
    ), per_lhs AS (
        SELECT fd, lhs, CAST(COUNT(DISTINCT rhs) AS BIGINT) AS n_rhs,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM cands GROUP BY fd, lhs
    )
    SELECT fd,
           CAST(COUNT(*) AS BIGINT) AS n_lhs_values,
           CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_lhs,
           CAST(MAX(n_rhs) AS BIGINT) AS max_rhs_per_lhs,
           CAST(CASE WHEN SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0
                     THEN 1 ELSE 0 END AS BIGINT) AS holds
    FROM per_lhs GROUP BY fd
    """,
)
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery audit: for each candidate FD
    X→Y, count the X values that map to MORE than one Y — zero
    violators means the dependency holds in the data and is a
    candidate constraint / normalization opportunity; a handful of
    violators usually means dirty rows. The key dependency
    doc_id→lang is the positive control (holds by construction); the
    brand/type and nationkey/segment candidates genuinely fail — the
    audit separates them by evidence, not schema docs. Complements referential_integrity
    (inter-table) and data_expectations (declared row predicates)
    with the intra-table dependency dimension.

    Scale shape: each candidate is one hash agg keyed by (fd, lhs)
    with a distinct-count, then a |candidates|-row census; the union
    is map-side column projection. COUNT(DISTINCT) here is per-lhs
    (small groups), not global.
    """
    part = load_table(spark, sf_dir, "part")
    cust = load_table(spark, sf_dir, "customer")

    def cand(fd: str, df: DataFrame, lhs: str, rhs: str) -> DataFrame:
        return df.select(
            F.lit(fd).alias("fd"),
            F.col(lhs).cast("string").alias("lhs"),
            F.col(rhs).cast("string").alias("rhs"),
        )

    docs = load_table(spark, sf_dir, "documents")
    cands = (
        cand("doc_id->lang", docs, "doc_id", "lang")
        .unionByName(cand("p_brand->p_type", part, "p_brand", "p_type"))
        .unionByName(cand("p_type->p_brand", part, "p_type", "p_brand"))
        .unionByName(
            cand(
                "c_nationkey->c_mktsegment", cust, "c_nationkey", "c_mktsegment"
            )
        )
    )
    per_lhs = cands.groupBy("fd", "lhs").agg(
        F.countDistinct("rhs").cast("long").alias("n_rhs")
    )
    return per_lhs.groupBy("fd").agg(
        F.count(F.lit(1)).cast("long").alias("n_lhs_values"),
        F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_violating_lhs"),
        F.max("n_rhs").cast("long").alias("max_rhs_per_lhs"),
        F.when(
            F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0)) == 0, 1
        )
        .otherwise(0)
        .cast("long")
        .alias("holds"),
    )


@query(
    "lognormal_fit_gof",
    oracle="""
    WITH fit AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               AVG(ln(o_totalprice)) AS mu,
               stddev_pop(ln(o_totalprice)) AS sigma
        FROM orders GROUP BY o_orderpriority
    ), probes AS (
        SELECT * FROM (VALUES
            (0.1, -1.2815515655446004), (0.25, -0.6744897501960817),
            (0.5, 0.0), (0.75, 0.6744897501960817),
            (0.9, 1.2815515655446004)) z(p, z)
    ), q AS (
        SELECT f.o_orderpriority, f.n, f.mu, f.sigma, pr.p,
               exp(f.mu + f.sigma * pr.z) AS q_p
        FROM fit f, probes pr
    ), ecdf AS (
        SELECT q.o_orderpriority, q.p,
               CAST(SUM(CASE WHEN o.o_totalprice <= q.q_p THEN 1 ELSE 0 END)
                    AS DOUBLE) / ANY_VALUE(q.n) AS e
        FROM q JOIN orders o ON o.o_orderpriority = q.o_orderpriority
        GROUP BY q.o_orderpriority, q.p
    )
    SELECT f.o_orderpriority, f.n,
           ROUND(f.mu, 6) AS mu, ROUND(f.sigma, 6) AS sigma,
           ROUND((SELECT MAX(abs(e.e - e.p)) FROM ecdf e
                  WHERE e.o_orderpriority = f.o_orderpriority), 6)
               AS gof_max_dev
    FROM fit f
    """,
)
def lognormal_fit_gof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parametric distribution fitting with a goodness-of-fit probe:
    order totals per priority are fitted as lognormal by moment
    matching on the log scale (μ = mean ln x, σ = stddev_pop ln x),
    then the fit is CHECKED — the empirical CDF is evaluated at the
    five fitted quantiles exp(μ + σ·z_p) and the max |ECDF − p|
    deviation reported. A good lognormal fit keeps the deviation
    small at all probes; this is the 5-point KS discrepancy that
    costs two scans instead of a sort. The z_p constants are standard
    normal quantiles baked as literals on both engines.

    Scale shape: fit is one hash agg; the probe join fans each fact
    row to 5 probe comparisons within its own group (broadcast of
    |groups|×5 quantiles) and re-aggregates — map-side combinable,
    no sort, no global window. The subquery max is |groups|×5 rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    fit = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(F.log("o_totalprice")).alias("mu"),
        F.stddev_pop(F.log("o_totalprice")).alias("sigma"),
    )
    probes = spark.createDataFrame(
        [
            (0.1, -1.2815515655446004),
            (0.25, -0.6744897501960817),
            (0.5, 0.0),
            (0.75, 0.6744897501960817),
            (0.9, 1.2815515655446004),
        ],
        "p double, z double",
    )
    q = fit.crossJoin(F.broadcast(probes)).select(
        "o_orderpriority",
        "n",
        "p",
        (F.exp(F.col("mu") + F.col("sigma") * F.col("z"))).alias("q_p"),
    )
    ecdf = (
        orders.select("o_orderpriority", "o_totalprice")
        .join(F.broadcast(q), "o_orderpriority")
        .groupBy("o_orderpriority", "p")
        .agg(
            (
                F.sum(
                    F.when(F.col("o_totalprice") <= F.col("q_p"), 1).otherwise(
                        0
                    )
                ).cast("double")
                / F.first("n")
            ).alias("e")
        )
    )
    dev = ecdf.groupBy("o_orderpriority").agg(
        F.max(F.abs(F.col("e") - F.col("p"))).alias("dev")
    )
    return fit.join(F.broadcast(dev), "o_orderpriority").select(
        "o_orderpriority",
        "n",
        F.round("mu", 6).alias("mu"),
        F.round("sigma", 6).alias("sigma"),
        F.round("dev", 6).alias("gof_max_dev"),
    )


# ---------------------------------------------------------------------------
# wave 110: Theil inequality decomposition, rolling-origin backtest
# ---------------------------------------------------------------------------


@query(
    "theil_index_decomposition",
    oracle="""
    WITH spend AS (
        SELECT o.o_custkey,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS x
        FROM orders o GROUP BY o.o_custkey
    ), tagged AS (
        SELECT n.n_name, s.x
        FROM spend s
        JOIN customer c ON c.c_custkey = s.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    ), gstat AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS tot,
               AVG(CAST(x AS DOUBLE)) AS mu
        FROM tagged
    ), grp AS (
        SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_g,
               AVG(CAST(x AS DOUBLE)) AS mu_g,
               SUM(CAST(x AS DOUBLE) * ln(CAST(x AS DOUBLE)))
                   / SUM(CAST(x AS DOUBLE))
                   - ln(AVG(CAST(x AS DOUBLE))) AS t_g
        FROM tagged GROUP BY n_name
    ), within AS (
        SELECT SUM((CAST(n_g AS DOUBLE) / n) * (mu_g / mu) * t_g) AS w
        FROM grp, gstat
    ), between_c AS (
        SELECT SUM((CAST(n_g AS DOUBLE) / n) * (mu_g / mu)
                   * ln(mu_g / mu)) AS b
        FROM grp, gstat
    )
    SELECT component, label, theil FROM (
        SELECT 'between' AS component, 'all' AS label,
               ROUND(b, 6) AS theil, 0 AS ord
        FROM between_c
        UNION ALL
        SELECT 'within', 'all', ROUND(w, 6), 1 FROM within
        UNION ALL
        SELECT 'total', 'all', ROUND(b + w, 6), 2 FROM between_c, within
        UNION ALL
        SELECT 'group', n_name, ROUND(t_g, 6), 3 FROM grp
    )
    """,
)
def theil_index_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality index of customer spend with its EXACT
    between/within-nation decomposition: T = Σ(n_g/n)(μ_g/μ)ln(μ_g/μ)
    + Σ(n_g/n)(μ_g/μ)T_g — the additively-decomposable member of the
    inequality family (Gini and Lorenz measure concentration but do
    not split across groups), answering "how much customer-spend
    inequality is BETWEEN nations vs WITHIN them". The per-group
    Theil collapses to T_g = Σx·ln x / Σx − ln μ_g, so each group
    needs only single-level moment sums (no nested aggregates); the
    reported total is built from the two components so the
    decomposition identity holds to the digit on both engines.

    Scale shape: per-customer spend is one fact hash agg (exact
    integer cents); the group pass is one agg to |nations| rows; the
    rest is 25-row algebra. Nothing wide after the first agg.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    tagged = (
        spend.join(c, spend.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", "x")
    )
    glob = tagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(F.col("x").cast("double")).alias("mu"),
    )
    xd = F.col("x").cast("double")
    grp = tagged.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.avg(xd).alias("mu_g"),
        (
            F.sum(xd * F.log(xd)) / F.sum(xd) - F.log(F.avg(xd))
        ).alias("t_g"),
    )
    joined = grp.crossJoin(F.broadcast(glob))
    within = joined.agg(
        F.sum(
            (F.col("n_g").cast("double") / F.col("n"))
            * (F.col("mu_g") / F.col("mu"))
            * F.col("t_g")
        ).alias("w")
    )
    between_c = joined.agg(
        F.sum(
            (F.col("n_g").cast("double") / F.col("n"))
            * (F.col("mu_g") / F.col("mu"))
            * F.log(F.col("mu_g") / F.col("mu"))
        ).alias("b")
    )
    bw = between_c.crossJoin(F.broadcast(within))
    return (
        bw.select(
            F.lit("between").alias("component"),
            F.lit("all").alias("label"),
            F.round("b", 6).alias("theil"),
        )
        .unionByName(
            bw.select(
                F.lit("within").alias("component"),
                F.lit("all").alias("label"),
                F.round("w", 6).alias("theil"),
            )
        )
        .unionByName(
            bw.select(
                F.lit("total").alias("component"),
                F.lit("all").alias("label"),
                F.round(F.col("b") + F.col("w"), 6).alias("theil"),
            )
        )
        .unionByName(
            grp.select(
                F.lit("group").alias("component"),
                F.col("n_name").alias("label"),
                F.round("t_g", 6).alias("theil"),
            )
        )
    )


@query(
    "rolling_origin_backtest",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               ROUND(SUM(value), 6) AS y
        FROM events GROUP BY day
    ), horizon AS (
        SELECT MAX(day) AS max_day FROM daily
    ), origins AS (
        SELECT max_day - off AS origin
        FROM horizon, (VALUES (21), (14), (7)) o(off)
    ), test AS (
        SELECT o.origin, d.day, d.y,
               o.origin - 6 + ((d.day - o.origin - 1) % 7) AS ref_day
        FROM origins o JOIN daily d
          ON d.day > o.origin AND d.day <= o.origin + 7
    ), scored AS (
        SELECT t.origin, t.day, t.y, r.y AS yhat
        FROM test t JOIN daily r ON r.day = t.ref_day
    )
    SELECT origin, CAST(COUNT(*) AS BIGINT) AS n_test_days,
           ROUND(AVG(abs(y - yhat)), 6) AS mae,
           ROUND(AVG(2 * abs(y - yhat) / (abs(y) + abs(yhat))), 6) AS smape
    FROM scored GROUP BY origin
    """,
)
def rolling_origin_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest — the time-series cross-validation
    protocol that random k-fold gets WRONG (it leaks the future into
    training): three forecast origins a week apart, each scoring a
    seasonal-naive forecast (same weekday of the last pre-origin
    week) on the next 7 days, reporting MAE and sMAPE per origin.
    Where smape_seasonal_naive evaluates one whole-series fit, this
    measures how accuracy DRIFTS as the origin advances — the
    protocol you need before trusting any forecast in production.

    Determinism: daily totals round to 6 before scoring; day
    arithmetic is exact integers; the weekday mapping
    origin−6+((d−origin−1) mod 7) is pure integer math (mod of a
    positive argument, identical in both dialects).

    Scale shape: fact → |days| agg once; origins fan out as a
    broadcast 3-row join; scoring self-joins the days-bounded daily
    relation. Nothing fact-sized touches a window.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    daily = ev.groupBy(epoch_day("ts").alias("day")).agg(
        F.round(F.sum("value"), 6).alias("y")
    )
    horizon = daily.agg(F.max("day").alias("max_day"))
    offs = spark.createDataFrame([(21,), (14,), (7,)], "off int")
    origins = horizon.crossJoin(F.broadcast(offs)).select(
        (F.col("max_day") - F.col("off")).alias("origin")
    )
    test = daily.join(
        F.broadcast(origins),
        (F.col("day") > F.col("origin"))
        & (F.col("day") <= F.col("origin") + 7),
    ).select(
        "origin",
        "day",
        "y",
        (
            F.col("origin") - 6 + ((F.col("day") - F.col("origin") - 1) % 7)
        ).alias("ref_day"),
    )
    ref = daily.select(F.col("day").alias("ref_day"), F.col("y").alias("yhat"))
    scored = test.join(ref, "ref_day")
    return scored.groupBy("origin").agg(
        F.count(F.lit(1)).cast("long").alias("n_test_days"),
        F.round(F.avg(F.abs(F.col("y") - F.col("yhat"))), 6).alias("mae"),
        F.round(
            F.avg(
                2
                * F.abs(F.col("y") - F.col("yhat"))
                / (F.abs(F.col("y")) + F.abs(F.col("yhat")))
            ),
            6,
        ).alias("smape"),
    )


# ---------------------------------------------------------------------------
# wave 111: Misra-Gries heavy hitters, small-files compaction planner
# ---------------------------------------------------------------------------


@query("misra_gries_heavy_hitters")
def misra_gries_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy-hitter candidates over the document token
    stream with k=50 counters — the DETERMINISTIC-guarantee sketch
    beside Count-Min (probabilistic overestimate) and exact top-k
    (full key-space shuffle): every token with true frequency above
    the additive error bound is guaranteed in the output, and each
    reported count is a certified lower bound. Partition summaries
    hold k counters of state and MERGE by pointwise addition plus one
    decrement, so the shuffle carries |partitions|·k candidate rows —
    independent of vocabulary size. Rows-only by design: the
    candidate SET depends on partition layout; the containment
    guarantee does not (pinned against exact counts in
    tests/test_wave99s.py).

    See operators/sketches.py misra_gries for the error analysis.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens
    from pyspark_movie_recommender_spark.operators.sketches import misra_gries

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(ws_tokens(F.lower(F.col("text")))).alias("w")
    )
    return misra_gries(tok, "w", k=50)


@query(
    "compaction_plan_documents",
    oracle="""
    WITH files AS (
        SELECT source, lang, CAST(SUM(n_chars) AS BIGINT) AS bytes
        FROM documents GROUP BY source, lang
    )
    SELECT source, lang, bytes,
           CAST((SUM(bytes) OVER (PARTITION BY source ORDER BY lang
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - bytes) // 262144 AS BIGINT) AS out_file
    FROM files
    """,
)
def compaction_plan_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction planner (the OPTIMIZE/bin-packing step of
    table maintenance): each (source, lang) slice is a "file" of
    sum(n_chars) bytes; slices are packed IN ORDER into ~256 KiB
    output files by assigning each to bin ⌊cum_bytes_before/target⌋ —
    the one-pass next-fit packing that keeps every output within
    [target, target + max_input) bytes and never reorders data
    (preserving clustering). The physical-layout planning primitive
    beside zorder_layout_orders (clustering) and
    join_size_estimate (sizing).

    Scale shape: the file inventory is one hash agg (at real scale
    this reads table metadata, not data — rows are per-file, tiny);
    the packing cumsum windows per source over file-count-bounded
    partitions. Pure integer arithmetic, hash-exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    files = docs.groupBy("source", "lang").agg(
        F.sum("n_chars").cast("long").alias("bytes")
    )
    return files.select(
        "source",
        "lang",
        "bytes",
        F.expr(
            "(sum(bytes) OVER (PARTITION BY source ORDER BY lang"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            " - bytes) div 262144"
        )
        .cast("long")
        .alias("out_file"),
    )


# ---------------------------------------------------------------------------
# wave 112: randomized response, leakage-safe label construction
# ---------------------------------------------------------------------------


@query(
    "randomized_response_estimate",
    oracle="""
    WITH flags AS (
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS truth,
               ((c_custkey * 2654435761) % 4294967296) % 4 AS coin
        FROM customer
    ), reported AS (
        SELECT truth,
               CASE WHEN coin < 3 THEN truth ELSE 1 - truth END AS answer
        FROM flags
    ), c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(truth) AS BIGINT) AS k_true,
               CAST(SUM(answer) AS BIGINT) AS k_ans
        FROM reported
    )
    SELECT n, k_true, k_ans,
           ROUND(CAST(k_ans AS DOUBLE) / n, 6) AS raw_rate,
           ROUND((CAST(k_ans AS DOUBLE) / n - 0.25) / 0.5, 6)
               AS debiased_rate,
           ROUND(CAST(k_true AS DOUBLE) / n, 6) AS true_rate,
           ROUND(abs((CAST(k_ans AS DOUBLE) / n - 0.25) / 0.5
                     - CAST(k_true AS DOUBLE) / n), 6) AS abs_error
    FROM c
    """,
)
def randomized_response_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner's randomized response — the local-DP collection mechanism:
    each customer reports their sensitive bit (negative balance)
    truthfully with probability p=3/4 and flipped otherwise, and the
    aggregate debiases via π̂ = (rate − (1−p))/(2p−1). No row's true
    bit is inferable from its report (plausible deniability ln3-LDP),
    yet the population rate survives. The mechanism-side complement to
    the auditing queries (k-anonymity, l-diversity, DP noisy counts):
    those check a release, this CONSTRUCTS one. The "coin" is the
    Knuth-hash of the key so both engines flip identically — swap for
    a real RNG in production; the estimator algebra is unchanged.

    Scale shape: pure map-side bit arithmetic and one census agg.
    """
    cust = load_table(spark, sf_dir, "customer")
    flags = cust.select(
        F.when(F.col("c_acctbal") < 0, 1).otherwise(0).alias("truth"),
        (((F.col("c_custkey") * 2654435761) % 4294967296) % 4).alias("coin"),
    )
    reported = flags.select(
        "truth",
        F.when(F.col("coin") < 3, F.col("truth"))
        .otherwise(1 - F.col("truth"))
        .alias("answer"),
    )
    c = reported.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("truth").cast("long").alias("k_true"),
        F.sum("answer").cast("long").alias("k_ans"),
    )
    raw = F.col("k_ans").cast("double") / F.col("n")
    debiased = (raw - 0.25) / 0.5
    true_rate = F.col("k_true").cast("double") / F.col("n")
    return c.select(
        "n",
        "k_true",
        "k_ans",
        F.round(raw, 6).alias("raw_rate"),
        F.round(debiased, 6).alias("debiased_rate"),
        F.round(true_rate, 6).alias("true_rate"),
        F.round(F.abs(debiased - true_rate), 6).alias("abs_error"),
    )


@query(
    "leakage_safe_training_labels",
    oracle="""
    WITH bounds AS (
        SELECT MAX(CAST(epoch_us(ts) // 86400000000 AS BIGINT)) - 14
               AS snap_day
        FROM events
    ), pts AS (
        SELECT user_id, event_type,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        FROM events
    ), feats AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events_hist,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchases_hist,
               CAST(MIN(snap_day - day) AS BIGINT) AS days_since_last
        FROM pts, bounds WHERE day <= snap_day
        GROUP BY user_id
    ), labels AS (
        SELECT DISTINCT user_id, 1 AS label
        FROM pts, bounds
        WHERE day > snap_day AND day <= snap_day + 14
          AND event_type = 'purchase'
    )
    SELECT f.user_id, f.n_events_hist, f.n_purchases_hist,
           f.days_since_last,
           CAST(COALESCE(l.label, 0) AS BIGINT) AS label
    FROM feats f LEFT JOIN labels l ON f.user_id = l.user_id
    """,
)
def leakage_safe_training_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe supervised-label construction — the snapshot/horizon
    pattern every churn/propensity training set needs: pick a snapshot
    time T (14 days before the horizon so every user has a full label
    window), compute features STRICTLY from events ≤ T (history
    counts, recency), and the label STRICTLY from (T, T+14]
    (purchased in the horizon). Users with no pre-snapshot history are
    excluded (no features), users with no horizon activity get label
    0 — the construction split_leakage_audit verifies after the fact,
    done correctly by construction here.

    Scale shape: one tagging pass, one per-user feature agg, one
    distinct label set, one left join on user_id — all hash-partition
    on the same key, so AQE coalesces into a single co-partitioned
    pipeline. The snapshot bound is a broadcast scalar.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    pts = ev.select("user_id", "event_type", epoch_day("ts").alias("day"))
    bounds = pts.agg((F.max("day") - 14).alias("snap_day"))
    tagged = pts.crossJoin(F.broadcast(bounds))
    feats = (
        tagged.filter(F.col("day") <= F.col("snap_day"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events_hist"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("n_purchases_hist"),
            F.min(F.col("snap_day") - F.col("day"))
            .cast("long")
            .alias("days_since_last"),
        )
    )
    labels = (
        tagged.filter(
            (F.col("day") > F.col("snap_day"))
            & (F.col("day") <= F.col("snap_day") + 14)
            & (F.col("event_type") == "purchase")
        )
        .select("user_id")
        .distinct()
        .withColumn("label", F.lit(1))
    )
    return feats.join(labels, "user_id", "left").select(
        "user_id",
        "n_events_hist",
        "n_purchases_hist",
        "days_since_last",
        F.coalesce(F.col("label"), F.lit(0)).cast("long").alias("label"),
    )


# ---------------------------------------------------------------------------
# wave 113: 1-D Wasserstein drift, Brown-Forsythe variance test
# ---------------------------------------------------------------------------


@query(
    "wasserstein_value_drift",
    oracle="""
    WITH pts AS (
        SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
               CAST(ROUND(o_totalprice) AS BIGINT) AS v
        FROM orders
    ), bounds AS (
        SELECT (MIN(day) + MAX(day)) // 2 AS mid FROM pts
    ), tagged AS (
        SELECT CASE WHEN day < mid THEN 0 ELSE 1 END AS period, v
        FROM pts, bounds
    ), hist AS (
        SELECT v,
               CAST(SUM(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c0,
               CAST(SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c1
        FROM tagged GROUP BY v
    ), tot AS (
        SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1
        FROM hist
    ), cum AS (
        SELECT v,
               SUM(c0) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f0,
               SUM(c1) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
               LEAD(v) OVER (ORDER BY v) AS v_next
        FROM hist
    )
    SELECT n0, n1,
           ROUND(SUM(abs(CAST(f0 AS DOUBLE) / n0 - CAST(f1 AS DOUBLE) / n1)
                     * (v_next - v)), 4) AS w1_distance,
           ROUND(MAX(abs(CAST(f0 AS DOUBLE) / n0 - CAST(f1 AS DOUBLE) / n1)),
                 6) AS ks_distance
    FROM cum, tot WHERE v_next IS NOT NULL
    GROUP BY n0, n1
    """,
)
def wasserstein_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein (earth-mover) distance between the
    first-half and second-half order-value distributions:
    W₁ = ∫|F₀ − F₁| dv over the union support, computed as the
    CDF-gap × support-gap sum on the integer-dollar value histogram —
    the MAGNITUDE-aware drift measure the family lacked: KS reports
    the worst vertical gap (reported here too, as a cross-check
    against ks_drift), PSI needs arbitrary bins, CvM ranks; W₁ alone
    says "the typical order moved $X". Exact in 1-D — no Sinkhorn
    approximation needed.

    Scale shape: facts collapse to the value histogram (one hash agg);
    the CDF windows run over |distinct dollar values| rows. On a truly
    continuous measure, pre-bucket the grid (cents→dollars here) to
    bound the support — the knob is explicit, not hidden in bin
    defaults.
    """
    o = load_table(spark, sf_dir, "orders")
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    pts = o.select(
        epoch_day("o_orderdate").alias("day"),
        F.round(F.col("o_totalprice")).cast("long").alias("v"),
    )
    bounds = pts.agg(F.expr("(min(day) + max(day)) div 2").alias("mid"))
    tagged = pts.crossJoin(F.broadcast(bounds)).select(
        F.when(F.col("day") < F.col("mid"), 0).otherwise(1).alias("period"),
        "v",
    )
    hist = tagged.groupBy("v").agg(
        F.sum(F.when(F.col("period") == 0, 1).otherwise(0))
        .cast("long")
        .alias("c0"),
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
    )
    tot = hist.agg(
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "v",
        F.sum("c0").over(w).alias("f0"),
        F.sum("c1").over(w).alias("f1"),
        F.lead("v").over(Window.orderBy("v")).alias("v_next"),
    )
    gap = F.abs(
        F.col("f0").cast("double") / F.col("n0")
        - F.col("f1").cast("double") / F.col("n1")
    )
    return (
        cum.filter(F.col("v_next").isNotNull())
        .crossJoin(F.broadcast(tot))
        .groupBy("n0", "n1")
        .agg(
            F.round(F.sum(gap * (F.col("v_next") - F.col("v"))), 4).alias(
                "w1_distance"
            ),
            F.round(F.max(gap), 6).alias("ks_distance"),
        )
    )


@query(
    "brown_forsythe_variance_test",
    oracle="""
    WITH meds AS (
        SELECT o_orderpriority,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)
                   AS med
        FROM orders GROUP BY o_orderpriority
    ), z AS (
        SELECT o.o_orderpriority, abs(o.o_totalprice - m.med) AS z
        FROM orders o JOIN meds m USING (o_orderpriority)
    ), grp AS (
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_g,
               SUM(z) AS s_g, SUM(z * z) AS ss_g
        FROM z GROUP BY o_orderpriority
    ), tot AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
               SUM(s_g) AS s
        FROM grp
    )
    SELECT n, k,
           ROUND((CAST(n - k AS DOUBLE) / (k - 1))
                 * (SELECT SUM(n_g * (s_g/n_g - s/n) * (s_g/n_g - s/n))
                    FROM grp, tot)
                 / (SELECT SUM(ss_g - s_g*s_g/n_g) FROM grp), 6)
               AS f_statistic
    FROM tot
    """,
)
def brown_forsythe_variance_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test for equality of SPREAD across groups: a
    one-way ANOVA F on the absolute deviations from each group's
    MEDIAN, z = |x − med_g| — the robust variance-homogeneity check
    (Levene with medians) that should gate any pooled-variance
    analysis (the two-proportion z, the t-family, ANOVA itself). Mean
    tests say nothing when groups differ in spread, not location —
    this is the test for exactly that case.

    Determinism: group medians via percentile_disc pick actual data
    values identically on both engines; F comes from single-level
    moment sums of z per group, rounded to 6.

    Scale shape: medians per group (sort-based within group), one
    broadcast join of the |groups| medians back onto the facts, one
    moment agg per group — the same two-scan shape as
    lognormal_fit_gof. Nothing global-sorted.
    """
    orders = load_table(spark, sf_dir, "orders")
    meds = orders.groupBy("o_orderpriority").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("med")
    )
    z = orders.join(F.broadcast(meds), "o_orderpriority").select(
        "o_orderpriority",
        F.abs(F.col("o_totalprice") - F.col("med")).alias("z"),
    )
    grp = z.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("z").alias("s_g"),
        F.sum(F.col("z") * F.col("z")).alias("ss_g"),
    )
    tot = grp.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("s_g").alias("s"),
    )
    joined = grp.crossJoin(F.broadcast(tot))
    between = joined.agg(
        F.sum(
            F.col("n_g")
            * (F.col("s_g") / F.col("n_g") - F.col("s") / F.col("n"))
            * (F.col("s_g") / F.col("n_g") - F.col("s") / F.col("n"))
        ).alias("b")
    )
    within = joined.agg(
        F.sum(
            F.col("ss_g") - F.col("s_g") * F.col("s_g") / F.col("n_g")
        ).alias("wss")
    )
    return (
        tot.crossJoin(F.broadcast(between))
        .crossJoin(F.broadcast(within))
        .select(
            "n",
            "k",
            F.round(
                ((F.col("n") - F.col("k")).cast("double") / (F.col("k") - 1))
                * F.col("b")
                / F.col("wss"),
                6,
            ).alias("f_statistic"),
        )
    )


# ---------------------------------------------------------------------------
# wave 114: Fellegi-Sunter EM linkage weights, variance-ratio test
# ---------------------------------------------------------------------------


@query(
    "fellegi_sunter_em_linkage",
    oracle="""
    WITH pairs AS (
        SELECT CASE WHEN a.c_mktsegment = b.c_mktsegment
                    THEN 1 ELSE 0 END AS g1,
               CASE WHEN abs(a.c_acctbal - b.c_acctbal) < 500
                    THEN 1 ELSE 0 END AS g2,
               CASE WHEN (a.c_acctbal >= 0) = (b.c_acctbal >= 0)
                    THEN 1 ELSE 0 END AS g3
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    ), pat AS (
        SELECT g1, g2, g3, CAST(COUNT(*) AS BIGINT) AS n
        FROM pairs GROUP BY g1, g2, g3
    ), p0 AS (
        SELECT 0.1 AS p, 0.9 AS m1, 0.9 AS m2, 0.9 AS m3,
               0.1 AS u1, 0.1 AS u2, 0.1 AS u3
    ), e1 AS (
        SELECT g1, g2, g3, n,
               (p * (CASE WHEN g1=1 THEN m1 ELSE 1-m1 END)
                  * (CASE WHEN g2=1 THEN m2 ELSE 1-m2 END)
                  * (CASE WHEN g3=1 THEN m3 ELSE 1-m3 END))
               / (p * (CASE WHEN g1=1 THEN m1 ELSE 1-m1 END)
                    * (CASE WHEN g2=1 THEN m2 ELSE 1-m2 END)
                    * (CASE WHEN g3=1 THEN m3 ELSE 1-m3 END)
                  + (1-p) * (CASE WHEN g1=1 THEN u1 ELSE 1-u1 END)
                          * (CASE WHEN g2=1 THEN u2 ELSE 1-u2 END)
                          * (CASE WHEN g3=1 THEN u3 ELSE 1-u3 END)) AS w
        FROM pat, p0
    ), p1 AS (
        SELECT SUM(n*w)/SUM(n) AS p,
               SUM(n*w*g1)/SUM(n*w) AS m1, SUM(n*w*g2)/SUM(n*w) AS m2,
               SUM(n*w*g3)/SUM(n*w) AS m3,
               SUM(n*(1-w)*g1)/SUM(n*(1-w)) AS u1,
               SUM(n*(1-w)*g2)/SUM(n*(1-w)) AS u2,
               SUM(n*(1-w)*g3)/SUM(n*(1-w)) AS u3
        FROM e1
    ), e2 AS (
        SELECT g1, g2, g3, n,
               (p * (CASE WHEN g1=1 THEN m1 ELSE 1-m1 END)
                  * (CASE WHEN g2=1 THEN m2 ELSE 1-m2 END)
                  * (CASE WHEN g3=1 THEN m3 ELSE 1-m3 END))
               / (p * (CASE WHEN g1=1 THEN m1 ELSE 1-m1 END)
                    * (CASE WHEN g2=1 THEN m2 ELSE 1-m2 END)
                    * (CASE WHEN g3=1 THEN m3 ELSE 1-m3 END)
                  + (1-p) * (CASE WHEN g1=1 THEN u1 ELSE 1-u1 END)
                          * (CASE WHEN g2=1 THEN u2 ELSE 1-u2 END)
                          * (CASE WHEN g3=1 THEN u3 ELSE 1-u3 END)) AS w
        FROM pat, p1
    ), p2 AS (
        SELECT SUM(n*w)/SUM(n) AS p,
               SUM(n*w*g1)/SUM(n*w) AS m1, SUM(n*w*g2)/SUM(n*w) AS m2,
               SUM(n*w*g3)/SUM(n*w) AS m3,
               SUM(n*(1-w)*g1)/SUM(n*(1-w)) AS u1,
               SUM(n*(1-w)*g2)/SUM(n*(1-w)) AS u2,
               SUM(n*(1-w)*g3)/SUM(n*(1-w)) AS u3
        FROM e2
    ), e3 AS (
        SELECT g1, g2, g3, n,
               (p * (CASE WHEN g1=1 THEN m1 ELSE 1-m1 END)
                  * (CASE WHEN g2=1 THEN m2 ELSE 1-m2 END)
                  * (CASE WHEN g3=1 THEN m3 ELSE 1-m3 END))
               / (p * (CASE WHEN g1=1 THEN m1 ELSE 1-m1 END)
                    * (CASE WHEN g2=1 THEN m2 ELSE 1-m2 END)
                    * (CASE WHEN g3=1 THEN m3 ELSE 1-m3 END)
                  + (1-p) * (CASE WHEN g1=1 THEN u1 ELSE 1-u1 END)
                          * (CASE WHEN g2=1 THEN u2 ELSE 1-u2 END)
                          * (CASE WHEN g3=1 THEN u3 ELSE 1-u3 END)) AS w
        FROM pat, p2
    ), p3 AS (
        SELECT SUM(n*w)/SUM(n) AS p,
               SUM(n*w*g1)/SUM(n*w) AS m1, SUM(n*w*g2)/SUM(n*w) AS m2,
               SUM(n*w*g3)/SUM(n*w) AS m3,
               SUM(n*(1-w)*g1)/SUM(n*(1-w)) AS u1,
               SUM(n*(1-w)*g2)/SUM(n*(1-w)) AS u2,
               SUM(n*(1-w)*g3)/SUM(n*(1-w)) AS u3
        FROM e3
    )
    SELECT g1, g2, g3, n,
           ROUND((p * (CASE WHEN g1=1 THEN m1 ELSE 1-m1 END)
                    * (CASE WHEN g2=1 THEN m2 ELSE 1-m2 END)
                    * (CASE WHEN g3=1 THEN m3 ELSE 1-m3 END))
                 / (p * (CASE WHEN g1=1 THEN m1 ELSE 1-m1 END)
                      * (CASE WHEN g2=1 THEN m2 ELSE 1-m2 END)
                      * (CASE WHEN g3=1 THEN m3 ELSE 1-m3 END)
                    + (1-p) * (CASE WHEN g1=1 THEN u1 ELSE 1-u1 END)
                            * (CASE WHEN g2=1 THEN u2 ELSE 1-u2 END)
                            * (CASE WHEN g3=1 THEN u3 ELSE 1-u3 END)), 6)
               AS posterior_match,
           ROUND(ln(((CASE WHEN g1=1 THEN m1 ELSE 1-m1 END)
                     * (CASE WHEN g2=1 THEN m2 ELSE 1-m2 END)
                     * (CASE WHEN g3=1 THEN m3 ELSE 1-m3 END))
                    / ((CASE WHEN g1=1 THEN u1 ELSE 1-u1 END)
                       * (CASE WHEN g2=1 THEN u2 ELSE 1-u2 END)
                       * (CASE WHEN g3=1 THEN u3 ELSE 1-u3 END))), 6)
               AS match_weight
    FROM pat, p3
    """,
)
def fellegi_sunter_em_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage with EM-estimated
    m/u probabilities: nation-blocked customer pairs are reduced to
    their field-AGREEMENT PATTERNS (segment equality, balance within
    500, balance-sign equality → 8 patterns), and three EM rounds
    estimate each field's m (agreement prob among matches) and u
    (among non-matches) without any labeled pairs — yielding the
    classic log2-style match weight ln(P(γ|M)/P(γ|U)) and posterior
    per pattern. The STATISTICAL core of entity resolution that the
    deterministic entity_resolution_pipeline scores by hand-set
    weights; here the data chooses them. Oracle = the same three EM
    rounds unrolled as chained CTEs from the same (0.1, 0.9, 0.1)
    init.

    Scale shape: the only fact-sized steps are the blocked self-join
    (bounded by block sizes, the standard ER discipline) and the
    8-row pattern census; EM then iterates entirely on 8 rows × a
    1-row parameter relation. This is why FS-EM scales: the E/M steps
    never revisit pairs, only patterns.
    """
    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("ka"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("sa"),
        F.col("c_acctbal").alias("ba"),
    )
    b = cust.select(
        F.col("c_custkey").alias("kb"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("sb"),
        F.col("c_acctbal").alias("bb"),
    )
    pairs = a.join(b, "nk").filter(F.col("ka") < F.col("kb"))
    pat = (
        pairs.select(
            F.when(F.col("sa") == F.col("sb"), 1).otherwise(0).alias("g1"),
            F.when(F.abs(F.col("ba") - F.col("bb")) < 500, 1)
            .otherwise(0)
            .alias("g2"),
            F.when((F.col("ba") >= 0) == (F.col("bb") >= 0), 1)
            .otherwise(0)
            .alias("g3"),
        )
        .groupBy("g1", "g2", "g3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()
    )
    params = spark.createDataFrame(
        [(0.1, 0.9, 0.9, 0.9, 0.1, 0.1, 0.1)],
        "p double, m1 double, m2 double, m3 double,"
        " u1 double, u2 double, u3 double",
    )

    def lik(prefix: str):
        return (
            F.when(F.col("g1") == 1, F.col(f"{prefix}1")).otherwise(
                1 - F.col(f"{prefix}1")
            )
            * F.when(F.col("g2") == 1, F.col(f"{prefix}2")).otherwise(
                1 - F.col(f"{prefix}2")
            )
            * F.when(F.col("g3") == 1, F.col(f"{prefix}3")).otherwise(
                1 - F.col(f"{prefix}3")
            )
        )

    for _ in range(3):
        e = pat.crossJoin(F.broadcast(params)).select(
            "g1",
            "g2",
            "g3",
            "n",
            (
                F.col("p")
                * lik("m")
                / (F.col("p") * lik("m") + (1 - F.col("p")) * lik("u"))
            ).alias("w"),
        )
        nw = F.sum(F.col("n") * F.col("w"))
        nv = F.sum(F.col("n") * (1 - F.col("w")))
        params = e.agg(
            (nw / F.sum("n")).alias("p"),
            (F.sum(F.col("n") * F.col("w") * F.col("g1")) / nw).alias("m1"),
            (F.sum(F.col("n") * F.col("w") * F.col("g2")) / nw).alias("m2"),
            (F.sum(F.col("n") * F.col("w") * F.col("g3")) / nw).alias("m3"),
            (F.sum(F.col("n") * (1 - F.col("w")) * F.col("g1")) / nv).alias(
                "u1"
            ),
            (F.sum(F.col("n") * (1 - F.col("w")) * F.col("g2")) / nv).alias(
                "u2"
            ),
            (F.sum(F.col("n") * (1 - F.col("w")) * F.col("g3")) / nv).alias(
                "u3"
            ),
        ).localCheckpoint()
    return pat.crossJoin(F.broadcast(params)).select(
        "g1",
        "g2",
        "g3",
        "n",
        F.round(
            F.col("p")
            * lik("m")
            / (F.col("p") * lik("m") + (1 - F.col("p")) * lik("u")),
            6,
        ).alias("posterior_match"),
        F.round(F.log(lik("m") / lik("u")), 6).alias("match_weight"),
    )


@query(
    "variance_ratio_random_walk",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               ROUND(SUM(value), 6) AS y
        FROM events GROUP BY day
    ), diffs AS (
        SELECT day, y - LAG(y) OVER (ORDER BY day) AS r
        FROM daily
    ), q5 AS (
        SELECT day, r,
               SUM(r) OVER (ORDER BY day
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS r5,
               CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
        FROM diffs WHERE r IS NOT NULL
    ), v1 AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(r*r)/COUNT(*) - (SUM(r)/COUNT(*))*(SUM(r)/COUNT(*)) AS v
        FROM q5
    ), v5 AS (
        SELECT SUM(r5*r5)/COUNT(*) - (SUM(r5)/COUNT(*))*(SUM(r5)/COUNT(*))
                   AS v
        FROM q5 WHERE i >= 5
    )
    SELECT v1.n AS n_diffs,
           ROUND(v1.v, 6) AS var_1,
           ROUND(v5.v, 6) AS var_5,
           ROUND(v5.v / (5 * v1.v), 6) AS variance_ratio
    FROM v1, v5
    """,
)
def variance_ratio_random_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio diagnostic: is the daily event-value
    series a random walk? Under the null, the variance of 5-day
    overlapping changes equals 5× the one-day-change variance, so
    VR = Var(r₅)/(5·Var(r₁)) ≈ 1; VR > 1 means momentum (positive
    autocorrelation of increments), VR < 1 mean-reversion. The
    INCREMENT-domain complement to ACF (levels), CUSUM (level
    shifts), and the runs test (sign patterns).

    Determinism: daily sums round to 6; differences, overlapping
    5-sums, and population variances are fixed dags over them,
    rounded to 6.

    Scale shape: facts collapse to |days| rows in one agg; the lag,
    the rolling 5-sum, and both variances run on the days-bounded
    series. Nothing fact-sized is ordered.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    daily = ev.groupBy(epoch_day("ts").alias("day")).agg(
        F.round(F.sum("value"), 6).alias("y")
    )
    wd = Window.orderBy("day")
    diffs = daily.select(
        "day", (F.col("y") - F.lag("y").over(wd)).alias("r")
    ).filter(F.col("r").isNotNull())
    q5 = diffs.select(
        "r",
        F.sum("r").over(wd.rowsBetween(-4, 0)).alias("r5"),
        F.row_number().over(wd).cast("long").alias("i"),
    )
    v1 = q5.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.sum(F.col("r") * F.col("r")) / F.count(F.lit(1))
            - (F.sum("r") / F.count(F.lit(1)))
            * (F.sum("r") / F.count(F.lit(1)))
        ).alias("v"),
    )
    v5 = q5.filter(F.col("i") >= 5).agg(
        (
            F.sum(F.col("r5") * F.col("r5")) / F.count(F.lit(1))
            - (F.sum("r5") / F.count(F.lit(1)))
            * (F.sum("r5") / F.count(F.lit(1)))
        ).alias("v")
    )
    return v1.crossJoin(F.broadcast(v5.withColumnRenamed("v", "v5"))).select(
        F.col("n").alias("n_diffs"),
        F.round(F.col("v"), 6).alias("var_1"),
        F.round(F.col("v5"), 6).alias("var_5"),
        F.round(F.col("v5") / (5 * F.col("v")), 6).alias("variance_ratio"),
    )


# ---------------------------------------------------------------------------
# wave 115: foreachBatch CDC upsert stream
# ---------------------------------------------------------------------------


@query("streaming_cdc_upsert")
def streaming_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch MERGE-style CDC upsert (streaming/jobs.py
    cdc_upsert_stream): per-user last-writer-wins state accumulated
    across micro-batches with an associative max_by merge, so the
    final relation is independent of batch boundaries. Rows-only by
    design (streaming); the stream≡batch equivalence test pins it to
    the same last-event-per-user expression the oracle-checked
    cdc_latest_state family uses.
    """
    from pyspark_movie_recommender_spark.streaming.jobs import cdc_upsert_stream

    return cdc_upsert_stream(spark, sf_dir, query_name="q_cdc_upsert")


# ---------------------------------------------------------------------------
# wave 117: polymorphic UDTF in the registry, approx_top_k, LISTAGG
# ---------------------------------------------------------------------------


@query(
    "udtf_kv_columns_events",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events WHERE event_id < 200
    """,
)
def udtf_kv_columns_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The POLYMORPHIC UDTF as a registry citizen: kv_columns' output
    schema (one LONG column per requested key) is computed at plan
    time by its static ``analyze`` hook from the constant key list —
    the Spark 4 table-function tier behind dynamic pivots and
    configurable feature extractors (operators/udf_surface.py
    make_kv_columns_udtf). Here it shreds the events props JSON into
    a typed `k` column via LATERAL, oracle-checked against plain
    json_extract — a Python UDTF whose VALUES are gated, not just its
    row count.

    Scale shape: lateral UDTF is map-side (ArrowEvalPythonUDTF); the
    filter is pushed to the scan. The built-in from_json is the hot-
    path tool — this exercises the polymorphic-schema surface.
    """
    from pyspark_movie_recommender_spark.operators.udf_surface import (
        make_kv_columns_udtf,
    )

    spark.udtf.register("q_kv_columns", make_kv_columns_udtf())
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("q_kv_events")
    return spark.sql(
        "SELECT e.event_id, t.k"
        " FROM q_kv_events e, LATERAL q_kv_columns(e.props, 'k') t"
        " WHERE e.event_id < 200"
    )


@query("approx_topk_event_types")
def approx_topk_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_top_k`` (Spark 4's frequent-items sketch aggregate —
    space-saving style, the built-in sibling of the hand-rolled
    Misra-Gries operator): top-3 event types with approximate counts,
    exploded to scalar rows for the gate. Rows-only by design: the
    sketch's tie order is not contractual — but at this cardinality
    the COUNTS are exact, which the law test pins against exact
    groupBy counts (tests/test_wave99s.py).

    Scale shape: one sketch aggregate with map-side partials; the
    explode touches k rows.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.agg(F.expr("approx_top_k(event_type, 3)").alias("t"))
        .select(F.explode("t").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").cast("long").alias("cnt"),
        )
    )


@query(
    "listagg_cheapest_orders",
    oracle="""
    WITH ranked AS (
        SELECT o_orderpriority, o_orderkey, o_orderstatus,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) AS rn
        FROM orders
    )
    SELECT o_orderpriority,
           string_agg(o_orderstatus, ',' ORDER BY rn) AS status_seq
    FROM ranked WHERE rn <= 5
    GROUP BY o_orderpriority
    """,
)
def listagg_cheapest_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2023 LISTAGG ... WITHIN GROUP (new in Spark 4.0): the
    status sequence of each priority's five cheapest orders as one
    ordered CSV string — the standard's answer to the
    collect_list+array_join idiom (ordered_status_concat), with the
    ordering guarantee IN the aggregate instead of bolted on. The
    deterministic total order (price, orderkey) and the top-5 cap
    make the string reproducible cross-engine; DuckDB spells the same
    aggregate string_agg(... ORDER BY).

    Scale shape: WindowGroupLimit prunes to 5 rows per priority
    before the aggregate; the listagg state is 5 tiny strings per
    group.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    ranked = orders.select(
        "o_orderpriority",
        "o_orderstatus",
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") <= 5)
    return ranked.groupBy("o_orderpriority").agg(
        F.expr(
            "listagg(o_orderstatus, ',') WITHIN GROUP (ORDER BY rn)"
        ).alias("status_seq")
    )


# ---------------------------------------------------------------------------
# wave 118: MMR diversity re-ranking, covariance/correlation matrix
# ---------------------------------------------------------------------------


@query(
    "mmr_diverse_rerank",
    oracle="""
    WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    probes AS (SELECT * FROM s WHERE vec_id < 3),
    scored AS (
        SELECT p.vec_id AS probe_id, c.vec_id AS cid, c.e AS ce,
               ROUND(list_cosine_similarity(p.e, c.e), 6) AS rel
        FROM probes p JOIN s c ON c.vec_id <> p.vec_id
    ), cand AS (
        SELECT probe_id, cid, ce, rel FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                ORDER BY rel DESC, cid) AS rnk
            FROM scored
        ) WHERE rnk <= 8
    ), cc AS (
        SELECT a.probe_id, a.cid AS cid_a, b.cid AS cid_b,
               ROUND(list_cosine_similarity(a.ce, b.ce), 6) AS sim
        FROM cand a JOIN cand b
          ON a.probe_id = b.probe_id AND a.cid <> b.cid
    ), sel1 AS (
        SELECT probe_id, cid, rel AS score FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                ORDER BY rel DESC, cid) AS r
            FROM cand
        ) WHERE r = 1
    ), u2 AS (
        SELECT c.probe_id, c.cid,
               0.7 * c.rel - 0.3 * MAX(cc.sim) AS score
        FROM cand c
        JOIN sel1 s1 ON s1.probe_id = c.probe_id AND s1.cid <> c.cid
        JOIN cc ON cc.probe_id = c.probe_id AND cc.cid_a = c.cid
               AND cc.cid_b = s1.cid
        GROUP BY c.probe_id, c.cid, c.rel
    ), sel2 AS (
        SELECT probe_id, cid, score FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                ORDER BY score DESC, cid) AS r
            FROM u2
        ) WHERE r = 1
    ), u3 AS (
        SELECT c.probe_id, c.cid,
               0.7 * c.rel - 0.3 * MAX(cc.sim) AS score
        FROM cand c
        JOIN cc ON cc.probe_id = c.probe_id AND cc.cid_a = c.cid
        JOIN sel1 s1 ON s1.probe_id = c.probe_id
        JOIN sel2 s2 ON s2.probe_id = c.probe_id
        WHERE c.cid <> s1.cid AND c.cid <> s2.cid
          AND (cc.cid_b = s1.cid OR cc.cid_b = s2.cid)
        GROUP BY c.probe_id, c.cid, c.rel
    ), sel3 AS (
        SELECT probe_id, cid, score FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                ORDER BY score DESC, cid) AS r
            FROM u3
        ) WHERE r = 1
    )
    SELECT probe_id, CAST(1 AS BIGINT) AS rank, cid AS neighbor_id,
           ROUND(score, 6) AS mmr_score FROM sel1
    UNION ALL
    SELECT probe_id, 2, cid, ROUND(score, 6) FROM sel2
    UNION ALL
    SELECT probe_id, 3, cid, ROUND(score, 6) FROM sel3
    """,
)
def mmr_diverse_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking — the diversity stage a
    retrieval stack runs AFTER similarity search: from each probe's
    top-8 cosine candidates, greedily pick 3 maximizing
    0.7·relevance − 0.3·max-similarity-to-already-picked, so the
    second and third results stop being near-copies of the first.
    Completes the retrieval family (BM25 → RRF fusion → MRR/NDCG
    eval) with the redundancy-control member. Greedy steps are
    unrolled in the oracle; relevance and candidate-candidate
    similarities are rounded to 6 BEFORE scoring so both engines rank
    identical keys (ties by neighbor id).

    Scale shape: relevance reuses the probe-broadcast corpus-scan
    top-k (no corpus shuffle); the candidate-candidate similarity
    matrix and the greedy loop run on ≤8 rows per probe — the
    re-ranking stage is deliberately tiny, which is why MMR's
    sequential greed is fine at scale.
    """
    from pyspark_movie_recommender_spark.operators.similarity import (
        cosine_arrow,
        cosine_topk_bruteforce,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cand = (
        cosine_topk_bruteforce(
            emb, emb.filter(F.col("vec_id") < 3), "embedding", "vec_id", k=8
        )
        .select(
            "probe_id",
            F.col("neighbor_id").alias("cid"),
            F.col("sim").alias("rel"),
        )
        .localCheckpoint()
    )
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cos = cosine_arrow()
    cc = (
        cand.select("probe_id", F.col("cid").alias("cid_a"))
        .join(
            cand.select("probe_id", F.col("cid").alias("cid_b")), "probe_id"
        )
        .filter(F.col("cid_a") != F.col("cid_b"))
        .join(vecs.select(F.col("vec_id").alias("cid_a"), F.col("e").alias("ea")), "cid_a")
        .join(vecs.select(F.col("vec_id").alias("cid_b"), F.col("e").alias("eb")), "cid_b")
        .select(
            "probe_id",
            "cid_a",
            "cid_b",
            F.round(cos(F.col("ea"), F.col("eb")), 6).alias("sim"),
        )
        .localCheckpoint()
    )
    wp = Window.partitionBy("probe_id")
    sel = (
        cand.withColumn(
            "r", F.row_number().over(wp.orderBy(F.col("rel").desc(), "cid"))
        )
        .filter(F.col("r") == 1)
        .select("probe_id", "cid", F.col("rel").alias("score"),
                F.lit(1).cast("long").alias("rank"))
        .localCheckpoint()
    )
    for step in (2, 3):
        unsel = cand.join(sel.select("probe_id", "cid"), ["probe_id", "cid"],
                          "left_anti")
        maxsim = (
            cc.join(
                sel.select("probe_id", F.col("cid").alias("cid_b")),
                ["probe_id", "cid_b"],
            )
            .groupBy("probe_id", F.col("cid_a").alias("cid"))
            .agg(F.max("sim").alias("ms"))
        )
        scored = unsel.join(maxsim, ["probe_id", "cid"]).select(
            "probe_id",
            "cid",
            (0.7 * F.col("rel") - 0.3 * F.col("ms")).alias("score"),
        )
        pick = (
            scored.withColumn(
                "r",
                F.row_number().over(wp.orderBy(F.col("score").desc(), "cid")),
            )
            .filter(F.col("r") == 1)
            .select("probe_id", "cid", "score",
                    F.lit(step).cast("long").alias("rank"))
        )
        sel = sel.unionByName(pick).localCheckpoint()
    return sel.select(
        "probe_id",
        "rank",
        F.col("cid").alias("neighbor_id"),
        F.round("score", 6).alias("mmr_score"),
    )


@query(
    "covariance_matrix_lineitem",
    oracle="""
    WITH m AS (
        SELECT covar_pop(l_quantity, l_extendedprice) AS c12,
               covar_pop(l_quantity, l_discount) AS c13,
               covar_pop(l_quantity, l_tax) AS c14,
               covar_pop(l_extendedprice, l_discount) AS c23,
               covar_pop(l_extendedprice, l_tax) AS c24,
               covar_pop(l_discount, l_tax) AS c34,
               corr(l_quantity, l_extendedprice) AS r12,
               corr(l_quantity, l_discount) AS r13,
               corr(l_quantity, l_tax) AS r14,
               corr(l_extendedprice, l_discount) AS r23,
               corr(l_extendedprice, l_tax) AS r24,
               corr(l_discount, l_tax) AS r34
        FROM lineitem
    )
    SELECT 'quantity' AS col_a, 'extendedprice' AS col_b,
           ROUND(c12, 4) AS cov, ROUND(r12, 6) AS corr FROM m
    UNION ALL
    SELECT 'quantity', 'discount', ROUND(c13, 4), ROUND(r13, 6) FROM m
    UNION ALL
    SELECT 'quantity', 'tax', ROUND(c14, 4), ROUND(r14, 6) FROM m
    UNION ALL
    SELECT 'extendedprice', 'discount', ROUND(c23, 4), ROUND(r23, 6) FROM m
    UNION ALL
    SELECT 'extendedprice', 'tax', ROUND(c24, 4), ROUND(r24, 6) FROM m
    UNION ALL
    SELECT 'discount', 'tax', ROUND(c34, 4), ROUND(r34, 6) FROM m
    """,
)
def covariance_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise covariance/correlation matrix over the four numeric
    lineitem measures in ONE aggregation pass — the multivariate
    upgrade of stats_moments_lineitem (per-column) and the regr_*
    suite (one designated pair): all six covar_pop and corr pairs
    come from a single hash agg with map-side partials, then unpivot
    to the upper-triangle rows a feature-correlation report wants.

    Determinism: both engines implement the same single-pass
    co-moment updates; cov rounds to 4 (scale ~1e4), corr to 6.

    Scale shape: one scan, one 1-row agg, constant-size unpivot. The
    pattern scales to p columns as p(p−1)/2 agg expressions — still
    one pass, no self-join, no shuffle of facts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pairs = [
        ("quantity", "extendedprice"),
        ("quantity", "discount"),
        ("quantity", "tax"),
        ("extendedprice", "discount"),
        ("extendedprice", "tax"),
        ("discount", "tax"),
    ]
    aggs = []
    for a, b in pairs:
        aggs.append(
            F.covar_pop(F.col(f"l_{a}"), F.col(f"l_{b}")).alias(f"c_{a}_{b}")
        )
        aggs.append(
            F.corr(F.col(f"l_{a}"), F.col(f"l_{b}")).alias(f"r_{a}_{b}")
        )
    m = li.agg(*aggs)
    out = None
    for a, b in pairs:
        row = m.select(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.round(F.col(f"c_{a}_{b}"), 4).alias("cov"),
            F.round(F.col(f"r_{a}_{b}"), 6).alias("corr"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# wave 119: raking (IPF) weight calibration, Platt scaling
# ---------------------------------------------------------------------------


@query(
    "raking_ipf_weights",
    oracle="""
    WITH cust AS (
        SELECT r.r_name AS region, c.c_mktsegment AS seg
        FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
    ), cells AS (
        SELECT region, seg, CAST(COUNT(*) AS BIGINT) AS n
        FROM cust GROUP BY region, seg
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nc FROM cells
    ), ord AS (
        SELECT r.r_name AS region, c.c_mktsegment AS seg
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
    ), rowt AS (
        SELECT region, CAST(COUNT(*) AS DOUBLE)
               / (SELECT COUNT(*) FROM ord) * nc AS t
        FROM ord, tot GROUP BY region, nc
    ), colt AS (
        SELECT seg, CAST(COUNT(*) AS DOUBLE)
               / (SELECT COUNT(*) FROM ord) * nc AS t
        FROM ord, tot GROUP BY seg, nc
    ), w0 AS (
        SELECT region, seg, n, CAST(1.0 AS DOUBLE) AS w FROM cells
    ), r1 AS (
        SELECT w0.region, w0.seg, w0.n,
               w0.w * rowt.t
               / SUM(w0.n * w0.w) OVER (PARTITION BY w0.region) AS w
        FROM w0 JOIN rowt ON rowt.region = w0.region
    ), c1 AS (
        SELECT r1.region, r1.seg, r1.n,
               r1.w * colt.t
               / SUM(r1.n * r1.w) OVER (PARTITION BY r1.seg) AS w
        FROM r1 JOIN colt ON colt.seg = r1.seg
    ), r2 AS (
        SELECT c1.region, c1.seg, c1.n,
               c1.w * rowt.t
               / SUM(c1.n * c1.w) OVER (PARTITION BY c1.region) AS w
        FROM c1 JOIN rowt ON rowt.region = c1.region
    ), c2 AS (
        SELECT r2.region, r2.seg, r2.n,
               r2.w * colt.t
               / SUM(r2.n * r2.w) OVER (PARTITION BY r2.seg) AS w
        FROM r2 JOIN colt ON colt.seg = r2.seg
    ), r3 AS (
        SELECT c2.region, c2.seg, c2.n,
               c2.w * rowt.t
               / SUM(c2.n * c2.w) OVER (PARTITION BY c2.region) AS w
        FROM c2 JOIN rowt ON rowt.region = c2.region
    ), c3 AS (
        SELECT r3.region, r3.seg, r3.n,
               r3.w * colt.t
               / SUM(r3.n * r3.w) OVER (PARTITION BY r3.seg) AS w
        FROM r3 JOIN colt ON colt.seg = r3.seg
    )
    SELECT region, seg, n, ROUND(w, 6) AS weight
    FROM c3
    """,
)
def raking_ipf_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raking / iterative proportional fitting (Sinkhorn matrix
    scaling): per-(region, segment) customer-cell weights calibrated
    in 3 row/column rounds so the WEIGHTED customer margins match the
    order-activity margins — the survey-statistics calibration that
    reweights a sample to known population totals, and the same
    scaling loop that balances optimal-transport kernels. Each round
    multiplies cell weights by target/current margin; margins are
    per-row/per-column window sums over the |regions|×|segments|
    cell table.

    Scale shape: the two fact-sized passes are the customer-cell and
    order-margin counts (hash aggs); IPF then iterates on ~25 cell
    rows with window partitions of ≤5 rows. Round 6 absorbs the two
    engines' margin-summation orders.
    """
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders")
    cdim = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select(F.col("r_name").alias("region"),
                F.col("c_mktsegment").alias("seg"),
                "c_custkey")
    )
    cells = cdim.groupBy("region", "seg").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    nc = cells.agg(F.sum("n").cast("long").alias("nc"))
    od = orders.join(
        cdim.select("c_custkey", "region", "seg"),
        orders.o_custkey == cdim.c_custkey,
    )
    n_ord = od.count()  # driver scalar (margin normalizer), one tiny job
    rowt = (
        od.groupBy("region")
        .agg(F.count(F.lit(1)).alias("no"))
        .crossJoin(F.broadcast(nc))
        .select(
            "region",
            (F.col("no").cast("double") / n_ord * F.col("nc")).alias("t"),
        )
    )
    colt = (
        od.groupBy("seg")
        .agg(F.count(F.lit(1)).alias("no"))
        .crossJoin(F.broadcast(nc))
        .select(
            "seg",
            (F.col("no").cast("double") / n_ord * F.col("nc")).alias("t"),
        )
    )
    w = cells.withColumn("w", F.lit(1.0)).localCheckpoint()
    wr = Window.partitionBy("region")
    ws = Window.partitionBy("seg")
    for _ in range(3):
        w = (
            w.join(F.broadcast(rowt), "region")
            .select(
                "region", "seg", "n",
                (
                    F.col("w") * F.col("t")
                    / F.sum(F.col("n") * F.col("w")).over(wr)
                ).alias("w"),
            )
        )
        w = (
            w.join(F.broadcast(colt), "seg")
            .select(
                "region", "seg", "n",
                (
                    F.col("w") * F.col("t")
                    / F.sum(F.col("n") * F.col("w")).over(ws)
                ).alias("w"),
            )
            .localCheckpoint()
        )
    return w.select("region", "seg", "n", F.round("w", 6).alias("weight"))


@query(
    "platt_scaling_calibration",
    oracle="""
    WITH pts AS (
        SELECT o_totalprice / 100000 AS x,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1.0 ELSE 0.0 END
                   AS y
        FROM orders
    ), p0 AS (SELECT 0.0 AS a, 0.0 AS b),
    s1 AS (
        SELECT SUM(1/(1+exp(-(a + b*x))) - y) AS g1,
               SUM((1/(1+exp(-(a + b*x))) - y) * x) AS g2,
               SUM((1/(1+exp(-(a + b*x)))) * (1 - 1/(1+exp(-(a + b*x))))) AS h11,
               SUM((1/(1+exp(-(a + b*x)))) * (1 - 1/(1+exp(-(a + b*x)))) * x) AS h12,
               SUM((1/(1+exp(-(a + b*x)))) * (1 - 1/(1+exp(-(a + b*x)))) * x * x) AS h22,
               ANY_VALUE(a) AS a, ANY_VALUE(b) AS b
        FROM pts, p0
    ), p1 AS (
        SELECT a - ( h22*g1 - h12*g2) / (h11*h22 - h12*h12) AS a,
               b - (-h12*g1 + h11*g2) / (h11*h22 - h12*h12) AS b
        FROM s1
    ), s2 AS (
        SELECT SUM(1/(1+exp(-(a + b*x))) - y) AS g1,
               SUM((1/(1+exp(-(a + b*x))) - y) * x) AS g2,
               SUM((1/(1+exp(-(a + b*x)))) * (1 - 1/(1+exp(-(a + b*x))))) AS h11,
               SUM((1/(1+exp(-(a + b*x)))) * (1 - 1/(1+exp(-(a + b*x)))) * x) AS h12,
               SUM((1/(1+exp(-(a + b*x)))) * (1 - 1/(1+exp(-(a + b*x)))) * x * x) AS h22,
               ANY_VALUE(a) AS a, ANY_VALUE(b) AS b
        FROM pts, p1
    ), p2 AS (
        SELECT a - ( h22*g1 - h12*g2) / (h11*h22 - h12*h12) AS a,
               b - (-h12*g1 + h11*g2) / (h11*h22 - h12*h12) AS b
        FROM s2
    ), s3 AS (
        SELECT SUM(1/(1+exp(-(a + b*x))) - y) AS g1,
               SUM((1/(1+exp(-(a + b*x))) - y) * x) AS g2,
               SUM((1/(1+exp(-(a + b*x)))) * (1 - 1/(1+exp(-(a + b*x))))) AS h11,
               SUM((1/(1+exp(-(a + b*x)))) * (1 - 1/(1+exp(-(a + b*x)))) * x) AS h12,
               SUM((1/(1+exp(-(a + b*x)))) * (1 - 1/(1+exp(-(a + b*x)))) * x * x) AS h22,
               ANY_VALUE(a) AS a, ANY_VALUE(b) AS b
        FROM pts, p2
    ), p3 AS (
        SELECT a - ( h22*g1 - h12*g2) / (h11*h22 - h12*h12) AS a,
               b - (-h12*g1 + h11*g2) / (h11*h22 - h12*h12) AS b
        FROM s3
    ), fit AS (
        SELECT ROUND(a, 4) AS a, ROUND(b, 4) AS b FROM p3
    ), check_cal AS (
        SELECT ROUND(AVG(1/(1+exp(-(f.a + f.b*x)))), 4) AS mean_p,
               ROUND(AVG(y), 4) AS base_rate
        FROM pts, fit f
    )
    SELECT f.a, f.b, c.mean_p, c.base_rate
    FROM fit f, check_cal c
    """,
)
def platt_scaling_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Platt scaling — fit sigmoid(a + b·score) mapping a raw score
    (scaled order value) to a calibrated probability of the URGENT
    label, by three Newton-Raphson rounds with the 2×2 Hessian
    inverted in closed form. The calibration FITTER beside the
    calibration AUDIT (calibration_reliability_bins) and the
    monotone alternative (isotonic_fit): after fitting, the mean
    predicted probability must sit on the base rate (reported as the
    built-in check — Newton on logistic loss converges to the
    score-calibrated fixed point).

    Determinism: each Newton round is one hash agg of five sigmoid
    moment sums over the facts with an identical IEEE dag on both
    engines; three rounds from (0,0), outputs rounded to 4 (Newton
    amplifies last-bit summation noise, so 6 would be flaky).

    Scale shape: 3 full-data passes (one per round), each a map-side
    partial agg to one row — the standard distributed-Newton shape
    for low-dimension GLMs; no shuffle beyond the 1-row agg.
    """
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select(
        (F.col("o_totalprice") / 100000).alias("x"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1.0)
        .otherwise(0.0)
        .alias("y"),
    ).localCheckpoint()
    a_val, b_val = 0.0, 0.0
    # three Newton rounds, each one agg pass; (a, b) are driver-side
    # scalars exactly like the oracle's chained 1-row param CTEs
    for _ in range(3):
        p = 1 / (1 + F.exp(-(F.lit(a_val) + F.lit(b_val) * F.col("x"))))
        s = pts.agg(
            F.sum(p - F.col("y")).alias("g1"),
            F.sum((p - F.col("y")) * F.col("x")).alias("g2"),
            F.sum(p * (1 - p)).alias("h11"),
            F.sum(p * (1 - p) * F.col("x")).alias("h12"),
            F.sum(p * (1 - p) * F.col("x") * F.col("x")).alias("h22"),
        ).first()
        det = s.h11 * s.h22 - s.h12 * s.h12
        a_val = a_val - (s.h22 * s.g1 - s.h12 * s.g2) / det
        b_val = b_val - (-s.h12 * s.g1 + s.h11 * s.g2) / det
    p_fit = 1 / (1 + F.exp(-(F.lit(a_val) + F.lit(b_val) * F.col("x"))))
    fit = pts.agg(
        F.round(F.avg(p_fit), 4).alias("mean_p"),
        F.round(F.avg("y"), 4).alias("base_rate"),
    )
    return fit.select(
        F.round(F.lit(a_val), 4).alias("a"),
        F.round(F.lit(b_val), 4).alias("b"),
        "mean_p",
        "base_rate",
    )


# ---------------------------------------------------------------------------
# wave 120: doubly-robust (AIPW) treatment-effect estimator
# ---------------------------------------------------------------------------


@query(
    "doubly_robust_ate",
    oracle="""
    WITH pts AS (
        SELECT c.c_acctbal / 1000 AS x,
               CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1.0 ELSE 0.0 END
                   AS t,
               o.o_totalprice AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), p0 AS (SELECT 0.0 AS a, 0.0 AS b),
    s1 AS (
        SELECT SUM(1/(1+exp(-(a + b*x))) - t) AS g1,
               SUM((1/(1+exp(-(a + b*x))) - t) * x) AS g2,
               SUM((1/(1+exp(-(a + b*x)))) * (1 - 1/(1+exp(-(a + b*x))))) AS h11,
               SUM((1/(1+exp(-(a + b*x)))) * (1 - 1/(1+exp(-(a + b*x)))) * x) AS h12,
               SUM((1/(1+exp(-(a + b*x)))) * (1 - 1/(1+exp(-(a + b*x)))) * x * x) AS h22,
               ANY_VALUE(a) AS a, ANY_VALUE(b) AS b
        FROM pts, p0
    ), p1 AS (
        SELECT a - ( h22*g1 - h12*g2) / (h11*h22 - h12*h12) AS a,
               b - (-h12*g1 + h11*g2) / (h11*h22 - h12*h12) AS b
        FROM s1
    ), s2 AS (
        SELECT SUM(1/(1+exp(-(a + b*x))) - t) AS g1,
               SUM((1/(1+exp(-(a + b*x))) - t) * x) AS g2,
               SUM((1/(1+exp(-(a + b*x)))) * (1 - 1/(1+exp(-(a + b*x))))) AS h11,
               SUM((1/(1+exp(-(a + b*x)))) * (1 - 1/(1+exp(-(a + b*x)))) * x) AS h12,
               SUM((1/(1+exp(-(a + b*x)))) * (1 - 1/(1+exp(-(a + b*x)))) * x * x) AS h22,
               ANY_VALUE(a) AS a, ANY_VALUE(b) AS b
        FROM pts, p1
    ), p2 AS (
        SELECT a - ( h22*g1 - h12*g2) / (h11*h22 - h12*h12) AS a,
               b - (-h12*g1 + h11*g2) / (h11*h22 - h12*h12) AS b
        FROM s2
    ), s3 AS (
        SELECT SUM(1/(1+exp(-(a + b*x))) - t) AS g1,
               SUM((1/(1+exp(-(a + b*x))) - t) * x) AS g2,
               SUM((1/(1+exp(-(a + b*x)))) * (1 - 1/(1+exp(-(a + b*x))))) AS h11,
               SUM((1/(1+exp(-(a + b*x)))) * (1 - 1/(1+exp(-(a + b*x)))) * x) AS h12,
               SUM((1/(1+exp(-(a + b*x)))) * (1 - 1/(1+exp(-(a + b*x)))) * x * x) AS h22,
               ANY_VALUE(a) AS a, ANY_VALUE(b) AS b
        FROM pts, p2
    ), p3 AS (
        SELECT a - ( h22*g1 - h12*g2) / (h11*h22 - h12*h12) AS a,
               b - (-h12*g1 + h11*g2) / (h11*h22 - h12*h12) AS b
        FROM s3
    ), om AS (
        SELECT regr_intercept(y, x) FILTER (WHERE t = 1) AS i1,
               regr_slope(y, x) FILTER (WHERE t = 1) AS sl1,
               regr_intercept(y, x) FILTER (WHERE t = 0) AS i0,
               regr_slope(y, x) FILTER (WHERE t = 0) AS sl0
        FROM pts
    ), scored AS (
        SELECT t, y,
               i1 + sl1 * x AS m1,
               i0 + sl0 * x AS m0,
               greatest(0.01, least(0.99, 1/(1+exp(-(a + b*x))))) AS e
        FROM pts, p3, om
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(CASE WHEN t = 1 THEN y END)
                 - AVG(CASE WHEN t = 0 THEN y END), 4) AS naive_diff,
           ROUND(AVG(m1 - m0), 4) AS regression_ate,
           ROUND(AVG(m1 - m0
                     + t * (y - m1) / e
                     - (1 - t) * (y - m0) / (1 - e)), 4) AS aipw_ate
    FROM scored
    """,
)
def doubly_robust_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust (AIPW) average treatment effect of URGENT priority
    on order value, adjusting for customer balance: propensity
    e(x) from a 3-round distributed-Newton logistic (clipped to
    [0.01, 0.99]), per-arm outcome models from closed-form OLS
    (regr_intercept/regr_slope with FILTER), combined as
    m₁−m₀ + t(y−m₁)/e − (1−t)(y−m₀)/(1−e) — consistent if EITHER
    model is right, the modern default the causal family
    (DiD, CUPED, stratification, QTE) was missing. The naive
    difference and the regression-only ATE are reported beside it so
    the adjustment is visible.

    Determinism: Newton rounds are identical IEEE dags over the same
    rounded-input sums on both engines (same construction as
    platt_scaling_calibration); the clip bounds the 1/e
    amplification; outputs round to 4.

    Scale shape: one join + three 5-sum agg passes (one per Newton
    round, map-side partials) + one closed-form OLS agg + one final
    scoring agg. Nothing wide; the model parameters are driver-side
    scalars like the oracle's 1-row param CTEs.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    pts = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            (F.col("c_acctbal") / 1000).alias("x"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1.0)
            .otherwise(0.0)
            .alias("t"),
            F.col("o_totalprice").alias("y"),
        )
        .localCheckpoint()
    )
    a_val, b_val = 0.0, 0.0
    for _ in range(3):
        p = 1 / (1 + F.exp(-(F.lit(a_val) + F.lit(b_val) * F.col("x"))))
        s = pts.agg(
            F.sum(p - F.col("t")).alias("g1"),
            F.sum((p - F.col("t")) * F.col("x")).alias("g2"),
            F.sum(p * (1 - p)).alias("h11"),
            F.sum(p * (1 - p) * F.col("x")).alias("h12"),
            F.sum(p * (1 - p) * F.col("x") * F.col("x")).alias("h22"),
        ).first()
        det = s.h11 * s.h22 - s.h12 * s.h12
        a_val = a_val - (s.h22 * s.g1 - s.h12 * s.g2) / det
        b_val = b_val - (-s.h12 * s.g1 + s.h11 * s.g2) / det
    om = pts.agg(
        F.expr("regr_intercept(y, x) FILTER (WHERE t = 1)").alias("i1"),
        F.expr("regr_slope(y, x) FILTER (WHERE t = 1)").alias("sl1"),
        F.expr("regr_intercept(y, x) FILTER (WHERE t = 0)").alias("i0"),
        F.expr("regr_slope(y, x) FILTER (WHERE t = 0)").alias("sl0"),
    )
    e = F.greatest(
        F.lit(0.01),
        F.least(
            F.lit(0.99),
            1 / (1 + F.exp(-(F.lit(a_val) + F.lit(b_val) * F.col("x")))),
        ),
    )
    scored = pts.crossJoin(F.broadcast(om)).select(
        "t",
        "y",
        (F.col("i1") + F.col("sl1") * F.col("x")).alias("m1"),
        (F.col("i0") + F.col("sl0") * F.col("x")).alias("m0"),
        e.alias("e"),
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.avg(F.when(F.col("t") == 1, F.col("y")))
            - F.avg(F.when(F.col("t") == 0, F.col("y"))),
            4,
        ).alias("naive_diff"),
        F.round(F.avg(F.col("m1") - F.col("m0")), 4).alias("regression_ate"),
        F.round(
            F.avg(
                F.col("m1")
                - F.col("m0")
                + F.col("t") * (F.col("y") - F.col("m1")) / F.col("e")
                - (1 - F.col("t"))
                * (F.col("y") - F.col("m0"))
                / (1 - F.col("e"))
            ),
            4,
        ).alias("aipw_ate"),
    )


# ---------------------------------------------------------------------------
# wave 121: MLM masking plan, hierarchical forecast reconciliation
# ---------------------------------------------------------------------------


@query(
    "mlm_masking_plan",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(lower(trim(text)), '\\s+') END AS t
        FROM documents
    ), pos AS (
        SELECT doc_id, len(t) AS n_tokens,
               unnest(generate_series(1, len(t))) AS i
        FROM tok
    ), marked AS (
        SELECT doc_id, n_tokens, i,
               CASE WHEN ((doc_id * 1000003 + i) * 2654435761)
                         % 4294967296 % 100 < 15
                    THEN 1 ELSE 0 END AS masked
        FROM pos
    )
    SELECT doc_id,
           CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(masked) AS BIGINT) AS n_masked,
           CAST(COALESCE(MIN(CASE WHEN masked = 1 THEN i END), 0) AS BIGINT)
               AS first_mask_pos
    FROM marked GROUP BY doc_id
    """,
)
def mlm_masking_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked-language-model training-example planning: a DETERMINISTIC
    15% token mask per document via the keyed Knuth hash
    ((doc_id·1000003 + position)·2654435761 mod 2³²) mod 100 < 15 —
    reproducible across engines, executors, and reruns, which is what
    makes masking auditable (the same doc always yields the same
    example) and resumable (no RNG state to checkpoint). Reports the
    per-doc token count, mask count, and first masked position; the
    companion augmentation ops (token_dropout_augment,
    negative_sampling_pairs) use the same hash-not-RNG discipline.

    Scale shape: position fan-out is map-side (in-row sequence →
    per-position hash bit), one hash agg per doc. At 100 TB the mask
    column is computed at scan speed; no shuffle beyond the doc agg.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", ws_tokens(F.lower(F.col("text"))).alias("t")
    )
    marked = toks.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.expr(
            "filter(transform(sequence(1, size(t)),"
            " i -> IF(((doc_id * 1000003 + i) * 2654435761)"
            "        % 4294967296 % 100 < 15, i, -1)), p -> p > 0)"
        ).alias("mask_pos"),
    )
    return marked.select(
        "doc_id",
        "n_tokens",
        F.size("mask_pos").cast("long").alias("n_masked"),
        F.coalesce(
            F.expr("CASE WHEN size(mask_pos) > 0 THEN mask_pos[0] END"),
            F.lit(0),
        )
        .cast("long")
        .alias("first_mask_pos"),
    )


@query(
    "forecast_reconciliation",
    oracle="""
    WITH daily AS (
        SELECT r.r_name AS region,
               CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY region, day
    ), horizon AS (
        SELECT MAX(day) AS max_day FROM daily
    ), bottom AS (
        SELECT region,
               CAST(SUM(CASE WHEN day > max_day - 7 THEN cents ELSE 0 END)
                    AS BIGINT) AS fc_bottom
        FROM daily, horizon GROUP BY region
    ), top AS (
        SELECT CAST(SUM(fc_bottom) AS BIGINT) AS bu_total FROM bottom
    ), hist AS (
        SELECT region, CAST(SUM(cents) AS BIGINT) AS hist_cents FROM daily
        GROUP BY region
    ), hist_tot AS (
        SELECT CAST(SUM(hist_cents) AS BIGINT) AS h FROM hist
    )
    SELECT b.region, b.fc_bottom,
           CAST(CAST(t.bu_total AS HUGEINT) * h2.hist_cents // h1.h
                AS BIGINT) AS fc_topdown,
           CAST(b.fc_bottom
                - CAST(t.bu_total AS HUGEINT) * h2.hist_cents // h1.h
                AS BIGINT) AS coherence_gap
    FROM bottom b, top t, hist_tot h1
    JOIN hist h2 ON h2.region = b.region
    """,
)
def forecast_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical forecast reconciliation, bottom-up vs top-down:
    each region's naive next-week forecast (last 7 days of revenue,
    integer cents) versus the total forecast re-split by historical
    revenue share — the coherence problem every hierarchy of
    forecasts has (regional numbers MUST sum to the total the CFO
    sees), reported as the per-region gap between the two coherent
    methods. Integer-exact: the top-down split uses floor-div on
    cents so both engines produce identical allocations.

    Scale shape: one fact agg to |regions|×|days|; everything after
    is arithmetic on ≤5-row relations. The reconciliation itself is
    metadata-scale — exactly why it belongs in the warehouse, not a
    notebook.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            epoch_day("o_orderdate").alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    horizon = daily.agg(F.max("day").alias("max_day"))
    tagged = daily.crossJoin(F.broadcast(horizon))
    bottom = tagged.groupBy("region").agg(
        F.sum(
            F.when(F.col("day") > F.col("max_day") - 7, F.col("cents"))
            .otherwise(0)
        )
        .cast("long")
        .alias("fc_bottom")
    )
    top = bottom.agg(F.sum("fc_bottom").cast("long").alias("bu_total"))
    hist = daily.groupBy("region").agg(
        F.sum("cents").cast("long").alias("hist_cents")
    )
    hist_tot = hist.agg(F.sum("hist_cents").cast("long").alias("h"))
    return (
        bottom.join(hist, "region")
        .crossJoin(F.broadcast(top))
        .crossJoin(F.broadcast(hist_tot))
        .select(
            "region",
            "fc_bottom",
            # 128-bit product (cents × cents overflows INT64): exact
            # floor-div via (p − p mod h)/h on DECIMAL(38,0)
            F.expr(
                "CAST((CAST(bu_total AS DECIMAL(38,0)) * hist_cents"
                " - (CAST(bu_total AS DECIMAL(38,0)) * hist_cents) % h)"
                " / h AS BIGINT)"
            ).alias("fc_topdown"),
            F.expr(
                "fc_bottom - CAST((CAST(bu_total AS DECIMAL(38,0))"
                " * hist_cents - (CAST(bu_total AS DECIMAL(38,0))"
                " * hist_cents) % h) / h AS BIGINT)"
            ).alias("coherence_gap"),
        )
    )


# ---------------------------------------------------------------------------
# wave 122: weight-of-evidence/IV encoding, out-of-fold target encoding
# ---------------------------------------------------------------------------


@query(
    "woe_iv_encoding",
    oracle="""
    WITH pts AS (
        SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS bad
        FROM orders
    ), b AS (
        SELECT bucket,
               CAST(COUNT(*) - SUM(bad) AS BIGINT) AS n_good,
               CAST(SUM(bad) AS BIGINT) AS n_bad
        FROM pts GROUP BY bucket
    ), tot AS (
        SELECT CAST(SUM(n_good) AS BIGINT) AS g,
               CAST(SUM(n_bad) AS BIGINT) AS bb
        FROM b
    ), woe AS (
        SELECT bucket, n_good, n_bad,
               ln(((n_good + 0.5) / (g + 0.5)) / ((n_bad + 0.5) / (bb + 0.5)))
                   AS w,
               (CAST(n_good AS DOUBLE) / g - CAST(n_bad AS DOUBLE) / bb) AS d
        FROM b, tot
    )
    SELECT bucket, n_good, n_bad,
           ROUND(w, 6) AS woe,
           ROUND((SELECT SUM(w2.d * w2.w) FROM woe w2), 6) AS iv_total
    FROM woe
    """,
)
def woe_iv_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence encoding with total Information Value — the
    credit-risk-scoring feature transform: each order-value bucket's
    WoE = ln(good-share/bad-share) (0.5-smoothed against empty
    cells), and IV = Σ(Δshare·WoE) grading the whole variable's
    predictive power (rule of thumb: IV < 0.02 useless, > 0.5
    suspicious). The supervised cousin of the unsupervised bucketing
    family (histogram, ntile, quantile-normalize): buckets are scored
    BY the label.

    Scale shape: one map-side bucket tag + hash agg to |buckets|
    rows; WoE/IV is arithmetic on that tiny relation with the totals
    broadcast. Round 6 on both the per-bucket WoE and the IV sum.
    """
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select(
        F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bucket"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("bad"),
    )
    b = pts.groupBy("bucket").agg(
        (F.count(F.lit(1)) - F.sum("bad")).cast("long").alias("n_good"),
        F.sum("bad").cast("long").alias("n_bad"),
    )
    tot = b.agg(
        F.sum("n_good").cast("long").alias("g"),
        F.sum("n_bad").cast("long").alias("bb"),
    )
    woe = b.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_good",
        "n_bad",
        F.log(
            ((F.col("n_good") + 0.5) / (F.col("g") + 0.5))
            / ((F.col("n_bad") + 0.5) / (F.col("bb") + 0.5))
        ).alias("w"),
        (
            F.col("n_good").cast("double") / F.col("g")
            - F.col("n_bad").cast("double") / F.col("bb")
        ).alias("d"),
    )
    iv = woe.agg(F.sum(F.col("d") * F.col("w")).alias("iv"))
    return woe.crossJoin(F.broadcast(iv)).select(
        "bucket",
        "n_good",
        "n_bad",
        F.round("w", 6).alias("woe"),
        F.round("iv", 6).alias("iv_total"),
    )


@query(
    "oof_target_encoding",
    oracle="""
    WITH pts AS (
        SELECT c.c_mktsegment AS cat,
               o.o_orderkey % 5 AS fold,
               CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), cell AS (
        SELECT cat, fold, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS s
        FROM pts GROUP BY cat, fold
    ), catt AS (
        SELECT cat, CAST(SUM(n) AS BIGINT) AS n_cat,
               CAST(SUM(s) AS BIGINT) AS s_cat
        FROM cell GROUP BY cat
    )
    SELECT c.cat, CAST(c.fold AS BIGINT) AS fold, c.n,
           ROUND(CAST(t.s_cat - c.s AS DOUBLE) / (t.n_cat - c.n), 6)
               AS oof_rate,
           ROUND(CAST(t.s_cat AS DOUBLE) / t.n_cat, 6) AS full_rate
    FROM cell c JOIN catt t ON t.cat = c.cat
    """,
)
def oof_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding — the leakage-PROOF version of the
    most leakage-prone feature transform there is: each (category,
    fold) cell's encoding is the category's label mean computed
    EXCLUDING that fold ((S_cat − s_cell)/(N_cat − n_cell)), so no
    row's own label ever reaches its own feature. The full-data rate
    rides along to show exactly what naive target encoding would have
    leaked. Complements leakage_safe_training_labels (time
    dimension) with the fold dimension; folds are the deterministic
    orderkey % 5 hash split.

    Scale shape: one hash agg to |cats|×|folds| cells, a second to
    |cats| — the leave-one-out means need only those two exact-
    integer relations joined, never a per-row self-exclusion scan.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    pts = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("cat"),
        (F.col("o_orderkey") % 5).alias("fold"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("y"),
    )
    cell = pts.groupBy("cat", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    catt = cell.groupBy("cat").agg(
        F.sum("n").cast("long").alias("n_cat"),
        F.sum("s").cast("long").alias("s_cat"),
    )
    return cell.join(F.broadcast(catt), "cat").select(
        "cat",
        F.col("fold").cast("long").alias("fold"),
        "n",
        F.round(
            (F.col("s_cat") - F.col("s")).cast("double")
            / (F.col("n_cat") - F.col("n")),
            6,
        ).alias("oof_rate"),
        F.round(
            F.col("s_cat").cast("double") / F.col("n_cat"), 6
        ).alias("full_rate"),
    )


# ---------------------------------------------------------------------------
# wave 123: Bradley-Terry strengths, emerging-term burst detection
# ---------------------------------------------------------------------------


@query(
    "bradley_terry_priorities",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
               o_orderpriority AS team, CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY day, team
    ), duel AS (
        SELECT a.team AS ta, b.team AS tb,
               CAST(SUM(CASE WHEN a.c > b.c THEN 1 ELSE 0 END) AS BIGINT)
                   AS wins
        FROM daily a JOIN daily b
          ON a.day = b.day AND a.team <> b.team
        GROUP BY ta, tb
    ), games AS (
        SELECT d.ta, d.tb, d.wins, d.wins + r.wins AS n_games
        FROM duel d JOIN duel r ON r.ta = d.tb AND r.tb = d.ta
    ), wtot AS (
        SELECT ta AS team, CAST(SUM(wins) AS BIGINT) AS w
        FROM games GROUP BY ta
    ), it0 AS (
        SELECT team, w, CAST(1.0 AS DOUBLE) AS s FROM wtot
    ), r1 AS (
        SELECT i.team, i.w,
               i.w / SUM(g.n_games / (i.s + j.s)) AS s
        FROM it0 i
        JOIN games g ON g.ta = i.team
        JOIN it0 j ON j.team = g.tb
        GROUP BY i.team, i.w, i.s
    ), it1 AS (
        SELECT team, w, s / (SELECT SUM(s) FROM r1) * 5 AS s FROM r1
    ), r2 AS (
        SELECT i.team, i.w,
               i.w / SUM(g.n_games / (i.s + j.s)) AS s
        FROM it1 i
        JOIN games g ON g.ta = i.team
        JOIN it1 j ON j.team = g.tb
        GROUP BY i.team, i.w, i.s
    ), it2 AS (
        SELECT team, w, s / (SELECT SUM(s) FROM r2) * 5 AS s FROM r2
    ), r3 AS (
        SELECT i.team, i.w,
               i.w / SUM(g.n_games / (i.s + j.s)) AS s
        FROM it2 i
        JOIN games g ON g.ta = i.team
        JOIN it2 j ON j.team = g.tb
        GROUP BY i.team, i.w, i.s
    ), it3 AS (
        SELECT team, w, s / (SELECT SUM(s) FROM r3) * 5 AS s FROM r3
    )
    SELECT team, w AS total_wins, ROUND(s, 6) AS strength FROM it3
    """,
)
def bradley_terry_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry paired-comparison strengths via the MM algorithm:
    order priorities "duel" daily (more orders that day wins), and
    three minorization-maximization rounds s_i ← W_i / Σ_j n_ij/(s_i+s_j)
    (normalized to Σs = |teams| each round) turn the pairwise win
    matrix into a strength scale — the principled ranking for ANY
    pairwise-outcome data (LLM preference pairs, A/B duels, match
    results) where simple win-rate ignores opponent strength. The
    preference_pairs_by_quality query produces exactly the kind of
    data this model consumes.

    Scale shape: the fact-sized work is the daily count agg and the
    day-keyed duel join (|teams|² per day, teams tiny); MM iterates
    on the |teams|²-row game matrix. Oracle unrolls the same three
    rounds.
    """
    orders = load_table(spark, sf_dir, "orders")
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    daily = orders.groupBy(
        epoch_day("o_orderdate").alias("day"),
        F.col("o_orderpriority").alias("team"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = daily.select(
        F.col("day"), F.col("team").alias("ta"), F.col("c").alias("ca")
    )
    b = daily.select(
        F.col("day"), F.col("team").alias("tb"), F.col("c").alias("cb")
    )
    duel = (
        a.join(b, "day")
        .filter(F.col("ta") != F.col("tb"))
        .groupBy("ta", "tb")
        .agg(
            F.sum(F.when(F.col("ca") > F.col("cb"), 1).otherwise(0))
            .cast("long")
            .alias("wins")
        )
    )
    rev = duel.select(
        F.col("ta").alias("tb"), F.col("tb").alias("ta"),
        F.col("wins").alias("rwins"),
    )
    games = duel.join(rev, ["ta", "tb"]).select(
        "ta", "tb", "wins", (F.col("wins") + F.col("rwins")).alias("n_games")
    ).localCheckpoint()
    wtot = games.groupBy(F.col("ta").alias("team")).agg(
        F.sum("wins").cast("long").alias("w")
    )
    s = wtot.withColumn("s", F.lit(1.0)).localCheckpoint()
    n_teams = s.count()
    for _ in range(3):
        joined = (
            games.join(
                s.select(F.col("team").alias("ta"), "w",
                         F.col("s").alias("si")),
                "ta",
            )
            .join(
                s.select(F.col("team").alias("tb"), F.col("s").alias("sj")),
                "tb",
            )
            .groupBy(F.col("ta").alias("team"), "w")
            .agg(
                (
                    F.first("w")
                    / F.sum(F.col("n_games") / (F.col("si") + F.col("sj")))
                ).alias("s")
            )
            .select("team", "w", "s")
        )
        tot = joined.agg(F.sum("s").alias("ts"))
        s = (
            joined.crossJoin(F.broadcast(tot))
            .select(
                "team", "w",
                (F.col("s") / F.col("ts") * n_teams).alias("s"),
            )
            .localCheckpoint()
        )
    return s.select(
        "team", F.col("w").alias("total_wins"), F.round("s", 6).alias("strength")
    )


@query(
    "burst_terms_weekly",
    oracle="""
    WITH tok AS (
        SELECT doc_id % 28 AS pseudo_day,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        FROM documents WHERE trim(text) <> ''
    ), tagged AS (
        SELECT CASE WHEN pseudo_day >= 21 THEN 1 ELSE 0 END AS recent, w
        FROM tok
    ), cnt AS (
        SELECT w, CAST(SUM(recent) AS BIGINT) AS a,
               CAST(SUM(1 - recent) AS BIGINT) AS b
        FROM tagged GROUP BY w
    ), tot AS (
        SELECT CAST(SUM(a) AS BIGINT) AS ta, CAST(SUM(b) AS BIGINT) AS tb
        FROM cnt
    ), scored AS (
        SELECT w, a, b,
               ROUND((CAST(a AS DOUBLE)/ta - CAST(b AS DOUBLE)/tb)
                 / sqrt((CAST(a + b AS DOUBLE)/(ta + tb))
                        * (1 - CAST(a + b AS DOUBLE)/(ta + tb))
                        * (1.0/ta + 1.0/tb)), 6) AS z
        FROM cnt, tot WHERE a + b >= 20
    )
    SELECT w AS term, a AS recent_count, b AS past_count, z
    FROM scored
    ORDER BY z DESC, term LIMIT 20
    """,
)
def burst_terms_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emerging-term detection: which vocabulary is BURSTING in the
    most recent week of the corpus relative to its history? Each
    term's recent-vs-past share difference is scored with the pooled
    two-proportion z (the same statistic as the A/B tests, applied
    per term with a min-support floor), top-20 by z — the temporal
    twin of G² source keyness (which compares sources, not periods),
    and the lightweight version of Kleinberg burst states. The
    "week" is the deterministic doc_id-derived pseudo-day so the
    fixture exercises the shape.

    Determinism: counts exact; z rounded to 6 BEFORE the top-20
    ranking (term tie-break), so both engines cut the same list.

    Scale shape: explode → (recent, w) tag map-side → one vocab-sized
    hash agg; scoring is arithmetic on vocab rows; top-20 is
    TakeOrderedAndProject, no global sort.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    tagged = docs.select(
        F.when(F.col("doc_id") % 28 >= 21, 1).otherwise(0).alias("recent"),
        F.explode(ws_tokens(F.lower(F.col("text")))).alias("w"),
    )
    cnt = tagged.groupBy("w").agg(
        F.sum("recent").cast("long").alias("a"),
        F.sum(1 - F.col("recent")).cast("long").alias("b"),
    )
    tot = cnt.agg(
        F.sum("a").cast("long").alias("ta"),
        F.sum("b").cast("long").alias("tb"),
    )
    pa = F.col("a").cast("double") / F.col("ta")
    pb = F.col("b").cast("double") / F.col("tb")
    pp = (F.col("a") + F.col("b")).cast("double") / (
        F.col("ta") + F.col("tb")
    )
    scored = (
        cnt.filter(F.col("a") + F.col("b") >= 20)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("w").alias("term"),
            F.col("a").alias("recent_count"),
            F.col("b").alias("past_count"),
            F.round(
                (pa - pb)
                / F.sqrt(
                    pp * (1 - pp) * (1.0 / F.col("ta") + 1.0 / F.col("tb"))
                ),
                6,
            ).alias("z"),
        )
    )
    return scored.orderBy(F.col("z").desc(), "term").limit(20)


# ---------------------------------------------------------------------------
# wave 124: Huber IRLS robust regression, journey variant census
# ---------------------------------------------------------------------------


@query(
    "huber_irls_regression",
    oracle="""
    WITH pts AS (
        SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
    ), ols AS (
        SELECT regr_slope(y, x) AS b, regr_intercept(y, x) AS a FROM pts
    ), scale_est AS (
        SELECT 1.4826 * percentile_disc(0.5) WITHIN GROUP (
                   ORDER BY abs(y - (a + b*x))) AS s
        FROM pts, ols
    ), w1 AS (
        SELECT x, y,
               least(1.0, 1.345 * s / abs(y - (a + b*x))) AS w
        FROM pts, ols, scale_est WHERE abs(y - (a + b*x)) > 0
    ), f1 AS (
        SELECT (SUM(w*x*y) - SUM(w*x)*SUM(w*y)/SUM(w))
               / (SUM(w*x*x) - SUM(w*x)*SUM(w*x)/SUM(w)) AS b,
               SUM(w*y)/SUM(w)
               - (SUM(w*x*y) - SUM(w*x)*SUM(w*y)/SUM(w))
                 / (SUM(w*x*x) - SUM(w*x)*SUM(w*x)/SUM(w))
                 * SUM(w*x)/SUM(w) AS a
        FROM w1
    ), w2 AS (
        SELECT x, y,
               least(1.0, 1.345 * s / abs(y - (a + b*x))) AS w
        FROM pts, f1, scale_est WHERE abs(y - (a + b*x)) > 0
    ), f2 AS (
        SELECT (SUM(w*x*y) - SUM(w*x)*SUM(w*y)/SUM(w))
               / (SUM(w*x*x) - SUM(w*x)*SUM(w*x)/SUM(w)) AS b,
               SUM(w*y)/SUM(w)
               - (SUM(w*x*y) - SUM(w*x)*SUM(w*y)/SUM(w))
                 / (SUM(w*x*x) - SUM(w*x)*SUM(w*x)/SUM(w))
                 * SUM(w*x)/SUM(w) AS a
        FROM w2
    )
    SELECT ROUND(o.a, 4) AS ols_intercept, ROUND(o.b, 4) AS ols_slope,
           ROUND(f.a, 4) AS huber_intercept, ROUND(f.b, 4) AS huber_slope,
           ROUND(se.s, 4) AS resid_scale
    FROM ols o, f2 f, scale_est se
    """,
)
def huber_irls_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber M-estimation by iteratively reweighted least squares:
    start from OLS, estimate the residual scale robustly
    (1.4826·MAD), then two IRLS rounds where each point's weight is
    min(1, 1.345·s/|r|) — outliers get down-weighted smoothly instead
    of OLS's quadratic thrall or Theil-Sen's full rank machinery.
    The practical middle of the robust-regression family:
    weighted-OLS closed forms mean every round is ONE moment-sum agg,
    no sorting beyond the single MAD percentile.

    Determinism: MAD uses percentile_disc (an actual data value);
    weighted moment sums are fixed dags; both engines run identical
    rounds; outputs round to 4 (IRLS amplifies summation noise like
    Newton does).

    Scale shape: one OLS agg, one MAD percentile, two
    weighted-moment agg passes — four scans with map-side partials,
    parameters as broadcast scalars. The standard distributed-IRLS
    shape for low-dimensional robust fits.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    ).localCheckpoint()
    ols = pts.agg(
        F.expr("regr_slope(y, x)").alias("b"),
        F.expr("regr_intercept(y, x)").alias("a"),
    ).first()
    a0, b0 = ols.a, ols.b
    s = pts.select(
        F.abs(F.col("y") - (F.lit(a0) + F.lit(b0) * F.col("x"))).alias("r")
    ).agg(
        F.expr(
            "1.4826 * percentile_disc(0.5) WITHIN GROUP (ORDER BY r)"
        ).alias("s")
    ).first().s
    a_cur, b_cur = a0, b0
    for _ in range(2):
        r = F.abs(F.col("y") - (F.lit(a_cur) + F.lit(b_cur) * F.col("x")))
        w = F.least(F.lit(1.0), F.lit(1.345 * s) / r)
        m = (
            pts.filter(r > 0)
            .select("x", "y", w.alias("w"))
            .agg(
                F.sum(F.col("w") * F.col("x") * F.col("y")).alias("sxy"),
                F.sum(F.col("w") * F.col("x")).alias("sx"),
                F.sum(F.col("w") * F.col("y")).alias("sy"),
                F.sum(F.col("w") * F.col("x") * F.col("x")).alias("sxx"),
                F.sum("w").alias("sw"),
            )
            .first()
        )
        b_cur = (m.sxy - m.sx * m.sy / m.sw) / (m.sxx - m.sx * m.sx / m.sw)
        a_cur = m.sy / m.sw - b_cur * m.sx / m.sw
    return pts.sparkSession.createDataFrame(
        [
            (
                round(a0, 4),
                round(b0, 4),
                round(a_cur, 4),
                round(b_cur, 4),
                round(s, 4),
            )
        ],
        "ols_intercept double, ols_slope double, huber_intercept double,"
        " huber_slope double, resid_scale double",
    )


@query(
    "journey_variant_census",
    oracle="""
    WITH seqs AS (
        SELECT user_id,
               list_aggregate(list(event_type ORDER BY ts, event_id),
                              'string_agg', '>') AS variant
        FROM events GROUP BY user_id
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM seqs
    ), census AS (
        SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_cases
        FROM seqs GROUP BY variant
    )
    SELECT variant, n_cases,
           CAST(n_cases * 1000000 // n_users AS BIGINT) AS share_ppm
    FROM census, tot
    ORDER BY n_cases DESC, variant LIMIT 10
    """,
)
def journey_variant_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-mining case-variant census: each user's COMPLETE
    time-ordered event-type path as one variant string, counted and
    ranked — the "how many distinct ways do users actually move
    through the product" view that the transition matrix (pairs) and
    trigram paths (windows) aggregate away. Real logs concentrate:
    a handful of variants usually cover most cases, and the tail is
    where process exceptions hide.

    Scale shape: one ordered collect per user (journey-bounded), one
    hash agg over variant strings, top-10 via TakeOrderedAndProject.
    For very long journeys, hash the variant string map-side and
    carry the hash through the census instead.
    """
    ev = load_table(spark, sf_dir, "events")
    seqs = ev.groupBy("user_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "named_struct('ts', ts, 'eid', event_id, 'et', event_type))),"
            " x -> x.et), '>')"
        ).alias("variant")
    )
    tot = seqs.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    census = seqs.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_cases")
    )
    return (
        census.crossJoin(F.broadcast(tot))
        .select(
            "variant",
            "n_cases",
            F.expr("n_cases * 1000000L div n_users")
            .cast("long")
            .alias("share_ppm"),
        )
        .orderBy(F.col("n_cases").desc(), "variant")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# wave 125: RAKE keyphrase extraction, two-way fixed-effects estimator
# ---------------------------------------------------------------------------


@query(
    "rake_keyphrases",
    oracle="""
    WITH tok AS (
        SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
        FROM (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents WHERE trim(text) <> ''
        )
    ), flagged AS (
        SELECT doc_id, i, t[i] AS w,
               CASE WHEN list_contains(['the','a','and','of','to'], t[i])
                    THEN 1 ELSE 0 END AS stop
        FROM tok
    ), isl AS (
        SELECT doc_id, i, w, grp FROM (
            SELECT doc_id, i, w, stop,
                   SUM(stop) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS grp
            FROM flagged
        ) WHERE stop = 0
    ), phr AS (
        SELECT doc_id, grp,
               string_agg(w, ' ' ORDER BY i) AS phrase,
               CAST(COUNT(*) AS BIGINT) AS plen
        FROM isl GROUP BY doc_id, grp
        HAVING COUNT(*) <= 4
    ), members AS (
        SELECT p.doc_id, p.grp, p.phrase, p.plen, il.w
        FROM phr p JOIN isl il
          ON il.doc_id = p.doc_id AND il.grp = p.grp
    ), wstat AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(plen) AS BIGINT) AS degree
        FROM members GROUP BY w
    ), scored AS (
        SELECT m.doc_id, m.grp, m.phrase,
               SUM(CAST(ws.degree AS DOUBLE) / ws.freq) AS score
        FROM members m JOIN wstat ws ON ws.w = m.w
        GROUP BY m.doc_id, m.grp, m.phrase
    ), census AS (
        SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               ROUND(ANY_VALUE(score), 6) AS rake_score
        FROM scored GROUP BY phrase
    )
    SELECT phrase, n_occurrences, rake_score
    FROM census
    ORDER BY rake_score DESC, phrase LIMIT 15
    """,
)
def rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rapid Automatic Keyword Extraction):
    token streams split at stopwords into candidate phrases (runs of
    ≤4 content words), each scored Σ degree(w)/freq(w) over member
    words — degree rewards words that travel in long phrases, freq
    normalizes ubiquity — and the corpus-level top-15 reported. The
    phrase-level extraction that TF-IDF (unigram), PMI (bigram), and
    G² (per-term) don't provide; phrase instances share one corpus
    score, so ANY_VALUE per distinct phrase is sound.

    Determinism: phrase building is integer gaps-and-islands; word
    stats are exact counts; scores are sums of exact-integer ratios
    rounded to 6 before the top-15 cut (phrase tie-break).

    Scale shape: position explode with per-doc windows (doc-bounded
    partitions), phrase and word stats as hash aggs, a broadcast-able
    word-stat join (vocab-sized), TakeOrderedAndProject for the cut.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    pos = docs.select(
        "doc_id",
        F.posexplode(ws_tokens(F.lower(F.col("text")))).alias("p", "w"),
    ).select("doc_id", (F.col("p") + 1).alias("i"), "w")
    flagged = pos.select(
        "doc_id",
        "i",
        "w",
        F.when(F.col("w").isin("the", "a", "and", "of", "to"), 1)
        .otherwise(0)
        .alias("stop"),
    )
    wd = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = (
        flagged.select(
            "doc_id", "i", "w", F.sum("stop").over(wd).alias("grp"), "stop"
        )
        .filter(F.col("stop") == 0)
        .drop("stop")
    )
    phr = (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "named_struct('i', i, 'w', w))), x -> x.w), ' ')"
            ).alias("phrase"),
            F.count(F.lit(1)).cast("long").alias("plen"),
        )
        .filter(F.col("plen") <= 4)
    )
    members = phr.join(isl, ["doc_id", "grp"]).select(
        "doc_id", "grp", "phrase", "plen", "w"
    )
    wstat = members.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("degree"),
    )
    scored = (
        members.join(F.broadcast(wstat), "w")
        .groupBy("doc_id", "grp", "phrase")
        .agg(
            F.sum(F.col("degree").cast("double") / F.col("freq")).alias(
                "score"
            )
        )
    )
    census = scored.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.round(F.first("score"), 6).alias("rake_score"),
    )
    return census.orderBy(F.col("rake_score").desc(), "phrase").limit(15)


@query(
    "two_way_fixed_effects",
    oracle="""
    WITH pts AS (
        SELECT n.n_name AS entity,
               CAST(date_trunc('month', o.o_orderdate) AS DATE) AS period,
               c.c_acctbal AS x, o.o_totalprice AS y
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    ), em AS (
        SELECT entity, AVG(x) AS xe, AVG(y) AS ye FROM pts GROUP BY entity
    ), tm AS (
        SELECT period, AVG(x) AS xt, AVG(y) AS yt FROM pts GROUP BY period
    ), gm AS (
        SELECT AVG(x) AS xg, AVG(y) AS yg FROM pts
    ), demeaned AS (
        SELECT p.x - em.xe - tm.xt + gm.xg AS xd,
               p.y - em.ye - tm.yt + gm.yg AS yd,
               p.x, p.y
        FROM pts p
        JOIN em ON em.entity = p.entity
        JOIN tm ON tm.period = p.period, gm
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(xd * yd) / SUM(xd * xd), 6) AS fe_slope,
           ROUND((COUNT(*) * SUM(x*y) - SUM(x)*SUM(y))
                 / (COUNT(*) * SUM(x*x) - SUM(x)*SUM(x)), 6) AS pooled_slope
    FROM demeaned
    """,
)
def two_way_fixed_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way fixed-effects (within) estimator: the slope of order
    value on customer balance after sweeping out nation effects AND
    month effects by double demeaning (x − x̄ᵢ − x̄ₜ + x̄) — the panel
    econometrician's workhorse that kills any confounder constant
    within a nation or within a month, which the pooled OLS slope
    (reported beside it) happily absorbs. Completes the causal
    family's fixed-effects corner next to DiD (two groups × two
    periods — this is the N×T generalization).

    Determinism: group means and the final moment sums are
    single-level aggregates; round 6.

    Scale shape: two small mean tables broadcast back onto the facts
    (entity and period cardinalities are tiny), one demeaned moment
    agg with map-side partials. No shuffle of facts beyond the first
    join.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    pts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("entity"),
            F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias(
                "period"
            ),
            F.col("c_acctbal").alias("x"),
            F.col("o_totalprice").alias("y"),
        )
    )
    em = pts.groupBy("entity").agg(
        F.avg("x").alias("xe"), F.avg("y").alias("ye")
    )
    tm = pts.groupBy("period").agg(
        F.avg("x").alias("xt"), F.avg("y").alias("yt")
    )
    gm = pts.agg(F.avg("x").alias("xg"), F.avg("y").alias("yg"))
    d = (
        pts.join(F.broadcast(em), "entity")
        .join(F.broadcast(tm), "period")
        .crossJoin(F.broadcast(gm))
        .select(
            (F.col("x") - F.col("xe") - F.col("xt") + F.col("xg")).alias(
                "xd"
            ),
            (F.col("y") - F.col("ye") - F.col("yt") + F.col("yg")).alias(
                "yd"
            ),
            "x",
            "y",
        )
    )
    nn = F.count(F.lit(1))
    return d.agg(
        nn.cast("long").alias("n"),
        F.round(
            F.sum(F.col("xd") * F.col("yd"))
            / F.sum(F.col("xd") * F.col("xd")),
            6,
        ).alias("fe_slope"),
        F.round(
            (nn * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / (nn * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")),
            6,
        ).alias("pooled_slope"),
    )


# ---------------------------------------------------------------------------
# wave 126: instrumental-variables Wald/2SLS, regression discontinuity
# ---------------------------------------------------------------------------


@query(
    "iv_wald_2sls",
    oracle="""
    WITH pts AS (
        SELECT CAST(c.c_nationkey % 2 AS DOUBLE) AS z,
               c.c_acctbal AS x, o.o_totalprice AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(covar_pop(z, x), 6) AS first_stage_cov,
           ROUND(covar_pop(z, y) / covar_pop(z, x), 6) AS iv_slope,
           ROUND(covar_pop(x, y) / var_pop(x), 6) AS ols_slope,
           ROUND(covar_pop(z, x) / var_pop(z), 6) AS first_stage_slope
    FROM pts
    """,
)
def iv_wald_2sls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instrumental-variables estimation, single-instrument Wald/2SLS
    form: β_IV = cov(Z,Y)/cov(Z,X) — when the regressor X is
    endogenous (correlated with the error), an instrument Z that
    moves X but touches Y only THROUGH X identifies the causal slope
    OLS cannot. Reported beside the OLS slope and the first-stage
    slope/covariance (a near-zero first stage flags a weak
    instrument — the diagnostic that must gate any IV claim). The
    nationkey-parity instrument is the fixture's stand-in for a real
    encouragement/assignment variable.

    Scale shape: one join, one agg of covariance moments with
    map-side partials — the entire estimator is five co-moment sums.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    pts = o.join(c, o.o_custkey == c.c_custkey).select(
        (F.col("c_nationkey") % 2).cast("double").alias("z"),
        F.col("c_acctbal").alias("x"),
        F.col("o_totalprice").alias("y"),
    )
    return pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.covar_pop("z", "x"), 6).alias("first_stage_cov"),
        F.round(F.covar_pop("z", "y") / F.covar_pop("z", "x"), 6).alias(
            "iv_slope"
        ),
        F.round(F.covar_pop("x", "y") / F.var_pop("x"), 6).alias("ols_slope"),
        F.round(F.covar_pop("z", "x") / F.var_pop("z"), 6).alias(
            "first_stage_slope"
        ),
    )


@query(
    "regression_discontinuity",
    oracle="""
    WITH pts AS (
        SELECT c.c_acctbal AS r, o.o_totalprice AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE abs(c.c_acctbal) <= 2000
    ), fits AS (
        SELECT regr_intercept(y, r) FILTER (WHERE r < 0) AS a_left,
               regr_slope(y, r) FILTER (WHERE r < 0) AS b_left,
               regr_intercept(y, r) FILTER (WHERE r >= 0) AS a_right,
               regr_slope(y, r) FILTER (WHERE r >= 0) AS b_right,
               CAST(COUNT(*) FILTER (WHERE r < 0) AS BIGINT) AS n_left,
               CAST(COUNT(*) FILTER (WHERE r >= 0) AS BIGINT) AS n_right
        FROM pts
    )
    SELECT n_left, n_right,
           ROUND(a_left, 4) AS intercept_left,
           ROUND(a_right, 4) AS intercept_right,
           ROUND(b_left, 6) AS slope_left,
           ROUND(b_right, 6) AS slope_right,
           ROUND(a_right - a_left, 4) AS rdd_jump
    FROM fits
    """,
)
def regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression-discontinuity design: local linear fits on
    each side of the zero-balance cutoff within a ±2000 bandwidth,
    with the treatment-effect estimate read off as the jump between
    the two intercepts AT the cutoff — the quasi-experimental design
    for threshold-assigned treatments (credit granted at a score,
    discounts above a spend), where units just left and just right
    of the cutoff are as-good-as-randomized. Side sample sizes ride
    along (imbalance near the cutoff is the classic manipulation
    red flag a McCrary test formalizes).

    Scale shape: the bandwidth predicate is PUSHED TO THE SCAN (only
    the window around the cutoff is ever read); both side-fits come
    from one FILTERed closed-form OLS agg — a single pass.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    pts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .filter(F.abs(F.col("c_acctbal")) <= 2000)
        .select(F.col("c_acctbal").alias("r"), F.col("o_totalprice").alias("y"))
    )
    fits = pts.agg(
        F.expr("regr_intercept(y, r) FILTER (WHERE r < 0)").alias("a_left"),
        F.expr("regr_slope(y, r) FILTER (WHERE r < 0)").alias("b_left"),
        F.expr("regr_intercept(y, r) FILTER (WHERE r >= 0)").alias("a_right"),
        F.expr("regr_slope(y, r) FILTER (WHERE r >= 0)").alias("b_right"),
        F.expr("COUNT(*) FILTER (WHERE r < 0)").cast("long").alias("n_left"),
        F.expr("COUNT(*) FILTER (WHERE r >= 0)").cast("long").alias("n_right"),
    )
    return fits.select(
        "n_left",
        "n_right",
        F.round("a_left", 4).alias("intercept_left"),
        F.round("a_right", 4).alias("intercept_right"),
        F.round("b_left", 6).alias("slope_left"),
        F.round("b_right", 6).alias("slope_right"),
        F.round(F.col("a_right") - F.col("a_left"), 4).alias("rdd_jump"),
    )


# ---------------------------------------------------------------------------
# wave 127: centroid silhouette, 1-D Gaussian-mixture EM
# ---------------------------------------------------------------------------


@query(
    "centroid_silhouette_embedding",
    oracle="""
    WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    c AS (
        SELECT e AS ce,
               CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
        FROM s WHERE vec_id IN (3, 66, 129, 192, 255, 318, 381, 444)
    ), scored AS (
        SELECT s.vec_id, c.cell,
               1000000 - CAST(ROUND(list_cosine_similarity(s.e, c.ce) * 1e6)
                              AS BIGINT) AS dist_ppm
        FROM s CROSS JOIN c
    ), ranked AS (
        SELECT vec_id, cell, dist_ppm,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist_ppm, cell) AS rn
        FROM scored
    ), ab AS (
        SELECT a.vec_id, a.cell,
               a.dist_ppm AS a_dist, b.dist_ppm AS b_dist
        FROM ranked a JOIN ranked b
          ON b.vec_id = a.vec_id AND a.rn = 1 AND b.rn = 2
    )
    SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(AVG(CAST(b_dist - a_dist AS DOUBLE)
                     / greatest(a_dist, b_dist)), 6) AS mean_silhouette
    FROM ab GROUP BY cell
    """,
)
def centroid_silhouette_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-simplified silhouette — the cluster-QUALITY metric the
    clustering family (kmeans assign, semdedup cells, IVF) was
    missing: per vector, a = cosine distance to its own (nearest)
    pinned centroid, b = distance to the second-nearest, and
    s = (b−a)/max(a,b) ∈ [0,1]; per-cell means near 0 mark cells
    whose members sit on a boundary (candidates for splitting), near
    1 mark tight, well-separated cells. Distances are the same exact
    ppm integers as kmeans_embedding_assign, so a and b are
    hash-exact and only the final mean needs rounding.

    Scale shape: same map-side Arrow matmul shape as the assignment
    step (centroids are a broadcast closure; the oracle's cross join
    is the spec); per-vector top-2 is a k-bounded in-row argmin, and
    the census is an 8-row agg.
    """
    from pyspark_movie_recommender_spark.operators.similarity import (
        kmeans_assign,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # kmeans_assign gives the best cell; recompute the top-2 distances
    # with the same pinned centroids via the operator's scoring path
    pins = [3, 66, 129, 192, 255, 318, 381, 444]
    assigned = kmeans_assign(emb, pins, top2=True)
    return assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.round(
            F.avg(
                (F.col("b_dist") - F.col("a_dist")).cast("double")
                / F.greatest(F.col("a_dist"), F.col("b_dist"))
            ),
            6,
        ).alias("mean_silhouette"),
    )


@query(
    "gmm_em_order_values",
    oracle="""
    WITH pts AS (
        SELECT o_totalprice / 100000 AS y FROM orders
    ), init AS (
        SELECT AVG(y) - stddev_pop(y) AS mu1, AVG(y) + stddev_pop(y) AS mu2,
               stddev_pop(y) AS s1, stddev_pop(y) AS s2, 0.5 AS pi2
        FROM pts
    ), e1 AS (
        SELECT y,
               (pi2/s2) * exp(-(y-mu2)*(y-mu2)/(2*s2*s2))
               / ((pi2/s2) * exp(-(y-mu2)*(y-mu2)/(2*s2*s2))
                  + ((1-pi2)/s1) * exp(-(y-mu1)*(y-mu1)/(2*s1*s1))) AS r
        FROM pts, init
    ), m1 AS (
        SELECT SUM(r)/COUNT(*) AS pi2,
               SUM((1-r)*y)/SUM(1-r) AS mu1,
               SUM(r*y)/SUM(r) AS mu2,
               sqrt(SUM((1-r)*y*y)/SUM(1-r)
                    - (SUM((1-r)*y)/SUM(1-r))*(SUM((1-r)*y)/SUM(1-r))) AS s1,
               sqrt(SUM(r*y*y)/SUM(r)
                    - (SUM(r*y)/SUM(r))*(SUM(r*y)/SUM(r))) AS s2
        FROM e1
    ), e2 AS (
        SELECT y,
               (pi2/s2) * exp(-(y-mu2)*(y-mu2)/(2*s2*s2))
               / ((pi2/s2) * exp(-(y-mu2)*(y-mu2)/(2*s2*s2))
                  + ((1-pi2)/s1) * exp(-(y-mu1)*(y-mu1)/(2*s1*s1))) AS r
        FROM pts, m1
    ), m2 AS (
        SELECT SUM(r)/COUNT(*) AS pi2,
               SUM((1-r)*y)/SUM(1-r) AS mu1,
               SUM(r*y)/SUM(r) AS mu2,
               sqrt(SUM((1-r)*y*y)/SUM(1-r)
                    - (SUM((1-r)*y)/SUM(1-r))*(SUM((1-r)*y)/SUM(1-r))) AS s1,
               sqrt(SUM(r*y*y)/SUM(r)
                    - (SUM(r*y)/SUM(r))*(SUM(r*y)/SUM(r))) AS s2
        FROM e2
    ), e3 AS (
        SELECT y,
               (pi2/s2) * exp(-(y-mu2)*(y-mu2)/(2*s2*s2))
               / ((pi2/s2) * exp(-(y-mu2)*(y-mu2)/(2*s2*s2))
                  + ((1-pi2)/s1) * exp(-(y-mu1)*(y-mu1)/(2*s1*s1))) AS r
        FROM pts, m2
    ), m3 AS (
        SELECT SUM(r)/COUNT(*) AS pi2,
               SUM((1-r)*y)/SUM(1-r) AS mu1,
               SUM(r*y)/SUM(r) AS mu2,
               sqrt(SUM((1-r)*y*y)/SUM(1-r)
                    - (SUM((1-r)*y)/SUM(1-r))*(SUM((1-r)*y)/SUM(1-r))) AS s1,
               sqrt(SUM(r*y*y)/SUM(r)
                    - (SUM(r*y)/SUM(r))*(SUM(r*y)/SUM(r))) AS s2
        FROM e3
    )
    SELECT ROUND(pi2, 4) AS weight_hi,
           ROUND(mu1 * 100000, 2) AS mu_low,
           ROUND(mu2 * 100000, 2) AS mu_high,
           ROUND(s1 * 100000, 2) AS sigma_low,
           ROUND(s2 * 100000, 2) AS sigma_high
    FROM m3
    """,
)
def gmm_em_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-component 1-D Gaussian-mixture EM on order values: three
    E/M rounds from a moment-based deterministic init (μ = m ∓ s,
    σ = s, π = ½) — soft model-based clustering, where k-means
    (hard assignment) and the histogram (no model) can't separate
    overlapping populations or give a membership probability. The
    per-row E-step responsibility and closed-form weighted-moment
    M-step are identical IEEE dags on both engines, unrolled as CTE
    chains in the oracle (the same discipline as FS-EM, Platt, and
    IRLS).

    Scale shape: three full passes, each one hash agg of seven
    weighted moment sums with map-side partials; parameters are
    driver-side scalars. Round 4/2 on the outputs (EM, like Newton,
    amplifies last-bit summation noise).
    """
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select((F.col("o_totalprice") / 100000).alias("y")).localCheckpoint()
    ini = pts.agg(
        F.avg("y").alias("m"), F.stddev_pop("y").alias("s")
    ).first()
    mu1, mu2 = ini.m - ini.s, ini.m + ini.s
    s1 = s2 = ini.s
    pi2 = 0.5
    import math

    for _ in range(3):
        p2 = (F.lit(pi2) / F.lit(s2)) * F.exp(
            -(F.col("y") - F.lit(mu2)) * (F.col("y") - F.lit(mu2))
            / (2 * F.lit(s2) * F.lit(s2))
        )
        p1 = (F.lit(1 - pi2) / F.lit(s1)) * F.exp(
            -(F.col("y") - F.lit(mu1)) * (F.col("y") - F.lit(mu1))
            / (2 * F.lit(s1) * F.lit(s1))
        )
        r = (p2 / (p2 + p1)).alias("r")
        m = pts.select("y", r).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("r").alias("sr"),
            F.sum(F.col("r") * F.col("y")).alias("sry"),
            F.sum(F.col("r") * F.col("y") * F.col("y")).alias("sryy"),
            F.sum(1 - F.col("r")).alias("sq"),
            F.sum((1 - F.col("r")) * F.col("y")).alias("sqy"),
            F.sum((1 - F.col("r")) * F.col("y") * F.col("y")).alias("sqyy"),
        ).first()
        pi2 = m.sr / m.n
        mu1 = m.sqy / m.sq
        mu2 = m.sry / m.sr
        s1 = math.sqrt(m.sqyy / m.sq - mu1 * mu1)
        s2 = math.sqrt(m.sryy / m.sr - mu2 * mu2)
    return pts.sparkSession.createDataFrame(
        [
            (
                round(pi2, 4),
                round(mu1 * 100000, 2),
                round(mu2 * 100000, 2),
                round(s1 * 100000, 2),
                round(s2 * 100000, 2),
            )
        ],
        "weight_hi double, mu_low double, mu_high double,"
        " sigma_low double, sigma_high double",
    )


# ---------------------------------------------------------------------------
# wave 128: column-encoding size advisor, survey sample estimate with FPC
# ---------------------------------------------------------------------------


@query(
    "encoding_size_advisor",
    oracle="""
    WITH cols AS (
        SELECT 'o_orderstatus' AS col, o_orderstatus AS v FROM orders
        UNION ALL
        SELECT 'o_orderpriority', o_orderpriority FROM orders
        UNION ALL
        SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
    ), stats AS (
        SELECT col, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
               CAST(SUM(length(v)) AS BIGINT) AS plain_bytes,
               CAST(SUM(DISTINCT 0) + (
                   SELECT SUM(length(d.v)) FROM (
                       SELECT DISTINCT col AS c2, v FROM cols
                   ) d WHERE d.c2 = col
               ) AS BIGINT) AS dict_value_bytes
        FROM cols GROUP BY col
    )
    SELECT col, n, n_distinct, plain_bytes,
           CAST(dict_value_bytes
                + (n * CAST(ceil(ln(n_distinct + 1) / ln(2)) AS BIGINT) + 7)
                  // 8 AS BIGINT) AS dict_bytes,
           CASE WHEN dict_value_bytes
                     + (n * CAST(ceil(ln(n_distinct + 1) / ln(2)) AS BIGINT)
                        + 7) // 8 < plain_bytes
                THEN 'dictionary' ELSE 'plain' END AS recommendation
    FROM stats
    """,
)
def encoding_size_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-encoding advisor — the layout decision parquet writers
    make per column, surfaced as a query: for each candidate column,
    the PLAIN size (total value bytes) versus the DICTIONARY size
    (distinct value bytes + n·⌈log₂(card+1)⌉ bits of codes), with the
    cheaper one recommended. Low-cardinality flags dictionary-encode
    to a few percent of plain; near-unique keys don't — the advisor
    shows exactly where the crossover sits. Completes the physical-
    layout family (zorder clustering, compaction packing, join-size
    estimation) with the encoding dimension.

    Exactness: everything is integer byte arithmetic from exact
    counts; the only float is the log₂ inside a ceil, identical on
    both engines for these magnitudes.

    Scale shape: one unpivoted pass with per-column hash aggs
    (COUNT DISTINCT per column is the standard column-stats scan);
    at warehouse scale this reads parquet metadata instead.
    """
    orders = load_table(spark, sf_dir, "orders")

    def col_stats(name: str, col):
        v = col.cast("string")
        d = orders.select(v.alias("v")).groupBy("v").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        return d.agg(
            F.lit(name).alias("col"),
            F.sum("c").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.length("v") * F.col("c")).cast("long").alias("plain_bytes"),
            F.sum(F.length("v")).cast("long").alias("dict_value_bytes"),
        )

    stats = (
        col_stats("o_orderstatus", F.col("o_orderstatus"))
        .unionByName(col_stats("o_orderpriority", F.col("o_orderpriority")))
        .unionByName(col_stats("o_custkey", F.col("o_custkey")))
    )
    code_bits = F.ceil(
        F.log(F.col("n_distinct").cast("double") + 1) / float(__import__("math").log(2))
    ).cast("long")
    dict_bytes = (
        F.col("dict_value_bytes")
        + F.expr(
            "(n * CAST(ceil(ln(n_distinct + 1) / ln(2)) AS BIGINT) + 7) div 8"
        )
    ).cast("long")
    return stats.select(
        "col",
        "n",
        "n_distinct",
        "plain_bytes",
        dict_bytes.alias("dict_bytes"),
        F.when(dict_bytes < F.col("plain_bytes"), "dictionary")
        .otherwise("plain")
        .alias("recommendation"),
    )


@query(
    "survey_sample_estimate",
    oracle="""
    WITH tagged AS (
        SELECT o_totalprice AS y,
               CASE WHEN ((o_orderkey * 2654435761) % 4294967296) % 10 = 0
                    THEN 1 ELSE 0 END AS sampled
        FROM orders
    ), pop AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pop,
               ROUND(AVG(y), 4) AS true_mean
        FROM tagged
    ), samp AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_s,
               AVG(y) AS ybar,
               var_samp(y) AS s2
        FROM tagged WHERE sampled = 1
    )
    SELECT n_pop, n_s, true_mean,
           ROUND(ybar, 4) AS sample_mean,
           ROUND(sqrt((1.0 - CAST(n_s AS DOUBLE) / n_pop) * s2 / n_s), 4)
               AS se_fpc,
           CAST(CASE WHEN abs(ybar - true_mean)
                          <= 1.96 * sqrt((1.0 - CAST(n_s AS DOUBLE) / n_pop)
                                         * s2 / n_s)
                     THEN 1 ELSE 0 END AS BIGINT) AS ci_covers_truth
    FROM pop, samp
    """,
)
def survey_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Design-based survey estimation from a 10% hash sample (SRSWOR):
    the sample mean of order value with its FINITE-POPULATION-
    corrected standard error √((1−f)·s²/n) — the √(1−f) shrink is
    what textbook SEs miss when the sample is a meaningful fraction
    of the population, exactly the warehouse situation (you often
    sample 10-50% for expensive follow-up scans). The true mean rides
    along with a 95%-CI coverage flag — the design-based loop closed
    inside one query. Completes the survey-statistics pair begun by
    Neyman allocation (how much to sample) with the estimator side
    (what the sample tells you).

    Scale shape: one tagging pass (hash bit, no RNG state), two
    census aggs. The sample is deterministic, so the query is
    reproducible and oracle-checkable end to end.
    """
    orders = load_table(spark, sf_dir, "orders")
    tagged = orders.select(
        F.col("o_totalprice").alias("y"),
        F.when(
            ((F.col("o_orderkey") * 2654435761) % 4294967296) % 10 == 0, 1
        )
        .otherwise(0)
        .alias("sampled"),
    )
    pop = tagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_pop"),
        F.round(F.avg("y"), 4).alias("true_mean"),
    )
    samp = tagged.filter(F.col("sampled") == 1).agg(
        F.count(F.lit(1)).cast("long").alias("n_s"),
        F.avg("y").alias("ybar"),
        F.var_samp("y").alias("s2"),
    )
    se = F.sqrt(
        (1.0 - F.col("n_s").cast("double") / F.col("n_pop"))
        * F.col("s2")
        / F.col("n_s")
    )
    return pop.crossJoin(F.broadcast(samp)).select(
        "n_pop",
        "n_s",
        "true_mean",
        F.round("ybar", 4).alias("sample_mean"),
        F.round(se, 4).alias("se_fpc"),
        F.when(F.abs(F.col("ybar") - F.col("true_mean")) <= 1.96 * se, 1)
        .otherwise(0)
        .cast("long")
        .alias("ci_covers_truth"),
    )


# ---------------------------------------------------------------------------
# wave 129: sketch accuracy audit
# ---------------------------------------------------------------------------


@query("sketch_accuracy_audit")
def sketch_accuracy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy audit of the engine's approximate aggregates against
    their exact twins ON THE SAME DATA — the trust-but-verify query
    that should ship beside any sketch rollout: HyperLogLog++
    distinct counts (default 5% rsd) vs COUNT(DISTINCT), and
    approx_percentile (rank error ≤ n/accuracy) vs percentile_disc,
    each with its observed error and an in-query within-bound flag.
    Rows-only by design (quantile-sketch merges are partition-order
    sensitive); the law test pins every flag to 1.

    Scale shape: the approximate side is the point — HLL and KLL-
    style summaries are map-side-mergeable fixed-size state where the
    exact twins shuffle the full key space / sort groups. The audit
    costs one extra exact pass, which is exactly what you pay ONCE
    before trusting the sketch everywhere.
    """
    orders = load_table(spark, sf_dir, "orders")
    both = orders.agg(
        F.countDistinct("o_custkey").cast("double").alias("exact_distinct"),
        F.approx_count_distinct("o_custkey").cast("double").alias(
            "approx_distinct"
        ),
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
            " AS DOUBLE)"
        ).alias("exact_p50"),
        F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias(
            "approx_p50"
        ),
        F.expr(
            "CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)"
            " AS DOUBLE)"
        ).alias("exact_p90"),
        F.expr("approx_percentile(o_totalprice, 0.9, 1000)").alias(
            "approx_p90"
        ),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    # second pass: exact ranks of the approximate percentile answers,
    # for the rank-error bound |rank(approx_pXX) − p·n| ≤ n/accuracy
    ranks = orders.crossJoin(F.broadcast(both)).agg(
        F.sum(
            F.when(F.col("o_totalprice") <= F.col("approx_p50"), 1).otherwise(0)
        )
        .cast("double")
        .alias("rank_p50"),
        F.sum(
            F.when(F.col("o_totalprice") <= F.col("approx_p90"), 1).otherwise(0)
        )
        .cast("double")
        .alias("rank_p90"),
        F.first("exact_distinct").alias("exact_distinct"),
        F.first("approx_distinct").alias("approx_distinct"),
        F.first("exact_p50").alias("exact_p50"),
        F.first("approx_p50").alias("approx_p50"),
        F.first("exact_p90").alias("exact_p90"),
        F.first("approx_p90").alias("approx_p90"),
        F.first("n").alias("n"),
    )

    def metric(name, exact, approx, bound_ok):
        return ranks.select(
            F.lit(name).alias("metric"),
            F.round(exact, 2).alias("exact_value"),
            F.round(approx, 2).alias("approx_value"),
            F.round(F.abs(approx - exact), 2).alias("abs_error"),
            bound_ok.cast("long").alias("within_bound"),
        )

    hll = metric(
        "hll_distinct_custkey",
        F.col("exact_distinct"),
        F.col("approx_distinct"),
        (
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            <= 3 * 0.05 * F.col("exact_distinct")
        ),
    )
    p50 = metric(
        "approx_percentile_p50",
        F.col("exact_p50"),
        F.col("approx_p50"),
        (
            F.abs(F.col("rank_p50") - 0.5 * F.col("n"))
            <= F.col("n") / 1000 + 1
        ),
    )
    p90 = metric(
        "approx_percentile_p90",
        F.col("exact_p90"),
        F.col("approx_p90"),
        (
            F.abs(F.col("rank_p90") - 0.9 * F.col("n"))
            <= F.col("n") / 1000 + 1
        ),
    )
    return hll.unionByName(p50).unionByName(p90)


# ---------------------------------------------------------------------------
# wave 130: D'Hondt divisor apportionment, data-completeness calendar
# ---------------------------------------------------------------------------


@query(
    "dhondt_vs_hamilton",
    oracle="""
    WITH rev AS (
        SELECT n.n_name, n.n_nationkey,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name, n.n_nationkey
    ), quot AS (
        SELECT n_name, n_nationkey, cents, d,
               CAST(cents AS DOUBLE) / d AS q
        FROM rev, (SELECT unnest(generate_series(1, 100)) AS d)
    ), awarded AS (
        SELECT n_name, n_nationkey FROM (
            SELECT *, ROW_NUMBER() OVER (
                ORDER BY q DESC, n_nationkey, d) AS rnk
            FROM quot
        ) WHERE rnk <= 100
    ), dh AS (
        SELECT n_name, n_nationkey, CAST(COUNT(*) AS BIGINT) AS dhondt_seats
        FROM awarded GROUP BY n_name, n_nationkey
    ), tot AS (
        SELECT CAST(SUM(cents) AS BIGINT) AS t FROM rev
    ), ham AS (
        SELECT n_name, n_nationkey,
               (cents * 100) // t AS floor_seats,
               (cents * 100) % t  AS rem
        FROM rev, tot
    ), short AS (
        SELECT 100 - CAST(SUM(floor_seats) AS BIGINT) AS k FROM ham
    ), hamilton AS (
        SELECT n_name, n_nationkey,
               CAST(floor_seats + CASE WHEN rnk <= k THEN 1 ELSE 0 END
                    AS BIGINT) AS hamilton_seats
        FROM (
            SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, n_nationkey)
                       AS rnk
            FROM ham
        ), short
    )
    SELECT r.n_name,
           COALESCE(d.dhondt_seats, 0) AS dhondt_seats,
           h.hamilton_seats,
           COALESCE(d.dhondt_seats, 0) - h.hamilton_seats AS method_gap
    FROM rev r
    LEFT JOIN dh d ON d.n_nationkey = r.n_nationkey
    JOIN hamilton h ON h.n_nationkey = r.n_nationkey
    """,
)
def dhondt_vs_hamilton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Divisor-method apportionment (D'Hondt/Jefferson) beside the
    largest-remainder method on the SAME revenue totals: D'Hondt
    awards each of 100 seats to the highest remaining quotient
    cents/d (d = 1..seats) — a pure top-k over the nation×divisor
    fan-out, no iteration — and the per-nation gap against Hamilton
    shows the methods' systematic difference (divisor methods favor
    large parties and are immune to the Alabama paradox that
    largest-remainder suffers). Ties in the quotient ranking break by
    (nationkey, divisor); the quotients are exact-dividend doubles so
    both engines rank identically.

    Scale shape: one fact agg to |nations| rows, a 100×|nations|
    quotient fan-out, and a TakeOrderedAndProject top-100 — the
    divisor method IS a top-k query, which is the point.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "n_nationkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .localCheckpoint()
    )
    divisors = spark.range(1, 101).select(F.col("id").alias("d"))
    quot = rev.crossJoin(F.broadcast(divisors)).select(
        "n_name",
        "n_nationkey",
        "d",
        (F.col("cents").cast("double") / F.col("d")).alias("q"),
    )
    awarded = (
        quot.withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.col("q").desc(), "n_nationkey", "d")
            ),
        )
        .filter(F.col("rnk") <= 100)
        .groupBy("n_nationkey")
        .agg(F.count(F.lit(1)).cast("long").alias("dhondt_seats"))
    )
    tot = rev.agg(F.sum("cents").cast("long").alias("t"))
    ham = rev.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "n_nationkey",
        F.expr("(cents * 100) div t").alias("floor_seats"),
        F.expr("(cents * 100) % t").alias("rem"),
    )
    short = ham.agg((F.lit(100) - F.sum("floor_seats")).cast("long").alias("k"))
    hamilton = (
        ham.withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.col("rem").desc(), "n_nationkey")
            ),
        )
        .crossJoin(F.broadcast(short))
        .select(
            "n_nationkey",
            (
                F.col("floor_seats")
                + F.when(F.col("rnk") <= F.col("k"), 1).otherwise(0)
            )
            .cast("long")
            .alias("hamilton_seats"),
        )
    )
    return (
        rev.join(awarded, "n_nationkey", "left")
        .join(hamilton, "n_nationkey")
        .select(
            "n_name",
            F.coalesce(F.col("dhondt_seats"), F.lit(0))
            .cast("long")
            .alias("dhondt_seats"),
            "hamilton_seats",
            (
                F.coalesce(F.col("dhondt_seats"), F.lit(0))
                - F.col("hamilton_seats")
            )
            .cast("long")
            .alias("method_gap"),
        )
    )


@query(
    "data_completeness_calendar",
    oracle="""
    WITH bounds AS (
        SELECT MIN(CAST(epoch_us(ts) // 86400000000 AS BIGINT)) AS d0,
               MAX(CAST(epoch_us(ts) // 86400000000 AS BIGINT)) AS d1
        FROM events
    ), grid AS (
        SELECT t.event_type, g.day
        FROM (SELECT DISTINCT event_type FROM events) t,
             (SELECT unnest(generate_series(
                  (SELECT d0 FROM bounds),
                  (SELECT d1 FROM bounds))) AS day) g
    ), observed AS (
        SELECT DISTINCT event_type,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        FROM events
    )
    SELECT g.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days_expected,
           CAST(SUM(CASE WHEN o.day IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_days_present,
           CAST(SUM(CASE WHEN o.day IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_days_missing,
           CAST(SUM(CASE WHEN o.day IS NOT NULL THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS completeness_ppm
    FROM grid g LEFT JOIN observed o
      ON o.event_type = g.event_type AND o.day = g.day
    GROUP BY g.event_type
    """,
)
def data_completeness_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness/completeness monitoring: the full calendar grid
    between the corpus's first and last day, crossed with every event
    type, left-joined against the days actually observed — missing
    (type, day) cells are exactly the backfill work queue, and the
    per-type completeness ppm is the SLO number a data-platform
    dashboard tracks. The operational sibling of
    forward_fill_user_value (which repairs gaps) — this one FINDS
    them.

    Scale shape: the grid is |types|×|days| (tiny, from a broadcast
    bounds scalar); observed days collapse through a distinct; the
    audit join is grid-sized, never fact-sized.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    pts = ev.select("event_type", epoch_day("ts").alias("day"))
    bounds = pts.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    types = pts.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    observed = pts.distinct().withColumn("present", F.lit(1))
    return (
        grid.join(observed, ["event_type", "day"], "left")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days_expected"),
            F.sum(F.coalesce(F.col("present"), F.lit(0)))
            .cast("long")
            .alias("n_days_present"),
            F.sum(F.when(F.col("present").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_days_missing"),
            F.expr(
                "sum(coalesce(present, 0)) * 1000000L div count(1)"
            )
            .cast("long")
            .alias("completeness_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# wave 131: Erlang-C staffing, ABC-XYZ inventory matrix
# ---------------------------------------------------------------------------


@query(
    "erlang_c_staffing",
    oracle="""
    WITH rate AS (
        SELECT CAST(COUNT(*) AS DOUBLE)
               / ((MAX(epoch_us(ts)) - MIN(epoch_us(ts))) / 3600000000.0)
                   AS lam
        FROM events
    ), params AS (
        SELECT lam, lam / 60.0 AS a FROM rate
    ), servers AS (
        SELECT unnest(generate_series(1, 8)) AS c
    ), terms AS (
        SELECT s.c, p.a, p.lam,
               (SELECT SUM(pow(p.a, k)
                           / CAST(factorial(CAST(k AS INTEGER)) AS DOUBLE))
                FROM (SELECT unnest(generate_series(0, s.c - 1)) AS k))
                   AS sum_terms,
               pow(p.a, s.c)
               / CAST(factorial(CAST(s.c AS INTEGER)) AS DOUBLE) AS top
        FROM servers s, params p WHERE s.c > p.a
    )
    SELECT c, ROUND(lam, 4) AS arrivals_per_hour, ROUND(a, 4) AS offered_load,
           ROUND((top * c / (c - a)) / (sum_terms + top * c / (c - a)), 6)
               AS wait_probability,
           CAST(CASE WHEN (top * c / (c - a))
                          / (sum_terms + top * c / (c - a)) < 0.2
                     THEN 1 ELSE 0 END AS BIGINT) AS meets_slo
    FROM terms
    """,
)
def erlang_c_staffing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erlang-C staffing calculator: from the corpus's observed arrival
    rate (events/hour) and a 60/hour per-server service rate, the
    probability an arrival must WAIT for each staffing level c —
    P_wait = (aᶜ/c!)·(c/(c−a)) / (Σ_{k<c} aᵏ/k! + same), the queueing
    formula behind every support-desk and worker-pool sizing
    decision, with the "meets 20% wait SLO" flag marking the minimum
    viable c. Powers and factorials stay exact for c ≤ 8 (factorial
    is integer-exact, pow cancels against it in doubles) and both
    engines evaluate the identical dag; only c > a rows are emitted
    (the queue is unstable at or below the offered load).

    Scale shape: one census agg for the arrival rate; the Erlang
    table is an 8-row fan-out with an in-row bounded sum. The
    fact-sized work is exactly one pass.
    """
    ev = load_table(spark, sf_dir, "events")
    rate = ev.agg(
        (
            F.count(F.lit(1)).cast("double")
            / (
                (
                    F.unix_micros(F.max("ts").cast("timestamp"))
                    - F.unix_micros(F.min("ts").cast("timestamp"))
                )
                / 3600000000.0
            )
        ).alias("lam")
    )
    params = rate.select("lam", (F.col("lam") / 60.0).alias("a"))
    servers = spark.range(1, 9).select(F.col("id").cast("int").alias("c"))
    terms = (
        servers.crossJoin(F.broadcast(params))
        .filter(F.col("c") > F.col("a"))
        .select(
            "c",
            "a",
            "lam",
            F.expr(
                "aggregate(sequence(0, c - 1),"
                " CAST(0.0 AS DOUBLE),"
                " (acc, k) -> acc + pow(a, k) / CAST(factorial(k) AS DOUBLE))"
            ).alias("sum_terms"),
            F.expr("pow(a, c) / CAST(factorial(c) AS DOUBLE)").alias("top"),
        )
    )
    pw = (F.col("top") * F.col("c") / (F.col("c") - F.col("a"))) / (
        F.col("sum_terms") + F.col("top") * F.col("c") / (F.col("c") - F.col("a"))
    )
    return terms.select(
        "c",
        F.round("lam", 4).alias("arrivals_per_hour"),
        F.round("a", 4).alias("offered_load"),
        F.round(pw, 6).alias("wait_probability"),
        F.when(pw < 0.2, 1).otherwise(0).cast("long").alias("meets_slo"),
    )


@query(
    "abc_xyz_matrix",
    oracle="""
    WITH weekly AS (
        SELECT l_partkey,
               CAST(epoch_us(l_shipdate) // 604800000000 AS BIGINT) AS week,
               SUM(l_quantity) AS qty
        FROM lineitem GROUP BY l_partkey, week
    ), per_part AS (
        SELECT l_partkey,
               SUM(qty) AS total_qty,
               CASE WHEN AVG(qty) > 0 AND COUNT(*) > 1
                    THEN stddev_pop(qty) / AVG(qty) END AS cv
        FROM weekly GROUP BY l_partkey
    ), revr AS (
        SELECT p.l_partkey, p.total_qty, p.cv,
               SUM(p.total_qty) OVER (ORDER BY p.total_qty DESC, p.l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_qty,
               SUM(p.total_qty) OVER () AS tot_qty
        FROM per_part p
    ), classed AS (
        SELECT CASE WHEN cum_qty * 100 <= tot_qty * 80 THEN 'A'
                    WHEN cum_qty * 100 <= tot_qty * 95 THEN 'B'
                    ELSE 'C' END AS abc,
               CASE WHEN cv IS NULL THEN 'Z'
                    WHEN cv < 0.5 THEN 'X'
                    WHEN cv < 1.0 THEN 'Y'
                    ELSE 'Z' END AS xyz
        FROM revr
    )
    SELECT abc, xyz, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM classed GROUP BY abc, xyz
    """,
)
def abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory matrix: volume class (A/B/C by cumulative
    80/95% quantity share, as in abc_part_classification) crossed
    with demand-VARIABILITY class (X/Y/Z by the coefficient of
    variation of weekly demand; single-week parts are Z) — the 9-cell
    planning grid behind stocking policy: AX (high volume, steady)
    gets automation, CZ (low volume, erratic) gets make-to-order.
    Volume alone (ABC) misses that a steady C-part is easier to plan
    than an erratic A-part.

    Scale shape: weekly demand is one fact hash agg; per-part CV a
    second; the ABC cumulative runs over the per-part relation (the
    same window shape as the Pareto query); census is 9 rows. Note
    the cum window is per-part-sized, not fact-sized.
    """
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    weekly = li.groupBy(
        "l_partkey",
        F.expr(
            "CAST(unix_micros(CAST(l_shipdate AS TIMESTAMP))"
            " div 604800000000 AS BIGINT)"
        ).alias("week"),
    ).agg(F.sum("l_quantity").alias("qty"))
    per_part = weekly.groupBy("l_partkey").agg(
        F.sum("qty").alias("total_qty"),
        F.when(
            (F.avg("qty") > 0) & (F.count(F.lit(1)) > 1),
            F.stddev_pop("qty") / F.avg("qty"),
        ).alias("cv"),
    )
    wcum = Window.orderBy(
        F.col("total_qty").desc(), "l_partkey"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = per_part.agg(F.sum("total_qty").alias("tot_qty"))
    revr = per_part.crossJoin(F.broadcast(tot)).select(
        "total_qty",
        "cv",
        "tot_qty",
        F.sum("total_qty").over(wcum).alias("cum_qty"),
    )
    classed = revr.select(
        F.when(F.col("cum_qty") * 100 <= F.col("tot_qty") * 80, "A")
        .when(F.col("cum_qty") * 100 <= F.col("tot_qty") * 95, "B")
        .otherwise("C")
        .alias("abc"),
        F.when(F.col("cv").isNull(), "Z")
        .when(F.col("cv") < 0.5, "X")
        .when(F.col("cv") < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return classed.groupBy("abc", "xyz").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    )


# ---------------------------------------------------------------------------
# wave 132: newsvendor stocking, typo-pair mining
# ---------------------------------------------------------------------------


@query(
    "newsvendor_stock_levels",
    oracle="""
    WITH weekly AS (
        SELECT p.p_brand,
               CAST(epoch_us(l.l_shipdate) // 604800000000 AS BIGINT) AS week,
               SUM(l.l_quantity) AS demand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand, week
    )
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_weeks,
           ROUND(AVG(demand), 2) AS mean_demand,
           ROUND(percentile_disc(0.5) WITHIN GROUP (ORDER BY demand), 2)
               AS stock_cf50,
           ROUND(percentile_disc(0.8) WITHIN GROUP (ORDER BY demand), 2)
               AS stock_cf80,
           ROUND(percentile_disc(0.95) WITHIN GROUP (ORDER BY demand), 2)
               AS stock_cf95
    FROM weekly GROUP BY p_brand
    """,
)
def newsvendor_stock_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor optimal stocking by critical fractile: the
    profit-maximizing stock for one period is the demand QUANTILE at
    c_u/(c_u+c_o) (underage vs overage cost), so each brand's weekly
    demand distribution is read at fractiles 0.5/0.8/0.95 — the three
    canonical cost regimes (balanced, underage-dominant, service-
    critical) — with the mean beside them showing exactly how badly
    "stock the average" undershoots for skewed demand. The
    decision-theory capstone of the inventory family (ABC volume,
    XYZ variability → THIS is how much to actually stock).

    Determinism: percentile_disc picks actual demand values; weekly
    sums are doubles rounded at the edge.

    Scale shape: one fact hash agg to |brands|×|weeks|, then
    per-brand sorted percentiles over week-count-bounded groups.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    weekly = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            "p_brand",
            F.expr(
                "CAST(unix_micros(CAST(l_shipdate AS TIMESTAMP))"
                " div 604800000000 AS BIGINT)"
            ).alias("week"),
        )
        .agg(F.sum("l_quantity").alias("demand"))
    )
    return weekly.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_weeks"),
        F.round(F.avg("demand"), 2).alias("mean_demand"),
        F.round(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY demand)"), 2
        ).alias("stock_cf50"),
        F.round(
            F.expr("percentile_disc(0.8) WITHIN GROUP (ORDER BY demand)"), 2
        ).alias("stock_cf80"),
        F.round(
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY demand)"), 2
        ).alias("stock_cf95"),
    )


@query(
    "typo_pair_mining",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w0
        FROM documents WHERE trim(text) <> ''
    ), tok AS (
        -- deterministic planted corruption (same discipline as
        -- robust_json_ingest): docs with doc_id % 50 = 0 lose the 2nd
        -- character of every token of length >= 4
        SELECT CASE WHEN doc_id % 50 = 0 AND length(w0) >= 4
                    THEN substr(w0, 1, 1) || substr(w0, 3)
                    ELSE w0 END AS w
        FROM raw
    ), vocab AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
        FROM tok GROUP BY w HAVING length(w) >= 4
    ), cand AS (
        SELECT a.w AS rare_form, a.freq AS rare_freq,
               b.w AS common_form, b.freq AS common_freq
        FROM vocab a JOIN vocab b
          ON substr(a.w, 1, 1) = substr(b.w, 1, 1)
         AND abs(length(a.w) - length(b.w)) <= 1
         AND a.w <> b.w
         AND a.freq * 10 < b.freq
        WHERE levenshtein(a.w, b.w) = 1
    )
    SELECT rare_form, common_form, rare_freq, common_freq
    FROM cand
    ORDER BY common_freq DESC, rare_form, common_form LIMIT 25
    """,
)
def typo_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-candidate mining from the corpus's own vocabulary: pairs
    of words at edit distance 1 where one form is ≥10× rarer than the
    other — the spell-correction signal ('recieve' vs 'receive')
    every corpus-cleaning pipeline mines before building a
    normalization map, with the frequency asymmetry separating typos
    from legitimate near-neighbors ('cat'/'cab'). Blocked on (first
    character, length±1) so the vocab self-join stays sub-quadratic —
    the same blocking discipline as the record-linkage family, on
    words instead of records. The synthetic corpus has no natural
    typos, so the ingest plants them deterministically (2% of docs
    lose each token's 2nd character — the robust_json_ingest
    corruption discipline) and the miner must recover exactly those
    (corrupted, original) pairs.

    Scale shape: explode → vocab-sized (word, freq) relation; the
    blocked self-join runs over first-letter×length buckets of the
    VOCABULARY (≪ corpus); levenshtein only on candidates that
    survive blocking. Top-25 by the common form's frequency.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    raw = docs.select(
        "doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("w0")
    )
    tok = raw.select(
        F.when(
            (F.col("doc_id") % 50 == 0) & (F.length("w0") >= 4),
            F.concat(F.substring("w0", 1, 1), F.expr("substr(w0, 3)")),
        )
        .otherwise(F.col("w0"))
        .alias("w")
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .filter(F.length("w") >= 4)
    )
    a = vocab.select(
        F.col("w").alias("rare_form"),
        F.col("freq").alias("rare_freq"),
        F.substring("w", 1, 1).alias("blk"),
        F.length("w").alias("la"),
    )
    b = vocab.select(
        F.col("w").alias("common_form"),
        F.col("freq").alias("common_freq"),
        F.substring("w", 1, 1).alias("blk"),
        F.length("w").alias("lb"),
    )
    cand = (
        a.join(b, "blk")
        .filter(
            (F.abs(F.col("la") - F.col("lb")) <= 1)
            & (F.col("rare_form") != F.col("common_form"))
            & (F.col("rare_freq") * 10 < F.col("common_freq"))
        )
        .filter(F.levenshtein("rare_form", "common_form") == 1)
    )
    return (
        cand.select("rare_form", "common_form", "rare_freq", "common_freq")
        .orderBy(
            F.col("common_freq").desc(), "rare_form", "common_form"
        )
        .limit(25)
    )
