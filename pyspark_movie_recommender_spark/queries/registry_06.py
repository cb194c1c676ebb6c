"""Query registry part 6 of 12 — registration order preserved.

Split from the former single-module registry; see the package
__init__ for the registry dicts and the @query decorator. Helpers
defined in earlier parts are imported explicitly below.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_movie_recommender_spark.operators import relational as R
from pyspark_movie_recommender_spark.operators.lineage import ckpt as _ckpt
from pyspark_movie_recommender_spark.queries import query
from pyspark_movie_recommender_spark.sources import load_table

@query(
    "benford_second_digit",
    oracle="""
    WITH digits AS (
        SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                                AS VARCHAR), 2, 1) AS BIGINT) AS d
        FROM orders WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) >= 10
    ), obs AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS o FROM digits GROUP BY d
    ), tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs
    ), expected AS (
        SELECT g.d,
               LN(1.0 + 1.0/(10.0*1 + g.d)) + LN(1.0 + 1.0/(10.0*2 + g.d))
               + LN(1.0 + 1.0/(10.0*3 + g.d)) + LN(1.0 + 1.0/(10.0*4 + g.d))
               + LN(1.0 + 1.0/(10.0*5 + g.d)) + LN(1.0 + 1.0/(10.0*6 + g.d))
               + LN(1.0 + 1.0/(10.0*7 + g.d)) + LN(1.0 + 1.0/(10.0*8 + g.d))
               + LN(1.0 + 1.0/(10.0*9 + g.d)) AS lp
        FROM (SELECT unnest(generate_series(0, 9)) AS d) g
    ), joined AS (
        SELECT e.d, COALESCE(o.o, 0) AS o, t.n,
               e.lp / LN(10.0) AS p
        FROM expected e LEFT JOIN obs o ON o.d = e.d, tot t
    )
    SELECT d AS second_digit, CAST(o AS BIGINT) AS observed,
           ROUND(p, 6) AS expected_p,
           ROUND((o - n * p) * (o - n * p) / (n * p), 4) AS chi2_contrib
    FROM joined ORDER BY d
    """,
)
def benford_second_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford SECOND-digit conformity of order values: expected
    P(d₂=d) = Σ₉ₖ₌₁ log₁₀(1 + 1/(10k+d)), observed counts, and per-
    digit χ² contributions. Second-digit tests catch rounding/psych-
    pricing manipulation that the first-digit law
    (`benford_first_digit_audit`) misses — fabricators fake leading
    digits but forget the second.

    Determinism: digit extraction is exact string/integer work on
    cents; expected probabilities are fixed 9-term ln sums written in
    identical order on both engines; contributions rounded once.

    Scale shape: one full-scan digit projection + 10-row census;
    expected table is a 10-row literal relation.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    digits = o.where(cents >= 10).select(
        F.substring(cents.cast("string"), 2, 1).cast("long").alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("o"))
    tot = obs.agg(F.sum("o").cast("long").alias("n"))
    grid = spark.range(0, 10).select(F.col("id").cast("long").alias("d"))
    lp = None
    for k in range(1, 10):
        term = F.log(1.0 + 1.0 / (10.0 * k + F.col("d")))
        lp = term if lp is None else lp + term
    expected = grid.select("d", (lp / F.log(F.lit(10.0))).alias("p"))
    joined = (
        expected.join(obs, "d", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "d",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
            "n",
            "p",
        )
    )
    return joined.select(
        F.col("d").alias("second_digit"),
        F.col("o").cast("long").alias("observed"),
        F.round(F.col("p"), 6).alias("expected_p"),
        F.round(
            (F.col("o") - F.col("n") * F.col("p"))
            * (F.col("o") - F.col("n") * F.col("p"))
            / (F.col("n") * F.col("p")),
            4,
        ).alias("chi2_contrib"),
    ).orderBy("second_digit")


# ---------------------------------------------------------------------------
# wave 202: IGNORE NULLS window suite, filtered distinct aggregates
# ---------------------------------------------------------------------------


@query(
    "window_ignore_nulls_suite",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(ROUND(value * 100) AS BIGINT) END AS pval
        FROM events
    ), w AS (
        SELECT user_id, event_id,
               LAST_VALUE(pval IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_purchase_cents,
               FIRST_VALUE(pval IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS first_purchase_cents,
               LEAD(pval, 1 IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_purchase_cents
        FROM seq
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN last_purchase_cents IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS with_prior_purchase,
           CAST(SUM(CASE WHEN next_purchase_cents IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS with_next_purchase,
           CAST(COALESCE(SUM(last_purchase_cents), 0) AS BIGINT)
               AS carried_cents,
           CAST(COUNT(DISTINCT first_purchase_cents) AS BIGINT)
               AS distinct_first_purchases
    FROM w
    """,
)
def window_ignore_nulls_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window semantics parity: LAST_VALUE (running
    carry-forward of the latest purchase), FIRST_VALUE over the full
    frame, and LEAD ... IGNORE NULLS (next purchase from any event) —
    the null-skipping forms behind `forward_fill_user_value` and
    `locf_with_ttl`, pinned here as a dialect-parity census because
    IGNORE NULLS is where engines' window implementations quietly
    disagree (default frames, null ordering, lead-vs-nth).

    Determinism: ordering key (ts, event_id) is total; all outputs are
    exact integer counts/sums over the windowed values.

    Scale shape: one shuffle on user_id feeding three windows that
    share the same sort — Catalyst reuses one Exchange + one Sort.
    """
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("long"),
        ).alias("pval"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wlead = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w = seq.select(
        F.last("pval", ignorenulls=True).over(wrun).alias("last_purchase_cents"),
        F.first("pval", ignorenulls=True)
        .over(wall)
        .alias("first_purchase_cents"),
        F.expr(
            "lead(pval, 1) IGNORE NULLS OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id)"
        ).alias("next_purchase_cents"),
    )
    return w.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("last_purchase_cents").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("with_prior_purchase"),
        F.sum(F.when(F.col("next_purchase_cents").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("with_next_purchase"),
        F.coalesce(F.sum("last_purchase_cents"), F.lit(0))
        .cast("long")
        .alias("carried_cents"),
        F.countDistinct("first_purchase_cents")
        .cast("long")
        .alias("distinct_first_purchases"),
    )


@query(
    "filtered_distinct_agg_suite",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT o_custkey)
                FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
               AS finished_customers,
           CAST(COUNT(DISTINCT o_custkey)
                FILTER (WHERE o_totalprice > 200000) AS BIGINT)
               AS big_spenders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                FILTER (WHERE o_orderstatus = 'O') AS BIGINT)
               AS open_revenue_cents,
           CAST(COUNT(*) FILTER (WHERE o_totalprice <= 1000) AS BIGINT)
               AS small_orders
    FROM orders GROUP BY priority ORDER BY priority
    """,
)
def filtered_distinct_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed FILTER-clause + multi-DISTINCT aggregation: three distinct
    counts under different predicates plus filtered plain aggregates in
    ONE GROUP BY — the planner shape (expand + multiple aggregation
    paths) that separates real SQL engines from toy ones. Spark lowers
    multi-distinct to an Expand operator; this query pins that the
    semantics survive the rewrite and match DuckDB's direct evaluation.

    Determinism: all counts/sums exact.

    Scale shape: one hash agg with Expand (×distinct-column
    multiplicity) — the known cost of multi-distinct; at 100 TB
    restate wide multi-distincts as two-phase `two_phase_skewed_
    distinct` plans (documented there).
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
            F.count_distinct(
                F.when(F.col("o_orderstatus") == "F", F.col("o_custkey"))
            )
            .cast("long")
            .alias("finished_customers"),
            F.count_distinct(
                F.when(F.col("o_totalprice") > 200000, F.col("o_custkey"))
            )
            .cast("long")
            .alias("big_spenders"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("o_orderstatus") == "O",
                        F.round(F.col("o_totalprice") * 100).cast("long"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("open_revenue_cents"),
            F.sum(F.when(F.col("o_totalprice") <= 1000, 1).otherwise(0))
            .cast("long")
            .alias("small_orders"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# wave 203: generalized ESD outliers, binary-segmentation changepoint
# ---------------------------------------------------------------------------


@query(
    "generalized_esd_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY day
    ), r1 AS (
        SELECT day, v,
               ABS(v - AVG(v) OVER ()) AS dev,
               STDDEV_SAMP(v) OVER () AS sd
        FROM daily
    ), x1 AS (
        SELECT day FROM r1 ORDER BY dev DESC, day LIMIT 1
    ), s1 AS (
        SELECT ROUND(MAX(dev / sd), 4) AS g1 FROM r1
    ), rest1 AS (
        SELECT d.day, d.v FROM daily d ANTI JOIN x1 ON x1.day = d.day
    ), r2 AS (
        SELECT day, v, ABS(v - AVG(v) OVER ()) AS dev,
               STDDEV_SAMP(v) OVER () AS sd
        FROM rest1
    ), x2 AS (SELECT day FROM r2 ORDER BY dev DESC, day LIMIT 1
    ), s2 AS (SELECT ROUND(MAX(dev / sd), 4) AS g2 FROM r2
    ), rest2 AS (
        SELECT d.day, d.v FROM rest1 d ANTI JOIN x2 ON x2.day = d.day
    ), r3 AS (
        SELECT day, v, ABS(v - AVG(v) OVER ()) AS dev,
               STDDEV_SAMP(v) OVER () AS sd
        FROM rest2
    ), s3 AS (SELECT ROUND(MAX(dev / sd), 4) AS g3 FROM r3
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           s1.g1 AS esd_stat_1, s2.g2 AS esd_stat_2, s3.g3 AS esd_stat_3,
           CAST((SELECT day FROM x1) AS BIGINT) AS outlier_day_1,
           CAST((SELECT day FROM x2) AS BIGINT) AS outlier_day_2
    FROM s1, s2, s3
    """,
)
def generalized_esd_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized ESD (Rosner) multi-outlier statistics on daily event
    value: three peel-and-recompute rounds, each removing the most
    deviant day (tie-broken by day) and reporting the studentized
    extreme Rᵢ of the REMAINING sample — the masking-proof
    generalization of `grubbs_daily_revenue_outlier` (a single Grubbs
    pass misses a second outlier hiding the first; ESD's λᵢ critical
    ladder is the Twitter S-H-ESD core).

    Determinism: all inputs exact cents; each round's mean/sd are
    census expressions over exact integers; the peel argmax carries a
    (dev, day) total order; each Rᵢ rounded once.

    Scale shape: fact → |days| hash agg, then three census+argmax
    rounds on the day relation — fixed iteration count, each an
    anti-join against a 1-row exclusion set.
    """
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            epoch_day("ts").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").cast("long").alias("v"))
    )
    daily = _ckpt(daily)  # shared fan-out relation

    def esd_round(df):
        wall = Window.partitionBy()
        r = df.select(
            "day",
            "v",
            F.abs(F.col("v") - F.avg("v").over(wall)).alias("dev"),
            F.stddev_samp("v").over(wall).alias("sd"),
        )
        x = r.orderBy(F.col("dev").desc(), "day").limit(1).select("day")
        s = r.agg(F.round(F.max(F.col("dev") / F.col("sd")), 4).alias("g"))
        rest = df.join(x.withColumnRenamed("day", "xd"),
                       F.col("day") == F.col("xd"), "left_anti")
        return x, s, rest

    x1, s1, rest1 = esd_round(daily)
    x2, s2, rest2 = esd_round(rest1)
    _, s3, _ = esd_round(rest2)
    n = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return (
        n.crossJoin(F.broadcast(s1.select(F.col("g").alias("esd_stat_1"))))
        .crossJoin(F.broadcast(s2.select(F.col("g").alias("esd_stat_2"))))
        .crossJoin(F.broadcast(s3.select(F.col("g").alias("esd_stat_3"))))
        .crossJoin(
            F.broadcast(x1.select(F.col("day").cast("long").alias("outlier_day_1")))
        )
        .crossJoin(
            F.broadcast(x2.select(F.col("day").cast("long").alias("outlier_day_2")))
        )
    )


@query(
    "binseg_single_changepoint",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY day
    ), idx AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
               day, v,
               CAST(SUM(v) OVER (ORDER BY day) AS HUGEINT) AS cs,
               SUM(CAST(v AS HUGEINT) * v) OVER (ORDER BY day) AS cs2,
               CAST(COUNT(*) OVER () AS BIGINT) AS n,
               CAST(SUM(v) OVER () AS HUGEINT) AS st,
               SUM(CAST(v AS HUGEINT) * v) OVER () AS st2
        FROM daily
    ), cand AS (
        SELECT i AS k, day,
               ROUND((CAST(cs2 AS DOUBLE)
                      - CAST(cs AS DOUBLE) * (CAST(cs AS DOUBLE) / i))
                     + (CAST(st2 - cs2 AS DOUBLE)
                        - CAST(st - cs AS DOUBLE)
                          * (CAST(st - cs AS DOUBLE) / (n - i))), 2)
                   AS sse_split,
               ROUND(CAST(st2 AS DOUBLE)
                     - CAST(st AS DOUBLE) * (CAST(st AS DOUBLE) / n), 2)
                   AS sse_total
        FROM idx WHERE i < n
    ), best AS (
        SELECT MIN(struct_pack(sse_split := sse_split, k := k)) AS b,
               MAX(sse_total) AS sse_total
        FROM cand
    )
    SELECT c.day AS changepoint_day,
           b.b.k AS split_index,
           ROUND(b.b.sse_split / 10000.0, 2) AS sse_split_dollars2,
           ROUND(b.sse_total / 10000.0, 2) AS sse_total_dollars2,
           ROUND(1.0 - b.b.sse_split / b.sse_total, 6) AS variance_explained
    FROM best b JOIN cand c ON c.k = b.b.k
    """,
)
def binseg_single_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary segmentation, first split: the day boundary minimizing the
    two-segment SSE of the daily value series, found in ONE pass via
    prefix sums (SSE_left(k)+SSE_right(k) from cumulative Σv, Σv² —
    no per-candidate rescan). Reports the variance explained by the
    split. This SEARCHES for the break that `chow_break_price_quantity`
    TESTS at a fixed point and `pettitt_changepoint_daily` ranks —
    binseg recursed is the standard multi-changepoint detector.

    Determinism: prefix sums exact 128-bit; each candidate's SSE is a
    fixed double rounded to 2 BEFORE the (sse, k) struct-min — the
    argmin therefore compares identical values on both engines with a
    total tie-break.

    Scale shape: fact → |days| agg; ONE ordered window produces every
    candidate's statistics simultaneously; struct-min census. O(|days|)
    total, the textbook prefix-sum trick.
    """
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    ev = load_table(spark, sf_dir, "events")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    daily = (
        ev.select(
            epoch_day("ts").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").cast("long").alias("v"))
    )
    wo = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
        "day",
        F.sum(dec("v")).over(wo).alias("cs"),
        F.sum(dec("v") * dec("v")).over(wo).alias("cs2"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n"),
        F.sum(dec("v")).over(wall).alias("st"),
        F.sum(dec("v") * dec("v")).over(wall).alias("st2"),
    )
    csd = F.col("cs").cast("double")
    cs2d = F.col("cs2").cast("double")
    rtd = (F.col("st") - F.col("cs")).cast("double")
    rt2d = (F.col("st2") - F.col("cs2")).cast("double")
    sse_split = F.round(
        (cs2d - csd * (csd / F.col("i")))
        + (rt2d - rtd * (rtd / (F.col("n") - F.col("i")))),
        2,
    )
    sse_total = F.round(
        F.col("st2").cast("double")
        - F.col("st").cast("double") * (F.col("st").cast("double") / F.col("n")),
        2,
    )
    cand = idx.where(F.col("i") < F.col("n")).select(
        F.col("i").alias("k"),
        "day",
        sse_split.alias("sse_split"),
        sse_total.alias("sse_total"),
    )
    # global-window argmin keeps the plan single-branch (fact scanned
    # once); the candidate relation is |days| rows so the empty-key
    # window is free
    wbest = Window.partitionBy()
    best = cand.withColumn(
        "b", F.min(F.struct(F.col("sse_split"), F.col("k"))).over(wbest)
    )
    return best.where(F.col("k") == F.col("b.k")).select(
        F.col("day").alias("changepoint_day"),
        F.col("k").alias("split_index"),
        F.round(F.col("sse_split") / 10000.0, 2).alias("sse_split_dollars2"),
        F.round(F.col("sse_total") / 10000.0, 2).alias("sse_total_dollars2"),
        F.round(1.0 - F.col("sse_split") / F.col("sse_total"), 6).alias(
            "variance_explained"
        ),
    )


# ---------------------------------------------------------------------------
# wave 204: Cliff's delta effect size, Doksum quantile shift function
# ---------------------------------------------------------------------------


@query(
    "cliffs_delta_segments",
    oracle="""
    WITH pts AS (
        SELECT CASE WHEN c.c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS g,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS v
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), vals AS (
        SELECT v,
               CAST(SUM(g) AS BIGINT) AS n1,
               CAST(SUM(1 - g) AS BIGINT) AS n2
        FROM pts GROUP BY v
    ), cum AS (
        SELECT v, n1, n2,
               CAST(COALESCE(SUM(n2) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS c2_below,
               CAST(COALESCE(SUM(n2) OVER (ORDER BY v
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
                    AS BIGINT) AS c2_above
        FROM vals
    ), mom AS (
        SELECT CAST(SUM(CAST(n1 AS HUGEINT) * c2_below) AS HUGEINT) AS gt,
               CAST(SUM(CAST(n1 AS HUGEINT) * c2_above) AS HUGEINT) AS lt,
               CAST(SUM(n1) AS BIGINT) AS m1,
               CAST(SUM(n2) AS BIGINT) AS m2
        FROM cum
    )
    SELECT m1 AS n_machinery, m2 AS n_rest,
           ROUND((CAST(gt AS DOUBLE) - CAST(lt AS DOUBLE))
                 / (CAST(m1 AS DOUBLE) * m2), 6) AS cliffs_delta,
           CAST(CASE
                WHEN ABS((CAST(gt AS DOUBLE) - CAST(lt AS DOUBLE))
                         / (CAST(m1 AS DOUBLE) * m2)) < 0.147 THEN 0
                WHEN ABS((CAST(gt AS DOUBLE) - CAST(lt AS DOUBLE))
                         / (CAST(m1 AS DOUBLE) * m2)) < 0.33 THEN 1
                WHEN ABS((CAST(gt AS DOUBLE) - CAST(lt AS DOUBLE))
                         / (CAST(m1 AS DOUBLE) * m2)) < 0.474 THEN 2
                ELSE 3 END AS BIGINT) AS magnitude_class
    FROM mom
    """,
)
def cliffs_delta_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta between MACHINERY and other segments' order values:
    δ = (#(x>y) − #(x<y))/(n₁n₂) ∈ [−1,1], with the standard
    negligible/small/medium/large class cuts (0.147/0.33/0.474). The
    fully NONPARAMETRIC effect size — where `effect_size_segments`
    (Cohen's d) assumes interval scale and finite variance, δ survives
    any monotone transform and heavy tails; it's the dominance
    probability 2·P(X>Y)−1 of `auc_order_status_price` recentred.

    Determinism: the U-statistic is computed from exact cumulative
    counts over the merged distinct-value axis (pair enumeration never
    happens; products 128-bit); one division, rounded; class cuts on
    the unrounded value.

    Scale shape: broadcast-dim join → per-value hash agg → two prefix
    windows + census over |distinct values| rows — the O(V) contingency
    algebra of `somers_d_linecount_status` with a two-sided tail.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    pts = o.join(
        F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")),
        "o_custkey",
    ).select(
        F.when(F.col("c_mktsegment") == "MACHINERY", 1).otherwise(0).alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    vals = pts.groupBy("v").agg(
        F.sum("g").cast("long").alias("n1"),
        F.sum(1 - F.col("g")).cast("long").alias("n2"),
    )
    from pyspark_movie_recommender_spark.operators.rank import (
        distributed_order_stats,
    )

    # distinct-value relation is order-count sized at 100 TB, so the
    # below/above cumulative counts run through the distributed rank
    # machinery; the strict-below/above forms reduce to the inclusive
    # cumsum algebraically: gt = Σn1·(ct2−n2), lt = m2·m1 − Σn1·ct2.
    cum = distributed_order_stats(
        vals.withColumn("__k", F.col("v").cast("double")),
        "__k",
        [],
        cumsum_cols={"ct2": "n2"},
    )
    mom0 = cum.agg(
        F.sum(dec("n1") * dec("ct2")).alias("s1"),
        F.sum(dec("n1") * dec("n2")).alias("s2"),
        F.sum("n1").cast("long").alias("m1"),
        F.sum("n2").cast("long").alias("m2"),
    )
    mom = mom0.select(
        (F.col("s1") - F.col("s2")).alias("gt"),
        (dec("m2") * dec("m1") - F.col("s1")).alias("lt"),
        "m1",
        "m2",
    )
    delta = (F.col("gt").cast("double") - F.col("lt").cast("double")) / (
        F.col("m1").cast("double") * F.col("m2")
    )
    return mom.select(
        F.col("m1").alias("n_machinery"),
        F.col("m2").alias("n_rest"),
        F.round(delta, 6).alias("cliffs_delta"),
        F.when(F.abs(delta) < 0.147, 0)
        .when(F.abs(delta) < 0.33, 1)
        .when(F.abs(delta) < 0.474, 2)
        .otherwise(3)
        .cast("long")
        .alias("magnitude_class"),
    )


@query(
    "quantile_shift_function",
    oracle="""
    WITH pts AS (
        SELECT CASE WHEN c.c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS g,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS v
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), grid AS (SELECT unnest(generate_series(1, 9)) AS q
    ), qm AS (
        SELECT quantile_disc(v, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
                   AS ql
        FROM pts WHERE g = 1
    ), qr AS (
        SELECT quantile_disc(v, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
                   AS ql
        FROM pts WHERE g = 0
    ), quantiles AS (
        SELECT g.q,
               CAST(qm.ql[g.q] AS BIGINT) AS q_machinery,
               CAST(qr.ql[g.q] AS BIGINT) AS q_rest
        FROM grid g, qm, qr
    )
    SELECT q AS decile,
           ROUND(q_machinery / 100.0, 2) AS machinery_dollars,
           ROUND(q_rest / 100.0, 2) AS rest_dollars,
           ROUND((q_machinery - q_rest) / 100.0, 2) AS shift_dollars
    FROM quantiles ORDER BY q
    """,
)
def quantile_shift_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doksum shift function between MACHINERY and the rest: the
    decile-by-decile quantile difference Δ(q) = F₁⁻¹(q) − F₀⁻¹(q) —
    WHERE in the distribution the segment effect lives (uniform shift?
    tail-only? crossing?). The distributional companion to the single
    numbers of `cliffs_delta_segments` / `effect_size_segments`, and
    the descriptive twin of `quantile_treatment_effect`.

    Determinism: percentile_disc returns exact data values (cents) on
    both engines; differences exact; one rounding to dollars.

    Scale shape: one broadcast-dim join; two grouped exact-percentile
    aggregations (Spark: percentile_disc with FILTER per group) — a
    per-group sort, the irreducible exact-quantile cost; 9-row output.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    pts = o.join(
        F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")),
        "o_custkey",
    ).select(
        F.when(F.col("c_mktsegment") == "MACHINERY", 1).otherwise(0).alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    pts = _ckpt(pts)  # shared fan-out relation
    rows_ = []
    for q in range(1, 10):
        rows_.append(
            pts.agg(
                F.lit(q).cast("long").alias("decile"),
                F.expr(
                    f"percentile_disc({q/10.0}) WITHIN GROUP (ORDER BY v)"
                    " FILTER (WHERE g = 1)"
                )
                .cast("long")
                .alias("q_machinery"),
                F.expr(
                    f"percentile_disc({q/10.0}) WITHIN GROUP (ORDER BY v)"
                    " FILTER (WHERE g = 0)"
                )
                .cast("long")
                .alias("q_rest"),
            )
        )
    quantiles = rows_[0]
    for r in rows_[1:]:
        quantiles = quantiles.unionAll(r)
    return quantiles.select(
        "decile",
        F.round(F.col("q_machinery") / 100.0, 2).alias("machinery_dollars"),
        F.round(F.col("q_rest") / 100.0, 2).alias("rest_dollars"),
        F.round((F.col("q_machinery") - F.col("q_rest")) / 100.0, 2).alias(
            "shift_dollars"
        ),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# wave 205: Goodman-Kruskal gamma and lambda
# ---------------------------------------------------------------------------


@query(
    "goodman_kruskal_gamma",
    oracle="""
    WITH basket AS (
        SELECT l_orderkey, LEAST(CAST(COUNT(*) AS BIGINT), 5) AS sz
        FROM lineitem GROUP BY l_orderkey
    ), cells AS (
        SELECT CAST(SUBSTR(o.o_orderpriority, 1, 1) AS BIGINT) AS r,
               b.sz AS c2, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders o JOIN basket b ON b.l_orderkey = o.o_orderkey
        GROUP BY r, c2
    ), conc AS (
        SELECT a.r, a.c2, a.n,
               CAST((SELECT COALESCE(SUM(b.n), 0) FROM cells b
                     WHERE b.r > a.r AND b.c2 > a.c2) AS BIGINT) AS below_right,
               CAST((SELECT COALESCE(SUM(b.n), 0) FROM cells b
                     WHERE b.r > a.r AND b.c2 < a.c2) AS BIGINT) AS below_left
        FROM cells a
    ), mom AS (
        SELECT CAST(SUM(CAST(n AS HUGEINT) * below_right) AS HUGEINT) AS nc,
               CAST(SUM(CAST(n AS HUGEINT) * below_left) AS HUGEINT) AS nd
        FROM conc
    )
    SELECT CAST(nc AS BIGINT) AS concordant,
           CAST(nd AS BIGINT) AS discordant,
           ROUND((CAST(nc AS DOUBLE) - CAST(nd AS DOUBLE))
                 / (CAST(nc AS DOUBLE) + CAST(nd AS DOUBLE)), 6)
               AS gk_gamma
    FROM mom
    """,
)
def goodman_kruskal_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal gamma between order priority (ordinal 1..5) and
    basket size (1..5+, capped): γ = (C−D)/(C+D), ties dropped — the
    ordinal association that uses ONLY untied pairs, so it reaches ±1
    under weak monotonicity where `kendall_tau_rankings` and
    `somers_d_linecount_status` are dragged toward 0 by tie mass.

    Determinism: the 5×5 contingency is exact; concordant/discordant
    mass comes from correlated quadrant sums over the 25-cell relation
    (no pair enumeration; products 128-bit); one division, rounded.

    Scale shape: per-order size agg + co-keyed join → 25-cell table;
    quadrant sums are O(cells²) on 25 rows. Fact touched twice
    (lineitem agg, orders join), both hash-shuffles on orderkey.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    basket = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.least(F.count(F.lit(1)).cast("long"), F.lit(5)).alias("sz")
    )
    cells = (
        o.join(basket, "o_orderkey")
        .groupBy(
            F.substring("o_orderpriority", 1, 1).cast("long").alias("r"),
            F.col("sz").alias("c2"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    a = cells.alias("a")
    b = cells.alias("b")
    quad = (
        a.join(b, (F.col("b.r") > F.col("a.r")), "left")
        .groupBy(F.col("a.r").alias("r"), F.col("a.c2").alias("c2"), F.col("a.n").alias("n"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("b.c2") > F.col("a.c2"), F.col("b.n"))),
                F.lit(0),
            )
            .cast("long")
            .alias("below_right"),
            F.coalesce(
                F.sum(F.when(F.col("b.c2") < F.col("a.c2"), F.col("b.n"))),
                F.lit(0),
            )
            .cast("long")
            .alias("below_left"),
        )
    )
    mom = quad.agg(
        F.sum(dec("n") * dec("below_right")).alias("nc"),
        F.sum(dec("n") * dec("below_left")).alias("nd"),
    )
    ncd = F.col("nc").cast("double")
    ndd = F.col("nd").cast("double")
    return mom.select(
        F.col("nc").cast("long").alias("concordant"),
        F.col("nd").cast("long").alias("discordant"),
        F.round((ncd - ndd) / (ncd + ndd), 6).alias("gk_gamma"),
    )


@query(
    "goodman_kruskal_lambda",
    oracle="""
    WITH cells AS (
        SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pr,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY seg, pr
    ), row_max AS (
        SELECT seg, CAST(MAX(n) AS BIGINT) AS mx FROM cells GROUP BY seg
    ), col_tot AS (
        SELECT pr, CAST(SUM(n) AS BIGINT) AS ct FROM cells GROUP BY pr
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS ntot FROM cells
    )
    SELECT t.ntot AS n_orders,
           CAST((SELECT SUM(mx) FROM row_max) AS BIGINT) AS sum_row_modes,
           CAST((SELECT MAX(ct) FROM col_tot) AS BIGINT) AS marginal_mode,
           ROUND((CAST((SELECT SUM(mx) FROM row_max) AS DOUBLE)
                  - (SELECT MAX(ct) FROM col_tot))
                 / (t.ntot - (SELECT MAX(ct) FROM col_tot)), 6)
               AS gk_lambda
    FROM tot t
    """,
)
def goodman_kruskal_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal lambda: the proportional-reduction-in-error of
    guessing an order's PRIORITY once you know the customer's SEGMENT —
    λ = (Σᵣ max꜀ nᵣ꜀ − max꜀ n꜀)/(n − max꜀ n꜀). The NOMINAL-scale
    association with a direct decision interpretation ('how much does
    the feature help a modal classifier'), zero exactly when every
    segment shares the global modal priority — the PRE semantics that
    `cramers_v_priority_status` (χ²-based) lacks.

    Determinism: pure exact counting (row modes, marginal mode);
    single division, rounded.

    Scale shape: broadcast-dim join → |seg|×|pr| table; modes and
    margins on the 25-cell relation.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cells = (
        o.join(
            F.broadcast(
                c.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
            ),
            "o_custkey",
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pr"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    row_max = cells.groupBy("seg").agg(F.max("n").cast("long").alias("mx"))
    col_tot = cells.groupBy("pr").agg(F.sum("n").cast("long").alias("ct"))
    srm = row_max.agg(F.sum("mx").cast("long").alias("sum_row_modes"))
    mm = col_tot.agg(F.max("ct").cast("long").alias("marginal_mode"))
    tot = cells.agg(F.sum("n").cast("long").alias("n_orders"))
    return (
        tot.crossJoin(F.broadcast(srm))
        .crossJoin(F.broadcast(mm))
        .select(
            "n_orders",
            "sum_row_modes",
            "marginal_mode",
            F.round(
                (F.col("sum_row_modes").cast("double") - F.col("marginal_mode"))
                / (F.col("n_orders") - F.col("marginal_mode")),
                6,
            ).alias("gk_lambda"),
        )
    )


# ---------------------------------------------------------------------------
# wave 206: Haar wavelet energy, dominant-period spectral scan
# ---------------------------------------------------------------------------


@query(
    "haar_wavelet_energy",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY day
    ), idx AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) - 1 AS i, v
        FROM daily
    ), l1 AS (
        SELECT i // 2 AS i,
               CAST(SUM(CASE WHEN i % 2 = 0 THEN v ELSE 0 END)
                    + SUM(CASE WHEN i % 2 = 1 THEN v ELSE 0 END) AS BIGINT)
                   AS s,
               CAST(SUM(CASE WHEN i % 2 = 0 THEN v ELSE 0 END)
                    - SUM(CASE WHEN i % 2 = 1 THEN v ELSE 0 END) AS BIGINT)
                   AS d,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM idx GROUP BY i // 2 HAVING COUNT(*) = 2
    ), l2 AS (
        SELECT i // 2 AS i,
               CAST(SUM(CASE WHEN i % 2 = 0 THEN s ELSE 0 END)
                    + SUM(CASE WHEN i % 2 = 1 THEN s ELSE 0 END) AS BIGINT)
                   AS s,
               CAST(SUM(CASE WHEN i % 2 = 0 THEN s ELSE 0 END)
                    - SUM(CASE WHEN i % 2 = 1 THEN s ELSE 0 END) AS BIGINT)
                   AS d
        FROM l1 GROUP BY i // 2 HAVING COUNT(*) = 2
    ), e AS (
        SELECT (SELECT SUM(CAST(d AS HUGEINT) * d) // 2 FROM l1) AS e1,
               (SELECT SUM(CAST(d AS HUGEINT) * d) // 4 FROM l2) AS e2
    )
    SELECT CAST((SELECT COUNT(*) FROM idx) AS BIGINT) AS n_days,
           CAST(e1 AS BIGINT) AS energy_scale2_cents2,
           CAST(e2 AS BIGINT) AS energy_scale4_cents2,
           ROUND(CAST(e1 AS DOUBLE) / (CAST(e1 AS DOUBLE) + e2), 6)
               AS share_fast
    FROM e
    """,
)
def haar_wavelet_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet energy decomposition of the daily value series:
    detail energies at scale 2 (Σd₁²/2) and scale 4 (Σd₂²/4) from two
    cascade levels of pairwise sums/differences, plus the fast-scale
    energy share. Locates WHICH timescale carries the variance —
    day-to-day noise vs multi-day swings — the multiresolution
    complement of `goertzel_periodogram_daily` (single frequency) and
    `seasonal_strength_metric` (fixed weekly split).

    Determinism: the cascade is pure integer arithmetic on exact cents
    (unnormalized Haar; the 1/2ᵏ scale factors applied exactly as
    integer divisions of 128-bit squared sums); one final division for
    the share.

    Scale shape: fact → |days| agg; each cascade level is a halving
    hash agg on the day relation. O(|days|) total.
    """
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    ev = load_table(spark, sf_dir, "events")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    daily = (
        ev.select(
            epoch_day("ts").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").cast("long").alias("v"))
    )
    idx = daily.select(
        (F.row_number().over(Window.orderBy("day")).cast("long") - 1).alias("i"),
        "v",
    )

    def cascade(df, col):
        even = F.sum(F.when(F.col("i") % 2 == 0, F.col(col)).otherwise(0))
        odd = F.sum(F.when(F.col("i") % 2 == 1, F.col(col)).otherwise(0))
        return (
            df.groupBy(F.floor(F.col("i") / 2).cast("long").alias("i2"))
            .agg(
                (even + odd).cast("long").alias("s"),
                (even - odd).cast("long").alias("d"),
                F.count(F.lit(1)).alias("k"),
            )
            .where(F.col("k") == 2)
            .select(F.col("i2").alias("i"), "s", "d")
        )

    l1 = cascade(idx, "v")
    l2 = cascade(l1.select("i", F.col("s").alias("v")), "v")
    e1 = l1.agg(
        F.floor(F.sum(dec("d") * dec("d")) / 2).cast("long").alias("e1")
    )
    e2 = l2.agg(
        F.floor(F.sum(dec("d") * dec("d")) / 4).cast("long").alias("e2")
    )
    n = idx.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return (
        n.crossJoin(F.broadcast(e1))
        .crossJoin(F.broadcast(e2))
        .select(
            "n_days",
            F.col("e1").alias("energy_scale2_cents2"),
            F.col("e2").alias("energy_scale4_cents2"),
            F.round(
                F.col("e1").cast("double")
                / (F.col("e1").cast("double") + F.col("e2")),
                6,
            ).alias("share_fast"),
        )
    )


@query(
    "dominant_period_scan",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY day
    ), idx AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) - 1 AS t,
               CAST(v AS DOUBLE) / 100.0 AS y,
               CAST(COUNT(*) OVER () AS BIGINT) AS n,
               CAST(SUM(v) OVER () AS BIGINT) AS sv
        FROM daily
    ), centered AS (
        SELECT t, y - CAST(sv AS DOUBLE) / 100.0 / n AS yc, n FROM idx
    ), periods AS (SELECT unnest([3, 4, 5, 7, 10, 14]) AS p
    ), power_ AS (
        SELECT p.p,
               ROUND((pow(SUM(c.yc * cos(2 * pi() * c.t / p.p)), 2)
                      + pow(SUM(c.yc * sin(2 * pi() * c.t / p.p)), 2))
                     / MAX(c.n), 4) AS pw
        FROM centered c, periods p GROUP BY p.p
    ), best AS (
        SELECT MAX(struct_pack(pw := pw, p := p)) AS b FROM power_
    )
    SELECT p.p AS period_days, p.pw AS power,
           CAST(CASE WHEN p.p = best.b.p THEN 1 ELSE 0 END AS BIGINT)
               AS is_dominant
    FROM power_ p, best ORDER BY p.p
    """,
)
def dominant_period_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram scan over candidate cycles {3,4,5,7,10,14} days:
    spectral power (Σy·cos)² + (Σy·sin)² per period on the centered
    daily series, with the dominant period flagged via struct-argmax
    on the ROUNDED powers. Where `goertzel_periodogram_daily` evaluates
    one known frequency and `acf_daily_event_value` works in the lag
    domain, this is the grid search that FINDS the cycle.

    Determinism: trig coefficients are fixed per (t, p); the two
    accumulations are double sums rounded to 4 before the argmax
    (which then compares identical values with a period tie-break).

    Scale shape: |days|×6 expansion of a tiny relation, one hash agg.
    """
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day
    import math

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            epoch_day("ts").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").cast("long").alias("v"))
    )
    wall = Window.partitionBy()
    idx = daily.select(
        (F.row_number().over(Window.orderBy("day")).cast("long") - 1).alias("t"),
        (F.col("v").cast("double") / 100.0).alias("y"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n"),
        F.sum("v").over(wall).cast("long").alias("sv"),
    )
    centered = idx.select(
        "t",
        (F.col("y") - F.col("sv").cast("double") / 100.0 / F.col("n")).alias(
            "yc"
        ),
        "n",
    )
    periods = spark.createDataFrame([(3,), (4,), (5,), (7,), (10,), (14,)], ["p"])
    tau = 2 * math.pi
    power_ = (
        centered.crossJoin(F.broadcast(periods))
        .groupBy("p")
        .agg(
            F.round(
                (
                    F.pow(
                        F.sum(
                            F.col("yc") * F.cos(tau * F.col("t") / F.col("p"))
                        ),
                        2,
                    )
                    + F.pow(
                        F.sum(
                            F.col("yc") * F.sin(tau * F.col("t") / F.col("p"))
                        ),
                        2,
                    )
                )
                / F.max("n"),
                4,
            ).alias("pw")
        )
    )
    wbest = Window.partitionBy()
    best = power_.withColumn(
        "b", F.max(F.struct(F.col("pw"), F.col("p"))).over(wbest)
    )
    return best.select(
        F.col("p").cast("long").alias("period_days"),
        F.col("pw").alias("power"),
        F.when(F.col("p") == F.col("b.p"), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_dominant"),
    ).orderBy("period_days")


# ---------------------------------------------------------------------------
# wave 207: cost-sensitive threshold tuning, decile lift-gains table
# ---------------------------------------------------------------------------

_LOGIT_SCORED_SQL = """
    WITH pts AS (
        SELECT o_orderkey, ln(o_totalprice) AS x,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders WHERE o_totalprice > 0
    ), f1 AS (
        SELECT (SUM(x*(4*y-2)) - SUM(x)*SUM(4*y-2)/COUNT(*))
               / (SUM(x*x) - SUM(x)*SUM(x)/COUNT(*)) AS b,
               SUM(4*y-2)/COUNT(*)
               - (SUM(x*(4*y-2)) - SUM(x)*SUM(4*y-2)/COUNT(*))
                 / (SUM(x*x) - SUM(x)*SUM(x)/COUNT(*))
                 * SUM(x)/COUNT(*) AS a
        FROM pts
    ), scored AS (
        SELECT o_orderkey, y, 1.0/(1.0+exp(-(a+b*x))) AS p
        FROM pts, f1
    )
"""


@query(
    "cost_threshold_tuning",
    oracle=_LOGIT_SCORED_SQL
    + """
    , grid AS (SELECT unnest(generate_series(1, 9)) AS t10
    ), cells AS (
        SELECT g.t10,
               CAST(SUM(CASE WHEN s.p > g.t10 / 10.0 AND s.y = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN s.p <= g.t10 / 10.0 AND s.y = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS fn
        FROM scored s, grid g GROUP BY g.t10
    ), costed AS (
        SELECT t10, fp, fn, CAST(fp + 5 * fn AS BIGINT) AS cost
        FROM cells
    ), best AS (
        SELECT MIN(struct_pack(cost := cost, t10 := t10)) AS b FROM costed
    )
    SELECT c.t10 AS threshold_x10, c.fp AS false_positives,
           c.fn AS false_negatives, c.cost AS expected_cost,
           CAST(CASE WHEN c.t10 = best.b.t10 THEN 1 ELSE 0 END AS BIGINT)
               AS is_optimal
    FROM costed c, best ORDER BY c.t10
    """,
)
def cost_threshold_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-sensitive decision threshold for the logistic status model:
    a 0.1-grid sweep counting false positives and false negatives with
    an asymmetric cost matrix (FN = 5×FP), exact cost per threshold,
    and the argmin flagged. `pr_curve_threshold_tuning` optimizes F1
    — this is the BUSINESS version where the loss matrix, not a
    symmetric summary, picks the operating point.

    Determinism: p̂ vs t comparisons use identical expression trees, so
    the confusion counts are exactly equal integers; cost argmin is a
    (cost, threshold) struct-min.

    Scale shape: one coefficient census; the 9-threshold sweep is a
    broadcast grid cross join collapsing in a single hash agg —
    thresholds never rescan the fact table individually.
    """
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    pts = o.select(
        F.log(F.col("o_totalprice")).alias("x"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    zc = 4 * F.col("y") - 2
    n = F.count(F.lit(1))
    f1 = pts.agg(
        (
            (F.sum(F.col("x") * zc) - F.sum("x") * F.sum(zc) / n)
            / (F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x") / n)
        ).alias("b"),
        (
            F.sum(zc) / n
            - (F.sum(F.col("x") * zc) - F.sum("x") * F.sum(zc) / n)
            / (F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x") / n)
            * F.sum("x")
            / n
        ).alias("a"),
    )
    scored = pts.crossJoin(F.broadcast(f1)).select(
        "y",
        (1.0 / (1.0 + F.exp(-(F.col("a") + F.col("b") * F.col("x"))))).alias("p"),
    )
    grid = spark.range(1, 10).select(F.col("id").cast("long").alias("t10"))
    cells = (
        scored.crossJoin(F.broadcast(grid))
        .groupBy("t10")
        .agg(
            F.sum(
                F.when(
                    (F.col("p") > F.col("t10") / 10.0) & (F.col("y") == 0), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("fp"),
            F.sum(
                F.when(
                    (F.col("p") <= F.col("t10") / 10.0) & (F.col("y") == 1), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("fn"),
        )
    )
    costed = cells.select(
        "t10", "fp", "fn", (F.col("fp") + 5 * F.col("fn")).cast("long").alias("cost")
    )
    wbest = Window.partitionBy()
    best = costed.withColumn(
        "b", F.min(F.struct(F.col("cost"), F.col("t10"))).over(wbest)
    )
    return best.select(
        F.col("t10").alias("threshold_x10"),
        F.col("fp").alias("false_positives"),
        F.col("fn").alias("false_negatives"),
        F.col("cost").alias("expected_cost"),
        F.when(F.col("t10") == F.col("b.t10"), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_optimal"),
    ).orderBy("threshold_x10")


@query(
    "lift_gains_deciles",
    oracle=_LOGIT_SCORED_SQL
    + """
    , binned AS (
        SELECT y, NTILE(10) OVER (ORDER BY p DESC, o_orderkey) AS d
        FROM scored
    ), cells AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM binned GROUP BY d
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(pos) AS BIGINT) AS pt
        FROM cells
    ), cum AS (
        SELECT d, n, pos,
               CAST(SUM(pos) OVER (ORDER BY d) AS BIGINT) AS cpos
        FROM cells
    )
    SELECT c.d AS decile, c.n AS n_rows, c.pos AS n_positives,
           ROUND(CAST(c.pos AS DOUBLE) / c.n
                 / (CAST(t.pt AS DOUBLE) / t.nt), 4) AS lift,
           ROUND(CAST(c.cpos AS DOUBLE) / t.pt, 6) AS cum_gain
    FROM cum c, tot t ORDER BY c.d
    """,
)
def lift_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift and cumulative-gains table for the logistic status
    score: rank all orders by p̂ descending, cut into ten equal bins,
    and report each bin's positive rate relative to base (lift) plus
    the cumulative share of all positives captured (gains). THE
    campaign-targeting readout — `auc_order_status_price` compresses
    this table to one number; marketers act on the table.

    Determinism: ntile over the total (p̂ desc, orderkey) order; all
    counts exact; two divisions per row, rounded.

    Scale shape: coefficient census + one global sort for exact
    deciles (the documented exact-rank cost — fixed p̂-cut bins are
    the sort-free variant at 100 TB), then 10-row censuses.
    """
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    pts = o.select(
        "o_orderkey",
        F.log(F.col("o_totalprice")).alias("x"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    zc = 4 * F.col("y") - 2
    n = F.count(F.lit(1))
    f1 = pts.agg(
        (
            (F.sum(F.col("x") * zc) - F.sum("x") * F.sum(zc) / n)
            / (F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x") / n)
        ).alias("b"),
        (
            F.sum(zc) / n
            - (F.sum(F.col("x") * zc) - F.sum("x") * F.sum(zc) / n)
            / (F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x") / n)
            * F.sum("x")
            / n
        ).alias("a"),
    )
    scored = pts.crossJoin(F.broadcast(f1)).select(
        "o_orderkey",
        "y",
        (1.0 / (1.0 + F.exp(-(F.col("a") + F.col("b") * F.col("x"))))).alias("p"),
    )
    from pyspark_movie_recommender_spark.operators.rank import (
        distributed_ntile,
    )

    # decile assignment over the per-order scores (fact-grain) via the
    # distributed rank machinery (key = −p for the DESC order) — never
    # a single-task global window.
    binned = distributed_ntile(
        scored.withColumn("__np", -F.col("p")),
        "__np",
        "o_orderkey",
        10,
        out_col="d",
    ).select("y", "d")
    cells = binned.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    cells = _ckpt(cells)  # shared fan-out relation
    tot = cells.agg(
        F.sum("n").cast("long").alias("nt"), F.sum("pos").cast("long").alias("pt")
    )
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "d", "n", "pos", F.sum("pos").over(wcum).cast("long").alias("cpos")
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        F.col("d").cast("long").alias("decile"),
        F.col("n").alias("n_rows"),
        F.col("pos").alias("n_positives"),
        F.round(
            F.col("pos").cast("double")
            / F.col("n")
            / (F.col("pt").cast("double") / F.col("nt")),
            4,
        ).alias("lift"),
        F.round(F.col("cpos").cast("double") / F.col("pt"), 6).alias("cum_gain"),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# wave 208: BCG growth-share matrix, cross-price elasticity
# ---------------------------------------------------------------------------


@query(
    "bcg_growth_share_matrix",
    oracle="""
    WITH span AS (
        SELECT MIN(epoch_us(o_orderdate)) AS lo, MAX(epoch_us(o_orderdate)) AS hi
        FROM orders
    ), flows AS (
        SELECT p.p_brand AS brand,
               CASE WHEN epoch_us(o.o_orderdate) * 2 <= s.lo + s.hi
                    THEN 0 ELSE 1 END AS period,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey, span s
        GROUP BY brand, period
    ), wide AS (
        SELECT brand,
               COALESCE(MAX(CASE WHEN period=0 THEN rev END), 0) AS r0,
               COALESCE(MAX(CASE WHEN period=1 THEN rev END), 0) AS r1
        FROM flows GROUP BY brand
        HAVING COALESCE(MAX(CASE WHEN period=0 THEN rev END), 0) > 0
    ), mkt AS (
        SELECT CAST(SUM(r1) AS BIGINT) AS total1,
               CAST(MAX(r1) AS BIGINT) AS leader1,
               CAST(SUM(r1) AS DOUBLE) / CAST(SUM(r0) AS DOUBLE) - 1.0
                   AS mkt_growth
        FROM wide
    )
    SELECT w.brand,
           ROUND(CAST(w.r1 AS DOUBLE) / m.leader1, 6) AS relative_share,
           ROUND(CAST(w.r1 AS DOUBLE) / w.r0 - 1.0, 6) AS growth,
           CASE
             WHEN CAST(w.r1 AS DOUBLE) / m.leader1 >= 0.75
                  AND CAST(w.r1 AS DOUBLE) / w.r0 - 1.0 >= m.mkt_growth
                 THEN 'star'
             WHEN CAST(w.r1 AS DOUBLE) / m.leader1 >= 0.75 THEN 'cash_cow'
             WHEN CAST(w.r1 AS DOUBLE) / w.r0 - 1.0 >= m.mkt_growth
                 THEN 'question_mark'
             ELSE 'dog' END AS quadrant
    FROM wide w, mkt m ORDER BY w.brand
    """,
)
def bcg_growth_share_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BCG growth-share matrix over brands: relative share (H2 revenue
    vs the leader's) against growth (H2/H1 − 1) with the market's own
    growth as the vertical cut and 0.75× leader as the horizontal —
    star / cash-cow / question-mark / dog quadrants. The portfolio-
    strategy classification sitting above `abc_xyz_matrix`
    (volume/stability) and `rank_movers_weekly` (rank deltas).

    Determinism: period revenues exact cents; shares/growth single
    divisions rounded; quadrant cuts compare unrounded fixed
    expressions identically on both engines.

    Scale shape: fact + broadcast dims → |brands|×2 agg → 1-row market
    census broadcast back over the 25-row brand relation.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    em = F.expr("unix_micros(CAST(o_orderdate AS timestamp_ltz))")
    span = o.agg(F.min(em).alias("lo"), F.max(em).alias("hi"))
    flows = (
        li.join(
            o.select(F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"),
            "l_orderkey",
        )
        .join(
            F.broadcast(p.select(F.col("p_partkey").alias("l_partkey"), "p_brand")),
            "l_partkey",
        )
        .crossJoin(F.broadcast(span))
        .select(
            F.col("p_brand").alias("brand"),
            F.when(em * 2 <= F.col("lo") + F.col("hi"), 0).otherwise(1).alias(
                "period"
            ),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("brand", "period")
        .agg(F.sum("cents").cast("long").alias("rev"))
    )
    wide = (
        flows.groupBy("brand")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("period") == 0, F.col("rev"))), F.lit(0)
            ).alias("r0"),
            F.coalesce(
                F.max(F.when(F.col("period") == 1, F.col("rev"))), F.lit(0)
            ).alias("r1"),
        )
        .where(F.col("r0") > 0)
    )
    wide = _ckpt(wide)  # shared fan-out relation
    mkt = wide.agg(
        F.max("r1").cast("long").alias("leader1"),
        (F.sum("r1").cast("double") / F.sum("r0").cast("double") - 1.0).alias(
            "mkt_growth"
        ),
    )
    share = F.col("r1").cast("double") / F.col("leader1")
    growth = F.col("r1").cast("double") / F.col("r0") - 1.0
    return wide.crossJoin(F.broadcast(mkt)).select(
        "brand",
        F.round(share, 6).alias("relative_share"),
        F.round(growth, 6).alias("growth"),
        F.when(
            (share >= 0.75) & (growth >= F.col("mkt_growth")), "star"
        )
        .when(share >= 0.75, "cash_cow")
        .when(growth >= F.col("mkt_growth"), "question_mark")
        .otherwise("dog")
        .alias("quadrant"),
    ).orderBy("brand")


@query(
    "cross_price_elasticity",
    oracle="""
    WITH weekly AS (
        SELECT CAST(epoch_us(o.o_orderdate) // 604800000000 AS BIGINT) AS wk,
               p.p_type AS ptype,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type IN ('STANDARD', 'PROMO')
        GROUP BY wk, ptype
    ), wide AS (
        SELECT wk,
               MAX(CASE WHEN ptype='STANDARD'
                   THEN CAST(rev AS DOUBLE) / qty END) AS p_std,
               MAX(CASE WHEN ptype='PROMO' THEN qty END) AS q_promo
        FROM weekly GROUP BY wk
        HAVING MAX(CASE WHEN ptype='STANDARD'
                   THEN CAST(rev AS DOUBLE) / qty END) IS NOT NULL
           AND MAX(CASE WHEN ptype='PROMO' THEN qty END) IS NOT NULL
    ), pts AS (
        SELECT ln(p_std) AS x, ln(CAST(q_promo AS DOUBLE)) AS y FROM wide
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_weeks,
           ROUND(regr_slope(y, x), 6) AS cross_elasticity,
           ROUND(regr_r2(y, x), 6) AS fit_r2,
           CAST(CASE WHEN regr_slope(y, x) > 0 THEN 1 ELSE 0 END AS BIGINT)
               AS substitutes
    FROM pts
    """,
)
def cross_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-price elasticity: regress ln(weekly PROMO quantity) on
    ln(weekly STANDARD unit price) — slope > 0 marks the two types as
    substitutes (STANDARD price hikes push demand into PROMO), < 0 as
    complements. Completes the pricing micro-suite:
    `price_elasticity_loglog` measures OWN-price response; cross-price
    is what a repricing decision actually perturbs elsewhere.

    Determinism: weekly revenue/quantity exact; unit price and the
    ln-ln regression use regr_* with identical definitions; rounded
    once each; the substitutes flag reads the unrounded slope.

    Scale shape: fact + broadcast dims filtered to two types →
    |weeks|×2 agg → pivot → tiny regression census.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    ow = F.expr(
        "unix_micros(CAST(o_orderdate AS timestamp_ltz)) div 604800000000"
    ).cast("long")
    weekly = (
        li.join(
            o.select(F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"),
            "l_orderkey",
        )
        .join(
            F.broadcast(
                p.select(F.col("p_partkey").alias("l_partkey"), "p_type").where(
                    F.col("p_type").isin("STANDARD", "PROMO")
                )
            ),
            "l_partkey",
        )
        .groupBy(ow.alias("wk"), F.col("p_type").alias("ptype"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("rev"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
        )
    )
    wide = (
        weekly.groupBy("wk")
        .agg(
            F.max(
                F.when(
                    F.col("ptype") == "STANDARD",
                    F.col("rev").cast("double") / F.col("qty"),
                )
            ).alias("p_std"),
            F.max(F.when(F.col("ptype") == "PROMO", F.col("qty"))).alias(
                "q_promo"
            ),
        )
        .where(F.col("p_std").isNotNull() & F.col("q_promo").isNotNull())
    )
    pts = wide.select(
        F.log("p_std").alias("x"),
        F.log(F.col("q_promo").cast("double")).alias("y"),
    )
    slope = F.regr_slope("y", "x")
    return pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_weeks"),
        F.round(slope, 6).alias("cross_elasticity"),
        F.round(F.regr_r2("y", "x"), 6).alias("fit_r2"),
        F.when(slope > 0, 1).otherwise(0).cast("long").alias("substitutes"),
    )


# ---------------------------------------------------------------------------
# wave 209: gravity model of trade flows, CR4/CR8 concentration ratios
# ---------------------------------------------------------------------------


@query(
    "gravity_trade_model",
    oracle="""
    WITH flows AS (
        SELECT s.s_nationkey AS sn, c.c_nationkey AS cn,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS f
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY sn, cn
    ), mass AS (
        SELECT sn, cn, f,
               CAST(SUM(f) OVER (PARTITION BY sn) AS BIGINT) AS ms,
               CAST(SUM(f) OVER (PARTITION BY cn) AS BIGINT) AS mc
        FROM flows
    ), pts AS (
        SELECT ln(CAST(f AS DOUBLE)) AS y,
               ln(CAST(ms AS DOUBLE)) AS x1,
               ln(CAST(mc AS DOUBLE)) AS x2
        FROM mass WHERE f > 0
    ), mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x1) AS s1, SUM(x2) AS s2, SUM(y) AS sy,
               SUM(x1*x1) AS s11, SUM(x2*x2) AS s22, SUM(x1*x2) AS s12,
               SUM(x1*y) AS s1y, SUM(x2*y) AS s2y, SUM(y*y) AS syy
        FROM pts
    ), c AS (
        SELECT n,
               s11 - s1*s1/n AS c11, s22 - s2*s2/n AS c22,
               s12 - s1*s2/n AS c12, s1y - s1*sy/n AS c1y,
               s2y - s2*sy/n AS c2y, syy - sy*sy/n AS cyy
        FROM mom
    )
    SELECT n AS n_pairs,
           ROUND((c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12), 6)
               AS supplier_mass_exp,
           ROUND((c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12), 6)
               AS customer_mass_exp,
           ROUND(((c22 * c1y - c12 * c2y) * c1y
                  + (c11 * c2y - c12 * c1y) * c2y)
                 / ((c11 * c22 - c12 * c12) * cyy), 6) AS r2
    FROM c
    """,
)
def gravity_trade_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gravity model of the nation-to-nation trade network: regress
    ln(flow) on ln(supplier-nation mass) and ln(customer-nation mass)
    over the 25×25 flow matrix — the workhorse of empirical trade (mass
    exponents near 1 = classic gravity; R² says how much of the network
    is pure size). Builds the MODEL on the flows that
    `cross_nation_volume` tabulates and `pagerank_trade_graph` ranks.

    Determinism: flows and masses exact cents; the two-regressor OLS is
    the closed-form moment algebra of `ridge_regression_price` (double
    sums over the 625-row relation, identical trees), rounded once per
    coefficient.

    Scale shape: one fact join chain (dims broadcast; orders co-keyed)
    → 625-cell matrix; marginal windows and the regression census on
    that tiny relation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    flows = (
        li.join(
            F.broadcast(s.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")),
            "l_suppkey",
        )
        .join(
            o.select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"),
            "l_orderkey",
        )
        .join(
            F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")),
            "o_custkey",
        )
        .groupBy(
            F.col("s_nationkey").alias("sn"), F.col("c_nationkey").alias("cn")
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("f")
        )
    )
    mass = flows.select(
        "f",
        F.sum("f").over(Window.partitionBy("sn")).cast("long").alias("ms"),
        F.sum("f").over(Window.partitionBy("cn")).cast("long").alias("mc"),
    )
    pts = mass.where(F.col("f") > 0).select(
        F.log(F.col("f").cast("double")).alias("y"),
        F.log(F.col("ms").cast("double")).alias("x1"),
        F.log(F.col("mc").cast("double")).alias("x2"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cc = mom.select(
        "n",
        (F.col("s11") - F.col("s1") * F.col("s1") / F.col("n")).alias("c11"),
        (F.col("s22") - F.col("s2") * F.col("s2") / F.col("n")).alias("c22"),
        (F.col("s12") - F.col("s1") * F.col("s2") / F.col("n")).alias("c12"),
        (F.col("s1y") - F.col("s1") * F.col("sy") / F.col("n")).alias("c1y"),
        (F.col("s2y") - F.col("s2") * F.col("sy") / F.col("n")).alias("c2y"),
        (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")).alias("cyy"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    b1 = (F.col("c22") * F.col("c1y") - F.col("c12") * F.col("c2y")) / det
    b2 = (F.col("c11") * F.col("c2y") - F.col("c12") * F.col("c1y")) / det
    r2 = (
        (F.col("c22") * F.col("c1y") - F.col("c12") * F.col("c2y")) * F.col("c1y")
        + (F.col("c11") * F.col("c2y") - F.col("c12") * F.col("c1y"))
        * F.col("c2y")
    ) / (det * F.col("cyy"))
    return cc.select(
        F.col("n").alias("n_pairs"),
        F.round(b1, 6).alias("supplier_mass_exp"),
        F.round(b2, 6).alias("customer_mass_exp"),
        F.round(r2, 6).alias("r2"),
    )


@query(
    "concentration_cr4_cr8",
    oracle="""
    WITH rev AS (
        SELECT p.p_type AS ptype, p.p_brand AS brand,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS r
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY ptype, brand
    ), ranked AS (
        SELECT ptype, brand, r,
               ROW_NUMBER() OVER (PARTITION BY ptype ORDER BY r DESC, brand)
                   AS rk,
               CAST(SUM(r) OVER (PARTITION BY ptype) AS BIGINT) AS tot
        FROM rev
    )
    SELECT ptype AS part_type,
           CAST(MAX(tot) AS BIGINT) AS total_cents,
           CAST(SUM(CASE WHEN rk <= 4 THEN r ELSE 0 END) * 1000000
                // MAX(tot) AS BIGINT) AS cr4_ppm,
           CAST(SUM(CASE WHEN rk <= 8 THEN r ELSE 0 END) * 1000000
                // MAX(tot) AS BIGINT) AS cr8_ppm,
           CAST(COUNT(*) AS BIGINT) AS n_brands
    FROM ranked GROUP BY ptype ORDER BY ptype
    """,
)
def concentration_cr4_cr8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four- and eight-firm concentration ratios per part type: the
    revenue share (exact ppm) of the top-4 and top-8 brands — the
    antitrust-standard cousins of `hhi_supplier_concentration` (CRₖ
    reads directly as 'how much do the leaders own', where HHI weights
    squares). Brand rank ties break lexicographically.

    Determinism: exact cent revenues, row_number with total order,
    integer floor-division ppm.

    Scale shape: fact + broadcast dim → |type|×|brand| agg; rank
    windows on the 150-row relation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = (
        li.join(
            F.broadcast(
                p.select(F.col("p_partkey").alias("l_partkey"), "p_type", "p_brand")
            ),
            "l_partkey",
        )
        .groupBy(F.col("p_type").alias("ptype"), F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("r")
        )
    )
    wt = Window.partitionBy("ptype")
    ranked = rev.select(
        "ptype",
        "r",
        F.row_number()
        .over(wt.orderBy(F.col("r").desc(), "brand"))
        .alias("rk"),
        F.sum("r").over(wt).cast("long").alias("tot"),
    )
    return (
        ranked.groupBy("ptype")
        .agg(
            F.max("tot").cast("long").alias("total_cents"),
            F.floor(
                F.sum(F.when(F.col("rk") <= 4, F.col("r")).otherwise(0))
                * 1000000
                / F.max("tot")
            )
            .cast("long")
            .alias("cr4_ppm"),
            F.floor(
                F.sum(F.when(F.col("rk") <= 8, F.col("r")).otherwise(0))
                * 1000000
                / F.max("tot")
            )
            .cast("long")
            .alias("cr8_ppm"),
            F.count(F.lit(1)).cast("long").alias("n_brands"),
        )
        .select(
            F.col("ptype").alias("part_type"),
            "total_cents",
            "cr4_ppm",
            "cr8_ppm",
            "n_brands",
        )
        .orderBy("part_type")
    )


# ---------------------------------------------------------------------------
# wave 210: two-state HMM Viterbi decoding and forward likelihood
# ---------------------------------------------------------------------------

_HMM_DAILY_SQL = """
    WITH RECURSIVE daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               ROUND(SUM(value) / 1000.0, 6) AS y
        FROM events GROUP BY day
    ), params AS (
        SELECT quantile_disc(y, 0.25) AS mu_lo,
               quantile_disc(y, 0.75) AS mu_hi,
               GREATEST(quantile_disc(y, 0.75) - quantile_disc(y, 0.25),
                        0.000001) AS sig
        FROM daily
    ), idx AS (
        SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM daily
    )
"""


@query(
    "hmm_viterbi_daily",
    oracle=_HMM_DAILY_SQL
    + """
    , rec AS (
        SELECT i.i, i.n,
               -(i.y - p.mu_lo)*(i.y - p.mu_lo)/(2*p.sig*p.sig) AS v_lo,
               -(i.y - p.mu_hi)*(i.y - p.mu_hi)/(2*p.sig*p.sig) AS v_hi,
               CAST(0 AS BIGINT) AS switches_lo,
               CAST(0 AS BIGINT) AS switches_hi
        FROM idx i, params p WHERE i.i = 1
        UNION ALL
        SELECT d.i, d.n,
               GREATEST(r.v_lo + ln(0.9), r.v_hi + ln(0.1))
                 - (d.y - p.mu_lo)*(d.y - p.mu_lo)/(2*p.sig*p.sig),
               GREATEST(r.v_hi + ln(0.9), r.v_lo + ln(0.1))
                 - (d.y - p.mu_hi)*(d.y - p.mu_hi)/(2*p.sig*p.sig),
               CASE WHEN r.v_lo + ln(0.9) >= r.v_hi + ln(0.1)
                    THEN r.switches_lo ELSE r.switches_hi + 1 END,
               CASE WHEN r.v_hi + ln(0.9) >= r.v_lo + ln(0.1)
                    THEN r.switches_hi ELSE r.switches_lo + 1 END
        FROM rec r JOIN idx d ON d.i = r.i + 1, params p
    )
    SELECT n AS n_days,
           CAST(CASE WHEN v_hi >= v_lo THEN 1 ELSE 0 END AS BIGINT)
               AS final_state_high,
           CAST(CASE WHEN v_hi >= v_lo THEN switches_hi ELSE switches_lo END
                AS BIGINT) AS n_switches,
           ROUND(GREATEST(v_lo, v_hi), 4) AS viterbi_logscore
    FROM rec WHERE i = n
    """,
)
def hmm_viterbi_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-state Gaussian-emission HMM Viterbi decode of the daily value
    series (low/high demand regimes; μ = P25/P75, shared σ = IQR,
    sticky 0.9/0.1 transitions): the max-product recursion δₜ(s) as an
    `aggregate` HOF fold carrying both state scores and their
    switch counts, oracle-unrolled as a recursive CTE. The REGIME
    decoder that `cusum_changepoint_daily` (one break) and
    `markov_entropy_rate` (observed transitions) don't give: a
    maximum-likelihood state PATH.

    Determinism: inputs rounded to 6 (thousands scale) before the
    fold; parameters are exact discrete quantiles; both engines
    evaluate one shared IEEE dag per step; score rounded once. (Path
    count via argmax-side bookkeeping; ties broken toward staying.)

    Scale shape: |days| reduce → bounded array → in-row fold. The
    per-key HMM shape for fleets: groupBy key first, fold per series.
    """
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(epoch_day("ts").alias("day")).agg(
        F.round(F.sum("value") / 1000.0, 6).alias("y")
    )
    params = daily.agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY y)").alias("mu_lo"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY y)").alias("mu_hi"),
        F.greatest(
            F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY y)")
            - F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY y)"),
            F.lit(0.000001),
        ).alias("sig"),
    )
    series = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "y"))).alias("arr")
    ).crossJoin(F.broadcast(params))
    fold = """
    aggregate(
      slice(transform(arr, x -> x.y), 2, greatest(size(arr) - 1, 0)),
      named_struct(
        'v_lo', -(arr[0].y - mu_lo)*(arr[0].y - mu_lo)/(2*sig*sig),
        'v_hi', -(arr[0].y - mu_hi)*(arr[0].y - mu_hi)/(2*sig*sig),
        'sw_lo', CAST(0 AS BIGINT), 'sw_hi', CAST(0 AS BIGINT)),
      (acc, y) -> named_struct(
        'v_lo', greatest(acc.v_lo + ln(0.9), acc.v_hi + ln(0.1))
                - (y - mu_lo)*(y - mu_lo)/(2*sig*sig),
        'v_hi', greatest(acc.v_hi + ln(0.9), acc.v_lo + ln(0.1))
                - (y - mu_hi)*(y - mu_hi)/(2*sig*sig),
        'sw_lo', CASE WHEN acc.v_lo + ln(0.9) >= acc.v_hi + ln(0.1)
                 THEN acc.sw_lo ELSE acc.sw_hi + 1 END,
        'sw_hi', CASE WHEN acc.v_hi + ln(0.9) >= acc.v_lo + ln(0.1)
                 THEN acc.sw_hi ELSE acc.sw_lo + 1 END))
    """
    fitted = series.select(
        F.size("arr").cast("long").alias("n_days"), F.expr(fold).alias("h")
    )
    return fitted.select(
        "n_days",
        F.when(F.col("h.v_hi") >= F.col("h.v_lo"), 1)
        .otherwise(0)
        .cast("long")
        .alias("final_state_high"),
        F.when(F.col("h.v_hi") >= F.col("h.v_lo"), F.col("h.sw_hi"))
        .otherwise(F.col("h.sw_lo"))
        .cast("long")
        .alias("n_switches"),
        F.round(F.greatest(F.col("h.v_lo"), F.col("h.v_hi")), 4).alias(
            "viterbi_logscore"
        ),
    )


@query(
    "hmm_forward_likelihood",
    oracle=_HMM_DAILY_SQL
    + """
    , rec AS (
        SELECT i.i, i.n,
               ln(0.5) - (i.y - p.mu_lo)*(i.y - p.mu_lo)/(2*p.sig*p.sig)
                   AS a_lo,
               ln(0.5) - (i.y - p.mu_hi)*(i.y - p.mu_hi)/(2*p.sig*p.sig)
                   AS a_hi
        FROM idx i, params p WHERE i.i = 1
        UNION ALL
        SELECT d.i, d.n,
               GREATEST(r.a_lo + ln(0.9), r.a_hi + ln(0.1))
               + ln(exp(LEAST(r.a_lo + ln(0.9), r.a_hi + ln(0.1))
                        - GREATEST(r.a_lo + ln(0.9), r.a_hi + ln(0.1)))
                    + 1.0)
               - (d.y - p.mu_lo)*(d.y - p.mu_lo)/(2*p.sig*p.sig),
               GREATEST(r.a_hi + ln(0.9), r.a_lo + ln(0.1))
               + ln(exp(LEAST(r.a_hi + ln(0.9), r.a_lo + ln(0.1))
                        - GREATEST(r.a_hi + ln(0.9), r.a_lo + ln(0.1)))
                    + 1.0)
               - (d.y - p.mu_hi)*(d.y - p.mu_hi)/(2*p.sig*p.sig)
        FROM rec r JOIN idx d ON d.i = r.i + 1, params p
    )
    SELECT n AS n_days,
           ROUND(GREATEST(a_lo, a_hi)
                 + ln(exp(LEAST(a_lo, a_hi) - GREATEST(a_lo, a_hi)) + 1.0),
                 4) AS forward_loglik,
           ROUND(a_hi - a_lo, 4) AS final_odds_log
    FROM rec WHERE i = n
    """,
)
def hmm_forward_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HMM forward algorithm on the same two-regime model: total
    log-likelihood via the log-sum-exp recursion αₜ(s), plus the final
    posterior log-odds of the high regime. Where
    `hmm_viterbi_daily` commits to ONE path, the forward pass
    marginalizes over all 2ᵀ of them — the quantity model selection
    (state count, stickiness) actually needs.

    Determinism: shared IEEE dag via the max-anchored log-sum-exp
    (GREATEST + ln(exp(min−max)+1)) written identically on both
    engines; inputs/params as in Viterbi; rounded once.

    Scale shape: identical — reduce, bounded array, in-row fold.
    """
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(epoch_day("ts").alias("day")).agg(
        F.round(F.sum("value") / 1000.0, 6).alias("y")
    )
    params = daily.agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY y)").alias("mu_lo"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY y)").alias("mu_hi"),
        F.greatest(
            F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY y)")
            - F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY y)"),
            F.lit(0.000001),
        ).alias("sig"),
    )
    series = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "y"))).alias("arr")
    ).crossJoin(F.broadcast(params))
    lse = (
        "greatest({a}, {b}) + ln(exp(least({a}, {b}) - greatest({a}, {b})) + 1.0)"
    )
    t_lo = lse.format(a="acc.a_lo + ln(0.9)", b="acc.a_hi + ln(0.1)")
    t_hi = lse.format(a="acc.a_hi + ln(0.9)", b="acc.a_lo + ln(0.1)")
    fold = f"""
    aggregate(
      slice(transform(arr, x -> x.y), 2, greatest(size(arr) - 1, 0)),
      named_struct(
        'a_lo', ln(0.5) - (arr[0].y - mu_lo)*(arr[0].y - mu_lo)/(2*sig*sig),
        'a_hi', ln(0.5) - (arr[0].y - mu_hi)*(arr[0].y - mu_hi)/(2*sig*sig)),
      (acc, y) -> named_struct(
        'a_lo', {t_lo} - (y - mu_lo)*(y - mu_lo)/(2*sig*sig),
        'a_hi', {t_hi} - (y - mu_hi)*(y - mu_hi)/(2*sig*sig)))
    """
    fitted = series.select(
        F.size("arr").cast("long").alias("n_days"), F.expr(fold).alias("h")
    )
    final_lse = F.greatest(F.col("h.a_lo"), F.col("h.a_hi")) + F.log(
        F.exp(
            F.least(F.col("h.a_lo"), F.col("h.a_hi"))
            - F.greatest(F.col("h.a_lo"), F.col("h.a_hi"))
        )
        + 1.0
    )
    return fitted.select(
        "n_days",
        F.round(final_lse, 4).alias("forward_loglik"),
        F.round(F.col("h.a_hi") - F.col("h.a_lo"), 4).alias("final_odds_log"),
    )


# ---------------------------------------------------------------------------
# wave 211: absorbing Markov chain, conversion hazard by session depth
# ---------------------------------------------------------------------------


@query(
    "absorbing_markov_purchase",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ), trans AS (
        SELECT CASE WHEN event_type = 'view' THEN 'view' ELSE 'other' END
                   AS s,
               CASE WHEN nxt = 'purchase' THEN 'absorb'
                    WHEN nxt = 'view' THEN 'view' ELSE 'other' END AS t,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE nxt IS NOT NULL AND event_type <> 'purchase'
        GROUP BY s, t
    ), q AS (
        SELECT
          CAST(SUM(CASE WHEN s='view' AND t='view' THEN n END) AS DOUBLE)
              / SUM(CASE WHEN s='view' THEN n END) AS qvv,
          CAST(SUM(CASE WHEN s='view' AND t='other' THEN n END) AS DOUBLE)
              / SUM(CASE WHEN s='view' THEN n END) AS qvo,
          CAST(SUM(CASE WHEN s='other' AND t='view' THEN n END) AS DOUBLE)
              / SUM(CASE WHEN s='other' THEN n END) AS qov,
          CAST(SUM(CASE WHEN s='other' AND t='other' THEN n END) AS DOUBLE)
              / SUM(CASE WHEN s='other' THEN n END) AS qoo,
          CAST(SUM(n) AS BIGINT) AS n_transitions
        FROM trans
    ), fund AS (
        -- N = (I - Q)^-1 for the 2x2 transient block
        SELECT n_transitions, qvv, qoo,
               (1 - qoo) / ((1-qvv)*(1-qoo) - qvo*qov) AS n11,
               qvo / ((1-qvv)*(1-qoo) - qvo*qov) AS n12,
               qov / ((1-qvv)*(1-qoo) - qvo*qov) AS n21,
               (1 - qvv) / ((1-qvv)*(1-qoo) - qvo*qov) AS n22
        FROM q
    )
    SELECT n_transitions,
           ROUND(n11 + n12, 4) AS exp_steps_from_view,
           ROUND(n21 + n22, 4) AS exp_steps_from_other,
           ROUND(qvv, 6) AS p_view_view,
           ROUND(qoo, 6) AS p_other_other
    FROM fund
    """,
)
def absorbing_markov_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorbing Markov chain on the event stream with PURCHASE as the
    absorbing state and {view, other} transient states: fundamental
    matrix N = (I−Q)⁻¹ in closed 2×2 form, giving the EXPECTED number
    of events until purchase from each starting state. The
    forward-looking model on the same transitions
    `event_transition_matrix` tabulates and
    `markov_removal_attribution` perturbs — N·1 is the 'how long until
    conversion' answer per entry state.

    Determinism: transition counts exact (total (ts, event_id) order);
    Q entries are single divisions; the 2×2 inverse is fixed algebra;
    rounded once each.

    Scale shape: one lead window per user (shuffle on user_id), 4-cell
    agg, scalar algebra. Nothing else.
    """
    ev = load_table(spark, sf_dir, "events")
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(wl).alias("nxt")
    )
    trans = (
        seq.where(F.col("nxt").isNotNull() & (F.col("event_type") != "purchase"))
        .select(
            F.when(F.col("event_type") == "view", "view")
            .otherwise("other")
            .alias("s"),
            F.when(F.col("nxt") == "purchase", "absorb")
            .when(F.col("nxt") == "view", "view")
            .otherwise("other")
            .alias("t"),
        )
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )

    def cell(s, t):
        return F.sum(F.when((F.col("s") == s) & (F.col("t") == t), F.col("n")))

    def row(s):
        return F.sum(F.when(F.col("s") == s, F.col("n")))

    q = trans.agg(
        (cell("view", "view").cast("double") / row("view")).alias("qvv"),
        (cell("view", "other").cast("double") / row("view")).alias("qvo"),
        (cell("other", "view").cast("double") / row("other")).alias("qov"),
        (cell("other", "other").cast("double") / row("other")).alias("qoo"),
        F.sum("n").cast("long").alias("n_transitions"),
    )
    det = (1 - F.col("qvv")) * (1 - F.col("qoo")) - F.col("qvo") * F.col("qov")
    fund = q.select(
        "n_transitions",
        "qvv",
        "qoo",
        ((1 - F.col("qoo")) / det).alias("n11"),
        (F.col("qvo") / det).alias("n12"),
        (F.col("qov") / det).alias("n21"),
        ((1 - F.col("qvv")) / det).alias("n22"),
    )
    return fund.select(
        "n_transitions",
        F.round(F.col("n11") + F.col("n12"), 4).alias("exp_steps_from_view"),
        F.round(F.col("n21") + F.col("n22"), 4).alias("exp_steps_from_other"),
        F.round(F.col("qvv"), 6).alias("p_view_view"),
        F.round(F.col("qoo"), 6).alias("p_other_other"),
    )


@query(
    "conversion_hazard_by_depth",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS k
        FROM events
    ), firstp AS (
        SELECT user_id, MIN(k) AS kp FROM seq
        WHERE event_type = 'purchase' GROUP BY user_id
    ), horizon AS (
        SELECT s.user_id, MAX(s.k) AS kmax, MIN(f.kp) AS kp
        FROM seq s LEFT JOIN firstp f ON f.user_id = s.user_id
        GROUP BY s.user_id
    ), depth AS (
        SELECT g.d,
               CAST(SUM(CASE WHEN COALESCE(h.kp, h.kmax + 1) >= g.d
                        THEN 1 ELSE 0 END) AS BIGINT) AS at_risk,
               CAST(SUM(CASE WHEN h.kp = g.d THEN 1 ELSE 0 END) AS BIGINT)
                   AS converted
        FROM horizon h, (SELECT unnest(generate_series(1, 8)) AS d) g
        WHERE h.kmax >= g.d OR COALESCE(h.kp, 0) >= g.d
        GROUP BY g.d
    )
    SELECT d AS depth, at_risk, converted,
           CAST(converted * 1000000 // at_risk AS BIGINT) AS hazard_ppm
    FROM depth ORDER BY d
    """,
)
def conversion_hazard_by_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time conversion hazard by SESSION DEPTH: at each event
    index k = 1..8, the share of still-unconverted users whose k-th
    event is their first purchase (exact ppm). The event-count
    companion of `kaplan_meier_signup_purchase` (calendar time) —
    depth hazard tells you WHERE in the journey to intervene, and its
    empirical curve is what `absorbing_markov_purchase`'s geometric
    model should reproduce if the chain is memoryless.

    Determinism: ranks are total-ordered; risk sets and conversions
    are exact counts; hazard is integer floor-division ppm.

    Scale shape: one rank window per user, per-user census, broadcast
    8-row depth grid, conditional agg. No per-depth rescans.
    """
    ev = load_table(spark, sf_dir, "events")
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(wl).alias("k")
    )
    per_user = seq.groupBy("user_id").agg(
        F.max("k").alias("kmax"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("k"))).alias("kp"),
    )
    grid = spark.range(1, 9).select(F.col("id").cast("long").alias("d"))
    depth = (
        per_user.crossJoin(F.broadcast(grid))
        .where(
            (F.col("kmax") >= F.col("d"))
            | (F.coalesce(F.col("kp"), F.lit(0)) >= F.col("d"))
        )
        .groupBy("d")
        .agg(
            F.sum(
                F.when(
                    F.coalesce(F.col("kp"), F.col("kmax") + 1) >= F.col("d"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("at_risk"),
            F.sum(F.when(F.col("kp") == F.col("d"), 1).otherwise(0))
            .cast("long")
            .alias("converted"),
        )
    )
    return depth.select(
        F.col("d").alias("depth"),
        "at_risk",
        "converted",
        F.floor(F.col("converted") * 1000000 / F.col("at_risk"))
        .cast("long")
        .alias("hazard_ppm"),
    ).orderBy("depth")


# ---------------------------------------------------------------------------
# wave 212: PSI feature drift panel, exact KS feature drift panel
# ---------------------------------------------------------------------------

_FEATURE_HALVES_SQL = """
    WITH span AS (
        SELECT MIN(epoch_us(o_orderdate)) AS lo, MAX(epoch_us(o_orderdate)) AS hi
        FROM orders
    ), feats AS (
        SELECT CASE WHEN epoch_us(o.o_orderdate) * 2 <= s.lo + s.hi
                    THEN 0 ELSE 1 END AS h,
               f.feat, f.val
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey, span s,
        LATERAL (SELECT * FROM (VALUES
            ('price', CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                      // 500000),
            ('qty', CAST(l.l_quantity AS BIGINT) // 10),
            ('disc', CAST(ROUND(l.l_discount * 100) AS BIGINT) // 2),
            ('tax', CAST(ROUND(l.l_tax * 100) AS BIGINT) // 2))
            AS t(feat, val)) f
    )
"""


@query(
    "psi_feature_panel",
    oracle=_FEATURE_HALVES_SQL
    + """
    , cells AS (
        SELECT feat, val,
               CAST(SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        FROM feats GROUP BY feat, val
    ), tot AS (
        SELECT feat, CAST(SUM(n0) AS BIGINT) AS t0,
               CAST(SUM(n1) AS BIGINT) AS t1
        FROM cells GROUP BY feat
    ), terms AS (
        SELECT c.feat,
               ROUND((GREATEST(c.n1, 1) * 1.0 / t.t1
                      - GREATEST(c.n0, 1) * 1.0 / t.t0)
                     * ln((GREATEST(c.n1, 1) * 1.0 / t.t1)
                          / (GREATEST(c.n0, 1) * 1.0 / t.t0)), 9) AS term
        FROM cells c JOIN tot t ON t.feat = c.feat
    )
    SELECT feat AS feature, CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(SUM(term), 6) AS psi,
           CAST(CASE WHEN SUM(term) > 0.2 THEN 2
                     WHEN SUM(term) > 0.1 THEN 1 ELSE 0 END AS BIGINT)
               AS drift_class
    FROM terms GROUP BY feat ORDER BY feat
    """,
)
def psi_feature_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index panel: PSI between the first and
    second half of the order window for four binned lineitem features
    at once, with the industry 0.1/0.2 amber/red cuts. Generalizes
    `psi_drift_order_value` (one metric) to the model-feature PANEL a
    scoring pipeline actually monitors — same unpivot shape as
    `feature_ranking_gini`.

    Determinism: bin counts exact (zero-count bins floored at 1 — the
    standard PSI smoothing, identical on both sides); each bin's term
    rounded to 9 before the per-feature sum (recurrence-input
    pattern); final round 6, class cuts on the unrounded sum.

    Scale shape: one fact pass exploded ×4 (map-side), per-(feature,
    bin) hash agg, per-feature censuses. At 100 TB this is THE shape
    for drift monitoring: one shuffle, every feature in parallel.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    em = F.expr("unix_micros(CAST(o_orderdate AS timestamp_ltz))")
    span = o.agg(F.min(em).alias("lo"), F.max(em).alias("hi"))
    base = (
        li.join(
            o.select(F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"),
            "l_orderkey",
        )
        .crossJoin(F.broadcast(span))
        .select(
            F.when(em * 2 <= F.col("lo") + F.col("hi"), 0).otherwise(1).alias("h"),
            F.floor(F.round(F.col("l_extendedprice") * 100).cast("long") / 500000)
            .cast("long")
            .alias("f_price"),
            F.floor(F.col("l_quantity").cast("long") / 10)
            .cast("long")
            .alias("f_qty"),
            F.floor(F.round(F.col("l_discount") * 100).cast("long") / 2)
            .cast("long")
            .alias("f_disc"),
            F.floor(F.round(F.col("l_tax") * 100).cast("long") / 2)
            .cast("long")
            .alias("f_tax"),
        )
    )
    feats = None
    for name in ("price", "qty", "disc", "tax"):
        part = base.select(
            "h", F.lit(name).alias("feat"), F.col(f"f_{name}").alias("val")
        )
        feats = part if feats is None else feats.unionAll(part)
    cells = feats.groupBy("feat", "val").agg(
        F.sum(F.when(F.col("h") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("h") == 1, 1).otherwise(0)).cast("long").alias("n1"),
    )
    cells = _ckpt(cells)  # shared fan-out relation
    tot = cells.groupBy("feat").agg(
        F.sum("n0").cast("long").alias("t0"), F.sum("n1").cast("long").alias("t1")
    )
    p1 = F.greatest(F.col("n1"), F.lit(1)) * 1.0 / F.col("t1")
    p0 = F.greatest(F.col("n0"), F.lit(1)) * 1.0 / F.col("t0")
    terms = cells.join(tot, "feat").select(
        "feat", F.round((p1 - p0) * F.log(p1 / p0), 9).alias("term")
    )
    psi = F.sum("term")
    return (
        terms.groupBy("feat")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.round(psi, 6).alias("psi"),
            F.when(psi > 0.2, 2)
            .when(psi > 0.1, 1)
            .otherwise(0)
            .cast("long")
            .alias("drift_class"),
        )
        .select(F.col("feat").alias("feature"), "n_bins", "psi", "drift_class")
        .orderBy("feature")
    )


@query(
    "ks_feature_panel",
    oracle=_FEATURE_HALVES_SQL
    + """
    , cells AS (
        SELECT feat, val,
               CAST(SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        FROM feats GROUP BY feat, val
    ), cum AS (
        SELECT feat, val,
               CAST(SUM(n0) OVER (PARTITION BY feat ORDER BY val) AS BIGINT)
                   AS c0,
               CAST(SUM(n1) OVER (PARTITION BY feat ORDER BY val) AS BIGINT)
                   AS c1,
               CAST(SUM(n0) OVER (PARTITION BY feat) AS BIGINT) AS t0,
               CAST(SUM(n1) OVER (PARTITION BY feat) AS BIGINT) AS t1
        FROM cells
    ), d AS (
        SELECT feat,
               CAST(MAX(ABS(CAST(c0 AS HUGEINT) * t1
                            - CAST(c1 AS HUGEINT) * t0)) AS HUGEINT) AS dnum,
               CAST(MAX(t0) AS BIGINT) AS t0, CAST(MAX(t1) AS BIGINT) AS t1
        FROM cum GROUP BY feat
    )
    SELECT feat AS feature,
           ROUND(CAST(dnum AS DOUBLE) / (CAST(t0 AS DOUBLE) * t1), 6)
               AS ks_stat,
           CAST(CASE WHEN CAST(dnum AS DOUBLE) / (CAST(t0 AS DOUBLE) * t1)
                          > 1.628 * sqrt((t0 + CAST(t1 AS DOUBLE))
                                         / (CAST(t0 AS DOUBLE) * t1))
                THEN 1 ELSE 0 END AS BIGINT) AS drifted_at_99
    FROM d ORDER BY feat
    """,
)
def ks_feature_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov panel on the same four
    binned features: D = max|F̂₀−F̂₁| computed as an EXACT integer
    ratio (cross-multiplied cumulative counts — no float ECDFs), with
    the large-sample 99% threshold 1.628·√((n₀+n₁)/n₀n₁). KS reacts to
    shape changes PSI's coarse binning can blur, so the two panels
    together (`psi_feature_panel`) are the standard drift dashboard.

    Determinism: the max deviation is an exact 128-bit integer before
    the single division; threshold compare uses identical expressions.

    Scale shape: same one-pass unpivot; cumulative windows per
    feature on the tiny bin relations.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    em = F.expr("unix_micros(CAST(o_orderdate AS timestamp_ltz))")
    span = o.agg(F.min(em).alias("lo"), F.max(em).alias("hi"))
    base = (
        li.join(
            o.select(F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"),
            "l_orderkey",
        )
        .crossJoin(F.broadcast(span))
        .select(
            F.when(em * 2 <= F.col("lo") + F.col("hi"), 0).otherwise(1).alias("h"),
            F.floor(F.round(F.col("l_extendedprice") * 100).cast("long") / 500000)
            .cast("long")
            .alias("f_price"),
            F.floor(F.col("l_quantity").cast("long") / 10)
            .cast("long")
            .alias("f_qty"),
            F.floor(F.round(F.col("l_discount") * 100).cast("long") / 2)
            .cast("long")
            .alias("f_disc"),
            F.floor(F.round(F.col("l_tax") * 100).cast("long") / 2)
            .cast("long")
            .alias("f_tax"),
        )
    )
    base = _ckpt(base)  # shared fan-out relation
    feats = None
    for name in ("price", "qty", "disc", "tax"):
        part = base.select(
            "h", F.lit(name).alias("feat"), F.col(f"f_{name}").alias("val")
        )
        feats = part if feats is None else feats.unionAll(part)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    cells = feats.groupBy("feat", "val").agg(
        F.sum(F.when(F.col("h") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("h") == 1, 1).otherwise(0)).cast("long").alias("n1"),
    )
    wo = (
        Window.partitionBy("feat")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = Window.partitionBy("feat")
    cum = cells.select(
        "feat",
        F.sum("n0").over(wo).cast("long").alias("c0"),
        F.sum("n1").over(wo).cast("long").alias("c1"),
        F.sum("n0").over(wf).cast("long").alias("t0"),
        F.sum("n1").over(wf).cast("long").alias("t1"),
    )
    d = cum.groupBy("feat").agg(
        F.max(F.abs(dec("c0") * dec("t1") - dec("c1") * dec("t0"))).alias("dnum"),
        F.max("t0").cast("long").alias("t0"),
        F.max("t1").cast("long").alias("t1"),
    )
    ks = F.col("dnum").cast("double") / (F.col("t0").cast("double") * F.col("t1"))
    thr = 1.628 * F.sqrt(
        (F.col("t0") + F.col("t1").cast("double"))
        / (F.col("t0").cast("double") * F.col("t1"))
    )
    return d.select(
        F.col("feat").alias("feature"),
        F.round(ks, 6).alias("ks_stat"),
        F.when(ks > thr, 1).otherwise(0).cast("long").alias("drifted_at_99"),
    ).orderBy("feature")


# ---------------------------------------------------------------------------
# wave 213: SPRT sequential monitor, signal run-length gaps
# ---------------------------------------------------------------------------


@query(
    "sprt_conversion_monitor",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS BIGINT) AS conv,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY day
    ), cum AS (
        SELECT day,
               CAST(SUM(conv) OVER (ORDER BY day) AS BIGINT) AS cc,
               CAST(SUM(n) OVER (ORDER BY day) AS BIGINT) AS cn
        FROM daily
    ), llr AS (
        SELECT day, cc, cn,
               cc * ln(0.35 / 0.25)
               + (cn - cc) * ln(0.65 / 0.75) AS l
        FROM cum
    ), crossed AS (
        SELECT day, l,
               CASE WHEN l >= ln(19.0) THEN 1
                    WHEN l <= -ln(19.0) THEN -1 ELSE 0 END AS sig
        FROM llr
    ), first_cross AS (
        SELECT MIN(day) AS d FROM crossed WHERE sig <> 0
    )
    SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
           CAST(COALESCE((SELECT d FROM first_cross), -1) AS BIGINT)
               AS decision_day,
           CAST(COALESCE((SELECT sig FROM crossed c, first_cross f
                          WHERE c.day = f.d), 0) AS BIGINT) AS decision,
           ROUND((SELECT l FROM llr ORDER BY day DESC LIMIT 1), 4)
               AS final_llr
    """,
)
def sprt_conversion_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT monitoring the purchase share day by day: cumulative
    log-likelihood ratio for H₁: p=0.35 vs H₀: p=0.25, stopping at
    ±ln(19) (α=β=0.05), reporting the first decision day and verdict
    (+1 accept H₁, −1 accept H₀, 0 still running). The always-on
    sequential test COMPLEMENTING `obf_sequential_monitoring` (fixed
    looks) — SPRT looks after every day with exact error control.

    Determinism: cumulative counts exact; the LLR is integer×fixed-ln
    constants (identical trees); boundary comparisons and the first
    crossing are then engine-identical; final LLR rounded once.

    Scale shape: fact → |days| agg → one cumulative window → censuses.
    """
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day
    import math

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            epoch_day("ts").alias("day"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("cv"),
        )
        .groupBy("day")
        .agg(
            F.sum("cv").cast("long").alias("conv"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    daily = _ckpt(daily)  # shared fan-out relation
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "day",
        F.sum("conv").over(wc).cast("long").alias("cc"),
        F.sum("n").over(wc).cast("long").alias("cn"),
    )
    l = F.col("cc") * math.log(0.35 / 0.25) + (F.col("cn") - F.col("cc")) * math.log(
        0.65 / 0.75
    )
    llr = cum.select("day", l.alias("l"))
    bound = math.log(19.0)
    crossed = llr.select(
        "day",
        "l",
        F.when(F.col("l") >= bound, 1)
        .when(F.col("l") <= -bound, -1)
        .otherwise(0)
        .alias("sig"),
    )
    first_cross = crossed.where(F.col("sig") != 0).agg(
        F.min("day").alias("d")
    )
    first_cross = _ckpt(first_cross)  # shared fan-out relation
    n_days = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    final = llr.orderBy(F.col("day").desc()).limit(1).select(
        F.round("l", 4).alias("final_llr")
    )
    decision = (
        crossed.crossJoin(F.broadcast(first_cross))
        .where(F.col("day") == F.col("d"))
        .select(F.col("sig").alias("decision"))
    )
    return (
        n_days.crossJoin(
            F.broadcast(
                first_cross.select(
                    F.coalesce(F.col("d"), F.lit(-1))
                    .cast("long")
                    .alias("decision_day")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                decision.agg(
                    F.coalesce(F.max("decision"), F.lit(0))
                    .cast("long")
                    .alias("decision")
                )
            )
        )
        .crossJoin(F.broadcast(final))
    )


@query(
    "signal_run_length_gaps",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY day
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS s1,
               SUM(CAST(v AS HUGEINT) * v) AS s2
        FROM daily
    ), z AS (
        SELECT d.day,
               ABS(d.v - CAST(s.s1 AS DOUBLE) / s.n)
               / sqrt((CAST(s.s2 AS DOUBLE) - CAST(s.s1 AS DOUBLE)
                       * (CAST(s.s1 AS DOUBLE) / s.n)) / (s.n - 1)) AS az
        FROM daily d, stats s
    ), breaches AS (
        SELECT day, day - LAG(day) OVER (ORDER BY day) AS gap
        FROM z WHERE az > 2.0
    )
    SELECT CAST((SELECT n FROM stats) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_signals,
           CAST(COALESCE(MIN(gap), -1) AS BIGINT) AS min_gap_days,
           CAST(COALESCE(MAX(gap), -1) AS BIGINT) AS max_gap_days,
           ROUND(AVG(gap), 4) AS mean_gap_days
    FROM breaches
    """,
)
def signal_run_length_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed run lengths between 2σ control signals on daily value:
    gap statistics between consecutive breach days — the empirical ARL
    (average run length) that calibrates any control chart's false-
    alarm economics (`xbar_r_control_chart` sets limits; this measures
    how often they actually fire and how bursty the firings are).

    Determinism: mean/sd from exact moments; breach flags identical
    fixed expressions; gaps integer; one rounded mean.

    Scale shape: |days| agg → broadcast 1-row stats → flag + one lag
    window on the breach subset.
    """
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    ev = load_table(spark, sf_dir, "events")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    daily = (
        ev.select(
            epoch_day("ts").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").cast("long").alias("v"))
    )
    stats = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(dec("v") * dec("v")).alias("s2"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    sd = F.sqrt(
        (
            F.col("s2").cast("double")
            - F.col("s1").cast("double") * (F.col("s1").cast("double") / F.col("n"))
        )
        / (F.col("n") - 1)
    )
    z = daily.crossJoin(F.broadcast(stats)).select(
        "day", (F.abs(F.col("v") - mu) / sd).alias("az"), "n"
    )
    breaches = z.where(F.col("az") > 2.0).select(
        "day",
        (F.col("day") - F.lag("day").over(Window.orderBy("day"))).alias("gap"),
    )
    gaps = breaches.agg(
        F.count(F.lit(1)).cast("long").alias("n_signals"),
        F.coalesce(F.min("gap"), F.lit(-1)).cast("long").alias("min_gap_days"),
        F.coalesce(F.max("gap"), F.lit(-1)).cast("long").alias("max_gap_days"),
        F.round(F.avg("gap"), 4).alias("mean_gap_days"),
    )
    # n_days from the stats census so a zero-breach series still reports it
    return gaps.crossJoin(
        F.broadcast(stats.select(F.col("n").cast("long").alias("n_days")))
    ).select("n_days", "n_signals", "min_gap_days", "max_gap_days", "mean_gap_days")


# ---------------------------------------------------------------------------
# wave 214: survivorship-bias audit, Berkson selection correlation
# ---------------------------------------------------------------------------


@query(
    "survivorship_bias_audit",
    oracle="""
    WITH span AS (
        SELECT MIN(epoch_us(o_orderdate)) AS lo, MAX(epoch_us(o_orderdate)) AS hi
        FROM orders
    ), h1 AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS spend,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders, span
        WHERE epoch_us(o_orderdate) * 2 <= lo + hi
        GROUP BY o_custkey
    ), survivors AS (
        SELECT DISTINCT o_custkey FROM orders, span
        WHERE epoch_us(o_orderdate) * 2 > lo + hi
    ), agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
               CAST(SUM(spend) AS BIGINT) AS s_all,
               CAST(SUM(CASE WHEN s.o_custkey IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_surv,
               CAST(SUM(CASE WHEN s.o_custkey IS NOT NULL
                        THEN spend ELSE 0 END) AS BIGINT) AS s_surv
        FROM h1 LEFT JOIN survivors s ON s.o_custkey = h1.o_custkey
    )
    SELECT n_all AS h1_customers, n_surv AS surviving_customers,
           ROUND(CAST(s_all AS DOUBLE) / n_all / 100.0, 2)
               AS mean_spend_all,
           ROUND(CAST(s_surv AS DOUBLE) / n_surv / 100.0, 2)
               AS mean_spend_survivors,
           ROUND((CAST(s_surv AS DOUBLE) / n_surv)
                 / (CAST(s_all AS DOUBLE) / n_all) - 1.0, 6)
               AS survivorship_bias
    FROM agg
    """,
)
def survivorship_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship-bias measurement: first-half mean customer spend
    computed over ALL H1 customers vs only those still ordering in H2 —
    the relative inflation is exactly the bias every 'current
    customers' dashboard bakes in. A data-QA sibling of
    `leakage_safe_training_labels` and `split_leakage_audit`:
    conditioning on the future corrupts the past.

    Determinism: cent sums and counts exact; three divisions rounded.

    Scale shape: two half-window scans (one agg, one distinct), a
    co-keyed left join on custkey, 1-row census.
    """
    o = load_table(spark, sf_dir, "orders")
    em = F.expr("unix_micros(CAST(o_orderdate AS timestamp_ltz))")
    span = o.agg(F.min(em).alias("lo"), F.max(em).alias("hi"))
    # both halves (first-half spenders, second-half survivors) consume
    # this relation — materialize the 3-column projection so the
    # orders scan runs once for the span agg and once here, not 4x
    with_span = _ckpt(
        o.select("o_custkey", "o_orderdate", "o_totalprice").crossJoin(
            F.broadcast(span)
        )
    )
    h1 = (
        with_span.where(em * 2 <= F.col("lo") + F.col("hi"))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("spend")
        )
    )
    survivors = (
        with_span.where(em * 2 > F.col("lo") + F.col("hi"))
        .select(F.col("o_custkey").alias("sk"))
        .distinct()
    )
    agg = h1.join(survivors, F.col("sk") == F.col("o_custkey"), "left").agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum("spend").cast("long").alias("s_all"),
        F.sum(F.when(F.col("sk").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_surv"),
        F.sum(F.when(F.col("sk").isNotNull(), F.col("spend")).otherwise(0))
        .cast("long")
        .alias("s_surv"),
    )
    m_all = F.col("s_all").cast("double") / F.col("n_all")
    m_surv = F.col("s_surv").cast("double") / F.col("n_surv")
    return agg.select(
        F.col("n_all").alias("h1_customers"),
        F.col("n_surv").alias("surviving_customers"),
        F.round(m_all / 100.0, 2).alias("mean_spend_all"),
        F.round(m_surv / 100.0, 2).alias("mean_spend_survivors"),
        F.round(m_surv / m_all - 1.0, 6).alias("survivorship_bias"),
    )


@query(
    "berkson_selection_correlation",
    oracle="""
    WITH pts AS (
        SELECT CAST(l_quantity AS DOUBLE) AS x,
               l_extendedprice / 1000.0 AS y
        FROM lineitem
    ), med AS (
        SELECT quantile_disc(x, 0.5) AS mx, quantile_disc(y, 0.5) AS my
        FROM pts
    ), full_c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, ROUND(corr(x, y), 6) AS r
        FROM pts
    ), sel AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, ROUND(corr(p.x, p.y), 6) AS r
        FROM pts p, med m WHERE p.x > m.mx OR p.y > m.my
    )
    SELECT f.n AS n_all, f.r AS corr_all,
           s.n AS n_selected, s.r AS corr_selected,
           ROUND(s.r - f.r, 6) AS berkson_shift
    FROM full_c f, sel s
    """,
)
def berkson_selection_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Berkson's paradox demonstration: the quantity-price correlation
    over ALL lineitems vs over the 'noticed' subset (either above
    median) — OR-selection on two variables induces a spurious
    negative shift in their correlation among the selected. The
    collider-bias twin of `survivorship_bias_audit` (both are
    selection effects; this one needs no time axis), and the reason
    `covariate_balance_smd` exists before any matched analysis.

    Determinism: medians are exact discrete quantiles; both
    correlations use the engines' identical corr definition, rounded
    before differencing.

    Scale shape: one quantile census broadcast; two corr censuses
    (full + filtered). Three streaming passes, no shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_quantity").cast("double").alias("x"),
        (F.col("l_extendedprice") / 1000.0).alias("y"),
    )
    med = pts.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY x)").alias("mx"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY y)").alias("my"),
    )
    full_c = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.round(F.corr("x", "y"), 6).alias("corr_all"),
    )
    sel = (
        pts.crossJoin(F.broadcast(med))
        .where((F.col("x") > F.col("mx")) | (F.col("y") > F.col("my")))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_selected"),
            F.round(F.corr("x", "y"), 6).alias("corr_selected"),
        )
    )
    return full_c.crossJoin(F.broadcast(sel)).select(
        "n_all",
        "corr_all",
        "n_selected",
        "corr_selected",
        F.round(F.col("corr_selected") - F.col("corr_all"), 6).alias(
            "berkson_shift"
        ),
    )


# ---------------------------------------------------------------------------
# wave 215: geohash grid census, haversine nearest-hub assignment
# ---------------------------------------------------------------------------

_SYNTH_GEO_SQL = """
    WITH pts AS (
        -- deterministic synthetic coordinates via Knuth multiplicative
        -- mixing (exact integer math; engine hash() builtins differ)
        SELECT c_custkey,
               CAST((c_custkey * 2654435761) % 1800000 AS DOUBLE)
                   / 10000.0 - 90.0 AS lat,
               CAST(((c_custkey + 1013904223) * 2654435761) % 3600000
                    AS DOUBLE) / 10000.0 - 180.0 AS lon
        FROM customer
    )
"""


@query(
    "geohash_grid_census",
    oracle=_SYNTH_GEO_SQL
    + """
    , cells AS (
        SELECT c_custkey,
               -- 20-bit interleaved geohash (4 base32 chars): 10 bits each
               CAST(FLOOR((lon + 180.0) / 360.0 * 1024.0) AS BIGINT) AS bx,
               CAST(FLOOR((lat + 90.0) / 180.0 * 1024.0) AS BIGINT) AS by
        FROM pts
    ), keyed AS (
        SELECT c_custkey,
               LEAST(bx, 1023) * 1024 + LEAST(by, 1023) AS cell
        FROM cells
    ), counts AS (
        SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM keyed GROUP BY cell
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(MAX(n_customers) AS BIGINT) AS max_cell_pop,
           CAST(SUM(CASE WHEN n_customers = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS singleton_cells,
           CAST(SUM(n_customers) AS BIGINT) AS total_customers
    FROM counts
    """,
)
def geohash_grid_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash-style grid census: interleaved 10+10-bit lat/lon cells
    (the integer core of a 4-character geohash) over deterministic
    synthetic coordinates derived from customer keys, with occupancy
    stats. The spatial BUCKETING primitive — the prefix-truncation
    property (drop bits → coarser cell) is what makes geohash joins
    and `spatial_proximity_pairs`-style neighborhood queries scale.

    Determinism: coordinates come from exact Knuth multiplicative
    mixing (engine hash() builtins are NOT cross-compatible — measured);
    binning is pure integer floor math.

    Scale shape: dim scan → integer projection → cell hash agg →
    census. The same two-op pipeline at any scale.
    """
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        (
            ((F.col("c_custkey") * 2654435761) % 1800000).cast("double")
            / 10000.0
            - 90.0
        ).alias("lat"),
        (
            (((F.col("c_custkey") + 1013904223) * 2654435761) % 3600000)
            .cast("double")
            / 10000.0
            - 180.0
        ).alias("lon"),
    )
    cells = pts.select(
        F.floor((F.col("lon") + 180.0) / 360.0 * 1024.0).cast("long").alias("bx"),
        F.floor((F.col("lat") + 90.0) / 180.0 * 1024.0).cast("long").alias("by"),
    )
    keyed = cells.select(
        (
            F.least(F.col("bx"), F.lit(1023)) * 1024
            + F.least(F.col("by"), F.lit(1023))
        ).alias("cell")
    )
    counts = keyed.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    return counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.max("n_customers").cast("long").alias("max_cell_pop"),
        F.sum(F.when(F.col("n_customers") == 1, 1).otherwise(0))
        .cast("long")
        .alias("singleton_cells"),
        F.sum("n_customers").cast("long").alias("total_customers"),
    )


@query(
    "haversine_hub_assignment",
    oracle=_SYNTH_GEO_SQL
    + """
    , hubs AS (
        SELECT * FROM (VALUES (0, 51.5, -0.1), (1, 40.7, -74.0),
                             (2, 35.7, 139.7), (3, -33.9, 151.2),
                             (4, 1.35, 103.8)) AS h(hub_id, hlat, hlon)
    ), dists2 AS (
        SELECT p.c_custkey, h.hub_id,
               CAST(ROUND(2.0 * 6371.0 * asin(
                   sqrt(pow(sin(radians(h.hlat - p.lat) / 2), 2)
                        + cos(radians(p.lat)) * cos(radians(h.hlat))
                          * pow(sin(radians(h.hlon - p.lon) / 2), 2)))
                   * 10) AS BIGINT) AS d_hm
        FROM pts p, hubs h
    ), nearest AS (
        SELECT c_custkey,
               MIN(struct_pack(d_hm := d_hm, hub_id := hub_id)) AS b
        FROM dists2 GROUP BY c_custkey
    )
    SELECT b.hub_id AS hub_id,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(MIN(b.d_hm) AS BIGINT) AS min_dist_hm,
           CAST(MAX(b.d_hm) AS BIGINT) AS max_dist_hm
    FROM nearest GROUP BY b.hub_id ORDER BY hub_id
    """,
)
def haversine_hub_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-hub assignment by great-circle distance: haversine from
    each synthetic customer location to five fixed world hubs,
    assignment via struct-min on hectometer-rounded distances, and
    per-hub population/spread. The geo-partitioning primitive behind
    territory design and shard placement — `spatial_proximity_pairs`
    finds neighbors; this assigns to anchors.

    Determinism: the haversine expression tree is written identically
    on both engines; distances are rounded to exact integer
    hectometers BEFORE the (distance, hub) struct-min, making the
    argmin engine-stable with a hub tie-break.

    Scale shape: 5-row hub table broadcast through a projection (the
    cross join never materializes beyond ×5), per-customer struct-min,
    5-row census.
    """
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        (
            ((F.col("c_custkey") * 2654435761) % 1800000).cast("double")
            / 10000.0
            - 90.0
        ).alias("lat"),
        (
            (((F.col("c_custkey") + 1013904223) * 2654435761) % 3600000)
            .cast("double")
            / 10000.0
            - 180.0
        ).alias("lon"),
    )
    hubs = spark.createDataFrame(
        [(0, 51.5, -0.1), (1, 40.7, -74.0), (2, 35.7, 139.7),
         (3, -33.9, 151.2), (4, 1.35, 103.8)],
        ["hub_id", "hlat", "hlon"],
    )
    hav = (
        2.0
        * 6371.0
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("hlat") - F.col("lat")) / 2), 2)
                + F.cos(F.radians("lat"))
                * F.cos(F.radians("hlat"))
                * F.pow(F.sin(F.radians(F.col("hlon") - F.col("lon")) / 2), 2)
            )
        )
    )
    dists = pts.crossJoin(F.broadcast(hubs)).select(
        "c_custkey",
        "hub_id",
        F.round(hav * 10).cast("long").alias("d_hm"),
    )
    nearest = dists.groupBy("c_custkey").agg(
        F.min(F.struct(F.col("d_hm"), F.col("hub_id"))).alias("b")
    )
    return (
        nearest.groupBy(F.col("b.hub_id").alias("hub_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.min(F.col("b.d_hm")).cast("long").alias("min_dist_hm"),
            F.max(F.col("b.d_hm")).cast("long").alias("max_dist_hm"),
        )
        .orderBy("hub_id")
    )


# ---------------------------------------------------------------------------
# wave 216: Moran's I spatial autocorrelation, IDW interpolation at hubs
# ---------------------------------------------------------------------------


@query(
    "spatial_moran_i",
    oracle="""
    WITH pts AS (
        SELECT c_custkey,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS z_cents,
               (c_custkey * 2654435761) % 64 AS cx,
               ((c_custkey + 1013904223) * 2654435761) % 64 AS cy
        FROM customer
    ), cells AS (
        SELECT cx * 64 + cy AS cell, z_cents FROM pts
    ), mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(z_cents) AS BIGINT) AS s1,
               SUM(CAST(z_cents AS HUGEINT) * z_cents) AS s2
        FROM cells
    ), per_cell AS (
        SELECT cell, CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(z_cents) AS BIGINT) AS cs,
               SUM(CAST(z_cents AS HUGEINT) * z_cents) AS cs2
        FROM cells GROUP BY cell
    ), cross_ AS (
        -- sum over same-cell ordered pairs of z_i * z_j (i != j), exact:
        -- (sum^2 - sum of squares); weights W = sum over cells k*(k-1)
        SELECT CAST(SUM(CAST(cs AS HUGEINT) * cs - cs2) AS HUGEINT) AS spp,
               CAST(SUM(CAST(k AS HUGEINT) * (k - 1)) AS HUGEINT) AS w,
               CAST(SUM(CAST(cs AS HUGEINT) * (k - 1)) AS HUGEINT) AS s_kcs,
               CAST(SUM(CAST(k AS HUGEINT) * (k - 1) * 0) AS BIGINT) AS zero
        FROM per_cell
    ), stat AS (
        SELECT m.n, c.w,
               CAST(m.s1 AS DOUBLE) / m.n AS mu,
               CAST(m.s2 AS DOUBLE) - CAST(m.s1 AS DOUBLE)
                   * (CAST(m.s1 AS DOUBLE) / m.n) AS denom_n,
               CAST(c.spp AS DOUBLE)
                 - 2.0 * (CAST(m.s1 AS DOUBLE) / m.n) * CAST(c.s_kcs AS DOUBLE)
                 + (CAST(m.s1 AS DOUBLE) / m.n) * (CAST(m.s1 AS DOUBLE) / m.n)
                   * CAST(c.w AS DOUBLE) AS num_w
        FROM mom m, cross_ c
    )
    SELECT n AS n_points, CAST(w AS BIGINT) AS n_neighbor_pairs,
           ROUND(CAST(n AS DOUBLE) / CAST(w AS DOUBLE) * num_w / denom_n, 6)
               AS morans_i,
           CAST(CASE WHEN CAST(n AS DOUBLE) / CAST(w AS DOUBLE)
                          * num_w / denom_n > -1.0 / (n - 1)
                THEN 1 ELSE 0 END AS BIGINT) AS clustered_vs_random
    FROM stat
    """,
)
def spatial_moran_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I spatial autocorrelation of account balances under
    same-cell contiguity on a 64×64 synthetic grid: I = (n/W)·Σᵢⱼwᵢⱼ
    (zᵢ−z̄)(zⱼ−z̄)/Σ(zᵢ−z̄)², with the same-cell pair sums computed
    EXACTLY via the (Σz)²−Σz² identity per cell — the all-pairs sum
    never materializes. The global clustering statistic completing the
    spatial trio (`geohash_grid_census` buckets,
    `haversine_hub_assignment` anchors, Moran tests dependence),
    compared against its null mean −1/(n−1).

    Determinism: every cross-term is exact 128-bit integer algebra
    (centering expanded algebraically: Σzᵢzⱼ − 2z̄Σ(k−1)z + z̄²W);
    one fixed double expression, rounded once.

    Scale shape: per-cell aggregates only — the contiguity quadratic
    form costs one hash agg regardless of pair counts. THE way to run
    Moran at 100 TB.
    """
    c = load_table(spark, sf_dir, "customer")
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    pts = c.select(
        F.round(F.col("c_acctbal") * 100).cast("long").alias("z"),
        (
            ((F.col("c_custkey") * 2654435761) % 64) * 64
            + ((F.col("c_custkey") + 1013904223) * 2654435761) % 64
        ).alias("cell"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("z").cast("long").alias("s1"),
        F.sum(dec("z") * dec("z")).alias("s2"),
    )
    per_cell = pts.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("z").cast("long").alias("cs"),
        F.sum(dec("z") * dec("z")).alias("cs2"),
    )
    cross_ = per_cell.agg(
        F.sum(dec("cs") * dec("cs") - F.col("cs2")).alias("spp"),
        F.sum(dec("k") * (dec("k") - 1)).alias("w"),
        F.sum(dec("cs") * (dec("k") - 1)).alias("s_kcs"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    denom = F.col("s2").cast("double") - F.col("s1").cast("double") * mu
    num_w = (
        F.col("spp").cast("double")
        - 2.0 * mu * F.col("s_kcs").cast("double")
        + mu * mu * F.col("w").cast("double")
    )
    stat = mom.crossJoin(F.broadcast(cross_)).select(
        "n",
        F.col("w").cast("long").alias("n_neighbor_pairs"),
        (
            F.col("n").cast("double") / F.col("w").cast("double") * num_w / denom
        ).alias("i"),
    )
    return stat.select(
        F.col("n").alias("n_points"),
        "n_neighbor_pairs",
        F.round(F.col("i"), 6).alias("morans_i"),
        F.when(F.col("i") > -1.0 / (F.col("n") - 1), 1)
        .otherwise(0)
        .cast("long")
        .alias("clustered_vs_random"),
    )


@query(
    "idw_hub_interpolation",
    oracle="""
    WITH pts AS (
        SELECT c_custkey,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS z_cents,
               CAST((c_custkey * 2654435761) % 1800000 AS DOUBLE)
                   / 10000.0 - 90.0 AS lat,
               CAST(((c_custkey + 1013904223) * 2654435761) % 3600000
                    AS DOUBLE) / 10000.0 - 180.0 AS lon
        FROM customer
    ), hubs AS (
        SELECT * FROM (VALUES (0, 51.5, -0.1), (1, 40.7, -74.0),
                             (2, 35.7, 139.7), (3, -33.9, 151.2),
                             (4, 1.35, 103.8)) AS h(hub_id, hlat, hlon)
    ), wts AS (
        SELECT h.hub_id, p.z_cents,
               1.0 / (pow(p.lat - h.hlat, 2) + pow(p.lon - h.hlon, 2) + 1.0)
                   AS w
        FROM pts p, hubs h
    )
    SELECT hub_id,
           ROUND(SUM(w * z_cents) / SUM(w) / 100.0, 2) AS idw_balance,
           ROUND(SUM(w), 4) AS total_weight
    FROM wts GROUP BY hub_id ORDER BY hub_id
    """,
)
def idw_hub_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-distance-weighted interpolation of account balance at the
    five hub locations: Shepard weights 1/(d²+1) over equirectangular
    degree distance, ẑ(hub) = Σwz/Σw. The spatial smoother pairing
    with `spatial_moran_i` — Moran says WHETHER values cluster
    spatially; IDW exploits it to predict at unobserved sites.

    Determinism: weighted double sums with identical trees (the repo's
    moment-census precedent — magnitudes O(10⁴), ulps ~10 digits below
    the round grid), rounded once per hub.

    Scale shape: 5-row hub relation broadcast through one projection;
    5-group hash agg with map-side partials. One pass.
    """
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        F.round(F.col("c_acctbal") * 100).cast("long").alias("z_cents"),
        (
            ((F.col("c_custkey") * 2654435761) % 1800000).cast("double")
            / 10000.0
            - 90.0
        ).alias("lat"),
        (
            (((F.col("c_custkey") + 1013904223) * 2654435761) % 3600000)
            .cast("double")
            / 10000.0
            - 180.0
        ).alias("lon"),
    )
    hubs = spark.createDataFrame(
        [(0, 51.5, -0.1), (1, 40.7, -74.0), (2, 35.7, 139.7),
         (3, -33.9, 151.2), (4, 1.35, 103.8)],
        ["hub_id", "hlat", "hlon"],
    )
    w = 1.0 / (
        F.pow(F.col("lat") - F.col("hlat"), 2)
        + F.pow(F.col("lon") - F.col("hlon"), 2)
        + 1.0
    )
    wts = pts.crossJoin(F.broadcast(hubs)).select(
        "hub_id", "z_cents", w.alias("w")
    )
    return (
        wts.groupBy("hub_id")
        .agg(
            F.round(
                F.sum(F.col("w") * F.col("z_cents")) / F.sum("w") / 100.0, 2
            ).alias("idw_balance"),
            F.round(F.sum("w"), 4).alias("total_weight"),
        )
        .orderBy("hub_id")
    )


# ---------------------------------------------------------------------------
# wave 217: GARCH(1,1) volatility recursion, Garman-Klass OHLC volatility
# ---------------------------------------------------------------------------


@query(
    "garch11_daily_vol",
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               ROUND(SUM(value), 6) AS y
        FROM events GROUP BY day
    ), rets AS (
        SELECT day, ROUND(ln(y / LAG(y) OVER (ORDER BY day)), 6) AS r
        FROM daily
    ), idx AS (
        SELECT r, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM rets WHERE r IS NOT NULL
    ), var0 AS (
        SELECT ROUND(SUM(r * r) / COUNT(*), 9) AS v0 FROM idx
    ), rec AS (
        SELECT i.i, i.n, CAST(v.v0 AS DOUBLE) AS h, i.r AS r_prev,
               CAST(0 AS BIGINT) AS exceed
        FROM idx i, var0 v WHERE i.i = 1
        UNION ALL
        SELECT d.i, d.n,
               0.05 * v.v0 + 0.1 * r.r_prev * r.r_prev + 0.85 * r.h,
               d.r,
               r.exceed + CASE WHEN d.r * d.r
                    > 4.0 * (0.05 * v.v0 + 0.1 * r.r_prev * r.r_prev
                             + 0.85 * r.h)
                    THEN 1 ELSE 0 END
        FROM rec r JOIN idx d ON d.i = r.i + 1, var0 v
    )
    SELECT n AS n_returns,
           ROUND(sqrt(h), 6) AS final_vol,
           ROUND(sqrt((SELECT v0 FROM var0)), 6) AS uncond_vol,
           exceed AS n_2sigma_exceed
    FROM rec WHERE i = n
    """,
)
def garch11_daily_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GARCH(1,1) conditional volatility on daily log-returns of total
    event value: hₜ = ω + α·r²ₜ₋₁ + β·hₜ₋₁ with (ω, α, β) =
    (0.05·σ̂², 0.1, 0.85) anchored to the sample variance, plus a
    census of 2σ conditional exceedances. The volatility-CLUSTERING
    model that `cornish_fisher_var` (static quantiles) and
    `bollinger_breach_census` (rolling moments) approximate — GARCH's
    hₜ is the industry conditional-risk state.

    Determinism: returns and σ̂² rounded before the recursion; the
    fold and the recursive CTE share one IEEE dag with fixed
    constants; outputs rounded once.

    Scale shape: |days| reduce → lag window → bounded array → in-row
    fold (the `holt_winters_weekly` recurrence shape).
    """
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(epoch_day("ts").alias("day")).agg(
        F.round(F.sum("value"), 6).alias("y")
    )
    wd = Window.orderBy("day")
    rets = daily.select(
        "day", F.round(F.log(F.col("y") / F.lag("y").over(wd)), 6).alias("r")
    ).where(F.col("r").isNotNull())
    var0 = rets.agg(
        F.round(F.sum(F.col("r") * F.col("r")) / F.count(F.lit(1)), 9).alias("v0")
    )
    series = rets.agg(
        F.array_sort(F.collect_list(F.struct("day", "r"))).alias("arr")
    ).crossJoin(F.broadcast(var0))
    fold = """
    aggregate(
      slice(transform(arr, x -> x.r), 2, greatest(size(arr) - 1, 0)),
      named_struct('h', CAST(v0 AS DOUBLE),
                   'r_prev', CAST(arr[0].r AS DOUBLE),
                   'exceed', CAST(0 AS BIGINT)),
      (acc, r) -> named_struct(
        'h', 0.05 * v0 + 0.1 * acc.r_prev * acc.r_prev + 0.85 * acc.h,
        'r_prev', r,
        'exceed', acc.exceed + CASE WHEN r * r
             > 4.0 * (0.05 * v0 + 0.1 * acc.r_prev * acc.r_prev
                      + 0.85 * acc.h)
             THEN 1 ELSE 0 END))
    """
    fitted = series.select(
        F.size("arr").cast("long").alias("n_returns"),
        F.expr(fold).alias("g"),
        "v0",
    )
    return fitted.select(
        "n_returns",
        F.round(F.sqrt(F.col("g.h")), 6).alias("final_vol"),
        F.round(F.sqrt(F.col("v0")), 6).alias("uncond_vol"),
        F.col("g.exceed").alias("n_2sigma_exceed"),
    )


@query(
    "garman_klass_volatility",
    oracle="""
    WITH ranked AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(ROUND(value * 100) AS BIGINT) AS v,
               ROW_NUMBER() OVER (
                   PARTITION BY CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                   ORDER BY ts, event_id) AS rn_a,
               ROW_NUMBER() OVER (
                   PARTITION BY CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                   ORDER BY ts DESC, event_id DESC) AS rn_z
        FROM events WHERE value > 0
    ), ohlc AS (
        SELECT day,
               CAST(MAX(CASE WHEN rn_a = 1 THEN v END) AS BIGINT) AS o,
               CAST(MAX(CASE WHEN rn_z = 1 THEN v END) AS BIGINT) AS c,
               CAST(MAX(v) AS BIGINT) AS h, CAST(MIN(v) AS BIGINT) AS l
        FROM ranked GROUP BY day
    ), terms AS (
        SELECT day,
               ROUND(0.5 * pow(ln(CAST(h AS DOUBLE) / l), 2)
                     - (2.0 * ln(2.0) - 1.0)
                       * pow(ln(CAST(c AS DOUBLE) / o), 2), 9) AS gk
        FROM ohlc WHERE l > 0 AND o > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(gk), 6) AS gk_daily_var,
           ROUND(sqrt(GREATEST(AVG(gk), 0.0)), 6) AS gk_daily_vol,
           CAST(SUM(CASE WHEN gk < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS negative_days
    FROM terms
    """,
)
def garman_klass_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Garman-Klass range-based volatility from per-day OHLC of single
    event values (open/close = first/last by a total (ts, event_id)
    order; high/low = max/min): GK = ½·ln(H/L)² − (2ln2−1)·ln(C/O)²,
    averaged. Range estimators are ~7× more efficient per observation
    than close-to-close returns — the right volatility input when you
    keep intraday extremes but not ticks (and the natural companion of
    `garch11_daily_vol`'s return-based recursion).

    Determinism: OHLC are exact cents via total-ordered rank windows;
    each day's GK term is one fixed expression rounded to 9 before the
    final mean (round 6).

    Scale shape: two rank windows sharing one day-partitioned sort,
    |days| agg, census.
    """
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    ev = load_table(spark, sf_dir, "events").where(F.col("value") > 0)
    day = epoch_day("ts")
    wa = Window.partitionBy(day).orderBy("ts", "event_id")
    wz = Window.partitionBy(day).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ranked = ev.select(
        day.alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wz).alias("rn_z"),
    )
    ohlc = ranked.groupBy("day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("v"))).cast("long").alias("o"),
        F.max(F.when(F.col("rn_z") == 1, F.col("v"))).cast("long").alias("c"),
        F.max("v").cast("long").alias("h"),
        F.min("v").cast("long").alias("l"),
    )
    gk = F.round(
        0.5 * F.pow(F.log(F.col("h").cast("double") / F.col("l")), 2)
        - (2.0 * F.log(F.lit(2.0)) - 1.0)
        * F.pow(F.log(F.col("c").cast("double") / F.col("o")), 2),
        9,
    )
    terms = ohlc.where((F.col("l") > 0) & (F.col("o") > 0)).select(
        gk.alias("gk")
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.avg("gk"), 6).alias("gk_daily_var"),
        F.round(F.sqrt(F.greatest(F.avg("gk"), F.lit(0.0))), 6).alias(
            "gk_daily_vol"
        ),
        F.sum(F.when(F.col("gk") < 0, 1).otherwise(0))
        .cast("long")
        .alias("negative_days"),
    )


# ---------------------------------------------------------------------------
# wave 218: Bloom-filter empirical FPR, consistent-hashing rebalance
# ---------------------------------------------------------------------------


@query(
    "bloom_fpr_empirical",
    oracle="""
    WITH members AS (
        SELECT o_custkey AS k FROM orders GROUP BY o_custkey
    ), bits AS (
        SELECT DISTINCT b FROM (
            SELECT (k * 2654435761) % 65536 AS b FROM members
            UNION ALL
            SELECT ((k + 1013904223) * 2654435761) % 65536 FROM members
            UNION ALL
            SELECT ((k + 1442695040) * 2654435761) % 65536 FROM members
        )
    ), probes AS (
        SELECT c.c_custkey + 10000000 AS k FROM customer c
    ), checks AS (
        SELECT p.k,
               CAST(CASE WHEN b1.b IS NOT NULL AND b2.b IS NOT NULL
                              AND b3.b IS NOT NULL THEN 1 ELSE 0 END
                    AS BIGINT) AS hit
        FROM probes p
        LEFT JOIN bits b1 ON b1.b = (p.k * 2654435761) % 65536
        LEFT JOIN bits b2 ON b2.b = ((p.k + 1013904223) * 2654435761) % 65536
        LEFT JOIN bits b3 ON b3.b = ((p.k + 1442695040) * 2654435761) % 65536
    ), fill AS (SELECT CAST(COUNT(*) AS BIGINT) AS set_bits FROM bits
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM members) AS n_members,
           f.set_bits,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(hit) AS BIGINT) AS false_positives,
           ROUND(pow(CAST(f.set_bits AS DOUBLE) / 65536.0, 3), 6)
               AS theoretical_fpr,
           ROUND(CAST(SUM(hit) AS DOUBLE) / COUNT(*), 6) AS observed_fpr
    FROM checks, fill f GROUP BY f.set_bits
    """,
)
def bloom_fpr_empirical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter false-positive calibration, end to end in SQL: build
    a 2¹⁶-bit, k=3 filter over ordering customers (bit positions via
    three multiplicative mixes), probe with keys GUARANTEED absent
    (custkey+10⁷), and compare the observed FPR with the fill-ratio
    prediction (set/m)ᵏ. The math behind `bloom_prefilter_join`'s
    effectiveness, made measurable — if observed ≫ theoretical, your
    hash family is correlated.

    Determinism: bit positions and membership joins are exact integer
    algebra; only the two FPR ratios round.

    Scale shape: the filter is a |set-bits|-row DISTINCT relation
    (≤65536) — broadcast-joined three ways against probes; everything
    map-side after the build.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    members = o.select(F.col("o_custkey").alias("k")).distinct()
    members = _ckpt(members)  # shared fan-out relation

    def pos(col, salt):
        return ((col + salt) * 2654435761) % 65536 if salt else (col * 2654435761) % 65536

    bits = (
        members.select(pos(F.col("k"), 0).alias("b"))
        .unionAll(members.select(pos(F.col("k"), 1013904223).alias("b")))
        .unionAll(members.select(pos(F.col("k"), 1442695040).alias("b")))
        .distinct()
    )
    bits = _ckpt(bits)  # shared fan-out relation
    probes = c.select((F.col("c_custkey") + 10000000).alias("k"))
    b1 = bits.select(F.col("b").alias("b1"))
    b2 = bits.select(F.col("b").alias("b2"))
    b3 = bits.select(F.col("b").alias("b3"))
    checks = (
        probes.join(
            F.broadcast(b1), pos(F.col("k"), 0) == F.col("b1"), "left"
        )
        .join(F.broadcast(b2), pos(F.col("k"), 1013904223) == F.col("b2"), "left")
        .join(F.broadcast(b3), pos(F.col("k"), 1442695040) == F.col("b3"), "left")
        .select(
            F.when(
                F.col("b1").isNotNull()
                & F.col("b2").isNotNull()
                & F.col("b3").isNotNull(),
                1,
            )
            .otherwise(0)
            .alias("hit")
        )
    )
    fill = bits.agg(F.count(F.lit(1)).cast("long").alias("set_bits"))
    nm = members.agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    agg = checks.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum("hit").cast("long").alias("false_positives"),
    )
    return (
        nm.crossJoin(F.broadcast(fill))
        .crossJoin(F.broadcast(agg))
        .select(
            "n_members",
            "set_bits",
            "n_probes",
            "false_positives",
            F.round(
                F.pow(F.col("set_bits").cast("double") / 65536.0, 3), 6
            ).alias("theoretical_fpr"),
            F.round(
                F.col("false_positives").cast("double") / F.col("n_probes"), 6
            ).alias("observed_fpr"),
        )
    )


@query(
    "consistent_hashing_rebalance",
    oracle="""
    WITH ring AS (
        -- 8 shards x 16 vnodes on a 2^20 ring
        SELECT s.s AS shard, v.v AS vnode,
               ((s.s * 131 + v.v) * 2654435761) % 1048576 AS pos
        FROM (SELECT unnest(generate_series(0, 7)) AS s) s,
             (SELECT unnest(generate_series(0, 15)) AS v) v
    ), keys_ AS (
        SELECT c_custkey AS k,
               (c_custkey * 2654435761) % 1048576 AS kpos
        FROM customer
    ), assign8 AS (
        SELECT k.k,
               COALESCE(
                 (SELECT r.shard FROM ring r WHERE r.pos >= k.kpos
                  ORDER BY r.pos, r.shard LIMIT 1),
                 (SELECT r.shard FROM ring r ORDER BY r.pos, r.shard LIMIT 1))
                   AS shard
        FROM keys_ k
    ), assign7 AS (
        SELECT k.k,
               COALESCE(
                 (SELECT r.shard FROM ring r WHERE r.shard <> 7
                      AND r.pos >= k.kpos
                  ORDER BY r.pos, r.shard LIMIT 1),
                 (SELECT r.shard FROM ring r WHERE r.shard <> 7
                  ORDER BY r.pos, r.shard LIMIT 1)) AS shard
        FROM keys_ k
    ), joined AS (
        SELECT a8.k, a8.shard AS s8, a7.shard AS s7
        FROM assign8 a8 JOIN assign7 a7 ON a7.k = a8.k
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN s8 <> s7 THEN 1 ELSE 0 END) AS BIGINT) AS moved,
           CAST(SUM(CASE WHEN s8 = 7 THEN 1 ELSE 0 END) AS BIGINT)
               AS on_removed_shard,
           CAST(SUM(CASE WHEN s8 <> s7 AND s8 <> 7 THEN 1 ELSE 0 END)
                AS BIGINT) AS collateral_moves
    FROM joined
    """,
)
def consistent_hashing_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hashing rebalance audit: 8 shards × 16 vnodes on a
    2²⁰ ring, customers assigned to the first vnode clockwise; then
    shard 7 is REMOVED and the movement is measured. The defining
    guarantee — only keys on the removed shard move (collateral_moves
    = 0) — checked exactly; naive mod-N hashing would move ~7/8 of
    all keys. The placement algebra behind every shuffle-less
    scale-out story (`salted_join_order_priority` handles skew; this
    handles membership churn).

    Determinism: ring positions and assignments are exact integer
    algebra with (pos, shard) tie-breaks; counts exact.

    Scale shape: the 128-row ring broadcasts; each assignment is a
    min-over-ring reduction per key (Spark: broadcast join + struct-
    min), so keys never shuffle. Both epochs computed in one pass.
    """
    c = load_table(spark, sf_dir, "customer")
    ring_rows = [
        (s, v, ((s * 131 + v) * 2654435761) % 1048576)
        for s in range(8)
        for v in range(16)
    ]
    ring = spark.createDataFrame(ring_rows, ["shard", "vnode", "pos"])
    keys_ = c.select(
        F.col("c_custkey").alias("k"),
        ((F.col("c_custkey") * 2654435761) % 1048576).alias("kpos"),
    )

    def assign(ring_df, out):
        r = ring_df.alias("r")
        cand = keys_.crossJoin(F.broadcast(r)).select(
            "k",
            "kpos",
            "shard",
            "pos",
            F.when(F.col("pos") >= F.col("kpos"), 0).otherwise(1).alias("wrap"),
        )
        best = cand.groupBy("k").agg(
            F.min(F.struct(F.col("wrap"), F.col("pos"), F.col("shard"))).alias("b")
        )
        return best.select("k", F.col("b.shard").alias(out))

    a8 = assign(ring, "s8")
    a7 = assign(ring.where(F.col("shard") != 7), "s7")
    joined = a8.join(a7, "k")
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(F.when(F.col("s8") != F.col("s7"), 1).otherwise(0))
        .cast("long")
        .alias("moved"),
        F.sum(F.when(F.col("s8") == 7, 1).otherwise(0))
        .cast("long")
        .alias("on_removed_shard"),
        F.sum(
            F.when((F.col("s8") != F.col("s7")) & (F.col("s8") != 7), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("collateral_moves"),
    )


# ---------------------------------------------------------------------------
# wave 219: LRU cache-hit simulation, trailing working-set size
# ---------------------------------------------------------------------------


@query(
    "lru_cache_hit_simulation",
    oracle="""
    WITH RECURSIVE accesses AS (
        SELECT o.o_custkey AS ck, l.l_partkey AS pk,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o.o_custkey
                   ORDER BY o.o_orderdate, o.o_orderkey, l.l_linenumber,
                            l.l_partkey)
                   AS BIGINT) AS i
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), npc AS (
        SELECT ck, CAST(MAX(i) AS BIGINT) AS n FROM accesses GROUP BY ck
    ), rec AS (
        SELECT a.ck, a.i, n.n, [a.pk] AS cache, CAST(0 AS BIGINT) AS hits
        FROM accesses a JOIN npc n ON n.ck = a.ck WHERE a.i = 1
        UNION ALL
        SELECT d.ck, d.i, r.n,
               CASE WHEN list_contains(r.cache, d.pk)
                    THEN list_prepend(d.pk,
                         list_filter(r.cache, x -> x <> d.pk))
                    ELSE list_prepend(d.pk, r.cache)[1:4] END,
               r.hits + CASE WHEN list_contains(r.cache, d.pk)
                        THEN 1 ELSE 0 END
        FROM rec r JOIN accesses d ON d.ck = r.ck AND d.i = r.i + 1
    ), final AS (
        SELECT ck, n, hits FROM rec WHERE i = n
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(n) AS BIGINT) AS n_accesses,
           CAST(SUM(hits) AS BIGINT) AS n_hits,
           CAST(SUM(hits) * 1000000 // SUM(n) AS BIGINT) AS hit_rate_ppm
    FROM final
    """,
)
def lru_cache_hit_simulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact LRU(4) cache simulation over each customer's part-access
    sequence (orders by date, lines in order): per-access hit/miss with
    true recency eviction, aggregated to a corpus hit rate. The
    cache-sizing primitive behind materialization and tiering
    decisions — a replay, not a model, so it captures real reuse
    patterns that Zipf approximations miss. The fold carries the cache
    AS AN ARRAY in its accumulator — the most stateful recurrence in
    the registry (cf. `holt_winters_weekly`'s scalar state).

    Determinism: access order is total; the cache evolution is pure
    integer list algebra — identical on both engines; counts exact.

    Scale shape: per-customer sequences are bounded (orders/customer);
    one co-keyed join + collect per customer, in-row fold, census.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    accesses = (
        o.select("o_orderkey", "o_custkey", "o_orderdate")
        .join(
            li.select(
                F.col("l_orderkey").alias("o_orderkey"), "l_partkey", "l_linenumber"
            ),
            "o_orderkey",
        )
        .select(
            "o_custkey",
            "l_partkey",
            F.struct(
                "o_orderdate", "o_orderkey", "l_linenumber", "l_partkey"
            ).alias("ord"),
        )
    )
    seqs = accesses.groupBy("o_custkey").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ord, l_partkey))),"
            " x -> x.l_partkey)"
        ).alias("seq")
    )
    fold = """
    aggregate(
      slice(seq, 2, greatest(size(seq) - 1, 0)),
      named_struct('cache', array(seq[0]), 'hits', CAST(0 AS BIGINT)),
      (acc, p) -> CASE WHEN array_contains(acc.cache, p)
        THEN named_struct(
          'cache', concat(array(p), filter(acc.cache, x -> x != p)),
          'hits', acc.hits + 1)
        ELSE named_struct(
          'cache', slice(concat(array(p), acc.cache), 1, 4),
          'hits', acc.hits) END)
    """
    final = seqs.select(
        F.size("seq").cast("long").alias("n"),
        F.expr(fold).alias("st"),
    )
    return final.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("n").cast("long").alias("n_accesses"),
        F.sum(F.col("st.hits")).cast("long").alias("n_hits"),
        F.floor(F.sum(F.col("st.hits")) * 1000000 / F.sum("n"))
        .cast("long")
        .alias("hit_rate_ppm"),
    )


@query(
    "working_set_trailing_distinct",
    oracle="""
    WITH accesses AS (
        SELECT o.o_custkey AS ck, l.l_partkey AS pk,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o.o_custkey
                   ORDER BY o.o_orderdate, o.o_orderkey, l.l_linenumber,
                            l.l_partkey)
                   AS BIGINT) AS p
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), sized AS (
        SELECT ck, pk, p,
               CAST(MAX(p) OVER (PARTITION BY ck) AS BIGINT) AS n
        FROM accesses
    ), gaps AS (
        SELECT ck, p, n,
               COALESCE(p - LAG(p) OVER (PARTITION BY ck, pk ORDER BY p),
                        1000000000) AS gap
        FROM sized WHERE n >= 8
    ), contrib AS (
        SELECT ck,
               GREATEST(0, LEAST(p, n - 7)
                           - GREATEST(GREATEST(1, p - 7), p - gap + 1) + 1)
                   AS c,
               n
        FROM gaps
    ), per_cust AS (
        SELECT ck, CAST(SUM(c) AS BIGINT) AS dsum,
               CAST(MAX(n) - 7 AS BIGINT) AS n_windows
        FROM contrib GROUP BY ck
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(n_windows) AS BIGINT) AS n_windows,
           ROUND(CAST(SUM(dsum) AS DOUBLE) / SUM(n_windows), 4)
               AS mean_working_set,
           CAST(SUM(dsum) * 1000000 // (8 * SUM(n_windows)) AS BIGINT)
               AS saturation_ppm
    FROM per_cust
    """,
)
def working_set_trailing_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denning working-set size W(t, 8): mean number of DISTINCT parts
    in every trailing 8-access window of each customer's stream,
    computed by the gap decomposition (`mattr_sliding_ttr_by_lang`'s
    trick on access streams — no window sets materialize). Saturation
    (W/8) near 1 means no reuse (cold caches, cf.
    `lru_cache_hit_simulation`); near 0 means heavy reuse.

    Determinism: pure integer position algebra; exact sums; one
    rounded mean + exact ppm.

    Scale shape: one lag window partitioned by (customer, part) —
    co-located with the sequence layout — then per-customer and global
    censuses. O(accesses) total.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    wp = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey", "l_linenumber", "l_partkey"
    )
    accesses = (
        o.select("o_orderkey", "o_custkey", "o_orderdate")
        .join(
            li.select(
                F.col("l_orderkey").alias("o_orderkey"), "l_partkey", "l_linenumber"
            ),
            "o_orderkey",
        )
        .select(
            "o_custkey",
            "l_partkey",
            F.row_number().over(wp).cast("long").alias("p"),
        )
    )
    sized = accesses.select(
        "o_custkey",
        "l_partkey",
        "p",
        F.max("p").over(Window.partitionBy("o_custkey")).cast("long").alias("n"),
    ).where(F.col("n") >= 8)
    wg = Window.partitionBy("o_custkey", "l_partkey").orderBy("p")
    gaps = sized.select(
        "o_custkey",
        "p",
        "n",
        F.coalesce(F.col("p") - F.lag("p").over(wg), F.lit(1000000000)).alias(
            "gap"
        ),
    )
    c = F.greatest(
        F.lit(0),
        F.least(F.col("p"), F.col("n") - 7)
        - F.greatest(
            F.greatest(F.lit(1), F.col("p") - 7), F.col("p") - F.col("gap") + 1
        )
        + 1,
    )
    per_cust = gaps.select("o_custkey", c.alias("c"), "n").groupBy(
        "o_custkey"
    ).agg(
        F.sum("c").cast("long").alias("dsum"),
        (F.max("n") - 7).cast("long").alias("n_windows"),
    )
    return per_cust.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("n_windows").cast("long").alias("n_windows"),
        F.round(
            F.sum("dsum").cast("double") / F.sum("n_windows"), 4
        ).alias("mean_working_set"),
        F.floor(F.sum("dsum") * 1000000 / (8 * F.sum("n_windows")))
        .cast("long")
        .alias("saturation_ppm"),
    )


# ---------------------------------------------------------------------------
# wave 220: Gamma MoM inter-arrival fit, burstiness-memory coordinates
# ---------------------------------------------------------------------------

_INTERARRIVAL_SQL = """
    WITH seq AS (
        SELECT user_id,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS dt_us
        FROM events
    ), gaps AS (
        SELECT CAST(dt_us AS BIGINT) // 1000000 AS dt_s
        FROM seq WHERE dt_us IS NOT NULL AND dt_us > 0
    )
"""


@query(
    "gamma_mom_interarrival",
    oracle=_INTERARRIVAL_SQL
    + """
    , mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(dt_s) AS BIGINT) AS s1,
               SUM(CAST(dt_s AS HUGEINT) * dt_s) AS s2
        FROM gaps
    ), fit AS (
        SELECT n, CAST(s1 AS DOUBLE) / n AS m,
               (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                * (CAST(s1 AS DOUBLE) / n)) / (n - 1) AS v
        FROM mom
    )
    SELECT n AS n_gaps,
           ROUND(m / 3600.0, 4) AS mean_gap_hours,
           ROUND(m * m / v, 6) AS gamma_shape_k,
           ROUND(v / m / 3600.0, 4) AS gamma_scale_hours,
           CAST(CASE WHEN m * m / v < 1.0 THEN 1 ELSE 0 END AS BIGINT)
               AS burstier_than_poisson
    FROM fit
    """,
)
def gamma_mom_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gamma method-of-moments fit to per-user inter-event times:
    k̂ = m²/s², θ̂ = s²/m. Shape k < 1 marks burstier-than-Poisson
    arrivals (the renewal-process verdict that
    `dispersion_index_daily` reaches via counts and
    `negative_binomial_user_events` via per-user totals — this one
    reads the gaps themselves, so it also feeds the Erlang/queueing
    assumptions of `erlang_c_staffing`).

    Determinism: whole-second gaps are exact integers from a total
    (ts, event_id) order; (n, Σ, Σ²) exact with 128-bit squares;
    k̂/θ̂ fixed expressions, rounded once; the flag reads unrounded k̂.

    Scale shape: one lag window per user, then a streaming census.
    """
    ev = load_table(spark, sf_dir, "events")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    em = F.expr("unix_micros(CAST(ts AS timestamp_ltz))")
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select((em - F.lag(em).over(wl)).alias("dt_us"))
    gaps = seq.where(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0)).select(
        F.floor(F.col("dt_us") / 1000000).cast("long").alias("dt_s")
    )
    mom = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dt_s").cast("long").alias("s1"),
        F.sum(dec("dt_s") * dec("dt_s")).alias("s2"),
    )
    m = F.col("s1").cast("double") / F.col("n")
    v = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * (F.col("s1").cast("double") / F.col("n"))
    ) / (F.col("n") - 1)
    fit = mom.select("n", m.alias("m"), v.alias("v"))
    k = F.col("m") * F.col("m") / F.col("v")
    return fit.select(
        F.col("n").alias("n_gaps"),
        F.round(F.col("m") / 3600.0, 4).alias("mean_gap_hours"),
        F.round(k, 6).alias("gamma_shape_k"),
        F.round(F.col("v") / F.col("m") / 3600.0, 4).alias("gamma_scale_hours"),
        F.when(k < 1.0, 1)
        .otherwise(0)
        .cast("long")
        .alias("burstier_than_poisson"),
    )


@query(
    "burstiness_memory_coords",
    oracle="""
    WITH base AS (
        SELECT user_id, ts, event_id,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS dt_us
        FROM events
    ), gaps AS (
        SELECT user_id, ts, event_id,
               CAST(dt_us AS BIGINT) // 1000000 AS a
        FROM base WHERE dt_us IS NOT NULL AND dt_us > 0
    ), pairs AS (
        SELECT a,
               LEAD(a) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
        FROM gaps
    ), bm AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a) AS BIGINT) AS s1,
               SUM(CAST(a AS HUGEINT) * a) AS s2
        FROM gaps
    ), bstat AS (
        SELECT n,
               CAST(s1 AS DOUBLE) / n AS mu,
               sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                     * (CAST(s1 AS DOUBLE) / n)) / (n - 1)) AS sd
        FROM bm
    ), mstat AS (
        SELECT ROUND(corr(CAST(a AS DOUBLE), CAST(b AS DOUBLE)), 6) AS mem,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM pairs WHERE b IS NOT NULL
    )
    SELECT b.n AS n_gaps, m.n_pairs,
           ROUND((b.sd - b.mu) / (b.sd + b.mu), 6) AS burstiness_b,
           m.mem AS memory_m,
           CAST(CASE WHEN (b.sd - b.mu) / (b.sd + b.mu) > 0
                THEN 1 ELSE 0 END AS BIGINT) AS bursty
    FROM bstat b, mstat m
""",
)
def burstiness_memory_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabási (B, M) coordinates of the event process:
    burstiness B = (σ−μ)/(σ+μ) of inter-arrival gaps and memory M =
    correlation of CONSECUTIVE gaps (per user). The two-number
    fingerprint separating human-bursty (B>0, M≈0) from machine-
    periodic (B<0) from correlated-cascade (M>0) traffic — the
    phenomenological twin of `gamma_mom_interarrival`'s parametric
    fit, and a `bot_rate_detection` feature in its own right.

    Determinism: gaps exact whole seconds on a total order; B from
    exact moments; M uses the engines' shared corr definition over the
    exact consecutive-gap pairs, rounded once.

    Scale shape: two windows (lag for gaps, lead for pairs) sharing
    the per-user sort; two censuses.
    """
    ev = load_table(spark, sf_dir, "events")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    em = F.expr("unix_micros(CAST(ts AS timestamp_ltz))")
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = ev.select(
        "user_id", "ts", "event_id", (em - F.lag(em).over(wl)).alias("dt_us")
    )
    gaps = base.where(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0)).select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("dt_us") / 1000000).cast("long").alias("a"),
    )
    pairs = gaps.select(
        "a", F.lead("a").over(wl).alias("b")
    ).where(F.col("b").isNotNull())
    bm = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a").cast("long").alias("s1"),
        F.sum(dec("a") * dec("a")).alias("s2"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    sd = F.sqrt(
        (
            F.col("s2").cast("double")
            - F.col("s1").cast("double") * (F.col("s1").cast("double") / F.col("n"))
        )
        / (F.col("n") - 1)
    )
    bstat = bm.select("n", mu.alias("mu"), sd.alias("sd"))
    mstat = pairs.agg(
        F.round(
            F.corr(F.col("a").cast("double"), F.col("b").cast("double")), 6
        ).alias("mem"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    bexpr = (F.col("sd") - F.col("mu")) / (F.col("sd") + F.col("mu"))
    return bstat.crossJoin(F.broadcast(mstat)).select(
        F.col("n").alias("n_gaps"),
        "n_pairs",
        F.round(bexpr, 6).alias("burstiness_b"),
        F.col("mem").alias("memory_m"),
        F.when(bexpr > 0, 1).otherwise(0).cast("long").alias("bursty"),
    )


# ---------------------------------------------------------------------------
# wave 221: embedding isotropy score, embedding effective rank
# ---------------------------------------------------------------------------


@query(
    "embedding_isotropy_score",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               g.i AS dim,
               CAST(ROUND(CAST(e.embedding[g.i] AS DOUBLE)
                    / sqrt(list_sum(list_transform(
                          CAST(e.embedding AS DOUBLE[]), x -> x * x)))
                    * 1000000) AS BIGINT) AS qv
        FROM embeddings e,
             LATERAL (SELECT unnest(generate_series(1, len(e.embedding)))
                      AS i) g
    ), dims AS (
        SELECT dim, CAST(SUM(qv) AS HUGEINT) AS s FROM q GROUP BY dim
    ), tot AS (
        SELECT CAST(SUM(s * s) AS HUGEINT) AS s_norm2 FROM dims
    ), self_ AS (
        SELECT CAST(SUM(CAST(qv AS HUGEINT) * qv) AS HUGEINT) AS q2,
               CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n
        FROM q
    )
    SELECT s.n AS n_vectors,
           ROUND((CAST(t.s_norm2 AS DOUBLE) - CAST(s.q2 AS DOUBLE))
                 / ((CAST(s.n AS DOUBLE) * s.n - s.n) * 1e12), 6)
               AS mean_pairwise_cosine,
           CAST(CASE WHEN (CAST(t.s_norm2 AS DOUBLE) - CAST(s.q2 AS DOUBLE))
                          / ((CAST(s.n AS DOUBLE) * s.n - s.n) * 1e12) > 0.1
                THEN 1 ELSE 0 END AS BIGINT) AS anisotropic
    FROM self_ s, tot t
    """,
)
def embedding_isotropy_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding isotropy audit: the mean pairwise cosine over ALL
    vector pairs via the sum-vector identity (‖Σv̂‖² − Σ‖v̂‖²)/(n²−n) —
    computed without a single pair materializing. Anisotropy (a large
    common direction) is the classic representation pathology that
    wrecks cosine retrieval; >0.1 flags it. Complements
    `embedding_norm_stats` (norms) and `semdedup_embedding_cells`
    (which anisotropy silently degrades).

    Determinism: normalized components quantized to exact micro-units
    BEFORE aggregation (`embedding_dimension_stats` precedent), so the
    per-dimension sums, ‖Σ‖², and Σ‖v̂‖² are exact 128-bit integers;
    one final division, rounded.

    Scale shape: posexplode → |dims| hash agg → two tiny censuses. One
    pass over the corpus regardless of n².
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    q = emb.select(
        "vec_id",
        F.posexplode(
            F.expr(
                "transform(CAST(embedding AS array<double>),"
                " x -> CAST(ROUND(x / sqrt(aggregate("
                "   CAST(embedding AS array<double>), CAST(0.0 AS DOUBLE),"
                "   (a, y) -> a + y * y)) * 1000000) AS BIGINT))"
            )
        ).alias("p", "qv"),
    )
    dims = q.groupBy("p").agg(F.sum(dec("qv")).alias("s"))
    tot = dims.agg(F.sum(F.col("s") * F.col("s")).alias("s_norm2"))
    self_ = q.agg(
        F.sum(dec("qv") * dec("qv")).alias("q2"),
        F.countDistinct("vec_id").cast("long").alias("n"),
    )
    mean_cos = (
        F.col("s_norm2").cast("double") - F.col("q2").cast("double")
    ) / (
        (F.col("n").cast("double") * F.col("n") - F.col("n")) * 1e12
    )
    return self_.crossJoin(F.broadcast(tot)).select(
        F.col("n").alias("n_vectors"),
        F.round(mean_cos, 6).alias("mean_pairwise_cosine"),
        F.when(mean_cos > 0.1, 1).otherwise(0).cast("long").alias("anisotropic"),
    )


@query(
    "embedding_effective_rank",
    oracle="""
    WITH q AS (
        SELECT g.i AS dim,
               CAST(ROUND(CAST(e.embedding[g.i] AS DOUBLE) * 1000000)
                    AS BIGINT) AS qv
        FROM embeddings e,
             LATERAL (SELECT unnest(generate_series(1, len(e.embedding)))
                      AS i) g
    ), dims AS (
        SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(qv) AS BIGINT) AS s1,
               SUM(CAST(qv AS HUGEINT) * qv) AS s2
        FROM q GROUP BY dim
    ), vars AS (
        SELECT dim,
               (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                * (CAST(s1 AS DOUBLE) / n)) / (n - 1) AS v
        FROM dims
    ), tot AS (SELECT SUM(v) AS tv, CAST(COUNT(*) AS BIGINT) AS d FROM vars
    ), terms AS (
        SELECT ROUND(CASE WHEN v > 0
                     THEN -(v / t.tv) * ln(v / t.tv) ELSE 0.0 END, 9) AS h,
               v / t.tv AS share
        FROM vars, tot t
    )
    SELECT (SELECT d FROM tot) AS n_dims,
           ROUND(exp(SUM(h)), 4) AS effective_rank,
           ROUND(MAX(share), 6) AS top_dim_var_share,
           CAST(CASE WHEN exp(SUM(h))
                          < (SELECT d FROM tot) * 0.5 THEN 1 ELSE 0 END
                AS BIGINT) AS collapsed
    FROM terms
    """,
)
def embedding_effective_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective rank (Roy-Vetterli) of the embedding matrix from
    per-dimension variances: exp(H(variance shares)) ∈ [1, d], with
    the top single-dimension share and a <d/2 collapse flag. The
    dimension-utilization audit behind matryoshka truncation
    (`matryoshka_overlap_at_k`) and `jl_random_projection` budgeting
    — low effective rank means you're paying for dimensions that
    carry nothing.

    Determinism: components quantized to micro-units; per-dim moments
    exact; entropy terms rounded to 9 before the 64-term sum
    (recurrence-input pattern); final round 4/6.

    Scale shape: posexplode → |dims| moment agg → 64-row entropy
    census. One pass.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    q = emb.select(
        F.posexplode(
            F.expr(
                "transform(CAST(embedding AS array<double>),"
                " x -> CAST(ROUND(x * 1000000) AS BIGINT))"
            )
        ).alias("p", "qv")
    )
    dims = q.groupBy("p").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qv").cast("long").alias("s1"),
        F.sum(dec("qv") * dec("qv")).alias("s2"),
    )
    v = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * (F.col("s1").cast("double") / F.col("n"))
    ) / (F.col("n") - 1)
    vars_ = dims.select(v.alias("v"))
    tot = vars_.agg(
        F.sum("v").alias("tv"), F.count(F.lit(1)).cast("long").alias("d")
    )
    share = F.col("v") / F.col("tv")
    terms = vars_.crossJoin(F.broadcast(tot)).select(
        F.round(
            F.when(F.col("v") > 0, -share * F.log(share)).otherwise(0.0), 9
        ).alias("h"),
        share.alias("share"),
        "d",
    )
    erank = F.exp(F.sum("h"))
    return terms.groupBy("d").agg(
        F.round(erank, 4).alias("effective_rank"),
        F.round(F.max("share"), 6).alias("top_dim_var_share"),
        F.when(erank < F.col("d") * 0.5, 1)
        .otherwise(0)
        .cast("long")
        .alias("collapsed"),
    ).select(
        F.col("d").alias("n_dims"),
        "effective_rank",
        "top_dim_var_share",
        "collapsed",
    )


# ---------------------------------------------------------------------------
# wave 222: Bartlett variance homogeneity, Cochran's Q repeated measures
# ---------------------------------------------------------------------------


@query(
    "bartlett_variance_test",
    oracle="""
    WITH g AS (
        SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) AS gid,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS s1,
               SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS HUGEINT)
                   * CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS s2
        FROM orders GROUP BY gid
    ), vars AS (
        SELECT gid, n,
               (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                * (CAST(s1 AS DOUBLE) / n)) / (n - 1) AS v
        FROM g
    ), pooled AS (
        SELECT CAST(SUM(n) AS BIGINT) AS ntot,
               CAST(COUNT(*) AS BIGINT) AS k,
               SUM((n - 1) * v) AS ssw,
               SUM((n - 1) * ln(v)) AS sum_lnv,
               SUM(1.0 / (n - 1)) AS sum_inv
        FROM vars
    ), stat AS (
        SELECT ntot, k,
               ((ntot - k) * ln(ssw / (ntot - k)) - sum_lnv)
               / (1.0 + (sum_inv - 1.0 / (ntot - k)) / (3.0 * (k - 1)))
                   AS chi2
        FROM pooled
    )
    SELECT ntot AS n_orders, k AS n_groups,
           ROUND(chi2, 4) AS bartlett_chi2,
           CAST(CASE WHEN chi2 > 13.2767 THEN 1 ELSE 0 END AS BIGINT)
               AS heteroscedastic_at_99
    FROM stat
    """,
)
def bartlett_variance_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test of equal variances across the five priority
    classes: χ²(k−1) = [(N−k)ln(s²_p) − Σ(nᵢ−1)ln s²ᵢ]/C with the
    standard correction C. The PARAMETRIC (normality-assuming,
    most-powerful-when-true) counterpart of
    `brown_forsythe_variance_test` — running both is the classic
    robustness sandwich before any pooled-variance ANOVA
    (`anova_f_order_priority`, `tukey_hsd_priority_values`).

    Determinism: per-group moments exact (cents, 128-bit squares);
    variances are fixed expressions; the 5-addend ln sums are O(10)
    magnitudes 12 digits above the round(4) grid; flag on unrounded.

    Scale shape: one 5-row moment agg with map-side partials, then
    scalar algebra.
    """
    o = load_table(spark, sf_dir, "orders")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    g = (
        o.select(
            F.substring("o_orderpriority", 1, 1).cast("long").alias("gid"),
            cents.alias("v"),
        )
        .groupBy("gid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("long").alias("s1"),
            F.sum(dec("v") * dec("v")).alias("s2"),
        )
    )
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * (F.col("s1").cast("double") / F.col("n"))
    ) / (F.col("n") - 1)
    vars_ = g.select("n", var.alias("v"))
    pooled = vars_.agg(
        F.sum("n").cast("long").alias("ntot"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum((F.col("n") - 1) * F.col("v")).alias("ssw"),
        F.sum((F.col("n") - 1) * F.log("v")).alias("sum_lnv"),
        F.sum(1.0 / (F.col("n") - 1)).alias("sum_inv"),
    )
    chi2 = (
        (F.col("ntot") - F.col("k"))
        * F.log(F.col("ssw") / (F.col("ntot") - F.col("k")))
        - F.col("sum_lnv")
    ) / (
        1.0
        + (F.col("sum_inv") - 1.0 / (F.col("ntot") - F.col("k")))
        / (3.0 * (F.col("k") - 1))
    )
    return pooled.select(
        F.col("ntot").alias("n_orders"),
        F.col("k").alias("n_groups"),
        F.round(chi2, 4).alias("bartlett_chi2"),
        F.when(chi2 > 13.2767, 1)
        .otherwise(0)
        .cast("long")
        .alias("heteroscedastic_at_99"),
    )


@query(
    "cochrans_q_monthly",
    oracle="""
    WITH span AS (
        SELECT MIN(epoch_us(o_orderdate)) AS lo,
               MAX(epoch_us(o_orderdate)) + 1 AS hi
        FROM orders
    ), marks AS (
        SELECT o_custkey,
               CAST(LEAST(FLOOR((epoch_us(o_orderdate) - lo) * 3.0
                                / (hi - lo)), 2) AS BIGINT) AS tercile
        FROM orders, span
    ), grid AS (
        SELECT m.o_custkey, g.t,
               CAST(MAX(CASE WHEN m.tercile = g.t THEN 1 ELSE 0 END)
                    AS BIGINT) AS x
        FROM marks m, (SELECT unnest(generate_series(0, 2)) AS t) g
        GROUP BY m.o_custkey, g.t
    ), per_cust AS (
        SELECT o_custkey, CAST(SUM(x) AS BIGINT) AS ri FROM grid
        GROUP BY o_custkey
    ), per_period AS (
        SELECT t, CAST(SUM(x) AS BIGINT) AS cj FROM grid GROUP BY t
    ), mom AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM per_cust) AS b,
               (SELECT CAST(SUM(ri) AS BIGINT) FROM per_cust) AS n,
               (SELECT CAST(SUM(ri * ri) AS BIGINT) FROM per_cust) AS sr2,
               (SELECT CAST(SUM(cj * cj) AS BIGINT) FROM per_period) AS sc2
    )
    SELECT b AS n_customers,
           ROUND(2.0 * (3.0 * sc2 - CAST(n AS DOUBLE) * n)
                 / (3.0 * n - sr2), 4) AS cochrans_q,
           CAST(CASE WHEN 2.0 * (3.0 * sc2 - CAST(n AS DOUBLE) * n)
                          / (3.0 * n - sr2) > 9.21034
                THEN 1 ELSE 0 END AS BIGINT) AS participation_shifted_at_99
    FROM mom
    """,
)
def cochrans_q_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test on binary participation across the three
    terciles of the order window: did the SET of active customers
    change over time? Q = k(k−1)(kΣCⱼ²−N²)/(kN−ΣRᵢ²) against χ²(2).
    The k-treatment binary repeated-measures test completing the
    paired family — `mcnemar_late_predictors` is its k=2 special
    case, `friedman_weekly_type_ranks` its ordinal big sibling.

    Determinism: the customer×tercile incidence grid, row/column sums
    and their squares are all exact integers; Q is one fixed double
    expression, rounded once.

    Scale shape: one conditional agg to the customer×3 grid (map-side
    combined), two marginal censuses, scalar algebra.
    """
    o = load_table(spark, sf_dir, "orders")
    em = F.expr("unix_micros(CAST(o_orderdate AS timestamp_ltz))")
    span = o.agg(F.min(em).alias("lo"), (F.max(em) + 1).alias("hi"))
    marks = o.crossJoin(F.broadcast(span)).select(
        "o_custkey",
        F.least(
            F.floor(
                (em - F.col("lo")) * 3 / (F.col("hi") - F.col("lo"))
            ),
            F.lit(2),
        )
        .cast("long")
        .alias("tercile"),
    )
    grid = spark.range(0, 3).select(F.col("id").cast("long").alias("t"))
    inc = (
        marks.crossJoin(F.broadcast(grid))
        .groupBy("o_custkey", "t")
        .agg(
            F.max(F.when(F.col("tercile") == F.col("t"), 1).otherwise(0))
            .cast("long")
            .alias("x")
        )
    )
    inc = _ckpt(inc)  # shared fan-out relation
    per_cust = inc.groupBy("o_custkey").agg(F.sum("x").cast("long").alias("ri"))
    per_period = inc.groupBy("t").agg(F.sum("x").cast("long").alias("cj"))
    mc = per_cust.agg(
        F.count(F.lit(1)).cast("long").alias("b"),
        F.sum("ri").cast("long").alias("n"),
        F.sum(F.col("ri") * F.col("ri")).cast("long").alias("sr2"),
    )
    mp = per_period.agg(
        F.sum(F.col("cj") * F.col("cj")).cast("long").alias("sc2")
    )
    mom = mc.crossJoin(F.broadcast(mp))
    q = (
        2.0
        * (3.0 * F.col("sc2") - F.col("n").cast("double") * F.col("n"))
        / (3.0 * F.col("n") - F.col("sr2"))
    )
    return mom.select(
        F.col("b").alias("n_customers"),
        F.round(q, 4).alias("cochrans_q"),
        F.when(q > 9.21034, 1)
        .otherwise(0)
        .cast("long")
        .alias("participation_shifted_at_99"),
    )


# ---------------------------------------------------------------------------
# wave 223: zero-inflated Poisson fit, hurdle growth decomposition
# ---------------------------------------------------------------------------


@query(
    "zip_orders_per_customer",
    oracle="""
    WITH counts AS (
        SELECT c.c_custkey,
               CAST(COALESCE(o.k, 0) AS BIGINT) AS k
        FROM customer c LEFT JOIN (
            SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS k
            FROM orders GROUP BY o_custkey) o
          ON o.o_custkey = c.c_custkey
    ), mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(k) AS BIGINT) AS s1,
               SUM(CAST(k AS HUGEINT) * k) AS s2,
               CAST(SUM(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT) AS z
        FROM counts
    ), fit AS (
        SELECT n, z,
               CAST(s1 AS DOUBLE) / n AS m,
               (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                * (CAST(s1 AS DOUBLE) / n)) / (n - 1) AS v
        FROM mom
    )
    SELECT n AS n_customers, z AS observed_zeros,
           ROUND(m, 4) AS mean_orders,
           ROUND(CASE WHEN v > m THEN m + v / m - 1.0 ELSE m END, 4)
               AS zip_lambda,
           ROUND(CASE WHEN v > m
                 THEN (v / m - 1.0) / (m + v / m - 1.0) ELSE 0.0 END, 6)
               AS zip_pi,
           ROUND(n * (CASE WHEN v > m
                      THEN (v / m - 1.0) / (m + v / m - 1.0) ELSE 0.0 END
                      + (1.0 - CASE WHEN v > m
                         THEN (v / m - 1.0) / (m + v / m - 1.0) ELSE 0.0 END)
                        * exp(-(CASE WHEN v > m THEN m + v / m - 1.0
                                ELSE m END))), 2) AS expected_zeros
    FROM fit
    """,
)
def zip_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-inflated Poisson fit to orders-per-customer (zeros included
    via the customer dim): MoM π̂ = (s²/m−1)/(m+s²/m−1), λ̂ = m+s²/m−1,
    plus the model's expected zero count n(π̂+(1−π̂)e^{−λ̂}) to compare
    with the observed. The structural-zeros model that separates
    'never-buyers' from 'quiet buyers' — what
    `negative_binomial_user_events` (smooth overdispersion) and plain
    Poisson can't: a spike AT zero.

    Determinism: counts and moments exact; every output is one fixed
    expression with an equidispersion guard, rounded once.

    Scale shape: dim left-join pre-aggregated orders (co-keyed),
    1-row census.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    per = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(F.lit(1)).cast("long").alias("k0")
    )
    counts = c.join(per, "c_custkey", "left").select(
        F.coalesce(F.col("k0"), F.lit(0)).cast("long").alias("k")
    )
    mom = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("k").cast("long").alias("s1"),
        F.sum(dec("k") * dec("k")).alias("s2"),
        F.sum(F.when(F.col("k") == 0, 1).otherwise(0)).cast("long").alias("z"),
    )
    m = F.col("s1").cast("double") / F.col("n")
    v = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * (F.col("s1").cast("double") / F.col("n"))
    ) / (F.col("n") - 1)
    fit = mom.select("n", "z", m.alias("m"), v.alias("v"))
    lam = F.when(
        F.col("v") > F.col("m"), F.col("m") + F.col("v") / F.col("m") - 1.0
    ).otherwise(F.col("m"))
    pi = F.when(
        F.col("v") > F.col("m"),
        (F.col("v") / F.col("m") - 1.0)
        / (F.col("m") + F.col("v") / F.col("m") - 1.0),
    ).otherwise(F.lit(0.0))
    return fit.select(
        F.col("n").alias("n_customers"),
        F.col("z").alias("observed_zeros"),
        F.round(F.col("m"), 4).alias("mean_orders"),
        F.round(lam, 4).alias("zip_lambda"),
        F.round(pi, 6).alias("zip_pi"),
        F.round(
            F.col("n") * (pi + (1.0 - pi) * F.exp(-lam)), 2
        ).alias("expected_zeros"),
    )


@query(
    "hurdle_growth_decomposition",
    oracle="""
    WITH span AS (
        SELECT MIN(epoch_us(o_orderdate)) AS lo, MAX(epoch_us(o_orderdate)) AS hi
        FROM orders
    ), halves AS (
        SELECT CASE WHEN epoch_us(o_orderdate) * 2 <= lo + hi
                    THEN 0 ELSE 1 END AS h,
               o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS spend
        FROM orders, span GROUP BY h, o_custkey
    ), base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cust FROM customer
    ), agg AS (
        SELECT h, CAST(COUNT(*) AS BIGINT) AS buyers,
               CAST(SUM(spend) AS BIGINT) AS rev
        FROM halves GROUP BY h
    ), wide AS (
        SELECT b.n_cust,
               MAX(CASE WHEN h=0 THEN buyers END) AS b0,
               MAX(CASE WHEN h=1 THEN buyers END) AS b1,
               MAX(CASE WHEN h=0 THEN rev END) AS r0,
               MAX(CASE WHEN h=1 THEN rev END) AS r1
        FROM agg, base b GROUP BY b.n_cust
    ), rates AS (
        SELECT n_cust,
               CAST(b0 AS DOUBLE) / n_cust AS p0,
               CAST(b1 AS DOUBLE) / n_cust AS p1,
               CAST(r0 AS DOUBLE) / b0 AS i0,
               CAST(r1 AS DOUBLE) / b1 AS i1,
               CAST(r1 - r0 AS DOUBLE) / n_cust AS dtotal
        FROM wide
    )
    SELECT n_cust AS n_customers,
           ROUND(dtotal / 100.0, 4) AS growth_per_cust_dollars,
           ROUND((p1 - p0) * i0 / 100.0, 4) AS participation_part,
           ROUND(p0 * (i1 - i0) / 100.0, 4) AS intensity_part,
           ROUND((p1 - p0) * (i1 - i0) / 100.0, 4) AS interaction_part
    FROM rates
    """,
)
def hurdle_growth_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurdle decomposition of half-over-half revenue growth per
    customer: Δ(p·i) = Δp·i₀ + p₀·Δi + Δp·Δi, splitting growth into
    PARTICIPATION (more buyers), INTENSITY (bigger baskets), and their
    interaction — the two margins every growth review argues about,
    stated as an exact identity. Complements
    `growth_accounting_weekly` (user flows) and `mom_revenue_growth`
    (totals) with the extensive/intensive margin split.

    Determinism: buyer counts and revenues exact; the four ratio
    terms are fixed expressions; rounding once each (the identity
    holds exactly pre-rounding; the test checks it post-rounding).

    Scale shape: per-(half, customer) agg, 2-row census, scalar
    algebra against the customer-dim census.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    em = F.expr("unix_micros(CAST(o_orderdate AS timestamp_ltz))")
    span = o.agg(F.min(em).alias("lo"), F.max(em).alias("hi"))
    halves = (
        o.crossJoin(F.broadcast(span))
        .groupBy(
            F.when(em * 2 <= F.col("lo") + F.col("hi"), 0).otherwise(1).alias("h"),
            "o_custkey",
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("spend")
        )
    )
    base = c.agg(F.count(F.lit(1)).cast("long").alias("n_cust"))
    agg = halves.groupBy("h").agg(
        F.count(F.lit(1)).cast("long").alias("buyers"),
        F.sum("spend").cast("long").alias("rev"),
    )
    wide = agg.crossJoin(F.broadcast(base)).groupBy("n_cust").agg(
        F.max(F.when(F.col("h") == 0, F.col("buyers"))).alias("b0"),
        F.max(F.when(F.col("h") == 1, F.col("buyers"))).alias("b1"),
        F.max(F.when(F.col("h") == 0, F.col("rev"))).alias("r0"),
        F.max(F.when(F.col("h") == 1, F.col("rev"))).alias("r1"),
    )
    p0 = F.col("b0").cast("double") / F.col("n_cust")
    p1 = F.col("b1").cast("double") / F.col("n_cust")
    i0 = F.col("r0").cast("double") / F.col("b0")
    i1 = F.col("r1").cast("double") / F.col("b1")
    dtotal = (F.col("r1") - F.col("r0")).cast("double") / F.col("n_cust")
    return wide.select(
        F.col("n_cust").alias("n_customers"),
        F.round(dtotal / 100.0, 4).alias("growth_per_cust_dollars"),
        F.round((p1 - p0) * i0 / 100.0, 4).alias("participation_part"),
        F.round(p0 * (i1 - i0) / 100.0, 4).alias("intensity_part"),
        F.round((p1 - p0) * (i1 - i0) / 100.0, 4).alias("interaction_part"),
    )


# ---------------------------------------------------------------------------
# wave 224: Welch's heteroscedastic ANOVA, Tukey median polish
# ---------------------------------------------------------------------------


@query(
    "welch_anova_segments",
    oracle="""
    WITH g AS (
        SELECT c.c_mktsegment AS seg,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS s1,
               SUM(CAST(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                        AS HUGEINT)
                   * CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS s2
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY seg
    ), w AS (
        SELECT seg, n,
               CAST(s1 AS DOUBLE) / n AS m,
               n / ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                     * (CAST(s1 AS DOUBLE) / n)) / (n - 1)) AS wi
        FROM g
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               SUM(wi) AS sw, SUM(wi * m) AS swm
        FROM w
    ), num AS (
        SELECT SUM(wi * (m - t.swm / t.sw) * (m - t.swm / t.sw))
                   / (t.k - 1) AS msb,
               SUM(pow(1.0 - wi / t.sw, 2) / (n - 1)) AS lam_raw,
               MAX(t.k) AS k
        FROM w, tot t GROUP BY t.k, t.sw, t.swm
    )
    SELECT k AS n_groups,
           ROUND(msb / (1.0 + 2.0 * (k - 2) / (CAST(k AS DOUBLE) * k - 1.0)
                        * lam_raw), 4) AS welch_f,
           ROUND((CAST(k AS DOUBLE) * k - 1.0) / (3.0 * lam_raw), 2)
               AS df_denominator,
           CAST(CASE WHEN msb / (1.0 + 2.0 * (k - 2)
                     / (CAST(k AS DOUBLE) * k - 1.0) * lam_raw) > 3.32
                THEN 1 ELSE 0 END AS BIGINT) AS means_differ_at_99
    FROM num
    """,
)
def welch_anova_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA on order value across the
    five market segments: F* = Σwᵢ(x̄ᵢ−x̄w)²/(k−1) over the Welch
    correction, with Satterthwaite-style denominator df — valid when
    `bartlett_variance_test` REJECTS equal variances (exactly the case
    classic `anova_f_order_priority` silently mishandles). Critical
    3.32 ≈ F(4, large) at 99%.

    Determinism: per-group (n, Σ, Σ²) exact; weights/means fixed
    expressions; the ≤5-addend weighted sums are 11 digits above the
    round grid; flags on unrounded.

    Scale shape: broadcast-dim join → 5-row moment agg → scalar
    algebra. One shuffle-free pass plus the dim join.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    g = (
        o.join(
            F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")),
            "o_custkey",
        )
        .select(F.col("c_mktsegment").alias("seg"), cents.alias("v"))
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("long").alias("s1"),
            F.sum(dec("v") * dec("v")).alias("s2"),
        )
    )
    m = F.col("s1").cast("double") / F.col("n")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * (F.col("s1").cast("double") / F.col("n"))
    ) / (F.col("n") - 1)
    w = g.select("seg", "n", m.alias("m"), (F.col("n") / var).alias("wi"))
    tot = w.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("wi").alias("sw"),
        F.sum(F.col("wi") * F.col("m")).alias("swm"),
    )
    joined = w.crossJoin(F.broadcast(tot))
    xbar_w = F.col("swm") / F.col("sw")
    num = joined.groupBy("k", "sw", "swm").agg(
        (F.sum(F.col("wi") * (F.col("m") - xbar_w) * (F.col("m") - xbar_w))
         / (F.col("k") - 1)).alias("msb"),
        F.sum(
            F.pow(1.0 - F.col("wi") / F.col("sw"), 2) / (F.col("n") - 1)
        ).alias("lam_raw"),
    )
    kd = F.col("k").cast("double")
    fstat = F.col("msb") / (
        1.0 + 2.0 * (F.col("k") - 2) / (kd * F.col("k") - 1.0) * F.col("lam_raw")
    )
    return num.select(
        F.col("k").alias("n_groups"),
        F.round(fstat, 4).alias("welch_f"),
        F.round((kd * F.col("k") - 1.0) / (3.0 * F.col("lam_raw")), 2).alias(
            "df_denominator"
        ),
        F.when(fstat > 3.32, 1)
        .otherwise(0)
        .cast("long")
        .alias("means_differ_at_99"),
    )


@query(
    "median_polish_cells",
    oracle="""
    WITH cells AS (
        SELECT CAST(SUBSTR(o.o_orderpriority, 1, 1) AS BIGINT) AS pr,
               c.c_mktsegment AS seg,
               CAST(percentile_disc(0.5) WITHIN GROUP (
                   ORDER BY CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS med
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY pr, seg
    ), row_eff AS (
        SELECT pr, CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY med)
                        AS BIGINT) AS re
        FROM cells GROUP BY pr
    ), sweep1 AS (
        SELECT c.pr, c.seg, c.med - r.re AS resid, r.re
        FROM cells c JOIN row_eff r ON r.pr = c.pr
    ), col_eff AS (
        SELECT seg, CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY resid)
                         AS BIGINT) AS ce
        FROM sweep1 GROUP BY seg
    ), sweep2 AS (
        SELECT s.pr, s.seg, CAST(s.resid - c.ce AS BIGINT) AS resid
        FROM sweep1 s JOIN col_eff c ON c.seg = s.seg
    )
    SELECT pr AS priority, seg AS segment,
           CAST(resid AS BIGINT) AS residual_cents
    FROM sweep2 ORDER BY pr, seg
    """,
)
def median_polish_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey median polish (one row sweep + one column sweep) on the
    5×5 priority × segment table of MEDIAN order values: subtract row
    medians, then column medians of the residuals, leaving the robust
    interaction residuals. The outlier-proof two-way decomposition —
    where a means-based two-way ANOVA (cf. `two_way_fixed_effects`)
    lets one giant order own a cell, the polish shrugs it off;
    residual cells that stay large are REAL interactions.

    Determinism: every median is percentile_disc (exact data values);
    all arithmetic integer cents.

    Scale shape: fact collapses to 25 cell medians (per-group exact
    median = the one sort that matters); both sweeps run on the
    25-row table.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cells = (
        o.join(
            F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")),
            "o_custkey",
        )
        .select(
            F.substring("o_orderpriority", 1, 1).cast("long").alias("pr"),
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        )
        .groupBy("pr", "seg")
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)")
            .cast("long")
            .alias("med")
        )
    )
    cells = _ckpt(cells)  # shared fan-out relation
    row_eff = cells.groupBy("pr").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY med)")
        .cast("long")
        .alias("re")
    )
    sweep1 = cells.join(row_eff, "pr").select(
        "pr", "seg", (F.col("med") - F.col("re")).alias("resid")
    )
    col_eff = sweep1.groupBy("seg").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY resid)")
        .cast("long")
        .alias("ce")
    )
    sweep2 = sweep1.join(col_eff, "seg").select(
        "pr",
        "seg",
        (F.col("resid") - F.col("ce")).cast("long").alias("resid"),
    )
    return sweep2.select(
        F.col("pr").alias("priority"),
        F.col("seg").alias("segment"),
        F.col("resid").alias("residual_cents"),
    ).orderBy("priority", "segment")


# ---------------------------------------------------------------------------
# wave 225: Markov next-event hit rate, popularity-baseline comparison
# ---------------------------------------------------------------------------

_HOLDOUT_TRANSITIONS_SQL = """
    WITH seq AS (
        SELECT user_id, event_type,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS i,
               CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
        FROM events
    ), pairs AS (
        SELECT a.user_id, a.event_type AS s, b.event_type AS t,
               a.i, a.n
        FROM seq a JOIN seq b
          ON b.user_id = a.user_id AND b.i = a.i + 1
    ), train AS (
        SELECT s, t, CAST(COUNT(*) AS BIGINT) AS c
        FROM pairs WHERE i < n - 1 GROUP BY s, t
    ), test AS (
        SELECT s, t FROM pairs WHERE i = n - 1
    )
"""


@query(
    "markov_next_event_hit_rate",
    oracle=_HOLDOUT_TRANSITIONS_SQL
    + """
    , pred AS (
        SELECT s, MAX(struct_pack(c := c, neg := t)).neg AS p
        FROM (SELECT s, t, c FROM train) GROUP BY s
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN p.p = te.t THEN 1 ELSE 0 END) AS BIGINT)
               AS hits,
           CAST(SUM(CASE WHEN p.p = te.t THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS hit_rate_ppm
    FROM test te JOIN pred p ON p.s = te.s
    """,
)
def markov_next_event_hit_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov next-event predictor, evaluated honestly:
    train the transition argmax on every user transition EXCEPT the
    last, predict each user's held-out final transition, report hit@1.
    The sequence-model baseline every session recommender must beat —
    `event_transition_matrix` describes the chain;
    this SCORES it out-of-sample (leakage-free by construction, cf.
    `leakage_safe_training_labels`).

    Determinism: total event order; argmax per state via (count,
    lexicographic-max-type) struct — engine-stable; counts exact.

    Scale shape: one self-join on (user, i+1) co-keyed with the rank
    window; train/test split is a predicate on the same relation; the
    |states|² model broadcasts back.
    """
    ev = load_table(spark, sf_dir, "events")
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wu = Window.partitionBy("user_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(wl).cast("long").alias("i"),
        F.count(F.lit(1)).over(wu).cast("long").alias("n"),
    )
    seq = _ckpt(seq)  # shared fan-out relation
    a = seq.alias("a")
    b = seq.alias("b")
    pairs = a.join(
        b,
        (F.col("b.user_id") == F.col("a.user_id"))
        & (F.col("b.i") == F.col("a.i") + 1),
    ).select(
        F.col("a.event_type").alias("s"),
        F.col("b.event_type").alias("t"),
        F.col("a.i").alias("i"),
        F.col("a.n").alias("n"),
    )
    pairs = _ckpt(pairs)  # shared fan-out relation
    train = (
        pairs.where(F.col("i") < F.col("n") - 1)
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    pred = train.groupBy("s").agg(
        F.max(F.struct(F.col("c"), F.col("t").alias("neg")))["neg"].alias("p")
    )
    test = pairs.where(F.col("i") == F.col("n") - 1).select("s", "t")
    joined = test.join(F.broadcast(pred), "s")
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(F.when(F.col("p") == F.col("t"), 1).otherwise(0))
        .cast("long")
        .alias("hits"),
        F.floor(
            F.sum(F.when(F.col("p") == F.col("t"), 1).otherwise(0))
            * 1000000
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("hit_rate_ppm"),
    )


@query(
    "popularity_baseline_hit_rate",
    oracle=_HOLDOUT_TRANSITIONS_SQL
    + """
    , gpred AS (
        SELECT MAX(struct_pack(c := c, neg := t)).neg AS p
        FROM (SELECT t, CAST(SUM(c) AS BIGINT) AS c FROM train GROUP BY t)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN g.p = te.t THEN 1 ELSE 0 END) AS BIGINT)
               AS hits,
           CAST(SUM(CASE WHEN g.p = te.t THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS hit_rate_ppm,
           MAX(g.p) AS predicted_type
    FROM test te, gpred g
    """,
)
def popularity_baseline_hit_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Popularity baseline on the identical holdout: always predict the
    globally most frequent next event type from the training
    transitions, score the same held-out finals. The sanity floor for
    `markov_next_event_hit_rate` — if conditioning on the current
    state doesn't beat this unconditional guess, the chain carries no
    usable signal (same train/test rows, so the comparison is exact).

    Determinism: identical construction; the single global argmax uses
    the same (count, type) struct order.

    Scale shape: same backbone; the model is one row.
    """
    ev = load_table(spark, sf_dir, "events")
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wu = Window.partitionBy("user_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(wl).cast("long").alias("i"),
        F.count(F.lit(1)).over(wu).cast("long").alias("n"),
    )
    seq = _ckpt(seq)  # shared fan-out relation
    a = seq.alias("a")
    b = seq.alias("b")
    pairs = a.join(
        b,
        (F.col("b.user_id") == F.col("a.user_id"))
        & (F.col("b.i") == F.col("a.i") + 1),
    ).select(
        F.col("a.event_type").alias("s"),
        F.col("b.event_type").alias("t"),
        F.col("a.i").alias("i"),
        F.col("a.n").alias("n"),
    )
    pairs = _ckpt(pairs)  # shared fan-out relation
    train = (
        pairs.where(F.col("i") < F.col("n") - 1)
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    glob = (
        train.groupBy("t")
        .agg(F.sum("c").cast("long").alias("c"))
        .agg(
            F.max(F.struct(F.col("c"), F.col("t").alias("neg")))["neg"].alias("p")
        )
    )
    test = pairs.where(F.col("i") == F.col("n") - 1).select("t")
    joined = test.crossJoin(F.broadcast(glob))
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(F.when(F.col("p") == F.col("t"), 1).otherwise(0))
        .cast("long")
        .alias("hits"),
        F.floor(
            F.sum(F.when(F.col("p") == F.col("t"), 1).otherwise(0))
            * 1000000
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("hit_rate_ppm"),
        F.max("p").alias("predicted_type"),
    )


# ---------------------------------------------------------------------------
# wave 226: IPS and SNIPS offline policy evaluation
# ---------------------------------------------------------------------------

_POLICY_EVAL_SQL = """
    WITH logged AS (
        -- context x = customer segment; action a = order priority;
        -- reward r = order value in cents
        SELECT c.c_mktsegment AS x, o.o_orderpriority AS a,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS r
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), prop AS (
        SELECT x, a, CAST(COUNT(*) AS BIGINT) AS n_xa,
               CAST(SUM(COUNT(*)) OVER (PARTITION BY x) AS BIGINT) AS n_x
        FROM logged GROUP BY x, a
    ), target AS (
        -- target policy: URGENT for BUILDING/AUTOMOBILE, else 2-HIGH
        SELECT x, CASE WHEN x IN ('BUILDING', 'AUTOMOBILE')
                       THEN '1-URGENT' ELSE '2-HIGH' END AS pi_a
        FROM (SELECT DISTINCT x FROM logged)
    ), weighted AS (
        SELECT l.r,
               CASE WHEN l.a = t.pi_a
                    THEN CAST(p.n_x AS DOUBLE) / p.n_xa ELSE 0.0 END AS w
        FROM logged l
        JOIN target t ON t.x = l.x
        JOIN prop p ON p.x = l.x AND p.a = l.a
    )
"""


@query(
    "ips_policy_value",
    oracle=_POLICY_EVAL_SQL
    + """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_logged,
           CAST(SUM(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
           ROUND(SUM(w * r) / COUNT(*) / 100.0, 4) AS ips_value_dollars,
           ROUND(SUM(r) * 1.0 / COUNT(*) / 100.0, 4)
               AS logging_value_dollars
    FROM weighted
    """,
)
def ips_policy_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-scored OFFLINE policy evaluation: estimate the
    value of a counterfactual priority policy ('URGENT for BUILDING and
    AUTOMOBILE, HIGH otherwise') from logged orders alone —
    V̂_IPS = (1/n)Σ 1{aᵢ=π(xᵢ)}·rᵢ/p̂(aᵢ|xᵢ) with propensities from the
    empirical logging distribution. The counterfactual answer A/B
    tests give you ONLY after running them (`qini_uplift_curve` needs
    an experiment; IPS replays logs), with the logging policy's value
    for reference.

    Determinism: propensities are exact count ratios; weights and the
    weighted sum are fixed double expressions over exact integers
    (magnitudes ≤10⁸, rounded at 4).

    Scale shape: one broadcast-dim join, a |x|×|a| propensity agg
    broadcast back, one weighted census. No per-action rescans.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    logged = o.join(
        F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")),
        "o_custkey",
    ).select(
        F.col("c_mktsegment").alias("x"),
        F.col("o_orderpriority").alias("a"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("r"),
    )
    prop = (
        logged.groupBy("x", "a")
        .agg(F.count(F.lit(1)).cast("long").alias("n_xa"))
        .select(
            "x",
            "a",
            "n_xa",
            F.sum("n_xa").over(Window.partitionBy("x")).cast("long").alias("n_x"),
        )
    )
    pi_a = F.when(
        F.col("x").isin("BUILDING", "AUTOMOBILE"), "1-URGENT"
    ).otherwise("2-HIGH")
    weighted = (
        logged.join(F.broadcast(prop), ["x", "a"])
        .select(
            "r",
            F.when(
                F.col("a") == pi_a,
                F.col("n_x").cast("double") / F.col("n_xa"),
            )
            .otherwise(0.0)
            .alias("w"),
        )
    )
    return weighted.agg(
        F.count(F.lit(1)).cast("long").alias("n_logged"),
        F.sum(F.when(F.col("w") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_matched"),
        F.round(
            F.sum(F.col("w") * F.col("r")) / F.count(F.lit(1)) / 100.0, 4
        ).alias("ips_value_dollars"),
        F.round(F.sum("r") * 1.0 / F.count(F.lit(1)) / 100.0, 4).alias(
            "logging_value_dollars"
        ),
    )


@query(
    "snips_policy_value",
    oracle=_POLICY_EVAL_SQL
    + """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_logged,
           ROUND(SUM(w * r) / SUM(w) / 100.0, 4) AS snips_value_dollars,
           ROUND(SUM(w) / COUNT(*), 6) AS mean_weight,
           ROUND(MAX(w), 4) AS max_weight
    FROM weighted
    """,
)
def snips_policy_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-normalized IPS on the same counterfactual policy:
    V̂_SNIPS = Σwᵢrᵢ/Σwᵢ — trades IPS's unbiasedness for dramatically
    lower variance, and its diagnostics (mean weight ≈ 1 iff the
    propensity model is consistent; max weight bounds the effective
    overlap) are the first thing to read before trusting EITHER
    estimate. Divergence between `ips_policy_value` and this flags
    weight pathology, not policy value.

    Determinism: identical weighted relation; two more fixed-ratio
    outputs, rounded once each.

    Scale shape: same single weighted census.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    logged = o.join(
        F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")),
        "o_custkey",
    ).select(
        F.col("c_mktsegment").alias("x"),
        F.col("o_orderpriority").alias("a"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("r"),
    )
    prop = (
        logged.groupBy("x", "a")
        .agg(F.count(F.lit(1)).cast("long").alias("n_xa"))
        .select(
            "x",
            "a",
            "n_xa",
            F.sum("n_xa").over(Window.partitionBy("x")).cast("long").alias("n_x"),
        )
    )
    pi_a = F.when(
        F.col("x").isin("BUILDING", "AUTOMOBILE"), "1-URGENT"
    ).otherwise("2-HIGH")
    weighted = (
        logged.join(F.broadcast(prop), ["x", "a"])
        .select(
            "r",
            F.when(
                F.col("a") == pi_a,
                F.col("n_x").cast("double") / F.col("n_xa"),
            )
            .otherwise(0.0)
            .alias("w"),
        )
    )
    return weighted.agg(
        F.count(F.lit(1)).cast("long").alias("n_logged"),
        F.round(
            F.sum(F.col("w") * F.col("r")) / F.sum("w") / 100.0, 4
        ).alias("snips_value_dollars"),
        F.round(F.sum("w") / F.count(F.lit(1)), 6).alias("mean_weight"),
        F.round(F.max("w"), 4).alias("max_weight"),
    )


# ---------------------------------------------------------------------------
# wave 227: doubly-robust policy value, greedy policy improvement
# ---------------------------------------------------------------------------


@query(
    "dr_policy_value",
    oracle=_POLICY_EVAL_SQL
    + """
    , qmodel AS (
        SELECT x, a, CAST(SUM(r) AS BIGINT) AS sr,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM logged GROUP BY x, a
    ), direct AS (
        SELECT t.x, CAST(q.sr AS DOUBLE) / q.n AS qhat
        FROM target t JOIN qmodel q ON q.x = t.x AND q.a = t.pi_a
    ), parts AS (
        SELECT l.r, d.qhat,
               CASE WHEN l.a = t.pi_a
                    THEN CAST(p.n_x AS DOUBLE) / p.n_xa ELSE 0.0 END AS w
        FROM logged l
        JOIN target t ON t.x = l.x
        JOIN prop p ON p.x = l.x AND p.a = l.a
        JOIN direct d ON d.x = l.x
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_logged,
           ROUND(SUM(qhat + w * (r - qhat)) / COUNT(*) / 100.0, 4)
               AS dr_value_dollars,
           ROUND(SUM(qhat) / COUNT(*) / 100.0, 4) AS dm_value_dollars,
           ROUND(SUM(w * r) / COUNT(*) / 100.0, 4) AS ips_value_dollars
    FROM parts
    """,
)
def dr_policy_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust offline policy value for the same counterfactual
    priority policy: V̂_DR = (1/n)Σ[q̂(x,π(x)) + w·(r − q̂(x,a))] with
    the direct model q̂ = logged mean reward per (segment, action).
    Consistent if EITHER the propensities or q̂ are right — the
    estimator that subsumes `ips_policy_value` (w-term) and the pure
    direct method (reported alongside), and the policy-value face of
    `doubly_robust_ate`.

    Determinism: q̂ and propensities are exact count/sum ratios; the
    census is one fixed-expression weighted sum, rounded per output.

    Scale shape: two tiny model aggs broadcast back over one logged
    scan; single census.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    logged = o.join(
        F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")),
        "o_custkey",
    ).select(
        F.col("c_mktsegment").alias("x"),
        F.col("o_orderpriority").alias("a"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("r"),
    )
    prop = (
        logged.groupBy("x", "a")
        .agg(F.count(F.lit(1)).cast("long").alias("n_xa"))
        .select(
            "x",
            "a",
            "n_xa",
            F.sum("n_xa").over(Window.partitionBy("x")).cast("long").alias("n_x"),
        )
    )
    qmodel = logged.groupBy("x", "a").agg(
        F.sum("r").cast("long").alias("sr"),
        F.count(F.lit(1)).cast("long").alias("nq"),
    )
    pi_a = F.when(
        F.col("x").isin("BUILDING", "AUTOMOBILE"), "1-URGENT"
    ).otherwise("2-HIGH")
    direct = (
        qmodel.where(F.col("a") == pi_a)
        .select("x", (F.col("sr").cast("double") / F.col("nq")).alias("qhat"))
    )
    parts = (
        logged.join(F.broadcast(prop), ["x", "a"])
        .join(F.broadcast(direct), "x")
        .select(
            "r",
            "qhat",
            F.when(
                F.col("a") == pi_a,
                F.col("n_x").cast("double") / F.col("n_xa"),
            )
            .otherwise(0.0)
            .alias("w"),
        )
    )
    n = F.count(F.lit(1))
    return parts.agg(
        n.cast("long").alias("n_logged"),
        F.round(
            F.sum(F.col("qhat") + F.col("w") * (F.col("r") - F.col("qhat")))
            / n
            / 100.0,
            4,
        ).alias("dr_value_dollars"),
        F.round(F.sum("qhat") / n / 100.0, 4).alias("dm_value_dollars"),
        F.round(F.sum(F.col("w") * F.col("r")) / n / 100.0, 4).alias(
            "ips_value_dollars"
        ),
    )


@query(
    "greedy_policy_improvement",
    oracle="""
    WITH logged AS (
        SELECT c.c_mktsegment AS x, o.o_orderpriority AS a,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS r
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), qmodel AS (
        SELECT x, a, CAST(SUM(r) AS BIGINT) AS sr,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM logged GROUP BY x, a
    ), scored AS (
        SELECT x, a,
               CAST(sr * 10 // n AS BIGINT) AS q_dm,
               n
        FROM qmodel WHERE n >= 30
    ), greedy AS (
        SELECT x, MAX(struct_pack(q_dm := q_dm, a := a)) AS b
        FROM scored GROUP BY x
    ), logging_v AS (
        SELECT x, CAST(SUM(r) AS BIGINT) AS sr, CAST(COUNT(*) AS BIGINT) AS n
        FROM logged GROUP BY x
    )
    SELECT g.x AS segment, g.b.a AS greedy_action,
           ROUND(g.b.q_dm / 1000.0, 4) AS greedy_value_dollars,
           ROUND(CAST(l.sr AS DOUBLE) / l.n / 100.0, 4)
               AS logging_value_dollars,
           CAST(CASE WHEN g.b.q_dm / 1000.0
                          > CAST(l.sr AS DOUBLE) / l.n / 100.0
                THEN 1 ELSE 0 END AS BIGINT) AS improves
    FROM greedy g JOIN logging_v l ON l.x = g.x ORDER BY g.x
    """,
)
def greedy_policy_improvement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One step of greedy policy improvement: per segment, pick the
    priority action with the highest direct-model value (support ≥ 30
    orders — the small-cell guard), compare against the logging
    policy's realized per-segment value. The policy-iteration move
    that turns `dr_policy_value`'s EVALUATOR into an OPTIMIZER — with
    the caveat the support filter encodes: greedy on thin cells is
    how off-policy learning overfits.

    Determinism: Q values are exact fixed-point (deci-cent integer
    division) so the per-segment argmax is a bit-stable struct-max
    with an action tie-break; comparisons on fixed expressions.

    Scale shape: two tiny aggs over one logged scan; 5-row output.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    logged = o.join(
        F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")),
        "o_custkey",
    ).select(
        F.col("c_mktsegment").alias("x"),
        F.col("o_orderpriority").alias("a"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("r"),
    )
    qmodel = logged.groupBy("x", "a").agg(
        F.sum("r").cast("long").alias("sr"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    scored = qmodel.where(F.col("n") >= 30).select(
        "x",
        "a",
        F.floor(F.col("sr") * 10 / F.col("n")).cast("long").alias("q_dm"),
    )
    greedy = scored.groupBy("x").agg(
        F.max(F.struct(F.col("q_dm"), F.col("a"))).alias("b")
    )
    logging_v = logged.groupBy("x").agg(
        F.sum("r").cast("long").alias("sr"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    out = greedy.join(logging_v, "x")
    gv = F.col("b.q_dm") / 1000.0
    lv = F.col("sr").cast("double") / F.col("n") / 100.0
    return out.select(
        F.col("x").alias("segment"),
        F.col("b.a").alias("greedy_action"),
        F.round(gv, 4).alias("greedy_value_dollars"),
        F.round(lv, 4).alias("logging_value_dollars"),
        F.when(gv > lv, 1).otherwise(0).cast("long").alias("improves"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# wave 228: zone-map pruning simulation, clustering-factor audit
# ---------------------------------------------------------------------------


@query(
    "zone_map_pruning_simulation",
    oracle="""
    WITH rows_ AS (
        SELECT l_orderkey // 512 AS nat_block,
               CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT) AS d,
               NTILE(120) OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber,
                                l_partkey) AS sorted_block
        FROM lineitem
    ), pred AS (
        SELECT CAST(MIN(d) AS BIGINT) + 30 AS plo,
               CAST(MIN(d) AS BIGINT) + 36 AS phi
        FROM rows_
    ), nat AS (
        SELECT nat_block, MIN(d) AS lo, MAX(d) AS hi FROM rows_
        GROUP BY nat_block
    ), srt AS (
        SELECT sorted_block, MIN(d) AS lo, MAX(d) AS hi FROM rows_
        GROUP BY sorted_block
    ), nat_stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS blocks,
               CAST(SUM(CASE WHEN n.hi < p.plo OR n.lo > p.phi
                        THEN 1 ELSE 0 END) AS BIGINT) AS pruned
        FROM nat n, pred p
    ), srt_stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS blocks,
               CAST(SUM(CASE WHEN s.hi < p.plo OR s.lo > p.phi
                        THEN 1 ELSE 0 END) AS BIGINT) AS pruned
        FROM srt s, pred p
    )
    SELECT n.blocks AS natural_blocks, n.pruned AS natural_pruned,
           s.blocks AS sorted_blocks, s.pruned AS sorted_pruned,
           CAST(n.pruned * 1000000 // n.blocks AS BIGINT)
               AS natural_prune_ppm,
           CAST(s.pruned * 1000000 // s.blocks AS BIGINT)
               AS sorted_prune_ppm
    FROM nat_stats n, srt_stats s
    """,
)
def zone_map_pruning_simulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max block statistics) pruning simulation for a
    one-week shipdate predicate under two physical layouts: NATURAL
    order (blocks = orderkey ranges — the as-ingested layout) vs
    SORTED by shipdate (equal-depth blocks). The prune-rate gap IS the
    quantified argument for sort-on-write — the mechanism behind
    `zorder_layout_orders` and every `PushedFilters` win at 100 TB,
    measured rather than asserted.

    Determinism: block keys are pure integer/rank functions of data
    values (never physical row position, which differs between
    engines); min/max and prune tests are exact.

    Scale shape: the sorted-layout blocks come from the
    range-bucketed distributed NTILE (``operators/rank.py`` — no
    single-task sort of the fact); two |blocks|-row min/max aggs over
    one scan plus a 1-row predicate census.
    """
    from pyspark_movie_recommender_spark.operators.rank import (
        distributed_ntile,
    )

    li = load_table(spark, sf_dir, "lineitem")
    d = F.expr(
        "unix_micros(CAST(l_shipdate AS timestamp_ltz)) div 86400000000"
    ).cast("long")
    rows_ = distributed_ntile(
        li.select(
            F.floor(F.col("l_orderkey") / 512).cast("long").alias("nat_block"),
            d.alias("d"),
            F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("sd"),
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
        ),
        "sd",
        ["l_orderkey", "l_linenumber", "l_partkey"],
        120,
        out_col="sorted_block",
    ).select("nat_block", "d", "sorted_block")
    rows_ = _ckpt(rows_)  # shared fan-out relation
    pred = rows_.agg(
        (F.min("d") + 30).alias("plo"), (F.min("d") + 36).alias("phi")
    )
    nat = rows_.groupBy("nat_block").agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    srt = rows_.groupBy("sorted_block").agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )

    def stats(df, bname, pname):
        return (
            df.crossJoin(F.broadcast(pred))
            .agg(
                F.count(F.lit(1)).cast("long").alias(bname),
                F.sum(
                    F.when(
                        (F.col("hi") < F.col("plo")) | (F.col("lo") > F.col("phi")),
                        1,
                    ).otherwise(0)
                )
                .cast("long")
                .alias(pname),
            )
        )

    ns = stats(nat, "natural_blocks", "natural_pruned")
    ss = stats(srt, "sorted_blocks", "sorted_pruned")
    return ns.crossJoin(F.broadcast(ss)).select(
        "natural_blocks",
        "natural_pruned",
        "sorted_blocks",
        "sorted_pruned",
        F.floor(F.col("natural_pruned") * 1000000 / F.col("natural_blocks"))
        .cast("long")
        .alias("natural_prune_ppm"),
        F.floor(F.col("sorted_pruned") * 1000000 / F.col("sorted_blocks"))
        .cast("long")
        .alias("sorted_prune_ppm"),
    )


@query(
    "clustering_factor_audit",
    oracle="""
    WITH base AS (
        SELECT l_orderkey,
               CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT) AS d,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price,
               CAST(l_partkey AS BIGINT) AS pk
        FROM lineitem
    )
    SELECT 'shipdate' AS column_name,
           ROUND(corr(CAST(l_orderkey AS DOUBLE), CAST(d AS DOUBLE)), 6)
               AS key_order_corr,
           CAST(CASE WHEN ABS(corr(CAST(l_orderkey AS DOUBLE),
                                   CAST(d AS DOUBLE))) > 0.5
                THEN 1 ELSE 0 END AS BIGINT) AS well_clustered
    FROM base
    UNION ALL
    SELECT 'price',
           ROUND(corr(CAST(l_orderkey AS DOUBLE), CAST(price AS DOUBLE)), 6),
           CAST(CASE WHEN ABS(corr(CAST(l_orderkey AS DOUBLE),
                                   CAST(price AS DOUBLE))) > 0.5
                THEN 1 ELSE 0 END AS BIGINT)
    FROM base
    UNION ALL
    SELECT 'partkey',
           ROUND(corr(CAST(l_orderkey AS DOUBLE), CAST(pk AS DOUBLE)), 6),
           CAST(CASE WHEN ABS(corr(CAST(l_orderkey AS DOUBLE),
                                   CAST(pk AS DOUBLE))) > 0.5
                THEN 1 ELSE 0 END AS BIGINT)
    FROM base
    ORDER BY column_name
    """,
)
def clustering_factor_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-factor audit: correlation of each candidate column
    with the ingestion key (orderkey, the natural write order) —
    Oracle's CLUSTERING_FACTOR / Postgres's pg_stats.correlation,
    computed for shipdate, price, and partkey. |r| near 1 means zone
    maps and range scans on that column are already effective in the
    natural layout (`zone_map_pruning_simulation` measures the
    consequence; this is the cheap statistic that predicts it).

    Determinism: each correlation is the engines' shared corr over
    exact integers, rounded once; flags on unrounded values.

    Scale shape: three moment censuses over one scan (Catalyst shares
    it); no sort — the entire audit is map-side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    d = F.expr(
        "unix_micros(CAST(l_shipdate AS timestamp_ltz)) div 86400000000"
    ).cast("long")
    base = li.select(
        F.col("l_orderkey").cast("double").alias("key"),
        d.cast("double").alias("d"),
        F.round(F.col("l_extendedprice") * 100).cast("double").alias("price"),
        F.col("l_partkey").cast("double").alias("pk"),
    )

    def audit(col, name):
        r = F.corr("key", col)
        return base.agg(
            F.lit(name).alias("column_name"),
            F.round(r, 6).alias("key_order_corr"),
            F.when(F.abs(r) > 0.5, 1)
            .otherwise(0)
            .cast("long")
            .alias("well_clustered"),
        )

    return (
        audit("d", "shipdate")
        .unionAll(audit("price", "price"))
        .unionAll(audit("pk", "partkey"))
        .orderBy("column_name")
    )


# ---------------------------------------------------------------------------
# wave 229: switchback ATE, carryover spillover audit
# ---------------------------------------------------------------------------


@query(
    "switchback_day_parity_ate",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY day
    ), assigned AS (
        SELECT day, v, CAST(day % 2 AS BIGINT) AS treated FROM daily
    ), mom AS (
        SELECT treated, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS s1,
               SUM(CAST(v AS HUGEINT) * v) AS s2
        FROM assigned GROUP BY treated
    ), wide AS (
        SELECT MAX(CASE WHEN treated=1 THEN n END) AS n1,
               MAX(CASE WHEN treated=0 THEN n END) AS n0,
               MAX(CASE WHEN treated=1 THEN CAST(s1 AS DOUBLE)/n END) AS m1,
               MAX(CASE WHEN treated=0 THEN CAST(s1 AS DOUBLE)/n END) AS m0,
               MAX(CASE WHEN treated=1 THEN
                   (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                    * (CAST(s1 AS DOUBLE)/n)) / (n-1) END) AS v1,
               MAX(CASE WHEN treated=0 THEN
                   (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                    * (CAST(s1 AS DOUBLE)/n)) / (n-1) END) AS v0
        FROM mom
    )
    SELECT CAST(n1 AS BIGINT) AS treated_days,
           CAST(n0 AS BIGINT) AS control_days,
           ROUND((m1 - m0) / 100.0, 2) AS ate_dollars,
           ROUND(sqrt(v1/n1 + v0/n0) / 100.0, 2) AS se_dollars,
           CAST(CASE WHEN ABS(m1 - m0) / sqrt(v1/n1 + v0/n0) > 2.5758
                THEN 1 ELSE 0 END AS BIGINT) AS significant_at_99
    FROM wide
    """,
)
def switchback_day_parity_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Switchback-design readout: with treatment toggled by DAY PARITY
    (the deterministic stand-in for a randomized switchback schedule),
    estimate the treatment effect on daily revenue with day-clustered
    Welch SE. The time-sliced design used when user-level
    randomization breaks (marketplace interference) — the unit of
    analysis is the DAY BLOCK, which is exactly what this census
    respects (`ab_experiment_readout` randomizes users; this
    randomizes time).

    Determinism: per-arm (n, Σ, Σ²) exact over exact cent days; ATE
    and SE fixed expressions, rounded; flag unrounded.

    Scale shape: fact → |days| agg → 2-row arm moments → scalar
    algebra.
    """
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    ev = load_table(spark, sf_dir, "events")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    daily = (
        ev.select(
            epoch_day("ts").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").cast("long").alias("v"))
    )
    assigned = daily.select("v", (F.col("day") % 2).cast("long").alias("treated"))
    mom = assigned.groupBy("treated").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(dec("v") * dec("v")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * (F.col("s1").cast("double") / F.col("n"))
    ) / (F.col("n") - 1)
    wide = mom.agg(
        F.max(F.when(F.col("treated") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("treated") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("treated") == 1, mean)).alias("m1"),
        F.max(F.when(F.col("treated") == 0, mean)).alias("m0"),
        F.max(F.when(F.col("treated") == 1, var)).alias("v1"),
        F.max(F.when(F.col("treated") == 0, var)).alias("v0"),
    )
    se = F.sqrt(F.col("v1") / F.col("n1") + F.col("v0") / F.col("n0"))
    diff = F.col("m1") - F.col("m0")
    return wide.select(
        F.col("n1").cast("long").alias("treated_days"),
        F.col("n0").cast("long").alias("control_days"),
        F.round(diff / 100.0, 2).alias("ate_dollars"),
        F.round(se / 100.0, 2).alias("se_dollars"),
        F.when(F.abs(diff) / se > 2.5758, 1)
        .otherwise(0)
        .cast("long")
        .alias("significant_at_99"),
    )


@query(
    "switchback_carryover_audit",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY day
    ), lagged AS (
        SELECT day, v, CAST(day % 2 AS BIGINT) AS treated,
               LAG(CAST(day % 2 AS BIGINT)) OVER (ORDER BY day) AS prev_treated,
               LAG(day) OVER (ORDER BY day) AS prev_day
        FROM daily
    ), control_days AS (
        SELECT v, prev_treated FROM lagged
        WHERE treated = 0 AND prev_treated IS NOT NULL
          AND day = prev_day + 1
    ), mom AS (
        SELECT prev_treated, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS s1
        FROM control_days GROUP BY prev_treated
    ), wide AS (
        SELECT MAX(CASE WHEN prev_treated=1 THEN n END) AS na,
               MAX(CASE WHEN prev_treated=0 THEN n END) AS nb,
               MAX(CASE WHEN prev_treated=1
                   THEN CAST(s1 AS DOUBLE)/n END) AS ma,
               MAX(CASE WHEN prev_treated=0
                   THEN CAST(s1 AS DOUBLE)/n END) AS mb
        FROM mom
    )
    SELECT CAST(COALESCE(na, 0) AS BIGINT) AS ctrl_after_treated,
           CAST(COALESCE(nb, 0) AS BIGINT) AS ctrl_after_control,
           ROUND(COALESCE(ma, 0.0) / 100.0, 2) AS mean_after_treated,
           ROUND(COALESCE(mb, 0.0) / 100.0, 2) AS mean_after_control,
           ROUND((COALESCE(ma, 0.0) - COALESCE(mb, 0.0)) / 100.0, 2)
               AS carryover_dollars
    FROM wide
    """,
)
def switchback_carryover_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Carryover audit for the switchback design: compare CONTROL days
    by what preceded them (treated vs control day). A nonzero gap is
    the treatment bleeding across the switch boundary — the violation
    that biases `switchback_day_parity_ate` toward zero and motivates
    burn-in windows. (With strict day-parity both parents are
    treated; the audit structure is what matters and generalizes to
    any schedule — documented.)

    Determinism: day parity, adjacency, and sums exact; two means
    rounded.

    Scale shape: day relation lag window + 2-row census.
    """
    from pyspark_movie_recommender_spark.operators.timeseries import epoch_day

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            epoch_day("ts").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").cast("long").alias("v"))
    )
    wd = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "v",
        (F.col("day") % 2).cast("long").alias("treated"),
        F.lag((F.col("day") % 2).cast("long")).over(wd).alias("prev_treated"),
        F.lag("day").over(wd).alias("prev_day"),
    )
    control_days = lagged.where(
        (F.col("treated") == 0)
        & F.col("prev_treated").isNotNull()
        & (F.col("day") == F.col("prev_day") + 1)
    ).select("v", "prev_treated")
    mom = control_days.groupBy("prev_treated").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s1"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    wide = mom.agg(
        F.max(F.when(F.col("prev_treated") == 1, F.col("n"))).alias("na"),
        F.max(F.when(F.col("prev_treated") == 0, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("prev_treated") == 1, mean)).alias("ma"),
        F.max(F.when(F.col("prev_treated") == 0, mean)).alias("mb"),
    )
    return wide.select(
        F.coalesce(F.col("na"), F.lit(0)).cast("long").alias("ctrl_after_treated"),
        F.coalesce(F.col("nb"), F.lit(0)).cast("long").alias("ctrl_after_control"),
        F.round(F.coalesce(F.col("ma"), F.lit(0.0)) / 100.0, 2).alias(
            "mean_after_treated"
        ),
        F.round(F.coalesce(F.col("mb"), F.lit(0.0)) / 100.0, 2).alias(
            "mean_after_control"
        ),
        F.round(
            (F.coalesce(F.col("ma"), F.lit(0.0)) - F.coalesce(F.col("mb"), F.lit(0.0)))
            / 100.0,
            2,
        ).alias("carryover_dollars"),
    )


# ---------------------------------------------------------------------------
# wave 230: grouped jackknife SE, delta-method SE for a ratio
# ---------------------------------------------------------------------------


@query(
    "jackknife_ratio_se",
    oracle="""
    WITH g AS (
        SELECT c.c_nationkey AS nk,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS s
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY nk
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(s) AS BIGINT) AS st,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM g
    ), loo AS (
        SELECT g.nk,
               CAST(t.st - g.s AS DOUBLE) / (t.nt - g.n) AS theta_i,
               t.k,
               CAST(t.st AS DOUBLE) / t.nt AS theta
        FROM g, tot t
    ), jk AS (
        SELECT MAX(k) AS k, MAX(theta) AS theta,
               AVG(theta_i) AS theta_bar,
               SUM((theta_i - (SELECT AVG(theta_i) FROM loo))
                   * (theta_i - (SELECT AVG(theta_i) FROM loo))) AS ss
        FROM loo
    )
    SELECT k AS n_groups,
           ROUND(theta / 100.0, 4) AS ratio_dollars,
           ROUND(sqrt((k - 1.0) / k * ss) / 100.0, 4) AS jackknife_se_dollars,
           ROUND((k * theta - (k - 1.0) * theta_bar) / 100.0, 4)
               AS bias_corrected_dollars
    FROM jk
    """,
)
def jackknife_ratio_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-NATION-out jackknife for the revenue-per-order ratio:
    each pseudo-estimate drops one nation's totals (computable from
    the group sums — no resampled scans), giving the grouped-jackknife
    SE √((k−1)/k·Σ(θ̂₍ᵢ₎−θ̄)²) and the bias-corrected point estimate.
    THE deterministic resampling scheme for clustered data — what
    `bootstrap_ci_order_value` does with random draws, done exactly
    over the natural clusters (and the variance trick behind
    `survey_sample_estimate`'s design effects).

    Determinism: group totals exact; each θ̂₍ᵢ₎ is one division; the
    25-term jackknife sums are O(1)-magnitude doubles 10 digits above
    the round grid.

    Scale shape: one grouped agg; the k pseudo-values come from
    broadcast totals, never rescanning. Resampling for free.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    g = (
        o.join(
            F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")),
            "o_custkey",
        )
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("s"),
        )
    )
    g = _ckpt(g)  # shared fan-out relation
    tot = g.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("s").cast("long").alias("st"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    loo = g.crossJoin(F.broadcast(tot)).select(
        ((F.col("st") - F.col("s")).cast("double") / (F.col("nt") - F.col("n"))).alias(
            "theta_i"
        ),
        "k",
        (F.col("st").cast("double") / F.col("nt")).alias("theta"),
    )
    mean_ti = loo.agg(F.avg("theta_i").alias("tb"))
    jk = loo.crossJoin(F.broadcast(mean_ti)).agg(
        F.max("k").alias("k"),
        F.max("theta").alias("theta"),
        F.avg("theta_i").alias("theta_bar"),
        F.sum(
            (F.col("theta_i") - F.col("tb")) * (F.col("theta_i") - F.col("tb"))
        ).alias("ss"),
    )
    return jk.select(
        F.col("k").cast("long").alias("n_groups"),
        F.round(F.col("theta") / 100.0, 4).alias("ratio_dollars"),
        F.round(
            F.sqrt((F.col("k") - 1.0) / F.col("k") * F.col("ss")) / 100.0, 4
        ).alias("jackknife_se_dollars"),
        F.round(
            (F.col("k") * F.col("theta") - (F.col("k") - 1.0) * F.col("theta_bar"))
            / 100.0,
            4,
        ).alias("bias_corrected_dollars"),
    )


@query(
    "delta_method_ratio_se",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS s
        FROM orders GROUP BY o_custkey
    ), mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n) AS BIGINT) AS sn, CAST(SUM(s) AS BIGINT) AS ss_,
               SUM(CAST(n AS HUGEINT) * n) AS snn,
               SUM(CAST(s AS HUGEINT) * s) AS sss,
               SUM(CAST(n AS HUGEINT) * s) AS sns
        FROM per_cust
    ), st AS (
        SELECT k,
               CAST(ss_ AS DOUBLE) / sn AS r,
               CAST(sn AS DOUBLE) / k AS nbar,
               (CAST(sss AS DOUBLE) - CAST(ss_ AS DOUBLE)
                * (CAST(ss_ AS DOUBLE) / k)) / (k - 1) AS vs,
               (CAST(snn AS DOUBLE) - CAST(sn AS DOUBLE)
                * (CAST(sn AS DOUBLE) / k)) / (k - 1) AS vn,
               (CAST(sns AS DOUBLE) - CAST(sn AS DOUBLE)
                * (CAST(ss_ AS DOUBLE) / k)) / (k - 1) AS cns
        FROM mom
    )
    SELECT k AS n_clusters,
           ROUND(r / 100.0, 4) AS ratio_dollars,
           ROUND(sqrt((vs - 2.0 * r * cns + r * r * vn) / k)
                 / nbar / 100.0, 4) AS delta_se_dollars
    FROM st
    """,
)
def delta_method_ratio_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method (Taylor-linearized) SE for the same revenue-per-
    order ratio, with CUSTOMERS as the independent clusters:
    Var(Ŝ/N̂) ≈ (v_s − 2r·c_{ns} + r²v_n)/(k·n̄²). The closed-form
    twin of `jackknife_ratio_se` — when the two disagree materially
    the ratio is too nonlinear for linearization and you trust the
    jackknife. This linearization IS how every ratio-metric A/B test
    (`ab_experiment_readout`-style revenue/user) gets its CI.

    Determinism: per-cluster (n, s) and all cross-moments exact
    (128-bit); SE is one fixed expression, rounded once.

    Scale shape: per-customer agg → 1-row moment census. One shuffle.
    """
    o = load_table(spark, sf_dir, "orders")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("s"),
    )
    mom = per_cust.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("sn"),
        F.sum("s").cast("long").alias("ss_"),
        F.sum(dec("n") * dec("n")).alias("snn"),
        F.sum(dec("s") * dec("s")).alias("sss"),
        F.sum(dec("n") * dec("s")).alias("sns"),
    )
    r = F.col("ss_").cast("double") / F.col("sn")
    nbar = F.col("sn").cast("double") / F.col("k")
    vs = (
        F.col("sss").cast("double")
        - F.col("ss_").cast("double") * (F.col("ss_").cast("double") / F.col("k"))
    ) / (F.col("k") - 1)
    vn = (
        F.col("snn").cast("double")
        - F.col("sn").cast("double") * (F.col("sn").cast("double") / F.col("k"))
    ) / (F.col("k") - 1)
    cns = (
        F.col("sns").cast("double")
        - F.col("sn").cast("double") * (F.col("ss_").cast("double") / F.col("k"))
    ) / (F.col("k") - 1)
    se = F.sqrt((vs - 2.0 * r * cns + r * r * vn) / F.col("k")) / nbar
    return mom.select(
        F.col("k").alias("n_clusters"),
        F.round(r / 100.0, 4).alias("ratio_dollars"),
        F.round(se / 100.0, 4).alias("delta_se_dollars"),
    )


# ---------------------------------------------------------------------------
# wave 231: regression-to-the-mean audit, winner's curse estimate
# ---------------------------------------------------------------------------


@query(
    "regression_to_mean_audit",
    oracle="""
    WITH span AS (
        SELECT MIN(epoch_us(o_orderdate)) AS lo, MAX(epoch_us(o_orderdate)) AS hi
        FROM orders
    ), halves AS (
        SELECT o_custkey,
               CASE WHEN epoch_us(o_orderdate) * 2 <= lo + hi
                    THEN 0 ELSE 1 END AS h,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS spend
        FROM orders, span GROUP BY o_custkey, h
    ), both_ AS (
        SELECT a.o_custkey, a.spend AS s0, b.spend AS s1
        FROM halves a JOIN halves b
          ON b.o_custkey = a.o_custkey AND a.h = 0 AND b.h = 1
    ), ranked AS (
        SELECT o_custkey, s0, s1,
               NTILE(10) OVER (ORDER BY s0 DESC, o_custkey) AS d0,
               CAST(PERCENT_RANK() OVER (ORDER BY s1, o_custkey) * 1000000
                    AS BIGINT) AS pr1_ppm
        FROM both_
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_top_decile,
           ROUND(AVG(CAST(s0 AS DOUBLE)) / 100.0, 2) AS h1_mean_dollars,
           ROUND(AVG(CAST(s1 AS DOUBLE)) / 100.0, 2) AS h2_mean_dollars,
           CAST(AVG(1000000 - pr1_ppm) AS BIGINT) AS mean_h2_rank_from_top_ppm
    FROM ranked WHERE d0 = 1
    """,
)
def regression_to_mean_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression-toward-the-mean, measured: take the TOP DECILE of
    customers by first-half spend and report their second-half mean
    and average rank-from-top. If spend were stable they'd stay at
    ~50k ppm from the top; the gap is pure selection-on-noise — the
    effect every 'VIP cohort' report confuses with churn
    (`survivorship_bias_audit` and `berkson_selection_correlation`
    complete the selection-artifact trilogy).

    Determinism: half-spends exact; decile and percent-rank windows
    carry (value, custkey) total orders, with percent_rank frozen to
    exact ppm before averaging.

    Scale shape: per-(customer, half) agg, self-join co-keyed on
    custkey, two rank windows over the joined relation, one census.
    """
    o = load_table(spark, sf_dir, "orders")
    em = F.expr("unix_micros(CAST(o_orderdate AS timestamp_ltz))")
    span = o.agg(F.min(em).alias("lo"), F.max(em).alias("hi"))
    halves = (
        o.crossJoin(F.broadcast(span))
        .groupBy(
            "o_custkey",
            F.when(em * 2 <= F.col("lo") + F.col("hi"), 0).otherwise(1).alias("h"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("spend")
        )
    )
    halves = _ckpt(halves)  # shared fan-out relation
    a = halves.where(F.col("h") == 0).select(
        "o_custkey", F.col("spend").alias("s0")
    )
    b = halves.where(F.col("h") == 1).select(
        "o_custkey", F.col("spend").alias("s1")
    )
    from pyspark_movie_recommender_spark.operators.rank import (
        distributed_ntile,
        distributed_percent_rank,
    )

    # both windows ride the per-customer relation (~10⁹ rows at
    # 100 TB): decile of first-half spend and percent-rank of
    # second-half spend both go through the distributed rank
    # machinery — never a single-task global window.
    both_ = a.join(b, "o_custkey")
    d0 = distributed_ntile(
        both_.withColumn("__ns0", (-F.col("s0")).cast("double")),
        "__ns0",
        "o_custkey",
        10,
        out_col="d0",
    ).drop("__ns0")
    pr1 = distributed_percent_rank(
        d0.withColumn("__s1", F.col("s1").cast("double")),
        "__s1",
        ["o_custkey"],
        out_col="__pr",
    ).drop("__s1")
    ranked = pr1.select(
        "o_custkey",
        "s0",
        "s1",
        "d0",
        (F.col("__pr") * 1000000).cast("long").alias("pr1_ppm"),
    )
    return ranked.where(F.col("d0") == 1).agg(
        F.count(F.lit(1)).cast("long").alias("n_top_decile"),
        F.round(F.avg(F.col("s0").cast("double")) / 100.0, 2).alias(
            "h1_mean_dollars"
        ),
        F.round(F.avg(F.col("s1").cast("double")) / 100.0, 2).alias(
            "h2_mean_dollars"
        ),
        F.avg(1000000 - F.col("pr1_ppm"))
        .cast("long")
        .alias("mean_h2_rank_from_top_ppm"),
    )


@query(
    "winners_curse_estimate",
    oracle="""
    WITH span AS (
        SELECT MIN(epoch_us(o_orderdate)) AS lo, MAX(epoch_us(o_orderdate)) AS hi
        FROM orders
    ), nat AS (
        SELECT c.c_nationkey AS nk,
               CASE WHEN epoch_us(o.o_orderdate) * 2 <= lo + hi
                    THEN 0 ELSE 1 END AS h,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey, span
        GROUP BY nk, h
    ), wide AS (
        SELECT nk,
               MAX(CASE WHEN h=0 THEN CAST(rev AS DOUBLE)/n END) AS m0,
               MAX(CASE WHEN h=1 THEN CAST(rev AS DOUBLE)/n END) AS m1
        FROM nat GROUP BY nk
        HAVING MAX(CASE WHEN h=0 THEN n END) IS NOT NULL
           AND MAX(CASE WHEN h=1 THEN n END) IS NOT NULL
    ), winner AS (
        SELECT nk, m0, m1 FROM wide ORDER BY m0 DESC, nk LIMIT 1
    ), grand AS (
        SELECT AVG(m0) AS g0, AVG(m1) AS g1 FROM wide
    )
    SELECT w.nk AS winner_nation,
           ROUND(w.m0 / 100.0, 2) AS winner_h1_mean,
           ROUND(w.m1 / 100.0, 2) AS winner_h2_mean,
           ROUND((w.m0 - g.g0) / 100.0, 2) AS h1_edge_dollars,
           ROUND((w.m1 - g.g1) / 100.0, 2) AS h2_edge_dollars,
           ROUND(CASE WHEN w.m0 - g.g0 <> 0
                 THEN (w.m1 - g.g1) / (w.m0 - g.g0) ELSE 0.0 END, 6)
               AS edge_persistence
    FROM winner w, grand g
    """,
)
def winners_curse_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winner's curse, measured on nations: crown the nation with the
    best first-half mean order value, then watch its second-half edge.
    Persistence ≪ 1 means the 'best market' was mostly selected noise
    — the exact bias that inflates every post-hoc 'top performer'
    narrative, and the reason `obf_sequential_monitoring`-style
    corrections exist for picking winners mid-experiment.

    Determinism: per-(nation, half) sums exact; the winner is a
    (mean, nation) ordered top-1; ratios fixed expressions rounded.

    Scale shape: one grouped agg, 25-row pivots, two tiny censuses.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    em = F.expr("unix_micros(CAST(o_orderdate AS timestamp_ltz))")
    span = o.agg(F.min(em).alias("lo"), F.max(em).alias("hi"))
    nat = (
        o.join(
            F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")),
            "o_custkey",
        )
        .crossJoin(F.broadcast(span))
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.when(em * 2 <= F.col("lo") + F.col("hi"), 0).otherwise(1).alias("h"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("rev"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    wide = (
        nat.groupBy("nk")
        .agg(
            F.max(
                F.when(F.col("h") == 0, F.col("rev").cast("double") / F.col("n"))
            ).alias("m0"),
            F.max(
                F.when(F.col("h") == 1, F.col("rev").cast("double") / F.col("n"))
            ).alias("m1"),
            F.max(F.when(F.col("h") == 0, F.col("n"))).alias("n0"),
            F.max(F.when(F.col("h") == 1, F.col("n"))).alias("n1"),
        )
        .where(F.col("n0").isNotNull() & F.col("n1").isNotNull())
    )
    wide = _ckpt(wide)  # shared fan-out relation
    winner = wide.orderBy(F.col("m0").desc(), "nk").limit(1).select(
        "nk", "m0", "m1"
    )
    grand = wide.agg(F.avg("m0").alias("g0"), F.avg("m1").alias("g1"))
    persistence = F.when(
        F.col("m0") - F.col("g0") != 0,
        (F.col("m1") - F.col("g1")) / (F.col("m0") - F.col("g0")),
    ).otherwise(0.0)
    return winner.crossJoin(F.broadcast(grand)).select(
        F.col("nk").alias("winner_nation"),
        F.round(F.col("m0") / 100.0, 2).alias("winner_h1_mean"),
        F.round(F.col("m1") / 100.0, 2).alias("winner_h2_mean"),
        F.round((F.col("m0") - F.col("g0")) / 100.0, 2).alias("h1_edge_dollars"),
        F.round((F.col("m1") - F.col("g1")) / 100.0, 2).alias("h2_edge_dollars"),
        F.round(persistence, 6).alias("edge_persistence"),
    )


# ---------------------------------------------------------------------------
# wave 232: German tank estimator, birthday-collision population estimate
# ---------------------------------------------------------------------------


@query(
    "german_tank_estimator",
    oracle="""
    WITH sample_ AS (
        -- the 'observed serials': partkeys seen in AIR-shipped lines
        SELECT DISTINCT l_partkey AS serial FROM lineitem
        WHERE CAST(ROUND(l_discount * 100) AS BIGINT) = 4
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(MAX(serial) AS BIGINT) AS m
        FROM sample_
    ), truth AS (
        SELECT CAST(MAX(p_partkey) AS BIGINT) AS n_true FROM part
    )
    SELECT s.k AS n_observed, s.m AS max_serial,
           CAST(s.m + (s.m // s.k) - 1 AS BIGINT) AS mvue_estimate,
           CAST(ROUND((s.m + CAST(s.m AS DOUBLE) / s.k - 1.0)
                 - 2.0 * (CAST(s.m AS DOUBLE) - s.k) / s.k) AS BIGINT)
               AS ci_low_approx,
           t.n_true,
           CAST(ABS(s.m + (s.m // s.k) - 1 - t.n_true) * 1000000 // t.n_true
                AS BIGINT) AS rel_err_ppm
    FROM stats s, truth t
    """,
)
def german_tank_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """German tank estimator: infer the part-catalog size from the
    serial numbers observed in a biased slice (lines at exactly 4%
    discount): N̂ = m + m/k − 1, the UMVU estimator from WWII
    production intelligence — compared against the true max partkey.
    The serial-number counterpart of `capture_recapture_estimate`
    (overlap-based) and `approx_distinct_parts` (sketch-based): three
    ways to size a population you can't enumerate.

    Determinism: k, m, and the estimator are exact integers (DuckDB's
    BIGINT m/k division mirrored by Spark's div); the CI bound is one
    fixed rounded expression.

    Scale shape: one filtered distinct (hash agg), two 1-row censuses.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    sample_ = (
        li.where(F.round(F.col("l_discount") * 100).cast("long") == 4)
        .select(F.col("l_partkey").alias("serial"))
        .distinct()
    )
    stats = sample_.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("serial").cast("long").alias("m"),
    )
    truth = p.agg(F.max("p_partkey").cast("long").alias("n_true"))
    mvue = F.col("m") + F.expr("m div k") - 1
    return stats.crossJoin(F.broadcast(truth)).select(
        F.col("k").alias("n_observed"),
        F.col("m").alias("max_serial"),
        mvue.cast("long").alias("mvue_estimate"),
        F.round(
            (F.col("m") + F.col("m").cast("double") / F.col("k") - 1.0)
            - 2.0 * (F.col("m").cast("double") - F.col("k")) / F.col("k")
        )
        .cast("long")
        .alias("ci_low_approx"),
        "n_true",
        F.floor(
            F.abs(mvue - F.col("n_true")) * 1000000 / F.col("n_true")
        )
        .cast("long")
        .alias("rel_err_ppm"),
    )


@query(
    "birthday_collision_estimate",
    oracle="""
    WITH keys_ AS (
        SELECT DISTINCT o_custkey AS k FROM orders
    ), buckets AS (
        SELECT (k * 2654435761) % 4096 AS b FROM keys_
    ), occ AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM buckets GROUP BY b
    ), stats AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n_keys,
               CAST(COUNT(*) AS BIGINT) AS occupied,
               CAST(SUM(c * (c - 1) / 2) AS BIGINT) AS collisions
        FROM occ
    )
    SELECT occupied AS occupied_buckets,
           collisions AS pairwise_collisions,
           n_keys AS true_distinct,
           -- occupancy (coupon-collector) inversion:
           -- n ~ -m ln(1 - occupied/m)
           CAST(ROUND(-4096.0 * ln(1.0 - CAST(occupied AS DOUBLE) / 4096.0))
                AS BIGINT) AS occupancy_estimate,
           -- birthday inversion: C(n,2)/m = E[collisions]
           CAST(ROUND((1.0 + sqrt(1.0 + 8.0 * 4096.0 * collisions)) / 2.0)
                AS BIGINT) AS collision_estimate
    FROM stats
    """,
)
def birthday_collision_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two hash-sketch population estimators from ONE 4096-bucket
    histogram: the occupancy (linear-counting) inversion
    n̂ = −m·ln(1−occupied/m) and the birthday-paradox inversion from
    pairwise collision counts, both against the true distinct count.
    Linear counting is literally the small-range regime of HLL
    (`hll_sketch_rollup`) — here its machinery is laid open and
    audited, with the collision estimator as the independent
    cross-check.

    Determinism: bucket ids via the shared multiplicative mixing (NOT
    engine hash() builtins); occupancy/collision counts exact; the
    two inversions are single rounded expressions.

    Scale shape: distinct → bucket agg (4096 rows max) → census. The
    sketch never exceeds the bucket count regardless of input size.
    """
    o = load_table(spark, sf_dir, "orders")
    keys_ = o.select(F.col("o_custkey").alias("k")).distinct()
    buckets = keys_.select(((F.col("k") * 2654435761) % 4096).alias("b"))
    occ = buckets.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    stats = occ.agg(
        F.sum("c").cast("long").alias("n_keys"),
        F.count(F.lit(1)).cast("long").alias("occupied"),
        F.sum(F.expr("c * (c - 1) div 2")).cast("long").alias("collisions"),
    )
    return stats.select(
        F.col("occupied").alias("occupied_buckets"),
        F.col("collisions").alias("pairwise_collisions"),
        F.col("n_keys").alias("true_distinct"),
        F.round(
            -4096.0 * F.log(1.0 - F.col("occupied").cast("double") / 4096.0)
        )
        .cast("long")
        .alias("occupancy_estimate"),
        F.round(
            (1.0 + F.sqrt(1.0 + 8.0 * 4096.0 * F.col("collisions"))) / 2.0
        )
        .cast("long")
        .alias("collision_estimate"),
    )


# ---------------------------------------------------------------------------
# wave 233: Bellman-Ford trade costs, min-plus squaring graph diameter
# ---------------------------------------------------------------------------

_TRADE_EDGE_SQL = """
    WITH flows AS (
        SELECT s.s_nationkey AS u, c.c_nationkey AS v,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS f
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE s.s_nationkey <> c.c_nationkey
        GROUP BY u, v
    ), tot AS (SELECT CAST(SUM(f) AS BIGINT) AS tf FROM flows
    ), edges AS (
        -- cost = -ln(flow share) in exact micro-nats, symmetrized
        SELECT u, v,
               CAST(ROUND(-ln(CAST(f AS DOUBLE) / tf) * 1000000) AS BIGINT)
                   AS w
        FROM flows, tot
    )
"""


@query(
    "bellman_ford_trade_costs",
    oracle=_TRADE_EDGE_SQL
    + """
    , r0 AS (
        SELECT 0 AS node, CAST(0 AS BIGINT) AS d
        UNION ALL
        SELECT v AS node, w AS d FROM edges WHERE u = 0
    ), d0 AS (SELECT node, MIN(d) AS d FROM r0 GROUP BY node
    ), r1 AS (
        SELECT node, d FROM d0
        UNION ALL
        SELECT e.v AS node, d0.d + e.w AS d
        FROM d0 JOIN edges e ON e.u = d0.node
    ), d1 AS (SELECT node, MIN(d) AS d FROM r1 GROUP BY node
    ), r2 AS (
        SELECT node, d FROM d1
        UNION ALL
        SELECT e.v AS node, d1.d + e.w AS d
        FROM d1 JOIN edges e ON e.u = d1.node
    ), d2 AS (SELECT node, MIN(d) AS d FROM r2 GROUP BY node
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS reachable_nations,
           CAST(MAX(d) AS BIGINT) AS max_cost_micro_nats,
           CAST(MIN(CASE WHEN node <> 0 THEN d END) AS BIGINT)
               AS nearest_cost_micro_nats,
           CAST(SUM(d) AS BIGINT) AS total_cost_micro_nats
    FROM d2
    """,
)
def bellman_ford_trade_costs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bellman-Ford single-source cheapest paths from nation 0 over the
    trade graph with costs −ln(flow share) (so path cost = −ln of the
    path's multiplicative flow affinity): two relaxation rounds
    (diameter-bounded for this dense graph) via join-relax-min.
    The WEIGHTED companion of `bfs_copurchase_hops` — at 1000-executor
    scale this join-relax round IS how you run SSSP, one shuffle per
    round.

    Determinism: edge costs frozen to exact micro-nat integers (ONE
    rounding per edge, identical both engines); all relaxation is
    integer min-plus — bit-exact.

    Scale shape: |edges| ≈ 600 rows after the fact collapses; each
    round is an equi-join + min agg. Rounds are data-independent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    flows = (
        li.join(
            F.broadcast(s.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")),
            "l_suppkey",
        )
        .join(
            o.select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"),
            "l_orderkey",
        )
        .join(
            F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")),
            "o_custkey",
        )
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("u"), F.col("c_nationkey").alias("v")
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("f")
        )
    )
    # the ~600-row edge relation fans out to the seed frontier plus
    # BOTH relaxation rounds — without materialization each round
    # re-executes the 4-table fact join (census: 14 scans per table)
    flows = _ckpt(flows)  # shared fan-out relation (tot / edges)
    tot = flows.agg(F.sum("f").cast("long").alias("tf"))
    edges = flows.crossJoin(F.broadcast(tot)).select(
        "u",
        "v",
        F.round(-F.log(F.col("f").cast("double") / F.col("tf")) * 1000000)
        .cast("long")
        .alias("w"),
    )
    edges = _ckpt(edges)  # shared fan-out relation (seed + 2 relax rounds)
    d = edges.where(F.col("u") == 0).select(
        F.col("v").alias("node"), F.col("w").alias("d")
    ).unionAll(
        edges.sparkSession.createDataFrame([(0, 0)], ["node", "d"])
    ).groupBy("node").agg(F.min("d").cast("long").alias("d"))
    for _ in range(2):
        relaxed = d.join(edges, F.col("node") == F.col("u")).select(
            F.col("v").alias("node"), (F.col("d") + F.col("w")).alias("d")
        )
        d = (
            d.select("node", "d")
            .unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("d").cast("long").alias("d"))
        )
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("reachable_nations"),
        F.max("d").cast("long").alias("max_cost_micro_nats"),
        F.min(F.when(F.col("node") != 0, F.col("d")))
        .cast("long")
        .alias("nearest_cost_micro_nats"),
        F.sum("d").cast("long").alias("total_cost_micro_nats"),
    )


@query(
    "minplus_diameter_trade",
    oracle=_TRADE_EDGE_SQL
    + """
    , und AS (
        SELECT u, v, MIN(w) AS w FROM (
            SELECT u, v, w FROM edges
            UNION ALL SELECT v AS u, u AS v, w FROM edges
        ) GROUP BY u, v
    ), d1 AS (
        SELECT u, v, w FROM und
    ), d2 AS (
        -- one min-plus squaring: paths of length <= 2
        SELECT x.u, y.v, MIN(x.w + y.w) AS w
        FROM d1 x JOIN d1 y ON y.u = x.v
        WHERE x.u <> y.v
        GROUP BY x.u, y.v
    ), d2m AS (
        SELECT u, v, MIN(w) AS w FROM (
            SELECT u, v, w FROM d1 UNION ALL SELECT u, v, w FROM d2
        ) GROUP BY u, v
    ), d4 AS (
        SELECT x.u, y.v, MIN(x.w + y.w) AS w
        FROM d2m x JOIN d2m y ON y.u = x.v
        WHERE x.u <> y.v
        GROUP BY x.u, y.v
    ), d4m AS (
        SELECT u, v, MIN(w) AS w FROM (
            SELECT u, v, w FROM d2m UNION ALL SELECT u, v, w FROM d4
        ) GROUP BY u, v
    ), ecc AS (
        SELECT u, CAST(MAX(w) AS BIGINT) AS e FROM d4m GROUP BY u
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MAX(e) AS BIGINT) AS diameter_micro_nats,
           CAST(MIN(e) AS BIGINT) AS radius_micro_nats,
           CAST((SELECT COUNT(*) FROM d4m) AS BIGINT) AS reachable_pairs
    FROM ecc
    """,
)
def minplus_diameter_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs shortest paths on the symmetrized trade graph by
    MIN-PLUS MATRIX SQUARING (two squarings cover paths to length 4 ≥
    this dense graph's hop diameter), yielding eccentricities, the
    weighted diameter, and the radius. Squaring doubles path length
    per round — log₂(diameter) shuffles instead of diameter rounds,
    the right all-pairs strategy when the vertex set is small and the
    fact table is what's huge (`bellman_ford_trade_costs` is the
    single-source linear-round version).

    Determinism: same frozen micro-nat edge costs; min-plus is exact
    integer algebra throughout.

    Scale shape: squarings are self-joins on the ≤n² distance
    relation (n=25 ⇒ ≤625 rows) — independent of fact volume after
    the one collapse.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    flows = (
        li.join(
            F.broadcast(s.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")),
            "l_suppkey",
        )
        .join(
            o.select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"),
            "l_orderkey",
        )
        .join(
            F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")),
            "o_custkey",
        )
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("u"), F.col("c_nationkey").alias("v")
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("f")
        )
    )
    flows = _ckpt(flows)  # shared fan-out relation
    tot = flows.agg(F.sum("f").cast("long").alias("tf"))
    edges = flows.crossJoin(F.broadcast(tot)).select(
        "u",
        "v",
        F.round(-F.log(F.col("f").cast("double") / F.col("tf")) * 1000000)
        .cast("long")
        .alias("w"),
    )
    und = (
        edges.select("u", "v", "w")
        .unionAll(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
        )
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
    )

    def square(dm):
        x = dm.alias("x")
        y = dm.alias("y")
        d2 = (
            x.join(y, F.col("y.u") == F.col("x.v"))
            .where(F.col("x.u") != F.col("y.v"))
            .groupBy(F.col("x.u").alias("u"), F.col("y.v").alias("v"))
            .agg(F.min(F.col("x.w") + F.col("y.w")).alias("w"))
        )
        return (
            dm.select("u", "v", "w")
            .unionAll(d2)
            .groupBy("u", "v")
            .agg(F.min("w").alias("w"))
        )

    d2m = square(und)
    d4m = square(d2m)
    ecc = d4m.groupBy("u").agg(F.max("w").cast("long").alias("e"))
    pairs = d4m.agg(F.count(F.lit(1)).cast("long").alias("reachable_pairs"))
    return ecc.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.max("e").cast("long").alias("diameter_micro_nats"),
        F.min("e").cast("long").alias("radius_micro_nats"),
    ).crossJoin(F.broadcast(pairs))


@query(
    "palma_hoover_inequality",
    oracle="""
    WITH spend AS (
        SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY o_custkey
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(cents) AS t FROM spend
    ), ranked AS (
        SELECT s.cents, t.n, t.t,
               ROW_NUMBER() OVER (ORDER BY s.cents, s.o_custkey) AS rn
        FROM spend s CROSS JOIN tot t
    ), flagged AS (
        SELECT cents, n, t,
               CASE WHEN rn <= (4 * n) // 10 THEN 1 ELSE 0 END AS is_b40,
               CASE WHEN rn > n - n // 10 THEN 1 ELSE 0 END AS is_t10,
               ABS(cents * n - t) AS hoover_term
        FROM ranked
    )
    SELECT MAX(n) AS n_customers,
           CAST(SUM(is_t10) AS BIGINT) AS top10_n,
           CAST(SUM(is_b40) AS BIGINT) AS bottom40_n,
           CAST(ROUND(1000000.0 * SUM(is_t10 * cents) / MAX(t)) AS BIGINT)
               AS top10_share_ppm,
           CAST(ROUND(1000000.0 * SUM(is_b40 * cents) / MAX(t)) AS BIGINT)
               AS bottom40_share_ppm,
           CAST(ROUND(1000000.0 * SUM(is_t10 * cents) / SUM(is_b40 * cents))
               AS BIGINT) AS palma_ppm,
           CAST(ROUND(1000000.0 * SUM(hoover_term)
                      / (2.0 * MAX(t) * MAX(n))) AS BIGINT) AS hoover_ppm
    FROM flagged
    """,
)
def palma_hoover_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Palma ratio (top-10% spend share over bottom-40% share) and the
    Hoover/Robin Hood index (half the total |share − 1/n| mass — the
    fraction of spend that would have to move to equalize customers)
    over per-customer order spend. Complements the Lorenz/Gini/Theil/
    Atkinson family already in the registry: Palma reads inequality
    straight off the distribution tails, Hoover off the L1 gap.

    Determinism: spend frozen to integer cents; the Hoover numerator
    Σ|cents·n − T| is exact BIGINT algebra (one float division at the
    end); tail membership uses integer-division cutoffs with a total
    (cents, custkey) tie-break order.

    Scale shape: one hash aggregate collapses the fact table to one
    row per customer; the spend rank over that collapsed relation
    (~10⁹ rows at 100 TB) runs through ``operators/rank.py``
    distributed_global_rank (range-bucket on cents, per-bucket
    windows, broadcast prefix offsets) — never a single-task global
    window.
    """
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    tot = spend.agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("cents").alias("t")
    )
    from pyspark_movie_recommender_spark.operators.rank import (
        distributed_global_rank,
    )

    # global spend rank over the per-customer relation (~10⁹ rows at
    # 100 TB) via the distributed rank machinery — never a
    # single-task global window.
    ranked = distributed_global_rank(
        spend.withColumn("__c", F.col("cents").cast("double")),
        "__c",
        "o_custkey",
        out_col="rn",
    ).drop("__c").crossJoin(F.broadcast(tot))
    flagged = ranked.select(
        "cents",
        "n",
        "t",
        F.when(
            F.col("rn") <= F.floor((4 * F.col("n")) / 10).cast("long"), 1
        )
        .otherwise(0)
        .alias("is_b40"),
        F.when(F.col("rn") > F.col("n") - F.floor(F.col("n") / 10).cast("long"), 1)
        .otherwise(0)
        .alias("is_t10"),
        F.abs(F.col("cents") * F.col("n") - F.col("t")).alias("hoover_term"),
    )
    return flagged.agg(
        F.max("n").alias("n_customers"),
        F.sum("is_t10").cast("long").alias("top10_n"),
        F.sum("is_b40").cast("long").alias("bottom40_n"),
        F.round(
            1000000.0 * F.sum(F.col("is_t10") * F.col("cents")) / F.max("t")
        )
        .cast("long")
        .alias("top10_share_ppm"),
        F.round(
            1000000.0 * F.sum(F.col("is_b40") * F.col("cents")) / F.max("t")
        )
        .cast("long")
        .alias("bottom40_share_ppm"),
        F.round(
            1000000.0
            * F.sum(F.col("is_t10") * F.col("cents"))
            / F.sum(F.col("is_b40") * F.col("cents"))
        )
        .cast("long")
        .alias("palma_ppm"),
        F.round(
            1000000.0 * F.sum("hoover_term") / (2.0 * F.max("t") * F.max("n"))
        )
        .cast("long")
        .alias("hoover_ppm"),
    )


@query(
    "ransac_line_quantity_price",
    oracle="""
    WITH pts AS (
        SELECT CAST(l_quantity AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS yc,
               l_orderkey, l_linenumber,
               ((l_orderkey * 8 + l_linenumber) * 2654435761) % 4294967296 AS h
        FROM lineitem
    ), sampled AS (
        SELECT x, yc,
               ROW_NUMBER() OVER (ORDER BY h, l_orderkey, l_linenumber) AS rn
        FROM pts
        ORDER BY h, l_orderkey, l_linenumber
        LIMIT 32
    ), models AS (
        SELECT (a.rn + 1) // 2 AS pair_id,
               CAST(b.yc - a.yc AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope_c,
               a.yc - CAST(b.yc - a.yc AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) * a.x
                   AS icept_c
        FROM sampled a JOIN sampled b ON b.rn = a.rn + 1 AND a.rn % 2 = 1
        WHERE b.x <> a.x
    ), votes AS (
        SELECT m.pair_id, CAST(COUNT(*) AS BIGINT) AS inliers
        FROM pts p CROSS JOIN models m
        WHERE ABS(p.yc - (m.icept_c + m.slope_c * p.x)) <= 300000.0
        GROUP BY m.pair_id
    ), best AS (
        SELECT v.pair_id, v.inliers, m.slope_c, m.icept_c
        FROM votes v JOIN models m ON m.pair_id = v.pair_id
        ORDER BY v.inliers DESC, v.pair_id LIMIT 1
    ), refit AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
               SUM(p.x) AS sx, SUM(p.yc) AS sy,
               SUM(p.x * p.x) AS sxx, SUM(p.x * p.yc) AS sxy,
               MAX(b.pair_id) AS best_pair_id, MAX(b.inliers) AS best_inliers
        FROM pts p CROSS JOIN best b
        WHERE ABS(p.yc - (b.icept_c + b.slope_c * p.x)) <= 300000.0
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM models) AS n_candidates
        FROM pts
    )
    SELECT t.n_points, t.n_candidates, r.best_pair_id, r.best_inliers,
           CAST(ROUND(1000000.0 * r.best_inliers / t.n_points) AS BIGINT)
               AS inlier_ratio_ppm,
           ROUND((CAST(r.m AS DOUBLE) * CAST(r.sxy AS DOUBLE)
                  - CAST(r.sx AS DOUBLE) * CAST(r.sy AS DOUBLE))
                 / (CAST(r.m AS DOUBLE) * CAST(r.sxx AS DOUBLE)
                    - CAST(r.sx AS DOUBLE) * CAST(r.sx AS DOUBLE)), 6)
               AS refit_slope_cents,
           ROUND((CAST(r.sy AS DOUBLE)
                  - (CAST(r.m AS DOUBLE) * CAST(r.sxy AS DOUBLE)
                     - CAST(r.sx AS DOUBLE) * CAST(r.sy AS DOUBLE))
                    / (CAST(r.m AS DOUBLE) * CAST(r.sxx AS DOUBLE)
                       - CAST(r.sx AS DOUBLE) * CAST(r.sx AS DOUBLE))
                    * CAST(r.sx AS DOUBLE)) / CAST(r.m AS DOUBLE), 2)
               AS refit_intercept_cents
    FROM refit r CROSS JOIN tot t
    """,
)
def ransac_line_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic RANSAC line fit of extended price on quantity:
    16 candidate models from Knuth-hash-selected point pairs, inlier
    voting under a fixed cent tolerance, then an exact-integer OLS
    refit on the winning consensus set. The classic robust-fit loop
    (hypothesize from a minimal sample → vote → refit) re-expressed as
    three scans with broadcast model tables — no Python, no randomness.

    Determinism: the "random" sample is the 32 lowest multiplicative-
    hash rows with a total tie-break; slope/intercept arithmetic is
    fixed-order IEEE on exactly-representable integers (prices frozen
    to cents, quantities integral), so both engines compute
    bit-identical doubles; the refit uses exact BIGINT moment sums
    with the n·Sxy products formed in DOUBLE to stay overflow-safe.

    Scale shape: candidate generation is a 32-row top-k
    (TakeOrderedAndProject — no global sort); voting and refit are
    map-side broadcast joins against a ≤16-row model table followed by
    tiny hash aggregates. Two fact scans total, zero fact shuffles.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("yc"),
        "l_orderkey",
        "l_linenumber",
        (
            ((F.col("l_orderkey") * 8 + F.col("l_linenumber")) * 2654435761)
            % 4294967296
        ).alias("h"),
    )
    sampled = (
        pts.orderBy("h", "l_orderkey", "l_linenumber")
        .limit(32)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy("h", "l_orderkey", "l_linenumber")
            ),
        )
        .select("x", "yc", "rn")
    )
    sampled = _ckpt(sampled)  # shared fan-out relation
    a = sampled.alias("a")
    b = sampled.alias("b")
    # try_divide: ANSI mode would raise on the degenerate x1==x2 pair even
    # though the filter below removes it (division is codegen'd with the join)
    slope = F.try_divide(
        (F.col("b.yc") - F.col("a.yc")).cast("double"),
        (F.col("b.x") - F.col("a.x")).cast("double"),
    )
    models = (
        a.join(
            b,
            (F.col("b.rn") == F.col("a.rn") + 1) & (F.col("a.rn") % 2 == 1),
        )
        .where(F.col("b.x") != F.col("a.x"))
        .select(
            F.floor((F.col("a.rn") + 1) / 2).alias("pair_id"),
            slope.alias("slope_c"),
            (F.col("a.yc") - slope * F.col("a.x")).alias("icept_c"),
        )
    )
    resid = F.abs(
        F.col("yc") - (F.col("icept_c") + F.col("slope_c") * F.col("x"))
    )
    votes = (
        pts.crossJoin(F.broadcast(models))
        .where(resid <= 300000.0)
        .groupBy("pair_id")
        .agg(F.count(F.lit(1)).cast("long").alias("inliers"))
    )
    best = (
        votes.join(F.broadcast(models), "pair_id")
        .orderBy(F.desc("inliers"), F.asc("pair_id"))
        .limit(1)
    )
    refit = (
        pts.crossJoin(F.broadcast(best))
        .where(resid <= 300000.0)
        .agg(
            F.count(F.lit(1)).cast("long").alias("m"),
            F.sum("x").alias("sx"),
            F.sum("yc").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("yc")).alias("sxy"),
            F.max("pair_id").alias("best_pair_id"),
            F.max("inliers").alias("best_inliers"),
        )
    )
    tot = pts.agg(F.count(F.lit(1)).cast("long").alias("n_points")).crossJoin(
        F.broadcast(models.agg(F.count(F.lit(1)).cast("long").alias("n_candidates")))
    )
    md, sxyd, sxd, syd, sxxd = (
        F.col("m").cast("double"),
        F.col("sxy").cast("double"),
        F.col("sx").cast("double"),
        F.col("sy").cast("double"),
        F.col("sxx").cast("double"),
    )
    slope_refit = (md * sxyd - sxd * syd) / (md * sxxd - sxd * sxd)
    return refit.crossJoin(F.broadcast(tot)).select(
        "n_points",
        "n_candidates",
        "best_pair_id",
        "best_inliers",
        F.round(1000000.0 * F.col("best_inliers") / F.col("n_points"))
        .cast("long")
        .alias("inlier_ratio_ppm"),
        F.round(slope_refit, 6).alias("refit_slope_cents"),
        F.round((syd - slope_refit * sxd) / md, 2).alias("refit_intercept_cents"),
    )


@query(
    "largest_rectangle_daily_value",
    oracle="""
    WITH bars AS (
        SELECT CAST(ts AS DATE) AS d,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS v,
               ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) AS i
        FROM events GROUP BY CAST(ts AS DATE)
    ), spans AS (
        SELECT a.i AS i, b.i AS j, a.d AS start_d, b.d AS end_d,
               b.i - a.i + 1 AS width, MIN(k.v) AS h
        FROM bars a
        JOIN bars b ON b.i >= a.i
        JOIN bars k ON k.i BETWEEN a.i AND b.i
        GROUP BY a.i, b.i, a.d, b.d
    ), best AS (
        SELECT * FROM spans
        ORDER BY width * h DESC, i, j LIMIT 1
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM bars) AS n_days,
           best.start_d AS best_start_date, best.end_d AS best_end_date,
           CAST(best.width AS BIGINT) AS width_days,
           CAST(best.h AS BIGINT) AS min_height_cents,
           CAST(best.width * best.h AS BIGINT) AS area_cents_days
    FROM best
    """,
)
def largest_rectangle_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest rectangle under the daily-event-value histogram: the
    contiguous day span maximizing span-width × minimum-daily-total —
    the "widest sustained throughput band" a capacity planner reads off
    a bar chart. The classic monotonic-stack interview problem, here in
    its relational O(n³) form because n is the CALENDAR-DAY count of the
    collapsed series, not the fact count.

    Determinism: daily totals frozen to integer cents; area ordering and
    the (i, j) tie-break are exact BIGINT comparisons.

    Scale shape: the fact table collapses to one row per day in a single
    hash aggregate; the triple self-join runs on that bounded bar
    relation (30 rows here, ≤3.7k rows for a decade of days — broadcast
    territory forever). At true scale you'd swap the span enumeration
    for the O(n) stack scan on the collected bars; the plan keeps the
    100-TB-safe part — the collapse — in the engine.
    """
    ev = load_table(spark, sf_dir, "events")
    bars = (
        ev.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("v"))
        .withColumn("i", F.row_number().over(Window.orderBy("d")))
    )
    bars = _ckpt(bars)  # shared fan-out relation
    a, b, k = bars.alias("a"), bars.alias("b"), bars.alias("k")
    spans = (
        a.join(b, F.col("b.i") >= F.col("a.i"))
        .join(
            k,
            (F.col("k.i") >= F.col("a.i")) & (F.col("k.i") <= F.col("b.i")),
        )
        .groupBy(
            F.col("a.i").alias("i"),
            F.col("b.i").alias("j"),
            F.col("a.d").alias("start_d"),
            F.col("b.d").alias("end_d"),
        )
        .agg(
            (F.max(F.col("b.i")) - F.max(F.col("a.i")) + 1).alias("width"),
            F.min(F.col("k.v")).alias("h"),
        )
    )
    best = spans.orderBy(
        F.desc(F.col("width") * F.col("h")), F.asc("i"), F.asc("j")
    ).limit(1)
    n_days = bars.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return best.crossJoin(F.broadcast(n_days)).select(
        "n_days",
        F.col("start_d").alias("best_start_date"),
        F.col("end_d").alias("best_end_date"),
        F.col("width").cast("long").alias("width_days"),
        F.col("h").cast("long").alias("min_height_cents"),
        (F.col("width") * F.col("h")).cast("long").alias("area_cents_days"),
    )


@query(
    "convex_hull_nation_profile",
    oracle="""
    WITH prof AS (
        SELECT s_nationkey AS nk,
               (100 * SUM(CAST(l_quantity AS BIGINT))) // COUNT(*) AS x,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) // COUNT(*) AS y
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        GROUP BY s_nationkey
    ), pts AS (
        SELECT x, y, MIN(nk) AS nk FROM prof GROUP BY x, y
    ), edges AS (
        SELECT p.x AS px, p.y AS py, q.x AS qx, q.y AS qy
        FROM pts p JOIN pts q ON (p.x, p.y) <> (q.x, q.y)
        JOIN pts r ON (r.x, r.y) <> (p.x, p.y) AND (r.x, r.y) <> (q.x, q.y)
        GROUP BY p.x, p.y, q.x, q.y
        HAVING MIN((q.x - p.x) * (r.y - p.y) - (q.y - p.y) * (r.x - p.x)) > 0
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pts) AS n_points,
           CAST(COUNT(*) AS BIGINT) AS hull_edges,
           CAST(COUNT(DISTINCT (px, py)) AS BIGINT) AS hull_vertices,
           CAST(SUM(px * qy - qx * py) AS BIGINT) AS shoelace_2a,
           CAST(SUM(CAST(ROUND(SQRT(CAST((qx - px) * (qx - px)
                + (qy - py) * (qy - py) AS DOUBLE))) AS BIGINT)) AS BIGINT)
               AS perimeter_rounded
    FROM edges
    """,
)
def convex_hull_nation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convex hull of the 25 nation profile points (mean line quantity
    ×100 vs mean line price in cents, both exact integer divisions):
    hull edges found by the all-points-strictly-left cross-product test,
    then the shoelace double-area and a per-edge-rounded perimeter.
    Computational geometry as relational algebra — the hull is the set
    of directed pairs whose supporting line has every other point on
    one side.

    Determinism: profile coordinates are exact BIGINT (integer sums and
    integer division, never a float mean); every cross product is exact
    integer algebra, so hull membership is bit-stable; sqrt runs on
    exact integers and is rounded per edge before the integer sum.

    Scale shape: the fact join collapses to 25 nation rows in one
    aggregation (supplier dim broadcast); the O(n³) edge test runs on
    that constant-size relation. Entity-bounded geometry after a
    fact-bounded reduction — the 100-TB cost is the scan, not the hull.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    prof = (
        li.join(
            F.broadcast(sup.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")),
            "l_suppkey",
        )
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(
            F.floor(
                (100 * F.sum(F.col("l_quantity").cast("long")))
                / F.count(F.lit(1))
            ).alias("x"),
            F.floor(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                / F.count(F.lit(1))
            ).alias("y"),
        )
    )
    pts = prof.groupBy("x", "y").agg(F.min("nk").alias("nk"))
    pts = _ckpt(pts)  # shared fan-out relation
    p, q, r = pts.alias("p"), pts.alias("q"), pts.alias("r")
    cross = (F.col("q.x") - F.col("p.x")) * (F.col("r.y") - F.col("p.y")) - (
        F.col("q.y") - F.col("p.y")
    ) * (F.col("r.x") - F.col("p.x"))
    edges = (
        p.join(
            q,
            (F.col("p.x") != F.col("q.x")) | (F.col("p.y") != F.col("q.y")),
        )
        .join(
            r,
            ((F.col("r.x") != F.col("p.x")) | (F.col("r.y") != F.col("p.y")))
            & ((F.col("r.x") != F.col("q.x")) | (F.col("r.y") != F.col("q.y"))),
        )
        .groupBy(
            F.col("p.x").alias("px"),
            F.col("p.y").alias("py"),
            F.col("q.x").alias("qx"),
            F.col("q.y").alias("qy"),
        )
        .agg(F.min(cross).alias("min_cross"))
        .where(F.col("min_cross") > 0)
    )
    n_points = pts.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    dx = F.col("qx") - F.col("px")
    dy = F.col("qy") - F.col("py")
    return (
        edges.agg(
            F.count(F.lit(1)).cast("long").alias("hull_edges"),
            F.count_distinct(F.col("px"), F.col("py"))
            .cast("long")
            .alias("hull_vertices"),
            F.sum(F.col("px") * F.col("qy") - F.col("qx") * F.col("py"))
            .cast("long")
            .alias("shoelace_2a"),
            F.sum(
                F.round(F.sqrt((dx * dx + dy * dy).cast("double"))).cast("long")
            )
            .cast("long")
            .alias("perimeter_rounded"),
        )
        .crossJoin(F.broadcast(n_points))
        .select(
            "n_points",
            "hull_edges",
            "hull_vertices",
            "shoelace_2a",
            "perimeter_rounded",
        )
    )


@query(
    "shannon_code_audit",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
        FROM documents WHERE trim(text) <> ''
    ), freq AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY token
    ), tot AS (
        SELECT SUM(n) AS big_n FROM freq
    ), coded AS (
        -- exact Shannon length: smallest L with n * 2^L >= N (no float log)
        SELECT f.n, t.big_n,
               (SELECT MIN(p.l) FROM (SELECT unnest(generate_series(0, 40)) AS l) p
                WHERE f.n * CAST(POW(2, p.l) AS BIGINT) >= t.big_n) AS len
        FROM freq f CROSS JOIN tot t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(MAX(big_n) AS BIGINT) AS total_tokens,
           CAST(MAX(len) AS BIGINT) AS max_code_len,
           CAST(ROUND(1000000.0 * SUM(CAST(POW(2, 40 - len) AS BIGINT))
                      / POW(2, 40)) AS BIGINT) AS kraft_ppm,
           CAST(ROUND(1000.0 * SUM(n * len) / MAX(big_n)) AS BIGINT)
               AS expected_len_milli_bits,
           CAST(ROUND(1000.0 * SUM(n * LOG2(CAST(big_n AS DOUBLE) / n))
                      / MAX(big_n)) AS BIGINT) AS entropy_milli_bits
    FROM coded
    """,
)
def shannon_code_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon code audit of the corpus unigram distribution: exact
    integer code lengths L_t = min{L : n_t·2^L ≥ N} (the ceil(−log₂ p)
    of Shannon coding, computed without a float log so power-of-two
    boundaries can't flip on libm ulps), the Kraft-inequality mass
    Σ2^−L as exact dyadic arithmetic, and the expected code length
    against the empirical entropy — the source-coding-theorem sandwich
    H ≤ E[L] < H+1 that bounds how compressible the token stream is.

    Determinism: lengths and Kraft mass are pure BIGINT algebra
    (the only float — the entropy reference — is rounded to milli-bits
    after an N-normalized sum).

    Scale shape: explode → partial-agg token counts (one shuffle on
    token), then a 41-row powers table broadcast against the vocab for
    the length search; everything after the count collapse is
    vocab-sized, not corpus-sized.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.where(F.trim(F.col("text")) != "")
        .select(F.explode(ws_tokens(F.lower(F.trim(F.col("text"))))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = freq.agg(F.sum("n").alias("big_n"))
    powers = (
        freq.sparkSession.range(0, 41)
        .select(
            F.col("id").alias("l"),
            F.pow(F.lit(2.0), F.col("id")).cast("long").alias("p2"),
        )
    )
    coded = (
        freq.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(powers))
        .where(F.col("n") * F.col("p2") >= F.col("big_n"))
        .groupBy("token", "n", "big_n")
        .agg(F.min("l").alias("len"))
    )
    return coded.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.max("big_n").cast("long").alias("total_tokens"),
        F.max("len").cast("long").alias("max_code_len"),
        F.round(
            1000000.0
            * F.sum(F.pow(F.lit(2.0), 40 - F.col("len")).cast("long"))
            / F.pow(F.lit(2.0), F.lit(40))
        )
        .cast("long")
        .alias("kraft_ppm"),
        F.round(1000.0 * F.sum(F.col("n") * F.col("len")) / F.max("big_n"))
        .cast("long")
        .alias("expected_len_milli_bits"),
        F.round(
            1000.0
            * F.sum(
                F.col("n")
                * F.log2(F.col("big_n").cast("double") / F.col("n"))
            )
            / F.max("big_n")
        )
        .cast("long")
        .alias("entropy_milli_bits"),
    )


@query(
    "vickrey_auction_parts",
    oracle="""
    WITH bids AS (
        SELECT l_partkey,
               CAST(ROUND(100 * l_extendedprice / l_quantity) AS BIGINT) AS bid_c,
               l_orderkey, l_linenumber
        FROM lineitem
    ), ranked AS (
        SELECT l_partkey, bid_c,
               ROW_NUMBER() OVER (
                   PARTITION BY l_partkey
                   ORDER BY bid_c DESC, l_orderkey, l_linenumber) AS rn
        FROM bids
    ), auctions AS (
        SELECT f.l_partkey, f.bid_c AS first_c, s.bid_c AS second_c
        FROM ranked f JOIN ranked s
          ON s.l_partkey = f.l_partkey AND f.rn = 1 AND s.rn = 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_auctions,
           CAST(SUM(first_c) AS BIGINT) AS fp_revenue_cents,
           CAST(SUM(second_c) AS BIGINT) AS sp_revenue_cents,
           CAST(ROUND(1000000.0 * (SUM(first_c) - SUM(second_c))
                      / SUM(first_c)) AS BIGINT) AS vickrey_discount_ppm,
           CAST(MAX(first_c - second_c) AS BIGINT) AS max_single_discount_cents,
           CAST(SUM(CASE WHEN first_c = second_c THEN 1 ELSE 0 END) AS BIGINT)
               AS tied_auctions
    FROM auctions
    """,
)
def vickrey_auction_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treat each part's lineitems as sealed unit-price bids and settle
    the market both ways: first-price (winner pays their own bid) vs
    Vickrey second-price (winner pays the runner-up's bid). Reports the
    aggregate revenue under each rule, the Vickrey discount, and the
    largest single winner's-margin — the mechanism-design counterpart
    to the winner's-curse audit already in the registry.

    Determinism: bids frozen to integer cents with a
    (bid, orderkey, linenumber) total order, so ranks 1 and 2 are
    engine-stable even under tied bids (tied auctions are counted).

    Scale shape: one shuffle on l_partkey for the per-part window
    (WindowGroupLimit-style: only ranks 1-2 survive the frame), then a
    per-part self-pairing of two rows and a scalar aggregate. No
    fact-sized joins; the auction relation is part-count sized.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bids = li.select(
        "l_partkey",
        F.round(100 * F.col("l_extendedprice") / F.col("l_quantity"))
        .cast("long")
        .alias("bid_c"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.desc("bid_c"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    ranked = bids.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 2)
    fst = ranked.where(F.col("rn") == 1).select(
        "l_partkey", F.col("bid_c").alias("first_c")
    )
    snd = ranked.where(F.col("rn") == 2).select(
        "l_partkey", F.col("bid_c").alias("second_c")
    )
    auctions = fst.join(snd, "l_partkey")
    return auctions.agg(
        F.count(F.lit(1)).cast("long").alias("n_auctions"),
        F.sum("first_c").cast("long").alias("fp_revenue_cents"),
        F.sum("second_c").cast("long").alias("sp_revenue_cents"),
        F.round(
            1000000.0
            * (F.sum("first_c") - F.sum("second_c"))
            / F.sum("first_c")
        )
        .cast("long")
        .alias("vickrey_discount_ppm"),
        F.max(F.col("first_c") - F.col("second_c"))
        .cast("long")
        .alias("max_single_discount_cents"),
        F.sum(F.when(F.col("first_c") == F.col("second_c"), 1).otherwise(0))
        .cast("long")
        .alias("tied_auctions"),
    )


@query(
    "banzhaf_region_power",
    oracle="""
    WITH w AS (
        SELECT r.r_regionkey, r.r_name,
               SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS cents
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY r.r_regionkey, r.r_name
    ), idx AS (
        SELECT r_regionkey, r_name, cents,
               ROW_NUMBER() OVER (ORDER BY r_regionkey) - 1 AS i
        FROM w
    ), tot AS (
        SELECT SUM(cents) AS t, CAST(COUNT(*) AS BIGINT) AS np FROM idx
    ), coal AS (
        SELECT unnest(generate_series(0, 31)) AS c
    ), cw AS (
        SELECT c.c, SUM(CASE WHEN (c.c // CAST(POW(2, x.i) AS BIGINT)) % 2 = 1
                             THEN x.cents ELSE 0 END) AS wsum
        FROM coal c CROSS JOIN idx x
        GROUP BY c.c
    ), swings AS (
        SELECT x.r_name, x.cents,
               CAST(SUM(CASE WHEN (c.c // CAST(POW(2, x.i) AS BIGINT)) % 2 = 1
                              AND cw.wsum >= t.t // 2 + 1
                              AND cw.wsum - x.cents < t.t // 2 + 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_swings
        FROM idx x CROSS JOIN coal c
        JOIN cw ON cw.c = c.c
        CROSS JOIN tot t
        GROUP BY x.r_name, x.cents
    ), sw_tot AS (
        SELECT SUM(n_swings) AS all_swings FROM swings
    )
    SELECT s.r_name, s.cents AS weight_cents, s.n_swings,
           CAST(ROUND(1000000.0 * s.n_swings / st.all_swings) AS BIGINT)
               AS banzhaf_ppm
    FROM swings s CROSS JOIN sw_tot st
    """,
)
def banzhaf_region_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banzhaf voting-power index of the five regions in a weighted
    majority game where each region's weight is its supplier revenue:
    enumerate all 2⁵ coalitions, count for each region the coalitions
    it swings (winning with it, losing without it), and normalize to
    the Banzhaf share. Voting power is famously NOT proportional to
    weight — this query quantifies the gap on real revenue weights.

    Determinism: weights are exact revenue cents; the majority quota
    ⌊T/2⌋+1, coalition membership (integer bit tests), and swing
    conditions are all BIGINT algebra.

    Scale shape: the fact table collapses to 5 region rows (dims
    broadcast); the coalition enumeration is a 32×5 cross join on that
    constant relation. Player-count exponentiality is capped by the
    entity schema, never by fact volume.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    w = (
        li.join(
            F.broadcast(sup.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")),
            "l_suppkey",
        )
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("s_nationkey"), "n_regionkey")),
            "s_nationkey",
        )
        .join(
            F.broadcast(reg.select(F.col("r_regionkey").alias("n_regionkey"), "r_name")),
            "n_regionkey",
        )
        .groupBy(F.col("n_regionkey").alias("r_regionkey"), "r_name")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cents")
        )
    )
    idx = w.withColumn(
        "i", F.row_number().over(Window.orderBy("r_regionkey")) - 1
    )
    tot = idx.agg(
        F.sum("cents").alias("t"), F.count(F.lit(1)).cast("long").alias("np")
    )
    coal = idx.sparkSession.range(0, 32).select(F.col("id").alias("c"))
    member = (
        F.col("c") / F.pow(F.lit(2.0), F.col("i")).cast("long")
    ).cast("long") % 2 == 1
    # coalition weights
    cw = (
        coal.crossJoin(F.broadcast(idx))
        .groupBy("c")
        .agg(
            F.sum(F.when(member, F.col("cents")).otherwise(0)).alias("wsum")
        )
    )
    quota = F.floor(F.col("t") / 2) + 1
    swings = (
        idx.crossJoin(F.broadcast(coal))
        .join(F.broadcast(cw), "c")
        .crossJoin(F.broadcast(tot))
        .groupBy("r_name", "cents")
        .agg(
            F.sum(
                F.when(
                    member
                    & (F.col("wsum") >= quota)
                    & (F.col("wsum") - F.col("cents") < quota),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_swings")
        )
    )
    swings = _ckpt(swings)  # shared fan-out relation
    sw_tot = swings.agg(F.sum("n_swings").alias("all_swings"))
    return swings.crossJoin(F.broadcast(sw_tot)).select(
        "r_name",
        F.col("cents").alias("weight_cents"),
        "n_swings",
        F.round(1000000.0 * F.col("n_swings") / F.col("all_swings"))
        .cast("long")
        .alias("banzhaf_ppm"),
    )


@query(
    "holm_bonferroni_stepdown",
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
    ), adj AS (
        SELECT n_name, n, k, p_value, rnk, m,
               ROUND(LEAST(1.0, MAX((m - rnk + 1) * p_value) OVER (
                   ORDER BY rnk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
                   AS holm_adj_p
        FROM ranked
    )
    SELECT n_name, n, k, p_value, rnk, holm_adj_p,
           CAST(CASE WHEN holm_adj_p <= 0.05 THEN 1 ELSE 0 END AS BIGINT)
               AS rejected_holm,
           CAST(CASE WHEN p_value * m <= 0.05 THEN 1 ELSE 0 END AS BIGINT)
               AS rejected_bonferroni
    FROM adj
    """,
)
def holm_bonferroni_stepdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm step-down multiple-testing correction over the same
    25-nation urgent-rate z-test family as `bh_fdr_nation_urgent`:
    sort p-values ascending, scale the i-th smallest by (m−i+1), take
    the running max (enforcing monotone adjusted p), clamp at 1, and
    reject at α=0.05. Strictly more powerful than plain Bonferroni
    (also reported) while controlling the same family-wise error rate
    — the FWER counterpart to the registry's FDR query.

    Determinism: p-values use the shared Abramowitz-Stegun erfc
    polynomial rounded to 6 decimals on both engines before the
    step-down, so the sort order and running max are stable; the
    adjustment arithmetic is then fixed-order on those frozen values.

    Scale shape: facts collapse to 25 nation rows in one aggregation;
    the step-down is a single window over that entity-sized relation.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per = (
        orders.join(
            F.broadcast(customer.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")),
            "o_custkey",
        )
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
        per.join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("c_nationkey"), "n_name")),
            "c_nationkey",
        )
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "zval",
            (
                F.col("k").cast("double") / F.col("n")
                - (F.col("kk") - F.col("k")).cast("double")
                / (F.col("nn") - F.col("n"))
            )
            / F.sqrt(
                (F.col("kk").cast("double") / F.col("nn"))
                * (1 - F.col("kk").cast("double") / F.col("nn"))
                * (1.0 / F.col("n") + 1.0 / (F.col("nn") - F.col("n")))
            ),
        )
    )
    tq = F.abs(F.col("zval")) / F.sqrt(F.lit(2.0))
    tpoly = 1 / (1 + 0.3275911 * tq)
    erfc = (
        tpoly
        * (
            0.254829592
            + tpoly
            * (
                -0.284496736
                + tpoly
                * (1.421413741 + tpoly * (-1.453152027 + tpoly * 1.061405417))
            )
        )
    ) * F.exp(-tq * tq)
    pv = z.withColumn("p_value", F.round(erfc, 6))
    ranked = pv.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy("p_value", "n_name")).cast("long"),
    )
    wcum = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0)
    adj = ranked.withColumn(
        "holm_adj_p",
        F.round(
            F.least(
                F.lit(1.0),
                F.max((F.col("m") - F.col("rnk") + 1) * F.col("p_value")).over(
                    wcum
                ),
            ),
            6,
        ),
    )
    return adj.select(
        "n_name",
        "n",
        "k",
        "p_value",
        "rnk",
        "holm_adj_p",
        F.when(F.col("holm_adj_p") <= 0.05, 1)
        .otherwise(0)
        .cast("long")
        .alias("rejected_holm"),
        F.when(F.col("p_value") * F.col("m") <= 0.05, 1)
        .otherwise(0)
        .cast("long")
        .alias("rejected_bonferroni"),
    )


def _hilbert_lut_16():
    """(x, y, zd, hd) for the 16x16 grid: z-order (Morton) and Hilbert
    indexes. Data-independent O(1) driver-side table — the space-filling
    curve LUT a layout engine ships as a tiny dimension, generated from
    the canonical xy2d recurrence (bijectivity and unit-step property
    are pinned by tests)."""

    def rot(s, x, y, rx, ry):
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        return x, y

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            x, y = rot(s, x, y, rx, ry)
            s //= 2
        return d

    def morton(x, y):
        z = 0
        for b in range(4):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    return [
        (x, y, morton(x, y), xy2d(16, x, y))
        for x in range(16)
        for y in range(16)
    ]


_HILBERT_VALUES_SQL = ", ".join(
    f"({x}, {y}, {z}, {h})" for x, y, z, h in _hilbert_lut_16()
)


@query(
    "hilbert_vs_zorder_locality",
    oracle=f"""
    WITH lut(x, y, zd, hd) AS (
        VALUES {_HILBERT_VALUES_SQL}
    ),
    occupied AS (
        SELECT DISTINCT c_custkey % 16 AS x, (c_custkey // 16) % 16 AS y
        FROM customer
    ), cells AS (
        SELECT l.x, l.y, l.zd, l.hd
        FROM occupied o JOIN lut l ON l.x = o.x AND l.y = o.y
    ), zsteps AS (
        SELECT ABS(x - LAG(x) OVER (ORDER BY zd))
             + ABS(y - LAG(y) OVER (ORDER BY zd)) AS step
        FROM cells
    ), hsteps AS (
        SELECT ABS(x - LAG(x) OVER (ORDER BY hd))
             + ABS(y - LAG(y) OVER (ORDER BY hd)) AS step
        FROM cells
    ), rect AS (
        SELECT zd, hd FROM cells
        WHERE x BETWEEN 3 AND 6 AND y BETWEEN 5 AND 8
    ), zruns AS (
        SELECT CAST(1 + SUM(CASE WHEN zd - pz > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS runs
        FROM (SELECT zd, LAG(zd) OVER (ORDER BY zd) AS pz FROM rect)
        WHERE pz IS NOT NULL
    ), hruns AS (
        SELECT CAST(1 + SUM(CASE WHEN hd - ph > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS runs
        FROM (SELECT hd, LAG(hd) OVER (ORDER BY hd) AS ph FROM rect)
        WHERE ph IS NOT NULL
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cells) AS n_cells,
           (SELECT CAST(SUM(step) AS BIGINT) FROM zsteps) AS z_total_manhattan,
           (SELECT CAST(SUM(step) AS BIGINT) FROM hsteps) AS h_total_manhattan,
           (SELECT CAST(MAX(step) AS BIGINT) FROM zsteps) AS z_max_step,
           (SELECT CAST(MAX(step) AS BIGINT) FROM hsteps) AS h_max_step,
           (SELECT runs FROM zruns) AS z_rect_runs,
           (SELECT runs FROM hruns) AS h_rect_runs
    """,
)
def hilbert_vs_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Space-filling-curve layout audit: map customers onto a 16×16
    grid, then compare Z-order (Morton) against the Hilbert curve on
    the two properties that matter for clustered storage — walk
    locality (total/max Manhattan distance between index-consecutive
    occupied cells; Hilbert's defining property is every step = 1) and
    range-query fragmentation (how many contiguous index runs cover a
    4×4 query rectangle — fewer runs = fewer scan ranges). The
    quantified "why" behind choosing Hilbert over Z for the registry's
    `zorder_layout_orders`-style clustering at 100 TB.

    Determinism: both curve indexes come from one shared integer LUT
    (generated by the canonical xy2d recurrence, embedded identically
    in both engines); all metrics are exact integer arithmetic.

    Scale shape: the only fact-sized work is the distinct-cell
    projection (partial-agg collapses to ≤256 rows before the
    shuffle); every window runs on the constant 256-cell relation
    against a broadcast LUT.
    """
    cust = load_table(spark, sf_dir, "customer")
    lut = spark.createDataFrame(_hilbert_lut_16(), ["x", "y", "zd", "hd"])
    occupied = cust.select(
        (F.col("c_custkey") % 16).alias("x"),
        ((F.col("c_custkey") / 16).cast("long") % 16).alias("y"),
    ).distinct()
    cells = occupied.join(F.broadcast(lut), ["x", "y"])
    # ≤256-row occupied-cell relation fans out to both step walks, the
    # rectangle runs, and the cell count — without materialization each
    # consumer re-runs the fact-sized distinct (census: customer ×5)
    cells = _ckpt(cells)
    zw = Window.orderBy("zd")
    hw = Window.orderBy("hd")
    zsteps = cells.select(
        (
            F.abs(F.col("x") - F.lag("x").over(zw))
            + F.abs(F.col("y") - F.lag("y").over(zw))
        ).alias("step")
    )
    hsteps = cells.select(
        (
            F.abs(F.col("x") - F.lag("x").over(hw))
            + F.abs(F.col("y") - F.lag("y").over(hw))
        ).alias("step")
    )
    rect = cells.where(
        F.col("x").between(3, 6) & F.col("y").between(5, 8)
    )
    zruns = rect.select(
        F.col("zd"), F.lag("zd").over(Window.orderBy("zd")).alias("pz")
    ).where(F.col("pz").isNotNull()).agg(
        (1 + F.sum(F.when(F.col("zd") - F.col("pz") > 1, 1).otherwise(0)))
        .cast("long")
        .alias("z_rect_runs")
    )
    hruns = rect.select(
        F.col("hd"), F.lag("hd").over(Window.orderBy("hd")).alias("ph")
    ).where(F.col("ph").isNotNull()).agg(
        (1 + F.sum(F.when(F.col("hd") - F.col("ph") > 1, 1).otherwise(0)))
        .cast("long")
        .alias("h_rect_runs")
    )
    zagg = zsteps.agg(
        F.sum("step").cast("long").alias("z_total_manhattan"),
        F.max("step").cast("long").alias("z_max_step"),
    )
    hagg = hsteps.agg(
        F.sum("step").cast("long").alias("h_total_manhattan"),
        F.max("step").cast("long").alias("h_max_step"),
    )
    ncells = cells.agg(F.count(F.lit(1)).cast("long").alias("n_cells"))
    return (
        ncells.crossJoin(F.broadcast(zagg))
        .crossJoin(F.broadcast(hagg))
        .crossJoin(F.broadcast(zruns))
        .crossJoin(F.broadcast(hruns))
        .select(
            "n_cells",
            "z_total_manhattan",
            "h_total_manhattan",
            "z_max_step",
            "h_max_step",
            "z_rect_runs",
            "h_rect_runs",
        )
    )


@query(
    "frequent_triples_parts",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), sized AS (
        SELECT l_orderkey FROM items
        GROUP BY l_orderkey HAVING COUNT(*) BETWEEN 3 AND 10
    ), basket AS (
        SELECT i.l_orderkey, i.l_partkey
        FROM items i JOIN sized s ON s.l_orderkey = i.l_orderkey
    ), triples AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2, c.l_partkey AS p3,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM basket a
        JOIN basket b ON b.l_orderkey = a.l_orderkey
                     AND b.l_partkey > a.l_partkey
        JOIN basket c ON c.l_orderkey = b.l_orderkey
                     AND c.l_partkey > b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey, c.l_partkey
    )
    SELECT CAST((SELECT COUNT(*) FROM sized) AS BIGINT) AS n_baskets,
           CAST(COUNT(*) AS BIGINT) AS n_triples,
           CAST(MAX(support) AS BIGINT) AS max_support,
           CAST(SUM(CASE WHEN support >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS triples_support_ge2,
           CAST(SUM(support) AS BIGINT) AS total_triple_occurrences
    FROM triples
    """,
)
def frequent_triples_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-3 frequent-itemset census over order baskets: enumerate all
    part triples co-purchased in one order (p1<p2<p3 canonical order)
    and summarize the support distribution — the Apriori candidate-
    generation step one size up from the registry's
    `market_basket_pairs`/`association_rules_parts`.

    Determinism: all counts are exact integers over canonically
    ordered triples.

    Scale shape: the basket-size cap (3..10 items after per-order
    dedup) bounds the per-basket blowup at C(10,3)=120 triples — the
    guard that keeps a 100-TB basket table sub-quadratic even when a
    mega-order appears (the same stop-shingle discipline as the
    n-gram dedup cap). Both self-joins are co-partitioned on
    l_orderkey, so the whole enumeration is one shuffle of the
    deduped (order, part) relation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # round 9: basket census — ONE fact exchange (groupBy l_orderkey +
    # collect_set) replaces the (order, part)-distinct exchange, the
    # basket-size semi-join AND both triple self-joins; the sorted
    # in-row triple enumeration keeps the same C(10,3)=120 cap and the
    # same canonical p1<p2<p3 order. The tracked basket relation is
    # cardinality-reduced and consumed twice (triples + n_baskets).
    from pyspark_movie_recommender_spark.operators.cache import track

    baskets = track(
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .where(F.size("ps").between(3, 10))
    )
    triples = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(flatten(transform(ps, (x, i) ->"
                    " transform(slice(ps, i + 2, size(ps)), (y, j) ->"
                    " transform(slice(ps, i + j + 3, size(ps)),"
                    " z -> struct(x AS p1, y AS p2, z AS p3))))))"
                )
            ).alias("t")
        )
        .groupBy(
            F.col("t.p1").alias("p1"),
            F.col("t.p2").alias("p2"),
            F.col("t.p3").alias("p3"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    n_baskets = baskets.agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
    return triples.agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        F.max("support").cast("long").alias("max_support"),
        F.sum(F.when(F.col("support") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("triples_support_ge2"),
        F.sum("support").cast("long").alias("total_triple_occurrences"),
    ).crossJoin(F.broadcast(n_baskets)).select(
        "n_baskets",
        "n_triples",
        "max_support",
        "triples_support_ge2",
        "total_triple_occurrences",
    )


@query(
    "anderson_darling_two_sample",
    oracle="""
    WITH pooled AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a,
               o_orderkey
        FROM orders
    ), sized AS (
        SELECT CAST(SUM(is_a) AS BIGINT) AS n,
               CAST(COUNT(*) - SUM(is_a) AS BIGINT) AS m,
               CAST(COUNT(*) AS BIGINT) AS nn
        FROM pooled
    ), ranked AS (
        SELECT is_a,
               CAST(ROW_NUMBER() OVER (ORDER BY v, is_a, o_orderkey) AS BIGINT)
                   AS i,
               CAST(SUM(is_a) OVER (ORDER BY v, is_a, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS mi
        FROM pooled
    ), terms AS (
        SELECT POW(CAST(r.mi * s.nn - s.n * r.i AS DOUBLE), 2)
               / (CAST(r.i AS DOUBLE) * (s.nn - r.i)) AS term,
               s.n, s.m, s.nn
        FROM ranked r CROSS JOIN sized s
        WHERE r.i < s.nn
    )
    SELECT MAX(n) AS n_urgent, MAX(m) AS n_other,
           CAST(ROUND(1000.0 * SUM(term) / (MAX(n) * MAX(m))) AS BIGINT)
               AS a2_milli,
           CAST(CASE WHEN SUM(term) / (MAX(n) * MAX(m)) > 2.492
                     THEN 1 ELSE 0 END AS BIGINT) AS reject_05
    FROM terms
    """,
)
def anderson_darling_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling statistic comparing the order-value
    distribution of URGENT orders against all others:
    A² = (1/nm)·Σᵢ (Mᵢ·N − n·i)²/(i·(N−i)) over the pooled order
    statistics, where Mᵢ counts urgent observations among the i
    smallest. Weighting by 1/(i(N−i)) makes it TAIL-sensitive where
    the registry's KS (sup-gap) and Cramér-von-Mises (L2-gap) tests
    are body-sensitive — the third member of the drift-test family.
    Rejection flag uses the asymptotic 5% critical value 2.492
    (documented approximation, untied case).

    Determinism: pooled order is total (value cents, group, orderkey),
    so the Mᵢ path is engine-stable; each term squares an
    exactly-representable integer in DOUBLE (overflow-safe at 100×
    this scale) and the final sum is rounded to milli.

    Scale shape: the global rank i and the running urgent-count Mᵢ
    both come from ONE pass of
    ``operators/rank.py:distributed_order_stats`` — range-bucket on
    v, per-bucket partitioned windows, broadcast prefix offsets for
    the rank AND for the running sum — so no task ever sorts more
    than one bucket (a bare ``Window.orderBy`` would single-task all
    orders); everything else is a scalar aggregate.
    """
    from pyspark_movie_recommender_spark.operators.rank import (
        distributed_order_stats,
    )

    orders = load_table(spark, sf_dir, "orders")
    pooled = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("is_a"),
        "o_orderkey",
    )
    sized = pooled.agg(
        F.sum("is_a").cast("long").alias("n"),
        (F.count(F.lit(1)) - F.sum("is_a")).cast("long").alias("m"),
        F.count(F.lit(1)).cast("long").alias("nn"),
    )
    ranked = distributed_order_stats(
        pooled,
        "v",
        ["is_a", "o_orderkey"],
        rank_col="i",
        cumsum_cols={"mi": "is_a"},
    ).select("is_a", "i", F.col("mi").cast("long").alias("mi"))
    terms = (
        ranked.crossJoin(F.broadcast(sized))
        .where(F.col("i") < F.col("nn"))
        .select(
            (
                F.pow(
                    (F.col("mi") * F.col("nn") - F.col("n") * F.col("i")).cast(
                        "double"
                    ),
                    F.lit(2.0),
                )
                / (F.col("i").cast("double") * (F.col("nn") - F.col("i")))
            ).alias("term"),
            "n",
            "m",
        )
    )
    return terms.agg(
        F.max("n").alias("n_urgent"),
        F.max("m").alias("n_other"),
        F.round(1000.0 * F.sum("term") / (F.max("n") * F.max("m")))
        .cast("long")
        .alias("a2_milli"),
        F.when(F.sum("term") / (F.max("n") * F.max("m")) > 2.492, 1)
        .otherwise(0)
        .cast("long")
        .alias("reject_05"),
    )


@query(
    "lepage_location_scale_test",
    oracle="""
    WITH pooled AS (
        SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_a
        FROM lineitem
    ), sized AS (
        SELECT CAST(SUM(is_a) AS BIGINT) AS n,
               CAST(COUNT(*) - SUM(is_a) AS BIGINT) AS m,
               CAST(COUNT(*) AS BIGINT) AS nn
        FROM pooled
    ), ranked AS (
        SELECT is_a,
               RANK() OVER (ORDER BY v)
               + (COUNT(*) OVER (PARTITION BY v) - 1) / 2.0 AS midrank
        FROM pooled
    ), scored AS (
        SELECT r.is_a, r.midrank,
               LEAST(r.midrank, s.nn + 1 - r.midrank) AS ab_score,
               s.n, s.m, s.nn
        FROM ranked r CROSS JOIN sized s
    ), sums AS (
        SELECT MAX(n) AS n, MAX(m) AS m, MAX(nn) AS nn,
               SUM(CASE WHEN is_a = 1 THEN midrank ELSE 0 END) AS w,
               SUM(CASE WHEN is_a = 1 THEN ab_score ELSE 0 END) AS t
        FROM scored
    ), stats AS (
        SELECT n, m, nn, w, t,
               n * (nn + 1) / 2.0 AS ew,
               n * CAST(m AS DOUBLE) * (nn + 1) / 12.0 AS vw,
               CASE WHEN nn % 2 = 0 THEN n * (nn + 2) / 4.0
                    ELSE n * CAST(nn + 1 AS DOUBLE) * (nn + 1) / (4.0 * nn)
               END AS et,
               CASE WHEN nn % 2 = 0
                    THEN n * CAST(m AS DOUBLE) * (nn + 2) * (nn - 2)
                         / (48.0 * (nn - 1))
                    ELSE n * CAST(m AS DOUBLE) * (nn + 1)
                         * (3 + CAST(nn AS DOUBLE) * nn) / (48.0 * nn * nn)
               END AS vt
        FROM sums
    )
    SELECT n AS n_returned, m AS n_other,
           CAST(ROUND(1000.0 * (w - ew) / SQRT(vw)) AS BIGINT)
               AS wilcoxon_z_milli,
           CAST(ROUND(1000.0 * (t - et) / SQRT(vt)) AS BIGINT)
               AS ansari_z_milli,
           CAST(ROUND(1000.0 * (POW((w - ew) / SQRT(vw), 2)
                                + POW((t - et) / SQRT(vt), 2))) AS BIGINT)
               AS lepage_l_milli,
           CAST(CASE WHEN POW((w - ew) / SQRT(vw), 2)
                          + POW((t - et) / SQRT(vt), 2) > 5.991
                     THEN 1 ELSE 0 END AS BIGINT) AS reject_05
    FROM stats
    """,
)
def lepage_location_scale_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lepage joint location-scale test on returned vs kept lineitem
    prices: the Wilcoxon rank-sum z (location shift) and the
    Ansari-Bradley z (scale shift — ranks folded from both ends,
    min(r, N+1−r)) combined into L = z_W² + z_AB² ~ χ²₂. Detects
    distributions that drift in spread without moving the median —
    invisible to Wilcoxon alone. Moments use the standard untied-case
    formulas (documented approximation; ties handled by midranks).

    Determinism: midranks depend only on the value (count below + half
    the peer count), never on tie order, so both engines score ties
    identically; doubled midranks (mid2 = 2·cnt_less + cnt_eq + 1) keep
    every rank-sum intermediate an exact BIGINT; the one inexact step
    (z standardization) is rounded to milli.

    Scale shape: the histogram-midrank collapse
    (kruskal_wallis_quantity's construction) — ranks are never assigned
    to rows. One hash agg to the (value, flag) histogram, a cumulative
    count over the aggregate-reduced |distinct values| relation, and the
    Ansari fold min(mid, N+1−mid) applied per VALUE (all rows sharing a
    value share a midrank, so the fold commutes with the collapse).
    Nothing row-ordered ever shuffles.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pooled = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_a"),
    )
    hist = pooled.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("cv"),
        F.sum("is_a").cast("long").alias("ca"),
    )
    sized = hist.agg(
        F.sum("ca").cast("long").alias("n"),
        (F.sum("cv") - F.sum("ca")).cast("long").alias("m"),
        F.sum("cv").cast("long").alias("nn"),
    )
    wv = Window.orderBy("v")
    mids = hist.select(
        "v",
        "cv",
        "ca",
        (
            2 * (F.sum("cv").over(wv).cast("long") - F.col("cv"))
            + F.col("cv")
            + 1
        ).alias("mid2"),
    )
    scored = mids.crossJoin(F.broadcast(sized)).select(
        "ca",
        "mid2",
        F.least(
            F.col("mid2"), 2 * (F.col("nn") + 1) - F.col("mid2")
        ).alias("ab2"),
        "n",
        "m",
        "nn",
    )
    sums = scored.agg(
        F.max("n").alias("n"),
        F.max("m").alias("m"),
        F.max("nn").alias("nn"),
        (F.sum(F.col("ca") * F.col("mid2")) / 2.0).alias("w"),
        (F.sum(F.col("ca") * F.col("ab2")) / 2.0).alias("t"),
    )
    nD = F.col("n").cast("double")
    mD = F.col("m").cast("double")
    nnD = F.col("nn").cast("double")
    ew = F.col("n") * (F.col("nn") + 1) / 2.0
    vw = nD * mD * (F.col("nn") + 1) / 12.0
    et = F.when(
        F.col("nn") % 2 == 0, F.col("n") * (F.col("nn") + 2) / 4.0
    ).otherwise(nD * (nnD + 1) * (F.col("nn") + 1) / (4.0 * F.col("nn")))
    vt = F.when(
        F.col("nn") % 2 == 0,
        nD * mD * (F.col("nn") + 2) * (F.col("nn") - 2)
        / (48.0 * (F.col("nn") - 1)),
    ).otherwise(
        nD * mD * (F.col("nn") + 1) * (3 + nnD * F.col("nn"))
        / (48.0 * F.col("nn") * F.col("nn"))
    )
    zw = (F.col("w") - ew) / F.sqrt(vw)
    zt = (F.col("t") - et) / F.sqrt(vt)
    lep = F.pow(zw, F.lit(2.0)) + F.pow(zt, F.lit(2.0))
    return sums.select(
        F.col("n").alias("n_returned"),
        F.col("m").alias("n_other"),
        F.round(1000.0 * zw).cast("long").alias("wilcoxon_z_milli"),
        F.round(1000.0 * zt).cast("long").alias("ansari_z_milli"),
        F.round(1000.0 * lep).cast("long").alias("lepage_l_milli"),
        F.when(lep > 5.991, 1).otherwise(0).cast("long").alias("reject_05"),
    )
