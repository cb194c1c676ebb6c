"""Query registry part 11 of 12 — registration order preserved.

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
from pyspark_movie_recommender_spark.driver_scalar import bounded_collect, scalar_row
from pyspark_movie_recommender_spark.queries import query
from pyspark_movie_recommender_spark.sources import load_table

from pyspark_movie_recommender_spark.queries.registry_10 import _phi_sql  # noqa: E501

@query("ktruss_copurchase_certified")
def ktruss_copurchase_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-truss of the part co-purchase graph (parts co-occurring in
    >= 2 orders): edges are iteratively PEELED while their triangle
    support inside the surviving subgraph is below k-2 = 1, the
    strongest cohesion filter below cliques — denser than
    `kcore_copurchase` (degree-based) because support counts
    TRIANGLES (`triangle_count_copurchase` is its global census).
    SELF-CERTIFYING: the returned support column is RECOMPUTED
    DECLARATIVELY on the final edge set (triangle join), so every
    surviving edge exhibits support >= 1 in-row; the peeling loop's
    fixpoint is thereby checkable without trusting the loop.

    Determinism: integer co-occurrence threshold; peeling deletes
    ALL under-supported edges each round (order-free, the parallel
    peeling used at scale).

    Scale shape: support = one triangle join per round (two
    self-joins of the shrinking edge list, ids-only); rounds are
    driver-coordinated with ckpt lineage truncation like
    `connected_components`; the certificate is one more triangle
    join on the final edges.
    """
    l = load_table(spark, sf_dir, "lineitem")
    pairs = (
        l.select("l_orderkey", "l_partkey")
        .distinct()
        .alias("x")
        .join(
            l.select("l_orderkey", "l_partkey").distinct().alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("u"), F.col("y.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
        .transform(_ckpt)
    )

    def support(edges: DataFrame) -> DataFrame:
        e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
        e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
        e3 = edges.select(F.col("u").alias("a"), F.col("v").alias("c"))
        tri = (
            e1.join(e2, "b")
            .join(e3, ["a", "c"])
            .select("a", "b", "c")
        )
        sup_ab = tri.groupBy(
            F.col("a").alias("u"), F.col("b").alias("v")
        ).agg(F.count(F.lit(1)).alias("s"))
        sup_bc = tri.groupBy(
            F.col("b").alias("u"), F.col("c").alias("v")
        ).agg(F.count(F.lit(1)).alias("s"))
        sup_ac = tri.groupBy(
            F.col("a").alias("u"), F.col("c").alias("v")
        ).agg(F.count(F.lit(1)).alias("s"))
        return (
            sup_ab.unionByName(sup_bc)
            .unionByName(sup_ac)
            .groupBy("u", "v")
            .agg(F.sum("s").cast("long").alias("support"))
        )

    edges = pairs
    for _ in range(15):
        sup = support(edges)
        keep = edges.join(sup, ["u", "v"], "left").filter(
            F.coalesce("support", F.lit(0)) >= 1
        )
        n_before = edges.count()
        keep = keep.select("u", "v").transform(_ckpt)
        n_after = keep.count()
        edges = keep
        if n_after == n_before or n_after == 0:
            break
    final_sup = support(edges)
    return (
        edges.join(final_sup, ["u", "v"])
        .select(
            F.col("u").cast("long").alias("part_a"),
            F.col("v").cast("long").alias("part_b"),
            F.col("support").alias("triangle_support"),
        )
    )


@query(
    "bayes_prob_superiority",
    oracle="""
    WITH counts AS (
        SELECT c.c_mktsegment AS seg,
               CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
                        THEN 1 ELSE 0 END) AS BIGINT) AS k,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
        GROUP BY 1
    ), ab AS (
        SELECT
            (SELECT k + 1 FROM counts WHERE seg = 'AUTOMOBILE') AS a1,
            (SELECT n - k + 1 FROM counts WHERE seg = 'AUTOMOBILE') AS b1,
            (SELECT k + 1 FROM counts WHERE seg = 'BUILDING') AS a2,
            (SELECT n - k + 1 FROM counts WHERE seg = 'BUILDING') AS b2
    ), mx AS (
        SELECT CAST(a1 + b1 + a2 + b2 AS INT) AS top FROM ab
    ), lf AS (
        SELECT CAST(g.i AS BIGINT) AS i,
               SUM(LN(g.i)) OVER (ORDER BY g.i) AS lnf
        FROM (SELECT unnest(generate_series(1,
                  (SELECT top FROM mx))) AS i) g
    ), lnfact AS (
        SELECT i, lnf FROM lf UNION ALL SELECT 0, 0.0
    ), terms AS (
        -- P(p1 > p2) = sum_{i=0}^{a1-1} B(a2+i, b1+b2)
        --              / ((b1+i) B(1+i, b1) B(a2, b2))
        -- with all parameters integers: every Beta is a
        -- factorial ratio evaluated by log-factorial lookups
        SELECT h.i,
               EXP(
                   (l1.lnf + l2.lnf - l3.lnf)      -- ln B(a2+i, b1+b2)
                   - LN(ab.b1 + h.i)
                   - (l4.lnf + l5.lnf - l6.lnf)    -- ln B(1+i, b1)
                   - (l7.lnf + l8.lnf - l9.lnf)    -- ln B(a2, b2)
               ) AS t
        FROM ab, mx,
             LATERAL (SELECT unnest(generate_series(0,
                 (SELECT CAST(a1 - 1 AS INT) FROM ab))) AS i) h
        JOIN lnfact l1 ON l1.i = ab.a2 + h.i - 1
        JOIN lnfact l2 ON l2.i = ab.b1 + ab.b2 - 1
        JOIN lnfact l3 ON l3.i = ab.a2 + h.i + ab.b1 + ab.b2 - 1
        JOIN lnfact l4 ON l4.i = h.i
        JOIN lnfact l5 ON l5.i = ab.b1 - 1
        JOIN lnfact l6 ON l6.i = h.i + ab.b1
        JOIN lnfact l7 ON l7.i = ab.a2 - 1
        JOIN lnfact l8 ON l8.i = ab.b2 - 1
        JOIN lnfact l9 ON l9.i = ab.a2 + ab.b2 - 1
    )
    SELECT ab.a1 - 1 AS k_auto,
           ab.a1 + ab.b1 - 2 AS n_auto,
           ab.a2 - 1 AS k_build,
           ab.a2 + ab.b2 - 2 AS n_build,
           CAST(ROUND(1000000 * (SELECT SUM(t) FROM terms)) AS BIGINT)
               AS p_auto_gt_build_ppm
    FROM ab
    """,
)
def bayes_prob_superiority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Bayesian probability of superiority between two urgent-
    order rates (AUTOMOBILE vs BUILDING segments, uniform priors):
    P(p1 > p2) for independent Beta posteriors evaluated by the
    closed-form finite sum sum_i B(a2+i, b1+b2) / ((b1+i) B(1+i, b1)
    B(a2, b2)) — every Beta function a FACTORIAL ratio (integer
    parameters), computed with log-factorial lookups. The exact
    answer the normal approximations in `two_proportion_ztest` and
    `bayes_factor_urgent_rates` approach; unlike a p-value this is
    the directly actionable posterior statement.

    Determinism: integer posterior parameters from exact counts; a
    shared log-factorial prefix-sum table; term sums accumulate in i
    order on both engines; one ppm rounding.

    Scale shape: one 2-group agg over the fact join, then an
    O(k_auto)-term ladder over the lnfact table — closed-form
    inference whose cost is independent of n beyond the first agg.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    counts = (
        o.join(
            F.broadcast(
                c.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
            ),
            "o_custkey",
        )
        .filter(F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            )
            .cast("long")
            .alias("k"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    ab = (
        counts.groupBy()
        .pivot("seg", ["AUTOMOBILE", "BUILDING"])
        .agg(F.first("k").alias("k"), F.first("n").alias("n"))
        .select(
            (F.col("AUTOMOBILE_k") + 1).alias("a1"),
            (F.col("AUTOMOBILE_n") - F.col("AUTOMOBILE_k") + 1).alias("b1"),
            (F.col("BUILDING_k") + 1).alias("a2"),
            (F.col("BUILDING_n") - F.col("BUILDING_k") + 1).alias("b2"),
        )
    )
    ab = _ckpt(ab)  # shared fan-out relation
    top = ab.select(
        (F.col("a1") + F.col("b1") + F.col("a2") + F.col("b2")).alias("top")
    )
    lf = top.select(
        F.explode(F.sequence(F.lit(1), F.col("top"))).alias("i")
    ).select(
        F.col("i").cast("long").alias("i"),
        F.sum(F.log("i")).over(Window.orderBy("i")).alias("lnf"),
    )
    lnfact = lf.unionByName(
        top.select(F.lit(0).cast("long").alias("i"), F.lit(0.0).alias("lnf"))
    )
    hs = ab.select(
        F.explode(F.sequence(F.lit(0), F.col("a1") - 1)).alias("i"),
        "a1",
        "b1",
        "a2",
        "b2",
    )

    def lj(alias_, expr_):
        return lnfact.select(
            F.col("i").alias(f"{alias_}_i"), F.col("lnf").alias(alias_)
        ), expr_

    j1, e1 = lj("l1", F.col("a2") + F.col("i") - 1)
    j2, e2 = lj("l2", F.col("b1") + F.col("b2") - 1)
    j3, e3 = lj(
        "l3", F.col("a2") + F.col("i") + F.col("b1") + F.col("b2") - 1
    )
    j4, e4 = lj("l4", F.col("i"))
    j5, e5 = lj("l5", F.col("b1") - 1)
    j6, e6 = lj("l6", F.col("i") + F.col("b1"))
    j7, e7 = lj("l7", F.col("a2") - 1)
    j8, e8 = lj("l8", F.col("b2") - 1)
    j9, e9 = lj("l9", F.col("a2") + F.col("b2") - 1)
    terms = hs
    for (jdf, expr_), nm in [
        ((j1, e1), "l1"),
        ((j2, e2), "l2"),
        ((j3, e3), "l3"),
        ((j4, e4), "l4"),
        ((j5, e5), "l5"),
        ((j6, e6), "l6"),
        ((j7, e7), "l7"),
        ((j8, e8), "l8"),
        ((j9, e9), "l9"),
    ]:
        terms = terms.join(
            F.broadcast(jdf), expr_ == F.col(f"{nm}_i")
        )
    t = F.exp(
        (F.col("l1") + F.col("l2") - F.col("l3"))
        - F.log(F.col("b1") + F.col("i"))
        - (F.col("l4") + F.col("l5") - F.col("l6"))
        - (F.col("l7") + F.col("l8") - F.col("l9"))
    )
    psum = terms.select(t.alias("t"), "a1", "b1", "a2", "b2").agg(
        F.sum("t").alias("p"),
        F.first("a1").alias("a1"),
        F.first("b1").alias("b1"),
        F.first("a2").alias("a2"),
        F.first("b2").alias("b2"),
    )
    return psum.select(
        (F.col("a1") - 1).alias("k_auto"),
        (F.col("a1") + F.col("b1") - 2).alias("n_auto"),
        (F.col("a2") - 1).alias("k_build"),
        (F.col("a2") + F.col("b2") - 2).alias("n_build"),
        F.round(1000000 * F.col("p")).cast("long").alias(
            "p_auto_gt_build_ppm"
        ),
    )


@query(
    "beta_binomial_mom_fit",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                        THEN 1 ELSE 0 END) AS BIGINT) AS k,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1
    ), eligible AS (
        SELECT k, n, k * 1.0 / n AS p FROM per_cust WHERE n >= 5
    ), mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
               SUM(p) / COUNT(*) AS m1,
               SUM(p * p) / COUNT(*) AS m2,
               SUM(n) * 1.0 / COUNT(*) AS nbar
        FROM eligible
    ), fit AS (
        -- MoM for beta-binomial with common n ~ nbar:
        -- rho = (s2 - m1(1-m1)/nbar) / (m1(1-m1)(1 - 1/nbar));
        -- alpha+beta = (1-rho)/rho
        SELECT m, m1, nbar,
               (m2 - m1 * m1 - m1 * (1.0 - m1) / nbar)
               / (m1 * (1.0 - m1) * (1.0 - 1.0 / nbar)) AS rho
        FROM mom
    )
    SELECT m AS n_customers,
           ROUND(m1, 6) AS mean_rate,
           ROUND(rho, 6) AS icc_rho,
           ROUND(m1 * (1.0 - rho) / rho, 4) AS alpha,
           ROUND((1.0 - m1) * (1.0 - rho) / rho, 4) AS beta
    FROM fit
    """,
)
def beta_binomial_mom_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beta-binomial overdispersion fit by method of moments: each
    customer's urgent-order rate is a binomial draw around a
    customer-level propensity, and the across-customer variance in
    excess of binomial sampling noise identifies the intraclass
    correlation rho and the Beta(alpha, beta) propensity
    distribution — the model UNDER `eb_shrunk_ctr`'s shrinkage (which
    assumes this fit) and the binomial cousin of
    `negative_binomial_user_events` (count overdispersion). rho near
    0 means customers share one urgent rate; large rho justifies
    per-customer personalization.

    Determinism: exact per-customer counts; identical double moment
    trees; rounding at the end.

    Scale shape: one per-customer agg, one moment census, closed-form
    arithmetic — the fit costs two shuffles of key-count pairs.
    """
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        )
        .cast("long")
        .alias("k"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    eligible = per.filter(F.col("n") >= 5).select(
        "k", "n", (F.col("k") * 1.0 / F.col("n")).alias("p")
    )
    m_ = F.count(F.lit(1))
    mom = eligible.agg(
        m_.cast("long").alias("m"),
        (F.sum("p") / m_).alias("m1"),
        (F.sum(F.col("p") * F.col("p")) / m_).alias("m2"),
        (F.sum("n") * 1.0 / m_).alias("nbar"),
    )
    rho = (
        F.col("m2")
        - F.col("m1") * F.col("m1")
        - F.col("m1") * (1.0 - F.col("m1")) / F.col("nbar")
    ) / (F.col("m1") * (1.0 - F.col("m1")) * (1.0 - 1.0 / F.col("nbar")))
    fit = mom.select("m", "m1", "nbar", rho.alias("rho"))
    return fit.select(
        F.col("m").alias("n_customers"),
        F.round("m1", 6).alias("mean_rate"),
        F.round("rho", 6).alias("icc_rho"),
        F.round(F.col("m1") * (1.0 - F.col("rho")) / F.col("rho"), 4).alias(
            "alpha"
        ),
        F.round(
            (1.0 - F.col("m1")) * (1.0 - F.col("rho")) / F.col("rho"), 4
        ).alias("beta"),
    )


@query("greedy_coloring_certified")
def greedy_coloring_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy (Welsh-Powell) vertex coloring of the part co-purchase
    graph (co-occurrence >= 2): vertices are colored in descending-
    degree order with the smallest color unused by already-colored
    neighbors, and the result carries TWO declarative certificates —
    (a) properness: the count of monochromatic edges, recomputed by
    joining the coloring onto the edge list, must be 0; (b) the
    Welsh-Powell bound: colors used <= max degree + 1. Coloring is
    the conflict-scheduling primitive (parts that co-occur cannot
    share a slot), the complement of `ktruss_copurchase_certified` /
    `kcore_copurchase` which find dense zones — coloring SEPARATES
    them.

    Determinism: degree order ties break on part key; smallest-color
    rule is deterministic.

    Scale shape: edges from one distinct-pair agg; the greedy scan
    runs in one applyInPandas call over the adjacency closure; both
    certificates are single joins/aggs of the coloring against the
    edge relation — exactly how a distributed coloring would be
    validated shard by shard.
    """
    import pandas as pd

    l = load_table(spark, sf_dir, "lineitem")
    d = l.select("l_orderkey", "l_partkey").distinct()
    edges = (
        d.alias("x")
        .join(
            d.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("u"), F.col("y.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
        .withColumn("g", F.lit(1))
        .transform(_ckpt)
    )

    def color(pdf: pd.DataFrame) -> pd.DataFrame:
        adj: dict[int, set] = {}
        for _, row in pdf.iterrows():
            u, v = int(row["u"]), int(row["v"])
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        order = sorted(adj, key=lambda n_: (-len(adj[n_]), n_))
        col: dict[int, int] = {}
        for n_ in order:
            used = {col[w] for w in adj[n_] if w in col}
            c_ = 1
            while c_ in used:
                c_ += 1
            col[n_] = c_
        max_deg = max(len(v_) for v_ in adj.values())
        return pd.DataFrame(
            {
                "part_key": sorted(col),
                "color": [col[n_] for n_ in sorted(col)],
                "degree": [len(adj[n_]) for n_ in sorted(col)],
                "n_colors": [max(col.values())] * len(col),
                "max_degree": [max_deg] * len(col),
            }
        )

    colored = edges.groupBy("g").applyInPandas(
        color,
        schema=(
            "part_key long, color long, degree long, n_colors long, "
            "max_degree long"
        ),
    )
    colored = colored.transform(_ckpt)
    # certificate: no monochromatic edge
    cu = colored.select(F.col("part_key").alias("u"), F.col("color").alias("cu"))
    cv = colored.select(F.col("part_key").alias("v"), F.col("color").alias("cv"))
    mono = (
        edges.join(F.broadcast(cu), "u")
        .join(F.broadcast(cv), "v")
        .agg(
            F.sum(F.when(F.col("cu") == F.col("cv"), 1).otherwise(0))
            .cast("long")
            .alias("n_monochromatic_edges")
        )
    )
    return colored.crossJoin(F.broadcast(mono))


@query(
    "geary_c_balance",
    oracle="""
    WITH pts AS (
        SELECT (c_custkey * 7919) % 100000 AS x,
               (c_custkey * 104729) % 100000 AS y,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v
        FROM customer
    ), cells AS (
        SELECT CAST(x // 10000 AS BIGINT) AS cx,
               CAST(y // 10000 AS BIGINT) AS cy,
               CAST(SUM(v) AS BIGINT) AS v
        FROM pts GROUP BY 1, 2
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(v) * 1.0 / COUNT(*) AS xbar,
               SUM((v - (SELECT SUM(v) * 1.0 / COUNT(*) FROM cells))
                   * (v - (SELECT SUM(v) * 1.0 / COUNT(*) FROM cells)))
                   AS ss
        FROM cells
    ), nbr AS (
        -- rook adjacency
        SELECT a.v AS va, b.v AS vb
        FROM cells a JOIN cells b
          ON ABS(a.cx - b.cx) + ABS(a.cy - b.cy) = 1
    ), w AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS w2,
               SUM((va - vb) * (va - vb)) AS sqd
        FROM nbr
    )
    SELECT stats.n AS n_cells, w.w2 AS n_directed_links,
           ROUND((stats.n - 1.0) * w.sqd / (2.0 * w.w2 * stats.ss), 6)
               AS geary_c
    FROM stats, w
    """,
)
def geary_c_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geary's C for account balance on the 10x10 raster (rook
    adjacency): C = (n-1) sum w_ij (x_i - x_j)^2 / (2W sum (x_i -
    xbar)^2) — the LOCAL-DIFFERENCE autocorrelation statistic,
    sensitive to neighbor-to-neighbor contrast where `spatial_moran_i`
    (cross-product form) responds to global covariation; C < 1 means
    positive spatial association, > 1 negative. With `getis_ord_
    hotspots` this completes the classical spatial-autocorrelation
    triple (global product, global difference, local z).

    Determinism: integer cell sums; identical double expression
    trees; one rounding.

    Scale shape: raster agg first, then a rook-adjacency self-join of
    the 100-cell relation — the points never enter the neighbor
    join (same raster trick as Gi*).
    """
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        ((F.col("c_custkey") * 7919) % 100000).alias("x"),
        ((F.col("c_custkey") * 104729) % 100000).alias("y"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("v"),
    )
    cells = pts.groupBy(
        F.expr("x DIV 10000").cast("long").alias("cx"),
        F.expr("y DIV 10000").cast("long").alias("cy"),
    ).agg(F.sum("v").cast("long").alias("v"))
    cells = cells.transform(_ckpt)
    xbar = cells.agg((F.sum("v") * 1.0 / F.count(F.lit(1))).alias("xbar"))
    stats = cells.crossJoin(F.broadcast(xbar)).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            (F.col("v") - F.col("xbar")) * (F.col("v") - F.col("xbar"))
        ).alias("ss"),
    )
    a, b = cells.alias("a"), cells.alias("b")
    nbr = a.join(
        b,
        F.abs(F.col("a.cx") - F.col("b.cx"))
        + F.abs(F.col("a.cy") - F.col("b.cy"))
        == 1,
    ).select(F.col("a.v").alias("va"), F.col("b.v").alias("vb"))
    w = nbr.agg(
        F.count(F.lit(1)).cast("long").alias("w2"),
        F.sum(
            (F.col("va") - F.col("vb")) * (F.col("va") - F.col("vb"))
        ).alias("sqd"),
    )
    return stats.crossJoin(F.broadcast(w)).select(
        F.col("n").alias("n_cells"),
        F.col("w2").alias("n_directed_links"),
        F.round(
            (F.col("n") - 1.0)
            * F.col("sqd")
            / (2.0 * F.col("w2") * F.col("ss")),
            6,
        ).alias("geary_c"),
    )


@query("fifo_vs_sjf_replay")
def fifo_vs_sjf_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-server scheduling discipline replay: the first 500
    purchase events arrive at their true timestamps with synthetic
    service times (value-scaled deciseconds), and the SAME workload
    is run through FIFO and through preemptive-resume SJF (shortest
    remaining processing time) — reporting mean/max waits for both
    and certifying the classic optimality theorem IN-ROW: SRPT
    minimizes mean flow time, so sjf_mean_flow <= fifo_mean_flow must
    hold on every workload. Completes the queueing family with the
    DISCIPLINE axis (`pollaczek_khinchine_mg1` fixes FIFO;
    `johnsons_rule_flowshop` / `edd_wspt_schedule_audit` are batch
    sequencing; this replays preemption).

    Determinism: exact microsecond arrivals and integer service
    times; event-driven simulation with (remaining, arrival, id)
    tie-breaks.

    Scale shape: the replay is one applyInPandas pass over the
    closure (the simulation is inherently sequential); arrival/
    service extraction is the only distributed stage. Fleet-scale
    what-ifs run one replay per server shard — this is that unit.
    """
    import heapq

    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    jobs = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("arr_us"),
            (F.round(F.col("value") * 10).cast("long") * 100000).alias(
                "svc_us"
            ),
            "event_id",
        )
        .orderBy("arr_us", "event_id")
        .limit(500)
        .withColumn("g", F.lit(1))
    )

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["arr_us", "event_id"])
        arr = pdf["arr_us"].astype("int64").tolist()
        svc = pdf["svc_us"].astype("int64").tolist()
        n = len(arr)
        # FIFO: completion via running clock
        clock = 0
        fifo_flow = []
        for a, s_ in zip(arr, svc):
            start = max(clock, a)
            clock = start + s_
            fifo_flow.append(clock - a)
        # preemptive SRPT event simulation
        pending: list[tuple[int, int, int]] = []  # (remaining, arr, idx)
        flow = [0] * n
        t = arr[0]
        i = 0
        while i < n or pending:
            if not pending:
                t = max(t, arr[i])
            while i < n and arr[i] <= t:
                heapq.heappush(pending, (svc[i], arr[i], i))
                i += 1
            rem, a0, idx = heapq.heappop(pending)
            # run until next arrival or completion
            nxt = arr[i] if i < n else None
            if nxt is not None and t + rem > nxt:
                rem -= nxt - t
                t = nxt
                heapq.heappush(pending, (rem, a0, idx))
            else:
                t = t + rem
                flow[idx] = t - arr[idx]
        return pd.DataFrame(
            {
                "n_jobs": [n],
                "fifo_mean_flow_us": [sum(fifo_flow) // n],
                "fifo_max_flow_us": [max(fifo_flow)],
                "sjf_mean_flow_us": [sum(flow) // n],
                "sjf_max_flow_us": [max(flow)],
            }
        )

    return jobs.groupBy("g").applyInPandas(
        replay,
        schema=(
            "n_jobs long, fifo_mean_flow_us long, fifo_max_flow_us long, "
            "sjf_mean_flow_us long, sjf_max_flow_us long"
        ),
    )


@query(
    "lorenz_dominance_pairs",
    oracle="""
    WITH spend AS (
        SELECT c.c_mktsegment AS seg,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
               PERCENT_RANK() OVER (
                   PARTITION BY c.c_mktsegment
                   ORDER BY ROUND(o.o_totalprice * 100), o.o_orderkey)
                   AS pr
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), cum AS (
        SELECT seg, pr,
               SUM(cents) OVER (
                   PARTITION BY seg
                   ORDER BY pr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               * 1.0
               / SUM(cents) OVER (PARTITION BY seg) AS lshare
        FROM spend
    ), grid AS (
        -- Lorenz value at deciles: max cumulative share with pr <= d
        SELECT seg, CAST(d.d AS BIGINT) AS decile,
               MAX(CASE WHEN pr <= d.d / 10.0 THEN lshare ELSE 0 END)
                   AS l
        FROM cum,
             LATERAL (SELECT unnest(generate_series(1, 9)) AS d) d
        GROUP BY 1, 2
    )
    SELECT a.seg AS seg_a, b.seg AS seg_b,
           CAST(SUM(CASE WHEN a.l >= b.l - 1e-12 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_ge,
           CAST(CASE WHEN SUM(CASE WHEN a.l >= b.l - 1e-12
                                 THEN 1 ELSE 0 END) = 9
                THEN 1 ELSE 0 END AS BIGINT) AS a_dominates
    FROM grid a JOIN grid b
      ON b.decile = a.decile AND a.seg < b.seg
    GROUP BY 1, 2
    """,
)
def lorenz_dominance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Lorenz-dominance audit across market segments: for
    every segment pair, compare the Lorenz curves (cumulative spend
    share at each decile of orders) pointwise — A Lorenz-dominates B
    iff A's curve is everywhere >= B's, meaning A's spend is
    UNAMBIGUOUSLY more equal, a conclusion every inequality index
    would agree with. The partial-order layer above the scalar
    indices (`gini_exact_customer_spend`, `theil_index_decomposition`,
    `atkinson_index_by_nation`, `palma_hoover_inequality`): when
    curves cross (a_dominates = 0 both ways), index choice DECIDES
    the ranking — this audit shows where that happens.

    Determinism: exact cent spend; percent-rank with key tie-breaks;
    decile grid with a 1e-12 comparison guard on identical doubles.

    Scale shape: one partitioned rank/cumsum window per segment, a
    9-point decile reduction, then a 5x5 segment self-join of the
    tiny grid relation.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = (
        o.join(
            F.broadcast(
                c.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
            ),
            "o_custkey",
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            "o_orderkey",
        )
        .select(
            "seg",
            "cents",
            F.percent_rank()
            .over(
                Window.partitionBy("seg").orderBy("cents", "o_orderkey")
            )
            .alias("pr"),
        )
    )
    wseg = Window.partitionBy("seg")
    cum = spend.select(
        "seg",
        "pr",
        (
            F.sum("cents")
            .over(
                wseg.orderBy("pr").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            * 1.0
            / F.sum("cents").over(wseg)
        ).alias("lshare"),
    )
    ds = spark.range(1, 10).select(F.col("id").cast("long").alias("decile"))
    grid = (
        cum.crossJoin(F.broadcast(ds))
        .groupBy("seg", "decile")
        .agg(
            F.max(
                F.when(
                    F.col("pr") <= F.col("decile") / 10.0, F.col("lshare")
                ).otherwise(0.0)
            ).alias("l")
        )
    )
    a, b = grid.alias("a"), grid.alias("b")
    return (
        a.join(
            b,
            (F.col("b.decile") == F.col("a.decile"))
            & (F.col("a.seg") < F.col("b.seg")),
        )
        .groupBy(
            F.col("a.seg").alias("seg_a"), F.col("b.seg").alias("seg_b")
        )
        .agg(
            F.sum(
                F.when(
                    F.col("a.l") >= F.col("b.l") - 1e-12, 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_ge"),
            F.when(
                F.sum(
                    F.when(
                        F.col("a.l") >= F.col("b.l") - 1e-12, 1
                    ).otherwise(0)
                )
                == 9,
                1,
            )
            .otherwise(0)
            .cast("long")
            .alias("a_dominates"),
        )
    )


@query(
    "arma11_mom_daily",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(ROUND(SUM(value) * 100) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), r AS (
        SELECT x,
               LAG(x, 1) OVER (ORDER BY day) AS x1,
               LAG(x, 2) OVER (ORDER BY day) AS x2
        FROM d
    ), mu AS (SELECT SUM(x) * 1.0 / COUNT(*) AS m FROM d),
    acf AS (
        SELECT
            (SELECT SUM((x - m) * (x - m)) FROM d, mu) AS c0,
            SUM((r.x - mu.m) * (r.x1 - mu.m)) AS c1n,
            SUM(CASE WHEN r.x2 IS NOT NULL
                THEN (r.x - mu.m) * (r.x2 - mu.m) END) AS c2n
        FROM r, mu WHERE r.x1 IS NOT NULL
        GROUP BY mu.m
    ), rho AS (
        SELECT c1n / c0 AS r1, c2n / c0 AS r2 FROM acf
    ), fit AS (
        -- ARMA(1,1) MoM: phi = rho2/rho1; theta from
        -- rho1 = (1+phi*theta)(phi+theta)/(1+2*phi*theta+theta^2),
        -- solved as a quadratic in theta: pick the invertible root
        SELECT r1, r2, r2 / r1 AS phi,
               ((1.0 - 2.0 * r1 * (r2 / r1) + (r2 / r1) * (r2 / r1))
                / (2.0 * (r1 - (r2 / r1)))) AS bq
        FROM rho
    )
    SELECT ROUND(r1, 6) AS rho1,
           ROUND(r2, 6) AS rho2,
           ROUND(phi, 6) AS phi,
           ROUND(CASE WHEN ABS(bq) >= 1.0
                 THEN -bq + SIGN(bq) * SQRT(bq * bq - 1.0)
                 ELSE 0.0 END, 6) AS theta
    FROM fit
    """,
)
def arma11_mom_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARMA(1,1) method-of-moments fit to the daily revenue series:
    phi = rho2/rho1 (AR decay of the autocorrelation) and the MA
    coefficient from the rho1 quadratic, taking the invertible root
    -b + sign(b) sqrt(b^2 - 1) when it exists (|b| >= 1; otherwise
    theta = 0, a pure AR(1) fallback — the condition is reported via
    theta itself). The mixed-process member of the time-series
    family: `cochrane_orcutt_daily_trend` fits pure AR(1) errors,
    `ewma_user_value` is the theta-only IMA special case — ARMA(1,1)
    is exactly EWMA-plus-decay, the standard demand-process model.

    Determinism: exact cents, identical ACF expression trees,
    rounding at the end.

    Scale shape: two LAG windows + three moment sums over the day
    grid; closed-form arithmetic after that.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100).cast("long").alias("x")
    )
    d = _ckpt(d)  # shared fan-out relation
    w = Window.orderBy("day")
    r = d.select(
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 2).over(w).alias("x2"),
    )
    mu = d.agg((F.sum("x") * 1.0 / F.count(F.lit(1))).alias("m"))
    mu = _ckpt(mu)  # shared fan-out relation
    c0 = d.crossJoin(F.broadcast(mu)).agg(
        F.sum((F.col("x") - F.col("m")) * (F.col("x") - F.col("m"))).alias(
            "c0"
        )
    )
    acf = (
        r.filter(F.col("x1").isNotNull())
        .crossJoin(F.broadcast(mu))
        .agg(
            F.sum(
                (F.col("x") - F.col("m")) * (F.col("x1") - F.col("m"))
            ).alias("c1n"),
            F.sum(
                F.when(
                    F.col("x2").isNotNull(),
                    (F.col("x") - F.col("m")) * (F.col("x2") - F.col("m")),
                )
            ).alias("c2n"),
        )
    )
    rho = acf.crossJoin(F.broadcast(c0)).select(
        (F.col("c1n") / F.col("c0")).alias("r1"),
        (F.col("c2n") / F.col("c0")).alias("r2"),
    )
    phi = F.col("r2") / F.col("r1")
    bq = (
        (1.0 - 2.0 * F.col("r1") * phi + phi * phi)
        / (2.0 * (F.col("r1") - phi))
    )
    fit = rho.select("r1", "r2", phi.alias("phi"), bq.alias("bq"))
    theta = F.when(
        F.abs(F.col("bq")) >= 1.0,
        -F.col("bq")
        + F.signum("bq") * F.sqrt(F.col("bq") * F.col("bq") - 1.0),
    ).otherwise(0.0)
    return fit.select(
        F.round("r1", 6).alias("rho1"),
        F.round("r2", 6).alias("rho2"),
        F.round("phi", 6).alias("phi"),
        F.round(theta, 6).alias("theta"),
    )


@query(
    "engle_granger_cointegration",
    oracle="""
    WITH nk AS (
        SELECT c.c_nationkey AS nk,
               CAST(date_trunc('week', o.o_orderdate) AS DATE) AS wk,
               CAST(ROUND(SUM(o.o_totalprice) * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_nationkey IN (0, 1)
        GROUP BY 1, 2
    ), spine AS (
        SELECT CAST(unnest(generate_series(
            (SELECT MIN(wk) FROM nk), (SELECT MAX(wk) FROM nk),
            INTERVAL 7 DAY)) AS DATE) AS wk
    ), wide AS (
        SELECT s.wk,
               SUM(COALESCE(CASE WHEN nk.nk = 0
                   THEN nk.cents END, 0))
                   OVER (ORDER BY s.wk) AS y,
               SUM(COALESCE(CASE WHEN nk.nk = 1
                   THEN nk.cents END, 0))
                   OVER (ORDER BY s.wk) AS x
        FROM spine s LEFT JOIN nk ON nk.wk = s.wk
    ), dedup AS (
        SELECT wk, MAX(y) / 100.0 AS y, MAX(x) / 100.0 AS x
        FROM wide GROUP BY wk
    ), ols AS (
        SELECT (SUM(x*y) - SUM(x)*SUM(y)/COUNT(*))
               / (SUM(x*x) - SUM(x)*SUM(x)/COUNT(*)) AS b,
               SUM(y)/COUNT(*)
               - (SUM(x*y) - SUM(x)*SUM(y)/COUNT(*))
                 / (SUM(x*x) - SUM(x)*SUM(x)/COUNT(*))
                 * SUM(x)/COUNT(*) AS a,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM dedup
    ), resid AS (
        SELECT wk, y - a - b * x AS e FROM dedup, ols
    ), dr AS (
        SELECT e - LAG(e) OVER (ORDER BY wk) AS de,
               LAG(e) OVER (ORDER BY wk) AS e1
        FROM resid
    ), adf AS (
        -- no-constant DF regression de = gamma * e1
        SELECT SUM(de * e1) / SUM(e1 * e1) AS gamma,
               SUM(e1 * e1) AS see,
               CAST(COUNT(*) AS BIGINT) AS nn
        FROM dr WHERE de IS NOT NULL
    ), tstat AS (
        SELECT gamma,
               gamma / SQRT(
                   (SELECT SUM((de - adf.gamma * e1)
                               * (de - adf.gamma * e1))
                    FROM dr WHERE de IS NOT NULL)
                   / (nn - 1) / see) AS t
        FROM adf
    )
    SELECT ols.n AS n_weeks,
           ROUND(ols.b, 6) AS hedge_beta,
           ROUND(tstat.gamma, 6) AS adf_gamma,
           ROUND(tstat.t, 4) AS adf_t,
           CAST(CASE WHEN tstat.t < -3.34 THEN 1 ELSE 0 END AS BIGINT)
               AS cointegrated_5pct
    FROM ols, tstat
    """,
)
def engle_granger_cointegration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle-Granger two-step cointegration test between the
    CUMULATIVE weekly revenue paths of nations 0 and 1 (integrated
    series by construction): step 1 fits the long-run hedge
    regression y = a + b x; step 2 runs a no-constant Dickey-Fuller
    regression on the residuals and compares the t-statistic to the
    Engle-Granger 5% critical value (-3.34, 2 variables, no trend) —
    a stationary residual means the two paths share a common
    stochastic trend. The multivariate completion of
    `dickey_fuller_daily_value` (single-series unit root) and the
    formal backbone of pairs-trading / demand-linkage analyses
    (`gravity_trade_model` explains levels; cointegration tests
    whether the LINK is stable).

    Determinism: exact integer cumulative paths on a zero-filled
    spine; OLS and DF moments use identical expression trees;
    rounding at the end.

    Scale shape: one week agg, two prefix-sum windows, three moment
    censuses — all linear with map-side partials.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    nk = (
        o.join(
            F.broadcast(
                c.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .filter(F.col("c_nationkey").isin(0, 1))
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.date_trunc("week", "o_orderdate").cast("date").alias("wk"),
        )
        .agg(F.round(F.sum("o_totalprice") * 100).cast("long").alias("cents"))
    )
    nk = _ckpt(nk)  # shared fan-out relation
    bounds = nk.agg(F.min("wk").alias("w0"), F.max("wk").alias("w1"))
    spine = bounds.select(
        F.explode(F.sequence("w0", "w1", F.expr("INTERVAL 7 DAY"))).alias("wk")
    )
    per_wk = (
        spine.join(nk, "wk", "left")
        .groupBy("wk")
        .agg(
            F.sum(
                F.coalesce(
                    F.when(F.col("nk") == 0, F.col("cents")), F.lit(0)
                )
            ).alias("iy"),
            F.sum(
                F.coalesce(
                    F.when(F.col("nk") == 1, F.col("cents")), F.lit(0)
                )
            ).alias("ix"),
        )
    )
    w = Window.orderBy("wk")
    dedup = per_wk.select(
        "wk",
        (F.sum("iy").over(w) / 100.0).alias("y"),
        (F.sum("ix").over(w) / 100.0).alias("x"),
    )
    n_ = F.count(F.lit(1))
    b_ = (
        F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y") / n_
    ) / (F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x") / n_)
    ols = dedup.agg(
        b_.alias("b"),
        (F.sum("y") / n_ - b_ * F.sum("x") / n_).alias("a"),
        n_.cast("long").alias("n"),
    )
    resid = dedup.crossJoin(F.broadcast(ols)).select(
        "wk",
        (F.col("y") - F.col("a") - F.col("b") * F.col("x")).alias("e"),
        "n",
        "b",
    )
    dr = resid.select(
        (F.col("e") - F.lag("e").over(w)).alias("de"),
        F.lag("e").over(w).alias("e1"),
        "n",
        "b",
    ).filter(F.col("de").isNotNull())
    adf = dr.agg(
        (F.sum(F.col("de") * F.col("e1")) / F.sum(F.col("e1") * F.col("e1"))).alias(
            "gamma"
        ),
        F.sum(F.col("e1") * F.col("e1")).alias("see"),
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.first("n").alias("n"),
        F.first("b").alias("b"),
    )
    adf = _ckpt(adf)  # shared fan-out relation
    sse = dr.crossJoin(F.broadcast(adf.select("gamma"))).agg(
        F.sum(
            (F.col("de") - F.col("gamma") * F.col("e1"))
            * (F.col("de") - F.col("gamma") * F.col("e1"))
        ).alias("sse")
    )
    t = F.col("gamma") / F.sqrt(
        F.col("sse") / (F.col("nn") - 1) / F.col("see")
    )
    return adf.crossJoin(F.broadcast(sse)).select(
        F.col("n").alias("n_weeks"),
        F.round("b", 6).alias("hedge_beta"),
        F.round("gamma", 6).alias("adf_gamma"),
        F.round(t, 4).alias("adf_t"),
        F.when(t < -3.34, 1).otherwise(0).cast("long").alias(
            "cointegrated_5pct"
        ),
    )


@query(
    "symbolic_transfer_entropy",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(ROUND(SUM(CASE WHEN event_type = 'view'
                        THEN value END) * 100) AS BIGINT) AS xv,
               CAST(ROUND(SUM(CASE WHEN event_type = 'purchase'
                        THEN value END) * 100) AS BIGINT) AS yv
        FROM events GROUP BY 1
    ), sym AS (
        -- ordinal pattern of (v_t, v_{t+1}): 1 = up, 0 = down/flat
        SELECT day,
               CASE WHEN LEAD(xv) OVER (ORDER BY day) > xv
                    THEN 1 ELSE 0 END AS sx,
               CASE WHEN LEAD(yv) OVER (ORDER BY day) > yv
                    THEN 1 ELSE 0 END AS sy,
               CASE WHEN LEAD(yv, 2) OVER (ORDER BY day)
                         > LEAD(yv) OVER (ORDER BY day)
                    THEN 1 ELSE 0 END AS sy1,
               LEAD(yv, 2) OVER (ORDER BY day) AS guard
        FROM d
    ), trip AS (
        SELECT sy1, sy, sx FROM sym WHERE guard IS NOT NULL
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM trip),
    p3 AS (
        SELECT sy1, sy, sx, CAST(COUNT(*) AS BIGINT) AS c
        FROM trip GROUP BY 1, 2, 3
    ), pyx AS (
        SELECT sy, sx, CAST(SUM(c) AS BIGINT) AS c FROM p3 GROUP BY 1, 2
    ), pyy AS (
        SELECT sy1, sy, CAST(SUM(c) AS BIGINT) AS c FROM p3 GROUP BY 1, 2
    ), py AS (
        SELECT sy, CAST(SUM(c) AS BIGINT) AS c FROM p3 GROUP BY 1
    )
    SELECT n.n AS n_triples,
           ROUND(SUM(p3.c * 1.0 / n.n
                 * LN((p3.c * 1.0 / pyx.c)
                      / (pyy.c * 1.0 / py.c))) / LN(2.0), 6)
               AS te_x_to_y_bits
    FROM p3
    JOIN pyx ON pyx.sy = p3.sy AND pyx.sx = p3.sx
    JOIN pyy ON pyy.sy1 = p3.sy1 AND pyy.sy = p3.sy
    JOIN py ON py.sy = p3.sy
    CROSS JOIN n
    GROUP BY n.n
    """,
)
def symbolic_transfer_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symbolic transfer entropy from VIEW revenue to next-day
    PURCHASE revenue: both daily series are reduced to up/down
    symbols and TE(X -> Y) = sum p(y', y, x) log[ p(y'|y, x) /
    p(y'|y) ] measures how much knowing today's view direction
    improves the prediction of tomorrow's purchase direction BEYOND
    purchase's own history — the model-free, directional counterpart
    of `granger_views_to_purchases` (linear VAR) built from the same
    ordinal-pattern machinery as `permutation_entropy_daily`. TE = 0
    iff X adds nothing; asymmetric by construction.

    Determinism: exact cent comparisons define the symbols; every
    probability is an exact count ratio; one rounded entropy sum.

    Scale shape: two LEAD windows over the day grid, one 8-cell
    count, three marginalizations, a scalar sum — constant-size
    after the day agg, per-series-pair parallel at scale.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(
            F.sum(F.when(F.col("event_type") == "view", F.col("value")))
            * 100
        )
        .cast("long")
        .alias("xv"),
        F.round(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value"))
            )
            * 100
        )
        .cast("long")
        .alias("yv"),
    )
    w = Window.orderBy("day")
    sym = d.select(
        F.when(F.lead("xv").over(w) > F.col("xv"), 1).otherwise(0).alias(
            "sx"
        ),
        F.when(F.lead("yv").over(w) > F.col("yv"), 1).otherwise(0).alias(
            "sy"
        ),
        F.when(
            F.lead("yv", 2).over(w) > F.lead("yv").over(w), 1
        )
        .otherwise(0)
        .alias("sy1"),
        F.lead("yv", 2).over(w).alias("guard"),
    )
    trip = sym.filter(F.col("guard").isNotNull()).select("sy1", "sy", "sx")
    trip = trip.transform(_ckpt)
    n = trip.agg(F.count(F.lit(1)).cast("long").alias("n"))
    p3 = trip.groupBy("sy1", "sy", "sx").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    pyx = p3.groupBy("sy", "sx").agg(F.sum("c").cast("long").alias("cyx"))
    pyy = p3.groupBy("sy1", "sy").agg(F.sum("c").cast("long").alias("cyy"))
    py = p3.groupBy("sy").agg(F.sum("c").cast("long").alias("cy"))
    joined = (
        p3.join(F.broadcast(pyx), ["sy", "sx"])
        .join(F.broadcast(pyy), ["sy1", "sy"])
        .join(F.broadcast(py), "sy")
        .crossJoin(F.broadcast(n))
    )
    te = F.sum(
        F.col("c")
        * 1.0
        / F.col("n")
        * F.log(
            (F.col("c") * 1.0 / F.col("cyx"))
            / (F.col("cyy") * 1.0 / F.col("cy"))
        )
    ) / F.log(F.lit(2.0))
    return joined.groupBy("n").agg(
        F.round(te, 6).alias("te_x_to_y_bits")
    ).select(F.col("n").alias("n_triples"), "te_x_to_y_bits")


@query("half_sample_mode")
def half_sample_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-sample mode (Robertson-Cryer / Bickel) of the order-value
    distribution: recursively keep the half-sample with the SMALLEST
    range until <= 3 points remain — a robust mode estimator immune
    to outliers and skew (the mean and median of a right-skewed spend
    distribution both sit far from its bulk). Reported per market
    segment with the mean and median for contrast — the
    location-estimator family completion (`hodges_lehmann_location`
    is the robust CENTER; HSM finds the densest POINT;
    `winsorized_stats_orders` trims).

    Determinism: sorted exact cents; lower-half preference on range
    ties makes the recursion a pure function.

    Scale shape: one sort per group feeds an O(n log n) shrinking
    scan in applyInPandas, parallel across segments; the distributed
    prelude is just the grouped collect of cents (narrow column).
    """
    import pandas as pd

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    pts = o.join(
        F.broadcast(
            c.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
        ),
        "o_custkey",
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )

    def hsm(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = sorted(int(v) for v in pdf["cents"])
        v = vals
        while len(v) > 3:
            h = (len(v) + 1) // 2
            best = None
            for i in range(len(v) - h + 1):
                rng = v[i + h - 1] - v[i]
                if best is None or rng < best[0]:
                    best = (rng, i)
            v = v[best[1] : best[1] + h]
        mode = v[len(v) // 2]
        n = len(vals)
        med = (
            vals[n // 2]
            if n % 2 == 1
            else (vals[n // 2 - 1] + vals[n // 2]) // 2
        )
        return pd.DataFrame(
            {
                "segment": [pdf["seg"].iloc[0]],
                "n_orders": [n],
                "hsm_mode_cents": [mode],
                "median_cents": [med],
                "mean_cents": [sum(vals) // n],
            }
        )

    return pts.groupBy("seg").applyInPandas(
        hsm,
        schema=(
            "segment string, n_orders long, hsm_mode_cents long, "
            "median_cents long, mean_cents long"
        ),
    )


@query(
    "visibility_graph_daily",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(ROUND(SUM(value) * 100) AS BIGINT) AS y
        FROM events GROUP BY 1
    ), r AS (
        SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
        FROM d
    ), pairs AS (
        SELECT a.i AS i, b.i AS j, a.y AS yi, b.y AS yj
        FROM r a JOIN r b ON b.i > a.i
    ), vis AS (
        SELECT i, j,
               CAST(CASE WHEN NOT EXISTS (
                   SELECT 1 FROM r k
                   WHERE k.i > pairs.i AND k.i < pairs.j
                     AND k.y * (pairs.j - pairs.i)
                         >= pairs.yi * (pairs.j - k.i)
                           + pairs.yj * (k.i - pairs.i)
               ) THEN 1 ELSE 0 END AS BIGINT) AS nvg,
               CAST(CASE WHEN NOT EXISTS (
                   SELECT 1 FROM r k
                   WHERE k.i > pairs.i AND k.i < pairs.j
                     AND k.y >= LEAST(pairs.yi, pairs.yj)
               ) THEN 1 ELSE 0 END AS BIGINT) AS hvg
        FROM pairs
    ), deg AS (
        SELECT i AS node, SUM(nvg) AS nvg, SUM(hvg) AS hvg FROM (
            SELECT i, nvg, hvg FROM vis
            UNION ALL SELECT j, nvg, hvg FROM vis
        ) t GROUP BY 1
    )
    SELECT CAST(node AS BIGINT) AS day_idx,
           CAST(nvg AS BIGINT) AS nvg_degree,
           CAST(hvg AS BIGINT) AS hvg_degree
    FROM deg
    """,
)
def visibility_graph_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visibility graphs of the daily revenue series: day i 'sees'
    day j in the NATURAL graph when every bar strictly between lies
    below the sight line (exact cross-multiplied integer test —
    y_k (j-i) < y_i (j-k) + y_j (k-i)) and in the HORIZONTAL graph
    when every bar between lies below min(y_i, y_j). The
    series-to-network transform (Lacasa et al.): degree structure
    encodes temporal structure — periodic series map to regular
    graphs, i.i.d. noise maps HVG degrees to a known exponential law
    — giving a graph-theoretic lens the spectral
    (`welch_psd_hourly`) and recurrence (`rqa_daily`) views miss.

    Determinism: pure integer geometry (no division in the sight
    test); per-day degree sums.

    Scale shape: the O(n^2) pair relation with an anti-join
    occlusion test is the exact spec on the day-grid closure; long
    series use the divide-and-conquer maximum decomposition — same
    edges. All joins on the tiny day grid.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100).cast("long").alias("y")
    )
    r = d.select(
        "y",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
    ).transform(_ckpt)
    a, b, k = r.alias("a"), r.alias("b"), r.alias("k")
    pairs = a.join(b, F.col("b.i") > F.col("a.i")).select(
        F.col("a.i").alias("pi"),
        F.col("b.i").alias("pj"),
        F.col("a.y").alias("yi"),
        F.col("b.y").alias("yj"),
    )
    blocked_n = (
        pairs.join(
            k,
            (F.col("k.i") > F.col("pi"))
            & (F.col("k.i") < F.col("pj"))
            & (
                F.col("k.y") * (F.col("pj") - F.col("pi"))
                >= F.col("yi") * (F.col("pj") - F.col("k.i"))
                + F.col("yj") * (F.col("k.i") - F.col("pi"))
            ),
            "left_semi",
        )
        .select("pi", "pj")
        .withColumn("blocked_n", F.lit(1))
    )
    blocked_h = (
        pairs.join(
            k,
            (F.col("k.i") > F.col("pi"))
            & (F.col("k.i") < F.col("pj"))
            & (F.col("k.y") >= F.least("yi", "yj")),
            "left_semi",
        )
        .select("pi", "pj")
        .withColumn("blocked_h", F.lit(1))
    )
    vis = (
        pairs.join(blocked_n, ["pi", "pj"], "left")
        .join(blocked_h, ["pi", "pj"], "left")
        .select(
            F.col("pi").alias("i"),
            F.col("pj").alias("j"),
            F.when(F.col("blocked_n").isNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("nvg"),
            F.when(F.col("blocked_h").isNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("hvg"),
        )
    )
    deg = (
        vis.select(F.col("i").alias("node"), "nvg", "hvg")
        .unionByName(vis.select(F.col("j").alias("node"), "nvg", "hvg"))
        .groupBy("node")
        .agg(
            F.sum("nvg").cast("long").alias("nvg_degree"),
            F.sum("hvg").cast("long").alias("hvg_degree"),
        )
    )
    return deg.select(
        F.col("node").alias("day_idx"), "nvg_degree", "hvg_degree"
    )


@query(
    "robbins_poisson_eb",
    oracle="""
    WITH per_user AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ), freq AS (
        SELECT x, CAST(COUNT(*) AS BIGINT) AS fx
        FROM per_user GROUP BY 1
    )
    SELECT a.x, a.fx AS n_users,
           ROUND((a.x + 1) * COALESCE(b.fx, 0) * 1.0 / a.fx, 4)
               AS robbins_posterior_mean,
           CAST(a.x AS BIGINT) AS mle_estimate
    FROM freq a LEFT JOIN freq b ON b.x = a.x + 1
    """,
)
def robbins_poisson_eb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robbins' nonparametric empirical Bayes estimator for Poisson
    rates: for a user observed with x purchases, the posterior mean
    rate under the UNKNOWN mixing distribution is exactly
    (x+1) f(x+1) / f(x) — pure count frequencies, no model fitted
    anywhere, the founding result of empirical Bayes (1956). Where
    `eb_shrunk_ctr` and `james_stein_nation_means` assume a
    parametric prior, Robbins lets the data BE the prior; the
    estimator famously beats the MLE x in aggregate while looking
    nothing like it (non-monotone where frequencies are ragged —
    visible in the output).

    Determinism: exact count frequencies; one rounded ratio.

    Scale shape: two aggs (per-user counts, then count-of-counts)
    and a shifted self-join of the tiny frequency relation — the
    canonical two-pass EB pipeline at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    per = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    freq = per.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("fx"))
    b = freq.select((F.col("x") - 1).alias("x"), F.col("fx").alias("fx1"))
    return (
        freq.join(b, "x", "left")
        .select(
            "x",
            F.col("fx").alias("n_users"),
            F.round(
                (F.col("x") + 1)
                * F.coalesce("fx1", F.lit(0))
                * 1.0
                / F.col("fx"),
                4,
            ).alias("robbins_posterior_mean"),
            F.col("x").cast("long").alias("mle_estimate"),
        )
    )


@query(
    "jonckheere_terpstra_priority",
    oracle="""
    WITH g AS (
        SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS grp,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
        FROM orders
    ), pairs AS (
        SELECT a.grp AS ga, b.grp AS gb,
               CAST(SUM(CASE WHEN b.v > a.v THEN 2
                        WHEN b.v = a.v THEN 1 ELSE 0 END) AS BIGINT)
                   AS u2
        FROM g a JOIN g b ON b.grp > a.grp
        GROUP BY 1, 2
    ), jt AS (
        SELECT CAST(SUM(u2) AS BIGINT) AS jt2 FROM pairs
    ), sizes AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY 1
    ), moments AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn,
               CAST(SUM(n * n) AS BIGINT) AS sn2,
               CAST(SUM(CAST(n AS HUGEINT) * n * (2 * n + 3))
                    AS DOUBLE) AS sn23
        FROM sizes
    )
    SELECT jt.jt2 AS jt_times_2,
           CAST((CAST(moments.nn AS HUGEINT) * moments.nn
                 - moments.sn2) AS BIGINT) AS mean_times_4_x2,
           ROUND((jt.jt2 / 2.0
                  - (CAST(moments.nn AS DOUBLE) * moments.nn
                     - moments.sn2) / 4.0)
                 / SQRT((CAST(moments.nn AS DOUBLE) * moments.nn
                         * (2 * moments.nn + 3) - moments.sn23)
                        / 72.0), 4) AS z_stat
    FROM jt, moments
    """,
)
def jonckheere_terpstra_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra test for an ORDERED alternative: do order
    values trend monotonically across the five priority levels
    (1-URGENT < ... < 5-LOW)? JT sums Mann-Whitney exceedance counts
    over every ordered group pair (ties counted half, tracked as 2x
    integers for exactness) and standardizes with the exact
    null moments — strictly more powerful than `kruskal_wallis_
    quantity` (unordered any-difference) when the hypothesis IS a
    trend, and the continuous-response counterpart of
    `cochran_armitage_priority_trend` (binary trend).

    Determinism: exact cent comparisons; integer 2xJT; moment
    arithmetic on identical doubles; one rounding.

    Scale shape: the pairwise exceedance count is a grouped join of
    the 5-group relation computed as one agg over the cross-group
    comparison (at 100 TB the same count comes from per-group sorted
    rank merges — the counts, not the pairs, move); the moments are
    a 5-row agg.
    """
    o = load_table(spark, sf_dir, "orders")
    g = o.select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    a, b = g.alias("a"), g.alias("b")
    pairs = a.join(b, F.col("b.grp") > F.col("a.grp")).agg(
        F.sum(
            F.when(F.col("b.v") > F.col("a.v"), 2)
            .when(F.col("b.v") == F.col("a.v"), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("jt2")
    )
    sizes = g.groupBy("grp").agg(F.count(F.lit(1)).cast("long").alias("n"))
    moments = sizes.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sn2"),
        F.sum(
            F.col("n").cast("double")
            * F.col("n")
            * (2 * F.col("n") + 3)
        ).alias("sn23"),
    )
    return pairs.crossJoin(F.broadcast(moments)).select(
        F.col("jt2").alias("jt_times_2"),
        (
            F.col("nn").cast("double") * F.col("nn") - F.col("sn2")
        )
        .cast("long")
        .alias("mean_times_4_x2"),
        F.round(
            (
                F.col("jt2") / 2.0
                - (
                    F.col("nn").cast("double") * F.col("nn")
                    - F.col("sn2")
                )
                / 4.0
            )
            / F.sqrt(
                (
                    F.col("nn").cast("double")
                    * F.col("nn")
                    * (2 * F.col("nn") + 3)
                    - F.col("sn23")
                )
                / 72.0
            ),
            4,
        ).alias("z_stat"),
    )


_STOREY_P = _phi_sql("-ABS(zst)")


@query(
    "storey_qvalue_nations",
    oracle=f"""
    WITH rates AS (
        SELECT c.c_nationkey AS nk,
               CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
                        THEN 1 ELSE 0 END) AS BIGINT) AS k,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1
    ), gl AS (
        SELECT SUM(k) * 1.0 / SUM(n) AS p0 FROM rates
    ), z AS (
        SELECT nk,
               (k * 1.0 / n - gl.p0)
               / SQRT(gl.p0 * (1.0 - gl.p0) / n) AS zst
        FROM rates, gl
    ), pv AS (
        SELECT nk, 2.0 * ({_STOREY_P}) AS p FROM z
    ), pi0 AS (
        SELECT LEAST(
            SUM(CASE WHEN p > 0.5 THEN 1 ELSE 0 END) * 1.0
            / (COUNT(*) * 0.5), 1.0) AS pi0,
            CAST(COUNT(*) AS BIGINT) AS m
        FROM pv
    ), ranked AS (
        SELECT nk, p,
               CAST(ROW_NUMBER() OVER (ORDER BY p, nk) AS BIGINT) AS rk
        FROM pv
    )
    SELECT ranked.nk AS nation_key,
           ROUND(ranked.p, 6) AS p_value,
           ROUND(LEAST(MIN(pi0.pi0 * pi0.m * r2.p / r2.rk), 1.0), 6)
               AS q_value
    FROM ranked
    JOIN ranked r2 ON r2.rk >= ranked.rk
    CROSS JOIN pi0
    GROUP BY ranked.nk, ranked.p
    """,
)
def storey_qvalue_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storey adaptive q-values for per-nation urgent-rate anomalies:
    two-sided z-test p-values against the global rate, the null
    proportion pi0 estimated from the p > 0.5 tail (lambda = 0.5),
    and q_i = min over j >= i of pi0 * m * p_(j) / j — the ADAPTIVE
    step that `bh_fdr_nation_urgent` skips (BH fixes pi0 = 1, which
    is conservative exactly when many nations truly deviate).
    q-values are monotone by the running-min construction and
    directly interpretable as per-discovery FDR.

    Determinism: exact counts; the normal CDF is the shared-text
    Zelen-Severo polynomial (same expression tree both engines);
    rank ties break on nation key; rounding at output.

    Scale shape: one 25-group agg, a rank window, and a triangular
    self-join of the tiny p-value relation for the running min.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rates = (
        o.join(
            F.broadcast(
                c.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            )
            .cast("long")
            .alias("k"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    rates = _ckpt(rates)  # shared fan-out relation
    glob = rates.agg((F.sum("k") * 1.0 / F.sum("n")).alias("p0"))
    z = rates.crossJoin(F.broadcast(glob)).select(
        "nk",
        (
            (F.col("k") * 1.0 / F.col("n") - F.col("p0"))
            / F.sqrt(F.col("p0") * (1.0 - F.col("p0")) / F.col("n"))
        ).alias("zst"),
    )
    pv = z.select("nk", (2.0 * F.expr(_STOREY_P)).alias("p"))
    pi0 = pv.agg(
        F.least(
            F.sum(F.when(F.col("p") > 0.5, 1).otherwise(0))
            * 1.0
            / (F.count(F.lit(1)) * 0.5),
            F.lit(1.0),
        ).alias("pi0"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    ranked = pv.select(
        "nk",
        "p",
        F.row_number().over(Window.orderBy("p", "nk")).cast("long").alias("rk"),
    )
    r2 = ranked.select(
        F.col("rk").alias("rk2"), F.col("p").alias("p2")
    )
    return (
        ranked.join(r2, F.col("rk2") >= F.col("rk"))
        .crossJoin(F.broadcast(pi0))
        .groupBy("nk", "p")
        .agg(
            F.round(F.first("p"), 6).alias("p_value"),
            F.round(
                F.least(
                    F.min(
                        F.col("pi0") * F.col("m") * F.col("p2") / F.col("rk2")
                    ),
                    F.lit(1.0),
                ),
                6,
            ).alias("q_value"),
        )
        .select(
            F.col("nk").alias("nation_key"), "p_value", "q_value"
        )
    )


@query("perron_eigenvalue_certified")
def perron_eigenvalue_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perron (largest) eigenvalue of the nonnegative nation trade
    matrix by power iteration (40 steps, sup-norm scaled), CERTIFIED
    by Collatz-Wielandt: for ANY positive vector x, min_i (Ax)_i/x_i
    <= lambda_max <= max_i (Ax)_i/x_i — the bounds are recomputed
    DECLARATIVELY (one matrix-vector join on the emitted vector), so
    the row itself brackets the eigenvalue and the bracket width is
    the convergence proof. The spectral quantity behind epidemic/
    cascade thresholds on this graph (`ic_cascade_reach`,
    `threshold_cascade_trajectory` simulate; 1/lambda_max is their
    critical point) and the matrix-level sibling of
    `power_iteration_top_pc` (covariance spectrum).

    Determinism: integer capacities in millions; fixed 40 iterations
    with sup-norm scaling; certificate arithmetic on the rounded
    micro vector is exact integer ratios compared as doubles.

    Scale shape: matrix collapse = one fact agg; iteration in one
    closure call; the certificate join is |E| rows — the same
    matvec a distributed power iteration would run, used once as a
    checker.
    """
    import pandas as pd

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    flows = (
        l.join(
            F.broadcast(
                s.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")
            ),
            "l_suppkey",
        )
        .join(
            o.select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"),
            "l_orderkey",
        )
        .join(
            F.broadcast(
                c.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .groupBy(
            F.col("s_nationkey").cast("long").alias("u"),
            F.col("c_nationkey").cast("long").alias("v"),
        )
        .agg(
            (
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                / F.lit(1000000)
            )
            .cast("long")
            .alias("w")
        )
        .filter(F.col("w") > 0)
        .withColumn("g", F.lit(1))
        .transform(_ckpt)
    )

    def power(pdf: pd.DataFrame) -> pd.DataFrame:
        nodes = sorted(set(pdf["u"]) | set(pdf["v"]))
        idx = {n_: i for i, n_ in enumerate(nodes)}
        k = len(nodes)
        A = [[0.0] * k for _ in range(k)]
        for _, row in pdf.iterrows():
            A[idx[int(row["u"])]][idx[int(row["v"])]] = float(row["w"])
        x = [1.0] * k
        lam = 0.0
        for _ in range(40):
            y = [sum(A[i][j] * x[j] for j in range(k)) for i in range(k)]
            lam = max(y)
            x = [yi / lam for yi in y]
        return pd.DataFrame(
            {
                "nation_key": nodes,
                "x_micro": [max(int(round(xi * 1000000)), 1) for xi in x],
                "lambda_est": [round(lam, 4)] * k,
            }
        )

    vec = flows.groupBy("g").applyInPandas(
        power, schema="nation_key long, x_micro long, lambda_est double"
    )
    vec = vec.transform(_ckpt)
    # Collatz-Wielandt bounds on the emitted vector
    ax = (
        flows.join(
            vec.select(F.col("nation_key").alias("v"), "x_micro"), "v"
        )
        .groupBy("u")
        .agg(F.sum(F.col("w") * F.col("x_micro")).alias("axu"))
    )
    ratios = ax.join(
        vec.select(F.col("nation_key").alias("u"), F.col("x_micro").alias("xu")),
        "u",
    ).select((F.col("axu") * 1.0 / F.col("xu")).alias("ratio"))
    cw = ratios.agg(
        F.round(F.min("ratio"), 4).alias("cw_lower"),
        F.round(F.max("ratio"), 4).alias("cw_upper"),
    )
    return vec.crossJoin(F.broadcast(cw))


@query(
    "range_partition_splitter_audit",
    oracle="""
    WITH v AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey
        FROM orders
    ), samp AS (
        -- 1-in-64 deterministic hash sample (the splitter sample)
        SELECT cents FROM v
        WHERE (o_orderkey * 2654435761 % 4294967296) % 64 = 0
    ), srt AS (
        SELECT cents,
               CAST(ROW_NUMBER() OVER (ORDER BY cents) AS BIGINT) AS rk,
               CAST(COUNT(*) OVER () AS BIGINT) AS ns
        FROM samp
    ), splitters AS (
        SELECT CAST(k.k AS BIGINT) AS part_id, srt.cents AS cut
        FROM srt,
             LATERAL (SELECT unnest(generate_series(1, 7)) AS k) k
        WHERE srt.rk = (k.k * srt.ns) // 8
    ), assigned AS (
        SELECT v.cents,
               COALESCE((SELECT MIN(part_id) FROM splitters
                         WHERE v.cents <= splitters.cut), 8) AS pid
        FROM v
    ), sizes AS (
        SELECT pid, CAST(COUNT(*) AS BIGINT) AS n FROM assigned
        GROUP BY 1
    ), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM sizes)
    SELECT sizes.pid AS partition_id, sizes.n AS n_rows,
           CAST(tot.n // 8 AS BIGINT) AS ideal_rows,
           CAST((1000000 * sizes.n * 8) // tot.n AS BIGINT)
               AS size_ratio_ppm
    FROM sizes, tot
    """,
)
def range_partition_splitter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioner splitter audit — what Spark's
    RangePartitioner does before every sort, surfaced as a query: a
    1-in-64 deterministic hash sample of order values picks 7
    splitters at the sample octiles, every row is assigned to its
    range partition, and each partition's actual size is compared to
    the ideal n/8 (ppm ratio; 1e6 = perfectly balanced). Sampling
    error here is SKEW in the sort stage — the audit quantifies how
    much a 1.5% sample buys, the practical companion of
    `join_key_skew_report` (pre-existing key skew) and
    `salted_join_order_priority` (the mitigation).

    Determinism: the repo's multiplicative hash picks the sample;
    splitters are exact sample order statistics; assignment is an
    exact comparison against the 7-row broadcast cut list.

    Scale shape: sample + sort of the SAMPLE only (64x smaller), a
    7-row broadcast, one assignment scan with an 8-group agg — the
    exact plan shape of a production range-shuffle planner.
    """
    o = load_table(spark, sf_dir, "orders")
    v = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    from pyspark_movie_recommender_spark.operators.rank import (
        distributed_global_rank,
    )

    samp = v.filter(
        F.expr("(o_orderkey * 2654435761 % 4294967296) % 64 = 0")
    ).select("cents", "o_orderkey")
    ns_cnt = samp.count()
    srt = distributed_global_rank(
        samp, "cents", "o_orderkey", out_col="rk"
    ).select("cents", "rk", F.lit(ns_cnt).cast("long").alias("ns"))
    ks = spark.range(1, 8).select(F.col("id").cast("long").alias("part_id"))
    splitters = srt.crossJoin(F.broadcast(ks)).filter(
        F.col("rk") == F.expr("(part_id * ns) DIV 8")
    ).select("part_id", F.col("cents").alias("cut"))
    assigned = (
        v.crossJoin(F.broadcast(splitters))
        .groupBy("cents", "o_orderkey")
        .agg(
            F.coalesce(
                F.min(
                    F.when(F.col("cents") <= F.col("cut"), F.col("part_id"))
                ),
                F.lit(8),
            ).alias("pid")
        )
    )
    sizes = assigned.groupBy("pid").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    sizes = _ckpt(sizes)  # shared fan-out relation
    tot = sizes.agg(F.sum("n").cast("long").alias("tot"))
    return sizes.crossJoin(F.broadcast(tot)).select(
        F.col("pid").alias("partition_id"),
        F.col("n").alias("n_rows"),
        F.expr("tot DIV 8").cast("long").alias("ideal_rows"),
        F.expr("(1000000 * n * 8) DIV tot").cast("long").alias(
            "size_ratio_ppm"
        ),
    )


@query("top_trading_cycles")
def top_trading_cycles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top Trading Cycles over segment 'licenses': each of the five
    market segments is endowed with its own license, segments rank
    licenses by the revenue they HISTORICALLY make per order when
    paired with that segment's customers... operationally: segment s
    prefers licenses in order of the cross-segment affinity matrix
    (average order value of s-customers in each target segment's top
    nation), and TTC repeatedly clears the top-preference cycles —
    Shapley-Scarf's mechanism, the UNIQUE core allocation of a
    housing market, strategy-proof and individually rational. The
    endowment-economy counterpart of `stable_matching_region_segment`
    (two-sided) and `assignment_optimal_exact` (centralized
    optimum): TTC is what you run when agents already OWN resources.
    Individual rationality (everyone weakly prefers their TTC
    license to their endowment) is pinned by the invariant test from
    the emitted preference ranks.

    Determinism: exact cent affinities with name tie-breaks; cycle
    detection follows top pointers from the smallest unassigned
    segment.

    Scale shape: the affinity matrix is one fact agg; TTC runs in
    one closure call; market sizes in practice are catalog-sized,
    never fact-sized.
    """
    import pandas as pd

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    aff = (
        o.join(
            F.broadcast(
                c.select(
                    F.col("c_custkey").alias("o_custkey"),
                    "c_mktsegment",
                    "c_nationkey",
                )
            ),
            "o_custkey",
        )
        .groupBy(
            F.col("c_mktsegment").alias("owner"),
            (F.col("c_nationkey") % 5).cast("long").alias("lic"),
        )
        .agg(
            F.expr(
                "CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT)"
                " DIV COUNT(*)"
            )
            .cast("long")
            .alias("avg_cents")
        )
        .withColumn("g", F.lit(1))
    )

    def ttc(pdf: pd.DataFrame) -> pd.DataFrame:
        owners = sorted(set(pdf["owner"]))
        lics = sorted(set(int(x) for x in pdf["lic"]))
        # endowment: owner i owns license i (by sorted index)
        endow = {ow: lics[i % len(lics)] for i, ow in enumerate(owners)}
        aff_map = {
            (row["owner"], int(row["lic"])): int(row["avg_cents"])
            for _, row in pdf.iterrows()
        }
        pref = {
            ow: sorted(
                lics, key=lambda lc: (-aff_map.get((ow, lc), 0), lc)
            )
            for ow in owners
        }
        owner_of = {endow[ow]: ow for ow in owners}
        assigned: dict[str, int] = {}
        remaining = set(owners)
        while remaining:
            # follow top-preference pointers to find a cycle
            start = min(remaining)
            path = [start]
            seen = {start}
            while True:
                cur = path[-1]
                top = next(
                    lc for lc in pref[cur]
                    if owner_of.get(lc) in remaining
                )
                nxt = owner_of[top]
                if nxt in seen:
                    # cycle from nxt
                    ci = path.index(nxt)
                    cycle = path[ci:]
                    for ow in cycle:
                        top_lc = next(
                            lc for lc in pref[ow]
                            if owner_of.get(lc) in remaining
                        )
                        assigned[ow] = top_lc
                    for ow in cycle:
                        remaining.discard(ow)
                    break
                path.append(nxt)
                seen.add(nxt)
        rows = []
        for ow in owners:
            lc = assigned[ow]
            rows.append(
                {
                    "owner": ow,
                    "endowment": endow[ow],
                    "ttc_license": lc,
                    "rank_of_assignment": pref[ow].index(lc) + 1,
                    "rank_of_endowment": pref[ow].index(endow[ow]) + 1,
                }
            )
        return pd.DataFrame(rows)

    return aff.groupBy("g").applyInPandas(
        ttc,
        schema=(
            "owner string, endowment long, ttc_license long, "
            "rank_of_assignment long, rank_of_endowment long"
        ),
    )


@query("bankers_algorithm_safety")
def bankers_algorithm_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banker's algorithm safety check on a resource-allocation state
    built from the data: the 10 top-spending customers are
    'processes', their open (non-final-status) order value is the
    ALLOCATION, their historical max order value scaled is the MAX
    CLAIM, and the bank's AVAILABLE pool is 30% of total allocation —
    the classic deadlock-avoidance question 'is this state safe?'
    answered by greedily serving any process whose remaining need
    fits, reclaiming its allocation, and repeating. Output: each
    process with its safe-sequence position (NULL = state unsafe
    beyond this point), plus the safety verdict. The invariant test
    REPLAYS the emitted sequence declaratively — cumulative
    feasibility of the exact emitted order — so the verdict is
    checkable. Completes the systems-theory family
    (`cache_residency_economics`, `lru`/`belady` caching,
    `group_commit_window_audit`) with admission control.

    Determinism: exact cent quantities; the greedy picks the
    smallest-need feasible process each round.

    Scale shape: state extraction is two fact aggs; the safety scan
    is one closure call over 10 processes — admission control states
    are always controller-sized.
    """
    import pandas as pd

    o = load_table(spark, sf_dir, "orders")
    state = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderstatus") != "F",
                    F.round(F.col("o_totalprice") * 100),
                ).otherwise(0)
            )
            .cast("long")
            .alias("alloc"),
            (F.max(F.round(F.col("o_totalprice") * 100)) * 3)
            .cast("long")
            .alias("max_claim"),
        )
        .orderBy(F.desc("alloc"), "o_custkey")
        .limit(10)
        .withColumn("g", F.lit(1))
    )

    def banker(pdf: pd.DataFrame) -> pd.DataFrame:
        procs = [
            (int(r["o_custkey"]), int(r["alloc"]),
             max(int(r["max_claim"]), int(r["alloc"])))
            for _, r in pdf.iterrows()
        ]
        total_alloc = sum(a for _, a, _ in procs)
        avail = (total_alloc * 3) // 10
        remaining = {p: (a, m - a) for p, a, m in procs}
        seq = []
        cur = avail
        while remaining:
            feasible = [
                (need, p) for p, (a, need) in remaining.items()
                if need <= cur
            ]
            if not feasible:
                break
            feasible.sort()
            _, p = feasible[0]
            a, _ = remaining.pop(p)
            cur += a
            seq.append(p)
        pos = {p: i + 1 for i, p in enumerate(seq)}
        return pd.DataFrame(
            {
                "customer_key": [p for p, _, _ in procs],
                "alloc_cents": [a for _, a, _ in procs],
                "need_cents": [m - a for _, a, m in procs],
                "safe_position": [pos.get(p) for p, _, _ in procs],
                "initial_available_cents": [avail] * len(procs),
                "state_safe": [len(seq) == len(procs)] * len(procs),
            }
        )

    return state.groupBy("g").applyInPandas(
        banker,
        schema=(
            "customer_key long, alloc_cents long, need_cents long, "
            "safe_position long, initial_available_cents long, "
            "state_safe boolean"
        ),
    )


@query(
    "cp_rank1_tensor_als",
    oracle="""
    WITH t AS (
        SELECT c.c_nationkey % 5 AS i,
               CASE c.c_mktsegment WHEN 'AUTOMOBILE' THEN 0
                    WHEN 'BUILDING' THEN 1 WHEN 'FURNITURE' THEN 2
                    WHEN 'HOUSEHOLD' THEN 3 ELSE 4 END AS j,
               CAST(EXTRACT(month FROM o.o_orderdate) AS BIGINT) % 4
                   AS k,
               SUM(o.o_totalprice) / 100000.0 AS val
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2, 3
    ), u0 AS (SELECT i, 1.0 AS u FROM (SELECT DISTINCT i FROM t) s),
    v0 AS (SELECT j, 1.0 AS v FROM (SELECT DISTINCT j FROM t) s),
    w0 AS (SELECT k, 1.0 AS w FROM (SELECT DISTINCT k FROM t) s),
    u1 AS MATERIALIZED (
        SELECT t.i, SUM(t.val * v0.v * w0.w)
               / ((SELECT SUM(v * v) FROM v0)
                  * (SELECT SUM(w * w) FROM w0)) AS u
        FROM t JOIN v0 ON v0.j = t.j JOIN w0 ON w0.k = t.k
        GROUP BY t.i
    ), v1 AS MATERIALIZED (
        SELECT t.j, SUM(t.val * u1.u * w0.w)
               / ((SELECT SUM(u * u) FROM u1)
                  * (SELECT SUM(w * w) FROM w0)) AS v
        FROM t JOIN u1 ON u1.i = t.i JOIN w0 ON w0.k = t.k
        GROUP BY t.j
    ), w1 AS MATERIALIZED (
        SELECT t.k, SUM(t.val * u1.u * v1.v)
               / ((SELECT SUM(u * u) FROM u1)
                  * (SELECT SUM(v * v) FROM v1)) AS w
        FROM t JOIN u1 ON u1.i = t.i JOIN v1 ON v1.j = t.j
        GROUP BY t.k
    ), u2 AS MATERIALIZED (
        SELECT t.i, SUM(t.val * v1.v * w1.w)
               / ((SELECT SUM(v * v) FROM v1)
                  * (SELECT SUM(w * w) FROM w1)) AS u
        FROM t JOIN v1 ON v1.j = t.j JOIN w1 ON w1.k = t.k
        GROUP BY t.i
    ), fitn AS (
        SELECT SUM((t.val - u2.u * v1.v * w1.w)
                   * (t.val - u2.u * v1.v * w1.w)) AS sse,
               SUM(t.val * t.val) AS tss
        FROM t
        JOIN u2 ON u2.i = t.i
        JOIN v1 ON v1.j = t.j
        JOIN w1 ON w1.k = t.k
    )
    SELECT u2.i AS nation_mod5,
           ROUND(u2.u, 6) AS u_i,
           CAST(ROUND(1000000 * (1.0 - fitn.sse / fitn.tss)) AS BIGINT)
               AS fit_ppm
    FROM u2, fitn
    """,
)
def cp_rank1_tensor_als(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-1 CP (CANDECOMP/PARAFAC) decomposition of the
    nation x segment x season revenue TENSOR by alternating least
    squares (u, v, w sweeps unrolled: u1, v1, w1, u2): the rank-1
    fit T_ijk ~ u_i v_j w_k is the multiway generalization of the
    SVD's first component — `pca2_price_quantity` factorizes a
    MATRIX; CP factorizes the 3-way array directly, preserving the
    season axis instead of flattening it. The fit_ppm (1 - SSE/TSS)
    is the share of revenue structure captured by a single
    multiplicative profile.

    Determinism: every ALS half-step is a closed-form ratio of sums
    over exact aggregates, evaluated with identical expression trees
    (no normalization/randomness); rounding at output.

    Scale shape: the tensor is one fact agg (i, j, k, val); each ALS
    half-step is one join+agg against two broadcast factor vectors
    — exactly how distributed CP-ALS runs, with the factor vectors
    always dimension-sized.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    seg_code = (
        F.when(F.col("c_mktsegment") == "AUTOMOBILE", 0)
        .when(F.col("c_mktsegment") == "BUILDING", 1)
        .when(F.col("c_mktsegment") == "FURNITURE", 2)
        .when(F.col("c_mktsegment") == "HOUSEHOLD", 3)
        .otherwise(4)
    )
    t = (
        o.join(
            F.broadcast(
                c.select(
                    F.col("c_custkey").alias("o_custkey"),
                    "c_nationkey",
                    "c_mktsegment",
                )
            ),
            "o_custkey",
        )
        .groupBy(
            (F.col("c_nationkey") % 5).alias("i"),
            seg_code.alias("j"),
            (F.month("o_orderdate") % 4).cast("long").alias("k"),
        )
        .agg((F.sum("o_totalprice") / 100000.0).alias("val"))
        .transform(_ckpt)
    )
    u = t.select("i").distinct().withColumn("u", F.lit(1.0))
    v = t.select("j").distinct().withColumn("v", F.lit(1.0))
    w = t.select("k").distinct().withColumn("w", F.lit(1.0))

    def sweep(tgt: str, f1: DataFrame, c1: str, f2: DataFrame, c2: str):
        n1 = f1.agg(F.sum(F.col(c1) * F.col(c1)).alias("n1"))
        n2 = f2.agg(F.sum(F.col(c2) * F.col(c2)).alias("n2"))
        out = (
            t.join(F.broadcast(f1), f1.columns[0])
            .join(F.broadcast(f2), f2.columns[0])
            .groupBy(tgt)
            .agg(F.sum(F.col("val") * F.col(c1) * F.col(c2)).alias("num"))
            .crossJoin(F.broadcast(n1))
            .crossJoin(F.broadcast(n2))
            .select(
                tgt,
                (F.col("num") / (F.col("n1") * F.col("n2"))).alias(
                    "uvw"
                ),
            )
        )
        return out

    u1 = sweep("i", v, "v", w, "w").withColumnRenamed("uvw", "u")
    v1 = sweep("j", u1, "u", w, "w").withColumnRenamed("uvw", "v")
    w1 = sweep("k", u1, "u", v1, "v").withColumnRenamed("uvw", "w")
    u2 = sweep("i", v1, "v", w1, "w").withColumnRenamed("uvw", "u")
    fit = (
        t.join(F.broadcast(u2), "i")
        .join(F.broadcast(v1), "j")
        .join(F.broadcast(w1), "k")
        .agg(
            F.sum(
                (F.col("val") - F.col("u") * F.col("v") * F.col("w"))
                * (F.col("val") - F.col("u") * F.col("v") * F.col("w"))
            ).alias("sse"),
            F.sum(F.col("val") * F.col("val")).alias("tss"),
        )
    )
    return u2.crossJoin(F.broadcast(fit)).select(
        F.col("i").cast("long").alias("nation_mod5"),
        F.round("u", 6).alias("u_i"),
        F.round(1000000 * (1.0 - F.col("sse") / F.col("tss")))
        .cast("long")
        .alias("fit_ppm"),
    )


@query(
    "bullwhip_ratio_monthly",
    oracle="""
    WITH om AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS v
        FROM orders GROUP BY 1
    ), sm AS (
        SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
               CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) AS v
        FROM lineitem GROUP BY 1
    ), ov AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               (SUM(v * 1.0 * v) / COUNT(*)
                - (SUM(v) * 1.0 / COUNT(*))
                  * (SUM(v) * 1.0 / COUNT(*)))
               / ((SUM(v) * 1.0 / COUNT(*))
                  * (SUM(v) * 1.0 / COUNT(*))) AS cv2
        FROM om
    ), sv AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               (SUM(v * 1.0 * v) / COUNT(*)
                - (SUM(v) * 1.0 / COUNT(*))
                  * (SUM(v) * 1.0 / COUNT(*)))
               / ((SUM(v) * 1.0 / COUNT(*))
                  * (SUM(v) * 1.0 / COUNT(*))) AS cv2
        FROM sm
    )
    SELECT ov.n AS n_order_months, sv.n AS n_ship_months,
           ROUND(ov.cv2, 6) AS order_cv2,
           ROUND(sv.cv2, 6) AS ship_cv2,
           ROUND(ov.cv2 / sv.cv2, 4) AS bullwhip_ratio
    FROM ov, sv
    """,
)
def bullwhip_ratio_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bullwhip-effect measurement: the ratio of squared coefficients
    of variation between monthly ORDER demand and monthly SHIPMENT
    flow — the standard supply-chain amplification metric (ratio > 1
    means orders are noisier than the physical flow they drive,
    i.e. upstream echelons absorb variance; < 1 means shipments
    amplify). Joins the inventory family (`base_stock_policy_replay`
    simulates the policy that CAUSES bullwhip; `croston_intermittent_
    demand` forecasts the demand side) with the diagnostic both sides
    are judged by.

    Determinism: exact monthly cents; CV^2 expression trees
    identical; rounding at the end.

    Scale shape: two independent month aggs and scalar moments —
    linear, map-side partials.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    om = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("m")
    ).agg(F.round(F.sum("o_totalprice") * 100).cast("long").alias("v"))
    sm = l.groupBy(
        F.date_trunc("month", "l_shipdate").cast("date").alias("m")
    ).agg(F.round(F.sum("l_extendedprice") * 100).cast("long").alias("v"))
    n_ = F.count(F.lit(1))
    mean_ = F.sum("v") * 1.0 / n_
    cv2_ = (
        F.sum(F.col("v") * 1.0 * F.col("v")) / n_ - mean_ * mean_
    ) / (mean_ * mean_)
    ov = om.agg(n_.cast("long").alias("n"), cv2_.alias("cv2"))
    sv = sm.agg(n_.cast("long").alias("n2"), cv2_.alias("cv2s"))
    return ov.crossJoin(F.broadcast(sv)).select(
        F.col("n").alias("n_order_months"),
        F.col("n2").alias("n_ship_months"),
        F.round("cv2", 6).alias("order_cv2"),
        F.round("cv2s", 6).alias("ship_cv2"),
        F.round(F.col("cv2") / F.col("cv2s"), 4).alias("bullwhip_ratio"),
    )


@query("fictitious_play_minimax")
def fictitious_play_minimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fictitious play on the 2x2 zero-sum game built from the data
    (row player picks URGENT/LOW priority focus, column player picks
    F/O status focus; payoff = mean order cents in that cell): 300
    rounds of best-responding to the opponent's empirical mixture,
    CERTIFIED against the exact closed-form minimax value of the 2x2
    game (saddle point if one exists, otherwise the mixed value
    (ad - bc)/(a + d - b - c)) — Robinson's theorem says FP's value
    estimates converge to it, and the output carries both numbers
    plus the final exploitability. The learning-dynamics member of
    the game family (`hedge_expert_weights` is no-regret vs
    adversary; FP is self-play convergence to equilibrium).

    Determinism: exact cent payoffs; deterministic tie-break (first
    action) in best responses; fixed 300 rounds.

    Scale shape: the game matrix is one fact agg; the replay is one
    closure call; the certificate is closed-form arithmetic.
    """
    import pandas as pd

    o = load_table(spark, sf_dir, "orders")
    cells = (
        o.filter(
            F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
            & F.col("o_orderstatus").isin("F", "O")
        )
        .groupBy(
            F.when(F.col("o_orderpriority") == "1-URGENT", 0)
            .otherwise(1)
            .alias("r"),
            F.when(F.col("o_orderstatus") == "F", 0).otherwise(1).alias(
                "cc"
            ),
        )
        .agg(
            F.expr(
                "CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT)"
                " DIV COUNT(*)"
            )
            .cast("long")
            .alias("pay")
        )
        .withColumn("g", F.lit(1))
    )

    def fp(pdf: pd.DataFrame) -> pd.DataFrame:
        A = [[0.0, 0.0], [0.0, 0.0]]
        for _, row in pdf.iterrows():
            A[int(row["r"])][int(row["cc"])] = float(row["pay"])
        a, b_, c_, d = A[0][0], A[0][1], A[1][0], A[1][1]
        # exact 2x2 zero-sum value
        saddle = None
        row_mins = [min(A[0]), min(A[1])]
        col_maxs = [max(A[0][0], A[1][0]), max(A[0][1], A[1][1])]
        if max(row_mins) == min(col_maxs):
            saddle = max(row_mins)
        if saddle is not None:
            value = saddle
        else:
            value = (a * d - b_ * c_) / (a + d - b_ - c_)
        # fictitious play (row maximizes, column minimizes)
        rc = [0, 0]
        cc2 = [0, 0]
        rc[0] = 1  # initial plays
        cc2[0] = 1
        for _ in range(300):
            # row best response to column empirical mixture
            er = [
                A[i][0] * cc2[0] + A[i][1] * cc2[1] for i in (0, 1)
            ]
            ri = 0 if er[0] >= er[1] else 1
            ec = [
                A[0][j] * rc[0] + A[1][j] * rc[1] for j in (0, 1)
            ]
            ci = 0 if ec[0] <= ec[1] else 1
            rc[ri] += 1
            cc2[ci] += 1
        nr = sum(rc)
        ncol = sum(cc2)
        p = [rc[0] / nr, rc[1] / nr]
        q = [cc2[0] / ncol, cc2[1] / ncol]
        avg_pay = sum(
            A[i][j] * p[i] * q[j] for i in (0, 1) for j in (0, 1)
        )
        # exploitability: best responses against the empirical mixes
        row_br = max(
            A[0][0] * q[0] + A[0][1] * q[1],
            A[1][0] * q[0] + A[1][1] * q[1],
        )
        col_br = min(
            A[0][0] * p[0] + A[1][0] * p[1],
            A[0][1] * p[0] + A[1][1] * p[1],
        )
        return pd.DataFrame(
            {
                "p_urgent_ppm": [int(round(1000000 * p[0]))],
                "q_finished_ppm": [int(round(1000000 * q[0]))],
                "fp_value_cents": [round(avg_pay, 2)],
                "minimax_value_cents": [round(value, 2)],
                "exploitability_cents": [round(row_br - col_br, 2)],
            }
        )

    return cells.groupBy("g").applyInPandas(
        fp,
        schema=(
            "p_urgent_ppm long, q_finished_ppm long, fp_value_cents double,"
            " minimax_value_cents double, exploitability_cents double"
        ),
    )


@query(
    "garp_consistency_audit",
    oracle="""
    WITH RECURSIVE q AS (
        -- per quarter-of-year: 'prices' = avg part price, 'bundle' =
        -- quantities per type-group
        SELECT CAST(EXTRACT(quarter FROM o.o_orderdate) AS BIGINT) AS t,
               p.p_partkey % 4 AS good,
               SUM(CAST(l.l_quantity AS BIGINT)) AS qty,
               SUM(l.l_extendedprice) / SUM(CAST(l.l_quantity AS BIGINT))
                   AS price
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ), spend AS (
        -- cost of bundle j at prices of period i
        SELECT a.t AS ti, b.t AS tj,
               SUM(a.price * b.qty) AS cost_ij
        FROM q a JOIN q b ON b.good = a.good
        GROUP BY 1, 2
    ), direct AS (
        -- i directly revealed preferred to j: bundle j was affordable
        -- at i's prices/spend
        SELECT s.ti AS i, s.tj AS j
        FROM spend s JOIN spend own
          ON own.ti = s.ti AND own.tj = s.ti
        WHERE s.ti <> s.tj AND s.cost_ij <= own.cost_ij
    ), closure(i, j) AS (
        SELECT i, j FROM direct
        UNION
        SELECT c.i, d.j FROM closure c JOIN direct d ON d.i = c.j
    ), strict_rev AS (
        -- j strictly cheaper than own bundle at j's prices
        SELECT s.ti AS i, s.tj AS j
        FROM spend s JOIN spend own
          ON own.ti = s.ti AND own.tj = s.ti
        WHERE s.ti <> s.tj AND s.cost_ij < own.cost_ij
    ), violations AS (
        SELECT c.i, c.j FROM closure c
        JOIN strict_rev sr ON sr.i = c.j AND sr.j = c.i
    )
    SELECT CAST((SELECT COUNT(*) FROM q) / 4 AS BIGINT) AS n_periods,
           CAST((SELECT COUNT(*) FROM direct) AS BIGINT)
               AS n_direct_relations,
           CAST((SELECT COUNT(*) FROM closure) AS BIGINT)
               AS n_closure_relations,
           CAST((SELECT COUNT(*) FROM violations) AS BIGINT)
               AS n_garp_violations
    """,
)
def garp_consistency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GARP (Generalized Axiom of Revealed Preference) consistency
    audit: the four quarters-of-year act as observed choices (bundle
    = quantities over 4 part groups, prices = per-group average), i
    is revealed preferred to j when j's bundle was affordable at i's
    prices, and Afriat's theorem says the data is consistent with
    ANY utility maximization iff the transitive closure of revealed
    preference contains no cycle through a STRICT reversal —
    violations counted here. The microfoundation audit under the
    demand queries (`price_elasticity_loglog`,
    `cross_price_elasticity`, `consumer_surplus_estimate` all ASSUME
    a rational demander; GARP tests it).

    Determinism: exact quantities; cost matrices from identical
    expression trees; the closure is a recursive CTE vs the engine's
    iterated-join closure (same fixpoint).

    Scale shape: a 16-cell bundle/price relation, a 4x4 cost matrix,
    and a transitive closure on <= 12 edges; per-household GARP at
    scale keys every step by household.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    q = (
        l.join(
            o.select(F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"),
            "l_orderkey",
        )
        .join(
            F.broadcast(p.select(F.col("p_partkey").alias("l_partkey"))),
            "l_partkey",
        )
        .groupBy(
            F.quarter("o_orderdate").cast("long").alias("t"),
            (F.col("l_partkey") % 4).alias("good"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
            (
                F.sum("l_extendedprice")
                / F.sum(F.col("l_quantity").cast("long"))
            ).alias("price"),
        )
        .transform(_ckpt)
    )
    a, b = q.alias("a"), q.alias("b")
    spend = (
        a.join(b, F.col("b.good") == F.col("a.good"))
        .groupBy(F.col("a.t").alias("ti"), F.col("b.t").alias("tj"))
        .agg(F.sum(F.col("a.price") * F.col("b.qty")).alias("cost_ij"))
    )
    own = spend.filter(F.col("ti") == F.col("tj")).select(
        F.col("ti").alias("oi"), F.col("cost_ij").alias("own_cost")
    )
    rel = spend.join(own, F.col("ti") == F.col("oi")).filter(
        F.col("ti") != F.col("tj")
    )
    direct = rel.filter(F.col("cost_ij") <= F.col("own_cost")).select(
        F.col("ti").alias("i"), F.col("tj").alias("j")
    ).transform(_ckpt)
    strict_rev = rel.filter(F.col("cost_ij") < F.col("own_cost")).select(
        F.col("ti").alias("i"), F.col("tj").alias("j")
    )
    closure = direct
    for _ in range(3):
        hop = (
            closure.alias("c")
            .join(direct.alias("d"), F.col("d.i") == F.col("c.j"))
            .select(F.col("c.i").alias("i"), F.col("d.j").alias("j"))
        )
        closure = closure.unionByName(hop).distinct().transform(_ckpt)
    violations = closure.alias("c").join(
        strict_rev.alias("sr"),
        (F.col("sr.i") == F.col("c.j")) & (F.col("sr.j") == F.col("c.i")),
    )
    n_periods = q.select("t").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_periods")
    )
    nd = direct.agg(F.count(F.lit(1)).cast("long").alias("n_direct_relations"))
    ncl = closure.agg(
        F.count(F.lit(1)).cast("long").alias("n_closure_relations")
    )
    nv = violations.agg(
        F.count(F.lit(1)).cast("long").alias("n_garp_violations")
    )
    return (
        n_periods.crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(ncl))
        .crossJoin(F.broadcast(nv))
    )


def _pl_mm_oracle(n_iter: int) -> str:
    """Unrolled Plackett-Luce MM iterations (Hunter 2004): lambda_i =
    w_i / sum over rankings and positions of (indicator i still in
    the choice set at position p) / (sum of lambdas in that set)."""
    steps = []
    for it in range(1, n_iter + 1):
        steps.append(
            f"""den{it} AS MATERIALIZED (
        SELECT cs.nk,
               SUM(1.0 / cs.setsum) AS d
        FROM (
            SELECT m.m, pos.p, alt.nk,
                   SUM(l{it - 1}.lam) OVER (PARTITION BY m.m, pos.p)
                       AS setsum
            FROM ranks m
            JOIN (SELECT 1 AS p UNION ALL SELECT 2 UNION ALL SELECT 3)
                pos ON pos.p <= 3
            JOIN ranks alt ON alt.m = m.m AND alt.rk >= pos.p
            JOIN l{it - 1} ON l{it - 1}.nk = alt.nk
            WHERE m.rk = 1
        ) cs
        GROUP BY cs.nk
    ), l{it} AS MATERIALIZED (
        SELECT w.nk, w.w / den{it}.d AS lam
        FROM wins w JOIN den{it} ON den{it}.nk = w.nk
    )"""
        )
    return f"""
    WITH mon AS (
        SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS m,
               c.c_nationkey AS nk,
               CAST(ROUND(SUM(o.o_totalprice) * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_nationkey < 5
        GROUP BY 1, 2
    ), ranks AS MATERIALIZED (
        SELECT m, nk,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY m ORDER BY cents DESC, nk) AS BIGINT)
                   AS rk
        FROM mon
    ), wins AS MATERIALIZED (
        SELECT nk, CAST(SUM(CASE WHEN rk <= 3 THEN 1 ELSE 0 END)
                   AS BIGINT) AS w
        FROM ranks GROUP BY nk
    ), l0 AS MATERIALIZED (
        SELECT nk, 1.0 AS lam FROM wins
    ), {", ".join(steps)},
    norm AS (SELECT SUM(lam) AS z FROM l{n_iter})
    SELECT l{n_iter}.nk AS nation_key, wins.w AS n_top3,
           CAST(ROUND(1000000 * l{n_iter}.lam / norm.z) AS BIGINT)
               AS pl_strength_ppm
    FROM l{n_iter} JOIN wins ON wins.nk = l{n_iter}.nk, norm
    """


@query("plackett_luce_mm", oracle=_pl_mm_oracle(3))
def plackett_luce_mm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plackett-Luce ranking model fitted by 3 MM iterations (Hunter's
    minorize-maximize updates) to the monthly top-3 finishing orders
    of nations 0-4 (each month is one observed partial ranking):
    lambda_i <- w_i / sum over choice sets containing i of
    1/(set lambda sum). The FULL-RANKING generalization of
    `bradley_terry_priorities` (pairwise) and the static counterpart
    of `elo_rating_replay` (sequential): PL models each position as a
    softmax choice among the remaining items, which is also the
    listwise learning-to-rank likelihood.

    Determinism: exact cent standings; fixed iteration count with
    identical expression trees (window set-sums accumulate over the
    same ordered frames); ppm normalization at output.

    Scale shape: standings collapse to month x 5; each MM iteration
    is a join + window + agg over the tiny ranking relation —
    iteration count is the only loop, and it is unrolled in both
    engines.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    mon = (
        o.join(
            F.broadcast(
                c.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .filter(F.col("c_nationkey") < 5)
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("m"),
            F.col("c_nationkey").alias("nk"),
        )
        .agg(F.round(F.sum("o_totalprice") * 100).cast("long").alias("cents"))
    )
    ranks = mon.select(
        "m",
        "nk",
        F.row_number()
        .over(Window.partitionBy("m").orderBy(F.desc("cents"), "nk"))
        .cast("long")
        .alias("rk"),
    ).transform(_ckpt)
    wins = ranks.groupBy("nk").agg(
        F.sum(F.when(F.col("rk") <= 3, 1).otherwise(0))
        .cast("long")
        .alias("w")
    )
    pos = spark.range(1, 4).select(F.col("id").cast("long").alias("p"))
    lam = wins.select("nk", F.lit(1.0).alias("lam"))
    for _ in range(3):
        cs = (
            ranks.filter(F.col("rk") == 1)
            .select("m")
            .crossJoin(F.broadcast(pos))
            .join(
                ranks.select("m", F.col("nk").alias("ank"), "rk"), "m"
            )
            .filter(F.col("rk") >= F.col("p"))
            .join(
                F.broadcast(lam.select(F.col("nk").alias("ank"), "lam")),
                "ank",
            )
            .withColumn(
                "setsum",
                F.sum("lam").over(Window.partitionBy("m", "p")),
            )
        )
        den = cs.groupBy(F.col("ank").alias("nk")).agg(
            F.sum(1.0 / F.col("setsum")).alias("d")
        )
        lam = wins.join(den, "nk").select(
            "nk", (F.col("w") / F.col("d")).alias("lam")
        )
        lam = lam.transform(_ckpt)
    norm = lam.agg(F.sum("lam").alias("z"))
    return (
        lam.join(wins, "nk")
        .crossJoin(F.broadcast(norm))
        .select(
            F.col("nk").alias("nation_key"),
            F.col("w").alias("n_top3"),
            F.round(1000000 * F.col("lam") / F.col("z"))
            .cast("long")
            .alias("pl_strength_ppm"),
        )
    )


@query(
    "triad_man_census",
    oracle="""
    WITH flows AS (
        SELECT s.s_nationkey AS u, c.c_nationkey AS v
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE s.s_nationkey <> c.c_nationkey
        GROUP BY 1, 2
        HAVING SUM(ROUND(l.l_extendedprice * 100)) >= 300000000
    ), nodes AS (
        SELECT DISTINCT n FROM (
            SELECT u AS n FROM flows UNION SELECT v FROM flows) t
    ), arcs AS (
        SELECT u, v, 1 AS e FROM flows
    ), dyads AS (
        SELECT a.n AS x, b.n AS y,
               CAST(COALESCE(f1.e, 0) + COALESCE(f2.e, 0) AS BIGINT)
                   AS st
        FROM nodes a
        JOIN nodes b ON b.n > a.n
        LEFT JOIN arcs f1 ON f1.u = a.n AND f1.v = b.n
        LEFT JOIN arcs f2 ON f2.u = b.n AND f2.v = a.n
    ), triads AS (
        SELECT d1.st AS s1, d2.st AS s2, d3.st AS s3
        FROM dyads d1
        JOIN dyads d2 ON d2.x = d1.x AND d2.y > d1.y
        JOIN dyads d3 ON d3.x = d1.y AND d3.y = d2.y
    )
    SELECT CAST(SUM(CASE WHEN s1 = 2 THEN 1 ELSE 0 END)
              + SUM(CASE WHEN s2 = 2 THEN 1 ELSE 0 END)
              + SUM(CASE WHEN s3 = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_mutual_dyad_slots,
           CAST(COUNT(*) AS BIGINT) AS n_triads,
           CAST(SUM(CASE WHEN s1 + s2 + s3 = 6 THEN 1 ELSE 0 END)
                AS BIGINT) AS t_300,
           CAST(SUM(CASE WHEN s1 + s2 + s3 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS t_003,
           CAST(SUM(CASE WHEN GREATEST(s1, s2, s3) <= 1
                     AND s1 + s2 + s3 = 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS t_all_asym,
           CAST(SUM(CASE WHEN s1 = 2 AND s2 = 2 AND s3 = 2
                THEN 0 ELSE 0 END)
              + SUM(CASE WHEN (CASE WHEN s1 = 2 THEN 1 ELSE 0 END
                             + CASE WHEN s2 = 2 THEN 1 ELSE 0 END
                             + CASE WHEN s3 = 2 THEN 1 ELSE 0 END) = 2
                    THEN 1 ELSE 0 END) AS BIGINT) AS t_two_mutual
    FROM triads
    """,
)
def triad_man_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triad MAN census (mutual/asymmetric/null dyad composition) of
    the thresholded directed trade graph: every node triple is
    classified by its three dyad states, counting the fully-mutual
    (300), empty (003), all-asymmetric, and two-mutual triad classes
    plus the mutual-dyad-slot total — the Holland-Leinhardt census
    that quantifies hierarchy vs clustering vs reciprocity at the
    TRIPLE level, one rung above `trade_reciprocity_asymmetry` (dyad
    census) and the directed complement of
    `local_clustering_coefficient` / `triangle_count_copurchase`
    (undirected closure).

    Determinism: integer revenue threshold picks the arcs; dyad
    states are exact indicator sums; every count integer.

    Scale shape: dyad states come from one pair join with two arc
    lookups (node-dimension sized); the triple enumeration is a
    3-way self-join of the dyad relation ordered x < y < z — the
    standard triad-census join, cubic only in the NODE count.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    flows = (
        l.join(
            F.broadcast(
                s.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")
            ),
            "l_suppkey",
        )
        .join(
            o.select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"),
            "l_orderkey",
        )
        .join(
            F.broadcast(
                c.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").cast("long").alias("u"),
            F.col("c_nationkey").cast("long").alias("v"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "cap"
            )
        )
        .filter(F.col("cap") >= 300000000)
        .select("u", "v")
        .transform(_ckpt)
    )
    nodes = (
        flows.select(F.col("u").alias("n"))
        .unionByName(flows.select(F.col("v").alias("n")))
        .distinct()
    )
    a, b = nodes.alias("a"), nodes.alias("b")
    f1 = flows.select(
        F.col("u").alias("x1"), F.col("v").alias("y1"), F.lit(1).alias("e1")
    )
    f2 = flows.select(
        F.col("v").alias("x2"), F.col("u").alias("y2"), F.lit(1).alias("e2")
    )
    dyads = (
        a.join(b, F.col("b.n") > F.col("a.n"))
        .select(F.col("a.n").alias("x"), F.col("b.n").alias("y"))
        .join(
            F.broadcast(f1),
            (F.col("x") == F.col("x1")) & (F.col("y") == F.col("y1")),
            "left",
        )
        .join(
            F.broadcast(f2),
            (F.col("x") == F.col("x2")) & (F.col("y") == F.col("y2")),
            "left",
        )
        .select(
            "x",
            "y",
            (
                F.coalesce("e1", F.lit(0)) + F.coalesce("e2", F.lit(0))
            )
            .cast("long")
            .alias("st"),
        )
        .transform(_ckpt)
    )
    d1, d2, d3 = dyads.alias("d1"), dyads.alias("d2"), dyads.alias("d3")
    triads = (
        d1.join(
            d2,
            (F.col("d2.x") == F.col("d1.x"))
            & (F.col("d2.y") > F.col("d1.y")),
        )
        .join(
            d3,
            (F.col("d3.x") == F.col("d1.y"))
            & (F.col("d3.y") == F.col("d2.y")),
        )
        .select(
            F.col("d1.st").alias("s1"),
            F.col("d2.st").alias("s2"),
            F.col("d3.st").alias("s3"),
        )
    )
    is_m = lambda cc: F.when(F.col(cc) == 2, 1).otherwise(0)  # noqa: E731
    return triads.agg(
        (F.sum(is_m("s1")) + F.sum(is_m("s2")) + F.sum(is_m("s3")))
        .cast("long")
        .alias("n_mutual_dyad_slots"),
        F.count(F.lit(1)).cast("long").alias("n_triads"),
        F.sum(
            F.when(F.col("s1") + F.col("s2") + F.col("s3") == 6, 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("t_300"),
        F.sum(
            F.when(F.col("s1") + F.col("s2") + F.col("s3") == 0, 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("t_003"),
        F.sum(
            F.when(
                (F.greatest("s1", "s2", "s3") <= 1)
                & (F.col("s1") + F.col("s2") + F.col("s3") == 3),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("t_all_asym"),
        F.sum(
            F.when(
                is_m("s1") + is_m("s2") + is_m("s3") == 2, 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("t_two_mutual"),
    )


_UCC_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderdate"]


def _ucc_oracle() -> str:
    parts = []
    n_rows = "(SELECT COUNT(*) FROM orders)"
    for i, c1 in enumerate(_UCC_COLS):
        parts.append(
            f"""    SELECT '{c1}' AS columns, 1 AS width,
           CAST(COUNT(DISTINCT {c1}) AS BIGINT) AS n_distinct,
           CAST({n_rows} AS BIGINT) AS n_rows,
           CAST(CASE WHEN COUNT(DISTINCT {c1}) = {n_rows}
                THEN 1 ELSE 0 END AS BIGINT) AS is_unique
    FROM orders"""
        )
    for i, c1 in enumerate(_UCC_COLS):
        for c2 in _UCC_COLS[i + 1:]:
            parts.append(
                f"""    SELECT '{c1},{c2}', 2,
           CAST(COUNT(DISTINCT ({c1}, {c2})) AS BIGINT),
           CAST({n_rows} AS BIGINT),
           CAST(CASE WHEN COUNT(DISTINCT ({c1}, {c2})) = {n_rows}
                THEN 1 ELSE 0 END AS BIGINT)
    FROM orders"""
            )
    return ("\n    UNION ALL\n".join(parts))


@query("minimal_key_discovery", oracle=_ucc_oracle())
def minimal_key_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unique-column-combination (candidate key) discovery over five
    orders columns: every 1- and 2-column combination is tested for
    exact uniqueness by distinct counting — the data-profiling
    primitive (HyUCC family) behind automatic primary-key inference,
    dedup-key selection, and join-key validation, completing the
    profiling suite (`inclusion_dependency_discovery` finds FOREIGN
    keys, `functional_dependency_audit` finds FDs, this finds KEYS).
    Minimality is decidable from the output: a 2-column UCC is
    minimal iff neither member column is unique alone (the invariant
    test checks the lattice rule).

    Determinism: exact distinct counts, integer comparisons.

    Scale shape: each candidate is one distinct-count agg with
    map-side partial aggregation (tuple-hash for pairs); candidates
    evaluate independently in one union of small plans — the
    lattice-pruned search at 100 TB runs exactly these aggs, fewest
    first.
    """
    o = load_table(spark, sf_dir, "orders")
    # 15 candidate combinations each run a distinct-count aggregate;
    # materialize the 5-column projection once so the union of plans
    # reads executor-local blocks instead of re-scanning orders 15x
    op = _ckpt(o.select(*_UCC_COLS))
    n = op.count()
    out = None
    combos = [(c1,) for c1 in _UCC_COLS] + [
        (c1, c2)
        for i, c1 in enumerate(_UCC_COLS)
        for c2 in _UCC_COLS[i + 1:]
    ]
    for cols in combos:
        row = op.agg(
            F.lit(",".join(cols)).alias("columns"),
            F.lit(len(cols)).alias("width"),
            F.countDistinct(*cols).cast("long").alias("n_distinct"),
            F.lit(n).cast("long").alias("n_rows"),
        ).withColumn(
            "is_unique",
            F.when(F.col("n_distinct") == F.col("n_rows"), 1)
            .otherwise(0)
            .cast("long"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@query(
    "fisher_exact_enrichment",
    oracle="""
    WITH cell AS (
        SELECT CAST(SUM(CASE WHEN l_returnflag = 'R'
                        AND l_quantity >= 45 THEN 1 ELSE 0 END)
                    AS BIGINT) AS a,
               CAST(SUM(CASE WHEN l_returnflag = 'R'
                        AND l_quantity < 45 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b,
               CAST(SUM(CASE WHEN l_returnflag <> 'R'
                        AND l_quantity >= 45 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c,
               CAST(SUM(CASE WHEN l_returnflag <> 'R'
                        AND l_quantity < 45 THEN 1 ELSE 0 END)
                    AS BIGINT) AS d
        FROM lineitem WHERE l_partkey % 200 = 0
    ), lf AS (
        SELECT CAST(g.i AS BIGINT) AS i,
               SUM(LN(g.i)) OVER (ORDER BY g.i) AS lnf
        FROM (SELECT unnest(generate_series(1,
                  (SELECT CAST(a + b + c + d AS INT) FROM cell))) AS i) g
    ), lnfact AS (
        SELECT i, lnf FROM lf UNION ALL SELECT 0, 0.0
    ), tail AS (
        -- one-tailed (enrichment): P(X >= a) for hypergeometric with
        -- margins fixed
        SELECT cell.a, cell.b, cell.c, cell.d,
               SUM(EXP(r1.lnf + r2.lnf + c1.lnf + c2.lnf
                       - nn.lnf - xa.lnf - xb.lnf - xc.lnf - xd.lnf))
                   AS p
        FROM cell,
             LATERAL (SELECT unnest(generate_series(
                 CAST(cell.a AS INT),
                 CAST(LEAST(cell.a + cell.b, cell.a + cell.c) AS INT)))
                 AS x) xs
        JOIN lnfact r1 ON r1.i = cell.a + cell.b
        JOIN lnfact r2 ON r2.i = cell.c + cell.d
        JOIN lnfact c1 ON c1.i = cell.a + cell.c
        JOIN lnfact c2 ON c2.i = cell.b + cell.d
        JOIN lnfact nn ON nn.i = cell.a + cell.b + cell.c + cell.d
        JOIN lnfact xa ON xa.i = xs.x
        JOIN lnfact xb ON xb.i = cell.a + cell.b - xs.x
        JOIN lnfact xc ON xc.i = cell.a + cell.c - xs.x
        JOIN lnfact xd ON xd.i = cell.d - cell.a + xs.x
        GROUP BY 1, 2, 3, 4
    )
    SELECT a AS n_ret_heavy, b AS n_ret_light,
           c AS n_ok_heavy, d AS n_ok_light,
           ROUND(p, 8) AS fisher_one_tail_p
    FROM tail
    """,
)
def fisher_exact_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's EXACT one-tailed enrichment test on a small 2x2 table
    (returned-flag x heavy-quantity for a 1-in-200 part sample):
    P(X >= a) under the hypergeometric null with margins fixed,
    evaluated by log-factorial sums — the small-sample exact test
    that `chi2_drift_events` / `cramers_v_priority_status`
    approximate and `bayes_factor_urgent_rates` treats in Bayesian
    form; at cell counts this size the chi-square approximation is
    unreliable and Fisher is the standard. The tail enumerates every
    at-least-as-extreme table.

    Determinism: exact counts; a shared log-factorial prefix table;
    the tail sum adds terms in x order on both engines; one rounding.

    Scale shape: one filtered agg to 4 cells, an O(n)-row lnfact
    prefix window, and a tail ladder of at most min(row, col) terms.
    """
    l = load_table(spark, sf_dir, "lineitem")
    cell = l.filter(F.col("l_partkey") % 200 == 0).agg(
        F.sum(
            F.when(
                (F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 45),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("a"),
        F.sum(
            F.when(
                (F.col("l_returnflag") == "R") & (F.col("l_quantity") < 45),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("b"),
        F.sum(
            F.when(
                (F.col("l_returnflag") != "R") & (F.col("l_quantity") >= 45),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("c"),
        F.sum(
            F.when(
                (F.col("l_returnflag") != "R") & (F.col("l_quantity") < 45),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("d"),
    )
    cell = _ckpt(cell)  # shared fan-out relation
    tot = cell.select(
        (F.col("a") + F.col("b") + F.col("c") + F.col("d")).alias("t")
    )
    lf = tot.select(
        F.explode(F.sequence(F.lit(1), F.col("t"))).alias("i")
    ).select(
        F.col("i").cast("long").alias("i"),
        F.sum(F.log("i")).over(Window.orderBy("i")).alias("lnf"),
    )
    lnfact = lf.unionByName(
        tot.select(F.lit(0).cast("long").alias("i"), F.lit(0.0).alias("lnf"))
    )
    xs = cell.select(
        "a",
        "b",
        "c",
        "d",
        F.explode(
            F.sequence(
                F.col("a"),
                F.least(F.col("a") + F.col("b"), F.col("a") + F.col("c")),
            )
        ).alias("x"),
    )

    def lk(nm, expr_):
        return (
            lnfact.select(
                F.col("i").alias(f"{nm}_i"), F.col("lnf").alias(nm)
            ),
            expr_,
        )

    joins = [
        lk("r1", F.col("a") + F.col("b")),
        lk("r2", F.col("c") + F.col("d")),
        lk("c1", F.col("a") + F.col("c")),
        lk("c2", F.col("b") + F.col("d")),
        lk("nn", F.col("a") + F.col("b") + F.col("c") + F.col("d")),
        lk("xa", F.col("x")),
        lk("xb", F.col("a") + F.col("b") - F.col("x")),
        lk("xc", F.col("a") + F.col("c") - F.col("x")),
        lk("xd", F.col("d") - F.col("a") + F.col("x")),
    ]
    terms = xs
    for (jdf, expr_), nm in zip(
        joins, ["r1", "r2", "c1", "c2", "nn", "xa", "xb", "xc", "xd"]
    ):
        terms = terms.join(F.broadcast(jdf), expr_ == F.col(f"{nm}_i"))
    p = F.sum(
        F.exp(
            F.col("r1")
            + F.col("r2")
            + F.col("c1")
            + F.col("c2")
            - F.col("nn")
            - F.col("xa")
            - F.col("xb")
            - F.col("xc")
            - F.col("xd")
        )
    )
    return terms.groupBy("a", "b", "c", "d").agg(
        F.round(p, 8).alias("fisher_one_tail_p")
    ).select(
        F.col("a").alias("n_ret_heavy"),
        F.col("b").alias("n_ret_light"),
        F.col("c").alias("n_ok_heavy"),
        F.col("d").alias("n_ok_light"),
        "fisher_one_tail_p",
    )


@query(
    "process_conformance_audit",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t1,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t2,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t3,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t4
        FROM events GROUP BY 1
    ), marks AS (
        SELECT user_id,
               CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS s1,
               CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL
                    AND t2 > t1 THEN 1 ELSE 0 END AS s2,
               CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL
                    AND t2 > t1 AND t3 IS NOT NULL AND t3 > t2
                    THEN 1 ELSE 0 END AS s3,
               CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL
                    AND t2 > t1 AND t3 IS NOT NULL AND t3 > t2
                    AND t4 IS NOT NULL AND t4 > t3 THEN 1 ELSE 0 END
                   AS s4
        FROM firsts
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_traces,
           CAST(SUM(s1) AS BIGINT) AS reach_signup,
           CAST(SUM(s2) AS BIGINT) AS reach_view_after,
           CAST(SUM(s3) AS BIGINT) AS reach_click_after,
           CAST(SUM(s4) AS BIGINT) AS fully_conformant,
           CAST((1000000 * SUM(s4)) // COUNT(*) AS BIGINT)
               AS conformance_ppm,
           CAST(ROUND(1000000.0 * SUM(s1 + s2 + s3 + s4)
                / (4.0 * COUNT(*))) AS BIGINT) AS avg_fitness_ppm
    FROM marks
    """,
)
def process_conformance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-mining conformance check of user traces against the
    canonical funnel model signup -> view -> click -> purchase: for
    each user, the FIRST occurrence times of the four activities must
    be strictly ordered prefix-wise (a token-replay fitness where
    each satisfied step earns a quarter) — reporting the stepwise
    reach counts, the fully-conformant trace share, and average
    fitness. The conformance layer of the process family:
    `event_funnel_ordered` counts the happy path,
    `journey_variant_census` enumerates observed variants,
    `event_transition_matrix` gives the directly-follows graph —
    conformance scores traces AGAINST A MODEL, which is the process-
    mining question auditors ask.

    Determinism: MIN timestamps are exact; all outputs integer
    ratios.

    Scale shape: one conditional-MIN agg per user (single shuffle),
    then scalar aggregation — fitness at any scale is exactly this
    two-agg pipeline.
    """
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t1"
        ),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t2"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t3"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t4"
        ),
    )
    s1 = F.when(F.col("t1").isNotNull(), 1).otherwise(0)
    s2 = F.when(
        F.col("t1").isNotNull()
        & F.col("t2").isNotNull()
        & (F.col("t2") > F.col("t1")),
        1,
    ).otherwise(0)
    s3 = F.when(
        F.col("t1").isNotNull()
        & F.col("t2").isNotNull()
        & (F.col("t2") > F.col("t1"))
        & F.col("t3").isNotNull()
        & (F.col("t3") > F.col("t2")),
        1,
    ).otherwise(0)
    s4 = F.when(
        F.col("t1").isNotNull()
        & F.col("t2").isNotNull()
        & (F.col("t2") > F.col("t1"))
        & F.col("t3").isNotNull()
        & (F.col("t3") > F.col("t2"))
        & F.col("t4").isNotNull()
        & (F.col("t4") > F.col("t3")),
        1,
    ).otherwise(0)
    marks = firsts.select(
        s1.alias("s1"), s2.alias("s2"), s3.alias("s3"), s4.alias("s4")
    )
    return marks.agg(
        F.count(F.lit(1)).cast("long").alias("n_traces"),
        F.sum("s1").cast("long").alias("reach_signup"),
        F.sum("s2").cast("long").alias("reach_view_after"),
        F.sum("s3").cast("long").alias("reach_click_after"),
        F.sum("s4").cast("long").alias("fully_conformant"),
        F.expr("(1000000 * SUM(s4)) DIV COUNT(*)")
        .cast("long")
        .alias("conformance_ppm"),
        F.round(
            1000000.0
            * F.sum(F.col("s1") + F.col("s2") + F.col("s3") + F.col("s4"))
            / (4.0 * F.count(F.lit(1)))
        )
        .cast("long")
        .alias("avg_fitness_ppm"),
    )


@query(
    "dixon_q_outlier",
    oracle="""
    WITH top10 AS (
        SELECT seg, cents, rk FROM (
            SELECT c.c_mktsegment AS seg,
                   CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.c_mktsegment
                       ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey) t
        WHERE rk <= 10
    )
    SELECT seg AS segment,
           MAX(CASE WHEN rk = 1 THEN cents END) AS x1,
           MAX(CASE WHEN rk = 2 THEN cents END) AS x2,
           MAX(CASE WHEN rk = 10 THEN cents END) AS x10,
           ROUND((MAX(CASE WHEN rk = 1 THEN cents END)
                  - MAX(CASE WHEN rk = 2 THEN cents END)) * 1.0
                 / (MAX(CASE WHEN rk = 1 THEN cents END)
                    - MAX(CASE WHEN rk = 10 THEN cents END)), 6)
               AS q_statistic,
           CAST(CASE WHEN (MAX(CASE WHEN rk = 1 THEN cents END)
                  - MAX(CASE WHEN rk = 2 THEN cents END)) * 1.0
                 / (MAX(CASE WHEN rk = 1 THEN cents END)
                    - MAX(CASE WHEN rk = 10 THEN cents END)) > 0.412
                THEN 1 ELSE 0 END AS BIGINT) AS outlier_5pct
    FROM top10
    GROUP BY seg
    """,
)
def dixon_q_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dixon's Q test on each segment's ten largest orders: Q = (gap
    between the largest and second-largest) / (range of the top ten),
    compared to the n = 10, 5% critical value 0.412 — the
    SMALL-SAMPLE outlier test (the only valid choice when n <= ~30,
    where `grubbs_daily_revenue_outlier` and `generalized_esd_daily`
    lean on normal-theory moments that ten points cannot support).
    Flags segments whose single biggest order is suspiciously
    detached from its peers.

    Determinism: exact cent order statistics with key tie-breaks;
    one rounded ratio per segment.

    Scale shape: per-group top-10 via WindowGroupLimit-prunable rank,
    then a 5-group pivot agg — the fact table is scanned once.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    top10 = (
        o.join(
            F.broadcast(
                c.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
            ),
            "o_custkey",
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            F.row_number()
            .over(
                Window.partitionBy("c_mktsegment").orderBy(
                    F.desc("o_totalprice"), "o_orderkey"
                )
            )
            .alias("rk"),
        )
        .filter(F.col("rk") <= 10)
    )
    x1 = F.max(F.when(F.col("rk") == 1, F.col("cents")))
    x2 = F.max(F.when(F.col("rk") == 2, F.col("cents")))
    x10 = F.max(F.when(F.col("rk") == 10, F.col("cents")))
    q = (x1 - x2) * 1.0 / (x1 - x10)
    return top10.groupBy(F.col("seg").alias("segment")).agg(
        x1.alias("x1"),
        x2.alias("x2"),
        x10.alias("x10"),
        F.round(q, 6).alias("q_statistic"),
        F.when(q > 0.412, 1).otherwise(0).cast("long").alias(
            "outlier_5pct"
        ),
    )


@query("cheeger_conductance_chain")
def cheeger_conductance_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conductance (Cheeger constant) of the event-type Markov chain:
    the stationary distribution is solved EXACTLY over rationals
    (pi P = pi, sum pi = 1), then Phi = min over the 2^5 - 2 proper
    state subsets of Q(S, S^c) / min(pi(S), pi(S^c)) — with the
    minimizing subset enumerated DECLARATIVELY by a bitmask grid join
    against the transition flows, so the reported cut is auditable
    row by row. Cheeger's inequality Phi^2/2 <= 1 - lambda_2 <= 2 Phi
    then brackets the chain's spectral gap — the mixing-time bound
    behind how fast `markov_next_event_hit_rate` forecasts forget
    their start, without computing an eigenvalue. The pi residual is
    carried as a self-certificate (exact solve => 0 at micro scale).

    Determinism: exact rational stationary solve; integer ppm
    transition flows; subset enumeration over a literal bitmask grid
    with (phi, mask) tie-break.

    Scale shape: transitions collapse to 25 rows; pi is one closure
    call; the 30-subset enumeration is a generated-literal cross join
    — exponential only in the STATE count, a modeling constant.
    """
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    )
    trans = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("s"), F.col("event_type").alias("s2"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("g", F.lit(1))
        .transform(_ckpt)
    )

    def stationary(pdf: pd.DataFrame) -> pd.DataFrame:
        from fractions import Fraction as Fr

        states = sorted(set(pdf["s"]) | set(pdf["s2"]))
        k = len(states)
        idx = {s_: i for i, s_ in enumerate(states)}
        cnt = [[Fr(0)] * k for _ in range(k)]
        for _, row in pdf.iterrows():
            cnt[idx[row["s"]]][idx[row["s2"]]] = Fr(int(row["n"]))
        rows_tot = [sum(r) for r in cnt]
        P = [
            [cnt[i][j] / rows_tot[i] for j in range(k)] for i in range(k)
        ]
        # solve pi (P - I) = 0 with sum pi = 1: transpose system
        A = [
            [P[j][i] - (Fr(1) if i == j else Fr(0)) for j in range(k)]
            for i in range(k)
        ]
        A[k - 1] = [Fr(1)] * k  # replace last eq with normalization
        b = [Fr(0)] * (k - 1) + [Fr(1)]
        M = [A[i][:] + [b[i]] for i in range(k)]
        for col in range(k):
            piv = next(r for r in range(col, k) if M[r][col] != 0)
            M[col], M[piv] = M[piv], M[col]
            pv = M[col][col]
            M[col] = [x / pv for x in M[col]]
            for r in range(k):
                if r != col and M[r][col] != 0:
                    f = M[r][col]
                    M[r] = [x - f * y for x, y in zip(M[r], M[col])]
        pi = [M[i][k] for i in range(k)]
        resid = max(
            abs(
                sum(pi[i] * P[i][j] for i in range(k)) - pi[j]
            )
            for j in range(k)
        )
        return pd.DataFrame(
            {
                "state": states,
                "pi_ppm": [int(p_ * 1000000) for p_ in pi],
                "pi_residual_micro": [int(resid * 1000000)] * k,
            }
        )

    pi = trans.groupBy("g").applyInPandas(
        stationary, schema="state string, pi_ppm long, pi_residual_micro long"
    )
    pi = pi.transform(_ckpt)
    # edge flows Q(i,j) = pi_i * P(i,j) in ppm^2 scale, declaratively
    outdeg = trans.groupBy("s").agg(F.sum("n").alias("tot"))
    q = (
        trans.join(outdeg, "s")
        .join(F.broadcast(pi.select(F.col("state").alias("s"), "pi_ppm")), "s")
        .select(
            "s",
            "s2",
            (
                F.col("pi_ppm") * F.col("n") * 1.0 / F.col("tot")
            ).alias("q_flow"),
        )
    )
    states_idx = pi.select(
        "state",
        (F.row_number().over(Window.orderBy("state")) - 1).alias("bit"),
        "pi_ppm",
    )
    masks = spark.range(1, 31).select(F.col("id").cast("long").alias("mask"))
    member = states_idx.crossJoin(F.broadcast(masks)).select(
        "state",
        "mask",
        "pi_ppm",
        F.expr(
            "(mask DIV CAST(POW(2, bit) AS BIGINT)) % 2"
        ).alias("in_s"),
    )
    pis = member.groupBy("mask").agg(
        F.sum(F.when(F.col("in_s") == 1, F.col("pi_ppm"))).alias("pi_s"),
        F.sum(F.when(F.col("in_s") == 0, F.col("pi_ppm"))).alias("pi_sc"),
    )
    cut = (
        q.join(
            member.select(
                F.col("state").alias("s"), "mask", F.col("in_s").alias("in_a")
            ),
            "s",
        )
        .join(
            member.select(
                F.col("state").alias("ms2"),
                F.col("mask").alias("mask2"),
                F.col("in_s").alias("in_b"),
            ),
            (F.col("mask2") == F.col("mask"))
            & (F.col("ms2") == F.col("s2")),
        )
        .filter((F.col("in_a") == 1) & (F.col("in_b") == 0))
        .groupBy("mask")
        .agg(F.sum("q_flow").alias("qcut"))
    )
    phi = (
        cut.join(pis, "mask")
        .select(
            "mask",
            (
                F.col("qcut") / F.least("pi_s", "pi_sc")
            ).alias("phi"),
        )
        .orderBy("phi", "mask")
        .limit(1)
    )
    return pi.crossJoin(F.broadcast(phi)).select(
        "state",
        "pi_ppm",
        "pi_residual_micro",
        F.col("mask").alias("best_cut_mask"),
        F.round("phi", 6).alias("conductance"),
    )


@query(
    "buhlmann_credibility",
    oracle="""
    WITH per AS (
        SELECT c.c_nationkey AS nk,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(o.o_totalprice) / COUNT(*) AS xbar,
               (SUM(o.o_totalprice * o.o_totalprice) / COUNT(*)
                - (SUM(o.o_totalprice) / COUNT(*))
                  * (SUM(o.o_totalprice) / COUNT(*)))
               * COUNT(*) / (COUNT(*) - 1.0) AS s2
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1
    ), comp AS (
        SELECT SUM(s2 * (n - 1)) / SUM(n - 1) AS epv,
               SUM(n * xbar) / SUM(n) AS grand,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n) AS BIGINT) AS ntot
        FROM per
    ), vhm AS (
        SELECT GREATEST(
            (SUM(per.n * (per.xbar - comp.grand)
                 * (per.xbar - comp.grand))
             - (comp.k - 1) * comp.epv)
            / (comp.ntot - SUM(per.n * per.n * 1.0) / comp.ntot),
            0.0) AS a
        FROM per, comp GROUP BY comp.k, comp.epv, comp.ntot, comp.grand
    )
    SELECT per.nk AS nation_key, per.n AS n_orders,
           ROUND(per.xbar, 4) AS own_mean,
           ROUND(comp.grand, 4) AS grand_mean,
           CAST(ROUND(1000000 * (CASE WHEN vhm.a > 0
                THEN per.n / (per.n + comp.epv / vhm.a)
                ELSE 0.0 END)) AS BIGINT) AS z_ppm,
           ROUND((CASE WHEN vhm.a > 0
                  THEN per.n / (per.n + comp.epv / vhm.a)
                  ELSE 0.0 END) * per.xbar
                 + (1.0 - CASE WHEN vhm.a > 0
                    THEN per.n / (per.n + comp.epv / vhm.a)
                    ELSE 0.0 END) * comp.grand, 4)
               AS credibility_premium
    FROM per, comp, vhm
    """,
)
def buhlmann_credibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Buhlmann credibility premiums per nation: the credibility
    factor Z = n/(n + k) with k = EPV/VHM (expected process variance
    over variance of hypothetical means, both estimated by the
    classic unbiased decomposition) blends each nation's own mean
    order value with the grand mean — the ACTUARIAL parametrization
    of the same shrinkage `james_stein_nation_means` derives from
    decision theory and `eb_shrunk_ctr` from Beta conjugacy: Buhlmann
    is distribution-free and exposes the variance components an
    underwriter prices with.

    Determinism: identical double moment trees (per-group then
    across-group census); VHM floored at 0; rounding at output.

    Scale shape: one per-nation moment agg, one 25-row component
    combine, in-row blending — two shuffles total.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n_ = F.count(F.lit(1))
    per = (
        o.join(
            F.broadcast(
                c.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            n_.cast("long").alias("n"),
            (F.sum("o_totalprice") / n_).alias("xbar"),
            (
                (
                    F.sum(F.col("o_totalprice") * F.col("o_totalprice")) / n_
                    - (F.sum("o_totalprice") / n_)
                    * (F.sum("o_totalprice") / n_)
                )
                * n_
                / (n_ - 1.0)
            ).alias("s2"),
        )
    )
    per = _ckpt(per)  # shared fan-out relation
    comp = per.agg(
        (F.sum(F.col("s2") * (F.col("n") - 1)) / F.sum(F.col("n") - 1)).alias(
            "epv"
        ),
        (F.sum(F.col("n") * F.col("xbar")) / F.sum("n")).alias("grand"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("ntot"),
    )
    comp = _ckpt(comp)  # shared fan-out relation
    vhm = (
        per.crossJoin(F.broadcast(comp))
        .groupBy("k", "epv", "ntot", "grand")
        .agg(
            F.greatest(
                (
                    F.sum(
                        F.col("n")
                        * (F.col("xbar") - F.col("grand"))
                        * (F.col("xbar") - F.col("grand"))
                    )
                    - (F.col("k") - 1) * F.col("epv")
                )
                / (
                    F.col("ntot")
                    - F.sum(F.col("n") * F.col("n") * 1.0) / F.col("ntot")
                ),
                F.lit(0.0),
            ).alias("a")
        )
        .select("a")
    )
    z = F.when(
        F.col("a") > 0,
        F.col("n") / (F.col("n") + F.col("epv") / F.col("a")),
    ).otherwise(F.lit(0.0))
    return (
        per.crossJoin(F.broadcast(comp))
        .crossJoin(F.broadcast(vhm))
        .select(
            F.col("nk").alias("nation_key"),
            F.col("n").alias("n_orders"),
            F.round("xbar", 4).alias("own_mean"),
            F.round("grand", 4).alias("grand_mean"),
            F.round(1000000 * z).cast("long").alias("z_ppm"),
            F.round(
                z * F.col("xbar") + (1.0 - z) * F.col("grand"), 4
            ).alias("credibility_premium"),
        )
    )


@query("abtt_top_pc_removal")
def abtt_top_pc_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-but-the-top (ABTT, Mu & Viswanath) embedding
    post-processing audit: the corpus mean is removed, the TOP
    principal direction is found by 10 distributed power iterations
    (each a map-side <emb, v> projection plus a 64-component
    weighted-sum agg — never materializing a covariance matrix), and
    the isotropy proxy (top-direction variance share vs total
    variance) is reported BEFORE and AFTER removing that direction.
    Embedding stores run exactly this before cosine retrieval because
    a dominant common direction swamps similarity —
    `embedding_isotropy_score` measures the pathology; this query
    applies and audits the standard fix.

    Determinism: fixed iterations from the all-ones start, sup-norm
    scaling; variance ratios from identical double trees; rounding
    at output.

    Scale shape: each power iteration is one scan (Arrow-friendly
    HOF dot products) + a dimension-sized agg — the classic
    distributed top-eigenvector loop; nothing ever shuffles the
    vectors themselves.
    """
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    d = 64
    mean = e.select(
        F.posexplode("v").alias("pos", "x")
    ).groupBy("pos").agg((F.sum("x") / F.count(F.lit(1))).alias("mu"))
    mean_arr = mean.orderBy("pos").agg(
        F.collect_list("mu").alias("mu")
    )
    centered = e.crossJoin(F.broadcast(mean_arr)).select(
        "vec_id",
        F.expr("zip_with(v, mu, (a, b) -> a - b)").alias("v"),
    ).transform(_ckpt)
    # power iteration: v_t+1 = sum_rows c * <c, v_t>, sup-normalized
    vec = [1.0] * d
    for _ in range(10):
        vlit = F.array(*[F.lit(x) for x in vec])
        proj = centered.withColumn("vv", vlit).select(
            F.expr(
                "aggregate(zip_with(v, vv, (a, b) -> a * b),"
                " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
            ).alias("p"),
            "v",
        )
        comp = scalar_row(
            proj.select(
                F.posexplode("v").alias("pos", "x"), F.col("p")
            )
            .groupBy("pos")
            .agg(F.sum(F.col("x") * F.col("p")).alias("s"))
            .orderBy("pos")
            .agg(F.collect_list("s").alias("s")),
            "registry_11.power_iter_component",
        )["s"]
        m = max(abs(x) for x in comp)
        vec = [x / m for x in comp]
    nrm = sum(x * x for x in vec) ** 0.5
    vec = [x / nrm for x in vec]
    vlit = F.array(*[F.lit(x) for x in vec])
    stats = centered.withColumn("vv", vlit).select(
        F.expr(
            "aggregate(zip_with(v, vv, (a, b) -> a * b),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        ).alias("p"),
        F.expr(
            "aggregate(transform(v, x -> x * x),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        ).alias("sq"),
    ).agg(
        F.sum(F.col("p") * F.col("p")).alias("top_var"),
        F.sum("sq").alias("total_var"),
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
    )
    return stats.select(
        "n_vectors",
        F.round(1000000 * F.col("top_var") / F.col("total_var"))
        .cast("long")
        .alias("top_share_before_ppm"),
        F.round(
            1000000
            * F.col("top_var")
            / (F.col("total_var") - F.col("top_var"))
        )
        .cast("long")
        .alias("top_vs_rest_ppm"),
        F.round(
            1000000
            * (F.col("total_var") - F.col("top_var"))
            / F.col("total_var")
        )
        .cast("long")
        .alias("retained_after_abtt_ppm"),
    )


@query(
    "renewal_function_purchases",
    oracle="""
    WITH RECURSIVE gaps AS (
        SELECT LEAST(CAST(datediff('day',
                   LAG(CAST(ts AS DATE)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id),
                   CAST(ts AS DATE)) AS BIGINT), 10) AS j
        FROM events WHERE event_type = 'purchase'
    ), pos AS (
        SELECT j, CAST(COUNT(*) AS BIGINT) AS c
        FROM gaps WHERE j IS NOT NULL AND j >= 1
        GROUP BY 1
    ), n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM pos),
    f AS MATERIALIZED (
        SELECT list(COALESCE(pos.c, 0) * 1.0 / n.n ORDER BY g.j) AS fl
        FROM (SELECT unnest(generate_series(1, 10)) AS j) g
        LEFT JOIN pos ON pos.j = g.j, n
        GROUP BY n.n
    ), ren(t, u) AS (
        SELECT CAST(0 AS BIGINT), [CAST(1.0 AS DOUBLE)] FROM f
        UNION ALL
        SELECT ren.t + 1,
               list_append(ren.u,
                   list_sum(list_transform(
                       range(1, CAST(LEAST(ren.t + 1, 10) AS BIGINT) + 1),
                       j -> f.fl[CAST(j AS INT)]
                            * ren.u[CAST(ren.t + 1 - j + 1 AS INT)])))
        FROM ren, f
        WHERE ren.t < 15
    ), final AS (SELECT u FROM ren WHERE t = 15),
    expanded AS (
        SELECT CAST(g.t AS BIGINT) AS t,
               final.u[CAST(g.t + 1 AS INT)] AS ut
        FROM final,
             LATERAL (SELECT unnest(generate_series(1, 15)) AS t) g
    )
    SELECT t AS day,
           ROUND(ut, 8) AS renewal_prob,
           ROUND(SUM(ut) OVER (ORDER BY t), 6) AS expected_renewals
    FROM expanded
    """,
)
def renewal_function_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete renewal function of the purchase process: interarrival
    day-gaps (capped at 10) form the renewal distribution f, the
    renewal probability obeys u_t = sum_j f_j u_{t-j} with u_0 = 1,
    and the cumulative m(t) = sum u_s is the EXPECTED NUMBER of
    repeat purchases within t days of any purchase — renewal theory's
    answer to reorder-horizon planning, sharper than assuming
    exponential gaps (`gamma_mom_interarrival` fits the gap shape;
    this propagates it through time; `mean_cumulative_function_
    purchases` is the empirical curve this model should approach).

    Determinism: exact gap counts make f exact ratios; both engines
    run the identical 15-step convolution in the same fold order
    (list-carrying recursive CTE vs Python loop); rounding at output.

    Scale shape: one LAG window + gap histogram; the recursion runs
    on the 10-value pmf closure in one applyInPandas call.
    """
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.filter(F.col("event_type") == "purchase").select(
        F.least(
            F.datediff(
                F.to_date("ts"), F.lag(F.to_date("ts")).over(w)
            ).cast("long"),
            F.lit(10),
        ).alias("j")
    )
    pos = (
        gaps.filter(F.col("j").isNotNull() & (F.col("j") >= 1))
        .groupBy("j")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n = pos.agg(F.sum("c").cast("long").alias("n"))
    closure = pos.crossJoin(F.broadcast(n)).withColumn("g", F.lit(1))

    def renewal(pdf: pd.DataFrame) -> pd.DataFrame:
        nn = int(pdf["n"].iloc[0])
        fl = [0.0] * 10
        for _, row in pdf.iterrows():
            fl[int(row["j"]) - 1] = int(row["c"]) * 1.0 / nn
        u = [1.0]
        for t in range(1, 16):
            s_ = None
            for j in range(1, min(t, 10) + 1):
                term = fl[j - 1] * u[t - j]
                s_ = term if s_ is None else s_ + term
            u.append(s_)
        m = []
        run = None
        for t in range(1, 16):
            run = u[t] if run is None else run + u[t]
            m.append(run)
        return pd.DataFrame(
            {
                "day": list(range(1, 16)),
                "u_raw": u[1:],
                "m_raw": m,
            }
        )

    raw = closure.groupBy("g").applyInPandas(
        renewal, schema="day long, u_raw double, m_raw double"
    )
    return raw.select(
        "day",
        F.round("u_raw", 8).alias("renewal_prob"),
        F.round("m_raw", 6).alias("expected_renewals"),
    )


@query(
    "partial_auc_low_fpr",
    oracle="""
    WITH scored AS (
        SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS s,
               l_orderkey, l_linenumber
        FROM lineitem
    ), neg AS (
        SELECT s, ROW_NUMBER() OVER (ORDER BY s DESC,
                   l_orderkey, l_linenumber) AS nrk,
               COUNT(*) OVER () AS nneg
        FROM scored WHERE y = 0
    ), cuts AS (
        SELECT CAST(k.k AS BIGINT) AS k, neg.s AS thr,
               k.k / 50.0 AS fpr
        FROM neg,
             LATERAL (SELECT unnest(generate_series(1, 10)) AS k) k
        WHERE neg.nrk = CAST(FLOOR(k.k * neg.nneg / 50.0) AS BIGINT)
    ), tpr AS (
        SELECT cuts.k, cuts.fpr,
               SUM(CASE WHEN scored.y = 1 AND scored.s > cuts.thr
                   THEN 1 ELSE 0 END) * 1.0
               / (SELECT COUNT(*) FROM scored WHERE y = 1) AS tpr
        FROM scored CROSS JOIN cuts
        GROUP BY cuts.k, cuts.fpr
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_grid,
           ROUND(SUM(tpr) * 0.02, 6) AS pauc_0_20,
           ROUND(SUM(tpr) * 0.02 / 0.2, 6) AS normalized_pauc,
           ROUND(MAX(CASE WHEN k = 10 THEN tpr END), 6) AS tpr_at_20fpr
    FROM tpr
    """,
)
def partial_auc_low_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial AUC over the LOW-false-positive region (FPR 0-0.2,
    right-endpoint Riemann sum on a 10-point grid of exact negative
    order statistics): the screening-regime metric — a fraud or
    alert model lives entirely left of FPR 20%, where full AUC
    (`auc_order_status_price`, `delong_auc_variance`) can be
    dominated by irrelevant high-FPR behavior. Reported raw and
    McClish-normalized (pAUC / 0.2; 1.0 = perfect in-region).

    Determinism: integer cent scores with key tie-breaks; thresholds
    are exact order statistics of the negatives; counts exact; one
    rounding per output.

    Scale shape: the negatives rank comes from the range-bucketed
    distributed rank (``operators/rank.py`` on the negated score —
    no single-task window; the negatives count is one O(1) driver
    scalar) and picks 10 thresholds; TPRs come from a single broadcast-grid conditional
    agg over the fact scan — the curve costs one pass regardless of
    grid size.
    """
    l = load_table(spark, sf_dir, "lineitem")
    scored = l.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("s"),
        "l_orderkey",
        "l_linenumber",
    )
    from pyspark_movie_recommender_spark.operators.rank import (
        distributed_order_stats,
    )

    scored = scored.transform(_ckpt)
    neg0 = scored.filter(F.col("y") == 0).select(
        "s", (-F.col("s")).alias("negs"), "l_orderkey", "l_linenumber"
    )
    nneg_cnt = neg0.count()
    neg = distributed_order_stats(
        neg0, "negs", ["l_orderkey", "l_linenumber"], rank_col="nrk"
    ).select("s", "nrk", F.lit(nneg_cnt).cast("long").alias("nneg"))
    ks = spark.range(1, 11).select(F.col("id").cast("long").alias("k"))
    cuts = neg.crossJoin(F.broadcast(ks)).filter(
        F.col("nrk")
        == F.floor(F.col("k") * F.col("nneg") / 50.0).cast("long")
    ).select("k", F.col("s").alias("thr"), (F.col("k") / 50.0).alias("fpr"))
    npos = scored.filter(F.col("y") == 1).agg(
        F.count(F.lit(1)).cast("long").alias("np")
    )
    tpr = (
        scored.crossJoin(F.broadcast(cuts))
        .groupBy("k", "fpr")
        .agg(
            F.sum(
                F.when((F.col("y") == 1) & (F.col("s") > F.col("thr")), 1)
                .otherwise(0)
            ).alias("tp")
        )
        .crossJoin(F.broadcast(npos))
        .select("k", "fpr", (F.col("tp") * 1.0 / F.col("np")).alias("tpr"))
    )
    return tpr.agg(
        F.count(F.lit(1)).cast("long").alias("n_grid"),
        F.round(F.sum("tpr") * 0.02, 6).alias("pauc_0_20"),
        F.round(F.sum("tpr") * 0.02 / 0.2, 6).alias("normalized_pauc"),
        F.round(
            F.max(F.when(F.col("k") == 10, F.col("tpr"))), 6
        ).alias("tpr_at_20fpr"),
    )


@query("mrmr_feature_selection")
def mrmr_feature_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mRMR (minimum-redundancy maximum-relevance) greedy feature
    selection over four binary order features against
    finished-status: pairwise mutual informations come from EXACT
    2x2 joint counts (one conditional agg computes all 15 pair
    tables in a single scan), and the greedy picks argmax of
    MI(f, y) - mean MI(f, selected) for three rounds — the selection
    rule that `feature_ranking_gini` / `woe_iv_encoding` (pure
    relevance) skip: mRMR penalizes picking two copies of the same
    signal. Output: selection order, each feature's relevance and
    its redundancy against the already-picked set. Rows-only by
    design (the greedy is a 3-step argmax over a 5x5 closure); the
    invariant test pins pick #1 = argmax relevance and the scoring
    identity.

    Determinism: exact counts; MI in nats from identical doubles;
    greedy ties break on feature name.

    Scale shape: ONE fact scan computes every pairwise contingency
    (sum of indicator products); the greedy runs on the 10-number MI
    closure. At feature-store scale the same scan-once trick
    vectorizes thousands of features per pass.
    """
    import math

    import pandas as pd

    o = load_table(spark, sf_dir, "orders")
    feat = o.select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        F.when(F.col("o_totalprice") >= 150000, 1).otherwise(0).alias(
            "f_price"
        ),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("f_pri"),
        F.when(F.month("o_orderdate") >= 7, 1).otherwise(0).alias("f_h2"),
        F.when(F.col("o_custkey") % 2 == 0, 1).otherwise(0).alias(
            "f_even"
        ),
    )
    names = ["y", "f_price", "f_pri", "f_h2", "f_even"]
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i, a in enumerate(names):
        aggs.append(F.sum(F.col(a)).cast("long").alias(f"m_{a}"))
        for b in names[i + 1:]:
            aggs.append(
                F.sum(F.col(a) * F.col(b)).cast("long").alias(f"j_{a}__{b}")
            )
    counts = feat.agg(*aggs).withColumn("g", F.lit(1))

    def mrmr(pdf: pd.DataFrame) -> pd.DataFrame:
        row = pdf.iloc[0]
        n = int(row["n"])
        marg = {a: int(row[f"m_{a}"]) for a in names}

        def mi(a, b):
            key = f"j_{a}__{b}" if f"j_{a}__{b}" in row else f"j_{b}__{a}"
            c11 = int(row[key])
            c10 = marg[a] - c11
            c01 = marg[b] - c11
            c00 = n - c11 - c10 - c01
            total = 0.0
            for cab, pa, pb in (
                (c11, marg[a], marg[b]),
                (c10, marg[a], n - marg[b]),
                (c01, n - marg[a], marg[b]),
                (c00, n - marg[a], n - marg[b]),
            ):
                if cab > 0 and pa > 0 and pb > 0:
                    total += (cab / n) * math.log(
                        (cab * n) / (pa * pb)
                    )
            return total

        feats = names[1:]
        rel = {f_: mi(f_, "y") for f_ in feats}
        picked = []
        rows = []
        for step in range(1, 4):
            best = None
            for f_ in sorted(feats):
                if f_ in picked:
                    continue
                red = (
                    sum(mi(f_, p_) for p_ in picked) / len(picked)
                    if picked
                    else 0.0
                )
                score = rel[f_] - red
                if best is None or score > best[0] + 1e-15:
                    best = (score, f_, red)
            _, f_, red = best
            picked.append(f_)
            rows.append(
                {
                    "pick_order": step,
                    "feature": f_,
                    "relevance_nats": round(rel[f_], 9),
                    "redundancy_nats": round(red, 9),
                    "mrmr_score_nats": round(rel[f_] - red, 9),
                }
            )
        return pd.DataFrame(rows)

    return counts.groupBy("g").applyInPandas(
        mrmr,
        schema=(
            "pick_order long, feature string, relevance_nats double, "
            "redundancy_nats double, mrmr_score_nats double"
        ),
    )


@query(
    "amihud_illiquidity_monthly",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(ROUND(SUM(value) * 100) AS BIGINT) AS px,
               CAST(COUNT(*) AS BIGINT) AS vol
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ), rets AS (
        SELECT day, vol,
               ABS(px - LAG(px) OVER (ORDER BY day)) * 1.0
               / LAG(px) OVER (ORDER BY day) AS absret
        FROM daily
    )
    SELECT CAST(date_trunc('month', day) AS DATE) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(SUM(absret / vol) / COUNT(*) * 1000000, 6)
               AS amihud_illiq_x1e6,
           ROUND(SUM(absret) / COUNT(*), 6) AS mean_absret
    FROM rets WHERE absret IS NOT NULL
    GROUP BY 1
    """,
)
def amihud_illiquidity_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Amihud illiquidity ratio by month: the average of
    |daily return| / daily volume — the canonical price-impact proxy
    (how much the 'price' series moves per unit of flow), completing
    the microstructure trio with `roll_spread_estimator` (effective
    spread from return autocovariance) and `corwin_schultz_spread`
    (spread from high-low ranges): Roll and CS price the SPREAD,
    Amihud prices DEPTH.

    Determinism: exact integer daily cents and counts; the return
    ratio and average use identical expression trees; rounding at
    output.

    Scale shape: one daily agg, one LAG window, one month rollup —
    linear with map-side partials.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.filter(F.col("event_type") == "purchase").groupBy(
        F.to_date("ts").alias("day")
    ).agg(
        F.round(F.sum("value") * 100).cast("long").alias("px"),
        F.count(F.lit(1)).cast("long").alias("vol"),
    )
    w = Window.orderBy("day")
    rets = daily.select(
        "day",
        "vol",
        (
            F.abs(F.col("px") - F.lag("px").over(w))
            * 1.0
            / F.lag("px").over(w)
        ).alias("absret"),
    ).filter(F.col("absret").isNotNull())
    return rets.groupBy(
        F.date_trunc("month", "day").cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(
            F.sum(F.col("absret") / F.col("vol"))
            / F.count(F.lit(1))
            * 1000000,
            6,
        ).alias("amihud_illiq_x1e6"),
        F.round(F.sum("absret") / F.count(F.lit(1)), 6).alias(
            "mean_absret"
        ),
    )


@query(
    "historical_var_cvar",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(ROUND(SUM(value) * 100) AS BIGINT) AS px
        FROM events GROUP BY 1
    ), rets AS (
        SELECT (px - LAG(px) OVER (ORDER BY day)) * 1.0
               / LAG(px) OVER (ORDER BY day) AS r,
               day
        FROM daily
    ), ranked AS (
        SELECT r, CAST(ROW_NUMBER() OVER (ORDER BY r, day) AS BIGINT)
                   AS rk,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM rets WHERE r IS NOT NULL
    ), var_k AS (
        SELECT n, CAST(GREATEST(CAST(CEIL(n * 0.1) AS BIGINT), 1)
                   AS BIGINT) AS k
        FROM (SELECT DISTINCT n FROM ranked) t
    )
    SELECT var_k.n AS n_returns, var_k.k AS k_tail,
           ROUND((SELECT -r FROM ranked
                  WHERE rk = var_k.k), 6) AS var_90,
           ROUND((SELECT -SUM(r) / var_k.k FROM ranked
                  WHERE rk <= var_k.k), 6) AS cvar_90
    FROM var_k
    """,
)
def historical_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical Value-at-Risk and Expected Shortfall (CVaR) at the
    90% level for daily revenue returns: VaR is the k-th worst return
    (k = ceil(0.1 n), exact order statistic with a date tie-break)
    and CVaR is the MEAN of the k worst — the coherent tail measure
    that the quantile alone misses (two books with equal VaR can
    carry very different tail mass). Completes the tail-risk family:
    `cornish_fisher_var` (moment-corrected parametric),
    `extreme_value_pot` / `gumbel_daily_max_fit` (asymptotic tails),
    `max_drawdown_daily_value` (path risk); historical VaR/ES is the
    regulatory baseline all of them are benchmarked against.

    Determinism: exact integer daily cents; returns are identical
    doubles; order statistics with total tie-break; rounding at
    output.

    Scale shape: one daily agg, one LAG, one rank window, two point
    lookups over the tail — the tail mean aggregates k rows.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100).cast("long").alias("px")
    )
    w = Window.orderBy("day")
    rets = daily.select(
        "day",
        (
            (F.col("px") - F.lag("px").over(w))
            * 1.0
            / F.lag("px").over(w)
        ).alias("r"),
    ).filter(F.col("r").isNotNull())
    ranked = rets.select(
        "r",
        F.row_number().over(Window.orderBy("r", "day")).cast("long").alias(
            "rk"
        ),
    ).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy()).cast("long")
    )
    ranked = _ckpt(ranked)  # shared fan-out relation
    var_k = ranked.select("n").distinct().select(
        "n",
        F.greatest(F.ceil(F.col("n") * 0.1).cast("long"), F.lit(1)).alias(
            "k"
        ),
    )
    var_k = _ckpt(var_k)  # shared fan-out relation
    var90 = ranked.join(
        F.broadcast(var_k), ranked["rk"] == var_k["k"]
    ).select((-F.col("r")).alias("v"))
    cvar = (
        ranked.crossJoin(F.broadcast(var_k.select(F.col("k").alias("kk"))))
        .filter(F.col("rk") <= F.col("kk"))
        .agg((-F.sum("r") / F.first("kk")).alias("c"))
    )
    return (
        var_k.crossJoin(F.broadcast(var90))
        .crossJoin(F.broadcast(cvar))
        .select(
            F.col("n").alias("n_returns"),
            F.col("k").alias("k_tail"),
            F.round("v", 6).alias("var_90"),
            F.round("c", 6).alias("cvar_90"),
        )
    )


@query(
    "hill_saturation_fit",
    oracle="""
    WITH wk AS (
        SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS w,
               CAST(COUNT(*) AS BIGINT) AS c,
               CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS rev
        FROM orders GROUP BY 1
    ), vmax AS (
        SELECT MAX(rev) * 1.0 AS v FROM wk
    ), grid AS (
        SELECT CAST(k.k AS BIGINT) AS kk, CAST(h.h AS BIGINT) AS hh
        FROM (SELECT unnest(generate_series(10, 100, 5)) AS k) k,
             (SELECT unnest(generate_series(1, 4)) AS h) h
    ), sse AS (
        SELECT grid.kk, grid.hh,
               SUM((wk.rev - vmax.v * POW(wk.c, grid.hh)
                    / (POW(grid.kk, grid.hh) + POW(wk.c, grid.hh)))
                   * (wk.rev - vmax.v * POW(wk.c, grid.hh)
                      / (POW(grid.kk, grid.hh) + POW(wk.c, grid.hh))))
                   AS sse
        FROM wk CROSS JOIN grid CROSS JOIN vmax
        GROUP BY 1, 2
    ), best AS (
        SELECT kk, hh, sse FROM sse ORDER BY sse, kk, hh LIMIT 1
    ), tss AS (
        SELECT SUM((rev - (SELECT SUM(rev) * 1.0 / COUNT(*) FROM wk))
                   * (rev - (SELECT SUM(rev) * 1.0 / COUNT(*) FROM wk)))
                   AS t
        FROM wk
    )
    SELECT best.kk AS half_saturation_orders,
           best.hh AS hill_exponent,
           CAST(ROUND(1000000 * (1.0 - best.sse / tss.t)) AS BIGINT)
               AS r2_ppm,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM wk) AS n_weeks
    FROM best, tss
    """,
)
def hill_saturation_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill saturation-curve fit of weekly revenue against weekly
    order count by exact grid search: rev ~ Vmax c^n / (K^n + c^n)
    over K in {10..100 step 5} x n in {1..4}, argmin SSE with
    (K, n) tie-breaks — the diminishing-returns response curve
    marketing-mix models put AFTER `adstock_regression`'s carryover
    (adstock shifts spend in time; Hill bends it), with the half-
    saturation point K being the budget-planning number. Grid search
    instead of gradient descent keeps both engines bit-identical.

    Determinism: exact integer weekly counts/cents; the 76-cell grid
    is a literal; SSE expression trees identical; argmin tie-broken.

    Scale shape: one week agg, a broadcast grid cross, one grouped
    SSE agg — the fit costs one pass over week-grain data however
    large the fact table.
    """
    o = load_table(spark, sf_dir, "orders")
    wk = o.groupBy(
        F.date_trunc("week", "o_orderdate").cast("date").alias("w")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("rev"),
    )
    wk = wk.transform(_ckpt)
    vmax = wk.agg((F.max("rev") * 1.0).alias("v"))
    ks = spark.range(10, 101).filter(F.col("id") % 5 == 0).select(
        F.col("id").cast("long").alias("kk")
    )
    hs = spark.range(1, 5).select(F.col("id").cast("long").alias("hh"))
    grid = ks.crossJoin(hs)
    pred = F.col("v") * F.pow("c", F.col("hh")) / (
        F.pow("kk", F.col("hh")) + F.pow("c", F.col("hh"))
    )
    sse = (
        wk.crossJoin(F.broadcast(grid))
        .crossJoin(F.broadcast(vmax))
        .groupBy("kk", "hh")
        .agg(
            F.sum((F.col("rev") - pred) * (F.col("rev") - pred)).alias(
                "sse"
            )
        )
    )
    best = sse.orderBy("sse", "kk", "hh").limit(1)
    mean_rev = wk.agg((F.sum("rev") * 1.0 / F.count(F.lit(1))).alias("mu"))
    tss = wk.crossJoin(F.broadcast(mean_rev)).agg(
        F.sum(
            (F.col("rev") - F.col("mu")) * (F.col("rev") - F.col("mu"))
        ).alias("t")
    )
    nwk = wk.agg(F.count(F.lit(1)).cast("long").alias("n_weeks"))
    return (
        best.crossJoin(F.broadcast(tss))
        .crossJoin(F.broadcast(nwk))
        .select(
            F.col("kk").alias("half_saturation_orders"),
            F.col("hh").alias("hill_exponent"),
            F.round(1000000 * (1.0 - F.col("sse") / F.col("t")))
            .cast("long")
            .alias("r2_ppm"),
            "n_weeks",
        )
    )


@query(
    "rarefaction_expected_vocab",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        FROM documents WHERE trim(text) <> ''
    ), cnt AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1
    ), coc AS (
        -- counts of counts: f_c species observed exactly c times
        SELECT c, CAST(COUNT(*) AS BIGINT) AS fc FROM cnt GROUP BY 1
    ), n AS (SELECT CAST(SUM(c * fc) AS BIGINT) AS n,
                    CAST(SUM(fc) AS BIGINT) AS s FROM coc),
    lf AS (
        SELECT CAST(g.i AS BIGINT) AS i,
               SUM(LN(g.i)) OVER (ORDER BY g.i) AS lnf
        FROM (SELECT unnest(generate_series(1,
                  (SELECT CAST(n AS INT) FROM n))) AS i) g
    ), lnfact AS (
        SELECT i, lnf FROM lf UNION ALL SELECT 0, 0.0
    ), ms AS (SELECT CAST(unnest([100, 500, 2000]) AS BIGINT) AS m),
    expected AS (
        -- E[S_m] = sum_c f_c (1 - C(n-c, m)/C(n, m)); the absent
        -- probability is exp(lnf(n-c) + lnf(n-m) - lnf(n-c-m) - lnf(n))
        SELECT ms.m,
               SUM(coc.fc * (1.0 - CASE WHEN n.n - coc.c >= ms.m
                   THEN EXP(la.lnf + lb.lnf - lc.lnf - ld.lnf)
                   ELSE 0.0 END)) AS es
        FROM coc
        CROSS JOIN n
        CROSS JOIN ms
        JOIN lnfact la ON la.i = n.n - coc.c
        JOIN lnfact lb ON lb.i = n.n - ms.m
        JOIN lnfact lc ON lc.i = GREATEST(n.n - coc.c - ms.m, 0)
        JOIN lnfact ld ON ld.i = n.n
        GROUP BY ms.m
    )
    SELECT expected.m AS subsample_tokens,
           n.s AS observed_vocab,
           n.n AS total_tokens,
           ROUND(expected.es, 4) AS expected_vocab
    FROM expected, n
    """,
)
def rarefaction_expected_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact hypergeometric rarefaction of corpus vocabulary: the
    EXPECTED number of distinct tokens in a uniform random subsample
    of m tokens, E[S_m] = sum over species of 1 - C(n-c, m)/C(n, m),
    computed from the counts-of-counts profile with log-factorials —
    the fair-comparison curve for corpora of different sizes (raw
    vocabulary counts are size-confounded; rarefied ones are not).
    The downward-looking complement of `chao1_vocabulary_estimate`
    (extrapolation) and the exact analytical form of what
    `token_coverage_curve` measures empirically.

    Determinism: integer counts-of-counts; shared log-factorial
    table; sums accumulate over the ~200-row (c, m) grid identically;
    one rounding.

    Scale shape: token histogram -> counts-of-counts collapses the
    corpus to its frequency PROFILE (hundreds of rows regardless of
    corpus size); the combinatorial term is a grid of profile x 3
    subsample sizes with four lnfact lookups each.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.filter(F.trim("text") != "").select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
    )
    cnt = toks.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    coc = cnt.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("fc"))
    coc = coc.transform(_ckpt)
    n = coc.agg(
        F.sum(F.col("c") * F.col("fc")).cast("long").alias("n"),
        F.sum("fc").cast("long").alias("s"),
    )
    lf = n.select(
        F.explode(F.sequence(F.lit(1), F.col("n"))).alias("i")
    ).select(
        F.col("i").cast("long").alias("i"),
        F.sum(F.log("i")).over(Window.orderBy("i")).alias("lnf"),
    )
    lnfact = lf.unionByName(
        n.select(F.lit(0).cast("long").alias("i"), F.lit(0.0).alias("lnf"))
    )
    ms = spark.createDataFrame([(100,), (500,), (2000,)], "m long")
    grid = coc.crossJoin(F.broadcast(n)).crossJoin(F.broadcast(ms))
    la = lnfact.select(F.col("i").alias("la_i"), F.col("lnf").alias("la"))
    lb = lnfact.select(F.col("i").alias("lb_i"), F.col("lnf").alias("lb"))
    lc = lnfact.select(F.col("i").alias("lc_i"), F.col("lnf").alias("lc"))
    ld = lnfact.select(F.col("i").alias("ld_i"), F.col("lnf").alias("ld"))
    joined = (
        grid.join(F.broadcast(la), F.col("n") - F.col("c") == F.col("la_i"))
        .join(F.broadcast(lb), F.col("n") - F.col("m") == F.col("lb_i"))
        .join(
            F.broadcast(lc),
            F.greatest(F.col("n") - F.col("c") - F.col("m"), F.lit(0))
            == F.col("lc_i"),
        )
        .join(F.broadcast(ld), F.col("n") == F.col("ld_i"))
    )
    absent = F.when(
        F.col("n") - F.col("c") >= F.col("m"),
        F.exp(F.col("la") + F.col("lb") - F.col("lc") - F.col("ld")),
    ).otherwise(0.0)
    expected = joined.groupBy("m").agg(
        F.sum(F.col("fc") * (1.0 - absent)).alias("es")
    )
    return expected.crossJoin(F.broadcast(n)).select(
        F.col("m").alias("subsample_tokens"),
        F.col("s").alias("observed_vocab"),
        F.col("n").alias("total_tokens"),
        F.round("es", 4).alias("expected_vocab"),
    )


@query(
    "topological_entropy_ladder",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(ROUND(SUM(value) * 100) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), sym AS (
        SELECT CASE WHEN LEAD(x) OVER (ORDER BY day) > x
               THEN '1' ELSE '0' END AS s,
               CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
               LEAD(x) OVER (ORDER BY day) AS guard
        FROM d
    ), seq AS (
        SELECT string_agg(s, '' ORDER BY i) AS str
        FROM sym WHERE guard IS NOT NULL
    ), ks AS (SELECT CAST(unnest([2, 3, 4, 5]) AS BIGINT) AS k),
    words AS (
        SELECT ks.k,
               CAST(COUNT(DISTINCT substring(seq.str,
                    CAST(g.i AS INT), CAST(ks.k AS INT))) AS BIGINT)
                   AS n_words,
               CAST(length(seq.str) - ks.k + 1 AS BIGINT) AS n_windows
        FROM seq, ks,
             LATERAL (SELECT unnest(generate_series(1,
                 CAST(length(seq.str) AS INT))) AS i) g
        WHERE g.i <= length(seq.str) - ks.k + 1
        GROUP BY ks.k, seq.str
    )
    SELECT k AS word_length, n_words, n_windows,
           CAST(CASE WHEN k <= 5 THEN POW(2, k) END AS BIGINT)
               AS max_possible,
           ROUND(LN(n_words) / (k * LN(2.0)), 6)
               AS entropy_rate_bits
    FROM words
    """,
)
def topological_entropy_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topological entropy ladder of the daily up/down symbol
    dynamics: the count of DISTINCT length-k words (k = 2..5)
    observed in the binary direction sequence, with
    log2(N_k)/k as the entropy-rate estimate at each k — a
    fully-random walk realizes all 2^k words (rate 1 bit); forbidden
    words (rate < 1) certify deterministic structure, the
    symbolic-dynamics reading that counts POSSIBILITIES where
    `markov_entropy_rate` weighs probabilities and
    `permutation_entropy_daily` ranks amplitudes.

    Determinism: exact cent comparisons make the symbols; distinct
    substring counting is exact; one rounded log per row.

    Scale shape: symbolization is one window; word counting is a
    per-k substring explode over the day-grid string — constant
    closure; per-series parallel by keying.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100).cast("long").alias("x")
    )
    w = Window.orderBy("day")
    sym = d.select(
        F.when(F.lead("x").over(w) > F.col("x"), "1")
        .otherwise("0")
        .alias("s"),
        F.row_number().over(w).alias("i"),
        F.lead("x").over(w).alias("guard"),
    ).filter(F.col("guard").isNotNull())
    seq = sym.agg(
        F.concat_ws(
            "",
            F.array_sort(
                F.collect_list(F.struct("i", "s"))
            ).getField("s"),
        ).alias("str")
    )
    ks = spark.createDataFrame([(2,), (3,), (4,), (5,)], "k long")
    words = (
        seq.crossJoin(F.broadcast(ks))
        .select(
            "k",
            "str",
            F.explode(
                F.sequence(F.lit(1), F.length("str") - F.col("k") + 1)
            ).alias("i"),
        )
        .select(
            "k",
            F.expr("length(str) - k + 1").cast("long").alias("n_windows"),
            F.expr("substring(str, CAST(i AS INT), CAST(k AS INT))").alias(
                "wd"
            ),
        )
        .groupBy("k", "n_windows")
        .agg(F.countDistinct("wd").cast("long").alias("n_words"))
    )
    return words.select(
        F.col("k").alias("word_length"),
        "n_words",
        "n_windows",
        F.pow(F.lit(2.0), F.col("k")).cast("long").alias("max_possible"),
        F.round(
            F.log("n_words") / (F.col("k") * F.log(F.lit(2.0))), 6
        ).alias("entropy_rate_bits"),
    )


@query(
    "box_counting_dimension",
    oracle="""
    WITH d AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
               x, CAST(COUNT(*) OVER () AS BIGINT) AS n,
               CAST(MIN(x) OVER () AS BIGINT) AS xmin,
               CAST(MAX(x) OVER () AS BIGINT) AS xmax
        FROM (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(ROUND(SUM(value) * 100) AS BIGINT) AS x
            FROM events GROUP BY 1
        ) s
    ), scales AS (SELECT CAST(unnest([4, 8, 16]) AS BIGINT) AS g),
    boxes AS (
        -- normalize t to [0, g) and x to [0, g); count occupied cells
        SELECT scales.g,
               CAST(COUNT(DISTINCT (
                   LEAST(CAST(FLOOR((d.t - 1) * scales.g * 1.0 / d.n)
                         AS BIGINT), scales.g - 1),
                   LEAST(CAST(FLOOR((d.x - d.xmin) * scales.g * 1.0
                         / GREATEST(d.xmax - d.xmin + 1, 1))
                         AS BIGINT), scales.g - 1)
               )) AS BIGINT) AS n_boxes
        FROM d CROSS JOIN scales
        GROUP BY scales.g
    )
    SELECT g AS grid_size, n_boxes,
           ROUND(LN(n_boxes * 1.0) / LN(g * 1.0), 6) AS dim_estimate
    FROM boxes
    """,
)
def box_counting_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box-counting (Minkowski) dimension ladder of the daily revenue
    trajectory: the (day, value) curve is normalized into g x g grids
    (g = 4, 8, 16) and the occupied-cell count N(g) gives the
    dimension estimate ln N / ln g — 1.0 for a smooth curve, toward
    2.0 for space-filling roughness, the fractal complement of
    `hurst_rescaled_range` (for fBm, box dimension = 2 - H, a
    cross-query consistency the invariant test sanity-bounds).

    Determinism: integer grid assignment with exact floor division
    and range clamps; counts exact; one rounded log ratio.

    Scale shape: one day agg with window extrema, a 3-scale literal
    cross, and a distinct-cell count per scale — constant beyond the
    day grid.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100).cast("long").alias("x")
    )
    d = base.select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
        "x",
    ).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy()).cast("long")
    ).withColumn(
        "xmin", F.min("x").over(Window.partitionBy()).cast("long")
    ).withColumn(
        "xmax", F.max("x").over(Window.partitionBy()).cast("long")
    )
    scales = spark.createDataFrame([(4,), (8,), (16,)], "g long")
    boxes = (
        d.crossJoin(F.broadcast(scales))
        .select(
            "g",
            F.least(
                (F.col("t") - 1) * F.col("g") / F.col("n"),
                F.col("g") - 1,
            )
            .cast("long")
            .alias("bt"),
            F.least(
                (F.col("x") - F.col("xmin"))
                * F.col("g")
                / F.greatest(
                    F.col("xmax") - F.col("xmin") + 1, F.lit(1)
                ),
                (F.col("g") - 1) * 1.0,
            )
            .cast("long")
            .alias("bx"),
        )
        .groupBy("g")
        .agg(F.countDistinct("bt", "bx").cast("long").alias("n_boxes"))
    )
    return boxes.select(
        F.col("g").alias("grid_size"),
        "n_boxes",
        F.round(
            F.log(F.col("n_boxes") * 1.0) / F.log(F.col("g") * 1.0), 6
        ).alias("dim_estimate"),
    )


@query("katz_centrality_exact")
def katz_centrality_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality on the directed nation trade graph, solved
    EXACTLY: x = (I - a A^T)^-1 * 1 with the attenuation a = 1/(2*D)
    where D is the maximum row sum of the (revenue-millions) adjacency
    — a provable upper bound on the spectral radius, so the Neumann
    series converges and the rational solve is legitimate. Completes
    the centrality family (degree strength, `closeness_exact_nation`,
    `betweenness_nation_trade`, `harmonic_centrality_radius2`,
    `pagerank_trade_graph`, `hits_hub_authority`,
    `perron_eigenvalue_certified`): Katz counts ALL incoming walks
    with geometric damping, the resolvent where PageRank is the
    stochastic normalization. Self-certified by the declaratively
    recomputed residual x - 1 - a A^T x (exact solve: 0 at micro
    scale).

    Determinism: integer capacities; exact Fractions; the
    attenuation is an exact rational derived from integer row sums.

    Scale shape: matrix collapse is the fact agg; the k x k solve is
    one closure call; the residual certificate is one matvec join.
    """
    import pandas as pd

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    flows = (
        l.join(
            F.broadcast(
                s.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")
            ),
            "l_suppkey",
        )
        .join(
            o.select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"),
            "l_orderkey",
        )
        .join(
            F.broadcast(
                c.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").cast("long").alias("u"),
            F.col("c_nationkey").cast("long").alias("v"),
        )
        .agg(
            (
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                / F.lit(1000000)
            )
            .cast("long")
            .alias("w")
        )
        .filter(F.col("w") > 0)
        .withColumn("g", F.lit(1))
        .transform(_ckpt)
    )

    def katz(pdf: pd.DataFrame) -> pd.DataFrame:
        from fractions import Fraction as Fr

        nodes = sorted(set(pdf["u"]) | set(pdf["v"]))
        idx = {n_: i for i, n_ in enumerate(nodes)}
        k = len(nodes)
        A = [[Fr(0)] * k for _ in range(k)]
        for _, row in pdf.iterrows():
            A[idx[int(row["u"])]][idx[int(row["v"])]] = Fr(int(row["w"]))
        dmax = max(sum(r) for r in A)
        a = Fr(1, 2 * int(dmax))
        # solve (I - a A^T) x = 1
        M = [
            [
                (Fr(1) if i == j else Fr(0)) - a * A[j][i]
                for j in range(k)
            ]
            + [Fr(1)]
            for i in range(k)
        ]
        for col in range(k):
            piv = next(r for r in range(col, k) if M[r][col] != 0)
            M[col], M[piv] = M[piv], M[col]
            pv = M[col][col]
            M[col] = [x_ / pv for x_ in M[col]]
            for r in range(k):
                if r != col and M[r][col] != 0:
                    f = M[r][col]
                    M[r] = [x_ - f * y_ for x_, y_ in zip(M[r], M[col])]
        x = [M[i][k] for i in range(k)]
        return pd.DataFrame(
            {
                "nation_key": nodes,
                "katz_micro": [int(xi * 1000000) for xi in x],
                "attenuation_num": [1] * k,
                "attenuation_den": [2 * int(dmax)] * k,
            }
        )

    vec = flows.groupBy("g").applyInPandas(
        katz,
        schema=(
            "nation_key long, katz_micro long, attenuation_num long, "
            "attenuation_den long"
        ),
    )
    vec = vec.transform(_ckpt)
    # residual: x - 1 - a * A^T x, on the rounded micro vector
    ax = (
        flows.join(
            vec.select(F.col("nation_key").alias("u"), F.col("katz_micro").alias("xu")),
            "u",
        )
        .groupBy(F.col("v").alias("nation_key"))
        .agg(F.sum(F.col("w") * F.col("xu")).alias("atx"))
    )
    resid = (
        vec.join(F.broadcast(ax), "nation_key", "left")
        .select(
            "nation_key",
            (
                F.col("katz_micro")
                - F.lit(1000000)
                - F.col("attenuation_num")
                * F.coalesce("atx", F.lit(0))
                / F.col("attenuation_den")
            )
            .cast("long")
            .alias("residual_micro"),
        )
    )
    return vec.join(F.broadcast(resid), "nation_key").select(
        "nation_key",
        "katz_micro",
        "attenuation_den",
        "residual_micro",
    )


@query("kirchhoff_spanning_trees")
def kirchhoff_spanning_trees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kirchhoff matrix-tree theorem on the undirected top-60 trade
    graph: the EXACT number of spanning trees equals any cofactor of
    the Laplacian, computed here as a rational Gaussian-elimination
    determinant of the reduced Laplacian (integer matrix => integer
    count, emitted as a decimal STRING because spanning-tree counts
    overflow any fixed-width type, plus its log10). The global
    redundancy census behind the pointwise robustness queries:
    `tarjan_bridges_certified` finds edges whose loss disconnects,
    `effective_resistance_trade` prices pairwise redundancy — the
    tree count aggregates ALL of it into one invariant (a bridge
    multiplies the count by 1; rich meshes multiply it
    exponentially). Cayley's bound count <= n^(n-2) is pinned by the
    invariant test.

    Determinism: integer adjacency from the exact (cap, u, v)-ranked
    top-60 edges; exact rational elimination.

    Scale shape: edge selection is the fact agg + rank; the
    determinant is one closure call on the node-sized matrix.
    Planetary tree counts use log-determinants of sparse Cholesky —
    this is their exact spec at dimension 25.
    """
    import pandas as pd

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    flows = (
        l.join(
            F.broadcast(
                s.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")
            ),
            "l_suppkey",
        )
        .join(
            o.select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"),
            "l_orderkey",
        )
        .join(
            F.broadcast(
                c.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.least("s_nationkey", "c_nationkey").cast("long").alias("u"),
            F.greatest("s_nationkey", "c_nationkey").cast("long").alias("v"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cap")
        )
    )
    ee = (
        flows.withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.desc("cap"), "u", "v")),
        )
        .filter(F.col("rn") <= 60)
        .select("u", "v")
        .withColumn("g", F.lit(1))
        .transform(_ckpt)
    )

    def count_trees(pdf: pd.DataFrame) -> pd.DataFrame:
        import math
        from fractions import Fraction as Fr

        nodes = sorted(set(pdf["u"]) | set(pdf["v"]))
        idx = {n_: i for i, n_ in enumerate(nodes)}
        k = len(nodes)
        L = [[Fr(0)] * k for _ in range(k)]
        for _, row in pdf.iterrows():
            i, j = idx[int(row["u"])], idx[int(row["v"])]
            L[i][i] += 1
            L[j][j] += 1
            L[i][j] -= 1
            L[j][i] -= 1
        # reduced Laplacian: drop last row/col; exact determinant
        m = k - 1
        A = [[L[i][j] for j in range(m)] for i in range(m)]
        det = Fr(1)
        sign = 1
        for col in range(m):
            piv = next(
                (r for r in range(col, m) if A[r][col] != 0), None
            )
            if piv is None:
                det = Fr(0)
                break
            if piv != col:
                A[col], A[piv] = A[piv], A[col]
                sign = -sign
            det *= A[col][col]
            inv = A[col][col]
            for r in range(col + 1, m):
                if A[r][col] != 0:
                    f = A[r][col] / inv
                    A[r] = [
                        x_ - f * y_ for x_, y_ in zip(A[r], A[col])
                    ]
        count = int(det) * sign
        return pd.DataFrame(
            {
                "n_nodes": [k],
                "n_edges": [len(pdf)],
                "n_spanning_trees": [str(count)],
                "log10_trees": [
                    round(math.log10(count), 4) if count > 0 else -1.0
                ],
            }
        )

    return ee.groupBy("g").applyInPandas(
        count_trees,
        schema=(
            "n_nodes long, n_edges long, n_spanning_trees string, "
            "log10_trees double"
        ),
    )


@query(
    "matrix_permanent_ryser",
    oracle="""
    WITH m AS (
        SELECT c.c_nationkey % 5 AS i,
               CASE c.c_mktsegment WHEN 'AUTOMOBILE' THEN 0
                    WHEN 'BUILDING' THEN 1 WHEN 'FURNITURE' THEN 2
                    WHEN 'HOUSEHOLD' THEN 3 ELSE 4 END AS j,
               CASE WHEN SUM(o.o_totalprice) >= 20000000
                    THEN 1 ELSE 0 END AS a
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ), masks AS (
        SELECT CAST(unnest(generate_series(1, 31)) AS BIGINT) AS mask
    ), rowsums AS (
        SELECT masks.mask, m.i,
               CAST(SUM(m.a * ((masks.mask // CAST(POW(2, m.j)
                    AS BIGINT)) % 2)) AS BIGINT) AS rs
        FROM m CROSS JOIN masks
        GROUP BY 1, 2
    ), products AS (
        SELECT mask,
               MAX(CASE WHEN i = 0 THEN rs END)
               * MAX(CASE WHEN i = 1 THEN rs END)
               * MAX(CASE WHEN i = 2 THEN rs END)
               * MAX(CASE WHEN i = 3 THEN rs END)
               * MAX(CASE WHEN i = 4 THEN rs END) AS prod,
               CAST(((mask // 1) % 2) + ((mask // 2) % 2)
                    + ((mask // 4) % 2) + ((mask // 8) % 2)
                    + ((mask // 16) % 2) AS BIGINT) AS popcount
        FROM rowsums GROUP BY mask
    )
    SELECT CAST(SUM(CASE WHEN (5 - popcount) % 2 = 0
                     THEN prod ELSE -prod END) AS BIGINT)
               AS permanent,
           CAST((SELECT SUM(a) FROM m) AS BIGINT) AS n_ones
    FROM products
    """,
)
def matrix_permanent_ryser(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT matrix permanent of the 5x5 nation-group x segment
    affinity indicator (1 = revenue >= $200k) by Ryser's
    inclusion-exclusion — perm(A) = (-1)^n sum over column subsets S
    of (-1)^|S| prod_i (row-sum over S) — which for a 0/1 matrix
    COUNTS THE PERFECT MATCHINGS (systems of distinct
    representatives): how many ways can the five nation groups be
    assigned distinct segments they are strong in? #P-hard in
    general, exactly enumerable at n = 5, and — unlike
    `assignment_optimal_exact` (ONE best matching) or
    `konig_matching_cover` (maximum matching size) — this counts ALL
    of them, fully declaratively via a 31-mask literal grid.

    Determinism: integer indicator matrix; the subset products are
    exact integer pivots (no exp/log); signed sum exact.

    Scale shape: one fact agg to 25 cells, a 31-row mask cross with
    one grouped product — exponential only in n = 5.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    seg_code = (
        F.when(F.col("c_mktsegment") == "AUTOMOBILE", 0)
        .when(F.col("c_mktsegment") == "BUILDING", 1)
        .when(F.col("c_mktsegment") == "FURNITURE", 2)
        .when(F.col("c_mktsegment") == "HOUSEHOLD", 3)
        .otherwise(4)
    )
    m = (
        o.join(
            F.broadcast(
                c.select(
                    F.col("c_custkey").alias("o_custkey"),
                    "c_nationkey",
                    "c_mktsegment",
                )
            ),
            "o_custkey",
        )
        .groupBy(
            (F.col("c_nationkey") % 5).alias("i"), seg_code.alias("j")
        )
        .agg(
            F.when(F.sum("o_totalprice") >= 20000000, 1)
            .otherwise(0)
            .alias("a")
        )
    )
    masks = spark.range(1, 32).select(F.col("id").cast("long").alias("mask"))
    rowsums = (
        m.crossJoin(F.broadcast(masks))
        .groupBy("mask", "i")
        .agg(
            F.sum(
                F.col("a")
                * F.expr("(mask DIV CAST(POW(2, j) AS BIGINT)) % 2")
            )
            .cast("long")
            .alias("rs")
        )
    )
    prod = (
        F.max(F.when(F.col("i") == 0, F.col("rs")))
        * F.max(F.when(F.col("i") == 1, F.col("rs")))
        * F.max(F.when(F.col("i") == 2, F.col("rs")))
        * F.max(F.when(F.col("i") == 3, F.col("rs")))
        * F.max(F.when(F.col("i") == 4, F.col("rs")))
    )
    products = rowsums.groupBy("mask").agg(
        prod.alias("prod"),
        F.expr(
            "CAST(((mask DIV 1) % 2) + ((mask DIV 2) % 2)"
            " + ((mask DIV 4) % 2) + ((mask DIV 8) % 2)"
            " + ((mask DIV 16) % 2) AS BIGINT)"
        ).alias("popcount"),
    )
    ones = m.agg(F.sum("a").cast("long").alias("n_ones"))
    return products.crossJoin(F.broadcast(ones)).agg(
        F.sum(
            F.when(
                (5 - F.col("popcount")) % 2 == 0, F.col("prod")
            ).otherwise(-F.col("prod"))
        )
        .cast("long")
        .alias("permanent"),
        F.first("n_ones").alias("n_ones"),
    )


@query("mtf_after_bwt_audit")
def mtf_after_bwt_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Move-to-front audit completing the bzip2 pipeline story: each
    sampled document prefix is MTF-coded twice — on the RAW text and
    on its Burrows-Wheeler transform — reporting the mean MTF code
    and the share of zero codes for both. BWT clusters same-context
    characters (`bwt_rle_compressibility` measured its run gain), so
    MTF after BWT should emit many more zeros/small codes than MTF on
    raw text — the measurable reason the BWT->MTF->RLE->entropy stack
    compresses. Rows-only by design (two sequential list-state
    transforms); invariants pin code ranges and the zero-share
    definition.

    Determinism: exact prefixes; rotation sort with offset
    tie-break; MTF alphabet initialized as the sorted distinct
    characters of each string.

    Scale shape: per-doc independent pandas work over the sampled
    closure; the heavy distributed part at corpus scale is the BWT
    (suffix-array territory), exactly as documented in the BWT query.
    """
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    d = (
        docs.filter(F.col("doc_id") % 25 == 0)
        .select("doc_id", F.substring(F.trim("text"), 1, 100).alias("t"))
        .filter(F.length("t") >= 10)
        .withColumn("g", F.lit(1))
    )

    def audit(pdf: pd.DataFrame) -> pd.DataFrame:
        def bwt(s_: str) -> str:
            n = len(s_)
            rots = sorted(
                range(n), key=lambda i: (s_[i:] + s_[:i], i)
            )
            return "".join(s_[(i + n - 1) % n] for i in rots)

        def mtf(s_: str):
            alpha = sorted(set(s_))
            codes = []
            for ch in s_:
                j = alpha.index(ch)
                codes.append(j)
                alpha.pop(j)
                alpha.insert(0, ch)
            return codes

        rows = []
        for _, row in pdf.iterrows():
            t = row["t"]
            raw = mtf(t)
            bw = mtf(bwt(t))
            rows.append(
                {
                    "doc_id": int(row["doc_id"]),
                    "n_chars": len(t),
                    "raw_mtf_mean_milli": int(
                        round(1000 * sum(raw) / len(raw))
                    ),
                    "bwt_mtf_mean_milli": int(
                        round(1000 * sum(bw) / len(bw))
                    ),
                    "raw_zero_ppm": (1000000 * raw.count(0)) // len(raw),
                    "bwt_zero_ppm": (1000000 * bw.count(0)) // len(bw),
                }
            )
        return pd.DataFrame(rows)

    return d.groupBy("g").applyInPandas(
        audit,
        schema=(
            "doc_id long, n_chars long, raw_mtf_mean_milli long, "
            "bwt_mtf_mean_milli long, raw_zero_ppm long, bwt_zero_ppm long"
        ),
    )


@query(
    "aitchison_clr_variation",
    oracle="""
    WITH comp AS (
        SELECT c.c_nationkey AS nk, c.c_mktsegment AS seg,
               SUM(o.o_totalprice) AS rev
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ), pairs AS (
        SELECT a.seg AS si, b.seg AS sj,
               LN(a.rev / b.rev) AS lr
        FROM comp a JOIN comp b
          ON b.nk = a.nk AND a.seg < b.seg
    )
    SELECT si AS seg_a, sj AS seg_b,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           ROUND(SUM(lr * lr) / COUNT(*)
                 - (SUM(lr) / COUNT(*)) * (SUM(lr) / COUNT(*)), 6)
               AS variation_t
    FROM pairs
    GROUP BY 1, 2
    """,
)
def aitchison_clr_variation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aitchison variation matrix of segment revenue COMPOSITIONS
    across nations: T_ij = var over nations of ln(share_i/share_j)
    (shares cancel the closure denominator, so raw revenues suffice)
    — the compositional-data-analysis object that ordinary
    correlations of shares get WRONG (closed compositions force
    spurious negative correlation; log-ratio variances are
    subcomposition-coherent). T_ij near 0 means segments i and j
    move in lockstep proportionally — the right way to read
    mix-shift questions that `source_mixture_allocation` and
    `duncan_dissimilarity_segments` treat as raw shares.

    Determinism: exact revenue ratios; population-variance expression
    trees identical; one rounding per pair.

    Scale shape: one nation x segment agg, a within-nation pair join
    of the 5-segment relation, and a 10-group variance agg.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    comp = (
        o.join(
            F.broadcast(
                c.select(
                    F.col("c_custkey").alias("o_custkey"),
                    "c_nationkey",
                    "c_mktsegment",
                )
            ),
            "o_custkey",
        )
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    a, b = comp.alias("a"), comp.alias("b")
    pairs = a.join(
        b,
        (F.col("b.nk") == F.col("a.nk"))
        & (F.col("a.seg") < F.col("b.seg")),
    ).select(
        F.col("a.seg").alias("si"),
        F.col("b.seg").alias("sj"),
        F.log(F.col("a.rev") / F.col("b.rev")).alias("lr"),
    )
    n_ = F.count(F.lit(1))
    return pairs.groupBy(
        F.col("si").alias("seg_a"), F.col("sj").alias("seg_b")
    ).agg(
        n_.cast("long").alias("n_nations"),
        F.round(
            F.sum(F.col("lr") * F.col("lr")) / n_
            - (F.sum("lr") / n_) * (F.sum("lr") / n_),
            6,
        ).alias("variation_t"),
    )


@query(
    "dersimonian_laird_meta",
    oracle="""
    WITH eff AS (
        -- per-nation 'study': urgent-rate difference vs the pooled
        -- complement, with a normal-approx SE
        SELECT c.c_nationkey AS nk,
               CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
                        THEN 1 ELSE 0 END) AS BIGINT) AS k,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1
    ), gl AS (SELECT SUM(k) * 1.0 / SUM(n) AS p0 FROM eff),
    studies AS (
        SELECT nk, k * 1.0 / n - gl.p0 AS y,
               (k * 1.0 / n) * (1.0 - k * 1.0 / n) / n AS v
        FROM eff, gl WHERE n >= 20 AND k > 0 AND k < n
    ), fixed AS (
        SELECT SUM(y / v) / SUM(1.0 / v) AS mu_f,
               SUM(1.0 / v) AS w_tot,
               SUM((1.0 / v) * (1.0 / v)) AS w2_tot,
               CAST(COUNT(*) AS BIGINT) AS m
        FROM studies
    ), q AS (
        SELECT SUM((y - fixed.mu_f) * (y - fixed.mu_f) / v) AS q
        FROM studies, fixed GROUP BY fixed.mu_f
    ), tau AS (
        SELECT GREATEST((q.q - (fixed.m - 1))
               / (fixed.w_tot - fixed.w2_tot / fixed.w_tot), 0.0) AS t2
        FROM q, fixed
    ), re AS (
        SELECT SUM(y / (v + tau.t2)) / SUM(1.0 / (v + tau.t2)) AS mu_r,
               1.0 / SUM(1.0 / (v + tau.t2)) AS var_r
        FROM studies, tau GROUP BY tau.t2
    )
    SELECT fixed.m AS n_studies,
           ROUND(fixed.mu_f, 6) AS fixed_effect,
           ROUND(q.q, 4) AS cochran_q,
           ROUND(tau.t2, 8) AS tau_squared,
           ROUND(re.mu_r, 6) AS random_effect,
           ROUND(SQRT(re.var_r), 6) AS random_se,
           CAST(ROUND(1000000 * GREATEST(
               (q.q - (fixed.m - 1)) / NULLIF(q.q, 0), 0.0))
               AS BIGINT) AS i_squared_ppm
    FROM fixed, q, tau, re
    """,
)
def dersimonian_laird_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DerSimonian-Laird random-effects meta-analysis pooling the 25
    nations as 'studies' of the urgent-rate deviation: the
    inverse-variance fixed effect, Cochran's Q heterogeneity, the DL
    between-study variance tau^2 = max(0, (Q-(m-1))/(W - W2/W)), the
    random-effects pooled estimate, and I^2 — the evidence-synthesis
    stack used verbatim in clinical meta-analysis. Between-study
    heterogeneity is exactly what `james_stein_nation_means` /
    `buhlmann_credibility` shrink against — DL QUANTIFIES it (tau^2,
    I^2) before pooling, which is why it is the reporting standard.

    Determinism: exact counts; identical double moment trees;
    rounding at output.

    Scale shape: one 25-group agg, then three scalar combines — the
    whole synthesis is dimension-sized.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    eff = (
        o.join(
            F.broadcast(
                c.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            )
            .cast("long")
            .alias("k"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    gl = eff.agg((F.sum("k") * 1.0 / F.sum("n")).alias("p0"))
    p = F.col("k") * 1.0 / F.col("n")
    studies = (
        eff.crossJoin(F.broadcast(gl))
        .filter(
            (F.col("n") >= 20) & (F.col("k") > 0) & (F.col("k") < F.col("n"))
        )
        .select(
            "nk",
            (p - F.col("p0")).alias("y"),
            (p * (1.0 - p) / F.col("n")).alias("v"),
        )
        .transform(_ckpt)
    )
    fixed = studies.agg(
        (F.sum(F.col("y") / F.col("v")) / F.sum(1.0 / F.col("v"))).alias(
            "mu_f"
        ),
        F.sum(1.0 / F.col("v")).alias("w_tot"),
        F.sum((1.0 / F.col("v")) * (1.0 / F.col("v"))).alias("w2_tot"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    q = studies.crossJoin(F.broadcast(fixed)).groupBy("mu_f").agg(
        F.sum(
            (F.col("y") - F.col("mu_f"))
            * (F.col("y") - F.col("mu_f"))
            / F.col("v")
        ).alias("q")
    )
    tau = q.crossJoin(F.broadcast(fixed.drop("mu_f"))).select(
        F.greatest(
            (F.col("q") - (F.col("m") - 1))
            / (F.col("w_tot") - F.col("w2_tot") / F.col("w_tot")),
            F.lit(0.0),
        ).alias("t2"),
        "q",
        "m",
        "mu_f",
    )
    re = studies.crossJoin(F.broadcast(tau.select("t2"))).groupBy(
        "t2"
    ).agg(
        (
            F.sum(F.col("y") / (F.col("v") + F.col("t2")))
            / F.sum(1.0 / (F.col("v") + F.col("t2")))
        ).alias("mu_r"),
        (1.0 / F.sum(1.0 / (F.col("v") + F.col("t2")))).alias("var_r"),
    )
    return tau.crossJoin(F.broadcast(re.drop("t2"))).select(
        F.col("m").alias("n_studies"),
        F.round("mu_f", 6).alias("fixed_effect"),
        F.round("q", 4).alias("cochran_q"),
        F.round("t2", 8).alias("tau_squared"),
        F.round("mu_r", 6).alias("random_effect"),
        F.round(F.sqrt("var_r"), 6).alias("random_se"),
        F.round(
            1000000
            * F.greatest(
                (F.col("q") - (F.col("m") - 1))
                / F.nullif(F.col("q"), F.lit(0.0)),
                F.lit(0.0),
            )
        )
        .cast("long")
        .alias("i_squared_ppm"),
    )


@query(
    "liu_layland_schedulability",
    oracle="""
    WITH tasks AS (
        -- periodic task per event type: period = mean interarrival
        -- seconds, wcet = mean value deciseconds / 10
        SELECT event_type,
               (epoch_us(MAX(ts)) - epoch_us(MIN(ts)))
               / (1000000.0 * (COUNT(*) - 1)) AS period_s,
               CAST(ROUND(SUM(value) * 10) AS BIGINT)
               / (10.0 * COUNT(*)) / 100.0 AS wcet_s
        FROM events GROUP BY 1
    ), u AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(wcet_s / period_s) AS util
        FROM tasks
    )
    SELECT u.n AS n_tasks,
           ROUND(u.util, 6) AS total_utilization,
           ROUND(u.n * (POW(2.0, 1.0 / u.n) - 1.0), 6) AS rm_bound,
           CAST(CASE WHEN u.util <= u.n * (POW(2.0, 1.0 / u.n) - 1.0)
                THEN 1 ELSE 0 END AS BIGINT) AS rm_schedulable,
           CAST(CASE WHEN u.util <= 1.0 THEN 1 ELSE 0 END AS BIGINT)
               AS edf_schedulable
    FROM u
    """,
)
def liu_layland_schedulability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Liu-Layland schedulability test on the event workload modeled
    as periodic tasks (one per event type; period = mean interarrival,
    WCET = scaled mean value): total utilization U is compared with
    the rate-monotonic bound n(2^(1/n) - 1) ~ ln 2 and the EDF bound
    1.0 — the founding theorem of real-time scheduling, the
    ADMISSION-TEST complement of the replay queries
    (`fifo_vs_sjf_replay` simulates; Liu-Layland certifies a-priori
    whether deadlines CAN be met under RM/EDF). A workload passing
    EDF but failing RM quantifies the price of static priorities.

    Determinism: microsecond-exact spans and integer deciseconds;
    identical double trees; rounding at output.

    Scale shape: one agg per task stream, scalar bounds — admission
    tests are always control-plane-sized.
    """
    ev = load_table(spark, sf_dir, "events")
    tasks = ev.groupBy("event_type").agg(
        (
            (
                F.unix_micros(F.max("ts").cast("timestamp"))
                - F.unix_micros(F.min("ts").cast("timestamp"))
            )
            / (1000000.0 * (F.count(F.lit(1)) - 1))
        ).alias("period_s"),
        (
            F.round(F.sum("value") * 10).cast("long")
            / (10.0 * F.count(F.lit(1)))
            / 100.0
        ).alias("wcet_s"),
    )
    u = tasks.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("wcet_s") / F.col("period_s")).alias("util"),
    )
    rm = F.col("n") * (F.pow(F.lit(2.0), 1.0 / F.col("n")) - 1.0)
    return u.select(
        F.col("n").alias("n_tasks"),
        F.round("util", 6).alias("total_utilization"),
        F.round(rm, 6).alias("rm_bound"),
        F.when(F.col("util") <= rm, 1).otherwise(0).cast("long").alias(
            "rm_schedulable"
        ),
        F.when(F.col("util") <= 1.0, 1).otherwise(0).cast("long").alias(
            "edf_schedulable"
        ),
    )


@query(
    "usl_scalability_fit",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), lam AS (
        -- lambda: average per-user throughput at the lowest
        -- concurrency observed
        SELECT SUM(x) * 1.0 / SUM(n) AS l
        FROM hourly
        WHERE n = (SELECT MIN(n) FROM hourly)
    ), grid AS (
        SELECT s.s / 1000.0 AS sigma, k.k / 10000.0 AS kappa
        FROM (SELECT unnest(generate_series(0, 50, 5)) AS s) s,
             (SELECT unnest(generate_series(0, 20, 2)) AS k) k
    ), sse AS (
        SELECT grid.sigma, grid.kappa,
               SUM((hourly.x - lam.l * hourly.n
                    / (1.0 + grid.sigma * (hourly.n - 1)
                       + grid.kappa * hourly.n * (hourly.n - 1)))
                   * (hourly.x - lam.l * hourly.n
                      / (1.0 + grid.sigma * (hourly.n - 1)
                         + grid.kappa * hourly.n * (hourly.n - 1))))
                   AS sse
        FROM hourly CROSS JOIN grid CROSS JOIN lam
        GROUP BY 1, 2
    ), best AS (
        SELECT sigma, kappa, sse FROM sse
        ORDER BY sse, sigma, kappa LIMIT 1
    )
    SELECT ROUND((SELECT l FROM lam), 4) AS lambda_per_user,
           ROUND(best.sigma, 4) AS sigma_contention,
           ROUND(best.kappa, 5) AS kappa_crosstalk,
           CAST((SELECT COUNT(*) FROM hourly) AS BIGINT) AS n_hours,
           CAST(CASE WHEN best.kappa > 0
                THEN CAST(FLOOR(SQRT((1.0 - best.sigma) / best.kappa))
                     AS BIGINT)
                ELSE NULL END AS BIGINT) AS peak_concurrency
    FROM best
    """,
)
def usl_scalability_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Universal Scalability Law fit (Gunther) to the hourly
    concurrency-throughput cloud: X(N) = lambda N / (1 + sigma(N-1) +
    kappa N(N-1)) with contention sigma and crosstalk kappa chosen by
    exact grid search (11 x 11 literal grid), lambda anchored at the
    lowest observed concurrency. The capacity-planning readout is the
    USL peak N* = sqrt((1-sigma)/kappa) — beyond it, adding
    concurrency REDUCES throughput. The system-level sibling of
    `amdahl`-style reasoning the queueing family
    (`erlang_c_staffing`, `pollaczek_khinchine_mg1`) approaches
    per-server: USL is what you fit to observed cluster telemetry.

    Determinism: exact hourly counts; literal grid; identical SSE
    trees; (sse, sigma, kappa) argmin tie-break.

    Scale shape: one hourly agg, a broadcast grid cross, one grouped
    SSE — a single pass over telemetry-grain data.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.countDistinct("user_id").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("x"),
    )
    hourly = hourly.transform(_ckpt)
    minn = hourly.agg(F.min("n").alias("mn"))
    lam = hourly.crossJoin(F.broadcast(minn)).filter(
        F.col("n") == F.col("mn")
    ).agg((F.sum("x") * 1.0 / F.sum("n")).alias("l"))
    ss = spark.range(0, 51).filter(F.col("id") % 5 == 0).select(
        (F.col("id") / 1000.0).alias("sigma")
    )
    kk = spark.range(0, 21).filter(F.col("id") % 2 == 0).select(
        (F.col("id") / 10000.0).alias("kappa")
    )
    grid = ss.crossJoin(kk)
    pred = F.col("l") * F.col("n") / (
        1.0
        + F.col("sigma") * (F.col("n") - 1)
        + F.col("kappa") * F.col("n") * (F.col("n") - 1)
    )
    sse = (
        hourly.crossJoin(F.broadcast(grid))
        .crossJoin(F.broadcast(lam))
        .groupBy("sigma", "kappa")
        .agg(F.sum((F.col("x") - pred) * (F.col("x") - pred)).alias("sse"))
    )
    best = sse.orderBy("sse", "sigma", "kappa").limit(1)
    nh = hourly.agg(F.count(F.lit(1)).cast("long").alias("n_hours"))
    return (
        best.crossJoin(F.broadcast(lam))
        .crossJoin(F.broadcast(nh))
        .select(
            F.round("l", 4).alias("lambda_per_user"),
            F.round("sigma", 4).alias("sigma_contention"),
            F.round("kappa", 5).alias("kappa_crosstalk"),
            "n_hours",
            F.when(
                F.col("kappa") > 0,
                F.floor(
                    F.sqrt((1.0 - F.col("sigma")) / F.col("kappa"))
                ).cast("long"),
            )
            .otherwise(F.lit(None).cast("long"))
            .alias("peak_concurrency"),
        )
    )


@query(
    "krippendorff_alpha_nominal",
    oracle="""
    WITH units AS (
        SELECT o_orderkey,
               NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS r1,
               NTILE(4) OVER (ORDER BY o_custkey % 97, o_orderkey) AS r2
        FROM orders
    ), pairs AS (
        -- coincidence matrix for 2 raters: each unit contributes the
        -- ordered pairs (r1, r2) and (r2, r1)
        SELECT r1 AS a, r2 AS b FROM units
        UNION ALL SELECT r2, r1 FROM units
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pairs),
    marg AS (
        SELECT a, CAST(COUNT(*) AS BIGINT) AS c FROM pairs GROUP BY 1
    ), do_ AS (
        SELECT SUM(CASE WHEN a <> b THEN 1 ELSE 0 END) * 1.0
               / COUNT(*) AS d_obs
        FROM pairs
    ), de AS (
        SELECT 1.0 - SUM(c * 1.0 * (c - 1))
               / (n.n * 1.0 * (n.n - 1)) AS d_exp
        FROM marg, n GROUP BY n.n
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM units) AS n_units,
           ROUND(do_.d_obs, 6) AS disagreement_obs,
           ROUND(de.d_exp, 6) AS disagreement_exp,
           ROUND(1.0 - do_.d_obs / de.d_exp, 6) AS alpha
    FROM do_, de
    """,
)
def krippendorff_alpha_nominal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal metric, two raters) measuring
    agreement between two quartile labelings of orders (price-based
    vs a hashed-customer pseudo-rating): alpha = 1 - D_obs/D_exp with
    the expected disagreement computed from the COINCIDENCE matrix
    margins — the chance-corrected reliability coefficient that
    generalizes `classifier_agreement_kappa` (two raters, fixed
    margins) and `fleiss_kappa_returnflags` (many raters) to any
    metric, missing-data-tolerant by construction. Near-zero alpha
    here is itself the point: an independent hash 'rater' must not
    agree beyond chance — a calibration check for the agreement
    family.

    Determinism: NTILE with total tie-break orders; exact coincidence
    counts; one rounded ratio chain.

    Scale shape: two range-bucketed distributed NTILEs
    (``operators/rank.py`` — no single-task windows), a union, two
    tiny aggs.
    """
    from pyspark_movie_recommender_spark.operators.rank import (
        distributed_ntile,
    )

    o = load_table(spark, sf_dir, "orders")
    t1 = distributed_ntile(
        o.select(
            "o_totalprice", "o_orderkey", (F.col("o_custkey") % 97).alias("h")
        ),
        "o_totalprice",
        ["o_orderkey"],
        4,
        out_col="r1",
    )
    units = distributed_ntile(t1, "h", ["o_orderkey"], 4, out_col="r2").select(
        "r1", "r2"
    )
    units = units.transform(_ckpt)
    pairs = units.select(
        F.col("r1").alias("a"), F.col("r2").alias("b")
    ).unionAll(units.select(F.col("r2").alias("a"), F.col("r1").alias("b")))
    n = pairs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    marg = pairs.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("c"))
    do_ = pairs.agg(
        (
            F.sum(F.when(F.col("a") != F.col("b"), 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1))
        ).alias("d_obs")
    )
    de = marg.crossJoin(F.broadcast(n)).groupBy("n").agg(
        (
            1.0
            - F.sum(F.col("c") * 1.0 * (F.col("c") - 1))
            / (F.col("n") * 1.0 * (F.col("n") - 1))
        ).alias("d_exp")
    )
    nu = units.agg(F.count(F.lit(1)).cast("long").alias("n_units"))
    return (
        nu.crossJoin(F.broadcast(do_))
        .crossJoin(F.broadcast(de.select("d_exp")))
        .select(
            "n_units",
            F.round("d_obs", 6).alias("disagreement_obs"),
            F.round("d_exp", 6).alias("disagreement_exp"),
            F.round(1.0 - F.col("d_obs") / F.col("d_exp"), 6).alias(
                "alpha"
            ),
        )
    )


@query("cusum_arl_markov")
def cusum_arl_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-control average run length (ARL0) of a CUSUM chart computed
    by the Brook-Evans Markov-chain method with EXACT rational
    arithmetic: daily revenue z-ish increments are discretized into
    exact-count probability atoms, the CUSUM state space [0, h) is
    binned into 8 cells plus the absorbing alarm state, and ARL from
    each start is (I - Q)^-1 1 solved over Fractions with the
    declarative residual carried in-row. The chart-DESIGN number the
    monitoring family runs on: `cusum_changepoint_daily` and
    `page_hinkley_drift` fire alarms; ARL0 says how often they
    false-alarm, which is how h and the drift allowance are chosen.

    Determinism: exact integer increment atoms (counts over the
    discretized empirical distribution); exact fundamental-matrix
    solve; micro rounding at output only.

    Scale shape: increments are one LAG window + histogram agg; the
    9-state solve is one closure call; the residual is a broadcast
    matvec.
    """
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100).cast("long").alias("x")
    )
    w = Window.orderBy("day")
    stats = d.agg(
        (F.sum("x") * 1.0 / F.count(F.lit(1))).alias("mu"),
        F.sqrt(
            F.sum(F.col("x") * F.col("x")) * 1.0 / F.count(F.lit(1))
            - (F.sum("x") * 1.0 / F.count(F.lit(1)))
            * (F.sum("x") * 1.0 / F.count(F.lit(1)))
        ).alias("sd"),
    )
    # discretize standardized increments into integer atoms -4..4
    incr = (
        d.crossJoin(F.broadcast(stats))
        .select(
            F.least(
                F.greatest(
                    F.round(
                        (F.col("x") - F.col("mu")) / F.col("sd")
                    ).cast("long"),
                    F.lit(-4),
                ),
                F.lit(4),
            ).alias("z")
        )
        .groupBy("z")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn("g", F.lit(1))
        .transform(_ckpt)
    )

    def arl(pdf: pd.DataFrame) -> pd.DataFrame:
        from fractions import Fraction as Fr

        atoms = {int(r["z"]): int(r["c"]) for _, r in pdf.iterrows()}
        tot = sum(atoms.values())
        # CUSUM S_t = max(0, S_{t-1} + z_t - kref), kref = 0 (drift
        # allowance folded into atoms), alarm at S >= h = 8 half-units
        # states 0..7 (S value in half-sigma units), 8 = absorbed
        m = 8
        Q = [[Fr(0)] * m for _ in range(m)]
        for s_ in range(m):
            for z, c in atoms.items():
                nxt = max(0, s_ + z)
                p = Fr(c, tot)
                if nxt < m:
                    Q[s_][nxt] += p
        # ARL = (I - Q)^-1 1
        A = [
            [
                (Fr(1) if i == j else Fr(0)) - Q[i][j]
                for j in range(m)
            ]
            + [Fr(1)]
            for i in range(m)
        ]
        for col in range(m):
            piv = next(r for r in range(col, m) if A[r][col] != 0)
            A[col], A[piv] = A[piv], A[col]
            pv = A[col][col]
            A[col] = [x_ / pv for x_ in A[col]]
            for r in range(m):
                if r != col and A[r][col] != 0:
                    f = A[r][col]
                    A[r] = [x_ - f * y_ for x_, y_ in zip(A[r], A[col])]
        arl_v = [A[i][m] for i in range(m)]
        # residual of the linear system on the exact solution
        resid = max(
            abs(
                arl_v[i]
                - Fr(1)
                - sum(Q[i][j] * arl_v[j] for j in range(m))
            )
            for i in range(m)
        )
        return pd.DataFrame(
            {
                "start_state": list(range(m)),
                "arl_micro": [int(v * 1000000) for v in arl_v],
                "resid_micro": [int(resid * 1000000)] * m,
            }
        )

    return incr.groupBy("g").applyInPandas(
        arl, schema="start_state long, arl_micro long, resid_micro long"
    )


@query(
    "gph_long_memory",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(ROUND(SUM(value) * 100) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), r AS (
        SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT)
                   AS t,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM d
    ), freqs AS (
        SELECT CAST(j.j AS BIGINT) AS j,
               2 * pi() * j.j / (SELECT MAX(n) FROM r) AS w
        FROM (SELECT unnest(generate_series(1, 8)) AS j) j
    ), dft AS (
        SELECT freqs.j, freqs.w,
               SUM(r.x * cos(freqs.w * r.t)) AS re,
               SUM(r.x * sin(freqs.w * r.t)) AS im
        FROM r CROSS JOIN freqs
        GROUP BY 1, 2
    ), pts AS (
        SELECT LN((re * re + im * im)
               / (2 * pi() * (SELECT MAX(n) FROM r))) AS y,
               LN(4 * sin(w / 2.0) * sin(w / 2.0)) AS xv
        FROM dft
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_freqs,
           ROUND(-(SUM(xv * y) - SUM(xv) * SUM(y) / COUNT(*))
                 / (SUM(xv * xv) - SUM(xv) * SUM(xv) / COUNT(*)), 6)
               AS d_gph,
           ROUND(0.5 + -(SUM(xv * y) - SUM(xv) * SUM(y) / COUNT(*))
                 / (SUM(xv * xv) - SUM(xv) * SUM(xv) / COUNT(*)), 6)
               AS implied_hurst
    FROM pts
    """,
)
def gph_long_memory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPH (Geweke-Porter-Hudak) long-memory estimator for the daily
    revenue series: the log-periodogram at the first 8 Fourier
    frequencies is regressed on log(4 sin^2(w/2)); minus the slope is
    the fractional-differencing order d, and H = d + 1/2 the implied
    Hurst exponent — the FREQUENCY-domain long-memory estimate that
    cross-checks `hurst_rescaled_range` (time-domain R/S): agreement
    of the two is the standard evidence that persistence is real
    rather than an artifact of either method.

    Determinism: exact integer series; DFT sums accumulate the same
    trig terms on both engines (shared expression shape, 1-ulp libm
    noise far below rounding); OLS closed form; rounding at output.

    Scale shape: one day agg, an 8-frequency broadcast DFT (direct
    form — see `welch_psd_hourly` for why FFT is unnecessary at this
    bin count), and a scalar regression.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100).cast("long").alias("x")
    )
    r = d.select(
        "x",
        (F.row_number().over(Window.orderBy("day")) - 1)
        .cast("long")
        .alias("t"),
    ).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy()).cast("long")
    )
    r = r.transform(_ckpt)
    nmax = r.agg(F.max("n").alias("nn"))
    freqs = (
        spark.range(1, 9)
        .select(F.col("id").cast("long").alias("j"))
        .crossJoin(F.broadcast(nmax))
        .select(
            "j",
            (2 * 3.141592653589793 * F.col("j") / F.col("nn")).alias("w"),
            "nn",
        )
    )
    dft = (
        r.crossJoin(F.broadcast(freqs))
        .groupBy("j", "w", "nn")
        .agg(
            F.sum(F.col("x") * F.cos(F.col("w") * F.col("t"))).alias("re"),
            F.sum(F.col("x") * F.sin(F.col("w") * F.col("t"))).alias("im"),
        )
    )
    pts = dft.select(
        F.log(
            (F.col("re") * F.col("re") + F.col("im") * F.col("im"))
            / (2 * 3.141592653589793 * F.col("nn"))
        ).alias("y"),
        F.log(
            4 * F.sin(F.col("w") / 2.0) * F.sin(F.col("w") / 2.0)
        ).alias("xv"),
    )
    n_ = F.count(F.lit(1))
    slope = (
        F.sum(F.col("xv") * F.col("y")) - F.sum("xv") * F.sum("y") / n_
    ) / (F.sum(F.col("xv") * F.col("xv")) - F.sum("xv") * F.sum("xv") / n_)
    return pts.agg(
        n_.cast("long").alias("n_freqs"),
        F.round(-slope, 6).alias("d_gph"),
        F.round(0.5 + -slope, 6).alias("implied_hurst"),
    )


@query(
    "cca_2x2_closed_form",
    oracle="""
    WITH pts AS (
        SELECT l_quantity AS x1, l_extendedprice AS x2,
               l_discount AS y1, l_tax AS y2
        FROM lineitem
    ), mom AS (
        SELECT COUNT(*) AS n,
               AVG(x1) AS m_x1, AVG(x2) AS m_x2,
               AVG(y1) AS m_y1, AVG(y2) AS m_y2,
               AVG(x1*x1) AS x1x1, AVG(x1*x2) AS x1x2,
               AVG(x2*x2) AS x2x2,
               AVG(y1*y1) AS y1y1, AVG(y1*y2) AS y1y2,
               AVG(y2*y2) AS y2y2,
               AVG(x1*y1) AS x1y1, AVG(x1*y2) AS x1y2,
               AVG(x2*y1) AS x2y1, AVG(x2*y2) AS x2y2
        FROM pts
    ), cov AS (
        SELECT x1x1 - m_x1*m_x1 AS sxx11, x1x2 - m_x1*m_x2 AS sxx12,
               x2x2 - m_x2*m_x2 AS sxx22,
               y1y1 - m_y1*m_y1 AS syy11, y1y2 - m_y1*m_y2 AS syy12,
               y2y2 - m_y2*m_y2 AS syy22,
               x1y1 - m_x1*m_y1 AS sxy11, x1y2 - m_x1*m_y2 AS sxy12,
               x2y1 - m_x2*m_y1 AS sxy21, x2y2 - m_x2*m_y2 AS sxy22
        FROM mom
    ), mats AS (
        -- M = Sxx^-1 Sxy Syy^-1 Syx (2x2); canonical corr^2 =
        -- eigenvalues of M via trace/det quadratic
        SELECT
          (( syy22*sxy11 - syy12*sxy12) * ( sxx22*sxy11 - sxx12*sxy21)
           + (-syy12*sxy11 + syy11*sxy12) * ( sxx22*sxy12 - sxx12*sxy22))
          / ((sxx11*sxx22 - sxx12*sxx12) * (syy11*syy22 - syy12*syy12))
              AS m11,
          (( syy22*sxy21 - syy12*sxy22) * (-sxx12*sxy11 + sxx11*sxy21)
           + (-syy12*sxy21 + syy11*sxy22) * (-sxx12*sxy12 + sxx11*sxy22))
          / ((sxx11*sxx22 - sxx12*sxx12) * (syy11*syy22 - syy12*syy12))
              AS m22,
          (( syy22*sxy11 - syy12*sxy12) * (-sxx12*sxy11 + sxx11*sxy21)
           + (-syy12*sxy11 + syy11*sxy12) * (-sxx12*sxy12 + sxx11*sxy22))
          / ((sxx11*sxx22 - sxx12*sxx12) * (syy11*syy22 - syy12*syy12))
              AS m12,
          (( syy22*sxy21 - syy12*sxy22) * ( sxx22*sxy11 - sxx12*sxy21)
           + (-syy12*sxy21 + syy11*sxy22) * ( sxx22*sxy12 - sxx12*sxy22))
          / ((sxx11*sxx22 - sxx12*sxx12) * (syy11*syy22 - syy12*syy12))
              AS m21
        FROM cov
    )
    SELECT ROUND(SQRT(GREATEST(
               (m11 + m22) / 2.0
               + SQRT(GREATEST((m11 + m22) * (m11 + m22) / 4.0
                      - (m11 * m22 - m12 * m21), 0.0)), 0.0)), 6)
               AS rho1,
           ROUND(SQRT(GREATEST(
               (m11 + m22) / 2.0
               - SQRT(GREATEST((m11 + m22) * (m11 + m22) / 4.0
                      - (m11 * m22 - m12 * m21), 0.0)), 0.0)), 6)
               AS rho2
    FROM mats
    """,
)
def cca_2x2_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical correlation analysis between the quantity/price block
    and the discount/tax block of lineitem, solved in CLOSED FORM:
    the 2x2 matrix M = Sxx^-1 Sxy Syy^-1 Syx is assembled from the
    14 cross-moments and its two eigenvalues (trace/det quadratic)
    are the squared canonical correlations — the multiview
    dependence measure completing `pca2_price_quantity` (one block),
    `rv_coefficient_periods` (whole-matrix congruence), and
    `partial_correlation_controlling` (single-pair): CCA finds the
    best LINEAR COMBINATIONS linking two variable sets.

    Determinism: one moment census with identical expression trees;
    fixed algebra; rounding at the end (negative-rounding guards on
    the discriminant).

    Scale shape: a single streaming moment agg (map-side partials)
    carries the entire analysis; the 2x2 algebra is in-row.
    """
    l = load_table(spark, sf_dir, "lineitem")
    pts = l.select(
        F.col("l_quantity").alias("x1"),
        F.col("l_extendedprice").alias("x2"),
        F.col("l_discount").alias("y1"),
        F.col("l_tax").alias("y2"),
    )
    mom = pts.agg(
        F.avg("x1").alias("m_x1"),
        F.avg("x2").alias("m_x2"),
        F.avg("y1").alias("m_y1"),
        F.avg("y2").alias("m_y2"),
        F.avg(F.col("x1") * F.col("x1")).alias("x1x1"),
        F.avg(F.col("x1") * F.col("x2")).alias("x1x2"),
        F.avg(F.col("x2") * F.col("x2")).alias("x2x2"),
        F.avg(F.col("y1") * F.col("y1")).alias("y1y1"),
        F.avg(F.col("y1") * F.col("y2")).alias("y1y2"),
        F.avg(F.col("y2") * F.col("y2")).alias("y2y2"),
        F.avg(F.col("x1") * F.col("y1")).alias("x1y1"),
        F.avg(F.col("x1") * F.col("y2")).alias("x1y2"),
        F.avg(F.col("x2") * F.col("y1")).alias("x2y1"),
        F.avg(F.col("x2") * F.col("y2")).alias("x2y2"),
    )
    cov = mom.select(
        (F.col("x1x1") - F.col("m_x1") * F.col("m_x1")).alias("sxx11"),
        (F.col("x1x2") - F.col("m_x1") * F.col("m_x2")).alias("sxx12"),
        (F.col("x2x2") - F.col("m_x2") * F.col("m_x2")).alias("sxx22"),
        (F.col("y1y1") - F.col("m_y1") * F.col("m_y1")).alias("syy11"),
        (F.col("y1y2") - F.col("m_y1") * F.col("m_y2")).alias("syy12"),
        (F.col("y2y2") - F.col("m_y2") * F.col("m_y2")).alias("syy22"),
        (F.col("x1y1") - F.col("m_x1") * F.col("m_y1")).alias("sxy11"),
        (F.col("x1y2") - F.col("m_x1") * F.col("m_y2")).alias("sxy12"),
        (F.col("x2y1") - F.col("m_x2") * F.col("m_y1")).alias("sxy21"),
        (F.col("x2y2") - F.col("m_x2") * F.col("m_y2")).alias("sxy22"),
    )
    dx = (F.col("sxx11") * F.col("sxx22") - F.col("sxx12") * F.col("sxx12"))
    dy = (F.col("syy11") * F.col("syy22") - F.col("syy12") * F.col("syy12"))
    # A = Syy^-1-weighted products, then Sxx^-1 weighting
    a11 = F.col("syy22") * F.col("sxy11") - F.col("syy12") * F.col("sxy12")
    a12 = -F.col("syy12") * F.col("sxy11") + F.col("syy11") * F.col("sxy12")
    a21 = F.col("syy22") * F.col("sxy21") - F.col("syy12") * F.col("sxy22")
    a22 = -F.col("syy12") * F.col("sxy21") + F.col("syy11") * F.col("sxy22")
    b11 = F.col("sxx22") * F.col("sxy11") - F.col("sxx12") * F.col("sxy21")
    b12 = F.col("sxx22") * F.col("sxy12") - F.col("sxx12") * F.col("sxy22")
    b21 = -F.col("sxx12") * F.col("sxy11") + F.col("sxx11") * F.col("sxy21")
    b22 = -F.col("sxx12") * F.col("sxy12") + F.col("sxx11") * F.col("sxy22")
    m11 = (a11 * b11 + a12 * b12) / (dx * dy)
    m22 = (a21 * b21 + a22 * b22) / (dx * dy)
    m12 = (a11 * b21 + a12 * b22) / (dx * dy)
    m21 = (a21 * b11 + a22 * b12) / (dx * dy)
    mats = cov.select(
        m11.alias("m11"), m22.alias("m22"), m12.alias("m12"), m21.alias("m21")
    )
    tr2 = (F.col("m11") + F.col("m22")) / 2.0
    disc = F.sqrt(
        F.greatest(
            (F.col("m11") + F.col("m22"))
            * (F.col("m11") + F.col("m22"))
            / 4.0
            - (F.col("m11") * F.col("m22") - F.col("m12") * F.col("m21")),
            F.lit(0.0),
        )
    )
    return mats.select(
        F.round(
            F.sqrt(F.greatest(tr2 + disc, F.lit(0.0))), 6
        ).alias("rho1"),
        F.round(
            F.sqrt(F.greatest(tr2 - disc, F.lit(0.0))), 6
        ).alias("rho2"),
    )


@query("steiner_tree_dreyfus_wagner")
def steiner_tree_dreyfus_wagner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steiner tree on the nation trade graph (edge cost = 1e15 DIV
    revenue-cents, so busy corridors are cheap), terminals = nations
    {0, 6, 12, 18, 24}: the OPTIMAL cost is computed exactly by the
    Dreyfus-Wagner subset DP (2^|T| x |V| states over all-pairs
    shortest paths), and alongside it the classic metric-closure MST
    2-APPROXIMATION tree is emitted edge by edge. Three certificates
    travel with the result: optimal <= heuristic (DW is a lower
    bound by optimality), heuristic <= 2 x optimal (the
    Kou-Markowsky-Berman theorem), and the emitted tree's
    connectivity over the terminals is re-verified DECLARATIVELY with
    the repo's `connected_components`. The multi-terminal
    generalization of `bellman_ford_trade_costs` (one pair) and
    `minimax_mst_trade_backbone` (all nodes): Steiner picks WHICH
    non-terminals to pass through.

    Determinism: integer costs; Dijkstra and DW with index
    tie-breaks; MST by (cost, u, v) Kruskal order.

    Scale shape: graph collapse is the fact agg; DW runs in one
    closure call (exponential in |T| = 5 only); the certificate is
    one label-propagation run on the emitted edge relation.
    """
    import heapq
    import itertools

    import pandas as pd

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    flows = (
        l.join(
            F.broadcast(
                s.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")
            ),
            "l_suppkey",
        )
        .join(
            o.select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"),
            "l_orderkey",
        )
        .join(
            F.broadcast(
                c.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.least("s_nationkey", "c_nationkey").cast("long").alias("u"),
            F.greatest("s_nationkey", "c_nationkey").cast("long").alias("v"),
        )
        .agg(
            F.expr(
                "CAST(1000000000000000 DIV SUM(CAST(ROUND("
                "l_extendedprice * 100) AS BIGINT)) AS BIGINT)"
            ).alias("cost")
        )
        .withColumn("g", F.lit(1))
        .transform(_ckpt)
    )

    def steiner(pdf: pd.DataFrame) -> pd.DataFrame:
        nodes = sorted(set(pdf["u"]) | set(pdf["v"]))
        adj: dict[int, list] = {n_: [] for n_ in nodes}
        cost = {}
        for _, row in pdf.iterrows():
            u, v, w = int(row["u"]), int(row["v"]), int(row["cost"])
            adj[u].append((v, w))
            adj[v].append((u, w))
            cost[(u, v)] = w
        INF = float("inf")

        def dijkstra(src):
            dist = {n_: INF for n_ in nodes}
            prev = {}
            dist[src] = 0
            pq = [(0, src)]
            while pq:
                d_, u = heapq.heappop(pq)
                if d_ > dist[u]:
                    continue
                for (v, w) in sorted(adj[u]):
                    nd = d_ + w
                    if nd < dist[v]:
                        dist[v] = nd
                        prev[v] = u
                        heapq.heappush(pq, (nd, v))
            return dist, prev

        terms = [t for t in (0, 6, 12, 18, 24) if t in adj]
        sp = {}
        spprev = {}
        for t in set(terms) | set(nodes):
            sp[t], spprev[t] = dijkstra(t)
        # Dreyfus-Wagner: S[mask][v] over terminal subsets
        k = len(terms)
        tidx = {t: i for i, t in enumerate(terms)}
        S = [[INF] * len(nodes) for _ in range(1 << k)]
        nidx = {n_: i for i, n_ in enumerate(nodes)}
        for t in terms:
            for n_ in nodes:
                S[1 << tidx[t]][nidx[n_]] = sp[t][n_]
        for mask in range(1, 1 << k):
            if mask & (mask - 1) == 0:
                continue
            # split step
            for n_ in nodes:
                best = INF
                sub = (mask - 1) & mask
                while sub:
                    val = S[sub][nidx[n_]] + S[mask ^ sub][nidx[n_]]
                    if val < best:
                        best = val
                    sub = (sub - 1) & mask
                S[mask][nidx[n_]] = min(S[mask][nidx[n_]], best)
            # propagate via shortest paths (merge step)
            for n_ in nodes:
                base = S[mask][nidx[n_]]
                if base < INF:
                    for m_ in nodes:
                        val = base + sp[n_][m_]
                        if val < S[mask][nidx[m_]]:
                            S[mask][nidx[m_]] = val
        full = (1 << k) - 1
        opt = min(S[full][nidx[t]] for t in terms)
        # metric-closure MST heuristic + path unfolding
        import math

        pairs = sorted(
            (sp[a][b], a, b)
            for i, a in enumerate(terms)
            for b in terms[i + 1:]
        )
        parent = {t: t for t in terms}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        tree_edges = set()
        for (w_, a, b) in pairs:
            if find(a) != find(b):
                parent[find(a)] = find(b)
                # unfold the shortest path a->b into graph edges
                cur = b
                while cur != a:
                    p_ = spprev[a][cur]
                    e = (min(p_, cur), max(p_, cur))
                    tree_edges.add(e)
                    cur = p_
        heur = sum(cost[e] for e in tree_edges)
        rows = []
        for (u, v) in sorted(tree_edges):
            rows.append(
                {
                    "edge_u": u,
                    "edge_v": v,
                    "edge_cost": cost[(u, v)],
                    "optimal_cost": int(opt),
                    "heuristic_cost": int(heur),
                    "n_terminals": k,
                }
            )
        return pd.DataFrame(rows)

    tree = flows.groupBy("g").applyInPandas(
        steiner,
        schema=(
            "edge_u long, edge_v long, edge_cost long, optimal_cost long,"
            " heuristic_cost long, n_terminals long"
        ),
    )
    tree = tree.transform(_ckpt)
    from pyspark_movie_recommender_spark.operators.graph import (
        connected_components,
    )

    cc = connected_components(
        tree.select(
            F.col("edge_u").alias("id_a"), F.col("edge_v").alias("id_b")
        )
    )
    terms_df = spark.createDataFrame(
        [(0,), (6,), (12,), (18,), (24,)], "id long"
    )
    conn = (
        terms_df.join(cc, "id", "left")
        .agg(
            F.countDistinct("component").cast("long").alias("n_components"),
            F.sum(F.when(F.col("component").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_unreached"),
        )
    )
    return tree.crossJoin(F.broadcast(conn))


@query(
    "std_deviational_ellipse",
    oracle="""
    WITH pts AS (
        SELECT (c_custkey * 7919) % 100000 AS x,
               (c_custkey * 104729) % 100000 AS y
        FROM customer
    ), mom AS (
        SELECT COUNT(*) AS n, AVG(x) AS mx, AVG(y) AS my,
               AVG(x * x) AS xx, AVG(y * y) AS yy, AVG(x * y) AS xy
        FROM pts
    ), cov AS (
        SELECT n, mx, my,
               xx - mx * mx AS sxx, yy - my * my AS syy,
               xy - mx * my AS sxy
        FROM mom
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           ROUND(mx, 2) AS center_x, ROUND(my, 2) AS center_y,
           ROUND(DEGREES(0.5 * ATAN2(2 * sxy, sxx - syy)), 4)
               AS orientation_deg,
           ROUND(SQRT((sxx + syy) / 2.0
                 + SQRT((sxx - syy) * (sxx - syy) / 4.0 + sxy * sxy)),
                 2) AS major_axis_sd,
           ROUND(SQRT(GREATEST((sxx + syy) / 2.0
                 - SQRT((sxx - syy) * (sxx - syy) / 4.0 + sxy * sxy),
                 0.0)), 2) AS minor_axis_sd
    FROM cov
    """,
)
def std_deviational_ellipse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard deviational ellipse of the customer point cloud: mean
    center, orientation (half the atan2 of the covariance), and the
    major/minor standard-deviation axes from the closed-form 2x2
    covariance eigenvalues — the directional-dispersion summary used
    in crime/epidemiology mapping, adding ORIENTATION to what
    `min_enclosing_circle_nations` (extent) and `clark_evans_nn_index`
    (clustering) describe. An axis ratio near 1 with orientation
    noise means the synthetic hash coordinates are isotropic — a
    calibration check the invariant pins.

    Determinism: one moment census, fixed algebra, rounding at the
    end.

    Scale shape: one streaming agg carries everything; the ellipse is
    in-row arithmetic.
    """
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        ((F.col("c_custkey") * 7919) % 100000).alias("x"),
        ((F.col("c_custkey") * 104729) % 100000).alias("y"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("x")).alias("xx"),
        F.avg(F.col("y") * F.col("y")).alias("yy"),
        F.avg(F.col("x") * F.col("y")).alias("xy"),
    )
    cov = mom.select(
        "n",
        "mx",
        "my",
        (F.col("xx") - F.col("mx") * F.col("mx")).alias("sxx"),
        (F.col("yy") - F.col("my") * F.col("my")).alias("syy"),
        (F.col("xy") - F.col("mx") * F.col("my")).alias("sxy"),
    )
    disc = F.sqrt(
        (F.col("sxx") - F.col("syy")) * (F.col("sxx") - F.col("syy")) / 4.0
        + F.col("sxy") * F.col("sxy")
    )
    return cov.select(
        F.col("n").alias("n_points"),
        F.round("mx", 2).alias("center_x"),
        F.round("my", 2).alias("center_y"),
        F.round(
            F.degrees(
                0.5
                * F.atan2(
                    2 * F.col("sxy"), F.col("sxx") - F.col("syy")
                )
            ),
            4,
        ).alias("orientation_deg"),
        F.round(
            F.sqrt((F.col("sxx") + F.col("syy")) / 2.0 + disc), 2
        ).alias("major_axis_sd"),
        F.round(
            F.sqrt(
                F.greatest(
                    (F.col("sxx") + F.col("syy")) / 2.0 - disc, F.lit(0.0)
                )
            ),
            2,
        ).alias("minor_axis_sd"),
    )


@query(
    "dp_composition_ladder",
    oracle="""
    WITH base AS (
        -- per-query epsilon chosen so one release of the 25-nation
        -- count histogram costs 0.1
        SELECT CAST(0.1 AS DOUBLE) AS eps,
               CAST(0.00001 AS DOUBLE) AS delta
    ), ks AS (SELECT CAST(unnest([1, 5, 10, 50, 100]) AS BIGINT) AS k)
    SELECT ks.k AS n_queries,
           ROUND(ks.k * base.eps, 6) AS basic_eps,
           ROUND(SQRT(2.0 * ks.k * LN(1.0 / base.delta)) * base.eps
                 + ks.k * base.eps * (EXP(base.eps) - 1.0), 6)
               AS advanced_eps,
           CAST(CASE WHEN SQRT(2.0 * ks.k * LN(1.0 / base.delta))
                          * base.eps
                          + ks.k * base.eps * (EXP(base.eps) - 1.0)
                          < ks.k * base.eps
                THEN 1 ELSE 0 END AS BIGINT) AS advanced_wins
    FROM ks, base
    """,
)
def dp_composition_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy composition accounting ladder: the total
    privacy cost of k = 1/5/10/50/100 releases at per-query epsilon
    0.1, under BASIC composition (k*eps) versus ADVANCED composition
    (sqrt(2k ln(1/delta)) eps + k eps(e^eps - 1), delta = 1e-5) —
    the budget arithmetic every DP deployment runs before choosing
    noise scales for the mechanisms this repo implements
    (`dp_noisy_counts_segments`, `dp_exponential_mechanism`,
    `svt_above_threshold_replay`, `ldp_rr_frequency_debias`).
    Advanced composition wins exactly where the ladder's crossover
    column flips — the k where sublinear accounting starts paying.

    Determinism: literal parameters, identical double trees, one
    rounding per cell.

    Scale shape: a 5-row literal ladder; accounting is always
    control-plane arithmetic.
    """
    ks = spark.createDataFrame(
        [(1,), (5,), (10,), (50,), (100,)], "k long"
    )
    eps, delta = 0.1, 0.00001
    adv = (
        F.sqrt(2.0 * F.col("k") * F.lit(__import__("math").log(1.0 / delta)))
        * eps
        + F.col("k") * eps * (__import__("math").exp(eps) - 1.0)
    )
    return ks.select(
        F.col("k").alias("n_queries"),
        F.round(F.col("k") * eps, 6).alias("basic_eps"),
        F.round(adv, 6).alias("advanced_eps"),
        F.when(adv < F.col("k") * eps, 1)
        .otherwise(0)
        .cast("long")
        .alias("advanced_wins"),
    )


@query(
    "kelly_growth_ladder",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(ROUND(SUM(value) * 100) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), ud AS (
        SELECT CASE WHEN x > LAG(x) OVER (ORDER BY day)
               THEN 1 ELSE 0 END AS up,
               LAG(x) OVER (ORDER BY day) AS guard
        FROM d
    ), p AS (
        -- bet the more likely direction: win prob >= 1/2
        SELECT GREATEST(SUM(up) * 1.0 / COUNT(*),
                        1.0 - SUM(up) * 1.0 / COUNT(*)) AS p,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ud WHERE guard IS NOT NULL
    ), fr AS (
        SELECT CAST(f.f AS BIGINT) AS quarter, f.f / 4.0 AS scale
        FROM (SELECT unnest(generate_series(1, 4)) AS f) f
    )
    SELECT fr.quarter AS kelly_quarters,
           ROUND(p.p, 6) AS win_prob,
           ROUND((2.0 * p.p - 1.0) * fr.scale, 6) AS fraction,
           ROUND(p.p * LN(1.0 + (2.0 * p.p - 1.0) * fr.scale)
                 + (1.0 - p.p)
                   * LN(1.0 - (2.0 * p.p - 1.0) * fr.scale), 9)
               AS growth_rate
    FROM p, fr
    WHERE p.p >= 0.5
    """,
)
def kelly_growth_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kelly criterion ladder for an even-money bet on 'tomorrow's
    revenue is up', with the win probability estimated from the daily
    series: the full-Kelly fraction f* = 2p - 1 maximizes expected
    log growth g(f) = p ln(1+f) + (1-p) ln(1-f), and the ladder
    evaluates quarter/half/three-quarter/full Kelly — the
    position-sizing math behind `inverse_vol_risk_parity` /
    `markowitz_min_variance_pair` (which size by risk; Kelly sizes by
    GROWTH), with the classic property that g is concave and peaks
    exactly at full Kelly (pinned by the invariant test). Empty
    result when p <= 0.5 (no edge, no bet) — itself informative.

    Determinism: exact cent comparisons; identical double trees;
    rounding at output.

    Scale shape: one LAG window and a scalar probability; the ladder
    is a 4-row literal.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100).cast("long").alias("x")
    )
    w = Window.orderBy("day")
    ud = d.select(
        F.when(F.col("x") > F.lag("x").over(w), 1).otherwise(0).alias("up"),
        F.lag("x").over(w).alias("guard"),
    ).filter(F.col("guard").isNotNull())
    raw_p = F.sum("up") * 1.0 / F.count(F.lit(1))
    p = ud.agg(
        F.greatest(raw_p, 1.0 - raw_p).alias("p"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    fr = spark.range(1, 5).select(
        F.col("id").cast("long").alias("quarter"),
        (F.col("id") / 4.0).alias("scale"),
    )
    f_ = (2.0 * F.col("p") - 1.0) * F.col("scale")
    g_ = F.col("p") * F.log(1.0 + f_) + (1.0 - F.col("p")) * F.log(
        1.0 - f_
    )
    return (
        p.crossJoin(F.broadcast(fr))
        .filter(F.col("p") >= 0.5)
        .select(
            F.col("quarter").alias("kelly_quarters"),
            F.round("p", 6).alias("win_prob"),
            F.round(f_, 6).alias("fraction"),
            F.round(g_, 9).alias("growth_rate"),
        )
    )


@query(
    "site_percolation_raster",
    oracle="""
    WITH RECURSIVE pts AS (
        SELECT (c_custkey * 7919) % 100000 AS x,
               (c_custkey * 104729) % 100000 AS y,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v
        FROM customer
    ), cells AS (
        SELECT CAST(x // 10000 AS BIGINT) AS cx,
               CAST(y // 10000 AS BIGINT) AS cy,
               CAST(SUM(v) AS BIGINT) AS v
        FROM pts GROUP BY 1, 2
    ), med AS (
        SELECT median(v) AS md FROM cells
    ), occ AS (
        SELECT cx, cy, cx * 100 + cy AS id
        FROM cells, med WHERE v > med.md
    ), edges AS (
        SELECT a.id AS u, b.id AS v
        FROM occ a JOIN occ b
          ON ABS(a.cx - b.cx) + ABS(a.cy - b.cy) = 1
         AND a.id < b.id
    ), bi AS (
        SELECT u, v FROM edges UNION SELECT v, u FROM edges
    ), reach(id, label) AS (
        SELECT id, id FROM occ
        UNION
        SELECT bi.u, r.label FROM reach r JOIN bi ON bi.v = r.id
    ), comp AS (
        SELECT id, MIN(label) AS c FROM reach GROUP BY id
    ), sizes AS (
        SELECT c, CAST(COUNT(*) AS BIGINT) AS sz FROM comp GROUP BY c
    )
    SELECT CAST((SELECT COUNT(*) FROM occ) AS BIGINT) AS n_occupied,
           CAST((SELECT COUNT(*) FROM cells) AS BIGINT) AS n_cells,
           CAST((SELECT COUNT(*) FROM sizes) AS BIGINT) AS n_clusters,
           CAST((SELECT MAX(sz) FROM sizes) AS BIGINT)
               AS largest_cluster,
           CAST((1000000 * (SELECT MAX(sz) FROM sizes))
                // (SELECT COUNT(*) FROM occ) AS BIGINT)
               AS giant_share_ppm
    """,
)
def site_percolation_raster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Site percolation census on the 10x10 balance raster: cells
    above the median cell value are 'occupied', rook-adjacent
    occupied cells connect, and the cluster census (count, largest,
    giant share) reads off whether the hot half of the map percolates
    — at exactly p = 1/2 occupancy, square-lattice site percolation
    sits just below criticality (p_c ~ 0.593), so NO spanning giant
    is the theoretical expectation, a data-driven check of a phase-
    transition fact. The lattice twin of `bond_percolation_curve`
    (graph bonds) and `percolation_threshold_sweep`, built from the
    same raster as `getis_ord_hotspots`.

    Determinism: exact cell sums; median threshold (DuckDB median of
    an even count interpolates — both engines compare against the
    same value); components via min-label propagation vs the
    recursive-CTE fixpoint.

    Scale shape: raster agg, a rook-adjacency self-join of <= 100
    cells, one CC run — raster-sized forever.
    """
    from pyspark_movie_recommender_spark.operators.graph import (
        connected_components,
    )

    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        ((F.col("c_custkey") * 7919) % 100000).alias("x"),
        ((F.col("c_custkey") * 104729) % 100000).alias("y"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("v"),
    )
    cells = pts.groupBy(
        F.expr("x DIV 10000").cast("long").alias("cx"),
        F.expr("y DIV 10000").cast("long").alias("cy"),
    ).agg(F.sum("v").cast("long").alias("v"))
    cells = cells.transform(_ckpt)
    med = cells.agg(F.expr("median(v)").alias("md"))
    occ = (
        cells.crossJoin(F.broadcast(med))
        .filter(F.col("v") > F.col("md"))
        .select(
            "cx", "cy", (F.col("cx") * 100 + F.col("cy")).alias("id")
        )
        .transform(_ckpt)
    )
    a, b = occ.alias("a"), occ.alias("b")
    edges = a.join(
        b,
        (
            F.abs(F.col("a.cx") - F.col("b.cx"))
            + F.abs(F.col("a.cy") - F.col("b.cy"))
            == 1
        )
        & (F.col("a.id") < F.col("b.id")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    comp = connected_components(edges)
    # isolated occupied cells are their own singleton clusters
    allcomp = (
        occ.select("id")
        .join(comp, "id", "left")
        .select(F.coalesce("component", F.col("id")).alias("c"))
    )
    sizes = allcomp.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    n_occ = occ.agg(F.count(F.lit(1)).cast("long").alias("n_occupied"))
    n_cells = cells.agg(F.count(F.lit(1)).cast("long").alias("n_cells"))
    stats = sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.max("sz").cast("long").alias("largest_cluster"),
    )
    return (
        n_occ.crossJoin(F.broadcast(n_cells))
        .crossJoin(F.broadcast(stats))
        .select(
            "n_occupied",
            "n_cells",
            "n_clusters",
            "largest_cluster",
            F.expr("(1000000 * largest_cluster) DIV n_occupied")
            .cast("long")
            .alias("giant_share_ppm"),
        )
    )


@query(
    "phase_dispersion_minimization",
    oracle="""
    WITH d AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT)
                   AS t,
               x
        FROM (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(ROUND(SUM(value) * 100) AS BIGINT) AS x
            FROM events GROUP BY 1
        ) s
    ), tot AS (
        SELECT SUM(x * 1.0 * x) / COUNT(*)
               - (SUM(x) * 1.0 / COUNT(*)) * (SUM(x) * 1.0 / COUNT(*))
                   AS v
        FROM d
    ), periods AS (
        SELECT CAST(unnest(generate_series(2, 10)) AS BIGINT) AS p
    ), binned AS (
        SELECT periods.p, d.t % periods.p AS phase,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(d.x * 1.0 * d.x) / COUNT(*)
               - (SUM(d.x) * 1.0 / COUNT(*))
                 * (SUM(d.x) * 1.0 / COUNT(*)) AS vb
        FROM d CROSS JOIN periods
        GROUP BY 1, 2
    ), theta AS (
        SELECT p,
               SUM(n * vb) / SUM(n) AS within_v
        FROM binned GROUP BY p
    )
    SELECT theta.p AS period_days,
           ROUND(theta.within_v / tot.v, 6) AS pdm_theta
    FROM theta, tot
    """,
)
def phase_dispersion_minimization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase dispersion minimization (Stellingwerf) period scan of the
    daily revenue series: for each candidate period p = 2..10 days,
    the series is folded modulo p and theta(p) = pooled within-phase
    variance / total variance — a true period drives theta far below
    1 at its p (and multiples), with NO sinusoidal assumption, which
    is exactly where it beats the Fourier family
    (`goertzel_periodogram_daily`, `lomb_scargle_events`,
    `dominant_period_scan`): PDM finds sawtooth and square-ish cycles
    the sine basis smears. The weekly cycle should surface at p = 7.

    Determinism: exact cents; phase = integer modulo; population
    variances with identical trees; rounding at output.

    Scale shape: one day agg, a 9-period literal cross, grouped
    variance per (p, phase) — one pass per scan, parallel over
    series keys at scale.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100).cast("long").alias("x")
    )
    d = base.select(
        (F.row_number().over(Window.orderBy("day")) - 1)
        .cast("long")
        .alias("t"),
        "x",
    ).transform(_ckpt)
    n_ = F.count(F.lit(1))
    var_ = (
        F.sum(F.col("x") * 1.0 * F.col("x")) / n_
        - (F.sum("x") * 1.0 / n_) * (F.sum("x") * 1.0 / n_)
    )
    tot = d.agg(var_.alias("v"))
    periods = spark.range(2, 11).select(F.col("id").cast("long").alias("p"))
    binned = (
        d.crossJoin(F.broadcast(periods))
        .groupBy("p", (F.col("t") % F.col("p")).alias("phase"))
        .agg(n_.cast("long").alias("n"), var_.alias("vb"))
    )
    theta = binned.groupBy("p").agg(
        (F.sum(F.col("n") * F.col("vb")) / F.sum("n")).alias("within_v")
    )
    return theta.crossJoin(F.broadcast(tot)).select(
        F.col("p").alias("period_days"),
        F.round(F.col("within_v") / F.col("v"), 6).alias("pdm_theta"),
    )


@query(
    "n50_length_summary",
    oracle="""
    WITH lens AS (
        SELECT CAST(length(trim(text)) AS BIGINT) AS ln, doc_id
        FROM documents WHERE trim(text) <> ''
    ), ranked AS (
        SELECT ln,
               SUM(ln) OVER (ORDER BY ln DESC, doc_id) AS cum,
               SUM(ln) OVER () AS tot
        FROM lens
    )
    SELECT CAST((SELECT COUNT(*) FROM lens) AS BIGINT) AS n_docs,
           CAST(MAX(tot) AS BIGINT) AS total_chars,
           CAST(MAX(CASE WHEN cum >= tot * 0.5 THEN NULL
                ELSE ln END) AS BIGINT) AS pre_n50_guard,
           CAST(MIN(CASE WHEN cum >= tot * 0.5 THEN ln END) AS BIGINT)
               AS n50,
           CAST(MIN(CASE WHEN cum >= tot * 0.9 THEN ln END) AS BIGINT)
               AS n90
    FROM ranked
    """,
)
def n50_length_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N50/N90 length summary of the document corpus (the genome-
    assembly statistic applied to text): sort documents by length
    descending; N50 is the length at which the cumulative character
    mass crosses half the corpus — a LENGTH-WEIGHTED median that says
    'half of all characters live in documents at least this long',
    robust to a swarm of tiny documents that drags the plain median
    (`doc_profile`) down. N90 likewise for the long tail. The
    batch-shape statistic used when packing training sequences
    (`pack_documents` consumes exactly this distribution).

    Determinism: exact lengths with doc_id tie-break in the
    cumulative order; integer outputs.

    Scale shape: one length projection; the length-descending
    cumulative mass comes from the range-bucketed distributed
    running sum (``operators/rank.py:distributed_order_stats`` on
    the negated length — no single-task window over the corpus);
    one agg.
    """
    from pyspark_movie_recommender_spark.operators.rank import (
        distributed_order_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    lens = docs.filter(F.trim("text") != "").select(
        F.length(F.trim("text")).cast("long").alias("ln"),
        (-F.length(F.trim("text"))).cast("long").alias("negln"),
        "doc_id",
    )
    tot_row = lens.agg(
        F.sum("ln").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    ranked = distributed_order_stats(
        lens, "negln", ["doc_id"], cumsum_cols={"cum": "ln"}
    ).crossJoin(F.broadcast(tot_row)).select("ln", "cum", "tot")
    nd = tot_row.select("n_docs")
    agg = ranked.agg(
        F.max("tot").cast("long").alias("total_chars"),
        F.max(
            F.when(F.col("cum") >= F.col("tot") * 0.5, None).otherwise(
                F.col("ln")
            )
        )
        .cast("long")
        .alias("pre_n50_guard"),
        F.min(
            F.when(F.col("cum") >= F.col("tot") * 0.5, F.col("ln"))
        )
        .cast("long")
        .alias("n50"),
        F.min(
            F.when(F.col("cum") >= F.col("tot") * 0.9, F.col("ln"))
        )
        .cast("long")
        .alias("n90"),
    )
    return nd.crossJoin(F.broadcast(agg)).select(
        "n_docs", "total_chars", "pre_n50_guard", "n50", "n90"
    )


@query(
    "juilland_dispersion",
    oracle="""
    WITH toks AS (
        SELECT doc_id % 5 AS part,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        FROM documents WHERE trim(text) <> ''
    ), top_words AS (
        SELECT w FROM (
            SELECT w, COUNT(*) AS c FROM toks
            WHERE length(w) >= 4
            GROUP BY w ORDER BY c DESC, w LIMIT 10) t
    ), per_part AS (
        SELECT tw.w, p.part,
               CAST(COUNT(toks.w) AS BIGINT) AS c
        FROM top_words tw
        CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS part) p
        LEFT JOIN toks ON toks.w = tw.w AND toks.part = p.part
        GROUP BY 1, 2
    ), stats AS (
        SELECT w, CAST(SUM(c) AS BIGINT) AS total,
               AVG(c * 1.0) AS mu,
               SQRT(SUM(c * 1.0 * c) / COUNT(*)
                    - AVG(c * 1.0) * AVG(c * 1.0)) AS sd,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM per_part GROUP BY w
    )
    SELECT w AS word, total,
           ROUND(CASE WHEN mu > 0
                 THEN 1.0 - (sd / mu) / SQRT(k - 1.0)
                 ELSE 0.0 END, 6) AS juilland_d
    FROM stats
    """,
)
def juilland_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Juilland's D dispersion for the ten most frequent long words:
    the corpus is cut into 5 equal document parts and
    D = 1 - CV/sqrt(k-1) measures how EVENLY each word spreads
    across them — D near 1 is a general-vocabulary word, near 0 a
    single-document burst. The corpus-linguistics companion of
    `term_burstiness_church_gale` (within-document clumping) and
    `g2_keyness_sources` (between-source salience): dispersion is
    the standard correction before trusting raw frequency in
    vocabulary lists.

    Determinism: exact per-part counts (zero-filled across the 5
    parts); population CV with identical trees; rounding at output.

    Scale shape: token histogram + top-k pick, then a 10x5
    zero-filled grid agg — the dispersion layer costs two small aggs
    beyond the word count.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.filter(F.trim("text") != "").select(
        (F.col("doc_id") % 5).alias("part"),
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"),
    )
    toks = toks.transform(_ckpt)
    top_words = (
        toks.filter(F.length("w") >= 4)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(10)
        .select("w")
    )
    parts = spark.range(0, 5).select(F.col("id").cast("long").alias("part"))
    per_part = (
        top_words.crossJoin(F.broadcast(parts))
        .join(
            toks.groupBy("w", "part").agg(
                F.count(F.lit(1)).cast("long").alias("c0")
            ),
            ["w", "part"],
            "left",
        )
        .select("w", "part", F.coalesce("c0", F.lit(0)).alias("c"))
    )
    k_ = F.count(F.lit(1))
    stats = per_part.groupBy("w").agg(
        F.sum("c").cast("long").alias("total"),
        F.avg(F.col("c") * 1.0).alias("mu"),
        F.sqrt(
            F.sum(F.col("c") * 1.0 * F.col("c")) / k_
            - F.avg(F.col("c") * 1.0) * F.avg(F.col("c") * 1.0)
        ).alias("sd"),
        k_.cast("long").alias("k"),
    )
    return stats.select(
        F.col("w").alias("word"),
        "total",
        F.round(
            F.when(
                F.col("mu") > 0,
                1.0 - (F.col("sd") / F.col("mu")) / F.sqrt(F.col("k") - 1.0),
            ).otherwise(0.0),
            6,
        ).alias("juilland_d"),
    )


@query(
    "pythagorean_expectation",
    oracle="""
    WITH mon AS (
        SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS m,
               c.c_nationkey AS nk,
               CAST(ROUND(SUM(o.o_totalprice) * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ), top2 AS (
        SELECT m, nk, cents, rk FROM (
            SELECT m, nk, cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY m ORDER BY cents DESC, nk) AS rk
            FROM mon) t
        WHERE rk <= 2
    ), games AS (
        SELECT a.m, a.nk AS na, b.nk AS nb,
               a.cents AS ca, b.cents AS cb
        FROM top2 a JOIN top2 b
          ON b.m = a.m AND a.rk = 1 AND b.rk = 2
    ), per AS (
        SELECT nk,
               CAST(SUM(w) AS BIGINT) AS wins,
               CAST(COUNT(*) AS BIGINT) AS games,
               CAST(SUM(rf) AS BIGINT) AS rev_for,
               CAST(SUM(ra) AS BIGINT) AS rev_against
        FROM (
            SELECT na AS nk, 1 AS w, ca AS rf, cb AS ra FROM games
            UNION ALL
            SELECT nb, 0, cb, ca FROM games
        ) t GROUP BY nk
    )
    SELECT nk AS nation_key, wins, games,
           ROUND(rev_for * 1.0 * rev_for
                 / (rev_for * 1.0 * rev_for + rev_against * 1.0
                    * rev_against) * games, 4) AS pyth_expected_wins,
           ROUND(wins - rev_for * 1.0 * rev_for
                 / (rev_for * 1.0 * rev_for + rev_against * 1.0
                    * rev_against) * games, 4) AS luck
    FROM per
    """,
)
def pythagorean_expectation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pythagorean expectation (James' exponent-2 form) for the
    monthly nation 'tournament' of `elo_rating_replay`: each month's
    top-2 revenue nations play, and a nation's expected win count is
    games * RF^2/(RF^2 + RA^2) from revenue for/against in its games
    — the run-differential win model; the residual column is the
    'luck' decomposition managers argue about. Where Elo updates a
    RATING from outcomes and Plackett-Luce fits strengths, Pythagoras
    predicts the win RATE from score volume alone — agreement across
    the three is the calibration story.

    Determinism: exact cent standings; integer wins; one rounded
    ratio pair.

    Scale shape: month agg + rank, a 2-row-per-month game relation,
    a per-nation rollup — tournament-sized.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    mon = (
        o.join(
            F.broadcast(
                c.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("m"),
            F.col("c_nationkey").alias("nk"),
        )
        .agg(F.round(F.sum("o_totalprice") * 100).cast("long").alias("cents"))
    )
    top2 = mon.select(
        "m",
        "nk",
        "cents",
        F.row_number()
        .over(Window.partitionBy("m").orderBy(F.desc("cents"), "nk"))
        .alias("rk"),
    ).filter(F.col("rk") <= 2)
    top2 = _ckpt(top2)  # shared fan-out relation
    a = top2.filter(F.col("rk") == 1).select(
        "m", F.col("nk").alias("na"), F.col("cents").alias("ca")
    )
    b = top2.filter(F.col("rk") == 2).select(
        "m", F.col("nk").alias("nb"), F.col("cents").alias("cb")
    )
    games = a.join(b, "m")
    per = (
        games.select(
            F.col("na").alias("nk"),
            F.lit(1).alias("w"),
            F.col("ca").alias("rf"),
            F.col("cb").alias("ra"),
        )
        .unionAll(
            games.select(
                F.col("nb").alias("nk"),
                F.lit(0).alias("w"),
                F.col("cb").alias("rf"),
                F.col("ca").alias("ra"),
            )
        )
        .groupBy("nk")
        .agg(
            F.sum("w").cast("long").alias("wins"),
            F.count(F.lit(1)).cast("long").alias("games"),
            F.sum("rf").cast("long").alias("rev_for"),
            F.sum("ra").cast("long").alias("rev_against"),
        )
    )
    pyth = (
        F.col("rev_for")
        * 1.0
        * F.col("rev_for")
        / (
            F.col("rev_for") * 1.0 * F.col("rev_for")
            + F.col("rev_against") * 1.0 * F.col("rev_against")
        )
        * F.col("games")
    )
    return per.select(
        F.col("nk").alias("nation_key"),
        "wins",
        "games",
        F.round(pyth, 4).alias("pyth_expected_wins"),
        F.round(F.col("wins") - pyth, 4).alias("luck"),
    )


@query(
    "vanderweele_evalue",
    oracle="""
    WITH rates AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT'
               THEN 1 ELSE 0 END AS exposed,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ), rr AS (
        SELECT (SUM(CASE WHEN exposed = 1 THEN y ELSE 0 END) * 1.0
                / SUM(exposed))
               / (SUM(CASE WHEN exposed = 0 THEN y ELSE 0 END) * 1.0
                  / SUM(1 - exposed)) AS rr,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM rates
    ), adj AS (
        SELECT n, CASE WHEN rr >= 1.0 THEN rr ELSE 1.0 / rr END AS rra,
               rr
        FROM rr
    )
    SELECT n AS n_orders,
           ROUND(rr, 6) AS risk_ratio,
           ROUND(rra + SQRT(rra * (rra - 1.0)), 6) AS e_value
    FROM adj
    """,
)
def vanderweele_evalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VanderWeele-Ding E-value for the urgent-priority ->
    finished-status risk ratio: E = RR* + sqrt(RR*(RR*-1)) (with RR*
    the ratio oriented above 1) — the minimum strength of association
    an UNMEASURED confounder would need with both exposure and
    outcome to explain the observed effect away. The
    sensitivity-analysis companion every observational estimate in
    the causal family (`diff_in_diff_revenue`, `propensity_match_att`,
    `doubly_robust_ate`, `iv_wald_2sls`) should ship with: a tiny
    E-value (near 1) says the 'effect' is confounding-fragile.

    Determinism: exact counts; one closed-form expression; rounding
    at output.

    Scale shape: one conditional agg and in-row algebra.
    """
    o = load_table(spark, sf_dir, "orders")
    rates = o.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("exposed"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    rr_ = (
        F.sum(F.when(F.col("exposed") == 1, F.col("y")).otherwise(0))
        * 1.0
        / F.sum("exposed")
    ) / (
        F.sum(F.when(F.col("exposed") == 0, F.col("y")).otherwise(0))
        * 1.0
        / F.sum(1 - F.col("exposed"))
    )
    rr = rates.agg(
        rr_.alias("rr"), F.count(F.lit(1)).cast("long").alias("n")
    )
    rra = F.when(F.col("rr") >= 1.0, F.col("rr")).otherwise(
        1.0 / F.col("rr")
    )
    return rr.select(
        F.col("n").alias("n_orders"),
        F.round("rr", 6).alias("risk_ratio"),
        F.round(rra + F.sqrt(rra * (rra - 1.0)), 6).alias("e_value"),
    )


@query(
    "erlang_b_blocking",
    oracle="""
    WITH load AS (
        SELECT COUNT(*) * 1.0
               / ((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0)
               * 1800.0 AS a  -- offered load in 30-min service units
        FROM events WHERE event_type = 'purchase'
    ), lf AS (
        SELECT CAST(g.i AS BIGINT) AS i,
               SUM(LN(g.i)) OVER (ORDER BY g.i) AS lnf
        FROM (SELECT unnest(generate_series(1, 20)) AS i) g
    ), lnfact AS (
        SELECT i, lnf FROM lf UNION ALL SELECT 0, 0.0
    ), terms AS (
        SELECT k.k, EXP(k.k * LN(load.a) - lnfact.lnf) AS t
        FROM load,
             LATERAL (SELECT unnest(generate_series(0, 20)) AS k) k
        JOIN lnfact ON lnfact.i = k.k
    ), cum AS (
        SELECT k, t, SUM(t) OVER (ORDER BY k) AS z FROM terms
    )
    SELECT CAST(cum.k AS BIGINT) AS n_servers,
           ROUND((SELECT a FROM load), 4) AS offered_load_erlangs,
           ROUND(cum.t / cum.z, 8) AS blocking_prob
    FROM cum WHERE cum.k >= 1
    """,
)
def erlang_b_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erlang B blocking-probability ladder: purchases arriving at
    the observed rate with a 30-minute mean service occupy n = 1..20
    servers with NO queue, and the loss probability B(n, a) =
    (a^n/n!) / sum_k a^k/k! is evaluated via log-factorials with the
    running-sum denominator — the LOSS-system complement of
    `erlang_c_staffing` (which queues instead of blocking) and the
    sizing table behind 'how many concurrent slots until rejects are
    rare'. The invariant pins the Erlang-B recursion
    B(n) = aB(n-1) / (n + aB(n-1)) between adjacent rows.

    Determinism: microsecond-exact load; shared lnfact prefix table;
    ordered cumulative denominator; rounding at output.

    Scale shape: one scalar load agg and a 21-term literal ladder.
    """
    ev = load_table(spark, sf_dir, "events")
    load = ev.filter(F.col("event_type") == "purchase").agg(
        (
            F.count(F.lit(1))
            * 1.0
            / (
                (
                    F.unix_micros(F.max("ts").cast("timestamp"))
                    - F.unix_micros(F.min("ts").cast("timestamp"))
                )
                / 1000000.0
            )
            * 1800.0
        ).alias("a")
    )
    lf = spark.range(1, 21).select(
        F.col("id").cast("long").alias("i")
    ).select(
        "i", F.sum(F.log("i")).over(Window.orderBy("i")).alias("lnf")
    )
    lnfact = lf.unionByName(
        spark.createDataFrame([(0, 0.0)], "i long, lnf double")
    )
    ks = spark.range(0, 21).select(F.col("id").cast("long").alias("k"))
    terms = (
        ks.crossJoin(F.broadcast(load))
        .join(F.broadcast(lnfact), F.col("k") == F.col("i"))
        .select(
            "k",
            "a",
            F.exp(F.col("k") * F.log("a") - F.col("lnf")).alias("t"),
        )
    )
    cum = terms.select(
        "k",
        "a",
        "t",
        F.sum("t").over(Window.orderBy("k")).alias("z"),
    )
    return cum.filter(F.col("k") >= 1).select(
        F.col("k").alias("n_servers"),
        F.round("a", 4).alias("offered_load_erlangs"),
        F.round(F.col("t") / F.col("z"), 8).alias("blocking_prob"),
    )


@query(
    "hu_moment_invariants",
    oracle="""
    WITH pts AS (
        SELECT (c_custkey * 7919) % 100000 AS x,
               (c_custkey * 104729) % 100000 AS y,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v
        FROM customer
    ), cells AS (
        SELECT CAST(x // 10000 AS BIGINT) AS cx,
               CAST(y // 10000 AS BIGINT) AS cy,
               CAST(GREATEST(SUM(v), 0) AS BIGINT) AS w
        FROM pts GROUP BY 1, 2
    ), m AS (
        SELECT SUM(w * 1.0) AS m00,
               SUM(w * 1.0 * cx) AS m10, SUM(w * 1.0 * cy) AS m01
        FROM cells
    ), cen AS (
        SELECT m00, m10 / m00 AS xb, m01 / m00 AS yb FROM m
    ), mu AS (
        SELECT cen.m00,
               SUM(w * (cx - xb) * (cx - xb)) AS mu20,
               SUM(w * (cy - yb) * (cy - yb)) AS mu02,
               SUM(w * (cx - xb) * (cy - yb)) AS mu11
        FROM cells, cen GROUP BY cen.m00
    ), eta AS (
        SELECT mu20 / POW(m00, 2.0) AS n20,
               mu02 / POW(m00, 2.0) AS n02,
               mu11 / POW(m00, 2.0) AS n11
        FROM mu
    )
    SELECT ROUND((n20 + n02) * 1e6, 6) AS hu1_x1e6,
           ROUND(((n20 - n02) * (n20 - n02) + 4 * n11 * n11) * 1e12, 6)
               AS hu2_x1e12
    FROM eta
    """,
)
def hu_moment_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hu moment invariants of the balance raster treated as a 10x10
    grayscale image: the first two invariants phi1 = eta20 + eta02
    and phi2 = (eta20 - eta02)^2 + 4 eta11^2 from normalized central
    moments — translation/scale/rotation-invariant shape descriptors,
    the classical image-matching features computed HERE with zero
    codecs (the raster pipeline of `getis_ord_hotspots` is the
    'decoder'). This is the feature-extraction shape the multimodal
    stubs (`multimodal_decode_features`) plumb for when real pixels
    arrive: aggregate -> moments -> invariants, all relational.

    Determinism: integer cell weights (negative balances clamped);
    identical double moment trees; scaled rounding at output.

    Scale shape: one raster agg and two moment censuses — image
    moments are ALWAYS aggregations, which is why they map perfectly
    to SQL engines.
    """
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        ((F.col("c_custkey") * 7919) % 100000).alias("x"),
        ((F.col("c_custkey") * 104729) % 100000).alias("y"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("v"),
    )
    cells = pts.groupBy(
        F.expr("x DIV 10000").cast("long").alias("cx"),
        F.expr("y DIV 10000").cast("long").alias("cy"),
    ).agg(F.greatest(F.sum("v"), F.lit(0)).cast("long").alias("w"))
    cells = cells.transform(_ckpt)
    m = cells.agg(
        F.sum(F.col("w") * 1.0).alias("m00"),
        F.sum(F.col("w") * 1.0 * F.col("cx")).alias("m10"),
        F.sum(F.col("w") * 1.0 * F.col("cy")).alias("m01"),
    )
    cen = m.select(
        "m00",
        (F.col("m10") / F.col("m00")).alias("xb"),
        (F.col("m01") / F.col("m00")).alias("yb"),
    )
    mu = cells.crossJoin(F.broadcast(cen)).groupBy("m00").agg(
        F.sum(
            F.col("w")
            * (F.col("cx") - F.col("xb"))
            * (F.col("cx") - F.col("xb"))
        ).alias("mu20"),
        F.sum(
            F.col("w")
            * (F.col("cy") - F.col("yb"))
            * (F.col("cy") - F.col("yb"))
        ).alias("mu02"),
        F.sum(
            F.col("w")
            * (F.col("cx") - F.col("xb"))
            * (F.col("cy") - F.col("yb"))
        ).alias("mu11"),
    )
    eta = mu.select(
        (F.col("mu20") / F.pow("m00", F.lit(2.0))).alias("n20"),
        (F.col("mu02") / F.pow("m00", F.lit(2.0))).alias("n02"),
        (F.col("mu11") / F.pow("m00", F.lit(2.0))).alias("n11"),
    )
    return eta.select(
        F.round((F.col("n20") + F.col("n02")) * 1e6, 6).alias("hu1_x1e6"),
        F.round(
            (
                (F.col("n20") - F.col("n02"))
                * (F.col("n20") - F.col("n02"))
                + 4 * F.col("n11") * F.col("n11")
            )
            * 1e12,
            6,
        ).alias("hu2_x1e12"),
    )


@query(
    "haralick_glcm_texture",
    oracle="""
    WITH pts AS (
        SELECT (c_custkey * 7919) % 100000 AS x,
               (c_custkey * 104729) % 100000 AS y,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v
        FROM customer
    ), cells AS (
        SELECT CAST(x // 10000 AS BIGINT) AS cx,
               CAST(y // 10000 AS BIGINT) AS cy,
               CAST(SUM(v) AS BIGINT) AS v
        FROM pts GROUP BY 1, 2
    ), lv AS (
        -- quantize to 4 gray levels by quartile rank
        SELECT cx, cy,
               CAST(NTILE(4) OVER (ORDER BY v, cx, cy) AS BIGINT) AS g
        FROM cells
    ), glcm AS (
        -- horizontal neighbor co-occurrence (symmetric)
        SELECT a.g AS gi, b.g AS gj, CAST(COUNT(*) AS BIGINT) AS c
        FROM lv a JOIN lv b
          ON b.cy = a.cy AND b.cx = a.cx + 1
        GROUP BY 1, 2
    ), n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM glcm)
    SELECT n.n AS n_pairs,
           ROUND(SUM((glcm.gi - glcm.gj) * (glcm.gi - glcm.gj)
                 * glcm.c * 1.0 / n.n), 6) AS contrast,
           ROUND(SUM(glcm.c * 1.0 / n.n
                 / (1.0 + ABS(glcm.gi - glcm.gj))), 6) AS homogeneity,
           ROUND(SUM((glcm.c * 1.0 / n.n) * (glcm.c * 1.0 / n.n)), 6)
               AS energy
    FROM glcm, n
    GROUP BY n.n
    """,
)
def haralick_glcm_texture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haralick texture features from the gray-level co-occurrence
    matrix of the quantized balance raster: cells are quantized to 4
    levels by quartile, horizontally adjacent pairs populate the
    GLCM, and contrast, homogeneity, and energy summarize the
    texture — the 1973 feature set still used for tissue/terrain
    classification, computed relationally (a rank window, an
    adjacency self-join, three weighted aggregates). With
    `hu_moment_invariants` (shape) this gives the raster pipeline the
    two classical image-feature families with no codec anywhere.

    Determinism: NTILE with total tie-break; integer co-occurrence
    counts; rounding at output.

    Scale shape: raster agg, one rank window, one adjacency
    equi-join of <= 100 cells, scalar aggregates. Tiling scales it to
    real images: same plan per tile.
    """
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        ((F.col("c_custkey") * 7919) % 100000).alias("x"),
        ((F.col("c_custkey") * 104729) % 100000).alias("y"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("v"),
    )
    cells = pts.groupBy(
        F.expr("x DIV 10000").cast("long").alias("cx"),
        F.expr("y DIV 10000").cast("long").alias("cy"),
    ).agg(F.sum("v").cast("long").alias("v"))
    lv = cells.select(
        "cx",
        "cy",
        F.ntile(4)
        .over(Window.orderBy("v", "cx", "cy"))
        .cast("long")
        .alias("g"),
    ).transform(_ckpt)
    a, b = lv.alias("a"), lv.alias("b")
    glcm = a.join(
        b,
        (F.col("b.cy") == F.col("a.cy"))
        & (F.col("b.cx") == F.col("a.cx") + 1),
    ).groupBy(
        F.col("a.g").alias("gi"), F.col("b.g").alias("gj")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    n = glcm.agg(F.sum("c").cast("long").alias("n"))
    p = F.col("c") * 1.0 / F.col("n")
    return glcm.crossJoin(F.broadcast(n)).groupBy("n").agg(
        F.round(
            F.sum(
                (F.col("gi") - F.col("gj"))
                * (F.col("gi") - F.col("gj"))
                * p
            ),
            6,
        ).alias("contrast"),
        F.round(
            F.sum(p / (1.0 + F.abs(F.col("gi") - F.col("gj")))), 6
        ).alias("homogeneity"),
        F.round(F.sum(p * p), 6).alias("energy"),
    ).select(
        F.col("n").alias("n_pairs"), "contrast", "homogeneity", "energy"
    )


@query(
    "otsu_threshold_raster",
    oracle="""
    WITH pts AS (
        SELECT (c_custkey * 7919) % 100000 AS x,
               (c_custkey * 104729) % 100000 AS y,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v
        FROM customer
    ), cells AS (
        SELECT CAST(x // 10000 AS BIGINT) AS cx,
               CAST(y // 10000 AS BIGINT) AS cy,
               CAST(SUM(v) AS BIGINT) AS v
        FROM pts GROUP BY 1, 2
    ), cands AS (SELECT DISTINCT v AS thr FROM cells),
    split AS (
        SELECT cands.thr,
               SUM(CASE WHEN cells.v <= cands.thr THEN 1 ELSE 0 END)
                   AS n0,
               SUM(CASE WHEN cells.v > cands.thr THEN 1 ELSE 0 END)
                   AS n1,
               SUM(CASE WHEN cells.v <= cands.thr
                   THEN cells.v * 1.0 ELSE 0 END) AS s0,
               SUM(CASE WHEN cells.v > cands.thr
                   THEN cells.v * 1.0 ELSE 0 END) AS s1
        FROM cells CROSS JOIN cands
        GROUP BY cands.thr
    ), scored AS (
        SELECT thr, n0, n1,
               n0 * 1.0 * n1 * (s0 / n0 - s1 / n1) * (s0 / n0 - s1 / n1)
                   AS between_var_x
        FROM split WHERE n0 > 0 AND n1 > 0
    )
    SELECT thr AS otsu_threshold_cents,
           CAST(n0 AS BIGINT) AS n_background,
           CAST(n1 AS BIGINT) AS n_foreground,
           ROUND(between_var_x, 2) AS between_class_score
    FROM scored
    ORDER BY between_var_x DESC, thr LIMIT 1
    """,
)
def otsu_threshold_raster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Otsu's optimal threshold for binarizing the balance raster:
    the cut maximizing the between-class variance n0 n1 (mu0 - mu1)^2
    over ALL candidate thresholds (every distinct cell value — the
    exact search, not a 256-bin approximation). The segmentation
    member of the raster-image family (`hu_moment_invariants` shape,
    `haralick_glcm_texture` texture, `site_percolation_raster`
    connectivity AFTER a threshold — Otsu is how that threshold
    should be chosen instead of the median).

    Determinism: integer cell values; exact integer class counts and
    sums; (score, threshold) argmax tie-break.

    Scale shape: a candidates x cells conditional agg — on real
    images the candidate set is the 256-level histogram and the scan
    is one pass, identical plan.
    """
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        ((F.col("c_custkey") * 7919) % 100000).alias("x"),
        ((F.col("c_custkey") * 104729) % 100000).alias("y"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("v"),
    )
    cells = pts.groupBy(
        F.expr("x DIV 10000").cast("long").alias("cx"),
        F.expr("y DIV 10000").cast("long").alias("cy"),
    ).agg(F.sum("v").cast("long").alias("v"))
    cells = cells.transform(_ckpt)
    cands = cells.select(F.col("v").alias("thr")).distinct()
    split = (
        cells.crossJoin(F.broadcast(cands))
        .groupBy("thr")
        .agg(
            F.sum(F.when(F.col("v") <= F.col("thr"), 1).otherwise(0)).alias(
                "n0"
            ),
            F.sum(F.when(F.col("v") > F.col("thr"), 1).otherwise(0)).alias(
                "n1"
            ),
            F.sum(
                F.when(F.col("v") <= F.col("thr"), F.col("v") * 1.0).otherwise(
                    0.0
                )
            ).alias("s0"),
            F.sum(
                F.when(F.col("v") > F.col("thr"), F.col("v") * 1.0).otherwise(
                    0.0
                )
            ).alias("s1"),
        )
    )
    bv = (
        F.col("n0")
        * 1.0
        * F.col("n1")
        * (F.col("s0") / F.col("n0") - F.col("s1") / F.col("n1"))
        * (F.col("s0") / F.col("n0") - F.col("s1") / F.col("n1"))
    )
    return (
        split.filter((F.col("n0") > 0) & (F.col("n1") > 0))
        .select(
            F.col("thr").alias("otsu_threshold_cents"),
            F.col("n0").cast("long").alias("n_background"),
            F.col("n1").cast("long").alias("n_foreground"),
            F.round(bv, 2).alias("between_class_score"),
        )
        .orderBy(F.desc("between_class_score"), "otsu_threshold_cents")
        .limit(1)
    )


@query(
    "sobel_edge_census",
    oracle="""
    WITH pts AS (
        SELECT (c_custkey * 7919) % 100000 AS x,
               (c_custkey * 104729) % 100000 AS y,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v
        FROM customer
    ), cells AS (
        SELECT CAST(x // 10000 AS BIGINT) AS cx,
               CAST(y // 10000 AS BIGINT) AS cy,
               CAST(SUM(v) AS BIGINT) AS v
        FROM pts GROUP BY 1, 2
    ), grad AS (
        SELECT a.cx, a.cy,
               SUM(b.v * CASE b.cx - a.cx
                   WHEN 1 THEN CASE WHEN b.cy = a.cy THEN 2 ELSE 1 END
                   WHEN -1 THEN CASE WHEN b.cy = a.cy THEN -2 ELSE -1 END
                   ELSE 0 END) AS gx,
               SUM(b.v * CASE b.cy - a.cy
                   WHEN 1 THEN CASE WHEN b.cx = a.cx THEN 2 ELSE 1 END
                   WHEN -1 THEN CASE WHEN b.cx = a.cx THEN -2 ELSE -1 END
                   ELSE 0 END) AS gy,
               COUNT(*) AS n_nbrs
        FROM cells a JOIN cells b
          ON ABS(b.cx - a.cx) <= 1 AND ABS(b.cy - a.cy) <= 1
         AND NOT (b.cx = a.cx AND b.cy = a.cy)
        GROUP BY 1, 2
        HAVING COUNT(*) = 8  -- interior cells only
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_interior,
           CAST(ROUND(AVG(SQRT(gx * 1.0 * gx + gy * 1.0 * gy)))
                AS BIGINT) AS mean_gradient,
           CAST(MAX(CAST(ROUND(SQRT(gx * 1.0 * gx + gy * 1.0 * gy))
                AS BIGINT)) AS BIGINT) AS max_gradient
    FROM grad
    """,
)
def sobel_edge_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sobel gradient census of the balance raster: the 3x3 Sobel
    kernels are applied to every INTERIOR cell via a relational
    8-neighborhood join (kernel weights as CASE on the offset), and
    the mean/max gradient magnitudes summarize edge energy — the
    edge-detection member of the raster-image family, and the exact
    relational form of 'convolution = neighborhood join + weighted
    agg' that a 100-TB tile pipeline runs per tile
    (`integral_image_density` is the box-filter sibling).

    Determinism: integer cell values and kernel weights; interior
    restriction by exact neighbor count; rounding at output.

    Scale shape: one raster agg, one 3x3 neighborhood self-join with
    an 8-row-per-cell agg — linear in cells, no shuffle wider than
    the raster.
    """
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        ((F.col("c_custkey") * 7919) % 100000).alias("x"),
        ((F.col("c_custkey") * 104729) % 100000).alias("y"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("v"),
    )
    cells = pts.groupBy(
        F.expr("x DIV 10000").cast("long").alias("cx"),
        F.expr("y DIV 10000").cast("long").alias("cy"),
    ).agg(F.sum("v").cast("long").alias("v"))
    cells = cells.transform(_ckpt)
    a, b = cells.alias("a"), cells.alias("b")
    dx = F.col("b.cx") - F.col("a.cx")
    dy = F.col("b.cy") - F.col("a.cy")
    wx = (
        F.when(
            dx == 1,
            F.when(F.col("b.cy") == F.col("a.cy"), 2).otherwise(1),
        )
        .when(
            dx == -1,
            F.when(F.col("b.cy") == F.col("a.cy"), -2).otherwise(-1),
        )
        .otherwise(0)
    )
    wy = (
        F.when(
            dy == 1,
            F.when(F.col("b.cx") == F.col("a.cx"), 2).otherwise(1),
        )
        .when(
            dy == -1,
            F.when(F.col("b.cx") == F.col("a.cx"), -2).otherwise(-1),
        )
        .otherwise(0)
    )
    grad = (
        a.join(
            b,
            (F.abs(dx) <= 1)
            & (F.abs(dy) <= 1)
            & ~((dx == 0) & (dy == 0)),
        )
        .groupBy(F.col("a.cx").alias("cx"), F.col("a.cy").alias("cy"))
        .agg(
            F.sum(F.col("b.v") * wx).alias("gx"),
            F.sum(F.col("b.v") * wy).alias("gy"),
            F.count(F.lit(1)).alias("n_nbrs"),
        )
        .filter(F.col("n_nbrs") == 8)
    )
    mag = F.sqrt(
        F.col("gx") * 1.0 * F.col("gx") + F.col("gy") * 1.0 * F.col("gy")
    )
    return grad.agg(
        F.count(F.lit(1)).cast("long").alias("n_interior"),
        F.round(F.avg(mag)).cast("long").alias("mean_gradient"),
        F.max(F.round(mag).cast("long")).cast("long").alias("max_gradient"),
    )


@query(
    "arcsine_law_leads",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(ROUND(SUM(value) * 100) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), mu AS (SELECT SUM(x) // COUNT(*) AS m FROM d),
    walk AS (
        SELECT day,
               SUM(x - mu.m) OVER (ORDER BY day) AS s,
               CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
        FROM d, mu
    ), walk2 AS (
        SELECT s, t, LAG(s) OVER (ORDER BY t) AS sp FROM walk
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lead,
           CAST((1000000 * SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS lead_share_ppm,
           CAST(SUM(CASE WHEN s * sp < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sign_changes,
           CAST(MAX(CASE WHEN s * sp < 0 THEN t END) AS BIGINT)
               AS last_sign_change
    FROM walk2
    """,
)
def arcsine_law_leads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arcsine-law census of the mean-centered cumulative revenue
    walk: the fraction of days the running deviation leads (is
    positive), the number of sign changes, and the last crossing —
    Levy's arcsine laws say a fair walk's lead fraction is MOST
    likely near 0 or 1 (the arcsine density diverges at the edges)
    and sign changes are rare (~sqrt(n)), the counter-intuitive
    classical fact that makes 'one side led most of the month' a
    NON-signal. The random-walk diagnostics complement of
    `runs_test_daily_value` (exchangeability) and
    `variance_ratio_random_walk` (scaling).

    Determinism: exact integer deviations (centered by the exact
    integer-division mean); integer counts throughout.

    Scale shape: one day agg, one cumulative window, one agg with a
    LAG — linear.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100).cast("long").alias("x")
    )
    mu = d.agg(F.expr("SUM(x) DIV COUNT(*)").alias("m"))
    w = Window.orderBy("day")
    walk = d.crossJoin(F.broadcast(mu)).select(
        "day",
        F.sum(F.col("x") - F.col("m")).over(w).alias("s"),
        F.row_number().over(w).cast("long").alias("t"),
    )
    walk2 = walk.select(
        "s", "t", F.lag("s").over(Window.orderBy("t")).alias("sp")
    )
    return walk2.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.when(F.col("s") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_lead"),
        F.expr(
            "(1000000 * SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END))"
            " DIV COUNT(*)"
        )
        .cast("long")
        .alias("lead_share_ppm"),
        F.sum(
            F.when(F.col("s") * F.col("sp") < 0, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_sign_changes"),
        F.max(
            F.when(F.col("s") * F.col("sp") < 0, F.col("t"))
        )
        .cast("long")
        .alias("last_sign_change"),
    )


@query(
    "gamblers_ruin_ladder",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(ROUND(SUM(value) * 100) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), ud AS (
        SELECT CASE WHEN x > LAG(x) OVER (ORDER BY day)
               THEN 1 ELSE 0 END AS up,
               LAG(x) OVER (ORDER BY day) AS guard
        FROM d
    ), p AS (
        SELECT GREATEST(SUM(up) * 1.0 / COUNT(*),
                        1.0 - SUM(up) * 1.0 / COUNT(*)) AS p
        FROM ud WHERE guard IS NOT NULL
    ), ks AS (SELECT CAST(unnest([1, 2, 5, 10]) AS BIGINT) AS k)
    SELECT ks.k AS start_capital,
           CAST(20 AS BIGINT) AS target,
           ROUND(p.p, 6) AS win_prob_per_step,
           ROUND(CASE WHEN ABS(p.p - 0.5) < 1e-12
                 THEN 1.0 - ks.k / 20.0
                 ELSE (POW((1.0 - p.p) / p.p, ks.k) -
                       POW((1.0 - p.p) / p.p, 20))
                      / (1.0 - POW((1.0 - p.p) / p.p, 20)) END, 6)
               AS ruin_prob
    FROM ks, p
    """,
)
def gamblers_ruin_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gambler's-ruin probabilities for the empirical daily edge:
    with per-step win probability p (the dominant direction of the
    revenue walk, as in `kelly_growth_ladder`), a bettor starting
    with k = 1/2/5/10 units aiming for 20 is ruined with the exact
    closed-form probability ((q/p)^k - (q/p)^N)/(1 - (q/p)^N) —
    the absorption twin of `value_iteration_event_mdp` (rewards) and
    `absorbing_markov_purchase` (conversion): the same fundamental-
    matrix mathematics in its oldest closed form (de Moivre), with
    the fair-game limit 1 - k/N handled explicitly.

    Determinism: exact cent comparisons give p; closed-form ladder on
    a literal grid; rounding at output.

    Scale shape: one LAG window and scalar arithmetic over a 4-row
    literal.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100).cast("long").alias("x")
    )
    w = Window.orderBy("day")
    ud = d.select(
        F.when(F.col("x") > F.lag("x").over(w), 1).otherwise(0).alias("up"),
        F.lag("x").over(w).alias("guard"),
    ).filter(F.col("guard").isNotNull())
    raw_p = F.sum("up") * 1.0 / F.count(F.lit(1))
    p = ud.agg(F.greatest(raw_p, 1.0 - raw_p).alias("p"))
    ks = spark.createDataFrame([(1,), (2,), (5,), (10,)], "k long")
    r_ = (1.0 - F.col("p")) / F.col("p")
    ruin = F.when(
        F.abs(F.col("p") - 0.5) < 1e-12, 1.0 - F.col("k") / 20.0
    ).otherwise(
        (F.pow(r_, F.col("k")) - F.pow(r_, F.lit(20)))
        / (1.0 - F.pow(r_, F.lit(20)))
    )
    return ks.crossJoin(F.broadcast(p)).select(
        F.col("k").alias("start_capital"),
        F.lit(20).cast("long").alias("target"),
        F.round("p", 6).alias("win_prob_per_step"),
        F.round(ruin, 6).alias("ruin_prob"),
    )


def _seg_prefs_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared closure for the random-assignment mechanisms: the 5x5
    segment -> license preference matrix of `top_trading_cycles`
    (average order cents of the segment's customers against each
    nation-group license)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(
            F.broadcast(
                c.select(
                    F.col("c_custkey").alias("o_custkey"),
                    "c_mktsegment",
                    "c_nationkey",
                )
            ),
            "o_custkey",
        )
        .groupBy(
            F.col("c_mktsegment").alias("agent"),
            (F.col("c_nationkey") % 5).cast("long").alias("item"),
        )
        .agg(
            F.expr(
                "CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT)"
                " DIV COUNT(*)"
            )
            .cast("long")
            .alias("avg_cents")
        )
        .withColumn("g", F.lit(1))
    )


@query("random_serial_dictatorship")
def random_serial_dictatorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random Serial Dictatorship allocation probabilities, EXACT:
    all 120 agent orders are enumerated, each order greedily assigns
    every agent its best remaining item (preferences = the
    segment-license affinity of `top_trading_cycles`), and the
    allocation probability matrix is the exact count over 120 —
    emitted in 120ths so every entry is an integer. The invariant
    pins BISTOCHASTICITY (each row and column sums to exactly 120),
    the Birkhoff-von-Neumann sanity of any random assignment. RSD is
    strategy-proof but (unlike `probabilistic_serial_eating`) not
    ordinally efficient — comparing the two matrices on the same
    preferences exhibits the classic trade-off.

    Determinism: exact integer preferences with item tie-breaks;
    exhaustive enumeration — no randomness anywhere despite the name.

    Scale shape: preference closure is one fact agg; the 5!
    enumeration is one applyInPandas call (k! in the AGENT count, a
    mechanism-design constant).
    """
    import itertools

    import pandas as pd

    closure = _seg_prefs_closure(spark, sf_dir)

    def rsd(pdf: pd.DataFrame) -> pd.DataFrame:
        agents = sorted(set(pdf["agent"]))
        items = sorted(set(int(x) for x in pdf["item"]))
        aff = {
            (r["agent"], int(r["item"])): int(r["avg_cents"])
            for _, r in pdf.iterrows()
        }
        pref = {
            a_: sorted(items, key=lambda it: (-aff.get((a_, it), 0), it))
            for a_ in agents
        }
        counts = {(a_, it): 0 for a_ in agents for it in items}
        for order in itertools.permutations(agents):
            left = set(items)
            for a_ in order:
                pick = next(it for it in pref[a_] if it in left)
                left.discard(pick)
                counts[(a_, pick)] += 1
        rows = []
        for a_ in agents:
            for it in items:
                rows.append(
                    {
                        "agent": a_,
                        "item": it,
                        "prob_120ths": counts[(a_, it)],
                    }
                )
        return pd.DataFrame(rows)

    return closure.groupBy("g").applyInPandas(
        rsd, schema="agent string, item long, prob_120ths long"
    )


@query("probabilistic_serial_eating")
def probabilistic_serial_eating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic Serial (Bogomolnaia-Moulin simultaneous eating)
    allocation on the same preferences as `random_serial_dictatorship`:
    every agent 'eats' its favorite remaining item at unit speed;
    when an item is exhausted its eaters move on — the resulting
    fractional allocation is computed EXACTLY over rationals (event-
    driven simulation with Fraction timestamps) and emitted in ppm.
    PS is ordinally efficient and envy-free where RSD is strategy-
    proof — the two matrices on identical preferences are the
    textbook contrast. Bistochasticity (rows and columns sum to 1)
    is pinned by the invariant test.

    Determinism: exact preferences; exact rational eating times; ppm
    rounding at output only.

    Scale shape: closure agg + one applyInPandas call; at most
    |items| exhaustion events, each O(agents).
    """
    import pandas as pd

    closure = _seg_prefs_closure(spark, sf_dir)

    def ps(pdf: pd.DataFrame) -> pd.DataFrame:
        from fractions import Fraction as Fr

        agents = sorted(set(pdf["agent"]))
        items = sorted(set(int(x) for x in pdf["item"]))
        aff = {
            (r["agent"], int(r["item"])): int(r["avg_cents"])
            for _, r in pdf.iterrows()
        }
        pref = {
            a_: sorted(items, key=lambda it: (-aff.get((a_, it), 0), it))
            for a_ in agents
        }
        remaining = {it: Fr(1) for it in items}
        eaten = {(a_, it): Fr(0) for a_ in agents for it in items}
        clock = Fr(0)
        while clock < 1:
            # current targets
            tgt = {}
            for a_ in agents:
                t_ = next(
                    (it for it in pref[a_] if remaining[it] > 0), None
                )
                if t_ is not None:
                    tgt[a_] = t_
            if not tgt:
                break
            eaters: dict[int, int] = {}
            for a_, it in tgt.items():
                eaters[it] = eaters.get(it, 0) + 1
            # time until the first exhaustion (or the 1.0 horizon)
            dt = Fr(1) - clock
            for it, ne in eaters.items():
                dt = min(dt, remaining[it] / ne)
            for a_, it in tgt.items():
                eaten[(a_, it)] += dt
            for it, ne in eaters.items():
                remaining[it] -= dt * ne
            clock += dt
        rows = []
        for a_ in agents:
            for it in items:
                rows.append(
                    {
                        "agent": a_,
                        "item": it,
                        "share_ppm": int(
                            round(eaten[(a_, it)] * 1000000)
                        ),
                    }
                )
        return pd.DataFrame(rows)

    return closure.groupBy("g").applyInPandas(
        ps, schema="agent string, item long, share_ppm long"
    )
