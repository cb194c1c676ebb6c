"""Query registry part 7 of 12 — registration order preserved.

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

from pyspark_movie_recommender_spark.queries.registry_06 import _TRADE_EDGE_SQL  # noqa: E501

@query(
    "feature_hashing_collision_audit",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
        FROM documents WHERE trim(text) <> ''
    ), freq AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY token
    ), hashed AS (
        SELECT token, n,
               ((LENGTH(token) * 2654435761
                 + CAST(ROUND(
                     (ASCII(token) * 31 + ASCII(SUBSTR(token, -1, 1))) * 2654435761
                   ) AS BIGINT)) % 4294967296) % 4096 AS bucket
        FROM freq
    ), buckets AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS vocab_in_bucket,
               SUM(n) AS occ_in_bucket, MAX(n) AS max_occ
        FROM hashed GROUP BY bucket
    )
    SELECT CAST((SELECT COUNT(*) FROM freq) AS BIGINT) AS vocab_size,
           CAST(COUNT(*) AS BIGINT) AS buckets_used,
           CAST((SELECT COUNT(*) FROM freq) - COUNT(*) AS BIGINT)
               AS collided_terms,
           CAST(SUM(CASE WHEN vocab_in_bucket > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS collision_buckets,
           CAST(SUM(occ_in_bucket - max_occ) AS BIGINT) AS minority_occ_mass,
           CAST(ROUND(1000000.0 * SUM(occ_in_bucket - max_occ)
                      / SUM(occ_in_bucket)) AS BIGINT) AS minority_mass_ppm
    FROM buckets
    """,
)
def feature_hashing_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing (hashing-trick) collision audit: project the
    corpus vocabulary into 4096 buckets with a portable integer hash
    (length and first/last byte mixed by the Knuth constant — shared
    arithmetic, not an engine hash builtin) and measure what a hashed
    bag-of-words model would destroy: terms sharing a bucket, buckets
    with collisions, and the occurrence mass of every bucket's
    NON-dominant terms (the signal a linear model can no longer
    separate). The feasibility check before swapping a vocabulary for
    a hash space at corpus scale.

    Determinism: the hash is plain BIGINT arithmetic on code points,
    identical in both dialects; all masses are exact counts.

    Scale shape: explode → token-count partial agg (the only
    fact-sized shuffle), then vocab-sized hashing and a 4096-row
    aggregate. The audit costs one pass regardless of corpus size.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.where(F.trim(F.col("text")) != "")
        .select(F.explode(ws_tokens(F.lower(F.trim(F.col("text"))))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    bucket = (
        (
            F.length("token") * 2654435761
            + F.round(
                (
                    F.ascii("token") * 31
                    + F.ascii(F.substring(F.col("token"), -1, 1))
                )
                * 2654435761
            ).cast("long")
        )
        % 4294967296
    ) % 4096
    hashed = freq.withColumn("bucket", bucket)
    buckets = hashed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("vocab_in_bucket"),
        F.sum("n").alias("occ_in_bucket"),
        F.max("n").alias("max_occ"),
    )
    vocab = freq.agg(F.count(F.lit(1)).cast("long").alias("vocab_size"))
    return buckets.crossJoin(F.broadcast(vocab)).agg(
        F.max("vocab_size").alias("vocab_size"),
        F.count(F.lit(1)).cast("long").alias("buckets_used"),
        (F.max("vocab_size") - F.count(F.lit(1))).cast("long").alias("collided_terms"),
        F.sum(F.when(F.col("vocab_in_bucket") > 1, 1).otherwise(0))
        .cast("long")
        .alias("collision_buckets"),
        F.sum(F.col("occ_in_bucket") - F.col("max_occ"))
        .cast("long")
        .alias("minority_occ_mass"),
        F.round(
            1000000.0
            * F.sum(F.col("occ_in_bucket") - F.col("max_occ"))
            / F.sum("occ_in_bucket")
        )
        .cast("long")
        .alias("minority_mass_ppm"),
    )


@query(
    "balls_in_bins_occupancy",
    oracle="""
    WITH occ AS (
        SELECT ((o_orderkey * 2654435761) % 4294967296) % 4096 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS ld
        FROM orders GROUP BY 1
    ), s AS (
        SELECT SUM(ld) AS n_items, COUNT(*) AS occupied, MAX(ld) AS max_load,
               SUM(CASE WHEN ld = 1 THEN 1 ELSE 0 END) AS singleton_bins,
               SUM(CASE WHEN ld >= 2 THEN 1 ELSE 0 END) AS multi_bins
        FROM occ
    )
    SELECT CAST(n_items AS BIGINT) AS n_items,
           CAST(4096 AS BIGINT) AS bins,
           CAST(ROUND(1000000.0 * n_items / 4096.0) AS BIGINT) AS lambda_micro,
           CAST(4096 - occupied AS BIGINT) AS empty_bins,
           CAST(ROUND(1000.0 * 4096.0 * EXP(-(n_items / 4096.0))) AS BIGINT)
               AS empty_bins_expected_milli,
           CAST(singleton_bins AS BIGINT) AS singleton_bins,
           CAST(ROUND(1000.0 * 4096.0 * (n_items / 4096.0)
                      * EXP(-(n_items / 4096.0))) AS BIGINT)
               AS singleton_bins_expected_milli,
           CAST(multi_bins AS BIGINT) AS multi_bins,
           CAST(max_load AS BIGINT) AS max_load
    FROM s
    """,
)
def balls_in_bins_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balls-into-bins occupancy audit: hash every order key into 4096
    bins with the same portable Knuth-constant arithmetic used across
    the hashing suite and compare the observed occupancy profile
    (empty bins, singleton bins, collision bins, maximum load) against
    the Poisson(lambda = n/m) prediction that governs uniform hashing.
    This is the health check behind any hash-partitioned layout: a
    max load far above the Poisson tail or an empty-bin count far off
    m*exp(-lambda) means the key-to-bucket map is skewed and a
    shuffle partitioner built on it will straggle.

    Determinism: the bucket map is exact BIGINT arithmetic; the only
    floats are the two Poisson expectations, rounded to milli-bins
    from the same double expression in both dialects.

    Scale shape: one map-side bucket projection, a 4096-group partial
    aggregate (combiner collapses per-partition loads before the
    shuffle), then a single-row reduction — the audit costs one pass
    and a constant-size shuffle no matter how many orders flow in.
    """
    orders = load_table(spark, sf_dir, "orders")
    occ = (
        orders.select(
            (
                ((F.col("o_orderkey") * F.lit(2654435761)) % F.lit(4294967296))
                % F.lit(4096)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("ld"))
    )
    stats = occ.agg(
        F.sum("ld").alias("n_items"),
        F.count(F.lit(1)).alias("occupied"),
        F.max("ld").alias("max_load"),
        F.sum(F.when(F.col("ld") == 1, 1).otherwise(0)).alias("singleton_bins"),
        F.sum(F.when(F.col("ld") >= 2, 1).otherwise(0)).alias("multi_bins"),
    )
    lam = F.col("n_items") / F.lit(4096.0)
    return stats.select(
        F.col("n_items").cast("long").alias("n_items"),
        F.lit(4096).cast("long").alias("bins"),
        F.round(F.lit(1000000.0) * lam).cast("long").alias("lambda_micro"),
        (F.lit(4096) - F.col("occupied")).cast("long").alias("empty_bins"),
        F.round(F.lit(1000.0) * F.lit(4096.0) * F.exp(-lam))
        .cast("long")
        .alias("empty_bins_expected_milli"),
        F.col("singleton_bins").cast("long").alias("singleton_bins"),
        F.round(F.lit(1000.0) * F.lit(4096.0) * lam * F.exp(-lam))
        .cast("long")
        .alias("singleton_bins_expected_milli"),
        F.col("multi_bins").cast("long").alias("multi_bins"),
        F.col("max_load").cast("long").alias("max_load"),
    )


@query(
    "running_record_rate",
    oracle="""
    WITH seq AS (
        SELECT o_custkey, o_totalprice,
               ROW_NUMBER() OVER w AS idx,
               MAX(o_totalprice) OVER
                   (w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_max
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), percust AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN prev_max IS NULL
                              OR o_totalprice > prev_max
                             THEN 1 ELSE 0 END) AS BIGINT) AS recs
        FROM seq GROUP BY o_custkey
    ), harm AS (
        SELECT nn.n, SUM(1.0 / k.k) AS h
        FROM (SELECT DISTINCT n FROM percust) nn,
             UNNEST(generate_series(1, nn.n)) AS k(k)
        GROUP BY nn.n
    ), joined AS (
        SELECT p.recs, p.n, h.h FROM percust p JOIN harm h ON p.n = h.n
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS customers,
           CAST(SUM(n) AS BIGINT) AS total_orders,
           CAST(SUM(recs) AS BIGINT) AS total_records,
           CAST(ROUND(1000.0 * SUM(recs) / COUNT(*)) AS BIGINT)
               AS mean_records_milli,
           CAST(ROUND(1000.0 * SUM(h) / COUNT(*)) AS BIGINT)
               AS mean_expected_milli,
           CAST(SUM(CASE WHEN 1000 * recs > ROUND(1000.0 * h)
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS over_expected_customers
    FROM joined
    """,
)
def running_record_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-record audit over each customer's order history: walk
    the orders in (date, key) sequence, count record-breaking totals
    (strictly above every earlier order), and compare the mean record
    count with the harmonic number H_n — the exact expectation for an
    exchangeable sequence (the i-th order is a record with probability
    1/i). A mean far above H_n means spend trajectories trend upward
    (records cluster late); far below means early peaks. This is the
    records-theory drift check that needs no model fit at all.

    Determinism: record flags and counts are exact integers from
    strict comparisons on stored values; H_n is the same 1/k sum over
    an exploded integer range in both dialects, rounded to milli only
    at the final single-row projection.

    Scale shape: one window pass keyed by o_custkey (records and
    sequence index from the same exchange), a per-customer partial
    aggregate, then a harmonic table built from the DISTINCT group
    sizes (tens of rows) broadcast back — the fact table is shuffled
    exactly once.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        "o_custkey",
        "o_totalprice",
        F.max("o_totalprice")
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_max"),
    )
    percust = seq.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(
                F.col("prev_max").isNull()
                | (F.col("o_totalprice") > F.col("prev_max")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("recs"),
    )
    harm = (
        percust.select("n")
        .distinct()
        .select("n", F.explode(F.sequence(F.lit(1), F.col("n"))).alias("k"))
        .groupBy("n")
        .agg(F.sum(F.lit(1.0) / F.col("k")).alias("h"))
    )
    joined = percust.join(F.broadcast(harm), "n")
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("customers"),
        F.sum("n").cast("long").alias("total_orders"),
        F.sum("recs").cast("long").alias("total_records"),
        F.round(F.lit(1000.0) * F.sum("recs") / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_records_milli"),
        F.round(F.lit(1000.0) * F.sum("h") / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_expected_milli"),
        F.sum(
            F.when(
                F.lit(1000) * F.col("recs")
                > F.round(F.lit(1000.0) * F.col("h")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("over_expected_customers"),
    )


@query(
    "secretary_stop_rule_replay",
    oracle="""
    WITH seq AS (
        SELECT o_custkey, o_totalprice,
               ROW_NUMBER() OVER w AS idx,
               CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n,
               MAX(o_totalprice) OVER (PARTITION BY o_custkey)
                   AS overall_max
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), eligible AS (
        SELECT *, GREATEST(1, CAST(FLOOR(n * 0.3678794411714423) AS BIGINT))
                   AS r
        FROM seq WHERE n >= 4
    ), scouted AS (
        SELECT *,
               MAX(CASE WHEN idx <= r THEN o_totalprice END)
                   OVER (PARTITION BY o_custkey) AS best_first
        FROM eligible
    ), flagged AS (
        SELECT *,
               MIN(CASE WHEN idx > r AND o_totalprice > best_first
                        THEN idx END)
                   OVER (PARTITION BY o_custkey) AS first_cand_idx
        FROM scouted
    ), percust AS (
        SELECT o_custkey, MAX(n) AS n,
               MAX(CASE
                     WHEN first_cand_idx IS NOT NULL
                          AND idx = first_cand_idx
                          AND o_totalprice = overall_max THEN 1
                     WHEN first_cand_idx IS NULL
                          AND idx = n
                          AND o_totalprice = overall_max THEN 1
                     ELSE 0 END) AS success
        FROM flagged GROUP BY o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS eligible_customers,
           CAST(SUM(success) AS BIGINT) AS successes,
           CAST(ROUND(1000.0 * SUM(success) / COUNT(*)) AS BIGINT)
               AS success_rate_milli,
           CAST(368 AS BIGINT) AS inv_e_bound_milli,
           CAST(ROUND(1000.0 * SUM(1.0 / n) / COUNT(*)) AS BIGINT)
               AS random_pick_rate_milli
    FROM percust
    """,
)
def secretary_stop_rule_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secretary-problem (1/e stopping rule) replay over real order
    streams: for every customer with at least four orders, observe the
    first floor(n/e) orders without committing, then accept the first
    later order that beats all of them (falling back to the last order
    if none does). Report how often the rule lands the customer's true
    maximum against the classical 1/e ~ 36.8% optimum and the 1/n
    random-pick baseline. Real sequences are not exchangeable, so the
    gap between the replayed rate and 1/e measures temporal structure
    (trending spend beats the bound; early peaks undershoot it) — the
    online-decision mirror of the running_record_rate drift audit.

    Determinism: the stop index floor(n * 0.36787944...) is the same
    double→floor in both dialects; accept/compare logic is strict
    comparison on stored values; only the two final rates are rounded.

    Scale shape: every window is keyed by o_custkey, so the fact table
    is exchanged once and the row_number / partition-max / scout-max /
    first-candidate columns all reuse that single partitioning; the
    per-customer reduction and final single-row aggregate follow
    map-side.
    """
    orders = load_table(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = Window.partitionBy("o_custkey")
    seq = orders.select(
        "o_custkey",
        "o_totalprice",
        F.row_number().over(wo).alias("idx"),
        F.count(F.lit(1)).over(wp).cast("long").alias("n"),
        F.max("o_totalprice").over(wp).alias("overall_max"),
    )
    eligible = seq.where(F.col("n") >= 4).withColumn(
        "r",
        F.greatest(
            F.lit(1).cast("long"),
            F.floor(F.col("n") * F.lit(0.3678794411714423)),
        ),
    )
    scouted = eligible.withColumn(
        "best_first",
        F.max(
            F.when(F.col("idx") <= F.col("r"), F.col("o_totalprice"))
        ).over(wp),
    )
    flagged = scouted.withColumn(
        "first_cand_idx",
        F.min(
            F.when(
                (F.col("idx") > F.col("r"))
                & (F.col("o_totalprice") > F.col("best_first")),
                F.col("idx"),
            )
        ).over(wp),
    )
    percust = flagged.groupBy("o_custkey").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(
                F.col("first_cand_idx").isNotNull()
                & (F.col("idx") == F.col("first_cand_idx"))
                & (F.col("o_totalprice") == F.col("overall_max")),
                1,
            )
            .when(
                F.col("first_cand_idx").isNull()
                & (F.col("idx") == F.col("n"))
                & (F.col("o_totalprice") == F.col("overall_max")),
                1,
            )
            .otherwise(0)
        ).alias("success"),
    )
    return percust.agg(
        F.count(F.lit(1)).cast("long").alias("eligible_customers"),
        F.sum("success").cast("long").alias("successes"),
        F.round(F.lit(1000.0) * F.sum("success") / F.count(F.lit(1)))
        .cast("long")
        .alias("success_rate_milli"),
        F.lit(368).cast("long").alias("inv_e_bound_milli"),
        F.round(F.lit(1000.0) * F.sum(F.lit(1.0) / F.col("n")) / F.count(F.lit(1)))
        .cast("long")
        .alias("random_pick_rate_milli"),
    )


@query(
    "hausdorff_region_profiles",
    oracle="""
    WITH bal AS (
        SELECT c_nationkey, AVG(c_acctbal) / 1000.0 AS x
        FROM customer GROUP BY c_nationkey
    ), spend AS (
        SELECT c_nationkey, AVG(o_totalprice) / 10000.0 AS y
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
    ), pts AS (
        SELECT r_name, n_nationkey AS pid, bal.x, spend.y
        FROM bal JOIN spend USING (c_nationkey)
        JOIN nation ON n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n_regionkey
    ), dmin AS (
        SELECT a.r_name AS ra, b.r_name AS rb, a.pid,
               MIN((a.x - b.x) * (a.x - b.x)
                   + (a.y - b.y) * (a.y - b.y)) AS mind
        FROM pts a JOIN pts b ON a.r_name <> b.r_name
        GROUP BY a.r_name, b.r_name, a.pid
    ), dir AS (
        SELECT ra, rb, MAX(mind) AS hmax, AVG(mind) AS cavg
        FROM dmin GROUP BY ra, rb
    )
    SELECT d1.ra AS region_a, d1.rb AS region_b,
           CAST(ROUND(1000.0 * GREATEST(d1.hmax, d2.hmax)) AS BIGINT)
               AS hausdorff_sq_milli,
           CAST(ROUND(1000.0 * (d1.cavg + d2.cavg) / 2.0) AS BIGINT)
               AS chamfer_sq_milli
    FROM dir d1 JOIN dir d2 ON d1.ra = d2.rb AND d1.rb = d2.ra
    WHERE d1.ra < d1.rb
    """,
)
def hausdorff_region_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hausdorff and Chamfer distances between regions viewed as point
    sets: each nation becomes a 2-D profile point (mean customer
    balance, mean order total, fixed-scaled to comparable units) and
    each region is the set of its nations' points. The symmetric
    Hausdorff distance (max of directed max-min squared distances)
    flags the worst-represented nation between two regions; the
    Chamfer distance (mean of directed mean-min) gives the typical
    profile gap. Point-set distances like these are the standard way
    to compare entity clusters without choosing a single centroid.

    Determinism: squared distances (no sqrt), fixed scale constants,
    milli rounding only at the final projection; the min/max/avg
    tournament is order-free.

    Scale shape: the fact tables reduce to one profile row per nation
    BEFORE any pairing (two hash aggregates), so the cross join runs
    on a ~25-row broadcastable set; everything after the first
    aggregates is driver-trivial no matter the corpus size.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    bal = customer.groupBy("c_nationkey").agg(
        (F.avg("c_acctbal") / F.lit(1000.0)).alias("x")
    )
    spend = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey")
        .agg((F.avg("o_totalprice") / F.lit(10000.0)).alias("y"))
    )
    pts = (
        bal.join(spend, "c_nationkey")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .select(F.col("r_name"), F.col("n_nationkey").alias("pid"), "x", "y")
    )
    a = pts.alias("a")
    b = pts.alias("b")
    d2 = (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x")) + (
        F.col("a.y") - F.col("b.y")
    ) * (F.col("a.y") - F.col("b.y"))
    dmin = (
        a.join(b, F.col("a.r_name") != F.col("b.r_name"))
        .groupBy(
            F.col("a.r_name").alias("ra"),
            F.col("b.r_name").alias("rb"),
            F.col("a.pid").alias("pid"),
        )
        .agg(F.min(d2).alias("mind"))
    )
    direct = dmin.groupBy("ra", "rb").agg(
        F.max("mind").alias("hmax"), F.avg("mind").alias("cavg")
    )
    direct = _ckpt(direct)  # shared fan-out relation
    d1 = direct.alias("d1")
    dd2 = direct.alias("d2")
    return (
        d1.join(
            dd2,
            (F.col("d1.ra") == F.col("d2.rb")) & (F.col("d1.rb") == F.col("d2.ra")),
        )
        .where(F.col("d1.ra") < F.col("d1.rb"))
        .select(
            F.col("d1.ra").alias("region_a"),
            F.col("d1.rb").alias("region_b"),
            F.round(F.lit(1000.0) * F.greatest(F.col("d1.hmax"), F.col("d2.hmax")))
            .cast("long")
            .alias("hausdorff_sq_milli"),
            F.round(F.lit(1000.0) * (F.col("d1.cavg") + F.col("d2.cavg")) / F.lit(2.0))
            .cast("long")
            .alias("chamfer_sq_milli"),
        )
    )


@query(
    "littlewood_protection_level",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate,
               CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                             THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM orders GROUP BY o_orderdate
    ), fares AS (
        SELECT AVG(CASE WHEN o_orderpriority = '1-URGENT'
                        THEN o_totalprice END) AS ph,
               AVG(CASE WHEN o_orderpriority <> '1-URGENT'
                        THEN o_totalprice END) AS pl
        FROM orders
    ), dist AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS cnt FROM daily GROUP BY d
    ), cand AS (
        SELECT d AS y FROM dist UNION SELECT 0 AS y
    ), surv AS (
        SELECT c.y,
               CAST(COALESCE(SUM(CASE WHEN dist.d > c.y
                                      THEN dist.cnt END), 0) AS BIGINT)
                   AS days_gt
        FROM cand c LEFT JOIN dist ON dist.d > c.y
        GROUP BY c.y
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS days,
               CAST(MAX(d) AS BIGINT) AS max_daily FROM daily
    ), pick AS (
        SELECT MIN(y) AS y_star
        FROM surv, tot, fares
        WHERE days_gt * ph <= pl * days
    )
    SELECT tot.days, tot.max_daily,
           CAST(ROUND(1000.0 * fares.ph) AS BIGINT) AS fare_high_milli,
           CAST(ROUND(1000.0 * fares.pl) AS BIGINT) AS fare_low_milli,
           CAST(ROUND(1000.0 * fares.pl / fares.ph) AS BIGINT)
               AS critical_ratio_milli,
           CAST(pick.y_star AS BIGINT) AS protection_level,
           CAST((SELECT days_gt FROM surv WHERE y = pick.y_star) AS BIGINT)
               AS spill_days
    FROM tot, fares, pick
    """,
)
def littlewood_protection_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Littlewood's two-fare protection level from replayed demand:
    treat URGENT orders as the high-fare class and everything else as
    the low-fare class, build the empirical daily distribution of
    high-fare demand, and find the smallest protection level y* whose
    empirical spill probability P(D_high > y) drops to the critical
    ratio p_low / p_high — the classic marginal-seat condition
    EMSR derives from. Reports both fares, the critical ratio, the
    chosen level, and how many days would still spill past it: the
    capacity-reservation answer a yield manager reads off directly.

    Determinism: demand counts, day counts, and the survival table are
    exact integers; the only doubles are the two fare means, used once
    in a single inequality and rounded to milli for display.

    Scale shape: one date-keyed partial aggregate over orders (the
    only fact-sized shuffle) plus one global fare aggregate; the
    survival/candidate machinery runs on the tiny distinct-demand
    table, so the optimization itself is constant-cost at any scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy("o_orderdate").agg(
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0))
        .cast("long")
        .alias("d")
    )
    daily = _ckpt(daily)  # shared fan-out relation
    fares = orders.agg(
        F.avg(
            F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice"))
        ).alias("ph"),
        F.avg(
            F.when(F.col("o_orderpriority") != "1-URGENT", F.col("o_totalprice"))
        ).alias("pl"),
    )
    fares = _ckpt(fares)  # shared fan-out relation
    dist = daily.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    dist = _ckpt(dist)  # shared fan-out relation
    cand = dist.select(F.col("d").alias("y")).union(
        dist.sparkSession.range(1).select(F.lit(0).cast("long").alias("y"))
    ).distinct()
    cand = _ckpt(cand)  # shared fan-out relation
    surv = (
        cand.join(dist, dist.d > cand.y, "left")
        .groupBy("y")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("days_gt"))
    )
    surv = _ckpt(surv)  # shared fan-out relation
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("days"),
        F.max("d").cast("long").alias("max_daily"),
    )
    tot = _ckpt(tot)  # shared fan-out relation
    pick = (
        surv.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(fares))
        .where(F.col("days_gt") * F.col("ph") <= F.col("pl") * F.col("days"))
        .agg(F.min("y").alias("y_star"))
    )
    pick = _ckpt(pick)  # shared fan-out relation
    spill = (
        surv.crossJoin(F.broadcast(pick))
        .where(F.col("y") == F.col("y_star"))
        .select(F.col("days_gt").alias("spill_days"))
    )
    return (
        tot.crossJoin(F.broadcast(fares))
        .crossJoin(F.broadcast(pick))
        .crossJoin(F.broadcast(spill))
        .select(
            "days",
            "max_daily",
            F.round(F.lit(1000.0) * F.col("ph")).cast("long").alias("fare_high_milli"),
            F.round(F.lit(1000.0) * F.col("pl")).cast("long").alias("fare_low_milli"),
            F.round(F.lit(1000.0) * F.col("pl") / F.col("ph"))
            .cast("long")
            .alias("critical_ratio_milli"),
            F.col("y_star").cast("long").alias("protection_level"),
            F.col("spill_days").cast("long").alias("spill_days"),
        )
    )


@query(
    "chatterjee_xi_dependence",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(COUNT(*) AS BIGINT) AS d_cnt,
               SUM(o_totalprice) / COUNT(*) AS d_avg
        FROM orders GROUP BY o_orderdate
    ), ranked AS (
        SELECT d, d_cnt, d_avg,
               ROW_NUMBER() OVER (ORDER BY d_avg, d) AS r
        FROM daily
    ), seq AS (
        SELECT r,
               LEAD(r) OVER (ORDER BY d_cnt, d) AS r_next
        FROM ranked
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN r_next IS NOT NULL
                             THEN ABS(r_next - r) END) AS BIGINT) AS jump
        FROM seq
    )
    SELECT n, jump,
           CAST(ROUND(1000000.0 * (1.0 - 3.0 * jump / (n * n - 1.0)))
                AS BIGINT) AS xi_micro
    FROM s
    """,
)
def chatterjee_xi_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chatterjee's xi coefficient (2020) between daily order volume
    and daily mean ticket: order the days by volume, take the ranks of
    mean ticket in that order, and measure the total rank jump —
    xi = 1 - 3*sum|r_{i+1}-r_i|/(n^2-1). Unlike Pearson/Spearman, xi
    consistently detects ANY measurable dependence (oscillating,
    V-shaped, non-monotone) and equals ~0 under independence, ~1 when
    ticket size is a function of volume. Ties are broken by calendar
    date on both axes — a documented deterministic convention applied
    identically in both dialects.

    Determinism: ranks, jumps, and their sum are exact integers; the
    single division happens once at the final micro-rounded
    projection.

    Scale shape: one date-keyed partial aggregate over orders reduces
    the fact table to a calendar-bounded (~2.5k-row) series; both
    window passes run on that tiny series, so the coefficient costs
    one fact shuffle regardless of corpus size.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("d_cnt"),
        (F.sum("o_totalprice") / F.count(F.lit(1))).alias("d_avg"),
    )
    ranked = daily.withColumn(
        "r", F.row_number().over(Window.orderBy("d_avg", "d"))
    )
    seq = ranked.select(
        "r",
        F.lead("r").over(Window.orderBy("d_cnt", "d")).alias("r_next"),
    )
    s = seq.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(
                F.col("r_next").isNotNull(), F.abs(F.col("r_next") - F.col("r"))
            )
        )
        .cast("long")
        .alias("jump"),
    )
    return s.select(
        "n",
        "jump",
        F.round(
            F.lit(1000000.0)
            * (
                F.lit(1.0)
                - F.lit(3.0)
                * F.col("jump")
                / (F.col("n") * F.col("n") - F.lit(1.0))
            )
        )
        .cast("long")
        .alias("xi_micro"),
    )


@query(
    "hoeffding_d_dependence",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(COUNT(*) AS BIGINT) AS d_cnt,
               SUM(o_totalprice) / COUNT(*) AS d_avg
        FROM orders GROUP BY o_orderdate
    ), ranked AS (
        SELECT d, d_cnt, d_avg,
               CAST(ROW_NUMBER() OVER (ORDER BY d_cnt, d) AS BIGINT) AS rx,
               CAST(ROW_NUMBER() OVER (ORDER BY d_avg, d) AS BIGINT) AS ry
        FROM daily
    ), dominated AS (
        SELECT a.d, a.rx, a.ry,
               CAST(COUNT(b.d) AS BIGINT) AS c
        FROM ranked a LEFT JOIN ranked b
          ON b.rx < a.rx AND b.ry < a.ry
        GROUP BY a.d, a.rx, a.ry
    ), sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c * (c - 1)) AS BIGINT) AS d1,
               CAST(SUM((rx - 1) * (rx - 2) * (ry - 1) * (ry - 2)) AS BIGINT)
                   AS d2,
               CAST(SUM((rx - 2) * (ry - 2) * c) AS BIGINT) AS d3
        FROM dominated
    )
    SELECT n, d1, d2, d3,
           CAST(ROUND(1000000.0 * 30.0
                * ((n - 2.0) * (n - 3.0) * d1 + d2 - 2.0 * (n - 2.0) * d3)
                / (n * (n - 1.0) * (n - 2.0) * (n - 3.0) * (n - 4.0)))
                AS BIGINT) AS hoeffding_d_micro
    FROM sums
    """,
)
def hoeffding_d_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoeffding's D statistic between daily order volume and daily
    mean ticket: the rank-based functional of bivariate concordance
    (D1/D2/D3 sums over ranks and dominated-point counts) that is
    zero in expectation under independence and positive under ANY
    dependence — the classical nonparametric complement to the modern
    Chatterjee xi computed in chatterjee_xi_dependence. The three raw
    sums are emitted as exact integers so cross-engine agreement is
    byte-for-byte, with the scaled D rounded to micro.

    Determinism: ranks use the same (value, date) tie-break on both
    engines; c_i counts and the D1/D2/D3 sums are exact BIGINT
    arithmetic; the single double expression is evaluated once from
    identical integers.

    Scale shape: the fact table collapses to a calendar-bounded daily
    series first, so the O(n^2) dominated-point join runs on ~2.5k
    rows (a few million comparisons) no matter the corpus size — the
    quadratic part is bounded by the calendar, not the data.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("d_cnt"),
        (F.sum("o_totalprice") / F.count(F.lit(1))).alias("d_avg"),
    )
    ranked = daily.select(
        "d",
        F.row_number().over(Window.orderBy("d_cnt", "d")).cast("long").alias("rx"),
        F.row_number().over(Window.orderBy("d_avg", "d")).cast("long").alias("ry"),
    )
    a = ranked.alias("a")
    b = ranked.alias("b")
    dominated = (
        a.join(
            b,
            (F.col("b.rx") < F.col("a.rx")) & (F.col("b.ry") < F.col("a.ry")),
            "left",
        )
        .groupBy(F.col("a.d"), F.col("a.rx").alias("rx"), F.col("a.ry").alias("ry"))
        .agg(F.count(F.col("b.d")).cast("long").alias("c"))
    )
    sums = dominated.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("d1"),
        F.sum(
            (F.col("rx") - 1)
            * (F.col("rx") - 2)
            * (F.col("ry") - 1)
            * (F.col("ry") - 2)
        )
        .cast("long")
        .alias("d2"),
        F.sum((F.col("rx") - 2) * (F.col("ry") - 2) * F.col("c"))
        .cast("long")
        .alias("d3"),
    )
    return sums.select(
        "n",
        "d1",
        "d2",
        "d3",
        F.round(
            F.lit(1000000.0)
            * F.lit(30.0)
            * (
                (F.col("n") - F.lit(2.0)) * (F.col("n") - F.lit(3.0)) * F.col("d1")
                + F.col("d2")
                - F.lit(2.0) * (F.col("n") - F.lit(2.0)) * F.col("d3")
            )
            / (
                F.col("n")
                * (F.col("n") - F.lit(1.0))
                * (F.col("n") - F.lit(2.0))
                * (F.col("n") - F.lit(3.0))
                * (F.col("n") - F.lit(4.0))
            )
        )
        .cast("long")
        .alias("hoeffding_d_micro"),
    )


@query(
    "minimax_mst_trade_backbone",
    oracle=_TRADE_EDGE_SQL
    + """
    , und AS MATERIALIZED (
        SELECT LEAST(u, v) AS u, GREATEST(u, v) AS v, MIN(w) AS w
        FROM edges GROUP BY 1, 2
    ), tb AS MATERIALIZED (
        SELECT u, v, w, w * 1000000 + u * 1000 + v AS tw FROM und
    ), sym AS MATERIALIZED (
        SELECT u, v, tw FROM tb
        UNION ALL SELECT v AS u, u AS v, tw FROM tb
    ), m1 AS MATERIALIZED (
        SELECT u, v, MIN(tw) AS tw FROM sym GROUP BY u, v
    )
    , m2 AS MATERIALIZED (
        SELECT q.u, q.v, MIN(q.tw) AS tw FROM (
            SELECT x.u, y.v, GREATEST(x.tw, y.tw) AS tw
            FROM m1 x JOIN m1 y ON y.u = x.v AND x.u <> y.v
            UNION ALL SELECT u, v, tw FROM m1
        ) q GROUP BY q.u, q.v
    )
    , m4 AS MATERIALIZED (
        SELECT q.u, q.v, MIN(q.tw) AS tw FROM (
            SELECT x.u, y.v, GREATEST(x.tw, y.tw) AS tw
            FROM m2 x JOIN m2 y ON y.u = x.v AND x.u <> y.v
            UNION ALL SELECT u, v, tw FROM m2
        ) q GROUP BY q.u, q.v
    )
    , m8 AS MATERIALIZED (
        SELECT q.u, q.v, MIN(q.tw) AS tw FROM (
            SELECT x.u, y.v, GREATEST(x.tw, y.tw) AS tw
            FROM m4 x JOIN m4 y ON y.u = x.v AND x.u <> y.v
            UNION ALL SELECT u, v, tw FROM m4
        ) q GROUP BY q.u, q.v
    )
    , m16 AS MATERIALIZED (
        SELECT q.u, q.v, MIN(q.tw) AS tw FROM (
            SELECT x.u, y.v, GREATEST(x.tw, y.tw) AS tw
            FROM m8 x JOIN m8 y ON y.u = x.v AND x.u <> y.v
            UNION ALL SELECT u, v, tw FROM m8
        ) q GROUP BY q.u, q.v
    )
    , m32 AS MATERIALIZED (
        SELECT q.u, q.v, MIN(q.tw) AS tw FROM (
            SELECT x.u, y.v, GREATEST(x.tw, y.tw) AS tw
            FROM m16 x JOIN m16 y ON y.u = x.v AND x.u <> y.v
            UNION ALL SELECT u, v, tw FROM m16
        ) q GROUP BY q.u, q.v
    )
    SELECT CAST(t.u AS BIGINT) AS nation_u,
           CAST(t.v AS BIGINT) AS nation_v,
           CAST(t.w AS BIGINT) AS cost_micro_nats
    FROM tb t JOIN m32 m
      ON m.u = t.u AND m.v = t.v AND m.tw = t.tw
    """,
)
def minimax_mst_trade_backbone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning tree of the symmetrized nation trade graph by
    the MINIMAX-PATH characterization: with strictly distinct edge
    weights (micro-nat cost tie-broken by the canonical key pair), an
    edge belongs to the MST iff its weight equals the minimax path
    weight between its endpoints — no path exists using only cheaper
    edges (the cycle property). The minimax closure is computed by
    max-min matrix squaring, the bottleneck-semiring sibling of
    minplus_diameter_trade: five squarings cover paths of length 32 >
    n-1 = 24, so the closure is exact. The surviving n-1 edges are the
    trade backbone — the cheapest connected skeleton of world trade.

    Determinism: edge costs are frozen micro-nat integers, the
    (w, u, v) tie-break makes weights strictly distinct so the MST is
    unique, and max-min algebra is exact integer arithmetic
    throughout.

    Scale shape: the fact table collapses to a <=n^2 edge relation in
    one aggregate pass; every squaring is a self-join on that <=625-row
    relation, independent of corpus size — log2(n) tiny shuffles
    replace n-1 sequential Kruskal/Prim steps.
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
        .groupBy(F.col("s_nationkey").alias("u"), F.col("c_nationkey").alias("v"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("f")
        )
    )
    tot = flows.agg(F.sum("f").cast("long").alias("tf"))
    edges = flows.crossJoin(F.broadcast(tot)).select(
        "u",
        "v",
        F.round(-F.log(F.col("f").cast("double") / F.col("tf")) * 1000000)
        .cast("long")
        .alias("w"),
    )
    und = (
        edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"), "w"
        )
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
    )
    tb = und.select(
        "u",
        "v",
        "w",
        (F.col("w") * F.lit(1000000) + F.col("u") * F.lit(1000) + F.col("v")).alias(
            "tw"
        ),
    )
    # truncate the fact-join lineage: every squaring below references the
    # edge relation three times, so without this the plan re-expands the
    # lineitem join 3^5 times
    tb = tb.transform(_ckpt)
    m = (
        tb.select("u", "v", "tw")
        .unionAll(tb.select(F.col("v").alias("u"), F.col("u").alias("v"), "tw"))
        .groupBy("u", "v")
        .agg(F.min("tw").alias("tw"))
    )
    for _ in range(5):
        x = m.alias("x")
        y = m.alias("y")
        sq2 = (
            x.join(y, F.col("y.u") == F.col("x.v"))
            .where(F.col("x.u") != F.col("y.v"))
            .groupBy(F.col("x.u").alias("u"), F.col("y.v").alias("v"))
            .agg(F.min(F.greatest(F.col("x.tw"), F.col("y.tw"))).alias("tw"))
        )
        m = (
            m.select("u", "v", "tw")
            .unionAll(sq2)
            .groupBy("u", "v")
            .agg(F.min("tw").alias("tw"))
            .transform(_ckpt)
        )
    t = tb.alias("t")
    mm = m.alias("m")
    return (
        t.join(
            mm,
            (F.col("m.u") == F.col("t.u"))
            & (F.col("m.v") == F.col("t.v"))
            & (F.col("m.tw") == F.col("t.tw")),
        )
        .select(
            F.col("t.u").cast("long").alias("nation_u"),
            F.col("t.v").cast("long").alias("nation_v"),
            F.col("t.w").cast("long").alias("cost_micro_nats"),
        )
    )


@query(
    "trade_reciprocity_asymmetry",
    oracle="""
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
    ), pairs AS (
        SELECT LEAST(u, v) AS nation_u, GREATEST(u, v) AS nation_v,
               CAST(SUM(CASE WHEN u < v THEN f ELSE 0 END) AS BIGINT) AS flow_fwd,
               CAST(SUM(CASE WHEN u > v THEN f ELSE 0 END) AS BIGINT) AS flow_rev
        FROM flows GROUP BY 1, 2
    )
    SELECT CAST(nation_u AS BIGINT) AS nation_u,
           CAST(nation_v AS BIGINT) AS nation_v,
           flow_fwd, flow_rev,
           CAST(ROUND(2000000.0 * LEAST(flow_fwd, flow_rev)
                      / (flow_fwd + flow_rev)) AS BIGINT) AS recip_micro,
           CAST(ROUND(1000000.0 * ABS(flow_fwd - flow_rev)
                      / (flow_fwd + flow_rev)) AS BIGINT) AS asym_micro
    FROM pairs
    """,
)
def trade_reciprocity_asymmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reciprocity and flow asymmetry of the directed nation
    trade graph (Squartini et al., "Reciprocity of weighted networks").
    For each unordered nation pair the reciprocated mass is
    2*min(f_uv, f_vu) / (f_uv + f_vu) — the fraction of pair volume
    that is mutual — and the asymmetry index |f_uv - f_vu| /
    (f_uv + f_vu) is its complement. A pair with recip_micro = 1e6
    trades perfectly symmetrically; asym_micro = 1e6 means one-way
    trade only.

    Determinism: flows are exact BIGINT cent sums; both ratios are
    rounded to integer micro-units on both engines.

    Scale shape: one aggregate pass collapses the fact table to the
    <=n^2 directed edge list, then the pair fold is a single
    least/greatest re-key + hash agg — no self-join of flows against
    itself, so the whole pair table costs one tiny extra shuffle.
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
        .groupBy(F.col("s_nationkey").alias("u"), F.col("c_nationkey").alias("v"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("f")
        )
    )
    pairs = (
        flows.select(
            F.least("u", "v").alias("nation_u"),
            F.greatest("u", "v").alias("nation_v"),
            F.when(F.col("u") < F.col("v"), F.col("f")).otherwise(F.lit(0)).alias("fw"),
            F.when(F.col("u") > F.col("v"), F.col("f")).otherwise(F.lit(0)).alias("rv"),
        )
        .groupBy("nation_u", "nation_v")
        .agg(
            F.sum("fw").cast("long").alias("flow_fwd"),
            F.sum("rv").cast("long").alias("flow_rev"),
        )
    )
    tot = F.col("flow_fwd") + F.col("flow_rev")
    return pairs.select(
        F.col("nation_u").cast("long").alias("nation_u"),
        F.col("nation_v").cast("long").alias("nation_v"),
        "flow_fwd",
        "flow_rev",
        F.round(F.lit(2000000.0) * F.least("flow_fwd", "flow_rev") / tot)
        .cast("long")
        .alias("recip_micro"),
        F.round(F.lit(1000000.0) * F.abs(F.col("flow_fwd") - F.col("flow_rev")) / tot)
        .cast("long")
        .alias("asym_micro"),
    )


@query(
    "kmv_distinct_sketch",
    oracle="""
    WITH dk AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS x FROM orders),
    h AS (SELECT (48271 * ((48271 * x + 12345) % 2147483647) + 12345)
             % 2147483647 AS h FROM dk),
    tk AS (SELECT h FROM h ORDER BY h LIMIT 256),
    s AS (SELECT MAX(h) AS hk, COUNT(*) AS kk FROM tk),
    e AS (SELECT CAST(COUNT(*) AS BIGINT) AS ed FROM dk),
    est AS (
        SELECT ed,
               CAST(CASE WHEN kk < 256 THEN ed
                    ELSE ROUND(255.0 * 2147483647 / hk) END AS BIGINT) AS km
        FROM e, s
    )
    SELECT ed AS exact_distinct, km AS kmv_estimate,
           CAST(ROUND(ABS(km - ed) * 1000000.0 / ed) AS BIGINT) AS rel_err_ppm
    FROM est
    """,
)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch audited against the
    exact answer (Bar-Yossef et al., "Counting distinct elements in a
    data stream"). Each distinct customer key is hashed with the fixed
    LCG map h(x) = (48271x + 12345) mod 2^31-1; with k = 256 retained
    minima the estimator is (k-1) * p / h_(k). The query reports the
    exact distinct count, the sketch estimate, and the relative error
    in ppm — the audit a 100-TB pipeline runs at small scale before
    trusting the sketch at full scale.

    Determinism: the hash is exact integer arithmetic (a*x <= ~1e13,
    well inside BIGINT), the k-th minimum is a pure order statistic,
    and the final division is one IEEE double op rounded to integers
    identically on both engines.

    Scale shape: the k smallest hashes come from a per-partition
    top-k merged on the driver (TakeOrdered, k = 256 rows moved);
    nothing else leaves the executors but two scalar aggregates.
    KMV sketches are unioned by keeping the k smallest of the merged
    minima — this audit is the calibration step for that path.
    """
    p, a, b, k = 2147483647, 48271, 12345, 256
    o = load_table(spark, sf_dir, "orders")
    dk = o.select(F.col("o_custkey").cast("long").alias("x")).distinct()
    h1 = (F.lit(a) * F.col("x") + F.lit(b)) % F.lit(p)
    h = dk.select(((F.lit(a) * h1 + F.lit(b)) % F.lit(p)).alias("h"))
    tk = h.orderBy("h").limit(k)
    s = tk.agg(F.max("h").alias("hk"), F.count("*").alias("kk"))
    e = dk.agg(F.count("*").cast("long").alias("ed"))
    est = (
        e.crossJoin(F.broadcast(s))
        .select(
            "ed",
            F.when(F.col("kk") < k, F.col("ed"))
            .otherwise(F.round(F.lit(float(k - 1)) * p / F.col("hk")))
            .cast("long")
            .alias("km"),
        )
    )
    return est.select(
        F.col("ed").alias("exact_distinct"),
        F.col("km").alias("kmv_estimate"),
        F.round(F.abs(F.col("km") - F.col("ed")) * 1000000.0 / F.col("ed"))
        .cast("long")
        .alias("rel_err_ppm"),
    )


@query(
    "cms_heavy_hitter_audit",
    oracle="""
    WITH keys AS (
        SELECT CAST(l_partkey AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS c
        FROM lineitem GROUP BY 1
    ), params(j, a, b) AS (
        VALUES (0, 48271, 11), (1, 16807, 23), (2, 69621, 101), (3, 40692, 7)
    ), hashed AS (
        SELECT k, c, j, ((a * k + b) % 2147483647) % 512 AS bucket
        FROM keys CROSS JOIN params
    ), sketch AS (
        SELECT j, bucket, CAST(SUM(c) AS BIGINT) AS bc
        FROM hashed GROUP BY 1, 2
    ), est AS (
        SELECT k, c, MIN(bc) AS bc
        FROM hashed JOIN sketch USING (j, bucket) GROUP BY k, c
    )
    SELECT k AS part_key, c AS exact_cnt,
           CAST(bc AS BIGINT) AS cms_est, CAST(bc - c AS BIGINT) AS overcount
    FROM est ORDER BY c DESC, k ASC LIMIT 20
    """,
)
def cms_heavy_hitter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimates audited against exact part
    counts (Cormode & Muthukrishnan). Four fixed LCG hash rows of 512
    buckets each; a key's estimate is the minimum of its four bucket
    sums, which can only overcount (one-sided error). The audit
    reports, for the 20 most frequent parts (count desc, key asc
    tie-break), the exact count, the CMS estimate, and the collision
    overcount — the calibration a streaming heavy-hitter pipeline
    needs before shipping the sketch size.

    Determinism: hashing and bucket sums are exact integer
    arithmetic; MIN over four integers has no float path at all.

    Scale shape: exact per-key counts are one map-side-combined hash
    agg; the sketch is built FROM those counts (mergeable — bucket
    sums of counts equal bucket sums of raw events), so the 4x512
    sketch table is broadcast back for the estimate join and the raw
    fact table is scanned exactly once.
    """
    p, w = 2147483647, 512
    li = load_table(spark, sf_dir, "lineitem")
    keys = li.groupBy(F.col("l_partkey").cast("long").alias("k")).agg(
        F.count("*").cast("long").alias("c")
    )
    params = spark.createDataFrame(
        [(0, 48271, 11), (1, 16807, 23), (2, 69621, 101), (3, 40692, 7)],
        "j int, a long, b long",
    )
    hashed = keys.crossJoin(F.broadcast(params)).select(
        "k",
        "c",
        "j",
        (((F.col("a") * F.col("k") + F.col("b")) % F.lit(p)) % F.lit(w)).alias(
            "bucket"
        ),
    )
    sketch = hashed.groupBy("j", "bucket").agg(F.sum("c").cast("long").alias("bc"))
    est = (
        hashed.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("k", "c")
        .agg(F.min("bc").alias("bc"))
    )
    return (
        est.orderBy(F.desc("c"), F.asc("k"))
        .limit(20)
        .select(
            F.col("k").alias("part_key"),
            F.col("c").alias("exact_cnt"),
            F.col("bc").alias("cms_est"),
            (F.col("bc") - F.col("c")).cast("long").alias("overcount"),
        )
    )


@query(
    "isotonic_urgent_rate_fit",
    oracle="""
    WITH ranked AS (
        SELECT NTILE(40) OVER (ORDER BY o_totalprice, o_orderkey) AS b,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS u
        FROM orders
    ), bux AS (
        SELECT b, CAST(SUM(u) AS BIGINT) AS u, CAST(COUNT(*) AS BIGINT) AS n
        FROM ranked GROUP BY b
    ), pref AS (
        SELECT b,
               CAST(SUM(u) OVER (ORDER BY b) AS BIGINT) AS cu,
               CAST(SUM(n) OVER (ORDER BY b) AS BIGINT) AS cn
        FROM bux
    ), pref0 AS (
        SELECT 0 AS b, CAST(0 AS BIGINT) AS cu, CAST(0 AS BIGINT) AS cn
        UNION ALL SELECT b, cu, cn FROM pref
    ), means AS (
        SELECT lo.b + 1 AS j, hi.b AS k,
               (hi.cu - lo.cu) * 1.0 / (hi.cn - lo.cn) AS m
        FROM pref0 lo JOIN pref hi ON hi.b > lo.b
    ), inner_min AS (
        SELECT ms.j, i.b AS i, MIN(ms.m) AS mn
        FROM means ms JOIN bux i ON ms.j <= i.b AND ms.k >= i.b
        GROUP BY ms.j, i.b
    ), fit AS (
        SELECT i, MAX(mn) AS f FROM inner_min GROUP BY i
    )
    SELECT CAST(bx.b AS BIGINT) AS bucket, bx.n AS n_orders,
           CAST(ROUND(bx.u * 1000000.0 / bx.n) AS BIGINT) AS raw_rate_micro,
           CAST(ROUND(fit.f * 1000000) AS BIGINT) AS iso_fit_micro
    FROM bux bx JOIN fit ON fit.i = bx.b
    """,
)
def isotonic_urgent_rate_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone non-decreasing) least-squares fit of the
    urgent-order rate across 40 total-price rank buckets, computed by
    the closed-form max-min characterization of the PAVA solution:
    fit(i) = max_{j<=i} min_{k>=i} weightedMean(y, j..k). This is the
    calibration map a monotone score->probability calibrator ships
    (the isotonic sibling of Platt scaling) — raw bucket rates wiggle,
    the fit is their closest monotone projection.

    Determinism: bucketing uses NTILE over the total order
    (o_totalprice, o_orderkey); interval means are single IEEE
    divisions of exact integer prefix sums, so min/max agree across
    engines bit-for-bit; outputs rounded to micro.

    Scale shape: one pass collapses orders to 40 (urgent, count)
    bucket rows via NTILE's single sort; the O(B^3) = 64k max-min
    lattice then runs on the tiny bucket relation — joins never touch
    the fact table again. The NTILE runs through the range-bucketed
    distributed rank (``operators/rank.py`` — no single-task sort),
    the same shape any quantile-bucketing step needs.
    """
    from pyspark_movie_recommender_spark.operators.rank import (
        distributed_ntile,
    )

    o = load_table(spark, sf_dir, "orders")
    ranked = distributed_ntile(
        o.select(
            "o_totalprice",
            "o_orderkey",
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("u"),
        ),
        "o_totalprice",
        ["o_orderkey"],
        40,
        out_col="b",
    ).select("b", "u")
    bux = ranked.groupBy("b").agg(
        F.sum("u").cast("long").alias("u"), F.count("*").cast("long").alias("n")
    )
    bux = _ckpt(bux)  # shared fan-out relation
    w = Window.orderBy("b")
    pref = bux.select(
        "b",
        F.sum("u").over(w).cast("long").alias("cu"),
        F.sum("n").over(w).cast("long").alias("cn"),
    )
    pref0 = pref.unionAll(
        pref.limit(1).select(
            F.lit(0).alias("b"),
            F.lit(0).cast("long").alias("cu"),
            F.lit(0).cast("long").alias("cn"),
        )
    )
    lo = pref0.alias("lo")
    hi = pref.alias("hi")
    means = lo.join(hi, F.col("hi.b") > F.col("lo.b")).select(
        (F.col("lo.b") + 1).alias("j"),
        F.col("hi.b").alias("k"),
        (
            (F.col("hi.cu") - F.col("lo.cu"))
            * 1.0
            / (F.col("hi.cn") - F.col("lo.cn"))
        ).alias("m"),
    )
    i_rel = bux.select(F.col("b").alias("i"))
    inner_min = (
        means.join(
            F.broadcast(i_rel),
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("j", "i")
        .agg(F.min("m").alias("mn"))
    )
    fit = inner_min.groupBy("i").agg(F.max("mn").alias("f"))
    fit = _ckpt(fit)  # shared fan-out relation
    return bux.join(fit, bux.b == fit.i).select(
        F.col("b").cast("long").alias("bucket"),
        F.col("n").alias("n_orders"),
        F.round(F.col("u") * 1000000.0 / F.col("n")).cast("long").alias(
            "raw_rate_micro"
        ),
        F.round(F.col("f") * 1000000).cast("long").alias("iso_fit_micro"),
    )


@query(
    "nw_kernel_price_curve",
    oracle="""
    WITH byq AS (
        SELECT CAST(l_quantity AS BIGINT) AS q,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS sc
        FROM lineitem GROUP BY 1
    ), grid AS (SELECT UNNEST(generate_series(1, 50)) AS g
    ), wts AS (
        SELECT grid.g, byq.q, byq.n, byq.sc,
               exp(-((byq.q - grid.g) * (byq.q - grid.g)) / (2.0 * 2.5 * 2.5))
                   AS w
        FROM grid CROSS JOIN byq
    )
    SELECT CAST(g AS BIGINT) AS qty_grid,
           CAST(ROUND(SUM(w * sc) / SUM(w * n) / 100.0, 2) * 100 AS BIGINT)
               AS nw_price_cents
    FROM wts GROUP BY g
    """,
)
def nw_kernel_price_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nadaraya-Watson Gaussian-kernel regression of extended price on
    quantity, evaluated on the integer grid 1..50 with bandwidth 2.5:
    yhat(g) = sum_q K((q-g)/h) * priceSum_q / sum_q K((q-g)/h) *
    count_q. The smooth curve is the nonparametric sibling of the
    isotonic fit — no shape constraint, locality instead.

    Determinism: the fact table is first collapsed to exact integer
    (count, cent-sum) per distinct quantity, so the kernel stage
    evaluates exp() on the same ~50 inputs in both engines; the final
    ratio is rounded to cents, orders of magnitude above any ulp or
    summation-order noise on the 50-term sums.

    Scale shape: one map-side-combined agg reduces the corpus to
    <=50 rows; the grid cross join (50x50) and the weighted sums are
    driver-trivial. Adding grid points or shrinking the bandwidth
    never re-touches the fact table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    byq = li.groupBy(F.col("l_quantity").cast("long").alias("q")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("sc"),
    )
    grid = spark.range(1, 51).select(F.col("id").alias("g"))
    wts = F.broadcast(grid).crossJoin(byq).select(
        "g",
        "n",
        "sc",
        F.exp(
            -((F.col("q") - F.col("g")) * (F.col("q") - F.col("g")))
            / F.lit(2.0 * 2.5 * 2.5)
        ).alias("w"),
    )
    return wts.groupBy("g").agg(
        (
            F.round(
                F.sum(F.col("w") * F.col("sc")) / F.sum(F.col("w") * F.col("n")) / 100.0,
                2,
            )
            * 100
        )
        .cast("long")
        .alias("nw_price_cents")
    ).select(F.col("g").cast("long").alias("qty_grid"), "nw_price_cents")


@query(
    "spectral_entropy_daily",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS d, CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY 1
    ), idx AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t, c
        FROM daily
    ), nn AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
        FROM idx
    ), z AS (
        SELECT t, nn.n * c - nn.s AS z, nn.n AS n FROM idx, nn
    ), ks AS (SELECT UNNEST(generate_series(1, 32)) AS k
    ), terms AS (
        SELECT ks.k,
               SUM(z * cos(2 * pi() * ks.k * t / n)) AS cs,
               SUM(z * sin(2 * pi() * ks.k * t / n)) AS sn
        FROM z CROSS JOIN ks GROUP BY ks.k
    ), pw AS (SELECT k, cs * cs + sn * sn AS p FROM terms
    ), tot AS (SELECT SUM(p) AS tp FROM pw
    ), top AS (SELECT k, p FROM pw ORDER BY p DESC, k ASC LIMIT 1
    ), ent AS (
        SELECT -SUM(CASE WHEN p > 0 THEN (p / tp) * ln(p / tp) END)
               / ln(32.0) AS h
        FROM pw, tot
    )
    SELECT nn.n AS n_days, CAST(top.k AS BIGINT) AS k_top,
           CAST(ROUND(top.p * 1000000.0 / tot.tp) AS BIGINT) AS top_share_ppm,
           CAST(ROUND(ent.h * 1000000) AS BIGINT) AS spec_entropy_micro
    FROM nn, top, tot, ent
    """,
)
def spectral_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral entropy of the daily order-count series: Shannon
    entropy of the normalized harmonic power spectrum (k = 1..32
    cycles over the full span), divided by ln(32). Near 0 the series
    is dominated by one cycle (highly forecastable); near 1 the
    spectrum is flat (white noise). The frequency-domain
    forecastability score beside `dominant_period_scan` (which finds
    the peak) and `goertzel_periodogram_daily` (which probes one
    period) — this summarizes the WHOLE spectrum in one number, the
    feature the M4-competition FFORMA meta-learner uses.

    Determinism: the series is the exact-integer deviation vector
    n*x_t - sum(x) (exact in doubles far below 2^53); trig/power
    sums agree across engines to ~1e-11 relative, micro-rounded
    outputs and the top-k argmax (spectral peaks separated by far
    more) are unaffected.

    Scale shape: one date-keyed partial agg collapses the corpus to a
    ~2.4k-day series; the 32-harmonic cross join and all sums run on
    that tiny relation — one fact shuffle total.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("d")).cast("long").alias("t"), "c"
    )
    nn = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
    )
    nn = _ckpt(nn)  # shared fan-out relation
    z = idx.crossJoin(F.broadcast(nn)).select(
        "t", (F.col("n") * F.col("c") - F.col("s")).alias("z"), "n"
    )
    ks = spark.range(1, 33).select(F.col("id").alias("k"))
    theta = 2 * 3.141592653589793 * F.col("k") * F.col("t") / F.col("n")
    terms = (
        z.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(F.col("z") * F.cos(theta)).alias("cs"),
            F.sum(F.col("z") * F.sin(theta)).alias("sn"),
        )
    )
    pw = terms.select("k", (F.col("cs") * F.col("cs") + F.col("sn") * F.col("sn")).alias("p"))
    tot = pw.agg(F.sum("p").alias("tp"))
    tot = _ckpt(tot)  # shared fan-out relation
    top = pw.orderBy(F.desc("p"), F.asc("k")).limit(1)
    ent = pw.crossJoin(F.broadcast(tot)).agg(
        (
            -F.sum(
                F.when(
                    F.col("p") > 0,
                    (F.col("p") / F.col("tp")) * F.log(F.col("p") / F.col("tp")),
                )
            )
            / F.log(F.lit(32.0))
        ).alias("h")
    )
    return (
        nn.crossJoin(F.broadcast(top))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ent))
        .select(
            F.col("n").alias("n_days"),
            F.col("k").cast("long").alias("k_top"),
            F.round(F.col("p") * 1000000.0 / F.col("tp")).cast("long").alias(
                "top_share_ppm"
            ),
            F.round(F.col("h") * 1000000).cast("long").alias("spec_entropy_micro"),
        )
    )


@query(
    "permutation_entropy_daily",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS d, CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY 1
    ), seq AS (
        SELECT c AS a,
               LEAD(c, 1) OVER (ORDER BY d) AS b,
               LEAD(c, 2) OVER (ORDER BY d) AS e
        FROM daily
    ), pat AS (
        SELECT CASE
            WHEN b >= a AND e >= b THEN 0
            WHEN b >= a AND e < b AND e >= a THEN 1
            WHEN b >= a AND e < a THEN 2
            WHEN b < a AND e >= a THEN 3
            WHEN b < a AND e >= b THEN 4
            ELSE 5 END AS p
        FROM seq WHERE e IS NOT NULL
    ), cnts AS (
        SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM pat GROUP BY p
    ), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM cnts
    ), top AS (SELECT p, n FROM cnts ORDER BY n DESC, p ASC LIMIT 1
    ), ent AS (
        SELECT -SUM((n * 1.0 / nt) * ln(n * 1.0 / nt)) / ln(6.0) AS h
        FROM cnts, tot
    )
    SELECT tot.nt AS n_triples, CAST(top.p AS BIGINT) AS top_pattern,
           CAST(ROUND(top.n * 1000000.0 / tot.nt) AS BIGINT) AS top_share_ppm,
           CAST(ROUND(ent.h * 1000000) AS BIGINT) AS perm_entropy_micro
    FROM tot, top, ent
    """,
)
def permutation_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bandt-Pompe permutation entropy (order 3) of the daily
    order-count series: every consecutive day triple is reduced to its
    ordinal pattern (6 possible rank orders, ties broken
    later-index-wins), and the entropy of the pattern distribution,
    normalized by ln(6), scores time-domain complexity. A monotone or
    strictly periodic series concentrates on few patterns (entropy
    near 0); i.i.d. noise uses all six equally (near 1). The ordinal
    complement of `spectral_entropy_daily` — robust to any monotone
    transformation of the values, which no spectral measure is.

    Determinism: patterns come from integer comparisons with an
    explicit tie rule; counts are exact; the only float math is the
    6-term entropy sum, micro-rounded.

    Scale shape: one date-keyed partial agg to the daily series, two
    LEADs in a single window pass over the tiny series, one 6-row
    hash agg — fact table scanned once.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.orderBy("d")
    seq = daily.select(
        F.col("c").alias("a"),
        F.lead("c", 1).over(w).alias("b"),
        F.lead("c", 2).over(w).alias("e"),
    ).where(F.col("e").isNotNull())
    a, b, e = F.col("a"), F.col("b"), F.col("e")
    pat = seq.select(
        F.when((b >= a) & (e >= b), 0)
        .when((b >= a) & (e < b) & (e >= a), 1)
        .when((b >= a) & (e < a), 2)
        .when((b < a) & (e >= a), 3)
        .when((b < a) & (e >= b), 4)
        .otherwise(5)
        .alias("p")
    )
    cnts = pat.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("n"))
    cnts = _ckpt(cnts)  # shared fan-out relation
    tot = cnts.agg(F.sum("n").cast("long").alias("nt"))
    tot = _ckpt(tot)  # shared fan-out relation
    top = cnts.orderBy(F.desc("n"), F.asc("p")).limit(1)
    ent = cnts.crossJoin(F.broadcast(tot)).agg(
        (
            -F.sum(
                (F.col("n") * 1.0 / F.col("nt"))
                * F.log(F.col("n") * 1.0 / F.col("nt"))
            )
            / F.log(F.lit(6.0))
        ).alias("h")
    )
    return (
        tot.crossJoin(F.broadcast(top))
        .crossJoin(F.broadcast(ent))
        .select(
            F.col("nt").alias("n_triples"),
            F.col("p").cast("long").alias("top_pattern"),
            F.round(F.col("n") * 1000000.0 / F.col("nt")).cast("long").alias(
                "top_share_ppm"
            ),
            F.round(F.col("h") * 1000000).cast("long").alias("perm_entropy_micro"),
        )
    )


_STRATA_CELLS_SQL = """
    WITH t AS (
        SELECT c.c_nationkey AS nk,
               CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS x,
               CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), cells AS (
        SELECT nk,
               CAST(SUM(x * y) AS BIGINT) AS a,
               CAST(SUM(x * (1 - y)) AS BIGINT) AS b,
               CAST(SUM((1 - x) * y) AS BIGINT) AS c,
               CAST(SUM((1 - x) * (1 - y)) AS BIGINT) AS d
        FROM t GROUP BY nk
    )
"""


@query(
    "cmh_pooled_odds_ratio",
    oracle=_STRATA_CELLS_SQL
    + """
    , s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               SUM(a * 1.0 * d / (a + b + c + d)) AS num,
               SUM(b * 1.0 * c / (a + b + c + d)) AS den,
               SUM(a) AS sa,
               SUM((a + b) * 1.0 * (a + c) / (a + b + c + d)) AS se,
               SUM((a + b) * 1.0 * (c + d) * (a + c) * (b + d)
                   / ((a + b + c + d) * 1.0 * (a + b + c + d)
                      * (a + b + c + d - 1))) AS sv
        FROM cells
    )
    SELECT k AS n_strata,
           CAST(ROUND(num / den * 1000000) AS BIGINT) AS mh_or_micro,
           CAST(ROUND((sa - se) * (sa - se) / sv * 1000000) AS BIGINT)
               AS cmh_chi2_micro
    FROM s
    """,
)
def cmh_pooled_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel analysis of the urgent-priority ->
    finished-status association stratified by customer nation: each
    nation contributes a 2x2 table (exposure = 1-URGENT priority,
    outcome = orderstatus 'F'), the Mantel-Haenszel estimator pools
    the odds ratio sum(a_i d_i / n_i) / sum(b_i c_i / n_i), and the
    CMH chi-square (no continuity correction) tests conditional
    association free of the nation confounder — the stratified sibling
    of `cramers_v_priority_status`, which would conflate strata.

    Determinism: cell counts are exact integers; per-stratum terms
    promote to double BEFORE multiplying (margin products overflow
    BIGINT at large scale factors by design); 25-term double sums are
    micro-rounded.

    Scale shape: one broadcast customer join + one (nation, x, y)
    hash agg collapse the fact table to <= 25 2x2 tables; everything
    after is driver-trivial scalar math.
    """
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    t = o.join(
        F.broadcast(cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")),
        "o_custkey",
    ).select(
        F.col("c_nationkey").alias("nk"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("x"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    cells = t.groupBy("nk").agg(
        F.sum(F.col("x") * F.col("y")).cast("long").alias("a"),
        F.sum(F.col("x") * (1 - F.col("y"))).cast("long").alias("b"),
        F.sum((1 - F.col("x")) * F.col("y")).cast("long").alias("c"),
        F.sum((1 - F.col("x")) * (1 - F.col("y"))).cast("long").alias("d"),
    )
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    s = cells.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("a") * 1.0 * F.col("d") / n).alias("num"),
        F.sum(F.col("b") * 1.0 * F.col("c") / n).alias("den"),
        F.sum("a").alias("sa"),
        F.sum((F.col("a") + F.col("b")) * 1.0 * (F.col("a") + F.col("c")) / n).alias(
            "se"
        ),
        F.sum(
            (F.col("a") + F.col("b"))
            * 1.0
            * (F.col("c") + F.col("d"))
            * (F.col("a") + F.col("c"))
            * (F.col("b") + F.col("d"))
            / (n * 1.0 * n * (n - 1))
        ).alias("sv"),
    )
    return s.select(
        F.col("k").alias("n_strata"),
        F.round(F.col("num") / F.col("den") * 1000000).cast("long").alias(
            "mh_or_micro"
        ),
        F.round(
            (F.col("sa") - F.col("se"))
            * (F.col("sa") - F.col("se"))
            / F.col("sv")
            * 1000000
        )
        .cast("long")
        .alias("cmh_chi2_micro"),
    )


@query(
    "woolf_or_homogeneity",
    oracle=_STRATA_CELLS_SQL
    + """
    , lo AS (
        SELECT nk,
               ln(((a + 0.5) * (d + 0.5)) / ((b + 0.5) * (c + 0.5))) AS l,
               1.0 / (1.0 / (a + 0.5) + 1.0 / (b + 0.5)
                      + 1.0 / (c + 0.5) + 1.0 / (d + 0.5)) AS w
        FROM cells
    ), p AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(w * l) / SUM(w) AS lp
        FROM lo
    ), q AS (
        SELECT SUM(w * (l - p.lp) * (l - p.lp)) AS chi FROM lo, p
    )
    SELECT p.k AS n_strata, CAST(p.k - 1 AS BIGINT) AS df,
           CAST(ROUND(p.lp * 1000000) AS BIGINT) AS pooled_lnor_micro,
           CAST(ROUND(q.chi * 1000000) AS BIGINT) AS woolf_chi2_micro
    FROM p, q
    """,
)
def woolf_or_homogeneity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Woolf test of odds-ratio homogeneity across nation strata: each
    nation's Haldane-Anscombe-corrected (+0.5 per cell) log odds
    ratio is weighted by its inverse variance w = 1/(sum of reciprocal
    cells); the chi-square sum(w * (lnOR_i - lnOR_pooled)^2) on k-1 df
    asks whether one pooled OR (the `cmh_pooled_odds_ratio` headline)
    is even a coherent summary, or whether the association flips
    across geographies — the effect-modification check that must
    accompany any pooled estimate.

    Determinism: cells are exact integers, the correction makes every
    log/reciprocal finite, and the 25-term weighted sums are
    micro-rounded far above ulp noise.

    Scale shape: identical to the CMH query — one broadcast join, one
    hash agg to 25 rows, scalar math after.
    """
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    t = o.join(
        F.broadcast(cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")),
        "o_custkey",
    ).select(
        F.col("c_nationkey").alias("nk"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("x"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    cells = t.groupBy("nk").agg(
        F.sum(F.col("x") * F.col("y")).cast("long").alias("a"),
        F.sum(F.col("x") * (1 - F.col("y"))).cast("long").alias("b"),
        F.sum((1 - F.col("x")) * F.col("y")).cast("long").alias("c"),
        F.sum((1 - F.col("x")) * (1 - F.col("y"))).cast("long").alias("d"),
    )
    ah, bh, ch, dh = (
        F.col("a") + 0.5,
        F.col("b") + 0.5,
        F.col("c") + 0.5,
        F.col("d") + 0.5,
    )
    lo = cells.select(
        "nk",
        F.log((ah * dh) / (bh * ch)).alias("l"),
        (1.0 / (1.0 / ah + 1.0 / bh + 1.0 / ch + 1.0 / dh)).alias("w"),
    )
    p = lo.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        (F.sum(F.col("w") * F.col("l")) / F.sum("w")).alias("lp"),
    )
    q = lo.crossJoin(F.broadcast(p)).agg(
        F.sum(
            F.col("w") * (F.col("l") - F.col("lp")) * (F.col("l") - F.col("lp"))
        ).alias("chi")
    )
    return p.crossJoin(F.broadcast(q)).select(
        F.col("k").alias("n_strata"),
        (F.col("k") - 1).cast("long").alias("df"),
        F.round(F.col("lp") * 1000000).cast("long").alias("pooled_lnor_micro"),
        F.round(F.col("chi") * 1000000).cast("long").alias("woolf_chi2_micro"),
    )


_NATION_METRIC_RANKS_SQL = """
    WITH rev AS (
        SELECT c.c_nationkey AS nk,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1
    ), cus AS (
        SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS ccnt,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS cbal
        FROM customer GROUP BY 1
    ), sup AS (
        SELECT s_nationkey AS nk,
               CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS sbal
        FROM supplier GROUP BY 1
    ), base AS (
        SELECT n.n_nationkey AS nk,
               COALESCE(rev.cents, 0) AS m1, COALESCE(rev.cnt, 0) AS m2,
               CASE WHEN COALESCE(rev.cnt, 0) = 0 THEN 0.0
                    ELSE rev.cents * 1.0 / rev.cnt END AS m3,
               COALESCE(cus.ccnt, 0) AS m4, COALESCE(cus.cbal, 0) AS m5,
               COALESCE(sup.sbal, 0) AS m6
        FROM nation n
        LEFT JOIN rev ON rev.nk = n.n_nationkey
        LEFT JOIN cus ON cus.nk = n.n_nationkey
        LEFT JOIN sup ON sup.nk = n.n_nationkey
    ), lng AS (
        SELECT nk, 1 AS m, m1 * 1.0 AS v FROM base UNION ALL
        SELECT nk, 2, m2 * 1.0 FROM base UNION ALL
        SELECT nk, 3, m3 FROM base UNION ALL
        SELECT nk, 4, m4 * 1.0 FROM base UNION ALL
        SELECT nk, 5, m5 * 1.0 FROM base UNION ALL
        SELECT nk, 6, m6 * 1.0 FROM base
    ), rk AS (
        SELECT m, nk,
               CAST(ROW_NUMBER() OVER (PARTITION BY m ORDER BY v DESC, nk ASC)
                    AS BIGINT) AS r
        FROM lng
    )
"""


def _nation_metric_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form (metric, nation, rank) ballots: six exact-integer (or
    single-division) nation metrics, each ranked desc with nationkey
    tie-break. Shared by the Borda and Copeland/Condorcet queries."""
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(
            F.broadcast(
                cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
    )
    cus = cst.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).cast("long").alias("ccnt"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
        .cast("long")
        .alias("cbal"),
    )
    sp = sup.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.sum(F.round(F.col("s_acctbal") * 100).cast("long"))
        .cast("long")
        .alias("sbal")
    )
    base = (
        nat.select(F.col("n_nationkey").alias("nk"))
        .join(rev, "nk", "left")
        .join(cus, "nk", "left")
        .join(sp, "nk", "left")
        .select(
            "nk",
            F.coalesce("cents", F.lit(0)).alias("m1"),
            F.coalesce("cnt", F.lit(0)).alias("m2"),
            F.when(F.coalesce("cnt", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(F.col("cents") * 1.0 / F.col("cnt"))
            .alias("m3"),
            F.coalesce("ccnt", F.lit(0)).alias("m4"),
            F.coalesce("cbal", F.lit(0)).alias("m5"),
            F.coalesce("sbal", F.lit(0)).alias("m6"),
        )
    )
    # 25 rows feeding six union branches (then self-joined by the
    # Copeland caller): materialize so the three-table agg runs once
    base = _ckpt(base)
    lng = None
    for i in range(1, 7):
        part = base.select(
            "nk", F.lit(i).alias("m"), (F.col(f"m{i}") * 1.0).alias("v")
        )
        lng = part if lng is None else lng.unionAll(part)
    return _ckpt(
        lng.select(
            "m",
            "nk",
            F.row_number()
            .over(Window.partitionBy("m").orderBy(F.desc("v"), F.asc("nk")))
            .cast("long")
            .alias("r"),
        )
    )


@query(
    "borda_nation_ranking",
    oracle=_NATION_METRIC_RANKS_SQL
    + """
    SELECT CAST(nk AS BIGINT) AS nation_key,
           CAST(SUM(25 - r) AS BIGINT) AS borda_score,
           CAST(ROW_NUMBER() OVER (ORDER BY SUM(25 - r) DESC, nk ASC) AS BIGINT)
               AS borda_rank
    FROM rk GROUP BY nk
    """,
)
def borda_nation_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borda-count consensus ranking of the 25 nations across six
    independent metric 'ballots' (revenue, order count, mean ticket,
    customer count, customer balance, supplier balance): each ballot
    awards 25 - rank points, and the totals aggregate incomparable
    metrics into one consensus order — the rank-aggregation method
    that, unlike averaging raw values, is scale-free per metric.

    Determinism: every ballot value is an exact integer or a single
    IEEE division of exact integers, ranked with a nationkey
    tie-break; scores and final ranks are pure integer math.

    Scale shape: three fact-side hash aggs (orders / customer /
    supplier) collapse everything to 25-row relations; ballots,
    ranking windows, and scoring all run on <=150 rows.
    """
    rk = _nation_metric_ranks(spark, sf_dir)
    score = rk.groupBy("nk").agg(F.sum(25 - F.col("r")).cast("long").alias("borda_score"))
    return score.select(
        F.col("nk").cast("long").alias("nation_key"),
        "borda_score",
        F.row_number()
        .over(Window.orderBy(F.desc("borda_score"), F.asc("nk")))
        .cast("long")
        .alias("borda_rank"),
    )


@query(
    "copeland_condorcet_nations",
    oracle=_NATION_METRIC_RANKS_SQL
    + """
    , duel AS (
        SELECT a.nk AS na, b.nk AS nb,
               CAST(SUM(CASE WHEN a.r < b.r THEN 1 ELSE 0 END) AS BIGINT) AS w
        FROM rk a JOIN rk b ON a.m = b.m AND a.nk <> b.nk
        GROUP BY 1, 2
    ), agg AS (
        SELECT na AS nk,
               CAST(SUM(CASE WHEN w * 2 > 6 THEN 1 ELSE 0 END) AS BIGINT) AS beats,
               CAST(SUM(CASE WHEN w * 2 < 6 THEN 1 ELSE 0 END) AS BIGINT) AS beaten
        FROM duel GROUP BY 1
    )
    SELECT CAST(nk AS BIGINT) AS nation_key, beats, beaten,
           CAST(beats - beaten AS BIGINT) AS copeland,
           CAST(CASE WHEN beats = 24 THEN 1 ELSE 0 END AS BIGINT)
               AS is_condorcet_winner
    FROM agg
    """,
)
def copeland_condorcet_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Condorcet pairwise tournament and Copeland scores over the same
    six metric ballots as `borda_nation_ranking`: nation A beats B if
    A outranks B on a strict majority of metrics (3-3 splits are
    draws). The Copeland score (beats - beaten) and the Condorcet
    winner flag (beats all 24 rivals) answer the question Borda
    cannot — whether a head-to-head champion exists, since Borda can
    crown a nation that loses most direct duels.

    Determinism: ranks are exact with nationkey tie-breaks, duels are
    integer majority counts, draws are an explicit documented rule.

    Scale shape: the duel matrix is a self-join of the 150-row ballot
    relation (25 nations x 6 metrics) — fact tables are touched only
    by the three initial hash aggs.
    """
    rk = _nation_metric_ranks(spark, sf_dir)
    a = rk.alias("a")
    b = rk.alias("b")
    duel = (
        a.join(
            b,
            (F.col("a.m") == F.col("b.m")) & (F.col("a.nk") != F.col("b.nk")),
        )
        .groupBy(F.col("a.nk").alias("na"), F.col("b.nk").alias("nb"))
        .agg(
            F.sum(F.when(F.col("a.r") < F.col("b.r"), 1).otherwise(0))
            .cast("long")
            .alias("w")
        )
    )
    agg = duel.groupBy(F.col("na").alias("nk")).agg(
        F.sum(F.when(F.col("w") * 2 > 6, 1).otherwise(0)).cast("long").alias("beats"),
        F.sum(F.when(F.col("w") * 2 < 6, 1).otherwise(0)).cast("long").alias("beaten"),
    )
    return agg.select(
        F.col("nk").cast("long").alias("nation_key"),
        "beats",
        "beaten",
        (F.col("beats") - F.col("beaten")).cast("long").alias("copeland"),
        F.when(F.col("beats") == 24, 1).otherwise(0).cast("long").alias(
            "is_condorcet_winner"
        ),
    )


@query(
    "allen_interval_census",
    oracle="""
    WITH iv AS (
        SELECT o.o_orderkey AS k, o.o_custkey AS ck,
               o.o_orderdate AS s, MAX(l.l_shipdate) AS e
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2, 3
    ), pairs AS (
        SELECT a.s AS s1, a.e AS e1, b.s AS s2, b.e AS e2
        FROM iv a JOIN iv b ON a.ck = b.ck AND a.k < b.k
    ), rel AS (
        SELECT CASE
            WHEN s1 = s2 AND e1 = e2 THEN 'equals'
            WHEN e1 < s2 THEN 'precedes'
            WHEN e1 = s2 THEN 'meets'
            WHEN e2 < s1 THEN 'preceded_by'
            WHEN e2 = s1 THEN 'met_by'
            WHEN s1 < s2 AND s2 < e1 AND e1 < e2 THEN 'overlaps'
            WHEN s2 < s1 AND s1 < e2 AND e2 < e1 THEN 'overlapped_by'
            WHEN s1 = s2 AND e1 < e2 THEN 'starts'
            WHEN s1 = s2 AND e2 < e1 THEN 'started_by'
            WHEN s2 < s1 AND e1 = e2 THEN 'finishes'
            WHEN s1 < s2 AND e1 = e2 THEN 'finished_by'
            WHEN s2 < s1 AND e1 < e2 THEN 'during'
            WHEN s1 < s2 AND e2 < e1 THEN 'contains'
            ELSE 'other' END AS rel
        FROM pairs
    ), cnts AS (
        SELECT rel, CAST(COUNT(*) AS BIGINT) AS cnt FROM rel GROUP BY rel
    ), tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM cnts)
    SELECT rel AS relation, cnt,
           CAST(ROUND(cnt * 1000000.0 / tot.t) AS BIGINT) AS share_ppm
    FROM cnts, tot
    """,
)
def allen_interval_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Census of Allen's 13 interval-algebra relations over pairs of
    same-customer order fulfillment intervals [orderdate, last
    shipdate]: for every pair (earlier orderkey = A, later = B) the
    pair is classified as exactly one of equals / precedes / meets /
    overlaps / starts / during / finishes (+ inverses). The relation
    mix is the temporal-topology profile of a customer's order
    pipeline — how often fulfillment windows nest, chain, or collide —
    the qualitative complement of `interval_join_view_purchase` and
    `interval_coverage_user`, which only measure overlap quantity.

    Determinism: all comparisons are exact DATE comparisons; the CASE
    ladder is evaluated in the same fixed order in both dialects, so
    degenerate point intervals (orderdate = last shipdate) classify
    identically by the documented meets-before-starts precedence.

    Scale shape: one order-keyed agg builds the interval per order;
    the pair join is customer-blocked (C(orders-per-customer, 2) per
    key, bounded ~40) so candidates grow linearly with customers, the
    same blocking-bounded-pairs shape as `levenshtein_neardup`.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    iv = (
        o.join(
            li.select(F.col("l_orderkey").alias("o_orderkey"), "l_shipdate"),
            "o_orderkey",
        )
        .groupBy(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_orderdate").alias("s"),
        )
        .agg(F.max("l_shipdate").alias("e"))
    )
    iv = _ckpt(iv)  # shared fan-out relation
    a = iv.alias("a")
    b = iv.alias("b")
    pairs = a.join(
        b, (F.col("a.ck") == F.col("b.ck")) & (F.col("a.k") < F.col("b.k"))
    ).select(
        F.col("a.s").alias("s1"),
        F.col("a.e").alias("e1"),
        F.col("b.s").alias("s2"),
        F.col("b.e").alias("e2"),
    )
    s1, e1, s2, e2 = F.col("s1"), F.col("e1"), F.col("s2"), F.col("e2")
    rel = pairs.select(
        F.when((s1 == s2) & (e1 == e2), "equals")
        .when(e1 < s2, "precedes")
        .when(e1 == s2, "meets")
        .when(e2 < s1, "preceded_by")
        .when(e2 == s1, "met_by")
        .when((s1 < s2) & (s2 < e1) & (e1 < e2), "overlaps")
        .when((s2 < s1) & (s1 < e2) & (e2 < e1), "overlapped_by")
        .when((s1 == s2) & (e1 < e2), "starts")
        .when((s1 == s2) & (e2 < e1), "started_by")
        .when((s2 < s1) & (e1 == e2), "finishes")
        .when((s1 < s2) & (e1 == e2), "finished_by")
        .when((s2 < s1) & (e1 < e2), "during")
        .when((s1 < s2) & (e2 < e1), "contains")
        .otherwise("other")
        .alias("relation")
    )
    cnts = rel.groupBy("relation").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    cnts = _ckpt(cnts)  # shared fan-out relation
    tot = cnts.agg(F.sum("cnt").cast("long").alias("t"))
    return cnts.crossJoin(F.broadcast(tot)).select(
        "relation",
        "cnt",
        F.round(F.col("cnt") * 1000000.0 / F.col("t")).cast("long").alias("share_ppm"),
    )


@query(
    "debruijn_eulerian_audit",
    oracle="""
    WITH toks AS (
        SELECT source,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(lower(trim(text)), '\\s+') END AS t
        FROM documents
    ), bi AS (
        SELECT source, t[i] AS u, t[i + 1] AS v
        FROM (SELECT source, t,
                     unnest(generate_series(1, len(t) - 1)) AS i
              FROM toks)
    ), outs AS (
        SELECT source, u AS node, CAST(COUNT(*) AS BIGINT) AS deg_out
        FROM bi GROUP BY 1, 2
    ), ins AS (
        SELECT source, v AS node, CAST(COUNT(*) AS BIGINT) AS deg_in
        FROM bi GROUP BY 1, 2
    ), deg AS (
        SELECT COALESCE(o.source, i.source) AS source,
               COALESCE(o.node, i.node) AS node,
               COALESCE(o.deg_out, 0) AS dout, COALESCE(i.deg_in, 0) AS din
        FROM outs o FULL OUTER JOIN ins i
          ON o.source = i.source AND o.node = i.node
    ), ed AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_edge_instances,
               CAST(COUNT(DISTINCT u || CHR(1) || v) AS BIGINT) AS n_distinct_edges
        FROM bi GROUP BY 1
    ), nd AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(CASE WHEN dout = din THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_balanced,
               CAST(SUM(CASE WHEN dout - din = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_plus,
               CAST(SUM(CASE WHEN din - dout = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_minus,
               CAST(SUM(CASE WHEN ABS(dout - din) > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_other
        FROM deg GROUP BY 1
    )
    SELECT nd.source, nd.n_nodes, ed.n_edge_instances, ed.n_distinct_edges,
           nd.n_balanced, nd.n_plus, nd.n_minus, nd.n_other,
           CAST(CASE WHEN nd.n_plus <= 1 AND nd.n_minus <= 1 AND nd.n_other = 0
                THEN 1 ELSE 0 END AS BIGINT) AS degree_condition_ok
    FROM nd JOIN ed ON ed.source = nd.source
    """,
)
def debruijn_eulerian_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """De Bruijn transition-graph audit per document source: nodes are
    tokens, directed edge instances are consecutive token pairs (the
    order-2 de Bruijn graph genome assemblers build over k-mers). For
    each source the query reports node/edge counts and the in/out
    degree-balance census — an Eulerian path through all transitions
    (a single walk replaying every bigram) requires at most one
    surplus-out node, at most one surplus-in node, and everything else
    balanced; `degree_condition_ok` flags that necessary condition
    (connectivity, the other half, is `dedup_components` territory).

    Determinism: pure integer degree arithmetic on the exact
    whitespace tokenization used corpus-wide; the distinct-edge count
    keys on a CHR(1) separator that whitespace tokens cannot contain.

    Scale shape: bigrams are a map-side array zip (no shuffle until
    the (source, token) hash agg, which map-side combines —
    token-degree keyspace is tiny vs occurrences); the full outer
    degree join runs on the already-collapsed per-node relation.
    """
    from pyspark_movie_recommender_spark.functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", ws_tokens(F.lower(F.col("text"))).alias("t")
    ).where(F.size("t") >= 2)
    bi = toks.select(
        "source",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("t"), 1, F.size("t") - 1).alias("u"),
                F.slice(F.col("t"), 2, F.size("t") - 1).alias("v"),
            )
        ).alias("z"),
    ).select("source", F.col("z.u").alias("u"), F.col("z.v").alias("v"))
    outs = bi.groupBy("source", F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("dout")
    )
    ins = bi.groupBy("source", F.col("v").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("din")
    )
    deg = (
        outs.join(ins, ["source", "node"], "full_outer")
        .select(
            "source",
            F.coalesce("dout", F.lit(0)).alias("dout"),
            F.coalesce("din", F.lit(0)).alias("din"),
        )
    )
    ed = bi.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_edge_instances"),
        F.countDistinct(F.concat_ws("\x01", "u", "v"))
        .cast("long")
        .alias("n_distinct_edges"),
    )
    nd = deg.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.when(F.col("dout") == F.col("din"), 1).otherwise(0))
        .cast("long")
        .alias("n_balanced"),
        F.sum(F.when(F.col("dout") - F.col("din") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_plus"),
        F.sum(F.when(F.col("din") - F.col("dout") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_minus"),
        F.sum(F.when(F.abs(F.col("dout") - F.col("din")) > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_other"),
    )
    return nd.join(ed, "source").select(
        "source",
        "n_nodes",
        "n_edge_instances",
        "n_distinct_edges",
        "n_balanced",
        "n_plus",
        "n_minus",
        "n_other",
        F.when(
            (F.col("n_plus") <= 1) & (F.col("n_minus") <= 1) & (F.col("n_other") == 0),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("degree_condition_ok"),
    )


@query(
    "edd_wspt_schedule_audit",
    oracle="""
    WITH jobs AS (
        SELECT l.l_suppkey AS sk, l.l_orderkey AS ok, l.l_linenumber AS ln,
               CAST(l.l_quantity AS BIGINT) AS p,
               CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS w,
               CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) AS d
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), edd AS (
        SELECT sk, d, w,
               SUM(p) OVER (PARTITION BY sk ORDER BY d, ok, ln
                            ROWS UNBOUNDED PRECEDING) AS c
        FROM jobs
    ), wspt AS (
        SELECT sk, d, w,
               SUM(p) OVER (PARTITION BY sk ORDER BY p * 1.0 / w, ok, ln
                            ROWS UNBOUNDED PRECEDING) AS c
        FROM jobs
    ), e AS (
        SELECT sk, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MAX(c - d) AS BIGINT) AS lmax,
               CAST(SUM(w * c) AS BIGINT) AS twc
        FROM edd GROUP BY sk
    ), ws AS (
        SELECT sk, CAST(MAX(c - d) AS BIGINT) AS lmax,
               CAST(SUM(w * c) AS BIGINT) AS twc
        FROM wspt GROUP BY sk
    )
    SELECT CAST(e.sk AS BIGINT) AS supp_key, e.n AS n_jobs,
           e.lmax AS edd_lmax, ws.lmax AS wspt_lmax,
           e.twc AS edd_twc_centdays, ws.twc AS wspt_twc_centdays
    FROM e JOIN ws ON ws.sk = e.sk
    """,
)
def edd_wspt_schedule_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-machine scheduling audit per supplier: its lineitems are
    jobs with processing time = quantity, weight = cent value, due
    date = order-to-ship day span. Two classic dispatch rules are
    replayed exactly — EDD (earliest due date), which provably
    minimizes maximum lateness, and WSPT (weighted shortest processing
    time, Smith's rule), which provably minimizes total weighted
    completion. Each supplier row carries both objectives under both
    rules, exhibiting the dominance laws (edd_lmax <= wspt_lmax,
    wspt_twc <= edd_twc) and quantifying the price each rule pays on
    the other objective.

    Determinism: sequences are total orders — (due, orderkey,
    linenumber) and (p/w single-division ratio, orderkey, linenumber);
    completions and objectives are exact integer cumsums.

    Scale shape: one join shuffle on orderkey, then both schedules
    are window cumsums inside the same supplier partitioning — two
    sorts per partition, no pair blowup, jobs-per-supplier bounded by
    the schema (~600) independent of scale factor.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    jobs = li.join(
        o.select(F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"),
        "l_orderkey",
    ).select(
        F.col("l_suppkey").alias("sk"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_quantity").cast("long").alias("p"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("w"),
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("d"),
    )
    w_edd = (
        Window.partitionBy("sk")
        .orderBy("d", "ok", "ln")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_wspt = (
        Window.partitionBy("sk")
        .orderBy(F.col("p") * 1.0 / F.col("w"), F.col("ok"), F.col("ln"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    edd = jobs.select("sk", "d", "w", F.sum("p").over(w_edd).alias("c"))
    wspt = jobs.select("sk", "d", "w", F.sum("p").over(w_wspt).alias("c"))
    e = edd.groupBy("sk").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max(F.col("c") - F.col("d")).cast("long").alias("edd_lmax"),
        F.sum(F.col("w") * F.col("c")).cast("long").alias("edd_twc"),
    )
    ws = wspt.groupBy("sk").agg(
        F.max(F.col("c") - F.col("d")).cast("long").alias("wspt_lmax"),
        F.sum(F.col("w") * F.col("c")).cast("long").alias("wspt_twc"),
    )
    return e.join(ws, "sk").select(
        F.col("sk").cast("long").alias("supp_key"),
        F.col("n").alias("n_jobs"),
        "edd_lmax",
        "wspt_lmax",
        F.col("edd_twc").alias("edd_twc_centdays"),
        F.col("wspt_twc").alias("wspt_twc_centdays"),
    )


@query(
    "myerson_reserve_price",
    oracle="""
    WITH bids AS (
        SELECT c.c_mktsegment AS seg,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS b
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), dv AS (
        SELECT seg, b, CAST(COUNT(*) AS BIGINT) AS m FROM bids GROUP BY 1, 2
    ), rk AS (
        SELECT seg, b,
               SUM(m) OVER (PARTITION BY seg ORDER BY b DESC
                            ROWS UNBOUNDED PRECEDING) AS geq,
               SUM(m) OVER (PARTITION BY seg) AS n
        FROM dv
    ), best AS (
        SELECT seg, b, geq, n, b * geq AS r,
               ROW_NUMBER() OVER (PARTITION BY seg ORDER BY b * geq DESC, b ASC)
                   AS rn
        FROM rk
    )
    SELECT seg AS segment, CAST(n AS BIGINT) AS n_bids,
           CAST(b AS BIGINT) AS reserve_cents,
           CAST(r AS BIGINT) AS revenue_cents,
           CAST(ROUND(geq * 1000000.0 / n) AS BIGINT) AS served_ppm
    FROM best WHERE rn = 1
    """,
)
def myerson_reserve_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical Myerson-optimal posted price per market segment:
    treating each segment's order totals as i.i.d. buyer valuations,
    the revenue-optimal reserve against the empirical distribution is
    argmax over observed prices r of r * #{bids >= r} — the monopoly
    price on the empirical demand curve. Complements
    `vickrey_auction_parts` (which settles auctions at given bids) by
    answering the seller's design question: where to SET the floor,
    and what fraction of buyers that price turns away.

    Determinism: cent-exact bids, integer revenue products, argmax
    with a lowest-price tie-break.

    Scale shape: bids collapse to (segment, distinct price, count)
    in one map-side-combined agg; the demand curve is one descending
    cumsum window per segment over distinct prices and the argmax is
    a WindowGroupLimit — no per-bid pair work anywhere.
    """
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    bids = o.join(
        F.broadcast(cst.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")),
        "o_custkey",
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("b"),
    )
    dv = bids.groupBy("seg", "b").agg(F.count(F.lit(1)).cast("long").alias("m"))
    w_desc = (
        Window.partitionBy("seg")
        .orderBy(F.desc("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rk = dv.select(
        "seg",
        "b",
        F.sum("m").over(w_desc).alias("geq"),
        F.sum("m").over(Window.partitionBy("seg")).alias("n"),
    )
    best = rk.select(
        "seg",
        "b",
        "geq",
        "n",
        (F.col("b") * F.col("geq")).alias("r"),
        F.row_number()
        .over(
            Window.partitionBy("seg").orderBy(
                F.desc(F.col("b") * F.col("geq")), F.asc("b")
            )
        )
        .alias("rn"),
    ).where(F.col("rn") == 1)
    return best.select(
        F.col("seg").alias("segment"),
        F.col("n").cast("long").alias("n_bids"),
        F.col("b").cast("long").alias("reserve_cents"),
        F.col("r").cast("long").alias("revenue_cents"),
        F.round(F.col("geq") * 1000000.0 / F.col("n")).cast("long").alias(
            "served_ppm"
        ),
    )


def _warp_dp_oracle(semiring: str) -> str:
    """Build the 13-stage anti-diagonal DP oracle over nation DOW
    profiles. semiring='dtw' accumulates cost+min(preds); 'frechet'
    takes max(cost, min(preds)). Stage count is fixed by the 7x7 grid,
    so the SQL is mechanical: d0..d12, each MATERIALIZED (referenced
    by the next two stages — inlining would re-expand the fact scan)."""
    combine = {
        "dtw": "c.c + LEAST({p})",
        "frechet": "GREATEST(c.c, LEAST({p}))",
    }[semiring]
    inf = "4611686018427387904"
    stages = []
    for k in range(13):
        if k == 0:
            stages.append(
                ", d0 AS MATERIALIZED (SELECT na, nb, i, j, c AS v FROM cells"
                " WHERE i + j = 0)"
            )
            continue
        preds = [
            f"COALESCE(u.v, {inf})",
            f"COALESCE(lf.v, {inf})",
        ]
        dg_join = ""
        if k >= 2:
            preds.append(f"COALESCE(dg.v, {inf})")
            dg_join = (
                f" LEFT JOIN d{k-2} dg ON dg.na = c.na AND dg.nb = c.nb"
                " AND dg.i = c.i - 1 AND dg.j = c.j - 1"
            )
        expr = combine.format(p=", ".join(preds))
        stages.append(
            f", d{k} AS MATERIALIZED (SELECT c.na, c.nb, c.i, c.j, {expr} AS v"
            f" FROM cells c"
            f" LEFT JOIN d{k-1} u ON u.na = c.na AND u.nb = c.nb"
            f" AND u.i = c.i - 1 AND u.j = c.j"
            f" LEFT JOIN d{k-1} lf ON lf.na = c.na AND lf.nb = c.nb"
            f" AND lf.i = c.i AND lf.j = c.j - 1"
            f"{dg_join} WHERE c.i + c.j = {k})"
        )
    return (
        """
    WITH prof AS (
        SELECT c.c_nationkey AS nk,
               CAST(date_diff('day', DATE '1992-01-01', o.o_orderdate) % 7
                    AS BIGINT) AS dw,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ), grid AS (
        SELECT n.n_nationkey AS nk, g.dw
        FROM nation n CROSS JOIN
             (SELECT UNNEST(generate_series(0, 6)) AS dw) g
    ), tot AS (
        SELECT nk, CAST(SUM(cnt) AS BIGINT) AS t FROM prof GROUP BY 1
    ), p AS (
        SELECT grid.nk, grid.dw,
               CAST(ROUND(COALESCE(prof.cnt, 0) * 1000000.0 / tot.t) AS BIGINT)
                   AS v
        FROM grid
        JOIN tot ON tot.nk = grid.nk
        LEFT JOIN prof ON prof.nk = grid.nk AND prof.dw = grid.dw
    ), cells AS MATERIALIZED (
        SELECT pa.nk AS na, pb.nk AS nb, pa.dw AS i, pb.dw AS j,
               ABS(pa.v - pb.v) AS c
        FROM p pa JOIN p pb ON pa.nk < pb.nk
    )"""
        + "".join(stages)
        + """
    , l1 AS (
        SELECT na, nb, CAST(SUM(c) AS BIGINT) AS l1
        FROM cells WHERE i = j GROUP BY 1, 2
    )
    SELECT CAST(d.na AS BIGINT) AS nation_a, CAST(d.nb AS BIGINT) AS nation_b,
           CAST(d.v AS BIGINT) AS warp_ppm, l1.l1 AS aligned_l1_ppm
    FROM d12 d JOIN l1 ON l1.na = d.na AND l1.nb = d.nb
    WHERE d.i = 6 AND d.j = 6
    """
    )


def _warp_dp_spark(spark: SparkSession, sf_dir: str, semiring: str) -> DataFrame:
    """Spark twin of the warping DP: one fact agg to 25x7 DOW profiles,
    a broadcast pair cross of the tiny profile relation, then the WHOLE
    7x7 DP evaluated IN-ROW with nested higher-order functions — the
    outer ``aggregate`` walks rows i=0..6 carrying the previous DP row
    as an array, the inner one walks j=0..6 building the new row (the
    left-dependence lives in the inner accumulator). A virtual
    j=-1 column seeded to [0, INF..] makes the border cases fall out of
    the same recurrence. Grid size is schema-fixed, so in-row is the
    right 100 TB shape: the old 13-stage anti-diagonal join unroll paid
    ~7 eager checkpoint barriers of pure stage overhead per run for
    relations that never exceed 2.1k rows; this plan has two exchanges
    total and no barrier.

    ``semiring`` picks the per-cell combine: 'dtw' sums alignment cost
    (cost + min(up, left, diag)), 'frechet' takes the bottleneck
    (max(cost, min(up, left, diag))).
    """
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    prof = (
        o.join(
            F.broadcast(
                cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            (F.datediff("o_orderdate", F.lit("1992-01-01")) % 7)
            .cast("long")
            .alias("dw"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    # 25x7 profile feeds both the per-nation totals and the grid join;
    # the 25-row array relation feeds both self-join sides — ckpt each
    # so the fact agg runs once
    prof = _ckpt(prof)
    grid = nat.select(F.col("n_nationkey").alias("nk")).crossJoin(
        spark.range(0, 7).select(F.col("id").alias("dw"))
    )
    tot = prof.groupBy("nk").agg(F.sum("cnt").cast("long").alias("t"))
    p = (
        grid.join(tot, "nk")
        .join(prof, ["nk", "dw"], "left")
        .select(
            "nk",
            "dw",
            F.round(F.coalesce("cnt", F.lit(0)) * 1000000.0 / F.col("t"))
            .cast("long")
            .alias("v"),
        )
    )
    arr = _ckpt(
        p.groupBy("nk")
        .agg(F.array_sort(F.collect_list(F.struct("dw", "v"))).alias("s"))
        .select("nk", F.expr("transform(s, x -> x.v)").alias("vs"))
    )
    pa = arr.alias("pa")
    pb = arr.alias("pb")
    pairs = pa.join(F.broadcast(pb), F.col("pa.nk") < F.col("pb.nk")).select(
        F.col("pa.nk").alias("na"),
        F.col("pb.nk").alias("nb"),
        F.col("pa.vs").alias("av"),
        F.col("pb.vs").alias("bv"),
    )
    inf = "4611686018427387904"
    cost = (
        "ABS(element_at(av, CAST(i + 1 AS INT))"
        " - element_at(bv, CAST(j + 1 AS INT)))"
    )
    best = (
        "LEAST(element_at(prev, CAST(j + 2 AS INT)),"   # up:   dp[i-1][j]
        " element_at(acc, CAST(j + 1 AS INT)),"          # left: dp[i][j-1]
        " element_at(prev, CAST(j + 1 AS INT)))"         # diag: dp[i-1][j-1]
    )
    cell = (
        f"({cost} + {best})"
        if semiring == "dtw"
        else f"GREATEST({cost}, {best})"
    )
    # rows carry the virtual j=-1 column at index 1; the seed row is
    # the virtual i=-1 row [0, INF x 7] so the borders need no special
    # cases: dp[0][0] = cost + min(INF, INF, 0) = cost
    init = f"array(CAST(0 AS BIGINT), {', '.join([inf + 'L'] * 7)})"
    warp = (
        "element_at(aggregate(sequence(0, 6), "
        f"{init}, "
        "(prev, i) -> aggregate(sequence(0, 6), "
        f"array({inf}L), "
        f"(acc, j) -> concat(acc, array({cell})))), 8)"
    )
    l1 = (
        "aggregate(sequence(0, 6), CAST(0 AS BIGINT), (s, j) -> "
        "s + ABS(element_at(av, CAST(j + 1 AS INT))"
        " - element_at(bv, CAST(j + 1 AS INT))))"
    )
    return pairs.select(
        F.col("na").cast("long").alias("nation_a"),
        F.col("nb").cast("long").alias("nation_b"),
        F.expr(warp).cast("long").alias("warp_ppm"),
        F.expr(l1).cast("long").alias("aligned_l1_ppm"),
    )


@query("dtw_nation_dow_profiles", oracle=_warp_dp_oracle("dtw"), bench=True)
def dtw_nation_dow_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic time warping distance between every nation pair's
    day-of-week order profile (7-point ppm shares, weekday slots fixed
    by epoch-day mod 7): DTW(i,j) = |a_i - b_j| + min(up, left, diag),
    the minimal cost of aligning the two weekly shapes with warping
    allowed. Reported beside the warp-free aligned L1 distance — their
    gap is exactly what phase-shifting the week can save, separating
    nations whose demand shape differs from those whose week merely
    starts offset.

    Determinism: profiles are integer ppm shares; the DP is exact
    integer min-plus over a schema-fixed 7x7 grid (no data-dependent
    iteration).

    Scale shape: one fact agg to 25x7 profiles, then the whole DP runs
    IN-ROW per pair via nested higher-order functions — two exchanges
    total, no per-stage joins or checkpoint barriers, and the pair
    relation is a 25-row broadcast cross. Codegen'd JVM arithmetic,
    no Python.
    """
    return _warp_dp_spark(spark, sf_dir, "dtw")


@query("frechet_nation_dow_profiles", oracle=_warp_dp_oracle("frechet"))
def frechet_nation_dow_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete Frechet distance between nation day-of-week profiles —
    the same in-row 7x7 DP as `dtw_nation_dow_profiles` under the
    bottleneck semiring: F(i,j) = max(|a_i - b_j|,
    min(up, left, diag)). Where DTW sums alignment cost, Frechet is
    the dog-leash bound — the single worst step of the best coupled
    walk along both curves; the ordered-curve sibling of the
    order-free `hausdorff_region_profiles`.

    Determinism: identical integer machinery; max/min of exact
    integers only.

    Scale shape: identical to the DTW query — the two differ only in
    the per-cell combine expression, which is the point: the in-row
    DP harness is semiring-generic.
    """
    return _warp_dp_spark(spark, sf_dir, "frechet")


def _kcore_oracle(k: int, rounds: int) -> str:
    """Build the fixed-round k-core peeling oracle: e0 is the
    >=2-common-orders co-purchase graph; each round drops nodes with
    degree < k and keeps edges between survivors. Stages MATERIALIZED
    (each referenced twice)."""
    parts = [
        """
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e0 AS MATERIALIZED (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""", n{r} AS MATERIALIZED (
        SELECT node FROM (
            SELECT u AS node FROM e{r-1} UNION ALL SELECT v FROM e{r-1}
        ) GROUP BY node HAVING COUNT(*) >= {k}
    ), e{r} AS MATERIALIZED (
        SELECT u, v FROM e{r-1}
        WHERE u IN (SELECT node FROM n{r}) AND v IN (SELECT node FROM n{r})
    )"""
        )
    stats = [
        f"""SELECT {r} AS round,
        CAST((SELECT COUNT(*) FROM (SELECT u AS x FROM e{r}
              UNION SELECT v FROM e{r})) AS BIGINT) AS nodes_left,
        CAST((SELECT COUNT(*) FROM e{r}) AS BIGINT) AS edges_left"""
        for r in range(rounds + 1)
    ]
    return "".join(parts) + " " + " UNION ALL ".join(stats)


@query("kcore_peeling_trajectory", oracle=_kcore_oracle(3, 6))
def kcore_peeling_trajectory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six fixed rounds of k-core peeling (k = 3) on the co-purchase
    graph (parts sharing >= 2 orders): each round deletes every node
    with fewer than 3 surviving neighbors and the edges it carried.
    The (round, nodes, edges) trajectory profiles the graph's cohesive
    backbone — how fast the periphery sheds and what dense core
    remains — the decomposition view beside `triangle_count_copurchase`
    (local density) and `rich_club_coefficient` (top-degree density).
    A fixed round count keeps the query deterministic and
    oracle-expressible; the trajectory flattening before round 6 is
    the convergence evidence (pinned by the invariant test).

    Determinism: pure integer degree thresholds; no floats anywhere.

    Scale shape: the candidate edge build is the one heavy self-join
    (order-blocked, same as the triangle query); each peel round is a
    degree hash-agg plus two semi-joins on the shrinking edge
    relation, with ckpt truncating the two-reference
    lineage per round — 6 rounds regardless of graph size.
    """
    from pyspark_movie_recommender_spark.operators.graph import copurchase_pairs

    li = load_table(spark, sf_dir, "lineitem")
    # round 9: basket census (one fact exchange) replaces the items
    # self-join — see operators/graph.copurchase_pairs
    e = copurchase_pairs(li, min_support=2).select("u", "v").transform(_ckpt)
    stats = []

    def stat(r: int, edges: DataFrame) -> DataFrame:
        nodes = edges.select(F.col("u").alias("x")).union(
            edges.select(F.col("v").alias("x"))
        ).distinct()
        return nodes.agg(F.count(F.lit(1)).cast("long").alias("nodes_left")).crossJoin(
            edges.agg(F.count(F.lit(1)).cast("long").alias("edges_left"))
        ).select(F.lit(r).cast("int").alias("round"), "nodes_left", "edges_left")

    stats.append(stat(0, e))
    cur = e
    for r in range(1, 7):
        deg = (
            cur.select(F.col("u").alias("node"))
            .unionAll(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= 3)
            .select("node")
        )
        cur = (
            cur.join(deg.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(deg.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .transform(_ckpt)
        )
        stats.append(stat(r, cur))
    out = stats[0]
    for s in stats[1:]:
        out = out.unionAll(s)
    return out


@query(
    "mantel_matrix_correlation",
    oracle="""
    WITH flows AS (
        SELECT s.s_nationkey AS u, c.c_nationkey AS v,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS f
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE s.s_nationkey <> c.c_nationkey
        GROUP BY 1, 2
    ), tot AS (SELECT CAST(SUM(f) AS BIGINT) AS tf FROM flows
    ), cost AS (
        SELECT LEAST(u, v) AS a, GREATEST(u, v) AS b,
               MIN(CAST(ROUND(-ln(CAST(f AS DOUBLE) / tf) * 1000000)
                        AS BIGINT)) AS x
        FROM flows, tot GROUP BY 1, 2
    ), prof AS (
        SELECT c.c_nationkey AS nk,
               CAST(date_diff('day', DATE '1992-01-01', o.o_orderdate) % 7
                    AS BIGINT) AS dw,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ), ptot AS (SELECT nk, CAST(SUM(cnt) AS BIGINT) AS t FROM prof GROUP BY 1
    ), grid AS (
        SELECT n.n_nationkey AS nk, g.dw
        FROM nation n CROSS JOIN
             (SELECT UNNEST(generate_series(0, 6)) AS dw) g
    ), p AS (
        SELECT grid.nk, grid.dw,
               CAST(ROUND(COALESCE(prof.cnt, 0) * 1000000.0 / ptot.t) AS BIGINT)
                   AS v
        FROM grid
        JOIN ptot ON ptot.nk = grid.nk
        LEFT JOIN prof ON prof.nk = grid.nk AND prof.dw = grid.dw
    ), l1 AS (
        SELECT pa.nk AS a, pb.nk AS b,
               CAST(SUM(ABS(pa.v - pb.v)) AS BIGINT) AS y
        FROM p pa JOIN p pb ON pa.nk < pb.nk AND pa.dw = pb.dw
        GROUP BY 1, 2
    ), m AS (
        SELECT cost.x, l1.y FROM cost JOIN l1 ON l1.a = cost.a AND l1.b = cost.b
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM m
    )
    SELECT n AS n_pairs,
           CAST(ROUND((n * 1.0 * sxy - sx * 1.0 * sy)
                / sqrt((n * 1.0 * sxx - sx * 1.0 * sx)
                       * (n * 1.0 * syy - sy * 1.0 * sy)) * 1000000)
                AS BIGINT) AS mantel_r_micro
    FROM s
    """,
)
def mantel_matrix_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel statistic between two nation-by-nation distance
    matrices: x = symmetrized trade cost (-ln flow share, micro-nats,
    the `minimax_mst_trade_backbone` edge weights) and y = day-of-week
    profile L1 distance (the `dtw_nation_dow_profiles` aligned
    baseline). The Pearson correlation over the 300 unordered pair
    entries asks whether nations that trade cheaply also share a
    weekly demand shape — correlation BETWEEN distance structures,
    which entrywise correlations on raw metrics cannot express.

    Determinism: both matrices are exact integers; the five pair sums
    stay exact (products <= ~1e13, sums < 2^53 exact in BIGINT); one
    final double expression is micro-rounded.

    Scale shape: two independent fact aggs collapse to 300-row pair
    matrices; the correlation is a single scalar agg over their join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
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
            F.broadcast(cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")),
            "o_custkey",
        )
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(F.col("s_nationkey").alias("u"), F.col("c_nationkey").alias("v"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("f")
        )
    )
    flows = _ckpt(flows)  # shared fan-out relation
    tf = flows.agg(F.sum("f").cast("long").alias("tf"))
    cost = (
        flows.crossJoin(F.broadcast(tf))
        .groupBy(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .agg(
            F.min(
                F.round(-F.log(F.col("f").cast("double") / F.col("tf")) * 1000000)
                .cast("long")
            ).alias("x")
        )
    )
    prof = (
        o.join(
            F.broadcast(
                cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            (F.datediff("o_orderdate", F.lit("1992-01-01")) % 7)
            .cast("long")
            .alias("dw"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    prof = _ckpt(prof)  # shared fan-out relation
    ptot = prof.groupBy("nk").agg(F.sum("cnt").cast("long").alias("t"))
    grid = nat.select(F.col("n_nationkey").alias("nk")).crossJoin(
        spark.range(0, 7).select(F.col("id").alias("dw"))
    )
    p = (
        grid.join(ptot, "nk")
        .join(prof, ["nk", "dw"], "left")
        .select(
            "nk",
            "dw",
            F.round(F.coalesce("cnt", F.lit(0)) * 1000000.0 / F.col("t"))
            .cast("long")
            .alias("v"),
        )
    )
    pa = p.alias("pa")
    pb = p.alias("pb")
    l1 = (
        pa.join(
            pb,
            (F.col("pa.nk") < F.col("pb.nk")) & (F.col("pa.dw") == F.col("pb.dw")),
        )
        .groupBy(F.col("pa.nk").alias("a"), F.col("pb.nk").alias("b"))
        .agg(F.sum(F.abs(F.col("pa.v") - F.col("pb.v"))).cast("long").alias("y"))
    )
    m = cost.join(l1, ["a", "b"])
    agg = m.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    return agg.select(
        F.col("n").alias("n_pairs"),
        F.round(
            (F.col("n") * 1.0 * F.col("sxy") - F.col("sx") * 1.0 * F.col("sy"))
            / F.sqrt(
                (F.col("n") * 1.0 * F.col("sxx") - F.col("sx") * 1.0 * F.col("sx"))
                * (F.col("n") * 1.0 * F.col("syy") - F.col("sy") * 1.0 * F.col("sy"))
            )
            * 1000000
        )
        .cast("long")
        .alias("mantel_r_micro"),
    )


@query(
    "luhn_checkdigit_audit",
    oracle="""
    WITH acct AS (
        SELECT c_custkey, c_nationkey,
               CAST(c_custkey AS BIGINT) * 1000003 + 7 AS p,
               CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END AS corrupt
        FROM customer
    ), pw(i, tp) AS (
        VALUES (0, CAST(1 AS BIGINT)), (1, 10), (2, 100), (3, 1000),
               (4, 10000), (5, 100000), (6, 1000000), (7, 10000000),
               (8, 100000000), (9, 1000000000), (10, 10000000000),
               (11, 100000000000), (12, 1000000000000),
               (13, 10000000000000), (14, 100000000000000)
    ), digits AS (
        SELECT a.c_custkey, a.c_nationkey, a.corrupt, pw.i,
               (a.p // pw.tp) % 10 AS d
        FROM acct a CROSS JOIN pw
    ), sums AS (
        SELECT c_custkey, c_nationkey, corrupt,
               SUM(CASE WHEN i % 2 = 0
                        THEN 2 * d - CASE WHEN 2 * d > 9 THEN 9 ELSE 0 END
                        ELSE d END) AS s
        FROM digits GROUP BY 1, 2, 3
    ), checked AS (
        SELECT c_nationkey,
               (10 - s % 10) % 10 AS cd,
               ((10 - s % 10) % 10 + corrupt) % 10 AS stored
        FROM sums
    )
    SELECT CAST(c_nationkey AS BIGINT) AS nation_key,
           CAST(COUNT(*) AS BIGINT) AS n_accounts,
           CAST(SUM(CASE WHEN stored <> cd THEN 1 ELSE 0 END) AS BIGINT)
               AS n_invalid,
           CAST(ROUND(SUM(CASE WHEN stored <> cd THEN 1 ELSE 0 END)
                * 1000000.0 / COUNT(*)) AS BIGINT) AS invalid_ppm
    FROM checked GROUP BY 1
    """,
)
def luhn_checkdigit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn (mod-10) check-digit validation audit: each customer gets
    a deterministic synthetic account payload (custkey * 1000003 + 7),
    its Luhn check digit is computed by the standard
    double-every-other-digit-from-the-right rule, and a simulated
    entry-error corrupts the stored digit (+1 mod 10) for every 97th
    custkey. The audit recomputes the digit and reports per-nation
    invalid counts — the ingest-side validity gate every
    payment/identifier column needs (Luhn catches all single-digit
    errors and most adjacent transpositions).

    Determinism: digit extraction is exact integer div/mod against a
    literal powers-of-ten relation (never float POWER); the corrupt
    set is a fixed residue class.

    Scale shape: the 15-row powers relation is broadcast; digit
    explode + per-account sum is map-side (account is the group key,
    combine collapses before any shuffle); one final per-nation agg.
    """
    cst = load_table(spark, sf_dir, "customer")
    acct = cst.select(
        "c_custkey",
        "c_nationkey",
        (F.col("c_custkey").cast("long") * 1000003 + 7).alias("p"),
        F.when(F.col("c_custkey") % 97 == 0, 1).otherwise(0).alias("corrupt"),
    )
    pw = spark.createDataFrame(
        [(i, 10**i) for i in range(15)], "i int, tp long"
    )
    digits = acct.crossJoin(F.broadcast(pw)).select(
        "c_custkey",
        "c_nationkey",
        "corrupt",
        "i",
        ((F.col("p") / F.col("tp")).cast("long") % 10).alias("d"),
    )
    sums = digits.groupBy("c_custkey", "c_nationkey", "corrupt").agg(
        F.sum(
            F.when(
                F.col("i") % 2 == 0,
                2 * F.col("d")
                - F.when(2 * F.col("d") > 9, 9).otherwise(0),
            ).otherwise(F.col("d"))
        ).alias("s")
    )
    checked = sums.select(
        "c_nationkey",
        ((10 - F.col("s") % 10) % 10).alias("cd"),
        (((10 - F.col("s") % 10) % 10 + F.col("corrupt")) % 10).alias("stored"),
    )
    return checked.groupBy(
        F.col("c_nationkey").cast("long").alias("nation_key")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_accounts"),
        F.sum(F.when(F.col("stored") != F.col("cd"), 1).otherwise(0))
        .cast("long")
        .alias("n_invalid"),
        F.round(
            F.sum(F.when(F.col("stored") != F.col("cd"), 1).otherwise(0))
            * 1000000.0
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("invalid_ppm"),
    )


@query(
    "mod97_checkdigit_audit",
    oracle="""
    WITH acct AS (
        SELECT s_nationkey,
               CAST(s_suppkey AS BIGINT) * 9999991 + 13 AS p,
               CASE WHEN s_suppkey % 89 = 0 THEN 1 ELSE 0 END AS corrupt
        FROM supplier
    ), checked AS (
        SELECT s_nationkey,
               98 - (p * 100) % 97 AS cd,
               (98 - (p * 100) % 97 + corrupt - 1) % 97 + 1 AS stored,
               p
        FROM acct
    )
    SELECT CAST(s_nationkey AS BIGINT) AS nation_key,
           CAST(COUNT(*) AS BIGINT) AS n_accounts,
           CAST(SUM(CASE WHEN (p * 100 + stored) % 97 <> 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_invalid,
           CAST(SUM(CASE WHEN stored <> cd THEN 1 ELSE 0 END) AS BIGINT)
               AS n_mismatch
    FROM checked GROUP BY 1
    """,
)
def mod97_checkdigit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO 7064 mod-97 check-digit audit (the IBAN scheme) on
    deterministic synthetic supplier accounts: the two-digit check for
    payload p is 98 - (p*100 mod 97), making the full number satisfy
    (p*100 + check) mod 97 = 1; every 89th suppkey gets a simulated
    +1 corruption. The audit validates via BOTH routes — the residue
    identity and digit recomputation — and reports them separately
    (they must agree, pinned by the invariant test). Mod-97 catches
    all single errors AND all transpositions, the stronger scheme
    beside `luhn_checkdigit_audit`'s mod-10.

    Determinism: pure integer modular arithmetic (p*100 <= ~1e17,
    inside BIGINT).

    Scale shape: stateless per-row expressions plus one per-nation
    hash agg — no joins, no windows, fully map-side until the final
    25-row combine.
    """
    sup = load_table(spark, sf_dir, "supplier")
    acct = sup.select(
        "s_nationkey",
        (F.col("s_suppkey").cast("long") * 9999991 + 13).alias("p"),
        F.when(F.col("s_suppkey") % 89 == 0, 1).otherwise(0).alias("corrupt"),
    )
    checked = acct.select(
        "s_nationkey",
        "p",
        (98 - (F.col("p") * 100) % 97).alias("cd"),
        ((98 - (F.col("p") * 100) % 97 + F.col("corrupt") - 1) % 97 + 1).alias(
            "stored"
        ),
    )
    return checked.groupBy(
        F.col("s_nationkey").cast("long").alias("nation_key")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_accounts"),
        F.sum(
            F.when((F.col("p") * 100 + F.col("stored")) % 97 != 1, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_invalid"),
        F.sum(F.when(F.col("stored") != F.col("cd"), 1).otherwise(0))
        .cast("long")
        .alias("n_mismatch"),
    )


_UNIT_PTS_SQL = """
    WITH pts AS (
        -- deterministic unit-square points via Knuth multiplicative mixing
        SELECT c_custkey AS id,
               CAST((c_custkey * 2654435761) % 1000000 AS DOUBLE)
                   / 1000000.0 AS x,
               CAST(((c_custkey + 1013904223) * 2654435761) % 1000000
                    AS DOUBLE) / 1000000.0 AS y
        FROM customer
    ), cells AS (
        SELECT id, x, y,
               CAST(FLOOR(x * 32) AS BIGINT) AS cx,
               CAST(FLOOR(y * 32) AS BIGINT) AS cy
        FROM pts
    )
"""


@query(
    "clark_evans_nn_index",
    oracle=_UNIT_PTS_SQL
    + """
    , nbr(dx, dy) AS (
        VALUES (-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1),
               (1, -1), (1, 0), (1, 1)
    ), probe AS (
        SELECT id, x, y, cx + dx AS cx, cy + dy AS cy
        FROM cells CROSS JOIN nbr
    ), cand AS (
        SELECT p.id,
               (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y) AS d2
        FROM probe p JOIN cells q
          ON q.cx = p.cx AND q.cy = p.cy AND q.id <> p.id
    ), nn AS (SELECT id, MIN(d2) AS d2 FROM cand GROUP BY id
    ), inc AS (
        SELECT sqrt(d2) AS d FROM nn WHERE d2 <= 0.03125 * 0.03125
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m, AVG(d) AS mean_nn FROM inc
    )
    SELECT tot.n AS n_points, s.m AS n_with_nn,
           CAST(ROUND(s.mean_nn * 1000000) AS BIGINT) AS mean_nn_micro,
           CAST(ROUND(0.5 / sqrt(tot.n) * 1000000) AS BIGINT)
               AS csr_expected_micro,
           CAST(ROUND(s.mean_nn / (0.5 / sqrt(tot.n)) * 1000000) AS BIGINT)
               AS clark_evans_micro
    FROM tot, s
    """,
)
def clark_evans_nn_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clark-Evans aggregation index on a deterministic unit-square
    point pattern (Knuth-mixed customer keys): the ratio of the
    observed mean nearest-neighbor distance to the 0.5/sqrt(n)
    expectation under complete spatial randomness. R < 1 signals
    clustering, R > 1 regularity — the one-number dispersion verdict
    for any keyed point set (store sites, sensor drops, embedding-2D
    projections).

    Determinism: coordinates are exact integer mixes scaled once;
    the NN search is exact within the documented capture radius — a
    3x3 block of 1/32 cells guarantees the true NN whenever it lies
    within one cell width (0.03125), and points whose best candidate
    is farther are excluded and counted (n_points - n_with_nn), the
    same rule in both dialects.

    Scale shape: the classic O(n^2) all-pairs NN is replaced by a
    grid-blocked 9-cell self-join — candidates per point stay O(local
    density); the grid resolution is the knob a 100-TB run retunes to
    keep cells O(1) occupied.
    """
    cst = load_table(spark, sf_dir, "customer")
    pts = cst.select(
        F.col("c_custkey").alias("id"),
        (((F.col("c_custkey") * 2654435761) % 1000000).cast("double") / 1000000.0).alias("x"),
        ((((F.col("c_custkey") + 1013904223) * 2654435761) % 1000000).cast(
            "double"
        ) / 1000000.0).alias("y"),
    )
    cells = pts.select(
        "id",
        "x",
        "y",
        F.floor(F.col("x") * 32).cast("long").alias("cx"),
        F.floor(F.col("y") * 32).cast("long").alias("cy"),
    )
    nbr = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx long, dy long"
    )
    probe = cells.crossJoin(F.broadcast(nbr)).select(
        "id",
        "x",
        "y",
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
    )
    q = cells.alias("q")
    p = probe.alias("p")
    cand = p.join(
        q,
        (F.col("q.cx") == F.col("p.cx"))
        & (F.col("q.cy") == F.col("p.cy"))
        & (F.col("q.id") != F.col("p.id")),
    ).select(
        F.col("p.id").alias("id"),
        (
            (F.col("p.x") - F.col("q.x")) * (F.col("p.x") - F.col("q.x"))
            + (F.col("p.y") - F.col("q.y")) * (F.col("p.y") - F.col("q.y"))
        ).alias("d2"),
    )
    nn = cand.groupBy("id").agg(F.min("d2").alias("d2"))
    inc = nn.where(F.col("d2") <= 0.03125 * 0.03125).select(
        F.sqrt("d2").alias("d")
    )
    tot = pts.agg(F.count(F.lit(1)).cast("long").alias("n"))
    s = inc.agg(
        F.count(F.lit(1)).cast("long").alias("m"), F.avg("d").alias("mean_nn")
    )
    return tot.crossJoin(F.broadcast(s)).select(
        F.col("n").alias("n_points"),
        F.col("m").alias("n_with_nn"),
        F.round(F.col("mean_nn") * 1000000).cast("long").alias("mean_nn_micro"),
        F.round(0.5 / F.sqrt(F.col("n")) * 1000000)
        .cast("long")
        .alias("csr_expected_micro"),
        F.round(F.col("mean_nn") / (0.5 / F.sqrt(F.col("n"))) * 1000000)
        .cast("long")
        .alias("clark_evans_micro"),
    )


@query(
    "ripley_k_census",
    oracle=_UNIT_PTS_SQL
    + """
    , offs AS (
        SELECT a.dx, b.dy
        FROM (SELECT UNNEST(generate_series(-3, 3)) AS dx) a
        CROSS JOIN (SELECT UNNEST(generate_series(-3, 3)) AS dy) b
    ), probe AS (
        SELECT id, x, y, cx + dx AS cx, cy + dy AS cy
        FROM cells CROSS JOIN offs
    ), pd AS (
        SELECT (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y) AS d2
        FROM probe p JOIN cells q
          ON q.cx = p.cx AND q.cy = p.cy AND q.id <> p.id
    ), radii(r) AS (VALUES (0.01), (0.02), (0.04), (0.08)
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts
    )
    SELECT CAST(ROUND(radii.r * 1000) AS BIGINT) AS r_milli,
           CAST(SUM(CASE WHEN pd.d2 <= radii.r * radii.r THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pairs_within,
           CAST(ROUND(SUM(CASE WHEN pd.d2 <= radii.r * radii.r
                               THEN 1 ELSE 0 END)
                * 1000000.0 / (tot.n * 1.0 * tot.n)) AS BIGINT) AS khat_micro,
           CAST(ROUND(pi() * radii.r * radii.r * 1000000) AS BIGINT)
               AS csr_micro
    FROM radii CROSS JOIN pd CROSS JOIN tot
    GROUP BY radii.r, tot.n
    """,
)
def ripley_k_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ripley's K function at radii {0.01, 0.02, 0.04, 0.08} on the
    same unit-square pattern as `clark_evans_nn_index`: Khat(r) =
    (1/n^2) * #{ordered pairs within r}, compared to the pi*r^2 CSR
    expectation (no edge correction — documented, so border deficits
    read as mild under-counts at the largest radius). Where
    Clark-Evans summarizes dispersion at the single NN scale, K
    profiles it ACROSS scales — clustering at 0.01 can coexist with
    regularity at 0.08 and only K sees both.

    Determinism: distances compare as exact squared doubles against
    literal r^2 thresholds; counts are integers; each ordered pair is
    produced exactly once (the probe offset to the neighbor cell is
    unique per pair).

    Scale shape: pair generation is blocked to a 7x7 cell
    neighborhood sized to the largest radius (3 cells x 1/32 >=
    0.08), so candidate volume tracks local density instead of n^2;
    one hash agg over the 4-radius grid finishes the job.
    """
    cst = load_table(spark, sf_dir, "customer")
    pts = cst.select(
        F.col("c_custkey").alias("id"),
        (((F.col("c_custkey") * 2654435761) % 1000000).cast("double") / 1000000.0).alias("x"),
        ((((F.col("c_custkey") + 1013904223) * 2654435761) % 1000000).cast(
            "double"
        ) / 1000000.0).alias("y"),
    )
    cells = pts.select(
        "id",
        "x",
        "y",
        F.floor(F.col("x") * 32).cast("long").alias("cx"),
        F.floor(F.col("y") * 32).cast("long").alias("cy"),
    )
    offs = spark.createDataFrame(
        [(dx, dy) for dx in range(-3, 4) for dy in range(-3, 4)],
        "dx long, dy long",
    )
    probe = cells.crossJoin(F.broadcast(offs)).select(
        "id",
        "x",
        "y",
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
    )
    q = cells.alias("q")
    p = probe.alias("p")
    pd = p.join(
        q,
        (F.col("q.cx") == F.col("p.cx"))
        & (F.col("q.cy") == F.col("p.cy"))
        & (F.col("q.id") != F.col("p.id")),
    ).select(
        (
            (F.col("p.x") - F.col("q.x")) * (F.col("p.x") - F.col("q.x"))
            + (F.col("p.y") - F.col("q.y")) * (F.col("p.y") - F.col("q.y"))
        ).alias("d2")
    )
    radii = spark.createDataFrame([(0.01,), (0.02,), (0.04,), (0.08,)], "r double")
    tot = pts.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        pd.crossJoin(F.broadcast(radii))
        .crossJoin(F.broadcast(tot))
        .groupBy("r", "n")
        .agg(
            F.sum(F.when(F.col("d2") <= F.col("r") * F.col("r"), 1).otherwise(0))
            .cast("long")
            .alias("n_pairs_within")
        )
        .select(
            F.round(F.col("r") * 1000).cast("long").alias("r_milli"),
            "n_pairs_within",
            F.round(
                F.col("n_pairs_within") * 1000000.0 / (F.col("n") * 1.0 * F.col("n"))
            )
            .cast("long")
            .alias("khat_micro"),
            F.round(F.lit(3.141592653589793) * F.col("r") * F.col("r") * 1000000)
            .cast("long")
            .alias("csr_micro"),
        )
    )


@query(
    "ams_f2_sketch",
    oracle="""
    WITH keys AS (
        SELECT CAST(l_partkey AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS f
        FROM lineitem GROUP BY 1
    ), params(j, a, b) AS (
        VALUES (0, 48271, 11), (1, 16807, 23), (2, 69621, 101), (3, 40692, 7),
               (4, 65539, 19), (5, 22695477, 3), (6, 134775813, 29),
               (7, 214013, 53)
    ), signed AS (
        SELECT p.j,
               CASE WHEN ((p.a * ((p.a * k.k + p.b) % 2147483647) + p.b)
                          % 2147483647) % 2 = 0
                    THEN k.f ELSE -k.f END AS sf
        FROM keys k CROSS JOIN params p
    ), sk AS (
        SELECT j, CAST(SUM(sf) AS BIGINT) AS s FROM signed GROUP BY j
    ), est AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS d, AVG(s * 1.0 * s) AS mean_est,
               MIN(s * s) AS min_est, MAX(s * s) AS max_est
        FROM sk
    ), ex AS (
        SELECT CAST(SUM(f * f) AS BIGINT) AS f2 FROM keys
    )
    SELECT ex.f2 AS exact_f2, est.d AS n_sketch_rows,
           CAST(ROUND(est.mean_est) AS BIGINT) AS ams_mean_est,
           CAST(est.min_est AS BIGINT) AS ams_min_est,
           CAST(est.max_est AS BIGINT) AS ams_max_est,
           CAST(ROUND(ABS(est.mean_est - ex.f2) * 1000000.0 / ex.f2) AS BIGINT)
               AS rel_err_ppm
    FROM ex, est
    """,
)
def ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS (Alon-Matias-Szegedy) sketch of the second frequency moment
    F2 = sum f_k^2 of part keys — the self-join size / collision mass
    that drives join planning and skew detection. Eight sketch rows
    each accumulate S_j = sum s_j(k) * f_k with a +/-1 LCG sign hash
    (deterministic 2-universal stand-in for the four-wise family);
    E[S_j^2] = F2, and the audit reports mean/min/max of the eight
    estimates against the exact moment — the calibration that decides
    whether the sketch can replace the exact pass at full scale.

    Determinism: sign hashes, signed sums, and squares are exact
    integer arithmetic (|S_j| <= total rows, squares < 2^63); only
    the 8-way mean is rounded.

    Scale shape: built from the per-key exact counts (mergeable:
    signed sums of counts equal signed sums of the stream), so one
    map-side-combined agg feeds a broadcast-size 8-row sketch;
    streaming updates would be one +/-f per row with no state beyond
    8 counters.
    """
    li = load_table(spark, sf_dir, "lineitem")
    keys = li.groupBy(F.col("l_partkey").cast("long").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    params = spark.createDataFrame(
        [
            (0, 48271, 11), (1, 16807, 23), (2, 69621, 101), (3, 40692, 7),
            (4, 65539, 19), (5, 22695477, 3), (6, 134775813, 29),
            (7, 214013, 53),
        ],
        "j int, a long, b long",
    )
    signed = keys.crossJoin(F.broadcast(params)).select(
        "j",
        F.when(
            (
                (
                    F.col("a")
                    * ((F.col("a") * F.col("k") + F.col("b")) % 2147483647)
                    + F.col("b")
                )
                % 2147483647
            )
            % 2
            == 0,
            F.col("f"),
        )
        .otherwise(-F.col("f"))
        .alias("sf"),
    )
    sk = signed.groupBy("j").agg(F.sum("sf").cast("long").alias("s"))
    est = sk.agg(
        F.count(F.lit(1)).cast("long").alias("d"),
        F.avg(F.col("s") * 1.0 * F.col("s")).alias("mean_est"),
        F.min(F.col("s") * F.col("s")).alias("min_est"),
        F.max(F.col("s") * F.col("s")).alias("max_est"),
    )
    ex = keys.agg(F.sum(F.col("f") * F.col("f")).cast("long").alias("f2"))
    return ex.crossJoin(F.broadcast(est)).select(
        F.col("f2").alias("exact_f2"),
        F.col("d").alias("n_sketch_rows"),
        F.round(F.col("mean_est")).cast("long").alias("ams_mean_est"),
        F.col("min_est").cast("long").alias("ams_min_est"),
        F.col("max_est").cast("long").alias("ams_max_est"),
        F.round(F.abs(F.col("mean_est") - F.col("f2")) * 1000000.0 / F.col("f2"))
        .cast("long")
        .alias("rel_err_ppm"),
    )


@query(
    "linear_counting_sketch",
    oracle="""
    WITH dk AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS x FROM orders),
    occ AS (
        SELECT COUNT(DISTINCT (48271 * ((48271 * x + 12345) % 2147483647)
                       + 12345) % 2147483647 % 4096)
               AS occupied
        FROM dk
    ), e AS (SELECT CAST(COUNT(*) AS BIGINT) AS ed FROM dk),
    est AS (
        SELECT ed, CAST(occupied AS BIGINT) AS occupied,
               -4096.0 * ln((4096.0 - occupied) / 4096.0) AS lc
        FROM e, occ
    )
    SELECT ed AS exact_distinct, CAST(4096 AS BIGINT) AS n_buckets, occupied,
           CAST(ROUND(lc) AS BIGINT) AS lc_estimate,
           CAST(ROUND(ABS(lc - ed) * 1000000.0 / ed) AS BIGINT) AS rel_err_ppm
    FROM est
    """,
)
def linear_counting_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear counting (Whang et al.) distinct estimator audited
    against the exact count: distinct customer keys hash into a
    4096-bit bitmap via the fixed LCG map, and the estimator
    -m * ln(empty fraction) inverts the expected collision process.
    The low-cardinality complement of `kmv_distinct_sketch` (KMV wins
    when D >> m, linear counting when D <~ m — running both at audit
    scale is how the crossover is chosen) and the deterministic twin
    of the engine-specific HLL in `approx_quantiles_prices`.

    Determinism: bucket occupancy is exact integer hashing; one ln()
    on a low-denominator rational, micro-rounded relative error.

    Scale shape: COUNT(DISTINCT bucket) over 4096 possible values —
    partial aggs collapse each partition to <=4096 entries before the
    single-reducer merge; the bitmap is the shuffle payload, not the
    keys.
    """
    o = load_table(spark, sf_dir, "orders")
    dk = o.select(F.col("o_custkey").cast("long").alias("x")).distinct()
    h1 = (F.lit(48271) * F.col("x") + 12345) % 2147483647
    occ = dk.agg(
        F.countDistinct(
            ((F.lit(48271) * h1 + 12345) % 2147483647) % 4096
        ).alias("occupied")
    )
    e = dk.agg(F.count(F.lit(1)).cast("long").alias("ed"))
    est = e.crossJoin(F.broadcast(occ)).select(
        "ed",
        F.col("occupied").cast("long").alias("occupied"),
        (
            -4096.0
            * F.log((F.lit(4096.0) - F.col("occupied")) / F.lit(4096.0))
        ).alias("lc"),
    )
    return est.select(
        F.col("ed").alias("exact_distinct"),
        F.lit(4096).cast("long").alias("n_buckets"),
        "occupied",
        F.round(F.col("lc")).cast("long").alias("lc_estimate"),
        F.round(F.abs(F.col("lc") - F.col("ed")) * 1000000.0 / F.col("ed"))
        .cast("long")
        .alias("rel_err_ppm"),
    )


@query(
    "delong_auc_variance",
    oracle="""
    WITH base AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
               o_totalprice AS s
        FROM orders
    ), nn AS (
        SELECT CAST(SUM(y) AS BIGINT) AS np,
               CAST(COUNT(*) - SUM(y) AS BIGINT) AS ng
        FROM base
    ), rk AS (
        SELECT y,
               RANK() OVER (ORDER BY s)
                   + (COUNT(*) OVER (PARTITION BY s) - 1) / 2.0 AS r,
               RANK() OVER (PARTITION BY y ORDER BY s)
                   + (COUNT(*) OVER (PARTITION BY y, s) - 1) / 2.0 AS rg
        FROM base
    ), v AS (
        SELECT y,
               CASE WHEN y = 1 THEN (r - rg) / nn.ng
                    ELSE 1.0 - (r - rg) / nn.np END AS v
        FROM rk, nn
    ), m AS (
        SELECT AVG(CASE WHEN y = 1 THEN v END) AS auc,
               VAR_SAMP(CASE WHEN y = 1 THEN v END) AS s10,
               VAR_SAMP(CASE WHEN y = 0 THEN v END) AS s01
        FROM v
    )
    SELECT nn.np AS n_pos, nn.ng AS n_neg,
           CAST(ROUND(m.auc * 1000000) AS BIGINT) AS auc_ppm,
           CAST(ROUND(sqrt(m.s10 / nn.np + m.s01 / nn.ng) * 1000000) AS BIGINT)
               AS se_micro,
           CAST(ROUND((m.auc - 0.5) / sqrt(m.s10 / nn.np + m.s01 / nn.ng)
                * 1000) AS BIGINT) AS z_vs_half_milli
    FROM m, nn
    """,
)
def delong_auc_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeLong (1988) nonparametric AUC standard error for the
    price -> finished-status ranking: per-positive placement values
    V10_i = (combined midrank - within-class midrank) / n_neg (and the
    mirrored V01 for negatives) have means equal to the AUC, and
    S10/n_pos + S01/n_neg is the exact U-statistic variance — the
    inference layer `auc_order_status_price` lacks. Ties are handled
    by true midranks (the 0.5 convention), not an arbitrary
    tie-break.

    Determinism: midranks are exact .5-grid rationals from RANK +
    tie-count windows; placement values are single divisions; AUC,
    variance sums, and the z-score are micro/milli-rounded far above
    summation-order noise.

    Scale shape: two window passes (global score order, per-class
    score order) — each one sort-shuffle — then a single scalar agg;
    no pairwise O(n_pos * n_neg) work, which is the whole point of
    the placement-value formulation.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        F.col("o_totalprice").alias("s"),
    )
    nn = base.agg(
        F.sum("y").cast("long").alias("np"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("ng"),
    )
    nn = _ckpt(nn)  # shared fan-out relation
    from pyspark_movie_recommender_spark.operators.rank import (
        distributed_order_stats,
    )

    # mid-ranks are a function of the DISTINCT score only, so collapse
    # to the distinct-score relation, run its cumulative class counts
    # through the distributed rank machinery, and equi-join back —
    # never a fact-sized single-task global window. midrank =
    # c_through − t + (t+1)/2 reproduces rank()+(cnt−1)/2 bit-for-bit
    # (integer-valued doubles < 2^53).
    g = (
        base.groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("t"),
            F.sum("y").cast("long").alias("tp"),
        )
        .withColumn("tn", F.col("t") - F.col("tp"))
    )
    cum = distributed_order_stats(
        g.withColumn("__k", F.col("s").cast("double")),
        "__k",
        [],
        cumsum_cols={"ct": "t", "ctp": "tp", "ctn": "tn"},
    )
    mr = cum.select(
        "s",
        (F.col("ct") - F.col("t") + (F.col("t") + 1) / 2.0).alias("r"),
        (F.col("ctp") - F.col("tp") + (F.col("tp") + 1) / 2.0).alias("rg1"),
        (F.col("ctn") - F.col("tn") + (F.col("tn") + 1) / 2.0).alias("rg0"),
    )
    rk = base.join(mr, "s").select(
        "y",
        "r",
        F.when(F.col("y") == 1, F.col("rg1")).otherwise(F.col("rg0")).alias("rg"),
    )
    v = rk.crossJoin(F.broadcast(nn)).select(
        "y",
        F.when(F.col("y") == 1, (F.col("r") - F.col("rg")) / F.col("ng"))
        .otherwise(1.0 - (F.col("r") - F.col("rg")) / F.col("np"))
        .alias("v"),
    )
    m = v.agg(
        F.avg(F.when(F.col("y") == 1, F.col("v"))).alias("auc"),
        F.var_samp(F.when(F.col("y") == 1, F.col("v"))).alias("s10"),
        F.var_samp(F.when(F.col("y") == 0, F.col("v"))).alias("s01"),
    )
    se = F.sqrt(F.col("s10") / F.col("np") + F.col("s01") / F.col("ng"))
    return m.crossJoin(F.broadcast(nn)).select(
        F.col("np").alias("n_pos"),
        F.col("ng").alias("n_neg"),
        F.round(F.col("auc") * 1000000).cast("long").alias("auc_ppm"),
        F.round(se * 1000000).cast("long").alias("se_micro"),
        F.round((F.col("auc") - 0.5) / se * 1000).cast("long").alias(
            "z_vs_half_milli"
        ),
    )


@query(
    "delong_paired_auc_test",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
               o_totalprice AS sa,
               -CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)
                   AS sb
        FROM orders
    ), nn AS (
        SELECT CAST(SUM(y) AS BIGINT) AS np,
               CAST(COUNT(*) - SUM(y) AS BIGINT) AS ng
        FROM base
    ), rka AS (
        SELECT k, y,
               RANK() OVER (ORDER BY sa)
                   + (COUNT(*) OVER (PARTITION BY sa) - 1) / 2.0 AS r,
               RANK() OVER (PARTITION BY y ORDER BY sa)
                   + (COUNT(*) OVER (PARTITION BY y, sa) - 1) / 2.0 AS rg
        FROM base
    ), rkb AS (
        SELECT k, y,
               RANK() OVER (ORDER BY sb)
                   + (COUNT(*) OVER (PARTITION BY sb) - 1) / 2.0 AS r,
               RANK() OVER (PARTITION BY y ORDER BY sb)
                   + (COUNT(*) OVER (PARTITION BY y, sb) - 1) / 2.0 AS rg
        FROM base
    ), v AS (
        SELECT a.y,
               CASE WHEN a.y = 1 THEN (a.r - a.rg) / nn.ng
                    ELSE 1.0 - (a.r - a.rg) / nn.np END AS va,
               CASE WHEN a.y = 1 THEN (b.r - b.rg) / nn.ng
                    ELSE 1.0 - (b.r - b.rg) / nn.np END AS vb
        FROM rka a JOIN rkb b ON b.k = a.k, nn
    ), m AS (
        SELECT AVG(CASE WHEN y = 1 THEN va END) AS aa,
               AVG(CASE WHEN y = 1 THEN vb END) AS ab,
               VAR_SAMP(CASE WHEN y = 1 THEN va END) AS s10a,
               VAR_SAMP(CASE WHEN y = 1 THEN vb END) AS s10b,
               COVAR_SAMP(CASE WHEN y = 1 THEN va END,
                          CASE WHEN y = 1 THEN vb END) AS s10ab,
               VAR_SAMP(CASE WHEN y = 0 THEN va END) AS s01a,
               VAR_SAMP(CASE WHEN y = 0 THEN vb END) AS s01b,
               COVAR_SAMP(CASE WHEN y = 0 THEN va END,
                          CASE WHEN y = 0 THEN vb END) AS s01ab
        FROM v
    )
    SELECT CAST(ROUND(m.aa * 1000000) AS BIGINT) AS auc_price_ppm,
           CAST(ROUND(m.ab * 1000000) AS BIGINT) AS auc_recency_ppm,
           CAST(ROUND((m.aa - m.ab) * 1000000) AS BIGINT) AS diff_ppm,
           CAST(ROUND(sqrt((m.s10a + m.s10b - 2 * m.s10ab) / nn.np
                           + (m.s01a + m.s01b - 2 * m.s01ab) / nn.ng)
                * 1000000) AS BIGINT) AS se_diff_micro,
           CAST(ROUND((m.aa - m.ab)
                / sqrt((m.s10a + m.s10b - 2 * m.s10ab) / nn.np
                       + (m.s01a + m.s01b - 2 * m.s01ab) / nn.ng) * 1000)
                AS BIGINT) AS z_milli
    FROM m, nn
    """,
)
def delong_paired_auc_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeLong paired AUC comparison of two classifiers for finished
    status evaluated on the SAME orders: score A = total price, score
    B = order recency (negated epoch day). Because both AUCs share the
    sample, their placement values are correlated, and the correct
    test subtracts twice the DeLong covariance — the
    compare-two-models decision a naive two-independent-AUC z-test
    gets wrong (usually overstating the variance and missing real
    differences).

    Determinism: two independent midrank passes joined on orderkey;
    VAR_SAMP/COVAR_SAMP over exact .5-grid placement rationals;
    micro/milli rounding at the end.

    Scale shape: four sort-windows (two per score) and one join on
    the order key, then a scalar agg — placement values keep the
    pairing without any O(pos x neg) expansion per classifier.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        F.col("o_totalprice").alias("sa"),
        (-F.datediff("o_orderdate", F.lit("1992-01-01")).cast("long")).alias("sb"),
    )
    nn = base.agg(
        F.sum("y").cast("long").alias("np"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("ng"),
    )
    nn = _ckpt(nn)  # shared fan-out relation

    from pyspark_movie_recommender_spark.operators.rank import (
        distributed_order_stats,
    )

    # mid-ranks depend only on the DISTINCT score of each model, so
    # collapse to per-model distinct-score relations, run their
    # cumulative class counts through the distributed rank machinery,
    # and equi-join back on the score — this removes BOTH fact-sized
    # single-task windows AND the paired self-join on the order key
    # (the two placement columns reattach to the same base row by
    # score lookups). midrank = c_through − t + (t+1)/2 is
    # bit-identical to rank()+(cnt−1)/2.
    def midranks(col: str, suffix: str) -> DataFrame:
        g = (
            base.groupBy(col)
            .agg(
                F.count(F.lit(1)).cast("long").alias("t"),
                F.sum("y").cast("long").alias("tp"),
            )
            .withColumn("tn", F.col("t") - F.col("tp"))
        )
        cum = distributed_order_stats(
            g.withColumn("__k", F.col(col).cast("double")),
            "__k",
            [],
            cumsum_cols={"ct": "t", "ctp": "tp", "ctn": "tn"},
        )
        return cum.select(
            col,
            (F.col("ct") - F.col("t") + (F.col("t") + 1) / 2.0).alias(
                f"r{suffix}"
            ),
            (F.col("ctp") - F.col("tp") + (F.col("tp") + 1) / 2.0).alias(
                f"rg1{suffix}"
            ),
            (F.col("ctn") - F.col("tn") + (F.col("tn") + 1) / 2.0).alias(
                f"rg0{suffix}"
            ),
        )

    v = (
        base.join(midranks("sa", "a"), "sa")
        .join(midranks("sb", "b"), "sb")
        .crossJoin(F.broadcast(nn))
        .select(
            "y",
            F.when(
                F.col("y") == 1,
                (F.col("ra") - F.col("rg1a")) / F.col("ng"),
            )
            .otherwise(1.0 - (F.col("ra") - F.col("rg0a")) / F.col("np"))
            .alias("va"),
            F.when(
                F.col("y") == 1,
                (F.col("rb") - F.col("rg1b")) / F.col("ng"),
            )
            .otherwise(1.0 - (F.col("rb") - F.col("rg0b")) / F.col("np"))
            .alias("vb"),
        )
    )
    pos_a = F.when(F.col("y") == 1, F.col("va"))
    pos_b = F.when(F.col("y") == 1, F.col("vb"))
    neg_a = F.when(F.col("y") == 0, F.col("va"))
    neg_b = F.when(F.col("y") == 0, F.col("vb"))
    m = v.agg(
        F.avg(pos_a).alias("aa"),
        F.avg(pos_b).alias("ab"),
        F.var_samp(pos_a).alias("s10a"),
        F.var_samp(pos_b).alias("s10b"),
        F.covar_samp(pos_a, pos_b).alias("s10ab"),
        F.var_samp(neg_a).alias("s01a"),
        F.var_samp(neg_b).alias("s01b"),
        F.covar_samp(neg_a, neg_b).alias("s01ab"),
    )
    se = F.sqrt(
        (F.col("s10a") + F.col("s10b") - 2 * F.col("s10ab")) / F.col("np")
        + (F.col("s01a") + F.col("s01b") - 2 * F.col("s01ab")) / F.col("ng")
    )
    return m.crossJoin(F.broadcast(nn)).select(
        F.round(F.col("aa") * 1000000).cast("long").alias("auc_price_ppm"),
        F.round(F.col("ab") * 1000000).cast("long").alias("auc_recency_ppm"),
        F.round((F.col("aa") - F.col("ab")) * 1000000).cast("long").alias(
            "diff_ppm"
        ),
        F.round(se * 1000000).cast("long").alias("se_diff_micro"),
        F.round((F.col("aa") - F.col("ab")) / se * 1000).cast("long").alias(
            "z_milli"
        ),
    )


_DFG_SQL = """
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ), df AS (
        SELECT prev_type AS a, event_type AS b,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ), types AS (SELECT DISTINCT event_type AS t FROM events
    ), grid AS (
        SELECT x.t AS a, y.t AS b FROM types x CROSS JOIN types y
    ), m AS (
        SELECT g.a, g.b,
               COALESCE(fwd.n, 0) AS ab, COALESCE(rev.n, 0) AS ba
        FROM grid g
        LEFT JOIN df fwd ON fwd.a = g.a AND fwd.b = g.b
        LEFT JOIN df rev ON rev.a = g.b AND rev.b = g.a
    )
"""


@query(
    "alpha_footprint_matrix",
    oracle=_DFG_SQL
    + """
    SELECT a AS type_a, b AS type_b,
           CAST(ab AS BIGINT) AS df_ab, CAST(ba AS BIGINT) AS df_ba,
           CASE WHEN ab > 0 AND ba > 0 THEN 'parallel'
                WHEN ab > 0 THEN 'causal'
                WHEN ba > 0 THEN 'inverse'
                ELSE 'choice' END AS relation
    FROM m
    """,
)
def alpha_footprint_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alpha-miner footprint matrix over the event log: every ordered
    pair of event types is classified from the directly-follows
    relation (traces = per-user event streams ordered by ts,
    event_id) as causal (a -> b observed, never b -> a), inverse,
    parallel (both directions seen — concurrent activities), or
    choice (never adjacent). The footprint is step one of the alpha
    process-discovery algorithm and the qualitative summary of
    `event_transition_matrix` — the full grid, including the
    never-observed cells that the raw count matrix omits.

    Determinism: the trace order has a total tie-break; the
    classification is integer threshold logic on exact counts.

    Scale shape: one LAG window per user partition, one hash agg to
    the type-pair counts (type cardinality is tiny), and the grid
    completion is a broadcast cross join of the distinct-type
    relation against itself.
    """
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    df = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("a"), F.col("event_type").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    df = _ckpt(df)  # shared fan-out relation
    types = ev.select(F.col("event_type").alias("t")).distinct()
    types = _ckpt(types)  # shared fan-out relation
    grid = types.select(F.col("t").alias("a")).crossJoin(
        types.select(F.col("t").alias("b"))
    )
    fwd = df.select(F.col("a"), F.col("b"), F.col("n").alias("ab_n"))
    rev = df.select(
        F.col("b").alias("a"), F.col("a").alias("b"), F.col("n").alias("ba_n")
    )
    m = (
        grid.join(F.broadcast(fwd), ["a", "b"], "left")
        .join(F.broadcast(rev), ["a", "b"], "left")
        .select(
            "a",
            "b",
            F.coalesce("ab_n", F.lit(0)).cast("long").alias("ab"),
            F.coalesce("ba_n", F.lit(0)).cast("long").alias("ba"),
        )
    )
    return m.select(
        F.col("a").alias("type_a"),
        F.col("b").alias("type_b"),
        F.col("ab").alias("df_ab"),
        F.col("ba").alias("df_ba"),
        F.when((F.col("ab") > 0) & (F.col("ba") > 0), "parallel")
        .when(F.col("ab") > 0, "causal")
        .when(F.col("ba") > 0, "inverse")
        .otherwise("choice")
        .alias("relation"),
    )


@query(
    "heuristic_dependency_measure",
    oracle=_DFG_SQL
    + """
    SELECT a AS type_a, b AS type_b,
           CAST(ab AS BIGINT) AS df_ab, CAST(ba AS BIGINT) AS df_ba,
           CAST(ROUND(CASE WHEN a = b
                THEN ab * 1000.0 / (ab + 1)
                ELSE (ab - ba) * 1000.0 / (ab + ba + 1) END) AS BIGINT)
               AS dependency_milli,
           CAST(CASE WHEN a <> b
                     AND (ab - ba) * 1000.0 / (ab + ba + 1) >= 700
                THEN 1 ELSE 0 END AS BIGINT) AS is_dependency_edge
    FROM m
    """,
)
def heuristic_dependency_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristics-miner dependency measure over the same
    directly-follows grid as `alpha_footprint_matrix`: for a <> b,
    dep(a,b) = (|a>b| - |b>a|) / (|a>b| + |b>a| + 1) in [-1, 1] —
    frequency-aware causality that one noisy reverse transition
    cannot flip (the alpha footprint's known fragility) — and the
    Laplace-damped self-loop measure |a>a| / (|a>a| + 1) on the
    diagonal. Edges with dep >= 0.7 (the textbook default) are
    flagged as the discovered dependency graph.

    Determinism: exact integer counts, one ratio rounded to milli;
    the 0.7 threshold compares the same IEEE expression both sides.

    Scale shape: identical machinery to the footprint query — window,
    tiny hash agg, broadcast grid completion; per-pair math is
    stateless.
    """
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    df = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("a"), F.col("event_type").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    df = _ckpt(df)  # shared fan-out relation
    types = ev.select(F.col("event_type").alias("t")).distinct()
    types = _ckpt(types)  # shared fan-out relation
    grid = types.select(F.col("t").alias("a")).crossJoin(
        types.select(F.col("t").alias("b"))
    )
    fwd = df.select(F.col("a"), F.col("b"), F.col("n").alias("ab_n"))
    rev = df.select(
        F.col("b").alias("a"), F.col("a").alias("b"), F.col("n").alias("ba_n")
    )
    m = (
        grid.join(F.broadcast(fwd), ["a", "b"], "left")
        .join(F.broadcast(rev), ["a", "b"], "left")
        .select(
            "a",
            "b",
            F.coalesce("ab_n", F.lit(0)).cast("long").alias("ab"),
            F.coalesce("ba_n", F.lit(0)).cast("long").alias("ba"),
        )
    )
    dep = F.when(
        F.col("a") == F.col("b"), F.col("ab") * 1000.0 / (F.col("ab") + 1)
    ).otherwise(
        (F.col("ab") - F.col("ba")) * 1000.0 / (F.col("ab") + F.col("ba") + 1)
    )
    return m.select(
        F.col("a").alias("type_a"),
        F.col("b").alias("type_b"),
        F.col("ab").alias("df_ab"),
        F.col("ba").alias("df_ba"),
        F.round(dep).cast("long").alias("dependency_milli"),
        F.when(
            (F.col("a") != F.col("b"))
            & (
                (F.col("ab") - F.col("ba"))
                * 1000.0
                / (F.col("ab") + F.col("ba") + 1)
                >= 700
            ),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("is_dependency_edge"),
    )


_DAILY_OLS_SQL = """
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(COUNT(*) AS BIGINT) AS x,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) * 1.0 / COUNT(*)
                   AS y
        FROM orders GROUP BY 1
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(x * 1.0) AS mx, AVG(y) AS my,
               SUM((x - (SELECT AVG(x * 1.0) FROM daily))
                   * (x - (SELECT AVG(x * 1.0) FROM daily))) AS sxx,
               SUM((x - (SELECT AVG(x * 1.0) FROM daily))
                   * (y - (SELECT AVG(y) FROM daily))) AS sxy
        FROM daily
    ), fit AS (
        SELECT daily.d, daily.x, daily.y, s.n, s.sxx,
               s.sxy / s.sxx AS b1,
               s.my - s.sxy / s.sxx * s.mx AS b0,
               daily.y - (s.my - s.sxy / s.sxx * s.mx)
                       - s.sxy / s.sxx * daily.x AS e,
               1.0 / s.n + (daily.x - s.mx) * (daily.x - s.mx) / s.sxx AS h
        FROM daily, s
    ), sse AS (
        SELECT SUM(e * e) AS sse, SUM((y - (SELECT my FROM s))
                                      * (y - (SELECT my FROM s))) AS sst
        FROM fit
    )
"""


@query(
    "cooks_distance_top_days",
    oracle=_DAILY_OLS_SQL
    + """
    , diag AS (
        SELECT f.d, f.x, f.e, f.h, f.n,
               sse.sse / (f.n - 2) AS s2,
               ((f.n - 2) * (sse.sse / (f.n - 2)) - f.e * f.e / (1.0 - f.h))
                   / (f.n - 3) AS s2i
        FROM fit f, sse
    ), scored AS (
        SELECT d, x,
               CAST(ROUND(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h))
                    * 1000000) AS BIGINT) AS cook_micro,
               CAST(ROUND(e / sqrt(s2i * (1.0 - h)) * 1000) AS BIGINT)
                   AS t_ext_milli
        FROM diag
    )
    SELECT d AS day, CAST(x AS BIGINT) AS n_orders, cook_micro, t_ext_milli
    FROM scored ORDER BY cook_micro DESC, d ASC LIMIT 10
    """,
)
def cooks_distance_top_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most influential days in the OLS regression of daily
    mean ticket on daily order volume, by Cook's distance
    D_i = e_i^2 h_i / (p s^2 (1-h_i)^2), with the externally
    studentized residual (leave-one-out variance s_(i)^2, the exact
    deletion formula — no refitting) alongside. Cook's D flags days
    that MOVE the fitted line (outlier x leverage), which residual
    screens like `mad_outliers_orders` cannot distinguish from mere
    vertical outliers.

    Determinism: x is an integer count, y a single division of exact
    cents; leverage, residuals, and both statistics are closed-form
    expressions of five global sums, micro/milli-rounded BEFORE the
    top-10 order-by (rounded-key + date tie-break keeps the limit
    engine-stable).

    Scale shape: one date agg collapses the fact table; the global
    sums are one scalar agg over the ~2.4k-day series broadcast back
    — every diagnostic is stateless per row after that, the exact
    deletion formulas replacing n refits.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            * 1.0
            / F.count(F.lit(1))
        ).alias("y"),
    )
    daily = _ckpt(daily)  # shared fan-out relation
    mm = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(F.col("x") * 1.0).alias("mx"),
        F.avg("y").alias("my"),
    )
    with_m = daily.crossJoin(F.broadcast(mm))
    s = with_m.groupBy("n", "mx", "my").agg(
        F.sum((F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx"))).alias("sxx"),
        F.sum((F.col("x") - F.col("mx")) * (F.col("y") - F.col("my"))).alias("sxy"),
    )
    fit = daily.crossJoin(F.broadcast(s)).select(
        "d",
        "x",
        "y",
        "n",
        "sxx",
        (
            F.col("y")
            - (F.col("my") - F.col("sxy") / F.col("sxx") * F.col("mx"))
            - F.col("sxy") / F.col("sxx") * F.col("x")
        ).alias("e"),
        (
            1.0 / F.col("n")
            + (F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx")) / F.col("sxx")
        ).alias("h"),
    )
    sse = fit.agg(F.sum(F.col("e") * F.col("e")).alias("sse"))
    diag = fit.crossJoin(F.broadcast(sse)).select(
        "d",
        "x",
        "e",
        "h",
        "n",
        (F.col("sse") / (F.col("n") - 2)).alias("s2"),
        (
            (
                (F.col("n") - 2) * (F.col("sse") / (F.col("n") - 2))
                - F.col("e") * F.col("e") / (1.0 - F.col("h"))
            )
            / (F.col("n") - 3)
        ).alias("s2i"),
    )
    scored = diag.select(
        "d",
        "x",
        F.round(
            F.col("e")
            * F.col("e")
            * F.col("h")
            / (2.0 * F.col("s2") * (1.0 - F.col("h")) * (1.0 - F.col("h")))
            * 1000000
        )
        .cast("long")
        .alias("cook_micro"),
        F.round(
            F.col("e") / F.sqrt(F.col("s2i") * (1.0 - F.col("h"))) * 1000
        )
        .cast("long")
        .alias("t_ext_milli"),
    )
    return (
        scored.orderBy(F.desc("cook_micro"), F.asc("d"))
        .limit(10)
        .select(
            F.col("d").alias("day"),
            F.col("x").cast("long").alias("n_orders"),
            "cook_micro",
            "t_ext_milli",
        )
    )


@query(
    "press_loocv_r2",
    oracle=_DAILY_OLS_SQL
    + """
    , p AS (
        SELECT f.n,
               SUM((f.e / (1.0 - f.h)) * (f.e / (1.0 - f.h))) AS press,
               MAX(f.h) AS max_h, SUM(f.h) AS sum_h
        FROM fit f GROUP BY f.n
    )
    SELECT p.n AS n_days,
           CAST(ROUND((1.0 - sse.sse / sse.sst) * 1000) AS BIGINT) AS r2_milli,
           CAST(ROUND((1.0 - p.press / sse.sst) * 1000) AS BIGINT)
               AS r2_pred_milli,
           CAST(ROUND(p.max_h * 1000000) AS BIGINT) AS max_hat_micro,
           CAST(ROUND(p.sum_h * 1000) AS BIGINT) AS trace_hat_milli
    FROM p, sse
    """,
)
def press_loocv_r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRESS statistic and predicted R-squared for the daily
    ticket-on-volume regression: each day's leave-one-out prediction
    error is the exact deletion residual e_i / (1 - h_i), so
    PRESS = sum of their squares and R2_pred = 1 - PRESS/SST measure
    how the line generalizes WITHOUT refitting n models — the honest
    counterpart of in-sample R2 (R2_pred < R2 always; a large gap is
    the overfit-to-influential-days signal that
    `cooks_distance_top_days` localizes). The hat-matrix trace
    (= p = 2 exactly, pinned in tests) validates the leverage
    computation.

    Determinism: same five-sum closed forms as the Cook query; three
    rounded outputs.

    Scale shape: identical — fact agg to days, one scalar agg of
    global sums, one stateless pass, one final scalar agg.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            * 1.0
            / F.count(F.lit(1))
        ).alias("y"),
    )
    mm = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(F.col("x") * 1.0).alias("mx"),
        F.avg("y").alias("my"),
    )
    with_m = daily.crossJoin(F.broadcast(mm))
    s = with_m.groupBy("n", "mx", "my").agg(
        F.sum((F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx"))).alias("sxx"),
        F.sum((F.col("x") - F.col("mx")) * (F.col("y") - F.col("my"))).alias("sxy"),
    )
    fit = daily.crossJoin(F.broadcast(s)).select(
        "d",
        "n",
        (
            F.col("y")
            - (F.col("my") - F.col("sxy") / F.col("sxx") * F.col("mx"))
            - F.col("sxy") / F.col("sxx") * F.col("x")
        ).alias("e"),
        (
            1.0 / F.col("n")
            + (F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx")) / F.col("sxx")
        ).alias("h"),
        (F.col("y") - F.col("my")).alias("dy"),
    )
    agg = fit.groupBy("n").agg(
        F.sum(F.col("e") * F.col("e")).alias("sse"),
        F.sum(F.col("dy") * F.col("dy")).alias("sst"),
        F.sum(
            (F.col("e") / (1.0 - F.col("h"))) * (F.col("e") / (1.0 - F.col("h")))
        ).alias("press"),
        F.max("h").alias("max_h"),
        F.sum("h").alias("sum_h"),
    )
    return agg.select(
        F.col("n").alias("n_days"),
        F.round((1.0 - F.col("sse") / F.col("sst")) * 1000).cast("long").alias(
            "r2_milli"
        ),
        F.round((1.0 - F.col("press") / F.col("sst")) * 1000)
        .cast("long")
        .alias("r2_pred_milli"),
        F.round(F.col("max_h") * 1000000).cast("long").alias("max_hat_micro"),
        F.round(F.col("sum_h") * 1000).cast("long").alias("trace_hat_milli"),
    )


_REGION_EDGE_SQL = """
    WITH flows AS (
        SELECT sn.n_regionkey AS u, cn.n_regionkey AS v,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS f
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        WHERE sn.n_regionkey <> cn.n_regionkey
        GROUP BY 1, 2
    ), tot AS (SELECT CAST(SUM(f) AS BIGINT) AS tf FROM flows
    ), e AS (
        SELECT u, v,
               CAST(ROUND(-ln(CAST(f AS DOUBLE) / tf) * 1000000) AS BIGINT)
                   AS w
        FROM flows, tot
    )
"""


@query(
    "held_karp_region_tour",
    oracle=_REGION_EDGE_SQL
    + """
    , s1 AS (
        SELECT CAST(1 << (v - 1) AS BIGINT) AS mask, v AS last, w AS cost
        FROM e WHERE u = 0
    ), s2 AS (
        SELECT s.mask | (1 << (e.v - 1)) AS mask, e.v AS last,
               MIN(s.cost + e.w) AS cost
        FROM s1 s JOIN e ON e.u = s.last AND e.v <> 0
          AND (s.mask & (1 << (e.v - 1))) = 0
        GROUP BY 1, 2
    ), s3 AS (
        SELECT s.mask | (1 << (e.v - 1)) AS mask, e.v AS last,
               MIN(s.cost + e.w) AS cost
        FROM s2 s JOIN e ON e.u = s.last AND e.v <> 0
          AND (s.mask & (1 << (e.v - 1))) = 0
        GROUP BY 1, 2
    ), s4 AS (
        SELECT s.mask | (1 << (e.v - 1)) AS mask, e.v AS last,
               MIN(s.cost + e.w) AS cost
        FROM s3 s JOIN e ON e.u = s.last AND e.v <> 0
          AND (s.mask & (1 << (e.v - 1))) = 0
        GROUP BY 1, 2
    ), tours AS (
        SELECT s.cost + e.w AS tc
        FROM s4 s JOIN e ON e.u = s.last AND e.v = 0
        WHERE s.mask = 15
    )
    SELECT CAST(5 AS BIGINT) AS n_regions,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT MIN(tc) FROM tours) AS BIGINT)
               AS tsp_cost_micro_nats,
           CAST((SELECT COUNT(*) FROM tours) AS BIGINT) AS n_complete_tours
    """,
)
def held_karp_region_tour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact traveling-salesman tour over the 5 trade regions by
    Held-Karp dynamic programming: edge cost u -> v is the -ln share
    of inter-region trade flow (micro-nats — cheap edge = thick trade
    channel), and the DP over (visited-subset, last-region) states
    finds the cheapest directed circuit through all five regions from
    region 0. The subset lattice is walked in four explicit stages
    (subset sizes 1-4) plus the closing edge — exact, not heuristic,
    because the region count is schema-fixed.

    Determinism: integer micro-nat edge weights; the DP is min over
    integer sums; bitmask arithmetic is identical in both dialects.

    Scale shape: the fact table collapses to a 20-edge region graph
    in one aggregate pass; the DP states number 4 * 2^4 at most, so
    every stage is a toy join — the 100-TB cost is entirely the first
    agg, which is the same shuffle any region rollup pays.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    nreg = nat.select("n_nationkey", "n_regionkey")
    flows = (
        li.join(
            F.broadcast(
                s.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")
            ),
            "l_suppkey",
        )
        .join(
            F.broadcast(
                nreg.select(
                    F.col("n_nationkey").alias("s_nationkey"),
                    F.col("n_regionkey").alias("u"),
                )
            ),
            "s_nationkey",
        )
        .join(
            o.select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"),
            "l_orderkey",
        )
        .join(
            F.broadcast(
                cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .join(
            F.broadcast(
                nreg.select(
                    F.col("n_nationkey").alias("c_nationkey"),
                    F.col("n_regionkey").alias("v"),
                )
            ),
            "c_nationkey",
        )
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("f")
        )
    )
    tot = flows.agg(F.sum("f").cast("long").alias("tf"))
    e = flows.crossJoin(F.broadcast(tot)).select(
        "u",
        "v",
        F.round(-F.log(F.col("f").cast("double") / F.col("tf")) * 1000000)
        .cast("long")
        .alias("w"),
    ).withColumn(
        "vbit",
        F.when(F.col("v") > 0, F.expr("cast(shiftleft(1, cast(v - 1 as int)) as bigint)")).otherwise(F.lit(0)),
    ).transform(_ckpt)
    st = e.where(F.col("u") == 0).select(
        F.col("vbit").alias("mask"),
        F.col("v").alias("last"),
        F.col("w").alias("cost"),
    )
    for _ in range(3):
        sx = st.alias("s")
        ex = e.alias("e")
        st = (
            sx.join(
                ex,
                (F.col("e.u") == F.col("s.last"))
                & (F.col("e.v") != 0)
                & (F.col("s.mask").bitwiseAND(F.col("e.vbit")) == 0),
            )
            .groupBy(
                F.col("s.mask").bitwiseOR(F.col("e.vbit")).alias("mask"),
                F.col("e.v").alias("last"),
            )
            .agg(F.min(F.col("s.cost") + F.col("e.w")).alias("cost"))
            .transform(_ckpt)
        )
    sx = st.alias("s")
    ex = e.alias("e")
    tours = sx.join(
        ex,
        (F.col("e.u") == F.col("s.last"))
        & (F.col("e.v") == 0)
        & (F.col("s.mask") == 15),
    ).select((F.col("s.cost") + F.col("e.w")).alias("tc"))
    ne = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    ts = tours.agg(
        F.min("tc").cast("long").alias("tsp_cost_micro_nats"),
        F.count(F.lit(1)).cast("long").alias("n_complete_tours"),
    )
    return ne.crossJoin(F.broadcast(ts)).select(
        F.lit(5).cast("long").alias("n_regions"),
        "n_edges",
        "tsp_cost_micro_nats",
        "n_complete_tours",
    )


@query(
    "karp_min_mean_cycle",
    oracle=_REGION_EDGE_SQL
    + """
    , d0 AS (
        SELECT r_regionkey AS v, CAST(CASE WHEN r_regionkey = 0 THEN 0 END
                                      AS BIGINT) AS d
        FROM region
    ), d1 AS (
        SELECT e.v, MIN(d0.d + e.w) AS d FROM d0 JOIN e ON e.u = d0.v
        WHERE d0.d IS NOT NULL GROUP BY 1
    ), d1f AS (
        SELECT r_regionkey AS v,
               (SELECT d FROM d1 WHERE d1.v = r_regionkey) AS d
        FROM region
    ), d2 AS (
        SELECT e.v, MIN(d1f.d + e.w) AS d FROM d1f JOIN e ON e.u = d1f.v
        WHERE d1f.d IS NOT NULL GROUP BY 1
    ), d2f AS (
        SELECT r_regionkey AS v,
               (SELECT d FROM d2 WHERE d2.v = r_regionkey) AS d
        FROM region
    ), d3 AS (
        SELECT e.v, MIN(d2f.d + e.w) AS d FROM d2f JOIN e ON e.u = d2f.v
        WHERE d2f.d IS NOT NULL GROUP BY 1
    ), d3f AS (
        SELECT r_regionkey AS v,
               (SELECT d FROM d3 WHERE d3.v = r_regionkey) AS d
        FROM region
    ), d4 AS (
        SELECT e.v, MIN(d3f.d + e.w) AS d FROM d3f JOIN e ON e.u = d3f.v
        WHERE d3f.d IS NOT NULL GROUP BY 1
    ), d4f AS (
        SELECT r_regionkey AS v,
               (SELECT d FROM d4 WHERE d4.v = r_regionkey) AS d
        FROM region
    ), d5 AS (
        SELECT e.v, MIN(d4f.d + e.w) AS d FROM d4f JOIN e ON e.u = d4f.v
        WHERE d4f.d IS NOT NULL GROUP BY 1
    ), lvl AS (
        SELECT v, 0 AS k, d FROM d0 WHERE d IS NOT NULL
        UNION ALL SELECT v, 1, d FROM d1
        UNION ALL SELECT v, 2, d FROM d2
        UNION ALL SELECT v, 3, d FROM d3
        UNION ALL SELECT v, 4, d FROM d4
    ), ratios AS (
        SELECT lvl.v, MAX((d5.d - lvl.d) * 1.0 / (5 - lvl.k)) AS r
        FROM d5 JOIN lvl ON lvl.v = d5.v
        GROUP BY lvl.v
    ), two AS (
        SELECT MIN((a.w + b.w) / 2.0) AS t2
        FROM e a JOIN e b ON b.u = a.v AND b.v = a.u
    )
    SELECT CAST(ROUND((SELECT MIN(r) FROM ratios)) AS BIGINT)
               AS min_mean_cycle_micro,
           CAST(ROUND(two.t2) AS BIGINT) AS best_2cycle_mean_micro
    FROM two
    """,
)
def karp_min_mean_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Karp's minimum mean cycle on the region trade-cost digraph:
    with d_k(v) = cheapest k-edge walk cost from region 0, the theorem
    gives mu* = min_v max_k (d_5(v) - d_k(v)) / (5 - k) — the cycle
    with the lowest average micro-nat cost per hop, i.e. the most
    self-reinforcing trade loop (were costs log exchange rates, mu* <
    0 would be arbitrage). Reported with the best 2-cycle mean, the
    naive bound mu* can only improve on (pinned by the invariant
    test). The walk-length recursion is unrolled exactly n = 5 times —
    Karp needs d_0..d_n, no convergence loop.

    Determinism: integer walk costs; the k ratios are single IEEE
    divisions of identical integers; min/max over them is exact.

    Scale shape: one fact agg to 20 edges; five relax joins over a
    5-node distance vector; the ratio lattice is 25 rows. As with
    `bellman_ford_trade_costs`, the only scale cost is the first
    aggregate shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    nreg = nat.select("n_nationkey", "n_regionkey")
    flows = (
        li.join(
            F.broadcast(
                s.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")
            ),
            "l_suppkey",
        )
        .join(
            F.broadcast(
                nreg.select(
                    F.col("n_nationkey").alias("s_nationkey"),
                    F.col("n_regionkey").alias("u"),
                )
            ),
            "s_nationkey",
        )
        .join(
            o.select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"),
            "l_orderkey",
        )
        .join(
            F.broadcast(
                cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .join(
            F.broadcast(
                nreg.select(
                    F.col("n_nationkey").alias("c_nationkey"),
                    F.col("n_regionkey").alias("v"),
                )
            ),
            "c_nationkey",
        )
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("f")
        )
    )
    tot = flows.agg(F.sum("f").cast("long").alias("tf"))
    e = flows.crossJoin(F.broadcast(tot)).select(
        "u",
        "v",
        F.round(-F.log(F.col("f").cast("double") / F.col("tf")) * 1000000)
        .cast("long")
        .alias("w"),
    ).transform(_ckpt)
    verts = reg.select(F.col("r_regionkey").alias("v"))
    d = verts.select(
        "v", F.when(F.col("v") == 0, F.lit(0)).cast("long").alias("d")
    )
    lvls = [d.where(F.col("d").isNotNull()).select("v", F.lit(0).alias("k"), "d")]
    for k in range(1, 6):
        dx = d.alias("d")
        ex = e.alias("e")
        nxt = (
            dx.where(F.col("d.d").isNotNull())
            .join(ex, F.col("e.u") == F.col("d.v"))
            .groupBy(F.col("e.v").alias("v"))
            .agg(F.min(F.col("d.d") + F.col("e.w")).alias("d"))
        )
        d = (
            verts.join(nxt, "v", "left")
            .select("v", "d")
            .transform(_ckpt)
        )
        if k < 5:
            lvls.append(
                d.where(F.col("d").isNotNull()).select(
                    "v", F.lit(k).alias("k"), "d"
                )
            )
    lvl = lvls[0]
    for x in lvls[1:]:
        lvl = lvl.unionAll(x)
    d5 = d.where(F.col("d").isNotNull()).select(
        F.col("v"), F.col("d").alias("d5")
    )
    ratios = (
        d5.join(lvl, "v")
        .groupBy("v")
        .agg(
            F.max((F.col("d5") - F.col("d")) * 1.0 / (5 - F.col("k"))).alias("r")
        )
    )
    a = e.alias("a")
    b = e.alias("b")
    two = a.join(
        b, (F.col("b.u") == F.col("a.v")) & (F.col("b.v") == F.col("a.u"))
    ).agg(F.min((F.col("a.w") + F.col("b.w")) / 2.0).alias("t2"))
    mu = ratios.agg(F.min("r").alias("mu"))
    return mu.crossJoin(F.broadcast(two)).select(
        F.round(F.col("mu")).cast("long").alias("min_mean_cycle_micro"),
        F.round(F.col("t2")).cast("long").alias("best_2cycle_mean_micro"),
    )


@query(
    "wagner_whitin_lot_sizing",
    oracle="""
    WITH mon AS (
        SELECT (EXTRACT(year FROM l_shipdate) - 1992) * 12
               + EXTRACT(month FROM l_shipdate) - 1 AS m,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
        FROM lineitem GROUP BY 1
    ), tt AS (SELECT CAST(MAX(m) + 1 AS BIGINT) AS t FROM mon
    ), pref AS (
        SELECT m,
               CAST(SUM(d) OVER (ORDER BY m) AS BIGINT) AS d1,
               CAST(SUM(d * m) OVER (ORDER BY m) AS BIGINT) AS d2
        FROM mon
    ), pref0 AS (
        SELECT CAST(-1 AS BIGINT) AS m, CAST(0 AS BIGINT) AS d1,
               CAST(0 AS BIGINT) AS d2
        UNION ALL SELECT m, d1, d2 FROM pref
    ), edges AS MATERIALIZED (
        -- order at period lo.m+1 covering through hi.m:
        -- setup 50000 + 10 * sum_{j..t} d_m (m - j)
        SELECT lo.m + 1 AS u, hi.m + 1 AS v,
               50000 + 10 * ((hi.d2 - lo.d2) - (lo.m + 1) * (hi.d1 - lo.d1))
                   AS c
        FROM pref0 lo JOIN pref hi ON hi.m > lo.m
    ), m1 AS MATERIALIZED (
        SELECT u, v, MIN(c) AS c FROM edges GROUP BY 1, 2
    ), m2 AS MATERIALIZED (
        SELECT q.u, q.v, MIN(q.c) AS c FROM (
            SELECT x.u, y.v, x.c + y.c AS c
            FROM m1 x JOIN m1 y ON y.u = x.v
            UNION ALL SELECT u, v, c FROM m1
        ) q GROUP BY 1, 2
    ), m4 AS MATERIALIZED (
        SELECT q.u, q.v, MIN(q.c) AS c FROM (
            SELECT x.u, y.v, x.c + y.c AS c
            FROM m2 x JOIN m2 y ON y.u = x.v
            UNION ALL SELECT u, v, c FROM m2
        ) q GROUP BY 1, 2
    ), m8 AS MATERIALIZED (
        SELECT q.u, q.v, MIN(q.c) AS c FROM (
            SELECT x.u, y.v, x.c + y.c AS c
            FROM m4 x JOIN m4 y ON y.u = x.v
            UNION ALL SELECT u, v, c FROM m4
        ) q GROUP BY 1, 2
    ), m16 AS MATERIALIZED (
        SELECT q.u, q.v, MIN(q.c) AS c FROM (
            SELECT x.u, y.v, x.c + y.c AS c
            FROM m8 x JOIN m8 y ON y.u = x.v
            UNION ALL SELECT u, v, c FROM m8
        ) q GROUP BY 1, 2
    ), m32 AS MATERIALIZED (
        SELECT q.u, q.v, MIN(q.c) AS c FROM (
            SELECT x.u, y.v, x.c + y.c AS c
            FROM m16 x JOIN m16 y ON y.u = x.v
            UNION ALL SELECT u, v, c FROM m16
        ) q GROUP BY 1, 2
    ), m64 AS MATERIALIZED (
        SELECT q.u, q.v, MIN(q.c) AS c FROM (
            SELECT x.u, y.v, x.c + y.c AS c
            FROM m32 x JOIN m32 y ON y.u = x.v
            UNION ALL SELECT u, v, c FROM m32
        ) q GROUP BY 1, 2
    ), m128 AS MATERIALIZED (
        SELECT q.u, q.v, MIN(q.c) AS c FROM (
            SELECT x.u, y.v, x.c + y.c AS c
            FROM m64 x JOIN m64 y ON y.u = x.v
            UNION ALL SELECT u, v, c FROM m64
        ) q GROUP BY 1, 2
    )
    SELECT tt.t AS n_periods,
           CAST((SELECT c FROM m128, tt WHERE u = 0 AND v = tt.t) AS BIGINT)
               AS ww_optimal_cents,
           CAST((SELECT c FROM m1, tt WHERE u = 0 AND v = tt.t) AS BIGINT)
               AS single_order_cents,
           CAST(tt.t * 50000 AS BIGINT) AS order_every_period_cents
    FROM tt
    """,
)
def wagner_whitin_lot_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wagner-Whitin optimal lot sizing over the monthly shipped-
    quantity series: each order placed in period j covering demand
    through t costs setup 50000 + 10 per unit-month of holding, and
    the optimal plan is the shortest path 0 -> T in the DAG whose
    edge (j-1, t) is that interval cost (holding computed from exact
    demand prefix sums). The DP recurrence is solved by min-plus
    matrix squaring — seven doublings cover paths of length 128 > T —
    instead of the textbook's T sequential Bellman steps. Reported
    against the two natural policy bounds (one giant order; an order
    every period), both of which the optimum must not exceed.

    Determinism: demands, prefix sums, and interval costs are exact
    integers; min-plus closure is integer arithmetic throughout.

    Scale shape: one fact agg to <=84 monthly rows; edges are a
    triangular self-join of the prefix relation (~3.5k rows); each
    squaring is a tiny join, log2(T) of them — the same
    sequential-DP-to-log-rounds rewrite as `minplus_diameter_trade`.
    """
    li = load_table(spark, sf_dir, "lineitem")
    mon = li.groupBy(
        (
            (F.year("l_shipdate") - 1992) * 12 + F.month("l_shipdate") - 1
        ).cast("long").alias("m")
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("d"))
    mon = _ckpt(mon)  # ≤84-row monthly agg fans out (tt / prefix walk)
    tt = mon.agg((F.max("m") + 1).cast("long").alias("t"))
    w = Window.orderBy("m")
    pref = mon.select(
        "m",
        F.sum("d").over(w).cast("long").alias("d1"),
        F.sum(F.col("d") * F.col("m")).over(w).cast("long").alias("d2"),
    )
    pref = _ckpt(pref)  # shared fan-out relation (pref0 / hi side)
    pref0 = pref.unionAll(
        pref.limit(1).select(
            F.lit(-1).cast("long").alias("m"),
            F.lit(0).cast("long").alias("d1"),
            F.lit(0).cast("long").alias("d2"),
        )
    )
    lo = pref0.alias("lo")
    hi = pref.alias("hi")
    edges = lo.join(hi, F.col("hi.m") > F.col("lo.m")).select(
        (F.col("lo.m") + 1).alias("u"),
        (F.col("hi.m") + 1).alias("v"),
        (
            F.lit(50000)
            + 10
            * (
                (F.col("hi.d2") - F.col("lo.d2"))
                - (F.col("lo.m") + 1) * (F.col("hi.d1") - F.col("lo.d1"))
            )
        ).alias("c"),
    )
    m0 = edges.groupBy("u", "v").agg(F.min("c").alias("c")).transform(_ckpt)
    m = m0
    for _ in range(7):
        x = m.alias("x")
        y = m.alias("y")
        sq = (
            x.join(y, F.col("y.u") == F.col("x.v"))
            .select(
                F.col("x.u").alias("u"),
                F.col("y.v").alias("v"),
                (F.col("x.c") + F.col("y.c")).alias("c"),
            )
        )
        m = (
            m.unionAll(sq)
            .groupBy("u", "v")
            .agg(F.min("c").alias("c"))
            .transform(_ckpt)
        )
    # the single-order bound needs the LENGTH-1 cost matrix — that is
    # exactly m0 (the pre-squaring checkpoint); recomputing it from
    # edges was a verbatim duplicate subtree re-running the fact agg
    e1 = m0
    opt = (
        m.crossJoin(F.broadcast(tt))
        .where((F.col("u") == 0) & (F.col("v") == F.col("t")))
        .select(F.col("c").alias("ww_optimal_cents"), "t")
    )
    single = (
        e1.crossJoin(F.broadcast(tt))
        .where((F.col("u") == 0) & (F.col("v") == F.col("t")))
        .select(F.col("c").alias("single_order_cents"))
    )
    return opt.crossJoin(F.broadcast(single)).select(
        F.col("t").alias("n_periods"),
        F.col("ww_optimal_cents").cast("long"),
        F.col("single_order_cents").cast("long"),
        (F.col("t") * 50000).cast("long").alias("order_every_period_cents"),
    )


@query(
    "inspection_paradox_audit",
    oracle="""
    WITH gaps AS (
        SELECT CAST(epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS DOUBLE) AS g
        FROM events
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(g) AS mu,
               AVG(g * g) AS m2
        FROM gaps WHERE g IS NOT NULL
    )
    SELECT n AS n_gaps,
           CAST(ROUND(mu) AS BIGINT) AS mean_gap_ms,
           CAST(ROUND(m2 / mu) AS BIGINT) AS length_biased_mean_ms,
           CAST(ROUND(m2 / (2 * mu)) AS BIGINT) AS random_incidence_wait_ms,
           CAST(ROUND(m2 / (mu * mu) * 1000) AS BIGINT) AS paradox_ratio_milli
    FROM s
    """,
)
def inspection_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Renewal-theory inspection paradox audit on per-user event
    inter-arrival gaps: the interval a random observer lands in has
    mean E[X^2]/E[X] (length-biased), not E[X], and the observer's
    expected wait to the next event is E[X^2]/(2 E[X]) — not E[X]/2.
    The paradox ratio E[X^2]/E[X]^2 = 1 + CV^2 quantifies the gap
    (exactly 2 for Poisson arrivals; the `burstiness_memory_coords`
    sibling expressed as the bias a naive latency SLA estimate
    suffers when sampled at random instants).

    Determinism: gaps are exact epoch-millisecond integer
    differences; the two moment means are single divisions of double
    sums whose order noise sits ~9 digits below the integer-ms
    rounding.

    Scale shape: one LAG window per user partition, one scalar
    moment agg — the whole audit is two shuffles regardless of log
    size.
    """
    ev = load_table(spark, sf_dir, "events")
    gaps = ev.select(
        (
            F.unix_millis(F.col("ts").cast("timestamp"))
            - F.lag(F.unix_millis(F.col("ts").cast("timestamp"))).over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            )
        )
        .cast("double")
        .alias("g")
    ).where(F.col("g").isNotNull())
    s = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("g").alias("mu"),
        F.avg(F.col("g") * F.col("g")).alias("m2"),
    )
    return s.select(
        F.col("n").alias("n_gaps"),
        F.round(F.col("mu")).cast("long").alias("mean_gap_ms"),
        F.round(F.col("m2") / F.col("mu")).cast("long").alias(
            "length_biased_mean_ms"
        ),
        F.round(F.col("m2") / (2 * F.col("mu"))).cast("long").alias(
            "random_incidence_wait_ms"
        ),
        F.round(F.col("m2") / (F.col("mu") * F.col("mu")) * 1000)
        .cast("long")
        .alias("paradox_ratio_milli"),
    )


@query(
    "markowitz_min_variance_pair",
    oracle="""
    WITH rday AS (
        SELECT o.o_orderdate AS d, n.n_regionkey AS r,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE n.n_regionkey IN (0, 1)
        GROUP BY 1, 2
    ), days AS (SELECT DISTINCT o_orderdate AS d FROM orders
    ), wide AS (
        SELECT days.d,
               COALESCE(MAX(CASE WHEN r = 0 THEN cents END), 0) * 1.0 AS x0,
               COALESCE(MAX(CASE WHEN r = 1 THEN cents END), 0) * 1.0 AS x1
        FROM days LEFT JOIN rday ON rday.d = days.d
        GROUP BY days.d
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               VAR_SAMP(x0) AS v0, VAR_SAMP(x1) AS v1,
               COVAR_SAMP(x0, x1) AS cv
        FROM wide
    ), wstar AS (
        SELECT n, v0, v1, cv,
               (v1 - cv) / (v0 + v1 - 2 * cv) AS w
        FROM s
    )
    SELECT n AS n_days,
           CAST(ROUND(w * 1000) AS BIGINT) AS w_star_milli,
           CAST(ROUND(cv / sqrt(v0 * v1) * 1000) AS BIGINT) AS corr_milli,
           CAST(ROUND((w * w * v0 + (1 - w) * (1 - w) * v1
                       + 2 * w * (1 - w) * cv)
                / (0.25 * v0 + 0.25 * v1 + 0.5 * cv) * 1000) AS BIGINT)
               AS minvar_vs_equal_milli,
           CAST(ROUND((w * w * v0 + (1 - w) * (1 - w) * v1
                       + 2 * w * (1 - w) * cv)
                / LEAST(v0, v1) * 1000) AS BIGINT) AS minvar_vs_best_single_milli
    FROM wstar
    """,
)
def markowitz_min_variance_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markowitz minimum-variance hedge between the daily revenue
    streams of regions 0 and 1: the closed-form optimal weight
    w* = (v1 - cov) / (v0 + v1 - 2 cov) and the resulting portfolio
    variance, expressed relative to the 50/50 mix and to the best
    single region. Both ratios are <= 1000 milli by optimality — the
    diversification dividend in one number, and the two-asset kernel
    of every hedged-exposure rollup.

    Determinism: daily revenues are exact cent sums zero-filled on
    the common calendar; variance/covariance are standard double
    aggregates whose summation noise sits far below the milli
    rounding of ratio outputs.

    Scale shape: one region-filtered fact agg to (day, region) cells,
    a conditional-pivot to the 2-column daily matrix, one scalar
    moment agg — no joins beyond the broadcast dimension chain.
    """
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    rday = (
        o.join(
            F.broadcast(
                cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .join(
            F.broadcast(
                nat.select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_regionkey"
                )
            ),
            "c_nationkey",
        )
        .where(F.col("n_regionkey").isin(0, 1))
        .groupBy(F.col("o_orderdate").alias("d"), F.col("n_regionkey").alias("r"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    days = o.select(F.col("o_orderdate").alias("d")).distinct()
    wide = (
        days.join(rday, "d", "left")
        .groupBy("d")
        .agg(
            (
                F.coalesce(
                    F.max(F.when(F.col("r") == 0, F.col("cents"))), F.lit(0)
                )
                * 1.0
            ).alias("x0"),
            (
                F.coalesce(
                    F.max(F.when(F.col("r") == 1, F.col("cents"))), F.lit(0)
                )
                * 1.0
            ).alias("x1"),
        )
    )
    s = wide.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.var_samp("x0").alias("v0"),
        F.var_samp("x1").alias("v1"),
        F.covar_samp("x0", "x1").alias("cv"),
    )
    w = (F.col("v1") - F.col("cv")) / (F.col("v0") + F.col("v1") - 2 * F.col("cv"))
    pv = (
        w * w * F.col("v0")
        + (1 - w) * (1 - w) * F.col("v1")
        + 2 * w * (1 - w) * F.col("cv")
    )
    return s.select(
        F.col("n").alias("n_days"),
        F.round(w * 1000).cast("long").alias("w_star_milli"),
        F.round(F.col("cv") / F.sqrt(F.col("v0") * F.col("v1")) * 1000)
        .cast("long")
        .alias("corr_milli"),
        F.round(
            pv
            / (0.25 * F.col("v0") + 0.25 * F.col("v1") + 0.5 * F.col("cv"))
            * 1000
        )
        .cast("long")
        .alias("minvar_vs_equal_milli"),
        F.round(pv / F.least("v0", "v1") * 1000)
        .cast("long")
        .alias("minvar_vs_best_single_milli"),
    )


@query(
    "inverse_vol_risk_parity",
    oracle="""
    WITH rday AS (
        SELECT o.o_orderdate AS d, n.n_regionkey AS r,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2
    ), days AS (SELECT DISTINCT o_orderdate AS d FROM orders
    ), grid AS (
        SELECT days.d, r.r_regionkey AS r FROM days CROSS JOIN region r
    ), filled AS (
        SELECT g.r, COALESCE(rday.cents, 0) * 1.0 AS x
        FROM grid g LEFT JOIN rday ON rday.d = g.d AND rday.r = g.r
    ), vol AS (
        SELECT r, sqrt(VAR_SAMP(x)) AS s FROM filled GROUP BY r
    ), tot AS (SELECT SUM(1.0 / s) AS ti FROM vol)
    SELECT CAST(vol.r AS BIGINT) AS region_key,
           CAST(ROUND(vol.s) AS BIGINT) AS daily_vol_cents,
           CAST(ROUND((1.0 / vol.s) / tot.ti * 1000000) AS BIGINT)
               AS weight_ppm,
           CAST(ROUND((1.0 / vol.s) / tot.ti * vol.s) AS BIGINT)
               AS risk_contrib_cents
    FROM vol, tot
    """,
)
def inverse_vol_risk_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-volatility risk-parity weights across the five regions'
    daily revenue streams: w_i proportional to 1/sigma_i, so every
    region contributes the SAME standalone risk w_i * sigma_i (the
    equalized `risk_contrib_cents` column — constant across rows up
    to rounding, pinned by the invariant test). The
    correlation-blind sibling of `markowitz_min_variance_pair`:
    parity needs only the diagonal of the covariance matrix, which is
    why it is the production default when cross-correlations are too
    noisy to estimate.

    Determinism: zero-filled exact cent series on the full
    day x region grid; per-region variance is a double agg; weights
    are single-division ratios rounded to ppm.

    Scale shape: one fact agg, one broadcast grid fill, one
    per-region moment agg — 5-row math after the single shuffle.
    """
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    rday = (
        o.join(
            F.broadcast(
                cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .join(
            F.broadcast(
                nat.select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_regionkey"
                )
            ),
            "c_nationkey",
        )
        .groupBy(F.col("o_orderdate").alias("d"), F.col("n_regionkey").alias("r"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    days = o.select(F.col("o_orderdate").alias("d")).distinct()
    grid = days.crossJoin(
        F.broadcast(reg.select(F.col("r_regionkey").alias("r")))
    )
    filled = grid.join(rday, ["d", "r"], "left").select(
        "r", (F.coalesce("cents", F.lit(0)) * 1.0).alias("x")
    )
    vol = filled.groupBy("r").agg(F.sqrt(F.var_samp("x")).alias("s"))
    vol = _ckpt(vol)  # shared fan-out relation
    tot = vol.agg(F.sum(1.0 / F.col("s")).alias("ti"))
    return vol.crossJoin(F.broadcast(tot)).select(
        F.col("r").cast("long").alias("region_key"),
        F.round(F.col("s")).cast("long").alias("daily_vol_cents"),
        F.round((1.0 / F.col("s")) / F.col("ti") * 1000000)
        .cast("long")
        .alias("weight_ppm"),
        F.round((1.0 / F.col("s")) / F.col("ti") * F.col("s"))
        .cast("long")
        .alias("risk_contrib_cents"),
    )


@query(
    "vmf_concentration_by_label",
    oracle="""
    WITH unitized AS (
        SELECT label,
               list_transform(embedding,
                   x -> CAST(x AS DOUBLE)
                        / sqrt(list_sum(list_transform(embedding,
                              y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))
                   AS u
        FROM embeddings
    ), comp AS (
        SELECT label, i, u[i] AS c
        FROM (SELECT label, u, unnest(generate_series(1, 64)) AS i
              FROM unitized)
    ), sums AS (
        SELECT label, i, SUM(c) AS s FROM comp GROUP BY 1, 2
    ), res AS (
        SELECT s.label, n.n, sqrt(SUM(s.s * s.s)) / n.n AS rbar
        FROM sums s JOIN (
            SELECT label, CAST(COUNT(*) AS BIGINT) AS n
            FROM embeddings GROUP BY 1
        ) n ON n.label = s.label
        GROUP BY s.label, n.n
    )
    SELECT CAST(label AS BIGINT) AS label, n AS n_vectors,
           CAST(ROUND(rbar * 1000000) AS BIGINT) AS rbar_micro,
           CAST(ROUND(rbar * (64 - rbar * rbar) / (1 - rbar * rbar) * 1000)
                AS BIGINT) AS kappa_milli
    FROM res
    """,
)
def vmf_concentration_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Von Mises-Fisher concentration estimate per embedding label:
    vectors are unit-normalized, the mean resultant length rbar =
    ||sum of unit vectors|| / n measures directional coherence on the
    63-sphere, and Banerjee's approximation kappa = rbar (d - rbar^2)
    / (1 - rbar^2) converts it to the vMF concentration parameter —
    the directional-statistics answer to "how tight is this label's
    cluster", complementing `centroid_silhouette_embedding`
    (separation) and `embedding_isotropy_score` (global spread):
    kappa is per-class tightness on the correct geometry for cosine
    similarity.

    Determinism: each vector's norm is an in-order list fold
    (identical sequential sums both engines); per-dimension resultant
    sums carry ~1e-15 order noise against micro/milli-rounded
    outputs.

    Scale shape: normalize is a stateless array map; the resultant
    is a (label, dim) hash agg over exploded components — 64 rows per
    label out of the shuffle regardless of corpus size.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    unitized = emb.select(
        "label",
        F.transform("embedding", lambda x: x.cast("double") / norm).alias("u"),
    )
    comp = unitized.select(
        "label", F.posexplode("u").alias("i", "c")
    )
    sums = comp.groupBy("label", "i").agg(F.sum("c").alias("s"))
    n = emb.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("n"))
    res = (
        sums.groupBy("label")
        .agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("r"))
        .join(F.broadcast(n), "label")
        .select("label", "n", (F.col("r") / F.col("n")).alias("rbar"))
    )
    return res.select(
        F.col("label").cast("long").alias("label"),
        F.col("n").alias("n_vectors"),
        F.round(F.col("rbar") * 1000000).cast("long").alias("rbar_micro"),
        F.round(
            F.col("rbar")
            * (64 - F.col("rbar") * F.col("rbar"))
            / (1 - F.col("rbar") * F.col("rbar"))
            * 1000
        )
        .cast("long")
        .alias("kappa_milli"),
    )


@query(
    "rayleigh_angle_uniformity",
    oracle="""
    WITH plane AS (
        SELECT label, CAST(embedding[1] AS DOUBLE) AS x,
               CAST(embedding[2] AS DOUBLE) AS y
        FROM embeddings
    ), dirs AS (
        SELECT label, x / sqrt(x * x + y * y) AS cx,
               y / sqrt(x * x + y * y) AS cy
        FROM plane WHERE x * x + y * y > 0
    ), s AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(cx) AS c, SUM(cy) AS sy
        FROM dirs GROUP BY 1
    )
    SELECT CAST(label AS BIGINT) AS label, n AS n_vectors,
           CAST(ROUND(sqrt(c * c + sy * sy) / n * 1000000) AS BIGINT)
               AS rbar_micro,
           CAST(ROUND((c * c + sy * sy) / n * 1000) AS BIGINT)
               AS rayleigh_z_milli,
           CAST(ROUND(atan2(sy, c) * 1000000) AS BIGINT)
               AS mean_angle_micro_rad
    FROM s
    """,
)
def rayleigh_angle_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rayleigh test of angular uniformity per label on the first two
    embedding dimensions: each vector's planar direction contributes
    a unit (cos, sin), the mean resultant length rbar measures
    circular concentration, and the Rayleigh statistic z = n *
    rbar^2 rejects uniformity when large (z ~ 1 for isotropic angles;
    under CSR 2z is asymptotically chi-square-2). Circular statistics
    in two dimensions — the projection-level companion of
    `vmf_concentration_by_label`'s full-sphere kappa, and together
    the anisotropy audit a PCA-whitening step should run first.

    Determinism: directions are single divisions of exact
    float32-to-double casts; resultant sums carry order noise far
    below the micro rounding; the mean angle is one atan2 on
    identical doubles.

    Scale shape: stateless projection + one per-label scalar agg —
    the cheapest query in the directional family by construction.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    plane = emb.select(
        "label",
        F.col("embedding").getItem(0).cast("double").alias("x"),
        F.col("embedding").getItem(1).cast("double").alias("y"),
    )
    r2 = F.col("x") * F.col("x") + F.col("y") * F.col("y")
    dirs = plane.where(r2 > 0).select(
        "label",
        (F.col("x") / F.sqrt(r2)).alias("cx"),
        (F.col("y") / F.sqrt(r2)).alias("cy"),
    )
    s = dirs.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cx").alias("c"),
        F.sum("cy").alias("sy"),
    )
    return s.select(
        F.col("label").cast("long").alias("label"),
        F.col("n").alias("n_vectors"),
        F.round(
            F.sqrt(F.col("c") * F.col("c") + F.col("sy") * F.col("sy"))
            / F.col("n")
            * 1000000
        )
        .cast("long")
        .alias("rbar_micro"),
        F.round(
            (F.col("c") * F.col("c") + F.col("sy") * F.col("sy"))
            / F.col("n")
            * 1000
        )
        .cast("long")
        .alias("rayleigh_z_milli"),
        F.round(F.atan2("sy", "c") * 1000000)
        .cast("long")
        .alias("mean_angle_micro_rad"),
    )


_NATION_SHARE_PTS_SQL = """
    WITH ords AS (
        SELECT c.c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1
    ), tt AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS tc, CAST(SUM(cents) AS BIGINT) AS tr
        FROM ords
    ), pts AS (
        SELECT nk,
               CAST(ROUND(cnt * 1000000.0 / tt.tc) AS BIGINT) AS x,
               CAST(ROUND(cents * 1000000.0 / tt.tr) AS BIGINT) AS y
        FROM ords, tt
    )
"""


@query(
    "min_enclosing_circle_nations",
    oracle=_NATION_SHARE_PTS_SQL
    + """
    , pairs AS (
        SELECT (a.x + b.x) / 2.0 AS cx, (a.y + b.y) / 2.0 AS cy,
               ((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) / 4.0
                   AS r2
        FROM pts a JOIN pts b ON a.nk < b.nk
    ), triples AS (
        SELECT ((a.x * a.x + a.y * a.y) * (b.y - c.y)
                + (b.x * b.x + b.y * b.y) * (c.y - a.y)
                + (c.x * c.x + c.y * c.y) * (a.y - b.y))
               / (2.0 * (a.x * (b.y - c.y) + b.x * (c.y - a.y)
                         + c.x * (a.y - b.y))) AS cx,
               ((a.x * a.x + a.y * a.y) * (c.x - b.x)
                + (b.x * b.x + b.y * b.y) * (a.x - c.x)
                + (c.x * c.x + c.y * c.y) * (b.x - a.x))
               / (2.0 * (a.x * (b.y - c.y) + b.x * (c.y - a.y)
                         + c.x * (a.y - b.y))) AS cy
        FROM pts a JOIN pts b ON a.nk < b.nk JOIN pts c ON b.nk < c.nk
        WHERE a.x * (b.y - c.y) + b.x * (c.y - a.y) + c.x * (a.y - b.y) <> 0
    ), tcirc AS (
        SELECT t.cx, t.cy,
               MAX((p.x - t.cx) * (p.x - t.cx) + (p.y - t.cy) * (p.y - t.cy))
                   AS r2need
        FROM triples t CROSS JOIN pts p
        WHERE (p.x - t.cx) * (p.x - t.cx) + (p.y - t.cy) * (p.y - t.cy) IS NOT NULL
        GROUP BY t.cx, t.cy
    ), pcirc AS (
        SELECT pr.cx, pr.cy,
               MAX((p.x - pr.cx) * (p.x - pr.cx)
                   + (p.y - pr.cy) * (p.y - pr.cy)) AS r2need,
               MAX(pr.r2) AS r2def
        FROM pairs pr CROSS JOIN pts p GROUP BY pr.cx, pr.cy
    ), cands AS (
        SELECT cx, cy, r2need AS r2 FROM tcirc
        UNION ALL
        SELECT cx, cy, r2need FROM pcirc WHERE r2need <= r2def * 1.000000001
    ), best AS (
        SELECT cx, cy, r2 FROM cands ORDER BY r2 ASC, cx ASC, cy ASC LIMIT 1
    )
    SELECT CAST((SELECT COUNT(*) FROM pts) AS BIGINT) AS n_points,
           CAST(ROUND(sqrt(r2)) AS BIGINT) AS radius_ppm,
           CAST(ROUND(cx) AS BIGINT) AS center_x_ppm,
           CAST(ROUND(cy) AS BIGINT) AS center_y_ppm
    FROM best
    """,
)
def min_enclosing_circle_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact minimum enclosing circle of the 25 nations plotted in
    share space (x = ppm share of order count, y = ppm share of
    revenue): by Welzl's characterization the optimal circle is
    determined by 2 points (as a diameter) or 3 points
    (circumcircle), so all C(25,2) diameter candidates and C(25,3)
    non-collinear circumcircles are enumerated, each inflated to the
    max distance it must cover, and the smallest candidate wins — the
    tightest bound on how dispersed national market positions are,
    sharper than the bounding box of `convex_hull_nation_profile`.

    Determinism: coordinates are exact integer ppm shares;
    collinearity is an exact integer determinant test; circumcenters
    are single-expression double divisions of exact integers; the
    argmin orders by (r2, cx, cy) so equal-radius candidates resolve
    identically.

    Scale shape: one fact agg to 25 integer points; candidate
    enumeration is O(n^3) = 2.3k rows against 25 coverage probes —
    all broadcast-local. The n^3 lattice is the price of exactness
    and is schema-bounded, never data-bounded.
    """
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    ords = (
        o.join(
            F.broadcast(
                cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    tt = ords.agg(
        F.sum("cnt").cast("long").alias("tc"),
        F.sum("cents").cast("long").alias("tr"),
    )
    pts = ords.crossJoin(F.broadcast(tt)).select(
        "nk",
        F.round(F.col("cnt") * 1000000.0 / F.col("tc")).cast("long").alias("x"),
        F.round(F.col("cents") * 1000000.0 / F.col("tr")).cast("long").alias("y"),
    ).transform(_ckpt)
    a, b, c = pts.alias("a"), pts.alias("b"), pts.alias("c")
    pairs = a.join(b, F.col("a.nk") < F.col("b.nk")).select(
        ((F.col("a.x") + F.col("b.x")) / 2.0).alias("cx"),
        ((F.col("a.y") + F.col("b.y")) / 2.0).alias("cy"),
        (
            (
                (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x"))
                + (F.col("a.y") - F.col("b.y")) * (F.col("a.y") - F.col("b.y"))
            )
            / 4.0
        ).alias("r2"),
    )
    det = (
        F.col("a.x") * (F.col("b.y") - F.col("c.y"))
        + F.col("b.x") * (F.col("c.y") - F.col("a.y"))
        + F.col("c.x") * (F.col("a.y") - F.col("b.y"))
    )
    sq = lambda p: F.col(f"{p}.x") * F.col(f"{p}.x") + F.col(f"{p}.y") * F.col(f"{p}.y")
    triples = (
        a.join(b, F.col("a.nk") < F.col("b.nk"))
        .join(c, F.col("b.nk") < F.col("c.nk"))
        .where(det != 0)
        .select(
            (
                (
                    sq("a") * (F.col("b.y") - F.col("c.y"))
                    + sq("b") * (F.col("c.y") - F.col("a.y"))
                    + sq("c") * (F.col("a.y") - F.col("b.y"))
                )
                / (2.0 * det)
            ).alias("cx"),
            (
                (
                    sq("a") * (F.col("c.x") - F.col("b.x"))
                    + sq("b") * (F.col("a.x") - F.col("c.x"))
                    + sq("c") * (F.col("b.x") - F.col("a.x"))
                )
                / (2.0 * det)
            ).alias("cy"),
        )
    )
    p = pts.alias("p")
    d2 = (F.col("p.x") - F.col("cx")) * (F.col("p.x") - F.col("cx")) + (
        F.col("p.y") - F.col("cy")
    ) * (F.col("p.y") - F.col("cy"))
    tcirc = (
        triples.crossJoin(p)
        .groupBy("cx", "cy")
        .agg(F.max(d2).alias("r2"))
    )
    pcirc = (
        pairs.crossJoin(p)
        .groupBy("cx", "cy")
        .agg(F.max(d2).alias("r2need"), F.max("r2").alias("r2def"))
        .where(F.col("r2need") <= F.col("r2def") * 1.000000001)
        .select("cx", "cy", F.col("r2need").alias("r2"))
    )
    best = (
        tcirc.unionAll(pcirc)
        .orderBy(F.asc("r2"), F.asc("cx"), F.asc("cy"))
        .limit(1)
    )
    n = pts.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    return n.crossJoin(F.broadcast(best)).select(
        "n_points",
        F.round(F.sqrt("r2")).cast("long").alias("radius_ppm"),
        F.round("cx").cast("long").alias("center_x_ppm"),
        F.round("cy").cast("long").alias("center_y_ppm"),
    )


@query(
    "farthest_pair_nations",
    oracle=_NATION_SHARE_PTS_SQL
    + """
    , d AS (
        SELECT a.nk AS na, b.nk AS nb,
               (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
        FROM pts a JOIN pts b ON a.nk < b.nk
    )
    SELECT CAST(na AS BIGINT) AS nation_a, CAST(nb AS BIGINT) AS nation_b,
           CAST(ROUND(sqrt(d2)) AS BIGINT) AS diameter_ppm
    FROM d ORDER BY d2 DESC, na ASC, nb ASC LIMIT 1
    """,
)
def farthest_pair_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diameter of the nation share-space point set: the farthest pair
    under squared Euclidean distance on the same exact ppm coordinates
    as `min_enclosing_circle_nations` — the two most dissimilar
    national market positions. Jung's theorem sandwiches the pair
    against the enclosing radius (diam/2 <= R <= diam/sqrt(3)), which
    the invariant test pins as a cross-query consistency check.

    Determinism: distances are exact integers (ppm coordinates
    squared stay far below 2^63); the argmax carries a (d2, key)
    tie-break.

    Scale shape: one fact agg to 25 points, one triangular self-join
    of 300 pairs, one TakeOrdered row.
    """
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    ords = (
        o.join(
            F.broadcast(
                cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    ords = _ckpt(ords)  # shared fan-out relation
    tt = ords.agg(
        F.sum("cnt").cast("long").alias("tc"),
        F.sum("cents").cast("long").alias("tr"),
    )
    pts = ords.crossJoin(F.broadcast(tt)).select(
        "nk",
        F.round(F.col("cnt") * 1000000.0 / F.col("tc")).cast("long").alias("x"),
        F.round(F.col("cents") * 1000000.0 / F.col("tr")).cast("long").alias("y"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    d = a.join(b, F.col("a.nk") < F.col("b.nk")).select(
        F.col("a.nk").alias("na"),
        F.col("b.nk").alias("nb"),
        (
            (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x"))
            + (F.col("a.y") - F.col("b.y")) * (F.col("a.y") - F.col("b.y"))
        ).alias("d2"),
    )
    return (
        d.orderBy(F.desc("d2"), F.asc("na"), F.asc("nb"))
        .limit(1)
        .select(
            F.col("na").cast("long").alias("nation_a"),
            F.col("nb").cast("long").alias("nation_b"),
            F.round(F.sqrt("d2")).cast("long").alias("diameter_ppm"),
        )
    )


_EMB2D_SQL = """
    WITH pts AS (
        SELECT vec_id AS id, label,
               CAST(embedding[1] AS DOUBLE) AS x,
               CAST(embedding[2] AS DOUBLE) AS y
        FROM embeddings
    )
"""


@query(
    "hopkins_clusterability_2d",
    oracle=_EMB2D_SQL
    + """
    , bb AS (
        SELECT MIN(x) AS x0, MAX(x) AS x1, MIN(y) AS y0, MAX(y) AS y1
        FROM pts
    ), uni AS (
        SELECT i,
               bb.x0 + ((i * 2654435761) % 1000000) / 1000000.0
                   * (bb.x1 - bb.x0) AS x,
               bb.y0 + (((i + 1013904223) * 2654435761) % 1000000) / 1000000.0
                   * (bb.y1 - bb.y0) AS y
        FROM (SELECT UNNEST(generate_series(1, 200)) AS i), bb
    ), xnn AS (
        SELECT a.id, MIN((a.x - b.x) * (a.x - b.x)
                         + (a.y - b.y) * (a.y - b.y)) AS d2
        FROM pts a JOIN pts b ON b.id <> a.id
        GROUP BY a.id
    ), unn AS (
        SELECT u.i, MIN((u.x - b.x) * (u.x - b.x)
                        + (u.y - b.y) * (u.y - b.y)) AS d2
        FROM uni u CROSS JOIN pts b
        GROUP BY u.i
    ), s AS (
        SELECT (SELECT SUM(sqrt(d2)) FROM xnn) AS sx,
               (SELECT SUM(sqrt(d2)) FROM unn) AS su,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM pts) AS n
    )
    SELECT n AS n_points, CAST(200 AS BIGINT) AS n_uniform,
           CAST(ROUND(su / (su + sx * 200.0 / n) * 1000000) AS BIGINT)
               AS hopkins_micro
    FROM s
    """,
)
def hopkins_clusterability_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopkins clusterability statistic on the first two embedding
    dimensions: nearest-neighbor distances from 200 deterministic
    uniform probes (Knuth-mixed indices scaled to the data bounding
    box) are compared with nearest-neighbor distances within the real
    points; H = sum(u) / (sum(u) + scaled sum(x)) is ~0.5 for a
    Poisson-random cloud and approaches 1 when the data clumps —
    the pre-clustering sanity gate before trusting
    `kmeans_embedding_assign` or `centroid_silhouette_embedding`
    (k-means happily partitions pure noise; Hopkins says whether
    clusters exist at all). Real-point sums are rescaled by 200/n to
    match the probe count (equivalent to the classic equal-m form).

    Determinism: probe coordinates are exact integer mixes scaled by
    the data's own min/max; NN minima compare identical doubles; one
    micro-rounded ratio.

    Scale shape: at audit scale the NN search is the exact O(n^2)
    pair scan (350k pairs); the 100-TB path swaps in the 9-cell grid
    blocking of `clark_evans_nn_index` — the statistic is unchanged,
    only the candidate generator tightens.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").getItem(0).cast("double").alias("x"),
        F.col("embedding").getItem(1).cast("double").alias("y"),
    ).transform(_ckpt)
    bb = pts.agg(
        F.min("x").alias("x0"),
        F.max("x").alias("x1"),
        F.min("y").alias("y0"),
        F.max("y").alias("y1"),
    )
    uni = (
        spark.range(1, 201)
        .select(F.col("id").alias("i"))
        .crossJoin(F.broadcast(bb))
        .select(
            "i",
            (
                F.col("x0")
                + ((F.col("i") * 2654435761) % 1000000) / 1000000.0
                * (F.col("x1") - F.col("x0"))
            ).alias("x"),
            (
                F.col("y0")
                + (((F.col("i") + 1013904223) * 2654435761) % 1000000)
                / 1000000.0
                * (F.col("y1") - F.col("y0"))
            ).alias("y"),
        )
    )
    a, b = pts.alias("a"), pts.alias("b")
    xnn = (
        a.join(b, F.col("b.id") != F.col("a.id"))
        .groupBy(F.col("a.id"))
        .agg(
            F.min(
                (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x"))
                + (F.col("a.y") - F.col("b.y")) * (F.col("a.y") - F.col("b.y"))
            ).alias("d2")
        )
    )
    u = uni.alias("u")
    unn = (
        u.crossJoin(b)
        .groupBy(F.col("u.i"))
        .agg(
            F.min(
                (F.col("u.x") - F.col("b.x")) * (F.col("u.x") - F.col("b.x"))
                + (F.col("u.y") - F.col("b.y")) * (F.col("u.y") - F.col("b.y"))
            ).alias("d2")
        )
    )
    sx = xnn.agg(F.sum(F.sqrt("d2")).alias("sx"))
    su = unn.agg(F.sum(F.sqrt("d2")).alias("su"))
    n = pts.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        n.crossJoin(F.broadcast(sx))
        .crossJoin(F.broadcast(su))
        .select(
            F.col("n").alias("n_points"),
            F.lit(200).cast("long").alias("n_uniform"),
            F.round(
                F.col("su")
                / (F.col("su") + F.col("sx") * 200.0 / F.col("n"))
                * 1000000
            )
            .cast("long")
            .alias("hopkins_micro"),
        )
    )


@query(
    "nn_label_purity_test",
    oracle=_EMB2D_SQL
    + """
    , ranked AS (
        SELECT a.id, a.label AS la, b.label AS lb,
               ROW_NUMBER() OVER (
                   PARTITION BY a.id
                   ORDER BY (a.x - b.x) * (a.x - b.x)
                            + (a.y - b.y) * (a.y - b.y), b.id
               ) AS rn
        FROM pts a JOIN pts b ON b.id <> a.id
    ), nn AS (
        SELECT CASE WHEN la = lb THEN 1 ELSE 0 END AS same
        FROM ranked WHERE rn = 1
    ), obs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(same) AS BIGINT) AS same_cnt
        FROM nn
    ), expct AS (
        SELECT SUM(c * 1.0 * (c - 1)) / (t * 1.0 * (t - 1)) AS e
        FROM (SELECT label, CAST(COUNT(*) AS BIGINT) AS c FROM pts
              GROUP BY label),
             (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM pts)
        GROUP BY t
    )
    SELECT obs.n AS n_points, obs.same_cnt,
           CAST(ROUND(obs.same_cnt * 1000000.0 / obs.n) AS BIGINT)
               AS observed_same_ppm,
           CAST(ROUND(expct.e * 1000000) AS BIGINT) AS expected_same_ppm,
           CAST(ROUND(obs.same_cnt * 1.0 / obs.n / expct.e * 1000) AS BIGINT)
               AS purity_lift_milli
    FROM obs, expct
    """,
)
def nn_label_purity_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schilling-style nearest-neighbor two-sample test on the 2D
    embedding projection: for every vector, does its nearest neighbor
    (squared Euclidean, vec_id tie-break) share its label? The
    observed same-label fraction is compared with the exact
    random-labeling expectation sum n_c (n_c - 1) / (N (N - 1)); lift
    >> 1 means labels live in separated regions EVEN in just two
    dimensions — the projection-level check that
    `label_purity_by_lang` (cluster-based) and `knn_holdout_accuracy`
    (full-dimension) bracket from either side.

    Determinism: the NN argmin orders by (exact double distance,
    vec_id); counts and the hypergeometric-style expectation are
    exact integer ratios, micro-rounded once.

    Scale shape: the audit-scale pair scan is O(n^2) with a
    WindowGroupLimit argmin; the scale path is the same grid blocking
    as the Hopkins query. The expectation needs only label counts —
    one tiny agg.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        "label",
        F.col("embedding").getItem(0).cast("double").alias("x"),
        F.col("embedding").getItem(1).cast("double").alias("y"),
    ).transform(_ckpt)
    a, b = pts.alias("a"), pts.alias("b")
    d2 = (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x")) + (
        F.col("a.y") - F.col("b.y")
    ) * (F.col("a.y") - F.col("b.y"))
    ranked = (
        a.join(b, F.col("b.id") != F.col("a.id"))
        .select(
            F.col("a.id").alias("id"),
            F.col("a.label").alias("la"),
            F.col("b.label").alias("lb"),
            d2.alias("d2"),
            F.col("b.id").alias("bid"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("id").orderBy("d2", "bid")
            ),
        )
        .where(F.col("rn") == 1)
    )
    obs = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("la") == F.col("lb"), 1).otherwise(0))
        .cast("long")
        .alias("same_cnt"),
    )
    cnts = pts.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("c"))
    t = pts.agg(F.count(F.lit(1)).cast("long").alias("t"))
    expct = cnts.crossJoin(F.broadcast(t)).agg(
        (
            F.sum(F.col("c") * 1.0 * (F.col("c") - 1))
            / F.max(F.col("t") * 1.0 * (F.col("t") - 1))
        ).alias("e")
    )
    return obs.crossJoin(F.broadcast(expct)).select(
        F.col("n").alias("n_points"),
        "same_cnt",
        F.round(F.col("same_cnt") * 1000000.0 / F.col("n"))
        .cast("long")
        .alias("observed_same_ppm"),
        F.round(F.col("e") * 1000000).cast("long").alias("expected_same_ppm"),
        F.round(F.col("same_cnt") * 1.0 / F.col("n") / F.col("e") * 1000)
        .cast("long")
        .alias("purity_lift_milli"),
    )


_REGION_COALITION_SQL = """
    WITH w AS (
        SELECT n.n_regionkey AS r,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1
    ), tq AS (
        SELECT CAST(SUM(cents) // 2 + 1 AS BIGINT) AS q FROM w
    ), masks AS (SELECT UNNEST(generate_series(0, 31)) AS m
    ), mem AS (
        SELECT masks.m, w.r, w.cents
        FROM masks JOIN w ON (masks.m // (1 << w.r)) % 2 = 1
    ), ws AS (
        SELECT masks.m,
               CAST(COALESCE(SUM(mem.cents), 0) AS BIGINT) AS tw,
               CAST(COUNT(mem.r) AS BIGINT) AS sz,
               CAST(COALESCE(MIN(mem.cents), 0) AS BIGINT) AS minw
        FROM masks LEFT JOIN mem ON mem.m = masks.m
        GROUP BY masks.m
    )
"""


@query(
    "shapley_shubik_region_power",
    oracle=_REGION_COALITION_SQL
    + """
    , piv AS (
        SELECT w.r,
               SUM(CASE WHEN ws.tw < tq.q AND ws.tw + w.cents >= tq.q
                   THEN (CASE ws.sz WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2
                         WHEN 3 THEN 6 WHEN 4 THEN 24 END)
                      * (CASE 4 - ws.sz WHEN 0 THEN 1 WHEN 1 THEN 1
                         WHEN 2 THEN 2 WHEN 3 THEN 6 WHEN 4 THEN 24 END)
                   ELSE 0 END) AS ord_cnt
        FROM w JOIN ws ON (ws.m // (1 << w.r)) % 2 = 0
        CROSS JOIN tq
        GROUP BY w.r
    ), tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS tc FROM w)
    SELECT CAST(piv.r AS BIGINT) AS region_key,
           CAST(ROUND(w.cents * 1000000.0 / tot.tc) AS BIGINT)
               AS weight_share_ppm,
           CAST(ord_cnt AS BIGINT) AS pivotal_orderings,
           CAST(ROUND(ord_cnt * 1000.0 / 120) AS BIGINT) AS shapley_milli
    FROM piv JOIN w ON w.r = piv.r CROSS JOIN tot
    """,
)
def shapley_shubik_region_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-Shubik power index of the five regions in the
    majority-vote game weighted by revenue (quota = half the total
    plus one): a region's index is the fraction of the 5! = 120
    orderings in which it is PIVOTAL — its arrival tips the coalition
    past quota — computed by enumerating all 2^5 coalitions and
    weighting each pivotal subset S by |S|! (4-|S|)!. The
    ordering-based counterpart of `banzhaf_region_power` (which counts
    swing COALITIONS, not orderings): the two indices rank power
    differently whenever weights are skewed, which is the point of
    reporting both.

    Determinism: coalition sums are exact cent integers; membership
    is bitmask integer arithmetic; factorial weights are literal
    CASEs; the only rounding is the final milli share.

    Scale shape: one fact agg to 5 weights; coalition enumeration is
    a 32-row lattice joined against 5 players — schema-bounded
    constants, never data-scaled.
    """
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    w = (
        o.join(
            F.broadcast(
                cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .join(
            F.broadcast(
                nat.select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_regionkey"
                )
            ),
            "c_nationkey",
        )
        .groupBy(F.col("n_regionkey").alias("r"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .transform(_ckpt)
    )
    tq = w.agg((F.floor(F.sum("cents") / 2) + 1).cast("long").alias("q"))
    tot = w.agg(F.sum("cents").cast("long").alias("tc"))
    masks = spark.range(0, 32).select(F.col("id").alias("m"))
    mem = masks.join(
        F.broadcast(w),
        F.expr("(m div (1 << cast(r as int))) % 2 = 1"),
    )
    ws = (
        masks.join(mem.select("m", "cents"), "m", "left")
        .groupBy("m")
        .agg(
            F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("tw"),
            F.count("cents").cast("long").alias("sz"),
        )
    )
    fact = lambda c: (
        F.when(c == 0, 1)
        .when(c == 1, 1)
        .when(c == 2, 2)
        .when(c == 3, 6)
        .otherwise(24)
    )
    piv = (
        w.join(ws, F.expr("(m div (1 << cast(r as int))) % 2 = 0"))
        .crossJoin(F.broadcast(tq))
        .groupBy("r", "cents")
        .agg(
            F.sum(
                F.when(
                    (F.col("tw") < F.col("q"))
                    & (F.col("tw") + F.col("cents") >= F.col("q")),
                    fact(F.col("sz")) * fact(4 - F.col("sz")),
                ).otherwise(0)
            )
            .cast("long")
            .alias("ord_cnt")
        )
    )
    return piv.crossJoin(F.broadcast(tot)).select(
        F.col("r").cast("long").alias("region_key"),
        F.round(F.col("cents") * 1000000.0 / F.col("tc"))
        .cast("long")
        .alias("weight_share_ppm"),
        F.col("ord_cnt").alias("pivotal_orderings"),
        F.round(F.col("ord_cnt") * 1000.0 / 120).cast("long").alias(
            "shapley_milli"
        ),
    )


@query(
    "deegan_packel_region_power",
    oracle=_REGION_COALITION_SQL
    + """
    , mwc AS (
        SELECT ws.m, ws.sz
        FROM ws, tq
        WHERE ws.tw >= tq.q AND ws.tw - ws.minw < tq.q AND ws.sz > 0
    ), nmwc AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM mwc
    ), contrib AS (
        SELECT w.r,
               CAST(COUNT(*) AS BIGINT) AS n_mwc,
               SUM(1.0 / mwc.sz) AS share
        FROM w JOIN mwc ON (mwc.m // (1 << w.r)) % 2 = 1
        GROUP BY w.r
    )
    SELECT CAST(w.r AS BIGINT) AS region_key,
           CAST(COALESCE(contrib.n_mwc, 0) AS BIGINT) AS n_min_winning,
           CAST(ROUND(COALESCE(contrib.share, 0) * 1000.0 / nmwc.k) AS BIGINT)
               AS deegan_packel_milli
    FROM w LEFT JOIN contrib ON contrib.r = w.r CROSS JOIN nmwc
    """,
)
def deegan_packel_region_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deegan-Packel power index over the same weighted majority game
    as `shapley_shubik_region_power`: only MINIMAL winning coalitions
    count (every member critical — removing any drops below quota,
    checked via the coalition's minimum member weight), each shares
    credit 1/|S| equally among members, and the index averages over
    all minimal coalitions. Built on the size-principle view of
    politics (surplus partners get nothing), it can rank a
    mid-weight region above a heavyweight that appears only in bloated
    coalitions — a third, structurally different answer beside
    Shapley-Shubik and Banzhaf.

    Determinism: minimality is exact integer arithmetic (tw - minw <
    q); the only float is the 1/|S| share sum over <=31 coalitions,
    milli-rounded.

    Scale shape: same 32-row coalition lattice; the criticality test
    needs just (sum, min) per coalition — no per-member subset
    re-enumeration.
    """
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    w = (
        o.join(
            F.broadcast(
                cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .join(
            F.broadcast(
                nat.select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_regionkey"
                )
            ),
            "c_nationkey",
        )
        .groupBy(F.col("n_regionkey").alias("r"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .transform(_ckpt)
    )
    tq = w.agg((F.floor(F.sum("cents") / 2) + 1).cast("long").alias("q"))
    masks = spark.range(0, 32).select(F.col("id").alias("m"))
    mem = masks.join(
        F.broadcast(w),
        F.expr("(m div (1 << cast(r as int))) % 2 = 1"),
    )
    ws = (
        masks.join(mem.select("m", "cents"), "m", "left")
        .groupBy("m")
        .agg(
            F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("tw"),
            F.count("cents").cast("long").alias("sz"),
            F.coalesce(F.min("cents"), F.lit(0)).cast("long").alias("minw"),
        )
    )
    mwc = (
        ws.crossJoin(F.broadcast(tq))
        .where(
            (F.col("tw") >= F.col("q"))
            & (F.col("tw") - F.col("minw") < F.col("q"))
            & (F.col("sz") > 0)
        )
        .select("m", "sz")
    )
    nmwc = mwc.agg(F.count(F.lit(1)).cast("long").alias("k"))
    contrib = (
        w.join(mwc, F.expr("(m div (1 << cast(r as int))) % 2 = 1"))
        .groupBy("r")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_mwc"),
            F.sum(1.0 / F.col("sz")).alias("share"),
        )
    )
    return (
        w.join(contrib, "r", "left")
        .crossJoin(F.broadcast(nmwc))
        .select(
            F.col("r").cast("long").alias("region_key"),
            F.coalesce("n_mwc", F.lit(0)).cast("long").alias("n_min_winning"),
            F.round(
                F.coalesce("share", F.lit(0.0)) * 1000.0 / F.col("k")
            )
            .cast("long")
            .alias("deegan_packel_milli"),
        )
    )


def _rho_case_sql(var: str) -> str:
    """CASE ladder: leading-zero rank of a 25-bit value (1 = MSB set at
    bit 24, 25 = only bit 0, 26 = zero). Pure comparisons — no float
    log2 whose power-of-two boundaries differ between libms."""
    branches = [f"WHEN {var} >= {1 << (24 - i)} THEN {i + 1}" for i in range(25)]
    return "CASE " + " ".join(branches) + " ELSE 26 END"


@query(
    "hll_distinct_sketch",
    oracle=f"""
    WITH dk AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS x FROM orders),
    h AS (
        SELECT (48271 * ((48271 * x + 12345) % 2147483647) + 12345)
               % 2147483647 AS hv FROM dk
    ), parts AS (
        SELECT hv % 64 AS bucket, hv // 64 AS rest FROM h
    ), rho AS (
        SELECT bucket, {_rho_case_sql('rest')} AS r FROM parts
    ), regs AS (
        SELECT bucket, CAST(MAX(r) AS BIGINT) AS m FROM rho GROUP BY bucket
    ), full_regs AS (
        SELECT g.b, COALESCE(regs.m, 0) AS m
        FROM (SELECT UNNEST(generate_series(0, 63)) AS b) g
        LEFT JOIN regs ON regs.bucket = g.b
    ), z AS (
        SELECT SUM(POWER(2.0, -m)) AS zsum,
               CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
        FROM full_regs
    ), e AS (
        SELECT 0.709 * 64 * 64 / zsum AS raw, v FROM z
    ), est AS (
        SELECT CASE WHEN raw <= 160 AND v > 0 THEN 64 * ln(64.0 / v)
               ELSE raw END AS hll, v
        FROM e
    ), ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS ed FROM dk)
    SELECT ex.ed AS exact_distinct,
           CAST(ROUND(est.hll) AS BIGINT) AS hll_estimate,
           est.v AS zero_registers,
           CAST(ROUND(ABS(est.hll - ex.ed) * 1000000.0 / ex.ed) AS BIGINT)
               AS rel_err_ppm
    FROM ex, est
    """,
)
def hll_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-scratch HyperLogLog distinct estimator audited against the
    exact count: 64 registers each hold the max leading-zero rank of
    the hashed keys routed to them, the harmonic mean 0.709 m^2 /
    sum 2^-M estimates cardinality, and the Flajolet small-range
    correction (m ln(m/V) when registers are empty) kicks in exactly
    as published. Completes the deterministic distinct-sketch trio —
    `linear_counting_sketch` (low D), this (unbounded D, O(m) state),
    `kmv_distinct_sketch` (mergeable minima) — so the audit table
    itself documents which regime each wins.

    Determinism: the leading-zero rank is a pure comparison ladder
    (floor(log2) has power-of-two boundary hazards across libms —
    avoided by construction); register maxima are integers; POWER(2,
    -m) over 27 possible integer exponents is exact in IEEE doubles.

    Scale shape: the register table is the classic mergeable HLL
    state — per-partition maxima combine before the 64-row shuffle;
    the audit adds only the exact COUNT(DISTINCT) it grades against.
    """
    o = load_table(spark, sf_dir, "orders")
    dk = o.select(F.col("o_custkey").cast("long").alias("x")).distinct()
    h1 = (F.lit(48271) * F.col("x") + 12345) % 2147483647
    h = dk.select(((F.lit(48271) * h1 + 12345) % 2147483647).alias("hv"))
    parts = h.select(
        (F.col("hv") % 64).alias("bucket"),
        F.floor(F.col("hv") / 64).cast("long").alias("rest"),
    )
    rho_expr = F.lit(26)
    for i in range(24, -1, -1):
        rho_expr = F.when(F.col("rest") >= (1 << (24 - i)), i + 1).otherwise(
            rho_expr
        )
    regs = parts.select("bucket", rho_expr.alias("r")).groupBy("bucket").agg(
        F.max("r").cast("long").alias("m")
    )
    grid = spark.range(0, 64).select(F.col("id").alias("bucket"))
    full_regs = grid.join(regs, "bucket", "left").select(
        F.coalesce("m", F.lit(0)).alias("m")
    )
    z = full_regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("zsum"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).cast("long").alias("v"),
    )
    e = z.select((F.lit(0.709) * 64 * 64 / F.col("zsum")).alias("raw"), "v")
    est = e.select(
        F.when(
            (F.col("raw") <= 160) & (F.col("v") > 0),
            64 * F.log(64.0 / F.col("v")),
        )
        .otherwise(F.col("raw"))
        .alias("hll"),
        "v",
    )
    ex = dk.agg(F.count(F.lit(1)).cast("long").alias("ed"))
    return ex.crossJoin(F.broadcast(est)).select(
        F.col("ed").alias("exact_distinct"),
        F.round(F.col("hll")).cast("long").alias("hll_estimate"),
        F.col("v").alias("zero_registers"),
        F.round(F.abs(F.col("hll") - F.col("ed")) * 1000000.0 / F.col("ed"))
        .cast("long")
        .alias("rel_err_ppm"),
    )


@query(
    "theta_sketch_intersection",
    oracle="""
    WITH a AS (
        SELECT DISTINCT CAST(o_custkey AS BIGINT) AS x FROM orders
        WHERE EXTRACT(year FROM o_orderdate) = 1995
    ), b AS (
        SELECT DISTINCT CAST(o_custkey AS BIGINT) AS x FROM orders
        WHERE EXTRACT(year FROM o_orderdate) = 1996
    ), ha AS (SELECT (48271 * ((48271 * x + 12345) % 2147483647) + 12345)
                     % 2147483647 AS h FROM a
    ), hb AS (SELECT (48271 * ((48271 * x + 12345) % 2147483647) + 12345)
                     % 2147483647 AS h FROM b
    ), ta AS (
        SELECT CASE WHEN COUNT(*) >= 128
               THEN (SELECT h FROM ha ORDER BY h LIMIT 1 OFFSET 127)
               ELSE 2147483647 END AS th
        FROM ha
    ), tb AS (
        SELECT CASE WHEN COUNT(*) >= 128
               THEN (SELECT h FROM hb ORDER BY h LIMIT 1 OFFSET 127)
               ELSE 2147483647 END AS th
        FROM hb
    ), th AS (SELECT LEAST(ta.th, tb.th) AS t FROM ta, tb
    ), m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS hits
        FROM ha JOIN hb ON hb.h = ha.h CROSS JOIN th
        WHERE ha.h < th.t
    ), ex AS (
        SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS na,
               CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS nb,
               CAST((SELECT COUNT(*) FROM a JOIN b ON b.x = a.x) AS BIGINT)
                   AS ni
    )
    SELECT ex.na AS exact_a, ex.nb AS exact_b, ex.ni AS exact_intersection,
           m.hits AS sample_hits,
           CAST(ROUND(m.hits * 2147483647.0 / th.t) AS BIGINT)
               AS theta_est_intersection,
           CAST(ROUND(ABS(m.hits * 2147483647.0 / th.t - ex.ni)
                * 1000000.0 / ex.ni) AS BIGINT) AS rel_err_ppm
    FROM ex, m, th
    """,
)
def theta_sketch_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set intersection: the 1995 and 1996 customer sets
    are sketched by their 128 smallest hash values, the intersection
    keeps common hashes below theta = min(theta_A, theta_B), and
    |hits| / theta-fraction estimates the true overlap — the
    composable set-algebra layer sketches add over plain distinct
    counting (`kmv_distinct_sketch` handles one set; theta sketches
    answer A AND B without ever co-shuffling the raw sets). Audited
    against the exact year-over-year retained-customer count.

    Determinism: the same LCG hash everywhere; theta is an exact
    order statistic (OFFSET 127); hits and the single scale-up
    division are integer-exact inputs.

    Scale shape: each side ships only its k = 128 minima (TakeOrdered
    merge); the intersection joins two 128-row relations — the full
    A-join-B the estimate replaces appears here only as the audit's
    ground truth.
    """
    o = load_table(spark, sf_dir, "orders")

    def year_set(y: int) -> DataFrame:
        return (
            o.where(F.year("o_orderdate") == y)
            .select(F.col("o_custkey").cast("long").alias("x"))
            .distinct()
        )

    # each year-set feeds its hash relation, its exact count, and the
    # exact intersection — ckpt so the orders scan + distinct runs once
    # per side instead of 5x total
    a, b = _ckpt(year_set(1995)), _ckpt(year_set(1996))
    hash_of = lambda df: df.select(
        (
            (
                F.lit(48271)
                * ((F.lit(48271) * F.col("x") + 12345) % 2147483647)
                + 12345
            )
            % 2147483647
        ).alias("h")
    )
    ha, hb = hash_of(a), hash_of(b)

    def theta(hdf: DataFrame) -> DataFrame:
        kth = (
            hdf.orderBy("h")
            .limit(128)
            .agg(F.max("h").alias("kh"), F.count(F.lit(1)).alias("kc"))
        )
        return kth.select(
            F.when(F.col("kc") >= 128, F.col("kh"))
            .otherwise(F.lit(2147483647))
            .alias("th")
        )

    ta = theta(ha).select(F.col("th").alias("tha"))
    tb = theta(hb).select(F.col("th").alias("thb"))
    th = ta.crossJoin(tb).select(F.least("tha", "thb").alias("t"))
    m = (
        ha.join(hb, "h")
        .crossJoin(F.broadcast(th))
        .where(F.col("h") < F.col("t"))
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    na = a.agg(F.count(F.lit(1)).cast("long").alias("na"))
    nb = b.agg(F.count(F.lit(1)).cast("long").alias("nb"))
    ni = a.join(b, "x").agg(F.count(F.lit(1)).cast("long").alias("ni"))
    est = F.col("hits") * 2147483647.0 / F.col("t")
    return (
        na.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(ni))
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(th))
        .select(
            F.col("na").alias("exact_a"),
            F.col("nb").alias("exact_b"),
            F.col("ni").alias("exact_intersection"),
            F.col("hits").alias("sample_hits"),
            F.round(est).cast("long").alias("theta_est_intersection"),
            F.round(F.abs(est - F.col("ni")) * 1000000.0 / F.col("ni"))
            .cast("long")
            .alias("rel_err_ppm"),
        )
    )


_LDP_REPORTS_SQL = """
    WITH segs AS (
        SELECT c_custkey,
               CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 0 WHEN 'BUILDING' THEN 1
                    WHEN 'FURNITURE' THEN 2 WHEN 'HOUSEHOLD' THEN 3
                    ELSE 4 END AS true_seg,
               ((c_custkey * 2654435761) % 1000000) / 1000000.0 AS u,
               CAST((c_custkey * 48271 + 7) % 5 AS BIGINT) AS alt
        FROM customer
    )
"""


@query(
    "ldp_rr_frequency_debias",
    oracle=_LDP_REPORTS_SQL
    + """
    , reports AS (
        SELECT true_seg,
               CASE WHEN u < 0.75 THEN true_seg ELSE alt END AS rep
        FROM segs
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM reports
    ), truth AS (
        SELECT true_seg AS seg, CAST(COUNT(*) AS BIGINT) AS tc
        FROM reports GROUP BY 1
    ), obs AS (
        SELECT rep AS seg, CAST(COUNT(*) AS BIGINT) AS oc
        FROM reports GROUP BY 1
    )
    SELECT CAST(truth.seg AS BIGINT) AS segment_code,
           CAST(ROUND(truth.tc * 1000000.0 / n.n) AS BIGINT) AS true_share_ppm,
           CAST(ROUND(obs.oc * 1000000.0 / n.n) AS BIGINT)
               AS observed_share_ppm,
           CAST(ROUND((obs.oc * 1.0 / n.n - 0.25 / 5) / 0.75 * 1000000)
                AS BIGINT) AS debiased_share_ppm,
           CAST(ROUND(((obs.oc * 1.0 / n.n - 0.25 / 5) / 0.75
                       - truth.tc * 1.0 / n.n) * 1000000) AS BIGINT)
               AS debias_err_ppm
    FROM truth JOIN obs ON obs.seg = truth.seg CROSS JOIN n
    """,
)
def ldp_rr_frequency_debias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-differential-privacy randomized response over market
    segments, replayed deterministically: each customer reports their
    true segment with probability 0.75, otherwise a hash-derived
    uniform substitute (Knuth-mixed key as the coin — the exact
    pseudo-random protocol both engines replay bit-identically). The
    collector sees only noisy reports; the unbiased frequency
    estimator (obs - (1-p)/k) / p recovers segment shares, and the
    audit prints the per-segment recovery error — the privacy-utility
    ledger `dp_noisy_counts_segments` shows for the central model,
    here in the strictly harder local model where no raw value ever
    leaves the client.

    Determinism: the coin and the substitute are exact integer
    mixes; shares are single divisions, ppm-rounded.

    Scale shape: the mechanism is a stateless per-row projection; the
    audit is two 5-key hash aggs — LDP's whole point is that the
    server-side reduction stays this cheap at any scale.
    """
    cst = load_table(spark, sf_dir, "customer")
    segs = cst.select(
        F.when(F.col("c_mktsegment") == "AUTOMOBILE", 0)
        .when(F.col("c_mktsegment") == "BUILDING", 1)
        .when(F.col("c_mktsegment") == "FURNITURE", 2)
        .when(F.col("c_mktsegment") == "HOUSEHOLD", 3)
        .otherwise(4)
        .alias("true_seg"),
        (((F.col("c_custkey") * 2654435761) % 1000000) / 1000000.0).alias("u"),
        ((F.col("c_custkey") * 48271 + 7) % 5).cast("long").alias("alt"),
    )
    reports = segs.select(
        "true_seg",
        F.when(F.col("u") < 0.75, F.col("true_seg"))
        .otherwise(F.col("alt"))
        .alias("rep"),
    )
    n = reports.agg(F.count(F.lit(1)).cast("long").alias("n"))
    truth = reports.groupBy(F.col("true_seg").alias("seg")).agg(
        F.count(F.lit(1)).cast("long").alias("tc")
    )
    obs = reports.groupBy(F.col("rep").alias("seg")).agg(
        F.count(F.lit(1)).cast("long").alias("oc")
    )
    deb = (F.col("oc") * 1.0 / F.col("n") - 0.25 / 5) / 0.75
    return (
        truth.join(obs, "seg")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("seg").cast("long").alias("segment_code"),
            F.round(F.col("tc") * 1000000.0 / F.col("n"))
            .cast("long")
            .alias("true_share_ppm"),
            F.round(F.col("oc") * 1000000.0 / F.col("n"))
            .cast("long")
            .alias("observed_share_ppm"),
            F.round(deb * 1000000).cast("long").alias("debiased_share_ppm"),
            F.round((deb - F.col("tc") * 1.0 / F.col("n")) * 1000000)
            .cast("long")
            .alias("debias_err_ppm"),
        )
    )


@query(
    "ldp_rr_epsilon_sweep",
    oracle=_LDP_REPORTS_SQL
    + """
    , ps(p) AS (VALUES (0.5), (0.6), (0.7), (0.8), (0.9)
    ), reports AS (
        SELECT ps.p, true_seg,
               CASE WHEN u < ps.p THEN true_seg ELSE alt END AS rep
        FROM segs CROSS JOIN ps
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer
    ), truth AS (
        SELECT true_seg AS seg, CAST(COUNT(*) AS BIGINT) AS tc
        FROM segs GROUP BY 1
    ), obs AS (
        SELECT p, rep AS seg, CAST(COUNT(*) AS BIGINT) AS oc
        FROM reports GROUP BY 1, 2
    ), err AS (
        SELECT obs.p,
               SUM(POWER((obs.oc * 1.0 / n.n - (1 - obs.p) / 5) / obs.p
                         - truth.tc * 1.0 / n.n, 2)) / 5 AS mse,
               MAX(ABS((obs.oc * 1.0 / n.n - (1 - obs.p) / 5) / obs.p
                       - truth.tc * 1.0 / n.n)) AS mx
        FROM obs JOIN truth ON truth.seg = obs.seg CROSS JOIN n
        GROUP BY obs.p
    )
    SELECT CAST(ROUND(p * 1000) AS BIGINT) AS p_milli,
           CAST(ROUND(ln((p + (1 - p) / 5) / ((1 - p) / 5)) * 1000) AS BIGINT)
               AS epsilon_milli,
           CAST(ROUND(sqrt(mse) * 1000000) AS BIGINT) AS rmse_ppm,
           CAST(ROUND(mx * 1000000) AS BIGINT) AS max_abs_err_ppm
    FROM err
    """,
)
def ldp_rr_epsilon_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-utility frontier of the randomized-response mechanism:
    the same deterministic protocol as `ldp_rr_frequency_debias`
    replayed at truth probabilities p = 0.5..0.9, each converted to
    its local-DP budget epsilon = ln((p + (1-p)/k) / ((1-p)/k)) and
    scored by the debiased estimator's RMSE and worst segment error.
    The sweep is the calibration table a telemetry team reads to pick
    epsilon: utility improves smoothly with p while epsilon grows
    logarithmically — seeing both columns side by side IS the
    decision.

    Determinism: one shared coin per customer across all p (coupled
    replay — differences between p rows reflect the mechanism, not
    resampling noise); all shares exact-integer ratios.

    Scale shape: the p-grid multiplies the stateless projection by 5
    before the same tiny hash aggs; nothing else changes — sweeping
    the knob costs a constant factor, not a rerun of the pipeline.
    """
    cst = load_table(spark, sf_dir, "customer")
    segs = cst.select(
        F.when(F.col("c_mktsegment") == "AUTOMOBILE", 0)
        .when(F.col("c_mktsegment") == "BUILDING", 1)
        .when(F.col("c_mktsegment") == "FURNITURE", 2)
        .when(F.col("c_mktsegment") == "HOUSEHOLD", 3)
        .otherwise(4)
        .alias("true_seg"),
        (((F.col("c_custkey") * 2654435761) % 1000000) / 1000000.0).alias("u"),
        ((F.col("c_custkey") * 48271 + 7) % 5).cast("long").alias("alt"),
    )
    ps = spark.createDataFrame([(0.5,), (0.6,), (0.7,), (0.8,), (0.9,)], "p double")
    reports = segs.crossJoin(F.broadcast(ps)).select(
        "p",
        "true_seg",
        F.when(F.col("u") < F.col("p"), F.col("true_seg"))
        .otherwise(F.col("alt"))
        .alias("rep"),
    )
    n = cst.agg(F.count(F.lit(1)).cast("long").alias("n"))
    truth = segs.groupBy(F.col("true_seg").alias("seg")).agg(
        F.count(F.lit(1)).cast("long").alias("tc")
    )
    obs = reports.groupBy("p", F.col("rep").alias("seg")).agg(
        F.count(F.lit(1)).cast("long").alias("oc")
    )
    deb = (F.col("oc") * 1.0 / F.col("n") - (1 - F.col("p")) / 5) / F.col("p")
    diff = deb - F.col("tc") * 1.0 / F.col("n")
    err = (
        obs.join(F.broadcast(truth), "seg")
        .crossJoin(F.broadcast(n))
        .groupBy("p")
        .agg(
            (F.sum(F.pow(diff, 2)) / 5).alias("mse"),
            F.max(F.abs(diff)).alias("mx"),
        )
    )
    return err.select(
        F.round(F.col("p") * 1000).cast("long").alias("p_milli"),
        F.round(
            F.log((F.col("p") + (1 - F.col("p")) / 5) / ((1 - F.col("p")) / 5))
            * 1000
        )
        .cast("long")
        .alias("epsilon_milli"),
        F.round(F.sqrt("mse") * 1000000).cast("long").alias("rmse_ppm"),
        F.round(F.col("mx") * 1000000).cast("long").alias("max_abs_err_ppm"),
    )


_MONTHLY_TRIANGLE_SQL = """
    WITH cells AS (
        SELECT (EXTRACT(year FROM o.o_orderdate) - 1992) * 12
               + EXTRACT(month FROM o.o_orderdate) - 1 AS origin,
               LEAST((EXTRACT(year FROM l.l_shipdate) - 1992) * 12
                     + EXTRACT(month FROM l.l_shipdate) - 1
                     - ((EXTRACT(year FROM o.o_orderdate) - 1992) * 12
                        + EXTRACT(month FROM o.o_orderdate) - 1), 4) AS dev,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS paid
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= o.o_orderdate
        GROUP BY 1, 2
    ), cum AS (
        SELECT origin, dev,
               CAST(SUM(paid) OVER (PARTITION BY origin ORDER BY dev)
                    AS BIGINT) AS c
        FROM cells
    ), maxo AS (SELECT CAST(MAX(origin) AS BIGINT) AS mo FROM cum
    ), links AS (
        SELECT a.origin, a.dev AS k, a.c AS ck, b.c AS ck1
        FROM cum a JOIN cum b ON b.origin = a.origin AND b.dev = a.dev + 1,
             maxo
        WHERE a.origin + a.dev + 1 <= mo
    ), factors AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS nk,
               SUM(CAST(ck1 AS DOUBLE)) / SUM(CAST(ck AS DOUBLE)) AS f
        FROM links GROUP BY k
    )
"""


@query(
    "bornhuetter_ferguson_reserves",
    oracle=_MONTHLY_TRIANGLE_SQL
    + """
    , latest AS (
        SELECT origin, MAX(dev) AS ld, MAX(c) AS paid FROM cum GROUP BY origin
    ), cdf AS (
        SELECT l.origin, l.ld, l.paid,
               COALESCE((SELECT EXP(SUM(LN(f.f))) FROM factors f
                         WHERE f.k >= l.ld), 1.0) AS cdf
        FROM latest l
    ), prem AS (
        SELECT (EXTRACT(year FROM o_orderdate) - 1992) * 12
               + EXTRACT(month FROM o_orderdate) - 1 AS origin,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS prem
        FROM orders GROUP BY 1
    ), elr AS (
        SELECT SUM(cdf.paid * 1.0) / SUM(prem.prem * 1.0) AS r
        FROM cdf JOIN prem ON prem.origin = cdf.origin
        WHERE cdf.ld = 4
    )
    SELECT CAST(cdf.origin AS BIGINT) AS origin_month,
           CAST(cdf.paid AS BIGINT) AS paid_cents,
           CAST(ROUND(1000000.0 / cdf.cdf) AS BIGINT) AS pct_reported_ppm,
           ROUND(cdf.paid * cdf.cdf / 100.0, 2) AS cl_ultimate_dollars,
           ROUND((cdf.paid + prem.prem * elr.r * (1 - 1.0 / cdf.cdf)) / 100.0,
                 2) AS bf_ultimate_dollars
    FROM cdf JOIN prem ON prem.origin = cdf.origin CROSS JOIN elr
    """,
)
def bornhuetter_ferguson_reserves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bornhuetter-Ferguson ultimates beside pure chain-ladder on a
    monthly origin x development-lag payment triangle (dev capped at
    4): CL multiplies paid-to-date by the product of volume-weighted
    link ratios, while BF blends a PRIOR ultimate (order premium x
    expected loss ratio from fully-developed months) with only the
    UNREPORTED fraction developed — immunizing young origins against
    leverage on tiny paid amounts, which is exactly where
    `chain_ladder_reserves`' weekly projection is shakiest. Reporting
    both per origin exposes where they diverge (immature months).

    Determinism: triangle cells and premiums are exact cent sums;
    link ratios are single double divisions; the CDF is an
    exp-sum-log over <=4 factors — identical rounded outputs.

    Scale shape: one fact join + (origin, dev) hash agg builds the
    triangle (<=400 cells at any scale factor); everything downstream
    is window math on that tiny relation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    mi = lambda c: ((F.year(c) - 1992) * 12 + F.month(c) - 1).cast("long")
    cells = (
        o.join(
            li.select(
                F.col("l_orderkey").alias("o_orderkey"),
                "l_shipdate",
                "l_extendedprice",
            ),
            "o_orderkey",
        )
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy(
            mi(F.col("o_orderdate")).alias("origin"),
            F.least(
                mi(F.col("l_shipdate")) - mi(F.col("o_orderdate")), F.lit(4)
            ).alias("dev"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("paid")
        )
    )
    cum = cells.select(
        "origin",
        "dev",
        F.sum("paid")
        .over(
            Window.partitionBy("origin")
            .orderBy("dev")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long")
        .alias("c"),
    ).transform(_ckpt)
    maxo = cum.agg(F.max("origin").cast("long").alias("mo"))
    a, b = cum.alias("a"), cum.alias("b")
    links = (
        a.join(
            b,
            (F.col("b.origin") == F.col("a.origin"))
            & (F.col("b.dev") == F.col("a.dev") + 1),
        )
        .crossJoin(F.broadcast(maxo))
        .where(F.col("a.origin") + F.col("a.dev") + 1 <= F.col("mo"))
        .select(
            F.col("a.dev").alias("k"),
            F.col("a.c").alias("ck"),
            F.col("b.c").alias("ck1"),
        )
    )
    factors = links.groupBy("k").agg(
        (F.sum(F.col("ck1").cast("double")) / F.sum(F.col("ck").cast("double"))).alias(
            "f"
        )
    )
    latest = cum.groupBy("origin").agg(
        F.max("dev").alias("ld"), F.max("c").alias("paid")
    )
    fx = factors.alias("fx")
    cdf = (
        latest.alias("l")
        .join(fx, F.col("fx.k") >= F.col("l.ld"), "left")
        .groupBy("origin", "ld", "paid")
        .agg(
            F.coalesce(F.exp(F.sum(F.log(F.col("fx.f")))), F.lit(1.0)).alias(
                "cdf"
            )
        )
    )
    prem = o.groupBy(mi(F.col("o_orderdate")).alias("origin")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("prem")
    )
    elr = (
        cdf.join(prem, "origin")
        .where(F.col("ld") == 4)
        .agg(
            (F.sum(F.col("paid") * 1.0) / F.sum(F.col("prem") * 1.0)).alias("r")
        )
    )
    return (
        cdf.join(prem, "origin")
        .crossJoin(F.broadcast(elr))
        .select(
            F.col("origin").cast("long").alias("origin_month"),
            F.col("paid").cast("long").alias("paid_cents"),
            F.round(1000000.0 / F.col("cdf")).cast("long").alias(
                "pct_reported_ppm"
            ),
            F.round(F.col("paid") * F.col("cdf") / 100.0, 2).alias(
                "cl_ultimate_dollars"
            ),
            F.round(
                (
                    F.col("paid")
                    + F.col("prem") * F.col("r") * (1 - 1.0 / F.col("cdf"))
                )
                / 100.0,
                2,
            ).alias("bf_ultimate_dollars"),
        )
    )


@query(
    "mack_factor_volatility",
    oracle=_MONTHLY_TRIANGLE_SQL
    + """
    , sig AS (
        SELECT links.k, factors.nk, factors.f,
               SUM(CAST(ck AS DOUBLE)
                   * POWER(CAST(ck1 AS DOUBLE) / ck - factors.f, 2))
               / (factors.nk - 1) AS s2
        FROM links JOIN factors ON factors.k = links.k
        WHERE factors.nk >= 2
        GROUP BY links.k, factors.nk, factors.f
    )
    SELECT CAST(k AS BIGINT) AS dev_k, nk AS n_origins,
           CAST(ROUND(f * 1000000) AS BIGINT) AS factor_micro,
           CAST(ROUND(s2 * 1000) AS BIGINT) AS mack_sigma2_milli,
           CAST(ROUND(sqrt(s2) / f * 1000000) AS BIGINT) AS factor_cv_ppm
    FROM sig
    """,
)
def mack_factor_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mack's distribution-free chain-ladder variance components on
    the monthly triangle: for each development lag k, sigma^2_k =
    sum C_ik (C_ik+1 / C_ik - f_k)^2 / (n_k - 1) measures how noisy
    the link ratio is across origins, and the coefficient of
    variation sigma_k / f_k says which development step dominates
    reserve uncertainty — the error bars that
    `bornhuetter_ferguson_reserves` and `chain_ladder_reserves`
    point estimates silently lack (step one of Mack's full MSE
    recursion, and the diagnostic that decides CL vs BF credibility
    weighting).

    Determinism: cumulative cells are exact integers; the weighted
    squared deviations use single-division link ratios against the
    shared volume-weighted factor; milli/ppm rounding dominates any
    50-term sum noise.

    Scale shape: reuses the same tiny triangle — the variance pass is
    one more hash agg over the link relation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    mi = lambda c: ((F.year(c) - 1992) * 12 + F.month(c) - 1).cast("long")
    cells = (
        o.join(
            li.select(
                F.col("l_orderkey").alias("o_orderkey"),
                "l_shipdate",
                "l_extendedprice",
            ),
            "o_orderkey",
        )
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy(
            mi(F.col("o_orderdate")).alias("origin"),
            F.least(
                mi(F.col("l_shipdate")) - mi(F.col("o_orderdate")), F.lit(4)
            ).alias("dev"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("paid")
        )
    )
    cum = cells.select(
        "origin",
        "dev",
        F.sum("paid")
        .over(
            Window.partitionBy("origin")
            .orderBy("dev")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long")
        .alias("c"),
    ).transform(_ckpt)
    maxo = cum.agg(F.max("origin").cast("long").alias("mo"))
    a, b = cum.alias("a"), cum.alias("b")
    links = (
        a.join(
            b,
            (F.col("b.origin") == F.col("a.origin"))
            & (F.col("b.dev") == F.col("a.dev") + 1),
        )
        .crossJoin(F.broadcast(maxo))
        .where(F.col("a.origin") + F.col("a.dev") + 1 <= F.col("mo"))
        .select(
            F.col("a.dev").alias("k"),
            F.col("a.c").alias("ck"),
            F.col("b.c").alias("ck1"),
        )
    )
    factors = links.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("nk"),
        (F.sum(F.col("ck1").cast("double")) / F.sum(F.col("ck").cast("double"))).alias(
            "f"
        ),
    )
    sig = (
        links.join(F.broadcast(factors), "k")
        .where(F.col("nk") >= 2)
        .groupBy("k", "nk", "f")
        .agg(
            (
                F.sum(
                    F.col("ck").cast("double")
                    * F.pow(
                        F.col("ck1").cast("double") / F.col("ck") - F.col("f"),
                        2,
                    )
                )
                / (F.col("nk") - 1)
            ).alias("s2")
        )
    )
    return sig.select(
        F.col("k").cast("long").alias("dev_k"),
        F.col("nk").alias("n_origins"),
        F.round(F.col("f") * 1000000).cast("long").alias("factor_micro"),
        F.round(F.col("s2") * 1000).cast("long").alias("mack_sigma2_milli"),
        F.round(F.sqrt("s2") / F.col("f") * 1000000)
        .cast("long")
        .alias("factor_cv_ppm"),
    )


_CAUSAL_TRIPLE_SQL = """
    WITH base AS (
        SELECT o.o_orderkey,
               CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS x,
               MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                   THEN 1 ELSE 0 END) AS m,
               MAX(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS y,
               MAX(n.n_regionkey) AS z
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY o.o_orderkey, o.o_orderpriority
    )
"""


@query(
    "front_door_adjustment",
    oracle=_CAUSAL_TRIPLE_SQL
    + """
    , px AS (
        SELECT x, CAST(COUNT(*) AS BIGINT) AS nx FROM base GROUP BY x
    ), n AS (SELECT CAST(SUM(nx) AS BIGINT) AS n FROM px
    ), pmx AS (
        SELECT x, m, CAST(COUNT(*) AS BIGINT) AS nmx FROM base GROUP BY x, m
    ), pymx AS (
        SELECT m, x, AVG(y * 1.0) AS py, CAST(COUNT(*) AS BIGINT) AS c
        FROM base GROUP BY m, x
    ), inner_y AS (
        -- sum_x' P(y|m,x') P(x')  for each m
        SELECT pymx.m, SUM(pymx.py * px.nx * 1.0 / n.n) AS ym
        FROM pymx JOIN px ON px.x = pymx.x CROSS JOIN n
        GROUP BY pymx.m
    ), pmg AS (
        SELECT pmx.x, pmx.m, pmx.nmx * 1.0 / px.nx AS pm
        FROM pmx JOIN px ON px.x = pmx.x
    ), fd AS (
        SELECT SUM(CASE WHEN g.x = 1 THEN g.pm * iy.ym ELSE 0 END)
               - SUM(CASE WHEN g.x = 0 THEN g.pm * iy.ym ELSE 0 END) AS ate
        FROM pmg g JOIN inner_y iy ON iy.m = g.m
    ), naive AS (
        SELECT AVG(CASE WHEN x = 1 THEN y * 1.0 END)
               - AVG(CASE WHEN x = 0 THEN y * 1.0 END) AS d
        FROM base
    )
    SELECT n.n AS n_orders,
           CAST(ROUND(naive.d * 1000000) AS BIGINT) AS naive_diff_ppm,
           CAST(ROUND(fd.ate * 1000000) AS BIGINT) AS front_door_ate_ppm
    FROM n, fd, naive
    """,
)
def front_door_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearl's front-door adjustment computed exactly from discrete
    frequencies: exposure x = urgent priority, mediator m = any
    lineitem shipping >60 days after order, outcome y = any returned
    lineitem. The formula sum_m [P(m|x=1) - P(m|x=0)] * sum_x'
    P(y|m,x') P(x') identifies the causal effect THROUGH the mediator
    even when x <- U -> y confounding is unobserved — the
    identification strategy none of the existing causal queries
    (`propensity_match_att` / `doubly_robust_ate` / `iv_wald_2sls`)
    can mimic, valid precisely when the mediator is shielded from the
    confounder. Reported beside the naive difference so the
    confounding bias is visible.

    Determinism: every probability is an exact integer ratio; the
    g-formula sums have <=8 terms; one micro rounding.

    Scale shape: a single order-grain agg (the lineitem join
    collapses map-side) yields the (x, m, y, z) contingency cube —
    all adjustment math runs on <=8 cells.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cst = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    base = (
        o.join(
            li.select(
                F.col("l_orderkey").alias("o_orderkey"),
                "l_shipdate",
                "l_returnflag",
            ),
            "o_orderkey",
        )
        .join(
            F.broadcast(
                cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .join(
            F.broadcast(
                nat.select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_regionkey"
                )
            ),
            "c_nationkey",
        )
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60),
                    1,
                ).otherwise(0)
            ).alias("m"),
            F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
                "y"
            ),
            F.max("n_regionkey").alias("z"),
        )
        .select(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("x"),
            "m",
            "y",
        )
    )
    base = _ckpt(base)  # shared fan-out relation
    px = base.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("nx"))
    px = _ckpt(px)  # shared fan-out relation
    n = px.agg(F.sum("nx").cast("long").alias("n"))
    n = _ckpt(n)  # shared fan-out relation
    pmx = base.groupBy("x", "m").agg(F.count(F.lit(1)).cast("long").alias("nmx"))
    pymx = base.groupBy("m", "x").agg(F.avg(F.col("y") * 1.0).alias("py"))
    inner_y = (
        pymx.join(F.broadcast(px), "x")
        .crossJoin(F.broadcast(n))
        .groupBy("m")
        .agg(F.sum(F.col("py") * F.col("nx") * 1.0 / F.col("n")).alias("ym"))
    )
    given = pmx.join(F.broadcast(px), "x").select(
        "x", "m", (F.col("nmx") * 1.0 / F.col("nx")).alias("pm")
    )
    fd = given.join(F.broadcast(inner_y), "m").agg(
        (
            F.sum(F.when(F.col("x") == 1, F.col("pm") * F.col("ym")).otherwise(0.0))
            - F.sum(
                F.when(F.col("x") == 0, F.col("pm") * F.col("ym")).otherwise(0.0)
            )
        ).alias("ate")
    )
    naive = base.agg(
        (
            F.avg(F.when(F.col("x") == 1, F.col("y") * 1.0))
            - F.avg(F.when(F.col("x") == 0, F.col("y") * 1.0))
        ).alias("d")
    )
    return (
        n.crossJoin(F.broadcast(fd))
        .crossJoin(F.broadcast(naive))
        .select(
            F.col("n").alias("n_orders"),
            F.round(F.col("d") * 1000000).cast("long").alias("naive_diff_ppm"),
            F.round(F.col("ate") * 1000000)
            .cast("long")
            .alias("front_door_ate_ppm"),
        )
    )


@query(
    "backdoor_standardization",
    oracle=_CAUSAL_TRIPLE_SQL
    + """
    , pz AS (
        SELECT z, CAST(COUNT(*) AS BIGINT) AS nz FROM base GROUP BY z
    ), n AS (SELECT CAST(SUM(nz) AS BIGINT) AS n FROM pz
    ), pyxz AS (
        SELECT z, x, AVG(y * 1.0) AS py FROM base GROUP BY z, x
    ), bd AS (
        SELECT SUM((p1.py - p0.py) * pz.nz * 1.0 / n.n) AS ate
        FROM pz
        JOIN pyxz p1 ON p1.z = pz.z AND p1.x = 1
        JOIN pyxz p0 ON p0.z = pz.z AND p0.x = 0
        CROSS JOIN n
    ), naive AS (
        SELECT AVG(CASE WHEN x = 1 THEN y * 1.0 END)
               - AVG(CASE WHEN x = 0 THEN y * 1.0 END) AS d
        FROM base
    )
    SELECT n.n AS n_orders,
           CAST(ROUND(naive.d * 1000000) AS BIGINT) AS naive_diff_ppm,
           CAST(ROUND(bd.ate * 1000000) AS BIGINT) AS backdoor_ate_ppm
    FROM n, bd, naive
    """,
)
def backdoor_standardization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backdoor (g-formula) standardization for the same exposure and
    outcome as `front_door_adjustment`, adjusting instead for the
    observed confounder z = customer region: ATE = sum_z P(z)
    [P(y|x=1,z) - P(y|x=0,z)] — the direct-standardization estimate
    that is valid when z closes all backdoor paths. Running both
    strategies on the same triple is the classic identification
    cross-check: agreement supports the causal model, divergence
    localizes which assumption (shielded mediator vs measured
    confounding) fails.

    Determinism: exact integer ratios throughout; 5-stratum weighted
    sum; one micro rounding.

    Scale shape: same single order-grain cube; adjustment is a 10-row
    join-and-weight.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cst = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    base = (
        o.join(
            li.select(
                F.col("l_orderkey").alias("o_orderkey"),
                "l_shipdate",
                "l_returnflag",
            ),
            "o_orderkey",
        )
        .join(
            F.broadcast(
                cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .join(
            F.broadcast(
                nat.select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_regionkey"
                )
            ),
            "c_nationkey",
        )
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
                "y"
            ),
            F.max("n_regionkey").alias("z"),
        )
        .select(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("x"),
            "y",
            "z",
        )
    )
    base = _ckpt(base)  # shared fan-out relation
    pz = base.groupBy("z").agg(F.count(F.lit(1)).cast("long").alias("nz"))
    pz = _ckpt(pz)  # shared fan-out relation
    n = pz.agg(F.sum("nz").cast("long").alias("n"))
    n = _ckpt(n)  # shared fan-out relation
    pyxz = base.groupBy("z", "x").agg(F.avg(F.col("y") * 1.0).alias("py"))
    pyxz = _ckpt(pyxz)  # shared fan-out relation
    p1 = pyxz.where(F.col("x") == 1).select("z", F.col("py").alias("py1"))
    p0 = pyxz.where(F.col("x") == 0).select("z", F.col("py").alias("py0"))
    bd = (
        pz.join(F.broadcast(p1), "z")
        .join(F.broadcast(p0), "z")
        .crossJoin(F.broadcast(n))
        .agg(
            F.sum(
                (F.col("py1") - F.col("py0")) * F.col("nz") * 1.0 / F.col("n")
            ).alias("ate")
        )
    )
    naive = base.agg(
        (
            F.avg(F.when(F.col("x") == 1, F.col("y") * 1.0))
            - F.avg(F.when(F.col("x") == 0, F.col("y") * 1.0))
        ).alias("d")
    )
    return (
        n.crossJoin(F.broadcast(bd))
        .crossJoin(F.broadcast(naive))
        .select(
            F.col("n").alias("n_orders"),
            F.round(F.col("d") * 1000000).cast("long").alias("naive_diff_ppm"),
            F.round(F.col("ate") * 1000000)
            .cast("long")
            .alias("backdoor_ate_ppm"),
        )
    )


_JS_COMPONENTS_SQL = """
    WITH a AS (
        SELECT c.c_nationkey AS nk,
               CAST(COUNT(*) AS BIGINT) AS n,
               AVG(CAST(ROUND(o.o_totalprice * 100) AS BIGINT) * 1.0) AS mean_a,
               VAR_SAMP(CAST(ROUND(o.o_totalprice * 100) AS BIGINT) * 1.0)
                   AS var_a
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE o.o_orderdate < DATE '1998-01-01'
        GROUP BY 1
    ), g AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k, AVG(mean_a) AS grand,
               AVG(var_a / n) AS sig2,
               SUM(POWER(mean_a - (SELECT AVG(mean_a) FROM a), 2)) AS s
        FROM a
    ), c AS (
        SELECT k, grand, sig2, s,
               GREATEST(0.0, 1.0 - (k - 3) * sig2 / s) AS shrink
        FROM g
    )
"""


@query(
    "james_stein_nation_means",
    oracle=_JS_COMPONENTS_SQL
    + """
    SELECT CAST(a.nk AS BIGINT) AS nation_key, a.n AS n_orders,
           CAST(ROUND(a.mean_a) AS BIGINT) AS raw_mean_cents,
           CAST(ROUND(c.grand + c.shrink * (a.mean_a - c.grand)) AS BIGINT)
               AS js_mean_cents,
           CAST(ROUND(c.shrink * 1000) AS BIGINT) AS shrink_weight_milli
    FROM a, c
    """,
)
def james_stein_nation_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """James-Stein shrinkage of the 25 pre-1998 nation mean tickets
    toward the grand mean: the positive-part factor c = max(0, 1 -
    (k-3) sigma^2 / S) (sigma^2 = average squared standard error, S =
    between-nation dispersion) pulls noisy nation means in, and by
    Stein's paradox the joint estimate dominates the raw means in
    total MSE whenever k >= 4 — the canonical shrinkage beside the
    beta-binomial `eb_shrunk_ctr` (rates) and `shrunk_group_slopes`
    (regressions), here on plain Gaussian-ish means.

    Determinism: cent-exact inputs; means and variances are standard
    double aggregates; a single shared shrink factor; all outputs
    rounded to cents/milli.

    Scale shape: one filtered fact agg to 25 (n, mean, var) rows,
    one scalar pass for the shrink factor, broadcast back.
    """
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("long") * 1.0
    a = (
        o.join(
            F.broadcast(
                cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .where(F.col("o_orderdate") < F.lit("1998-01-01"))
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg(cents).alias("mean_a"),
            F.var_samp(cents).alias("var_a"),
        )
        .transform(_ckpt)
    )
    grand = a.agg(F.avg("mean_a").alias("grand"))
    g = a.crossJoin(F.broadcast(grand)).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("grand").alias("grand"),
        F.avg(F.col("var_a") / F.col("n")).alias("sig2"),
        F.sum(F.pow(F.col("mean_a") - F.col("grand"), 2)).alias("s"),
    )
    c = g.select(
        "k",
        "grand",
        F.greatest(
            F.lit(0.0), 1.0 - (F.col("k") - 3) * F.col("sig2") / F.col("s")
        ).alias("shrink"),
    )
    return a.crossJoin(F.broadcast(c)).select(
        F.col("nk").cast("long").alias("nation_key"),
        F.col("n").alias("n_orders"),
        F.round(F.col("mean_a")).cast("long").alias("raw_mean_cents"),
        F.round(
            F.col("grand") + F.col("shrink") * (F.col("mean_a") - F.col("grand"))
        )
        .cast("long")
        .alias("js_mean_cents"),
        F.round(F.col("shrink") * 1000).cast("long").alias(
            "shrink_weight_milli"
        ),
    )


@query(
    "shrinkage_holdout_mse",
    oracle=_JS_COMPONENTS_SQL
    + """
    , b AS (
        SELECT c.c_nationkey AS nk,
               AVG(CAST(ROUND(o.o_totalprice * 100) AS BIGINT) * 1.0) AS mean_b
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE o.o_orderdate >= DATE '1998-01-01'
        GROUP BY 1
    ), scored AS (
        SELECT a.nk, a.mean_a,
               c.grand + c.shrink * (a.mean_a - c.grand) AS js,
               c.grand AS grand, b.mean_b
        FROM a JOIN b ON b.nk = a.nk, c
    ), mse AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               AVG(POWER(mean_a - mean_b, 2)) AS raw_mse,
               AVG(POWER(js - mean_b, 2)) AS js_mse,
               AVG(POWER(grand - mean_b, 2)) AS grand_mse
        FROM scored
    )
    SELECT mse.k AS n_nations,
           CAST(ROUND(c.shrink * 1000) AS BIGINT) AS shrink_weight_milli,
           CAST(ROUND(sqrt(raw_mse)) AS BIGINT) AS raw_rmse_cents,
           CAST(ROUND(sqrt(js_mse)) AS BIGINT) AS js_rmse_cents,
           CAST(ROUND(sqrt(grand_mse)) AS BIGINT) AS grand_rmse_cents,
           CAST(CASE WHEN js_mse <= raw_mse THEN 1 ELSE 0 END AS BIGINT)
               AS js_beats_raw
    FROM mse, c
    """,
)
def shrinkage_holdout_mse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-holdout validation of `james_stein_nation_means`:
    estimators fit on pre-1998 orders (raw nation means, JS-shrunk
    means, and the grand-mean-only degenerate) predict each nation's
    post-1998 mean ticket, and the per-nation RMSEs are compared —
    the out-of-sample experiment Stein's theorem promises to win on
    average, run on a real temporal split rather than simulation.
    The three columns bracket the bias-variance tradeoff: raw
    (unbiased, noisy), grand (maximal bias, zero variance), JS (the
    data-chosen blend).

    Determinism: both halves are exact cent aggregates; the holdout
    comparison is 25-term double sums rounded to whole cents.

    Scale shape: two filtered fact aggs (fit half, holdout half) to
    25 rows each, one join, one scalar agg.
    """
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("long") * 1.0
    keyed = o.join(
        F.broadcast(
            cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
        ),
        "o_custkey",
    )
    a = (
        keyed.where(F.col("o_orderdate") < F.lit("1998-01-01"))
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg(cents).alias("mean_a"),
            F.var_samp(cents).alias("var_a"),
        )
        .transform(_ckpt)
    )
    b = (
        keyed.where(F.col("o_orderdate") >= F.lit("1998-01-01"))
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.avg(cents).alias("mean_b"))
    )
    grand = a.agg(F.avg("mean_a").alias("grand"))
    g = a.crossJoin(F.broadcast(grand)).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("grand").alias("grand"),
        F.avg(F.col("var_a") / F.col("n")).alias("sig2"),
        F.sum(F.pow(F.col("mean_a") - F.col("grand"), 2)).alias("s"),
    )
    c = g.select(
        "grand",
        F.greatest(
            F.lit(0.0), 1.0 - (F.col("k") - 3) * F.col("sig2") / F.col("s")
        ).alias("shrink"),
    )
    scored = (
        a.join(b, "nk")
        .crossJoin(F.broadcast(c))
        .select(
            "mean_a",
            "mean_b",
            (
                F.col("grand")
                + F.col("shrink") * (F.col("mean_a") - F.col("grand"))
            ).alias("js"),
            "grand",
            "shrink",
        )
    )
    mse = scored.groupBy("shrink").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.avg(F.pow(F.col("mean_a") - F.col("mean_b"), 2)).alias("raw_mse"),
        F.avg(F.pow(F.col("js") - F.col("mean_b"), 2)).alias("js_mse"),
        F.avg(F.pow(F.col("grand") - F.col("mean_b"), 2)).alias("grand_mse"),
    )
    return mse.select(
        F.col("k").alias("n_nations"),
        F.round(F.col("shrink") * 1000).cast("long").alias(
            "shrink_weight_milli"
        ),
        F.round(F.sqrt("raw_mse")).cast("long").alias("raw_rmse_cents"),
        F.round(F.sqrt("js_mse")).cast("long").alias("js_rmse_cents"),
        F.round(F.sqrt("grand_mse")).cast("long").alias("grand_rmse_cents"),
        F.when(F.col("js_mse") <= F.col("raw_mse"), 1)
        .otherwise(0)
        .cast("long")
        .alias("js_beats_raw"),
    )


@query(
    "bin_width_rules_compare",
    oracle="""
    WITH v AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               STDDEV_SAMP(c * 1.0) AS sd,
               CAST(MIN(c) AS BIGINT) AS lo, CAST(MAX(c) AS BIGINT) AS hi,
               PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY c) AS q1,
               PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY c) AS q3
        FROM v
    )
    SELECT n AS n_orders,
           CAST(CEIL(ln(n) / ln(2.0)) + 1 AS BIGINT) AS sturges_bins,
           CAST(ROUND(3.49 * sd / POWER(n * 1.0, 1.0 / 3)) AS BIGINT)
               AS scott_width_cents,
           CAST(CEIL((hi - lo)
                / (3.49 * sd / POWER(n * 1.0, 1.0 / 3))) AS BIGINT)
               AS scott_bins,
           CAST(ROUND(2.0 * (q3 - q1) / POWER(n * 1.0, 1.0 / 3)) AS BIGINT)
               AS fd_width_cents,
           CAST(CEIL((hi - lo)
                / (2.0 * (q3 - q1) / POWER(n * 1.0, 1.0 / 3))) AS BIGINT)
               AS fd_bins
    FROM s
    """,
)
def bin_width_rules_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three classical histogram bin-width rules evaluated on the
    order-value distribution: Sturges (log2 n + 1 bins — assumes
    near-normal, undersmooths heavy tails), Scott (3.49 sigma
    n^-1/3 — variance-optimal for Gaussians), and Freedman-Diaconis
    (2 IQR n^-1/3 — robust to outliers via quartiles). The side-by-
    side is the profiling step before `histogram_order_totals`
    commits to a bucket count; disagreement between Scott and FD is
    itself the skew/outlier diagnostic.

    Determinism: cents are exact; quartiles are PERCENTILE_DISC data
    values; sd and the cube roots are single IEEE expressions
    rounded to whole cents/bins.

    Scale shape: one scalar aggregate (the quantiles ride the same
    per-group sort any exact-percentile query pays) — no joins.
    """
    o = load_table(spark, sf_dir, "orders")
    v = o.select(F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
    s = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.stddev_samp(F.col("c") * 1.0).alias("sd"),
        F.min("c").alias("lo"),
        F.max("c").alias("hi"),
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY c)").alias("q1"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY c)").alias("q3"),
    )
    cube = F.pow(F.col("n") * 1.0, 1.0 / 3)
    scott_w = 3.49 * F.col("sd") / cube
    fd_w = 2.0 * (F.col("q3") - F.col("q1")) / cube
    return s.select(
        F.col("n").alias("n_orders"),
        (F.ceil(F.log(F.col("n") * 1.0) / F.log(F.lit(2.0))) + 1)
        .cast("long")
        .alias("sturges_bins"),
        F.round(scott_w).cast("long").alias("scott_width_cents"),
        F.ceil((F.col("hi") - F.col("lo")) / scott_w)
        .cast("long")
        .alias("scott_bins"),
        F.round(fd_w).cast("long").alias("fd_width_cents"),
        F.ceil((F.col("hi") - F.col("lo")) / fd_w).cast("long").alias("fd_bins"),
    )


@query(
    "histogram_mdl_select",
    oracle="""
    WITH v AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(MIN(c) AS BIGINT) AS lo,
               CAST(MAX(c) AS BIGINT) AS hi
        FROM v
    ), bs AS (SELECT UNNEST(generate_series(2, 7)) AS e
    ), grids AS (SELECT CAST(1 << e AS BIGINT) AS bins FROM bs
    ), binned AS (
        SELECT g.bins,
               LEAST((v.c - s.lo) * g.bins // (s.hi - s.lo), g.bins - 1)
                   AS b
        FROM v CROSS JOIN grids g CROSS JOIN s
    ), cnts AS (
        SELECT bins, b, CAST(COUNT(*) AS BIGINT) AS nb
        FROM binned GROUP BY 1, 2
    ), ll AS (
        SELECT cnts.bins,
               SUM(cnts.nb * ln(cnts.nb * 1.0 * cnts.bins
                                / (s.n * 1.0 * (s.hi - s.lo)))) AS loglik,
               (cnts.bins - 1) / 2.0 * ln(s.n * 1.0) AS pen
        FROM cnts, s GROUP BY cnts.bins, s.n, s.hi, s.lo
    ), scored AS (
        SELECT bins, loglik, pen, loglik - pen AS score,
               ROW_NUMBER() OVER (ORDER BY loglik - pen DESC, bins ASC) AS rk
        FROM ll
    )
    SELECT CAST(bins AS BIGINT) AS n_bins,
           CAST(ROUND(loglik) AS BIGINT) AS loglik_nats,
           CAST(ROUND(pen) AS BIGINT) AS bic_penalty_nats,
           CAST(ROUND(loglik - pen) AS BIGINT) AS score_nats,
           CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_best
    FROM scored
    """,
)
def histogram_mdl_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIC/MDL histogram bin-count selection: equal-width histograms
    with 4..128 bins (powers of two) are scored by penalized
    log-likelihood — sum n_b ln(n_b B / (n R)) minus (B-1)/2 ln n —
    and the argmax is the principled bin count the rule-of-thumb trio
    in `bin_width_rules_compare` approximates. More bins always raise
    raw likelihood; the penalty makes overfitting visible as the
    score turning over.

    Determinism: bin assignment is EXACT integer floor arithmetic
    ((c - lo) * B // range — no float binning, so boundary cents land
    identically); per-bin counts are exact; the likelihood sum is
    <=128 double terms rounded to whole nats.

    Scale shape: the 6-grid sweep multiplies a stateless projection,
    then one (bins, b) hash agg with map-side combine — the multi-
    resolution pass costs one shuffle of <=6x128 cells total.
    """
    o = load_table(spark, sf_dir, "orders")
    v = o.select(F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
    s = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("c").alias("lo"),
        F.max("c").alias("hi"),
    )
    grids = spark.createDataFrame([(4,), (8,), (16,), (32,), (64,), (128,)], "bins long")
    binned = (
        v.crossJoin(F.broadcast(grids))
        .crossJoin(F.broadcast(s))
        .select(
            "bins",
            "n",
            "lo",
            "hi",
            F.least(
                F.floor(
                    (F.col("c") - F.col("lo"))
                    * F.col("bins")
                    / (F.col("hi") - F.col("lo"))
                ),
                F.col("bins") - 1,
            ).alias("b"),
        )
    )
    cnts = binned.groupBy("bins", "b", "n", "lo", "hi").agg(
        F.count(F.lit(1)).cast("long").alias("nb")
    )
    ll = cnts.groupBy("bins", "n", "lo", "hi").agg(
        F.sum(
            F.col("nb")
            * F.log(
                F.col("nb")
                * 1.0
                * F.col("bins")
                / (F.col("n") * 1.0 * (F.col("hi") - F.col("lo")))
            )
        ).alias("loglik")
    ).select(
        "bins",
        "loglik",
        ((F.col("bins") - 1) / 2.0 * F.log(F.col("n") * 1.0)).alias("pen"),
    )
    scored = ll.select(
        "bins",
        "loglik",
        "pen",
        (F.col("loglik") - F.col("pen")).alias("score"),
        F.row_number()
        .over(Window.orderBy(F.desc(F.col("loglik") - F.col("pen")), F.asc("bins")))
        .alias("rk"),
    )
    return scored.select(
        F.col("bins").cast("long").alias("n_bins"),
        F.round("loglik").cast("long").alias("loglik_nats"),
        F.round("pen").cast("long").alias("bic_penalty_nats"),
        F.round("score").cast("long").alias("score_nats"),
        F.when(F.col("rk") == 1, 1).otherwise(0).cast("long").alias("is_best"),
    )


def _trade_closure_sql() -> str:
    """Min-plus distance closure d5 (32-hop cover) over the directed
    nation trade-cost graph, as materialized CTE stages."""
    parts = [
        _TRADE_EDGE_SQL
        + """
    , d0 AS MATERIALIZED (
        SELECT u, v, CAST(MIN(w) AS BIGINT) AS d FROM (
            SELECT u, v, w FROM edges
            UNION ALL
            SELECT n_nationkey, n_nationkey, 0 FROM nation
        ) GROUP BY u, v
    )"""
    ]
    for k in range(1, 6):
        parts.append(
            f""", d{k} AS MATERIALIZED (
        SELECT q.u, q.v, CAST(MIN(q.d) AS BIGINT) AS d FROM (
            SELECT x.u, y.v, x.d + y.d AS d
            FROM d{k-1} x JOIN d{k-1} y ON y.u = x.v
            UNION ALL SELECT u, v, d FROM d{k-1}
        ) q GROUP BY q.u, q.v
    )"""
        )
    return "".join(parts)


def _sigma_rounds_sql(rounds: int = 5) -> str:
    """Shortest-path count DP: sigma_k(s,v) over the closure d5."""
    parts = [
        """
    , s0 AS MATERIALIZED (
        SELECT n_nationkey AS s, n_nationkey AS v, CAST(1 AS BIGINT) AS sig
        FROM nation
    )"""
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f""", s{k} AS MATERIALIZED (
        SELECT s, v, CAST(1 AS BIGINT) AS sig FROM s0
        UNION ALL
        SELECT sk.s, e.v, CAST(SUM(sk.sig) AS BIGINT) AS sig
        FROM s{k-1} sk
        JOIN edges e ON e.u = sk.v
        JOIN d5 da ON da.u = sk.s AND da.v = sk.v
        JOIN d5 db ON db.u = sk.s AND db.v = e.v
        WHERE da.d + e.w = db.d AND e.v <> sk.s
        GROUP BY sk.s, e.v
    )"""
        )
    return "".join(parts)


_TINF = "4611686018427387904"


def _trade_matrices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row (W, D) matrices for the nation trade-cost graph, both
    as 625-element BIGINT arrays indexed u*25+v (nationkey is the
    schema-fixed 0..24 TPC-H dimension at ANY scale factor).

    W = edge weights (INF off the graph); D = the same 5-squaring
    min-plus closure the relational form computed, evaluated IN-ROW
    with an ``aggregate`` accumulator (the dtw precedent): the lambda
    variable binds the PREVIOUS round's materialized array, so five
    rounds cost 5 x 625 x 25 interpreted ops with no expression
    blow-up and no per-round shuffle/checkpoint barriers. The one-row
    result is ckpt'd so downstream loops read stored arrays instead
    of inlining the builder expression.
    """
    edges = _trade_edges(spark, sf_dir)
    mat = edges.agg(
        F.collect_list(
            F.struct(
                F.col("u").cast("int").alias("u"),
                F.col("v").cast("int").alias("v"),
                F.col("w").alias("w"),
            )
        ).alias("es")
    )
    w_expr = (
        "transform(sequence(0, 624), i -> coalesce(element_at("
        "map_from_entries(transform(es, e -> struct(e.u * 25 + e.v, e.w)))"
        f", i), {_TINF}L))"
    )
    # D0: diagonal zeros (i = 26u exactly when u = v)
    d0 = f"transform(W, (x, i) -> IF(pmod(i, 26) = 0, CAST(0 AS BIGINT), x))"
    du = "element_at(D, CAST((i div 25) * 25 + x + 1 AS INT))"
    dv = "element_at(D, CAST(x * 25 + pmod(i, 25) + 1 AS INT))"
    step = (
        f"IF({du} >= {_TINF}L OR {dv} >= {_TINF}L, {_TINF}L, {du} + {dv})"
    )
    d_expr = (
        f"aggregate(sequence(1, 5), {d0}, (D, r) -> "
        "transform(sequence(0, 624), i -> least("
        "element_at(D, CAST(i + 1 AS INT)), "
        f"aggregate(sequence(0, 24), {_TINF}L, (m, x) -> least(m, {step})"
        "))))"
    )
    return (
        mat.select(F.expr(w_expr).alias("W"))
        .select("W", F.expr(d_expr).alias("D"))
        .transform(_ckpt)
    )


def _trade_closure_spark(spark: SparkSession, sf_dir: str):
    """(edges, closure) DataFrames for the nation trade-cost graph —
    the closure relation (u, v, d) is the exploded in-row matrix from
    :func:`_trade_matrices` (diagonal kept, unreachable pairs absent),
    value-identical to the former five relational min-plus squarings
    but without their per-round shuffles and checkpoint barriers."""
    edges = _trade_edges(spark, sf_dir)
    row = _trade_matrices(spark, sf_dir)
    d = (
        row.select(F.posexplode("D").alias("i", "d"))
        .where(F.col("d") < int(_TINF))
        .select(
            (F.col("i").cast("long") / 25).cast("long").alias("u"),
            F.pmod(F.col("i"), F.lit(25)).cast("long").alias("v"),
            "d",
        )
    )
    return edges, d


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(u, v, w) micro-nat trade-cost edges for the nation graph."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    flows = (
        li.join(
            F.broadcast(s.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")),
            "l_suppkey",
        )
        .join(o.select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"), "l_orderkey")
        .join(
            F.broadcast(cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")),
            "o_custkey",
        )
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(F.col("s_nationkey").alias("u"), F.col("c_nationkey").alias("v"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("f")
        )
    )
    tot = flows.agg(F.sum("f").cast("long").alias("tf"))
    edges = flows.crossJoin(F.broadcast(tot)).select(
        "u",
        "v",
        F.round(-F.log(F.col("f").cast("double") / F.col("tf")) * 1000000)
        .cast("long")
        .alias("w"),
    ).transform(_ckpt)
    return edges


@query(
    "betweenness_nation_trade",
    oracle=_trade_closure_sql()
    + _sigma_rounds_sql(5)
    + """
    , bc AS (
        SELECT sv.v AS node,
               CAST(COUNT(*) AS BIGINT) AS n_pairs_through,
               SUM(ssv.sig * svt.sig * 1.0 / sst.sig) AS b
        FROM d5 st
        JOIN d5 sv ON sv.u = st.u
        JOIN d5 vt ON vt.u = sv.v AND vt.v = st.v
        JOIN s5 sst ON sst.s = st.u AND sst.v = st.v
        JOIN s5 ssv ON ssv.s = sv.u AND ssv.v = sv.v
        JOIN s5 svt ON svt.s = vt.u AND svt.v = vt.v
        WHERE st.u <> st.v AND sv.v <> st.u AND sv.v <> st.v
          AND sv.d + vt.d = st.d
        GROUP BY sv.v
    )
    SELECT CAST(n.n_nationkey AS BIGINT) AS nation_key,
           CAST(COALESCE(bc.n_pairs_through, 0) AS BIGINT) AS n_pairs_through,
           CAST(ROUND(COALESCE(bc.b, 0) * 1000) AS BIGINT) AS betweenness_milli
    FROM nation n LEFT JOIN bc ON bc.node = n.n_nationkey
    """,
    bench=True,
)
def betweenness_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Freeman betweenness centrality on the directed nation
    trade-cost graph: shortest-path distances come from five min-plus
    squarings (32-hop cover of the 25-node graph), path COUNTS from a
    five-round counting DP over the converged distances (sigma(s,v) =
    sum of predecessor counts along tight edges), and betweenness
    sums sigma_sv * sigma_vt / sigma_st over every s,t pair whose
    shortest distance decomposes through v. The broker-role measure
    the local views (`pagerank_trade_graph`, `hits_hub_authority`,
    `harmonic_centrality_radius2`) cannot express — a nation can have
    modest flow yet sit on most cheap routes.

    Determinism: distances and counts are exact integers; the only
    division is the final ratio sum (micro-nat weights make ties — and
    hence sigma > 1 — possible but exact), milli-rounded.

    Scale shape: one fact agg to <=600 edges, then EVERYTHING runs
    in-row on the schema-bounded 25-node graph (nationkey 0..24 at
    any SF): the min-plus closure, the five path-count rounds, and
    the s,t,v betweenness sum are ``aggregate``/``transform`` HOFs
    over 625-element arrays on a single checkpointed row — the same
    precedent as the dtw in-row DP. No per-round shuffles, no
    barriers, no six-way join; fact data is touched exactly once.
    """
    row = _trade_matrices(spark, sf_dir)
    inf = _TINF
    # sigma: 5 rounds of shortest-path counting over tight edges,
    # S[s*25+v]; i div 25 = s, pmod(i, 25) = v, inner u is the
    # predecessor. Matches the relational rounds: diagonal pinned to
    # 1 each round, v != s, contributions only along edges that lie
    # on a shortest path from s.
    w_uv = "element_at(W, CAST(u * 25 + pmod(i, 25) + 1 AS INT))"
    d_su = "element_at(D, CAST((i div 25) * 25 + u + 1 AS INT))"
    d_sv = "element_at(D, CAST(i + 1 AS INT))"
    s_su = "element_at(S, CAST((i div 25) * 25 + u + 1 AS INT))"
    s0 = (
        "transform(sequence(0, 624), i -> "
        "IF(pmod(i, 26) = 0, CAST(1 AS BIGINT), CAST(0 AS BIGINT)))"
    )
    sig_expr = (
        f"aggregate(sequence(1, 5), {s0}, (S, r) -> "
        "transform(sequence(0, 624), i -> IF(pmod(i, 26) = 0, "
        "CAST(1 AS BIGINT), "
        "aggregate(sequence(0, 24), CAST(0 AS BIGINT), (acc, u) -> "
        f"acc + IF({w_uv} < {inf}L AND {d_su} < {inf}L "
        f"AND {d_su} + {w_uv} = {d_sv} "
        "AND pmod(i, 25) != (i div 25), "
        f"{s_su}, CAST(0 AS BIGINT))))))"
    )
    row2 = row.select("W", "D", F.expr(sig_expr).alias("S")).transform(_ckpt)
    # betweenness: for each v, sweep all (s, t) pairs (p = s*25+t) and
    # accumulate count + sigma ratio where d(s,v) + d(v,t) = d(s,t)
    # and all three path counts exist — identical predicate set to the
    # former six-way relational join.
    d_st = "element_at(D, CAST(p + 1 AS INT))"
    d_sv2 = "element_at(D, CAST((p div 25) * 25 + v + 1 AS INT))"
    d_vt = "element_at(D, CAST(v * 25 + pmod(p, 25) + 1 AS INT))"
    g_st = "element_at(S, CAST(p + 1 AS INT))"
    g_sv = "element_at(S, CAST((p div 25) * 25 + v + 1 AS INT))"
    g_vt = "element_at(S, CAST(v * 25 + pmod(p, 25) + 1 AS INT))"
    bc_expr = (
        "transform(sequence(0, 24), v -> "
        "aggregate(sequence(0, 624), "
        "named_struct('c', CAST(0 AS BIGINT), 'b', CAST(0 AS DOUBLE)), "
        "(acc, p) -> IF("
        "(p div 25) != pmod(p, 25) AND v != (p div 25) "
        "AND v != pmod(p, 25) "
        f"AND {d_st} < {inf}L AND {d_sv2} < {inf}L AND {d_vt} < {inf}L "
        f"AND {d_sv2} + {d_vt} = {d_st} "
        f"AND {g_st} > 0L AND {g_sv} > 0L AND {g_vt} > 0L, "
        "named_struct('c', acc.c + CAST(1 AS BIGINT), "
        f"'b', acc.b + CAST({g_sv} * {g_vt} AS DOUBLE) / "
        f"CAST({g_st} AS DOUBLE)), acc)))"
    )
    return (
        row2.select(F.posexplode(F.expr(bc_expr)).alias("v", "r"))
        .select(
            F.col("v").cast("long").alias("nation_key"),
            F.col("r.c").alias("n_pairs_through"),
            F.round(F.col("r.b") * 1000).cast("long").alias(
                "betweenness_milli"
            ),
        )
    )


@query(
    "closeness_exact_nation",
    oracle=_trade_closure_sql()
    + """
    , agg AS (
        SELECT u AS node, CAST(COUNT(*) - 1 AS BIGINT) AS reached,
               CAST(SUM(d) AS BIGINT) AS sum_d, CAST(MAX(d) AS BIGINT) AS ecc
        FROM d5 GROUP BY u
    )
    SELECT CAST(node AS BIGINT) AS nation_key, reached,
           ecc AS eccentricity_micro_nats,
           CAST(CASE WHEN sum_d = 0 THEN 0
                ELSE ROUND(reached * 1.0 / sum_d * 1000000000000) END
                AS BIGINT) AS closeness_x1e12
    FROM agg
    """,
)
def closeness_exact_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact closeness centrality and eccentricity from the full
    min-plus closure of the nation trade-cost graph: closeness(v) =
    (n-1) / sum of shortest distances to every other nation, and the
    eccentricity is the worst such distance — the exact whole-graph
    upgrade of `harmonic_centrality_radius2`'s two-hop cut-off, from
    the same closure machinery as `betweenness_nation_trade`
    (distances only, no path counting). Max eccentricity over rows
    reproduces `minplus_diameter_trade`'s diameter — a cross-query
    consistency the invariant test pins.

    Determinism: integer distances; one division per node,
    scaled-rounded.

    Scale shape: fact agg to edges, five tiny squarings, one 625-row
    group-by.
    """
    _, d = _trade_closure_spark(spark, sf_dir)
    agg = d.groupBy(F.col("u").alias("node")).agg(
        (F.count(F.lit(1)) - 1).cast("long").alias("reached"),
        F.sum("d").cast("long").alias("sum_d"),
        F.max("d").cast("long").alias("ecc"),
    )
    return agg.select(
        F.col("node").cast("long").alias("nation_key"),
        "reached",
        F.col("ecc").alias("eccentricity_micro_nats"),
        F.when(F.col("sum_d") == 0, F.lit(0))
        .otherwise(
            F.round(F.col("reached") * 1.0 / F.col("sum_d") * 1000000000000)
        )
        .cast("long")
        .alias("closeness_x1e12"),
    )


_FAIR_BASE_SQL = """
    WITH med AS (
        SELECT PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS m
        FROM orders
    ), base AS (
        SELECT n.n_regionkey AS g,
               CASE WHEN o.o_totalprice > med.m THEN 1 ELSE 0 END AS yhat,
               CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
               o.o_totalprice AS score, o.o_orderkey AS k
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        CROSS JOIN med
    )
"""


@query(
    "fairness_group_audit",
    oracle=_FAIR_BASE_SQL
    + """
    , per AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(yhat) AS BIGINT) AS sel,
               CAST(SUM(y * yhat) AS BIGINT) AS tp,
               CAST(SUM(y) AS BIGINT) AS pos,
               CAST(SUM((1 - y) * yhat) AS BIGINT) AS fp
        FROM base GROUP BY g
    ), mx AS (
        SELECT MAX(sel * 1.0 / n) AS max_rate FROM per
    )
    SELECT CAST(g AS BIGINT) AS region_key, n AS n_orders,
           CAST(ROUND(sel * 1000000.0 / n) AS BIGINT) AS selection_ppm,
           CAST(ROUND(tp * 1000000.0 / pos) AS BIGINT) AS tpr_ppm,
           CAST(ROUND(fp * 1000000.0 / (n - pos)) AS BIGINT) AS fpr_ppm,
           CAST(ROUND((sel * 1.0 / n) / mx.max_rate * 1000) AS BIGINT)
               AS disparate_impact_milli
    FROM per, mx
    """,
)
def fairness_group_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-fairness audit of the above-median-price classifier for
    finished status, with customer region as the protected attribute:
    per region the selection rate (demographic parity), true-positive
    rate (equal opportunity), false-positive rate (equalized odds'
    second half), and the disparate-impact ratio against the most-
    selected region (the EEOC four-fifths rule reads
    disparate_impact_milli < 800 as adverse impact). The
    responsible-ML counterpart of `classifier_agreement_kappa` —
    accuracy alone cannot reveal that errors concentrate in one
    geography.

    Determinism: the threshold is an exact PERCENTILE_DISC data
    value; every metric is an exact integer ratio, ppm/milli-rounded.

    Scale shape: one broadcast dimension chain, one per-region
    confusion-cell agg — five rows of math after a single shuffle.
    """
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    med = o.agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("m")
    )
    base = (
        o.join(
            F.broadcast(
                cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .join(
            F.broadcast(
                nat.select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_regionkey"
                )
            ),
            "c_nationkey",
        )
        .crossJoin(F.broadcast(med))
        .select(
            F.col("n_regionkey").alias("g"),
            F.when(F.col("o_totalprice") > F.col("m"), 1).otherwise(0).alias(
                "yhat"
            ),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        )
    )
    per = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("yhat").cast("long").alias("sel"),
        F.sum(F.col("y") * F.col("yhat")).cast("long").alias("tp"),
        F.sum("y").cast("long").alias("pos"),
        F.sum((1 - F.col("y")) * F.col("yhat")).cast("long").alias("fp"),
    )
    per = _ckpt(per)  # shared fan-out relation
    mx = per.agg(F.max(F.col("sel") * 1.0 / F.col("n")).alias("max_rate"))
    return per.crossJoin(F.broadcast(mx)).select(
        F.col("g").cast("long").alias("region_key"),
        F.col("n").alias("n_orders"),
        F.round(F.col("sel") * 1000000.0 / F.col("n"))
        .cast("long")
        .alias("selection_ppm"),
        F.round(F.col("tp") * 1000000.0 / F.col("pos"))
        .cast("long")
        .alias("tpr_ppm"),
        F.round(F.col("fp") * 1000000.0 / (F.col("n") - F.col("pos")))
        .cast("long")
        .alias("fpr_ppm"),
        F.round((F.col("sel") * 1.0 / F.col("n")) / F.col("max_rate") * 1000)
        .cast("long")
        .alias("disparate_impact_milli"),
    )


@query(
    "group_calibration_gap",
    oracle=_FAIR_BASE_SQL
    + """
    , dec AS (
        SELECT g, y, NTILE(10) OVER (ORDER BY score, k) AS d FROM base
    ), pooled AS (
        SELECT d, AVG(y * 1.0) AS p FROM dec GROUP BY d
    ), grp AS (
        SELECT g, d, AVG(y * 1.0) AS p, CAST(COUNT(*) AS BIGINT) AS n
        FROM dec GROUP BY g, d
    ), gaps AS (
        SELECT grp.g,
               MAX(ABS(grp.p - pooled.p)) AS mx,
               SUM(ABS(grp.p - pooled.p) * grp.n) / SUM(grp.n) AS mean_w
        FROM grp JOIN pooled ON pooled.d = grp.d
        GROUP BY grp.g
    )
    SELECT CAST(g AS BIGINT) AS region_key,
           CAST(ROUND(mx * 1000000) AS BIGINT) AS max_gap_ppm,
           CAST(ROUND(mean_w * 1000000) AS BIGINT) AS mean_gap_ppm
    FROM gaps
    """,
)
def group_calibration_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-group calibration audit for the same score and outcome
    as `fairness_group_audit`: order values are cut into global score
    deciles (total-order tie-break), and each region's per-decile
    finished rate is compared with the pooled per-decile rate — the
    max and exposure-weighted mean absolute gaps say whether one
    SCORE LEVEL means different outcome probabilities in different
    regions (multicalibration). A model can pass every aggregate
    fairness metric yet fail exactly here; conversely, by the
    impossibility results, calibrated groups generally CANNOT also
    equalize TPR/FPR — these two queries exhibit the tradeoff on real
    aggregates.

    Determinism: deciles via NTILE over (score, orderkey); rates are
    exact integer ratios; gaps micro-rounded.

    Scale shape: deciles via the range-bucketed distributed NTILE
    (``operators/rank.py`` — no single-task sort of the fact), two
    hash aggs (50 group-cells, 10 pooled cells), one broadcast join.
    """
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    base = (
        o.join(
            F.broadcast(
                cst.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
            ),
            "o_custkey",
        )
        .join(
            F.broadcast(
                nat.select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_regionkey"
                )
            ),
            "c_nationkey",
        )
        .select(
            F.col("n_regionkey").alias("g"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
            F.col("o_totalprice").alias("score"),
            F.col("o_orderkey").alias("k"),
        )
    )
    from pyspark_movie_recommender_spark.operators.rank import (
        distributed_ntile,
    )

    dec = distributed_ntile(base, "score", ["k"], 10, out_col="d").select(
        "g", "y", "d"
    )
    pooled = dec.groupBy("d").agg(F.avg(F.col("y") * 1.0).alias("pp"))
    grp = dec.groupBy("g", "d").agg(
        F.avg(F.col("y") * 1.0).alias("p"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    gaps = (
        grp.join(F.broadcast(pooled), "d")
        .groupBy("g")
        .agg(
            F.max(F.abs(F.col("p") - F.col("pp"))).alias("mx"),
            (
                F.sum(F.abs(F.col("p") - F.col("pp")) * F.col("n"))
                / F.sum("n")
            ).alias("mean_w"),
        )
    )
    return gaps.select(
        F.col("g").cast("long").alias("region_key"),
        F.round(F.col("mx") * 1000000).cast("long").alias("max_gap_ppm"),
        F.round(F.col("mean_w") * 1000000).cast("long").alias("mean_gap_ppm"),
    )
