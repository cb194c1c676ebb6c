"""Time-series primitives shared by the statistics queries.

Two building blocks repeat across ACF, cross-correlation, CUSUM,
resampling, and seasonal-residual analysis:

1. ``zero_filled_daily_grid`` — collapse an event-level relation to a
   dense per-day series (optionally per key), generating the calendar
   from a 1-row bounds aggregate so silent days become explicit zeros.
   Lag arithmetic over a series with holes is silently wrong; the grid
   makes alignment honest and costs only |days| (× |keys|) rows.

2. ``mean_cleared_devs`` — exact integer mean-deviations via the
   denominator-clearing identity dev_t = n·x_t − Σx. Correlation-type
   ratios are invariant to the common n scaling, so numerators and
   variance sums can be accumulated as EXACT wide-decimal integers
   (summation-order-proof across engines, partitions, and retries);
   only the final normalization touches floating point.

Both run entirely on the collapsed series relation — the fact table is
touched exactly once, by the initial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EPOCH_DAY = "unix_micros(CAST({ts} AS timestamp_ltz)) div 86400000000"


def epoch_day(ts_col: str = "ts") -> Column:
    """Naive/LTZ-safe epoch day as BIGINT (micros div 86.4e9)."""
    return F.expr(EPOCH_DAY.format(ts=ts_col)).cast("long")


def zero_filled_daily_grid(
    pts: DataFrame,
    value_agg: Column,
    keys: list[str] | None = None,
) -> DataFrame:
    """Dense (keys…, day, x) series from a sparse (keys…, day, …) relation.

    ``pts`` must carry a BIGINT ``day`` column (see ``epoch_day``);
    ``value_agg`` is the aggregate producing ``x`` for present days —
    missing (key, day) cells become x=0 (every caller's aggregate is
    zero-filling: counts, or sums wrapped in coalesce(…, 0)). The
    calendar spans the GLOBAL min..max day so every key shares one
    aligned axis.

    The fact relation collapses to the sparse (keys…, day, x) series
    FIRST and that series is materialized (``ckpt``): bounds, the key
    census, and the calendar join are three consumers that would
    otherwise each re-execute the fact scan + aggregation — the
    round-7 duplicate-subtree smell, here retired at the source for
    all eleven series queries at once. Aggregating before the calendar
    join is value-identical for present cells (same row groups) and
    the explicit 0-fill matches the old agg-over-one-null-row result
    for the zero-filling aggregates this helper contracts for.
    """
    from pyspark_movie_recommender_spark.operators.lineage import ckpt

    keys = keys or []
    sparse = ckpt(pts.groupBy(*keys, "day").agg(value_agg.alias("x")))
    bounds = sparse.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    days = bounds.select(F.explode(F.expr("sequence(lo, hi)")).alias("day"))
    if keys:
        grid = sparse.select(*keys).distinct().crossJoin(F.broadcast(days))
    else:
        grid = days
    joined = grid.join(sparse, [*keys, "day"], "left")
    return joined.select(
        *keys, "day", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )


def mean_cleared_devs(
    daily: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Attach exact scaled deviations d = n·x − Σx (decimal(38,0)).

    Per key group (global when ``keys`` is empty): n = series length,
    Σx its sum — both exact BIGINTs broadcast back, so ``d`` is an
    exact integer carrying the ×n scaling that cancels in any
    correlation ratio.
    """
    keys = keys or []
    if keys:
        stats = daily.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("s"),
        )
        joined = daily.join(F.broadcast(stats), keys)
    else:
        stats = daily.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("s"),
        )
        joined = daily.crossJoin(F.broadcast(stats))
    return joined.withColumn(
        "d", (F.col("n") * F.col("x") - F.col("s")).cast("decimal(38,0)")
    )
