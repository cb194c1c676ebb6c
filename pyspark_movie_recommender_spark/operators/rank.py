"""Distributed global ranking — row_number() without the 1-task window.

A plain ``Window.orderBy(...)`` with no ``partitionBy`` funnels the whole
relation through ONE task (Spark even warns about it) — the classic scale
cliff for "give every row its global position" problems: sorted-neighborhood
dedup blocking, pagination, rank-based sampling. This module computes the
identical rank with bounded per-task input:

1. range-bucket rows on the (numeric) sort key — boundaries come from
   ``approxQuantile``, a driver-side list of at most ``n_buckets`` doubles;
2. ``row_number()`` inside each bucket (a parallel, partitioned window);
3. add the exclusive prefix sum of bucket counts, broadcast back as a tiny
   literal map.

Total order is ``(key_col, id_col)`` — the unique id tie-break makes the
rank deterministic and engine-comparable. Cost: one narrow shuffle on the
bucket id plus one |n_buckets|-row aggregate; the two driver actions
(quantiles, bucket counts) are O(n_buckets) scalars, the same legitimate
driver-side-scalar class as a convergence check. No task ever sorts more
than one bucket.

Reference parity: the reference's global sorts (recommender.py:237-239,
``sortBy`` then ``take``) are the k-bounded case (TakeOrderedAndProject);
this operator is the k-unbounded generalization a 100-TB corpus needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_BUCKET = "__rank_bucket"
_LOCAL = "__rank_local"


def distributed_global_rank(
    df: DataFrame,
    key_col: str,
    id_col: str,
    n_buckets: int = 32,
    out_col: str = "rn",
) -> DataFrame:
    """Append ``out_col`` = global ROW_NUMBER() ordered by (key, id).

    ``key_col`` must be numeric (range boundaries come from
    ``approxQuantile``); ``id_col`` must be unique — it breaks ties so
    the rank is total and deterministic.
    """
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(df.approxQuantile(key_col, probs, 0.001)))

    if bounds:
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket: Column = F.size(F.filter(arr, lambda b: b < F.col(key_col)))
    else:
        bucket = F.lit(0)
    bucketed = df.withColumn(_BUCKET, bucket)

    counts = {
        r[_BUCKET]: r["n"]
        for r in bucketed.groupBy(_BUCKET).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )

    w = Window.partitionBy(_BUCKET).orderBy(F.col(key_col).asc(), F.col(id_col).asc())
    return (
        bucketed.withColumn(_LOCAL, F.row_number().over(w))
        .withColumn(
            out_col,
            (F.element_at(off_map, F.col(_BUCKET)) + F.col(_LOCAL)).cast("long"),
        )
        .drop(_BUCKET, _LOCAL)
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    window: int = 2,
    n_buckets: int = 32,
) -> DataFrame:
    """Sorted-neighborhood blocking: candidate pairs within ``window``
    positions of each other in the global (key, id) order.

    The classic entity-resolution alternative to hash blocking: sort the
    corpus on a fuzzy key (here numeric) and compare only rows whose
    ranks differ by at most ``window`` — O(n·w) candidates instead of
    O(n²). Emitted as (rn_a < rn_b) pairs with the rank distance.

    Scale shape: global rank via :func:`distributed_global_rank`
    (bounded tasks), then the neighbor join is an EQUI-join — each left
    row explodes ``window`` target ranks (rn+1 … rn+w) and joins on the
    right's exact rn, so Catalyst shuffles both sides on the rank, no
    range predicate, no cross product.
    """
    ranked = distributed_global_rank(
        df, key_col, id_col, n_buckets=n_buckets, out_col="rn"
    )
    left = ranked.withColumn(
        "rn_b", F.explode(F.array(*[F.col("rn") + d for d in range(1, window + 1)]))
    )
    right = ranked.select(
        F.col("rn").alias("rn_b"),
        *[F.col(c).alias(f"{c}__b") for c in df.columns],
    )
    return left.join(right, "rn_b").select(
        *[F.col(c).alias(f"{c}_a") for c in df.columns],
        *[F.col(f"{c}__b").alias(f"{c}_b") for c in df.columns],
        (F.col("rn_b") - F.col("rn")).cast("long").alias("dist"),
    )


def rrf_fuse(
    rankings: list[DataFrame], id_col: str = "doc_id", k: int = 60
) -> DataFrame:
    """Reciprocal-rank fusion over any number of (id, rank) relations:
    rrf(id) = Σ_lists 1/(k + rank_i), ids absent from a list contribute
    only the lists that ranked them (Cormack & Clarke 2009). Score
    calibration-free — only RANKS cross lists, which is why RRF is the
    default way to fuse lexical and vector retrieval.

    Each input must carry ``id_col`` and a ``rank`` column (1-based,
    deterministically tie-broken by the producer). Output: (id, rrf,
    rank_0..rank_{n-1}) — one row per id seen anywhere; full outer
    joins keep the fusion lossless. RRF values are sums of reciprocals
    of small integers: IEEE-identical across engines.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    fused = None
    for i, r in enumerate(rankings):
        ri = r.select(id_col, F.col("rank").alias(f"rank_{i}"))
        fused = ri if fused is None else fused.join(ri, id_col, "full")
    terms = [
        F.coalesce(1.0 / (F.col(f"rank_{i}") + k), F.lit(0.0))
        for i in range(len(rankings))
    ]
    score = terms[0]
    for t in terms[1:]:
        score = score + t
    return fused.select(
        id_col, *[f"rank_{i}" for i in range(len(rankings))], score.alias("rrf")
    )


def distributed_prefix_sum(
    df: DataFrame,
    key_col: str,
    id_col: str,
    val_col: str,
    n_buckets: int = 32,
    out_col: str = "cumsum",
) -> DataFrame:
    """Append ``out_col`` = running SUM(val) over the global (key, id)
    order — the prefix-sum sibling of :func:`distributed_global_rank`,
    and the scale-correct replacement for ``Window.orderBy(...)`` with
    no partitionBy (which funnels the whole relation through one task).

    Same three steps: range-bucket on the numeric key (approxQuantile
    boundaries), per-bucket windowed cumsum (parallel), then add each
    bucket's exclusive prefix of the per-bucket VALUE sums, broadcast
    as a literal map. The two driver actions are O(n_buckets) scalars.
    Sweep-line algorithms (peak concurrency, inventory running
    balance, audience accumulation) are the motivating consumers.
    """
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(df.approxQuantile(key_col, probs, 0.001)))

    if bounds:
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket: Column = F.size(F.filter(arr, lambda b: b < F.col(key_col)))
    else:
        bucket = F.lit(0)
    bucketed = df.withColumn(_BUCKET, bucket)

    sums = {
        r[_BUCKET]: r["s"]
        for r in bucketed.groupBy(_BUCKET)
        .agg(F.sum(val_col).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for b in sorted(sums):
        offsets[b] = acc
        acc += sums[b]
    off_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )

    w = (
        Window.partitionBy(_BUCKET)
        .orderBy(F.col(key_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bucketed.withColumn(_LOCAL, F.sum(val_col).over(w))
        .withColumn(
            out_col,
            (F.element_at(off_map, F.col(_BUCKET)) + F.col(_LOCAL)).cast("long"),
        )
        .drop(_BUCKET, _LOCAL)
    )
