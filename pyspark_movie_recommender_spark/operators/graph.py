"""Graph operators for dedup pipelines: near-dup pairs → clusters.

A dedup pipeline is only done once pairs become clusters and each
cluster picks a canonical row: pairs (MinHash/SimHash/Jaccard) are
edges, connected components give cluster ids, ``min(id)`` per component
is the keeper. The reference has no graph surface at all (SURVEY.md §2);
this is north-star pipeline infrastructure.

Algorithm: iterative min-label propagation over the undirected edge
set — each round every vertex takes the min of its own label and its
neighbours' labels; converges in O(graph diameter) rounds. Near-dup
graphs are unions of small dense clusters (diameter ≲ 3), so 3-5
rounds typically suffice. Each round is one shuffle (join + groupBy on
vertex id); lineage is truncated per round with ``localCheckpoint`` so
plans stay constant-size (the classic iterative-DataFrame pitfall).
For adversarial long-chain graphs at 100 TB, swap in the large-star/
small-star variant (Kiveris et al., "Connected Components in
MapReduce"), which bounds rounds at O(log n); plumbing is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 20,
) -> DataFrame:
    """Connected components of the undirected graph given by ``edges``.

    Returns (id, component) with component = min vertex id reachable.
    Driver-coordinated iteration (like ALS training): one Spark job per
    round to evaluate the convergence predicate.
    """
    bi = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = (
        bi.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )

    for _ in range(max_rounds):
        nbr = (
            bi.join(labels, bi.v == labels.id)
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr, labels.id == nbr.u, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()  # truncate lineage each round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    return labels.select("id", F.col("label").alias("component"))


def dedup_keepers(
    df: DataFrame, pairs: DataFrame, id_col: str, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Rows of ``df`` that survive near-dup clustering: the min-id member
    of each component plus every row not in any pair."""
    comp = connected_components(pairs, src, dst)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")
