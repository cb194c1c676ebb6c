"""Parquet star-schema sources (the driver's TPC-H-ish tables).

Columnar parquet scans are the engine's primary source: Catalyst pushes
predicates and prunes columns into the scan (verify with
``df.explain('formatted')`` → ``PushedFilters`` / ``ReadSchema``), which
is the scale path for 100 TB — a query touching 2 of 11 lineitem columns
reads ~2/11ths of the bytes.

The reference's only sources were ``sc.textFile`` over CSV and
``sc.parallelize`` over literal lists (``recommender.py:39,121,133``);
those map to :mod:`..sources.movielens` and
``spark.createDataFrame`` respectively.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver-generated tables (TESTDATA.md). Order: dims first.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor —
# region/nation are fixed-size (5/25 rows) even at 100 TB.
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one parquet table from a scale-factor directory."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once; all of them when ``names`` is empty."""
    wanted = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in wanted}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register tables as temp views so ``spark.sql`` can reference them."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
