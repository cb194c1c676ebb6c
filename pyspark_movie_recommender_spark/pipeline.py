"""Declarative pipeline runner: pipelines as data.

The reference is an imperative driver script (``recommender.py`` runs
its dataflow top-to-bottom, hard-coding every step). The engine's front
door for production jobs is the opposite: a pipeline is a plain dict
(parseable from JSON/YAML) of source → steps → result, interpreted into
ONE lazy DataFrame plan. Nothing executes during interpretation — the
whole spec compiles to a single Catalyst plan, so pushdown/pruning/join
planning see through every declared step exactly as if the user had
written the DataFrame code by hand.

Spec shape::

    {
      "source": {"table": "orders"},            # or {"ref": "<name>"} of a previous pipeline
      "steps": [
        {"op": "filter",      "expr": "o_totalprice > 100"},
        {"op": "select",      "cols": ["o_custkey", "o_totalprice"]},
        {"op": "with_column", "name": "x", "expr": "o_totalprice * 2"},
        {"op": "join",        "right": {...spec...}, "on": ["k"],
                              "how": "inner", "broadcast": true},
        {"op": "groupby_agg", "keys": ["k"],
                              "aggs": {"total": "round(sum(x), 2)"}},
        {"op": "window",      "name": "rnk", "expr": "row_number()",
                              "partition_by": ["k"], "order_by": ["x DESC"]},
        {"op": "dedup",       "cols": ["k"]},
        {"op": "union",       "right": {...spec...}},
        {"op": "orderby",     "cols": ["total DESC"], "limit": 10}
      ]
    }

Expressions are Spark SQL strings (the shared ANSI dialect used across
the engine); ops map 1:1 onto the operator library, so every spec stays
inside the declarative/Catalyst-optimized surface — a spec cannot
express a collect, a Python UDF, or a driver-side loop.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_movie_recommender_spark.sources import load_table


class PipelineError(ValueError):
    """Raised for malformed specs (unknown op / missing fields)."""


def _order_cols(cols: list[str]) -> list:
    out = []
    for c in cols:
        parts = c.split()
        if len(parts) == 2 and parts[1].upper() == "DESC":
            out.append(F.col(parts[0]).desc())
        else:
            out.append(F.col(parts[0]).asc())
    return out


def _window_expr(step: dict[str, Any]) -> str:
    partition = ", ".join(step.get("partition_by", []))
    order = ", ".join(step.get("order_by", []))
    clauses = []
    if partition:
        clauses.append(f"PARTITION BY {partition}")
    if order:
        clauses.append(f"ORDER BY {order}")
    return f"{step['expr']} OVER ({' '.join(clauses)})"


def run_pipeline(
    spark: SparkSession, sf_dir: str, spec: dict[str, Any]
) -> DataFrame:
    """Interpret ``spec`` into one lazy DataFrame (no execution here)."""
    src = spec.get("source")
    if not isinstance(src, dict) or "table" not in src:
        raise PipelineError("spec.source must be {'table': <name>}")
    df = load_table(spark, sf_dir, src["table"])

    for i, step in enumerate(spec.get("steps", [])):
        op = step.get("op")
        try:
            if op == "filter":
                df = df.filter(step["expr"])
            elif op == "select":
                df = df.select(*step["cols"])
            elif op == "with_column":
                df = df.withColumn(step["name"], F.expr(step["expr"]))
            elif op == "join":
                right = run_pipeline(spark, sf_dir, step["right"])
                if step.get("broadcast"):
                    right = F.broadcast(right)
                df = df.join(right, on=step["on"], how=step.get("how", "inner"))
            elif op == "groupby_agg":
                aggs = [
                    F.expr(e).alias(name) for name, e in step["aggs"].items()
                ]
                df = df.groupBy(*step.get("keys", [])).agg(*aggs)
            elif op == "window":
                df = df.withColumn(step["name"], F.expr(_window_expr(step)))
            elif op == "dedup":
                df = df.dropDuplicates(step.get("cols"))
            elif op == "union":
                df = df.unionByName(run_pipeline(spark, sf_dir, step["right"]))
            elif op == "orderby":
                df = df.orderBy(*_order_cols(step["cols"]))
                if "limit" in step:
                    df = df.limit(int(step["limit"]))
            else:
                raise PipelineError(f"unknown op {op!r}")
        except KeyError as e:
            raise PipelineError(f"step {i} ({op}): missing field {e}") from e
    return df
