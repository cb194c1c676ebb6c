"""UDF surface: each Arrow-batched form works and matches a SQL oracle
computed in-plan where one exists."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pyspark_movie_recommender_spark.operators.udf_surface import (
    make_explode_ngrams_udtf,
    sigmoid_scale,
    spend_gini_per_segment,
    zscore_per_group,
)
from pyspark_movie_recommender_spark.sources import load_table


def test_scalar_pandas_udf_matches_sql(spark):
    df = spark.range(100).select((F.col("id") / 10.0 - 5).alias("x"))
    got = df.select(
        sigmoid_scale("x").alias("u"),
        (1 / (1 + F.exp(-F.col("x")))).alias("s"),
    ).collect()
    assert all(abs(r.u - r.s) < 1e-12 for r in got)


def test_gini_udaf(spark):
    # perfectly equal values → gini 0; one-holder-takes-all → near 1
    eq = spark.createDataFrame([("a", 5.0)] * 10, "g string, v double")
    uneq = spark.createDataFrame(
        [("a", 0.0)] * 9 + [("a", 100.0)], "g string, v double"
    )
    from pyspark_movie_recommender_spark.operators.udf_surface import gini_udaf

    g_eq = eq.groupBy("g").agg(gini_udaf("v").alias("g2")).collect()[0].g2
    g_un = uneq.groupBy("g").agg(gini_udaf("v").alias("g2")).collect()[0].g2
    assert abs(g_eq) < 1e-12
    assert g_un > 0.85


def test_gini_on_customers_runs(spark, sf_dir):
    out = spend_gini_per_segment(load_table(spark, sf_dir, "customer")).collect()
    assert len(out) == 5
    assert all(0 <= r.acctbal_gini <= 1 for r in out)


def test_zscore_apply_in_pandas(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 6)] + [("b", 7.0), ("b", 9.0)],
        "g string, v double",
    )
    got = {(r.g, r.v): r.zscore for r in zscore_per_group(df, "g", "v").collect()}
    assert abs(got[("a", 3.0)]) < 1e-12  # the mean of group a
    assert abs(got[("b", 9.0)] - 1.0) < 1e-12  # (9-8)/1
    # per-group mean of zscores is 0
    assert abs(sum(z for (g, _), z in got.items() if g == "a")) < 1e-9


def test_udtf_explode_ngrams(spark):
    ExplodeNGrams = make_explode_ngrams_udtf()
    spark.udtf.register("explode_ngrams", ExplodeNGrams)
    df = spark.sql(
        "SELECT * FROM explode_ngrams(42::BIGINT, 'a b c d', 2)"
    )
    rows = [(r.pos, r.ngram) for r in df.orderBy("pos").collect()]
    assert rows == [(0, "a b"), (1, "b c"), (2, "c d")]
    assert all(r.doc_id == 42 for r in df.collect())


def test_map_in_arrow_doc_stats_plan_and_values(spark, sf_dir):
    """mapInArrow: values equal the SQL spec AND the plan is a pure
    map-side MapInArrow node (no exchange before it)."""
    from pyspark_movie_recommender_spark.operators.udf_surface import arrow_doc_stats
    from pyspark_movie_recommender_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = arrow_doc_stats(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan
    assert "Exchange" not in plan
    got = {r.doc_id: (r.n_tokens, r.n_bytes) for r in out.collect()}
    want = {
        r.doc_id: (r.nt, r.nb)
        for r in docs.selectExpr(
            "doc_id",
            "size(split(text, ' '))::long AS nt",
            "octet_length(text)::long AS nb",
        ).collect()
    }
    assert got == want


def test_apply_in_arrow_matches_groupby(spark, sf_dir):
    from pyspark_movie_recommender_spark.operators.udf_surface import (
        arrow_grouped_lang_stats,
    )
    from pyspark_movie_recommender_spark.sources import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    got = {tuple(r) for r in arrow_grouped_lang_stats(docs).collect()}
    want = {
        tuple(r)
        for r in docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.octet_length("text")).cast("long").alias("total_chars"),
            F.sum(F.size(F.split("text", " "))).cast("long").alias("total_tokens"),
        )
        .collect()
    }
    assert got == want


def test_polymorphic_udtf_schema_from_argument(spark):
    """The analyze() hook derives one LONG column per requested key at
    PLAN time; rows shred accordingly at run time."""
    from pyspark_movie_recommender_spark.operators.udf_surface import (
        make_kv_columns_udtf,
    )

    KvColumns = make_kv_columns_udtf()
    spark.udtf.register("kv_columns", KvColumns)
    df = spark.sql(
        """SELECT t.* FROM kv_columns('{"a": 1, "b": 2}', 'a,b,missing') t"""
    )
    assert df.columns == ["a", "b", "missing"]
    row = df.collect()[0]
    assert (row.a, row.b, row.missing) == (1, 2, None)
    # different call site, different schema — same registration
    df2 = spark.sql("""SELECT t.* FROM kv_columns('{"x": 9}', 'x') t""")
    assert df2.columns == ["x"] and df2.collect()[0].x == 9


def test_cogroup_apply_in_arrow_matches_pandas_twin(spark, sf_dir):
    """cogroup().applyInArrow — the Arrow-native two-sided per-key
    form: same reconciliation as the pandas cogroup, computed from
    pyarrow Tables, value-identical."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pyspark.sql import functions as F
    from pyspark_movie_recommender_spark.operators.udf_surface import (
        cogrouped_user_reconciliation,
    )
    from pyspark_movie_recommender_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")

    def recon_arrow(ev: pa.Table, od: pa.Table) -> pa.Table:
        def cents(t: pa.Table, col: str) -> int:
            if t.num_rows == 0:
                return 0
            scaled = pc.add(pc.multiply(pc.cast(t.column(col), pa.float64()), 100.0), 0.5)
            return int(pc.sum(pc.cast(pc.floor(scaled), pa.int64())).as_py())

        uid = (
            ev.column("user_id")[0].as_py()
            if ev.num_rows
            else od.column("user_id")[0].as_py()
        )
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n_events": pa.array([ev.num_rows], pa.int64()),
                "n_orders": pa.array([od.num_rows], pa.int64()),
                "event_cents": pa.array([cents(ev, "value")], pa.int64()),
                "order_cents": pa.array([cents(od, "o_totalprice")], pa.int64()),
            }
        )

    ev_side = events.select("user_id", "value")
    od_side = orders.select(F.col("o_custkey").alias("user_id"), "o_totalprice")
    arrow_out = (
        ev_side.groupBy("user_id")
        .cogroup(od_side.groupBy("user_id"))
        .applyInArrow(
            recon_arrow,
            schema=(
                "user_id long, n_events long, n_orders long, "
                "event_cents long, order_cents long"
            ),
        )
    )
    got = {tuple(r) for r in arrow_out.collect()}
    want = {
        tuple(r) for r in cogrouped_user_reconciliation(events, orders).collect()
    }
    assert got == want and got
