"""Property-based operator-algebra invariants (hypothesis) — SURVEY §5
item 4: laws that must hold for ANY input, checked on small generated
frames. Example counts are kept low because every example is a Spark
job; the laws themselves are scale-independent.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(st.integers(0, 20), st.integers(-1000, 1000)),
    min_size=0,
    max_size=40,
)


def _df(spark, data):
    return spark.createDataFrame(data or [(0, 0)], "k int, v int").limit(
        len(data)
    )


@given(data=rows)
@settings(**SETTINGS)
def test_topk_equals_sort_limit(spark, data):
    df = _df(spark, data)
    k = 5
    a = df.orderBy(F.desc("v"), F.asc("k")).limit(k).collect()
    b = sorted(data, key=lambda t: (-t[1], t[0]))[:k]
    assert [(r.k, r.v) for r in a] == b


@given(data=rows, data2=rows)
@settings(**SETTINGS)
def test_union_all_preserves_multiset(spark, data, data2):
    from pyspark_movie_recommender_spark.operators.relational import union_all

    u = union_all(_df(spark, data), _df(spark, data2))
    assert u.count() == len(data) + len(data2)


@given(data=rows, data2=rows)
@settings(**SETTINGS)
def test_semi_plus_anti_partition_left(spark, data, data2):
    left, right = _df(spark, data), _df(spark, data2)
    semi = left.join(right, "k", "left_semi")
    anti = left.join(right, "k", "left_anti")
    assert semi.count() + anti.count() == left.count()
    # and they are disjoint on k
    assert (
        semi.select("k").intersect(anti.select("k")).count() == 0
    )


@given(data=rows)
@settings(**SETTINGS)
def test_dedup_is_idempotent_and_matches_distinct_count(spark, data):
    df = _df(spark, data)
    once = df.dropDuplicates(["k"])
    twice = once.dropDuplicates(["k"])
    n_distinct = len({k for k, _ in data})
    assert once.count() == twice.count() == n_distinct


@given(data=rows, data2=rows)
@settings(**SETTINGS)
def test_salted_join_equals_plain_join(spark, data, data2):
    from pyspark_movie_recommender_spark.operators.relational import salted_join

    left, right = _df(spark, data), _df(
        spark, [(k, v) for k, v in data2]
    ).withColumnRenamed("v", "w")
    plain = sorted(
        (r.k, r.v, r.w) for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r.k, r.v, r.w) for r in salted_join(left, right, "k", salt_buckets=4).collect()
    )
    assert plain == salted
