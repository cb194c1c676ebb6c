"""Wave 153+ invariants: algebraic laws for this session's queries.
Oracle equality is covered by test_queries_oracle; these pin bounds and
identities on the sf0.001 fixture.
"""

from __future__ import annotations

from pyspark_movie_recommender_spark import queries as Q

SF = "/root/testdata/sf0.001"


def rows(spark, name):
    return Q.QUERIES[name](spark, SF).collect()


def test_welch_df_within_classic_bounds(spark):
    (r,) = rows(spark, "welch_ttest_order_value")
    assert r.n_a > 0 and r.n_b > 0
    # Satterthwaite df is bounded by min(n)-1 and the pooled df
    assert min(r.n_a, r.n_b) - 1 <= r.df_satterthwaite <= r.n_a + r.n_b - 2
    # t is finite and sign-consistent with the mean difference
    assert r.t_welch == r.t_welch
    if r.mean_a != r.mean_b:
        assert (r.t_welch > 0) == (r.mean_a > r.mean_b)


def test_ljung_box_nonnegative_and_flag_consistent(spark):
    (r,) = rows(spark, "ljung_box_daily_value")
    assert r.n > 7 and r.h == 7
    assert r.q_ljung_box >= 0
    assert r.white_noise_rejected == (1 if r.q_ljung_box > 14.067140 else 0)
