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


def test_lof_scores_positive_and_flag_consistent(spark):
    r = rows(spark, "lof_embedding_outliers")
    assert len(r) == 10
    for x in r:
        assert x.lof_score > 0
        assert x.is_outlier == (1 if x.lof_score > 1.5 else 0)
    scores = [x.lof_score for x in r]
    assert scores == sorted(scores, reverse=True)


def test_rbo_bounded_and_consistent(spark):
    (r,) = rows(spark, "rbo_rank_agreement_parts")
    assert 0 <= r.rbo_090 <= 1
    assert 0 <= r.overlap_at_50 <= 50
    assert r.depth == 50
    # identical rankings would give rbo ~1; any overlap at all forces rbo>0
    if r.overlap_at_50 > 0:
        assert r.rbo_090 > 0
