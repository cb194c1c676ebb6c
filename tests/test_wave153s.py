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


def test_flesch_bounds_and_syllable_floor(spark):
    r = rows(spark, "readability_flesch_by_source")
    assert r
    for x in r:
        assert x.n_docs > 0
        # syllables >= words forces ease <= 206.835 - 1.015 - 84.6 bound side
        assert x.avg_flesch_ease <= 206.835
        assert 0 <= x.easy_docs_ppm <= 1_000_000


def test_encoding_health_clean_corpus_zero_flags(spark):
    r = rows(spark, "encoding_health_by_source")
    assert r
    for x in r:
        # synthetic corpus is clean ASCII: detectors must NOT fire
        assert x.docs_with_control == 0
        assert x.docs_with_replacement == 0
        assert x.docs_mojibake == 0
        assert x.non_ascii_ppm == 0
        assert 0 < x.whitespace_ppm < 1_000_000


def test_encoding_health_detectors_fire_on_planted_dirt(spark):
    from pyspark_movie_recommender_spark.operators.text import encoding_health

    dirty = spark.createDataFrame(
        [
            (1, "clean ascii text", "s1"),
            (2, "bad\x01control", "s1"),
            (3, "repl�char", "s2"),
            (4, "mojibake Ã© here", "s2"),
            (5, "tab\tand newline\nare fine", "s1"),
        ],
        "doc_id long, text string, source string",
    )
    r = {x.grp: x for x in encoding_health(dirty).collect()}
    assert r["s1"].docs_with_control == 1  # tab/newline are NOT control hits
    assert r["s1"].docs_with_replacement == 0
    assert r["s2"].docs_with_replacement == 1
    assert r["s2"].docs_mojibake == 1
    assert r["s2"].non_ascii_ppm > 0


def test_cif_monotone_and_bounded_by_one_minus_survival(spark):
    r = sorted(rows(spark, "competing_risks_cif"), key=lambda x: x.t_days)
    assert r
    prev_p = prev_e = 0.0
    for x in r:
        # each CIF is a nonnegative, nondecreasing step function
        assert x.cif_purchase >= prev_p - 1e-9
        assert x.cif_error >= prev_e - 1e-9
        prev_p, prev_e = x.cif_purchase, x.cif_error
        # total incidence can never exceed 1
        assert x.cif_purchase + x.cif_error <= 1.0 + 1e-6


def test_weibull_fit_sane(spark):
    (r,) = rows(spark, "weibull_fit_conversion_lag")
    assert r.n >= 3  # sf0.001 has few same-day-excluded conversions
    assert r.shape_k > 0
    assert r.scale_days > 0
    assert 0 <= r.r_squared <= 1


def test_sliced_wasserstein_nonnegative_all_slices(spark):
    r = rows(spark, "sliced_wasserstein_labels")
    assert len(r) == 8
    for x in r:
        assert x.w1_slice >= 0
        assert x.n0 > 0 and x.n1 > 0
    # same populations on every slice
    assert len({(x.n0, x.n1) for x in r}) == 1


def test_sliced_wasserstein_zero_on_identical_populations(spark):
    # projecting a population against itself must give W1 == 0 on
    # every slice: rebuild the pipeline with label 1 := label 0
    from pyspark.sql import functions as F

    emb = spark.read.parquet(SF + "/embeddings.parquet").where(
        F.col("label") == 0
    )
    dup = emb.select("vec_id", "embedding", F.lit(0).alias("label")).unionAll(
        emb.select("vec_id", "embedding", F.lit(1).alias("label"))
    )
    import tempfile, os

    tmp = tempfile.mkdtemp()
    dup.write.mode("overwrite").parquet(os.path.join(tmp, "embeddings.parquet"))
    out = Q.QUERIES["sliced_wasserstein_labels"](spark, tmp).collect()
    assert all(x.w1_slice == 0.0 for x in out)


def test_pacf_lag1_equals_acf_lag1(spark):
    r = {x.lag: x for x in rows(spark, "pacf_daily_event_value")}
    assert set(r) == {1, 2, 3}
    assert r[1].pacf == r[1].acf
    for x in r.values():
        assert -1.000001 <= x.pacf <= 1.000001
        assert -1.000001 <= x.acf <= 1.000001


def test_bloom_prefilter_no_false_negatives_and_bounded_fpr(spark):
    # the bloom stage must pass every true member; FPR should be small
    from pyspark.sql import functions as F

    o = spark.read.parquet(SF + "/orders.parquet")
    c = spark.read.parquet(SF + "/customer.parquet")
    dim = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    true_n = o.join(dim, o.o_custkey == dim.c_custkey).count()
    got = rows(spark, "bloom_prefilter_join")
    assert sum(x.n_orders for x in got) == true_n


def test_motif_and_discord_are_valid_windows(spark):
    (r,) = rows(spark, "motif_discovery_daily")
    # motif windows must not overlap (full window of separation)
    assert r.motif_start_b > r.motif_start_a + 6
    assert r.motif_zdist >= 0
    # discord's nearest-neighbor distance is at least the motif distance
    assert r.discord_zdist >= r.motif_zdist
    # z-normalized distance for m=7 is bounded by sqrt(4m)
    assert r.motif_zdist <= (4 * 7) ** 0.5 + 1e-6
    assert r.discord_zdist <= (4 * 7) ** 0.5 + 1e-6


def test_stl_components_reassemble(spark):
    r = rows(spark, "stl_decompose_daily")
    assert r
    for x in r:
        # additive identity holds to rounding tolerance
        assert abs(x.x_cents - (x.trend + x.seasonal + x.residual)) < 2e-3
        assert 0 <= x.dow <= 6
    # seasonal components repeat by weekday
    by_dow = {}
    for x in r:
        by_dow.setdefault(x.dow, set()).add(x.seasonal)
    assert all(len(v) == 1 for v in by_dow.values())


def test_hampel_flag_matches_rule(spark):
    r = rows(spark, "hampel_filter_daily")
    assert r
    for x in r:
        expect = 1 if abs(x.x_cents - x.med_cents) > 3.0 * 1.4826 * x.mad_cents else 0
        assert x.is_outlier == expect
        assert x.mad_cents >= 0


def test_propensity_match_counts_consistent(spark):
    (r,) = rows(spark, "propensity_match_att")
    assert r.n_treated > 0
    assert 0 <= r.n_matched <= r.n_treated
    if r.n_matched > 0:
        assert r.att_dollars is not None


def test_query_likelihood_scores_negative_and_sorted(spark):
    r = rows(spark, "query_likelihood_dirichlet")
    assert len(r) == 10
    scores = [x.ql_score for x in r]
    # log-probabilities are strictly negative and returned descending
    assert all(s < 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_energy_distance_nonnegative(spark):
    (r,) = rows(spark, "energy_distance_labels")
    assert r.n > 0 and r.m > 0
    # E >= 0 always; equality only for identical distributions
    assert r.energy_distance >= -1e-9
    assert r.energy_statistic >= -1e-9


def test_kcenter_radius_monotone_nonincreasing(spark):
    r = sorted(rows(spark, "kcenter_coreset_embeddings"), key=lambda x: x.rank)
    assert [x.rank for x in r] == [1, 2, 3, 4, 5]
    # adding a center can never increase the covering radius
    radii = [x.radius for x in r]
    assert all(radii[i + 1] <= radii[i] + 1e-9 for i in range(4))
    # all centers distinct
    assert len({x.vec_id for x in r}) == 5


def test_goertzel_power_nonnegative(spark):
    r = rows(spark, "goertzel_periodogram_daily")
    assert sorted(x.period for x in r) == [7, 14, 30]
    for x in r:
        # single-bin power of a real series is >= 0
        assert x.power_norm >= -1e-9


def test_hill_alpha_reciprocal_of_h(spark):
    (r,) = rows(spark, "hill_tail_index_orders")
    assert r.k == 100
    assert r.hill_h > 0
    assert abs(r.tail_alpha - round(1.0 / r.hill_h, 4)) < 1e-2
    assert r.threshold_cents > 0


def test_hotelling_t2_flags_match_threshold(spark):
    r = rows(spark, "hotelling_t2_daily")
    assert r
    for x in r:
        assert x.t2 >= -1e-9
        assert x.out_of_control == (1 if x.t2 > 9.21034 else 0)
    # mean of T2 over days is ~2 (the dimension) for in-control data
    avg = sum(x.t2 for x in r) / len(r)
    assert 0.1 < avg < 20


def test_permutation_p_value_in_valid_range(spark):
    (r,) = rows(spark, "permutation_test_order_value")
    assert r.n_a > 0 and r.n_b > 0
    # add-one smoothing bounds: 1/21 <= p <= 1 (p is round(...,6))
    assert 1.0 / 21 - 5e-7 <= r.p_value <= 1.0
    assert 0 <= r.n_extreme <= 20


def test_anova_f_matches_welch_direction(spark):
    (r,) = rows(spark, "anova_f_order_priority")
    assert r.n_groups == 5
    assert r.f_stat >= 0
    # eta^2 in [0,1] and consistent with F via the df identity
    assert 0.0 <= r.eta_sq <= 1.0
    expect_eta = (r.f_stat * 4) / (r.f_stat * 4 + (r.n_rows - 5))
    assert abs(r.eta_sq - expect_eta) < 1e-6
    assert r.rejected == (1 if r.f_stat > 3.3192 else 0)


def test_mcnemar_cells_and_flag(spark):
    (r,) = rows(spark, "mcnemar_late_predictors")
    assert r.only_a_correct + r.only_b_correct <= r.n
    assert 0.0 <= r.acc_a <= 1.0 and 0.0 <= r.acc_b <= 1.0
    assert r.mcnemar_chi2 >= 0
    assert r.rejected == (1 if r.mcnemar_chi2 > 6.634897 else 0)
    # the more-accurate classifier must win more disagreements
    if r.acc_a > r.acc_b:
        assert r.only_a_correct >= r.only_b_correct


def test_pettitt_k_bounds_and_flag(spark):
    (r,) = rows(spark, "pettitt_changepoint_daily")
    # max|U_t| is bounded by the all-pairs count n(n-1)/2 ... times 2
    # in our doubled-rank units? no: v in [-(n-1), n-1], |U_t| <= t*(n-1)
    assert 0 <= r.k_stat <= r.n * (r.n - 1)
    assert 0.0 <= r.approx_p <= 2.0
    assert r.rejected == (1 if r.approx_p < 0.01 else 0)


def test_kpss_eta_positive_and_flag(spark):
    (r,) = rows(spark, "kpss_stationarity_daily")
    assert r.n > 10
    assert r.lags == int(4 * (r.n / 100.0) ** 0.25)
    assert r.kpss_eta > 0
    assert r.rejected == (1 if r.kpss_eta > 0.739 else 0)


def test_friedman_q_bounds_and_flag(spark):
    (r,) = rows(spark, "friedman_weekly_type_ranks")
    assert r.n_treatments == 5
    assert r.n_blocks >= 2
    # Q is bounded above by b*(k-1) (perfectly consistent rankings)
    assert -1e-6 <= r.friedman_q <= r.n_blocks * (r.n_treatments - 1) + 1e-6
    assert r.rejected == (1 if r.friedman_q > 13.2767 else 0)


def test_taylor_slope_fit_sane(spark):
    (r,) = rows(spark, "taylor_power_law_types")
    assert r.n_types == 5
    assert 0.0 <= r.r_squared <= 1.0
    assert r.is_aggregated == (1 if r.taylor_slope > 1.0 else 0)
    # uniform synthetic arrivals are Poisson-ish: slope should be finite
    assert abs(r.taylor_slope) < 10


def test_chow_f_nonnegative_and_flag(spark):
    (r,) = rows(spark, "chow_break_price_quantity")
    assert r.n_pre > 0 and r.n_post > 0
    # pooled SSR can never beat the sum of per-regime SSRs
    assert r.chow_f >= -1e-6
    assert r.break_detected == (1 if r.chow_f > 4.6052 else 0)


def test_durbin_watson_in_range(spark):
    (r,) = rows(spark, "durbin_watson_daily_trend")
    assert r.n > 10
    # DW lives in [0, 4]
    assert -1e-6 <= r.dw_stat <= 4.0 + 1e-6
    assert r.positive_autocorr == (1 if r.dw_stat < 1.5 else 0)


def test_granger_f_nonnegative_and_flag(spark):
    (r,) = rows(spark, "granger_views_to_purchases")
    assert r.n_days > 5
    # adding a regressor can only shrink SSR
    assert r.granger_f >= -1e-6
    assert r.causal_at_99 == (1 if r.granger_f > 6.8510 else 0)


def test_gumbel_return_level_exceeds_location(spark):
    (r,) = rows(spark, "gumbel_daily_max_fit")
    assert r.n_blocks > 10
    assert r.gumbel_beta_dollars > 0
    # -ln(-ln(1-1/30)) > 0, so the 30-block return level sits above mu
    assert r.return_level_30_dollars > r.gumbel_mu_dollars
