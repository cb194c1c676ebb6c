"""Wave 212+ invariants: algebraic laws for this session's queries.
Oracle equality is covered by the driver-sim sweep; these pin bounds
and identities on the sf0.001 fixture.
"""

from __future__ import annotations

from pyspark_movie_recommender_spark import queries as Q

SF = "/root/testdata/sf0.001"


def rows(spark, name):
    return Q.QUERIES[name](spark, SF).collect()


def test_psi_panel_nonnegative(spark):
    r = rows(spark, "psi_feature_panel")
    assert {x.feature for x in r} == {"price", "qty", "disc", "tax"}
    for x in r:
        assert x.n_bins >= 1
        # PSI is a symmetrized KL: nonnegative
        assert x.psi >= -1e-9
        assert x.drift_class in (0, 1, 2)


def test_ks_panel_unit_interval(spark):
    r = rows(spark, "ks_feature_panel")
    assert {x.feature for x in r} == {"price", "qty", "disc", "tax"}
    for x in r:
        assert 0.0 <= x.ks_stat <= 1.0
        assert x.drifted_at_99 in (0, 1)


def test_sprt_decision_consistency(spark):
    (r,) = rows(spark, "sprt_conversion_monitor")
    assert r.n_days > 0
    assert r.decision in (-1, 0, 1)
    if r.decision == 0:
        assert r.decision_day == -1
    else:
        assert r.decision_day >= 0


def test_run_length_gaps_sane(spark):
    (r,) = rows(spark, "signal_run_length_gaps")
    assert r.n_days > 0
    assert r.n_signals >= 0
    if r.n_signals >= 2:
        assert 1 <= r.min_gap_days <= r.max_gap_days


def test_survivorship_counts_nested(spark):
    (r,) = rows(spark, "survivorship_bias_audit")
    assert 0 < r.surviving_customers <= r.h1_customers
    assert r.mean_spend_all > 0 and r.mean_spend_survivors > 0


def test_berkson_shift_defined(spark):
    (r,) = rows(spark, "berkson_selection_correlation")
    assert 0 < r.n_selected <= r.n_all
    assert -1.0 <= r.corr_all <= 1.0
    assert -1.0 <= r.corr_selected <= 1.0
    assert abs(r.berkson_shift - (r.corr_selected - r.corr_all)) < 1e-5


def test_geohash_census_consistent(spark):
    (r,) = rows(spark, "geohash_grid_census")
    assert r.total_customers > 0
    assert 1 <= r.n_cells <= r.total_customers
    assert r.singleton_cells <= r.n_cells
    assert r.max_cell_pop >= 1


def test_haversine_hub_partition(spark):
    r = rows(spark, "haversine_hub_assignment")
    assert len(r) >= 2
    for x in r:
        assert x.n_customers > 0
        # max possible great-circle distance ~ 20015 km = 200150 hm
        assert 0 <= x.min_dist_hm <= x.max_dist_hm <= 200151


def test_morans_i_bounds(spark):
    (r,) = rows(spark, "spatial_moran_i")
    assert r.n_points > 0 and r.n_neighbor_pairs > 0
    # Moran's I on random assignment lives near -1/(n-1); bounded ~[-1, 1]
    assert -1.5 <= r.morans_i <= 1.5


def test_idw_balances_plausible(spark):
    r = rows(spark, "idw_hub_interpolation")
    assert len(r) == 5
    for x in r:
        assert x.total_weight > 0
        # IDW is a convex combination: inside the data range
        assert -100000 <= x.idw_balance <= 100000


def test_garch_vols_positive(spark):
    (r,) = rows(spark, "garch11_daily_vol")
    assert r.n_returns > 1
    assert r.final_vol > 0 and r.uncond_vol > 0
    assert 0 <= r.n_2sigma_exceed <= r.n_returns


def test_garman_klass_nonnegative_var(spark):
    (r,) = rows(spark, "garman_klass_volatility")
    assert r.n_days > 0
    assert r.gk_daily_vol >= 0
    assert 0 <= r.negative_days <= r.n_days


def test_bloom_fpr_calibrated(spark):
    (r,) = rows(spark, "bloom_fpr_empirical")
    assert r.n_members > 0 and r.n_probes > 0
    assert 0 < r.set_bits <= 3 * r.n_members
    assert 0.0 <= r.observed_fpr <= 1.0
    # observed should be within a loose band of theoretical
    assert abs(r.observed_fpr - r.theoretical_fpr) < 0.2


def test_consistent_hashing_no_collateral(spark):
    (r,) = rows(spark, "consistent_hashing_rebalance")
    assert r.n_keys > 0
    # the defining property: only keys on the removed shard move
    assert r.collateral_moves == 0
    assert r.moved == r.on_removed_shard


def test_lru_hit_rate_bounds(spark):
    (r,) = rows(spark, "lru_cache_hit_simulation")
    assert r.n_customers > 0
    assert r.n_accesses >= r.n_customers
    assert 0 <= r.n_hits < r.n_accesses
    assert 0 <= r.hit_rate_ppm < 1_000_000


def test_working_set_saturation_bounds(spark):
    (r,) = rows(spark, "working_set_trailing_distinct")
    if r.n_customers:
        assert 1.0 <= r.mean_working_set <= 8.0
        assert 0 < r.saturation_ppm <= 1_000_000


def test_gamma_interarrival_consistency(spark):
    (r,) = rows(spark, "gamma_mom_interarrival")
    assert r.n_gaps > 0
    assert r.mean_gap_hours > 0 and r.gamma_scale_hours > 0
    assert r.gamma_shape_k > 0
    assert r.burstier_than_poisson == (1 if r.gamma_shape_k < 1.0 else 0)


def test_burstiness_memory_bounds(spark):
    (r,) = rows(spark, "burstiness_memory_coords")
    assert r.n_gaps > 1 and r.n_pairs >= 1
    assert -1.0 <= r.burstiness_b <= 1.0
    assert -1.0 <= r.memory_m <= 1.0
    assert r.bursty == (1 if r.burstiness_b > 0 else 0)


def test_isotropy_cosine_bounds(spark):
    (r,) = rows(spark, "embedding_isotropy_score")
    assert r.n_vectors > 1
    assert -1.0 <= r.mean_pairwise_cosine <= 1.0
    assert r.anisotropic == (1 if r.mean_pairwise_cosine > 0.1 else 0)


def test_effective_rank_bounds(spark):
    (r,) = rows(spark, "embedding_effective_rank")
    assert r.n_dims > 1
    assert 1.0 <= r.effective_rank <= r.n_dims + 1e-6
    assert 0.0 < r.top_dim_var_share <= 1.0


def test_bartlett_flag_consistent(spark):
    (r,) = rows(spark, "bartlett_variance_test")
    assert r.n_groups == 5
    assert r.bartlett_chi2 >= -1e-9
    assert r.heteroscedastic_at_99 == (1 if r.bartlett_chi2 > 13.2767 else 0)


def test_cochrans_q_nonnegative(spark):
    (r,) = rows(spark, "cochrans_q_monthly")
    assert r.n_customers > 0
    assert r.cochrans_q >= -1e-9
    assert r.participation_shifted_at_99 == (
        1 if r.cochrans_q > 9.21034 else 0
    )


def test_zip_fit_consistency(spark):
    (r,) = rows(spark, "zip_orders_per_customer")
    assert r.n_customers > 0
    assert 0 <= r.observed_zeros <= r.n_customers
    assert 0.0 <= r.zip_pi < 1.0
    assert r.zip_lambda > 0
    assert 0 <= r.expected_zeros <= r.n_customers


def test_hurdle_identity_adds_up(spark):
    (r,) = rows(spark, "hurdle_growth_decomposition")
    total = r.participation_part + r.intensity_part + r.interaction_part
    assert abs(total - r.growth_per_cust_dollars) < 0.05


def test_welch_anova_positive(spark):
    (r,) = rows(spark, "welch_anova_segments")
    assert r.n_groups == 5
    assert r.welch_f >= 0
    assert r.df_denominator > 0
    assert r.means_differ_at_99 == (1 if r.welch_f > 3.32 else 0)


def test_median_polish_residual_medians_zeroish(spark):
    r = rows(spark, "median_polish_cells")
    assert len(r) == 25
    # after a column sweep, each segment's residual median is exactly 0
    from collections import defaultdict
    by_seg = defaultdict(list)
    for x in r:
        by_seg[x.segment].append(x.residual_cents)
    import statistics
    for seg, vals in by_seg.items():
        vals.sort()
        # discrete median (lower) of 5 values is the 3rd
        assert vals[len(vals) // 2] == 0 or vals[(len(vals) - 1) // 2] == 0


def test_markov_hit_rate_bounds(spark):
    (r,) = rows(spark, "markov_next_event_hit_rate")
    assert r.n_test > 0
    assert 0 <= r.hits <= r.n_test
    assert 0 <= r.hit_rate_ppm <= 1_000_000


def test_popularity_baseline_same_testset(spark):
    (m,) = rows(spark, "markov_next_event_hit_rate")
    (b,) = rows(spark, "popularity_baseline_hit_rate")
    assert b.n_test == m.n_test  # identical holdout
    assert b.predicted_type in ("view", "click", "purchase", "signup", "error")


def test_ips_policy_values_positive(spark):
    (r,) = rows(spark, "ips_policy_value")
    assert r.n_logged > 0
    assert 0 < r.n_matched <= r.n_logged
    assert r.ips_value_dollars > 0
    assert r.logging_value_dollars > 0


def test_snips_weight_diagnostics(spark):
    (r,) = rows(spark, "snips_policy_value")
    assert r.n_logged > 0
    # empirical propensities make mean weight exactly ~ match-rate scaled;
    # with consistent propensities it sits near 1
    assert 0.2 <= r.mean_weight <= 5.0
    assert r.max_weight >= r.mean_weight
    assert r.snips_value_dollars > 0


def test_dr_estimators_coherent(spark):
    (r,) = rows(spark, "dr_policy_value")
    assert r.n_logged > 0
    for v in (r.dr_value_dollars, r.dm_value_dollars, r.ips_value_dollars):
        assert v > 0


def test_greedy_improvement_dominates(spark):
    r = rows(spark, "greedy_policy_improvement")
    assert len(r) == 5
    for x in r:
        # the greedy max of per-action means >= the overall segment mean
        # (it maxes over a partition of the same rows, modulo n>=30 cells)
        assert x.greedy_value_dollars >= x.logging_value_dollars - 1.0


def test_zone_map_sorted_prunes_more(spark):
    (r,) = rows(spark, "zone_map_pruning_simulation")
    assert r.natural_blocks > 0 and r.sorted_blocks > 0
    # sorting by the predicate column can only improve pruning
    assert r.sorted_prune_ppm >= r.natural_prune_ppm
    assert 0 <= r.sorted_pruned <= r.sorted_blocks


def test_clustering_factor_panel(spark):
    r = rows(spark, "clustering_factor_audit")
    assert [x.column_name for x in r] == ["partkey", "price", "shipdate"]
    for x in r:
        assert -1.0 <= x.key_order_corr <= 1.0
        assert x.well_clustered == (1 if abs(x.key_order_corr) > 0.5 else 0)


def test_switchback_ate_arms_balanced(spark):
    (r,) = rows(spark, "switchback_day_parity_ate")
    assert r.treated_days > 0 and r.control_days > 0
    assert abs(r.treated_days - r.control_days) <= 1
    assert r.se_dollars > 0


def test_switchback_carryover_counts(spark):
    (r,) = rows(spark, "switchback_carryover_audit")
    # strict day parity: every control day follows a treated day
    assert r.ctrl_after_control == 0
    assert r.ctrl_after_treated >= 0


def test_jackknife_se_positive(spark):
    (r,) = rows(spark, "jackknife_ratio_se")
    assert r.n_groups == 25
    assert r.ratio_dollars > 0
    assert r.jackknife_se_dollars >= 0
    # bias-corrected estimate stays in the neighborhood of theta
    assert abs(r.bias_corrected_dollars - r.ratio_dollars) < r.ratio_dollars


def test_delta_method_agrees_on_point(spark):
    (j,) = rows(spark, "jackknife_ratio_se")
    (d,) = rows(spark, "delta_method_ratio_se")
    # same ratio target (marginal revenue/orders)
    assert abs(j.ratio_dollars - d.ratio_dollars) < 1.0
    assert d.delta_se_dollars > 0


def test_rtm_top_decile_falls_back(spark):
    (r,) = rows(spark, "regression_to_mean_audit")
    assert r.n_top_decile > 0
    # the H1 top decile's H2 mean must sit below its (selected) H1 mean
    assert r.h2_mean_dollars < r.h1_mean_dollars
    assert 0 <= r.mean_h2_rank_from_top_ppm <= 1_000_000


def test_winners_curse_fields(spark):
    (r,) = rows(spark, "winners_curse_estimate")
    assert r.h1_edge_dollars > 0  # the winner had a positive H1 edge
    # persistence below 1 demonstrates the curse on noisy selection
    assert r.edge_persistence < 1.5


def test_german_tank_estimate_sane(spark):
    (r,) = rows(spark, "german_tank_estimator")
    assert r.n_observed > 0
    assert r.mvue_estimate >= r.max_serial  # estimate can't undercut max
    assert r.rel_err_ppm < 500_000  # within 50% of truth


def test_birthday_estimates_bracket_truth(spark):
    (r,) = rows(spark, "birthday_collision_estimate")
    assert 0 < r.occupied_buckets <= 4096
    assert r.true_distinct > 0
    # occupancy estimator is tight in this regime: within 25%
    assert abs(r.occupancy_estimate - r.true_distinct) < 0.25 * r.true_distinct
    assert r.collision_estimate > 0


def test_bellman_ford_distances_sane(spark):
    (r,) = rows(spark, "bellman_ford_trade_costs")
    # sf0.001 can leave the source nation without outgoing trade edges;
    # oracle equality at sf0.01 pins the full distance vector
    assert r.reachable_nations >= 1
    if r.reachable_nations > 1:
        assert 0 < r.nearest_cost_micro_nats <= r.max_cost_micro_nats
        assert r.total_cost_micro_nats > 0


def test_minplus_radius_le_diameter(spark):
    (r,) = rows(spark, "minplus_diameter_trade")
    assert r.n_nodes > 1
    assert 0 < r.radius_micro_nats <= r.diameter_micro_nats
    assert r.reachable_pairs <= r.n_nodes * r.n_nodes


def test_palma_hoover_bounds(spark):
    (r,) = rows(spark, "palma_hoover_inequality")
    assert r.top10_n == r.n_customers // 10
    assert r.bottom40_n == (4 * r.n_customers) // 10
    assert 0 <= r.hoover_ppm <= 1_000_000
    assert r.top10_share_ppm + r.bottom40_share_ppm <= 1_000_000
    assert r.palma_ppm > 0


def test_ransac_consensus_sane(spark):
    (r,) = rows(spark, "ransac_line_quantity_price")
    assert 0 < r.n_candidates <= 16
    assert 1 <= r.best_pair_id <= 16
    # the winning model's own two generating points are always inliers
    assert 2 <= r.best_inliers <= r.n_points
    assert 0 < r.inlier_ratio_ppm <= 1_000_000
    assert r.refit_slope_cents == r.refit_slope_cents  # finite, not NaN


def test_largest_rectangle_bounds(spark):
    (r,) = rows(spark, "largest_rectangle_daily_value")
    assert 1 <= r.width_days <= r.n_days
    assert r.area_cents_days == r.width_days * r.min_height_cents
    assert r.best_start_date <= r.best_end_date


def test_convex_hull_invariants(spark):
    (r,) = rows(spark, "convex_hull_nation_profile")
    # hull of >=3 points in general position: edges form a cycle
    assert r.hull_edges == r.hull_vertices
    assert 3 <= r.hull_vertices <= r.n_points
    assert r.shoelace_2a > 0  # counterclockwise orientation
    assert r.perimeter_rounded > 0


def test_shannon_sandwich(spark):
    (r,) = rows(spark, "shannon_code_audit")
    assert r.vocab_size > 0 and r.total_tokens >= r.vocab_size
    # Kraft inequality holds for any prefix-free code
    assert 0 < r.kraft_ppm <= 1_000_000
    # source coding theorem: H <= E[L] < H + 1 (milli-bits, rounding slack)
    assert r.entropy_milli_bits - 1 <= r.expected_len_milli_bits
    assert r.expected_len_milli_bits <= r.entropy_milli_bits + 1001


def test_vickrey_revenue_dominance(spark):
    (r,) = rows(spark, "vickrey_auction_parts")
    assert r.n_auctions > 0
    # second-price revenue never exceeds first-price
    assert r.sp_revenue_cents <= r.fp_revenue_cents
    assert 0 <= r.vickrey_discount_ppm <= 1_000_000
    assert r.max_single_discount_cents >= 0
    assert 0 <= r.tied_auctions <= r.n_auctions


def test_banzhaf_power_sums_and_bounds(spark):
    r = rows(spark, "banzhaf_region_power")
    assert len(r) == 5
    total = sum(x.n_swings for x in r)
    assert total > 0
    # swing counts are even in a simple-majority game without a dictator
    for x in r:
        assert 0 <= x.n_swings <= 16
    # ppm shares sum to ~1e6 (rounding slack)
    assert abs(sum(x.banzhaf_ppm for x in r) - 1_000_000) <= 5


def test_holm_dominates_bonferroni(spark):
    r = rows(spark, "holm_bonferroni_stepdown")
    assert len(r) == 25
    prev = 0.0
    for x in sorted(r, key=lambda x: x.rnk):
        # adjusted p monotone nondecreasing in rank, clamped at 1
        assert x.holm_adj_p >= prev - 1e-9
        assert x.holm_adj_p <= 1.0
        prev = x.holm_adj_p
        # Holm rejects whenever Bonferroni does
        if x.rejected_bonferroni:
            assert x.rejected_holm


def test_hilbert_unit_steps_beat_zorder(spark):
    (r,) = rows(spark, "hilbert_vs_zorder_locality")
    # sf0.001 has 150 customers -> not all 256 cells occupied; bounds only
    assert 1 <= r.n_cells <= 256
    # Hilbert's defining property: every consecutive step is distance 1
    # when the full grid is occupied; in general its walk never exceeds Z's
    assert r.h_total_manhattan <= r.z_total_manhattan
    assert r.h_max_step <= r.z_max_step
    assert 1 <= r.h_rect_runs <= r.z_rect_runs + 6


def test_hilbert_lut_bijective_unit_steps():
    # private helper lives in its registry part since the r03 monolith
    # split — import from the defining module, not the package
    from pyspark_movie_recommender_spark.queries.registry_06 import (
        _hilbert_lut_16,
    )

    lut = _hilbert_lut_16()
    assert sorted(h for _, _, _, h in lut) == list(range(256))
    assert sorted(z for _, _, z, _ in lut) == list(range(256))
    inv = {h: (x, y) for x, y, _, h in lut}
    for i in range(255):
        x0, y0 = inv[i]
        x1, y1 = inv[i + 1]
        assert abs(x1 - x0) + abs(y1 - y0) == 1


def test_frequent_triples_bounds(spark):
    (r,) = rows(spark, "frequent_triples_parts")
    assert r.n_baskets > 0
    assert r.n_triples > 0
    # capped baskets: at most C(10,3) triples per basket
    assert r.total_triple_occurrences <= 120 * r.n_baskets
    assert 1 <= r.max_support
    assert r.triples_support_ge2 <= r.n_triples


def test_anderson_darling_nonnegative(spark):
    (r,) = rows(spark, "anderson_darling_two_sample")
    assert r.n_urgent > 0 and r.n_other > 0
    assert r.a2_milli >= 0  # A^2 is a sum of squares
    assert r.reject_05 == (1 if r.a2_milli > 2492 else 0)


def test_lepage_combines_components(spark):
    (r,) = rows(spark, "lepage_location_scale_test")
    assert r.n_returned > 0 and r.n_other > 0
    # L = zW^2 + zAB^2 (milli rounding slack on each component)
    approx = (r.wilcoxon_z_milli / 1000.0) ** 2 + (
        r.ansari_z_milli / 1000.0
    ) ** 2
    assert abs(r.lepage_l_milli / 1000.0 - approx) < 0.01
    assert r.lepage_l_milli >= 0
    assert r.reject_05 == (1 if r.lepage_l_milli > 5991 else 0)
