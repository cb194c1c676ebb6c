"""Wave 252-271 invariants: algebraic laws for this session's queries.
Oracle equality is covered by the driver-sim sweep; these pin bounds
and identities on the sf0.001 fixture.
"""

from __future__ import annotations

from pyspark_movie_recommender_spark import queries as Q

SF = "/root/testdata/sf0.001"


def rows(spark, name):
    return Q.QUERIES[name](spark, SF).collect()


def test_warp_distance_ordering(spark):
    dtw = {(r.nation_a, r.nation_b): r for r in rows(spark, "dtw_nation_dow_profiles")}
    fre = {(r.nation_a, r.nation_b): r for r in rows(spark, "frechet_nation_dow_profiles")}
    assert len(dtw) == 300 and len(fre) == 300
    for k, d in dtw.items():
        f = fre[k]
        assert d.aligned_l1_ppm == f.aligned_l1_ppm
        # frechet (bottleneck) <= dtw (sum) <= warp-free L1
        assert f.warp_ppm <= d.warp_ppm <= d.aligned_l1_ppm


def test_kcore_trajectory_monotone(spark):
    rs = sorted(rows(spark, "kcore_peeling_trajectory"), key=lambda r: r.round)
    assert [r.round for r in rs] == list(range(7))
    for a, b in zip(rs, rs[1:]):
        assert b.nodes_left <= a.nodes_left
        assert b.edges_left <= a.edges_left


def test_mantel_bounded(spark):
    (r,) = rows(spark, "mantel_matrix_correlation")
    assert 0 < r.n_pairs <= 300
    assert -1_000_000 <= r.mantel_r_micro <= 1_000_000


def test_checkdigit_audits_consistent(spark):
    for r in rows(spark, "luhn_checkdigit_audit"):
        assert 0 <= r.n_invalid <= r.n_accounts
        assert r.invalid_ppm == round(r.n_invalid * 1_000_000 / r.n_accounts)
    for r in rows(spark, "mod97_checkdigit_audit"):
        # the residue identity and digit recomputation must agree
        assert r.n_invalid == r.n_mismatch


def test_spatial_point_stats(spark):
    (ce,) = rows(spark, "clark_evans_nn_index")
    assert 0 < ce.n_with_nn <= ce.n_points
    assert ce.clark_evans_micro > 0
    rk = sorted(rows(spark, "ripley_k_census"), key=lambda r: r.r_milli)
    assert [r.r_milli for r in rk] == [10, 20, 40, 80]
    for a, b in zip(rk, rk[1:]):
        assert a.n_pairs_within <= b.n_pairs_within  # K monotone in r
    for r in rk:
        assert r.n_pairs_within % 2 == 0  # ordered pairs come in mirror twins


def test_sketch_bounds(spark):
    (ams,) = rows(spark, "ams_f2_sketch")
    assert ams.ams_min_est <= ams.ams_mean_est <= ams.ams_max_est
    assert ams.exact_f2 > 0
    (lc,) = rows(spark, "linear_counting_sketch")
    assert lc.occupied <= min(lc.n_buckets, lc.exact_distinct)
    assert lc.lc_estimate >= lc.occupied
    (h,) = rows(spark, "hll_distinct_sketch")
    assert h.hll_estimate > 0
    # m=64 => sigma ~13% asymptotically, but the sf0.001 fixture sits in
    # HLL's known D ~ 2.5m bias gap (raw estimate just above the
    # small-range-correction threshold); sf0.01 lands ~8%.
    assert h.rel_err_ppm <= 600_000
    (t,) = rows(spark, "theta_sketch_intersection")
    assert 0 <= t.sample_hits <= 128
    assert t.exact_intersection <= min(t.exact_a, t.exact_b)


def test_delong_consistency(spark):
    (v,) = rows(spark, "delong_auc_variance")
    assert 0 <= v.auc_ppm <= 1_000_000
    assert v.se_micro > 0
    (p,) = rows(spark, "delong_paired_auc_test")
    assert abs(p.diff_ppm - (p.auc_price_ppm - p.auc_recency_ppm)) <= 1
    assert p.se_diff_micro > 0


def test_process_mining_symmetry(spark):
    fp = rows(spark, "alpha_footprint_matrix")
    k = int(len(fp) ** 0.5)
    assert k * k == len(fp)
    by = {(r.type_a, r.type_b): r for r in fp}
    n_causal = sum(1 for r in fp if r.relation == "causal")
    n_inverse = sum(1 for r in fp if r.relation == "inverse")
    assert n_causal == n_inverse  # mirror cells classify mirrored
    for (a, b), r in by.items():
        assert by[(b, a)].df_ab == r.df_ba
    hd = {(r.type_a, r.type_b): r for r in rows(spark, "heuristic_dependency_measure")}
    for (a, b), r in hd.items():
        if a != b:
            assert abs(r.dependency_milli + hd[(b, a)].dependency_milli) <= 1


def test_ols_influence_identities(spark):
    cd = rows(spark, "cooks_distance_top_days")
    assert len(cd) == 10
    assert all(r.cook_micro >= 0 for r in cd)
    assert sorted((r.cook_micro for r in cd), reverse=True) == [r.cook_micro for r in cd]
    (pr,) = rows(spark, "press_loocv_r2")
    assert pr.r2_pred_milli <= pr.r2_milli
    assert abs(pr.trace_hat_milli - 2000) <= 1  # trace(H) = p = 2
    assert pr.max_hat_micro >= round(1_000_000 / pr.n_days)


def test_region_graph_dp(spark):
    (hk,) = rows(spark, "held_karp_region_tour")
    if hk.n_edges == 20:  # complete digraph => all 4 final states close
        assert hk.n_complete_tours == 4
        assert hk.tsp_cost_micro_nats > 0
    (mc,) = rows(spark, "karp_min_mean_cycle")
    assert mc.min_mean_cycle_micro <= mc.best_2cycle_mean_micro


def test_lot_sizing_optimality(spark):
    (r,) = rows(spark, "wagner_whitin_lot_sizing")
    assert r.ww_optimal_cents <= r.single_order_cents
    assert r.ww_optimal_cents <= r.order_every_period_cents


def test_inspection_paradox_direction(spark):
    (r,) = rows(spark, "inspection_paradox_audit")
    assert r.paradox_ratio_milli >= 1000  # E[X^2] >= E[X]^2
    assert r.length_biased_mean_ms >= r.mean_gap_ms
    assert abs(r.random_incidence_wait_ms * 2 - r.length_biased_mean_ms) <= 1


def test_portfolio_optimality(spark):
    (m,) = rows(spark, "markowitz_min_variance_pair")
    assert m.minvar_vs_equal_milli <= 1000
    assert m.minvar_vs_best_single_milli <= 1000
    rp = rows(spark, "inverse_vol_risk_parity")
    assert len(rp) == 5
    assert abs(sum(r.weight_ppm for r in rp) - 1_000_000) <= len(rp)
    contribs = [r.risk_contrib_cents for r in rp]
    assert max(contribs) - min(contribs) <= 1  # equalized risk

def test_directional_stats_bounds(spark):
    for r in rows(spark, "vmf_concentration_by_label"):
        assert 0 < r.rbar_micro <= 1_000_000
        assert r.kappa_milli > 0
    for r in rows(spark, "rayleigh_angle_uniformity"):
        assert 0 < r.rbar_micro <= 1_000_000
        assert r.rayleigh_z_milli >= 0


def test_clusterability_bounds(spark):
    (h,) = rows(spark, "hopkins_clusterability_2d")
    assert 0 <= h.hopkins_micro <= 1_000_000
    (p,) = rows(spark, "nn_label_purity_test")
    assert 0 <= p.observed_same_ppm <= 1_000_000
    assert p.same_cnt <= p.n_points


def test_power_indices_conservation(spark):
    ss = rows(spark, "shapley_shubik_region_power")
    assert len(ss) == 5
    # each of the 120 orderings has exactly one pivotal player
    assert sum(r.pivotal_orderings for r in ss) == 120
    assert abs(sum(r.shapley_milli for r in ss) - 1000) <= len(ss)
    dp = rows(spark, "deegan_packel_region_power")
    assert abs(sum(r.deegan_packel_milli for r in dp) - 1000) <= len(dp)


def test_ldp_mechanisms(spark):
    deb = rows(spark, "ldp_rr_frequency_debias")
    assert len(deb) == 5
    assert abs(sum(r.debiased_share_ppm for r in deb) - 1_000_000) <= 10
    sw = sorted(rows(spark, "ldp_rr_epsilon_sweep"), key=lambda r: r.p_milli)
    eps = [r.epsilon_milli for r in sw]
    assert eps == sorted(eps)  # epsilon strictly grows with p
    assert all(e > 0 for e in eps)


def test_actuarial_consistency(spark):
    for r in rows(spark, "bornhuetter_ferguson_reserves"):
        assert 0 < r.pct_reported_ppm <= 1_000_001
        assert r.cl_ultimate_dollars >= r.paid_cents / 100.0 - 0.01
    for r in rows(spark, "mack_factor_volatility"):
        assert r.n_origins >= 2
        assert r.mack_sigma2_milli >= 0


def test_causal_adjustments_share_naive(spark):
    (fd,) = rows(spark, "front_door_adjustment")
    (bd,) = rows(spark, "backdoor_standardization")
    assert fd.n_orders == bd.n_orders
    assert abs(fd.naive_diff_ppm - bd.naive_diff_ppm) <= 1
    assert abs(fd.front_door_ate_ppm) <= 1_000_000
    assert abs(bd.backdoor_ate_ppm) <= 1_000_000


def test_james_stein_geometry(spark):
    js = rows(spark, "james_stein_nation_means")
    assert len(js) == 25
    for r in js:
        assert 0 <= r.shrink_weight_milli <= 1000
    raw = [r.raw_mean_cents for r in js]
    shr = [r.js_mean_cents for r in js]
    # shrinkage contracts the spread around the grand mean
    assert max(shr) - min(shr) <= max(raw) - min(raw)
    (h,) = rows(spark, "shrinkage_holdout_mse")
    assert h.n_nations == 25
    assert h.js_beats_raw in (0, 1)
    assert h.raw_rmse_cents > 0 and h.js_rmse_cents > 0
