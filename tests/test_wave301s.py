"""Wave 301-312 invariants: algebraic laws for this session's queries.
Oracle equality is covered by the driver-sim sweep; these pin bounds
and identities on the sf0.001 fixture.
"""

from __future__ import annotations

from pyspark_movie_recommender_spark import queries as Q

SF = "/root/testdata/sf0.001"


def rows(spark, name):
    return Q.QUERIES[name](spark, SF).collect()


def test_position_auction_laws(spark):
    slots = sorted(rows(spark, "gsp_vcg_position_auction"), key=lambda r: r.slot)
    assert [r.slot for r in slots] == [1, 2, 3, 4, 5]
    bids = [r.bid_cents for r in slots]
    assert bids == sorted(bids, reverse=True)
    for r in slots:
        assert r.vcg_payment <= r.gsp_payment  # truthful mechanism charges less
    wf = rows(spark, "auction_welfare_split")
    assert len({r.total_welfare for r in wf}) == 1  # allocation-invariant
    for r in wf:
        assert r.bidder_surplus == r.total_welfare - r.platform_revenue


def test_network_null_models(spark):
    (c,) = rows(spark, "null_model_clustering_audit")
    assert c.n_wedges >= c.n_triangles
    assert 0 <= c.clustering_ppm <= 1_000_000
    (p,) = rows(spark, "powerlaw_degree_fit")
    assert p.alpha_milli > 1000  # a proper tail exponent
    assert 0 <= p.ks_milli <= 1000


def test_forecasting_protocol(spark):
    (t,) = rows(spark, "theta_method_forecast")
    assert t.horizon == 28
    assert t.theta_mae_cents > 0 and t.naive_mae_cents > 0
    mase = rows(spark, "mase_forecast_eval")
    assert {r.forecaster for r in mase} == {"naive", "snaive7", "drift", "mean"}
    assert all(r.mase_milli > 0 for r in mase)


def test_uncertainty_quantification(spark):
    (j,) = rows(spark, "jackknife_plus_regression")
    # nominal 90% with finite-sample slack on the tiny fixture
    assert 500_000 <= j.coverage_ppm <= 1_000_000
    assert j.interval_halfwidth_cents > 0
    bv = rows(spark, "bias_variance_folds")
    assert len(bv) == 3
    assert all(r.fold_pred_sd_cents >= 0 for r in bv)


def test_facility_location_laws(spark):
    (p,) = rows(spark, "p_median_nations")
    assert p.hub1 < p.hub2 < p.hub3
    assert p.p3_cost_microndw <= p.p1_cost_microndw  # more hubs never hurt
    (m,) = rows(spark, "max_covering_nations")
    assert m.greedy_coverage_ppm <= m.exact_coverage_ppm
    # Nemhauser-Wolsey-Fisher: greedy >= (1 - 1/e) of optimal
    assert m.greedy_ratio_milli >= 632


def test_input_output_economics(spark):
    lm = rows(spark, "leontief_multipliers_regions")
    assert len(lm) == 5
    for r in lm:
        assert r.output_multiplier_milli >= 1000  # I term alone gives 1
        assert r.indirect_milli >= -1
    hl = rows(spark, "hirschman_linkage_indices")
    assert abs(sum(r.backward_linkage_milli for r in hl) - 5000) <= 10
    assert abs(sum(r.forward_linkage_milli for r in hl) - 5000) <= 10
    for r in hl:
        assert r.is_key_sector == (
            1
            if r.backward_linkage_milli > 1000 and r.forward_linkage_milli > 1000
            else 0
        )


def test_discrete_tails(spark):
    ob = sorted(rows(spark, "overbooking_exact_binomial"), key=lambda r: r.bookings)
    assert ob[0].bookings == 100 and ob[0].overflow_ppm == 0
    ovs = [r.overflow_ppm for r in ob]
    assert ovs == sorted(ovs)  # more bookings, more risk
    for r in ob:
        assert r.within_5pct_risk == (1 if r.overflow_ppm <= 50_000 else 0)
    (pa,) = rows(spark, "binomial_poisson_tail_audit")
    assert (
        abs(
            pa.abs_err_ppm
            - abs(pa.poisson_approx_ppm - pa.exact_binomial_ppm)
        )
        <= 1
    )


def test_forecast_verification(spark):
    (c,) = rows(spark, "crps_ensemble_eval")
    assert c.n_days == 28
    assert c.crps_cents > 0
    rh = rows(spark, "rank_histogram_ensemble")
    assert sum(r.n_days for r in rh) == 28
    assert all(0 <= r.obs_rank <= 4 for r in rh)


def test_dependent_standard_errors(spark):
    (nw,) = rows(spark, "newey_west_se_daily")
    assert nw.naive_se_cents > 0 and nw.newey_west_se_cents > 0
    assert nw.inflation_milli > 0
    (bb,) = rows(spark, "block_bootstrap_se")
    assert bb.n_days == nw.n_days
    assert bb.block_bootstrap_se_cents > 0


def test_tokenizer_budget_curves(spark):
    oov = sorted(rows(spark, "oov_rate_curve"), key=lambda r: r.vocab_size)
    oovs = [r.oov_ppm for r in oov]
    assert oovs == sorted(oovs, reverse=True)  # bigger vocab, fewer OOV
    cov = sorted(rows(spark, "token_coverage_curve"), key=lambda r: r.top_k)
    covs = [r.coverage_ppm for r in cov]
    assert covs == sorted(covs)  # coverage grows with k
    assert all(0 < c <= 1_000_000 for c in covs)


def test_systems_math_identities(spark):
    (h,) = rows(spark, "hutchinson_trace_audit")
    assert (
        abs(h.abs_err_micro - abs(h.hutchinson_micro - h.exact_trace2_micro))
        <= 1
    )
    (d,) = rows(spark, "delta_join_maintenance_audit")
    # the delta algebra IS the recompute difference, exactly
    assert d.delta_algebra_rows == d.recompute_diff
    assert 0 < d.incremental_fraction_ppm <= 1_000_000


def test_symmetry_breaking_rounds(spark):
    mis = sorted(rows(spark, "luby_mis_rounds"), key=lambda r: r.round)
    for a, b in zip(mis, mis[1:]):
        assert b.mis_size >= a.mis_size
        assert b.active_left <= a.active_left
    mt = sorted(rows(spark, "local_min_matching_rounds"), key=lambda r: r.round)
    free0 = mt[0].free_nodes
    for r in mt:
        # every matched edge consumes exactly two free endpoints
        assert r.free_nodes == free0 - 2 * r.matched_edges
