"""Wave 272-286 invariants: algebraic laws for this session's queries.
Oracle equality is covered by the driver-sim sweep; these pin bounds
and identities on the sf0.001 fixture.
"""

from __future__ import annotations

from pyspark_movie_recommender_spark import queries as Q

SF = "/root/testdata/sf0.001"


def rows(spark, name):
    return Q.QUERIES[name](spark, SF).collect()


def test_histogram_design(spark):
    (r,) = rows(spark, "bin_width_rules_compare")
    assert r.sturges_bins >= 1
    assert r.scott_width_cents > 0 and r.fd_width_cents > 0
    mdl = sorted(rows(spark, "histogram_mdl_select"), key=lambda x: x.n_bins)
    assert sum(x.is_best for x in mdl) == 1
    pens = [x.bic_penalty_nats for x in mdl]
    assert pens == sorted(pens)  # penalty grows with bins
    for x in mdl:
        assert abs(x.score_nats - (x.loglik_nats - x.bic_penalty_nats)) <= 1


def test_centrality_closure(spark):
    bc = rows(spark, "betweenness_nation_trade")
    assert len(bc) == 25
    assert all(r.betweenness_milli >= 0 for r in bc)
    cl = rows(spark, "closeness_exact_nation")
    assert len(cl) <= 25
    for r in cl:
        # tiny fixture can drop nations from the flow graph entirely
        assert 0 <= r.reached <= 24
        assert r.closeness_x1e12 >= 0
        assert r.eccentricity_micro_nats >= 0


def test_fairness_and_calibration(spark):
    fa = rows(spark, "fairness_group_audit")
    assert len(fa) == 5
    assert max(r.disparate_impact_milli for r in fa) == 1000
    for r in fa:
        assert 0 <= r.selection_ppm <= 1_000_000
        assert 0 <= r.tpr_ppm <= 1_000_000
        assert 0 <= r.fpr_ppm <= 1_000_000
    for r in rows(spark, "group_calibration_gap"):
        assert 0 <= r.mean_gap_ppm <= r.max_gap_ppm <= 1_000_000


def test_waiting_time_laws(spark):
    (c,) = rows(spark, "coupon_collector_audit")
    assert 0 <= c.n_collectors <= c.n_users
    # k*H_k recomputed exactly
    hk = sum(1.0 / j for j in range(1, c.k_types + 1))
    assert abs(c.expected_draws_milli - round(c.k_types * hk * 1000)) <= 1
    (p,) = rows(spark, "pattern_waiting_time_audit")
    pr = p.p_ppm / 1_000_000
    assert abs(p.conway_expected_milli - round((1 / pr + 1 / pr**2) * 1000)) <= 10
    assert p.mean_wait_milli >= 2000  # pattern needs at least two draws


def test_spectral_and_allan(spark):
    ls = rows(spark, "lomb_scargle_events")
    assert len(ls) == 4
    assert all(r.ls_power_norm_micro >= 0 for r in ls)
    av = rows(spark, "allan_variance_daily")
    assert {r.tau_days for r in av} <= {1, 2, 4, 8, 16}
    for r in av:
        assert r.n_pairs > 0 and r.allan_var_milli >= 0


def test_robust_estimators(spark):
    rc = rows(spark, "rousseeuw_croux_scale")
    assert len(rc) == 25
    for r in rc:
        assert r.qn_cents > 0 and r.sn_cents > 0 and r.stddev_cents > 0
    hl = rows(spark, "hodges_lehmann_location")
    assert len(hl) == 25
    for r in hl:
        assert abs(r.mean_minus_hl_cents - (r.mean_cents - r.hodges_lehmann_cents)) <= 1


def test_johnson_and_entropy_ladder(spark):
    for r in rows(spark, "johnsons_rule_flowshop"):
        assert r.johnson_makespan <= r.fifo_makespan  # Johnson optimal
    for r in rows(spark, "conditional_entropy_ladder"):
        # more context never increases conditional entropy
        assert r.h1_milli_bits + 1 >= r.h2_cond_milli_bits
        assert r.h2_cond_milli_bits + 1 >= r.h3_cond_milli_bits
        assert r.h3_cond_milli_bits >= -1


def test_aic_and_pit(spark):
    fits = rows(spark, "distribution_aic_tournament")
    assert sorted(r.aic_rank for r in fits) == [1, 2, 3]
    for r in fits:
        assert abs(r.aic_nats - (2 * r.k_params - 2 * r.loglik_nats)) <= 2
    pit = rows(spark, "pit_uniformity_exponential")
    assert abs(sum(r.share_ppm for r in pit) - 1_000_000) <= len(pit)
    assert all(r.chi2_term_milli >= 0 for r in pit)


def test_renyi_monotone_and_nodf(spark):
    for r in rows(spark, "renyi_entropy_spectrum"):
        seq = [r.h0_milli, r.h05_milli, r.h1_milli, r.h2_milli, r.hinf_milli]
        for a, b in zip(seq, seq[1:]):
            assert a + 1 >= b  # H_q non-increasing in q
    (n,) = rows(spark, "nodf_nestedness")
    assert 0 <= n.nodf_milli <= 100_000
    assert 0 < n.fill_ppm <= 1_000_000


def test_dependence_measures(spark):
    (d,) = rows(spark, "dcov_dcor_daily")
    assert d.dcov_milli >= 0
    assert 0 <= d.dcor_micro <= 1_000_000
    (b,) = rows(spark, "blomqvist_beta_daily")
    assert abs(b.blomqvist_beta_micro) <= 1_000_000
    assert b.n_concordant + b.n_discordant > 0


def test_win_ratio_conservation(spark):
    (r,) = rows(spark, "win_ratio_composite")
    assert r.wins + r.losses + r.ties == r.n_treated * r.n_control
    assert abs(r.win_ratio_milli - round(r.wins * 1000 / r.losses)) <= 1


def test_service_levels_monotone_in_z(spark):
    rs = rows(spark, "empirical_service_levels")
    by_brand = {}
    for r in rs:
        by_brand.setdefault(r.brand, []).append(r)
    for brand, lst in by_brand.items():
        lst.sort(key=lambda x: x.z_level)
        for a, b in zip(lst, lst[1:]):
            assert a.cycle_service_ppm <= b.cycle_service_ppm
            assert a.fill_rate_ppm <= b.fill_rate_ppm


def test_cardinality_audits(spark):
    jo = {r.step: r for r in rows(spark, "join_order_cardinality_audit")}
    # FK join: est = |L||O|/|O| = |L| = actual (every lineitem has an order)
    assert jo["join_LO"].q_error_milli == 1000
    assert all(r.q_error_milli >= 1000 for r in jo.values())
    for r in rows(spark, "selectivity_independence_audit"):
        assert r.q_error_milli >= 1000
        assert r.joint_ppm <= min(r.sel_a_ppm, r.sel_b_ppm) + 1
    for r in rows(spark, "histogram_range_estimator_audit"):
        assert r.q_error_milli >= 999  # smoothed ratio can dip a hair under
    (g,) = rows(spark, "ndv_sampling_gee_audit")
    assert g.q_error_milli >= 1000
    assert g.gee_estimate > 0
    assert g.sample_rows < g.n_rows


def test_cascades_monotone(spark):
    th = sorted(rows(spark, "threshold_cascade_trajectory"), key=lambda r: r.round)
    assert th[0].n_active == 5
    for a, b in zip(th, th[1:]):
        assert a.n_active <= b.n_active
    ic = sorted(rows(spark, "ic_cascade_reach"), key=lambda r: r.round)
    assert ic[0].n_reached == 5
    for a, b in zip(ic, ic[1:]):
        assert a.n_reached <= b.n_reached


def test_hashing_placement(spark):
    occ = rows(spark, "rendezvous_hashing_balance")
    assert len(occ) == 8
    assert abs(sum(r.share_ppm for r in occ) - 1_000_000) <= 8
    (m,) = rows(spark, "modulo_vs_hrw_rebalance")
    # HRW minimal disruption: exactly the removed shard's keys move
    assert m.hrw_moved == m.keys_on_removed_shard
    assert m.modulo_moved >= m.hrw_moved
