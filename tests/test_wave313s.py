"""Wave 313-321 invariants: algebraic laws for this session's queries.
Oracle equality is covered by the driver-sim sweep; these pin bounds
and identities on the sf0.001 fixture.
"""

from __future__ import annotations

from pyspark_movie_recommender_spark import queries as Q

SF = "/root/testdata/sf0.001"


def rows(spark, name):
    return Q.QUERIES[name](spark, SF).collect()


def test_sampling_theory(spark):
    fpc = sorted(rows(spark, "fpc_replicate_audit"), key=lambda r: r.fraction_milli)
    for r in fpc:
        assert r.fpc_se_cents <= r.srs_se_cents  # FPC only shrinks
    factors = [r.fpc_factor_milli for r in fpc]
    assert factors == sorted(factors, reverse=True)
    (sy,) = rows(spark, "systematic_sampling_deff")
    assert sy.n_systematic_samples == 10
    assert sy.deff_milli >= 0 and sy.srs_se_cents > 0


def test_nonlinear_dynamics(spark):
    (ly,) = rows(spark, "lyapunov_rosenstein_daily")
    assert ly.n_tracked_pairs > 0
    # slope sign must agree with the end-to-end divergence direction
    if ly.d4_milli > ly.d0_milli:
        assert ly.lyapunov_slope_micro > 0
    (rq,) = rows(spark, "rqa_daily")
    assert 0 <= rq.n_rec <= rq.n_pairs
    assert 0 <= rq.rr_ppm <= 1_000_000
    assert 0 <= rq.det_proxy_ppm <= 1_000_000


def test_dataset_shift(spark):
    (b,) = rows(spark, "bbse_label_shift")
    assert abs(b.bbse_err_ppm - abs(b.target_bbse_ppm - b.target_actual_ppm)) <= 1
    (e,) = rows(spark, "importance_weight_ess")
    assert e.effective_sample_size <= e.n_source
    assert e.ess_ratio_ppm <= 1_000_001
    assert e.max_weight_milli >= 1000  # mean weight is exactly 1


def test_label_budget(spark):
    (al,) = rows(spark, "active_learning_one_step")
    for v in (al.base_acc_ppm, al.active_acc_ppm, al.random_acc_ppm):
        assert 0 <= v <= 1_000_000
    lc = sorted(rows(spark, "label_efficiency_curve"), key=lambda r: r.hash_band)
    ns = [r.n_labeled for r in lc]
    assert ns == sorted(ns)  # nested bands grow


def test_specification_mining(spark):
    dw = rows(spark, "dwyer_patterns_support")
    assert len(dw) == 5
    assert all(0 <= r.support_ppm <= 1_000_000 for r in dw)
    (rp,) = rows(spark, "response_time_bound_profile")
    assert rp.within_1h <= rp.within_1d <= rp.n_resp
    assert 0 <= rp.answered_ppm <= 1_000_000


def test_microstructure_estimators(spark):
    (r,) = rows(spark, "roll_spread_estimator")
    assert r.roll_spread_cents >= 0
    (c,) = rows(spark, "corwin_schultz_spread")
    assert c.cs_spread_rel_ppm >= 0
    assert 0 <= c.negative_alpha_ppm <= 1_000_000


def test_opinion_dynamics(spark):
    dg = sorted(rows(spark, "degroot_consensus_rounds"), key=lambda r: r.round)
    spreads = [r.spread_ppm for r in dg]
    for a, b in zip(spreads, spreads[1:]):
        assert b <= a + 1  # averaging contracts the opinion interval
    fj = rows(spark, "fj_opinion_equilibrium")
    lo = min(r.initial_ppm for r in fj)
    hi = max(r.initial_ppm for r in fj)
    for r in fj:
        # FJ equilibrium is a convex combination of initial opinions
        assert lo - 2 <= r.fj_equilibrium_ppm <= hi + 2
        assert abs(r.shift_ppm - (r.fj_equilibrium_ppm - r.initial_ppm)) <= 1


def test_reliability_growth(spark):
    (cr,) = rows(spark, "crow_amsaa_growth")
    assert cr.beta_milli > 0
    assert cr.reliability_improving == (1 if cr.beta_milli < 1000 else 0)
    (lp,) = rows(spark, "laplace_trend_test")
    if lp.laplace_u_milli > 1960:
        assert lp.trend_verdict == 1
    elif lp.laplace_u_milli < -1960:
        assert lp.trend_verdict == -1
    else:
        assert lp.trend_verdict == 0


def test_queueing_laws(spark):
    (k,) = rows(spark, "kingman_vut_audit")
    assert k.exact_mean_wait_ms >= 0
    assert k.kingman_wait_ms >= 0
    ht = sorted(rows(spark, "heavy_traffic_scaling"), key=lambda r: r.rho_milli)
    waits = [r.exact_mean_wait_ms for r in ht]
    assert waits == sorted(waits)  # higher utilization, longer waits
