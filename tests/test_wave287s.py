"""Wave 287-300 invariants: algebraic laws for this session's queries.
Oracle equality is covered by the driver-sim sweep; these pin bounds
and identities on the sf0.001 fixture.
"""

from __future__ import annotations

from pyspark_movie_recommender_spark import queries as Q

SF = "/root/testdata/sf0.001"


def rows(spark, name):
    return Q.QUERIES[name](spark, SF).collect()


def test_bayes_factors_well_formed(spark):
    (b,) = rows(spark, "bayes_factor_urgent_rates")
    assert 0 < b.pooled_urgent < b.pooled_orders
    assert b.n_nations <= 25
    (d,) = rows(spark, "dirichlet_mix_homogeneity")
    assert d.k_segments == 5
    assert d.n_regions == 5


def test_successive_halving_structure(spark):
    sh = rows(spark, "successive_halving_ridge")
    assert len(sh) == 8
    assert sum(r.sh_winner for r in sh) == 1
    assert sum(r.survived_round1 for r in sh) == 4
    assert sum(r.survived_round2 for r in sh) == 2
    assert sorted(r.full_cv_rank for r in sh) == list(range(1, 9))
    assert all(r.cv_mse_vs_best_ppm >= 999_999 for r in sh)
    winner = next(r for r in sh if r.sh_winner)
    assert winner.survived_round1 == 1 and winner.survived_round2 == 1
    lc = sorted(rows(spark, "learning_curve_ols"), key=lambda r: r.train_pct)
    assert [r.train_pct for r in lc] == [10, 25, 50, 100]
    ns = [r.n_train for r in lc]
    assert ns == sorted(ns)
    assert lc[-1].val_mse_vs_full_ppm == 1_000_000


def test_hash_quality(spark):
    av = rows(spark, "hash_avalanche_audit")
    assert len(av) == 8
    for r in av:
        assert 350 <= r.mean_flip_milli <= 650  # near the ideal 500
        assert r.min_bits_flipped >= 1  # no input bit is ever inert
    (u,) = rows(spark, "hash_uniformity_audit")
    assert abs(u.serial_corr_micro) <= 1_000_000
    assert u.chi2_256_milli >= 0


def test_jenks_optimality(spark):
    (j,) = rows(spark, "jenks_natural_breaks")
    assert 1 <= j.cut1_rank < j.cut2_rank < j.cut3_rank < j.cut4_rank <= 24
    assert 0 <= j.gvf_milli <= 1000
    for r in rows(spark, "classification_scheme_gvf"):
        assert r.gvf_milli <= j.gvf_milli + 1  # Jenks is the exact optimum
        if r.scheme == "quantile":
            assert r.largest_class == 5 and r.smallest_class == 5


def test_anytime_valid_inference(spark):
    (e,) = rows(spark, "evalue_supermartingale_monitor")
    assert e.max_log10_e_milli >= e.final_log10_e_milli
    assert e.rejected_anytime == (1 if e.first_crossing_t > 0 else 0)
    cs = sorted(rows(spark, "confidence_sequence_widths"), key=lambda r: r.checkpoint_t)
    for r in cs:
        assert r.width_ratio_milli > 1000  # uniform validity costs width
    widths = [r.anytime_valid_width_micro for r in cs]
    assert widths == sorted(widths, reverse=True)


def test_mmd_and_wbs(spark):
    mmd = rows(spark, "mmd_rbf_segments")
    assert len(mmd) == 3
    for r in mmd:
        assert r.mmd2_nano >= 0  # V-statistic is nonnegative
    wbs = rows(spark, "wbs_dyadic_cusum_scan")
    assert 1 <= len(wbs) <= 5
    assert all(r.cusum_milli > 0 for r in wbs)


def test_optimal_stopping(spark):
    pd = rows(spark, "pandora_reservation_prices")
    assert len(pd) == 5
    assert sorted(r.search_order for r in pd) == list(range(1, 6))
    by_order = sorted(pd, key=lambda r: r.search_order)
    zs = [r.reservation_cents for r in by_order]
    assert zs == sorted(zs, reverse=True)  # open boxes in decreasing z
    (p,) = rows(spark, "prophet_inequality_audit")
    assert 0 < p.competitive_ratio_milli <= 1000
    assert 0 < p.optimal_pick_ppm <= 1_000_000


def test_cache_theory(spark):
    mt = sorted(rows(spark, "mattson_reuse_profile"), key=lambda r: r.capacity)
    assert [r.capacity for r in mt] == [1, 2, 4, 8]
    hits = [r.hit_ratio_ppm for r in mt]
    assert hits == sorted(hits)  # LRU inclusion property
    assert all(r.hits <= r.n_accesses for r in mt)
    che = sorted(rows(spark, "che_lru_approximation"), key=lambda r: r.capacity)
    ts = [r.che_characteristic_t for r in che]
    assert ts == sorted(ts)  # bigger cache => larger characteristic time
    assert all(0 <= r.che_hit_ppm <= 1_000_000 for r in che)


def test_retrieval_family(spark):
    pl2 = rows(spark, "dfr_pl2_search")
    scores = [r.pl2_score for r in pl2]
    assert scores == sorted(scores, reverse=True)
    (e,) = rows(spark, "err_graded_eval")
    assert 0 <= e.err_at20_micro <= 1_000_000  # ERR is a probability-like mass
    assert e.n_ranked <= 20


def test_evt_diagnostics(spark):
    (lm,) = rows(spark, "l_moments_block_maxima")
    assert lm.l2_cents > 0
    assert abs(lm.t3_milli) <= 1000 and abs(lm.t4_milli) <= 1000
    assert lm.gumbel_t3_milli == 170 and lm.gumbel_t4_milli == 150
    me = sorted(rows(spark, "mean_excess_profile"), key=lambda r: r.quantile_milli)
    ths = [r.threshold_cents for r in me]
    assert ths == sorted(ths)
    ns = [r.n_exceed for r in me]
    assert ns == sorted(ns, reverse=True)


def test_sampling_plans(spark):
    for r in rows(spark, "acceptance_sampling_oc"):
        assert 0 <= r.p_accept_ppm <= 1_000_000
        assert 50 <= r.ati_items <= 1000
        assert r.aoq_ppm <= r.defect_rate_ppm + 1
    for r in rows(spark, "variables_sampling_plan"):
        assert r.accepted_at_k2 in (0, 1)
        assert (r.k_margin_milli >= 2000) == (r.accepted_at_k2 == 1)


def test_load_analytics(spark):
    pc = rows(spark, "peak_coincidence_factor")
    assert len(pc) == 5
    sys_cf = {r.system_coincidence_milli for r in pc}
    assert len(sys_cf) == 1 and max(sys_cf) <= 1000
    for r in pc:
        assert 0 <= r.region_coincidence_milli <= 1000
        assert r.load_at_system_peak_cents <= r.region_peak_cents
    (rr,) = rows(spark, "ramp_rate_extremes")
    assert rr.max_up_ramp_cents > 0 > rr.max_down_ramp_cents
    assert rr.ramp_sd_cents > 0


def test_geostatistics(spark):
    vg = rows(spark, "empirical_variogram_2d")
    assert {r.h_milli for r in vg} <= {20, 50, 100}
    for r in vg:
        assert r.n_pairs > 0 and r.sill_ratio_milli > 0
    (jc,) = rows(spark, "join_count_spatial")
    assert jc.bb_joins + jc.ww_joins + jc.bw_joins == jc.n_neighbor_pairs


def test_hedge_regret_theorem(spark):
    hw = rows(spark, "hedge_expert_weights")
    assert len(hw) == 5
    assert abs(sum(r.final_weight_ppm for r in hw) - 1_000_000) <= 5
    assert sorted(r.loss_rank for r in hw) == list(range(1, 6))
    (hr,) = rows(spark, "hedge_regret_audit")
    # the minimax guarantee must hold on any sequence
    assert hr.regret_milli <= hr.regret_bound_milli
    assert hr.hedge_loss_milli >= 0 and hr.best_expert_loss_milli >= 0
