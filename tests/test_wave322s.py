"""Wave 322-330 invariants: algebraic laws for this session's queries.
Oracle equality is covered by the driver-sim sweep; these pin bounds
and identities on the sf0.001 fixture.
"""

from __future__ import annotations

from pyspark_movie_recommender_spark import queries as Q

SF = "/root/testdata/sf0.001"


def rows(spark, name):
    return Q.QUERIES[name](spark, SF).collect()


def test_combinatorial_coverage(spark):
    tw = rows(spark, "tway_coverage_audit")
    assert len(tw) == 8
    for r in tw:
        assert 0 < r.observed_combos <= r.possible_combos
        assert r.coverage_ppm <= 1_000_000
    (rc,) = rows(spark, "rare_combo_census")
    assert rc.observed_combos + rc.missing_combos == rc.possible_combos
    assert rc.singletons <= rc.at_most_2 <= rc.observed_combos


def test_causal_structure(spark):
    pc = rows(spark, "pc_skeleton_edges")
    assert len(pc) == 6
    for r in pc:
        assert r.n_tests == 3
        assert r.edge_kept == (1 if r.n_rejecting == r.n_tests else 0)
    (cl,) = rows(spark, "chow_liu_tree")
    edges = [cl.edge1, cl.edge2, cl.edge3]
    assert len(set(edges)) == 3
    touched = set()
    for e in edges:
        touched.update(e.split("~"))
    assert touched == {"d1", "d2", "d3", "d4"}  # spanning


def test_cv_primitives(spark):
    boxes = rows(spark, "integral_image_density")
    counts = [r.box_count for r in boxes]
    assert counts == sorted(counts, reverse=True)
    assert all(r.box_count >= 0 for r in boxes)
    blobs = rows(spark, "dog_blob_detection")
    resp = [r.dog_response_x64 for r in blobs]
    assert resp == sorted(resp, reverse=True)
    for r in blobs:
        assert 0 <= r.center_x <= 31 and 0 <= r.center_y <= 31


def test_pitch_detection(spark):
    (c,) = rows(spark, "cepstral_peak_daily")
    assert 2 <= c.quefrency_1 <= 24 and 2 <= c.quefrency_2 <= 24
    assert c.quefrency_1 != c.quefrency_2
    hp = sorted(rows(spark, "harmonic_product_daily"), key=lambda r: r.hps_rank)
    assert [r.hps_rank for r in hp] == [1, 2, 3]
    assert all(1 <= r.fundamental_k <= 16 for r in hp)


def test_temporal_reachability(spark):
    ea = {r.nation_key: r for r in rows(spark, "earliest_arrival_trade")}
    assert ea[0].earliest_arrival_day == 0 and ea[0].reached == 1
    for r in ea.values():
        if r.reached:
            assert r.earliest_arrival_day >= 0
    fh = sorted(
        rows(spark, "foremost_reachability_horizons"),
        key=lambda r: r.horizon_days,
    )
    reach = [r.n_reached for r in fh]
    assert reach == sorted(reach)  # longer horizon reaches more
    for r in fh:
        assert r.mean_arrival_day <= r.horizon_days


def test_anomaly_detection(spark):
    sr = sorted(rows(spark, "spectral_residual_saliency"), key=lambda r: r.saliency_rank)
    assert [r.saliency_rank for r in sr] == list(range(1, len(sr) + 1))
    sal = [r.saliency_milli for r in sr]
    assert sal == sorted(sal, reverse=True)
    (ag,) = rows(spark, "anomaly_detector_agreement")
    assert 0 <= ag.agree_days <= 20
    assert (
        abs(
            ag.jaccard_ppm
            - round(ag.agree_days * 1_000_000 / (40 - ag.agree_days))
        )
        <= 1
    )


def test_shape_analysis(spark):
    (p,) = rows(spark, "procrustes_period_drift")
    assert p.scale_milli > 0
    assert 0 <= p.residual_shape_ppm <= 1_000_000
    (rv,) = rows(spark, "rv_coefficient_periods")
    assert -1_000_000 <= rv.rv_micro <= 1_000_000


def test_leaderboard_uncertainty(spark):
    st = rows(spark, "rank_stability_audit")
    for r in st:
        assert r.best_rank <= r.worst_rank
        assert r.best_rank * 1000 <= r.mean_rank_milli <= r.worst_rank * 1000
    # each replicate awards exactly three top-3 slots
    assert abs(sum(r.p_top3_ppm for r in st) - 3_000_000) <= len(st)
    fl = rows(spark, "leaderboard_flip_rates")
    assert {r.rank_position for r in fl} <= set(range(1, 10))
    assert all(0 <= r.flip_ppm <= 1_000_000 for r in fl)


def test_method_agreement(spark):
    (ba,) = rows(spark, "bland_altman_order_totals")
    assert ba.loa_lower_cents <= ba.bias_cents <= ba.loa_upper_cents
    assert 0 <= ba.outside_loa_ppm <= 200_000
    (cc,) = rows(spark, "lins_ccc_order_totals")
    # CCC = Pearson * C_b with C_b <= 1
    assert abs(cc.lins_ccc_micro) <= abs(cc.pearson_micro) + 1
    assert cc.accuracy_cb_micro <= 1_000_001
