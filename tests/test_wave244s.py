"""Wave 244-251 invariants: algebraic laws for this session's queries.
Oracle equality is covered by the driver-sim sweep; these pin bounds
and identities on the sf0.001 fixture.
"""

from __future__ import annotations

from pyspark_movie_recommender_spark import queries as Q

SF = "/root/testdata/sf0.001"


def rows(spark, name):
    return Q.QUERIES[name](spark, SF).collect()


def test_minimax_mst_is_spanning_tree(spark):
    rs = rows(spark, "minimax_mst_trade_backbone")
    nodes = {r.nation_u for r in rs} | {r.nation_v for r in rs}
    # n-1 edges over the touched node set
    assert len(rs) == len(nodes) - 1
    assert all(r.cost_micro_nats > 0 for r in rs)
    # union-find: connected + right edge count => tree
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rs:
        ra, rb = find(r.nation_u), find(r.nation_v)
        assert ra != rb, "cycle in claimed MST"
        parent[ra] = rb
    assert len({find(n) for n in nodes}) == 1


def test_reciprocity_asymmetry_complementary(spark):
    rs = rows(spark, "trade_reciprocity_asymmetry")
    for r in rs:
        assert r.nation_u < r.nation_v
        assert r.flow_fwd >= 0 and r.flow_rev >= 0
        assert r.flow_fwd + r.flow_rev > 0
        assert 0 <= r.recip_micro <= 1_000_000
        # recip + asym = 1 exactly (up to the two independent roundings)
        assert abs(r.recip_micro + r.asym_micro - 1_000_000) <= 1


def test_kmv_estimate_consistency(spark):
    (r,) = rows(spark, "kmv_distinct_sketch")
    assert r.exact_distinct > 0 and r.kmv_estimate > 0
    expect_ppm = round(
        abs(r.kmv_estimate - r.exact_distinct) * 1_000_000 / r.exact_distinct
    )
    assert abs(r.rel_err_ppm - expect_ppm) <= 1
    # k=256 minima: sampling error far inside 25%
    assert r.rel_err_ppm <= 250_000


def test_cms_one_sided_error(spark):
    rs = rows(spark, "cms_heavy_hitter_audit")
    assert len(rs) == 20
    for r in rs:
        assert r.overcount >= 0
        assert r.cms_est == r.exact_cnt + r.overcount


def test_isotonic_fit_monotone_and_mean_preserving(spark):
    rs = sorted(rows(spark, "isotonic_urgent_rate_fit"), key=lambda r: r.bucket)
    assert len(rs) == 40
    for a, b in zip(rs, rs[1:]):
        assert a.iso_fit_micro <= b.iso_fit_micro  # monotone projection
    n = sum(r.n_orders for r in rs)
    raw = sum(r.n_orders * r.raw_rate_micro for r in rs)
    fit = sum(r.n_orders * r.iso_fit_micro for r in rs)
    assert abs(raw - fit) <= n  # PAVA preserves the weighted mean


def test_nw_curve_bounded_by_data(spark):
    rs = rows(spark, "nw_kernel_price_curve")
    assert len(rs) == 50
    vals = [r.nw_price_cents for r in rs]
    assert all(v > 0 for v in vals)
    # kernel smoother output lies inside the convex hull of bucket means
    assert max(vals) / min(vals) < 100


def test_entropies_normalized(spark):
    (s,) = rows(spark, "spectral_entropy_daily")
    assert 0 <= s.spec_entropy_micro <= 1_000_000
    assert 1 <= s.k_top <= 32
    assert 0 < s.top_share_ppm <= 1_000_000
    (p,) = rows(spark, "permutation_entropy_daily")
    assert 0 <= p.perm_entropy_micro <= 1_000_000
    assert 0 <= p.top_pattern <= 5
    # the modal pattern holds at least a uniform share
    assert p.top_share_ppm >= 1_000_000 // 6


def test_cmh_and_woolf_consistent(spark):
    (c,) = rows(spark, "cmh_pooled_odds_ratio")
    assert c.mh_or_micro > 0
    assert c.cmh_chi2_micro >= 0
    (w,) = rows(spark, "woolf_or_homogeneity")
    assert w.n_strata == c.n_strata
    assert w.df == w.n_strata - 1
    assert w.woolf_chi2_micro >= 0


def test_borda_conservation_and_rank_permutation(spark):
    rs = rows(spark, "borda_nation_ranking")
    assert len(rs) == 25
    # six ballots each hand out sum_{r=1..25}(25-r) = 300 points
    assert sum(r.borda_score for r in rs) == 6 * 300
    assert sorted(r.borda_rank for r in rs) == list(range(1, 26))


def test_copeland_zero_sum(spark):
    rs = rows(spark, "copeland_condorcet_nations")
    assert len(rs) == 25
    assert sum(r.copeland for r in rs) == 0
    assert sum(r.beats for r in rs) == sum(r.beaten for r in rs)
    for r in rs:
        assert 0 <= r.beats + r.beaten <= 24
    assert sum(r.is_condorcet_winner for r in rs) <= 1


def test_allen_census_partition(spark):
    rs = rows(spark, "allen_interval_census")
    allowed = {
        "equals", "precedes", "meets", "preceded_by", "met_by", "overlaps",
        "overlapped_by", "starts", "started_by", "finishes", "finished_by",
        "during", "contains",
    }
    assert {r.relation for r in rs} <= allowed  # 'other' never fires
    assert all(r.cnt > 0 for r in rs)
    assert abs(sum(r.share_ppm for r in rs) - 1_000_000) <= len(rs)


def test_debruijn_degree_conservation(spark):
    rs = rows(spark, "debruijn_eulerian_audit")
    assert rs
    for r in rs:
        assert r.n_edge_instances >= r.n_distinct_edges >= 1
        assert (
            r.n_balanced + r.n_plus + r.n_minus + r.n_other == r.n_nodes
        )
        if r.n_other == 0:
            # sum(out-in) = 0 forces the +1/-1 nodes to pair up
            assert r.n_plus == r.n_minus


def test_schedule_rule_dominance(spark):
    rs = rows(spark, "edd_wspt_schedule_audit")
    assert rs
    for r in rs:
        assert r.n_jobs > 0
        # EDD optimal for Lmax; WSPT (Smith's rule) optimal for sum wC
        assert r.edd_lmax <= r.wspt_lmax
        assert r.wspt_twc_centdays <= r.edd_twc_centdays


def test_myerson_reserve_bounds(spark):
    rs = rows(spark, "myerson_reserve_price")
    assert len(rs) == 5
    for r in rs:
        assert r.reserve_cents > 0
        assert r.revenue_cents >= r.reserve_cents  # at least one buyer served
        assert r.revenue_cents <= r.reserve_cents * r.n_bids
        assert 0 < r.served_ppm <= 1_000_000
