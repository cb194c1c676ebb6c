"""Wave 240-243 invariants: algebraic laws for this session's queries.
Oracle equality is covered by the driver-sim sweep; these pin bounds
and identities on the sf0.001 fixture.
"""

from __future__ import annotations

from pyspark_movie_recommender_spark import queries as Q

SF = "/root/testdata/sf0.001"


def rows(spark, name):
    return Q.QUERIES[name](spark, SF).collect()


def test_feature_hashing_conservation(spark):
    (r,) = rows(spark, "feature_hashing_collision_audit")
    # every vocab term lands in exactly one bucket
    assert r.vocab_size >= r.buckets_used >= 1
    assert r.collided_terms == r.vocab_size - r.buckets_used
    assert 0 <= r.collision_buckets <= r.buckets_used
    # minority mass excludes each bucket's dominant term
    assert 0 <= r.minority_mass_ppm <= 1_000_000


def test_balls_in_bins_partition_of_bins(spark):
    (r,) = rows(spark, "balls_in_bins_occupancy")
    occupied = r.bins - r.empty_bins
    assert occupied == r.singleton_bins + r.multi_bins
    assert r.max_load >= 1
    assert r.n_items >= occupied  # each occupied bin holds >= 1 item
    # Poisson expectations live on [0, bins] in milli-units
    assert 0 <= r.empty_bins_expected_milli <= 1000 * r.bins
    assert 0 <= r.singleton_bins_expected_milli <= 1000 * r.bins


def test_running_record_bounds(spark):
    (r,) = rows(spark, "running_record_rate")
    # the first order of every customer is always a record
    assert r.total_records >= r.customers
    assert r.total_records <= r.total_orders
    # H_n >= 1 for every customer, so the mean expectation is >= 1
    assert r.mean_expected_milli >= 1000
    assert 0 <= r.over_expected_customers <= r.customers


def test_secretary_rates_bounded(spark):
    (r,) = rows(spark, "secretary_stop_rule_replay")
    assert 0 <= r.successes <= r.eligible_customers
    assert 0 <= r.success_rate_milli <= 1000
    assert r.inv_e_bound_milli == 368
    # random pick over n >= 4 orders succeeds with chance <= 1/4
    assert 0 < r.random_pick_rate_milli <= 250


def test_hausdorff_dominates_chamfer(spark):
    rs = rows(spark, "hausdorff_region_profiles")
    # C(5, 2) unordered region pairs
    assert len(rs) == 10
    for r in rs:
        assert r.region_a < r.region_b
        # max-min >= mean-min in each direction, so the symmetric
        # Hausdorff dominates the averaged Chamfer distance
        assert r.hausdorff_sq_milli >= r.chamfer_sq_milli >= 0


def test_littlewood_level_feasible(spark):
    (r,) = rows(spark, "littlewood_protection_level")
    assert 0 <= r.protection_level <= r.max_daily
    assert 0 <= r.spill_days <= r.days
    # the chosen level satisfies the marginal-seat inequality:
    # spill share <= critical ratio (both in milli, tolerate rounding)
    spill_milli = round(1000 * r.spill_days / r.days)
    assert spill_milli <= r.critical_ratio_milli + 1


def test_chatterjee_xi_range(spark):
    (r,) = rows(spark, "chatterjee_xi_dependence")
    assert r.n >= 2
    # max total jump is bounded by (n^2 - 1) / 3 achieved cases aside,
    # xi always lies in [-0.5, 1]
    assert -500_000 <= r.xi_micro <= 1_000_000
    assert 0 <= r.jump <= r.n * r.n


def test_hoeffding_d_range(spark):
    (r,) = rows(spark, "hoeffding_d_dependence")
    assert r.n >= 5  # formula needs n >= 5
    assert r.d1 >= 0 and r.d2 >= 0
    # D in [-0.5, 1]
    assert -500_000 <= r.hoeffding_d_micro <= 1_000_000
