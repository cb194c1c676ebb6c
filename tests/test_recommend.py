"""ALS pipeline regression tests on a MovieLens-profile fixture.

Mirrors the reference's protocol end-to-end (FIXTURES.md §A): grid
search picks argmin validation rank, scoring drops cold-start pairs
like ``predictAll`` (recommender.py:155-156), fold-in recommends only
unrated items, rescale hits [1,5] exactly (recommender.py:205-206).
Exact reference RMSE (≈0.94) needs the real MovieLens CSVs, which are
reference data we don't copy — band asserts are vs the fixture's noise
floor instead.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from pyspark_movie_recommender_spark import recommend as REC


@pytest.fixture(scope="module")
def movielens_fixture(spark):
    """Seeded latent-factor ratings: ~250 users x ~50 items of 400, with
    one single-rater movie (cold-start coverage) and a light user."""
    rng = random.Random(42)
    n_users, n_items, dim = 250, 400, 3
    uf = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_users)]
    vf = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_items)]
    rows = []
    for u in range(1, n_users):  # user ids from 1 (0 reserved, recommender.py:107)
        rated = rng.sample(range(n_items), 50)
        for m in rated:
            dot = sum(a * b for a, b in zip(uf[u], vf[m]))
            r = max(0.5, min(5.0, round((3 + dot + rng.gauss(0, 0.3)) * 2) / 2))
            rows.append((u, m, r))
    # movie 399 rated by exactly one user → candidate for cold-start drops
    rows = [r for r in rows if r[1] != 399]
    rows.append((1, 399, 4.0))
    ratings = spark.createDataFrame(rows, "user_id int, item_id int, rating double")
    items = spark.createDataFrame(
        [(m, f"Movie {m} ({1990 + m % 30})") for m in range(n_items)],
        "item_id int, title string",
    )
    return ratings, items


def test_grid_search_protocol(spark, movielens_fixture):
    ratings, _ = movielens_fixture
    res = REC.train_with_grid_search(ratings, ranks=(2, 4))
    assert set(res.validation_rmse) == {2, 4}
    assert res.best_rank == min(res.validation_rmse, key=res.validation_rmse.get)
    # latent dim is 3 → both ranks should beat the trivial predictor
    assert res.test_rmse < 1.2
    assert all(math.isfinite(v) for v in res.validation_rmse.values())


def test_cold_start_rows_dropped(spark, movielens_fixture):
    ratings, _ = movielens_fixture
    train = ratings.filter(F.col("item_id") != 399)  # exclude the single-rater movie
    model = REC._als(rank=2).fit(train)
    pairs = spark.createDataFrame(
        [(1, 0), (1, 399)], "user_id int, item_id int"
    )
    scored = REC.score(model, pairs)
    # item 399 has no factors → silently dropped, like predictAll
    assert [r.item_id for r in scored.collect()] == [0]


def test_fold_in_and_recommend(spark, movielens_fixture):
    ratings, items = movielens_fixture
    new_user = spark.createDataFrame(
        [(0, m, float(r)) for m, r in [(100, 4), (237, 1), (44, 4), (25, 5), (3, 3)]],
        "user_id int, item_id int, rating double",
    )
    model = REC.fold_in_user(ratings, new_user, rank=2)
    recs = REC.recommend_for_user(model, items, new_user, user_id=0, k=10)
    got = recs.collect()
    assert len(got) == 10
    rated = {100, 237, 44, 25, 3}
    assert not rated & {r.item_id for r in got}  # only unrated items
    scaled = [r.scaled_rating for r in got]
    assert all(1.0 <= s <= 5.0 for s in scaled)
    assert "title" in recs.columns


def test_rescale_bounds_exact(spark, movielens_fixture):
    ratings, items = movielens_fixture
    model = REC._als(rank=2).fit(ratings)
    all_pairs = items.select(F.lit(7).alias("user_id"), "item_id")
    scored = REC.score(model, all_pairs)
    from pyspark_movie_recommender_spark.operators.relational import minmax_rescale

    out = minmax_rescale(scored, "prediction", out_col="scaled")
    lo, hi = out.agg(F.min("scaled"), F.max("scaled")).collect()[0]
    assert lo == 1.0 and hi == 5.0


# ---------------------------------------------------------------------------
# true-parity integration: the reference's own MovieLens data, read in
# place (never copied into this repo), full protocol end-to-end
# ---------------------------------------------------------------------------

REF_DATA = "/root/reference/data"


@pytest.mark.skipif(
    not __import__("os").path.exists(f"{REF_DATA}/ratings.csv"),
    reason="reference MovieLens data not present",
)
def test_reference_movielens_full_protocol_parity(spark):
    """SURVEY.md §6 metric band on the real 100k ratings: grid search
    must pick rank 4 with validation RMSE ≈0.94 (ml-ALS init differs
    from mllib-ALS, so band not bit-equality), and the new-user fold-in
    must recommend nearly all unrated movies (cold-start drops only)."""
    from pyspark_movie_recommender_spark.sources.movielens import (
        read_movies_csv,
        read_ratings_csv,
    )

    ratings = read_ratings_csv(spark, f"{REF_DATA}/ratings.csv").select(
        "user_id", F.col("movie_id").alias("item_id"), "rating"
    )
    res = REC.train_with_grid_search(ratings)
    assert res.best_rank == 4  # recommender.py:86
    for rank, rmse in res.validation_rmse.items():
        assert 0.90 < rmse < 1.00, (rank, rmse)  # recommender.py:81-83
    assert 0.90 < res.test_rmse < 1.00  # recommender.py:100

    # entry point 2: fold in user 0 with the reference's EXACT ten hand
    # ratings (recommender.py:109-121)
    movies = read_movies_csv(spark, f"{REF_DATA}/movies.csv").select(
        F.col("movie_id").alias("item_id"), "title"
    )
    new_user = spark.createDataFrame(
        [
            (0, 100, 4.0),
            (0, 237, 1.0),
            (0, 44, 4.0),
            (0, 25, 5.0),
            (0, 456, 3.0),
            (0, 849, 3.0),
            (0, 778, 2.0),
            (0, 909, 3.0),
            (0, 478, 5.0),
            (0, 248, 4.0),
        ],
        "user_id int, item_id int, rating double",
    )
    model = REC.fold_in_user(ratings, new_user, rank=res.best_rank)
    top = REC.recommend_for_user(
        model, movies, new_user, user_id=0, k=10, rescale=True
    ).collect()
    assert len(top) == 10
    # cold-start drop semantics: predictAll returns EXACTLY 9,057
    # recommendations on this data (recommender.py:155-156) — the count
    # is deterministic, not model-dependent: 9,125 movies − the 10
    # rated − 58 movies never rated by anyone (no item factors). Our
    # coldStartStrategy='drop' must land on the same number.
    cands = REC.anti_join(
        movies.select("item_id"), new_user.select("item_id"), "item_id"
    ).select(F.lit(0).alias("user_id"), "item_id")
    scored = REC.score(model, cands)
    assert scored.count() == 9057  # recommender.py:156
    # min-max rescale bounds are EXACT on the full scored set: the min
    # prediction maps to 1.0 and the max to 5.0 (recommender.py:206,243)
    from pyspark_movie_recommender_spark.operators.relational import (
        minmax_rescale,
    )

    bounds = (
        minmax_rescale(scored, "prediction", out_col="scaled_rating")
        .agg(
            F.min("scaled_rating").alias("lo"),
            F.max("scaled_rating").alias("hi"),
        )
        .collect()[0]
    )
    assert bounds.lo == 1.0 and bounds.hi == 5.0
    # and the displayed top-10 stays inside the bounds
    assert all(1.0 <= r.scaled_rating <= 5.0 for r in top)


def test_als_item_neighbors_shape_and_sanity(spark, sf_dir):
    from pyspark_movie_recommender_spark.recommend import item_neighbors_from_factors

    out = item_neighbors_from_factors(spark, sf_dir, k=3, n_probes=5).collect()
    # 5 probes x 3 neighbors, no self-matches, cosine in [-1, 1]
    assert len(out) == 15
    by_probe = {}
    for r in out:
        assert r.probe_id != r.neighbor_id
        assert -1.0001 <= r.sim <= 1.0001
        by_probe.setdefault(r.probe_id, []).append((r.rnk, r.sim))
    assert all(len(v) == 3 for v in by_probe.values())
    # rank order follows descending similarity per probe
    for v in by_probe.values():
        sims = [s for _, s in sorted(v)]
        assert sims == sorted(sims, reverse=True)


def test_text_classifier_recovers_dominant_group(spark, sf_dir):
    from pyspark_movie_recommender_spark.recommend import (
        text_topic_classifier_pipeline,
    )

    rows = text_topic_classifier_pipeline(spark, sf_dir).collect()
    n = sum(r.n_docs for r in rows)
    correct = sum(r.n_correct for r in rows)
    majority = max(r.n_docs for r in rows)
    assert n > 0
    # must clearly beat the majority-class baseline and be mostly right
    assert correct / n > 0.75, (correct, n)
    assert correct > majority, (correct, majority)


def test_implicit_als_recs_shape_and_ordering(spark, sf_dir):
    """Implicit ALS over view counts: exactly <=5 recs per user, ranks
    contiguous from 1, and scores non-increasing within a user (the
    top-k contract recommendForAllUsers promises)."""
    from pyspark_movie_recommender_spark import queries as Q

    rows = Q.QUERIES["als_implicit_covisits"](spark, sf_dir).collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.rnk, r.score))
    for user, recs in by_user.items():
        recs.sort()
        assert 1 <= len(recs) <= 5
        assert [k for k, _ in recs] == list(range(1, len(recs) + 1))
        scores = [s for _, s in recs]
        assert all(a >= b for a, b in zip(scores, scores[1:]))
