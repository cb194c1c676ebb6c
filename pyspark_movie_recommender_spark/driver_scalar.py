"""Driver-scalar collect with an enforced k-bound.

The engine's scale contract allows ``collect()`` ONLY for
driver-scalar relations: 1-row aggregates and small, k-bounded
codebooks (bucket histograms, centroid samples, per-segment carry
state) that feed the next distributed stage. Round-6 advice asked for
that contract to be mechanical, not conventional: every source-side
collect now routes through :func:`bounded_collect`, which asserts the
caller-declared bound at runtime, and
``tests/test_driver_scalar_contract.py`` greps the package so a future
raw ``.collect()`` in non-test source fails the suite. A corpus-sized
collect therefore cannot appear silently — it either trips the grep
gate (new site) or the k-bound assert (existing site whose relation
grew past its contract).

At 100 TB the bounds are what make these sites safe: they are all
O(n_buckets), O(k centroids), O(|segments|) or O(1) — never O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row


def bounded_collect(df: DataFrame, k_max: int, what: str) -> list[Row]:
    """``df.collect()`` with the site's declared driver-scalar bound.

    ``k_max`` is the contract: the largest row count this relation can
    legally produce (buckets+1, k centroids, |segments|, 1 for a global
    aggregate). ``what`` names the site in the failure message.
    """
    rows = df.collect()
    if len(rows) > k_max:
        raise AssertionError(
            "driver-scalar contract violated at %s: collect() returned "
            "%d rows > declared bound %d — this relation is no longer "
            "k-bounded and must not be collected" % (what, len(rows), k_max)
        )
    return rows


def scalar_row(df: DataFrame, what: str) -> Row:
    """Collect a relation contracted to produce EXACTLY one row (a
    global aggregate or ``limit(1)``) and return that row."""
    rows = bounded_collect(df, 1, what)
    if not rows:
        raise AssertionError(
            "driver-scalar contract violated at %s: expected exactly one "
            "row, got zero" % what
        )
    return rows[0]
