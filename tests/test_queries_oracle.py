"""Differential test: every registered oracle query, Spark vs DuckDB.

This mirrors the driver's t2 correctness gate (sf0.01) so mismatches are
caught locally first. Queries without oracle SQL get a rows-materialize
smoke check instead (the driver's weaker rows-only path).
"""

from __future__ import annotations

import pytest

from pyspark_movie_recommender_spark import queries as Q
from tests.oracle import compare, duck_connection


@pytest.fixture(scope="module")
def con(sf_oracle_dir):
    c = duck_connection(sf_oracle_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(Q.QUERIES))
def test_query(name, spark, sf_oracle_dir, con):
    df = Q.QUERIES[name](spark, sf_oracle_dir)
    if name in Q.ORACLE_SQL:
        compare(df, con, Q.ORACLE_SQL[name], name)
    else:
        # rows-only: must run, have a stable schema, and produce evidence
        assert df.columns
        rows = df.limit(1).collect()
        assert rows, f"{name}: empty rows-only result at oracle SF"
        for v in rows[0]:
            assert not isinstance(v, (list, dict)), (
                f"{name}: unhashable {type(v).__name__} cell reaches the gate"
            )
