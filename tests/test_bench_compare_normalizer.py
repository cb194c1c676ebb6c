"""Regression tests for the bench-drift plan-hash normalizer.

The drift tripwire (tools_bench_compare.py) can only claim "plan
unchanged" for a query whose formatted physical plan normalizes to the
same text across constructions and sessions. Round 8 found three
session-dependent strings that silently nulled hashes (losing mover
classification exactly where it matters):

- ckpt-materialized leaves print a session-scoped RDD id
  (``MapPartitionsRDD[14] at localCheckpoint at ...``);
- higher-order-function lambda variables are numbered by a
  SESSION-GLOBAL counter (``lambda x_1`` vs ``lambda x_7`` for the
  same expression, depending on how many HOFs the session resolved
  before building this plan);
- the ckpt callsite flips ``NativeMethodAccessorImpl.java:0`` →
  ``<unknown>:0`` once the JVM JITs a generated reflection accessor
  for the hot reflective path (order- and load-dependent).

These are pure-text tests against the _NOISE pattern list — no Spark
session — so the normalizer can never regress without a red test.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools_bench_compare import _NOISE


def _norm(s: str) -> str:
    for pat, rep in _NOISE:
        s = pat.sub(rep, s)
    return s


def test_ckpt_rdd_id_and_callsite_normalize_away():
    a = (
        "Arguments: [day#42L], MapPartitionsRDD[14] at localCheckpoint "
        "at NativeMethodAccessorImpl.java:0, ExistingRDD, "
        "UnknownPartitioning(0)"
    )
    b = (
        "Arguments: [day#7L], MapPartitionsRDD[30] at localCheckpoint "
        "at <unknown>:0, ExistingRDD, UnknownPartitioning(0)"
    )
    assert _norm(a) == _norm(b)


def test_hof_lambda_counter_normalizes_away():
    a = (
        "aggregate(split(text#3, \\s+, -1), 0, lambdafunction("
        "(lambda x_1#10L + cast(length(lambda y_2#11) as bigint)), "
        "lambda x_1#10L, lambda y_2#11, false))"
    )
    b = (
        "aggregate(split(text#9, \\s+, -1), 0, lambdafunction("
        "(lambda x_7#20L + cast(length(lambda y_8#21) as bigint)), "
        "lambda x_7#20L, lambda y_8#21, false))"
    )
    assert _norm(a) == _norm(b)


def test_distinct_lambda_variables_stay_distinct():
    # the normalizer strips the COUNTER, not the variable letter:
    # (x, y) pairs in a zip_with must not collapse into one symbol
    s = _norm("zip_with(a#1, b#2, lambdafunction((lambda x_3#4L = lambda y_4#5L)))")
    assert "lambda x#" in s and "lambda y#" in s


def test_real_plan_differences_survive_normalization():
    # a genuinely different plan (extra exchange) must NOT normalize
    # equal — the tripwire's whole point
    a = "Exchange hashpartitioning(k#1, 32)\n+- HashAggregate(keys=[k#1])"
    b = "HashAggregate(keys=[k#1])"
    assert _norm(a) != _norm(b)
