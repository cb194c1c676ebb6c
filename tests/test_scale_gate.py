"""The sf1 scale budget is a GATE (round-6 verdict ask #6): the round
battery must go red when 10x data costs more than 3x total, or when a
query scales past 10x with no written attribution in BENCH_NOTES.
These tests drive the real gate function with injected regressions —
the 'demonstrably fires' proof without re-running the 7-minute bench.
"""

from __future__ import annotations

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "tools_bench_sf1",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools_bench_sf1.py",
    ),
)
bench_sf1 = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench_sf1)


def _artifact(total=2.2, ratios=None):
    return {
        "total_ratio_for_10x_data": total,
        "queries": {
            q: {"ratio": r} for q, r in (ratios or {"q1": 1.8}).items()
        },
    }


def test_gate_green_within_budget():
    assert bench_sf1.check_scale_budget(_artifact(), "") == []


def test_gate_fires_on_total_budget():
    problems = bench_sf1.check_scale_budget(_artifact(total=3.5), "")
    assert problems and "3.5" in problems[0] and "budget" in problems[0]


def test_gate_fires_on_unattributed_query_and_clears_with_attribution():
    art = _artifact(ratios={"levenshtein_neardup": 12.4, "q2": 1.1})
    problems = bench_sf1.check_scale_budget(art, "")
    assert problems == [
        "levenshtein_neardup scales 12.4x > 10.0x with no attribution"
        " in BENCH_NOTES"
    ]
    notes = "- `levenshtein_neardup` 12.4x — true pairs grow by design"
    assert bench_sf1.check_scale_budget(art, notes) == []
    # a PREFIX mention must not count as attribution for a longer name
    art2 = _artifact(ratios={"levenshtein_neardup_v2": 11.0})
    assert bench_sf1.check_scale_budget(art2, notes) != []


def test_gate_ignores_queries_without_baseline():
    # new query with no sf0.1 baseline: ratio is None, not a violation
    assert (
        bench_sf1.check_scale_budget(_artifact(ratios={"qx": None}), "") == []
    )
