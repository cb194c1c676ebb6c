"""Bench-drift tripwire: diff per-query medians across rounds.

Round-5 verdict ask #4: medians now exist under honest names
(BENCH_MEDIANS_r{N}.json, n=3 fresh-process runs); this tool diffs
round N against round N-1 and flags any query whose median moved more
than 1.5x IN EITHER DIRECTION, classifying each mover by whether its
physical plan changed:

- ``plan_changed``  — the mover has a cause in this round's diff; the
  round notes should attribute it (intended rewrite or regression).
- ``plan_same``     — UNEXPLAINED: same plan, >1.5x wall-clock move.
  Either rig noise beyond the documented +-30% band (rerun medians)
  or an environmental shift worth recording.
- ``no_prior_hash`` — first round with recorded hashes; baseline only.

Plan identity is a sha256 over the NORMALIZED formatted physical plan
(expression ids ``#123``, ``plan_id=``, RDD/subquery ids and scan
paths stripped — they vary per session, not per code change). Each
query is built twice and must normalize identically, else its hash is
recorded as null (unstable) and never used to claim "plan unchanged" —
the classifier fails toward ``plan_changed``, not away from it.

Writes PLANHASHES_r{N}.json (all bench queries, for the NEXT round's
compare) and BENCHCOMPARE_r{N}.json (the movers). Exits 1 when an
unexplained (plan_same) mover exists so the round runner trips.

Usage: python tools_bench_compare.py <round> [prev_round]
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_movie_recommender_spark import get_spark
from pyspark_movie_recommender_spark import queries as Q
from pyspark_movie_recommender_spark.plans import physical_plan

THRESHOLD = 1.5

_NOISE = [
    (re.compile(r"#\d+"), "#x"),
    (re.compile(r"plan_id=\d+"), "plan_id=x"),
    (re.compile(r"\[id=#?x?\d*\]"), "[id=x]"),
    (re.compile(r"Scan ExistingRDD\[[^\]]*\]"), "Scan ExistingRDD[x]"),
    (re.compile(r"ExistingRDD \[[^\]]*\]"), "ExistingRDD [x]"),
    # ckpt-materialized leaves print their session-scoped RDD id
    # ("MapPartitionsRDD[14] at localCheckpoint at ...") — round 8's
    # fan-out materialization made every ckpt'd query hash-unstable
    # (None), losing drift classification exactly where it matters
    (re.compile(r"\b\w+RDD\[\d+\]"), "RDD[x]"),
    # the ckpt leaf's callsite flips from NativeMethodAccessorImpl.java
    # to <unknown> once the JVM JITs a generated reflection accessor —
    # same plan, hot-path-dependent string
    (re.compile(r"at localCheckpoint at [^,\s]+"), "at localCheckpoint at x"),
    # higher-order-function lambda variables are numbered by a
    # SESSION-GLOBAL counter ("lambda x_1", "lambda y_2", ...), so any
    # HOF-bearing plan hashes differently depending on how many HOF
    # expressions the session resolved before it — strip the counter
    (re.compile(r"\blambda ([a-z]+)_\d+"), r"lambda \1"),
    (re.compile(r"file:[^\s,\]]*"), "file:x"),
    (re.compile(r"Statistics\([^)]*\)"), "Statistics(x)"),
    (re.compile(r"subquery#?x?\d*", re.IGNORECASE), "subquery#x"),
    (re.compile(r"cteid=\d+"), "cteid=x"),
]


def normalized_plan_hash(df) -> str:
    s = physical_plan(df)
    for pat, rep in _NOISE:
        s = pat.sub(rep, s)
    return hashlib.sha256(s.encode()).hexdigest()[:16]


def stable_hash(spark, sf_dir: str, name: str) -> str | None:
    """Hash the plan, built twice: a query whose two constructions
    normalize differently (session-dependent ids the normalizer does
    not cover, e.g. checkpointed RDD lineage) gets null — unusable for
    an 'unchanged plan' claim."""
    try:
        h1 = normalized_plan_hash(Q.QUERIES[name](spark, sf_dir))
        h2 = normalized_plan_hash(Q.QUERIES[name](spark, sf_dir))
    except Exception:  # noqa: BLE001 - record, don't crash the compare
        return None
    return h1 if h1 == h2 else None


def full_hashes(sf_dir: str, names: list[str]) -> dict[str, str | None]:
    """Pre-checkpoint plan hashes (round-8 advice: a `ckpt` truncates
    the plan to a LogicalRDD leaf, so the truncated hash is blind to
    any change INSIDE the materialized subtree — shapley's round-8
    groupBy rewrite hashed 'unchanged'). A subprocess with
    SPARK_GRAFT_CKPT_DISABLE=1 builds every bench query with ckpt as a
    no-op and hashes the full untruncated plan; with no eager
    materialization this pass runs almost no jobs. A separate process,
    not an in-session env flip: ckpt reads the env at call time, but
    the session may already hold materialized state built WITH ckpt
    (track/persist registries), and the flag is documented test-only —
    keep its blast radius to a throwaway interpreter."""
    import subprocess as sp

    code = (
        "import json,os,sys\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})\n"
        "os.environ['SPARK_GRAFT_CKPT_DISABLE']='1'\n"
        "from pyspark_movie_recommender_spark import get_spark\n"
        "from pyspark_movie_recommender_spark import queries as Q\n"
        "from tools_bench_compare import stable_hash\n"
        "spark = get_spark('planhash-full')\n"
        f"names = {names!r}\n"
        f"out = {{n: stable_hash(spark, {sf_dir!r}, n) for n in names}}\n"
        "print('FULLHASHES ' + json.dumps(out))\n"
    )
    r = sp.run([sys.executable, "-c", code], capture_output=True, text=True)
    for ln in r.stdout.splitlines():
        if ln.startswith("FULLHASHES "):
            return json.loads(ln[len("FULLHASHES "):])
    # fail toward plan_changed: missing full hashes must never be used
    # to claim "unchanged"
    return {n: None for n in names}


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "06"
    prev = sys.argv[2] if len(sys.argv) > 2 else f"{int(rnd) - 1:02d}"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    cur = json.load(open(f"BENCH_MEDIANS_r{rnd}.json"))["queries"]
    prv = json.load(open(f"BENCH_MEDIANS_r{prev}.json"))["queries"]

    spark = get_spark("bench-compare")
    bench_names = sorted(set(cur) | set(prv))
    present = [n for n in bench_names if n in Q.QUERIES]
    hashes = {n: stable_hash(spark, sf_dir, n) for n in present}
    fhashes = full_hashes(sf_dir, present)
    with open(f"PLANHASHES_r{rnd}.json", "w") as f:
        json.dump(
            {"truncated": hashes, "full": fhashes}, f, indent=2, sort_keys=True
        )

    prior_hashes: dict[str, str | None] = {}
    prior_full: dict[str, str | None] = {}
    if os.path.exists(f"PLANHASHES_r{prev}.json"):
        prior = json.load(open(f"PLANHASHES_r{prev}.json"))
        if "truncated" in prior:  # current two-tier format
            prior_hashes = prior["truncated"]
            prior_full = prior.get("full", {})
        else:  # rounds <= 8 wrote the flat (truncated-only) format
            prior_hashes = prior

    movers = {}
    for name in sorted(set(cur) & set(prv)):
        a, b = prv[name]["median"], cur[name]["median"]
        if a <= 0 or b <= 0:
            continue
        ratio = b / a
        if max(ratio, 1 / ratio) <= THRESHOLD:
            continue
        h_now, h_then = hashes.get(name), prior_hashes.get(name)
        f_now, f_then = fhashes.get(name), prior_full.get(name)
        if not prior_hashes or name not in prior_hashes:
            cls = "no_prior_hash"
        elif h_now is not None and h_now == h_then and (
            # "plan_same" additionally requires the PRE-ckpt (full)
            # hash to match when a prior full hash exists — a change
            # inside a ckpt-truncated subtree must classify as
            # plan_changed (round-8 advice). With no prior full hash
            # (rounds <= 8) the truncated match stands alone.
            name not in prior_full
            or (f_now is not None and f_now == f_then)
        ):
            cls = "plan_same"
        else:
            cls = "plan_changed"
        movers[name] = {
            "prev_median": a,
            "cur_median": b,
            "ratio": round(ratio, 3),
            "class": cls,
        }

    out = {
        "round": rnd,
        "prev_round": prev,
        "threshold": THRESHOLD,
        "movers": movers,
        "unexplained": sorted(
            n for n, m in movers.items() if m["class"] == "plan_same"
        ),
    }
    with open(f"BENCHCOMPARE_r{rnd}.json", "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(json.dumps(out))
    if out["unexplained"]:
        print("UNEXPLAINED MOVERS (same plan, >1.5x):", out["unexplained"])
        sys.exit(1)


if __name__ == "__main__":
    main()
