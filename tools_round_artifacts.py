"""Round-close artifact battery: the per-round evidence as a checklist.

Rounds 4-5 regenerated SWEEP / PLANAUDIT / STREAMING / BENCH_MEDIANS /
BENCH_SF1 by hand; round-5 verdict ask #6 wants that mechanical. This
runs the full set IN ORDER on a quiet box (benches come after the
correctness gates so they see idle CPU), stops red on any gated step,
and prints one summary line per artifact.

Steps (each tool also writes its own artifact file):
  1. tools_sweep.py <round>            -> SWEEP_r{N}.json        (gates)
  2. tools_plan_audit.py <round>       -> PLANAUDIT_r{N}.json    (gates)
  2b. tools_subtree_audit.py <round> --gate -> SUBTREE_r{N}.json  (gates:
      new high-confidence duplicate-subtree flags / fact-sized dups red)
  3. tools_streaming_audit.py <round>  -> STREAMING_r{N}.json    (gates)
  3b. tools_laws.py <round>            -> LAWS_r{N}.json          (gates)
  4. tools_bench_medians.py <round> 5  -> BENCH_MEDIANS_r{N}.json (+IQR)
  5. tools_bench_compare.py <round>    -> BENCHCOMPARE/PLANHASHES (gates)
  6. tools_make_sf1.py /tmp/sf1        (skipped when already present)
     tools_bench_sf1.py <round> 3      -> BENCH_SF1_r{N}.json    (gates:
     total >3x for 10x data, or any query >10x unattributed, exit red)
  7. tools_dump_plans.py               -> PLANS.md

~90-120 min end to end at sf0.1/sf1. Usage:
    python tools_round_artifacts.py <round> [--skip-sf1] [--skip-bench]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def run(label: str, args: list[str]) -> int:
    t0 = time.time()
    print(f"=== {label}: {' '.join(args)}", flush=True)
    proc = subprocess.run([sys.executable, *args])
    print(f"=== {label}: exit {proc.returncode} ({time.time() - t0:.0f}s)", flush=True)
    return proc.returncode


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "06"
    skip_sf1 = "--skip-sf1" in sys.argv
    skip_bench = "--skip-bench" in sys.argv

    gates = [
        ("sweep", ["tools_sweep.py", rnd]),
        ("planaudit", ["tools_plan_audit.py", rnd]),
        ("subtree", ["tools_subtree_audit.py", rnd, "--gate"]),
        ("streaming", ["tools_streaming_audit.py", rnd]),
        ("laws", ["tools_laws.py", rnd]),
    ]
    for label, args in gates:
        if run(label, args) != 0:
            print(f"ROUND ARTIFACTS RED at {label}")
            sys.exit(1)

    if not skip_bench:
        if run("bench-medians", ["tools_bench_medians.py", rnd, "5"]) != 0:
            sys.exit(1)
        # drift tripwire: unexplained same-plan >1.5x movers exit red
        if run("bench-compare", ["tools_bench_compare.py", rnd]) != 0:
            print("ROUND ARTIFACTS RED at bench-compare (unexplained movers)")
            sys.exit(1)

    if not skip_sf1 and not skip_bench:
        if not os.path.isdir("/tmp/sf1"):
            if run("make-sf1", ["tools_make_sf1.py", "/tmp/sf1"]) != 0:
                sys.exit(1)
        if run("bench-sf1", ["tools_bench_sf1.py", rnd, "3"]) != 0:
            print("ROUND ARTIFACTS RED at bench-sf1 (scale budget)")
            sys.exit(1)

    run("dump-plans", ["tools_dump_plans.py"])
    print("ROUND ARTIFACTS GREEN")


if __name__ == "__main__":
    main()
