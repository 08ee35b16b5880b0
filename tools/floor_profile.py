#!/usr/bin/env python
"""Split the per-query session floor into its components (VERDICT r15
#4): for each sampled registry query, measure

  build   = fn(spark, sf)        (Python DataFrame construction: Py4J
                                  chatter + analysis of intermediate
                                  frames + any eager plan-build jobs)
  plan    = force executedPlan   (optimization + physical planning)
  exec1   = first count()        (codegen + execution)
  exec2   = best of 2 more count()s  (execution only, codegen warm)

so floor work can be attributed to driver-side plan costs vs genuine
task execution. Read-only triage tool; not part of the bench protocol.

Usage: python tools/floor_profile.py [qNN ...] [--sample N]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from powerdatapipeline_spark.queries import REGISTRY  # noqa: E402
from powerdatapipeline_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sample = 0
    if "--sample" in args:
        i = args.index("--sample")
        sample = int(args[i + 1])
        del args[i:i + 2]
    if args:
        names = []
        for stem in args:
            names += [n for n in REGISTRY
                      if n == stem or n.startswith(stem + "_")]
    else:
        names = list(REGISTRY)
        if sample:
            names = names[:: max(1, len(names) // sample)][:sample]
    spark = get_spark("floor_profile")
    spark.sparkContext.setLogLevel("ERROR")
    # session warm-up mirroring bench.py's intent (JIT + worker pool)
    from powerdatapipeline_spark.flagship import flagship
    flagship(spark, SF).count()

    tot = {"build": 0.0, "plan": 0.0, "exec1": 0.0, "exec2": 0.0}
    print(f"{'query':42s} {'build':>7s} {'plan':>7s} {'exec1':>7s} "
          f"{'exec2':>7s}")
    for name in names:
        fn, _ = REGISTRY[name]
        t0 = time.perf_counter()
        df = fn(spark, SF)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df.count()
        t3 = time.perf_counter()
        best = min(_timed(df.count) for _ in range(2))
        row = (t1 - t0, t2 - t1, t3 - t2, best)
        for k, v in zip(tot, row):
            tot[k] += v
        print(f"{name:42s} {row[0]:7.3f} {row[1]:7.3f} {row[2]:7.3f} "
              f"{row[3]:7.3f}")
    print(f"{'TOTAL':42s} {tot['build']:7.2f} {tot['plan']:7.2f} "
          f"{tot['exec1']:7.2f} {tot['exec2']:7.2f}")


def _timed(f) -> float:
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
