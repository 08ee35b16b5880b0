#!/usr/bin/env python
"""Per-query profiling harness (optimization rounds): run one registry
query N times warm, print wall seconds, and dump the session's job/stage
timeline from the Spark status API so the cost can be attributed to
specific jobs (checkpoint rounds, convergence checks, index builds)
rather than guessed. Read-only: no artifacts, not part of the bench
protocol.

Usage: python tools/profile_query.py qNN[_suffix] [--reps 3] [--plan]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from powerdatapipeline_spark.queries import REGISTRY  # noqa: E402
from powerdatapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 3
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    want_plan = "--plan" in args
    if want_plan:
        args.remove("--plan")
    stem = args[0]
    names = [n for n in REGISTRY if n == stem or n.startswith(stem + "_")]
    if len(names) != 1:
        raise SystemExit(f"query {stem!r} matched {names}")
    name = names[0]
    fn, _ = REGISTRY[name]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm pass (untimed)
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    print(f"[warm] {time.perf_counter() - t0:.3f}s")

    times = []
    first_job_after_warm = None
    for r in range(reps):
        jobs_before = set(tracker.getJobIdsForGroup() or [])
        sc.setJobDescription(f"{name} rep{r}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"[rep {r}] {dt:.3f}s")
        if r == 0:
            first_job_after_warm = jobs_before
    print(f"[min of {reps}] {min(times):.3f}s")

    # job timeline for the measured reps via the REST-backed status store
    import json
    import urllib.request
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    try:
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
            jobs = json.load(r)
    except Exception as e:  # UI disabled — skip timeline
        print(f"(no UI timeline: {e})")
        jobs = []
    jobs.sort(key=lambda j: j["jobId"])
    import datetime as dt_mod

    def ts(s):
        return dt_mod.datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")

    print("\njobId  dur_s  stages tasks  description")
    for j in jobs:
        if "submissionTime" not in j or "completionTime" not in j:
            continue
        desc = (j.get("description") or j.get("name") or "")[:90]
        if "rep" not in desc and name not in desc:
            continue
        dur = (ts(j["completionTime"]) - ts(j["submissionTime"])).total_seconds()
        print(f"{j['jobId']:5d}  {dur:5.2f}  {len(j.get('stageIds', [])):3d} "
              f"{j.get('numCompletedTasks', 0):6d}  {desc}")

    if want_plan:
        df = fn(spark, sf_dir)
        print("\n=== explain(formatted) ===")
        print(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))


if __name__ == "__main__":
    main()
