"""r15: WHERE is dsir flat-scaling time spent? (follow-up to
scripts/ab_r15_scaling.py, which measured c8/c32 = 1.12x for
dsir_hashed_1m and 1.07x for dsir_2m on a quiet host — a serial
bottleneck in a pure-JVM path).

Runs one bench entry once at the session's cpu count and prints, per
job: wall, summed task duration, task count, GC time, plus the total
wall NOT covered by any job (driver-side planning/collect gaps). If
task-sum / wall is far below the core count while tasks exist, the
stages are underparallel; if job walls don't cover the rep wall, the
driver is the bottleneck.
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vicinity_spark.session import get_spark  # noqa: E402

ENTRY = os.environ.get("AB_ENTRY", "dsir_2m")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _api(spark, path):
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}{path}"
    ) as r:
        return json.load(r)


def main():
    import bench

    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"probe-dsir-serial-c{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    fn = bench.BENCH[ENTRY](spark, SF_DIR)  # untimed build + warm-up

    group = "timed_rep"
    spark.sparkContext.setJobGroup(group, group)
    t0 = time.perf_counter()
    fn(spark, SF_DIR).count()
    wall = time.perf_counter() - t0
    spark.sparkContext.setJobGroup("x", "x")

    jobs = [j for j in _api(spark, "/jobs") if j.get("jobGroup") == group]
    jobs.sort(key=lambda j: j["submissionTime"])
    stages = {s["stageId"]: s for s in _api(spark, "/stages")}
    print(f"\n=== {ENTRY} @ local[{cpus}]: rep wall {wall:.2f}s, "
          f"{len(jobs)} jobs ===")
    covered = 0.0
    for j in jobs:
        sub = j["submissionTime"]
        comp = j.get("completionTime")
        jw = "?"
        if comp:
            from datetime import datetime

            def _p(ts):
                return datetime.strptime(ts, "%Y-%m-%dT%H:%M:%S.%fGMT")

            jw = (_p(comp) - _p(sub)).total_seconds()
            covered += jw
        tsum = gc = 0.0
        ntasks = 0
        smax = []
        for sid in j["stageIds"]:
            s = stages.get(sid)
            if not s or s["status"] not in ("COMPLETE", "SKIPPED"):
                continue
            tsum += s.get("executorRunTime", 0) / 1e3
            gc += s.get("jvmGcTime", 0) / 1e3
            ntasks += s.get("numCompleteTasks", 0)
            smax.append((sid, s.get("numCompleteTasks", 0),
                         round(s.get("executorRunTime", 0) / 1e3, 1)))
        jwf = f"{jw:.2f}" if isinstance(jw, float) else jw
        print(f"job {j['jobId']}: sub {sub[11:23]} comp "
              f"{(comp or '?')[11:23]} wall {jwf}s  taskSum {tsum:.1f}s  "
              f"tasks {ntasks}  gc {gc:.1f}s  "
              f"desc {j.get('description', '')[:60]!r}  stages {smax}")
    print(f"job-covered wall: {covered:.2f}s of {wall:.2f}s  "
          f"(driver gap {wall - covered:.2f}s)")


if __name__ == "__main__":
    main()
