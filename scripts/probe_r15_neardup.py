"""r15 probe: where does neardup_dedup_2m's rep variance live?

r13 driver reps spanned 36.8-80.7 s with zero code change (VERDICT
r14 item 5). This runs the bench entry's exact shape (same corpus,
same warm-up, same timed action) for AB_REPS reps and, after each
rep, pulls that rep's per-stage metrics from the Spark REST API —
executor run time, JVM GC time, shuffle read/write bytes, memory/disk
spill — so a slow rep can be attributed to spill (guide §2/§5) vs GC
pressure vs scheduler effects instead of guessed at.
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vicinity_spark.session import get_spark


def _api(spark, path):
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
        return json.load(r)


def main():
    import bench  # reuse the bench corpus builder verbatim

    spark = get_spark("probe-r15-neardup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = bench._synth_docs(spark, n=1_999_000, n_dups=1000, parts=64).cache()
    docs.count()
    from vicinity_spark.operators.dedup import neardup_dedup

    # untimed warm-up, as the bench entry does
    spark.sparkContext.setJobGroup("warm", "warm")
    neardup_dedup(docs).count()

    import gc

    reps = int(os.environ.get("AB_REPS", "5"))
    for r in range(reps):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        group = f"rep{r}"
        spark.sparkContext.setJobGroup(group, group)
        t0 = time.perf_counter()
        n = neardup_dedup(docs).count()
        wall = time.perf_counter() - t0
        # map this rep's jobs -> stages -> summed metrics
        jobs = [j for j in _api(spark, "/jobs") if j.get("jobGroup") == group]
        sids = sorted({s for j in jobs for s in j["stageIds"]})
        tot = dict.fromkeys(
            (
                "executorRunTime",
                "jvmGcTime",
                "executorDeserializeTime",
                "shuffleFetchWaitTime",
                "shuffleWriteTime",
                "memoryBytesSpilled",
                "diskBytesSpilled",
                "shuffleReadBytes",
                "shuffleWriteBytes",
            ),
            0,
        )
        slowest = []
        for sid in sids:
            try:
                for att in _api(spark, f"/stages/{sid}"):
                    if att.get("status") != "COMPLETE":
                        continue
                    for k in tot:
                        tot[k] += att.get(k, 0) or 0
                    slowest.append(
                        (att.get("executorRunTime", 0), sid, att.get("name", "")[:60])
                    )
            except Exception:
                pass
        slowest.sort(reverse=True)
        ms = 1 / 1000.0
        print(
            f"rep{r}: wall {wall:.1f}s n={n} | stages {len(sids)} | "
            f"run {tot['executorRunTime']*ms:.0f}s gc {tot['jvmGcTime']*ms:.1f}s "
            f"fetchwait {tot['shuffleFetchWaitTime']*ms:.1f}s "
            f"writetime {tot['shuffleWriteTime']/1e9:.1f}s "
            f"spillMem {tot['memoryBytesSpilled']/1e6:.0f}MB "
            f"spillDisk {tot['diskBytesSpilled']/1e6:.0f}MB "
            f"shufR {tot['shuffleReadBytes']/1e6:.0f}MB "
            f"shufW {tot['shuffleWriteBytes']/1e6:.0f}MB",
            flush=True,
        )
        for rt, sid, nm in slowest[:4]:
            print(f"   stage {sid}: run {rt*ms:.1f}s  {nm}", flush=True)


if __name__ == "__main__":
    main()
