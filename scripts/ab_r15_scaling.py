"""r15 scaling probe (VERDICT r14 item 9, closed properly): clean
same-RUN interleaved c8/c32 measurement of the entries the two
cross-session bench runs flagged as ratio≈1 "low-parallelism
candidates" (dsir_hashed_1m 0.95, dsir_2m 0.98, knn_scale_2m 0.98).
The cross-session flags are suspect — the 32-cpu session sat in a
measured host slow phase (probe 0.873s) and 40/56 entries came out
"faster" at 8 cpus, impossible on a quiet machine — so this probe
alternates SESSIONS (32, 8, 32, 8) within one process run, each
session building the entry's corpus, warming untimed, then timing
AB_REPS reps of the bench entry's exact timed action. Host drift is
bracketed by the alternation; the min per cpu count is the estimator
(BENCHNOTES methodology).

A genuinely parallel entry should read c8/c32 ≈ 2.5-4x at these
sizes; a ratio near 1 in BOTH 32-cpu sessions would mean a serial
bottleneck (driver planning, bounded collects, or too few tasks) and
become an optimization target. Nothing here persists or caches across
runs.
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vicinity_spark.session import get_spark  # noqa: E402

ENTRIES = [e for e in os.environ.get(
    "AB_ENTRIES", "dsir_hashed_1m,dsir_2m,knn_scale_2m").split(",") if e]
REPS = int(os.environ.get("AB_REPS", "2"))
CPU_ORDER = [int(c) for c in os.environ.get(
    "AB_CPUS", "32,8,32,8").split(",")]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def probe_matmul():
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.random((1000, 1000))
    b = rng.random((1000, 1000))
    best = float("inf")
    t_wall = time.perf_counter()
    for i in range(12):
        t0 = time.perf_counter()
        a @ b
        best = min(best, time.perf_counter() - t0)
        if i >= 1 and time.perf_counter() - t_wall > 2.0:
            break
    return best


def main():
    import bench  # the bench entry factories, verbatim

    results = {e: {} for e in ENTRIES}
    for si, cpus in enumerate(CPU_ORDER):
        os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
        # shuffle partitions follow cpus, as the bench harness does
        os.environ.pop("SPARK_GRAFT_SHUFFLE_PARTITIONS", None)
        spark = get_spark(f"ab-scaling-c{cpus}-s{si}", cpus=cpus)
        spark.sparkContext.setLogLevel("ERROR")
        pm = probe_matmul()
        print(f"## session {si}: local[{cpus}], host probe {pm:.3f}s",
              flush=True)
        for name in ENTRIES:
            fn = bench.BENCH[name]
            fn = fn(spark, SF_DIR)  # untimed build + cache + warm-up
            reps = []
            for r in range(REPS):
                gc.collect()
                spark.sparkContext._jvm.System.gc()
                spark.sparkContext.setJobDescription(
                    f"{name} c{cpus} rep{r}")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).count()
                reps.append(round(time.perf_counter() - t0, 2))
            results[name].setdefault(cpus, []).extend(reps)
            print(f"{name} c{cpus} s{si}: {reps}", flush=True)
        spark.stop()
        time.sleep(2)

    print("\n=== summary (min per cpu count) ===")
    for name in ENTRIES:
        mins = {c: min(v) for c, v in results[name].items()}
        lo, hi = max(mins), min(mins, key=mins.get)  # noqa: F841
        if 8 in mins and 32 in mins:
            ratio = mins[8] / mins[32]
            print(f"{name}: c32 min {mins[32]:.2f}s  c8 min "
                  f"{mins[8]:.2f}s  c8/c32 {ratio:.2f}x  "
                  f"all={results[name]}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
