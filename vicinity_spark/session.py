"""SparkSession factory tuned for the local[32] harness but configured
the way a 1000-executor cluster run would be: AQE on (runtime re-plan,
skew-join splitting), Arrow on (vectorized pandas exchange), shuffle
partitions sized to the parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """24g where the host affords it, else ~half of physical memory.

    24g suits the 128 GiB bench host (the 2M bench tier OOM'd at 8g —
    r5 repro), but a blanket 24g default would set Xmx ABOVE physical
    memory on small hosts, risking host-level OOM/swap instead of a
    clean Spark OOM (r5 ADVICE). Half of physical memory, floored at
    2g, keeps small hosts safe; SPARK_GRAFT_DRIVER_MEM overrides.
    Physical memory via sysconf (Linux AND macOS), /proc/meminfo as
    backup; if neither is readable, fall back to 8g — conservative,
    never above-physical on any plausible host — not 24g. Inside a
    memory-capped container the cgroup limit, not host physical
    memory, is what the kernel enforces — take the min with
    cgroup v2 memory.max / v1 memory.limit_in_bytes when present
    (r6 ADVICE)."""
    total_b = None
    try:
        total_b = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    except (ValueError, OSError, AttributeError):
        try:
            with open("/proc/meminfo") as f:
                for line in f:
                    if line.startswith("MemTotal:"):
                        total_b = int(line.split()[1]) * 1024
                        break
        except OSError:
            pass
    for cgroup_path in (
        "/sys/fs/cgroup/memory.max",  # v2
        "/sys/fs/cgroup/memory/memory.limit_in_bytes",  # v1
    ):
        try:
            with open(cgroup_path) as f:
                raw = f.read().strip()
            if raw != "max":
                limit = int(raw)
                # v1 reports ~2^63 when unlimited; ignore absurd values
                if 0 < limit < (1 << 60):
                    total_b = min(total_b, limit) if total_b else limit
            break
        except (OSError, ValueError):
            continue
    if not total_b:
        return "8g"
    total_gib = total_b / (1024**3)
    return f"{max(2, min(24, int(total_gib / 2)))}g"


def get_spark(
    app_name: str = "vicinity-spark",
    cpus: "int | str | None" = None,
    shuffle_partitions: "int | None" = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
    )
    # Python workers unpickle mapInPandas kernels by module reference;
    # make vicinity_spark importable for them regardless of driver cwd.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    py_path = os.environ.get("PYTHONPATH", "")
    if pkg_root not in py_path.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + py_path if py_path else "")
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # r15 (VERDICT r14 item 2): the r14 driver bench died with
        # "Python worker exited unexpectedly (crashed)" and no Python
        # traceback. Faulthandler in the workers turns the next such
        # crash into an actionable stack (negligible steady-state
        # cost: one signal-handler registration per worker). The
        # crash-class memory term itself — unchunked pair-rescore
        # temporaries in the knn/grid kernels — is fixed at the
        # kernel level (grid.rescore_pairs); JVM→Python Arrow batches
        # were already byte-bounded by Spark 4.1's 64m
        # spark.sql.execution.arrow.maxBytesPerBatch default
        # (BatchedPythonArrowInput honors it for mapInPandas).
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local mode shares one JVM between driver and executors, so
        # this caps ALL storage+execution memory. Xmx is a cap, not a
        # reservation; see _default_driver_mem for the sizing rule.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM") or _default_driver_mem(),
        )
        # UI off by default (driver/bench runs need no HTTP server);
        # SPARK_GRAFT_UI=1 turns it on for diagnostic sessions that
        # read per-stage metrics (spill/GC/shuffle) from the REST API,
        # e.g. scripts/probe_r15_neardup.py.
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") == "1" else "false",
        )
    )
    # SPARK_GRAFT_STATE_STORE=rocksdb switches streaming state to the
    # RocksDB provider (bundled with Spark 4) — the production choice
    # when keyed state outgrows executor heap (long watermark horizons,
    # high-cardinality dedup/serving buckets). Default stays the
    # HDFS-backed in-memory provider: state in every test and bench
    # here is small, and the in-memory provider avoids RocksDB's
    # per-batch snapshot/compaction overhead at that scale. Verified
    # working in this build (streaming agg runs with RocksDB custom
    # metrics reported).
    if os.environ.get("SPARK_GRAFT_STATE_STORE", "").lower() == "rocksdb":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    return builder.getOrCreate()


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one of the driver's parquet tables (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def scan_reads_path(df, target: str) -> bool:
    """True when ``df``'s file scan reads from under ``target`` — the
    predicate behind every save-over-own-source guard (store.save,
    bm25_index_save): an overwrite of a folder the plan still scans
    deletes the part files mid-read, so the callers materialize first.

    Both sides resolve through the Hadoop ``FileSystem``
    (``makeQualified``), NOT ``os.path.abspath``: abspath mangles
    scheme-qualified URIs (``s3a://bucket/x`` becomes a nonsense local
    path), so on object storage the old string guard never matched and
    the documented load→append→save-to-the-same-folder cycle would
    delete the files the postings plan still scans (r12 ADVICE). The
    local-FS behavior is unchanged — Hadoop's LocalFileSystem
    qualifies relative paths against the JVM working directory, the
    same base abspath used."""
    files = df.inputFiles()
    if not files:
        return False
    jvm = df.sparkSession._jvm
    conf = df.sparkSession.sparkContext._jsc.hadoopConfiguration()

    def _qualify(p: str) -> str:
        jp = jvm.org.apache.hadoop.fs.Path(p)
        return jp.getFileSystem(conf).makeQualified(jp).toString()

    prefix = _qualify(target).rstrip("/") + "/"
    return any(_qualify(f).startswith(prefix) for f in files)
