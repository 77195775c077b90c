"""r14 A/B: sort-merge vs shuffled-hash join for the MinHash bucket
self-join mining path (guide §3.1) — interleaved same-session reps,
flipping spark.sql.join.preferSortMergeJoin at runtime.

Usage: python scripts/ab_r14_shj.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from vicinity_spark.session import get_spark  # noqa: E402
from bench import _synth_docs  # noqa: E402


def main():
    spark = get_spark("ab-shj")
    spark.sparkContext.setLogLevel("ERROR")
    from vicinity_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs_rowwise,
    )

    docs = _synth_docs(spark, n=1_990_000, n_dups=10_000, parts=64).cache()
    docs.count()

    def run():
        pairs = minhash_lsh_pairs_rowwise(
            docs, n_hashes=16, rows_per_band=2, min_jaccard=0.5, hash_fn="tokenroll"
        )
        comps = connected_components(docs.select("doc_id"), pairs, id_col="doc_id")
        return comps.where(F.col("rep") == F.col("id")).count()

    def smj():
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0")
        return run()

    def shj():
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
        spark.conf.set(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "256m"
        )
        return run()

    reps = {}
    smj(); shj()  # untimed warm-up both ways
    for _ in range(3):
        for name, fn in (("smj", smj), ("shj", shj)):
            t0 = time.perf_counter()
            n = fn()
            dt = time.perf_counter() - t0
            reps.setdefault(name, []).append(round(dt, 3))
            print(f"# dedup_e2e_2m[{name}]: {dt:.3f}s ({n} rows)", flush=True)
    print("\nRESULTS:")
    for k, v in reps.items():
        print(f"  {k}: min {min(v)}s reps {v}")


if __name__ == "__main__":
    main()
