"""r15 A/B: semdedup's cluster fold — array<float> collect_list +
per-member conversion loop (the pre-r15 shape, inlined here) vs the
SHIPPED packed-binary fold (VERDICT r14 item 6 / guide §2.3 "shuffle
keys and metadata, not payloads" + §4.2 Arrow re-slicing).

Decomposes semdedup_200k's timed region with the noop sink (§1.4):

  assign   : plain Arrow assignment kernel (the old floor)
  fold     : assignment → groupBy(cluster).collect_list(id, vector)
  pairs_old: array fold → the pre-r15 kernel (per-member np.asarray
             loop), inlined verbatim            (old shape)
  fold_p   : shipped packed assignment → collect_list(id, bytes)
  pairs_p  : packed fold → shipped frombuffer kernel   (new shape)
  full     : shipped semdedup(...) end-to-end as the bench entry runs

The packed shape amortizes the pack into the ONE Arrow pass the
assignment already pays (no new UDF stage) and replaces the
per-member np.asarray/vstack loop (~200k ndarray conversions per rep)
with one frombuffer per cluster; values are bit-identical (both paths
widen to float64 before any distance math, in the same id-sorted
order). A pair-set equality gate runs before any timing.

Prints interleaved min-of-N per case.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from vicinity_spark.session import get_spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _old_pairs_kernel(metric: str, max_distance: float):
    """The pre-r15 `_cluster_pairs_kernel`, verbatim: per-member
    ndarray conversion + vstack instead of one frombuffer."""
    from vicinity_spark.operators.cluster import _PCHUNK

    def kernel(it):
        for pdf in it:
            for i in range(len(pdf)):
                ids = np.asarray(pdf["__ids"].iloc[i], dtype=np.int64)
                m = len(ids)
                if m < 2:
                    continue
                V = np.vstack(
                    [np.asarray(v, dtype=np.float64) for v in pdf["__vecs"].iloc[i]]
                )
                order = np.argsort(ids, kind="stable")
                ids, V = ids[order], V[order]
                if metric == "cosine":
                    nrm = np.linalg.norm(V, axis=1)
                    nrm[nrm == 0.0] = np.nan
                    W = V / nrm[:, None]
                else:
                    W = V
                    sq = (V * V).sum(axis=1)
                out_a, out_b = [], []
                for s in range(0, m, _PCHUNK):
                    e = min(s + _PCHUNK, m)
                    if metric == "cosine":
                        D = 1.0 - W[s:e] @ W.T
                    else:
                        D = sq[s:e, None] + sq[None, :] - 2.0 * (W[s:e] @ W.T)
                        if metric == "euclidean":
                            D = np.sqrt(np.maximum(D, 0.0))
                    with np.errstate(invalid="ignore"):
                        ii, jj = np.nonzero(D <= max_distance)
                    gi = ii + s
                    keep = gi < jj
                    if keep.any():
                        out_a.append(ids[gi[keep]])
                        out_b.append(ids[jj[keep]])
                if out_a:
                    yield pd.DataFrame(
                        {
                            "id_a": np.concatenate(out_a),
                            "id_b": np.concatenate(out_b),
                        }
                    )

    return kernel


def main():
    import bench

    from vicinity_spark.operators.cluster import (
        _assign_pack_udf,
        _cluster_pairs_kernel,
        assign_clusters,
        semdedup,
    )

    spark = get_spark("ab-r15-semdedup-fold")
    spark.sparkContext.setLogLevel("ERROR")

    base = bench._synth_vectors(spark, n=200_000, dim=64, parts=32)
    dup = F.when(
        (F.col("id") % 100 == 1) & (F.col("id") > 0), F.col("id") - 1
    ).otherwise(F.col("id"))
    docs = (
        spark.range(0, 200_000, 1, 32)
        .select(F.col("id"), dup.alias("__src"))
        .join(base.select(F.col("id").alias("__src"), "vector"), "__src")
        .select("id", "vector")
        .cache()
    )
    docs.count()
    cents = [
        r["vector"] for r in base.where(F.col("id") < 64).orderBy("id").collect()
    ]

    # ---- old shape (pre-r15, inlined) ---------------------------------
    asg = assign_clusters(docs.select("id", "vector"), cents)
    folded = asg.groupBy("cluster_id").agg(
        F.collect_list("id").alias("__ids"),
        F.collect_list("vector").alias("__vecs"),
    )
    pairs_old = folded.mapInPandas(
        _old_pairs_kernel("cosine", 1e-9), "id_a long, id_b long"
    )

    # ---- shipped packed shape ------------------------------------------
    cents_f = [list(map(float, c)) for c in cents]
    asg_p = docs.select(
        "id", _assign_pack_udf(cents_f)(F.col("vector")).alias("__a")
    ).select(
        "id",
        F.col("__a.cluster_id").alias("cluster_id"),
        F.col("__a.packed").alias("__packed"),
    )
    folded_p = asg_p.groupBy("cluster_id").agg(
        F.collect_list("id").alias("__ids"),
        F.collect_list("__packed").alias("__vecs"),
    )
    pairs_pk = folded_p.mapInPandas(
        _cluster_pairs_kernel("cosine", 1e-9), "id_a long, id_b long"
    )

    # ---- equality gate (before any timing) ----------------------------
    a = sorted(map(tuple, pairs_old.collect()))
    b = sorted(map(tuple, pairs_pk.collect()))
    print(f"pair sets equal: {a == b}  ({len(a)} pairs)", flush=True)
    if a != b:
        print("ABORT: packed kernel is not row-identical", flush=True)
        return

    def full():
        out = semdedup(docs, cents, max_distance=1e-9)
        out.agg(
            F.sum(F.col("is_canonical").cast("long")).alias("kept"),
            F.sum((~F.col("is_canonical")).cast("long")).alias("flagged"),
        ).count()

    cases = {
        "assign": lambda: _noop(asg),
        "fold": lambda: _noop(folded),
        "pairs_old": lambda: _noop(pairs_old),
        "fold_p": lambda: _noop(folded_p),
        "pairs_p": lambda: _noop(pairs_pk),
        "full": full,
    }
    for name, fn in cases.items():
        spark.sparkContext.setJobDescription(f"warm {name}")
        fn()
    reps = int(os.environ.get("AB_REPS", "3"))
    times = {k: [] for k in cases}
    for r in range(reps):
        for name, fn in cases.items():  # interleaved
            spark.sparkContext.setJobDescription(f"rep{r} {name}")
            t0 = time.perf_counter()
            fn()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(
            f"{name}: min {min(ts):.2f}s  reps {[round(t, 2) for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
