"""r15 A/B: semdedup's cluster fold — array<float> collect_list vs
packed-binary collect_list (VERDICT r14 item 6 / guide §2.3 "shuffle
keys and metadata, not payloads" + §4.2 Arrow re-slicing).

Decomposes semdedup_200k's timed region with the noop sink (§1.4):

  assign  : Arrow assignment kernel only (the floor)
  fold    : assignment → groupBy(cluster).collect_list(id, vector)
  pairs   : fold → matrix pair kernel           (current shape)
  fold_p  : assignment kernel ALSO emits vector packed to float32
            bytes → groupBy collect_list(id, packed)
  pairs_p : packed fold → kernel that np.frombuffers one contiguous
            buffer per cluster                  (candidate shape)
  full    : semdedup(...) end-to-end as the bench entry runs it

The packed candidate amortizes the pack into the ONE Arrow pass the
assignment already pays (no new UDF stage) and replaces the
per-member np.asarray/vstack loop (~200k ndarray conversions per rep)
with one frombuffer per cluster. Values are bit-identical: the
stored vectors are float32 either way and both paths widen to
float64 before any distance math, in the same id-sorted order.

Prints interleaved min-of-N per case plus a pair-set equality check.
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


def main():
    import bench

    from vicinity_spark.operators.cluster import (
        _PCHUNK,
        _cluster_pairs_kernel,
        assign_clusters,
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
    C = np.asarray(cents, dtype=np.float64)
    Csq = (C * C).sum(axis=1)

    # ---- current shape ------------------------------------------------
    asg = assign_clusters(docs.select("id", "vector"), cents)
    folded = asg.groupBy("cluster_id").agg(
        F.collect_list("id").alias("__ids"),
        F.collect_list("vector").alias("__vecs"),
    )
    pairs_cur = folded.mapInPandas(
        _cluster_pairs_kernel("cosine", 1e-9), "id_a long, id_b long"
    )

    # ---- packed candidate --------------------------------------------
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        StructField,
        StructType,
    )

    from vicinity_spark.operators.grid import nearest_centroids

    out_schema = StructType(
        [
            StructField("cluster_id", IntegerType()),
            StructField("packed", BinaryType()),
        ]
    )

    @F.pandas_udf(out_schema)
    def assign_pack(v: pd.Series) -> pd.DataFrame:
        Q = np.vstack(v.to_numpy()).astype(np.float64)
        idx, _ = nearest_centroids(Q, C, 1, Csq)
        Q32 = Q.astype(np.float32)
        return pd.DataFrame(
            {
                "cluster_id": idx[:, 0].astype(np.int32),
                "packed": [Q32[i].tobytes() for i in range(len(Q32))],
            }
        )

    asg_p = docs.select(
        "id", assign_pack(F.col("vector")).alias("__a")
    ).select(
        "id",
        F.col("__a.cluster_id").alias("cluster_id"),
        F.col("__a.packed").alias("packed"),
    )
    folded_p = asg_p.groupBy("cluster_id").agg(
        F.collect_list("id").alias("__ids"),
        F.collect_list("packed").alias("__vecs"),
    )

    def packed_kernel(it):
        for pdf in it:
            for i in range(len(pdf)):
                ids = np.asarray(pdf["__ids"].iloc[i], dtype=np.int64)
                m = len(ids)
                if m < 2:
                    continue
                V = (
                    np.frombuffer(
                        b"".join(pdf["__vecs"].iloc[i]), dtype=np.float32
                    )
                    .reshape(m, -1)
                    .astype(np.float64)
                )
                order = np.argsort(ids, kind="stable")
                ids, V = ids[order], V[order]
                nrm = np.linalg.norm(V, axis=1)
                nrm[nrm == 0.0] = np.nan
                W = V / nrm[:, None]
                out_a, out_b = [], []
                for s in range(0, m, _PCHUNK):
                    e = min(s + _PCHUNK, m)
                    D = 1.0 - W[s:e] @ W.T
                    with np.errstate(invalid="ignore"):
                        ii, jj = np.nonzero(D <= 1e-9)
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

    pairs_pk = folded_p.mapInPandas(packed_kernel, "id_a long, id_b long")

    # ---- equality gate (before any timing) ---------------------------
    a = sorted(map(tuple, pairs_cur.collect()))
    b = sorted(map(tuple, pairs_pk.collect()))
    print(f"pair sets equal: {a == b}  ({len(a)} pairs)", flush=True)
    if a != b:
        print("ABORT: packed kernel is not row-identical", flush=True)
        return

    from vicinity_spark.operators.cluster import semdedup

    def full():
        out = semdedup(docs, cents, max_distance=1e-9)
        out.agg(
            F.sum(F.col("is_canonical").cast("long")).alias("kept"),
            F.sum((~F.col("is_canonical")).cast("long")).alias("flagged"),
        ).count()

    cases = {
        "assign": lambda: _noop(asg),
        "fold": lambda: _noop(folded),
        "pairs": lambda: _noop(pairs_cur),
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
