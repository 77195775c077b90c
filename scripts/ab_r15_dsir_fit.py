"""r15 A/B: DSIR hashed-ngram FIT pass — string vs int bucket keys
(VERDICT r14 item 4 / guide §2.4 "shuffle fewer bytes, narrower types").

The fit aggregates the 47M-row hashed gram stream by its 3-hex STRING
bucket key. Hypothesis: keying the corpus-sized hash aggregate on the
integer bucket index (conv at gram build) and formatting back to hex
after the ≤4096-row aggregate shrinks the agg probe cost.

Isolates the components with the noop sink (guide §1.4), interleaved
min-of-N (BENCHNOTES methodology — same-session alternation is the
only valid evidence class on variable-speed sandboxes):

  stream : gram computation + string emit (the floor any fit pays)
  agg_str: groupBy(string tok).count       (current fit core)
  agg_int: groupBy(int bucket).count       (candidate)
  fit_str: full fit_unigram_lm over the string stream
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vicinity_spark.operators.sampling import hashed_gram_stream
from vicinity_spark.operators.textops import fit_unigram_lm
from vicinity_spark.session import get_spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("ab-r15-dsir-fit")
    spark.sparkContext.setLogLevel("ERROR")
    vocab, n = 50_000, 1_000_000
    base = spark.range(0, n, 1, 64).select(F.col("id").alias("doc_id"))
    toks = [
        F.substring(
            F.md5((F.abs(F.hash(F.col("doc_id"), F.lit(j))) % vocab).cast("string")),
            1,
            8,
        )
        for j in range(24)
    ]
    raw = base.select("doc_id", F.concat_ws(" ", *toks).alias("text")).cache()
    raw.count()

    stream_str = hashed_gram_stream(raw)
    stream_int = stream_str.select(
        "doc_id", F.conv("tok", 16, 10).cast("int").alias("tok")
    )

    cases = {
        "stream": lambda: _noop(stream_str.select("tok")),
        "agg_str": lambda: _noop(stream_str.groupBy("tok").count()),
        "agg_int": lambda: _noop(stream_int.groupBy("tok").count()),
        "fit_str": lambda: fit_unigram_lm(
            raw, token_stream=stream_str
        ).write.format("noop").mode("overwrite").save(),
    }
    # warm-up
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
