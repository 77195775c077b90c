"""r14 A/B: bm25 ad-hoc inline filter pushdown + dsir hashed in-row
scoring, interleaved reps in ONE session (the host is noisy — same-
session alternation is the robust comparison; BENCHNOTES methodology).

Usage: python scripts/ab_r14_bm25_dsir.py [bm25|dsir|both]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from vicinity_spark.session import get_spark  # noqa: E402

WHAT = sys.argv[1] if len(sys.argv) > 1 else "both"


def timed(label, thunk, reps_store):
    t0 = time.perf_counter()
    n = thunk()
    dt = time.perf_counter() - t0
    reps_store.setdefault(label, []).append(round(dt, 3))
    print(f"# {label}: {dt:.3f}s ({n} rows)", flush=True)


def main():
    spark = get_spark("ab-r14")
    spark.sparkContext.setLogLevel("ERROR")
    reps = {}

    if WHAT in ("bm25", "both"):
        # bm25_2m recipe (bench.py _bm25_bench)
        n, vocab, tokens = 2_000_000, 500_000, 32
        toks = [
            F.concat(
                F.lit("w"),
                (F.abs(F.xxhash64(F.col("id"), F.lit(j))) % vocab).cast("string"),
            )
            for j in range(tokens)
        ]
        docs = (
            spark.range(0, n, 1, 64)
            .select(F.col("id").alias("doc_id"), F.concat_ws(" ", *toks).alias("text"))
            .cache()
        )
        docs.count()
        queries = docs.where(F.col("doc_id") < 8)
        from vicinity_spark.operators.retrieval import bm25_topk

        def new():
            return bm25_topk(docs, queries, k=10).count()

        def old():
            return bm25_topk(docs, queries, k=10, inline_terms_max=0).count()

        old(); new()  # untimed warm-up of both plans
        for _ in range(3):
            timed("bm25_2m_join(old)", old, reps)
            timed("bm25_2m_inline(new)", new, reps)
        docs.unpersist()

    if WHAT in ("dsir", "both"):
        # dsir_hashed_1m recipe (bench.py)
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
        tb = spark.range(0, 20_000, 1, 8).select(F.col("id").alias("doc_id"))
        ttoks = [
            F.substring(
                F.md5((F.abs(F.hash(F.col("doc_id"), F.lit(j + 100))) % 5_000).cast("string")),
                1,
                8,
            )
            for j in range(24)
        ]
        target = tb.select("doc_id", F.concat_ws(" ", *ttoks).alias("text")).cache()
        target.count()
        from vicinity_spark.operators.sampling import (
            dsir_weights_from_lms,
            hashed_gram_stream,
        )
        from vicinity_spark.operators.textops import fit_unigram_lm

        # prefit LMs once (untimed): isolates the SCORING pass the
        # change touches; entry-level numbers come from the bench suite
        lm_t = fit_unigram_lm(target, token_stream=hashed_gram_stream(target))
        lm_t = lm_t.localCheckpoint(eager=True)
        lm_r = fit_unigram_lm(raw, token_stream=hashed_gram_stream(raw))
        lm_r = lm_r.localCheckpoint(eager=True)

        def consume(df):
            # sum(llr)+sum(n_tokens) so column pruning cannot skip the
            # scoring work under either plan (guide §1.4)
            return df.agg(F.sum("llr"), F.sum("n_tokens")).collect()[0]

        def new():
            r = consume(dsir_weights_from_lms(raw, lm_r, lm_t, features="hashed_ngram"))
            return f"{r[0]:.1f}/{r[1]}"

        def old():
            r = consume(
                dsir_weights_from_lms(
                    raw, lm_r, lm_t, features="hashed_ngram", inline_lm=False
                )
            )
            return f"{r[0]:.1f}/{r[1]}"

        old(); new()  # untimed warm-up
        for _ in range(3):
            timed("dsir_score_1m_join(old)", old, reps)
            timed("dsir_score_1m_inrow(new)", new, reps)

    print("\nRESULTS (min of reps):")
    for k, v in reps.items():
        print(f"  {k}: min {min(v)}s  reps {v}")


if __name__ == "__main__":
    main()
