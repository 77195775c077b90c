"""Deterministic split operator (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from vicinity_spark.operators.sampling import hash_split, hex_threshold


def test_hex_threshold_values():
    assert hex_threshold(0.5) == "80000000"
    assert hex_threshold(1.0) == "ffffffff"
    assert hex_threshold(0.0) == "00000000"
    assert hex_threshold(0.9).startswith("e666")
    with pytest.raises(ValueError):
        hex_threshold(1.5)


def test_hash_split_deterministic_and_calibrated(spark):
    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    a = hash_split(df, train_fraction=0.9)
    b = hash_split(df, train_fraction=0.9)
    # identical routing on re-computation (no RNG anywhere)
    assert a.exceptAll(b).count() == 0
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    frac = counts["train"] / 20_000
    assert 0.88 < frac < 0.92, frac
    # a different salt routes differently but stays calibrated
    c = hash_split(df, train_fraction=0.9, salt="fold2")
    moved = a.join(c.withColumnRenamed("split", "s2"), "doc_id").where(
        F.col("split") != F.col("s2")
    ).count()
    assert moved > 0


def test_stratified_hash_split_per_stratum_fractions(spark):
    from vicinity_spark.operators.sampling import hash_split, stratified_hash_split

    df = (
        spark.range(30_000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("lang", F.when(F.col("doc_id") % 3 == 0, "en").otherwise("de"))
    )
    out = stratified_hash_split(df, "lang", {"en": 0.5}, default_fraction=0.95)
    got = {
        (r["lang"], r["split"]): r["n"]
        for r in out.groupBy("lang", "split").agg(F.count("*").alias("n")).collect()
    }
    en_total = got[("en", "train")] + got[("en", "holdout")]
    de_total = got[("de", "train")] + got[("de", "holdout")]
    assert 0.47 < got[("en", "train")] / en_total < 0.53
    assert 0.93 < got[("de", "train")] / de_total < 0.97
    # strata share the key: a row in 'train' under the plain split with
    # the same fraction is in 'train' under the stratified split too
    plain = hash_split(df, train_fraction=0.5)
    joined = out.where(F.col("lang") == "en").join(
        plain.select("doc_id", F.col("split").alias("p")), "doc_id"
    )
    assert joined.where(F.col("split") != F.col("p")).count() == 0


def test_mix_sources_integer_weights_exact(spark):
    """r7: integer weights produce exactly w copies per doc; sources
    absent from the weight table are dropped; repeat_idx is dense
    0..w-1; order_key is unique across (doc, repeat)."""
    from vicinity_spark.operators.sampling import mix_sources

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
    )
    out = mix_sources(df, {"s0": 2.0, "s1": 1.0}).cache()
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"s0": 200, "s1": 100}  # 100 docs/source
    reps = [r["r"] for r in out.where(F.col("source") == "s0").groupBy("doc_id").agg(
        F.sort_array(F.collect_list("repeat_idx")).alias("r")).collect()]
    assert all(r == [0, 1] for r in reps) and len(reps) == 100
    assert out.select("order_key").distinct().count() == 300


def test_mix_sources_fractional_weight_rate(spark):
    """Fractional part honored at the md5-threshold rate, and the
    fractional pick is per-doc deterministic (two runs identical)."""
    from vicinity_spark.operators.sampling import mix_sources

    df = spark.range(20_000).select(
        F.col("id").alias("doc_id"), F.lit("w").alias("source")
    )
    out = mix_sources(df, {"w": 1.25})
    n = out.count()
    assert 20_000 * 1.22 < n < 20_000 * 1.28
    assert n == mix_sources(df, {"w": 1.25}).count()


def test_mix_sources_zero_shuffle_plan_and_errors(spark):
    from vicinity_spark.operators.sampling import mix_sources
    from vicinity_spark.plans.checks import plan_summary

    df = spark.range(10).select(F.col("id").alias("doc_id"), F.lit("a").alias("source"))
    assert "Exchange" not in plan_summary(mix_sources(df, {"a": 2.0}))
    import pytest as _pt

    with _pt.raises(ValueError):
        mix_sources(df, {})
    with _pt.raises(ValueError):
        mix_sources(df, {"a": -1.0})
