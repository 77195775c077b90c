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


# ---- r7 curation ops: cap_per_group / select_token_budget / weighted_sample


def _docs_df(spark, n=400, n_groups=5):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), (F.col("id") % n_groups).cast("string")).alias("source"),
        # non-monotone value so ordering is not the id order
        ((F.col("id") * 37) % 101).cast("long").alias("n_chars"),
    )


def test_cap_per_group_bucket_invariance_and_semantics(spark):
    """Survivor set == naive single-window top-N, for every bucket
    count (the two-phase plan is an optimization, not a semantics
    change)."""
    from pyspark.sql import Window

    from vicinity_spark.operators.sampling import cap_per_group

    df = _docs_df(spark)
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    naive = (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 7)
        .drop("rn")
    )
    expected = sorted(tuple(r) for r in naive.collect())
    for b in (1, 4, 32):
        got = cap_per_group(df, "source", 7, [F.col("n_chars").desc()], n_buckets=b)
        assert sorted(tuple(r) for r in got.collect()) == expected, b
    # groups smaller than n pass through whole
    tiny = cap_per_group(df.limit(3), "source", 7, [F.col("n_chars").desc()])
    assert tiny.count() == 3


def test_cap_per_group_errors(spark):
    import pytest as _pt

    from vicinity_spark.operators.sampling import cap_per_group

    df = _docs_df(spark, n=10)
    with _pt.raises(ValueError):
        cap_per_group(df, "source", 0, [F.col("n_chars").desc()])
    with _pt.raises(ValueError):
        cap_per_group(df, "source", 5, [F.col("n_chars").desc()], n_buckets=0)


def test_select_token_budget_matches_single_window_and_is_range_invariant(spark):
    from vicinity_spark.operators.sampling import select_token_budget

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        # duplicate scores force the doc_id tiebreak through the cut
        ((F.col("id") % 13).cast("double") / 13.0).alias("score"),
        ((F.col("id") * 7) % 29 + 1).cast("long").alias("n_tokens"),
    )
    rows = df.orderBy(F.col("score").desc(), F.col("doc_id")).collect()
    cum, expected = 0, {}
    budget = 1500
    for r in rows:
        cum += r.n_tokens
        if cum > budget:
            break
        expected[r.doc_id] = cum
    for nr in (1, 4, 16):
        got = {
            r.doc_id: r.cum_tokens
            for r in select_token_budget(df, budget, num_ranges=nr).collect()
        }
        assert got == expected, nr


def test_select_token_budget_edges(spark):
    import pytest as _pt

    from vicinity_spark.operators.sampling import select_token_budget

    df = spark.range(5).select(
        F.col("id").alias("doc_id"),
        F.lit(1.0).alias("score"),
        F.lit(10).cast("long").alias("n_tokens"),
    )
    # budget 0 and an empty input both select nothing (and keep schema)
    assert select_token_budget(df, 0).count() == 0
    empty = select_token_budget(df.where(F.lit(False)), 100)
    assert empty.count() == 0 and "cum_tokens" in empty.columns
    with _pt.raises(ValueError):
        select_token_budget(df, -1)


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    from vicinity_spark.operators.sampling import weighted_sample

    df = spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 200, F.lit(50.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    a = {r.doc_id for r in weighted_sample(df, 100, "w").collect()}
    b = {r.doc_id for r in weighted_sample(df.repartition(13), 100, "w").collect()}
    assert a == b and len(a) == 100
    # 200 heavy rows (weight 50) vs 1800 light: the heavy minority must
    # dominate the sample (E[heavy] ≈ 85 of 100; deterministic given md5)
    heavy = sum(1 for d in a if d < 200)
    assert heavy > 60, heavy
    # k >= n returns everything
    assert weighted_sample(df, 5_000, "w").count() == 2_000
    import pytest as _pt

    with _pt.raises(ValueError):
        weighted_sample(df, 0, "w")


def test_stratified_sample_deterministic_prefix_and_bucket_invariant(spark):
    from vicinity_spark.operators.sampling import stratified_sample

    df = (
        spark.range(5_000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("g", (F.col("doc_id") % 4).cast("string"))
    )
    small = stratified_sample(df, "g", 10)
    big = stratified_sample(df, "g", 50)
    counts = {r["g"]: r["n"] for r in small.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert all(v == 10 for v in counts.values()), counts
    # prefix property: the n=10 sample is contained in the n=50 sample
    assert small.select("doc_id").exceptAll(big.select("doc_id")).count() == 0
    # bucket-count invariance (the two-phase guard can't change the set)
    alt = stratified_sample(df, "g", 10, n_buckets=7)
    assert small.select("doc_id").exceptAll(alt.select("doc_id")).count() == 0
    assert alt.select("doc_id").exceptAll(small.select("doc_id")).count() == 0
    # different salt selects a different sample
    other = stratified_sample(df, "g", 10, salt="other")
    assert small.select("doc_id").exceptAll(other.select("doc_id")).count() > 0


def test_global_rank_matches_single_window(spark):
    from pyspark.sql import Window
    from vicinity_spark.operators.sampling import global_rank

    df = spark.range(3_000).select(
        F.col("id").alias("doc_id"), ((F.col("id") * 37) % 101).alias("score")
    )
    order = [F.col("score").desc(), F.col("doc_id").asc()]
    got = global_rank(df, order)
    ref = df.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0
    # range-count invariance: same ranks for any number of ranges
    alt = global_rank(df, order, num_ranges=5)
    assert alt.exceptAll(ref).count() == 0


def test_quality_tiers_matches_sql_ntile(spark):
    from vicinity_spark.operators.sampling import quality_tiers

    # n = 1003 NOT divisible by k = 7: remainder buckets must sit at
    # the front exactly as ntile's spec says
    df = spark.range(1_003).select(
        F.col("id").alias("doc_id"), ((F.col("id") * 13) % 47).alias("score")
    )
    got = quality_tiers(df, 7, [F.col("score").desc(), F.col("doc_id").asc()])
    df.createOrReplaceTempView("qt_docs")
    ref = spark.sql(
        """
        SELECT doc_id, score,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS LONG) AS rank,
               CAST(ntile(7) OVER (ORDER BY score DESC, doc_id) AS LONG) AS tier
        FROM qt_docs
        """
    )
    assert got.select(*ref.columns).exceptAll(ref).count() == 0
    assert ref.exceptAll(got.select(*ref.columns)).count() == 0
    with pytest.raises(ValueError):
        quality_tiers(df, 0, [F.col("doc_id").asc()])


def test_quality_tiers_empty_input(spark):
    from vicinity_spark.operators.sampling import quality_tiers

    df = spark.range(0).select(F.col("id").alias("doc_id"))
    out = quality_tiers(df, 4, [F.col("doc_id").asc()])
    assert out.count() == 0


def test_global_rank_is_permutation_above_sampler_threshold(spark):
    """Regression: repartitionByRange samples boundaries with a
    per-execution seed, so the offsets collect and the final read
    could see different row placements (duplicate + gapped ranks).
    30k rows / 4 ranges is far above the sampler's exact threshold
    (~100 rows/partition), where the bug reproduced before the
    localCheckpoint fix."""
    from vicinity_spark.operators.sampling import global_rank

    n = 30_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), ((F.col("id") * 37) % 101).alias("score")
    )
    got = global_rank(df, [F.col("score").desc(), F.col("doc_id").asc()])
    stats = got.agg(
        F.count("*").alias("c"),
        F.countDistinct("rank").alias("d"),
        F.min("rank").alias("mn"),
        F.max("rank").alias("mx"),
    ).collect()[0]
    assert (stats.c, stats.d, stats.mn, stats.mx) == (n, n, 1, n), stats


def _dsir_docs(spark):
    # target domain speaks "alpha beta gamma"; off-domain speaks
    # "zeta eta theta"; mixed docs sit between
    rows = [
        (0, "alpha beta gamma alpha beta", "t"),   # pure target
        (1, "alpha beta gamma gamma alpha", "t"),  # pure target
        (2, "zeta eta theta zeta eta", "r"),       # pure off-domain
        (3, "alpha zeta beta eta gamma", "r"),     # mixed
        (4, "alpha beta gamma beta gamma", "r"),   # target-like raw doc
        (5, "theta theta zeta eta zeta", "r"),     # pure off-domain
        (6, None, "r"),                            # NULL text
        (7, "", "r"),                              # empty text
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, grp string")


def test_dsir_weights_ranks_target_like_docs_higher(spark):
    from vicinity_spark.operators.sampling import dsir_weights

    docs = _dsir_docs(spark)
    raw = docs.where(F.col("grp") == "r").drop("grp")
    target = docs.where(F.col("grp") == "t").drop("grp")
    w = {r["doc_id"]: r for r in dsir_weights(raw, target, features="unigram").collect()}
    assert set(w) == {2, 3, 4, 5, 6, 7}
    # empty/NULL docs: n_tokens 0, llr NULL
    assert w[6]["n_tokens"] == 0 and w[6]["llr"] is None
    assert w[7]["n_tokens"] == 0 and w[7]["llr"] is None
    # target-like raw doc scores strictly above mixed above off-domain
    assert w[4]["llr"] > w[3]["llr"] > w[2]["llr"]
    assert w[4]["llr"] > 0  # reads like the target
    assert w[2]["llr"] < 0 and w[5]["llr"] < 0  # off-domain


def test_dsir_weights_matches_numpy_reference(spark):
    import math
    from collections import Counter

    from vicinity_spark.operators.sampling import dsir_weights

    docs = _dsir_docs(spark)
    raw_rows = [(i, t) for i, t, g in docs.collect() if g == "r" and t]
    tgt_rows = [(i, t) for i, t, g in docs.collect() if g == "t"]

    def lm(rows, alpha=1.0):
        c = Counter(tok for _, t in rows for tok in t.lower().split() if tok)
        n, v = sum(c.values()), len(c)
        lp = {k: math.log((x + alpha) / (n + alpha * (v + 1))) for k, x in c.items()}
        return lp, math.log(alpha / (n + alpha * (v + 1)))

    lp_t, unk_t = lm(tgt_rows)
    lp_r, _ = lm(raw_rows)
    expect = {
        i: round(sum(lp_t.get(tok, unk_t) - lp_r[tok] for tok in t.lower().split() if tok), 6)
        for i, t in raw_rows
    }
    raw = docs.where(F.col("grp") == "r").drop("grp")
    target = docs.where(F.col("grp") == "t").drop("grp")
    got = {r["doc_id"]: r["llr"] for r in dsir_weights(raw, target, features="unigram").collect() if r["llr"] is not None}
    assert got == pytest.approx(expect, abs=2e-6)


@pytest.mark.slow
def test_dsir_select_and_sample(spark):
    from vicinity_spark.operators.sampling import dsir_sample, dsir_select

    docs = _dsir_docs(spark)
    raw = docs.where(F.col("grp") == "r").drop("grp")
    target = docs.where(F.col("grp") == "t").drop("grp")
    # head selection: k=2 takes the two most target-like docs
    head = [
        r["doc_id"]
        for r in dsir_select(raw, target, k=2, features="unigram").collect()
    ]
    assert head == [4, 3]
    # k > n returns all scored (non-NULL-llr) docs — on the 'auto'
    # (hashed_ngram) production default: count is feature-model-stable
    assert dsir_select(raw, target, k=100).count() == 4
    # sampled variant: deterministic for a fixed salt, k rows, scored docs only
    s1 = sorted(r["doc_id"] for r in dsir_sample(raw, target, k=3, salt="a").collect())
    s2 = sorted(r["doc_id"] for r in dsir_sample(raw, target, k=3, salt="a").collect())
    assert s1 == s2 and len(s1) == 3
    assert set(s1) <= {2, 3, 4, 5}
    with pytest.raises(ValueError):
        dsir_select(raw, target, k=0)
    with pytest.raises(ValueError):
        dsir_sample(raw, target, k=-1)


@pytest.mark.slow
def test_dsir_sample_tracks_weights(spark):
    """Over many salts, the Gumbel-top-k sample includes high-llr docs
    more often than low-llr docs — inclusion tracks exp(llr)."""
    from collections import Counter

    from vicinity_spark.operators.sampling import dsir_sample

    docs = _dsir_docs(spark)
    raw = docs.where(F.col("grp") == "r").drop("grp")
    target = docs.where(F.col("grp") == "t").drop("grp")
    hits = Counter()
    for i in range(12):
        for r in dsir_sample(raw, target, k=2, salt=f"s{i}", features="unigram").collect():
            hits[r["doc_id"]] += 1
    # doc 4 (most target-like, llr >> others) must dominate inclusion
    assert hits[4] >= hits[2] and hits[4] >= hits[5]
    assert hits[4] >= 9  # included in nearly every draw at k=2 of 4


@pytest.mark.slow
def test_hashed_gram_stream_and_dsir_hashed_features(spark):
    """hashed_gram_stream = md5-hex-prefix buckets of every uni+bigram
    (non-distinct, order-seen counts), and dsir_weights over it matches
    a closed-form numpy replay. Also pins the F.transform arity trap:
    a two-arg lambda would have bound the index column over the gram
    length (caught live — bigram hashes silently equaled unigrams)."""
    import hashlib
    import math
    from collections import Counter

    from vicinity_spark.operators.sampling import dsir_weights, hashed_gram_stream

    docs = _dsir_docs(spark)

    def py_feats(text):
        toks = [t for t in text.lower().split(" ") if t]
        g = [hashlib.md5(t.encode()).hexdigest()[:3] for t in toks]
        g += [
            hashlib.md5((toks[i] + " " + toks[i + 1]).encode()).hexdigest()[:3]
            for i in range(len(toks) - 1)
        ]
        return g

    got = {}
    for r in hashed_gram_stream(docs.drop("grp")).collect():
        got.setdefault(r["doc_id"], []).append(r["tok"])
    for i, t, _g in docs.collect():
        want = py_feats(t) if t else []
        assert sorted(got.get(i, [])) == sorted(want), f"doc {i}"

    raw = docs.where(F.col("grp") == "r").drop("grp")
    target = docs.where(F.col("grp") == "t").drop("grp")

    def lm(rows, alpha=1.0):
        c = Counter(g for _, t in rows for g in py_feats(t))
        n, v = sum(c.values()), len(c)
        lp = {k: math.log((x + alpha) / (n + alpha * (v + 1))) for k, x in c.items()}
        return lp, math.log(alpha / (n + alpha * (v + 1)))

    raw_rows = [(i, t) for i, t, g in docs.collect() if g == "r" and t]
    tgt_rows = [(i, t) for i, t, g in docs.collect() if g == "t"]
    lp_t, unk_t = lm(tgt_rows)
    lp_r, _ = lm(raw_rows)
    expect = {
        i: round(sum(lp_t.get(g, unk_t) - lp_r[g] for g in py_feats(t)), 6)
        for i, t in raw_rows
    }
    w = {
        r["doc_id"]: r["llr"]
        for r in dsir_weights(raw, target, features="hashed_ngram").collect()
        if r["llr"] is not None
    }
    assert w == pytest.approx(expect, abs=2e-6)
    # n_tokens counts FEATURES: 2L-1 for an L-token doc
    nt = {
        r["doc_id"]: r["n_tokens"]
        for r in dsir_weights(raw, target, features="hashed_ngram").collect()
    }
    assert nt[2] == 2 * 5 - 1 and nt[6] == 0 and nt[7] == 0
    with pytest.raises(ValueError):
        dsir_weights(raw, target, features="trigram-soup")
    with pytest.raises(ValueError):
        hashed_gram_stream(docs, max_n=0)


def test_dsir_auto_default_is_hashed_ngram(spark):
    """r9 (VERDICT item 4): features='auto' — the production default —
    resolves to the paper's hashed uni+bigram model (the only one whose
    LM tables provably broadcast at any corpus size); explicit names
    pass through, and the default-call result is value-identical to an
    explicit features='hashed_ngram' call."""
    from vicinity_spark.operators.sampling import dsir_weights, resolve_dsir_features

    assert resolve_dsir_features("auto") == "hashed_ngram"
    assert resolve_dsir_features("unigram") == "unigram"
    assert resolve_dsir_features("hashed_ngram") == "hashed_ngram"
    docs = _dsir_docs(spark)
    raw = docs.where(F.col("grp") == "r").drop("grp")
    target = docs.where(F.col("grp") == "t").drop("grp")
    auto = {tuple(r) for r in dsir_weights(raw, target).collect()}
    hashed = {
        tuple(r)
        for r in dsir_weights(raw, target, features="hashed_ngram").collect()
    }
    assert auto == hashed


def test_dsir_from_lms_requires_unk_floor(spark):
    """ADVICE r8: an LM table without (or with a duplicated) '__unk__'
    floor row raises at call time instead of silently zeroing every
    scored doc via the empty unk crossJoin."""
    from vicinity_spark.operators.sampling import dsir_weights_from_lms
    from vicinity_spark.operators.textops import fit_unigram_lm

    docs = _dsir_docs(spark).where(F.col("text").isNotNull()).drop("grp")
    lm = fit_unigram_lm(docs).cache()
    no_unk = lm.where(F.col("tok") != "__unk__")
    with pytest.raises(ValueError, match="lm_raw.*__unk__"):
        dsir_weights_from_lms(docs, no_unk, lm, features="unigram")
    with pytest.raises(ValueError, match="lm_target.*__unk__"):
        dsir_weights_from_lms(docs, lm, no_unk, features="unigram")
    doubled = lm.unionAll(lm.where(F.col("tok") == "__unk__"))
    with pytest.raises(ValueError, match="more than one"):
        dsir_weights_from_lms(docs, doubled, lm, features="unigram")
    # validate=False skips the eager check (per-micro-batch callers)
    dsir_weights_from_lms(docs, lm, lm, features="unigram", validate=False)


def test_dsir_hashed_inline_lm_equals_join_plan(spark):
    """r14 optimization: the hashed_ngram in-row scorer (LM tables
    collected into a constant-folded per-bucket delta array) is
    row-identical to the generic explode + broadcast-join +
    groupBy(doc_id) plan — including zero-token docs (n_tokens=0,
    llr NULL) — and its scoring plan carries NO Exchange (one
    whole-stage projection; the join plan shuffles the per-doc
    aggregation)."""
    from vicinity_spark.operators.sampling import (
        dsir_weights_from_lms,
        hashed_gram_stream,
    )
    from vicinity_spark.operators.textops import fit_unigram_lm

    docs = _dsir_docs(spark).where(F.col("text").isNotNull()).drop("grp")
    lm_r = fit_unigram_lm(docs, token_stream=hashed_gram_stream(docs)).cache()
    lm_t = fit_unigram_lm(
        docs.where(F.col("doc_id") < 3),
        token_stream=hashed_gram_stream(docs.where(F.col("doc_id") < 3)),
    ).cache()
    lm_r.count(), lm_t.count()
    new = dsir_weights_from_lms(docs, lm_r, lm_t, features="hashed_ngram")
    old = dsir_weights_from_lms(
        docs, lm_r, lm_t, features="hashed_ngram", inline_lm=False
    )
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, old.collect()))
    plan = new._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_hashed_delta_literals_null_unk_falls_back(spark):
    """r15 (r14 ADVICE): a NULL-logp '__unk__' floor row (reachable
    with validate=False) must read as 'not the capped shape' — return
    None so dsir_weights_from_lms keeps the generic join plan — rather
    than raising TypeError at plan-build time."""
    from vicinity_spark.operators.sampling import _hashed_delta_literals

    good = spark.createDataFrame(
        [("00a", -1.0), ("__unk__", -9.0)], "tok string, logp double"
    )
    bad = spark.createDataFrame(
        [("00a", -1.0), ("__unk__", None)], "tok string, logp double"
    )
    assert _hashed_delta_literals(bad, good) is None
    assert _hashed_delta_literals(good, bad) is None
    assert _hashed_delta_literals(good, good) is not None
