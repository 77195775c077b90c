"""functions/stats.py — single-pass vector stats used by LSH/SQ builds."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vicinity_spark.functions.stats import vector_stats


def _synth(spark, n=300, dim=512, parts=7):
    cols = F.array(*[F.rand(seed=i) for i in range(dim)])
    return spark.range(0, n, 1, parts).select(
        "id", cols.cast("array<double>").alias("vector")
    )


def test_vector_stats_matches_numpy(spark):
    df = _synth(spark, n=200, dim=32, parts=5).cache()
    X = np.vstack(df.toPandas()["vector"].to_numpy())
    st = vector_stats(df)
    assert st.count == 200
    np.testing.assert_allclose(st.mean, X.mean(axis=0), rtol=1e-12)
    np.testing.assert_array_equal(st.min, X.min(axis=0))
    np.testing.assert_array_equal(st.max, X.max(axis=0))


def test_vector_stats_empty_raises(spark):
    df = _synth(spark, n=10, dim=4).where(F.col("id") < 0)
    with pytest.raises(ValueError):
        vector_stats(df)


def test_lsh_and_sq_build_at_dim_512(spark):
    """Build plans must stay narrow at high dim (no per-dim aggregates)."""
    from vicinity_spark.backends.lsh import LSHStrategy
    from vicinity_spark.backends.sq import SQStrategy
    from vicinity_spark.datatypes import Metric

    df = _synth(spark, n=120, dim=512, parts=4)
    lsh = LSHStrategy(n_tables=2, n_bits=4)
    assert lsh.build(df, Metric.COSINE, 512).count() == 120
    assert len(lsh.params["means"]) == 512
    sq = SQStrategy(refine=2)
    assert sq.build(df, Metric.COSINE, 512).count() == 120
    assert len(sq.params["mins"]) == len(sq.params["scales"]) == 512


def test_langid_rowwise_matches_exploded(spark):
    """r6: the fold-based language ID must be row-identical to the
    explode+groupBy form, including empty-string and no-token edges."""
    from vicinity_spark.operators.textops import langid_scores, langid_scores_rowwise

    docs = spark.createDataFrame(
        [
            (0, "the cat and the dog of a to and the"),
            (1, "palabras sin coincidencias aqui presentes"),
            (2, ""),
            (3, "the"),
            (4, "  "),
            (5, None),  # NULL text: both forms must drop the doc
        ],
        "doc_id long, text string",
    )
    a = {tuple(r) for r in langid_scores(docs).collect()}
    b = {tuple(r) for r in langid_scores_rowwise(docs).collect()}
    assert a == b
    assert not any(r[0] == 5 for r in b)


# ---- unigram-LM quality scoring (r8) ---------------------------------


def test_unigram_logprob_hand_computed(spark):
    """Self-fit add-1 unigram xent on a 2-doc corpus, checked against
    the closed-form values."""
    import math

    from vicinity_spark.operators.textops import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    # counts: a=2 b=2 c=1, N=5, V=3 -> denom = 5 + (3+1) = 9
    lp = {t: math.log((c + 1) / 9.0) for t, c in {"a": 2, "b": 2, "c": 1}.items()}
    want = {
        1: round(-(2 * lp["a"] + lp["b"]) / 3, 6),
        2: round(-(lp["b"] + lp["c"]) / 2, 6),
    }
    got = {r.doc_id: r.xent for r in unigram_logprob(docs).collect()}
    assert got == want


def test_unigram_logprob_reference_lm_and_unk(spark):
    """Scoring against a SUPPLIED reference LM: unseen tokens fall to
    the __unk__ floor; empty docs report n_tokens=0 and NULL xent."""
    import math

    from vicinity_spark.operators.textops import fit_unigram_lm, unigram_logprob

    ref = spark.createDataFrame([(0, "x x y")], "doc_id long, text string")
    lm = fit_unigram_lm(ref)  # x=2 y=1, N=3, V=2 -> denom 6
    target = spark.createDataFrame(
        [(1, "x z"), (2, "")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_tokens, r.xent) for r in unigram_logprob(target, lm=lm).collect()}
    lx, lunk = math.log(3 / 6.0), math.log(1 / 6.0)
    assert got[1] == (2, round(-(lx + lunk) / 2, 6))
    assert got[2] == (0, None)


def test_bigram_logprob_closed_form(spark):
    """r11: stupid-backoff bigram xent vs a direct transcription —
    covers the first-token unigram event, the bigram table hit, the
    backoff path, a single-token doc and an empty doc."""
    import math
    from collections import Counter

    from vicinity_spark.operators.textops import bigram_logprob

    docs = [
        (0, "a b a b c"),
        (1, "a b c"),
        (2, "c a"),
        (3, "x"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.xent) for r in bigram_logprob(df).collect()}

    toks = {i: [w for w in t.split(" ") if w] for i, t in docs}
    bigrams = Counter(
        (ts[i], ts[i + 1]) for ts in toks.values() for i in range(len(ts) - 1)
    )
    marg = Counter()
    for (w1, _), c in bigrams.items():
        marg[w1] += c
    uni = Counter(w for ts in toks.values() for w in ts)
    n, v = sum(uni.values()), len(uni)

    def lp_uni(w):
        return math.log((uni.get(w, 0) + 1) / (n + (v + 1)))

    def lp(w1, w):
        if w1 is None:
            return lp_uni(w)
        if (w1, w) in bigrams:
            return math.log(bigrams[(w1, w)] / marg[w1])
        return math.log(0.4) + lp_uni(w)

    for i, ts in toks.items():
        if not ts:
            assert got[i] == (0, None)
            continue
        s = lp(None, ts[0]) + sum(lp(ts[j - 1], ts[j]) for j in range(1, len(ts)))
        assert got[i] == (len(ts), round(-s / len(ts), 6)), i


@pytest.mark.slow
def test_bigram_lm_cap_deterministic_and_backoff(spark):
    """The top-N cap keeps the (count desc, w1, w2) head; capped-out
    pairs score through the backoff, so a capped model's xent is >=
    the uncapped model's on a doc whose pairs fell out of the table."""
    import math

    from vicinity_spark.operators.textops import bigram_logprob, fit_bigram_lm

    docs = [
        (0, "a b a b a b"),  # (a,b) x3, (b,a) x2 — dominate the head
        (1, "c d"),
        (2, "e f"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    kept = {
        (r.w1, r.w2) for r in fit_bigram_lm(df, max_bigrams=3).collect()
    }
    # counts: (a,b)=3, (b,a)=2, then ties (c,d)=(e,f)=1 break lexically
    assert kept == {("a", "b"), ("b", "a"), ("c", "d")}
    full = {r.doc_id: r.xent for r in bigram_logprob(df).collect()}
    capped = {
        r.doc_id: r.xent for r in bigram_logprob(df, max_bigrams=3).collect()
    }
    assert capped[0] == full[0]  # doc 0's pairs all kept
    assert capped[2] > full[2]  # (e,f) fell out -> backoff penalty
    # reference LM scoring: a bigram table fit elsewhere plugs in
    lm_bi = fit_bigram_lm(df.where("doc_id = 0"))
    got = bigram_logprob(
        df.where("doc_id = 1"), lm_bi=lm_bi
    ).collect()[0]
    assert got.n_tokens == 2 and got.xent is not None


def test_logprob_batch_entry_points_require_unk_floor(spark):
    """r11 ADVICE: a caller-supplied unigram table missing its
    '__unk__' floor row would silently NULL every score through the
    empty unk crossJoin — both batch scorers must fail loudly instead
    (the streaming twin already validates at build time)."""
    import pytest
    from pyspark.sql import functions as F

    from vicinity_spark.operators.textops import (
        bigram_logprob,
        fit_bigram_lm,
        fit_unigram_lm,
        unigram_logprob,
    )

    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "b c")], "doc_id long, text string"
    )
    lm = fit_unigram_lm(docs)
    no_unk = lm.where(F.col("tok") != "__unk__")
    with pytest.raises(ValueError, match="lm.*__unk__"):
        unigram_logprob(docs, lm=no_unk)
    with pytest.raises(ValueError, match="lm_uni.*__unk__"):
        bigram_logprob(docs, lm_uni=no_unk, lm_bi=fit_bigram_lm(docs))
    # valid supplied tables still score
    assert unigram_logprob(docs, lm=lm).count() == 2
    assert bigram_logprob(docs, lm_uni=lm, lm_bi=fit_bigram_lm(docs)).count() == 2


def test_quality_classifier_score_closed_form(spark):
    """r14: quality_classifier_score is sigmoid(w·f + b) over the five
    documented features, replayed here in numpy; a zero-token doc
    yields NULL prob and NULL keep (the malformed-row contract); the
    keep cut compares the ROUNDED prob (oracle boundary agreement)."""
    import math

    from vicinity_spark.operators.textops import (
        EN_STOPWORDS,
        quality_classifier_score,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat of the mat and then the cat left 42 times"),
            (2, "aaa aaa aaa aaa"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    w = [0.5, 2.0, -0.3, 3.0, -5.0]
    b = -1.0
    got = {
        r["doc_id"]: (r["quality_prob"], r["quality_keep"])
        for r in quality_classifier_score(docs, w, b).collect()
    }

    def feats(text):
        toks = [t for t in text.lower().split(" ")]
        nt = len(toks)  # split(' ') semantics: '' -> ['']
        if text == "":
            nt_eff = 1  # split('') -> [''] — one empty token
        nc = len(text)
        if nc == 0:
            return None
        ttr = len(set(toks)) / nt
        sw = sum(1 for t in toks if t in EN_STOPWORDS) / nt
        dg = sum(1 for c in text if c.isdigit()) / nc
        return [math.log1p(nt), ttr, nc / nt, sw, dg]

    for did, text in [(1, "the cat sat of the mat and then the cat left 42 times"),
                      (2, "aaa aaa aaa aaa")]:
        f = feats(text)
        z = b + sum(wi * fi for wi, fi in zip(w, f))
        p = round(1.0 / (1.0 + math.exp(-z)), 6)
        assert abs(got[did][0] - p) < 1e-9, (did, got[did], p)
        assert got[did][1] == (p >= 0.5)
    assert got[3] == (None, None)  # empty text: NULL features poison it
    with pytest.raises(ValueError, match="expected 5 weights"):
        quality_classifier_score(docs, [1.0, 2.0], 0.0)


def test_quality_classifier_fit_separates_planted_rule(spark):
    """r14: the distributed fit learns a planted separable rule —
    digit-heavy short docs labeled 0, wordy stopword-bearing docs
    labeled 1 — and its returned (weights, intercept) reproduce the
    labels through quality_classifier_score at high accuracy. The fit
    is iterative (kmeans posture): certified here, not by an oracle."""
    import numpy as np

    from vicinity_spark.operators.textops import (
        fit_quality_classifier,
        quality_classifier_score,
    )

    rng = np.random.default_rng(7)
    rows = []
    for i in range(120):
        if i % 2:
            n = int(rng.integers(25, 40))
            words = rng.choice(
                ["the", "a", "of", "and", "to", "cat", "dog", "house", "tree"],
                size=n,
            )
            rows.append((i, " ".join(words), 1))
        else:
            n = int(rng.integers(3, 8))
            nums = rng.integers(0, 99999, size=n)
            rows.append((i, " ".join(str(x) for x in nums), 0))
    docs = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w, b = fit_quality_classifier(docs, "label")
    assert len(w) == 5
    scored = quality_classifier_score(docs, w, b)
    acc = (
        scored.join(docs.select("doc_id", "label"), "doc_id")
        .where(
            F.col("quality_keep").cast("int") == F.col("label")
        )
        .count()
    ) / 120.0
    assert acc >= 0.95, acc
    # the scoring plan is a pure narrow projection: no Python stages,
    # no shuffle
    plan = scored._jdf.queryExecution().optimizedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan, plan
