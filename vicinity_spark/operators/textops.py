"""Text-analysis operators for training-data pipelines (★ north-star):
token statistics, quality scoring, language ID, fingerprinting.

All pure built-in-function DataFrame programs (split/array/md5) — no
Python UDFs anywhere, so they run fully inside whole-stage codegen and
scale linearly with the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EN_STOPWORDS = ("the", "a", "of", "and", "to")
# shared filter thresholds (single source: the batch scorers AND the
# streaming predicate columns below consume these)
QUALITY_MIN_TOKENS = 20
QUALITY_MIN_TTR = 0.3
LANG_EN_MIN_RATIO = 0.05


def _toks(text_col: str):
    return F.split(F.lower(text_col), " ")


def clean_toks(text_col: str) -> Column:
    """Lowercased whitespace tokens with empties dropped, as an IN-ROW
    array expression — the ONE canonical tokenization every operator
    family (textops LMs, retrieval, and the exploded dedup.tokens
    form) and every DuckDB oracle must agree on: split(lower(text),
    ' ') then tok <> ''. Cross-engine gate correctness rides on all
    call sites sharing this definition — import it, don't re-derive
    it."""
    return F.filter(_toks(text_col), lambda t: t != "")


def _en_hits_expr(text_col: str) -> Column:
    """Stopword-hit count as ONE fold over the in-row token array."""
    return F.aggregate(
        _toks(text_col),
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.when(t.isin(*EN_STOPWORDS), F.lit(1)).otherwise(F.lit(0)).cast("long"),
    )


def quality_pass_col(text_col: str = "text") -> Column:
    """quality_scores' pass predicate as a single Column — the shared
    building block for batch scoring and streaming filters."""
    toks = _toks(text_col)
    nt = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / nt.cast("double")
    return (nt >= QUALITY_MIN_TOKENS) & (ttr >= QUALITY_MIN_TTR)


def predicted_lang_col(text_col: str = "text") -> Column:
    """langid_scores_rowwise's predicted_lang as a single Column."""
    return F.when(
        _en_hits_expr(text_col).cast("double") / F.size(_toks(text_col)).cast("double")
        >= LANG_EN_MIN_RATIO,
        "en",
    ).otherwise("unknown")


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_unique, n_chars_actual)."""
    toks = _toks(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
        F.length(text_col).cast("long").alias("n_chars_actual"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, ttr, avg_token_span, quality_pass) — type-token ratio +
    length heuristics (C4/Gopher-style filter family)."""
    toks = _toks(text_col)
    s = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("nt"),
        F.size(F.array_distinct(toks)).alias("nu"),
        F.length(text_col).alias("nc"),
    )
    ttr = F.col("nu").cast("double") / F.col("nt").cast("double")
    return s.select(
        "doc_id",
        F.round(ttr, 6).alias("ttr"),
        F.round(F.col("nc").cast("double") / F.col("nt").cast("double"), 6).alias(
            "avg_token_span"
        ),
        F.when((F.col("nt") >= QUALITY_MIN_TOKENS) & (ttr >= QUALITY_MIN_TTR), 1)
        .otherwise(0)
        .cast("long")
        .alias("quality_pass"),
    )


def langid_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, en_hits, predicted_lang) — stopword-hit language ID."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_toks(text_col)).alias("tok"),
    )
    scores = toks.groupBy("doc_id").agg(
        F.sum(F.when(F.col("tok").isin(*EN_STOPWORDS), 1).otherwise(0))
        .cast("long")
        .alias("en_hits"),
        F.count("*").cast("long").alias("nt"),
    )
    return scores.select(
        "doc_id",
        "en_hits",
        F.when(
            F.col("en_hits").cast("double") / F.col("nt").cast("double")
            >= LANG_EN_MIN_RATIO,
            "en",
        )
        .otherwise("unknown")
        .alias("predicted_lang"),
    )


def langid_scores_rowwise(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, en_hits, predicted_lang) — the zero-shuffle language-ID
    (r6): stopword hits counted by ONE `aggregate` fold over the in-row
    token array instead of explode + groupBy. Integer sums, so exactly
    row-identical to langid_scores (test-pinned) — and being a pure
    projection, it composes into streaming pipelines with no
    aggregation state (streaming/clean.py)."""
    # NULL text → no row, matching the exploded form (explode of a
    # NULL token array emits nothing)
    base = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        _en_hits_expr(text_col).alias("en_hits"),
        F.size(_toks(text_col)).cast("long").alias("nt"),
    )
    return base.select(
        "doc_id",
        "en_hits",
        F.when(
            F.col("en_hits").cast("double") / F.col("nt").cast("double")
            >= LANG_EN_MIN_RATIO,
            "en",
        )
        .otherwise("unknown")
        .alias("predicted_lang"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fingerprint) — md5 over the sorted distinct token set:
    an order-insensitive content signature."""
    toks = F.array_sort(F.array_distinct(_toks(text_col)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.concat_ws(" ", toks).cast("binary")).alias("fingerprint"),
    )


# BPE-ish pre-tokenization classes: letter runs, digit runs, punctuation
# runs, each absorbing one leading space — the GPT-2 pre-tokenizer shape
# restricted to constructs shared by Java regex and RE2 (no lookahead),
# so the same pattern runs in Spark and any RE2-based SQL engine.
SUBWORD_PATTERN = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


def subword_token_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_subword_tokens, chars_per_token) — LLM-token-count
    estimate via BPE-style pre-tokenization (pure regexp built-ins; the
    ratio is the standard compression/quality signal of a corpus)."""
    n = F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(SUBWORD_PATTERN), F.lit(0)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_subword_tokens"),
        F.round(
            F.when(n > 0, F.length(text_col).cast("double") / n.cast("double")).otherwise(0.0), 6
        ).alias("chars_per_token"),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_ranges: int = 0,
) -> DataFrame:
    """Padding-free sequence packing for LLM training pipelines (r7):
    conceptually concatenate every document's tokens in id order and
    chunk the stream into fixed ``seq_len`` sequences — the standard
    "concat then chunk" packing. Returns the per-doc packing
    coordinates (everything a writer needs to place the doc):

      (doc_id, n_tokens, start, first_seq, last_seq, seq_offset)

    with `start` the doc's position in the global token stream,
    `first_seq`/`last_seq` the sequence ids it lands in (a doc may
    straddle sequences — that IS padding-free packing), and
    `seq_offset` its offset inside first_seq. Token counting matches
    token_stats (whitespace tokens, lower()).

    Scale plan — the global ordered prefix sum WITHOUT a
    single-partition window: range-repartition by doc_id, windowed
    cumsum WITHIN each range partition, then the per-partition totals
    (one row per partition — collected to the driver, never data
    rows) are prefix-summed and added back as broadcast offsets. The
    only data shuffle is the range partitioning itself, which any
    global ordering requires; the result is partitioning-invariant
    (same coordinates for any num_ranges — pinned by test)."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    spark = docs.sparkSession
    if num_ranges <= 0:
        num_ranges = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        # NULL text = a zero-width doc (contributes nothing to the
        # token stream but still gets coordinates) — without the
        # coalesce a NULL partition total reaches the driver-side
        # offset fold as None and crashes the whole pack
        F.coalesce(F.size(_toks(text_col)), F.lit(0)).cast("long").alias("n_tokens"),
    )
    d = d.repartitionByRange(num_ranges, "doc_id").withColumn(
        "__pid", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid").orderBy("doc_id")
    # materialize ONE range partitioning before the totals collect —
    # range boundaries are sampled per-execution (seed includes the
    # fresh RDD id), so without this the broadcast offsets can be
    # computed against a different row placement than the final read
    # uses once partitions exceed the sampler's exact threshold
    # (sampling.py _global_rank_with_total has the measured failure)
    d = d.withColumn("__cum", F.sum("n_tokens").over(w)).localCheckpoint(eager=True)
    # one row per RANGE PARTITION (≤ num_ranges) — a metadata-sized
    # driver collect, not a data collect; range ids are ordered by key
    totals = {r["__pid"]: r["tot"] for r in
              d.groupBy("__pid").agg(F.sum("n_tokens").alias("tot")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    off = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in sorted(offsets)]),
            F.array(*[F.lit(offsets[p]) for p in sorted(offsets)]),
        ),
        F.col("__pid"),
    )
    return d.withColumn("start", F.col("__cum") - F.col("n_tokens") + off).select(
        "doc_id",
        "n_tokens",
        "start",
        F.expr(f"start div {seq_len}").alias("first_seq"),
        # greatest(n_tokens, 1) keeps last_seq >= first_seq for
        # zero-width (NULL-text) docs sitting exactly on a boundary
        F.expr(f"(start + greatest(n_tokens, 1) - 1) div {seq_len}").alias("last_seq"),
        F.expr(f"start % {seq_len}").alias("seq_offset"),
    )


def pack_summary(packed: DataFrame, seq_len: int) -> DataFrame:
    """One-row packing audit over pack_sequences output: total tokens,
    number of full sequences produced, tokens lost in the final
    partial sequence (the ONLY padding in concat-then-chunk packing),
    and the straddling-doc count."""
    return packed.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count("*").cast("long").alias("n_docs"),
        F.ceil(F.sum("n_tokens") / F.lit(seq_len)).cast("long").alias("n_sequences"),
        (
            (F.ceil(F.sum("n_tokens") / F.lit(seq_len)) * F.lit(seq_len))
            - F.sum("n_tokens")
        ).cast("long").alias("tail_padding"),
        F.sum(
            F.when(F.col("last_seq") > F.col("first_seq"), 1).otherwise(0)
        ).cast("long").alias("n_straddling"),
    )


def repetition_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals (r7), per doc:

      - dup_token_frac: 1 − distinct/total tokens — the fraction of
        token mass that is repetition.
      - dup_2gram_frac / dup_3gram_frac: same over word 2-/3-grams
        (the 'duplicate n-gram fraction' family of the Gopher rules).
      - top_token_frac: frequency of the single most frequent token
        over total tokens (boilerplate/keyword-stuffing detector).

    All four are pure per-row fold/array expressions — a projection,
    no shuffle at any corpus size. Empty docs (no non-empty tokens)
    score 0.0 everywhere. A pretraining filter drops docs above
    thresholds (Gopher: dup-line/2-gram/3-gram fractions; the exact
    cutoffs are a policy knob, not part of this operator)."""
    toks = clean_toks(text_col)
    nt = F.size(toks)

    def dup_frac(arr):
        n = F.size(arr)
        return F.when(
            n > 0,
            F.round(
                1.0 - F.size(F.array_distinct(arr)).cast("double") / n.cast("double"), 6
            ),
        ).otherwise(F.lit(0.0))

    def grams(k):
        return F.when(
            nt >= k,
            F.transform(
                F.sequence(F.lit(1), nt - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    # top-token frequency via one fold over the distinct tokens:
    # count occurrences of each distinct token with another fold —
    # O(distinct × total) per row, bounded by doc length; stays JVM
    top_cnt = F.aggregate(
        F.array_distinct(toks),
        F.lit(0).cast("long"),
        lambda best, t: F.greatest(
            best,
            F.aggregate(
                toks,
                F.lit(0).cast("long"),
                lambda acc, u: acc + F.when(u == t, 1).otherwise(0).cast("long"),
            ),
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        nt.cast("long").alias("n_tokens"),
        dup_frac(toks).alias("dup_token_frac"),
        dup_frac(grams(2)).alias("dup_2gram_frac"),
        dup_frac(grams(3)).alias("dup_3gram_frac"),
        F.when(nt > 0, F.round(top_cnt.cast("double") / nt.cast("double"), 6))
        .otherwise(F.lit(0.0))
        .alias("top_token_frac"),
    )


# ---- unigram-LM quality scoring (r8) ---------------------------------


def unigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    lm: "DataFrame | None" = None,
) -> DataFrame:
    """(doc_id, n_tokens, xent) — per-doc cross-entropy (nats/token)
    under an add-α-smoothed UNIGRAM language model: the CCNet-style
    "perplexity against a reference corpus" quality filter with the
    unigram approximation (no external LM library; KenLM plugs into
    the same shape by swapping the `lm` table). Lower = more typical
    text; curation keeps the low/middle buckets and routes the high
    tail (gibberish) and the very low tail (boilerplate) to review.

    ``lm``: pass a (tok, logp) table to score against a REFERENCE
    corpus (the standard setup — score the crawl against Wikipedia);
    default fits on `docs` itself. Fit with ``fit_unigram_lm``.
    Tokens unseen by a supplied lm score at the smoothed floor
    recorded in its ``__unk__`` row.

    Scale: the LM fit is one map-side-combined groupBy (vocab-bounded);
    scoring joins the token stream on `tok` — a hot stopword is fine
    (join, not explosion) and AQE broadcasts small vocabularies. The
    per-doc sum is a double; output rounds to 1e-6, well above
    cross-engine summation-order noise at document magnitudes."""
    from vicinity_spark.operators.dedup import tokens

    t = tokens(docs, text_col, id_col)
    if lm is None:
        lm = fit_unigram_lm(docs, text_col=text_col, id_col=id_col, alpha=alpha)
    else:
        # a supplied table missing its '__unk__' floor row would empty
        # the unk crossJoin and silently NULL every score — fail loudly
        # (same r8-ADVICE hazard the DSIR and streaming paths guard)
        from vicinity_spark.operators.sampling import _require_unk

        _require_unk(lm, "lm")
    unk = lm.where(F.col("tok") == "__unk__").select(
        F.col("logp").alias("__unk_lp")
    )
    scored = (
        t.join(lm.where(F.col("tok") != "__unk__"), "tok", "left")
        .crossJoin(F.broadcast(unk))
        .select("doc_id", F.coalesce("logp", F.col("__unk_lp")).alias("logp"))
    )
    per = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"), F.sum("logp").alias("__s")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(-F.col("__s") / F.col("n_tokens"), 6),
            ).alias("xent"),
        )
    )


def fit_unigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    token_stream: "DataFrame | None" = None,
) -> DataFrame:
    """(tok, logp) add-α unigram LM over `docs`, plus an ``__unk__``
    row carrying the unseen-token floor log(α / (N + α·(V+1))) — the
    +1 reserves the unk type itself. Pure aggregation: one groupBy
    (vocab-bounded, map-side combined) and a broadcast one-row total.

    ``token_stream``: fit over a prebuilt (doc_id, tok) frame instead
    of the default whitespace tokenization — the hook DSIR's hashed
    n-gram feature buckets plug into (sampling.hashed_gram_stream);
    "unigram" then means one LM event per stream row."""
    from vicinity_spark.operators.dedup import tokens

    if token_stream is None:
        token_stream = tokens(docs, text_col, id_col)
    # materialize the vocab-bounded frequency table ONCE (r9): the lm
    # rows, the totals, and the __unk__ row all read `tf`, and Spark
    # does not reuse the groupBy exchange across those branches — one
    # fit action was measured running the FULL corpus feature stream
    # 3× at the 2M tier (~34s/pass for the hashed-gram model;
    # BENCHNOTES r9 "dsir_hashed pricing"). The checkpoint is ≤ vocab
    # rows (4096 for hashed buckets) and makes the fit one stream pass.
    # (localCheckpoint blocks live on executors: under executor churn /
    # dynamic deallocation a consumer can hit missing-block errors —
    # re-run the fit, or persist(DISK_ONLY) on such clusters.)
    tf = (
        token_stream.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=True)
    )
    tot = tf.agg(
        F.sum("__c").cast("double").alias("__n"),
        F.count(F.lit(1)).cast("double").alias("__v"),
    )
    denom = F.col("__n") + F.lit(alpha) * (F.col("__v") + 1.0)
    with_tot = tf.crossJoin(F.broadcast(tot))
    lm = with_tot.select(
        "tok", F.log((F.col("__c") + F.lit(alpha)) / denom).alias("logp")
    )
    unk = tot.select(
        F.lit("__unk__").alias("tok"), F.log(F.lit(alpha) / denom).alias("logp")
    )
    return lm.unionByName(unk)


def _bigram_stream(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, w1, w2) — one row per consecutive token pair, built
    IN-ROW (zip of toks[:-1] with toks[1:] via a transform over
    positions) then exploded: one corpus pass, no position self-join."""
    toks = clean_toks(text_col)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"),
            F.element_at(toks, i + 1).alias("w2"),
        ),
    )
    # guard BEFORE the sequence evaluates: sequence(1, n-1) DESCENDS
    # for n < 2 ([1, 0]) and element_at(toks, 0) is a runtime error
    return (
        docs.where(F.size(toks) >= 2)
        .select(F.col(id_col).alias("doc_id"), F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def fit_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bigrams: "int | None" = None,
) -> DataFrame:
    """(w1, w2, logp) maximum-likelihood conditional bigram table:
    logp = ln(c(w1,w2) / c(w1·)) with c(w1·) the bigram-event marginal
    (the last token of a doc starts no bigram). No smoothing — unseen
    bigrams are the backoff path's job (``bigram_logprob``), which is
    the stupid-backoff contract (Brants et al.: S(w2|w1) = ML if seen,
    else λ·S(w2)).

    ``max_bigrams`` caps the table to the top-N bigrams by
    (count desc, w1 asc, w2 asc) — deterministic, so an external
    replay selects the identical rows. A capped table stays
    broadcastable at ANY corpus size; dropped bigrams simply score
    through the backoff, degrading the score smoothly rather than the
    plan. Conditionals are computed against the FULL marginal before
    the cap, so retained rows keep their true ML values.

    Scale: one corpus pass (in-row pair zip) into one
    map-side-combined groupBy; the marginal is a second aggregate of
    the same bounded frequency table, not of the corpus."""
    bg = _bigram_stream(docs, text_col, id_col)
    cnt = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c"))
    if max_bigrams is not None:
        # the DISTINCT-bigram table is NOT vocab²-bounded in practice
        # but it can be corpus-sized in the worst case — the cap must
        # therefore be a distributed top-N (orderBy+limit plans as
        # TakeOrderedAndProject: per-partition top-N, one driver
        # merge of N rows), NEVER a global row_number window (that
        # would funnel the whole count table through one partition —
        # the exact single-partition sort the 100 TB posture forbids).
        # The (count desc, w1, w2) order is total, so the kept set is
        # deterministic and externally replayable.
        cnt_kept = cnt.orderBy(
            F.col("__c").desc(), F.col("w1").asc(), F.col("w2").asc()
        ).limit(max_bigrams)
    else:
        cnt_kept = cnt
    # the marginal aggregates the PAIR STREAM directly (vocab-bounded,
    # map-side combined) rather than re-reading `cnt`: the
    # distinct-bigram table is corpus-scale in the worst case, so
    # neither pinning it with localCheckpoint (executor-storage
    # residency ∝ corpus — the fit_unigram_lm trick does NOT transfer,
    # its tf table is vocab-bounded) nor recomputing its shuffle for a
    # second consumer is the right trade; a second stream pass with a
    # tiny shuffle is
    marg = bg.groupBy("w1").agg(F.count(F.lit(1)).cast("double").alias("__m"))
    return cnt_kept.join(marg, "w1").select(
        "w1", "w2", F.log(F.col("__c") / F.col("__m")).alias("logp")
    )


def bigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lm_bi: "DataFrame | None" = None,
    lm_uni: "DataFrame | None" = None,
    backoff: float = 0.4,
    alpha: float = 1.0,
    max_bigrams: "int | None" = None,
) -> DataFrame:
    """(doc_id, n_tokens, xent) — per-doc cross-entropy (nats/token)
    under a BIGRAM model with stupid backoff: the first token scores
    p_uni(t1); token i>1 scores p(t_i|t_{i-1}) from ``lm_bi`` when the
    pair is in the table, else ``backoff`` · p_uni(t_i) with the
    add-α unigram (unseen unigrams at its ``__unk__`` floor). One LM
    event per token, so xent is comparable with ``unigram_logprob``
    (a bigram model should score typical text LOWER — it conditions).

    ``lm_bi`` / ``lm_uni``: pass fitted tables to score against a
    reference corpus (fit with ``fit_bigram_lm`` / ``fit_unigram_lm``);
    defaults fit on ``docs`` itself. Both tables are bounded
    (max_bigrams / vocab) — broadcast-scale at any corpus size.

    Scale: one corpus pass builds the (prev, tok) event stream in-row;
    the two LM joins are plain equi-joins against bounded tables (AQE
    broadcasts them); the per-doc sum rounds to 1e-6 like every LM
    scorer here."""
    if lm_uni is None:
        lm_uni = fit_unigram_lm(docs, text_col=text_col, id_col=id_col, alpha=alpha)
    else:
        # a supplied unigram table without its '__unk__' floor row
        # empties the unk crossJoin → xent NULL for every doc; the
        # streaming twin validates at build time, so must the batch one
        from vicinity_spark.operators.sampling import _require_unk

        _require_unk(lm_uni, "lm_uni")
    if lm_bi is None:
        lm_bi = fit_bigram_lm(
            docs, text_col=text_col, id_col=id_col, max_bigrams=max_bigrams
        )
    toks = clean_toks(text_col)
    ev = F.transform(
        F.sequence(F.lit(1), F.size(toks)),
        lambda i: F.struct(
            F.when(i > 1, F.element_at(toks, i - 1)).alias("w1"),
            F.element_at(toks, i).alias("w"),
        ),
    )
    events = (
        # zero-token docs skip the event stream (sequence(1, 0)
        # descends; element_at(toks, 0) errors) and re-enter through
        # the final left join with n_tokens=0 / xent NULL
        docs.where(F.size(toks) >= 1)
        .select(F.col(id_col).alias("doc_id"), F.explode(ev).alias("e"))
        .select("doc_id", F.col("e.w1").alias("w1"), F.col("e.w").alias("tok"))
    )
    unk = lm_uni.where(F.col("tok") == "__unk__").select(
        F.col("logp").alias("__unk_lp")
    )
    uni = lm_uni.where(F.col("tok") != "__unk__").select(
        "tok", F.col("logp").alias("__uni_lp")
    )
    bi = lm_bi.select("w1", F.col("w2").alias("tok"), F.col("logp").alias("__bi_lp"))
    scored = (
        events.join(bi, ["w1", "tok"], "left")
        .join(uni, "tok", "left")
        .crossJoin(F.broadcast(unk))
        .select(
            "doc_id",
            F.when(F.col("__bi_lp").isNotNull(), F.col("__bi_lp"))
            .otherwise(
                F.when(F.col("w1").isNotNull(), F.log(F.lit(backoff))).otherwise(
                    F.lit(0.0)
                )
                + F.coalesce("__uni_lp", F.col("__unk_lp"))
            )
            .alias("logp"),
        )
    )
    per = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"), F.sum("logp").alias("__s")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(-F.col("__s") / F.col("n_tokens"), 6),
            ).alias("xent"),
        )
    )


# ---- trained linear quality classifier (r14) -------------------------
# The heuristic filters above (quality_scores, repetition_scores,
# langid) are fixed rules; production corpus curation (CCNet, FineWeb,
# the fastText quality filters) LEARNS a linear model over exactly
# this kind of feature vector and scores the whole corpus with it.
# Spark-first split: the FIT is Spark ML logistic regression
# (distributed, iterative — certified by closed-form tests, like
# kmeans_centroids); the SCORE is a pure Catalyst projection with the
# dim-5 weight vector inlined as literals — closure-small, replayable
# by a SQL oracle (the preset-centroids discipline), zero UDFs, fully
# inside whole-stage codegen at any corpus size.

#: the classifier's feature vector, in order. A single shared
#: definition (the clean_toks rule): every consumer — fit, score, and
#: the DuckDB oracle — must agree on it positionally.
QUALITY_CLF_FEATURES = (
    "log1p_tokens",     # ln(1 + n_tokens)
    "ttr",              # type-token ratio
    "chars_per_token",  # length / n_tokens
    "stopword_ratio",   # EN_STOPWORDS hits / n_tokens
    "digit_ratio",      # digit chars / chars
)


def quality_clf_feature_cols(text_col: str = "text") -> "list[Column]":
    """The QUALITY_CLF_FEATURES expressions as in-row Columns (one per
    name, same order). Zero-token docs yield NULL features (guarded
    divisions) and therefore a NULL score — the engine's established
    malformed-row contract."""
    toks = _toks(text_col)
    nt = F.size(toks).cast("double")
    ntz = F.when(nt > 0, nt)  # NULL when empty — poisons the row's score
    nc = F.length(text_col).cast("double")
    ncz = F.when(nc > 0, nc)
    return [
        F.log1p(nt).alias("log1p_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / ntz).alias("ttr"),
        (nc / ntz).alias("chars_per_token"),
        (_en_hits_expr(text_col).cast("double") / ntz).alias("stopword_ratio"),
        (
            F.length(F.regexp_replace(F.col(text_col), "[^0-9]", "")).cast("double")
            / ncz
        ).alias("digit_ratio"),
    ]


def fit_quality_classifier(
    docs: DataFrame,
    label_col: str,
    *,
    text_col: str = "text",
    max_iter: int = 50,
    reg_param: float = 0.0,
) -> "tuple[list[float], float]":
    """(weights, intercept) of a logistic-regression quality classifier
    over QUALITY_CLF_FEATURES, fit distributed via Spark ML on rows
    labeled 0/1 in ``label_col`` (zero-token rows are dropped — their
    features are NULL by contract). The returned model is 6 floats —
    closure-small at any corpus size, so scoring never joins or
    shuffles. Iterative and NOT SQL-replayable (the kmeans_centroids
    posture): pass PRESET weights to `quality_classifier_score` when a
    pipeline must be oracle-replayable."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = docs.select(
        F.col(label_col).cast("double").alias("__label"),
        *quality_clf_feature_cols(text_col),
    ).dropna()
    asm = VectorAssembler(
        inputCols=list(QUALITY_CLF_FEATURES), outputCol="__features"
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol="__label",
        maxIter=int(max_iter),
        regParam=float(reg_param),
        standardization=True,
    )
    model = lr.fit(asm.transform(feats))
    return [float(w) for w in model.coefficients], float(model.intercept)


def quality_classifier_score(
    docs: DataFrame,
    weights,
    intercept: float,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """(doc_id, quality_prob, quality_keep) — sigmoid(w·f + b) over
    QUALITY_CLF_FEATURES with the weights inlined as literals: a
    NARROW whole-stage-codegen projection (no UDF, no join, no
    shuffle), the 100 TB shape for corpus-wide scoring. quality_prob
    is 6-dp rounded (the engine's float-parity discipline);
    zero-token docs carry NULL prob and NULL keep."""
    ws = [float(w) for w in weights]
    if len(ws) != len(QUALITY_CLF_FEATURES):
        raise ValueError(
            f"expected {len(QUALITY_CLF_FEATURES)} weights "
            f"({', '.join(QUALITY_CLF_FEATURES)}), got {len(ws)}"
        )
    feats = quality_clf_feature_cols(text_col)
    z = F.lit(float(intercept))
    for w, fc in zip(ws, feats):
        z = z + F.lit(w) * fc
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(prob, 6).alias("quality_prob"),
        (F.round(prob, 6) >= F.lit(float(threshold))).alias("quality_keep"),
    )
