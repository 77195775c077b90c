"""Deterministic dataset splitting for training pipelines.

A train/holdout split at 100 TB must be (a) deterministic — re-running
the pipeline, or re-computing a lost partition under speculation,
must route every row to the same side; (b) engine-portable — the
split a Spark job writes is the split a downstream DuckDB/Trino
validation job reads back. Both rule out `rand()` and engine-native
hash functions (Spark's xxhash64 and DuckDB's hash() disagree).

The split key is md5 over a salted textual id — portable across
engines (the same trick the MinHash dedup family uses,
operators/dedup.py:127) — compared lexicographically against a hex
threshold: md5 hex strings are uniform, so the fraction of keys below
threshold T equals the numeric value of T as a base-16 fraction.
(No reference analog — vicinity has no sampling surface; a
training-data pipeline needs one.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def split_key(id_col, salt: str = "split"):
    """Portable md5 hex split key over a salted id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(F.lit(salt + ":"), c.cast("string")).cast("binary"))


def hex_threshold(fraction: float, digits: int = 8) -> str:
    """Hex string T with P(md5_hex < T) == round(fraction, 16^-digits):
    the base-16 expansion of `fraction` to `digits` places."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    frac, out = fraction, []
    for _ in range(digits):
        frac *= 16
        d = min(int(frac), 15)
        out.append("0123456789abcdef"[d])
        frac -= d
    return "".join(out)


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_fraction: float = 0.9,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Add a deterministic `split` column ('train' / 'holdout'). Pure
    narrow projection — no shuffle, no RNG, stable under retries and
    across engines."""
    key = split_key(id_col, salt)
    t = hex_threshold(train_fraction)
    return df.withColumn(
        split_col, F.when(key < F.lit(t), F.lit("train")).otherwise(F.lit("holdout"))
    )


def stratified_hash_split(
    df: DataFrame,
    strata_col: str,
    fractions: "dict[str, float]",
    default_fraction: float = 0.9,
    id_col: str = "doc_id",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Per-stratum deterministic split: each stratum gets its own
    train fraction (e.g. keep 99% of rare languages, 80% of the
    dominant one). Same md5-key mechanics as hash_split — portable,
    retry-stable, no shuffle."""
    key = split_key(id_col, salt)
    expr = F.lit(hex_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        expr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(hex_threshold(frac))
        ).otherwise(expr)
    return df.withColumn(
        split_col, F.when(key < expr, F.lit("train")).otherwise(F.lit("holdout"))
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    order_by: "list[Column]",
    id_col: str = "doc_id",
    n_buckets: int = 32,
) -> DataFrame:
    """Keep at most `n` rows per group, preferring by `order_by` (ties
    broken by `id_col` — a total order, so the survivor set is unique
    and engine-portable). The per-domain/per-source document cap of
    C4/RefinedWeb-style corpus builds.

    Scale plan — the naive single window over `group_col` sorts every
    row of a group in ONE task, so a hot domain (the exact case the
    cap exists for) becomes a straggler. Two-phase top-N instead:
    phase 1 ranks within (group, bucket) — bucket a deterministic hash
    of the id into `n_buckets` — and keeps ≤ n per bucket, so the hot
    group's sort runs as `n_buckets` parallel tasks; phase 2 ranks the
    ≤ n·n_buckets survivors per group. Output is bucket-count
    invariant (pinned by test): phase 1 can only drop rows that rank
    > n within a SUBSET of their group, which rank > n in the full
    group a fortiori."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    order = list(order_by) + [F.col(id_col).asc()]
    bucket = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_buckets))
    w1 = Window.partitionBy(F.col(group_col), bucket).orderBy(*order)
    pruned = (
        df.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (
        pruned.withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def select_token_budget(
    scored: DataFrame,
    budget_tokens: int,
    score_col: str = "score",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_ranges: int = 0,
) -> DataFrame:
    """Quality-ranked corpus selection under a global token budget:
    order all docs by (`score_col` DESC, `id_col` ASC) and keep the
    prefix whose cumulative token count stays ≤ `budget_tokens` — the
    greedy "best docs until the budget is spent" curation step of a
    training-data build. A doc whose tokens would push the running
    total past the budget is excluded (as is everything ranked below
    it); the kept set is unique given the total order.

    Adds `cum_tokens` (running total INCLUDING the row) to the kept
    rows. Scale plan: the same two-phase global prefix sum as
    pack_sequences (textops.py:176) — range-repartition on the
    ordering key, windowed cumsum within each range, per-partition
    totals (≤ num_ranges rows) cumulated on the driver and added back
    as broadcast offsets. No single-partition window; the only data
    shuffle is the range partitioning any global order requires."""
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    spark = scored.sparkSession
    if num_ranges <= 0:
        num_ranges = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    d = scored.repartitionByRange(
        num_ranges, F.col(score_col).desc(), F.col(id_col).asc()
    ).withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    # materialize ONE range partitioning before the totals collect —
    # range boundaries are sampled per-execution (seed includes the
    # fresh RDD id), so without this the offsets can be computed
    # against a different row placement than the final read uses
    # (see _global_rank_with_total). NULL token counts weigh 0 (SQL
    # sum would skip them row-wise but return a None partition total
    # for an all-NULL partition, crashing the driver-side fold).
    tok0 = F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))
    d = d.withColumn("__cum", F.sum(tok0).over(w)).localCheckpoint(eager=True)
    totals = {
        r["__pid"]: r["tot"]
        for r in d.groupBy("__pid").agg(F.sum(tok0).alias("tot")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    if not offsets:
        return scored.withColumn("cum_tokens", F.lit(None).cast("long")).where(F.lit(False))
    off = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in sorted(offsets)]),
            F.array(*[F.lit(offsets[p]) for p in sorted(offsets)]),
        ),
        F.col("__pid"),
    )
    return (
        d.withColumn("cum_tokens", (F.col("__cum") + off).cast("long"))
        .where(F.col("cum_tokens") <= budget_tokens)
        .drop("__pid", "__cum")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsamp",
    priority_col: str = "priority",
) -> DataFrame:
    """Deterministic weighted sampling without replacement via
    PRIORITY SAMPLING (Duffield–Lund–Thorup): each row gets
    priority = w / u with u a per-row uniform, and the sample is the
    top-k by priority. Inclusion probability is ∝ weight (exactly
    min(1, w/τ) for the k-th priority threshold τ), and the scheme
    supports unbiased subset-sum estimation — the standard pick for
    "sample 1M docs, weighted by length/quality, reproducibly".

    Determinism + engine portability: u is built from md5 bits, NOT
    rand() — u = (h + 1) / 2^52 with h the first 13 hex digits of
    md5(salt:id). h < 2^52 is exactly representable in a double and
    the divisor is a power of two, so u is EXACT in IEEE arithmetic;
    w / u is then a single correctly-rounded division — bit-identical
    in any IEEE-compliant engine (no transcendentals, unlike the
    exponential-race formulation -ln(u)/w whose log can differ by an
    ulp across libms and flip a boundary row).

    Plan: priority is a narrow projection; the global top-k runs as
    Spark's TakeOrdered (per-partition top-k, driver merge of k·P
    rows) — no global sort shuffle at any corpus size."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")).cast("binary")),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 52))
    pri = F.col(weight_col).cast("double") / u
    return (
        df.withColumn(priority_col, pri)
        .orderBy(F.col(priority_col).desc(), F.col(id_col).asc())
        .limit(k)
    )


def mix_sources(
    docs: DataFrame,
    weights: "dict[str, float]",
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Weighted dataset mixing for training pipelines (r7): each
    source's documents appear ``weights[source]`` times in the output
    stream — the "N epochs of source A + M of source B" recipe of
    large-scale LLM data mixes. Non-integer weights are honored
    deterministically: a doc gets floor(w) full repeats plus one more
    iff its salted split key falls below the fractional part (the
    same md5-hex construction as hash_split — no RNG, stable under
    retries, reproducible across engines). Sources absent from
    `weights` are dropped (weight 0).

    Output: (doc_id, source, repeat_idx, order_key) — one row per
    (doc, repeat), with `order_key` an md5 over (salt, doc_id,
    repeat_idx) giving every copy a deterministic pseudo-random
    position in the global training order. Feed `order_key` to
    pack_sequences(id_col="order_key") (after joining text back on
    doc_id) to produce a shuffled, mixed, packed token stream.

    Plan: pure narrow projection + one Generate (posexplode of a
    per-row repeat sequence) — ZERO shuffles at any corpus size; the
    repeat fan-out is bounded by max(weights)."""
    if not weights:
        raise ValueError("weights must name at least one source")
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for source {s!r}: {w}")
    whole = F.lit(None).cast("int")
    thr = F.lit(None).cast("string")
    for s, w in sorted(weights.items()):
        whole = F.when(F.col(source_col) == s, F.lit(int(w))).otherwise(whole)
        thr = F.when(
            F.col(source_col) == s, F.lit(hex_threshold(w - int(w)))
        ).otherwise(thr)
    key = split_key(id_col, salt)
    n_rep = whole + F.when(key < thr, F.lit(1)).otherwise(F.lit(0))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(source_col).alias("source"),
            n_rep.alias("__n"),
        )
        .where(F.col("__n") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(0), F.col("__n") - 1)).alias("repeat_idx"),
        )
        .select(
            "doc_id",
            "source",
            F.col("repeat_idx").cast("long").alias("repeat_idx"),
            F.md5(
                F.concat_ws(":", F.lit(salt), F.col("doc_id").cast("string"),
                            F.col("repeat_idx").cast("string")).cast("binary")
            ).alias("order_key"),
        )
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n: int,
    id_col: str = "doc_id",
    salt: str = "strat",
    n_buckets: int = 32,
) -> DataFrame:
    """Deterministic uniform sample of at most `n` rows per group —
    "give me 10k docs per language" stratified inspection/eval pulls.
    Rows are ranked inside each group by the portable md5 split key
    (uniform, engine-exact, retry-stable — the hash_split mechanics),
    so the sample is reproducible across runs AND across engines, and
    grows monotonically: the n=100 sample is a prefix of the n=1000
    sample under the same salt.

    Plan: delegates to cap_per_group's two-phase top-N, so a hot
    stratum (one language being 90% of a 100 TB corpus) ranks as
    `n_buckets` parallel tasks instead of one straggler sort."""
    key = split_key(id_col, salt)
    return cap_per_group(
        df, group_col, n, [key.asc()], id_col=id_col, n_buckets=n_buckets
    )


def _global_rank_with_total(
    df: DataFrame, order_by: "list[Column]", rank_col: str, num_ranges: int
) -> "tuple[DataFrame, int]":
    """(df + 1-based `rank_col` over the global `order_by` order,
    total row count) — WITHOUT a single-partition window: range-
    repartition on the full ordering key, row_number within each
    range, per-range counts (≤ num_ranges rows, a metadata-sized
    driver collect) prefix-summed into broadcast offsets. Same
    machinery as pack_sequences' token prefix sum (textops.py:176).
    `order_by` must be a total order (include an id tiebreak) so
    ranks are unique and partition-boundary placement can't split
    equal keys.

    The ranged frame is materialized (localCheckpoint) BEFORE the
    counts collect: repartitionByRange picks its boundaries by
    SAMPLING with a seed derived from the execution's fresh RDD id,
    so two executions of the same lazy plan can place rows in
    DIFFERENT range partitions once partitions exceed the sampler's
    exact threshold (spark.sql.execution.rangeExchange.
    sampleSizePerPartition, 100 rows) — offsets collected from one
    execution then misalign with the partitioning of the next
    (measured: duplicate + gapped ranks at 3k rows × 4 ranges).
    Checkpointing pins ONE partitioning for both reads; the cost is
    linear and the alternative (a single-partition window) is not a
    plan at corpus scale."""
    spark = df.sparkSession
    if num_ranges <= 0:
        num_ranges = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    d = df.repartitionByRange(num_ranges, *order_by).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid").orderBy(*order_by)
    d = d.withColumn("__rn", F.row_number().over(w)).localCheckpoint(eager=True)
    counts = {
        r["__pid"]: r["c"]
        for r in d.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if not offsets:
        return df.withColumn(rank_col, F.lit(None).cast("long")), 0
    off = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in sorted(offsets)]),
            F.array(*[F.lit(offsets[p]) for p in sorted(offsets)]),
        ),
        F.col("__pid"),
    )
    ranked = d.withColumn(rank_col, (F.col("__rn") + off).cast("long")).drop(
        "__pid", "__rn"
    )
    return ranked, acc


def global_rank(
    df: DataFrame,
    order_by: "list[Column]",
    rank_col: str = "rank",
    num_ranges: int = 0,
) -> DataFrame:
    """Exact global 1-based rank over `order_by` (must include an id
    tiebreak for a total order). The naive `row_number() OVER (ORDER
    BY ...)` plans as ONE partition holding the whole corpus; this
    runs as the two-phase range-partitioned prefix count instead —
    the only data shuffle is the range partitioning any global order
    requires."""
    ranked, _ = _global_rank_with_total(df, order_by, rank_col, num_ranges)
    return ranked


def quality_tiers(
    df: DataFrame,
    n_tiles: int,
    order_by: "list[Column]",
    tier_col: str = "tier",
    rank_col: str = "rank",
    num_ranges: int = 0,
) -> DataFrame:
    """Exact quantile binning: adds `rank` (global 1-based) and `tier`
    (1..n_tiles) matching SQL `ntile(n_tiles) OVER (ORDER BY ...)`
    bit-for-bit — the "split the corpus into quality deciles, train on
    the top 3" curation step. ntile front-loads the remainder: the
    first n mod k buckets hold floor(n/k)+1 rows, the rest floor(n/k)
    — reproduced here in pure integer arithmetic from the global rank
    (NOT the tempting floor((rank-1)·k/n) identity, which spreads the
    remainder Bresenham-style and diverges from ntile whenever
    n mod k ≥ 2). Same scale plan as global_rank — no
    single-partition window at any corpus size."""
    if n_tiles <= 0:
        raise ValueError(f"n_tiles must be positive, got {n_tiles}")
    ranked, total = _global_rank_with_total(df, order_by, rank_col, num_ranges)
    if total == 0:
        return ranked.withColumn(tier_col, F.lit(None).cast("long"))
    q, r = divmod(int(total), int(n_tiles))
    cut = r * (q + 1)  # last rank inside the front (bigger) buckets
    big = F.expr(f"({rank_col} - 1) div {q + 1}L") + 1
    small = (
        F.lit(r) + F.expr(f"({rank_col} - {cut}L - 1) div {max(q, 1)}L") + 1
    )
    return ranked.withColumn(
        tier_col,
        F.when(F.col(rank_col) <= F.lit(cut), big).otherwise(small).cast("long"),
    )


def hashed_gram_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_n: int = 2,
    hex_digits: int = 3,
) -> DataFrame:
    """(doc_id, tok) — the DSIR paper's hashed n-gram FEATURE stream:
    every word k-gram for k = 1..max_n (non-distinct, in-row slices)
    mapped to one of 16^hex_digits buckets by taking the first
    `hex_digits` hex chars of its md5. The bucket key stays a STRING
    (a hex prefix is one substring call in any engine — no hex→int
    cast, the same portability trick as the random-projection matrix),
    so the stream drops straight into ``fit_unigram_lm(token_stream=)``
    and the LM vocabulary is hard-capped at 16^hex_digits regardless
    of corpus size. Pure projection + one Generate — zero shuffles."""
    if max_n < 1:
        raise ValueError(f"max_n must be >= 1, got {max_n}")
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
    # Generate barrier (r9): materialize the token array ONCE per row
    # before the per-position transforms — referencing the split/filter
    # expression inside F.transform re-evaluates it per gram position,
    # the O(tokens²)-class trap stateless_minhash_tokenroll documents
    # (measured 7.1s → 4.5s for the 200k × 24-token stream)
    staged = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(F.array(toks)).alias("__tk")
    )
    tk = F.col("__tk")

    def _gram_hash(k):
        # a dedicated single-arg closure per k: F.transform reads a
        # TWO-arg lambda as (element, index) and would silently bind
        # the index column over a `_k=k` default argument
        def f(i):
            return F.substring(
                F.md5(F.concat_ws(" ", F.slice(tk, i, k))), 1, hex_digits
            )

        return f

    parts = []
    for k in range(1, max_n + 1):
        grams = F.when(
            F.size(tk) >= k,
            F.transform(F.sequence(F.lit(1), F.size(tk) - k + 1), _gram_hash(k)),
        ).otherwise(F.array().cast("array<string>"))
        parts.append(grams)
    allg = F.concat(*parts) if len(parts) > 1 else parts[0]
    return staged.select("doc_id", F.explode(allg).alias("tok"))


def resolve_dsir_features(features: str) -> str:
    """The ONE documented production default for the DSIR feature model
    (r9; same policy as dedup.resolve_hash_fn): ``features='auto'``
    resolves to ``hashed_ngram`` — the paper's actual feature model
    (hashed uni+bigram buckets) and the only one whose fitted LM tables
    are hard-capped (16^hex_digits rows) and therefore provably
    BROADCAST at ANY corpus size; a raw-vocabulary unigram LM grows
    with the crawl and eventually stops broadcasting. Explicit names
    pass through untouched: ``unigram`` remains available for callers
    who want interpretable per-token ratios, and PRECOMPUTED LM tables
    must keep the feature model they were fit over — unigram tokens and
    hashed buckets never share a vocabulary."""
    return "hashed_ngram" if features == "auto" else features


#: hashed_gram_stream's default hex_digits — the hard-capped bucket
#: space (16^3 = 4096) the in-row scorer's literal delta array covers
_HASHED_HEX_DIGITS = 3
#: hashed_gram_stream's default max_n — uni+bigram features; the
#: in-row scorer must mirror it exactly
_HASHED_MAX_N = 2


def _hashed_delta_literals(lm_raw: DataFrame, lm_target: DataFrame):
    """The 16^3-entry per-bucket delta table for the hashed_ngram
    IN-ROW scorer (see dsir_weights_from_lms), or None when either LM
    table is not the hard-capped bucket shape (fall back to the join
    plan). delta[bucket] = coalesce(lp_t, __unk_t) − coalesce(lp_r,
    __unk_r) — exactly the per-stream-row value the join path's
    full-outer LM join + coalesce computes, precomputed once per
    bucket. The collects are bounded by the bucket cap + the floor row
    (the ≤4096-literal driver-collect discipline of bm25_topk /
    semdedup_incremental); a table past the cap, or without exactly
    one '__unk__' floor row, returns None."""
    nb = 16 ** _HASHED_HEX_DIGITS

    def _to_map(lm):
        rows = lm.limit(nb + 2).collect()
        if len(rows) > nb + 1:
            return None, None
        unk, m = None, {}
        for r in rows:
            if r["tok"] == "__unk__":
                # a NULL-logp floor row (reachable with validate=False)
                # is "not the capped shape": fall back to the join
                # plan, which degrades per-row, instead of raising at
                # plan-build time (r14 ADVICE)
                if unk is not None or r["logp"] is None:
                    return None, None
                unk = float(r["logp"])
            elif r["logp"] is not None:
                m[r["tok"]] = float(r["logp"])
        return m, unk

    mt, unk_t = _to_map(lm_target)
    if unk_t is None:
        return None
    mr, unk_r = _to_map(lm_raw)
    if unk_r is None:
        return None
    return [
        mt.get(h, unk_t) - mr.get(h, unk_r)
        for h in (format(b, "03x") for b in range(nb))
    ]


def _hashed_inrow_scores(
    docs: DataFrame, deltas: "list[float]", text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, n_tokens, llr) as ONE whole-stage-codegen projection —
    the r14 scoring plan for the hashed_ngram feature model: each
    row's uni+bigram bucket indices are computed in-row (same md5 hex
    prefix as hashed_gram_stream, converted to an integer index) and
    summed against the constant-folded 4096-double delta array via an
    O(1) element_at per gram. Replaces the exploded 2L−1-rows-per-doc
    feature stream + broadcast LM join + groupBy(doc_id) + join-back
    of the generic path (guide §2.4 remove shuffles / §4.1 built-ins):
    zero joins, zero aggregation exchanges, identical values — the
    per-gram delta is the same double the join path coalesces, and the
    1e-6 rounding absorbs summation-order noise exactly as it already
    does across engines. Token cleaning and gram construction mirror
    hashed_gram_stream verbatim (incl. its Generate barrier: the token
    array and the per-gram delta array are each materialized once per
    row — the O(tokens²) re-evaluation traps documented there)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
    staged = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(F.array(toks)).alias("__tk")
    )
    tk = F.col("__tk")
    arr = F.array(*[F.lit(float(d)) for d in deltas])

    def _gram_delta(k):
        # dedicated single-arg closure per k (see hashed_gram_stream's
        # _gram_hash note on F.transform's two-arg lambda pitfall)
        def f(i):
            idx = F.conv(
                F.substring(
                    F.md5(F.concat_ws(" ", F.slice(tk, i, k))),
                    1,
                    _HASHED_HEX_DIGITS,
                ),
                16,
                10,
            ).cast("int")
            return F.element_at(arr, idx + 1)

        return f

    parts = []
    for k in range(1, _HASHED_MAX_N + 1):
        parts.append(
            F.when(
                F.size(tk) >= k,
                F.transform(
                    F.sequence(F.lit(1), F.size(tk) - k + 1), _gram_delta(k)
                ),
            ).otherwise(F.array().cast("array<double>"))
        )
    alld = F.concat(*parts) if len(parts) > 1 else parts[0]
    # Generate barrier: n_tokens and the sum both read the materialized
    # per-gram delta array — without it each consumer re-evaluates the
    # md5 transforms (the band_buckets_rowwise measurement class)
    staged2 = staged.select("doc_id", F.explode(F.array(alld)).alias("__ds"))
    n = F.size("__ds")
    return staged2.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.when(
            n > 0,
            F.round(F.aggregate("__ds", F.lit(0.0), lambda a, d: a + d), 6),
        ).alias("llr"),
    )


def _require_unk(lm: DataFrame, name: str) -> None:
    """ADVICE r8: a supplied LM table missing its '__unk__' floor row
    empties the unk crossJoin and silently zeroes every scored doc —
    fail loudly instead. take(2) on the filtered frame is bounded by
    the (vocab-sized, typically broadcastable) LM table."""
    rows = lm.where(F.col("tok") == "__unk__").take(2)
    if len(rows) != 1:
        raise ValueError(
            f"{name} must carry exactly one '__unk__' floor row "
            f"(found {'none' if not rows else 'more than one'}); fit LM "
            "tables with fit_unigram_lm or include the smoothed unknown "
            "floor log(alpha / (N + alpha*(V+1))) as tok='__unk__'"
        )


def _dsir_stream_fn(features: str, text_col: str, id_col: str):
    features = resolve_dsir_features(features)
    if features == "unigram":
        from vicinity_spark.operators.dedup import tokens

        return lambda df: tokens(df, text_col, id_col)
    if features == "hashed_ngram":
        return lambda df: hashed_gram_stream(df, text_col, id_col)
    raise ValueError(
        f"features must be 'auto', 'unigram' or 'hashed_ngram', got {features!r}"
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    features: str = "auto",
) -> DataFrame:
    """(doc_id, n_tokens, llr) — per-doc LOG IMPORTANCE RATIO for
    DSIR-style data selection (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023, with
    the unigram feature model): llr = Σ_tok [log p_target(tok) −
    log p_raw(tok)] under two add-α-smoothed unigram LMs, one fit on
    the (small) target-domain corpus and one on the raw crawl itself.
    Positive llr ⇒ the doc "reads like" the target domain; selection
    keeps the high end (``dsir_select``) or samples ∝ exp(llr)
    (``dsir_sample``). Reference has no analog — this is the
    training-data-curation layer of the brief.

    Tokens absent from the target LM score at its smoothed unknown
    floor log(α / (N_t + α·(V_t+1))); every raw token is present in
    the raw LM by construction, so no raw-side floor is needed.

    Scale: two vocab-bounded map-side-combined groupBys fit the LMs
    (the target corpus is typically MBs — its LM broadcasts); the
    raw token stream joins ONCE against a combined (tok, lp_t, lp_r)
    table — hot stopwords are join keys, never row explosions — and
    the per-doc sum is one groupBy on doc_id, pre-partitioned by the
    tokenizer's explode. No shuffle touches full document text.
    llr rounds to 1e-6, above cross-engine float-summation noise at
    document magnitudes.

    ``features``: ``'auto'`` (the default) resolves to
    ``hashed_ngram`` — the paper's actual feature model, hashed
    uni+bigram buckets (``hashed_gram_stream``): the LM vocabulary is
    hard-capped at the bucket count (4096 at the default 3 hex
    digits), which is the property that lets the fitted tables
    BROADCAST at any corpus size, and bigrams see word order that
    bag-of-words misses (resolve_dsir_features; r9 — the scale-safe
    model is the production default). Pass ``'unigram'`` explicitly
    for interpretable raw-vocabulary per-token ratios; its LM tables
    grow with the crawl."""
    from vicinity_spark.operators.textops import fit_unigram_lm

    stream = _dsir_stream_fn(features, text_col, id_col)
    # each fit is ONE pass over its feature stream (fit_unigram_lm
    # materializes the vocab-bounded frequency table, r9 — without
    # that, the lm/totals/unk branches and the downstream unk/combined
    # joins re-ran the FULL corpus stream per read: dsir_hashed_2m
    # measured 457s at 2M vs ~38s for a single stream pass), so the
    # whole dsir_weights call touches the raw corpus exactly twice:
    # one fit pass + one scoring pass — the 100 TB-correct shape (a
    # cached 94M-row feature stream would save the second pass only
    # while it fits in memory; two projections always scale)
    lm_t = fit_unigram_lm(target, alpha=alpha, token_stream=stream(target))
    lm_r = fit_unigram_lm(raw, alpha=alpha, token_stream=stream(raw))
    return dsir_weights_from_lms(
        raw, lm_r, lm_t, text_col=text_col, id_col=id_col, features=features,
        validate=False,  # both tables carry __unk__ by construction
    )


def dsir_weights_from_lms(
    docs: DataFrame,
    lm_raw: DataFrame,
    lm_target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    features: str = "auto",
    validate: bool = True,
    inline_lm: bool = True,
) -> DataFrame:
    """``dsir_weights`` against PRECOMPUTED (tok, logp) LM tables (fit
    with ``fit_unigram_lm``, or swap in any externally-trained unigram
    table carrying an ``__unk__`` floor row) — the production shape:
    fit both LMs once in the daily batch job, score any number of
    corpora / micro-batches against them without refitting. Tokens
    absent from EITHER table score at that table's ``__unk__`` floor
    (a doc scored against a stale raw LM can contain genuinely new
    tokens — both sides degrade symmetrically). `features` must match
    what the LM tables were fit over ('auto' → hashed_ngram,
    resolve_dsir_features).

    ``validate`` (default True) eagerly checks both tables carry
    exactly one '__unk__' floor row — a missing floor empties the unk
    crossJoin and silently zeroes every scored doc (ADVICE r8). The
    check is one take(2) per vocab-bounded table; per-micro-batch
    callers that validated at build time pass validate=False.

    ``inline_lm`` (default True, r14): for the hashed_ngram feature
    model, collect the (hard-capped, ≤4096-bucket) LM tables and score
    in-row against a constant-folded per-bucket delta array — one
    projection, no feature-stream explode/join/aggregate. Identical
    values (the rounding contract unchanged); False forces the generic
    join plan (the A/B hook).

    Precondition of the inline path (r14 ADVICE): ``docs`` must carry
    UNIQUE ``id_col`` values — every declared pipeline does. The join
    plan aggregates grams ACROSS duplicate doc_id rows (groupBy) and
    fans the combined score back to each row; the in-row plan scores
    each row independently. With duplicate ids the two plans disagree
    by design — pass ``inline_lm=False`` for such inputs (matching the
    join semantics in-row would need the exact aggregate + join-back
    the inline path exists to remove)."""
    if validate:
        _require_unk(lm_raw, "lm_raw")
        _require_unk(lm_target, "lm_target")
    if inline_lm and resolve_dsir_features(features) == "hashed_ngram":
        # r14 optimization: the hashed feature model's LM tables are
        # HARD-CAPPED at 16^3 buckets by construction, so the whole
        # scoring decision table fits in 4096 literal doubles — score
        # each doc IN-ROW against the constant-folded delta array
        # instead of exploding the 2L−1-rows-per-doc feature stream
        # through a broadcast join + groupBy(doc_id) + join-back
        # (_hashed_inrow_scores has the plan contract; values
        # identical, see its docstring). Tables that are not the
        # capped shape (or inline_lm=False) keep the join plan.
        deltas = _hashed_delta_literals(lm_raw, lm_target)
        if deltas is not None:
            return _hashed_inrow_scores(docs, deltas, text_col, id_col)
    unk = (
        lm_target.where(F.col("tok") == "__unk__")
        .select(F.col("logp").alias("__unk_t"))
        .crossJoin(
            lm_raw.where(F.col("tok") == "__unk__").select(
                F.col("logp").alias("__unk_r")
            )
        )
    )
    combined = (
        lm_target.where(F.col("tok") != "__unk__")
        .select("tok", F.col("logp").alias("__lp_t"))
        .join(
            lm_raw.where(F.col("tok") != "__unk__").select(
                "tok", F.col("logp").alias("__lp_r")
            ),
            "tok",
            "full",
        )
    )
    t = _dsir_stream_fn(features, text_col, id_col)(docs)
    scored = (
        t.join(combined, "tok", "left")
        .crossJoin(F.broadcast(unk))
        .select(
            "doc_id",
            (
                F.coalesce("__lp_t", F.col("__unk_t"))
                - F.coalesce("__lp_r", F.col("__unk_r"))
            ).alias("__d"),
        )
    )
    per = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"), F.sum("__d").alias("__s")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.when(F.col("n_tokens") > 0, F.round(F.col("__s"), 6)).alias("llr"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    features: str = "auto",
) -> DataFrame:
    """Top-k raw docs by DSIR log importance ratio (deterministic
    head selection — ties broken by doc_id, so the selected SET is
    engine-reproducible on the rounded llr). The paper's sampled
    variant (avoids over-concentrating on the extreme head) is
    ``dsir_sample``. Plan: TakeOrdered over the weights projection —
    per-partition top-k + driver merge, no global sort shuffle."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = dsir_weights(
        raw, target, text_col=text_col, id_col=id_col, alpha=alpha, features=features
    )
    return w.where(F.col("llr").isNotNull()).orderBy(
        F.col("llr").desc(), F.col("doc_id").asc()
    ).limit(k)


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    salt: str = "dsir",
    features: str = "auto",
) -> DataFrame:
    """Gumbel-top-k importance RESAMPLING: k raw docs sampled without
    replacement ∝ exp(llr), the paper's actual selection rule. The
    Gumbel-max trick keeps everything in LOG space — priority =
    llr − ln(−ln(u)) with u the same md5-exact per-row uniform as
    ``weighted_sample`` — so exp(llr) is never materialized (a long
    doc's llr of ±1e3 would overflow a double as a raw weight).
    Deterministic for a fixed salt; NOT oracle-certified (ln is
    libm-dependent at the last ulp, which can flip the k-th boundary
    row across engines — ``dsir_select`` is the certified twin).
    Same TakeOrdered plan as weighted_sample: no global sort."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = dsir_weights(
        raw, target, text_col=text_col, id_col=id_col, alpha=alpha, features=features
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(salt + ":"), F.col("doc_id").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 52))
    gumbel = -F.log(-F.log(u))
    return (
        w.where(F.col("llr").isNotNull())
        .withColumn("priority", F.col("llr") + gumbel)
        .orderBy(F.col("priority").desc(), F.col("doc_id").asc())
        .limit(k)
    )
