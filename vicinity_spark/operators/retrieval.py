"""Lexical retrieval + rank fusion for training-data pipelines:
BM25 top-k (query-by-example over a document corpus) and reciprocal
rank fusion of ranked lists (hybrid lexical + dense retrieval).

Large-scale curation uses retrieval constantly — decontamination
(find the corpus documents that match a benchmark document beyond
n-gram overlap), dedup candidate generation, retrieval-based quality
filtering, and hybrid search over a corpus with both text and an
embedding column. These are pure built-in-function DataFrame programs
(split/explode/groupBy/window — no Python UDFs), so they run inside
whole-stage codegen and scale with the corpus:

- the ONLY corpus-sized shuffle in ``bm25_topk`` is the per-(doc,
  term) frequency aggregate (map-side combined); the query side is
  broadcast everywhere it appears, so the score join never shuffles
  the corpus a second time;
- document frequencies are computed ONLY for the query's terms
  (vocabulary-sized work bounded by the query set, not the corpus
  vocabulary) and broadcast back;
- ``rrf_fuse`` touches only the ranked lists (≤ queries × k rows per
  side).

Scores are rounded to 6 decimals BEFORE ranking so the top-k cut is
reproducible across engines and partitionings (sum-of-doubles is
order-dependent at ~1e-13 relative; ranking the rounded score with a
doc-id tie-break makes the result deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Robertson/Lucene defaults
BM25_K1 = 1.2
BM25_B = 0.75
RRF_K0 = 60


# the ONE canonical tokenization, shared with the textops LM family so
# retrieval scores and every DuckDB oracle stay token-identical
from vicinity_spark.operators.textops import clean_toks as _clean_toks  # noqa: E402


def bm25_index(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "tuple[DataFrame, DataFrame]":
    """(postings, stats) — the two corpus-derived tables ``bm25_topk``
    scores against: one (doc_id, tok, dl, tf) row per (doc, term), and
    the one-row (n_docs, avgdl) length stats. Build once, materialize
    (cache / localCheckpoint / parquet — the postings are
    corpus-sized, so at scale persist them like any index layout),
    and pass into ``bm25_topk(postings=…, stats=…)`` so a serving
    loop never recomputes the corpus aggregate per query batch."""
    toks = _clean_toks(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(toks).alias("tok"),
        F.size(toks).cast("double").alias("dl"),
    )
    postings = base.groupBy("doc_id", "tok", "dl").agg(F.count("*").alias("tf"))
    stats = docs.select(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.size(_clean_toks(text_col))).alias("avgdl"),
    )
    return postings, stats


def bm25_topk(
    docs: "DataFrame | None",
    queries: DataFrame,
    k: int = 10,
    *,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_text_col: "str | None" = None,
    query_id_col: "str | None" = None,
    postings: "DataFrame | None" = None,
    stats: "DataFrame | None" = None,
) -> DataFrame:
    """BM25 top-k retrieval: for each query document, the ``k``
    highest-scoring corpus documents under Okapi BM25 with the
    Lucene idf (ln(1 + (N - df + 0.5)/(df + 0.5)) — always ≥ 0).
    Query term frequency is ignored (distinct query terms), the
    standard choice for query-by-example retrieval.

    Returns (query_id, doc_id, bm25, rank), rank 1..k per query by
    (bm25 desc, doc_id asc) on the 6-dp-rounded score. Queries whose
    terms match nothing return no rows.

    Scale shape: the (doc, term) tf aggregate is the only corpus-sized
    shuffle (map-side combined); corpus length stats reduce a scan to
    one broadcast row; the query term table is broadcast, and
    per-query-term document frequencies are a map-side-combined
    aggregate of the query-filtered postings, broadcast back (an
    aggregate, not a window — see the inline note on stopword skew).
    ``postings``/``stats`` (from ``bm25_index``) inject precomputed
    corpus tables — the serving path's hook (``docs`` may be None
    then); when given, no corpus aggregate runs in this call.
    """
    if k <= 0:
        raise ValueError("k must be greater than 0")
    ad_hoc = postings is None
    if postings is None or stats is None:
        if docs is None:
            raise ValueError("docs is required unless postings AND stats are given")
        built = bm25_index(docs, text_col=text_col, id_col=id_col)
        postings = postings if postings is not None else built[0]
        stats = stats if stats is not None else built[1]
    qt = query_text_col or text_col
    qi = query_id_col or id_col
    tf = postings

    # distinct query terms (qtf ignored); tiny → broadcast. The outer
    # .distinct() makes a duplicated query_id row harmless — without it
    # a repeated row would double every (query_id, tok) contribution
    # and thus every score (the streaming twin dropDuplicates for the
    # same reason); the table is queries×terms-sized, so the cost is nil.
    qterms = queries.select(
        F.col(qi).alias("query_id"),
        F.explode(F.array_distinct(_clean_toks(qt))).alias("tok"),
    ).distinct()
    qvocab = qterms.select("tok").distinct()

    # postings restricted to query terms (broadcast semi-filter keeps
    # each corpus-side pipeline a single scan → filter → aggregate).
    # pf feeds TWO consumers — the per-query-term document frequencies
    # and the score join — and df is an aggregate over the very rows
    # the score path then needs row-wise, so without materialization
    # Spark recomputes the corpus tf pass for the second consumer
    # (measured 2.3× on the 2M tier; the exchanges don't dedupe even
    # column-matched). A window count (partitionBy tok) would avoid
    # the branch but has NO partial aggregation — a hot query term (a
    # stopword in real text) funnels its entire postings list into one
    # task, the single-task hotspot the 100 TB posture forbids. So in
    # the ad-hoc path pf is materialized ONCE (eager localCheckpoint,
    # MEMORY_AND_DISK — residency is bounded by the query-matched
    # postings, the same volume the score shuffle processes anyway;
    # the same trick the MinHash miners use for their bucket tables).
    # When the caller injected a materialized index, the double read
    # is already cheap — no checkpoint, no per-trigger serving cost.
    pf = tf.join(F.broadcast(qvocab), "tok")
    if ad_hoc:
        pf = pf.localCheckpoint(eager=True)
    # map-side-combined aggregate, broadcast back — skew-safe where a
    # window is not
    dft = pf.groupBy("tok").agg(F.count("*").cast("double").alias("df"))

    scored = (
        pf.join(F.broadcast(qterms), "tok")
        .join(F.broadcast(dft), "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("contrib"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "bm25", "rank")
    )


def hard_negatives(
    neighbors: DataFrame,
    docs: DataFrame,
    k: int = 10,
    *,
    max_jaccard: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_col: str = "query_id",
    neighbor_id_col: str = "id",
    distance_col: str = "distance",
    rank_col: "str | None" = "rank",
) -> DataFrame:
    """Hard-negative mining for contrastive / embedding training data:
    from an embedding-space neighbor list (``knn_join`` output —
    (query_id, id, distance, rank)), drop the candidates that are
    TEXTUAL near-duplicates of their query document (token-set
    Jaccard ≥ ``max_jaccard`` against ``docs``), drop the self row,
    and re-rank the survivors to the new top-``k`` — ordered by the
    retriever's OWN ranking (``rank_col``) when the list carries one,
    else by (distance asc, id asc). Preferring the incoming rank
    matters: knn_join ranks by the RAW distance and clips only the
    output (the codebase-wide argsort-then-clip invariant), so
    re-sorting the clipped ``distance`` column would reorder
    candidates whose raw distances were negative (inner-product
    similarities > 1, cosine ≈ −1e-17 numerical noise) and diverge
    from any raw-distance replay. What remains is the standard
    hard-negative set: semantically close but not the same text — the
    pairs an embedding model trains against. (Textual near-dups are
    the POSITIVE candidates; mining them is the dedup family's job.)

    Output: (query_id, doc_id, distance, jaccard, rank).

    Scale shape: everything here operates on the neighbor LIST
    (≤ queries × k_in rows). Token arrays are attached by two joins in
    which the pair list is the broadcast side, so the corpus is never
    shuffled — just two column-pruned scans of (id, text) — and the
    Jaccard itself is computed IN-ROW (array_intersect/array_union),
    no token explode. The heavy lifting already happened in the
    ANN/exact retriever that produced ``neighbors``. A candidate with
    an empty token set scores Jaccard 0 against a non-empty query (it
    is trivially not a near-dup) and survives; only a pair where BOTH
    token sets are empty (0/0 → NULL) is dropped."""
    if k <= 0:
        raise ValueError("k must be greater than 0")
    use_rank = rank_col is not None and rank_col in neighbors.columns
    order_cols = [
        F.col(rank_col).cast("long").alias("__in_rank")
        if use_rank
        else F.lit(None).cast("long").alias("__in_rank")
    ]
    pairs = neighbors.select(
        F.col(query_col).alias("query_id"),
        F.col(neighbor_id_col).alias("doc_id"),
        F.col(distance_col).alias("distance"),
        *order_cols,
    ).where(F.col("query_id") != F.col("doc_id"))
    toks = docs.select(
        F.col(id_col).alias("__tid"),
        F.array_distinct(_clean_toks(text_col)).alias("__toks"),
    )
    qj = toks.withColumnRenamed("__toks", "__qtoks").withColumnRenamed(
        "__tid", "query_id"
    )
    cj = toks.withColumnRenamed("__toks", "__ctoks").withColumnRenamed(
        "__tid", "doc_id"
    )
    scored = (
        pairs.join(qj, "query_id")
        .join(cj, "doc_id")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("__qtoks", "__ctoks")).cast("double")
                / F.size(F.array_union("__qtoks", "__ctoks")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") < max_jaccard)
    )
    order = (
        [F.col("__in_rank").asc()]
        if use_rank
        else [F.col("distance").asc(), F.col("doc_id").asc()]
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "distance", "jaccard", "rank")
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 10,
    *,
    k0: int = RRF_K0,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal rank fusion (Cormack et al.) of two ranked lists:
    rrf(d) = Σ_lists 1/(k0 + rank_list(d)), documents absent from a
    list contribute 0. Returns (query_id, doc_id, rrf, rank) with the
    fused top-k per query by (rrf desc, doc_id asc) on the
    6-dp-rounded score.

    Inputs are (query, doc, rank) lists — at most queries × k rows per
    side, so every join here is broadcast-scale regardless of corpus
    size; the heavy lifting already happened in the retrievers."""
    if k <= 0:
        raise ValueError("k must be greater than 0")

    def side(df: DataFrame, out: str) -> DataFrame:
        return df.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            (F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col).cast("double"))).alias(
                out
            ),
        )

    fused = (
        side(ranked_a, "ra")
        .join(side(ranked_b, "rb"), ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.coalesce(F.col("ra"), F.lit(0.0))
                + F.coalesce(F.col("rb"), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "rrf", "rank")
    )
