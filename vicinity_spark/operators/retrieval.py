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

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Robertson/Lucene defaults
BM25_K1 = 1.2
BM25_B = 0.75
RRF_K0 = 60

# persisted-layout names (bm25_index_save/load)
BM25_POSTINGS_DIR = "bm25_postings"
BM25_STATS_DIR = "bm25_stats"
BM25_DOCLENS_DIR = "bm25_doclens"
#: run-scoped committed-batch + running-totals sidecar maintained by
#: stream_bm25_ingest; a fresh bm25_index_save deletes it
BM25_INGEST_MARKER = "_bm25_ingest.json"
#: bounded term-group partition key: vocabularies are unbounded, so the
#: posting layout cannot partitionBy(tok) directly (one directory per
#: term); hashing terms into a fixed group count keeps the directory
#: fan-out constant while the probe side recomputes the same key and
#: the query-term join prunes whole partition directories (the same
#: DPP discipline as the LSH posting layout's __pg, backends/lsh.py)
BM25_TGROUP_COL = "__tg"
_N_TGROUPS = 64


def _tgroup_col():
    return F.pmod(F.xxhash64("tok"), F.lit(_N_TGROUPS)).cast("int")


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


def bm25_doclens(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, dl) — one row per document including ZERO-TOKEN docs
    (which have no postings rows but do count toward n_docs/avgdl).
    This is the third layout artifact the streaming ingest
    (``stream_bm25_ingest``) maintains: a row-level-idempotent record
    of which documents the index holds, from which the length stats
    are exactly recomputable (n_docs = count, avgdl = avg(dl)) — the
    postings alone cannot say how many empty docs exist."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_clean_toks(text_col)).cast("double").alias("dl"),
    )


def bm25_index_save(
    postings: DataFrame,
    stats: DataFrame,
    path: str,
    doclens: "DataFrame | None" = None,
) -> None:
    """Persist a ``bm25_index`` layout: postings as parquet partitioned
    by the bounded term-group key (``BM25_TGROUP_COL`` =
    hash(tok) mod 64 — vocabularies are unbounded, so partitioning by
    the raw term would create one directory per term; the hashed group
    keeps the fan-out constant and lets ``bm25_topk``'s query-term
    probe prune whole partition DIRECTORIES via dynamic partition
    pruning, exactly the LSH posting layout's ``__pg`` discipline,
    backends/lsh.py), plus the one-row stats table. This is the same
    first-class persistence every other index layout in the engine
    gets (store.save/load; reference analog vicinity/vicinity.py:
    167-234) — a serving deployment loads once and never recomputes
    the corpus aggregate.

    ``doclens`` (``bm25_doclens(docs)``) additionally writes the
    per-doc length table — required if the layout will be GROWN by
    ``stream_bm25_ingest`` (its row-level idempotence and exact stats
    recovery hang off it); a purely static serving layout can omit
    it.

    The write range-partitions on (term group, tok) and sorts each
    task's rows — every file inside a ``__tg=`` directory then holds
    a DISJOINT tok range with parquet min/max stats, so a probe that
    inlines its query terms as literals (``bm25_topk``'s small-batch
    serving path) skips whole files and row groups WITHIN the
    directories partition pruning kept. The range shuffle is one
    extra pass over the postings at save time — the price of making
    every later probe sublinear in the layout, the same trade every
    sorted index write makes."""
    from vicinity_spark.session import scan_reads_path

    spark = postings.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    target = os.path.join(path, BM25_POSTINGS_DIR)
    if scan_reads_path(postings, target):
        # load → append → save back to the SAME folder (the natural
        # daily maintenance cycle): the overwrite deletes the very
        # part files the postings plan still scans — materialize first
        # to sever that lineage (store.py save has the identical
        # guard; executor-storage cost, so at large scale prefer a
        # fresh folder + rename)
        postings = postings.localCheckpoint(eager=True)
    posts = (
        postings.withColumn(BM25_TGROUP_COL, _tgroup_col())
        .repartitionByRange(nparts, F.col(BM25_TGROUP_COL), F.col("tok"))
        .sortWithinPartitions(BM25_TGROUP_COL, "tok")
    )
    posts.write.mode("overwrite").partitionBy(BM25_TGROUP_COL).parquet(target)
    sdir = os.path.join(path, BM25_STATS_DIR)
    if scan_reads_path(stats, sdir):
        stats = stats.localCheckpoint(eager=True)  # one row
    stats.write.mode("overwrite").parquet(sdir)
    if doclens is not None:
        ddir = os.path.join(path, BM25_DOCLENS_DIR)
        if scan_reads_path(doclens, ddir):
            doclens = doclens.localCheckpoint(eager=True)
        doclens.write.mode("overwrite").parquet(ddir)
    # a fresh save REBUILDS the layout — a leftover ingest sidecar
    # (stream_bm25_ingest) would carry the old corpus's running totals
    # and batch marks into the new one; invalidate it
    spark_ctx = spark.sparkContext
    jmarker = spark._jvm.org.apache.hadoop.fs.Path(
        path.rstrip("/") + "/" + BM25_INGEST_MARKER
    )
    fs = jmarker.getFileSystem(spark_ctx._jsc.hadoopConfiguration())
    if fs.exists(jmarker):
        fs.delete(jmarker, False)


def bm25_index_load(spark: SparkSession, path: str) -> "tuple[DataFrame, DataFrame]":
    """(postings, stats) read back from a ``bm25_index_save`` folder.
    The postings keep their ``BM25_TGROUP_COL`` partition column —
    ``bm25_topk`` detects it and extends the query-term join to the
    group key, so the scan touches only the query terms' partition
    directories (file prune, not a full-layout read).

    The one-row stats frame is PINNED at load (eager localCheckpoint):
    ``stream_bm25_ingest`` overwrites the stats parquet on every
    trigger, so a lazily-read stats row in a serving session racing a
    live ingest loop would re-scan a replaced (or mid-overwrite
    deleted) file on every query. One row — the pin is free. The
    postings stay lazy on purpose: they are the layout's bulk, the
    ingest loop only APPENDS new files under them, and a serving query
    plan lists files per probe anyway."""
    stats = spark.read.parquet(os.path.join(path, BM25_STATS_DIR)).localCheckpoint(
        eager=True
    )
    return (spark.read.parquet(os.path.join(path, BM25_POSTINGS_DIR)), stats)


def bm25_index_append(
    postings: DataFrame,
    stats: DataFrame,
    new_docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "tuple[DataFrame, DataFrame]":
    """(postings', stats') with ``new_docs`` folded in — the
    incremental-maintenance twin of rebuilding the index from the
    concatenated corpus (equality is test-pinned). New documents
    append their own (doc, term, dl, tf) rows — corpus-sized work
    bounded by the BATCH, never a rebuild — and the length stats
    update through the count/avgdl algebra (both are composable
    aggregates: n' = n + nb, avgdl' = (n·avgdl + nb·avgdlb)/n').
    Mirrors the dedup snapshot's incremental lifecycle
    (append_corpus_buckets) and completes the insert story for the
    retrieval family.

    Contract: ``new_docs`` carries NEW doc_ids only — re-appending an
    id that is already in the index would double its postings and
    count it twice in the stats (the same new-rows contract as
    append_corpus_buckets without skip_existing). The returned frames
    are lazy; persist them (``bm25_index_save``) or localCheckpoint
    before chaining MANY appends, as with any union lineage."""
    np_, ns = bm25_index(new_docs, text_col=text_col, id_col=id_col)
    if BM25_TGROUP_COL in postings.columns:
        # loaded layouts carry the partition key; keep the union
        # schema-aligned so a re-save needs no special casing
        np_ = np_.withColumn(BM25_TGROUP_COL, _tgroup_col())
    out_postings = postings.unionByName(np_)
    out_stats = (
        stats.crossJoin(
            ns.select(
                F.col("n_docs").alias("__nb"), F.col("avgdl").alias("__ab")
            )
        )
        .select(
            (F.col("n_docs") + F.col("__nb")).alias("n_docs"),
            (
                (
                    F.col("n_docs") * F.coalesce(F.col("avgdl"), F.lit(0.0))
                    + F.col("__nb") * F.coalesce(F.col("__ab"), F.lit(0.0))
                )
                / (F.col("n_docs") + F.col("__nb"))
            ).alias("avgdl"),
        )
    )
    return out_postings, out_stats


def bm25_index_compact(
    spark: SparkSession, path: str, max_files_per_dir: int = 4
) -> int:
    """Small-file maintenance for a saved BM25 layout: every
    ``stream_bm25_ingest`` trigger appends a file set to each
    ``__tg=`` term-group directory, so after ~100 appends the
    query-term probe's pruned scan degrades to hundreds of tiny files
    per directory — the same hazard ``compact_corpus_buckets``
    exists for (operators/dedup.py), and this is the same fix:
    rewrite ONLY the directories whose non-hidden file count exceeds
    ``max_files_per_dir`` back to one tok-sorted file each (sorting
    by tok preserves row-group pruning on the probe key), through
    dynamic partition overwrite so untouched directories and the
    stats/doclens artifacts are never rewritten. Returns how many
    directories were compacted. Offline maintenance: run between
    ingest batches, not concurrently with a probe of the same
    layout."""
    if max_files_per_dir < 1:
        raise ValueError(f"max_files_per_dir must be >= 1, got {max_files_per_dir}")
    target = os.path.join(path, BM25_POSTINGS_DIR)
    jpath = spark._jvm.org.apache.hadoop.fs.Path(target)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        raise ValueError(f"no BM25 postings layout at {target!r}")
    to_compact = []
    for tg_st in fs.listStatus(jpath):
        if not tg_st.isDirectory() or not tg_st.getPath().getName().startswith(
            BM25_TGROUP_COL + "="
        ):
            continue
        n_files = sum(
            1
            for f in fs.listStatus(tg_st.getPath())
            if f.isFile() and not f.getPath().getName().startswith(("_", "."))
        )
        if n_files > max_files_per_dir:
            to_compact.append(tg_st.getPath().toString())
    if not to_compact:
        return 0
    sub = (
        spark.read.option("basePath", target)
        .parquet(*to_compact)
        .repartition(F.col(BM25_TGROUP_COL))
        .sortWithinPartitions("tok")
        .localCheckpoint(eager=True)
    )
    key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        sub.write.mode("overwrite").partitionBy(BM25_TGROUP_COL).parquet(target)
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    return len(to_compact)


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
    inline_terms_max: int = 4096,
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

    Against a LOADED layout (``bm25_index_load`` — postings carry the
    term-group partition column) with at most ``inline_terms_max``
    distinct query terms, the terms are collected and inlined as
    LITERAL filters: the term-group IN prunes partition directories
    statically (no DPP machinery) and the tok predicate pushes into
    the parquet scan, where the save's tok-sorted files turn it into
    file/row-group skipping — the probe reads ~the query terms'
    postings, not every row of every touched directory. The collect
    is bounded by the cap (a query-batch-vocabulary-sized driver
    list, the same class as the facade's queries×k result collect);
    larger query batches, or ``inline_terms_max=0``, fall back to
    the broadcast join + dynamic partition pruning.

    In the AD-HOC path (``docs`` given, no precomputed ``postings``)
    the same ``inline_terms_max`` collect inlines the query vocabulary
    as a literal ``isin`` filter on the lazy corpus tf aggregate —
    a predicate on a grouping column pushes BELOW the aggregate
    (a broadcast join cannot), so the corpus-sized (doc, term)
    hash-agg + exchange shrink to query-matched postings (r14;
    guide §2.3/§2.4). Identical rows: a tok filter commutes with a
    tok-keyed groupBy.
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
    # A LOADED layout (bm25_index_load) carries the term-group
    # partition column: recompute it on the probe side and extend the
    # join to it, so the broadcast join's dynamic partition pruning
    # skips every partition directory holding no query term — the scan
    # reads ~n_query_terms/64 of the layout, not all of it.
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
    if BM25_TGROUP_COL in tf.columns:
        qv = qvocab.withColumn(BM25_TGROUP_COL, _tgroup_col())
        inlined = None
        if inline_terms_max and inline_terms_max > 0:
            rows = qv.limit(inline_terms_max + 1).collect()
            if len(rows) <= inline_terms_max:
                inlined = rows
        if inlined is not None:
            # literal filters: static partition pruning on the group
            # key + a pushed tok predicate the sorted layout answers
            # with file/row-group skipping (see docstring). The tok
            # IN is exact, so no join back to qvocab is needed.
            tgs = sorted({r[BM25_TGROUP_COL] for r in inlined})
            toks = [r["tok"] for r in inlined]
            pf = tf.where(
                F.col(BM25_TGROUP_COL).isin(tgs) & F.col("tok").isin(toks)
            ).drop(BM25_TGROUP_COL)
        else:
            pf = tf.join(F.broadcast(qv), ["tok", BM25_TGROUP_COL]).drop(
                BM25_TGROUP_COL
            )
    else:
        # r14 optimization: in the ad-hoc path `tf` is the LAZY
        # bm25_index aggregate over the whole corpus, and a broadcast
        # JOIN on tok sits ABOVE that aggregate — Spark never pushes a
        # join below an aggregate, so the corpus-sized
        # groupBy(doc_id, tok, dl) hash-agg + exchange ran over every
        # (doc, term) pair (the 2M×32-token bench tier shuffles ~64M
        # rows of which query terms match ~0.05%). Inlining the
        # bounded query vocabulary as an `isin` LITERAL filter (the
        # loaded-layout discipline above, same inline_terms_max cap)
        # turns it into a plain predicate on a grouping column, which
        # PushPredicateThroughNonJoin DOES push below the aggregate to
        # sit directly on the exploded token stream: the aggregate and
        # its exchange now see only query-matched postings
        # (guide §2.3 "aggregate before you shuffle" / §2.4). Result
        # rows are identical — a tok filter commutes with a groupBy
        # that keys on tok. Query batches past the cap keep the
        # broadcast-join form.
        inlined_toks = None
        if inline_terms_max and inline_terms_max > 0:
            rows = qvocab.limit(inline_terms_max + 1).collect()
            if len(rows) <= inline_terms_max:
                inlined_toks = [r["tok"] for r in rows]
        if inlined_toks is not None:
            pf = tf.where(
                F.col("tok").isin(inlined_toks) if inlined_toks else F.lit(False)
            )
        else:
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
    *ranked: DataFrame,
    k: int = 10,
    k0: int = RRF_K0,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal rank fusion (Cormack et al.) of N ≥ 2 ranked lists:
    rrf(d) = Σ_lists 1/(k0 + rank_list(d)), documents absent from a
    list contribute 0. Returns (query_id, doc_id, rrf, rank) with the
    fused top-k per query by (rrf desc, doc_id asc) on the
    6-dp-rounded score. Real hybrid stacks fuse three or more
    retrievers (BM25 + dense + a second dense/sparse list) —
    Cormack et al.'s formula is N-ary, so is this.

    Inputs are (query, doc, rank) lists — at most queries × k rows per
    list, so the union + one groupBy here is bounded by
    Σ_lists queries × k rows regardless of corpus size (a union fold
    beats N-1 chained full-outer joins: one shuffle, no join-order
    plan growth); the heavy lifting already happened in the
    retrievers."""
    if k <= 0:
        raise ValueError("k must be greater than 0")
    for i, df in enumerate(ranked):
        if not isinstance(df, DataFrame):
            # the r12 N-ary signature made k keyword-only: a legacy
            # rrf_fuse(a, b, 10) call now lands 10 HERE — fail with the
            # cause, not a downstream "'int' has no .select"
            raise TypeError(
                f"rrf_fuse positional argument {i + 1} is "
                f"{type(df).__name__}, not a DataFrame — every "
                "positional argument is a ranked list; k/k0 are "
                "keyword-only (pass k=...)"
            )
    if len(ranked) < 2:
        raise ValueError("rrf_fuse needs at least 2 ranked lists")

    def side(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            (F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col).cast("double"))).alias(
                "__r"
            ),
        )

    contrib = side(ranked[0])
    for df in ranked[1:]:
        contrib = contrib.unionByName(side(df))
    fused = contrib.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("__r"), 6).alias("rrf")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "rrf", "rank")
    )
