"""BM25 retrieval + reciprocal rank fusion (operators/retrieval.py).

The closed-form reference is a direct transcription of Okapi BM25 with
the Lucene idf — the same formula the DuckDB oracle replays for the
`docs_bm25_topk` / `docs_hybrid_rrf` gate rows.
"""

import math
from collections import Counter

import pytest

from vicinity_spark.operators.retrieval import bm25_topk, rrf_fuse

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "cats and dogs living together"),
    (3, "spark shuffles the big  data"),  # double space: empty tok dropped
    (4, "the the the the"),
    (5, ""),  # zero-length doc still counts toward N and avgdl
]


def _tok(t):
    return [w for w in t.lower().split(" ") if w]


def _ref_bm25(query_text, k1=1.2, b=0.75):
    corpus = {i: _tok(t) for i, t in DOCS}
    n = len(DOCS)
    dls = {i: len(ts) for i, ts in corpus.items()}
    avgdl = sum(dls.values()) / n
    out = {}
    for d, toks in corpus.items():
        tf = Counter(toks)
        s = 0.0
        for t in set(_tok(query_text)):
            if tf[t] == 0:
                continue
            df = sum(1 for ts in corpus.values() if t in ts)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf[t] * (k1 + 1) / (tf[t] + k1 * (1 - b + b * dls[d] / avgdl))
        if s > 0:
            out[d] = round(s, 6)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_closed_form(spark, docs_df):
    qdf = spark.createDataFrame(
        [(0, DOCS[0][1]), (3, DOCS[3][1])], "doc_id long, text string"
    )
    got = {
        (r["query_id"], r["doc_id"]): (r["bm25"], r["rank"])
        for r in bm25_topk(docs_df, qdf, k=10).collect()
    }
    for qid, qtext in [(0, DOCS[0][1]), (3, DOCS[3][1])]:
        ref = _ref_bm25(qtext)
        ranked = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
        assert {(qid, d) for d in ref} == {k for k in got if k[0] == qid}
        for rank, (d, score) in enumerate(ranked, start=1):
            assert got[(qid, d)] == (score, rank)
    # self-match ranks first in query-by-example
    assert got[(0, 0)][1] == 1 and got[(3, 3)][1] == 1


def test_bm25_k_cut_and_no_match(spark, docs_df):
    qdf = spark.createDataFrame(
        [(0, DOCS[0][1]), (9, "zzz qqq")], "doc_id long, text string"
    )
    rows = bm25_topk(docs_df, qdf, k=2).collect()
    by_q = Counter(r["query_id"] for r in rows)
    assert by_q[0] == 2  # cut at k
    assert 9 not in by_q  # no term matches → no rows
    assert all(r["rank"] <= 2 for r in rows)


def test_bm25_validates_k(spark, docs_df):
    with pytest.raises(ValueError):
        bm25_topk(docs_df, docs_df.limit(1), k=0)
    with pytest.raises(ValueError):
        rrf_fuse(docs_df, docs_df, k=0)


def test_hard_negatives(spark):
    """Self row and textual near-dups drop; survivors re-rank by
    distance; an empty-token candidate vs a non-empty query scores
    Jaccard 0 and survives (trivially not a near-dup) — both engines
    agree, so the oracle row pins the same rule."""
    from vicinity_spark.operators.retrieval import hard_negatives

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma delta"),  # exact dup of the query
            (2, "alpha beta zzz qqq"),  # jaccard 2/6 — hard negative
            (3, "www xxx yyy zzz2"),  # disjoint — hard negative
            (4, ""),  # empty token set → jaccard 0, kept
        ],
        "doc_id long, text string",
    )
    neighbors = spark.createDataFrame(
        [(0, 0, 0.0), (0, 1, 0.05), (0, 2, 0.2), (0, 3, 0.3), (0, 4, 0.25)],
        "query_id long, id long, distance double",
    )
    rows = hard_negatives(neighbors, docs, k=10).orderBy("rank").collect()
    assert [(r["doc_id"], r["rank"]) for r in rows] == [(2, 1), (4, 2), (3, 3)]
    assert rows[0]["jaccard"] == round(2 / 6, 6)
    assert rows[1]["jaccard"] == 0.0 and rows[2]["jaccard"] == 0.0
    # k cuts after the exclusion, not before
    assert len(hard_negatives(neighbors, docs, k=1).collect()) == 1
    with pytest.raises(ValueError):
        hard_negatives(neighbors, docs, k=0)


def test_hard_negatives_prefers_retriever_rank(spark):
    """When the neighbor list carries the retriever's rank, the
    re-rank follows IT — not the (possibly clipped) distance column:
    knn_join ranks by RAW distance and clips only the output, so two
    candidates both showing distance 0.0 must keep their raw order,
    not fall back to doc_id."""
    from vicinity_spark.operators.retrieval import hard_negatives

    docs = spark.createDataFrame(
        [(0, "q tokens here"), (7, "aa bb"), (3, "cc dd")],
        "doc_id long, text string",
    )
    # doc 7 ranked FIRST by the retriever (raw d < 0 clipped to 0.0)
    neighbors = spark.createDataFrame(
        [(0, 7, 0.0, 1), (0, 3, 0.0, 2)],
        "query_id long, id long, distance double, rank long",
    )
    rows = hard_negatives(neighbors, docs, k=10).orderBy("rank").collect()
    assert [r["doc_id"] for r in rows] == [7, 3]
    # without a rank column, the fallback is (distance, doc_id)
    rows2 = hard_negatives(
        neighbors.drop("rank"), docs, k=10
    ).orderBy("rank").collect()
    assert [r["doc_id"] for r in rows2] == [3, 7]


def test_rrf_closed_form(spark):
    # query 1: doc 10 in both lists, docs 11/12 in one each
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(1, 10, 2), (1, 12, 1)], "query_id long, doc_id long, rank long"
    )
    got = {
        r["doc_id"]: (r["rrf"], r["rank"])
        for r in rrf_fuse(a, b, k=10).collect()
    }
    both = round(1 / 61 + 1 / 62, 6)
    only_first_rank1 = round(1 / 61, 6)
    only_second_rank2 = round(1 / 62, 6)
    assert got[10] == (both, 1)
    assert got[12] == (only_first_rank1, 2)
    assert got[11] == (only_second_rank2, 3)


def test_bm25_plan_shape(spark, docs_df):
    """Pin the 100 TB posture: the query side reaches the corpus ONLY
    through broadcasts (no shuffle of the corpus keyed on anything but
    the tf aggregate), document frequencies are a map-side-combined
    aggregate broadcast back (never a partitionBy(tok) window — a hot
    query term would funnel its whole postings list into one task),
    and the top-k cut runs as WindowGroupLimit (rank pushed below the
    final exchange)."""
    qdf = docs_df.where("doc_id < 2")
    plan = (
        bm25_topk(docs_df, qdf, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") <= 5, plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # query side must never shuffle the corpus
    assert "WindowGroupLimit" in plan
    # exactly one ranking window (query_id top-k); df must not be one
    assert plan.count("Window ") <= 1, plan


@pytest.mark.slow
def test_bm25_partitioning_invariant(spark, docs_df):
    """Results identical under a different corpus partitioning — the
    6-dp rounding before the rank absorbs partial-sum reordering."""
    qdf = docs_df.where("doc_id < 2")
    a = sorted(map(tuple, bm25_topk(docs_df, qdf, k=5).collect()))
    b = sorted(map(tuple, bm25_topk(docs_df.repartition(7), qdf, k=5).collect()))
    assert a == b


@pytest.mark.slow
def test_stream_bm25_serve_matches_batch(spark, tmp_path):
    """r11: lexical serving twin — the union of per-trigger BM25
    top-k rows equals one batch bm25_topk pass over the same queries,
    and the injected-index path (bm25_index → postings/stats) is
    value-identical to the self-computed path."""
    import datetime as dt

    from pyspark.sql import functions as F

    from vicinity_spark.operators.retrieval import bm25_index
    from vicinity_spark.streaming.query import stream_bm25_serve

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    queries = docs.where("doc_id < 4").select(
        F.col("doc_id").alias("query_id"), "text"
    )
    want = sorted(
        (r["query_id"], r["doc_id"], r["bm25"], r["rank"])
        for r in bm25_topk(
            docs, queries, k=5, query_id_col="query_id"
        ).collect()
    )
    # injected-index parity in batch
    p, s = bm25_index(docs)
    got_injected = sorted(
        (r["query_id"], r["doc_id"], r["bm25"], r["rank"])
        for r in bm25_topk(
            None, queries, k=5, query_id_col="query_id", postings=p, stats=s
        ).collect()
    )
    assert got_injected == want

    t0 = dt.datetime(2024, 1, 1)
    src = tmp_path / "bm25_stream_src"
    halves = [queries.where("query_id < 2"), queries.where("query_id >= 2")]
    for i, h in enumerate(halves):
        h.withColumn(
            "ts", F.lit(t0 + dt.timedelta(minutes=i)).cast("timestamp")
        ).coalesce(1).write.parquet(str(src / f"b{i}"))
    stream = (
        spark.readStream.schema("query_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    got = []
    w = stream_bm25_serve(
        docs,
        stream,
        k=5,
        sink=lambda df, bid: got.extend(
            (r.query_id, r.doc_id, r.bm25, r.rank) for r in df.collect()
        ),
    )
    q = w.trigger(availableNow=True).start()
    q.awaitTermination(180)
    assert sorted(got) == want


def test_rrf_tie_breaks_by_doc_id(spark):
    a = spark.createDataFrame(
        [(1, 20, 1), (1, 7, 1)], "query_id long, doc_id long, rank long"
    )  # impossible as one retriever's output, but pins the tie rule
    empty = a.where("doc_id < 0")
    rows = rrf_fuse(a, empty, k=10).orderBy("rank").collect()
    assert [r["doc_id"] for r in rows] == [7, 20]
    assert rows[0]["rrf"] == rows[1]["rrf"]


def test_bm25_duplicate_query_row_harmless(spark, docs_df):
    """r11 ADVICE: a repeated query row must not double every score —
    qterms is globally distinct, so the duplicated frame scores
    identically to the single-row one."""
    qdf = docs_df.where("doc_id = 0")
    want = sorted(map(tuple, bm25_topk(docs_df, qdf, k=10).collect()))
    doubled = qdf.unionByName(qdf)
    got = sorted(map(tuple, bm25_topk(docs_df, doubled, k=10).collect()))
    assert got == want


def test_rrf_three_lists_closed_form(spark):
    """r12: N-ary fusion (Cormack et al. is N-ary) — three lists, one
    doc in all three, one in two, one in one; fewer than two lists
    rejected."""
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(1, 10, 2), (1, 11, 1)], "query_id long, doc_id long, rank long"
    )
    c = spark.createDataFrame(
        [(1, 10, 3), (1, 12, 1)], "query_id long, doc_id long, rank long"
    )
    got = {
        r["doc_id"]: (r["rrf"], r["rank"])
        for r in rrf_fuse(a, b, c, k=10).collect()
    }
    assert got[10] == (round(1 / 61 + 1 / 62 + 1 / 63, 6), 1)
    assert got[11] == (round(1 / 62 + 1 / 61, 6), 2)
    assert got[12] == (round(1 / 61, 6), 3)
    with pytest.raises(ValueError):
        rrf_fuse(a, k=10)
    with pytest.raises(ValueError):
        rrf_fuse(k=10)


@pytest.mark.slow
def test_bm25_index_roundtrip(spark, docs_df, tmp_path):
    """r12 (VERDICT r11 item 4): build → save → load → bm25_topk
    equality with the in-session index, and the loaded layout's scan
    is partition-pruned to the query terms' term groups (the __tg
    DPP discipline of the LSH posting layout)."""
    from vicinity_spark.operators.retrieval import (
        BM25_TGROUP_COL,
        bm25_index,
        bm25_index_load,
        bm25_index_save,
    )
    from vicinity_spark.plans.checks import explain_str

    p, s = bm25_index(docs_df)
    folder = str(tmp_path / "bm25_layout")
    bm25_index_save(p, s, folder)
    lp, ls = bm25_index_load(spark, folder)
    assert BM25_TGROUP_COL in lp.columns
    qdf = docs_df.where("doc_id < 2")
    want = sorted(
        map(tuple, bm25_topk(None, qdf, k=5, postings=p, stats=s).collect())
    )
    res = bm25_topk(None, qdf, k=5, postings=lp, stats=ls)
    assert sorted(map(tuple, res.collect())) == want
    # result column schema carries no layout internals
    assert res.columns == ["query_id", "doc_id", "bm25", "rank"]
    # small query vocab → inlined literals: STATIC partition pruning
    # on the group key + a pushed tok predicate over the sorted files
    plan = explain_str(res)
    part = plan.split("PartitionFilters", 1)
    assert len(part) == 2, plan  # postings read as a partitioned scan
    assert BM25_TGROUP_COL + "#" in part[1][:400] and " IN " in part[1][:400], plan
    assert (
        "PushedFilters" in plan
        and "In(tok" in plan.split("PushedFilters")[1][:400]
    ), plan
    # large-batch fallback (inline disabled): dynamic partition pruning
    res_dpp = bm25_topk(
        None, qdf, k=5, postings=lp, stats=ls, inline_terms_max=0
    )
    assert sorted(map(tuple, res_dpp.collect())) == want
    plan2 = explain_str(res_dpp)
    part2 = plan2.split("PartitionFilters", 1)
    assert len(part2) == 2, plan2
    assert "dynamicpruning" in part2[1][:400], plan2


@pytest.mark.slow
def test_bm25_index_append_equals_rebuild(spark):
    """r12 (VERDICT r11 item 7): appending a batch to an index equals
    rebuilding from the concatenated corpus — postings row-identical,
    stats algebra exact, and the appended index scores identically.
    Also exercised against a LOADED (term-group-partitioned) layout,
    the serving lifecycle: load → append → re-save."""
    from vicinity_spark.operators.retrieval import (
        bm25_index,
        bm25_index_append,
        bm25_index_load,
        bm25_index_save,
    )

    base = spark.createDataFrame(DOCS[:4], "doc_id long, text string")
    batch = spark.createDataFrame(DOCS[4:], "doc_id long, text string")
    full = base.unionByName(batch)
    p0, s0 = bm25_index(base)
    ap, as_ = bm25_index_append(p0, s0, batch)
    rp, rs = bm25_index(full)
    assert sorted(map(tuple, ap.collect())) == sorted(map(tuple, rp.collect()))
    assert as_.collect() == rs.collect()
    qdf = full.where("doc_id in (0, 4)")
    want = sorted(
        map(tuple, bm25_topk(None, qdf, k=10, postings=rp, stats=rs).collect())
    )
    got = sorted(
        map(tuple, bm25_topk(None, qdf, k=10, postings=ap, stats=as_).collect())
    )
    assert got == want


@pytest.mark.slow
def test_bm25_index_append_on_loaded_layout(spark, tmp_path):
    """Append onto a loaded layout: the batch rows adopt the
    partition key so the union re-saves without special casing, and a
    reloaded re-save scores like the full rebuild."""
    from vicinity_spark.operators.retrieval import (
        bm25_index,
        bm25_index_append,
        bm25_index_load,
        bm25_index_save,
    )

    base = spark.createDataFrame(DOCS[:4], "doc_id long, text string")
    batch = spark.createDataFrame(DOCS[4:], "doc_id long, text string")
    full = base.unionByName(batch)
    folder = str(tmp_path / "bm25_layout_v1")
    bm25_index_save(*bm25_index(base), folder)
    lp, ls = bm25_index_load(spark, folder)
    ap, as_ = bm25_index_append(lp, ls, batch)
    folder2 = str(tmp_path / "bm25_layout_v2")
    bm25_index_save(ap.drop("__tg"), as_, folder2)
    lp2, ls2 = bm25_index_load(spark, folder2)
    rp, rs = bm25_index(full)
    qdf = full.where("doc_id in (0, 4)")
    want = sorted(
        map(tuple, bm25_topk(None, qdf, k=10, postings=rp, stats=rs).collect())
    )
    got = sorted(
        map(tuple, bm25_topk(None, qdf, k=10, postings=lp2, stats=ls2).collect())
    )
    assert got == want


def test_bm25_index_resave_over_same_folder(spark, docs_df, tmp_path):
    """load → append → save back to the SAME folder — the natural
    daily batch maintenance cycle. Without the lineage guard the
    overwrite deletes the part files the loaded postings plan still
    scans (the store.py save-over-same-folder hazard); with it the
    re-saved layout equals the full rebuild."""
    from vicinity_spark.operators.retrieval import (
        bm25_doclens,
        bm25_index,
        bm25_index_append,
        bm25_index_load,
        bm25_index_save,
    )

    base = docs_df.where("doc_id < 4")
    batch = docs_df.where("doc_id >= 4")
    folder = str(tmp_path / "bm25_resave")
    bm25_index_save(*bm25_index(base), folder, doclens=bm25_doclens(base))
    lp, ls = bm25_index_load(spark, folder)
    ap, as_ = bm25_index_append(lp, ls, batch)
    dl = spark.read.parquet(f"{folder}/bm25_doclens").unionByName(
        bm25_doclens(batch)
    )
    bm25_index_save(ap, as_, folder, doclens=dl)
    lp2, ls2 = bm25_index_load(spark, folder)
    rp, rs = bm25_index(docs_df)
    assert sorted(map(tuple, lp2.drop("__tg").collect())) == sorted(
        map(tuple, rp.collect())
    )
    assert ls2.collect() == rs.collect()
    assert sorted(
        r.doc_id for r in spark.read.parquet(f"{folder}/bm25_doclens").collect()
    ) == list(range(6))


def test_rrf_fuse_rejects_non_dataframe(spark):
    """r13 (r12 ADVICE): the N-ary signature made k keyword-only — a
    legacy positional rrf_fuse(a, b, 10) must fail IMMEDIATELY with a
    TypeError naming the change, not an opaque downstream
    AttributeError on int."""
    from vicinity_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 100, 1)], "query_id long, doc_id long, rank long"
    )
    with pytest.raises(TypeError, match="keyword-only"):
        rrf_fuse(a, a, 10)
    with pytest.raises(TypeError, match="argument 1"):
        rrf_fuse(None, a)


def test_bm25_index_load_pins_stats(spark, docs_df, tmp_path):
    """r13 (VERDICT r12 item 5): the one-row stats frame is pinned at
    load — a serving session keeps ITS stats snapshot even after the
    underlying parquet is overwritten (the per-trigger behavior of
    stream_bm25_ingest), while a fresh load sees the new file."""
    from vicinity_spark.operators.retrieval import (
        bm25_index,
        bm25_index_load,
        bm25_index_save,
    )

    layout = str(tmp_path / "pin_layout")
    bm25_index_save(*bm25_index(docs_df), layout)
    _, stats = bm25_index_load(spark, layout)
    before = stats.collect()
    # simulate the ingest loop's per-trigger stats rewrite
    spark.createDataFrame(
        [(999.0, 42.0)], "n_docs double, avgdl double"
    ).write.mode("overwrite").parquet(f"{layout}/bm25_stats")
    assert stats.collect() == before  # pinned: still the load snapshot
    _, stats2 = bm25_index_load(spark, layout)
    assert stats2.collect()[0]["n_docs"] == 999.0  # fresh load sees it


def test_bm25_adhoc_inline_filter_equals_join(spark, docs_df):
    """r14 optimization: the ad-hoc path inlines the (bounded) query
    vocabulary as a literal filter on the corpus tf aggregate — the
    predicate pushes BELOW the aggregate (a broadcast join cannot), so
    the corpus-sized (doc, term) hash-agg shrinks to query-matched
    postings. Must be row-identical to the broadcast-join plan
    (inline_terms_max=0 forces it), and the inline plan must carry one
    FEWER BroadcastHashJoin (the qvocab join replaced by the pushed
    filter)."""
    qdf = docs_df.where("doc_id < 2")
    new = bm25_topk(docs_df, qdf, k=5)
    old = bm25_topk(docs_df, qdf, k=5, inline_terms_max=0)
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, old.collect()))
    # the ad-hoc localCheckpoint hides pf's lineage from the final
    # plan, so assert the shape on the LAZY injected-postings form
    # (ad_hoc False → no checkpoint): the inline plan replaces the
    # qvocab broadcast join with a filter PUSHED BELOW the tf
    # aggregate (it must sit under the partial HashAggregate, next to
    # the Generate that explodes the token stream)
    from vicinity_spark.operators.retrieval import bm25_index

    postings, stats = bm25_index(docs_df)
    new_l = bm25_topk(None, qdf, k=5, postings=postings, stats=stats)
    old_l = bm25_topk(None, qdf, k=5, postings=postings, stats=stats, inline_terms_max=0)
    assert sorted(map(tuple, new_l.collect())) == sorted(map(tuple, old_l.collect()))
    p_new = new_l._jdf.queryExecution().executedPlan().toString()
    p_old = old_l._jdf.queryExecution().executedPlan().toString()
    # pf feeds two consumers (df + score), so the join plan pays the
    # qvocab broadcast join per consumer; the inline plan replaces
    # every one of them with the pushed literal filter
    assert p_new.count("BroadcastHashJoin") < p_old.count("BroadcastHashJoin"), p_new
    filt = p_new.index("Filter tok#")
    assert p_new.index("HashAggregate") < filt, p_new[:2000]
    assert p_new.index("Generate explode", filt) > filt, p_new[:2000]
