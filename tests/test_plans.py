"""Plan-shape assertions: the properties that make these operators
viable at 100 TB must hold in the physical plan, not just in intent."""

import pytest
from pyspark.sql import functions as F

from vicinity_spark.plans import (
    assert_no_cartesian,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_cols,
)

SF_DIR = "/root/testdata/sf0.001"


def test_knn_window_broadcasts_queries(spark, corpus_df, queries_df):
    from vicinity_spark.operators.knn import knn_join

    df = knn_join(corpus_df, queries_df, k=5, metric="cosine", algorithm="window")
    assert has_broadcast_join(df)  # queries side must broadcast
    assert_no_cartesian(df)


def test_parquet_filter_pushdown_and_pruning(spark):
    from vicinity_spark.queries import _t

    li = _t(spark, SF_DIR, "lineitem").where(F.col("l_quantity") > 30).select("l_orderkey")
    filters = pushed_filters(li)
    assert any("l_quantity" in f for f in filters), filters
    cols = read_schema_cols(li)
    # projection pruning: only the two referenced columns are read
    assert cols and set(cols[0]) <= {"l_orderkey", "l_quantity"}, cols


def test_knn_query_scan_prunes_payload(spark):
    from vicinity_spark.queries import QUERIES

    from vicinity_spark.queries import _make_knn

    df = _make_knn("cosine")(spark, SF_DIR)
    for cols in read_schema_cols(df):
        assert "label" not in cols  # payload not referenced → never read


def test_q3_dimension_join_broadcasts(spark):
    from vicinity_spark.queries import QUERIES

    df = QUERIES["q3_top_revenue_orders"](spark, SF_DIR)
    s = explain_str(df, "simple")
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s
    # customer filter pushed to scan
    assert any("c_mktsegment" in f for f in pushed_filters(df))


def test_lsh_candidate_plan_is_equijoin(spark, corpus_df, queries_df):
    from vicinity_spark.backends.lsh import LSHStrategy
    from vicinity_spark.datatypes import Metric

    strat = LSHStrategy(n_tables=4, n_bits=6)
    corpus = strat.build(corpus_df, Metric.COSINE, 8)
    df = strat.knn(corpus, queries_df, k=5, metric=Metric.COSINE)
    s = explain_str(df, "simple")
    # candidate generation must be a hash equi-join on (table, bucket),
    # never a nested-loop scan of the corpus
    assert "CartesianProduct" not in s
    assert "BroadcastHashJoin" in s or "SortMergeJoin" in s


def test_simhash_pairs_plan_is_blocking_equijoin(spark):
    from vicinity_spark.operators.dedup import simhash_fingerprints, simhash_pairs
    from vicinity_spark.queries import _t

    fp = simhash_fingerprints(_t(spark, SF_DIR, "documents"))
    df = simhash_pairs(fp, max_hamming=3)
    s = explain_str(df, "simple")
    # the Hamming-ball pair search must block on bit chunks (equi-join),
    # never enumerate all fingerprint pairs
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s
    assert "BroadcastHashJoin" in s or "SortMergeJoin" in s or "ShuffledHashJoin" in s


def test_partial_topk_shuffle_is_bounded(spark, corpus_df, queries_df):
    from vicinity_spark.operators.knn import knn_join

    df = knn_join(corpus_df, queries_df, k=5, metric="cosine", algorithm="partial")
    s = explain_str(df, "simple")
    # the merge window consumes the mapInPandas output (q×k×partitions
    # rows), not the raw cross product: no join at all in this plan
    assert "MapInPandas" in s
    assert "CartesianProduct" not in s and "Join" not in s.replace("MapInPandas", "")


def test_connected_components_rounds_are_equijoins(spark):
    from vicinity_spark.operators.dedup import connected_components

    ids = spark.createDataFrame([(i,) for i in range(50)], "id long")
    pairs = spark.createDataFrame([(i, i + 1) for i in range(0, 40, 2)], "id_a long, id_b long")
    df = connected_components(ids, pairs, max_iters=3)
    s = explain_str(df, "simple")
    # label propagation must shuffle on keys, never enumerate pairs
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s


def test_train_split_is_narrow(spark):
    """hash_split adds a projection only: no shuffle (Exchange), no
    join, no RNG — the property that makes it retry-stable."""
    from vicinity_spark.operators.sampling import hash_split
    from vicinity_spark.queries import _t

    df = hash_split(_t(spark, SF_DIR, "documents"))
    s = explain_str(df, "simple")
    assert "Exchange" not in s
    assert "rand" not in s.lower()


def test_vocab_counts_prune_scan(spark):
    from vicinity_spark.queries import QUERIES

    df = QUERIES["vocab_top_tokens"](spark, SF_DIR)
    for cols in read_schema_cols(df):
        # only lang + text are referenced; doc payload columns pruned
        assert set(cols) <= {"lang", "text"}, cols
