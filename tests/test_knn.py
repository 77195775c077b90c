import numpy as np
import pytest
from pyspark.sql import functions as F

from vicinity_spark.operators.knn import knn_join, threshold_join


@pytest.mark.parametrize("algorithm", ["window", "partial"])
@pytest.mark.parametrize("metric", ["cosine", "euclidean"])
def test_knn_matches_numpy_oracle(corpus_df, queries_df, np_oracle, metric, algorithm):
    k = 10
    res = (
        knn_join(corpus_df, queries_df, k=k, metric=metric, algorithm=algorithm)
        .orderBy("rank")
        .collect()
    )
    ids_expected, dists_expected = np_oracle(metric, k)
    assert [r.id for r in res] == list(ids_expected)
    np.testing.assert_allclose([r.distance for r in res], dists_expected, rtol=1e-6)
    assert all(r.distance >= 0 for r in res)
    # ascending distance (vicinity.py:114-138)
    d = [r.distance for r in res]
    assert d == sorted(d)


def test_knn_k_clamped_to_corpus(corpus_df, queries_df):
    small = corpus_df.limit(5)
    res = knn_join(small, queries_df, k=50, metric="cosine").collect()
    assert len(res) == 5  # k clamp: basic.py:191-192


def test_knn_k_below_one_raises(corpus_df, queries_df):
    with pytest.raises(ValueError):
        knn_join(corpus_df, queries_df, k=0)


@pytest.mark.parametrize("algorithm", ["window", "partial"])
def test_knn_duplicate_queries_identical(corpus_df, queries_df, algorithm):
    # determinism: duplicated query rows give identical results
    # (reference tests/test_vicinity.py:58-64)
    dup = queries_df.union(queries_df.withColumn("query_id", F.lit(1)))
    res = knn_join(corpus_df, dup, k=5, metric="cosine", algorithm=algorithm).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append((r.rank, r.id, round(r.distance, 12)))
    assert sorted(by_q[0]) == sorted(by_q[1])


def test_threshold_semantics(corpus_df, queries_df, np_oracle):
    # exact path: `distance <= t`, no candidate cap (basic.py:149-172)
    ids_expected, dists = np_oracle("cosine", 500)
    t = float(dists[49])  # threshold at the 50th smallest distance
    res = threshold_join(corpus_df, queries_df, threshold=t, metric="cosine").collect()
    got = sorted(r.id for r in res)
    want = sorted(int(i) for i, d in zip(ids_expected, dists) if d <= t + 1e-12)
    assert got == want
    assert all(r.distance <= t for r in res)


def test_knn_payload_cols(corpus_df, queries_df):
    res = knn_join(
        corpus_df, queries_df, k=3, metric="cosine", payload_cols=["item_str", "item_name"]
    ).collect()
    assert len(res) == 3
    for r in res:
        assert (r.item_str is not None) or (r.item_name is not None)
