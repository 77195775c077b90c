"""Metric kernels vs numpy ground truth, HOF path and chain path
(dim-specialized) must agree with each other and with numpy."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from vicinity_spark.functions.metrics import (
    distance_expr,
    l2_norm,
    normalize_expr,
    sq_norm,
)

DIM = 8
N = 50


def np_dist(metric, A, B):
    if metric == "cosine":
        na = np.linalg.norm(A, axis=1)
        nb = np.linalg.norm(B, axis=1)
        return 1.0 - (A * B).sum(1) / (na * nb)
    if metric == "euclidean":
        return np.sqrt(((A - B) ** 2).sum(1))
    if metric == "manhattan":
        return np.abs(A - B).sum(1)
    if metric == "inner_product":
        return 1.0 - (A * B).sum(1)
    if metric == "l2sq":
        return ((A - B) ** 2).sum(1)
    if metric == "hamming":
        return (A != B).sum(1).astype(float)
    if metric == "tanimoto":
        dot = (A * B).sum(1)
        return 1.0 - dot / ((A * A).sum(1) + (B * B).sum(1) - dot)
    raise ValueError(metric)


@pytest.fixture(scope="module")
def pairs_df(spark):
    rng = np.random.default_rng(7)
    A = rng.random((N, DIM)).astype(np.float32)
    B = rng.random((N, DIM)).astype(np.float32)
    schema = StructType(
        [
            StructField("i", LongType()),
            StructField("a", ArrayType(FloatType())),
            StructField("b", ArrayType(FloatType())),
        ]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in A[i]], [float(x) for x in B[i]]) for i in range(N)], schema
    )
    return df, A.astype(np.float64), B.astype(np.float64)


ALL_METRICS = ["cosine", "euclidean", "manhattan", "inner_product", "l2sq", "hamming", "tanimoto"]


@pytest.mark.parametrize("metric", ALL_METRICS)
@pytest.mark.parametrize("dim", [None, DIM])
def test_distance_matches_numpy(pairs_df, metric, dim):
    df, A, B = pairs_df
    res = (
        df.select("i", distance_expr(metric, F.col("a"), F.col("b"), dim).alias("d"))
        .orderBy("i")
        .collect()
    )
    got = np.array([r.d for r in res])
    want = np_dist(metric, A, B)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("metric", ALL_METRICS)
def test_chain_and_hof_paths_identical(pairs_df, metric):
    # the dim-specialized chain must be IEEE-identical to the HOF fold
    df, _, _ = pairs_df
    res = df.select(
        distance_expr(metric, F.col("a"), F.col("b"), None).alias("hof"),
        distance_expr(metric, F.col("a"), F.col("b"), DIM).alias("chain"),
    ).collect()
    for r in res:
        assert r.hof == r.chain  # bitwise equality, not approx


def test_norms_and_normalize(spark, pairs_df):
    df, A, _ = pairs_df
    res = df.select(
        "i",
        l2_norm(F.col("a")).alias("n"),
        sq_norm(F.col("a")).alias("n2"),
        normalize_expr(F.col("a")).alias("unit"),
    ).orderBy("i").collect()
    np.testing.assert_allclose([r.n for r in res], np.linalg.norm(A, axis=1), rtol=1e-6)
    np.testing.assert_allclose([r.n2 for r in res], (A * A).sum(1), rtol=1e-6)
    units = np.array([r.unit for r in res])
    np.testing.assert_allclose(np.linalg.norm(units, axis=1), 1.0, rtol=1e-6)


def test_normalize_zero_vector(spark):
    schema = StructType([StructField("a", ArrayType(FloatType()))])
    df = spark.createDataFrame([([0.0, 0.0, 0.0],)], schema)
    r = df.select(normalize_expr(F.col("a")).alias("u")).first()
    assert r.u == [0.0, 0.0, 0.0]  # utils.py:9-42 zero-vector contract


# ---- property-based invariants (hypothesis) -------------------------
# The reference's kernels satisfy these by construction; our Catalyst
# expressions must too, for ANY input — including the adversarial
# vectors hypothesis finds (zeros, denormals, repeated values).

from hypothesis import given, settings
from hypothesis import strategies as st

_finite = st.floats(
    min_value=-100.0, max_value=100.0, allow_nan=False, allow_infinity=False, width=32
)
_vec = st.lists(_finite, min_size=4, max_size=4)


@settings(max_examples=15, deadline=None)
@given(a=_vec, b=_vec)
@pytest.mark.slow
def test_metric_properties_hold(spark_prop, a, b):
    """Symmetry d(a,b)=d(b,a), identity d(a,a)∈{0,·}, clip ≥ 0, and
    kernel-vs-numpy agreement for every metric on arbitrary vectors."""
    spark = spark_prop
    df = spark.createDataFrame([(a, b), (b, a), (a, a)], "va array<float>, vb array<float>")
    for metric in ["cosine", "euclidean", "manhattan", "l2sq", "hamming", "tanimoto"]:
        got = df.select(
            F.greatest(distance_expr(metric, "va", "vb", dim=4), F.lit(0.0)).alias("d")
        ).collect()
        dab, dba, daa = (r["d"] for r in got)
        assert dab == pytest.approx(dba, rel=1e-9, abs=1e-9), (metric, a, b)
        A = np.array([a], dtype=np.float64)
        B = np.array([b], dtype=np.float64)
        expect = max(float(np_dist(metric, A, B)[0]), 0.0)
        if not np.isnan(expect):
            assert dab == pytest.approx(expect, rel=1e-6, abs=1e-6), (metric, a, b)
        if metric in ("euclidean", "manhattan", "l2sq", "hamming"):
            assert daa == pytest.approx(0.0, abs=1e-9)


@pytest.fixture(scope="module")
def spark_prop(spark):
    # hypothesis re-invokes the test many times; reuse the session
    return spark
