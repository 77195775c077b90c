"""Shared fixtures, modeled on the reference suite's seeded fixtures
(/root/reference/tests/conftest.py:9,24-27,43-51): rng seed 42,
uniform [0,1) vectors, items alternating plain strings and structs.
Sized down (500×8) — the reference uses 10,000×8; semantics identical.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from vicinity_spark.session import get_spark

N_ROWS = 500
DIM = 8


@pytest.fixture(scope="session")
def spark():
    s = get_spark("vicinity-spark-tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def rng_data():
    rng = np.random.default_rng(42)
    vectors = rng.random((N_ROWS, DIM))
    qvec = rng.random(DIM)
    return vectors, qvec


@pytest.fixture(scope="session")
def corpus_df(spark, rng_data):
    vectors, _ = rng_data
    # items alternate str / struct like conftest.py:24-27 (i starts at 1)
    rows = []
    for i in range(1, N_ROWS + 1):
        if i % 2 == 0:
            rows.append((i - 1, "str", f"item{i}", None, None, [float(x) for x in vectors[i - 1]]))
        else:
            rows.append((i - 1, "struct", None, f"item{i}", i, [float(x) for x in vectors[i - 1]]))
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("item_kind", StringType()),
            StructField("item_str", StringType()),
            StructField("item_name", StringType()),
            StructField("item_id", LongType()),
            StructField("vector", ArrayType(FloatType())),
        ]
    )
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="session")
def queries_df(spark, rng_data):
    _, qvec = rng_data
    schema = StructType(
        [StructField("query_id", LongType()), StructField("qvec", ArrayType(FloatType()))]
    )
    return spark.createDataFrame([(0, [float(x) for x in qvec])], schema)


@pytest.fixture(scope="session")
def np_oracle(rng_data):
    """Numpy ground-truth kernels, a clean-room mirror of the reference's
    BASIC backend math (basic.py:218-222, 241-247) in float32-ingest
    precision (vectors are stored as float in the DataFrame)."""
    vectors, qvec = rng_data
    X = vectors.astype(np.float32).astype(np.float64)
    q = qvec.astype(np.float32).astype(np.float64)

    def topk(metric: str, k: int):
        if metric == "cosine":
            xh = X / np.linalg.norm(X, axis=1, keepdims=True)
            qh = q / np.linalg.norm(q)
            d = 1.0 - xh @ qh
        elif metric == "euclidean":
            d = np.sqrt(((X - q) ** 2).sum(axis=1))
        else:
            raise ValueError(metric)
        order = np.lexsort((np.arange(len(d)), d))[:k]
        return order, d[order]

    return topk
