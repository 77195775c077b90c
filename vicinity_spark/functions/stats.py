"""Build-time per-dimension statistics over a vector column.

One Arrow-vectorized mapInPandas pass emits a single partial row
(count, sum, min, max arrays) per partition; the handful of partials
combine on the driver. The alternative — one driver-composed aggregate
expression per dimension (`F.avg(element_at(...))` × dim) — produces a
plan whose width grows with dim and is pathological at dim 2048+. Here
the plan is a constant 4-column shape at any dimensionality, and the
shuffle is num_partitions rows.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_PARTIAL_SCHEMA = (
    "n bigint, s array<double>, mn array<double>, mx array<double>"
)


@dataclass
class VectorStats:
    count: int
    mean: np.ndarray
    min: np.ndarray
    max: np.ndarray


def vector_stats(df: DataFrame, vector_col: str = "vector") -> VectorStats:
    """Per-dimension count/mean/min/max of an array column in one pass."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, mn, mx = 0, None, None, None
        for b in batches:
            if len(b) == 0:
                continue
            X = np.vstack(b[vector_col].to_numpy()).astype(np.float64)
            n += len(X)
            if s is None:
                s, mn, mx = X.sum(axis=0), X.min(axis=0), X.max(axis=0)
            else:
                s = s + X.sum(axis=0)
                mn = np.minimum(mn, X.min(axis=0))
                mx = np.maximum(mx, X.max(axis=0))
        if n:
            yield pd.DataFrame({"n": [n], "s": [s], "mn": [mn], "mx": [mx]})

    rows = df.select(vector_col).mapInPandas(partials, _PARTIAL_SCHEMA).collect()
    if not rows:
        raise ValueError("vector_stats over an empty DataFrame")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"], dtype=np.float64) for r in rows], axis=0)
    mn = np.min([np.asarray(r["mn"], dtype=np.float64) for r in rows], axis=0)
    mx = np.max([np.asarray(r["mx"], dtype=np.float64) for r in rows], axis=0)
    return VectorStats(count=int(n), mean=s / n, min=mn, max=mx)
