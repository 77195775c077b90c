"""Scalar-quantization (SQ8) strategy — the Spark analog of FAISS's
compressed indexes (`scalar` SQ8 faiss.py:93-95, and the design slot
for `pq`/`ivfpq` faiss.py:96-110; SURVEY.md §4 "Compression" row).

Build: one aggregation pass computes per-dimension min/max; vectors are
quantized to uint8 codes (`__code: array<smallint>`), a 4× byte
reduction of the scan payload — at 100 TB that is the difference
between scanning 25 TB and 100 TB per query sweep. The codebook
(mins/scales, 2×dim doubles) lives in params/metadata.

Query: two-phase. Phase 1 scans only (id, __code), dequantizes in the
vectorized partial-top-k kernel, and keeps k×refine candidates per
query. Phase 2 re-ranks candidates with exact distances on the true
vectors — a broadcast join against the corpus touching only the
candidate rows. Recall is governed by `refine` (evaluate() gates it).
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vicinity_spark.backends.base import IndexStrategy
from vicinity_spark.datatypes import Backend, Metric
from vicinity_spark.functions.metrics import clip_distance
from vicinity_spark.operators.knn import _KNN_SCHEMA

CODE_COL = "__code"


class SQStrategy(IndexStrategy):
    backend = Backend.SQ
    exact = False

    def __init__(self, refine: int = 4, mins=None, scales=None, **params):
        super().__init__(refine=int(refine), mins=mins, scales=scales, **params)

    def build(self, df: DataFrame, metric: Metric, dim: int) -> DataFrame:
        self.params["dim"] = int(dim)
        if self.params.get("mins") is None or self.params.get("scales") is None:
            # fit once; PRESET bounds are honored (the constructor
            # accepts mins=/scales= — same contract as LSH's preset
            # means; the recall-summary branch and reloaded stores
            # depend on build not clobbering them)
            # one mapInPandas partial-agg pass (functions/stats.py):
            # plan width independent of dim, unlike 2×dim aggregates
            from vicinity_spark.functions.stats import vector_stats

            stats = vector_stats(df, "vector")
            mins = [float(x) for x in stats.min]
            maxs = [float(x) for x in stats.max]
            scales = [
                (mx - mn) / 255.0 if mx > mn else 1.0 for mn, mx in zip(mins, maxs)
            ]
            self.params["mins"], self.params["scales"] = mins, scales
        return df.withColumn(CODE_COL, self._encode_expr())

    def _encode_expr(self):
        mins = F.array(*[F.lit(m) for m in self.params["mins"]])
        scales = F.array(*[F.lit(s) for s in self.params["scales"]])
        return F.transform(
            F.col("vector"),
            lambda x, i: F.least(
                F.greatest(
                    F.round(
                        (x.cast("double") - F.element_at(mins, i + 1))
                        / F.element_at(scales, i + 1)
                    ),
                    F.lit(0.0),
                ),
                F.lit(255.0),
            ).cast("short"),
        )

    def on_insert(self, new_df: DataFrame, metric: Metric, dim: int) -> DataFrame:
        # codebook trained once at build (FAISS trains once, adds many:
        # faiss.py:24-32); new rows are encoded with the existing ranges
        return new_df.withColumn(CODE_COL, self._encode_expr())

    # ---- phase 1: approximate candidates over codes ------------------
    def _candidates(
        self, corpus: DataFrame, queries: DataFrame, k: int, metric: Metric
    ) -> DataFrame:
        """Block-grid quantized scan (same shape as the PQ path): corpus
        code blocks × query blocks, dequantize + chunked partial top-k
        inside each grid cell. The codebook (2×dim doubles) rides in the
        closure; query vectors arrive through the join — no driver
        collect of the query table."""
        from vicinity_spark.operators.grid import (
            cell_arrays,
            corpus_blocks,
            dense_cell_topk,
            query_blocks,
        )

        mins = np.asarray(self.params["mins"])
        scales = np.asarray(self.params["scales"])
        kk = max(k * self.params["refine"], k)
        grid = corpus_blocks(corpus, CODE_COL).crossJoin(query_blocks(queries))

        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for i in range(len(pdf)):
                    ids, codes, qids, Q = cell_arrays(pdf, i)
                    X = codes.astype(np.float64) * scales[None, :] + mins[None, :]
                    yield dense_cell_topk(qids, ids, X, Q, metric, kk)

        return grid.mapInPandas(fn, _KNN_SCHEMA)

    def knn(
        self,
        corpus: DataFrame,
        queries: DataFrame,
        k: int,
        metric: Metric,
        *,
        payload_cols: Optional[Sequence[str]] = None,
    ) -> DataFrame:
        if k < 1:
            raise ValueError("k must be greater than 0")
        cand = self._candidates(corpus, queries, k, metric)
        # keep k×refine best approx candidates globally per query
        w0 = Window.partitionBy("query_id").orderBy(F.col("distance").asc_nulls_last(), F.col("id"))
        kk = max(k * self.params["refine"], k)
        cand = cand.withColumn("__r0", F.row_number().over(w0)).where(F.col("__r0") <= kk)
        # phase 2: exact re-rank on true vectors (candidates are tiny →
        # broadcast them into a hash join against the corpus; scored by
        # the shared vectorized kernel, operators/knn.py score_joined)
        from vicinity_spark.operators.knn import score_joined

        # no broadcast hint: cand scales with the query batch; AQE
        # broadcasts it at runtime when it is actually small
        joined = cand.select("query_id", "id").join(
            corpus.select("id", "vector"), "id"
        )
        exact = score_joined(joined, queries, metric)
        w = Window.partitionBy("query_id").orderBy(F.col("distance").asc_nulls_last(), F.col("id"))
        out = (
            exact.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .withColumn("distance", clip_distance(F.col("distance")))
        )
        if payload_cols:
            out = out.join(corpus.select("id", *payload_cols), "id", "left")
        return out.select("query_id", "id", "distance", "rank", *(payload_cols or []))

    def threshold(
        self,
        corpus: DataFrame,
        queries: DataFrame,
        threshold: float,
        metric: Metric,
        *,
        payload_cols: Optional[Sequence[str]] = None,
        max_k: int = 100,
    ) -> DataFrame:
        """ANN threshold: top-max_k candidate pool then exact `<=` filter
        (the reference's ANN backends cap candidates at max_k the same
        way: hnsw.py:107-114, usearch.py:131-139)."""
        res = self.knn(corpus, queries, k=max_k, metric=metric, payload_cols=payload_cols)
        return res.where(F.col("distance") <= F.lit(float(threshold))).drop("rank")
