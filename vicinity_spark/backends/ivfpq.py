"""IVF-PQ composite strategy — the Spark analog of FAISS `ivfpq`
(faiss.py:105-110: coarse KMeans inverted lists + product-quantized
residual codes; here codes quantize the raw vectors for simplicity,
like FAISS's `IndexIVFPQ` without residual encoding refinements).

Build = IVF build (KMeans `__cluster` layout, centroids in metadata)
then PQ encode (`__pqcode`). Query = per-query nprobe cluster sets are
shipped into the ADC kernel, which masks rows outside the query's
probed clusters before the lookup-table scan — so each query pays only
for its inverted lists even within a shared partition scan — then the
usual exact re-rank. Scan payload per row: 4 bytes cluster + m bytes
code, independent of dim.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from vicinity_spark.backends.ivf import CLUSTER_COL, IVFStrategy
from vicinity_spark.backends.pq import CODE_COL, PQStrategy
from vicinity_spark.datatypes import Backend, Metric
from vicinity_spark.operators.knn import _KNN_SCHEMA


class IVFPQStrategy(PQStrategy):
    backend = Backend.IVFPQ
    exact = False

    def __init__(self, nlist: int = 32, nprobe: int = 4, centroids=None, **params):
        super().__init__(centroids=centroids, **params)
        self.params["nlist"] = int(nlist)
        self.params["nprobe"] = int(nprobe)
        self._ivf = IVFStrategy(
            nlist=int(nlist), nprobe=int(nprobe), seed=self.params["seed"], centroids=centroids
        )

    def build(self, df: DataFrame, metric: Metric, dim: int) -> DataFrame:
        out = self._ivf.build(df, metric, dim)  # __cluster + centroids
        self.params["centroids"] = self._ivf.params["centroids"]
        return super().build(out, metric, dim)  # codebooks + __pqcode

    def on_insert(self, new_df: DataFrame, metric: Metric, dim: int) -> DataFrame:
        self._ivf.params["centroids"] = self.params["centroids"]
        return super().on_insert(self._ivf.on_insert(new_df, metric, dim), metric, dim)

    def _probe_sets(self, Q: np.ndarray) -> "dict[int, np.ndarray]":
        C = np.asarray(self.params["centroids"], dtype=np.float64)
        nprobe = min(self.params["nprobe"], len(C))
        D = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return np.argsort(D, axis=1)[:, :nprobe]

    def _query_payload(self, queries: DataFrame, metric: Metric):
        """Broadcast[(qids, tables, probes)] — ADC tables plus each
        query's nprobe cluster set (probed on the raw space)."""
        from vicinity_spark.operators.knn import query_matrix

        qids, Qraw = query_matrix(queries)
        return queries.sparkSession.sparkContext.broadcast(
            (qids, self._adc_tables(Qraw, metric), self._probe_sets(Qraw))
        )

    def _candidates(self, corpus: DataFrame, bt, k: int, metric: Metric) -> DataFrame:
        m = self.params["m"]
        kk = max(k * self.params["refine"], k)

        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            qids, tables, probes = bt.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                codes = np.vstack(pdf[CODE_COL].to_numpy()).astype(np.int64)
                clusters = pdf[CLUSTER_COL].to_numpy()
                ids = pdf["id"].to_numpy()
                D = tables[:, np.arange(m), codes].sum(axis=2)  # nq × n
                # inverted-list pruning: +inf outside each query's probes
                for qi in range(D.shape[0]):
                    D[qi, ~np.isin(clusters, probes[qi])] = np.inf
                cap = min(kk, D.shape[1])
                idx = np.argpartition(D, cap - 1, axis=1)[:, :cap]
                dd = np.take_along_axis(D, idx, axis=1)
                keep = np.isfinite(dd)
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(qids, cap)[keep.ravel()],
                        "id": ids[idx.ravel()][keep.ravel()],
                        "distance": dd.ravel()[keep.ravel()],
                    }
                )

        return corpus.select("id", CODE_COL, CLUSTER_COL).mapInPandas(fn, _KNN_SCHEMA)
