"""Strategy contract — the Spark analog of the reference's backend ABC
(vicinity/backends/base.py:42-107). A strategy owns the *physical
layout* of the vector DataFrame (extra columns such as LSH buckets or
IVF cluster ids) and the *plan* used for k-NN / threshold queries.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame

from vicinity_spark.datatypes import Backend, Metric


class IndexStrategy:
    """Base: build layout columns at ingest, plan queries at read time.

    Mirrors the abstract contract at base.py:42-107 (`from_vectors`,
    `query`, `threshold`, `insert`, `delete`) reshaped for DataFrames:
    build() decorates the corpus with layout columns; knn()/threshold()
    return result DataFrames; on_insert() re-decorates appended rows.
    """

    backend = Backend.BASIC
    #: strategies that guarantee exact results (recall 1.0)
    exact = True

    def __init__(self, **params):
        self.params = dict(params)

    def build(self, df: DataFrame, metric: Metric, dim: int) -> DataFrame:
        """Add layout columns. Default: none (flat layout)."""
        self.params["dim"] = int(dim)
        return df

    def on_insert(self, new_df: DataFrame, metric: Metric, dim: int) -> DataFrame:
        """Decorate appended rows with layout columns (F9 analog)."""
        return self.build(new_df, metric, dim)

    def knn(
        self,
        corpus: DataFrame,
        queries: DataFrame,
        k: int,
        metric: Metric,
        *,
        payload_cols: Optional[Sequence[str]] = None,
    ) -> DataFrame:
        raise NotImplementedError

    def threshold(
        self,
        corpus: DataFrame,
        queries: DataFrame,
        threshold: float,
        metric: Metric,
        *,
        payload_cols: Optional[Sequence[str]] = None,
    ) -> DataFrame:
        raise NotImplementedError

    # persistence of strategy state (e.g. fitted MLlib models, derived
    # index layouts such as LSH posting lists) ------------------------
    def save_extra(
        self, path: str, df: Optional[DataFrame] = None, *, adopt_layout: bool = True
    ) -> None:
        """``adopt_layout=False`` writes the layout without re-pointing
        any live strategy state at it — for saves into a staging folder
        that will not outlive the store (push_to_hub's temp dir)."""
        pass

    def load_extra(self, path: str, spark) -> None:
        pass

    def to_params(self) -> dict:
        return dict(self.params)
