"""Core enums and result types.

Parity notes (citations into /root/reference/):
- Metric enum + 13-alias resolver: vicinity/utils.py:58-91.
- Backend enum: vicinity/datatypes.py:20-27. The reference's seven
  backends are native ANN libraries; here a Backend names a *physical
  plan strategy* over the same DataFrame (SURVEY.md §2.2-2.3).
"""

from __future__ import annotations

from enum import Enum


class Metric(str, Enum):
    """Distance metrics (reference: vicinity/utils.py:58-65)."""

    COSINE = "cosine"
    EUCLIDEAN = "euclidean"
    MANHATTAN = "manhattan"
    INNER_PRODUCT = "inner_product"
    L2_SQUARED = "l2sq"
    HAMMING = "hamming"
    TANIMOTO = "tanimoto"

    @classmethod
    def from_string(cls, metric: "str | Metric") -> "Metric":
        """Alias resolver — same table as vicinity/utils.py:67-91."""
        if isinstance(metric, cls):
            return metric
        if isinstance(metric, str):
            mapping = {
                "cos": cls.COSINE,
                "cosine": cls.COSINE,
                "dot": cls.COSINE,
                "euclidean": cls.EUCLIDEAN,
                "l2": cls.EUCLIDEAN,
                "manhattan": cls.MANHATTAN,
                "l1": cls.MANHATTAN,
                "inner_product": cls.INNER_PRODUCT,
                "ip": cls.INNER_PRODUCT,
                "l2sq": cls.L2_SQUARED,
                "l2_squared": cls.L2_SQUARED,
                "hamming": cls.HAMMING,
                "tanimoto": cls.TANIMOTO,
            }
            key = metric.lower()
            if key in mapping:
                return mapping[key]
        raise ValueError(f"Unsupported metric: {metric}")


class Backend(str, Enum):
    """Physical plan strategies (reference enum: vicinity/datatypes.py:20-27).

    The reference's native-library backends map onto seven Spark-native
    strategies: graph-ANN backends (hnsw/usearch/voyager/pynndescent)
    are served by the NN-descent GRAPH strategy, annoy's projection
    forest by LSH — each at a declared recall floor (SURVEY.md §2.3
    B3-B7: recall is the contract, not the algorithm).
    """

    BASIC = "basic"  # exact brute-force join plan
    LSH = "lsh"  # random-projection LSH bucketed equi-join plan
    IVF = "ivf"  # MLlib KMeans cluster-pruned plan
    SQ = "sq"  # scalar-quantized codes + exact re-rank plan
    PQ = "pq"  # product-quantized codes + ADC lookup plan
    IVFPQ = "ivfpq"  # KMeans inverted lists + PQ codes (ADC within probed lists)
    IVFSQ = "ivfsq"  # KMeans inverted lists + SQ8 codes (faiss `ivf_scalar`)
    GRAPH = "graph"  # NN-descent k-NN graph + batched beam-expansion search

    @classmethod
    def from_string(cls, backend: "str | Backend") -> "Backend":
        if isinstance(backend, cls):
            return backend
        if isinstance(backend, str):
            key = backend.lower()
            # Accept the reference's backend names, mapped onto the
            # strategy that serves them (SURVEY.md §2.3).
            aliases = {
                "basic": cls.BASIC,
                "exact": cls.BASIC,
                "flat": cls.BASIC,
                "lsh": cls.LSH,
                "annoy": cls.LSH,
                "sq": cls.SQ,
                "scalar": cls.SQ,
                "pq": cls.PQ,
                "pqr": cls.PQ,
                "ivfpq": cls.IVFPQ,
                "ivfpqr": cls.IVFPQ,
                "ivfsq": cls.IVFSQ,
                "ivf_scalar": cls.IVFSQ,
                "ivf": cls.IVF,
                "faiss": cls.IVF,
                # graph-ANN backends → the NN-descent graph strategy
                # (hnsw.py / pynndescent.py / usearch / voyager are all
                # k-NN-graph searchers; backends/graph.py)
                "graph": cls.GRAPH,
                "hnsw": cls.GRAPH,
                "usearch": cls.GRAPH,
                "voyager": cls.GRAPH,
                "pynndescent": cls.GRAPH,
                "nndescent": cls.GRAPH,
            }
            if key in aliases:
                return aliases[key]
        raise ValueError(f"Unsupported backend: {backend}")
