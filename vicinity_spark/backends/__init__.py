"""Strategy registry — the Spark analog of the reference's backend
resolution (vicinity/backends/__init__.py:22-63). No lazy imports /
optional-dependency machinery needed: every strategy is pure PySpark.
"""

from __future__ import annotations

from vicinity_spark.backends.base import IndexStrategy
from vicinity_spark.backends.exact import ExactStrategy
from vicinity_spark.datatypes import Backend

_REGISTRY: "dict[Backend, type[IndexStrategy]]" = {
    Backend.BASIC: ExactStrategy,
}


def register_strategy(backend: Backend, cls: "type[IndexStrategy]") -> None:
    _REGISTRY[backend] = cls


def get_strategy_class(backend: "str | Backend") -> "type[IndexStrategy]":
    _register_builtin()
    b = Backend.from_string(backend)
    if b not in _REGISTRY:
        raise ValueError(f"no strategy registered for backend {b}")
    return _REGISTRY[b]


def _register_builtin() -> None:
    # late imports avoid a cycle through MLlib-backed strategies
    from vicinity_spark.backends.graph import GraphStrategy
    from vicinity_spark.backends.ivf import IVFStrategy
    from vicinity_spark.backends.lsh import LSHStrategy
    from vicinity_spark.backends.ivfpq import IVFPQStrategy
    from vicinity_spark.backends.ivfsq import IVFSQStrategy
    from vicinity_spark.backends.pq import PQStrategy
    from vicinity_spark.backends.sq import SQStrategy

    _REGISTRY.setdefault(Backend.LSH, LSHStrategy)
    _REGISTRY.setdefault(Backend.IVF, IVFStrategy)
    _REGISTRY.setdefault(Backend.SQ, SQStrategy)
    _REGISTRY.setdefault(Backend.PQ, PQStrategy)
    _REGISTRY.setdefault(Backend.IVFPQ, IVFPQStrategy)
    _REGISTRY.setdefault(Backend.IVFSQ, IVFSQStrategy)
    _REGISTRY.setdefault(Backend.GRAPH, GraphStrategy)


__all__ = ["IndexStrategy", "get_strategy_class", "register_strategy"]
