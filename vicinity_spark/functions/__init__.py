from vicinity_spark.functions.metrics import (
    distance_expr,
    dot_product,
    l1_distance,
    l2_norm,
    normalize_expr,
    sq_norm,
)

__all__ = [
    "distance_expr",
    "dot_product",
    "l1_distance",
    "l2_norm",
    "normalize_expr",
    "sq_norm",
]
