from vicinity_spark.operators.knn import knn_join, threshold_join

__all__ = ["knn_join", "threshold_join"]
