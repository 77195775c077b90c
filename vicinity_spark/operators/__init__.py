from vicinity_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_lsh_pairs_incremental,
    minhash_lsh_pairs_rowwise,
    shingles,
    simhash_fingerprints,
    simhash_fingerprints_rowwise,
    simhash_pairs,
    token_set,
)
from vicinity_spark.operators.embedding import pca_projection, random_projection
from vicinity_spark.operators.knn import knn_join, neardup_join, threshold_join
from vicinity_spark.operators.pii import pii_scan, redact_pii
from vicinity_spark.operators.sampling import (
    dsir_sample,
    dsir_select,
    dsir_weights,
    hash_split,
    stratified_hash_split,
)
from vicinity_spark.operators.skew import salted_aggregate, salted_join

__all__ = [
    "connected_components",
    "dsir_sample",
    "dsir_select",
    "dsir_weights",
    "exact_dedup",
    "hash_split",
    "jaccard_pairs",
    "knn_join",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_incremental",
    "minhash_lsh_pairs_rowwise",
    "neardup_join",
    "pca_projection",
    "pii_scan",
    "random_projection",
    "redact_pii",
    "salted_aggregate",
    "salted_join",
    "shingles",
    "simhash_fingerprints",
    "simhash_fingerprints_rowwise",
    "simhash_pairs",
    "stratified_hash_split",
    "threshold_join",
    "token_set",
]
