from vector_database_spark.functions.vector import (
    cosine_similarity,
    dot,
    euclidean,
    euclidean_sq,
    l2_norm,
    linf_distance,
    normalize,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "euclidean",
    "euclidean_sq",
    "l2_norm",
    "linf_distance",
    "normalize",
]
