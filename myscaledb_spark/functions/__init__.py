from myscaledb_spark.functions.vector import (  # noqa: F401
    distance,
    l2_distance,
    l2_squared_distance,
    cosine_distance,
    ip_distance,
    vector_norm,
    hamming_distance,
    jaccard_distance,
)
from myscaledb_spark.functions.text import tokenize, bm25_scores, text_search  # noqa: F401
