"""Error types mirroring the reference's user-facing validation errors.

The reference raises typed exceptions for invalid search queries (e.g. one
search function per query → error 62, `tests/queries/2_vector_search/
00040_mqvs_hybrid_search.sql:17`; LIMIT required for distance() →
`src/Interpreters/TreeRewriter.cpp:1670-1680`; max_search_result_window
`src/Core/Settings.h:923`). We replicate the same validations at the API
layer so misuse fails fast with the same semantics.
"""


class MyScaleSparkError(Exception):
    """Base error for the engine."""


class InvalidSearchQuery(MyScaleSparkError):
    """Search query shape violates reference constraints
    (missing LIMIT/top-k, bad ORDER BY direction, >1 search fn, ...)."""


class DimensionMismatch(MyScaleSparkError):
    """Query vector dimension does not match the column constraint
    (reference: CONSTRAINT check_length CHECK length(vector) = N,
    src/VectorIndex/Utils/CommonUtils.cpp:61-97)."""


class UnknownMetric(MyScaleSparkError):
    """Metric must be one of L2 / Cosine / IP (Hamming / Jaccard for
    binary vectors) — src/Storages/MergeTree/MergeTreeSettings.h:183."""


# Reference caps (src/Core/Settings.h:923, src/VectorIndex/Common/VICommon.h)
MAX_SEARCH_RESULT_WINDOW = 10_000
DEFAULT_TOPK = 30
MAX_BRUTE_FORCE_SEARCH_SIZE = 50_000
