from myscaledb_spark.operators.topk import vector_topk, batch_vector_topk  # noqa: F401
from myscaledb_spark.operators.hybrid import hybrid_search  # noqa: F401
from myscaledb_spark.operators.relational import (  # noqa: F401
    limit_by,
    asof_join,
    final_dedup,
    with_fill,
)
