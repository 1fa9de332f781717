"""Grouped-aggregate pandas UDAFs — the §2.12 surface for aggregations
Spark's native functions genuinely can't express (reference analog:
user-defined aggregate functions via executable UDFs,
`src/Functions/UserDefined/`).

Kept deliberately small: every relational aggregate in this repo stays
native (that's the fast path); a UDAF earns its place only when the state
is non-scalar. `avg_vector` is the canonical case — element-wise mean of an
array<float/double> column (embedding centroids) — which native Spark can
only reach via posexplode + two shuffles; the grouped-agg pandas UDF does
it in one grouped pass with Arrow-batched numpy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def avg_vector(col: Column | str, dim_hint: str = "array<double>") -> Column:
    """Element-wise mean of an array column per group (embedding centroid).

    Usage: df.groupBy("g").agg(avg_vector("embedding").alias("centroid")).
    NULL arrays are skipped (like AVG); result is NULL for all-NULL groups.
    """
    import numpy as np
    from pyspark.sql.functions import PandasUDFType

    # explicit GROUPED_AGG functionType: the type-hint inference path does
    # not support array-typed aggregate returns
    @F.pandas_udf(dim_hint, PandasUDFType.GROUPED_AGG)
    def _avg_vec(s):
        vals = [np.asarray(v, dtype=np.float64) for v in s if v is not None]
        if not vals:
            return None
        return np.mean(np.stack(vals), axis=0).tolist()

    c = F.col(col) if isinstance(col, str) else col
    return _avg_vec(c)
