"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2), registered
in ``myscaledb_spark.suite``.
``oracle_sql()`` — DuckDB-equivalent SQL per query for the correctness gate.

Column names are aliased identically on both sides; floats are computed with
the same double association order on both sides (or exact DECIMAL for money)
then rounded identically; every top-k is tie-broken by a unique id.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from myscaledb_spark import suite  # noqa: E402
from myscaledb_spark.session import tune_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: vector top-k on sf0.001 (the MyScale core path)."""
    tune_session(spark)
    return suite.queries()["vec_l2_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return suite.queries()


def oracle_sql() -> dict[str, str]:
    return suite.oracles()
