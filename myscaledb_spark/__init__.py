"""myscaledb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of myscale/MyScaleDB (ClickHouse fork with SQL
vector / full-text / hybrid search).

This is NOT a port of the reference C++ engine: the relational core is
expressed directly on Spark SQL / DataFrame (Catalyst optimizes it), and the
novel surface — vector search, BM25 text search, hybrid fusion, plus
LLM-data-pipeline operators (dedup, similarity, text analysis, multimodal) —
is built Spark-first from declarative DataFrame plans, with Arrow-batched
pandas UDFs only where built-ins cannot express the semantics.

Reference parity map: SURVEY.md §2 (operator inventory).
"""

__version__ = "0.1.0"

from myscaledb_spark.session import get_spark  # noqa: F401
from myscaledb_spark.catalog import TABLES, load_tables, register_views  # noqa: F401
