from myscaledb_spark.plans.vector_index import (  # noqa: F401
    build_ivf_index,
    ivf_search,
    IndexRegistry,
)
