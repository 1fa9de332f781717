from myscaledb_spark.streaming.windows import (  # noqa: F401
    events_stream,
    hop,
    run_to_memory,
    tumble,
)
