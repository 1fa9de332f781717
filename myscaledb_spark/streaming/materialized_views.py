"""Materialized views — the reference's insert-trigger transformation chain
(`src/Processors/Transforms/buildPushingToViewsChain.cpp`: every INSERT into
the source table pushes transformed blocks into each dependent view's target
table) and LIVE VIEW (`src/Storages/LiveView/`, continuously refreshed
result).

Spark mapping:
  - MV chain = one streaming query whose foreachBatch applies EVERY view's
    transformation to the incoming micro-batch and appends to its target —
    same fan-out-on-ingest semantics, exactly-once per micro-batch.
  - LIVE VIEW = a complete-mode streaming aggregation (the in-memory/table
    result is always the full refreshed answer).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class MaterializedViewChain:
    """Register (name, transform, target_path) views over one source stream;
    run() ingests with availableNow and pushes each batch through every view
    (≈ buildPushingToViewsChain)."""

    def __init__(self) -> None:
        self.views: list[tuple[str, Callable[[DataFrame], DataFrame], str]] = []

    def add_view(
        self, name: str, transform: Callable[[DataFrame], DataFrame], target_path: str
    ) -> "MaterializedViewChain":
        self.views.append((name, transform, target_path))
        return self

    def run(self, source_stream: DataFrame, checkpoint_dir: str) -> None:
        def push(batch: DataFrame, batch_id: int) -> None:
            batch.persist()
            try:
                for _, transform, target in self.views:
                    transform(batch).write.mode("append").parquet(target)
            finally:
                batch.unpersist()

        q = (
            source_stream.writeStream.foreachBatch(push)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    @staticmethod
    def read_view(spark: SparkSession, target_path: str) -> DataFrame:
        return spark.read.parquet(target_path)
