"""JDBC federation source/sink.

Reference parity: the `jdbc`/`mysql`/`postgresql` table engines and table
functions (src/Storages/registerStorages.cpp:63-88,
src/TableFunctions/registerTableFunctions.cpp:22-63) — a remote RDBMS table
exposed as a queryable/writable relation. Spark's native JDBC data source is
the identical capability; these wrappers pin the scale-correct defaults:

  - reads are PARTITIONED (partition_column/bounds/num_partitions) so a
    1000-executor cluster issues N range-sliced queries instead of one
    driver-side full scan;
  - Catalyst pushes filters and column pruning into the remote query
    (`PushedFilters` in the scan node), so the database ships only the
    needed rows/columns;
  - writes batch through `batchsize` and are transactional per partition.

Tested end-to-end against Apache Derby's embedded driver (the only JDBC
engine present in this container — derby-10.16 ships with Spark for the Hive
metastore); against MySQL/Postgres only the url/driver strings change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_dir: str, create: bool = True) -> str:
    """Embedded-Derby JDBC URL rooted at `db_dir`."""
    suffix = ";create=true" if create else ""
    return f"jdbc:derby:{db_dir}{suffix}"


def _quiet_derby(spark: SparkSession) -> None:
    # keep derby.log out of the working directory
    spark._jvm.java.lang.System.setProperty(  # noqa: SLF001
        "derby.stream.error.file", "/tmp/derby.log"
    )


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    mode: str = "overwrite",
    batchsize: int = 10_000,
    column_types: str | None = None,
) -> None:
    """INSERT the DataFrame into a remote JDBC table (one transaction per
    partition, `batchsize` rows per round trip).

    Pass `column_types` (e.g. ``"status VARCHAR(1), name VARCHAR(25)"``) for
    string columns that will appear in pushed-down predicates: Spark's
    default StringType mapping on some dialects (Derby: CLOB) is not
    comparable, so a pushed `col = 'x'` filter errors remotely.
    """
    _quiet_derby(df.sparkSession)
    w = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batchsize))
    )
    if column_types:
        w = w.option("createTableColumnTypes", column_types)
    w.mode(mode).save()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 1,
) -> DataFrame:
    """Read a remote JDBC table. With `partition_column` + bounds the scan
    splits into `num_partitions` range-sliced parallel queries — the shape
    that survives a 100 TB fact table behind a sharded MySQL tier. Filters
    and projections on the returned DataFrame push down into the remote SQL.
    """
    _quiet_derby(spark)
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "read_jdbc: partition_column requires lower_bound and "
                "upper_bound (Spark needs the range to slice the scan)"
            )
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return r.load()
