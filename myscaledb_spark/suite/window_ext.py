"""GROUPS window frame + geo-function gate entries.

GROUPS frame: neither Spark nor DuckDB implements GROUPS mode, so the Spark
side uses operators.relational.window_groups_frame (dense_rank → RANGE
rewrite) and the oracle spells the same rewrite in SQL — two independent
executions of the rewrite on two engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register


@register(
    "projection_rollup",
    """
    SELECT o_orderstatus, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total,
           ROUND(CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS mx
    FROM orders GROUP BY o_orderstatus
    """,
)
def projection_rollup(spark, sf_dir):
    """Aggregate projection end-to-end (ProjectionsDescription.h /
    optimizeUseAggregateProjection.cpp): build partial states keyed by
    (status, priority), then answer a status-only rollup by RE-MERGING the
    states — DECIMAL measures make the re-merge bit-exact, so the driver
    oracle (direct aggregation) must agree."""
    import tempfile

    from myscaledb_spark.plans.projections import ProjectionSet

    base = load_table(spark, sf_dir, "orders").withColumn(
        "price_dec", F.col("o_totalprice").cast("decimal(18,2)")
    )
    ps = ProjectionSet(tempfile.mkdtemp(prefix="gate_proj_"))
    ps.build(base, "by_sp", ["o_orderstatus", "o_orderpriority"], ["price_dec"])
    assert ps.routed_source(["o_orderstatus"], {"total": ("sum", "price_dec")})
    out = ps.aggregate(
        spark,
        base,
        ["o_orderstatus"],
        {"n": ("count", "*"), "total": ("sum", "price_dec"), "mx": ("max", "price_dec")},
    )
    return out.select(
        "o_orderstatus",
        "n",
        F.round(F.col("total").cast("double"), 2).alias("total"),
        F.round(F.col("mx").cast("double"), 2).alias("mx"),
    )


_SAMPLE_THRESHOLD = int(0.1 * (1 << 48))


@register(
    "sample_deterministic",
    f"""
    WITH s AS (
      SELECT * FROM orders
      WHERE CAST(('0x' || substr(md5('0:' || CAST(o_orderkey AS VARCHAR)), 1, 12)) AS BIGINT)
            < {_SAMPLE_THRESHOLD}
    )
    SELECT COUNT(*) AS n,
           ROUND(CAST(SUM(o_totalprice) AS DOUBLE), 2) AS total,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
    FROM s
    """,
)
def sample_deterministic(spark, sf_dir):
    """SAMPLE 0.1 with a deterministic sampling key: hash(key) < k·2^48 —
    the same rows on every run/engine (reference SAMPLE BY semantics;
    `df.sample` is seed-stable but partitioning-dependent, this is not)."""
    from myscaledb_spark.operators.relational import sample_by

    o = load_table(spark, sf_dir, "orders")
    s = sample_by(o, "o_orderkey", 0.1)
    return s.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice").cast("double"), 2).alias("total"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@register(
    "geo_distance_topk",
    """
    WITH pts AS (
      SELECT c_custkey,
             CAST((c_custkey % 170) - 85 AS DOUBLE) + 0.5 AS lat,
             CAST(((c_custkey * 7) % 350) - 175 AS DOUBLE) + 0.5 AS lon
      FROM customer
    ),
    h AS (
      SELECT c_custkey,
             (radians(48.85) - radians(lat)) / 2.0 AS dlat,
             (radians(2.35) - radians(lon)) / 2.0 AS dlon,
             radians(lat) AS rlat1, radians(48.85) AS rlat2
      FROM pts
    ),
    d AS (
      SELECT c_custkey,
             12742000.0 * asin(sqrt(
               sin(dlat) * sin(dlat)
               + cos(rlat1) * cos(rlat2) * sin(dlon) * sin(dlon))) AS dist
      FROM h
    )
    SELECT c_custkey, ROUND(dist, 2) AS dist_m
    FROM d ORDER BY dist ASC, c_custkey ASC LIMIT 20
    """,
)
def geo_distance_topk(spark, sf_dir):
    """greatCircleDistance (haversine, meters) nearest-20 to a fixed point;
    coordinates synthesized deterministically from c_custkey on both sides
    (greatCircleDistance.cpp — lon,lat argument order)."""
    from myscaledb_spark.functions.ch_compat import greatCircleDistance

    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 170 - 85).cast("double") + 0.5).alias("lat"),
        (((F.col("c_custkey") * 7) % 350 - 175).cast("double") + 0.5).alias("lon"),
    )
    d = pts.select(
        "c_custkey",
        greatCircleDistance("lon", "lat", F.lit(2.35), F.lit(48.85)).alias("dist"),
    )
    return (
        d.orderBy(F.col("dist").asc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", F.round("dist", 2).alias("dist_m"))
    )


@register(
    "groups_frame_sum",
    """
    WITH r AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate) AS gr
      FROM orders
    )
    SELECT o_orderkey,
           ROUND(CAST(SUM(o_totalprice) OVER (
             PARTITION BY o_orderpriority ORDER BY gr
             RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS grp_sum
    FROM r
    """,
)
def groups_frame_sum(spark, sf_dir):
    """SUM OVER (... GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW): current
    peer group (same o_orderdate) plus the full previous peer group."""
    from myscaledb_spark.operators.relational import window_groups_frame

    o = load_table(spark, sf_dir, "orders")
    out = window_groups_frame(
        o,
        F.sum("o_totalprice"),
        order_by="o_orderdate",
        partition_by=["o_orderpriority"],
        preceding=1,
        following=0,
        out="grp_sum",
    )
    return out.select(
        "o_orderkey", F.round(F.col("grp_sum").cast("double"), 2).alias("grp_sum")
    )
