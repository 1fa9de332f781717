"""Bitmap-family gate entry (`src/Functions/FunctionsBitmap.cpp` analog).

Retention-style audience overlap: per-event-type user bitmaps, then pairwise
AND/OR/XOR/ANDNOT cardinalities. The oracle computes the same set algebra
from grouped distinct counts (|A∩B| by join, |A∪B| = |A|+|B|-|A∩B|, ...) —
an independent formulation, so a bug in the array expressions can't cancel.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register


@register(
    "bitmap_retention",
    """
    WITH u AS (SELECT DISTINCT event_type, user_id FROM events WHERE value > 180),
    c AS (SELECT event_type, COUNT(*) AS n FROM u GROUP BY 1),
    pairs AS (
      SELECT ca.event_type AS type_a, cb.event_type AS type_b,
             ca.n AS na, cb.n AS nb
      FROM c ca JOIN c cb ON ca.event_type < cb.event_type
    ),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS and_card
      FROM u a JOIN u b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b,
           COALESCE(i.and_card, 0) AS and_card,
           p.na + p.nb - COALESCE(i.and_card, 0) AS or_card,
           p.na - COALESCE(i.and_card, 0) AS andnot_card,
           p.na + p.nb - 2 * COALESCE(i.and_card, 0) AS xor_card
    FROM pairs p
    LEFT JOIN inter i ON i.type_a = p.type_a AND i.type_b = p.type_b
    """,
)
def bitmap_retention(spark, sf_dir):
    from myscaledb_spark.functions.bitmap import (
        bitmap_and_cardinality,
        bitmap_andnot_cardinality,
        bitmap_or_cardinality,
        bitmap_xor_cardinality,
        group_bitmap_state,
    )

    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 180)
    bm = ev.groupBy("event_type").agg(group_bitmap_state("user_id").alias("bm"))
    a = bm.select(F.col("event_type").alias("type_a"), F.col("bm").alias("bma"))
    b = bm.select(F.col("event_type").alias("type_b"), F.col("bm").alias("bmb"))
    pairs = a.crossJoin(b).filter(F.col("type_a") < F.col("type_b"))
    return pairs.select(
        "type_a",
        "type_b",
        bitmap_and_cardinality("bma", "bmb").alias("and_card"),
        bitmap_or_cardinality("bma", "bmb").alias("or_card"),
        bitmap_andnot_cardinality("bma", "bmb").alias("andnot_card"),
        bitmap_xor_cardinality("bma", "bmb").alias("xor_card"),
    )
