"""Multimodal gate: deterministic BMP round-trip through the REAL executor
codec (operators/imagecodec.py — pure-numpy decode/resize/encode), oracle-
backed: the image parameters derive from doc_id, so DuckDB predicts the
byte size, decoded dimensions, and the resized blue-channel pixel sum
ARITHMETICALLY while Spark recomputes them from actual pixels. This makes
the media plumbing (Arrow-batched mapInPandas, the sanctioned Python
surface) hash-green instead of pytest-only."""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register

_RW, _RH = 6, 8  # resize target


@register(
    "multimodal_roundtrip",
    f"""
    WITH d AS (
      SELECT doc_id,
             CAST(doc_id % 13 + 4 AS INT) AS w,
             CAST(doc_id % 7 + 3 AS INT) AS h
      FROM documents WHERE doc_id < 64
    ),
    cells AS (
      SELECT d.doc_id, d.w, d.h,
             SUM(((x.range * d.w // {_RW}) * 31
                  + (y.range * d.h // {_RH}) * 17
                  + d.doc_id * 101) % 256) AS blue_sum
      FROM d, range(0, {_RW}) x, range(0, {_RH}) y
      GROUP BY 1, 2, 3
    )
    SELECT doc_id, w, h,
           CAST(54 + h * ((w * 3 + 3) // 4 * 4) AS INT) AS n_bytes,
           CAST(blue_sum AS BIGINT) AS blue_sum
    FROM cells
    ORDER BY doc_id
    """,
)
def multimodal_roundtrip_q(spark, sf_dir):
    """Per document (doc_id < 64): synthesize a (doc_id%13+4) ×
    (doc_id%7+3) BMP in the executors, decode it with the real codec,
    nearest-neighbor resize to 6×8, and report byte size / decoded dims /
    resized blue-channel sum — all three independently predicted by the
    oracle's integer arithmetic (blue = (x*31 + y*17 + seed*101) % 256 and
    the BMP row padding formula)."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 64).select(
        "doc_id"
    )

    def _batches(it):
        from myscaledb_spark.operators.imagecodec import (
            decode_image,
            generate_bmp,
            resize_nearest,
        )

        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 13 + 4, d % 7 + 3
                bmp = generate_bmp(w, h, seed=d)
                arr = decode_image(bmp)
                resized = resize_nearest(arr, _RW, _RH)
                rows.append(
                    (
                        d,
                        int(arr.shape[1]),
                        int(arr.shape[0]),
                        len(bmp),
                        int(resized[:, :, 2].astype("int64").sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "w", "h", "n_bytes", "blue_sum"]
            )

    out = docs.mapInPandas(
        _batches, "doc_id long, w int, h int, n_bytes int, blue_sum long"
    )
    return out.orderBy("doc_id")
