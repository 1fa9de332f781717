"""Multimodal columns: image/audio/video as opaque BinaryType + typed
metadata (driver brief: first-class training-data-pipeline components;
reference analog: ObjectToFetch + getObject(),
`src/DataTypes/DataTypeObjectToFetch.h:9-31`, `src/Functions/getObject.cpp`).

Spark-side plumbing is REAL and tested: schemas, Arrow-batched mapInPandas
transforms, partition sizing, deterministic fake feature extraction. Image
decode is REAL for BMP/PPM via the builtin pure-numpy codec (imagecodec.py),
with PIL preferred when importable; other codecs (jpeg/ffmpeg/soundfile)
raise a clearly-marked NotImplementedError. Embedding extraction keeps the
deterministic sha-seeded fake (no model weights in the container).

Scale notes: media blobs make rows huge — transforms use mapInPandas (Arrow
batches stream through Python without materializing a partition in memory)
and `media_repartition` targets a fixed MB-per-task budget so 100 TB of
blobs doesn't create 10-GB tasks.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _try_decode_image(content: bytes):
    """Decode to an (H, W, 3) uint8 ndarray. Prefers PIL when importable;
    falls back to the builtin pure-numpy BMP/PPM codec (imagecodec.py).
    Raises NotImplementedError only for formats neither path can read."""
    try:
        from PIL import Image
        import io
        import numpy as np

        return np.asarray(Image.open(io.BytesIO(content)).convert("RGB"))
    except ImportError:
        pass
    from myscaledb_spark.operators.imagecodec import UnsupportedImage, decode_image

    try:
        return decode_image(content)
    except UnsupportedImage as e:
        raise NotImplementedError(
            f"image decode: {e} (install Pillow for other formats)"
        ) from e


def fake_features(content: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for an embedding model: sha256-seeded floats.
    Same bytes → same vector on every executor, every run."""
    h = hashlib.sha256(content).digest()
    out = []
    for i in range(dim):
        b = h[(2 * i) % 32] << 8 | h[(2 * i + 1) % 32]
        out.append(round((b / 65535.0) * 2.0 - 1.0, 6))
    return out


def extract_features(df: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """content → feature vector, Arrow-batched. The mapInPandas shape here
    (iterator of batches in, iterator out, column-pruned) is the template for
    any real model inference step."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, shas, nb = [], [], []
            for content in pdf["content"]:
                raw = bytes(content)
                if use_real_decoder:
                    _try_decode_image(raw)  # raises if codec missing
                feats.append(fake_features(raw))
                shas.append(hashlib.sha256(raw).hexdigest())
                nb.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nb,
                    "content_sha": shas,
                    "features": feats,
                }
            )

    # pass ONLY the columns the function reads across the Arrow boundary:
    # Spark cannot see inside mapInPandas, so an unprojected frame would
    # ship (and read from storage) every column (guide §4.1)
    return df.select("media_id", "kind", "content").mapInPandas(
        _batches, _FEATURES_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → frame-timestamp plan (decode stubbed): one row per sampled
    frame timestamp, derived from duration metadata JVM-side — the explode
    happens BEFORE any Python so Spark sizes partitions on the fanned-out
    rows."""
    n_frames = F.greatest(
        (F.col("duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
        .select("media_id", "frame_idx", "frame_ts_ms", "content")
    )


def media_repartition(df: DataFrame, target_mb_per_task: int = 64) -> DataFrame:
    """Repartition by blob volume, not row count: counts bytes once and
    repartitions so each task carries ~target MB of media."""
    total = df.agg(F.sum(F.length("content")).alias("b")).collect()[0]["b"] or 0
    parts = max(1, int(total / (target_mb_per_task * 1024 * 1024)))
    return df.repartition(parts)


# ---------------------------------------------------------------------------
# ObjectToFetch / getObject() — reference: DataTypeObjectToFetch.h:9-31,
# src/Functions/getObject.cpp, CREATE CONNECTION (ASTCreateConnectionQuery),
# test tests/queries/3_ai_core_support/00009_mqai_objecturl_getObject.sql.
# A row holds a typed pointer {url, ...}; getObject() materializes the bytes.
# Spark mapping: the `binaryFile` datasource (works over local/HDFS/S3 paths
# with the cluster's hadoop credentials ≈ CREATE CONNECTION) joined back on
# the url column.
# ---------------------------------------------------------------------------

OBJECT_URL_SCHEMA = "struct<url:string,kind:string>"


_MAX_OBJECT_DIRS = 1000


def get_objects(
    df: DataFrame,
    url_col: str,
    content_name: str = "content",
    roots: list[str] | None = None,
) -> DataFrame:
    """Materialize external objects referenced by a URL/path column.

    Reads the referenced files through Spark's binaryFile source and joins
    content back by path — the full URL *set* never touches the driver (at
    100 TB a multimodal table holds 10^8–10^9 object URLs; collecting them
    would OOM the driver). Listing strategy, bounded at ``_MAX_OBJECT_DIRS``
    either way:
      1. small referenced set (≤ cap distinct URLs): list the parent
         directories with a ``pathGlobFilter`` of exactly the referenced
         basenames — unreferenced blobs in shared prefixes are never
         opened, and a missing file simply doesn't match (null content,
         row preserved);
      2. larger set: fall back to the distinct PARENT DIRECTORIES (prefix
         metadata only); beyond the cap, callers must pass explicit
         ``roots`` (e.g. ``["s3a://bucket/media/"]``), which skips the
         aggregation entirely.
    For object stores the same code runs with s3a:// URLs — credentials
    come from the hadoop conf (the reference's CREATE CONNECTION analog,
    src/Functions/getObject.cpp / DataTypeObjectToFetch.h:9-31).

    Executor-side alternative for pathological URL layouts:
    :func:`fetch_objects_in_executors`.
    """
    spark = df.sparkSession
    glob = None
    if roots is None:
        # distinct URLs computed executor-side; at most cap+1 come back
        urls_df = (
            df.select(F.col(url_col).alias("_u"))
            .where(F.col("_u").isNotNull())
            .distinct()
        )
        urls = [r[0] for r in urls_df.limit(_MAX_OBJECT_DIRS + 1).collect()]
        if len(urls) <= _MAX_OBJECT_DIRS:
            names = sorted({u.rsplit("/", 1)[-1] for u in urls})
            esc = [re.sub(r"([\\*?\[\]{}^,])", r"\\\1", n) for n in names]
            glob = "{" + ",".join(esc) + "}"
            roots = sorted({u.rsplit("/", 1)[0] for u in urls if "/" in u})
        else:
            # distinct dirs computed executor-side; only prefixes come back
            dir_expr = F.regexp_replace(F.col(url_col), "/[^/]*$", "")
            dirs_df = (
                df.select(dir_expr.alias("_d")).where(F.col("_d").isNotNull()).distinct()
            )
            roots = [r[0] for r in dirs_df.limit(_MAX_OBJECT_DIRS + 1).collect()]
            if len(roots) > _MAX_OBJECT_DIRS:
                raise ValueError(
                    f"get_objects: more than {_MAX_OBJECT_DIRS} distinct object "
                    "directories; pass roots=[...] prefixes explicitly"
                )
    if not roots:
        return df.withColumn(content_name, F.lit(None).cast("binary"))
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    blobs = (
        reader.load(sorted(roots))
        .select(F.col("path"), F.col("content").alias(content_name), F.col("length"))
    )
    # binaryFile yields file:/ URIs; normalize both sides to plain paths
    norm = F.regexp_replace(F.col("path"), "^file:", "")
    blobs = blobs.withColumn("_p", norm).drop("path")
    return df.join(blobs, df[url_col] == blobs["_p"], "left").drop("_p")


def fetch_objects_in_executors(
    df: DataFrame, url_col: str, content_name: str = "content"
) -> DataFrame:
    """getObject() via per-executor fetch: each Arrow batch opens its own
    URLs with a worker-local client — no listing, no driver state, linear in
    table size. The right shape when URLs don't share a bounded set of
    prefixes (get_objects' listing path) or when the store supports direct
    GETs cheaper than a listing join. Local/posix paths here; an s3/http
    client drops into ``_read`` unchanged."""
    out_schema = StructType(df.schema.fields + [StructField(content_name, BinaryType())])

    def _read(path: str) -> bytes | None:
        try:
            with open(path, "rb") as f:
                return f.read()
        except OSError:
            return None

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out[content_name] = [
                _read(p) if p is not None else None for p in pdf[url_col]
            ]
            yield out

    return df.mapInPandas(_batches, out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL for BMP/PPM (and anything PIL reads when present): decode →
    nearest-neighbor resize → re-encode 24-bit BMP; width/height/mime
    metadata updated in the same Arrow batch. Unsupported formats raise
    NotImplementedError from the decode step."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from myscaledb_spark.operators.imagecodec import encode_bmp, resize_nearest

        for pdf in it:
            out = pdf.copy()
            contents = []
            for content in pdf["content"]:
                arr = _try_decode_image(bytes(content))
                contents.append(encode_bmp(resize_nearest(arr, width, height)))
            out["content"] = contents
            if "width" in out.columns:
                out["width"] = width
            if "height" in out.columns:
                out["height"] = height
            if "mime" in out.columns:
                out["mime"] = "image/bmp"
            yield out

    return df.mapInPandas(_batches, df.schema)
