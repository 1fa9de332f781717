"""Scalar-quantization (SQ) index — the int8 compressed-vector variant the
reference ships as IVFSQ / HNSWSQ (`tests/vector_search/benchmark.py:23`,
`tests/queries/2_vector_search/00034_mqvs_vector_index_parameter_check.sh:93`).

Layout: one pass computes global per-dimension [min, max] (d aggregate
expressions — no shuffle beyond the final merge); every vector is stored as
d uint8 codes `round((v - min) / (max - min) * 255)` plus the original
vector for exact re-rank. Compression vs float32: 4× (vs PQ's 32× — SQ is
the cheap high-recall option users actually pick first).

Search: approximate distance on the DEQUANTIZED codes as a pure JVM
zip_with/aggregate expression with the per-dim dequantization constants
folded into literals (whole-stage codegen, no Python stage — the candidate
scan is a FileScan + TakeOrderedAndProject over 4×-smaller rows), top
(k × multiple) candidates, exact re-rank on stored vectors → top-k. With
candidates ≥ corpus the re-rank is provably exact, which is how the gate
entry gets a bit-exact oracle.

At 100 TB: the codes table is the scan target (4× less IO), the min/max
stats are a single tiny artifact, encoding is one mapInPandas pass.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from myscaledb_spark.operators.topk import vector_topk
from myscaledb_spark.plans.vector_index import IndexRegistry


def build_sq_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    artifact_dir: str,
    name: str = "sq",
    bits: int = 8,
) -> dict:
    """Compute per-dim min/max distributed, encode all vectors to intN codes."""
    reg = IndexRegistry(artifact_dir)
    reg.set_status(
        name, "InProgress", column=vec_col, index_type="SQ", params={"bits": bits}
    )
    levels = (1 << bits) - 1  # 255 for int8

    first = df.select(vec_col).first()
    if first is None:
        # index declared before data exists: exact FLAT stand-in
        reg.set_status(name, "Built", column=vec_col, index_type="FLAT", metric="L2")
        return reg.get(name)
    d = len(first[0])
    # per-dimension min/max in ONE aggregation pass (2d agg expressions, no
    # explode shuffle — element_at is a cheap projection)
    aggs = []
    for i in range(d):
        e = F.element_at(F.col(vec_col), i + 1).cast("double")
        aggs += [F.min(e).alias(f"lo{i}"), F.max(e).alias(f"hi{i}")]
    stats = df.agg(*aggs).first()
    lo = np.array([stats[f"lo{i}"] for i in range(d)], dtype=np.float64)
    hi = np.array([stats[f"hi{i}"] for i in range(d)], dtype=np.float64)
    span = np.where(hi > lo, hi - lo, 1.0)  # constant dims encode to 0

    base = os.path.join(artifact_dir, name)
    os.makedirs(base, exist_ok=True)
    json.dump(
        {"d": d, "bits": bits, "lo": lo.tolist(), "hi": hi.tolist()},
        open(os.path.join(base, "sq_stats.json"), "w"),
    )

    out_schema = StructType(
        [
            StructField("sq_id", LongType()),
            StructField("codes", ArrayType(IntegerType())),
            StructField("vec", ArrayType(DoubleType())),
        ]
    )
    LO, SPAN = lo, span  # closure-broadcast to executors

    def _encode(batches):
        import pandas as pd

        for pdf in batches:
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.rint((V - LO) / SPAN * levels).clip(0, levels).astype(np.int32)
            yield pd.DataFrame(
                {
                    "sq_id": pdf[id_col].astype("int64"),
                    "codes": list(codes),
                    "vec": list(V),
                }
            )

    df.select(id_col, vec_col).mapInPandas(_encode, out_schema).write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "codes"))

    reg.set_status(name, "Built", base=base)
    return reg.get(name)


def sq_search(
    spark: SparkSession,
    artifact_dir: str,
    qvec: Sequence[float],
    k: int,
    name: str = "sq",
    candidate_multiple: int = 3,
    metric: str = "L2",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage search: dequantized scoring → exact re-rank (the reference's
    two-stage path for SQ-compressed indexes, MergeTreeVSManager.cpp:443-456)."""
    reg = IndexRegistry(artifact_dir)
    rec = reg.get(name)
    if rec is None or rec.get("status") != "Built":
        raise RuntimeError(f"sq index {name!r} not built")
    meta = json.load(open(os.path.join(rec["base"], "sq_stats.json")))
    lo = np.array(meta["lo"], dtype=np.float64)
    hi = np.array(meta["hi"], dtype=np.float64)
    levels = (1 << meta["bits"]) - 1
    span = np.where(hi > lo, hi - lo, 1.0)
    q = np.asarray(qvec, dtype=np.float64)

    from myscaledb_spark.plans.frame_cache import cached_parquet

    codes_df = cached_parquet(spark, os.path.join(rec["base"], "codes"))
    ncand = max(k * candidate_multiple, k)

    # Dequantized distance as a PURE JVM expression (whole-stage codegen, no
    # Arrow transfer):  dist = Σ_i (lo_i + c_i·span_i/levels − q_i)²
    #                        = Σ_i (c_i·a_i − b_i)²
    # with per-dim constants a_i = span_i/levels, b_i = q_i − lo_i folded
    # into literal arrays. The candidate stage then compiles to a scan +
    # TakeOrderedAndProject — the same shape as the exact brute-force path,
    # over 4×-smaller rows.
    a_const = F.array(*[F.lit(float(s / levels)) for s in span])
    b_const = F.array(*[F.lit(float(qi - l)) for qi, l in zip(q, lo)])
    scaled = F.zip_with(
        F.col("codes").cast("array<double>"), a_const, lambda c, a: c * a
    )
    approx = F.aggregate(
        F.zip_with(scaled, b_const, lambda t, b: (t - b) * (t - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cands = (
        codes_df.select("sq_id", approx.alias("approx"))
        .orderBy(F.col("approx").asc(), F.col("sq_id").asc())
        .limit(ncand)
    )
    joined = cands.join(codes_df.select("sq_id", "vec"), "sq_id")
    exact = vector_topk(joined, "vec", list(q), k, metric, None, "sq_id")
    return exact.select(F.col("sq_id").alias(id_col), "dist")


def sq_recall(
    df: DataFrame,
    spark: SparkSession,
    artifact_dir: str,
    qvec: Sequence[float],
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    name: str = "sq",
    candidate_multiple: int = 3,
) -> float:
    exact = {
        r[0]
        for r in vector_topk(df, vec_col, qvec, k, "L2", None, id_col)
        .select(id_col)
        .collect()
    }
    approx = {
        r[0]
        for r in sq_search(
            spark, artifact_dir, qvec, k, name, candidate_multiple, "L2", id_col
        )
        .select(id_col)
        .collect()
    }
    return len(exact & approx) / max(len(exact), 1)
