"""Product-quantization index — the compressed-vector search family
(IVFPQ / HNSWPQ in the reference's index sweep, `tests/vector_search/
benchmark.py:23,38-42`; pq_m build param).

Layout: vectors are split into m subspaces; each subspace gets a ks-entry
codebook (numpy k-means, deterministic seed, trained on a bounded sample —
like the reference's `max_build_index_train_block_size` capped training,
Settings.h:118); every vector is stored as m uint8 codes (+ the original
vector for exact re-rank, mirroring the reference's two-stage search).

Search = ADC (asymmetric distance computation): one (m × ks) lookup table of
query-to-centroid partial distances folded into a literal array, then
candidate scoring is m element_at lookups per row as a pure JVM
transform/aggregate expression over the codes parquet (no Python stage in
the query path). Top (k × multiple) candidates re-rank exactly → top-k.
Compression ratio vs float32: d·4 / m bytes (64-dim → 8 codes = 32×).

At 100 TB the codes table is what gets scanned (32× less IO than raw
vectors); training stays bounded; encoding is an embarrassingly parallel
one-pass mapInPandas.
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

TRAIN_SAMPLE_CAP = 50_000  # ≈ reference max train block (Settings.h:118)


def _kmeans_np(X: np.ndarray, k: int, seed: int, iters: int = 20) -> np.ndarray:
    """Deterministic Lloyd's k-means (numpy). Empty clusters re-seeded from
    the farthest points so codebooks stay full-rank."""
    rng = np.random.default_rng(seed)
    k = min(k, len(X))
    C = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        newC = np.zeros_like(C)
        for j in range(k):
            members = X[assign == j]
            if len(members) == 0:
                far = d2.min(axis=1).argmax()
                newC[j] = X[far]
            else:
                newC[j] = members.mean(axis=0)
        if np.allclose(newC, C):
            C = newC
            break
        C = newC
    return C


def build_pq_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    artifact_dir: str,
    name: str = "pq",
    m: int = 8,
    ks: int = 16,
    seed: int = 42,
) -> dict:
    """Train codebooks on a bounded sample, encode all vectors, persist."""
    reg = IndexRegistry(artifact_dir)
    reg.set_status(
        name, "InProgress", column=vec_col, index_type="PQFLAT",
        params={"pq_m": m, "ks": ks},
    )

    n_total = df.count()
    if n_total < 2:
        # index declared before data exists: exact FLAT stand-in
        reg.set_status(name, "Built", column=vec_col, index_type="FLAT", metric="L2")
        return reg.get(name)
    frac = min(1.0, TRAIN_SAMPLE_CAP / max(n_total, 1))
    sample = (
        df.select(vec_col).sample(fraction=frac, seed=seed).collect()
        if frac < 1.0
        else df.select(vec_col).collect()
    )
    X = np.array([r[0] for r in sample], dtype=np.float64)
    d = X.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by pq_m {m}")
    sub = d // m
    codebooks = np.stack(
        [
            _kmeans_np(X[:, j * sub : (j + 1) * sub], ks, seed + j)
            for j in range(m)
        ]
    )  # (m, ks', sub) — ks' ≤ ks if sample small

    cb_list = codebooks.tolist()
    base = os.path.join(artifact_dir, name)
    os.makedirs(base, exist_ok=True)
    json.dump({"m": m, "ks": ks, "sub": sub, "codebooks": cb_list},
              open(os.path.join(base, "codebooks.json"), "w"))

    CB = codebooks  # closure broadcast to executors

    out_schema = StructType(
        [
            StructField("pq_id", LongType()),
            StructField("codes", ArrayType(IntegerType())),
            StructField("vec", ArrayType(DoubleType())),
        ]
    )

    def _encode(batches):
        import pandas as pd

        for pdf in batches:
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.empty((len(V), m), dtype=np.int32)
            for j in range(m):
                sv = V[:, j * sub : (j + 1) * sub]
                d2 = ((sv[:, None, :] - CB[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "pq_id": pdf[id_col].astype("int64"),
                    "codes": list(codes),
                    "vec": list(V),
                }
            )

    df.select(id_col, vec_col).mapInPandas(_encode, out_schema).write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "codes"))

    reg.set_status(name, "Built", base=base)
    return reg.get(name)


def pq_search(
    spark: SparkSession,
    artifact_dir: str,
    qvec: Sequence[float],
    k: int,
    name: str = "pq",
    candidate_multiple: int = 3,
    metric: str = "L2",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage ADC search: compressed scoring → exact re-rank (mirrors
    MergeTreeVSManager.cpp:443-456 two-stage for PQ-like indexes)."""
    reg = IndexRegistry(artifact_dir)
    rec = reg.get(name)
    if rec is None or rec.get("status") != "Built":
        raise RuntimeError(f"pq index {name!r} not built")
    meta = json.load(open(os.path.join(rec["base"], "codebooks.json")))
    m, sub = meta["m"], meta["sub"]
    CB = np.array(meta["codebooks"], dtype=np.float64)  # (m, ks, sub)
    q = np.asarray(qvec, dtype=np.float64)
    # ADC lookup table: squared distance from each query subvector to each code
    lut = np.stack(
        [((CB[j] - q[j * sub : (j + 1) * sub]) ** 2).sum(axis=1) for j in range(m)]
    )  # (m, ks)

    from myscaledb_spark.plans.frame_cache import cached_parquet

    codes_df = cached_parquet(spark, os.path.join(rec["base"], "codes"))
    ncand = max(k * candidate_multiple, k)

    # ADC as a PURE JVM expression: the (m × ks) lookup table is a tiny
    # literal array (e.g. 8×16 = 128 doubles), and the per-row score is
    # adc = Σ_j LUT[j·ks + code_j] — a transform(element_at) + aggregate
    # over the m-length codes array. No Python stage, no Arrow transfer;
    # the candidate stage is FileScan + TakeOrderedAndProject.
    ks = lut.shape[1]
    lut_flat = F.array(*[F.lit(float(v)) for v in lut.ravel()])
    # two-arg transform lambda = (element, index): index picks the subspace
    picks = F.transform(
        F.col("codes"), lambda c, i: F.element_at(lut_flat, i * ks + c + 1)
    )
    adc = F.aggregate(picks, F.lit(0.0), lambda acc, v: acc + v)
    cands = (
        codes_df.select("pq_id", adc.alias("adc"))
        .orderBy(F.col("adc").asc(), F.col("pq_id").asc())
        .limit(ncand)
    )
    # exact re-rank on the stored original vectors
    joined = cands.join(codes_df.select("pq_id", "vec"), "pq_id")
    exact = vector_topk(joined, "vec", list(q), k, metric, None, "pq_id")
    return exact.select(F.col("pq_id").alias(id_col), "dist")


def pq_recall(
    df: DataFrame,
    spark: SparkSession,
    artifact_dir: str,
    qvec: Sequence[float],
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    name: str = "pq",
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
        for r in pq_search(
            spark, artifact_dir, qvec, k, name, candidate_multiple, "L2", id_col
        )
        .select(id_col)
        .collect()
    }
    return len(exact & approx) / max(len(exact), 1)
