"""Document-quality signals for training-data curation at scale.

Two published techniques, both as pure Catalyst expressions (no UDFs, no
shuffle beyond one global aggregate):

- **Repetition signals** (Gopher rules, Rae et al. 2021 "Scaling Language
  Models", Table A1): fraction of duplicated word n-grams and the top-word
  dominance — high values mark boilerplate/spam that harms LM training.
  Per-row expressions only; linear in corpus size.

- **Hashed-n-gram importance weights** (DSIR, Xie et al. 2023 "Data
  Selection for Language Models via Importance Resampling"): score each raw
  document by the log-likelihood ratio of a TARGET unigram model vs the RAW
  corpus model over hashed token buckets, then select/resample by weight.
  Both models are bucket-count distributions — one groupBy over exploded
  tokens each (map-side combinable), broadcast back as literal arrays; the
  scoring pass is a per-row fold. At 100 TB: two linear aggregates + one
  linear scan, nothing quadratic, no driver data beyond 2·n_buckets floats.

Hashing uses the repo's portable md5-48 pattern (same construction as
operators/dedup.py) so a SQL oracle reproduces bucket ids bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str) -> Column:
    """Lowercase word tokens — the same simple analyzer as functions.text."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )


def repetition_signals(
    df: DataFrame,
    text_col: str,
    ngrams: tuple[int, ...] = (2, 3),
    prefix: str = "rep_",
) -> DataFrame:
    """Append Gopher-style repetition columns:

    - ``{prefix}dup_{n}gram_frac``: 1 − distinct/total word n-grams (0 when
      fewer than n tokens) — the "fraction of duplicate n-grams" rule;
    - ``{prefix}top_word_frac``: occurrences of the most frequent word /
      total words — top-token dominance;
    - ``{prefix}n_words``: token count (the companion length gate).

    All pure per-row expressions (explode-free): the n-gram list is built
    with transform over an index sequence; at 100 TB this is a linear scan
    that fuses into whatever else reads the text column.
    """
    toks = _tokens(text_col)
    out = df.withColumn("_qt", toks)
    t = F.col("_qt")
    nw = F.size(t)
    for n in ngrams:
        # guard: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty
        grams = F.when(
            nw >= n,
            F.transform(
                F.sequence(F.lit(1), nw - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        total = F.size(grams)
        frac = F.when(
            total > 0,
            F.lit(1.0) - F.size(F.array_distinct(grams)) / total.cast("double"),
        ).otherwise(F.lit(0.0))
        out = out.withColumn(f"{prefix}dup_{n}gram_frac", F.round(frac, 6))
    top = F.when(
        nw > 0,
        F.array_max(
            F.transform(
                F.array_distinct(t),
                lambda w: F.size(F.filter(t, lambda x: x == w)),
            )
        ).cast("double")
        / nw.cast("double"),
    ).otherwise(F.lit(0.0))
    out = out.withColumn(f"{prefix}top_word_frac", F.round(top, 6))
    out = out.withColumn(f"{prefix}n_words", nw.cast("bigint"))
    return out.drop("_qt")


def hashed_bucket(word: Column, n_buckets: int, seed: int = 0) -> Column:
    """Portable token → bucket id in [0, n_buckets): md5-48 mod n — the
    repo-standard hash an SQL oracle can reproduce exactly."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), word).cast("binary")), 1, 12),
        16,
        10,
    ).cast("bigint")
    return (h % n_buckets).cast("int")


def bucket_log_probs(
    df: DataFrame,
    text_col: str,
    n_buckets: int = 256,
    seed: int = 0,
    alpha: float = 1.0,
) -> list[float]:
    """Laplace-smoothed log-probability per hashed bucket over a corpus —
    the DSIR feature distribution. One explode + groupBy (map-side
    combinable); the result is n_buckets floats on the driver (a model, not
    data — same footprint class as PQ codebooks)."""
    counts = (
        df.select(F.explode(_tokens(text_col)).alias("w"))
        .select(hashed_bucket(F.col("w"), n_buckets, seed).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_b = {r["b"]: r["c"] for r in counts}
    total = sum(by_b.values()) + alpha * n_buckets
    return [
        math.log((by_b.get(b, 0) + alpha) / total) for b in range(n_buckets)
    ]


def dsir_importance(
    df: DataFrame,
    text_col: str,
    target_log_probs: list[float],
    raw_log_probs: list[float],
    seed: int = 0,
    weight_name: str = "dsir_logweight",
) -> DataFrame:
    """Append the DSIR importance log-weight:
    ``Σ_tokens (log p_target[bucket(w)] − log p_raw[bucket(w)])`` — positive
    means the document looks more like the target domain than the raw
    corpus. The two models ride along as literal arrays (broadcast into
    codegen); scoring is a per-row fold over the token list, no shuffle.

    Selection = ``ORDER BY weight DESC LIMIT n`` or Gumbel-top-k resampling
    on ``weight + gumbel_noise`` for the paper's stochastic variant.
    """
    if len(target_log_probs) != len(raw_log_probs):
        raise ValueError("target and raw models must share n_buckets")
    n_buckets = len(target_log_probs)
    diff = [t - r for t, r in zip(target_log_probs, raw_log_probs)]
    diff_arr = F.array(*[F.lit(float(x)) for x in diff])
    toks = _tokens(text_col)
    w = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, word: acc
        + F.element_at(diff_arr, hashed_bucket(word, n_buckets, seed) + 1),
    )
    return df.withColumn(weight_name, F.round(w, 6))
