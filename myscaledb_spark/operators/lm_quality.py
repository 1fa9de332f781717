"""Corpus-trained n-gram LM quality scoring for training-data curation.

The standard "perplexity under a cheap LM" quality signal (KenLM-style
filtering in public LLM-data pipelines): train a unigram model ON the corpus
itself (one aggregation), then score every document by its average token
log-probability with add-one smoothing. Low-probability documents (OCR
noise, boilerplate soup, wrong-language fragments) score poorly.

Fully declarative and distributed:
  - model = one groupBy over exploded tokens (map-side combinable counts),
    broadcast back (vocabulary of a trained corpus fits executors by
    construction — counts, not text);
  - scoring = posexplode → broadcast join on token → per-doc ordered
    refold. The per-doc sum is a LEFT FOLD IN TOKEN ORDER (array_sort on
    (pos, logp) then aggregate), so the float association order is fixed
    and scores are partitioning-invariant. Across ENGINES, ln() itself is
    transcendental (libm implementations may differ in the last ulp), so
    the gate oracle compares at 6 decimals.

At 100 TB: token explode is linear, the join is a broadcast hash probe
(model table ≪ corpus), and the refold shuffles one row per token — same
shape as the BM25 scorer. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokenize_simple(text: Column) -> Column:
    """Lowercased alphanumeric tokens — the curation tokenizer
    (functions/text.py 'simple' analog, kept dependency-free)."""
    toks = F.split(F.lower(text), r"[^a-z0-9]+")
    return F.filter(toks, lambda t: F.length(t) > 0)


def unigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, cnt) over the corpus — the 'trained' unigram model."""
    toks = df.select(F.explode(tokenize_simple(F.col(text_col))).alias("tok"))
    return toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))


def unigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: DataFrame | None = None,
) -> DataFrame:
    """Per-document average token log-probability under the (add-one
    smoothed) corpus unigram model; perplexity = exp(-avg_logprob).

    Returns (id, n_tokens, avg_logprob, ppl). Documents with zero tokens
    are dropped (no defined score — the curation pipeline's length filter
    removes them anyway).
    """
    model = model if model is not None else unigram_counts(df, text_col)
    totals = model.agg(
        F.sum("cnt").alias("N"), F.count(F.lit(1)).alias("V")
    )

    toks = df.select(
        F.col(id_col),
        F.posexplode(tokenize_simple(F.col(text_col))).alias("pos", "tok"),
    )
    scored = (
        toks.join(F.broadcast(model), "tok", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            "pos",
            # add-one smoothing: unseen tokens can only appear when scoring
            # with a model trained elsewhere; same formula both engines
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("double")
                / (F.col("N") + F.col("V")).cast("double")
            ).alias("logp"),
        )
    )
    # left fold in token order: sort the (pos, logp) structs, then
    # aggregate — fixes the float association order on every engine
    per_doc = scored.groupBy(id_col).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "logp"))),
            F.lit(0.0),
            lambda acc, x: acc + x["logp"],
        ).alias("sum_logp"),
        F.count(F.lit(1)).alias("n_tokens"),
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        (F.col("sum_logp") / F.col("n_tokens")).alias("avg_logprob"),
        F.exp(-(F.col("sum_logp") / F.col("n_tokens"))).alias("ppl"),
    )
