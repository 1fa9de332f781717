"""Dataset-mixing gate entries (LLM-pipeline first-class families):
sequence packing, deterministic stratified sampling, contamination check.
Token counts and shingles reuse the dedup suite's SQL_TOKS tokenization so
both engines agree exactly; hashes are the portable md5-48."""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register
from myscaledb_spark.suite.dedup import SQL_TOKS, _sql_md5_48

_BUDGET = 2048


@register(
    "pack_sequences_docs",
    f"""
    WITH t AS (SELECT doc_id, len({SQL_TOKS}) AS n FROM documents),
    c AS (SELECT doc_id, n, SUM(n) OVER (ORDER BY doc_id) - n AS cb FROM t)
    SELECT CAST(cb // {_BUDGET} AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM c
    GROUP BY 1
    ORDER BY 1
    """,
)
def pack_sequences_q(spark, sf_dir):
    """Sequence packing into fixed 2048-token windows via the distributed
    prefix sum (range partition → local cumsum → broadcast offsets) — the
    oracle recomputes the same layout with a global window, proving the
    partition-parallel prefix sum equals the sequential one."""
    from myscaledb_spark.operators.datamix import pack_sequences

    # token COUNT, not tokens: one codegen'd regexp_count scan — the number
    # of maximal [a-z0-9]+ runs in lower(text) equals len(filter(split(...)))
    # of the 'simple' tokenizer exactly, without the interpreted HOF chain
    # or the token-array allocation (r10; oracle unchanged, proves equality)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_count(F.lower(F.col("text")), F.lit("[a-z0-9]+")).alias("n"),
    )
    packed = pack_sequences(docs, "doc_id", "n", _BUDGET, ["doc_id"])
    return (
        packed.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("seq_id")
    )


_RATES = {"en": 0.5, "de": 0.25, "fr": 0.1}
_DEFAULT_RATE = 0.05
_DENOM = 1_000_000


def _strat_oracle_sql() -> str:
    case = " ".join(
        f"WHEN '{k}' THEN {int(r * _DENOM)}" for k, r in sorted(_RATES.items())
    )
    h = _sql_md5_48("CAST(doc_id AS VARCHAR)")
    return f"""
    SELECT lang, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents
    WHERE ({h} % {_DENOM}) < (CASE lang {case} ELSE {int(_DEFAULT_RATE * _DENOM)} END)
    GROUP BY lang
    ORDER BY lang
    """


@register("stratified_sample_docs", _strat_oracle_sql())
def stratified_sample_q(spark, sf_dir):
    """Deterministic per-language sampling for dataset mixing: keep iff
    md5_48(doc_id) % 1e6 < rate(lang) * 1e6 — reproducible across engines
    and runs, which is what mixture re-weighting requires."""
    from myscaledb_spark.operators.datamix import sample_stratified

    docs = load_table(spark, sf_dir, "documents")
    kept = sample_stratified(
        docs, "lang", _RATES, F.col("doc_id").cast("string"), _DEFAULT_RATE, _DENOM
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
        .orderBy("lang")
    )


_EVAL_IDS = [17, 230, 1201]
_EVAL_TOKENS = 12
_SH_N = 8


@register(
    "contamination_eval_docs",
    f"""
    WITH tok AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    ev AS (
      SELECT doc_id AS eid, toks[1:{_EVAL_TOKENS}] AS etoks
      FROM tok WHERE doc_id IN ({", ".join(map(str, _EVAL_IDS))})
    ),
    evsh AS (
      SELECT DISTINCT eid, array_to_string(etoks[i:i+{_SH_N - 1}], ' ') AS sh
      FROM ev, UNNEST(range(1, len(etoks) - {_SH_N - 2})) t(i)
      WHERE len(etoks) >= {_SH_N}
    ),
    trsh AS (
      SELECT DISTINCT doc_id, array_to_string(toks[i:i+{_SH_N - 1}], ' ') AS sh
      FROM tok, UNNEST(range(1, len(toks) - {_SH_N - 2})) t(i)
      WHERE len(toks) >= {_SH_N}
    )
    SELECT e.eid AS eval_id,
           COUNT(DISTINCT t.doc_id) AS n_contaminated_docs,
           MIN(t.doc_id) AS first_doc
    FROM evsh e JOIN trsh t ON t.sh = e.sh
    GROUP BY e.eid
    ORDER BY e.eid
    """,
)
def contamination_q(spark, sf_dir):
    """Benchmark decontamination: eval items (12-token prefixes of three
    corpus documents — guaranteeing hits) checked for 8-gram overlap against
    the full corpus via a broadcast shingle equi-join. Linear in corpus
    size; the corpus is never self-joined."""
    from myscaledb_spark.functions.text import tokenize
    from myscaledb_spark.operators.datamix import contamination_check

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", tokenize("text", "simple").alias("toks"))
    ev = toked.where(F.col("doc_id").isin(_EVAL_IDS)).select(
        F.col("doc_id").alias("eval_id"),
        F.slice("toks", 1, _EVAL_TOKENS).alias("etoks"),
    )
    out = contamination_check(
        toked, "doc_id", F.col("toks"), ev, "eval_id", F.col("etoks"), _SH_N
    )
    return out.orderBy("eval_id")
