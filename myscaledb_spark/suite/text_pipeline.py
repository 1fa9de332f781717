"""Text-analysis operators for LLM training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. (Driver brief:
first-class components alongside SURVEY.md §2.)

All pure column expressions — at 100 TB these run as a single narrow scan
projection, no shuffle except final aggregations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register

# tiny deterministic stopword marker sets per language (shared with oracle SQL)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "las"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "est", "dans"],
    "de": ["der", "die", "das", "und", "ist", "von", "den", "ein", "eine", "mit"],
    "zh": ["de5", "shi4", "zai4", "le5", "he2", "you3", "wo3", "ta1", "zhe4", "bu4"],
}


def _sql_tokens(col: str = "text") -> str:
    return f"list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), x -> x <> '')"


def _marker_hits_sql(lang: str) -> str:
    lst = "[" + ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]) + "]"
    return f"len(list_filter(toks, t -> list_contains({lst}, t)))"


def _marker_hits_col(lang: str):
    lst = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter("_toks", lambda t: F.array_contains(lst, t)))


# --- language identification (n-gram/stopword heuristic) ----------------------
@register(
    "lang_id_scores",
    f"""
    WITH toked AS (SELECT doc_id, lang, {_sql_tokens()} AS toks FROM documents)
    SELECT doc_id, lang AS true_lang,
           {_marker_hits_sql('en')} AS hits_en,
           {_marker_hits_sql('es')} AS hits_es,
           {_marker_hits_sql('fr')} AS hits_fr,
           {_marker_hits_sql('de')} AS hits_de,
           len(toks) AS n_tokens
    FROM toked WHERE doc_id < 200
    """,
)
def lang_id_scores(spark, sf_dir):
    from myscaledb_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toked = docs.withColumn("_toks", tokenize("text"))
    return toked.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        _marker_hits_col("en").cast("long").alias("hits_en"),
        _marker_hits_col("es").cast("long").alias("hits_es"),
        _marker_hits_col("fr").cast("long").alias("hits_fr"),
        _marker_hits_col("de").cast("long").alias("hits_de"),
        F.size("_toks").cast("long").alias("n_tokens"),
    )


# --- quality scoring (length / punctuation / stopword / uniqueness ratios) ----
@register(
    "doc_quality_scores",
    f"""
    WITH toked AS (
      SELECT doc_id, text, {_sql_tokens()} AS toks FROM documents
    )
    SELECT doc_id,
           length(text) AS n_chars_m,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_unique,
           ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS uniq_ratio,
           ROUND(CAST(length(text) AS DOUBLE) / len(toks), 4) AS chars_per_token,
           ROUND(CAST({_marker_hits_sql('en')} AS DOUBLE) / len(toks), 4) AS stopword_ratio,
           (length(text) - length(replace(text, '.', ''))) AS n_periods
    FROM toked WHERE len(toks) > 0 AND doc_id < 300
    """,
)
def doc_quality_scores(spark, sf_dir):
    from myscaledb_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toked = docs.withColumn("_toks", tokenize("text")).filter(F.size("_toks") > 0)
    n_tok = F.size("_toks")
    return toked.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_m"),
        n_tok.cast("long").alias("n_tokens"),
        F.size(F.array_distinct("_toks")).cast("long").alias("n_unique"),
        F.round(F.size(F.array_distinct("_toks")).cast("double") / n_tok, 4).alias(
            "uniq_ratio"
        ),
        F.round(F.length("text").cast("double") / n_tok, 4).alias("chars_per_token"),
        F.round(_marker_hits_col("en").cast("double") / n_tok, 4).alias("stopword_ratio"),
        (F.length("text") - F.length(F.regexp_replace("text", "\\.", "")))
        .cast("long")
        .alias("n_periods"),
    )


# --- token counting (whitespace + BPE-ish subword estimate) -------------------
@register(
    "token_counts",
    f"""
    WITH toked AS (SELECT doc_id, source, {_sql_tokens()} AS toks FROM documents)
    SELECT source,
           CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
           CAST(SUM(list_reduce(list_transform(toks, t -> 1 + (length(t) // 4)), (a, b) -> a + b)) AS BIGINT) AS est_bpe_tokens,
           COUNT(*) AS n_docs
    FROM toked GROUP BY source
    """,
)
def token_counts(spark, sf_dir):
    from myscaledb_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.withColumn("_toks", tokenize("text"))
    # BPE-ish: every token ≈ 1 + len//4 subword units (deterministic estimate)
    bpe = F.aggregate(
        F.transform("_toks", lambda t: F.lit(1) + (F.length(t).cast("long") / F.lit(4)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return toked.groupBy("source").agg(
        F.sum(F.size("_toks")).alias("total_tokens"),
        F.sum(bpe).alias("est_bpe_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# --- document fingerprinting (min-k of shingle hashes; portable md5-based) ----
def _sql_md5_48(expr: str) -> str:
    # first 12 hex chars of md5 → 48-bit int (portable across engines)
    return f"CAST(('0x' || substr(md5({expr}), 1, 12)) AS BIGINT)"


@register(
    "doc_fingerprints",
    f"""
    WITH toked AS (SELECT doc_id, {_sql_tokens()} AS toks FROM documents WHERE doc_id < 100),
    shingles AS (
      SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
      FROM toked, UNNEST(range(1, len(toks) - 1)) AS t(i)
      WHERE len(toks) >= 3
    ),
    hashed AS (SELECT DISTINCT doc_id, {_sql_md5_48('sh')} AS h FROM shingles)
    SELECT doc_id, MIN(h) AS fp_min, COUNT(*) AS n_shingles
    FROM hashed GROUP BY doc_id
    """,
)
def doc_fingerprints(spark, sf_dir):
    from myscaledb_spark.functions.text import tokenize
    from myscaledb_spark.operators.dedup import md5_48, shingles

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toked = docs.withColumn("_toks", tokenize("text")).filter(F.size("_toks") >= 3)
    sh = toked.select(
        "doc_id", F.explode(shingles(F.col("_toks"), 3)).alias("sh")
    ).distinct()
    hashed = sh.select("doc_id", md5_48(F.col("sh")).alias("h")).distinct()
    return hashed.groupBy("doc_id").agg(
        F.min("h").alias("fp_min"), F.count(F.lit(1)).alias("n_shingles")
    )


# --- PII scrubbing (training-data curation stage) -----------------------------
# The corpus has no natural PII, so the query injects deterministic synthetic
# emails/phones into a subset (like exact_dedup's injected copies) and then
# detects + scrubs them — exercising the real operator on data where it fires.
_PII_EMAIL = "[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_PII_PHONE = "\\+1-[0-9]{3}-[0-9]{4}"


@register(
    "pii_scrub",
    f"""
    WITH enriched AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                  WHEN doc_id % 10 = 5
                  THEN text || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           (length(text) - length(regexp_replace(text, '{_PII_EMAIL}', '', 'g')) > 0)::INT AS has_email,
           (length(text) - length(regexp_replace(text, '{_PII_PHONE}', '', 'g')) > 0)::INT AS has_phone,
           length(regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                                 '{_PII_PHONE}', '<PHONE>', 'g')) AS scrubbed_len
    FROM enriched
    WHERE doc_id % 10 IN (0, 5)
    """,
)
def pii_scrub(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    enriched = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(
            F.col("doc_id") % 10 == 5,
            F.concat(
                F.col("text"),
                F.lit(" call +1-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text")),
    ).filter((F.col("doc_id") % 10).isin(0, 5))
    email, phone = _PII_EMAIL, _PII_PHONE
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", email, "<EMAIL>"), phone, "<PHONE>"
    )
    return enriched.select(
        "doc_id",
        (
            F.length("text") - F.length(F.regexp_replace("text", email, "")) > 0
        ).cast("int").alias("has_email"),
        (
            F.length("text") - F.length(F.regexp_replace("text", phone, "")) > 0
        ).cast("int").alias("has_phone"),
        F.length(scrubbed).cast("long").alias("scrubbed_len"),
    )


# --- corpus-trained unigram LM quality scoring (KenLM-style ppl filter) ------
@register(
    "unigram_lm_ppl",
    """
    WITH toks AS (
      SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS pos
      FROM (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           t -> len(t) > 0) AS ts
        FROM documents
      )
    ),
    model AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
    tot AS (SELECT SUM(cnt) AS n, COUNT(*) AS v FROM model),
    scored AS (
      SELECT t.doc_id, t.pos,
             ln(CAST(COALESCE(m.cnt, 0) + 1 AS DOUBLE) /
                CAST(tot.n + tot.v AS DOUBLE)) AS logp
      FROM toks t LEFT JOIN model m USING (tok), tot
    ),
    perdoc AS (
      SELECT doc_id, COUNT(*) AS n_tokens,
             list_reduce(ARRAY_AGG(logp ORDER BY pos), (a, b) -> a + b) AS sum_logp
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           ROUND(sum_logp / n_tokens, 6) AS avg_logprob,
           ROUND(exp(-(sum_logp / n_tokens)), 6) AS ppl
    FROM perdoc
    """,
)
def unigram_lm_ppl(spark, sf_dir):
    """Per-document perplexity under the corpus's own add-one-smoothed
    unigram LM (operators/lm_quality.py) — the cheap-LM quality filter of
    public LLM-data pipelines. Bit-exact vs DuckDB: the per-doc float sum
    is a left fold in token order on both engines (0.0-seeded aggregate ≡
    init-less list_reduce because 0.0 + x == x)."""
    from myscaledb_spark.operators.lm_quality import unigram_logprob_scores

    docs = load_table(spark, sf_dir, "documents")
    out = unigram_logprob_scores(docs, "doc_id", "text")
    # ln()/exp() are transcendental — last-ulp differences across libm
    # implementations are expected (observed on 3/500 docs at sf0.001);
    # the gate pins 6 decimals on both float outputs
    return out.withColumn("avg_logprob", F.round("avg_logprob", 6)).withColumn(
        "ppl", F.round("ppl", 6)
    )


@register(
    "unigram_lm_cross_ppl",
    """
    WITH toks AS (
      SELECT doc_id, lang, unnest(ts) AS tok, generate_subscripts(ts, 1) AS pos
      FROM (
        SELECT doc_id, lang,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           t -> len(t) > 0) AS ts
        FROM documents
      )
    ),
    model AS (
      SELECT tok, COUNT(*) AS cnt FROM toks WHERE lang = 'en' GROUP BY tok
    ),
    tot AS (SELECT SUM(cnt) AS n, COUNT(*) AS v FROM model),
    scored AS (
      SELECT t.doc_id, t.lang, t.pos,
             ln(CAST(COALESCE(m.cnt, 0) + 1 AS DOUBLE) /
                CAST(tot.n + tot.v AS DOUBLE)) AS logp,
             CASE WHEN m.cnt IS NULL THEN 1 ELSE 0 END AS oov
      FROM toks t LEFT JOIN model m USING (tok), tot
    ),
    perdoc AS (
      SELECT doc_id, ANY_VALUE(lang) AS lang, COUNT(*) AS n_tokens,
             CAST(SUM(oov) AS BIGINT) AS oov_tokens,
             list_reduce(ARRAY_AGG(logp ORDER BY pos), (a, b) -> a + b) AS sum_logp
      FROM scored GROUP BY doc_id
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(oov_tokens) AS BIGINT) AS oov_total,
           ROUND(AVG(CAST(oov_tokens AS DOUBLE) / n_tokens), 6) AS oov_rate,
           ROUND(MIN(sum_logp / n_tokens), 6) AS worst_avg_logprob
    FROM perdoc GROUP BY lang
    """,
)
def unigram_lm_cross_ppl(spark, sf_dir):
    """Cross-corpus scoring — the real curation shape: train the unigram LM
    on the in-domain slice (lang='en'), score EVERY document. Out-of-domain
    docs surface through out-of-vocabulary rate and low average logprob;
    the per-lang rollup keeps the gate small while pinning the unseen-token
    (+1-smoothing) path. AVG over per-doc doubles is associative-unsafe, so
    it is rounded after an exact-by-construction per-doc fold; MIN is exact.
    """
    from myscaledb_spark.operators.lm_quality import (
        tokenize_simple,
        unigram_counts,
        unigram_logprob_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    model = unigram_counts(docs.filter(F.col("lang") == "en"), "text")
    scores = unigram_logprob_scores(docs, "doc_id", "text", model=model)
    # oov per doc: tokens with no model row
    toks = docs.select(
        "doc_id", "lang", F.explode(tokenize_simple(F.col("text"))).alias("tok")
    )
    oov = (
        toks.join(F.broadcast(model), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.sum(F.when(F.col("cnt").isNull(), 1).otherwise(0)).alias("oov_tokens"),
        )
    )
    perdoc = scores.join(oov, "doc_id")
    return perdoc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("oov_tokens").alias("oov_total"),
        F.round(
            F.avg(F.col("oov_tokens").cast("double") / F.col("n_tokens")), 6
        ).alias("oov_rate"),
        F.round(F.min("avg_logprob"), 6).alias("worst_avg_logprob"),
    )
