"""Text-analysis queries: token stats, fingerprints, language-ID, quality.

The operator implementations are the column expressions in
functions/text.py (pure built-ins, whole-stage codegen); this module binds
them to the documents table and provides the DuckDB oracles. All arithmetic
is engine-portable by construction (integer polynomial hashes, single-
division ratios) — see functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_llm_spark.functions import text as tx
from crawl4ai_llm_spark.session import load_table


def q_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting + document fingerprinting per doc — the map-only
    pipeline stage (no shuffle at all; scales linearly with input bytes)."""
    docs = load_table(spark, sf, "documents")
    toks = tx.tokens(F.col("text"))
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.round(total_len.cast("double") / F.size(toks).cast("double"), 4).alias("avg_token_len"),
        tx.char_fingerprint(F.col("text")).alias("fingerprint"),
    )


def q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Marker-overlap language heuristic with per-language scores."""
    docs = load_table(spark, sf, "documents")
    scores = tx.lang_scores(F.col("text"))
    return docs.select(
        "doc_id",
        tx.lang_id(F.col("text")).alias("pred_lang"),
        *[scores[name].cast("long").alias(f"score_{name}") for name in tx.LANG_MARKERS],
    )


def q_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Composite quality scoring + keep/drop decision at 0.8 — the corpus
    filtering stage of a training-data pipeline."""
    docs = load_table(spark, sf, "documents")
    c = tx.quality_components(F.col("text"), F.col("n_chars"))
    q = tx.quality_score(F.col("text"), F.col("n_chars"))
    return docs.select(
        "doc_id",
        F.round(c["stop_ratio"], 6).alias("stop_ratio"),
        F.round(c["type_token_ratio"], 6).alias("type_token_ratio"),
        F.round(c["length_score"], 6).alias("length_score"),
        F.round(q, 6).alias("quality"),
        (q >= 0.8).alias("keep"),
    )


MIX_QUALITY_TAU = 0.55
MIX_TOKEN_BUDGET = 5_000  # per-language token budget (sandbox-sized)


def q_training_mix(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end training-mix materialization — the pipeline a data team
    actually runs, composed from the engine's own operators in ONE plan:

      1. exact dedup          keeper = min doc_id per identical text
      2. quality gate         composite score ≥ MIX_QUALITY_TAU
      3. language balancing   per-language TOKEN BUDGET: rank remaining
                              docs by quality (doc_id tiebreak) and keep
                              the prefix whose running token sum fits

    Scale shape: dedup is one hash shuffle on the text (content hash at
    100 TB); the budget cut is a windowed running sum PARTITIONED BY
    LANGUAGE — same per-key-sequential pattern as the frontier's per-host
    politeness drain, and the same salted two-phase rewrite applies if one
    language dominates (engine.py C5). No driver-side loop anywhere."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf, "documents")
    q = tx.quality_score(F.col("text"), F.col("n_chars"))
    base = docs.select(
        "doc_id",
        "text",
        tx.lang_id(F.col("text")).alias("pred_lang"),
        F.round(q, 6).alias("quality"),
        F.size(tx.tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    w_dup = Window.partitionBy("text").orderBy("doc_id")
    ded = (
        base.withColumn("dup_rn", F.row_number().over(w_dup))
        .where(F.col("dup_rn") == 1)
        .drop("dup_rn", "text")
    )
    filt = ded.where(F.col("quality") >= MIX_QUALITY_TAU)
    w_cum = (
        Window.partitionBy("pred_lang")
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        filt.withColumn("cum_tokens", F.sum("n_tokens").over(w_cum))
        .where(F.col("cum_tokens") <= MIX_TOKEN_BUDGET)
        .select("doc_id", "pred_lang", "quality", "n_tokens", "cum_tokens")
    )


def q_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus statistics: top-3 terms per doc by tf·(N/df). The score uses
    rational arithmetic (no log) so the oracle reproduces it exactly.

    r08 plan shape (guide §2.3/§2.4/§3.1): the docs scan is widened to the
    core count (the driver table is ONE parquet file → a 1-task tokenize),
    tf is cached and df is DERIVED from it (tf already has exactly one row
    per (doc, term), so groupBy(term).count() == distinct-doc count —
    the second tokenize+explode+distinct pass is gone), and the tf⋈df
    join broadcasts df when a MEASURED count fits the budget (the term
    dimension is tiny — 31 terms on this corpus; a web-scale vocabulary
    above the budget falls back to the shuffled equi-join). One real
    shuffle remains of the three: the per-doc rank window."""
    from crawl4ai_llm_spark.operators.dedup import (
        _broadcast_if_small,
        estimated_scan_partitions,
    )

    docs = load_table(spark, sf, "documents")
    n_docs = docs.count()
    docs = docs.select("doc_id", "text")
    par = spark.sparkContext.defaultParallelism
    if estimated_scan_partitions(docs) < par:
        docs = docs.repartition(par)
    terms = docs.select(
        "doc_id", F.explode(tx.tokens(F.col("text"))).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf")).cache()
    df_ = _broadcast_if_small(tf.groupBy("term").agg(F.count("*").alias("df")))
    from pyspark.sql.window import Window

    score = F.col("tf") * (F.lit(float(n_docs)) / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        tf.join(df_, "term")
        .select("doc_id", "term", "tf", "df", F.round(score, 6).alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score", F.col("rn").cast("long").alias("rn"))
    )


_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"
_CHARHASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(regexp_extract_all(text, '.'), c -> CAST(ascii(c) AS BIGINT))), "
    f"(acc, x) -> (acc * {tx.HASH_MULT} + x) % {tx.HASH_P})"
)


def _marker_sql(markers: list[str]) -> str:
    arr = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
    return f"len(list_intersect(list_distinct({_TOKS}), {arr}))"


_SCORE_EXPRS = {name: _marker_sql(m) for name, m in tx.LANG_MARKERS.items()}
_NAMES = list(tx.LANG_MARKERS)
# argmax with declaration-order tiebreak, mirroring functions/text.py lang_id
_PRED = f"""
    CASE
      WHEN {_SCORE_EXPRS[_NAMES[1]]} > {_SCORE_EXPRS[_NAMES[0]]}
           AND {_SCORE_EXPRS[_NAMES[1]]} >= {_SCORE_EXPRS[_NAMES[2]]} THEN '{_NAMES[1]}'
      WHEN {_SCORE_EXPRS[_NAMES[2]]} > {_SCORE_EXPRS[_NAMES[0]]}
           AND {_SCORE_EXPRS[_NAMES[2]]} > {_SCORE_EXPRS[_NAMES[1]]} THEN '{_NAMES[2]}'
      ELSE '{_NAMES[0]}'
    END
"""

_STOP_ARR = "[" + ", ".join(f"'{s}'" for s in tx.STOPWORDS) + "]"

ORACLES: dict[str, str] = {
    "q_tfidf_top_terms": f"""
        WITH terms AS (
            SELECT doc_id, unnest({_TOKS}) AS term FROM documents
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2
        ), df AS (
            SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY 1
        ), scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, df.df,
                   ROUND(tf.tf * ((SELECT COUNT(*) FROM documents)::DOUBLE / df.df), 6) AS score
            FROM tf JOIN df USING (term)
        )
        SELECT doc_id, term, tf, df, score, CAST(rn AS BIGINT) AS rn FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY score DESC, term ASC) AS rn
            FROM scored
        ) WHERE rn <= 3
    """,
    "q_token_stats": f"""
        SELECT doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct({_TOKS})) AS BIGINT) AS n_distinct,
               ROUND(list_reduce(list_prepend(CAST(0 AS BIGINT),
                         list_transform({_TOKS}, t -> CAST(length(t) AS BIGINT))),
                         (acc, x) -> acc + x)::DOUBLE
                     / len({_TOKS})::DOUBLE, 4) AS avg_token_len,
               {_CHARHASH} AS fingerprint
        FROM documents
    """,
    "q_lang_id": f"""
        SELECT doc_id,
               {_PRED} AS pred_lang,
               {" , ".join(f"CAST({_SCORE_EXPRS[n]} AS BIGINT) AS score_{n}" for n in _NAMES)}
        FROM documents
    """,
    "q_training_mix": f"""
        WITH c AS (
            SELECT doc_id, text,
                   len(list_filter({_TOKS}, t -> list_contains({_STOP_ARR}, t)))::DOUBLE
                       / len({_TOKS})::DOUBLE AS stop_ratio,
                   len(list_distinct({_TOKS}))::DOUBLE / len({_TOKS})::DOUBLE AS type_token_ratio,
                   LEAST(n_chars::DOUBLE / 500.0, 1.0) AS length_score,
                   CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                   {_PRED} AS pred_lang
            FROM documents
        ), base AS (
            SELECT doc_id, text, pred_lang, n_tokens,
                   ROUND(0.4 * (1.0 - stop_ratio) + 0.3 * type_token_ratio
                         + 0.3 * length_score, 6) AS quality
            FROM c
        ), ded AS (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS dup_rn
                FROM base
            ) WHERE dup_rn = 1
        ), filt AS (
            SELECT doc_id, pred_lang, quality, n_tokens FROM ded
            WHERE quality >= {MIX_QUALITY_TAU}
        ), cum AS (
            SELECT doc_id, pred_lang, quality, n_tokens,
                   CAST(SUM(n_tokens) OVER (
                       PARTITION BY pred_lang
                       ORDER BY quality DESC, doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_tokens
            FROM filt
        )
        SELECT doc_id, pred_lang, quality, n_tokens, cum_tokens
        FROM cum WHERE cum_tokens <= {MIX_TOKEN_BUDGET}
    """,
    "q_quality_score": f"""
        WITH c AS (
            SELECT doc_id,
                   len(list_filter({_TOKS}, t -> list_contains({_STOP_ARR}, t)))::DOUBLE
                       / len({_TOKS})::DOUBLE AS stop_ratio,
                   len(list_distinct({_TOKS}))::DOUBLE / len({_TOKS})::DOUBLE AS type_token_ratio,
                   LEAST(n_chars::DOUBLE / 500.0, 1.0) AS length_score
            FROM documents
        )
        SELECT doc_id,
               ROUND(stop_ratio, 6) AS stop_ratio,
               ROUND(type_token_ratio, 6) AS type_token_ratio,
               ROUND(length_score, 6) AS length_score,
               ROUND(0.4 * (1.0 - stop_ratio) + 0.3 * type_token_ratio + 0.3 * length_score, 6) AS quality,
               (0.4 * (1.0 - stop_ratio) + 0.3 * type_token_ratio + 0.3 * length_score) >= 0.8 AS keep
        FROM c
    """,
}

QUERIES = {
    "q_token_stats": q_token_stats,
    "q_lang_id": q_lang_id,
    "q_quality_score": q_quality_score,
    "q_tfidf_top_terms": q_tfidf_top_terms,
    "q_training_mix": q_training_mix,
}
