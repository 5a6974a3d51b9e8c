"""Interleaved-span extraction + frontier scheduling as oracle-checked queries.

q_spans_extract — the C10 parse operator (driver input_hint schema): derives
a deterministic interleaved text+media span sequence from each document and
emits it EXPLODED (one row per span) so the driver's value-hash can check
per-row span-sequence equality (kind, text, media_ref, order) directly.

Rule (engine-portable, pure relational):
  tokens → chunks of 7; chunk i is a text span; after every odd chunk an
  image span is interleaved with media_ref "image://doc/<id>/<i>";
  position/offset = i + ⌊i/2⌋ (+1 for the media span) — strictly ascending.

q_frontier_schedule — the C5/C6 politeness + priority drain as a pure
query over a frontier derived from the orders table: per-host budget B=8,
priority (depth asc, score desc, url asc), wave-1 scheduled set with
per-host rank. The Spark side uses the SAME two-phase salted top-B the
engine uses (exact by pigeonhole on per-salt ranks); the oracle is the
single-window rank it must equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crawl4ai_llm_spark.functions import text as tx
from crawl4ai_llm_spark.session import load_table

CHUNK = 7
BUDGET = 8
N_HOSTS = 40
N_SALTS = 4


def q_spans_extract(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    toks = tx.tokens(F.col("text"))
    n_chunks = F.ceil(F.size(toks) / F.lit(CHUNK)).cast("int")
    # sequence(0, -1) would DESCEND — guard the empty-document case
    chunks = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    d = docs.select("doc_id", toks.alias("toks"), F.explode(chunks).alias("i"))
    text_span = d.select(
        "doc_id",
        (F.col("i") + F.floor(F.col("i") / 2)).cast("long").alias("offset"),
        F.lit("text").alias("kind"),
        F.concat_ws(
            " ", F.slice(F.col("toks"), F.col("i") * CHUNK + 1, CHUNK)
        ).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )
    media_span = (
        d.where(F.col("i") % 2 == 1)
        .select(
            "doc_id",
            (F.col("i") + F.floor(F.col("i") / 2) + 1).cast("long").alias("offset"),
            F.lit("image").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.concat(
                F.lit("image://doc/"), F.col("doc_id").cast("string"), F.lit("/"), F.col("i").cast("string")
            ).alias("media_ref"),
        )
    )
    return text_span.unionByName(media_span).select(
        "doc_id", "offset", "kind", "text", "media_ref"
    )


def q_frontier_schedule(spark: SparkSession, sf: str) -> DataFrame:
    """Politeness + priority drain, two-phase salted exactly like the engine."""
    orders = load_table(spark, sf, "orders")
    frontier = orders.select(
        F.concat(
            F.lit("https://host"),
            (F.col("o_custkey") % N_HOSTS).cast("string"),
            F.lit(".example/p/"),
            F.col("o_orderkey").cast("string"),
        ).alias("url"),
        (F.col("o_custkey") % N_HOSTS).cast("long").alias("host_id"),
        (F.col("o_orderkey") % 4).cast("int").alias("depth"),
        # engine-portable deterministic score: pure integer arithmetic
        (F.pmod(F.col("o_orderkey") * F.lit(2654435761), F.lit(4294967296)) / 4294967296.0).alias(
            "score"
        ),
    )
    pri = [F.col("depth").asc(), F.col("score").desc(), F.col("url").asc()]
    w1 = Window.partitionBy("host_id", F.pmod(F.crc32(F.col("url")), F.lit(N_SALTS))).orderBy(*pri)
    pruned = frontier.withColumn("r1", F.row_number().over(w1)).where(F.col("r1") <= BUDGET)
    w2 = Window.partitionBy("host_id").orderBy(*pri)
    return (
        pruned.withColumn("host_rank", F.row_number().over(w2))
        .where(F.col("host_rank") <= BUDGET)
        .select("url", "host_id", "depth", F.round("score", 9).alias("score"), F.col("host_rank").cast("long").alias("host_rank"))
    )


ORACLES: dict[str, str] = {
    "q_spans_extract": f"""
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ), chunks AS (
            SELECT doc_id, t, unnest(generate_series(0, CAST(ceil(len(t) / {CHUNK}.0) AS INT) - 1)) AS i
            FROM toks
        ), text_spans AS (
            SELECT doc_id,
                   CAST(i + (i // 2) AS BIGINT) AS "offset",
                   'text' AS kind,
                   array_to_string(t[i*{CHUNK}+1 : i*{CHUNK}+{CHUNK}], ' ') AS text,
                   CAST(NULL AS VARCHAR) AS media_ref
            FROM chunks
        ), media_spans AS (
            SELECT doc_id,
                   CAST(i + (i // 2) + 1 AS BIGINT) AS "offset",
                   'image' AS kind,
                   CAST(NULL AS VARCHAR) AS text,
                   'image://doc/' || CAST(doc_id AS VARCHAR) || '/' || CAST(i AS VARCHAR) AS media_ref
            FROM chunks WHERE i % 2 = 1
        )
        SELECT doc_id, "offset", kind, text, media_ref FROM text_spans
        UNION ALL
        SELECT doc_id, "offset", kind, text, media_ref FROM media_spans
    """,
    "q_frontier_schedule": f"""
        WITH frontier AS (
            SELECT 'https://host' || CAST(o_custkey % {N_HOSTS} AS VARCHAR)
                       || '.example/p/' || CAST(o_orderkey AS VARCHAR) AS url,
                   CAST(o_custkey % {N_HOSTS} AS BIGINT) AS host_id,
                   CAST(o_orderkey % 4 AS INT) AS depth,
                   ((o_orderkey * 2654435761) % 4294967296) / 4294967296.0 AS score
            FROM orders
        )
        SELECT url, host_id, depth, ROUND(score, 9) AS score,
               CAST(host_rank AS BIGINT) AS host_rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY host_id
                                         ORDER BY depth ASC, score DESC, url ASC) AS host_rank
            FROM frontier
        ) WHERE host_rank <= {BUDGET}
    """,
}

QUERIES = {
    "q_spans_extract": q_spans_extract,
    "q_frontier_schedule": q_frontier_schedule,
}
