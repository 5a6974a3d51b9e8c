"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in the ``crawl4ai_llm_spark`` package; this module
only assembles the contract dicts.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crawl4ai_llm_spark import queries as q  # noqa: E402
from crawl4ai_llm_spark.operators import dedup, similarity, spans, textops  # noqa: E402

_MODULES = [q, textops, dedup, similarity, spans]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's flagship
    list_products pipeline (filter → sort → paginate → hydrate,
    ref json_storage.py:609-690) re-expressed as one declarative plan."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from pyspark.sql import functions as F

    return (
        docs.where(F.col("lang") == "en")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .limit(100)
        .select("doc_id", "lang", "source", "n_chars")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
