"""Migration source: read a reference JsonStorage warehouse into the engine.

The reference persists one JSON object per record at ``<dir>/<id>.json``
plus a derived ``index.json`` (crawl4ai_llm storage/json_storage.py:44,102).
``read_reference_store`` scans exactly the record files (schema-on-read —
the reference stores arbitrary undeclared fields, SURVEY §1.1) and parses
the ISO-string ``metadata.created_at/updated_at`` into native timestamps;
``migrate_reference_store`` lands them in a bucketed ``ProductStore`` with
the ORIGINAL stamps preserved (``preserve_metadata_stamps=True`` — a
migration must not re-date a corpus). ``index.json`` is deliberately not
migrated: the engine never materializes the index (SURVEY §1.3 S5 ruling —
column pruning over the products table IS the index).

This is the switch-over path for a reference user: point it at the
JsonStorage directory, get back a store whose get/list/update/delete
surface answers identically (parity-tested end-to-end in
tests/test_reference_migration.py).

Scale note: the reference's layout is one small file per record — at
migration scale the cost is dominated by file listing/opening, which is
inherent to the source layout, not the reader (Spark parallelizes the
reads across executors; the driver only lists). The destination store is
the bucketed engine table, after which every operation is O(touched
buckets).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_reference_store(spark: SparkSession, directory: str) -> DataFrame | None:
    """Schema-on-read DataFrame over a reference JsonStorage directory
    (``index.json`` excluded; metadata stamps parsed to timestamps).
    Returns None for an empty store."""
    files = sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.endswith(".json") and f != "index.json"
    )
    if not files:
        return None
    # one JSON OBJECT per file — multiLine, not JSON-lines
    df = spark.read.option("multiLine", "true").json(files)
    if "metadata" in df.columns and isinstance(df.schema["metadata"].dataType, T.StructType):
        meta = df.schema["metadata"].dataType
        fields = []
        for f in meta.fields:
            col = F.col("metadata").getField(f.name)
            if f.name in ("created_at", "updated_at"):
                # reference writes datetime.now().isoformat() strings
                # (json_storage.py:190-192); ISO-8601 casts cleanly
                col = col.cast("timestamp")
            fields.append(col.alias(f.name))
        df = df.withColumn("metadata", F.struct(*fields))
    return df


def migrate_reference_store(
    spark: SparkSession, directory: str, warehouse: str, **store_kwargs
):
    """One-shot migration: JsonStorage directory → bucketed ProductStore
    under ``warehouse``. Original ids and metadata stamps survive; every
    engine operation (point lookup, list pipeline, updates/deletes,
    content-dedup tier) then works on the migrated data. Returns the
    ProductStore."""
    from crawl4ai_llm_spark.storage.store import ProductStore

    store = ProductStore(spark, warehouse, **store_kwargs)
    recs = read_reference_store(spark, directory)
    if recs is not None:
        store.save_products_df(recs, preserve_metadata_stamps=True)
    return store
