"""Engine schemas (SURVEY.md §1.2/§1.3, FIXTURES.md).

The reference is schema-on-read over JSON dicts (ref base.py:33,
json_storage.py:169); the Spark engine declares the core schema and keeps
open-ended attributes in map columns, which preserves the "arbitrary extra
fields" behavior its tests rely on (ref tests/test_json_storage.py:226)
without giving up columnar pruning on the declared core.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- product record (ref models.py:32-77; FIXTURES.md §1) -------------------

PRICE_TYPE = StructType(
    [
        # reference keeps amounts as strings for fidelity (models.py:16);
        # a decimal shadow is derived at query time, not stored twice.
        StructField("amount", StringType()),
        StructField("currency", StringType()),
        StructField("original_amount", StringType()),
        StructField("discount_percentage", DoubleType()),
    ]
)

IMAGE_TYPE = StructType(
    [
        StructField("url", StringType()),
        StructField("alt", StringType()),
        StructField("position", IntegerType()),
    ]
)

PRODUCT_SCHEMA = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("url", StringType()),
        StructField("title", StringType()),
        StructField("description", StringType()),
        StructField("brand", StringType()),
        StructField("available", BooleanType()),
        StructField("sku", StringType()),
        StructField("store_name", StringType()),
        StructField("prices", ArrayType(PRICE_TYPE)),
        StructField("images", ArrayType(IMAGE_TYPE)),
        StructField("identifiers", MapType(StringType(), StringType())),
        # open-ended user fields (schema-on-read parity)
        StructField("attributes", MapType(StringType(), StringType())),
        StructField("extracted_at", TimestampType()),
        # engine-managed (ref json_storage.py:184-192)
        StructField("created_at", TimestampType()),
        StructField("updated_at", TimestampType()),
    ]
)

# Narrow projection the reference's index materializes (json_storage.py:211-219).
# In Spark this is a logical projection — column pruning makes it free.
INDEX_COLUMNS = ["id", "sku", "url", "store_name", "title", "created_at", "updated_at"]

# --- interleaved documents (driver input_hint; FIXTURES.md §5) ---------------

SPAN_TYPE = StructType(
    [
        StructField("kind", StringType(), nullable=False),  # text|image|video|link
        StructField("text", StringType()),  # non-null iff kind == "text"
        StructField("media_ref", StringType()),  # non-null iff kind != "text"
        StructField("offset", IntegerType(), nullable=False),
    ]
)

INTERLEAVED_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), nullable=False),
        StructField("spans", ArrayType(SPAN_TYPE), nullable=False),
    ]
)

# --- crawl frontier (FIXTURES.md §6; SURVEY.md §2.7) -------------------------

FRONTIER_SCHEMA = StructType(
    [
        StructField("url", StringType(), nullable=False),
        StructField("url_hash", LongType(), nullable=False),  # murmur3/xxhash64
        StructField("host", StringType(), nullable=False),
        StructField("depth", IntegerType(), nullable=False),
        StructField("score", DoubleType(), nullable=False),
        StructField("attempt", IntegerType(), nullable=False),
        StructField("wave", IntegerType()),  # wave that scheduled it (null = pending)
    ]
)

SEEN_SCHEMA = StructType(
    [
        StructField("url_hash", LongType(), nullable=False),
        StructField("url", StringType(), nullable=False),
        StructField("wave", IntegerType(), nullable=False),
    ]
)

ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType(), nullable=False),
        StructField("deny_prefixes", ArrayType(StringType())),
        StructField("allow_prefixes", ArrayType(StringType())),
        StructField("crawl_delay", DoubleType()),
    ]
)

CHECKPOINT_SCHEMA = StructType(
    [
        StructField("wave", IntegerType(), nullable=False),
        StructField("partition_id", IntegerType(), nullable=False),
        StructField("urls_scheduled", LongType(), nullable=False),
        StructField("urls_fetched", LongType(), nullable=False),
        StructField("urls_failed", LongType(), nullable=False),
        StructField("committed_at", TimestampType(), nullable=False),
    ]
)
