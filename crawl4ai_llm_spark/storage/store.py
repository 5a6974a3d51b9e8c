"""ProductStore — the reference's BaseStorage contract as Spark programs.

Re-expresses the nine storage operators of the reference
(``crawl4ai_llm/storage/base.py:29-200``, implemented in
``crawl4ai_llm/storage/json_storage.py``) over a snapshot-committed table:

==============  ============================================================
reference op    Spark realization (SURVEY.md §2)
==============  ============================================================
save_product    one-row batch through save_products (D1)
save_products   dup pre-check = groupBy(id) intra-batch + left-semi join vs
                existing, then ONE atomic append commit (D2)
get_product     point lookup ``where(id = …)`` (S6)
get_products    broadcast semi-join + input-order preservation (S7)
update_product  shallow-merge MERGE semantics via join + per-column
                provided-key resolution (D3)
update_products batch MERGE with all-or-nothing pre-validation (D4)
delete_product  anti-join rewrite (D5)
delete_products batch anti-join, all-or-nothing (D6)
list_products   filter → sort → paginate → hydrate pipeline (Q1-Q7)
==============  ============================================================

Scale notes: every mutation is ONE distributed job + ONE atomic snapshot
commit — the reference's O(index) read-modify-write per call
(json_storage.py:195-221) is what capped it at ~356 rec/s (BASELINE.md).
Duplicate checks are joins (broadcast when the batch is small), so they
shuffle the big table at most once, and the id-generation / timestamp
stamping is pure column expressions (whole-stage codegen, no Python in the
hot path).

Semantics rulings carried from executing the reference (SURVEY.md §5.2):
arbitrary undeclared fields are preserved (schema-on-read); intra-batch
duplicates — which corrupt data in the reference — are rejected
deterministically here; filter surface is all columns, with
``compat_mode=True`` restricting to the reference's indexed fields.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_llm_spark.catalog import Catalog, Table
from crawl4ai_llm_spark.errors import DuplicateProductError, ProductNotFoundError

# Fields the reference can filter/sort on (its index projection,
# json_storage.py:211-219) — used when compat_mode=True.
REFERENCE_FILTERABLE = {"id", "sku", "url", "store_name", "title"}

ENGINE_COLS = {"id", "metadata", "_seq"}


@dataclass
class ListResult:
    """Result envelope — field-for-field the reference contract
    (base.py:189-196, json_storage.py:684-690)."""

    products: list[dict[str, Any]]
    total: int
    page: int
    page_size: int
    total_pages: int


def _lit_value(v: Any) -> Column:
    """Literal for a filter value, including whole-list equality
    (ref test_json_storage.py:527-530)."""
    if isinstance(v, list):
        return F.array(*[_lit_value(x) for x in v])
    return F.lit(v)


def _type_compatible(dtype: T.DataType, v: Any) -> bool:
    """Reference equality is Python ``!=`` — a type-mismatched comparison is
    simply 'no match' (json_storage.py:708), never an error. Spark would
    instead raise CAST_INVALID_INPUT trying to coerce, so pre-check."""
    if v is None:
        return True
    if isinstance(dtype, T.StringType):
        return isinstance(v, str)
    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType, T.ByteType,
                          T.DoubleType, T.FloatType, T.DecimalType)):
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if isinstance(dtype, T.BooleanType):
        return isinstance(v, bool)
    if isinstance(dtype, T.ArrayType):
        return isinstance(v, list) and all(_type_compatible(dtype.elementType, x) for x in v)
    return True


def _arrow_cell(v: Any, typ) -> Any:
    """pyarrow ``to_pylist`` value → the shape Spark's Row.asDict(recursive)
    returns: maps become dicts (arrow yields key-value tuple lists), structs
    recurse, timestamps become naive local datetimes (PySpark's
    TimestampType.fromInternal contract)."""
    import pyarrow as pa

    if v is None:
        return None
    if pa.types.is_map(typ):
        return {k: _arrow_cell(x, typ.item_type) for k, x in v}
    if pa.types.is_struct(typ):
        return {f.name: _arrow_cell(v.get(f.name), f.type) for f in typ}
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        return [_arrow_cell(x, typ.value_type) for x in v]
    if pa.types.is_timestamp(typ):
        from datetime import timezone

        if hasattr(v, "to_pydatetime"):  # ns-precision pandas.Timestamp
            v = v.to_pydatetime(warn=False)
        if v.tzinfo is None:  # INT96-era files: naive values are UTC instants
            v = v.replace(tzinfo=timezone.utc)
        return v.astimezone().replace(tzinfo=None)
    return v


class ProductStore:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        compat_mode: bool = False,
        deterministic_ids: bool = True,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.catalog = Catalog(spark, warehouse)
        self.n_buckets = n_buckets
        # hash-bucketed by id: point lookups read 1/n of the files and
        # updates/deletes rewrite only touched buckets (catalog.py
        # replace_buckets) — at 100 TB this is Iceberg bucket(n, id)
        self.table: Table = self.catalog.table(
            "products", merge_schema=True, bucket_by=("id", n_buckets)
        )
        self.compat_mode = compat_mode
        # reference falls back to uuid4 (json_storage.py:90); deterministic
        # mode derives the id from a content hash instead so runs replay.
        self.deterministic_ids = deterministic_ids

    # ------------------------------------------------------------------ reads

    def _df(self) -> DataFrame | None:
        return self.table.read()

    def _buckets_of(self, ids: list[str]) -> set[int]:
        """Driver-side bucket computation via the murmur3 port that is
        bit-identical to Spark's F.hash (frontier/hashing.py) — the same
        arithmetic the write path uses, so pruning can never miss a file."""
        from crawl4ai_llm_spark.frontier.hashing import spark_hash_str

        return {spark_hash_str(i) % self.n_buckets for i in ids}

    def _df_for_ids(self, ids: list[str]) -> DataFrame | None:
        return self.table.read(buckets=self._buckets_of(ids))

    def _require_df(self) -> DataFrame:
        df = self._df()
        if df is None:
            raise ProductNotFoundError(["<empty store>"])
        return df

    def _resolve(self, df: DataFrame, field: str) -> Column | None:
        """Resolve a (possibly dotted) field name against the live schema.

        Reference resolves one-level ``metadata.<key>`` paths
        (json_storage.py:704-709); engine resolves any one-level struct or
        map path against whatever schema the data actually has.
        """
        names = set(df.columns)
        if field in names:
            return F.col(field)
        if "." in field:
            head, rest = field.split(".", 1)
            if head not in names:
                return None
            dtype = df.schema[head].dataType
            if isinstance(dtype, T.StructType):
                if rest in dtype.fieldNames():
                    return F.col(head).getField(rest)
                return None
            if isinstance(dtype, T.MapType):
                return F.col(head).getItem(rest)
        return None

    def _filterable(self, field: str) -> bool:
        if not self.compat_mode:
            return True
        # reference surface: indexed fields + id + metadata.* (SURVEY §5.2)
        return field in REFERENCE_FILTERABLE or field.startswith("metadata.")

    # ------------------------------------------------------------------ writes

    @staticmethod
    def _normalize_caller_metadata(products: list[dict[str, Any]]) -> list[dict[str, Any]]:
        """Reference metadata-merge semantics (json_storage.py:189-192,
        260-263): caller-supplied metadata KEYS are preserved; the engine
        overwrites ``created_at``/``updated_at`` with fresh stamps on every
        save. Realized by normalizing each record's metadata dict to a
        ``Row`` over the batch-union of caller keys (so createDataFrame
        infers ONE struct) minus the engine stamps — the stamps are added
        in-plan by _ensure_id_and_stamps. A record fetched via get_product
        therefore round-trips through save_products: its engine-shaped
        metadata reduces to zero caller keys and is simply re-stamped
        (ADVICE r03 closure)."""
        from pyspark.sql import Row

        for i, p in enumerate(products):
            m = p.get("metadata")
            if m is not None and not isinstance(m, dict):
                raise ValueError(f"record at position {i}: metadata must be a dict")
        # keys whose value is None in EVERY record are dropped: an all-None
        # column has no inferable Spark type (NullType would crash deep in
        # the parquet writer), and schema-on-read treats absent ≡ None —
        # the same policy ProductData.to_record applies to its fields
        caller_keys = sorted(
            {
                k
                for p in products
                for k, v in (p.get("metadata") or {}).items()
                if k not in ("created_at", "updated_at") and v is not None
            }
        )
        if not caller_keys:
            return [{k: v for k, v in p.items() if k != "metadata"} for p in products]
        return [
            {
                **p,
                "metadata": Row(
                    **{k: (p.get("metadata") or {}).get(k) for k in caller_keys}
                ),
            }
            for p in products
        ]

    def _rows_df(self, rows: list[dict[str, Any]]) -> DataFrame:
        """Dicts → DataFrame with the union of all keys (missing ⇒ null),
        preserving arbitrary undeclared fields (schema-on-read parity)."""
        keys: list[str] = []
        for r in rows:
            for k in r:
                if k not in keys:
                    keys.append(k)
        normalized = [{k: r.get(k) for k in keys} for r in rows]
        return self.spark.createDataFrame(normalized)

    def _ensure_id_and_stamps(
        self,
        df: DataFrame,
        next_seq: int,
        bulk: bool = False,
        preserve_stamps: bool = False,
    ) -> DataFrame:
        """E1 id hierarchy + E4 timestamps + save-order sequence.

        id precedence (verified ref behavior, json_storage.py:61-90):
        explicit id → "{store_name}_{sku}" → url-hash id → random.
        Pure column expressions — no Python per row.

        ``preserve_stamps``: the MIGRATION mode (sources/reference_json) —
        caller-supplied created_at/updated_at survive instead of being
        engine-overwritten (null stamps still fill with now).
        """
        cols = set(df.columns)
        id_col = F.col("id").cast("string") if "id" in cols else F.lit(None).cast("string")
        store = F.col("store_name") if "store_name" in cols else F.lit(None).cast("string")
        sku = F.col("sku") if "sku" in cols else F.lit(None).cast("string")
        url = F.col("url") if "url" in cols else F.lit(None).cast("string")
        fallback = (
            F.sha2(F.to_json(F.struct(*[F.col(c) for c in sorted(cols)])), 256)
            if self.deterministic_ids
            else F.expr("uuid()")
        )
        generated = F.coalesce(
            id_col,
            F.when(store.isNotNull() & sku.isNotNull(), F.concat_ws("_", store, sku)),
            # reference: f"url_{hash(url)}" with process-salted hash
            # (json_storage.py:87); engine uses murmur3 (deterministic,
            # SURVEY §8.3 ruling).
            F.when(url.isNotNull(), F.concat(F.lit("url_"), F.hash(url).cast("string"))),
            fallback,
        )
        now = F.current_timestamp()
        out = df.withColumn("id", generated)
        # metadata merge (reference json_storage.py:189-192): caller struct
        # fields carry through, engine overwrites the two stamps
        meta_fields: list[Column] = []
        if "metadata" in cols:
            dtype = df.schema["metadata"].dataType
            if not isinstance(dtype, T.StructType):
                raise ValueError(
                    "metadata column must be a struct (caller keys are "
                    "preserved; created_at/updated_at are engine-stamped)"
                )
            meta_fields = [
                F.col("metadata").getField(f.name).alias(f.name)
                for f in dtype.fields
                if f.name not in ("created_at", "updated_at")
            ]
        created, updated = now, now
        if preserve_stamps and "metadata" in cols:
            dtype = df.schema["metadata"].dataType
            names = dtype.fieldNames()
            if "created_at" in names:
                created = F.coalesce(
                    F.col("metadata").getField("created_at").cast("timestamp"), now
                )
            if "updated_at" in names:
                updated = F.coalesce(
                    F.col("metadata").getField("updated_at").cast("timestamp"), now
                )
        out = out.withColumn(
            "metadata",
            F.struct(*meta_fields, created.alias("created_at"), updated.alias("updated_at")),
        )
        if bulk:
            # bulk tier: no meaningful insertion order — a partition-embedded
            # monotonic id avoids the single-partition ranking window
            out = out.withColumn("_seq", F.lit(next_seq) + F.monotonically_increasing_id())
        else:
            out = out.withColumn(
                "_seq", F.lit(next_seq) + F.row_number().over(self._save_order_window()) - 1
            )
        return out

    @staticmethod
    def _save_order_window():
        from pyspark.sql.window import Window

        # input order within a batch — monotonically_increasing_id preserves
        # the incoming partition order for a driver-created batch
        return Window.orderBy(F.monotonically_increasing_id())

    def _next_seq(self) -> int:
        snap = self.table.current_snapshot()
        return int(snap.counters.get("max_seq", 0)) + 1 if snap else 1

    def save_product(self, product: dict[str, Any], validate: bool = False) -> str:
        """D1 — single insert; raises DuplicateProductError on id collision.
        ``validate=True`` runs the payload through the ProductData model
        first (reference Pydantic parity, models.py) — required title,
        http(s) url, typed prices/images — raising ValueError before any
        write."""
        if validate:
            from crawl4ai_llm_spark.models import ProductData

            product = {**ProductData.from_dict(product).to_record(),
                       **({"id": product["id"]} if "id" in product else {})}
        return self.save_products([product])[0]

    def _content_index(self):
        """The store's persisted content-dedup index (MinHash band keys of
        every saved row's checked text column) — lives beside the product
        table under the same warehouse."""
        import os

        from crawl4ai_llm_spark.operators.dedup_store import DedupIndex

        return DedupIndex(self.spark, os.path.join(self.catalog.warehouse, "content_index"))

    def save_products_df(
        self,
        batch: DataFrame,
        reject_near_dups: str | None = None,
        near_dup_tau: float = 0.5,
        on_near_dup: str = "reject",
        preserve_metadata_stamps: bool = False,
    ) -> int:
        """D2, bulk tier — ingest a DataFrame without any driver-side row
        materialization. Same duplicate semantics as save_products (both
        intra-batch and vs-existing rejected with sample ids), but checks
        run as distributed counts and the ids never leave the executors —
        this is the path that ingests millions of records per commit.
        Returns the number of rows written.

        ``reject_near_dups=<text column>`` adds a CONTENT tier to the D1
        duplicate check: arriving rows whose text near-duplicates an
        already-saved row at exact n-gram Jaccard ≥ ``near_dup_tau`` raise
        ``NearDuplicateContentError`` (``on_near_dup="reject"``, listing
        sample pairs) or are silently dropped (``on_near_dup="skip"`` —
        the crawl-pipeline mode; the non-duplicate remainder commits).
        Cost shape: the stored corpus is NEVER rescanned — the batch's
        MinHash band keys equi-join the store's persisted band-key index
        (dedup_store.DedupIndex, maintained here on every save), and
        verification reads only the matched stored rows. RECALL is the
        MinHash banding curve, NOT a deterministic guarantee: a true pair
        at Jaccard J is missed with probability (1 − J⁴)³² — negligible
        (~1.5e-15) at J ≥ 0.9 but ~13% right AT the default tau 0.5, so
        borderline near-dups can commit; flagged matches are always TRUE
        matches (exact verification). See DedupIndex.match_documents.
        Intra-batch content dups are NOT checked (the id tier handles
        identity; dedup the batch itself with operators/dedup first if
        needed).
        The index is derived data: if it diverges from the store (a crash
        between the two commits), it is rebuilt from the live table —
        at Iceberg scale this becomes an incremental MERGE repair."""
        if reject_near_dups is not None and reject_near_dups not in batch.columns:
            raise ValueError(f"reject_near_dups column {reject_near_dups!r} not in batch")
        if on_near_dup not in ("reject", "skip"):
            raise ValueError("on_near_dup must be 'reject' or 'skip'")
        # a struct-typed metadata column merges per the reference semantics
        # (_ensure_id_and_stamps); any other type is rejected there loudly.
        # preserve_metadata_stamps = migration mode: original
        # created_at/updated_at survive (sources/reference_json)
        batch = self._ensure_id_and_stamps(
            batch, self._next_seq(), bulk=True, preserve_stamps=preserve_metadata_stamps
        ).cache()
        # every per-call cache lands here and is unpersisted on exit — the
        # content tier's match plans are unique per save and would leak
        # (code-review r04); "skip" mode also rebinds batch to a filtered
        # view of the first entry
        caches: list = [batch]
        try:
            # samples are sorted BEFORE the limit so the error payload is
            # deterministic run-to-run (an unordered .limit(20) returns
            # whichever partitions answer first)
            intra = (
                batch.groupBy("id").count().where(F.col("count") > 1).select("id")
            )
            intra_sample = [r["id"] for r in intra.orderBy("id").limit(21).collect()]
            if intra_sample:
                raise DuplicateProductError(
                    intra_sample[:20], truncated=len(intra_sample) > 20
                )
            existing = self._df()
            if existing is not None:
                dups = existing.select("id").join(batch.select("id"), "id", "left_semi")
                dup_sample = [r["id"] for r in dups.orderBy("id").limit(21).collect()]
                if dup_sample:
                    raise DuplicateProductError(
                        dup_sample[:20], truncated=len(dup_sample) > 20
                    )
            prepared = None
            if reject_near_dups is not None:
                batch, prepared = self._content_dup_tier(
                    batch, existing, reject_near_dups, near_dup_tau, on_near_dup, caches
                )
            n, max_seq = batch.agg(
                F.count("*").alias("n"), F.max("_seq").alias("m")
            ).collect()[0]
            if n == 0:
                return 0  # every row skipped as a near-dup: nothing to commit
            self.table.append(batch, counters={"max_seq": int(max_seq)})
            if reject_near_dups is not None:
                # maintain the index: the committed batch's band keys append.
                # text_col_crc must ride along — sync_documents requires it
                # to match on the NEXT save (a missing tag reads as a
                # changed checked column and would force a full rebuild)
                import zlib

                if prepared is not None:
                    prepared = prepared.join(
                        batch.select(F.col("id").alias("doc_id")), "doc_id", "left_semi"
                    )
                self._content_index().ingest_documents(
                    batch.select(
                        F.col("id").alias("doc_id"),
                        F.col(reject_near_dups).cast("string").alias("text"),
                    ),
                    prepared=prepared,
                    counters={
                        "data_snapshot": self.table.current_snapshot().snapshot_id,
                        "text_col_crc": zlib.crc32(reject_near_dups.encode()),
                    },
                )
            return n
        finally:
            for c in caches:
                c.unpersist()

    def _content_dup_tier(
        self,
        batch: DataFrame,
        existing: DataFrame | None,
        text_col: str,
        tau: float,
        on_near_dup: str,
        caches: list,
    ) -> DataFrame:
        """Batch-vs-stored content check; returns (batch, prepared) —
        the batch possibly filtered in "skip" mode, and the batch's
        cached prepare_batch frame (None when no match ran) for the
        post-commit ingest to reuse. Syncs the index first
        (DedupIndex.sync_documents): a count divergence (crash between
        data and index commits, or an unindexed save), a changed checked
        COLUMN, a signature-scheme bump, or a pending ``stale`` flag
        (set by update_products — an edit to indexed text at an unchanged
        row count, invisible to any count probe) each rebuild it from the
        live table — idempotent, derived data. Per-call caches land in
        ``caches`` (unpersisted by save_products_df's finally — each
        save's plans are unique, so they would otherwise leak)."""
        import zlib

        from crawl4ai_llm_spark.errors import NearDuplicateContentError

        if existing is None:
            return batch, None
        idx = self._content_index()
        existing_docs = existing.select(
            F.col("id").alias("doc_id"), F.col(text_col).cast("string").alias("text")
        )
        if existing.limit(1).count() == 0:
            return batch, None
        idx.sync_documents(
            existing_docs, tags={"text_col_crc": zlib.crc32(text_col.encode())}
        )
        batch_docs = batch.select(
            F.col("id").alias("doc_id"), F.col(text_col).cast("string").alias("text")
        )
        # ONE signature pass for this batch, shared with the post-commit
        # ingest (it ran twice per save before)
        prepared = idx.prepare_batch(batch_docs).cache()
        caches.append(prepared)
        matches = idx.match_documents(
            batch_docs, existing_docs, tau=tau, caches=caches, prepared=prepared
        ).cache()
        caches.append(matches)
        sample = matches.orderBy("new_id", "orig_id").limit(21).collect()
        if not sample:
            return batch, prepared
        if on_near_dup == "reject":
            raise NearDuplicateContentError(
                [(r["new_id"], r["orig_id"], r["jaccard"]) for r in sample[:20]],
                truncated=len(sample) > 20,
            )
        # skip mode: drop every near-dup row, keep the remainder (anti-join
        # reading the cached batch and the cached match list — the list is
        # bounded by true duplicates)
        return batch.join(
            matches.select(F.col("new_id").alias("id")).distinct(), "id", "left_anti"
        ), prepared

    def save_products(self, products: list[dict[str, Any]]) -> list[str]:
        """D2 — batch insert, one atomic commit.

        Empty fast-path returns [] (ref json_storage.py:239-240). All
        duplicate checks happen BEFORE any write. Intra-batch duplicates are
        rejected (reference would corrupt data here — SURVEY §2.2 D2 ruling).
        """
        if not products:
            return []
        products = self._normalize_caller_metadata(products)
        batch = self._rows_df(products)  # schema-on-read inference
        batch = self._ensure_id_and_stamps(batch, self._next_seq())
        batch = batch.cache()
        try:
            ids = [r["id"] for r in batch.select("id").collect()]
            # intra-batch duplicate detection: groupBy(id) count > 1
            seen: set[str] = set()
            intra = sorted({i for i in ids if i in seen or seen.add(i)})
            if intra:
                raise DuplicateProductError(intra)
            existing = self._df()
            if existing is not None:
                # dup-vs-existing = semi-join of the (small) batch against
                # the table; Catalyst broadcasts the batch side.
                # semi-join with the small batch broadcast as the build side
                # cap the sample like the bulk tier: a caller replaying a
                # huge batch must not pull every conflicting id to the driver
                # (sorted before the limit — deterministic payload)
                dups = [
                    r["id"]
                    for r in existing.select("id")
                    .join(F.broadcast(batch.select("id")), "id", "left_semi")
                    .orderBy("id")
                    .limit(21)
                    .collect()
                ]
                if dups:
                    raise DuplicateProductError(dups[:20], truncated=len(dups) > 20)
            self.table.append(
                batch, counters={"max_seq": self._next_seq() + len(ids) - 1}
            )
            return ids
        finally:
            batch.unpersist()

    def compact(self, target_partitions: int | None = None) -> None:
        """Maintenance rewrite of the live file set — and the MIGRATION
        entry point for legacy (pre-bucketing) warehouses: the rewrite
        re-derives every row's id hash bucket (catalog.Table._write_files),
        after which update/delete mutations (which require a fully bucketed
        layout, catalog.Table.replace_buckets) work again."""
        self.table.compact(
            target_partitions or self.spark.sparkContext.defaultParallelism
        )

    # ------------------------------------------------------------------ lookups

    # files per bucket above which the driver-side arrow path stops paying
    # (footer scans grow linearly; a store that hot needs compact() anyway)
    ARROW_LOOKUP_MAX_FILES = 64

    def _arrow_read_ids(
        self, ids: list[str]
    ) -> tuple[bool, dict[str, dict[str, Any]] | None]:
        """Driver-side pyarrow fast path for S6/S7 — (handled, {id: record}).

        A bucket-pruned lookup through Spark is still ~40 per-query
        overheads (~0.2 s measured); mirroring catalog.append_pylist's
        rationale, the driver reads the ids' bucket files directly: unify
        the footers' schemas (the mergeSchema analog), then a
        predicate-pushdown dataset scan on id (row groups skipped by
        min/max stats — 32 ms cold / 5 ms warm at 200k rows). Falls back
        to the Spark path — (False, None) — when the buckets hold too many
        files or the schemas can't unify.
        """
        snap = self.table.current_snapshot()
        if snap is None:
            return True, {}  # empty store: definitively not found
        buckets = self._buckets_of(ids)
        files = [
            f
            for f in snap.files
            if (b := Table._file_bucket(f)) is None or b in buckets
        ]
        if not files:
            return True, {}
        if len(files) > self.ARROW_LOOKUP_MAX_FILES:
            return False, None
        try:
            import pyarrow as pa
            import pyarrow.dataset as ds
            import pyarrow.parquet as pq
        except ImportError:
            return False, None
        try:
            schema = pa.unify_schemas([pq.read_schema(f) for f in files])
            tbl = ds.dataset(files, format="parquet", schema=schema).to_table(
                filter=ds.field("id").isin(ids)
            )
        except (OSError, pa.ArrowInvalid, pa.ArrowTypeError):
            # un-unifiable schemas, a warehouse URI pyarrow can't open though
            # Spark can, or a file vacuumed between current_snapshot() and
            # the footer read — all degrade to the Spark path, never crash
            return False, None
        cols = [
            (n, c)
            for n, c in zip(tbl.schema.names, tbl.columns)
            if n != "_seq"
        ]
        recs: dict[str, dict[str, Any]] = {}
        for i in range(tbl.num_rows):
            rec = {n: _arrow_cell(c[i].as_py(), c.type) for n, c in cols}
            recs[rec["id"]] = rec
        return True, recs

    def get_product(self, product_id: str) -> dict[str, Any]:
        """S6 — point lookup; ProductNotFoundError if absent. Reads only the
        id's bucket (1/n of the live files) — driver-side via pyarrow when
        the bucket's file count is small (the common case; <50 ms at 200k
        rows vs ~0.2 s for the distributed read), else the same
        bucket-pruned Spark scan."""
        handled, recs = self._arrow_read_ids([product_id])
        if handled:
            if not recs:
                raise ProductNotFoundError([product_id])
            return recs[product_id]
        df = self._df_for_ids([product_id])
        if df is not None:
            rows = df.where(F.col("id") == F.lit(product_id)).drop("_seq").collect()
            if rows:
                return rows[0].asDict(recursive=True)
        raise ProductNotFoundError([product_id])

    def get_products(self, product_ids: list[str]) -> list[dict[str, Any]]:
        """S7 — batch lookup, input-order preserving, ALL missing ids listed
        before any result is returned (ref json_storage.py:353-361). Shares
        the S6 pyarrow fast path (input order is restored from the request
        list, so the scan order never matters)."""
        if not product_ids:
            return []
        handled, found = self._arrow_read_ids(product_ids)
        if not handled:
            df = self._df_for_ids(product_ids)
            found = {}
            if df is not None:
                rows = (
                    df.where(F.col("id").isin(product_ids)).drop("_seq").collect()
                )
                found = {r["id"]: r.asDict(recursive=True) for r in rows}
        missing = [i for i in product_ids if i not in found]
        if missing:
            raise ProductNotFoundError(missing)
        return [found[i] for i in product_ids]

    # ------------------------------------------------------------------ updates

    def update_product(self, product_id: str, update: dict[str, Any]) -> dict[str, Any]:
        """D3 — shallow merge ``{**existing, **update}``.

        Nested dicts/lists are wholly replaced (verified ref behavior,
        test_json_storage.py:163-166); only updated_at is bumped.
        """
        if not product_id:
            raise ValueError("product_id is required")
        self.update_products([{**update, "id": product_id}])
        return self.get_product(product_id)

    def update_products(self, updates: list[dict[str, Any]]) -> int:
        """D4 — batch shallow merge, all-or-nothing.

        Validation order matches the reference (json_storage.py:460-471):
        every payload must carry an id, then every id must exist, before any
        write. One shared timestamp per batch (ref :478). Realized as the
        MERGE-equivalent: full-table join against the update batch with
        per-column "was this key provided?" resolution — exact
        ``{**existing, **update}`` semantics including explicit nulls.
        """
        if not updates:
            return 0
        no_id = [i for i, u in enumerate(updates) if not u.get("id")]
        if no_id:
            raise ValueError(f"updates at positions {no_id} lack an id")
        # A provided 'metadata' follows the reference's wholesale-replace-
        # then-stamp semantics (json_storage.py:410-413): the struct is
        # rebuilt from the payload (created_at kept only if the caller
        # supplied it — exactly what {**existing, **update} does) and
        # updated_at is stamped. Caller keys already present in the stored
        # struct schema (save-path metadata merge) are representable and
        # accepted; BRAND-NEW keys are rejected loudly — the one documented
        # divergence from the reference's schemaless JSON (a typed struct
        # cannot grow inside an O(touched-buckets) update; introduce new
        # metadata keys via a save).
        updates = [dict(u) for u in updates]
        metas: dict[int, dict[str, Any]] = {}
        for i, u in enumerate(updates):
            if "metadata" not in u:
                continue
            meta = u.pop("metadata")
            if not isinstance(meta, dict):
                raise ValueError(f"update at position {i}: metadata must be a dict")
            metas[i] = meta
            u["_meta_created_at"] = meta.get("created_at")
            u["_meta_provided"] = True
        upd_ids = [u["id"] for u in updates]
        # O(changed-data): every id lives in its hash bucket, so both the
        # existence pre-check and the merge read ONLY the touched buckets
        touched = self._buckets_of(upd_ids)
        df = self._df_for_ids(upd_ids)
        if df is None:
            raise ProductNotFoundError(sorted(set(upd_ids)))
        existing_ids = {
            r["id"] for r in df.where(F.col("id").isin(upd_ids)).select("id").collect()
        }
        missing = sorted(set(upd_ids) - existing_ids)
        if missing:
            raise ProductNotFoundError(missing)

        # caller metadata keys must be representable in the STORED struct
        # schema (stamps + whatever keys past saves merged in)
        meta_dtype = (
            df.schema["metadata"].dataType if "metadata" in df.columns else None
        )
        meta_extra_fields = (
            [
                f
                for f in meta_dtype.fields
                if f.name not in ("created_at", "updated_at")
            ]
            if isinstance(meta_dtype, T.StructType)
            else []
        )
        representable = {"created_at", "updated_at"} | {f.name for f in meta_extra_fields}
        for i, meta in metas.items():
            bad = sorted(set(meta) - representable)
            if bad:
                raise ValueError(
                    f"update at position {i}: metadata keys {bad} are not "
                    f"representable in this store's typed metadata struct "
                    f"({sorted(representable)}); introduce new metadata keys "
                    "via a save"
                )
        # annotate per-extra-field payload columns (wholesale replace: a key
        # absent from a provided metadata dict becomes null). Columns that
        # would be all-None are skipped — createDataFrame cannot infer them,
        # and the in-plan fallback literal is null anyway.
        for fld in meta_extra_fields:
            vals = {i: metas[i].get(fld.name) for i in metas}
            if any(v is not None for v in vals.values()):
                for i, u in enumerate(updates):
                    if i in metas:
                        u[f"_meta_x_{fld.name}"] = vals[i]

        # normalize the payload created_at to an ISO string so the batch
        # column infers cleanly (cast back to timestamp in the plan)
        has_meta_created = False
        for u in updates:
            v = u.get("_meta_created_at")
            if v is not None:
                u["_meta_created_at"] = v.isoformat() if hasattr(v, "isoformat") else str(v)
                has_meta_created = True
        if not has_meta_created:  # avoid an un-inferable all-None column
            for u in updates:
                u.pop("_meta_created_at", None)

        # annotate each update dict with the set of keys it provides
        # ("metadata" is re-listed explicitly: it was popped into the _meta_*
        # annotations above, and an empty provided-array would also break
        # createDataFrame's element-type inference)
        upd_rows = [
            {
                **u,
                "_provided": sorted(
                    [k for k in u if k != "id" and not k.startswith("_")]
                    + (["metadata"] if u.get("_meta_provided") else [])
                ),
            }
            for u in updates
        ]
        upd = self._rows_df(upd_rows)
        upd = upd.select(
            [F.col(c).alias(f"_u_{c}") if c != "id" else F.col(c) for c in upd.columns]
        )

        merged = df.join(F.broadcast(upd), "id", "left")
        provided = F.coalesce(F.col("_u__provided"), F.array().cast("array<string>"))
        matched = F.col("_u__provided").isNotNull()

        out_cols: list[Column] = [F.col("id")]
        base_cols = [c for c in df.columns if c != "id"]
        upd_only = [
            c[3:]
            for c in upd.columns
            if c.startswith("_u_")
            and c != "_u__provided"
            and not c[3:].startswith("_")  # engine-internal annotations
            and c[3:] not in df.columns
        ]
        meta_provided = (
            F.coalesce(F.col("_u__meta_provided"), F.lit(False))
            if "_u__meta_provided" in upd.columns
            else F.lit(False)
        )
        meta_created_payload = (
            F.col("_u__meta_created_at").cast("timestamp")
            if "_u__meta_created_at" in upd.columns
            else F.lit(None).cast("timestamp")
        )
        # every branch rebuilds the struct with ONE field order (extra
        # fields in schema order, then the stamps) — when/otherwise branches
        # must type-match exactly, and merged-on-read schemas don't
        # guarantee a stable field order across files
        def _meta_payload_field(fld) -> Column:
            cname = f"_u__meta_x_{fld.name}"
            if cname in upd.columns:
                return F.col(cname).cast(fld.dataType).alias(fld.name)
            return F.lit(None).cast(fld.dataType).alias(fld.name)

        meta_x_payload = [_meta_payload_field(f) for f in meta_extra_fields]
        meta_x_existing = [
            F.col("metadata").getField(f.name).alias(f.name) for f in meta_extra_fields
        ]
        for c in base_cols:
            if c == "metadata":
                # caller-provided metadata: wholesale replace + stamp
                # (ref :410-413); otherwise bump only updated_at (ref :412)
                out_cols.append(
                    F.when(
                        matched & meta_provided,
                        F.struct(
                            *meta_x_payload,
                            meta_created_payload.alias("created_at"),
                            F.current_timestamp().alias("updated_at"),
                        ),
                    )
                    .when(
                        matched,
                        F.struct(
                            *meta_x_existing,
                            F.col("metadata.created_at").alias("created_at"),
                            F.current_timestamp().alias("updated_at"),
                        ),
                    )
                    .otherwise(
                        F.struct(
                            *meta_x_existing,
                            F.col("metadata.created_at").alias("created_at"),
                            F.col("metadata.updated_at").alias("updated_at"),
                        )
                    )
                    .alias("metadata")
                )
            elif f"_u_{c}" in upd.columns:
                out_cols.append(
                    F.when(F.array_contains(provided, c), F.col(f"_u_{c}"))
                    .otherwise(F.col(c))
                    .alias(c)
                )
            else:
                out_cols.append(F.col(c))
        for c in upd_only:  # brand-new fields introduced by the update
            out_cols.append(
                F.when(F.array_contains(provided, c), F.col(f"_u_{c}")).alias(c)
            )
        self.table.replace_buckets(
            merged.select(out_cols),
            touched,
            counters=self.table.current_snapshot().counters,
        )
        # an update can EDIT text the content-dedup index has band keys
        # for, at an unchanged row count — invisible to any count probe.
        # Flag the index; the next checked save rebuilds it once
        # (code-review r04: silent false negatives after update). Stores
        # that never enabled reject_near_dups have no index directory —
        # skip the construction entirely rather than retag empty tables
        # (ADVICE r04: avoids per-update overhead + spurious empty dirs)
        import os

        if os.path.isdir(os.path.join(self.catalog.warehouse, "content_index")):
            self._content_index().mark_stale()
        return len(updates)

    # ------------------------------------------------------------------ deletes

    def delete_product(self, product_id: str) -> bool:
        """D5 — delete one; ProductNotFoundError if absent; returns True."""
        self.delete_products([product_id])
        return True

    def delete_products(self, product_ids: list[str]) -> int:
        """D6 — batch delete, all-or-nothing precheck (verified rollback,
        ref test_json_storage_batch.py:288-301); empty ⇒ 0."""
        if not product_ids:
            return 0
        # O(changed-data): only the ids' buckets are read and rewritten
        touched = self._buckets_of(product_ids)
        df = self._df_for_ids(product_ids)
        if df is None:
            raise ProductNotFoundError(sorted(set(product_ids)))
        existing = {
            r["id"]
            for r in df.where(F.col("id").isin(product_ids)).select("id").collect()
        }
        missing = sorted(set(product_ids) - existing)
        if missing:
            raise ProductNotFoundError(missing)
        remaining = df.where(~F.col("id").isin(product_ids))
        self.table.replace_buckets(
            remaining, touched, counters=self.table.current_snapshot().counters
        )
        return len(product_ids)

    # ------------------------------------------------------------------ query

    def list_products_df(
        self,
        filters: dict[str, Any] | None = None,
        page: int = 1,
        page_size: int = 100,
        sort_by: str | None = None,
        sort_order: str = "asc",
    ) -> tuple[DataFrame, int]:
        """The Q1-Q6 pipeline as a DataFrame (page_df, total).

        filter → sort → offset/limit. Late materialization (ref
        json_storage.py:674-678) is Catalyst column pruning — nothing to
        hand-roll. Missing sort values sort as "" (ref :657-658); ties break
        by save order (_seq), replicating the reference's stable Timsort over
        dict-insertion order.
        """
        df = self._df()
        if df is None:
            empty = self.spark.createDataFrame([], T.StructType([T.StructField("id", T.StringType())]))
            return empty, 0
        if filters:
            preds: list[Column] = []
            for field, value in filters.items():
                col = self._resolve(df, field) if self._filterable(field) else None
                if col is None:
                    # unknown/unindexed field ⇒ match nothing (verified ref
                    # behavior, SURVEY §5.2) — in both modes, a filter on a
                    # nonexistent column cannot match.
                    preds.append(F.lit(False))
                elif field in df.columns and not _type_compatible(
                    df.schema[field].dataType, value
                ):
                    preds.append(F.lit(False))  # type mismatch ⇒ no match
                else:
                    preds.append(col == _lit_value(value))
            df = df.where(reduce(lambda a, b: a & b, preds))
        total = df.count()

        order = []
        if sort_by:
            key = self._resolve(df, sort_by)
            key = F.coalesce(key.cast("string"), F.lit("")) if key is not None else F.lit("")
            order.append(key.desc() if sort_order.lower() == "desc" else key.asc())
        order.append(F.col("_seq").asc())  # stable tiebreak = save order
        df = df.orderBy(*order)

        start = (page - 1) * page_size
        page_df = df.offset(start).limit(page_size).drop("_seq")
        return page_df, total

    def list_products(
        self,
        filters: dict[str, Any] | None = None,
        page: int = 1,
        page_size: int = 100,
        sort_by: str | None = None,
        sort_order: str = "asc",
    ) -> ListResult:
        """Q7 — full envelope, contract-identical to the reference
        (base.py:189-196): total_pages = ceil(total/page_size), minimum 1."""
        page_df, total = self.list_products_df(filters, page, page_size, sort_by, sort_order)
        products = [r.asDict(recursive=True) for r in page_df.collect()]
        return ListResult(
            products=products,
            total=total,
            page=page,
            page_size=page_size,
            total_pages=max(1, math.ceil(total / page_size)),
        )
