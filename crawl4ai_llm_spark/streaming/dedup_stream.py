"""Streaming incremental dedup — the DedupIndex ingest loop as a running
Structured Streaming pipeline.

``q_dedup_incremental`` exercises ONE batch against the persisted band-key
index; this module runs the same steady-state shape continuously: a file
source of arriving document batches is drained microbatch-by-microbatch,
and each batch is (1) matched against everything ingested BEFORE it —
band-key equi-join + exact-Jaccard verify, never a corpus rescan — then
(2) appended to the corpus and band index. ``foreachBatch`` is the right
tool here, not pure streaming operators: the match joins a snapshot table
and the loop mutates two tables per batch (Spark's own docs prescribe
foreachBatch for exactly this write-to-multiple-sinks / arbitrary-logic
case).

Exactly-once: Structured Streaming replays a failed microbatch with the
SAME batch_id; every table commit here is tagged with that id and skipped
when already applied (per-table idempotent replay — the same guard shape
Iceberg's ``spark.sql.streaming`` sink uses). A crash between the three
commits therefore re-runs the batch and each table catches up exactly
once. At production scale the three tables are Iceberg and the file
source is Kafka; both swaps are one-line.

Intra-batch duplicates are NOT matched against each other (consistent
with ProductStore.save_products_df's documented content-tier semantics):
a batch is deduped against the PAST, not against itself.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_llm_spark.catalog import Catalog, Table
from crawl4ai_llm_spark.operators.dedup_store import (
    COSINE_DUP_TAU,
    JACCARD_TAU,
    DedupIndex,
)

DOCS_SCHEMA = "doc_id long, text string"
VECS_SCHEMA = "vec_id long, v array<double>"


class StreamingDedup:
    """Corpus + band index + match log under one warehouse, advanced one
    microbatch at a time. ``kind="text"`` streams (doc_id, text) rows
    through the MinHash band index at exact-Jaccard ``tau``;
    ``kind="embedding"`` streams (vec_id, v array<double>) through the
    sign-band index at exact-cosine ``tau`` — same tables, same
    idempotency guards, same backward-only match contract."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        tau: float | None = None,
        kind: str = "text",
    ):
        if kind not in ("text", "embedding"):
            raise ValueError("kind must be 'text' or 'embedding'")
        self.spark = spark
        self.kind = kind
        self.tau = tau if tau is not None else (
            JACCARD_TAU if kind == "text" else COSINE_DUP_TAU
        )
        self.catalog = Catalog(spark, warehouse)
        self.index = DedupIndex(spark, os.path.join(warehouse, "index"))
        self.corpus: Table = self.catalog.table("corpus")
        self.matches: Table = self.catalog.table("matches")
        self._id_col = "doc_id" if kind == "text" else "vec_id"
        self._payload_col = "text" if kind == "text" else "v"
        self._score_col = "jaccard" if kind == "text" else "cos_sim"

    @property
    def _index_table(self) -> Table:
        # resolved live: DedupIndex.sync_* replaces its Table objects on a
        # rebuild, so a reference captured at __init__ could dangle
        return self.index.minhash_bands if self.kind == "text" else self.index.sign_bands

    @staticmethod
    def _applied(table: Table, batch_id: int) -> bool:
        snap = table.current_snapshot()
        return snap is not None and int(snap.counters.get("batch_id", -1)) >= batch_id

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """One microbatch: match vs the already-ingested corpus, then
        ingest. Idempotent per table under streaming's batch replay."""
        batch_id = int(batch_id)
        batch_df = batch_df.select(self._id_col, self._payload_col).cache()
        # per-batch plans are unique — without explicit unpersists every
        # microbatch would leak its match caches for the life of the
        # stream (code-review r04 finding)
        caches: list = [batch_df]
        # text kind: ONE signature pass per microbatch, shared by match
        # and ingest (they each ran their own before)
        prepared = None
        if self.kind == "text":
            prepared = self.index.prepare_batch(batch_df).cache()
            caches.append(prepared)
        extra = {"prepared": prepared} if prepared is not None else {}
        match = (
            self.index.match_documents
            if self.kind == "text"
            else self.index.match_embeddings
        )
        ingest = (
            self.index.ingest_documents
            if self.kind == "text"
            else self.index.ingest_embeddings
        )
        try:
            if not self._applied(self.matches, batch_id):
                stored = self.corpus.read()
                if stored is not None and not self._index_table.is_empty():
                    found = match(
                        batch_df, stored, tau=self.tau, caches=caches, **extra
                    ).withColumn("batch_id", F.lit(batch_id))
                else:  # first batch: nothing ingested yet
                    found = self.spark.createDataFrame(
                        [],
                        f"new_id long, orig_id long, {self._score_col} double, "
                        "batch_id long",
                    )
                self.matches.append(found, counters={"batch_id": batch_id})
            if not self._applied(self.corpus, batch_id):
                self.corpus.append(batch_df, counters={"batch_id": batch_id})
            # band-key ingest carries its own cumulative counter — preserved
            if not self._applied(self._index_table, batch_id):
                ingest(batch_df, counters={"batch_id": batch_id}, **extra)
        finally:
            for c in caches:
                c.unpersist()

    def run_available_now(
        self, docs_dir: str, checkpoint_dir: str, max_files_per_trigger: int = 1
    ) -> None:
        """Drain every available input file (Trigger.AvailableNow),
        ``max_files_per_trigger`` files per microbatch — the offline
        harness; a live deployment drops the trigger and the pipeline
        runs until stopped."""
        schema = DOCS_SCHEMA if self.kind == "text" else VECS_SCHEMA
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(docs_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
