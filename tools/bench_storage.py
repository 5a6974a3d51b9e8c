"""1M-row storage bench refresh (VERDICT r04 #7).

The BENCH.md storage numbers (68.5k rec/s ingest, 1.2 s lookup, 2.9 s
filtered page) were measured on r01/r02 code — before bucketing, the
pyarrow driver read path, metadata merge, and the content near-dup tier
existed. This tool re-measures the same 1M-row flow on current code:

  1. bulk ingest (plain)                — save_products_df
  2. bulk ingest (content tier ON)      — reject_near_dups + skip mode,
                                          near-unique texts: measures the
                                          indexing overhead a content-
                                          checked ingest pays
  3. point lookup (bucket-pruned)       — get_product
  4. filtered + sorted page             — list_products envelope
  5. update_products (10 rows)          — O(touched-buckets) + stale flag

One cpu-state control per section (this box's kernel-time pathology —
bench.py / BENCH.md). Usage: python tools/bench_storage.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import cpu_state_control
from crawl4ai_llm_spark.session import get_spark
from crawl4ai_llm_spark.storage.store import ProductStore


def make_batch(spark, n_rows: int, with_text: bool):
    cols = [
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("id"),
        F.concat(F.lit("title "), F.col("id").cast("string")).alias("title"),
        (F.col("id") % 997).cast("double").alias("price"),
    ]
    if with_text:
        # ~8-word near-unique texts: real shingles, no near-dups, so the
        # content tier measures pure indexing overhead (not rejection)
        cols.append(
            F.format_string(
                "alpha%d beta%d gamma%d delta%d epsilon%d zeta%d eta%d theta%d",
                F.col("id") % 9973, (F.col("id") / 7).cast("long") % 9973,
                F.col("id") % 733, (F.col("id") / 3).cast("long") % 733,
                F.col("id") % 119, (F.col("id") / 11).cast("long") % 997,
                F.col("id") % 47, F.col("id"),
            ).alias("description")
        )
    return spark.range(n_rows).select(*cols)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="bench_storage")
    out: dict = {"n_rows": n_rows}

    with tempfile.TemporaryDirectory() as tmp:
        store = ProductStore(spark, os.path.join(tmp, "plain"))
        batch = make_batch(spark, n_rows, with_text=False)
        batch.count()  # materialize the range outside the timed window
        t0 = time.time()
        n = store.save_products_df(batch)
        dt = time.time() - t0
        assert n == n_rows
        out["ingest_plain_sec"] = round(dt, 2)
        out["ingest_plain_rec_s"] = int(n_rows / dt)
        out["ctl_ingest_plain"] = cpu_state_control()["allcore_sys_frac"]

        t0 = time.time()
        got = store.get_product(f"p{n_rows // 2}")
        out["point_lookup_sec"] = round(time.time() - t0, 3)
        assert got["title"] == f"title {n_rows // 2}"

        t0 = time.time()
        res = store.list_products(
            filters={"price": 500.0}, page=2, page_size=50,
            sort_by="title", sort_order="desc",
        )
        out["filtered_page_sec"] = round(time.time() - t0, 3)
        out["filtered_total"] = res.total
        assert res.total == n_rows // 997 + (1 if n_rows % 997 > 500 else 0)

        t0 = time.time()
        store.update_products(
            [{"id": f"p{i}", "price": 1.5} for i in range(0, 1000, 100)]
        )
        out["update_10_sec"] = round(time.time() - t0, 3)
        out["ctl_ops"] = cpu_state_control()["allcore_sys_frac"]

        store_c = ProductStore(spark, os.path.join(tmp, "content"))
        batch_c = make_batch(spark, n_rows, with_text=True)
        batch_c.count()
        t0 = time.time()
        n = store_c.save_products_df(
            batch_c, reject_near_dups="description", on_near_dup="skip"
        )
        dt = time.time() - t0
        out["ingest_content_sec"] = round(dt, 2)
        out["ingest_content_rec_s"] = int(n / dt)
        out["ingest_content_rows"] = n
        out["ctl_ingest_content"] = cpu_state_control()["allcore_sys_frac"]

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
