"""Contract tests — the reference's verified behaviors, ported (SURVEY.md §5.3).

Each test names the reference behavior it ports (file:line into
/root/reference). Where the reference's own tests and code disagree, the
SURVEY §5.2 ruling applies.
"""

from __future__ import annotations

import pytest

from crawl4ai_llm_spark.errors import DuplicateProductError, ProductNotFoundError


def sample_product(i: int = 0) -> dict:
    # shape of ref tests/test_json_storage.py:39-61
    return {
        "title": f"Test Product {i}",
        "description": "A product",
        "sku": f"SKU{i:04d}",
        "url": f"https://example.com/p/{i}",
        "store_name": "Test Store",
        "attributes": {"color": "red", "size": "M"},
    }


# --- save / get roundtrip (ref test_json_storage.py:103-160) ----------------


def test_save_and_get_roundtrip(store):
    pid = store.save_product(sample_product(1))
    assert pid == "Test Store_SKU0001"  # E1: store_name_sku (json_storage.py:83)
    got = store.get_product(pid)
    assert got["title"] == "Test Product 1"
    assert got["attributes"] == {"color": "red", "size": "M"}  # undeclared fields kept
    assert got["metadata"]["created_at"] is not None
    assert got["metadata"]["updated_at"] is not None


def test_duplicate_save_raises(store):
    store.save_product(sample_product(1))
    with pytest.raises(DuplicateProductError):
        store.save_product(sample_product(1))  # ref json_storage.py:195-197


def test_get_missing_raises(store):
    store.save_product(sample_product(1))
    with pytest.raises(ProductNotFoundError):
        store.get_product("nope")  # ref json_storage.py:317-319


def test_id_generation_hierarchy(store):
    # ref test_json_storage.py:472-492
    assert store.save_product({"id": "explicit", "title": "a"}) == "explicit"
    assert store.save_product({"store_name": "S", "sku": "K", "title": "b"}) == "S_K"
    url_id = store.save_product({"url": "https://x.com/1", "title": "c"})
    assert url_id.startswith("url_")  # url-hash branch (murmur3, SURVEY §8.3)
    fallback_id = store.save_product({"title": "d"})
    assert fallback_id and fallback_id not in {"explicit", "S_K", url_id}


# --- batch save (ref test_json_storage_batch.py) -----------------------------


def test_save_products_batch_and_order(store):
    ids = store.save_products([sample_product(i) for i in range(5)])
    assert ids == [f"Test Store_SKU{i:04d}" for i in range(5)]
    got = store.get_products(ids[::-1])
    assert [g["sku"] for g in got] == [f"SKU{i:04d}" for i in reversed(range(5))]  # input order


def test_save_products_empty_fast_path(store):
    assert store.save_products([]) == []  # ref json_storage.py:239-240


def test_save_products_existing_dup_all_or_nothing(store):
    store.save_product(sample_product(1))
    with pytest.raises(DuplicateProductError):
        store.save_products([sample_product(2), sample_product(1)])
    # nothing from the failed batch landed
    with pytest.raises(ProductNotFoundError):
        store.get_product("Test Store_SKU0002")


def test_save_products_intra_batch_dup_rejected(store):
    # SURVEY §2.2 D2 ruling: the reference silently corrupts here; the
    # engine rejects deterministically.
    with pytest.raises(DuplicateProductError):
        store.save_products([sample_product(1), sample_product(1)])


def test_get_products_lists_all_missing(store):
    store.save_products([sample_product(i) for i in range(2)])
    with pytest.raises(ProductNotFoundError) as e:
        store.get_products(["Test Store_SKU0000", "m1", "m2"])
    assert set(e.value.missing_ids) == {"m1", "m2"}  # ref json_storage.py:360-361


# --- update (ref test_json_storage.py:163-193, batch :206-229) ---------------


def test_update_shallow_merge(store):
    pid = store.save_product(sample_product(1))
    store.update_product(pid, {"title": "New", "attributes": {"color": "blue"}})
    got = store.get_product(pid)
    assert got["title"] == "New"
    # nested dict wholly replaced, not deep-merged (ref test:163-166)
    assert got["attributes"] == {"color": "blue"}
    assert got["description"] == "A product"  # untouched field kept
    assert got["metadata"]["updated_at"] >= got["metadata"]["created_at"]


def test_update_requires_id(store):
    with pytest.raises(ValueError):
        store.update_product("", {"title": "x"})  # ref json_storage.py:396-397


def test_update_missing_raises(store):
    store.save_product(sample_product(1))
    with pytest.raises(ProductNotFoundError):
        store.update_product("nope", {"title": "x"})


def test_update_products_all_or_nothing(store):
    ids = store.save_products([sample_product(i) for i in range(2)])
    with pytest.raises(ProductNotFoundError):
        store.update_products(
            [{"id": ids[0], "title": "changed"}, {"id": "missing", "title": "x"}]
        )
    assert store.get_product(ids[0])["title"] == "Test Product 0"  # rolled back


def test_update_metadata_wholesale_replace(store):
    """Reference semantics (json_storage.py:410-413): a provided metadata
    replaces wholesale, then updated_at is stamped — created_at survives
    ONLY if the caller included it (as the get→modify→update cycle does)."""
    import datetime as dt

    pid = store.save_product(sample_product(1))
    before = store.get_product(pid)
    # round-trip update: caller passes back the metadata it read
    store.update_product(pid, {"title": "round-trip", **{"metadata": before["metadata"]}})
    got = store.get_product(pid)
    assert got["title"] == "round-trip"
    assert got["metadata"]["created_at"] == before["metadata"]["created_at"]
    assert got["metadata"]["updated_at"] >= before["metadata"]["updated_at"]
    # metadata WITHOUT created_at: wholesale replace loses it (ref {**e,**u})
    store.update_product(pid, {"metadata": {}})
    got2 = store.get_product(pid)
    assert got2["metadata"]["created_at"] is None
    assert got2["metadata"]["updated_at"] is not None
    # explicit created_at (ISO string form) is honored
    store.update_product(pid, {"metadata": {"created_at": dt.datetime(2020, 1, 2, 3, 4, 5)}})
    assert store.get_product(pid)["metadata"]["created_at"] == dt.datetime(2020, 1, 2, 3, 4, 5)


def test_update_metadata_unrepresentable_keys_rejected(store):
    """Keys the stored struct schema cannot hold are rejected loudly, never
    silently dropped (documented divergence from the reference's schemaless
    JSON: a typed struct cannot grow inside an O(touched-buckets) update —
    new metadata keys arrive via a save)."""
    pid = store.save_product(sample_product(1))
    with pytest.raises(ValueError, match="not\\s+representable"):
        store.update_product(pid, {"metadata": {"source": "import"}})
    # nothing was written
    assert store.get_product(pid)["title"] == "Test Product 1"


def test_update_metadata_caller_keys_roundtrip(store):
    """Caller metadata keys merged at save time ARE representable in
    updates: wholesale replace keeps provided keys, nulls missing ones,
    stamps updated_at (ref {**existing, **update} + :412)."""
    pid = store.save_product(
        {**sample_product(5), "metadata": {"source": "import", "rank": 7}}
    )
    before = store.get_product(pid)
    # get→modify→update cycle passes the whole metadata back
    meta = dict(before["metadata"])
    meta["source"] = "curated"
    store.update_product(pid, {"metadata": meta})
    got = store.get_product(pid)
    assert got["metadata"]["source"] == "curated"
    assert got["metadata"]["rank"] == 7
    assert got["metadata"]["created_at"] == before["metadata"]["created_at"]
    assert got["metadata"]["updated_at"] >= before["metadata"]["updated_at"]
    # wholesale: a provided metadata WITHOUT a key nulls it
    store.update_product(pid, {"metadata": {"source": "only"}})
    got2 = store.get_product(pid)
    assert got2["metadata"]["source"] == "only"
    assert got2["metadata"]["rank"] is None
    assert got2["metadata"]["created_at"] is None  # {**e,**u} lost it (ref)
    # an update WITHOUT metadata leaves caller keys untouched, bumps updated_at
    store.update_product(pid, {"title": "bump"})
    got3 = store.get_product(pid)
    assert got3["metadata"]["source"] == "only"
    assert got3["metadata"]["updated_at"] >= got2["metadata"]["updated_at"]


def test_update_products_new_field(store):
    ids = store.save_products([sample_product(i) for i in range(2)])
    store.update_products([{"id": ids[0], "category": "tools"}])
    assert store.get_product(ids[0])["category"] == "tools"
    # rows never written with the field don't carry it on a point read —
    # reference parity: a JSON file's absent field is absent, not null
    # (bucket-pruned reads see only the row's own files); full-table reads
    # (list_products) still surface it as null via mergeSchema
    other = store.get_product(ids[1])
    assert other.get("category") is None
    listed = {p["id"]: p for p in store.list_products(page_size=10).products}
    assert listed[ids[1]]["category"] is None


# --- error/model parity (ref base.py:14-16, models.py:13-77) -----------------


def test_unwritable_warehouse_raises_connection_error(spark):
    """Reference contract: backend unreachable/unwritable is
    StorageConnectionError, not a raw OS error (ref base.py:14-16)."""
    from crawl4ai_llm_spark.errors import StorageConnectionError
    from crawl4ai_llm_spark.storage.store import ProductStore

    with pytest.raises(StorageConnectionError):
        # a path under a device file can never become a directory
        ProductStore(spark, "/dev/null/warehouse")


def test_product_model_validation(store):
    """Pydantic-parity validation (ref models.py:32-77): required title,
    http(s) URL on product and images, typed prices."""
    from crawl4ai_llm_spark.models import ProductData, ProductImage, ProductPrice

    with pytest.raises(ValueError, match="title"):
        ProductData(title="", url="https://x.example/p")
    with pytest.raises(ValueError, match="http"):
        ProductData(title="t", url="ftp://x.example/p")
    with pytest.raises(ValueError, match="http"):
        ProductImage(url="not-a-url")
    with pytest.raises(ValueError, match="amount"):
        ProductPrice(amount="", currency="USD")
    # a valid model round-trips through the store, unknown keys preserved
    pid = store.save_product(
        {
            "title": "Widget",
            "url": "https://x.example/widget",
            "prices": [{"amount": "9.99", "currency": "USD"}],
            "images": [{"url": "https://x.example/w.png", "alt": "w"}],
            "custom_field": "kept",
        },
        validate=True,
    )
    got = store.get_product(pid)
    assert got["title"] == "Widget"
    assert got["prices"][0]["amount"] == "9.99"
    assert got["custom_field"] == "kept"
    # invalid payloads are rejected BEFORE any write
    with pytest.raises(ValueError):
        store.save_product({"title": "x", "url": "nope"}, validate=True)


def test_config_surface_builds_store_and_crawl(spark, tmp_path):
    """Reference config parity (config.py:11-107): StorageConfig builds a
    working store (the analog of the reference's broken factory,
    factory.py:55-57); CrawlerConfig maps to the frontier CrawlConfig."""
    from crawl4ai_llm_spark.config import AppConfig, CrawlerConfig, StorageConfig
    from crawl4ai_llm_spark.errors import StorageConnectionError

    cfg = AppConfig(storage=StorageConfig(path=str(tmp_path / "wh"), use_uuid=False))
    s = cfg.storage.build(spark)
    pid = s.save_product(sample_product(1))
    assert s.get_product(pid)["title"] == "Test Product 1"
    # deterministic ids honored through the config path
    assert pid == "Test Store_SKU0001"
    with pytest.raises(StorageConnectionError):
        StorageConfig(path=str(tmp_path / "absent"), create_if_missing=False).build(spark)
    cc = CrawlerConfig(delay=2.0, max_retries=5).to_crawl_config(max_waves=3)
    assert (cc.delay, cc.max_retries, cc.max_waves) == (2.0, 5, 3)
    with pytest.raises(NotImplementedError):
        cfg.llm.build()


# --- bucketed layout: pruned lookups + O(changed-data) mutations -------------


def test_point_lookup_reads_one_bucket(store):
    """The id's hash bucket prunes the point-lookup scan to 1/n of the
    live files (VERDICT r01 item 5)."""
    ids = store.save_products([sample_product(i) for i in range(40)])
    all_files = store.table.current_snapshot().files
    buckets_present = {store.table._file_bucket(f) for f in all_files}
    assert len(buckets_present) > 4  # data actually spread across buckets
    pruned = store._df_for_ids([ids[0]])
    read_files = set(pruned.inputFiles())
    target_bucket = store._buckets_of([ids[0]])
    assert {store.table._file_bucket(f) for f in read_files} == target_bucket
    assert len(read_files) < len(all_files)
    # and the lookup still finds the row
    assert store.get_product(ids[0])["title"] == "Test Product 0"


def test_point_lookup_arrow_path_matches_spark(spark, tmp_path):
    """S6 fast path: the driver-side pyarrow read must return EXACTLY the
    record the distributed Spark read returns — nested maps, struct
    metadata, timestamp values and all — and decline gracefully above its
    file-count budget."""
    from crawl4ai_llm_spark.storage import ProductStore

    st = ProductStore(spark, str(tmp_path / "arrow_wh"))
    ids = st.save_products([sample_product(i) for i in range(10)])
    # a second commit with a NEW column exercises the schema-unification
    # (mergeSchema analog) in the arrow path
    st.save_products([{**sample_product(99), "category": "tools"}])
    for pid in (ids[3], "Test Store_SKU0099"):
        arrow_rec = st.get_product(pid)
        st.ARROW_LOOKUP_MAX_FILES = 0  # instance override → Spark fallback
        spark_rec = st.get_product(pid)
        del st.ARROW_LOOKUP_MAX_FILES
        assert arrow_rec == spark_rec, pid
    assert arrow_rec["attributes"] == {"color": "red", "size": "M"}  # map shape
    with pytest.raises(ProductNotFoundError):
        st.get_product("nope")
    # S7 shares the fast path: input order preserved, all missing listed
    batch = st.get_products([ids[5], ids[1], "Test Store_SKU0099"])
    assert [r["id"] for r in batch] == [ids[5], ids[1], "Test Store_SKU0099"]
    assert batch[2]["category"] == "tools"
    with pytest.raises(ProductNotFoundError) as ei:
        st.get_products([ids[0], "ghost-a", "ghost-b"])
    assert ei.value.missing_ids == ["ghost-a", "ghost-b"]


def test_update_rewrites_only_touched_buckets(store):
    """A small update commits new files ONLY for the touched buckets; every
    other bucket's files carry over by reference (VERDICT r01 item 6)."""
    ids = store.save_products([sample_product(i) for i in range(40)])
    before = set(store.table.current_snapshot().files)
    store.update_products([{"id": ids[0], "title": "patched"}])
    after = set(store.table.current_snapshot().files)
    touched = store._buckets_of([ids[0]])
    # untouched buckets: identical file paths survive the commit
    carried = before & after
    assert {store.table._file_bucket(f) for f in before - after} <= touched
    assert {store.table._file_bucket(f) for f in after - before} <= touched
    assert len(carried) >= len(before) - len(touched)
    assert store.get_product(ids[0])["title"] == "patched"
    # the other rows are intact through the bucket-scoped rewrite
    assert store.get_product(ids[1])["title"] == "Test Product 1"


def test_delete_rewrites_only_touched_buckets(store):
    ids = store.save_products([sample_product(i) for i in range(40)])
    before = set(store.table.current_snapshot().files)
    store.delete_products(ids[:2])
    after = set(store.table.current_snapshot().files)
    touched = store._buckets_of(ids[:2])
    assert {store.table._file_bucket(f) for f in (before ^ after)} <= touched
    assert store.list_products(page_size=1).total == 38
    with pytest.raises(ProductNotFoundError):
        store.get_product(ids[0])


def test_expire_snapshots_bounds_storage(store):
    """catalog.expire_snapshots (Iceberg parity): old manifests and the
    files ONLY they reference are deleted; current data is untouched;
    time travel past the horizon is gone."""
    import glob
    import os

    ids = store.save_products([sample_product(i) for i in range(10)])
    for i in range(5):  # five more commits: updates churn bucket files
        store.update_products([{"id": ids[i], "title": f"v{i}"}])
    tbl = store.table
    n_snaps_before = len(tbl.snapshots())
    files_before = len(glob.glob(os.path.join(tbl.data_dir, "**", "*.parquet"), recursive=True))
    stats = tbl.expire_snapshots(keep_last=2)
    assert stats["removed_snapshots"] == n_snaps_before - 2
    assert stats["removed_files"] > 0
    files_after = len(glob.glob(os.path.join(tbl.data_dir, "**", "*.parquet"), recursive=True))
    assert files_after < files_before
    # current state fully intact through the GC
    assert store.get_product(ids[0])["title"] == "v0"
    assert store.list_products(page_size=1).total == 10
    # live files all still exist
    for f in tbl.current_snapshot().files:
        assert os.path.exists(f)
    # time travel past the horizon is gone (manifest deleted)
    oldest_kept = tbl.snapshots()[0].snapshot_id
    with pytest.raises(FileNotFoundError):
        tbl.snapshot(oldest_kept - 1)
    # further commits work normally after expiration
    store.update_products([{"id": ids[9], "title": "post-gc"}])
    assert store.get_product(ids[9])["title"] == "post-gc"


# --- delete (ref test_json_storage.py, batch :288-301) -----------------------


def test_delete_product(store):
    pid = store.save_product(sample_product(1))
    assert store.delete_product(pid) is True
    with pytest.raises(ProductNotFoundError):
        store.get_product(pid)


def test_delete_missing_raises(store):
    store.save_product(sample_product(1))
    with pytest.raises(ProductNotFoundError):
        store.delete_product("nope")


def test_delete_products_all_or_nothing(store):
    ids = store.save_products([sample_product(i) for i in range(3)])
    with pytest.raises(ProductNotFoundError):
        store.delete_products([ids[0], "missing"])
    assert store.get_product(ids[0])["title"] == "Test Product 0"  # still there
    assert store.delete_products(ids) == 3
    assert store.delete_products([]) == 0  # empty fast-path (ref :572-573)


# --- list_products pipeline (ref test_json_storage.py:196-240, 495-534) ------


def test_list_filter_sort_paginate(store):
    store.save_products(
        [
            {**sample_product(i), "store_name": "A" if i % 2 == 0 else "B"}
            for i in range(10)
        ]
    )
    res = store.list_products(filters={"store_name": "A"}, sort_by="sku", sort_order="desc")
    assert res.total == 5
    assert res.total_pages == 1
    assert [p["sku"] for p in res.products] == [f"SKU{i:04d}" for i in (8, 6, 4, 2, 0)]


def test_list_pagination_envelope(store):
    store.save_products([sample_product(i) for i in range(7)])
    res = store.list_products(page=2, page_size=3, sort_by="sku")
    assert (res.total, res.page, res.page_size, res.total_pages) == (7, 2, 3, 3)
    assert [p["sku"] for p in res.products] == ["SKU0003", "SKU0004", "SKU0005"]


def test_list_empty_envelope(store):
    res = store.list_products()
    # total_pages is min 1 even when empty (ref json_storage.py:668)
    assert (res.total, res.total_pages, res.products) == (0, 1, [])


def test_list_unknown_filter_matches_nothing(store):
    store.save_products([sample_product(i) for i in range(3)])
    res = store.list_products(filters={"no_such_field": "x"})
    assert res.total == 0  # verified ref behavior (SURVEY §5.2)


def test_list_dot_path_filter_and_list_equality(store):
    # ref test_json_storage.py:527-530 — whole-list equality on metadata.tags;
    # engine stores user tags as a regular column.
    store.save_products(
        [
            {"id": "a", "title": "t1", "tags": ["x", "y"]},
            {"id": "b", "title": "t2", "tags": ["x"]},
        ]
    )
    res = store.list_products(filters={"tags": ["x", "y"]})
    assert [p["id"] for p in res.products] == ["a"]


def test_list_missing_sort_value_sorts_first_asc(store):
    store.save_products(
        [
            {"id": "a", "title": "t", "rank": "2"},
            {"id": "b", "title": "t"},  # no rank → "" → first asc
            {"id": "c", "title": "t", "rank": "1"},
        ]
    )
    res = store.list_products(sort_by="rank")
    assert [p["id"] for p in res.products] == ["b", "c", "a"]


def test_list_tie_order_is_save_order(store):
    # reference ties = dict-insertion order = save order (SURVEY §2.3 Q3)
    store.save_products([{"id": str(i), "title": "same"} for i in (3, 1, 2)])
    res = store.list_products(sort_by="title")
    assert [p["id"] for p in res.products] == ["3", "1", "2"]


def test_list_type_mismatched_filter_matches_nothing(store):
    # reference equality is Python != — type mismatch means "no match",
    # never a cast error (json_storage.py:708)
    store.save_products([sample_product(1)])
    assert store.list_products(filters={"sku": 42}).total == 0
    assert store.list_products(filters={"title": True}).total == 0


def test_save_products_df_bulk(spark, tmp_path):
    from pyspark.sql import functions as F

    from crawl4ai_llm_spark.storage import ProductStore

    st = ProductStore(spark, str(tmp_path / "bulk"))
    df = spark.range(1000).select(
        F.concat(F.lit("K"), F.col("id").cast("string")).alias("sku"),
        F.lit("S").alias("store_name"),
        F.lit("t").alias("title"),
    )
    assert st.save_products_df(df) == 1000
    assert st.get_product("S_K500")["title"] == "t"
    with pytest.raises(DuplicateProductError):  # vs-existing
        st.save_products_df(df.limit(5))
    with pytest.raises(DuplicateProductError):  # intra-batch
        st.save_products_df(
            spark.createDataFrame(
                [("X", "S2", "t"), ("X", "S2", "t")], "sku string, store_name string, title string"
            )
        )
    assert st.list_products().total == 1000  # failed batches left nothing


def test_compat_mode_restricts_filter_surface(spark, tmp_path):
    from crawl4ai_llm_spark.storage import ProductStore

    s = ProductStore(spark, str(tmp_path / "w2"), compat_mode=True)
    s.save_products([{**sample_product(1), "category": "tools"}])
    # category is real data but NOT in the reference's index projection →
    # matches nothing in compat mode (verified ref behavior, SURVEY §5.2)
    assert s.list_products(filters={"category": "tools"}).total == 0
    assert s.list_products(filters={"sku": "SKU0001"}).total == 1


def test_legacy_unbucketed_layout_migrates_via_compact(spark, tmp_path):
    """Mutations on a pre-bucketing (legacy) layout must fail loudly with
    the compact remedy, and ProductStore.compact() must actually migrate
    the layout so the same mutation then succeeds (ADVICE r02: the error's
    remedy must be reachable)."""
    from crawl4ai_llm_spark.catalog import Catalog
    from crawl4ai_llm_spark.storage import ProductStore

    wh = str(tmp_path / "legacy_wh")
    st = ProductStore(spark, wh)
    st.save_products([sample_product(i) for i in range(6)])
    # simulate the legacy layout: rewrite through an UNBUCKETED table handle
    raw = Catalog(spark, wh).table("products", merge_schema=True)
    raw.overwrite(st.table.read(), counters=st.table.current_snapshot().counters)
    pid = "Test Store_SKU0001"
    with pytest.raises(ValueError, match="compact"):
        st.update_product(pid, {"title": "new"})
    st.compact()
    st.update_product(pid, {"title": "new"})
    assert st.get_product(pid)["title"] == "new"
    assert st.delete_product("Test Store_SKU0002")
    assert st.list_products().total == 5


def test_bulk_duplicate_sample_deterministic_and_truncated(spark, tmp_path):
    """The DuplicateProductError payload is the first 20 conflicting ids BY
    SORT ORDER (not partition arrival order) and flags the truncation
    (ADVICE r02)."""
    from pyspark.sql import functions as F

    from crawl4ai_llm_spark.storage import ProductStore

    st = ProductStore(spark, str(tmp_path / "wh_dup"))
    batch = spark.range(30).select(
        F.format_string("id%02d", F.col("id")).alias("id"),
        F.lit("t").alias("title"),
    )
    st.save_products_df(batch)
    with pytest.raises(DuplicateProductError) as ei:
        st.save_products_df(batch)
    assert ei.value.dup_ids == [f"id{i:02d}" for i in range(20)]
    assert ei.value.truncated
    assert "more conflicts exist" in str(ei.value)


def _nd_batch(spark, ids_texts):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [(i, t) for i, t in ids_texts], "id string, description string"
    ).withColumn("title", F.concat(F.lit("t-"), F.col("id")))


def test_save_content_near_dup_tier(spark, tmp_path):
    """D1 generalized to content (VERDICT r03 #6): save_products_df with
    reject_near_dups=<col> checks arriving text against the store's
    PERSISTED band-key index — reject mode raises with (new, stored, J)
    pairs; skip mode commits only the non-duplicates; the default path is
    untouched (no index, no check)."""
    import pytest as _pytest

    from crawl4ai_llm_spark.errors import NearDuplicateContentError
    from crawl4ai_llm_spark.storage import ProductStore

    words = "red green blue cyan teal lime rose gold jade onyx".split()
    texts = {
        f"c{i}": " ".join(words[(i + j) % 10] + str(i * 13 + j) for j in range(25))
        for i in range(6)
    }
    st = ProductStore(spark, str(tmp_path / "nd_wh"))
    assert st.save_products_df(
        _nd_batch(spark, texts.items()), reject_near_dups="description"
    ) == 6
    # near-copy of c2 (one token changed) + one genuinely new doc
    near = texts["c2"].replace(words[2] + "26", "CHANGED", 1)
    fresh = " ".join(f"zz{j} qq{j * 3}" for j in range(15))
    with _pytest.raises(NearDuplicateContentError) as ei:
        st.save_products_df(
            _nd_batch(spark, [("n0", near), ("n1", fresh)]),
            reject_near_dups="description",
        )
    assert ei.value.dup_ids == ["n0"]
    assert any(p[0] == "n0" and p[1] == "c2" and p[2] > 0.5 for p in ei.value.pairs)
    # nothing was written by the rejected batch
    assert st.list_products(page_size=100).total == 6
    # skip mode: the near-dup is dropped, the fresh row commits
    n = st.save_products_df(
        _nd_batch(spark, [("n0", near), ("n1", fresh)]),
        reject_near_dups="description",
        on_near_dup="skip",
    )
    assert n == 1
    assert st.get_product("n1")["description"] == fresh
    with _pytest.raises(Exception):
        st.get_product("n0")
    # the index followed the commits: a re-save of the fresh text now
    # matches the STORED n1 (no full-store rescan — index equi-join)
    with _pytest.raises(NearDuplicateContentError) as ei2:
        st.save_products_df(
            _nd_batch(spark, [("n2", fresh)]), reject_near_dups="description"
        )
    assert any(p[1] == "n1" for p in ei2.value.pairs)
    # default path unchanged: no content check without the flag
    assert st.save_products_df(_nd_batch(spark, [("n3", near)])) == 1


def test_update_marks_content_index_stale(spark, tmp_path):
    """update_products edits indexed text at an UNCHANGED row count — no
    count probe can see it. The update must flag the index so the next
    checked save rebuilds and catches near-dups of the NEW text
    (code-review r04: silent false negatives after update)."""
    import pytest as _pytest

    from crawl4ai_llm_spark.errors import NearDuplicateContentError
    from crawl4ai_llm_spark.storage import ProductStore

    st = ProductStore(spark, str(tmp_path / "nd_upd_wh"))
    old_text = " ".join(f"o{j} p{j * 3} q{j + 5}" for j in range(12))
    new_text = " ".join(f"n{j} m{j * 7} k{j + 9}" for j in range(12))
    st.save_products_df(_nd_batch(spark, [("u0", old_text)]), reject_near_dups="description")
    st.update_products([{"id": "u0", "description": new_text}])
    # a near-dup of the NEW text must now be caught (the stale index still
    # holds OLD text's band keys — the update flagged it for rebuild)
    with _pytest.raises(NearDuplicateContentError) as ei:
        st.save_products_df(
            _nd_batch(spark, [("u1", new_text.replace("n3", "X", 1))]),
            reject_near_dups="description",
        )
    assert any(p[1] == "u0" for p in ei.value.pairs)
    # and a near-dup of the OLD (replaced) text is correctly NOT a dup
    assert st.save_products_df(
        _nd_batch(spark, [("u2", old_text.replace("o3", "Y", 1))]),
        reject_near_dups="description",
    ) == 1


def test_save_metadata_all_none_key_dropped(store):
    """A caller metadata key that is None in EVERY record must be dropped
    (absent ≡ None, schema-on-read), not crash parquet with a NullType
    column (code-review r04)."""
    ids = store.save_products(
        [
            {**sample_product(70), "metadata": {"discount": None, "source": "a"}},
            {**sample_product(71), "metadata": {"discount": None}},
        ]
    )
    got = store.get_product(ids[0])
    assert got["metadata"]["source"] == "a"
    assert "discount" not in got["metadata"]


def test_save_content_dup_index_rebuild_on_divergence(spark, tmp_path):
    """The content index is derived data: a store written WITHOUT the
    content tier (count divergence) gets its index rebuilt transparently
    on the next checked save."""
    import pytest as _pytest

    from crawl4ai_llm_spark.errors import NearDuplicateContentError
    from crawl4ai_llm_spark.storage import ProductStore

    st = ProductStore(spark, str(tmp_path / "nd_wh2"))
    base = " ".join(f"w{j} v{j * 7} u{j + 11}" for j in range(12))
    st.save_products_df(_nd_batch(spark, [("a0", base)]))  # unindexed save
    with _pytest.raises(NearDuplicateContentError):
        st.save_products_df(
            _nd_batch(spark, [("b0", base.replace("w3", "X", 1))]),
            reject_near_dups="description",
        )


def test_save_merges_caller_metadata(store):
    """Reference semantics (json_storage.py:189-192): caller metadata KEYS
    are preserved and the engine overwrites created_at/updated_at with
    fresh stamps — never silently destroying caller data and never letting
    a caller forge the stamps (ADVICE r03 closure)."""
    import datetime as dt

    ids = store.save_products(
        [
            {**sample_product(90), "metadata": {"source": "import", "rank": 3}},
            sample_product(91),  # no metadata: engine-shaped struct only
            # caller-supplied stamps are overwritten by the engine
            {**sample_product(92), "metadata": {"created_at": dt.datetime(1999, 1, 1)}},
        ]
    )
    got = store.get_product(ids[0])
    assert got["metadata"]["source"] == "import"
    assert got["metadata"]["rank"] == 3
    assert got["metadata"]["created_at"].year >= 2020
    assert got["metadata"]["updated_at"] is not None
    got1 = store.get_product(ids[1])
    assert got1["metadata"]["source"] is None  # batch-union schema, no value
    assert got1["metadata"]["created_at"] is not None
    assert store.get_product(ids[2])["metadata"]["created_at"].year >= 2020
    # non-dict metadata is rejected loudly
    with pytest.raises(ValueError, match="metadata must be a dict"):
        store.save_products([{**sample_product(93), "metadata": "nope"}])


def test_save_metadata_roundtrip(store, spark, tmp_path):
    """get_product → save_products must round-trip: the fetched record
    carries the engine-stamped metadata struct, and re-saving it (new id)
    simply re-stamps (the r03 ADVICE regression)."""
    from crawl4ai_llm_spark.storage import ProductStore

    pid = store.save_product(
        {**sample_product(94), "metadata": {"source": "roundtrip"}}
    )
    rec = store.get_product(pid)
    st2 = ProductStore(spark, str(tmp_path / "meta_rt"))
    new_id = st2.save_products([rec])[0]
    got = st2.get_product(new_id)
    assert got["metadata"]["source"] == "roundtrip"
    assert got["metadata"]["created_at"] >= rec["metadata"]["created_at"]
    # the model tier also passes caller metadata through
    from crawl4ai_llm_spark.models import ProductData

    m = ProductData.from_dict(
        {"title": "t", "url": "https://x.y/p", "metadata": {"source": "import"}}
    )
    assert m.to_record()["metadata"] == {"source": "import"}


def test_save_products_df_metadata(spark, tmp_path):
    """Bulk tier: a struct-typed metadata column merges (caller fields kept,
    stamps overwritten); a non-struct metadata column is rejected loudly."""
    from pyspark.sql import functions as F

    from crawl4ai_llm_spark.storage import ProductStore

    st = ProductStore(spark, str(tmp_path / "meta_bulk"))
    st.save_products_df(
        spark.range(3).select(
            F.concat(F.lit("m"), F.col("id").cast("string")).alias("id"),
            F.lit("t").alias("title"),
            F.struct(
                F.lit("x").alias("source"),
                F.lit(None).cast("timestamp").alias("created_at"),
            ).alias("metadata"),
        )
    )
    got = st.get_product("m1")
    assert got["metadata"]["source"] == "x"
    assert got["metadata"]["created_at"] is not None  # engine stamp, not the null
    with pytest.raises(ValueError, match="must be a struct"):
        st.save_products_df(
            spark.range(1).select(
                F.lit("q0").alias("id"),
                F.lit("t").alias("title"),
                F.lit("not-a-struct").alias("metadata"),
            )
        )
