"""Switch-over path: a reference JsonStorage directory migrates into the
engine with identical query answers (sources/reference_json.py).

The fixture writes the EXACT on-disk layout the reference produces
(crawl4ai_llm storage/json_storage.py: one ``<id>.json`` object per record
with engine-stamped ISO metadata, plus the derived ``index.json``), then
migrates and checks the engine's get/list/update surface against the
known contents — original ids AND original created_at/updated_at survive.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from crawl4ai_llm_spark.sources.reference_json import (
    migrate_reference_store,
    read_reference_store,
)

RECORDS = [
    {
        "id": "shopx_sku1",
        "title": "Widget",
        "url": "https://shopx.example/p/1",
        "sku": "sku1",
        "store_name": "shopx",
        "category": "tools",  # undeclared field — schema-on-read
        "prices": [{"amount": "9.99", "currency": "USD"}],
        "metadata": {
            "created_at": "2025-03-01T10:00:00.000001",
            "updated_at": "2025-03-02T11:30:00.000002",
            "source": "import",  # caller metadata key
        },
    },
    {
        "id": "url_12345",
        "title": "Gadget",
        "url": "https://shopy.example/p/2",
        "store_name": "shopy",
        "category": "toys",
        "prices": [{"amount": "19.99", "currency": "EUR"}],
        "metadata": {
            "created_at": "2025-04-05T08:15:00",
            "updated_at": "2025-04-05T08:15:00",
        },
    },
    {
        "id": "shopx_sku3",
        "title": "Doohickey",
        "url": "https://shopx.example/p/3",
        "sku": "sku3",
        "store_name": "shopx",
        "category": "tools",
        "metadata": {
            "created_at": "2025-05-20T23:59:59.5",
            "updated_at": "2025-05-21T00:00:01",
        },
    },
]


@pytest.fixture()
def ref_dir(tmp_path):
    d = tmp_path / "ref_store"
    d.mkdir()
    index = {}
    for rec in RECORDS:
        with open(d / f"{rec['id']}.json", "w") as f:
            json.dump(rec, f)
        index[rec["id"]] = {
            "id": rec["id"],
            "metadata": rec["metadata"],
            **{
                k: rec[k]
                for k in ("sku", "url", "store_name", "title")
                if k in rec
            },
        }
    with open(d / "index.json", "w") as f:
        json.dump(index, f)
    return str(d)


def test_reference_store_migrates_with_parity(spark, ref_dir, tmp_path):
    df = read_reference_store(spark, ref_dir)
    assert df.count() == len(RECORDS)  # index.json excluded

    store = migrate_reference_store(spark, ref_dir, str(tmp_path / "migrated"))
    # point lookups by ORIGINAL id, original stamps preserved as timestamps
    got = store.get_product("shopx_sku1")
    assert got["title"] == "Widget"
    assert got["category"] == "tools"
    assert got["prices"][0]["amount"] == "9.99"
    assert got["metadata"]["created_at"] == dt.datetime(2025, 3, 1, 10, 0, 0, 1)
    assert got["metadata"]["updated_at"] == dt.datetime(2025, 3, 2, 11, 30, 0, 2)
    assert got["metadata"]["source"] == "import"  # caller key survives
    # the list pipeline answers like the reference would
    res = store.list_products(filters={"category": "tools"}, sort_by="title")
    assert [p["id"] for p in res.products] == ["shopx_sku3", "shopx_sku1"]
    assert res.total == 2
    res2 = store.list_products(filters={"store_name": "shopy"})
    assert [p["id"] for p in res2.products] == ["url_12345"]
    # engine mutations work on migrated data (update bumps only updated_at)
    store.update_product("url_12345", {"title": "Gadget v2"})
    g2 = store.get_product("url_12345")
    assert g2["title"] == "Gadget v2"
    assert g2["metadata"]["created_at"] == dt.datetime(2025, 4, 5, 8, 15)
    assert g2["metadata"]["updated_at"] > dt.datetime(2025, 4, 5, 8, 15)
    # and the id-tier duplicate guard holds against migrated ids
    from crawl4ai_llm_spark.errors import DuplicateProductError

    with pytest.raises(DuplicateProductError):
        store.save_products([{"id": "shopx_sku1", "title": "clash", "url": "https://x.y/z"}])


def test_empty_reference_store(spark, tmp_path):
    d = tmp_path / "empty_ref"
    d.mkdir()
    with open(d / "index.json", "w") as f:
        json.dump({}, f)
    assert read_reference_store(spark, str(d)) is None
    store = migrate_reference_store(spark, str(d), str(tmp_path / "m2"))
    assert store.list_products().total == 0
