"""Multimodal plumbing tests — real Arrow-batched schema/partitioning, stubbed codecs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_llm_spark.frontier import webgraph as wg
from crawl4ai_llm_spark.multimodal import media as mm


@pytest.fixture(scope="module")
def docs_df(spark):
    spec = wg.GraphSpec(seed="mm-42")
    urls = [wg.canonical_page_url(h, p) for h in range(3) for p in range(10)]
    rows = [(u, wg.page_spans(spec, u)) for u in urls]
    return spark.createDataFrame(rows, "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>")


def test_media_table_schema_and_determinism(spark, docs_df):
    media = mm.media_table_from_spans(docs_df)
    rows = media.collect()
    assert rows, "graph should contain media spans"
    assert set(media.columns) == {"media_id", "kind", "payload", "meta"}
    r = rows[0]
    assert len(bytes(r["payload"])) == 256
    assert r["meta"]["width"] % 16 == 0
    # deterministic: same input → identical payloads
    again = {x["media_id"]: bytes(x["payload"]) for x in mm.media_table_from_spans(docs_df).collect()}
    assert all(again[x["media_id"]] == bytes(x["payload"]) for x in rows)


def test_decode_image_stub_raises_without_codec(spark, docs_df):
    media = mm.media_table_from_spans(docs_df)
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; stub branch not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        mm.decode_image(media, fake=False)


def test_decode_image_fake_path(spark, docs_df):
    media = mm.media_table_from_spans(docs_df)
    out = mm.decode_image(media, fake=True)
    rows = out.collect()
    n_images = media.where(F.col("kind") == "image").count()
    assert len(rows) == n_images
    assert all(0 <= r["mean_px"] <= 255 for r in rows)


def test_extract_features_shape(spark, docs_df):
    media = mm.media_table_from_spans(docs_df)
    out = mm.extract_features(media).collect()
    assert all(len(r["features"]) == mm.FEATURE_DIM for r in out)
    # unit-ish norm
    import math

    for r in out[:5]:
        n = math.sqrt(sum(x * x for x in r["features"]))
        assert abs(n - 1.0) < 1e-3


def test_sample_frames_fake_explodes_videos(spark, docs_df):
    media = mm.media_table_from_spans(docs_df)
    frames = mm.sample_frames(media, every_ms=5000, fake=True).collect()
    n_videos = media.where(F.col("kind") == "video").count()
    if n_videos:
        assert frames
        assert all(r["frame_ts_ms"] % 5000 == 0 for r in frames)
