"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a typed metadata
struct; every transform runs as an Arrow-batched pandas function over
``mapInPandas`` — the schema, partitioning, UDF signatures, and batch
shapes are real and tested. The actual codec work (JPEG decode, resample,
frame extraction) is STUBBED: the codec libraries (PIL/libav/ffmpeg) are
not in this container, so ``decode_*`` raises NotImplementedError unless
``fake=True``, which substitutes a deterministic byte-derived stand-in so
the distributed plumbing can be exercised end-to-end.

Scale notes: payloads never pass through Python row-by-row — each batch is
one Arrow buffer; feature extraction is numpy over the buffer. Partitioning
by ``pmod(hash(media_id), N)`` keeps batches balanced regardless of
per-document media counts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), nullable=False),
        T.StructField("kind", T.StringType(), nullable=False),  # image|video|audio
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


def synth_payload(media_ref: str, n_bytes: int = 256) -> bytes:
    """Deterministic synthetic payload from a media_ref (md5 stream)."""
    out = b""
    seed = media_ref.encode()
    while len(out) < n_bytes:
        seed = hashlib.md5(seed).digest()
        out += seed
    return out[:n_bytes]


def media_table_from_spans(docs: DataFrame) -> DataFrame:
    """Explode interleaved documents into a media table: one row per
    non-text span, payload synthesized (stand-in for the fetch of the
    asset), metadata derived. Pure plumbing — no codecs."""

    def build(batches):
        for pdf in batches:
            refs = pdf["media_ref"]
            kinds = pdf["kind"]
            payloads = [synth_payload(r) for r in refs]
            metas = [
                {
                    "width": 16 * (1 + p[0] % 64),
                    "height": 16 * (1 + p[1] % 64),
                    "duration_ms": (int.from_bytes(p[2:4], "big") if k != "image" else None),
                    "codec": {"image": "jpeg", "video": "h264", "link": "none"}.get(k, "raw"),
                }
                for p, k in zip(payloads, kinds)
            ]
            yield pd.DataFrame(
                {
                    "media_id": refs,
                    "kind": kinds,
                    "payload": payloads,
                    "meta": metas,
                }
            )

    spans = (
        docs.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") != "text")
        .select(F.col("s.kind").alias("kind"), F.col("s.media_ref").alias("media_ref"))
        .distinct()
        .repartition(F.pmod(F.hash("media_ref"), F.lit(docs.sparkSession.sparkContext.defaultParallelism)))
    )
    return spans.mapInPandas(build, MEDIA_SCHEMA)


def decode_image(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode stub: real decode needs PIL/turbojpeg (absent here). With
    fake=True, emits deterministic pixel stats derived from payload bytes —
    same schema and batch path the real decoder would use."""
    try:
        import PIL.Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    if not have_pil and not fake:
        raise NotImplementedError(
            "image decode requires PIL/libjpeg (absent in this environment); "
            "pass fake=True for the deterministic stand-in"
        )

    schema = "media_id string, mean_px double, std_px double"

    def run(batches):
        for pdf in batches:
            arrs = [np.frombuffer(p, dtype=np.uint8).astype(np.float64) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mean_px": [round(float(a.mean()), 6) for a in arrs],
                    "std_px": [round(float(a.std()), 6) for a in arrs],
                }
            )

    return media.where(F.col("kind") == "image").mapInPandas(run, schema)


def extract_features(media: DataFrame) -> DataFrame:
    """Byte-histogram feature vector per asset (array<float>) — the shape of
    a real embedding extractor: Arrow batch in, one numpy pass, fixed-dim
    vector out."""
    schema = f"media_id string, features array<float>"

    def run(batches):
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                a = np.frombuffer(p, dtype=np.uint8)
                hist, _ = np.histogram(a, bins=FEATURE_DIM, range=(0, 256))
                v = hist.astype(np.float32)
                n = np.linalg.norm(v)
                feats.append((v / n if n else v).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.mapInPandas(run, schema)


def sample_frames(media: DataFrame, every_ms: int = 1000, fake: bool = False) -> DataFrame:
    """Frame-sampling stub for video: real implementation needs libav.
    fake=True emits one synthetic frame row per sampled timestamp — the
    explode shape (one asset → many frames) is the real contract."""
    try:
        import av  # noqa: F401

        have_av = True
    except ImportError:
        have_av = False

    if not have_av and not fake:
        raise NotImplementedError(
            "frame sampling requires PyAV/ffmpeg (absent); pass fake=True"
        )

    schema = "media_id string, frame_ts_ms int, frame binary"

    def run(batches):
        for pdf in batches:
            ids, tss, frames = [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                duration = (meta or {}).get("duration_ms") or 0
                for ts in range(0, int(duration), every_ms):
                    ids.append(mid)
                    tss.append(ts)
                    frames.append(synth_payload(f"{mid}@{ts}", 64))
            yield pd.DataFrame({"media_id": ids, "frame_ts_ms": tss, "frame": frames})

    return media.where(F.col("kind") == "video").mapInPandas(run, schema)
