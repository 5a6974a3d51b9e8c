"""Streaming incremental dedup: the DedupIndex ingest loop as a running
Structured Streaming pipeline (streaming/dedup_stream.py).

Each microbatch must match ONLY against batches ingested before it —
matches always point backward — and batch replay (Structured Streaming's
failure semantics) must be idempotent per table.
"""

from __future__ import annotations

import os
import time

from crawl4ai_llm_spark.streaming.dedup_stream import StreamingDedup


def _mk_text(seed: str, n: int = 25) -> str:
    return " ".join(f"{seed}{j}x{j * 7}" for j in range(n))


A1, A2, A3 = _mk_text("alpha"), _mk_text("beta"), _mk_text("gamma")
B = _mk_text("delta")
C = _mk_text("omega")


def _near(text: str) -> str:
    toks = text.split(" ")
    toks[3] = "CHANGED"
    return " ".join(toks)


BATCHES = [
    [(101, A1), (102, A2), (103, A3)],
    [(201, _near(A1)), (202, B)],
    # 302 is a near-copy of A1 — it must match BOTH 101 (batch 0) and 201
    # (batch 1): the index accumulates across batches
    [(301, _near(B)), (302, _near(A1)), (303, C)],
]
EXPECTED = {(201, 101), (301, 202), (302, 101), (302, 201)}


def _write_batches(spark, docs_dir: str) -> None:
    """One FLAT parquet file per batch (the file stream source does not
    recurse into subdirectories), mtime-pinned so microbatch order is the
    batch order."""
    import glob
    import shutil

    os.makedirs(docs_dir, exist_ok=True)
    for k, rows in enumerate(BATCHES):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        stage = os.path.join(docs_dir, f"_stage_{k}")
        df.coalesce(1).write.parquet(stage)
        (part,) = glob.glob(os.path.join(stage, "part-*.parquet"))
        dest = os.path.join(docs_dir, f"batch-{k}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(stage)
        os.utime(dest, (1_000_000 + k, 1_000_000 + k))
        time.sleep(0.01)


def test_streaming_dedup_matches_point_backward(spark, tmp_path):
    docs_dir = str(tmp_path / "arrivals")
    _write_batches(spark, docs_dir)
    sd = StreamingDedup(spark, str(tmp_path / "wh"))
    sd.run_available_now(docs_dir, str(tmp_path / "cp"), max_files_per_trigger=1)

    rows = sd.matches.read().collect()
    got = {(r["new_id"], r["orig_id"]) for r in rows}
    assert got == EXPECTED
    for r in rows:
        # one token changed in 25 kills 3 of 23 shingles: J = 20/26 ≈ 0.77
        assert r["jaccard"] > 0.7
        # matches point strictly backward: orig batch < new batch
        assert r["orig_id"] // 100 < r["new_id"] // 100
    # corpus and index ingested everything
    assert sd.corpus.read().count() == 8
    snap = sd.index.minhash_bands.current_snapshot()
    assert int(snap.counters["n_docs"]) == 8


def test_streaming_dedup_replay_is_idempotent(spark, tmp_path):
    docs_dir = str(tmp_path / "arrivals")
    _write_batches(spark, docs_dir)
    sd = StreamingDedup(spark, str(tmp_path / "wh"))
    sd.run_available_now(docs_dir, str(tmp_path / "cp"), max_files_per_trigger=1)
    n_matches = sd.matches.read().count()
    n_corpus = sd.corpus.read().count()

    # streaming-style replay of an already-applied batch id: every table
    # skips (per-table batch_id guard)
    replay = spark.createDataFrame(BATCHES[1], "doc_id long, text string")
    sd.process_batch(replay, 1)
    assert sd.matches.read().count() == n_matches
    assert sd.corpus.read().count() == n_corpus
    assert int(sd.index.minhash_bands.current_snapshot().counters["n_docs"]) == 8

    # a fresh run over the same checkpoint sees no new files ⇒ no batches
    sd2 = StreamingDedup(spark, str(tmp_path / "wh"))
    sd2.run_available_now(docs_dir, str(tmp_path / "cp"), max_files_per_trigger=1)
    assert sd2.matches.read().count() == n_matches
    assert sd2.corpus.read().count() == n_corpus


def _vec(dom: int, scale: float = 1.0):
    # dominant coordinate `dom` + a small common floor: distinct doms give
    # cosine ~0.02, scaled copies give cosine 1.0
    return [scale * (10.0 if j == dom else 0.1) for j in range(64)]


def test_streaming_embedding_dedup(spark, tmp_path):
    """kind='embedding': the same foreachBatch loop over the sign-band
    index — matches point strictly backward, cos_sim exact, replay
    idempotent."""
    import glob
    import os
    import shutil

    batches = [
        [(101, _vec(0)), (102, _vec(7)), (103, _vec(19))],
        [(201, _vec(0, scale=1.3)), (202, _vec(33))],  # 201 dups 101
        [(301, _vec(33, scale=0.8)), (302, _vec(0, scale=2.0)), (303, _vec(50))],
    ]
    docs_dir = str(tmp_path / "vec_arrivals")
    os.makedirs(docs_dir)
    for k, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "vec_id long, v array<double>")
        stage = os.path.join(docs_dir, f"_stage_{k}")
        df.coalesce(1).write.parquet(stage)
        (part,) = glob.glob(os.path.join(stage, "part-*.parquet"))
        dest = os.path.join(docs_dir, f"batch-{k}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(stage)
        os.utime(dest, (1_000_000 + k, 1_000_000 + k))

    sd = StreamingDedup(spark, str(tmp_path / "vec_wh"), kind="embedding")
    sd.run_available_now(docs_dir, str(tmp_path / "vec_cp"), max_files_per_trigger=1)
    rows = sd.matches.read().collect()
    got = {(r["new_id"], r["orig_id"]) for r in rows}
    # 201 dups 101; 301 dups 202; 302 dups both 101 AND 201 (across batches)
    assert got == {(201, 101), (301, 202), (302, 101), (302, 201)}
    for r in rows:
        assert r["cos_sim"] > 0.99  # positive scaling: cosine exactly ~1
        assert r["orig_id"] // 100 < r["new_id"] // 100  # backward-only
    assert sd.corpus.read().count() == 8
    assert int(sd.index.sign_bands.current_snapshot().counters["n_vecs"]) == 8
    # replay idempotency
    n = sd.matches.read().count()
    sd.process_batch(
        spark.createDataFrame(batches[1], "vec_id long, v array<double>"), 1
    )
    assert sd.matches.read().count() == n


def test_index_compaction_bounds_files_and_preserves_matches(spark, tmp_path):
    """Per-batch ingest appends one commit's files per batch; compact()
    with expire_keep_last=1 bounds both the LIVE file set and disk, and
    matching behaves identically afterwards."""
    docs_dir = str(tmp_path / "arrivals")
    _write_batches(spark, docs_dir)
    sd = StreamingDedup(spark, str(tmp_path / "wh"))
    sd.run_available_now(docs_dir, str(tmp_path / "cp"), max_files_per_trigger=1)

    probe = spark.createDataFrame([(999, _near(A1))], "doc_id long, text string")
    before = {
        (r["new_id"], r["orig_id"])
        for r in sd.index.match_documents(probe, sd.corpus.read()).collect()
    }
    files_before = len(sd.index.minhash_bands.current_snapshot().files)
    n_docs_before = sd.index.minhash_bands.current_snapshot().counters["n_docs"]
    sd.index.compact(target_partitions=2, expire_keep_last=1)
    snap = sd.index.minhash_bands.current_snapshot()
    assert len(snap.files) <= 2 < files_before
    assert snap.counters["n_docs"] == n_docs_before  # counters survive
    after = {
        (r["new_id"], r["orig_id"])
        for r in sd.index.match_documents(probe, sd.corpus.read()).collect()
    }
    assert after == before == {(999, 101), (999, 201), (999, 302)}
