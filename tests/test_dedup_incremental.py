"""Incremental (cross-batch) dedup against the persisted fingerprint
index — the O(batch)-per-batch path a continuously-ingesting 100-TB
corpus needs instead of re-deduplicating history every crawl.

Covers: intra-batch first-occurrence semantics, cross-batch dup
detection, crash-replay idempotency (verdicts AND index state), the
shuffle-join fallback parity, and MoR compaction mid-stream.
"""

import os

import pytest
from pyspark.sql import functions as F

from debezium_connector_db2_spark.operators.dedup_incremental import (
    IncrementalDeduper,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BATCH1 = [
    (1, "the quick brown fox"),
    (2, "lazy dogs sleep"),
    (3, "The Quick  Brown-Fox"),   # normalizes == doc 1 -> intra-batch dup
    (4, "unique alpha"),
]
BATCH2 = [
    (10, "lazy dogs sleep"),       # cross-batch dup of doc 2
    (11, "brand new content"),
    (12, "brand  NEW content!"),   # intra-batch dup of doc 11
    (13, "unique beta"),
]


def _verdict_map(df):
    return {r["doc_id"]: r["is_dup"] for r in df.collect()}


def test_two_batches_and_replay(spark, tmpdir_path):
    idx = os.path.join(tmpdir_path, "fpindex")
    d = IncrementalDeduper(spark, idx, n_buckets=4)

    v1 = _verdict_map(d.process_batch(
        _docs(spark, BATCH1), "doc_id", "text", batch_seq=1))
    assert v1 == {1: False, 2: False, 3: True, 4: False}

    v2 = _verdict_map(d.process_batch(
        _docs(spark, BATCH2), "doc_id", "text", batch_seq=2))
    assert v2 == {10: True, 11: False, 12: True, 13: False}

    # index holds one row per distinct fp: 3 from batch1 + 2 from batch2
    assert d.index.read().count() == 5

    # crash-replay of batch 2: same batch_seq + batch_id -> identical
    # verdicts (the index already contains batch 2's fps; the
    # commit_lsn < batch_seq probe must ignore them) and no new rows.
    v2r = _verdict_map(d.process_batch(
        _docs(spark, BATCH2), "doc_id", "text", batch_seq=2))
    assert v2r == v2
    assert d.index.read().count() == 5

    # batch 3 sees everything registered so far
    v3 = _verdict_map(d.process_batch(
        _docs(spark, [(20, "unique alpha"), (21, "unique gamma")]),
        "doc_id", "text", batch_seq=3))
    assert v3 == {20: True, 21: False}
    assert d.index.read().count() == 6


def test_shuffle_probe_parity(spark, tmpdir_path):
    a = IncrementalDeduper(spark, os.path.join(tmpdir_path, "ia"), n_buckets=4)
    b = IncrementalDeduper(spark, os.path.join(tmpdir_path, "ib"), n_buckets=4)
    for seq, batch in ((1, BATCH1), (2, BATCH2)):
        va = _verdict_map(a.process_batch(
            _docs(spark, batch), "doc_id", "text", seq, broadcast_probe=True))
        vb = _verdict_map(b.process_batch(
            _docs(spark, batch), "doc_id", "text", seq, broadcast_probe=False))
        assert va == vb


def test_compact_between_batches(spark, tmpdir_path):
    d = IncrementalDeduper(
        spark, os.path.join(tmpdir_path, "ic"), n_buckets=2)
    d.process_batch(_docs(spark, BATCH1), "doc_id", "text", 1)
    d.compact()
    v2 = _verdict_map(d.process_batch(_docs(spark, BATCH2), "doc_id", "text", 2))
    assert v2 == {10: True, 11: False, 12: True, 13: False}
    assert d.index.read().count() == 5


def test_reopen_existing_index(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "id")
    IncrementalDeduper(spark, path, n_buckets=2).process_batch(
        _docs(spark, BATCH1), "doc_id", "text", 1)
    # fresh handle over the same path must see prior registrations
    d2 = IncrementalDeduper(spark, path, n_buckets=2)
    v = _verdict_map(d2.process_batch(
        _docs(spark, [(30, "unique alpha")]), "doc_id", "text", 2))
    assert v == {30: True}


def test_streaming_dedup_across_drops(spark, tmpdir_path):
    """Crawl drops arriving as a file stream: cross-drop dups filtered,
    restart resumes the clock, replay writes no doubled output."""
    from debezium_connector_db2_spark.operators.dedup_incremental import (
        StreamingDeduper)

    crawl = os.path.join(tmpdir_path, "crawl")
    sd = StreamingDeduper(
        spark, crawl, os.path.join(tmpdir_path, "idx"),
        os.path.join(tmpdir_path, "kept"), os.path.join(tmpdir_path, "ckpt"),
        max_files_per_trigger=1)

    _docs(spark, BATCH1).coalesce(1).write.mode("append").parquet(crawl)
    sd.run_available()
    kept1 = spark.read.parquet(os.path.join(tmpdir_path, "kept"))
    assert sorted(r["doc_id"] for r in kept1.collect()) == [1, 2, 4]

    # second drop: new file with cross-drop dups of batch 1
    _docs(spark, BATCH2).coalesce(1).write.mode("append").parquet(crawl)
    sd.run_available()
    kept = spark.read.parquet(os.path.join(tmpdir_path, "kept"))
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2, 4, 11, 13]

    # a NEW query over the same state (restart): clock resumes past the
    # registered batches, drained files are not reprocessed
    sd2 = StreamingDeduper(
        spark, crawl, os.path.join(tmpdir_path, "idx"),
        os.path.join(tmpdir_path, "kept"), os.path.join(tmpdir_path, "ckpt"),
        max_files_per_trigger=1)
    assert sd2._base_seq >= 2
    sd2.run_available()
    kept_after = spark.read.parquet(os.path.join(tmpdir_path, "kept"))
    assert kept_after.count() == 5
