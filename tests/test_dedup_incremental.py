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

    # a NEW query over the same state (restart): the clock base is the
    # PERSISTED first-start base (stable for the checkpoint's lifetime —
    # epoch ids carry the progress), drained files are not reprocessed
    sd2 = StreamingDeduper(
        spark, crawl, os.path.join(tmpdir_path, "idx"),
        os.path.join(tmpdir_path, "kept"), os.path.join(tmpdir_path, "ckpt"),
        max_files_per_trigger=1)
    assert sd2._base_seq == sd._base_seq
    sd2.run_available()
    kept_after = spark.read.parquet(os.path.join(tmpdir_path, "kept"))
    assert kept_after.count() == 5


def test_streaming_dedup_crash_between_index_and_checkpoint(
        spark, tmpdir_path):
    """The one-sided crash window: the index committed an epoch's
    fingerprints but the process died BEFORE the streaming checkpoint
    recorded the epoch.  The restarted query replays the same epoch_id;
    the persisted clock base must map it to the SAME batch_seq so the
    ``commit_lsn < batch_seq`` probe excludes the epoch's own
    registrations and the original kept set is re-derived — not an
    empty overwrite of ``out_dir/epoch=N``."""
    from debezium_connector_db2_spark.operators.dedup_incremental import (
        StreamingDeduper)

    crawl = os.path.join(tmpdir_path, "crawl")
    _docs(spark, BATCH1).coalesce(1).write.mode("append").parquet(crawl)
    args = (spark, crawl, os.path.join(tmpdir_path, "idx"),
            os.path.join(tmpdir_path, "kept"),
            os.path.join(tmpdir_path, "ckpt"))

    sd = StreamingDeduper(*args)
    # Simulate the crash window by invoking the foreachBatch body
    # directly: the index + output commit happens, the streaming
    # checkpoint never sees epoch 0.
    sd._apply(_docs(spark, BATCH1), epoch_id=0)
    kept_first = sorted(
        r["doc_id"] for r in spark.read.parquet(
            os.path.join(tmpdir_path, "kept")).collect())
    assert kept_first == [1, 2, 4]

    # Restart: a fresh instance over the same checkpoint dir replays
    # epoch 0.  Pre-fix, _base_seq was recomputed from the index (now
    # nonzero), epoch 0 mapped to a LARGER seq, the probe saw the
    # epoch's own fps, and the replay overwrote epoch=0 with nothing.
    sd2 = StreamingDeduper(*args)
    assert sd2._base_seq == sd._base_seq
    sd2._apply(_docs(spark, BATCH1), epoch_id=0)
    kept_replay = sorted(
        r["doc_id"] for r in spark.read.parquet(
            os.path.join(tmpdir_path, "kept")).collect())
    assert kept_replay == [1, 2, 4]
    # and the index registered nothing twice
    assert sd2.dedup.index.read().count() == 3


def test_streaming_dedup_fresh_checkpoint_sees_existing_index(
        spark, tmpdir_path):
    """A RESET checkpoint (new dir, epoch ids restart at 0) over an
    existing index seeds a new base from the index's max registered
    seq, so early epochs still treat prior history as prior."""
    from debezium_connector_db2_spark.operators.dedup_incremental import (
        StreamingDeduper)

    crawl = os.path.join(tmpdir_path, "crawl")
    _docs(spark, BATCH1).coalesce(1).write.mode("append").parquet(crawl)
    idx = os.path.join(tmpdir_path, "idx")
    sd = StreamingDeduper(spark, crawl, idx,
                          os.path.join(tmpdir_path, "kept"),
                          os.path.join(tmpdir_path, "ckpt"))
    sd._apply(_docs(spark, BATCH1), epoch_id=0)

    sd2 = StreamingDeduper(spark, crawl, idx,
                           os.path.join(tmpdir_path, "kept2"),
                           os.path.join(tmpdir_path, "ckpt2"))
    assert sd2._base_seq >= 1
    sd2._apply(_docs(spark, [(40, "the quick brown fox"),
                             (41, "fresh doc")]), epoch_id=0)
    kept = sorted(r["doc_id"] for r in spark.read.parquet(
        os.path.join(tmpdir_path, "kept2")).collect())
    assert kept == [41]


def test_open_existing_index_propagates_read_errors(spark, tmpdir_path):
    """A transient manifest read failure on an EXISTING index must
    propagate, never silently re-create the table (which would discard
    the fingerprint history)."""
    path = os.path.join(tmpdir_path, "ie")
    IncrementalDeduper(spark, path, n_buckets=2).process_batch(
        _docs(spark, BATCH1), "doc_id", "text", 1)
    # corrupt the current manifest: open must now raise, not re-create
    from debezium_connector_db2_spark.lake import LakeTable
    t = LakeTable(spark, path)
    v = t.current_version()
    mpath = os.path.join(t.path, "_manifests", f"v{v}.json")
    with open(mpath, "w") as f:
        f.write("{torn")
    with pytest.raises(Exception):
        IncrementalDeduper(spark, path, n_buckets=2)
    # version pointer untouched — no destructive reset to v0
    assert t.current_version() == v
