"""FeedPublisher: per-batch envelope segments published from the engine
loop — LSN-ordered, idempotent on batch replay (the Kafka-topic sink
analogue)."""

import datetime
import os

from debezium_connector_db2_spark.lake import LakeTable
from debezium_connector_db2_spark.schemas import BINLOG_SCHEMA, TRANSCRIPT_SCHEMA
from debezium_connector_db2_spark.sources.binlog import BinlogSource
from debezium_connector_db2_spark.streaming.engine import CdcEngine
from debezium_connector_db2_spark.streaming.feed import FeedPublisher

TS = datetime.datetime(2026, 1, 1)


def _row(lsn, seq, op, conv, turn, text):
    return (lsn, seq, op, "transcripts", 0, conv, turn, "user", text, None, TS)


def test_feed_segments_match_full_export_and_are_idempotent(spark, tmpdir_path):
    rows = [
        _row(1, 0, "I", "a", 0, "x"),
        _row(2, 0, "U", "a", 0, "x2"),
        _row(3, 0, "D", "a", 0, "x2"),
        _row(4, 0, "I", "b", 0, "y"),
    ]
    src = BinlogSource(spark, os.path.join(tmpdir_path, "bl"), bucket_size=2)
    src.write(spark.createDataFrame(rows, BINLOG_SCHEMA))
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"),
                         TRANSCRIPT_SCHEMA, bucket_by="conv_id", n_buckets=2)
    eng = CdcEngine(spark, src, t, os.path.join(tmpdir_path, "ck"),
                    max_lsns_per_batch=2)   # force multiple micro-batches
    pub = FeedPublisher(eng, os.path.join(tmpdir_path, "feed"),
                        transaction_block=True)
    batches = eng.run_available(on_batch=pub.publish)
    assert len(batches) >= 2 and len(pub.segments()) >= 2

    # the concatenated feed equals one whole-range export, in LSN order
    got = pub.read().collect()
    want = (eng.export_envelope(1, 4, transaction_block=True)
            .orderBy("commit_lsn", "intent_seq").collect())
    assert [(r.commit_lsn, r.intent_seq,
             r.envelope.op if r.envelope else None) for r in got] == \
           [(r.commit_lsn, r.intent_seq,
             r.envelope.op if r.envelope else None) for r in want]
    ops = [r.envelope.op if r.envelope else "t0" for r in got]
    assert ops == ["c", "u", "d", "t0", "c"]   # tombstone after the delete

    # replaying a batch (crash-window restart) publishes nothing new
    n_before = len(pub.segments())
    for m in batches:
        assert pub.publish(m) is None
    assert len(pub.segments()) == n_before


def test_feed_publisher_skips_empty_batches(spark, tmpdir_path):
    src = BinlogSource(spark, os.path.join(tmpdir_path, "bl"), bucket_size=2)
    src.write(spark.createDataFrame([_row(1, 0, "I", "a", 0, "x")],
                                    BINLOG_SCHEMA))
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"),
                         TRANSCRIPT_SCHEMA, bucket_by="conv_id", n_buckets=2)
    eng = CdcEngine(spark, src, t, os.path.join(tmpdir_path, "ck"))
    pub = FeedPublisher(eng, os.path.join(tmpdir_path, "feed"))

    class M:  # an empty-batch metric
        epoch, from_lsn, to_lsn, events = 9, 5, 7, 0

    assert pub.publish(M) is None
    eng.run_available(on_batch=pub.publish)
    assert len(pub.segments()) == 1


def test_feed_heartbeat_topic_for_empty_batches(spark, tmpdir_path):
    """heartbeats=True publishes empty batches as records on the sibling
    heartbeat topic, so liveness monitors see idle ticks via the feed."""
    rows = [_row(1, 0, "I", "a", 0, "x"), _row(50, 0, "I", "b", 0, "y")]
    src = BinlogSource(spark, os.path.join(tmpdir_path, "bl"), bucket_size=4)
    src.write(spark.createDataFrame(rows, BINLOG_SCHEMA))
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"),
                         TRANSCRIPT_SCHEMA, bucket_by="conv_id", n_buckets=2)
    eng = CdcEngine(spark, src, t, os.path.join(tmpdir_path, "ck"),
                    max_lsns_per_batch=10)   # LSN gap -> an empty batch
    pub = FeedPublisher(eng, os.path.join(tmpdir_path, "feed"),
                        heartbeats=True)
    batches = eng.run_available(on_batch=pub.publish)
    assert any(m.events == 0 for m in batches)
    hb = pub.read_heartbeats().collect()
    assert len(hb) >= 1 and all(r.op == "h" for r in hb)
    # data rows still land only on the data feed
    assert pub.read().count() == 2
    # replaying the empty batch publishes nothing new (idempotent)
    n = len(hb)
    for m in batches:
        pub.publish(m)
    assert len(pub.read_heartbeats().collect()) == n
