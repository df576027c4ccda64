"""Ordered transaction BEGIN/END markers interleaved in the event feed
(``TransactionMetadataIT.java:64-119``: BEGIN, data events, END with event
count, per commit_lsn = transaction id)."""

import datetime
import os

from debezium_connector_db2_spark.lake import LakeTable
from debezium_connector_db2_spark.schemas import BINLOG_SCHEMA, TRANSCRIPT_SCHEMA
from debezium_connector_db2_spark.sources.binlog import BinlogSource
from debezium_connector_db2_spark.streaming.engine import CdcEngine

TS = datetime.datetime(2026, 1, 1)


def _row(lsn, seq, op, conv, turn, text):
    return (lsn, seq, op, "transcripts", 0, conv, turn, "user", text, None, TS)


def test_export_events_with_transaction_markers(spark, tmpdir_path):
    rows = [
        _row(1, 0, "I", "a", 0, "x"),
        _row(1, 1, "D", "b", 0, "y"),
        _row(2, 0, "I", "c", 0, "z"),
    ]
    src = BinlogSource(spark, os.path.join(tmpdir_path, "bl"), bucket_size=8)
    src.write(spark.createDataFrame(rows, BINLOG_SCHEMA))
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"),
                         TRANSCRIPT_SCHEMA, bucket_by="conv_id", n_buckets=2)
    eng = CdcEngine(spark, src, t, os.path.join(tmpdir_path, "ck"))

    feed = eng.export_events(1, 2, tombstones=True, transaction_markers=True)
    got = feed.orderBy("commit_lsn", "intent_seq").collect()

    by_tx = {}
    for r in got:
        by_tx.setdefault(r.commit_lsn, []).append(r)
    for lsn, rs in by_tx.items():
        assert rs[0].op == "begin" and rs[0].event_count is None
        assert rs[-1].op == "end" and rs[-1].event_count is not None
        assert all(r.op not in ("begin", "end") for r in rs[1:-1])

    # tx 1: insert + delete (+tombstone, excluded from the count)
    tx1 = by_tx[1]
    assert [r.op for r in tx1] == ["begin", "c", "d", "t", "end"]
    assert tx1[-1].event_count == 2
    # tx 2: single insert
    assert [r.op for r in by_tx[2]] == ["begin", "c", "end"]
    assert by_tx[2][-1].event_count == 1

    # without markers the feed is unchanged from before
    plain = eng.export_events(1, 2, tombstones=True)
    assert "event_count" not in plain.columns
    assert plain.count() == 4
