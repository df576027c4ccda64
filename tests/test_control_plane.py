"""Control plane (X1-X3, S7/S8), snapshot modes, event feed, tx metadata,
reselect, LSN codecs — the remaining SURVEY.md §2 surface."""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from debezium_connector_db2_spark.functions.lsn import (
    hex_to_lsn,
    lsn_increment,
    lsn_to_hex,
)
from debezium_connector_db2_spark.lake import LakeTable
from debezium_connector_db2_spark.operators.reselect import reselect_columns
from debezium_connector_db2_spark.schemas import BINLOG_SCHEMA, TRANSCRIPT_SCHEMA
from debezium_connector_db2_spark.sources.binlog import BinlogSource
from debezium_connector_db2_spark.sources.generator import generate_snapshot
from debezium_connector_db2_spark.sources.registry import CaptureRegistry
from debezium_connector_db2_spark.streaming.engine import CdcEngine

TS = datetime.datetime(2026, 1, 1)


def _row(lsn, seq, op, conv, turn, text, table="transcripts", sv=0):
    return (lsn, seq, op, table, sv, conv, turn, "user", text, None, TS)


def test_registry_lifecycle(tmpdir_path):
    reg = CaptureRegistry(os.path.join(tmpdir_path, "registry.json"))
    reg.register_table("transcripts", start_lsn=0)
    reg.register_table("other", start_lsn=5)
    assert reg.active_tables() == ["other", "transcripts"]
    with pytest.raises(ValueError):
        reg.register_table("transcripts")

    # schema switch: old instance stopped, new one opened (S8 sees it)
    new = reg.switch_capture_instance("transcripts", at_lsn=100)
    assert new["schema_version"] == 1
    assert reg.new_instances_in(50, 150) == [new]
    assert reg.new_instances_in(101, 150) == []
    st = reg.status()
    assert st == {"tables": 2, "active_instances": 2, "stopped_instances": 1}

    reg.deregister_table("other")
    assert reg.active_tables() == ["transcripts"]
    with pytest.raises(ValueError):
        reg.deregister_table("nope")


def test_registry_stop_lsn_filter_in_engine(spark, tmpdir_path):
    """F4 via registry: post-switch events from the OLD instance (same
    schema_version past its stop LSN) are dropped."""
    reg = CaptureRegistry(os.path.join(tmpdir_path, "registry.json"))
    reg.register_table("transcripts", start_lsn=0)
    reg.switch_capture_instance("transcripts", at_lsn=10)

    rows = [
        _row(1, 0, "I", "a", 0, "keep-old-instance", sv=0),
        _row(12, 0, "I", "a", 1, "stale-old-instance", sv=0),   # past stop: drop
        _row(12, 1, "I", "a", 2, "new-instance", sv=1),         # keep
    ]
    binlog = spark.createDataFrame(rows, BINLOG_SCHEMA)
    src = BinlogSource(spark, os.path.join(tmpdir_path, "bl"), bucket_size=8)
    src.write(binlog)
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), TRANSCRIPT_SCHEMA,
                         bucket_by="conv_id", n_buckets=2)
    eng = CdcEngine(spark, src, t, os.path.join(tmpdir_path, "ck"), registry=reg)
    eng.run_available()
    got = {r.turn_idx: r.text for r in t.read().collect()}
    assert got == {0: "keep-old-instance", 2: "new-instance"}


def test_snapshot_modes(spark, tmpdir_path):
    snap = generate_snapshot(spark, n_convs=10, turns_per_conv=4, seed=61)
    src = BinlogSource(spark, os.path.join(tmpdir_path, "bl"), bucket_size=8)

    # no_data: offset recorded, no rows loaded
    t1 = LakeTable.create(spark, os.path.join(tmpdir_path, "t1"), TRANSCRIPT_SCHEMA,
                          bucket_by="conv_id", n_buckets=2)
    e1 = CdcEngine(spark, src, t1, os.path.join(tmpdir_path, "c1"))
    off = e1.snapshot_load(snap, mode="no_data")
    assert off.snapshot_completed and t1.read().count() == 0

    # initial_only: loads, but streaming is disabled
    t2 = LakeTable.create(spark, os.path.join(tmpdir_path, "t2"), TRANSCRIPT_SCHEMA,
                          bucket_by="conv_id", n_buckets=2)
    e2 = CdcEngine(spark, src, t2, os.path.join(tmpdir_path, "c2"))
    e2.snapshot_load(snap, mode="initial_only")
    assert t2.read().count() == snap.count()
    assert e2.run_available() == []

    # always: re-snapshots on every start (new lake version each time)
    t3 = LakeTable.create(spark, os.path.join(tmpdir_path, "t3"), TRANSCRIPT_SCHEMA,
                          bucket_by="conv_id", n_buckets=2)
    e3 = CdcEngine(spark, src, t3, os.path.join(tmpdir_path, "c3"))
    e3.snapshot_load(snap, mode="always")
    v1 = t3.current_version()
    e3.checkpoint.write(e3.checkpoint.read())  # simulate restart
    e3.snapshot_load(snap, mode="always")
    assert t3.current_version() > v1

    with pytest.raises(ValueError):
        e3.snapshot_load(snap, mode="bogus")


def test_event_feed_tombstones_and_tx_metadata(spark, tmpdir_path):
    rows = [
        _row(1, 0, "I", "a", 0, "x"),
        _row(2, 0, "D", "a", 0, "x"),           # delete -> d + tombstone
        _row(3, 0, "D", "b", 0, "old"),          # pair
        _row(3, 1, "I", "b", 0, "new"),          # -> single 'u'
    ]
    src = BinlogSource(spark, os.path.join(tmpdir_path, "bl"), bucket_size=8)
    src.write(spark.createDataFrame(rows, BINLOG_SCHEMA))
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), TRANSCRIPT_SCHEMA,
                         bucket_by="conv_id", n_buckets=2)
    eng = CdcEngine(spark, src, t, os.path.join(tmpdir_path, "ck"))

    feed = eng.export_events(0, 10, tombstones=True).orderBy("commit_lsn", "intent_seq")
    ops = [r.op for r in feed.collect()]
    assert ops == ["c", "d", "t", "u"]
    tomb = feed.where("op = 't'").collect()[0]
    assert tomb.before is None and tomb.after is None

    assert [r.op for r in eng.export_events(0, 10, tombstones=False)
            .orderBy("commit_lsn", "intent_seq").collect()] == ["c", "d", "u"]

    tx = {(r.tx_id): (r.event_count, r.table_event_count)
          for r in eng.transaction_metadata(0, 10).collect()}
    assert tx == {1: (1, 1), 2: (1, 1), 3: (2, 2)}


def test_cloudevents_export(spark, tmpdir_path):
    import json

    rows = [_row(1, 0, "I", "a", 0, "x")]
    src = BinlogSource(spark, os.path.join(tmpdir_path, "bl"), bucket_size=8)
    src.write(spark.createDataFrame(rows, BINLOG_SCHEMA))
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), TRANSCRIPT_SCHEMA,
                         bucket_by="conv_id", n_buckets=2)
    eng = CdcEngine(spark, src, t, os.path.join(tmpdir_path, "ck"))
    out = eng.export_events_cloudevents(0, 10).collect()
    assert len(out) == 1
    ce = json.loads(out[0].cloudevent)
    assert ce["specversion"] == "1.0"
    assert ce["type"] == "io.debezium.db2spark.transcripts.ChangeEvent"
    data = json.loads(ce["data"])
    assert data["op"] == "c" and data["after"]["text"] == "x"


def test_reselect_columns(spark):
    batch = spark.createDataFrame(
        [("a", 0, None, "new-text"), ("b", 1, "keep", None)],
        "conv_id string, turn_idx int, tool string, text string")
    current = spark.createDataFrame(
        [("a", 0, "cur-tool", "cur-text"), ("b", 1, "cur-tool2", "cur-text2")],
        "conv_id string, turn_idx int, tool string, text string")
    out = {(r.conv_id, r.turn_idx): (r.tool, r.text)
           for r in reselect_columns(batch, current, ["conv_id", "turn_idx"],
                                     ["tool", "text"]).collect()}
    assert out == {("a", 0): ("cur-tool", "new-text"),
                   ("b", 1): ("keep", "cur-text2")}


def test_timestamp_of_lsn(spark, tmpdir_path):
    rows = [_row(1, 0, "I", "a", 0, "x"), _row(2, 0, "I", "a", 1, "y")]
    src = BinlogSource(spark, os.path.join(tmpdir_path, "bl"), bucket_size=8)
    src.write(spark.createDataFrame(rows, BINLOG_SCHEMA))
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), TRANSCRIPT_SCHEMA,
                         bucket_by="conv_id", n_buckets=2)
    eng = CdcEngine(spark, src, t, os.path.join(tmpdir_path, "ck"))
    assert eng.timestamp_of_lsn(1) == TS
    assert eng.timestamp_of_lsn(1) == TS  # cached path
    assert eng.timestamp_of_lsn(99) is None


def test_lsn_codecs(spark):
    df = spark.createDataFrame([(255,), (16,), (0,)], "lsn: long")
    out = df.select(
        lsn_to_hex(F.col("lsn")).alias("h"),
        hex_to_lsn(lsn_to_hex(F.col("lsn"))).alias("back"),
        lsn_increment(F.col("lsn")).alias("next"),
    ).collect()
    assert [(r.h, r.back, r.next) for r in out] == [
        ("00000000000000ff", 255, 256),
        ("0000000000000010", 16, 17),
        ("0000000000000000", 0, 1),
    ]
    # hex rendering preserves order (the Lsn.java lexicographic contract)
    hexes = [r.h for r in out]
    assert sorted(hexes) == [h for _, h in sorted((r.back, r.h) for r in out)]


def test_empty_capture_set_warning(tmpdir_path, caplog):
    """A non-matching include list runs but captures nothing; the only
    signal is Debezium core's exact warning text
    (Db2ConnectorIT.java:718-735 testEmptySchemaWarningAfterApplyingFilters,
    DatabaseSchema.NO_CAPTURED_DATA_COLLECTIONS_WARNING) — mirrored here
    on the log and the notification channel."""
    import logging
    import os

    from debezium_connector_db2_spark.sources.registry import (
        NO_CAPTURED_TABLES_WARNING,
        CaptureRegistry,
        captured_tables,
    )
    from debezium_connector_db2_spark.streaming.notifications import (
        NotificationLog,
    )

    reg = CaptureRegistry(os.path.join(tmpdir_path, "reg"))
    reg.register_table("tablea")
    reg.register_table("tableb")
    notif = NotificationLog(os.path.join(tmpdir_path, "notif"))

    # matching filters: no warning
    with caplog.at_level(logging.WARNING):
        assert captured_tables(reg, include=["tablea"]) == ["tablea"]
        assert captured_tables(reg, exclude=["tablea"]) == ["tableb"]
    assert NO_CAPTURED_TABLES_WARNING not in caplog.text

    # non-matching include list: empty set + the exact core warning
    with caplog.at_level(logging.WARNING):
        assert captured_tables(reg, include=["my_products"],
                               notifications=notif) == []
    assert NO_CAPTURED_TABLES_WARNING in caplog.text
    kinds = [(n["aggregate_type"], n["type"]) for n in notif.read()]
    assert ("Capture Filters", "EMPTY_CAPTURE_SET") in kinds
