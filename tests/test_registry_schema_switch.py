"""Registry-driven online schema evolution (S8 → migrateTable): a new
capture instance registered with a schema_change payload is picked up by
the engine inside the streaming loop and its DDL applied at exactly the
switch LSN — no manual schema_changes config
(``Db2StreamingChangeEventSource.java:165-174, 350-412``)."""

import datetime
import os

from pyspark.sql import types as T

from debezium_connector_db2_spark.lake import LakeTable
from debezium_connector_db2_spark.schemas import BINLOG_FIELDS, TRANSCRIPT_SCHEMA
from debezium_connector_db2_spark.sources.binlog import BinlogSource
from debezium_connector_db2_spark.sources.registry import CaptureRegistry
from debezium_connector_db2_spark.streaming.engine import CdcEngine
from debezium_connector_db2_spark.streaming.signals import SignalChannel

TS = datetime.datetime(2026, 1, 1)

EXT_SCHEMA = T.StructType(
    BINLOG_FIELDS + [T.StructField("sentiment", T.StringType(), True)]
)


def _row(lsn, seq, op, conv, turn, text, sentiment=None, sv=0):
    return (lsn, seq, op, "transcripts", sv, conv, turn, "user", text, None, TS,
            sentiment)


def test_registry_switch_applies_ddl_at_lsn(spark, tmpdir_path):
    rows = [
        _row(1, 0, "I", "c1", 0, "hello"),
        _row(2, 0, "I", "c1", 1, "old-row"),
        # new capture instance from LSN 10 carries `sentiment`
        _row(10, 0, "I", "c2", 0, "new-row", "pos", 1),
        _row(11, 0, "U", "c1", 0, "hello-v2", "neg", 1),
    ]
    src = BinlogSource(spark, os.path.join(tmpdir_path, "bl"),
                       bucket_size=8, schema=EXT_SCHEMA)
    src.write(spark.createDataFrame(rows, EXT_SCHEMA))
    target = LakeTable.create(spark, os.path.join(tmpdir_path, "t"),
                              TRANSCRIPT_SCHEMA, bucket_by="conv_id",
                              n_buckets=4)
    reg = CaptureRegistry(os.path.join(tmpdir_path, "reg.json"))
    reg.register_table("transcripts")
    reg.switch_capture_instance(
        "transcripts", at_lsn=10,
        schema_change={"action": "add_column",
                       "args": {"name": "sentiment", "dtype": "string",
                                "default": "n/a"}})

    eng = CdcEngine(spark, src, target, os.path.join(tmpdir_path, "ck"),
                    registry=reg)
    eng.run_available()

    got = {(r.conv_id, r.turn_idx): r for r in target.read().collect()}
    assert got[("c1", 0)].text == "hello-v2"
    assert got[("c1", 0)].sentiment == "neg"
    assert got[("c1", 1)].sentiment == "n/a"    # backfilled default
    assert got[("c2", 0)].sentiment == "pos"
    assert target.manifest()["current_schema_version"] == 1
    # the DDL ran once, not per iteration
    fields = [f.name for f in target.schema().fields]
    assert fields.count("sentiment") == 1


def test_signal_snapshot_additional_conditions(spark, tmpdir_path):
    """Reference 'additional conditions': the signal restricts which rows
    the ad-hoc snapshot re-reads."""
    src = BinlogSource(spark, os.path.join(tmpdir_path, "bl"), bucket_size=8)
    src.write(spark.createDataFrame(
        [(1, 0, "I", "transcripts", 0, "z", 9, "user", "streamed", None, TS)],
        T.StructType(BINLOG_FIELDS)))
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"),
                         TRANSCRIPT_SCHEMA, bucket_by="conv_id",
                         n_buckets=2, versioned=True)
    source = spark.createDataFrame(
        [("a", 0, "user", "keep", None, TS),
         ("a", 5, "user", "drop", None, TS)], TRANSCRIPT_SCHEMA)
    signals = SignalChannel(os.path.join(tmpdir_path, "sig"))
    eng = CdcEngine(spark, src, t, os.path.join(tmpdir_path, "ck"),
                    signals=signals, snapshot_source=lambda: source)
    signals.send("execute-snapshot",
                 {"type": "incremental", "n_chunks": 2,
                  "additional_conditions": "turn_idx < 3"})
    eng.run_available()
    got = {(r.conv_id, r.turn_idx): r.text for r in t.read().collect()}
    assert got == {("a", 0): "keep", ("z", 9): "streamed"}
