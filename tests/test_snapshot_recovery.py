"""``recovery`` / ``configuration_based`` / ``custom`` snapshot modes
(``Db2ConnectorConfig.java:60-110``; recovery flow exercised by
``Db2ConnectorIT.java:912-1085``): rebuild a lost schema history from the
lake without reloading data, then keep streaming schema-evolved batches.
"""

import datetime
import json
import os

import pytest
from pyspark.sql import types as T

from debezium_connector_db2_spark.lake import LakeTable
from debezium_connector_db2_spark.schemas import BINLOG_FIELDS, TRANSCRIPT_SCHEMA
from debezium_connector_db2_spark.sources.binlog import BinlogSource
from debezium_connector_db2_spark.streaming.engine import CdcEngine, SchemaChange

TS = datetime.datetime(2026, 1, 1)

EXT_SCHEMA = T.StructType(
    BINLOG_FIELDS + [T.StructField("sentiment", T.StringType(), True)]
)


def _row(lsn, seq, op, conv, turn, text, sentiment=None, sv=0):
    return (lsn, seq, op, "transcripts", sv, conv, turn, "user", text, None,
            TS, sentiment)


def _wipe_schema_history(table: LakeTable) -> None:
    """Simulate schema-history loss: blank the manifest's version list
    (the reference's lost history topic)."""
    m = table.manifest()
    m["schema_versions"] = []
    m["current_schema_version"] = 0
    mpath = os.path.join(table.path, "_manifests", f"v{m['version']}.json")
    with open(mpath, "w") as f:
        json.dump(m, f)


def test_recovery_rebuilds_history_and_streams_after(spark, tmpdir_path):
    # phase 1: a normal pipeline with one schema evolution applied
    rows = [
        _row(1, 0, "I", "a", 0, "t0"),
        _row(2, 0, "I", "b", 0, "b0"),
        _row(10, 0, "I", "c", 0, "c0", "pos", 1),     # post-add-column
    ]
    src = BinlogSource(spark, os.path.join(tmpdir_path, "binlog"),
                       bucket_size=8, schema=EXT_SCHEMA)
    target = LakeTable.create(spark, os.path.join(tmpdir_path, "t"),
                              TRANSCRIPT_SCHEMA, bucket_by="conv_id",
                              n_buckets=4)
    eng = CdcEngine(
        spark, src, target, os.path.join(tmpdir_path, "ckpt"),
        schema_changes=[SchemaChange(10, "add_column",
                                     {"name": "sentiment", "dtype": "string",
                                      "default": "n/a"})],
    )
    snap = spark.createDataFrame([], TRANSCRIPT_SCHEMA)
    eng.snapshot_load(snap, mode="no_data")  # offset pinned pre-stream
    src.write(spark.createDataFrame(rows, EXT_SCHEMA))
    eng.run_available()
    assert target.manifest()["current_schema_version"] == 1

    # phase 2: history lost
    _wipe_schema_history(target)
    assert target.schema_versions() == []

    # phase 3: recovery — no data reload, history rebuilt from footers
    eng2 = CdcEngine(spark, src, target, os.path.join(tmpdir_path, "ckpt"))
    off_before = eng2.checkpoint.read()
    off = eng2.snapshot_load(None, mode="recovery")
    assert off.commit_lsn == off_before.commit_lsn  # offset untouched
    cols = [f.name for f in target.schema().fields]
    assert "sentiment" in cols and "text" in cols
    assert target.manifest()["summary"]["operation"] == "schema-recovery"
    # pre-recovery rows are still all there and readable
    got = {(r.conv_id, r.turn_idx): r for r in target.read().collect()}
    assert set(got) == {("a", 0), ("b", 0), ("c", 0)}
    assert got[("c", 0)].sentiment == "pos"

    # phase 4: streaming continues, including a FURTHER schema evolution
    more = [
        _row(20, 0, "I", "d", 0, "d0", "neu", 1),
        _row(21, 0, "U", "a", 0, "t0-v2", "neg", 1),
    ]
    src.write(spark.createDataFrame(more, EXT_SCHEMA))
    eng2.run_available()
    got = {(r.conv_id, r.turn_idx): r for r in target.read().collect()}
    assert got[("d", 0)].text == "d0" and got[("d", 0)].sentiment == "neu"
    assert got[("a", 0)].text == "t0-v2" and got[("a", 0)].sentiment == "neg"

    # and a post-recovery DDL commits on the recovered base
    target.add_column("lang", "string", default="en")
    assert got[("a", 0)] is not None
    assert {"lang", "sentiment"} <= {f.name for f in target.schema().fields}
    assert target.read().where("lang = 'en'").count() == 4


def test_recovery_requires_completed_snapshot(spark, tmpdir_path):
    src = BinlogSource(spark, os.path.join(tmpdir_path, "bl"), bucket_size=8)
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"),
                         TRANSCRIPT_SCHEMA, bucket_by="conv_id", n_buckets=2)
    eng = CdcEngine(spark, src, t, os.path.join(tmpdir_path, "ck"))
    with pytest.raises(ValueError, match="recovery"):
        eng.snapshot_load(None, mode="recovery")


def test_configuration_based_and_custom_modes(spark, tmpdir_path):
    rows = [_row(1, 0, "I", "a", 0, "t0")]
    src = BinlogSource(spark, os.path.join(tmpdir_path, "bl"), bucket_size=8)
    src.write(spark.createDataFrame(rows, EXT_SCHEMA).drop("sentiment"))
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"),
                         TRANSCRIPT_SCHEMA, bucket_by="conv_id", n_buckets=2)
    eng = CdcEngine(spark, src, t, os.path.join(tmpdir_path, "ck"))
    snap = spark.createDataFrame([("s", 0, "user", "seed", None, TS)],
                                 TRANSCRIPT_SCHEMA)

    # schema-only: offset pinned, no rows loaded
    off = eng.snapshot_load(snap, mode="configuration_based",
                            config={"snapshot_schema": True})
    assert off.snapshot_completed and t.read().count() == 0

    # custom snapshotter decides concretely; 'custom' itself is rejected
    eng2 = CdcEngine(spark, src, t, os.path.join(tmpdir_path, "ck2"))
    off2 = eng2.snapshot_load(snap, mode="custom",
                              custom=lambda e, o: "initial")
    assert off2.snapshot_completed
    assert t.read().where("conv_id = 's'").count() == 1
    with pytest.raises(ValueError):
        eng2.snapshot_load(snap, mode="custom", custom=lambda e, o: "custom")
    # data flag wins over schema flag
    eng3 = CdcEngine(spark, src, t, os.path.join(tmpdir_path, "ck3"))
    eng3.snapshot_load(snap, mode="configuration_based",
                       config={"snapshot_data": True, "snapshot_schema": True})
    assert t.read().where("conv_id = 's'").count() == 1
