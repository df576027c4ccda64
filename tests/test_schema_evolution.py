"""M4 schema evolution — mirrors the reference's online/offline schema
change tests (``AbstractDb2DefaultValueIT.java``, ``ZZZDb2OnlineDefault
ValueIT.java``): a new capture instance starts at a switch LSN with an
added / renamed column; the engine applies the DDL at exactly that LSN
(splitting the batch), backfills defaults for untouched rows, and keeps
old-instance rows readable.
"""

import datetime
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_connector_db2_spark.lake import LakeTable
from debezium_connector_db2_spark.schemas import BINLOG_FIELDS, TRANSCRIPT_SCHEMA
from debezium_connector_db2_spark.sources.binlog import BinlogSource
from debezium_connector_db2_spark.streaming.engine import CdcEngine, SchemaChange

TS = datetime.datetime(2026, 1, 1)


def _row(lsn, seq, op, conv, turn, text, sentiment=None, sv=0):
    return (lsn, seq, op, "transcripts", sv, conv, turn, "user", text, None, TS, sentiment)


EXT_SCHEMA = T.StructType(
    BINLOG_FIELDS + [T.StructField("sentiment", T.StringType(), True)]
)


def test_add_column_at_switch_lsn(spark, tmpdir_path):
    rows = [
        _row(1, 0, "I", "c1", 0, "hello"),            # old schema
        _row(2, 0, "I", "c1", 1, "old-row"),          # never touched again
        _row(3, 0, "U", "c1", 0, "hello-v2"),         # old schema update
        # ---- switch at LSN 10: column `sentiment` added ----
        _row(10, 0, "I", "c2", 0, "new-row", "pos", 1),
        _row(11, 0, "U", "c1", 0, "hello-v3", "neg", 1),
    ]
    binlog = spark.createDataFrame(rows, EXT_SCHEMA)
    src = BinlogSource(spark, os.path.join(tmpdir_path, "binlog"),
                       bucket_size=8, schema=EXT_SCHEMA)
    src.write(binlog)

    target = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TRANSCRIPT_SCHEMA,
        bucket_by="conv_id", n_buckets=4,
    )
    eng = CdcEngine(
        spark, src, target, os.path.join(tmpdir_path, "ckpt"),
        schema_changes=[SchemaChange(10, "add_column",
                                     {"name": "sentiment", "dtype": "string",
                                      "default": "n/a"})],
    )
    eng.run_available()

    got = {(r.conv_id, r.turn_idx): r for r in target.read().collect()}
    assert set(got) == {("c1", 0), ("c1", 1), ("c2", 0)}
    # row updated after the switch carries the streamed value
    assert got[("c1", 0)].text == "hello-v3" and got[("c1", 0)].sentiment == "neg"
    # row untouched after the switch observes the declared default
    assert got[("c1", 1)].sentiment == "n/a"
    assert got[("c2", 0)].sentiment == "pos"
    # target schema really evolved
    assert "sentiment" in [f.name for f in target.schema().fields]
    # schema history is ordered and recorded in the manifest
    assert target.manifest()["current_schema_version"] == 1


def test_rename_column_with_old_instance_rows(spark, tmpdir_path):
    rows = [
        _row(1, 0, "I", "a", 0, "t0"),
        _row(2, 0, "I", "a", 1, "t1"),
        # switch at 5: tool -> tool_name; later rows still arrive from the
        # old capture instance layout (column `tool` in the file)
        _row(6, 0, "U", "a", 0, "t0-v2"),
        _row(7, 0, "I", "b", 0, "b0"),
    ]
    binlog = spark.createDataFrame(rows, EXT_SCHEMA).drop("sentiment")
    src = BinlogSource(spark, os.path.join(tmpdir_path, "binlog"), bucket_size=8)
    src.write(binlog)
    target = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TRANSCRIPT_SCHEMA,
        bucket_by="conv_id", n_buckets=4,
    )
    eng = CdcEngine(
        spark, src, target, os.path.join(tmpdir_path, "ckpt"),
        schema_changes=[SchemaChange(5, "rename_column",
                                     {"old": "tool", "new": "tool_name"})],
    )
    eng.run_available()
    cols = [f.name for f in target.schema().fields]
    assert "tool_name" in cols and "tool" not in cols
    got = {(r.conv_id, r.turn_idx): r.text for r in target.read().collect()}
    assert got == {("a", 0): "t0-v2", ("a", 1): "t1", ("b", 0): "b0"}


def test_old_snapshot_files_readable_after_evolution(spark, tmpdir_path):
    """Files written pre-evolution upgrade on read (historized schema)."""
    target = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TRANSCRIPT_SCHEMA,
        bucket_by="conv_id", n_buckets=2,
    )
    df = spark.createDataFrame(
        [("x", 0, "user", "abc", None, TS)], TRANSCRIPT_SCHEMA
    )
    target.overwrite(df)
    target.add_column("score", "double", default=1.5)
    out = target.read().collect()
    assert out[0].score == 1.5
    target.rename_column("role", "speaker")
    out = target.read().collect()
    assert out[0].speaker == "user"
    # S12: schema history queryable in version order
    hist = target.schema_history().orderBy("version").collect()
    assert [h.version for h in hist] == [0, 1, 2]
    assert '"score"' in hist[1].added
    assert '"role": "speaker"' in hist[2].renamed
    assert "speaker" in hist[2].columns and "role" not in hist[2].columns
