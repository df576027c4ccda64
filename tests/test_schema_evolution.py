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


SCORE_SCHEMA = T.StructType(
    BINLOG_FIELDS + [T.StructField("score", T.LongType(), True)]
)


def _srow(lsn, seq, op, conv, turn, text, score, sv=0):
    return (lsn, seq, op, "transcripts", sv, conv, turn, "user", text, None,
            TS, score)


def test_alter_column_widening_and_default_mid_stream(spark, tmpdir_path):
    """ALTER COLUMN mid-stream (the reference's offline/online default
    evolution, AbstractDb2DefaultValueIT.java:253-258 + the
    Db2Offline/ZZZDb2OnlineDefaultValueIT variants, and Db2 ALTER ...
    SET DATA TYPE widening): the engine splits the batch at the switch
    LSN, widens int->bigint so post-switch values beyond int range
    apply, upgrades pre-switch files by cast on read, historizes the
    change, and a full replay across the switch converges (idempotent
    DDL)."""
    rows = [
        _srow(1, 0, "I", "a", 0, "t0", 1),
        _srow(2, 0, "I", "a", 1, "t1", 2),
        # ---- switch at 5: score widens int -> bigint ----
        _srow(6, 0, "U", "a", 0, "t0-v2", 1 << 40, sv=1),
        _srow(7, 0, "I", "b", 0, "b0", 1 << 41, sv=1),
        # ---- switch at 8: score's declared default changes 0 -> 7 ----
        _srow(9, 0, "I", "c", 0, "c0", None, sv=2),
    ]
    src = BinlogSource(spark, os.path.join(tmpdir_path, "binlog"),
                       bucket_size=8, schema=SCORE_SCHEMA)
    src.write(spark.createDataFrame(rows, SCORE_SCHEMA))
    target = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TRANSCRIPT_SCHEMA,
        bucket_by="conv_id", n_buckets=4,
    )
    target.add_column("score", "int", default=0)
    changes = [
        SchemaChange(5, "alter_column", {"name": "score", "dtype": "bigint"}),
        SchemaChange(8, "alter_column", {"name": "score", "default": 7}),
    ]
    eng = CdcEngine(spark, src, target, os.path.join(tmpdir_path, "ckpt"),
                    schema_changes=changes)
    eng.run_available()

    assert target.schema()["score"].dataType == T.LongType()
    got = {(r.conv_id, r.turn_idx): r.score for r in target.read().collect()}
    assert got == {("a", 0): 1 << 40, ("a", 1): 2, ("b", 0): 1 << 41,
                   ("c", 0): None}
    # declared default now 7; materialized rows were not rewritten
    assert target.column_default("score") == 7
    # both alters historized
    alters = [r for r in target.schema_history().collect()
              if r.altered is not None]
    assert len(alters) == 2

    # replay from scratch on the same target (fresh checkpoint):
    # idempotent DDL + idempotent batch MERGE -> identical final state
    eng2 = CdcEngine(spark, src, target, os.path.join(tmpdir_path, "ckpt2"),
                     schema_changes=changes)
    eng2.run_available()
    got2 = {(r.conv_id, r.turn_idx): r.score for r in target.read().collect()}
    assert got2 == got

    # narrowing is refused; re-widening to the current type is a no-op
    import pytest
    with pytest.raises(ValueError, match="not a widening"):
        target.alter_column("score", "int")
    v = target.current_version()
    target.alter_column("score", "bigint")
    assert target.current_version() == v


def test_alter_column_decimal_widening_rules(spark, tmpdir_path):
    """decimal(p,s) widens only when no integer digit or scale is lost;
    int->decimal needs >=10 integer digits (the lossless-cast rule)."""
    import pytest

    target = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TRANSCRIPT_SCHEMA,
        bucket_by="conv_id", n_buckets=2,
    )
    target.add_column("amount", "decimal(5,2)")
    target.alter_column("amount", "decimal(8,3)")      # +3 digits, +1 scale
    assert target.schema()["amount"].dataType == T.DecimalType(8, 3)
    with pytest.raises(ValueError, match="not a widening"):
        target.alter_column("amount", "decimal(8,4)")  # loses an int digit
    with pytest.raises(ValueError, match="not a widening"):
        target.alter_column("amount", "decimal(7,2)")  # loses scale
    target.add_column("n", "int")
    with pytest.raises(ValueError, match="not a widening"):
        target.alter_column("n", "decimal(9,0)")       # int needs 10 digits
    target.alter_column("n", "decimal(12,2)")
    assert target.schema()["n"].dataType == T.DecimalType(12, 2)
    with pytest.raises(ValueError, match="does not exist"):
        target.alter_column("ghost", "bigint")


def test_alter_column_default_replay_idempotent(spark, tmpdir_path):
    """A replayed default-change ALTER (crash before the checkpoint
    records the DDL, then DDL re-applied on restart) must be a no-op:
    no duplicate schema version, and a CURRENT DATE/TIMESTAMP register
    default stays pinned at its first-application clock value instead
    of drifting on every replay."""
    target = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TRANSCRIPT_SCHEMA,
        bucket_by="conv_id", n_buckets=2,
    )
    target.add_column("score", "int", default=0)

    target.alter_column("score", default="7")
    v = target.current_version()
    assert target.column_default("score") == 7
    # identical raw text replayed -> no new version
    target.alter_column("score", default="7")
    assert target.current_version() == v
    # identical parsed value via a different spelling -> still no-op
    target.alter_column("score", default=7)
    assert target.current_version() == v
    # a genuinely different default is a real version bump
    target.alter_column("score", default="9")
    assert target.current_version() == v + 1
    assert target.column_default("score") == 9

    # register default: pinned at first application
    target.add_column("opened", "date", default=None)
    target.alter_column("opened", default="CURRENT DATE")
    v2 = target.current_version()
    first = target.column_default("opened")
    assert first is not None
    target.alter_column("opened", default="CURRENT DATE")  # replay
    assert target.current_version() == v2
    assert target.column_default("opened") == first


DROP_TARGET_SCHEMA = T.StructType(
    list(TRANSCRIPT_SCHEMA.fields)
    + [T.StructField("sentiment", T.StringType(), True)]
)


def test_drop_column_at_switch_lsn(spark, tmpdir_path):
    """DROP COLUMN mid-stream (the one ALTER family round 5 lacked;
    reference anchor: full-structure schema-change records,
    Db2DatabaseSchema.java:51-71): the engine splits the batch at the
    switch LSN, the column leaves the schema, files materialized before
    the drop are projected on read (no rewrite), a full replay across
    the switch converges (idempotent DDL), and a re-add after the drop
    observes the new declared default — never resurrected old values."""
    rows = [
        _row(1, 0, "I", "c1", 0, "hello", "pos"),
        _row(2, 0, "I", "c2", 0, "w", "neg"),
        # ---- switch at 10: column `sentiment` dropped ----
        _row(10, 0, "U", "c1", 0, "hello-v2", "stale", 1),
        _row(11, 0, "I", "c3", 0, "z", None, 1),
    ]
    src = BinlogSource(spark, os.path.join(tmpdir_path, "binlog"),
                       bucket_size=8, schema=EXT_SCHEMA)
    src.write(spark.createDataFrame(rows, EXT_SCHEMA))
    target = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), DROP_TARGET_SCHEMA,
        bucket_by="conv_id", n_buckets=4,
    )
    changes = [SchemaChange(10, "drop_column", {"name": "sentiment"})]
    eng = CdcEngine(spark, src, target, os.path.join(tmpdir_path, "ckpt"),
                    schema_changes=changes)
    eng.run_available()

    cols = [f.name for f in target.schema().fields]
    assert "sentiment" not in cols
    got = {(r.conv_id, r.turn_idx): r.text for r in target.read().collect()}
    assert got == {("c1", 0): "hello-v2", ("c2", 0): "w", ("c3", 0): "z"}
    assert "sentiment" not in target.read().columns
    # historized: the drop is a recorded schema version
    drops = [r for r in target.schema_history().collect()
             if r.dropped is not None]
    assert len(drops) == 1 and '"sentiment"' in drops[0].dropped

    # replay from scratch (fresh checkpoint): idempotent DDL (drop of a
    # now-missing column is a no-op) + idempotent MERGE -> same state
    eng2 = CdcEngine(spark, src, target, os.path.join(tmpdir_path, "ckpt2"),
                     schema_changes=changes)
    eng2.run_available()
    got2 = {(r.conv_id, r.turn_idx): r.text for r in target.read().collect()}
    assert got2 == got
    assert "sentiment" not in [f.name for f in target.schema().fields]

    # re-add after drop: brand-new column, old physical values NOT
    # resurrected — every row observes the new declared default
    target.add_column("sentiment", "string", default="fresh")
    vals = {r.sentiment for r in target.read().collect()}
    assert vals == {"fresh"}


def test_drop_column_protects_keys_and_is_idempotent(spark, tmpdir_path):
    """The bucket key and MoR key_cols are refused (dropping the
    partitioning/resolution identity would orphan every row); dropping
    an absent column is a silent no-op (crash-replay contract)."""
    import pytest

    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TRANSCRIPT_SCHEMA,
        bucket_by="conv_id", n_buckets=2, versioned=True,
        merge_mode="mor", key_cols=["conv_id", "turn_idx"],
    )
    with pytest.raises(ValueError, match="bucket key|key_cols"):
        t.drop_column("conv_id")
    with pytest.raises(ValueError, match="bucket key|key_cols"):
        t.drop_column("turn_idx")
    v = t.current_version()
    t.drop_column("never_existed")          # no-op, no version bump
    assert t.current_version() == v
    t.drop_column("tool")
    assert t.current_version() == v + 1
    assert "tool" not in [f.name for f in t.schema().fields]
    t.drop_column("tool")                   # replayed DDL — no-op
    assert t.current_version() == v + 1


def test_connect_schema_history_export(spark, tmpdir_path):
    """Missing-item closure (r6 verdict #4): the lake's historized
    schema versions render as Kafka-Connect-style schema-change
    records (Debezium history-topic shape: source/position/
    tableChanges with a column struct per version), so a consumer of
    the reference's history topic has a migration-compatible export."""
    import os

    from debezium_connector_db2_spark.lake import LakeTable
    from debezium_connector_db2_spark.schemas import TRANSCRIPT_SCHEMA

    t = LakeTable.create(spark, os.path.join(tmpdir_path, "transcripts"),
                         TRANSCRIPT_SCHEMA, bucket_by="conv_id", n_buckets=2)
    t.add_column("priority", "int", default=3)
    t.rename_column("priority", "rank")

    recs = t.connect_schema_history(server="srv1", database="TESTDB",
                                    schema_name="DB2INST1")
    assert len(recs) == 3
    create, alter1, alter2 = recs
    assert create["tableChanges"][0]["type"] == "CREATE"
    assert create["position"] == {"schema_version": 0, "snapshot": True}
    assert all(r["tableChanges"][0]["type"] == "ALTER" for r in recs[1:])
    assert all(r["ddl"] is None for r in recs)           # no DDL parser,
    # exactly like the reference (Db2DatabaseSchema.getDdlParser -> null)
    assert all(r["source"] == {"server": "srv1"} for r in recs)
    tid = '"TESTDB"."DB2INST1"."transcripts"'
    assert all(r["tableChanges"][0]["id"] == tid for r in recs)

    def colnames(r):
        return [c["name"] for c in r["tableChanges"][0]["table"]["columns"]]

    base = [f.name for f in TRANSCRIPT_SCHEMA.fields]
    assert colnames(create) == base
    assert colnames(alter1) == base + ["priority"]
    assert colnames(alter2) == base + ["rank"]

    # column structs carry JDBC type codes and 1-based positions
    c0 = create["tableChanges"][0]["table"]["columns"][0]
    assert c0["position"] == 1 and isinstance(c0["jdbcType"], int)
    added = alter1["tableChanges"][0]["table"]["columns"][-1]
    assert added == {"name": "priority", "jdbcType": 4,
                     "typeName": "INTEGER", "typeExpression": "INTEGER",
                     "charsetName": None,
                     "position": len(base) + 1, "optional": True,
                     "autoIncremented": False, "generated": False}
    assert (create["tableChanges"][0]["table"]["primaryKeyColumnNames"]
            == ["conv_id"])
    # the whole record set is JSON-serializable (a topic export)
    import json
    json.dumps(recs)
