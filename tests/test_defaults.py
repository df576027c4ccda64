"""C8 default-value parsing (``Db2DefaultValueConverter.java:96-229``):
registers, quoting, char padding, boolean 0/1, HALF_EVEN decimal rescale —
and the backfill semantics through the lake's ADD COLUMN."""

import datetime
import os

from debezium_connector_db2_spark.functions.defaults import parse_default_value
from debezium_connector_db2_spark.lake import LakeTable
from debezium_connector_db2_spark.schemas import BINLOG_SCHEMA, TRANSCRIPT_SCHEMA
from debezium_connector_db2_spark.sources.binlog import BinlogSource
from debezium_connector_db2_spark.streaming.engine import CdcEngine, SchemaChange

NOW = datetime.datetime(2022, 1, 1, 12, 30, 45, 123456)
TS = datetime.datetime(2026, 1, 1)


def test_registers():
    assert parse_default_value("date", "CURRENT DATE", now=NOW) == "2022-01-01"
    assert parse_default_value("timestamp", "CURRENT TIMESTAMP", now=NOW) \
        == "2022-01-01 12:30:45.123456"
    # TIME as millis-of-day int32 (AbstractDb2DefaultValueIT.java:184-187)
    assert parse_default_value("int", "CURRENT TIME", now=NOW) \
        == (12 * 3600 + 30 * 60 + 45) * 1000
    assert parse_default_value("string", "CURRENT TIME", now=NOW) == "12:30:45"
    assert parse_default_value("date", "CURRENT_DATE", now=NOW) == "2022-01-01"


def test_quoting_and_padding():
    assert parse_default_value("string", "'hello'") == "hello"
    assert parse_default_value("string", "'it''s'") == "it's"
    assert parse_default_value("string", "plain") == "plain"
    assert parse_default_value("char(8)", "'abc'") == "abc     "


def test_numeric_and_boolean():
    assert parse_default_value("boolean", "1") is True
    assert parse_default_value("boolean", "0") is False
    assert parse_default_value("int", "42") == 42
    assert parse_default_value("double", "1.5") == 1.5
    # HALF_EVEN rescale (Db2DefaultValueConverter.java:186-199)
    assert parse_default_value("decimal(10,2)", "1.005") == "1.00"
    assert parse_default_value("decimal(10,2)", "1.015") == "1.02"
    assert parse_default_value("decimal(10,2)", "3") == "3.00"


def test_timestamp_db2_catalog_format():
    # Db2 renders timestamp defaults as 2022-01-01-00.00.00
    assert parse_default_value("timestamp", "2022-01-01-10.20.30") \
        == "2022-01-01 10:20:30"


def test_register_default_backfills_through_engine(spark, tmpdir_path):
    """Schema-evolution with a register default: rows untouched after the
    switch observe a concrete (DDL-time) date, not NULL."""
    rows = [
        (1, 0, "I", "transcripts", 0, "c1", 0, "user", "t0", None, TS),
        (2, 0, "I", "transcripts", 0, "c1", 1, "user", "untouched", None, TS),
        (10, 0, "U", "transcripts", 1, "c1", 0, "user", "t0-v2", None, TS),
    ]
    src = BinlogSource(spark, os.path.join(tmpdir_path, "bl"), bucket_size=8)
    src.write(spark.createDataFrame(rows, BINLOG_SCHEMA))
    target = LakeTable.create(spark, os.path.join(tmpdir_path, "t"),
                              TRANSCRIPT_SCHEMA, bucket_by="conv_id",
                              n_buckets=2)
    eng = CdcEngine(
        spark, src, target, os.path.join(tmpdir_path, "ck"),
        schema_changes=[SchemaChange(10, "add_column",
                                     {"name": "ingested_on", "dtype": "date",
                                      "default": "CURRENT DATE"})],
    )
    eng.run_available()
    stored = target.manifest()["schema_versions"][-1]["added"]["ingested_on"]
    assert stored == datetime.date.today().isoformat()  # register resolved at DDL time
    got = {(r.conv_id, r.turn_idx): r for r in target.read().collect()}
    # row untouched after the switch observes the materialized register
    assert got[("c1", 1)].ingested_on == datetime.date.today()
    # the post-switch update carried no value for the new column -> NULL
    assert got[("c1", 0)].text == "t0-v2"
