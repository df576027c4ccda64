"""Plan-shape regression tests — the 100×-scale guarantees (SURVEY.md §4).

Correctness tests can't catch a filter that stops reaching the scan or a
broadcast that silently becomes a shuffle; these pin the physical plan.
"""

import os

from pyspark.sql import functions as F

from debezium_connector_db2_spark.plans.checks import (
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    has_pushed_filter,
    read_schema_columns,
)
from debezium_connector_db2_spark.sources.binlog import BinlogSource
from debezium_connector_db2_spark.sources.generator import generate_binlog
from debezium_connector_db2_spark.operators.dedup import latest_per_key

SF = "/root/testdata/sf0.001"


def test_lsn_range_filter_reaches_parquet_scan(spark, tmpdir_path):
    """S3 range scans must push commit_lsn bounds into the scan (the
    Spark analogue of the reference's (COMMITSEQ, INTENTSEQ) index) and
    prune lsn_bucket partitions."""
    binlog = generate_binlog(spark, n_ops=2000, n_convs=50, turns_per_conv=10, seed=9)
    src = BinlogSource(spark, os.path.join(tmpdir_path, "binlog"), bucket_size=16)
    src.write(binlog)
    df = src.read_range(40, 80)
    assert has_pushed_filter(df, "GreaterThanOrEqual(commit_lsn,40)"), formatted_plan(df)
    assert has_pushed_filter(df, "LessThanOrEqual(commit_lsn,80)")
    plan = formatted_plan(df)
    assert "lsn_bucket" in plan  # partition filters present


def test_column_pruning_on_projection(spark):
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    df = li.select("l_orderkey", "l_quantity").where(F.col("l_quantity") > 10)
    cols = read_schema_columns(df)
    assert set(cols) == {"l_orderkey", "l_quantity"}, cols


def test_registry_join_broadcasts(spark):
    nation = spark.read.parquet(os.path.join(SF, "nation.parquet"))
    region = spark.read.parquet(os.path.join(SF, "region.parquet"))
    df = nation.join(F.broadcast(region),
                     nation.n_regionkey == region.r_regionkey, "left")
    assert has_broadcast_join(df)


def test_dedup_agg_single_exchange(spark):
    """The A4 kernel must be one hash-aggregate shuffle (partial+final),
    not a window sort or multiple exchanges."""
    df = spark.range(1000).select(
        (F.col("id") % 50).alias("k"),
        F.col("id").alias("commit_lsn"),
        F.lit(0).alias("intent_seq"),
        F.col("id").cast("string").alias("v"),
    )
    latest = latest_per_key(df, ["k"], ("commit_lsn", "intent_seq"))
    assert count_exchanges(latest) == 1, formatted_plan(latest)
    plan = formatted_plan(latest)
    # max_by with a struct buffer compiles to SortAggregate (declarative
    # agg with immutable buffer type) — the load-bearing property is the
    # map-side partial_max_by before the single exchange: a hot key is
    # pre-reduced inside every input partition, so the rows crossing the
    # wire per key are bounded by the partition count.
    assert "partial_max_by" in plan, "expected map-side partial aggregation"
