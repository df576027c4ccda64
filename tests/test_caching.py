"""Result-scoped cache pins (functions/caching.py).

The pin lifecycle matters because library operators persist intermediates
per call (one per micro-batch in the CDC loop): a leaked pin accumulates
executor storage blocks until eviction thrash; a pin that releases too
early silently reverts multi-consumer plans to full recompute.
"""
import gc

from pyspark.sql import functions as F

from debezium_connector_db2_spark.functions.caching import (
    carry_pin,
    pin_for_result,
    pinned,
)


def _storage_level_is_cached(df):
    return df.storageLevel.useMemory or df.storageLevel.useDisk


def test_pin_for_result_releases_on_gc(spark):
    dep = spark.range(100).withColumn("x", F.col("id") * 2)
    result = pin_for_result(dep.groupBy((F.col("id") % 10).alias("g")).count(), dep)
    assert result.count() == 10
    assert _storage_level_is_cached(dep)
    del result
    gc.collect()
    assert not _storage_level_is_cached(dep)


def test_carry_pin_transfers_lifetime(spark):
    """The documented pattern: op(df).where(...) moves the pin onto the
    derived frame; deps stay cached until the *derived* frame drops.
    Regression: weakref.finalize.detach() returns (obj, func, args,
    kwargs) — a 3-way unpack raised ValueError on first use and leaked
    the persisted deps."""
    dep = spark.range(100).withColumn("x", F.col("id") * 3)
    result = pin_for_result(dep.select("id", "x"), dep)
    derived = carry_pin(result.where(F.col("id") > 10), result)
    del result
    gc.collect()
    # pin now rides on `derived`: deps must still be cached
    assert _storage_level_is_cached(dep)
    assert derived.count() == 89
    del derived
    gc.collect()
    assert not _storage_level_is_cached(dep)


def test_carry_pin_noop_without_pin(spark):
    src = spark.range(10)
    out = carry_pin(src.where("id > 5"), src)
    assert out.count() == 4


def test_pinned_scope(spark):
    dep = spark.range(50)
    with pinned(dep):
        assert _storage_level_is_cached(dep)
        assert dep.count() == 50
    assert not _storage_level_is_cached(dep)
