"""Deterministic sampling/splitting (operators/sampling.py): membership
is a pure function of (seed, id) — stable across corpus growth and
repartitioning, the property Spark's per-partition-seeded
sample/randomSplit lacks."""

import pytest
from pyspark.sql import functions as F

from debezium_connector_db2_spark.operators.sampling import (
    hash_split,
    stratified_sample,
)

WEIGHTS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]


def test_hash_split_covers_all_rows_with_expected_shares(spark):
    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id", WEIGHTS, seed=7)
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 20_000
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["val"] / 20_000 - 0.1) < 0.02
    assert abs(counts["test"] / 20_000 - 0.1) < 0.02


def test_hash_split_stable_under_growth_and_repartition(spark):
    """A row's split must not change when the corpus grows or the
    physical partitioning changes — otherwise yesterday's test rows
    leak into tomorrow's train set."""
    small = spark.range(1_000).withColumnRenamed("id", "doc_id")
    big = spark.range(50_000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split
         for r in hash_split(small, "doc_id", WEIGHTS, seed=7).collect()}
    b = {r.doc_id: r.split
         for r in hash_split(big.repartition(17), "doc_id", WEIGHTS,
                             seed=7).collect()}
    assert all(b[k] == v for k, v in a.items())
    # a different seed is a genuinely different assignment
    c = {r.doc_id: r.split
         for r in hash_split(small, "doc_id", WEIGHTS, seed=8).collect()}
    assert any(c[k] != v for k, v in a.items())


def test_hash_split_validation(spark):
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="at least one"):
        hash_split(df, "doc_id", [])
    with pytest.raises(ValueError, match="sum to > 0"):
        hash_split(df, "doc_id", [("a", 0.0)])


def test_stratified_sample_rates_and_determinism(spark):
    df = (spark.range(30_000).withColumnRenamed("id", "doc_id")
          .withColumn("stratum",
                      F.when(F.col("doc_id") % 100 == 0, "rare")
                      .otherwise("common")))
    kept = stratified_sample(df, "doc_id", "stratum",
                             {"rare": 1.0, "common": 0.1}, seed=3)
    counts = {r.stratum: r.n for r in
              kept.groupBy("stratum").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert counts["rare"] == 300                      # rate 1.0: all kept
    assert abs(counts["common"] / 29_700 - 0.1) < 0.02
    # identical membership on a rerun with different partitioning
    again = stratified_sample(df.repartition(13), "doc_id", "stratum",
                              {"rare": 1.0, "common": 0.1}, seed=3)
    assert (sorted(r.doc_id for r in kept.collect())
            == sorted(r.doc_id for r in again.collect()))


def test_stratified_sample_default_rate_and_validation(spark):
    df = (spark.range(1_000).withColumnRenamed("id", "doc_id")
          .withColumn("stratum", F.lit("unlisted")))
    assert stratified_sample(df, "doc_id", "stratum", {"x": 0.5}).count() == 0
    n = stratified_sample(df, "doc_id", "stratum", {"x": 0.5},
                          default_rate=1.0).count()
    assert n == 1_000
    with pytest.raises(ValueError, match=r"in \[0,1\]"):
        stratified_sample(df, "doc_id", "stratum", {"x": 1.5})
    with pytest.raises(ValueError, match="default_rate"):
        stratified_sample(df, "doc_id", "stratum", {}, default_rate=-0.1)
