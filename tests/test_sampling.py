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


def test_sql_twins_escape_quoted_keys(spark, tmp_path):
    """ADVICE r6: stratum/split/domain names containing a single quote
    must render as valid SQL in the DuckDB twins and keep byte parity
    with the Spark side."""
    import duckdb

    from debezium_connector_db2_spark.operators.sampling import (
        hash_split_sql,
        mixture_sample,
        mixture_sample_sql,
        stratified_sample_sql,
    )

    rows = [(i, "o'brien" if i % 2 == 0 else "plain", 10 + i % 5)
            for i in range(400)]
    df = spark.createDataFrame(
        rows, "doc_id long, stratum string, n_tok long")
    p = str(tmp_path / "qdocs.parquet")
    df.write.parquet(p)
    rel = f"read_parquet('{p}/*.parquet')"
    con = duckdb.connect()

    # stratified: quoted key rate honored on both sides
    rates = {"o'brien": 1.0, "plain": 0.25}
    kept = sorted(r.doc_id for r in stratified_sample(
        spark.read.parquet(p), "doc_id", "stratum", rates, seed=5).collect())
    pred = stratified_sample_sql("doc_id", "stratum", rates, seed=5)
    want = sorted(r[0] for r in con.execute(
        f"SELECT doc_id FROM {rel} WHERE {pred}").fetchall())
    assert kept == want and len(kept) > 200

    # hash_split: quoted split names round-trip
    w = [("tr'ain", 0.7), ("te'st", 0.3)]
    got = {r.doc_id: r.split for r in hash_split(
        spark.read.parquet(p), "doc_id", w, seed=5).collect()}
    case = hash_split_sql("doc_id", w, seed=5)
    wantmap = dict(con.execute(
        f"SELECT doc_id, {case} FROM {rel}").fetchall())
    assert got == wantmap and set(got.values()) == {"tr'ain", "te'st"}

    # mixture: quoted domain in the VALUES rate table
    shares = {"o'brien": 0.5, "plain": 0.5}
    got_m = sorted(tuple(r) for r in mixture_sample(
        spark.read.parquet(p), "doc_id", "stratum", shares,
        "n_tok", seed=5).collect())
    sql = mixture_sample_sql(rel, "doc_id", "stratum", shares,
                             "n_tok", seed=5)
    want_m = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got_m == want_m
