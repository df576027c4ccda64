"""Data mixing (operators/sampling.py:mixture_sample): the sampled
corpus' token mass approaches the target shares, no domain upsamples,
absent domains drop, the budget caps proportionally, the corpus side
never shuffles (broadcast rates), and the DuckDB twin is
byte-identical."""

import duckdb
import pytest
from pyspark.sql import functions as F

from debezium_connector_db2_spark.operators.sampling import (
    mixture_sample,
    mixture_sample_sql,
)


def _corpus(spark):
    """Skewed domains: en 6000 docs x ~10 tokens, de 1000, code 500."""
    rows = []
    for i in range(6000):
        rows.append((i, "en", 10 + i % 3))
    for i in range(1000):
        rows.append((10_000 + i, "de", 10 + i % 3))
    for i in range(500):
        rows.append((20_000 + i, "code", 10 + i % 3))
    return spark.createDataFrame(rows, "doc_id long, lang string, n_tok long")


TARGETS = {"en": 0.5, "de": 0.3, "code": 0.2}


def test_realized_mixture_approaches_targets(spark):
    out = mixture_sample(_corpus(spark), "doc_id", "lang", TARGETS,
                         "n_tok", seed=3)
    kept = (out.where("keep").groupBy("lang")
            .agg(F.sum("n_tokens").alias("t")).collect())
    mass = {r.lang: r.t for r in kept}
    total = sum(mass.values())
    # code is the binding domain (500*11 tokens / 0.2): it keeps ~all
    for d, w in TARGETS.items():
        assert abs(mass[d] / total - w) < 0.03, (d, mass[d] / total)
    # nothing upsampled: every keep_rate <= 1
    assert out.where("keep_rate > 1.0").count() == 0
    rates = {r.lang: r.keep_rate for r in
             out.select("lang", "keep_rate").distinct().collect()}
    assert rates["code"] > 0.99                 # binding domain keeps all


def test_absent_domain_drops_and_budget_caps(spark):
    df = _corpus(spark)
    out = mixture_sample(df, "doc_id", "lang", {"en": 1.0}, "n_tok",
                         seed=3)
    assert out.where("lang != 'en' and keep").count() == 0
    assert out.where("lang != 'en' and keep_rate != 0.0").count() == 0
    # budget half of the en total halves the en rate
    full = mixture_sample(df, "doc_id", "lang", {"en": 1.0}, "n_tok",
                          seed=3)
    en_total = sum(10 + i % 3 for i in range(6000))
    capped = mixture_sample(df, "doc_id", "lang", {"en": 1.0}, "n_tok",
                            token_budget=en_total / 2, seed=3)
    r_full = full.where("lang='en'").select("keep_rate").first().keep_rate
    r_cap = capped.where("lang='en'").select("keep_rate").first().keep_rate
    assert r_full == 1.0 and abs(r_cap - 0.5) < 1e-6


def test_membership_deterministic_across_partitioning(spark):
    df = _corpus(spark)
    a = {r.doc_id: r.keep for r in
         mixture_sample(df, "doc_id", "lang", TARGETS, "n_tok",
                        seed=9).collect()}
    b = {r.doc_id: r.keep for r in
         mixture_sample(df.repartition(23), "doc_id", "lang", TARGETS,
                        "n_tok", seed=9).collect()}
    assert a == b


def test_corpus_side_broadcast_not_shuffled(spark):
    plan = mixture_sample(_corpus(spark), "doc_id", "lang", TARGETS,
                          "n_tok")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_duckdb_twin_byte_identical(spark, tmp_path):
    df = _corpus(spark)
    p = str(tmp_path / "docs.parquet")
    df.write.parquet(p)
    got = sorted(mixture_sample(spark.read.parquet(p), "doc_id", "lang",
                                TARGETS, "n_tok", token_budget=30_000.0,
                                seed=5).collect())
    con = duckdb.connect()
    sql = mixture_sample_sql(f"read_parquet('{p}/*.parquet')", "doc_id",
                             "lang", TARGETS, "n_tok",
                             token_budget=30_000.0, seed=5)
    want = sorted(con.execute(sql).fetchall())
    assert [tuple(g) for g in got] == want


def test_validation(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError, match="at least one"):
        mixture_sample(df, "doc_id", "lang", {}, "n_tok")
    with pytest.raises(ValueError, match="sum to > 0"):
        mixture_sample(df, "doc_id", "lang", {"en": 0.0}, "n_tok")
