"""Trained NB quality classifier over hashed n-gram features."""

import pytest
from pyspark.sql import functions as F

from debezium_connector_db2_spark.operators.classifier import (
    classifier_score, quality_classifier, quality_classifier_sql,
    train_quality_classifier,
)

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"

# two clearly separable vocabularies (class 1 "wiki-like", class 0 spam)
GOOD = ["the study measured results across samples",
        "analysis of the measured data supports the theory",
        "the results of the study were published",
        "samples were measured and the data analyzed"]
BAD = ["click here buy now free offer",
       "free free offer click buy cheap now",
       "buy cheap offer now click here free",
       "now cheap free buy offer click"]


def _labeled(spark):
    rows = ([(i, t, 1) for i, t in enumerate(GOOD)]
            + [(100 + i, t, 0) for i, t in enumerate(BAD)])
    return spark.createDataFrame(
        rows, "doc_id long, text string, label int")


def test_learns_separable_vocabularies(spark):
    docs = _labeled(spark)
    out = {r["doc_id"]: r for r in quality_classifier(
        docs, "doc_id", "text", "label").collect()}
    assert all(out[i]["pred"] == 1 for i in range(len(GOOD)))
    assert all(out[100 + i]["pred"] == 0 for i in range(len(BAD)))
    # llr sign tracks the prediction
    assert all((r["llr"] > 0) == (r["pred"] == 1) for r in out.values())


def test_external_model_scores_held_out_docs(spark):
    train = _labeled(spark)
    weights, scalars = train_quality_classifier(train, "text", "label")
    held = spark.createDataFrame(
        [(1000, "the measured results were analyzed"),
         (1001, "free cheap offer buy")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in classifier_score(
        held, "doc_id", "text", weights, scalars).collect()}
    assert out[1000]["pred"] == 1 and out[1001]["pred"] == 0


def test_oov_floor_applies_to_unseen_grams(spark):
    train = _labeled(spark)
    weights, scalars = train_quality_classifier(train, "text", "label")
    unseen = spark.createDataFrame(
        [(2000, "zzz yyy xxx totally unseen grams")],
        "doc_id long, text string")
    row = classifier_score(unseen, "doc_id", "text",
                           weights, scalars).collect()[0]
    # all features OOV: llr == (w_oov * n + bias) / (S * n) — finite,
    # and with balanced classes the OOV floor is ~0 (no signal)
    assert row["n_feats"] > 0 and abs(row["llr"]) < 1.0


def test_rejects_single_class_training(spark):
    docs = spark.createDataFrame(
        [(1, "a b", 1), (2, "c d", 1)],
        "doc_id long, text string, label int")
    with pytest.raises(ValueError, match="both classes"):
        train_quality_classifier(docs, "text", "label")
    with pytest.raises(ValueError, match="alpha"):
        train_quality_classifier(docs, "text", "label", alpha=0.0)


def test_rejects_non_binary_labels(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", 1), (2, "d e f", 2), (3, "g h i", 0)],
        "doc_id long, text string, label int")
    with pytest.raises(Exception, match="label must be 0 or 1"):
        quality_classifier(docs, "doc_id", "text", "label").collect()


def test_weight_table_is_bounded_by_n_buckets(spark):
    docs = _labeled(spark)
    weights, _ = train_quality_classifier(docs, "text", "label",
                                          n_buckets=16)
    rows = weights.collect()
    assert len(rows) <= 16
    assert all(0 <= r["bucket"] < 16 for r in rows)


def test_duckdb_twin_matches_on_sf_docs(spark):
    import duckdb

    docs = (spark.read.parquet(SF_DOCS)
            .withColumn("label", (F.col("lang") == "en").cast("int")))
    got = {r["doc_id"]: (r["n_feats"], r["llr"], r["pred"])
           for r in quality_classifier(
               docs, "doc_id", "text", "label").collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DOCS}'")
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        quality_classifier_sql(
            "documents", "doc_id", "text",
            "CASE WHEN lang = 'en' THEN 1 ELSE 0 END")).fetchall()}
    assert got == want
