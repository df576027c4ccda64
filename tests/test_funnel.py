"""Corpus filter funnel (quality → LM → dedup, per-stage verdicts)."""

import pytest
from pyspark.sql import functions as F

from debezium_connector_db2_spark.operators.funnel import (
    corpus_funnel, corpus_funnel_sql, funnel_report,
)

LONG = ("the quick brown fox jumps over the lazy dog and then "
        "runs back home to sleep for the rest of the day because "
        "it is tired of jumping over dogs all day long every day "
        "of the week and wants a quiet afternoon instead of work "
        "so it curls up near the fire and dreams of open fields")

DOCS = [
    (1, LONG),                       # passes everything -> kept
    (2, LONG),                       # exact dup of 1 -> dup
    (3, "too short"),                # fails quality (min_words)
    (4, LONG + " zq wx kj vb nm qp zz xx cc vv bb nn mm aa ss dd "
        "ff gg hh jj kk ll qq ww ee rr tt yy uu ii oo pp za xs cd "
        "vf bg nh mj uk il op"),     # rare-token tail -> worst LM score
]
GQ = dict(min_words=20, min_required_hits=1)


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _verdicts(spark, max_avg_nll):
    return {r["doc_id"]: r["verdict"] for r in corpus_funnel(
        _docs(spark), "doc_id", "text", max_avg_nll=max_avg_nll,
        gopher_kwargs=GQ).collect()}


def test_stage_order_and_verdicts(spark):
    # threshold chosen between doc1/2's score and doc4's
    from debezium_connector_db2_spark.operators.lm_score import lm_score
    from debezium_connector_db2_spark.operators.quality import gopher_quality

    surv = gopher_quality(_docs(spark), "doc_id", "text",
                          keep_cols=["text"], **GQ).where("passes")
    nll = {r["doc_id"]: r["avg_nll"] for r in lm_score(
        surv, "doc_id", "text").collect()}
    th = (max(nll[1], nll[2]) + nll[4]) / 2
    v = _verdicts(spark, th)
    assert v == {1: "kept", 2: "dup", 3: "quality", 4: "lm"}


def test_every_doc_gets_exactly_one_verdict(spark):
    v = corpus_funnel(_docs(spark), "doc_id", "text", max_avg_nll=100.0,
                      gopher_kwargs=GQ)
    assert v.count() == len(DOCS)
    assert v.select("doc_id").distinct().count() == len(DOCS)


def test_report_folds_counts(spark):
    v = corpus_funnel(_docs(spark), "doc_id", "text", max_avg_nll=100.0,
                      gopher_kwargs=GQ)
    rep = {r["verdict"]: r["n_docs"] for r in funnel_report(v).collect()}
    assert rep["quality"] == 1 and rep["dup"] == 1 and rep["kept"] == 2


def test_dup_of_rejected_doc_is_not_dup(spark):
    # doc 20 duplicates doc 10's text, but doc 10 fails the LM gate in
    # neither;  instead make 10 fail quality (short) while 20 is long …
    # a dup of a REJECTED doc must be judged on its own merits.
    docs = spark.createDataFrame(
        [(10, "too short"), (20, "too short"), (30, LONG), (40, LONG)],
        "doc_id long, text string")
    v = {r["doc_id"]: r["verdict"] for r in corpus_funnel(
        docs, "doc_id", "text", max_avg_nll=100.0,
        gopher_kwargs=GQ).collect()}
    assert v == {10: "quality", 20: "quality", 30: "kept", 40: "dup"}


def test_duckdb_twin_matches(spark, tmpdir_path):
    import duckdb

    docs = _docs(spark)
    docs.coalesce(1).write.parquet(f"{tmpdir_path}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmpdir_path}/documents.parquet/*.parquet')")
    sql = corpus_funnel_sql("documents", "doc_id", "text",
                            max_avg_nll=3.9, gopher_sql_kwargs=GQ)
    want = sorted(con.execute(sql).fetchall())
    got = sorted(tuple(r) for r in corpus_funnel(
        docs, "doc_id", "text", max_avg_nll=3.9,
        gopher_kwargs=GQ).collect())
    assert got == want


LONG_B = LONG.replace("lazy dog", "sleepy dog").replace("open fields",
                                                        "wide fields")


def test_near_dup_stage(spark):
    """Opt-in fourth stage: minhash near-dups among survivors cluster;
    the non-keeper (larger id) gets 'near_dup', the keeper stays
    'kept'; exact dups still resolve BEFORE the near-dup stage."""
    docs = spark.createDataFrame(
        [(1, LONG), (2, LONG), (3, "too short"), (5, LONG_B),
         (7, "a completely different prose paragraph about sailing "
             "ships crossing the wide ocean under heavy grey skies "
             "while the crew watches the horizon for land and birds "
             "and the captain charts a course through the long night "
             "by the light of familiar constellations overhead")],
        "doc_id long, text string")
    nd = dict(k_shingle=2, n_hashes=16, bands=8, threshold=0.5)
    v = {r["doc_id"]: r["verdict"] for r in corpus_funnel(
        docs, "doc_id", "text", max_avg_nll=100.0,
        gopher_kwargs=GQ, near_dup_kwargs=nd).collect()}
    assert v == {1: "kept", 2: "dup", 3: "quality",
                 5: "near_dup", 7: "kept"}
    # without the opt-in, doc 5 stays kept (stage is strictly opt-in)
    v0 = {r["doc_id"]: r["verdict"] for r in corpus_funnel(
        docs, "doc_id", "text", max_avg_nll=100.0,
        gopher_kwargs=GQ).collect()}
    assert v0[5] == "kept"


def test_near_dup_report_includes_stage(spark):
    docs = spark.createDataFrame(
        [(1, LONG), (5, LONG_B)], "doc_id long, text string")
    nd = dict(k_shingle=2, n_hashes=16, bands=8, threshold=0.5)
    rep = {r["verdict"]: r["n_docs"] for r in funnel_report(corpus_funnel(
        docs, "doc_id", "text", max_avg_nll=100.0,
        gopher_kwargs=GQ, near_dup_kwargs=nd)).collect()}
    assert rep == {"kept": 1, "near_dup": 1}
