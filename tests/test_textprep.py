"""Training-data text-prep operators: PII scrubbing (typed redaction
tokens, Spark/DuckDB regex parity subset) and corpus vocabulary
building (top-k n-grams by document frequency, deterministic rank)."""

from pyspark.sql import functions as F

from debezium_connector_db2_spark.functions import text as TX
from debezium_connector_db2_spark.operators.vocab import ngram_vocab


def test_scrub_pii_shapes(spark):
    rows = [
        (0, "mail a.b+c@ex-ample.co.uk now"),
        (1, "ip 10.0.255.1 ok"),
        (2, "ssn 123-45-6789 x"),
        (3, "call 555-123-4567 or 555.123.4567"),
        (4, "clean text here"),
        (5, "v1.2.3 is a version, not an ip"),
    ]
    df = spark.createDataFrame(rows, "i: long, t: string")
    got = {r.i: (r.s, r.h) for r in df.select(
        "i", TX.scrub_pii(F.col("t")).alias("s"),
        TX.had_pii(F.col("t")).alias("h")).collect()}
    assert got[0] == ("mail <EMAIL> now", True)
    assert got[1] == ("ip <IP> ok", True)
    assert got[2] == ("ssn <SSN> x", True)
    assert got[3] == ("call <PHONE> or <PHONE>", True)
    assert got[4] == ("clean text here", False)
    assert got[5] == ("v1.2.3 is a version, not an ip", False)


def test_ngram_vocab_rank_and_floor(spark):
    rows = [
        (0, "spark spark shuffle join"),     # within-doc repeat counts once
        (1, "spark join merge"),
        (2, "spark merge"),
        (3, "solo"),
    ]
    df = spark.createDataFrame(rows, "i: long, t: string")
    got = [(r.gram, r.df, r.rank)
           for r in ngram_vocab(df, "t", k=1, top_k=3, min_df=2)
           .orderBy("rank").collect()]
    # df is DOCUMENT frequency: 'spark' appears twice in doc 0 but df=3
    assert got == [("spark", 3, 1), ("join", 2, 2), ("merge", 2, 3)]
    # top_k cuts deterministically; min_df dropped the hapaxes
    full = {r.gram for r in ngram_vocab(df, "t", k=1, top_k=10, min_df=1)
            .collect()}
    assert "solo" in full and "shuffle" in full

    plan = (ngram_vocab(df, "t", k=1, top_k=3, min_df=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan     # no global sort of grams


def test_intra_doc_repetition(spark):
    rows = [
        (0, "a b a b a b"),                      # 2-grams: 5 total, 2 distinct
        (1, "one. two. one. three. "),           # 4 sentences, 3 distinct
        (2, "all distinct words here"),
        (3, "x"),                                # shorter than k -> 0.0
    ]
    df = spark.createDataFrame(rows, "i: long, t: string")
    got = {r.i: (r.g, r.l) for r in df.select(
        "i", TX.dup_ngram_fraction(F.col("t"), 2).alias("g"),
        TX.dup_line_fraction(F.col("t")).alias("l")).collect()}
    assert got[0] == (0.6, 0.0)
    assert got[1] == (0.0, 0.25)
    assert got[2] == (0.0, 0.0)
    assert got[3] == (0.0, 0.0)
