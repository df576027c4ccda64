"""Gopher quality gate (operators/quality.py): rule measurements are
exact on hand-built documents, the verdict matches a row-by-row Python
re-derivation, the plan is a zero-shuffle projection, and the DuckDB
twin is byte-identical on adversarial text."""

import duckdb
import pytest
from pyspark.sql import functions as F

from debezium_connector_db2_spark.operators.quality import (
    gopher_quality,
    gopher_quality_sql,
)

GOOD = ("the quick brown fox jumps over the lazy dog and then some more "
        "words that have to be written with care to pass every rule " * 2)

DOCS = [
    (0, GOOD),                                   # passes everything
    (1, "too short to pass"),                    # fails min_words
    (2, "### " * 60),                            # symbol ratio + alpha ratio
    (3, "\n".join("- bullet item" for _ in range(10))),   # bullet lines
    (4, "\n".join("trailing off..." for _ in range(10))), # ellipsis lines
    (5, " ".join("x" * 30 for _ in range(60))),  # mean word len too high
    (6, ""),                                     # empty
    (7, " ".join(str(i) for i in range(80))),    # digits: alpha + required
]


def _expected(text: str, min_words=10, min_required_hits=2):
    words = text.split()
    n = len(words)
    if n == 0:
        return False
    mean_wl = sum(len(w) for w in words) / n
    import re
    symbols = len(re.findall(r"#|\.\.\.", text.strip()))
    lines = text.split("\n")
    bullet = sum(1 for x in lines if re.match(r"^\s*[-*]", x)) / len(lines)
    ellipsis = sum(1 for x in lines if re.search(r"\.\.\.\s*$", x)) / len(lines)
    alpha = sum(1 for w in words if re.search("[A-Za-z]", w)) / n
    req = sum(1 for w in ["the", "be", "to", "of", "and", "that",
                          "have", "with"]
              if re.search(rf"\b{w}\b", text.lower()))
    return (min_words <= n <= 100_000 and 3.0 <= mean_wl <= 10.0
            and symbols / n <= 0.1 and bullet <= 0.9 and ellipsis <= 0.3
            and alpha >= 0.8 and req >= min_required_hits)


def test_verdicts_match_row_by_row_rederivation(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r.passes
           for r in gopher_quality(df, "doc_id", min_words=10).collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == _expected(text), (doc_id, text[:40])
    # sanity on the fixture: both verdicts are represented
    assert got[0] is True and got[1] is False


def test_measurements_exact(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {r.doc_id: r for r in gopher_quality(df, "doc_id").collect()}
    assert rows[3].bullet_ratio == 1.0
    assert rows[4].ellipsis_ratio == 1.0
    assert rows[6].n_words == 0 and rows[6].passes is False
    assert rows[7].alpha_word_ratio == 0.0
    assert rows[0].required_hits >= 2


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = gopher_quality(df, "doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_duckdb_twin_byte_identical(spark, tmp_path):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    p = str(tmp_path / "docs.parquet")
    df.write.parquet(p)
    got = sorted(
        gopher_quality(spark.read.parquet(p), "doc_id",
                       min_words=10).collect())
    con = duckdb.connect()
    sql = gopher_quality_sql(f"read_parquet('{p}/*.parquet')", "doc_id",
                             min_words=10)
    want = sorted(con.execute(sql).fetchall())
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert tuple(g) == pytest.approx(tuple(w)), (g, w)


def test_custom_required_words_escaped_and_empty_ok(spark, tmp_path):
    """ADVICE r6: custom required_words with regex metacharacters or
    quotes must match literally (both sides), and an empty list must
    yield required_hits = 0 instead of crashing."""
    docs = [(0, "price is 5.99 today and isn't that nice"),
            (1, "price is 5x99 today")]   # must NOT match literal "5.99"
    df = spark.createDataFrame(docs, "doc_id long, text string")

    words = ["5.99", "isn't"]
    got = {r.doc_id: r.required_hits for r in gopher_quality(
        df, "doc_id", required_words=words).collect()}
    assert got == {0: 2, 1: 0}

    empty = gopher_quality(df, "doc_id", required_words=[]).collect()
    assert all(r.required_hits == 0 for r in empty)

    # DuckDB twin stays valid SQL and byte-identical
    p = str(tmp_path / "specdocs.parquet")
    df.write.parquet(p)
    con = duckdb.connect()
    sql = gopher_quality_sql(f"read_parquet('{p}/*.parquet')", "doc_id",
                             required_words=words)
    want = {r[0]: r[7] for r in con.execute(sql).fetchall()}
    assert want == got
