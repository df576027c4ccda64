"""Verbatim-span dedup (Lee et al. 2021 exact-substring, windowed)."""

import pytest
from pyspark.sql import functions as F

from debezium_connector_db2_spark.operators.dedup_substring import (
    substring_pairs, substring_pairs_sql, window_hashes,
)

#: docs 1/2 share an 8-token run; 3 shares nothing long; 4 repeats 1's
#: run twice (two diagonals); 5 shares a 5-token run with 1 (below k).
DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta tail1 tail2"),
    (2, "head alpha beta gamma delta epsilon zeta eta theta other"),
    (3, "one two three four five six seven eight nine ten"),
    (4, "alpha beta gamma delta epsilon zeta eta theta mid "
        "alpha beta gamma delta epsilon zeta eta theta"),
    (5, "alpha beta gamma delta epsilon x y z q w"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_window_hashes_positions(spark):
    w = window_hashes(_docs(spark).where("doc_id = 1"),
                      "doc_id", "text", k=8).collect()
    assert len(w) == 3 and sorted(r["pos"] for r in w) == [0, 1, 2]


def test_pairs_and_spans(spark):
    out = {(r["id_a"], r["id_b"]): (r["max_span"], r["n_windows"])
           for r in substring_pairs(_docs(spark), "doc_id", "text",
                                    k=5).collect()}
    # 1-2: shared 8-token run -> span 8, 4 windows of 5
    assert out[(1, 2)][0] == 8
    # 1-4: 4 also contains the run twice; span still 8
    assert out[(1, 4)][0] == 8
    # 1-5: exactly 5 shared tokens
    assert out[(1, 5)] == (5, 1)
    # 3 pairs with nobody
    assert not any(3 in p for p in out)


def test_min_span_threshold(spark):
    out = {(r["id_a"], r["id_b"]) for r in substring_pairs(
        _docs(spark), "doc_id", "text", k=5, min_span=8).collect()}
    assert (1, 5) not in out and (1, 2) in out


def test_max_df_drops_boilerplate(spark):
    stats = {}
    out = substring_pairs(_docs(spark), "doc_id", "text", k=8,
                          max_df=2, drop_stats=stats).collect()
    # the 8-token run occurs in docs 1, 2, 4 -> df=3 windows dropped
    assert stats["dropped_window_hashes"] >= 1
    assert not any({r["id_a"], r["id_b"]} <= {1, 2, 4} for r in out)


def test_duckdb_twin_matches(spark, tmpdir_path):
    import duckdb

    docs = _docs(spark)
    docs.coalesce(1).write.parquet(f"{tmpdir_path}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmpdir_path}/documents.parquet/*.parquet')")
    want = sorted(con.execute(substring_pairs_sql(
        "documents", "doc_id", "text", k=5)).fetchall())
    got = sorted(tuple(r) for r in substring_pairs(
        docs, "doc_id", "text", k=5).collect())
    assert got == want


def test_scrub_removes_later_copy_keeps_earlier(spark):
    from debezium_connector_db2_spark.operators.dedup_substring import (
        substring_scrub)

    out = {r["doc_id"]: r for r in substring_scrub(
        _docs(spark), "doc_id", "text", k=8).collect()}
    # doc 1 (earliest) keeps everything
    assert out[1]["n_removed"] == 0
    assert out[1]["clean_text"] == DOCS[0][1]
    # doc 2 loses the 8-token run shared with doc 1, keeps its frame
    assert out[2]["n_removed"] == 8
    assert out[2]["clean_text"] == "head other"
    # doc 4 loses BOTH copies of the run (two diagonals vs doc 1)
    assert out[4]["n_removed"] == 16
    assert out[4]["clean_text"] == "mid"
    # doc 3 untouched; doc 5's overlap is below k
    assert out[3]["n_removed"] == 0 and out[5]["n_removed"] == 0


def test_scrub_merges_overlapping_spans(spark):
    from debezium_connector_db2_spark.operators.dedup_substring import (
        substring_scrub)

    # doc 20 shares overlapping runs with docs 10 and 11 (different
    # partners, overlapping intervals) — the union must be removed
    # once, not double-counted
    docs = spark.createDataFrame([
        (10, "a b c d e f g h i j"),
        (11, "c d e f g h i j k l"),
        (20, "a b c d e f g h i j k l m"),
    ], "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_scrub(
        docs, "doc_id", "text", k=8).collect()}
    assert out[20]["n_removed"] == 12
    assert out[20]["clean_text"] == "m"


def test_scrub_duckdb_twin_byte_identical(spark, tmpdir_path):
    import duckdb

    from debezium_connector_db2_spark.operators.dedup_substring import (
        substring_scrub, substring_scrub_sql)

    docs = _docs(spark)
    docs.coalesce(1).write.parquet(f"{tmpdir_path}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmpdir_path}/documents.parquet/*.parquet')")
    want = {r[0]: (r[1], r[2]) for r in con.execute(substring_scrub_sql(
        "documents", "doc_id", "text", k=5)).fetchall()}
    got = {r["doc_id"]: (r["n_removed"], r["clean_text"])
           for r in substring_scrub(docs, "doc_id", "text", k=5).collect()}
    assert got == want


def test_scrub_fully_scrubbed_doc_is_empty_string(spark, tmpdir_path):
    import duckdb

    from debezium_connector_db2_spark.operators.dedup_substring import (
        substring_scrub, substring_scrub_sql)

    # doc 31 is doc 30 verbatim: every token is removed; clean_text
    # must be '' (not NULL) on BOTH engines
    docs = spark.createDataFrame([
        (30, "p q r s t u v w"),
        (31, "p q r s t u v w"),
    ], "doc_id long, text string")
    row = {r["doc_id"]: r for r in substring_scrub(
        docs, "doc_id", "text", k=8).collect()}
    assert row[31]["n_removed"] == 8 and row[31]["clean_text"] == ""
    docs.coalesce(1).write.parquet(f"{tmpdir_path}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmpdir_path}/documents.parquet/*.parquet')")
    d = {r[0]: r for r in con.execute(substring_scrub_sql(
        "documents", "doc_id", "text", k=8)).fetchall()}
    assert d[31][1] == 8 and d[31][2] == ""
