"""Chunking with overlap (operators/chunking.py): boundary math is
exact at the edge cases (short doc, exact fit, one-past), chunk text
round-trips, the plan is a zero-shuffle explode, and the DuckDB twin is
byte-identical including the sliced text."""

import duckdb
import pytest

from debezium_connector_db2_spark.operators.chunking import (
    chunk_plan,
    chunk_plan_sql,
)


def _docs(spark):
    rows = [
        (0, " ".join(f"t{i}" for i in range(5))),    # shorter than chunk
        (1, " ".join(f"t{i}" for i in range(8))),    # exact fit
        (2, " ".join(f"t{i}" for i in range(9))),    # one past: 2 chunks
        (3, " ".join(f"t{i}" for i in range(20))),   # several chunks
        (4, ""),                                     # empty: no rows
        (5, "   "),                                  # blank: no rows
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boundaries_exact(spark):
    out = chunk_plan(_docs(spark), "doc_id", chunk_tokens=8,
                     overlap_tokens=2)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.start_token, r.end_token))
    for v in by_doc.values():
        v.sort()
    assert by_doc[0] == [(0, 0, 5)]
    assert by_doc[1] == [(0, 0, 8)]
    assert by_doc[2] == [(0, 0, 8), (1, 6, 9)]
    # stride 6: starts 0, 6, 12; 18 would add tokens 20.. none past 20?
    # ceil((20-2)/6) = 3 chunks: [0,8) [6,14) [12,20)
    assert by_doc[3] == [(0, 0, 8), (1, 6, 14), (2, 12, 20)]
    assert 4 not in by_doc and 5 not in by_doc
    # every token of every doc is covered
    for doc_id, chunks in by_doc.items():
        n = {0: 5, 1: 8, 2: 9, 3: 20}[doc_id]
        covered = set()
        for _, s, e in chunks:
            covered |= set(range(s, e))
        assert covered == set(range(n)), doc_id


def test_chunk_text_roundtrip(spark):
    out = chunk_plan(_docs(spark), "doc_id", chunk_tokens=8,
                     overlap_tokens=2, with_text=True)
    for r in out.collect():
        toks = r.chunk_text.split(" ")
        assert toks[0] == f"t{r.start_token}"
        assert toks[-1] == f"t{r.end_token - 1}"
        assert len(toks) == r.end_token - r.start_token


def test_zero_shuffle_plan(spark):
    plan = chunk_plan(_docs(spark), "doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_validation(spark):
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_plan(_docs(spark), "doc_id", chunk_tokens=0)
    with pytest.raises(ValueError, match="overlap_tokens"):
        chunk_plan(_docs(spark), "doc_id", chunk_tokens=8,
                   overlap_tokens=8)


@pytest.mark.parametrize("with_text", [False, True])
def test_duckdb_twin_byte_identical(spark, tmp_path, with_text):
    df = _docs(spark)
    p = str(tmp_path / "docs.parquet")
    df.write.parquet(p)
    got = sorted(chunk_plan(spark.read.parquet(p), "doc_id",
                            chunk_tokens=8, overlap_tokens=2,
                            with_text=with_text).collect())
    con = duckdb.connect()
    sql = chunk_plan_sql(f"read_parquet('{p}/*.parquet')", "doc_id",
                         chunk_tokens=8, overlap_tokens=2,
                         with_text=with_text)
    want = sorted(con.execute(sql).fetchall())
    assert [tuple(g) for g in got] == want
