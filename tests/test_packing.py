"""Token-budget packing plan: offset math, boundary flags, determinism
across partitionings, and the shard-window plan shape."""

import pyspark.sql.functions as F
import pytest

from debezium_connector_db2_spark.operators.packing import pack_plan


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_offsets_are_a_running_sum_per_shard(spark):
    df = spark.createDataFrame(
        [(i, "w " * (i + 1)) for i in range(40)], "doc_id long, text string")
    plan = pack_plan(df, "doc_id", text_col="text", budget=10, n_shards=4,
                     seed=3)
    rows = plan.collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) > 1
    for shard_rows in by_shard.values():
        ordered = sorted(shard_rows, key=lambda r: r["start_offset"])
        acc = 0
        for r in ordered:
            assert r["start_offset"] == acc
            assert r["pack_id"] == acc // 10
            acc += r["n_tokens"]


def test_spans_boundary_flag(spark):
    # single shard so the stream is one sequence; token counts chosen to
    # straddle the budget=5 cut between offsets 4 and 6.
    df = spark.createDataFrame(
        [(1, 4), (2, 2), (3, 4)], "doc_id long, n long")
    plan = pack_plan(df, "doc_id", token_col="n", budget=5, n_shards=1,
                     seed=0)
    got = {r["doc_id"]: r for r in plan.collect()}
    offsets = sorted((r["start_offset"], r["doc_id"]) for r in got.values())
    # whichever doc covers tokens [4,5) spans the first boundary
    spanning = [d for (o, d) in offsets
                if o < 5 < o + got[d]["n_tokens"]]
    for d in got:
        assert got[d]["spans_boundary"] == (d in spanning)


def test_zero_token_docs_never_span(spark):
    df = spark.createDataFrame([(1, 0), (2, 5), (3, 0)],
                               "doc_id long, n long")
    plan = pack_plan(df, "doc_id", token_col="n", budget=5, n_shards=1)
    got = {r["doc_id"]: r["spans_boundary"] for r in plan.collect()}
    assert got[1] is False and got[3] is False


def test_deterministic_across_partitionings(spark):
    df = spark.createDataFrame(
        [(i, f"tok {'x ' * (i % 7)}") for i in range(200)],
        "doc_id long, text string")
    a = pack_plan(df.repartition(1), "doc_id", text_col="text",
                  budget=16, n_shards=8, seed=7)
    b = pack_plan(df.repartition(17, "text"), "doc_id", text_col="text",
                  budget=16, n_shards=8, seed=7)
    assert _rows(a) == _rows(b)


def test_arg_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_plan(df, "doc_id", text_col="text", token_col="text")
    with pytest.raises(ValueError):
        pack_plan(df, "doc_id")
    with pytest.raises(ValueError):
        pack_plan(df, "doc_id", text_col="text", budget=0)
    with pytest.raises(ValueError):
        pack_plan(df, "doc_id", text_col="text", n_shards=0)


def test_single_exchange_on_shard(spark):
    """100-TB contract: one hash partition by shard feeds the running
    sum; no global sort / single-partition window in the plan."""
    df = spark.createDataFrame(
        [(i, "x y z") for i in range(50)], "doc_id long, text string")
    plan = pack_plan(df, "doc_id", text_col="text", budget=8, n_shards=16)
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert s.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in s
