"""Sessionization: batch window form vs streaming applyInPandasWithState
form must assign identical sessions, with state carried across
micro-batch boundaries."""

import datetime
import os

from pyspark.sql import functions as F

from debezium_connector_db2_spark.operators.sessionize import (
    sessionize,
    sessionize_stream,
)

BASE = datetime.datetime(2026, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        [(k, BASE + datetime.timedelta(seconds=s)) for k, s in rows],
        "key: string, ts: timestamp")


def test_batch_sessionize_gap_splits(spark):
    rows = [("a", 0), ("a", 10), ("a", 2000), ("a", 2010),
            ("b", 5), ("b", 4000)]
    out = sessionize(_events(spark, rows), "key", "ts", gap_seconds=1800)
    got = {(r.key, r.ts.second + r.ts.minute * 60 + r.ts.hour * 3600):
           r.session_idx for r in out.collect()}
    assert got == {("a", 0): 0, ("a", 10): 0, ("a", 2000): 1, ("a", 2010): 1,
                   ("b", 5): 0, ("b", 4000): 1}


def test_streaming_sessionize_state_across_batches(spark, tmpdir_path):
    """A session spanning a micro-batch boundary must NOT split: batch 1
    ends mid-session, batch 2 continues it 10 s later."""
    b1 = [("a", 0), ("a", 10), ("b", 0)]
    b2 = [("a", 20), ("a", 3000), ("b", 5000)]
    src_dir = os.path.join(tmpdir_path, "ev")
    _events(spark, b1).coalesce(1).write.mode("append").parquet(src_dir)
    _events(spark, b2).coalesce(1).write.mode("append").parquet(src_dir)

    stream = (spark.readStream.schema("key string, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    out = sessionize_stream(stream, "key", "ts", gap_seconds=1800)
    q = (out.writeStream.format("memory").queryName("sess")
         .option("checkpointLocation", os.path.join(tmpdir_path, "ck"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    got = {(r.key, int(r.ts.timestamp() - BASE.timestamp())): r.session_idx
           for r in spark.sql("SELECT * FROM sess").collect()}
    # NOTE: files may arrive in either order within availableNow; our
    # binlog feeds are LSN-ordered, so order b1 before b2 holds here
    # because maxFilesPerTrigger processes files in discovery order.
    want_batch = sessionize(
        _events(spark, b1 + b2), "key", "ts", gap_seconds=1800)
    want = {(r.key, int(r.ts.timestamp() - BASE.timestamp())): r.session_idx
            for r in want_batch.collect()}
    assert got == want
    # the boundary-spanning session stayed whole
    assert got[("a", 20)] == got[("a", 0)] == 0
    assert got[("a", 3000)] == 1


def test_sessionize_query_shape(spark):
    """The batch form is pure window algebra (no Python stages)."""
    out = sessionize(_events(spark, [("a", 0)]), "key", "ts", 60)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "FlatMapGroupsInPandas" not in plan
