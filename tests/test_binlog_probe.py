"""LSN-gap fast-forward probe: correctness across gaps and the job-count
bound (one pruned scan over widening bucket windows, not a job per
bucket — ``Db2StreamingChangeEventSource`` idles through empty intervals;
we skip them)."""

import datetime
import os

from debezium_connector_db2_spark.lake import LakeTable
from debezium_connector_db2_spark.schemas import BINLOG_SCHEMA, TRANSCRIPT_SCHEMA
from debezium_connector_db2_spark.sources.binlog import BinlogSource
from debezium_connector_db2_spark.streaming.engine import CdcEngine

TS = datetime.datetime(2026, 1, 1)


def _row(lsn, seq, op, conv, turn, text):
    return (lsn, seq, op, "transcripts", 0, conv, turn, "user", text, None, TS)


def test_min_lsn_after_gap_and_job_bound(spark, tmpdir_path):
    # buckets (size 10): 0 [lsn 5], 50 [lsn 500..501], 90 [lsn 900]
    rows = [_row(5, 0, "I", "a", 0, "x"),
            _row(500, 0, "I", "a", 1, "y"),
            _row(501, 0, "I", "a", 2, "y2"),
            _row(900, 0, "I", "a", 3, "z")]
    src = BinlogSource(spark, os.path.join(tmpdir_path, "bl"), bucket_size=10)
    src.write(spark.createDataFrame(rows, BINLOG_SCHEMA))

    assert src.min_lsn_after(5) == 500
    # bucket 0 probe (empty above lsn 5) + widened-window hit: 2 scans,
    # never a scan per bucket (each scan is 1 Spark query; AQE may run it
    # as more than one job, so the pin is on queries launched)
    assert src.last_probe_scans <= 2, f"{src.last_probe_scans} probe scans"

    assert src.min_lsn_after(500) == 501
    assert src.last_probe_scans == 1
    assert src.min_lsn_after(501) == 900
    assert src.min_lsn_after(900) is None
    assert src.min_lsn_after(0) == 5


def test_bounded_batches_fast_forward_over_gap(spark, tmpdir_path):
    """The engine's bounded micro-batches must not crawl a 10^3-LSN hole
    one batch-width at a time."""
    rows = [_row(1, 0, "I", "a", 0, "v1"),
            _row(5000, 0, "U", "a", 0, "v2")]
    src = BinlogSource(spark, os.path.join(tmpdir_path, "bl"), bucket_size=16)
    src.write(spark.createDataFrame(rows, BINLOG_SCHEMA))
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"),
                         TRANSCRIPT_SCHEMA, bucket_by="conv_id", n_buckets=2)
    eng = CdcEngine(spark, src, t, os.path.join(tmpdir_path, "ck"),
                    max_lsns_per_batch=10)
    batches = eng.run_available()
    assert len(batches) <= 4, f"crawled the gap: {len(batches)} batches"
    assert {r.text for r in t.read().collect()} == {"v2"}


def test_binlog_prune_drops_consumed_buckets_and_replay_survives(spark, tmpdir_path):
    """BinlogSource.prune(before_lsn): buckets wholly below the consumed
    frontier are physically removed (the reference's capture prune
    cycle); the partial bucket at the frontier stays; an engine resuming
    from its checkpoint replays the retained tail to the exact oracle
    state."""
    rows = [_row(i, 0, "I" if i % 10 else "U", "a", i % 5, f"t{i}")
            for i in range(1, 41)]
    src = BinlogSource(spark, os.path.join(tmpdir_path, "bl"), bucket_size=10)
    src.write(spark.createDataFrame(rows, BINLOG_SCHEMA))
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"),
                         TRANSCRIPT_SCHEMA, bucket_by="conv_id", n_buckets=2)
    eng = CdcEngine(spark, src, t, os.path.join(tmpdir_path, "ck"),
                    max_lsns_per_batch=25)
    eng.run_available()
    want = [(r.conv_id, r.turn_idx, r.text) for r in
            t.read().orderBy("conv_id", "turn_idx").collect()]

    ck = eng.checkpoint.read().commit_lsn
    assert ck == 40
    # prune below LSN 25: buckets 0 ([0..9]) and 1 ([10..19]) go; bucket
    # 2 ([20..29]) holds the frontier's interior and stays
    removed = src.prune(25)
    assert removed == 2
    assert src.min_lsn() == 20
    assert src.max_lsn() == 40

    # single-consumer maintain() form prunes to the checkpoint
    stats = eng.maintain(prune_source=True)
    assert stats["pruned_binlog_buckets"] == 2   # buckets 2 and 3 (< 40)
    assert src.min_lsn() == 40

    # a restarted engine resumes cleanly over the pruned log (no new
    # events -> no-op) and the table state is untouched
    eng2 = CdcEngine(spark, src, t, os.path.join(tmpdir_path, "ck"),
                     max_lsns_per_batch=25)
    assert eng2.run_available() == []
    got = [(r.conv_id, r.turn_idx, r.text) for r in
           t.read().orderBy("conv_id", "turn_idx").collect()]
    assert got == want

    # new events past the pruned range still flow
    src.write(spark.createDataFrame([_row(41, 0, "U", "a", 0, "late")],
                                    BINLOG_SCHEMA))
    eng2.run_available()
    assert ("a", 0, "late") in [(r.conv_id, r.turn_idx, r.text)
                                for r in t.read().collect()]
