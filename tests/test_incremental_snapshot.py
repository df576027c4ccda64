"""T8: chunked incremental snapshot interleaved with streaming — mirrors
``IncrementalSnapshotIT.java`` (chunked backfill, stream-wins dedup,
resume after interruption skips completed chunks).
"""

import os

from debezium_connector_db2_spark.lake import LakeTable
from debezium_connector_db2_spark.schemas import PK_COLS, TRANSCRIPT_SCHEMA
from debezium_connector_db2_spark.sources.binlog import BinlogSource
from debezium_connector_db2_spark.sources.generator import (
    generate_binlog,
    generate_snapshot,
    oracle_final_state,
)
from debezium_connector_db2_spark.streaming.engine import CdcEngine
from debezium_connector_db2_spark.streaming.stream import StreamingCdc

from tests.conftest import assert_df_equal


def test_chunked_backfill_interleaved_with_stream(spark, tmpdir_path):
    source_now = generate_snapshot(spark, n_convs=60, turns_per_conv=8, seed=31)
    post = generate_binlog(spark, n_ops=600, n_convs=60, turns_per_conv=8,
                           seed=32, lsn_offset=100)
    src = BinlogSource(spark, os.path.join(tmpdir_path, "binlog"), bucket_size=32)
    src.write(post)

    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TRANSCRIPT_SCHEMA,
        bucket_by="conv_id", n_buckets=4, versioned=True,
    )
    eng = CdcEngine(spark, src, t, os.path.join(tmpdir_path, "ckpt"))

    # Interleave: half the chunks, then the whole stream, then the rest of
    # the chunks — streamed (newer-LSN) values must win over chunk rows.
    stream = StreamingCdc(spark, os.path.join(tmpdir_path, "binlog"), t,
                          os.path.join(tmpdir_path, "sckpt"))

    n1 = eng.incremental_snapshot(source_now, n_chunks=8, position=(0, 0))
    assert n1 == 8
    stream.run_available()
    n2 = eng.incremental_snapshot(source_now, n_chunks=8, position=(0, 0))
    assert n2 == 0  # all chunk batch-ids already committed -> pure no-op

    want = oracle_final_state(source_now, post)
    assert_df_equal(t.read(), want, PK_COLS)


def test_backfill_resume_skips_completed_chunks(spark, tmpdir_path):
    source_now = generate_snapshot(spark, n_convs=30, turns_per_conv=6, seed=33)
    src = BinlogSource(spark, os.path.join(tmpdir_path, "binlog"), bucket_size=32)
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t2"), TRANSCRIPT_SCHEMA,
        bucket_by="conv_id", n_buckets=4, versioned=True,
    )
    eng = CdcEngine(spark, src, t, os.path.join(tmpdir_path, "ckpt2"))

    # simulate an interrupted backfill: only chunks 0..3 of 8 committed
    class Stop(Exception):
        pass

    orig = t.merge_changes
    calls = {"n": 0}

    def failing(*a, **k):
        if calls["n"] >= 4:
            raise Stop()
        calls["n"] += 1
        return orig(*a, **k)

    t.merge_changes = failing
    try:
        eng.incremental_snapshot(source_now, n_chunks=8)
        raise AssertionError("expected Stop")
    except Stop:
        pass
    t.merge_changes = orig

    applied = eng.incremental_snapshot(source_now, n_chunks=8)
    assert applied == 4  # only the 4 missing chunks ran
    assert_df_equal(t.read(), source_now, PK_COLS)


def test_incremental_snapshot_honors_override_map(spark, tmpdir_path):
    """The S2 snapshot override map applies to chunked backfills too —
    the reference consults its overrides on every snapshot SELECT."""
    source = generate_snapshot(spark, n_convs=40, turns_per_conv=4, seed=7)
    src = BinlogSource(spark, os.path.join(tmpdir_path, "binlog"),
                       bucket_size=8)
    src.write(generate_binlog(spark, n_ops=1, n_convs=40, turns_per_conv=4,
                              seed=8, lsn_offset=100))
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TRANSCRIPT_SCHEMA,
        bucket_by="conv_id", n_buckets=4, versioned=True,
    )
    eng = CdcEngine(spark, src, t, os.path.join(tmpdir_path, "ckpt"),
                    snapshot_overrides={"transcripts": "turn_idx < 2"})
    eng.incremental_snapshot(source, n_chunks=4, position=(0, 0))
    got = t.read()
    assert got.where("turn_idx >= 2").count() == 0
    assert got.count() == source.where("turn_idx < 2").count()
