"""Cross-batch NEAR-dup detection over a persisted MinHash-LSH index."""

import os

import pytest
from pyspark.sql import functions as F

from debezium_connector_db2_spark.operators.dedup_incremental import (
    IncrementalNearDeduper, incremental_near_sql,
)

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"

BASE = ("the quick brown fox jumps over the lazy dog near the old river "
        "bank while the sun sets slowly behind the tall green hills")
EDIT = ("the quick brown fox jumps over the lazy dog near the old river "
        "bank while the moon sets slowly behind the tall green hills")
OTHER = ("completely different content about distributed query engines "
         "processing change data capture streams with columnar storage "
         "formats and vectorized execution kernels at petabyte scale")


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_near_dup_caught_across_batches(spark, tmpdir_path):
    dd = IncrementalNearDeduper(spark, os.path.join(tmpdir_path, "idx"),
                                n_buckets=4)
    v1 = {r["doc_id"]: r for r in dd.process_batch(
        _df(spark, [(1, BASE), (2, OTHER)]), "doc_id", "text",
        batch_seq=1).collect()}
    assert not v1[1]["is_dup"] and not v1[2]["is_dup"]
    v2 = {r["doc_id"]: r for r in dd.process_batch(
        _df(spark, [(10, EDIT), (11, "unrelated fresh words entirely")]),
        "doc_id", "text", batch_seq=2).collect()}
    assert v2[10]["is_dup"] and v2[10]["dup_of"] == 1
    assert not v2[11]["is_dup"] and v2[11]["dup_of"] is None


def test_within_batch_near_dup_keeps_smallest_id(spark, tmpdir_path):
    dd = IncrementalNearDeduper(spark, os.path.join(tmpdir_path, "idx"),
                                n_buckets=4)
    v = {r["doc_id"]: r for r in dd.process_batch(
        _df(spark, [(5, BASE), (3, BASE), (9, EDIT)]), "doc_id", "text",
        batch_seq=1).collect()}
    assert not v[3]["is_dup"]            # smallest id is the keeper
    assert v[5]["is_dup"] and v[5]["dup_of"] == 3
    assert v[9]["is_dup"] and v[9]["dup_of"] == 3


def test_register_all_catches_dup_of_a_dropped_dup(spark, tmpdir_path):
    # batch 1: doc 2 is a near-dup of doc 1 (dropped).  batch 2 brings
    # an exact copy of doc 2's text: with register-all it must be
    # caught (matched against doc 1 or 2), not re-admitted.
    dd = IncrementalNearDeduper(spark, os.path.join(tmpdir_path, "idx"),
                                n_buckets=4)
    dd.process_batch(_df(spark, [(1, BASE), (2, EDIT)]), "doc_id",
                     "text", batch_seq=1).collect()
    v2 = {r["doc_id"]: r for r in dd.process_batch(
        _df(spark, [(20, EDIT)]), "doc_id", "text",
        batch_seq=2).collect()}
    assert v2[20]["is_dup"] and v2[20]["dup_of"] in (1, 2)


def test_replayed_batch_rederives_original_verdicts(spark, tmpdir_path):
    dd = IncrementalNearDeduper(spark, os.path.join(tmpdir_path, "idx"),
                                n_buckets=4)
    dd.process_batch(_df(spark, [(1, BASE)]), "doc_id", "text",
                     batch_seq=1).collect()
    batch2 = _df(spark, [(10, EDIT), (11, OTHER)])
    first = {r["doc_id"]: (r["is_dup"], r["dup_of"]) for r in
             dd.process_batch(batch2, "doc_id", "text",
                              batch_seq=2).collect()}
    # crash-and-replay: same seq + batch_id → identical verdicts (the
    # probe must not see the batch's own registrations) and idempotent
    # index state
    n_rows = dd.index.read().count()
    replay = {r["doc_id"]: (r["is_dup"], r["dup_of"]) for r in
              dd.process_batch(batch2, "doc_id", "text",
                               batch_seq=2).collect()}
    assert replay == first
    assert dd.index.read().count() == n_rows
    assert dd.max_registered_seq() == 2


def test_short_docs_are_kept_and_not_indexed(spark, tmpdir_path):
    dd = IncrementalNearDeduper(spark, os.path.join(tmpdir_path, "idx"),
                                k_shingle=2, n_buckets=4)
    v = {r["doc_id"]: r for r in dd.process_batch(
        _df(spark, [(1, "solo"), (2, BASE)]), "doc_id", "text",
        batch_seq=1).collect()}
    assert not v[1]["is_dup"]
    assert dd.index.read().where(F.col("doc_id") == 1).count() == 0


def test_out_of_range_doc_id_raises(spark, tmpdir_path):
    from debezium_connector_db2_spark.operators.dedup_incremental import (
        KEY_BASE)

    dd = IncrementalNearDeduper(spark, os.path.join(tmpdir_path, "idx"),
                                n_buckets=4)
    bad = _df(spark, [(KEY_BASE + 7, BASE)])
    with pytest.raises(Exception, match="doc id out of"):
        dd.process_batch(bad, "doc_id", "text", batch_seq=1).collect()


def test_rejects_bad_parameters(spark, tmpdir_path):
    with pytest.raises(ValueError, match="n_hashes"):
        IncrementalNearDeduper(spark, os.path.join(tmpdir_path, "i1"),
                               n_hashes=15)
    with pytest.raises(ValueError, match="min_matches"):
        IncrementalNearDeduper(spark, os.path.join(tmpdir_path, "i2"),
                               min_matches=17)


def test_streaming_near_dedup_across_restart(spark, tmpdir_path):
    """StreamingDeduper(near=True) runs the LSH index under a real
    StreamingQuery: a near-dup arriving in a LATER drop — after a full
    stop/restart with a fresh StreamingDeduper instance — must still be
    caught against the persisted index."""
    from debezium_connector_db2_spark.operators.dedup_incremental import (
        StreamingDeduper)

    crawl = os.path.join(tmpdir_path, "crawl")
    args = dict(crawl_dir=crawl,
                index_path=os.path.join(tmpdir_path, "idx"),
                out_dir=os.path.join(tmpdir_path, "kept"),
                checkpoint_dir=os.path.join(tmpdir_path, "ckpt"),
                near=True, near_kwargs={"n_buckets": 4})
    _df(spark, [(1, BASE), (2, OTHER)]).coalesce(1).write.mode(
        "append").parquet(crawl)
    StreamingDeduper(spark, **args).run_available()
    _df(spark, [(10, EDIT)]).coalesce(1).write.mode(
        "append").parquet(crawl)
    StreamingDeduper(spark, **args).run_available()  # fresh instance
    kept = spark.read.parquet(os.path.join(tmpdir_path, "kept"))
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == {1, 2}  # the cross-drop near-dup 10 was dropped


def test_duckdb_twin_matches_three_batch_run(spark, tmpdir_path):
    import duckdb

    docs = spark.read.parquet(SF_DOCS).select("doc_id", "text")
    dd = IncrementalNearDeduper(spark, os.path.join(tmpdir_path, "idx"))
    parts = []
    for b in range(3):
        parts.append(dd.process_batch(
            docs.where(F.col("doc_id") % 3 == b), "doc_id", "text",
            batch_seq=b))
    got = {r["doc_id"]: (r["is_dup"], r["dup_of"]) for p in parts
           for r in p.collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DOCS}'")
    want = {r[0]: (r[1], r[2]) for r in con.execute(
        incremental_near_sql("documents", "doc_id", "text",
                             "doc_id % 3")).fetchall()}
    assert got == want
    assert any(v[0] for v in got.values())  # non-vacuous: some dups
