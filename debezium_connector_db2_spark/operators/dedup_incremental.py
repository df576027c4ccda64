"""Incremental dedup against a persisted fingerprint index.

A 100-TB corpus is not deduplicated once — every new crawl batch must be
checked against *all previously ingested* content.  Rescanning the full
corpus per batch is O(history) and dies at scale; the standard shape is
a persistent fingerprint INDEX the pipeline probes and extends
incrementally: O(batch) work per batch, state bounded by one row per
distinct fingerprint.

This module builds that index on the repo's own lake machinery
(`lake.LakeTable`, merge-on-read): new fingerprints are *appended* as
per-bucket deltas (one write job, no read of existing data) under an
idempotent ``batch_id`` — a crashed-and-retried batch cannot
double-register fingerprints (the same exactly-once contract the CDC
sink uses, T4).

Scale shape of the probe: the normal regime is batch ≪ index (a daily
crawl vs years of history), so the batch's distinct fingerprints are
BROADCAST and the index is left-semi-probed — the index streams through
once with NO shuffle of either side and the match set that comes back
is at most the batch size.  The only shuffle anywhere is the
batch-internal first-occurrence window (small side).  Set
``broadcast_probe=False`` for a degenerate huge-batch regime to fall
back to a shuffle join.

Reference analogue: none directly (the reference is a CDC connector);
the idempotent-batch index commit mirrors its exactly-once sink
contract (``Db2ConnectorIT.java:104-258`` via ``lake.merge_changes``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql import types as T

from debezium_connector_db2_spark.functions.text import fingerprint
from debezium_connector_db2_spark.lake import LakeTable

#: One row per distinct fingerprint ever seen; ``doc_id`` records the
#: canonical (first-seen) document for provenance/auditing.
INDEX_SCHEMA = T.StructType([
    T.StructField("fp", T.StringType(), False),
    T.StructField("doc_id", T.LongType(), True),
])


class IncrementalDeduper:
    """Probe-and-extend fingerprint index for cross-batch exact dedup."""

    def __init__(self, spark: SparkSession, index_path: str,
                 n_buckets: int = 64):
        self.spark = spark
        try:
            self.index = LakeTable(spark, index_path)
            self.index.manifest()          # raises if absent
        except Exception:
            self.index = LakeTable.create(
                spark, index_path, INDEX_SCHEMA, bucket_by="fp",
                n_buckets=n_buckets, versioned=True, merge_mode="mor",
                key_cols=["fp"],
            )

    def process_batch(
        self,
        docs: DataFrame,
        id_col: str,
        text_col: str,
        batch_seq: int,
        batch_id: str | None = None,
        broadcast_probe: bool = True,
    ) -> DataFrame:
        """Mark each doc as duplicate-or-new and register the new
        fingerprints.

        A doc is ``is_dup`` iff its fingerprint was registered by an
        earlier batch OR an earlier row (smaller ``id_col``) of THIS
        batch carries it.  Returns ``(id_col, fp, is_dup)``; the caller
        filters ``~is_dup`` for the kept set.  The index commit is
        idempotent on ``batch_id`` (default ``batch-{batch_seq}``) —
        a replayed batch re-returns the same verdicts and appends
        nothing.

        NOTE: the verdict frame must be consumed (or the registration
        happens) in batch order — ``batch_seq`` is the index's logical
        clock (monotonic per call), mirroring the engine's LSN.  The
        probe reads only index rows registered at ``commit_lsn <
        batch_seq``: a crashed-and-replayed batch (whose own
        fingerprints ARE already in the index) re-derives the ORIGINAL
        verdicts instead of seeing itself and marking everything dup.
        """
        fps = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            fingerprint(F.col(text_col)).alias("fp"),
        )
        w = Window.partitionBy("fp").orderBy("doc_id")
        fps = fps.withColumn("__first", F.row_number().over(w) == 1)

        # raw=True exposes __commit_lsn (== the registering batch_seq);
        # excluding >= batch_seq rows makes replay idempotent end-to-end.
        prior = (self.index.read(raw=True)
                 .where(F.col("__commit_lsn") < int(batch_seq))
                 .select("fp"))
        new_keys = fps.where("__first").select("fp", "doc_id")
        if broadcast_probe:
            probe = F.broadcast(new_keys.select("fp"))
            matched = (prior
                       .join(probe, "fp", "left_semi")
                       .select("fp", F.lit(True).alias("__seen")))
            matched = F.broadcast(matched)
        else:
            matched = (prior
                       .join(new_keys.select("fp"), "fp", "left_semi")
                       .select("fp", F.lit(True).alias("__seen")))
        verdict = (fps.join(matched, "fp", "left")
                   .select(F.col("doc_id").alias(id_col), "fp",
                           (F.coalesce(F.col("__seen"), F.lit(False))
                            | ~F.col("__first")).alias("is_dup")))

        to_register = (fps.where("__first")
                       .join(matched, "fp", "left")
                       .where(F.col("__seen").isNull())
                       .select(
                           "fp", "doc_id",
                           F.lit(int(batch_seq)).alias("commit_lsn"),
                           F.lit(0).alias("intent_seq"),
                           F.lit("c").alias("op")))
        self.index.merge_changes(
            to_register, ["fp"], op_col="op", delete_op="d",
            batch_id=batch_id or f"batch-{batch_seq}",
            summary={"operation": "dedup-index-extend",
                     "batch_seq": int(batch_seq)},
        )
        return verdict

    def compact(self) -> None:
        """Fold per-bucket delta files into base files (MoR maintenance;
        amortize every N batches like the engine's auto-compaction)."""
        self.index.compact()
