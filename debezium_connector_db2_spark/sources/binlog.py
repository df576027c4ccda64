"""Binlog lake source: LSN-bucketed parquet change log.

Plays the role of the Db2 capture tables.  Layout::

    <dir>/lsn_bucket=<commit_lsn // bucket_size>/part-*.parquet

so an LSN-interval scan (the reference's indexed
``WHERE IBMSNAP_COMMITSEQ BETWEEN ? AND ?`` range scan,
``LuwPlatform.java:29-39``) becomes partition-pruned: Spark reads only the
buckets overlapping the interval.  At 100 TB this is the difference
between scanning the whole log per micro-batch and scanning one slice.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from debezium_connector_db2_spark.schemas import (
    BINLOG_SCHEMA,
    DEFAULT_LSN_BUCKET_SIZE,
    LSN_BUCKET_COL,
)


class BinlogSource:
    def __init__(self, spark: SparkSession, path: str,
                 bucket_size: int = DEFAULT_LSN_BUCKET_SIZE,
                 schema=None):
        self.spark = spark
        self.path = os.path.abspath(path)
        self.bucket_size = bucket_size
        #: binlog event schema; override to carry evolved payload columns
        self.schema = schema or BINLOG_SCHEMA

    def write(self, binlog: DataFrame, mode: str = "append") -> None:
        (
            binlog.withColumn(
                LSN_BUCKET_COL,
                (F.col("commit_lsn") / F.lit(self.bucket_size)).cast("long"),
            )
            .repartition(LSN_BUCKET_COL)
            .write.partitionBy(LSN_BUCKET_COL)
            .mode(mode)
            .parquet(self.path)
        )

    def read(self) -> DataFrame:
        from pyspark.sql import types as T

        schema = T.StructType(
            list(self.schema.fields) + [T.StructField(LSN_BUCKET_COL, T.LongType(), True)]
        )
        return self.spark.read.schema(schema).parquet(self.path)

    def read_range(self, from_lsn: int, to_lsn: int) -> DataFrame:
        """Closed-interval scan with both partition pruning (lsn_bucket
        predicate) and row-group skipping (commit_lsn min/max stats)."""
        lo_b = from_lsn // self.bucket_size
        hi_b = to_lsn // self.bucket_size
        return self.read().where(
            (F.col(LSN_BUCKET_COL) >= lo_b) & (F.col(LSN_BUCKET_COL) <= hi_b)
            & (F.col("commit_lsn") >= from_lsn) & (F.col("commit_lsn") <= to_lsn)
        ).drop(LSN_BUCKET_COL)

    def min_lsn_after(self, lsn: int) -> int | None:
        """Smallest commit_lsn strictly greater than ``lsn`` — lets the
        engine fast-forward over LSN gaps instead of scanning empty
        micro-batch ranges.

        One pruned scan over a geometrically widening window of candidate
        buckets (1, then 4, 16, …), never a job per bucket: the first probe
        covers the position's own bucket (which may hold only rows ≤ lsn),
        and because every *later* nonempty bucket only holds rows > lsn,
        the second probe succeeds whenever any data exists — ≤2 jobs on a
        contiguous-or-gapped log, O(log #buckets) worst case.
        """
        if not os.path.exists(self.path):
            return None
        lo_b = lsn // self.bucket_size
        cands = sorted(
            b for b in (
                int(d.split("=", 1)[1])
                for d in os.listdir(self.path)
                if d.startswith(f"{LSN_BUCKET_COL}=")
            )
            if b >= lo_b
        )
        #: scan-count instrumentation (regression-pinned by tests — each
        #: probe is one Spark query; AQE may split a query into >1 job)
        self.last_probe_scans = 0
        i, k = 0, 1
        while i < len(cands):
            window = cands[i:i + k]
            self.last_probe_scans += 1
            row = (
                self.read()
                .where(F.col(LSN_BUCKET_COL).isin(window)
                       & (F.col("commit_lsn") > lsn))
                .agg(F.min("commit_lsn").alias("m"))
                .collect()[0]
            )
            if row["m"] is not None:
                return row["m"]
            i += k
            k *= 4
        return None

    def prune(self, before_lsn: int) -> int:
        """Drop whole LSN buckets wholly below ``before_lsn`` — the
        reference's capture-table prune cycle (``asncdc.c`` prune
        command / ``IBMSNAP_PRUNCNTL`` coordination): change rows every
        subscriber has consumed are physically removed so the capture
        log stays bounded over a 10^10-event lifetime.

        ``before_lsn`` must be the MINIMUM consumed frontier across ALL
        consumers of this binlog — each engine's checkpoint commit_lsn
        (``MultiFeedPublisher.prune_binlog`` computes the min for shared
        logs; ``CdcEngine.maintain(prune_source=True)`` covers the
        single-consumer case).  Engines never re-read at or below their
        checkpoint, so removing strictly-below buckets can never drop an
        unapplied event.  Bucket granularity: the partial bucket
        containing ``before_lsn`` is kept (its tail may still be
        needed).  Pure directory removals — no Spark job, no rewrite.
        Returns the number of buckets removed.
        """
        import shutil

        if not os.path.exists(self.path):
            return 0
        removed = 0
        for d in os.listdir(self.path):
            if not d.startswith(f"{LSN_BUCKET_COL}="):
                continue
            b = int(d.split("=", 1)[1])
            # bucket b holds commit_lsn in [b*size, (b+1)*size - 1]
            if (b + 1) * self.bucket_size - 1 < before_lsn:
                shutil.rmtree(os.path.join(self.path, d),
                              ignore_errors=True)
                removed += 1
        return removed

    def min_lsn(self) -> int | None:
        """Smallest retained commit_lsn (None for an empty log) — what a
        brand-new consumer can replay from after pruning."""
        if not os.path.exists(self.path):
            return None
        buckets = [
            int(d.split("=", 1)[1])
            for d in os.listdir(self.path)
            if d.startswith(f"{LSN_BUCKET_COL}=")
        ]
        if not buckets:
            return None
        bot = min(buckets)
        row = (
            self.read()
            .where(F.col(LSN_BUCKET_COL) == bot)
            .agg(F.min("commit_lsn").alias("m"))
            .collect()[0]
        )
        return row["m"]

    def max_lsn(self) -> int | None:
        """S5 probe, pruned to the highest bucket only."""
        if not os.path.exists(self.path):
            return None
        buckets = [
            int(d.split("=", 1)[1])
            for d in os.listdir(self.path)
            if d.startswith(f"{LSN_BUCKET_COL}=")
        ]
        if not buckets:
            return None
        top = max(buckets)
        row = (
            self.read()
            .where(F.col(LSN_BUCKET_COL) == top)
            .agg(F.max("commit_lsn").alias("m"))
            .collect()[0]
        )
        return row["m"]
