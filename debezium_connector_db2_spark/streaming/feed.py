"""Change-event feed publishing — the Kafka-topic sink rendered as an
LSN-ordered parquet segment log.

The reference publishes per-table change events to Kafka topics as they
stream (``Db2ConnectorTask`` dispatch).  Here the topic is a directory of
parquet segments, one per applied micro-batch, written by a
``FeedPublisher`` hooked into the engine loop as its ``on_batch``
callback::

    pub = FeedPublisher(engine, feed_dir, transaction_block=True)
    engine.run_available(on_batch=pub.publish)

Exactly-once: the segment path is a pure function of the batch
``(epoch, from_lsn, to_lsn)``; a replayed batch (restart inside the
crash window) finds its segment already present and skips — the same
idempotence contract as the lake sink's batch ids.  Writes are staged to
a dot-prefixed temp dir (invisible to Spark's reader) and atomically
renamed in.

Consumers read the whole feed (or a suffix) with ``read()`` and order by
``(commit_lsn, intent_seq)`` — the total order the reference's
single-task serial dispatch guarantees per partition, here carried as
data so any number of downstream readers can re-establish it.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame


class FeedPublisher:
    def __init__(self, engine, feed_dir: str, tombstones: bool = True,
                 transaction_block: bool = False, heartbeats: bool = False,
                 **envelope_kwargs):
        self.engine = engine
        self.dir = os.path.abspath(feed_dir)
        self.tombstones = tombstones
        self.transaction_block = transaction_block
        #: publish empty batches as heartbeat records on the sibling
        #: heartbeat topic (``<feed_dir>-heartbeats``) — the reference
        #: emits heartbeat-topic records so downstream liveness monitors
        #: see idle ticks (Debezium core heartbeat wiring; idle probe
        #: mirrors ``Db2StreamingChangeEventSource.java:147-152``)
        self.heartbeats = heartbeats
        self.hb_dir = self.dir + "-heartbeats"
        self.envelope_kwargs = envelope_kwargs
        os.makedirs(self.dir, exist_ok=True)

    def publish(self, m) -> str | None:
        """Publish one applied batch's envelope records; engine
        ``on_batch`` hook.  Returns the segment path, or None for an
        empty/replayed batch (empty batches become heartbeat records when
        ``heartbeats=True``)."""
        if m.events == 0:
            if not self.heartbeats:
                return None
            os.makedirs(self.hb_dir, exist_ok=True)
            seg = f"hb-{m.epoch:08d}-{m.to_lsn}"
            final = os.path.join(self.hb_dir, seg)
            if os.path.exists(final):
                return None
            hb = self.engine.spark.range(1).selectExpr(
                f"CAST({m.epoch} AS LONG) AS epoch",
                f"CAST({m.to_lsn} AS LONG) AS lsn",
                "'h' AS op")
            tmp = os.path.join(self.hb_dir,
                               f".tmp-{seg}-{uuid.uuid4().hex[:8]}")
            hb.coalesce(1).write.mode("overwrite").parquet(tmp)
            os.rename(tmp, final)
            return final
        seg = f"seg-{m.epoch:08d}-{m.from_lsn}-{m.to_lsn}"
        final = os.path.join(self.dir, seg)
        if os.path.exists(final):
            return None  # replayed batch — already published (idempotent)
        df = self.engine.export_envelope(
            m.from_lsn + 1, m.to_lsn, tombstones=self.tombstones,
            transaction_block=self.transaction_block,
            **self.envelope_kwargs,
        )
        tmp = os.path.join(self.dir, f".tmp-{seg}-{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, final)
        return final

    def segments(self) -> list[str]:
        return sorted(
            os.path.join(self.dir, d) for d in os.listdir(self.dir)
            if d.startswith("seg-")
        )

    def read(self) -> DataFrame:
        """The published feed, LSN-ordered."""
        segs = self.segments()
        if not segs:
            raise ValueError(f"feed {self.dir} has no published segments")
        return (self.engine.spark.read.parquet(*segs)
                .orderBy("commit_lsn", "intent_seq"))

    def read_heartbeats(self) -> DataFrame:
        """The heartbeat topic (epoch, lsn, op='h'), epoch-ordered."""
        segs = sorted(
            os.path.join(self.hb_dir, d) for d in os.listdir(self.hb_dir)
            if d.startswith("hb-")
        ) if os.path.isdir(self.hb_dir) else []
        if not segs:
            raise ValueError(f"{self.hb_dir} has no heartbeat segments")
        return self.engine.spark.read.parquet(*segs).orderBy("epoch")
