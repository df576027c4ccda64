"""Notification channel — user-facing lifecycle events.

The reference wires a ``NotificationService`` into the connector task
(``Db2ConnectorTask.java:160-162``) that publishes snapshot lifecycle and
incremental-snapshot progress notifications — id / aggregate_type / type /
additional data — to a sink channel (asserted by ``NotificationsIT``).

Here the channel is an append-only JSONL file; each line is
``{"id", "seq", "aggregate_type", "type", "ts", "data"}``.  Aggregate
types and event types mirror the reference's: ``Initial Snapshot`` with
STARTED/COMPLETED/SKIPPED, ``Incremental Snapshot`` with
STARTED/IN_PROGRESS/TABLE_SCAN_COMPLETED/COMPLETED.  ``id`` is a uuid —
globally unique even with several writers appending to one log (engine +
repair loop, or N engines sharing a channel), matching the reference's
``UUID.randomUUID()`` notification ids; ``seq`` is this *writer's* local
emit counter (ordering within one writer only — interleaved appends from
concurrent writers carry no cross-writer order guarantee).
"""

from __future__ import annotations

import datetime
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class NotificationLog:
    def __init__(self, path: str):
        self.file = os.path.abspath(path)
        os.makedirs(os.path.dirname(self.file) or ".", exist_ok=True)
        self._n = 0

    def emit(self, aggregate_type: str, type: str, data: dict | None = None) -> dict:
        row = {
            "id": uuid.uuid4().hex,
            "seq": self._n,
            "aggregate_type": aggregate_type,
            "type": type,
            "ts": datetime.datetime.now(datetime.timezone.utc)
            .isoformat(timespec="milliseconds"),
            "data": data or {},
        }
        with open(self.file, "a") as f:
            f.write(json.dumps(row) + "\n")
        self._n += 1
        return row

    def read(self) -> list[dict]:
        if not os.path.exists(self.file):
            return []
        with open(self.file) as f:
            return [json.loads(line) for line in f if line.strip()]

    def to_df(self, spark: SparkSession) -> DataFrame:
        return spark.read.json(self.file)
