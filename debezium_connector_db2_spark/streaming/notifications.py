"""Notification channel — user-facing lifecycle events.

The reference wires a ``NotificationService`` into the connector task
(``Db2ConnectorTask.java:160-162``) that publishes snapshot lifecycle and
incremental-snapshot progress notifications — id / aggregate_type / type /
additional data — to a sink channel (asserted by ``NotificationsIT``).

Here the channel is an append-only JSONL file; each line is
``{"id", "aggregate_type", "type", "ts", "data"}``.  Aggregate types and
event types mirror the reference's: ``Initial Snapshot`` with
STARTED/COMPLETED/SKIPPED, ``Incremental Snapshot`` with
STARTED/IN_PROGRESS/TABLE_SCAN_COMPLETED/COMPLETED.
"""

from __future__ import annotations

import datetime
import json
import os

from pyspark.sql import DataFrame, SparkSession


class NotificationLog:
    def __init__(self, path: str):
        self.file = os.path.abspath(path)
        os.makedirs(os.path.dirname(self.file) or ".", exist_ok=True)
        self._n = sum(1 for _ in open(self.file)) if os.path.exists(self.file) else 0

    def emit(self, aggregate_type: str, type: str, data: dict | None = None) -> dict:
        row = {
            "id": self._n,
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
