"""Resumable offset checkpoint — the reference's offset map
(``Db2OffsetContext.java:66-80``: commit_lsn + change_lsn + event_serial_no)
rendered as an atomically-replaced JSON file.

The position is ``(commit_lsn, intent_seq)`` — exact, so restart filtering
(F2/F3) is a tuple compare rather than a serial-number replay count.
``epoch`` is the micro-batch counter; ``batch_id`` of the last applied
batch links the checkpoint to the lake table's idempotent commit record,
closing the crash window between sink commit and checkpoint write
(SURVEY.md §7 "what's hard").
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import asdict, dataclass


@dataclass
class Offset:
    commit_lsn: int = 0
    intent_seq: int = -1
    epoch: int = 0
    snapshot_completed: bool = False
    last_batch_id: str | None = None

    def position(self) -> tuple[int, int]:
        return (self.commit_lsn, self.intent_seq)


class Checkpoint:
    def __init__(self, path: str):
        self.dir = os.path.abspath(path)
        os.makedirs(self.dir, exist_ok=True)
        self.file = os.path.join(self.dir, "offset.json")

    def read(self) -> Offset:
        if not os.path.exists(self.file):
            return Offset()
        with open(self.file) as f:
            return Offset(**json.load(f))

    def write(self, offset: Offset) -> None:
        tmp = os.path.join(self.dir, f".offset.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(asdict(offset), f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self.file)  # atomic on POSIX
