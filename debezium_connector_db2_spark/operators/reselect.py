"""Reselect-columns post-processor — F8 (SURVEY.md §2.2).

The reference's ``ReselectColumnsPostProcessor``
(``Db2ReselectColumnsProcessorIT.java:23-134``) re-reads the *current*
value of null/unavailable columns from the source table before emitting
an event (Db2 capture can emit NULL for LOB-ish columns it didn't log).

Spark rendering: a left join of the change batch against the current
state, coalescing the selected columns — vectorized, no per-row lookups.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def reselect_columns(
    batch: DataFrame,
    current: DataFrame,
    key_cols: Sequence[str],
    reselect_cols: Sequence[str],
    broadcast_current: bool = False,
) -> DataFrame:
    """Fill NULLs in ``reselect_cols`` of ``batch`` from ``current``.

    ``current`` is typically ``target.read()`` (or the live source table).
    Column values present in the batch always win — only NULL slots are
    refreshed, matching the reference's semantics.
    """
    cur = current.select(
        *key_cols, *[F.col(c).alias(f"__cur_{c}") for c in reselect_cols]
    )
    if broadcast_current:
        cur = F.broadcast(cur)
    out = batch.join(cur, on=list(key_cols), how="left")
    for c in reselect_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__cur_{c}"))) \
                 .drop(f"__cur_{c}")
    return out
