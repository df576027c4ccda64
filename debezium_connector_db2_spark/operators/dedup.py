"""Per-key last-writer-wins dedup — the A4 kernel (SURVEY.md §2.4).

The reference guarantees a global total order (serial k-way merge,
``Db2StreamingChangeEventSource.java:183-201``) so that the *last* event
per PK wins in the compacted Kafka topic.  Our engine is data-parallel, so
the same contract is restated per key: within a batch, reduce to the
single event with the greatest ``(commit_lsn, intent_seq)`` per PK.  Final
table state is identical because MERGE keyed on PK is order-insensitive
across keys.

Two strategies:

* ``agg`` (default): ``max_by(struct(payload), struct(commit_lsn,
  intent_seq))`` — an aggregate with **map-side partial combine**, so a
  hot conversation (Zipf skew) is pre-reduced inside every input partition
  before the shuffle; the reduced rows per key that cross the wire are
  bounded by the partition count, not by the key's row count.  This is the
  scale path mandated by the north_rule's skew handling.  (Physically it
  compiles to SortAggregate — struct-valued buffers can't use the hash
  path — but the single exchange + ``partial_max_by`` is what matters;
  benched ~3× faster than the window strategy.  Pinned by
  tests/test_plans.py.)
* ``window``: ``row_number() OVER (PARTITION BY pk ORDER BY pos DESC)=1``
  — the literal W3 rendering (``ZOsPlatform.java:30``); simple, but a hot
  key lands on one reducer.  Kept for parity testing and small batches.
* ``salted``: explicit two-phase with a synthetic salt — demonstrates the
  general technique for aggregates that lack map-side combine.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from debezium_connector_db2_spark.schemas import PK_COLS


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str] = tuple(PK_COLS),
    order_cols: Sequence[str] = ("commit_lsn", "intent_seq"),
    strategy: str = "agg",
    n_salts: int = 16,
) -> DataFrame:
    """One row per key: the row with max ``order_cols`` (lexicographic)."""
    other = [c for c in df.columns if c not in key_cols]
    pos = F.struct(*[F.col(c) for c in order_cols])

    if strategy == "window":
        w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )

    if strategy == "salted":
        # Phase 1: per (key, salt) partial winner; phase 2: resolve across
        # salts.  The salt spreads one hot key over n_salts reducers.
        salted = df.withColumn(
            "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(n_salts))
        )
        p1 = salted.groupBy(*key_cols, "__salt").agg(
            F.max_by(F.struct(*[F.col(c) for c in other]), pos).alias("__w"),
            F.max(pos).alias("__pos"),
        )
        p2 = p1.groupBy(*key_cols).agg(
            F.max_by(F.col("__w"), F.col("__pos")).alias("__w")
        )
        return p2.select(*key_cols, *[F.col("__w")[c].alias(c) for c in other]) \
                 .select(*df.columns)

    # default: single hash aggregate with partial combine
    agg = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*[F.col(c) for c in other]), pos).alias("__w")
    )
    return agg.select(*key_cols, *[F.col("__w")[c].alias(c) for c in other]) \
              .select(*df.columns)
