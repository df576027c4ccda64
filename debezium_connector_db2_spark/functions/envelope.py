"""Debezium change-event envelope: the nested ``source`` struct + op/ts_ms.

The reference's event value is ``{before, after, source, op, ts_ms}``
where ``source`` has an exact golden schema — field names, order, and
optionality asserted by ``SourceInfoTest.java:86-104`` and built by
``Db2SourceInfoStructMaker.java:19-51`` over Debezium core's common
fields::

    version      STRING            connector    STRING
    name         STRING            ts_ms        INT64
    snapshot     STRING (enum)     db           STRING
    sequence     OPTIONAL STRING   ts_us        OPTIONAL INT64
    ts_ns        OPTIONAL INT64    schema       STRING
    table        STRING            change_lsn   OPTIONAL STRING
    commit_lsn   OPTIONAL STRING

LSNs are rendered as zero-padded hex strings (``Lsn.java:62-102`` —
order-preserving, see functions/lsn.py).  Deviation (documented): the
reference's top-level ``ts_ms`` is connector processing time; this
engine sets it equal to ``source.ts_ms`` (the event's commit instant) so
replay output is deterministic and oracle-hashable — a replay-equality
engine cannot emit wall-clock fields.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from debezium_connector_db2_spark.functions.lsn import lsn_to_hex

#: Golden field order of the source struct (SourceInfoTest.java:86-104).
SOURCE_FIELD_NAMES = [
    "version", "connector", "name", "ts_ms", "snapshot", "db",
    "sequence", "ts_us", "ts_ns", "schema", "table",
    "change_lsn", "commit_lsn",
]

CONNECTOR = "db2-spark"


def source_struct(
    *,
    version: str,
    name: str,
    ts: Column,
    snapshot: Column,
    db: str,
    schema_name: str,
    table: Column,
    change_lsn: Column,
    commit_lsn: Column,
    connector: str = CONNECTOR,
) -> Column:
    """The ``source`` struct in golden field order.

    ``ts`` is a timestamp column (the event's commit instant); ts_ms/
    ts_us/ts_ns derive from it.  ``snapshot`` is a string column
    ('true'/'false'/'last' — Debezium's SnapshotRecord enum renders as a
    string in the wire schema).  ``change_lsn``/``commit_lsn`` are bigint
    LSN columns, rendered as order-preserving hex strings.
    """
    # Exact integer-microseconds path — no floating point anywhere in the
    # timestamp derivation (NTZ-safe: session tz is UTC everywhere here).
    us = F.unix_micros(ts.cast("timestamp"))
    return F.struct(
        F.lit(version).alias("version"),
        F.lit(connector).alias("connector"),
        F.lit(name).alias("name"),
        (us / F.lit(1000)).cast("long").alias("ts_ms"),
        snapshot.cast("string").alias("snapshot"),
        F.lit(db).alias("db"),
        F.lit(None).cast("string").alias("sequence"),  # unused on Db2
        us.alias("ts_us"),
        (us * F.lit(1000)).alias("ts_ns"),
        F.lit(schema_name).alias("schema"),
        table.cast("string").alias("table"),
        lsn_to_hex(change_lsn).alias("change_lsn"),
        lsn_to_hex(commit_lsn).alias("commit_lsn"),
    )


def wrap_envelope(
    feed: DataFrame,
    *,
    version: str,
    name: str,
    db: str,
    schema_name: str,
    ts_col: str = "ts",
    key_col: str | None = None,
    transaction_block: bool = False,
) -> DataFrame:
    """Wrap an export_events-shaped feed (op/before/after/commit_lsn/
    intent_seq/table) into full Debezium records.

    Output: one row per feed row with columns (table, commit_lsn,
    intent_seq, key?, envelope) where ``envelope`` is the struct
    ``{before, after, source, op, ts_ms}`` — NULL for tombstone rows
    (op='t'): a Kafka tombstone is key + null value, which is what makes
    downstream log compaction work (``Db2ConnectorIT.java:211-215``).

    The event's commit instant is taken from ``coalesce(after.ts,
    before.ts)`` (column ``ts_col`` of the payload images) — this engine
    stores the instant inline per event, playing the role of the
    reference's UOW commit-time lookup (``Db2Connection.java:240-263``).

    ``transaction_block=True`` adds Debezium's per-record ``transaction``
    struct ``{id, total_order, data_collection_order}`` — tx id (the
    commit LSN, hex), the event's 1-based position across the whole
    transaction, and its position among the transaction's events for the
    same table (``TransactionMetadataIT.java:110-117``
    ``assertRecordTransactionMetadata``).  Orders count *data* events
    only; tombstones carry no transaction block (they have no envelope).
    Cost: two windows partitioned by commit_lsn — bounded per-partition
    state (a transaction's events), same shape as the classify step.
    """
    if transaction_block:
        from pyspark.sql import Window

        is_data = (F.col("op") != "t").cast("int")
        w = (Window.partitionBy("commit_lsn").orderBy("intent_seq")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        wt = (Window.partitionBy("commit_lsn", "table").orderBy("intent_seq")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        feed = (feed.withColumn("__tx_total", F.sum(is_data).over(w))
                .withColumn("__tx_coll", F.sum(is_data).over(wt)))
    ts = F.coalesce(F.col(f"after.{ts_col}"), F.col(f"before.{ts_col}"))
    snapshot = F.when(F.col("op") == "r", F.lit("true")).otherwise(F.lit("false"))
    src = source_struct(
        version=version, name=name, ts=ts, snapshot=snapshot,
        db=db, schema_name=schema_name, table=F.col("table"),
        change_lsn=F.col("intent_seq"), commit_lsn=F.col("commit_lsn"),
    )
    ts_ms = (F.unix_micros(ts.cast("timestamp")) / F.lit(1000)).cast("long")
    env_fields = [
        F.col("before").alias("before"),
        F.col("after").alias("after"),
        src.alias("source"),
        F.col("op").alias("op"),
        ts_ms.alias("ts_ms"),
    ]
    if transaction_block:
        env_fields.append(F.struct(
            lsn_to_hex(F.col("commit_lsn")).alias("id"),
            F.col("__tx_total").cast("long").alias("total_order"),
            F.col("__tx_coll").cast("long").alias("data_collection_order"),
        ).alias("transaction"))
    envelope = F.when(F.col("op") != "t", F.struct(*env_fields))
    # otherwise NULL — tombstone
    cols = ["table", "commit_lsn", "intent_seq"]
    if key_col is not None:
        cols.append(key_col)
    return feed.select(*cols, envelope.alias("envelope"))


def skip_operations(feed: DataFrame, skipped: str | set[str]) -> DataFrame:
    """Debezium core's ``skipped.operations`` (inherited by the Db2
    connector's config surface — ``Db2ConnectorConfig.java:47`` extends
    the common config): drop the listed op codes from a feed before
    publishing.  Accepts the wire spelling (``"d,u"``) or a set.
    Skipping ``d`` also drops the delete's tombstone row (op='t') — a
    tombstone without its delete is meaningless to a compacting consumer.
    """
    if isinstance(skipped, str):
        ops = {o.strip() for o in skipped.split(",") if o.strip()}
    else:
        ops = set(skipped)
    if "d" in ops:
        ops.add("t")
    return feed.where(~F.col("op").isin(*ops))


def unwrap_envelope(records: DataFrame, drop_deletes: bool = False) -> DataFrame:
    """The ExtractNewRecordState SMT (Debezium's "unwrap" transform, the
    standard consumer-side flattening): one flat row per record — the
    after-image's columns at top level plus ``__op/__table/__lsn/__ts_ms``
    metadata.

    Delete handling mirrors the SMT's ``delete.handling.mode``:
    ``drop_deletes=False`` (rewrite) keeps deletes as rows flattened from
    the *before* image with ``__deleted = true``; ``True`` drops them.
    Tombstone records (null envelope) are always dropped — they exist for
    log compaction, not for tabular consumers.
    """
    data = records.where(F.col("envelope").isNotNull())
    if drop_deletes:
        data = data.where(F.col("envelope.op") != "d")
    img = F.coalesce(F.col("envelope.after"), F.col("envelope.before"))
    payload = [img[f.name].alias(f.name)
               for f in records.schema["envelope"].dataType["after"]
               .dataType.fields]
    return data.select(
        *payload,
        (F.col("envelope.op") == "d").alias("__deleted"),
        F.col("envelope.op").alias("__op"),
        F.col("table").alias("__table"),
        F.col("commit_lsn").alias("__lsn"),
        F.col("envelope.ts_ms").alias("__ts_ms"),
    )
