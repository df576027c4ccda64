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

#: Debezium's per-column schema-parameter keys for
#: ``datatype.propagate.source.type`` (RelationalDatabaseConnectorConfig
#: constants, asserted by ``Db2ConnectorIT.java:822-871``).
TYPE_NAME_PARAMETER_KEY = "__debezium.source.column.type"
TYPE_LENGTH_PARAMETER_KEY = "__debezium.source.column.length"
TYPE_SCALE_PARAMETER_KEY = "__debezium.source.column.scale"


def parse_message_key_columns(spec: str) -> list[tuple["re.Pattern", list[str]]]:
    """Parse Debezium's ``message.key.columns`` value: a semicolon-
    separated list of ``<table-regex>:<col>,<col>,...`` entries
    (``Db2ConnectorIT.java:790-820`` uses ``(.*).tablea:id,cola``,
    DBZ-775).  Returns ``[(compiled regex, [columns]), ...]`` in spec
    order — the first regex matching a table's qualified name wins."""
    import re

    out = []
    for entry in spec.split(";"):
        entry = entry.strip()
        if not entry:
            continue
        if ":" not in entry:
            raise ValueError(
                f"message.key.columns entry {entry!r} is not "
                f"'<table-regex>:<col,...>'")
        pat, cols = entry.rsplit(":", 1)
        cols = [c.strip() for c in cols.split(",") if c.strip()]
        if not cols:
            raise ValueError(f"message.key.columns entry {entry!r} "
                             f"lists no columns")
        out.append((re.compile(pat, re.IGNORECASE), cols))
    return out


def key_columns_for(spec: str | None, qualified_table: str,
                    default: list[str], *,
                    match_bare_table: bool = False) -> list[str]:
    """Resolve the record-key columns for a table under an optional
    ``message.key.columns`` spec: the first entry whose regex fullmatches
    the *fully-qualified* table name (``schema.table``) rewrites the key,
    otherwise the ``default`` (PK) stands.  Matching the bare table name
    is looser than Debezium's semantics (an ``orders:id`` entry meant for
    one schema would rewrite every schema's ``orders``) and is off unless
    ``match_bare_table=True`` is passed explicitly.
    """
    if not spec:
        return list(default)
    bare = qualified_table.rsplit(".", 1)[-1]
    for pat, cols in parse_message_key_columns(spec):
        if pat.fullmatch(qualified_table) or (
                match_bare_table and pat.fullmatch(bare)):
            return list(cols)
    return list(default)


def source_type_parameters(
    column_types: dict[str, tuple],
    propagate: str | None,
    qualified_table: str,
    column_propagate: str | None = None,
) -> dict[str, dict[str, str]]:
    """Per-column ``__debezium.source.column.*`` parameter maps for the
    columns selected by either propagation config
    (``Db2ConnectorIT.java:822-871``, DBZ-1916/DBZ-1830):

    * ``propagate`` — ``datatype.propagate.source.type``: regexes
      fullmatched (case-insensitively) against the column's *source data
      type* as ``schema.table.TYPE``, ``table.TYPE`` and bare ``TYPE``;
    * ``column_propagate`` — ``column.propagate.source.type``
      (RelationalDatabaseConnectorConfig's per-column variant): regexes
      fullmatched against the *qualified column name*
      ``schema.table.column`` and ``table.column``.

    A column matched by either carries the same parameter keys (first
    match wins — matching twice adds nothing).  ``column_types`` is the
    capture catalog's knowledge of the source schema — ``{column:
    (TYPE_NAME, length, scale)}`` with length/scale optional (the
    reference reads this from JDBC metadata; here the registry/config
    supplies it).  Columns matched by neither carry no parameters — the
    reference asserts exactly that for its ID/C1/C2 columns.
    """
    import re

    if (not propagate and not column_propagate) or not column_types:
        return {}
    type_pats = [re.compile(p.strip(), re.IGNORECASE)
                 for p in (propagate or "").split(",") if p.strip()]
    col_pats = [re.compile(p.strip(), re.IGNORECASE)
                for p in (column_propagate or "").split(",") if p.strip()]
    bare_table = qualified_table.rsplit(".", 1)[-1]
    out: dict[str, dict[str, str]] = {}
    for col, spec in column_types.items():
        type_name, length, scale = (tuple(spec) + (None, None))[:3]
        type_cands = [f"{qualified_table}.{type_name}",
                      f"{bare_table}.{type_name}", str(type_name)]
        col_cands = [f"{qualified_table}.{col}", f"{bare_table}.{col}"]
        matched = (
            any(p.fullmatch(c) for p in type_pats for c in type_cands)
            or any(p.fullmatch(c) for p in col_pats for c in col_cands)
        )
        if not matched:
            continue
        params = {TYPE_NAME_PARAMETER_KEY: str(type_name)}
        if length is not None:
            params[TYPE_LENGTH_PARAMETER_KEY] = str(length)
        if scale is not None:
            params[TYPE_SCALE_PARAMETER_KEY] = str(scale)
        out[col] = params
    return out


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
    last_snapshot_pos: tuple[int, int] | None = None,
    source_types: dict[str, dict[str, str]] | None = None,
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

    ``last_snapshot_pos=(commit_lsn, intent_seq)`` marks the snapshot
    read record at exactly that feed position with ``source.snapshot =
    'last'`` instead of ``'true'`` — Debezium's SnapshotRecord enum
    emits LAST on the final snapshot record so consumers can detect
    snapshot completion (SnapshotRecord semantics behind
    ``SourceInfoTest.java:86-104``).  The position is supplied by the
    caller (an O(1) literal comparison per row), never computed here —
    a global max-window over the feed would single-partition it.

    ``source_types`` attaches Debezium's
    ``datatype.propagate.source.type`` per-column parameters
    (``__debezium.source.column.type/length/scale``,
    ``Db2ConnectorIT.java:822-871``) as a constant
    ``map<string, map<string, string>>`` column ``source_types`` — the
    wire rendering of what the reference carries as Kafka schema
    parameters (this engine's records are rows, so schema-level
    metadata rides as a literal column: zero per-row compute, prunable).
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
    if last_snapshot_pos is not None:
        is_last = ((F.col("commit_lsn") == F.lit(int(last_snapshot_pos[0])))
                   & (F.col("intent_seq") == F.lit(int(last_snapshot_pos[1]))))
        snapshot = F.when(
            F.col("op") == "r",
            F.when(is_last, F.lit("last")).otherwise(F.lit("true")),
        ).otherwise(F.lit("false"))
    else:
        snapshot = F.when(F.col("op") == "r",
                          F.lit("true")).otherwise(F.lit("false"))
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
    selected = [*cols, envelope.alias("envelope")]
    if source_types:
        entries = []
        for col, params in source_types.items():
            inner = []
            for k, v in params.items():
                inner += [F.lit(k), F.lit(v)]
            entries += [F.lit(col), F.create_map(*inner)]
        selected.append(F.create_map(*entries).alias("source_types"))
    return feed.select(*selected)


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
