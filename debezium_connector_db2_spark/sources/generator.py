"""Deterministic synthetic CDC workload generator (FIXTURES.md §2).

Produces, entirely with Spark-native expressions (no Python in the data
path, no external data):

* an initial **snapshot** of the transcript table, and
* an LSN-ordered **binlog** of I/U/D change rows mirroring a Db2 capture
  table (``asncdcaddremove.sql:77-105``): monotonic ``commit_lsn`` per
  transaction, ``intent_seq`` ordering within, Zipf-skewed hot
  conversations, a configurable share of updates encoded as adjacent
  D-then-I row pairs at the same ``commit_lsn`` (the encoding the reference
  classifies via LEAD/LAG, ``LuwPlatform.java:29-39``), and PK-update
  delete+insert pairs (``Db2ConnectorIT.java:161-258``).

Randomness is ``xxhash64(seed, i)``-derived, so the workload is a pure
function of (seed, n) — identical across cluster sizes and runs, and
generable distributed at 10^10 scale via ``spark.range``.

The final-state oracle is closed-form (no sequential replay needed):
for each PK take the row with max ``(commit_lsn, intent_seq)``; if its op
is 'D' the key is absent, else the row image is the final row.  This holds
for the pair encoding too, because a D+I pair is literally a delete of the
old key followed by an insert of the new key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from debezium_connector_db2_spark.schemas import TRANSCRIPT_FIELDS

# Payload struct carried through explode.
_PAYLOAD_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _u(seed: int, salt: int, *cols) -> F.Column:
    """Deterministic uniform in [0,1) from xxhash64 of (seed, salt, cols)."""
    h = F.xxhash64(F.lit(seed), F.lit(salt), *cols)
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double") / F.lit(1_000_000_007.0))


def _conv_id(seed: int, salt: int, idx, n_convs: int, zipf_s: float) -> F.Column:
    """Zipf-ish conversation id via inverse-CDF power transform.

    rank = floor(n_convs * u^s): s>1 concentrates mass on low ranks —
    hot conversations, the skew the north_rule requires us to defuse.
    """
    u = _u(seed, salt, idx)
    rank = F.floor(F.lit(float(n_convs)) * F.pow(u, F.lit(zipf_s))).cast("long")
    return F.concat(F.lit("conv-"), F.lpad(rank.cast("string"), 8, "0"))


def _payload(seed: int, salt: int, conv, turn, base_ts: str) -> list[F.Column]:
    """Deterministic payload columns for a (conv, turn) at generation step."""
    h = F.xxhash64(F.lit(seed), F.lit(salt), conv, turn)
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (F.pmod(h, F.lit(3)) + 1).cast("int"),
    )
    text = F.concat(F.lit("txt-"), F.md5(F.concat(conv, F.lit(":"), turn.cast("string"),
                                                  F.lit(":"), F.lit(str(salt)))))
    tool = F.when(F.pmod(h, F.lit(5)) == 0,
                  F.concat(F.lit("tool_"), F.pmod(h, F.lit(7)).cast("string"))).otherwise(F.lit(None))
    ts = F.to_timestamp(F.lit(base_ts))
    return [role.alias("role"), text.alias("text"), tool.alias("tool"), ts.alias("ts")]


def generate_binlog(
    spark: SparkSession,
    n_ops: int,
    n_convs: int = 1000,
    turns_per_conv: int = 20,
    seed: int = 42,
    avg_tx_size: int = 8,
    zipf_s: float = 2.0,
    p_update: float = 0.35,
    p_delete: float = 0.10,
    p_pair_encoding: float = 0.4,
    p_pk_update: float = 0.05,
    lsn_offset: int = 0,
    base_ts: str = "2026-01-01 00:00:00",
    table: str = "transcripts",
    schema_version: int = 0,
) -> DataFrame:
    """Generate ``n_ops`` logical change operations as a binlog DataFrame.

    Logical ops explode into 1 or 2 physical rows (pair encodings), so the
    row count is between n_ops and 2*n_ops.  ``lsn_offset`` shifts the
    commit_lsn range so successive generations form one continuous log.
    """
    ops = spark.range(n_ops).withColumnRenamed("id", "i")
    i = F.col("i")

    conv = _conv_id(seed, 1, i, n_convs, zipf_s)
    turn = F.pmod(F.xxhash64(F.lit(seed), F.lit(2), i), F.lit(turns_per_conv)).cast("int")

    u_op = _u(seed, 3, i)
    op = (
        F.when(u_op < p_delete, F.lit("D"))
        .when(u_op < p_delete + p_update, F.lit("U"))
        .otherwise(F.lit("I"))
    )
    pair = (op == "U") & (_u(seed, 4, i) < p_pair_encoding)
    pk_update = pair & (_u(seed, 5, i) < p_pk_update)

    tx_id = (i / F.lit(avg_tx_size)).cast("long")
    commit_lsn = (tx_id + F.lit(1 + lsn_offset)).alias("commit_lsn")

    # time advances ~1s per transaction
    ts_expr = F.to_timestamp(F.lit(base_ts)) + F.make_dt_interval(secs=tx_id.cast("double"))

    before_payload = F.struct(
        conv.alias("conv_id"), turn.alias("turn_idx"),
        *_payload(seed, 6, conv, turn, base_ts),
    )
    # new key for PK updates: turn shifted into a disjoint range
    new_turn = F.when(pk_update, turn + F.lit(turns_per_conv)).otherwise(turn)
    after_payload = F.struct(
        conv.alias("conv_id"), new_turn.cast("int").alias("turn_idx"),
        *_payload(seed, 7, conv, new_turn, base_ts),
    )

    single_row = F.struct(op.alias("op"), after_payload.alias("p"))
    pair_rows = F.array(
        F.struct(F.lit("D").alias("op"), before_payload.alias("p")),
        F.struct(F.lit("I").alias("op"), after_payload.alias("p")),
    )
    rows = F.when(pair, pair_rows).otherwise(F.array(single_row))

    exploded = (
        ops.select(
            i, commit_lsn,
            F.posexplode(rows).alias("pos", "r"),
        )
        .select(
            F.col("commit_lsn"),
            (i * 2 + F.col("pos")).alias("intent_seq"),
            F.col("r.op").alias("op"),
            F.lit(table).alias("table"),
            F.lit(schema_version).alias("schema_version"),
            F.col("r.p.conv_id").alias("conv_id"),
            F.col("r.p.turn_idx").alias("turn_idx"),
            F.col("r.p.role").alias("role"),
            F.col("r.p.text").alias("text"),
            F.col("r.p.tool").alias("tool"),
            ts_expr.alias("ts"),
        )
    )
    return exploded


def generate_snapshot(
    spark: SparkSession,
    n_convs: int = 1000,
    turns_per_conv: int = 20,
    seed: int = 42,
    fill: float = 0.5,
    base_ts: str = "2025-12-31 00:00:00",
) -> DataFrame:
    """Initial source-table contents (rows that exist before the binlog).

    A deterministic ``fill`` fraction of the (conv, turn) grid.
    """
    n = n_convs * turns_per_conv
    grid = spark.range(n).select(
        F.concat(F.lit("conv-"),
                 F.lpad((F.col("id") / turns_per_conv).cast("long").cast("string"), 8, "0")
                 ).alias("conv_id"),
        F.pmod(F.col("id"), F.lit(turns_per_conv)).cast("int").alias("turn_idx"),
    )
    kept = grid.where(_u(seed, 10, F.col("conv_id"), F.col("turn_idx")) < fill)
    return kept.select(
        "conv_id", "turn_idx",
        *_payload(seed, 11, F.col("conv_id"), F.col("turn_idx"), base_ts),
    )


def oracle_final_state(snapshot: DataFrame, binlog: DataFrame) -> DataFrame:
    """Closed-form final state: last-writer-wins over snapshot ∪ binlog.

    Snapshot rows participate at position (0, row-order) — i.e. before every
    binlog row (binlog commit_lsn starts at 1).  Used by tests as the
    engine-independent oracle; an equivalent DuckDB SQL oracle backs the
    driver's correctness gate.
    """
    snap_ev = snapshot.select(
        F.lit(0).cast("long").alias("commit_lsn"),
        F.lit(0).cast("long").alias("intent_seq"),
        F.lit("R").alias("op"),
        *[F.col(c) for c in _PAYLOAD_COLS],
    )
    ev = binlog.select("commit_lsn", "intent_seq", "op", *_PAYLOAD_COLS)
    allev = snap_ev.unionByName(ev)
    latest = (
        allev.groupBy("conv_id", "turn_idx")
        .agg(
            F.max_by(
                F.struct("op", *[c for c in _PAYLOAD_COLS]),
                F.struct("commit_lsn", "intent_seq"),
            ).alias("w")
        )
        .where(F.col("w.op") != "D")
        .select("conv_id", "turn_idx", "w.role", "w.text", "w.tool", "w.ts")
    )
    return latest
