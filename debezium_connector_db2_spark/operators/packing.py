"""Token-budget sequence packing plan — concat-and-chunk for training.

Trainers consume fixed-length token windows; the corpus is
variable-length documents.  The standard bridge is *concat-and-chunk*:
lay documents end-to-end in a deterministic order and cut every
``budget`` tokens.  This operator computes the packing PLAN — for each
document its shard, byte-0 token offset in the shard's virtual stream,
the pack (training sequence) its first token lands in, and whether it
straddles a pack boundary (the chunker will split it) — without
materializing any concatenated text.

Scale shape:

* Documents are hashed into ``n_shards`` independent streams (pure
  function of ``(seed, id)`` via the portable md5 family, like
  ``operators/sampling.py``).  The ONLY exchange is the hash partition
  by shard; each shard's running token sum is a window over
  ~corpus/n_shards rows — no global sort, no single-reducer prefix
  sum.  At 100 TB you raise ``n_shards``; the plan shape is unchanged.
* Offsets come from one ``sum() OVER (PARTITION BY shard ORDER BY
  order_key)`` running total; pack ids are integer division on the
  already-long offsets (no float math — exact at any corpus size).
* Deterministic: the full plan is a pure function of ``(seed, ids,
  token counts)`` — rerunning on any cluster size or partitioning
  yields byte-identical assignments, and the DuckDB twin
  (:func:`pack_plan_sql`) reproduces it bit-for-bit.  (Adding new
  documents shifts offsets *after* the insertion points within a
  shard — inherent to packing, unlike membership-style sampling.)

Reference analogue: none (the reference is a CDC connector); this is
the corpus→training-sequence step of the pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from debezium_connector_db2_spark.functions.hashing import seeded, seeded_sql
from debezium_connector_db2_spark.functions.text import (
    ws_token_count,
    ws_token_count_sql,
)


def pack_plan(
    df: DataFrame,
    id_col: str,
    text_col: str | None = None,
    token_col: str | None = None,
    budget: int = 2048,
    n_shards: int = 256,
    seed: int = 0,
) -> DataFrame:
    """Packing plan: ``(id_col, n_tokens, shard, start_offset, pack_id,
    spans_boundary)``.

    Token counts come from ``token_col`` if given, else the whitespace
    tokenizer over ``text_col`` (``functions/text.py:ws_token_count`` —
    swap in a real tokenizer's counts via ``token_col`` without
    touching the plan math).  ``pack_id`` is shard-local; the global
    training-sequence id is the pair ``(shard, pack_id)``.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if (text_col is None) == (token_col is None):
        raise ValueError("pass exactly one of text_col / token_col")
    ids = F.col(id_col).cast("string")
    n_tokens = (F.col(token_col).cast("long") if token_col
                else ws_token_count(F.col(text_col)).cast("long"))
    base = df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        (seeded(ids, seed) % n_shards).alias("shard"),
        seeded(ids, seed + 1).alias("__ok"),
    )
    w = (Window.partitionBy("shard")
         .orderBy("__ok", id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    end = F.sum("n_tokens").over(w)
    return (
        base.withColumn("__end", end)
        .select(
            F.col(id_col),
            "n_tokens",
            "shard",
            (F.col("__end") - F.col("n_tokens")).alias("start_offset"),
            F.expr(f"(__end - n_tokens) div {int(budget)}").alias("pack_id"),
            (
                (F.col("n_tokens") > 0)
                & (F.expr(f"(__end - n_tokens) div {int(budget)}")
                   != F.expr(f"(__end - 1) div {int(budget)}"))
            ).alias("spans_boundary"),
        )
    )


def pack_plan_sql(
    table: str,
    id_expr: str,
    text_expr: str | None = None,
    token_expr: str | None = None,
    budget: int = 2048,
    n_shards: int = 256,
    seed: int = 0,
) -> str:
    """DuckDB query mirroring :func:`pack_plan` exactly (same hashes,
    same running sum, same integer division)."""
    if (text_expr is None) == (token_expr is None):
        raise ValueError("pass exactly one of text_expr / token_expr")
    ids = f"CAST({id_expr} AS VARCHAR)"
    nt = (f"CAST({token_expr} AS BIGINT)" if token_expr
          else f"CAST({ws_token_count_sql(text_expr)} AS BIGINT)")
    return f"""
        WITH t AS (
          SELECT {id_expr} AS id,
                 {nt} AS n_tokens,
                 ({seeded_sql(ids, seed)}) % {n_shards} AS shard,
                 {seeded_sql(ids, seed + 1)} AS ok
          FROM {table}),
        w AS (
          SELECT id, n_tokens, shard,
                 sum(n_tokens) OVER (
                   PARTITION BY shard ORDER BY ok, id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS fin
          FROM t)
        SELECT id AS {id_expr}, n_tokens, shard,
               fin - n_tokens AS start_offset,
               (fin - n_tokens) // {int(budget)} AS pack_id,
               (n_tokens > 0 AND
                (fin - n_tokens) // {int(budget)} <> (fin - 1) // {int(budget)})
                 AS spans_boundary
        FROM w
    """
