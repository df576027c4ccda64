"""Document chunking with overlap — the context-window slicing step.

Retrieval indexes and long-context training both need documents cut
into fixed-size token windows with a configurable overlap (stride <
chunk size), keeping per-chunk provenance (doc id, chunk index, token
offsets).  This operator emits the chunk PLAN — one row per chunk with
exact token offsets — plus, optionally, the chunk text itself sliced
from the whitespace token array.

Scale shape: pure per-row work — a ``sequence`` + ``explode`` over each
document's chunk starts.  No shuffle, no window, no join; output size
is ``ceil((n_tokens - overlap) / stride)`` rows per doc.  At 100 TB the
operator runs at scan speed and parallelism is whatever the scan has.

Determinism: chunk boundaries are a pure function of the token count
(and the text itself for ``with_text``), so the DuckDB twin
(:func:`chunk_plan_sql`) reproduces the plan bit-for-bit.

Reference analogue: none (the reference is a CDC connector); this is
the corpus→retrieval/window step of the pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from debezium_connector_db2_spark.functions.text import ws_token_count


def chunk_plan(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    chunk_tokens: int = 256,
    overlap_tokens: int = 32,
    with_text: bool = False,
) -> DataFrame:
    """One row per chunk: ``(id_col, chunk_idx, start_token, end_token,
    n_tokens [, chunk_text])``.

    ``start_token`` is 0-based inclusive; ``end_token`` exclusive
    (``min(start + chunk_tokens, n_tokens)``).  Stride is
    ``chunk_tokens - overlap_tokens``; the last chunk may be short but
    is never empty; empty documents produce no rows.  Tokens are
    whitespace tokens (swap in a real tokenizer by pre-splitting and
    passing a token-count column through ``with_text=False`` math).
    """
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not (0 <= overlap_tokens < chunk_tokens):
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    t = F.trim(F.col(text_col))
    n = ws_token_count(F.col(text_col))
    # chunk starts: 0, stride, 2*stride, ... while start < n; when a
    # final window would add no NEW tokens (start+chunk <= prev end,
    # i.e. start >= n) it is not emitted
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.greatest(
            F.lit(1),
            F.ceil((n - F.lit(overlap_tokens))
                   / F.lit(stride)).cast("int")))
    base = df.select(
        F.col(id_col),
        n.alias("__n"),
        n_chunks.alias("__k"),
        *( [F.split(t, r"\s+").alias("__toks")] if with_text else [] ),
    ).where(F.col("__k") > 0)
    out = base.select(
        F.col(id_col),
        F.col("__n"),
        *( [F.col("__toks")] if with_text else [] ),
        F.explode(F.sequence(F.lit(0), F.col("__k") - 1)).alias("chunk_idx"),
    ).select(
        F.col(id_col),
        F.col("chunk_idx"),
        (F.col("chunk_idx") * stride).alias("start_token"),
        F.least(F.col("chunk_idx") * stride + chunk_tokens,
                F.col("__n")).alias("end_token"),
        F.col("__n").alias("n_tokens"),
        *( [F.col("__toks")] if with_text else [] ),
    )
    if with_text:
        out = out.withColumn(
            "chunk_text",
            F.concat_ws(
                " ",
                F.slice(F.col("__toks"),
                        F.col("start_token") + 1,
                        F.col("end_token") - F.col("start_token"))),
        ).drop("__toks")
    return out


def chunk_plan_sql(
    table: str,
    id_expr: str,
    text_expr: str = "text",
    chunk_tokens: int = 256,
    overlap_tokens: int = 32,
    with_text: bool = False,
) -> str:
    """DuckDB twin of :func:`chunk_plan` (same names, same boundaries)."""
    stride = chunk_tokens - overlap_tokens
    t = f"trim({text_expr})"
    n = (f"CASE WHEN {t} = '' THEN 0 "
         f"ELSE length(regexp_split_to_array({t}, '\\s+')) END")
    toks = f"regexp_split_to_array({t}, '\\s+')"
    text_base = f", {toks} AS __toks" if with_text else ""
    text_sel = (
        f", list_reduce(list_slice(__toks, start_token + 1, end_token),"
        f" (a, b) -> a || ' ' || b) AS chunk_text"
        if with_text else "")
    return f"""
    WITH base AS (
        SELECT {id_expr} AS id_key, {n} AS __n,
               CASE WHEN {n} <= 0 THEN 0
                    ELSE greatest(1, CAST(ceil(({n} - {overlap_tokens})
                              / CAST({stride} AS DOUBLE)) AS INT))
               END AS __k{text_base}
        FROM {table}
    ),
    chunks AS (
        SELECT id_key, __n,
               unnest(range(0, __k)) AS chunk_idx{
                   ', __toks' if with_text else ''}
        FROM base WHERE __k > 0
    )
    SELECT id_key AS {id_expr},
           CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(chunk_idx * {stride} AS INT) AS start_token,
           CAST(least(chunk_idx * {stride} + {chunk_tokens}, __n) AS INT)
               AS end_token,
           CAST(__n AS INT) AS n_tokens{text_sel}
    FROM chunks
    """
