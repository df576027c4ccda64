"""Gopher-style document quality filter — the standard pre-training gate.

Implements the published Gopher rule set (Rae et al. 2021, §A1.1; the
same family C4 / MassiveText / RefinedWeb pipelines apply) as pure
DataFrame expressions: per-document rule measurements plus a final
``passes`` verdict.  Zero shuffle — the whole operator is a codegen'd
projection over the scan, so it filters 100 TB at scan speed and
composes with any downstream operator (dedup, packing, sampling)
without adding an exchange.

Rules (all thresholds parameterized; defaults are Gopher's):

* word count within ``[min_words, max_words]``
* mean word length within ``[min_mean_word_len, max_mean_word_len]``
* symbol-to-word ratio (``#`` or ``...``) below ``max_symbol_ratio``
* fraction of lines starting with a bullet below ``max_bullet_ratio``
* fraction of lines ending with an ellipsis below ``max_ellipsis_ratio``
* fraction of words containing an alphabetic char at least
  ``min_alpha_word_ratio``
* at least ``min_required_hits`` distinct hits from ``required_words``
  (Gopher's "stop word" presence check: the, be, to, of, and, that,
  have, with)

Every measurement is emitted alongside the verdict so a pipeline can
re-threshold offline without re-scanning.  :func:`gopher_quality_sql`
renders the byte-identical DuckDB twin (shared regex subset of Java
regex and RE2 only).

Reference analogue: none (the reference is a CDC connector); this is
the corpus quality gate of the pipeline brief.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

#: Gopher's required-word list (§A1.1): a document failing to contain at
#: least 2 of these is overwhelmingly non-English or non-prose.
REQUIRED_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

_ROUND = 6


def _ratio(num: Column, den: Column) -> Column:
    """num/den as double, NULL-safe: 0.0 when the denominator is 0."""
    return F.when(den == 0, F.lit(0.0)).otherwise(
        F.round(num.cast("double") / den.cast("double"), _ROUND))


def _ratio_sql(num: str, den: str) -> str:
    return (f"CASE WHEN ({den}) = 0 THEN 0.0 "
            f"ELSE round(CAST({num} AS DOUBLE) / ({den}), {_ROUND}) END")


def _sql_quote(s: str) -> str:
    """Double embedded single quotes for a SQL string literal."""
    return s.replace("'", "''")


def gopher_quality(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_required_hits: int = 2,
    required_words: list[str] | None = None,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document Gopher measurements + ``passes`` verdict.

    Output: ``(id_col, n_words, mean_word_len, symbol_ratio,
    bullet_ratio, ellipsis_ratio, alpha_word_ratio, required_hits,
    passes)`` — one row per input row (filtering is the caller's
    ``.where("passes")``, so the measurements stay available for
    offline re-thresholding).  ``keep_cols`` passes extra input columns
    through the projection (e.g. the text itself for a downstream
    funnel stage) at zero cost — no join-back needed.
    """
    required = required_words if required_words is not None else REQUIRED_WORDS
    t = F.trim(F.col(text_col))
    empty = F.array().cast("array<string>")
    words = F.when(t == "", empty).otherwise(F.split(t, r"\s+"))
    n_words = F.size(words)
    # sum of word lengths == chars left after deleting all whitespace
    word_chars = F.length(F.regexp_replace(t, r"\s+", ""))
    mean_wl = _ratio(word_chars, n_words)
    n_symbols = F.size(F.regexp_extract_all(t, F.lit(r"#|\.\.\."), 0))
    lines = F.split(F.col(text_col), r"\n")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[-*]")))
    n_ellipsis = F.size(F.filter(lines, lambda x: x.rlike(r"\.\.\.\s*$")))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    # Words are matched literally: re.escape guards metacharacters in
    # custom required_words; seeding with lit(0) makes an empty list
    # yield required_hits = 0 rather than a null column.
    hits = F.lit(0)
    low = F.lower(t)
    for w in required:
        hit = F.when(low.rlike(rf"\b{re.escape(w)}\b"),
                     F.lit(1)).otherwise(F.lit(0))
        hits = hits + hit
    out = df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        _ratio(n_symbols, n_words).alias("symbol_ratio"),
        _ratio(n_bullet, n_lines).alias("bullet_ratio"),
        _ratio(n_ellipsis, n_lines).alias("ellipsis_ratio"),
        _ratio(n_alpha, n_words).alias("alpha_word_ratio"),
        hits.alias("required_hits"),
    )
    passes = (
        (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_ratio") <= max_bullet_ratio)
        & (F.col("ellipsis_ratio") <= max_ellipsis_ratio)
        & (F.col("alpha_word_ratio") >= min_alpha_word_ratio)
        & (F.col("required_hits") >= min_required_hits)
    )
    return out.withColumn("passes", passes)


def gopher_quality_sql(
    table: str,
    id_expr: str,
    text_expr: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_required_hits: int = 2,
    required_words: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`gopher_quality` (same names, same rounding)."""
    required = required_words if required_words is not None else REQUIRED_WORDS
    t = f"trim({text_expr})"
    words = (f"CASE WHEN {t} = '' THEN [] "
             f"ELSE regexp_split_to_array({t}, '\\s+') END")
    n_words = f"length({words})"
    word_chars = f"length(regexp_replace({t}, '\\s+', '', 'g'))"
    n_symbols = f"length(regexp_extract_all({t}, '#|\\.\\.\\.'))"
    lines = f"regexp_split_to_array({text_expr}, '\\n')"
    n_lines = f"length({lines})"
    n_bullet = (f"length(list_filter({lines}, "
                f"x -> regexp_matches(x, '^\\s*[-*]')))")
    n_ellipsis = (f"length(list_filter({lines}, "
                  f"x -> regexp_matches(x, '\\.\\.\\.\\s*$')))")
    n_alpha = (f"length(list_filter({words}, "
               f"w -> regexp_matches(w, '[A-Za-z]')))")
    # Mirror the Spark side's literal-word handling: regex-escape each
    # word, then double embedded quotes for the SQL string literal; the
    # "0 + " seed keeps an empty list valid SQL yielding 0 hits.
    hits = "0" + "".join(
        f" + CASE WHEN regexp_matches(lower({t}), "
        f"'\\b{_sql_quote(re.escape(w))}\\b') THEN 1 ELSE 0 END"
        for w in required)
    return f"""
    WITH m AS (
        SELECT {id_expr} AS id_key,
               {n_words} AS n_words,
               {_ratio_sql(word_chars, n_words)} AS mean_word_len,
               {_ratio_sql(n_symbols, n_words)} AS symbol_ratio,
               {_ratio_sql(n_bullet, n_lines)} AS bullet_ratio,
               {_ratio_sql(n_ellipsis, n_lines)} AS ellipsis_ratio,
               {_ratio_sql(n_alpha, n_words)} AS alpha_word_ratio,
               ({hits}) AS required_hits
        FROM {table}
    )
    SELECT id_key AS {id_expr},
           n_words, mean_word_len, symbol_ratio, bullet_ratio,
           ellipsis_ratio, alpha_word_ratio, required_hits,
           (n_words >= {min_words} AND n_words <= {max_words}
            AND mean_word_len >= {min_mean_word_len}
            AND mean_word_len <= {max_mean_word_len}
            AND symbol_ratio <= {max_symbol_ratio}
            AND bullet_ratio <= {max_bullet_ratio}
            AND ellipsis_ratio <= {max_ellipsis_ratio}
            AND alpha_word_ratio >= {min_alpha_word_ratio}
            AND required_hits >= {min_required_hits}) AS passes
    FROM m
    """
