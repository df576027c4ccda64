"""Verbatim-span (exact-substring) dedup — Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better".

Finds document pairs sharing a verbatim run of ≥ ``k`` tokens and
reports the longest shared span per pair.  The paper's suffix-array
construction is a single-machine algorithm; the distributed shape here
is positional window hashing: every ``k``-token window (stride 1)
becomes one ``(doc, pos, hash)`` row, pairs collide on the window hash
(an inverted-index equi-join — never all-pairs), and shared spans are
recovered by chaining collisions along join *diagonals*: windows of a
shared run satisfy ``pos_a - pos_b = const`` with consecutive ``pos_a``,
so per-(pair, diagonal) streaks of consecutive positions are exactly
the maximal shared runs (streak of ``m`` windows == ``m + k - 1``
shared tokens).

Scale shape (100 TB):

* window explode is O(tokens) rows — the same order as the MinHash
  shingle pass (``dedup_text.py``); hashes are md5 prefixes, computed
  once per window via the zip-with positional k-gram build (no
  per-element re-evaluation of the split — see
  ``functions/text.py:word_shingles``).
* the only join is the window-hash equi-join.  Boilerplate windows
  (headers, license blocks) are the skew hazard: ``max_df`` drops
  window hashes occurring in more than that many documents, opt-in
  and reported via ``drop_stats`` (the ``dedup_text`` cap contract —
  never a silent default).
* streak chaining is one window function over ``(a, b, diag)`` groups
  — partitions bounded by per-pair collision counts, not the corpus.

Tokenization matches ``word_shingles`` (trim + ``\\s+`` split) so span
lengths are in the same token units as the Jaccard family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _positional_grams(col: Column, k: int) -> Column:
    """Array of ALL k-token windows in order (index i = window starting
    at token i) — ``word_shingles`` minus the distinct."""
    toks = F.split(F.trim(col), r"\s+")
    n = F.size(toks)
    acc = toks
    for j in range(1, k):
        shifted = F.slice(toks, j + 1, F.greatest(n - j, F.lit(0)))
        acc = F.zip_with(acc, shifted,
                         lambda x, y: F.concat(x, F.lit(" "), y))
    return F.slice(acc, 1, F.greatest(n - (k - 1), F.lit(0)))


def window_hashes(docs: DataFrame, id_col: str, text_col: str,
                  k: int = 8) -> DataFrame:
    """``(id_col, pos, wh)``: md5 of every k-token window, stride 1,
    0-based ``pos``."""
    return (docs.select(
        F.col(id_col),
        F.posexplode(_positional_grams(F.col(text_col), k))
         .alias("pos", "gram"))
        .select(id_col, "pos", F.md5(F.col("gram")).alias("wh")))


def substring_pairs(docs: DataFrame, id_col: str, text_col: str,
                    k: int = 8, min_span: int | None = None,
                    max_df: int | None = None,
                    drop_stats: dict | None = None) -> DataFrame:
    """Pairs ``(id_a, id_b, max_span, n_windows)`` with ``id_a <
    id_b``: longest verbatim shared token run (≥ ``min_span``,
    default ``k``) and the total number of colliding windows.

    ``max_df`` (opt-in) drops window hashes present in more than that
    many documents before the join; pass ``drop_stats={}`` to receive
    ``{"dropped_window_hashes": n}``.
    """
    min_span = k if min_span is None else min_span
    w = window_hashes(docs, id_col, text_col, k)
    if max_df is not None:
        df_counts = (w.groupBy("wh")
                     .agg(F.count_distinct(id_col).alias("__df")))
        if drop_stats is not None:
            drop_stats["dropped_window_hashes"] = (
                df_counts.where(F.col("__df") > max_df).count())
        keep = df_counts.where(F.col("__df") <= max_df).select("wh")
        w = w.join(keep, "wh", "left_semi")
    a = w.select(F.col(id_col).alias("a"), F.col("pos").alias("pa"), "wh")
    b = w.select(F.col(id_col).alias("b"), F.col("pos").alias("pb"), "wh")
    # no distinct needed: each (doc, pos) emits exactly one window row,
    # so (a, b, pa, pb) combinations out of the equi-join are already
    # unique — a distinct here would be a pure extra exchange of the
    # hit set
    hits = (a.join(b, "wh")
            .where(F.col("a") < F.col("b"))
            .select("a", "b", "pa", "pb"))
    # windows of one shared run share the diagonal pa-pb and have
    # consecutive pa: streak id = pa - row_number is constant per run
    diag = hits.withColumn("diag", F.col("pa") - F.col("pb"))
    rn = F.row_number().over(
        Window.partitionBy("a", "b", "diag").orderBy("pa"))
    runs = (diag.withColumn("grp", F.col("pa") - rn)
            .groupBy("a", "b", "diag", "grp")
            .agg(F.count("*").alias("__m")))
    return (runs.groupBy("a", "b")
            .agg((F.max("__m") + F.lit(k - 1)).alias("max_span"),
                 F.sum("__m").alias("n_windows"))
            .where(F.col("max_span") >= min_span)
            .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"),
                    "max_span", "n_windows"))


def substring_pairs_sql(table: str, id_col: str, text_col: str,
                        k: int = 8, min_span: int | None = None) -> str:
    """DuckDB twin of :func:`substring_pairs` (uncapped): identical
    tokenization, window hashing, diagonal streak chaining."""
    min_span = k if min_span is None else min_span
    return f"""
        WITH toks AS (
          SELECT {id_col} AS id,
                 string_split_regex(trim({text_col}), '\\s+') AS t
          FROM {table}
        ),
        win AS (
          SELECT id, i - 1 AS pos,
                 md5(array_to_string(t[i:i+{k - 1}], ' ')) AS wh
          FROM toks, LATERAL (
            SELECT unnest(range(1, greatest(len(t) - {k - 1}, 0) + 1)) AS i)
        ),
        hits AS (
          SELECT a.id AS a, b.id AS b, a.pos AS pa, b.pos AS pb
          FROM win a JOIN win b USING (wh) WHERE a.id < b.id
        ),
        runs AS (
          SELECT a, b, count(*) AS m
          FROM (
            SELECT a, b, pa - pb AS diag, pa,
                   pa - row_number() OVER (
                     PARTITION BY a, b, pa - pb ORDER BY pa) AS grp
            FROM hits)
          GROUP BY a, b, diag, grp
        )
        SELECT a AS id_a, b AS id_b,
               CAST(max(m) + {k - 1} AS BIGINT) AS max_span,
               CAST(sum(m) AS BIGINT) AS n_windows
        FROM runs GROUP BY a, b
        HAVING max(m) + {k - 1} >= {min_span}
    """
