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

from debezium_connector_db2_spark.functions.caching import pin_for_result


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


def _span_runs(docs: DataFrame, id_col: str, text_col: str, k: int,
               max_df: int | None,
               drop_stats: dict | None) -> tuple[DataFrame, DataFrame]:
    """Maximal shared runs ``(a, b, diag, __m, __pa0)`` — a < b, run of
    ``__m`` colliding windows (== ``__m + k - 1`` shared tokens)
    starting at window ``__pa0`` of doc ``a`` (and ``__pa0 - diag`` of
    doc ``b``).  Shared by :func:`substring_pairs` (pair reporting) and
    :func:`substring_scrub` (span removal).  Returns ``(runs, w)`` —
    ``w`` is the persisted window-hash frame; the caller pins it to its
    result (both sides of the window-hash self-join, plus the df-cap
    count when ``max_df`` is set, would otherwise each re-run the
    tokenize + k-gram zip_with chain + per-window md5)."""
    w = window_hashes(docs, id_col, text_col, k).persist()
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
    return (diag.withColumn("grp", F.col("pa") - rn)
            .groupBy("a", "b", "diag", "grp")
            .agg(F.count("*").alias("__m"),
                 F.min("pa").alias("__pa0"))), w


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
    runs, w = _span_runs(docs, id_col, text_col, k, max_df, drop_stats)
    return pin_for_result(
        (runs.groupBy("a", "b")
         .agg((F.max("__m") + F.lit(k - 1)).alias("max_span"),
              F.sum("__m").alias("n_windows"))
         .where(F.col("max_span") >= min_span)
         .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"),
                 "max_span", "n_windows")), w)


def substring_scrub(docs: DataFrame, id_col: str, text_col: str,
                    k: int = 8, min_span: int | None = None,
                    max_df: int | None = None,
                    drop_stats: dict | None = None) -> DataFrame:
    """Verbatim-span REMOVAL (the action Lee et al. 2021 take on the
    spans :func:`substring_pairs` finds): every maximal token run of
    ``>= min_span`` tokens that duplicates content of a SMALLER-id
    document is deleted from the larger-id document; the earlier
    document keeps its copy.  Returns every doc as
    ``(id_col, n_removed, clean_text)``.

    Distributed shape: the span set reuses the window-hash equi-join
    (never all-pairs); overlapping spans are merged per doc with one
    window over the (small) span list; removal itself is a pure
    zero-shuffle projection — a nested higher-order filter drops token
    ``i`` iff a merged interval covers it (no token-level join, no
    Python).  Both engines evaluate the same lambda semantics, so the
    DuckDB twin (:func:`substring_scrub_sql`) is byte-identical on
    ``clean_text``.
    """
    min_span = k if min_span is None else min_span
    runs, w = _span_runs(docs, id_col, text_col, k, max_df, drop_stats)
    # DISTINCT is load-bearing: different partner docs produce the SAME
    # (id, s, e) span, and duplicate sort keys make the two island
    # windows below order ties differently between passes/engines —
    # observed merging [0,8) and [9,17) into [0,17).  Distinct spans
    # give the windows a total order.
    spans = (runs.where(F.col("__m") + F.lit(k - 1) >= min_span)
             .select(F.col("b").alias("__id"),
                     (F.col("__pa0") - F.col("diag")).cast("long")
                     .alias("s"),
                     (F.col("__pa0") - F.col("diag") + F.col("__m")
                      + F.lit(k - 1)).cast("long").alias("e"))
             .distinct())
    # merge overlapping/adjacent intervals: island = run of spans whose
    # start is <= the max end seen so far (one window over per-doc
    # spans — bounded by spans per doc, not the corpus)
    wd = Window.partitionBy("__id").orderBy("s", "e")
    prev_max = F.max("e").over(
        wd.rowsBetween(Window.unboundedPreceding, -1))
    isl = (spans.withColumn(
        "__new", F.when(prev_max.isNull() | (F.col("s") > prev_max),
                        F.lit(1)).otherwise(F.lit(0))))
    merged = (isl.withColumn(
        "__g", F.sum("__new").over(
            wd.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("__id", "__g")
        .agg(F.min("s").alias("s"), F.max("e").alias("e")))
    iv = merged.groupBy("__id").agg(
        F.collect_list(F.struct("s", "e")).alias("__iv"))
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    kept = F.filter(
        toks,
        lambda x, i: ~F.exists(
            F.col("__iv"),
            lambda v: (i >= v.getField("s")) & (i < v.getField("e"))))
    out = (docs.join(iv, docs[id_col] == iv["__id"], "left")
           .select(F.col(id_col),
                   F.when(F.col("__iv").isNull(), toks)
                   .otherwise(kept).alias("__kept"),
                   F.size(toks).alias("__n")))
    return pin_for_result(out.select(
        id_col,
        (F.col("__n") - F.size("__kept")).cast("long")
        .alias("n_removed"),
        F.array_join("__kept", " ").alias("clean_text")), w)


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


def substring_scrub_sql(table: str, id_col: str, text_col: str,
                        k: int = 8, min_span: int | None = None) -> str:
    """DuckDB twin of :func:`substring_scrub` (uncapped): identical
    runs, interval merging, and nested-lambda token removal (DuckDB
    lambda indexes are 1-based — offset applied)."""
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
          SELECT a, b, diag, min(pa) AS pa0, count(*) AS m
          FROM (
            SELECT a, b, pa - pb AS diag, pa,
                   pa - row_number() OVER (
                     PARTITION BY a, b, pa - pb ORDER BY pa) AS grp
            FROM hits)
          GROUP BY a, b, diag, grp
        ),
        spans AS (
          -- DISTINCT: duplicate (id, s, e) rows from different partner
          -- docs break the island windows' tie order (see Spark side)
          SELECT DISTINCT b AS id, CAST(pa0 - diag AS BIGINT) AS s,
                 CAST(pa0 - diag + m + {k - 1} AS BIGINT) AS e
          FROM runs WHERE m + {k - 1} >= {min_span}
        ),
        ord AS (
          SELECT id, s, e,
                 max(e) OVER (PARTITION BY id ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS pm
          FROM spans
        ),
        isl AS (
          SELECT id, s, e,
                 sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
                   OVER (PARTITION BY id ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS g
          FROM ord
        ),
        merged AS (
          SELECT id, min(s) AS s, max(e) AS e FROM isl GROUP BY id, g
        ),
        iv AS (
          SELECT id, list({{'s': s, 'e': e}}) AS iv
          FROM merged GROUP BY id
        ),
        cleaned AS (
          SELECT t.id, t.t,
                 CASE WHEN iv.iv IS NULL THEN t.t
                      ELSE list_filter(t.t, (x, i) ->
                        len(list_filter(iv.iv, v ->
                          (i - 1) >= v.s AND (i - 1) < v.e)) = 0)
                 END AS kept
          FROM toks t LEFT JOIN iv ON iv.id = t.id
        )
        SELECT id AS {id_col},
               CAST(len(t) - len(kept) AS BIGINT) AS n_removed,
               -- coalesce: DuckDB's array_to_string([]) is NULL while
               -- Spark's array_join([]) is '' — a fully-scrubbed doc
               -- must read as the empty string on both sides
               coalesce(array_to_string(kept, ' '), '') AS clean_text
        FROM cleaned
    """
