"""Benchmark decontamination — drop training documents that overlap an
evaluation/benchmark set.

The standard pre-training hygiene pass (GPT-3 §C / PaLM-style n-gram
collision): a training document is *contaminated* when it shares at
least ``min_hits`` distinct k-word shingles with ANY document of the
eval set.  Published pipelines use k around 13 on whole benchmarks;
both k and the hit floor are parameters here.

Scale shape (the reason this is its own operator and not "a join"):

* The eval side is a benchmark — MBs, not TBs.  Its distinct shingle
  set is built once and **broadcast**, so the 100-TB training side is
  probed partition-locally: no shuffle of the big side to find hits.
* The training side is one projection + explode of per-document
  distinct shingles (``word_shingles`` is ``array_distinct``, O(n·k)
  zip_with work per row, no UDF) feeding the broadcast hash join.
* The only exchange is the per-doc hit-count groupBy, whose input is
  already filtered to matching shingles — bounded by contamination
  volume, not corpus volume.
* ``decontaminate`` removes flagged ids with a left-anti join; the
  flagged set is a projection of the report (ids only).

Reference analogue: none (the reference is a CDC connector); this is
the eval-leakage guard every training-data pipeline needs.  The DuckDB
oracle twin is assembled in ``__spark_entry__.py`` from
``functions/text.py:word_shingles_sql`` — same shingling, same
normalization, same hit floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from debezium_connector_db2_spark.functions.text import word_shingles


def _shingles(col, k: int, normalize: bool):
    src = F.lower(col) if normalize else col
    return word_shingles(src, k)


def contamination_report(
    train: DataFrame,
    id_col: str,
    text_col: str,
    eval_df: DataFrame,
    eval_text_col: str | None = None,
    k: int = 13,
    min_hits: int = 1,
    normalize: bool = True,
) -> DataFrame:
    """Per contaminated training doc: ``(id_col, n_hits)`` where
    ``n_hits`` counts DISTINCT k-shingles shared with the eval set
    (per-doc shingles are already distinct).  Docs with
    ``n_hits < min_hits`` are not reported.

    ``normalize=True`` lower-cases both sides before shingling so case
    variants still collide (tokenization stays whitespace, matching the
    rest of the text family and the SQL twin).
    """
    if min_hits < 1:
        raise ValueError("min_hits must be >= 1")
    ev_col = eval_text_col or text_col
    ev = (
        eval_df.select(
            F.explode(_shingles(F.col(ev_col), k, normalize)).alias("shingle"))
        .distinct()
    )
    tr = train.select(
        F.col(id_col),
        F.explode(_shingles(F.col(text_col), k, normalize)).alias("shingle"),
    )
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .where(F.col("n_hits") >= min_hits)
    )


def decontaminate(
    train: DataFrame,
    id_col: str,
    text_col: str,
    eval_df: DataFrame,
    eval_text_col: str | None = None,
    k: int = 13,
    min_hits: int = 1,
    normalize: bool = True,
) -> DataFrame:
    """The training set minus contaminated documents (left-anti join on
    the :func:`contamination_report` ids).  Column set is unchanged."""
    flagged = contamination_report(
        train, id_col, text_col, eval_df, eval_text_col,
        k=k, min_hits=min_hits, normalize=normalize,
    ).select(id_col)
    return train.join(flagged, id_col, "left_anti")
