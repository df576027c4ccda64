"""Corpus vocabulary building — top-k n-grams by document frequency.

The tokenizer-training precursor a large-scale text pipeline runs before
anything else: which grams exist, how many documents carry each, ranked.

Scale shape: one explode of per-document *distinct* shingles (so the
count is a document frequency, robust to within-doc repetition), one
map-side-combined groupBy count, and a ``TakeOrderedAndProject`` top-k
(``orderBy().limit()`` — each partition contributes only its local top-k
to the driver-side merge; there is never a global sort of the full gram
table).  The final rank window runs over at most ``top_k`` rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from debezium_connector_db2_spark.functions.text import word_shingles


def ngram_vocab(
    df: DataFrame, text_col: str,
    k: int = 1, top_k: int = 1000, min_df: int = 1,
) -> DataFrame:
    """Top ``top_k`` k-grams by document frequency.

    Returns (gram, df, rank), rank 1-based by (df desc, gram asc) — a
    deterministic total order, so the cutoff boundary is stable across
    engines and runs.  ``min_df`` drops hapax/noise grams before the
    top-k (the usual vocab floor).
    """
    grams = df.select(
        F.explode(word_shingles(F.col(text_col), k)).alias("gram"))
    counts = (grams.groupBy("gram")
              .agg(F.count(F.lit(1)).alias("df"))
              .where(F.col("df") >= min_df))
    top = counts.orderBy(F.desc("df"), F.asc("gram")).limit(top_k)
    w = Window.orderBy(F.desc("df"), F.asc("gram"))
    # the single-partition window is bounded by top_k rows — not a scale
    # concern (the heavy ordering happened in the TakeOrdered above)
    return top.withColumn("rank", F.row_number().over(w))
