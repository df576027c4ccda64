"""Unigram language-model quality scoring (CCNet-style perplexity
filter).

The standard web-corpus quality gate after rule-based filtering is an
LM score: train a language model on the corpus (or a trusted slice of
it), score every document by average negative log-likelihood, and
drop/bucket the tail (CCNet, Wenzek et al. 2020; reused by LLaMA,
RedPajama, FineWeb).  The full KenLM 5-gram is out of scope for a
SQL-comparable oracle; this is the distributed *shape* with a unigram
model — swap the vocabulary frame for externally-trained n-gram
log-probs and the plan is unchanged.

Scale shape (100 TB):

* **Train**: one map-side-combined ``groupBy(word)`` — shuffle volume
  is bounded by the vocabulary per partition, not the corpus.  The
  ``(total_tokens, vocab_size)`` scalars are a two-value collect off
  the (tiny) counts frame.  ``max_vocab`` caps the table (rank by
  count desc, word asc — deterministic ties) so the score-side join
  stays broadcastable; out-of-vocabulary tokens take the smoothed
  floor probability.
* **Score**: explode → **broadcast** hash join against the vocabulary
  → ``groupBy(doc_id)`` with map-side partial sums (one row per doc
  per partition reaches the exchange).  The corpus never shuffles by
  word on the scoring side.

Cross-engine determinism: per-word log-probs are quantized to integer
deci-milli-nats (``round(ln(p)·10⁴)`` as BIGINT) *before* the per-doc
sum — long addition is exact and commutative, so the result is
independent of Spark's partition/row order and bit-comparable with the
DuckDB oracle (float summation order would not be).  ``ln`` is the
only non-IEEE-exact op and it is quantized at 1e-4 immediately.

Reference analogue: none (the reference is a CDC connector); the
quality-gate seat mirrors ``operators/quality.py`` (Gopher rules).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F

#: Quantization scale for per-word log-probs (deci-milli-nats).
LP_SCALE = 10_000


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return (docs.select(F.col(id_col),
                        F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                          r"\s+")).alias("word"))
            .where(F.col("word") != ""))


def unigram_vocab(docs: DataFrame, text_col: str, id_col: str,
                  max_vocab: Optional[int] = None,
                  alpha: float = 1.0) -> tuple[DataFrame, int]:
    """Train the unigram table: ``(word, lp_u)`` with add-``alpha``
    smoothed log-probs quantized to ``LP_SCALE`` (BIGINT), plus the
    quantized OOV floor ``lp = ln(alpha / (N + alpha*(V+1)))``.

    With ``max_vocab``, keeps the top-``max_vocab`` words (count desc,
    word asc); the dropped tail scores as OOV.  Smoothing denominators
    are computed over the FULL vocabulary before capping, so the model
    is the same distribution merely truncated, and adding capacity
    never changes retained words' scores.
    """
    counts = (_tokens(docs, id_col, text_col)
              .groupBy("word").agg(F.count("*").alias("c")))
    n_total, v_size = counts.agg(
        F.sum("c"), F.count("*")).collect()[0]
    denom = float(n_total) + alpha * (float(v_size) + 1.0)
    if max_vocab is not None:
        counts = (counts.orderBy(F.col("c").desc(), F.col("word"))
                  .limit(int(max_vocab)))
    vocab = counts.select(
        "word",
        F.round(F.log((F.col("c") + F.lit(alpha)) / F.lit(denom))
                * F.lit(LP_SCALE)).cast("long").alias("lp_u"),
    )
    import math
    # half-away-from-zero to match F.round / DuckDB round (Python's
    # round() is half-even); the argument is always negative
    x = math.log(alpha / denom) * LP_SCALE
    oov_u = -int(math.floor(-x + 0.5))
    return vocab, oov_u


def lm_score(docs: DataFrame, id_col: str, text_col: str,
             vocab: Optional[DataFrame] = None,
             oov_lp_u: Optional[int] = None,
             max_vocab: Optional[int] = None,
             alpha: float = 1.0) -> DataFrame:
    """Per-document ``(id_col, n_tokens, avg_nll)`` — average negative
    log-likelihood in nats under the unigram model (lower = more
    typical of the training slice; CCNet buckets on exactly this).

    ``vocab``/``oov_lp_u`` default to a model trained on ``docs``
    itself; pass a table trained on a trusted slice for the real CCNet
    setup (the plan is identical — the model side is broadcast either
    way).
    """
    if vocab is None:
        vocab, oov_lp_u = unigram_vocab(docs, text_col, id_col,
                                        max_vocab=max_vocab, alpha=alpha)
    elif oov_lp_u is None:
        raise ValueError(
            "lm_score: an external vocab requires its oov_lp_u (both are "
            "returned by unigram_vocab) — without the matching OOV floor, "
            "out-of-vocabulary tokens would score as NULL")
    toks = _tokens(docs, id_col, text_col)
    scored = (toks.join(F.broadcast(vocab), "word", "left")
              .groupBy(id_col)
              .agg(F.sum(F.coalesce(F.col("lp_u"),
                                    F.lit(int(oov_lp_u)))).alias("__s"),
                   F.count("*").alias("n_tokens")))
    return scored.select(
        id_col, "n_tokens",
        F.round(-F.col("__s") / (F.lit(float(LP_SCALE)) * F.col("n_tokens")),
                4).alias("avg_nll"))


def lm_score_sql(table: str, id_col: str, text_col: str,
                 alpha: float = 1.0) -> str:
    """DuckDB twin of :func:`lm_score` (self-trained, uncapped vocab):
    identical tokenization, smoothing, quantization, and rounding."""
    return f"""
        WITH toks AS (
          SELECT {id_col}, unnest(string_split_regex(
                   lower(trim({text_col})), '\\s+')) AS word
          FROM {table}
        ), toks_f AS (SELECT * FROM toks WHERE word != ''),
        counts AS (SELECT word, count(*) AS c FROM toks_f GROUP BY word),
        stats AS (SELECT sum(c) AS n, count(*) AS v FROM counts),
        vocab AS (
          SELECT word,
                 CAST(round(ln((c + {alpha}) / (n + {alpha} * (v + 1.0)))
                            * {LP_SCALE}) AS BIGINT) AS lp_u
          FROM counts, stats)
        SELECT t.{id_col}, count(*) AS n_tokens,
               round(-sum(v.lp_u) / ({LP_SCALE}.0 * count(*)), 4) AS avg_nll
        FROM toks_f t JOIN vocab v USING (word)
        GROUP BY t.{id_col}
    """


def ccnet_buckets(docs: DataFrame, id_col: str, text_col: str,
                  lang_col: Optional[str] = None,
                  fractions: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
                  vocab: Optional[DataFrame] = None,
                  oov_lp_u: Optional[int] = None,
                  max_vocab: Optional[int] = None,
                  alpha: float = 1.0) -> DataFrame:
    """CCNet corpus partitioning: split every (language's) documents
    into ``head`` / ``middle`` / ``tail`` by LM score (Wenzek et al.
    2020 §4.4 — CCNet keeps the low-perplexity head as the quality
    slice; LLaMA/RedPajama reuse the same split).

    Scale shape (100 TB): the naive split is a per-language
    ``percent_rank`` — a **global sort of the corpus**.  This operator
    instead exploits that :func:`lm_score` quantizes ``avg_nll`` to 4
    decimals: it aggregates a per-``(lang, avg_nll)`` **histogram**
    (map-side combined; the exchange is bounded by distinct quantized
    scores, not documents), derives the cumulative-fraction cutoffs
    with a window over that tiny frame, and **broadcast**-joins the
    bucket labels back.  The corpus itself never sorts and never
    shuffles beyond :func:`lm_score`'s own per-doc aggregate.

    Tie groups move together: every doc sharing a quantized score gets
    one bucket (the one its inclusive cumulative fraction lands in),
    so the split is deterministic and partition-order-independent at
    the cost of fractions being approximate at tie boundaries.

    Returns ``(id_col[, lang_col], n_tokens, avg_nll, bucket)``.
    """
    f1, f2 = float(fractions[0]), float(fractions[1])
    if not 0.0 < f1 < f2 < 1.0:
        raise ValueError(
            f"ccnet_buckets: fractions must satisfy 0 < f1 < f2 < 1, "
            f"got {fractions!r}")
    scored = lm_score(docs, id_col, text_col, vocab=vocab,
                      oov_lp_u=oov_lp_u, max_vocab=max_vocab, alpha=alpha)
    if lang_col is None:
        scored = scored.withColumn("__lang", F.lit(""))
    else:
        scored = scored.join(
            docs.select(id_col, F.col(lang_col).alias("__lang")), id_col)
    hist = (scored.groupBy("__lang", "avg_nll")
            .agg(F.count("*").alias("__c")))
    w_cum = (Window.partitionBy("__lang").orderBy("avg_nll")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_tot = Window.partitionBy("__lang")
    cuts = hist.select(
        "__lang", "avg_nll",
        F.sum("__c").over(w_cum).alias("__cum"),
        F.sum("__c").over(w_tot).alias("__tot"))
    labels = cuts.select(
        "__lang", "avg_nll",
        F.when(F.col("__cum") <= F.lit(f1) * F.col("__tot"), "head")
        .when(F.col("__cum") <= F.lit(f2) * F.col("__tot"), "middle")
        .otherwise("tail").alias("bucket"))
    out = scored.join(F.broadcast(labels), ["__lang", "avg_nll"])
    cols = [F.col(id_col)]
    if lang_col is not None:
        cols.append(F.col("__lang").alias(lang_col))
    return out.select(*cols, "n_tokens", "avg_nll", "bucket")


def ccnet_buckets_sql(table: str, id_col: str, text_col: str,
                      lang_col: str,
                      fractions: tuple[float, float] = (1.0 / 3.0,
                                                        2.0 / 3.0),
                      alpha: float = 1.0) -> str:
    """DuckDB twin of :func:`ccnet_buckets` (self-trained, uncapped
    vocab, per-``lang_col`` split): identical score quantization,
    histogram cutoffs, and tie handling.  Fraction literals are
    interpolated at full ``repr`` precision so the IEEE comparisons
    match Spark bit-for-bit."""
    f1, f2 = repr(float(fractions[0])), repr(float(fractions[1]))
    return f"""
        WITH toks AS (
          SELECT {id_col}, unnest(string_split_regex(
                   lower(trim({text_col})), '\\s+')) AS word
          FROM {table}
        ), toks_f AS (SELECT * FROM toks WHERE word != ''),
        counts AS (SELECT word, count(*) AS c FROM toks_f GROUP BY word),
        stats AS (SELECT sum(c) AS n, count(*) AS v FROM counts),
        vocab AS (
          SELECT word,
                 CAST(round(ln((c + {alpha}) / (n + {alpha} * (v + 1.0)))
                            * {LP_SCALE}) AS BIGINT) AS lp_u
          FROM counts, stats),
        scored AS (
          SELECT t.{id_col}, count(*) AS n_tokens,
                 round(-sum(v.lp_u) / ({LP_SCALE}.0 * count(*)), 4)
                   AS avg_nll
          FROM toks_f t JOIN vocab v USING (word)
          GROUP BY t.{id_col}),
        langd AS (
          SELECT s.*, d.{lang_col} AS __lang
          FROM scored s JOIN {table} d USING ({id_col})),
        hist AS (
          SELECT __lang, avg_nll, count(*) AS c
          FROM langd GROUP BY __lang, avg_nll),
        cuts AS (
          SELECT __lang, avg_nll,
                 sum(c) OVER (PARTITION BY __lang ORDER BY avg_nll
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum,
                 sum(c) OVER (PARTITION BY __lang) AS tot
          FROM hist),
        labels AS (
          SELECT __lang, avg_nll,
                 CASE WHEN cum <= {f1} * tot THEN 'head'
                      WHEN cum <= {f2} * tot THEN 'middle'
                      ELSE 'tail' END AS bucket
          FROM cuts)
        SELECT l.{id_col}, l.__lang AS {lang_col}, l.n_tokens,
               l.avg_nll, b.bucket
        FROM langd l JOIN labels b USING (__lang, avg_nll)
    """
