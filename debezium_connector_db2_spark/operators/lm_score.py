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
DuckDB oracle (float summation order would not be).  The ``ln`` itself
goes through :func:`..functions.portable_math.portable_ln` (iterated
IEEE sqrt — bit-identical across engines; a 1-ulp libm difference can
flip the quantization) and the final per-doc average uses exact
integer half-away division (Spark's ``round(double, 4)`` rounds the
shortest decimal string, DuckDB rounds the binary value — they
disagree on exact ..xx5 averages).

Reference analogue: none (the reference is a CDC connector); the
quality-gate seat mirrors ``operators/quality.py`` (Gopher rules).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.caching import carry_pin, pin_for_result
from ..functions.portable_math import portable_ln, portable_ln_sql

#: Quantization scale for per-word log-probs (deci-milli-nats).
LP_SCALE = 10_000


def _tokens(docs: DataFrame, id_col: str, text_col: str,
            carry: list[str] | None = None) -> DataFrame:
    return (docs.select(F.col(id_col), *[F.col(c) for c in carry or []],
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
    # persist the word counts: the (N, V) scalar collect below and the
    # broadcast vocab build at score time are two consumers of the same
    # tokenize+groupBy — without the cache each pays its own full token
    # pass over the corpus.  The collect materializes the cache; the pin
    # is released when the caller drops the returned vocab frame (or the
    # result lm_score transfers it to — see carry_pin there).
    counts0 = (_tokens(docs, id_col, text_col)
               .groupBy("word").agg(F.count("*").alias("c"))).persist()
    n_total, v_size = counts0.agg(
        F.sum("c"), F.count("*")).collect()[0]
    denom = float(n_total) + alpha * (float(v_size) + 1.0)
    counts = counts0
    if max_vocab is not None:
        counts = (counts0.orderBy(F.col("c").desc(), F.col("word"))
                  .limit(int(max_vocab)))
    # portable_ln, NOT F.log: a 1-ulp JVM-vs-DuckDB ln() difference
    # flips the deci-milli-nat quantization across a .5 boundary
    # (observed on the NB classifier's hashed buckets) — the iterated-
    # IEEE-sqrt log is bit-identical across engines by construction.
    vocab = counts.select(
        "word",
        F.round(portable_ln((F.col("c") + F.lit(alpha)) / F.lit(denom))
                * F.lit(LP_SCALE)).cast("long").alias("lp_u"),
    )
    import math
    # half-away-from-zero to match F.round / DuckDB round (Python's
    # round() is half-even); the argument is always negative
    x = math.log(alpha / denom) * LP_SCALE
    oov_u = -int(math.floor(-x + 0.5))
    return pin_for_result(vocab, counts0), oov_u


def lm_score(docs: DataFrame, id_col: str, text_col: str,
             vocab: Optional[DataFrame] = None,
             oov_lp_u: Optional[int] = None,
             max_vocab: Optional[int] = None,
             alpha: float = 1.0,
             carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """Per-document ``(id_col[, carry_cols...], n_tokens, avg_nll)`` —
    average negative log-likelihood in nats under the unigram model
    (lower = more typical of the training slice; CCNet buckets on
    exactly this).

    ``vocab``/``oov_lp_u`` default to a model trained on ``docs``
    itself; pass a table trained on a trusted slice for the real CCNet
    setup (the plan is identical — the model side is broadcast either
    way).

    ``carry_cols`` rides per-doc attributes (e.g. the language column)
    through the existing per-doc aggregate by widening its grouping
    key — the attributes are functionally dependent on ``id_col``, so
    this is the same single shuffle, and downstream consumers avoid a
    corpus-sized re-join against ``docs``.
    """
    own_vocab = vocab is None
    if vocab is None:
        vocab, oov_lp_u = unigram_vocab(docs, text_col, id_col,
                                        max_vocab=max_vocab, alpha=alpha)
    elif oov_lp_u is None:
        raise ValueError(
            "lm_score: an external vocab requires its oov_lp_u (both are "
            "returned by unigram_vocab) — without the matching OOV floor, "
            "out-of-vocabulary tokens would score as NULL")
    carry = [c for c in carry_cols]
    toks = _tokens(docs, id_col, text_col, carry)
    scored = (toks.join(F.broadcast(vocab), "word", "left")
              .groupBy(id_col, *carry)
              .agg(F.sum(F.coalesce(F.col("lp_u"),
                                    F.lit(int(oov_lp_u)))).alias("__s"),
                   F.count("*").alias("n_tokens")))
    # avg_nll = round(-__s / (S·n), 4), but via EXACT integer half-away
    # division: Spark's round(double, 4) rounds the shortest decimal
    # string while DuckDB rounds the binary value — they disagree when
    # the average lands exactly on ..xx5 (observed).  -__s > 0 always
    # (every lp_u < 0), so no sign handling is needed.
    out = scored.select(
        id_col, *carry, "n_tokens",
        (F.expr("(2 * (-__s) + n_tokens) div (2 * n_tokens)")
         / F.lit(float(LP_SCALE))).alias("avg_nll"))
    # carry the vocab's word-count pin (see unigram_vocab) onto the
    # result so the broadcast vocab build at action time reads the cache
    # instead of re-running the tokenize+groupBy pass.  Only for a vocab
    # WE trained — an external vocab's pin (if any) belongs to the
    # caller, who may serve many score calls from it.
    return carry_pin(out, vocab) if own_vocab else out


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
        probs AS (
          SELECT word, (c + {alpha}) / (n + {alpha} * (v + 1.0)) AS p
          FROM counts, stats),
        vocab AS (
          SELECT word,
                 CAST(round({portable_ln_sql('p')}
                            * {LP_SCALE}) AS BIGINT) AS lp_u
          FROM probs)
        SELECT t.{id_col}, count(*) AS n_tokens,
               ((2 * (-sum(v.lp_u)) + count(*)) // (2 * count(*)))
                 / {LP_SCALE}.0 AS avg_nll
        FROM toks_f t JOIN vocab v USING (word)
        GROUP BY t.{id_col}
    """


def _validate_cuts(fractions) -> tuple[int, int, int, int]:
    """Validate ``((n1, d1), (n2, d2))`` rational cut points with
    ``0 < n1/d1 < n2/d2 < 1``.  Rationals, NOT floats: the cutoff test
    ``cum·d <= n·tot`` is then exact 64-bit integer arithmetic in both
    engines — a float ``cum <= f·tot`` hits real divergence (DuckDB
    parses a bare decimal literal as exact DECIMAL while Spark
    multiplies DOUBLEs; at ``tot=75, f=1/3`` the two sides of the
    boundary came out different — observed)."""
    try:
        (n1, d1), (n2, d2) = fractions
        n1, d1, n2, d2 = int(n1), int(d1), int(n2), int(d2)
    except (TypeError, ValueError):
        raise ValueError(
            f"ccnet_buckets: fractions must be two (numerator, "
            f"denominator) int pairs, got {fractions!r}")
    if not (d1 > 0 and d2 > 0 and 0 < n1 * d2 < n2 * d1 and n2 < d2):
        raise ValueError(
            f"ccnet_buckets: fractions must satisfy 0 < n1/d1 < n2/d2 "
            f"< 1, got {fractions!r}")
    return n1, d1, n2, d2


def ccnet_buckets(docs: DataFrame, id_col: str, text_col: str,
                  lang_col: Optional[str] = None,
                  fractions: tuple = ((1, 3), (2, 3)),
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

    ``fractions`` are rational ``(numerator, denominator)`` pairs (see
    :func:`_validate_cuts` for why floats are unsafe here); the bucket
    test is exact integer arithmetic: head iff ``cum·d1 <= n1·tot``.

    Returns ``(id_col[, lang_col], n_tokens, avg_nll, bucket)``.
    """
    n1, d1, n2, d2 = _validate_cuts(fractions)
    # lang rides lm_score's per-doc aggregate via carry_cols (same
    # single shuffle — lang is functionally dependent on the doc id);
    # re-joining the corpus-sized scored frame against docs just to
    # fetch lang would be a second corpus-wide exchange for nothing
    scored0 = lm_score(docs, id_col, text_col, vocab=vocab,
                       oov_lp_u=oov_lp_u, max_vocab=max_vocab, alpha=alpha,
                       carry_cols=() if lang_col is None else (lang_col,))
    if lang_col is None:
        scored = scored0.withColumn("__lang", F.lit(""))
    else:
        scored = scored0.withColumnRenamed(lang_col, "__lang")
    scored = carry_pin(scored, scored0)  # keep the vocab-counts pin
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
        F.when(F.col("__cum") * F.lit(d1) <= F.lit(n1) * F.col("__tot"),
               "head")
        .when(F.col("__cum") * F.lit(d2) <= F.lit(n2) * F.col("__tot"),
              "middle")
        .otherwise("tail").alias("bucket"))
    out = scored.join(F.broadcast(labels), ["__lang", "avg_nll"])
    cols = [F.col(id_col)]
    if lang_col is not None:
        cols.append(F.col("__lang").alias(lang_col))
    res = out.select(*cols, "n_tokens", "avg_nll", "bucket")
    # scored feeds two consumers — the histogram (via the broadcast
    # label build) and the final join — and each would otherwise re-run
    # the full lm_score pipeline (vocab train + broadcast + score pass).
    # Pin it for the result's lifetime; its own vocab-counts pin chains
    # along (carry_pin), released together when the caller drops res.
    res = pin_for_result(res, scored)
    return carry_pin(res, scored)


def ccnet_buckets_sql(table: str, id_col: str, text_col: str,
                      lang_col: str,
                      fractions: tuple = ((1, 3), (2, 3)),
                      alpha: float = 1.0) -> str:
    """DuckDB twin of :func:`ccnet_buckets` (self-trained, uncapped
    vocab, per-``lang_col`` split): identical score quantization,
    histogram cutoffs, and tie handling.  Cut points are integer
    rationals, so the bucket test is exact in both engines."""
    n1, d1, n2, d2 = _validate_cuts(fractions)
    return f"""
        WITH toks AS (
          SELECT {id_col}, unnest(string_split_regex(
                   lower(trim({text_col})), '\\s+')) AS word
          FROM {table}
        ), toks_f AS (SELECT * FROM toks WHERE word != ''),
        counts AS (SELECT word, count(*) AS c FROM toks_f GROUP BY word),
        stats AS (SELECT sum(c) AS n, count(*) AS v FROM counts),
        probs AS (
          SELECT word, (c + {alpha}) / (n + {alpha} * (v + 1.0)) AS p
          FROM counts, stats),
        vocab AS (
          SELECT word,
                 CAST(round({portable_ln_sql('p')}
                            * {LP_SCALE}) AS BIGINT) AS lp_u
          FROM probs),
        scored AS (
          SELECT t.{id_col}, count(*) AS n_tokens,
                 ((2 * (-sum(v.lp_u)) + count(*)) // (2 * count(*)))
                   / {LP_SCALE}.0 AS avg_nll
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
                 CASE WHEN cum * {d1} <= {n1} * tot THEN 'head'
                      WHEN cum * {d2} <= {n2} * tot THEN 'middle'
                      ELSE 'tail' END AS bucket
          FROM cuts)
        SELECT l.{id_col}, l.__lang AS {lang_col}, l.n_tokens,
               l.avg_nll, b.bucket
        FROM langd l JOIN labels b USING (__lang, avg_nll)
    """
