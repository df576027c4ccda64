"""Corpus filter funnel — the composed pre-training pipeline gate.

Real pipelines don't run quality rules, LM scoring, and dedup as
separate scans; they run one FUNNEL (C4 → CCNet → dedup order, as in
MassiveText/RefinedWeb/FineWeb) and record per-stage attrition.  This
operator chains the repo's gates over a single progressive frame:

1. ``quality`` — Gopher rules (``operators/quality.py``), a zero-shuffle
   projection; the text column rides along via ``keep_cols`` so no
   join-back against the corpus is ever needed.
2. ``lm`` — unigram LM score (``operators/lm_score.py``) **trained on
   the quality survivors** (the CCNet shape: the model sees cleaner
   text than the raw crawl); docs above ``max_avg_nll`` fail.
3. ``dup`` — exact-fingerprint first-occurrence dedup *among docs that
   survived both gates* (a duplicate of a rejected doc is not a
   duplicate; the keeper is the smallest id).

Output: one row per input doc — ``(id_col, verdict)`` with verdict ∈
``{'quality', 'lm', 'dup', 'kept'}`` naming the first failing stage.
``funnel_report`` folds it to per-stage attrition counts.

Scale notes: stage 1 is scan-speed; stage 2 adds the LM's two
aggregations (vocab-bounded word groupBy + per-doc partial-sum groupBy)
and one id-equi-join of survivors against their scores — co-partitioned
with the score groupBy's output, so AQE plans it without an extra
exchange of the corpus; stage 3 is one window over fingerprint groups
(group size = duplicate multiplicity).  Nothing is all-pairs, nothing
collects to the driver.

Reference analogue: none (CDC reference); pipeline-brief composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from debezium_connector_db2_spark.functions.caching import (
    carry_pin, pin_for_result, tie_lifetime)
from debezium_connector_db2_spark.functions.text import (
    fingerprint, fingerprint_sql)
from debezium_connector_db2_spark.operators.lm_score import (
    LP_SCALE, lm_score, lm_score_sql)
from debezium_connector_db2_spark.operators.quality import (
    gopher_quality, gopher_quality_sql)


def corpus_funnel(docs: DataFrame, id_col: str, text_col: str = "text",
                  max_avg_nll: float = 5.0,
                  gopher_kwargs: dict | None = None,
                  near_dup_kwargs: dict | None = None) -> DataFrame:
    """``(id_col, verdict)`` per input doc; see module docstring.

    ``near_dup_kwargs`` opts in the fourth stage the published funnels
    run after exact dedup (MassiveText §A1.2, RefinedWeb §3.3):
    minhash-LSH near-dup among the docs that survived all prior gates.
    The kwargs are forwarded to
    :func:`~debezium_connector_db2_spark.operators.dedup_text.minhash_lsh_pairs`
    (``k_shingle``, ``n_hashes``, ``bands``, ``threshold``,
    ``max_band_bucket_size``); the resulting pairs are clustered with
    :func:`~debezium_connector_db2_spark.operators.dedup_text.dedup_clusters`
    and every non-keeper cluster member (keeper = smallest id) gets
    verdict ``'near_dup'``.  Stage cost is confined to the survivor
    set — rejected docs never enter the shingle/signature work.
    """
    meas = gopher_quality(docs, id_col, text_col=text_col,
                          keep_cols=[text_col], **(gopher_kwargs or {}))
    # surv feeds the LM trainer's scalar collect, the LM vocab build,
    # the scoring pass, the j build, and (in the near-dup branch) the
    # kept_docs semi-join — five consumers, each otherwise re-running
    # the corpus scan + gopher rules + fingerprint.  Persist eagerly so
    # lm_score's construction-time collect materializes the cache; the
    # pin is released with the result (pin_for_result at the returns).
    surv = (meas.where("passes")
            .select(id_col, text_col,
                    fingerprint(F.col(text_col)).alias("__fp"))).persist()
    scores = lm_score(surv, id_col, text_col)
    j = (surv.select(id_col, "__fp")
         .join(scores.select(id_col, "avg_nll"), id_col))
    lm_pass = j.where(F.col("avg_nll") <= max_avg_nll)
    rn = F.row_number().over(
        Window.partitionBy("__fp").orderBy(id_col))
    staged = lm_pass.withColumn("__rn", rn)
    base = (
        meas.where(~F.col("passes"))
        .select(id_col, F.lit("quality").alias("verdict"))
        .unionByName(
            j.where(F.col("avg_nll") > max_avg_nll)
            .select(id_col, F.lit("lm").alias("verdict")))
        .unionByName(
            staged.where(F.col("__rn") > 1)
            .select(id_col, F.lit("dup").alias("verdict")))
    )
    kept = staged.where(F.col("__rn") == 1).select(id_col)
    if near_dup_kwargs is None:
        # pin j (narrow: id, fp, avg_nll) + surv for the result's
        # lifetime — three verdict branches consume j (lm-fail, dup,
        # kept) and would otherwise re-run the LM scoring shuffle once
        # each; scores' vocab-counts pin rides along (carry_pin) so j's
        # one materialization reads the cached counts too
        return carry_pin(pin_for_result(
            base.unionByName(
                kept.select(id_col, F.lit("kept").alias("verdict"))),
            j, surv), scores)

    from debezium_connector_db2_spark.operators.dedup_text import (
        dedup_clusters, minhash_lsh_pairs)

    kept_docs = (surv.join(kept, id_col, "left_semi")
                 .select(id_col, text_col))
    pairs = minhash_lsh_pairs(kept_docs, id_col, text_col,
                              **near_dup_kwargs)
    clusters = dedup_clusters(pairs.select("doc_a", "doc_b"))
    near = (clusters.where(~F.col("is_keeper"))
            .select(F.col("doc_id").alias(id_col),
                    F.lit(True).alias("__nd")))
    # no broadcast hint: the near-dup set scales with the corpus (web
    # corpora run 20-50% near-dup), so let AQE pick the join strategy
    verdict4 = (kept.join(near, id_col, "left")
                .select(id_col,
                        F.when(F.col("__nd"), F.lit("near_dup"))
                        .otherwise(F.lit("kept")).alias("verdict")))
    # dedup_clusters scopes its label-spill scratch dir (and cache pins)
    # to ITS returned object; the funnel result reads those spilled
    # files, so tie the clusters frame's lifetime to the result (and
    # funnel_report chains the tie onto its own output).  j and surv are
    # pinned too: four branches re-derive j otherwise (lm-fail, dup,
    # kept, and the near stage's kept_docs semi-join), each paying the
    # LM scoring shuffle again; surv's cache additionally spares the
    # near stage's kept_docs from a fresh gopher+fingerprint pass.
    return carry_pin(pin_for_result(
        tie_lifetime(base.unionByName(verdict4), clusters), j, surv),
        scores)


def funnel_report(verdicts: DataFrame) -> DataFrame:
    """Attrition counts per stage: ``(verdict, n_docs)``."""
    return tie_lifetime(
        verdicts.groupBy("verdict").agg(F.count("*").alias("n_docs")),
        verdicts)


def corpus_funnel_sql(table: str, id_col: str, text_col: str = "text",
                      max_avg_nll: float = 5.0,
                      gopher_sql_kwargs: dict | None = None) -> str:
    """DuckDB twin of :func:`corpus_funnel` — the same three stages
    composed as CTEs (the embedded gate SQL is the byte-identical twin
    each stage's module emits)."""
    gq = gopher_quality_sql(table, id_col, text_col,
                            **(gopher_sql_kwargs or {}))
    lm = lm_score_sql("surv", id_col, text_col)
    fp = fingerprint_sql(text_col)
    return f"""
        WITH gq AS ({gq}),
        surv AS (
          SELECT d.{id_col}, d.{text_col}, {fp} AS fp
          FROM {table} d JOIN gq ON d.{id_col} = gq.{id_col}
          WHERE gq.passes
        ),
        scores AS ({lm}),
        j AS (
          SELECT s.{id_col}, s.fp, sc.avg_nll
          FROM surv s JOIN scores sc ON s.{id_col} = sc.{id_col}
        )
        SELECT {id_col}, 'quality' AS verdict FROM gq WHERE NOT passes
        UNION ALL
        SELECT {id_col}, 'lm' FROM j WHERE avg_nll > {max_avg_nll}
        UNION ALL
        SELECT {id_col},
               CASE WHEN row_number() OVER (
                      PARTITION BY fp ORDER BY {id_col}) > 1
                    THEN 'dup' ELSE 'kept' END
        FROM j WHERE avg_nll <= {max_avg_nll}
    """
