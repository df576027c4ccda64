"""Regenerate PLANS.md: formatted physical plans of the load-bearing
kernels with the scale-critical properties called out.  Run from the repo
root: ``PYTHONPATH=/root/repo python scripts/dump_plans.py``."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def fmt(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


def trim(plan: str, max_lines: int = 40) -> str:
    lines = plan.splitlines()
    head = [ln for ln in lines if ln.strip()][:max_lines]
    return "\n".join(head) + ("\n..." if len(lines) > max_lines else "")


def main():
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.optimizer."
                     "canChangeCachedPlanOutputPartitioning", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from debezium_connector_db2_spark.operators.dedup import latest_per_key
    from debezium_connector_db2_spark.operators.dedup_text import (
        ngram_jaccard_pairs,
        simhash_pairs,
    )
    from debezium_connector_db2_spark.operators.multimodal import (
        decode_media,
        to_media,
    )
    from debezium_connector_db2_spark.sources.binlog import BinlogSource
    from debezium_connector_db2_spark.sources.generator import generate_binlog

    work = tempfile.mkdtemp(prefix="plans-")
    src = BinlogSource(spark, os.path.join(work, "bl"), bucket_size=16)
    src.write(generate_binlog(spark, n_ops=2000, n_convs=50,
                              turns_per_conv=10, seed=9))
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))

    sections = []

    rng = src.read_range(40, 80)
    sections.append((
        "S3 — LSN-interval capture scan",
        "`PartitionFilters` prune `lsn_bucket` directories; "
        "`PushedFilters` on `commit_lsn` skip row groups via min/max "
        "stats — the Spark rendering of the reference's "
        "`(COMMITSEQ, INTENTSEQ)` index scan.",
        rng,
    ))

    ev = src.read_range(1, 250).select(
        "conv_id", "turn_idx", "op", "commit_lsn", "intent_seq", "text")
    dd = latest_per_key(ev, ["conv_id", "turn_idx"],
                        ("commit_lsn", "intent_seq"))
    sections.append((
        "A4 — last-writer-wins dedup (the apply kernel)",
        "One exchange total; `partial_max_by` runs map-side, so a hot "
        "conversation's rows crossing the shuffle are bounded by the "
        "partition count, not the key's frequency.",
        dd,
    ))

    ng = ngram_jaccard_pairs(docs, "doc_id", "text", k=2, threshold=0.2,
                             max_shingle_df=30)
    sections.append((
        "Near-dup: n-gram Jaccard with df-cap",
        "The skew guard is a pre-aggregated (`partial_count`) filter on "
        "the shingle key joined back semi-style — no window over the full "
        "posting list; a stop-shingle can never make the self-join "
        "quadratic.",
        ng,
    ))

    sh = simhash_pairs(docs, "doc_id", "text", n_bits=60, max_hamming=3,
                       max_bucket_size=400)
    sections.append((
        "Near-dup: 60-bit simhash, pigeonhole chunks, capped buckets",
        "Candidates come from `LeftSemi`-guarded (chunk, cval) "
        "equi-joins — 4 chunks of 15 bits; no cross join anywhere.",
        sh,
    ))

    media = to_media(docs.limit(50), "doc_id",
                     F.encode(F.col("text"), "UTF-8"))
    sections.append((
        "Multimodal decode — native fast path",
        "No `MapInPandas` stage: the deterministic stub is pure JVM "
        "columns inside WholeStageCodegen; the Arrow slot only appears "
        "when a real codec is requested.",
        decode_media(media),
    ))

    from debezium_connector_db2_spark.operators.lm_score import lm_score

    sections.append((
        "LM quality score — broadcast vocab join",
        "The scoring join is `BroadcastHashJoin` (vocab side), so the "
        "corpus never shuffles by word on the score path; the per-doc "
        "reduction is a map-side `partial_sum` over exact integer "
        "deci-milli-nats (order-independent at any parallelism).",
        lm_score(docs, "doc_id", "text"),
    ))

    from debezium_connector_db2_spark.operators.dedup_substring import (
        substring_pairs)

    sections.append((
        "Verbatim-span dedup — inverted-index window-hash join",
        "Pairing is an equi-join on the k-token window hash (no "
        "cartesian/nested-loop operator anywhere); the streak window "
        "runs only over the post-join hit set, bounded by per-pair "
        "collision counts.",
        substring_pairs(docs, "doc_id", "text", k=8),
    ))

    import __spark_entry__ as entrymod

    sections.append((
        "Metadata-filtered ANN — IVF shape (round 7)",
        "The label predicate is in `PushedFilters` on the item scan "
        "(items filtered BEFORE centroid selection and cell "
        "assignment), and candidate generation is the cell equi-join — "
        "probing cost stays nprobe/n_cells of the SURVIVING corpus, "
        "never a per-query scan.",
        entrymod.queries()["ann_filtered_ivf"](spark, SF),
    ))

    from debezium_connector_db2_spark.operators.funnel import corpus_funnel

    sections.append((
        "Funnel with near-dup stage (round 7)",
        "The opt-in fourth stage confines minhash-LSH + label "
        "propagation to the survivor set; the verdict join back is an "
        "id equi-join with no broadcast hint (the near-dup set scales "
        "with the corpus, AQE picks the strategy).",
        corpus_funnel(docs, "doc_id", "text", max_avg_nll=3.5,
                      gopher_kwargs=dict(min_words=10,
                                         min_required_hits=1),
                      near_dup_kwargs=dict(k_shingle=2, n_hashes=16,
                                           bands=4, threshold=0.2,
                                           max_band_bucket_size=400)),
    ))

    from debezium_connector_db2_spark.operators.lm_score import (
        ccnet_buckets)

    sections.append((
        "CCNet perplexity buckets — histogram cutoffs, no corpus sort "
        "(round 7)",
        "The per-(lang, quantized-score) histogram replaces the naive "
        "per-language `percent_rank`: the only `Sort` feeds the window "
        "over the TINY histogram, and the bucket labels come back via "
        "`BroadcastHashJoin` — the corpus itself never globally sorts.",
        ccnet_buckets(docs, "doc_id", "text", lang_col="lang"),
    ))

    from debezium_connector_db2_spark.operators.classifier import (
        quality_classifier)

    sections.append((
        "Trained NB quality classifier — broadcast weight serving "
        "(round 7)",
        "The hashed-feature weight table is bounded at n_buckets rows "
        "by construction, so the serving join is `BroadcastHashJoin` "
        "at any corpus size; training's only exchange is the "
        "bucket-bounded `partial_sum` groupBy.  All math is portable "
        "(iterated-IEEE-sqrt ln, exact integer rounding).",
        quality_classifier(
            docs.withColumn("label",
                            (F.col("lang") == "en").cast("int")),
            "doc_id", "text", "label"),
    ))

    from debezium_connector_db2_spark.operators.dedup_substring import (
        substring_scrub)

    sections.append((
        "Verbatim-span removal — zero-shuffle nested-lambda scrub "
        "(round 7)",
        "Span detection reuses the window-hash equi-join; the removal "
        "itself is a projection (nested higher-order filter over the "
        "token array) — no token-level join, no Python stage.",
        substring_scrub(docs, "doc_id", "text", k=8),
    ))

    out = ["# PLANS — physical plans of the load-bearing kernels",
           "",
           "Generated by `scripts/dump_plans.py` (plan-shape properties are",
           "regression-pinned in `tests/test_plans.py`; this file is the",
           "human-readable evidence).",
           ""]
    for title, note, df in sections:
        out += [f"## {title}", "", note, "", "```",
                trim(fmt(df)), "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
