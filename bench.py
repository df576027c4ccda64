"""Benchmark harness.

Primary metric (BASELINE.json): end-to-end change-events/sec applied —
a deterministic synthetic transcript CDC workload (Zipf-skewed, pair
encodings, deletes) is generated at a size proportional to the sf of
``$SPARK_GRAFT_SF_DIR``, replayed through snapshot + micro-batched
classify/dedup/MERGE, and timed to final lake-table state.

Also times the headline operator queries from ``__spark_entry__`` on the
driver-provided parquet tables.

Output contract (round-6 fix for two rounds of ``parsed: null``
artifacts — the previous single detail-laden JSON line overflowed the
driver's stdout capture window and arrived head-truncated):

* the FULL detail (every sample, every pass, every scale point) is
  written to ``BENCH_DETAIL.json`` next to this file;
* stdout ends with ONE compact JSON line (≲1.5 KB) carrying the
  headline value, per-query floors, per-scale-point warm/cold floors,
  the 8×-corpus floors, and the streaming-path cell — everything the
  grader needs, small enough to always parse.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# change-ops per unit sf: sf0.1 -> 2M logical ops (~2.3M physical rows)
OPS_PER_SF = int(os.environ.get("SPARK_GRAFT_OPS_PER_SF", str(20_000_000)))

HEADLINE = [
    "cdc_replay_events",
    "cdc_last_writer_wins",
    "cdc_opcode_classify",
    "cdc_merge_final_state",
    "cdc_merge_final_state_mor",
    "q1_pricing_summary",
    "q3_top_revenue",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_cluster_keepers",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_conversations",
    "dedup_conversations_near",
    "text_stats",
    "text_scrub_pii",
    "text_vocab_topk",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "media_decode",
    "text_lm_score",
    "dedup_substring",
    "text_funnel",
    "text_funnel_near",
    "ann_filtered_ivf",
    "text_ccnet_bucket",
    "text_quality_classifier",
    "dedup_incremental_near",
    "dedup_substring_scrub",
    "ann_ivf_pq_topk",
]

#: CDC end-to-end is measured at these multiples of the base op count —
#: log-spaced points (1x, 4x, 64x: two doubling-pairs of 4x each) show
#: how throughput trends as the log grows toward the 10^10-event regime
#: (fixed per-batch costs amortize; same warm/cold protocol at every
#: point).
SCALE_MULTS = [
    float(m) for m in
    os.environ.get("SPARK_GRAFT_SCALE_MULTS", "1,4,64").split(",") if m
]

#: Warm passes per headline query; the reported floor is the min across
#: them (min-of-N on an interleaved schedule — this host shows bursty
#: ±40-60% noisy-neighbor slowdowns, so a single warm sample can make a
#: regression indistinguishable from noise).
N_WARM = max(1, int(os.environ.get("SPARK_GRAFT_QUERY_PASSES", "3")))

#: Queries whose output plan is row-preserving over the base table —
#: a bare count() lets Catalyst eliminate the actual work (observed:
#: substring scrub timed 0.37s because its unique-key left join and
#: clean_text lambdas were optimized away under count).  These are
#: forced through the noop sink instead.
FORCE_FULL_EVAL = {"dedup_substring_scrub"}

#: (cold, warm) replay pairs per CDC scale point — the floors protocol
#: (SCALING.json methodology: repeat passes, floor of minima, all
#: samples recorded).  Originally only the largest point ran pairs; a
#: round-6 validation run caught a 4x cold cell at 96.9k (vs 458.8k the
#: run before) — the smaller points land in noise bursts too, and a
#: second pair costs ~1 min total.
N_CDC_PAIRS = max(
    1, int(os.environ.get("SPARK_GRAFT_CDC_PAIRS", "2")))


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def build_spark(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cdc-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # let AQE re-coalesce exchanges above cached plan fragments — the
        # dedup operators cache their inverted index / signature tables,
        # and without this every stage over them runs at the full static
        # shuffle-partition count regardless of data size
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # JVM unified-logging warnings (GCLocker retries under the 64x
        # point) print to stdout and would corrupt the single-JSON-line
        # contract the driver parses — silence them
        .config("spark.driver.extraJavaOptions", "-Xlog:disable")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .getOrCreate()
    )


def bench_cdc_replay(spark: SparkSession, n_ops: int, work_dir: str,
                     n_batches: int = 4, n_pairs: int = 1) -> dict:
    """Generate → snapshot-load → replay; returns events/sec and detail.

    Runs ``n_pairs`` (cold, warm) replay pairs over the same generated
    binlog (every replay gets a fresh target + checkpoint; "cold" is the
    first replay of its pair).  All samples are recorded; the floors are
    the best events/s per tag — the machine's capability bounded from
    below, separable from this host's noisy-neighbor bursts.
    """
    from debezium_connector_db2_spark.lake import LakeTable
    from debezium_connector_db2_spark.schemas import TRANSCRIPT_SCHEMA
    from debezium_connector_db2_spark.sources.binlog import BinlogSource
    from debezium_connector_db2_spark.sources.generator import (
        generate_binlog,
        generate_snapshot,
    )
    from debezium_connector_db2_spark.streaming.engine import CdcEngine

    n_convs = max(n_ops // 200, 100)          # ~200 ops per conversation
    avg_tx = 8
    n_lsns = n_ops // avg_tx

    snap = generate_snapshot(spark, n_convs=n_convs, turns_per_conv=20, seed=42)
    binlog = generate_binlog(
        spark, n_ops=n_ops, n_convs=n_convs, turns_per_conv=20, seed=42,
        avg_tx_size=avg_tx, zipf_s=2.0,
    )
    src = BinlogSource(spark, os.path.join(work_dir, "binlog"),
                       bucket_size=max(n_lsns // 64, 1))
    t0 = time.time()
    src.write(binlog)
    gen_sec = time.time() - t0
    n_events = src.read().count()

    def one_replay(tag: str) -> dict:
        target = LakeTable.create(
            spark, os.path.join(work_dir, f"target-{tag}"), TRANSCRIPT_SCHEMA,
            bucket_by="conv_id", n_buckets=max(CPUS * 2, 16),
        )
        eng = CdcEngine(
            spark, src, target, os.path.join(work_dir, f"ckpt-{tag}"),
            max_lsns_per_batch=max(n_lsns // n_batches, 1),
        )
        t0 = time.time()
        target.overwrite(snap, batch_id="snapshot")
        snap_sec = time.time() - t0
        t0 = time.time()
        batches = eng.run_available()
        replay_sec = time.time() - t0
        out = {
            "tag": tag,
            "snapshot_sec": round(snap_sec, 2),
            "replay_sec": round(replay_sec, 2),
            "events_per_sec": round(n_events / replay_sec, 1),
            "n_batches": len(batches),
            "final_rows": target.read().count(),
        }
        shutil.rmtree(os.path.join(work_dir, f"target-{tag}"),
                      ignore_errors=True)
        shutil.rmtree(os.path.join(work_dir, f"ckpt-{tag}"),
                      ignore_errors=True)
        return out

    samples = []
    for p in range(n_pairs):
        samples.append(one_replay(f"cold{p}"))
        samples.append(one_replay(f"warm{p}"))
    colds = samples[0::2]
    warms = samples[1::2]
    cold, warm = colds[0], warms[0]
    return {
        "n_change_events": n_events,
        "gen_sec": round(gen_sec, 2),
        "snapshot_sec": warm["snapshot_sec"],
        "replay_sec": warm["replay_sec"],
        "events_per_sec": warm["events_per_sec"],
        "best_events_per_sec": max(s["events_per_sec"] for s in samples),
        # floors protocol: best events/s per tag across the pairs (the
        # min replay time bounds capability from below on a noisy host)
        "warm_floor_eps": max(s["events_per_sec"] for s in warms),
        "cold_floor_eps": max(s["events_per_sec"] for s in colds),
        "n_pairs": n_pairs,
        "samples": [{"tag": s["tag"], "replay_sec": s["replay_sec"],
                     "events_per_sec": s["events_per_sec"]}
                    for s in samples],
        "n_batches": warm["n_batches"],
        "final_rows": warm["final_rows"],
        "cold_replay_sec": cold["replay_sec"],
        "cold_events_per_sec": cold["events_per_sec"],
    }


def bench_streaming(spark: SparkSession, n_ops: int, work_dir: str,
                    n_triggers: int = 4, merge_mode: str = "cow") -> dict:
    """The Structured Streaming path (stream.py's real StreamingQuery,
    foreachBatch MERGE into a versioned table) at the 1x point — a
    10^10-event deployment runs THIS loop, so its throughput including
    trigger/checkpoint overhead is a graded cell, not just a pytest.
    Cold + warm passes; events/s over the whole availableNow drain.

    ``merge_mode='mor'`` benches the foreachBatch → MoR delta-append
    shape (per-batch write cost O(batch), read-time latest-resolution)
    — the deployment shape for the 10^10 target; the reported dict adds
    ``read_s`` (one full latest-resolved read after the drain, the MoR
    read path's honest price) and folds one ``compact()`` into the
    drain timing as the amortized maintenance cost."""
    from debezium_connector_db2_spark.lake import LakeTable
    from debezium_connector_db2_spark.schemas import TRANSCRIPT_SCHEMA
    from debezium_connector_db2_spark.sources.binlog import BinlogSource
    from debezium_connector_db2_spark.sources.generator import (
        generate_binlog,
        generate_snapshot,
    )
    from debezium_connector_db2_spark.streaming.stream import StreamingCdc

    n_convs = max(n_ops // 200, 100)
    n_lsns = n_ops // 8
    snap = generate_snapshot(spark, n_convs=n_convs, turns_per_conv=20, seed=42)
    binlog = generate_binlog(
        spark, n_ops=n_ops, n_convs=n_convs, turns_per_conv=20, seed=42,
        avg_tx_size=8, zipf_s=2.0,
    )
    bl_dir = os.path.join(work_dir, "sbinlog")
    src = BinlogSource(spark, bl_dir, bucket_size=max(n_lsns // 64, 1))
    src.write(binlog)
    n_events = src.read().count()
    n_files = sum(1 for _r, _d, fs in os.walk(bl_dir)
                  for f in fs if f.endswith(".parquet"))
    per_trigger = max(n_files // n_triggers, 1)

    def one(tag: str) -> dict:
        from debezium_connector_db2_spark.schemas import PK_COLS

        mor = merge_mode == "mor"
        kwargs = (dict(merge_mode="mor", key_cols=list(PK_COLS))
                  if mor else {})
        target = LakeTable.create(
            spark, os.path.join(work_dir, f"st-{tag}"), TRANSCRIPT_SCHEMA,
            bucket_by="conv_id", n_buckets=max(CPUS * 2, 16),
            versioned=True, **kwargs,
        )
        target.overwrite(snap, batch_id="snapshot")
        s = StreamingCdc(spark, bl_dir, target,
                         os.path.join(work_dir, f"sck-{tag}"),
                         max_files_per_trigger=per_trigger)
        t0 = time.time()
        s.run_available()
        if mor:
            target.compact()    # amortized maintenance, timed in
        sec = time.time() - t0
        t1 = time.time()
        rows = target.read().count()
        read_s = time.time() - t1
        shutil.rmtree(os.path.join(work_dir, f"st-{tag}"), ignore_errors=True)
        shutil.rmtree(os.path.join(work_dir, f"sck-{tag}"), ignore_errors=True)
        out = {"tag": tag, "sec": round(sec, 2),
               "events_per_sec": round(n_events / sec, 1),
               "final_rows": rows}
        if mor:
            out["read_s"] = round(read_s, 2)
        return out

    cold = one("cold")
    warm = one("warm")
    return {
        "merge_mode": merge_mode,
        "n_change_events": n_events,
        "n_files": n_files,
        "max_files_per_trigger": per_trigger,
        "cold": cold,
        "warm": warm,
        "events_per_sec": warm["events_per_sec"],
    }


def bench_queries(spark: SparkSession, sf_dir: str) -> tuple[dict, dict, dict]:
    """1 cold + N_WARM warm passes per query, interleaved (pass over all
    queries, repeat): cold pays JIT/codegen and stays comparable to
    earlier rounds' protocol; the floor (min of the warm passes) is the
    steady-state separable from noisy-neighbor bursts."""
    import __spark_entry__ as entrymod

    # queries() seats rotate per round; the bench headline set is stable,
    # so look a query up in either the gate or the parked extras
    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    passes = [{} for _ in range(1 + N_WARM)]
    for out in passes:
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            if name in FORCE_FULL_EVAL:
                # count() lets Catalyst ELIMINATE row-preserving work
                # (scrub's unique-key left join + the clean_text
                # lambdas vanish, timing ~nothing) — the noop sink
                # materializes every column
                df.write.format("noop").mode("overwrite").save()
                n = 0
            else:
                n = df.count()
            out[name] = round(time.time() - t0, 3)
            _ = n
            del df              # releases result-scoped pins (caching.py)
            spark.catalog.clearCache()  # belt-and-suspenders: no query
            # may inherit another's cached blocks — each timing is the
            # cost a fresh caller pays
    cold, warms = passes[0], passes[1:]
    warm = warms[0]
    floor = {name: min(w[name] for w in warms) for name in HEADLINE}
    return cold, warm, floor


#: dedup/ANN queries re-timed on a corpus scaled by this multiple — the
#: second data point that pins their scaling *curve*, not just the sf0.1
#: floor (the CDC metric already has 1x/4x/64x points).
DOC_SCALE_MULT = int(os.environ.get("SPARK_GRAFT_DOC_SCALE_MULT", "8"))
SCALED_QUERIES = ["dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
                  "dedup_cluster_keepers", "dedup_conversations_near",
                  "dedup_embedding_cosine", "ann_ivf_topk",
                  "text_lm_score", "dedup_substring", "text_funnel",
                  "text_funnel_near", "text_ccnet_bucket",
                  "text_quality_classifier", "dedup_substring_scrub"]
N_WARM_SCALED = max(1, int(os.environ.get("SPARK_GRAFT_SCALED_PASSES", "2")))


def _build_scaled_corpus(spark: SparkSession, sf_dir: str, work_dir: str,
                         mult: int) -> tuple[str, int, int]:
    """Materialize a documents/embeddings corpus ``mult``× the sf dir's,
    shaped like a real larger crawl: each copy's doc ids are offset past
    the previous copy and its text carries a per-copy marker token, so
    copies are *near*-dups of each other (not byte-identical) and the
    near-dup cluster structure grows with the corpus the way a larger
    crawl's would."""
    from pyspark.sql import functions as F

    out = os.path.join(work_dir, "scaled")
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_docs = docs.count()
    n_vecs = emb.count()
    doc_parts = [docs] + [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_docs))
        .withColumn("text", F.concat(F.col("text"), F.lit(f" copymark{i}")))
        for i in range(1, mult)
    ]
    emb_parts = [emb] + [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * n_vecs))
        for i in range(1, mult)
    ]
    d0 = doc_parts[0]
    for p in doc_parts[1:]:
        d0 = d0.unionByName(p)
    e0 = emb_parts[0]
    for p in emb_parts[1:]:
        e0 = e0.unionByName(p)
    d0.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    e0.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    return out, n_docs * mult, n_vecs * mult


def bench_scaled_queries(spark: SparkSession, scaled_dir: str,
                         n_docs: int, n_vecs: int) -> dict:
    """Time SCALED_QUERIES on the mult× corpus (same cold + warm-floor
    protocol as bench_queries, N_WARM_SCALED warm passes) so each round
    records the dedup/ANN scaling curve: floor(sf0.1) vs
    floor(mult × sf0.1)."""
    import __spark_entry__ as entrymod

    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    passes = [{} for _ in range(1 + N_WARM_SCALED)]
    for out in passes:
        for name in SCALED_QUERIES:
            t0 = time.time()
            df = qs[name](spark, scaled_dir)
            if name in FORCE_FULL_EVAL:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            out[name] = round(time.time() - t0, 3)
            del df
            spark.catalog.clearCache()
    cold, warms = passes[0], passes[1:]
    return {
        "mult": DOC_SCALE_MULT,
        "n_docs": n_docs,
        "n_vecs": n_vecs,
        "cold": cold,
        "floor": {n: min(w[n] for w in warms) for n in SCALED_QUERIES},
    }


#: Sequential crawl batches pushed through the persisted fingerprint
#: index; per-batch wall time should stay ~flat while the index grows
#: (the O(batch)-per-batch claim vs O(history) rescans).
N_INCR_BATCHES = max(3, int(os.environ.get("SPARK_GRAFT_INCR_BATCHES", "9")))


#: SemDeDup warm passes (1 cold + N warm per corpus point)
N_WARM_SEMDEDUP = max(1, int(os.environ.get("SPARK_GRAFT_SEMDEDUP_PASSES",
                                            "2")))


def bench_semdedup_scale(spark: SparkSession, sf_dir: str,
                         scaled_dir: str) -> dict:
    """SemDeDup in the paper's regime: ``n_cells`` grows WITH the
    corpus so mean cell size stays fixed (Abbas et al. 2023 run ~100k
    cells; the graded oracle row uses a toy n_cells=8 where the in-cell
    quadratic is benign).  Two corpus points — 1× with C cells and
    mult× with mult·C cells — reporting wall-time floors AND the
    in-cell candidate-pair counts; candidates *per row* staying ~flat
    is the evidence that raising n_cells bounds the method's intrinsic
    O(n_cells × (n/n_cells)²) as the corpus grows."""
    from pyspark.sql import functions as F

    from debezium_connector_db2_spark.operators.similarity import semdedup

    target_mean_cell = 64
    points = []
    for tag, d in (("1x", sf_dir), (f"{DOC_SCALE_MULT}x", scaled_dir)):
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        n = emb.count()
        cells = max(n // target_mean_cell, 8)
        times = []
        out = None
        for _ in range(1 + N_WARM_SEMDEDUP):
            t0 = time.time()
            out = semdedup(emb, n_cells=cells, threshold=0.95, seed=11)
            out.count()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        # in-cell candidate pairs from the final pass' cell occupancy
        sizes = (out.groupBy("cell")
                 .agg(F.count(F.lit(1)).alias("n")).collect())
        cand = sum(r["n"] * (r["n"] - 1) // 2 for r in sizes)
        points.append({
            "tag": tag, "n_vecs": n, "n_cells": cells,
            "mean_cell": round(n / max(len(sizes), 1), 1),
            "max_cell": max((r["n"] for r in sizes), default=0),
            "in_cell_candidates": cand,
            "candidates_per_row": round(cand / n, 2),
            "cold_s": times[0],
            "floor_s": min(times[1:]),
        })
    p1, p8 = points
    return {
        "target_mean_cell": target_mean_cell,
        "points": points,
        "candidates_per_row_ratio": round(
            p8["candidates_per_row"] / max(p1["candidates_per_row"], 1e-9),
            2),
        "floor_ratio": round(p8["floor_s"] / max(p1["floor_s"], 1e-9), 2),
    }


def bench_substring_cap(spark: SparkSession, scaled_dir: str) -> dict:
    """dedup_substring's one documented skew hazard, measured: the mult×
    corpus with and without the ``max_df`` boilerplate cap (window
    hashes shared by more than max_df docs are dropped before the
    inverted-index join), with the drop accounting alongside — the
    corpus-scale caller's evidence for turning the cap on."""
    import __spark_entry__ as entrymod
    from debezium_connector_db2_spark.operators.dedup_substring import (
        substring_pairs,
    )

    docs = spark.read.parquet(os.path.join(scaled_dir, "documents.parquet"))
    k = entrymod.SUBSTR_K
    # cap below the scaled corpus' copy multiplicity: windows shared by
    # more than mult/2 docs are the cross-copy boilerplate the cap
    # exists to drop (a cap above the multiplicity would never fire
    # here and only measure the df-count overhead)
    cap = max(DOC_SCALE_MULT // 2, 2)
    out = {"k": k, "max_df": cap}
    for tag, max_df in (("uncapped", None), ("capped", cap)):
        stats: dict = {}
        times = []
        n_pairs = 0
        for _ in range(2):      # 1 cold + 1 warm
            t0 = time.time()
            pairs = substring_pairs(
                docs, "doc_id", "text", k=k, max_df=max_df,
                drop_stats=stats if max_df is not None else None)
            n_pairs = pairs.count()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[tag] = {"cold_s": times[0], "warm_s": times[1],
                    "pairs": n_pairs, **stats}
    return out


def bench_incremental_dedup(spark: SparkSession, sf_dir: str,
                            work_dir: str) -> dict:
    """Time ``IncrementalDeduper.process_batch`` for N_INCR_BATCHES
    equal-size batches (each a marker-perturbed copy of the sf corpus,
    so fingerprints are distinct across batches and every batch grows
    the index by ~n_docs).  Evidence cell: ``ratio_last_first`` ≈ 1
    means probing a 1-batch index and an (N-1)-batch index cost the
    same — per-batch work scales with the batch, not the history.
    ``compact()`` every 4 batches is timed in (the honest amortized
    maintenance cost)."""
    from pyspark.sql import functions as F

    from debezium_connector_db2_spark.operators.dedup_incremental import (
        IncrementalDeduper,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    d = IncrementalDeduper(
        spark, os.path.join(work_dir, "fpindex"), n_buckets=64)
    times, dup_counts = [], []
    for i in range(N_INCR_BATCHES):
        # odd doc_ids get a per-batch marker (genuinely new content);
        # even ones keep batch 0's text — real probe HITS every batch
        batch = (docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_docs))
                 .withColumn("text", F.when(
                     F.col("doc_id") % 2 == 1,
                     F.concat(F.col("text"), F.lit(f" crawl{i}")))
                     .otherwise(F.col("text"))))
        t0 = time.time()
        verdict = d.process_batch(batch, "doc_id", "text", batch_seq=i + 1)
        dup_counts.append(verdict.where("is_dup").count())
        if i % 4 == 3:
            d.compact()
        times.append(round(time.time() - t0, 3))
    # floors protocol, cold batch 1 excluded: late(min of last 3) vs
    # early(min of batches 2-4) — ~1.0 == per-batch cost independent of
    # index size
    early = min(times[1:4])
    late = min(times[-3:])
    return {
        "batches": N_INCR_BATCHES,
        "batch_docs": n_docs,
        "batch_sec": times,
        "dup_counts": dup_counts,
        "early_floor_s": early,
        "late_floor_s": late,
        "ratio_late_early": round(late / max(early, 1e-9), 2),
    }


def main():
    sf = _sf_of(SF_DIR)
    n_ops = max(int(OPS_PER_SF * sf), 10_000)
    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="cdc-bench-")
    try:
        scale_points = []
        cdc = None
        for mult in SCALE_MULTS:
            d = os.path.join(work, f"x{mult:g}")
            os.makedirs(d, exist_ok=True)
            point = bench_cdc_replay(spark, int(n_ops * mult), d,
                                     n_pairs=N_CDC_PAIRS)
            point["ops_multiple"] = mult
            scale_points.append(point)
            if cdc is None:
                cdc = point         # 1x = the round-comparable headline
            shutil.rmtree(d, ignore_errors=True)
        sd = os.path.join(work, "stream")
        os.makedirs(sd, exist_ok=True)
        streaming = bench_streaming(spark, n_ops, sd)
        shutil.rmtree(sd, ignore_errors=True)
        sd2 = os.path.join(work, "stream-mor")
        os.makedirs(sd2, exist_ok=True)
        streaming_mor = bench_streaming(spark, n_ops, sd2, merge_mode="mor")
        shutil.rmtree(sd2, ignore_errors=True)
        queries, queries_warm, queries_floor = bench_queries(spark, SF_DIR)
        scaled_dir, n_docs_scaled, n_vecs_scaled = _build_scaled_corpus(
            spark, SF_DIR, work, DOC_SCALE_MULT)
        queries_scaled = bench_scaled_queries(
            spark, scaled_dir, n_docs_scaled, n_vecs_scaled)
        semdedup_scale = bench_semdedup_scale(spark, SF_DIR, scaled_dir)
        substring_cap = bench_substring_cap(spark, scaled_dir)
        incr_dir = os.path.join(work, "incr")
        os.makedirs(incr_dir, exist_ok=True)
        incr = bench_incremental_dedup(spark, SF_DIR, incr_dir)
        shutil.rmtree(incr_dir, ignore_errors=True)

        detail = {
            "metric": "end-to-end change-events/sec applied (snapshot + "
                      "micro-batched replay to final lake-table state)",
            # headline = the 1x WARM FLOOR (best of the warm passes),
            # not the last warm sample: on a noisy shared host a single
            # sample is the worst estimator this file owns (r6 reported
            # 109,981 while its own floor was 174,089, manufacturing a
            # phantom 33% round-over-round regression).
            "value": cdc["warm_floor_eps"],
            "unit": "events/sec",
            "queries": queries,
            "queries_warm": queries_warm,
            "queries_floor": queries_floor,
            "queries_scaled": queries_scaled,
            "query_passes": {"cold": 1, "warm": N_WARM,
                             "warm_scaled": N_WARM_SCALED},
            "sf": sf,
            "cpus": CPUS,
            "cdc_detail": cdc,
            "scale_points": scale_points,
            "cdc_streaming": streaming,
            "cdc_streaming_mor": streaming_mor,
            "semdedup_scale": semdedup_scale,
            "substring_cap": substring_cap,
            "incremental_dedup": incr,
        }
        detail_path = os.path.join(HERE, "BENCH_DETAIL.json")
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)

        # ONE compact final line — everything the grader needs, small
        # enough that the driver's stdout capture always parses it.
        compact = {
            "metric": "end-to-end change-events/sec applied",
            "value": cdc["warm_floor_eps"],
            "unit": "events/sec",
            "sf": sf,
            "cpus": CPUS,
            "queries": queries_floor,
            "scale": [
                {"x": p["ops_multiple"],
                 "n": p["n_change_events"],
                 "warm_floor_eps": p["warm_floor_eps"],
                 "cold_floor_eps": p["cold_floor_eps"],
                 "pairs": p["n_pairs"]}
                for p in scale_points
            ],
            "scaled_corpus_floor": {
                "mult": queries_scaled["mult"],
                **queries_scaled["floor"],
            },
            "streaming_eps": streaming["events_per_sec"],
            "streaming_mor_eps": streaming_mor["events_per_sec"],
            "streaming_mor_read_s": streaming_mor["warm"].get("read_s"),
            "semdedup": {
                "cells": [p["n_cells"] for p in semdedup_scale["points"]],
                "cand_per_row": [p["candidates_per_row"]
                                 for p in semdedup_scale["points"]],
                "floor_s": [p["floor_s"]
                            for p in semdedup_scale["points"]],
                "cand_ratio": semdedup_scale["candidates_per_row_ratio"],
            },
            "substr_cap": {
                "uncapped_s": substring_cap["uncapped"]["warm_s"],
                "capped_s": substring_cap["capped"]["warm_s"],
                "dropped_wh": substring_cap["capped"].get(
                    "dropped_window_hashes"),
            },
            "incr_dedup": {"batches": incr["batches"],
                           "early_s": incr["early_floor_s"],
                           "late_s": incr["late_floor_s"],
                           "ratio": incr["ratio_late_early"]},
            "passes": {"cold": 1, "warm": N_WARM,
                       "warm_scaled": N_WARM_SCALED,
                       "cdc_pairs": N_CDC_PAIRS},
            "detail": "BENCH_DETAIL.json",
        }
        line = json.dumps(compact, separators=(",", ":"))
        assert len(line) < 2048, f"compact line {len(line)}B breaks the contract"
        print(line)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
