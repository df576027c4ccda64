"""Run one CDC replay over a pre-generated workload at a given parallelism.

Used by scaling_bench.py: the input (binlog + snapshot parquet) is
generated once and shared, so runs at different ``--cpus`` measure the
same job on the same bytes.  Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--binlog", required=True)
    ap.add_argument("--snapshot", required=True)
    ap.add_argument("--bucket-size", type=int, required=True)
    ap.add_argument("--n-batches", type=int, default=1)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--warmup", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from debezium_connector_db2_spark.lake import LakeTable
    from debezium_connector_db2_spark.schemas import TRANSCRIPT_SCHEMA
    from debezium_connector_db2_spark.sources.binlog import BinlogSource
    from debezium_connector_db2_spark.streaming.engine import CdcEngine

    shuffle_base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    shuffle_dir = tempfile.mkdtemp(prefix=f"spark-local-{args.cpus}-", dir=shuffle_base)
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName(f"cdc-scaling-{args.cpus}")
        .config("spark.sql.shuffle.partitions", str(max(args.cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "40g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # shuffle/spill on tmpfs: a cluster's shuffle bandwidth scales with
        # node count; one shared cold disk would flatten the comparison
        .config("spark.local.dir", shuffle_dir)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix=f"scaling-{args.cpus}-", dir=base)
    try:
        src = BinlogSource(spark, args.binlog, bucket_size=args.bucket_size)
        snap = spark.read.parquet(args.snapshot)

        def replay(tag: str):
            target = LakeTable.create(
                spark, os.path.join(work, f"target-{tag}"), TRANSCRIPT_SCHEMA,
                bucket_by="conv_id", n_buckets=args.n_buckets,
            )
            hi = src.max_lsn()
            eng = CdcEngine(
                spark, src, target, os.path.join(work, f"ckpt-{tag}"),
                max_lsns_per_batch=(hi // args.n_batches + 1)
                if args.n_batches > 1 else None,
            )
            t0 = time.time()
            target.overwrite(snap, batch_id="snapshot")
            snap_sec = time.time() - t0
            t0 = time.time()
            batches = eng.run_available()
            return target, batches, snap_sec, time.time() - t0

        if args.warmup:
            # Steady-state measurement: a first replay warms whole-stage
            # codegen + JIT (one-time per JVM, pure serial cost that a
            # 10^10-event run pays once); the timed replay starts fresh
            # tables in the same JVM.
            replay("warm")
        target, batches, snap_sec, replay_sec = replay("timed")
        n_events = sum(m.events for m in batches)
        print(json.dumps({
            "cpus": args.cpus,
            "snapshot_sec": round(snap_sec, 2),
            "replay_sec": round(replay_sec, 2),
            "n_events": n_events,
            "events_per_sec": round(n_events / replay_sec, 1),
            "n_batches": len(batches),
            "final_rows": target.read().count(),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
        shutil.rmtree(shuffle_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
