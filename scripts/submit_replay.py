"""spark-submit entry point: snapshot + replay a synthetic transcript CDC
workload end-to-end and verify the final table against the closed-form
oracle.

Deployment evidence for the north rule ("runs via spark-submit
--py-files on a multi-executor cluster"): the package ships as a zip on
the executors' PYTHONPATH, no repo checkout needed::

    python scripts/build_dist.py          # -> dist/debezium_connector_db2_spark.zip
    spark-submit --master local[8] \
        --py-files dist/debezium_connector_db2_spark.zip \
        scripts/submit_replay.py --n-ops 100000 --work /tmp/cdc-submit

On a real cluster, swap --master for the cluster manager; everything the
job needs (engine, sources, lake) is inside the zip.  Exits non-zero on
any oracle mismatch.
"""

import argparse
import os
import shutil
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-ops", type=int, default=100_000)
    ap.add_argument("--work", default="/tmp/cdc-submit")
    ap.add_argument("--n-batches", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.appName("cdc-submit-replay")
             .config("spark.sql.session.timeZone", "UTC").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from debezium_connector_db2_spark import (
        CdcEngine,
        LakeTable,
        TRANSCRIPT_SCHEMA,
    )
    from debezium_connector_db2_spark.sources.binlog import BinlogSource
    from debezium_connector_db2_spark.sources.generator import (
        generate_binlog,
        generate_snapshot,
        oracle_final_state,
    )

    shutil.rmtree(args.work, ignore_errors=True)
    os.makedirs(args.work, exist_ok=True)
    n_convs = max(args.n_ops // 200, 100)
    snap = generate_snapshot(spark, n_convs=n_convs, turns_per_conv=20, seed=42)
    log = generate_binlog(spark, n_ops=args.n_ops, n_convs=n_convs,
                          turns_per_conv=20, seed=42, avg_tx_size=8)
    src = BinlogSource(spark, os.path.join(args.work, "binlog"),
                       bucket_size=max(args.n_ops // 8 // 64, 1))
    src.write(log)
    n_events = src.read().count()

    target = LakeTable.create(spark, os.path.join(args.work, "target"),
                              TRANSCRIPT_SCHEMA, bucket_by="conv_id",
                              n_buckets=16)
    eng = CdcEngine(spark, src, target, os.path.join(args.work, "ckpt"),
                    max_lsns_per_batch=max(args.n_ops // 8 // args.n_batches, 1))
    # the snapshot is the table state BEFORE the binlog interval, so load
    # it directly and let streaming start from LSN 0 (bench.py protocol);
    # snapshot_load() is for pinning at the CURRENT end of a live binlog
    target.overwrite(snap, batch_id="snapshot")
    t0 = time.time()
    batches = eng.run_available()
    dt = time.time() - t0

    got = target.read()
    want = oracle_final_state(snap, log)
    cols = sorted(got.columns)
    diff = (got.select(cols).exceptAll(want.select(cols)).count()
            + want.select(cols).exceptAll(got.select(cols)).count())
    print(f"events={n_events} batches={len(batches)} replay_sec={dt:.2f} "
          f"events_per_sec={n_events / dt:.0f} oracle_diff={diff}")
    spark.stop()
    sys.exit(0 if diff == 0 else 1)


if __name__ == "__main__":
    main()
