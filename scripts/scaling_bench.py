"""Two-cluster-size scaling evidence (north_rule).

A real N vs 4N executor comparison needs a cluster; in this sandbox the
same job is run at ``local[8]`` and ``local[32]`` on the *same
pre-generated input*, per the driver's instruction.  Each configuration
runs ``--repeats`` times and the fastest run is kept (the host shows
±40% CPU-speed noise between runs; min is the least-contended estimate).

    efficiency = (throughput_32 / throughput_8) / (32 / 8)

Writes the result table to stdout and SCALING.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def generate(work: str, n_ops: int) -> dict:
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    from debezium_connector_db2_spark.sources.binlog import BinlogSource
    from debezium_connector_db2_spark.sources.generator import (
        generate_binlog,
        generate_snapshot,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "40g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_convs = max(n_ops // 200, 100)
    bucket_size = max(n_ops // 8 // 64, 1)
    binlog_dir = os.path.join(work, "binlog")
    snap_dir = os.path.join(work, "snapshot")
    src = BinlogSource(spark, binlog_dir, bucket_size=bucket_size)
    src.write(generate_binlog(spark, n_ops=n_ops, n_convs=n_convs,
                              turns_per_conv=20, seed=42, avg_tx_size=8))
    generate_snapshot(spark, n_convs=n_convs, turns_per_conv=20, seed=42) \
        .write.mode("overwrite").parquet(snap_dir)
    spark.stop()
    return {"binlog": binlog_dir, "snapshot": snap_dir, "bucket_size": bucket_size}


def run_once(cpus: int, paths: dict, n_batches: int) -> dict:
    # taskset pins the WHOLE JVM (task threads + GC + IO pools) to `cpus`
    # cores — a faithful emulation of a smaller machine, which bare
    # local[N] is not (its GC/shuffle/parquet threads still use every
    # host core).
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}",
         sys.executable, os.path.join(REPO, "scripts", "replay_once.py"),
         "--cpus", str(cpus), "--binlog", paths["binlog"],
         "--snapshot", paths["snapshot"],
         "--bucket-size", str(paths["bucket_size"]),
         "--n-batches", str(n_batches), "--warmup"],
        capture_output=True, text=True, timeout=1800,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"replay_once failed: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-ops", type=int, default=4_000_000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--n-batches", type=int, default=1)
    ap.add_argument("--cpus", type=int, nargs=2, default=[8, 32])
    args = ap.parse_args()

    # tmpfs keeps the shared input at RAM speed for every configuration:
    # on a real cluster each executor reads from node-local storage that
    # scales with the node count; a single shared cold disk would
    # artificially serialize the comparison.
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="cdc-scaling-", dir=base)
    print(f"generating workload ({args.n_ops} ops) ...", file=sys.stderr)
    paths = generate(work, args.n_ops)

    # Interleave configurations so host-speed drift (the sandbox shows
    # ±40% CPU noise between minutes) biases both sides equally; keep the
    # fastest run per config as the least-contended estimate.
    all_runs: dict[int, list] = {c: [] for c in args.cpus}
    for i in range(args.repeats):
        for cpus in args.cpus:
            r = run_once(cpus, paths, args.n_batches)
            print(f"  local[{cpus}] run {i}: {r['replay_sec']}s "
                  f"({r['events_per_sec']} ev/s)", file=sys.stderr)
            all_runs[cpus].append(r)
    results = {}
    for cpus in args.cpus:
        best = min(all_runs[cpus], key=lambda r: r["replay_sec"])
        best["all_replay_sec"] = [r["replay_sec"] for r in all_runs[cpus]]
        results[cpus] = best

    lo, hi = args.cpus
    eff = (results[hi]["events_per_sec"] / results[lo]["events_per_sec"]) / (hi / lo)
    summary = {
        "n_ops": args.n_ops,
        "n_events": results[hi]["n_events"],
        "n_batches": args.n_batches,
        "per_cpus": results,
        "scaling_efficiency": round(eff, 3),
        "speedup": round(results[hi]["events_per_sec"]
                         / results[lo]["events_per_sec"], 2),
    }
    print(json.dumps(summary, indent=2))
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump(summary, f, indent=2)
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
