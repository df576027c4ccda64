"""Round-8 optimization harness — per-query isolation (guide §1).

NOT the graded bench (``bench.py`` is frozen).  This file exists so an
optimization loop can time a handful of queries in seconds instead of
re-running the full 25-minute bench:

* same Spark session shape as ``bench.py`` (same master, same shuffle
  partitions, same AQE settings) so numbers transfer;
* same timing protocol per query (1 cold + N warm passes, floor of the
  warm passes, ``clearCache()`` between passes);
* queries forced through the noop sink by default (guide §1.4) so the
  computation is timed, not the count shortcut — pass ``--count`` to
  reproduce bench.py's ``count()`` protocol for comparability;
* jobs labelled via ``setJobDescription`` (guide §1.5).

Usage::

    python bench_extra.py ann_ivf_pq_topk text_funnel_near
    python bench_extra.py --count --warm 3 dedup_minhash_lsh
    python bench_extra.py --scaled 8 dedup_minhash_lsh   # mult× corpus
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_spark(cpus: int):
    from bench import build_spark as bs

    return bs(cpus)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--count", action="store_true",
                    help="time count() like bench.py instead of noop sink")
    ap.add_argument("--scaled", type=int, default=0,
                    help="run on a MULT-scaled corpus like bench.py's "
                         "scaled cell")
    args = ap.parse_args()

    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    sf_dir = SF_DIR
    work = None
    if args.scaled:
        from bench import _build_scaled_corpus

        work = tempfile.mkdtemp(prefix="cdc-bx-")
        sf_dir, _, _ = _build_scaled_corpus(spark, SF_DIR, work,
                                            args.scaled)
    out = {}
    try:
        for name in args.names:
            fn = qs[name]
            times = []
            for p in range(1 + args.warm):
                spark.sparkContext.setJobDescription(
                    f"bx:{name}:pass{p}")
                t0 = time.time()
                df = fn(spark, sf_dir)
                if args.count and name not in ("dedup_substring_scrub",):
                    df.count()
                else:
                    df.write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 3))
                del df
                spark.catalog.clearCache()
            out[name] = {"cold": times[0], "floor": min(times[1:]),
                         "all": times}
            print(json.dumps({name: out[name]}), flush=True)
        print("RESULT " + json.dumps(out), flush=True)
    finally:
        if work:
            import shutil

            shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
