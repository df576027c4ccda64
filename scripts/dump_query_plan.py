"""Dump ``explain("formatted")`` for named declared queries to files —
the round-8 plan-evidence helper (``plans/r08/<query>_{before,after}.txt``).

Usage::

    python scripts/dump_query_plan.py --tag before ann_ivf_pq_topk ...
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def fmt(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--out", default=os.path.join(REPO, "plans", "r08"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.optimizer."
                     "canChangeCachedPlanOutputPartitioning", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.extraJavaOptions", "-Xlog:disable")
             .config("spark.sql.session.timeZone", "UTC").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    os.makedirs(args.out, exist_ok=True)
    for name in args.names:
        df = qs[name](spark, SF_DIR)
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(fmt(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
