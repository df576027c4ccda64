"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, and
compare row counts + order-insensitive values.

Usage: PYTHONPATH=/root/repo python scripts/check_contract.py [sf_dir] [names...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if v is None:
        return ""
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t)}.parquet'"
        )

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            sraw = [tuple(r) for r in sdf.select(*scols).collect()]
            srows = sorted([tuple(norm(v) for v in r) for r in sraw])
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle — rows-only)")
            n_pass += 1
            continue
        try:
            rel = con.sql(oracles[name])
            ocols_raw = rel.columns
            order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
            ocols = [ocols_raw[i] for i in order]
            oraw = [tuple(r[i] for i in order) for r in rel.fetchall()]
            orows = sorted([tuple(norm(v) for v in r) for r in oraw])
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL  {name}: columns {scols} vs {ocols}")
            n_fail += 1
            continue
        # Type audit: the str-normalization above can hide renderings the
        # driver's (arrow/pandas-based) hash distinguishes — e.g. a Spark
        # DECIMAL arriving as Decimal('3881.70') vs DuckDB's float64
        # 3881.7 (the one red cell of round 2).  Flag any column whose
        # Python value types differ between engines.
        if srows and orows:
            for ci, col in enumerate(scols):
                st = next((type(r[ci]).__name__ for r in sraw
                           if r[ci] is not None), None)
                ot = next((type(r[ci]).__name__ for r in oraw
                           if r[ci] is not None), None)
                if st and ot and st != ot and {st, ot} != {"int", "bool"}:
                    print(f"WARN  {name}.{col}: value types differ "
                          f"(spark={st}, oracle={ot}) — str-normalized "
                          f"compare may pass where the driver's hash "
                          f"fails; align the types in both engines")
        if srows != orows:
            only_s = [r for r in srows if r not in set(orows)][:3]
            only_o = [r for r in orows if r not in set(srows)][:3]
            print(f"FAIL  {name}: {len(srows)} vs {len(orows)} rows; "
                  f"spark-only={only_s} oracle-only={only_o}")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(srows)} rows")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
