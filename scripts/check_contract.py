"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, and
compare row counts + order-insensitive values.

Usage: PYTHONPATH=/root/repo python scripts/check_contract.py [sf_dir] [names...]

Also importable (tests/test_oracle_parity.py uses :func:`check_one` to
hold the extra_queries() overflow — the operators beyond the driver's
50-row gate — to the same compare).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t)}.parquet'"
        )
    return con


def check_one(spark, con, name: str, fn, oracle: str | None, sf_dir: str):
    """Run one query on Spark and its oracle on DuckDB; return
    (ok: bool, detail: str).  ``oracle=None`` -> rows-only check."""
    sdf = fn(spark, sf_dir)
    scols = sorted(sdf.columns)
    sraw = [tuple(r) for r in sdf.select(*scols).collect()]
    srows = sorted([tuple(norm(v) for v in r) for r in sraw])
    if oracle is None:
        return True, f"{len(srows)} rows (no oracle — rows-only)"
    rel = con.sql(oracle)
    ocols_raw = rel.columns
    order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
    ocols = [ocols_raw[i] for i in order]
    oraw = [tuple(r[i] for i in order) for r in rel.fetchall()]
    orows = sorted([tuple(norm(v) for v in r) for r in oraw])
    if scols != ocols:
        return False, f"columns {scols} vs {ocols}"
    warns = []
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
                warns.append(f"{col}: spark={st} vs oracle={ot}")
    if srows != orows:
        only_s = [r for r in srows if r not in set(orows)][:3]
        only_o = [r for r in orows if r not in set(srows)][:3]
        return False, (f"{len(srows)} vs {len(orows)} rows; "
                       f"spark-only={only_s} oracle-only={only_o}")
    detail = f"{len(srows)} rows"
    if warns:
        detail += f" (type WARN: {'; '.join(warns)})"
    return True, detail


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    con = duck_connection(sf_dir)
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

    qs = dict(entrymod.queries())
    qs.update(entrymod.extra_queries())
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ok, detail = check_one(spark, con, name, fn,
                                   oracles.get(name), sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"error {type(e).__name__}: {e}"
        if "WARN" in detail:
            print(f"WARN  {name}: {detail}")
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {detail}")
        n_pass += ok
        n_fail += not ok
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
