"""SemDeDup (operators/similarity.py:semdedup): drop rule matches a
driver-side re-derivation, planted paraphrase pairs are caught, the
literal and broadcast assignment strategies agree, and the DuckDB twin
is byte-identical."""

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from debezium_connector_db2_spark.operators.similarity import (
    semdedup,
    semdedup_sql,
)

DIM = 8


def _vec(rng_i: int) -> list[float]:
    # deterministic pseudo-random vector; independent draws keep distinct
    # base vectors far from any 0.99-cosine collision in 8 dims
    return [random.Random(rng_i * 1000 + d).uniform(-1, 1)
            for d in range(DIM)]


def _corpus(spark, n=60, planted=5):
    """n base vectors + `planted` near-copies (tiny perturbation) of the
    first `planted` base vectors."""
    rows = [(i, _vec(i)) for i in range(n)]
    rows += [(1000 + i, [x + 0.001 * d for d, x in enumerate(_vec(i))])
             for i in range(planted)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_planted_near_dups_are_dropped_once(spark):
    df = _corpus(spark)
    out = semdedup(df, n_cells=4, threshold=0.99, seed=3).collect()
    by_id = {r.vec_id: r for r in out}
    assert len(by_id) == 65                     # one row per input row
    for i in range(5):
        pair_keeps = [by_id[i].keep, by_id[1000 + i].keep]
        # the two copies land in the same cell; exactly one survives
        assert by_id[i].cell == by_id[1000 + i].cell
        assert sorted(pair_keeps) == [False, True], (i, pair_keeps)
    # far-apart base vectors survive
    assert sum(1 for r in out if r.keep) == 60


def test_drop_rule_matches_rederivation(spark):
    """An item is dropped iff an earlier-ranked (higher centroid cosine,
    ties to smaller id) member of its cell is >= threshold cosine."""
    df = _corpus(spark, n=40, planted=4)
    th = 0.9
    out = {r.vec_id: r for r in
           semdedup(df, n_cells=3, threshold=th, seed=7).collect()}
    vecs = {r.vec_id: list(r.embedding) for r in df.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    cells = {}
    for vid, r in out.items():
        cells.setdefault(r.cell, []).append(vid)
    for cell, members in cells.items():
        ranked = sorted(members,
                        key=lambda v: (-out[v].cell_cos, v))
        for i, vid in enumerate(ranked):
            expect_drop = any(
                round(cos(vecs[e], vecs[vid]), 4) >= th
                for e in ranked[:i])
            assert out[vid].keep == (not expect_drop), (cell, vid)


def test_literal_and_broadcast_strategies_agree(spark):
    df = _corpus(spark)
    lit = sorted(semdedup(df, n_cells=4, threshold=0.99, seed=3).collect())
    bc = sorted(semdedup(df, n_cells=4, threshold=0.99, seed=3,
                         max_literal_centroid_terms=1).collect())
    assert lit == bc


def test_duckdb_twin_byte_identical(spark, tmp_path):
    df = _corpus(spark)
    p = str(tmp_path / "emb.parquet")
    df.write.parquet(p)
    got = sorted(semdedup(spark.read.parquet(p), n_cells=4,
                          threshold=0.99, seed=3).collect())
    con = duckdb.connect()
    sql = semdedup_sql(f"read_parquet('{p}/*.parquet')", "vec_id",
                       "embedding", dim=DIM, n_cells=4,
                       threshold=0.99, seed=3)
    want = sorted(con.execute(sql).fetchall())
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert tuple(g) == pytest.approx(tuple(w)), (g, w)


def test_cell_size_cap_and_drop_stats(spark):
    """Opt-in degenerate-cell skew guard (same contract as the minhash
    band-bucket cap): cells over max_cell_size are excluded from the
    pairwise stage — all their members keep — and drop_stats reports
    what was skipped; uncapped behavior is unchanged."""
    df = _corpus(spark)
    base = {r.vec_id: r for r in semdedup(
        df, n_cells=4, threshold=0.99, seed=3).collect()}
    sizes = {}
    for r in base.values():
        sizes[r.cell] = sizes.get(r.cell, 0) + 1
    cap = sorted(sizes.values())[0]     # cap below the largest cell(s)
    assert max(sizes.values()) > cap

    stats = {}
    capped = {r.vec_id: r for r in semdedup(
        df, n_cells=4, threshold=0.99, seed=3,
        max_cell_size=cap, drop_stats=stats).collect()}
    assert len(capped) == len(base)     # still one row per input row
    over = {c for c, n in sizes.items() if n > cap}
    assert stats["dropped_cells"] == len(over)
    assert stats["dropped_rows"] == sum(sizes[c] for c in over)
    assert stats["max_cell_seen"] == max(sizes.values())
    for vid, r in capped.items():
        if r.cell in over:
            assert r.keep, (vid, r)     # over-cap cells: everyone keeps
        else:
            assert r.keep == base[vid].keep, (vid, r)

    # a cap above every cell is a no-op and reports zero drops
    stats2 = {}
    nodrop = {r.vec_id: r.keep for r in semdedup(
        df, n_cells=4, threshold=0.99, seed=3,
        max_cell_size=10_000, drop_stats=stats2).collect()}
    assert stats2 == {"dropped_cells": 0, "dropped_rows": 0,
                      "max_cell_seen": max(sizes.values())}
    assert nodrop == {vid: r.keep for vid, r in base.items()}
