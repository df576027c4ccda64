"""Deterministic corpus sampling & splitting — training-data staples.

A 100-TB corpus pipeline constantly needs (a) a train/val/test split
that is STABLE across reruns, cluster sizes, and partitionings, and
(b) per-stratum downsampling (e.g. cap the English share, keep all of a
rare language).  Spark's ``df.sample``/``randomSplit`` are seeded per
*partition*, so the assignment changes whenever the partitioning does —
useless as a durable corpus identity.  Both operators here key off the
portable 60-bit md5 hash family (``functions/hashing.py``), so:

* the assignment is a pure function of ``(seed, id)`` — rerunning on a
  1000-executor cluster, a laptop, or DuckDB yields byte-identical
  membership (the oracle twins mirror the same formula);
* the plan is a zero-shuffle projection/filter — whole-stage codegen,
  no RNG state, no exchange, survives any scale-up by construction;
* new rows joining the corpus never reshuffle old rows' assignments
  (the property consistent-hashing gives caches).

Reference analogue: none (the reference is a CDC connector); these are
the corpus-side operators the brief's training-data pipeline needs.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from debezium_connector_db2_spark.functions.hashing import h60, h60_sql

#: Hash-space modulus: 6 decimal digits of uniformity is enough for
#: corpus rates and keeps the SQL twin a one-liner.
_MOD = 1_000_000


def _unit(id_col: Column, seed: int) -> Column:
    """Deterministic uniform-ish u ∈ [0, 1) from (seed, id)."""
    key = F.concat_ws(":", F.lit(f"samp{seed}"), id_col.cast("string"))
    return (h60(key) % _MOD) / F.lit(float(_MOD))


def _unit_sql(id_expr: str, seed: int) -> str:
    """DuckDB twin of :func:`_unit` (same md5 prefix, same modulus)."""
    h = h60_sql(f"'samp{seed}' || ':' || CAST({id_expr} AS VARCHAR)")
    return f"(({h}) % {_MOD}) / {float(_MOD)}"


def _sql_str(s: str) -> str:
    """Render a key as a single-quoted SQL literal, doubling embedded
    quotes — keeps the DuckDB twins byte-faithful to the Spark side's
    literal handling for names like ``o'brien``."""
    return "'" + str(s).replace("'", "''") + "'"


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Sequence[tuple[str, float]],
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test/...) by hashing
    its id against cumulative weight boundaries.  ``weights`` is an
    ordered ``[(name, weight), ...]`` (weights need not sum to 1; they
    are normalized).  Adds ``out_col``; never drops rows.

    Stable: a row's split depends only on ``(seed, id)`` — not on the
    corpus size, ordering, or partitioning — so later pipeline runs on a
    grown corpus keep every old row in its original split (no test-set
    leakage into train when the crawl grows).
    """
    if not weights:
        raise ValueError("hash_split needs at least one (name, weight)")
    total = float(sum(w for _, w in weights))
    if total <= 0:
        raise ValueError("hash_split weights must sum to > 0")
    u = _unit(F.col(id_col), seed)
    expr = None
    acc = 0.0
    for name, w in weights[:-1]:
        acc += w / total
        cond = u < F.lit(acc)
        expr = (F.when(cond, name) if expr is None
                else expr.when(cond, name))
    last = weights[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def hash_split_sql(id_expr: str, weights: Sequence[tuple[str, float]],
                   seed: int = 0) -> str:
    """DuckDB CASE expression mirroring :func:`hash_split` exactly."""
    total = float(sum(w for _, w in weights))
    u = _unit_sql(id_expr, seed)
    parts, acc = [], 0.0
    for name, w in weights[:-1]:
        acc += w / total
        parts.append(f"WHEN {u} < {acc!r} THEN {_sql_str(name)}")
    body = " ".join(parts)
    return f"CASE {body} ELSE {_sql_str(weights[-1][0])} END"


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Keep each row with its stratum's probability — deterministically
    (membership is a pure function of ``(seed, id)``), so reruns and
    resumed pipelines sample the SAME rows.  Strata absent from
    ``rates`` fall back to ``default_rate`` (0 = drop, 1 = keep all).

    Scale shape: the per-stratum rate is a chained ``when`` over the
    (small, driver-known) rate table — a zero-shuffle codegen'd filter;
    no sampling state, no exchange, no per-partition RNG.  The common
    100-TB use: cap the dominant-language share while keeping rare
    strata whole, without materializing per-stratum counts first.
    """
    for k, r in rates.items():
        if not (0.0 <= float(r) <= 1.0):
            raise ValueError(f"rate for stratum {k!r} must be in [0,1]")
    if not (0.0 <= float(default_rate) <= 1.0):
        raise ValueError("default_rate must be in [0,1]")
    rate = None
    for k, r in rates.items():
        cond = F.col(stratum_col) == F.lit(k)
        rate = (F.when(cond, float(r)) if rate is None
                else rate.when(cond, float(r)))
    rate = (F.lit(float(default_rate)) if rate is None
            else rate.otherwise(float(default_rate)))
    u = _unit(F.col(id_col), seed)
    return df.where(u < rate)


def stratified_sample_sql(id_expr: str, stratum_expr: str,
                          rates: Mapping[str, float],
                          default_rate: float = 0.0,
                          seed: int = 0) -> str:
    """DuckDB predicate mirroring :func:`stratified_sample` exactly."""
    u = _unit_sql(id_expr, seed)
    whens = " ".join(f"WHEN {stratum_expr} = {_sql_str(k)} THEN {float(r)!r}"
                     for k, r in rates.items())
    case = f"CASE {whens} ELSE {float(default_rate)!r} END"
    return f"({u}) < ({case})"


def mixture_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    target_shares: Mapping[str, float],
    token_col: str,
    token_budget: float | None = None,
    seed: int = 0,
) -> DataFrame:
    """Data mixing: deterministically downsample each domain so the
    SAMPLED corpus' token mass approaches ``target_shares`` — the
    "rebalance the English share / upweight code" step every
    pre-training run performs (GPT-3 §2.2, The Pile §1, DoReMi's static
    baseline).

    Mechanics: per-domain token totals ``T_d`` (one map-side-combined
    groupBy over a handful of domains), the largest achievable sampled
    size without upsampling ``S* = min_d T_d / w_d`` (w = normalized
    target), optionally capped by ``token_budget``; each domain keeps
    ``rate_d = min(1, w_d * min(S*, budget) / T_d)`` of its rows by the
    same pure-function-of-``(seed, id)`` hash the other samplers use.
    Domains absent from ``target_shares`` get rate 0.

    Scale shape: phase 1 is one tiny aggregate (|domains| rows); the
    rate table re-joins the corpus BROADCAST, so the corpus itself never
    shuffles — the scan-side cost is one hash probe + one filter.
    Keep/drop is emitted as a flag (with the rate and token count) so a
    pipeline can audit the realized mixture without re-scanning.

    Output: ``(id_col, domain_col, n_tokens, keep_rate, keep)``.
    """
    if not target_shares:
        raise ValueError("mixture_sample needs at least one target share")
    total_w = float(sum(target_shares.values()))
    if total_w <= 0:
        raise ValueError("target shares must sum to > 0")
    shares = {k: float(w) / total_w for k, w in target_shares.items()}

    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(k, w) for k, w in shares.items()], f"{domain_col}: string, __w: double")
    tok = F.col(token_col).cast("double")
    tot = (df.groupBy(domain_col)
           .agg(F.sum(tok).alias("__t"))
           .join(tgt, domain_col, "inner"))
    smax = tot.select(F.min(F.col("__t") / F.col("__w")).alias("__smax"))
    budget_expr = (F.least(F.col("__smax"), F.lit(float(token_budget)))
                   if token_budget is not None else F.col("__smax"))
    rates = (tot.crossJoin(smax)
             .select(F.col(domain_col),
                     F.least(F.lit(1.0),
                             (F.col("__w") * budget_expr) / F.col("__t"))
                     .alias("__rate")))
    u = _unit(F.col(id_col), seed)
    return (df.join(F.broadcast(rates), domain_col, "left")
            .select(F.col(id_col), F.col(domain_col),
                    F.col(token_col).cast("long").alias("n_tokens"),
                    F.round(F.coalesce(F.col("__rate"), F.lit(0.0)), 6)
                    .alias("keep_rate"),
                    (u < F.coalesce(F.col("__rate"), F.lit(0.0)))
                    .alias("keep")))


def mixture_sample_sql(
    table: str,
    id_expr: str,
    domain_expr: str,
    target_shares: Mapping[str, float],
    token_expr: str,
    token_budget: float | None = None,
    seed: int = 0,
) -> str:
    """DuckDB twin of :func:`mixture_sample` (same normalization, same
    double-arithmetic order, same hash)."""
    total_w = float(sum(target_shares.values()))
    shares = {k: float(w) / total_w for k, w in target_shares.items()}
    vals = ", ".join(f"({_sql_str(k)}, {w!r})" for k, w in shares.items())
    u = _unit_sql(id_expr, seed)
    budget = (f"least(__smax, {float(token_budget)!r})"
              if token_budget is not None else "__smax")
    return f"""
    WITH tgt(domain_key, __w) AS (VALUES {vals}),
    tot AS (
        SELECT {domain_expr} AS domain_key,
               sum(CAST({token_expr} AS DOUBLE)) AS __t
        FROM {table} GROUP BY 1
    ),
    jt AS (SELECT * FROM tot JOIN tgt USING (domain_key)),
    sm AS (SELECT min(__t / __w) AS __smax FROM jt),
    rates AS (
        SELECT domain_key,
               least(1.0, (__w * {budget}) / __t) AS __rate
        FROM jt CROSS JOIN sm
    )
    SELECT {id_expr}, {domain_expr},
           CAST({token_expr} AS BIGINT) AS n_tokens,
           round(coalesce(__rate, 0.0), 6) AS keep_rate,
           ({u}) < coalesce(__rate, 0.0) AS keep
    FROM {table} LEFT JOIN rates ON {domain_expr} = domain_key
    """
