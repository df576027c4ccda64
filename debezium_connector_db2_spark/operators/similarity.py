"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force top-k: broadcast the (small) query set,
  JVM-native dot product via ``zip_with``/``aggregate`` (no Python).  The
  baseline and the exactness oracle.
* ``lsh_ann_topk`` — the scale path: sign-random-projection LSH buckets;
  each item is compared only against queries sharing a bucket, turning the
  n_items × n_queries cross join into bucket-equijoins.  Hyperplanes are
  derived from the portable md5 hash family, so the partitioning is
  deterministic and oracle-reproducible.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from debezium_connector_db2_spark.functions.hashing import seeded


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _lit_text(v) -> str:
    """SQL text of a (possibly nested) double/long literal array.

    Value-exact: ``repr(float)`` is the shortest round-tripping decimal
    and both engines' parsers round it to the identical IEEE double; the
    ``D`` suffix keeps Spark from reading plain decimals as DECIMAL.
    """
    if isinstance(v, (list, tuple)):
        return "array(" + ",".join(_lit_text(x) for x in v) + ")"
    if isinstance(v, int):
        return f"{v}L"
    return f"{float(v)!r}D"


def _alit(v) -> F.Column:
    """Array literal in ONE py4j call.  ``F.array(*[F.lit(x) ...])``
    costs two driver round-trips per element — building the PQ
    encoder's 1024-term codebook that way measured ~4 s of pure
    plan-construction time per call (the query itself ran in 1.3 s);
    shipping the SQL text once and letting Catalyst parse/fold it is
    O(1) round-trips for the same literal tree."""
    return F.expr(_lit_text(v))


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    ))


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


# ---------------------------------------------------------------------------
# Dim-specialized (unrolled) vector arithmetic — used SELECTIVELY.
#
# Spark's higher-order array functions (aggregate/zip_with/transform) are
# CodegenFallback — every element of every row walks the interpreted
# expression evaluator.  When the vector length is known, the same
# left-fold unrolls into a flat `0.0 + a[0]*b[0] + a[1]*b[1] + ...`
# expression that whole-stage codegen compiles — measured 2.2-2.6× faster
# per dot at dim 64 in isolation, with IDENTICAL results: the unrolled sum
# performs the exact same IEEE multiplies/adds in the exact same
# left-associated order as the HOF fold, so every double is bit-equal.
#
# `dim` is a SPECULATIVE hint, never a contract: the expression guards on
# `size(v) = dim` and falls back to the original HOF form otherwise (a
# ragged or NULL vector takes the old path and produces the old value),
# so ``dot_expr`` is universally substitutable for ``_dot``.
#
# SELECTIVELY, because the unrolled tree is ~64× the HOF tree and Catalyst
# duplicates project expressions freely (CollapseProject): applied across
# the composite IVF/PQ plans (cell scores, PQ encode, ADC, norms, LSH
# buckets) the giant trees ended up copied into several operators —
# megabyte task binaries, seconds of analysis per transform — and those
# queries got 3-5× SLOWER (measured, see OPTIMIZATION_r08.md).  The win
# survives only where the expression sits in ONE terminal projection that
# nothing downstream re-inlines: the pair-verify dot in
# :func:`embedding_near_dup_pairs` (floor 4.20 → 2.84 s).  Keep it that
# narrow.
# ---------------------------------------------------------------------------


def _unrolled_dot_sql(a: str, b: str, dim: int) -> str:
    return "(0.0D" + "".join(
        f" + CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(dim)) + ")"


def dot_expr(a: str, b: str, dim: int) -> F.Column:
    """Dot of two array columns (by name), unrolled when both have
    exactly ``dim`` elements; bit-identical HOF fallback otherwise."""
    qa, qb = f"`{a}`", f"`{b}`"
    fast = F.expr(_unrolled_dot_sql(qa, qb, dim))
    return F.when(
        F.expr(f"size({qa}) = {dim} AND size({qb}) = {dim}"), fast
    ).otherwise(_dot(F.col(a), F.col(b)))


def cosine_topk(
    items: DataFrame, queries: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 10, round_to: int = 4,
) -> DataFrame:
    """For every query vector, the k nearest items by cosine similarity.

    Output: (query_id, item_id, cos, rank).  ``queries`` must be small —
    it is broadcast, so the scan of ``items`` stays a single pass with no
    shuffle of the big side.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    it = items.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("ivec"))
    scored = (
        it.join(F.broadcast(q))
        .where(F.col("item_id") != F.col("query_id"))
        .select(
            "query_id", "item_id",
            F.round(cosine_expr(F.col("ivec"), F.col("qvec")), round_to).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _plane(dim: int, plane_idx: int, seed: int = 7) -> list[float]:
    """Deterministic pseudo-random hyperplane component in [-1, 1].

    Pure function of (plane_idx, dim_idx) via the portable md5-60bit hash —
    identical in the DuckDB oracle.
    """
    import hashlib

    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"{seed}:p{plane_idx}:d{d}".encode()).hexdigest()[:15], 16)
        out.append((h % 2_000_001) / 1_000_000.0 - 1.0)
    return out


def lsh_bucket_expr(vec_col, dim: int, n_planes: int = 8, seed: int = 7):
    """Sign-LSH bucket id: bit i = sign(v · plane_i).  Deliberately the
    HOF form: the bucket feeds join keys/explodes, where an unrolled
    tree gets duplicated by the planner (measured 0.83 → 1.76 s on
    ann_lsh_topk — see the dim-specialization note above)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = _alit(_plane(dim, p, seed))  # one-call literal (_alit)
        bucket = bucket + F.when(_dot(vec_col, plane) > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int = 64, threshold: float = 0.9, n_planes: int = 8,
    multiprobe_bits: int = 1, max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the fifth dedup family.

    Scale shape: sign-LSH bucket each vector once, generate candidates by
    bucket equi-join (one side multiprobed at Hamming≤1 so near-identical
    vectors that straddle one hyperplane still meet), verify candidates
    with the exact cosine, keep pairs ≥ ``threshold``.  Linear in corpus
    size + candidate count; never an all-pairs cross join.
    ``max_bucket_size`` caps degenerate buckets (e.g. millions of zero
    vectors) the same way the simhash cap does.
    Output: (id_a, id_b, cos) with id_a < id_b.
    """
    # norms are computed ONCE per vector here, not per candidate pair:
    # higher-order array functions are interpreted (not codegen'd), so
    # keeping only the dot product on the per-candidate path is a ~3× win;
    # dot/(na*nb) is the exact same double arithmetic as the inline cosine
    v = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).withColumn("bucket0", lsh_bucket_expr(F.col("vec"), dim, n_planes)) \
     .withColumn("nrm", _norm(F.col("vec")))

    a = v.select(F.col("vid").alias("id_a"), F.col("vec").alias("va"),
                 F.col("nrm").alias("na"), F.col("bucket0").alias("bucket"))
    probes = [F.col("bucket0")]
    if multiprobe_bits >= 1:
        probes += [F.col("bucket0").bitwiseXOR(F.lit(1 << p))
                   for p in range(n_planes)]
    b = (v.withColumn("bucket", F.explode(F.array(*probes)))
         .select(F.col("vid").alias("id_b"), F.col("vec").alias("vb"),
                 F.col("nrm").alias("nb"), "bucket"))
    if max_bucket_size is not None:
        keep = (a.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
                .where(F.col("n") <= max_bucket_size).select("bucket"))
        a = a.join(keep, "bucket", "left_semi")
        b = b.join(keep, "bucket", "left_semi")
    # no distinct needed: id_a sits in its ONE bucket and id_b's probe
    # set {b, b^1, b^2, ...} has pairwise-distinct values, so at most
    # one probe of b can equal a's bucket — the equi-join emits each
    # ordered (id_a, id_b) pair at most once; the old trailing distinct
    # was a pure extra exchange of the surviving pair set
    return (a.join(b, "bucket")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.round(dot_expr("va", "vb", dim)
                            / (F.col("na") * F.col("nb")), 4).alias("cos"))
            .where(F.col("cos") >= threshold))


def lsh_ann_topk(
    items: DataFrame, queries: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int = 64, k: int = 10, n_planes: int = 6,
    round_to: int = 4, multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: compare only within matching LSH buckets.

    ``multiprobe_bits=1`` also probes every bucket at Hamming distance 1
    from the query's bucket (standard multiprobe LSH), trading a
    (n_planes+1)× query fanout for much better recall.  Queries stay
    broadcast: fanout applies to the small side only.
    """
    it = items.select(
        F.col(id_col).alias("item_id"), F.col(vec_col).alias("ivec")
    ).withColumn("bucket", lsh_bucket_expr(F.col("ivec"), dim, n_planes))

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).withColumn("bucket0", lsh_bucket_expr(F.col("qvec"), dim, n_planes))
    probes = [F.col("bucket0")]
    if multiprobe_bits >= 1:
        probes += [
            F.col("bucket0").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
        ]
    q = q.withColumn("bucket", F.explode(F.array(*probes))).drop("bucket0")

    scored = (
        it.join(F.broadcast(q), "bucket")
        .where(F.col("item_id") != F.col("query_id"))
        .select(
            "query_id", "item_id",
            F.round(cosine_expr(F.col("ivec"), F.col("qvec")), round_to).alias("cos"),
        )
        # no distinct: an item sits in ONE bucket and a query's probe
        # set {b, b^1, b^2, ...} has pairwise-distinct values, so at
        # most one probe of a query can equal the item's bucket — the
        # join cannot emit a (query, item) pair twice
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("item_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivf_centroids(
    items: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    n_cells: int = 8, seed: int = 11, refine_iters: int = 0,
) -> list[tuple]:
    """IVF coarse quantizer: ``n_cells`` centroid vectors chosen as a
    deterministic pseudo-random sample (smallest portable hash of the
    id), optionally refined by ``refine_iters`` Lloyd rounds.  The
    seeded sample is the standard cheap initializer and keeps the DuckDB
    oracle exact (the graded ``ann_ivf_topk`` row runs with
    ``refine_iters=0``); real recall wants a few k-means rounds — see
    :func:`_lloyd_round` for the distributed shape.  Returns driver-side
    ``[(cent_id, [components], norm)]`` — the bounded "model artifact"
    (n_cells rows), embedded in the plan as literals the way FAISS ships
    its coarse quantizer to every worker.
    """
    from debezium_connector_db2_spark.functions.hashing import h60

    rows = (items
            .select(F.col(id_col).alias("cent_id"),
                    F.col(vec_col).alias("cvec"),
                    h60(F.concat(F.lit(f"cent{seed}:"),
                                 F.col(id_col).cast("string"))).alias("h"))
            .orderBy("h", "cent_id").limit(n_cells).collect())
    out = []
    for r in rows:
        comps = [float(x) for x in r.cvec]
        # left-fold in index order — the same IEEE op sequence as the
        # engine/oracle folds, so the literal matches bit-for-bit
        acc = 0.0
        for x in comps:
            acc += x * x
        out.append((r.cent_id, comps, math.sqrt(acc)))
    for _ in range(refine_iters):
        out = _lloyd_round(items, id_col, vec_col, out)
    return out


def _lloyd_round(items: DataFrame, id_col: str, vec_col: str,
                 cents: list[tuple],
                 max_literal_centroid_terms: int = 10_000) -> list[tuple]:
    """One distributed Lloyd iteration: assign every item to its nearest
    cell under the SAME rule the search path uses (max dot/|c|, ties to
    the smaller cent_id), then move each centroid to its cell's
    element-wise mean.

    Scale shape: assignment reuses the search path's two strategies —
    zero-shuffle literal centroids at small ``n_cells × dim``, broadcast
    centroids + map-side-combined per-item argmax above the threshold
    (see :func:`ivf_topk`); the mean is an (item → dim rows) explode
    into ONE map-side-combined groupBy on (cell, component-index) —
    shuffle volume is ``n_cells × dim`` partial sums per partition
    regardless of corpus size, and the driver collects only
    ``n_cells × dim`` result rows (the same bounded-model contract as
    the sampler).  Empty cells keep their previous centroid.  Centroid
    labels are stable across rounds so repeated refinement composes with
    the search path unchanged.
    """
    dim = len(cents[0][1]) if cents else 0
    if len(cents) * dim <= max_literal_centroid_terms:
        assigned = items.select(
            F.col(vec_col).alias("v"),
            (-F.array_max(_cell_scores(F.col(vec_col), cents))["ncid"])
            .alias("cell"),
        )
    else:
        spark = items.sparkSession
        cent_df = spark.createDataFrame(
            [(int(cid), [float(x) for x in comps], float(cnorm))
             for cid, comps, cnorm in cents],
            "cent_id: long, cvec: array<double>, cnorm: double")
        score = (_dot(F.col("v"), F.col("cvec")) / F.col("cnorm"))
        assigned = (
            items.select(F.col(id_col).alias("__id"),
                         F.col(vec_col).alias("v"))
            .join(F.broadcast(cent_df))
            .groupBy("__id")
            .agg(F.any_value("v").alias("v"),
                 F.max(F.struct(score.alias("s"),
                                (-F.col("cent_id")).alias("ncid")))
                 .alias("__best"))
            .select("v", (-F.col("__best.ncid")).alias("cell"))
        )
    sums = (
        assigned
        .select("cell", F.posexplode(F.col("v")).alias("i", "x"))
        .groupBy("cell", "i")
        .agg(F.sum(F.col("x").cast("double")).alias("s"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_cell: dict[int, dict[int, tuple]] = {}
    for r in sums:
        by_cell.setdefault(int(r.cell), {})[int(r.i)] = (float(r.s), int(r.n))
    out = []
    for cent_id, comps, cnorm in cents:
        got = by_cell.get(int(cent_id))
        if not got:
            out.append((cent_id, comps, cnorm))  # empty cell: keep
            continue
        # A ragged vector column (rows shorter/longer than the centroid
        # dim) would otherwise KeyError mid-refinement or silently skew
        # the mean (per-component counts diverge) — fail with the cause.
        if len(got) != len(comps) or len({n for _, n in got.values()}) > 1:
            raise ValueError(
                f"_lloyd_round: ragged vector column — cell {cent_id} has "
                f"component indexes 0..{max(got)} with per-component counts "
                f"{sorted({n for _, n in got.values()})}, centroid dim is "
                f"{len(comps)}; all vectors must have uniform length")
        mean = [got[i][0] / got[i][1] for i in range(len(comps))]
        acc = 0.0
        for x in mean:
            acc += x * x
        nrm = math.sqrt(acc)
        if nrm == 0.0:
            out.append((cent_id, comps, cnorm))
            continue
        out.append((cent_id, mean, nrm))
    return out


def _cell_scores(vec_col, cents) -> F.Column:
    """Array of struct(score, -cent_id) per centroid; score = dot/|c|
    (the row's own norm is constant across cells, so it can't change the
    argmax and is left out).  All-literal centroid arrays keep this one
    map-side pass with zero shuffle.

    Built as ONE ``transform`` over the literal centroid matrix instead
    of a per-centroid ``F.array(struct(_dot(...)))`` comprehension: the
    element values (same dot, same norm division, same ``-cent_id`` long,
    same array order) are identical, but construction is O(1) driver
    round-trips instead of O(n_cells × dim) — see :func:`_alit`.
    """
    if not cents:
        return F.array()
    cv = _alit([comps for _, comps, _ in cents])
    cn = _alit([float(cnorm) for _, _, cnorm in cents])
    nid = _alit([-int(cent_id) for cent_id, _, _ in cents])
    return F.transform(cv, lambda comps, i: F.struct(
        (_dot(vec_col, comps) / F.get(cn, i)).alias("s"),
        F.get(nid, i).alias("ncid")))


def ivf_topk(
    items: DataFrame, queries: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 10, n_cells: int = 8, nprobe: int = 3,
    seed: int = 11, round_to: int = 4,
    max_literal_centroid_terms: int = 10_000,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k — the inverted-file scale path beside
    ``lsh_ann_topk``.

    Index: every item is assigned to its nearest centroid cell.
    Search: each query probes its ``nprobe`` nearest cells; candidates
    come from cell equi-joins with the (broadcast) query set, verified
    with the exact cosine, top-k per query.  Probing cost is
    ``nprobe/n_cells`` of the corpus per query instead of all of it; at
    10^10 vectors the cell assignment is a one-off index column you would
    persist alongside the embedding.

    Cell assignment has two physical strategies, same semantics:

    * **literal** (``n_cells × dim <= max_literal_centroid_terms``) —
      centroids embedded in the plan as literals, one map-side pass,
      zero shuffle and zero extra join.  Right for a handful of cells,
      but codegen/plan size grows with every literal.
    * **broadcast** (above the threshold) — centroids become a
      broadcast DataFrame; assignment is a broadcast join with the
      corpus followed by a map-side-combined argmax per item.  At real
      IVF sizes (thousands to 65k cells) this keeps the plan O(1) and
      ships the quantizer once per executor, the way FAISS ships its
      coarse quantizer — never a shuffle of the corpus.

    Output: (query_id, item_id, cos, rank).
    """
    cents = ivf_centroids(items, id_col, vec_col, n_cells, seed,
                          refine_iters=refine_iters)
    dim = len(cents[0][1]) if cents else 0

    it = items.select(
        F.col(id_col).alias("item_id"), F.col(vec_col).alias("ivec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    if len(cents) * dim <= max_literal_centroid_terms:
        it = it.withColumn(
            "cell",
            -F.array_max(_cell_scores(F.col("ivec"), cents))["ncid"],
        )
        q = q.withColumn(
            "__top",
            F.slice(F.reverse(F.array_sort(_cell_scores(F.col("qvec"),
                                                        cents))),
                    1, nprobe),
        ).select("query_id", "qvec", F.explode("__top").alias("__probe")) \
         .withColumn("cell", -F.col("__probe.ncid")).drop("__probe")
    else:
        spark = items.sparkSession
        cent_df = spark.createDataFrame(
            [(int(cid), [float(x) for x in comps], float(cnorm))
             for cid, comps, cnorm in cents],
            "cent_id: long, cvec: array<double>, cnorm: double")
        # score identical to _cell_scores: dot/|c|, ties to smaller id
        score = (_dot(F.col("ivec"), F.col("cvec")) / F.col("cnorm"))
        it = (it.join(F.broadcast(cent_df))
              .groupBy("item_id")
              .agg(F.any_value("ivec").alias("ivec"),
                   F.max(F.struct(score.alias("s"),
                                  (-F.col("cent_id")).alias("ncid")))
                   .alias("__best"))
              .withColumn("cell", -F.col("__best.ncid")).drop("__best"))
        qscore = (_dot(F.col("qvec"), F.col("cvec")) / F.col("cnorm"))
        wq = Window.partitionBy("query_id").orderBy(
            F.desc("__s"), F.asc("cent_id"))
        q = (q.join(F.broadcast(cent_df))
             .withColumn("__s", qscore)
             .withColumn("__r", F.row_number().over(wq))
             .where(F.col("__r") <= nprobe)
             .select("query_id", "qvec", F.col("cent_id").alias("cell")))

    scored = (
        it.join(F.broadcast(q), "cell")
        .where(F.col("item_id") != F.col("query_id"))
        .select(
            "query_id", "item_id",
            F.round(cosine_expr(F.col("ivec"), F.col("qvec")),
                    round_to).alias("cos"),
        )
        # no distinct: each item is in exactly one cell and a query's
        # probed cells are distinct, so the equi-join cannot emit a
        # (query, item) pair twice — a distinct here was a pure extra
        # exchange of the candidate set (same argument as ivf_pq_topk)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("item_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def semdedup(
    items: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    n_cells: int = 8, threshold: float = 0.95, seed: int = 11,
    round_to: int = 4, refine_iters: int = 0,
    max_literal_centroid_terms: int = 10_000,
    max_cell_size: int | None = None,
    drop_stats: dict | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication via embedding clusters — the sixth dedup family, the
    one that catches paraphrases no lexical method sees.

    Method (the paper's, made deterministic): cluster the corpus with
    the IVF coarse quantizer (:func:`ivf_centroids` — same assignment
    rule as the search path), rank each cell's members by cosine to
    their centroid (ties to the smaller id), and drop an item iff some
    *earlier-ranked* member of its cell is within ``threshold`` cosine
    of it.  Keep/drop is emitted as a flag (with the cell and centroid
    cosine) rather than filtering, so a pipeline can re-threshold
    offline.

    Scale shape: centroids are a driver-side bounded artifact shipped
    to executors (literal plan terms below
    ``max_literal_centroid_terms``, broadcast join above — exactly
    :func:`ivf_topk`'s two strategies); assignment is one map-side
    pass; the only corpus shuffles are the hash partition by cell for
    the window rank and the cell equi-join for in-cell pairs.  In-cell
    pairwise cost is the method's intrinsic O(n_cells x (n/n_cells)^2)
    — at 10^10 vectors you raise ``n_cells`` (the paper runs ~100k
    clusters), which *reduces* per-cell work; nothing here is all-pairs
    across cells.

    ``max_cell_size`` is the family's degenerate-cell skew guard (same
    opt-in contract as ``minhash_lsh_pairs``'s band-bucket cap): a cell
    of B members costs B²/2 in-cell comparisons, so a quantizer that
    collapses (too few cells for the corpus, or a degenerate centroid
    attracting everything) turns the intrinsic per-cell quadratic into
    an effective all-pairs.  Cells over the cap are EXCLUDED from the
    pairwise stage — their members all keep, no silent partial dedup —
    and ``drop_stats={}`` gets ``dropped_cells`` / ``dropped_rows`` /
    ``max_cell_seen`` filled in and logged.  The library default is
    ``None`` (uncapped, the paper's exact semantics); corpus-scale
    callers size ``n_cells`` so mean cell size stays fixed and set the
    cap as the safety valve.

    Output: ``(id_col, cell, cell_cos, keep)`` — one row per input row.
    """
    cents = ivf_centroids(items, id_col, vec_col, n_cells, seed,
                          refine_iters=refine_iters)
    dim = len(cents[0][1]) if cents else 0

    it = items.select(F.col(id_col).alias("item_id"),
                      F.col(vec_col).alias("ivec"))
    if len(cents) * dim <= max_literal_centroid_terms:
        best = F.array_max(_cell_scores(F.col("ivec"), cents))
        it = (it.withColumn("__best", best)
              .select("item_id", "ivec",
                      (-F.col("__best.ncid")).alias("cell"),
                      (F.col("__best.s") / _norm(F.col("ivec")))
                      .alias("ccos")))
    else:
        spark = items.sparkSession
        cent_df = spark.createDataFrame(
            [(int(cid), [float(x) for x in comps], float(cnorm))
             for cid, comps, cnorm in cents],
            "cent_id: long, cvec: array<double>, cnorm: double")
        score = (_dot(F.col("ivec"), F.col("cvec")) / F.col("cnorm"))
        it = (it.join(F.broadcast(cent_df))
              .groupBy("item_id")
              .agg(F.any_value("ivec").alias("ivec"),
                   F.max(F.struct(score.alias("s"),
                                  (-F.col("cent_id")).alias("ncid")))
                   .alias("__best"))
              .select("item_id", "ivec",
                      (-F.col("__best.ncid")).alias("cell"),
                      (F.col("__best.s") / _norm(F.col("ivec")))
                      .alias("ccos")))

    w = Window.partitionBy("cell").orderBy(F.desc("ccos"), F.asc("item_id"))
    ranked = it.withColumn("rnk", F.row_number().over(w))
    pairable = ranked
    if max_cell_size is not None:
        # per-cell count table is tiny (≤ n_cells rows); AQE broadcasts
        counts = (ranked.groupBy("cell")
                  .agg(F.count(F.lit(1)).alias("__cn")))
        keep_cells = (counts.where(F.col("__cn") <= max_cell_size)
                      .select("cell"))
        pairable = ranked.join(keep_cells, "cell", "left_semi")
        if drop_stats is not None:
            import logging

            over = (counts.agg(
                F.count(F.when(F.col("__cn") > max_cell_size, 1))
                .alias("c"),
                F.sum(F.when(F.col("__cn") > max_cell_size,
                             F.col("__cn"))).alias("r"),
                F.max("__cn").alias("m")).collect()[0])
            drop_stats["dropped_cells"] = over["c"]
            drop_stats["dropped_rows"] = int(over["r"] or 0)
            drop_stats["max_cell_seen"] = int(over["m"] or 0)
            if over["c"]:
                logging.getLogger(__name__).warning(
                    "semdedup: %d cells over cap %d excluded from "
                    "pairwise (%d rows keep by default)", over["c"],
                    max_cell_size, over["r"])
    a = pairable.select(F.col("cell"), F.col("ivec").alias("va"),
                        F.col("rnk").alias("rnk_a"))
    b = pairable.select(F.col("cell"), F.col("item_id").alias("dropped"),
                        F.col("ivec").alias("vb"), F.col("rnk").alias("rnk_b"))
    drops = (a.join(b, "cell")
             .where(F.col("rnk_a") < F.col("rnk_b"))
             .where(F.round(cosine_expr(F.col("va"), F.col("vb")),
                            round_to) >= threshold)
             .select("dropped").distinct())
    return (ranked
            .join(drops, ranked["item_id"] == drops["dropped"], "left")
            .select(F.col("item_id").alias(id_col), "cell",
                    F.round(F.col("ccos"), round_to).alias("cell_cos"),
                    F.col("dropped").isNull().alias("keep")))


def semdedup_sql(
    table: str, id_expr: str = "vec_id", vec_expr: str = "embedding",
    dim: int = 64, n_cells: int = 8, threshold: float = 0.95,
    seed: int = 11, round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`semdedup` (``refine_iters=0``), including
    centroid selection, nearest-cell assignment, centroid-cosine rank
    and the earlier-ranked-neighbor drop rule — certifying the cluster
    plan, not a brute-force shortcut."""
    from debezium_connector_db2_spark.functions.hashing import h60_sql

    h = h60_sql(f"'cent{seed}:' || CAST({id_expr} AS VARCHAR)")
    cnorm = (f"sqrt(list_sum(list_transform(range(1, {dim + 1}),"
             f" i -> CAST(cvec[i] AS DOUBLE) * CAST(cvec[i] AS DOUBLE))))")
    dot_c = (f"list_sum(list_transform(range(1, {dim + 1}),"
             f" i -> CAST(ivec[i] AS DOUBLE) * CAST(cvec[i] AS DOUBLE)))")
    vnorm = (f"sqrt(list_sum(list_transform(range(1, {dim + 1}),"
             f" i -> CAST(ivec[i] AS DOUBLE) * CAST(ivec[i] AS DOUBLE))))")
    cos_ab = (f"list_sum(list_transform(range(1, {dim + 1}),"
              f" i -> CAST(a.ivec[i] AS DOUBLE) * CAST(b.ivec[i] AS DOUBLE)))"
              f" / (sqrt(list_sum(list_transform(range(1, {dim + 1}),"
              f" i -> CAST(a.ivec[i] AS DOUBLE) * CAST(a.ivec[i] AS DOUBLE))))"
              f" * sqrt(list_sum(list_transform(range(1, {dim + 1}),"
              f" i -> CAST(b.ivec[i] AS DOUBLE) * CAST(b.ivec[i] AS DOUBLE)))))")
    return f"""
        WITH cent0 AS (
          SELECT {id_expr} AS cent_id, {vec_expr} AS cvec
          FROM {table}
          ORDER BY {h}, {id_expr} LIMIT {n_cells}),
        cent AS (SELECT cent_id, cvec, {cnorm} AS cnorm FROM cent0),
        it0 AS (SELECT {id_expr} AS item_id, {vec_expr} AS ivec
                FROM {table}),
        iass AS (
          SELECT item_id, ivec, cent_id, {dot_c} / cnorm AS s
          FROM it0 CROSS JOIN cent),
        it AS (
          SELECT item_id, ivec, cent_id AS cell, s / {vnorm} AS ccos
          FROM iass
          QUALIFY row_number() OVER (PARTITION BY item_id
                                     ORDER BY s DESC, cent_id ASC) = 1),
        r AS (
          SELECT item_id, ivec, cell, ccos,
                 row_number() OVER (PARTITION BY cell
                                    ORDER BY ccos DESC, item_id ASC) AS rnk
          FROM it),
        drops AS (
          SELECT DISTINCT b.item_id AS dropped
          FROM r a JOIN r b ON a.cell = b.cell AND a.rnk < b.rnk
          WHERE round({cos_ab}, {round_to}) >= {threshold})
        SELECT r.item_id AS {id_expr}, r.cell,
               round(r.ccos, {round_to}) AS cell_cos,
               (drops.dropped IS NULL) AS keep
        FROM r LEFT JOIN drops ON r.item_id = drops.dropped
    """


def _pq_lloyd_round(
    items: DataFrame, vec_col: str,
    books: list[list[tuple[int, list[float], float]]],
) -> list[list[tuple[int, list[float], float]]]:
    """One k-means round over ALL subspaces in a single job: every
    subvector is assigned to its L2-nearest code under the SAME rule
    the encoder uses (``|c|² − 2·dot`` argmin, ties to the smaller
    code), then each code moves to its members' element-wise mean.

    Scale shape mirrors :func:`_lloyd_round`: assignment is map-side
    (literal codebooks), the mean is one map-side-combined groupBy on
    ``(subspace, code, component)`` — shuffle volume is
    ``m_sub × ks × d0`` partial sums per partition regardless of corpus
    size, and the driver collects only the model. Empty codes keep
    their previous sub-centroid; code labels are stable across rounds.
    """
    m_sub = len(books)
    d0 = len(books[0][0][1])
    subs = []
    for j in range(m_sub):
        sub = F.slice(F.col(vec_col), j * d0 + 1, d0)
        cv = _alit([comps for _, comps, _ in books[j]])
        cs = _alit([float(sq) for _, _, sq in books[j]])
        cd = _alit([int(code) for code, _, _ in books[j]])
        scores = F.transform(cv, lambda comps, i: F.struct(
            (F.get(cs, i) - F.lit(2.0) * _dot(sub, comps)).alias("d"),
            F.get(cd, i).alias("code")))
        subs.append(F.struct(F.lit(j).alias("j"),
                             F.array_min(scores)["code"].alias("code"),
                             sub.alias("s")))
    rows = (items.select(F.explode(F.array(*subs)).alias("e"))
            .select("e.j", "e.code", F.posexplode("e.s").alias("i", "x"))
            .groupBy("j", "code", "i")
            .agg(F.sum(F.col("x").cast("double")).alias("s"),
                 F.count(F.lit(1)).alias("n"))
            .collect())
    got: dict[tuple[int, int], dict[int, tuple]] = {}
    for r in rows:
        got.setdefault((int(r.j), int(r.code)), {})[int(r.i)] = (
            float(r.s), int(r.n))
    out = []
    for j, book in enumerate(books):
        nb = []
        for code, comps, sq in book:
            comp_sums = got.get((j, code))
            if not comp_sums:
                nb.append((code, comps, sq))  # empty code: keep
                continue
            mean = [comp_sums[i][0] / comp_sums[i][1]
                    for i in range(len(comps))]
            acc = 0.0
            for x in mean:
                acc += x * x
            nb.append((code, mean, acc))
        out.append(nb)
    return out


def pq_codebooks(
    items: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    m_sub: int = 8, ks: int = 16, seed: int = 11,
    refine_iters: int = 0,
) -> list[list[tuple[int, list[float], float]]]:
    """Product-quantization sub-codebooks (Jégou et al. 2011): the
    vector space is split into ``m_sub`` contiguous subspaces and each
    gets ``ks`` sub-centroids — here a deterministic pseudo-random
    sample per subspace (smallest portable hash of ``'pq{seed}:m{j}:'
    || id``; code = position in hash order), the same cheap
    oracle-exact initializer :func:`ivf_centroids` uses — optionally
    refined by ``refine_iters`` rounds of per-subspace k-means
    (:func:`_pq_lloyd_round`; the graded oracle row runs 0 iters, real
    recall wants a few).

    Returns ``[subspace j][(code, components, sq_norm)]`` — the model
    artifact is ``m_sub × ks × (dim/m_sub)`` floats (KBs), the thing PQ
    exists to make small.  ``sq_norm`` is a left-fold in index order so
    both engines reproduce it bit-for-bit.
    """
    from debezium_connector_db2_spark.functions.hashing import h60

    # Single-pass initialization (round-8 optimization): the old form ran
    # m_sub+1 full-corpus jobs — one ``first()`` for dim plus one
    # ``orderBy(h, i).limit(ks)`` TakeOrdered PER subspace.  All m_sub
    # samples are per-subspace hash orders over the SAME rows, so one job
    # computes every subspace's hash column (explode to (j, h, id) — 3
    # narrow longs per row, never the vector) and ranks all subspaces at
    # once; a second, id-pruned job fetches only the m_sub×ks winning
    # vectors.  2 corpus-touching jobs total, and only the first scans
    # every row — the guide-§8 "decide with small rows" shape.  The
    # winner set (h-order per subspace, ties by id) and the sliced
    # components are identical to the per-subspace TakeOrdered's.
    id_str = F.col(id_col).cast("string")
    structs = [
        F.struct(F.lit(j).alias("j"),
                 h60(F.concat(F.lit(f"pq{seed}:m{j}:"), id_str)).alias("h"),
                 F.col(id_col).alias("i"))
        for j in range(m_sub)]
    wj = Window.partitionBy("j").orderBy("h", "i")
    winners = (items.select(F.explode(F.array(*structs)).alias("e"))
               .select("e.j", "e.h", "e.i")
               .withColumn("__r", F.row_number().over(wj))
               .where(F.col("__r") <= ks)
               .select("j", "i", "__r")
               .collect())
    ids = sorted({r.i for r in winners})
    vec_rows = (items.where(F.col(id_col).isin(ids))
                .select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
                .collect())
    vecs = {r.i: [float(x) for x in r.v] for r in vec_rows}
    dim = len(next(iter(vecs.values()))) if vecs else 0
    if dim % m_sub:
        raise ValueError(
            f"pq_codebooks: dim {dim} not divisible by m_sub {m_sub}")
    d0 = dim // m_sub
    by_j: dict[int, list] = {}
    for r in winners:
        by_j.setdefault(int(r.j), []).append(r)
    books = []
    for j in range(m_sub):
        book = []
        for code, r in enumerate(sorted(by_j.get(j, []),
                                        key=lambda x: x["__r"])):
            comps = vecs[r.i][j * d0:(j + 1) * d0]
            acc = 0.0
            for x in comps:
                acc += x * x
            book.append((code, comps, acc))
        books.append(book)
    for _ in range(refine_iters):
        books = _pq_lloyd_round(items, vec_col, books)
    return books


def ivf_pq_topk(
    items: DataFrame, queries: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 10, n_cells: int = 8, nprobe: int = 3,
    m_sub: int = 8, ks: int = 16, refine: int = 50,
    seed: int = 11, round_to: int = 4,
    max_literal_terms: int = 20_000,
    pq_refine_iters: int = 0,
) -> DataFrame:
    """IVF-PQ approximate top-k — the memory-compression scale path.

    At 10^10 vectors the float corpus does not fit an ANN index:
    ``ivf_topk`` still scans full vectors inside probed cells.  PQ
    stores each item as ``m_sub`` small codes (here 4 bits–1 byte each
    — a 32–64× compression) and scores candidates against the (tiny)
    codebooks instead of the raw vectors:

    1. coarse IVF: items → nearest centroid cell; queries probe their
       ``nprobe`` cells (:func:`ivf_centroids`, literal strategy);
    2. encode: per item per subspace, the L2-nearest sub-centroid
       (map-side only — the codebook rides the plan as literals);
    3. ADC: candidate similarity = ``cos(q, reconstruct(codes))``,
       computed by lazily reconstructing the quantized vector from the
       code array — mathematically identical to the classic per-query
       lookup-table ADC (the dot product decomposes over concatenated
       subspaces) and zero-shuffle here;
    4. exact re-rank: the top ``refine`` ADC candidates per query join
       back to the true vectors for exact cosine; final top-``k``.

    The codebook/centroid literals are bounded by
    ``max_literal_terms`` (raises if exceeded): for bigger models the
    broadcast-DataFrame strategy of :func:`ivf_topk` applies to both
    levels unchanged.  Output ``(query_id, item_id, cos, rank)`` —
    ``cos`` is the exact value, same contract as the other ANN paths.
    """
    cents = ivf_centroids(items, id_col, vec_col, n_cells, seed)
    dim = len(cents[0][1]) if cents else 0
    books = pq_codebooks(items, id_col, vec_col, m_sub=m_sub, ks=ks,
                         seed=seed, refine_iters=pq_refine_iters)
    d0 = dim // m_sub
    n_terms = len(cents) * dim + m_sub * ks * d0
    if n_terms > max_literal_terms:
        raise ValueError(
            f"ivf_pq_topk: {n_terms} literal terms exceeds "
            f"max_literal_terms={max_literal_terms}; use the broadcast "
            f"strategy (see ivf_topk) for models this size")

    #: nested literals: CBV[j][code] = sub-centroid vector,
    #: CBS[j][code] = its squared norm (left-fold, engine-identical);
    #: one-call literal builds (_alit) — see the construction-cost note
    cbv = _alit([[comps for _, comps, _ in book] for book in books])
    cbs = _alit([[float(sq) for _, _, sq in book] for book in books])

    it = items.select(F.col(id_col).alias("item_id"),
                      F.col(vec_col).alias("ivec"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"))

    # coarse cells (literal strategy — identical rule to ivf_topk)
    it = it.withColumn(
        "cell", -F.array_max(_cell_scores(F.col("ivec"), cents))["ncid"])
    q = (q.withColumn(
        "__top",
        F.slice(F.reverse(F.array_sort(_cell_scores(F.col("qvec"),
                                                    cents))), 1, nprobe))
        .select("query_id", "qvec", F.explode("__top").alias("__p"))
        .withColumn("cell", -F.col("__p.ncid")).drop("__p"))

    # encode: per subspace j, the L2-nearest code (ties → smaller code).
    # ||x_sub - c||² argmin == argmin over (|c|² - 2·dot) — |x_sub|² is
    # constant per subspace and cannot change the argmin, so it is left
    # out (same trick as _cell_scores).
    def _code(j: int):
        sub = F.slice(F.col("ivec"), j * d0 + 1, d0)
        cv = _alit([comps for _, comps, _ in books[j]])
        cs = _alit([float(sq) for _, _, sq in books[j]])
        cd = _alit([int(code) for code, _, _ in books[j]])
        # one transform per subspace instead of ks per-code _dot builds
        # (identical element values and order → identical argmin)
        scores = F.transform(cv, lambda comps, i: F.struct(
            (F.get(cs, i) - F.lit(2.0) * _dot(sub, comps)).alias("d"),
            F.get(cd, i).alias("code")))
        return F.array_min(scores)["code"]

    it = it.withColumn("codes", F.array(*[_code(j)
                                          for j in range(m_sub)]))
    # the PQ index row is (item_id, cell, codes) — at corpus scale THIS
    # is what you persist; ivec below is only read again by the exact
    # re-rank join
    index = it.select("item_id", "cell", "codes")

    # ADC: reconstruct x̂ from codes (lazy, per candidate) and score
    # cos(q, x̂) with the same flat left-folds the oracle uses
    xhat = F.flatten(F.transform(
        F.col("codes"), lambda c, j: F.get(F.get(cbv, j), c.cast("int"))))
    xnorm = F.sqrt(F.aggregate(
        F.transform(F.col("codes"),
                    lambda c, j: F.get(F.get(cbs, j), c.cast("int"))),
        F.lit(0.0), lambda acc, v: acc + v))
    adc = F.round(_dot(F.col("qvec"), xhat)
                  / (_norm(F.col("qvec")) * xnorm), 6)
    # no distinct: (query_id, item_id) candidate pairs are unique by
    # construction — each item lands in exactly ONE coarse cell (the
    # argmax above) and a query's probed cells are distinct slices of one
    # sorted array, so the cell equi-join cannot emit a pair twice.  A
    # distinct here added a full exchange + hash-dedup of the candidate
    # set (the operator's largest intermediate) for nothing.
    cand = (index.join(F.broadcast(q), "cell")
            .where(F.col("item_id") != F.col("query_id"))
            .select("query_id", "item_id", adc.alias("__adc")))
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("__adc"), F.asc("item_id"))
    short = (cand.withColumn("__r", F.row_number().over(wr))
             .where(F.col("__r") <= refine)
             .select("query_id", "item_id"))

    # exact re-rank over Q×refine rows only
    truth = items.select(F.col(id_col).alias("item_id"),
                         F.col(vec_col).alias("__tv"))
    qv = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("__qv"))
    exact = (short.join(truth, "item_id").join(F.broadcast(qv), "query_id")
             .select("query_id", "item_id",
                     F.round(cosine_expr(F.col("__tv"), F.col("__qv")),
                             round_to).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("item_id"))
    return (exact.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
