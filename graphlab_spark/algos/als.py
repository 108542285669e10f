"""Alternating least squares (collaborative filtering toolkit).

Parity contract (``/root/reference/toolkits/collaborative_filtering/
als.cpp``): the bipartite user x item graph carries ratings on edges;
each side alternately gathers over ALL edges the tuple
``XtX += x_j x_j^T, Xy += r_ij x_j`` of its neighbors' factors
(``als.cpp:182-222, 303-310``) and apply solves
``(XtX + lambda I) w = Xy`` (``als.cpp:313-334``; with ``--regnormal``,
lambda scales with ``vertex.num_out_edges()`` — the user's rating
count, and ZERO for items, which have no out-edges in the user->item
orientation of ``als.cpp:415``).  NLATENT defaults to 20
(``:115``), LAMBDA 0.01 (``:431``); convergence is tracked as the mean
absolute factor change (``:333``).

Spark plan: one superstep = join ratings with the fixed side's factor
table (shuffle on the fixed side's key only — ratings stay hash-
partitioned), expression-side partial aggregation of the normal
equations (k(k+1)/2 XtX sums + k Xy sums with map-side combine — the
reference's constant-memory ``+=`` gather, hot-vertex-safe), then one
batched `numpy.linalg.solve` over each Arrow batch of k x k systems
(the Eigen LDLT of the reference).
Deterministic: factors initialize from a hash of the vertex id, not an
RNG, so runs are reproducible at any parallelism (the reference's
``setRandom`` is not; parity is algorithmic, not bitwise).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NLATENT = 20  # als.cpp:115
LAMBDA = 0.01  # als.cpp:431

# Skew-split solve thresholds (see _solve_side): below HYBRID_MIN_K the
# expression path is cheap (k(k+1)/2 agg columns stay narrow) and the
# ANSI oracles replay it, so the split never engages; above it,
# vertices with at most HYBRID_DEGREE_CAP ratings solve through the
# whole-neighborhood Arrow kernel (at the cap and k=20 one group is
# ~10 MB of Arrow — comfortable), and only heavier hubs pay the
# constant-memory expression aggregation.
HYBRID_MIN_K = 8
HYBRID_DEGREE_CAP = 65536


def _init_factors(ids: DataFrame, k: int, seed: int) -> DataFrame:
    """Deterministic pseudo-random factors in [-0.5, 0.5]: component c of
    vertex v is a hash of (v, c, seed) — vectorized, no RNG state."""
    comps = [
        (
            (F.pmod(F.xxhash64(F.col("id"), F.lit(c), F.lit(seed)),
                    F.lit(1_000_000)) + 0.5) / 1_000_000.0 - 0.5
        ).alias(f"_c{c}")
        for c in range(k)
    ]
    return ids.select("id", F.array(*comps).alias("factor"))


def _solve_side(
    ratings: DataFrame, fixed: DataFrame, key: str, other: str,
    k: int, reg: float, regnormal: bool,
    weighted: bool = False, sparsity: int | None = None,
    low_degree_ids: DataFrame | None = None,
) -> DataFrame:
    """New factors for the ``key`` side given the ``other`` side fixed.

    ratings: (user, item, rating[, weight]); fixed: (id, factor) for
    the other side.  Returns (id, factor) for the key side.

    ``weighted`` solves the WALS normal equations
    ``(X^T W X + lam I) f = X^T W y`` (``wals.cpp:230-233`` — per-edge
    outer products and Xy scaled by the edge weight).  ``sparsity``
    applies the sparse-ALS support projection (``sparse_als.cpp`` /
    ``cosamp.hpp``): keep the ``s`` largest-magnitude coordinates of
    the dense solution and re-solve restricted to that support — one
    CoSaMP-style identify+re-estimate step, deterministic.

    ``low_degree_ids`` enables the skew-split solve: ids listed there
    (precomputed: rating count <= HYBRID_DEGREE_CAP) gather their whole
    (deg, k) neighborhood into one Arrow group and solve via one
    ``X^T X`` matmul (fast — measured ~4x over the expression
    aggregation at k=20/sf0.1, BASELINE §5); everyone else — the
    power-law hubs whose neighborhood would not fit an executor — runs
    the constant-memory expression-side normal equations.  Both paths
    solve the identical system; they differ only in float summation
    order.
    """
    cols = [F.col(key).alias("id"), "rating", "factor"]
    if weighted:
        cols.append("weight")
    joined = ratings.join(
        fixed.select(F.col("id").alias(other), "factor"), other
    ).select(*cols)
    # REGNORMAL scales lambda by vertex.num_out_edges (als.cpp:323-326);
    # edges run user->item (als.cpp:415), so for users that is their
    # rating count and for items it is ZERO — items solve unregularized
    # under --regnormal, exactly as the reference's LDLT does.
    user_side = key == "user"

    if low_degree_ids is not None:
        low = _solve_whole_neighborhood(
            joined.join(low_degree_ids, "id", "left_semi"),
            k, reg, regnormal, user_side, weighted, sparsity)
        # hubs fall through to the constant-memory expression path
        joined = joined.join(low_degree_ids, "id", "left_anti")
    else:
        low = None

    # Accumulate the normal equations EXPRESSION-SIDE, like the
    # reference's constant-memory ``+=`` gather (als.cpp:182-222): the
    # k(k+1)/2 upper-triangle XtX sums + k Xy sums ride Spark's native
    # partial+final hash aggregate, so a power-law hot vertex costs
    # O(k^2) state instead of materializing its whole (deg, k)
    # neighborhood in one Arrow group (which OOMs at hub degrees).
    # Project the factor array to k scalar columns ONCE per row before
    # aggregating: the k(k+1)/2 product sums then read plain doubles.
    # (Folding element_at into each aggregate re-walks the array per
    # term — measured 9x slower at k=20 on sf0.1; see BASELINE §5.)
    w = F.col("weight") if weighted else F.lit(1.0)
    flat = joined.select(
        "id", (w * F.col("rating")).alias("_wr"),
        *[(F.element_at("factor", i + 1)).alias(f"_f{i}") for i in range(k)],
        *([(w.cast("double")).alias("_w")] if weighted else []))
    wf = F.col("_w") if weighted else F.lit(1.0)
    aggs = []
    for i in range(k):
        fi = F.col(f"_f{i}")
        aggs.append(F.sum(F.col("_wr") * fi).alias(f"_b{i}"))
        for j in range(i, k):
            aggs.append(F.sum(wf * fi * F.col(f"_f{j}")).alias(f"_a{i}_{j}"))
    aggs.append(F.count("*").alias("_nobs"))
    stats = flat.groupBy("id").agg(*aggs)

    def solve_batch(pdfs: "Iterator[pd.DataFrame]"):
        # rows are independent aggregated vertices — mapInPandas batch
        # splits are safe; the k x k solves run as one batched LAPACK
        # call per Arrow batch.
        for pdf in pdfs:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame({"id": [], "factor": []})
                continue
            A = np.zeros((n, k, k))
            for i in range(k):
                for j in range(i, k):
                    A[:, i, j] = A[:, j, i] = pdf[f"_a{i}_{j}"]
            b = np.stack([pdf[f"_b{i}"].to_numpy() for i in range(k)],
                         axis=1)
            if regnormal:
                lam = (reg * pdf["_nobs"].to_numpy(float) if user_side
                       else np.zeros(n))
            else:
                lam = np.full(n, float(reg))
            A[:, np.arange(k), np.arange(k)] += lam[:, None]

            try:
                f = np.linalg.solve(A, b)
            except np.linalg.LinAlgError:
                f = np.stack([_solve1(A[r], b[r]) for r in range(n)])
            if sparsity is not None and sparsity < k:
                idx = np.argsort(-np.abs(f), axis=1)[:, :sparsity]
                out = np.zeros_like(f)
                for r in range(n):
                    sup = np.sort(idx[r])
                    out[r, sup] = _solve1(A[r][np.ix_(sup, sup)],
                                          b[r][sup])
                f = out
            yield pd.DataFrame({"id": pdf["id"],
                                "factor": [row.tolist() for row in f]})

    high = stats.mapInPandas(solve_batch,
                             schema="id long, factor array<double>")
    return high if low is None else low.unionByName(high)


def _solve1(Ar, br):
    """k x k solve with the least-squares fallback both solve paths
    share (lam=0 + rank-deficient neighborhood: the reference's LDLT
    degrades silently)."""
    try:
        return np.linalg.solve(Ar, br)
    except np.linalg.LinAlgError:
        return np.linalg.lstsq(Ar, br, rcond=None)[0]


def _solve_whole_neighborhood(
    joined: DataFrame, k: int, reg: float, regnormal: bool,
    user_side: bool, weighted: bool, sparsity: int | None,
) -> DataFrame:
    """The low-degree arm of the skew-split: one Arrow group per vertex
    (``applyInPandas`` guarantees the whole group in one batch), normal
    equations as a single ``X^T X`` matmul.  Callers must pre-filter to
    vertices with at most HYBRID_DEGREE_CAP ratings — a power-law hub
    here would materialize its entire (deg, k) neighborhood."""

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(pdf["factor"].to_numpy())            # (n, k)
        y = pdf["rating"].to_numpy()
        w = pdf["weight"].to_numpy() if weighted else None
        if regnormal:
            lam = reg * len(pdf) if user_side else 0.0
        else:
            lam = reg
        Xw = X * w[:, None] if weighted else X
        A = X.T @ Xw + lam * np.eye(k)
        b = Xw.T @ y
        f = _solve1(A, b)
        if sparsity is not None and sparsity < k:
            sup = np.sort(np.argsort(-np.abs(f))[:sparsity])
            fs = np.zeros(k)
            fs[sup] = _solve1(A[np.ix_(sup, sup)], b[sup])
            f = fs
        return pd.DataFrame({"id": [pdf["id"].iloc[0]],
                             "factor": [f.tolist()]})

    return joined.groupBy("id").applyInPandas(
        solve, schema="id long, factor array<double>")


def _low_degree_ids(ratings: DataFrame, key: str) -> DataFrame:
    """ids on the ``key`` side with at most HYBRID_DEGREE_CAP ratings —
    the vertices whose whole neighborhood safely fits one Arrow group."""
    return (
        ratings.groupBy(F.col(key).alias("id"))
        .agg(F.count("*").alias("_deg"))
        .filter(F.col("_deg") <= HYBRID_DEGREE_CAP)
        .select("id")
    )


def _alternate(ratings, uf, if_, solve_u, solve_i, iterations):
    """The shared ALS alternation choreography: per alternation,
    persist -> truncate_lineage -> unpersist the pre-checkpoint cache
    (run_bsp's order, so cached copies never accumulate) — without the
    per-alternation truncation the plan chains one pandas-UDF stage per
    solve and Catalyst analysis time grows superlinearly (hangs by ~8
    iterations).  ``solve_u(fixed_items)`` / ``solve_i(fixed_users)``
    return the side's new factor frame."""
    from ..plans.checkpoint import truncate_lineage
    for _ in range(iterations):
        uf_cache = solve_u(if_).persist()
        new_uf = truncate_lineage(uf_cache)
        uf_cache.unpersist()
        uf.unpersist()
        uf = new_uf
        if_cache = solve_i(uf).persist()
        new_if = truncate_lineage(if_cache)
        if_cache.unpersist()
        if_.unpersist()
        if_ = new_if
    return uf, if_


def als(
    ratings: DataFrame,
    k: int = NLATENT,
    reg: float = LAMBDA,
    regnormal: bool = False,
    iterations: int = 10,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Train ALS on a ``(user long, item long, rating double)`` table.

    Returns (user_factors, item_factors), each ``(id, factor array)``.
    One reference "iteration" = both alternations (users then items),
    matching the synchronous engine's two-phase sweep over the
    bipartite graph.
    """
    ratings = ratings.select("user", "item", "rating").persist()
    users = ratings.select(F.col("user").alias("id")).distinct()
    items = ratings.select(F.col("item").alias("id")).distinct()
    low_u, low_i = _hybrid_split(ratings, k)
    uf, if_ = _alternate(
        ratings,
        _init_factors(users, k, seed).persist(),
        _init_factors(items, k, seed + 1).persist(),
        lambda fx: _solve_side(ratings, fx, "user", "item", k, reg,
                               regnormal, low_degree_ids=low_u),
        lambda fx: _solve_side(ratings, fx, "item", "user", k, reg,
                               regnormal, low_degree_ids=low_i),
        iterations)
    _hybrid_unpersist(low_u, low_i)
    ratings.unpersist()
    return uf, if_


def _hybrid_split(ratings: DataFrame, k: int):
    """(low_user_ids, low_item_ids) when the skew-split engages
    (k >= HYBRID_MIN_K), else (None, None).  Below the threshold the
    expression path's k(k+1)/2 agg columns are narrow enough to beat
    the split's extra semi/anti joins — and every ANSI-oracled contract
    query (k <= 2) keeps the exact plan DuckDB replays."""
    if k < HYBRID_MIN_K:
        return None, None
    return (_low_degree_ids(ratings, "user").persist(),
            _low_degree_ids(ratings, "item").persist())


def _hybrid_unpersist(low_u, low_i) -> None:
    for df in (low_u, low_i):
        if df is not None:
            df.unpersist()


def _init_factors_portable(ids: DataFrame, k: int, side: int) -> DataFrame:
    """Engine-portable factor init (the LCG used by the SGD family) so
    WALS runs are exactly replayable in ANSI SQL: component c of vertex
    v is ``0.1 * lcg_unit(v*31 + c*7 + side*13)``."""
    from ..operators.portable import lcg_hash
    comps = [
        (F.lit(0.1) * (lcg_hash(F.col("id") * 31 + c * 7 + side * 13)
                       / F.lit(2.0 ** 31))).alias(f"_c{c}")
        for c in range(k)
    ]
    return ids.select("id", F.array(*comps).alias("factor"))


def wals(
    ratings: DataFrame,
    k: int = NLATENT,
    reg: float = LAMBDA,
    regnormal: bool = False,
    iterations: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """Weighted ALS (``wals.cpp``): ratings carry a per-observation
    ``weight`` column (the reference stores weight-or-time on each
    edge, ``wals.cpp:140-148``) and each side solves the weighted
    normal equations ``(X^T W X + lam I) f = X^T W y``.

    Input: ``(user, item, rating, weight)``.  Returns
    (user_factors, item_factors) as ``(id, factor array)``.  Factor
    init is the portable LCG (not ALS's xxhash64 init) so fixed-k runs
    replay in the DuckDB oracle.
    """
    ratings = ratings.select("user", "item", "rating", "weight").persist()
    users = ratings.select(F.col("user").alias("id")).distinct()
    items = ratings.select(F.col("item").alias("id")).distinct()
    low_u, low_i = _hybrid_split(ratings, k)
    uf, if_ = _alternate(
        ratings,
        _init_factors_portable(users, k, 0).persist(),
        _init_factors_portable(items, k, 1).persist(),
        lambda fx: _solve_side(ratings, fx, "user", "item", k, reg,
                               regnormal, weighted=True,
                               low_degree_ids=low_u),
        lambda fx: _solve_side(ratings, fx, "item", "user", k, reg,
                               regnormal, weighted=True,
                               low_degree_ids=low_i),
        iterations)
    _hybrid_unpersist(low_u, low_i)
    ratings.unpersist()
    return uf, if_


def sparse_als(
    ratings: DataFrame,
    k: int = NLATENT,
    reg: float = LAMBDA,
    user_sparsity: int | None = None,
    item_sparsity: int | None = None,
    iterations: int = 10,
    seed: int = 42,
    portable_init: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Sparse-factor ALS (``sparse_als.cpp``): like :func:`als` but
    each per-vertex solve projects onto at most ``s`` nonzero
    coordinates (the reference's CoSaMP solver, ``cosamp.hpp``; here
    one deterministic identify+re-estimate step — select the s
    largest-magnitude coordinates of the dense solution, re-solve on
    that support).  ``user_sparsity`` / ``item_sparsity`` mirror the
    reference's ``--user_sparsity`` / ``--movie_sparsity`` flags.

    ``portable_init`` switches to the LCG factor init (wals' scheme),
    under which small-k runs replay in ANSI SQL: at k=2, s=1 the dense
    solve is the 2x2 Cramer form, the support pick is an abs-argmax,
    and the re-solve is scalar — ◆ cf_sparse_als2_user_factors.
    """
    ratings = ratings.select("user", "item", "rating").persist()
    users = ratings.select(F.col("user").alias("id")).distinct()
    items = ratings.select(F.col("item").alias("id")).distinct()
    if portable_init:
        uf0 = _init_factors_portable(users, k, 0).persist()
        if0 = _init_factors_portable(items, k, 1).persist()
    else:
        uf0 = _init_factors(users, k, seed).persist()
        if0 = _init_factors(items, k, seed + 1).persist()
    low_u, low_i = _hybrid_split(ratings, k)
    uf, if_ = _alternate(
        ratings, uf0, if0,
        lambda fx: _solve_side(ratings, fx, "user", "item", k, reg,
                               False, sparsity=user_sparsity,
                               low_degree_ids=low_u),
        lambda fx: _solve_side(ratings, fx, "item", "user", k, reg,
                               False, sparsity=item_sparsity,
                               low_degree_ids=low_i),
        iterations)
    _hybrid_unpersist(low_u, low_i)
    ratings.unpersist()
    return uf, if_


def predict(ratings: DataFrame, user_factors: DataFrame,
            item_factors: DataFrame) -> DataFrame:
    """(user, item, rating, prediction) for every rating row — dot
    product of the two factor vectors, JVM-side."""
    dot = F.expr(
        "aggregate(zip_with(uf, itf, (x, y) -> x * y),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    return (
        ratings.join(user_factors.select(F.col("id").alias("user"),
                                         F.col("factor").alias("uf")), "user")
        .join(item_factors.select(F.col("id").alias("item"),
                                  F.col("factor").alias("itf")), "item")
        .select("user", "item", "rating", dot.alias("prediction"))
    )


def rmse(ratings: DataFrame, user_factors: DataFrame,
         item_factors: DataFrame) -> float:
    """Training RMSE (the reference's error aggregate)."""
    p = predict(ratings, user_factors, item_factors)
    row = p.agg(F.sqrt(F.avg((F.col("rating") - F.col("prediction")) ** 2))
                .alias("rmse")).first()
    return float(row["rmse"])


def _maybe_broadcast(dim: DataFrame, rows: int,
                     limit: int = 1_000_000) -> DataFrame:
    """Broadcast-hint a dimension only when its known row count is
    small enough that the serialized table stays MB-scale (an explicit
    hint bypasses ``autoBroadcastJoinThreshold``, so an over-eager
    limit can OOM the driver); otherwise let AQE pick the join."""
    return F.broadcast(dim) if rows <= limit else dim


def add_implicit_ratings(
    ratings: DataFrame, percentage: float, value: float = 0.0,
    weight: float | None = None, seed: int = 97,
) -> DataFrame:
    """Inject implicit (unobserved) rating edges before training
    (``toolkits/collaborative_filtering/implicit.hpp:40-88``): add
    ``max(1, floor(percentage * M * N))`` uniform-random (user, item)
    pairs rated ``implicitratingvalue`` — and carrying
    ``implicitratingweight`` for WALS (``:58``, the 3-arg edge) —
    where M/N are the user/item universe sizes.  The reference samples
    raw id ranges and happily duplicates observed pairs (``add_edge``
    appends); here M/N are the *observed* distinct counts and pairs
    are drawn over them, duplicates likewise kept.

    Deterministic portable sampling: pair j maps through
    ``edge_hash`` onto rank-indexed user/item dimension tables, so an
    ANSI-SQL twin replays the exact edge set
    (``oracles.py::sql_implicit_ratings``).  The two rank windows sort
    only the distinct-id dimensions (≪ |ratings|, but a single-task
    global sort — fine to ~10^8 distinct ids; beyond that swap in a
    partitioned zipWithIndex-style ranking and drop the SQL twin's
    exact-rank replay).  The dimension joins take an explicit broadcast
    hint only while the side is provably small (the counts are already
    on the driver); larger dims fall back to a plain hash join under
    AQE.  When ``weight`` is given the result carries a
    ``weight`` column (existing rows keep theirs, else 1.0) — feed it
    straight to :func:`wals`.

    Returns the augmented ratings DataFrame; the number of added rows
    is ``max(1, int(percentage * M * N))`` by construction.
    """
    from pyspark.sql import Window

    from ..operators.portable import edge_hash

    spark = ratings.sparkSession
    users = ratings.select("user").distinct()
    items = ratings.select("item").distinct()
    m, n = users.count(), items.count()
    toadd = max(1, int(percentage * m * n))
    uidx = users.select(
        F.col("user"),
        (F.row_number().over(Window.orderBy("user")) - 1).alias("__idx"))
    iidx = items.select(
        F.col("item"),
        (F.row_number().over(Window.orderBy("item")) - 1).alias("__idx"))
    adds = (
        spark.range(toadd)
        .select((edge_hash(F.lit(seed), F.col("id")) % F.lit(m)).alias("__u"),
                (edge_hash(F.lit(seed + 1), F.col("id")) % F.lit(n))
                .alias("__i"))
        .join(_maybe_broadcast(uidx.withColumnRenamed("__idx", "__u"), m),
              "__u")
        .join(_maybe_broadcast(iidx.withColumnRenamed("__idx", "__i"), n),
              "__i")
        .select("user", "item", F.lit(float(value)).alias("rating"))
    )
    if weight is not None:
        adds = adds.withColumn("weight", F.lit(float(weight)))
        if "weight" not in ratings.columns:
            ratings = ratings.withColumn("weight", F.lit(1.0))
        return ratings.select("user", "item", "rating", "weight").unionByName(
            adds)
    if "weight" in ratings.columns:
        raise ValueError(
            "ratings carry a weight column; pass weight=<implicit weight> "
            "so the injected edges get one (silently dropping weights "
            "would corrupt a WALS input)")
    return ratings.select("user", "item", "rating").unionByName(adds)
