"""Alternating least squares (collaborative filtering toolkit).

Parity contract (``/root/reference/toolkits/collaborative_filtering/
als.cpp``): the bipartite user x item graph carries ratings on edges;
each side alternately gathers over ALL edges the tuple
``XtX += x_j x_j^T, Xy += r_ij x_j`` of its neighbors' factors
(``als.cpp:182-222, 303-310``) and apply solves
``(XtX + lambda I) w = Xy`` (``als.cpp:313-334``; with ``--regnormal``,
lambda scales with the vertex degree).  NLATENT defaults to 20
(``:115``), LAMBDA 0.01 (``:431``); convergence is tracked as the mean
absolute factor change (``:333``).

Spark plan: one superstep = join ratings with the fixed side's factor
table (shuffle on the fixed side's key only — ratings stay hash-
partitioned), then a per-vertex normal-equation solve in a cogrouped
pandas/Arrow kernel (`numpy.linalg.solve` on k x k systems — the Eigen
LDLT of the reference; k=NLATENT is tiny so the kernel is dominated by
the vectorized outer-product accumulation, not Python overhead).
Deterministic: factors initialize from a hash of the vertex id, not an
RNG, so runs are reproducible at any parallelism (the reference's
``setRandom`` is not; parity is algorithmic, not bitwise).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NLATENT = 20  # als.cpp:115
LAMBDA = 0.01  # als.cpp:431


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
    """
    cols = [F.col(key).alias("id"), "rating", "factor"]
    if weighted:
        cols.append("weight")
    joined = ratings.join(
        fixed.select(F.col("id").alias(other), "factor"), other
    ).select(*cols)

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        # one group = one vertex (applyInPandas guarantees the whole
        # group in one batch — mapInPandas could split a vertex's rows
        # across Arrow batches and emit partial solves)
        X = np.stack(pdf["factor"].to_numpy())            # (n, k)
        y = pdf["rating"].to_numpy()                      # (n,)
        w = pdf["weight"].to_numpy() if weighted else None
        lam = reg * len(pdf) if regnormal else reg
        Xw = X * w[:, None] if weighted else X
        A = X.T @ Xw + lam * np.eye(k)
        b = Xw.T @ y if weighted else X.T @ y
        f = np.linalg.solve(A, b)
        if sparsity is not None and sparsity < k:
            sup = np.sort(np.argsort(-np.abs(f))[:sparsity])
            As = A[np.ix_(sup, sup)]
            f = np.zeros(k)
            f[sup] = np.linalg.solve(As, b[sup])
        return pd.DataFrame({
            "id": [pdf["id"].iloc[0]],
            "factor": [f.tolist()],
        })

    return joined.groupBy("id").applyInPandas(
        solve, schema="id long, factor array<double>")


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
    uf = _init_factors(users, k, seed).persist()
    if_ = _init_factors(items, k, seed + 1).persist()
    from ..plans.checkpoint import truncate_lineage
    for _ in range(iterations):
        # truncate_lineage per alternation: without it the plan chains
        # one pandas-UDF stage per solve and Catalyst analysis time
        # grows superlinearly (hangs by ~8 iterations).  persist ->
        # checkpoint -> unpersist the pre-checkpoint cache (run_bsp's
        # order) so cached copies never accumulate across iterations.
        uf_cache = _solve_side(ratings, if_, "user", "item", k, reg,
                               regnormal).persist()
        new_uf = truncate_lineage(uf_cache)
        uf_cache.unpersist()
        uf.unpersist()
        uf = new_uf
        if_cache = _solve_side(ratings, uf, "item", "user", k, reg,
                               regnormal).persist()
        new_if = truncate_lineage(if_cache)
        if_cache.unpersist()
        if_.unpersist()
        if_ = new_if
    ratings.unpersist()
    return uf, if_


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
    uf = _init_factors_portable(users, k, 0).persist()
    if_ = _init_factors_portable(items, k, 1).persist()
    from ..plans.checkpoint import truncate_lineage
    for _ in range(iterations):
        uf_cache = _solve_side(ratings, if_, "user", "item", k, reg,
                               regnormal, weighted=True).persist()
        new_uf = truncate_lineage(uf_cache)
        uf_cache.unpersist()
        uf.unpersist()
        uf = new_uf
        if_cache = _solve_side(ratings, uf, "item", "user", k, reg,
                               regnormal, weighted=True).persist()
        new_if = truncate_lineage(if_cache)
        if_cache.unpersist()
        if_.unpersist()
        if_ = new_if
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
        uf = _init_factors_portable(users, k, 0).persist()
        if_ = _init_factors_portable(items, k, 1).persist()
    else:
        uf = _init_factors(users, k, seed).persist()
        if_ = _init_factors(items, k, seed + 1).persist()
    from ..plans.checkpoint import truncate_lineage
    for _ in range(iterations):
        uf_cache = _solve_side(ratings, if_, "user", "item", k, reg,
                               False, sparsity=user_sparsity).persist()
        new_uf = truncate_lineage(uf_cache)
        uf_cache.unpersist()
        uf.unpersist()
        uf = new_uf
        if_cache = _solve_side(ratings, uf, "item", "user", k, reg,
                               False, sparsity=item_sparsity).persist()
        new_if = truncate_lineage(if_cache)
        if_cache.unpersist()
        if_.unpersist()
        if_ = new_if
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
    only the distinct-id dimensions (≪ |ratings|); the dimension joins
    broadcast.  When ``weight`` is given the result carries a
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
        .join(F.broadcast(uidx.withColumnRenamed("__idx", "__u")), "__u")
        .join(F.broadcast(iidx.withColumnRenamed("__idx", "__i")), "__i")
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
