"""SVD over a sparse ratings matrix (CF toolkit, SVD/Lanczos family).

Reference: ``/root/reference/toolkits/collaborative_filtering/svd.cpp``
(distributed one-sided Lanczos with restarts over the bipartite rating
graph).  Two Spark-native paths:

- ``power_iteration_svd`` — the oracle-replayable core: fixed-count
  power iteration on B = A^T A.  Each superstep is the same two
  matvecs the reference's Lanczos performs (``y = A x`` then
  ``z = A^T y``: two edge⋈state joins + sum aggregations) followed by
  a normalization whose scalars ride a single driver aggregate.
  Deterministic (x0 = 1), so ``oracles.sql_svd_power`` replays it.

- ``lanczos_svd`` — top-m singular values via the classic Lanczos
  tridiagonalization with full reorthogonalization.  The Krylov basis
  lives as columns of one long-form DataFrame (id, j, v); alphas/betas
  are driver-side scalars (m x m eigenproblem solved with numpy — the
  same split as the reference, which runs its tiny tridiagonal
  eigensolver on the master).  Validated against numpy.linalg.svd in
  tests.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import truncate_lineage


def _matvec(edges: DataFrame, x: DataFrame, src: str, dst: str) -> DataFrame:
    """y(dst) = sum over edges of rating * x(src); rows only for dst
    with >=1 edge (callers treat missing as 0)."""
    return (
        edges.join(x.withColumnRenamed("id", src), src)
        .groupBy(F.col(dst).alias("id"))
        .agg(F.sum(F.col("rating") * F.col("xv")).alias("xv"))
    )


def power_iteration_svd(
    ratings: DataFrame, iterations: int = 8
) -> tuple[DataFrame, float]:
    """Returns (v, sigma): the leading right-singular vector over items
    ``(id, xv)`` (unit norm) and the leading singular value estimate
    ``sigma = ||A v||`` after ``iterations`` rounds from x0 = 1."""
    edges = ratings.select("user", "item", "rating").persist()
    x = edges.select(F.col("item").alias("id")).distinct().select(
        "id", F.lit(1.0).alias("xv"))
    sigma = 0.0
    for _ in range(iterations):
        y = _matvec(edges, x, "item", "user")           # y = A x
        z = _matvec(edges, y, "user", "item")           # z = A^T y = B x
        nrm_sq = z.agg(F.sum(F.col("xv") ** 2).alias("n")).first()["n"]
        nrm = math.sqrt(float(nrm_sq))                  # ||B x||
        xc = z.select("id", (F.col("xv") / F.lit(nrm)).alias("xv")).persist()
        x = truncate_lineage(xc)
        xc.unpersist()
        # x was unit, so ||B x|| -> lambda1(B) = sigma1^2 as it converges
        sigma = math.sqrt(nrm)
    edges.unpersist()
    return x, sigma


def lanczos_svd(ratings: DataFrame, m: int = 4,
                seed_items: DataFrame | None = None) -> list[float]:
    """Top singular values of A via m Lanczos steps on B = A^T A with
    full reorthogonalization; returns sorted singular values (desc).
    Driver holds only the m x m tridiagonal problem (numpy)."""
    import numpy as np

    edges = ratings.select("user", "item", "rating").persist()
    items = edges.select(F.col("item").alias("id")).distinct()
    q = items.select("id", F.lit(1.0).alias("xv"))
    n0 = math.sqrt(float(q.agg(F.sum(F.col("xv") ** 2)).first()[0]))
    q = q.select("id", (F.col("xv") / F.lit(n0)).alias("xv"))
    basis: list[DataFrame] = []
    alphas: list[float] = []
    betas: list[float] = []
    for j in range(m):
        qj = truncate_lineage(q)
        basis.append(qj)
        y = _matvec(edges, qj, "item", "user")
        w = _matvec(edges, y, "user", "item")          # w = B q_j
        alpha = float(
            w.join(qj.withColumnRenamed("xv", "qv"), "id")
            .agg(F.sum(F.col("xv") * F.col("qv"))).first()[0] or 0.0)
        alphas.append(alpha)
        # w -= alpha q_j + beta q_{j-1}; then full reorthogonalization
        for qi, coef in ((qj, alpha),) + (
                ((basis[-2], betas[-1]),) if betas else ()):
            w = (
                w.join(qi.select("id", F.col("xv").alias("qv")), "id", "left")
                .select("id", (F.col("xv") - F.lit(coef)
                               * F.coalesce("qv", F.lit(0.0))).alias("xv"))
            )
        for qi in basis:
            d = float(
                w.join(qi.select("id", F.col("xv").alias("qv")), "id")
                .agg(F.sum(F.col("xv") * F.col("qv"))).first()[0] or 0.0)
            w = (
                w.join(qi.select("id", F.col("xv").alias("qv")), "id", "left")
                .select("id", (F.col("xv") - F.lit(d)
                               * F.coalesce("qv", F.lit(0.0))).alias("xv"))
            )
        w = truncate_lineage(w)
        beta = math.sqrt(float(
            w.agg(F.sum(F.col("xv") ** 2)).first()[0] or 0.0))
        if j < m - 1:
            if beta < 1e-12:
                break
            betas.append(beta)
            q = w.select("id", (F.col("xv") / F.lit(beta)).alias("xv"))
    t = np.diag(alphas)
    for i, b in enumerate(betas[: len(alphas) - 1]):
        t[i, i + 1] = t[i + 1, i] = b
    eigs = np.linalg.eigvalsh(t)
    for b in basis:
        b.unpersist()
    edges.unpersist()
    return sorted((math.sqrt(max(e, 0.0)) for e in eigs), reverse=True)
