"""Collaborative filtering (ALS), clustering (k-means), linear solver
(Jacobi) — the reference's remaining toolkit families (SURVEY §2.7).

ALS is validated by rating-recovery on a synthetic low-rank matrix,
k-means by recovering well-separated synthetic clusters, Jacobi by the
exact solution of a hand-built diagonally dominant system.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graphlab_spark.algos.als import als, predict, rmse
from graphlab_spark.algos.jacobi import jacobi, residual_norm
from graphlab_spark.algos.kmeans import kmeans


@pytest.fixture(scope="module")
def low_rank_ratings(spark):
    """rating(u, i) = dot(p_u, q_i) for deterministic rank-2 factors —
    exactly representable at k >= 2, so ALS must fit it closely."""
    users = spark.range(30).select(F.col("id").alias("user"))
    items = spark.range(20).select(F.col("id").alias("item"))
    pu1 = (F.pmod(F.xxhash64("user", F.lit(1)), F.lit(100)) / 100.0)
    pu2 = (F.pmod(F.xxhash64("user", F.lit(2)), F.lit(100)) / 100.0)
    qi1 = (F.pmod(F.xxhash64("item", F.lit(3)), F.lit(100)) / 100.0)
    qi2 = (F.pmod(F.xxhash64("item", F.lit(4)), F.lit(100)) / 100.0)
    return (
        users.crossJoin(items)
        .select("user", "item",
                (pu1 * qi1 + pu2 * qi2 + F.lit(1.0)).alias("rating"))
        .persist()
    )


def test_als_fits_low_rank_matrix(spark, low_rank_ratings):
    uf, itf = als(low_rank_ratings, k=4, reg=0.001, iterations=8)
    err = rmse(low_rank_ratings, uf, itf)
    assert err < 0.05, f"ALS training RMSE too high: {err}"
    # factors cover every vertex
    assert uf.count() == 30 and itf.count() == 20


def test_als_deterministic(spark, low_rank_ratings):
    uf1, if1 = als(low_rank_ratings, k=2, iterations=2)
    uf2, if2 = als(low_rank_ratings, k=2, iterations=2)
    a = sorted((r["user"], r["item"], round(r["prediction"], 9))
               for r in predict(low_rank_ratings, uf1, if1).collect())
    b = sorted((r["user"], r["item"], round(r["prediction"], 9))
               for r in predict(low_rank_ratings, uf2, if2).collect())
    assert a == b


def test_als_regnormal_runs(spark, low_rank_ratings):
    uf, itf = als(low_rank_ratings, k=2, iterations=2, regnormal=True)
    assert math.isfinite(rmse(low_rank_ratings, uf, itf))


def test_kmeans_recovers_separated_clusters(spark):
    """Three tight 4-d blobs far apart — Lloyd's must separate them."""
    rows = []
    for c, base in enumerate([0.0, 100.0, 200.0]):
        for j in range(20):
            jitter = [((c * 20 + j) * 7919 % 97) / 97.0 for _ in range(1)][0]
            rows.append((c * 20 + j,
                         [base + jitter, base - jitter, base, base + 0.5]))
    pts = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assign, centers = kmeans(pts, k=3, iterations=10)
    got = {r["id"]: r["cluster"] for r in assign.collect()}
    # same-blob points share a cluster; different blobs differ
    for c in range(3):
        blob = {got[c * 20 + j] for j in range(20)}
        assert len(blob) == 1
    assert len({got[0], got[20], got[40]}) == 3
    assert len(centers) == 3


def test_kmeans_deterministic(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a1, c1 = kmeans(emb, k=4, iterations=5)
    a2, c2 = kmeans(emb, k=4, iterations=5)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    assert c1 == c2


def test_jacobi_solves_diagonally_dominant_system(spark):
    """A = [[4,1,0],[1,5,2],[0,2,6]], b = [1,2,3]; x* = A^-1 b."""
    edges = spark.createDataFrame(
        [(1, 0, 1.0), (0, 1, 1.0), (2, 1, 2.0), (1, 2, 2.0)],
        "src long, dst long, a double")
    vertices = spark.createDataFrame(
        [(0, 1.0, 4.0), (1, 2.0, 5.0), (2, 3.0, 6.0)],
        "id long, b double, diag double")
    res = jacobi(edges, vertices, tol=1e-12, resume=False)
    assert res.converged
    x = {r["id"]: r["x"] for r in res.state.collect()}
    # exact solution via numpy
    import numpy as np
    A = np.array([[4.0, 1, 0], [1, 5, 2], [0, 2, 6]])
    expect = np.linalg.solve(A, np.array([1.0, 2.0, 3.0]))
    for i in range(3):
        assert abs(x[i] - expect[i]) < 1e-9
    assert residual_norm(edges, vertices, res.state) < 1e-9


def test_synthetic_clusters_kmeans_recovery(spark):
    """generate_synthetic.cpp analog: blobs at U(-10,10)^dim centers
    with N(0,1) noise are recoverable by the shipped kmeans — cluster
    purity > 95% — and the generator is deterministic."""
    from graphlab_spark.sources import load_synthetic_clusters
    from graphlab_spark.algos.kmeans import kmeans

    pts = load_synthetic_clusters(spark, 600, num_clusters=3, dim=4,
                                  seed=11).persist()
    a = sorted(map(tuple, pts.collect()))
    b = sorted(map(tuple, load_synthetic_clusters(
        spark, 600, num_clusters=3, dim=4, seed=11).collect()))
    assert a == b
    assigned, _ = kmeans(pts, k=3, iterations=20)
    found = assigned.select(F.col("id").alias("vec_id"),
                            F.col("cluster").alias("found"))
    joined = pts.select("vec_id", F.col("cluster").alias("truth")) \
                .join(found, "vec_id")
    # purity: majority true-label share within each found cluster
    maj = (joined.groupBy("found", "truth").count()
           .groupBy("found").agg(F.max("count").alias("m"),
                                 F.sum("count").alias("n")))
    m, n = maj.agg(F.sum("m"), F.sum("n")).collect()[0]
    assert m / n > 0.95
    pts.unpersist()
