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


# -- synthetic ALS data generator (make_synthetic_als_data.cpp analog) --


def test_synthetic_als_shapes_and_determinism(spark):
    from graphlab_spark.sources.parsers import load_synthetic_als
    tr1, va1, pr1 = load_synthetic_als(spark, nusers=40, nmovies=100, d=2)
    tr2, va2, pr2 = load_synthetic_als(spark, nusers=40, nmovies=100, d=2)
    assert va1.count() == 100 * 2 and pr1.count() == 100 * 1
    assert pr1.columns == ["user", "item"]          # predict has no rating
    # items offset by nusers; train users stride the full id range
    row = tr1.agg(F.min("item").alias("lo"), F.max("item").alias("hi"),
                  F.max("user").alias("mu")).first()
    assert row["lo"] >= 40 and row["hi"] < 140 and row["mu"] < 40
    assert tr1.exceptAll(tr2).count() == 0 and tr2.exceptAll(tr1).count() == 0


def test_synthetic_als_powerlaw_tail_and_recovery(spark):
    from graphlab_spark.sources.parsers import load_synthetic_als
    tr, va, _ = load_synthetic_als(spark, nusers=50, nmovies=200, d=3)
    degs = tr.groupBy("item").count()
    row = degs.agg(F.max("count").alias("mx"), F.avg("count").alias("av"))\
        .first()
    assert row["mx"] >= 4 * row["av"]               # heavy tail
    # ratings are an exact rank-3 matrix: ALS at k=3 must fit far
    # below the rating scale
    uf, itf = als(tr, k=3, reg=0.001, iterations=10)
    std = tr.agg(F.stddev("rating")).first()[0]
    assert rmse(tr, uf, itf) < 0.25 * std


# -- implicit-rating injection (implicit.hpp analog) --


def test_add_implicit_ratings_count_value_and_weight(spark):
    from graphlab_spark.algos.als import add_implicit_ratings
    r = spark.createDataFrame(
        [(1, 10, 4.0), (1, 11, 2.0), (2, 10, 5.0), (2, 12, 1.0),
         (3, 11, 3.0)], "user long, item long, rating double")
    aug = add_implicit_ratings(r, percentage=0.5, value=0.0, weight=0.1)
    # toadd = max(1, int(0.5 * 3 users * 3 items)) = 4
    assert aug.count() == 5 + 4
    added = aug.filter(F.col("weight") < 1.0)
    assert added.count() == 4
    assert added.filter(F.col("rating") != 0.0).count() == 0
    # sampled pairs stay inside the observed id universes
    assert added.filter(~F.col("user").isin(1, 2, 3)).count() == 0
    assert added.filter(~F.col("item").isin(10, 11, 12)).count() == 0
    # originals keep rating and get unit weight
    assert aug.filter((F.col("user") == 1) & (F.col("item") == 10)
                      & (F.col("rating") == 4.0)
                      & (F.col("weight") == 1.0)).count() == 1


def test_add_implicit_ratings_min_one_and_deterministic(spark):
    from graphlab_spark.algos.als import add_implicit_ratings
    r = spark.createDataFrame([(1, 10, 4.0)],
                              "user long, item long, rating double")
    a1 = add_implicit_ratings(r, percentage=1e-9)   # floor -> 0, min 1
    assert a1.count() == 2 and "weight" not in a1.columns
    a2 = add_implicit_ratings(r, percentage=1e-9)
    assert a1.exceptAll(a2).count() == 0


def test_sparse_als_portable_init_one_nonzero(spark):
    from graphlab_spark.algos.als import sparse_als
    r = spark.createDataFrame(
        [(1, 10, 4.0), (1, 11, 2.0), (2, 10, 5.0), (2, 12, 1.0),
         (3, 11, 3.0), (3, 12, 4.0)], "user long, item long, rating double")
    uf, itf = sparse_als(r, k=2, user_sparsity=1, item_sparsity=1,
                         iterations=2, portable_init=True)
    # s=1 projection: exactly one nonzero coordinate per factor
    nz = uf.unionByName(itf).select(
        F.aggregate("factor", F.lit(0),
                    lambda acc, x: acc + F.when(x != 0.0, 1).otherwise(0))
        .alias("nnz"))
    assert {row["nnz"] for row in nz.collect()} == {1}
    uf2, _ = sparse_als(r, k=2, user_sparsity=1, item_sparsity=1,
                        iterations=2, portable_init=True)
    assert uf.exceptAll(uf2).count() == 0


def test_add_implicit_ratings_rejects_unweighted_call_on_weighted_input(spark):
    import pytest as _pytest
    from graphlab_spark.algos.als import add_implicit_ratings
    r = spark.createDataFrame(
        [(1, 10, 4.0, 2.0)],
        "user long, item long, rating double, weight double")
    with _pytest.raises(ValueError, match="weight"):
        add_implicit_ratings(r, percentage=0.5)


def _factors_dict(df):
    return {r["id"]: r["factor"] for r in df.collect()}


def test_als_hybrid_split_matches_expression_path(spark, low_rank_ratings,
                                                  monkeypatch):
    """The skew-split solve (k >= HYBRID_MIN_K) must compute the same
    factors as the pure expression path — the two arms solve identical
    normal equations and differ only in float summation order."""
    import importlib
    A = importlib.import_module("graphlab_spark.algos.als")

    uf_h, _ = als(low_rank_ratings, k=8, reg=0.01, iterations=2)
    monkeypatch.setattr(A, "HYBRID_MIN_K", 10 ** 9)  # force expression path
    uf_e, _ = als(low_rank_ratings, k=8, reg=0.01, iterations=2)
    a, b = _factors_dict(uf_h), _factors_dict(uf_e)
    assert set(a) == set(b)
    md = max(abs(x - y) for i in a for x, y in zip(a[i], b[i]))
    assert md < 1e-9


def test_als_hybrid_routes_hubs_through_expression_arm(spark,
                                                       low_rank_ratings,
                                                       monkeypatch):
    """With the degree cap forced tiny, heavy vertices take the
    constant-memory expression arm and light ones the Arrow kernel —
    the union must still equal the single-path result."""
    import importlib
    A = importlib.import_module("graphlab_spark.algos.als")

    # every user rates 20 items, every item has 30 raters: cap=25
    # sends all users to the kernel and all items to the hub arm
    monkeypatch.setattr(A, "HYBRID_DEGREE_CAP", 25)
    uf_h, if_h = als(low_rank_ratings, k=8, reg=0.01, iterations=2)
    monkeypatch.setattr(A, "HYBRID_MIN_K", 10 ** 9)
    uf_e, if_e = als(low_rank_ratings, k=8, reg=0.01, iterations=2)
    for hy, ex in ((uf_h, uf_e), (if_h, if_e)):
        a, b = _factors_dict(hy), _factors_dict(ex)
        assert set(a) == set(b)
        md = max(abs(x - y) for i in a for x, y in zip(a[i], b[i]))
        assert md < 1e-9


def test_synthetic_clusters_portable_semantics(spark):
    """generate_synthetic.cpp:29-59 replay: center range, uniform
    cluster picks, unit-variance noise around the picked center,
    determinism across rebuilds."""
    from graphlab_spark.sources.parsers import (
        load_synthetic_clusters_portable)

    nc, dim, n = 3, 2, 3000
    pts, ctr = load_synthetic_clusters_portable(spark, nc, dim, n, seed=11)
    centers = {r["cluster"]: list(r["center"]) for r in ctr.collect()}
    assert len(centers) == nc
    assert all(-10.0 <= x <= 10.0 for c in centers.values() for x in c)
    rows = pts.collect()
    assert len(rows) == n
    by_cluster = {}
    for r in rows:
        assert 0 <= r["cluster"] < nc
        assert len(r["vec"]) == dim
        by_cluster.setdefault(r["cluster"], []).append(list(r["vec"]))
    # every cluster drawn roughly uniformly
    for c in range(nc):
        assert len(by_cluster[c]) > n / nc * 0.7
    # sample mean per cluster ~ its center (stderr ~ 1/sqrt(n/nc) ~ .03)
    for c, vecs in by_cluster.items():
        for j in range(dim):
            mean_j = sum(v[j] for v in vecs) / len(vecs)
            assert abs(mean_j - centers[c][j]) < 0.15, (c, j)
    pts2, _ = load_synthetic_clusters_portable(spark, nc, dim, n, seed=11)
    assert sorted(map(tuple, pts.collect())) == \
        sorted(map(tuple, pts2.collect()))


def test_synthetic_clusters_portable_kmeans_recovery(spark):
    """kmeans on the generator's own output recovers the planted
    partition when the drawn centers are well separated (seed chosen
    so pairwise center distance >> noise stdev)."""
    from pyspark.sql import functions as F

    from graphlab_spark.algos.kmeans import kmeans
    from graphlab_spark.sources.parsers import (
        load_synthetic_clusters_portable)

    nc = 3
    pts, ctr = load_synthetic_clusters_portable(spark, nc, dim=2, ndata=600, seed=4)
    centers = [list(r["center"]) for r in ctr.collect()]
    # guard the seed choice: min pairwise center distance > 6 stdev
    mind = min(
        sum((a - b) ** 2 for a, b in zip(c1, c2)) ** 0.5
        for i, c1 in enumerate(centers) for c2 in centers[i + 1:])
    assert mind > 6.0, f"seed gives min center distance {mind}"
    assign, _ = kmeans(pts, k=nc, iterations=15,
                       id_col="id", vec_col="vec")
    joined = pts.select("id", "cluster").join(
        assign.withColumnRenamed("cluster", "km"), "id")
    # planted label <-> kmeans label must be a bijection on >=99% rows
    from pyspark.sql.window import Window
    maj = (joined.groupBy("cluster", "km").count()
           .withColumn("rk", F.row_number().over(
               Window.partitionBy("cluster").orderBy(F.desc("count"))))
           .filter("rk = 1"))
    agree = maj.agg(F.sum("count")).first()[0]
    assert agree >= 0.99 * 600
    assert maj.select("km").distinct().count() == nc


def test_kmeans_zero_iterations_assigns_to_init_centers(spark):
    """iterations=0 must return the init-center assignment (it used to
    crash on a None)."""
    from graphlab_spark.algos.kmeans import kmeans
    rows = [(i, [float(i % 2) * 10.0, 0.0]) for i in range(8)]
    pts = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assign, centers = kmeans(pts, k=2, iterations=0, init="first")
    assert len(centers) == 2
    got = {r["id"]: r["cluster"] for r in assign.collect()}
    assert len(got) == 8 and set(got.values()) <= {0, 1}
