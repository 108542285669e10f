"""Arrow CSR-block gather path and hub-salted reduction: both must
reproduce the expression path's converged PageRank (same monoid,
reordered float sums -> allclose, not bitwise)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphlab_spark import EdgeGraph
from graphlab_spark.algos.pagerank import pagerank
from graphlab_spark.plans.arrow_gather import (
    arrow_gather,
    csr_blocks,
    weighted_sum_kernel,
)
from graphlab_spark.sources.parsers import load_synthetic_powerlaw


def _ranks(res):
    return {r["id"]: r["rank"] for r in res.state.collect()}


def test_arrow_gather_single_step_matches_join(spark):
    edges = spark.createDataFrame(
        [(0, 5), (1, 0), (1, 5), (2, 0), (2, 5), (3, 0), (3, 5)],
        "src long, dst long")
    contribs = edges.join(
        edges.groupBy(F.col("src")).agg(F.count("*").alias("od")), "src"
    ).select("src", "dst", (F.lit(1.0) / F.col("od")).alias("cw"))
    state = spark.createDataFrame(
        [(i, 1.0) for i in (0, 1, 2, 3, 5)], "id long, rank double")
    blocks = csr_blocks(contribs, 4)
    got = {
        r["dst"]: r["total"]
        for r in arrow_gather(blocks, state, weighted_sum_kernel,
                              "dst long, m double", 4)
        .groupBy("dst").agg(F.sum("m").alias("total")).collect()
    }
    expect = {
        r["dst"]: r["total"]
        for r in contribs.join(state, contribs["src"] == state["id"])
        .select("dst", (F.col("rank") * F.col("cw")).alias("m"))
        .groupBy("dst").agg(F.sum("m").alias("total")).collect()
    }
    assert got.keys() == expect.keys()
    assert all(abs(got[k] - expect[k]) < 1e-12 for k in got)


def test_pagerank_arrow_matches_expr(spark):
    edges = load_synthetic_powerlaw(spark, 300)
    g = EdgeGraph(edges, num_edge_partitions=8)
    expr = _ranks(pagerank(g, tol=1e-6, resume=False))
    arrow = _ranks(pagerank(g, tol=1e-6, resume=False, gather="arrow"))
    assert expr.keys() == arrow.keys()
    assert all(abs(expr[k] - arrow[k]) < 1e-9 for k in expr)
    g.unpersist()


def test_pagerank_salted_matches_plain(spark):
    edges = load_synthetic_powerlaw(spark, 300)
    g = EdgeGraph(edges, num_edge_partitions=8)
    plain = _ranks(pagerank(g, tol=1e-6, resume=False))
    salted = _ranks(pagerank(g, tol=1e-6, resume=False, salt_hubs=8))
    assert plain.keys() == salted.keys()
    assert all(abs(plain[k] - salted[k]) < 1e-9 for k in plain)
    g.unpersist()


def test_sssp_arrow_equals_expr(spark):
    """The CSR-block min-plus kernel must reproduce the expression
    path exactly (min is order-insensitive)."""
    from graphlab_spark import EdgeGraph
    from graphlab_spark.algos.sssp import sssp
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 5.0), (2, 3, 1.0), (4, 0, 1.0)],
        "src long, dst long, w double")
    g = EdgeGraph(edges, num_edge_partitions=4)
    expr = {r["id"]: r["distance"] for r in
            sssp(g, sources=[0], directed=True, weight_col="w",
                 resume=False).state.collect()}
    arrow = {r["id"]: r["distance"] for r in
             sssp(g, sources=[0], directed=True, weight_col="w",
                  resume=False, gather="arrow").state.collect()}
    assert expr == arrow
    import pytest
    with pytest.raises(ValueError):
        sssp(g, sources=[0], gather="arrow", track_parent=True)
    g.unpersist()
