"""Runtime-declared GAS programs (toolkits/extensions analog): the
expression-built programs must reproduce the hand-written algorithms
bit-for-bit, because both compile to the same superstep plan."""

import pytest
from pyspark.sql import functions as F

from graphlab_spark import EdgeGraph
from graphlab_spark.operators import (CC_PROGRAM, PAGERANK_PROGRAM,
                                      VertexProgram)
from graphlab_spark.sources import load_synthetic_powerlaw


@pytest.fixture(scope="module")
def graph(spark):
    g = EdgeGraph(load_synthetic_powerlaw(spark, 300, seed=3),
                  num_edge_partitions=8)
    yield g
    g.unpersist()


def test_extension_pagerank_matches_builtin(graph):
    from graphlab_spark.algos.pagerank import pagerank
    ext = PAGERANK_PROGRAM.run(graph, fixed_supersteps=5).state
    ref = pagerank(graph, fixed_supersteps=5).state
    j = ext.select("id", F.col("val").alias("a")).join(
        ref.select("id", F.col("rank").alias("b")), "id", "full")
    bad = j.filter(
        F.col("a").isNull() | F.col("b").isNull()
        | (F.abs(F.col("a") - F.col("b")) > 1e-12)).count()
    assert bad == 0


def test_extension_pagerank_converges_like_builtin(graph):
    from graphlab_spark.algos.pagerank import pagerank
    ext = PAGERANK_PROGRAM.run(graph, tol=1e-6, max_supersteps=200)
    ref = pagerank(graph, tol=1e-6)
    assert ext.converged and ref.converged
    assert ext.supersteps == ref.supersteps


def test_extension_cc_matches_builtin(graph):
    from graphlab_spark.algos.connected_components import connected_components
    ext = CC_PROGRAM.run(graph, tol=0.0, max_supersteps=100).state
    ref = connected_components(graph, resume=False).state
    j = ext.select("id", F.col("val").alias("a")).join(
        ref.select("id", F.col("component").alias("b")), "id", "full")
    assert j.filter(F.col("a") != F.col("b")).count() == 0


def test_custom_program_weighted_degree(spark):
    """A program the library does NOT ship: weighted in-degree sum via
    an extra edge column — exercises edge-attribute vocabulary."""
    edges = spark.createDataFrame(
        [(1, 2, 0.5), (3, 2, 1.5), (2, 1, 1.0)],
        "src long, dst long, w double")
    g = EdgeGraph(edges, num_edge_partitions=2)
    prog = VertexProgram(
        init="cast(0.0 as double)",
        gather="w",
        merge="sum",
        apply="coalesce(total, cast(0.0 as double))",
        gather_edges="in")
    out = {r["id"]: r["val"]
           for r in prog.run(g, fixed_supersteps=1).state.collect()}
    assert out[2] == pytest.approx(2.0)
    assert out[1] == pytest.approx(1.0)
    assert out[3] == pytest.approx(0.0)


def test_invalid_program_rejected():
    with pytest.raises(ValueError, match="unknown merge"):
        VertexProgram(init="1", gather="val", merge="median")
    with pytest.raises(ValueError, match="gather_edges"):
        VertexProgram(init="1", gather="val", gather_edges="sideways")


def test_zero_fixed_supersteps_returns_init(graph):
    """fixed_supersteps=0 must run ZERO gather/apply rounds and return
    the init state (a falsy-zero `or` once coerced it to the 100-step
    default and ran a full round before the stop check)."""
    res = PAGERANK_PROGRAM.run(graph, fixed_supersteps=0)
    assert res.supersteps == 0
    vals = {r["val"] for r in res.state.collect()}
    assert vals == {1.0}  # init expression, untouched
