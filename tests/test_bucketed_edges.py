"""Bucketed edge persistence: the durable analog of the reference's
one-time ingress edge placement (``distributed_graph.hpp:460-466``).

The contract under test: after ``save_bucketed`` + ``load_bucketed``,
(a) the edge multiset round-trips exactly, (b) a vertex-state join
against the bucketed edges shuffles ONLY the state side (one Exchange
in the physical plan — the edge scan's bucket layout satisfies the
join's hash requirement), and (c) algorithms produce identical output
on the bucketed graph.
"""

import pytest
from pyspark.sql import functions as F

from graphlab_spark import EdgeGraph
from graphlab_spark.algos import pagerank
from graphlab_spark.sources import load_synthetic_powerlaw


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    edges = load_synthetic_powerlaw(spark, 400, seed=7)
    g = EdgeGraph(edges, num_edge_partitions=8)
    path = str(tmp_path_factory.mktemp("bucketed") / "edges")
    spark.sql("DROP TABLE IF EXISTS bucketed_edges_test")
    g.save_bucketed("bucketed_edges_test", path=path)
    g2 = EdgeGraph.load_bucketed(spark, "bucketed_edges_test", persist=False)
    yield g, g2
    g.unpersist()
    spark.sql("DROP TABLE IF EXISTS bucketed_edges_test")


def test_bucketed_roundtrip_exact(bucketed_pair):
    g, g2 = bucketed_pair
    assert g2.num_edge_partitions == g.num_edge_partitions
    a = sorted(map(tuple, g.edges.collect()))
    b = sorted(map(tuple, g2.edges.collect()))
    assert a == b


def test_bucketed_join_shuffles_only_state_side(bucketed_pair):
    _, g2 = bucketed_pair
    state = g2.vertices.withColumn("rank", F.lit(1.0))
    # hint("merge") pins a sort-merge join so the assertion is about
    # partitioning, not the tiny test input tipping into broadcast
    joined = g2.edges.join(state.hint("merge"), g2.edges.src == state.id) \
                     .drop("id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # One Exchange for the state side; none above the bucketed scan.
    # Exchanges below the InMemoryRelation boundary belong to the
    # cached vertices view's own build plan, not to this join — count
    # only the part of the plan above the cache.
    above_cache = plan.split("InMemoryRelation")[0]
    n_exchanges = above_cache.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan


def test_unbucketed_join_shuffles_both_sides(spark, bucketed_pair):
    """Control: the same join through a plain parquet scan of the same
    files needs two Exchanges (edges must be re-shuffled)."""
    _, g2 = bucketed_pair
    loc = (
        spark.sql("DESCRIBE EXTENDED bucketed_edges_test")
        .filter(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    plain = spark.read.parquet(loc)
    state = plain.select(F.col("src").alias("id")).distinct() \
                 .withColumn("rank", F.lit(1.0))
    joined = plain.join(state.hint("merge"), plain.src == state.id) \
                  .drop("id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") >= 2, plan


def test_pagerank_identical_on_bucketed_graph(bucketed_pair):
    g, g2 = bucketed_pair
    r1 = {r["id"]: r["rank"]
          for r in pagerank(g, fixed_supersteps=3).state.collect()}
    r2 = {r["id"]: r["rank"]
          for r in pagerank(g2, fixed_supersteps=3).state.collect()}
    assert r1.keys() == r2.keys()
    assert all(abs(r1[k] - r2[k]) < 1e-12 for k in r1)
