"""Random-walk corpus generation: every consecutive pair must be a real
edge, choices are deterministic, and walks stop at sinks."""

import pytest
from pyspark.sql import functions as F

from graphlab_spark import EdgeGraph
from graphlab_spark.algos.walks import random_walks

from conftest import FIXTURE_EDGES


def test_walk_steps_are_real_edges(spark, fixture_graph):
    walks = random_walks(fixture_graph, walk_length=4, walks_per_vertex=2)
    pos = {(r["start"], r["j"], r["step"]): r["vertex"]
           for r in walks.collect()}
    edges = {(s, d) for s, d in FIXTURE_EDGES}
    pairs = [
        (v, pos[(s, j, t + 1)])
        for (s, j, t), v in pos.items() if (s, j, t + 1) in pos
    ]
    assert pairs
    assert all(p in edges for p in pairs)


def test_walks_deterministic_and_seed_sensitive(spark, fixture_graph):
    a = sorted(map(tuple, random_walks(
        fixture_graph, walk_length=3, walks_per_vertex=2, seed=7).collect()))
    b = sorted(map(tuple, random_walks(
        fixture_graph, walk_length=3, walks_per_vertex=2, seed=7).collect()))
    c = sorted(map(tuple, random_walks(
        fixture_graph, walk_length=3, walks_per_vertex=2, seed=8).collect()))
    assert a == b
    assert a != c


def test_walks_stop_at_sinks(spark):
    # 1 -> 2 -> 3, 3 is a sink: a walk from 1 has exactly steps 0,1,2.
    g = EdgeGraph(spark.createDataFrame([(1, 2), (2, 3)],
                                        "src long, dst long"),
                  num_edge_partitions=2)
    walks = random_walks(g, walk_length=5, walks_per_vertex=1)
    by_start = {(r["start"], r["step"]): r["vertex"]
                for r in walks.collect()}
    assert by_start[(1, 0)] == 1
    assert by_start[(1, 1)] == 2
    assert by_start[(1, 2)] == 3
    assert (1, 3) not in by_start  # stopped at the sink
    assert (3, 1) not in by_start  # sink's walk is just its start row
    g.unpersist()


def test_walks_validate_params(spark, fixture_graph):
    with pytest.raises(ValueError):
        random_walks(fixture_graph, walk_length=0)
