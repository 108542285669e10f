import pytest

from graphlab_spark import EdgeGraph, get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="graphlab-spark-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


# Reference micro-fixture graph: tests/data/test_tsv/test.tsv et al in the
# reference repo — 5 vertices, 7 directed edges (FIXTURES.md §3).
FIXTURE_EDGES = [(0, 5), (1, 0), (1, 5), (2, 0), (2, 5), (3, 0), (3, 5)]


@pytest.fixture(scope="session")
def fixture_graph(spark):
    edges = spark.createDataFrame(FIXTURE_EDGES, "src long, dst long")
    g = EdgeGraph(edges, num_edge_partitions=4)
    yield g
    g.unpersist()
