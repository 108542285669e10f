"""Whole-graph aggregation primitives (SURVEY §2.4).

Reference surface → Spark mapping:

- ``map_reduce_vertices<T>(map)`` (``distributed_graph.hpp:958-1015``)
  and ``fold_vertices`` (``:1234-1327``) → ``vertices.agg(...)``;
- ``map_reduce_edges`` (``:1085-1161``) → ``edges.agg(...)``;
- the ``distributed_aggregator`` named-aggregate registry
  (``aggregation/distributed_aggregator.hpp``) → a dict of named Column
  aggregates evaluated on demand (periodic aggregation collapses to
  per-superstep evaluation in a BSP loop);
- argmax by degree (``sssp.cpp:197-213``) → ``max_by``;
- component-size histogram (``connected_component_stats.cpp:65-96``).

All of these are single partial+final hash aggregates — the exact
physical shape of the reference's per-machine-fold + MPI all-reduce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def map_reduce_vertices(vertices: DataFrame, *aggs: Column) -> dict:
    """Global reduction over vertex state; returns the single result row
    as a dict."""
    return vertices.agg(*aggs).first().asDict()


def map_reduce_edges(edges: DataFrame, *aggs: Column) -> dict:
    return edges.agg(*aggs).first().asDict()


class AggregatorRegistry:
    """Named vertex/edge aggregates evaluated on demand — the analog of
    ``add_vertex_aggregator``/``aggregate_now``
    (``distributed_aggregator.hpp:396,518``)."""

    def __init__(self) -> None:
        self._vertex: dict[str, list[Column]] = {}
        self._edge: dict[str, list[Column]] = {}

    def add_vertex_aggregator(self, name: str, *aggs: Column) -> None:
        self._vertex[name] = list(aggs)

    def add_edge_aggregator(self, name: str, *aggs: Column) -> None:
        self._edge[name] = list(aggs)

    def aggregate_now(self, name: str, vertices: DataFrame | None = None,
                      edges: DataFrame | None = None) -> dict:
        if name in self._vertex:
            assert vertices is not None
            return map_reduce_vertices(vertices, *self._vertex[name])
        if name in self._edge:
            assert edges is not None
            return map_reduce_edges(edges, *self._edge[name])
        raise KeyError(name)


def argmax_vertex(vertices: DataFrame, by: str) -> dict:
    """Top-1 vertex by a column (``max_deg_vertex_reducer``)."""
    return vertices.agg(
        F.max_by("id", F.struct(F.col(by), F.col("id"))).alias("id"),
        F.max(F.struct(F.col(by), F.col("id"))).getField(by).alias(by),
    ).first().asDict()


def histogram(df: DataFrame, col: str) -> DataFrame:
    """Value-frequency histogram: (value, count)."""
    return df.groupBy(F.col(col).alias("value")).agg(F.count("*").alias("count"))
