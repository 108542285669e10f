"""Vertex/edge transforms and vertex-set algebra (SURVEY §2.2).

Reference surface:

- ``transform_vertices(f, vset)`` / ``transform_edges(f, vset, edir)``
  (``distributed_graph.hpp:1416-1557``) — in-place mutation of vertex or
  edge payloads, optionally restricted to a vertex set and an edge
  direction. Spark is immutable, so these return new DataFrames with the
  transformed columns; semantics (which rows are touched) match.
- ``vertex_set`` + ``select(pred)`` + set algebra ``& | -`` and invert
  (``vertex_set.hpp:71-87,275-362``; ``distributed_graph.hpp:2501-2520``)
  — realized as id-DataFrames with semi/anti/union joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeGraph


def transform_vertices(
    vertices: DataFrame,
    transforms: dict[str, Column],
    vertex_set: DataFrame | None = None,
) -> DataFrame:
    """Apply column transforms to all vertices, or only those in
    ``vertex_set`` (others pass through unchanged)."""
    if vertex_set is None:
        out = vertices
        for name, col in transforms.items():
            out = out.withColumn(name, col)
        return out
    flagged = vertices.join(
        vertex_set.select("id").withColumn("__in", F.lit(True)), "id", "left"
    )
    out = flagged
    for name, col in transforms.items():
        out = out.withColumn(name, F.when(F.col("__in"), col).otherwise(F.col(name)))
    return out.drop("__in")


def apply_edge_transforms(
    edges: DataFrame,
    transforms: dict[str, Column],
    vertex_set: DataFrame | None = None,
    direction: str = "all",
) -> DataFrame:
    """Incident-edge transform over a plain edge DataFrame — the shared
    core of :func:`transform_edges` and the warp API's
    ``transform_neighborhood`` ('in' = edges whose dst is in the set,
    'out' = src, 'all' = either; untouched edges pass through)."""
    if vertex_set is None:
        cond = F.lit(True)
    else:
        ids = vertex_set.select(F.col("id").alias("__vid")).withColumn("__in", F.lit(True))
        edges = edges.join(ids, edges["src"] == F.col("__vid"), "left").withColumnRenamed(
            "__in", "__src_in"
        ).drop("__vid")
        edges = edges.join(ids, edges["dst"] == F.col("__vid"), "left").withColumnRenamed(
            "__in", "__dst_in"
        ).drop("__vid")
        cond = {
            "out": F.col("__src_in").isNotNull(),
            "in": F.col("__dst_in").isNotNull(),
            "all": F.col("__src_in").isNotNull() | F.col("__dst_in").isNotNull(),
        }[direction]
    out = edges
    for name, col in transforms.items():
        out = out.withColumn(name, F.when(cond, col).otherwise(F.col(name) if name in edges.columns else F.lit(None)))
    return out.drop("__src_in", "__dst_in")


def transform_edges(
    graph: EdgeGraph,
    transforms: dict[str, Column],
    vertex_set: DataFrame | None = None,
    direction: str = "all",
) -> DataFrame:
    """Transform edge columns for edges incident to ``vertex_set`` in the
    given direction. Matches ``transform_edges`` semantics
    (``distributed_graph.hpp:1492-1557``)."""
    return apply_edge_transforms(graph.edges, transforms, vertex_set,
                                 direction)


# -- vertex_set algebra ------------------------------------------------------


def select_vertices(vertices: DataFrame, predicate: Column) -> DataFrame:
    """``graph.select(pred)`` -> id-set DataFrame (``:2501-2520``)."""
    return vertices.filter(predicate).select("id")


def vset_intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.select("id").join(b.select("id"), "id", "left_semi")


def vset_union(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.select("id").unionAll(b.select("id")).distinct()


def vset_minus(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.select("id").join(b.select("id"), "id", "left_anti")


def vset_invert(vset: DataFrame, graph: EdgeGraph) -> DataFrame:
    return graph.vertices.join(vset.select("id"), "id", "left_anti")
