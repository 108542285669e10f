"""Undirected triangle counting (total + per-vertex), exact parity.

Parity contract
(``/root/reference/toolkits/graph_analytics/simple_undirected_triangle_count.cpp``):

- input contract: deduplicated undirected edges, no self-loops
  (``:314-316``) — we canonicalize (src<dst, distinct) up front;
- the reference runs Schank's edge-iterator: each vertex gathers the
  neighbor-id set, each edge intersects its endpoints' sets
  (``:172-235``); total = sum of per-edge counts (each triangle counted
  once, ``:48-67,366-368``); per-vertex = sum of incident edge counts /2
  i.e. the number of triangles the vertex participates in (``:246-279``).

Spark plan — the standard distributed triangle join, NOT a set-gather
(collect_set of hub neighborhoods would melt an executor at 100 TB):

1. orient every canonical edge from lower-(degree, id) endpoint to
   higher — each vertex's out-degree in the oriented graph is bounded
   by O(sqrt(E)), which tames power-law hubs (same effect as the
   reference's smaller-set-iteration at ``:209-217``);
2. wedges = oriented ⋈ oriented on the low vertex;
3. triangles = wedges semi-joined against oriented edges.

Counts are exact and each triangle appears exactly once as an oriented
wedge + closing edge. AQE skew-join handles residual wedge skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeGraph


def _oriented_edges(graph: EdgeGraph) -> DataFrame:
    """Canonical undirected edges re-oriented by (degree, id) order."""
    canon = graph.canonical_undirected_edges
    deg = (
        canon.select(F.col("src").alias("id"))
        .unionAll(canon.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        canon.join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "sd"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "dd"), "dst")
    )
    lower_first = (F.col("sd") < F.col("dd")) | (
        (F.col("sd") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("b"),
    )


def triangle_list(graph: EdgeGraph) -> DataFrame:
    """All triangles, one row each, as (v1, v2, v3) with v1<v2<v3."""
    o = _oriented_edges(graph).persist()
    e1 = o.select(F.col("a").alias("u"), F.col("b").alias("v"))
    e2 = o.select(F.col("a").alias("u2"), F.col("b").alias("w"))
    wedges = e1.join(e2, (e1["u"] == e2["u2"]) & (e1["v"] < e2["w"])).select("u", "v", "w")
    closing = graph.canonical_undirected_edges.select(
        F.col("src").alias("cv"), F.col("dst").alias("cw")
    )
    tri = wedges.join(
        closing,
        (
            (F.least("v", "w") == F.col("cv"))
            & (F.greatest("v", "w") == F.col("cw"))
        ),
        "left_semi",
    )
    return tri.select(
        F.least(F.least("u", "v"), "w").alias("v1"),
        F.greatest(F.least(F.greatest("u", "v"), "w"), F.least("u", "v")).alias("v2"),
        F.greatest(F.greatest("u", "v"), "w").alias("v3"),
    )


def triangle_count_total(graph: EdgeGraph) -> int:
    """Total number of distinct triangles (reference 'total counting' mode)."""
    return triangle_list(graph).count()


def triangle_count_per_vertex(graph: EdgeGraph) -> DataFrame:
    """(id, triangles) for every vertex, 0 included — the reference's
    per-vertex mode (``simple_undirected_triangle_count.cpp:246-279``)."""
    tri = triangle_list(graph)
    corners = (
        tri.select(F.col("v1").alias("id"))
        .unionAll(tri.select(F.col("v2").alias("id")))
        .unionAll(tri.select(F.col("v3").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count("*").alias("triangles"))
    return (
        graph.vertices.join(counts, "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )
