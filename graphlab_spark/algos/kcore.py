"""K-core decomposition (Batagelj–Zaversnik peeling).

Parity contract (``/root/reference/toolkits/graph_analytics/kcore.cpp``):

- vertex state = remaining degree; peeling deletes vertices with degree
  < K and decrements neighbors (``kcore.cpp:29-38,70-140``);
- the outer loop over K = kmin..kmax re-runs the engine and reports the
  surviving vertex/edge counts per K (golden table for web-Google at
  ``graph_analytics.dox:430-460``).

Spark plan: per K, iteratively filter the undirected edge set — drop all
edges incident to a vertex of degree < K until a fixed point; the k-core
sizes are the surviving counts. Degree recompute is a partial+final
hash aggregate per round; lineage is truncated every round (the classic
iterative-filter pitfall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeGraph
from ..plans.checkpoint import truncate_lineage
from ..plans.superstep import no_aqe_loop


@no_aqe_loop
def kcore_subgraph(graph: EdgeGraph, k: int, max_rounds: int = 1000) -> DataFrame:
    """Canonical undirected edges of the K-core (src<dst, deduped)."""
    edges = graph.canonical_undirected_edges
    prev_edges = None
    for _ in range(max_rounds):
        deg = (
            edges.select(F.col("src").alias("id"))
            .unionAll(edges.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("id")
        pruned = (
            edges.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
        )
        pruned = truncate_lineage(pruned)
        n = pruned.count()
        if prev_edges is not None and n == prev_count:
            edges.unpersist()
            return pruned
        if prev_edges is not None:
            prev_edges.unpersist()
        prev_edges, prev_count, edges = pruned, n, pruned
        if n == 0:
            return pruned
    return edges


def kcore_table(graph: EdgeGraph, kmin: int = 1, kmax: int = 10) -> list[dict]:
    """Per-K surviving (vertices, edges) — the reference's report
    (``kcore.cpp`` driver, ``graph_analytics.dox:430-460``). Each K's
    peel starts from the previous K's core (monotone nesting)."""
    out = []
    core = EdgeGraph(graph.canonical_undirected_edges, graph.num_edge_partitions,
                     drop_self_loops=False, persist=False)
    for k in range(kmin, kmax + 1):
        edges = kcore_subgraph(core, k)
        n_e = edges.count()
        n_v = (
            edges.select(F.col("src").alias("id"))
            .unionAll(edges.select(F.col("dst").alias("id")))
            .distinct()
            .count()
        )
        out.append({"k": k, "vertices": n_v, "edges": n_e})
        if n_e == 0:
            break
        core = EdgeGraph(edges, graph.num_edge_partitions, drop_self_loops=False,
                         persist=False)
    return out
