"""Deterministic random-walk corpus generation (DeepWalk / node2vec
p=q=1 sampling) over the link graph.

A graph-embedding training pipeline's first stage is materializing a
corpus of fixed-length random walks; at 10^12-turn scale that corpus is
produced distributed, never on a driver.  The walk step is a pure
GAS-shaped iteration: state = the frontier of in-progress walks, gather
= pick one out-neighbor.  The reference has no sampling toolkit; this
is a pipeline extension (project brief) built on the same plan shape as
``algos/pagerank.py``.

Determinism: the step choice is the engine-portable integer hash
``edge_hash(edge_hash(start, j*100003 + step + seed), vertex) % deg``
(``operators/portable.py``), so any engine — the DuckDB oracle included
— replays the identical corpus.  Neighbor order is made canonical by
ranking each vertex's DISTINCT out-neighbors by id (duplicate
multi-edges do not bias the uniform choice; weighted sampling is the
weights' job, not the multigraph's).

Plan shape: the ranked adjacency (one per-src window numbering — a
single partition-local sort after one shuffle, computed once) and the
out-degree table are persisted hash-partitioned by ``src``; each of the
``walk_length`` steps shuffles only the walk frontier into those
layouts (two state-side-only joins per step) and truncates lineage.
Hot hubs are read-only join targets here — the frontier rows matched to
a hub are spread across partitions by their own keys, so no salting is
needed.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..graph import EdgeGraph
from ..operators import portable as P
from ..plans.checkpoint import truncate_lineage

J_MIX = 100_003  # folds (j, step) into one integer before hashing


def _step_hash(seed: int):
    return P.edge_hash(
        P.edge_hash(F.col("start"),
                    F.col("j") * J_MIX + F.col("step") + seed),
        F.col("vertex"))


def random_walks(
    graph: EdgeGraph,
    walk_length: int = 8,
    walks_per_vertex: int = 1,
    seed: int = 7,
) -> DataFrame:
    """Returns ``(start long, j int, step int, vertex long)`` — one row
    per visited vertex per walk, steps 0..walk_length (walks stop early
    at a sink vertex).  ``j`` indexes the walks started at ``start``."""
    if walk_length < 1 or walks_per_vertex < 1:
        raise ValueError("walk_length and walks_per_vertex must be >= 1")
    n = graph.num_edge_partitions
    adj = graph.edges.select("src", "dst").distinct()
    rank_w = Window.partitionBy("src").orderBy("dst")
    adj = (adj.select(
        "src", "dst", (F.row_number().over(rank_w) - 1).alias("nbr_rank"))
        .repartition(n, "src").sortWithinPartitions("src").persist())
    degs = (adj.groupBy("src").agg(F.count("*").alias("deg"))
            .repartition(n, "src").sortWithinPartitions("src").persist())

    frontier = graph.vertices.select(
        F.col("id").alias("start"),
        F.explode(
            F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))).alias("j"),
        F.lit(0).alias("step"),
        F.col("id").alias("vertex"),
    )
    out = [frontier]
    for _ in range(walk_length):
        # adj/degs are joined once per step against frontiers derived
        # from themselves — qualify every reference so the repeated
        # self-joins stay unambiguous.
        with_idx = (
            frontier.alias("w")
            .join(degs.alias("d"), F.col("w.vertex") == F.col("d.src"))
            .select(F.col("w.start").alias("start"),
                    F.col("w.j").alias("j"),
                    F.col("w.step").alias("step"),
                    F.col("w.vertex").alias("vertex"),
                    F.pmod(_step_hash(seed), F.col("d.deg")).alias("idx"))
        )
        frontier = (
            with_idx.alias("x")
            .join(adj.alias("a"),
                  (F.col("x.vertex") == F.col("a.src"))
                  & (F.col("x.idx") == F.col("a.nbr_rank")))
            .select(F.col("x.start").alias("start"),
                    F.col("x.j").alias("j"),
                    (F.col("x.step") + 1).alias("step"),
                    F.col("a.dst").alias("vertex"))
        )
        frontier = truncate_lineage(frontier)
        out.append(frontier)
    walks = reduce(DataFrame.unionAll, out)
    adj.unpersist()
    degs.unpersist()
    return walks


def sql_random_walks(walk_length: int = 8, walks_per_vertex: int = 1,
                     seed: int = 7) -> str:
    """DuckDB twin replaying the identical hash choices (same portable
    edge_hash, same canonical neighbor ranking)."""
    from ..oracles import _VERTS, _rec
    h = P.sql_edge_hash(
        P.sql_edge_hash("p.start", f"(p.j * {J_MIX} + p.step + {seed})"),
        "p.vertex")
    adj = ("adj AS (SELECT src, dst, row_number() OVER "
           "(PARTITION BY src ORDER BY dst) - 1 AS nbr_rank "
           "FROM (SELECT DISTINCT src, dst FROM edges))")
    degs = "degs AS (SELECT src, count(*) AS deg FROM adj GROUP BY src)"
    rec = f"""
walks(start, j, step, vertex) AS (
  SELECT id, j, 0, id FROM verts
  CROSS JOIN (SELECT unnest(range({walks_per_vertex})) AS j)
  UNION ALL
  SELECT p.start, p.j, p.step + 1, a.dst
  FROM walks p
  JOIN degs d ON p.vertex = d.src
  JOIN adj a ON a.src = p.vertex
            AND a.nbr_rank = (({h}) % d.deg)
  WHERE p.step < {walk_length}
)"""
    return (_rec(_VERTS, adj, degs, rec)
            + "SELECT start, CAST(j AS INTEGER) AS j, "
              "CAST(step AS INTEGER) AS step, vertex FROM walks")
