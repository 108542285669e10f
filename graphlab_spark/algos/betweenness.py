"""Betweenness centrality via multi-source Brandes accumulation.

Engine extension: the reference's graph-analytics toolkit has no
betweenness app, but it is the canonical "which vertices broker the
link graph" question asked next after PageRank, and the standard
scalable form — Brandes (2001) restricted to a source sample, cf.
Bader/Madduri's approximate variant — maps onto the same
level-synchronous machinery as SSSP
(``/root/reference/toolkits/graph_analytics/sssp.cpp`` is the closest
reference shape: frontier relaxation from a source set).

Definition computed here: for the given ``sources`` S,

    bc(v) = sum_{s in S, s != v} delta_s(v),
    delta_s(v) = sum_{t} sigma_st(v) / sigma_st   (v not in {s, t})

i.e. the exact Brandes dependency sum over the chosen source set, on
the *simple* (deduplicated) undirected graph by default.  With S = all
vertices this is exact (directed-pair counting: each unordered pair
contributes from both endpoints); with a sampled S it is the classic
|S|-source estimator — the 100-TB scale path, where S stays O(100)
while V grows.

Spark plan, all Catalyst-side (no UDFs, one action per superstep):

- forward: level-synchronous multi-root BFS carrying
  ``(root, id, dist, sigma)`` — one frontier⋈edges shuffle join plus a
  (root, dst) partial+final hash-agg summing path counts, and one
  anti-join against the visited set, per level; each level is one
  eager-checkpoint job plus a count of the checkpointed blocks (the
  new-vertex count is the delta of cumulative totals);
- the shortest-path DAG is materialized once as
  ``(root, v, w, dv, sv, sw)`` via two hash joins;
- backward: for level L = maxdist-1 .. 0, one (root, w)-keyed join of
  the dag slice at L with the already-final deltas — Brandes'
  delta(v) = sum_w sv/sw * (1 + delta(w));
- state is O(|V| * |S|) rows; every shuffle is keyed by
  (root, vertex) so skew stays bounded by the degree distribution,
  and lineage is cut at every level materialization (the same
  per-superstep discipline as ``run_bsp``).

The whole computation is replayed exactly by the chained recursive-CTE
oracle ``oracles.sql_betweenness_hubs`` (BFS recursion, then a
descending-level accumulation recursion over the DAG).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeGraph
from ..plans.checkpoint import truncate_lineage
from ..plans.superstep import no_aqe_loop


@no_aqe_loop
def betweenness(
    graph: EdgeGraph,
    sources: list[int],
    directed: bool = False,
    max_supersteps: int = 64,
    verbose: bool = False,
) -> DataFrame:
    """Returns ``(id long, bc double)`` for every vertex (0.0 for
    vertices on no shortest path).

    ``sources`` not present in the graph contribute nothing (mirrors
    ``sssp``'s init-by-membership).  Parallel edges are collapsed:
    betweenness is a simple-graph statistic, so path multiplicity from
    duplicate log lines would be an artifact, not signal.

    No durable checkpoint/resume (unlike the ``run_bsp`` algos): a BFS
    level is O(diameter) supersteps, so a failed run is re-run; the
    per-level localCheckpoints exist for lineage/self-join hygiene,
    with superseded snapshots reclaimed by the context cleaner as the
    Python references drop — the same lifecycle ``run_bsp`` state has.

    Raises ``RuntimeError`` if the BFS has not exhausted every frontier
    within ``max_supersteps`` — a truncated forward phase would yield
    silently undercounted centralities.  Exhaustion is confirmed by one
    empty superstep, so the effective requirement is
    ``max_supersteps >= diameter + 1`` (a deepest frontier landing
    exactly at ``max_supersteps`` raises, conservatively).
    """
    # lineage is cut at every materialization (run_bsp's per-superstep
    # discipline): the loops below re-join state against `edges` and
    # against earlier state, and shared lineage would both trip Spark's
    # ambiguous-self-join analysis and grow the plan unboundedly.
    # truncate_lineage is eager, so each call IS the level's one action.
    edges_plan = (graph.edges if directed else graph.symmetric_edges)
    # repartition+sort BEFORE the lineage cut: localCheckpoint preserves
    # both the hash partitioning and the within-partition order, so the
    # per-level frontier ⋈ edges merge joins stream the checkpointed
    # sorted blocks with no per-level exchange or sort of the edge side
    # (locally neutral on the 398k-edge sf0.1 graph — driver actions
    # dominate — but at scale a per-level full-edge shuffle+sort is the
    # dominant cost this layout removes)
    edges = truncate_lineage(
        edges_plan.select("src", "dst").distinct()
        .repartition(graph.num_edge_partitions, "src")
        .sortWithinPartitions("src"))
    visited, max_dist = _forward_bfs(graph, edges, sources,
                                     max_supersteps, verbose)

    # shortest-path DAG: v -> w with dist(w) = dist(v) + 1, same root
    fv = visited.select(F.col("root"), F.col("id").alias("v"),
                        F.col("dist").alias("dv"), F.col("sigma").alias("sv"))
    fw = visited.select(F.col("root").alias("root_w"),
                        F.col("id").alias("w"),
                        F.col("dist").alias("dw"), F.col("sigma").alias("sw"))
    dag = truncate_lineage(
        fv.join(edges, fv["v"] == edges["src"])
        .join(fw, (edges["dst"] == fw["w"])
              & (fv["root"] == fw["root_w"])
              & (fw["dw"] == fv["dv"] + 1))
        .select("root", "v", "w", "dv", "sv", "sw")
    )

    # backward accumulation, level by level; a delta is final as soon
    # as its level is processed.  The dag enforces dw = dv + 1, so the
    # join only ever needs the *previous* level's slice — joining the
    # full accumulated table would shuffle an ever-growing DataFrame
    # for a join in which one level's rows can match; the finished
    # slices are kept aside and unioned once for the final aggregation.
    prev = truncate_lineage(
        visited.filter(F.col("dist") == max_dist)
        .select("root", "id", F.lit(0.0).alias("delta"))
    )
    slices = [prev]
    for level in range(max_dist - 1, -1, -1):
        contrib = (
            dag.filter(F.col("dv") == level)
            .join(prev.select("root", F.col("id").alias("w"), "delta"),
                  ["root", "w"])
            .groupBy("root", "v")
            .agg(F.sum(F.col("sv") / F.col("sw")
                       * (F.lit(1.0) + F.col("delta"))).alias("contrib"))
        )
        level_rows = (
            visited.filter(F.col("dist") == level)
            .join(contrib,
                  (visited["root"] == contrib["root"])
                  & (visited["id"] == contrib["v"]), "left")
            .select(visited["root"], visited["id"],
                    F.coalesce("contrib", F.lit(0.0)).alias("delta"))
        )
        prev = truncate_lineage(level_rows)
        slices.append(prev)

    deltas = slices[0]
    for s in slices[1:]:
        deltas = deltas.union(s)
    return truncate_lineage(
        graph.vertices.join(
            deltas.filter(F.col("root") != F.col("id"))
            .groupBy("id").agg(F.sum("delta").alias("s")),
            "id", "left")
        .select("id", F.coalesce("s", F.lit(0.0)).alias("bc"))
    )


@no_aqe_loop
def harmonic_centrality(
    graph: EdgeGraph,
    sources: list[int],
    directed: bool = False,
    max_supersteps: int = 64,
    verbose: bool = False,
) -> DataFrame:
    """Harmonic centrality ``hc(v) = sum_{s in S, s != v, d(s,v) < inf}
    1 / d(s, v)`` over the given source set — returns ``(id long,
    hc double)`` for every vertex (0.0 when no source reaches it).

    The harmonic form (Boldi & Vigna, "Axioms for centrality") is the
    closeness variant that stays well-defined on disconnected
    log-derived graphs: unreachable pairs contribute 0 instead of
    poisoning a reciprocal-of-sum.  Shares the multi-root BFS forward
    phase with :func:`betweenness` (distances only; path counts are
    carried but unused) and inherits its source-sampling scale story
    and its ``RuntimeError`` on a truncated BFS.
    """
    edges_plan = (graph.edges if directed else graph.symmetric_edges)
    # repartition+sort BEFORE the lineage cut: localCheckpoint preserves
    # both the hash partitioning and the within-partition order, so the
    # per-level frontier ⋈ edges merge joins stream the checkpointed
    # sorted blocks with no per-level exchange or sort of the edge side
    # (locally neutral on the 398k-edge sf0.1 graph — driver actions
    # dominate — but at scale a per-level full-edge shuffle+sort is the
    # dominant cost this layout removes)
    edges = truncate_lineage(
        edges_plan.select("src", "dst").distinct()
        .repartition(graph.num_edge_partitions, "src")
        .sortWithinPartitions("src"))
    visited, _ = _forward_bfs(graph, edges, sources, max_supersteps,
                              verbose)
    return truncate_lineage(
        graph.vertices.join(
            visited.filter(F.col("dist") > 0)
            .groupBy("id")
            .agg(F.sum(F.lit(1.0) / F.col("dist")).alias("s")),
            "id", "left")
        .select("id", F.coalesce("s", F.lit(0.0)).alias("hc"))
    )


def _forward_bfs(graph, edges, sources, max_supersteps, verbose):
    """Level-synchronous multi-root BFS with path counting.  Returns
    ``(visited, max_dist)`` where visited is an eagerly-checkpointed
    ``(root, id, dist, sigma)`` DataFrame covering every vertex
    reachable from each source present in the graph."""
    src_lit = F.array(*[F.lit(int(s)) for s in sources])
    visited = truncate_lineage(
        graph.vertices.filter(F.array_contains(src_lit, F.col("id")))
        .select(
            F.col("id").alias("root"),
            F.col("id"),
            F.lit(0).alias("dist"),
            F.lit(1.0).alias("sigma"),
        )
    )
    total = visited.count()
    frontier = visited
    max_dist = 0
    exhausted = total == 0
    for it in range(1, max_supersteps + 1):
        expanded = (
            frontier.join(edges, frontier["id"] == edges["src"])
            .groupBy("root", "dst")
            .agg(F.sum("sigma").alias("sigma"))
            .select("root", F.col("dst").alias("id"),
                    F.lit(it).alias("dist"), "sigma")
        )
        new = expanded.join(visited.select("root", "id"), ["root", "id"],
                            "left_anti")
        grown = truncate_lineage(visited.union(new))
        new_total = grown.count()
        n_new = new_total - total
        if verbose:
            print(f"forward bfs {it}: {n_new} new")
        if n_new == 0:
            exhausted = True
            break
        total, max_dist = new_total, it
        # the next frontier is exactly the rows discovered this level
        visited = grown
        frontier = grown.filter(F.col("dist") == it)
    if not exhausted:
        raise RuntimeError(
            f"multi-source BFS frontier still growing after "
            f"{max_supersteps} supersteps — results would be silently "
            "undercounted; raise max_supersteps above the graph diameter")
    return visited, max_dist
