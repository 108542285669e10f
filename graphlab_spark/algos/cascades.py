"""SIR cascade simulation + bond percolation.

Parity contract (``/root/reference/apps/cascades/cascades.cpp:40-70``):
the reference's vertex program gathers the number of infected
neighbors and flips susceptible vertices stochastically; recovered
vertices leave the process.  A BSP engine with an *oracle-replayable*
contract needs the stochastic choices pinned, so transmission is
decided per directed edge by an engine-portable hash threshold
(``operators/portable.py``): edge (u, v) transmits iff
``edge_hash(u, v) % 100 < p_percent``.

Under deterministic per-edge transmission, SIR collapses to BFS on the
transmitting subgraph — a vertex's infection step is its hop distance
from the seed set — so the superstep loop is the same min-propagation
shape as SSSP (``algos/sssp.py``), and the DuckDB oracle replays it as
a recursive frontier expansion (``oracles.sql_sir_cascade``).

Bond percolation (``apps/warp_bond_percolation.cpp``) keeps each
undirected edge with probability p and reports the surviving component
structure — here: hash-filter the canonical edge set, then reuse
hash-min connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeGraph
from ..operators.portable import edge_hash
from ..plans.superstep import BSPResult, run_bsp


def transmitting_edges(graph: EdgeGraph, p_percent: int) -> DataFrame:
    """Directed ALL_EDGES view filtered to transmitting edges."""
    sym = graph.symmetric_edges
    return sym.filter(edge_hash("src", "dst") % 100 < p_percent).select(
        "src", "dst")


def sir_cascade(
    graph: EdgeGraph,
    seeds: list[int],
    p_percent: int = 30,
    max_steps: int = 200,
    resume: bool = True,
    verbose: bool = False,
) -> BSPResult:
    """Returns BSPResult whose state is ``(id long, step int)`` for
    INFECTED vertices only: step = superstep at which the infection
    arrived (seeds at 0)."""
    edges = transmitting_edges(graph, p_percent)
    seed_arr = F.array(*[F.lit(int(s)) for s in seeds])
    init = graph.vertices.select(
        "id",
        F.when(F.array_contains(seed_arr, F.col("id")), F.lit(0))
        .otherwise(F.lit(None)).cast("int").alias("step"),
        F.array_contains(seed_arr, F.col("id")).alias("__changed"),
    )

    def step_fn(state: DataFrame, i: int):
        frontier = state.filter(F.col("__changed")).select("id")
        msgs = (
            edges.join(frontier, edges["src"] == frontier["id"])
            .select("dst").distinct()
            .withColumn("arrived", F.lit(i + 1))
        )
        joined = state.join(msgs, state["id"] == msgs["dst"], "left")
        newly = F.col("step").isNull() & F.col("arrived").isNotNull()
        new_state = joined.select(
            "id",
            F.when(newly, F.col("arrived")).otherwise(F.col("step"))
            .cast("int").alias("step"),
            newly.alias("__changed"),
        )
        from pyspark.sql import Observation
        obs = Observation(f"sir_{i}")
        observed = new_state.observe(
            obs, F.sum(F.col("__changed").cast("long")).alias("active"))

        def finish():
            n = int(obs.get["active"] or 0)
            return ({"active": n, "max_delta": float(n)}, n == 0)

        return observed, finish

    result = run_bsp(init, step_fn, max_supersteps=max_steps,
                     resume=resume, verbose=verbose)
    result.state = result.state.filter(F.col("step").isNotNull()).drop(
        "__changed")
    return result


def bond_percolation(graph: EdgeGraph, p_percent: int = 50,
                     resume: bool = True) -> DataFrame:
    """(id, component) over the percolated graph: canonical undirected
    edges surviving the hash threshold, labeled by hash-min CC.
    Isolated vertices (all incident edges removed) are their own
    singleton components."""
    from .connected_components import connected_components

    kept = graph.canonical_undirected_edges.filter(
        edge_hash("src", "dst") % 100 < p_percent)
    sub = EdgeGraph(kept, graph.num_edge_partitions,
                    drop_self_loops=False, persist=False)
    labeled = connected_components(sub, resume=resume).state
    singletons = (
        graph.vertices.join(labeled.select("id"), "id", "left_anti")
        .select("id", F.col("id").alias("component"))
    )
    return labeled.unionAll(singletons)
