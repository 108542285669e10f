"""HITS (hubs & authorities, Kleinberg 1999) on the directed link graph.

The reference toolkit ships PageRank as its link-analysis workload
(``/root/reference/toolkits/graph_analytics/pagerank.cpp``); HITS is the
companion eigenvector pair every link-graph engine is asked for, and it
exercises a GAS shape PageRank does not: two gathers per superstep in
opposite edge directions (IN for authorities, OUT for hubs), with the
hub gather consuming the *same superstep's* fresh authority values.

Semantics (fixed-superstep, deterministic, oracle-able):

- init ``hub = auth = 1.0`` for every vertex;
- per superstep: ``auth(v) = Σ_{u→v} hub(u)`` then
  ``hub(u) = Σ_{u→v} auth(v)`` using the NEW authorities;
- no per-superstep normalization (all intermediate values stay exact
  integers in double until ~2^53, so both engines agree bit-for-bit);
  a single L2 normalization of each score vector at the end.

Plan shape (scale-first): the edge table is persisted TWICE, hash
partitioned by ``src`` and by ``dst`` respectively, so each of the two
per-superstep joins shuffles only the |V|-sized state DataFrame; both
gathers are native partial+final hash aggregates (map-side combine
absorbs the hub/authority skew the same way it absorbs PageRank's).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeGraph
from ..plans.checkpoint import CheckpointManager
from ..plans.superstep import BSPResult, run_bsp


def hits(
    graph: EdgeGraph,
    supersteps: int = 3,
    checkpoint: CheckpointManager | None = None,
    resume: bool = True,
    verbose: bool = False,
) -> BSPResult:
    """Returns BSPResult whose state is ``(id, hub double, auth double)``,
    L2-normalized per score."""
    n = graph.num_edge_partitions
    e_by_src = (graph.edges.select("src", "dst")
                .repartition(n, "src").sortWithinPartitions("src").persist())
    e_by_dst = (graph.edges.select("src", "dst")
                .repartition(n, "dst").sortWithinPartitions("dst").persist())
    init = graph.vertices.select(
        "id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth"))

    def step(state: DataFrame, i: int):
        a_msgs = (
            e_by_src.join(
                state.select(F.col("id").alias("sid"), "hub"),
                e_by_src["src"] == F.col("sid"))
            .groupBy("dst").agg(F.sum("hub").alias("a_t"))
        )
        st1 = (
            state.join(a_msgs, state["id"] == a_msgs["dst"], "left")
            .select("id", "hub",
                    F.coalesce("a_t", F.lit(0.0)).alias("auth"))
        )
        h_msgs = (
            e_by_dst.join(
                st1.select(F.col("id").alias("aid"), "auth"),
                e_by_dst["dst"] == F.col("aid"))
            .groupBy("src").agg(F.sum("auth").alias("h_t"))
        )
        new_state = (
            st1.join(h_msgs, st1["id"] == h_msgs["src"], "left")
            .select("id",
                    F.coalesce("h_t", F.lit(0.0)).alias("hub"),
                    "auth")
        )
        return new_state, {}, i + 1 >= supersteps

    result = run_bsp(
        init, step, max_supersteps=supersteps,
        checkpoint=checkpoint, resume=resume, verbose=verbose)
    e_by_src.unpersist()
    e_by_dst.unpersist()
    # Single terminal L2 normalization: a 1-row aggregate broadcast back
    # onto the state (never a global window sort).
    norms = result.state.agg(
        F.sqrt(F.sum(F.col("hub") * F.col("hub"))).alias("nh"),
        F.sqrt(F.sum(F.col("auth") * F.col("auth"))).alias("na"))
    normalized = result.state.crossJoin(F.broadcast(norms)).select(
        "id",
        F.when(F.col("nh") > 0, F.col("hub") / F.col("nh"))
         .otherwise(F.lit(0.0)).alias("hub"),
        F.when(F.col("na") > 0, F.col("auth") / F.col("na"))
         .otherwise(F.lit(0.0)).alias("auth"),
    )
    return BSPResult(
        state=normalized,
        supersteps=result.supersteps,
        converged=result.converged,
        history=result.history,
    )
