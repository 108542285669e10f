"""Single-source shortest paths (message-model Bellman-Ford).

Parity contract (``/root/reference/toolkits/graph_analytics/sssp.cpp``):

- messages carry min-distance and merge with min (``sssp.cpp:92-101``);
- apply keeps the min of current and received (``:144-152``);
- scatter relaxes ``dist + edge.dist`` and signals improved neighbors
  (``:157-175``) — i.e. only vertices whose distance changed propagate;
- edge weight defaults to 1.0 (``:60-65``); directed or undirected
  (``--directed`` flag, default treats edges as undirected);
- multi-source supported (``:254+``); unreached vertices keep +inf
  (``std::numeric_limits<double>::max()`` init, ``:45-50``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeGraph
from ..plans.checkpoint import CheckpointManager
from ..plans.superstep import BSPResult, run_bsp

INF = float("inf")


def sssp(
    graph: EdgeGraph,
    sources: list[int],
    directed: bool = False,
    weight_col: str | None = None,
    max_supersteps: int = 200,
    checkpoint: CheckpointManager | None = None,
    resume: bool = True,
    verbose: bool = False,
) -> BSPResult:
    """Returns BSPResult whose state is ``(id long, distance double)``;
    unreachable vertices have distance = +Infinity."""
    edges = graph.edges if directed else graph.symmetric_edges
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    edges = edges.select("src", "dst", w.alias("__w"))
    src_lit = F.array(*[F.lit(int(s)) for s in sources])
    init = graph.vertices.select(
        "id",
        F.when(F.array_contains(src_lit, F.col("id")), F.lit(0.0))
        .otherwise(F.lit(INF))
        .alias("distance"),
        F.array_contains(src_lit, F.col("id")).alias("__changed"),
    )

    def step(state: DataFrame, i: int):
        active = state.filter(F.col("__changed")).select("id", "distance")
        msgs = (
            edges.join(active, edges["src"] == active["id"])
            .groupBy("dst")
            .agg(F.min(F.col("distance") + F.col("__w")).alias("received"))
        )
        joined = state.join(msgs, state["id"] == msgs["dst"], "left")
        new_state = joined.select(
            "id",
            F.least("distance", F.coalesce("received", "distance")).alias("distance"),
            (F.coalesce("received", "distance") < F.col("distance")).alias("__changed"),
        ).persist()
        n_active = new_state.filter(F.col("__changed")).count()
        return new_state, {"active": n_active, "max_delta": float(n_active)}, n_active == 0

    result = run_bsp(
        init,
        step,
        max_supersteps=max_supersteps,
        checkpoint=checkpoint,
        resume=resume,
        verbose=verbose,
    )
    result.state = result.state.drop("__changed")
    return result
