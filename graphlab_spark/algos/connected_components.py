"""Connected components via hash-min label propagation.

Parity contract
(``/root/reference/toolkits/graph_analytics/connected_component.cpp``):

- labels init to own vertex id (``connected_component.cpp:51-53``);
- message monoid = min (``:56-75``); no gather phase;
- apply takes min(received, current) and flags change (``:105-113``);
- scatter over ALL edges signals the endpoint holding the larger label
  (``:124-134``); terminate when nothing is signaled.

Spark plan: symmetrize edges once (ALL_EDGES), then per superstep only
the CHANGED vertices (the active set — the analog of the reference's
``active_superstep`` bitset, ``synchronous_engine.hpp:1571-1587``) join
onto edges and propagate their label; messages min-merge in the shuffle
(map-side partial aggregation = the reference's in-flight message
combining, ``synchronous_engine.hpp:1457-1494``). Converged labels are
exactly the min vertex id of each component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeGraph
from ..plans.checkpoint import CheckpointManager
from ..plans.superstep import BSPResult, run_bsp


def connected_components(
    graph: EdgeGraph,
    max_supersteps: int = 200,
    checkpoint: CheckpointManager | None = None,
    resume: bool = True,
    verbose: bool = False,
) -> BSPResult:
    """Returns BSPResult whose state is ``(id long, component long)``.

    State carries a ``__changed`` flag between supersteps so the active
    set needs no extra join; it is stripped from the final result.
    """
    sym = graph.symmetric_edges
    init = graph.vertices.select(
        "id", F.col("id").alias("component"), F.lit(True).alias("__changed")
    )

    def step(state: DataFrame, i: int):
        active = state.filter(F.col("__changed")).select("id", "component")
        msgs = (
            sym.join(active, sym["src"] == active["id"])
            .groupBy("dst")
            .agg(F.min("component").alias("received"))
        )
        joined = state.join(msgs, state["id"] == msgs["dst"], "left")
        new_state = joined.select(
            "id",
            F.least(F.col("component"), F.coalesce("received", "component")).alias(
                "component"
            ),
            (F.coalesce("received", "component") < F.col("component")).alias("__changed"),
        )
        from pyspark.sql import Observation
        obs = Observation(f"cc_{i}")
        observed = new_state.observe(
            obs, F.sum(F.col("__changed").cast("long")).alias("active"))

        def finish():
            n_active = int(obs.get["active"] or 0)
            return ({"active": n_active, "max_delta": float(n_active)},
                    n_active == 0)

        return observed, finish

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


def component_size_histogram(components: DataFrame) -> DataFrame:
    """Component-size histogram, the reference's CC-stats aggregate
    (``connected_component_stats.cpp:65-96``): (size, n_components)."""
    return (
        components.groupBy("component")
        .agg(F.count("*").alias("size"))
        .groupBy("size")
        .agg(F.count("*").alias("n_components"))
    )
