"""Community detection by label propagation (LPA), exact tie-break parity.

Parity contract
(``/root/reference/apps/label_propagation/label_propagation.cpp``):

- labels are seeded externally (the reference reads ``vid label nbr...``
  lines, ``label_propagation.cpp:58-77``); our API takes an initial
  ``(id, label)`` DataFrame, defaulting to each vertex's own id as a
  string label;
- gather over ALL edges accumulates a neighbor-label count map
  (``:85-102``);
- apply picks the label whose count strictly beats the running best
  while iterating the key-ORDERED map (``:104-128``) — i.e. winner =
  max count, ties broken to the LEXICOGRAPHICALLY SMALLEST label; a
  vertex with no neighbors keeps its label (empty gather);
- scatter signals neighbors of changed vertices (``:130-143``);
  synchronous engine is the default (``:165``).

Spark plan: per superstep ``labels ⋈ symmetric_edges`` then a two-level
aggregation — ``groupBy(dst,label).count()`` (partial+final, absorbs
hub fan-in) followed by ``groupBy(dst).min_by(label, struct(-count,
label))`` which reproduces the ordered-map argmax exactly without a
window sort. No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeGraph
from ..plans.checkpoint import CheckpointManager
from ..plans.superstep import BSPResult, run_bsp


def label_propagation(
    graph: EdgeGraph,
    initial_labels: DataFrame | None = None,
    max_supersteps: int = 50,
    checkpoint: CheckpointManager | None = None,
    resume: bool = True,
    verbose: bool = False,
    schedule: str = "dense",
) -> BSPResult:
    """Returns BSPResult whose state is ``(id long, label string)``.

    ``schedule="dense"`` recomputes every vertex each superstep — the
    reference's synchronous engine shape.  ``schedule="frontier"``
    recomputes only destinations with >=1 changed neighbor (the
    scatter-signalling the reference's async scheduler approximates,
    ``label_propagation.cpp:130-143``): labels are bit-identical to the
    dense schedule — a destination whose neighbors all kept their
    labels would recompute the same winner — but late supersteps, where
    the active set is a sparse tail, shrink from O(|E|) to
    O(edges-into-active) gather work.  The changed flag rides in the
    checkpointed state, so frontier runs resume correctly.
    """
    if schedule not in ("dense", "frontier"):
        raise ValueError(f"schedule must be dense|frontier, got {schedule!r}")
    sym = graph.symmetric_edges
    if initial_labels is None:
        init = graph.vertices.select("id", F.col("id").cast("string").alias("label"))
    else:
        # Left join so vertices missing from the seed keep their id label.
        init = (
            graph.vertices.join(
                initial_labels.withColumnRenamed("label", "__seed"), "id", "left"
            )
            .select(
                "id",
                F.coalesce(F.col("__seed"), F.col("id").cast("string")).alias("label"),
            )
        )

    if schedule == "frontier":
        return _lpa_frontier(graph, sym, init, max_supersteps, checkpoint,
                             resume, verbose)

    def step(state: DataFrame, i: int):
        counts = (
            sym.join(state, sym["src"] == state["id"])
            .groupBy("dst", "label")
            .agg(F.count("*").alias("cnt"))
        )
        # Ordered-map argmax: largest count, tie -> smallest label.
        winners = counts.groupBy("dst").agg(
            F.min_by("label", F.struct((-F.col("cnt")).alias("nc"), "label")).alias(
                "winner"
            )
        )
        joined = state.join(winners, state["id"] == winners["dst"], "left")
        new_state = joined.select(
            "id",
            F.coalesce("winner", "label").alias("label"),
            (F.coalesce("winner", "label") != F.col("label")).alias("__changed"),
        )
        from pyspark.sql import Observation
        obs = Observation(f"lpa_{i}")
        observed = new_state.observe(
            obs, F.sum(F.col("__changed").cast("long")).alias("active")
        ).drop("__changed")

        def finish():
            changed = int(obs.get["active"] or 0)
            return ({"active": changed, "max_delta": float(changed)},
                    changed == 0)

        return observed, finish

    return run_bsp(
        init,
        step,
        max_supersteps=max_supersteps,
        checkpoint=checkpoint,
        resume=resume,
        verbose=verbose,
    )


def _lpa_frontier(graph, sym, init, max_supersteps, checkpoint, resume,
                  verbose) -> BSPResult:
    """Frontier-pruned LPA schedule: state carries ``(id, label, chg)``;
    each superstep gathers only over edges whose destination has a
    changed in-neighbor, and every other vertex keeps its prior winner.
    The initial chg=true on all vertices makes superstep 1 identical to
    the dense schedule, and by induction each skipped destination's
    retained label equals the winner a dense recompute would produce
    (its neighbor-label counts are unchanged)."""

    def step(state: DataFrame, i: int):
        active = state.filter(F.col("chg")).select("id")
        dests = (
            sym.join(active, sym["src"] == active["id"], "left_semi")
            .select("dst").distinct()
        )
        counts = (
            sym.join(dests, "dst", "left_semi")
            .join(state, sym["src"] == state["id"])
            .groupBy("dst", "label")
            .agg(F.count("*").alias("cnt"))
        )
        winners = counts.groupBy("dst").agg(
            F.min_by("label", F.struct((-F.col("cnt")).alias("nc"), "label"))
            .alias("winner")
        )
        joined = state.join(winners, state["id"] == winners["dst"], "left")
        new_state = joined.select(
            "id",
            F.coalesce("winner", "label").alias("label"),
            (F.coalesce("winner", "label") != F.col("label")).alias("chg"),
        )
        from pyspark.sql import Observation
        obs = Observation(f"lpa_frontier_{i}")
        observed = new_state.observe(
            obs, F.sum(F.col("chg").cast("long")).alias("active")
        )

        def finish():
            changed = int(obs.get["active"] or 0)
            return ({"active": changed, "max_delta": float(changed)},
                    changed == 0)

        return observed, finish

    res = run_bsp(
        init.withColumn("chg", F.lit(True)),
        step,
        max_supersteps=max_supersteps,
        checkpoint=checkpoint,
        resume=resume,
        verbose=verbose,
    )
    return BSPResult(res.state.select("id", "label"), res.supersteps,
                     res.converged, res.history)
