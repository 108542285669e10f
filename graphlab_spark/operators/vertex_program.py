"""Declarative GAS vertex programs from runtime expressions.

The reference ships an extension framework that lets users define a
vertex program at RUNTIME from registered lambdas — no engine
recompile (``/root/reference/toolkits/extensions/extension_gas.hpp``,
``extension_gas_lambda_wrapper.hpp``; ``extension_pagerank.cpp`` is
its PageRank-as-config demo).  The Spark-native re-creation: the three
GAS hooks are SQL expression *strings* compiled by Catalyst, and the
merge is a named distributed aggregate — the resulting superstep plan
is byte-identical in shape to the hand-written algorithms (state ⋈
edges join, partial+final aggregation, left-join apply, observed
convergence metric), because it runs through the same ``run_bsp``.

Expression vocabulary:

- ``init``   sees ``id, out_degree, in_degree``;
- ``gather`` sees the gathering edge joined with the NEIGHBOR's state:
  ``val, out_degree, in_degree`` (neighbor's), ``src, dst`` and any
  extra edge columns (e.g. ``w``);
- ``apply``  sees ``id, val`` (old value), ``total`` (merged gather,
  NULL when nothing gathered — the reference's default-constructed
  accumulator, ``synchronous_engine.hpp:1589-1590``) and the degrees.

``gather_edges`` follows the reference's gather direction ('in': each
vertex gathers over its in-edges, i.e. from edge sources; 'out':
over out-edges; 'all': both).  Values must be numeric — convergence
is measured as ``max(abs(new - old))`` against ``tol``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..graph import EdgeGraph
from ..plans.checkpoint import CheckpointManager
from ..plans.superstep import BSPResult, run_bsp

#: named merge aggregates — all algebraic, so Spark executes them as
#: partial (map-side) + final aggregation, the analog of the
#: reference's local-gather-then-master merge
MERGES = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "avg": F.avg,
}


@dataclass(frozen=True)
class VertexProgram:
    """A GAS program defined entirely by runtime expressions."""

    init: str
    gather: str
    merge: str = "sum"
    apply: str = "coalesce(total, val)"
    gather_edges: str = "in"

    def __post_init__(self) -> None:
        if self.merge not in MERGES:
            raise ValueError(
                f"unknown merge {self.merge!r}; pick one of {sorted(MERGES)}")
        if self.gather_edges not in ("in", "out", "all"):
            raise ValueError("gather_edges must be 'in' | 'out' | 'all'")

    # -- execution --------------------------------------------------------

    def run(
        self,
        graph: EdgeGraph,
        tol: float = 0.0,
        max_supersteps: int = 100,
        fixed_supersteps: int | None = None,
        checkpoint: CheckpointManager | None = None,
        resume: bool = True,
        verbose: bool = False,
    ) -> BSPResult:
        """Run to convergence (``max |Δval| <= tol``) or for
        ``fixed_supersteps``.  Returns a BSPResult whose state is
        ``(id, val, out_degree, in_degree)``."""
        if self.gather_edges == "in":
            edge_view = graph.edges
        elif self.gather_edges == "out":
            extra = [c for c in graph.edges.columns if c not in ("src", "dst")]
            edge_view = graph.edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), *extra)
        else:
            edge_view = graph.symmetric_edges
        merge_fn = MERGES[self.merge]

        degs = (
            graph.vertices
            .join(graph.out_degrees, "id", "left")
            .join(graph.in_degrees, "id", "left")
            .select(
                "id",
                F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
                F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            )
        )
        init_state = degs.select(
            "id", F.expr(self.init).alias("val"), "out_degree", "in_degree")

        def step(state: DataFrame, i: int):
            msgs = (
                edge_view.join(state, edge_view["src"] == state["id"])
                .select(F.col("dst").alias("__to"),
                        F.expr(self.gather).alias("__m"))
            )
            totals = msgs.groupBy("__to").agg(merge_fn("__m").alias("total"))
            joined = state.join(
                totals, state["id"] == totals["__to"], "left")
            applied = joined.select(
                "id",
                F.expr(self.apply).alias("__nv"),
                "val", "out_degree", "in_degree",
            )
            new_state = applied.select(
                "id", F.col("__nv").alias("val"), "out_degree", "in_degree",
                F.abs(F.col("__nv").cast("double")
                      - F.col("val").cast("double")).alias("__delta"),
            )
            if fixed_supersteps is not None:
                converged = i + 1 >= fixed_supersteps
                return (new_state.drop("__delta"),
                        {"active": -1, "max_delta": float("nan")}, converged)
            obs = Observation(f"vprog_{id(self)}_{i}")
            observed = new_state.observe(
                obs,
                F.max("__delta").alias("max_delta"),
                F.sum(F.when(F.col("__delta") > tol, 1).otherwise(0))
                 .alias("active"),
            ).drop("__delta")

            def finish():
                row = obs.get
                max_delta = float(row["max_delta"] or 0.0)
                return (
                    {"active": int(row["active"] or 0),
                     "max_delta": max_delta},
                    max_delta <= tol,
                )

            return observed, finish

        return run_bsp(
            init_state,
            step,
            max_supersteps=(max_supersteps if fixed_supersteps is None
                            else fixed_supersteps),
            checkpoint=checkpoint,
            resume=resume,
            verbose=verbose,
        )


#: the reference demo program (``extension_pagerank.cpp``) as config —
#: identical semantics to ``algos.pagerank`` (asserted in tests)
PAGERANK_PROGRAM = VertexProgram(
    init="cast(1.0 as double)",
    gather="val / out_degree",
    merge="sum",
    apply="0.15 + 0.85 * coalesce(total, cast(0.0 as double))",
    gather_edges="in",
)

#: hash-min connected components as config — label flows both ways
CC_PROGRAM = VertexProgram(
    init="id",
    gather="val",
    merge="min",
    apply="least(val, coalesce(total, val))",
    gather_edges="all",
)
