"""Jacobi iterative linear solver (linear_solvers toolkit).

Reference analog: ``/root/reference/toolkits/linear_solvers/jacobi.cpp``
— solve ``A x = b`` where A is encoded as a graph (off-diagonal entries
``a_ij`` on edges, diagonal ``a_ii`` and ``b_i`` on vertices); each
superstep every vertex gathers ``sum_j a_ij * x_j`` over its edges and
applies ``x_i' = (b_i - sum) / a_ii``.  Converges for diagonally
dominant systems; convergence metric = max |x' - x|.

Spark plan: the same join-aggregate-apply superstep as PageRank with a
weighted message — reuses ``run_bsp`` (checkpoint/resume included).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import CheckpointManager
from ..plans.superstep import BSPResult, run_bsp


def jacobi(
    edges: DataFrame,
    vertices: DataFrame,
    tol: float = 1e-9,
    max_supersteps: int = 500,
    checkpoint: CheckpointManager | None = None,
    resume: bool = True,
) -> BSPResult:
    """``edges``: (src, dst, a) off-diagonal entries a[dst][src] (i.e. a
    message src -> dst with coefficient a); ``vertices``: (id, b, diag).
    Returns BSPResult with state (id, x).
    """
    e = edges.select("src", "dst", F.col("a").cast("double").alias("a")).persist()
    v = vertices.select("id", F.col("b").cast("double").alias("b"),
                        F.col("diag").cast("double").alias("diag")).persist()
    init = v.select("id", (F.col("b") / F.col("diag")).alias("x"))

    def step(state: DataFrame, i: int):
        acc = (
            e.join(state, e["src"] == state["id"])
            .select("dst", (F.col("a") * F.col("x")).alias("m"))
            .groupBy("dst").agg(F.sum("m").alias("s"))
        )
        joined = (
            v.join(acc, v["id"] == acc["dst"], "left")
            .join(state.withColumnRenamed("x", "x_old"), "id")
        )
        new_state = joined.select(
            "id",
            ((F.col("b") - F.coalesce("s", F.lit(0.0))) / F.col("diag")).alias("x"),
            F.col("x_old"),
        )
        from pyspark.sql import Observation
        obs = Observation(f"jacobi_{i}")
        observed = new_state.observe(
            obs, F.max(F.abs(F.col("x") - F.col("x_old"))).alias("d")
        ).drop("x_old")

        def finish():
            delta = float(obs.get["d"] or 0.0)
            return {"max_delta": delta, "active": -1}, delta <= tol

        return observed, finish

    res = run_bsp(init, step, max_supersteps=max_supersteps,
                  checkpoint=checkpoint, resume=resume)
    e.unpersist()
    v.unpersist()
    return res


def residual_norm(edges: DataFrame, vertices: DataFrame, x: DataFrame) -> float:
    """||A x - b||_inf — the reference's final validation aggregate."""
    ax_off = (
        edges.join(x.withColumnRenamed("id", "src"), "src")
        .select("dst", (F.col("a") * F.col("x")).alias("m"))
        .groupBy(F.col("dst").alias("id")).agg(F.sum("m").alias("off"))
    )
    full = (
        vertices.join(x, "id")
        .join(ax_off, "id", "left")
        .select(
            (F.col("diag") * F.col("x") + F.coalesce("off", F.lit(0.0))
             - F.col("b")).alias("r"))
    )
    return float(full.agg(F.max(F.abs("r"))).first()[0])
