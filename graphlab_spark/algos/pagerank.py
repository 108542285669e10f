"""PageRank with exact reference semantics.

Parity contract (``/root/reference/toolkits/graph_analytics/pagerank.cpp``):

- init rank = 1.0 for every vertex (``pagerank.cpp:52``);
- gather over IN edges of ``src.rank / src.num_out_edges``
  (``pagerank.cpp:85-95``);
- apply: ``rank = 0.15 + 0.85 * total`` where a vertex with no in-edges
  gets the default-constructed total 0.0
  (``pagerank.cpp:98-105``, ``synchronous_engine.hpp:1589-1590``);
- ranks are NOT normalized and dangling mass is NOT redistributed
  (``graph_analytics.dox:336-339``);
- tolerance mode: iterate until every per-vertex |Δ| <= tol
  (scatter gating at ``pagerank.cpp:108-119``); fixed-iteration mode
  mirrors ``--iterations`` with ``sched_allv`` (``pagerank.cpp:216-223``).

Plan shape (scale-first): the edge table is joined ONCE with
out-degrees to bake a per-edge contribution weight, then repartitioned
by ``src`` and persisted — per superstep only the (|V|-sized) rank
DataFrame shuffles to meet it; the message aggregation is a native
partial+final hash aggregate (the analog of the reference's
local-gather-then-master merge, ``synchronous_engine.hpp:1563-1663``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeGraph
from ..plans.checkpoint import CheckpointManager
from ..plans.superstep import BSPResult, run_bsp

DAMPING = 0.85
BASE = 0.15


def pagerank(
    graph: EdgeGraph,
    tol: float = 1e-6,
    max_supersteps: int = 200,
    fixed_supersteps: int | None = None,
    checkpoint: CheckpointManager | None = None,
    resume: bool = True,
    verbose: bool = False,
    gather: str = "expr",
    salt_hubs: int | None = None,
    delta_cache: bool = False,
    fuse: int = 1,
) -> BSPResult:
    """Returns BSPResult whose state is ``(id long, rank double)``.

    ``gather``: 'expr' (default) keeps the whole superstep in Catalyst
    codegen; 'arrow' routes the gather through the CSR-block
    pandas/Arrow kernel (``plans/arrow_gather.py``) — numerically
    equivalent (same monoid, different float-sum order), there for
    monoids the expression path can't express.

    ``salt_hubs``: when set, the message reduction is two-level
    (``operators/salting.py``): partial sums per (dst, salt) then a
    final sum per dst — the explicit hub treatment beyond AQE for
    destinations whose in-degree exceeds any single-partition budget.
    Results are exactly equal (double addition is reordered the same
    way Spark's own partial aggregation already reorders it).

    ``fuse``: chain this many gather/apply rounds into ONE materialized
    plan per driver job, paying the per-job fixed costs (scheduler
    round-trip, |V|-row cache write, lineage cut, observe all-reduce)
    once per ``fuse`` supersteps.  Semantics: fixed-superstep results
    equal ``fuse=1`` up to partial-sum order (same plan chained;
    measured <= 1e-15); in tolerance mode
    convergence is checked once per chunk, so a run may execute up to
    ``fuse-1`` below-tol extra supersteps.  **Measured verdict (33M
    edges, local[32], 6 fixed supersteps, fresh JVM per trial): keep
    the default of 1.**  Steady-state per-superstep wall was a wash
    (6.39s fused-2 vs 6.32s unfused) and the first chunk ~3x slower —
    each round consumes its input state twice (gather join + apply
    join), so an unmaterialized intermediate round recomputes instead
    of reading the superstep cache; per-superstep persist +
    localCheckpoint is already the right plan on Spark (same finding as
    ``run_bsp``'s truncate_every note).  The knob stays as the recorded
    form of that experiment and for barrier-deferral semantics tests.
    """
    if fuse < 1:
        raise ValueError("pagerank: fuse must be >= 1")
    if fuse > 1 and (delta_cache or gather == "arrow"):
        raise ValueError(
            "pagerank: fuse>1 composes only with the expression gather "
            "(chained pandas-UDF stages stall Catalyst analysis, and the "
            "delta mode's frontier is re-evaluated per superstep)")
    if gather == "arrow" and salt_hubs:
        raise ValueError(
            "pagerank: salt_hubs applies only to the expression gather "
            "path; the arrow/CSR kernel does its own per-partition "
            "partial sums (combine gather='arrow' with salt_hubs=None)")
    if delta_cache:
        if gather == "arrow" or salt_hubs or fixed_supersteps is not None:
            raise ValueError(
                "pagerank: delta_cache is the dynamic tolerance mode — "
                "it composes with neither gather='arrow', salt_hubs, nor "
                "fixed_supersteps (the reference likewise gates the delta "
                "cache on the dynamic scheduler, pagerank.cpp:108-127)")
        return _pagerank_delta(
            graph, tol=tol, max_supersteps=max_supersteps,
            checkpoint=checkpoint, resume=resume, verbose=verbose)
    contribs = (
        graph.edges.join(
            graph.out_degrees.withColumnRenamed("id", "src"), "src"
        )
        .select("src", "dst", (F.lit(1.0) / F.col("out_degree")).alias("cw"))
        .repartition(graph.num_edge_partitions, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    if gather == "arrow":
        from ..plans.arrow_gather import csr_blocks
        contribs = csr_blocks(contribs, graph.num_edge_partitions).persist()
    init = graph.vertices.select("id", F.lit(1.0).alias("rank"))

    def gather_msgs(state: DataFrame) -> DataFrame:
        if gather == "arrow":
            from ..plans.arrow_gather import arrow_gather, weighted_sum_kernel
            partials = arrow_gather(
                contribs, state, weighted_sum_kernel,
                "dst long, m double", graph.num_edge_partitions)
            return partials.groupBy("dst").agg(F.sum("m").alias("total"))
        msgs = (
            contribs.join(state, contribs["src"] == state["id"])
            .select("dst", (F.col("rank") * F.col("cw")).alias("m"))
        )
        if salt_hubs:
            from ..operators.salting import salted_agg
            return salted_agg(
                msgs, ["dst"],
                [F.sum("m").alias("pm")],
                [F.sum("pm").alias("total")],
                n_salts=salt_hubs,
            )
        return msgs.groupBy("dst").agg(F.sum("m").alias("total"))

    def one_round(state: DataFrame) -> DataFrame:
        msgs = gather_msgs(state)
        joined = state.join(msgs, state["id"] == msgs["dst"], "left")
        new_rank = (F.lit(BASE)
                    + F.lit(DAMPING) * F.coalesce(F.col("total"), F.lit(0.0)))
        return joined.select(
            "id",
            new_rank.alias("rank"),
            F.abs(new_rank - F.col("rank")).alias("__delta"),
        )

    def step(state: DataFrame, i: int):
        # i counts CHUNKS of `fuse` supersteps; rounds in this chunk:
        if fixed_supersteps is not None:
            rounds = min(fuse, fixed_supersteps - i * fuse)
        else:
            rounds = fuse
        cur = state
        for _ in range(rounds):
            cur = one_round(cur.drop("__delta"))
        if fixed_supersteps is not None:
            converged = (i + 1) * fuse >= fixed_supersteps
            metrics = {"active": -1, "max_delta": float("nan"),
                       "fused": rounds}
            return cur.drop("__delta"), metrics, converged
        # Observed form: the convergence all-reduce rides the state
        # materialization job (one Spark job per chunk, not two); the
        # delta observed is the LAST round's.
        from pyspark.sql import Observation
        obs = Observation(f"pagerank_{i}")
        observed = cur.observe(
            obs,
            F.max("__delta").alias("max_delta"),
            F.sum(F.when(F.col("__delta") > tol, 1).otherwise(0)).alias("active"),
        ).drop("__delta")

        def finish():
            row = obs.get
            max_delta = float(row["max_delta"] or 0.0)
            return (
                {"active": int(row["active"] or 0), "max_delta": max_delta,
                 "fused": rounds},
                max_delta <= tol,
            )

        return observed, finish

    chunk_budget = (max_supersteps if fixed_supersteps is None
                    else fixed_supersteps)
    if fuse > 1:
        chunk_budget = -(-chunk_budget // fuse)  # ceil-div: chunks, not steps
    result = run_bsp(
        init,
        step,
        max_supersteps=chunk_budget,
        checkpoint=checkpoint,
        resume=resume,
        verbose=verbose,
    )
    contribs.unpersist()
    if fuse > 1:
        # Report true supersteps, not chunks.
        total = result.supersteps * fuse
        if fixed_supersteps is not None:
            total = min(total, fixed_supersteps)
        result = BSPResult(state=result.state, supersteps=total,
                           converged=result.converged,
                           history=result.history)
    return result


def _pagerank_delta(
    graph: EdgeGraph,
    tol: float = 1e-6,
    max_supersteps: int = 200,
    checkpoint: CheckpointManager | None = None,
    resume: bool = True,
    verbose: bool = False,
) -> BSPResult:
    """Delta-cached dynamic PageRank (``context.post_delta`` gather
    caching, ``icontext.hpp:254`` + ``pagerank.cpp:124-127``).

    Instead of re-gathering every in-edge each superstep, each vertex
    keeps its gather total cached in the state (``total``); a vertex
    whose rank changed by ``change`` posts ``change * cw`` to each
    out-neighbor's cache, so a superstep's edge work is proportional to
    the ACTIVE frontier (``|change| > tol``), not to |E| — the whole
    point of the reference's delta cache, and at scale the reason late
    supersteps cost almost nothing.

    Deliberate deviation from the reference, documented for parity
    review: ``pagerank.cpp:124-127`` posts the RAW ``last_change`` (not
    scaled by the gather's ``1/num_out_edges`` edge weight) and its
    scatter signals unconditionally (``:128-134``), which makes the
    reference's delta mode approximate and non-terminating under the
    synchronous engine.  We post the correctly scaled delta and signal
    only above tolerance, which preserves the exact gather-cache
    invariant ``total == Σ_in rank(src)/out_deg(src)`` up to the
    below-tolerance changes the dynamic scheduler drops — the fixpoint
    every GraphLab dynamic-mode run targets.

    State: ``(id long, rank double, total double, change double)``;
    the returned BSPResult's state is trimmed to ``(id, rank)``.
    """
    contribs = (
        graph.edges.join(
            graph.out_degrees.withColumnRenamed("id", "src"), "src"
        )
        .select("src", "dst", (F.lit(1.0) / F.col("out_degree")).alias("cw"))
        .repartition(graph.num_edge_partitions, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    # Superstep 0 = signal_all: a full gather at rank 1.0 seeds the
    # cache, then apply + scatter as usual.
    tot0 = contribs.groupBy("dst").agg(F.sum("cw").alias("t0"))
    init = (
        graph.vertices.join(
            tot0, graph.vertices["id"] == tot0["dst"], "left")
        .select(
            "id",
            (F.lit(BASE) + F.lit(DAMPING) * F.coalesce("t0", F.lit(0.0))).alias("rank"),
            F.coalesce("t0", F.lit(0.0)).alias("total"),
            (F.lit(BASE) + F.lit(DAMPING) * F.coalesce("t0", F.lit(0.0))
             - F.lit(1.0)).alias("change"),
        )
    )

    def step(state: DataFrame, i: int):
        scat = state.filter(F.abs(F.col("change")) > tol).select(
            F.col("id").alias("sid"), F.col("change").alias("sc"))
        msgs = (
            contribs.join(scat, contribs["src"] == scat["sid"])
            .select("dst", (F.col("sc") * F.col("cw")).alias("m"))
            .groupBy("dst").agg(F.sum("m").alias("d"))
        )
        joined = state.join(msgs, state["id"] == msgs["dst"], "left")
        signaled = F.col("d").isNotNull()
        new_total = F.col("total") + F.coalesce(F.col("d"), F.lit(0.0))
        new_rank = F.when(
            signaled, F.lit(BASE) + F.lit(DAMPING) * new_total
        ).otherwise(F.col("rank"))
        new_state = joined.select(
            "id",
            new_rank.alias("rank"),
            new_total.alias("total"),
            F.when(signaled, new_rank - F.col("rank"))
             .otherwise(F.lit(0.0)).alias("change"),
        )
        from pyspark.sql import Observation
        obs = Observation(f"pagerank_delta_{i}")
        observed = new_state.observe(
            obs,
            F.max(F.abs(F.col("change"))).alias("max_delta"),
            F.sum(
                F.when(F.abs(F.col("change")) > tol, 1).otherwise(0)
            ).alias("active"),
        )

        def finish():
            row = obs.get
            active = int(row["active"] or 0)
            return (
                {"active": active,
                 "max_delta": float(row["max_delta"] or 0.0)},
                active == 0,
            )

        return observed, finish

    result = run_bsp(
        init,
        step,
        max_supersteps=max_supersteps,
        checkpoint=checkpoint,
        resume=resume,
        verbose=verbose,
    )
    contribs.unpersist()
    return BSPResult(
        state=result.state.select("id", "rank"),
        supersteps=result.supersteps,
        converged=result.converged,
        history=result.history,
    )


def total_rank(ranks: DataFrame) -> float:
    """The reference's map_reduce_vertices total-rank aggregate
    (``pagerank.cpp:257-258``)."""
    return ranks.agg(F.sum("rank")).first()[0]


def personalized_pagerank(
    graph: EdgeGraph,
    seeds: list[int],
    tol: float = 1e-6,
    max_supersteps: int = 200,
    checkpoint: CheckpointManager | None = None,
    resume: bool = True,
    verbose: bool = False,
) -> BSPResult:
    """Personalized PageRank: the teleport mass returns only to the
    ``seeds`` set (random-walk-with-restart proximity — the standard
    link-graph seed-expansion primitive; same gather/apply as
    ``pagerank`` with a per-vertex base term, so the reference parity
    contract of ``pagerank.cpp:85-105`` carries over with
    ``0.15 -> 0.15*[id in seeds]``).

    Init rank = the base term (seeds: 0.15, others 0.0) — i.e. the
    fixpoint iteration starts from the zero-mass state rather than the
    uniform one; converges to the same fixpoint, and keeps every
    intermediate value a polynomial in 0.15/0.85 that DuckDB replays
    exactly.  Returns state ``(id, rank double)``.
    """
    if not seeds:
        raise ValueError("personalized_pagerank: seeds must be non-empty")
    contribs = (
        graph.edges.join(
            graph.out_degrees.withColumnRenamed("id", "src"), "src"
        )
        .select("src", "dst", (F.lit(1.0) / F.col("out_degree")).alias("cw"))
        .repartition(graph.num_edge_partitions, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    is_seed = F.col("id").isin([int(s) for s in seeds])
    base = F.when(is_seed, F.lit(BASE)).otherwise(F.lit(0.0))
    init = graph.vertices.select("id", base.alias("rank"))

    def step(state: DataFrame, i: int):
        msgs = (
            contribs.join(state, contribs["src"] == state["id"])
            .select("dst", (F.col("rank") * F.col("cw")).alias("m"))
            .groupBy("dst").agg(F.sum("m").alias("total"))
        )
        joined = state.join(msgs, state["id"] == msgs["dst"], "left")
        new_rank = base + F.lit(DAMPING) * F.coalesce(
            F.col("total"), F.lit(0.0))
        new_state = joined.select(
            "id", new_rank.alias("rank"),
            F.abs(new_rank - F.col("rank")).alias("__delta"))
        from pyspark.sql import Observation
        obs = Observation(f"ppr_{i}")
        observed = new_state.observe(
            obs, F.max("__delta").alias("max_delta")).drop("__delta")

        def finish():
            md = float(obs.get["max_delta"] or 0.0)
            return {"max_delta": md}, md <= tol

        return observed, finish

    result = run_bsp(
        init, step, max_supersteps=max_supersteps,
        checkpoint=checkpoint, resume=resume, verbose=verbose)
    contribs.unpersist()
    return result
