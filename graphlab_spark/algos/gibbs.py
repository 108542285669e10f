"""Chromatic parallel Gibbs sampling (graphical-models toolkit).

Reference: ``/root/reference/toolkits/graphical_models/deprecated/
gibbs_sampling/chromatic_sampler.cpp`` — the chromatic scheduler of
the parallel-Gibbs work GraphLab shipped as a toolkit: color the MRF,
then sweep the color classes; all vertices of one color are
conditionally independent given the rest, so the whole class samples
in parallel with no locks (``core.set_scheduler_type("chromatic")``,
``chromatic_sampler.cpp:78-80``).

The per-vertex update (``gibbs_update::operator()``,
``chromatic_sampler.cpp:35-59``) builds the conditional over the
vertex's variable by multiplying in every incident factor sliced at
the neighbors' current assignments, normalizes, samples a new
assignment, and accumulates the *conditional itself* into the running
belief (``vdata.belief += belief; vdata.nsamples++`` — the
Rao-Blackwellized marginal estimator ``save_beliefs`` normalizes and
prints, ``mrf.cpp:40-55``) plus a change counter
(``vdata.nchanges += (new_asg != vdata.asg)``).

Spark mapping — one BSP superstep per color class:

- the MRF is the same explicit surface as :func:`..algos.mplp.
  mplp_table_duals`: ``unary = (id, theta: array<double>[k])`` log
  node potentials, ``factors = (src, dst, table: array<double>[k*k])``
  log pairwise potentials, row-major ``table[x*k + y]``;
- the coloring defaults to :func:`..algos.coloring.greedy_coloring`
  over the factor graph (the reference colors with its own greedy
  toolkit before sampling) and accepts any user-supplied proper
  coloring, which is validated up front;
- a color step joins the (static, color-tagged, ``nbr``-partitioned)
  adjacency view to the |V|-row assignment state, aggregates the K
  per-state contributions map-side, exp-normalizes, and draws with a
  portable-LCG inverse-CDF — all column expressions, no UDFs;
- draws come from :mod:`..operators.portable` hashes of
  ``(seed, global step, vertex id)``, so a run is deterministic at any
  parallelism and — for factor tables whose conditional sums are
  order-exact, e.g. Potts with a binary-representable smoothing — the
  entire chain replays in ANSI SQL (``oracles.sql_gibbs_denoise``
  twin).  The reference draws from its process-seeded Mersenne RNG
  instead; distribution parity, documented deviation (the same trade
  every portable generator in this repo makes).

Determinism caveat (documented): for general float tables the
per-state neighbor sums are floating-point accumulations whose
partition order Spark does not fix, so two runs can differ in the
last ulp and — with vanishing probability — flip a sample.  The
*statistics* are unaffected (any tie-break of an exact-ties event has
measure zero); fixture tests use order-exact tables so assignments
are bit-stable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.portable import M as LCG_M, edge_hash, mix31
from ..plans.checkpoint import CheckpointManager, truncate_lineage
from ..plans.superstep import no_aqe_loop, run_bsp


@dataclass
class GibbsResult:
    """state: (id, color, asg, nsamples, nchanges, bel array<double>[k])
    — ``bel`` is the *unnormalized* Rao-Blackwellized belief (sum of
    per-step conditionals); divide by ``nsamples`` for marginals."""

    state: DataFrame
    sweeps: int
    ncolors: int


def _validate_coloring(factors: DataFrame, colors: DataFrame) -> None:
    bad = (
        factors.join(colors.select(F.col("id").alias("src"),
                                   F.col("color").alias("_cs")), "src")
        .join(colors.select(F.col("id").alias("dst"),
                            F.col("color").alias("_cd")), "dst")
        .filter(F.col("_cs") == F.col("_cd")).take(1)
    )
    if bad:
        raise ValueError(
            f"chromatic_gibbs: supplied coloring is not proper — factor "
            f"({bad[0]['src']}, {bad[0]['dst']}) has both endpoints "
            f"colored {bad[0]['_cs']}; adjacent vertices would sample "
            "simultaneously and the chain would not be a Gibbs sampler")


def gibbs_adjacency(factors: DataFrame, colors: DataFrame) -> DataFrame:
    """The static color-tagged adjacency view the color step joins
    against the assignment state (persisted, pre-partitioned by the
    *neighbor* key so the per-step join shuffles only the |V|-row
    state).

    Persisted but NOT lineage-truncated: localCheckpoint rewrites the
    plan as a Scan ExistingRDD with UNKNOWN output partitioning, so the
    sort-merge join would re-shuffle this |2E| view every color step
    (caught by test_gibbs_step_join_shuffles_state_side_only, which
    builds its adjacency through THIS function); the cached
    InMemoryRelation keeps hashpartitioning(nbr) and the view is
    static, so its shallow lineage never grows anyway."""
    return (
        factors.select(F.col("src").alias("id"), F.col("dst").alias("nbr"),
                       "table", F.lit(True).alias("fwd"))
        .unionByName(
            factors.select(F.col("dst").alias("id"),
                           F.col("src").alias("nbr"),
                           "table", F.lit(False).alias("fwd")))
        .join(colors, "id")
        .repartition("nbr")
        .persist()
    )


def gibbs_color_sums(adj: DataFrame, nbr_state: DataFrame,
                     color: int, k: int) -> DataFrame:
    """Per-vertex K-state neighbor contribution sums for one color
    class — the join+aggregate at the heart of the color step
    (``gibbs_update::operator()`` gathering incident factor slices).
    ``nbr_state = (nbr, nasg)`` is the current assignment keyed by the
    neighbor id.  Contribution of a neighbor at ``nasg`` toward my
    state x: fwd edge (me=src) reads ``table[x*k + nasg]``; bwd reads
    ``table[nasg*k + x]``."""
    return (
        adj.filter(F.col("color") == F.lit(color))
        .join(nbr_state, "nbr")
        .groupBy("id")
        .agg(*[
            F.sum(
                F.when(
                    F.col("fwd"),
                    F.element_at(
                        "table",
                        (F.lit(x * k) + F.col("nasg") + 1)
                        .cast("int")))
                .otherwise(F.element_at(
                    "table",
                    (F.col("nasg") * k + x + 1).cast("int")))
            ).alias(f"n{x}")
            for x in range(k)])
    )


@no_aqe_loop
def chromatic_gibbs(
    unary: DataFrame,
    factors: DataFrame,
    k: int,
    sweeps: int = 10,
    seed: int = 103,
    colors: DataFrame | None = None,
    checkpoint: CheckpointManager | None = None,
    resume: bool = True,
) -> GibbsResult:
    """Run ``sweeps`` full chromatic Gibbs sweeps; each sweep visits
    the color classes in ascending color order and resamples every
    vertex of the class from its exact conditional
    (``chromatic_sampler.cpp:35-59``).

    Initial assignments are hash-uniform over the ``k`` states (the
    reference's ``asg.uniform_sample()``, ``mrf.cpp:96-98``).

    The loop runs through :func:`..plans.superstep.run_bsp` — one BSP
    superstep per color step — so the chain checkpoints and RESUMES
    mid-run like every other iterative algorithm here: draws are a
    pure function of (seed, global step, vertex id) and the
    accumulators ride in the state row, so a resumed run is
    bit-identical to an uninterrupted one (tested).
    """
    if k < 2:
        raise ValueError("chromatic_gibbs: need k >= 2 states")
    if sweeps < 0:
        raise ValueError("chromatic_gibbs: need sweeps >= 0")
    ks = range(k)

    # --- shape sanity: a theta shorter than k NULLs the whole
    #     conditional (every cum>thr compare goes NULL -> asg pinned at
    #     k-1, beliefs NULL); a table shorter than k*k silently DROPS
    #     neighbor terms (out-of-range element_at -> NULL, skipped by
    #     sum, coalesced to 0).  Both would corrupt samples without an
    #     error, so validate up front — one scan each.
    badu = unary.filter(F.size("theta") != k).take(1)
    if badu:
        raise ValueError(
            f"chromatic_gibbs: unary id {badu[0]['id']} has "
            f"{len(badu[0]['theta'])} theta entries, expected k={k}")
    badf = factors.filter(F.size("table") != k * k).take(1)
    if badf:
        raise ValueError(
            f"chromatic_gibbs: factor ({badf[0]['src']}, "
            f"{badf[0]['dst']}) has {len(badf[0]['table'])} table "
            f"entries, expected k*k={k * k}")

    # --- endpoint sanity (same failure mode as mplp_table_duals:
    #     a factor endpoint with no unary row would silently vanish);
    #     ends is persisted — it drives up to two take(1) validations
    ends = (
        factors.select(F.col("src").alias("id"))
        .unionAll(factors.select(F.col("dst").alias("id"))).distinct()
        .persist()
    )
    orphan = ends.join(unary.select("id"), "id", "left_anti").take(1)
    if orphan:
        ends.unpersist()
        raise ValueError(
            f"chromatic_gibbs: factor endpoint id {orphan[0]['id']} has "
            "no unary row — every src/dst in `factors` must appear in "
            "`unary`")

    # --- coloring: user-supplied (validated) or greedy over the MRF
    if colors is None:
        from ..graph import EdgeGraph
        from .coloring import greedy_coloring
        g = EdgeGraph(factors.select("src", "dst"), persist=True)
        colors = greedy_coloring(g)
        g.unpersist()
    else:
        uncol = ends.join(colors.select("id"), "id", "left_anti").take(1)
        if uncol:
            ends.unpersist()
            raise ValueError(
                f"chromatic_gibbs: factor endpoint id {uncol[0]['id']} "
                "has no row in the supplied coloring — the conflict "
                "check would silently skip its factors")
        _validate_coloring(factors, colors)
    ends.unpersist()
    color_list = [
        int(r["color"])
        for r in colors.select("color").distinct().orderBy("color").collect()
    ] or [0]  # factor-free model: every vertex samples each sweep
    ncolors = len(color_list)

    # --- static adjacency view (see gibbs_adjacency for the
    #     partitioning/lineage rationale)
    adj = gibbs_adjacency(factors, colors)

    # --- state: (id, color, t0..t{k-1}, asg, bel0.., nsamples, nchanges)
    #     theta unpacked to scalar columns (generated-column engine, as
    #     the MPLP table engine does)
    init_asg = (edge_hash(F.lit(seed), F.col("id")) % F.lit(k)).cast("int")
    state = (
        unary.join(colors, "id", "left")
        .select(
            "id", F.coalesce("color", F.lit(color_list[0])).alias("color"),
            *[F.element_at("theta", x + 1).alias(f"t{x}") for x in ks],
            init_asg.alias("asg"),
            *[F.lit(0.0).alias(f"bel{x}") for x in ks],
            F.lit(0).cast("long").alias("nsamples"),
            F.lit(0).cast("long").alias("nchanges"))
    )
    # materialize the init plan eagerly only when it will actually seed
    # the chain: on a checkpoint resume run_bsp swaps in the parquet
    # state immediately, and an eager localCheckpoint here would burn a
    # full init job + pin a |V|-row copy that is never read
    will_resume = (
        resume and checkpoint is not None and checkpoint.directory
        and checkpoint.latest(unary.sparkSession) is not None)
    if not will_resume:
        state = truncate_lineage(state)

    def step(st, i):
        color = color_list[i % ncolors]
        t = i
        nbr_state = st.select(F.col("id").alias("nbr"),
                              F.col("asg").alias("nasg"))
        sums = gibbs_color_sums(adj, nbr_state, color, k)
        j = st.join(sums, "id", "left")
        b = [F.col(f"t{x}") + F.coalesce(f"n{x}", F.lit(0.0))
             for x in ks]
        mx = F.greatest(*b)  # k >= 2 enforced at entry
        e = [F.exp(b[x] - mx) for x in ks]
        z = e[0]
        for x in range(1, k):
            z = z + e[x]
        # mix31, not a bare LCG: the plain-LCG u-stream has ~0.25
        # lag-1 serial correlation across steps for a fixed vertex,
        # which *biases the stationary distribution* (measured:
        # marginals plateaued 0.18 off the enumerated exact values;
        # with the avalanche mix they converge).  Same fix as the
        # FM diameter masks.
        u = (mix31(edge_hash(F.lit(seed + 7 + t), F.col("id")))
             + F.lit(0.5)) / F.lit(float(LCG_M))
        thr = u * z
        # inverse CDF: smallest x with cumsum(e_0..e_x) > thr
        cum, acc = [], None
        for x in ks:
            acc = e[x] if acc is None else acc + e[x]
            cum.append(acc)
        new_asg = F.lit(k - 1)
        for x in reversed(range(k - 1)):
            new_asg = F.when(cum[x] > thr, F.lit(x)).otherwise(new_asg)
        new_asg = new_asg.cast("int")
        active = F.col("color") == F.lit(color)
        nxt = j.select(
            "id", "color",
            *[F.col(f"t{x}") for x in ks],
            F.when(active, new_asg).otherwise(F.col("asg")).alias("asg"),
            *[F.when(active, F.col(f"bel{x}") + e[x] / z)
              .otherwise(F.col(f"bel{x}")).alias(f"bel{x}")
              for x in ks],
            (F.col("nsamples") + active.cast("long")).alias("nsamples"),
            (F.col("nchanges")
             + (active & (new_asg != F.col("asg"))).cast("long"))
            .alias("nchanges"),
        )
        return nxt, {"color": color}, False

    result = run_bsp(
        state, step, max_supersteps=sweeps * ncolors,
        checkpoint=checkpoint, resume=resume)
    state = result.state
    adj.unpersist()
    out = state.select(
        "id", "color", "asg",
        F.array(*[F.col(f"bel{x}") for x in ks]).alias("bel"),
        "nsamples", "nchanges")
    return GibbsResult(state=out, sweeps=sweeps, ncolors=ncolors)


def gibbs_marginals(result: GibbsResult) -> DataFrame:
    """(id, marginal: array<double>[k]) — the Rao-Blackwellized
    marginal estimate: accumulated conditionals / nsamples (exactly
    what the reference's ``save_beliefs`` writes, ``mrf.cpp:40-55``).
    Vertices never sampled (sweeps=0) return null."""
    return result.state.select(
        "id",
        F.when(
            F.col("nsamples") > 0,
            F.expr("transform(bel, p -> p / nsamples)")).alias("marginal"))


def gibbs_run_statistics(
    result: GibbsResult, unary: DataFrame, factors: DataFrame, k: int,
) -> dict:
    """The reference's per-run statistics block
    (``run_statistics.hpp:12-43`` — printed after every chromatic
    experiment): total samples, total changes, min/max per-vertex
    samples, and the *unnormalized log-likelihood* of the final
    assignment (``mrf.cpp:164-185``) — there the sum of ``logP`` over
    all factors of the factorized model (node potentials included as
    unary factors); here the explicit split
    ``sum_v theta_v[asg_v] + sum_f table_f[asg_src*k + asg_dst]``.
    One pass over the state plus two broadcast-friendly joins."""
    st = result.state.select("id", "asg", "nsamples", "nchanges").persist()
    tot = st.agg(
        F.sum("nsamples").alias("ns"), F.sum("nchanges").alias("nc"),
        F.min("nsamples").alias("mn"), F.max("nsamples").alias("mx"),
    ).first()
    node = (
        unary.join(st, "id")
        .select(F.element_at("theta", F.col("asg") + 1).alias("lp"))
        .agg(F.sum("lp")).first()[0]
    )
    edge = (
        factors
        .join(st.select(F.col("id").alias("src"),
                        F.col("asg").alias("_xs")), "src")
        .join(st.select(F.col("id").alias("dst"),
                        F.col("asg").alias("_xd")), "dst")
        .select(F.element_at(
            "table", (F.col("_xs") * k + F.col("_xd") + 1).cast("int"))
            .alias("lp"))
        .agg(F.sum("lp")).first()[0]
    )
    st.unpersist()
    return {
        "nsamples": int(tot["ns"] or 0),
        "nchanges": int(tot["nc"] or 0),
        "loglik": float((node or 0.0) + (edge or 0.0)),
        "min_samples": int(tot["mn"] or 0),
        "max_samples": int(tot["mx"] or 0),
    }
