"""Dual-decomposition MAP inference (graphical-models toolkit).

Reference: ``/root/reference/toolkits/graphical_models/dd_main.cpp`` /
``dd_grlab.hpp`` — projected-subgradient dual decomposition
(Komodakis et al., cited in the reference's header): the MRF is split
into slave subproblems that each solve an exact local MAP, and dual
variables (one per (slave, shared-variable) pair) are stepped toward
agreement with a diminishing step size.

This engine's instance uses the *edge decomposition* (one slave per
pairwise factor — the decomposition ``dd_grlab.hpp`` builds when no
tree file is given), binary states, and the same portable potentials
as :mod:`.lbp` / :mod:`.mplp`:

    slave f=(u,v):  maximize  tu(x)/d_u + l_fu(x)
                            + tv(y)/d_v + l_fv(y) + LTH(x, y)
    vote:           nu_u(1) = avg over slaves containing u of x_u^f
    subgradient:    l_fu(x) += alpha_t * ([x_u^f = x] - nu_u(x))
    step:           alpha_t = step0 / (1 + t)     (deterministic)

The projection constraint (duals for one variable sum to zero across
its slaves) is preserved exactly by the update, matching the
reference's projected subgradient.  Slave argmax ties break
lexicographically on (x, y) — both engines evaluate the identical
CASE chain, so the DuckDB oracle (``oracles.sql_dd_labels``) replays
bit-for-bit.

Plan shape: one row per canonical undirected edge carrying four dual
scalars plus the slave's current choice pair; a superstep is one
vote aggregation (shuffle on vertex id) and one factor-row recompute
— plain column expressions, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeGraph
from ..plans.checkpoint import truncate_lineage
from .mplp import LTH, _log_phi

STEP0 = 0.5


def _slave_choice(lu0: Column, lu1: Column, lv0: Column, lv1: Column,
                  au0: Column, au1: Column, bv0: Column, bv1: Column):
    """(xi, xj) = lexicographically-first argmax over the 4 combos of
    a(x) + b(y) + LTH(x,y) with a = unary-share + dual."""
    s00 = au0 + lu0 + bv0 + lv0 + F.lit(LTH[0][0])
    s01 = au0 + lu0 + bv1 + lv1 + F.lit(LTH[0][1])
    s10 = au1 + lu1 + bv0 + lv0 + F.lit(LTH[1][0])
    s11 = au1 + lu1 + bv1 + lv1 + F.lit(LTH[1][1])
    m = F.greatest(s00, s01, s10, s11)
    xi = (F.when(s00 == m, 0).when(s01 == m, 0)
          .when(s10 == m, 1).otherwise(1))
    xj = (F.when(s00 == m, 0).when(s01 == m, 1)
          .when(s10 == m, 0).otherwise(1))
    return xi, xj, m


def _unary_shares(graph: EdgeGraph, und: DataFrame) -> DataFrame:
    """(id, u0, u1): log-potential split evenly across the variable's
    incident slaves (theta/d — the uniform split of the reference's
    edge decomposition)."""
    dg = (
        und.select(F.col("src").alias("id"))
        .unionAll(und.select(F.col("dst").alias("id")))
        .groupBy("id").agg(F.count("*").alias("dg"))
    )
    return (
        _log_phi(graph.vertices).join(dg, "id")
        .select("id", (F.col("t0") / F.col("dg")).alias("u0"),
                (F.col("t1") / F.col("dg")).alias("u1"))
    )


def _dd_loop(graph: EdgeGraph, iterations: int,
             alpha_of, dual_update) -> DataFrame:
    """Shared slave-table scaffold for the DD variants: build the
    canonical factor table with baked unary shares, then per round
    aggregate the per-variable vote/consensus (one shuffle), apply the
    variant's dual update, and recompute the lexicographic slave
    argmax.  ``alpha_of(t) -> float`` is the variant's step schedule;
    ``dual_update(alpha, choice, vote) -> (d0, d1)`` returns the two
    per-state dual increments as Columns.  Returns
    (src, dst, au0, au1, bv0, bv1, lu0, lu1, lv0, lv1, xi, xj)."""
    und = graph.canonical_undirected_edges.select("src", "dst").persist()
    un = _unary_shares(graph, und)
    zero = F.lit(0.0)
    base_c = (
        und.join(un.select(F.col("id").alias("src"),
                           F.col("u0").alias("au0"),
                           F.col("u1").alias("au1")), "src")
        .join(un.select(F.col("id").alias("dst"),
                        F.col("u0").alias("bv0"),
                        F.col("u1").alias("bv1")), "dst")
        .persist()
    )
    base = truncate_lineage(base_c)
    base_c.unpersist()
    xi0, xj0, _ = _slave_choice(zero, zero, zero, zero,
                                F.col("au0"), F.col("au1"),
                                F.col("bv0"), F.col("bv1"))
    d = base.select(
        "src", "dst", "au0", "au1", "bv0", "bv1",
        zero.alias("lu0"), zero.alias("lu1"),
        zero.alias("lv0"), zero.alias("lv1"),
        xi0.alias("xi"), xj0.alias("xj"))
    d = truncate_lineage(d)
    for t in range(iterations):
        alpha = F.lit(alpha_of(t))
        votes = (
            d.select(F.col("src").alias("id"), F.col("xi").alias("x"))
            .unionAll(d.select(F.col("dst").alias("id"),
                               F.col("xj").alias("x")))
            .groupBy("id").agg(F.avg("x").alias("v1"))
        )
        j = (
            d
            .join(votes.select(F.col("id").alias("src"),
                               F.col("v1").alias("vu1")), "src")
            .join(votes.select(F.col("id").alias("dst"),
                               F.col("v1").alias("vv1")), "dst")
        )
        du0, du1 = dual_update(alpha, F.col("xi"), F.col("vu1"))
        dv0, dv1 = dual_update(alpha, F.col("xj"), F.col("vv1"))
        nlu0, nlu1 = F.col("lu0") + du0, F.col("lu1") + du1
        nlv0, nlv1 = F.col("lv0") + dv0, F.col("lv1") + dv1
        xi, xj, _ = _slave_choice(nlu0, nlu1, nlv0, nlv1,
                                  F.col("au0"), F.col("au1"),
                                  F.col("bv0"), F.col("bv1"))
        new_d = j.select(
            "src", "dst", "au0", "au1", "bv0", "bv1",
            nlu0.alias("lu0"), nlu1.alias("lu1"),
            nlv0.alias("lv0"), nlv1.alias("lv1"),
            xi.alias("xi"), xj.alias("xj"))
        cached = new_d.persist()
        nxt = truncate_lineage(cached)
        cached.unpersist()
        d.unpersist()
        d = nxt
    und.unpersist()
    return d


def _vote_decode(d: DataFrame) -> DataFrame:
    """(id, label): per-variable average of the slave choices,
    label 1 iff the consensus exceeds 0.5 (ties to 0)."""
    votes = (
        d.select(F.col("src").alias("id"), F.col("xi").alias("x"))
        .unionAll(d.select(F.col("dst").alias("id"),
                           F.col("xj").alias("x")))
        .groupBy("id").agg(F.avg("x").alias("v1"))
    )
    return votes.select(
        "id", F.when(F.col("v1") > 0.5, 1).otherwise(0).alias("label"))


def dd_state(graph: EdgeGraph, iterations: int = 10,
             step0: float = STEP0) -> DataFrame:
    """Slave table after ``iterations`` subgradient steps:
    l(x) += alpha_t ([choice = x] - vote(x)) with the diminishing
    alpha_t = step0 / (1 + t); for binary states the two components
    step by +-alpha (vote1 - choice)."""
    return _dd_loop(
        graph, iterations,
        alpha_of=lambda t: step0 / (1.0 + t),
        dual_update=lambda alpha, choice, vote: (
            alpha * (vote - choice), alpha * (choice - vote)))


def dd_labels(graph: EdgeGraph, iterations: int = 10,
              step0: float = STEP0) -> DataFrame:
    """(id, label): primal decoding by slave vote — label 1 iff a
    strict majority of the variable's slaves chose state 1 (the
    reference's per-variable agreement heuristic); ties to 0."""
    return _vote_decode(dd_state(graph, iterations, step0))


def dd_projected_state(graph: EdgeGraph, iterations: int = 10,
                       step0: float = STEP0) -> DataFrame:
    """The ``algorithm=1`` branch of ``dd_main.cpp:134`` —
    ``dd_vertex_program_projected`` (``dd_grlab.hpp:671-880``): each
    factor takes the exact local MAP with *positively* signed duals
    (gather packs ``multiplier_messages + potentials``,
    ``dd_grlab.hpp:736``), each variable averages the incident local
    MAP indicators into fractional beliefs ``q = sum p / d``
    (``:772``), and the duals step toward consensus
    ``lambda += step (q - p)`` (``:837``) with the reference's
    diminishing rule 1 ``step0 / (context.iteration() + 2)``
    (``dd_grlab.hpp:331``) — the odd BSP iterations are 2t+1, so fused
    round t uses ``step0 / (2t + 3)``.

    Same state layout as :func:`dd_state`; the slave argmax is the
    identical lexicographic :func:`_slave_choice` (here the duals
    enter with + sign, matching the projected gather; the symmetric
    variant negates them, ``dd_grlab.hpp:627``)."""
    return _dd_loop(
        graph, iterations,
        alpha_of=lambda t: step0 / (2.0 * t + 3.0),
        dual_update=lambda alpha, choice, vote: (
            alpha * (choice - vote), alpha * (vote - choice)))


def dd_projected_labels(graph: EdgeGraph, iterations: int = 10,
                        step0: float = STEP0) -> DataFrame:
    """(id, label): the unary decode of the projected variant —
    ``beliefs.maxCoeff`` over ``q = avg p`` (``dd_grlab.hpp:772-774``,
    first max on ties → state 0): label 1 iff ``q > 0.5``."""
    return _vote_decode(dd_projected_state(graph, iterations, step0))


def dd_dual_objective(graph: EdgeGraph, iterations: int = 10,
                      step0: float = STEP0) -> float:
    """Sum over slaves of their local MAP value — an upper bound on
    the MAP energy, non-increasing in expectation under the
    diminishing-step subgradient."""
    d = dd_state(graph, iterations, step0)
    _, _, m = _slave_choice(
        F.col("lu0"), F.col("lu1"), F.col("lv0"), F.col("lv1"),
        F.col("au0"), F.col("au1"), F.col("bv0"), F.col("bv1"))
    return float(d.select(m.alias("m")).agg(F.sum("m")).first()[0])
