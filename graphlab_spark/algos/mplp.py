"""MPLP MAP inference (graphical-models toolkit).

Reference: ``/root/reference/toolkits/graphical_models/
mplp_denoise.cpp`` — the MPLP LP-relaxation scheme of Globerson &
Jaakkola (file header, ``:23-27``).  The reference materializes each
pairwise factor as a graph vertex holding two dual vectors
``delf_i / delf_j``; gather sums the duals of adjacent factors sharing
a variable (``:346-366``) and apply runs the coordinate-descent
update (``:390-404``):

    delf_i = -(theta_i + sum_i)/2
             + rowmax(THETA_ij + (theta_j + sum_j)^T) / 2

where ``sum_i`` excludes the factor's own dual (the gather never
includes self).  MAP labels are the per-variable argmax of the
reparameterized unary ``theta_i + sum_i`` (``:421-423``).

This engine's instance matches :mod:`.lbp`: binary states over the
link graph, unary log-potentials ``theta_i = ln(phi_i)`` with the same
portable-LCG ``phi`` (so the DuckDB oracle replays them —
``oracles.sql_mplp_labels``), Potts pairwise ``THETA = ln(PSI)``.

Plan shape: one row per canonical undirected edge (the factor)
carrying four dual scalars ``(du0, du1, dv0, dv1)``; a superstep is a
node-sum aggregation (one shuffle) plus a factor-row recompute (two
state joins) — all plain column expressions, no UDFs.

Synchronous-schedule note: the raw Globerson-Jaakkola edge update is
exact *sequential* coordinate descent; applying it to every factor
simultaneously diverges on graphs with degree > 3 (each node's duals
are amplified ~(deg-1)/2 per sweep — observed exploding to 1e12 on
the 1k-vertex link graph).  The reference sidesteps this with its
async one-vertex-at-a-time scheduler (``sum_priority``,
``mplp_denoise.cpp:243-244``); the BSP-consistent analog used here
damps each factor's step by ``alpha = 1/max(deg_u, deg_v)``, which
preserves the fixed points (any fixed point of the undamped update is
one of the damped) and empirically restores the monotone dual
descent the sequential schedule has — asserted by the tests.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeGraph
from ..plans.checkpoint import truncate_lineage
from ..plans.superstep import no_aqe_loop
from .lbp import PSI, node_potentials

# log-domain Potts pairwise potential
LTH = tuple(tuple(math.log(p) for p in row) for row in PSI)


def _node_sums(d: DataFrame) -> DataFrame:
    """s_i(x) = sum of this factor-set's duals toward variable i."""
    su = d.groupBy(F.col("src").alias("id")).agg(
        F.sum("du0").alias("s0"), F.sum("du1").alias("s1"))
    sv = d.groupBy(F.col("dst").alias("id")).agg(
        F.sum("dv0").alias("s0"), F.sum("dv1").alias("s1"))
    return su.unionByName(sv).groupBy("id").agg(
        F.sum("s0").alias("s0"), F.sum("s1").alias("s1"))


def _log_phi(vertices: DataFrame) -> DataFrame:
    return node_potentials(vertices).select(
        "id", F.log("phi0").alias("t0"), F.log("phi1").alias("t1"))


@no_aqe_loop
def mplp_duals(graph: EdgeGraph, iterations: int = 10) -> DataFrame:
    """Dual table after ``iterations`` damped synchronous MPLP sweeps:
    (src, dst, alpha, du0, du1, dv0, dv1) with src < dst (one row per
    canonical undirected factor)."""
    und = graph.canonical_undirected_edges.select("src", "dst").persist()
    lphi_c = _log_phi(graph.vertices).persist()
    lphi = truncate_lineage(lphi_c)
    lphi_c.unpersist()
    # factor-degree per variable -> per-factor damping 1/max(deg_u, deg_v)
    dg = (
        und.select(F.col("src").alias("id"))
        .unionAll(und.select(F.col("dst").alias("id")))
        .groupBy("id").agg(F.count("*").alias("dg"))
    )
    und_a_c = (
        und.join(dg.select(F.col("id").alias("src"),
                           F.col("dg").alias("dgu")), "src")
        .join(dg.select(F.col("id").alias("dst"),
                        F.col("dg").alias("dgv")), "dst")
        .select("src", "dst",
                (F.lit(1.0) / F.greatest("dgu", "dgv")).alias("alpha"))
        .persist()
    )
    und_a = truncate_lineage(und_a_c)
    und_a_c.unpersist()
    d = und_a.select(
        "src", "dst", "alpha",
        F.lit(0.0).alias("du0"), F.lit(0.0).alias("du1"),
        F.lit(0.0).alias("dv0"), F.lit(0.0).alias("dv1"))
    d = truncate_lineage(d)
    for _ in range(iterations):
        s = _node_sums(d)
        j = (
            d
            .join(s.select(F.col("id").alias("src"),
                           F.col("s0").alias("su0"),
                           F.col("s1").alias("su1")), "src")
            .join(s.select(F.col("id").alias("dst"),
                           F.col("s0").alias("sv0"),
                           F.col("s1").alias("sv1")), "dst")
            .join(lphi.select(F.col("id").alias("src"),
                              F.col("t0").alias("a0"),
                              F.col("t1").alias("a1")), "src")
            .join(lphi.select(F.col("id").alias("dst"),
                              F.col("t0").alias("b0"),
                              F.col("t1").alias("b1")), "dst")
        )
        # cavity-reparameterized unaries (own dual excluded, as the
        # reference's gather never includes the factor itself)
        cu0 = F.col("a0") + F.col("su0") - F.col("du0")
        cu1 = F.col("a1") + F.col("su1") - F.col("du1")
        cv0 = F.col("b0") + F.col("sv0") - F.col("dv0")
        cv1 = F.col("b1") + F.col("sv1") - F.col("dv1")
        half = F.lit(0.5)
        a = F.col("alpha")
        ka = F.lit(1.0) - a

        def damp(old: str, new):  # noqa: ANN001 - Column
            return (ka * F.col(old) + a * new).alias(old)

        new_d = j.select(
            "src", "dst", "alpha",
            damp("du0", -cu0 * half
                 + half * F.greatest(LTH[0][0] + cv0, LTH[0][1] + cv1)),
            damp("du1", -cu1 * half
                 + half * F.greatest(LTH[1][0] + cv0, LTH[1][1] + cv1)),
            damp("dv0", -cv0 * half
                 + half * F.greatest(LTH[0][0] + cu0, LTH[1][0] + cu1)),
            damp("dv1", -cv1 * half
                 + half * F.greatest(LTH[0][1] + cu0, LTH[1][1] + cu1)),
        )
        cached = new_d.persist()
        nxt = truncate_lineage(cached)
        cached.unpersist()
        d.unpersist()
        d = nxt
    und.unpersist()
    return d


def mplp_labels(graph: EdgeGraph, iterations: int = 10) -> DataFrame:
    """(id, label): per-variable MAP label = argmax of the
    reparameterized unary theta_i + s_i (``mplp_denoise.cpp:421``);
    ties break to state 0."""
    d = mplp_duals(graph, iterations)
    s = _node_sums(d)
    lphi = _log_phi(graph.vertices)
    out = (
        lphi.join(s, "id", "left")
        .select(
            "id",
            F.when(F.col("t1") + F.coalesce("s1", F.lit(0.0))
                   > F.col("t0") + F.coalesce("s0", F.lit(0.0)), 1)
            .otherwise(0).alias("label"))
    )
    return out


def _node_sums_k(d: DataFrame, k: int) -> DataFrame:
    """K-state node sums: s_i(x) = sum over incident factors of the
    dual component toward variable i, one column per state."""
    su = d.groupBy(F.col("src").alias("id")).agg(
        *[F.sum(f"du{x}").alias(f"s{x}") for x in range(k)])
    sv = d.groupBy(F.col("dst").alias("id")).agg(
        *[F.sum(f"dv{x}").alias(f"s{x}") for x in range(k)])
    return su.unionByName(sv).groupBy("id").agg(
        *[F.sum(f"s{x}").alias(f"s{x}") for x in range(k)])


@no_aqe_loop
def mplp_table_duals(
    unary: DataFrame, factors: DataFrame, k: int, iterations: int = 10
) -> DataFrame:
    """General factor-table MPLP: explicit per-edge potential tables
    instead of the implicit Potts constant of :func:`mplp_duals`.

    The reference's general structured-prediction surface carries
    arbitrary K-state unary priors per vertex
    (``mplp_structured_prediction.cpp:40-48``) and materialized dense
    factor tables (``factors/dense_table.hpp``,
    ``factors/factor_graph.hpp``); the MPLP edge update itself is the
    same Globerson-Jaakkola coordinate-descent step as
    ``mplp_denoise.cpp:390-404`` with THETA_ij read from the factor's
    own table rather than a shared smoothing matrix.

    Inputs: ``unary = (id, theta: array<double>[k])`` — log node
    potentials; ``factors = (src, dst, table: array<double>[k*k])`` —
    log pairwise potentials, row-major ``table[x*k + y]`` for
    src-state x / dst-state y, one row per undirected factor (src<dst
    canonical orientation recommended; orientation only names the
    sides).  The BSP damping is the same fixed-point-preserving
    ``alpha = 1/max(deg_u, deg_v)`` as the Potts engine (module
    docstring).  All updates are column expressions — the K duals per
    side are generated columns, the table stays an array read via
    ``element_at`` — so the plan is pure Catalyst codegen at any k.

    Returns ``(src, dst, table, alpha, du0.., dv0..)``.
    """
    ks = range(k)
    dg = (
        factors.select(F.col("src").alias("id"))
        .unionAll(factors.select(F.col("dst").alias("id")))
        .groupBy("id").agg(F.count("*").alias("dg"))
    )
    # The iteration body inner-joins each factor row to BOTH endpoints'
    # unary rows; a factor referencing an id absent from `unary` would
    # silently vanish from the dual state (the coupling would never be
    # enforced and the MAP would be wrong with no error).  The Potts
    # engine derives lphi from graph.vertices so it can't hit this;
    # this general surface validates up front — one tiny anti-join over
    # the already-aggregated endpoint ids.
    orphan = dg.join(unary.select("id"), "id", "left_anti").take(1)
    if orphan:
        raise ValueError(
            f"mplp_table_duals: factor endpoint id {orphan[0]['id']} has "
            "no unary row — every src/dst in `factors` must appear in "
            "`unary` (factors with missing endpoints would otherwise be "
            "silently dropped from the dual updates)")
    base_c = (
        factors.join(dg.select(F.col("id").alias("src"),
                               F.col("dg").alias("dgu")), "src")
        .join(dg.select(F.col("id").alias("dst"),
                        F.col("dg").alias("dgv")), "dst")
        .select("src", "dst", "table",
                (F.lit(1.0) / F.greatest("dgu", "dgv")).alias("alpha"))
        .persist()
    )
    base = truncate_lineage(base_c)
    base_c.unpersist()
    lphi_c = unary.select(
        "id", *[F.element_at("theta", x + 1).alias(f"t{x}") for x in ks]
    ).persist()
    lphi = truncate_lineage(lphi_c)
    lphi_c.unpersist()
    d = base.select(
        "src", "dst", "table", "alpha",
        *[F.lit(0.0).alias(f"du{x}") for x in ks],
        *[F.lit(0.0).alias(f"dv{x}") for x in ks])
    d = truncate_lineage(d)

    def tbl(x: int, y: int):  # noqa: ANN202 - Column
        return F.element_at("table", x * k + y + 1)

    for _ in range(iterations):
        s = _node_sums_k(d, k)
        j = (
            d
            .join(s.select(F.col("id").alias("src"),
                           *[F.col(f"s{x}").alias(f"su{x}") for x in ks]),
                  "src")
            .join(s.select(F.col("id").alias("dst"),
                           *[F.col(f"s{x}").alias(f"sv{x}") for x in ks]),
                  "dst")
            .join(lphi.select(F.col("id").alias("src"),
                              *[F.col(f"t{x}").alias(f"a{x}") for x in ks]),
                  "src")
            .join(lphi.select(F.col("id").alias("dst"),
                              *[F.col(f"t{x}").alias(f"b{x}") for x in ks]),
                  "dst")
        )
        cu = [F.col(f"a{x}") + F.col(f"su{x}") - F.col(f"du{x}") for x in ks]
        cv = [F.col(f"b{y}") + F.col(f"sv{y}") - F.col(f"dv{y}") for y in ks]
        half = F.lit(0.5)
        a = F.col("alpha")
        ka = F.lit(1.0) - a

        def damp(old: str, new):  # noqa: ANN001 - Column
            return (ka * F.col(old) + a * new).alias(old)

        new_d = j.select(
            "src", "dst", "table", "alpha",
            *[damp(f"du{x}", -cu[x] * half
                   + half * F.greatest(*[tbl(x, y) + cv[y] for y in ks])
                   if k > 1 else -cu[x] * half
                   + half * (tbl(x, 0) + cv[0]))
              for x in ks],
            *[damp(f"dv{y}", -cv[y] * half
                   + half * F.greatest(*[tbl(x, y) + cu[x] for x in ks])
                   if k > 1 else -cv[y] * half
                   + half * (tbl(0, y) + cu[0]))
              for y in ks],
        )
        cached = new_d.persist()
        nxt = truncate_lineage(cached)
        cached.unpersist()
        d.unpersist()
        d = nxt
    return d


def mplp_table_labels(
    unary: DataFrame, factors: DataFrame, k: int, iterations: int = 10
) -> DataFrame:
    """(id, label): MAP label per variable = argmax over states of the
    reparameterized unary ``theta_i + s_i`` (``mplp_denoise.cpp:421``),
    ties to the smallest state index.  Vertices present only in
    ``unary`` (no incident factor) decode from theta alone."""
    ks = range(k)
    d = mplp_table_duals(unary, factors, k, iterations)
    s = _node_sums_k(d, k)
    lphi = unary.select(
        "id", *[F.element_at("theta", x + 1).alias(f"t{x}") for x in ks])
    j = lphi.join(s, "id", "left")
    m = [F.col(f"t{x}") + F.coalesce(f"s{x}", F.lit(0.0)) for x in ks]
    best, lbl = m[0], F.lit(0)
    for x in range(1, k):
        lbl = F.when(m[x] > best, F.lit(x)).otherwise(lbl)
        best = F.greatest(best, m[x])
    return j.select("id", lbl.alias("label"))


def mplp_dual_objective(graph: EdgeGraph, iterations: int = 10) -> float:
    """The MPLP dual bound: sum over variables of
    max_x (theta_i(x) + s_i(x)) plus sum over factors of
    max_{x,y} (THETA(x,y) - du(x) - dv(y)).  Non-increasing under the
    synchronous coordinate-descent sweep."""
    d = mplp_duals(graph, iterations).persist()
    s = _node_sums(d)
    lphi = _log_phi(graph.vertices)
    node_part = (
        lphi.join(s, "id", "left")
        .select(F.greatest(
            F.col("t0") + F.coalesce("s0", F.lit(0.0)),
            F.col("t1") + F.coalesce("s1", F.lit(0.0))).alias("m"))
        .agg(F.sum("m").alias("v")).first()["v"]
    )
    edge_part = (
        d.select(F.greatest(
            *[F.lit(LTH[x][y]) - F.col(f"du{x}") - F.col(f"dv{y}")
              for x in (0, 1) for y in (0, 1)]).alias("m"))
        .agg(F.sum("m").alias("v")).first()["v"]
    )
    d.unpersist()
    return float(node_part + edge_part)


# The reference's sparse tables treat any assignment absent from the
# explicit entry list as effectively impossible:
# ``table_base.hpp:57-60`` APPROX_LOG_ZERO() = -1e6, returned by
# ``sparse_table.hpp:283-289`` logP() on a missing sparse index.
APPROX_LOG_ZERO = -1e6


def sparse_table_to_dense(
    factors: DataFrame, k: int, entries_col: str = "entries",
    default: float = APPROX_LOG_ZERO,
) -> DataFrame:
    """Densify sparse factor tables (``factors/sparse_table.hpp``):
    ``factors = (src, dst, entries: map<int, double>)`` holds explicit
    log-potentials keyed by the row-major linear index ``x*k + y``
    (``sparse_table.hpp:270-276`` set_logP(linear_index)); every
    missing assignment reads as ``default`` — the reference's
    ``APPROX_LOG_ZERO`` (``:283-289``).

    Returns ``(src, dst, table: array<double>[k*k])`` — the dense
    surface :func:`mplp_table_duals` and
    :func:`..algos.gibbs.chromatic_gibbs` consume, so one densify
    feeds MAP inference and sampling alike.  The expansion is a single
    ``transform(sequence(...))`` projection — k*k generated entries
    per factor row, no shuffle, no UDF.
    """
    if k < 1:
        raise ValueError("sparse_table_to_dense: need k >= 1")
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(k * k - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col(entries_col), i.cast("int")),
            F.lit(float(default))))
    cols = [c for c in factors.columns if c != entries_col]
    return factors.select(*cols, dense.alias("table"))


def mplp_sparse_table_labels(
    unary: DataFrame, factors: DataFrame, k: int, iterations: int = 10,
    entries_col: str = "entries", default: float = APPROX_LOG_ZERO,
) -> DataFrame:
    """MAP labels over sparse factor tables: densify
    (:func:`sparse_table_to_dense`) then run the dense-table MPLP
    engine — the exact composition the reference's factor surface
    performs when MPLP messages index a ``sparse_table``
    (``mplp_structured_prediction.cpp`` over ``factors/``)."""
    return mplp_table_labels(
        unary, sparse_table_to_dense(factors, k, entries_col, default),
        k, iterations)
