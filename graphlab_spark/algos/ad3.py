"""AD3 (Alternating Directions Dual Decomposition) MAP inference
(graphical-models toolkit).

Reference: ``/root/reference/toolkits/graphical_models/ad3_qp.hpp``
(``ad3_vertex_program``, the ``algorithm=2`` branch of
``dd_main.cpp:136``) — the ADMM variant of dual decomposition from
Martins et al., "Alternating Directions Dual Decomposition" (arXiv
1212.6550), run over the same bipartite variable/factor decomposition
as :mod:`.dd`:

- even BSP iteration: each factor gathers its variables' global
  posteriors ``q`` (``beliefs``) and Lagrange multipliers, then solves
  the local QP ``max <eta, mu> + <theta_f, z> - 1/2 ||mu||^2`` over
  the factor's local marginal polytope with
  ``eta_u = q_u + lambda_fu + theta_u / d_u``
  (``SolveQP_dense``, ``ad3_qp.hpp:356-470``; the linear term is
  ``total.neighbor_distribution + total.messages`` where the gather
  packs ``multiplier_messages + edge potentials`` per slot,
  ``dd_grlab.hpp:966-976``), and scatters the per-variable posteriors
  ``p_fu`` onto its edges (``local_messages``,
  ``dd_grlab.hpp:1132-1152``);
- odd BSP iteration: each variable averages the incident local
  posteriors ``q_u = sum_f p_fu / d_u`` (``dd_grlab.hpp:1040-1044``)
  and the duals step toward agreement
  ``lambda_fu += step * (q_u - p_fu)`` (``dd_grlab.hpp:1125-1127``,
  constant step — ``update_stepsize`` case 0, default 1.0,
  ``dd_opts.hpp:78``).

One :func:`ad3_state` iteration fuses that even/odd pair.  The
reference solves the factor QP with a generic active-set method
(incrementally-updated inverse, ``num_max_iterations_QP_ = 10``); for
a *binary pairwise* factor the same QP is strictly concave in the
variable marginals ``(x, y) = (mu_u(1), mu_v(1))`` with the joint
``z = mu_f(1,1)`` eliminated at ``min(x, y)`` (supermodular factor,
``Dq >= 0``) or ``max(0, x + y - 1)`` (submodular), so its unique
optimum has a closed form — the three-candidate case analysis below,
the same solution the active-set iteration converges to.  Everything
is plain column expressions (north rule: no per-row Python).

Objective in (x, y) after folding the unaries (shares ``theta/d`` as
:mod:`.dd`) and the Potts table ``LTH``:

    max  A x + B y + Dq z(x, y) - x^2 - y^2,   x, y in [0, 1]
    A  = (eta_u1 - eta_u0) + (t10 - t00) + 1
    B  = (eta_v1 - eta_v0) + (t01 - t00) + 1
    Dq = t11 + t00 - t10 - t01

(the ``+1`` and ``-x^2`` come from ``-1/2 ||mu_u||^2 =
-1/2 + x - x^2`` for a binary marginal).

MAP decode matches the reference's ``beliefs.maxCoeff`` (first max →
state 0 on ties): label 1 iff ``q > 0.5``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeGraph
from ..plans.checkpoint import truncate_lineage
from .dd import _unary_shares
from .mplp import LTH

STEP = 1.0  # opts.step_size default, stepsize rule 0 (dd_opts.hpp:78)


def _clip(c: Column) -> Column:
    return F.least(F.lit(1.0), F.greatest(F.lit(0.0), c))


def _qp_pair(a: Column, b: Column, dq: Column) -> tuple[Column, Column]:
    """The unique optimum (x, y) of ``A x + B y + Dq z - x^2 - y^2``
    over the binary pairwise local polytope (module docstring).

    Supermodular (``Dq >= 0``, z = min(x, y)): try z = x (valid if the
    separable optimum has x <= y), then z = y, else the tied boundary
    x = y.  Submodular (z = max(0, x + y - 1)): try z = 0
    (x + y <= 1), then z = x + y - 1, else the x + y = 1 boundary.
    This is the binary-pairwise closed form of the QP that
    ``SolveQP_dense`` (``ad3_qp.hpp:356``) solves by active sets.
    """
    half = F.lit(0.5)
    # Dq >= 0 candidates
    x1, y1 = _clip((a + dq) * half), _clip(b * half)
    x2, y2 = _clip(a * half), _clip((b + dq) * half)
    w = _clip((a + b + dq) * F.lit(0.25))
    # Dq < 0 candidates
    x3, y3 = _clip(a * half), _clip(b * half)
    x4, y4 = _clip((a + dq) * half), _clip((b + dq) * half)
    x5 = _clip((a - b + F.lit(2.0)) * F.lit(0.25))
    x = (
        F.when(dq >= 0,
               F.when(x1 <= y1, x1).when(y2 <= x2, x2).otherwise(w))
        .otherwise(
            F.when(x3 + y3 <= 1.0, x3)
            .when(x4 + y4 >= 1.0, x4).otherwise(x5))
    )
    y = (
        F.when(dq >= 0,
               F.when(x1 <= y1, y1).when(y2 <= x2, y2).otherwise(w))
        .otherwise(
            F.when(x3 + y3 <= 1.0, y3)
            .when(x4 + y4 >= 1.0, y4)
            .otherwise(F.lit(1.0) - x5))
    )
    return x, y


def _ab(qu: Column, qv: Column, dlu: Column, dlv: Column
        ) -> tuple[Column, Column]:
    """(A, B) from the current globals/duals and the baked unary-share
    differences ``cu = au1 - au0 + t10 - t00 + 1`` (column ``cu``/
    ``cv`` on the state frame); ``eta_u1 - eta_u0 =
    (2 q_u - 1) + dlu + (au1 - au0)``."""
    two = F.lit(2.0)
    return (two * qu - F.lit(1.0) + dlu + F.col("cu"),
            two * qv - F.lit(1.0) + dlv + F.col("cv"))


def ad3_state(graph: EdgeGraph, iterations: int = 10,
              step: float = STEP) -> DataFrame:
    """Factor table after ``iterations`` fused AD3 rounds:
    ``(src, dst, cu, cv, dlu, dlv, pu, pv)`` — one row per canonical
    undirected pairwise factor; ``dl* = lambda(1) - lambda(0)`` (only
    the difference enters the QP), ``p* = local posterior of state 1``.

    Round t: ``p_t = QP(q_{t-1}, lambda_{t-1})`` → ``q_t = avg(p_t)``
    (one shuffle) → ``lambda_t = lambda_{t-1} + step (q_t - p_t)``;
    ``q_0 = 0.5`` (``dd_main.hpp:236``), ``lambda_0 = 0``.
    """
    und = graph.canonical_undirected_edges.select("src", "dst").persist()
    un = _unary_shares(graph, und)
    dq = F.lit(LTH[1][1] + LTH[0][0] - LTH[1][0] - LTH[0][1])
    zero, halfq = F.lit(0.0), F.lit(0.5)
    base_c = (
        und.join(un.select(F.col("id").alias("src"),
                           (F.col("u1") - F.col("u0")
                            + F.lit(LTH[1][0] - LTH[0][0] + 1.0))
                           .alias("cu")), "src")
        .join(un.select(F.col("id").alias("dst"),
                        (F.col("u1") - F.col("u0")
                         + F.lit(LTH[0][1] - LTH[0][0] + 1.0))
                        .alias("cv")), "dst")
        .persist()
    )
    base = truncate_lineage(base_c)
    base_c.unpersist()
    a0, b0 = _ab(halfq, halfq, zero, zero)
    px0, py0 = _qp_pair(a0, b0, dq)
    d = base.select(
        "src", "dst", "cu", "cv",
        zero.alias("dlu"), zero.alias("dlv"),
        px0.alias("pu"), py0.alias("pv"))
    d = truncate_lineage(d)
    st = F.lit(float(step))
    for _ in range(iterations - 1):
        q = (
            d.select(F.col("src").alias("id"), F.col("pu").alias("p"))
            .unionAll(d.select(F.col("dst").alias("id"),
                               F.col("pv").alias("p")))
            .groupBy("id").agg(F.avg("p").alias("q"))
        )
        j = (
            d.join(q.select(F.col("id").alias("src"),
                            F.col("q").alias("qu")), "src")
            .join(q.select(F.col("id").alias("dst"),
                           F.col("q").alias("qv")), "dst")
        )
        # lambda(s) += step (q(s) - p(s)); the (1)-(0) difference
        # steps by 2 step (q - p).
        ndlu = F.col("dlu") + F.lit(2.0) * st * (F.col("qu") - F.col("pu"))
        ndlv = F.col("dlv") + F.lit(2.0) * st * (F.col("qv") - F.col("pv"))
        mid = j.select("src", "dst", "cu", "cv", "qu", "qv",
                       ndlu.alias("dlu"), ndlv.alias("dlv"))
        a, b = _ab(F.col("qu"), F.col("qv"), F.col("dlu"), F.col("dlv"))
        px, py = _qp_pair(a, b, dq)
        new_d = mid.select("src", "dst", "cu", "cv", "dlu", "dlv",
                           px.alias("pu"), py.alias("pv"))
        cached = new_d.persist()
        nxt = truncate_lineage(cached)
        cached.unpersist()
        d.unpersist()
        d = nxt
    und.unpersist()
    return d


def ad3_labels(graph: EdgeGraph, iterations: int = 10,
               step: float = STEP) -> DataFrame:
    """(id, label): MAP decode — the global posterior ``q`` is the
    average of the final local posteriors (``dd_grlab.hpp:1040``);
    ``beliefs.maxCoeff`` takes the first max, so ties go to state 0:
    label 1 iff ``q > 0.5``.  Variables with no incident factor have
    no row (same surface as :func:`.dd.dd_labels`)."""
    d = ad3_state(graph, iterations, step)
    q = (
        d.select(F.col("src").alias("id"), F.col("pu").alias("p"))
        .unionAll(d.select(F.col("dst").alias("id"),
                           F.col("pv").alias("p")))
        .groupBy("id").agg(F.avg("p").alias("q"))
    )
    return q.select(
        "id", F.when(F.col("q") > 0.5, 1).otherwise(0).alias("label"))


EXP = 10.0        # the reference's exponentiation base (ad3_qp.hpp:48)
BELIEF_FLOOR = 10e-100   # adjust_beliefs clamp (ad3_qp.hpp:1054-1062)


def bethe_admm_state(graph: EdgeGraph, iterations: int = 10,
                     step: float = STEP, alpha: float = 1.0) -> DataFrame:
    """Bethe-ADMM (``bethe_admm_vertex_program``, ``ad3_qp.hpp:963``,
    the ``algorithm=3`` branch of ``dd_main.cpp:138``): the same
    even/odd ADMM schedule as :func:`ad3_state`, but the factor
    subproblem is one exponentiated-gradient / single-factor BP step
    instead of an exact QP:

    - ``eta_u(s) = (lambda_fu(s) + theta_u(s)/d_u
      + step (q_u(s) - b_u(s))) / alpha`` and
      ``eta_f(c) = theta_f(c) / alpha`` (``compute_beliefs``,
      ``:1073-1090``), exponentiated base ``EXP`` = 10;
    - the Bethe-entropy gradient folds in the previous beliefs:
      ``ue(s) = EXP^eta_u(s) * EXP * b_u(s)`` and ``fe(c) =
      EXP^eta_f(c) * fb(c) / EXP / prod_k b_k(c_k)``
      (``compute_grad_phi``, ``:967-986``);
    - one exact sum-product pass on the single factor (``run_bp``,
      ``:990-1048``): ``fb'(c) ∝ fe(c) prod_k ue_k(c_k)`` and
      ``b_u'(s) ∝ ue_u(s) sum_{c: c_u=s} fe(c) ue_v(c_v)``, each
      normalized, then clamped at ``10e-100`` (``adjust_beliefs``).

    The global/dual half is the shared admm machinery: ``q = avg b'``
    and ``lambda += step (q - b')`` (``dd_grlab.hpp:1040,1125``).
    State row per canonical undirected factor: unary shares
    ``(shu0, shu1, shv0, shv1)``, duals ``(lu0, lu1, lv0, lv1)``,
    factor-side unary beliefs ``(bu0, bu1, bv0, bv1)`` (these are the
    local posteriors the duals compare against) and factor beliefs
    ``(fb00, fb01, fb10, fb11)``.  Init: uniform beliefs (1/cards per
    unary slot, 1/4 per config — ``dd_main.hpp:165-174``), ``q = 0.5``
    (``:236``), zero duals.  All plain column expressions.
    """
    und = graph.canonical_undirected_edges.select("src", "dst").persist()
    un = _unary_shares(graph, und)
    zero, halfb = F.lit(0.0), F.lit(0.5)
    base_c = (
        und.join(un.select(F.col("id").alias("src"),
                           F.col("u0").alias("shu0"),
                           F.col("u1").alias("shu1")), "src")
        .join(un.select(F.col("id").alias("dst"),
                        F.col("u0").alias("shv0"),
                        F.col("u1").alias("shv1")), "dst")
        .persist()
    )
    base = truncate_lineage(base_c)
    base_c.unpersist()
    d = base.select(
        "src", "dst", "shu0", "shu1", "shv0", "shv1",
        zero.alias("lu0"), zero.alias("lu1"),
        zero.alias("lv0"), zero.alias("lv1"),
        halfb.alias("bu0"), halfb.alias("bu1"),
        halfb.alias("bv0"), halfb.alias("bv1"),
        *[F.lit(0.25).alias(f"fb{x}{y}") for x in (0, 1) for y in (0, 1)])
    d = truncate_lineage(d)
    st, al, ex = F.lit(float(step)), F.lit(float(alpha)), F.lit(EXP)
    floor = F.lit(BELIEF_FLOOR)
    fe_base = {(x, y): float(EXP) ** (LTH[x][y] / float(alpha))
               for x in (0, 1) for y in (0, 1)}

    def clamp(c: Column) -> Column:
        return F.when(c < floor, floor).otherwise(c)

    for t in range(iterations):
        if t == 0:
            j = d.select("*", halfb.alias("qu0"), halfb.alias("qu1"),
                         halfb.alias("qv0"), halfb.alias("qv1"))
        else:
            q = (
                d.select(F.col("src").alias("id"),
                         F.col("bu0").alias("p0"), F.col("bu1").alias("p1"))
                .unionAll(d.select(F.col("dst").alias("id"),
                                   F.col("bv0").alias("p0"),
                                   F.col("bv1").alias("p1")))
                .groupBy("id").agg(F.avg("p0").alias("q0"),
                                   F.avg("p1").alias("q1"))
            )
            j = (
                d.join(q.select(F.col("id").alias("src"),
                                F.col("q0").alias("qu0"),
                                F.col("q1").alias("qu1")), "src")
                .join(q.select(F.col("id").alias("dst"),
                               F.col("q0").alias("qv0"),
                               F.col("q1").alias("qv1")), "dst")
            )
            # dual step rides the same frame: lambda += step (q - b)
            j = j.select(
                "src", "dst", "shu0", "shu1", "shv0", "shv1",
                (F.col("lu0") + st * (F.col("qu0") - F.col("bu0"))).alias("lu0"),
                (F.col("lu1") + st * (F.col("qu1") - F.col("bu1"))).alias("lu1"),
                (F.col("lv0") + st * (F.col("qv0") - F.col("bv0"))).alias("lv0"),
                (F.col("lv1") + st * (F.col("qv1") - F.col("bv1"))).alias("lv1"),
                "bu0", "bu1", "bv0", "bv1",
                "fb00", "fb01", "fb10", "fb11",
                "qu0", "qu1", "qv0", "qv1")
        # exponentiated-gradient etas with the Bethe gradient folded in
        ue = {}
        for side, sh, lam, b, qq in (("u", "shu", "lu", "bu", "qu"),
                                     ("v", "shv", "lv", "bv", "qv")):
            for s in (0, 1):
                eta = (F.col(f"{lam}{s}") + F.col(f"{sh}{s}")
                       + st * (F.col(f"{qq}{s}") - F.col(f"{b}{s}"))) / al
                ue[(side, s)] = F.pow(ex, eta) * ex * F.col(f"{b}{s}")
        fe = {(x, y): F.lit(fe_base[(x, y)]) * F.col(f"fb{x}{y}") / ex
              / (F.col(f"bu{x}") * F.col(f"bv{y}"))
              for x in (0, 1) for y in (0, 1)}
        # one sum-product pass on the single factor
        joint = {(x, y): fe[(x, y)] * ue[("u", x)] * ue[("v", y)]
                 for x in (0, 1) for y in (0, 1)}
        jsum = (joint[(0, 0)] + joint[(0, 1)]
                + joint[(1, 0)] + joint[(1, 1)])
        mu = {x: ue[("u", x)] * (fe[(x, 0)] * ue[("v", 0)]
                                 + fe[(x, 1)] * ue[("v", 1)])
              for x in (0, 1)}
        mv = {y: ue[("v", y)] * (fe[(0, y)] * ue[("u", 0)]
                                 + fe[(1, y)] * ue[("u", 1)])
              for y in (0, 1)}
        usum, vsum = mu[0] + mu[1], mv[0] + mv[1]
        new_d = j.select(
            "src", "dst", "shu0", "shu1", "shv0", "shv1",
            "lu0", "lu1", "lv0", "lv1",
            clamp(mu[0] / usum).alias("bu0"),
            clamp(mu[1] / usum).alias("bu1"),
            clamp(mv[0] / vsum).alias("bv0"),
            clamp(mv[1] / vsum).alias("bv1"),
            *[clamp(joint[(x, y)] / jsum).alias(f"fb{x}{y}")
              for x in (0, 1) for y in (0, 1)])
        cached = new_d.persist()
        nxt = truncate_lineage(cached)
        cached.unpersist()
        d.unpersist()
        d = nxt
    und.unpersist()
    return d


def bethe_admm_labels(graph: EdgeGraph, iterations: int = 10,
                      step: float = STEP, alpha: float = 1.0) -> DataFrame:
    """(id, label): unary decode of the Bethe-ADMM iterate — the
    global posterior is the average of the factor-side unary beliefs
    (``dd_grlab.hpp:1040``); ``maxCoeff`` ties to state 0, so label 1
    iff ``avg b(1) > avg b(0)``."""
    d = bethe_admm_state(graph, iterations, step, alpha)
    q = (
        d.select(F.col("src").alias("id"),
                 F.col("bu0").alias("p0"), F.col("bu1").alias("p1"))
        .unionAll(d.select(F.col("dst").alias("id"),
                           F.col("bv0").alias("p0"),
                           F.col("bv1").alias("p1")))
        .groupBy("id").agg(F.avg("p0").alias("q0"), F.avg("p1").alias("q1"))
    )
    return q.select(
        "id", F.when(F.col("q1") > F.col("q0"), 1).otherwise(0).alias("label"))


def budget_map_select(factors: DataFrame, unary: DataFrame,
                      budget_col: str = "budget") -> DataFrame:
    """``SolveMAP_budget`` (``ad3_qp.hpp:852-903``) for every budget
    factor at once: a budget factor over binary indicator variables
    selects, among its members, the ones with nonnegative score — at
    most ``budget`` of them, preferring higher scores and breaking
    score ties by member index ascending (the reference sorts
    ``(-log_potential, index)`` pairs, ``:876-881``).

    Inputs: ``factors = (fid, member, <budget_col>)`` — one row per
    (factor, member), constant budget per fid; ``unary = (id, theta)``
    — the member's score (``total.messages`` in the reference).
    Returns ``(fid, member, selected)`` with selected ∈ {0, 1}.

    Plan: one partitioned window per factor (``row_number`` over
    ``fid`` ordered by score desc, member asc) — no global sort, the
    shuffle key is fid, skew bounded by the largest factor arity.
    """
    from pyspark.sql import Window

    # The score join is inner, so a member with no unary row would
    # silently vanish from the output (neither selected nor rejected)
    # — the same wrong-with-no-error mode mplp_table_duals guards
    # against.  One tiny anti-join validates up front.
    orphan = (factors.select(F.col("member").alias("id")).distinct()
              .join(unary.select("id"), "id", "left_anti").take(1))
    if orphan:
        raise ValueError(
            f"budget_map_select: factor member id {orphan[0]['id']} has "
            "no unary row — every member in `factors` must appear in "
            "`unary` (members without scores would otherwise be "
            "silently dropped from the selection)")
    j = factors.join(unary.select(F.col("id").alias("member"), "theta"),
                     "member")
    w = Window.partitionBy("fid").orderBy(F.col("theta").desc(),
                                          F.col("member").asc())
    r = j.select("fid", "member", "theta", F.col(budget_col).alias("__b"),
                 F.row_number().over(w).alias("__rk"))
    return r.select(
        "fid", "member",
        F.when((F.col("theta") >= 0.0) & (F.col("__rk") <= F.col("__b")),
               1).otherwise(0).alias("selected"))


def budget_qp_project(xs: Column, budget: Column) -> Column:
    """``SolveQP_budget``'s projection (``ad3_qp.hpp:675-760``,
    ``project_onto_budget_constraint_cached``): project a vector onto
    ``{mu in [0,1]^d : sum mu <= budget}``.

    If the box-clipped vector already satisfies the budget it is the
    projection; otherwise the unique threshold ``tau >= 0`` with
    ``sum_j clip(x_j - tau, 0, 1) = budget`` shifts every coordinate
    (the reference finds the same tau with a two-pointer sweep over
    the sorted breakpoints).  Expressed entirely with array
    expressions — ``f(tau)`` is non-increasing piecewise-linear with
    breakpoints at ``{x_j} ∪ {x_j - 1}``, so the crossing segment is
    found by evaluating f at every breakpoint (O(d²) work *inside one
    row*, no shuffle; budget factors have modest arity by design).

    ``xs``: ``array<double>``; ``budget``: numeric Column.  Returns
    the projected ``array<double>``.
    """
    clipped = F.transform(xs, lambda v: F.least(
        F.lit(1.0), F.greatest(F.lit(0.0), v)))
    clipped_sum = F.aggregate(clipped, F.lit(0.0), lambda a, v: a + v)

    def f_at(t: Column) -> Column:
        return F.aggregate(
            xs, F.lit(0.0),
            lambda a, v: a + F.least(F.lit(1.0),
                                     F.greatest(F.lit(0.0), v - t)))

    # breakpoints sorted descending: f is 0 above bp[0]; walk down to
    # the first breakpoint where f >= budget, then interpolate on the
    # linear segment just above it.
    bps = F.reverse(F.array_sort(F.concat(
        xs, F.transform(xs, lambda v: v - F.lit(1.0)))))
    # (bp, f(bp)) pairs; the filter keeps breakpoints with f >= budget,
    # whose first element bounds the crossing from below.
    lo = F.array_max(F.filter(bps, lambda t: f_at(t) >= budget))
    hi = F.array_min(F.filter(bps, lambda t: f_at(t) < budget))
    f_lo, f_hi = f_at(lo), f_at(hi)
    # linear interpolation on [lo, hi]: f(hi) < budget <= f(lo)
    tau = F.when(f_lo == budget, lo).otherwise(
        hi - (hi - lo) * (budget - f_hi) / (f_lo - f_hi))
    # tau may not go below 0 (the constraint is an inequality)
    tau = F.greatest(F.lit(0.0), tau)
    projected = F.transform(xs, lambda v: F.least(
        F.lit(1.0), F.greatest(F.lit(0.0), v - tau)))
    zeros = F.transform(xs, lambda v: F.lit(0.0))
    return (F.when(budget <= 0.0, zeros)
            .when(clipped_sum <= budget, clipped)
            .otherwise(projected))


def ad3_residuals(graph: EdgeGraph, iterations: int = 10,
                  step: float = STEP,
                  state: DataFrame | None = None) -> dict[str, float]:
    """ADMM primal/dual agreement diagnostics at the final round:
    primal residual ``sum_f sum_u (p_fu - q_u)^2`` (the reference's
    ``primal_res_contrib``, ``dd_grlab.hpp:1066-1070``) and the mean
    |q - round(q)| integrality gap.  One extra job; driver-side
    scalars only.  Pass ``state`` (a prior :func:`ad3_state` result)
    to avoid re-running the whole iteration when the caller wants
    both labels and diagnostics."""
    d = (state if state is not None
         else ad3_state(graph, iterations, step)).persist()
    q = (
        d.select(F.col("src").alias("id"), F.col("pu").alias("p"))
        .unionAll(d.select(F.col("dst").alias("id"),
                           F.col("pv").alias("p")))
        .groupBy("id").agg(F.avg("p").alias("q"))
    )
    j = (
        d.join(q.select(F.col("id").alias("src"), F.col("q").alias("qu")),
               "src")
        .join(q.select(F.col("id").alias("dst"), F.col("q").alias("qv")),
              "dst")
        .select(((F.col("pu") - F.col("qu")) ** 2
                 + (F.col("pv") - F.col("qv")) ** 2).alias("r"))
        .agg(F.sum("r").alias("primal_res"))
    )
    gap = q.agg(F.avg(F.abs(F.col("q") - F.round("q"))).alias("g"))
    row, grow = j.first(), gap.first()
    d.unpersist()
    return {"primal_residual": float(row["primal_res"] or 0.0),
            "mean_integrality_gap": float(grow["g"] or 0.0)}
