"""N-ary factor-graph belief propagation (max-sum) — the ``factors/``
library surface of the graphical-models toolkit.

Reference: ``/root/reference/toolkits/graphical_models/factors/
factor_graph.hpp`` (the bipartite variable/factor graph: variables are
1-D vertices, factors are N-D vertices, an edge joins a factor to each
variable of its domain, ``:397-434`` make_bp_graph) and
``factors/bp_vertex_program.hpp`` (the synchronous max-sum program,
``:84``).  Table semantics come from ``factors/dense_table.hpp``:

- log-domain combine: ``operator*=`` is entry-wise add with implicit
  broadcasting of a sub-domain over the full domain (``:373,500-526``),
  ``operator/=`` entry-wise subtract;
- ``MAP(msg)``: max over the removed dimensions, each output entry
  seeded at ``APPROX_LOG_ZERO = -1e6`` (``:568-596``,
  ``table_base.hpp:57-60``); projecting onto the table's own domain is
  a plain copy (``:571-575``);
- ``marginalize(msg)``: the sum-product projection — linear-domain sum
  ``log(sum_y exp(this(x,y)))`` over the removed dimensions, an exact
  zero summing to APPROX_LOG_ZERO (``:531-563``); the vertex program
  ships with MAP active and marginalize as the in-code alternative
  (``bp_vertex_program.hpp:236-239``), so this engine exposes both as
  ``mode="max"`` (default) / ``mode="sum"``;
- ``shift_normalize``: subtract the max entry (``:347-356``);
- ``damp(other, d)``: probability-space mix ``ln(d*exp(other) +
  (1-d)*exp(this))`` with an exact-zero clamp to APPROX_LOG_ZERO,
  no-op at d=0 (``:599-615``);
- residual: ``linf_diff`` in probability space — ``max_i |exp(new_i) -
  exp(old_i)|`` (``:619-632``).

One superstep of the vertex program (``bp_vertex_program.hpp``):
gather double-buffers each incoming message (old <- new, ``:150``) and
combines the incoming old messages broadcast over the vertex domain
(``repmat``, ``:319-328``); apply sets ``belief = potential * total``
and SKIPS vertices with no incident edges — their belief stays the
zeroed init table of ``factor_graph.hpp:258-265`` (``:164-195``);
scatter builds the cavity ``belief / incoming``, MAP-projects it onto
the neighbor's variable domain, optionally regularizes
(shift-normalize then damp toward the all-1.0 table with weight
REGULARIZATION, ``:242-252``), shift-normalizes, damps against the old
outgoing message, and signals the neighbor when the residual exceeds
BOUND (``:209-288``).  Messages in BOTH directions live on the
variable's domain (``factor_graph.hpp:430-433``).

Spark mapping: the message state is one DataFrame row per (factor,
variable) edge carrying both direction arrays; a superstep is two
aggregations (variable beliefs: explode + per-state sum; factor
beliefs: per-factor ordered message collect + a generated-column
stride walk over the table) plus per-edge array expressions for the
cavity/MAP/normalize/damp tail — no UDFs, the factor table never
leaves its row.  The loop runs through :func:`..plans.superstep.
run_bsp`, so chains checkpoint and resume like every other iterative
algorithm here.

Scheduling deviation (documented, same policy as the MPLP/LBP
engines): the reference's per-edge residual signals gate which
vertices re-run; this BSP twin updates every edge each superstep and
stops on the GLOBAL max residual <= bound (or after a fixed iteration
count).  Fixed points coincide — a state where no residual exceeds
bound is stationary under both schedules.

Linear-index convention: entry ``i`` of a factor table assigns state
``(i // stride_p) % card_p`` to the variable at position ``p``, with
``stride_0 = 1`` — the FIRST listed variable varies fastest, exactly
``discrete_assignment.hpp:210-222`` (and the alchemy file layout,
:mod:`..sources.alchemy`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import CheckpointManager, truncate_lineage
from ..plans.superstep import run_bsp
from .mplp import APPROX_LOG_ZERO


@dataclass
class FactorBPResult:
    """``messages``: final (fid, vid, pos, card, stride, numel,
    mv: array<double>, mf: array<double>) edge-message state —
    ``mv`` = variable->factor, ``mf`` = factor->variable, both over
    the variable's domain.  ``beliefs``: (id, belief: array<double>,
    label int)."""

    messages: DataFrame
    beliefs: DataFrame
    supersteps: int
    converged: bool


def _shift_normalize(arr: Column) -> Column:
    """dense_table::shift_normalize — subtract the max entry."""
    return F.transform(arr, lambda x: x - F.array_max(arr))


def _damp(new: Column, old: Column, damping: float) -> Column:
    """dense_table::damp — probability-space mix with the reference's
    exact-zero clamp (both sides at ~-1e6 underflow exp to 0.0, where
    log would give -inf; the reference stores APPROX_LOG_ZERO)."""
    if damping == 0.0:
        return new
    d = F.lit(float(damping))

    def mix(n: Column, o: Column) -> Column:
        val = d * F.exp(o) + (F.lit(1.0) - d) * F.exp(n)
        return (F.when(val == 0.0, F.lit(APPROX_LOG_ZERO))
                .otherwise(F.log(val)))

    return F.zip_with(new, old, mix)


def _mf_sums(msgs: DataFrame) -> DataFrame:
    """(vid, sx: array<double>) — per-variable, per-state sum of the
    incoming factor->variable messages (repmat over a 1-D domain is the
    identity, so the combine is a plain elementwise sum).  Exploded to
    (vid, state) rows so a hub variable never collects its incident
    message list; the card-bounded collect_list only reassembles the
    K summed states."""
    return (
        msgs.select("vid", F.posexplode("mf").alias("si", "x"))
        .groupBy("vid", "si").agg(F.sum("x").alias("x"))
        .groupBy("vid")
        .agg(F.array_sort(F.collect_list(F.struct("si", "x"))).alias("sx"))
        .select("vid", F.transform("sx", lambda s: s["x"]).alias("sx"))
    )


def _state_at(idx: Column, stride: Column, card: Column) -> Column:
    """State of the variable with (stride, card) at linear table index
    ``idx``: ``(idx // stride) % card``.  The quotient is computed as
    ``(idx - idx % stride) / stride`` so the double division is of an
    exact multiple (always exact in IEEE), never a float-floor hazard."""
    return (((idx - idx % stride) / stride).cast("long") % card)


def _factor_beliefs(msgs: DataFrame, ftab: DataFrame) -> DataFrame:
    """(fid, fbel: array<double>) — factor table plus every incoming
    variable->factor message broadcast over the table domain (the
    repmat of ``bp_vertex_program::gather``).  The collect_list is
    bounded by the factor arity (<= MAX_DIM); ``ftab`` must be the
    persisted ``repartition("fid")`` view so the join reads it from
    cache with its hashpartitioning intact and only the message side
    shuffles (guarded by
    ``test_factor_bp_step_shuffles_state_side_only``)."""
    fmsg = (
        msgs.groupBy("fid")
        .agg(F.array_sort(F.collect_list(
            F.struct("pos", "stride", "card", "mv"))).alias("ms"))
    )
    return (
        fmsg.join(ftab, "fid")
        .select("fid", F.transform(
            "table",
            lambda x, idx: x + F.aggregate(
                "ms", F.lit(0.0),
                lambda acc, m: acc + F.element_at(
                    m["mv"],
                    (_state_at(idx.cast("long"), m["stride"],
                               m["card"]) + 1).cast("int")))
        ).alias("fbel"))
    )


def _validate(variables: DataFrame, factors: DataFrame) -> None:
    """Fail loudly on the silent-corruption shapes: a prior shorter
    than card NULLs belief entries; a table whose length is not
    prod(cards) reads NULL through element_at and drops terms; a
    repeated variable inside one factor double-counts its message (the
    reference forbids duplicate edges, ``factor_graph.hpp:427-429``);
    a factor endpoint missing from `variables` — or carrying a card
    that disagrees with the variable's — silently mis-strides every
    table read."""
    # every predicate below is null-safe: F.size(NULL) and NULL
    # comparisons evaluate NULL, which a plain filter silently drops —
    # the exact escape hatch this validator exists to close
    badv = variables.filter(
        F.col("card").isNull() | F.col("prior").isNull()
        | (F.col("card") < 1) | (F.size("prior") != F.col("card"))).take(1)
    if badv:
        raise ValueError(
            f"factor_graph_bp: variable id {badv[0]['id']} has card="
            f"{badv[0]['card']} and prior {badv[0]['prior']} — need "
            "card >= 1 and size(prior) == card, both non-null")
    for frame, key, what in ((variables, "id", "variable id"),
                             (factors, "fid", "factor fid")):
        dup = (frame.groupBy(key).count()
               .filter(F.col("count") > 1).take(1))
        if dup:
            raise ValueError(
                f"factor_graph_bp: {what} {dup[0][key]} appears "
                f"{dup[0]['count']} times — duplicate keys fan out the "
                "per-superstep joins and double-count messages")
    numel = F.aggregate(
        "cards", F.lit(1).cast("long"), lambda a, c: a * c)
    badf = factors.filter(
        F.col("vids").isNull() | F.col("cards").isNull()
        | F.col("table").isNull()
        | (F.size("vids") < 1)
        | (F.size("vids") != F.size("cards"))
        | (F.size(F.array_distinct("vids")) != F.size("vids"))
        | (F.size("table") != numel)).take(1)
    if badf:
        r = badf[0]
        nt = "NULL" if r["table"] is None else len(r["table"])
        raise ValueError(
            f"factor_graph_bp: factor fid {r['fid']} is malformed — "
            f"vids={r['vids']} cards={r['cards']} table has "
            f"{nt} entries; need >=1 DISTINCT variables, non-null "
            "columns, len(vids) == len(cards), and "
            "len(table) == prod(cards)")
    ends = factors.select(
        "fid", F.posexplode("vids").alias("pos", "vid"),
        F.col("cards"))
    ends = ends.select(
        "fid", "vid",
        F.element_at("cards", F.col("pos") + 1).alias("fcard"))
    bad = (
        ends.join(variables.select(F.col("id").alias("vid"), "card"),
                  "vid", "left")
        .filter(F.col("card").isNull() | (F.col("card") != F.col("fcard")))
        .take(1)
    )
    if bad:
        r = bad[0]
        raise ValueError(
            f"factor_graph_bp: factor fid {r['fid']} names variable "
            f"{r['vid']} with cardinality {r['fcard']}, but the "
            f"variables frame has card={r['card']} — every vid must "
            "appear in `variables` with a matching cardinality")


def factor_graph_bp(
    variables: DataFrame,
    factors: DataFrame,
    iterations: int = 10,
    damping: float = 0.0,
    regularization: float = 0.0,
    bound: float | None = None,
    mode: str = "max",
    checkpoint: CheckpointManager | None = None,
    resume: bool = True,
) -> FactorBPResult:
    """Run synchronous BP on a bipartite factor graph — ``mode="max"``
    is the reference's shipped max-sum program, ``mode="sum"`` the
    sum-product variant it carries in-code (module docstring): the only
    difference is the factor->variable projection (MAP vs marginalize).

    ``variables = (id, card: int, prior: array<double>[card])`` — log
    node potentials (``factor_graph.hpp:201-211``
    set_prior_for_variable; the default prior is the zeroed table of
    ``:258-260``, i.e. pass zeros for "no prior").
    ``factors = (fid, vids: array<long>, cards: array<int>,
    table: array<double>[prod(cards)])`` — log potentials, first
    variable varying fastest (module docstring).  ``fid`` and ``id``
    are independent keys (the reference unifies them in one vertex
    space; nothing here requires that).

    ``bound=None`` runs exactly ``iterations`` supersteps (the
    all-active ``sched_allv`` shape); with a bound the loop stops as
    soon as the global max probability-space residual is <= bound,
    up to ``iterations`` supersteps.

    Iteration accounting: ``iterations`` counts MESSAGE-update
    supersteps, and the returned beliefs consume the final messages —
    i.e. they equal the reference engine's beliefs at its superstep
    ``iterations + 1`` (whose apply reads the messages scattered at
    ``iterations``; the reference's own final scatter is consumed by
    nothing but the signal check).  ``iterations=0`` therefore decodes
    ``belief = prior`` for connected variables — exactly the
    reference's first apply over the zeroed initial messages.  At a
    fixed point the two accountings coincide.
    """
    if iterations < 0:
        raise ValueError("factor_graph_bp: need iterations >= 0")
    if not 0.0 <= damping < 1.0:
        raise ValueError("factor_graph_bp: need 0 <= damping < 1 "
                         "(dense_table.hpp:604-605)")
    if regularization < 0.0:
        raise ValueError("factor_graph_bp: need regularization >= 0")
    if mode not in ("max", "sum"):
        raise ValueError(
            f"factor_graph_bp: mode must be 'max' (MAP projection) or "
            f"'sum' (marginalize), got {mode!r}")
    # Both input lineages are read several times before the first
    # superstep (validation probes, the pri/ftab builds, the per-edge
    # init scan): persist here once — for the duration of the call
    # only, and only if the caller hasn't already — so a computed
    # lineage (an alchemy parse, a sparse densify) isn't re-executed
    # per probe.
    owned = []
    if not variables.is_cached:
        variables = variables.persist()
        owned.append(variables)
    if not factors.is_cached:
        factors = factors.persist()
        owned.append(factors)
    try:
        _validate(variables, factors)
    except Exception:
        for df in owned:
            df.unpersist()
        raise

    # --- static sides -------------------------------------------------
    pri_c = variables.select(F.col("id").alias("vid"), "card",
                             "prior").persist()
    pri = truncate_lineage(pri_c)
    pri_c.unpersist()
    # persisted, not lineage-truncated: keep hashpartitioning(fid)
    # visible to the per-superstep join (same rationale as
    # gibbs_adjacency)
    ftab = factors.select("fid", "table").repartition("fid").persist()

    # --- per-edge incidence + message init ----------------------------
    stride = F.when(F.col("pos") == 0, F.lit(1).cast("long")).otherwise(
        F.aggregate(F.slice("cards", 1, F.col("pos")),
                    F.lit(1).cast("long"), lambda a, c: a * c))
    numel = F.aggregate("cards", F.lit(1).cast("long"), lambda a, c: a * c)
    zeros = F.array_repeat(F.lit(0.0), F.col("card"))
    init = (
        factors.select("fid", F.posexplode("vids").alias("pos", "vid"),
                       "cards")
        .select("fid", "vid", "pos",
                F.element_at("cards", F.col("pos") + 1).alias("card"),
                stride.alias("stride"), numel.alias("numel"))
        .select("*", zeros.alias("mv"), zeros.alias("mf"))
    )
    will_resume = (
        resume and checkpoint is not None and checkpoint.directory
        and checkpoint.latest(variables.sparkSession) is not None)
    if not will_resume:
        init = truncate_lineage(init)

    def step(msgs: DataFrame, i: int):
        # variable beliefs: prior + per-state sum of incoming f->v
        # messages
        vbel = (
            _mf_sums(msgs).join(pri, "vid")
            .select("vid", F.zip_with("prior", "sx", lambda p, s: p + s)
                    .alias("vbel"))
        )
        fbel = _factor_beliefs(msgs, ftab)
        j = msgs.join(vbel, "vid").join(fbel, "fid")
        keep = ["fid", "vid", "pos", "card", "stride", "numel"]

        # factor -> variable: project the cavity fbel / (old v->f) onto
        # the variable — MAP (max over the other dims, seeded at
        # APPROX_LOG_ZERO) or marginalize (linear-domain sum, an exact
        # zero reading as APPROX_LOG_ZERO, dense_table.hpp:531-563)
        def slice_entries(lbl):  # noqa: ANN001 - cavity values at lbl
            return F.transform(
                F.filter(
                    F.sequence(F.lit(0).cast("long"),
                               F.col("numel") - 1),
                    lambda idx: _state_at(
                        idx, F.col("stride"), F.col("card")) == lbl),
                lambda idx: F.element_at("fbel", (idx + 1).cast("int"))
                - F.element_at("mv", (lbl + 1).cast("int")))

        if mode == "max":
            def project(lbl):  # noqa: ANN001
                return F.greatest(F.lit(APPROX_LOG_ZERO),
                                  F.array_max(slice_entries(lbl)))
        else:
            def project(lbl):  # noqa: ANN001
                s = F.aggregate(slice_entries(lbl), F.lit(0.0),
                                lambda acc, x: acc + F.exp(x))
                return (F.when(s == 0.0, F.lit(APPROX_LOG_ZERO))
                        .otherwise(F.log(s)))

        raw_mf = F.transform(
            F.sequence(F.lit(0), F.col("card") - 1), project)
        # variable -> factor: cavity = vbel / (old f->v); MAP onto the
        # variable's own domain is a copy (dense_table.hpp:571-575)
        raw_mv = F.zip_with("vbel", "mf", lambda b, m: b - m)
        # The scatter tail of bp_vertex_program (:242-261): optional
        # regularization (shift-normalize, then damp toward the all-1.0
        # table — reg.uniform(1.0) sets every LOG entry to 1.0, so the
        # mix target is exp(1.0) = e), shift-normalize, damp against
        # the old outgoing message.  Staged through named columns so
        # each shift's double reference to its input stays a cheap
        # attribute read instead of re-inlining the MAP expression.
        upd = j.select(*keep, "mv", "mf",
                       raw_mv.alias("nmv"), raw_mf.alias("nmf"))

        def both(fn) -> None:
            nonlocal upd
            upd = upd.select(
                *keep, "mv", "mf",
                fn(F.col("nmv"), F.col("mv")).alias("nmv"),
                fn(F.col("nmf"), F.col("mf")).alias("nmf"))

        if regularization > 0.0:
            r = F.lit(float(regularization))
            both(lambda a, _o: _shift_normalize(a))
            # r*exp(1.0) + (1-r)*exp(x) > 0 always (r > 0): no 0 clamp
            both(lambda a, _o: F.transform(
                a, lambda x: F.log(r * F.lit(math.e)
                                   + (F.lit(1.0) - r) * F.exp(x))))
        both(lambda a, _o: _shift_normalize(a))
        if damping > 0.0:
            both(lambda a, o: _damp(a, o, damping))
        if bound is None:
            nxt = upd.select(*keep, F.col("nmv").alias("mv"),
                             F.col("nmf").alias("mf"))
            return nxt, {}, False
        res = F.greatest(
            F.array_max(F.zip_with(
                "nmv", "mv", lambda n, o: F.abs(F.exp(o) - F.exp(n)))),
            F.array_max(F.zip_with(
                "nmf", "mf", lambda n, o: F.abs(F.exp(o) - F.exp(n)))))
        from pyspark.sql import Observation
        obs = Observation(f"factor_bp_{i}")
        observed = (
            upd.select(*keep, F.col("nmv").alias("mv"),
                       F.col("nmf").alias("mf"), res.alias("__res"))
            .observe(obs, F.max("__res").alias("max_res"))
            .drop("__res")
        )

        def finish():
            max_res = float(obs.get["max_res"] or 0.0)
            return {"max_res": max_res}, max_res <= bound

        return observed, finish

    result = run_bsp(init, step, max_supersteps=iterations,
                     checkpoint=checkpoint, resume=resume)
    msgs = result.state

    # --- final beliefs: prior * message product for vertices with
    #     edges; the apply early-return keeps isolated variables at the
    #     zeroed init table (bp_vertex_program.hpp:166)
    vsum = _mf_sums(msgs)
    belief = F.when(
        F.col("sx").isNotNull(),
        F.zip_with("prior", "sx", lambda p, s: p + s)
    ).otherwise(F.array_repeat(F.lit(0.0), F.col("card")))
    label = F.array_position(
        belief, F.array_max(belief)).cast("int") - 1
    beliefs = (
        pri.join(vsum, "vid", "left")
        .select(F.col("vid").alias("id"), belief.alias("belief"),
                label.alias("label"))
    )
    ftab.unpersist()
    for df in owned:
        df.unpersist()
    return FactorBPResult(messages=msgs, beliefs=beliefs,
                          supersteps=result.supersteps,
                          converged=result.converged)


def factor_bp_beliefs(
    variables: DataFrame, factors: DataFrame, iterations: int = 10,
    damping: float = 0.0, regularization: float = 0.0,
    bound: float | None = None, mode: str = "max",
) -> DataFrame:
    """(id, belief: array<double>, label): beliefs and the argmax
    decode — first max on ties (array_position finds the first
    occurrence).  ``mode="max"`` beliefs are max-marginals (the label
    is the MAP decode); ``mode="sum"`` beliefs are log marginals up to
    a per-variable additive constant (exact on trees)."""
    return factor_graph_bp(
        variables, factors, iterations, damping, regularization,
        bound, mode).beliefs
