"""Warp fine-grained API — batch (set-at-a-time) analog.

The reference's warp engine exposes imperative per-vertex neighborhood
operations running on fibers:

- ``warp::map_reduce_neighborhood(vertex, dir, mapper, combiner)``
  (``src/graphlab/engine/warp_graph_mapreduce.hpp:392``): map over the
  vertex's incident edges in a direction — ``mapper(edge, other)`` —
  and combine with ``+=`` by default (``:43-49``).
- ``warp::transform_neighborhood(vertex, dir, fn)``
  (``warp_graph_transform.hpp:331``): mutate edge data with access to
  the far endpoint.
- ``warp::broadcast_neighborhood(ctx, vertex, dir, fn)``
  (``warp_graph_broadcast.hpp:360``): scatter — signal neighbors with a
  mergeable message via ``context.signal``.
- ``warp::parfor_all_vertices(graph, fn, vset)``
  (``warp_parfor_all_vertices.hpp:106``): run a vertex function over
  every vertex on a fiber pool.

Warp is an API convenience over the same GAS semantics (SURVEY §2.6) —
the fiber parfor is a parallel loop over vertices, so the faithful
Spark analog runs each combinator **for all vertices at once** as one
declarative DataFrame job: the neighborhood is an ``edges ⋈ state``
view, the combiner is a ``groupBy(center).agg``, and parfor is a
column transform.  One deliberate semantic tightening: the reference's
``transform_neighborhood`` over ALL_EDGES touches each edge once per
endpoint in racy fiber order; the batch form applies each edge
transform exactly once (deterministic — the only well-defined order).

The per-vertex mapper/combiner lambdas become Column expressions over
the neighborhood view, so everything stays in Catalyst codegen — no
per-row Python (north rule).  Columns visible to expressions:

- ``id`` — the center vertex (warp's ``current``);
- ``other_id`` + ``other_<col>`` for every state column — warp's
  ``other`` vertex;
- ``other_out_degree`` / ``other_in_degree`` when
  ``include_degrees=True`` — warp's ``other.num_out_edges()``
  (``vertex.num_out_edges`` is graph metadata in the reference,
  ``distributed_graph.hpp:460-466``, hence a degrees join here);
- every edge column beyond (src, dst) — warp's ``edge.data()``.

``warp_pagerank`` reproduces ``demoapps/pagerank/warp_engine_pagerank
.cpp:32-62`` (rank = 0.15 + 0.85 * map_reduce_neighborhood(IN_EDGES,
other.rank / other.num_out_edges)) and matches the builtin
``algos.pagerank(fixed_supersteps=k)`` to float round-off (the builtin
bakes 1/out_degree onto edges once; warp's mapper divides per edge —
same sums, different ulps).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeGraph

Combiner = Callable[[str], Column]


def _sum_combiner(col: str) -> Column:
    """The default ``+=`` combiner (``warp_graph_mapreduce.hpp:43-49``)."""
    return F.sum(col)


def neighborhood(
    graph: EdgeGraph,
    state: DataFrame,
    direction: str = "in",
    vset: DataFrame | None = None,
    include_degrees: bool | str = False,
    include_center: bool = False,
) -> DataFrame:
    """The (center, edge, other) view all warp combinators run over.

    One row per incident edge of each center vertex in ``direction``
    ('in' | 'out' | 'all'); ``vset`` prunes the edge traversal to the
    given centers *before* the state join (active-set pruning, the
    scatter-side analog of ``synchronous_engine.hpp:1571-1587``).

    ``include_center`` additionally joins the *center's* state columns
    unprefixed (warp reaches them via ``edge.source().data()`` /
    ``edge.target().data()``) — off by default so combinators that only
    read ``other`` skip the second state join.

    ``include_degrees`` may be ``True`` (both directions), ``"out"`` or
    ``"in"`` — a mapper that reads only ``other_out_degree`` (PageRank)
    should request just that side, since each side is one more join per
    call and Spark does not eliminate unused outer joins.
    """
    extra = [c for c in graph.edges.columns if c not in ("src", "dst")]
    if direction == "all":
        edges = graph.symmetric_edges
        center, other = "src", "dst"
    elif direction == "in":
        edges, center, other = graph.edges, "dst", "src"
    elif direction == "out":
        edges, center, other = graph.edges, "src", "dst"
    else:
        raise ValueError(f"direction must be in|out|all, got {direction!r}")
    view = edges.select(
        F.col(center).alias("id"), F.col(other).alias("other_id"),
        *[F.col(c) for c in extra])
    if vset is not None:
        view = view.join(vset.select("id"), "id", "left_semi")
    nbr = state.select(
        F.col("id").alias("other_id"),
        *[F.col(c).alias(f"other_{c}") for c in state.columns if c != "id"])
    if include_degrees in (True, "out"):
        nbr = (
            nbr.join(graph.out_degrees.withColumnRenamed("id", "other_id"),
                     "other_id", "left")
            .withColumn("other_out_degree",
                        F.coalesce("out_degree", F.lit(0)))
            .drop("out_degree")
        )
    if include_degrees in (True, "in"):
        nbr = (
            nbr.join(graph.in_degrees.withColumnRenamed("id", "other_id"),
                     "other_id", "left")
            .withColumn("other_in_degree", F.coalesce("in_degree", F.lit(0)))
            .drop("in_degree")
        )
    view = view.join(nbr, "other_id")
    if include_center:
        clash = sorted(
            (set(state.columns) - {"id"}) & set(view.columns))
        if clash:
            raise ValueError(
                "include_center=True joins the center state columns "
                f"unprefixed, but {clash} already exist on the "
                "neighborhood view (edge attribute / degree / other_* "
                "name collision) — rename the state column(s) or read "
                "them through map_reduce_neighborhood's other_* side")
        view = view.join(state, "id")
    return view


def map_reduce_neighborhood(
    graph: EdgeGraph,
    state: DataFrame,
    map_expr: Column,
    combine: Combiner = _sum_combiner,
    direction: str = "in",
    vset: DataFrame | None = None,
    default: object = 0.0,
    include_degrees: bool | str = False,
    result_col: str = "total",
) -> DataFrame:
    """``warp::map_reduce_neighborhood`` for every center vertex at once
    (``warp_graph_mapreduce.hpp:392``).

    Returns ``(id, <result_col>)`` for every vertex in ``vset`` (or the
    whole graph): ``combine`` over ``map_expr`` evaluated per incident
    edge; vertices with an empty neighborhood get ``default`` — the
    reference returns a default-constructed accumulator there
    (``basic_map_reduce_neighborhood``, ``:137-160``).  ``default`` may
    be a Column for non-scalar gather types (e.g. the (numerator,
    denominator) struct of ``warp_als_coord.cpp:185-215``, whose
    default-constructed accumulator is ``(0, 0)``).
    """
    nb = neighborhood(graph, state, direction, vset, include_degrees)
    agg = (
        nb.withColumn("__mapped", map_expr)
        .groupBy("id")
        .agg(combine("__mapped").alias(result_col))
    )
    centers = (vset if vset is not None else graph.vertices).select("id")
    fallback = default if isinstance(default, Column) else F.lit(default)
    return centers.join(agg, "id", "left").select(
        "id", F.coalesce(result_col, fallback).alias(result_col))


def broadcast_neighborhood(
    graph: EdgeGraph,
    state: DataFrame,
    message_expr: Column,
    combine: Combiner = _sum_combiner,
    direction: str = "out",
    vset: DataFrame | None = None,
    include_degrees: bool | str = False,
    msg_col: str = "message",
) -> DataFrame:
    """``warp::broadcast_neighborhood`` (``warp_graph_broadcast.hpp:360``):
    every center signals the far endpoint of each incident edge with
    ``message_expr``; same-target messages merge with ``combine`` — the
    batch form of ``context.signal(other, msg)`` from scatter.  The
    center's own state columns are visible unprefixed (a broadcast
    usually sends the sender's data), ``other_*`` for the receiver.

    Returns the merged signal frame ``(id, <msg_col>)`` keyed by the
    *receiving* vertex — feed it to the next superstep (``run_bsp``'s
    message input) or join it onto state.
    """
    nb = neighborhood(graph, state, direction, vset, include_degrees,
                      include_center=True)
    return (
        nb.withColumn("__msg", message_expr)
        .groupBy(F.col("other_id").alias("id"))
        .agg(combine("__msg").alias(msg_col))
    )


def transform_neighborhood(
    graph: EdgeGraph,
    transforms: dict[str, Column],
    direction: str = "out",
    state: DataFrame | None = None,
    vset: DataFrame | None = None,
) -> DataFrame:
    """``warp::transform_neighborhood`` (``warp_graph_transform.hpp:331``):
    a new edge table with ``transforms`` applied to the edges incident
    to ``vset`` in ``direction`` ('out' = src in set, 'in' = dst in
    set, 'all' = either); other edges pass through unchanged.

    When ``state`` is given, its columns are visible to the transform
    expressions as ``src_<col>`` / ``dst_<col>`` (warp's
    ``edge.source().data()`` / ``edge.target().data()``).  Each edge is
    transformed exactly once (see module docstring).
    """
    from .vertex_ops import apply_edge_transforms

    edges = graph.edges
    if state is not None:
        for side in ("src", "dst"):
            sided = state.select(
                F.col("id").alias(side),
                *[F.col(c).alias(f"{side}_{c}")
                  for c in state.columns if c != "id"])
            edges = edges.join(sided, side, "left")
    out = apply_edge_transforms(edges, transforms, vset, direction)
    if state is not None:
        out = out.drop(*[f"{s}_{c}" for s in ("src", "dst")
                         for c in state.columns if c != "id"])
    return out


def parfor_all_vertices(
    state: DataFrame,
    transforms: dict[str, Column],
    vset: DataFrame | None = None,
) -> DataFrame:
    """``warp::parfor_all_vertices`` (``warp_parfor_all_vertices.hpp:106``):
    apply a vertex function to every vertex (optionally a vset).  The
    fiber pool is a parallel for — the batch analog is exactly
    ``transform_vertices`` (one column transform job); vertex functions
    that read the neighborhood compose it with
    :func:`map_reduce_neighborhood` first (join the totals onto state,
    then transform), which is what :func:`warp_pagerank` demonstrates.
    """
    from .vertex_ops import transform_vertices
    return transform_vertices(state, transforms, vset)


#: Bipartite id-space encoding offset shared by the warp CF twins —
#: item vertex ids become ``-(item + SAFE_NEG_OFFSET)`` so the two
#: sides share one id space (``warp_als_coord.cpp:49,177``).
SAFE_NEG_OFFSET = 2

def _frac_zero() -> Column:
    """Default-constructed (numerator, denominator) gather accumulator
    (``warp_als_coord.cpp:185-215`` / ``warp_nmf.cpp:184-196``).  A
    function, not a module constant: building Columns requires an
    active SparkContext."""
    return F.struct(F.lit(0.0).alias("num"), F.lit(0.0).alias("den"))


def _frac_combine(c: str) -> Column:
    """gather_type::operator+= for the (num, den) struct
    (``warp_als_coord.cpp:207-211``)."""
    return F.struct(F.sum(F.col(c)["num"]).alias("num"),
                    F.sum(F.col(c)["den"]).alias("den"))


def _bipartite_cf_graph(
    ratings: DataFrame, extra_cols: list[str], caller: str
) -> tuple[EdgeGraph, DataFrame, DataFrame]:
    """Shared loader for the warp CF twins: encode (user, item) ratings
    into one signed vertex-id space and return (graph, users, items)
    with the side frames persisted.

    The reference's vertex ids are unsigned (``graph_vertex_id_type``),
    so the user and item domains can never collide there; with signed
    Spark longs a negative user id would alias an encoded item vertex
    (and vice versa), silently merging two distinct vertices — reject
    such inputs up front.  The guard is one column-pruned aggregate
    over the ratings scan that the side-frame builds do anyway.
    """
    lo = ratings.agg(
        F.min("user").alias("u"), F.min("item").alias("i"),
        F.count("*").alias("n"),
        F.count("user").alias("nu"), F.count("item").alias("ni")).first()
    if lo is not None and lo["n"] > 0:
        if lo["nu"] < lo["n"] or lo["ni"] < lo["n"]:
            raise ValueError(
                f"{caller} requires non-null user/item ids "
                f"({lo['n'] - lo['nu']} null users, "
                f"{lo['n'] - lo['ni']} null items): null ids would "
                "silently produce null edge endpoints")
        if lo["u"] < 0 or lo["i"] < 0:
            raise ValueError(
                f"{caller} requires nonnegative user/item ids (got min "
                f"user {lo['u']}, min item {lo['i']}): the bipartite "
                f"encoding dst = -(item + {SAFE_NEG_OFFSET}) maps item "
                "vertices into the negative half of the id space, so "
                "negative input ids would alias vertices across the "
                "two sides")
    edges = ratings.select(
        F.col("user").alias("src"),
        (-(F.col("item") + SAFE_NEG_OFFSET)).alias("dst"),
        *extra_cols)
    graph = EdgeGraph(edges, drop_self_loops=False)
    users = ratings.select(F.col("user").alias("id")).distinct().persist()
    items = (ratings.select(
        (-(F.col("item") + SAFE_NEG_OFFSET)).alias("id"))
        .distinct().persist())
    return graph, users, items


def _lcg_side_init(side_df: DataFrame, orig: Column, side: int,
                   scale: float, offset: float) -> DataFrame:
    """The CF twins' portable LCG factor init, keyed on the ORIGINAL
    (pre-encoding) id: ``offset + scale * lcg_unit(id*31 + side*13)``
    — wals' ``0.1 * u`` (offset 0) and nmf's strictly-positive
    ``0.1 + 0.4 * u``."""
    from .portable import lcg_hash

    unit = lcg_hash(orig * 31 + side * 13) / F.lit(2.0 ** 31)
    return side_df.select(
        "id", (F.lit(offset) + F.lit(scale) * unit).alias("f"))


def warp_als1(
    ratings: DataFrame, reg: float = 0.01, iterations: int = 3
) -> DataFrame:
    """ALS written against the warp API — the k=1 instance of
    ``toolkits/collaborative_filtering/warp_als_coord.cpp``.

    The reference's coordinate-descent sweep per vertex is, for each
    latent coordinate t: ``frac = map_reduce(ALL_EDGES, als_coord_map)``
    — a (numerator, denominator) gather of
    ``((R_ij + w_it h_jt) h_jt, h_jt^2)`` (``warp_als_coord.cpp:
    218-236``) — then ``z = frac.numerator / (frac.denominator +
    LAMBDA)`` (``:261``) and a residual ``transform_neighborhood``
    (``:239-245``).  At k=1 the single coordinate IS the factor, the
    residual term telescopes (``R_ij + w_i h_j = A_ij``), and one sweep
    equals the exact rank-1 normal-equation solve — so this twin
    reproduces :func:`graphlab_spark.algos.als.wals` at k=1 and reuses
    its value oracle (``oracles.sql_wals1_user_factors``).

    Bipartite encoding mirrors the reference's loader: item vertex ids
    are negated with a safe offset so the two sides share one id space
    (``target_id = -(target_id + SAFE_NEG_OFFSET)``,
    ``warp_als_coord.cpp:49,177``; nonnegative input ids required —
    see :func:`_bipartite_cf_graph`).  Input ``(user, item, rating
    [, weight])``; missing weight = 1.0.  Returns user ``(id, f)``.
    """
    from ..plans.checkpoint import truncate_lineage

    if "weight" not in ratings.columns:
        ratings = ratings.withColumn("weight", F.lit(1.0))
    graph, users, items = _bipartite_cf_graph(
        ratings, ["rating", "weight"], "warp_als1")
    # wals' portable LCG init: 0.1 * lcg_unit(v*31 + c*7 + side*13)
    # with c=0 (k=1), keyed on the ORIGINAL item id.
    uf = _lcg_side_init(users, F.col("id"), 0, 0.1, 0.0)
    if_ = _lcg_side_init(items, -F.col("id") - SAFE_NEG_OFFSET, 1, 0.1, 0.0)

    def sweep(far: DataFrame, direction: str, vset: DataFrame) -> DataFrame:
        # The mapper only reads the FAR endpoint's factor (other_f), so
        # the neighborhood state is just the far side's frame — no
        # uf ∪ if_ union; the center's new factor is the closed-form
        # rank-1 normal-equation solve over the gathered (num, den).
        frac = map_reduce_neighborhood(
            graph, far,
            F.struct((F.col("weight") * F.col("rating") * F.col("other_f"))
                     .alias("num"),
                     (F.col("weight") * F.col("other_f") * F.col("other_f"))
                     .alias("den")),
            combine=_frac_combine, direction=direction, vset=vset,
            default=_frac_zero(), result_col="frac")
        return parfor_all_vertices(
            frac, {"f": F.col("frac")["num"]
                   / (F.col("frac")["den"] + F.lit(float(reg)))}
        ).select("id", "f")

    for it in range(iterations):
        uf = truncate_lineage(sweep(if_, "out", users))
        if it < iterations - 1:
            # The final item sweep's output feeds nothing (only uf is
            # returned) — skip it rather than eagerly materialize it.
            if_ = truncate_lineage(sweep(uf, "in", items))
    users.unpersist()
    items.unpersist()
    graph.edges.unpersist()
    return uf


def warp_nmf1(
    ratings: DataFrame, iterations: int = 3, eps: float = 1e-9
) -> DataFrame:
    """NMF written against the warp API — the k=1 instance of
    ``toolkits/collaborative_filtering/warp_nmf.cpp``.

    The reference's multiplicative sweep per vertex gathers
    ``delta = sum_edges other.pvec * obs / pred`` and rescales
    ``pvec *= delta / px`` (``warp_nmf.cpp:184-196``).  At k=1 with
    ``pred = w h`` the masked Lee-Seung update telescopes to

        w_new = w * sum(r h) / (w * sum(h^2) + eps)

    so one (numerator, denominator) struct gather — the same shape as
    :func:`warp_als1` — plus a parfor rescale reproduces
    :func:`graphlab_spark.algos.nmf.nmf` at k=1 and reuses its value
    oracle (``oracles.sql_nmf_user_factors(k=1)``).  Input
    ``(user, item, rating)``, nonnegative ids (see
    :func:`_bipartite_cf_graph`); returns user ``(id, f=0, v)``
    long-form.
    """
    from ..plans.checkpoint import truncate_lineage

    graph, users, items = _bipartite_cf_graph(
        ratings, ["rating"], "warp_nmf1")
    # nmf's strictly-positive portable init at f=0:
    # 0.1 + 0.4 * lcg_unit(id*31 + f*7 + side*13)
    uf = _lcg_side_init(users, F.col("id"), 0, 0.4, 0.1)
    if_ = _lcg_side_init(items, -F.col("id") - SAFE_NEG_OFFSET, 1, 0.4, 0.1)

    def sweep(cur: DataFrame, other: DataFrame, direction: str,
              vset: DataFrame) -> DataFrame:
        frac = map_reduce_neighborhood(
            graph, other,
            F.struct((F.col("rating") * F.col("other_f")).alias("num"),
                     (F.col("other_f") * F.col("other_f")).alias("den")),
            combine=_frac_combine, direction=direction, vset=vset,
            default=_frac_zero(), result_col="frac")
        joined = cur.join(frac, "id")
        return parfor_all_vertices(
            joined,
            {"f": F.col("f") * F.col("frac")["num"]
             / (F.col("f") * F.col("frac")["den"] + F.lit(float(eps)))}
        ).select("id", "f")

    for it in range(iterations):
        uf = truncate_lineage(sweep(uf, if_, "out", users))
        if it < iterations - 1:
            # Final item sweep feeds nothing (only uf is returned).
            if_ = truncate_lineage(sweep(if_, uf, "in", items))
    users.unpersist()
    items.unpersist()
    graph.edges.unpersist()
    return (uf.select("id", F.col("f").alias("v"))
            .select("id", F.lit(0).alias("f"), "v"))


def warp_pagerank(
    graph: EdgeGraph, iterations: int = 10, tol: float | None = None
) -> DataFrame:
    """PageRank written against the warp API —
    ``demoapps/pagerank/warp_engine_pagerank.cpp:32-62``:

    ``vertex.data() = 0.15 + 0.85 * map_reduce_neighborhood(vertex,
    IN_EDGES, pagerank_map)`` with ``pagerank_map(edge, other) =
    other.data() / other.num_out_edges()``, iterated ``iterations``
    times over all vertices (the demoapp's update-count loop).

    Returns ``(id, rank)``; equals ``algos.pagerank(graph,
    fixed_supersteps=iterations)`` to float round-off (see module
    docstring).  ``tol`` optionally stops early when
    ``max |Δrank| < tol`` (one extra scalar read per round off the
    same job via ``observe`` — the demoapp loops a fixed count).
    """
    from ..plans.checkpoint import truncate_lineage
    from pyspark.sql import Observation

    state = graph.vertices.select("id", F.lit(1.0).alias("rank"))
    for i in range(iterations):
        totals = map_reduce_neighborhood(
            graph, state,
            F.col("other_rank") / F.col("other_out_degree"),
            direction="in", include_degrees="out", default=0.0)
        joined = state.select("id", F.col("rank").alias("__old")).join(
            totals, "id")
        new = parfor_all_vertices(
            joined, {"rank": F.lit(0.15) + F.lit(0.85) * F.col("total")}
        ).select("id", "rank", F.abs(F.col("rank") - F.col("__old"))
                 .alias("__delta"))
        if tol is not None:
            obs = Observation(f"warp_pr_{i}")
            new = new.observe(obs, F.max("__delta").alias("md"))
        # truncate_lineage materializes (localCheckpoint) — the one
        # driver job per round, which also fulfils the observation.
        state = truncate_lineage(new.select("id", "rank"))
        if tol is not None:
            md = obs.get["md"]        # None on a vertex-less graph
            if md is None or md < tol:
                break
    return state
