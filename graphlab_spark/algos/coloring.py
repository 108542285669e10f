"""Greedy graph coloring (Jones–Plassmann BSP variant).

The reference colors vertices greedily — gather the neighbor-color set,
apply the smallest free color — on the *asynchronous* edge-consistent
engine for serializability (``/root/reference/toolkits/graph_analytics/
simple_coloring.cpp:100-126``); its result is scheduling-dependent.  A
bulk-synchronous engine needs a deterministic independent-set order
instead, so we use the classic Jones–Plassmann priority rule: a vertex
finalizes in the round where it is the highest-priority (degree, id)
vertex among its not-yet-colored neighbors, taking the smallest color
unused by already-finalized neighbors.

The output contract is the one the reference itself validates —
`map_reduce_edges` over `color(src) == color(dst)` must be zero
conflicts (``simple_coloring.cpp:251-256``) — plus determinism (same
input ⇒ same colors at any parallelism), which the async reference
cannot promise.

Scale shape per superstep: one join of the frontier onto the symmetric
edge table + two aggregations; the uncolored frontier shrinks
geometrically (independent sets are large on bounded-degeneracy
graphs), and hub vertices have maximal degree so they finalize in the
first rounds rather than serializing the tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeGraph
from ..plans.checkpoint import truncate_lineage
from ..plans.superstep import no_aqe_loop


from ..operators.portable import lcg_hash as _portable_hash


@no_aqe_loop
def greedy_coloring(graph: EdgeGraph, max_rounds: int = 200) -> DataFrame:
    """(id, color) proper coloring; colors are small non-negative ints."""
    sym = graph.symmetric_edges.select("src", "dst").distinct().persist()
    deg = (
        sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    )
    # Priority = (degree, lcg_hash(id), id): hashing breaks the
    # pathological case of sequential ids along a path (raw-id
    # tie-break would serialize to O(n) rounds); the trailing id makes
    # the priority unique so every round has winners.  The hash is a
    # two-round LCG in plain BIGINT arithmetic (not xxhash64) so an
    # external ANSI-SQL oracle can replay the identical round
    # structure — see graphlab_spark.oracles.sql_coloring.
    pending = (
        graph.vertices.join(deg, "id", "left")
        .select("id", F.coalesce("deg", F.lit(0)).alias("deg"),
                _portable_hash(F.col("id")).alias("h"))
        .persist()
    )
    colored = None  # (id, color)
    for _ in range(max_rounds):
        if pending.isEmpty():
            break
        # neighbor max-priority among still-pending vertices
        p2 = pending.select(F.col("id").alias("nbr"), F.col("deg").alias("ndeg"),
                            F.col("h").alias("nh"))
        nbr_max = (
            sym.join(p2, sym["dst"] == p2["nbr"])
            .groupBy(F.col("src").alias("id"))
            .agg(F.max(F.struct(F.col("ndeg").alias("d"),
                                F.col("nh").alias("hh"),
                                F.col("nbr").alias("i"))).alias("mx"))
        )
        winners = (
            pending.join(nbr_max, "id", "left")
            .filter(
                F.col("mx").isNull()
                | (F.struct(F.col("deg").alias("d"), F.col("h").alias("hh"),
                            F.col("id").alias("i"))
                   > F.col("mx"))
            )
            .select("id")
        )
        # smallest color not used by already-colored neighbors
        if colored is None:
            new_colors = winners.select("id", F.lit(0).alias("color"))
        else:
            used = (
                sym.join(winners.withColumnRenamed("id", "src"), "src")
                .join(colored.withColumnRenamed("id", "dst"), "dst")
                .groupBy(F.col("src").alias("id"))
                .agg(F.collect_set("color").alias("used"))
            )
            # smallest free color: first k in [0, |used|] not present.
            # |used| <= degree, and the filter() scan is a vectorized
            # array expression over that bounded set — no Python.
            free = F.expr(
                "filter(sequence(0, size(used)), k -> NOT array_contains(used, k))[0]"
            )
            new_colors = (
                winners.join(used, "id", "left")
                .select(
                    "id",
                    F.when(F.col("used").isNull(), F.lit(0))
                    .otherwise(free).cast("int").alias("color"),
                )
            )
        prev_colored, prev_pending = colored, pending
        colored_cache = (
            new_colors if colored is None else colored.unionAll(new_colors)
        ).persist()
        colored = truncate_lineage(colored_cache)
        colored_cache.unpersist()
        pending_cache = pending.join(
            new_colors.select("id"), "id", "left_anti").persist()
        pending = truncate_lineage(pending_cache)
        pending_cache.unpersist()
        if prev_colored is not None:
            prev_colored.unpersist()
        prev_pending.unpersist()
    else:
        if not pending.isEmpty():
            raise RuntimeError(
                f"greedy_coloring: {pending.count()} vertices still uncolored "
                f"after max_rounds={max_rounds}; partial result withheld")
    sym.unpersist()
    pending.unpersist()
    if colored is None:
        # Edge-empty graph: every vertex (if any) is an isolated color-0
        # vertex; with no vertices this is an empty (id, color) frame.
        return graph.vertices.select("id", F.lit(0).alias("color"))
    return colored


def count_conflicts(graph: EdgeGraph, colors: DataFrame) -> int:
    """The reference's validation aggregate: edges whose endpoints share
    a color (``simple_coloring.cpp:251-256``); must be 0."""
    e = graph.edges.select("src", "dst")
    return (
        e.join(colors.withColumnRenamed("id", "src")
               .withColumnRenamed("color", "c1"), "src")
        .join(colors.withColumnRenamed("id", "dst")
              .withColumnRenamed("color", "c2"), "dst")
        .filter(F.col("c1") == F.col("c2"))
        .count()
    )


@no_aqe_loop
def warp_coloring(graph: EdgeGraph, max_rounds: int = 200) -> DataFrame:
    """Greedy coloring written against the warp fine-grained API
    (``toolkits/graph_analytics/warp_coloring.cpp``): the gl3engine
    program gathers the neighbor color set with a ``set_union_gather``
    map-reduce (``warp_coloring.cpp:63-90``) and applies the smallest
    free color (``:117-137``), optionally under edge-consistent locks.

    As with :func:`greedy_coloring`, the async/locking schedule is not
    reproducible on a BSP engine, so the round structure is the same
    deterministic Jones-Plassmann replay — but both per-round
    reductions (max pending-neighbor priority; set-union of colored
    neighbor colors) run through ``warp.map_reduce_neighborhood``
    instead of hand-built joins.  Both combiners are idempotent, so the
    duplicate (u,v)/(v,u) rows of the warp ALL_EDGES view are harmless
    and the output is **bit-identical** to :func:`greedy_coloring`
    (asserted in tests/test_warp.py).

    Returns ``(id, color)``.
    """
    from ..operators.warp import map_reduce_neighborhood

    sym = graph.symmetric_edges.select("src", "dst").distinct().persist()
    deg = (
        sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    )
    state = (
        graph.vertices.join(deg, "id", "left")
        .select("id", F.coalesce("deg", F.lit(0)).alias("deg"),
                _portable_hash(F.col("id")).alias("h"),
                F.lit(None).cast("int").alias("color"))
        .persist()
    )
    my_pri = F.struct(F.col("deg").alias("d"), F.col("h").alias("hh"),
                      F.col("id").alias("i"))
    nbr_pri = F.when(
        F.col("other_color").isNull(),
        F.struct(F.col("other_deg").alias("d"), F.col("other_h").alias("hh"),
                 F.col("other_id").alias("i")))
    for _ in range(max_rounds):
        pend = state.filter(F.col("color").isNull())
        if pend.isEmpty():
            break
        mx = map_reduce_neighborhood(
            graph, state, nbr_pri, combine=F.max, direction="all",
            vset=pend.select("id"),
            default=F.lit(None).cast(
                "struct<d:bigint,hh:bigint,i:bigint>"),
            result_col="mx")
        winners = (
            pend.join(mx, "id")
            .filter(F.col("mx").isNull() | (my_pri > F.col("mx")))
            .select("id")
        )
        used = map_reduce_neighborhood(
            graph, state, F.col("other_color"),
            combine=lambda c: F.collect_set(c), direction="all",
            vset=winners, default=F.array().cast("array<int>"),
            result_col="used")
        free = F.expr(
            "filter(sequence(0, size(used)), k -> NOT array_contains(used, k))[0]"
        )
        new_colors = used.select(
            "id",
            F.when(F.size("used") == 0, F.lit(0))
            .otherwise(free).cast("int").alias("__new"))
        prev = state
        state_cache = (
            state.join(new_colors, "id", "left")
            .select("id", "deg", "h",
                    F.coalesce("color", "__new").alias("color"))
            .persist()
        )
        state = truncate_lineage(state_cache)
        state_cache.unpersist()
        prev.unpersist()
    else:
        still = state.filter(F.col("color").isNull()).count()
        if still:
            raise RuntimeError(
                f"warp_coloring: {still} vertices still uncolored after "
                f"max_rounds={max_rounds}; partial result withheld")
    sym.unpersist()
    out = state.select("id", "color")
    state.unpersist()
    return out
