"""Category-mediated shortest paths over a typed article/category graph.

Parity contract — the fork's own Wikipedia path-search research code
(``/root/reference/apps/our_algo/our_algo.cpp``, duplicated under
``apps/catpath/``), the last reference app without a counterpart here.
The reference program runs over a two-type vertex set (articles,
``type==0``, and categories, ``type==14``; ``our_algo.cpp:667-680``)
with directed article→article page links, undirected article↔category
membership links, and undirected category↔category links
(``line_parser_art``/``line_parser_categ``, ``our_algo.cpp:559-604``).
Starting from a source article it floods messages through the
*category* graph only — article→category (``scatter``, art-to-cat
branch, ``our_algo.cpp:474-483``), category→category relay with +1 per
hop (``:435-456``), category→article delivery with +1
(``:457-473``) — and each article keeps the minimum distance at which
a message first reaches it, together with the article the final
category excursion departed from (``prev_art``) and the hop count
since that article (``cat_dist_from_prev``); once found, an article
re-seeds the search with its own distance exactly once
(``sent``/``isDead``, apply at ``:373-395``).  The final writer emits
``(id, type, dist, prev_art, cat_dist_from_prev)`` for reached
vertices (``shortest_path_writer``, ``:509-521``).

What this module distills: the fixed point the app converges to is a
**typed BFS** — unit-cost shortest paths from the source over the
union of membership and category-link edges, with direct
article→article links excluded (category-mediated distance is the
quantity the research code studies).  The prototype's per-category
single-slot message queue and the ``vid_set``/``seen`` delivery gates
(``our_algo.cpp:457-466``) are Wikipedia-dataset scaffolding (they
prune deliveries to precomputed neighbor lists of the destination
article), not part of the distance semantics, and are deliberately not
reproduced; ties are instead broken deterministically to the
lexicographically smallest ``(distance, cat_hops, prev_art)`` triple
so the result is engine-portable and oracle-checkable
(``oracles.sql_catpath``).

Scale shape: one frontier⋈edges shuffle join + one min-struct
aggregation per superstep — identical to ``algos/sssp.py``; state is
|V| rows, messages are bounded by the frontier's out-edges, lineage is
truncated per superstep by ``run_bsp``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import BSPResult, run_bsp

INF = float("inf")
# Sentinels so the (distance, hops, last_art) triple is totally ordered
# without NULL-comparison edge cases; any real candidate sorts below.
_HOPS_INF = 2**31
_LAST_INF = 2**62


def catpath(
    membership: DataFrame,
    catlinks: DataFrame,
    sources: list[int],
    max_supersteps: int = 200,
    resume: bool = True,
    verbose: bool = False,
) -> BSPResult:
    """Typed BFS from ``sources`` (article ids) over membership ∪
    category-link edges.

    ``membership``: (art, cat) article↔category edges — first column is
    the article end, second the category end (traversed both ways, like
    the reference's undirected category loader).
    ``catlinks``: (src, dst) category↔category edges (undirected).
    Article and category id spaces must be disjoint (the events-derived
    graph guarantees this by sign; see ``catpath_from_events``).

    Returns a BSPResult whose state is
    ``(id long, __is_art boolean, distance double, hops long,
    last_art long)``: ``distance`` = unit-cost hops from the source
    (+inf when unreached), ``last_art`` = the article the last
    article-departure on a shortest path left from, ``hops`` = edges
    traversed since that departure.  Use :func:`catpath_articles` for
    the reference writer's per-article view.
    """
    art, cat = membership.columns[:2]
    memb = membership.select(F.col(art).alias("art"),
                             F.col(cat).alias("cat")).distinct()
    csrc, cdst = catlinks.columns[:2]
    clinks = (catlinks.select(F.col(csrc).alias("a"), F.col(cdst).alias("b"))
              .filter(F.col("a") != F.col("b")).distinct())

    # Typed edge view: src_is_art drives how a relayed message's
    # (hops, last_art) provenance is rewritten — reset on leaving an
    # article, carried through categories (our_msg Quad fields,
    # our_algo.cpp:50-67).
    tedges = (
        memb.select(F.col("art").alias("src"), F.col("cat").alias("dst"),
                    F.lit(True).alias("src_is_art"))
        .unionAll(memb.select(F.col("cat").alias("src"),
                              F.col("art").alias("dst"),
                              F.lit(False).alias("src_is_art")))
        .unionAll(clinks.select(F.col("a").alias("src"),
                                F.col("b").alias("dst"),
                                F.lit(False).alias("src_is_art")))
        .unionAll(clinks.select(F.col("b").alias("src"),
                                F.col("a").alias("dst"),
                                F.lit(False).alias("src_is_art")))
    )

    arts = memb.select(F.col("art").alias("id")).distinct()
    cats = (memb.select(F.col("cat").alias("id"))
            .unionAll(clinks.select(F.col("a").alias("id")))
            .unionAll(clinks.select(F.col("b").alias("id")))
            .distinct())
    verts = (arts.select("id", F.lit(True).alias("__is_art"))
             .unionAll(cats.select("id", F.lit(False).alias("__is_art"))))

    src_lit = F.array(*[F.lit(int(s)) for s in sources])
    is_src = F.array_contains(src_lit, F.col("id"))
    init = verts.select(
        "id", "__is_art",
        F.when(is_src, F.lit(0.0)).otherwise(F.lit(INF)).alias("distance"),
        F.when(is_src, F.lit(0)).otherwise(F.lit(_HOPS_INF))
        .cast("long").alias("hops"),
        F.lit(_LAST_INF).cast("long").alias("last_art"),
        is_src.alias("__changed"),
    )

    def step(state: DataFrame, i: int):
        active = state.filter(F.col("__changed")).select(
            "id", "distance", "hops", "last_art")
        cand = tedges.join(active, tedges["src"] == active["id"]).select(
            "dst",
            F.struct(
                (F.col("distance") + F.lit(1.0)).alias("d"),
                F.when(F.col("src_is_art"), F.lit(1))
                .otherwise(F.col("hops") + F.lit(1)).cast("long").alias("h"),
                F.when(F.col("src_is_art"), F.col("src"))
                .otherwise(F.col("last_art")).cast("long").alias("a"),
            ).alias("cand"),
        )
        msgs = cand.groupBy("dst").agg(F.min("cand").alias("cand"))
        joined = state.join(msgs, state["id"] == msgs["dst"], "left")
        cur = F.struct(F.col("distance").alias("d"), F.col("hops").alias("h"),
                       F.col("last_art").alias("a"))
        improved = F.col("cand").isNotNull() & (F.col("cand") < cur)
        new_state = joined.select(
            "id", "__is_art",
            F.when(improved, F.col("cand.d")).otherwise(F.col("distance"))
            .alias("distance"),
            F.when(improved, F.col("cand.h")).otherwise(F.col("hops"))
            .alias("hops"),
            F.when(improved, F.col("cand.a")).otherwise(F.col("last_art"))
            .alias("last_art"),
            improved.alias("__changed"),
        )
        from pyspark.sql import Observation
        obs = Observation(f"catpath_{i}")
        observed = new_state.observe(
            obs, F.sum(F.col("__changed").cast("long")).alias("active"))

        def finish():
            n = int(obs.get["active"] or 0)
            return ({"active": n, "max_delta": float(n)}, n == 0)

        return observed, finish

    result = run_bsp(init, step, max_supersteps=max_supersteps,
                     resume=resume, verbose=verbose)
    result.state = result.state.drop("__changed")
    return result


def catpath_articles(state: DataFrame) -> DataFrame:
    """The reference writer's view (``shortest_path_writer``,
    ``our_algo.cpp:509-521``): reached articles only, with the source
    normalized to (distance 0, prev_art NULL, cat_hops 0)."""
    src = F.col("distance") == 0.0
    return state.filter(F.col("__is_art") & (F.col("distance") != INF)).select(
        "id",
        "distance",
        F.when(src, F.lit(None)).otherwise(F.col("last_art"))
        .cast("long").alias("prev_art"),
        F.when(src, F.lit(0)).otherwise(F.col("hops"))
        .cast("long").alias("cat_hops"),
    )


def events_typed_edges(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(membership, catlinks) induced from the driver's `events` table.

    Articles are event vertices (positive ids), categories are the
    negative type-hub ids of ``sources.events.event_type_dim`` —
    mirroring the reference's Wikipedia pages/categories split.
    Membership = the hub edge family; category links = types observed
    adjacently in some user's event sequence (the same co-occurrence
    signal the sequence family encodes, lifted to the type level).
    SQL twin: ``oracles.sql_catpath``.
    """
    from ..sources.events import event_type_dim

    dim = F.broadcast(event_type_dim(events))
    typed = events.join(dim, "event_type").select(
        "user_id", "ts", "event_id", "type_node")
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    membership = typed.select(F.col("event_id").alias("art"),
                              F.col("type_node").alias("cat"))
    catlinks = (
        typed.select(F.col("type_node").alias("a"),
                     F.lead("type_node").over(w).alias("b"))
        .filter(F.col("b").isNotNull() & (F.col("a") != F.col("b")))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    return membership, catlinks
