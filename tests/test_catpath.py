"""Category-mediated shortest paths (apps/our_algo distillation).

Hand-derived goldens on a tiny typed graph, deterministic tie-breaks,
and the events adapter's art-art exclusion invariant.
"""

import pytest
from pyspark.sql import functions as F

from graphlab_spark.algos.catpath import (
    catpath,
    catpath_articles,
    events_typed_edges,
)

# Articles 1..4, categories -1..-3.
#   a1 - c1 - c2 - a2          (a2 at distance 3 via 3 hops from a1)
#   a2 - c3 - a3               (a3 at distance 5, 2 hops since a2)
#   a4 - c1                    (a4 at distance 2, 2 hops since a1)
MEMB = [(1, -1), (2, -2), (2, -3), (3, -3), (4, -1)]
CATL = [(-1, -2)]


def _run(spark, memb=MEMB, catl=CATL, sources=(1,)):
    membership = spark.createDataFrame(memb, "art long, cat long")
    catlinks = spark.createDataFrame(catl, "a long, b long")
    res = catpath(membership, catlinks, sources=list(sources), resume=False)
    rows = catpath_articles(res.state).collect()
    return {r["id"]: (r["distance"], r["prev_art"], r["cat_hops"])
            for r in rows}


def test_golden_chain(spark):
    out = _run(spark)
    assert out == {
        1: (0.0, None, 0),
        4: (2.0, 1, 2),      # a1 -> c1 -> a4
        2: (3.0, 1, 3),      # a1 -> c1 -> c2 -> a2
        3: (5.0, 2, 2),      # ... -> a2 -> c3 -> a3 (article re-seeds)
    }


def test_article_links_are_not_traversed(spark):
    # No membership path to article 3 when c3 is cut: even though the
    # reference graph also carries a1->a3 page links, catpath distance
    # must ignore them — absence of a category route means unreached.
    out = _run(spark, memb=[(1, -1), (3, -2)], catl=[])
    assert out == {1: (0.0, None, 0)}


def test_tiebreak_smallest_prev_art(spark):
    # Two equal-length routes to a3 departing from a1 and a2 (both
    # sources): the (dist, hops, last_art) min must pick prev_art=1.
    memb = [(1, -1), (2, -2), (3, -1), (3, -2)]
    out = _run(spark, memb=memb, catl=[], sources=(1, 2))
    assert out[3] == (2.0, 1, 2)


def test_category_relay_distance(spark):
    # Pure category chain: a1 - c1 - c2 - c3 - a2 => dist 4, hops 4.
    memb = [(1, -1), (2, -3)]
    catl = [(-1, -2), (-2, -3)]
    out = _run(spark, memb=memb, catl=catl)
    assert out[2] == (4.0, 1, 4)


def test_events_adapter_shapes(spark, tmp_path):
    ev = spark.createDataFrame(
        [(0, 0.0, 7, "a", 1.0), (1, 1.0, 7, "b", 1.0),
         (2, 2.0, 7, "a", 1.0), (3, 0.0, 8, "c", 1.0)],
        "event_id long, ts double, user_id long, event_type string, value double",
    )
    membership, catlinks = events_typed_edges(ev)
    m = {(r["art"], r["cat"]) for r in membership.collect()}
    # one membership row per event, categories negative
    assert len(m) == 4 and all(c < 0 for _, c in m)
    links = {(r["a"], r["b"]) for r in catlinks.collect()}
    # user 7's sequence a->b->a yields the single canonical (a,b) type
    # pair; user 8 contributes none.  No self-pairs, canonical order.
    assert len(links) == 1
    (a, b), = links
    assert a < b < 0


def test_determinism(spark):
    assert _run(spark) == _run(spark)
