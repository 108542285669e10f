"""Warp fine-grained API (operators/warp.py) — batch-analog semantics.

Fixture graph (FIXTURES.md §3): edges
(0,5) (1,0) (1,5) (2,0) (2,5) (3,0) (3,5); vertices {0,1,2,3,5}.
"""

from pyspark.sql import functions as F

from graphlab_spark.operators import warp


def _as_dict(df, key="id", val=None):
    rows = df.collect()
    val = val or [c for c in df.columns if c != key][0]
    return {r[key]: r[val] for r in rows}


def test_map_reduce_out_count_is_out_degree(fixture_graph):
    state = fixture_graph.vertices.select("id")
    out = warp.map_reduce_neighborhood(
        fixture_graph, state, F.lit(1), combine=F.sum,
        direction="out", default=0)
    assert _as_dict(out) == {0: 1, 1: 2, 2: 2, 3: 2, 5: 0}


def test_map_reduce_min_combiner_in_edges(fixture_graph):
    state = fixture_graph.vertices.select("id")
    out = warp.map_reduce_neighborhood(
        fixture_graph, state, F.col("other_id"), combine=F.min,
        direction="in", default=-1)
    assert _as_dict(out) == {5: 0, 0: 1, 1: -1, 2: -1, 3: -1}


def test_map_reduce_vset_prunes_centers(fixture_graph):
    state = fixture_graph.vertices.select("id")
    vset = fixture_graph.spark.createDataFrame([(0,), (5,)], "id long")
    out = warp.map_reduce_neighborhood(
        fixture_graph, state, F.lit(1), direction="out", vset=vset,
        default=0)
    assert _as_dict(out) == {0: 1, 5: 0}


def test_broadcast_signals_merge_at_receiver(fixture_graph):
    # CC-style scatter: every vertex signals its own label (= id) along
    # OUT edges; same-target signals merge with min.
    state = fixture_graph.vertices.select("id", F.col("id").alias("label"))
    sig = warp.broadcast_neighborhood(
        fixture_graph, state, F.col("label"), combine=F.min,
        direction="out", msg_col="m")
    assert _as_dict(sig) == {5: 0, 0: 1}


def test_transform_neighborhood_touches_only_incident(fixture_graph):
    state = fixture_graph.vertices.select(
        "id", (F.col("id") * 1.0).alias("rank"))
    vset = fixture_graph.spark.createDataFrame([(1,)], "id long")
    out = warp.transform_neighborhood(
        fixture_graph, {"flag": F.col("src_rank") + F.col("dst_rank")},
        direction="out", state=state, vset=vset)
    got = {(r["src"], r["dst"]): r["flag"] for r in out.collect()}
    assert got[(1, 0)] == 1.0 and got[(1, 5)] == 6.0
    assert all(v is None for k, v in got.items() if k[0] != 1)
    assert set(out.columns) == {"src", "dst", "flag"}  # state cols dropped


def test_parfor_is_transform_vertices(fixture_graph):
    state = fixture_graph.vertices.select("id", F.lit(2.0).alias("x"))
    out = warp.parfor_all_vertices(state, {"x": F.col("x") * F.col("id")})
    assert _as_dict(out, val="x") == {0: 0.0, 1: 2.0, 2: 4.0, 3: 6.0, 5: 10.0}


def test_warp_pagerank_matches_builtin_fixed(fixture_graph):
    from graphlab_spark.algos.pagerank import pagerank
    ref = pagerank(fixture_graph, fixed_supersteps=3, resume=False).state
    got = warp.warp_pagerank(fixture_graph, iterations=3)
    diff = (
        ref.withColumnRenamed("rank", "r1")
        .join(got.withColumnRenamed("rank", "r2"), "id")
        .agg(F.max(F.abs(F.col("r1") - F.col("r2"))).alias("d"))
        .first()["d"]
    )
    assert ref.count() == got.count() == 5
    assert diff < 1e-12  # same sums, ulp-level division vs baked 1/deg


def test_warp_pagerank_tol_converges(fixture_graph):
    from graphlab_spark.algos.pagerank import pagerank
    ref = pagerank(fixture_graph, tol=1e-8, resume=False).state
    got = warp.warp_pagerank(fixture_graph, iterations=100, tol=1e-8)
    diff = (
        ref.withColumnRenamed("rank", "r1")
        .join(got.withColumnRenamed("rank", "r2"), "id")
        .agg(F.max(F.abs(F.col("r1") - F.col("r2"))).alias("d"))
        .first()["d"]
    )
    assert diff < 1e-6


def test_neighborhood_include_center_name_collision_raises(fixture_graph, spark):
    import pytest

    state = fixture_graph.vertices.select(
        "id", F.lit(1.0).alias("other_id"))  # collides with the view's key
    with pytest.raises(ValueError, match="include_center"):
        warp.neighborhood(fixture_graph, state, direction="in",
                          include_center=True)
    # non-colliding state still joins fine
    ok = warp.neighborhood(
        fixture_graph, fixture_graph.vertices.select(
            "id", F.lit(2.0).alias("mass")),
        direction="in", include_center=True)
    assert "mass" in ok.columns and ok.count() == 7


def test_warp_als1_matches_wals_k1(spark):
    """warp_als_coord.cpp at k=1: one coordinate-descent sweep equals
    the exact rank-1 weighted normal-equation solve, so the warp twin
    must reproduce wals(k=1) to float round-off."""
    from graphlab_spark.algos.als import wals
    from graphlab_spark.operators.warp import warp_als1

    users = spark.range(20).select(F.col("id").alias("user"))
    items = spark.range(15).select(F.col("id").alias("item"))
    ratings = (
        users.crossJoin(items)
        .filter(F.pmod(F.xxhash64("user", "item"), F.lit(3)) == 0)
        .select("user", "item",
                (F.pmod(F.xxhash64("user", "item", F.lit(1)), F.lit(50))
                 / F.lit(50.0)).alias("rating"),
                (F.lit(1.0) + F.pmod(F.xxhash64("user", "item", F.lit(2)),
                                     F.lit(3))).alias("weight"))
        .persist()
    )
    ref, _ = wals(ratings, k=1, reg=0.01, iterations=2)
    got = warp_als1(ratings, reg=0.01, iterations=2)
    diff = (
        ref.select("id", F.element_at("factor", 1).alias("r"))
        .join(got.withColumnRenamed("f", "g"), "id", "full")
        .agg(F.max(F.abs(F.col("r") - F.col("g"))).alias("d"),
             F.count("*").alias("n"))
        .first()
    )
    assert diff["n"] == 20 and diff["d"] < 1e-9
    ratings.unpersist()


def test_warp_als1_empty_ratings(spark):
    from graphlab_spark.operators.warp import warp_als1
    empty = spark.createDataFrame(
        [], "user long, item long, rating double")
    assert warp_als1(empty).count() == 0


def test_warp_nmf1_matches_nmf_k1(spark):
    """warp_nmf.cpp at k=1: the masked Lee-Seung multiplicative update
    telescopes to one (num, den) gather + rescale, so the warp twin
    must reproduce nmf(k=1) to float round-off."""
    from graphlab_spark.algos.nmf import nmf
    from graphlab_spark.operators.warp import warp_nmf1

    users = spark.range(15).select(F.col("id").alias("user"))
    items = spark.range(12).select(F.col("id").alias("item"))
    ratings = (
        users.crossJoin(items)
        .filter(F.pmod(F.xxhash64("user", "item"), F.lit(2)) == 0)
        .select("user", "item",
                (F.lit(0.5) + F.pmod(F.xxhash64("user", "item", F.lit(9)),
                                     F.lit(40)) / F.lit(20.0))
                .alias("rating"))
        .persist()
    )
    ref, _ = nmf(ratings, k=1, iterations=3)
    got = warp_nmf1(ratings, iterations=3)
    diff = (
        ref.select("id", "f", F.col("v").alias("rv"))
        .join(got.withColumnRenamed("v", "gv"), ["id", "f"], "full")
        .agg(F.max(F.abs(F.col("rv") - F.col("gv"))).alias("d"),
             F.count("*").alias("n"))
        .first()
    )
    assert diff["n"] == 15 and diff["d"] < 1e-9
    ratings.unpersist()


def test_warp_cf_twins_reject_negative_ids(spark):
    """The bipartite encoding dst = -(item + 2) maps items into the
    negative id half-space; a negative user (or item) id would alias a
    vertex on the other side and silently merge two distinct vertices,
    so both twins must reject such inputs up front."""
    import pytest

    from graphlab_spark.operators.warp import warp_als1, warp_nmf1

    neg_user = spark.createDataFrame(
        [(-3, 7, 1.0), (0, 1, 2.0)], "user long, item long, rating double")
    neg_item = spark.createDataFrame(
        [(3, -2, 1.0), (0, 1, 2.0)], "user long, item long, rating double")
    for bad in (neg_user, neg_item):
        with pytest.raises(ValueError, match="nonnegative"):
            warp_als1(bad, iterations=1)
        with pytest.raises(ValueError, match="nonnegative"):
            warp_nmf1(bad, iterations=1)


def test_warp_cf_twins_reject_null_ids(spark):
    """Null user/item ids would silently produce null edge endpoints;
    the guard must raise cleanly (including alongside negative ids on
    the other column, which previously bypassed or crashed the check)."""
    import pytest

    from graphlab_spark.operators.warp import warp_als1

    nulls = spark.createDataFrame(
        [(3, None, 1.0), (1, 2, 1.0)], "user long, item long, rating double")
    with pytest.raises(ValueError, match="non-null"):
        warp_als1(nulls, iterations=1)
    negnull = spark.createDataFrame(
        [(None, -7, 1.0)], "user long, item long, rating double")
    with pytest.raises(ValueError, match="non-null"):
        warp_als1(negnull, iterations=1)


def test_warp_coloring_matches_builtin(fixture_graph):
    # warp_coloring.cpp twin: same Jones-Plassmann replay, both
    # per-round reductions through map_reduce_neighborhood — output
    # must be bit-identical to the builtin.
    from graphlab_spark.algos.coloring import (
        count_conflicts, greedy_coloring, warp_coloring)
    a = sorted(map(tuple, greedy_coloring(fixture_graph).collect()))
    b = sorted(map(tuple, warp_coloring(fixture_graph).collect()))
    assert a == b
    assert count_conflicts(
        fixture_graph, warp_coloring(fixture_graph)) == 0


def test_warp_coloring_matches_builtin_random(spark):
    from graphlab_spark.algos.coloring import (
        count_conflicts, greedy_coloring, warp_coloring)
    from graphlab_spark.graph import EdgeGraph
    # deterministic pseudo-random graph incl. duplicate/reverse edges
    # (the ALL_EDGES view's idempotent combiners must absorb them)
    edges = [((7 * i * i + 3 * i) % 37, (11 * i + 5) % 37)
             for i in range(160)]
    edges = [(s, d) for s, d in edges if s != d]
    g = EdgeGraph(spark.createDataFrame(edges, "src long, dst long"),
                  num_edge_partitions=4)
    cw = warp_coloring(g)
    assert sorted(map(tuple, greedy_coloring(g).collect())) == \
        sorted(map(tuple, cw.collect()))
    assert count_conflicts(g, cw) == 0
    g.unpersist()
