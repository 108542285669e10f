"""Betweenness centrality: exact parity with a pure-Python Brandes
implementation on hand-built graphs, plus source-set semantics and the
oracle twin's DuckDB replay on an events micro-corpus."""

import collections

import pytest
from pyspark.sql import functions as F

from graphlab_spark import EdgeGraph
from graphlab_spark.algos.betweenness import betweenness, harmonic_centrality


def _py_brandes(edges, sources, directed=False):
    """Reference Brandes over the simple (deduplicated) graph."""
    adj = collections.defaultdict(set)
    verts = set()
    for s, d in edges:
        adj[s].add(d)
        if not directed:
            adj[d].add(s)
        verts |= {s, d}
    bc = collections.defaultdict(float)
    for s in sources:
        if s not in verts:
            continue
        dist = {s: 0}
        sigma = {s: 1.0}
        order = [s]
        q = collections.deque([s])
        while q:
            v = q.popleft()
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0.0
                    q.append(w)
                    order.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = collections.defaultdict(float)
        for w in reversed(order):
            for v in adj[w] if not directed else [
                    u for u in verts if w in adj[u]]:
                if dist.get(v, -9) == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
        for v in order:
            if v != s:
                bc[v] += delta[v]
    return {v: bc.get(v, 0.0) for v in verts}


def _spark_bc(spark, edges, sources, **kw):
    g = EdgeGraph(spark.createDataFrame(edges, "src long, dst long"),
                  num_edge_partitions=4)
    try:
        rows = betweenness(g, sources=sources, **kw).collect()
    finally:
        g.unpersist()
    return {r["id"]: r["bc"] for r in rows}


def _assert_close(got, want):
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), (
            v, got[v], want[v])


def test_path_graph_all_sources(spark):
    # path 0-1-2-3: interior vertices broker all through-traffic;
    # exact bc (directed-pair counting) = 2*(d(1)=2) etc.
    edges = [(0, 1), (1, 2), (2, 3)]
    want = _py_brandes(edges, [0, 1, 2, 3])
    got = _spark_bc(spark, edges, [0, 1, 2, 3])
    _assert_close(got, want)
    assert want[1] == pytest.approx(4.0)  # known closed form
    assert want[0] == pytest.approx(0.0)


def test_star_center_brokers_everything(spark):
    edges = [(0, i) for i in range(1, 6)]
    want = _py_brandes(edges, list(range(6)))
    got = _spark_bc(spark, edges, list(range(6)))
    _assert_close(got, want)
    # center sits on every leaf-leaf shortest path: 2 * C(5,2) pairs
    assert got[0] == pytest.approx(20.0)


def test_diamond_splits_path_counts(spark):
    # 0->{1,2}->3: two equal shortest paths, sigma splitting 0.5/0.5
    edges = [(0, 1), (0, 2), (1, 3), (2, 3)]
    want = _py_brandes(edges, [0, 1, 2, 3])
    got = _spark_bc(spark, edges, [0, 1, 2, 3])
    _assert_close(got, want)
    assert got[1] == pytest.approx(got[2])


def test_source_subset_and_missing_sources(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 4)]
    want = _py_brandes(edges, [0, 2])
    got = _spark_bc(spark, edges, [0, 2, 99])  # 99 absent: no effect
    _assert_close(got, want)


def test_duplicate_edges_collapse(spark):
    base = [(0, 1), (1, 2), (2, 3)]
    want = _spark_bc(spark, base, [0, 3])
    got = _spark_bc(spark, base + [(1, 2), (2, 1), (0, 1)], [0, 3])
    _assert_close(got, want)


def test_directed_asymmetry(spark):
    # 0->1->2 directed: only forward paths exist, so bc(1) counts the
    # 0->2 brokerage once; the undirected view counts both directions
    edges = [(0, 1), (1, 2)]
    got = _spark_bc(spark, edges, [0, 1, 2], directed=True)
    want = _py_brandes(edges, [0, 1, 2], directed=True)
    _assert_close(got, want)
    assert got[1] == pytest.approx(1.0)
    undirected = _spark_bc(spark, edges, [0, 1, 2])
    assert undirected[1] == pytest.approx(2.0)


def test_truncated_bfs_raises(spark):
    # diameter 5 > max_supersteps 3: a silently undercounted result is
    # refused
    edges = [(i, i + 1) for i in range(5)]
    g = EdgeGraph(spark.createDataFrame(edges, "src long, dst long"),
                  num_edge_partitions=2)
    try:
        with pytest.raises(RuntimeError, match="still growing"):
            betweenness(g, sources=[0], max_supersteps=3)
    finally:
        g.unpersist()


def test_disconnected_component_zeroes(spark):
    edges = [(0, 1), (1, 2), (10, 11)]
    got = _spark_bc(spark, edges, [0, 1, 2])
    assert got[10] == 0.0 and got[11] == 0.0
    assert got[1] == pytest.approx(_py_brandes(edges, [0, 1, 2])[1])


def _py_harmonic(edges, sources):
    adj = collections.defaultdict(set)
    verts = set()
    for s, d in edges:
        adj[s].add(d)
        adj[d].add(s)
        verts |= {s, d}
    hc = collections.defaultdict(float)
    for s in sources:
        if s not in verts:
            continue
        dist = {s: 0}
        q = collections.deque([s])
        while q:
            v = q.popleft()
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        for v, d in dist.items():
            if d > 0:
                hc[v] += 1.0 / d
    return {v: hc.get(v, 0.0) for v in verts}


def test_harmonic_path_and_star(spark):
    for edges in ([(0, 1), (1, 2), (2, 3)], [(0, i) for i in range(1, 6)]):
        want = _py_harmonic(edges, sorted({v for e in edges for v in e}))
        g = EdgeGraph(spark.createDataFrame(edges, "src long, dst long"),
                      num_edge_partitions=4)
        try:
            got = {r["id"]: r["hc"]
                   for r in harmonic_centrality(
                       g, sources=sorted(want)).collect()}
        finally:
            g.unpersist()
        _assert_close(got, want)


def test_harmonic_unreachable_contributes_zero(spark):
    edges = [(0, 1), (10, 11)]
    g = EdgeGraph(spark.createDataFrame(edges, "src long, dst long"),
                  num_edge_partitions=2)
    try:
        got = {r["id"]: r["hc"]
               for r in harmonic_centrality(g, sources=[0]).collect()}
    finally:
        g.unpersist()
    assert got == {0: 0.0, 1: 1.0, 10: 0.0, 11: 0.0}


def test_forward_superstep_plan_shape(spark):
    """The BFS level must stay a keyed-shuffle plan: frontier⋈edges
    hash join, partial+final (root, dst) hash aggregation, anti-join —
    no cartesian product, no single-partition window, and exactly one
    shuffle exchange (the message aggregation; the anti-join side may
    broadcast or reuse the same partitioning)."""
    from graphlab_spark.plans.checkpoint import truncate_lineage
    g = EdgeGraph(
        spark.createDataFrame([(i, (i * 7 + 1) % 50) for i in range(200)],
                              "src long, dst long"),
        num_edge_partitions=4)
    try:
        edges = truncate_lineage(
            g.symmetric_edges.select("src", "dst").distinct())
        frontier = truncate_lineage(
            g.vertices.limit(4).select(
                F.col("id").alias("root"), "id",
                F.lit(0).alias("dist"), F.lit(1.0).alias("sigma")))
        expanded = (
            frontier.join(edges, frontier["id"] == edges["src"])
            .groupBy("root", "dst")
            .agg(F.sum("sigma").alias("sigma"))
            .select("root", F.col("dst").alias("id"),
                    F.lit(1).alias("dist"), "sigma"))
        new = expanded.join(frontier.select("root", "id"),
                            ["root", "id"], "left_anti")
        plan = new._jdf.queryExecution().executedPlan().toString()
    finally:
        g.unpersist()
    assert "Cartesian" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert "Window" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_cli_betweenness_and_harmonic(spark, tmp_path, capsys):
    import json

    from graphlab_spark.cli import main
    tsv = tmp_path / "e.tsv"
    tsv.write_text("0\t1\n1\t2\n2\t3\n")
    out = tmp_path / "bc"
    assert main(["betweenness", "--input", str(tsv), "--format", "tsv",
                 "--sources", "0,1,2,3", "--output", str(out)]) == 0
    assert main(["harmonic", "--input", str(tsv), "--format", "tsv",
                 "--sources", "0,1,2,3"]) == 0
    lines = [json.loads(ln)
             for ln in capsys.readouterr().out.strip().splitlines()]
    assert {ln["algo"] for ln in lines} == {"betweenness", "harmonic"}
    bc = {r["id"]: r["bc"] for r in spark.read.parquet(str(out)).collect()}
    assert bc[1] == pytest.approx(4.0) and bc[0] == pytest.approx(0.0)


def test_oracle_twin_on_events_micro_corpus(spark, tmp_path):
    """The DuckDB oracle and the Spark query produce identical (id, bc)
    sets on a small synthetic events table — the same comparison the
    driver runs at sf0.01."""
    duckdb = pytest.importorskip("duckdb")
    import random

    from graphlab_spark.oracles import sql_betweenness_hubs

    rng = random.Random(11)
    types = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = [(eid, eid * 7 % 97, f"u{eid % 5}", types[rng.randrange(5)],
             1.0, "{}") for eid in range(1, 61)]
    events = spark.createDataFrame(
        rows, "event_id long, ts long, user_id string, event_type string, "
              "value double, props string")
    pq = str(tmp_path / "events.parquet")
    events.write.parquet(pq)

    import __spark_entry__ as entry
    spark_bc = {r["id"]: r["bc"]
                for r in entry.q_betweenness_hubs(spark, str(tmp_path))
                .collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{pq}/*.parquet'")
    oracle_bc = dict(con.execute(sql_betweenness_hubs()).fetchall())
    # per-id closeness, not exact equality of rounded sets: summation
    # order differs between engines, so a delta landing near a 5e-7
    # rounding boundary would flip the 6th decimal and flake
    assert spark_bc.keys() == oracle_bc.keys()
    for i, v in spark_bc.items():
        assert v == pytest.approx(oracle_bc[i], abs=2e-6), f"bc id={i}"

    from graphlab_spark.oracles import sql_harmonic_hubs
    spark_hc = {r["id"]: r["hc"]
                for r in entry.q_harmonic_hubs(spark, str(tmp_path))
                .collect()}
    oracle_hc = dict(con.execute(sql_harmonic_hubs()).fetchall())
    assert spark_hc.keys() == oracle_hc.keys()
    for i, v in spark_hc.items():
        assert v == pytest.approx(oracle_hc[i], abs=2e-6), f"hc id={i}"


def test_oracle_truncation_sentinel(spark, tmp_path):
    """A capped oracle run must error, mirroring the Spark side's
    RuntimeError, instead of returning undercounted centralities."""
    duckdb = pytest.importorskip("duckdb")
    from graphlab_spark.oracles import (sql_betweenness_hubs,
                                        sql_harmonic_hubs)

    events = spark.createDataFrame(
        [(e, e * 7 % 97, f"u{e % 5}", "alpha", 1.0, "{}")
         for e in range(1, 61)],
        "event_id long, ts long, user_id string, event_type string, "
        "value double, props string")
    pq = str(tmp_path / "events.parquet")
    events.write.parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{pq}/*.parquet'")
    # sanity: generous cap succeeds
    assert len(con.execute(sql_betweenness_hubs(cap=64)).fetchall()) > 0
    for sql in (sql_betweenness_hubs(cap=1), sql_harmonic_hubs(cap=1)):
        with pytest.raises(Exception, match="truncated"):
            con.execute(sql).fetchall()
