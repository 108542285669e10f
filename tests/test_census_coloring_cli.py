"""Directed triangle census, greedy coloring, and the CLI entry point.

Census goldens are hand-derived from the reference's per-edge
intersection semantics (``directed_triangle_count.cpp:589-636``) on the
fixture graph — see the derivation table in each test.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from graphlab_spark import EdgeGraph
from graphlab_spark.algos.coloring import count_conflicts, greedy_coloring
from graphlab_spark.algos.directed_triangles import (
    directed_census_totals,
    directed_triangle_census,
)


def _census_map(df):
    return {
        r["id"]: (r["in_triangles"], r["out_triangles"],
                  r["through_triangles"], r["cycle_triangles"])
        for r in df.collect()
    }


def test_census_fixture_goldens(fixture_graph):
    """Fixture graph 0→5,1→0,1→5,2→0,2→5,3→0,3→5; triangles {0,5,x}.

    Per reference semantics: edge (0→5) has st_st=|in(0)∩in(5)|=3 so
    vertex 0 gains through=3 and vertex 5 gains in=3; each edge (x→0)
    has s_s=|out(x)∩out(0)|=|{0,5}∩{5}|=1 so x gains out=1; no cycles.
    """
    got = _census_map(directed_triangle_census(fixture_graph))
    assert got == {
        0: (0, 0, 3, 0),
        1: (0, 1, 0, 0),
        2: (0, 1, 0, 0),
        3: (0, 1, 0, 0),
        5: (3, 0, 0, 0),
    }


def test_census_directed_cycle(spark):
    """0→1→2→0: each edge has st_s=1, so each vertex has cycle=1."""
    g = EdgeGraph(spark.createDataFrame([(0, 1), (1, 2), (2, 0)],
                                        "src long, dst long"),
                  num_edge_partitions=2)
    got = _census_map(directed_triangle_census(g))
    assert got == {0: (0, 0, 0, 1), 1: (0, 0, 0, 1), 2: (0, 0, 0, 1)}
    totals = directed_census_totals(g)
    assert totals == {"in_triangles": 0, "out_triangles": 0,
                      "through_triangles": 0, "cycle_triangles": 3}
    g.unpersist()


def test_census_reciprocal_edges(spark):
    """0↔1, 1→2, 0→2: out(0) counts both w-closings; reciprocal pair
    doubles the directed configurations exactly as the reference's
    set intersections do."""
    g = EdgeGraph(
        spark.createDataFrame([(0, 1), (1, 0), (1, 2), (0, 2)],
                              "src long, dst long"),
        num_edge_partitions=2)
    got = _census_map(directed_triangle_census(g))
    # hand check via reference rule:
    # e(0→1): s_s=|{1,2}∩{0,2}|=1 → out(0)+=1 ; st_st=|{1}∩{0}|=0 ;
    #         st_s=|in(0)∩out(1)|=|{1}∩{0,2}|=0 ; in(1)+=st_st=0
    # e(1→0): s_s=1 → out(1)+=1 ; st_st=0 ; st_s=|{0}∩{1,2}|=0 ; in(0)+=0
    # e(1→2): s_s=|{0,2}∩{}|=0 ; st_st=|{0}∩{1,0}|=1 → through(1)+=1 ;
    #         st_s=|in(1)∩out(2)|=0 ; in(2)+=st_st=1
    # e(0→2): s_s=0 ; st_st=|{1}∩{1,0}|=1 → through(0)+=1 ;
    #         st_s=|{1}∩{}|=0 ; in(2)+=1
    assert got == {0: (0, 1, 1, 0), 1: (0, 1, 1, 0), 2: (2, 0, 0, 0)}
    g.unpersist()


def test_coloring_proper_and_deterministic(fixture_graph):
    c1 = greedy_coloring(fixture_graph)
    assert count_conflicts(fixture_graph, c1) == 0
    assert c1.count() == 5
    c2 = greedy_coloring(fixture_graph)
    assert sorted(map(tuple, c1.collect())) == sorted(map(tuple, c2.collect()))
    # fixture graph is bipartite-ish (star over {0,5}) — chromatic <= 3
    assert c1.agg(F.max("color")).first()[0] <= 2


def test_coloring_triangle_needs_three(spark):
    g = EdgeGraph(spark.createDataFrame([(0, 1), (1, 2), (2, 0)],
                                        "src long, dst long"),
                  num_edge_partitions=2)
    c = greedy_coloring(g)
    assert count_conflicts(g, c) == 0
    assert c.select("color").distinct().count() == 3
    g.unpersist()


def test_cli_pagerank_tsv(spark, tmp_path, capsys):
    from graphlab_spark.cli import main
    tsv = tmp_path / "edges.tsv"
    tsv.write_text("0\t5\n1\t0\n1\t5\n2\t0\n2\t5\n3\t0\n3\t5\n")
    out = tmp_path / "ranks"
    rc = main(["pagerank", "--input", str(tsv), "--format", "tsv",
               "--output", str(out), "--tol", "1e-6"])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["algo"] == "pagerank" and metrics["converged"]
    ranks = {r["id"]: r["rank"]
             for r in spark.read.parquet(str(out)).collect()}
    assert abs(ranks[5] - 0.6313125) < 1e-6
    assert abs(ranks[0] - 0.34125) < 1e-6


def test_cli_census_and_coloring(spark, tmp_path, capsys):
    from graphlab_spark.cli import main
    tsv = tmp_path / "e.tsv"
    tsv.write_text("0\t1\n1\t2\n2\t0\n")
    assert main(["census", "--input", str(tsv), "--format", "tsv"]) == 0
    assert main(["coloring", "--input", str(tsv), "--format", "tsv"]) == 0
    lines = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert {ln["algo"] for ln in lines} == {"census", "coloring"}


def test_cli_convert_roundtrip(spark, tmp_path):
    """format_convert parity: tsv -> snap via the convert verb, then a
    reload must reproduce the edge multiset."""
    from graphlab_spark.cli import main
    from graphlab_spark.sources.parsers import load_format
    src = tmp_path / "in.tsv"
    src.write_text("1\t2\n2\t3\n3\t1\n")
    out = tmp_path / "out_snap"
    rc = main(["convert", "--input", str(src), "--format", "tsv",
               "--output", str(out), "--output-format", "snap"])
    assert rc == 0
    back = sorted(map(tuple, load_format(spark, str(out), "snap").collect()))
    assert back == [(1, 2), (2, 3), (3, 1)]


def test_cli_extension_pagerank(spark, tmp_path, capsys):
    """The extension verb (extension_main.cpp analog): PageRank
    declared entirely on the command line reproduces the builtin's
    fixture values."""
    from graphlab_spark.cli import main
    tsv = tmp_path / "edges_ext.tsv"
    tsv.write_text("0\t5\n1\t0\n1\t5\n2\t0\n2\t5\n3\t0\n3\t5\n")
    out = tmp_path / "ext_ranks"
    rc = main([
        "extension", "--input", str(tsv), "--format", "tsv",
        "--output", str(out), "--tol", "1e-6",
        "--init", "cast(1.0 as double)",
        "--gather", "val / out_degree",
        "--merge", "sum",
        "--apply", "0.15 + 0.85 * coalesce(total, cast(0.0 as double))",
    ])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["algo"] == "extension" and metrics["converged"]
    vals = {r["id"]: r["val"]
            for r in spark.read.parquet(str(out)).collect()}
    assert abs(vals[5] - 0.6313125) < 1e-6
    assert abs(vals[0] - 0.34125) < 1e-6


def test_cli_ingress_report(spark, tmp_path, capsys):
    from graphlab_spark.cli import main
    tsv = tmp_path / "edges.tsv"
    tsv.write_text("0\t5\n1\t0\n1\t5\n2\t0\n2\t5\n3\t0\n3\t5\n")
    rc = main(["ingress", "--input", str(tsv), "--format", "tsv",
               "--strategy", "random,grid,hybrid", "--nshards", "4"])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["algo"] == "ingress" and metrics["edges"] == 7
    by_strategy = {r["strategy"]: r for r in metrics["reports"]}
    assert set(by_strategy) == {"random", "grid", "hybrid"}
    for r in by_strategy.values():
        assert r["nshards"] == 4
        assert 1.0 <= r["replication_factor"] <= 4.0
        assert r["edge_balance"] >= 1.0


def test_cli_stitch_match_graph(spark, tmp_path, capsys):
    from graphlab_spark.cli import main
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu!"),
         (1, "unrelated words entirely different text with nothing shared "
             "in any spot")],
        "doc_id long, text string")
    src = tmp_path / "docs"
    docs.write.parquet(str(src))
    out = tmp_path / "matches"
    rc = main(["stitch", "--documents", str(src), "--output", str(out)])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # 2 docs + 1 planted copy of doc 0; the copy pairs with its original
    assert metrics["images"] == 3 and metrics["match_edges"] == 1
    assert metrics["panoramas"] == 1 and metrics["grouped_images"] == 2
    edge = spark.read.parquet(str(out)).collect()[0]
    assert (edge["img_a"], edge["img_b"]) == (-1, 0)


def test_cli_gibbs(spark, tmp_path, capsys):
    """gibbs verb: chromatic sampler over a tsv edge graph, printing
    the reference's run_statistics block (nsamples/nchanges/loglik)."""
    from graphlab_spark.cli import main
    tsv = tmp_path / "edges.tsv"
    tsv.write_text("0\t1\n1\t2\n2\t3\n3\t4\n4\t0\n")
    out = tmp_path / "asg"
    rc = main(["gibbs", "--input", str(tsv), "--format", "tsv",
               "--output", str(out), "--sweeps", "2", "--seed", "7"])
    assert rc == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["algo"] == "gibbs"
    assert m["nsamples"] == 2 * 5  # every vertex sampled each sweep
    assert m["min_samples"] == m["max_samples"] == 2
    assert isinstance(m["loglik"], float) and m["loglik"] < 0.0
    rows = spark.read.parquet(str(out)).collect()
    assert {r["id"] for r in rows} == {0, 1, 2, 3, 4}
    assert all(r["asg"] in (0, 1) for r in rows)


def test_cli_factor_bp(spark, tmp_path, capsys):
    """factor_bp verb: alchemy model file -> N-ary BP -> beliefs
    parquet, in both projection modes."""
    from graphlab_spark.cli import main
    model = tmp_path / "m.alchemy"
    model.write_text(
        "variables:\nx\ny\nz\t3\nfactors:\n"
        "z // 0.3 0.2 0.1\n"
        "x / y / z // 0.1 0.9 0.3 0.2 0.0 0.4 0.1 0.3 0.2 1.6 0.5 0.2\n")
    out = tmp_path / "beliefs"
    rc = main(["factor_bp", "--model", str(model), "--output", str(out),
               "--iterations", "15", "--bound", "1e-10"])
    assert rc == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["algo"] == "factor_bp" and m["mode"] == "max"
    assert m["variables"] == 3 and m["factors"] == 2
    assert m["converged"] is True
    rows = {r["id"]: r for r in spark.read.parquet(str(out)).collect()}
    # unique MAP of this model is (x, y, z) = (1, 0, 2)
    assert (rows[0]["label"], rows[1]["label"], rows[2]["label"]) == (1, 0, 2)
    rc = main(["factor_bp", "--model", str(model), "--bp-mode", "sum",
               "--iterations", "15", "--bound", "1e-10"])
    assert rc == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["mode"] == "sum" and m["converged"] is True


def test_cli_gibbs_checkpoint_resume(spark, tmp_path, capsys):
    """--checkpoint-dir/--resume must actually reach the sampler (the
    verb once built the manager and never passed it)."""
    from graphlab_spark.cli import main
    from graphlab_spark.plans.checkpoint import CheckpointManager
    tsv = tmp_path / "edges.tsv"
    tsv.write_text("0\t1\n1\t2\n2\t3\n3\t4\n4\t0\n")
    ck = tmp_path / "ck"
    rc = main(["gibbs", "--input", str(tsv), "--format", "tsv",
               "--sweeps", "2", "--seed", "7",
               "--checkpoint-dir", str(ck), "--checkpoint-every", "2"])
    assert rc == 0
    manifests = CheckpointManager(str(ck)).manifests()
    assert manifests, "gibbs run wrote no checkpoints"
    # a longer resumed run picks the chain up instead of restarting
    rc = main(["gibbs", "--input", str(tsv), "--format", "tsv",
               "--sweeps", "3", "--seed", "7", "--resume",
               "--checkpoint-dir", str(ck), "--checkpoint-every", "2"])
    assert rc == 0
    capsys.readouterr()
