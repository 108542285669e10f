"""Physical-plan quality assertions: the scale behaviors the engine
promises must be visible in `.explain` output, not just hoped for.

- column pruning reaches the parquet scan (ReadSchema excludes unused
  columns — a scan reading all columns for a 2-column projection is a
  100 TB bug);
- predicate pushdown reaches the scan (PushedFilters);
- the tiny event-type dimension joins via broadcast, not shuffle;
- the per-superstep PageRank aggregation is partial+final (two
  HashAggregate levels), i.e. map-side combine absorbs hub fan-in.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_column_pruning_reaches_scan(spark):
    # other modules may have cached this table — a cached relation
    # replaces the FileScan and hides ReadSchema
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = docs.select("doc_id", F.length("text").alias("n"))
    plan = _plan(q)
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "lang" not in read_schema and "source" not in read_schema


def test_predicate_pushdown_reaches_scan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = docs.filter(F.col("n_chars") > 100).select("doc_id")
    plan = _plan(q)
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "n_chars" in pushed


def test_event_type_dim_is_broadcast(spark):
    from graphlab_spark.sources.events import edges_from_events
    events = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(edges_from_events(events))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_pagerank_message_agg_is_partial_final(spark):
    """The gather reduction must show two HashAggregate levels (partial
    map-side combine + final) — the reference's local-gather-then-
    master-merge realized natively."""
    from graphlab_spark import EdgeGraph
    from graphlab_spark.sources.parsers import load_synthetic_powerlaw
    g = EdgeGraph(load_synthetic_powerlaw(spark, 200), num_edge_partitions=4)
    contribs = (
        g.edges.join(g.out_degrees.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_degree")).alias("cw"))
    )
    state = g.vertices.select("id", F.lit(1.0).alias("rank"))
    msgs = (
        contribs.join(state, contribs["src"] == state["id"])
        .select("dst", (F.col("rank") * F.col("cw")).alias("m"))
        .groupBy("dst").agg(F.sum("m").alias("total"))
    )
    plan = _plan(msgs)
    assert plan.count("HashAggregate") >= 2
    g.unpersist()


def test_whole_stage_codegen_covers_text_ops(spark):
    from graphlab_spark.functions import text as T
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = docs.select(
        "doc_id", T.ws_token_count(F.col("text")).alias("t"),
        F.round(T.quality_score(F.col("text")), 6).alias("q"))
    # '*(n)' prefixes mark whole-stage-codegen stages in the plan string
    plan = _plan(q)
    assert "*(1)" in plan and "Project" in plan


def test_mplp_and_dd_node_reductions_are_partial_final(spark):
    """The new graphical-model reductions (MPLP node sums, DD votes)
    must keep the two-level HashAggregate shape (map-side combine +
    final) — the property that makes per-superstep shuffles |V|-sized
    instead of |E|-sized at scale."""
    from graphlab_spark import EdgeGraph
    from graphlab_spark.algos.dd import dd_state
    from graphlab_spark.algos.mplp import _node_sums, mplp_duals
    from graphlab_spark.sources.parsers import load_synthetic_powerlaw
    g = EdgeGraph(load_synthetic_powerlaw(spark, 120), num_edge_partitions=4)
    d = mplp_duals(g, iterations=1)
    assert _plan(_node_sums(d)).count("HashAggregate") >= 2
    s = dd_state(g, iterations=1)
    votes = (
        s.select(F.col("src").alias("id"), F.col("xi").alias("x"))
        .unionAll(s.select(F.col("dst").alias("id"), F.col("xj").alias("x")))
        .groupBy("id").agg(F.avg("x").alias("v1"))
    )
    assert _plan(votes).count("HashAggregate") >= 2
    g.unpersist()


def test_bsp_loop_disables_and_restores_aqe(spark):
    """run_bsp and the no_aqe_loop decorator turn adaptive execution
    off only for the loop's duration: the caller's setting is restored
    on normal exit and on error, and results are unchanged either way."""
    from pyspark.sql import functions as F

    from graphlab_spark.algos.pagerank import pagerank
    from graphlab_spark.graph import EdgeGraph
    from graphlab_spark.plans.superstep import no_aqe_loop, run_bsp

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    g = EdgeGraph(spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "src long, dst long"),
        num_edge_partitions=2)
    seen = {}

    def step(state, i):
        seen[i] = spark.conf.get("spark.sql.adaptive.enabled")
        return state, {}, i >= 1

    init = spark.range(3).select("id", F.lit(1.0).alias("rank"))
    run_bsp(init, step, max_supersteps=3)
    assert set(seen.values()) == {"false"}
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"

    # results identical with AQE left on inside the loop
    a = sorted(map(tuple, pagerank(g, tol=1e-6, resume=False)
                   .state.collect()))
    import graphlab_spark.plans.superstep as ss
    orig = ss.run_bsp

    def run_bsp_aqe(*args, **kw):
        kw["disable_aqe"] = False
        return orig(*args, **kw)

    ss.run_bsp = run_bsp_aqe
    try:
        import importlib
        pr = importlib.import_module("graphlab_spark.algos.pagerank")
        pr_orig = pr.run_bsp
        pr.run_bsp = run_bsp_aqe
        try:
            b = sorted(map(tuple, pagerank(g, tol=1e-6, resume=False)
                           .state.collect()))
        finally:
            pr.run_bsp = pr_orig
    finally:
        ss.run_bsp = orig
    assert a == b

    # decorator: restores on exception too
    @no_aqe_loop
    def boom(df):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        raise RuntimeError("x")

    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        boom(init)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    g.unpersist()


def test_no_aqe_scope_is_reentrant(spark):
    """Overlapping/nested _no_aqe scopes reference-count per session:
    AQE stays off until the LAST scope exits, which restores the value
    the FIRST captured."""
    from graphlab_spark.plans.superstep import _no_aqe

    df = spark.range(1)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    outer, inner = _no_aqe(df, True), _no_aqe(df, True)
    outer.__enter__()
    assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    inner.__enter__()
    # out-of-order exit (thread A finishing before thread B)
    outer.__exit__()
    assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    inner.__exit__()
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_one_job_per_superstep(spark):
    """The r5 fixed-cost contract: a PageRank superstep runs EXACTLY
    one Spark job (the localCheckpoint materialization the Observation
    convergence read rides on).  A second job per superstep means an
    implicit broadcast-exchange crept back into the loop (the
    autoBroadcastJoinThreshold pin in _no_aqe regressed) or an extra
    action was added to the step path."""
    from pyspark.sql import functions as F

    from graphlab_spark.algos.pagerank import pagerank
    from graphlab_spark.graph import EdgeGraph
    from graphlab_spark.sources.parsers import load_synthetic_powerlaw

    g = EdgeGraph(load_synthetic_powerlaw(spark, 500, seed=7),
                  num_edge_partitions=4)
    g.num_edges
    pagerank(g, fixed_supersteps=1, resume=False)  # warm all layouts
    store = spark.sparkContext._jsc.sc().statusStore()
    j0 = store.jobsList(None).size()
    pagerank(g, fixed_supersteps=4, resume=False)
    jobs = store.jobsList(None).size() - j0
    # 4 superstep jobs + at most one one-time contribution-layout
    # build; the broadcast regression this guards against doubles the
    # count (2 jobs/superstep = 8+)
    assert jobs <= 5, f"expected <=1 job/superstep (+1 build), got {jobs}/4"
    g.unpersist()
