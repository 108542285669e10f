"""Transcript synthesis + edge derivation tests (FIXTURES.md §1-2)."""

import pytest
from pyspark.sql import functions as F

from graphlab_spark import EdgeGraph
from graphlab_spark.sources.transcripts import (
    role_node,
    synthetic_transcripts,
    tool_node,
    transcripts_to_edges,
    turn_node,
    verify_turn_order_invariant,
)


def test_synthetic_transcripts_shape(spark):
    t = synthetic_transcripts(spark, n_convs=50)
    assert t.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert t.count() >= 100  # >= 2 turns per conversation
    per_conv = t.groupBy("conv_id").count()
    mn, mx = per_conv.agg(F.min("count"), F.max("count")).first()
    assert mn >= 2 and mx <= 64
    # roles alternate deterministically
    bad = t.filter(
        ((F.col("turn_idx") % 2 == 0) & (F.col("role") != "user"))
        | ((F.col("turn_idx") % 2 == 1) & (F.col("role") != "assistant"))
    ).count()
    assert bad == 0


def test_synthetic_transcripts_deterministic(spark):
    a = synthetic_transcripts(spark, n_convs=30).orderBy("conv_id", "turn_idx").collect()
    b = synthetic_transcripts(spark, n_convs=30).orderBy("conv_id", "turn_idx").collect()
    assert a == b


def test_per_turn_text_equality_invariant(spark):
    t = synthetic_transcripts(spark, n_convs=40)
    assert verify_turn_order_invariant(t) == 0


def test_edge_derivation_counts(spark):
    t = synthetic_transcripts(spark, n_convs=25).persist()
    edges = transcripts_to_edges(t)
    n_turns = t.count()
    n_convs = t.select("conv_id").distinct().count()
    n_tool_turns = t.filter(F.col("tool").isNotNull()).count()
    # sequence edges: turns - convs; role edges: one per turn; tool edges:
    # one per tool turn. Self-loop drop can only remove hash collisions
    # (none expected at this scale).
    assert edges.count() == (n_turns - n_convs) + n_turns + n_tool_turns
    t.unpersist()


def test_edge_derivation_is_deterministic_across_parallelism(spark):
    t = synthetic_transcripts(spark, n_convs=20)
    e1 = sorted(transcripts_to_edges(t).collect())
    e2 = sorted(transcripts_to_edges(t.repartition(13)).collect())
    assert e1 == e2


def test_sequence_edges_follow_turn_order(spark):
    rows = [
        ("x", 0, "user", "t0", None),
        ("x", 1, "assistant", "t1", "grep"),
        ("x", 2, "user", "t2", None),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.current_timestamp())
    edges = set((r.src, r.dst) for r in transcripts_to_edges(t).collect())
    n = lambda i: spark.range(1).select(turn_node(F.lit("x"), F.lit(i))).first()[0]
    role = lambda r: spark.range(1).select(role_node(F.lit(r))).first()[0]
    tool = spark.range(1).select(tool_node(F.lit("grep"))).first()[0]
    expected = {
        (n(0), n(1)), (n(1), n(2)),          # sequence
        (n(1), tool),                          # tool co-occurrence
        (n(0), role("user")), (n(1), role("assistant")), (n(2), role("user")),
    }
    assert edges == expected


def test_roles_are_hubs(spark):
    t = synthetic_transcripts(spark, n_convs=100)
    g = EdgeGraph(transcripts_to_edges(t), num_edge_partitions=8)
    n_turns = t.count()
    top = g.in_degrees.orderBy(F.desc("in_degree")).limit(2).collect()
    # the two role vertices absorb one edge per turn between them
    assert sum(r.in_degree for r in top) == n_turns
    g.unpersist()


def test_read_transcripts_parquet_and_table(spark, tmp_path):
    from graphlab_spark.sources import read_transcripts
    t = synthetic_transcripts(spark, n_convs=20)
    path = str(tmp_path / "tr.parquet")
    # extra column must be dropped; contract columns conformed
    t.withColumn("extra", F.lit(1)).write.parquet(path)
    got = read_transcripts(spark, path)
    assert got.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert got.count() == t.count()
    assert got.schema["turn_idx"].dataType.simpleString() == "int"
    got.createOrReplaceTempView("tr_contract_view")
    via_table = read_transcripts(spark, "tr_contract_view")
    assert via_table.count() == t.count()


def test_read_transcripts_missing_columns_raises(spark):
    from graphlab_spark.sources import read_transcripts
    bad = spark.createDataFrame([("c1", 0)], "conv_id string, turn_idx int")
    bad.createOrReplaceTempView("tr_bad_view")
    with pytest.raises(ValueError, match="lacks contract columns"):
        read_transcripts(spark, "tr_bad_view")


def test_read_transcripts_iceberg_dispatch_errors_clearly(spark):
    """Without the iceberg runtime jar the path must fail with a
    message naming the missing dependency, not an opaque stack."""
    from graphlab_spark.sources import read_transcripts
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_transcripts(spark, "cat.db.transcripts", source_format="iceberg")


def test_portable_corpus_matches_sql_twin(spark):
    """The portable synthetic corpus is byte-identical to its DuckDB
    regeneration (transcript_ctes) — the basis of the transcript_*
    contract oracles."""
    import duckdb
    from graphlab_spark.sources.transcripts import (
        synthetic_transcripts_portable, transcript_ctes)
    t = synthetic_transcripts_portable(spark, 150)
    sp = sorted(tuple(r) for r in t.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.col("ts").cast("long")).collect())
    dk = sorted(duckdb.sql(
        f"WITH {transcript_ctes(150)} SELECT conv_id, turn_idx, role, "
        "text, tool, ts_epoch FROM transcripts").fetchall())
    assert sp == dk


def test_portable_corpus_honors_contract_invariants(spark):
    from graphlab_spark.sources.transcripts import (
        synthetic_transcripts_portable, verify_turn_order_invariant)
    t = synthetic_transcripts_portable(spark, 100)
    assert verify_turn_order_invariant(t) == 0
    # roles alternate; turn counts within [2, 64]
    assert t.filter(
        ((F.col("turn_idx") % 2 == 0) & (F.col("role") != "user"))
        | ((F.col("turn_idx") % 2 == 1) & (F.col("role") != "assistant"))
    ).count() == 0
    per_conv = t.groupBy("conv_id").count()
    lo, hi = per_conv.agg(F.min("count"), F.max("count")).first()
    assert lo >= 2 and hi <= 64


def test_portable_edges_isomorphic_to_hash_edges(spark):
    """Portable-id induction is the same multigraph as the production
    xxhash64 induction: same edge count and identical out-degree
    multiset (vertex ids differ by a relabeling only)."""
    from graphlab_spark.sources.transcripts import (
        synthetic_transcripts_portable, transcripts_to_edges,
        transcripts_to_edges_portable)
    t = synthetic_transcripts_portable(spark, 80)
    a = transcripts_to_edges(t)
    b = transcripts_to_edges_portable(t)
    assert a.count() == b.count()

    def degree_multiset(e):
        return sorted(
            r["count"] for r in e.groupBy("src").count().collect())

    assert degree_multiset(a) == degree_multiset(b)


def test_tool_transitions_golden(spark):
    from graphlab_spark.sources.transcripts import tool_transitions
    rows = [
        # conv x: tool sequence grep -> sed -> grep (two transitions)
        ("x", 0, "user", "t", None, 100), ("x", 1, "assistant", "t", "grep", 101),
        ("x", 2, "user", "t", None, 102), ("x", 3, "assistant", "t", "sed", 103),
        ("x", 4, "user", "t", None, 104), ("x", 5, "assistant", "t", "grep", 105),
        # conv y: grep -> grep (self-transition); first call has no prev
        ("y", 0, "assistant", "t", "grep", 200), ("y", 1, "assistant", "t", "grep", 201),
        # conv z: single call -> contributes nothing
        ("z", 0, "assistant", "t", "awk", 300),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts long")
    got = {(r.prev_tool, r.tool): (r.n, r.p)
           for r in tool_transitions(t).collect()}
    assert got == {
        ("grep", "sed"): (1, 0.5), ("grep", "grep"): (1, 0.5),
        ("sed", "grep"): (1, 1.0),
    }


def test_turn_latency_by_role_golden(spark):
    from graphlab_spark.sources.transcripts import turn_latency_by_role
    rows = [
        ("x", 0, "user", "t", None, 100),
        ("x", 1, "assistant", "t", None, 103),   # assistant lat 3
        ("x", 2, "user", "t", None, 110),        # user lat 7
        ("y", 0, "user", "t", None, 500),        # no predecessor
        ("y", 1, "assistant", "t", None, 505),   # assistant lat 5
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts long")
    got = {r.role: (r.n, r.avg_sec, r.p50_sec, r.max_sec)
           for r in turn_latency_by_role(t).collect()}
    assert got == {"assistant": (2, 4.0, 4.0, 5), "user": (1, 7.0, 7.0, 7)}


def test_sessionize_golden(spark):
    from graphlab_spark.sources.transcripts import session_stats, sessionize
    rows = [
        # conv x: gap after turn 1 (ts 100,101, 5000,5001), gap after 3
        ("x", 0, "user", "t", None, 100),
        ("x", 1, "assistant", "t", None, 101),
        ("x", 2, "user", "t", None, 5000),
        ("x", 3, "assistant", "t", None, 5001),
        ("x", 4, "user", "t", None, 99999),
        # conv y: no gaps
        ("y", 0, "user", "t", None, 10),
        ("y", 1, "assistant", "t", None, 20),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts long")
    got = {(r.conv_id, r.turn_idx): r.session_idx
           for r in sessionize(t, gap_seconds=1800).collect()}
    assert got == {("x", 0): 0, ("x", 1): 0, ("x", 2): 1, ("x", 3): 1,
                   ("x", 4): 2, ("y", 0): 0, ("y", 1): 0}
    stats = {(r.conv_id, r.session_idx): (r.n_turns, r.span_sec)
             for r in session_stats(sessionize(t, gap_seconds=1800)).collect()}
    assert stats == {("x", 0): (2, 1), ("x", 1): (2, 1), ("x", 2): (1, 0),
                     ("y", 0): (2, 10)}


def test_sessionize_boundary_is_strict(spark):
    """delta == gap stays in the session; delta == gap+1 splits."""
    from graphlab_spark.sources.transcripts import sessionize
    rows = [("c", 0, "user", "t", None, 0),
            ("c", 1, "user", "t", None, 30),
            ("c", 2, "user", "t", None, 61)]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts long")
    got = {r.turn_idx: r.session_idx
           for r in sessionize(t, gap_seconds=30).collect()}
    assert got == {0: 0, 1: 0, 2: 1}


def test_transcripts_to_documents_ordering(spark):
    """Turn order must come from turn_idx, not input row order."""
    from graphlab_spark.sources.transcripts import transcripts_to_documents
    rows = [  # deliberately shuffled input order
        ("a", 2, "user", "gamma", None, 3),
        ("a", 0, "user", "alpha", None, 1),
        ("b", 0, "user", "solo", None, 9),
        ("a", 1, "assistant", "beta", None, 2),
        ("c", 0, "user", None, None, 5),  # all-NULL-text conversation
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts long").repartition(4)
    got = {r.doc_id: r.text for r in transcripts_to_documents(t).collect()}
    assert got == {"a": "alpha beta gamma", "b": "solo", "c": ""}

    # SQL twin agrees, including the all-NULL coalesce
    import duckdb
    from graphlab_spark.sources.transcripts import sql_transcripts_to_documents
    con = duckdb.connect()
    con.register("tsrc", t.toPandas())
    want = dict(con.execute(
        sql_transcripts_to_documents("tsrc")).fetchall())
    assert want == got
