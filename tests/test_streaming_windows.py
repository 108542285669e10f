"""Watermarked windowed aggregations: append-mode emissions must equal
the batch aggregation for every window closed by the final watermark."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from graphlab_spark.sources.transcripts import synthetic_transcripts
from graphlab_spark.streaming.windows import (
    run_windowed_counts_to_memory,
    windowed_turn_counts,
)


def test_windowed_counts_match_batch(spark, tmp_path):
    t = synthetic_transcripts(spark, n_convs=100).persist()
    in_dir = tmp_path / "in"
    t.coalesce(1).write.parquet(str(in_dir))

    q = run_windowed_counts_to_memory(spark, str(in_dir),
                                      str(tmp_path / "ck"), "wtc")
    q.awaitTermination(120)
    streamed = {
        (r["window_start"], r["n_turns"])
        for r in spark.sql("SELECT * FROM wtc").collect()
    }

    batch = (
        t.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n_turns"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "n_turns")
    )
    max_ts = t.agg(F.max("ts")).first()[0]
    cutoff = max_ts - datetime.timedelta(minutes=30)
    closed = {
        (r["window_start"], r["n_turns"])
        for r in batch.filter(F.col("window_end") <= F.lit(cutoff)).collect()
    }
    assert closed, "fixture must close at least one window"
    assert closed <= streamed  # every closed window emitted, counts exact
    # nothing emitted that batch doesn't have
    all_batch = {(r["window_start"], r["n_turns"]) for r in batch.collect()}
    assert streamed <= all_batch
    t.unpersist()


def test_windowed_role_volume_schema(spark):
    from graphlab_spark.streaming.windows import windowed_role_volume
    t = synthetic_transcripts(spark, n_convs=20)
    out = windowed_role_volume(t)  # batch DataFrame path works too
    rows = out.collect()
    assert {r["role"] for r in rows} == {"user", "assistant"}
    assert all(r["n_tool_calls"] <= r["n_turns"] for r in rows)
    _ = windowed_turn_counts


def _write_turn_file(spark, in_dir, name, rows, mtime):
    """One parquet FILE (not dir) at in_dir/name — file sources don't
    recurse — with a controlled mtime (FileStreamSource drains oldest
    first)."""
    import os
    import shutil
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts_epoch long"
    ).select("conv_id", "turn_idx", "role", "text", "tool",
             F.timestamp_seconds("ts_epoch").alias("ts"))
    staging = in_dir / f"_stage_{name}"
    df.coalesce(1).write.parquet(str(staging))
    part = next(p for p in os.listdir(staging) if p.endswith(".parquet"))
    target = in_dir / f"{name}.parquet"
    shutil.move(str(staging / part), str(target))
    shutil.rmtree(staging)
    os.utime(target, (mtime, mtime))


def test_stream_session_stats_matches_batch(spark, tmp_path):
    """Cross-micro-batch session merging: one session's turns split
    across files must merge into a single emitted session, and every
    closed session must equal the batch sessionize twin (span_sec
    subtracts session_window's trailing gap, so spans match)."""
    import os
    from graphlab_spark.sources.transcripts import session_stats, sessionize
    from graphlab_spark.streaming.windows import run_session_stats_to_memory

    import time
    gap_s = 1800
    now = time.time()
    in_dir = tmp_path / "in"
    os.makedirs(in_dir)
    # file 1 (oldest): session starts
    _write_turn_file(spark, in_dir, "f1", [
        ("a", 0, "user", "t", None, 1000),
        ("b", 0, "user", "t", None, 1000),
    ], mtime=now - 300)
    # file 2: continues a's first session across the batch boundary,
    # opens a's second session, continues b
    _write_turn_file(spark, in_dir, "f2", [
        ("a", 1, "assistant", "t", None, 1100),
        ("a", 2, "user", "t", None, 10000),
        ("b", 1, "assistant", "t", None, 1200),
    ], mtime=now - 200)
    # sentinels: f3 pushes the watermark past every real session; f4
    # triggers one more micro-batch so that watermark actually flushes
    # them (watermarks take effect in the batch AFTER they advance).
    # The sentinel conversation's own session stays open.
    _write_turn_file(spark, in_dir, "f3", [
        ("zzz", 0, "user", "t", None, 10_000_000),
    ], mtime=now - 100)
    _write_turn_file(spark, in_dir, "f4", [
        ("zzz", 1, "user", "t", None, 10_000_100),
    ], mtime=now)

    q = run_session_stats_to_memory(
        spark, str(in_dir), str(tmp_path / "ck"), gap="30 minutes",
        query_name="sst", max_files_per_trigger=1)
    q.awaitTermination(120)
    streamed = sorted(
        (r.conv_id, r.ss, r.n_turns, r.span_sec)
        for r in spark.sql(
            "SELECT conv_id, CAST(session_start AS BIGINT) AS ss, "
            "n_turns, span_sec FROM sst").collect()
        if r.conv_id != "zzz"
    )
    assert streamed == [
        ("a", 1000, 2, 100), ("a", 10000, 1, 0), ("b", 1000, 2, 200),
    ]

    # batch twin over the same (non-sentinel) rows
    batch_rows = [
        ("a", 0, "user", "t", None, 1000), ("a", 1, "assistant", "t", None, 1100),
        ("a", 2, "user", "t", None, 10000),
        ("b", 0, "user", "t", None, 1000), ("b", 1, "assistant", "t", None, 1200),
    ]
    t = spark.createDataFrame(
        batch_rows, "conv_id string, turn_idx int, role string, text string, "
                    "tool string, ts long")
    got = sorted(
        (r.conv_id, r.n_turns, r.span_sec)
        for r in session_stats(sessionize(t, gap_seconds=gap_s)).collect())
    assert got == sorted((c, n, s) for c, _, n, s in streamed)
