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
