"""Watermarked event-time windowed aggregations over transcript streams.

Complements ``streaming/ingest.py`` (engine extension; the reference
has no streaming subsystem — SURVEY §2.8).  These are the standard
monitoring aggregations a transcript firehose needs, expressed with
Structured Streaming's native watermark + window operators so late
data handling and state eviction are engine-managed:

- per-window turn counts and per-window distinct-role/tool activity;
- per-(window, role) message volume — the streaming analog of the
  batch role-hub degree view.

Late rows older than the watermark are dropped and their window state
evicted; with ``availableNow`` these same queries double as batch
backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_turn_counts(
    transcripts: DataFrame, window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """(window_start, window_end, n_turns, n_convs) per event-time
    window; append-mode-compatible (closed windows emit once)."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count("*").alias("n_turns"),
             F.approx_count_distinct("conv_id").alias("n_convs"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "n_turns", "n_convs")
    )


def windowed_role_volume(
    transcripts: DataFrame, window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """(window_start, role, n_turns, n_tool_calls) per window+role."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(F.count("*").alias("n_turns"),
             F.count("tool").alias("n_tool_calls"))
        .select(F.col("w.start").alias("window_start"), "role",
                "n_turns", "n_tool_calls")
    )


def run_windowed_counts_to_memory(spark, input_dir: str, checkpoint_dir: str,
                                  query_name: str = "turn_counts"):
    """Drain ``input_dir`` through windowed_turn_counts into an
    in-memory table (tests / interactive monitoring)."""
    from .ingest import TRANSCRIPT_SCHEMA
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
    agg = windowed_turn_counts(stream)
    return (
        agg.writeStream.format("memory").queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append").trigger(availableNow=True).start()
    )


def stream_exact_dedup(
    transcripts: DataFrame, watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop repeated turns across micro-batches
    on (conv_id, turn_idx, md5(text)) — the streaming analog of the
    batch pipeline's ``functions.dedup.exact_dup_groups`` keeper pass
    (first arrival wins).

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until
    the watermark passes it, so a continuous firehose holds
    O(keys-per-watermark-window) state instead of growing without
    bound — re-deliveries inside the watermark horizon (the realistic
    at-least-once-delivery failure mode) are suppressed; replays older
    than the watermark are out of contract, as with any watermarked
    operator.
    """
    keyed = transcripts.withColumn(
        "text_md5", F.md5(F.coalesce(F.col("text"), F.lit(""))))
    return (
        keyed.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["conv_id", "turn_idx", "text_md5"])
        .drop("text_md5")
    )


def stream_session_stats(
    transcripts: DataFrame, gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization: per-(conv_id, session) turn counts via
    Spark's native ``session_window`` — the engine-managed streaming
    twin of ``sources.transcripts.sessionize``.

    Returns (conv_id, session_start, session_end, n_turns, span_sec).
    A session closes once the watermark passes its last event + gap,
    so state is bounded and closed sessions emit exactly once in
    append mode.  ``session_end`` is the window end = last event +
    gap (Spark's session-window convention); ``span_sec`` subtracts
    the gap back out, so it is last event − first event, matching
    the batch ``session_stats`` span.

    Boundary semantics differ from the batch operator by strictness:
    ``session_window`` merges two turns when ``delta < gap`` (windows
    must overlap), while batch ``sessionize`` keeps ``delta == gap``
    in the same session.  Off-boundary data (the realistic case —
    gaps are thresholds, not exact hits) produces identical sessions;
    the equivalence test uses gap-safe fixtures.
    """
    import pandas as pd

    gap_sec = int(pd.Timedelta(gap).total_seconds())
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            "conv_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_turns",
            (F.col("w.end").cast("long") - F.col("w.start").cast("long")
             - F.lit(gap_sec)).alias("span_sec"),
        )
    )


def run_session_stats_to_memory(spark, input_dir: str, checkpoint_dir: str,
                                gap: str = "30 minutes",
                                watermark: str = "2 hours",
                                query_name: str = "session_stats",
                                max_files_per_trigger: int | None = None):
    """Drain ``input_dir`` through stream_session_stats into an
    in-memory table (tests / interactive monitoring)."""
    from .ingest import TRANSCRIPT_SCHEMA
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    agg = stream_session_stats(reader.parquet(input_dir), gap=gap,
                               watermark=watermark)
    return (
        agg.writeStream.format("memory").queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append").trigger(availableNow=True).start()
    )


def run_dedup_to_parquet(spark, input_dir: str, output_dir: str,
                         checkpoint_dir: str,
                         max_files_per_trigger: int | None = None):
    """Drain ``input_dir`` through stream_exact_dedup into parquet."""
    from .ingest import TRANSCRIPT_SCHEMA
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    deduped = stream_exact_dedup(reader.parquet(input_dir))
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append").trigger(availableNow=True).start()
    )
