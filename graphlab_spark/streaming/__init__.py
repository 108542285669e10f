"""Structured Streaming extensions (the reference has no streaming
subsystem — SURVEY §2.8; this is engine-added capability)."""

from .ingest import run_stream_to_parquet, stream_edges_from_transcripts
from .windows import (
    run_dedup_to_parquet,
    run_session_stats_to_memory,
    run_windowed_counts_to_memory,
    stream_exact_dedup,
    stream_session_stats,
    windowed_role_volume,
    windowed_turn_counts,
)

__all__ = [
    "stream_edges_from_transcripts", "run_stream_to_parquet",
    "windowed_turn_counts", "windowed_role_volume",
    "run_windowed_counts_to_memory", "run_dedup_to_parquet",
    "stream_exact_dedup", "stream_session_stats",
    "run_session_stats_to_memory",
]
