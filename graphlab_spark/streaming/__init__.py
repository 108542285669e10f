"""Structured Streaming extensions (the reference has no streaming
subsystem — SURVEY §2.8; this is engine-added capability)."""

from .ingest import run_stream_to_parquet, stream_edges_from_transcripts

__all__ = ["stream_edges_from_transcripts", "run_stream_to_parquet"]
