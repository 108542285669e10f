"""Structured Streaming transcript ingest -> incremental edge stream.

The reference has no streaming subsystem (SURVEY §2.8): its closest
analogs are the async engine's dynamic message queue and the dynamic
local graph's incremental re-finalize
(``/root/reference/src/graphlab/engine/async_consistent_engine.hpp:61-120``,
``tests/synchronous_engine_test.cpp:78-86``).  This module is the
engine *extension* that covers the same need Spark-natively: a
transcript stream becomes an append-only edge stream that any of the
batch algorithms can consume per micro-batch snapshot.

Edge families mirror the batch ingest (``sources/transcripts.py``):

- **hub edges** (turn->tool, turn->role): stateless projections —
  they pipeline straight through the micro-batch;
- **sequence edges** (turn->next turn within a conversation): need
  *cross-batch state* (the last seen turn of each conversation), which
  is exactly Spark's arbitrary-stateful-processing surface:
  ``applyInPandasWithState`` keyed by ``conv_id``, with an event-time
  watermark bounding state for conversations that stop arriving.

The stateful function only carries (last_turn_idx) per conversation —
O(#active conversations) state, Arrow-batched, no per-row Python
anywhere outside the vectorized pandas kernel.  Node ids are attached
AFTER the stateful step with the same ``xxhash64`` column expressions
as the batch path, so streamed and batch-derived edges are identical.

Ordering contract: sequence edges assume per-conversation arrival is
monotone in ``turn_idx`` ACROSS micro-batches (within a batch any
order is fine — the kernel sorts).  A turn arriving after a
higher-indexed turn was already chained is SKIPPED for sequence edges
(its hub edges still stream): append mode cannot retract the
already-emitted edge to splice it in, and the alternative — emitting
against the stale state — would produce backwards edges and a
regressed chain.  Batch equivalence therefore holds exactly for
in-order (per conversation) streams, which is what a transcript
source keyed by conversation produces.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sources.transcripts import role_node, tool_node, turn_node

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
_PAIR_SCHEMA = "conv_id string, a int, b int"
_STATE_SCHEMA = "last_idx int"
DEFAULT_STATE_TTL_MS = 3_600_000  # suggested idle-state TTL (continuous)


def _make_sequence_pairs(state_ttl_ms: int | None):
    """Build the stateful kernel.  ``state_ttl_ms`` set => processing-
    time eviction of idle-conversation state (continuous streams);
    None => NoTimeout (availableNow backfills — a pending processing-
    time timeout keeps an availableNow query alive past its backlog,
    measured at ~2 min of idle wait per run)."""

    def _sequence_pairs(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Emit (conv_id, a, b) consecutive-turn pairs; carry the last
        seen turn index across micro-batches so conversation
        continuations bridge correctly."""
        (conv_id,) = key
        if state.hasTimedOut:
            # Idle conversation: drop its state; nothing to emit.
            state.remove()
            return
        last_idx = state.get[0] if state.exists else None
        # One conversation's rows may arrive as SEVERAL Arrow chunks in
        # arbitrary cross-chunk order — materialize and sort ONCE, else
        # a chunk-spanning conversation emits reversed/wrong edges.
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("turn_idx")
        idxs = pdf["turn_idx"].tolist()
        starts, ends = [], []
        for i in idxs:
            if last_idx is not None:
                if i <= last_idx:
                    # A turn arriving AFTER a higher-indexed turn of its
                    # conversation was already chained (out-of-order
                    # across micro-batches, still inside the watermark —
                    # the watermark drops old rows, it does not order
                    # them).  Append mode cannot retract the already-
                    # emitted edge to splice this turn in, so the only
                    # safe options are skip or corrupt: emitting here
                    # would produce a BACKWARDS edge and regress the
                    # chain state.  Skip — the turn's hub edges
                    # (turn->tool, turn->role) still stream through the
                    # stateless projections.
                    continue
                starts.append(last_idx)
                ends.append(i)
            last_idx = i
        if starts:
            yield pd.DataFrame({"conv_id": conv_id, "a": starts, "b": ends})
        if last_idx is not None:
            state.update((int(last_idx),))
            if state_ttl_ms is not None:
                state.setTimeoutDuration(state_ttl_ms)

    return _sequence_pairs


def stream_edges_from_transcripts(
    transcripts: DataFrame, watermark: str = "1 hour",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming DataFrame of (src, dst) edges from a streaming
    transcript DataFrame (same schema as the batch table).

    ``state_ttl_ms`` (continuous streams): evict idle-conversation
    state via ProcessingTimeTimeout after that much inactivity —
    without it a 24/7 stream grows the state store unboundedly.  Leave
    None for availableNow backfills: a pending processing-time timeout
    keeps a drained availableNow query alive instead of stopping it.
    Late rows beyond the event-time watermark are dropped upstream.
    """
    wm = transcripts.withWatermark("ts", watermark)
    seq_pairs = wm.groupBy("conv_id").applyInPandasWithState(
        _make_sequence_pairs(state_ttl_ms),
        outputStructType=_PAIR_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(GroupStateTimeout.NoTimeout if state_ttl_ms is None
                     else GroupStateTimeout.ProcessingTimeTimeout),
    )
    seq = seq_pairs.select(
        turn_node(F.col("conv_id"), F.col("a")).alias("src"),
        turn_node(F.col("conv_id"), F.col("b")).alias("dst"),
    )
    tool_e = transcripts.filter(F.col("tool").isNotNull()).select(
        turn_node(F.col("conv_id"), F.col("turn_idx")).alias("src"),
        tool_node(F.col("tool")).alias("dst"),
    )
    role_e = transcripts.select(
        turn_node(F.col("conv_id"), F.col("turn_idx")).alias("src"),
        role_node(F.col("role")).alias("dst"),
    )
    return seq.unionAll(tool_e).unionAll(role_e).filter(
        F.col("src") != F.col("dst"))


def refinalize(spark: Any, edges_dir: str, table: str,
               num_buckets: int | None = None):
    """The dynamic graph's ``finalize()`` after incremental growth
    (``dynamic_local_graph.hpp`` re-finalize;
    ``tests/synchronous_engine_test.cpp:78-86``): compact the
    append-only streamed edge directory — many small micro-batch files
    with no useful clustering — into the durable bucketed analytics
    layout, and return the ready-to-iterate ``EdgeGraph``.

    One shuffle, paid once per growth epoch and amortized over every
    subsequent analytics run (``EdgeGraph.save_bucketed``): at scale
    this is the compaction job a streaming ingest pipeline schedules
    between micro-batch windows, and the returned graph's
    per-superstep joins shuffle only vertex state.
    """
    from ..graph import EdgeGraph

    g = EdgeGraph(spark.read.parquet(edges_dir),
                  num_edge_partitions=num_buckets, persist=False)
    g.save_bucketed(table)
    return EdgeGraph.load_bucketed(spark, table)


def run_stream_to_parquet(
    spark: Any, input_dir: str, output_dir: str, checkpoint_dir: str,
    max_files_per_trigger: int | None = None, available_now: bool = True,
):
    """Convenience driver: watch ``input_dir`` for transcript parquet
    files, append derived edges to ``output_dir``.  With
    ``available_now`` the query drains the current backlog and stops —
    the mode tests and batch backfills use."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    transcripts = reader.parquet(input_dir)
    edges = stream_edges_from_transcripts(
        transcripts,
        state_ttl_ms=None if available_now else DEFAULT_STATE_TTL_MS)
    writer = (
        edges.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
