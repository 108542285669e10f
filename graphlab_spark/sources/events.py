"""Event-log source: derive a link graph from the `events` table.

The engine's primary input contract is a transcripts-shaped table
(conv_id, turn_idx, role, text, tool, ts) — see ``transcripts.py``.
The driver's correctness testdata ships the same shape under different
names: ``events(event_id, ts, user_id, event_type, value, props)`` where
``user_id`` plays conv_id, (ts, event_id) plays turn ordering, and
``event_type`` plays the role/tool hub axis.  This module induces the
same two edge families the transcript ingest produces
(FIXTURES.md §2, reference analog: the pluggable ``line_parser`` load
path, ``/root/reference/src/graphlab/graph/distributed_graph.hpp:2333-2342``):

1. **sequence edges** — consecutive events of one user under stable
   (ts, event_id) ordering: ``event_id -> next event_id``;
2. **hub edges** — ``event_id -> type_node(event_type)``; event types
   are the power-law hubs that exercise skew handling.

Unlike the transcript path (which keys vertices by ``xxhash64``), vertex
ids here are *engine-portable*: sequence vertices are the event ids
themselves and hub vertices are negative dense ranks of the distinct
event types (``-row_number() over (order by event_type)``).  Every step
is expressible identically in ANSI SQL, which is what lets the driver's
DuckDB oracle replay the exact derivation for value-level comparison.

Scale notes: the only window is partitioned by ``user_id`` (per-user
event counts are bounded), so partitions stay small at any scale; the
event-type dimension is tiny and broadcast; everything else is narrow
column work pipelined into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..graph import EdgeGraph


def event_type_dim(events: DataFrame) -> DataFrame:
    """(event_type, type_node) with type_node = -dense rank by name.

    Deterministic and engine-portable (no hash functions), so the same
    dimension can be rebuilt by any SQL engine for verification.
    """
    w = Window.orderBy("event_type")
    return (
        events.select("event_type")
        .distinct()
        .select("event_type", (-F.row_number().over(w)).cast("long").alias("type_node"))
    )


def edges_from_events(events: DataFrame) -> DataFrame:
    """Induce the (src, dst) edge table from an event log.

    Mirrors ``transcripts_to_edges`` (sequence + hub co-occurrence
    families) with SQL-portable vertex ids.  Self-loops cannot arise
    (sequence edges connect distinct event ids; hub ids are negative).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        events.select(
            F.col("event_id").alias("src"),
            F.lead("event_id").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    hub = (
        events.join(F.broadcast(event_type_dim(events)), "event_type")
        .select(F.col("event_id").alias("src"), F.col("type_node").alias("dst"))
    )
    return seq.unionAll(hub)


def events_graph(spark: SparkSession, sf_dir: str, **kw) -> EdgeGraph:
    """Load ``{sf_dir}/events.parquet`` and build the induced EdgeGraph."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return EdgeGraph(edges_from_events(events), **kw)


# The DuckDB-replayable SQL twin of edges_from_events(), used by the
# driver's oracle and kept next to the Spark code so they evolve together.
# EDGES_CTES is the flattened CTE list (no leading WITH) so it composes
# under an outer ``WITH RECURSIVE`` — nested WITH blocks do not resolve
# inside recursive CTE scopes in DuckDB.
EDGES_CTES = """
etype_dim AS (
    SELECT event_type,
           -CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) AS type_node
    FROM (SELECT DISTINCT event_type FROM events)
), seq AS (
    SELECT event_id AS src,
           lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
    FROM events
), hub AS (
    SELECT e.event_id AS src, d.type_node AS dst
    FROM events e JOIN etype_dim d USING (event_type)
), edges AS (
    SELECT src, dst FROM seq WHERE dst IS NOT NULL
    UNION ALL
    SELECT src, dst FROM hub
)"""

EDGES_FROM_EVENTS_SQL = f"WITH {EDGES_CTES} SELECT src, dst FROM edges"
