"""Transcript source: synthetic generator + transcript→edge ingest.

Per the project's input contract, the engine's primary input is an
Iceberg-style table of multi-turn conversation / agent transcripts:

    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

The reference's equivalent surface is the pluggable ``line_parser`` load
path (``/root/reference/src/graphlab/graph/distributed_graph.hpp:2333-2342``);
here the "parse" is a deterministic, fully vectorized co-occurrence
induction (FIXTURES.md §2) — no per-row Python anywhere.

Edge families (node ids are xxhash64 of tagged keys):

1. sequence:  node('t', conv, i) -> node('t', conv, i+1) for consecutive
   turns under stable (conv_id, turn_idx) ordering;
2. tool co-occurrence: turn -> node('tool', tool) where tool IS NOT NULL;
3. role co-occurrence: turn -> node('role', role)  (roles are extreme
   hubs — this is what exercises skew handling).

Scale notes: the only window is partitioned by ``conv_id`` (conversations
are bounded at tens of turns, so partitions stay tiny even at 10^12
turns); everything else is narrow column work that Catalyst pipelines
into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def turn_node(conv_id, turn_idx):
    """Vertex id of a turn: xxhash64('t', conv_id, turn_idx)."""
    return F.xxhash64(F.lit("t"), conv_id, turn_idx)


def tool_node(tool):
    return F.xxhash64(F.lit("tool"), tool)


def role_node(role):
    return F.xxhash64(F.lit("role"), role)


def read_transcripts(
    spark: SparkSession,
    source: str,
    source_format: str | None = None,
) -> DataFrame:
    """Load a transcript table from any deployment format and conform it
    to the input contract ``(conv_id string, turn_idx int, role string,
    text string, tool string, ts timestamp)``.

    - ``source_format='iceberg'`` — the production path at 10^12-turn
      scale: an Iceberg catalog table (snapshot isolation, partition
      pruning on the table's own partition spec, e.g. days(ts) /
      bucket(conv_id)).  Needs the ``iceberg-spark-runtime`` jar and a
      catalog configured on the session; this sandbox ships neither,
      so the path raises a clear error here and is exercised only for
      dispatch — everything downstream is format-agnostic because all
      derivations start from this one conformed DataFrame.
    - ``source_format='parquet'`` (or any path containing ``/``) —
      direct file reads, what the tests and bench use.
    - no format, no ``/`` — a session-catalog table name.

    Extra columns are dropped; missing contract columns raise.
    """
    if source_format == "iceberg":
        try:
            df = spark.read.format("iceberg").load(source)
        except Exception as e:  # noqa: BLE001 — surface the real cause
            raise RuntimeError(
                "Iceberg read failed — the iceberg-spark-runtime jar and "
                "a catalog (spark.sql.catalog.*) must be on the session "
                f"(reading {source!r})"
            ) from e
    elif source_format is not None:
        df = spark.read.format(source_format).load(source)
    elif "/" in source or source.endswith(".parquet"):
        df = spark.read.parquet(source)
    else:
        df = spark.table(source)
    missing = [c for c in TRANSCRIPT_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"transcript source {source!r} lacks contract columns {missing}"
        )
    return df.select(
        F.col("conv_id").cast("string").alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("role").cast("string").alias("role"),
        F.col("text").cast("string").alias("text"),
        F.col("tool").cast("string").alias("tool"),
        F.col("ts").cast("timestamp").alias("ts"),
    )


def synthetic_transcripts(
    spark: SparkSession, n_convs: int, n_tools: int | None = None, seed: int = 42
) -> DataFrame:
    """Deterministic synthetic transcript table (FIXTURES.md §1).

    Per-conversation turn count follows a truncated heavy-tail law derived
    from a hash-uniform (seeded), capped at 64; roles alternate
    user/assistant; every 3rd assistant turn carries a tool name drawn
    from ``n_tools`` tools (tools are the power-law hubs);
    ``text = 'txt-'||conv_id||'-'||turn_idx`` so per-turn text equality is
    checkable byte-for-byte after ingest.
    """
    if n_tools is None:
        n_tools = max(4, n_convs // 100)
    convs = spark.range(n_convs).select(
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("conv_id")
    )
    # u in [0,1) from a seeded hash; heavy tail: 2 + floor((1-u)^(-1/0.3)) - 1,
    # capped at 64 turns (Zipf-ish alpha=1.3 as in FIXTURES.md).
    u = (F.pmod(F.xxhash64(F.col("conv_id"), F.lit(seed)), F.lit(1_000_000)) + 0.5) / 1_000_000.0
    # Clamp in the double domain BEFORE the int cast: the Pareto tail can
    # exceed int range for u near 1, and Spark's ANSI cast would overflow.
    n_turns = F.floor(
        F.least(F.lit(64.0), F.lit(1.0) + F.pow(F.lit(1.0) - u, F.lit(-1.0 / 0.3)))
    ).cast("int")
    turns = convs.select(
        "conv_id", F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx")
    )
    role = F.when(F.col("turn_idx") % 2 == 0, F.lit("user")).otherwise(F.lit("assistant"))
    assistant_ordinal = (F.col("turn_idx") - 1) / 2
    has_tool = (F.col("turn_idx") % 2 == 1) & (
        F.pmod(assistant_ordinal.cast("long"), F.lit(3)) == 2
    )
    tool = F.when(
        has_tool,
        F.concat(
            F.lit("tool_"),
            F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(n_tools)).cast("string"),
        ),
    )
    ts = F.timestamp_seconds(
        F.lit(1_700_000_000)
        + F.pmod(F.xxhash64("conv_id", F.lit("ts"), F.lit(seed)), F.lit(1_000_000))
        + F.col("turn_idx")
    )
    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat(F.lit("txt-"), "conv_id", F.lit("-"), F.col("turn_idx").cast("string")).alias(
            "text"
        ),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def transcripts_to_edges(transcripts: DataFrame, weighted: bool = False) -> DataFrame:
    """Derive the link graph from a transcript table (FIXTURES.md §2).

    Returns ``edges(src long, dst long[, w double])``. Self-loops are
    dropped (as the reference's parsers do,
    ``builtin_parsers.hpp:74,94,137``); duplicates are kept.
    """
    t = transcripts
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    nxt = F.lead("turn_idx").over(w)
    seq = (
        t.select("conv_id", "turn_idx", nxt.alias("next_idx"))
        .filter(F.col("next_idx").isNotNull())
        .select(
            turn_node(F.col("conv_id"), F.col("turn_idx")).alias("src"),
            turn_node(F.col("conv_id"), F.col("next_idx")).alias("dst"),
        )
    )
    tool_e = t.filter(F.col("tool").isNotNull()).select(
        turn_node(F.col("conv_id"), F.col("turn_idx")).alias("src"),
        tool_node(F.col("tool")).alias("dst"),
    )
    role_e = t.select(
        turn_node(F.col("conv_id"), F.col("turn_idx")).alias("src"),
        role_node(F.col("role")).alias("dst"),
    )
    edges = seq.unionAll(tool_e).unionAll(role_e).filter(F.col("src") != F.col("dst"))
    if weighted:
        edges = edges.withColumn("w", F.lit(1.0))
    return edges


def verify_turn_order_invariant(transcripts: DataFrame) -> int:
    """Per-turn text equality under stable turn ordering: re-derive the
    expected text from (conv_id, turn_idx) and count mismatches (must be 0
    for the synthetic corpus)."""
    expected = F.concat(
        F.lit("txt-"), "conv_id", F.lit("-"), F.col("turn_idx").cast("string")
    )
    return transcripts.filter(F.col("text") != expected).count()
