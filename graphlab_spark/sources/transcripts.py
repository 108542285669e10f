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

from ..operators.portable import lcg_hash, sql_lcg_hash

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


def synthetic_transcripts_portable(
    spark: SparkSession, n_convs: int, n_tools: int | None = None, seed: int = 42
) -> DataFrame:
    """Contract-shaped synthetic corpus with *engine-portable* randomness.

    Same table shape and structural laws as ``synthetic_transcripts``
    (heavy-tailed turn counts capped at 64, alternating user/assistant
    roles, every 3rd assistant turn tool-tagged, byte-checkable
    ``text = 'txt-'||conv_id||'-'||turn_idx``), but every stochastic
    decision runs through ``operators.portable.lcg_hash`` in plain
    BIGINT arithmetic — no ``xxhash64``, no ``pow`` — so DuckDB can
    regenerate the identical corpus from ``transcript_ctes()`` for
    value-level oracle comparison.  The turn-count tail is an integer
    bucket law (90% short / 9% medium / 1% long, max 64) instead of the
    Pareto ``pow`` of the production generator: exact cross-engine
    equality beats distribution elegance for the verification corpus.
    """
    if n_tools is None:
        n_tools = max(4, n_convs // 50)
    convs = spark.range(n_convs).select(F.col("id").alias("i"))
    v = lcg_hash(F.col("i") * 65599 + F.lit(seed)) % 1000
    n_turns = (
        F.when(v < 900, 2 + v % 7)
        .when(v < 990, 9 + v % 31)
        .otherwise(40 + v % 25)
    ).cast("int")
    turns = convs.select(
        "i", F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx")
    )
    role = F.when(F.col("turn_idx") % 2 == 0, F.lit("user")).otherwise(
        F.lit("assistant")
    )
    has_tool = (F.col("turn_idx") % 2 == 1) & (
        F.expr("((turn_idx - 1) div 2) % 3") == 2
    )
    tool = F.when(
        has_tool,
        F.concat(
            F.lit("tool_"),
            (lcg_hash(F.col("i") * 131 + F.col("turn_idx")) % n_tools).cast("string"),
        ),
    )
    ts_epoch = (
        F.lit(1_700_000_000)
        + lcg_hash(F.col("i") * 31 + F.lit(seed + 1)) % 1_000_000
        + F.col("turn_idx")
    )
    conv_id = F.concat(F.lit("c"), F.col("i").cast("string"))
    return turns.select(
        conv_id.alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat(
            F.lit("txt-c"), F.col("i").cast("string"), F.lit("-"),
            F.col("turn_idx").cast("string"),
        ).alias("text"),
        tool.alias("tool"),
        F.timestamp_seconds(ts_epoch).alias("ts"),
    )


def transcripts_to_edges_portable(transcripts: DataFrame) -> DataFrame:
    """Edge induction with SQL-portable vertex ids (verification path).

    Same three edge families as ``transcripts_to_edges`` but vertex ids
    are plain arithmetic on the synthetic naming scheme instead of
    ``xxhash64`` (which no ANSI engine reproduces):

    - turn node:  ``conv_i * 64 + turn_idx`` (turn counts are capped at
      64, so this is collision-free) where ``conv_i`` is parsed from
      ``conv_id = 'c'||i``;
    - role hubs:  user → -1, assistant (or any other role) → -2;
    - tool hubs:  ``tool_k`` → ``-(10 + k)``.

    Production ingest stays on the hash path (``transcripts_to_edges``);
    this twin exists so the driver's DuckDB oracle can replay the exact
    derivation end-to-end over the north-rule input shape.  Requires
    the synthetic id scheme (``synthetic_transcripts*``).
    """
    t = transcripts.withColumn(
        "ci", F.expr("CAST(substr(conv_id, 2) AS BIGINT)")
    )
    turn = F.col("ci") * 64 + F.col("turn_idx")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = (
        t.select("conv_id", "ci", "turn_idx",
                 F.lead("turn_idx").over(w).alias("next_idx"))
        .filter(F.col("next_idx").isNotNull())
        .select(
            turn.alias("src"),
            (F.col("ci") * 64 + F.col("next_idx")).alias("dst"),
        )
    )
    tool_e = t.filter(F.col("tool").isNotNull()).select(
        turn.alias("src"),
        (-(F.lit(10) + F.expr("CAST(substr(tool, 6) AS BIGINT)"))).alias("dst"),
    )
    role_e = t.select(
        turn.alias("src"),
        F.when(F.col("role") == "user", F.lit(-1))
        .otherwise(F.lit(-2)).cast("long").alias("dst"),
    )
    return seq.unionAll(tool_e).unionAll(role_e)


def transcript_ctes(n_convs: int, n_tools: int | None = None, seed: int = 42) -> str:
    """Flattened CTE list (no leading WITH) regenerating the portable
    corpus and its induced edge table in ANSI SQL — the DuckDB twin of
    ``synthetic_transcripts_portable`` + ``transcripts_to_edges_portable``.

    Ends in a CTE named ``edges`` so every graph-oracle prelude in
    ``graphlab_spark.oracles`` / ``__spark_entry__`` composes over it
    unchanged (the same contract ``sources.events.EDGES_CTES`` honors).
    """
    if n_tools is None:
        n_tools = max(4, n_convs // 50)
    h_turns = sql_lcg_hash(f"(i * 65599 + {seed})")
    h_tool = sql_lcg_hash("(t.i * 131 + r.range)")
    h_ts = sql_lcg_hash(f"(t.i * 31 + {seed + 1})")
    return f"""
tconv AS (SELECT CAST(range AS BIGINT) AS i FROM range({n_convs})),
tlaw AS (SELECT i, {h_turns} % 1000 AS v FROM tconv),
tn AS (SELECT i, CASE WHEN v < 900 THEN 2 + v % 7
                      WHEN v < 990 THEN 9 + v % 31
                      ELSE 40 + v % 25 END AS n_turns FROM tlaw),
transcripts AS (
    SELECT 'c' || t.i AS conv_id,
           CAST(r.range AS INT) AS turn_idx,
           CASE WHEN r.range % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
           'txt-c' || t.i || '-' || r.range AS text,
           CASE WHEN r.range % 2 = 1 AND ((r.range - 1) // 2) % 3 = 2
                THEN 'tool_' || ({h_tool} % {n_tools})
           END AS tool,
           1700000000 + {h_ts} % 1000000 + r.range AS ts_epoch
    FROM tn t, range(64) r WHERE r.range < t.n_turns),
tparsed AS (SELECT CAST(substr(conv_id, 2) AS BIGINT) AS ci, * FROM transcripts),
tseq AS (SELECT ci * 64 + turn_idx AS src,
                ci * 64 + lead(turn_idx) OVER (PARTITION BY conv_id
                                               ORDER BY turn_idx) AS dst
         FROM tparsed),
ttool AS (SELECT ci * 64 + turn_idx AS src,
                 -(10 + CAST(substr(tool, 6) AS BIGINT)) AS dst
          FROM tparsed WHERE tool IS NOT NULL),
trole AS (SELECT ci * 64 + turn_idx AS src,
                 CASE WHEN role = 'user' THEN CAST(-1 AS BIGINT)
                      ELSE CAST(-2 AS BIGINT) END AS dst
          FROM tparsed),
edges AS (SELECT src, dst FROM tseq WHERE dst IS NOT NULL
          UNION ALL SELECT src, dst FROM ttool
          UNION ALL SELECT src, dst FROM trole)"""


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


def tool_transitions(transcripts: DataFrame) -> DataFrame:
    """Markov transition matrix over consecutive tool calls within each
    conversation: ``(prev_tool, tool, n, p)`` where ``n`` counts ordered
    tool-call pairs and ``p`` is the row-normalized transition
    probability (rounded to 6dp for engine portability).

    Scale shape: the lag window shuffles once on ``conv_id`` (the same
    key the ingest is already clustered by), the pair count is a
    partial+final hash agg, and the row normalization is a window over
    ``prev_tool`` on the already-aggregated matrix — at most
    ``n_tools²`` rows, so the second window is driver-trivial at any
    corpus size.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = (
        transcripts.filter(F.col("tool").isNotNull())
        .select("conv_id", "turn_idx", "tool",
                F.lag("tool").over(w).alias("prev_tool"))
        .filter(F.col("prev_tool").isNotNull())
    )
    counts = pairs.groupBy("prev_tool", "tool").agg(
        F.count("*").cast("long").alias("n"))
    row = Window.partitionBy("prev_tool")
    return counts.select(
        "prev_tool", "tool", "n",
        F.round(F.col("n") / F.sum("n").over(row), 6).alias("p"))


def sql_tool_transitions() -> str:
    """DuckDB twin of ``tool_transitions`` over the ``transcripts`` CTE
    from ``transcript_ctes`` (append after the flattened WITH list)."""
    return """
, tcalls AS (SELECT conv_id, turn_idx, tool,
                    lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                        AS prev_tool
             FROM transcripts WHERE tool IS NOT NULL)
, tmat AS (SELECT prev_tool, tool, CAST(count(*) AS BIGINT) AS n
           FROM tcalls WHERE prev_tool IS NOT NULL GROUP BY 1, 2)
SELECT prev_tool, tool, n,
       round(n / CAST(sum(n) OVER (PARTITION BY prev_tool) AS DOUBLE), 6) AS p
FROM tmat"""


def turn_latency_by_role(transcripts: DataFrame) -> DataFrame:
    """Inter-turn latency stats per responding role: for each turn with a
    predecessor in the same conversation, the latency is ``ts - prev_ts``;
    grouped by the responder's role → ``(role, n, avg_sec, p50_sec,
    max_sec)``.  Exact interpolated median (Spark ``percentile`` ==
    ANSI ``percentile_cont``) so the DuckDB twin hash-matches.

    Scale note: exact percentile materializes each group's latencies on
    one reducer — fine for a handful of roles; swap in
    ``percentile_approx`` when the group key is high-cardinality.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lat = (
        transcripts.select(
            "role",
            (F.col("ts").cast("long")
             - F.lag(F.col("ts").cast("long")).over(w)).alias("d"))
        .filter(F.col("d").isNotNull())
    )
    return lat.groupBy("role").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.avg("d"), 6).alias("avg_sec"),
        F.round(F.expr("percentile(d, 0.5)"), 6).alias("p50_sec"),
        F.max("d").alias("max_sec"))


def sql_turn_latency_by_role() -> str:
    """DuckDB twin of ``turn_latency_by_role`` (ts_epoch column in the
    synthetic CTE corpus is already epoch seconds)."""
    return """
, tlat AS (SELECT role,
                  ts_epoch - lag(ts_epoch) OVER (PARTITION BY conv_id
                                                 ORDER BY turn_idx) AS d
           FROM transcripts)
SELECT role, CAST(count(*) AS BIGINT) AS n,
       round(avg(d), 6) AS avg_sec,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY d), 6) AS p50_sec,
       max(d) AS max_sec
FROM tlat WHERE d IS NOT NULL GROUP BY role"""


def sessionize(transcripts: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Split each conversation into sessions on inactivity gaps.

    A turn starts a new session when it has no predecessor or when
    ``ts - prev_ts > gap_seconds``; the added ``session_idx`` column is
    the 0-based running session number within the conversation.

    Scale note: one bounded window per ``conv_id`` (same distribution
    the sequence-edge induction already shuffles on); the running sum
    rides the identical sort, so sessionizing a 10^12-turn table costs
    one shuffle shared with every other per-conversation operator.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    epoch = F.col("ts").cast("long")
    delta = epoch - F.lag(epoch).over(w)
    is_new = F.when(delta.isNull() | (delta > gap_seconds), 1).otherwise(0)
    running = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return transcripts.withColumn("session_idx", (running - 1).cast("int"))


def session_stats(sessionized: DataFrame) -> DataFrame:
    """Per (conv_id, session_idx): turn count and wall-clock span."""
    epoch = F.col("ts").cast("long")
    return sessionized.groupBy("conv_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_turns"),
        (F.max(epoch) - F.min(epoch)).alias("span_sec"),
    )


def sql_sessionize(
    gap_seconds: int = 1800,
    source: str = "transcripts",
    epoch: str = "ts_epoch",
    cols: str = "conv_id, turn_idx, ts_epoch",
) -> str:
    """ANSI twin of ``sessionize`` (SELECT; epoch column is seconds).

    ``cols`` lists the source columns to carry through (the helper
    ``delta`` column is NOT leaked, matching the Spark operator's
    schema contract of source columns + ``session_idx``)."""
    return f"""
SELECT {cols},
       CAST(sum(CASE WHEN d.delta IS NULL OR d.delta > {gap_seconds}
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY d.conv_id ORDER BY d.turn_idx
                  ROWS UNBOUNDED PRECEDING) - 1 AS INT) AS session_idx
FROM (SELECT s.*, {epoch} - lag({epoch}) OVER (PARTITION BY s.conv_id
                                               ORDER BY s.turn_idx) AS delta
      FROM {source} s) d"""


def transcripts_to_documents(transcripts: DataFrame) -> DataFrame:
    """Bridge into the document pipeline: one document per conversation,
    text = turn texts joined by single spaces under stable
    (conv_id, turn_idx) ordering → ``(doc_id, text)``.

    This is what lets every corpus operator (exact/MinHash/SimHash
    dedup, quality scoring, decontamination, packing) run over
    transcript data: conversations become documents.  Pure
    aggregate-of-struct work — the sort happens inside
    ``array_sort`` per group, never as a global sort.
    """
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
        lambda x: x["text"],
    )
    return transcripts.groupBy(F.col("conv_id").alias("doc_id")).agg(
        F.array_join(ordered, " ").alias("text")
    )


def sql_transcripts_to_documents(source: str = "transcripts") -> str:
    """ANSI twin of ``transcripts_to_documents`` (SELECT).

    ``coalesce(..., '')`` matches Spark's ``array_join`` on an
    all-NULL-text conversation (both engines skip NULL texts when at
    least one is non-NULL, but ``string_agg`` of only NULLs is NULL
    while ``array_join`` yields '')."""
    return (
        "SELECT conv_id AS doc_id, "
        "coalesce(string_agg(text, ' ' ORDER BY turn_idx), '') AS text "
        f"FROM {source} GROUP BY conv_id"
    )


def verify_turn_order_invariant(transcripts: DataFrame) -> int:
    """Per-turn text equality under stable turn ordering: re-derive the
    expected text from (conv_id, turn_idx) and count mismatches (must be 0
    for the synthetic corpus)."""
    expected = F.concat(
        F.lit("txt-"), "conv_id", F.lit("-"), F.col("turn_idx").cast("string")
    )
    return transcripts.filter(F.col("text") != expected).count()
