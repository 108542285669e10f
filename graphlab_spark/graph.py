"""EdgeGraph — the engine's distributed property-graph abstraction.

The reference models a graph as ``distributed_graph<VertexData, EdgeData>``
with a vertex-cut partitioning and master/mirror vertex replication
(``/root/reference/src/graphlab/graph/distributed_graph.hpp:178-293``).
The Spark-native equivalent is two DataFrames:

- ``edges(src long, dst long[, extra edge cols])`` — hash-partitioned by
  ``src``; the per-superstep join of vertex state onto edges plays the
  role of master->mirror synchronization
  (``synchronous_engine.hpp:1796-1806``).
- vertex state DataFrames ``(id long, ...)`` produced per algorithm.

``finalize()``'s global degree bookkeeping
(``distributed_graph.hpp:460-466``) maps to cached degree DataFrames.

Self-loops are dropped at construction, matching the reference's builtin
parsers (``builtin_parsers.hpp:74,94,137``). Duplicate edges are kept
(the reference does not dedupe; triangle counting canonicalizes
explicitly — ``simple_undirected_triangle_count.cpp:314-316``).
"""

from __future__ import annotations

from functools import cached_property

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC, DST, ID = "src", "dst", "id"


class EdgeGraph:
    """A directed graph as an edge DataFrame, with cached structural views.

    ``num_edge_partitions`` controls the hash partitioning of the edge
    table on ``src`` — the analog of the reference's edge-placement
    ingress. Keeping edges persisted with a stable partitioning lets the
    per-superstep ``state ⋈ edges`` join reuse the edge-side layout and
    shuffle only the (much smaller) vertex-state side.
    """

    def __init__(
        self,
        edges: DataFrame,
        num_edge_partitions: int | None = None,
        drop_self_loops: bool = True,
        persist: bool = True,
        pre_partitioned: bool = False,
    ) -> None:
        self.spark: SparkSession = edges.sparkSession
        if drop_self_loops:
            edges = edges.filter(F.col(SRC) != F.col(DST))
        if num_edge_partitions is None:
            num_edge_partitions = int(
                self.spark.conf.get("spark.sql.shuffle.partitions", "32")
            )
        self.num_edge_partitions = num_edge_partitions
        if pre_partitioned:
            # The input already carries a hash layout on `src` (e.g. a
            # bucketed table from save_bucketed) — re-shuffling it here
            # would pay exactly the cost bucketing exists to amortize.
            self.edges = edges
        else:
            self.edges = edges.repartition(num_edge_partitions, SRC)
        if persist:
            self.edges = self.edges.persist()

    # -- constructors -----------------------------------------------------

    @classmethod
    def from_pairs(cls, df: DataFrame, src_col: str, dst_col: str, **kw) -> "EdgeGraph":
        return cls(
            df.select(
                F.col(src_col).cast("long").alias(SRC),
                F.col(dst_col).cast("long").alias(DST),
            ),
            **kw,
        )

    # -- bucketed persistence ----------------------------------------------

    def save_bucketed(
        self, table: str, path: str | None = None, mode: str = "overwrite"
    ) -> None:
        """Persist the edge table hash-bucketed by ``src`` (parquet,
        ``num_edge_partitions`` buckets, sorted by (src, dst) within
        each bucket).

        The analog of the reference's one-time ingress/finalize edge
        placement (``distributed_graph.hpp:460-466``) made durable: at
        100 TB, every analytics run over a plain edge file pays a full
        repartition shuffle of the *edge* side before its first
        superstep.  A bucketed table records the hash layout in the
        catalog, so every later ``load_bucketed`` graph starts with
        edges already clustered on ``src`` — the per-superstep
        ``state ⋈ edges`` join then shuffles only the (|V|-sized)
        vertex-state side, verified by plan assertion in
        ``tests/test_bucketed_edges.py``.
        """
        writer = self.edges.write.format("parquet").mode(mode)
        if path is not None:
            writer = writer.option("path", path)
        (writer.bucketBy(self.num_edge_partitions, SRC)
               .sortBy(SRC, DST)
               .saveAsTable(table))

    @classmethod
    def load_bucketed(cls, spark: SparkSession, table: str, **kw) -> "EdgeGraph":
        """Rebuild an EdgeGraph from a ``save_bucketed`` table without
        re-shuffling the edges (bucket count read from the catalog)."""
        n = _bucket_count(spark, table)
        return cls(
            spark.table(table),
            num_edge_partitions=n,
            pre_partitioned=True,
            **kw,
        )

    # -- structural views (cached) ----------------------------------------

    @cached_property
    def vertices(self) -> DataFrame:
        """All vertex ids appearing as an endpoint (persisted)."""
        v = (
            self.edges.select(F.col(SRC).alias(ID))
            .unionAll(self.edges.select(F.col(DST).alias(ID)))
            .distinct()
            .persist()
        )
        return v

    @cached_property
    def out_degrees(self) -> DataFrame:
        """(id, out_degree) — only vertices with >=1 out-edge appear."""
        return (
            self.edges.groupBy(F.col(SRC).alias(ID))
            .agg(F.count("*").alias("out_degree"))
            .persist()
        )

    @cached_property
    def in_degrees(self) -> DataFrame:
        return (
            self.edges.groupBy(F.col(DST).alias(ID))
            .agg(F.count("*").alias("in_degree"))
            .persist()
        )

    @cached_property
    def degrees(self) -> DataFrame:
        """Total (in+out) degree per vertex, counting each directed edge once
        per endpoint — the reference's ``num_in_edges + num_out_edges``."""
        both = self.edges.select(F.col(SRC).alias(ID)).unionAll(
            self.edges.select(F.col(DST).alias(ID))
        )
        return both.groupBy(ID).agg(F.count("*").alias("degree")).persist()

    @cached_property
    def num_vertices(self) -> int:
        return self.vertices.count()

    @cached_property
    def num_edges(self) -> int:
        return self.edges.count()

    # -- derived edge layouts ---------------------------------------------

    @cached_property
    def symmetric_edges(self) -> DataFrame:
        """ALL_EDGES view: every directed edge plus its reverse (union-all,
        no dedupe — matches gather over IN ∪ OUT in the reference,
        ``ivertex_program.hpp:578-581``). Partitioned by src, persisted."""
        extra = [c for c in self.edges.columns if c not in (SRC, DST)]
        rev = self.edges.select(
            F.col(DST).alias(SRC), F.col(SRC).alias(DST), *[F.col(c) for c in extra]
        )
        return (
            self.edges.unionAll(rev)
            .repartition(self.num_edge_partitions, SRC)
            # pre-sorted within partitions: the per-superstep
            # state ⋈ edges sort-merge join streams the cached edges
            # without re-sorting them every iteration (the in-memory
            # analog of save_bucketed's sortBy — measured 2.5x on the
            # 10M-edge CC fixpoint, BASELINE.md §5 r5)
            .sortWithinPartitions(SRC)
            .persist()
        )

    @cached_property
    def canonical_undirected_edges(self) -> DataFrame:
        """Deduped undirected edges with src < dst — the input contract of
        triangle counting (``simple_undirected_triangle_count.cpp:314-316``)."""
        return (
            self.edges.select(
                F.least(SRC, DST).alias(SRC), F.greatest(SRC, DST).alias(DST)
            )
            .distinct()
            .repartition(self.num_edge_partitions, SRC)
            .persist()
        )

    # -- set-style graph ops (SURVEY §2.2) ---------------------------------

    def neighbors(self, vertex_set: DataFrame, direction: str = "out") -> DataFrame:
        """Expand a vertex-id set by one hop (``distributed_graph.hpp:2462-2466``).

        ``direction``: 'out' | 'in' | 'all'. Returns distinct neighbor ids.
        """
        e = {
            "out": self.edges,
            "in": self.edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)),
            "all": None,
        }
        if direction == "all":
            edges = self.symmetric_edges
        else:
            edges = e[direction]
        vs = vertex_set.select(F.col(ID))
        return (
            edges.join(vs.hint("broadcast") if _small(vs) else vs, edges[SRC] == vs[ID])
            .select(F.col(DST).alias(ID))
            .distinct()
        )

    def unpersist(self) -> None:
        for attr in (
            "vertices",
            "out_degrees",
            "in_degrees",
            "degrees",
            "symmetric_edges",
            "canonical_undirected_edges",
        ):
            if attr in self.__dict__:
                self.__dict__[attr].unpersist()
        self.edges.unpersist()


def _bucket_count(spark: SparkSession, table: str) -> int:
    """Bucket count of a saved table, from the catalog (DESCRIBE EXTENDED)."""
    for row in spark.sql(f"DESCRIBE EXTENDED {table}").collect():
        if row["col_name"].strip() == "Num Buckets":
            return int(row["data_type"])
    raise ValueError(f"table {table!r} is not bucketed")


def _parse_size(s: str) -> int:
    s = s.strip().lower().rstrip("b")
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    if s and s[-1] in mult:
        return int(float(s[:-1]) * mult[s[-1]])
    return int(s)


def _small(df: DataFrame) -> bool:
    """Catalyst-statistics size estimate (no action): hint broadcast
    when the optimizer's own estimate for the vertex set is under the
    session's autoBroadcastJoinThreshold — the same signal AQE uses,
    consulted eagerly so the hint lands before the join is planned."""
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats()
                   .sizeInBytes())
        thresh = _parse_size(
            df.sparkSession.conf.get(
                "spark.sql.autoBroadcastJoinThreshold", "10m"))
        return 0 < size <= thresh
    except Exception:  # noqa: BLE001 — stats unavailable: no hint
        return False
