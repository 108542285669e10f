"""Vertex-cut ingress: edge-placement strategies + replication metrics.

The reference's defining scale feature is PowerGraph-style vertex-cut
partitioning: *edges* are assigned to shards, and a vertex is
replicated onto every shard that holds one of its edges
(``src/graphlab/graph/ingress/``).  Spark re-partitions at every
shuffle, so an engine on Spark does not need a one-time placement to
run — but the placement strategies themselves remain the right tool
for *durable* layouts (which shard-bucketed parquet file an edge lands
in, cf. ``EdgeGraph.save_bucketed``) and their replication factor
lambda is the canonical communication-volume predictor for a GAS
superstep (each vertex's state is sent to every shard holding a
replica, so bytes/superstep ~ lambda * |V|).

Strategies (all pure column arithmetic over the edge scan — the
`random`/`grid`/`pds` assignments add NO shuffle; `hybrid` adds one
degree aggregation + one join):

- ``random`` — hash of the canonical (min,max) endpoint pair mod
  nshards (``ingress_edge_decision.hpp:49-55``).
- ``grid``  — constrained placement (``sharding_constraint.hpp``,
  ``distributed_constrained_random_ingress.hpp``): shards form an
  nrows x ncols grid, vertex v's master shard is hash(v) % nshards,
  shard i's candidate set A_i is its grid row + column, and an edge
  (u,v) hashes onto the sorted intersection A_su & A_sv (non-empty by
  construction; bounds lambda by nrows+ncols-1 ~ 2*sqrt(nshards)).
- ``pds``   — same constrained scheme with candidate sets generated
  from a perfect difference set D modulo n = p^2+p+1
  (``generate_pds.hpp``): A_i = {(i+d) mod n}.  Every residue is a
  difference of two PDS members exactly once, so every A_i & A_j is
  non-empty and lambda is bounded by |D| = p+1 ~ sqrt(nshards).
- ``hybrid`` — the PowerLyra hybrid-cut (Chen et al., EuroSys'15), the
  scalable stand-in for the reference's sequential greedy/oblivious
  heuristic (``distributed_oblivious_ingress.hpp``; the greedy placer
  keeps per-loader mutable degree state and is order-dependent, so it
  has no deterministic distributed analog): an edge whose destination
  has in-degree <= threshold is placed on the destination's master
  shard (low-degree vertices get vertex-local gathers); edges into
  high-degree hubs are hashed by source (the hub is cut).

``replication_factor`` / ``ingress_report`` reproduce the finalize
summary the reference prints at ingress (``distributed_ingress_base
.hpp:538-550``: nreplicas, replication factor, edge balance).

Every strategy uses the engine-portable hash family
(``operators/portable.py``), and ``sql_assign_edges`` /
``sql_ingress_report`` emit ANSI-SQL twins (constrained candidate
sets inlined as a VALUES lookup) so DuckDB replays the exact
placement.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .portable import edge_hash, lcg_hash, sql_edge_hash, sql_lcg_hash

STRATEGIES = ("random", "grid", "pds", "hybrid")


# ---------------------------------------------------------------------------
# sharding constraints (grid / pds), mirroring sharding_constraint.hpp
# ---------------------------------------------------------------------------

def grid_dims(nshards: int) -> tuple[int, int]:
    """(nrows, ncols) with nrows*ncols == nshards and ncols-nrows <= 2
    (``sharding_constraint.hpp::is_grid_compatible``)."""
    nrow = int(math.isqrt(nshards))
    for ncol in range(nrow, nrow + 3):
        if nrow * ncol == nshards:
            return nrow, ncol
    raise ValueError(
        f"nshards={nshards} is not grid-compatible "
        "(needs nrows*ncols with ncols-nrows <= 2)"
    )


def pds_p(nshards: int) -> int:
    """p with p*p+p+1 == nshards (``is_pds_compatible``)."""
    p = int(math.isqrt(nshards - 1)) if nshards > 1 else 0
    if p > 0 and p * p + p + 1 == nshards:
        return p
    raise ValueError(f"nshards={nshards} is not p^2+p+1 for any prime p")


def perfect_difference_set(p: int) -> list[int]:
    """Smallest perfect difference set of size p+1 modulo p^2+p+1.

    Every nonzero residue mod n appears exactly once as a difference
    of two members.  The reference generates these via GF(p)
    primitive-polynomial arithmetic (``generate_pds.hpp``); for the
    shard counts a placement ever uses (n <= a few thousand) a
    lexicographic backtracking search is instant and dependency-free.
    """
    n = p * p + p + 1
    size = p + 1

    def extend(chosen: list[int], diffs: set[int]) -> list[int] | None:
        if len(chosen) == size:
            return chosen
        for cand in range(chosen[-1] + 1, n):
            new: set[int] = set()
            ok = True
            for c in chosen:
                d1, d2 = (cand - c) % n, (c - cand) % n
                if d1 == d2 or {d1, d2} & (diffs | new):
                    ok = False
                    break
                new |= {d1, d2}
            if ok:
                got = extend(chosen + [cand], diffs | new)
                if got is not None:
                    return got
        return None

    got = extend([0], set())
    if got is None:  # p not a prime power — no PDS exists
        raise ValueError(f"no perfect difference set for p={p}")
    return got


def sharding_constraint(nshards: int, method: str) -> list[list[int]]:
    """Candidate shard set A_i per shard i, sorted ascending."""
    if method == "grid":
        nrows, ncols = grid_dims(nshards)
        out = []
        for i in range(nshards):
            r, c = divmod(i, ncols)
            row = {r * ncols + j for j in range(ncols)}
            col = {q * ncols + c for q in range(nrows)}
            out.append(sorted(row | col))
        return out
    if method == "pds":
        p = pds_p(nshards)
        D = perfect_difference_set(p)
        return [sorted({(i + d) % nshards for d in D}) for i in range(nshards)]
    raise ValueError(f"unknown constraint method: {method}")


def joint_candidates(nshards: int, method: str) -> dict[tuple[int, int], list[int]]:
    """A_i & A_j (sorted) for every master-shard pair — the edge's
    allowed placements (``sharding_constraint.hpp::get_joint_neighbors``)."""
    A = [set(a) for a in sharding_constraint(nshards, method)]
    out = {}
    for i in range(nshards):
        for j in range(nshards):
            joint = sorted(A[i] & A[j])
            if not joint:
                raise AssertionError(f"empty joint candidate set ({i},{j})")
            out[(i, j)] = joint
    return out


# ---------------------------------------------------------------------------
# edge placement
# ---------------------------------------------------------------------------

def _canon_hash(src, dst):
    return edge_hash(F.least(src, dst), F.greatest(src, dst))


def assign_edges(
    edges: DataFrame,
    nshards: int,
    strategy: str = "random",
    src: str = "src",
    dst: str = "dst",
    threshold: int = 100,
) -> DataFrame:
    """Edges plus an int ``shard`` column in [0, nshards)."""
    s, d = F.col(src), F.col(dst)
    h = _canon_hash(s, d)
    if strategy == "random":
        return edges.withColumn("shard", (h % nshards).cast("int"))
    if strategy in ("grid", "pds"):
        joint = joint_candidates(nshards, strategy)
        su = (lcg_hash(s) % nshards).cast("int")
        sv = (lcg_hash(d) % nshards).cast("int")
        if nshards <= 64:
            # one literal array<array<int>> indexed by su*nshards+sv;
            # the pick hashes into the ascending joint list (candidate
            # order is pinned so any SQL twin lands on the same member)
            flat = F.array(*[
                F.array(*[F.lit(x) for x in joint[(i, j)]])
                for i in range(nshards) for j in range(nshards)
            ])
            cands = F.element_at(flat, (su * nshards + sv + 1).cast("int"))
            pick = F.element_at(cands, ((h % F.size(cands)) + 1).cast("int"))
            return edges.withColumn("shard", pick)
        # larger grids: broadcast the (su, sv, idx, member, cnt) joint
        # table (nshards^2 * ~2*sqrt(nshards) rows, still tiny) and
        # equi-join on the master pair; the hashed pick is the
        # residual predicate after the broadcast hash join
        spark = edges.sparkSession
        jt = spark.createDataFrame(
            [
                (i, j, idx, member, len(cands_ij))
                for (i, j), cands_ij in joint.items()
                for idx, member in enumerate(cands_ij)
            ],
            "jt_su int, jt_sv int, jt_idx int, jt_member int, jt_cnt int",
        )
        out = (
            edges.withColumn("_su", su).withColumn("_sv", sv)
            .join(
                F.broadcast(jt),
                (F.col("_su") == F.col("jt_su"))
                & (F.col("_sv") == F.col("jt_sv"))
                & (F.col("jt_idx") == (h % F.col("jt_cnt")).cast("int")),
            )
            .withColumn("shard", F.col("jt_member"))
            .drop("_su", "_sv", "jt_su", "jt_sv", "jt_idx", "jt_member", "jt_cnt")
        )
        return out
    if strategy == "hybrid":
        ind = edges.groupBy(F.col(dst).alias("_hv")).agg(
            F.count(F.lit(1)).alias("_ind")
        )
        low = (lcg_hash(d) % nshards).cast("int")
        high = (lcg_hash(s) % nshards).cast("int")
        return (
            edges.join(ind, F.col(dst) == F.col("_hv"), "left")
            .withColumn("shard", F.when(F.col("_ind") <= threshold, low).otherwise(high))
            .drop("_hv", "_ind")
        )
    raise ValueError(f"unknown ingress strategy: {strategy}")


# ---------------------------------------------------------------------------
# finalize metrics (distributed_ingress_base.hpp:538-550)
# ---------------------------------------------------------------------------

def replication_factor(
    assigned: DataFrame, nshards: int, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One row: (nreplicas, replication_factor, edge_balance).

    nreplicas = sum over vertices of #distinct shards touching the
    vertex; replication_factor = nreplicas / |V|; edge_balance =
    max shard edge count / (|E| / nshards) — the reference formula,
    which counts EMPTY shards in the mean (>= 1, 1 = perfect; a
    placement that starves shards must read as imbalanced).
    """
    pairs = (
        assigned.select(F.col(src).alias("v"), "shard")
        .unionAll(assigned.select(F.col(dst).alias("v"), "shard"))
        .distinct()
    )
    rep = pairs.agg(
        F.count(F.lit(1)).alias("nreplicas"),
        # try_divide: an empty graph yields NULL (0/0 is undefined;
        # ANSI mode would raise)
        F.try_divide(F.count(F.lit(1)), F.countDistinct("v")).alias(
            "replication_factor"
        ),
    )
    per_shard = assigned.groupBy("shard").agg(F.count(F.lit(1)).alias("cnt"))
    bal = per_shard.agg(
        F.try_divide(F.max("cnt") * nshards, F.sum("cnt")).alias("edge_balance")
    )
    return rep.crossJoin(bal)


def ingress_report(
    edges: DataFrame,
    specs: list[tuple[str, int]],
    src: str = "src",
    dst: str = "dst",
    threshold: int = 100,
) -> DataFrame:
    """Per-strategy replication/balance summary, one row per spec."""
    out = None
    for strategy, nshards in specs:
        assigned = assign_edges(edges, nshards, strategy, src, dst, threshold)
        row = replication_factor(assigned, nshards, src, dst).select(
            F.lit(strategy).alias("strategy"),
            F.lit(nshards).alias("nshards"),
            F.col("nreplicas").cast("long").alias("nreplicas"),
            F.round("replication_factor", 6).alias("replication_factor"),
            F.round("edge_balance", 6).alias("edge_balance"),
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# SQL twins
# ---------------------------------------------------------------------------

def sql_assign_edges(
    nshards: int,
    strategy: str,
    src: str = "src",
    dst: str = "dst",
    threshold: int = 100,
    edges: str = "edges",
) -> str:
    """SELECT replaying ``assign_edges`` verbatim (src, dst, shard)."""
    h = sql_edge_hash(
        f"least(e.{src}, e.{dst})", f"greatest(e.{src}, e.{dst})"
    )
    if strategy == "random":
        return (
            f"SELECT e.{src} AS src, e.{dst} AS dst, "
            f"CAST({h} % {nshards} AS INT) AS shard FROM {edges} e"
        )
    if strategy in ("grid", "pds"):
        joint = joint_candidates(nshards, strategy)
        rows = []
        for (i, j), cands in joint.items():
            for idx, member in enumerate(cands):
                rows.append(f"({i},{j},{idx},{member},{len(cands)})")
        values = ",".join(rows)
        su = f"({sql_lcg_hash(f'e.{src}')} % {nshards})"
        sv = f"({sql_lcg_hash(f'e.{dst}')} % {nshards})"
        return (
            f"SELECT e.{src} AS src, e.{dst} AS dst, "
            f"CAST(jt.member AS INT) AS shard "
            f"FROM {edges} e JOIN (VALUES {values}) "
            f"AS jt(su, sv, idx, member, cnt) "
            f"ON jt.su = {su} AND jt.sv = {sv} AND jt.idx = {h} % jt.cnt"
        )
    if strategy == "hybrid":
        by_dst = f"({sql_lcg_hash(f'e.{dst}')} % {nshards})"
        by_src = f"({sql_lcg_hash(f'e.{src}')} % {nshards})"
        return (
            f"SELECT e.{src} AS src, e.{dst} AS dst, "
            f"CAST(CASE WHEN ind._ind <= {threshold} THEN {by_dst} "
            f"ELSE {by_src} END AS INT) AS shard "
            f"FROM {edges} e JOIN (SELECT {dst} AS _hv, "
            f"count(*) AS _ind FROM {edges} GROUP BY {dst}) ind "
            f"ON e.{dst} = ind._hv"
        )
    raise ValueError(f"unknown ingress strategy: {strategy}")


def sql_ingress_report(
    specs: list[tuple[str, int]],
    src: str = "src",
    dst: str = "dst",
    threshold: int = 100,
    edges: str = "edges",
) -> str:
    """SELECT replaying ``ingress_report`` (UNION ALL of per-spec rows)."""
    parts = []
    for strategy, nshards in specs:
        assigned = sql_assign_edges(
            nshards, strategy, src, dst, threshold, edges
        )
        parts.append(
            f"SELECT '{strategy}' AS strategy, {nshards} AS nshards, "
            "CAST(rep.nreplicas AS BIGINT) AS nreplicas, "
            "round(rep.replication_factor, 6) AS replication_factor, "
            "round(bal.edge_balance, 6) AS edge_balance "
            f"FROM (SELECT count(*) AS nreplicas, "
            "CAST(count(*) AS DOUBLE) / count(DISTINCT v) "
            "AS replication_factor FROM ("
            f"SELECT DISTINCT v, shard FROM ("
            f"SELECT src AS v, shard FROM ({assigned}) a1 "
            f"UNION ALL SELECT dst AS v, shard FROM ({assigned}) a2) u"
            ") pairs) rep, "
            f"(SELECT CAST(max(cnt) * {nshards} AS DOUBLE) / sum(cnt) "
            "AS edge_balance "
            f"FROM (SELECT shard, count(*) AS cnt FROM ({assigned}) a3 "
            "GROUP BY shard) ps) bal"
        )
    return " UNION ALL ".join(parts)
